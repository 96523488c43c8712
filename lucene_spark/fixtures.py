"""Deterministic synthetic source-code corpus (FIXTURES.md §1, seed=42).

Generates the ``source_files(repo, path, commit, lang, content)`` table
shape fixed by BASELINE.json input_hint. Content mixes:
(a) a shared keyword vocabulary -> high-df hot terms (skew tests),
(b) per-repo identifiers (camelCase + snake_case) -> mid-df terms,
(c) unique UUID-ish tokens -> df=1 terms,
(d) occasional Unicode (accents, CJK),
(e) rare >255-char tokens (maxTokenLength chopping),
(f) empty and whitespace-only files.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

KEYWORDS = (
    "class import return def if else for while try except raise public "
    "static void int string new null true false function var let const "
    "package struct interface impl match case break continue"
).split()

LANGS = ["java", "py", "js", "go", "c", "md"]
LANG_P = [0.3, 0.25, 0.2, 0.1, 0.1, 0.05]
EXT = {"java": "java", "py": "py", "js": "js", "go": "go", "c": "c", "md": "md"}

_ACCENT_WORDS = ["café", "münchen", "naïve", "résumé"]
_CJK_WORDS = ["漢字", "テスト", "한국어"]


def _ident(rng: np.random.Generator, repo_id: int) -> str:
    stems = ["parse", "build", "index", "merge", "score", "token", "block", "fetch"]
    nouns = ["writer", "reader", "buffer", "cache", "queue", "graph", "node", "term"]
    a = stems[rng.integers(len(stems))]
    b = nouns[rng.integers(len(nouns))]
    if rng.random() < 0.5:
        return f"{a}_{b}_{repo_id % 7}"
    return f"{a}{b.capitalize()}{repo_id % 7}"


def generate_source_files(n_files: int, seed: int = 42) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    n_repos = max(2, n_files // 50)
    # Zipf-ish repo sizes
    repo_weights = 1.0 / np.arange(1, n_repos + 1)
    repo_weights /= repo_weights.sum()
    repo_ids = rng.choice(n_repos, size=n_files, p=repo_weights)

    rows = []
    for i in range(n_files):
        rid = int(repo_ids[i])
        repo = f"org{rid % 13}/proj{rid}"
        lang = LANGS[int(rng.choice(len(LANGS), p=LANG_P))]
        path = f"src/pkg{int(rng.integers(20))}/file{i}.{EXT[lang]}"
        commit = hashlib.sha1(f"{repo}/{path}/{seed}".encode()).hexdigest()

        r = rng.random()
        if r < 0.01:
            content = ""  # (f) empty
        elif r < 0.02:
            content = "   \t\n  "  # (f) whitespace-only
        else:
            n_tokens = int(rng.integers(20, 200))
            toks = []
            for _ in range(n_tokens):
                u = rng.random()
                if u < 0.55:
                    toks.append(KEYWORDS[int(rng.integers(len(KEYWORDS)))])  # (a)
                elif u < 0.85:
                    toks.append(_ident(rng, rid))  # (b)
                elif u < 0.93:
                    toks.append(f"uid{i}x{int(rng.integers(1 << 30)):08x}")  # (c)
                elif u < 0.97:
                    toks.append(_ACCENT_WORDS[int(rng.integers(len(_ACCENT_WORDS)))])
                else:
                    toks.append(_CJK_WORDS[int(rng.integers(len(_CJK_WORDS)))])  # (d)
            if rng.random() < 0.005:
                toks.append("y" * 300)  # (e) >255-char token
            content = " ".join(toks)
        rows.append((repo, path, commit, lang, content))
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


# ---------------------------------------------------------------------------
# distributed corpus generation (scaling benchmarks)
# ---------------------------------------------------------------------------

_STEMS = ["parse", "build", "index", "merge", "score", "token", "block", "fetch"]
_NOUNS = ["writer", "reader", "buffer", "cache", "queue", "graph", "node", "term"]


def _ident_vocab() -> list[str]:
    out = []
    for a in _STEMS:
        for b in _NOUNS:
            for r in range(7):
                out.append(f"{a}_{b}_{r}")
                out.append(f"{a}{b.capitalize()}{r}")
    return out


def generate_source_files_distributed(
    spark, n_files: int, seed: int = 42, parts: int = 64
):
    """Same source_files shape as generate_source_files, but vectorized
    and generated ON the executors (mapInPandas over spark.range) so
    million-file corpora take seconds. Deterministic in (n_files, seed,
    parts): partition p is seeded (seed, p) and generates its own row
    range — independent of cluster size or scheduling.

    Token mix: 60% hot keywords, 30% mid-df identifiers, 10% unique
    hex tokens (same hot/mid/rare df shape as the loop generator)."""
    import numpy as np
    import pandas as pd

    idents = np.array(_ident_vocab(), dtype=object)
    keywords = np.array(KEYWORDS, dtype=object)

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            if len(ids) == 0:
                continue
            pid = int(ids[0] // ((n_files + parts - 1) // parts))
            rng = np.random.default_rng(seed * 1_000_003 + pid)
            n = len(ids)
            lens = rng.integers(20, 200, n)
            total = int(lens.sum())
            doc_idx = np.repeat(np.arange(n), lens)
            u = rng.random(total)
            tok = np.empty(total, dtype=object)
            hot = u < 0.6
            mid = (u >= 0.6) & (u < 0.9)
            rare = u >= 0.9
            tok[hot] = keywords[rng.integers(0, len(keywords), int(hot.sum()))]
            tok[mid] = idents[rng.integers(0, len(idents), int(mid.sum()))]
            rare_vals = rng.integers(0, 1 << 40, int(rare.sum()))
            tok[rare] = [f"u{v:010x}" for v in rare_vals]
            content = (
                pd.Series(tok).groupby(doc_idx).agg(" ".join).reindex(
                    np.arange(n), fill_value=""
                )
            )
            rid = rng.integers(0, max(2, n_files // 50), n)
            lang = np.array(LANGS, dtype=object)[
                rng.integers(0, len(LANGS), n)
            ]
            commits = rng.integers(0, 1 << 60, n)
            yield pd.DataFrame(
                {
                    "repo": [f"org{int(r) % 13}/proj{int(r)}" for r in rid],
                    "path": [
                        f"src/pkg{int(r) % 20}/file{int(i)}.py"
                        for r, i in zip(rid, ids)
                    ],
                    "commit": [f"{int(c):015x}" for c in commits],
                    "lang": lang,
                    "content": content.to_numpy(),
                }
            )

    return (
        spark.range(0, n_files, 1, parts)
        .mapInPandas(gen, schema="repo string, path string, commit string, lang string, content string")
    )
