"""Classic Highlighter family — the original fragment highlighter
(highlighter/src/java/org/apache/lucene/search/highlight/).

Reference parity:

- ``Highlighter.java`` (getBestTextFragments): stream the document's
  tokens, let the Fragmenter cut fragment boundaries, score each
  fragment with the Scorer, keep the ``max_fragments`` best by score
  (ties: source order), optionally merging contiguous fragments back
  into source order (mergeContiguousFragments);
- ``QueryScorer.java`` / ``WeightedSpanTermExtractor.java``: the query
  is flattened to weighted span terms; getTokenScore returns the
  term's weight, and a fragment's score accumulates each DISTINCT
  matched term once (QueryScorer.java:100-113 ``if
  (!foundTerms.contains(termText)) { totalScore += score; ... }``).
  Position-sensitive terms (phrases / span-nears extracted with
  positionSensitive=true) only count where the token's position lies
  inside one of the term's match spans
  (WeightedSpanTerm.checkPosition);
- ``SimpleFragmenter.java`` (isNewFragment): a token starts a new
  fragment when its END offset crosses ``fragment_size *
  currentNumFrags``; because offsets increase monotonically and every
  multiple is crossed exactly once when tokens are shorter than the
  fragment size, the fragment index of a token is
  ``end_offset // fragment_size`` — the closed form the DuckDB oracle
  shares;
- ``SimpleSpanFragmenter.java``: same cut rule, except a fragment is
  never cut in the middle of a position-sensitive span match — the
  boundary is deferred until the span's last token has been emitted;
- ``SimpleHTMLFormatter.java``: matched tokens (score > 0) wrapped in
  pre/post tags.

Plan shape (the 100-TB contract): highlighting is a narrow
presentation op over the docs that already matched — one Arrow-batched
``mapInPandas`` over the semi-joined stored text with the weighted
terms broadcast in the closure; no shuffle, no driver loop. The
per-doc token walk is the reference's own TokenStream loop and is
O(len(doc)); everything else stays columnar.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


def weighted_span_terms(
    terms: list[str] | None = None,
    weights: dict[str, float] | None = None,
    phrases: list[tuple[str, ...]] | None = None,
    phrase_weights: dict[tuple[str, ...], float] | None = None,
) -> dict:
    """WeightedSpanTermExtractor role: flatten a (boolean of) term and
    phrase clauses into ``{term: (weight, position_sensitive)}`` plus
    the phrase list whose exact-position matches gate the sensitive
    terms. Plain terms are position-insensitive (extractor's TermQuery
    arm); phrase members are position-sensitive (extractor's
    PhraseQuery arm sets positionSensitive=true)."""
    w = weights or {}
    out: dict[str, tuple[float, bool]] = {}
    for t in terms or []:
        t = t.lower()
        out[t] = (float(w.get(t, 1.0)), False)
    pw = phrase_weights or {}
    for ph in phrases or []:
        ph = tuple(x.lower() for x in ph)
        for t in ph:
            if t not in out:  # insensitive (broader) wins, as in the ref
                out[t] = (float(pw.get(ph, 1.0)), True)
    return {"terms": out, "phrases": [tuple(x.lower() for x in p) for p in (phrases or [])]}


def _phrase_positions(toks: list[str], phrases: list[tuple[str, ...]]) -> set[int]:
    """Token positions covered by an exact-position phrase match
    (WeightedSpanTerm.addPositionSpans / checkPosition contract)."""
    ok: set[int] = set()
    for ph in phrases:
        n = len(ph)
        for i in range(len(toks) - n + 1):
            if tuple(toks[i : i + n]) == ph:
                ok.update(range(i, i + n))
    return ok


def best_fragments_doc(
    text: str,
    wst: dict,
    fragment_size: int = 40,
    max_fragments: int = 2,
    span_fragmenter: bool = False,
    merge_contiguous: bool = False,
    pre: str = "<b>",
    post: str = "</b>",
) -> list[tuple[int, float, str]]:
    """Highlighter.getBestTextFragments over one doc ->
    ``[(frag_index, score, marked_up_text)]`` best-first (score desc,
    then source order). The token walk is the reference loop:
    fragmenter decides boundaries, QueryScorer accumulates distinct
    term weights, formatter wraps scoring tokens."""
    spans = [(m.start(), m.end(), m.group(0).lower()) for m in _TOKEN_RE.finditer(text)]
    if not spans:
        return []
    terms = wst["terms"]
    sensitive_ok = (
        _phrase_positions([t for _s, _e, t in spans], wst["phrases"])
        if wst["phrases"]
        else set()
    )

    # fragment assignment: the reference's iterative isNewFragment walk
    frags: list[list[int]] = [[]]
    num_frags = 1
    open_span_until = -1  # SimpleSpanFragmenter: defer cut inside a span
    for i, (_s, e, t) in enumerate(spans):
        if span_fragmenter and i in sensitive_ok:
            # find the phrase match covering i and hold the boundary
            for ph in wst["phrases"]:
                n = len(ph)
                for j in range(max(0, i - n + 1), i + 1):
                    if (
                        j + n <= len(spans)
                        and tuple(spans[k][2] for k in range(j, j + n)) == ph
                    ):
                        open_span_until = max(open_span_until, j + n - 1)
        is_new = e >= fragment_size * num_frags
        if is_new and span_fragmenter and i <= open_span_until and frags[-1]:
            is_new = False  # defer: never split a span match
        elif is_new:
            num_frags += 1
            if frags[-1]:
                frags.append([])
        frags[-1].append(i)

    scored: list[tuple[int, float, float, str]] = []
    for fi, idxs in enumerate(frags):
        if not idxs:
            continue
        found: set[str] = set()
        total = 0.0
        hit_idx: list[int] = []
        for i in idxs:
            t = spans[i][2]
            info = terms.get(t)
            if info is None:
                continue
            weight, sensitive = info
            if sensitive and i not in sensitive_ok:
                continue
            hit_idx.append(i)
            if t not in found:
                found.add(t)
                total += weight
        lo = spans[idxs[0]][0]
        hi = spans[idxs[-1]][1]
        out = text[lo:hi]
        for i in reversed(hit_idx):
            s, e, _t = spans[i]
            out = out[: s - lo] + pre + out[s - lo : e - lo] + post + out[e - lo :]
        scored.append((fi, total, float(-fi), out))

    scored = [f for f in scored if f[1] > 0]
    scored.sort(key=lambda f: (-f[1], f[0]))
    best = scored[:max_fragments]
    if merge_contiguous:
        # mergeContiguousFragments: back to source order, adjacent
        # fragment indices concatenated with summed scores
        best.sort(key=lambda f: f[0])
        merged: list[tuple[int, float, float, str]] = []
        for f in best:
            if merged and f[0] == merged[-1][0] + 1:
                p = merged[-1]
                merged[-1] = (f[0], p[1] + f[1], p[2], p[3] + " " + f[3])
            else:
                merged.append(f)
        best = merged
    return [(fi, sc, txt) for fi, sc, _o, txt in best]


def classic_highlight(
    docs: DataFrame,
    terms: list[str] | None = None,
    weights: dict[str, float] | None = None,
    phrases: list[tuple[str, ...]] | None = None,
    content_col: str = "text",
    fragment_size: int = 40,
    max_fragments: int = 2,
    span_fragmenter: bool = False,
    merge_contiguous: bool = False,
) -> DataFrame:
    """-> (doc_id, frag, score_x1e3, snippet) — the ``max_fragments``
    best fragments per doc, best-first. ``frag`` is the source-order
    fragment index (the value-comparable identity beside the score);
    snippet is presentation-only."""
    wst = weighted_span_terms(terms, weights, phrases)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf[content_col]):
                for fi, sc, txt in best_fragments_doc(
                    str(text),
                    wst,
                    fragment_size=fragment_size,
                    max_fragments=max_fragments,
                    span_fragmenter=span_fragmenter,
                    merge_contiguous=merge_contiguous,
                ):
                    rows.append((int(did), fi, int(round(sc * 1000)), txt))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frag", "score_x1e3", "snippet"]
            )

    return docs.select("doc_id", content_col).mapInPandas(
        run, schema="doc_id long, frag int, score_x1e3 long, snippet string"
    )


# ---------------------------------------------------------------------------
# GradientFormatter / SpanGradientFormatter (highlighter/highlight/
# GradientFormatter.java, SpanGradientFormatter.java): score-colored
# term markup — the interpolation arithmetic kept exactly (int
# truncation, min(maxScore, score)/maxScore relative scale, two-digit
# upper-case hex)
# ---------------------------------------------------------------------------


def _hex_to_int(h: str) -> int:
    """GradientFormatter.hexToInt — raises on non-hex like the
    reference's NumberFormatException."""
    if len(h) > 16:
        raise ValueError("hex too long")
    v = 0
    for ch in h:
        c = int(ch, 16)
        v = (v << 4) | c
    return v


def _int_to_hex(i: int) -> str:
    digits = "0123456789ABCDEF"
    return digits[(i & 0xF0) >> 4] + digits[i & 0x0F]


class GradientFormatter:
    """highlightTerm wraps a scoring token in <font color/bgcolor>
    whose channels interpolate from the min color to the max color by
    score / maxScore (GradientFormatter.java:100-108 getColorVal:
    min(colorMin, colorMax) + int(|min-max| * relScore))."""

    def __init__(
        self,
        max_score: float,
        min_foreground: str | None = None,
        max_foreground: str | None = None,
        min_background: str | None = None,
        max_background: str | None = None,
    ):
        def parse(c):
            if len(c) != 7:
                raise ValueError(
                    "color is not 7 bytes long eg a hex RGB value"
                    " such as #FFFFFF"
                )
            return (
                _hex_to_int(c[1:3]), _hex_to_int(c[3:5]), _hex_to_int(c[5:7])
            )

        self.max_score = float(max_score)
        self.fg = (
            (parse(min_foreground), parse(max_foreground))
            if min_foreground and max_foreground
            else None
        )
        self.bg = (
            (parse(min_background), parse(max_background))
            if min_background and max_background
            else None
        )

    def _color_val(self, lo: int, hi: int, score: float) -> int:
        if lo == hi:
            return lo
        scale = abs(lo - hi)
        rel = min(self.max_score, score) / self.max_score
        return min(lo, hi) + int(scale * rel)

    def _color(self, pair, score: float) -> str:
        lo, hi = pair
        return "#" + "".join(
            _int_to_hex(self._color_val(a, b, score))
            for a, b in zip(lo, hi)
        )

    def foreground(self, score: float) -> str:
        return self._color(self.fg, score)

    def background(self, score: float) -> str:
        return self._color(self.bg, score)

    def highlight_term(self, original: str, score: float) -> str:
        if score == 0:
            return original
        parts = ["<font "]
        if self.fg:
            parts.append(f'color="{self.foreground(score)}" ')
        if self.bg:
            parts.append(f'bgcolor="{self.background(score)}" ')
        parts.append(">")
        parts.append(original)
        parts.append("</font>")
        return "".join(parts)


class SpanGradientFormatter(GradientFormatter):
    """SpanGradientFormatter.java: the CSS form — <span style="...">
    instead of the deprecated font tag."""

    def highlight_term(self, original: str, score: float) -> str:
        if score == 0:
            return original
        style = []
        if self.fg:
            style.append(f"color: {self.foreground(score)}; ")
        if self.bg:
            style.append(f"background: {self.background(score)}; ")
        return (
            '<span style="' + "".join(style) + '">' + original + "</span>"
        )
