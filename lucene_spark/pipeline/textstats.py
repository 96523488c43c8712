"""Text-analysis operators over the ``documents`` table.

Each operator returns a DataFrame with a stable schema; the ``*_sql``
sibling emits the equivalent DuckDB SQL over the same parquet views so
the two halves cannot drift (the driver's correctness-gate pattern).

Everything here is pure JVM expression work (split / regexp / array
functions inside whole-stage codegen) — no Python in the hot path, so
the same plan runs unchanged on a 1000-executor cluster: one narrow
projection stage per document, no shuffle at all except the final
``ORDER BY ... LIMIT`` top-k exchange (TakeOrderedAndProject).

Floats are exposed as ``*_x1e6`` (round(value*1e6) as bigint) so the
row set is bit-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_RX = "[^a-z0-9]+"

# Tiny function-word lists per language for the n-gram/stopword
# heuristic language classifier. Deterministic, shared with the SQL
# oracle below. (Real pipelines plug fastText/CLD3 here — the operator
# shape, a per-row scoring + argmax, is identical.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "nicht", "ist"),
    "en": ("the", "a", "of", "and", "to", "is"),
    "es": ("el", "la", "los", "y", "no", "es"),
    "fr": ("le", "la", "les", "et", "ne", "est"),
    "zh": ("de", "le", "shi", "bu", "wo", "you"),
}

STOPWORDS = LANG_MARKERS["en"]


def tokens_col(text: Column) -> Column:
    """lower(text) split on non-alphanumeric runs, empties removed —
    the SimpleAnalyzer used by the whole correctness gate."""
    return F.filter(F.split(F.lower(text), TOKEN_RX), lambda t: t != "")


_TOKS_SQL = (
    "toks AS (SELECT doc_id, tok FROM (SELECT doc_id, "
    "unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok "
    "FROM documents) WHERE tok <> '')"
)


def _x1e6(c: Column) -> Column:
    return F.round(c * 1e6).cast("long")


def token_stats(docs: DataFrame, k: int = 200) -> DataFrame:
    """Per-doc token counts: whitespace tokens, analyzer tokens,
    distinct analyzer tokens, mean token length.

    -> (doc_id, n_ws, n_tok, n_distinct, mean_tok_len_x1e6)
    """
    toks = tokens_col(F.col("text"))
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda t: t != "")
    return (
        docs.select(
            "doc_id",
            F.size(ws).alias("n_ws"),
            F.size(toks).alias("n_tok"),
            F.size(F.array_distinct(toks)).alias("n_distinct"),
            _x1e6(
                F.aggregate(
                    toks, F.lit(0).cast("double"), lambda acc, t: acc + F.length(t)
                )
                / F.greatest(F.size(toks), F.lit(1))
            ).alias("mean_tok_len_x1e6"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def token_stats_sql(k: int = 200) -> str:
    return f"""WITH {_TOKS_SQL},
agg AS (
  SELECT doc_id, count(*) AS n_tok, count(DISTINCT tok) AS n_distinct,
         SUM(length(tok))::DOUBLE AS sumlen
  FROM toks GROUP BY doc_id
),
ws AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(text, '\\s+'), t -> t <> '')) AS n_ws
  FROM documents
)
SELECT d.doc_id, ws.n_ws,
       coalesce(a.n_tok, 0) AS n_tok,
       coalesce(a.n_distinct, 0) AS n_distinct,
       CAST(ROUND(coalesce(a.sumlen / greatest(a.n_tok, 1), 0)*1000000) AS BIGINT)
         AS mean_tok_len_x1e6
FROM documents d
JOIN ws ON d.doc_id = ws.doc_id
LEFT JOIN agg a ON d.doc_id = a.doc_id
ORDER BY d.doc_id LIMIT {k}"""


def quality_scores(docs: DataFrame, k: int = 200) -> DataFrame:
    """Heuristic document-quality scoring: alphanumeric-character ratio,
    stopword ratio, type-token ratio, and a combined score — the
    standard cheap pre-filters of a web-scale curation pipeline.

    quality = 0.4*alpha_ratio + 0.3*(1 - stop_ratio) + 0.3*ttr

    -> (doc_id, alpha_ratio_x1e6, stop_ratio_x1e6, ttr_x1e6, quality_x1e6)
    """
    toks = tokens_col(F.col("text"))
    n_tok = F.greatest(F.size(toks), F.lit(1))
    alpha = (
        F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]", ""))
        / F.greatest(F.length(F.col("text")), F.lit(1))
    ).cast("double")
    stop = (
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))) / n_tok
    ).cast("double")
    ttr = (F.size(F.array_distinct(toks)) / n_tok).cast("double")
    quality = F.lit(0.4) * alpha + F.lit(0.3) * (F.lit(1.0) - stop) + F.lit(0.3) * ttr
    return (
        docs.select(
            "doc_id",
            _x1e6(alpha).alias("alpha_ratio_x1e6"),
            _x1e6(stop).alias("stop_ratio_x1e6"),
            _x1e6(ttr).alias("ttr_x1e6"),
            _x1e6(quality).alias("quality_x1e6"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def quality_scores_sql(k: int = 200) -> str:
    stop_in = ",".join(f"'{w}'" for w in STOPWORDS)
    return f"""WITH {_TOKS_SQL},
agg AS (
  SELECT doc_id, count(*) AS n_tok, count(DISTINCT tok) AS n_distinct,
         SUM(CASE WHEN tok IN ({stop_in}) THEN 1 ELSE 0 END) AS n_stop
  FROM toks GROUP BY doc_id
),
base AS (
  SELECT d.doc_id,
    length(regexp_replace(lower(d.text), '[^a-z0-9]', '', 'g'))::DOUBLE
      / greatest(length(d.text), 1) AS alpha,
    coalesce(a.n_stop, 0)::DOUBLE / greatest(coalesce(a.n_tok, 0), 1) AS stop,
    coalesce(a.n_distinct, 0)::DOUBLE / greatest(coalesce(a.n_tok, 0), 1) AS ttr
  FROM documents d LEFT JOIN agg a ON d.doc_id = a.doc_id
)
SELECT doc_id,
  CAST(ROUND(alpha*1000000) AS BIGINT) AS alpha_ratio_x1e6,
  CAST(ROUND(stop*1000000) AS BIGINT) AS stop_ratio_x1e6,
  CAST(ROUND(ttr*1000000) AS BIGINT) AS ttr_x1e6,
  CAST(ROUND((0.4*alpha + 0.3*(1-stop) + 0.3*ttr)*1000000) AS BIGINT) AS quality_x1e6
FROM base ORDER BY doc_id LIMIT {k}"""


def lang_id(docs: DataFrame, k: int = 200) -> DataFrame:
    """Marker-word language classifier: score(lang) = fraction of tokens
    in that language's function-word list; argmax with (score DESC,
    lang ASC) tie-break.

    -> (doc_id, pred_lang, pred_score_x1e6)
    """
    toks = tokens_col(F.col("text"))
    n_tok = F.greatest(F.size(toks), F.lit(1))
    scored = docs.select(
        "doc_id",
        *[
            _x1e6(
                (F.size(F.filter(toks, lambda t: t.isin(*words))) / n_tok).cast(
                    "double"
                )
            ).alias(f"s_{lang}")
            for lang, words in sorted(LANG_MARKERS.items())
        ],
    )
    pairs = F.array(
        *[
            F.struct(
                F.col(f"s_{lang}").alias("score"), F.lit(lang).alias("lang")
            )
            for lang in sorted(LANG_MARKERS)
        ]
    )
    # argmax with (score DESC, lang ASC): sort by (-score, lang), take head
    best = F.array_sort(
        F.transform(
            pairs, lambda p: F.struct((-p["score"]).alias("neg"), p["lang"].alias("lang"))
        )
    )[0]
    return (
        scored.select(
            "doc_id",
            best["lang"].alias("pred_lang"),
            (-best["neg"]).alias("pred_score_x1e6"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def lang_id_sql(k: int = 200) -> str:
    score_cols = ",\n    ".join(
        "SUM(CASE WHEN tok IN ({}) THEN 1 ELSE 0 END)::DOUBLE AS c_{}".format(
            ",".join(f"'{w}'" for w in words), lang
        )
        for lang, words in sorted(LANG_MARKERS.items())
    )
    unions = " UNION ALL ".join(
        f"SELECT doc_id, '{lang}' AS lang, "
        f"CAST(ROUND(c_{lang}/n_tok*1000000) AS BIGINT) AS score FROM agg"
        for lang in sorted(LANG_MARKERS)
    )
    return f"""WITH {_TOKS_SQL},
agg AS (
  SELECT doc_id, greatest(count(*), 1)::DOUBLE AS n_tok,
    {score_cols}
  FROM toks GROUP BY doc_id
),
stacked AS ({unions}),
ranked AS (
  SELECT doc_id, lang, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang ASC) AS rn
  FROM stacked
)
SELECT doc_id, lang AS pred_lang, score AS pred_score_x1e6
FROM ranked WHERE rn = 1 ORDER BY doc_id LIMIT {k}"""


def fingerprints(docs: DataFrame, k: int = 200) -> DataFrame:
    """Canonical document fingerprints: md5 of the raw text (exact-dup
    key) and md5 of the sorted distinct token set (the classic
    "fingerprint clustering" key — word-order / whitespace invariant).

    -> (doc_id, content_hash, canon_fp)
    """
    toks = tokens_col(F.col("text"))
    return (
        docs.select(
            "doc_id",
            F.md5(F.col("text")).alias("content_hash"),
            F.md5(
                F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
            ).alias("canon_fp"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def fingerprints_sql(k: int = 200) -> str:
    return f"""SELECT doc_id, md5(text) AS content_hash,
  md5(array_to_string(list_sort(list_distinct(
    list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> ''))), ' '))
  AS canon_fp
FROM documents ORDER BY doc_id LIMIT {k}"""


def repetition_stats(docs: DataFrame, k: int = 200) -> DataFrame:
    """Within-document repetition filters — the MassiveText quality
    rules of Rae et al. 2021 ("Scaling Language Models: Methods,
    Analysis & Insights from Training Gopher", appendix A1.1): a doc is
    repetitive when too much of it is duplicate lines, one dominant
    n-gram, or duplicated long n-grams.

    Token-fraction renditions (the paper measures character fractions;
    on whitespace-tokenized text the token fraction is the same signal
    and keeps one formula for Spark and the SQL oracle):

    - dup_line:  1 - distinct lines / lines ('\\n'-split)
    - top2gram:  occurrences of the most frequent word 2-gram * 2
                 / n_tokens, capped at 1
    - dup5gram:  (5-gram occurrences - distinct 5-grams) * 5
                 / n_tokens, capped at 1
    - rep_score: greatest of the three (the filter thresholds compare
                 per-metric; the max is the binding one)

    Shape: one explode + groupBy per n-gram width keyed by doc_id, the
    combine map-side — no driver state, linear in corpus size.
    -> (doc_id, dup_line_x1e6, top2gram_x1e6, dup5gram_x1e6,
    rep_score_x1e6) by doc_id."""
    toks = tokens_col(F.col("text"))
    base = docs.select("doc_id", "text", toks.alias("toks"))

    lines = F.split(F.col("text"), "\n")
    dup_line = (
        (F.size(lines) - F.size(F.array_distinct(lines)))
        / F.greatest(F.size(lines), F.lit(1))
    ).cast("double")

    def grams(n: int) -> Column:
        return F.when(
            F.size("toks") >= n,
            F.transform(
                F.sequence(F.lit(1), F.size("toks") - n + 1),
                lambda i: F.concat_ws(" ", F.slice("toks", i, n)),
            ),
        ).otherwise(F.array().cast("array<string>"))

    g2 = (
        base.select("doc_id", F.explode(grams(2)).alias("g"))
        .groupBy("doc_id", "g").count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top2_cnt"))
    )
    g5 = (
        base.select("doc_id", F.explode(grams(5)).alias("g"))
        .groupBy("doc_id", "g").count()
        .groupBy("doc_id")
        .agg(
            (F.sum("count") - F.count("*")).alias("dup5_cnt"),
        )
    )
    n_tok = F.greatest(F.size("toks"), F.lit(1))
    out = (
        base.join(g2, "doc_id", "left")
        .join(g5, "doc_id", "left")
        .select(
            "doc_id",
            _x1e6(dup_line).alias("dup_line_x1e6"),
            _x1e6(
                F.least(
                    F.coalesce(F.col("top2_cnt"), F.lit(0)) * 2 / n_tok,
                    F.lit(1.0),
                )
            ).alias("top2gram_x1e6"),
            _x1e6(
                F.least(
                    F.coalesce(F.col("dup5_cnt"), F.lit(0)) * 5 / n_tok,
                    F.lit(1.0),
                )
            ).alias("dup5gram_x1e6"),
        )
        .withColumn(
            "rep_score_x1e6",
            F.greatest("dup_line_x1e6", "top2gram_x1e6", "dup5gram_x1e6"),
        )
        .orderBy("doc_id")
        .limit(k)
    )
    return out


def repetition_stats_sql(k: int = 200) -> str:
    return f"""WITH tl AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     t -> t <> '') AS ts
  FROM documents
),
lines AS (
  SELECT doc_id,
         len(string_split(text, chr(10))) AS n_lines,
         len(list_distinct(string_split(text, chr(10)))) AS d_lines
  FROM tl
),
g2 AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ts)),
         i -> ts[i] || ' ' || ts[i+1])) AS g
  FROM tl WHERE len(ts) >= 2
),
t2 AS (SELECT doc_id, MAX(c) AS top2_cnt FROM
       (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g)
       GROUP BY doc_id),
g5 AS (
  SELECT doc_id, unnest(list_transform(range(1, len(ts) - 3),
         i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' ||
              ts[i+3] || ' ' || ts[i+4])) AS g
  FROM tl WHERE len(ts) >= 5
),
t5 AS (SELECT doc_id, SUM(c) - count(*) AS dup5_cnt FROM
       (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY doc_id, g)
       GROUP BY doc_id),
base AS (
  SELECT tl.doc_id,
    (l.n_lines - l.d_lines)::DOUBLE / greatest(l.n_lines, 1) AS dl,
    least(coalesce(t2.top2_cnt, 0) * 2.0 / greatest(len(tl.ts), 1), 1.0) AS tg,
    least(coalesce(t5.dup5_cnt, 0) * 5.0 / greatest(len(tl.ts), 1), 1.0) AS dg
  FROM tl JOIN lines l ON l.doc_id = tl.doc_id
  LEFT JOIN t2 ON t2.doc_id = tl.doc_id
  LEFT JOIN t5 ON t5.doc_id = tl.doc_id
)
SELECT doc_id,
  CAST(ROUND(dl*1000000) AS BIGINT) AS dup_line_x1e6,
  CAST(ROUND(tg*1000000) AS BIGINT) AS top2gram_x1e6,
  CAST(ROUND(dg*1000000) AS BIGINT) AS dup5gram_x1e6,
  greatest(CAST(ROUND(dl*1000000) AS BIGINT),
           CAST(ROUND(tg*1000000) AS BIGINT),
           CAST(ROUND(dg*1000000) AS BIGINT)) AS rep_score_x1e6
FROM base ORDER BY doc_id LIMIT {k}"""


# ---------------------------------------------------------------------------
# PII detection / redaction (pipeline axis — not a reference surface).
# Patterns are deliberately restricted to the regex subset with
# identical semantics in Java regex (Spark) and RE2 (DuckDB): character
# classes, bounded repetition, \b word boundaries — no backrefs, no
# lookaround. Spark's regexp_replace is replace-ALL by default; the
# DuckDB twin must pass the 'g' flag to match.
# ---------------------------------------------------------------------------

PII_PATTERNS = {
    # order matters for redaction: emails first (their domains can
    # contain ip-ish digit runs), then ips, then phones
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}",
}


def pii_redact_col(text: Column) -> Column:
    """Sequentially mask every PII class with <CLASS> placeholders."""
    out = text
    for name, pat in PII_PATTERNS.items():
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def pii_stats(
    docs: DataFrame, text_col: str = "text", k: int = 200
) -> DataFrame:
    """Per-doc PII hit counts on the RAW text plus the length of the
    redacted text -> (doc_id, n_email, n_ipv4, n_phone, redacted_len).
    One codegen'd projection; no UDFs, no shuffle."""
    t = F.col(text_col)
    return (
        docs.select(
            "doc_id",
            *[
                F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
                .cast("long").alias(f"n_{name}")
                for name, pat in PII_PATTERNS.items()
            ],
            F.length(pii_redact_col(t)).cast("long").alias("redacted_len"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def pii_stats_sql(
    text_expr: str = "text", k: int = 200, table: str = "documents"
) -> str:
    """DuckDB twin (RE2): len(regexp_extract_all) counts, chained
    regexp_replace with the 'g' flag for the redacted length."""
    counts = ", ".join(
        f"len(regexp_extract_all({text_expr}, '{pat}')) AS n_{name}"
        for name, pat in PII_PATTERNS.items()
    )
    red = text_expr
    for name, pat in PII_PATTERNS.items():
        red = f"regexp_replace({red}, '{pat}', '<{name.upper()}>', 'g')"
    return (
        f"SELECT doc_id, {counts}, CAST(length({red}) AS BIGINT) "
        f"AS redacted_len FROM {table} ORDER BY doc_id LIMIT {k}"
    )


# ---------------------------------------------------------------------------
# Gopher quality rules (Rae et al. 2021, "Scaling Language Models:
# ... Gopher", appendix A1.1 — the published rule set every
# large-scale text pipeline reimplements)
# ---------------------------------------------------------------------------

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_rules(docs: DataFrame, k: int = 200) -> DataFrame:
    """Per-document Gopher rule evaluation. Rules (A1.1):

      bit 1  — word count within [50, 100,000]
      bit 2  — mean word length within [3, 10]
      bit 4  — symbol-to-word ratio ('#' or '...') <= 0.1
      bit 8  — <= 90% of lines start with a bullet ('-', '*', '•')
               (Rae et al. A1.1 removes only MORE than 90%, so the
               fail test is strict >, matching the ellipsis rule)
      bit 16 — <= 30% of lines end with an ellipsis ('...' / '…')
      bit 32 — >= 80% of words contain an alphabetic character
      bit 64 — >= 2 of the 8 Gopher stop words present

    Every ratio test is an integer cross-multiplication (10*sym <=
    n_words, not sym/n <= 0.1), so the engine and the oracle agree
    bit-for-bit with zero float ops.  -> (doc_id, n_words, sum_wlen,
    fail_mask, kept) for the first k docs by doc_id.  One narrow
    codegen projection per doc — embarrassingly parallel at any scale.
    """
    words = "filter(split(text, '\\\\s+'), x -> x != '')"
    lines = "filter(split(text, '\\n'), x -> trim(x) != '')"
    n_words = f"size({words})"
    sum_wlen = f"aggregate({words}, 0, (a, x) -> a + length(x))"
    n_hash = "(length(text) - length(replace(text, '#', '')))"
    n_ell = "((length(text) - length(replace(text, '...', ''))) / 3)"
    n_lines = f"size({lines})"
    n_bullet = (
        f"size(filter({lines}, x -> startswith(trim(x), '-')"
        " OR startswith(trim(x), '*') OR startswith(trim(x), '•')))"
    )
    n_ellend = (
        f"size(filter({lines}, x -> endswith(rtrim(x), '...')"
        " OR endswith(rtrim(x), '…')))"
    )
    n_alpha = f"size(filter({words}, x -> x rlike '[a-zA-Z]'))"
    stop_arr = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    n_stop = (
        f"size(filter(array({stop_arr}),"
        f" s -> array_contains(transform({words}, w -> lower(w)), s)))"
    )
    base = docs.select(
        "doc_id",
        F.expr(n_words).cast("long").alias("n_words"),
        F.expr(sum_wlen).cast("long").alias("sum_wlen"),
        F.expr(n_hash).cast("long").alias("n_hash"),
        F.expr(n_ell).cast("long").alias("n_ell"),
        F.expr(n_lines).cast("long").alias("n_lines"),
        F.expr(n_bullet).cast("long").alias("n_bullet"),
        F.expr(n_ellend).cast("long").alias("n_ellend"),
        F.expr(n_alpha).cast("long").alias("n_alpha"),
        F.expr(n_stop).cast("long").alias("n_stop"),
    )
    n, s = F.col("n_words"), F.col("sum_wlen")
    fails = (
        F.when((n < 50) | (n > 100_000), 1).otherwise(0)
        + F.when((s < 3 * n) | (s > 10 * n), 2).otherwise(0)
        + F.when(
            10 * (F.col("n_hash") + F.col("n_ell")) > n, 4
        ).otherwise(0)
        + F.when(10 * F.col("n_bullet") > 9 * F.col("n_lines"), 8)
        .otherwise(0)
        + F.when(10 * F.col("n_ellend") > 3 * F.col("n_lines"), 16)
        .otherwise(0)
        + F.when(5 * F.col("n_alpha") < 4 * n, 32).otherwise(0)
        + F.when(F.col("n_stop") < 2, 64).otherwise(0)
    )
    return (
        base.select(
            "doc_id", "n_words", "sum_wlen",
            fails.cast("long").alias("fail_mask"),
        )
        .withColumn(
            "kept", (F.col("fail_mask") == 0).cast("long")
        )
        .orderBy("doc_id")
        .limit(k)
    )


def gopher_rules_sql(k: int = 200) -> str:
    """DuckDB twin — identical integer arithmetic."""
    words = "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '')"
    lines = "list_filter(string_split(text, chr(10)), x -> trim(x) <> '')"
    stop_arr = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)
    return f"""WITH c AS (
  SELECT doc_id,
    len({words}) AS c_words,
    list_sum(list_transform({words}, x -> length(x))) AS c_wlen,
    (length(text) - length(replace(text, '#', ''))) AS n_hash,
    ((length(text) - length(replace(text, '...', ''))) / 3) AS n_ell,
    len({lines}) AS n_lines,
    len(list_filter({lines}, x -> starts_with(trim(x), '-')
        OR starts_with(trim(x), '*') OR starts_with(trim(x), '•'))) AS n_bullet,
    len(list_filter({lines}, x -> ends_with(rtrim(x), '...')
        OR ends_with(rtrim(x), '…'))) AS n_ellend,
    len(list_filter({words}, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,
    len(list_filter([{stop_arr}],
        s -> list_contains(list_transform({words}, w -> lower(w)), s))) AS n_stop
  FROM documents
)
SELECT doc_id, CAST(c_words AS BIGINT) AS n_words,
  CAST(COALESCE(c_wlen, 0) AS BIGINT) AS sum_wlen,
  CAST((CASE WHEN c_words < 50 OR c_words > 100000 THEN 1 ELSE 0 END)
   + (CASE WHEN COALESCE(c_wlen, 0) < 3 * c_words
           OR COALESCE(c_wlen, 0) > 10 * c_words THEN 2 ELSE 0 END)
   + (CASE WHEN 10 * (n_hash + n_ell) > c_words THEN 4 ELSE 0 END)
   + (CASE WHEN 10 * n_bullet > 9 * n_lines THEN 8 ELSE 0 END)
   + (CASE WHEN 10 * n_ellend > 3 * n_lines THEN 16 ELSE 0 END)
   + (CASE WHEN 5 * n_alpha < 4 * c_words THEN 32 ELSE 0 END)
   + (CASE WHEN n_stop < 2 THEN 64 ELSE 0 END) AS BIGINT) AS fail_mask,
  CAST((CASE WHEN c_words >= 50 AND c_words <= 100000
    AND COALESCE(c_wlen, 0) >= 3 * c_words
    AND COALESCE(c_wlen, 0) <= 10 * c_words
    AND 10 * (n_hash + n_ell) <= c_words
    AND 10 * n_bullet <= 9 * n_lines
    AND 10 * n_ellend <= 3 * n_lines
    AND 5 * n_alpha >= 4 * c_words
    AND n_stop >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS kept
FROM c ORDER BY doc_id LIMIT {k}"""


# ---------------------------------------------------------------------------
# C4 cleaning heuristics (Raffel et al. 2020, "Exploring the Limits of
# Transfer Learning...", section 2.2 — the published line/page rules)
# ---------------------------------------------------------------------------


def c4_filters(docs: DataFrame, k: int = 200) -> DataFrame:
    """Per-document C4 rule evaluation:

    line rules (a line SURVIVES when all hold):
      - ends in a terminal punctuation mark ('.', '!', '?', '"')
      - contains at least 5 words
      - does not contain the word 'javascript' (case-insensitive)

    page rules (the page is DROPPED when any holds):
      - fewer than 3 surviving sentences/lines
      - contains 'lorem ipsum' (case-insensitive)
      - contains a curly brace '{'

    The paper's bad-words page rule needs its external word list
    (data, not an algorithm) and is deliberately not transcribed —
    the hook is the same contains-any test as the rules above.  The
    three-sentence-span dedup lives in pipeline/dedup.py
    (duplicate-substring removal).

    -> (doc_id, n_lines, n_kept, page_kept) for the first k docs;
    integer counts only, so engine and oracle agree exactly.  One
    narrow projection per doc, no shuffle."""
    lines = "filter(split(text, '\\n'), x -> trim(x) != '')"
    survive = (
        f"size(filter({lines}, x -> "
        "(endswith(rtrim(x), '.') OR endswith(rtrim(x), '!')"
        " OR endswith(rtrim(x), '?') OR endswith(rtrim(x), '\"'))"
        " AND size(filter(split(x, '\\\\s+'), w -> w != '')) >= 5"
        " AND NOT lower(x) rlike 'javascript'))"
    )
    base = docs.select(
        "doc_id",
        F.expr(f"size({lines})").cast("long").alias("n_lines"),
        F.expr(survive).cast("long").alias("n_kept"),
        F.expr("lower(text) rlike 'lorem ipsum'").alias("lorem"),
        F.expr("contains(text, '{')").alias("brace"),
    )
    return (
        base.select(
            "doc_id", "n_lines", "n_kept",
            (
                (F.col("n_kept") >= 3)
                & ~F.col("lorem")
                & ~F.col("brace")
            ).cast("long").alias("page_kept"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def c4_filters_sql(k: int = 200) -> str:
    """DuckDB twin — identical counts."""
    lines = "list_filter(string_split(text, chr(10)), x -> trim(x) <> '')"
    return f"""WITH c AS (
  SELECT doc_id,
    len({lines}) AS c_lines,
    len(list_filter({lines}, x ->
      (ends_with(rtrim(x), '.') OR ends_with(rtrim(x), '!')
       OR ends_with(rtrim(x), '?') OR ends_with(rtrim(x), '"'))
      AND len(list_filter(regexp_split_to_array(x, '\\s+'),
              w -> w <> '')) >= 5
      AND NOT regexp_matches(lower(x), 'javascript'))) AS c_kept,
    regexp_matches(lower(text), 'lorem ipsum') AS lorem,
    contains(text, '{{') AS brace
  FROM documents
)
SELECT doc_id, CAST(c_lines AS BIGINT) AS n_lines,
  CAST(c_kept AS BIGINT) AS n_kept,
  CAST((CASE WHEN c_kept >= 3 AND NOT lorem AND NOT brace
        THEN 1 ELSE 0 END) AS BIGINT) AS page_kept
FROM c ORDER BY doc_id LIMIT {k}"""
