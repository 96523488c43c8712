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
