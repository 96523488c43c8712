"""FuzzyLikeThisQuery — fuzzified like-this matching.

Reference: ``sandbox/src/java/org/apache/lucene/sandbox/queries/
FuzzyLikeThisQuery.java``. The query "fuzzifies" user text: each
analyzed term enumerates its fuzzy variants from the term dictionary
(FuzzyTermsEnum: boost 1.0 for an exact match, else
``1 - editDistance / min(len(variant), len(term))``), keeps the top
``MAX_VARIANTS_PER_TERM`` (= 50) variants per term, rescores each as
``boost^2 * ClassicSimilarity.idf(df, numDocs)`` where ``df`` is the
ORIGINAL term's doc freq (or the integer-division average of the
variant dfs when the original is absent — FuzzyLikeThisQuery.java:241),
then keeps the global top ``maxNumTerms`` variants and rewrites to a
boosted SHOULD disjunction.

Implemented mode: ``ignoreTF`` (ConstantScore(TermQuery)^score — a
doc's score is the SUM of the scores of the variants it contains).
The default mode's artificial df=1 TF path is not carried — it
depends on the searcher's TFIDF plumbing and is flagged as a rewrite
hack by the reference's own comments (FuzzyLikeThisQuery.java:69-71).

Cross-engine determinism: every variant score is quantized to 1e-6
BEFORE the per-doc summation, so engine and oracle add identical
integers (the last-ulp-of-ln risk never reaches the hash compare).

100-TB shape: variant enumeration rides the term-dictionary expansion
path (reader.expand — JVM levenshtein over the sorted term column,
driver sees only the <= 50·|terms| candidates); the final query is a
constant-score disjunction over <= maxNumTerms terms — one postings
lookup + a map-side-combined sum.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from lucene_spark.search import query as Q

__all__ = ["fuzzy_like_this_topk", "fuzzy_like_this_sql"]

MAX_VARIANTS_PER_TERM = 50  # FuzzyLikeThisQuery.java:76


def _variant_scores(
    reader, field: str, terms: list[str],
    max_num_terms: int, max_edits: int, prefix_length: int,
) -> list[tuple[str, int]]:
    """-> [(variant, score_x1e6)] — the global top maxNumTerms."""
    num_docs = reader.collection_stats(field).doc_count
    seen: list[tuple[float, str]] = []
    for t in dict.fromkeys(terms):  # unique, order-preserving
        variants = reader.expand(
            Q.FuzzyQuery(field, t, max_edits=max_edits,
                         prefix_length=prefix_length)
        )
        if not variants:
            continue
        # df of every candidate (and of the source term) in one tiny agg
        df_rows = (
            reader.postings()
            .filter((F.col("field") == field)
                    & F.col("term").isin(list(set(variants) | {t})))
            .groupBy("term")
            .agg(F.sum("doc_freq").alias("df"))
            .collect()
        )
        dfs = {r["term"]: int(r["df"]) for r in df_rows}
        scored = []
        for v in variants:
            if v == t:
                boost = 1.0
            else:
                ed = _edit_distance(t, v)
                boost = 1.0 - ed / min(len(v), len(t))
            scored.append((boost, v))
        scored.sort(key=lambda bv: (-bv[0], bv[1]))
        top = scored[:MAX_VARIANTS_PER_TERM]
        df = dfs.get(t, 0)
        if df == 0:
            # average over ALL enumerated variants (the reference sums
            # docfreqs during enumeration, before the top-50 cut, :222)
            tot = sum(dfs.get(v, 0) for v in variants)
            df = tot // len(variants)  # Java int division, :241
        idf = math.log((num_docs + 1) / (df + 1)) + 1.0
        for boost, v in top:
            seen.append((boost * boost * idf, v))
    seen.sort(key=lambda sv: (-sv[0], sv[1]))
    return [
        (v, int(round(s * 1_000_000))) for s, v in seen[:max_num_terms]
    ]


def _edit_distance(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def fuzzy_like_this_topk(
    reader,
    field: str,
    text: str,
    k: int = 10,
    max_num_terms: int = 10,
    max_edits: int = 1,
    prefix_length: int = 1,
    analyze=None,
) -> DataFrame:
    """-> (doc_id, score_x1e6): per-doc sum of the quantized scores of
    the chosen variants it contains, best first (ignoreTF mode)."""
    from lucene_spark.search.sqlpath import exploded_postings

    if analyze is None:
        from lucene_spark.analysis import get_analyzer

        analyze = get_analyzer("simple").tokenize_one
    chosen = _variant_scores(
        reader, field, analyze(text), max_num_terms, max_edits,
        prefix_length,
    )
    if not chosen:
        return reader.spark.createDataFrame(
            [], "doc_id long, score_x1e6 long"
        )
    spark = reader.spark
    boosts = spark.createDataFrame(chosen, "term string, s long")
    matched = (
        exploded_postings(reader, field, [v for v, _ in chosen])
        .select("term", "doc_id").distinct()
    )
    return (
        matched.join(F.broadcast(boosts), "term")
        .groupBy("doc_id")
        .agg(F.sum("s").alias("score_x1e6"))
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def fuzzy_like_this_sql(
    terms: list[str],
    k: int = 10,
    max_num_terms: int = 10,
    max_edits: int = 1,
    prefix_length: int = 1,
) -> str:
    """DuckDB twin over the shared toks CTE (caller prepends it): the
    same variant enumeration / boost / idf / quantize / sum ladder."""
    qt = ", ".join(f"('{t}')" for t in dict.fromkeys(terms))
    p = prefix_length
    return f"""
vocab AS (SELECT tok, count(DISTINCT doc_id) AS df FROM toks GROUP BY tok),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS DOUBLE) AS n FROM toks),
qt(src) AS (VALUES {qt}),
var AS (
  SELECT q.src, v.tok AS variant, v.df,
    CASE WHEN v.tok = q.src THEN 1.0
         ELSE 1.0 - levenshtein(q.src, v.tok) * 1.0
              / least(length(v.tok), length(q.src)) END AS boost
  FROM qt q JOIN vocab v
    ON levenshtein(q.src, v.tok) <= {max_edits}
   AND substr(v.tok, 1, {p}) = substr(q.src, 1, {p})
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY src
    ORDER BY boost DESC, variant ASC) AS rk FROM var
),
top_var AS (SELECT * FROM ranked WHERE rk <= {MAX_VARIANTS_PER_TERM}),
srcdf AS (
  -- df of the source term; absent -> int-division average over ALL
  -- enumerated variants (pre-top-50, FuzzyLikeThisQuery.java:222,241)
  SELECT t.src,
    coalesce((SELECT v.df FROM vocab v WHERE v.tok = t.src),
             CAST(SUM(t.df) // COUNT(*) AS BIGINT)) AS df
  FROM var t GROUP BY t.src
),
scored AS (
  SELECT t.variant,
    CAST(ROUND(t.boost * t.boost
      * (ln(((SELECT n FROM nd) + 1) / (s.df + 1)) + 1.0)
      * 1000000) AS BIGINT) AS s
  FROM top_var t JOIN srcdf s ON s.src = t.src
),
chosen AS (
  SELECT variant, s FROM scored
  ORDER BY s DESC, variant ASC LIMIT {max_num_terms}
),
hits AS (
  SELECT DISTINCT x.doc_id, c.variant, c.s
  FROM toks x JOIN chosen c ON x.tok = c.variant
)
SELECT doc_id, CAST(SUM(s) AS BIGINT) AS score_x1e6
FROM hits GROUP BY doc_id
ORDER BY score_x1e6 DESC, doc_id ASC LIMIT {k}"""
