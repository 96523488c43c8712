"""Late-interaction (ColBERT-style) multi-vector rescoring.

Reference: ``core/search/LateInteractionRescorer.java`` +
``LateInteractionFloatValuesSource.java:151-181`` (ScoreFunction
SUM_MAX_SIM: score = sum over query token vectors of the max over doc
token vectors of the similarity) and ``core/document/
LateInteractionField.java`` (a doc's multi-vector = variable-length
list of fixed-dim token vectors). The per-pair similarity is Lucene's
``VectorSimilarityFunction.COSINE`` — the (1 + cosine) / 2 unit-range
normalization. Docs with no multi-vector score 0
(LateInteractionRescorer javadoc).

100-TB shape: the rescorer touches the FIRST-PASS TOP-N ONLY, so the
explode of doc token vectors is N x tokens_per_doc rows — bounded by
the page, not the corpus. Each query token's cosine is an UNROLLED
codegen projection (cosine_lit_col — HOFs are CodegenFallback); the
max-per-doc-per-query-token collapses in ONE map-side-combined groupBy
(the single shuffle), and the sum over query tokens is a width-|Q|
projection on the aggregate. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.pipeline.similarity import cosine_lit_col

__all__ = ["late_interaction_rescore_flat", "late_interaction_rescore"]


def late_interaction_rescore_flat(
    tokens: DataFrame,
    group_col: str,
    vec_col: str,
    query_vectors: list[list[float]],
    k: int = 10,
    id_out: str = "doc_id",
) -> DataFrame:
    """SUM_MAX_SIM over a FLAT token table (one row per doc token
    vector — the natural Spark storage for LateInteractionField).
    -> (id_out, score_x1e6) by (score DESC, id ASC) top-k."""
    cols = [
        ((F.lit(1.0) + cosine_lit_col(vec_col, qv)) / 2.0).alias(f"_s{i}")
        for i, qv in enumerate(query_vectors)
    ]
    per_tok = tokens.select(F.col(group_col).alias(id_out), *cols)
    agg = per_tok.groupBy(id_out).agg(
        *[F.max(f"_s{i}").alias(f"_m{i}") for i in range(len(query_vectors))]
    )
    total = sum(F.col(f"_m{i}") for i in range(len(query_vectors)))
    return (
        agg.select(
            id_out, F.round(total * 1e6).cast("long").alias("score_x1e6")
        )
        .orderBy(F.col("score_x1e6").desc(), F.col(id_out).asc())
        .limit(k)
    )


def late_interaction_rescore(
    first_pass: DataFrame,
    docs: DataFrame,
    mvec_col: str,
    query_vectors: list[list[float]],
    k: int = 10,
    id_col: str = "doc_id",
) -> DataFrame:
    """LateInteractionRescorer.rescore: rerank the first-pass hits
    (`first_pass` carries id_col) by SUM_MAX_SIM against the docs'
    multi-vector column (array<array<float>>). Hits whose doc has no
    multi-vector (NULL or empty) score 0, as the reference assigns.
    -> (id_col, score_x1e6)."""
    hits = first_pass.select(id_col).distinct()
    mv = docs.join(hits, id_col, "left_semi").select(
        id_col, F.col(mvec_col).alias("_mv")
    )
    toks = mv.select(id_col, F.explode("_mv").alias("_tok"))
    scored = late_interaction_rescore_flat(
        toks, id_col, "_tok", query_vectors, k=2**31 - 1, id_out=id_col
    )
    return (
        hits.join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("score_x1e6", F.lit(0)).cast("long")
            .alias("score_x1e6"),
        )
        .orderBy(F.col("score_x1e6").desc(), F.col(id_col).asc())
        .limit(k)
    )
