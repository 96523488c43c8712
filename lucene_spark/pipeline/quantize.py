"""Scalar-quantized (int8) and byte vectors.

Reference parity (semantic contracts, not translations):

- Lucene99ScalarQuantizedVectorsFormat.java / util/quantization/
  ScalarQuantizer.java: a confidence interval clips the component
  distribution (quantiles at (1-confidence)/2 from both ends), then
  linear quantization maps the clipped range onto [0, 127] (7-bit, the
  reference's default). Scoring runs against the quantized values —
  here by dequantizing on the fly (lo + q * scale), which is the same
  affine algebra as the reference's int-dot-plus-correction form but
  stays expressible as exact float64 arithmetic in BOTH engines, so the
  DuckDB oracle can replay it bit-for-bit.
- KnnByteVectorQuery.java: search over byte vectors — the quantized
  array IS the byte vector field; ``sq_cosine_topk`` is the byte-vector
  search path.

Determinism: the clip bounds are EXACT order statistics (the r-th
smallest stored component value, row_number over a value sort), not
interpolated percentiles — both engines pick the identical float, so
quantized vectors, scores, and recall deltas hash-match across
engines. The reference estimates quantiles from a sample for the same
reason at scale (ScalarQuantizer#fromVectors samples); at 100 TB the
rank pass runs over a fixed-size sample instead of a global sort —
documented, not implemented, because the gate corpus is small enough
for the exact pass.

Storage: one int8 per component vs float32 = the 4x memory/IO cut the
reference gets; BENCH records the measured parquet footprint.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from lucene_spark.pipeline.similarity import _COMP_SQL

BITS_MAX = 127  # 7-bit quantization, the reference's default


def sq_train(emb: DataFrame, confidence: float = 0.9) -> tuple[float, float]:
    """-> (lo, hi): the clip bounds. Exact order statistics of the
    component distribution at ranks floor(a*(N-1)) and N-1-floor(a*(N-1))
    with a = (1-confidence)/2 (ScalarQuantizer confidence interval)."""
    from pyspark.sql.window import Window

    comps = emb.select(
        F.explode(F.col("embedding").cast("array<double>")).alias("v")
    )
    n = comps.count()
    if n == 0:
        raise ValueError("no components to train on")
    alpha = (1.0 - confidence) / 2.0
    lo_rank = int(math.floor(alpha * (n - 1)))
    hi_rank = n - 1 - lo_rank
    ranked = comps.withColumn(
        "r", F.row_number().over(Window.orderBy("v")) - 1
    )
    picked = {
        row["r"]: row["v"]
        for row in ranked.filter(F.col("r").isin([lo_rank, hi_rank])).collect()
    }
    return float(picked[lo_rank]), float(picked[hi_rank])


def _quant_col(vcol: Column, lo: float, hi: float) -> Column:
    """array<double> -> array<int> in [0, 127] (transform is fine here:
    quantization is an index-time pass, not the query hot path)."""
    scale = (hi - lo) / float(BITS_MAX)
    return F.transform(
        vcol,
        lambda x: F.least(
            F.lit(BITS_MAX),
            F.greatest(
                F.lit(0), F.round((x - F.lit(lo)) / F.lit(scale)).cast("int")
            ),
        ),
    )


def sq_quantize(emb: DataFrame, lo: float, hi: float) -> DataFrame:
    """-> (vec_id, qvec array<tinyint> in [0,127], label): the stored
    quantized table — one signed byte per component on disk, the
    reference's 4x cut over float32."""
    return emb.select(
        "vec_id",
        _quant_col(F.col("embedding").cast("array<double>"), lo, hi)
        .cast("array<tinyint>")
        .alias("qvec"),
        "label",
    )


def quantize_query(qv: list[float], lo: float, hi: float) -> list[float]:
    """Quantize-then-dequantize the query vector (the reference
    quantizes the query before scoring) — plain float64 python,
    identical arithmetic to the SQL twin."""
    scale = (hi - lo) / float(BITS_MAX)
    out = []
    for x in qv:
        q = min(BITS_MAX, max(0, int(_round_half_away((x - lo) / scale))))
        out.append(lo + q * scale)
    return out


def _round_half_away(x: float) -> float:
    # Spark ROUND and DuckDB round() both round half away from zero;
    # python's round() is half-even, so spell it out
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def sq_cosine_topk(
    emb: DataFrame,
    query_id: int = 0,
    k: int = 10,
    confidence: float = 0.9,
) -> DataFrame:
    """Brute-force cosine top-k over the QUANTIZED vectors (the
    KnnByteVectorQuery scan shape): train bounds, quantize docs and
    query, score dequantized values in an unrolled whole-stage-codegen
    projection. -> (vec_id, cos_x1e6)."""
    from lucene_spark.pipeline.similarity import _query_vec

    lo, hi = sq_train(emb, confidence)
    scale = (hi - lo) / float(BITS_MAX)
    qd = quantize_query(_query_vec(emb, query_id), lo, hi)
    dims = len(qd)
    q = sq_quantize(emb, lo, hi)
    # one SQL string, not a 3x dims py4j Column tree — see
    # similarity._unrolled_cos_sql for why (plan-construction cost)
    from lucene_spark.pipeline.similarity import _dlit

    deq = [
        f"({_dlit(lo)} + CAST(element_at(qvec, {i + 1}) AS DOUBLE) * {_dlit(scale)})"
        for i in range(dims)
    ]
    nq = math.sqrt(sum(x * x for x in qd))
    dot = " + ".join(f"{d} * {_dlit(x)}" for d, x in zip(deq, qd))
    sq2 = " + ".join(f"{d} * {d}" for d in deq)
    cos = F.expr(f"({dot}) / (SQRT({sq2}) * {_dlit(nq)})")
    return (
        q.filter(F.col("vec_id") != query_id)
        .select("vec_id", F.round(cos * 1e6).cast("long").alias("cos_x1e6"))
        .orderBy(F.col("cos_x1e6").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def sq_dequant_df(q: DataFrame, lo: float, hi: float) -> DataFrame:
    """Quantized table -> (vec_id, embedding array<double>, label) with
    dequantized components, so every ANN path (HNSW / IVF / filtered)
    runs unchanged over int8 vectors — the reference's quantized-HNSW
    composition (Lucene99HnswScalarQuantizedVectorsFormat)."""
    scale = (hi - lo) / float(BITS_MAX)
    return q.select(
        "vec_id",
        F.transform(
            F.col("qvec"), lambda x: F.lit(lo) + x.cast("double") * F.lit(scale)
        ).alias("embedding"),
        "label",
    )


def sq_cosine_topk_sql(
    query_id: int = 0, k: int = 10, confidence: float = 0.9
) -> str:
    """DuckDB twin: identical order-statistic bounds, quantization,
    dequantized cosine."""
    alpha = (1.0 - confidence) / 2.0
    return f"""WITH {_COMP_SQL},
ranked AS (SELECT v, row_number() OVER (ORDER BY v) - 1 AS r FROM comp),
nn AS (SELECT count(*) AS n FROM comp),
bounds AS (SELECT
  (SELECT v FROM ranked WHERE r =
     CAST(floor({alpha} * ((SELECT n FROM nn) - 1)) AS BIGINT)) AS lo,
  (SELECT v FROM ranked WHERE r = (SELECT n FROM nn) - 1 -
     CAST(floor({alpha} * ((SELECT n FROM nn) - 1)) AS BIGINT)) AS hi),
qd AS (
  SELECT c.vec_id, c.pos,
    b.lo + LEAST({BITS_MAX}, GREATEST(0,
      CAST(ROUND((c.v - b.lo) / ((b.hi - b.lo) / {BITS_MAX}.0)) AS INT)))
      * ((b.hi - b.lo) / {BITS_MAX}.0) AS v
  FROM comp c CROSS JOIN bounds b
),
qc AS (SELECT pos, v FROM qd WHERE vec_id = {query_id}),
nq AS (SELECT sqrt(SUM(v*v)) AS nq FROM qc),
dots AS (
  SELECT d.vec_id, SUM(d.v * q.v) AS dot, sqrt(SUM(d.v * d.v)) AS na
  FROM qd d JOIN qc q USING (pos)
  WHERE d.vec_id <> {query_id}
  GROUP BY d.vec_id
)
SELECT d.vec_id, CAST(ROUND(d.dot/(d.na*nq.nq)*1000000) AS BIGINT) AS cos_x1e6
FROM dots d CROSS JOIN nq
ORDER BY cos_x1e6 DESC, d.vec_id ASC LIMIT {k}"""
