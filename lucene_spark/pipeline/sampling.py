"""Deterministic corpus splitting & sampling for training pipelines.

Not a reference-engine surface — part of the LLM-data-pipeline
operator set (SURVEY "beyond the reference" axis): every large-scale
training pipeline needs reproducible train/val/test splits and
per-stratum sampling that (a) never shuffle, (b) are stable across
reruns and cluster sizes, and (c) can be recomputed row-locally by any
later job (no membership table to join).

The mechanism is salted-hash bucketing: ``bucket(doc) = md5(id ||
salt) mod 1e6`` — a pure per-row projection, mirrored exactly in ANSI
SQL for the oracle (the synthesize_geo md5 pattern). Splits are
half-open cumulative ranges over the bucket space, so
weights (0.9, 0.05, 0.05) give disjoint, exhaustive, deterministic
assignments; sampling keeps ``bucket < frac * 1e6``. Changing the salt
redraws independently (the standard trick for uncorrelated samples).

100-TB shape: zero shuffles, zero driver state — a codegen'd md5 +
modulo per row, pushdown-friendly when materialized as a column. The
split is also cluster-size invariant by construction (no RNG seeded
per partition, unlike ``DataFrame.randomSplit`` whose assignment
changes with partitioning — the reason this module exists).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = [
    "hash_bucket",
    "hash_split",
    "hash_split_sql",
    "stratified_sample",
    "stratified_sample_sql",
    "mixture_sample",
    "mixture_sample_sql",
]

_SPACE = 1_000_000


def hash_bucket(id_col: str, salt: str) -> Column:
    """Deterministic bucket in [0, 1e6) from md5(id || salt)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(salt))), 1, 8
        ),
        16, 10,
    ).cast("long")
    return (h % _SPACE).alias("bucket")


def _bucket_sql(id_col: str, salt: str) -> str:
    return (
        f"CAST(('0x'||substr(md5(CAST({id_col} AS VARCHAR)||'{salt}'),1,8)) "
        f"AS BIGINT) % {_SPACE}"
    )


def hash_split(
    docs: DataFrame,
    weights: dict[str, float],
    salt: str = "split",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, bucket, split): every row assigned to exactly one
    named split by cumulative bucket ranges (insertion order; the last
    split absorbs rounding remainder so the assignment is exhaustive).
    """
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    b = hash_bucket(id_col, salt)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        hi = int(round(cum * _SPACE))
        expr = (
            F.when(b < hi, F.lit(name))
            if expr is None
            else expr.when(b < hi, F.lit(name))
        )
    split = F.lit(names[-1]) if expr is None else expr.otherwise(names[-1])
    return docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        b.alias("bucket"),
        split.alias("split"),
    )


def hash_split_sql(
    weights: dict[str, float],
    salt: str = "split",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    """DuckDB twin of hash_split (same buckets, same ranges)."""
    b = _bucket_sql(id_col, salt)
    names = list(weights)
    cum = 0.0
    cases = []
    for name in names[:-1]:
        cum += weights[name]
        cases.append(f"WHEN {b} < {int(round(cum * _SPACE))} THEN '{name}'")
    case = (
        f"CASE {' '.join(cases)} ELSE '{names[-1]}' END"
        if cases
        else f"'{names[-1]}'"
    )
    return (
        f"SELECT CAST({id_col} AS BIGINT) AS doc_id, {b} AS bucket, "
        f"{case} AS split FROM {table}"
    )


def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (doc_id, stratum, bucket): rows kept with a per-stratum
    probability (exact bucket-threshold semantics, deterministic and
    re-derivable; strata absent from ``fractions`` use
    ``default_fraction``). The stratified analog of
    DataFrameStatFunctions.sampleBy, minus its partitioning
    sensitivity."""
    b = hash_bucket(id_col, salt)
    thr = None
    for s, f_ in fractions.items():
        t = F.when(F.col(strata_col) == s, int(round(f_ * _SPACE)))
        thr = t if thr is None else thr.when(
            F.col(strata_col) == s, int(round(f_ * _SPACE))
        )
    thr = (
        F.lit(int(round(default_fraction * _SPACE)))
        if thr is None
        else thr.otherwise(int(round(default_fraction * _SPACE)))
    )
    return (
        docs.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.col(strata_col).cast("string").alias("stratum"),
            b.alias("bucket"),
            thr.alias("__thr"),
        )
        .filter(F.col("bucket") < F.col("__thr"))
        .drop("__thr")
    )


def stratified_sample_sql(
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "sample",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    b = _bucket_sql(id_col, salt)
    cases = " ".join(
        f"WHEN CAST({strata_col} AS VARCHAR) = '{s}' "
        f"THEN {int(round(f_ * _SPACE))}"
        for s, f_ in fractions.items()
    )
    thr = (
        f"CASE {cases} ELSE {int(round(default_fraction * _SPACE))} END"
        if cases
        else str(int(round(default_fraction * _SPACE)))
    )
    return (
        f"SELECT CAST({id_col} AS BIGINT) AS doc_id, "
        f"CAST({strata_col} AS VARCHAR) AS stratum, {b} AS bucket "
        f"FROM {table} WHERE {b} < {thr}"
    )


def _mix_threshold_sql(
    budget_frac: float, target_weights: dict[str, float], stratum: str
) -> str:
    """The per-stratum keep threshold as ONE shared SQL expression so
    both engines evaluate the identical float arithmetic: keep
    min(1, budget*total*w_s/c_s) of stratum s."""
    case = " ".join(
        f"WHEN '{s}' THEN {float(w)!r}" for s, w in target_weights.items()
    )
    return (
        f"LEAST({_SPACE}, CAST(ROUND({_SPACE}.0 * {float(budget_frac)!r} "
        f"* total_n * (CASE {stratum} {case} ELSE 0.0 END) / cnt) AS BIGINT))"
    )


def mixture_sample(
    docs: DataFrame,
    strata_col: str,
    target_weights: dict[str, float],
    budget_frac: float,
    salt: str = "mix",
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain mixing (the DoReMi-style fixed-weight resampling shape):
    keep ~``budget_frac`` of the corpus with the SAMPLE's composition
    matching ``target_weights`` — per-stratum keep fraction
    min(1, budget*total*w_s/count_s), evaluated as bucket thresholds.
    Over-demanded strata (fraction capped at 1) keep everything; the
    realized mix then under-weights them, the standard behavior.
    Strata absent from the targets drop entirely.

    Two jobs: one O(#strata) count aggregate (broadcast back), one
    filtered pass. -> (doc_id, stratum, bucket)."""
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(strata_col).cast("string").alias("stratum"),
        hash_bucket(id_col, salt).alias("bucket"),
    )
    cnts = base.groupBy("stratum").agg(F.count(F.lit(1)).alias("cnt"))
    total = cnts.agg(F.sum("cnt").alias("total_n"))
    thr = F.expr(_mix_threshold_sql(budget_frac, target_weights, "stratum"))
    return (
        base.join(F.broadcast(cnts), "stratum")
        .crossJoin(F.broadcast(total))
        .filter(F.col("bucket") < thr)
        .select("doc_id", "stratum", "bucket")
    )


def _temp_threshold_sql(budget_frac: float, alpha: float) -> str:
    """Per-stratum keep threshold for temperature resampling, ONE
    shared SQL string: keep min(1, budget*total*(c^a/sum c^a)/c)."""
    return (
        f"LEAST({_SPACE}, CAST(ROUND({_SPACE}.0 * {float(budget_frac)!r} "
        f"* total_n * (POWER(cnt, {float(alpha)!r}) / wsum) / cnt) "
        f"AS BIGINT))"
    )


def temperature_sample(
    docs: DataFrame,
    strata_col: str,
    alpha: float,
    budget_frac: float,
    salt: str = "temp",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based domain reweighting — the multilingual-corpus
    sampling rule p_d proportional to n_d^alpha (exponentiated
    smoothing, the mBERT/XLM-R recipe; alpha < 1 upweights small
    domains, alpha = 1 is proportional, alpha = 0 is uniform): keep
    fraction per stratum = min(1, budget * total * (n_s^alpha /
    sum_d n_d^alpha) / n_s), realized as deterministic salted-hash
    bucket thresholds so reruns and engines agree row-for-row.

    100-TB shape: one O(#strata) count aggregate broadcast back, one
    filtered pass — identical plan to mixture_sample; the weights are
    just DERIVED from the counts instead of supplied.
    -> (doc_id, stratum, bucket)."""
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(strata_col).cast("string").alias("stratum"),
        hash_bucket(id_col, salt).alias("bucket"),
    )
    cnts = base.groupBy("stratum").agg(F.count(F.lit(1)).alias("cnt"))
    tot = cnts.agg(
        F.sum("cnt").alias("total_n"),
        F.sum(F.pow(F.col("cnt").cast("double"), float(alpha))).alias("wsum"),
    )
    thr = F.expr(_temp_threshold_sql(budget_frac, alpha))
    return (
        base.join(F.broadcast(cnts), "stratum")
        .crossJoin(F.broadcast(tot))
        .filter(F.col("bucket") < thr)
        .select("doc_id", "stratum", "bucket")
    )


def temperature_sample_sql(
    strata_col: str,
    alpha: float,
    budget_frac: float,
    salt: str = "temp",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    b = _bucket_sql(id_col, salt)
    thr = _temp_threshold_sql(budget_frac, alpha)
    return f"""WITH base AS (
  SELECT CAST({id_col} AS BIGINT) AS doc_id,
         CAST({strata_col} AS VARCHAR) AS stratum, {b} AS bucket
  FROM {table}
),
c AS (SELECT stratum, count(*) AS cnt FROM base GROUP BY stratum),
t AS (SELECT SUM(cnt) AS total_n,
             SUM(POWER(cnt, {float(alpha)!r})) AS wsum FROM c)
SELECT b.doc_id, b.stratum, b.bucket
FROM base b JOIN c ON b.stratum = c.stratum CROSS JOIN t
WHERE b.bucket < {thr}"""


def mixture_sample_sql(
    strata_col: str,
    target_weights: dict[str, float],
    budget_frac: float,
    salt: str = "mix",
    id_col: str = "doc_id",
    table: str = "documents",
) -> str:
    b = _bucket_sql(id_col, salt)
    thr = _mix_threshold_sql(budget_frac, target_weights, "b.stratum")
    return f"""WITH base AS (
  SELECT CAST({id_col} AS BIGINT) AS doc_id,
         CAST({strata_col} AS VARCHAR) AS stratum, {b} AS bucket
  FROM {table}
),
c AS (SELECT stratum, count(*) AS cnt FROM base GROUP BY stratum),
t AS (SELECT SUM(cnt) AS total_n FROM c)
SELECT b.doc_id, b.stratum, b.bucket
FROM base b JOIN c ON b.stratum = c.stratum CROSS JOIN t
WHERE b.bucket < {thr}"""
