"""IndexOrDocValuesQuery — cost-based choice between the range INDEX
and per-document VERIFICATION.

Reference: ``core/search/IndexOrDocValuesQuery.java``. Both wrapped
queries match the same documents; the ScorerSupplier picks per segment
(:186-182): ``threshold = indexCost >>> 3; use the index iff
threshold <= leadCost`` — when another clause already leads iteration
with far fewer candidates than the range would produce, opening the
range's index structure is wasted work and a cheap per-document
docvalues check wins; when the range itself must lead (or the lead is
not much smaller), the index's sorted iterator wins.

Spark mapping for the canonical ``term MUST + numeric-range FILTER``:

- **index path**: scan the range through the z-order points index
  (file-manifest prune + pushed predicates — index/points.bkd_scan),
  then LEFT SEMI join the term's postings docs. The range index leads.
- **docvalues path**: the term's postings lead (the cheap selective
  iterator) and the range becomes a plain column predicate verified on
  the matched docs only — no points files opened at all.

Cost inputs mirror the reference's: ``leadCost`` = the term's df from
the term dictionary (one O(1)-row aggregate); ``indexCost`` = the row
count of manifest files surviving the range prune — an upper bound at
file granularity, exactly the cell-granularity over-count
``PointValues#estimateCost`` gives the reference.

Both paths return identical rows (the correctness tests assert it and
the driver gate oracles one of them); only the plan differs — which is
the entire point of the operator.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["index_or_docvalues_range_topk"]


def _lead_cost(reader, field: str, term: str) -> int:
    row = (
        reader.postings()
        .filter((F.col("field") == field) & (F.col("term") == term))
        .agg(F.sum("doc_freq").alias("df"))
        .head()
    )
    return int(row["df"] or 0)


def _index_cost(spark: SparkSession, points_path: str,
                ranges: dict[str, tuple]) -> int:
    from lucene_spark.index.points import _prune_files

    files, _ = _prune_files(spark, points_path, ranges)
    if not files:
        return 0
    man = spark.read.parquet(os.path.join(points_path, "bkd_manifest"))
    row = man.filter(F.col("file").isin(files)).agg(
        F.sum("rows").alias("n")
    ).head()
    return int(row["n"] or 0)


def index_or_docvalues_range_topk(
    spark: SparkSession,
    reader,
    points_path: str,
    field: str,
    term: str,
    ranges: dict[str, tuple],
    k: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Constant-score hits matching ``term`` AND the numeric box,
    ordered by doc_id — plan chosen by the reference's cost rule.
    ``stats`` (optional) records lead_cost / index_cost / path."""
    from lucene_spark.search.sqlpath import exploded_postings

    lead = _lead_cost(reader, field, term)
    idx_cost = _index_cost(spark, points_path, ranges)
    use_index = (idx_cost >> 3) <= lead
    if stats is not None:
        stats.update(
            lead_cost=lead, index_cost=idx_cost,
            path="index" if use_index else "docvalues",
        )
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    if use_index:
        from lucene_spark.index.points import bkd_scan

        hits = bkd_scan(spark, points_path, ranges).select("doc_id").join(
            matched, "doc_id", "left_semi"
        )
    else:
        docs = reader.docs().join(matched, "doc_id", "left_semi")
        for c, (lo, hi) in ranges.items():
            if lo is not None:
                docs = docs.filter(F.col(c) >= lo)
            if hi is not None:
                docs = docs.filter(F.col(c) <= hi)
        hits = docs.select("doc_id")
    return (
        hits.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            F.lit(1_000_000).cast("long").alias("score_x1e6"),
        )
        .orderBy("doc_id")
        .limit(k)
    )
