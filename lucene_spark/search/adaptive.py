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

__all__ = [
    "index_or_docvalues_range_topk",
    "index_sort_range_topk",
    "index_sort_range_count",
]


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


def _sorted_segments(reader, sort_col: str):
    """Live segments of an index whose primary sort is ``sort_col``,
    with their (first_doc_id, last_doc_id, sort_min, sort_max) — or
    None when the sorted fast path cannot apply (different sort, NRT
    appends without ranges, merged segments: the reference's
    delegate-to-fallbackQuery conditions)."""
    from lucene_spark.index import manifest as mani

    m = reader.manifest
    if m.get("sort_by") != sort_col:
        return None
    live = mani.live_segment_ids(m)
    segs = []
    for b in m.get("batches", []):
        for s in b["segments"]:
            if live is not None and s["segment_id"] not in live:
                continue
            if s.get("sort_min") is None or s.get("sort_max") is None:
                return None
            segs.append(s)
    for mg in m.get("merges", []) or []:
        for s in mg["segments"]:
            if live is None or s["segment_id"] in live:
                return None
    return segs


def index_sort_range_topk(
    reader,
    sort_col: str,
    lower: float,
    upper: float,
    id_col: str = "doc_id",
    k: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """IndexSortSortedNumericDocValuesRangeQuery (core/search/
    IndexSortSortedNumericDocValuesRangeQuery.java): when the index's
    primary sort is on the queried field, the matching docs form one
    contiguous doc-id interval, located by binary search instead of a
    full evaluation (:240-340 findFirstDoc/lastDoc; matchNone :416);
    otherwise the search delegates to the equivalent fallbackQuery
    (:53-65). Constant score, like the reference.

    Spark mapping: the segment manifest IS the per-segment value
    summary — disjoint segments are dropped driver-side before the scan
    plan exists (matchNone per segment); a segment entirely inside
    [lower, upper] contributes its whole doc-id interval with NO value
    predicate (IteratorAndCount.all, :479); only the <= 2 boundary
    segments carry the value check, where parquet row-group stats on
    the sorted column prune like the binary search. Everything is a
    pushed-down doc_id/value predicate — zero rows collected.

    ``stats`` receives {path, segments_total, segments_kept,
    fully_contained}.
    """
    docs = reader.docs()
    segs = _sorted_segments(reader, sort_col)
    if segs is None:
        if stats is not None:
            stats.update(path="fallback")
        hits = docs.filter(F.col(sort_col).between(lower, upper))
    else:
        kept = [
            s for s in segs
            if s["sort_max"] >= lower and s["sort_min"] <= upper
        ]
        full = [
            s for s in kept
            if s["sort_min"] >= lower and s["sort_max"] <= upper
        ]
        if stats is not None:
            stats.update(
                path="index_sort", segments_total=len(segs),
                segments_kept=len(kept), fully_contained=len(full),
            )
        if not kept:
            hits = docs.filter(F.lit(False))
        else:
            cond = None
            fullset = {s["segment_id"] for s in full}
            for s in kept:
                c = (F.col("doc_id") >= s["first_doc_id"]) & (
                    F.col("doc_id") <= s["last_doc_id"]
                )
                if s["segment_id"] not in fullset:
                    c = c & F.col(sort_col).between(lower, upper)
                cond = c if cond is None else (cond | c)
            hits = docs.filter(cond)
    return (
        hits.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.lit(1_000_000).cast("long").alias("score_x1e6"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def index_sort_range_count(
    reader,
    sort_col: str,
    lower: float,
    upper: float,
    stats: dict | None = None,
) -> DataFrame:
    """Weight#count shortcut of the same query (the IteratorAndCount
    plumbing, IndexSortSortedNumericDocValuesRangeQuery.java:155-214):
    fully-contained segments are counted from the MANIFEST alone
    (num_docs, no scan); only the boundary segments are scanned, and
    only when deletes can't invalidate the arithmetic. -> 1 row (cnt).
    """
    docs = reader.docs()
    segs = _sorted_segments(reader, sort_col)
    n_del = int(reader.manifest.get("num_deleted", 0) or 0)
    if segs is None or n_del:
        if stats is not None:
            stats.update(path="fallback", manifest_docs=0)
        scanned = docs.filter(F.col(sort_col).between(lower, upper))
        return scanned.agg(F.count("*").cast("long").alias("cnt"))
    kept = [
        s for s in segs if s["sort_max"] >= lower and s["sort_min"] <= upper
    ]
    full = [
        s for s in kept if s["sort_min"] >= lower and s["sort_max"] <= upper
    ]
    fullset = {s["segment_id"] for s in full}
    manifest_docs = sum(s["num_docs"] for s in full)
    partial = [s for s in kept if s["segment_id"] not in fullset]
    if stats is not None:
        stats.update(
            path="index_sort", manifest_docs=manifest_docs,
            scanned_segments=len(partial),
        )
    if not partial:
        spark = docs.sparkSession
        return spark.createDataFrame(
            [(manifest_docs,)], "cnt long"
        )
    cond = None
    for s in partial:
        c = (
            (F.col("doc_id") >= s["first_doc_id"])
            & (F.col("doc_id") <= s["last_doc_id"])
            & F.col(sort_col).between(lower, upper)
        )
        cond = c if cond is None else (cond | c)
    return docs.filter(cond).agg(
        (F.count("*") + F.lit(manifest_docs)).cast("long").alias("cnt")
    )
