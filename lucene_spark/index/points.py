"""BKD-analog multi-dimensional point index: Z-order-clustered Parquet
plus a file-level bounds manifest.

Reference: ``core/util/bkd/BKDWriter.java`` / ``BKDReader.java`` (the
"Points sink" row of SURVEY §2.1). The reference builds a balanced
k-d tree per segment over up to 8 numeric dims: inner nodes carry
split planes and cell bounds, leaves pack ~512 points; a range query
descends only the cells intersecting the query box. This module keeps
the two roles but maps them onto Spark's storage layer instead of a
bespoke file format:

- **leaves** = Parquet row groups. Once the rows are clustered, the
  per-row-group column min/max stats ARE the leaf cell bounds, and the
  scan prunes them for free through the pushed predicates.
- **inner nodes** = a tiny per-file bounds manifest (per-dim min/max,
  collected in one pass after the write), pruned driver-side before
  the scan plan is even built — the query never opens a file whose
  bounding box misses the query box.

Clustering is interleaved-bit Morton order (Z-order) over
rank-normalized dims — the standard cluster-for-multidim-pruning
layout (the same role as BKD's recursive split-on-widest-dimension:
both produce cells with bounded extent in EVERY dim, so a box query
touches O(surface) cells, not all of them).

100-TB shape: the write is ONE range shuffle on the z-code (sampled
range partitioner, embarrassingly parallel before and after), the
manifest is O(files) rows (thousands) on the driver, and a query scans
only the surviving files with predicates pushed to the remaining row
groups. Nothing here is per-row Python.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "zorder_expr",
    "bkd_write",
    "bkd_scan",
    "bkd_range_query",
]

# no leading underscore: Hadoop treats "_"/"." paths as hidden and
# warns (or skips) even on explicit reads; the manifest lives beside
# data/, never under it, so a data scan can't pick it up anyway
_MANIFEST = "bkd_manifest"
_META = "_bkd_meta.json"


def zorder_expr(cols: list[str], bounds: dict[str, tuple[float, float]],
                bits: int = 16) -> str:
    """SQL expression interleaving ``bits`` quantized bits per dim into
    one BIGINT Morton code (dim 0 owns the least-significant position
    of each bit group, matching the classic x/y interleave).

    Quantization is linear over the given per-column [lo, hi] bounds
    into [0, 2^bits - 1]; NULLs sort as 0 (layout only — query
    correctness never depends on the code). Built as one expression
    string: ``len(cols) * bits`` shift/AND terms stay inside
    whole-stage codegen and cost one JVM parse to plan.
    """
    d = len(cols)
    if d * bits > 63:
        raise ValueError(f"{d} dims x {bits} bits exceeds a signed BIGINT")
    qcols = []
    for c in cols:
        lo, hi = bounds[c]
        lo, hi = float(lo), float(hi)
        span = hi - lo if hi > lo else 1.0
        top = (1 << bits) - 1
        q = (
            f"CAST(LEAST(CAST({top} AS BIGINT), GREATEST(CAST(0 AS BIGINT), "
            f"CAST(FLOOR((CAST({c} AS DOUBLE) - {lo!r}D) / {span!r}D * {top}) "
            f"AS BIGINT))) AS BIGINT)"
        )
        qcols.append(f"COALESCE({q}, CAST(0 AS BIGINT))")
    terms = []
    for b in range(bits):
        for j, q in enumerate(qcols):
            # bit b of dim j lands at interleaved position b*d + j
            terms.append(f"SHIFTLEFT(SHIFTRIGHT({q}, {b}) & 1, {b * d + j})")
    return " | ".join(terms)


def bkd_write(
    df: DataFrame,
    dims: list[str],
    path: str,
    num_files: int = 32,
    bits: int = 16,
) -> dict:
    """Cluster ``df`` by the Morton code of ``dims`` and write it as a
    point index at ``path``: Parquet data files in z-order plus the
    per-file bounds manifest. Returns the meta dict.

    One pass computes the global per-dim bounds (the quantization
    frame), one range shuffle orders by the code, one aggregation over
    the written files collects the manifest. Schema is preserved; the
    z-code is not stored (it is a layout device, derivable).
    """
    spark = df.sparkSession
    row = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in dims],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in dims],
    ).head()
    bounds = {c: (row[f"lo_{c}"], row[f"hi_{c}"]) for c in dims}
    for c, (lo, hi) in bounds.items():
        if lo is None or hi is None:
            raise ValueError(f"dim {c!r} is entirely NULL")
    z = F.expr(zorder_expr(dims, bounds, bits))
    data_dir = os.path.join(path, "data")
    (
        df.withColumn("__z", z)
        .repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(data_dir)
    )
    written = spark.read.parquet(data_dir)
    (
        written.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count("*").alias("rows"),
            *[F.min(c).cast("double").alias(f"lo_{c}") for c in dims],
            *[F.max(c).cast("double").alias(f"hi_{c}") for c in dims],
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(path, _MANIFEST))
    )
    meta = {"dims": dims, "bits": bits, "rows": row["__n"],
            "bounds": {c: [bounds[c][0], bounds[c][1]] for c in dims}}
    with open(os.path.join(path, _META), "w") as f:
        json.dump(meta, f)
    return meta


def _prune_files(
    spark: SparkSession, path: str, ranges: dict[str, tuple]
) -> tuple[list[str], int]:
    """Driver-side inner-node descent: files whose per-dim bounding box
    intersects every constrained range. Returns (files, total_files).
    The manifest is O(files) rows — a driver collect by design (the
    same information the reference keeps in its in-heap inner nodes).
    """
    man = spark.read.parquet(os.path.join(path, _MANIFEST))
    rows = man.collect()
    keep = []
    for r in rows:
        ok = True
        for c, (lo, hi) in ranges.items():
            if lo is not None and r[f"hi_{c}"] < float(lo):
                ok = False
                break
            if hi is not None and r[f"lo_{c}"] > float(hi):
                ok = False
                break
        if ok:
            keep.append(r["file"])
    return keep, len(rows)


def bkd_scan(
    spark: SparkSession,
    path: str,
    ranges: dict[str, tuple],
    stats: dict | None = None,
) -> DataFrame:
    """Multi-dim range scan over a bkd_write index: manifest-pruned
    file list, then a Parquet scan of only those files with the range
    predicates pushed down (row-group stats prune the rest — the leaf
    level). ``ranges`` maps column -> (lo, hi); either side may be
    None for a half-open range. Rows with NULL in a constrained dim do
    not match (PointRangeQuery semantics: a doc without the point is
    never a hit). ``stats`` (optional) records files_total /
    files_scanned — the pruning evidence the tests assert.
    """
    files, total = _prune_files(spark, path, ranges)
    if stats is not None:
        stats["files_total"] = total
        stats["files_scanned"] = len(files)
    schema = spark.read.parquet(os.path.join(path, "data")).schema
    if not files:
        return spark.createDataFrame([], schema)
    df = spark.read.schema(schema).parquet(*files)
    for c, (lo, hi) in ranges.items():
        if lo is not None:
            df = df.filter(F.col(c) >= lo)
        if hi is not None:
            df = df.filter(F.col(c) <= hi)
    return df


def bkd_range_query(
    spark: SparkSession,
    path: str,
    ranges: dict[str, tuple],
    id_col: str,
    k: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Gate-shaped wrapper: constant-score hits of the box query,
    ordered by id — (doc_id, score_x1e6)."""
    hits = bkd_scan(spark, path, ranges, stats=stats)
    return (
        hits.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.lit(1_000_000).cast("long").alias("score_x1e6"),
        )
        .orderBy("doc_id")
        .limit(k)
    )
