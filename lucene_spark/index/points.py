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
import math
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = [
    "zorder_expr",
    "bkd_write",
    "bkd_scan",
    "bkd_range_query",
    "bkd_nearest",
    "point_nearest_topk",
    "point_nearest_sql",
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


def bkd_nearest(
    spark: SparkSession,
    path: str,
    dist_of,
    bound_of,
    k: int,
    slack: float = 0.0,
    stats: dict | None = None,
) -> DataFrame:
    """Best-first nearest-neighbor traversal at file granularity
    (core/document/NearestNeighbor.java, the engine behind
    LatLonPoint.nearest, and sandbox/document/
    FloatPointNearestNeighbor.java). The reference pops BKD cells off
    a priority queue ordered by the cell's minimum possible distance
    to the query and stops once the current k-th hit beats the nearest
    unvisited cell. Files play the cells here:

    1. rank manifest files by an ADMISSIBLE lower bound of the
       query-to-bbox distance (``bound_of(manifest_row) -> float``,
       which must never exceed the true distance to any point stored
       in the file — looser bounds cost extra candidate files, never
       correctness);
    2. scan the smallest bound-ordered prefix holding >= k rows (the
       seed) and take the k-th exact distance d_k;
    3. a file whose bound exceeds d_k + slack can hold nothing that
       enters the top-k — scan only the survivors, exact distances via
       ``dist_of(df) -> Column``.

    Two Spark jobs in the common case. At 100 TB the seed is the
    handful of z-order-clustered files around the query point and the
    survivor set is the analog of the reference's visited cells; the
    rest of the corpus is never opened. ``slack`` widens the cut so
    callers that ORDER BY a *rounded* distance still see every row
    that could tie into the rounded top-k (pass one rounding quantum).
    Rows with a NULL distance never match (PointRangeQuery contract);
    the seed auto-extends if NULLs starve it below k rows.

    Returns the surviving candidate rows with a ``__dist`` column —
    callers shape, round, order and limit.
    """
    man = spark.read.parquet(os.path.join(path, _MANIFEST)).collect()
    ranked = sorted(man, key=bound_of)
    schema = spark.read.parquet(os.path.join(path, "data")).schema
    if stats is not None:
        stats["files_total"] = len(ranked)

    def _scan(files: list[str]) -> DataFrame:
        df = spark.read.schema(schema).parquet(*files)
        return df.withColumn("__dist", dist_of(df)).filter(
            F.col("__dist").isNotNull()
        )

    empty = spark.createDataFrame([], schema).withColumn(
        "__dist", F.lit(None).cast("double")
    )
    if not ranked:
        if stats is not None:
            stats["files_seed"] = 0
            stats["files_scanned"] = 0
        return empty

    total_rows = sum(r["rows"] for r in ranked)
    if total_rows <= k:
        files = [r["file"] for r in ranked]
        if stats is not None:
            stats["files_seed"] = len(files)
            stats["files_scanned"] = len(files)
        return _scan(files)

    # seed: smallest bound-ordered prefix that holds >= k rows; extend
    # (doubling) only in the NULL-starved case
    n_seed = 0
    cum = 0
    for r in ranked:
        n_seed += 1
        cum += r["rows"]
        if cum >= k:
            break
    d_k = None
    while True:
        seed_files = [r["file"] for r in ranked[:n_seed]]
        top = _scan(seed_files).orderBy("__dist").limit(k)
        got = top.agg(
            F.count(F.lit(1)).alias("n"), F.max("__dist").alias("d")
        ).head()
        if got["n"] >= k or n_seed >= len(ranked):
            d_k = got["d"]
            break
        n_seed = min(len(ranked), max(n_seed + 1, 2 * n_seed))
    if stats is not None:
        stats["files_seed"] = n_seed
    if d_k is None:
        # every stored distance was NULL
        if stats is not None:
            stats["files_scanned"] = 0
        return empty
    radius = float(d_k) + slack
    survivors = [r["file"] for r in ranked if bound_of(r) <= radius]
    if stats is not None:
        stats["files_scanned"] = len(survivors)
    if not survivors:
        return empty
    return _scan(survivors)


def point_nearest_topk(
    spark: SparkSession,
    path: str,
    point: dict[str, float],
    id_col: str,
    k: int = 10,
    scale: int = 1000,
    stats: dict | None = None,
) -> DataFrame:
    """Exact Euclidean k-nearest over a bkd_write index
    (sandbox/document/FloatPointNearestNeighbor.java): the per-file
    lower bound is the clamp distance to the bbox (exact for a box
    under L2). Distance is emitted rounded at 1/scale granularity so
    double ulp differences between engines cannot flip the value; ties
    break by doc_id in both engines. -> (doc_id, dist_scaled)."""

    def dist_of(df: DataFrame):
        s = None
        for c, q in point.items():
            t = F.col(c).cast("double") - F.lit(float(q))
            term = t * t
            s = term if s is None else s + term
        return F.sqrt(s)

    def bound_of(row) -> float:
        s = 0.0
        for c, q in point.items():
            lo, hi = row[f"lo_{c}"], row[f"hi_{c}"]
            gap = max(0.0, lo - float(q), float(q) - hi)
            s += gap * gap
        return math.sqrt(s)

    cand = bkd_nearest(
        spark, path, dist_of, bound_of, k, slack=1.0 / scale, stats=stats
    )
    return (
        cand.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.round(F.col("__dist") * scale).cast("long").alias("dist_scaled"),
        )
        .orderBy(F.col("dist_scaled").asc(), F.col("doc_id").asc())
        .limit(k)
    )


def point_nearest_sql(
    table: str,
    point: dict[str, float],
    id_col: str,
    k: int = 10,
    scale: int = 1000,
) -> str:
    """DuckDB twin of point_nearest_topk: the same full-precision
    Euclidean expression over the full table (the oracle needs no
    index), rounded and tie-broken identically."""
    terms = " + ".join(
        f"(CAST({c} AS DOUBLE) - {float(q)!r}) * (CAST({c} AS DOUBLE) - {float(q)!r})"
        for c, q in point.items()
    )
    return (
        f"SELECT {id_col} AS doc_id, "
        f"CAST(ROUND(sqrt({terms}) * {scale}) AS BIGINT) AS dist_scaled "
        f"FROM {table} WHERE sqrt({terms}) IS NOT NULL "
        f"ORDER BY dist_scaled ASC, doc_id ASC LIMIT {k}"
    )


def check_points_index(spark: SparkSession, path: str) -> dict:
    """CheckIndex for the points sink — the ``CheckIndex.testPoints``
    role (core/index/CheckIndex.java: every packed value must sit
    inside its cell's bounds, leaf counts must match the tree's
    metadata). Here cells are files, so the invariants become:

    - the manifest lists exactly the data files on disk;
    - per file: recomputed per-dim min/max equal the manifest bounds
      (a point outside its cell would make pruning UNSOUND, the same
      corruption testPoints exists to catch) and row counts match;
    - global: sum(manifest rows) == meta rows == scan count, and the
      meta's quantization bounds contain every per-file bound.

    One distributed aggregate; O(files) comparison on the driver.
    Returns {ok, violations: [...], files} and never mutates."""
    with open(os.path.join(path, _META)) as f:
        meta = json.load(f)
    dims = meta["dims"]
    man = {
        r["file"]: r
        for r in spark.read.parquet(os.path.join(path, _MANIFEST)).collect()
    }
    data = spark.read.parquet(os.path.join(path, "data"))
    actual = (
        data.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            *[F.min(c).cast("double").alias(f"lo_{c}") for c in dims],
            *[F.max(c).cast("double").alias(f"hi_{c}") for c in dims],
        )
        .collect()
    )
    v: list[str] = []
    seen = set()
    total = 0
    for r in actual:
        seen.add(r["file"])
        m = man.get(r["file"])
        if m is None:
            v.append(f"data file missing from manifest: {r['file']}")
            continue
        if m["rows"] != r["rows"]:
            v.append(f"{r['file']}: manifest rows {m['rows']} != {r['rows']}")
        total += r["rows"]
        for c in dims:
            for side, cmp_bad in ((f"lo_{c}", lambda a, b: a != b),
                                  (f"hi_{c}", lambda a, b: a != b)):
                a, b = m[side], r[side]
                if (a is None) != (b is None) or (
                    a is not None and cmp_bad(a, b)
                ):
                    v.append(
                        f"{r['file']}: {side} manifest={a} recomputed={b}"
                    )
        glo = meta["bounds"]
        for c in dims:
            if r[f"lo_{c}"] is not None and (
                r[f"lo_{c}"] < glo[c][0] or r[f"hi_{c}"] > glo[c][1]
            ):
                v.append(f"{r['file']}: {c} bounds escape the meta frame")
    for f_ in man:
        if f_ not in seen:
            v.append(f"manifest file missing on disk: {f_}")
    if total != meta["rows"]:
        v.append(f"row total {total} != meta rows {meta['rows']}")
    return {"ok": not v, "violations": v, "files": len(man)}
