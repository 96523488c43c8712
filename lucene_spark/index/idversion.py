"""IDVersion postings (sandbox/codecs/idversion/IDVersionPostingsFormat
.java + IDVersionPostingsWriter.java + IDVersionSegmentTermsEnum.java):
a primary-key (ID) dictionary that also records a long VERSION per ID,
built for optimistic-concurrency ingest — "during indexing ... decide
whether the document you are about to index was already indexed with a
higher version, and skip it if so" (IDVersionPostingsFormat javadoc).

Contract carried exactly:

- version bounds: MIN_VERSION (0) <= v <= MAX_VERSION (0x3fff...f, the
  ZigZag headroom) — out-of-range raises like IDVersionPostingsWriter;
- an ID appears AT MOST ONCE ("ID must not appear more than once",
  IDVersionPostingsWriter checks docID recurrence) — duplicate ids in
  one build raise;
- seekExact(id, minVersion) answers "does id exist with version >
  minVersion" — EQUAL versions answer no (the reference returns false
  unless version > the floor, IDVersionSegmentTermsEnum.seekExact);
- admit_batch is the LiveFieldValues loop: an incoming row wins only
  if its version is STRICTLY greater than the currently-indexed one
  (absent id always admits).

Spark shape: the dictionary is an id-SORTED parquet table plus a
per-file (min_id, max_id) manifest — the manifest plays the terms
index's role ("fast, using only the terms index when possible"): a
point lookup prunes to the files whose id range covers the probes
BEFORE any scan plan exists, so a 100-TB dictionary answers a small
probe batch from a handful of files. Large probe batches skip the
driver prune and run one sort-merge/broadcast semi-join instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

MIN_VERSION = 0
MAX_VERSION = 0x3FFFFFFFFFFFFFFF

# below this many probe ids, prune files via the manifest driver-side
# (the terms-index fast path); above it, one distributed semi-join
PROBE_PRUNE_LIMIT = 1024


def build_idversion_sidecar(
    df: DataFrame,
    id_col: str,
    version_col: str,
    path: str,
    num_files: int = 16,
) -> dict:
    """Write the (id, version) dictionary: id-sorted parquet files +
    the per-file id-bounds manifest. Raises on duplicate ids and
    out-of-range versions (the IDVersionPostingsWriter checks)."""
    spark = df.sparkSession
    kv = df.select(
        F.col(id_col).cast("string").alias("id"),
        F.col(version_col).cast("long").alias("version"),
    )
    bad = kv.where(
        F.col("version").isNull()
        | (F.col("version") < MIN_VERSION) | (F.col("version") > MAX_VERSION)
    ).limit(1).collect()
    if bad:
        raise ValueError(
            f"version must be in [{MIN_VERSION}, {MAX_VERSION}], "
            f"got {bad[0]['version']!r} for id {bad[0]['id']!r}"
        )
    dup = (
        kv.groupBy("id").count().where(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(f"ID must not appear more than once: {dup[0]['id']!r}")
    data_dir = os.path.join(path, "data")
    (
        kv.repartitionByRange(num_files, "id")
        .sortWithinPartitions("id")
        .write.mode("overwrite")
        .parquet(data_dir)
    )
    written = spark.read.parquet(data_dir)
    (
        written.groupBy(F.input_file_name().alias("file"))
        .agg(
            F.count("*").alias("rows"),
            F.min("id").alias("min_id"),
            F.max("id").alias("max_id"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(os.path.join(path, "manifest"))
    )
    return {"path": path, "num_files": num_files}


def _read_pruned(
    spark: SparkSession, path: str, probe_ids: list[str] | None
) -> DataFrame:
    """The terms-index fast path: keep only files whose [min_id, max_id]
    could hold a probe id; an all-pruned probe set reads NOTHING."""
    data_dir = os.path.join(path, "data")
    if probe_ids is None or len(probe_ids) > PROBE_PRUNE_LIMIT:
        return spark.read.parquet(data_dir)
    manifest = spark.read.parquet(os.path.join(path, "manifest")).collect()
    keep = [
        r["file"]
        for r in manifest
        if any(r["min_id"] <= i <= r["max_id"] for i in probe_ids)
    ]
    if not keep:
        return spark.read.parquet(data_dir).limit(0)
    return spark.read.parquet(*keep)


def seek_exact(
    spark: SparkSession,
    path: str,
    probe_ids: list[str],
    min_version: int,
) -> DataFrame:
    """IDVersionSegmentTermsEnum.seekExact(id, minVersion): of the
    probe ids, those indexed with version STRICTLY greater than
    ``min_version``. -> (id, version)."""
    d = _read_pruned(spark, path, [str(i) for i in probe_ids])
    return (
        d.where(
            F.col("id").isin([str(i) for i in probe_ids])
            & (F.col("version") > int(min_version))
        )
        .select("id", "version")
        .orderBy("id")
    )


def admit_batch(
    spark: SparkSession,
    path: str,
    batch: DataFrame,
    id_col: str,
    version_col: str,
) -> DataFrame:
    """The LiveFieldValues ingest loop, batched: each incoming row is
    admitted iff its version is STRICTLY greater than the version
    currently indexed for its id (absent id admits). Returns the batch
    with (cur_version, admitted) appended — callers index the admitted
    slice and skip the rest, the reference's documented protocol.

    Scale shape: one left join of the batch against the dictionary on
    the id (AQE broadcasts whichever side is small); no collect, no
    per-row lookups."""
    cur = spark.read.parquet(os.path.join(path, "data")).select(
        F.col("id"), F.col("version").alias("cur_version")
    )
    b = batch.withColumn("__id", F.col(id_col).cast("string"))
    return (
        b.join(cur, b["__id"] == cur["id"], "left")
        .drop("id")
        .withColumnRenamed("__id", "id")
        .withColumn(
            "admitted",
            F.col("cur_version").isNull()
            | (F.col(version_col).cast("long") > F.col("cur_version")),
        )
    )
