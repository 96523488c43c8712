"""NRT indexing — Lucene's near-real-time pipeline on Structured
Streaming.

Reference semantics (SURVEY.md §2.9): the writer buffers docs, flushes
small segments, and readers ``SearcherManager.maybeRefresh()`` to an
updated view (lucene/core/src/java/org/apache/lucene/search/
SearcherManager.java; ControlledRealTimeReopenThread bounds staleness).

Spark mapping:
- micro-batch            = DWPT flush (one batch -> new segment files)
- manifest generation    = segments_N commit (two-phase, manifest.py)
- ``maybe_refresh()``    = reopen IndexReader iff the committed
                           generation advanced
- trigger interval       = refresh staleness bound

``append_batch`` is the foreachBatch body: it assigns doc_ids after the
current high-water mark, inverts the batch with the same DWPT pass as
the bulk builder (builder.make_invert_fn), appends postings/doclens
parquet for the new batch, recomputes global stats (avgdl must always
span all committed segments — IndexSearcher.java:1134-1149), and
commits the next manifest generation. A crash between the parquet
append and the manifest commit leaves the index at the previous
generation: readers never see a partial batch, and the next attempt
overwrites the orphaned batch directory (same idempotence as the bulk
builder's resume path).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.index import manifest as mani
from lucene_spark.index.builder import (
    IndexConfig,
    _recompute_stats,
    assign_doc_ids,
    make_invert_fn,
)
from lucene_spark.index.segment import STAGING_SCHEMA


def append_batch(
    spark: SparkSession,
    batch: DataFrame,
    index_dir: str,
    cfg: IndexConfig,
    pending_deletes: DataFrame | None = None,
) -> int:
    """Index one micro-batch as a new segment batch; returns the new
    manifest generation (or the current one for an empty batch).

    ``pending_deletes`` (a doc_id DataFrame) is staged as a tombstone
    batch and published in the SAME manifest commit as the appended
    segments — the IndexWriter.updateDocuments atomicity contract
    (IndexWriter.java:1538-1558): readers see either the pre-update
    state or (tombstone + replacement) together, never neither."""
    n_new = batch.count()
    try:
        m = mani.read_manifest(index_dir)
        offset = int(m["num_docs_total"])
        next_b = 1 + max(
            [b["batch"] for b in m["batches"]]
            + [mg["batch"] for mg in m.get("merges", [])]
        )
        committed = list(m["batches"])
    except FileNotFoundError:
        m = None
        offset = 0
        next_b = 0
        committed = []
    if n_new == 0:
        if pending_deletes is not None and m is not None:
            from lucene_spark.index.deletes import delete_by_ids

            return delete_by_ids(spark, index_dir, pending_deletes)
        return m["generation"] if m else -1

    t0 = time.time()
    # stage pending tombstones FIRST: the delete set is defined against
    # the pre-append index, so it must materialize before the new
    # batch's parquet lands (and staging before the manifest commit is
    # crash-safe — orphaned files are invisible to readers)
    del_entry = None
    if pending_deletes is not None and m is not None:
        from lucene_spark.index.deletes import _next_delete_batch

        del_ids = pending_deletes.select("doc_id").distinct()
        n_del = del_ids.count()
        if n_del:
            nb = _next_delete_batch(m)
            del_ids.write.mode("overwrite").parquet(
                f"{index_dir}/deletes/batch={nb}"
            )
            del_entry = {"batch": nb, "num_docs": int(n_del)}
    ids = assign_doc_ids(batch, cfg)
    if not cfg.doc_id_col:
        ids = ids.withColumn("doc_id", F.col("doc_id") + offset)

    fields = cfg.all_fields()
    content_cols = set(fields.values())
    meta_cols = [c for c in ids.columns if c not in content_cols]
    registry = ids.select(
        *meta_cols, F.sha2(F.col(cfg.content_col), 256).alias("content_sha256")
    )
    registry.write.mode("overwrite").parquet(f"{index_dir}/docs/batch={next_b}")

    batch_df = (
        ids.select("doc_id", *sorted(content_cols))
        .withColumn("_batch", F.lit(next_b))
    )
    parts = max(1, (n_new + cfg.docs_per_segment - 1) // cfg.docs_per_segment)
    batch_df = batch_df.repartitionByRange(parts, "doc_id")
    # appended segments must use the EXISTING index's postings format
    # (SegmentInfos codec consistency) — manifest wins over cfg
    fmt_name = (m or {}).get("postings_format") or cfg.postings_format
    invert = make_invert_fn(
        cfg.analyzer, cfg.content_col, cfg.field, cfg.store_positions,
        fields=cfg.all_fields(), field_analyzers=cfg.field_analyzers,
        store_off=cfg.store_offsets, store_pay=cfg.store_payloads,
        postings_format=fmt_name,
    )
    staging = batch_df.mapInPandas(invert, schema=STAGING_SCHEMA)
    staging.write.mode("overwrite").parquet(f"{index_dir}/staging/batch={next_b}")

    st = spark.read.parquet(f"{index_dir}/staging/batch={next_b}")
    st.filter("row_type = 1").drop(
        "row_type", "doc_id", "doc_len", "doc_len_code"
    ).write.mode("overwrite").parquet(f"{index_dir}/postings/batch={next_b}")
    st.filter("row_type = 0").select(
        "segment_id", "field", "doc_id", "doc_len", "doc_len_code"
    ).write.mode("overwrite").parquet(f"{index_dir}/doclens/batch={next_b}")

    seg_metrics = [
        r.asDict()
        for r in st.filter(
            (F.col("row_type") == 0) & (F.col("field") == cfg.field)
        )
        .groupBy("segment_id")
        .agg(
            F.count("*").alias("num_docs"),
            F.sum("doc_len").alias("sum_doc_len"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .collect()
    ]
    committed.append(
        {
            "batch": next_b,
            "doc_id_range": [int(offset), int(offset + n_new)],
            "segments": sorted(seg_metrics, key=lambda s: s["segment_id"]),
            "build_sec": round(time.time() - t0, 3),
            "status": "committed",
        }
    )
    from lucene_spark.index.builder import LAYOUT_VERSION

    base = {
        "field": cfg.field,
        "layout_version": LAYOUT_VERSION,
        "fields": list(cfg.all_fields()),
        "analyzer": cfg.analyzer,
        "k1": cfg.k1,
        "b": cfg.b,
        "store_positions": cfg.store_positions,
        "postings_format": fmt_name,
        "num_batches": len(committed),
        "id_cols": list(cfg.id_cols),
        "doc_id_col": cfg.doc_id_col,
        "field_analyzers": cfg.field_analyzers,
    }
    if m:
        base["lineage"] = m.get("lineage", {})
        for carry in ("merges", "delete_batches", "num_deleted",
                      "purged_docs", "dv_update_batches"):
            if m.get(carry):
                base[carry] = m[carry]
    base["num_docs_total"] = int(offset + n_new)
    base["batches"] = committed
    if del_entry is not None:
        # publish the staged tombstones with THIS commit (one generation
        # carries both the delete batch and the appended segments)
        base["delete_batches"] = list(m.get("delete_batches", [])) + [del_entry]
        base["num_deleted"] = int(m.get("num_deleted", 0) + del_entry["num_docs"])
    _recompute_stats(spark, index_dir, cfg.field, mani.live_segment_ids(base))
    return mani.commit_manifest(index_dir, base)


class NrtIndexWriter:
    """foreachBatch sink + refreshable searcher handle.

    Usage::

        w = NrtIndexWriter(index_dir, cfg)
        q = (stream.writeStream.foreachBatch(w.foreach_batch)
             .trigger(availableNow=True).start())
        ...
        reader = w.maybe_refresh(spark)   # SearcherManager analog
    """

    def __init__(self, index_dir: str, cfg: IndexConfig | None = None):
        self.index_dir = index_dir
        self.cfg = cfg or IndexConfig()
        self._generation = -1

    def foreach_batch(self, batch: DataFrame, epoch_id: int) -> None:
        append_batch(batch.sparkSession, batch, self.index_dir, self.cfg)

    def current_generation(self) -> int:
        return mani.latest_generation(self.index_dir)

    def maybe_refresh(self, spark: SparkSession):
        """Reopen the reader iff a newer generation was committed;
        returns (reader, refreshed) like SearcherManager.maybeRefresh."""
        from lucene_spark.search.executor import IndexReader

        gen = self.current_generation()
        if gen < 0:
            return None, False
        if gen != self._generation:
            self._generation = gen
            self._reader = IndexReader(spark, self.index_dir)
            return self._reader, True
        return self._reader, False

    def wait_for_generation(
        self,
        spark: SparkSession,
        target_gen: int,
        timeout_s: float = 30.0,
        poll_s: float = 0.05,
    ):
        """ControlledRealTimeReopenThread.waitForGeneration analog
        (core/search/ControlledRealTimeReopenThread.java): block until a
        manifest generation >= target_gen is committed, then refresh and
        return the reader — the per-caller staleness bound ("a write I
        made at generation G is visible to the reader I get back").
        Raises TimeoutError after timeout_s."""
        import time as _time

        deadline = _time.monotonic() + timeout_s
        while self.current_generation() < target_gen:
            if _time.monotonic() >= deadline:
                raise TimeoutError(
                    f"generation {target_gen} not committed within "
                    f"{timeout_s}s (latest: {self.current_generation()})"
                )
            _time.sleep(poll_s)
        reader, _ = self.maybe_refresh(spark)
        return reader
