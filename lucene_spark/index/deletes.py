"""Deletes — Lucene's tombstone model (SURVEY.md §2.3).

Reference semantics (CORE/index/BufferedUpdates.java,
Lucene90LiveDocsFormat.java): a delete marks docs in a live-docs bitset;
queries skip deleted docs but **collection/term statistics keep counting
them until the docs are physically purged by a merge**
(IndexWriter docFreq contract). ``updateDocument`` = atomic
delete-by-term + add.

Table mapping: tombstones live in ``deletes/batch=K`` parquet
(doc_id bigint), published by a manifest commit (readers never see a
half-written tombstone batch). Query-side, every matched-doc stream is
anti-joined against the tombstone set (executor passes a broadcast
frozenset into the per-segment kernel; sqlpath anti-joins lazily).
Merge purges: postings of merged segments drop tombstoned docs, and the
covered tombstones are rewritten out; manifest tracks the cumulative
``purged_docs`` count so CheckIndex can reconcile live doc counts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.index import manifest as mani


def _next_delete_batch(m: dict) -> int:
    return 1 + max([d["batch"] for d in m.get("delete_batches", [])], default=-1)


def deleted_ids_df(spark: SparkSession, index_dir: str, m: dict | None = None) -> DataFrame | None:
    """Committed tombstones as DataFrame(doc_id), or None if none."""
    m = m or mani.read_manifest(index_dir)
    batches = m.get("delete_batches", [])
    if not batches:
        return None
    return spark.read.parquet(
        *[f"{index_dir}/deletes/batch={d['batch']}" for d in batches]
    ).select("doc_id").distinct()


def delete_by_ids(spark: SparkSession, index_dir: str, ids: DataFrame) -> int:
    """Tombstone the given doc ids (DataFrame with a doc_id column).
    Returns the new manifest generation. Two-phase: parquet first,
    manifest publish second."""
    m = mani.read_manifest(index_dir)
    b = _next_delete_batch(m)
    ids = ids.select("doc_id").distinct()
    n = ids.count()
    if n == 0:
        return m["generation"]
    ids.write.mode("overwrite").parquet(f"{index_dir}/deletes/batch={b}")
    out = dict(m)
    out.pop("generation", None)
    out.pop("committed_at", None)
    out["delete_batches"] = list(m.get("delete_batches", [])) + [
        {"batch": b, "num_docs": int(n)}
    ]
    out["num_deleted"] = int(m.get("num_deleted", 0) + n)
    return mani.commit_manifest(index_dir, out)


def delete_by_term(spark: SparkSession, index_dir: str, field: str, term: str) -> int:
    """Delete every live doc containing `term` (IndexWriter
    deleteDocuments(Term) analog)."""
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.executor import IndexReader

    reader = IndexReader(spark, index_dir)
    matched = sp.exploded_postings(reader, field, [term]).select("doc_id").distinct()
    return delete_by_ids(spark, index_dir, matched)


def update_document(
    spark: SparkSession,
    index_dir: str,
    field: str,
    term: str,
    new_docs: DataFrame,
    cfg,
) -> int:
    """updateDocuments semantics (IndexWriter.java:1538-1558): atomic
    delete-by-term + append of the replacement docs. The tombstone
    parquet and the appended segment parquet are both staged first, then
    published by ONE manifest commit — readers see either the old doc or
    (tombstone + new doc), never neither."""
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.executor import IndexReader
    from lucene_spark.streaming.nrt import append_batch

    reader = IndexReader(spark, index_dir)
    matched = sp.exploded_postings(reader, field, [term]).select("doc_id").distinct()
    return append_batch(
        spark, new_docs, index_dir, cfg, pending_deletes=matched
    )


def live_doc_count(spark: SparkSession, index_dir: str) -> int:
    """numDocs analog: maxDoc-ish total minus current tombstones."""
    m = mani.read_manifest(index_dir)
    total = m["num_docs_total"] - int(m.get("purged_docs", 0))
    dels = deleted_ids_df(spark, index_dir, m)
    return total - (dels.count() if dels is not None else 0)
