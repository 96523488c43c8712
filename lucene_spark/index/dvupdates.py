"""In-place DocValues updates — IndexWriter.updateNumericDocValue /
updateBinaryDocValue semantics (CORE/index/DocValuesUpdate.java,
ReadersAndUpdates.java), Spark-first.

The reference writes per-segment DV update "gen" files that readers
overlay over the base docvalues without reindexing the document. Table
mapping: an update call stages ``dv_updates/batch=K`` parquet holding
(doc_id, <updated columns>) and publishes it in ONE manifest commit
(``dv_update_batches`` list). ``IndexReader.docs()`` overlays batches
in commit order — latest value wins — so every docs-registry consumer
(facets, field sorts, rescoring value sources, stored-field fetch)
sees updated values immediately, while postings/norms stay untouched
(exactly the reference's contract: DV updates never re-invert text).

Scale shape: each overlay is a doc_id equi-join against a typically
small update batch (broadcast-eligible); a merge/compaction round can
fold accumulated batches into the registry the same way merges purge
tombstones. No driver-side state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.index import manifest as mani


def _next_dv_batch(m: dict) -> int:
    return 1 + max(
        [d["batch"] for d in m.get("dv_update_batches", [])], default=-1
    )


def update_doc_values(
    spark: SparkSession, index_dir: str, updates: DataFrame
) -> int:
    """Apply an in-place docvalues update: `updates` holds doc_id plus
    the columns to overwrite for those docs. Two-phase: parquet staged
    first, ONE manifest commit publishes it. Returns the generation."""
    cols = [c for c in updates.columns if c != "doc_id"]
    if not cols:
        raise ValueError("updates must carry at least one non-doc_id column")
    m = mani.read_manifest(index_dir)
    b = _next_dv_batch(m)
    n = updates.count()
    if n == 0:
        return m["generation"]
    updates.select("doc_id", *cols).write.mode("overwrite").parquet(
        f"{index_dir}/dv_updates/batch={b}"
    )
    out = dict(m)
    out.pop("generation", None)
    out.pop("committed_at", None)
    out["dv_update_batches"] = list(m.get("dv_update_batches", [])) + [
        {"batch": b, "columns": cols, "num_docs": int(n)}
    ]
    return mani.commit_manifest(index_dir, out)


def update_doc_values_by_term(
    spark: SparkSession,
    index_dir: str,
    field: str,
    term: str,
    assignments: dict,
) -> int:
    """updateNumericDocValue(Term, ...) analog: overwrite the given
    column values on every live doc matching `term`."""
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.executor import IndexReader

    reader = IndexReader(spark, index_dir)
    matched = sp.exploded_postings(reader, field, [term]).select("doc_id").distinct()
    upd = matched.select(
        "doc_id", *[F.lit(v).alias(c) for c, v in assignments.items()]
    )
    return update_doc_values(spark, index_dir, upd)


def apply_dv_overlays(
    spark: SparkSession, base: DataFrame, index_dir: str, m: dict
) -> DataFrame:
    """Overlay committed DV update batches onto the docs registry in
    commit order (latest wins)."""
    for b in m.get("dv_update_batches", []):
        upd = spark.read.parquet(f"{index_dir}/dv_updates/batch={b['batch']}")
        cols = [c for c in b["columns"] if c in base.columns]
        upd = upd.select(
            "doc_id", *[F.col(c).alias(f"_dv_{c}") for c in cols]
        )
        base = base.join(F.broadcast(upd), "doc_id", "left")
        for c in cols:
            base = base.withColumn(
                c, F.coalesce(F.col(f"_dv_{c}"), F.col(c))
            ).drop(f"_dv_{c}")
    return base
