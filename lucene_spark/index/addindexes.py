"""addIndexes — bulk import of a foreign index (IndexWriter.addIndexes,
CORE/index/IndexWriter.java; benchmark task AddIndexesTask.java).

Lucene rebases the incoming segments' docIDs onto the destination's
docBase and registers the segment files. Table mapping: the source
index's postings are decoded and re-encoded with ``offset = dest
num_docs_total`` added to every docID (one mapInPandas pass over the
source posting rows — no shuffle at all, parallel per source file),
doclens/docs shift the same offset JVM-side, everything lands in a
fresh batch directory, stats are recomputed over the union, and one
manifest generation publishes the import (two-phase as always).

Source tombstones, if any, are imported shifted as well.


Covers-also note: misc/IndexMergeTool.java (the command-line "merge N
indexes into one" utility) is add_indexes + forceMerge behind
submit.py — the same copy-then-merge flow with the manifest commit at
the end.
"""

from __future__ import annotations

import time

from pyspark.sql import SparkSession, functions as F

from lucene_spark.index import manifest as mani


def _rebase_postings_fn(offset: int, src_fmt: str = "for104",
                        dest_fmt: str = "for104"):
    """Decode with the source index's postings format, re-encode with
    the destination's (IndexWriter.addIndexes: imported segments adopt
    the writer's codec)."""
    def run(it):
        import pandas as pd

        from lucene_spark.index.formats import get_postings_format

        sfmt = get_postings_format(src_fmt)
        dfmt = get_postings_format(dest_fmt)

        for pdf in it:
            if len(pdf) == 0:
                continue
            out = pdf.copy()
            blobs, blasts = [], []
            for row in pdf.itertuples():
                docs, freqs = sfmt.decode(bytes(row.postings))
                docs = docs + offset
                import numpy as np

                norms = np.frombuffer(bytes(row.norms), dtype=np.uint8).astype(
                    np.int64
                )
                blob, block_last, _f, _n = dfmt.encode(docs, freqs, norms)
                blobs.append(blob)
                blasts.append([int(x) for x in block_last])
            out["postings"] = blobs
            out["block_last_doc"] = blasts
            yield out

    return run


def add_indexes(spark: SparkSession, dest_dir: str, src_dir: str) -> int:
    """Import src index into dest; returns the new manifest generation."""
    dm = mani.read_manifest(dest_dir)
    sm = mani.read_manifest(src_dir)
    if sm["field"] != dm["field"] or sm["analyzer"] != dm["analyzer"]:
        raise ValueError(
            f"incompatible indexes: field/analyzer "
            f"{sm['field']}/{sm['analyzer']} vs {dm['field']}/{dm['analyzer']}"
        )
    offset = int(dm["num_docs_total"])
    next_b = 1 + max(
        [b["batch"] for b in dm["batches"]]
        + [mg["batch"] for mg in dm.get("merges", [])]
    )
    t0 = time.time()

    from lucene_spark.search.executor import IndexReader

    src = IndexReader(spark, src_dir)
    prefix = f"x{next_b:04d}"  # imported segment ids get a fresh prefix

    postings = src.postings().withColumn(
        "segment_id", F.concat(F.lit(prefix), F.col("segment_id"))
    )
    rebased = postings.mapInPandas(
        _rebase_postings_fn(
            offset,
            src_fmt=sm.get("postings_format") or "for104",
            dest_fmt=dm.get("postings_format") or "for104",
        ),
        schema=postings.schema
    )
    rebased.write.mode("overwrite").parquet(f"{dest_dir}/postings/batch={next_b}")

    doclens = (
        src.doclens()
        .withColumn("segment_id", F.concat(F.lit(prefix), F.col("segment_id")))
        .withColumn("doc_id", F.col("doc_id") + offset)
    )
    doclens.write.mode("overwrite").parquet(f"{dest_dir}/doclens/batch={next_b}")

    docs = src.docs().withColumn("doc_id", F.col("doc_id") + offset)
    docs.drop("batch").write.mode("overwrite").parquet(
        f"{dest_dir}/docs/batch={next_b}"
    )

    seg_metrics = [
        r.asDict()
        for r in spark.read.parquet(f"{dest_dir}/doclens/batch={next_b}")
        .groupBy("segment_id")
        .agg(
            F.count("*").alias("num_docs"),
            F.sum("doc_len").alias("sum_doc_len"),
            F.min("doc_id").alias("first_doc_id"),
            F.max("doc_id").alias("last_doc_id"),
        )
        .collect()
    ]
    n_src_live = sum(s["num_docs"] for s in seg_metrics)

    out = dict(dm)
    out.pop("generation", None)
    out.pop("committed_at", None)
    out["batches"] = list(dm["batches"]) + [
        {
            "batch": next_b,
            "doc_id_range": [offset, offset + int(sm["num_docs_total"])],
            "segments": sorted(seg_metrics, key=lambda s: s["segment_id"]),
            "build_sec": round(time.time() - t0, 3),
            "status": "committed",
            "imported_from": src_dir,
        }
    ]
    out["num_docs_total"] = int(dm["num_docs_total"] + sm["num_docs_total"])
    if int(sm.get("purged_docs", 0)):
        out["purged_docs"] = int(dm.get("purged_docs", 0)) + int(sm["purged_docs"])

    # imported tombstones shift with the docs
    src_dels = None
    if sm.get("delete_batches"):
        from lucene_spark.index.deletes import deleted_ids_df

        src_dels = deleted_ids_df(spark, src_dir, sm)
    if src_dels is not None:
        from lucene_spark.index.deletes import _next_delete_batch

        db = _next_delete_batch(out)
        src_dels.withColumn("doc_id", F.col("doc_id") + offset).write.mode(
            "overwrite"
        ).parquet(f"{dest_dir}/deletes/batch={db}")
        n = src_dels.count()
        out["delete_batches"] = list(dm.get("delete_batches", [])) + [
            {"batch": db, "num_docs": int(n)}
        ]
        out["num_deleted"] = int(dm.get("num_deleted", 0) + n)

    from lucene_spark.index.builder import _recompute_stats

    _recompute_stats(spark, dest_dir, dm["field"], mani.live_segment_ids(out))
    return mani.commit_manifest(dest_dir, out)


def split_index(
    spark: SparkSession,
    src_dir: str,
    out_pass_dir: str,
    out_fail_dir: str,
    predicate,
) -> tuple[int, int]:
    """PKIndexSplitter (misc/src/java/org/apache/lucene/misc/index/
    PKIndexSplitter.java): partition one index into TWO — docs matching
    the filter and docs not matching — "creates two filtered indexes,
    one containing the documents accepted, the other the rejected".

    `predicate` is a Column over the docs registry. Composition of
    existing machinery, no new kernels: copy the committed index,
    tombstone the complement (delete_by_ids), then forceMerge(1) —
    whose purge pass physically rewrites postings/doclens without the
    tombstoned docs (exactly the reference's approach of wrapping the
    reader in a filtered view and letting addIndexes/merge materialize
    it). Doc ids keep their original values on both sides, so results
    diff cleanly against the source index.

    -> (live docs in pass index, live docs in fail index)."""
    import shutil

    from lucene_spark.index.deletes import delete_by_ids
    from lucene_spark.index.merge import force_merge
    from lucene_spark.search.executor import IndexReader

    src = IndexReader(spark, src_dir)
    keep = src.docs().filter(predicate).select("doc_id")
    drop = src.docs().join(keep, "doc_id", "left_anti").select("doc_id")
    sides = ((out_pass_dir, drop), (out_fail_dir, keep))
    counts = []
    for out_dir, dead in sides:
        shutil.copytree(src_dir, out_dir)
        delete_by_ids(spark, out_dir, dead)
        force_merge(spark, out_dir, max_segments=1)
        rd = IndexReader(spark, out_dir)
        # live = total - physically purged - still-tombstoned
        n = (
            int(rd.manifest["num_docs_total"])
            - int(rd.manifest.get("purged_docs", 0))
            - int(rd.manifest.get("num_deleted", 0))
        )
        counts.append(n)
    return counts[0], counts[1]


def upgrade_index(spark: SparkSession, index_dir: str, to_format: str) -> int:
    """IndexUpgrader (backward-codecs; backward_codecs/.../IndexUpgrader
    role + IndexWriter.addIndexes codec adoption): rewrite EVERY
    postings blob of a committed index into ``to_format`` and commit a
    new generation whose manifest records the new postings format — so
    an index written under one codec keeps working after the default
    codec moves on.

    Offline, single-writer op (the reference's tool contract): each
    postings batch directory is decoded with the OLD format and
    re-encoded with the new via the same kernel addIndexes uses, then
    swapped in place; the manifest flips last. Doc ids, doclens, stats
    and tombstones are untouched — only the blob lane changes.

    -> the new manifest generation.
    """
    import os
    import shutil

    from lucene_spark.index.formats import get_postings_format

    m = mani.read_manifest(index_dir)
    src_fmt = m.get("postings_format") or "for104"
    get_postings_format(to_format)  # validate the name early
    if src_fmt == to_format:
        return m["generation"]
    proot = f"{index_dir}/postings"
    for entry in sorted(os.listdir(proot)):
        bdir = f"{proot}/{entry}"
        if not os.path.isdir(bdir):
            continue
        df = spark.read.parquet(bdir)
        upgraded = df.mapInPandas(
            _rebase_postings_fn(0, src_fmt=src_fmt, dest_fmt=to_format),
            schema=df.schema,
        )
        tmp = f"{proot}/.upgrade_{entry}"
        upgraded.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(bdir)
        shutil.move(tmp, bdir)
    out = dict(m)
    out.pop("generation", None)
    out.pop("committed_at", None)
    out["postings_format"] = to_format
    out["upgraded_from"] = src_fmt
    return mani.commit_manifest(index_dir, out)


def rearrange_index(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    segment_selectors: list,
    deleted_selector=None,
) -> int:
    """IndexRearranger (misc/index/IndexRearranger.java): copy an index
    into ``out_dir`` with one segment per selector, segments appearing
    in selector order ("each selector corresponds to one segment"); an
    optional ``deleted_selector`` marks docs for deletion in the result
    WITHOUT merging them away (the reference's deletedDocsSelector).

    Selectors are Columns over the docs registry and must partition the
    live docs (every doc matched by exactly one selector — checked).
    Composition of existing machinery: each selector materializes via
    the split/forceMerge purge path into a single-segment index, then
    addIndexes imports them in order (doc ids rebase by import offset,
    as ids never survive rearrangement in the reference either).
    -> the new manifest generation."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from lucene_spark.index.deletes import delete_by_ids
    from lucene_spark.index.merge import force_merge
    from lucene_spark.search.executor import IndexReader

    src = IndexReader(spark, src_dir)
    docs = src.docs()
    n_live = docs.count()
    covered = 0
    for sel in segment_selectors:
        covered += docs.filter(sel).count()
    matched_once = docs.filter(
        sum((F.when(sel, 1).otherwise(0) for sel in segment_selectors), F.lit(0))
        == 1
    ).count()
    if not (covered == n_live == matched_once):
        raise ValueError(
            "segment selectors must partition the docs registry "
            f"(live={n_live}, covered={covered}, exactly_once={matched_once})"
        )

    work = tempfile.mkdtemp(prefix="rearrange_")
    parts = []
    try:
        for i, sel in enumerate(segment_selectors):
            part = f"{work}/part{i}"
            shutil.copytree(src_dir, part)
            dead = docs.filter(~sel).select("doc_id")
            delete_by_ids(spark, part, dead)
            force_merge(spark, part, max_segments=1)
            parts.append(part)
        shutil.copytree(parts[0], out_dir)
        for part in parts[1:]:
            add_indexes(spark, out_dir, part)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    if deleted_selector is not None:
        out = IndexReader(spark, out_dir)
        # select on the REARRANGED registry (ids were rebased); the
        # registry keeps purged rows for lineage, so restrict to LIVE
        # docs (doclens) before tombstoning
        live = out.doclens().select("doc_id").distinct()
        dead = (
            out.docs().filter(deleted_selector)
            .join(live, "doc_id", "left_semi")
            .select("doc_id")
        )
        delete_by_ids(spark, out_dir, dead)
    return mani.read_manifest(out_dir)["generation"]


def multipass_split_index(
    spark: SparkSession,
    src_dir: str,
    out_dirs: list[str],
    sequential: bool = False,
) -> list[int]:
    """MultiPassIndexSplitter (misc/src/java/org/apache/lucene/misc/
    index/MultiPassIndexSplitter.java): split one index into N parts by
    making N passes over the source, each pass materializing the docs
    assigned to that part — round-robin by doc id (the tool's default)
    or ``-seq`` contiguous equal ranges. Doc ids here are dense per
    build (the CheckIndex invariant), so both assignments are pure
    doc_id arithmetic — map-side at any scale, no global ordering job.

    Each part is produced exactly like PKIndexSplitter's sides:
    copy + tombstone the complement + forceMerge(1). Returns live doc
    counts per part."""
    from pyspark.sql import functions as F

    from lucene_spark.index.deletes import delete_by_ids
    from lucene_spark.index.merge import force_merge
    from lucene_spark.search.executor import IndexReader

    import shutil

    n = len(out_dirs)
    if n < 2:
        raise ValueError("need at least 2 output parts")
    src = IndexReader(spark, src_dir)
    total = int(src.manifest["num_docs_total"])
    counts: list[int] = []
    for i, out_dir in enumerate(out_dirs):
        if sequential:
            lo = i * total // n
            hi = (i + 1) * total // n
            keep_pred = (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        else:
            keep_pred = F.col("doc_id") % n == i
        dead = (
            src.docs().filter(~keep_pred).select("doc_id")
        )
        shutil.copytree(src_dir, out_dir)
        delete_by_ids(spark, out_dir, dead)
        force_merge(spark, out_dir, max_segments=1)
        rd = IndexReader(spark, out_dir)
        counts.append(
            int(rd.manifest["num_docs_total"])
            - int(rd.manifest.get("purged_docs", 0))
            - int(rd.manifest.get("num_deleted", 0))
        )
    return counts
