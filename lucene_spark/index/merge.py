"""Tiered segment merge — TieredMergePolicy + SegmentMerger, Spark-first.

Policy (CORE/index/TieredMergePolicy.java:85-91,107-118 semantics,
simplified): while more than ``segs_per_tier`` live segments exist, pick
up to ``max_merge_at_once`` of the *smallest* segments whose combined
doc count stays under ``max_merged_docs`` and merge them into one.
Smallest-first is the heart of Lucene's tiering — merge cost stays
proportional to the data merged, and every doc is rewritten O(log n)
times over the index's lifetime.

Mechanism (CORE/index/SegmentMerger.java:114-178,209-227): postings
merge is a sorted merge of the term dicts with docID re-basing. Here
segments hold *global* doc_ids over disjoint ranges, so per (field,
term) the merge is: decode each input's blocks, concatenate in
doc-range order, re-encode (delta chains, block metadata and impacts
are rebuilt by the codec). Norm bytes and position varints are
doc-major and self-delimiting, so they concatenate as raw bytes with
no decode at all — the streaming-merge property Lucene gets from
reading postings sequentially.

Spark shape: ONE groupBy(field, term) over only the input segments'
posting rows — a shuffle proportional to the merged data, map-side
combined by Arrow batching; hot terms are one row per (segment, term)
so there is no skew amplification. The output is written as a fresh
batch directory; old segments stay on disk but leave the manifest's
live set (two-phase: data first, manifest commit last — a crash
between them is invisible to readers).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.index import manifest as mani


def find_merges(
    segments: list[dict],
    segs_per_tier: int = 8,
    max_merge_at_once: int = 10,
    max_merged_docs: int = 5_000_000,
) -> list[list[str]]:
    """Pick merge groups from live segment metric dicts
    (segment_id/num_docs). Returns a list of segment_id groups."""
    pool = sorted(segments, key=lambda s: (s["num_docs"], s["segment_id"]))
    groups: list[list[str]] = []
    while len(pool) > segs_per_tier:
        group: list[dict] = []
        total = 0
        rest: list[dict] = []
        for s in pool:
            if len(group) < max_merge_at_once and total + s["num_docs"] <= max_merged_docs:
                group.append(s)
                total += s["num_docs"]
            else:
                rest.append(s)
        if len(group) < 2:
            break
        groups.append([s["segment_id"] for s in group])
        merged = {
            "segment_id": f"(pending merge of {len(group)})",
            "num_docs": total,
        }
        pool = sorted(rest + [merged], key=lambda s: (s["num_docs"], s["segment_id"]))
    return groups


def _merge_postings_fn(order: dict[str, int], purge: frozenset = frozenset()):
    """applyInPandas kernel: merge one (field, term)'s posting rows from
    the input segments into a single row. `order` maps segment_id ->
    rank by first doc_id (ranges are disjoint, so concatenation in rank
    order preserves the strictly-increasing docID invariant). `purge`
    holds tombstoned doc ids to drop physically (Lucene merges purge
    deletions — SegmentMerger over liveDocs); position lists of purged
    docs are re-encoded out, surviving bytes are untouched."""

    def run(pdf):
        import numpy as np
        import pandas as pd

        from lucene_spark.index import codec

        pdf = pdf.copy()
        pdf["_rank"] = pdf["segment_id"].map(order)
        # tie-break equal ranks (salted multi-part rows of one already-
        # merged segment share a segment_id) by each part's first docID
        # proxy: block_last_doc[0] is monotone across disjoint doc ranges
        pdf["_tie"] = pdf["block_last_doc"].map(lambda b: int(b[0]))
        pdf = pdf.sort_values(["_rank", "_tie"])
        docs_l, freqs_l, pos_l = [], [], []
        have_pos = pdf["positions"].notna().all()
        decode_pos = have_pos and bool(purge)  # else raw byte concat
        for row in pdf.itertuples():
            d, f = codec.decode_postings(bytes(row.postings))
            docs_l.append(d)
            freqs_l.append(f)
            if decode_pos:
                pos_l.extend(codec.decode_positions(bytes(row.positions), f))
        docs = np.concatenate(docs_l)
        freqs = np.concatenate(freqs_l)
        norms_b = b"".join(bytes(b) for b in pdf["norms"])
        norms = np.frombuffer(norms_b, dtype=np.uint8).astype(np.int64)
        if purge:
            keep = ~np.isin(docs, np.fromiter(purge, dtype=np.int64))
            if not keep.all():
                docs, freqs, norms = docs[keep], freqs[keep], norms[keep]
                if have_pos:
                    pos_l = [p for p, kp in zip(pos_l, keep) if kp]
        if len(docs) == 0:
            return pd.DataFrame(
                columns=[
                    "field", "term", "doc_freq", "total_term_freq", "postings",
                    "norms", "positions", "block_last_doc", "impact_freqs",
                    "impact_norms",
                ]
            )
        blob, block_last, imp_f, imp_n = codec.encode_postings(docs, freqs, norms)
        if not have_pos:
            pos = None
        elif decode_pos:
            pos = codec.encode_positions(freqs, pos_l)
        else:
            pos = b"".join(bytes(b) for b in pdf["positions"])
        return pd.DataFrame(
            {
                "field": [pdf["field"].iat[0]],
                "term": [pdf["term"].iat[0]],
                "doc_freq": [int(len(docs))],
                "total_term_freq": [int(freqs.sum())],
                "postings": [blob],
                "norms": [norms_b if not purge else norms.astype(np.uint8).tobytes()],
                "positions": [pos],
                "block_last_doc": [[int(x) for x in block_last]],
                "impact_freqs": [[[int(v) for v in fs] for fs in imp_f]],
                "impact_norms": [[[int(v) for v in ns] for ns in imp_n]],
            }
        )

    return run


_MERGED_SCHEMA = (
    "field string, term string, doc_freq int, total_term_freq long, "
    "postings binary, norms binary, positions binary, "
    "block_last_doc array<long>, impact_freqs array<array<int>>, "
    "impact_norms array<array<int>>"
)


def merge_round(
    spark: SparkSession,
    index_dir: str,
    segs_per_tier: int = 8,
    max_merge_at_once: int = 10,
    max_merged_docs: int = 5_000_000,
    salt_max_docs: int = 1_000_000,
) -> int:
    """Run one merge round: apply every group find_merges picks, commit
    one new manifest generation. Returns the number of merges executed."""
    m = mani.read_manifest(index_dir)
    live = mani.live_segment_ids(m)
    seg_metrics: dict[str, dict] = {}
    for b in m["batches"]:
        for s in b["segments"]:
            seg_metrics[s["segment_id"]] = s
    for mg in m.get("merges", []):
        for s in mg["segments"]:
            seg_metrics[s["segment_id"]] = s
    live_metrics = [
        s for sid, s in sorted(seg_metrics.items()) if live is None or sid in live
    ]
    groups = find_merges(
        live_metrics, segs_per_tier, max_merge_at_once, max_merged_docs
    )
    if not groups:
        return 0

    merges = list(m.get("merges", []))
    next_b = 1 + max(
        [b["batch"] for b in m["batches"]] + [mg["batch"] for mg in merges]
    )
    gen = m["generation"]
    postings_all = spark.read.parquet(f"{index_dir}/postings")
    doclens_all = spark.read.parquet(f"{index_dir}/doclens")

    # tombstones covered by merged segments get PURGED (dropped from the
    # merged postings/doclens and removed from the tombstone set) — the
    # Lucene merge-applies-deletes contract
    from lucene_spark.index.deletes import deleted_ids_df

    dels_df = deleted_ids_df(spark, index_dir, m)
    all_deleted = (
        frozenset(r["doc_id"] for r in dels_df.collect())
        if dels_df is not None
        else frozenset()
    )
    purged_now: set[int] = set()

    for gi, group in enumerate(groups):
        t0 = time.time()
        new_sid = f"m{gen + 1:04d}g{gi:03d}"
        order = {
            sid: rank
            for rank, sid in enumerate(
                sorted(group, key=lambda s: seg_metrics[s]["first_doc_id"])
            )
        }
        rows = postings_all.filter(F.col("segment_id").isin(group))
        # hot-term skew salting (SURVEY.md §4.2, north rule): a term whose
        # cumulative doc_freq exceeds salt_max_docs is merged as SEVERAL
        # sub-posting rows over disjoint doc ranges — the shuffle key
        # becomes (field, term, salt), so no single reducer ever decodes
        # more than ~salt_max_docs postings for one term. Readers
        # concatenate the parts in doc order (_SegmentIndex multi-row).
        from pyspark.sql.window import Window

        rank_expr = F.create_map(
            *[x for sid, rk in order.items() for x in (F.lit(sid), F.lit(rk))]
        )
        w = (
            Window.partitionBy("field", "term")
            .orderBy(F.col("_rank"), F.element_at(F.col("block_last_doc"), 1))
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        salted = (
            rows.withColumn("_rank", F.element_at(rank_expr, F.col("segment_id")))
            .withColumn(
                "_salt",
                (
                    F.coalesce(F.sum("doc_freq").over(w), F.lit(0))
                    / salt_max_docs
                ).cast("int"),
            )
        )
        # restrict the purge set to the group's PER-SEGMENT doc ranges —
        # find_merges picks smallest segments, which need not be doc-id
        # contiguous; a hull test would purge (and un-tombstone) docs of
        # NON-merged segments, resurrecting them (merge-applies-deletes
        # contract violation)
        group_purge = frozenset()
        if all_deleted:
            ranges = [
                (seg_metrics[s]["first_doc_id"], seg_metrics[s]["last_doc_id"])
                for s in group
            ]
            group_purge = frozenset(
                d for d in all_deleted
                if any(lo <= d <= hi for lo, hi in ranges)
            )
        merged = (
            salted.groupBy("field", "term", "_salt")
            .applyInPandas(
                _merge_postings_fn(order, group_purge), schema=_MERGED_SCHEMA
            )
            .withColumn("segment_id", F.lit(new_sid))
        )
        out_b = next_b + gi
        merged.write.mode("overwrite").parquet(f"{index_dir}/postings/batch={out_b}")
        dl = doclens_all.filter(F.col("segment_id").isin(group)).withColumn(
            "segment_id", F.lit(new_sid)
        )
        if group_purge:
            dl = dl.filter(
                ~F.col("doc_id").isin([int(x) for x in group_purge])
            )
            purged_now |= group_purge
        dl.write.mode("overwrite").parquet(f"{index_dir}/doclens/batch={out_b}")
        metrics = (
            spark.read.parquet(f"{index_dir}/doclens/batch={out_b}")
            .filter(F.col("field") == m["field"])
            .groupBy("segment_id")
            .agg(
                F.count("*").alias("num_docs"),
                F.sum("doc_len").alias("sum_doc_len"),
                F.min("doc_id").alias("first_doc_id"),
                F.max("doc_id").alias("last_doc_id"),
            )
            .collect()[0]
            .asDict()
        )
        merges.append(
            {
                "batch": out_b,
                "inputs": sorted(group),
                "segments": [metrics],
                "merge_sec": round(time.time() - t0, 3),
                "status": "committed",
            }
        )

    out = dict(m)
    out.pop("generation", None)
    out.pop("committed_at", None)
    out["merges"] = merges
    if purged_now:
        # rewrite remaining tombstones as one fresh batch
        remaining = sorted(all_deleted - purged_now)
        nb = _next_tombstone_batch(out)
        if remaining:
            spark.createDataFrame(
                [(int(d),) for d in remaining], "doc_id long"
            ).write.mode("overwrite").parquet(f"{index_dir}/deletes/batch={nb}")
            out["delete_batches"] = [{"batch": nb, "num_docs": len(remaining)}]
        else:
            out["delete_batches"] = []
        out["num_deleted"] = len(remaining)
        out["purged_docs"] = int(m.get("purged_docs", 0)) + len(purged_now)
    from lucene_spark.index.builder import _recompute_stats

    _recompute_stats(spark, index_dir, m["field"], mani.live_segment_ids(out))
    mani.commit_manifest(index_dir, out)
    return len(groups)


def _next_tombstone_batch(m: dict) -> int:
    return 1 + max([d["batch"] for d in m.get("delete_batches", [])], default=-1)


def force_merge(spark: SparkSession, index_dir: str, max_segments: int = 1) -> int:
    """forceMerge(N) (benchmark/conf/indexing.alg:58 ForceMerge(1)):
    merge rounds until <= max_segments live segments remain."""
    rounds = 0
    while True:
        m = mani.read_manifest(index_dir)
        live = mani.live_segment_ids(m)
        seg_ids = set()
        for b in m["batches"]:
            seg_ids |= {s["segment_id"] for s in b["segments"]}
        for mg in m.get("merges", []):
            seg_ids |= {s["segment_id"] for s in mg["segments"]}
        n_live = len(seg_ids if live is None else (seg_ids & live))
        if n_live <= max_segments:
            return rounds
        did = merge_round(
            spark,
            index_dir,
            segs_per_tier=max_segments,
            max_merge_at_once=1_000_000,
            max_merged_docs=1 << 60,
        )
        if did == 0:
            return rounds
        rounds += 1
