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
from functools import partial

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
            if s["segment_id"].startswith("(pending merge"):
                # an in-flight merge's output counts toward tier sizing
                # but is NOT selectable as an input this round — the
                # reference likewise excludes segments registered in a
                # pending merge (TieredMergePolicy merging set)
                rest.append(s)
                continue
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


class MergePolicy:
    """MergePolicy SPI (core/index/MergePolicy.java + the named
    policies): a policy turns live segment metric dicts into merge
    groups. ``merge_round(policy=...)`` accepts a name or instance —
    the IndexWriterConfig.setMergePolicy injection point."""

    def find_merges(self, segments: list[dict]) -> list[list[str]]:
        raise NotImplementedError

    def find_full_flush_merges(
        self, segments: list[dict]
    ) -> list[list[str]]:
        """Merges to run as part of a full flush/commit
        (MergePolicy.findFullFlushMerges — default: none)."""
        return []


class TieredMergePolicy(MergePolicy):
    """The default (TieredMergePolicy.java, module docstring)."""

    def __init__(self, segs_per_tier: int = 8, max_merge_at_once: int = 10,
                 max_merged_docs: int = 5_000_000):
        self.segs_per_tier = segs_per_tier
        self.max_merge_at_once = max_merge_at_once
        self.max_merged_docs = max_merged_docs

    def find_merges(self, segments: list[dict]) -> list[list[str]]:
        return find_merges(
            segments, self.segs_per_tier, self.max_merge_at_once,
            self.max_merged_docs,
        )


class LogDocMergePolicy(MergePolicy):
    """LogMergePolicy.java / LogDocMergePolicy.java semantics: each
    segment's level is floor(log_mergeFactor(max(num_docs,
    min_merge_docs))); any CONTIGUOUS run (build order — Lucene's
    LogMergePolicy only merges adjacent segments, preserving index
    order) of ``merge_factor`` same-level segments merges, bounded by
    ``max_merged_docs``."""

    def __init__(self, merge_factor: int = 10, min_merge_docs: int = 1000,
                 max_merged_docs: int = 5_000_000):
        if merge_factor < 2:
            raise ValueError("merge_factor >= 2")
        self.merge_factor = merge_factor
        self.min_merge_docs = min_merge_docs
        self.max_merged_docs = max_merged_docs

    def find_merges(self, segments: list[dict]) -> list[list[str]]:
        import math

        ordered = sorted(segments, key=lambda s: s["segment_id"])
        lvl = [
            int(math.log(max(s["num_docs"], self.min_merge_docs),
                         self.merge_factor))
            for s in ordered
        ]
        groups: list[list[str]] = []
        i = 0
        while i < len(ordered):
            j = i
            total = 0
            while (
                j < len(ordered)
                and j - i < self.merge_factor
                and lvl[j] == lvl[i]
                and total + ordered[j]["num_docs"] <= self.max_merged_docs
            ):
                total += ordered[j]["num_docs"]
                j += 1
            if j - i >= self.merge_factor:
                groups.append([s["segment_id"] for s in ordered[i:j]])
                i = j
            else:
                i += 1
        return groups


class MergeOnFlushMergePolicy(MergePolicy):
    """sandbox/index/MergeOnFlushMergePolicy.java (a FilterMergePolicy):
    normal merge selection delegates to the wrapped policy; at FULL
    FLUSH every small segment (below the threshold — doc count is this
    engine's segment-size metric, the reference uses bytes) merges into
    ONE group so NRT refreshes after tiny appends don't accumulate
    micro-segments (:33-52). At most one group, only when >= 2 small
    segments exist."""

    def __init__(self, wrapped="tiered",
                 small_segment_threshold_docs: int = 1000, **kwargs):
        self.wrapped = get_merge_policy(wrapped, **kwargs)
        self.small_segment_threshold_docs = small_segment_threshold_docs

    def find_merges(self, segments: list[dict]) -> list[list[str]]:
        return self.wrapped.find_merges(segments)

    def find_full_flush_merges(
        self, segments: list[dict]
    ) -> list[list[str]]:
        small = [
            s["segment_id"] for s in sorted(
                segments, key=lambda x: x["segment_id"])
            if s["num_docs"] < self.small_segment_threshold_docs
        ]
        return [small] if len(small) > 1 else []


class NoMergePolicy(MergePolicy):
    """NoMergePolicy.java: never merges (read-only / externally
    managed indexes)."""

    def find_merges(self, segments: list[dict]) -> list[list[str]]:
        return []


_MERGE_POLICIES = {
    "tiered": TieredMergePolicy,
    "log_doc": LogDocMergePolicy,
    "no_merge": NoMergePolicy,
    "merge_on_flush": MergeOnFlushMergePolicy,
}


def get_merge_policy(policy, **kwargs) -> MergePolicy:
    """Resolve a policy name or pass an instance through (the
    NamedSPILoader.lookup analog)."""
    if isinstance(policy, MergePolicy):
        return policy
    try:
        return _MERGE_POLICIES[policy](**kwargs)
    except KeyError:
        raise ValueError(
            f"unknown merge policy {policy!r}; "
            f"available: {sorted(_MERGE_POLICIES)}"
        ) from None


def register_merge_policy(name: str, cls) -> None:
    _MERGE_POLICIES[name] = cls


def _merge_postings_fn(order: dict[str, int], fmt_name: str = "for104"):
    """applyInPandas kernel: merge one (field, term)'s posting rows from
    the input segments into a single row. `order` maps segment_id ->
    rank by first doc_id (ranges are disjoint, so concatenation in rank
    order preserves the strictly-increasing docID invariant). Tombstone
    purging happens BEFORE this kernel in a distributed per-segment
    cogroup (_purge_segment_fn), so norm bytes and position varints
    concatenate raw with no decode — the streaming-merge property."""

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
        docs_l, freqs_l = [], []
        have_pos = pdf["positions"].notna().all()
        from lucene_spark.index.formats import get_postings_format

        fmt = get_postings_format(fmt_name)
        for row in pdf.itertuples():
            d, f = fmt.decode(bytes(row.postings))
            docs_l.append(d)
            freqs_l.append(f)
        docs = np.concatenate(docs_l)
        freqs = np.concatenate(freqs_l)
        norms_b = b"".join(bytes(b) for b in pdf["norms"])
        norms = np.frombuffer(norms_b, dtype=np.uint8).astype(np.int64)
        blob, block_last, imp_f, imp_n = fmt.encode(docs, freqs, norms)
        pos = b"".join(bytes(b) for b in pdf["positions"]) if have_pos else None
        have_off = pdf["offsets"].notna().all()
        off = b"".join(bytes(b) for b in pdf["offsets"]) if have_off else None
        have_pay = pdf["payloads"].notna().all()
        pay = b"".join(bytes(b) for b in pdf["payloads"]) if have_pay else None
        return pd.DataFrame(
            {
                "field": [pdf["field"].iat[0]],
                "term": [pdf["term"].iat[0]],
                "doc_freq": [int(len(docs))],
                "total_term_freq": [int(freqs.sum())],
                "postings": [blob],
                "norms": [norms_b],
                "positions": [pos],
                "offsets": [off],
                "payloads": [pay],
                "block_last_doc": [[int(x) for x in block_last]],
                "impact_freqs": [[[int(v) for v in fs] for fs in imp_f]],
                "impact_norms": [[[int(v) for v in ns] for ns in imp_n]],
            }
        )

    return run


_POSTING_COLS = [
    "segment_id", "field", "term", "doc_freq", "total_term_freq",
    "postings", "norms", "positions", "offsets", "payloads",
    "block_last_doc", "impact_freqs", "impact_norms",
]


def _purge_segment_fn(left, right, fmt_name: str = "for104"):
    """Cogrouped applyInPandas kernel (SegmentMerger-over-liveDocs role):
    drop tombstoned docs from ONE segment's posting rows. ``left`` is the
    segment's posting rows, ``right`` its tombstones — delivered by a
    distributed equi-join, never a driver collect, so a 100x-churn index
    purges with memory proportional to one segment's tombstones.
    Membership test is a vectorized searchsorted against the sorted
    tombstone array; untouched rows pass through without re-encoding."""
    import numpy as np
    import pandas as pd

    from lucene_spark.index import codec
    from lucene_spark.index.formats import get_postings_format

    fmt = get_postings_format(fmt_name)

    if len(left) == 0:
        return left[_POSTING_COLS]
    if len(right) == 0:
        return left[_POSTING_COLS]
    dels = np.unique(right["doc_id"].to_numpy(dtype=np.int64))
    out = {c: [] for c in _POSTING_COLS}

    def emit(row, docs=None, freqs=None, postings=None, norms=None,
             positions=None, offsets=None, payloads=None, block_last=None,
             imp_f=None, imp_n=None):
        out["segment_id"].append(row.segment_id)
        out["field"].append(row.field)
        out["term"].append(row.term)
        if docs is None:
            out["doc_freq"].append(row.doc_freq)
            out["total_term_freq"].append(row.total_term_freq)
            out["postings"].append(row.postings)
            out["norms"].append(row.norms)
            out["positions"].append(row.positions)
            out["offsets"].append(row.offsets)
            out["payloads"].append(row.payloads)
            out["block_last_doc"].append(row.block_last_doc)
            out["impact_freqs"].append(row.impact_freqs)
            out["impact_norms"].append(row.impact_norms)
        else:
            out["doc_freq"].append(int(len(docs)))
            out["total_term_freq"].append(int(freqs.sum()))
            out["postings"].append(postings)
            out["norms"].append(norms)
            out["positions"].append(positions)
            out["offsets"].append(offsets)
            out["payloads"].append(payloads)
            out["block_last_doc"].append([int(x) for x in block_last])
            out["impact_freqs"].append([[int(v) for v in fs] for fs in imp_f])
            out["impact_norms"].append([[int(v) for v in ns] for ns in imp_n])

    for row in left.itertuples():
        docs, freqs = fmt.decode(bytes(row.postings))
        idx = np.searchsorted(dels, docs)
        hit = (idx < len(dels)) & (dels[np.minimum(idx, len(dels) - 1)] == docs)
        if not hit.any():
            emit(row)
            continue
        keep = ~hit
        if not keep.any():
            continue  # every doc purged — the term row disappears
        norms = np.frombuffer(bytes(row.norms), dtype=np.uint8).astype(np.int64)
        pos_blob = off_blob = pay_blob = None
        if row.positions is not None:
            pos_l = codec.decode_positions(bytes(row.positions), freqs)
            pos_l = [p for p, kp in zip(pos_l, keep) if kp]
        if row.payloads is not None:
            pays = codec.decode_payloads_flat(bytes(row.payloads), freqs)
            p_ends = np.cumsum(freqs)
            p_groups = [pays[e - f:e] for f, e in zip(freqs, p_ends)]
            p_groups = [p for p, kp in zip(p_groups, keep) if kp]
        if row.offsets is not None:
            o_starts, o_ends, _ = codec.decode_offsets_flat(
                bytes(row.offsets), freqs
            )
            o_ends_idx = np.cumsum(freqs)
            o_pairs = [
                (o_starts[e - f:e], o_ends[e - f:e])
                for f, e in zip(freqs, o_ends_idx)
            ]
            o_pairs = [p for p, kp in zip(o_pairs, keep) if kp]
        docs2, freqs2, norms2 = docs[keep], freqs[keep], norms[keep]
        blob, block_last, imp_f, imp_n = fmt.encode(
            docs2, freqs2, norms2
        )
        if row.positions is not None:
            pos_blob = codec.encode_positions(freqs2, pos_l)
        if row.offsets is not None:
            parts = []
            for st_, en_ in o_pairs:
                sdel = np.diff(st_, prepend=np.int64(0))
                inter = np.empty(2 * len(st_), dtype=np.int64)
                inter[0::2] = sdel
                inter[1::2] = en_ - st_
                parts.append(inter)
            off_blob = (
                codec.encode_varints_offsets(np.concatenate(parts))[0]
                if parts else b""
            )
        if row.payloads is not None:
            pay_blob = (
                codec.encode_varints_offsets(
                    np.concatenate(p_groups).astype(np.uint64)
                )[0]
                if p_groups else b""
            )
        emit(
            row, docs=docs2, freqs=freqs2, postings=blob,
            norms=norms2.astype(np.uint8).tobytes(), positions=pos_blob,
            offsets=off_blob, payloads=pay_blob, block_last=block_last,
            imp_f=imp_f, imp_n=imp_n,
        )
    return pd.DataFrame(out) if out["term"] else left.iloc[0:0][_POSTING_COLS]


_MERGED_SCHEMA = (
    "field string, term string, doc_freq int, total_term_freq long, "
    "postings binary, norms binary, positions binary, offsets binary, "
    "payloads binary, block_last_doc array<long>, "
    "impact_freqs array<array<int>>, impact_norms array<array<int>>"
)


def merge_round(
    spark: SparkSession,
    index_dir: str,
    segs_per_tier: int = 8,
    max_merge_at_once: int = 10,
    max_merged_docs: int = 5_000_000,
    salt_max_docs: int = 1_000_000,
    max_concurrent_merges: int = 4,
    policy: "str | MergePolicy | None" = None,
    trigger: str = "explicit",
) -> int:
    """Run one merge round: apply every group the policy picks, commit
    one new manifest generation. Returns the number of merges executed.
    ``policy`` overrides the default tiered selection (a name from
    get_merge_policy or a MergePolicy instance); the tiered keyword
    args above are ignored when a policy is given. ``trigger`` selects
    the policy hook: "explicit" = find_merges (MergeTrigger.EXPLICIT),
    "full_flush" = find_full_flush_merges (the post-commit hook
    MergeOnFlushMergePolicy implements)."""
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
    if policy is None:
        groups = find_merges(
            live_metrics, segs_per_tier, max_merge_at_once, max_merged_docs
        )
        if trigger == "full_flush":
            groups = []
    else:
        p = get_merge_policy(policy)
        groups = (
            p.find_full_flush_merges(live_metrics)
            if trigger == "full_flush" else p.find_merges(live_metrics)
        )
    if not groups:
        return 0

    merges = list(m.get("merges", []))
    next_b = 1 + max(
        [b["batch"] for b in m["batches"]] + [mg["batch"] for mg in merges]
    )
    gen = m["generation"]
    postings_all = spark.read.parquet(f"{index_dir}/postings")
    if "offsets" not in postings_all.columns:  # pre-layout-3 index
        postings_all = postings_all.withColumn(
            "offsets", F.lit(None).cast("binary")
        )
    if "payloads" not in postings_all.columns:  # pre-layout-4 index
        postings_all = postings_all.withColumn(
            "payloads", F.lit(None).cast("binary")
        )
    doclens_all = spark.read.parquet(f"{index_dir}/doclens")

    # tombstones covered by merged segments get PURGED (dropped from the
    # merged postings/doclens and removed from the tombstone set) — the
    # Lucene merge-applies-deletes contract. The tombstone set stays a
    # DataFrame end-to-end: membership is an equi-join against each
    # group's doclens, purging is a per-segment cogroup kernel, and the
    # surviving set is rewritten by an anti-join — no driver collect of
    # doc ids anywhere on this path (100x-churn safe).
    from lucene_spark.index.deletes import deleted_ids_df

    dels_df = deleted_ids_df(spark, index_dir, m)
    covered_frames: list[DataFrame] = []

    def _do_group(gi: int, group: list) -> tuple:
        t0 = time.time()
        covered = None
        new_sid = f"m{gen + 1:04d}g{gi:03d}"
        order = {
            sid: rank
            for rank, sid in enumerate(
                sorted(group, key=lambda s: seg_metrics[s]["first_doc_id"])
            )
        }
        rows = postings_all.filter(F.col("segment_id").isin(group)).select(
            *_POSTING_COLS
        )
        group_doclens = doclens_all.filter(F.col("segment_id").isin(group))
        if dels_df is not None:
            # tombstones tagged with their OWNING segment via exact
            # doc-membership (doclens equi-join) — never a doc-id-range
            # hull, which can overlap other live segments after
            # non-contiguous merges and would purge (= resurrect) their
            # tombstones
            seg_dels = dels_df.join(
                group_doclens.select("segment_id", "doc_id").distinct(),
                "doc_id",
            ).select("segment_id", "doc_id")
            rows = (
                rows.groupBy("segment_id")
                .cogroup(seg_dels.groupBy("segment_id"))
                .applyInPandas(
                    partial(
                        _purge_segment_fn,
                        fmt_name=m.get("postings_format") or "for104",
                    ),
                    schema=f"segment_id string, {_MERGED_SCHEMA}",
                )
            )
            covered = seg_dels.select("doc_id")
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
        merged = (
            salted.groupBy("field", "term", "_salt")
            .applyInPandas(
                _merge_postings_fn(order, m.get("postings_format") or "for104"),
                schema=_MERGED_SCHEMA,
            )
            .withColumn("segment_id", F.lit(new_sid))
        )
        out_b = next_b + gi
        merged.write.mode("overwrite").parquet(f"{index_dir}/postings/batch={out_b}")
        dl = group_doclens.withColumn("segment_id", F.lit(new_sid))
        if dels_df is not None:
            dl = dl.join(dels_df, "doc_id", "left_anti")
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
        return (
            {
                "batch": out_b,
                "inputs": sorted(group),
                "segments": [metrics],
                "merge_sec": round(time.time() - t0, 3),
                "status": "committed",
            },
            covered,
        )


    # ConcurrentMergeScheduler role (core/index/ConcurrentMergeScheduler
    # .java): the round's merge groups are independent (disjoint input
    # segments, distinct output batch dirs), so they run as CONCURRENT
    # Spark jobs from a driver thread pool — the cluster scheduler
    # interleaves their stages across executors instead of draining one
    # merge's tail tasks at a time. Results are consumed in group order,
    # so the manifest is byte-identical to the sequential schedule.
    from concurrent.futures import ThreadPoolExecutor

    workers = max(1, min(max_concurrent_merges, len(groups)))
    if workers == 1:
        results = [_do_group(gi, g) for gi, g in enumerate(groups)]
    else:
        with ThreadPoolExecutor(max_workers=workers) as ex:
            results = list(ex.map(_do_group, range(len(groups)), groups))
    for rec, covered in results:
        merges.append(rec)
        if covered is not None:
            covered_frames.append(covered)

    out = dict(m)
    out.pop("generation", None)
    out.pop("committed_at", None)
    out["merges"] = merges
    if dels_df is not None and covered_frames:
        # rewrite surviving tombstones as one fresh batch — a distributed
        # anti-join against everything the merges just purged; only
        # scalar counts ever reach the driver
        covered = covered_frames[0]
        for cf in covered_frames[1:]:
            covered = covered.unionByName(cf)
        n_total = dels_df.count()
        remaining_df = dels_df.join(covered.distinct(), "doc_id", "left_anti")
        n_remaining = remaining_df.count()
        if n_remaining != n_total:
            nb = _next_tombstone_batch(out)
            if n_remaining:
                remaining_df.write.mode("overwrite").parquet(
                    f"{index_dir}/deletes/batch={nb}"
                )
                out["delete_batches"] = [
                    {"batch": nb, "num_docs": int(n_remaining)}
                ]
            else:
                out["delete_batches"] = []
            out["num_deleted"] = int(n_remaining)
            out["purged_docs"] = int(m.get("purged_docs", 0)) + int(
                n_total - n_remaining
            )
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


def force_merge_deletes(
    spark: SparkSession,
    index_dir: str,
    deletes_pct_allowed: float = 10.0,
    max_merge_at_once: int = 10,
) -> int:
    """IndexWriter.forceMergeDeletes via
    TieredMergePolicy.findForcedDeletesMerges (TieredMergePolicy.java:
    forceMergeDeletesPctAllowed, default 10%): rewrite every live
    segment whose tombstone percentage EXCEEDS the threshold, purging
    its deletes — eligible segments merge together in build order,
    ``max_merge_at_once`` per group, a lone eligible segment rewrites
    alone (the expunge case). Per-segment tombstone counts come from
    ONE aggregation bucketing the tombstone doc_ids into the manifest's
    [first_doc_id, last_doc_id] ranges — nothing but the <= one row per
    segment summary reaches the driver. Returns merges executed."""
    from lucene_spark.search.executor import IndexReader

    m = mani.read_manifest(index_dir)
    reader = IndexReader(spark, index_dir)
    dels = reader.deleted_df()
    if dels is None:
        return 0
    live = mani.live_segment_ids(m)
    segs: list[dict] = []
    for b in m["batches"]:
        segs.extend(b["segments"])
    for mg in m.get("merges", []) or []:
        segs.extend(mg["segments"])
    segs = [
        s for s in sorted(segs, key=lambda x: x["segment_id"])
        if live is None or s["segment_id"] in live
    ]
    ranges = spark.createDataFrame(
        [(s["segment_id"], s["first_doc_id"], s["last_doc_id"]) for s in segs],
        "segment_id string, lo long, hi long",
    )
    counts = {
        r["segment_id"]: int(r["n_del"])
        for r in dels.join(
            F.broadcast(ranges),
            (F.col("doc_id") >= F.col("lo")) & (F.col("doc_id") <= F.col("hi")),
        )
        .groupBy("segment_id")
        .agg(F.count("*").alias("n_del"))
        .collect()
    }
    eligible = [
        s["segment_id"]
        for s in segs
        if s["num_docs"] > 0
        and counts.get(s["segment_id"], 0) * 100.0 / s["num_docs"]
        > deletes_pct_allowed
    ]
    if not eligible:
        return 0
    groups = [
        eligible[i:i + max_merge_at_once]
        for i in range(0, len(eligible), max_merge_at_once)
    ]

    class _Forced(MergePolicy):
        def find_merges(self, segments):
            return groups

    return merge_round(spark, index_dir, policy=_Forced())
