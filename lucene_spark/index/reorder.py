"""BP doc-id reordering — recursive graph bisection over the doc-term
bipartite graph (misc/index/BPIndexReorderer.java, applied at merge by
BPReorderingMergePolicy.java; the published algorithm is "Compressing
Graphs and Indexes with Recursive Graph Bisection", Dhulipala et al.,
KDD'16, which the reference cites).

Reordering assigns nearby doc ids to docs sharing many terms, shrinking
the delta-encoded posting blobs (smaller gaps -> fewer FOR bits) and
improving block locality for conjunctions. Like the reference, the
permutation is computed and applied WITHIN each segment — segment doc
ranges, global stats and the docs-per-segment contract are untouched,
so the op is embarrassingly parallel across segments:

- phase 1: one cogrouped applyInPandas over (postings x doclens) per
  segment runs the numpy bisection kernel and emits the permutation
  rows ``(segment_id, doc_id, new_doc_id)`` — both id sets are the
  SAME set, only the assignment to documents changes;
- phase 2: one cogrouped applyInPandas over (postings x perm) per
  segment decodes every blob, remaps + re-sorts docs (freqs, norms and
  the per-doc position/offset/payload groups permute in lockstep) and
  re-encodes — the purge kernel's rewrite discipline (merge.py);
- phase 3: doclens/docs/dv-updates remap their ``doc_id`` JVM-side
  (one equi-join each, no Python).

``term_stats``/``field_stats`` are invariant under any within-segment
permutation (same df/ttf/id set), so stats are not recomputed. The op
requires a tombstone-free index (run force_merge first — the reference
applies BP to freshly merged, delete-free segments) and refuses
index-sorted indexes (the permutation would destroy the sort the
manifest promises to early-termination).

At 100 TB the kernel cost is O(postings x iters x log(docs/leaf)) per
segment, CPU-bound and cluster-parallel per segment with zero shuffle
beyond the two segment-keyed cogroups; nothing touches the driver.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import SparkSession, functions as F

from lucene_spark.index import manifest as mani


def _gap_cost(df: np.ndarray, n: int) -> np.ndarray:
    """Expected delta-encoding cost of a term's postings within a
    partition of n docs: df * log2(expected gap) = df * log2(n/df)
    (BPIndexReorderer's fastLog2-based cost, up to the shared constant
    dropped by the difference in `_term_gains`)."""
    d = df.astype(np.float64)
    out = np.zeros_like(d)
    nz = d > 0
    out[nz] = d[nz] * (np.log2(float(n) + 1.0) - np.log2(d[nz]))
    return out


def _term_gains(dfl, dfr, nl, nr):
    """(gain of moving one left-doc occurrence right, right->left)."""
    base = _gap_cost(dfl, nl) + _gap_cost(dfr, nr)
    l2r = base - _gap_cost(dfl - 1, nl) - _gap_cost(dfr + 1, nr)
    r2l = base - _gap_cost(dfl + 1, nl) - _gap_cost(dfr - 1, nr)
    return l2r, r2l


def bp_permutation(
    indptr: np.ndarray,
    terms: np.ndarray,
    min_partition_size: int = 32,
    max_iters: int = 20,
) -> np.ndarray:
    """Recursive-bisection permutation for one segment.

    ``indptr``/``terms`` is the CSR doc->terms incidence (doc i's terms
    are ``terms[indptr[i]:indptr[i+1]]``). Returns ``rank`` with
    ``rank[i]`` = new position of doc i (a bijection on range(n)).

    Each node swaps the highest-gain (left, right) doc pairs while the
    combined gain is positive (BPIndexReorderer.shuffle's swap loop),
    then recurses on both halves down to ``min_partition_size``."""
    n = int(len(indptr) - 1)
    order = np.arange(n, dtype=np.int64)
    if n <= 1:
        return order
    counts = np.diff(indptr).astype(np.int64)

    stack = [(0, n)]
    while stack:
        lo, hi = stack.pop()
        m = hi - lo
        if m <= max(2, min_partition_size):
            continue
        mid = lo + m // 2
        node_docs = order[lo:hi]
        # node-local CSR via a fully vectorized range gather (no Python
        # loop per doc): flat index j of the node's postings maps to
        # terms[start_of_its_doc + offset_within_doc]
        node_counts = counts[node_docs]
        tot = int(node_counts.sum())
        if tot:
            heads = np.cumsum(node_counts) - node_counts
            pos = (
                np.arange(tot, dtype=np.int64)
                - np.repeat(heads, node_counts)
                + np.repeat(indptr[node_docs], node_counts)
            )
            flat_terms = terms[pos]
        else:
            flat_terms = np.empty(0, dtype=np.int64)
        _, tcomp = np.unique(flat_terms, return_inverse=True)
        n_t = int(tcomp.max()) + 1 if len(tcomp) else 1
        post_doc = np.repeat(np.arange(m, dtype=np.int64), node_counts)
        # side[j] True = right half; start from current positional split
        side = np.zeros(m, dtype=bool)
        side[mid - lo:] = True
        nl = int(mid - lo)
        nr = int(m - nl)

        def node_cost(s):
            ps = s[post_doc]
            dl = np.bincount(tcomp[~ps], minlength=n_t)
            dr = np.bincount(tcomp[ps], minlength=n_t)
            return float((_gap_cost(dl, nl) + _gap_cost(dr, nr)).sum())

        cur = node_cost(side)
        for _ in range(max_iters):
            post_side = side[post_doc]
            dfl = np.bincount(tcomp[~post_side], minlength=n_t)
            dfr = np.bincount(tcomp[post_side], minlength=n_t)
            g_l2r, g_r2l = _term_gains(dfl, dfr, nl, nr)
            doc_gain_l = np.bincount(
                post_doc[~post_side], weights=g_l2r[tcomp[~post_side]], minlength=m
            )
            doc_gain_r = np.bincount(
                post_doc[post_side], weights=g_r2l[tcomp[post_side]], minlength=m
            )
            li = np.flatnonzero(~side)
            ri = np.flatnonzero(side)
            lg = doc_gain_l[li]
            rg = doc_gain_r[ri]
            lo_ord = li[np.argsort(-lg, kind="stable")]
            ro_ord = ri[np.argsort(-rg, kind="stable")]
            pair = min(len(lo_ord), len(ro_ord))
            comb = doc_gain_l[lo_ord[:pair]] + doc_gain_r[ro_ord[:pair]]
            n_swap = int(np.searchsorted(-comb, 0.0, side="left"))
            # swap only strictly-positive combined gains
            while n_swap > 0 and comb[n_swap - 1] <= 1e-12:
                n_swap -= 1
            # gains assume single moves; a bulk swap can overshoot (and,
            # on corpora with many near-identical docs, oscillate
            # forever). Accept the largest prefix of the gain-sorted
            # pairs that ACTUALLY lowers the node objective — monotone
            # descent, so the loop always terminates at a local optimum.
            improved = False
            while n_swap > 0:
                trial = side.copy()
                trial[lo_ord[:n_swap]] = True
                trial[ro_ord[:n_swap]] = False
                c = node_cost(trial)
                if c < cur - 1e-9:
                    side, cur, improved = trial, c, True
                    break
                n_swap //= 2
            if not improved:
                break
        # write back: left docs keep [lo, mid), right [mid, hi),
        # original relative order inside each half (stable)
        left_docs = node_docs[~side]
        right_docs = node_docs[side]
        order[lo: lo + len(left_docs)] = left_docs
        order[lo + len(left_docs): hi] = right_docs
        stack.append((lo, mid))
        stack.append((mid, hi))

    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n, dtype=np.int64)
    return rank


def log_gap_cost(indptr: np.ndarray, terms: np.ndarray, rank: np.ndarray) -> float:
    """Σ_terms Σ_gaps log2(gap) of the permuted index — the objective
    BP minimizes; used by tests and the evidence notebook."""
    n = len(indptr) - 1
    counts = np.diff(indptr)
    post_doc = np.repeat(np.arange(n), counts)
    new_doc = rank[post_doc]
    o = np.lexsort((new_doc, terms))
    t_s, d_s = terms[o], new_doc[o]
    first = np.ones(len(t_s), dtype=bool)
    first[1:] = t_s[1:] != t_s[:-1]
    gaps = np.empty(len(d_s), dtype=np.int64)
    gaps[first] = d_s[first] + 1
    gaps[~first] = d_s[~first] - d_s[np.flatnonzero(~first) - 1]
    return float(np.log2(gaps.astype(np.float64)).sum())


def _perm_fn(fmt_name: str, min_df: int, max_df_frac: float,
             min_partition_size: int, max_iters: int):
    """Cogrouped kernel: (postings rows of one segment) x (that
    segment's doc universe) -> permutation rows."""

    def run(left, right):
        import pandas as pd

        from lucene_spark.index.formats import get_postings_format

        if len(right) == 0:
            return pd.DataFrame(
                {"segment_id": [], "doc_id": [], "new_doc_id": []}
            )
        seg = right["segment_id"].iat[0]
        ids = np.sort(right["doc_id"].to_numpy(np.int64))
        n = len(ids)
        fmt = get_postings_format(fmt_name)
        max_df = max(min_df, int(max_df_frac * n))
        doc_lists, term_ids = [], []
        tid = 0
        for row in left.itertuples():
            if not (min_df <= int(row.doc_freq) <= max_df):
                continue
            docs, _ = fmt.decode(bytes(row.postings))
            doc_lists.append(np.searchsorted(ids, docs))
            term_ids.append(np.full(len(docs), tid, dtype=np.int64))
            tid += 1
        if tid == 0:
            rank = np.arange(n, dtype=np.int64)
        else:
            post_doc = np.concatenate(doc_lists)
            post_term = np.concatenate(term_ids)
            o = np.argsort(post_doc, kind="stable")
            post_doc, post_term = post_doc[o], post_term[o]
            indptr = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(np.bincount(post_doc, minlength=n), out=indptr[1:])
            rank = bp_permutation(
                indptr, post_term,
                min_partition_size=min_partition_size,
                max_iters=max_iters,
            )
        return pd.DataFrame(
            {
                "segment_id": np.repeat(seg, n),
                "doc_id": ids,
                "new_doc_id": ids[rank],
            }
        )

    return run


def _rewrite_fn(fmt_name: str):
    """Cogrouped kernel: (posting rows of one segment) x (that
    segment's permutation) -> rewritten rows, every companion lane
    permuted in lockstep (the purge kernel's rewrite discipline)."""

    def run(left, right):
        import pandas as pd

        from lucene_spark.index import codec
        from lucene_spark.index.formats import get_postings_format

        if len(left) == 0 or len(right) == 0:
            return left
        fmt = get_postings_format(fmt_name)
        old = right["doc_id"].to_numpy(np.int64)
        new = right["new_doc_id"].to_numpy(np.int64)
        o = np.argsort(old)
        old_s, new_s = old[o], new[o]
        out = left.copy()
        p_blobs, n_blobs, pos_blobs, off_blobs, pay_blobs = [], [], [], [], []
        blasts, imps_f, imps_n = [], [], []
        for row in left.itertuples():
            docs, freqs = fmt.decode(bytes(row.postings))
            norms = np.frombuffer(bytes(row.norms), dtype=np.uint8).astype(np.int64)
            nd = new_s[np.searchsorted(old_s, docs)]
            idx = np.argsort(nd)
            docs2, freqs2, norms2 = nd[idx], freqs[idx], norms[idx]
            blob, block_last, imp_f, imp_n = fmt.encode(docs2, freqs2, norms2)
            p_blobs.append(blob)
            n_blobs.append(norms2.astype(np.uint8).tobytes())
            blasts.append([int(x) for x in block_last])
            imps_f.append([[int(v) for v in fs] for fs in imp_f])
            imps_n.append([[int(v) for v in ns] for ns in imp_n])
            if row.positions is not None:
                pos_l = codec.decode_positions(bytes(row.positions), freqs)
                pos_blobs.append(
                    codec.encode_positions(freqs2, [pos_l[i] for i in idx])
                )
            else:
                pos_blobs.append(None)
            if row.offsets is not None:
                o_starts, o_ends, _ = codec.decode_offsets_flat(
                    bytes(row.offsets), freqs
                )
                ends_idx = np.cumsum(freqs)
                groups = [
                    (o_starts[e - f: e], o_ends[e - f: e])
                    for f, e in zip(freqs, ends_idx)
                ]
                parts = []
                for i in idx:
                    st_, en_ = groups[i]
                    sdel = np.diff(st_, prepend=np.int64(0))
                    inter = np.empty(2 * len(st_), dtype=np.int64)
                    inter[0::2] = sdel
                    inter[1::2] = en_ - st_
                    parts.append(inter)
                off_blobs.append(
                    codec.encode_varints_offsets(np.concatenate(parts))[0]
                    if parts else b""
                )
            else:
                off_blobs.append(None)
            if row.payloads is not None:
                pays = codec.decode_payloads_flat(bytes(row.payloads), freqs)
                ends_idx = np.cumsum(freqs)
                groups = [pays[e - f: e] for f, e in zip(freqs, ends_idx)]
                pay_blobs.append(
                    codec.encode_varints_offsets(
                        np.concatenate([groups[i] for i in idx]).astype(np.uint64)
                    )[0]
                    if groups else b""
                )
            else:
                pay_blobs.append(None)
        out["postings"] = p_blobs
        out["norms"] = n_blobs
        out["positions"] = pos_blobs
        out["offsets"] = off_blobs
        out["payloads"] = pay_blobs
        out["block_last_doc"] = blasts
        out["impact_freqs"] = imps_f
        out["impact_norms"] = imps_n
        return out

    return run


def bp_reorder_index(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    field: str | None = None,
    min_doc_freq: int = 2,
    max_doc_freq_frac: float = 0.5,
    min_partition_size: int = 32,
    max_iters: int = 20,
) -> int:
    """Copy ``src_dir`` to ``out_dir`` with BP-reordered doc ids; returns
    the new manifest generation. Terms outside [min_doc_freq,
    max_doc_freq_frac * segment_docs] are excluded from the incidence
    (BPIndexReorderer.setMinDocFreq / maxDocFreq: ubiquitous and
    singleton terms carry no reordering signal but dominate cost)."""
    import os
    import shutil

    m = mani.read_manifest(src_dir)
    if m.get("sort_by"):
        raise ValueError("cannot BP-reorder an index-sorted index")
    if m.get("delete_batches") or int(m.get("num_deleted", 0)) > 0:
        raise ValueError(
            "index has tombstones; force_merge to purge them before reordering"
        )
    if m.get("dv_update_batches"):
        raise ValueError("flush DV-update batches before reordering")
    f = field or m["field"]
    fmt_name = m.get("postings_format") or "for104"

    shutil.copytree(src_dir, out_dir)

    from lucene_spark.search.executor import IndexReader

    src = IndexReader(spark, src_dir)

    # ---- phase 1: permutation per segment ----
    inc = src.postings().filter(F.col("field") == f).select(
        "segment_id", "doc_freq", "postings"
    )
    universe = src.doclens().select("segment_id", "doc_id").distinct()
    perm = (
        inc.groupBy("segment_id")
        .cogroup(universe.groupBy("segment_id"))
        .applyInPandas(
            _perm_fn(
                fmt_name, min_doc_freq, max_doc_freq_frac,
                min_partition_size, max_iters,
            ),
            schema="segment_id string, doc_id long, new_doc_id long",
        )
    )
    perm_dir = f"{out_dir}/bp_perm_tmp"
    perm.write.mode("overwrite").parquet(perm_dir)
    perm = spark.read.parquet(perm_dir)

    # ---- phase 2: rewrite every postings batch dir in place ----
    proot = f"{out_dir}/postings"
    for entry in sorted(os.listdir(proot)):
        bdir = f"{proot}/{entry}"
        if not os.path.isdir(bdir) or entry.startswith("."):
            continue
        df = spark.read.parquet(bdir)
        rewritten = (
            df.groupBy("segment_id")
            .cogroup(perm.groupBy("segment_id"))
            .applyInPandas(_rewrite_fn(fmt_name), schema=df.schema)
        )
        tmp = f"{proot}/.bp_{entry}"
        rewritten.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(bdir)
        shutil.move(tmp, bdir)

    # ---- phase 3: doclens + docs registry remap (JVM joins) ----
    idmap = perm.select("doc_id", "new_doc_id")
    for sub in ("doclens", "docs"):
        root = f"{out_dir}/{sub}"
        for entry in sorted(os.listdir(root)):
            bdir = f"{root}/{entry}"
            if not os.path.isdir(bdir) or entry.startswith("."):
                continue
            df = spark.read.parquet(bdir)
            out = (
                df.join(idmap, "doc_id", "left")
                .withColumn(
                    "doc_id", F.coalesce(F.col("new_doc_id"), F.col("doc_id"))
                )
                .drop("new_doc_id")
                .select(*df.columns)
            )
            tmp = f"{root}/.bp_{entry}"
            out.write.mode("overwrite").parquet(tmp)
            shutil.rmtree(bdir)
            shutil.move(tmp, bdir)

    shutil.rmtree(perm_dir)
    out_m = dict(m)
    out_m.pop("generation", None)
    out_m.pop("committed_at", None)
    out_m["reordered"] = {
        "algo": "bp",
        "field": f,
        "min_doc_freq": min_doc_freq,
        "max_doc_freq_frac": max_doc_freq_frac,
        "max_iters": max_iters,
    }
    return mani.commit_manifest(out_dir, out_m)


# ---------------------------------------------------------------------------
# BpVectorReorderer (misc/index/BpVectorReorderer.java): the same BP
# recursion over vectors — each node splits so every half sits closer
# to its own centroid, which (reference class note) maximizes pairwise
# similarity within each half for euclidean/dot/cosine scores.
# Centroids are fully recalculated every iteration, as the reference
# does ("incremental updates ... instead the centroids are fully
# recalculated").
# ---------------------------------------------------------------------------


def bp_vector_permutation(
    vectors: np.ndarray,
    similarity: str = "cosine",
    min_partition_size: int = 32,
    max_iters: int = 20,
) -> np.ndarray:
    """rank[i] = new position of vector i; similar vectors end adjacent."""
    v = np.asarray(vectors, dtype=np.float64)
    n = len(v)
    order = np.arange(n, dtype=np.int64)
    if n <= 1:
        return order
    if similarity == "cosine":
        norms = np.linalg.norm(v, axis=1)
        v = v / np.maximum(norms, 1e-12)[:, None]
    elif similarity != "euclidean":
        raise ValueError("similarity must be cosine or euclidean")

    stack = [(0, n)]
    while stack:
        lo, hi = stack.pop()
        m = hi - lo
        if m <= max(2, min_partition_size):
            continue
        mid = lo + m // 2
        node = order[lo:hi]
        nv = v[node]
        side = np.zeros(m, dtype=bool)
        side[mid - lo:] = True

        def node_cost(s):
            # sum of squared distances to the side centroids (the
            # euclidean form; on unit vectors it is a monotone
            # transform of summed cosine to the centroid)
            cl = nv[~s].mean(axis=0)
            cr = nv[s].mean(axis=0)
            return float(
                ((nv[~s] - cl) ** 2).sum() + ((nv[s] - cr) ** 2).sum()
            )

        cur = node_cost(side)
        for _ in range(max_iters):
            cl = nv[~side].mean(axis=0)
            cr = nv[side].mean(axis=0)
            d_l = ((nv - cl) ** 2).sum(axis=1)
            d_r = ((nv - cr) ** 2).sum(axis=1)
            gain_to_r = d_l - d_r  # positive: closer to the right centroid
            li = np.flatnonzero(~side)
            ri = np.flatnonzero(side)
            lo_ord = li[np.argsort(-gain_to_r[li], kind="stable")]
            ro_ord = ri[np.argsort(gain_to_r[ri], kind="stable")]
            pair = min(len(lo_ord), len(ro_ord))
            comb = gain_to_r[lo_ord[:pair]] - gain_to_r[ro_ord[:pair]]
            n_swap = int(np.searchsorted(-comb, 0.0, side="left"))
            while n_swap > 0 and comb[n_swap - 1] <= 1e-12:
                n_swap -= 1
            improved = False
            while n_swap > 0:
                trial = side.copy()
                trial[lo_ord[:n_swap]] = True
                trial[ro_ord[:n_swap]] = False
                c = node_cost(trial)
                if c < cur - 1e-9:
                    side, cur, improved = trial, c, True
                    break
                n_swap //= 2
            if not improved:
                break
        left = node[~side]
        right = node[side]
        order[lo: lo + len(left)] = left
        order[lo + len(left): hi] = right
        stack.append((lo, mid))
        stack.append((mid, hi))

    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(n, dtype=np.int64)
    return rank


def bp_vector_order(
    emb,
    vec_col: str = "embedding",
    id_col: str = "doc_id",
    similarity: str = "cosine",
    chunk: int = 250_000,
    min_partition_size: int = 32,
    max_iters: int = 20,
):
    """Spark surface: append a ``bp_pos`` ordering column to an
    embeddings table so that writing sorted by it co-locates similar
    vectors (fewer row groups touched per ANN probe; the locality the
    reference buys for HNSW neighborhoods). Like the doc reorderer the
    permutation is computed within bounded chunks — one applyInPandas
    kernel per ``chunk`` ids, embarrassingly parallel, nothing on the
    driver — and ``bp_pos = chunk_base + rank`` keeps chunks disjoint.
    -> input columns + bp_pos."""
    from pyspark.sql import functions as F

    def run(pdf):
        import pandas as pd

        vecs = np.stack(pdf[vec_col].to_numpy())
        rank = bp_vector_permutation(
            vecs, similarity=similarity,
            min_partition_size=min_partition_size, max_iters=max_iters,
        )
        out = pdf.copy()
        out["bp_pos"] = pdf["_chunk"].to_numpy(np.int64) * chunk + rank
        return out

    from pyspark.sql import types as T

    with_chunk = emb.withColumn(
        "_chunk", (F.col(id_col).cast("long") / chunk).cast("long")
    )
    schema = T.StructType(
        list(with_chunk.schema.fields)
        + [T.StructField("bp_pos", T.LongType())]
    )
    return (
        with_chunk.groupBy("_chunk")
        .applyInPandas(run, schema=schema)
        .drop("_chunk")
    )
