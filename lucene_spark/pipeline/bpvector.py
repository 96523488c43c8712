"""BP vector reordering (misc/index/BpVectorReorderer.java): recursive
balanced bisection over an embedding column so that similar vectors get
nearby ordinals — the vector-similarity twin of the doc-term BP reorder
(index/reorder.py). The reference's use: renumber vector ordinals
before building KNN graphs so graph neighbors compress and cache well;
here the same permutation additionally makes RANGE PARTITIONING
cluster-coherent, which is what per-partition graph ANN
(pipeline/graphann.py) wants — a query's true neighbors concentrate in
few partitions instead of spraying uniformly.

Kernel contract carried from the reference:

- each bisection level splits the id range at the midpoint and
  iterates: compute the two halves' CENTROIDS (the mean — the javadoc's
  derivation of the distance-minimizing representative), a per-vector
  BIAS (negative = attracted left: EUCLIDEAN -> d2(v,cl) - d2(v,cr);
  DOT/COSINE/MIP -> dot(v,cr) - dot(v,cl), computeBias), reorder the
  range by bias;
- convergence: stop when 500 * gain <= scale, where gain =
  maxLeftBias - minRightBias and scale = |leftCentroid -
  rightCentroid| (the reference's empirical 1/500 rule, line 336);
- recursion stops at min_partition_size (default 32) or max_iters
  (default 20) — AbstractBPReorderer defaults.

Scale shape: the reference is single-JVM (RAM-budget-checked); at
corpus scale the TOP log2(P) levels are trained on a deterministic
SAMPLE driver-side (a few thousand vectors — the IVF-Lloyd precedent,
pipeline/similarity.py), broadcast as a split tree, every vector routes
to its leaf in ONE narrow pass, and the EXACT kernel runs per leaf
inside applyInPandas — embarrassingly parallel, no driver data motion
beyond the sample.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

DEFAULT_MIN_PARTITION_SIZE = 32
DEFAULT_MAX_ITERS = 20


def _biases(v: np.ndarray, cl: np.ndarray, cr: np.ndarray, metric: str) -> np.ndarray:
    if metric == "euclidean":
        return ((v - cl) ** 2).sum(axis=1) - ((v - cr) ** 2).sum(axis=1)
    # dot / cosine / mip: colinear centroids of any scale induce the
    # same partition (javadoc), so no normalization needed
    return v @ cr - v @ cl


def _bisect(v: np.ndarray, ids: np.ndarray, metric: str,
            min_partition_size: int, max_iters: int) -> np.ndarray:
    n = len(ids)
    if n < 2 * min_partition_size:
        return ids
    mid = n // 2
    for _ in range(max_iters):
        cl = v[ids[:mid]].mean(axis=0)
        cr = v[ids[mid:]].mean(axis=0)
        b = _biases(v[ids], cl, cr, metric)
        diff = cl - cr
        scale = float(np.sqrt(diff @ diff))
        gain = float(b[:mid].max() - b[mid:].min())
        if 500.0 * gain <= scale:
            break
        # most-left-attracted first; stable keeps prior order on ties
        ids = ids[np.argsort(b, kind="stable")]
    left = _bisect(v, ids[:mid], metric, min_partition_size, max_iters)
    right = _bisect(v, ids[mid:], metric, min_partition_size, max_iters)
    return np.concatenate([left, right])


def bp_reorder_local(
    vectors: np.ndarray,
    metric: str = "dot",
    min_partition_size: int = DEFAULT_MIN_PARTITION_SIZE,
    max_iters: int = DEFAULT_MAX_ITERS,
) -> np.ndarray:
    """The in-memory kernel: returns new_to_old — position i of the
    result holds the ORIGINAL index that lands at ordinal i."""
    v = np.asarray(vectors, dtype=np.float32)
    ids = np.arange(len(v))
    return _bisect(v, ids, metric, min_partition_size, max_iters)


def _split_tree(sample: np.ndarray, levels: int, metric: str,
                max_iters: int) -> list[tuple[np.ndarray, np.ndarray]]:
    """Train the top `levels` bisection levels on the sample: a perfect
    binary tree stored as a list of (left_centroid, right_centroid) per
    node in breadth-first order."""
    nodes: list[tuple[np.ndarray, np.ndarray]] = []
    frontier = [np.arange(len(sample))]
    for _ in range(levels):
        nxt = []
        for ids in frontier:
            mid = max(1, len(ids) // 2)
            work = ids.copy()
            for _ in range(max_iters):
                cl = sample[work[:mid]].mean(axis=0)
                cr = sample[work[mid:]].mean(axis=0)
                b = _biases(sample[work], cl, cr, metric)
                diff = cl - cr
                scale = float(np.sqrt(diff @ diff))
                if len(work) > mid and 500.0 * float(
                    b[:mid].max() - b[mid:].min()
                ) <= scale:
                    break
                work = work[np.argsort(b, kind="stable")]
            cl = sample[work[:mid]].mean(axis=0)
            cr = sample[work[mid:]].mean(axis=0)
            nodes.append((cl, cr))
            nxt.append(work[:mid])
            nxt.append(work[mid:])
        frontier = nxt
    return nodes


def _route(v: np.ndarray, nodes, levels: int, metric: str) -> np.ndarray:
    """Leaf id (0..2^levels-1) per vector, following the bias sign."""
    leaf = np.zeros(len(v), dtype=np.int64)
    node_at_level_base = 0
    for lvl in range(levels):
        cl = np.stack([nodes[i][0] for i in range(node_at_level_base,
                                                  node_at_level_base + (1 << lvl))])
        cr = np.stack([nodes[i][1] for i in range(node_at_level_base,
                                                  node_at_level_base + (1 << lvl))])
        rel = leaf  # node index within the level
        if metric == "euclidean":
            b = (((v - cl[rel]) ** 2).sum(axis=1)
                 - ((v - cr[rel]) ** 2).sum(axis=1))
        else:
            b = (v * cr[rel]).sum(axis=1) - (v * cl[rel]).sum(axis=1)
        leaf = leaf * 2 + (b > 0).astype(np.int64)
        node_at_level_base += 1 << lvl
    return leaf


def bp_vector_reorder(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    metric: str = "dot",
    levels: int = 3,
    sample_size: int = 4096,
    min_partition_size: int = DEFAULT_MIN_PARTITION_SIZE,
    max_iters: int = DEFAULT_MAX_ITERS,
) -> DataFrame:
    """Global BP ordinal assignment: -> (id, new_ord) where new_ord is
    a dense global rank; range-partitioning or sorting by it co-locates
    similar vectors. Deterministic (hash-ordered sample, stable sorts).
    """
    spark = emb.sparkSession
    # deterministic sample: first `sample_size` rows by md5 of the id
    sample_rows = (
        emb.select(id_col, vec_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_size)
        .collect()
    )
    sample = np.array([r[vec_col] for r in sample_rows], dtype=np.float32)
    nodes = _split_tree(sample, levels, metric, max_iters)
    b_nodes = spark.sparkContext.broadcast(
        [(cl.tolist(), cr.tolist()) for cl, cr in nodes]
    )

    def _assign(pdf_iter):
        nds = [(np.array(cl, dtype=np.float32), np.array(cr, dtype=np.float32))
               for cl, cr in b_nodes.value]
        for pdf in pdf_iter:
            v = np.array(pdf[vec_col].tolist(), dtype=np.float32)
            leaf = _route(v, nds, levels, metric)
            yield pd.DataFrame({"id": pdf[id_col], "leaf": leaf,
                                vec_col: pdf[vec_col]})

    routed = emb.select(id_col, vec_col).mapInPandas(
        _assign, schema=f"id long, leaf long, {vec_col} array<float>"
    )

    def _local(key, pdf):
        v = np.array(pdf[vec_col].tolist(), dtype=np.float32)
        order = np.argsort(pdf["id"].to_numpy(), kind="stable")
        v = v[order]
        ids = pdf["id"].to_numpy()[order]
        perm = bp_reorder_local(v, metric, min_partition_size, max_iters)
        return pd.DataFrame({
            "id": ids[perm],
            "leaf": key[0],
            "local_ord": np.arange(len(perm), dtype=np.int64),
        })

    local = routed.groupBy("leaf").applyInPandas(
        _local, schema="id long, leaf long, local_ord long"
    )
    # global ordinal = leaf base + local ordinal; leaf sizes are a tiny
    # aggregation broadcast back (one row per leaf)
    sizes = local.groupBy("leaf").count().orderBy("leaf").collect()
    base, bases = 0, {}
    for r in sizes:
        bases[r["leaf"]] = base
        base += r["count"]
    mapping = F.create_map(
        *[x for lf, b in bases.items() for x in (F.lit(lf), F.lit(b))]
    )
    return local.select(
        F.col("id"),
        (mapping[F.col("leaf")] + F.col("local_ord")).alias("new_ord"),
    )
