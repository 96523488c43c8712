"""Graph-based ANN — the HNSW slot (SURVEY.md §2.4 KNN row), Spark-first.

Reference shape (core/src/java/org/apache/lucene/util/hnsw/
HnswGraphBuilder.java, HnswGraphSearcher.java): Lucene builds ONE
small-world graph PER SEGMENT, searches every segment's graph with a
greedy beam, and merges the per-segment top-k — the per-leaf pattern of
everything else in the engine. That decomposition is exactly what makes
a graph index Spark-native: graphs never span partitions, so build and
search are embarrassingly parallel ``applyInPandas`` passes and the
driver only merges segment-local top-k lists.

This module implements that decomposition with a flat NSW graph per
partition (single layer, degree-bounded M-NN with long-range links via
a random permutation ring — the navigable-small-world core of HNSW
without the level hierarchy; levels buy O(log n) entry at the scale of
ONE graph, and our per-segment graphs are bounded by partition sizing,
so a seeded multi-start beam plays that role):

- build: per partition, each vector links to its M nearest neighbors
  (within-partition exact kNN, vectorized numpy) plus ring links for
  connectivity — O(p^2) dot products per partition of size p, bounded
  by ``docs per partition``, never O(n^2) globally;
- search: per partition, greedy best-first beam from S seed entries
  with an ``ef``-sized frontier (HnswGraphSearcher.searchLevel
  semantics), then global TakeOrdered over the union.

Quality is MEASURED against the brute-force exact top-k (recall@k),
the same evidence contract as pipeline/similarity.py's LSH/IVF paths.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return mat / n


def _build_graph(mat: np.ndarray, m: int, seed: int) -> np.ndarray:
    """-> (p, m+2) int32 neighbor ids (within-partition indices):
    m nearest by cosine + 2 ring links from a seeded permutation."""
    p = len(mat)
    sims = mat @ mat.T
    np.fill_diagonal(sims, -np.inf)
    m_eff = min(m, p - 1)
    nbrs = np.argpartition(-sims, np.arange(m_eff), axis=1)[:, :m_eff]
    rng = np.random.default_rng(seed)
    perm = rng.permutation(p)
    rank = np.empty(p, dtype=np.int64)
    rank[perm] = np.arange(p)
    ring_next = perm[(rank + 1) % p]
    ring_prev = perm[(rank - 1) % p]
    return np.concatenate(
        [nbrs, ring_next[:, None], ring_prev[:, None]], axis=1
    ).astype(np.int32)


def _beam_search(
    mat: np.ndarray, nbrs: np.ndarray, q: np.ndarray, k: int, ef: int,
    n_seeds: int, seed: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Greedy best-first over the partition graph
    (HnswGraphSearcher.searchLevel): expand the best unexpanded frontier
    node, keep the ef best visited, stop when the frontier's best cannot
    improve the ef-th result. -> (local indices, cosines)."""
    p = len(mat)
    sims_to_q = mat @ q
    rng = np.random.default_rng(seed)
    seeds = rng.choice(p, size=min(n_seeds, p), replace=False)
    visited = np.zeros(p, dtype=bool)
    import heapq

    cand: list[tuple[float, int]] = []  # max-heap via negated sims
    best: list[tuple[float, int]] = []  # min-heap of the ef best
    for s in seeds:
        if not visited[s]:
            visited[s] = True
            heapq.heappush(cand, (-float(sims_to_q[s]), int(s)))
            heapq.heappush(best, (float(sims_to_q[s]), int(s)))
    while cand:
        negsim, u = heapq.heappop(cand)
        if len(best) >= ef and -negsim < best[0][0]:
            break  # nothing in the frontier can improve the ef-th
        for v in nbrs[u]:
            v = int(v)
            if visited[v]:
                continue
            visited[v] = True
            sv = float(sims_to_q[v])
            if len(best) < ef or sv > best[0][0]:
                heapq.heappush(cand, (-sv, v))
                heapq.heappush(best, (sv, v))
                if len(best) > ef:
                    heapq.heappop(best)
    top = sorted(best, key=lambda x: (-x[0], x[1]))[:k]
    idx = np.array([t[1] for t in top], dtype=np.int64)
    sims = np.array([t[0] for t in top], dtype=np.float64)
    return idx, sims


def ann_graph_topk(
    emb: DataFrame,
    query_id: int = 0,
    k: int = 10,
    m: int = 8,
    ef: int = 48,
    n_seeds: int = 4,
    partitions: int | None = None,
    hnsw_threshold: int = 1024,
) -> DataFrame:
    """Graph ANN top-k by cosine, global TakeOrdered merge.
    -> (vec_id, cos_x1e6).

    Per-partition builder selection (r3 "What's wrong #3" fix): the
    DEFAULT path is the hierarchical HNSW (`_build_hnsw`,
    O(p·efC·M·log p)) once a partition exceeds ``hnsw_threshold`` rows;
    the flat NSW all-pairs build (O(p^2) but cache-friendly and exact-
    nearest for its m links) remains only as the small-partition fast
    path, where the quadratic term is cheaper than the HNSW insert
    machinery.

    At 100 TB the graphs are built ONCE per segment and persisted beside
    the vectors (the Lucene99HnswVectorsFormat analog); here build and
    search fuse into one pass because the gate corpus rebuilds per call.
    """
    from lucene_spark.pipeline.similarity import _query_vec

    qv = np.asarray(_query_vec(emb, query_id), dtype=np.float64)
    qn = qv / (np.linalg.norm(qv) or 1.0)

    src = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    if partitions:
        src = src.repartition(partitions, "vec_id")

    def run(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = _normalize(np.stack(pdf["v"].to_numpy()))
            if len(mat) > hnsw_threshold:
                levels, graphs, entry, entry_level = _build_hnsw(
                    mat, m, max(ef, 48), seed=42
                )
                eps = _descend(mat, graphs, qn, entry, entry_level)
                best = _search_layer(mat, graphs[0], qn, eps, max(ef, k + 1))
                top = sorted(best, key=lambda x: (-x[0], x[1]))[: k + 1]
                idx = np.array([t[1] for t in top], dtype=np.int64)
                sims = np.array([t[0] for t in top], dtype=np.float64)
            else:
                nbrs = _build_graph(mat, m, seed=42)
                idx, sims = _beam_search(
                    mat, nbrs, qn, k + 1, ef, n_seeds, seed=7
                )
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[idx],
                    "cos_x1e6": np.round(sims * 1e6).astype(np.int64),
                }
            )

    out = src.mapInPandas(run, schema="vec_id long, cos_x1e6 long")
    return (
        out.filter(F.col("vec_id") != query_id)  # the query is not a hit
        .orderBy(F.col("cos_x1e6").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def graph_recall(
    emb: DataFrame,
    query_ids: list[int],
    k: int = 10,
    method: str = "nsw",
    **kw,
) -> float:
    """Mean recall@k of a graph path ('nsw' flat / 'hnsw' hierarchical
    / 'routed' IVF-routed hierarchical) vs brute force over the given
    queries — the HnswGraphSearcher-recall-test analog."""
    from lucene_spark.pipeline.similarity import cosine_topk

    fn = {
        "hnsw": ann_hnsw_topk,
        "routed": ann_routed_hnsw_topk,
    }.get(method, ann_graph_topk)
    total = 0.0
    for qid in query_ids:
        exact = {r["vec_id"] for r in cosine_topk(emb, qid, k).collect()}
        approx = {r["vec_id"] for r in fn(emb, qid, k, **kw).collect()}
        total += len(exact & approx) / float(k)
    return total / len(query_ids)


# ---------------------------------------------------------------------------
# true hierarchical HNSW (HnswGraphBuilder.java / HnswGraphSearcher.java)
# ---------------------------------------------------------------------------


def _select_diverse(
    cand: list[tuple[float, int]], mat: np.ndarray, m: int
) -> list[int]:
    """Lucene's neighbor-diversity heuristic (HnswGraphBuilder.java
    diversityCheck / findWorstNonDiverse): scanning candidates best
    first, keep c only if it is closer to the new node than to every
    neighbor already kept — spreads links across directions instead of
    clustering them, which is what makes greedy descent converge."""
    kept: list[int] = []
    for sim_q, c in sorted(cand, key=lambda x: -x[0]):
        if len(kept) >= m:
            break
        if all(float(mat[c] @ mat[s]) < sim_q for s in kept):
            kept.append(c)
    # backfill with the best skipped ones if diversity starved the list
    if len(kept) < m:
        seen = set(kept)
        for _sim_q, c in sorted(cand, key=lambda x: -x[0]):
            if c not in seen:
                kept.append(c)
                seen.add(c)
                if len(kept) >= m:
                    break
    return kept


def _search_layer(
    mat: np.ndarray,
    adj: list[list[int]],
    q: np.ndarray,
    eps: list[int],
    ef: int,
) -> list[tuple[float, int]]:
    """Beam search one layer (HnswGraphSearcher.searchLevel): expand the
    best unexpanded candidate while it can improve the ef-th best.
    -> up to ef (sim, node) pairs, unsorted heap order."""
    import heapq

    visited = set()
    cand: list[tuple[float, int]] = []  # max-heap (negated)
    best: list[tuple[float, int]] = []  # min-heap
    for s in eps:
        if s in visited:
            continue
        visited.add(s)
        sv = float(mat[s] @ q)
        heapq.heappush(cand, (-sv, s))
        heapq.heappush(best, (sv, s))
        if len(best) > ef:
            heapq.heappop(best)
    while cand:
        negsim, u = heapq.heappop(cand)
        if len(best) >= ef and -negsim < best[0][0]:
            break
        for v in adj[u]:
            if v in visited:
                continue
            visited.add(v)
            sv = float(mat[v] @ q)
            if len(best) < ef or sv > best[0][0]:
                heapq.heappush(cand, (-sv, v))
                heapq.heappush(best, (sv, v))
                if len(best) > ef:
                    heapq.heappop(best)
    return best


def _search_layer_filtered(
    mat: np.ndarray,
    adj: list[list[int]],
    q: np.ndarray,
    eps: list[int],
    ef: int,
    accept: np.ndarray,
    visit_limit: int,
) -> tuple[list[tuple[float, int]], int, bool]:
    """Filtered layer search (HnswGraphSearcher.searchLevel with
    acceptOrds + visitedLimit, core/search/AbstractKnnVectorQuery.java
    contract): the traversal walks ALL nodes (graph connectivity), only
    accepted nodes enter the result set, and every scored node counts
    against the visit budget. -> (results, visited, completed); callers
    fall back to an exact scan over the accepted rows when completed is
    False — by construction that scan costs no more than the budget
    already spent."""
    import heapq

    seen = set()
    cand: list[tuple[float, int]] = []
    best: list[tuple[float, int]] = []
    visited = 0
    for s in eps:
        if s in seen:
            continue
        seen.add(s)
        visited += 1
        sv = float(mat[s] @ q)
        heapq.heappush(cand, (-sv, s))
        if accept[s]:
            heapq.heappush(best, (sv, s))
            if len(best) > ef:
                heapq.heappop(best)
    while cand:
        if visited > visit_limit:
            return best, visited, False
        negsim, u = heapq.heappop(cand)
        if len(best) >= ef and -negsim < best[0][0]:
            break
        for v in adj[u]:
            if v in seen:
                continue
            seen.add(v)
            visited += 1
            sv = float(mat[v] @ q)
            if len(best) < ef or sv > best[0][0]:
                heapq.heappush(cand, (-sv, v))
                if accept[v]:
                    heapq.heappush(best, (sv, v))
                    if len(best) > ef:
                        heapq.heappop(best)
    return best, visited, True


def _exact_accepted(
    mat: np.ndarray, accept: np.ndarray, q: np.ndarray, k: int
) -> list[tuple[float, int]]:
    """Exact scan over the accepted rows (the reference's exactSearch
    fallback) — one vectorized matmul over the filtered slice."""
    ids = np.flatnonzero(accept)
    if len(ids) == 0:
        return []
    sims = mat[ids] @ q
    top = min(k, len(ids))
    sel = np.argpartition(-sims, top - 1)[:top]
    return [(float(sims[i]), int(ids[i])) for i in sel]


def _descend(mat, graphs, q, entry, entry_level, stop_level=0):
    """Greedy ef=1 upper-layer descent (HnswGraphSearcher: searchLevel
    with ef=1 from the entry point down to, exclusive, stop_level) —
    the shared prologue of every graph search and of each build
    insert. -> entry point list for the next layer down."""
    eps = [entry]
    for l in range(entry_level, stop_level, -1):
        eps = [max(
            _search_layer(mat, graphs[l], q, eps, 1),
            key=lambda x: x[0],
        )[1]]
    return eps


def _build_hnsw(
    mat: np.ndarray, m: int, ef_construction: int, seed: int
):
    """Incremental-insertion HNSW build (HnswGraphBuilder.addGraphNode):
    node levels ~ floor(-ln(U) / ln(M)); each insert greedy-descends
    from the entry point to its top level, then beam-searches each of
    its levels with efConstruction and links to M diverse neighbors
    (2M at layer 0, Lucene's maxConn0 = 2 * maxConn), pruning any
    over-full neighbor list with the same diversity heuristic.

    O(p * efConstruction * M * log p) — the scale fix over the flat
    NSW's O(p^2) all-pairs build. -> (levels, graphs) where graphs[l]
    is the layer-l adjacency list."""
    p = len(mat)
    rng = np.random.default_rng(seed)
    ml = 1.0 / np.log(m)
    levels = np.floor(-np.log(rng.random(p)) * ml).astype(np.int64)
    max_level = int(levels.max()) if p else 0
    graphs: list[list[list[int]]] = [
        [[] for _ in range(p)] for _ in range(max_level + 1)
    ]
    max_conn = [2 * m] + [m] * max_level  # layer 0 gets 2M links
    entry = 0
    entry_level = int(levels[0])
    for node in range(1, p):
        q = mat[node]
        lvl = int(levels[node])
        # greedy descent with ef=1 above the node's top level
        eps = _descend(mat, graphs, q, entry, entry_level, stop_level=lvl)
        # insert on each of the node's layers
        for l in range(min(entry_level, lvl), -1, -1):
            found = _search_layer(
                mat, graphs[l], q, eps, ef_construction
            )
            nbrs = _select_diverse(found, mat, m)
            for v in nbrs:
                graphs[l][node].append(v)
                graphs[l][v].append(node)
                if len(graphs[l][v]) > max_conn[l]:
                    # shrink with the same diversity rule, from v's view
                    cands = [
                        (float(mat[w] @ mat[v]), w) for w in graphs[l][v]
                    ]
                    graphs[l][v] = _select_diverse(
                        cands, mat, max_conn[l]
                    )
            eps = [n for _s, n in found]
        if lvl > entry_level:
            entry, entry_level = node, lvl
    return levels, graphs, entry, entry_level


def ann_hnsw_topk(
    emb: DataFrame,
    query_id: int = 0,
    k: int = 10,
    m: int = 8,
    ef: int = 48,
    ef_construction: int = 48,
    partitions: int | None = None,
    filter_expr: str | None = None,
) -> DataFrame:
    """Hierarchical HNSW ANN top-k by cosine — one graph per partition
    (the per-segment decomposition of Lucene99HnswVectorsFormat),
    greedy descent through the layers then an ef-beam at layer 0,
    global TakeOrdered merge. -> (vec_id, cos_x1e6).

    ``filter_expr`` (a SQL boolean over the embeddings columns) runs the
    reference's FILTERED kNN contract per partition
    (KnnFloatVectorQuery.java / AbstractKnnVectorQuery.java):
    pre-filter bitset -> if the partition's accepted count <= k, exact
    scan; else graph search that only collects accepted nodes with a
    visit budget equal to the accepted count; on budget exhaustion,
    exact scan over the accepted rows (which costs no more than the
    budget already spent)."""
    from lucene_spark.pipeline.similarity import _query_vec

    qv = np.asarray(_query_vec(emb, query_id), dtype=np.float64)
    qn = qv / (np.linalg.norm(qv) or 1.0)

    src = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        (
            F.expr(filter_expr) if filter_expr is not None else F.lit(True)
        ).alias("acc"),
    )
    if partitions:
        src = src.repartition(partitions, "vec_id")

    def run(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = _normalize(np.stack(pdf["v"].to_numpy()))
            accept = pdf["acc"].to_numpy().astype(bool)
            n_acc = int(accept.sum())
            if n_acc == 0:
                continue
            if n_acc <= k + 1:
                top = _exact_accepted(mat, accept, qn, k + 1)
            else:
                levels, graphs, entry, entry_level = _build_hnsw(
                    mat, m, ef_construction, seed=42
                )
                eps = _descend(mat, graphs, qn, entry, entry_level)
                best, _visited, completed = _search_layer_filtered(
                    mat, graphs[0], qn, eps, max(ef, k + 1), accept, n_acc
                )
                top = (
                    best if completed else _exact_accepted(mat, accept, qn, k + 1)
                )
            top = sorted(top, key=lambda x: (-x[0], x[1]))[: k + 1]
            idx = np.array([t[1] for t in top], dtype=np.int64)
            sims = np.array([t[0] for t in top], dtype=np.float64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[idx],
                    "cos_x1e6": np.round(sims * 1e6).astype(np.int64),
                }
            )

    out = src.mapInPandas(run, schema="vec_id long, cos_x1e6 long")
    return (
        out.filter(F.col("vec_id") != query_id)
        .orderBy(F.col("cos_x1e6").desc(), F.col("vec_id").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# Similarity-threshold search (core/search/AbstractVectorSimilarityQuery.java
# + VectorSimilarityCollector.java), patience-based early termination
# (core/search/PatienceKnnVectorQuery.java + HnswQueueSaturationCollector
# .java) and seeded entry points (core/search/SeededKnnVectorQuery.java).
# All similarities below are in LUCENE-NORMALIZED cosine units
# ((1 + cos) / 2, VectorSimilarityFunction.COSINE.compare) unless the
# name says cos.
# ---------------------------------------------------------------------------


def _lucene_sim(cos: float) -> float:
    return (1.0 + cos) / 2.0


def _search_layer_similarity(
    mat: np.ndarray,
    adj: list[list[int]],
    q: np.ndarray,
    eps: list[int],
    traversal_sim: float,
    result_sim: float,
    accept: np.ndarray | None = None,
    visit_limit: int | None = None,
) -> tuple[list[tuple[float, int]], int, bool]:
    """VectorSimilarityCollector traversal (VectorSimilarityCollector
    .java:55-66): the graph is walked while better-scoring candidates
    exist OR the best candidate is still above ``traversal_sim``
    (minCompetitiveSimilarity = min(traversalSimilarity,
    maxSimilarity)); EVERY visited node with similarity >=
    ``result_sim`` is collected — the result set is unbounded, unlike
    the ef-beam.  Similarities are lucene-normalized.  ``accept``
    restricts COLLECTION (never traversal) and ``visit_limit`` bounds
    scored nodes (AbstractVectorSimilarityQuery.java:46: with a filter,
    traverse at most the filter's cost then fall back to exact) —
    -> (results, visited, completed)."""
    import heapq

    seen: set[int] = set()
    cand: list[tuple[float, int]] = []  # max-heap (negated)
    results: list[tuple[float, int]] = []
    max_sim = float("-inf")
    visited = 0

    def _collect(node: int, sim: float) -> None:
        nonlocal max_sim
        max_sim = max(max_sim, sim)
        if sim >= result_sim and (accept is None or accept[node]):
            results.append((sim, node))

    for s in eps:
        if s in seen:
            continue
        seen.add(s)
        visited += 1
        sv = _lucene_sim(float(mat[s] @ q))
        heapq.heappush(cand, (-sv, s))
        _collect(s, sv)
    while cand:
        negsim, u = heapq.heappop(cand)
        if -negsim < min(traversal_sim, max_sim):
            break
        for v in adj[u]:
            if v in seen:
                continue
            seen.add(v)
            visited += 1
            if visit_limit is not None and visited > visit_limit:
                return results, visited, False
            sv = _lucene_sim(float(mat[v] @ q))
            # push only candidates still competitive (HnswGraphSearcher
            # searchLevel: friendSimilarity > minAcceptedSimilarity);
            # result_sim >= traversal_sim so no collectable node is lost
            if sv > min(traversal_sim, max_sim) or sv >= result_sim:
                heapq.heappush(cand, (-sv, v))
                _collect(v, sv)
    return results, visited, True


def vector_similarity_graph(
    emb: DataFrame,
    query_id: int = 0,
    traversal_similarity: float = 0.5,
    result_similarity: float = 0.7,
    m: int = 8,
    ef_construction: int = 48,
    partitions: int | None = None,
    filter_expr: str | None = None,
    hnsw_threshold: int = 1024,
) -> DataFrame:
    """FloatVectorSimilarityQuery approximate path
    (core/search/FloatVectorSimilarityQuery.java +
    AbstractVectorSimilarityQuery.java): ALL vectors whose
    lucene-normalized cosine ((1+cos)/2) reaches
    ``result_similarity``, found by per-partition graph traversal that
    keeps expanding while the frontier stays above
    ``traversal_similarity``.  Partitions at or below
    ``hnsw_threshold`` rows use the exact scan (the reference's
    exactSearch fallback does the same work).  With ``filter_expr``
    the visit budget is the filter's cardinality; exhausting it falls
    back to the exact filtered scan (AbstractVectorSimilarityQuery
    .java:44-47).  -> (vec_id, sim_x1e6), unordered set semantics.

    At 100 TB: one narrow mapInPandas per segment, no shuffle — the
    per-segment graphs are the Lucene99Hnsw per-leaf decomposition and
    the union of per-leaf result sets IS the query answer (no merge
    rank needed, the collector is threshold-based not top-k)."""
    if traversal_similarity > result_similarity:
        raise ValueError("traversalSimilarity should be <= resultSimilarity")
    from lucene_spark.pipeline.similarity import _query_vec

    qv = np.asarray(_query_vec(emb, query_id), dtype=np.float64)
    qn = qv / (np.linalg.norm(qv) or 1.0)
    src = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        (
            F.expr(filter_expr) if filter_expr is not None else F.lit(True)
        ).alias("acc"),
    )
    if partitions:
        src = src.repartition(partitions, "vec_id")
    rs, ts = float(result_similarity), float(traversal_similarity)

    def _exact_threshold(mat, accept, qn):
        ids = np.flatnonzero(accept)
        if len(ids) == 0:
            return []
        sims = (mat[ids] @ qn + 1.0) / 2.0
        keep = sims >= rs
        return [(float(s), int(i)) for s, i in zip(sims[keep], ids[keep])]

    def run(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = _normalize(np.stack(pdf["v"].to_numpy()))
            accept = pdf["acc"].to_numpy().astype(bool)
            n_acc = int(accept.sum())
            if n_acc == 0:
                continue
            filtered = n_acc < len(mat)
            if len(mat) <= hnsw_threshold:
                res = _exact_threshold(mat, accept, qn)
            else:
                levels, graphs, entry, entry_level = _build_hnsw(
                    mat, m, ef_construction, seed=42
                )
                eps = _descend(mat, graphs, qn, entry, entry_level)
                res, _vis, completed = _search_layer_similarity(
                    mat, graphs[0], qn, eps, ts, rs,
                    accept=accept if filtered else None,
                    visit_limit=n_acc if filtered else None,
                )
                if not completed:
                    res = _exact_threshold(mat, accept, qn)
            if not res:
                continue
            idx = np.array([t[1] for t in res], dtype=np.int64)
            sims = np.array([t[0] for t in res], dtype=np.float64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[idx],
                    "sim_x1e6": np.round(sims * 1e6).astype(np.int64),
                }
            )

    out = src.mapInPandas(run, schema="vec_id long, sim_x1e6 long")
    return out.filter(F.col("vec_id") != query_id).orderBy("vec_id")


def default_patience(k: int) -> int:
    """PatienceKnnVectorQuery.defaultPatience (PatienceKnnVectorQuery
    .java:175-177): max(7, k * 0.3)."""
    return max(7, int(k * 0.3))


def _search_layer_patience(
    mat: np.ndarray,
    adj: list[list[int]],
    q: np.ndarray,
    eps: list[int],
    ef: int,
    saturation_threshold: float = 0.995,
    patience: int | None = None,
    accept: np.ndarray | None = None,
    visit_limit: int | None = None,
) -> tuple[list[tuple[float, int]], int, bool]:
    """ef-beam with queue-saturation early exit
    (HnswQueueSaturationCollector.java:47-60 nextCandidate, called once
    per popped candidate exactly as HnswGraphSearcher does): per pop,
    queueSaturation = min(cur, prev)/cur over the result-queue size;
    ``patience`` consecutive saturated pops (>= ``saturation_threshold``)
    end the search with the queue as-is.  A patience exit reports
    completed=True — the reference marks its TopDocs EQUAL_TO precisely
    so the filtered path does NOT fall back to exact search
    (HnswQueueSaturationCollector.java:34-45).
    -> (results, visited, completed)."""
    import heapq

    if patience is None:
        patience = default_patience(ef)
    seen: set[int] = set()
    cand: list[tuple[float, int]] = []
    best: list[tuple[float, int]] = []
    visited = 0
    cur_q = 0
    prev_q = 0
    saturated = 0

    def _push(node: int, sv: float) -> None:
        nonlocal cur_q
        heapq.heappush(cand, (-sv, node))
        if accept is None or accept[node]:
            if len(best) < ef or sv > best[0][0]:
                heapq.heappush(best, (sv, node))
                cur_q += 1
                if len(best) > ef:
                    heapq.heappop(best)

    for s in eps:
        if s in seen:
            continue
        seen.add(s)
        visited += 1
        _push(s, float(mat[s] @ q))
    while cand:
        if visit_limit is not None and visited > visit_limit:
            return best, visited, False
        negsim, u = heapq.heappop(cand)
        if len(best) >= ef and -negsim < best[0][0]:
            break
        # nextCandidate(): saturation bookkeeping per popped candidate
        if cur_q > 0:
            if min(cur_q, prev_q) / cur_q >= saturation_threshold:
                saturated += 1
            else:
                saturated = 0
            prev_q = cur_q
            if saturated > patience:
                return best, visited, True
        for v in adj[u]:
            if v in seen:
                continue
            seen.add(v)
            visited += 1
            sv = float(mat[v] @ q)
            if len(best) < ef or sv > best[0][0]:
                _push(v, sv)
    return best, visited, True


def ann_patience_topk(
    emb: DataFrame,
    query_id: int = 0,
    k: int = 10,
    m: int = 8,
    ef: int = 48,
    ef_construction: int = 48,
    saturation_threshold: float = 0.995,
    patience: int | None = None,
    partitions: int | None = None,
    filter_expr: str | None = None,
) -> DataFrame:
    """PatienceKnnVectorQuery (PatienceKnnVectorQuery.java): the HNSW
    top-k search wrapped in the queue-saturation early-exit collector —
    identical results on saturated graphs, fewer visited nodes on
    corpora where the beam stops improving early.  Composes with the
    filtered-kNN contract the same way the reference's strategy rewrap
    does (HnswQueueSaturationCollector.getSearchStrategy).
    -> (vec_id, cos_x1e6) top-k."""
    from lucene_spark.pipeline.similarity import _query_vec

    if patience is None:
        patience = default_patience(k)
    qv = np.asarray(_query_vec(emb, query_id), dtype=np.float64)
    qn = qv / (np.linalg.norm(qv) or 1.0)
    src = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        (
            F.expr(filter_expr) if filter_expr is not None else F.lit(True)
        ).alias("acc"),
    )
    if partitions:
        src = src.repartition(partitions, "vec_id")

    def run(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = _normalize(np.stack(pdf["v"].to_numpy()))
            accept = pdf["acc"].to_numpy().astype(bool)
            n_acc = int(accept.sum())
            if n_acc == 0:
                continue
            filtered = n_acc < len(mat)
            if n_acc <= k + 1:
                top = _exact_accepted(mat, accept, qn, k + 1)
            else:
                levels, graphs, entry, entry_level = _build_hnsw(
                    mat, m, ef_construction, seed=42
                )
                eps = _descend(mat, graphs, qn, entry, entry_level)
                top, _vis, completed = _search_layer_patience(
                    mat, graphs[0], qn, eps, max(ef, k + 1),
                    saturation_threshold=saturation_threshold,
                    patience=patience,
                    accept=accept if filtered else None,
                    visit_limit=n_acc if filtered else None,
                )
                if not completed:
                    top = _exact_accepted(mat, accept, qn, k + 1)
            top = sorted(top, key=lambda x: (-x[0], x[1]))[: k + 1]
            idx = np.array([t[1] for t in top], dtype=np.int64)
            sims = np.array([t[0] for t in top], dtype=np.float64)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[idx],
                    "cos_x1e6": np.round(sims * 1e6).astype(np.int64),
                }
            )

    out = src.mapInPandas(run, schema="vec_id long, cos_x1e6 long")
    return (
        out.filter(F.col("vec_id") != query_id)
        .orderBy(F.col("cos_x1e6").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def ann_seeded_topk(
    emb: DataFrame,
    query_id: int = 0,
    k: int = 10,
    seed_expr: str | None = None,
    n_entry_points: int | None = None,
    m: int = 8,
    ef: int = 48,
    ef_construction: int = 48,
    partitions: int | None = None,
) -> DataFrame:
    """SeededKnnVectorQuery (core/search/SeededKnnVectorQuery.java +
    knn/KnnSearchStrategy.Seeded): the seed query's matching docs act
    as layer-0 entry points, REPLACING the hierarchy descent — when the
    seeds already sit near the answer (e.g. a cheap metadata filter or
    a previous query's results) the beam converges with fewer hops.
    ``seed_expr`` is a SQL boolean over the embeddings columns (the
    seed weight is AND-ed with FieldExists exactly as createSeedWeight
    builds it, SeededKnnVectorQuery.java:74-86); the first
    ``n_entry_points`` (default k) matching rows per partition seed the
    beam, doc order — the iteration order of a constant-score seed
    scorer.  Partitions with no seed match fall back to the default
    entry-point descent (the reference falls back to the delegate
    strategy).  -> (vec_id, cos_x1e6) top-k."""
    from lucene_spark.pipeline.similarity import _query_vec

    n_ep = n_entry_points if n_entry_points is not None else k
    qv = np.asarray(_query_vec(emb, query_id), dtype=np.float64)
    qn = qv / (np.linalg.norm(qv) or 1.0)
    src = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        (
            F.expr(seed_expr) if seed_expr is not None else F.lit(False)
        ).alias("seed"),
    )
    if partitions:
        src = src.repartition(partitions, "vec_id")

    def run(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            mat = _normalize(np.stack(pdf["v"].to_numpy()))
            if len(mat) <= k + 1:
                sims = mat @ qn
                idx = np.argsort(-sims, kind="stable")
            else:
                levels, graphs, entry, entry_level = _build_hnsw(
                    mat, m, ef_construction, seed=42
                )
                seeds = np.flatnonzero(
                    pdf["seed"].to_numpy().astype(bool)
                )[:n_ep]
                if len(seeds) > 0:
                    eps = [int(s) for s in seeds]
                else:
                    eps = _descend(mat, graphs, qn, entry, entry_level)
                best = _search_layer(mat, graphs[0], qn, eps, max(ef, k + 1))
                top = sorted(best, key=lambda x: (-x[0], x[1]))[: k + 1]
                idx = np.array([t[1] for t in top], dtype=np.int64)
                sims = np.array([t[0] for t in top], dtype=np.float64)
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["vec_id"].to_numpy()[idx],
                        "cos_x1e6": np.round(sims * 1e6).astype(np.int64),
                    }
                )
                continue
            top = idx[: k + 1]
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[top],
                    "cos_x1e6": np.round(sims[top] * 1e6).astype(np.int64),
                }
            )

    out = src.mapInPandas(run, schema="vec_id long, cos_x1e6 long")
    return (
        out.filter(F.col("vec_id") != query_id)
        .orderBy(F.col("cos_x1e6").desc(), F.col("vec_id").asc())
        .limit(k)
    )


def ann_routed_hnsw_topk(
    emb: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    ef: int = 48,
    ef_construction: int = 48,
    kmeans_iters: int = 0,
    filter_expr: str | None = None,
) -> DataFrame:
    """IVF-routed hierarchical-graph ANN — the cluster-scale answer to
    the documented per-partition-graphs-no-routing limitation of
    ``ann_hnsw_topk``: a coarse quantizer (seeded deterministic
    centroids, optionally Lloyd-refined — pipeline/similarity.py's IVF
    trainer) routes the query to its ``n_probe`` nearest inverted
    lists, the probed vectors are RANGE-placed by list so each graph
    partition holds whole lists (~1 list each; co-located small lists
    just merge into one still-valid graph), and only those lists run
    the layered beam search. The driver merges the list-local top-k
    rows.

    Read cost ~ n_probe/n_centroids of the corpus (the IVF S-curve)
    TIMES the sublinear beam inside each list — at 100 TB the router
    prunes partitions before any graph work starts, where
    ann_hnsw_topk must beam-search EVERY partition. Reference roles:
    Lucene99HnswVectorsFormat per-segment graphs + the coarse-
    quantizer routing of the IVF literature (the reference's own
    quantized formats pair HNSW with scalar/binary quantization; the
    router here plays the segment-pruning role the BKD/manifest bounds
    play for points).

    -> (vec_id, cos_x1e6), (cos DESC, vec_id ASC), query row excluded.
    """
    from lucene_spark.pipeline.similarity import (
        _query_vec,
        cosine_lit_col,
        ivf_assign,
        ivf_centroids,
        ivf_train_kmeans,
    )

    qv = _query_vec(emb, query_id)
    dims = len(qv)
    cents = (
        ivf_train_kmeans(emb, n_centroids, kmeans_iters, dims=dims)
        if kmeans_iters > 0
        else ivf_centroids(emb, n_centroids)
    )
    assign = ivf_assign(emb, cents, dims)
    probe = (
        cents.select(
            "cid",
            cosine_lit_col("CAST(cvec AS ARRAY<DOUBLE>)", qv).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("cid").asc())
        .limit(n_probe)
        .select("cid")
    )
    routed = (
        emb.join(assign, "vec_id")
        .join(F.broadcast(probe), "cid")
        .filter(F.col("vec_id") != query_id)
    )
    # RANGE-place the probed lists so each partition holds whole
    # lists (hash placement of n_probe keys into n_probe partitions
    # collides for most key sets — most runs would merge lists into
    # one graph and leave partitions empty); with n_probe distinct
    # cids and n_probe ranges the placement is ~1 list per partition,
    # and if range sampling ever co-locates two small lists the only
    # effect is one merged (still valid) graph — recall unaffected.
    # The query row rides along so the downstream search can read its
    # vector, and is excluded from the result by ann_hnsw_topk itself.
    routed = (
        routed.repartitionByRange(n_probe, "cid")
        .drop("cid")
        .unionByName(emb.filter(F.col("vec_id") == query_id))
    )
    return ann_hnsw_topk(
        routed,
        query_id=query_id,
        k=k,
        m=m,
        ef=ef,
        ef_construction=ef_construction,
        partitions=None,  # keep the by-list placement
        filter_expr=filter_expr,
    )


# ---------------------------------------------------------------------------
# Persisted per-segment HNSW index — the Lucene99HnswVectorsFormat role
# (core/codecs/lucene99/Lucene99HnswVectorsFormat.java: graphs are
# built at FLUSH time and stored beside the vectors in .vex/.vec files;
# queries only ever READ them). The fused ann_hnsw_topk above rebuilds
# per call because the gate corpus is tiny; this pair is the 100-TB
# shape: build once per partition-segment, then every query is a pure
# read + beam.
# ---------------------------------------------------------------------------

_HNSW_ROW_SCHEMA = (
    "pid int, row_type int, layer int, local_id int, vec_id long, "
    "v array<double>, nbrs array<int>, entry int, entry_level int"
)


def hnsw_index_write(
    emb: DataFrame,
    index_dir: str,
    m: int = 8,
    ef_construction: int = 48,
    partitions: int | None = None,
    cluster_by: int | None = None,
) -> None:
    """Build one hierarchical graph per partition and persist it:
    row_type 0 = vector rows (local_id, vec_id, unit-normalized v),
    row_type 1 = adjacency rows (layer, local_id, nbrs),
    row_type 2 = one meta row per partition (entry, entry_level),
    row_type 3 = the partition's mean unit vector (the routing
    centroid hnsw_index_topk's ``n_probe`` uses).
    One mapInPandas pass, one parquet write — the flush-time graph
    build of the reference's HNSW codec.

    ``cluster_by=N``: coarse-quantize the vectors into N IVF lists and
    RANGE-place each list into its own partition-segment, so the
    stored centroids are tight and query-time routing (``n_probe``)
    prunes partitions effectively. Without it (hash placement) every
    partition is a random mixture, the centroids are all near the
    global mean, and routing would only hurt recall — query with
    n_probe=None in that case."""
    import json as _json
    import os as _os

    from pyspark import TaskContext

    if cluster_by and partitions:
        raise ValueError(
            "pass either cluster_by (IVF-list placement) or partitions "
            "(hash placement), not both"
        )
    src = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    if cluster_by:
        from lucene_spark.pipeline.similarity import (
            ivf_assign,
            ivf_centroids,
        )

        dims = len(emb.select("embedding").head()["embedding"])
        assign = ivf_assign(emb, ivf_centroids(emb, cluster_by), dims)
        src = (
            src.join(assign, "vec_id")
            .repartitionByRange(cluster_by, "cid")
            .drop("cid")
        )
    elif partitions:
        src = src.repartition(partitions, "vec_id")

    def build(it):
        pid = TaskContext.get().partitionId()
        # mapInPandas iterates ARROW BATCHES (default 10k rows), not
        # whole partitions: buffer them all so one partition builds
        # exactly ONE graph — per-batch graphs would collide on
        # (pid, local_id) and silently corrupt the stored index
        bufs = [b for b in it if len(b)]
        if bufs:
            pdf = pd.concat(bufs, ignore_index=True)
            mat = _normalize(np.stack(pdf["v"].to_numpy()))
            vec_ids = pdf["vec_id"].to_numpy()
            p = len(mat)
            levels, graphs, entry, entry_level = _build_hnsw(
                mat, m, ef_construction, seed=42
            )
            rows = {
                "pid": [], "row_type": [], "layer": [], "local_id": [],
                "vec_id": [], "v": [], "nbrs": [],
                "entry": [], "entry_level": [],
            }

            def emit(rt, layer=-1, lid=-1, vid=-1, v=None, nbrs=None,
                     e=-1, el=-1):
                rows["pid"].append(pid)
                rows["row_type"].append(rt)
                rows["layer"].append(layer)
                rows["local_id"].append(lid)
                rows["vec_id"].append(int(vid))
                rows["v"].append(v)
                rows["nbrs"].append(nbrs)
                rows["entry"].append(e)
                rows["entry_level"].append(el)

            for i in range(p):
                emit(0, lid=i, vid=vec_ids[i], v=list(map(float, mat[i])))
            for layer, adj in enumerate(graphs):
                for i in range(p):
                    if adj[i] or int(levels[i]) >= layer:
                        emit(1, layer=layer, lid=i,
                             nbrs=[int(x) for x in adj[i]])
            emit(2, e=int(entry), el=int(entry_level))
            cen = mat.mean(axis=0)
            cen = cen / (np.linalg.norm(cen) or 1.0)
            emit(3, v=list(map(float, cen)))
            yield pd.DataFrame(rows)

    (
        src.mapInPandas(build, schema=_HNSW_ROW_SCHEMA)
        .write.mode("overwrite").partitionBy("pid")
        .parquet(f"{index_dir}/graph")
    )
    # the routing centroids ALSO land in their own tiny parquet so the
    # n_probe read never scans the vector rows (row-group stats cannot
    # prune row_type inside the big files)
    g = emb.sparkSession.read.parquet(f"{index_dir}/graph")
    g.filter(F.col("row_type") == 3).select("pid", "v").write.mode(
        "overwrite"
    ).parquet(f"{index_dir}/centroids")
    _os.makedirs(index_dir, exist_ok=True)
    with open(f"{index_dir}/_hnsw_meta.json", "w") as f:
        _json.dump({
            "m": m, "ef_construction": ef_construction,
            "clustered": bool(cluster_by),
        }, f)


def hnsw_index_topk(
    spark,
    index_dir: str,
    qv: list[float],
    k: int = 10,
    ef: int = 48,
    exclude_vec_id: int | None = None,
    n_probe: int | None = None,
) -> DataFrame:
    """Query the persisted graphs: per partition, reconstruct the
    adjacency from the stored rows (NO graph build — the read path of
    the HNSW codec), greedy-descend the layers, ef-beam layer 0, and
    TakeOrdered-merge the partition-local top-k.

    ``n_probe``: route via the STORED per-partition centroids — one
    tiny centroid read picks the n_probe nearest partition-segments
    and the main scan filters on ``pid``, which the parquet layout
    (partitionBy pid) turns into PHYSICAL partition pruning: only the
    probed segments' files are read. Meaningful when the index was
    written with ``cluster_by`` (tight lists); see hnsw_index_write.
    -> (vec_id, cos_x1e6), (cos DESC, vec_id ASC)."""
    import json as _json

    with open(f"{index_dir}/_hnsw_meta.json") as f:
        _json.load(f)  # fail fast on a missing/partial index dir
    qn = np.asarray(qv, dtype=np.float64)
    qn = qn / (np.linalg.norm(qn) or 1.0)
    rows = spark.read.parquet(f"{index_dir}/graph")
    if n_probe is not None:
        cents = spark.read.parquet(f"{index_dir}/centroids").collect()
        ranked = sorted(
            (
                (float(np.dot(qn, np.asarray(r["v"]))), int(r["pid"]))
                for r in cents
            ),
            key=lambda x: (-x[0], x[1]),
        )
        probed = [pid for _s, pid in ranked[:n_probe]]
        rows = rows.filter(F.col("pid").isin(probed))

    def search(key, pdf):
        vec = pdf[pdf.row_type == 0].sort_values("local_id")
        if len(vec) == 0:
            return pd.DataFrame({"vec_id": [], "cos_x1e6": []})
        mat = np.stack(vec["v"].to_numpy())
        vec_ids = vec["vec_id"].to_numpy()
        meta = pdf[pdf.row_type == 2].iloc[0]
        entry, entry_level = int(meta["entry"]), int(meta["entry_level"])
        p = len(mat)
        graphs: list[list[list[int]]] = [
            [[] for _ in range(p)] for _ in range(entry_level + 1)
        ]
        adj = pdf[pdf.row_type == 1]
        for layer, lid, nbrs in zip(
            adj["layer"].to_numpy(), adj["local_id"].to_numpy(),
            adj["nbrs"].to_numpy(),
        ):
            if layer <= entry_level:
                graphs[layer][lid] = [int(x) for x in nbrs]
        eps = _descend(mat, graphs, qn, entry, entry_level)
        best = _search_layer(mat, graphs[0], qn, eps, max(ef, k + 1))
        top = sorted(best, key=lambda x: (-x[0], x[1]))[: k + 1]
        return pd.DataFrame({
            "vec_id": [int(vec_ids[i]) for _s, i in top],
            "cos_x1e6": [int(round(s * 1e6)) for s, _i in top],
        })

    out = rows.groupBy("pid").applyInPandas(
        search, schema="vec_id long, cos_x1e6 long"
    )
    if exclude_vec_id is not None:
        out = out.filter(F.col("vec_id") != exclude_vec_id)
    return (
        out.orderBy(F.col("cos_x1e6").desc(), F.col("vec_id").asc())
        .limit(k)
    )
