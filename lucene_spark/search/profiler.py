"""Query profiler — the sandbox profiler surface
(sandbox/search/QueryProfilerIndexSearcher.java, QueryProfilerBreakdown,
QueryProfilerTree, ProfilerCollector/ProfilerCollectorResult).

The reference wraps every Weight/Scorer in timers and reports a tree of
per-node timing breakdowns plus the collector's reduce time. The Spark
engine's analog phase map:

- ``rewrite``          -> Query.rewrite fixpoint (driver, pure Python)
- ``create_weight``    -> ``_compile`` per query node (driver: stats
  lookups + scorer construction); recorded PER NODE with self/total
  split, the QueryProfilerBreakdown shape
- ``execute_reduce``   -> the one distributed job (per-segment scoring
  kernel) plus the driver-side TopDocs.merge. Scoring is a single
  vectorized kernel, so per-node NEXT_DOC/SCORE timers do not exist —
  that per-row accounting is exactly what the vectorized design removes;
  instead each leaf reports its ``cost`` (summed doc_freq, the
  Scorer.cost() estimator the reference prints).

``QueryProfilerIndexSearcher`` is a drop-in IndexSearcher: results are
identical, ``last_profile`` carries the tree after every search.
"""

from __future__ import annotations

from time import perf_counter

from lucene_spark.search import query as Q
from lucene_spark.search.executor import IndexSearcher


class QueryProfilerIndexSearcher(IndexSearcher):
    """IndexSearcher that records a per-node profile of every search
    (QueryProfilerIndexSearcher.java: 'An extension of IndexSearcher
    that records timing information about the query execution')."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.last_profile: dict | None = None
        self._stack: list | None = None
        self._root: dict | None = None

    # ---- per-node create_weight timing (QueryProfilerWeight role) ----

    def _compile(self, q: Q.Query, boost: float = 1.0):
        if self._stack is None:  # not inside a profiled search
            return super()._compile(q, boost)
        entry = {
            "type": type(q).__name__,
            "children": [],
            "breakdown": {},
        }
        parent = self._stack[-1] if self._stack else None
        self._stack.append(entry)
        t0 = perf_counter()
        node = super()._compile(q, boost)
        dt_ms = (perf_counter() - t0) * 1e3
        self._stack.pop()
        child_total = sum(
            c["breakdown"]["create_weight_total_ms"] for c in entry["children"]
        )
        entry["breakdown"]["create_weight_total_ms"] = dt_ms
        entry["breakdown"]["create_weight_self_ms"] = max(0.0, dt_ms - child_total)
        entry["matched"] = node is not None
        if node is not None and isinstance(node, dict):
            field = node.get("field")
            terms = node.get("terms")
            if field and terms:
                st = self.reader.term_stats(field, list(terms))
                entry["cost"] = int(sum(s.doc_freq for s in st.values()))
        if parent is not None:
            parent["children"].append(entry)
        else:
            self._root = entry
        return node

    # ---- profiled search (ProfilerCollectorManager.reduce role) ----

    def search(self, q, k: int = 10, prune: bool = True,
               search_after=None) -> Q.TopDocs:
        if self._stack is not None:  # re-entrant compile path
            return super().search(q, k, prune, search_after)
        t_r0 = perf_counter()
        q = Q.rewrite_fixpoint(q)  # idempotent; super() re-runs it for free
        rewrite_ms = (perf_counter() - t_r0) * 1e3
        self._stack = []
        self._root = None
        t0 = perf_counter()
        try:
            td = super().search(q, k, prune, search_after)
        finally:
            total_ms = (perf_counter() - t0) * 1e3
            cw_ms = (
                self._root["breakdown"]["create_weight_total_ms"]
                if self._root else 0.0
            )
            self.last_profile = {
                "query": type(q).__name__,
                "rewrite_ms": rewrite_ms,
                "create_weight_ms": cw_ms,
                "execute_reduce_ms": max(0.0, total_ms - cw_ms),
                "total_ms": total_ms,
                "tree": self._root,
            }
            self._stack = None
        self.last_profile["total_hits"] = td.total_hits
        return td
