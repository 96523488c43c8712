"""Collector / CollectorManager surface — the reference's pluggable
result-aggregation protocol (core/search/CollectorManager.java,
TopScoreDocCollectorManager.java, TopFieldCollectorManager.java,
TotalHitCountCollectorManager.java, MultiCollectorManager.java,
CachingCollector.java, PositiveScoresOnlyCollector.java) mapped onto
Spark's native aggregation model.

The Lucene contract is newCollector()-per-leaf-slice followed by
reduce(collectors) — structurally identical to Spark's map-side
partial aggregation + final merge, so a CollectorManager here is an
object that declares WHAT to aggregate and lets Catalyst plan the
per-partition/merge split. ``IndexSearcher.search(query, manager)``'s
analog is ``manager.collect(searcher, query)``.

A custom manager is any object with ``collect(searcher, query)`` —
the UDAF extension point (SURVEY §2.10)."""

from __future__ import annotations

from dataclasses import dataclass, field

from lucene_spark.search import query as Q


@dataclass
class TopScoreDocCollectorManager:
    """Relevance top-k (TopScoreDocCollectorManager.java) — the
    default collector IndexSearcher.search(q, k) builds internally;
    per-segment heaps + TopDocs.merge."""

    k: int = 10

    def collect(self, searcher, query) -> Q.TopDocs:
        return searcher.search(query, k=self.k)


@dataclass
class TopFieldCollectorManager:
    """Sort-by-docvalues top-k (TopFieldCollectorManager.java /
    SortField). Plans as TakeOrderedAndProject; on a sort_by index the
    segment plan early-terminates (canEarlyTerminate). Returns
    [(doc_id, sort_val)]."""

    sort_col: str
    ascending: bool = False
    k: int = 10
    prune_stats: dict | None = None

    def collect(self, searcher, query):
        from lucene_spark.search import sqlpath as sp

        if not isinstance(query, Q.TermQuery):
            raise TypeError("TopFieldCollectorManager collects TermQuery hits")
        return [
            (r["doc_id"], r["sort_val"])
            for r in sp.field_sort_topk(
                searcher.reader, query.field, query.term, self.sort_col,
                ascending=self.ascending, k=self.k,
                prune_stats=self.prune_stats,
            ).collect()
        ]


@dataclass
class TotalHitCountCollectorManager:
    """Pure hit count (TotalHitCountCollectorManager.java). For a
    TermQuery on a delete-free index the count is answered from the
    term dictionary without touching postings — the Weight#count
    shortcut (Weight.java:198, TermQuery.java:260); ``shortcut`` on
    the result reports whether it applied."""

    def collect(self, searcher, query) -> "TotalHits":
        from lucene_spark.search import sqlpath as sp

        r = searcher.reader
        if isinstance(query, Q.TermQuery):
            cnt = sp.term_count(r, query.field, query.term).collect()[0]["cnt"]
            return TotalHits(
                int(cnt), shortcut=not r.manifest.get("delete_batches")
            )
        top = searcher.search(query, k=1, prune=False)
        return TotalHits(int(top.total_hits), shortcut=False)


@dataclass(frozen=True)
class TotalHits:
    value: int
    shortcut: bool = False


@dataclass
class MultiCollectorManager:
    """Fan one query out to several managers (MultiCollectorManager
    .java); returns their results in order. The reference shares one
    doc stream across collectors inside a leaf; here each manager
    declares its own aggregation and Catalyst/AQE reuses the shuffle
    where plans coincide."""

    managers: tuple = ()

    def collect(self, searcher, query):
        return [m.collect(searcher, query) for m in self.managers]


@dataclass
class PositiveScoresOnlyCollectorManager:
    """PositiveScoresOnlyCollector.java: drop hits with score <= 0
    (relevant for function-score / payload compositions that can go
    non-positive)."""

    inner: TopScoreDocCollectorManager = field(
        default_factory=TopScoreDocCollectorManager
    )

    def collect(self, searcher, query) -> Q.TopDocs:
        top = self.inner.collect(searcher, query)
        hits = [h for h in top.hits if h.score > 0]
        return Q.TopDocs(total_hits=top.total_hits, hits=hits)


class CachingCollectorManager:
    """CachingCollector.java: collect once, replay to later consumers.
    The cache is the first collection's TopDocs (we cache merged
    results, not per-leaf doc streams — Spark's unit of reuse is the
    query result, and the scorer state is deterministic)."""

    def __init__(self, inner: TopScoreDocCollectorManager):
        self.inner = inner
        self._cached: dict = {}

    def collect(self, searcher, query) -> Q.TopDocs:
        key = (id(searcher.reader), repr(query))
        if key not in self._cached:
            self._cached[key] = self.inner.collect(searcher, query)
        return self._cached[key]

    def replay(self, searcher, query) -> Q.TopDocs:
        key = (id(searcher.reader), repr(query))
        if key not in self._cached:
            raise ValueError("nothing cached for this (reader, query)")
        return self._cached[key]
