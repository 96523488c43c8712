"""Query cache — the LRUQueryCache analog.

Reference parity: core/search/LRUQueryCache.java +
UsageTrackingQueryCachingPolicy.java + CachingWrapperQuery.java. The
reference memoizes per-segment bitsets for FILTER-role queries, keyed
by (query, reader core key), admits a query only after its usage count
crosses a policy threshold, evicts LRU, and drops everything when the
reader changes.

Spark translation: the cached unit is the DISTRIBUTED doc-id set
DataFrame of a filter clause, `persist()`-ed (memory-then-disk on the
executors — the cluster-wide analog of the reference's heap bitsets)
and keyed by (index path, manifest GENERATION, query key). A new
commit bumps the generation, so stale entries can never be served
across a commit boundary (the reference's reader-close invalidation);
they age out of the LRU. The second execution of a cached filter scans
the in-memory columnar blocks instead of re-decoding postings — the
micro-bench in bench.py measures exactly that.

Usage-tracking admission: a filter is only materialized after
``min_uses`` sightings (the reference caches cheap filters on their
2nd use); until then the builder's plan runs uncached, so one-shot
filters never pay the materialization.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Callable

from pyspark.sql import DataFrame


class LRUQueryCache:
    """LRU of persisted filter doc-set DataFrames."""

    def __init__(self, max_entries: int = 32, min_uses: int = 2):
        self.max_entries = max_entries
        self.min_uses = min_uses
        self._entries: "OrderedDict[tuple, DataFrame]" = OrderedDict()
        self._uses: dict[tuple, int] = {}
        self.hits = 0
        self.misses = 0

    def _reader_key(self, reader) -> tuple:
        return (reader.index_dir, reader.manifest.get("generation"))

    def docset(
        self, reader, query_key: str, build: Callable[[], DataFrame]
    ) -> DataFrame:
        """Return the (possibly cached) doc-id set for a filter clause.
        ``build`` must produce a DataFrame with a ``doc_id`` column —
        it is only invoked on a miss."""
        key = self._reader_key(reader) + (query_key,)
        hit = self._entries.get(key)
        if hit is not None:
            self._entries.move_to_end(key)
            self.hits += 1
            return hit
        self.misses += 1
        self._uses[key] = self._uses.get(key, 0) + 1
        if self._uses[key] < self.min_uses:
            return build()  # policy: not hot enough to cache yet
        df = build().persist()
        df.count()  # materialize now, like the reference's eager bitset build
        self._entries[key] = df
        while len(self._entries) > self.max_entries:
            _old_key, old_df = self._entries.popitem(last=False)
            old_df.unpersist()
        return df

    def invalidate_all(self) -> None:
        for df in self._entries.values():
            df.unpersist()
        self._entries.clear()
        self._uses.clear()


#: process-wide default, the IndexSearcher.getDefaultQueryCache analog
DEFAULT_QUERY_CACHE = LRUQueryCache()


def cached_filter_docset(
    reader,
    field: str,
    terms: list[str],
    cache: LRUQueryCache | None = None,
) -> DataFrame:
    """FILTER-clause doc set (BooleanClause.Occur.FILTER — match, no
    score) through the cache: distinct live doc_ids holding any of
    ``terms``."""
    from lucene_spark.search import sqlpath as sp

    c = cache if cache is not None else DEFAULT_QUERY_CACHE
    key = f"terms:{field}:{','.join(sorted(set(terms)))}"
    return c.docset(
        reader,
        key,
        lambda: sp.exploded_postings(reader, field, sorted(set(terms)))
        .select("doc_id")
        .distinct(),
    )
