"""LRUQueryCache analog (lucene_spark/search/querycache.py): usage-
tracking admission, LRU eviction, hit reuse, and commit-boundary
invalidation (core/search/LRUQueryCache.java +
UsageTrackingQueryCachingPolicy.java semantics)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.search.querycache import LRUQueryCache, cached_filter_docset


@pytest.fixture()
def idx(spark, corpus, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    p = str(tmp_path / "qcidx")
    build_index(
        spark,
        spark.createDataFrame(corpus),
        p,
        IndexConfig(docs_per_segment=200, num_batches=1),
    )
    return IndexReader(spark, p)


def test_admission_policy_and_hits(spark, idx):
    c = LRUQueryCache(max_entries=4, min_uses=2)
    builds = []

    def build():
        builds.append(1)
        return idx.postings().sparkSession.createDataFrame(
            [(1,), (2,)], "doc_id long"
        )

    # 1st use: policy says too cold — builder runs, nothing persisted
    c.docset(idx, "k", build)
    assert len(builds) == 1 and len(c._entries) == 0
    # 2nd use: admitted, persisted
    d2 = c.docset(idx, "k", build)
    assert len(builds) == 2 and len(c._entries) == 1
    assert d2.storageLevel.useMemory or d2.storageLevel.useDisk
    # 3rd use: pure hit, no rebuild
    d3 = c.docset(idx, "k", build)
    assert len(builds) == 2 and d3 is d2
    assert c.hits == 1 and c.misses == 2


def test_cached_docset_matches_fresh(spark, idx):
    from lucene_spark.search import sqlpath as sp

    c = LRUQueryCache(min_uses=1)
    got = set(
        cached_filter_docset(idx, "content", ["return"], cache=c)
        .toPandas()["doc_id"]
    )
    want = set(
        sp.exploded_postings(idx, "content", ["return"])
        .select("doc_id")
        .distinct()
        .toPandas()["doc_id"]
    )
    assert got == want and len(got) > 0
    # second call is a hit and identical
    again = set(
        cached_filter_docset(idx, "content", ["return"], cache=c)
        .toPandas()["doc_id"]
    )
    assert again == want and c.hits == 1


def test_lru_eviction_unpersists(spark, idx):
    c = LRUQueryCache(max_entries=2, min_uses=1)
    mk = lambda n: (lambda: idx.spark.createDataFrame([(n,)], "doc_id long"))
    d1 = c.docset(idx, "a", mk(1))
    d2 = c.docset(idx, "b", mk(2))
    c.docset(idx, "c", mk(3))  # evicts "a"
    assert len(c._entries) == 2
    assert d1.storageLevel.useMemory is False  # unpersisted
    assert d2.storageLevel.useMemory or d2.storageLevel.useDisk


def test_commit_boundary_invalidates(spark, idx):
    """Deleting docs commits a new manifest generation; the cache key
    changes, so the stale doc set is never served (the reference drops
    bitsets when the reader core changes)."""
    from lucene_spark.index.deletes import delete_by_ids
    from lucene_spark.search.executor import IndexReader

    c = LRUQueryCache(min_uses=1)
    before = set(
        cached_filter_docset(idx, "content", ["return"], cache=c)
        .toPandas()["doc_id"]
    )
    victims = sorted(before)[:3]
    delete_by_ids(
        spark, idx.index_dir, spark.createDataFrame([(v,) for v in victims], "doc_id long")
    )
    fresh_reader = IndexReader(spark, idx.index_dir)
    assert fresh_reader.manifest["generation"] > idx.manifest["generation"]
    after = set(
        cached_filter_docset(fresh_reader, "content", ["return"], cache=c)
        .toPandas()["doc_id"]
    )
    assert after == before - set(victims)
    # both generations live under different keys
    assert c.misses >= 2
