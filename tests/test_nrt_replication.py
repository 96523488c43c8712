"""NRT segment replication — lucene_spark/index/nrtreplication.py
(replicator/nrt PrimaryNode / ReplicaNode / CopyState /
PreCopyMergedSegmentWarmer semantics)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def primary(spark, corpus, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.index.nrtreplication import PrimaryNode

    src = str(tmp_path / "primary")
    build_index(
        spark, spark.createDataFrame(corpus[:200]), src,
        IndexConfig(docs_per_segment=50),
    )
    return PrimaryNode(src)


def _search_ids(spark, d, term="def", k=500):
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexReader, IndexSearcher

    return {
        h.doc_id
        for h in IndexSearcher(IndexReader(spark, d)).search(
            Q.TermQuery("content", term), k=k
        ).hits
    }


def test_replica_follows_generations(spark, corpus, primary, tmp_path):
    from lucene_spark.index.builder import IndexConfig
    from lucene_spark.index.nrtreplication import ReplicaNode
    from lucene_spark.streaming.nrt import append_batch

    rep = ReplicaNode(str(tmp_path / "replica"))
    assert rep.searcher_version() == -1  # nothing to search yet

    st1 = primary.copy_state()
    out = rep.sync(st1)
    assert out["generation"] == st1.generation
    assert rep.searcher_version() == st1.generation
    assert _search_ids(spark, rep.index_dir) == _search_ids(
        spark, primary.index_dir
    )

    # the primary advances (NRT append); the replica keeps serving its
    # version until the next sync, then converges
    append_batch(
        spark, spark.createDataFrame(corpus[200:400]), primary.index_dir,
        IndexConfig(docs_per_segment=50),
    )
    assert primary.current_generation() > st1.generation
    assert rep.searcher_version() == st1.generation  # not yet synced
    before = _search_ids(spark, rep.index_dir)
    st2 = primary.copy_state()
    out2 = rep.sync(st2)
    assert rep.searcher_version() == st2.generation
    after = _search_ids(spark, rep.index_dir)
    assert after == _search_ids(spark, primary.index_dir)
    assert before < after  # strictly more docs visible
    # incremental: the second sync only moved the new batch
    assert out2["files_skipped"] > 0


def test_interrupted_copy_keeps_old_version_readable(spark, primary, corpus, tmp_path):
    from lucene_spark.index.builder import IndexConfig
    from lucene_spark.index.nrtreplication import ReplicaNode
    from lucene_spark.streaming.nrt import append_batch

    rep = ReplicaNode(str(tmp_path / "replica"))
    st1 = primary.copy_state()
    rep.sync(st1)
    old = _search_ids(spark, rep.index_dir)

    append_batch(
        spark, spark.createDataFrame(corpus[200:300]), primary.index_dir,
        IndexConfig(docs_per_segment=50),
    )
    st2 = primary.copy_state()
    # simulate a crash mid-copy: fetch files but never publish
    rep.precopy(st2)
    assert rep.searcher_version() == st1.generation
    assert _search_ids(spark, rep.index_dir) == old  # still old version

    # resume: every byte is already local, the flip is metadata-only
    out = rep.sync(st2)
    assert out["files_copied"] == 0
    assert rep.searcher_version() == st2.generation


def test_precopy_merge_warming(spark, primary, tmp_path):
    """PreCopyMergedSegmentWarmer: ship the merge output before the
    merged generation is synced; the flip then copies nothing."""
    from lucene_spark.index.merge import force_merge
    from lucene_spark.index.nrtreplication import ReplicaNode

    rep = ReplicaNode(str(tmp_path / "replica"))
    rep.sync(primary.copy_state())
    force_merge(spark, primary.index_dir, max_segments=1)
    st = primary.copy_state()
    rep.precopy(st)
    out = rep.sync(st)
    assert out["files_copied"] == 0  # warmed: instant version flip
    assert _search_ids(spark, rep.index_dir) == _search_ids(
        spark, primary.index_dir
    )
