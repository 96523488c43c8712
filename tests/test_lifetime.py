"""SearcherLifetimeManager — lucene_spark/search/lifetime.py.

Reference semantics (core/search/SearcherLifetimeManager.java):
record -> token, acquire(token) returns the SAME point-in-time
searcher across later commits (paging consistency), prune(PruneByAge)
drops aged commit points but always keeps the newest, release unpins
against GC."""

import pytest

from lucene_spark.index import lifecycle as lc
from lucene_spark.index.builder import IndexConfig
from lucene_spark.search import sqlpath as sp
from lucene_spark.search.executor import IndexReader
from lucene_spark.search.lifetime import SearcherLifetimeManager


def _build(spark, corpus, path):
    from lucene_spark.index.builder import build_index

    cfg = IndexConfig(docs_per_segment=60, num_batches=2)
    build_index(spark, spark.createDataFrame(corpus), str(path), cfg)
    return IndexReader(spark, str(path))


def _append(spark, corpus, path, start_id):
    from lucene_spark.streaming.nrt import append_batch

    pdf = corpus.head(30).copy()
    pdf["path"] = [f"appended/f{i}.py" for i in range(len(pdf))]
    return append_batch(
        spark, spark.createDataFrame(pdf), str(path),
        IndexConfig(docs_per_segment=60, num_batches=1),
    )


def _hits(reader, must):
    return [
        (r["doc_id"], r["score_x1e6"])
        for r in sp.bool_bm25_topk(reader, "content", must=must, k=50).collect()
    ]


def test_acquire_replays_recorded_commit_point(spark, corpus, tmp_path):
    idx = tmp_path / "idx"
    r0 = _build(spark, corpus, idx)
    mgr = SearcherLifetimeManager(spark, str(idx))
    tok = mgr.record(r0)
    page1 = _hits(r0, ["def"])

    n_before = int(r0.manifest["num_docs_total"])
    _append(spark, corpus, idx, start_id=10_000)
    # a fresh reader sees the appended docs; the pinned one must not —
    # doc VISIBILITY is point-in-time; corpus-level BM25 stats are
    # unversioned and may shift scores (documented divergence), so the
    # replay assertion is on the matched doc ids
    fresh = IndexReader(spark, str(idx))
    assert fresh.manifest["generation"] > tok
    pinned = mgr.acquire(tok)
    assert pinned is not None
    assert int(pinned.manifest["generation"]) == tok
    page1_ids = [d for d, _ in page1]
    assert [d for d, _ in _hits(pinned, ["def"])] == page1_ids
    assert max(d for d, _ in _hits(pinned, ["def"])) < n_before
    fresh_ids = [d for d, _ in _hits(fresh, ["def"])]
    assert any(d >= n_before for d in fresh_ids)  # appended docs match too
    mgr.close()


def test_acquire_after_release_returns_none(spark, corpus, tmp_path):
    idx = tmp_path / "idx"
    r0 = _build(spark, corpus, idx)
    mgr = SearcherLifetimeManager(spark, str(idx))
    tok = mgr.record(r0)
    assert lc.snapshots(str(idx)).get(tok, 0) == 1
    mgr.release(tok)
    assert mgr.acquire(tok) is None
    assert lc.snapshots(str(idx)).get(tok, 0) == 0
    with pytest.raises(KeyError):
        mgr.release(tok)


def test_record_is_idempotent_per_generation(spark, corpus, tmp_path):
    idx = tmp_path / "idx"
    r0 = _build(spark, corpus, idx)
    mgr = SearcherLifetimeManager(spark, str(idx))
    t1 = mgr.record(r0)
    t2 = mgr.record(r0)
    assert t1 == t2
    assert lc.snapshots(str(idx)).get(t1, 0) == 1  # single pin
    mgr.close()


def test_prune_by_age_keeps_newest(spark, corpus, tmp_path):
    idx = tmp_path / "idx"
    now = [1000.0]
    r0 = _build(spark, corpus, idx)
    mgr = SearcherLifetimeManager(spark, str(idx), clock=lambda: now[0])
    t_old = mgr.record(r0)
    _append(spark, corpus, idx, start_id=10_000)
    now[0] += 100
    t_new = mgr.record()
    now[0] += 100
    # both are older than 50s, but the newest is always kept
    pruned = mgr.prune(max_age_sec=50)
    assert pruned == [t_old]
    assert mgr.acquire(t_old) is None
    assert mgr.acquire(t_new) is not None
    mgr.close()
    assert mgr.tokens() == []


def test_pinned_generation_survives_gc(spark, corpus, tmp_path):
    from lucene_spark.index.merge import force_merge

    idx = tmp_path / "idx"
    r0 = _build(spark, corpus, idx)
    mgr = SearcherLifetimeManager(spark, str(idx))
    tok = mgr.record(r0)
    page1 = _hits(r0, ["def", "return"])
    force_merge(spark, str(idx), max_segments=1)
    lc.gc_index(str(idx))
    # the pinned generation's manifest and batches must still be
    # readable and answer identically
    pinned = mgr.acquire(tok)
    assert _hits(pinned, ["def", "return"]) == page1
    mgr.close()
    # after release, GC may drop it
    rep = lc.gc_index(str(idx))
    r1 = IndexReader(spark, str(idx))
    assert _hits(r1, ["def", "return"]) == page1
