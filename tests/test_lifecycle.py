"""Snapshot / GC / replication lifecycle (SnapshotDeletionPolicy,
IndexFileDeleter, replicator roles): GC must never change query results,
snapshots must keep a pinned commit's files alive, and a replica must be
a readable commit answering identically to the source."""

import os

import pytest


def _build(spark, corpus, path):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    cfg = IndexConfig(docs_per_segment=60, num_batches=2)
    build_index(spark, spark.createDataFrame(corpus), str(path), cfg)
    return IndexReader(spark, str(path))


def _topk(reader, must):
    from lucene_spark.search import sqlpath as sp

    return [
        (r["doc_id"], r["score_x1e6"])
        for r in sp.bool_bm25_topk(reader, "content", must=must).collect()
    ]


def _batch_dirs(idx, table):
    d = os.path.join(str(idx), table)
    return sorted(n for n in os.listdir(d) if n.startswith("batch="))


def test_gc_after_merge_drops_inputs_keeps_results(spark, corpus, tmp_path):
    from lucene_spark.index import lifecycle as lc
    from lucene_spark.index.merge import force_merge
    from lucene_spark.search.executor import IndexReader

    idx = tmp_path / "idx"
    r0 = _build(spark, corpus, idx)
    before = _topk(r0, ["def", "return"])
    n_batches_before = len(_batch_dirs(idx, "postings"))

    force_merge(spark, str(idx), max_segments=1)
    # merge inputs are still on disk (IndexFileDeleter model: manifest
    # decides visibility, files wait for GC)
    assert len(_batch_dirs(idx, "postings")) > n_batches_before

    rep = lc.gc_index(str(idx))
    assert rep["removed_dirs"], rep
    # all pre-merge postings/doclens batches are gone, docs registry stays
    assert len(_batch_dirs(idx, "postings")) == 1
    assert len(_batch_dirs(idx, "doclens")) == 1
    assert len(_batch_dirs(idx, "docs")) == 2
    # old manifest generations pruned down to the latest
    assert rep["removed_manifests"] and len(rep["kept_gens"]) == 1

    r1 = IndexReader(spark, str(idx))
    assert _topk(r1, ["def", "return"]) == before


def test_snapshot_pins_commit_until_release(spark, corpus, tmp_path):
    from lucene_spark.index import lifecycle as lc
    from lucene_spark.index.merge import force_merge

    idx = tmp_path / "idx"
    _build(spark, corpus, idx)
    g0 = lc.snapshot(str(idx))
    pre_merge_postings = set(_batch_dirs(idx, "postings"))

    force_merge(spark, str(idx), max_segments=1)
    rep = lc.gc_index(str(idx))
    # the snapshotted generation keeps every pre-merge batch dir alive
    assert set(_batch_dirs(idx, "postings")) >= pre_merge_postings
    assert g0 in rep["kept_gens"] and os.path.exists(
        os.path.join(str(idx), f"manifest-{g0}.json")
    )

    lc.release_snapshot(str(idx), g0)
    rep2 = lc.gc_index(str(idx))
    assert g0 not in rep2["kept_gens"]
    assert not (set(_batch_dirs(idx, "postings")) & pre_merge_postings)
    with pytest.raises(KeyError):
        lc.release_snapshot(str(idx), g0)


def test_refcounted_snapshot_needs_both_releases(spark, corpus, tmp_path):
    from lucene_spark.index import lifecycle as lc

    idx = tmp_path / "idx"
    _build(spark, corpus, idx)
    g = lc.snapshot(str(idx))
    assert lc.snapshot(str(idx)) == g
    assert lc.snapshots(str(idx)) == {g: 2}
    lc.release_snapshot(str(idx), g)
    assert lc.snapshots(str(idx)) == {g: 1}
    lc.release_snapshot(str(idx), g)
    assert lc.snapshots(str(idx)) == {}


def test_replicate_is_incremental_and_identical(spark, corpus, tmp_path):
    from lucene_spark.index import lifecycle as lc
    from lucene_spark.index.merge import force_merge
    from lucene_spark.search.executor import IndexReader

    src = tmp_path / "src"
    dst = tmp_path / "dst"
    r0 = _build(spark, corpus, src)
    want = _topk(r0, ["def", "return"])

    rep1 = lc.replicate(str(src), str(dst))
    assert rep1["files_copied"] > 0
    replica = IndexReader(spark, str(dst))
    assert _topk(replica, ["def", "return"]) == want

    # no-op resync: nothing new to move
    rep1b = lc.replicate(str(src), str(dst))
    assert rep1b["files_copied"] == 0

    # advance the source and resync: only the new revision's files move
    force_merge(spark, str(src), max_segments=1)
    want2 = _topk(IndexReader(spark, str(src)), ["def", "return"])
    rep2 = lc.replicate(str(src), str(dst))
    assert 0 < rep2["files_copied"]
    assert rep2["generation"] > rep1["generation"]
    replica2 = IndexReader(spark, str(dst))
    assert _topk(replica2, ["def", "return"]) == want2 == want


def test_deletion_policies(spark, corpus, tmp_path):
    """KeepLastN / NoDeletionPolicy (core/index/
    KeepLastNCommitsDeletionPolicy.java, NoDeletionPolicy.java,
    KeepOnlyLastCommitDeletionPolicy.java): the GC's retained
    generation set follows the policy; snapshots pin on top."""
    import os as _os

    from lucene_spark.index import lifecycle as lc
    from lucene_spark.index import manifest as mani
    from lucene_spark.index.merge import force_merge

    idx = tmp_path / "idx"
    _build(spark, corpus, idx)
    force_merge(spark, str(idx), max_segments=1)
    force_merge(spark, str(idx), max_segments=1)
    gens = sorted(
        int(m.group(1))
        for f in _os.listdir(str(idx))
        if (m := mani._GEN_RE.match(f))
    )
    assert len(gens) >= 3

    # none: nothing removed
    rep = lc.gc_index(str(idx), policy="none")
    assert rep["removed_manifests"] == []
    assert sorted(rep["kept_gens"]) == gens

    # keep_last_n: newest two survive
    rep2 = lc.gc_index(str(idx), policy="keep_last_n", keep_n=2)
    assert rep2["kept_gens"] == gens[-2:]
    left = sorted(
        int(m.group(1))
        for f in _os.listdir(str(idx))
        if (m := mani._GEN_RE.match(f))
    )
    assert left == gens[-2:]

    # default keep_last: only the latest remains
    rep3 = lc.gc_index(str(idx))
    assert rep3["kept_gens"] == [gens[-1]]

    with __import__("pytest").raises(ValueError, match="unknown deletion"):
        lc.gc_index(str(idx), policy="bogus")
    with __import__("pytest").raises(ValueError, match="keep_n"):
        lc.gc_index(str(idx), policy="keep_last_n", keep_n=0)
