"""Checkpoint-resume: kill mid-build -> rerun converges to an index
logically identical to a clean one-shot build (FIXTURES.md §6; the
IndexWriter two-phase-commit guarantee)."""

import pandas as pd
import pytest

from lucene_spark.index import manifest as mani
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.search.executor import IndexReader


def _snapshot(spark, idx):
    post = (
        spark.read.parquet(f"{idx}/postings")
        .select("field", "term", "doc_freq", "total_term_freq", "postings", "norms")
        .toPandas()
        .sort_values(["field", "term"])
        .reset_index(drop=True)
    )
    post["postings"] = post["postings"].map(bytes)
    post["norms"] = post["norms"].map(bytes)
    dl = (
        spark.read.parquet(f"{idx}/doclens")
        .select("doc_id", "doc_len", "doc_len_code")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    return post, dl


def test_kill_and_resume_converges(spark, corpus, tmp_path):
    src = spark.createDataFrame(corpus)
    cfg = IndexConfig(docs_per_segment=100, num_batches=3)

    clean = str(tmp_path / "clean")
    build_index(spark, src, clean, cfg)

    crashy = str(tmp_path / "crashy")
    with pytest.raises(RuntimeError, match="injected failure"):
        build_index(spark, src, crashy, cfg, fail_after_batch=1)
    # only batch 0 committed
    m = mani.read_manifest(crashy)
    assert [b["batch"] for b in m["batches"]] == [0]

    # resume: completes remaining batches, skipping the committed one
    build_index(spark, src, crashy, cfg)
    m2 = mani.read_manifest(crashy)
    assert sorted(b["batch"] for b in m2["batches"]) == [0, 1, 2]

    p1, d1 = _snapshot(spark, clean)
    p2, d2 = _snapshot(spark, crashy)
    pd.testing.assert_frame_equal(p1, p2)
    pd.testing.assert_frame_equal(d1, d2)

    # both indexes answer queries identically
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher

    s1 = IndexSearcher(IndexReader(spark, clean))
    s2 = IndexSearcher(IndexReader(spark, crashy))
    q = Q.BooleanQuery(should=(Q.TermQuery("content", "class"), Q.TermQuery("content", "def")))
    h1 = [(h.doc_id, h.score) for h in s1.search(q, k=10).hits]
    h2 = [(h.doc_id, h.score) for h in s2.search(q, k=10).hits]
    assert h1 == h2


def test_uncommitted_pending_manifest_invisible(tmp_path):
    """A crash between write and rename leaves only _pending-*; readers
    see the previous generation (SegmentInfos 'largest committed
    generation wins')."""
    import json
    import os

    idx = str(tmp_path / "idx")
    os.makedirs(idx)
    mani.commit_manifest(idx, {"x": 1})
    with open(os.path.join(idx, "_pending-manifest-1.json"), "w") as f:
        json.dump({"x": 2}, f)
    assert mani.latest_generation(idx) == 0
    assert mani.read_manifest(idx)["x"] == 1
