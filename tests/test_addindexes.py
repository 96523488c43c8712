"""addIndexes tests: imported docs are rebased onto the destination's
docID space, stats union correctly, and scores match a single build
over the combined corpus (content-wise — docIDs differ by import
order, so score multisets are compared)."""

from collections import Counter

import pytest


def test_add_indexes_rebases_and_matches_bulk(spark, corpus, tmp_path):
    from lucene_spark.index.addindexes import add_indexes
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.index.checkindex import check_index
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.executor import IndexReader

    srt = corpus.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    h1, h2 = srt.iloc[: len(srt) // 2], srt.iloc[len(srt) // 2 :]
    cfg = IndexConfig(docs_per_segment=80)

    a, b, full = (str(tmp_path / x) for x in ("a", "b", "full"))
    build_index(spark, spark.createDataFrame(h1), a, cfg)
    build_index(spark, spark.createDataFrame(h2), b, cfg)
    build_index(spark, spark.createDataFrame(srt), full, cfg)

    add_indexes(spark, a, b)
    r = IndexReader(spark, a)
    rf = IndexReader(spark, full)

    assert r.manifest["num_docs_total"] == len(srt)
    assert r.collection_stats("content") == rf.collection_stats("content")

    for must in (["def"], ["return", "import"]):
        got = Counter(
            x["score_x1e6"]
            for x in sp.bool_bm25_topk(r, "content", must=must, k=30).collect()
        )
        want = Counter(
            x["score_x1e6"]
            for x in sp.bool_bm25_topk(rf, "content", must=must, k=30).collect()
        )
        assert got == want and got

    rep = check_index(spark, a)
    assert rep["ok"], rep["violations"][:5]


def test_add_indexes_rejects_incompatible(spark, corpus, tmp_path):
    from lucene_spark.index.addindexes import add_indexes
    from lucene_spark.index.builder import IndexConfig, build_index

    a = str(tmp_path / "a")
    b = str(tmp_path / "b")
    build_index(spark, spark.createDataFrame(corpus.head(50)), a,
                IndexConfig(docs_per_segment=100))
    build_index(spark, spark.createDataFrame(corpus.head(50)), b,
                IndexConfig(docs_per_segment=100, analyzer="simple"))
    with pytest.raises(ValueError, match="incompatible"):
        add_indexes(spark, a, b)
