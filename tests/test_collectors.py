"""Collector/CollectorManager protocol vs the direct APIs."""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.search import query as Q


@pytest.fixture(scope="module")
def coll_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    rng = np.random.default_rng(5)
    vocab = ["red", "green", "blue", "cyan"]
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(3, 20)))
        for _ in range(100)
    ]
    pdf = pd.DataFrame({
        "doc_id": np.arange(len(docs), dtype=np.int64),
        "text": docs,
        "pop": rng.integers(0, 1000, size=len(docs)).astype("int64"),
    })
    path = str(tmp_path_factory.mktemp("coll") / "idx")
    cfg = IndexConfig(
        field="text", content_col="text", analyzer="simple",
        doc_id_col="doc_id", docs_per_segment=50, id_cols=("pop",),
    )
    build_index(spark, spark.createDataFrame(pdf), path, cfg)
    return IndexReader(spark, path), pdf


def _searcher(reader):
    from lucene_spark.search.executor import IndexSearcher

    return IndexSearcher(reader)


def test_top_score_manager_equals_search(coll_index):
    from lucene_spark.search.collectors import TopScoreDocCollectorManager

    r, _ = coll_index
    s = _searcher(r)
    q = Q.TermQuery("text", "red")
    got = TopScoreDocCollectorManager(k=7).collect(s, q)
    want = s.search(q, k=7)
    assert [(h.doc_id, h.score) for h in got.hits] == [
        (h.doc_id, h.score) for h in want.hits
    ]


def test_total_hit_count_shortcut(coll_index):
    from lucene_spark.search.collectors import TotalHitCountCollectorManager

    r, pdf = coll_index
    s = _searcher(r)
    got = TotalHitCountCollectorManager().collect(s, Q.TermQuery("text", "red"))
    want = sum("red" in t.split() for t in pdf["text"])
    assert got.value == want
    assert got.shortcut  # no deletes: answered from the term dictionary
    # non-term query: distributed path, no shortcut
    b = TotalHitCountCollectorManager().collect(
        s, Q.BooleanQuery(must=(Q.TermQuery("text", "red"),
                                Q.TermQuery("text", "blue")))
    )
    want_b = sum(
        "red" in t.split() and "blue" in t.split() for t in pdf["text"]
    )
    assert b.value == want_b and not b.shortcut


def test_top_field_manager(coll_index):
    from lucene_spark.search.collectors import TopFieldCollectorManager

    r, pdf = coll_index
    s = _searcher(r)
    got = TopFieldCollectorManager("pop", ascending=False, k=5).collect(
        s, Q.TermQuery("text", "green")
    )
    matching = pdf[pdf["text"].str.split().map(lambda t: "green" in t)]
    want = list(
        matching.sort_values(["pop", "doc_id"], ascending=[False, True])
        .head(5)[["doc_id", "pop"]].itertuples(index=False, name=None)
    )
    assert got == want


def test_multi_and_positive_and_caching(coll_index):
    from lucene_spark.search.collectors import (
        CachingCollectorManager,
        MultiCollectorManager,
        PositiveScoresOnlyCollectorManager,
        TopScoreDocCollectorManager,
        TotalHitCountCollectorManager,
    )

    r, _ = coll_index
    s = _searcher(r)
    q = Q.TermQuery("text", "blue")
    multi = MultiCollectorManager(
        (TopScoreDocCollectorManager(k=3), TotalHitCountCollectorManager())
    )
    top, total = multi.collect(s, q)
    assert len(top.hits) == 3 and total.value >= 3

    pos = PositiveScoresOnlyCollectorManager(TopScoreDocCollectorManager(k=5))
    assert all(h.score > 0 for h in pos.collect(s, q).hits)

    caching = CachingCollectorManager(TopScoreDocCollectorManager(k=4))
    first = caching.collect(s, q)
    assert caching.replay(s, q) is first
    with pytest.raises(ValueError):
        caching.replay(s, Q.TermQuery("text", "cyan"))


def test_field_sort_search_after_pages_compose(spark):
    """searchAfter(FieldDoc) contract: page 1 (top-k) followed by a
    page anchored at page 1's last (sort_val, doc_id) must equal the
    single top-2k list split in half — no gaps, no repeats."""
    from lucene_spark.gate import FIELD, T_MID, ensure_index
    from lucene_spark.search import sqlpath as sp

    r = ensure_index(spark, "/root/testdata/sf0.001")
    full = sp.field_sort_topk(
        r, FIELD, T_MID, "n_chars", ascending=False, k=20
    ).collect()
    page1 = full[:10]
    cursor = page1[-1]
    page2 = sp.field_sort_search_after(
        r, FIELD, T_MID, "n_chars",
        after_val=cursor["sort_val"], after_doc=cursor["doc_id"],
        ascending=False, k=10,
    ).collect()
    assert [tuple(x) for x in page2] == [tuple(x) for x in full[10:]]
    assert len(page2) == 10
