"""Multi-field index tests: per-field postings/doclens/stats, keyword
fields, BM25F, cross-field guard, and merge/NRT/CheckIndex over the
multi-field layout."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def mf_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    docs = pd.DataFrame(
        {
            "repo": ["r"] * 6,
            "path": [f"f{i}" for i in range(6)],
            "commit": ["c"] * 6,
            "title": ["alpha intro", "beta intro", "alpha deep",
                      "gamma", "beta alpha", "delta"],
            "body": [
                "the alpha body text here",
                "body about beta things",
                "deep dive body alpha alpha",
                "gamma gamma gamma body",
                "mixed content body",
                "unrelated words entirely",
            ],
        }
    )
    idx = str(tmp_path_factory.mktemp("mf") / "idx")
    cfg = IndexConfig(
        field="body", content_col="body",
        extra_fields={"title": "title"},
        docs_per_segment=10,
    )
    build_index(spark, spark.createDataFrame(docs), idx, cfg)
    return IndexReader(spark, idx)


def test_per_field_postings_and_stats(mf_index):
    from pyspark.sql import functions as F

    fields = {r["field"] for r in mf_index.postings().select("field").distinct().collect()}
    assert fields == {"body", "title"}
    cb = mf_index.collection_stats("body")
    ct = mf_index.collection_stats("title")
    assert cb.doc_count == ct.doc_count == 6
    assert cb.sum_total_term_freq > ct.sum_total_term_freq  # bodies longer
    # doclens per (doc, field)
    n = mf_index.doclens().groupBy("field").count().collect()
    assert {r["field"]: r["count"] for r in n} == {"body": 6, "title": 6}


def test_search_each_field_independently(mf_index):
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher

    s = IndexSearcher(mf_index)
    t_hits = {h.doc_id for h in s.search(Q.TermQuery("title", "alpha"), k=10).hits}
    b_hits = {h.doc_id for h in s.search(Q.TermQuery("body", "alpha"), k=10).hits}
    assert t_hits == {0, 2, 4}
    assert b_hits == {0, 2}
    # same term, different field stats -> different scores
    ts = s.search(Q.TermQuery("title", "alpha"), k=1).hits[0].score
    bs = s.search(Q.TermQuery("body", "alpha"), k=1).hits[0].score
    assert ts != bs


def test_cross_field_boolean_scores_sum_per_field(mf_index):
    # cross-field booleans execute via field-qualified kernel lookups
    # (MultiFieldQueryParser execution path); each clause scores
    # against its OWN field's postings/norms/stats, summed per doc
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher

    s = IndexSearcher(mf_index)
    res = s.search(
        Q.BooleanQuery(
            must=(Q.TermQuery("title", "alpha"), Q.TermQuery("body", "alpha"))
        ),
        k=5,
    )
    assert {h.doc_id for h in res.hits} == {0, 2}  # title∩body matches
    t = {h.doc_id: h.score for h in s.search(Q.TermQuery("title", "alpha"), k=10).hits}
    b = {h.doc_id: h.score for h in s.search(Q.TermQuery("body", "alpha"), k=10).hits}
    import numpy as np
    for h in res.hits:
        want = np.float32(np.float32(t[h.doc_id]) + np.float32(b[h.doc_id]))
        assert np.float32(h.score) == want
    # SHOULD across fields unions the hit sets
    res2 = s.search(
        Q.BooleanQuery(
            should=(Q.TermQuery("title", "alpha"), Q.TermQuery("body", "alpha"))
        ),
        k=10,
    )
    assert {h.doc_id for h in res2.hits} == {0, 2, 4}


def test_cross_field_intervals_still_raises(mf_index):
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher

    s = IndexSearcher(mf_index)
    with pytest.raises(NotImplementedError, match="cross-field"):
        s.search(
            Q.BooleanQuery(
                must=(
                    Q.IntervalQuery("title", Q.ITerm("alpha")),
                    Q.TermQuery("body", "beta"),
                )
            ),
            k=5,
        )


def test_combined_field_bm25f(mf_index):
    from lucene_spark.search.sqlpath import combined_field_topk

    rows = combined_field_topk(
        mf_index, {"title": 2.0, "body": 1.0}, "alpha", k=10
    ).collect()
    ids = [r["doc_id"] for r in rows]
    assert set(ids) == {0, 2, 4}  # union of both fields' matches
    # doc 2 matches alpha in title AND twice in body -> highest combined freq
    assert ids[0] == 2


def test_merge_and_checkindex_multifield(spark, mf_index):
    from lucene_spark.index.checkindex import check_index
    from lucene_spark.index.merge import force_merge
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexReader, IndexSearcher

    rep0 = check_index(spark, mf_index.index_dir)
    assert rep0["ok"], rep0["violations"][:5]
    # NRT append then force-merge; both fields must survive
    import pandas as pd

    from lucene_spark.index.builder import IndexConfig
    from lucene_spark.streaming.nrt import append_batch

    extra = pd.DataFrame(
        {
            "repo": ["r2"],
            "path": ["g0"],
            "commit": ["c"],
            "title": ["alpha fresh"],
            "body": ["fresh appended body"],
        }
    )
    cfg = IndexConfig(
        field="body", content_col="body",
        extra_fields={"title": "title"}, docs_per_segment=10,
    )
    append_batch(spark, spark.createDataFrame(extra), mf_index.index_dir, cfg)
    force_merge(spark, mf_index.index_dir, max_segments=1)
    r = IndexReader(spark, mf_index.index_dir)
    s = IndexSearcher(r)
    hits = {h.doc_id for h in s.search(Q.TermQuery("title", "alpha"), k=10).hits}
    assert hits == {0, 2, 4, 6}
    rep = check_index(spark, r.index_dir)
    assert rep["ok"], rep["violations"][:5]


def test_per_field_analyzers(spark, tmp_path):
    """PerFieldAnalyzerWrapper role: each field tokenizes with its own
    analyzer (code identifiers split only in the code-analyzed field)."""
    import pandas as pd

    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.executor import IndexReader

    pdf = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "body": ["plain words here", "parseHTTPResponse mention"],
            "src": ["parseHTTPResponse_v2 = 1", "x = 2"],
        }
    )
    path = str(tmp_path / "idx")
    cfg = IndexConfig(
        field="body",
        content_col="body",
        analyzer="simple",
        extra_fields={"code": "src"},
        field_analyzers={"code": "code"},
        doc_id_col="doc_id",
    )
    build_index(spark, spark.createDataFrame(pdf), path, cfg)
    r = IndexReader(spark, path)
    assert r.manifest["field_analyzers"] == {"code": "code"}
    # the code analyzer split the identifier into subtokens in `code`...
    hits = sp.bool_bm25_topk(r, "code", must=["http"], k=10).collect()
    assert [h["doc_id"] for h in hits] == [0]
    # ...but the simple analyzer did NOT split it in `body`
    assert sp.bool_bm25_topk(r, "body", must=["http"], k=10).count() == 0
    assert sp.bool_bm25_topk(r, "body", must=["parsehttpresponse"], k=10).count() == 1
