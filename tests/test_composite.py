"""Composite readers: MultiReader (doc re-basing + summed statistics)
and ParallelReader (field routing over same-document indexes).

The load-bearing assertion: a MultiReader over two half-corpus indexes
scores BIT-IDENTICALLY to one physical index over the whole corpus —
the IndexSearcher-over-composite statistics contract."""

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def halves(spark, tmp_path_factory):
    from lucene_spark.fixtures import generate_source_files
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    corpus = generate_source_files(300, seed=11)
    srt = corpus.sort_values(["repo", "path", "commit"]).reset_index(
        drop=True
    )
    mid = len(srt) // 2
    root = tmp_path_factory.mktemp("composite")
    dirs = []
    for name, part in (
        ("a", srt.iloc[:mid]), ("b", srt.iloc[mid:]), ("all", srt),
    ):
        idx = str(root / name)
        cfg = IndexConfig(docs_per_segment=64)
        build_index(spark, spark.createDataFrame(part), idx, cfg)
        dirs.append(idx)
    return (
        IndexReader(spark, dirs[0]),
        IndexReader(spark, dirs[1]),
        IndexReader(spark, dirs[2]),
    )


def test_multireader_doc_bases(halves):
    from lucene_spark.search.composite import MultiReader, _max_doc

    a, b, full = halves
    mr = MultiReader([a, b])
    assert mr.bases == [0, _max_doc(a)]
    assert mr.max_doc == _max_doc(full)
    assert mr.docs().count() == full.docs().count()


def test_multireader_summed_stats(halves):
    from lucene_spark.search.composite import MultiReader

    a, b, full = halves
    mr = MultiReader([a, b])
    field = full.manifest["field"]
    cm, cf = mr.collection_stats(field), full.collection_stats(field)
    assert cm.doc_count == cf.doc_count
    assert cm.sum_total_term_freq == cf.sum_total_term_freq
    # per-term stats summed == combined index stats
    ts_m = mr.term_stats(field, ["return", "import", "def"])
    ts_f = full.term_stats(field, ["return", "import", "def"])
    assert set(ts_m) == set(ts_f)
    for t in ts_m:
        assert ts_m[t].doc_freq == ts_f[t].doc_freq
        assert ts_m[t].total_term_freq == ts_f[t].total_term_freq


def test_multireader_scores_equal_single_index(halves):
    """bool BM25 over the composite == over the physical union, doc ids
    and x1e6 scores both (the corpus halves follow the builder's sort
    order, so re-based sub ids ARE the combined ids)."""
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.composite import MultiReader

    a, b, full = halves
    mr = MultiReader([a, b])
    field = full.manifest["field"]
    for q in (
        dict(must=["return"]),
        dict(must=["return"], should=["import", "def"]),
        dict(should=["import", "def"], min_should=1),
    ):
        got = sp.bool_bm25_topk(mr, field, k=20, **q).collect()
        want = sp.bool_bm25_topk(full, field, k=20, **q).collect()
        assert [(r.doc_id, r.score_x1e6) for r in got] == [
            (r.doc_id, r.score_x1e6) for r in want
        ], q


def test_multireader_classify(halves):
    """Downstream consumers (classification) run unchanged over the
    composite."""
    from lucene_spark.search.classify import knn_classify
    from lucene_spark.search.composite import MultiReader

    a, b, full = halves
    mr = MultiReader([a, b])
    got = knn_classify(mr, "def return import", "lang", k=10).toPandas()
    want = knn_classify(full, "def return import", "lang", k=10).toPandas()
    assert got.values.tolist() == want.values.tolist()


def test_multireader_empty_raises():
    from lucene_spark.search.composite import MultiReader

    with pytest.raises(ValueError):
        MultiReader([])


# --------------------------- ParallelReader ----------------------------


@pytest.fixture(scope="module")
def parallel_ix(spark, tmp_path_factory):
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
    root = tmp_path_factory.mktemp("par")
    sdf = spark.createDataFrame(docs)
    t_idx = str(root / "t")
    build_index(spark, sdf, t_idx,
                IndexConfig(field="title", content_col="title",
                            docs_per_segment=10))
    b_idx = str(root / "b")
    build_index(spark, sdf, b_idx,
                IndexConfig(field="body", content_col="body",
                            docs_per_segment=10))
    mf_idx = str(root / "mf")
    build_index(spark, sdf, mf_idx,
                IndexConfig(field="body", content_col="body",
                            extra_fields={"title": "title"},
                            docs_per_segment=10))
    return (
        IndexReader(spark, t_idx),
        IndexReader(spark, b_idx),
        IndexReader(spark, mf_idx),
    )


def test_parallel_field_routing(parallel_ix):
    from lucene_spark.search.composite import ParallelReader

    t, b, mf = parallel_ix
    pr = ParallelReader([t, b])
    assert pr.collection_stats("title").doc_count == 6
    assert pr.collection_stats("body").doc_count == 6
    with pytest.raises(KeyError):
        pr.collection_stats("nope")


def test_parallel_scores_match_multifield_index(parallel_ix):
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.composite import ParallelReader

    t, b, mf = parallel_ix
    pr = ParallelReader([t, b])
    for field, term in (("title", "alpha"), ("body", "alpha"),
                        ("body", "gamma")):
        got = sp.bool_bm25_topk(pr, field, must=[term], k=10).collect()
        want = sp.bool_bm25_topk(mf, field, must=[term], k=10).collect()
        assert [(r.doc_id, r.score_x1e6) for r in got] == [
            (r.doc_id, r.score_x1e6) for r in want
        ], (field, term)


def test_parallel_size_mismatch_raises(halves, parallel_ix):
    from lucene_spark.search.composite import ParallelReader

    a, _b, _full = halves
    t, _, _ = parallel_ix
    with pytest.raises(ValueError, match="same documents"):
        ParallelReader([a, t])


def test_multireader_tombstones_rebase(spark, halves, tmp_path):
    """A doc tombstoned in sub-index B must disappear from the
    composite under its RE-BASED id (BaseCompositeReader doc bases
    apply to liveDocs too)."""
    import shutil

    from lucene_spark.index.deletes import delete_by_ids
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.composite import MultiReader
    from lucene_spark.search.executor import IndexReader

    a, b, full = halves
    # work on COPIES so the module-scoped fixture readers stay clean
    ca, cb = str(tmp_path / "ca"), str(tmp_path / "cb")
    shutil.copytree(a.index_dir, ca)
    shutil.copytree(b.index_dir, cb)
    ra, rb = IndexReader(spark, ca), IndexReader(spark, cb)
    mr0 = MultiReader([ra, rb])
    base_b = mr0.bases[1]
    hits = sp.bool_bm25_topk(mr0, full.manifest["field"],
                             must=["return"], k=50).collect()
    victim_global = next(r.doc_id for r in hits if r.doc_id >= base_b)
    victim_local = victim_global - base_b
    delete_by_ids(
        spark, cb,
        spark.createDataFrame([(victim_local,)], "doc_id long"),
    )
    mr = MultiReader([IndexReader(spark, ca), IndexReader(spark, cb)])
    after = {
        r.doc_id
        for r in sp.bool_bm25_topk(mr, full.manifest["field"],
                                   must=["return"], k=50).collect()
    }
    assert victim_global not in after
    # untouched sub-index A hits survive
    assert any(d < base_b for d in after)


def test_searcher_count_over_multireader(spark):
    """IndexSearcher.count on a composite: MatchAll sums the
    sub-manifests (not sub-reader 0's copy), and term counts come from
    the summed statistics path."""
    from lucene_spark.gate import ensure_index, ensure_split_indexes
    from lucene_spark.search import query as Q
    from lucene_spark.search.composite import MultiReader
    from lucene_spark.search.executor import IndexSearcher

    sf = "/root/testdata/sf0.001"
    mr = MultiReader(ensure_split_indexes(spark, sf))
    single = ensure_index(spark, sf)
    s_mr, s_one = IndexSearcher(mr), IndexSearcher(single)
    assert s_mr.count(Q.MatchAllQuery()) == s_one.count(Q.MatchAllQuery())
    q = Q.TermQuery("text", "customer")
    assert s_mr.count(q) == s_one.count(q)


def test_searcher_count_parallel_reader_and_multiterm(spark):
    """ParallelReader holds the SAME docs N times — count(MatchAll)
    must NOT multiply; multi-term counts on composites expand through
    the sub-readers' dictionaries instead of crashing."""
    from lucene_spark.gate import ensure_index, ensure_split_indexes
    from lucene_spark.search import query as Q
    from lucene_spark.search.composite import MultiReader, ParallelReader
    from lucene_spark.search.executor import IndexSearcher

    sf = "/root/testdata/sf0.001"
    single = ensure_index(spark, sf)
    n = IndexSearcher(single).count(Q.MatchAllQuery())

    pr = ParallelReader([single, single])
    assert IndexSearcher(pr).count(Q.MatchAllQuery()) == n

    mr = MultiReader(ensure_split_indexes(spark, sf))
    q = Q.PrefixQuery("text", "cust")
    assert IndexSearcher(mr).count(q) == IndexSearcher(single).count(q)


def test_match_all_total_over_multireader(spark):
    """search(MatchAll) over a doc-stacking composite: total_hits sums
    the sub-manifests (not sub-reader 0's copy)."""
    from lucene_spark.gate import ensure_index, ensure_split_indexes
    from lucene_spark.search import query as Q
    from lucene_spark.search.composite import MultiReader
    from lucene_spark.search.executor import IndexSearcher

    sf = "/root/testdata/sf0.001"
    mr = MultiReader(ensure_split_indexes(spark, sf))
    single = ensure_index(spark, sf)
    a = IndexSearcher(mr).search(Q.MatchAllQuery(), k=3)
    b = IndexSearcher(single).search(Q.MatchAllQuery(), k=3)
    assert a.total_hits == b.total_hits
    assert [h.doc_id for h in a.hits] == [h.doc_id for h in b.hits]
