"""IndexUpgrader analog: rewrite an index's postings into another
registered format in place; results must be bit-identical."""

import pytest


@pytest.fixture(scope="module")
def upgraded(spark, corpus, tmp_path_factory):
    from lucene_spark.index.addindexes import upgrade_index
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexReader, IndexSearcher

    idx = str(tmp_path_factory.mktemp("up") / "idx")
    build_index(
        spark, spark.createDataFrame(corpus), idx,
        IndexConfig(docs_per_segment=100, postings_format="for104"),
    )
    q = Q.BooleanQuery(
        should=(Q.TermQuery("content", "def"), Q.TermQuery("content", "return"))
    )
    before = [
        (h.doc_id, h.score)
        for h in IndexSearcher(IndexReader(spark, idx)).search(q, k=50).hits
    ]
    gen = upgrade_index(spark, idx, "varint")
    return spark, idx, q, before, gen


def test_upgrade_flips_format_and_keeps_results(upgraded):
    from lucene_spark.search import query as Q  # noqa: F401
    from lucene_spark.search.executor import IndexReader, IndexSearcher

    spark, idx, q, before, _gen = upgraded
    rd = IndexReader(spark, idx)
    assert rd.manifest["postings_format"] == "varint"
    assert rd.manifest["upgraded_from"] == "for104"
    after = [
        (h.doc_id, h.score) for h in IndexSearcher(rd).search(q, k=50).hits
    ]
    assert after == before  # bit-identical scores through the new codec


def test_upgraded_index_passes_checkindex(upgraded):
    from lucene_spark.index.checkindex import check_index

    spark, idx, _q, _before, _gen = upgraded
    rep = check_index(spark, idx)
    assert rep["ok"], rep["violations"]


def test_upgrade_is_idempotent_and_validates(upgraded):
    from lucene_spark.index.addindexes import upgrade_index
    from lucene_spark.index import manifest as mani

    spark, idx, _q, _before, gen = upgraded
    assert upgrade_index(spark, idx, "varint") == mani.read_manifest(idx)[
        "generation"
    ]
    with pytest.raises(ValueError):
        upgrade_index(spark, idx, "no_such_format")
