"""Term vectors (TermVectorsFormat reader role): the transpose query
over postings must reproduce, per requested doc, exactly what the
analyzer put into the index — terms, freqs, positions — and respect
tombstones."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def tv_idx(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    docs = pd.DataFrame(
        {
            "doc_id": range(5),
            "text": [
                "fast table scan beats slow table walk",
                "merge sort then merge again",
                "fast fast fast",
                "one",
                "fast table scan",
            ],
        }
    )
    idx = str(tmp_path_factory.mktemp("tvidx") / "idx")
    cfg = IndexConfig(
        field="text", content_col="text", analyzer="standard",
        doc_id_col="doc_id", docs_per_segment=2,
    )
    sdf = spark.createDataFrame(docs)
    build_index(spark, sdf, idx, cfg)
    return IndexReader(spark, idx), docs


def test_term_vector_matches_analyzer(tv_idx):
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.search.termvectors import term_vectors

    reader, docs = tv_idx
    an = get_analyzer("standard")
    got = term_vectors(reader, [0, 2]).collect()
    # rebuild the expected vector per doc from the analyzer
    want = {}
    for did in (0, 2):
        toks = an.tokenize_one(docs["text"][did])
        for pos, t in enumerate(toks):
            e = want.setdefault((did, t), [0, []])
            e[0] += 1
            e[1].append(pos)
    assert {(r["doc_id"], r["term"]) for r in got} == set(want)
    for r in got:
        freq, positions = want[(r["doc_id"], r["term"])]
        assert r["freq"] == freq, r
        assert list(r["positions"]) == positions, r
    # ordered by (doc_id, field, term)
    keys = [(r["doc_id"], r["field"], r["term"]) for r in got]
    assert keys == sorted(keys)


def test_term_vector_prunes_segments_and_fields(tv_idx):
    from lucene_spark.search.termvectors import term_vectors

    reader, _ = tv_idx
    # doc 3 is the single-token doc; only its segment is touched
    got = term_vectors(reader, [3]).collect()
    assert [(r["doc_id"], r["term"], r["freq"]) for r in got] == [(3, "one", 1)]
    # field filter: bogus field -> empty
    assert term_vectors(reader, [0], field="nope").count() == 0


def test_term_vector_respects_tombstones(tv_idx, spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.index.deletes import delete_by_term
    from lucene_spark.search.executor import IndexReader
    from lucene_spark.search.termvectors import term_vectors

    docs = pd.DataFrame(
        {"doc_id": [0, 1], "text": ["gone forever", "kept around"]}
    )
    idx = str(tmp_path_factory.mktemp("tvdel") / "idx")
    cfg = IndexConfig(
        field="text", content_col="text", analyzer="standard",
        doc_id_col="doc_id",
    )
    build_index(spark, spark.createDataFrame(docs), idx, cfg)
    delete_by_term(spark, idx, "text", "gone")
    reader = IndexReader(spark, idx)
    got = term_vectors(reader, [0, 1]).collect()
    assert {r["doc_id"] for r in got} == {1}
