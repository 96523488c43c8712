"""Semantic tests for suggest / MoreLikeThis / CommonTermsQuery (the
value-parity with DuckDB runs in test_gate_parity)."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reader(spark):
    from lucene_spark.gate import ensure_index

    return ensure_index(spark, SF)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_suggest_ranks_by_distance_then_df(reader):
    from lucene_spark.search.sqlpath import suggest_terms

    rows = suggest_terms(reader, "text", "spork", max_edits=2, k=5).collect()
    assert rows
    assert rows[0]["term"] == "spark"  # distance 1 beats distance 2
    assert rows[0]["distance"] == 1
    keys = [(r["distance"], -r["doc_freq"], r["term"]) for r in rows]
    assert keys == sorted(keys)
    assert all(r["term"] != "spork" for r in rows)


def test_mlt_seed_doc_ranks_first(reader, docs):
    from lucene_spark.search.sqlpath import mlt_select_terms, mlt_topk

    terms = mlt_select_terms(reader, docs, doc_id=7, max_terms=5)
    assert len(terms) == 5 and len(set(terms)) == 5
    top = mlt_topk(reader, docs, doc_id=7, max_terms=5, k=10).collect()
    assert top
    # the seed document should be highly similar to itself
    assert 7 in [r["doc_id"] for r in top[:3]]


def test_common_terms_requires_rare_match(reader):
    from lucene_spark.search.sqlpath import common_terms_topk
    from lucene_spark.search.sqlpath import exploded_postings

    out = common_terms_topk(
        reader, "text", ["table", "spark", "dup"], max_doc_ratio=0.3
    ).collect()
    assert out
    rare_docs = {
        r["doc_id"]
        for r in exploded_postings(reader, "text", ["dup"]).select("doc_id").collect()
    }
    assert all(r["doc_id"] in rare_docs for r in out)


def test_common_terms_degrades_without_rare(reader):
    from lucene_spark.search.sqlpath import bool_bm25_topk, common_terms_topk

    got = common_terms_topk(
        reader, "text", ["table", "spark"], max_doc_ratio=0.3
    ).collect()
    want = bool_bm25_topk(reader, "text", should=["table", "spark"]).collect()
    assert [(r["doc_id"], r["score_x1e6"]) for r in got] == [
        (r["doc_id"], r["score_x1e6"]) for r in want
    ]


def test_mlt_by_doc_matches_text_seeded_mlt(reader, docs):
    """like(docID) seeds from the index term vector; on a standard
    (non-stemming) index the vector equals the re-tokenized text, so
    both MLT paths must return identical results."""
    from lucene_spark.search.sqlpath import mlt_by_doc, mlt_topk

    a = mlt_topk(reader, docs, doc_id=7, max_terms=5, k=10).collect()
    b = mlt_by_doc(reader, doc_id=7, max_terms=5, k=10).collect()
    assert [(r["doc_id"], r["score_x1e6"]) for r in a] == [
        (r["doc_id"], r["score_x1e6"]) for r in b
    ]
    assert b and b[0]["doc_id"] == 7  # seed doc ranks first


def test_mlt_by_doc_uses_index_terms_on_stemmed_index(spark):
    """On a Porter-stemmed index the term vector holds STEMS; the
    vector-seeded MLT must query stems (and still rank the seed doc
    first), where text re-tokenization would produce surface forms
    absent from the index."""
    from lucene_spark.gate import ensure_stem_index
    from lucene_spark.search.sqlpath import mlt_by_doc

    r = ensure_stem_index(spark, SF)
    got = mlt_by_doc(r, doc_id=7, max_terms=5, k=10).collect()
    assert got and got[0]["doc_id"] == 7


def test_word_break_single_change(reader):
    from lucene_spark.search.sqlpath import word_break_suggest

    rows = word_break_suggest(reader, "text", "hashjoin", max_changes=1, k=5).collect()
    assert [r["term"] for r in rows] == ["hash join"]
    assert rows[0]["distance"] == 1
    # summed-frequency ranking: freq = df(hash) + df(join)
    from lucene_spark.search.sqlpath import suggest_terms  # noqa: F401
    import pyspark.sql.functions as F

    ts = (
        reader.term_stats_df()
        .filter(F.col("field") == "text")
        .groupBy("term")
        .agg(F.sum("doc_freq").alias("df"))
        .filter(F.col("term").isin(["hash", "join"]))
        .collect()
    )
    assert rows[0]["doc_freq"] == sum(r["df"] for r in ts)


def test_word_break_two_changes_and_min_length(reader):
    from lucene_spark.search.sqlpath import word_break_suggest

    rows = word_break_suggest(
        reader, "text", "bigdatascan", max_changes=2, k=5
    ).collect()
    assert [r["term"] for r in rows] == ["big data scan"]
    assert rows[0]["distance"] == 2
    # with max_changes=1 there is no 2-part segmentation
    assert (
        word_break_suggest(reader, "text", "bigdatascan", max_changes=1, k=5).count()
        == 0
    )
    # min_break_length prunes the short fragments
    assert (
        word_break_suggest(
            reader, "text", "bigdatascan", max_changes=2, min_break_length=4, k=5
        ).count()
        == 0
    )


def test_word_combine_adjacent_runs(reader):
    from lucene_spark.search.sqlpath import word_combine_suggest

    rows = word_combine_suggest(
        reader, "text", ["ta", "ble", "scan"], max_changes=2, k=5
    ).collect()
    assert [r["term"] for r in rows] == ["table"]
    assert rows[0]["distance"] == 1
    # non-adjacent terms never combine: ['ta', 'scan', 'ble'] has no
    # adjacent run concatenating to a dictionary word
    assert (
        word_combine_suggest(reader, "text", ["ta", "scan", "ble"], k=5).count() == 0
    )
    # max_combine_length guards the concatenation budget
    assert (
        word_combine_suggest(
            reader, "text", ["ta", "ble"], max_combine_length=3, k=5
        ).count()
        == 0
    )
