"""SortRescorer / DoubleValuesSourceRescorer / NamedMatches over the
sf0.001 documents index."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reader(spark):
    from lucene_spark.gate import ensure_index

    return ensure_index(spark, SF_DIR)


def test_sort_rescorer_keeps_first_pass_scores(reader):
    """SortRescorer.java:64-66: the returned hits carry the ORIGINAL
    first-pass scores, only the order (and hence the cut) changes."""
    from lucene_spark.search import sqlpath as sp

    first = (
        sp.term_scored(reader, "text", "table")
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(40)
        .toPandas()
    )
    out = sp.sort_rescore_topk(
        reader, "text", "table", "n_chars", first_n=40, k=10
    ).toPandas()
    scores = dict(zip(first.doc_id, first.score_x1e6))
    assert len(out) == 10
    for r in out.itertuples():
        assert scores[r.doc_id] == r.score_x1e6
    # ordered by the sort value desc
    assert (out.v.values[:-1] >= out.v.values[1:]).all()


def test_sort_rescorer_ascending(reader):
    from lucene_spark.search import sqlpath as sp

    out = sp.sort_rescore_topk(
        reader, "text", "table", "n_chars",
        ascending=True, first_n=40, k=10,
    ).toPandas()
    assert (out.v.values[:-1] <= out.v.values[1:]).all()


def test_dvs_rescorer_combines(reader):
    from lucene_spark.search import sqlpath as sp

    rep = sp.dvs_rescore_topk(
        reader, "text", "table", "CAST(n_chars AS DOUBLE)",
        combine="replace", first_n=40, k=5,
    ).toPandas()
    # replace: the rescored value IS the source value (x1e6)
    docs = reader.docs().select("doc_id", "n_chars").toPandas()
    nchars = dict(zip(docs.doc_id, docs.n_chars))
    for r in rep.itertuples():
        assert r.rescored_x1e6 == round(nchars[r.doc_id] * 1e6)
    with pytest.raises(ValueError, match="unknown combine"):
        sp.dvs_rescore_topk(
            reader, "text", "table", "1.0", combine="max"
        )


def test_dvs_rescorer_null_value_plays_absent(reader):
    """advanceExact false -> sourceValue 0 (DoubleValuesSourceRescorer
    .java:36-37)."""
    from lucene_spark.search import sqlpath as sp

    out = sp.dvs_rescore_topk(
        reader, "text", "table",
        "CASE WHEN doc_id % 2 = 0 THEN NULL ELSE 1.0 END",
        combine="sum", first_n=40, k=40,
    ).toPandas()
    first = (
        sp.term_scored(reader, "text", "table")
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(40)
        .toPandas()
    )
    scores = dict(zip(first.doc_id, first.score_x1e6))
    for r in out.itertuples():
        want = scores[r.doc_id] + (0 if r.doc_id % 2 == 0 else 1_000_000)
        assert abs(r.rescored_x1e6 - want) <= 1


def test_named_matches_conjunction(reader):
    """A named conjunction fires only when ALL its terms are present;
    names are reported sorted and comma-joined (findNamedMatches over
    the SHOULD tree)."""
    from lucene_spark.search import sqlpath as sp

    out = sp.named_matches_topk(
        reader, "text",
        {"a": ["table"], "b": ["table", "query"], "c": ["query"]},
        k=10_000,
    ).toPandas()
    ep = sp.exploded_postings(
        reader, "text", ["table", "query"]
    ).toPandas()
    has_r = set(ep[ep.term == "table"].doc_id)
    has_i = set(ep[ep.term == "query"].doc_id)
    named = dict(zip(out.doc_id, out.names))
    assert set(named) == has_r | has_i
    for d, names in named.items():
        want = []
        if d in has_r:
            want.append("a")
        if d in has_r and d in has_i:
            want.append("b")
        if d in has_i:
            want.append("c")
        assert names == ",".join(sorted(want)), d
    assert (out.n_names == out.names.str.count(",") + 1).all()
