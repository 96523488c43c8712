"""MultiFieldQueryParser — fieldless clauses expand over the field
list (queryparser/classic/MultiFieldQueryParser.java,
TestMultiFieldQueryParser patterns)."""

import pytest

from lucene_spark.search import query as Q
from lucene_spark.search.queryparser import (
    MultiFieldQueryParser,
    QueryParser,
    parse_multi,
)

MP = MultiFieldQueryParser(["title", "body"])


def test_fieldless_term_expands():
    q = MP.parse("alpha")
    assert q == Q.BooleanQuery(
        should=(Q.TermQuery("title", "alpha"), Q.TermQuery("body", "alpha"))
    )


def test_explicit_field_pins():
    assert MP.parse("body:alpha") == Q.TermQuery("body", "alpha")


def test_boosts_applied_per_field():
    p = MultiFieldQueryParser(["title", "body"], boosts={"title": 5.0})
    q = p.parse("alpha")
    # rewrite_fixpoint folds BoostQuery(TermQuery) into the term boost
    assert q.should == (
        Q.TermQuery("title", "alpha", boost=5.0),
        Q.TermQuery("body", "alpha"),
    )


def test_phrase_and_slop_expand():
    q = MP.parse('"one two"~2')
    assert q.should == (
        Q.PhraseQuery("title", ("one", "two"), slop=2),
        Q.PhraseQuery("body", ("one", "two"), slop=2),
    )


def test_multiterm_expansion():
    q = MP.parse("alph*")
    assert q.should == (
        Q.PrefixQuery("title", "alph"),
        Q.PrefixQuery("body", "alph"),
    )
    q = MP.parse("alpha~1")
    assert q.should == (
        Q.FuzzyQuery("title", "alpha", max_edits=1),
        Q.FuzzyQuery("body", "alpha", max_edits=1),
    )


def test_range_expansion():
    q = MP.parse("[aa TO bb]")
    assert q.should == (
        Q.TermRangeQuery("title", "aa", "bb", True, True),
        Q.TermRangeQuery("body", "aa", "bb", True, True),
    )


def test_boolean_structure_preserved():
    # +alpha -beta: each expanded arm keeps its occur slot
    q = MP.parse("+alpha -beta")
    assert len(q.must) == 1 and isinstance(q.must[0], Q.BooleanQuery)
    assert q.must[0].should == (
        Q.TermQuery("title", "alpha"), Q.TermQuery("body", "alpha"))
    assert q.must_not[0].should == (
        Q.TermQuery("title", "beta"), Q.TermQuery("body", "beta"))


def test_single_field_degenerates_to_plain():
    p1 = MultiFieldQueryParser(["body"])
    p = QueryParser("body")
    for s in ["alpha", '"one two"', "alph*", "+a -b c", "a AND b"]:
        assert p1.parse(s) == p.parse(s), s


def test_parse_multi_static():
    q = parse_multi(["alpha", "beta"], ["title", "body"],
                    flags=["must", "must_not"])
    assert q.must == (Q.TermQuery("title", "alpha"),)
    assert q.must_not == (Q.TermQuery("body", "beta"),)
    q = parse_multi(["alpha", "beta"], ["title", "body"])
    assert q.should == (
        Q.TermQuery("title", "alpha"), Q.TermQuery("body", "beta"))
    with pytest.raises(ValueError):
        parse_multi(["a"], ["title", "body"])


def test_execution_over_two_field_index(spark, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader, IndexSearcher
    import pandas as pd

    docs = pd.DataFrame(
        {
            "repo": ["r"] * 4,
            "path": [f"f{i}" for i in range(4)],
            "commit": ["c"] * 4,
            "title": ["alpha intro", "beta notes", "gamma", "alpha beta"],
            "body": [
                "body about beta",
                "alpha appears here",
                "nothing relevant",
                "plain words",
            ],
        }
    )
    idx = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(docs), idx,
        IndexConfig(field="body", content_col="body",
                    extra_fields={"title": "title"}, docs_per_segment=10),
    )
    s = IndexSearcher(IndexReader(spark, idx))
    hits = {h.doc_id for h in s.search(MP.parse("alpha"), k=10).hits}
    # docs 0,3 via title; doc 1 via body
    assert hits == {0, 1, 3}
    pinned = {h.doc_id for h in s.search(MP.parse("title:alpha"), k=10).hits}
    assert pinned == {0, 3}
