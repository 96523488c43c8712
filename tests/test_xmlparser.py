"""XML CoreParser (queryparser/xml): golden AST tests mirroring the
reference's test XML files, search-result equivalence with
programmatically-built queries, and the SpanPositionRange kernel vs a
brute-force position filter."""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.search import query as Q
from lucene_spark.search.queryparser import ParseError
from lucene_spark.search.xmlparser import CoreParser, PointRange

P = CoreParser("contents")


# --------------------------------------------------------------------------
# golden AST shapes (BooleanQuery.xml, TermQuery.xml, … analogs)
# --------------------------------------------------------------------------


def test_term_query():
    assert P.parse('<TermQuery fieldName="contents">sumitomo</TermQuery>') == \
        Q.TermQuery("contents", "sumitomo")


def test_term_query_default_field_and_boost():
    q = P.parse('<TermQuery boost="2.5">bank</TermQuery>')
    assert q == Q.BoostQuery(Q.TermQuery("contents", "bank"), 2.5)


def test_boolean_query_with_field_inheritance():
    q = P.parse("""
      <BooleanQuery fieldName="contents">
        <Clause occurs="should"><TermQuery>merger</TermQuery></Clause>
        <Clause occurs="mustnot"><TermQuery>sumitomo</TermQuery></Clause>
        <Clause occurs="must"><TermQuery>bank</TermQuery></Clause>
        <Clause occurs="filter"><TermQuery>rate</TermQuery></Clause>
      </BooleanQuery>""")
    assert q == Q.BooleanQuery(
        must=(Q.TermQuery("contents", "bank"),),
        should=(Q.TermQuery("contents", "merger"),),
        must_not=(Q.TermQuery("contents", "sumitomo"),),
        filter=(Q.TermQuery("contents", "rate"),),
    )


def test_nested_boolean_children_only():
    # the NestedBooleanQuery.xml regression: grandchild clauses must
    # stay attached to the inner query
    q = P.parse("""
      <BooleanQuery fieldName="contents">
        <Clause occurs="should">
          <BooleanQuery fieldName="contents">
            <Clause occurs="must"><TermQuery>absent</TermQuery></Clause>
          </BooleanQuery>
        </Clause>
        <Clause occurs="should"><TermQuery>bank</TermQuery></Clause>
      </BooleanQuery>""")
    assert len(q.should) == 2
    assert q.should[0] == Q.BooleanQuery(
        must=(Q.TermQuery("contents", "absent"),)
    )
    assert q.must == ()


def test_terms_query_analyzes():
    q = P.parse('<TermsQuery fieldName="contents">Sumitomo BANK</TermsQuery>')
    assert q == Q.BooleanQuery(should=(
        Q.TermQuery("contents", "sumitomo"),
        Q.TermQuery("contents", "bank"),
    ))


def test_user_query_routes_classic_parser():
    q = P.parse('<UserQuery>"bank of england"</UserQuery>')
    assert isinstance(q, Q.PhraseQuery)
    assert q.terms == ("bank", "of", "england")


def test_range_query():
    q = P.parse('<RangeQuery fieldName="date" lowerTerm="19870409" '
                'upperTerm="19870412"/>')
    assert q == Q.TermRangeQuery("date", "19870409", "19870412")
    q2 = P.parse('<RangeQuery fieldName="date" lowerTerm="a" upperTerm="b" '
                 'includeUpper="false"/>')
    assert q2.include_upper is False and q2.include_lower is True


def test_point_range_query():
    pr = P.parse('<PointRangeQuery fieldName="age" lowerTerm="10" '
                 'upperTerm="20" type="long"/>')
    assert pr == PointRange("age", 10, 20, "long")


def test_constant_score_and_dismax():
    q = P.parse("""
      <ConstantScoreQuery>
        <RangeQuery fieldName="date" lowerTerm="a" upperTerm="b"/>
      </ConstantScoreQuery>""")
    assert isinstance(q, Q.ConstantScoreQuery)
    q2 = P.parse("""
      <DisjunctionMaxQuery tieBreaker="0.3">
        <TermQuery fieldName="a">merger</TermQuery>
        <TermQuery fieldName="b">verger</TermQuery>
      </DisjunctionMaxQuery>""")
    assert q2 == Q.DisjunctionMaxQuery(
        (Q.TermQuery("a", "merger"), Q.TermQuery("b", "verger")),
        tie_breaker=0.3,
    )


def test_match_all_docs_with_filter():
    q = P.parse("""
      <BooleanQuery>
        <Clause occurs="must"><MatchAllDocsQuery/></Clause>
        <Clause occurs="filter">
          <RangeQuery fieldName="date" lowerTerm="a" upperTerm="b"/>
        </Clause>
      </BooleanQuery>""")
    assert isinstance(q.must[0], Q.MatchAllQuery)
    assert isinstance(q.filter[0], Q.TermRangeQuery)


def test_span_tree():
    q = P.parse("""
      <SpanOr fieldName="contents">
        <SpanNear slop="8" inOrder="false">
          <SpanOr><SpanTerm>killed</SpanTerm><SpanTerm>died</SpanTerm></SpanOr>
          <SpanOrTerms>miner miners</SpanOrTerms>
        </SpanNear>
        <SpanFirst end="10"><SpanOrTerms>fire burn</SpanOrTerms></SpanFirst>
      </SpanOr>""")
    assert isinstance(q, Q.SpanQuery) and q.field == "contents"
    near, first = q.source.clauses
    assert near.slop == 8 and near.in_order is False
    assert near.clauses[1] == Q.SpanOr(
        (Q.SpanTerm("miner"), Q.SpanTerm("miners"))
    )
    assert first == Q.SpanFirst(
        Q.SpanOr((Q.SpanTerm("fire"), Q.SpanTerm("burn"))), end=10
    )


def test_span_not_and_position_range():
    q = P.parse("""
      <SpanNot fieldName="contents">
        <Include>
          <SpanNear slop="2" inOrder="true">
            <SpanTerm>social</SpanTerm><SpanTerm>services</SpanTerm>
          </SpanNear>
        </Include>
        <Exclude><SpanTerm>public</SpanTerm></Exclude>
      </SpanNot>""")
    assert q.source == Q.SpanNot(
        Q.SpanNear((Q.SpanTerm("social"), Q.SpanTerm("services")),
                   slop=2, in_order=True),
        Q.SpanTerm("public"),
    )
    q2 = P.parse("""
      <SpanPositionRange start="9" end="11" fieldName="contents">
        <SpanTerm>sugar</SpanTerm>
      </SpanPositionRange>""")
    assert q2.source == Q.SpanPositionRange(Q.SpanTerm("sugar"), 9, 11)


def test_boosting_term_query_is_payload_scored():
    q = P.parse('<BoostingTermQuery fieldName="contents">x</BoostingTermQuery>')
    assert q == Q.PayloadScoreQuery(
        "contents", Q.SpanTerm("x"), func="avg", include_span_score=True
    )


def test_fuzzy_like_this():
    q = P.parse("""
      <FuzzyLikeThisQuery>
        <Field fieldName="contents" minSimilarity="1">bankk</Field>
      </FuzzyLikeThisQuery>""")
    inner = q.should[0]
    assert isinstance(inner, Q.ScoringRewriteQuery)
    assert inner.query == Q.FuzzyQuery("contents", "bankk", max_edits=1,
                                       prefix_length=0)


# --------------------------------------------------------------------------
# error handling (CoreParser ParserException analogs)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("xml", [
    "<TermQuery fieldName='a'></TermQuery>",          # blank text
    "<NoSuchQuery>x</NoSuchQuery>",                   # unknown element
    "<BooleanQuery><TermQuery>x</TermQuery></BooleanQuery>",  # no Clause
    "<BooleanQuery><Clause occurs='nope'><TermQuery>x</TermQuery></Clause></BooleanQuery>",
    "<SpanNear><SpanTerm>a</SpanTerm></SpanNear>",    # missing slop
    "<TermQuery fieldName='a'>unclosed",              # malformed XML
    "<!DOCTYPE foo [<!ENTITY x 'y'>]><TermQuery fieldName='a'>&x;</TermQuery>",
])
def test_parse_errors(xml):
    with pytest.raises(ParseError):
        P.parse(xml)


# --------------------------------------------------------------------------
# search equivalence + SpanPositionRange kernel on a real index
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def xml_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    rng = np.random.default_rng(41)
    vocab = ["bank", "merger", "sumitomo", "rate", "fire", "sugar"]
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(4, 24)))
        for _ in range(90)
    ]
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
    )
    path = str(tmp_path_factory.mktemp("xmlq") / "idx")
    cfg = IndexConfig(
        field="text", content_col="text", analyzer="simple",
        doc_id_col="doc_id", docs_per_segment=45,
    )
    build_index(spark, spark.createDataFrame(pdf), path, cfg)
    return IndexReader(spark, path), docs


def _hits(reader, q, k=100):
    from lucene_spark.search.executor import IndexSearcher

    top = IndexSearcher(reader).search(q, k=k, prune=False)
    return [(h.doc_id, round(h.score, 5)) for h in top.hits]


def test_xml_bool_equals_programmatic(xml_index):
    reader, _ = xml_index
    xml_q = CoreParser("text").parse("""
      <BooleanQuery fieldName="text">
        <Clause occurs="must"><TermQuery>bank</TermQuery></Clause>
        <Clause occurs="should"><TermQuery>merger</TermQuery></Clause>
        <Clause occurs="mustnot"><TermQuery>sumitomo</TermQuery></Clause>
      </BooleanQuery>""")
    prog_q = Q.BooleanQuery(
        must=(Q.TermQuery("text", "bank"),),
        should=(Q.TermQuery("text", "merger"),),
        must_not=(Q.TermQuery("text", "sumitomo"),),
    )
    got = _hits(reader, xml_q)
    assert got == _hits(reader, prog_q)
    assert got  # non-trivial on this corpus


def test_span_position_range_vs_brute_force(xml_index):
    reader, docs = xml_index
    start, end = 3, 9
    q = CoreParser("text").parse(f"""
      <SpanPositionRange fieldName="text" start="{start}" end="{end}">
        <SpanTerm>sugar</SpanTerm>
      </SpanPositionRange>""")
    got = sorted(d for d, _ in _hits(reader, q))
    want = sorted(
        d for d, txt in enumerate(docs)
        if any(start <= i < end
               for i, t in enumerate(txt.split()) if t == "sugar")
    )
    assert got == want
    # and SpanFirst(end) == SpanPositionRange(0, end)
    f = _hits(reader, Q.SpanQuery("text", Q.SpanFirst(Q.SpanTerm("sugar"), 5)))
    pr = _hits(reader, Q.SpanQuery(
        "text", Q.SpanPositionRange(Q.SpanTerm("sugar"), 0, 5)))
    assert f == pr


def test_point_range_predicate(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3, 4], "age": [5, 10, 20, 25]})
    )
    pr = PointRange("age", 10, 20, "long")
    got = sorted(r["doc_id"] for r in df.filter(pr.predicate()).collect())
    assert got == [2, 3]
    half = PointRange("age", None, 10, "long")
    assert sorted(
        r["doc_id"] for r in df.filter(half.predicate()).collect()
    ) == [1, 2]
