"""Classic query-parser tests — grammar and clause-occur semantics
mirror queryparser/classic (TestQueryParser patterns)."""

import pytest

from lucene_spark.search import query as Q
from lucene_spark.search.queryparser import ParseError, QueryParser

P = QueryParser("body")


def test_single_term():
    assert P.parse("Hello") == Q.TermQuery("body", "hello")


def test_two_terms_default_or():
    q = P.parse("hello world")
    assert isinstance(q, Q.BooleanQuery)
    assert q.should == (Q.TermQuery("body", "hello"), Q.TermQuery("body", "world"))
    assert not q.must


def test_and_promotes_both_sides():
    q = P.parse("a AND b")
    assert q.must == (Q.TermQuery("body", "a"), Q.TermQuery("body", "b"))
    assert not q.should


def test_plus_minus():
    q = P.parse("+a -b c")
    assert q.must == (Q.TermQuery("body", "a"),)
    assert q.must_not == (Q.TermQuery("body", "b"),)
    assert q.should == (Q.TermQuery("body", "c"),)


def test_not_keyword():
    q = P.parse("a NOT b")
    assert q.should == (Q.TermQuery("body", "a"),)
    assert q.must_not == (Q.TermQuery("body", "b"),)
    q2 = P.parse("a AND NOT b")
    assert q2.must == (Q.TermQuery("body", "a"),)
    assert q2.must_not == (Q.TermQuery("body", "b"),)


def test_field_prefix():
    assert P.parse("title:Spark") == Q.TermQuery("title", "spark")


def test_phrase_and_slop():
    q = P.parse('"Quick Fox"')
    assert q == Q.PhraseQuery("body", ("quick", "fox"))
    q2 = P.parse('"quick fox"~2')
    assert q2 == Q.PhraseQuery("body", ("quick", "fox"), slop=2)


def test_single_word_phrase_collapses_to_term():
    assert P.parse('"spark"') == Q.TermQuery("body", "spark")


def test_prefix_wildcard_fuzzy():
    assert P.parse("spar*") == Q.PrefixQuery("body", "spar")
    assert P.parse("s?ark*") == Q.WildcardQuery("body", "s?ark*")
    assert P.parse("spark~1") == Q.FuzzyQuery("body", "spark", max_edits=1)
    assert P.parse("spark~") == Q.FuzzyQuery("body", "spark", max_edits=2)


def test_range_queries():
    assert P.parse("[aaa TO bbb]") == Q.TermRangeQuery("body", "aaa", "bbb", True, True)
    assert P.parse("{aaa TO bbb}") == Q.TermRangeQuery("body", "aaa", "bbb", False, False)
    assert P.parse("[* TO bbb]") == Q.TermRangeQuery("body", None, "bbb", True, True)


def test_boost():
    # BoostQuery folds into TermQuery.boost at rewrite (BoostQuery.rewrite)
    assert P.parse("spark^2") == Q.TermQuery("body", "spark", boost=2.0)
    q = P.parse('"quick fox"^3')
    assert isinstance(q, Q.BoostQuery) and q.boost == 3.0


def test_grouping_parens():
    q = P.parse("(a OR b) AND c")
    assert isinstance(q, Q.BooleanQuery)
    assert len(q.must) == 2
    inner, c = q.must
    assert isinstance(inner, Q.BooleanQuery)
    assert inner.should == (Q.TermQuery("body", "a"), Q.TermQuery("body", "b"))
    assert c == Q.TermQuery("body", "c")


def test_multi_token_word_becomes_phrase():
    # analyzer splits foo-bar into two tokens -> phrase (getFieldQuery)
    assert P.parse("foo-bar") == Q.PhraseQuery("body", ("foo", "bar"))


def test_pure_negation_rewrites_to_match_none():
    assert isinstance(P.parse("-a"), Q.MatchNoDocsQuery)


def test_unbalanced_paren_raises():
    with pytest.raises(ParseError):
        P.parse("(a OR b")


def test_parsed_query_executes(spark):
    """End-to-end: parse -> execute through the engine matches the
    directly-constructed AST result."""
    from lucene_spark.gate import ensure_index
    from lucene_spark.search.executor import IndexSearcher

    r = ensure_index(spark, "/root/testdata/sf0.001")
    s = IndexSearcher(r)
    parsed = QueryParser("text").parse("table AND spark")
    direct = Q.BooleanQuery(
        must=(Q.TermQuery("text", "table"), Q.TermQuery("text", "spark"))
    )
    got = s.search(parsed, k=10)
    want = s.search(direct, k=10)
    assert [(h.doc_id, h.score) for h in got.hits] == [
        (h.doc_id, h.score) for h in want.hits
    ]
    assert got.hits


# --------------------------------------------------------------------------
# SimpleQueryParser (queryparser/simple/SimpleQueryParser.java role)
# --------------------------------------------------------------------------


def _sqp(default_operator="or"):
    from lucene_spark.search.queryparser import SimpleQueryParser

    return SimpleQueryParser("text", default_operator=default_operator)


def test_sqp_operators():
    from lucene_spark.search import query as Q

    p = _sqp()
    q = p.parse("foo + bar")
    assert isinstance(q, Q.BooleanQuery) and len(q.must) == 2
    q = p.parse("foo | bar")
    assert isinstance(q, Q.BooleanQuery) and len(q.should) == 2
    q = p.parse("foo bar")  # default OR
    assert isinstance(q, Q.BooleanQuery) and len(q.should) == 2
    q = _sqp("and").parse("foo bar")  # default AND
    assert isinstance(q, Q.BooleanQuery) and len(q.must) == 2
    q = p.parse("-foo")
    assert isinstance(q, Q.BooleanQuery) and len(q.must_not) == 1


def test_sqp_precedence_plus_over_or():
    from lucene_spark.search import query as Q

    q = _sqp().parse("a + b | c")
    assert isinstance(q, Q.BooleanQuery) and len(q.should) == 2
    left, right = q.should
    assert isinstance(left, Q.BooleanQuery) and len(left.must) == 2
    assert isinstance(right, Q.TermQuery)


def test_sqp_phrase_prefix_fuzzy():
    from lucene_spark.search import query as Q

    p = _sqp()
    assert _sqp().parse('"quick fox"') == Q.PhraseQuery(
        "text", ("quick", "fox")
    )
    assert p.parse('"quick fox"~2').slop == 2
    assert p.parse("fo*") == Q.PrefixQuery("text", "fo")
    fz = p.parse("foo~1")
    assert isinstance(fz, Q.FuzzyQuery) and fz.max_edits == 1


def test_sqp_grouping():
    from lucene_spark.search import query as Q

    q = _sqp().parse("(a | b) + c")
    assert isinstance(q, Q.BooleanQuery) and len(q.must) == 2


@pytest.mark.parametrize(
    "bad",
    ['"unclosed phrase', "((a", "a )", "*", "~", "+", "-", "", "a + | b",
     "| a", "a |", "+a", '""', "()", "(((", ")))", '-"', "a~x"],
)
def test_sqp_never_throws(bad):
    """The reference contract: ANY input produces a query, no errors."""
    from lucene_spark.search import query as Q

    q = _sqp().parse(bad)
    assert isinstance(q, Q.Query)


def test_sqp_unclosed_phrase_swallows_rest():
    from lucene_spark.search import query as Q

    q = _sqp().parse('"unclosed phrase')
    assert q == Q.PhraseQuery("text", ("unclosed", "phrase"))


def test_sqp_parsed_query_executes(spark, built_index):
    from lucene_spark.search.executor import IndexSearcher
    from lucene_spark.search.queryparser import SimpleQueryParser

    p = SimpleQueryParser("content")
    top = IndexSearcher(built_index).search(p.parse("def + return"), k=5)
    assert top.total_hits > 0


# --------------------------------------------------------------------------
# ComplexPhraseQueryParser (queryparser/complexPhrase)
# --------------------------------------------------------------------------


def test_complex_phrase_wildcard_and_group():
    from lucene_spark.search.queryparser import ComplexPhraseQueryParser

    p = ComplexPhraseQueryParser("text")
    q = p.parse('"(john jon jona*) peters*"~2')
    assert q == Q.SpanQuery(
        "text",
        Q.SpanNear(
            (
                Q.SpanOr((
                    Q.SpanTerm("john"), Q.SpanTerm("jon"),
                    Q.SpanMulti(Q.PrefixQuery("text", "jona")),
                )),
                Q.SpanMulti(Q.PrefixQuery("text", "peters")),
            ),
            slop=2, in_order=True,
        ),
    )


def test_complex_phrase_fuzzy_slot():
    from lucene_spark.search.queryparser import ComplexPhraseQueryParser

    q = ComplexPhraseQueryParser("text").parse('"smith~ street"')
    assert q == Q.SpanQuery(
        "text",
        Q.SpanNear(
            (
                Q.SpanMulti(Q.FuzzyQuery("text", "smith", max_edits=2)),
                Q.SpanTerm("street"),
            ),
            slop=0, in_order=True,
        ),
    )


def test_complex_phrase_single_slot_degrades():
    from lucene_spark.search.queryparser import ComplexPhraseQueryParser

    p = ComplexPhraseQueryParser("text")
    assert p.parse('"john"') == Q.TermQuery("text", "john")
    assert p.parse('"jo*"') == Q.PrefixQuery("text", "jo")


def test_complex_phrase_negative_clause():
    from lucene_spark.search.queryparser import ComplexPhraseQueryParser

    q = ComplexPhraseQueryParser("text").parse('"fred -smith jones"~1')
    inc = Q.SpanNear(
        (Q.SpanTerm("fred"), Q.SpanTerm("jones")), slop=2, in_order=True
    )
    exc = Q.SpanNear(
        (Q.SpanTerm("fred"), Q.SpanTerm("smith"), Q.SpanTerm("jones")),
        slop=1, in_order=True,
    )
    assert q == Q.SpanQuery("text", Q.SpanNot(inc, exc))


def test_complex_phrase_outside_phrase_is_classic():
    from lucene_spark.search.queryparser import ComplexPhraseQueryParser

    p = ComplexPhraseQueryParser("text")
    assert p.parse("alpha AND beta") == Q.BooleanQuery(
        must=(Q.TermQuery("text", "alpha"), Q.TermQuery("text", "beta"))
    )


# ---------------------------------------------------------------------------
# queryparser/ext — ExtendableQueryParser (TestExtendableQueryParser.java
# shapes: unknown keys fall through to classic, registered keys dispatch,
# escaped field tokens resolve the real field, build/split round-trip)
# ---------------------------------------------------------------------------


def _ext_parser():
    from lucene_spark.search.extparser import (
        ExtendableQueryParser,
        Extensions,
        ParserExtension,
    )
    from lucene_spark.search import query as Q

    class LowercaseTermExtension(ParserExtension):
        def parse(self, q):
            return Q.TermQuery(q.field, q.raw_term.lower())

    exts = Extensions()
    exts.add("testExt", LowercaseTermExtension())
    return ExtendableQueryParser("content", exts), exts


def test_ext_unknown_key_is_classic():
    from lucene_spark.search import query as Q

    p, _ = _ext_parser()
    assert p.parse("other:hello") == Q.TermQuery("other", "hello")
    assert p.parse("hello") == Q.TermQuery("content", "hello")


def test_ext_default_field_dispatch():
    from lucene_spark.search import query as Q

    # '\:key:term' -> field part empty -> default field + extension
    p, _ = _ext_parser()
    assert p.parse(r"\:testExt:HELLO") == Q.TermQuery("content", "hello")


def test_ext_explicit_field_dispatch():
    from lucene_spark.search import query as Q

    p, _ = _ext_parser()
    assert p.parse(r"aField\:testExt:HELLO") == Q.TermQuery("aField", "hello")


def test_ext_composes_with_boolean_grammar():
    from lucene_spark.search import query as Q

    p, _ = _ext_parser()
    q = p.parse(r"+\:testExt:ABC normal")
    # the extension query participates as a normal clause
    flat = repr(q)
    assert "abc" in flat and "normal" in flat


def test_ext_build_split_roundtrip():
    p, exts = _ext_parser()
    built = exts.build_extension_field("testExt", "aField")
    assert built == r"aField\:testExt"
    # unescape like the parser does, then split
    unescaped = built.replace("\\:", ":")
    assert exts.split_extension_field("content", unescaped) == (
        "aField", "testExt",
    )
    assert exts.split_extension_field("content", ":k") == ("content", "k")
    assert exts.split_extension_field("content", "plain") == ("plain", None)
