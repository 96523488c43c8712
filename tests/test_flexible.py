"""StandardQueryParser (flexible) goldens — parser output vs directly
constructed Query AST (queryparser/flexible/standard/
StandardQueryParser.java syntax per its class javadoc)."""

import pytest

from lucene_spark.search import query as Q
from lucene_spark.search.flexible import StandardQueryParser
from lucene_spark.search.queryparser import ParseError


def P(**kw):
    return StandardQueryParser(default_field="content", **kw)


def test_term_and_bool():
    assert P().parse("test") == Q.TermQuery("content", "test")
    assert P().parse("test AND results") == Q.BooleanQuery(
        must=(Q.TermQuery("content", "test"), Q.TermQuery("content", "results"))
    )
    assert P().parse("test OR suite OR results") == Q.BooleanQuery(
        should=(
            Q.TermQuery("content", "test"),
            Q.TermQuery("content", "suite"),
            Q.TermQuery("content", "results"),
        )
    )


def test_field_and_group_propagation():
    q = P().parse("title:test AND NOT title:complete")
    assert q == Q.BooleanQuery(
        must=(Q.TermQuery("title", "test"),),
        must_not=(Q.TermQuery("title", "complete"),),
    )
    q = P().parse("title:(pass fail skip)")
    assert q == Q.BooleanQuery(
        should=(
            Q.TermQuery("title", "pass"),
            Q.TermQuery("title", "fail"),
            Q.TermQuery("title", "skip"),
        )
    )
    # explicit field inside the group wins over the group prefix
    q = P().parse("title:(body:x y)")
    assert q == Q.BooleanQuery(
        should=(Q.TermQuery("body", "x"), Q.TermQuery("title", "y"))
    )


def test_phrase_slop_and_defaults():
    assert P().parse('"test failure"~4') == Q.PhraseQuery(
        "content", ("test", "failure"), slop=4
    )
    # setPhraseSlop default applies when the phrase has no explicit ~N
    assert P(phrase_slop=2).parse('"test failure"') == Q.PhraseQuery(
        "content", ("test", "failure"), slop=2
    )
    assert P(phrase_slop=2).parse('"test failure"~0') == Q.PhraseQuery(
        "content", ("test", "failure"), slop=0
    )


def test_wildcard_prefix_fuzzy_regexp_range():
    assert P().parse("tes*") == Q.PrefixQuery("content", "tes")
    assert P().parse("t?st*") == Q.WildcardQuery("content", "t?st*")
    assert P().parse("nest~2") == Q.FuzzyQuery("content", "nest", max_edits=2)
    assert P(fuzzy_max_edits=1).parse("nest~") == Q.FuzzyQuery(
        "content", "nest", max_edits=1
    )
    assert P().parse("/.est(s|ing)/") == Q.RegexpQuery("content", ".est(s|ing)")
    assert P().parse("name:[jones TO smith]") == Q.TermRangeQuery(
        "name", "jones", "smith", True, True
    )
    assert P().parse("score:{a TO *]") == Q.TermRangeQuery(
        "score", "a", None, False, True
    )


def test_leading_wildcard_gate():
    with pytest.raises(ParseError):
        P().parse("*est")
    assert P(allow_leading_wildcard=True).parse("*est") == Q.WildcardQuery(
        "content", "*est"
    )
    # bare * is MatchAll, not a leading wildcard error
    assert P().parse("*") == Q.MatchAllQuery()


def test_boost_and_escaping():
    # rewrite_fixpoint folds the BoostQuery wrapper into the term
    assert P().parse("jones^2") == Q.TermQuery("content", "jones", boost=2.0)
    q = P().parse(r"\:quoted\+term\:")
    # escaped specials reach the analyzer as plain text
    assert q == Q.PhraseQuery("content", ("quoted", "term"))


def test_min_should_match_group():
    q = P().parse("(blue crab fish)@2")
    assert q == Q.BooleanQuery(
        should=(
            Q.TermQuery("content", "blue"),
            Q.TermQuery("content", "crab"),
            Q.TermQuery("content", "fish"),
        ),
        min_should=2,
    )
    with pytest.raises(ParseError):
        P().parse("(+blue crab)@2")  # non-disjunction group
    # @ inside a bare word is term text (emails/handles), not the operator
    assert P().parse("blue@2") == Q.PhraseQuery("content", ("blue", "2"))


def test_multi_field_expansion():
    p = StandardQueryParser(
        multi_fields=("title", "body"),
    )
    assert p.parse("test") == Q.BooleanQuery(
        should=(Q.TermQuery("title", "test"), Q.TermQuery("body", "test"))
    )
    # explicit field suppresses expansion
    assert p.parse("title:test") == Q.TermQuery("title", "test")


def test_interval_functions():
    q = P().parse("fn:ordered(quick brown fox)")
    assert q == Q.IntervalQuery(
        "content",
        Q.IOrdered((Q.ITerm("quick"), Q.ITerm("brown"), Q.ITerm("fox"))),
    )
    q = P().parse("title:fn:maxwidth(5 fn:atLeast(2 quick brown fox))")
    assert q == Q.IntervalQuery(
        "title",
        Q.IAtLeast(
            (Q.ITerm("quick"), Q.ITerm("brown"), Q.ITerm("fox")),
            n=2,
            max_width=5,
        ),
    )
    q = P().parse("fn:maxgaps(3 fn:unordered(merge sort))")
    assert q == Q.IntervalQuery(
        "content",
        Q.IUnordered((Q.ITerm("merge"), Q.ITerm("sort")), max_gaps=3),
    )
    # within desugars per Intervals.java:509-512
    q = P().parse("fn:within(key 3 fast)")
    assert q == Q.IntervalQuery(
        "content",
        Q.IContainedBy(Q.ITerm("key"), Q.IExtend(Q.ITerm("fast"), 3, 3)),
    )
    q = P().parse("fn:notWithin(key 2 fast)")
    assert q == Q.IntervalQuery(
        "content",
        Q.INonOverlapping(Q.ITerm("key"), Q.IExtend(Q.ITerm("fast"), 2, 2)),
    )
    # or -> minimal union (atLeast 1); quoted arg -> phrase source
    q = P().parse('fn:or(fast "hash join")')
    assert q == Q.IntervalQuery(
        "content",
        Q.IAtLeast(
            (
                Q.ITerm("fast"),
                Q.IPhrase((Q.ITerm("hash"), Q.ITerm("join"))),
            ),
            n=1,
        ),
    )
    q = P().parse("fn:extend(fast 1 2)")
    assert q == Q.IntervalQuery(
        "content", Q.IExtend(Q.ITerm("fast"), 1, 2)
    )
    q = P().parse("fn:before(fast scan)")
    assert q == Q.IntervalQuery(
        "content", Q.IBefore(Q.ITerm("fast"), Q.ITerm("scan"))
    )
    q = P().parse("fn:containedBy(key fn:unordered(fast table))")
    assert q == Q.IntervalQuery(
        "content",
        Q.IContainedBy(
            Q.ITerm("key"),
            Q.IUnordered((Q.ITerm("fast"), Q.ITerm("table"))),
        ),
    )


def test_interval_fn_inside_boolean():
    q = P().parse("fn:ordered(fast scan) AND merge")
    assert q == Q.BooleanQuery(
        must=(
            Q.IntervalQuery(
                "content", Q.IOrdered((Q.ITerm("fast"), Q.ITerm("scan")))
            ),
            Q.TermQuery("content", "merge"),
        )
    )


def test_errors_are_parse_errors():
    for bad in (
        "(unbalanced",
        '"unclosed',
        "/unclosed",
        "fn:ordered(a",
        "fn:nosuch(a b)",
        "fn:maxgaps(fast)",  # missing int
        "name:[a TO",  # malformed range
        "test ^",  # dangling boost... actually ^ needs number
    ):
        with pytest.raises(ParseError):
            P().parse(bad)


def test_no_default_field_is_error():
    with pytest.raises(ParseError):
        StandardQueryParser().parse("test")


def test_unordered_no_overlaps_desugars():
    """Intervals.java:446-448: unorderedNoOverlaps(a, b) IS
    or(ordered(a b), ordered(b a)) — the desugared AST must be exact."""
    q = P().parse("fn:unorderedNoOverlaps(fast scan)")
    assert q == Q.IntervalQuery(
        "content",
        Q.IAtLeast(
            (
                Q.IOrdered((Q.ITerm("fast"), Q.ITerm("scan"))),
                Q.IOrdered((Q.ITerm("scan"), Q.ITerm("fast"))),
            ),
            n=1,
        ),
    )


def test_fn_pattern_sources():
    """fn:wildcard / fn:prefix / fn:fuzzyTerm parse to IMultiTerm
    leaves (MultiTermIntervalsSource; field bound at compile)."""
    q = P().parse("fn:wildcard(a?c)")
    assert q == Q.IntervalQuery(
        "content", Q.IMultiTerm(Q.WildcardQuery("content", "a?c"))
    )
    q = P().parse("title:fn:prefix(sca)")
    assert q == Q.IntervalQuery(
        "title", Q.IMultiTerm(Q.PrefixQuery("title", "sca"))
    )
    q = P().parse("fn:fuzzyTerm(tabel 1)")
    assert q == Q.IntervalQuery(
        "content", Q.IMultiTerm(Q.FuzzyQuery("content", "tabel", max_edits=1))
    )
    # nested inside a combinator
    q = P().parse("fn:ordered(fn:prefix(qu) fast)")
    src = q.source
    assert isinstance(src, Q.IOrdered)
    # nested fn args carry no field; the interval compile binds it
    assert src.sources[0] == Q.IMultiTerm(Q.PrefixQuery("", "qu"))
    with pytest.raises(ParseError):
        P().parse("fn:wildcard(a b)")
    with pytest.raises(ParseError):
        P().parse("fn:prefix(a 3)")
