"""PrecedenceQueryParser (queryparser/flexible/precedence/
PrecedenceQueryParser.java + processors/
BooleanModifiersQueryNodeProcessor.java), mirrored from the
reference's TestPrecedenceQueryParser equality pairs."""

import pytest

from lucene_spark.search import query as Q
from lucene_spark.search.flexible import ParseError, PrecedenceQueryParser


@pytest.fixture()
def p():
    return PrecedenceQueryParser("field")


def eq(p, a, b):
    assert p.parse(a) == p.parse(b), (a, b, p.parse(a), p.parse(b))


# TestPrecedenceQueryParser.testPrecedence (default OR)
def test_precedence_pairs(p):
    eq(p, "A AND B OR C AND D", "(A AND B) OR (C AND D)")
    eq(p, "A OR B C", "(A B) C")
    eq(p, "A AND B C", "(+A +B) C")
    eq(p, "A AND NOT B", "+A -B")
    eq(p, "A OR NOT B", "A -B")
    eq(p, "A OR NOT B AND C", "A (-B +C)")


def test_precedence_pairs_default_and(p):
    p.set_default_operator("and")
    eq(p, "A AND B OR C AND D", "(A AND B) OR (C AND D)")
    eq(p, "A AND B C", "(A B) C")
    eq(p, "A AND B C", "(+A +B) C")
    eq(p, "A AND NOT B", "+A -B")
    eq(p, "A AND NOT B OR C", "(+A -B) OR C")


# testSimple subset that distinguishes this parser from the classic one
def test_simple_goldens(p):
    q = p.parse("a AND b")
    assert isinstance(q, Q.BooleanQuery) and len(q.must) == 2
    q = p.parse("c OR (a AND b)")
    assert len(q.should) == 2 and isinstance(q.should[1], Q.BooleanQuery)
    q = p.parse("a AND -b")
    assert len(q.must) == 1 and len(q.must_not) == 1
    q = p.parse("a && ! b")
    assert len(q.must) == 1 and len(q.must_not) == 1
    q = p.parse("a OR b")
    assert len(q.should) == 2 and not q.must
    q = p.parse("+term -term term")
    assert (len(q.must), len(q.must_not), len(q.should)) == (1, 1, 1)
    assert isinstance(p.parse("hello"), Q.TermQuery)
    assert isinstance(p.parse('"hello there"'), Q.PhraseQuery)


def test_field_and_boost_atoms(p):
    # "+title:(dog OR cat) -author:\"bob dole\"" keeps the OR group
    q = p.parse('+title:(dog OR cat) -author:"bob dole"')
    assert len(q.must) == 1 and len(q.must_not) == 1
    grp = q.must[0]
    assert isinstance(grp, Q.BooleanQuery) and len(grp.should) == 2
    assert all(c.field == "title" for c in grp.should)
    b = p.parse("germ term^2.0")
    assert len(b.should) == 2


def test_or_binds_tighter_than_juxtaposition(p):
    # the headline difference vs the classic/standard parser
    q = p.parse("A OR B C")
    assert len(q.should) == 2
    assert isinstance(q.should[0], Q.BooleanQuery)
    assert isinstance(q.should[1], Q.TermQuery)


def test_default_operator_validation(p):
    with pytest.raises(ValueError):
        p.set_default_operator("xor")


def test_malformed_still_raises(p):
    with pytest.raises(ParseError):
        p.parse("a AND (b OR c")
