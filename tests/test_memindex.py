"""MemoryIndex (memory module) — single-doc scores must be bit-identical
to the full engine's scores on the equivalent one-document index
(MemoryIndex.java's contract of behaving exactly like a real one-doc
IndexReader)."""

import numpy as np
import pytest

from lucene_spark.memory import MemoryIndex
from lucene_spark.search import query as Q

DOC = (
    "def parse_token(stream):\n"
    "    token = stream.read()\n"
    "    if token is None:\n"
    "        raise ValueError('empty stream')\n"
    "    return token.strip().lower()\n"
)


@pytest.fixture(scope="module")
def one_doc_searcher(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader, IndexSearcher

    idx = str(tmp_path_factory.mktemp("memidx") / "idx")
    src = spark.createDataFrame(
        [("r0", "a.py", "c0", "py", DOC)],
        "repo string, path string, commit string, lang string, content string",
    )
    build_index(spark, src, idx, IndexConfig())
    return IndexSearcher(IndexReader(spark, idx))


@pytest.fixture(scope="module")
def mem():
    m = MemoryIndex()
    m.add_field("content", DOC)
    return m


QUERIES = [
    Q.TermQuery("content", "token"),
    Q.TermQuery("content", "stream"),
    Q.SynonymQuery("content", ("token", "stream")),
    Q.PhraseQuery("content", ("token", "stream")),  # no match
    Q.PhraseQuery("content", ("parse", "token")),
    Q.PhraseQuery("content", ("token", "stream"), slop=2),
    Q.MultiPhraseQuery("content", (("parse", "return"), ("token",))),
    Q.NearQuery("content", "stream", "read", window=3),
    Q.PrefixQuery("content", "tok"),
    Q.WildcardQuery("content", "s*eam"),
    Q.RegexpQuery("content", "t.k.n"),
    Q.FuzzyQuery("content", "tokan", max_edits=1),
    Q.TermRangeQuery("content", "read", "strip", True, True),
    Q.TermInSetQuery("content", ("token", "missing", "lower")),
    Q.DisjunctionMaxQuery(
        (Q.TermQuery("content", "token"), Q.TermQuery("content", "stream")),
        tie_breaker=0.3,
    ),
    Q.BoostQuery(Q.TermQuery("content", "token"), 2.5),
    Q.ConstantScoreQuery(Q.TermQuery("content", "stream")),
    Q.BooleanQuery(
        must=(Q.TermQuery("content", "token"),),
        should=(Q.TermQuery("content", "lower"),),
        must_not=(Q.TermQuery("content", "missing"),),
    ),
    Q.BooleanQuery(
        should=(
            Q.TermQuery("content", "token"),
            Q.TermQuery("content", "stream"),
            Q.TermQuery("content", "missing"),
        ),
        min_should=2,
    ),
    Q.IntervalQuery(
        "content",
        Q.IOrdered((Q.ITerm("token"), Q.ITerm("stream")), max_gaps=4),
    ),
    Q.SpanQuery(
        "content",
        Q.SpanNear((Q.SpanTerm("stream"), Q.SpanTerm("read")), slop=2, in_order=True),
    ),
    Q.TermQuery("content", "absent_term"),  # no match
    Q.BooleanQuery(must=(Q.TermQuery("content", "token"),
                         Q.TermQuery("content", "absent_term"))),  # no match
]


@pytest.mark.parametrize("q", QUERIES, ids=lambda q: type(q).__name__)
def test_score_parity_with_one_doc_engine(one_doc_searcher, mem, q):
    td = one_doc_searcher.search(q, k=5)
    engine = float(np.float32(td.hits[0].score)) if td.hits else 0.0
    assert mem.search(q) == engine


def test_query_string_and_matches(mem):
    assert mem.matches("token AND stream")
    assert not mem.matches("token AND missing")
    # "stream.read" is ONE token under exact UAX#29 ('.' is MidNumLet,
    # joins letters — reference StandardTokenizer does the same), so a
    # two-term phrase can't match it; use a whitespace adjacency
    assert mem.search('"empty stream"') > 0.0


def test_multi_value_append_positions():
    m = MemoryIndex()
    m.add_field("content", "alpha beta")
    m.add_field("content", "gamma delta")
    # positions concatenate: beta(1) .. gamma(2) are adjacent (gap 0)
    assert m.matches(Q.PhraseQuery("content", ("beta", "gamma")))
    assert m.matches(Q.PhraseQuery("content", ("alpha", "beta")))
    assert not m.matches(Q.PhraseQuery("content", ("alpha", "gamma")))
    # field length is the total token count across values (norm parity)
    single = MemoryIndex()
    single.add_field("content", "alpha beta gamma delta")
    q = Q.TermQuery("content", "beta")
    assert m.search(q) == single.search(q)


def test_multi_field_isolation():
    m = MemoryIndex()
    m.add_field("title", "spark engine")
    m.add_field("body", "lucene index")
    assert m.matches(Q.TermQuery("title", "spark"))
    assert not m.matches(Q.TermQuery("body", "spark"))
    assert m.matches(Q.TermQuery("body", "index"))
    assert m.search(Q.MatchAllQuery(boost=1.5)) == float(np.float32(1.5))


def test_reset_recycles():
    m = MemoryIndex()
    m.add_field("content", "one two")
    assert m.matches(Q.TermQuery("content", "one"))
    m.reset()
    assert not m.matches(Q.TermQuery("content", "one"))
    m.add_field("content", "three")
    assert m.matches(Q.TermQuery("content", "three"))


def test_per_field_analyzer():
    m = MemoryIndex()
    m.add_field("stemmed", "running quickly", analyzer="english")
    assert m.matches(Q.TermQuery("stemmed", "run"))
