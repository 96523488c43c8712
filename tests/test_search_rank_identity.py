"""Rank-identity: engine top-k must equal the full-scan oracle row for
row — docIDs AND float32 score bits (the CheckHits pattern, SURVEY.md §5).
The pruned (block-max) path must equal the unpruned path (TestWANDScorer
pattern). Query coverage per FIXTURES.md §2."""

import struct

import pytest

from lucene_spark import oracle as ORC
from lucene_spark.search import query as Q
from lucene_spark.search.executor import IndexSearcher

F = "content"

QUERIES = {
    # single rare term / single hot term
    "term_hot": Q.TermQuery(F, "class"),
    "term_mid": Q.TermQuery(F, "parse_writer_0"),
    "term_unicode": Q.TermQuery(F, "café"),
    "term_absent": Q.TermQuery(F, "zzz_not_in_corpus"),
    # conjunctions mixing hot+rare
    "and_2": Q.BooleanQuery(must=(Q.TermQuery(F, "class"), Q.TermQuery(F, "import"))),
    "and_3": Q.BooleanQuery(
        must=(Q.TermQuery(F, "class"), Q.TermQuery(F, "return"), Q.TermQuery(F, "def"))
    ),
    "and_with_rare": Q.BooleanQuery(
        must=(Q.TermQuery(F, "class"), Q.TermQuery(F, "café"))
    ),
    # disjunctions incl. all-hot (stresses WAND)
    "or_2": Q.BooleanQuery(should=(Q.TermQuery(F, "class"), Q.TermQuery(F, "café"))),
    "or_allhot": Q.BooleanQuery(
        should=tuple(Q.TermQuery(F, t) for t in ["class", "import", "return", "def", "if"])
    ),
    "or_10": Q.BooleanQuery(
        should=tuple(
            Q.TermQuery(F, t)
            for t in ["class", "import", "return", "def", "if", "else", "for",
                      "while", "static", "void"]
        )
    ),
    # MUST + MUST_NOT
    "not_q": Q.BooleanQuery(
        must=(Q.TermQuery(F, "class"),), must_not=(Q.TermQuery(F, "import"),)
    ),
    # minimumNumberShouldMatch=2
    "min_should_2": Q.BooleanQuery(
        should=(Q.TermQuery(F, "class"), Q.TermQuery(F, "café"), Q.TermQuery(F, "def")),
        min_should=2,
    ),
    # must + should (optional scoring clauses)
    "must_plus_should": Q.BooleanQuery(
        must=(Q.TermQuery(F, "class"),), should=(Q.TermQuery(F, "café"),)
    ),
    # filter clause: matches constrain, no score contribution
    "filter_q": Q.BooleanQuery(
        must=(Q.TermQuery(F, "class"),), filter=(Q.TermQuery(F, "import"),)
    ),
    # boost
    "boosted": Q.BooleanQuery(
        should=(Q.BoostQuery(Q.TermQuery(F, "class"), 2.5), Q.TermQuery(F, "import"))
    ),
    # synonym
    "synonym": Q.SynonymQuery(F, ("class", "struct")),
    # dismax
    "dismax": Q.DisjunctionMaxQuery(
        (Q.TermQuery(F, "class"), Q.TermQuery(F, "import")), tie_breaker=0.3
    ),
    # phrase
    "phrase_2": Q.PhraseQuery(F, ("class", "import")),
    # multi-term expansions (constant score)
    "prefix": Q.PrefixQuery(F, "parse"),
    "wildcard": Q.WildcardQuery(F, "b*er_1"),
    "fuzzy": Q.FuzzyQuery(F, "clasz", max_edits=1),
    "term_range": Q.TermRangeQuery(F, "class", "def"),
    "term_in_set": Q.TermInSetQuery(F, ("class", "struct", "impl")),
    "regexp": Q.RegexpQuery(F, "p[a-z]+_writer_[0-9]"),
    # constant score wrapper
    "const": Q.ConstantScoreQuery(Q.TermQuery(F, "class"), 3.0),
    # empty-analyzed / match none
    "match_none": Q.MatchNoDocsQuery(),
}


def bits(x: float) -> int:
    return struct.unpack("<I", struct.pack("<f", x))[0]


def assert_identical(engine_td, oracle_td, name):
    got = [(h.doc_id, bits(h.score)) for h in engine_td.hits]
    want = [(h.doc_id, bits(h.score)) for h in oracle_td.hits]
    assert got == want, (
        f"{name}: engine {[(h.doc_id, h.score) for h in engine_td.hits]} != "
        f"oracle {[(h.doc_id, h.score) for h in oracle_td.hits]}"
    )


@pytest.mark.parametrize("name", list(QUERIES))
def test_rank_identity(name, built_index, oracle_index):
    q = QUERIES[name]
    searcher = IndexSearcher(built_index)
    engine = searcher.search(q, k=10, prune=False)
    want = ORC.search(oracle_index, q, k=10)
    assert_identical(engine, want, name)
    # pruned path must be bit-identical to unpruned (WAND safety)
    pruned = searcher.search(q, k=10, prune=True)
    assert_identical(pruned, engine, f"{name}(pruned)")
    # MAXSCORE bulk scorer: the second pruning strategy, same safety
    ms = searcher.search(q, k=10, prune="maxscore")
    assert_identical(ms, engine, f"{name}(maxscore)")


def test_maxscore_wide_disjunctions(built_index):
    """Wide pure-term disjunctions — the shape where MAXSCORE's
    essential/non-essential partitioning actually prunes — must stay
    bit-identical to both the unpruned and the WAND paths."""
    import random

    searcher = IndexSearcher(built_index)
    vocab = ["class", "import", "def", "struct", "impl", "parse",
             "return", "self"]
    rng = random.Random(7)
    for _ in range(8):
        ts = rng.sample(vocab, rng.randint(3, 6))
        q = Q.BooleanQuery(should=tuple(Q.TermQuery(F, t) for t in ts))
        base = searcher.search(q, k=10, prune=False)
        for strat in (True, "maxscore"):
            got = searcher.search(q, k=10, prune=strat)
            assert_identical(got, base, f"{ts}({strat})")


def test_maxscore_actually_partitions(built_index, monkeypatch):
    """The essential/non-essential split must engage: at least one
    exact-scoring pass runs over a strict subset of the query's terms
    (the essential lists), and the result still equals WAND's."""
    import lucene_spark.search.executor as ex

    import numpy as np

    searcher = IndexSearcher(built_index)
    terms = ["class", "import", "def", "self", "return", "parse"]
    q = Q.BooleanQuery(should=tuple(Q.TermQuery(F, t) for t in terms))
    node = searcher._compile(q)
    pdf = (
        built_index.postings()
        .filter(built_index.postings().term.isin(terms))
        .toPandas()
    )
    calls = []
    orig = ex._exact_scores_for

    def spy(td, docs):
        calls.append(len(td))
        return orig(td, docs)

    monkeypatch.setattr(ex, "_exact_scores_for", spy)
    partitioned = False
    for _sid, grp in pdf.groupby("segment_id"):
        ctx = ex._SegmentIndex(grp.reset_index(drop=True))
        calls.clear()
        d_ms, s_ms = ex._maxscore_disjunction(node, ctx, 3)
        n_present = len({t for t in terms if ctx.has(t)})
        partitioned |= any(1 <= c < n_present for c in calls)
        d_w, s_w = ex._wand_disjunction(node, ctx, 3)
        top = np.lexsort((d_ms, -s_ms))[:3]
        topw = np.lexsort((d_w, -s_w))[:3]
        assert list(zip(d_ms[top], s_ms[top])) == list(
            zip(d_w[topw], s_w[topw])
        )
    assert partitioned, "non-essential partition never engaged"


def test_total_hits_exact_when_unpruned(built_index, oracle_index):
    searcher = IndexSearcher(built_index)
    q = QUERIES["or_allhot"]
    engine = searcher.search(q, k=10, prune=False)
    want = ORC.search(oracle_index, q, k=10)
    assert engine.total_hits == want.total_hits


def test_search_after_pagination(built_index, oracle_index):
    searcher = IndexSearcher(built_index)
    q = QUERIES["or_allhot"]
    page1 = searcher.search(q, k=10, prune=False)
    after = (page1.hits[-1].score, page1.hits[-1].doc_id)
    page2 = searcher.search(q, k=10, prune=False, search_after=after)
    # pages must be disjoint and ordered: page2 == oracle ranks 11..20
    want = ORC.search(oracle_index, q, k=20)
    assert [(h.doc_id, bits(h.score)) for h in page2.hits] == [
        (h.doc_id, bits(h.score)) for h in want.hits[10:20]
    ]


def test_match_all(built_index, oracle_index):
    searcher = IndexSearcher(built_index)
    td = searcher.search(Q.MatchAllQuery(), k=5)
    assert td.total_hits == len(oracle_index.doc_ids)
    assert [h.doc_id for h in td.hits] == [0, 1, 2, 3, 4]


def test_match_all_count_rides_manifest(built_index, monkeypatch):
    """Weight#count shortcut (Weight.java:198): with no deletions the
    MatchAll total comes from the manifest arithmetic — ZERO count
    jobs run (only the k-row collect)."""
    from pyspark.sql import DataFrame

    def _boom(self):
        raise AssertionError("count() job ran on the MatchAll path")

    monkeypatch.setattr(DataFrame, "count", _boom)
    searcher = IndexSearcher(built_index)
    td = searcher.search(Q.MatchAllQuery(), k=5)
    assert td.total_hits == built_index.manifest["num_docs_total"]
    assert [h.doc_id for h in td.hits] == [0, 1, 2, 3, 4]


def test_ties_break_by_doc_id(built_index):
    """Constant-score queries produce maximal ties: order must be doc_id ASC."""
    searcher = IndexSearcher(built_index)
    td = searcher.search(Q.PrefixQuery(F, "c"), k=10)
    docs = [h.doc_id for h in td.hits]
    assert docs == sorted(docs)
    assert len(set(h.score for h in td.hits)) == 1


def test_searcher_count_matches_exact_totals(built_index):
    """IndexSearcher.count(Query): every shortcut tier agrees with the
    exact (prune=False) collector total."""
    s = IndexSearcher(built_index)
    queries = [
        Q.MatchAllQuery(),
        Q.TermQuery(F, "class"),
        Q.BooleanQuery(
            must=(Q.TermQuery(F, "class"),),
            must_not=(Q.TermQuery(F, "import"),),
        ),
        Q.BooleanQuery(
            should=(Q.TermQuery(F, "class"), Q.TermQuery(F, "import"),
                    Q.TermQuery(F, "def")),
            min_should=2,
        ),
        Q.PrefixQuery(F, "parse"),
        # positional: exercises the kernel fallback tier
        Q.PhraseQuery(F, ("class", "import")),
    ]
    for q in queries:
        want = s.search(q, k=1, prune=False).total_hits
        assert s.count(q) == want, q


def test_match_all_search_after(built_index):
    """MatchAll pagination: the constant-score cursor resumes strictly
    after the last doc id; total_hits still counts every match."""
    searcher = IndexSearcher(built_index)
    page1 = searcher.search(Q.MatchAllQuery(), k=5)
    after = (page1.hits[-1].score, page1.hits[-1].doc_id)
    page2 = searcher.search(Q.MatchAllQuery(), k=5, search_after=after)
    assert [h.doc_id for h in page1.hits] == [0, 1, 2, 3, 4]
    assert [h.doc_id for h in page2.hits] == [5, 6, 7, 8, 9]
    assert page2.total_hits == page1.total_hits
