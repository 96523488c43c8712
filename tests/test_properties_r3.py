"""Randomized property tests (the LuceneTestCase/RandomizedRunner
pillar, SURVEY.md §5) for the late round-3 kernels: connected
components vs a union-find reference, the banded Levenshtein vs the
full DP, and parser fuzzing (flexible parser: ParseError or Query,
never another exception; SimpleQueryParser: never throws at all)."""

import pytest
from hypothesis import given, settings, strategies as st


# ---- connected components vs union-find -----------------------------------


class _UF:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


pairs_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
        lambda ab: ab[0] != ab[1]
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=12, deadline=None)
@given(pairs=pairs_strategy)
def test_connected_components_matches_union_find(spark, pairs):
    from lucene_spark.pipeline.dedup import connected_components

    uf = _UF()
    for a, b in pairs:
        uf.union(a, b)
    want = {n: uf.find(n) for ab in pairs for n in ab}
    got = {
        r["node"]: r["comp"]
        for r in connected_components(
            spark.createDataFrame(pairs, ["a", "b"])
        ).collect()
    }
    assert got == want


# ---- banded Levenshtein vs full DP -----------------------------------------


def _lev(a: str, b: str) -> int:
    d = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, d[0] = d[0], i
        for j, cb in enumerate(b, 1):
            prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1, prev + (ca != cb))
    return d[len(b)]


@settings(max_examples=300, deadline=None)
@given(
    a=st.text(alphabet="abcd", max_size=8),
    b=st.text(alphabet="abcd", max_size=8),
    k=st.integers(0, 3),
)
def test_within_edits_equals_full_dp(a, b, k):
    from lucene_spark.streaming.percolator import _within_edits

    assert _within_edits(a, b, k) == (_lev(a, b) <= k)


# ---- parser fuzzing ---------------------------------------------------------


_QUERY_CHARS = 'abc ()"+-|*?~:^@/[]{}\\123 TO AND OR NOT fn'


@settings(max_examples=300, deadline=None)
@given(s=st.text(alphabet=_QUERY_CHARS, max_size=40))
def test_flexible_parser_total(s):
    """StandardQueryParser: every input either parses to a Query or
    raises ParseError — nothing else escapes."""
    from lucene_spark.search import query as Q
    from lucene_spark.search.flexible import StandardQueryParser
    from lucene_spark.search.queryparser import ParseError

    try:
        q = StandardQueryParser("content").parse(s)
    except ParseError:
        return
    assert isinstance(q, Q.Query)


@settings(max_examples=300, deadline=None)
@given(s=st.text(alphabet=_QUERY_CHARS, max_size=40))
def test_simple_parser_never_throws(s):
    """SimpleQueryParser's contract: ANY input produces a query."""
    from lucene_spark.search import query as Q
    from lucene_spark.search.queryparser import SimpleQueryParser

    q = SimpleQueryParser("content").parse(s)
    assert isinstance(q, Q.Query)
