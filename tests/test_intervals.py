"""Intervals algebra vs a brute-force minimal-interval reference.

The reference enumerates EVERY valid combination interval and reduces
to the minimal set by the generic definition (no other interval nested
inside) — the IntervalIterator contract of
queries/intervals/IntervalsSource. The engine's vectorized left-anchored
construction must produce exactly that set on every doc.
"""

import numpy as np
import pytest

from lucene_spark.search import query as Q


# --------------------------------------------------------------------------
# brute-force reference (per doc, positions per term)
# --------------------------------------------------------------------------


def _ref_eval(src, pos: dict[str, list[int]]):
    """-> set of (start, end) minimal intervals for one doc."""
    if isinstance(src, Q.ITerm):
        return {(p, p) for p in pos.get(src.term, [])}
    if isinstance(src, (Q.IOrdered, Q.IUnordered)):
        subs = [_ref_eval(c, pos) for c in src.sources]
        if any(not s for s in subs):
            return set()
        cands = set()
        import itertools

        for combo in itertools.product(*subs):
            if isinstance(src, Q.IOrdered):
                ok = all(
                    combo[i + 1][0] > combo[i][1] for i in range(len(combo) - 1)
                )
                if not ok:
                    continue
                s, e = combo[0][0], combo[-1][1]
            else:
                s = min(c[0] for c in combo)
                e = max(c[1] for c in combo)
            cands.add((s, e))
        out = _minimal(cands)
        if src.max_width >= 0:
            out = {(s, e) for s, e in out if e - s + 1 <= src.max_width}
        if src.max_gaps >= 0:
            n = len(src.sources)
            out = {(s, e) for s, e in out if (e - s + 1) - n <= src.max_gaps}
        return out
    if isinstance(src, Q.IAtLeast):
        import itertools

        subs = [_ref_eval(c, pos) for c in src.sources]
        cands = set()
        for combo_idx in itertools.combinations(range(len(subs)), src.n):
            chosen = [subs[i] for i in combo_idx]
            if any(not s for s in chosen):
                continue
            for combo in itertools.product(*chosen):
                s = min(c[0] for c in combo)
                e = max(c[1] for c in combo)
                cands.add((s, e))
        out = _minimal(cands)
        if src.max_width >= 0:
            out = {(s, e) for s, e in out if e - s + 1 <= src.max_width}
        return out
    if isinstance(src, Q.IContainedBy):
        small = _ref_eval(src.small, pos)
        big = _ref_eval(src.big, pos)
        return {
            (ss, se)
            for ss, se in small
            if any(bs <= ss and se <= be for bs, be in big)
        }
    if isinstance(src, Q.IContaining):
        small = _ref_eval(src.small, pos)
        big = _ref_eval(src.big, pos)
        return {
            (bs, be)
            for bs, be in big
            if any(bs <= ss and se <= be for ss, se in small)
        }
    if isinstance(src, Q.IExtend):
        sub = _ref_eval(src.source, pos)
        # NOT minimalized, like Intervals.extend
        return {(max(0, s - src.before), e + src.after) for s, e in sub}
    if isinstance(src, Q.IBefore):
        sub = _ref_eval(src.source, pos)
        ref = _ref_eval(src.reference, pos)
        return {(s, e) for s, e in sub if any(rs > e for rs, _ in ref)}
    if isinstance(src, Q.IAfter):
        sub = _ref_eval(src.source, pos)
        ref = _ref_eval(src.reference, pos)
        return {(s, e) for s, e in sub if any(re < s for _, re in ref)}
    if isinstance(src, Q.INonOverlapping):
        sub = _ref_eval(src.source, pos)
        ref = _ref_eval(src.reference, pos)
        return {
            (s, e)
            for s, e in sub
            if not any(rs <= e and re >= s for rs, re in ref)
        }
    if isinstance(src, Q.IOverlapping):
        sub = _ref_eval(src.source, pos)
        ref = _ref_eval(src.reference, pos)
        return {
            (s, e)
            for s, e in sub
            if any(rs <= e and re >= s for rs, re in ref)
        }
    if isinstance(src, Q.INotContaining):
        big = _ref_eval(src.big, pos)
        small = _ref_eval(src.small, pos)
        return {
            (bs, be)
            for bs, be in big
            if not any(bs <= ss and se <= be for ss, se in small)
        }
    if isinstance(src, Q.IPhrase):
        import itertools

        subs = [_ref_eval(c, pos) for c in src.sources]
        if any(not x for x in subs):
            return set()
        cands = set()
        for combo in itertools.product(*subs):
            if all(
                combo[i + 1][0] == combo[i][1] + 1
                for i in range(len(combo) - 1)
            ):
                cands.add((combo[0][0], combo[-1][1]))
        return _minimal(cands)
    raise TypeError(src)


def _minimal(cands: set) -> set:
    return {
        (s, e)
        for s, e in cands
        if not any(
            (s2, e2) != (s, e) and s <= s2 and e2 <= e for s2, e2 in cands
        )
    }


def _ref_match(src, toks: list[str]) -> bool:
    pos: dict[str, list[int]] = {}
    for i, t in enumerate(toks):
        pos.setdefault(t, []).append(i)
    return bool(_ref_eval(src, pos))


# --------------------------------------------------------------------------
# random corpus
# --------------------------------------------------------------------------

VOCAB = ["aa", "bb", "cc", "dd", "ee"]


@pytest.fixture(scope="module")
def interval_index(spark, tmp_path_factory):
    import pandas as pd

    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    rng = np.random.default_rng(7)
    docs = [
        " ".join(rng.choice(VOCAB, size=rng.integers(4, 40)))
        for _ in range(120)
    ]
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
    )
    path = str(tmp_path_factory.mktemp("iv") / "idx")
    cfg = IndexConfig(
        field="text", content_col="text", analyzer="simple",
        doc_id_col="doc_id", docs_per_segment=40,
    )
    build_index(spark, spark.createDataFrame(pdf), path, cfg)
    return IndexReader(spark, path), docs


SOURCES = [
    Q.IOrdered((Q.ITerm("aa"), Q.ITerm("bb")), max_gaps=2),
    Q.IOrdered((Q.ITerm("aa"), Q.ITerm("bb"), Q.ITerm("cc")), max_gaps=3),
    Q.IOrdered((Q.ITerm("bb"), Q.ITerm("aa"), Q.ITerm("dd")), max_width=8),
    Q.IUnordered((Q.ITerm("aa"), Q.ITerm("cc")), max_width=4),
    Q.IUnordered((Q.ITerm("aa"), Q.ITerm("bb"), Q.ITerm("dd")), max_width=7),
    Q.IContainedBy(
        Q.ITerm("cc"), Q.IUnordered((Q.ITerm("aa"), Q.ITerm("bb")), max_width=6)
    ),
    Q.IContaining(
        Q.IUnordered((Q.ITerm("aa"), Q.ITerm("dd")), max_width=9), Q.ITerm("ee")
    ),
    Q.IOrdered(
        (Q.IUnordered((Q.ITerm("aa"), Q.ITerm("bb")), max_width=4), Q.ITerm("cc")),
        max_width=10,
    ),
    Q.IAtLeast((Q.ITerm("aa"), Q.ITerm("bb"), Q.ITerm("cc")), n=2, max_width=3),
    Q.IAtLeast((Q.ITerm("aa"), Q.ITerm("dd"), Q.ITerm("ee"), Q.ITerm("cc")), n=3, max_width=6),
    # a missing term must not kill atLeast when n others can still match
    Q.IAtLeast((Q.ITerm("aa"), Q.ITerm("zzzz"), Q.ITerm("bb")), n=2, max_width=4),
    # r03 combinators (Intervals.java:395-590)
    Q.IBefore(Q.ITerm("aa"), Q.ITerm("dd")),
    Q.IAfter(Q.ITerm("bb"), Q.ITerm("ee")),
    Q.IBefore(
        Q.IUnordered((Q.ITerm("aa"), Q.ITerm("bb")), max_width=5), Q.ITerm("cc")
    ),
    Q.INonOverlapping(
        Q.IUnordered((Q.ITerm("aa"), Q.ITerm("bb")), max_width=4), Q.ITerm("cc")
    ),
    Q.IOverlapping(
        Q.IUnordered((Q.ITerm("aa"), Q.ITerm("bb")), max_width=4), Q.ITerm("cc")
    ),
    Q.INotContaining(
        Q.IUnordered((Q.ITerm("aa"), Q.ITerm("dd")), max_width=6), Q.ITerm("ee")
    ),
    Q.IContainedBy(Q.ITerm("cc"), Q.IExtend(Q.ITerm("aa"), 2, 2)),
    Q.IContaining(Q.IExtend(Q.ITerm("bb"), 1, 3), Q.ITerm("dd")),
    Q.IPhrase((Q.ITerm("aa"), Q.ITerm("bb"))),
    Q.IPhrase((Q.ITerm("cc"), Q.ITerm("aa"), Q.ITerm("dd"))),
]


@pytest.mark.parametrize("si", range(len(SOURCES)))
def test_intervals_match_reference(interval_index, si):
    from lucene_spark.search.executor import IndexSearcher

    reader, docs = interval_index
    src = SOURCES[si]
    top = IndexSearcher(reader).search(
        Q.IntervalQuery("text", src), k=1000, prune=False
    )
    got = sorted(h.doc_id for h in top.hits)
    want = [d for d, txt in enumerate(docs) if _ref_match(src, txt.split())]
    assert got == want, f"source {si}: {got} vs {want}"


def test_intervals_sqlpath_matches_exact32(interval_index):
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.executor import IndexSearcher

    reader, _docs = interval_index
    src = SOURCES[1]
    df = sp.intervals_match_topk(reader, "text", src, k=1000)
    got = [r["doc_id"] for r in df.collect()]
    top = IndexSearcher(reader).search(
        Q.IntervalQuery("text", src), k=1000, prune=False
    )
    assert got == sorted(h.doc_id for h in top.hits)


def test_intervals_missing_term_is_empty(interval_index):
    from lucene_spark.search.executor import IndexSearcher

    reader, _docs = interval_index
    src = Q.IOrdered((Q.ITerm("aa"), Q.ITerm("zzzz")), max_gaps=5)
    top = IndexSearcher(reader).search(Q.IntervalQuery("text", src), k=10)
    assert top.total_hits == 0


def test_atleast_with_absent_term_sqlpath_matches_executor(built_index):
    """ADVICE r02: intervals_match_topk must not return empty when an
    IAtLeast source term is absent from the index — it still matches
    with n of the remaining terms, exactly like the executor path."""
    from lucene_spark.search import query as Q, sqlpath as sp
    from lucene_spark.search.executor import IndexSearcher

    src = Q.IAtLeast(
        (Q.ITerm("def"), Q.ITerm("return"), Q.ITerm("zzzznotaterm")), 2
    )
    out = sp.intervals_match_topk(built_index, "content", src, k=10).collect()
    top = IndexSearcher(built_index).search(
        Q.IntervalQuery("content", src), k=10
    )
    assert out, "atLeast with one absent term must still match"
    assert [r["doc_id"] for r in out] == sorted(h.doc_id for h in top.hits)
    # absence IS fatal for ordered sources — both paths agree on empty
    src2 = Q.IOrdered((Q.ITerm("def"), Q.ITerm("zzzznotaterm")))
    assert sp.intervals_match_topk(built_index, "content", src2).count() == 0


def test_multiterm_interval_sources(interval_index):
    """Intervals.prefix/wildcard (MultiTermIntervalsSource): engine
    results equal the brute reference of the hand-desugared union, in
    every structural position."""
    from lucene_spark.search.executor import IndexSearcher

    reader, docs = interval_index
    s = IndexSearcher(reader)

    def run(src):
        top = s.search(Q.IntervalQuery("text", src), k=1000, prune=False)
        return sorted(h.doc_id for h in top.hits)

    def want(src):
        return [d for d, t in enumerate(docs) if _ref_match(src, t.split())]

    # bare multi-term == atLeast(1, expansions)
    mt = Q.IMultiTerm(Q.RegexpQuery("text", "aa|bb"))
    desugared = Q.IAtLeast((Q.ITerm("aa"), Q.ITerm("bb")), n=1)
    assert run(mt) == want(desugared)
    # nested under ordered: any expansion before 'cc'
    nested = Q.IOrdered((mt, Q.ITerm("cc")), max_width=4)
    nested_ref = Q.IOrdered((desugared, Q.ITerm("cc")), max_width=4)
    assert run(nested) == want(nested_ref)
    # wildcard expanding to ONE term behaves as that term
    one = Q.IMultiTerm(Q.WildcardQuery("text", "a?"))
    assert run(one) == want(Q.ITerm("aa"))
    # empty expansion: fatal inside ordered, tolerated by atLeast
    none = Q.IMultiTerm(Q.PrefixQuery("text", "zz"))
    assert run(Q.IOrdered((none, Q.ITerm("cc")))) == []
    tol = Q.IAtLeast((none, Q.ITerm("aa"), Q.ITerm("bb")), n=2, max_width=4)
    tol_ref = Q.IAtLeast((Q.ITerm("aa"), Q.ITerm("bb")), n=2, max_width=4)
    assert run(tol) == want(tol_ref)
    # expansion budget raises TooManyClauses
    import pytest as _pytest

    with _pytest.raises(Q.TooManyClauses):
        run(Q.IMultiTerm(Q.RegexpQuery("text", ".*"), max_expansions=3))
