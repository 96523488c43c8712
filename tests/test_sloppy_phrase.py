"""Sloppy-phrase tests: matcher semantics on hand-built docs (matching
the SloppyPhraseMatcher greedy) and engine-level ordering guarantees."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def sloppy_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    docs = pd.DataFrame(
        {
            "repo": ["r"] * 6,
            "path": [f"f{i}" for i in range(6)],
            "commit": ["c"] * 6,
            "content": [
                "quick brown fox",            # 0: exact adjacency
                "quick fox",                  # 1: 'quick X fox' with X removed -> distance 0 for (quick, fox)? no: terms quick..fox adjacent
                "quick red big brown fox",    # 2: quick...fox spread
                "fox quick",                  # 3: reversed order
                "quick quick brown fox fox",  # 4: repeats
                "nothing relevant here",      # 5
            ],
        }
    )
    idx = str(tmp_path_factory.mktemp("sloppy") / "idx")
    build_index(spark, spark.createDataFrame(docs), idx, IndexConfig(docs_per_segment=10))
    return IndexReader(spark, idx)


def _hits(reader, terms, slop, k=10):
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher

    s = IndexSearcher(reader)
    top = s.search(Q.PhraseQuery("content", tuple(terms), slop=slop), k=k)
    return {h.doc_id for h in top.hits}


def test_slop0_equals_exact(sloppy_index):
    assert _hits(sloppy_index, ["quick", "brown"], 0) == _hits(
        sloppy_index, ["quick", "brown"], -0
    )
    assert 0 in _hits(sloppy_index, ["brown", "fox"], 0)
    assert 2 in _hits(sloppy_index, ["brown", "fox"], 0)


def test_slop_expands_matches(sloppy_index):
    # "quick fox": doc0 has distance 1 (one word between), doc2 distance 3
    h0 = _hits(sloppy_index, ["quick", "fox"], 0)
    h1 = _hits(sloppy_index, ["quick", "fox"], 1)
    h3 = _hits(sloppy_index, ["quick", "fox"], 3)
    assert 1 in h0          # adjacent in doc1
    assert 0 not in h0
    assert 0 in h1          # one gap
    assert 2 not in h1
    assert 2 in h3          # three gaps
    assert h0 <= h1 <= h3   # monotone in slop


def test_reversed_order_needs_slop2(sloppy_index):
    # "fox quick" reversed = transposition: edit distance 2 in Lucene
    assert 3 not in _hits(sloppy_index, ["quick", "fox"], 1)
    assert 3 in _hits(sloppy_index, ["quick", "fox"], 2)


def test_sloppy_scores_monotone_with_distance(sloppy_index):
    """Tighter matches score higher: sloppyFreq = 1/(1+matchLength)."""
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher

    s = IndexSearcher(sloppy_index)
    top = s.search(Q.PhraseQuery("content", ("quick", "fox"), slop=3), k=10)
    scores = {h.doc_id: h.score for h in top.hits}
    # doc1 (adjacent) > doc0 (distance 1) > doc2 (distance 3); norms favor
    # shorter docs too, same direction
    assert scores[1] > scores[0] > scores[2]


def test_matcher_kernel_values(sloppy_index):
    """Direct kernel check: sloppyFreq values match hand computation."""
    from lucene_spark.search.executor import _SegmentIndex, _sloppy_phrase_freqs

    pdf = sloppy_index.postings().toPandas()
    for seg, grp in pdf.groupby("segment_id"):
        ctx = _SegmentIndex(grp.reset_index(drop=True))
        docs, freqs, _ = _sloppy_phrase_freqs(["quick", "fox"], 3, ctx)
        got = dict(zip(docs.tolist(), freqs.tolist()))
        # doc0: positions quick@0, fox@2 -> adjusted (0, 1) -> matchLength 1
        assert got[0] == pytest.approx(1 / 2, abs=1e-6)
        # doc1: adjacent -> matchLength 0 -> 1.0
        assert got[1] == pytest.approx(1.0, abs=1e-6)
        # doc2: quick@0, fox@4 -> adjusted (0, 3) -> 1/(1+3)
        assert got[2] == pytest.approx(1 / 4, abs=1e-6)
        # doc3: fox@0, quick@1 -> adjusted quick=1, fox=-1 -> matchLength 2
        assert got[3] == pytest.approx(1 / 3, abs=1e-6)
        assert 5 not in got


def test_vectorized_matches_scalar_bit_identical(built_index):
    """The batched greedy (default path) must produce BIT-identical
    float32 freqs to the per-doc heap greedy on a real corpus, for
    several phrases and slops (VERDICT r02 'do this' #3)."""
    import numpy as np

    from lucene_spark.search.executor import (
        _SegmentIndex,
        _sloppy_freqs_scalar,
        _sloppy_freqs_vectorized,
    )

    pdf = built_index.postings().toPandas()
    cases = [
        (["def", "self"], 0), (["def", "self"], 2), (["def", "self"], 5),
        (["return", "import"], 3),
        (["def", "return", "self"], 4),
        (["the", "of"], 1),
    ]
    compared = 0
    for _, grp in pdf.groupby("segment_id"):
        ctx = _SegmentIndex(grp.reset_index(drop=True))
        for terms, slop in cases:
            if not all(ctx.has(t) for t in terms):
                continue
            post = [ctx.postings(t) for t in terms]
            docs = post[0][0]
            for d, _, _ in post[1:]:
                docs = docs[np.isin(docs, d, assume_unique=True)]
            if len(docs) == 0:
                continue
            v = _sloppy_freqs_vectorized(terms, slop, ctx, docs, post)
            s = _sloppy_freqs_scalar(terms, slop, ctx, docs, post)
            assert v.dtype == np.float32 and s.dtype == np.float32
            assert np.array_equal(v, s), (terms, slop)
            compared += len(docs)
    assert compared > 50  # the comparison actually exercised real docs
