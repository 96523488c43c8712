"""BM25 float32 math vs hand-computed goldens (mirrors
CORETEST/search/similarities tests)."""

import math

import numpy as np

from lucene_spark.search.bm25 import (
    BM25Scorer,
    CollectionStats,
    TermStats,
    idf_f32,
    idf_sum_f32,
)
from lucene_spark.util.smallfloat import LENGTH_TABLE, int_to_byte4


def mk(doc_count=100, sum_ttf=1000, df=10, ttf=50):
    return (
        CollectionStats(max_doc=doc_count, doc_count=doc_count,
                        sum_total_term_freq=sum_ttf, sum_doc_freq=sum_ttf),
        [TermStats(doc_freq=df, total_term_freq=ttf)],
    )


def test_idf_value():
    # idf = ln(1 + (N - n + 0.5)/(n + 0.5)), float64 then cast f32
    v = idf_f32(10, 100)
    expect = np.float32(math.log(1 + (100 - 10 + 0.5) / (10 + 0.5)))
    assert v == expect and v.dtype == np.float32


def test_idf_sum_is_float64_of_float32s():
    idfs = [idf_f32(3, 50), idf_f32(7, 50), idf_f32(1, 50)]
    acc = 0.0
    for x in idfs:
        acc += float(x)
    assert idf_sum_f32(idfs) == np.float32(acc)


def test_score_exact_float32_path():
    coll, terms = mk()
    s = BM25Scorer(coll, terms)
    # replicate by hand in strict float32
    k1, b = np.float32(1.2), np.float32(0.75)
    avgdl = np.float32(1000 / float(100))
    dl = 17
    code = int_to_byte4(dl)
    L = np.float32(LENGTH_TABLE[code])
    norm_inv = np.float32(1.0) / (k1 * ((np.float32(1.0) - b) + (b * L) / avgdl))
    freq = np.float32(3.0)
    w = np.float32(1.0) * s.idf
    expect = w - w / (np.float32(1.0) + freq * norm_inv)
    got = s.score(np.array([3.0]), np.array([code]))
    assert got.dtype == np.float32
    assert got[0] == expect


def test_score_monotonic_in_freq_and_length():
    coll, terms = mk()
    s = BM25Scorer(coll, terms)
    freqs = np.arange(1, 50, dtype=np.float32)
    scores = s.score(freqs, np.zeros(49))
    assert np.all(np.diff(scores) >= 0)  # increasing in freq
    codes = np.arange(0, 256)
    sc = s.score(np.full(256, 5.0), codes)
    assert np.all(np.diff(sc) <= 0)  # decreasing in doc length


def test_max_score_bounds_all_scores():
    coll, terms = mk()
    s = BM25Scorer(coll, terms)
    rng = np.random.default_rng(7)
    freqs = rng.integers(1, 30, 100).astype(np.float32)
    codes = rng.integers(0, 256, 100)
    bound = s.max_score(freqs, codes)
    assert np.all(s.score(freqs, codes) <= bound)


def test_boost_scales_weight():
    coll, terms = mk()
    s1 = BM25Scorer(coll, terms, boost=1.0)
    s2 = BM25Scorer(coll, terms, boost=2.0)
    assert s2.weight == np.float32(np.float32(2.0) * s1.idf)
