"""FunctionRangeQuery / FunctionMatchQuery / ScaleFloatFunction /
RangeMapFloatFunction / ReciprocalFloatFunction (queries/function/) vs
brute-force pandas recomputation on sf0.001."""

import duckdb
import numpy as np

from lucene_spark.search import sqlpath as sp

SF_DIR = "/root/testdata/sf0.001"


def _reader(spark):
    from lucene_spark.gate import ensure_index

    return ensure_index(spark, SF_DIR)


def _docs():
    return duckdb.sql(
        f"SELECT * FROM read_parquet('{SF_DIR}/documents.parquet')"
    ).df()


def test_function_range_score_is_the_value(spark):
    r = _reader(spark)
    got = sp.function_range_topk(
        r, "ln(1 + n_chars)", 5.0, 6.0,
        include_lower=True, include_upper=False, k=1000,
    ).toPandas()
    d = _docs().dropna(subset=["n_chars"])
    v = np.log1p(d.n_chars.astype(float))
    want = d[(v >= 5.0) & (v < 6.0)]
    assert set(got.doc_id) == set(want.doc_id)
    # score IS the value (ValueSourceScorer), x1e6-quantized
    lookup = dict(zip(d.doc_id, np.round(v * 1e6).astype(np.int64)))
    for row in got.itertuples():
        assert row.score_x1e6 == lookup[row.doc_id]


def test_function_range_exclusive_bounds(spark):
    r = _reader(spark)
    d = _docs().dropna(subset=["n_chars"])
    lo = float(d.n_chars.min())
    incl = sp.function_range_topk(r, "n_chars", lo, None, True, True, k=10000)
    excl = sp.function_range_topk(r, "n_chars", lo, None, False, True, k=10000)
    n_at_lo = int((d.n_chars == lo).sum())
    assert incl.count() - excl.count() == n_at_lo


def test_function_match_filter_does_not_change_scores(spark):
    # FILTER semantics: surviving hits keep their BM25 score exactly
    r = _reader(spark)
    base = sp.bool_bm25_topk(r, "text", must=["spark"], k=10000).toPandas()
    filt = sp.function_match_topk(r, "text", "spark",
                                  "sqrt(n_chars) > 18", k=10000).toPandas()
    d = _docs().set_index("doc_id")
    keep = base[np.sqrt(d.loc[base.doc_id, "n_chars"].values.astype(float)) > 18]
    assert set(filt.doc_id) == set(keep.doc_id)
    m = dict(zip(base.doc_id, base.score_x1e6))
    assert all(m[i] == s for i, s in zip(filt.doc_id, filt.score_x1e6))


def test_scale_spanless_corpus_scores_to_min(spark):
    # mx == mn -> scale 0 -> every doc scores to_min (replace mode);
    # a constant value source makes the corpus span-less
    r = _reader(spark)
    out = sp.scale_score_topk(
        r, "text", "spark", "7", 3.0, 9.0, mode="replace", k=5
    ).toPandas()
    assert len(out) == 5
    assert set(out.score_x1e6) == {3_000_000}


def test_scale_matches_bruteforce(spark):
    r = _reader(spark)
    got = sp.scale_score_topk(
        r, "text", "spark", "ln(1 + n_chars)", 0.0, 2.0,
        mode="replace", k=10000,
    ).toPandas()
    d = _docs().dropna(subset=["n_chars"])
    v = np.log1p(d.n_chars.astype(float))
    mn, mx = float(v.min()), float(v.max())
    scaled = (v - mn) * ((2.0 - 0.0) / (mx - mn)) + 0.0
    lookup = dict(zip(d.doc_id, np.round(scaled * 1e6).astype(np.int64)))
    hits = set(got.doc_id)
    for row in got.itertuples():
        assert row.score_x1e6 == lookup[row.doc_id]
    assert hits  # non-trivial


def test_rangemap_and_reciprocal_strings():
    assert sp.rangemap_expr("x", 1, 2, "9") == \
        "(CASE WHEN (x) >= 1 AND (x) <= 2 THEN (9) ELSE (x) END)"
    assert sp.reciprocal_expr("x", 0.5, 2.0, 1.0) == \
        "(2.0 / (0.5 * (x) + 1.0))"
