"""FacetSets (facet/facetset/MatchingFacetSetsCounts.java) and the
diversified top-k collector (misc/search/DiversifiedTopDocsCollector.java)
against brute-force pandas recomputation on the sf0.001 documents table."""

import duckdb
import pandas as pd

from lucene_spark.search import sqlpath as sp
from lucene_spark.search.executor import IndexReader

SF_DIR = "/root/testdata/sf0.001"


def _reader(spark):
    from lucene_spark.gate import ensure_index

    return ensure_index(spark, SF_DIR)


def _matched_docs(term: str) -> pd.DataFrame:
    return duckdb.sql(f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(
    regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')) AS tok
  FROM read_parquet('{SF_DIR}/documents.parquet')
),
m AS (SELECT DISTINCT doc_id FROM toks WHERE tok = '{term}')
SELECT d.* FROM read_parquet('{SF_DIR}/documents.parquet') d
JOIN m ON d.doc_id = m.doc_id""").df()


def test_facet_set_counts_matches_bruteforce(spark):
    r = _reader(spark)
    got = sp.facet_set_counts(r, "text", "spark", [
        ("exact_en_src1", [("lang", "exact", "en"), ("source", "exact", "src1")]),
        ("range_chars", [("n_chars", "range", 100, 400)]),
        ("mixed_de", [("lang", "exact", "de"), ("n_chars", "range", 200, 600)]),
    ]).toPandas().set_index("matcher")["cnt"].to_dict()

    md = _matched_docs("spark")
    want = {
        "exact_en_src1": int(((md.lang == "en") & (md.source == "src1")).sum()),
        "range_chars": int(md.n_chars.between(100, 400).sum()),
        "mixed_de": int(((md.lang == "de") & md.n_chars.between(200, 600)).sum()),
    }
    assert got == want
    # the matched set is non-trivial for at least one matcher
    assert any(v > 0 for v in want.values())


def test_facet_set_counts_empty_matcher_is_zero_not_missing(spark):
    r = _reader(spark)
    got = sp.facet_set_counts(r, "text", "spark", [
        ("impossible", [("lang", "exact", "xx"), ("n_chars", "range", -2, -1)]),
    ]).toPandas()
    assert got["matcher"].tolist() == ["impossible"]
    assert got["cnt"].tolist() == [0]


def test_diversified_topk_one_per_key(spark):
    r = _reader(spark)
    out = sp.diversified_topk(
        r, "text", "spark", "lang", max_per_key=1, k=5
    ).toPandas()
    # at most one hit per key, scores non-increasing
    assert out["grp"].is_unique
    assert (out["score_x1e6"].diff().dropna() <= 0).all()
    # every selected doc is its key's best: no other selected doc of the
    # same key outranks it (greedy per-key dominance, the reference rule)
    full = sp.diversified_topk(
        r, "text", "spark", "lang", max_per_key=2, k=50
    ).toPandas()
    best = full.sort_values(
        ["grp", "score_x1e6", "doc_id"], ascending=[True, False, True]
    ).groupby("grp").head(1)
    merged = out.merge(best, on="grp", suffixes=("", "_best"))
    assert (merged.doc_id == merged.doc_id_best).all()


def test_long_value_facet_counts_matches_bruteforce(spark):
    # LongValueFacetCounts: unique n_chars counts over hits, top-10 by
    # (count DESC, value ASC), __total__ = hits with a value
    r = _reader(spark)
    got = {row["path"]: row["cnt"] for row in sp.long_value_facet_counts(
        r, "text", "data", "n_chars", k=10).collect()}
    md = _matched_docs("data")
    vals = md["n_chars"].dropna().astype(int)
    vc = vals.value_counts()
    want_top = sorted(
        ((int(v), int(c)) for v, c in vc.items()),
        key=lambda t: (-t[1], t[0]),
    )[:10]
    want = {f"{v:06d}": c for v, c in want_top}
    want["__total__"] = len(vals)
    assert got == want


def test_string_value_facet_counts_matches_bruteforce(spark):
    # StringValueFacetCounts over array(lang, source): per-doc distinct
    # values, doc counts, __total__ = docs with >= 1 value
    r = _reader(spark)
    got = {row["path"]: row["cnt"] for row in sp.string_value_facet_counts(
        r, "text", "data", ["lang", "source"], k=10).collect()}
    md = _matched_docs("data")
    from collections import Counter
    cnt = Counter()
    total = 0
    for _, row in md.iterrows():
        vs = {v for v in (row["lang"], row["source"]) if pd.notna(v)}
        if vs:
            total += 1
            cnt.update(vs)
    want_top = sorted(cnt.items(), key=lambda t: (-t[1], t[0]))[:10]
    want = dict(want_top)
    want["__total__"] = total
    assert got == want


# --- HistogramCollectorManager (sandbox/facet/plain/histograms) ---


def test_histogram_matches_bruteforce(spark):
    r = _reader(spark)
    got = (
        sp.histogram_facet_counts(r, "text", "spark", ["n_chars"], 64)
        .toPandas().set_index("path")["cnt"].to_dict()
    )
    md = _matched_docs("spark")
    want = (
        md.n_chars.dropna().astype(int).floordiv(64)
        .value_counts().to_dict()
    )
    assert got == {f"{k:06d}": v for k, v in want.items()}


def test_histogram_multivalue_dedups_same_bucket(spark):
    # two values in the SAME bucket count the doc once
    # (HistogramCollector.java:161-166); width 1024 puts n_chars and
    # n_chars+40 in one bucket for most docs
    r = _reader(spark)
    single = (
        sp.histogram_facet_counts(r, "text", "spark", ["n_chars"], 1024)
        .toPandas().set_index("path")["cnt"].to_dict()
    )
    multi = (
        sp.histogram_facet_counts(
            r, "text", "spark", ["n_chars", "n_chars + 40"], 1024)
        .toPandas().set_index("path")["cnt"].to_dict()
    )
    md = _matched_docs("spark")
    v = md.n_chars.dropna().astype(int)
    want = (
        pd.concat([v.floordiv(1024), (v + 40).floordiv(1024)], axis=1)
        .apply(lambda row: sorted(set(row)), axis=1).explode()
        .value_counts().to_dict()
    )
    assert multi == {f"{int(k):06d}": v for k, v in want.items()}
    # total docs never exceeds the doc count (dedup held)
    assert sum(multi.values()) <= 2 * sum(single.values())


def test_histogram_guards(spark):
    import pytest as _pytest

    r = _reader(spark)
    with _pytest.raises(ValueError, match="bucketWidth"):
        sp.histogram_facet_counts(r, "text", "spark", ["n_chars"], 1)
    with _pytest.raises(ValueError, match="maxBuckets"):
        sp.histogram_facet_counts(r, "text", "spark", ["n_chars"], 64,
                                  max_buckets=0)
    with _pytest.raises(RuntimeError, match="more than the configured"):
        sp.histogram_facet_counts(r, "text", "spark", ["n_chars"], 2,
                                  max_buckets=1)
