"""Term/index-statistic value sources (queries/function/valuesource/
TermFreqValueSource.java, TFValueSource.java, DocFreqValueSource.java,
IDFValueSource.java, TotalTermFreqValueSource.java,
SumTotalTermFreqValueSource.java, NormValueSource.java,
MaxDocValueSource.java, NumDocsValueSource.java) — the gated branches
(vtf/vidf/vnorm/vsttf) are DuckDB-oracled; these pin the remaining
sources' contracts."""

import math

import pytest
from pyspark.sql import functions as F

from lucene_spark.search import sqlpath as sp

TERM, STAT = "def", "return"


def _scores(built_index, source, k=30):
    out = sp.term_stat_score_topk(
        built_index, "content", TERM, STAT, source, k=k)
    return {r["doc_id"]: r["score_x1e6"] for r in out.collect()}


def test_tf_is_sqrt_of_termfreq(built_index):
    base = {
        r["doc_id"]: r["score_x1e6"]
        for r in sp.term_scored(built_index, "content", TERM).collect()
    }
    raw = _scores(built_index, "termfreq", k=1000)
    tfs = _scores(built_index, "tf", k=1000)
    assert set(raw) == set(tfs) == set(base)
    for d in raw:
        f = raw[d] / base[d] if base[d] else 0.0  # recovered raw tf
        assert tfs[d] == round(base[d] / 1e6 * math.sqrt(round(f)) * 1e6)


def test_constant_sources_preserve_ranks(built_index):
    base = sp.term_scored(built_index, "content", TERM)
    base_rank = [
        r["doc_id"] for r in base.orderBy(
            F.col("score_x1e6").desc(), F.col("doc_id").asc()).collect()
    ]
    for source in ("docfreq", "idf", "totaltermfreq",
                   "sumtotaltermfreq", "maxdoc", "numdocs"):
        got = sp.term_stat_score_topk(
            built_index, "content", TERM, STAT, source, k=len(base_rank))
        assert [r["doc_id"] for r in got.collect()] == base_rank, source


def test_constant_values(built_index):
    coll = built_index.collection_stats("content")
    ts = built_index.term_stats("content", [STAT])[STAT]
    base = {
        r["doc_id"]: r["score_x1e6"]
        for r in sp.term_scored(built_index, "content", TERM).collect()
    }
    d0 = min(base)
    expected = {
        "docfreq": float(ts.doc_freq),
        "idf": math.log((coll.doc_count + 1) / (ts.doc_freq + 1)) + 1.0,
        "totaltermfreq": float(ts.total_term_freq),
        "sumtotaltermfreq": float(coll.sum_total_term_freq),
        "maxdoc": float(coll.max_doc),
        "numdocs": float(coll.doc_count),
    }
    for source, const in expected.items():
        got = _scores(built_index, source, k=10_000)
        assert got[d0] == round(base[d0] / 1e6 * const * 1e6), source


def test_unknown_source_rejected(built_index):
    with pytest.raises(ValueError, match="value source"):
        _scores(built_index, "pagerank")
