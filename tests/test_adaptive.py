"""IndexOrDocValuesQuery — lucene_spark/search/adaptive.py.

Reference semantics (core/search/IndexOrDocValuesQuery.java): both
wrapped queries match identically; the plan flips on
``indexCost >>> 3 <= leadCost``.
"""

import pytest

from lucene_spark.index.points import bkd_write
from lucene_spark.search.adaptive import index_or_docvalues_range_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    from lucene_spark.gate import ensure_index

    r = ensure_index(spark, SF)
    path = str(tmp_path_factory.mktemp("iodv") / "nchars")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    bkd_write(docs.select("doc_id", "n_chars"), ["n_chars"], path, num_files=8)
    return r, path, docs


def _truth(docs, term, lo, hi):
    from pyspark.sql import functions as F

    toks = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != "")
    return sorted(
        r["doc_id"]
        for r in docs.filter(
            F.array_contains(toks, term)
            & (F.col("n_chars") >= lo) & (F.col("n_chars") <= hi)
        ).select("doc_id").collect()
    )


def test_rare_lead_takes_docvalues_path(spark, setup):
    r, path, docs = setup
    stats = {}
    got = [
        x["doc_id"]
        for x in index_or_docvalues_range_topk(
            spark, r, path, "text", "dup", {"n_chars": (0, 600)},
            k=10_000, stats=stats,
        ).collect()
    ]
    # 'dup' df ~29 << full-range index cost / 8 -> verify per doc
    assert stats["path"] == "docvalues"
    assert stats["lead_cost"] < (stats["index_cost"] >> 3)
    assert got == _truth(docs, "dup", 0, 600)


def test_hot_lead_takes_index_path(spark, setup):
    r, path, docs = setup
    stats = {}
    got = [
        x["doc_id"]
        for x in index_or_docvalues_range_topk(
            spark, r, path, "text", "scan", {"n_chars": (100, 160)},
            k=10_000, stats=stats,
        ).collect()
    ]
    # hot lead + narrow pruned range -> the range index leads
    assert stats["path"] == "index"
    assert got == _truth(docs, "scan", 100, 160)


def test_paths_agree_on_same_query(spark, setup):
    # the defining contract: whichever side is chosen, results match
    r, path, docs = setup
    for term, rng in (("dup", (50, 400)), ("scan", (50, 400))):
        got = [
            x["doc_id"]
            for x in index_or_docvalues_range_topk(
                spark, r, path, "text", term, {"n_chars": rng}, k=10_000
            ).collect()
        ]
        assert got == _truth(docs, term, *rng), term


# --- IndexSortSortedNumericDocValuesRangeQuery analog ---


@pytest.fixture(scope="module")
def sorted_reader(spark):
    from lucene_spark.gate import ensure_sorted_index

    return ensure_sorted_index(spark, SF)


def _range_truth(spark, lo, hi):
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return sorted(
        r["doc_id"]
        for r in docs.filter(F.col("n_chars").between(lo, hi))
        .select("doc_id").collect()
    )


def test_index_sort_range_matches_fallback_and_prunes(spark, sorted_reader):
    from lucene_spark.search.adaptive import index_sort_range_topk

    stats = {}
    got = [
        r["doc_id"]
        for r in index_sort_range_topk(
            sorted_reader, "n_chars", 100, 200,
            id_col="orig_id", k=10_000, stats=stats,
        ).collect()
    ]
    assert got == _range_truth(spark, 100, 200)
    assert stats["path"] == "index_sort"
    # a narrow range over a sorted index must drop disjoint segments
    assert stats["segments_kept"] < stats["segments_total"]


def test_index_sort_range_fully_contained_segments(spark, sorted_reader):
    # a wide range: interior segments are fully contained (no value
    # predicate — the IteratorAndCount.all case)
    from lucene_spark.search.adaptive import index_sort_range_topk

    stats = {}
    got = [
        r["doc_id"]
        for r in index_sort_range_topk(
            sorted_reader, "n_chars", 0, 10_000,
            id_col="orig_id", k=100_000, stats=stats,
        ).collect()
    ]
    assert got == _range_truth(spark, 0, 10_000)
    assert stats["fully_contained"] == stats["segments_total"]


def test_index_sort_range_empty_and_fallback(spark, sorted_reader):
    from lucene_spark.gate import ensure_index
    from lucene_spark.search.adaptive import index_sort_range_topk

    stats = {}
    out = index_sort_range_topk(
        sorted_reader, "n_chars", 100_000, 200_000,
        id_col="orig_id", k=100, stats=stats,
    ).collect()
    assert out == [] and stats["segments_kept"] == 0
    # unsorted index -> delegate to the fallback (same rows)
    stats = {}
    r = ensure_index(spark, SF)
    got = [
        row["doc_id"]
        for row in index_sort_range_topk(
            r, "n_chars", 100, 200, k=10_000, stats=stats
        ).collect()
    ]
    assert stats["path"] == "fallback"
    assert got == _range_truth(spark, 100, 200)


def test_index_sort_range_count_manifest_shortcut(spark, sorted_reader):
    from lucene_spark.search.adaptive import index_sort_range_count

    stats = {}
    cnt = index_sort_range_count(
        sorted_reader, "n_chars", 100, 400, stats=stats
    ).head()["cnt"]
    assert cnt == len(_range_truth(spark, 100, 400))
    assert stats["path"] == "index_sort"
    # interior segments must be counted without scanning
    assert stats["manifest_docs"] > 0
    assert stats["scanned_segments"] <= 2
    # whole-space range: pure manifest arithmetic, zero segments scanned
    stats = {}
    cnt = index_sort_range_count(
        sorted_reader, "n_chars", 0, 10_000, stats=stats
    ).head()["cnt"]
    assert cnt == len(_range_truth(spark, 0, 10_000))
    assert stats["scanned_segments"] == 0
