"""Index sorting (IndexWriterConfig.setIndexSort analog) + sorted-
segment early termination (TopFieldCollector canEarlyTerminate)."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def sorted_idx(spark, corpus, tmp_path_factory):
    from pyspark.sql import functions as F

    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    src = (
        spark.createDataFrame(corpus)
        .withColumn("n_chars", F.length("content"))
        .withColumn(
            "okey",
            F.format_string("%s\x01%s\x01%s", "repo", "path", "commit"),
        )
    )
    idx = str(tmp_path_factory.mktemp("sortidx") / "idx")
    cfg = IndexConfig(
        sort_by="n_chars", id_cols=("okey",), docs_per_segment=50
    )
    build_index(spark, src, idx, cfg)
    return IndexReader(spark, idx)


def test_manifest_records_sort_ranges(sorted_idx):
    m = sorted_idx.manifest
    assert m["sort_by"] == "n_chars"
    segs = [s for b in m["batches"] for s in b["segments"]]
    assert len(segs) >= 4
    for s in segs:
        assert s["sort_min"] <= s["sort_max"]
    # globally sorted: consecutive segments have non-decreasing ranges
    segs = sorted(segs, key=lambda s: s["first_doc_id"])
    for a, b in zip(segs, segs[1:]):
        assert a["sort_max"] <= b["sort_min"] or a["sort_max"] <= b["sort_max"]


def test_doc_ids_follow_sort_key(sorted_idx):
    rows = (
        sorted_idx.docs()
        .select("doc_id", "n_chars")
        .orderBy("doc_id")
        .collect()
    )
    vals = [r["n_chars"] for r in rows]
    assert vals == sorted(vals)


def test_field_sort_early_terminates_and_matches_unpruned(sorted_idx):
    from lucene_spark.search import sqlpath as sp

    stats: dict = {}
    got = sp.field_sort_topk(
        sorted_idx, "content", "def", "n_chars", ascending=True, k=5,
        prune_stats=stats,
    ).collect()
    assert stats["pruned_segments"] > 0
    # ground truth: all matching docs sorted by (n_chars, doc_id)
    matched = sp.exploded_postings(sorted_idx, "content", ["def"]).select(
        "doc_id"
    ).distinct()
    want = (
        sorted_idx.docs()
        .join(matched, "doc_id", "left_semi")
        .select("doc_id", "n_chars")
        .toPandas()
        .sort_values(["n_chars", "doc_id"])
        .head(5)
    )
    assert [(r["doc_id"], r["sort_val"]) for r in got] == list(
        zip(want["doc_id"].tolist(), want["n_chars"].tolist())
    )


def test_plan_declines_on_mismatched_sort(sorted_idx, built_index):
    ranges, pruned = sorted_idx.sorted_segment_plan(
        "content", "def", "other_col", True, 5
    )
    assert ranges is None and pruned == 0
    ranges, pruned = built_index.sorted_segment_plan(
        "content", "def", "n_chars", True, 5
    )
    assert ranges is None and pruned == 0  # unsorted index


def test_sort_by_rejects_preassigned_ids(spark, corpus, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index

    src = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "content": ["a", "b"], "n": [2, 1]})
    )
    with pytest.raises(ValueError, match="sort_by"):
        build_index(
            spark, src, str(tmp_path / "idx"),
            IndexConfig(doc_id_col="doc_id", sort_by="n"),
        )
