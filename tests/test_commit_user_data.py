"""Commit user data (IndexWriter.setLiveCommitData + SegmentInfos
userData): durable opaque metadata on commit points, carried forward
by later commits, per-generation for pinned readers."""

import pandas as pd
import pytest

from lucene_spark.index import manifest as mani
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.index.manifest import (
    get_commit_user_data,
    set_commit_user_data,
)


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("ud") / "idx")
    rows = pd.DataFrame({
        "doc_id": range(40),
        "content": [f"doc number {i} spark" for i in range(40)],
    })
    build_index(
        spark, spark.createDataFrame(rows), p,
        IndexConfig(doc_id_col="doc_id", docs_per_segment=10),
    )
    return p


def test_round_trip_and_new_generation(idx):
    g0 = mani.latest_generation(idx)
    assert get_commit_user_data(idx) == {}
    g1 = set_commit_user_data(idx, {"checkpoint": "42", "source": "kafka"})
    assert g1 == g0 + 1
    assert get_commit_user_data(idx) == {"checkpoint": "42", "source": "kafka"}
    # the older commit still answers with ITS data (pinned readers)
    assert get_commit_user_data(idx, generation=g0) == {}


def test_survives_merge_commits(spark, idx):
    from lucene_spark.index.merge import merge_round

    set_commit_user_data(idx, {"checkpoint": "43"})
    did = merge_round(spark, idx, segs_per_tier=2)
    assert did  # a merge actually committed a new generation
    assert get_commit_user_data(idx) == {"checkpoint": "43"}


def test_reader_sees_user_data(spark, idx):
    from lucene_spark.search.executor import IndexReader

    set_commit_user_data(idx, {"checkpoint": "44"})
    r = IndexReader(spark, idx)
    assert r.manifest.get("user_data") == {"checkpoint": "44"}
