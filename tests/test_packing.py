"""Sequence packing — lucene_spark/pipeline/packing.py."""

import duckdb
import pandas as pd
import pytest

from lucene_spark.pipeline.packing import pack_sequences, pack_sequences_sql


@pytest.fixture(scope="module")
def docs(spark):
    words = ["aa bb cc", "dd", "", "ee ff", "gg hh ii jj kk", "ll mm"]
    return spark.createDataFrame(
        pd.DataFrame({
            "doc_id": range(len(words) * 50),
            "text": [words[i % len(words)] for i in range(len(words) * 50)],
        })
    )


def test_layout_invariants(spark, docs):
    out = pack_sequences(docs, seq_len=7, bucket=16, k=None).collect()
    # a driver-side replay of the concat-and-chunk layout
    cum = 0
    for r in sorted(out, key=lambda r: r["doc_id"]):
        assert r["seq_id"] == cum // 7
        assert r["offset"] == cum % 7
        end = (cum + max(r["n_tokens"], 1) - 1) // 7
        assert r["n_splits"] == end - r["seq_id"]
        cum += r["n_tokens"]
    # the stream is dense: total tokens == last doc's cum position
    assert cum == sum(r["n_tokens"] for r in out)


def test_bucketed_prefix_sum_matches_bucket_sizes(spark, docs):
    # the two-level prefix sum must not depend on the bucket size
    a = sorted(
        tuple(r) for r in pack_sequences(docs, 11, bucket=8, k=None).collect()
    )
    b = sorted(
        tuple(r) for r in pack_sequences(docs, 11, bucket=1024, k=None).collect()
    )
    assert a == b


def test_matches_duckdb(spark, docs):
    got = sorted(
        tuple(r) for r in pack_sequences(docs, 13, bucket=32, k=None).collect()
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = sorted(
        tuple(t) for t in con.execute(pack_sequences_sql(13, k=None)).fetchall()
    )
    assert got == want


def test_boundary_straddle(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1], "text": ["a b c d e", "f g h i j k l"]})
    )
    out = {r["doc_id"]: r for r in pack_sequences(docs, 4, k=None).collect()}
    # doc 0: 5 tokens at cum 0 -> seq 0, offset 0, spills into seq 1
    assert (out[0]["seq_id"], out[0]["offset"], out[0]["n_splits"]) == (0, 0, 1)
    # doc 1: 7 tokens at cum 5 -> seq 1 offset 1, ends at token 11 (seq 2)
    assert (out[1]["seq_id"], out[1]["offset"], out[1]["n_splits"]) == (1, 1, 1)
