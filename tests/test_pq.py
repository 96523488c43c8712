"""Product quantization ANN — lucene_spark/pipeline/pq.py.

Method: Jégou et al., "Product Quantization for Nearest Neighbor
Search" (TPAMI 2011). Tests: codebook/encode invariants, ADC distance
exactness vs a numpy replay of the same codebooks, and recall@10 vs
the brute-force cosine oracle."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline.pq import (
    ann_pq_topk,
    pq_encode,
    pq_train_codebooks,
)
from lucene_spark.pipeline.similarity import cosine_topk

SF = "/root/testdata/sf0.001"
M, NC = 16, 16


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


@pytest.fixture(scope="module")
def trained(emb):
    books = pq_train_codebooks(emb, m=M, n_codes=NC, iters=2).cache()
    codes = pq_encode(emb, books, m=M).cache()
    books.count(), codes.count()
    return books, codes


def test_codebook_and_code_invariants(emb, trained):
    books, codes = trained
    rows = books.collect()
    assert len(rows) == M * NC
    dims = len(emb.select("embedding").head()["embedding"])
    assert all(len(r["cvec"]) == dims // M for r in rows)
    n = emb.count()
    assert codes.count() == n * M
    assert codes.agg(F.min("code")).head()[0] >= 0
    assert codes.agg(F.max("code")).head()[0] < NC
    # exactly one code per (vec_id, sub)
    assert codes.select("vec_id", "sub").distinct().count() == n * M


def test_adc_distance_matches_numpy_replay(emb, trained):
    # the Spark ADC sum-of-lookups must equal a numpy replay of the
    # same codebooks on the same unit-normalized vectors
    books, codes = trained
    pdf = emb.orderBy("vec_id").toPandas()
    vecs = np.array([np.array(v, dtype=np.float64) for v in pdf["embedding"]])
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    dims = vecs.shape[1]
    w = dims // M
    bk = {(r["sub"], r["code"]): np.array(r["cvec"]) for r in books.collect()}
    cd = {(r["vec_id"], r["sub"]): r["code"] for r in codes.collect()}
    qid = 0
    q = vecs[list(pdf["vec_id"]).index(qid)]
    lut = {
        (s, c): float(np.sum((q[s * w:(s + 1) * w] - bk[(s, c)]) ** 2))
        for s in range(M) for c in range(NC)
    }
    want = {}
    for vid in pdf["vec_id"]:
        if vid == qid:
            continue
        want[vid] = sum(lut[(s, cd[(vid, s)])] for s in range(M))
    from lucene_spark.pipeline.pq import _l2sq, _unit_subvecs

    qsub = _unit_subvecs(emb.where(F.col("vec_id") == qid), M, dims)
    lutdf = qsub.join(books, "sub").select(
        "sub", "code", _l2sq(F.col("svec"), F.col("cvec")).alias("partial"))
    got = {
        r["vec_id"]: r["adist"]
        for r in codes.join(F.broadcast(lutdf), ["sub", "code"])
        .groupBy("vec_id").agg(F.sum("partial").alias("adist"))
        .where(F.col("vec_id") != qid).collect()
    }
    assert set(got) == set(want)
    for vid in want:
        assert abs(got[vid] - want[vid]) < 1e-9, vid


def test_pq_recall_at_10(emb, trained):
    books, codes = trained
    recs = []
    for q in (0, 7, 42, 99, 123):
        truth = {r["vec_id"] for r in cosine_topk(emb, q, 10).collect()}
        got = {
            r["vec_id"]
            for r in ann_pq_topk(
                emb, q, 10, m=M, books=books, codes=codes, refine=8
            ).collect()
        }
        recs.append(len(got & truth) / 10)
    assert sum(recs) / len(recs) >= 0.8, recs


def test_pq_training_is_deterministic(emb):
    b1 = pq_train_codebooks(emb, m=4, n_codes=8, iters=1)
    b2 = pq_train_codebooks(emb, m=4, n_codes=8, iters=1)
    r1 = sorted((r["sub"], r["code"], tuple(r["cvec"])) for r in b1.collect())
    r2 = sorted((r["sub"], r["code"], tuple(r["cvec"])) for r in b2.collect())
    assert r1 == r2


def test_persisted_pq_index_matches_fused(spark, tmp_path):
    """Persisted PQ (codebooks + codes parquet): query results equal
    the fused train+encode+query path with the same parameters."""
    from lucene_spark.pipeline.pq import (
        ann_pq_topk,
        pq_index_topk,
        pq_index_write,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    idx = str(tmp_path / "pq")
    pq_index_write(emb, idx, m=8, n_codes=16, iters=1)
    got = pq_index_topk(spark, emb, idx, query_id=0, k=10).collect()
    fused = ann_pq_topk(
        emb, query_id=0, k=10, m=8, n_codes=16, iters=1
    ).collect()
    assert [(r["vec_id"], r["cos_x1e6"]) for r in got] == [
        (r["vec_id"], r["cos_x1e6"]) for r in fused
    ]
