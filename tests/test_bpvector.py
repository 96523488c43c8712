"""BpVectorReorderer (misc/index/BpVectorReorderer.java): the local
bisection kernel and the distributed sample-tree + per-leaf pipeline."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline.bpvector import (
    bp_reorder_local,
    bp_vector_reorder,
)


def _clustered(n=800, dim=16, kc=4, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(0, 5, (kc, dim)).astype(np.float32)
    v = np.stack([
        centers[i % kc] + rng.normal(0, 0.3, dim).astype(np.float32)
        for i in range(n)
    ])
    return v, np.arange(n) % kc


def test_local_kernel_is_a_permutation_and_improves_locality():
    v, labels = _clustered()
    perm = bp_reorder_local(v, "euclidean")
    assert sorted(perm) == list(range(len(v)))

    def adj(order):
        return float(np.linalg.norm(np.diff(v[order], axis=0), axis=1).mean())

    assert adj(perm) < adj(np.arange(len(v))) / 4
    # the top split separates clusters cleanly: each half holds whole
    # clusters (balanced 4-cluster data -> 2 clusters per half)
    half = set(labels[perm[: len(v) // 2]])
    other = set(labels[perm[len(v) // 2:]])
    assert half.isdisjoint(other)


def test_local_kernel_deterministic():
    v, _ = _clustered(seed=11)
    p1 = bp_reorder_local(v, "dot")
    p2 = bp_reorder_local(v, "dot")
    assert (p1 == p2).all()


def test_distributed_reorder_matches_contract(spark):
    v, labels = _clustered(n=1200, seed=5)
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v[i]]) for i in range(len(v))],
        "vec_id long, embedding array<float>",
    ).repartition(6)
    out = bp_vector_reorder(
        df, levels=2, sample_size=600, metric="euclidean"
    ).toPandas()
    # dense permutation of ordinals, every id exactly once
    assert sorted(out.new_ord) == list(range(len(v)))
    assert out.id.nunique() == len(v)
    # cluster concentration: chunk the new order into 4 ranges; each
    # cluster should concentrate (majority of its members in one chunk)
    order = out.sort_values("new_ord").id.to_numpy()
    chunk = np.repeat(np.arange(4), len(v) // 4)
    for c in range(4):
        member_chunks = chunk[np.isin(order, np.where(labels == c)[0]).nonzero()[0]]
        top = np.bincount(member_chunks, minlength=4).max()
        assert top / (labels == c).sum() > 0.9, c


def test_reorder_on_embeddings_table(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    out = bp_vector_reorder(emb, levels=2, sample_size=256)
    pdf = out.toPandas()
    assert len(pdf) == n
    assert sorted(pdf.new_ord) == list(range(n))
