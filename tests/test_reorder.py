"""BP doc-id reordering (misc/index/BPIndexReorderer.java): the
bisection kernel, the full index rewrite, and the compression win."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.index.reorder import (
    bp_permutation,
    bp_reorder_index,
    log_gap_cost,
)


def _clustered_csr(n=300, k=3, vocab_per=40, per_doc=12, seed=7):
    """Interleaved topic clusters with disjoint vocab — worst case for
    identity order, ideal for BP."""
    rng = np.random.default_rng(seed)
    docs_terms = [
        np.sort(rng.choice(
            np.arange((i % k) * vocab_per, (i % k + 1) * vocab_per),
            size=per_doc, replace=False,
        ))
        for i in range(n)
    ]
    counts = np.array([len(x) for x in docs_terms])
    indptr = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(counts, out=indptr[1:])
    return indptr, np.concatenate(docs_terms).astype(np.int64), k


def test_bp_kernel_bijection_and_cost():
    indptr, terms, k = _clustered_csr()
    n = len(indptr) - 1
    rank = bp_permutation(indptr, terms, min_partition_size=8)
    assert sorted(rank.tolist()) == list(range(n))
    c_id = log_gap_cost(indptr, terms, np.arange(n))
    c_bp = log_gap_cost(indptr, terms, rank)
    assert c_bp < 0.7 * c_id, (c_bp, c_id)
    # same-topic docs end up adjacent: the new order's topic sequence
    # has few transitions (identity order has n-1 of them)
    topics = np.arange(n) % k
    order = np.empty(n, dtype=int)
    order[rank] = np.arange(n)
    seq = topics[order]
    transitions = int((seq[1:] != seq[:-1]).sum())
    assert transitions <= n // 10, transitions  # identity order has n-1


@pytest.fixture(scope="module")
def clustered_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    # FOR blocks pack at bits_required(max delta in the 256-block), so
    # the compression win appears when per-segment df > BLOCK_SIZE (the
    # 100-TB regime: hot terms span many blocks and clustering shrinks
    # every block's max gap). 3000 docs / 3 topics in RANDOM order, each
    # doc carrying its topic's full vocabulary: per-segment df = 500 (two
    # blocks), so clustering drives doc deltas to 1 (0-bit blocks) while
    # random order needs ~5 bits — the byte win is structural.
    rng = np.random.default_rng(11)
    k, vocab_per = 3, 25
    vocab = [[f"t{t}w{w}" for w in range(vocab_per)] for t in range(k)]
    rows = []
    for i in range(3000):
        t = int(rng.integers(k))
        words = rng.permutation(vocab[t])
        rows.append((i, i, " ".join(words)))
    pdf = pd.DataFrame(rows, columns=["doc_id", "orig", "text"])
    src = spark.createDataFrame(pdf)
    path = str(tmp_path_factory.mktemp("bp") / "idx")
    cfg = IndexConfig(
        field="text", content_col="text", analyzer="simple",
        doc_id_col="doc_id", docs_per_segment=1500, id_cols=("orig",),
    )
    build_index(spark, src, path, cfg)
    return path, IndexReader(spark, path)


def _postings_bytes(reader) -> int:
    return int(
        reader.postings()
        .agg(F.sum(F.length("postings")).alias("b"))
        .head()["b"]
    )


def test_bp_reorder_shrinks_and_preserves(spark, clustered_index, tmp_path):
    from lucene_spark.index.checkindex import check_index
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.executor import IndexReader

    src_path, src = clustered_index
    out_path = str(tmp_path / "bp_out")
    bp_reorder_index(spark, src_path, out_path, min_partition_size=8)
    dst = IndexReader(spark, out_path)

    # 1. the doc-delta lane got smaller on the clustered corpus
    b0, b1 = _postings_bytes(src), _postings_bytes(dst)
    assert b1 < b0, (b0, b1)

    # 2. every index invariant holds on the rewritten tables
    rep = check_index(spark, out_path)
    assert rep["ok"], rep["violations"]

    # 3. global stats are invariant under the within-segment permutation
    assert (
        src.term_stats_df().exceptAll(dst.term_stats_df()).count() == 0
        and dst.term_stats_df().exceptAll(src.term_stats_df()).count() == 0
    )

    # 4. the permutation is within-segment: same doc-id set per segment
    a = src.doclens().groupBy("segment_id").agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"),
        F.count("*").alias("n"),
    )
    b = dst.doclens().groupBy("segment_id").agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"),
        F.count("*").alias("n"),
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # 5. search results are identical modulo the id remap: join back to
    # the carried 'orig' column and compare (orig, score) multisets.
    # k covers every match — a k-cut would tie-break on doc_id, which
    # reordering legitimately changes (Lucene doc ids are never stable
    # across merges either).
    def result(reader):
        top = sp.bool_bm25_topk(reader, "text", must=["t0w3"], k=3000)
        return sorted(
            (r["orig"], r["score_x1e6"])
            for r in top.join(reader.docs(), "doc_id").collect()
        )

    assert result(src) == result(dst)


def test_bp_reorder_refuses_tombstones_and_sorted(spark, clustered_index, tmp_path):
    import shutil

    from lucene_spark.index.deletes import delete_by_ids

    src_path, src = clustered_index
    work = str(tmp_path / "del_copy")
    shutil.copytree(src_path, work)
    delete_by_ids(spark, work, src.docs().select("doc_id").limit(3))
    with pytest.raises(ValueError, match="tombstones"):
        bp_reorder_index(spark, work, str(tmp_path / "never"))


# ---- BpVectorReorderer (misc/index/BpVectorReorderer.java) ----


def test_bp_vector_kernel_clusters():
    from lucene_spark.index.reorder import bp_vector_permutation

    rng = np.random.default_rng(5)
    k, n, d = 4, 400, 16
    centers = rng.normal(size=(k, d)) * 5
    labels = rng.integers(k, size=n)
    vecs = centers[labels] + rng.normal(size=(n, d))
    rank = bp_vector_permutation(vecs, min_partition_size=8)
    assert sorted(rank.tolist()) == list(range(n))
    order = np.empty(n, dtype=int)
    order[rank] = np.arange(n)
    seq = labels[order]
    # adjacent positions mostly share a cluster after reordering
    agree_bp = float((seq[1:] == seq[:-1]).mean())
    agree_id = float((labels[1:] == labels[:-1]).mean())
    assert agree_bp > 0.85 > 2 * agree_id, (agree_bp, agree_id)


def test_bp_vector_order_spark_surface(spark):
    from lucene_spark.index.reorder import bp_vector_order

    rng = np.random.default_rng(9)
    centers = rng.normal(size=(3, 8)) * 5
    labels = rng.integers(3, size=300)
    vecs = (centers[labels] + rng.normal(size=(300, 8))).astype("float32")
    pdf = pd.DataFrame({
        "doc_id": np.arange(300, dtype=np.int64),
        "embedding": [v.tolist() for v in vecs],
    })
    out = bp_vector_order(
        spark.createDataFrame(pdf), chunk=150, min_partition_size=8
    ).toPandas()
    # bp_pos is a bijection within each disjoint chunk range
    assert sorted(out["bp_pos"]) == list(range(300))
    lo = out[out.doc_id < 150]
    assert set(lo["bp_pos"]) == set(range(150))
    # locality: adjacent bp_pos agree on cluster far more than id order
    by_pos = out.sort_values("bp_pos")
    seq = labels[by_pos["doc_id"].to_numpy()]
    chunk_edge = (by_pos["bp_pos"].to_numpy()[1:] % 150) != 0
    agree = float(((seq[1:] == seq[:-1]) & chunk_edge).sum() / chunk_edge.sum())
    assert agree > 0.8
