"""int8 scalar quantization (lucene_spark/pipeline/quantize.py):
Lucene99ScalarQuantizedVectorsFormat confidence-interval bounds,
quantization round-trip, byte-vector search recall, quantized-HNSW
composition, and the 4x storage cut."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

EMB = "/root/testdata/sf0.01/embeddings.parquet"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(EMB)


@pytest.fixture(scope="module")
def bounds(emb):
    from lucene_spark.pipeline.quantize import sq_train

    return sq_train(emb, confidence=0.9)


def test_bounds_are_exact_order_statistics(emb, bounds):
    lo, hi = bounds
    vals = np.sort(
        np.concatenate(
            emb.toPandas()["embedding"].map(np.asarray).to_numpy()
        ).astype(np.float64)
    )
    n = len(vals)
    r = int(math.floor(0.05 * (n - 1)))
    assert lo == float(vals[r]) and hi == float(vals[n - 1 - r])
    assert lo < hi


def test_quantize_range_and_roundtrip(emb, bounds):
    from lucene_spark.pipeline.quantize import BITS_MAX, sq_quantize

    lo, hi = bounds
    scale = (hi - lo) / BITS_MAX
    q = sq_quantize(emb, lo, hi)
    pdf = q.toPandas()
    allq = np.concatenate(pdf["qvec"].map(np.asarray).to_numpy())
    assert allq.min() >= 0 and allq.max() <= BITS_MAX
    assert "ByteType" in str(q.schema["qvec"].dataType)
    # round-trip error <= scale/2 for in-range components
    orig = np.concatenate(
        emb.orderBy("vec_id").toPandas()["embedding"].map(np.asarray).to_numpy()
    ).astype(np.float64)
    deq = lo + np.concatenate(
        q.orderBy("vec_id").toPandas()["qvec"].map(np.asarray).to_numpy()
    ).astype(np.float64) * scale
    inr = (orig >= lo) & (orig <= hi)
    assert np.abs(orig[inr] - deq[inr]).max() <= scale / 2 + 1e-12


def test_query_quantization_matches_doc_quantization(emb, bounds):
    from lucene_spark.pipeline.quantize import (
        BITS_MAX,
        quantize_query,
        sq_quantize,
    )

    lo, hi = bounds
    scale = (hi - lo) / BITS_MAX
    row = emb.filter(F.col("vec_id") == 0).head()
    qd = quantize_query([float(x) for x in row["embedding"]], lo, hi)
    doc = sq_quantize(emb, lo, hi).filter(F.col("vec_id") == 0).head()["qvec"]
    deq_doc = [lo + int(v) * scale for v in doc]
    assert qd == deq_doc


def test_sq_recall_delta_vs_float32(spark, emb):
    from lucene_spark.pipeline.quantize import sq_cosine_topk
    from lucene_spark.pipeline.similarity import cosine_topk

    exact = set(cosine_topk(emb, 0, 10).toPandas()["vec_id"])
    got = set(sq_cosine_topk(emb, 0, 10, confidence=0.9).toPandas()["vec_id"])
    assert len(exact & got) / 10 >= 0.7  # int8 delta stays small


def test_quantized_hnsw_composition(spark, emb, bounds):
    """Quantized vectors through the unmodified HNSW path
    (Lucene99HnswScalarQuantizedVectorsFormat shape)."""
    from lucene_spark.pipeline.graphann import ann_hnsw_topk
    from lucene_spark.pipeline.quantize import sq_dequant_df, sq_quantize
    from lucene_spark.pipeline.similarity import cosine_topk

    lo, hi = bounds
    qemb = sq_dequant_df(sq_quantize(emb, lo, hi), lo, hi)
    got = set(
        ann_hnsw_topk(qemb, query_id=0, k=10, partitions=2)
        .toPandas()["vec_id"]
    )
    exact = set(cosine_topk(emb, 0, 10).toPandas()["vec_id"])
    assert len(exact & got) / 10 >= 0.6  # graph recall x int8 delta


def test_storage_footprint_is_quartered(spark, emb, bounds, tmp_path):
    import os

    from lucene_spark.pipeline.quantize import sq_quantize

    lo, hi = bounds
    f32 = str(tmp_path / "f32")
    i8 = str(tmp_path / "i8")
    emb.select("vec_id", "embedding").write.parquet(f32)
    sq_quantize(emb, lo, hi).select("vec_id", "qvec").write.parquet(i8)

    def size(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
            if f.endswith(".parquet")
        )

    ratio = size(i8) / size(f32)
    assert ratio < 0.5, ratio  # ~4x cut minus parquet overhead


def test_diversifying_children_over_byte_vectors(spark):
    """DiversifyingChildrenByteKnnVectorQuery (join/
    DiversifyingChildrenByteKnnVectorQuery.java): the byte-vector
    variant is the float query composed over the quantized table —
    sq_dequant_df feeds diversifying_children_topk unchanged, and the
    per-parent dedup still holds (one row per parent, parents
    distinct)."""
    from lucene_spark.pipeline.quantize import (
        sq_dequant_df,
        sq_quantize,
        sq_train,
    )
    from lucene_spark.pipeline.similarity import (
        diversifying_children_topk,
    )
    import pyspark.sql.functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lo, hi = sq_train(emb, confidence=0.9)
    qemb = sq_dequant_df(sq_quantize(emb, lo, hi), lo, hi).withColumn(
        "parent", F.col("vec_id") % 20
    )
    got = diversifying_children_topk(qemb, "parent", query_id=0, k=8)
    pdf = got.toPandas()
    assert len(pdf) == 8
    assert pdf.parent.nunique() == 8  # one best child per parent
    # recall vs the float32 diversified result
    femb = emb.withColumn("parent", F.col("vec_id") % 20)
    want = diversifying_children_topk(
        femb, "parent", query_id=0, k=8
    ).toPandas()
    overlap = len(set(pdf.parent) & set(want.parent))
    assert overlap >= 6, (sorted(pdf.parent), sorted(want.parent))
