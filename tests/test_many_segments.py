"""Many-segment searcher scale contract (executor.py search path):
with S segments, the driver receives ONLY the per-segment top-k
candidate rows — <= S x k, and <= k per segment — and the TopDocs.merge
result is bit-identical to searching the same corpus as one segment
(summed cross-segment statistics, IndexSearcher top-k merge
tie-breaks). This is the plan shape that holds at 100 TB: per-segment
kernels stream postings, the driver only ever merges S x k rows."""

import numpy as np
import pytest

from lucene_spark.search import query as Q
from lucene_spark.search.executor import IndexReader, IndexSearcher


@pytest.fixture(scope="module")
def many_seg_index(spark, tmp_path_factory):
    from lucene_spark.fixtures import generate_source_files
    from lucene_spark.index.builder import IndexConfig, build_index

    corpus = generate_source_files(256, seed=11)
    src = spark.createDataFrame(corpus)
    many = str(tmp_path_factory.mktemp("manyseg") / "idx")
    build_index(
        spark, src, many, IndexConfig(docs_per_segment=1, num_batches=1)
    )
    one = str(tmp_path_factory.mktemp("oneseg") / "idx")
    build_index(
        spark, src, one,
        IndexConfig(docs_per_segment=100_000, num_batches=1),
    )
    return IndexReader(spark, many), IndexReader(spark, one)


def _a_term(reader):
    from pyspark.sql import functions as F

    row = (
        reader.term_stats_df()
        .filter(F.col("field") == "content")
        .groupBy("term").agg(F.sum("doc_freq").alias("df"))
        .filter(F.col("df") >= 50)
        .orderBy(F.col("df").desc(), "term")
        .head()
    )
    assert row is not None
    return row["term"]


def test_driver_receives_at_most_segments_times_k(many_seg_index, monkeypatch):
    many, _ = many_seg_index
    n_segs = sum(
        len(b["segments"]) for b in many.manifest["batches"]
    )
    assert n_segs >= 256
    term = _a_term(many)
    k = 5

    # patch the CONCRETE frame class (pyspark.sql.DataFrame is an
    # abstract base in Spark 4; classic mode overrides toPandas)
    cls = type(many.postings())
    captured = {}
    orig = cls.toPandas

    def spy(self):
        pdf = orig(self)
        if {"segment_id", "doc_id", "score", "seg_total"} <= set(pdf.columns):
            captured["cand"] = pdf
        return pdf

    monkeypatch.setattr(cls, "toPandas", spy)
    td = IndexSearcher(many).search(Q.TermQuery("content", term), k=k)
    assert len(td.hits) == k
    cand = captured["cand"]
    # the merge-stage bound: never more than S x k rows at the driver,
    # and no single segment contributes more than k
    assert len(cand) <= n_segs * k
    assert int(cand.groupby("segment_id").size().max()) <= k


def test_256_segment_scores_match_single_segment(many_seg_index):
    many, one = many_seg_index
    term = _a_term(one)
    bits = lambda f: np.float32(f).tobytes()
    for q in (
        Q.TermQuery("content", term),
        Q.BooleanQuery(
            should=(Q.TermQuery("content", term),
                    Q.TermQuery("content", "the")),
        ),
    ):
        a = IndexSearcher(many).search(q, k=10)
        b = IndexSearcher(one).search(q, k=10)
        assert [(h.doc_id, bits(h.score)) for h in a.hits] == [
            (h.doc_id, bits(h.score)) for h in b.hits
        ]
        assert a.total_hits == b.total_hits
