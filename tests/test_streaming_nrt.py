"""NRT streaming tests: micro-batch appends must converge to the same
index (same stats, same BM25 top-k) as one bulk build over the full
corpus, and the refresh handle must follow manifest generations."""

import os

import pytest


@pytest.fixture(scope="module")
def halves(corpus):
    srt = corpus.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    mid = len(srt) // 2
    return srt.iloc[:mid], srt.iloc[mid:]


def _cfg():
    from lucene_spark.index.builder import IndexConfig

    return IndexConfig(docs_per_segment=100)


def test_append_batches_converge_to_bulk(spark, corpus, halves, tmp_path):
    from lucene_spark.index.builder import build_index
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.executor import IndexReader
    from lucene_spark.streaming.nrt import NrtIndexWriter, append_batch

    h1, h2 = halves
    inc_dir = str(tmp_path / "inc")
    blk_dir = str(tmp_path / "bulk")

    w = NrtIndexWriter(inc_dir, _cfg())
    r0, refreshed = w.maybe_refresh(spark)
    assert r0 is None and not refreshed

    append_batch(spark, spark.createDataFrame(h1), inc_dir, _cfg())
    r1, refreshed = w.maybe_refresh(spark)
    assert refreshed and r1.manifest["num_docs_total"] == len(h1)
    # searchable immediately after first flush
    top1 = sp.bool_bm25_topk(r1, "content", must=["def"]).collect()
    assert top1

    append_batch(spark, spark.createDataFrame(h2), inc_dir, _cfg())
    r2, refreshed = w.maybe_refresh(spark)
    assert refreshed and r2.manifest["num_docs_total"] == len(corpus)
    _, again = w.maybe_refresh(spark)
    assert not again  # no new generation -> no reopen

    build_index(spark, spark.createDataFrame(corpus), blk_dir, _cfg())
    rb = IndexReader(spark, blk_dir)

    # identical collection stats and identical BM25 results
    assert r2.collection_stats("content") == rb.collection_stats("content")
    for must in (["def"], ["return", "import"]):
        got = [
            (r["doc_id"], r["score_x1e6"])
            for r in sp.bool_bm25_topk(r2, "content", must=must).collect()
        ]
        want = [
            (r["doc_id"], r["score_x1e6"])
            for r in sp.bool_bm25_topk(rb, "content", must=must).collect()
        ]
        assert got == want and got


def test_structured_streaming_file_source(spark, halves, tmp_path):
    """Real readStream -> foreachBatch -> availableNow pipeline: files
    dropped into a directory appear in search results after refresh."""
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.streaming.nrt import NrtIndexWriter

    h1, h2 = halves
    in_dir = str(tmp_path / "in")
    idx_dir = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(in_dir)

    src1 = spark.createDataFrame(h1)
    src1.coalesce(1).write.mode("append").parquet(in_dir)
    schema = src1.schema

    w = NrtIndexWriter(idx_dir, _cfg())

    def run_available():
        q = (
            spark.readStream.schema(schema)
            .parquet(in_dir)
            .writeStream.foreachBatch(w.foreach_batch)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_available()
    r1, refreshed = w.maybe_refresh(spark)
    assert refreshed and r1.manifest["num_docs_total"] == len(h1)

    spark.createDataFrame(h2).coalesce(1).write.mode("append").parquet(in_dir)
    run_available()
    r2, refreshed = w.maybe_refresh(spark)
    assert refreshed and r2.manifest["num_docs_total"] == len(h1) + len(h2)
    assert sp.bool_bm25_topk(r2, "content", must=["def"]).collect()


def test_wait_for_generation(spark, halves, tmp_path):
    """ControlledRealTimeReopenThread role: a caller blocks until the
    generation carrying its write is committed, and the reader handed
    back sees that write; an unreachable generation times out."""
    import threading
    import time

    import pytest as _pytest

    from lucene_spark.index.builder import IndexConfig
    from lucene_spark.streaming.nrt import NrtIndexWriter, append_batch

    a, b = halves
    idx = str(tmp_path / "nrt_wait")
    cfg = IndexConfig(docs_per_segment=60)
    w = NrtIndexWriter(idx, cfg)
    append_batch(spark, spark.createDataFrame(a), idx, cfg)
    g1 = w.current_generation()

    # a writer thread commits the second batch after a delay; the
    # waiting reader must block past g1 and then see batch-2 docs
    def later():
        time.sleep(0.8)
        append_batch(spark, spark.createDataFrame(b), idx, cfg)

    t = threading.Thread(target=later)
    t.start()
    reader = w.wait_for_generation(spark, g1 + 1, timeout_s=30.0)
    t.join()
    assert reader.manifest["generation"] >= g1 + 1
    total = reader.docs().count()
    assert total == len(a) + len(b)

    with _pytest.raises(TimeoutError):
        w.wait_for_generation(spark, 10_000, timeout_s=0.3)
