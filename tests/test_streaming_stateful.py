"""applyInPandasWithState custom operator: streaming first-wins dedup —
per-key state suppresses re-occurrences across micro-batches."""

import os

from pyspark.sql import functions as F


def test_streaming_dedup_first_wins(spark, tmp_path):
    from lucene_spark.streaming.stateful import streaming_dedup

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    # batch 1: keys a (docs 1, 3), b (doc 2); batch 2: a again (doc 0!),
    # c (doc 9). First-wins: a -> 1 (batch-1 min, NOT the later 0).
    b1 = spark.createDataFrame(
        [(1, "a"), (3, "a"), (2, "b")], "doc_id long, k string"
    )
    b2 = spark.createDataFrame(
        [(0, "a"), (9, "c")], "doc_id long, k string"
    )
    b1.coalesce(1).write.mode("append").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_dedup(stream, key_col="k")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {
        r["dedup_key"]: r["doc_id"]
        for r in spark.sql("SELECT * FROM dedup_test").collect()
    }
    assert rows["b"] == 2 and rows["c"] == 9
    assert rows["a"] in (0, 1)  # 1 if the files split into two batches
    # exactly one row per key regardless of duplicates
    cnt = (
        spark.sql("SELECT dedup_key, count(*) c FROM dedup_test GROUP BY 1")
        .filter(F.col("c") > 1)
        .count()
    )
    assert cnt == 0
    # file order is commit order with maxFilesPerTrigger=1, so batch 1
    # wins for key a
    assert rows["a"] == 1
