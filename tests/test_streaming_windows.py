"""Windowed-aggregation tests: the batch path is oracle-checked by the
gate; here the SAME transformations run as a real Structured Stream
(readStream + watermark + availableNow) and must converge to the batch
answer — the streaming/batch unification contract."""

import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF}/events.parquet")


def _run_stream(spark, make_query, schema, src_dir, ckpt):
    from pyspark.sql import functions as F

    stream = (
        spark.readStream.schema(schema)
        .parquet(src_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    out = make_query(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("win_test")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql("SELECT * FROM win_test")


def test_streaming_tumbling_matches_batch(spark, events, tmp_path):
    from pyspark.sql import functions as F

    from lucene_spark.streaming.windows import TS_FMT

    src = str(tmp_path / "src")
    os.makedirs(src)
    events.coalesce(2).write.mode("append").parquet(src)

    def agg(df):
        return (
            df.withWatermark("ts", "1 hour")
            .groupBy(F.window(F.col("ts"), "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("cnt"))
            .select(
                F.date_format(F.col("w.start"), TS_FMT).alias("win_start"),
                "event_type",
                "cnt",
            )
        )

    got = _run_stream(
        spark, agg, events.schema, src, str(tmp_path / "ck")
    ).toPandas()
    want = agg(events.withColumn("ts", F.col("ts").cast("timestamp"))).toPandas()
    key = ["win_start", "event_type"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got[key + ["cnt"]].equals(want[key + ["cnt"]])
    assert len(got) > 10


def test_streaming_session_matches_batch(spark, events, tmp_path):
    from lucene_spark.streaming.windows import session_counts

    src = str(tmp_path / "src")
    os.makedirs(src)
    events.coalesce(2).write.mode("append").parquet(src)

    def agg(df):
        d = df
        if d.isStreaming:
            d = d.withWatermark("ts", "1 hour")
        return session_counts(d, k=1_000_000)

    got = _run_stream(
        spark, agg, events.schema, src, str(tmp_path / "ck")
    ).toPandas()
    want = agg(events).toPandas()
    key = ["user_id", "sess_start"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert got[key + ["cnt"]].equals(want[key + ["cnt"]])
    assert len(got) > 5
