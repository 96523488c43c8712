"""Search time limiting — lucene_spark/search/timeout.py
(TimeLimitingCollector / IndexSearcher.setTimeout semantics)."""

import time

import pytest
from pyspark.sql import functions as F, types as T

from lucene_spark.search.timeout import TimeExceededError, timed_collect


def _slow_df(spark, per_row_sec=0.5, rows=64):
    @F.udf(returnType=T.LongType())
    def snooze(x):
        time.sleep(per_row_sec)
        return x

    return spark.range(rows).repartition(8).select(snooze("id").alias("v"))


def test_fast_query_unaffected(spark):
    rows, timed_out = timed_collect(spark.range(100).selectExpr("sum(id) s"), 60.0)
    assert not timed_out
    assert rows[0]["s"] == 4950


def test_slow_query_times_out_and_cancels(spark):
    start = time.monotonic()
    rows, timed_out = timed_collect(_slow_df(spark), 2.0)
    elapsed = time.monotonic() - start
    assert timed_out and rows == []
    # the watchdog fired near the budget, not after the full ~4s+ the
    # query needs (64 rows x 0.5s over 8 partitions x 32 threads)
    assert elapsed < 20.0
    # the session survives the cancellation (TimerThread leaves the
    # searcher reusable)
    assert spark.range(10).count() == 10


def test_raise_on_timeout_contract(spark):
    with pytest.raises(TimeExceededError) as ei:
        timed_collect(_slow_df(spark), 1.5, raise_on_timeout=True)
    assert ei.value.timeout_sec == 1.5
    assert ei.value.elapsed_sec >= 1.5
    assert spark.range(5).count() == 5
