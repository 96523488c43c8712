"""Event-time windowed aggregations over the ``events`` table.

The reference has no event-time semantics (SURVEY.md §2.9: Lucene's
"streaming" surface is NRT refresh only), but a 100 TB ingest pipeline
needs them around the index: bucketing ingest volume, rate metrics,
sessionization. These operators are written once and run on BOTH the
batch path (driver oracle gate — identical ANSI SQL) and Structured
Streaming (`readStream` + watermark; tested in
tests/test_streaming_windows.py). All are single-shuffle
groupBy-with-map-side-combine shapes.

Columns are stringified window starts + integer counts/sums so the row
set is engine-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

TS_FMT = "yyyy-MM-dd HH:mm:ss"


def tumbling_counts(events: DataFrame, width: str = "1 hour", k: int = 500) -> DataFrame:
    """Tumbling event-time windows: count + value sum per
    (window, event_type). -> (win_start, event_type, cnt, sum_value_x1e6)."""
    w = F.window(F.col("ts"), width)
    return (
        events.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.sum("value") * 1e6).cast("long").alias("sum_value_x1e6"),
        )
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("win_start"),
            "event_type",
            "cnt",
            "sum_value_x1e6",
        )
        .orderBy("win_start", "event_type")
        .limit(k)
    )


def tumbling_counts_sql(width_sql: str = "1 hour", k: int = 500) -> str:
    trunc = {"1 hour": "hour", "1 day": "day", "1 minute": "minute"}[width_sql]
    return f"""SELECT strftime(date_trunc('{trunc}', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
  event_type, count(*) AS cnt,
  CAST(ROUND(SUM(value)*1000000) AS BIGINT) AS sum_value_x1e6
FROM events GROUP BY 1, 2 ORDER BY win_start, event_type LIMIT {k}"""


def sliding_counts(
    events: DataFrame, width: str = "1 hour", slide: str = "30 minutes", k: int = 200
) -> DataFrame:
    """Sliding windows (width, slide): event counts per window.
    -> (win_start, cnt)."""
    w = F.window(F.col("ts"), width, slide)
    return (
        events.groupBy(w.alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(
            F.date_format(F.col("w.start"), TS_FMT).alias("win_start"), "cnt"
        )
        .orderBy("win_start")
        .limit(k)
    )


def sliding_counts_sql(k: int = 200) -> str:
    """Each event lands in the two 1h/30m windows covering it: the one
    starting at floor_30(ts) and the one 30 minutes before."""
    return f"""WITH f AS (
  SELECT to_timestamp(floor(epoch(ts)/1800)*1800) AS slot FROM events
),
w AS (
  SELECT slot AS win FROM f
  UNION ALL
  SELECT slot - INTERVAL 30 MINUTE AS win FROM f
)
SELECT strftime(win, '%Y-%m-%d %H:%M:%S') AS win_start, count(*) AS cnt
FROM w GROUP BY win ORDER BY win_start LIMIT {k}"""


def session_counts(
    events: DataFrame, gap: str = "10 minutes", k: int = 300
) -> DataFrame:
    """Session windows per user (gap-based): events per session.
    -> (user_id, sess_start, cnt). Streaming-capable via
    F.session_window (state-store backed when run on a stream)."""
    w = F.session_window(F.col("ts"), gap)
    return (
        events.groupBy(w.alias("w"), "user_id")
        .agg(F.count("*").alias("cnt"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), TS_FMT).alias("sess_start"),
            "cnt",
        )
        .orderBy("user_id", "sess_start")
        .limit(k)
    )


def session_counts_sql(gap_minutes: int = 10, k: int = 300) -> str:
    return f"""WITH o AS (
  SELECT user_id, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
              > INTERVAL {gap_minutes} MINUTE
         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS new_sess
  FROM events
),
s AS (
  SELECT user_id, ts,
    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM o
)
SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
       count(*) AS cnt
FROM s GROUP BY user_id, sess_id ORDER BY user_id, sess_start LIMIT {k}"""
