"""Search time limiting — the TimeLimitingCollector family.

Reference: ``core/search/TimeLimitingCollector.java`` (wraps a
collector, throws TimeExceededException past the allowed ticks),
``IndexSearcher.setTimeout`` + ``TimeLimitingBulkScorer.java`` (scoring
proceeds in chunks, ``searchAfter`` partial flag), and
``core/index/ExitableDirectoryReader.java`` (QueryTimeout checks inside
terms/points iteration).

Spark mapping: a query is one or more Spark jobs, and the cancellation
point Spark actually honors is the JOB — so the timeout wraps the
collecting action in a watchdog that cancels the query's job group
(``SparkContext.cancelJobGroup``) when the clock runs out, the exact
role of TimeLimitingCollector's TimerThread. ``interruptOnCancel``
interrupts running tasks like the reference's thread interrupt.

Divergence, documented: Lucene's greedy/partial modes can surface the
hits collected before the deadline; a cancelled Spark collect returns
nothing, so ``timed_out=True`` comes with an EMPTY partial result (the
``TopDocs`` you get from ``IndexSearcher.setTimeout`` with
``partialResult == true`` and zero collected docs). Callers needing
progressive results page with searchAfter instead — each page is then
individually time-boxed, which is how the reference's chunked
TimeLimitingBulkScorer behaves at page granularity.

100-TB shape: cancellation is driver-side control flow; no extra jobs,
no polling tasks. The watchdog thread is O(1) per query.
"""

from __future__ import annotations

import threading
import uuid

from pyspark.sql import DataFrame

__all__ = ["TimeExceededError", "timed_collect"]


class TimeExceededError(Exception):
    """TimeLimitingCollector.TimeExceededException: carries the allowed
    budget and how long the query actually ran before cancellation."""

    def __init__(self, timeout_sec: float, elapsed_sec: float):
        self.timeout_sec = timeout_sec
        self.elapsed_sec = elapsed_sec
        super().__init__(
            f"query time exceeded: {elapsed_sec:.2f}s > {timeout_sec:.2f}s"
        )


def timed_collect(
    df: DataFrame,
    timeout_sec: float,
    raise_on_timeout: bool = False,
):
    """Collect ``df`` under a wall-clock budget.

    Returns ``(rows, timed_out)``. On timeout the job group is
    cancelled (running tasks interrupted) and ``rows`` is ``[]``; with
    ``raise_on_timeout`` the TimeLimitingCollector contract applies and
    :class:`TimeExceededError` is raised instead.
    """
    import time

    sc = df.sparkSession.sparkContext
    group = f"lucene-spark-timed-{uuid.uuid4().hex[:12]}"
    out: dict = {}
    start = time.monotonic()

    def run():
        # job-group registration is thread-local: set it on the thread
        # that submits the job, so cancelJobGroup hits exactly this query
        sc.setJobGroup(group, "timed_collect", interruptOnCancel=True)
        try:
            out["rows"] = df.collect()
        except Exception as exc:  # cancellation surfaces as a job error
            out["error"] = exc
        finally:
            sc.setJobGroup("", "")

    t = threading.Thread(target=run, daemon=True)
    t.start()
    t.join(timeout_sec)
    if t.is_alive():
        sc.cancelJobGroup(group)
        t.join(30.0)  # let the cancellation unwind
        elapsed = time.monotonic() - start
        if raise_on_timeout:
            raise TimeExceededError(timeout_sec, elapsed)
        return [], True
    if "error" in out:
        raise out["error"]
    return out["rows"], False
