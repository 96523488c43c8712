"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship boolean-BM25 query over the sf0.001
``documents`` table through the full engine (index build -> postings ->
JVM float64 scoring). ``queries()``/``oracle_sql()`` pair every
implemented operator with DuckDB-checkable ANSI SQL (lucene_spark.gate).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from lucene_spark.gate import flagship

    return flagship(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from lucene_spark.gate import gate_queries

    return dict(gate_queries())


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents for every queries() entry."""
    from lucene_spark.gate import gate_oracle_sql

    return dict(gate_oracle_sql())
