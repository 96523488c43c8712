"""DocValuesStats — the misc module's stats collector
(misc/src/java/org/apache/lucene/misc/search/DocValuesStats.java +
DocValuesStatsCollector.java).

Reference semantics: run a query, and over the MATCHING docs accumulate
per-field doc-values statistics — count (docs with a value), missing
(matching docs without one), and for numeric fields min/max/sum/mean
and population variance/stdev (DocValuesStats.java: `variance() =
sumOfSquares/count - mean*mean` shape, accumulated per doc);
SortedDocValuesStats keeps min/max only (ordinal/binary fields have no
arithmetic). LongDocValuesStats / DoubleDocValuesStats /
SortedDocValuesStats / SortedSetDocValuesStats are the concrete
collectors.

Spark mapping: doc values are plain columns of the docs registry
(SURVEY.md §1.1 DocValues row), so the whole collector is ONE
aggregation with map-side partial combine — no collector protocol, no
per-doc Python. The `filter_expr` argument is the query's place: any
Column predicate (or a doc-id set from a search) restricts the scan,
and Catalyst pushes it into the parquet read.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def numeric_doc_values_stats(
    docs: DataFrame, value_col: str, filter_expr: Column | None = None
) -> DataFrame:
    """LongDocValuesStats/DoubleDocValuesStats: one row —
    (count, missing, vmin, vmax, vsum, mean, stdev) over the matching
    docs; stdev is population (the reference divides by count)."""
    if filter_expr is not None:
        docs = docs.filter(filter_expr)
    v = F.col(value_col)
    return docs.agg(
        F.count(v).alias("count"),
        (F.count("*") - F.count(v)).alias("missing"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
        F.sum(v).alias("vsum"),
        F.avg(v).alias("mean"),
        F.coalesce(F.stddev_pop(v), F.lit(0.0)).alias("stdev"),
    )


def sorted_doc_values_stats(
    docs: DataFrame, value_col: str, filter_expr: Column | None = None
) -> DataFrame:
    """SortedDocValuesStats: (count, missing, vmin, vmax) — ordinal
    comparison only."""
    if filter_expr is not None:
        docs = docs.filter(filter_expr)
    v = F.col(value_col)
    return docs.agg(
        F.count(v).alias("count"),
        (F.count("*") - F.count(v)).alias("missing"),
        F.min(v).alias("vmin"),
        F.max(v).alias("vmax"),
    )


def sorted_set_doc_values_stats(
    docs: DataFrame, values_col: str, filter_expr: Column | None = None
) -> DataFrame:
    """SortedSetDocValuesStats over a multi-valued (array) column:
    count/missing are per DOC (a doc with >= 1 value counts once);
    min/max range over every value of every matching doc."""
    if filter_expr is not None:
        docs = docs.filter(filter_expr)
    v = F.col(values_col)
    has = (v.isNotNull() & (F.size(v) > 0)).cast("long")
    return docs.agg(
        F.sum(has).alias("count"),
        (F.count("*") - F.sum(has)).alias("missing"),
        F.min(F.array_min(v)).alias("vmin"),
        F.max(F.array_max(v)).alias("vmax"),
    )
