"""Locale-collated sort — the ICUCollationKeyAnalyzer role.

Reference: ``lucene/analysis/icu/src/java/org/apache/lucene/collation/
ICUCollationKeyAnalyzer.java`` (+ ``ICUCollationAttributeFactory`` /
``ICUCollationDocValuesField``): index each value's ICU CollationKey
bytes so that BYTE order of the indexed field equals the locale's
collated order — locale-correct sorting and range filtering without
running a collator per comparison at query time.

Spark-first mapping: Spark 4's collated string types carry exactly
this contract inside Catalyst — a column cast with
``collate(col, '<locale>')`` sorts, compares and range-filters under
the ICU collation for that locale, JVM-side, with the collation key
materialization handled by the engine (UTF8String -> ICU sort key,
the same ICU machinery the reference calls). So the "indexed key
bytes" role maps to declaring the collation on the sort expression
and letting Catalyst own the physical key, rather than storing a
binary column by hand: the plan stays whole-stage-codegen, and any
engine (Spark, DuckDB via ``COLLATE``) reproduces the identical
order, which is what makes the gate's cross-engine oracle possible.

Scale shape: ``orderBy(collated).limit(k)`` is a TakeOrderedAndProject
— per-partition top-k + driver k-merge, no full sort, no shuffle of
the losers. The rank column is computed AFTER the limit over <= k
rows (tiny unpartitioned window), so result order is verifiable by an
order-insensitive row-set compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["collation_sort_topk", "collation_range_filter"]


def _collated(name_col: str, locale: str):
    if not locale.replace("_", "").isalnum():
        raise ValueError(f"bad locale {locale!r}")
    return F.expr(f"collate({name_col}, '{locale}')")


def collation_sort_topk(
    docs: DataFrame, name_col: str, locale: str, k: int = 10
) -> DataFrame:
    """Top-k doc ids under the locale's ICU collation of ``name_col``
    (ties by doc_id ASC) -> (doc_id, rank) with rank 1..k in collated
    order — the ICUCollationKeyAnalyzer sort, Sort-by-SortField(STRING)
    analog with a collated key."""
    key = _collated(name_col, locale)
    top = docs.orderBy(key.asc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(
        _collated(name_col, locale).asc(), F.col("doc_id").asc()
    )
    return top.select(
        "doc_id", F.row_number().over(w).cast("long").alias("rank")
    )


def collation_range_filter(
    docs: DataFrame,
    name_col: str,
    locale: str,
    lo: str,
    hi: str,
) -> DataFrame:
    """Locale-collated term-range filter (the
    ICUCollationDocValuesField range use: lower/upper bounds compare
    under the collation, so e.g. 'ä' falls inside ['a','b') under
    'de') -> (doc_id) of docs whose value is in [lo, hi)."""
    key = _collated(name_col, locale)
    esc = lambda s: s.replace("\\", "\\\\").replace("'", "\\'")
    lo_k = F.expr(f"collate('{esc(lo)}', '{locale}')")
    hi_k = F.expr(f"collate('{esc(hi)}', '{locale}')")
    return docs.filter((key >= lo_k) & (key < hi_k)).select("doc_id")
