"""Date-range prefix tree: NumberRangePrefixTreeStrategy +
DateRangePrefixTree faceting over per-document DATE RANGES.

Reference contracts:
- spatial-extras/prefix/tree/DateRangePrefixTree.java — calendar
  levels (…year -> month -> day -> hour …; FIELD_BY_LEVEL with
  YEAR_LEVEL=3); a stored range is decomposed into a MINIMAL cover of
  calendar-aligned cells (a fully-covered month becomes one month
  cell, partial months split into day cells, etc.).
- spatial-extras/prefix/NumberRangePrefixTreeStrategy.java calcFacets
  (:83-158) + prefix/PrefixTreeFacetCounter.java — facet counts inside
  a facet range at a detail level, reported in three tiers:
  * ``topLeaves``  — leaf cells 2+ levels above detail (doc ranges
    spanning whole grandparents; one count per leaf cell visited),
  * per-parent ``parentLeaves`` — leaf cells AT the parent level (doc
    ranges spanning that whole parent),
  * per-parent ``childCounts`` — leaf cells at the detail level.
  Presentation adds topLeaves + parentLeaves[parent(c)] +
  childCounts[c] for a cell c's total (Facets.FacetParentVal javadoc).

Spark-first design — the closed form instead of the term walk: the
reference computes the tiers by walking index TERMS because postings
are its only access path.  Over columnar storage the same numbers have
a direct relational characterization (proved in
tests/test_daterange.py against a literal to_cells decomposition):

  leaf cell at level L for doc d  <=>  d's range fully covers that
  level-L cell but NOT its level-(L-1) parent

so with day detail inside a month-aligned facet range [fs, fe]:
  childCounts[day]    = #docs intersecting day, not covering its month
  parentLeaves[month] = #docs covering month, not covering its year
  topLeaves           = sum over years Y intersecting [fs, fe] of
                        #docs covering Y           (one per leaf cell)

Each tier is one conditional aggregation over an interval join against
a GENERATED calendar spine (sequence() explode) — map-side combined,
single shuffle, no UDF; this is what a 100-TB date facet should be.
The supported detail levels here are month (parents = years) and day
(parents = months), the calcFacets(start, end) convenience rule
detail = max(level(start), level(end)) + 1
(NumberRangePrefixTreeStrategy.java:70-76).

The deepest sub-day levels of the reference tree (hour/minute/second/
millisecond) follow the identical algebra one level down and are
omitted from the fixture, not from the design.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# Literal tree decomposition (the DateRangePrefixTree cell cover) —
# used by tests to prove the closed form; levels: 1=year 2=month 3=day
# ---------------------------------------------------------------------------


def _month_first(d: _dt.date) -> _dt.date:
    return d.replace(day=1)


def _month_last(d: _dt.date) -> _dt.date:
    nxt = (d.replace(day=28) + _dt.timedelta(days=4)).replace(day=1)
    return nxt - _dt.timedelta(days=1)


def to_cells(start: _dt.date, end: _dt.date) -> list[str]:
    """Minimal calendar-aligned cover of [start, end] (both inclusive),
    as cell strings: 'YYYY' / 'YYYY-MM' / 'YYYY-MM-DD' — the
    DateRangePrefixTree leaf decomposition restricted to the
    year/month/day levels."""
    if start > end:
        raise ValueError("start after end")
    cells: list[str] = []
    cur = start
    while cur <= end:
        # whole year?
        if (cur.month, cur.day) == (1, 1):
            yend = _dt.date(cur.year, 12, 31)
            if yend <= end:
                cells.append(f"{cur.year:04d}")
                cur = yend + _dt.timedelta(days=1)
                continue
        # whole month?
        if cur.day == 1:
            mend = _month_last(cur)
            if mend <= end:
                cells.append(f"{cur.year:04d}-{cur.month:02d}")
                cur = mend + _dt.timedelta(days=1)
                continue
        cells.append(cur.isoformat())
        cur += _dt.timedelta(days=1)
    return cells


# ---------------------------------------------------------------------------
# Deterministic stored-range fixture over the documents table
# ---------------------------------------------------------------------------

_START_EXPR = "date_add(DATE'2013-06-01', CAST(doc_id % 600 AS INT))"
_SPAN_EXPR = "CAST((doc_id * 7) % 700 AS INT)"


def synthesize_ranges(docs: DataFrame) -> DataFrame:
    """-> (doc_id, r_start DATE, r_end DATE); exact integer date math,
    identical values in any engine."""
    return docs.select(
        "doc_id",
        F.expr(_START_EXPR).alias("r_start"),
        F.expr(f"date_add({_START_EXPR}, {_SPAN_EXPR})").alias("r_end"),
    )


def ranges_sql() -> str:
    """DuckDB CTE twin named ``rg`` (DuckDB date arithmetic; same
    integer day offsets, so identical dates)."""
    return """rg AS (
  SELECT doc_id,
    DATE '2013-06-01' + CAST(doc_id % 600 AS INT) AS r_start,
    DATE '2013-06-01' + CAST(doc_id % 600 AS INT)
      + CAST((doc_id * 7) % 700 AS INT) AS r_end
  FROM documents
)"""


# ---------------------------------------------------------------------------
# Facets
# ---------------------------------------------------------------------------


def date_range_facets(
    ranges: DataFrame,
    facet_start: str,
    facet_end: str,
    detail: str = "day",
) -> DataFrame:
    """NumberRangePrefixTreeStrategy.calcFacets over [facet_start,
    facet_end] (inclusive, aligned to the parent level) at ``detail``
    in {'day', 'month'}.  -> rows (tier, cell, count):

    - ('top',    '',          topLeaves)     — always present, may be 0
    - ('parent', 'YYYY-MM',   parentLeaves)  — nonzero only (sparse,
      like Facets.parents)
    - ('child',  'YYYY-MM-DD', count)        — nonzero only
    """
    if detail not in ("day", "month"):
        raise ValueError("detail must be 'day' or 'month'")
    fs, fe = f"DATE'{facet_start}'", f"DATE'{facet_end}'"
    spark = ranges.sparkSession
    # Plan shape (see BENCH/PLANS.md): every tier is an EXPLODE of the
    # doc's facet-clipped calendar sequence followed by one map-side
    # -combined groupBy — no join against a spine at all, so the 100x
    # plan is a narrow scan + one shuffle of O(matching cells) rows.
    clipped = ranges.filter(
        F.expr(f"r_start <= {fe} AND r_end >= {fs}")
    )
    if detail == "day":
        child = (
            clipped.select(
                F.explode(
                    F.expr(
                        f"sequence(greatest(r_start, {fs}),"
                        f" least(r_end, {fe}), interval 1 day)"
                    )
                ).alias("cell_d"),
                "r_start", "r_end",
            )
            .filter(
                F.expr(
                    "NOT (r_start <= date_trunc('MONTH', cell_d)"
                    " AND r_end >= last_day(cell_d))"
                )
            )
            .groupBy("cell_d")
            .count()
            .select(
                F.lit("child").alias("tier"),
                F.date_format("cell_d", "yyyy-MM-dd").alias("cell"),
                F.col("count"),
            )
        )
        parent = (
            clipped.select(
                F.explode(
                    F.expr(
                        f"sequence(date_trunc('MONTH', greatest(r_start, {fs})),"
                        f" date_trunc('MONTH', least(r_end, {fe})),"
                        " interval 1 month)"
                    )
                ).alias("m"),
                "r_start", "r_end",
            )
            .filter(
                F.expr(
                    "r_start <= m AND r_end >= last_day(m)"
                    " AND NOT (r_start <= date_trunc('YEAR', m)"
                    " AND r_end >= date_add(date_trunc('YEAR',"
                    " add_months(m, 12)), -1))"
                )
            )
            .groupBy("m")
            .count()
            .select(
                F.lit("parent").alias("tier"),
                F.date_format("m", "yyyy-MM").alias("cell"),
                F.col("count"),
            )
        )
        # topLeaves: one counted row per (doc, fully-covered year in
        # the facet window) — the explode is at most a few cells/doc
        top = (
            clipped.select(
                F.explode(
                    F.expr(
                        f"sequence(date_trunc('YEAR', greatest(r_start, {fs})),"
                        f" date_trunc('YEAR', least(r_end, {fe})),"
                        " interval 1 year)"
                    )
                ).alias("y"),
                "r_start", "r_end",
            )
            .filter(
                F.expr(
                    "r_start <= y AND r_end >="
                    " date_add(date_trunc('YEAR', add_months(y, 12)), -1)"
                )
            )
            .agg(F.count(F.lit(1)).alias("count"))
            .select(
                F.lit("top").alias("tier"),
                F.lit("").alias("cell"),
                F.col("count").cast("long").alias("count"),
            )
        )
    else:  # month detail, parents = years, topLeaves = world leaves = 0
        child = (
            clipped.select(
                F.explode(
                    F.expr(
                        f"sequence(date_trunc('MONTH', greatest(r_start, {fs})),"
                        f" date_trunc('MONTH', least(r_end, {fe})),"
                        " interval 1 month)"
                    )
                ).alias("m"),
                "r_start", "r_end",
            )
            .filter(
                F.expr(
                    "m >= date_trunc('MONTH', " + fs + ")"
                    " AND m <= " + fe + ""
                    " AND r_start <= last_day(m) AND r_end >= m"
                    " AND NOT (r_start <= date_trunc('YEAR', m)"
                    " AND r_end >= date_add(date_trunc('YEAR',"
                    " add_months(m, 12)), -1))"
                )
            )
            .groupBy("m")
            .count()
            .select(
                F.lit("child").alias("tier"),
                F.date_format("m", "yyyy-MM").alias("cell"),
                F.col("count"),
            )
        )
        parent = (
            clipped.select(
                F.explode(
                    F.expr(
                        f"sequence(date_trunc('YEAR', greatest(r_start, {fs})),"
                        f" date_trunc('YEAR', least(r_end, {fe})),"
                        " interval 1 year)"
                    )
                ).alias("y"),
                "r_start", "r_end",
            )
            .filter(
                F.expr(
                    "r_start <= y AND r_end >="
                    " date_add(date_trunc('YEAR', add_months(y, 12)), -1)"
                )
            )
            .groupBy("y")
            .count()
            .select(
                F.lit("parent").alias("tier"),
                F.date_format("y", "yyyy").alias("cell"),
                F.col("count"),
            )
        )
        top = spark.range(1).select(
            F.lit("top").alias("tier"),
            F.lit("").alias("cell"),
            F.lit(0).cast("long").alias("count"),
        )
    return child.unionByName(parent).unionByName(top).orderBy("tier", "cell")


def date_range_facets_sql(
    facet_start: str, facet_end: str, detail: str = "day"
) -> str:
    """DuckDB twin over the shared ``rg`` fixture."""
    if detail not in ("day", "month"):
        raise ValueError("detail must be 'day' or 'month'")
    fs, fe = f"DATE '{facet_start}'", f"DATE '{facet_end}'"
    if detail == "day":
        return f"""WITH {ranges_sql()},
days AS (SELECT unnest(generate_series({fs}, {fe}, INTERVAL 1 DAY))::DATE AS d),
months AS (SELECT unnest(generate_series(date_trunc('month', {fs}),
  date_trunc('month', {fe}), INTERVAL 1 MONTH))::DATE AS m),
years AS (SELECT unnest(generate_series(date_trunc('year', {fs}),
  date_trunc('year', {fe}), INTERVAL 1 YEAR))::DATE AS y)
SELECT 'child' AS tier, strftime(d, '%Y-%m-%d') AS cell, COUNT(*) AS count
FROM days JOIN rg ON r_start <= d AND r_end >= d
  AND NOT (r_start <= date_trunc('month', d)
           AND r_end >= last_day(d))
GROUP BY d
UNION ALL
SELECT 'parent', strftime(m, '%Y-%m'), COUNT(*)
FROM months JOIN rg ON r_start <= m AND r_end >= last_day(m)
  AND NOT (r_start <= date_trunc('year', m)
           AND r_end >= date_trunc('year', m) + INTERVAL 1 YEAR - INTERVAL 1 DAY)
GROUP BY m
UNION ALL
SELECT 'top', '', COUNT(doc_id)
FROM years LEFT JOIN rg ON r_start <= y
  AND r_end >= y + INTERVAL 1 YEAR - INTERVAL 1 DAY
ORDER BY tier, cell"""
    return f"""WITH {ranges_sql()},
months AS (SELECT unnest(generate_series({fs}, {fe}, INTERVAL 1 MONTH))::DATE AS m),
years AS (SELECT unnest(generate_series(date_trunc('year', {fs}),
  date_trunc('year', {fe}), INTERVAL 1 YEAR))::DATE AS y)
SELECT 'child' AS tier, strftime(m, '%Y-%m') AS cell, COUNT(*) AS count
FROM months JOIN rg ON r_start <= last_day(m) AND r_end >= m
  AND NOT (r_start <= date_trunc('year', m)
           AND r_end >= date_trunc('year', m) + INTERVAL 1 YEAR - INTERVAL 1 DAY)
GROUP BY m
UNION ALL
SELECT 'parent', strftime(y, '%Y'), COUNT(*)
FROM years JOIN rg ON r_start <= y
  AND r_end >= y + INTERVAL 1 YEAR - INTERVAL 1 DAY
GROUP BY y
UNION ALL
SELECT 'top', '', 0
ORDER BY tier, cell"""


def date_range_intersects(
    ranges: DataFrame, start: str, end: str, k: int = 50
) -> DataFrame:
    """The strategy's Intersects query (RecursivePrefixTreeStrategy
    makeQuery over a NumberRangePrefixTree range shape): stored ranges
    overlapping [start, end].  One codegen interval predicate — the
    prefix-tree terms exist in the reference because postings are the
    access path; a columnar scan needs only the two comparisons.
    -> (doc_id, r_start, r_end as ISO strings)."""
    return (
        ranges.filter(
            F.expr(f"r_start <= DATE'{end}' AND r_end >= DATE'{start}'")
        )
        .select(
            "doc_id",
            F.date_format("r_start", "yyyy-MM-dd").alias("r_start"),
            F.date_format("r_end", "yyyy-MM-dd").alias("r_end"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def date_range_intersects_sql(start: str, end: str, k: int = 50) -> str:
    return f"""WITH {ranges_sql()}
SELECT doc_id, strftime(r_start, '%Y-%m-%d') AS r_start,
       strftime(r_end, '%Y-%m-%d') AS r_end
FROM rg WHERE r_start <= DATE '{end}' AND r_end >= DATE '{start}'
ORDER BY doc_id LIMIT {k}"""
