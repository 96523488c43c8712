"""DateRangePrefixTree cell decomposition + the calcFacets tier
identity (spatial-extras prefix/tree/DateRangePrefixTree.java,
prefix/NumberRangePrefixTreeStrategy.java:83-158).

The engine computes the three facet tiers in closed form (conditional
aggregations); these tests prove that form equals the reference's
term-walk over the literal minimal-cover decomposition.
"""

import datetime as dt
import random

import pytest

from lucene_spark.search.daterange import to_cells


def D(s):
    return dt.date.fromisoformat(s)


# ------------------------- decomposition -------------------------------


def test_cells_javadoc_example():
    # March 3rd to May 20th: day cells for the March tail, one April
    # month cell, day cells for the May head
    cells = to_cells(D("2014-03-03"), D("2014-05-20"))
    assert "2014-04" in cells
    assert "2014-03" not in cells and "2014-05" not in cells
    assert cells.count("2014-04") == 1
    days = [c for c in cells if len(c) == 10]
    assert days[0] == "2014-03-03" and days[-1] == "2014-05-20"
    assert len(days) == 29 + 20  # Mar 3..31 + May 1..20


def test_cells_full_year_collapses():
    assert to_cells(D("2014-01-01"), D("2014-12-31")) == ["2014"]
    cells = to_cells(D("2013-12-31"), D("2015-01-01"))
    assert "2014" in cells
    assert cells == ["2013-12-31", "2014", "2015-01-01"]


def test_cells_single_day_and_month():
    assert to_cells(D("2014-07-04"), D("2014-07-04")) == ["2014-07-04"]
    assert to_cells(D("2014-07-01"), D("2014-07-31")) == ["2014-07"]


def test_cells_cover_exactly():
    """The cover is exact and minimal: expanding every cell back to
    days reproduces [start, end] with no overlap."""
    rng = random.Random(42)
    base = D("2013-01-01")
    for _ in range(50):
        s = base + dt.timedelta(days=rng.randrange(0, 900))
        e = s + dt.timedelta(days=rng.randrange(0, 800))
        days = set()
        for c in to_cells(s, e):
            if len(c) == 4:
                d0, d1 = D(f"{c}-01-01"), D(f"{c}-12-31")
            elif len(c) == 7:
                d0 = D(f"{c}-01")
                d1 = (d0.replace(day=28) + dt.timedelta(days=4)).replace(
                    day=1
                ) - dt.timedelta(days=1)
            else:
                d0 = d1 = D(c)
            cur = d0
            while cur <= d1:
                assert cur not in days  # no overlap
                days.add(cur)
                cur += dt.timedelta(days=1)
        want = {
            s + dt.timedelta(days=i) for i in range((e - s).days + 1)
        }
        assert days == want


# ----------------------- tier identity ---------------------------------


def _tiers_from_cells(ranges, fs, fe):
    """The reference's PrefixTreeFacetCounter walk at day detail: count
    leaf cells by level within the facet range."""
    top = 0
    parent = {}
    child = {}
    months = set()
    cur = fs.replace(day=1)
    while cur <= fe:
        months.add((cur.year, cur.month))
        cur = (cur.replace(day=28) + dt.timedelta(days=4)).replace(day=1)
    years = {y for y, _m in months}
    for s, e in ranges:
        for c in to_cells(s, e):
            if len(c) == 4:  # year leaf — an ancestor-of-parent cell
                if int(c) in years:
                    top += 1
            elif len(c) == 7:  # month leaf — parent level
                y, m = int(c[:4]), int(c[5:])
                if (y, m) in months:
                    parent[c] = parent.get(c, 0) + 1
            else:  # day leaf — detail level
                d = D(c)
                if fs <= d <= fe:
                    child[c] = child.get(c, 0) + 1
    return top, parent, child


def _tiers_closed_form(ranges, fs, fe):
    """The engine's conditional-aggregation characterization."""
    top = 0
    parent = {}
    child = {}
    cur = fs
    while cur <= fe:
        key = cur.isoformat()
        for s, e in ranges:
            m0 = cur.replace(day=1)
            m1 = (m0.replace(day=28) + dt.timedelta(days=4)).replace(
                day=1
            ) - dt.timedelta(days=1)
            if s <= cur <= e and not (s <= m0 and e >= m1):
                child[key] = child.get(key, 0) + 1
        cur += dt.timedelta(days=1)
    mcur = fs.replace(day=1)
    while mcur <= fe:
        m1 = (mcur.replace(day=28) + dt.timedelta(days=4)).replace(
            day=1
        ) - dt.timedelta(days=1)
        y0, y1 = mcur.replace(month=1, day=1), mcur.replace(
            month=12, day=31
        )
        key = f"{mcur.year:04d}-{mcur.month:02d}"
        for s, e in ranges:
            if s <= mcur and e >= m1 and not (s <= y0 and e >= y1):
                parent[key] = parent.get(key, 0) + 1
        mcur = (mcur.replace(day=28) + dt.timedelta(days=4)).replace(day=1)
    for y in range(fs.year, fe.year + 1):
        y0, y1 = dt.date(y, 1, 1), dt.date(y, 12, 31)
        for s, e in ranges:
            if s <= y0 and e >= y1:
                top += 1
    return top, parent, child


def test_tier_identity_random_ranges():
    """closed form == term walk on 200 random ranges (this is the
    correctness argument for computing the facets without building the
    term index)."""
    rng = random.Random(7)
    base = D("2013-01-01")
    ranges = []
    for _ in range(200):
        s = base + dt.timedelta(days=rng.randrange(0, 900))
        e = s + dt.timedelta(days=rng.randrange(0, 800))
        ranges.append((s, e))
    fs, fe = D("2014-03-01"), D("2014-10-31")
    assert _tiers_from_cells(ranges, fs, fe) == _tiers_closed_form(
        ranges, fs, fe
    )


def test_presentation_sum_is_intersect_count():
    """Facets javadoc: a cell's displayed count = topLeaves +
    parentLeaves[parent] + childCounts[cell] — and that sum equals the
    plain #docs-intersecting-the-day (facet range within one year)."""
    rng = random.Random(3)
    base = D("2013-06-01")
    ranges = []
    for _ in range(300):
        s = base + dt.timedelta(days=rng.randrange(0, 600))
        e = s + dt.timedelta(days=rng.randrange(0, 700))
        ranges.append((s, e))
    fs, fe = D("2014-03-01"), D("2014-10-31")
    top, parent, child = _tiers_from_cells(ranges, fs, fe)
    for probe in ["2014-03-15", "2014-04-01", "2014-07-31", "2014-10-02"]:
        d = D(probe)
        shown = (
            top
            + parent.get(probe[:7], 0)
            + child.get(probe, 0)
        )
        brute = sum(1 for s, e in ranges if s <= d <= e)
        assert shown == brute, probe


# ------------------------- Spark side ----------------------------------


def test_spark_facets_match_python(spark):
    from lucene_spark.search.daterange import (
        date_range_facets,
        synthesize_ranges,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rg = synthesize_ranges(docs)
    pdf = rg.toPandas()
    ranges = [
        (r.r_start, r.r_end) for r in pdf.itertuples()
    ]
    fs, fe = D("2014-03-01"), D("2014-10-31")
    top, parent, child = _tiers_from_cells(ranges, fs, fe)
    out = date_range_facets(
        rg, "2014-03-01", "2014-10-31", detail="day"
    ).toPandas()
    got_top = int(out[out.tier == "top"]["count"].iloc[0])
    got_parent = dict(
        zip(out[out.tier == "parent"].cell, out[out.tier == "parent"]["count"])
    )
    got_child = dict(
        zip(out[out.tier == "child"].cell, out[out.tier == "child"]["count"])
    )
    assert got_top == top
    assert {k: int(v) for k, v in got_parent.items()} == parent
    assert {k: int(v) for k, v in got_child.items()} == child


def test_spark_month_detail(spark):
    from lucene_spark.search.daterange import (
        date_range_facets,
        synthesize_ranges,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rg = synthesize_ranges(docs)
    out = date_range_facets(
        rg, "2013-01-01", "2015-12-01", detail="month"
    ).toPandas()
    # world-level leaves cannot exist -> topLeaves always 0
    assert int(out[out.tier == "top"]["count"].iloc[0]) == 0
    # a parent year count means that year is fully covered by the doc
    pdf = rg.toPandas()
    for r in out[out.tier == "parent"].itertuples():
        y = int(r.cell)
        want = sum(
            1
            for t in pdf.itertuples()
            if t.r_start <= dt.date(y, 1, 1) and t.r_end >= dt.date(y, 12, 31)
        )
        assert int(r.count) == want


def test_detail_level_guard(spark):
    from lucene_spark.search.daterange import date_range_facets
    import pyspark.sql.functions as F

    rg = spark.range(1).select(
        F.col("id").alias("doc_id"),
        F.expr("DATE'2014-01-01'").alias("r_start"),
        F.expr("DATE'2014-02-01'").alias("r_end"),
    )
    with pytest.raises(ValueError):
        date_range_facets(rg, "2014-01-01", "2014-02-01", detail="hour")
