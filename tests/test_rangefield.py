"""RangeField relation queries — lucene_spark/search/rangefield.py.

Reference semantics: ``core/document/RangeFieldQuery.java`` QueryType
matches rules (INTERSECTS / WITHIN / CONTAINS / CROSSES), replayed
per-dim in Python as ground truth; ``TestIntRangeFieldQueries.java``'s
random-relation strategy is mirrored by the randomized grid. The
indexed path must equal the slow (un-indexed) path and prune files.
"""

import random

import pytest
from pyspark.sql import Row

from lucene_spark.search.rangefield import (
    RANGE_RELATIONS,
    range_index_query_topk,
    range_query_sql,
    range_query_topk,
    write_range_index,
)


def _matches(rel, stored, query):
    """Python replay of RangeFieldQuery.QueryType.matches."""
    def inter():
        return all(
            qhi >= smin and qlo <= smax
            for (smin, smax), (qlo, qhi) in zip(stored, query)
        )

    def within():
        return all(
            qlo <= smin and qhi >= smax
            for (smin, smax), (qlo, qhi) in zip(stored, query)
        )

    def contains():
        return all(
            smin <= qlo and smax >= qhi
            for (smin, smax), (qlo, qhi) in zip(stored, query)
        )

    if any(s is None for rng in stored for s in rng):
        return False
    return {
        "intersects": inter,
        "within": within,
        "contains": contains,
        "crosses": lambda: inter() and not within(),
    }[rel]()


DIMS_1 = [("a_min", "a_max")]
DIMS_2 = [("a_min", "a_max"), ("b_min", "b_max")]


def _rows_2d(n=400, seed=11, nulls=True):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        alo = rng.randint(0, 100)
        blo = rng.randint(0, 100)
        rows.append(
            Row(
                rid=i,
                a_min=None if (nulls and i % 53 == 0) else alo,
                a_max=None if (nulls and i % 53 == 0) else alo + rng.randint(0, 30),
                b_min=blo,
                b_max=blo + rng.randint(0, 30),
            )
        )
    return rows


@pytest.fixture(scope="module")
def ranges_df(spark):
    return spark.createDataFrame(_rows_2d()).cache()


@pytest.mark.parametrize("rel", RANGE_RELATIONS)
def test_relation_matches_reference_replay(spark, ranges_df, rel):
    # CONTAINS needs a query narrower than the stored widths (<= 30)
    # or its truth set is structurally empty
    query = (
        [(40.0, 42.0), (60.0, 62.0)]
        if rel == "contains"
        else [(20.0, 55.0), (40.0, 90.0)]
    )
    got = [
        r["doc_id"]
        for r in range_query_topk(
            ranges_df, DIMS_2, query, rel, id_col="rid", k=10_000
        ).collect()
    ]
    want = sorted(
        r.rid
        for r in _rows_2d()
        if _matches(rel, [(r.a_min, r.a_max), (r.b_min, r.b_max)], query)
    )
    assert got == want
    assert len(want) > 0  # the grid actually exercises the relation


def test_crosses_is_intersects_minus_within(spark, ranges_df):
    # RangeFieldQuery.java:266 — the defining identity, engine-side
    query = [(10.0, 80.0), (10.0, 80.0)]
    ids = {
        rel: {
            r["doc_id"]
            for r in range_query_topk(
                ranges_df, DIMS_2, query, rel, id_col="rid", k=10_000
            ).collect()
        }
        for rel in RANGE_RELATIONS
    }
    assert ids["crosses"] == ids["intersects"] - ids["within"]
    assert ids["within"] <= ids["intersects"]
    assert ids["contains"] <= ids["intersects"]


@pytest.mark.parametrize("rel", RANGE_RELATIONS)
def test_null_bound_never_matches(spark, ranges_df, rel):
    # the no-field contract, incl. through CROSSES' negation
    null_ids = {r.rid for r in _rows_2d() if r.a_min is None}
    assert null_ids
    got = {
        r["doc_id"]
        for r in range_query_topk(
            ranges_df, DIMS_2, [(0.0, 200.0), (0.0, 200.0)], rel,
            id_col="rid", k=10_000,
        ).collect()
    }
    assert not got & null_ids


@pytest.fixture(scope="module")
def range_idx(spark, tmp_path_factory):
    df = spark.createDataFrame(_rows_2d(nulls=False))
    path = str(tmp_path_factory.mktemp("rng") / "idx")
    write_range_index(df, DIMS_2, path, num_files=16)
    return path, df


@pytest.mark.parametrize("rel", RANGE_RELATIONS)
def test_indexed_equals_slow_path(spark, range_idx, rel):
    path, df = range_idx
    query = [(20.0, 55.0), (40.0, 90.0)]
    got = range_index_query_topk(
        spark, path, DIMS_2, query, rel, id_col="rid", k=10_000
    ).collect()
    want = range_query_topk(
        df, DIMS_2, query, rel, id_col="rid", k=10_000
    ).collect()
    assert [r["doc_id"] for r in got] == [r["doc_id"] for r in want]


def test_intersects_prunes_files(spark, range_idx):
    path, _ = range_idx
    stats = {}
    range_index_query_topk(
        spark, path, DIMS_2, [(0.0, 4.0), (0.0, 4.0)], "intersects",
        id_col="rid", k=100, stats=stats,
    ).collect()
    assert stats["files_total"] == 16
    assert stats["files_scanned"] < stats["files_total"]


def test_crosses_prunes_all_when_query_covers_space(spark, range_idx):
    # every stored range is WITHIN a query covering the whole space, so
    # every cell is CELL_OUTSIDE_QUERY for CROSSES — zero files opened,
    # zero hits (the within_inside cell test of RangeFieldQuery:247)
    path, _ = range_idx
    stats = {}
    out = range_index_query_topk(
        spark, path, DIMS_2, [(-10.0, 500.0), (-10.0, 500.0)], "crosses",
        id_col="rid", k=100, stats=stats,
    ).collect()
    assert out == []
    assert stats["files_scanned"] == 0


def test_sql_twin_matches_engine(spark, ranges_df):
    import duckdb
    import pandas as pd

    con = duckdb.connect()
    con.register("ranges", pd.DataFrame([r.asDict() for r in _rows_2d()]))
    for rel in RANGE_RELATIONS:
        query = [(20.0, 55.0), (40.0, 90.0)]
        got = [
            (r["doc_id"], r["score_x1e6"])
            for r in range_query_topk(
                ranges_df, DIMS_2, query, rel, id_col="rid", k=50
            ).collect()
        ]
        sql = range_query_sql("ranges", DIMS_2, query, rel, "rid", k=50)
        want = [tuple(t) for t in con.execute(sql).fetchall()]
        assert got == want, rel


def test_range_on_range_facet_counts_matches_replay(spark, ranges_df):
    # RangeOnRangeFacetCounts (facet/rangeonrange/): per-label counts
    # over overlapping query ranges; total = docs matching >= 1 label
    # (missingCount excluded), replayed in Python as ground truth
    from lucene_spark.search.rangefield import range_on_range_facet_counts

    labels = [
        ("low", [(0.0, 40.0), (0.0, 60.0)]),
        ("mid", [(30.0, 90.0), (40.0, 120.0)]),
        ("high", [(80.0, 200.0), (100.0, 200.0)]),
    ]
    for rel in RANGE_RELATIONS:
        got = {
            r["bucket"]: r["cnt"]
            for r in range_on_range_facet_counts(
                ranges_df, DIMS_2, labels, rel
            ).collect()
        }
        want = {lab: 0 for lab, _ in labels}
        want["__total__"] = 0
        for row in _rows_2d():
            stored = [(row.a_min, row.a_max), (row.b_min, row.b_max)]
            hit = False
            for lab, q in labels:
                if _matches(rel, stored, q):
                    want[lab] += 1
                    hit = True
            if hit:
                want["__total__"] += 1
        assert got == want, rel


def test_range_on_range_facet_sql_twin(spark, ranges_df):
    import duckdb
    import pandas as pd

    from lucene_spark.search.rangefield import (
        range_on_range_facet_counts,
        range_on_range_facet_sql,
    )

    con = duckdb.connect()
    con.register("ranges", pd.DataFrame([r.asDict() for r in _rows_2d()]))
    labels = [
        ("a", [(10.0, 50.0), (20.0, 70.0)]),
        ("b", [(45.0, 110.0), (60.0, 150.0)]),
    ]
    for rel in RANGE_RELATIONS:
        got = sorted(
            (r["bucket"], r["cnt"])
            for r in range_on_range_facet_counts(
                ranges_df, DIMS_2, labels, rel
            ).collect()
        )
        sql = range_on_range_facet_sql("ranges", DIMS_2, labels, rel)
        want = sorted(tuple(t) for t in con.execute(sql).fetchall())
        assert got == want, rel
