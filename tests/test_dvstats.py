"""DocValuesStats collectors vs a DuckDB oracle on the same parquet."""

import math

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF}/orders.parquet'")
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return con


def test_numeric_stats_match_duckdb(spark, ddb):
    from lucene_spark.search.dvstats import numeric_doc_values_stats

    orders = spark.read.parquet(f"{SF}/orders.parquet")
    got = numeric_doc_values_stats(
        orders, "o_totalprice", F.col("o_orderstatus") == "F"
    ).first()
    want = ddb.execute(
        """SELECT count(o_totalprice), min(o_totalprice), max(o_totalprice),
                  sum(o_totalprice), avg(o_totalprice), stddev_pop(o_totalprice)
           FROM orders WHERE o_orderstatus = 'F'"""
    ).fetchone()
    assert got["count"] == want[0]
    assert got["missing"] == 0
    assert got["vmin"] == want[1] and got["vmax"] == want[2]
    assert math.isclose(got["vsum"], want[3], rel_tol=1e-12)
    assert math.isclose(got["mean"], want[4], rel_tol=1e-12)
    assert math.isclose(got["stdev"], want[5], rel_tol=1e-9)


def test_numeric_stats_missing_counted(spark):
    from lucene_spark.search.dvstats import numeric_doc_values_stats

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0), (4, None)], "id int, v double"
    )
    got = numeric_doc_values_stats(df, "v").first()
    assert (got["count"], got["missing"]) == (2, 2)
    assert (got["vmin"], got["vmax"], got["vsum"]) == (10.0, 30.0, 40.0)
    # single-doc / empty edges: stdev never NULL
    one = numeric_doc_values_stats(df.filter("id = 1"), "v").first()
    assert one["stdev"] == 0.0


def test_sorted_stats(spark, ddb):
    from lucene_spark.search.dvstats import sorted_doc_values_stats

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted_doc_values_stats(docs, "lang").first()
    want = ddb.execute(
        "SELECT count(lang), min(lang), max(lang) FROM documents"
    ).fetchone()
    assert (got["count"], got["vmin"], got["vmax"]) == want


def test_sorted_set_stats(spark):
    from lucene_spark.search.dvstats import sorted_set_doc_values_stats

    df = spark.createDataFrame(
        [(1, ["b", "c"]), (2, []), (3, ["a"]), (4, None)],
        "id int, tags array<string>",
    )
    got = sorted_set_doc_values_stats(df, "tags").first()
    assert (got["count"], got["missing"]) == (2, 2)
    assert (got["vmin"], got["vmax"]) == ("a", "c")
