"""FSTCompletionLookup / WFSTCompletionLookup — bucketed vs exact
weights (suggest/fst/FSTCompletionLookup.java, FSTCompletion.java,
WFSTCompletionLookup.java; TestFSTCompletion patterns: bucket
discretization, exact-match promotion, alphabetic within-bucket
order)."""

import pandas as pd

from lucene_spark.search.suggesters import (
    fst_completion_build,
    fst_completion_lookup,
    wfst_lookup,
)


def _entries(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["term", "weight"])
    )


def test_bucket_assignment_equal_ranges(spark):
    # 10 entries, 5 buckets: sorted-by-weight line i -> bucket i*5/10
    pairs = [(f"t{i:02d}", (i + 1) * 10) for i in range(10)]
    got = fst_completion_build(_entries(spark, pairs), buckets=5).toPandas()
    got = got.sort_values("weight").reset_index(drop=True)
    assert got["bucket"].tolist() == [0, 0, 1, 1, 2, 2, 3, 3, 4, 4]


def test_equal_weights_share_first_bucket(spark):
    # FSTCompletionLookup.java:221-227: same score -> previous bucket.
    # weights 1,1,1,9 with 4 buckets: lines 0,1,2 all weight 1 ->
    # bucket of line 0 = 0; line 3 -> 3*4/4 = 3
    pairs = [("a", 1), ("b", 1), ("c", 1), ("d", 9)]
    got = fst_completion_build(_entries(spark, pairs), buckets=4).toPandas()
    bk = dict(zip(got["term"], got["bucket"]))
    assert bk == {"a": 0, "b": 0, "c": 0, "d": 3}


def test_lookup_bucket_desc_then_alpha_and_exact_first(spark):
    pairs = [
        ("data", 1),       # low weight -> low bucket
        ("datastore", 50),
        ("database", 50),  # same bucket as datastore -> alpha order
        ("datalog", 99),
        ("other", 99),
    ]
    built = fst_completion_build(_entries(spark, pairs), buckets=5)
    got = fst_completion_lookup(built, "data", num=4).toPandas()
    # exactFirst promotes 'data' despite its bottom bucket; then
    # bucket desc (datalog), then the 50-weight pair alphabetically
    assert got["term"].tolist() == [
        "data", "datalog", "database", "datastore"
    ]
    noex = fst_completion_lookup(
        built, "data", num=4, exact_first=False
    ).toPandas()
    assert noex["term"].tolist() == [
        "datalog", "database", "datastore", "data"
    ]


def test_wfst_exact_weights(spark):
    pairs = [("data", 3), ("database", 7), ("datastore", 5), ("dog", 9)]
    e = _entries(spark, pairs)
    got = wfst_lookup(e, "data", num=3, exact_first=False).toPandas()
    assert got["term"].tolist() == ["database", "datastore", "data"]
    assert got["weight"].tolist() == [7, 5, 3]
    ex = wfst_lookup(e, "data", num=3).toPandas()
    assert ex["term"].tolist() == ["data", "database", "datastore"]


def test_empty_dictionary(spark):
    e = _entries(spark, [("x", 1)]).filter("weight > 5")
    built = fst_completion_build(e, buckets=10)
    assert fst_completion_lookup(built, "x").count() == 0
