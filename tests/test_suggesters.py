"""AnalyzingSuggester / FuzzySuggester semantics over a hand dictionary."""

import pytest


@pytest.fixture(scope="module")
def dictionary(spark):
    rows = [
        ("Tables", 50),
        ("table scans", 40),
        ("tabulate", 30),
        ("stream", 20),
        ("stables", 10),
    ]
    return spark.createDataFrame(rows, "surface string, weight long")


def test_analyzing_matches_through_the_chain(dictionary):
    """'tables' and 'table scans' share the analyzed key prefix 'table'
    (lowercase + s-stem); surfaces come back verbatim, weight-ranked."""
    from lucene_spark.search.suggesters import analyzing_suggest

    got = analyzing_suggest(
        dictionary, "Table", analyzer="simple_en_min", k=5
    ).collect()
    assert [(r["surface"], r["weight"]) for r in got] == [
        ("Tables", 50),
        ("table scans", 40),
    ]
    # multi-token typed query walks into the key too
    got2 = analyzing_suggest(
        dictionary, "table sc", analyzer="simple_en_min", k=5
    ).collect()
    assert [r["surface"] for r in got2] == ["table scans"]


def test_fuzzy_tolerates_edits_in_the_key(dictionary):
    from lucene_spark.search.suggesters import fuzzy_suggest

    # 'tabel' -> key 'tabel'; 'table' is 2 edits, 'tabul(ate)' is 2 —
    # at max_edits=1 only transposition-free near-misses survive
    got = fuzzy_suggest(
        dictionary, "tabls", analyzer="simple_en_min",
        max_edits=1, k=5,
    ).collect()
    # typed key: s-stem('tabls') -> 'tabl'; exact prefix of 'table...'
    assert {r["surface"] for r in got} >= {"Tables", "table scans"}
    for r in got:
        assert r["distance"] <= 1


def test_fuzzy_non_fuzzy_prefix_gate(dictionary):
    from lucene_spark.search.suggesters import fuzzy_suggest

    # 'xtable': within 1 edit of 'table' prefix, but the first char
    # must match exactly (non_fuzzy_prefix=1) -> no hits
    got = fuzzy_suggest(
        dictionary, "xtable", analyzer="simple_en_min",
        max_edits=1, non_fuzzy_prefix=1, k=5,
    ).collect()
    assert got == []


def test_fuzzy_short_query_is_exact(dictionary):
    from lucene_spark.search.suggesters import fuzzy_suggest

    # len(key) < min_fuzzy_length -> exact prefix semantics
    got = fuzzy_suggest(
        dictionary, "st", analyzer="simple_en_min",
        max_edits=2, min_fuzzy_length=3, k=5,
    ).collect()
    assert [r["surface"] for r in got] == ["stream", "stables"]
    assert all(r["distance"] == 0 for r in got)


def test_max_edits_capped():
    from lucene_spark.search.suggesters import fuzzy_suggest

    with pytest.raises(ValueError):
        fuzzy_suggest(None, "abc", max_edits=3)


def test_document_dictionary_dedup_and_null_skip(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from lucene_spark.search.suggesters import (
        analyzing_suggest,
        document_dictionary,
    )

    docs = spark.createDataFrame(pd.DataFrame({
        "title": ["alpha", "alpha", None, "beta"],
        "pop": [3, 9, 5, 4],
    }))
    dd = document_dictionary(docs, "title", weight_col="pop")
    got = {r["surface"]: r["weight"] for r in dd.collect()}
    # NULL surfaces skipped (InputIterator contract); dup keeps max
    assert got == {"alpha": 9, "beta": 4}
    # value-source variant (DocumentValueSourceDictionary)
    dv = document_dictionary(docs, "title", weight_expr="pop * 10 + 1")
    got = {r["surface"]: r["weight"] for r in dv.collect()}
    assert got == {"alpha": 91, "beta": 41}
    out = analyzing_suggest(dd, "al", analyzer="simple", k=5).collect()
    assert [(r["surface"], r["weight"]) for r in out] == [("alpha", 9)]


def test_blended_infix_positions_and_weight_rules(spark):
    # BlendedInfixSuggester: coefficient by first-matched-token
    # position; startswith -> 1; weight 0 -> 1; small weights scale x10
    from lucene_spark.search.suggesters import blended_infix_suggest

    sugg = spark.createDataFrame(
        [
            ("alpha beta gamma", 100),   # 'beta' at pos 1
            ("beta alpha", 100),         # startswith -> coef 1
            ("x y beta", 100),           # pos 2
            ("beta tiny", 5),            # startswith + small weight -> 50
            ("beta zero", 0),            # weight 0 -> 1 -> x10 = 10
            ("nothing here", 100),       # no match
        ],
        "surface string, weight long",
    )
    rows = {
        r["surface"]: r["score"]
        for r in blended_infix_suggest(sugg, "beta", "linear", k=10).collect()
    }
    assert rows == {
        "beta alpha": 100,
        "alpha beta gamma": 90,   # 100 * (1 - 0.1*1)
        "x y beta": 80,           # 100 * (1 - 0.1*2)
        "beta tiny": 50,          # 5 -> 50, coef 1
        "beta zero": 10,          # 0 -> 1 -> 10, coef 1
    }
    recip = {
        r["surface"]: r["score"]
        for r in blended_infix_suggest(
            sugg, "beta", "reciprocal", k=10
        ).collect()
    }
    assert recip["alpha beta gamma"] == 50   # 100 / (1+1)
    assert recip["x y beta"] == 33           # floor(100/3)
    expo = {
        r["surface"]: r["score"]
        for r in blended_infix_suggest(
            sugg, "beta", "exponential_reciprocal", exponent=2.0, k=10
        ).collect()
    }
    assert expo["alpha beta gamma"] == 25    # 100 / 4
    assert expo["x y beta"] == 11            # floor(100/9)
