"""Locale-collated sort/range — ICUCollationKeyAnalyzer role
(analysis/icu/src/java/.../collation/ICUCollationKeyAnalyzer.java):
the indexed-collation-key contract maps to Spark 4 collated string
expressions (see lucene_spark/search/collation.py)."""

import pytest

from lucene_spark.search.collation import (
    collation_range_filter,
    collation_sort_topk,
)


@pytest.fixture(scope="module")
def names(spark):
    rows = [
        (0, "Zebra"), (1, "äpfel"), (2, "apple"), (3, "Banane"),
        (4, "Öl"), (5, "oeuvre"), (6, "zoo"),
    ]
    return spark.createDataFrame(rows, "doc_id long, nm string")


def test_de_collation_order_differs_from_binary(names):
    out = collation_sort_topk(names, "nm", "de", k=7).collect()
    got = [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])]
    # ICU de: äpfel < apple (primary a=a, p=p, then f < p), Banane,
    # oeuvre < Öl (primary o=o, e < l), Zebra < zoo (e < o; case is
    # tertiary). Binary UTF-8 order would put all the umlauts LAST.
    assert got == [1, 2, 3, 5, 4, 0, 6]
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] == [
        1, 2, 3, 4, 5, 6, 7
    ]


def test_collated_range_admits_umlauts(names):
    # ['a', 'b') under de contains ä (primary weight a) — a binary
    # range would exclude it
    got = {
        r["doc_id"]
        for r in collation_range_filter(names, "nm", "de", "a", "b").collect()
    }
    assert got == {1, 2}


def test_bad_locale_rejected(names):
    with pytest.raises(ValueError):
        collation_sort_topk(names, "nm", "de'; DROP", k=3)
