"""SortedSetSelector / SortedNumericSelector semantics
(core/search/SortedSetSelector.java:26-104, SortedNumericSelector.java):
ONE value is selected from each doc's multi-valued set before sorting.
MIDDLE_MIN picks the lower middle of an even-sized set, MIDDLE_MAX the
higher; both pick the same element for odd sizes. Verified on a
hand-built index with known per-doc token sets."""

import pandas as pd
import pytest

from lucene_spark.search import sqlpath as sp


@pytest.fixture(scope="module")
def tiny(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    # distinct-token sets (after lowercasing, 'pivot' added everywhere):
    #   doc 0: [bb, dd, pivot]                 -> odd  (3)
    #   doc 1: [aa, cc, ee, pivot]             -> even (4)
    #   doc 2: [ff, pivot]                     -> even (2)
    #   doc 3: [gg, hhh, iiii, jj, pivot, z]   -> even (6)
    rows = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "content": [
            "bb dd pivot dd",
            "aa cc ee pivot",
            "ff pivot ff ff",
            "gg hhh iiii jj pivot z",
        ],
    })
    idx = str(tmp_path_factory.mktemp("selidx") / "idx")
    src = spark.createDataFrame(rows)
    build_index(spark, src, idx, IndexConfig(doc_id_col="doc_id"))
    return IndexReader(spark, idx), src


def _sel(spark, tiny, selector):
    r, src = tiny
    out = sp.selector_sort_topk(r, src, "content", "pivot", selector, k=10)
    return {row["doc_id"]: row["sel_val"] for row in out.collect()}


def test_ss_min_max(spark, tiny):
    assert _sel(spark, tiny, "ss_min") == {0: "bb", 1: "aa", 2: "ff", 3: "gg"}
    assert _sel(spark, tiny, "ss_max") == {
        0: "pivot", 1: "pivot", 2: "pivot", 3: "z"}


def test_ss_middle_even_and_odd(spark, tiny):
    # odd set (doc 0, [bb, dd, pivot]): both middles = 'dd';
    # even sets: MIDDLE_MIN = lower middle, MIDDLE_MAX = higher middle
    lo = _sel(spark, tiny, "ss_middle_min")
    hi = _sel(spark, tiny, "ss_middle_max")
    assert lo[0] == hi[0] == "dd"
    assert (lo[1], hi[1]) == ("cc", "ee")          # [aa cc ee pivot]
    assert (lo[2], hi[2]) == ("ff", "pivot")       # [ff pivot]
    assert (lo[3], hi[3]) == ("iiii", "jj")        # [gg hhh iiii jj pivot z]


def test_sn_min_max_term_lengths(spark, tiny):
    assert _sel(spark, tiny, "sn_min") == {0: "2", 1: "2", 2: "2", 3: "1"}
    assert _sel(spark, tiny, "sn_max") == {0: "5", 1: "5", 2: "5", 3: "5"}


def test_unknown_selector_rejected(spark, tiny):
    with pytest.raises(ValueError, match="selector"):
        _sel(spark, tiny, "ss_median")
