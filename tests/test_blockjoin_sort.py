"""ToParentBlockJoinSortField / BlockJoinSelector and
DiversifyingChildrenFloatKnnVectorQuery contracts
(join/.../ToParentBlockJoinSortField.java, BlockJoinSelector.java,
DiversifyingChildrenFloatKnnVectorQuery.java)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.search.joins import block_join_sort_topk


@pytest.fixture(scope="module")
def pc(spark):
    parents = spark.createDataFrame(pd.DataFrame({"pid": [1, 2, 3, 4]}))
    children = spark.createDataFrame(pd.DataFrame({
        "pid": [1, 1, 2, 2, 3],
        "val": [10.0, 30.0, 20.0, 5.0, 50.0],
        "ok": [True, True, True, False, False],
    }))
    return parents, children


def _run(pc, selector, ascending):
    parents, children = pc
    out = block_join_sort_topk(
        parents, "pid", children, F.col("ok"), F.col("val"), "pid",
        selector=selector, ascending=ascending, k=10,
    )
    return [(r["parent_id"], r["n_children"], r["sel_x1e6"])
            for r in out.collect()]


def test_min_selector_with_missing_parents(pc):
    # parent 3's only child fails the filter, parent 4 has no children:
    # both carry the missingValue sentinel (-1.0) and surface FIRST asc
    rows = _run(pc, "min", True)
    assert rows == [
        (3, 0, -1_000_000), (4, 0, -1_000_000),
        (1, 2, 10_000_000), (2, 1, 20_000_000),
    ]


def test_max_selector_desc(pc):
    rows = _run(pc, "max", False)
    assert rows == [
        (1, 2, 30_000_000), (2, 1, 20_000_000),
        (3, 0, -1_000_000), (4, 0, -1_000_000),
    ]


def test_unknown_selector_rejected(pc):
    with pytest.raises(ValueError, match="selector"):
        _run(pc, "median", True)


def test_diversifying_children_one_per_parent(spark):
    from lucene_spark.pipeline.similarity import diversifying_children_topk

    # two parents; parent 0 owns the query's two nearest neighbors but
    # may contribute only its single best child
    emb = spark.createDataFrame(pd.DataFrame({
        "vec_id": [0, 1, 2, 3, 4],
        "embedding": [[1.0, 0.0], [0.99, 0.1], [0.98, 0.2],
                      [0.5, 0.8], [-1.0, 0.0]],
        "label": [0, 0, 0, 1, 1],
    }))
    out = diversifying_children_topk(emb, "label", query_id=0, k=10)
    rows = [(r["parent"], r["vec_id"]) for r in out.collect()]
    assert rows == [(0, 1), (1, 3)]  # best child of each parent, cos desc
