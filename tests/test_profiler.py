"""QueryProfilerIndexSearcher: identical results + a coherent profile
tree (sandbox/search/QueryProfilerIndexSearcher.java contract)."""

import pytest

from lucene_spark.search import query as Q
from lucene_spark.search.executor import IndexSearcher
from lucene_spark.search.profiler import QueryProfilerIndexSearcher

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def readers(spark):
    from lucene_spark.gate import ensure_index

    return ensure_index(spark, SF_DIR)


def test_profiler_results_identical_and_tree_coherent(readers):
    q = Q.BooleanQuery(
        must=(Q.TermQuery("text", "table"),),
        should=(Q.TermQuery("text", "spark"), Q.TermQuery("text", "zzzznope")),
    )
    plain = IndexSearcher(readers).search(q, k=10)
    prof_s = QueryProfilerIndexSearcher(readers)
    td = prof_s.search(q, k=10)
    assert [(h.doc_id, h.score) for h in td.hits] == [
        (h.doc_id, h.score) for h in plain.hits
    ]
    p = prof_s.last_profile
    assert p["total_hits"] == plain.total_hits
    root = p["tree"]
    assert root["type"] == "BooleanQuery"
    kids = root["children"]
    assert [c["type"] for c in kids] == ["TermQuery"] * 3
    # the absent term compiled to no weight; present ones carry cost
    matched = {c["matched"] for c in kids}
    assert matched == {True, False}
    for c in kids:
        if c["matched"]:
            assert c["cost"] > 0
        b = c["breakdown"]
        assert 0 <= b["create_weight_self_ms"] <= b["create_weight_total_ms"]
    # parent total >= sum of child totals; phases add up to the total
    child_sum = sum(c["breakdown"]["create_weight_total_ms"] for c in kids)
    assert root["breakdown"]["create_weight_total_ms"] >= child_sum
    assert p["total_ms"] >= p["create_weight_ms"]
    assert p["execute_reduce_ms"] >= 0


def test_profiler_resets_per_search(readers):
    s = QueryProfilerIndexSearcher(readers)
    s.search(Q.TermQuery("text", "table"), k=5)
    first = s.last_profile
    s.search(Q.PhraseQuery("text", ("fast", "table")), k=5)
    second = s.last_profile
    assert first is not second
    assert second["tree"]["type"] == "PhraseQuery"
