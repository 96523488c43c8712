"""DynamicRangeUtil analog semantics (value parity with DuckDB runs in
test_gate_parity's q_range_facet[dynamic] branch)."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reader(spark):
    from lucene_spark.gate import ensure_index

    return ensure_index(spark, SF)


def _parse(rows):
    out = []
    for r in rows:
        idx, minv, maxv, wsum = r["bucket"].split("_")
        out.append((int(idx), int(minv), int(maxv), int(wsum), r["cnt"]))
    return sorted(out)


def test_dynamic_ranges_equal_weight_unweighted(reader):
    from lucene_spark.search.sqlpath import dynamic_range_facets

    rows = dynamic_range_facets(reader, "text", "spark", "n_chars", 4).collect()
    parsed = _parse(rows)
    assert [p[0] for p in parsed] == [0, 1, 2, 3]
    # contiguous, non-overlapping value ranges along the sort order
    for a, b in zip(parsed, parsed[1:]):
        assert a[2] <= b[1]
    # unweighted: weight == count, and buckets are balanced within 1
    cnts = [p[4] for p in parsed]
    assert all(p[3] == p[4] for p in parsed)
    assert max(cnts) - min(cnts) <= 1


def test_dynamic_ranges_weighted_balances_weight_not_count(reader):
    from lucene_spark.search.sqlpath import dynamic_range_facets

    rows = dynamic_range_facets(
        reader, "text", "spark", "doc_id", 3, weight_col="n_chars"
    ).collect()
    parsed = _parse(rows)
    assert [p[0] for p in parsed] == [0, 1, 2]
    total_w = sum(p[3] for p in parsed)
    # every bucket's weight is within one max-row-weight of the ideal cut
    max_w = 600  # n_chars cap in the synthetic corpus
    for p in parsed:
        assert abs(p[3] - total_w / 3) <= max_w
