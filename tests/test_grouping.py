"""Grouping-module completion — AllGroups / AllGroupHeads / range and
value-source selectors / block grouping / GroupingSearch facade
(grouping/AllGroupsCollector.java, AllGroupHeadsCollector.java,
LongRangeFactory.java, ValueSourceGroupSelector.java,
BlockGroupingCollector.java, GroupingSearch.java; TestGrouping.java
patterns). Expected values computed pandas-side from the engine's own
scored docs, so the tests pin the GROUPING semantics, not BM25."""

import pandas as pd
import pytest

from lucene_spark.search import grouping as G

LONG_MIN, LONG_MAX = G.LONG_MIN, G.LONG_MAX


@pytest.fixture(scope="module")
def gidx(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    rows = []
    for i in range(24):
        freq = 1 + (i % 4)  # four distinct tf values
        filler = " ".join(f"w{i}x{j}" for j in range(i % 7))
        rows.append(
            {
                "repo": "r",
                "path": f"f{i:02d}",
                "commit": "c",
                "text": ("alpha " * freq + filler).strip(),
                "cat": f"g{i % 3}",
                "nval": i * 10,
            }
        )
    docs = pd.DataFrame(rows)
    idx = str(tmp_path_factory.mktemp("gidx") / "idx")
    build_index(
        spark,
        spark.createDataFrame(docs),
        idx,
        IndexConfig(field="text", content_col="text", docs_per_segment=8),
    )
    return IndexReader(spark, idx)


@pytest.fixture(scope="module")
def scored_pd(gidx):
    """Engine-scored (doc_id, score_x1e6, cat, nval) as the oracle
    input frame."""
    from lucene_spark.search.sqlpath import term_scored

    s = term_scored(gidx, "text", "alpha").toPandas()
    d = gidx.docs().select("doc_id", "cat", "nval").toPandas()
    return s.merge(d, on="doc_id")


def _heads(df):
    df = df.sort_values(
        ["score_x1e6", "doc_id"], ascending=[False, True]
    )
    return df.groupby("cat", sort=True).first().reset_index()


def test_all_groups(gidx, scored_pd):
    got = G.all_groups(gidx, "text", "alpha", "cat").toPandas()
    assert got["grp"].tolist() == sorted(scored_pd["cat"].unique())


def test_all_group_heads(gidx, scored_pd):
    got = G.all_group_heads(gidx, "text", "alpha", "cat").toPandas()
    want = _heads(scored_pd)
    assert got["grp"].tolist() == want["cat"].tolist()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["score_x1e6"].tolist() == want["score_x1e6"].tolist()


def test_range_group_key_buckets(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        pd.DataFrame({"v": [-5, 0, 9, 10, 19, 99, 100, 150]})
    )
    lo, hi = G.range_group_key(F.col("v"), 0, 10, 100)
    out = df.select("v", lo.alias("lo"), hi.alias("hi")).toPandas()
    want = {
        -5: (LONG_MIN, 0),  # below min -> catch-all
        0: (0, 10),
        9: (0, 10),
        10: (10, 20),
        19: (10, 20),
        99: (90, 100),
        100: (100, LONG_MAX),  # at max -> catch-all
        150: (100, LONG_MAX),
    }
    for _, r in out.iterrows():
        assert (r["lo"], r["hi"]) == want[r["v"]], r["v"]


def test_range_grouped_topk(gidx, scored_pd):
    got = G.range_grouped_topk(
        gidx, "text", "alpha", "nval", 40, 80, 200, per_group=2
    ).toPandas()
    # recompute buckets + per-bucket rank pandas-side
    def bucket(v):
        if v < 40:
            return (LONG_MIN, 40)
        if v >= 200:
            return (200, LONG_MAX)
        b = (v - 40) // 80
        return (40 + b * 80, 40 + (b + 1) * 80)

    sp = scored_pd.copy()
    sp[["grp_lo", "grp_hi"]] = [bucket(v) for v in sp["nval"]]
    sp = sp.sort_values(["score_x1e6", "doc_id"], ascending=[False, True])
    sp["rn"] = sp.groupby("grp_lo").cumcount() + 1
    want = sp[sp["rn"] <= 2].sort_values(["grp_lo", "rn"])
    assert got[["grp_lo", "grp_hi", "doc_id", "rn"]].values.tolist() == (
        want[["grp_lo", "grp_hi", "doc_id", "rn"]].values.tolist()
    )


def test_value_source_grouped(gidx, scored_pd):
    got = G.value_source_grouped_topk(
        gidx, "text", "alpha", "nval / 10 % 5", per_group=1
    ).toPandas()
    sp = scored_pd.copy()
    sp["grp"] = (sp["nval"] // 10) % 5
    sp = sp.sort_values(["score_x1e6", "doc_id"], ascending=[False, True])
    want = sp.groupby("grp", sort=True).first().reset_index()
    assert got["grp"].tolist() == want["grp"].tolist()
    assert got["doc_id"].tolist() == want["doc_id"].tolist()


def test_block_grouped_topk(spark):
    from pyspark.sql import functions as F

    ch = pd.DataFrame(
        {
            "blk": [1, 1, 1, 2, 2, 3, 3, 4],
            "cid": [1, 2, 3, 1, 2, 1, 2, 1],
            "price": [5.0, 9.0, 7.0, 20.0, 1.0, 9.0, 9.0, 2.0],
        }
    )
    out = G.block_grouped_topk(
        spark.createDataFrame(ch),
        F.col("price") > 0,
        F.col("price"),
        "blk",
        "cid",
        group_limit=3,
        per_block=2,
    ).toPandas()
    # heads: blk2=20, blk1=9, blk3=9 (tie with blk1 broken by blk asc),
    # blk4 cut by group_limit=3
    assert out[out.grp_rank == 1]["blk"].unique().tolist() == [2]
    assert out[out.grp_rank == 2]["blk"].unique().tolist() == [1]
    assert out[out.grp_rank == 3]["blk"].unique().tolist() == [3]
    assert 4 not in set(out["blk"])
    blk1 = out[out["blk"] == 1].sort_values("rn")
    assert blk1["id"].tolist() == [2, 3]  # 9.0 then 7.0; cid 1 cut
    blk3 = out[out["blk"] == 3].sort_values("rn")
    assert blk3["id"].tolist() == [1, 2]  # 9.0 tie -> cid asc


def test_grouping_search_facade(gidx, scored_pd):
    gs = G.GroupingSearch(group_field="cat").set_group_docs_limit(1)
    got = gs.search(gidx, "text", "alpha").toPandas()
    want = _heads(scored_pd)
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    heads = gs.all_group_heads(gidx, "text", "alpha").toPandas()
    assert heads["doc_id"].tolist() == want["doc_id"].tolist()
    allg = gs.all_matching_groups(gidx, "text", "alpha").toPandas()
    assert allg["grp"].tolist() == sorted(scored_pd["cat"].unique())
    with pytest.raises(ValueError):
        G.GroupingSearch()
    with pytest.raises(ValueError):
        G.GroupingSearch(value_source="nval").all_matching_groups(
            gidx, "text", "alpha"
        )
