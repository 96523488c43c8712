"""PKIndexSplitter analog: split one index into accepted/rejected,
verify partition, search identity, and index invariants on both sides."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def split_pair(spark, corpus, tmp_path_factory):
    from lucene_spark.index.addindexes import split_index
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    base = tmp_path_factory.mktemp("split")
    src = str(base / "src")
    build_index(
        spark, spark.createDataFrame(corpus), src,
        IndexConfig(docs_per_segment=100),
    )
    p, f = str(base / "pass"), str(base / "fail")
    n_pass, n_fail = split_index(
        spark, src, p, f, F.col("doc_id") % 3 == 0
    )
    return (
        IndexReader(spark, src),
        IndexReader(spark, p),
        IndexReader(spark, f),
        n_pass,
        n_fail,
    )


def test_split_partitions_the_docs(split_pair, corpus):
    src, rp, rf, n_pass, n_fail = split_pair
    assert n_pass + n_fail == len(corpus)
    pass_ids = {r["doc_id"] for r in rp.doclens().select("doc_id").distinct().collect()}
    fail_ids = {r["doc_id"] for r in rf.doclens().select("doc_id").distinct().collect()}
    assert len(pass_ids) == n_pass and len(fail_ids) == n_fail
    assert not pass_ids & fail_ids
    assert all(d % 3 == 0 for d in pass_ids)
    assert all(d % 3 != 0 for d in fail_ids)


def test_split_search_identity(split_pair):
    """Searching a side == searching the source restricted to that side
    (scores differ only through df/avgdl, so compare MATCH SETS of an
    exhaustive query and exact scores of a constant-score one)."""
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher

    src, rp, rf, _n_pass, _n_fail = split_pair
    q = Q.TermQuery("content", "def")
    full = {h.doc_id for h in IndexSearcher(src).search(q, k=500).hits}
    got_p = {h.doc_id for h in IndexSearcher(rp).search(q, k=500).hits}
    got_f = {h.doc_id for h in IndexSearcher(rf).search(q, k=500).hits}
    assert got_p == {d for d in full if d % 3 == 0}
    assert got_f == {d for d in full if d % 3 != 0}


def test_split_sides_pass_checkindex(split_pair):
    from lucene_spark.index.checkindex import check_index

    _src, rp, rf, _n_pass, _n_fail = split_pair
    for rd in (rp, rf):
        report = check_index(rd.spark, rd.index_dir)
        assert report["ok"], report["violations"]


def test_rearrange_index(spark, tmp_path):
    import numpy as np
    import pandas as pd
    import pytest
    from pyspark.sql import functions as F

    from lucene_spark.index.addindexes import rearrange_index
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.index.checkindex import check_index
    from lucene_spark.search.executor import IndexReader

    rng = np.random.default_rng(13)
    vocab = ["alpha", "beta", "gamma", "delta"]
    pdf = pd.DataFrame({
        "doc_id": np.arange(120, dtype=np.int64),
        "grpv": (np.arange(120) % 3).astype("int64"),
        "text": [" ".join(rng.choice(vocab, size=6)) for _ in range(120)],
    })
    src = str(tmp_path / "src")
    build_index(
        spark, spark.createDataFrame(pdf), src,
        IndexConfig(field="text", content_col="text", analyzer="simple",
                    doc_id_col="doc_id", docs_per_segment=40,
                    id_cols=("grpv",)),
    )
    out = str(tmp_path / "re")
    sels = [F.col("grpv") == i for i in range(3)]
    rearrange_index(spark, src, out, sels,
                    deleted_selector=F.col("grpv") == 2)
    rd = IndexReader(spark, out)
    # one segment per selector, in selector order
    segs = (
        rd.doclens().join(rd.docs(), "doc_id")
        .groupBy("segment_id")
        .agg(F.count("*").alias("n"),
             F.min("doc_id").alias("lo"),
             F.collect_set("grpv").alias("gs"))
        .orderBy("lo")
        .collect()
    )
    assert len(segs) == 3
    assert [r["n"] for r in segs] == [40, 40, 40]
    assert [r["gs"] for r in segs] == [[0], [1], [2]]
    # deleted selector tombstones (not merged away): grpv==2 docs dead
    assert int(rd.manifest.get("num_deleted", 0)) == 40
    assert check_index(spark, out)["ok"]
    # non-partitioning selectors are rejected
    with pytest.raises(ValueError, match="partition"):
        rearrange_index(spark, src, str(tmp_path / "bad"),
                        [F.col("grpv") <= 1, F.col("grpv") >= 1])


@pytest.mark.parametrize("sequential", [False, True])
def test_multipass_split(spark, corpus, tmp_path, sequential):
    """MultiPassIndexSplitter: N parts partition the source (round-robin
    and -seq modes), each part is a valid index with the expected
    membership."""
    from lucene_spark.index.addindexes import multipass_split_index
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.index.checkindex import check_index
    from lucene_spark.search.executor import IndexReader

    src = str(tmp_path / "src")
    build_index(
        spark, spark.createDataFrame(corpus), src,
        IndexConfig(docs_per_segment=100),
    )
    outs = [str(tmp_path / f"part{i}") for i in range(3)]
    counts = multipass_split_index(spark, src, outs, sequential=sequential)
    assert sum(counts) == len(corpus)
    total = len(corpus)
    sets = []
    for i, out in enumerate(outs):
        rd = IndexReader(spark, out)
        live = {
            r["doc_id"]
            for r in rd.doclens().select("doc_id").distinct().collect()
        }
        if sequential:
            want = set(range(i * total // 3, (i + 1) * total // 3))
        else:
            want = {d for d in range(total) if d % 3 == i}
        assert live == want, (i, sequential)
        sets.append(live)
        assert check_index(spark, out)["ok"]
    assert set().union(*sets) == set(range(total))
