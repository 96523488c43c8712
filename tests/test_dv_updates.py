"""In-place DocValues updates: overlay visibility, latest-wins,
atomic publish, and downstream consumers (facets / value sources)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def idx(spark, corpus, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    p = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(corpus), p, IndexConfig(docs_per_segment=200))
    return p, IndexReader(spark, p)


def test_dv_update_overlay_and_latest_wins(spark, idx):
    from lucene_spark.index.dvupdates import update_doc_values
    from lucene_spark.search.executor import IndexReader

    path, r0 = idx
    victims = [
        r["doc_id"]
        for r in r0.docs().select("doc_id").orderBy("doc_id").limit(3).collect()
    ]
    upd = spark.createDataFrame(
        [(v, f"upd_{v}") for v in victims], "doc_id long, lang string"
    )
    update_doc_values(spark, path, upd)
    r1 = IndexReader(spark, path)
    got = {
        r["doc_id"]: r["lang"]
        for r in r1.docs().filter(F.col("doc_id").isin(victims)).collect()
    }
    assert got == {v: f"upd_{v}" for v in victims}
    # non-updated docs untouched
    other = r1.docs().filter(~F.col("doc_id").isin(victims)).limit(5).collect()
    assert all(not str(r["lang"]).startswith("upd_") for r in other)

    # second update on one doc: latest wins
    from lucene_spark.index import manifest as mani

    update_doc_values(
        spark, path,
        spark.createDataFrame([(victims[0], "final")], "doc_id long, lang string"),
    )
    r2 = IndexReader(spark, path)
    got2 = {
        r["doc_id"]: r["lang"]
        for r in r2.docs().filter(F.col("doc_id").isin(victims)).collect()
    }
    assert got2[victims[0]] == "final"
    assert got2[victims[1]] == f"upd_{victims[1]}"
    assert len(mani.read_manifest(path)["dv_update_batches"]) == 2

    # postings / norms / stats untouched (DV updates never re-invert)
    assert r2.collection_stats(r2.manifest["field"]) == r0.collection_stats(
        r0.manifest["field"]
    )


def test_dv_update_by_term_feeds_consumers(spark, idx):
    from lucene_spark.index.dvupdates import update_doc_values_by_term
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.executor import IndexReader

    path, r0 = idx
    field = r0.manifest["field"]
    update_doc_values_by_term(spark, path, field, "import", {"lang": "zz"})
    r1 = IndexReader(spark, path)
    matched = sp.exploded_postings(r1, field, ["import"]).select("doc_id").distinct()
    n_matched = matched.count()
    assert n_matched > 0
    # facet counting sees the overlay
    fc = {r["lang"]: r["cnt"] for r in sp.facet_counts(r1, field, "import", "lang").collect()}
    assert fc == {"zz": n_matched}
    # generic value source reads the overlaid column
    top = sp.function_score_topk(
        r1, field, "import",
        "CASE WHEN lang = 'zz' THEN 7.0 ELSE 1.0 END", mode="replace", k=5,
    ).collect()
    assert top and all(r["score_x1e6"] == 7_000_000 for r in top)


def test_dv_update_requires_columns(spark, idx):
    from lucene_spark.index.dvupdates import update_doc_values

    path, _ = idx
    with pytest.raises(ValueError):
        update_doc_values(spark, path, spark.createDataFrame([(1,)], "doc_id long"))


def test_dv_updates_survive_nrt_append(spark, corpus, idx):
    """An NRT append after a DV update must carry the overlay forward
    (manifest dv_update_batches persists across generations)."""
    from lucene_spark.fixtures import generate_source_files
    from lucene_spark.index.builder import IndexConfig
    from lucene_spark.index.dvupdates import update_doc_values
    from lucene_spark.search.executor import IndexReader
    from lucene_spark.streaming.nrt import append_batch

    path, r0 = idx
    victim = r0.docs().select("doc_id").orderBy("doc_id").head()["doc_id"]
    update_doc_values(
        spark, path,
        spark.createDataFrame([(victim, "zzz")], "doc_id long, lang string"),
    )
    append_batch(
        spark,
        spark.createDataFrame(generate_source_files(30, seed=99)),
        path,
        IndexConfig(docs_per_segment=200),
    )
    r1 = IndexReader(spark, path)
    assert r1.manifest.get("dv_update_batches")
    row = r1.docs().filter(F.col("doc_id") == victim).head()
    assert row["lang"] == "zzz"
