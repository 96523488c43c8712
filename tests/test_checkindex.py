"""CheckIndex tests: a freshly built (and a merged) index is clean, and
the kernels catch every class of planted corruption."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_clean_index_passes(spark, built_index):
    from lucene_spark.index.checkindex import check_index

    rep = check_index(spark, built_index.index_dir)
    assert rep["ok"], rep["violations"][:5]
    assert rep["counts"]["docs"] == built_index.manifest["num_docs_total"]


def test_merged_index_passes(spark, corpus, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.index.checkindex import check_index
    from lucene_spark.index.merge import force_merge

    idx = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(corpus), idx, IndexConfig(docs_per_segment=60))
    force_merge(spark, idx, max_segments=1)
    rep = check_index(spark, idx)
    assert rep["ok"], rep["violations"][:5]
    assert rep["counts"]["live_segments"] == 1


def _posting_frame(built_index):
    pdf = (
        built_index.postings()
        .filter("term = 'def'")
        .limit(1)
        .toPandas()
    )
    assert len(pdf) == 1
    return pdf


def test_kernel_catches_corruptions(built_index):
    from lucene_spark.index import codec
    from lucene_spark.index.checkindex import check_segment_postings

    base = _posting_frame(built_index)
    assert check_segment_postings(base) == []

    # wrong doc_freq
    bad = base.copy()
    bad["doc_freq"] = bad["doc_freq"] + 1
    assert any("doc_freq" in v for v in check_segment_postings(bad))

    # wrong total_term_freq
    bad = base.copy()
    bad["total_term_freq"] = bad["total_term_freq"] + 5
    assert any("total_term_freq" in v for v in check_segment_postings(bad))

    # truncated norms
    bad = base.copy()
    bad["norms"] = [bytes(bad["norms"].iat[0])[:-1]]
    assert any("norms length" in v for v in check_segment_postings(bad))

    # tampered block_last_doc
    bad = base.copy()
    bad["block_last_doc"] = [[x + 1 for x in bad["block_last_doc"].iat[0]]]
    assert any("block_last_doc" in v for v in check_segment_postings(bad))

    # tampered impacts
    bad = base.copy()
    imp = [list(x) for x in bad["impact_freqs"].iat[0]]
    imp[0] = [f + 1 for f in imp[0]]
    bad["impact_freqs"] = [imp]
    assert any("impacts" in v for v in check_segment_postings(bad))

    # two rows for the same term with OVERLAPPING doc ranges (a salted
    # merge must produce disjoint parts)
    two = pd.concat([base, base], ignore_index=True)
    assert any("salted parts overlap" in v for v in check_segment_postings(two))


def test_doclens_kernel_catches_corruptions(built_index):
    from lucene_spark.index.checkindex import check_segment_doclens

    pdf = built_index.doclens().limit(50).toPandas()
    seg = pdf["segment_id"].iat[0]
    pdf = pdf[pdf["segment_id"] == seg].reset_index(drop=True)
    assert check_segment_doclens(pdf) == []

    bad = pdf.copy()
    bad.loc[0, "doc_id"] = bad["doc_id"].iat[1]
    assert any("duplicate" in v for v in check_segment_doclens(bad))

    bad = pdf.copy()
    bad.loc[0, "doc_len_code"] = 255
    assert any("doc_len_code" in v for v in check_segment_doclens(bad))


def test_checkindex_validates_tombstones_and_dv(spark, corpus, tmp_path):
    """The walker accepts a healthy index with deletes + DV updates and
    flags planted orphan tombstones / dv rows."""
    from pyspark.sql import functions as F

    from lucene_spark.index import manifest as mani
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.index.checkindex import check_index
    from lucene_spark.index.deletes import delete_by_ids
    from lucene_spark.index.dvupdates import update_doc_values

    path = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(corpus), path, IndexConfig(docs_per_segment=200))
    delete_by_ids(spark, path, spark.createDataFrame([(3,)], "doc_id long"))
    update_doc_values(
        spark, path, spark.createDataFrame([(5, "xx")], "doc_id long, lang string")
    )
    rep = check_index(spark, path)
    assert rep["ok"], rep["violations"][:5]

    # plant an orphan tombstone (doc_id far outside the corpus)
    m = mani.read_manifest(path)
    nb = 1 + max(d["batch"] for d in m["delete_batches"])
    spark.createDataFrame([(10**9,)], "doc_id long").write.parquet(
        f"{path}/deletes/batch={nb}"
    )
    out = dict(m)
    out.pop("generation", None); out.pop("committed_at", None)
    out["delete_batches"] = m["delete_batches"] + [{"batch": nb, "num_docs": 1}]
    mani.commit_manifest(path, out)
    rep2 = check_index(spark, path)
    assert not rep2["ok"]
    assert any("tombstone" in v for v in rep2["violations"])


def test_offsets_and_payloads_invariants(spark, tmp_path):
    """A clean offsets+payloads index passes; planted offset/payload
    corruption (truncated blobs, end<start) is flagged."""
    import pandas as pd

    from lucene_spark.index import codec
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.index.checkindex import (
        check_index,
        check_segment_postings,
    )
    from lucene_spark.search.executor import IndexReader

    docs = pd.DataFrame(
        {
            "doc_id": range(4),
            "text": [
                "alpha beta alpha gamma",
                "beta beta",
                "gamma alpha",
                "delta",
            ],
        }
    )
    idx = str(tmp_path / "offidx")
    build_index(
        spark,
        spark.createDataFrame(docs),
        idx,
        IndexConfig(
            field="text", content_col="text", doc_id_col="doc_id",
            analyzer="simple", store_offsets=True,
        ),
    )
    rep = check_index(spark, idx)
    assert rep["ok"], rep["violations"][:5]

    reader = IndexReader(spark, idx)
    base = reader.postings().filter("term = 'alpha'").limit(1).toPandas()
    assert len(base) == 1

    # truncated offsets blob -> decode failure or count mismatch
    bad = base.copy()
    bad.at[0, "offsets"] = bytes(bad.at[0, "offsets"])[:1]
    v = check_segment_postings(bad)
    assert any("offset" in s for s in v), v

    # end < start: re-encode with a negative length varint is impossible
    # (varints are non-negative), so plant a zero-start/huge-delta blob
    # whose occurrence count disagrees with freqs
    bad2 = base.copy()
    bad2.at[0, "offsets"] = codec.encode_varints([0, 1])  # one occurrence only
    v2 = check_segment_postings(bad2)
    assert any("offset" in s for s in v2), v2


def test_payload_count_invariant(spark, tmp_path):
    import pandas as pd

    from lucene_spark.index import codec
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.index.checkindex import (
        check_index,
        check_segment_postings,
    )
    from lucene_spark.search.executor import IndexReader

    docs = pd.DataFrame(
        {
            "doc_id": range(3),
            "text": ["fast|2.0 scan|1.5", "fast|1.0", "scan|3.0 fast|0.5"],
        }
    )
    idx = str(tmp_path / "payidx")
    build_index(
        spark,
        spark.createDataFrame(docs),
        idx,
        IndexConfig(
            field="text", content_col="text", doc_id_col="doc_id",
            analyzer="delimited_payload", store_payloads=True,
        ),
    )
    rep = check_index(spark, idx)
    assert rep["ok"], rep["violations"][:5]

    reader = IndexReader(spark, idx)
    base = reader.postings().filter("term = 'fast'").limit(1).toPandas()
    assert len(base) == 1 and base.at[0, "payloads"] is not None
    bad = base.copy()
    bad.at[0, "payloads"] = codec.encode_varints([7])  # one value, freq sum is 3
    v = check_segment_postings(bad)
    assert any("payload" in s for s in v), v


def test_exorcise_drops_corrupt_segments(spark, corpus, tmp_path):
    """CheckIndex -exorcise: plant on-disk corruption in ONE segment's
    postings, exorcise, and the index must come back clean with only
    that segment's docs lost and searches working on the survivors."""
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.index.checkindex import check_index, exorcise
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexReader, IndexSearcher

    idx = str(tmp_path / "idx")
    build_index(
        spark, spark.createDataFrame(corpus), idx,
        IndexConfig(docs_per_segment=100),
    )
    clean = IndexReader(spark, idx)
    victim = sorted(
        r["segment_id"]
        for r in clean.postings().select("segment_id").distinct().collect()
    )[0]
    v_ids = {
        r["doc_id"]
        for r in clean.doclens()
        .filter(F.col("segment_id") == victim)
        .select("doc_id").distinct().collect()
    }
    baseline = {
        h.doc_id for h in IndexSearcher(clean).search(
            Q.TermQuery("content", "def"), k=500
        ).hits
    }

    # corrupt on disk: bump doc_freq of the victim's rows in place
    pdir = f"{idx}/postings"
    df = spark.read.parquet(pdir)
    fixed = df.withColumn(
        "doc_freq",
        F.when(F.col("segment_id") == victim, F.col("doc_freq") + 1)
        .otherwise(F.col("doc_freq")),
    )
    tmp_out = str(tmp_path / "postings_tmp")
    fixed.coalesce(4).write.mode("overwrite").parquet(tmp_out)
    import shutil

    shutil.rmtree(pdir)
    shutil.move(tmp_out, pdir)

    assert not check_index(spark, idx)["ok"]
    rep = exorcise(spark, idx)
    assert rep["removed"] == [victim]
    assert rep["docs_lost"] == len(v_ids) > 0

    healed = IndexReader(spark, idx)
    post = check_index(spark, idx)
    assert post["ok"], post["violations"]
    got = {
        h.doc_id for h in IndexSearcher(healed).search(
            Q.TermQuery("content", "def"), k=500
        ).hits
    }
    assert got == baseline - v_ids


def test_exorcise_noop_on_clean_index(spark, built_index):
    from lucene_spark.index.checkindex import exorcise

    rep = exorcise(spark, built_index.index_dir)
    assert rep["removed"] == [] and rep["docs_lost"] == 0
