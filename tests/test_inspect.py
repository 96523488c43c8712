"""Index diagnostics (luke module + misc/HighFreqTerms analog) —
reports cross-checked against a pandas re-tokenization of the corpus."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def token_oracle(corpus):
    """field=content term -> (doc_freq, total_term_freq) from a plain
    pandas re-tokenization — the ground truth HighFreqTerms must rank."""
    from lucene_spark.analysis import StandardAnalyzer

    an = StandardAnalyzer()
    df_counts: dict[str, int] = {}
    ttf_counts: dict[str, int] = {}
    for toks in an.tokenize(corpus["content"]):
        for t in set(toks):
            df_counts[t] = df_counts.get(t, 0) + 1
        for t in toks:
            ttf_counts[t] = ttf_counts.get(t, 0) + 1
    return df_counts, ttf_counts


def test_high_freq_terms_by_doc_freq(built_index, token_oracle):
    from lucene_spark.index.inspect import high_freq_terms

    df_counts, ttf_counts = token_oracle
    got = high_freq_terms(built_index, "content", k=25).toPandas()
    want = sorted(df_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert list(zip(got["term"], got["doc_freq"])) == want
    # the TermStats record carries both frequencies
    for t, ttf in zip(got["term"], got["total_term_freq"]):
        assert ttf == ttf_counts[t]


def test_high_freq_terms_by_total_term_freq(built_index, token_oracle):
    from lucene_spark.index.inspect import high_freq_terms

    _df_counts, ttf_counts = token_oracle
    got = high_freq_terms(
        built_index, "content", k=10, by_total_term_freq=True
    ).toPandas()
    want = sorted(ttf_counts.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["term"], got["total_term_freq"])) == want


def test_field_report(built_index, token_oracle):
    from lucene_spark.index.inspect import field_report

    df_counts, ttf_counts = token_oracle
    rep = field_report(built_index).toPandas().set_index("field")
    row = rep.loc["content"]
    assert row["distinct_terms"] == len(df_counts)
    assert row["sum_doc_freq"] == sum(df_counts.values())
    assert row["sum_total_term_freq"] == sum(ttf_counts.values())
    top = sorted(df_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert (row["top_term"], row["top_term_doc_freq"]) == top


def test_segment_report_and_overview(built_index, corpus):
    from lucene_spark.index.inspect import overview, segment_report

    seg = segment_report(built_index).toPandas()
    assert seg["num_docs"].sum() == len(corpus)
    assert seg["live"].all()
    assert (seg["deleted_docs"] == 0).all()
    # segments tile the doc-id space in order
    assert list(seg["first_doc_id"]) == sorted(seg["first_doc_id"])

    ov = overview(built_index)
    assert ov["num_docs"] == len(corpus)
    assert ov["num_deleted_docs"] == 0
    assert ov["num_segments"] == len(seg)
    assert "content" in ov["fields"]
    assert ov["postings_format"] == "for104"


def test_doc_len_histogram(built_index, token_oracle, corpus):
    from lucene_spark.analysis import StandardAnalyzer
    from lucene_spark.index.inspect import doc_len_histogram

    hist = doc_len_histogram(built_index, "content", num_bins=8).toPandas()
    assert hist["num_docs"].sum() == len(corpus)
    an = StandardAnalyzer()
    lens = [len(t) for t in an.tokenize(corpus["content"])]
    assert hist["lo"].min() <= min(lens)
    assert hist["hi"].max() >= max(lens)
    # every doc length falls in its bucket's range
    counted = pd.Series(lens)
    for _, r in hist.iterrows():
        assert ((counted >= r["lo"]) & (counted <= r["hi"])).sum() == r["num_docs"]


def test_segment_report_after_deletes(spark, corpus, tmp_path):
    """Tombstones show up per segment; overview counts them."""
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.index.deletes import delete_by_term
    from lucene_spark.index.inspect import overview, segment_report
    from lucene_spark.search.executor import IndexReader

    idx = str(tmp_path / "idx")
    src = spark.createDataFrame(corpus)
    build_index(spark, src, idx, IndexConfig(docs_per_segment=100))
    delete_by_term(spark, idx, "content", "def")
    rd = IndexReader(spark, idx)
    n_del = int(rd.manifest.get("num_deleted", 0))
    seg = segment_report(rd).toPandas()
    assert seg["deleted_docs"].sum() == n_del > 0
    assert overview(rd)["num_deleted_docs"] == n_del


def test_term_info(spark, built_index):
    # GetTermInfo: df/ttf from the term dictionary alone
    from pyspark.sql import functions as F

    from lucene_spark.index.inspect import term_info

    reader = built_index
    field = reader.manifest["field"]
    some = reader.term_stats_df().filter(F.col("field") == field).orderBy(
        F.col("doc_freq").desc()).head()
    info = term_info(reader, field, some["term"])
    want = (
        reader.term_stats_df()
        .filter((F.col("field") == field) & (F.col("term") == some["term"]))
        .agg(F.sum("doc_freq"), F.sum("total_term_freq"))
        .head()
    )
    assert info["doc_freq"] == int(want[0])
    assert info["total_term_freq"] == int(want[1])
    assert info["total_term_freq"] >= info["doc_freq"] > 0
    missing = term_info(reader, field, "zzzz_not_a_term")
    assert missing["doc_freq"] == 0 and missing["total_term_freq"] == 0
