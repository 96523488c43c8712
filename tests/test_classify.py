"""Classification module (reference classification/): KNN vote and
SimpleNaiveBayes vs a pure-Python replay of the reference math over
the sf0.001 documents table."""

import math
import re
from collections import Counter, defaultdict

import pytest

SF = "/root/testdata/sf0.001"
TEXT = "the model data table spark rows"


def _simple_tokens(s):
    return [t for t in re.split(r"[^a-z0-9]+", s.lower()) if t]


@pytest.fixture(scope="module")
def doc_reader(spark):
    from lucene_spark.gate import ensure_index

    return ensure_index(spark, SF)


@pytest.fixture(scope="module")
def corpus(spark):
    import duckdb

    return (
        duckdb.connect()
        .execute(f"SELECT doc_id, text, lang FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id")
        .df()
    )


def test_naive_bayes_matches_reference_math(spark, doc_reader, corpus):
    from lucene_spark.search.classify import naive_bayes_classify

    got = {
        r["clazz"]: r["score_x1e6"]
        for r in naive_bayes_classify(doc_reader, TEXT, "lang").collect()
    }

    # pure-python replay of SimpleNaiveBayesClassifier.java
    toks_by_doc = {r.doc_id: set(_simple_tokens(r.text)) for r in corpus.itertuples()}
    lang_by_doc = {r.doc_id: r.lang for r in corpus.itertuples()}
    sum_doc_freq = sum(len(s) for s in toks_by_doc.values())
    doc_count = sum(1 for s in toks_by_doc.values() if s)
    avg_unique = sum_doc_freq / doc_count
    df_c = Counter(lang_by_doc.values())
    dwc = sum(df_c.values())
    n_wc = defaultdict(int)
    for d, s in toks_by_doc.items():
        for w in s:
            n_wc[(w, lang_by_doc[d])] += 1
    itoks = _simple_tokens(TEXT)
    raw = {}
    for c, dfc in df_c.items():
        ll = sum(
            math.log((n_wc[(w, c)] + 1) / (avg_unique * dfc + dwc)) for w in itoks
        )
        raw[c] = math.log(dfc) - math.log(dwc) + ll
    smax = max(raw.values())
    lse = smax + math.log(sum(math.exp(v - smax) for v in raw.values()))
    want = {c: round(math.exp(v - lse) * 1e6) for c, v in raw.items()}
    assert got == want
    # scores are a softmax: they sum to ~1
    assert abs(sum(got.values()) - 1_000_000) <= len(got)


def test_knn_vote_matches_reference_math(spark, doc_reader, corpus):
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.classify import knn_classify, mlt_terms_for_text

    k = 10
    got = {
        r["clazz"]: r["score_x1e6"]
        for r in knn_classify(doc_reader, TEXT, "lang", k=k).collect()
    }

    # replay: engine's own top-k (already oracled elsewhere) + the
    # KNearestNeighborClassifier.java:190-236 vote
    terms = mlt_terms_for_text(doc_reader, TEXT, max_terms=5)
    assert terms
    topk = sp.bool_bm25_topk(doc_reader, "text", should=terms, k=k).collect()
    lang_by_doc = {r.doc_id: r.lang for r in corpus.itertuples()}
    scores = [(lang_by_doc[r["doc_id"]], r["score_x1e6"] / 1e6) for r in topk]
    maxs = max(s for _, s in scores)
    boosts, counts = defaultdict(float), Counter()
    for c, s in scores:
        boosts[c] += s / maxs
        counts[c] += 1
    sumdoc = sum(counts.values())
    want = {
        c: round(b / min(k, sumdoc) * 1e6) for c, b in boosts.items()
    }
    assert got == want


def test_knn_classify_assigns_plausible_class(spark, doc_reader):
    """Classifying a verbatim training document with k=1 must return
    its own class with score 1.0 — the nearest neighbour is the doc
    itself (TestKNearestNeighborClassifier pattern; k>1 is
    uninformative here because the synthetic lang column is
    uncorrelated with the text)."""
    import duckdb

    row = (
        duckdb.connect()
        .execute(f"SELECT text, lang FROM read_parquet('{SF}/documents.parquet') WHERE doc_id = 3")
        .fetchone()
    )
    from lucene_spark.search.classify import knn_classify

    top = knn_classify(doc_reader, row[0], "lang", k=1).first()
    assert top["clazz"] == row[1]
    assert top["score_x1e6"] == 1_000_000


def test_nb_empty_text_returns_empty(spark, doc_reader):
    from lucene_spark.search.classify import naive_bayes_classify

    assert naive_bayes_classify(doc_reader, "???", "lang").count() == 0


def test_bm25nb_probabilities_and_determinism(spark):
    # BM25NBClassifier analog: one row per indexed class, softmax
    # probabilities (~1.0 total), deterministic across invocations
    from lucene_spark.gate import ensure_mf_index
    from lucene_spark.search.classify import bm25nb_classify

    r = ensure_mf_index(spark, SF)
    text = "customer orders data from the supplier network"
    rows = bm25nb_classify(r, text, "lang_kw", "text").collect()
    langs = {
        x[0] for x in spark.read.parquet(f"{SF}/documents.parquet")
        .select("lang").distinct().collect()
    }
    assert {row["clazz"] for row in rows} == langs
    assert abs(sum(row["score_x1e6"] for row in rows) - 1_000_000) <= len(rows)
    rows2 = bm25nb_classify(r, text, "lang_kw", "text").collect()
    assert [tuple(x) for x in rows] == [tuple(x) for x in rows2]


def test_bm25nb_empty_text_returns_empty(spark):
    from lucene_spark.gate import ensure_mf_index
    from lucene_spark.search.classify import bm25nb_classify

    r = ensure_mf_index(spark, SF)
    assert bm25nb_classify(r, "???", "lang_kw", "text").count() == 0


def test_knn_fuzzy_matches_typo_text(spark, doc_reader):
    # fuzzified input: typos within edit distance 1 (prefix 2 intact)
    # still reach the right terms, so the vote is non-empty and sums
    # to <= 1e6 per class frame
    from lucene_spark.search.classify import knn_fuzzy_classify

    rows = knn_fuzzy_classify(
        doc_reader, "custoner ordars from the supplier", "lang", k=10
    ).collect()
    assert rows, "typo text should still classify"
    assert all(0 < r["score_x1e6"] <= 1_000_000 for r in rows)
    rows2 = knn_fuzzy_classify(
        doc_reader, "custoner ordars from the supplier", "lang", k=10
    ).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in rows2]


def test_perceptron_training_moves_weights_toward_labels(spark, doc_reader):
    # one epoch must (a) keep the full vocabulary, (b) floor at 0,
    # (c) change at least one weight when misclassifications exist,
    # and classification must be deterministic
    from pyspark.sql import functions as F

    from lucene_spark.search.classify import (
        boolean_perceptron_classify,
        boolean_perceptron_train,
    )

    w0 = doc_reader.term_stats_df().filter(
        F.col("field") == doc_reader.manifest["field"]
    )
    w, bias = boolean_perceptron_train(doc_reader, "lang", "en", epochs=1)
    assert w.count() == w0.count()
    assert w.agg(F.min("w")).head()[0] >= 0
    joined = w.alias("a").join(
        w0.selectExpr("term", "total_term_freq AS w0"), "term"
    )
    assert joined.filter(F.col("w") != F.col("w0")).count() > 0
    r1 = boolean_perceptron_classify(
        doc_reader, w, bias, "customer data orders"
    ).head()
    r2 = boolean_perceptron_classify(
        doc_reader, w, bias, "customer data orders"
    ).head()
    assert tuple(r1) == tuple(r2)
    # unseen vocabulary -> output 0, assigned False
    r3 = boolean_perceptron_classify(doc_reader, w, bias, "zzzz qqqq").head()
    assert r3["output"] == 0 and r3["assigned"] is False


def test_caching_nb_matches_simple_nb(spark, doc_reader):
    from lucene_spark.search.classify import (
        CachingNaiveBayesModel,
        naive_bayes_classify,
    )

    model = CachingNaiveBayesModel(doc_reader, "lang")
    try:
        for text in ("the model data table spark rows",
                     "customer orders data"):
            got = [tuple(r) for r in model.classify(text).collect()]
            want = [
                tuple(r)
                for r in naive_bayes_classify(doc_reader, text, "lang")
                .collect()
            ]
            assert got == want, text
    finally:
        model.unpersist()
