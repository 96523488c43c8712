"""Document (multi-field) classifiers: classification/document/
KNearestNeighborDocumentClassifier.java and
SimpleNaiveBayesDocumentClassifier.java."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def cls_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    docs = pd.DataFrame(
        {
            "repo": ["r"] * 8,
            "path": [f"f{i}" for i in range(8)],
            "commit": ["c"] * 8,
            "title": [
                "spark tuning guide", "spark shuffle notes",
                "cooking pasta basics", "pasta sauce recipe",
                "spark join tips", "cooking bread",
                "spark memory sizing", "pasta salad ideas",
            ],
            "body": [
                "executor memory shuffle partitions tuning spark",
                "shuffle spill partitions reduce spark stage",
                "boil water salt pasta drain sauce",
                "tomato garlic sauce simmer pasta",
                "broadcast join skew salting spark",
                "flour yeast oven bread knead",
                "heap offheap memory executor spark",
                "pasta olives feta salad cold",
            ],
            "cat": ["eng", "eng", "food", "food",
                    "eng", "food", "eng", "food"],
        }
    )
    idx = str(tmp_path_factory.mktemp("cls") / "idx")
    cfg = IndexConfig(
        field="body", content_col="body",
        extra_fields={"title": "title"},
        docs_per_segment=10,
    )
    build_index(spark, spark.createDataFrame(docs), idx, cfg)
    return IndexReader(spark, idx)


def test_knn_document_classifier_uses_both_fields(cls_index):
    from lucene_spark.search.classify import knn_classify_document

    out = knn_classify_document(
        cls_index,
        {"title": "spark tips", "body": "shuffle partitions executor"},
        "cat",
        fields=["title", "body"],
        k=4,
    ).toPandas()
    assert out.clazz.iloc[0] == "eng"
    out2 = knn_classify_document(
        cls_index,
        {"title": "pasta recipe", "body": "sauce tomato boil"},
        "cat",
        fields=["title", "body"],
        k=4,
    ).toPandas()
    assert out2.clazz.iloc[0] == "food"


def test_knn_document_field_boost_changes_vote(cls_index):
    """A strong boost on the field matching the other class flips the
    neighbour pool (the '^boost' multiplicative factor,
    KNearestNeighborDocumentClassifier.java:102-108)."""
    from lucene_spark.search.classify import knn_classify_document

    doc = {"title": "pasta spark", "body": "spark shuffle executor"}
    plain = knn_classify_document(
        cls_index, doc, "cat", fields=["title", "body"], k=3
    ).toPandas()
    boosted = knn_classify_document(
        cls_index, doc, "cat", fields=["title^0.01", "body"], k=3
    ).toPandas()
    assert plain.clazz.iloc[0] == "eng"
    assert boosted.clazz.iloc[0] == "eng"  # body dominates either way
    # with body suppressed, title (pasta) pulls food docs in
    tilted = knn_classify_document(
        cls_index, doc, "cat", fields=["title^100", "body^0.001"], k=3
    ).toPandas()
    assert "food" in set(tilted.clazz)


def test_nb_document_classifier(cls_index):
    from lucene_spark.search.classify import naive_bayes_classify_document

    out = naive_bayes_classify_document(
        cls_index,
        {"title": "spark tuning", "body": "shuffle executor memory"},
        "cat",
        fields=["title", "body"],
    ).toPandas()
    assert out.clazz.iloc[0] == "eng"
    # softmax normalization: scores sum to ~1e6 and are positive
    assert abs(out.score_x1e6.sum() - 1_000_000) <= 2
    assert (out.score_x1e6 > 0).all()


def test_nb_document_prior_once_per_field(cls_index):
    """The reference adds the prior per FIELD (assignNormClasses loop,
    SimpleNaiveBayesDocumentClassifier.java:126-129): with a class-
    neutral token set, doubling the fields must leave the softmax
    unchanged (priors scale equally) — verified against a hand
    replication."""
    from collections import Counter

    from lucene_spark.search.classify import (
        _tokenize,
        naive_bayes_classify_document,
    )
    from lucene_spark.search.sqlpath import exploded_postings

    doc = {"title": "spark", "body": "spark pasta"}
    got = naive_bayes_classify_document(
        cls_index, doc, "cat", fields=["title", "body"]
    ).toPandas()

    docs = cls_index.docs().select("doc_id", "cat").toPandas()
    classes = docs.cat.value_counts().to_dict()
    dwc = len(docs)
    raws = {}
    for c, df_c in classes.items():
        raw = 0.0
        for fname in ("title", "body"):
            toks = _tokenize(cls_index, doc[fname])
            if not toks:
                continue
            coll = cls_index.collection_stats(fname)
            avg_unique = cls_index.sum_doc_freq(fname) / coll.doc_count
            ep = exploded_postings(
                cls_index, fname, sorted(set(toks))
            ).toPandas()
            lab = ep.merge(docs, on="doc_id")
            ll = 0.0
            for t, n in Counter(toks).items():
                n_wc = len(
                    lab[(lab.term == t) & (lab.cat == c)]
                )
                ll += n * math.log(
                    (n_wc + 1.0) / (avg_unique * df_c + dwc)
                )
            raw += math.log(df_c) - math.log(dwc) + ll * 1.0
        raws[c] = raw
    m = max(raws.values())
    lse = m + math.log(sum(math.exp(v - m) for v in raws.values()))
    want = {
        c: round(math.exp(v - lse) * 1e6) for c, v in raws.items()
    }
    for r in got.itertuples():
        assert abs(r.score_x1e6 - want[r.clazz]) <= 1, (r.clazz, want)


def test_empty_document_returns_empty(cls_index):
    from lucene_spark.search.classify import (
        knn_classify_document,
        naive_bayes_classify_document,
    )

    assert (
        knn_classify_document(
            cls_index, {}, "cat", fields=["title", "body"]
        ).count()
        == 0
    )
    assert (
        naive_bayes_classify_document(
            cls_index, {}, "cat", fields=["title", "body"]
        ).count()
        == 0
    )
