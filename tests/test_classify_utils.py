"""classification/utils: ConfusionMatrixGenerator (metric formulas
replicated exactly, incl. the reference's accuracy denominator) and
DatasetSplitter (the per-class sequential walk vs the closed-form
window split), plus the distributed classify_df batch path
(ConfusionMatrixGenerator.java, DatasetSplitter.java)."""

import pandas as pd
import pytest

from lucene_spark.search.classify import (
    CachingNaiveBayesModel,
    ConfusionMatrix,
    confusion_matrix_df,
    dataset_splitter,
)


@pytest.fixture(scope="module")
def matrix(spark):
    pred = spark.createDataFrame(pd.DataFrame({
        "actual":    ["a"] * 6 + ["b"] * 4 + ["c"] * 2,
        "predicted": ["a", "a", "a", "a", "b", "c",
                      "b", "b", "a", "c",
                      "c", "c"],
    }))
    return confusion_matrix_df(pred)


def test_matrix_counts(matrix):
    rows = {(r["actual"], r["predicted"]): r["cnt"] for r in matrix.collect()}
    assert rows == {("a", "a"): 4, ("a", "b"): 1, ("a", "c"): 1,
                    ("b", "b"): 2, ("b", "a"): 1, ("b", "c"): 1,
                    ("c", "c"): 2}


def test_reference_metric_formulas(matrix):
    cm = ConfusionMatrix(matrix)
    # precision(a): tp=4, den = predicted-a column = 4+1 = 5
    assert cm.precision("a") == 4 / 5
    assert cm.recall("a") == 4 / 6
    assert cm.precision("c") == 2 / 4
    assert cm.recall("c") == 1.0
    p, r = cm.precision("b"), cm.recall("b")
    assert cm.f1("b") == 2 * p * r / (p + r)
    # reference accuracy: tp=8, fn=4; tfp counts every row containing
    # the class (a:5, b:3, c:4 -> 12), tn counts rows lacking it
    # (a:0, b:1 from c-row... see linearized walk) — replay exactly
    tp, fn, tfp, tn = 8.0, 4.0, 0.0, 0.0
    m = {"a": {"a": 4, "b": 1, "c": 1}, "b": {"b": 2, "a": 1, "c": 1},
         "c": {"c": 2}}
    for k in m:
        for row in m.values():
            if k in row:
                tfp += row[k]
            else:
                tn += 1
    assert cm.accuracy() == (tp + tn) / (tfp + fn + tn)
    assert cm.macro_precision() == (cm.precision("a") + cm.precision("b")
                                    + cm.precision("c")) / 3


def _reference_split_walk(classes):
    """Line-for-line replay of DatasetSplitter.java:136-166 per class."""
    out = {}
    for cls, ids in classes.items():
        total = len(ids)
        test_size, cv_size = total * 0.2, total * 0.3
        b = tc = cvc = 0
        for i in ids:
            if b % 2 == 0 and tc < test_size:
                out[i] = "test"
                tc += 1
            elif cvc < cv_size:
                out[i] = "cv"
                cvc += 1
            else:
                out[i] = "train"
            b += 1
    return out


def test_dataset_splitter_matches_reference_walk(spark):
    rows = pd.DataFrame({
        "doc_id": range(100),
        "lang": [["en", "de", "fr"][i % 3] for i in range(100)],
    })
    got = dataset_splitter(
        spark.createDataFrame(rows), "lang", 0.2, 0.3
    ).select("doc_id", "lang", "split").collect()
    classes = {}
    for _, r in rows.sort_values("doc_id").iterrows():
        classes.setdefault(r["lang"], []).append(r["doc_id"])
    want = _reference_split_walk(classes)
    assert {r["doc_id"]: r["split"] for r in got} == want


def test_classify_df_matches_single_text_path(spark, built_index):
    model = CachingNaiveBayesModel(built_index, "lang")
    sample = built_index.docs().select("doc_id").limit(5)
    docs = built_index.spark.createDataFrame(
        [(r["doc_id"],) for r in sample.collect()], "doc_id long"
    )
    # fetch the stored text for the sampled ids from the fixture corpus
    # (doc_id order == sort by (repo, path, commit), see conftest)
    import lucene_spark.fixtures as fx
    corpus = fx.generate_source_files(400, seed=42)
    corpus = corpus.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    ids = [r["doc_id"] for r in docs.collect()]
    src = spark.createDataFrame(pd.DataFrame({
        "doc_id": ids,
        "content": [corpus.iloc[i]["content"] for i in ids],
    }))
    batch = {r["doc_id"]: r["clazz"]
             for r in model.classify_df(src, "doc_id", "content").collect()}
    for i in ids:
        single = model.classify(corpus.iloc[i]["content"]).first()["clazz"]
        assert batch[i] == single, i
    model.unpersist()
