"""Late-interaction SUM_MAX_SIM rescoring (core/search/
LateInteractionRescorer.java + LateInteractionFloatValuesSource.java
ScoreFunction.SUM_MAX_SIM, core/document/LateInteractionField.java):
per query token take the max normalized cosine over the doc's token
vectors, sum over query tokens; missing multi-vectors score 0."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline.lateinteraction import (
    late_interaction_rescore,
    late_interaction_rescore_flat,
)


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return (1 + d / (na * nb)) / 2


@pytest.fixture(scope="module")
def mv(spark):
    rows = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "mvec": [
            [[1.0, 0.0], [0.0, 1.0]],           # orthogonal pair
            [[0.6, 0.8]],                        # single token
            [[-1.0, 0.0], [0.5, 0.5]],
        ],
    })
    return spark.createDataFrame(rows)


def test_sum_max_sim_matches_reference_math(spark, mv):
    q = [[1.0, 0.0], [0.0, 1.0]]
    first = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2, 3]}))
    got = {
        r["doc_id"]: r["score_x1e6"]
        for r in late_interaction_rescore(first, mv, "mvec", q, k=10).collect()
    }
    docs = {1: [[1.0, 0.0], [0.0, 1.0]], 2: [[0.6, 0.8]],
            3: [[-1.0, 0.0], [0.5, 0.5]]}
    for d, toks in docs.items():
        want = sum(max(_cos(qv, t) for t in toks) for qv in q)
        assert got[d] == round(want * 1e6), d


def test_missing_multivector_scores_zero(spark, mv):
    first = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 99]}))
    got = {
        r["doc_id"]: r["score_x1e6"]
        for r in late_interaction_rescore(
            first, mv, "mvec", [[1.0, 0.0]], k=10).collect()
    }
    assert got[99] == 0 and got[1] > 0


def test_flat_form_is_codegen_and_one_shuffle(spark, mv):
    toks = mv.select("doc_id", F.explode("mvec").alias("v"))
    out = late_interaction_rescore_flat(
        toks, "doc_id", "v", [[1.0, 0.0], [0.0, 1.0]], k=10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan


def test_empty_multivector_scores_zero(spark):
    rows = pd.DataFrame({"doc_id": [1, 2],
                         "mvec": [[[1.0, 0.0]], []]})
    mv = spark.createDataFrame(rows, "doc_id long, mvec array<array<double>>")
    first = spark.createDataFrame(pd.DataFrame({"doc_id": [1, 2]}))
    got = {r["doc_id"]: r["score_x1e6"]
           for r in late_interaction_rescore(
               first, mv, "mvec", [[1.0, 0.0]], k=10).collect()}
    assert got[2] == 0 and got[1] == 1_000_000
