"""Deterministic splits / stratified sampling / PII redaction —
lucene_spark/pipeline/sampling.py + textstats PII block."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline.sampling import (
    hash_split,
    hash_split_sql,
    stratified_sample,
    stratified_sample_sql,
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame({
            "doc_id": range(5000),
            "lang": [["en", "es", "de", "fr"][i % 4] for i in range(5000)],
            "text": ["lorem ipsum"] * 5000,
        })
    )


W = {"train": 0.8, "val": 0.1, "test": 0.1}


def test_split_disjoint_exhaustive_proportional(spark, docs):
    out = hash_split(docs, W).cache()
    assert out.count() == 5000  # exhaustive
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(W)
    for name, w in W.items():
        assert abs(counts[name] / 5000 - w) < 0.03, (name, counts)


def test_split_partitioning_invariant(spark, docs):
    # the reason this exists instead of randomSplit: the assignment
    # must not depend on physical partitioning
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, W).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(docs.repartition(17), W).collect()
    }
    assert a == b


def test_split_salt_redraws(spark, docs):
    a = {r["doc_id"]: r["split"] for r in hash_split(docs, W, salt="s1").collect()}
    b = {r["doc_id"]: r["split"] for r in hash_split(docs, W, salt="s2").collect()}
    assert a != b
    moved = sum(1 for d in a if a[d] != b[d])
    assert moved > 1000  # an independent redraw, not a perturbation


def test_split_weights_must_sum(spark, docs):
    with pytest.raises(ValueError):
        hash_split(docs, {"a": 0.5, "b": 0.4})


def test_split_matches_duckdb(spark, docs):
    got = sorted(
        (r["doc_id"], r["bucket"], r["split"])
        for r in hash_split(docs, W).collect()
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = sorted(tuple(t) for t in con.execute(hash_split_sql(W)).fetchall())
    assert got == want


def test_stratified_sample_thresholds(spark, docs):
    fr = {"en": 0.5, "es": 0.1}
    out = stratified_sample(docs, "lang", fr).cache()
    counts = {
        r["stratum"]: r["n"]
        for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    # default_fraction=0 drops unlisted strata entirely
    assert set(counts) <= {"en", "es"}
    assert abs(counts["en"] / 1250 - 0.5) < 0.08
    assert abs(counts["es"] / 1250 - 0.1) < 0.05
    # threshold sampling nests: the 10% sample of a stratum is a subset
    # of its 50% sample under the same salt
    small = {
        r["doc_id"]
        for r in stratified_sample(docs, "lang", {"en": 0.1}).collect()
    }
    big = {
        r["doc_id"]
        for r in stratified_sample(docs, "lang", {"en": 0.5}).collect()
    }
    assert small <= big


def test_stratified_matches_duckdb(spark, docs):
    fr = {"en": 0.3, "de": 0.2}
    got = sorted(
        (r["doc_id"], r["stratum"], r["bucket"])
        for r in stratified_sample(docs, "lang", fr).collect()
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = sorted(
        tuple(t)
        for t in con.execute(stratified_sample_sql("lang", fr)).fetchall()
    )
    assert got == want and len(got) > 0


def test_pii_stats_and_redaction(spark):
    from lucene_spark.pipeline.textstats import pii_stats, pii_stats_sql

    rows = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "reach me at a.b+c@mail.example.org or b@x.io thanks",
            "server 192.168.001.1 and 10.0.0.255 responded",
            "call +1 (555) 867-5309 or 555-123-4567 now",
            "nothing sensitive here 123",
        ],
    })
    docs = spark.createDataFrame(rows)
    got = pii_stats(docs).collect()
    by = {r["doc_id"]: r for r in got}
    assert (by[0]["n_email"], by[0]["n_ipv4"], by[0]["n_phone"]) == (2, 0, 0)
    assert (by[1]["n_email"], by[1]["n_ipv4"], by[1]["n_phone"]) == (0, 2, 0)
    assert (by[2]["n_email"], by[2]["n_ipv4"], by[2]["n_phone"]) == (0, 0, 2)
    assert (by[3]["n_email"], by[3]["n_ipv4"], by[3]["n_phone"]) == (0, 0, 0)
    assert by[3]["redacted_len"] == len(rows["text"][3])  # untouched
    assert by[0]["redacted_len"] < len(rows["text"][0])  # masked shorter
    # engine == oracle, exactly
    con = duckdb.connect()
    con.register("documents", rows)
    want = con.execute(pii_stats_sql()).fetchall()
    assert sorted(tuple(r) for r in got) == sorted(tuple(t) for t in want)


def test_mixture_sample_hits_target_composition(spark, docs):
    from lucene_spark.pipeline.sampling import mixture_sample

    # corpus is 25% each of en/es/de/fr; ask for a 20% budget at
    # 60/30/10 en/es/de -> fractions 0.48/0.24/0.08, none capped
    out = mixture_sample(
        docs, "lang", {"en": 0.6, "es": 0.3, "de": 0.1}, budget_frac=0.2
    ).cache()
    counts = {
        r["stratum"]: r["n"]
        for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert "fr" not in counts  # untargeted stratum drops
    total = sum(counts.values())
    assert abs(total / 5000 - 0.2) < 0.03
    assert abs(counts["en"] / total - 0.6) < 0.06
    assert abs(counts["es"] / total - 0.3) < 0.05
    assert abs(counts["de"] / total - 0.1) < 0.04


def test_mixture_sample_caps_overdemanded_stratum(spark, docs):
    from lucene_spark.pipeline.sampling import mixture_sample

    # en holds 25% of the corpus but the target wants 90% of a 50%
    # budget = 45% of the corpus from en alone -> fraction capped at 1,
    # every en row kept
    out = mixture_sample(docs, "lang", {"en": 0.9, "es": 0.1}, 0.5)
    counts = {
        r["stratum"]: r["n"]
        for r in out.groupBy("stratum").agg(F.count("*").alias("n")).collect()
    }
    assert counts["en"] == 1250


def test_mixture_matches_duckdb(spark, docs):
    from lucene_spark.pipeline.sampling import (
        mixture_sample,
        mixture_sample_sql,
    )

    got = sorted(
        (r["doc_id"], r["stratum"], r["bucket"])
        for r in mixture_sample(
            docs, "lang", {"en": 0.6, "es": 0.3, "de": 0.1}, 0.2
        ).collect()
    )
    con = duckdb.connect()
    con.register("documents", docs.toPandas())
    want = sorted(
        tuple(t)
        for t in con.execute(
            mixture_sample_sql("lang", {"en": 0.6, "es": 0.3, "de": 0.1}, 0.2)
        ).fetchall()
    )
    assert got == want and len(got) > 500


def test_temperature_sample_upweights_small_strata(spark):
    import pandas as pd

    from lucene_spark.pipeline.sampling import temperature_sample

    # 900 'big' docs vs 100 'small' docs; alpha=0.5 flattens the mix
    rows = pd.DataFrame({
        "doc_id": range(1000),
        "lang": ["big"] * 900 + ["small"] * 100,
    })
    d = spark.createDataFrame(rows)
    out = temperature_sample(d, "lang", alpha=0.5, budget_frac=0.4)
    got = {r["lang"]: r["n"] for r in
           out.groupBy(out.stratum.alias("lang")).agg(
               __import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n")
           ).collect()}
    # expected keep fractions: w_big = 30/40, w_small = 10/40;
    # keep_big = .4*1000*(3/4)/900 = 1/3; keep_small = .4*1000*(1/4)/100 = 1
    assert got["small"] == 100          # capped at 1: keep all
    assert abs(got["big"] - 300) < 40   # ~1/3 of 900, hash-exact per salt
    # alpha=1 reduces to proportional sampling: both strata ~40%
    prop = temperature_sample(d, "lang", alpha=1.0, budget_frac=0.4)
    gp = {r["stratum"]: 1 for r in prop.collect()}
    n = prop.count()
    assert abs(n - 400) < 40


def test_temperature_sample_deterministic(spark):
    import pandas as pd

    from lucene_spark.pipeline.sampling import temperature_sample

    rows = pd.DataFrame({"doc_id": range(200),
                         "lang": ["a", "b"] * 100})
    d = spark.createDataFrame(rows)
    a = sorted(r["doc_id"] for r in
               temperature_sample(d, "lang", 0.7, 0.5).collect())
    b = sorted(r["doc_id"] for r in
               temperature_sample(d, "lang", 0.7, 0.5).collect())
    assert a == b and len(a) > 0
