"""URL curation ops (pipeline/urlops.py): canonicalization rules,
domain extraction, skew-aware per-domain caps."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline import urlops as uo


CASES = [
    # (raw, normalized)
    ("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&q=1#frag",
     "https://example.com/a/b/?q=1"),
    ("http://example.com:80/", "http://example.com/"),
    ("https://example.com/path/", "https://example.com/path"),
    ("https://example.com/p?utm_campaign=c", "https://example.com/p"),
    ("https://example.com/p?a=1&fbclid=xyz", "https://example.com/p?a=1"),
    ("https://example.com/p?gclid=g&a=1", "https://example.com/p?a=1"),
    ("https://sub.example.com:8080/x", "https://sub.example.com:8080/x"),
    ("https://example.com/p?ref=hn&utm_medium=m&b=2",
     "https://example.com/p?b=2"),
]


def test_normalization_rules(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], "id long, url string")
    out = uo.normalize_urls(df, "url").orderBy("id").toPandas()
    for i, (raw, want) in enumerate(CASES):
        assert out.norm_url[i] == want, raw


def test_domain_extraction(spark):
    df = spark.createDataFrame(
        [(0, "HTTPS://WWW.Example.COM:443/x"),
         (1, "http://sub.Example.com:8080/y"),
         (2, "https://example.com/z")],
        "id long, url string")
    out = uo.normalize_urls(df, "url").orderBy("id").toPandas()
    assert out.domain.tolist() == ["example.com", "sub.example.com",
                                   "example.com"]


def test_domain_cap_exact_and_deterministic(spark):
    rows = [(i, f"d{i % 5}") for i in range(100)]  # 5 domains x 20
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    kept = uo.domain_cap_sample(df, "domain", "doc_id", cap=3).toPandas()
    per = kept.groupby("domain").size().to_dict()
    assert per == {f"d{i}": 3 for i in range(5)}
    kept2 = uo.domain_cap_sample(df, "domain", "doc_id", cap=3).toPandas()
    assert sorted(kept.doc_id) == sorted(kept2.doc_id)
    # a different salt redraws the survivors
    kept3 = uo.domain_cap_sample(
        df, "domain", "doc_id", cap=3, salt="other").toPandas()
    assert sorted(kept.doc_id) != sorted(kept3.doc_id)


def test_domain_cap_undercap_domains_pass_through(spark):
    rows = [(i, "big") for i in range(50)] + [(100 + i, f"s{i}") for i in range(4)]
    df = spark.createDataFrame(rows, "doc_id long, domain string")
    kept = uo.domain_cap_sample(df, "domain", "doc_id", cap=10).toPandas()
    assert (kept.domain == "big").sum() == 10
    # every under-cap row survives untouched
    assert sorted(kept[kept.domain != "big"].doc_id) == [100, 101, 102, 103]
