"""Exact duplicate-substring detection/removal — pipeline/dedup.py
substring_dedup_* (Lee et al. 2022 suffix-array semantics via the
exact positional-L-gram reduction)."""

import duckdb
import pandas as pd
import pytest

from lucene_spark.pipeline.dedup import (
    substring_dedup_clean,
    substring_dedup_stats,
    substring_dedup_stats_sql,
)

L = 4
BOILER = "one two three four"  # exactly L tokens


@pytest.fixture(scope="module")
def docs(spark):
    rows = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            f"alpha beta {BOILER} gamma",        # shares the boiler run
            f"delta {BOILER} epsilon zeta",      # shares the boiler run
            "unique words only here nothing repeats ever",
            "exact duplicate document body here",
            "exact duplicate document body here",  # full-doc duplicate
        ],
    })
    return spark.createDataFrame(rows), rows


def _brute_covered(texts, n):
    """Ground truth straight from the definition: position p of doc d is
    covered iff SOME substring of length >= n containing p occurs at
    another (doc, start) too. Equivalent to: some n-gram window
    containing p is duplicated."""
    toks = {d: t.lower().split() for d, t in texts.items()}
    occ = {}
    for d, ts in toks.items():
        for i in range(len(ts) - n + 1):
            occ.setdefault(tuple(ts[i:i + n]), []).append((d, i))
    covered = {d: set() for d in toks}
    for gram, places in occ.items():
        if len(places) > 1:
            for d, i in places:
                covered[d].update(range(i, i + n))
    return {d: len(c) for d, c in covered.items()}, toks


def test_stats_match_brute_force_definition(spark, docs):
    df, rows = docs
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_dup_pos"])
        for r in substring_dedup_stats(df, min_len=L, k=100).collect()
    }
    want_cov, toks = _brute_covered(dict(zip(rows.doc_id, rows.text)), L)
    for d in want_cov:
        assert got[d] == (len(toks[d]), want_cov[d]), d
    # the planted shapes: boiler run covered on both sides, unique doc
    # untouched, full duplicates fully covered
    assert got[2][1] == 0
    assert got[3][1] == got[3][0] and got[4][1] == got[4][0]
    assert got[0][1] == L and got[1][1] == L


def test_stats_match_duckdb(spark, docs):
    df, rows = docs
    got = sorted(
        tuple(r) for r in substring_dedup_stats(df, min_len=L, k=100).collect()
    )
    con = duckdb.connect()
    con.register("documents", rows)
    want = sorted(
        tuple(t)
        for t in con.execute(substring_dedup_stats_sql(min_len=L, k=100)).fetchall()
    )
    assert got == want


def test_clean_removes_exactly_the_covered_tokens(spark, docs):
    df, rows = docs
    got = {
        r["doc_id"]: r["clean_text"]
        for r in substring_dedup_clean(df, min_len=L).collect()
    }
    assert got[0] == "alpha beta gamma"
    assert got[1] == "delta epsilon zeta"
    assert got[2] == rows.text[2]
    assert got[3] == "" and got[4] == ""


def test_within_doc_repetition_counts(spark):
    # the suffix array sees within-doc repeats too: a doc repeating its
    # own 4-gram is self-duplicated
    df = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0],
        "text": ["a b c d x a b c d"],
    }))
    out = substring_dedup_stats(df, min_len=4, k=10).head()
    assert out["n_dup_pos"] == 8  # both occurrences of 'a b c d'
