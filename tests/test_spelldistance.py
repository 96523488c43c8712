"""Spell string distances — lucene_spark/search/spelldistance.py.

Reference semantics (suggest/.../spell/): LevenshteinDistance (max-len
normalized), LuceneLevenshteinDistance (Damerau, MIN-len normalized),
JaroWinklerDistance (Winkler 1990, threshold 0.7), NGramDistance
(Kondrak 2005 positional n-grams). Goldens are classic published
Jaro-Winkler values; JW is also cross-validated bit-exact against
DuckDB's independent implementation."""

import random
import string

import duckdb
import pytest

from lucene_spark.search.spelldistance import (
    DISTANCES,
    jaro_winkler_similarity,
    levenshtein_similarity,
    lucene_levenshtein_similarity,
    ngram_similarity,
    suggest_terms_ranked,
)


def test_jaro_winkler_classic_goldens():
    assert round(jaro_winkler_similarity("martha", "marhta"), 4) == 0.9611
    assert round(jaro_winkler_similarity("dixon", "dicksonx"), 4) == 0.8133
    assert round(jaro_winkler_similarity("dwayne", "duane"), 4) == 0.84
    assert jaro_winkler_similarity("same", "same") == 1.0
    assert jaro_winkler_similarity("abc", "xyz") == 0.0


def test_jaro_winkler_matches_duckdb_exactly():
    con = duckdb.connect()
    rng = random.Random(7)
    for _ in range(1500):
        a = "".join(rng.choices(string.ascii_lowercase[:6],
                                k=rng.randint(1, 8)))
        b = "".join(rng.choices(string.ascii_lowercase[:6],
                                k=rng.randint(1, 8)))
        want = con.execute(
            "SELECT jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        assert abs(jaro_winkler_similarity(a, b) - want) < 1e-9, (a, b)


def test_levenshtein_variants():
    # max-length normalization vs the Damerau MIN-length comparator
    assert levenshtein_similarity("ab", "ba") == 0.0  # ed 2 / max 2
    assert lucene_levenshtein_similarity("ab", "ba") == 0.5  # 1 swap / 2
    assert levenshtein_similarity("", "") == 1.0
    assert levenshtein_similarity("", "x") == 0.0
    # the Lucene comparator is NOT clamped
    assert lucene_levenshtein_similarity("a", "xyz") < 0


def test_ngram_distance_properties():
    assert ngram_similarity("hello", "hello") == 1.0
    assert ngram_similarity("", "") == 1.0
    assert ngram_similarity("a", "") == 0.0
    # short-string fallback: positional overlap / max length
    assert ngram_similarity("a", "ab") == pytest.approx(0.5)
    # bounded on regular inputs, sensitive to locality of the edit
    s1 = ngram_similarity("kitten", "sitten")
    s2 = ngram_similarity("kitten", "kittez")
    assert 0.0 <= s1 <= 1.0 and 0.0 <= s2 <= 1.0
    assert ngram_similarity("kitten", "xyzzyq") < s1


def test_suggest_terms_ranked_orders_by_distance(spark):
    from lucene_spark.gate import ensure_index

    r = ensure_index(spark, "/root/testdata/sf0.001")
    for name in DISTANCES:
        rows = suggest_terms_ranked(
            r, "text", "spork", distance=name, max_edits=2, k=5
        ).collect()
        assert rows, name
        scores = [x["score_x1e6"] for x in rows]
        assert scores == sorted(scores, reverse=True), name
        fn = DISTANCES[name]
        for x in rows:
            assert x["score_x1e6"] == round(fn("spork", x["term"]) * 1e6), (
                name, x["term"])
