"""StandardAnalyzer-equivalent golden token fixtures (FIXTURES.md §4)."""

import pandas as pd

from lucene_spark.analysis import SimpleAnalyzer, StandardAnalyzer, WhitespaceAnalyzer, get_analyzer

A = StandardAnalyzer()

GOLDEN = [
    # ascii code
    ("def foo(bar): return bar + 1", ["def", "foo", "bar", "return", "bar", "1"]),
    # underscore joins (ExtendNumLet)
    ("snake_case_name mixedCase", ["snake_case_name", "mixedcase"]),
    # digits with dots/commas join (MidNum)
    ("pi is 3.14 and v1.2.3 released; 1,000 items", ["pi", "is", "3.14", "and", "v1.2.3", "released", "1,000", "items"]),
    # dot between letters splits
    ("foo.bar baz.qux", ["foo", "bar", "baz", "qux"]),
    # apostrophe joins letters
    ("don't stop", ["don't", "stop"]),
    # punctuation runs
    ("a---b ===> c!!!", ["a", "b", "c"]),
    # accents lowercased, kept
    ("Café MÜNCHEN", ["café", "münchen"]),
    # Han: one token per ideograph; katakana run; hangul run
    ("汉字测试", ["汉", "字", "测", "试"]),
    ("カタカナ and 한국어", ["カタカナ", "and", "한국어"]),
    # empty / whitespace-only
    ("", []),
    ("   \t\n  ", []),
    # numbers and hex-ish identifiers
    ("0xDEADbeef 42 v2", ["0xdeadbeef", "42", "v2"]),
]


def test_golden_tokens():
    for text, expected in GOLDEN:
        assert A.tokenize_one(text) == expected, text


def test_max_token_length_chop():
    long = "x" * 600
    toks = A.tokenize_one(f"a {long} b")
    assert toks == ["a", "x" * 255, "x" * 255, "x" * 90, "b"]


def test_series_tokenize_handles_nulls():
    s = pd.Series(["hello World", None, ""])
    out = A.tokenize(s)
    assert out.tolist() == [["hello", "world"], [], []]


def test_simple_analyzer_matches_sql_semantics():
    # must equal regexp_split semantics on lower(content)
    s = SimpleAnalyzer()
    assert s.tokenize_one("Hello, World-42 foo_bar") == ["hello", "world", "42", "foo", "bar"]


def test_whitespace_analyzer():
    w = WhitespaceAnalyzer()
    assert w.tokenize_one("A b\tC") == ["A", "b", "C"]


def test_registry():
    assert get_analyzer("standard").name == "standard"
    assert get_analyzer("simple").name == "simple"
    import pytest
    with pytest.raises(ValueError):
        get_analyzer("nope")
