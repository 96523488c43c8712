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
    # dot between letters JOINS (UAX#29 WB6/WB7: '.' is MidNumLet; the
    # reference emits example.com as one token — differentially verified)
    ("foo.bar baz.qux", ["foo.bar", "baz.qux"]),
    ("visit example.com: it's a:b", ["visit", "example.com", "it's", "a:b"]),
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


# ---------------------------------------------------------------------------
# CodeAnalyzer (WordDelimiterGraph role)
# ---------------------------------------------------------------------------


def test_code_analyzer_camel_snake_digits():
    from lucene_spark.analysis.analyzer import CodeAnalyzer

    a = CodeAnalyzer()
    assert a.tokenize_one("parseHTTPResponse_v2") == [
        "parsehttpresponse_v2", "parse", "http", "response", "v", "2",
    ]
    assert a.tokenize_one("snake_case_name") == [
        "snake_case_name", "snake", "case", "name",
    ]
    # a plain lowercase word emits only itself (parts == original)
    assert a.tokenize_one("simple") == ["simple"]
    assert a.tokenize_one("XMLHttpRequest") == [
        "xmlhttprequest", "xml", "http", "request",
    ]
    assert a.tokenize_one("utf8Decoder") == ["utf8decoder", "utf", "8", "decoder"]


def test_code_analyzer_no_preserve():
    from lucene_spark.analysis.analyzer import CodeAnalyzer

    a = CodeAnalyzer(preserve_original=False)
    assert a.tokenize_one("buildIndexFast x") == ["build", "index", "fast", "x"]


def test_code_analyzer_indexes_and_searches(spark, tmp_path):
    """End-to-end: an index built with the code analyzer matches
    identifier parts."""
    import pandas as pd

    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexReader, IndexSearcher

    rows = pd.DataFrame(
        {
            "repo": ["r"] * 3,
            "path": [f"f{i}" for i in range(3)],
            "commit": ["c"] * 3,
            "content": [
                "def parseHTTPResponse(): pass",
                "class IndexWriter: flushBuffer()",
                "plain words only",
            ],
        }
    )
    idx = str(tmp_path / "codeidx")
    build_index(
        spark, spark.createDataFrame(rows), idx,
        IndexConfig(analyzer="code", docs_per_segment=10),
    )
    s = IndexSearcher(IndexReader(spark, idx))
    # part term matches the camelCase identifier's document
    hits = s.search(Q.TermQuery("content", "http"), k=5).hits
    assert [h.doc_id for h in hits] == [0]
    hits2 = s.search(Q.TermQuery("content", "flushbuffer"), k=5).hits
    assert [h.doc_id for h in hits2] == [1]
