"""ClassicTokenizer / ClassicAnalyzer / UAX29URLEmail goldens — vectors
transcribed from the reference's TestClassicAnalyzer.java (including the
LUCENE-966 JavaCC-compliance grid) and TestUAX29URLEmailTokenizer.java
shapes. Module under test: lucene_spark/analysis/classic.py."""

import pytest

from lucene_spark.analysis.classic import (
    ClassicAnalyzer,
    UAX29URLEmailAnalyzer,
    classic_scan,
    CLASSIC_TOKEN_TYPES,
    ENGLISH_STOP_WORDS,
)
from lucene_spark.analysis import get_analyzer

A = ClassicAnalyzer()


# (text, expected tokens) — TestClassicAnalyzer.java:84-210
CLASSIC_VECTORS = [
    ("B2B", ["b2b"]),
    ("2B", ["2b"]),
    ("word_having_underscore", ["word", "having", "underscore"]),
    ("word_with_underscore_and_stopwords", ["word", "underscore", "stopwords"]),
    ("some-dashed-phrase", ["some", "dashed", "phrase"]),
    ("dogs,chase,cats", ["dogs", "chase", "cats"]),
    ("ac/dc", ["ac", "dc"]),
    ("O'Reilly", ["o'reilly"]),
    ("you're", ["you're"]),
    ("she's", ["she"]),
    ("Jim's", ["jim"]),
    ("don't", ["don't"]),
    ("O'Reilly's", ["o'reilly"]),
    ("s-class", ["s", "class"]),
    ("t-com", ["t", "com"]),
    ("a-class", ["class"]),  # "a" is a stopword once split
    ("AT&T", ["at&t"]),
    ("Excite@Home", ["excite@home"]),
    ("www.nutch.org", ["www.nutch.org"]),
    ("www.nutch.org.", ["www.nutch.org"]),  # ACRONYM_DEP -> HOST, dot dropped
    ("test@example.com", ["test@example.com"]),
    ("first.lastname@example.com", ["first.lastname@example.com"]),
    ("first_lastname@example.com", ["first_lastname@example.com"]),
    ("21.35", ["21.35"]),
    ("R2D2 C3PO", ["r2d2", "c3po"]),
    ("216.239.63.104", ["216.239.63.104"]),
    ("1-2-3", ["1-2-3"]),
    ("a1-b2-c3", ["a1-b2-c3"]),
    ("a1-b-c3", ["a1-b-c3"]),
    ("David has 5000 bones", ["david", "has", "5000", "bones"]),
    ("C embedded developers wanted", ["c", "embedded", "developers", "wanted"]),
    ("foo bar FOO BAR", ["foo", "bar", "foo", "bar"]),
    ("foo      bar .  FOO <> BAR", ["foo", "bar", "foo", "bar"]),
    ('"QUOTED" word', ["quoted", "word"]),
    ("U.S.A.", ["usa"]),
    ("C++", ["c"]),
    ("C#", ["c"]),
    ("안녕하세요 한글입니다", ["안녕하세요", "한글입니다"]),  # Korean = ALPHANUM
]

# LUCENE-966 compliance: (text, tokens, types)
COMPLIANCE = [
    ("2004.jpg", ["2004.jpg"], ["<HOST>"]),
    ("62.46", ["62.46"], ["<HOST>"]),
    ("978-0-94045043-1", ["978-0-94045043-1"], ["<NUM>"]),
    (
        "78academyawards/rules/rule02.html",
        ["78academyawards/rules/rule02.html"],
        ["<NUM>"],
    ),
    (
        "2006-03-11t082958z_01_ban130523_rtridst_0_ozabs",
        ["2006-03-11t082958z_01_ban130523_rtridst_0_ozabs"],
        ["<NUM>"],
    ),
    ("mid-20th", ["mid-20th"], ["<NUM>"]),
]


@pytest.mark.parametrize("text,expected", CLASSIC_VECTORS)
def test_classic_analyzer_vectors(text, expected):
    assert A.tokenize_one(text) == expected


@pytest.mark.parametrize("text,expected,types", COMPLIANCE)
def test_classic_compliance_types(text, expected, types):
    assert A.tokenize_one(text) == expected
    got = A.tokenize_with_types_one(text)
    assert [t for _, t in got] == types


def test_classic_compliance_many_tokens():
    text = (
        "/money.cnn.com/magazines/fortune/fortune_archive/2007/03/19/8402357/index.htm "
        "safari-0-sheikh-zayed-grand-mosque.jpg"
    )
    assert A.tokenize_one(text) == [
        "money.cnn.com", "magazines", "fortune", "fortune",
        "archive/2007/03/19/8402357", "index.htm", "safari-0-sheikh",
        "zayed", "grand", "mosque.jpg",
    ]


def test_classic_max_token_length_skips():
    # TestClassicAnalyzer.java:58 — too-long tokens SKIPPED, not chopped
    a = ClassicAnalyzer(max_token_length=2, stopwords=frozenset())
    assert a.tokenize_one("ab cd toolong xy z") == ["ab", "cd", "xy", "z"]


def test_classic_offsets():
    toks, starts, ends = A.tokenize_with_offsets_one("O'Reilly's U.S.A. book")
    assert toks == ["o'reilly", "usa", "book"]
    assert starts == [0, 11, 18]
    assert ends == [10, 17, 22]  # spans cover the original surface form


def test_classic_registered():
    assert get_analyzer("classic").tokenize_one("U.S.A.") == ["usa"]


def test_classic_stop_words_set():
    assert "the" in ENGLISH_STOP_WORDS and len(ENGLISH_STOP_WORDS) == 33


# --- UAX29URLEmail ----------------------------------------------------------

U = UAX29URLEmailAnalyzer()


def test_urlemail_urls_kept_whole():
    assert U.tokenize_one("Visit https://example.com/path?q=1 now") == [
        "visit", "https://example.com/path?q=1", "now",
    ]
    assert U.tokenize_one("see www.example.com, plain text") == [
        "see", "www.example.com", "plain", "text",
    ]
    # trailing sentence punctuation not swallowed
    assert U.tokenize_one("go to http://a.b/c.") == ["go", "to", "http://a.b/c"]


def test_urlemail_emails_kept_whole():
    assert U.tokenize_one("mail bob.smith@example.co.uk today") == [
        "mail", "bob.smith@example.co.uk", "today",
    ]


def test_urlemail_types():
    got = U.tokenize_with_types_one("x http://a.b/c y z@w.io")
    assert got == [
        ("x", "<ALPHANUM>"), ("http://a.b/c", "<URL>"),
        ("y", "<ALPHANUM>"), ("z@w.io", "<EMAIL>"),
    ]


def test_urlemail_gap_scan_is_standard():
    # no URLs/emails -> identical to the exact UAX#29 scan
    from lucene_spark.analysis.analyzer import StandardAnalyzer

    text = "the Quick brown-fox 42 jumps"
    assert U.tokenize_one(text) == StandardAnalyzer().tokenize_one(text)


def test_urlemail_offsets():
    toks, starts, ends = U.tokenize_with_offsets_one("a http://x.io b")
    assert toks == ["a", "http://x.io", "b"]
    assert starts == [0, 2, 14]
    assert ends == [1, 13, 15]
