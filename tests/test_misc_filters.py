"""Filter pack 3 goldens — every vector transcribed from the
reference's own test suite (file cites in lucene_spark/analysis/misc.py
docstring):

- TestScandinavianNormalizationFilter.java / TestScandinavianFoldingFilter.java
- TestGermanNormalizationFilter.java
- TestTurkishLowerCaseFilter.java / TestApostropheFilter.java
- TestElision.java, TestDecimalDigitFilter.java
- TestCommonGramsFilter.java (both index- and query-side full s/n grid)
- TestFingerprintFilter.java, TestHyphenatedWordsFilter.java,
  TestKeepWordFilter.java
"""

import pytest

from lucene_spark.analysis.misc import (
    ApostropheFilter,
    CommonGramsFilter,
    CommonGramsQueryFilter,
    DecimalDigitFilter,
    ElisionFilter,
    FingerprintFilter,
    GermanNormalizationFilter,
    HyphenatedWordsFilter,
    KeepWordFilter,
    ScandinavianFoldingFilter,
    ScandinavianNormalizationFilter,
    TurkishLowerCaseFilter,
    german_normalize,
    scandinavian_fold,
    scandinavian_normalize,
    turkish_lower,
)
from lucene_spark.analysis import get_analyzer


# --- ScandinavianNormalization (TestScandinavianNormalizationFilter.java) ---

SCAN_NORM = [
    ("aeäaeeea", "æææeea"),
    ("aeäaeeeae", "æææeeæ"),
    ("aeaeeeae", "ææeeæ"),
    ("bøen", "bøen"),
    ("bOEen", "bØen"),
    ("åene", "åene"),
    ("blåbærsyltetøj", "blåbærsyltetøj"),
    ("blaabaersyltetöj", "blåbærsyltetøj"),
    ("räksmörgås", "ræksmørgås"),
    ("raeksmörgaos", "ræksmørgås"),
    ("raeksmörgaas", "ræksmørgås"),
    ("raeksmoergås", "ræksmørgås"),
    ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
    ("å", "å"), ("aa", "å"), ("aA", "å"), ("ao", "å"), ("aO", "å"),
    ("AA", "Å"), ("Aa", "Å"), ("Ao", "Å"), ("AO", "Å"),
    ("æ", "æ"), ("ä", "æ"), ("Æ", "Æ"), ("Ä", "Æ"),
    ("ae", "æ"), ("aE", "æ"), ("Ae", "Æ"), ("AE", "Æ"),
    ("ö", "ø"), ("ø", "ø"), ("Ö", "Ø"), ("Ø", "Ø"),
    ("oo", "ø"), ("oe", "ø"), ("oO", "ø"),
]


@pytest.mark.parametrize("inp,exp", SCAN_NORM)
def test_scandinavian_normalize(inp, exp):
    assert scandinavian_normalize(inp) == exp
    assert ScandinavianNormalizationFilter().apply([inp]) == [exp]


def test_scandinavian_normalize_folding_subset():
    # Norwegian profile drops the AO/OO foldings: "ao" stays "ao"
    assert scandinavian_normalize("ao", frozenset({"AA", "AE", "OE"})) == "ao"
    assert scandinavian_normalize("aa", frozenset({"AA", "AE", "OE"})) == "å"
    with pytest.raises(ValueError):
        ScandinavianNormalizationFilter(frozenset({"XX"}))


# --- ScandinavianFolding (TestScandinavianFoldingFilter.java) ---

SCAN_FOLD = [
    ("aeäaeeea", "aaaeea"),
    ("aeäaeeeae", "aaaeea"),
    ("aeaeeeae", "aaeea"),
    ("bøen", "boen"),
    ("åene", "aene"),
    ("blåbærsyltetøj", "blabarsyltetoj"),
    ("blaabaarsyltetoej", "blabarsyltetoj"),
    ("blåbärsyltetöj", "blabarsyltetoj"),
    ("raksmorgas", "raksmorgas"),
    ("räksmörgås", "raksmorgas"),
    ("ræksmørgås", "raksmorgas"),
    ("raeksmoergaas", "raksmorgas"),
    ("ræksmörgaos", "raksmorgas"),
    ("ab", "ab"), ("ob", "ob"), ("Ab", "Ab"), ("Ob", "Ob"),
    ("å", "a"), ("aa", "a"), ("aA", "a"), ("ao", "a"), ("aO", "a"),
    ("AA", "A"), ("Aa", "A"), ("Ao", "A"), ("AO", "A"),
    ("æ", "a"), ("ä", "a"), ("Æ", "A"), ("Ä", "A"),
    ("ae", "a"), ("aE", "a"), ("Ae", "A"), ("AE", "A"),
    ("ö", "o"), ("ø", "o"), ("Ö", "O"), ("Ø", "O"),
    ("oo", "o"), ("oe", "o"),
]


@pytest.mark.parametrize("inp,exp", SCAN_FOLD)
def test_scandinavian_fold(inp, exp):
    assert scandinavian_fold(inp) == exp
    assert ScandinavianFoldingFilter().apply([inp]) == [exp]


# --- GermanNormalization (TestGermanNormalizationFilter.java) ---

GERMAN = [
    ("Schaltflächen", "Schaltflachen"),
    ("Schaltflaechen", "Schaltflachen"),
    ("dauer", "dauer"),
    ("weißbier", "weissbier"),
    ("", ""),
]


@pytest.mark.parametrize("inp,exp", GERMAN)
def test_german_normalize(inp, exp):
    assert german_normalize(inp) == exp
    assert GermanNormalizationFilter().apply([inp]) == [exp]


def test_german_normalize_ue_rule():
    # 'e' deleted only in U state: "ue" -> "u", but "aue"/"eue" keep it
    assert german_normalize("mueller") == "muller"
    assert german_normalize("bauer") == "bauer"


# --- TurkishLowerCase (TestTurkishLowerCaseFilter.java) ---

TURKISH = [
    # composed / decomposed forms from TestTurkishLowerCaseFilter.java
    ("\u0130STANBUL", "istanbul"),
    ("\u0130ZM\u0130R", "izmir"),
    ("ISPARTA", "\u0131sparta"),
    ("\u0049\u0307STANBUL", "istanbul"),
    ("\u0049\u0307ZM\u0049\u0307R", "izmir"),
    # another combining mark between I and the dot (testDecomposed2)
    ("\u0049\u0316\u0307STANBUL", "i\u0316stanbul"),
    ("I\u0316SPARTA", "\u0131\u0316sparta"),
    ("\u0049\u0307", "i"),
    ("\u0130", "i"),
    ("", ""),
]


@pytest.mark.parametrize("inp,exp", TURKISH)
def test_turkish_lower(inp, exp):
    assert turkish_lower(inp) == exp
    assert TurkishLowerCaseFilter().apply([inp]) == [exp]


def test_apostrophe_filter():
    # TestApostropheFilter.java: lowercase then apostrophe-strip
    toks = ["Türkiye'de", "2003'te", "Van", "Gölü'nü", "gördüm"]
    toks = TurkishLowerCaseFilter().apply(toks)
    toks = ApostropheFilter().apply(toks)
    assert toks == ["türkiye", "2003", "van", "gölü", "gördüm"]


def test_turkish_registered_analyzer():
    # TurkishAnalyzer.java order: tokenize -> apostrophe -> turkish lower
    a = get_analyzer("turkish")
    assert a.tokenize_one("İSTANBUL'da IŞIK") == ["istanbul", "ışık"]


# --- Elision (TestElision.java) ---

def test_elision():
    toks = ["Plop", "juste", "pour", "voir", "l'embrouille", "avec",
            "O'brian", "M'enfin"]
    out = ElisionFilter(frozenset({"l", "M"})).apply(toks)
    assert out[4] == "embrouille"
    assert out[6] == "O'brian"
    assert out[7] == "enfin"


def test_elision_default_articles_typographic():
    out = ElisionFilter().apply(["l’avion", "qu'il", "xyz'abc"])
    assert out == ["avion", "il", "xyz'abc"]


# --- DecimalDigit (TestDecimalDigitFilter.java) ---

def test_decimal_digit():
    assert DecimalDigitFilter().apply(["١٢٣٤"]) == ["1234"]  # arabic-indic
    assert DecimalDigitFilter().apply(["๑๒๓"]) == ["123"]    # thai
    assert DecimalDigitFilter().apply(["abc123"]) == ["abc123"]
    # supplementary-plane digits shrink (OSMANYA DIGIT ONE U+104A1)
    assert DecimalDigitFilter().apply(["\U000104A1"]) == ["1"]


# --- CommonGrams (TestCommonGramsFilter.java, common = of/the/s) ---

COMMON = frozenset({"of", "the", "s"})

CG_INDEX = [
    ("the", ["the"]),
    ("foo", ["foo"]),
    ("brown fox", ["brown", "fox"]),
    ("the fox", ["the", "the_fox", "fox"]),
    ("fox of", ["fox", "fox_of", "of"]),
    ("of the", ["of", "of_the", "the"]),
    ("quick brown fox", ["quick", "brown", "fox"]),
    ("quick brown the", ["quick", "brown", "brown_the", "the"]),
    ("quick the fox", ["quick", "quick_the", "the", "the_fox", "fox"]),
    ("fox of the", ["fox", "fox_of", "of", "of_the", "the"]),
    ("the quick brown", ["the", "the_quick", "quick", "brown"]),
    ("the fox of", ["the", "the_fox", "fox", "fox_of", "of"]),
    ("of the fox", ["of", "of_the", "the", "the_fox", "fox"]),
    ("of the of", ["of", "of_the", "the", "the_of", "of"]),
]


@pytest.mark.parametrize("inp,exp", CG_INDEX)
def test_common_grams_index(inp, exp):
    assert CommonGramsFilter(COMMON).apply(inp.split()) == exp


CG_QUERY = [
    ("brown fox", ["brown", "fox"]),
    ("the fox", ["the_fox"]),
    ("fox of", ["fox_of"]),
    ("of the", ["of_the"]),
    ("the", ["the"]),
    ("foo", ["foo"]),
    ("quick brown fox", ["quick", "brown", "fox"]),
    ("quick brown the", ["quick", "brown_the"]),
    ("quick the brown", ["quick_the", "the_brown"]),
    ("fox of the", ["fox_of", "of_the"]),
    ("the quick brown", ["the_quick", "quick", "brown"]),
    ("the fox of", ["the_fox", "fox_of"]),
    ("of the fox", ["of_the", "the_fox"]),
    ("of the of", ["of_the", "the_of"]),
]


@pytest.mark.parametrize("inp,exp", CG_QUERY)
def test_common_grams_query(inp, exp):
    assert CommonGramsQueryFilter(COMMON).apply(inp.split()) == exp


# --- Fingerprint (TestFingerprintFilter.java) ---

def test_fingerprint():
    f = FingerprintFilter()
    assert f.apply("B A B E".split()) == ["A B E"]
    assert f.apply(["B2", "B2"]) == ["B2"]
    assert f.apply(["A1"]) == ["A1"]
    assert f.apply([]) == []
    assert FingerprintFilter(4).apply("B2 A1 C3 D4 E5 F6 G7 H1".split()) == []
    assert FingerprintFilter(separator="_").apply(
        "B2 A1 C3 B2".split()) == ["A1_B2_C3"]


# --- HyphenatedWords (TestHyphenatedWordsFilter.java) ---

def test_hyphenated_words():
    f = HyphenatedWordsFilter()
    toks = "ecologi- cal devel- op compre- hensive-hands-on and ecologi- cal".split()
    assert f.apply(toks) == [
        "ecological", "develop", "comprehensive-hands-on", "and", "ecological"
    ]
    toks = "ecologi- cal devel- op compre- hensive-hands-on and ecology-".split()
    assert f.apply(toks) == [
        "ecological", "develop", "comprehensive-hands-on", "and", "ecology-"
    ]
    assert f.apply("abc- def geh 1234- 5678-".split()) == [
        "abcdef", "geh", "12345678-"
    ]


# --- KeepWord (TestKeepWordFilter.java) ---

def test_keep_word():
    words = frozenset({"aaa", "BBB"})
    assert KeepWordFilter(words).apply(
        ["aaa", "the", "BBB", "foo"]) == ["aaa", "BBB"]


# ---------------------------------------------------------------------------
# KeywordRepeat + RemoveDuplicates / DelimitedTermFrequency /
# ConcatenateGraph (analysis pack 4)
# ---------------------------------------------------------------------------


def test_keyword_repeat_emission():
    from lucene_spark.analysis import get_analyzer

    a = get_analyzer("keyword_repeat_porter")
    toks, pos = a.tokenize_with_positions_one("running tables scan query")
    # stem != surface -> stacked copy at the same position;
    # stem == surface ('scan') -> RemoveDuplicates drops the copy
    assert toks == ["running", "run", "tables", "tabl", "scan", "query", "queri"]
    assert pos == [0, 0, 1, 1, 2, 3, 3]


def test_delimited_termfreq_emission():
    from lucene_spark.analysis import get_analyzer

    a = get_analyzer("delimited_termfreq")
    toks = a.tokenize_one("hello|3 world x|bad y|0")
    assert toks == ["hello", "hello", "hello", "world", "x|bad", "y"]


def test_delimited_termfreq_bm25_equals_repeated_text(spark, tmp_path):
    # tf=N via the delimiter must score exactly like N real repeats
    import pandas as pd

    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader
    from lucene_spark.search import sqlpath as sp

    docs_tf = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1], "text": ["apple|3 pie", "apple pie pie"]}))
    docs_rep = spark.createDataFrame(pd.DataFrame({
        "doc_id": [0, 1], "text": ["apple apple apple pie", "apple pie pie"]}))
    outs = []
    for name, d, an in (("tf", docs_tf, "delimited_termfreq"),
                        ("rep", docs_rep, "whitespace")):
        p = str(tmp_path / name)
        build_index(spark, d, p, IndexConfig(
            field="text", content_col="text", analyzer=an,
            doc_id_col="doc_id", docs_per_segment=10, num_batches=1))
        r = IndexReader(spark, p)
        outs.append(sorted(
            (x["doc_id"], x["score_x1e6"])
            for x in sp.bool_bm25_topk(r, "text", must=["apple"], k=10).collect()
        ))
    assert outs[0] == outs[1]


def test_concat_graph_key():
    from lucene_spark.analysis import get_analyzer

    a = get_analyzer("concat_graph")
    assert a.tokenize_one("The quick  Brown-fox") == ["the quick brown fox"]
    assert a.tokenize_one("...") == []


def test_nfkc_casefold_goldens():
    # ICUNormalizer2Filter analog (nfkc_cf): compatibility folds, case
    # folds, default-ignorable removal — Unicode toNFKC_Casefold
    from lucene_spark.analysis.misc import nfkc_casefold

    assert nfkc_casefold("ﬁre") == "fire"          # fi ligature
    assert nfkc_casefold("Straße") == "strasse"    # sharp s
    assert nfkc_casefold("ẞ") == "ss"              # capital sharp s
    assert nfkc_casefold("²") == "2"               # superscript two
    assert nfkc_casefold("㎒") == "mhz"             # square MHz
    assert nfkc_casefold("Ⅸ") == "ix"              # roman numeral
    assert nfkc_casefold("①") == "1"               # circled one
    assert nfkc_casefold("Ｆｕｌｌ") == "full"  # fullwidth
    assert nfkc_casefold("a‍b") == "ab"            # ZWJ removed
    assert nfkc_casefold("a­b") == "ab"            # soft hyphen
    assert nfkc_casefold("﻿x") == "x"              # BOM
    assert nfkc_casefold("İstanbul") == "i̇stanbul"  # Turkish I


def test_icu_normalized_analyzer_chain(spark):
    from lucene_spark.analysis.analyzer import get_analyzer

    a = get_analyzer("icu_normalized")
    assert a.tokenize_one("ﬁre Straße a‍b Ｆｕｌｌ") == [
        "fire", "strasse", "ab", "full",
    ]
    # plain ASCII unchanged vs the standard chain
    assert a.tokenize_one("Hello World 42") == ["hello", "world", "42"]


# --- Pack 4: stream-shape / gating filters ---------------------------------


def test_codepoint_count_filter():
    # TestCodepointCountFilter.java testFilterWithPosIncr: WhitespaceTok
    # ("short toolong evenmuchlongertext a") min=2 max=6 -> short, a? no:
    # a has 1 codepoint < 2 -> only "short" survives of those out of range
    from lucene_spark.analysis.misc import CodepointCountFilter

    f = CodepointCountFilter(2, 6)
    assert f.apply("short toolong evenmuchlongertext a".split()) == ["short"]
    # supplementary characters count as ONE codepoint (the filter's whole
    # point vs LengthFilter's UTF-16 units)
    g = CodepointCountFilter(1, 2)
    assert g.apply(["\U0001D11E", "\U0001D11Ex", "\U0001D11Exy"]) == [
        "\U0001D11E", "\U0001D11Ex",
    ]
    with pytest.raises(ValueError):
        CodepointCountFilter(-1, 5)
    with pytest.raises(ValueError):
        CodepointCountFilter(4, 3)


def test_date_recognizer_filter():
    # TestDateRecognizerFilter.java: only date-parseable tokens survive
    from lucene_spark.analysis.misc import DateRecognizerFilter

    f = DateRecognizerFilter()
    toks = "the following dates 2018-01-04 and 01/04/2018 were important".split()
    assert f.apply(toks) == ["2018-01-04", "01/04/2018"]
    # non-dates in date-ish shapes rejected (month 13)
    assert f.apply(["13/45/2020", "2020-13-01"]) == []
    # custom format list
    g = DateRecognizerFilter(("%d.%m.%Y",))
    assert g.apply(["04.01.2018", "2018-01-04"]) == ["04.01.2018"]


def test_limit_token_position_filter():
    # TestLimitTokenPositionFilter.java: max=3 over "1 2 3 4 5" -> 1 2 3
    from lucene_spark.analysis.misc import LimitTokenPositionFilter

    f = LimitTokenPositionFilter(3)
    assert f.apply(["1", "2", "3", "4", "5"]) == ["1", "2", "3"]
    assert f.apply(["1"]) == ["1"]
    with pytest.raises(ValueError):
        LimitTokenPositionFilter(0)


def test_conditional_and_protected_term_filter():
    # TestProtectedTermFilter.java: Porter runs on everything except the
    # protected set
    from lucene_spark.analysis.misc import ConditionalTokenFilter, ProtectedTermFilter
    from lucene_spark.analysis.filters import PorterStemFilter

    f = ProtectedTermFilter(["running"], PorterStemFilter())
    assert f.apply(["running", "jumping", "walks"]) == ["running", "jump", "walk"]
    # ConditionalTokenFilter with a custom predicate: stem only >4-char terms
    c = ConditionalTokenFilter(lambda t: len(t) > 4, PorterStemFilter())
    assert c.apply(["cats", "running"]) == ["cats", "run"]


def test_fix_broken_offsets_filter():
    # FixBrokenOffsetsFilter.java fixOffsets(): backwards starts clamp to
    # the previous start, ends clamp to their start
    from lucene_spark.analysis.misc import FixBrokenOffsetsFilter

    f = FixBrokenOffsetsFilter()
    toks, starts, ends = f.apply_with_offsets(
        ["a", "b", "c"], [5, 2, 9], [7, 1, 12]
    )
    assert toks == ["a", "b", "c"]
    assert starts == [5, 5, 9]
    assert ends == [7, 5, 12]


def test_limit_token_offset_filter():
    # TestLimitTokenOffsetFilter.java: max start offset 3 over
    # "0 2 4 6 8 A C E" (whitespace offsets 0,2,4,...) -> "0 2"
    from lucene_spark.analysis.misc import LimitTokenOffsetFilter
    from lucene_spark.analysis.filters import FilteredAnalyzer
    from lucene_spark.analysis.analyzer import WhitespaceAnalyzer

    a = FilteredAnalyzer(
        WhitespaceAnalyzer(), [LimitTokenOffsetFilter(3)], "lim_off"
    )
    toks, starts, ends = a.tokenize_with_offsets_one("0 2 4 6 8 A C E")
    assert toks == ["0", "2"]
    assert starts == [0, 2]
    with pytest.raises(ValueError):
        LimitTokenOffsetFilter(-1)


def test_type_token_standard_analyzer():
    # TestTypeTokenFilter.java testStopPositons: numbers filtered out /
    # whitelisted in
    from lucene_spark.analysis.misc import TypeTokenStandardAnalyzer

    text = "the 1 quick 22 fox 333 jumps"
    block = TypeTokenStandardAnalyzer({"<NUM>"})
    assert block.tokenize_one(text) == ["the", "quick", "fox", "jumps"]
    allow = TypeTokenStandardAnalyzer({"<NUM>"}, use_whitelist=True)
    assert allow.tokenize_one(text) == ["1", "22", "333"]
    # offsets ride along
    toks, starts, ends = allow.tokenize_with_offsets_one(text)
    assert toks == ["1", "22", "333"]
    assert starts == [4, 12, 19]


def test_type_as_synonym_standard_analyzer():
    # TestTypeAsSynonymFilter.java: type emitted at the same position,
    # with prefix, ignore set respected
    from lucene_spark.analysis.misc import TypeAsSynonymStandardAnalyzer

    a = TypeAsSynonymStandardAnalyzer(prefix="_type_")
    assert a.tokenize_one("foo 42") == [
        "foo", "_type_<ALPHANUM>", "42", "_type_<NUM>",
    ]
    b = TypeAsSynonymStandardAnalyzer(prefix="_type_", ignore={"<ALPHANUM>"})
    assert b.tokenize_one("foo 42") == ["foo", "42", "_type_<NUM>"]
    # synonym inherits the source token's span
    toks, starts, ends = a.tokenize_with_offsets_one("foo 42")
    assert toks == ["foo", "_type_<ALPHANUM>", "42", "_type_<NUM>"]
    assert starts == [0, 0, 4, 4]
    assert ends == [3, 3, 6, 6]
