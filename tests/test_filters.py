"""Analysis-zoo filter tests: Porter golden pairs (from the published
algorithm's worked examples), minimal-stemmer rules, ASCII folding,
synonyms, shingles, edge n-grams, and chain composition."""

import pytest

from lucene_spark.analysis import (
    ASCIIFoldingFilter,
    EdgeNGramFilter,
    EnglishMinimalStemFilter,
    FilteredAnalyzer,
    PorterStemFilter,
    ShingleFilter,
    SimpleAnalyzer,
    StopFilter,
    SynonymCanonicalFilter,
    ascii_fold,
    english_minimal_stem,
    get_analyzer,
    porter_stem,
)

# worked examples from the algorithm definition (Porter 1980, steps
# 1-5) plus departure cases — the PorterStemmer.java contract
PORTER_GOLDEN = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("caress", "caress"), ("cats", "cat"),
    ("feed", "feed"), ("agreed", "agre"), ("plastered", "plaster"),
    ("bled", "bled"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("falling", "fall"),
    ("hissing", "hiss"), ("fizzed", "fizz"), ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"),
    ("relational", "relat"), ("conditional", "condit"),
    ("rational", "ration"), ("digitizer", "digit"),
    ("operator", "oper"), ("feudalism", "feudal"),
    ("decisiveness", "decis"), ("hopefulness", "hope"),
    ("callousness", "callous"), ("formality", "formal"),
    ("sensitivity", "sensit"),
    ("triplicate", "triplic"), ("formative", "form"),
    ("formalize", "formal"),
    # full-pipeline outputs: step 3 gives electric, step 4 strips -ic
    # at m>1 (the paper lists electrical->electric as a step-3-only
    # illustration)
    ("electricity", "electr"), ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"), ("allowance", "allow"),
    ("inference", "infer"), ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"), ("adjustable", "adjust"),
    ("defensible", "defens"), ("irritant", "irrit"),
    ("replacement", "replac"), ("adjustment", "adjust"),
    ("dependent", "depend"), ("adoption", "adopt"),
    ("communism", "commun"), ("activate", "activ"),
    ("effective", "effect"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controlled", "control"), ("rolled", "roll"),
    # departures (official C version): bli->ble, logi->log
    ("conformably", "conform"), ("analogical", "analog"),
]


@pytest.mark.parametrize("word,stem", PORTER_GOLDEN)
def test_porter_golden(word, stem):
    assert porter_stem(word) == stem


def test_porter_short_words_untouched():
    for w in ["a", "is", "be", "at"]:
        assert porter_stem(w) == w


def test_minimal_stem_rules():
    assert english_minimal_stem("tables") == "table"
    assert english_minimal_stem("queries") == "query"
    assert english_minimal_stem("bus") == "bus"
    assert english_minimal_stem("pass") == "pass"
    assert english_minimal_stem("goes") == "goes"  # -oes kept
    assert english_minimal_stem("sees") == "sees"  # -ees kept
    assert english_minimal_stem("dies") == "dy"  # -ies rule fires (d not a/e)
    assert english_minimal_stem("windows") == "window"
    assert english_minimal_stem("is") == "is"


def test_minimal_stem_matches_sql():
    """The python filter and its SQL rendering must agree token-for-
    token (this equality is what makes the stemmed gate oracle-able)."""
    import duckdb

    from lucene_spark.analysis.filters import english_minimal_stem_sql

    words = [
        "tables", "queries", "cats", "bus", "pass", "is", "dies",
        "goes", "sees", "pies", "windows", "focus", "scans", "merges",
        "sorts", "joins", "filters", "values", "hashes", "lines",
        "keys", "streams", "batches", "was", "its", "this", "ss",
        "aes", "ies", "us", "s", "queried", "query",
    ]
    con = duckdb.connect()
    vals = ", ".join(f"('{w}')" for w in words)
    got = con.execute(
        f"SELECT {english_minimal_stem_sql('w')} FROM (VALUES {vals}) t(w)"
    ).fetchall()
    assert [g[0] for g in got] == [english_minimal_stem(w) for w in words]


def test_ascii_folding():
    assert ascii_fold("café") == "cafe"
    assert ascii_fold("naïve") == "naive"
    assert ascii_fold("Ångström") == "Angstrom"
    assert ascii_fold("señor") == "senor"
    assert ascii_fold("Mötörhead") == "Motorhead"
    assert ascii_fold("œuvre") == "oeuvre"
    assert ascii_fold("straße") == "strasse"
    assert ascii_fold("Łódź") == "Lodz"
    assert ascii_fold("smørrebrød") == "smorrebrod"
    assert ascii_fold("plain ascii 123") == "plain ascii 123"
    # no ASCII equivalent -> unchanged (reference default)
    assert ascii_fold("北京") == "北京"


def test_synonym_canonical_and_stop():
    syn = SynonymCanonicalFilter([["fast", "quick", "rapid"], ["big", "large"]])
    assert syn.apply(["a", "quick", "rapid", "large", "dog"]) == [
        "a", "fast", "fast", "big", "dog"
    ]
    stop = StopFilter(frozenset({"a", "the"}))
    assert stop.apply(["a", "dog", "the", "cat"]) == ["dog", "cat"]


def test_shingles_and_edge_ngrams():
    sh = ShingleFilter(2, 3)
    assert sh.apply(["a", "b", "c"]) == [
        "a", "b", "c", "a b", "b c", "a b c"
    ]
    eg = EdgeNGramFilter(2, 4)
    assert eg.apply(["spark"]) == ["sp", "spa", "spar", "spark"]
    assert eg.apply(["go"]) == ["go"]


def test_registry_composites():
    en = get_analyzer("english")
    assert en.tokenize_one("The Troubled controlled Plastering") == [
        "the", "troubl", "control", "plaster"
    ]
    mi = get_analyzer("simple_en_min")
    assert mi.tokenize_one("Tables and queries") == ["table", "and", "query"]
    fo = get_analyzer("folding")
    assert fo.tokenize_one("Café naïve") == ["cafe", "naive"]


def test_filtered_analyzer_chain_order():
    an = FilteredAnalyzer(
        SimpleAnalyzer(),
        [SynonymCanonicalFilter([["fast", "quick"]]), PorterStemFilter()],
        "chain",
    )
    # synonym first (quick -> fast), then stem (fast -> fast)
    assert an.tokenize_one("Quick tables") == ["fast", "tabl"]


def test_edge_ngram_preserve_original_short_tokens():
    """ADVICE r02: preserveOriginal keeps tokens shorter than min_gram
    (which emit no grams) as well as those longer than max_gram."""
    from lucene_spark.analysis.filters import EdgeNGramFilter

    f = EdgeNGramFilter(min_gram=3, max_gram=4, preserve_original=True)
    assert f.apply(["ab"]) == ["ab"]                    # < min_gram: kept
    assert f.apply(["abc"]) == ["abc"]                  # == min_gram gram
    assert f.apply(["abcdef"]) == ["abc", "abcd", "abcdef"]  # > max_gram
    g = EdgeNGramFilter(min_gram=3, max_gram=4, preserve_original=False)
    assert g.apply(["ab"]) == []                        # dropped without PO


def test_length_filter_bounds():
    from lucene_spark.analysis.filters import LengthFilter

    f = LengthFilter(3, 5)
    assert f.apply(["ab", "abc", "abcde", "abcdef"]) == ["abc", "abcde"]


def test_reverse_string_filter_and_leading_wildcard_trick():
    from lucene_spark.analysis import get_analyzer

    an = get_analyzer("simple_reversed")
    assert an.tokenize_one("Tables rest") == ["selbat", "tser"]
    # leading-wildcard *est on the original field == prefix tse on the twin
    assert "tser".startswith("tse")


def test_path_hierarchy_tokenizer_goldens():
    """path/PathHierarchyTokenizer.java class javadoc:
    /something/something/else -> the three growing prefixes."""
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.analysis.filters import PathHierarchyAnalyzer

    an = get_analyzer("path_hierarchy")
    assert an.tokenize_one("/something/something/else") == [
        "/something",
        "/something/something",
        "/something/something/else",
    ]
    assert an.tokenize_one("a/b") == ["a", "a/b"]
    assert an.tokenize_one("") == []
    # skip drops leading components (PathHierarchyTokenizer(skip))
    assert PathHierarchyAnalyzer(skip=1).tokenize_one("/a/b/c") == [
        "b", "b/c"
    ]
    # reverse = suffix form (domain names)
    assert PathHierarchyAnalyzer(
        delimiter=".", reverse=True
    ).tokenize_one("www.site.com") == ["com", "com.site", "com.site.www"]


# ---- German light/minimal stemmers (de/GermanLightStemmer.java,
# GermanMinimalStemmer.java — Savoy's UniNE algorithms) ----

_DE_TESTDATA = (
    "/root/reference/lucene/analysis/common/src/test/org/apache/lucene/"
    "analysis/de/{name}testdata.zip"
)


def _german_cases():
    from lucene_spark.analysis.filters import (
        GermanLightStemFilter,
        GermanMinimalStemFilter,
    )

    return [
        ("delight", GermanLightStemFilter()),
        ("deminimal", GermanMinimalStemFilter()),
    ]


def test_german_stemmers_handpicked():
    light, minimal = (f for _, f in _german_cases())
    assert light.apply(["häusern", "bücher", "schönste"]) == [
        "haus", "buch", "schon",
    ]
    assert minimal.apply(["katzen", "häusern", "bild"]) == [
        "katz", "hauser", "bild",
    ]


def test_german_stemmers_full_reference_goldens():
    import io
    import os
    import zipfile

    import pytest

    for name, filt in _german_cases():
        path = _DE_TESTDATA.format(name=name)
        if not os.path.exists(path):
            pytest.skip("reference golden data not available")
        with zipfile.ZipFile(path) as z:
            data = z.read(f"{name}.txt").decode("utf-8")
        words, want = [], []
        for line in io.StringIO(data):
            line = line.rstrip("\n")
            if line and "\t" in line:
                w, s = line.split("\t")
                words.append(w)
                want.append(s)
        got = filt.apply(words)
        mismatches = [
            (w, g, s) for w, g, s in zip(words, got, want) if g != s
        ]
        assert not mismatches, (name, len(mismatches), mismatches[:5])


def test_swedish_french_stemmers_full_reference_goldens():
    import io
    import os
    import zipfile

    import pytest

    from lucene_spark.analysis.filters import (
        FrenchMinimalStemFilter,
        SwedishLightStemFilter,
    )

    base = (
        "/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis"
    )
    cases = [
        (f"{base}/sv/svlighttestdata.zip", "svlight", SwedishLightStemFilter()),
        (f"{base}/fr/frminimaltestdata.zip", "frminimal", FrenchMinimalStemFilter()),
    ]
    for zpath, name, filt in cases:
        if not os.path.exists(zpath):
            pytest.skip("reference golden data not available")
        with zipfile.ZipFile(zpath) as z:
            data = z.read(f"{name}.txt").decode("utf-8")
        words, want = [], []
        for line in io.StringIO(data):
            line = line.rstrip("\n")
            if line and "\t" in line:
                w, s = line.split("\t")
                words.append(w)
                want.append(s)
        got = filt.apply(words)
        mismatches = [
            (w, g, s) for w, g, s in zip(words, got, want) if g != s
        ]
        assert not mismatches, (name, len(mismatches), mismatches[:5])
    # hand-picked sanity (independent of the reference tree)
    assert SwedishLightStemFilter().apply(["jackorna", "klubbarne"]) == [
        "jack", "klubb",
    ]
    assert FrenchMinimalStemFilter().apply(["chevaux", "passionnés"]) == [
        "cheval", "passion",
    ]


def test_italian_spanish_stemmers_full_reference_goldens():
    import io
    import os
    import zipfile

    import pytest

    from lucene_spark.analysis.filters import (
        ItalianLightStemFilter,
        SpanishLightStemFilter,
    )

    base = (
        "/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis"
    )
    cases = [
        (f"{base}/it/itlighttestdata.zip", "itlight", ItalianLightStemFilter()),
        (f"{base}/es/eslighttestdata.zip", "eslight", SpanishLightStemFilter()),
    ]
    for zpath, name, filt in cases:
        if not os.path.exists(zpath):
            pytest.skip("reference golden data not available")
        with zipfile.ZipFile(zpath) as z:
            data = z.read(f"{name}.txt").decode("utf-8")
        words, want = [], []
        for line in io.StringIO(data):
            line = line.rstrip("\n")
            if line and "\t" in line:
                w, s = line.split("\t")
                words.append(w)
                want.append(s)
        got = filt.apply(words)
        mismatches = [
            (w, g, s) for w, g, s in zip(words, got, want) if g != s
        ]
        assert not mismatches, (name, len(mismatches), mismatches[:5])
    assert ItalianLightStemFilter().apply(["ragazzi", "tecnologie"]) == [
        "ragazz", "tecnolog",
    ]
    assert SpanishLightStemFilter().apply(["trabajos", "veces"]) == [
        "trabaj", "vez",
    ]


def test_hungarian_russian_stemmers_full_reference_goldens():
    import io
    import os
    import zipfile

    import pytest

    from lucene_spark.analysis.filters import (
        HungarianLightStemFilter,
        RussianLightStemFilter,
    )

    base = (
        "/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis"
    )
    cases = [
        (f"{base}/hu/hulighttestdata.zip", "hulight", HungarianLightStemFilter()),
        (f"{base}/ru/rulighttestdata.zip", "rulight", RussianLightStemFilter()),
    ]
    for zpath, name, filt in cases:
        if not os.path.exists(zpath):
            pytest.skip("reference golden data not available")
        with zipfile.ZipFile(zpath) as z:
            data = z.read(f"{name}.txt").decode("utf-8")
        words, want = [], []
        for line in io.StringIO(data):
            line = line.rstrip("\n")
            if line and "\t" in line:
                w, s = line.split("\t")
                words.append(w)
                want.append(s)
        got = filt.apply(words)
        mismatches = [
            (w, g, s) for w, g, s in zip(words, got, want) if g != s
        ]
        assert not mismatches, (name, len(mismatches), mismatches[:5])


def test_finnish_stemmer_full_reference_goldens():
    import io
    import os
    import zipfile

    import pytest

    from lucene_spark.analysis.filters import FinnishLightStemFilter

    zpath = (
        "/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis/fi/filighttestdata.zip"
    )
    if not os.path.exists(zpath):
        pytest.skip("reference golden data not available")
    with zipfile.ZipFile(zpath) as z:
        data = z.read("filight.txt").decode("utf-8")
    words, want = [], []
    for line in io.StringIO(data):
        line = line.rstrip("\n")
        if line and "\t" in line:
            w, s = line.split("\t")
            words.append(w)
            want.append(s)
    got = FinnishLightStemFilter().apply(words)
    mismatches = [(w, g, s) for w, g, s in zip(words, got, want) if g != s]
    assert not mismatches, (len(mismatches), mismatches[:5])


def test_portuguese_stemmer_full_reference_goldens():
    import io
    import os
    import zipfile

    import pytest

    from lucene_spark.analysis.filters import PortugueseLightStemFilter

    zpath = (
        "/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis/pt/ptlighttestdata.zip"
    )
    if not os.path.exists(zpath):
        pytest.skip("reference golden data not available")
    with zipfile.ZipFile(zpath) as z:
        data = z.read("ptlight.txt").decode("utf-8")
    words, want = [], []
    for line in io.StringIO(data):
        line = line.rstrip("\n")
        if line and "\t" in line:
            w, s = line.split("\t")
            words.append(w)
            want.append(s)
    got = PortugueseLightStemFilter().apply(words)
    mismatches = [(w, g, s) for w, g, s in zip(words, got, want) if g != s]
    assert not mismatches, (len(mismatches), mismatches[:5])
    # plural rewrite restores the singular (-ões -> -ão) before the
    # final-vowel strip and accent fold
    assert PortugueseLightStemFilter().apply(
        ["corações", "professores", "badalação"]
    ) == ["coraca", "professor", "badalaca"]


def test_czech_stemmer_all_reference_cases():
    import os
    import re

    import pytest

    from lucene_spark.analysis.filters import CzechStemFilter

    src_path = (
        "/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis/cz/TestCzechStemmer.java"
    )
    st = CzechStemFilter()
    # independent sanity cases (pán/muž paradigms from the cited paper)
    assert st.apply(["pánové", "mužích", "osmičkách"]) == [
        "pán", "muh", "osmičk",
    ]
    if not os.path.exists(src_path):
        pytest.skip("reference test source not available")
    # replay every single-token case from the reference's own test;
    # the reference analyzer lowercases before stemming, so feed
    # lowercased input to the bare filter
    src = open(src_path, encoding="utf-8").read()
    cases = re.findall(
        r'assertAnalyzesTo\(cz, "([^"]+)", new String\[\] \{"([^"]+)"\}\)',
        src,
    )
    assert len(cases) > 100
    bad = [
        (w, st.apply([w.lower()])[0], want)
        for w, want in cases
        if st.apply([w.lower()])[0] != want
    ]
    assert not bad, bad[:5]


def test_bulgarian_latvian_stemmers_all_reference_cases():
    import os
    import re

    import pytest

    from lucene_spark.analysis.filters import (
        BulgarianStemFilter,
        LatvianStemFilter,
    )

    base = (
        "/root/reference/lucene/analysis/common/src/test/org/apache/"
        "lucene/analysis"
    )
    # independent sanity cases from the cited papers
    assert BulgarianStemFilter().apply(["градовете", "мъже"]) == ["град", "мъж"]
    assert LatvianStemFilter().apply(["cilvēkiem", "latviešu"]) == [
        "cilvēk", "latvieš",
    ]
    cases = []
    bg_path = f"{base}/bg/TestBulgarianStemmer.java"
    lv_path = f"{base}/lv/TestLatvianStemmer.java"
    if not (os.path.exists(bg_path) and os.path.exists(lv_path)):
        pytest.skip("reference test sources not available")
    bg_src = open(bg_path, encoding="utf-8").read()
    cases = [
        ("bg", BulgarianStemFilter(), re.findall(
            r'assertAnalyzesTo\(a, "([^"]+)", new String\[\] \{"([^"]+)"\}',
            bg_src,
        )),
        ("lv", LatvianStemFilter(), re.findall(
            r'checkOneTerm\(\w+, "([^"]+)", "([^"]+)"\)',
            open(lv_path, encoding="utf-8").read(),
        )),
    ]
    for lang, filt, pairs in cases:
        assert len(pairs) > 50, lang
        bad = [
            (w, filt.apply([w.strip().lower()])[0], want)
            for w, want in pairs
            if filt.apply([w.strip().lower()])[0] != want
        ]
        assert not bad, (lang, bad[:5])
