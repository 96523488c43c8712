"""Scandinavian/Norwegian/Serbian normalization filters, UpperCase,
and the Solr/WordNet synonym rule-file parsers."""

import pytest

from lucene_spark.analysis.graph import (
    GraphAnalyzer,
    parse_solr_synonyms,
    parse_wordnet_synonyms,
)
from lucene_spark.analysis.misc import (
    NorwegianNormalizationFilter,
    ScandinavianNormalizationFilter,
    SerbianNormalizationFilter,
    SerbianNormalizationRegularFilter,
    UpperCaseFilter,
    scandinavian_normalize,
    serbian_normalize,
    serbian_normalize_regular,
)


# ---------------------- scandinavian normalization ---------------------


def test_scandinavian_normalize_goldens():
    # TestScandinavianNormalizationFilter-style pairs
    assert scandinavian_normalize("aeaaaoaeoeoooe") != "aeaaaoaeoeoooe"
    assert scandinavian_normalize("blaabaer") == "blåbær"
    assert scandinavian_normalize("raksmorgas") == "raksmorgas"
    assert scandinavian_normalize("bruno") == "bruno"
    assert scandinavian_normalize("räksmörgås") == "ræksmørgås"
    assert scandinavian_normalize("blåbærsyltetøj") == "blåbærsyltetøj"
    # case forms
    assert scandinavian_normalize("AAberg") == "Åberg"
    assert scandinavian_normalize("Aaberg") == "Åberg"


def test_norwegian_excludes_ao_oo():
    # NorwegianNormalizationFilter.java:42 — EnumSet.of(AE, OE, AA):
    # 'ao' and 'oo' digraphs are NOT contracted
    f = NorwegianNormalizationFilter()
    assert f.apply(["hao"]) == ["hao"]
    assert f.apply(["boo"]) == ["boo"]
    assert f.apply(["blaabaer"]) == ["blåbær"]
    full = ScandinavianNormalizationFilter()
    assert full.apply(["hao"]) == ["hå"]
    assert full.apply(["boo"]) == ["bø"]


# ------------------------- serbian --------------------------------------


def test_serbian_bald():
    assert serbian_normalize("београд") == "beograd"
    assert serbian_normalize("ђак") == "djak"
    assert serbian_normalize("љубав") == "ljubav"
    assert serbian_normalize("њега") == "njega"
    assert serbian_normalize("џеп") == "dzep"
    assert serbian_normalize("жут") == "zut"
    # latin diacritics fold too
    assert serbian_normalize("čokolada") == "cokolada"
    assert serbian_normalize("šuma") == "suma"
    assert SerbianNormalizationFilter().apply(["ђак"]) == ["djak"]


def test_serbian_regular_keeps_diacritics():
    assert serbian_normalize_regular("жут") == "žut"
    assert serbian_normalize_regular("ђак") == "đak"
    assert serbian_normalize_regular("џеп") == "džep"
    assert serbian_normalize_regular("ш") == "š"
    # the regular table expands the digraph letters too
    # (SerbianNormalizationRegularFilter.java:84-106 resizes the
    # buffer and inserts the 'j')
    assert serbian_normalize_regular("љубав") == "ljubav"
    assert serbian_normalize_regular("њега") == "njega"
    assert SerbianNormalizationRegularFilter().apply(["чај"]) == ["čaj"]


def test_uppercase_filter():
    assert UpperCaseFilter().apply(["MixedCase", "øre"]) == [
        "MIXEDCASE", "ØRE"
    ]


# ------------------------- synonym parsers ------------------------------


def test_solr_explicit_rule():
    smap = parse_solr_synonyms("i-pod, ipod => ipod\n")
    m = smap.match_at(["i-pod"], 0)
    assert m is not None
    n, outs, keep = m
    assert outs == [("ipod",)] and keep is False


def test_solr_equivalence_expand():
    smap = parse_solr_synonyms("tv, television, televisions\n")
    n, outs, keep = smap.match_at(["tv"], 0)
    assert keep is True
    assert ("television",) in outs and ("televisions",) in outs


def test_solr_equivalence_contract():
    smap = parse_solr_synonyms("tv, television\n", expand=False)
    assert smap.match_at(["television"], 0)[1] == [("tv",)]
    # first term maps to nothing (it IS the canonical form)
    assert smap.match_at(["tv"], 0) is None


def test_solr_multiword_and_comments():
    smap = parse_solr_synonyms(
        "# comment line\n\nny, new york\nsea biscuit => seabiscuit\n"
    )
    n, outs, keep = smap.match_at(["new", "york"], 0)
    assert n == 2 and ("ny",) in outs
    n2, outs2, _ = smap.match_at(["sea", "biscuit", "x"], 0)
    assert n2 == 2 and outs2 == [("seabiscuit",)]


def test_solr_escaped_comma():
    smap = parse_solr_synonyms("a\\,b => c\n")
    assert smap.match_at(["a,b"], 0)[1] == [("c",)]


def test_solr_invalid_raises():
    with pytest.raises(ValueError, match="invalid synonym rule"):
        parse_solr_synonyms("loneterm\n")


def test_wordnet_parser():
    text = (
        "s(100000001,1,'woods',n,1,0).\n"
        "s(100000001,2,'wood',n,1,0).\n"
        "s(100000001,3,'forest',n,1,0).\n"
        "s(100000002,1,'alone',n,1,0).\n"
    )
    smap = parse_wordnet_synonyms(text)
    n, outs, keep = smap.match_at(["wood"], 0)
    assert ("woods",) in outs and ("forest",) in outs and keep
    # singleton synset contributes nothing
    assert smap.match_at(["alone"], 0) is None


def test_wordnet_quote_escape():
    smap = parse_wordnet_synonyms(
        "s(1,1,'o''clock',n,1,0).\ns(1,2,'oclock',n,1,0).\n"
    )
    assert smap.match_at(["o'clock"], 0)[1] == [("oclock",)]


def test_solr_rules_drive_the_graph_analyzer():
    """Parsed rules run through the full SynonymGraphFilter path."""
    from lucene_spark.analysis.analyzer import WhitespaceAnalyzer
    from lucene_spark.analysis.graph import SynonymGraphFilter

    smap = parse_solr_synonyms("ny => new york\n")
    ga = GraphAnalyzer(WhitespaceAnalyzer(), SynonymGraphFilter(smap))
    toks = ga.tokenize_one("visit ny today")
    assert "new" in toks and "york" in toks


def test_fixed_shingle_filter():
    # shingle/FixedShingleFilter.java: one exact size, no unigrams,
    # size guard 2..4
    from lucene_spark.analysis.filters import FixedShingleFilter

    assert FixedShingleFilter(2).apply(["a", "b", "c"]) == ["a b", "b c"]
    assert FixedShingleFilter(3).apply(["a", "b", "c", "d"]) == [
        "a b c", "b c d"
    ]
    with pytest.raises(ValueError, match="between 2 and 4"):
        FixedShingleFilter(5)
    with pytest.raises(ValueError, match="between 2 and 4"):
        FixedShingleFilter(1)
