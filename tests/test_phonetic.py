"""Phonetic encoder pack (analysis/phonetic.py): reference
TestPhoneticFilter vectors + each algorithm's published test vectors."""

import pytest

from lucene_spark.analysis.extras import PhoneticFilter
from lucene_spark.analysis.phonetic import (
    caverphone2,
    cologne_phonetic,
    metaphone,
    nysiis,
)


@pytest.mark.parametrize("word,want", [
    # reference TestPhoneticFilter.testAlgorithms
    ("aaa", "A"), ("bbb", "B"), ("ccc", "KKK"), ("easgasg", "ESKS"),
    # commons-codec Metaphone published vectors
    ("testing", "TSTN"), ("The", "0"), ("quick", "KK"), ("brown", "BRN"),
    ("fox", "FKS"), ("jumped", "JMPT"), ("over", "OFR"), ("lazy", "LS"),
    ("dogs", "TKS"), ("howl", "HL"), ("Knight", "NT"),
    ("metaphone", "MTFN"),
    # initial-pair exceptions
    ("Wright", "RT"), ("Xavier", "SFR"), ("Whale", "WL"),
    ("Gnome", "NM"), ("Pneumatic", "NMTK"),
])
def test_metaphone(word, want):
    assert metaphone(word) == want


@pytest.mark.parametrize("word,want", [
    # reference TestPhoneticFilter vectors
    ("Darda", "TTA1111111"), ("Karleen", "KLN1111111"),
    ("Datha", "TTA1111111"), ("Carlene", "KLN1111111"),
    # Caverphone-revisited paper worked examples
    ("Stevenson", "STFNSN1111"), ("Peter", "PTA1111111"),
    ("", "1111111111"),
])
def test_caverphone2(word, want):
    assert caverphone2(word) == want


@pytest.mark.parametrize("word,want", [
    # reference TestPhoneticFilter vectors
    ("aaa", "A"), ("bbb", "B"), ("ccc", "C"), ("easgasg", "EASGAS"),
    # published NYSIIS behavior
    ("MacDonald", "MCDANA"), ("Knight", "NAGT"),
])
def test_nysiis(word, want):
    assert nysiis(word) == want


def test_nysiis_strict_truncates():
    long = nysiis("Vasquez-Rodriguez", strict=False)
    assert nysiis("Vasquez-Rodriguez") == long[:6]


@pytest.mark.parametrize("word,want", [
    # Postel's published examples (commons-codec ColognePhonetic)
    ("Mueller-Luedenscheidt", "65752682"),
    ("Müller-Lüdenscheidt", "65752682"),
    ("Breschnew", "17863"),
    ("Wikipedia", "3412"),
])
def test_cologne(word, want):
    assert cologne_phonetic(word) == want


def test_phonetic_filter_encoders_registered():
    # PhoneticFilterFactory `encoder` argument role
    f = PhoneticFilter(encoder="metaphone", inject=False)
    assert f.apply(["aaa", "bbb", "ccc", "easgasg"]) == [
        "A", "B", "KKK", "ESKS"
    ]
    inj = PhoneticFilter(encoder="caverphone2", inject=True)
    assert inj.apply(["Darda"]) == ["Darda", "TTA1111111"]
    for name in ("nysiis", "cologne", "soundex", "refined_soundex"):
        assert name in PhoneticFilter.ENCODERS
