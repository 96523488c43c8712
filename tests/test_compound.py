"""DictionaryCompoundWordFilter goldens — transcribed from the
reference's TestCompoundWordTokenFilter.java (testDumbCompoundWordsSE
and testDumbCompoundWordsSELongestMatch)."""

from lucene_spark.analysis.compound import DictionaryCompoundWordFilter

SE_DICT = [
    "Bil", "Dörr", "Motor", "Tak", "Borr", "Slag", "Hammar", "Pelar",
    "Glas", "Ögon", "Fodral", "Bas", "Fiol", "Makare", "Gesäll", "Sko",
    "Vind", "Rute", "Torkare", "Blad",
]


def test_dumb_compound_words_se():
    f = DictionaryCompoundWordFilter(SE_DICT)
    toks = ("Bildörr Bilmotor Biltak Slagborr Hammarborr Pelarborr "
            "Glasögonfodral Basfiolsfodral Basfiolsfodralmakaregesäll "
            "Skomakare Vindrutetorkare Vindrutetorkarblad abba").split()
    assert f.apply(toks) == [
        "Bildörr", "Bil", "dörr",
        "Bilmotor", "Bil", "motor",
        "Biltak", "Bil", "tak",
        "Slagborr", "Slag", "borr",
        "Hammarborr", "Hammar", "borr",
        "Pelarborr", "Pelar", "borr",
        "Glasögonfodral", "Glas", "ögon", "fodral",
        "Basfiolsfodral", "Bas", "fiol", "fodral",
        "Basfiolsfodralmakaregesäll", "Bas", "fiol", "fodral",
        "makare", "gesäll",
        "Skomakare", "Sko", "makare",
        "Vindrutetorkare", "Vind", "rute", "torkare",
        "Vindrutetorkarblad", "Vind", "rute", "blad",
        "abba",
    ]


def test_dumb_compound_words_se_longest_match():
    dict2 = SE_DICT[:12] + ["Fiols", "Fiolsfodral"] + SE_DICT[13:]
    f = DictionaryCompoundWordFilter(dict2, no_subwords=True)
    assert f.apply(["Basfiolsfodralmakaregesäll"]) == [
        "Basfiolsfodralmakaregesäll", "Bas", "fiolsfodral", "makare",
        "gesäll",
    ]


def test_min_word_size_guard():
    # words shorter than min_word_size are not decomposed at all
    f = DictionaryCompoundWordFilter(["ab", "cd"], min_word_size=5)
    assert f.apply(["abcd"]) == ["abcd"]
    f2 = DictionaryCompoundWordFilter(["ab", "cd"], min_word_size=4)
    assert f2.apply(["abcd"]) == ["abcd", "ab", "cd"]


def test_subword_size_bounds():
    # subwords outside [min_subword_size, max_subword_size] don't emit
    f = DictionaryCompoundWordFilter(
        ["a", "basket", "ball"], min_word_size=5,
        min_subword_size=4, max_subword_size=5,
    )
    # 'basket' (6) exceeds max 5, 'a' (1) under min 4, 'ball' (4) fits
    assert f.apply(["basketball"]) == ["basketball", "ball"]


def test_only_longest_without_skip():
    # only_longest_match alone still scans every start position:
    # 'fodral' at its own offset IS emitted (contrast no_subwords)
    dict2 = SE_DICT[:12] + ["Fiols", "Fiolsfodral"] + SE_DICT[13:]
    f = DictionaryCompoundWordFilter(dict2, only_longest_match=True)
    out = f.apply(["Basfiolsfodralmakaregesäll"])
    assert "fiolsfodral" in out and "fodral" in out and "fiols" not in out
