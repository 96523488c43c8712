"""CJK bigram recall evidence — the East-Asian morphological descope.

The reference ships dictionary-driven morphological tokenizers for
Japanese (kuromoji, Viterbi over the bundled MeCab lattice), Korean
(nori) and Chinese (smartcn, HMM). All three are DICTIONARY-DATA-bound:
their segmentation quality IS the bundled dictionary, and a rebuild
without transcribing that data cannot reproduce their token streams.
The reference itself ships the dictionary-free fallback we implement:
CJKAnalyzer (analysis/common cjk/CJKAnalyzer.java) — width fold +
overlapping bigrams.

What the bigram index GUARANTEES (the classical CJK-IR result this
file asserts on the reference's own test sentences): every morpheme a
dictionary tokenizer emits is a contiguous substring of the text, so
all of its bigrams (and its unigrams, with outputUnigrams) appear in
the bigram index of that text — a conjunctive bigram query for the
morpheme has RECALL 1.0. The trade is precision (bigrams can match
across morpheme boundaries), which is exactly the documented
CJKAnalyzer-vs-kuromoji trade in the reference.

Expected-token fixtures are harvested from the reference tests:
- kuromoji TestJapaneseTokenizer.java:183 (数学部長谷川 normal mode)
  and testDecomposition2 (:190)
- nori TestKoreanTokenizer.java:129 (testSpaces)
- smartcn TestSmartChineseAnalyzer.java:144
"""

from lucene_spark.analysis.analyzer import StandardAnalyzer
from lucene_spark.analysis.extras import (
    CJKBigramFilter,
    CJKWidthFilter,
    _cjk_script,
)
from lucene_spark.analysis.filters import FilteredAnalyzer

_ALL = frozenset(("han", "hiragana", "katakana", "hangul"))

# (source sentence, reference dictionary-tokenizer output)
CASES = [
    # TestJapaneseTokenizer.java:183 — segmentation is genuinely
    # ambiguous (数学部長 | 谷川 vs 数学 | 部長 | 谷川): the lattice
    # picks one reading, bigrams recall ALL of them
    ("数学部長谷川", ["数学", "部長", "谷川"]),
    # TestJapaneseTokenizer.java testDecomposition2
    (
        "麻薬の密売は根こそぎ絶やさなければならない",
        ["麻薬", "の", "密売", "は", "根こそぎ", "絶やさ",
         "なけれ", "ば", "なら", "ない"],
    ),
    # TestKoreanTokenizer.java:129 testSpaces
    ("화학 이외의 것", ["화학", "이외", "의", "것"]),
    # TestSmartChineseAnalyzer.java:144 (CJK morphemes; the latin
    # token runs through smartcn's own stemmer and is out of scope)
    ("我购买 Tests 了道具和服装", ["我", "购买", "了", "道具", "和", "服装"]),
]


def _index_tokens(text: str) -> set[str]:
    an = FilteredAnalyzer(
        StandardAnalyzer(),
        [CJKWidthFilter(), CJKBigramFilter(output_unigrams=True)],
        "cjk_uni",
    )
    return set(an.tokenize_one(text))


def _query_grams(token: str) -> list[str]:
    if len(token) == 1:
        return [token]
    return [token[i : i + 2] for i in range(len(token) - 1)]


def test_bigram_recall_on_reference_tokenizer_outputs():
    for text, expected in CASES:
        indexed = _index_tokens(text)
        for tok in expected:
            assert all(_cjk_script(c, _ALL) for c in tok), (
                "fixture should hold CJK morphemes only", tok
            )
            for g in _query_grams(tok):
                assert g in indexed, (text, tok, g)


def test_bigram_recall_is_conjunctive_query_recall():
    """The guarantee shape the index relies on: a MUST-conjunction of
    the morpheme's bigram terms admits the source doc (recall), for
    every morpheme of every case."""
    for text, expected in CASES:
        indexed = _index_tokens(text)
        for tok in expected:
            assert set(_query_grams(tok)) <= indexed


def test_ambiguous_reading_both_recalled():
    """TestJapaneseTokenizer.java:183-186: normal mode reads
    数学部長谷川 as 数学|部長|谷川, search mode adds 部 and 長谷川.
    The bigram index recalls BOTH readings' morphemes — the
    dictionary's disambiguation choice never loses a match."""
    indexed = _index_tokens("数学部長谷川")
    for tok in ["数学", "部長", "谷川", "部", "長谷川"]:
        assert set(_query_grams(tok)) <= indexed


# ---------------- ICUTransformFilter algorithmic subset ----------------


def test_kana_transforms_roundtrip():
    from lucene_spark.analysis.extras import ScriptTransformFilter

    k2h = ScriptTransformFilter("Katakana-Hiragana")
    h2k = ScriptTransformFilter("Hiragana-Katakana")
    # ICU Katakana-Hiragana: コンピューター -> こんぴゅーたー (prolonged
    # mark preserved), ヽ/ヾ -> ゝ/ゞ
    assert k2h.apply(["コンピューター"]) == ["こんぴゅーたー"]
    assert k2h.apply(["ヽヾ"]) == ["ゝゞ"]
    assert h2k.apply(["こんぴゅーたー"]) == ["コンピューター"]
    # roundtrip over the whole congruent block
    kana = "".join(chr(c) for c in range(0x30A1, 0x30F7))
    assert h2k.apply(k2h.apply([kana])) == [kana]


def test_width_transforms():
    from lucene_spark.analysis.extras import ScriptTransformFilter

    f2h = ScriptTransformFilter("Fullwidth-Halfwidth")
    h2f = ScriptTransformFilter("Halfwidth-Fullwidth")
    assert f2h.apply(["Ｔｅｓｔ１２３"]) == ["Test123"]
    # fullwidth katakana -> halfwidth block; voiced kana split into
    # base + halfwidth voicing mark (ガ -> ｶﾞ), as ICU does
    assert f2h.apply(["カタカナ"]) == ["ｶﾀｶﾅ"]
    assert f2h.apply(["ガギ"]) == ["ｶﾞｷﾞ"]
    # inverse direction recomposes
    assert h2f.apply(["ｶﾞｷﾞ"]) == ["ガギ"]
    assert h2f.apply(["ｶﾀｶﾅ"]) == ["カタカナ"]
    # scope discipline: only target codepoints are touched — fullwidth
    # latin is NOT narrowed by Halfwidth-Fullwidth, precomposed accents
    # are NOT decomposed by Fullwidth-Halfwidth, and compatibility
    # chars (circled digits, ligatures) are left alone by both
    assert h2f.apply(["Ｔｅｓｔ", "Test"]) == ["Ｔｅｓｔ", "Test"]
    assert f2h.apply(["café"]) == ["café"]
    assert len(f2h.apply(["café"])[0]) == 4
    assert f2h.apply(["①ﬁ"]) == ["①ﬁ"]
    assert h2f.apply(["①ﬁ"]) == ["①ﬁ"]
    # mixed: kana narrows, the accent survives composed
    assert f2h.apply(["カcafé"]) == ["ｶcafé"]


def test_unknown_transform_rejected():
    import pytest

    from lucene_spark.analysis.extras import ScriptTransformFilter

    with pytest.raises(ValueError):
        ScriptTransformFilter("Any-Latin")
