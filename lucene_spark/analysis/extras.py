"""Analysis-zoo extras: char filters, n-gram tokenization, phonetic
encoders, and miscellaneous token filters.

Reference roles (all under lucene/analysis/common/src/java/org/apache/
lucene/analysis unless noted):

- charfilter/HTMLStripCharFilter.java (JFlex scanner: drops tags,
  comments, script/style bodies, decodes entities),
  charfilter/MappingCharFilter.java (longest-match string rewrites),
  pattern/PatternReplaceCharFilter.java. Char filters run BEFORE the
  tokenizer (Analyzer.initReader). Deviation, documented: Lucene char
  filters maintain an offset-correction map (correctOffset) so
  highlight offsets point into the ORIGINAL text; these analogs rewrite
  the text only, so char-filtered analyzers report
  supports_offsets() = False and index-driven highlighting falls back
  to the uncorrected chain.
- ngram/NGramTokenizer.java (grams of every length in [min,max] at
  each char position, left to right), ngram/NGramTokenFilter.java
  (grams per token; keepShortTerm/preserveOriginal edges).
- analysis/phonetic module's PhoneticFilter.java: each token is
  encoded (commons-codec encoders); inject=true ADDS the code beside
  the token, inject=false REPLACES it. Encoders implemented here from
  their public specifications: American Soundex and Refined Soundex.
  Deviation: inject=true appends the code as the NEXT list slot, so
  downstream positions shift by one (the reference injects at
  posIncrement 0; our token lists carry no position attribute).
- miscellaneous/TrimFilter.java, TruncateTokenFilter.java,
  LimitTokenCountFilter.java, CapitalizationFilter.java,
  KeywordMarkerFilter.java + StemmerOverrideFilter.java (the latter
  two are fused into the stemmers' `protected`/`overrides` options in
  filters.py — tokens are plain strings here, so the KeywordAttribute
  channel is carried by the consumer).
- core/analysis/KeywordAnalyzer (whole input = one token).
"""

from __future__ import annotations

import html
import re

from lucene_spark.analysis.analyzer import Analyzer
from lucene_spark.analysis.filters import TokenFilter, register_analyzer

# --------------------------------------------------------------------------
# char filters
# --------------------------------------------------------------------------


class CharFilter:
    """Text -> text rewrite applied before tokenization."""

    def apply_one(self, text: str) -> str:
        raise NotImplementedError


_HTML_BLOCK = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_HTML_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_HTML_TAG = re.compile(r"</?[A-Za-z!][^>]*>")


class HTMLStripCharFilter(CharFilter):
    """Drop script/style bodies, comments, and tags; decode entities.
    Tags are replaced by a space so words in adjacent elements never
    merge (the reference emits them as separate tokens too)."""

    def apply_one(self, text: str) -> str:
        text = _HTML_BLOCK.sub(" ", text)
        text = _HTML_COMMENT.sub(" ", text)
        text = _HTML_TAG.sub(" ", text)
        return html.unescape(text)


class MappingCharFilter(CharFilter):
    """Longest-match-first literal rewrites (NormalizeCharMap holds the
    mappings in an FST and always takes the longest match)."""

    def __init__(self, mappings: dict[str, str]):
        self.mappings = dict(mappings)
        keys = sorted(self.mappings, key=len, reverse=True)
        self._rx = re.compile("|".join(re.escape(k) for k in keys)) if keys else None

    def apply_one(self, text: str) -> str:
        if self._rx is None:
            return text
        return self._rx.sub(lambda m: self.mappings[m.group(0)], text)


class PatternReplaceCharFilter(CharFilter):
    def __init__(self, pattern: str, replacement: str):
        self._rx = re.compile(pattern)
        self.replacement = replacement

    def apply_one(self, text: str) -> str:
        return self._rx.sub(self.replacement, text)


class CharFilteredAnalyzer(Analyzer):
    """Analyzer.initReader role: run char filters, then the wrapped
    analyzer. No offset correction -> supports_offsets() is False."""

    def __init__(self, char_filters: list[CharFilter], base: Analyzer, name: str):
        self.char_filters = list(char_filters)
        self.base = base
        self.name = name

    def tokenize_one(self, text: str) -> list[str]:
        for cf in self.char_filters:
            text = cf.apply_one(text)
        return self.base.tokenize_one(text)

    def supports_offsets(self) -> bool:
        return False


# --------------------------------------------------------------------------
# n-grams
# --------------------------------------------------------------------------


class NGramAnalyzer(Analyzer):
    """NGramTokenizer: at each char position (left to right) emit the
    grams of every length in [min_gram, max_gram] that fit
    (NGramTokenizer.java post-4.4 order). Tracks offsets."""

    name = "ngram"

    def __init__(self, min_gram: int = 1, max_gram: int = 2, lowercase: bool = True):
        if not (1 <= min_gram <= max_gram):
            raise ValueError("need 1 <= min_gram <= max_gram")
        self.min_gram = min_gram
        self.max_gram = max_gram
        self.lowercase = lowercase

    def tokenize_one(self, text: str) -> list[str]:
        return self.tokenize_with_offsets_one(text)[0]

    def tokenize_with_offsets_one(self, text: str):
        if self.lowercase:
            text = text.lower()
        toks: list[str] = []
        starts: list[int] = []
        ends: list[int] = []
        n = len(text)
        for i in range(n):
            hi = min(self.max_gram, n - i)
            for g in range(self.min_gram, hi + 1):
                toks.append(text[i : i + g])
                starts.append(i)
                ends.append(i + g)
        return toks, starts, ends


class NGramFilter(TokenFilter):
    """NGramTokenFilter: per-token grams in the tokenizer's order.
    preserve_original keeps tokens whose length falls outside
    [min_gram, max_gram] (the keepShortTerm/keepLongTerm edges)."""

    def __init__(
        self, min_gram: int = 1, max_gram: int = 2, preserve_original: bool = False
    ):
        if not (1 <= min_gram <= max_gram):
            raise ValueError("need 1 <= min_gram <= max_gram")
        self.min_gram = min_gram
        self.max_gram = max_gram
        self.preserve_original = preserve_original

    def apply(self, tokens: list[str]) -> list[str]:
        out: list[str] = []
        for t in tokens:
            n = len(t)
            if n < self.min_gram:
                if self.preserve_original:
                    out.append(t)
                continue
            emitted = False
            hi = min(self.max_gram, n)
            for i in range(n):
                for g in range(self.min_gram, min(hi, n - i) + 1):
                    out.append(t[i : i + g])
                    emitted = True
            if emitted and self.preserve_original and n > self.max_gram:
                out.append(t)
        return out


# --------------------------------------------------------------------------
# phonetic encoders (public algorithm specifications)
# --------------------------------------------------------------------------

_SOUNDEX_CODES = {
    **dict.fromkeys("bfpv", "1"),
    **dict.fromkeys("cgjkqsxz", "2"),
    **dict.fromkeys("dt", "3"),
    "l": "4",
    **dict.fromkeys("mn", "5"),
    "r": "6",
}


def soundex(word: str) -> str:
    """American Soundex (the commons-codec Soundex default the
    reference's PhoneticFilter ships): first letter + 3 digits;
    adjacent same codes collapse, including across H/W; vowels reset
    the run. ASCII letters only, like the reference encoder (commons
    Soundex "clean" keeps [A-Za-z])."""
    w = [c for c in word.lower() if "a" <= c <= "z"]
    if not w:
        return ""
    out = [w[0].upper()]
    last = _SOUNDEX_CODES.get(w[0], "")
    for c in w[1:]:
        code = _SOUNDEX_CODES.get(c, "")
        if code and code != last:
            out.append(code)
            if len(out) == 4:
                break
        if c not in "hw":
            last = code  # vowels clear the run; h/w keep it
    return "".join(out).ljust(4, "0")


_REFINED_CODES = {
    **dict.fromkeys("bp", "1"),
    **dict.fromkeys("fv", "2"),
    **dict.fromkeys("cks", "3"),
    **dict.fromkeys("gj", "4"),
    **dict.fromkeys("qxz", "5"),
    **dict.fromkeys("dt", "6"),
    "l": "7",
    **dict.fromkeys("mn", "8"),
    "r": "9",
    **dict.fromkeys("aeiouyhw", "0"),
}


def refined_soundex(word: str) -> str:
    """Refined Soundex (commons-codec RefinedSoundex): first letter,
    then one digit per letter with adjacent duplicates collapsed; no
    length cap, vowels code 0. ASCII letters only."""
    w = [c for c in word.lower() if "a" <= c <= "z"]
    if not w:
        return ""
    out = [w[0].upper()]
    last = ""
    for c in w:
        code = _REFINED_CODES.get(c, "")
        if code and code != last:
            out.append(code)
        last = code
    return "".join(out)


class PhoneticFilter(TokenFilter):
    """PhoneticFilter.java: encode each token; inject=True emits the
    code AFTER the token (position-shifting deviation noted in the
    module doc), inject=False replaces the token with its code."""

    ENCODERS = {"soundex": soundex, "refined_soundex": refined_soundex}

    def __init__(self, encoder: str = "soundex", inject: bool = True):
        self.encode = self.ENCODERS[encoder]
        self.inject = inject

    def apply(self, tokens: list[str]) -> list[str]:
        out: list[str] = []
        for t in tokens:
            code = self.encode(t)
            if self.inject:
                out.append(t)
                if code and code != t:
                    out.append(code)
            else:
                out.append(code if code else t)
        return out


# --------------------------------------------------------------------------
# miscellaneous filters
# --------------------------------------------------------------------------


class TrimFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [t.strip() for t in tokens]


class TruncateTokenFilter(TokenFilter):
    def __init__(self, length: int):
        if length < 1:
            raise ValueError("length >= 1")
        self.length = length

    def apply(self, tokens: list[str]) -> list[str]:
        return [t[: self.length] for t in tokens]


class LimitTokenCountFilter(TokenFilter):
    def __init__(self, max_token_count: int):
        self.max_token_count = max_token_count

    def apply(self, tokens: list[str]) -> list[str]:
        return tokens[: self.max_token_count]


class CapitalizationFilter(TokenFilter):
    """Uppercase the first char, lowercase the rest (the
    CapitalizationFilter default with no protected/ok-prefix lists)."""

    def apply(self, tokens: list[str]) -> list[str]:
        return [t[:1].upper() + t[1:].lower() if t else t for t in tokens]


class KeywordAnalyzer(Analyzer):
    """core/analysis/KeywordAnalyzer: the entire input is ONE token,
    verbatim (no lowercasing)."""

    name = "keyword"

    def tokenize_one(self, text: str) -> list[str]:
        return [text] if text else []

    def tokenize_with_offsets_one(self, text: str):
        return ([text], [0], [len(text)]) if text else ([], [], [])


register_analyzer("keyword", KeywordAnalyzer)
register_analyzer("ngram", NGramAnalyzer)


def _html_standard():
    from lucene_spark.analysis.analyzer import StandardAnalyzer

    return CharFilteredAnalyzer(
        [HTMLStripCharFilter()], StandardAnalyzer(), "html_standard"
    )


register_analyzer("html_standard", _html_standard)


def _simple_soundex():
    from lucene_spark.analysis.analyzer import SimpleAnalyzer
    from lucene_spark.analysis.filters import FilteredAnalyzer

    return FilteredAnalyzer(
        SimpleAnalyzer(), [PhoneticFilter("soundex", inject=False)],
        "simple_soundex",
    )


register_analyzer("simple_soundex", _simple_soundex)


def _geohash():
    # lazy: the prefix-tree module lives under search/ (it also hosts
    # the query-side covering logic); importing it here at call time
    # avoids an analysis <-> search import cycle while keeping the
    # name resolvable inside Spark workers
    from lucene_spark.search.prefixtree import GeohashAnalyzer

    return GeohashAnalyzer()


register_analyzer("geohash", _geohash)


# --------------------------------------------------------------------------
# CJK (analysis/common cjk/: CJKWidthFilter.java, CJKBigramFilter.java,
# CJKAnalyzer.java)
# --------------------------------------------------------------------------

_CJK_RANGES = {
    "han": ("㐀䶿", "一鿿", "豈﫿"),
    "hiragana": ("ぁゖ", "ゝゟ"),
    "katakana": ("ァヺ", "ーヿ", "ㇰㇿ"),
    "hangul": ("가힯", "ᄀᇿ", "㄰㆏"),
}


def _cjk_script(ch: str, scripts: frozenset[str]) -> str | None:
    for name in scripts:
        for pair in _CJK_RANGES[name]:
            if pair[0] <= ch <= pair[1]:
                return name
    return None


class CJKWidthFilter(TokenFilter):
    """Normalize CJK width differences (cjk/CJKWidthFilter.java): fold
    fullwidth ASCII variants to basic latin and halfwidth katakana
    variants to kana. The reference documents itself as 'a (practical)
    subset of NFKC'; we apply NFKC exactly to tokens containing
    halfwidth/fullwidth-block chars (U+FF00-FFEF), leaving every other
    token untouched — same fold, same scope."""

    def apply(self, tokens: list[str]) -> list[str]:
        import unicodedata

        out = []
        for t in tokens:
            if any("＀" <= ch <= "￯" for ch in t):
                t = unicodedata.normalize("NFKC", t)
            out.append(t)
        return out


class CJKBigramFilter(TokenFilter):
    """Form bigrams of CJK terms (cjk/CJKBigramFilter.java): adjacent
    CJK characters — across tokens, since the tokenizer emits han and
    hiragana as single-char tokens and katakana/hangul as runs — join
    into overlapping 2-char grams. A CJK char with no CJK neighbor
    stays a unigram; with ``output_unigrams`` both forms emit (the
    combined unigram+bigram approach). Non-CJK tokens pass through
    unmodified and break adjacency. `flags` picks which scripts bigram
    (HAN|HIRAGANA|KATAKANA|HANGUL default); disabled-script chars pass
    through as-is, ending any open run."""

    offsets_safe = False  # bigrams span two source tokens

    def __init__(self, flags: tuple[str, ...] = ("han", "hiragana", "katakana", "hangul"),
                 output_unigrams: bool = False):
        bad = set(flags) - set(_CJK_RANGES)
        if bad:
            raise ValueError(f"unknown CJK scripts: {sorted(bad)}")
        self.scripts = frozenset(flags)
        self.output_unigrams = output_unigrams

    def _flush(self, buf: list[str], out: list[str]) -> None:
        if not buf:
            return
        if len(buf) == 1:
            out.append(buf[0])
        else:
            if self.output_unigrams:
                out.extend(buf)
            out.extend(buf[i] + buf[i + 1] for i in range(len(buf) - 1))
        buf.clear()

    def apply(self, tokens: list[str]) -> list[str]:
        out: list[str] = []
        buf: list[str] = []
        for t in tokens:
            # a token is a CJK run iff every char is in an enabled script
            if t and all(_cjk_script(c, self.scripts) for c in t):
                buf.extend(t)
                continue
            self._flush(buf, out)
            out.append(t)
        self._flush(buf, out)
        return out


def _cjk_analyzer():
    # CJKAnalyzer.java: StandardTokenizer -> CJKWidthFilter ->
    # LowerCaseFilter (in the standard chain) -> CJKBigramFilter ->
    # StopFilter (default English stops; ours stays empty like
    # StandardAnalyzer — documented deviation, stopset is pluggable)
    from lucene_spark.analysis.analyzer import StandardAnalyzer
    from lucene_spark.analysis.filters import FilteredAnalyzer

    return FilteredAnalyzer(
        StandardAnalyzer(), [CJKWidthFilter(), CJKBigramFilter()], "cjk"
    )


register_analyzer("cjk", _cjk_analyzer)


# --------------------------------------------------------------------------
# Sorani Kurdish (analysis/common ckb/: SoraniNormalizer.java,
# SoraniStemmer.java)
# --------------------------------------------------------------------------

_SR_YEH, _SR_DOTLESS_YEH, _SR_FARSI_YEH = "ي", "ى", "ی"
_SR_KAF, _SR_KEHEH = "ك", "ک"
_SR_HEH, _SR_AE, _SR_ZWNJ = "ه", "ە", "‌"
_SR_HEH_DOACHASHMEE, _SR_TEH_MARBUTA = "ھ", "ة"
_SR_REH, _SR_RREH, _SR_RREH_ABOVE = "ر", "ڕ", "ڒ"
_SR_DELETE = set("ـًٌٍَُِّْ")


class SoraniNormalizationFilter(TokenFilter):
    """Sorani orthography normalization (ckb/SoraniNormalizer.java):
    unify the alternate forms of y/k/e/h/rr, drop harakat, tatweel and
    formatting characters. Mutates a char buffer left-to-right exactly
    like the reference (the word-final Heh -> AE test sees the buffer
    state of the moment, so trailing deletions do not retrigger it)."""

    def _norm(self, t: str) -> str:
        import unicodedata

        buf = list(t)
        i = 0
        while i < len(buf):
            c = buf[i]
            if c in (_SR_YEH, _SR_DOTLESS_YEH):
                buf[i] = _SR_FARSI_YEH
            elif c == _SR_KAF:
                buf[i] = _SR_KEHEH
            elif c == _SR_ZWNJ:
                if i > 0 and buf[i - 1] == _SR_HEH:
                    buf[i - 1] = _SR_AE
                del buf[i]
                continue
            elif c == _SR_HEH:
                if i == len(buf) - 1:
                    buf[i] = _SR_AE
            elif c == _SR_TEH_MARBUTA:
                buf[i] = _SR_AE
            elif c == _SR_HEH_DOACHASHMEE:
                buf[i] = _SR_HEH
            elif c == _SR_REH:
                if i == 0:
                    buf[i] = _SR_RREH
            elif c == _SR_RREH_ABOVE:
                buf[i] = _SR_RREH
            elif c in _SR_DELETE or unicodedata.category(c) == "Cf":
                del buf[i]
                continue
            i += 1
        return "".join(buf)

    def apply(self, tokens: list[str]) -> list[str]:
        return [self._norm(t) for t in tokens]


class SoraniStemFilter(TokenFilter):
    """Sorani light stemmer (ckb/SoraniStemmer.java): postposition,
    possessive-pronoun, then the ezafe / definiteness / plurality
    suffix ladder — the same rule order and length guards."""

    def _stem(self, t: str) -> str:
        # postposition
        if len(t) > 5 and t.endswith("دا"):
            t = t[:-2]
        elif len(t) > 4 and t.endswith("نا"):
            t = t[:-1]
        elif len(t) > 6 and t.endswith("ەوە"):
            t = t[:-3]
        # possessive pronoun
        if len(t) > 6 and t[-3:] in ("مان", "یان", "تان"):
            t = t[:-3]
        n = len(t)
        # indefinite singular ezafe
        if n > 6 and t.endswith("ێکی"):
            return t[:-3]
        if n > 7 and t.endswith("یەکی"):
            return t[:-4]
        # indefinite singular
        if n > 5 and t.endswith("ێک"):
            return t[:-2]
        if n > 6 and t.endswith("یەک"):
            return t[:-3]
        # definite singular
        if n > 6 and t.endswith("ەکە"):
            return t[:-3]
        if n > 5 and t.endswith("کە"):
            return t[:-2]
        # definite plural
        if n > 7 and t.endswith("ەکان"):
            return t[:-4]
        if n > 6 and t.endswith("کان"):
            return t[:-3]
        # indefinite plural ezafe
        if n > 7 and t.endswith("یانی"):
            return t[:-4]
        if n > 6 and t.endswith("انی"):
            return t[:-3]
        # indefinite plural
        if n > 6 and t.endswith("یان"):
            return t[:-3]
        if n > 5 and t.endswith("ان"):
            return t[:-2]
        # demonstrative plural
        if n > 7 and t.endswith("یانە"):
            return t[:-4]
        if n > 6 and t.endswith("انە"):
            return t[:-3]
        # demonstrative singular
        if n > 5 and (t.endswith("ایە") or t.endswith("ەیە")):
            return t[:-2]
        if n > 4 and t.endswith("ە"):
            return t[:-1]
        # absolute singular ezafe
        if n > 4 and t.endswith("ی"):
            return t[:-1]
        return t

    def apply(self, tokens: list[str]) -> list[str]:
        return [self._stem(t) for t in tokens]


def _sorani_analyzer():
    # SoraniAnalyzer chain (normalize -> stem; stopwords pluggable)
    from lucene_spark.analysis.analyzer import StandardAnalyzer
    from lucene_spark.analysis.filters import FilteredAnalyzer

    return FilteredAnalyzer(
        StandardAnalyzer(),
        [SoraniNormalizationFilter(), SoraniStemFilter()],
        "sorani",
    )


register_analyzer("sorani", _sorani_analyzer)


# --------------------------------------------------------------------------
# Arabic (analysis/common ar/: ArabicNormalizer.java, ArabicStemmer.java —
# Larkey, Ballesteros & Connell's "light10" algorithm)
# --------------------------------------------------------------------------

_AR_ALEF, _AR_YEH, _AR_HEH = "ا", "ي", "ه"
_AR_NORM_MAP = str.maketrans({"آ": "ا", "أ": "ا", "إ": "ا", "ى": "ي", "ة": "ه"})
_AR_DROP = set("ـًٌٍَُِّْ")
# order matters: first matching prefix strips (longest-definite first)
_AR_PREFIXES = ("ال", "وال", "بال", "كال", "فال", "لل", "و")
# every matching suffix strips, scanned in this order
_AR_SUFFIXES = ("ها", "ان", "ات", "ون", "ين", "يه", "ية", "ه", "ة", "ي")


class ArabicNormalizationFilter(TokenFilter):
    """Arabic orthographic normalization (ar/ArabicNormalizer.java):
    hamza-seated alefs -> bare alef, teh marbuta -> heh, alef maksura
    -> yeh, harakat and tatweel removed."""

    def apply(self, tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            t = t.translate(_AR_NORM_MAP)
            out.append("".join(c for c in t if c not in _AR_DROP))
        return out


class ArabicStemFilter(TokenFilter):
    """Arabic light stemmer (ar/ArabicStemmer.java, light10): strip ONE
    attached article/conjunction/preposition prefix (wa- needs >= 3
    chars left, the others >= 2), then every matching common suffix in
    ladder order (each needs >= 2 chars remaining)."""

    def _stem(self, t: str) -> str:
        for p in _AR_PREFIXES:
            if len(p) == 1:
                if len(t) < 4:
                    continue
            elif len(t) < len(p) + 2:
                continue
            if t.startswith(p):
                t = t[len(p):]
                break
        for s in _AR_SUFFIXES:
            if len(t) >= len(s) + 2 and t.endswith(s):
                t = t[: -len(s)]
        return t

    def apply(self, tokens: list[str]) -> list[str]:
        return [self._stem(t) for t in tokens]


def _arabic_analyzer():
    from lucene_spark.analysis.analyzer import StandardAnalyzer
    from lucene_spark.analysis.filters import FilteredAnalyzer

    return FilteredAnalyzer(
        StandardAnalyzer(),
        [ArabicNormalizationFilter(), ArabicStemFilter()],
        "arabic",
    )


register_analyzer("arabic", _arabic_analyzer)


# --------------------------------------------------------------------------
# Persian + Hindi (fa/PersianNormalizer.java; hi/HindiNormalizer.java,
# hi/HindiStemmer.java — Ramanathan & Rao's lightweight Hindi stemmer)
# --------------------------------------------------------------------------


class PersianNormalizationFilter(TokenFilter):
    """Persian orthography normalization (fa/PersianNormalizer.java):
    farsi yeh / yeh barree -> arabic yeh, keheh -> kaf, heh+hamza
    forms and heh goal -> heh, combining hamza-above removed."""

    _MAP = str.maketrans({"ی": "ي", "ے": "ي", "ک": "ك", "ۀ": "ه", "ہ": "ه"})

    def apply(self, tokens: list[str]) -> list[str]:
        return [
            t.translate(self._MAP).replace("ٔ", "") for t in tokens
        ]


class HindiNormalizationFilter(TokenFilter):
    """Hindi orthography normalization (hi/HindiNormalizer.java,
    implementing Ljiljana Dolamic and Jacques Savoy's Hindi rules):
    dead-n -> bindu, candrabindu -> bindu, nukta forms folded, virama
    and zero-width joiners removed, chandra and long vowels shortened."""

    _MAP = str.maketrans({
        "ँ": "ं",
        "ऩ": "न", "ऱ": "र", "ऴ": "ळ",
        "क़": "क", "ख़": "ख", "ग़": "ग",
        "ज़": "ज", "ड़": "ड", "ढ़": "ढ",
        "फ़": "फ", "य़": "य",
        "ॅ": "े", "ॆ": "े",
        "ॉ": "ो", "ॊ": "ो",
        "ऍ": "ए", "ऎ": "ए",
        "ऑ": "ओ", "ऒ": "ओ",
        "ॲ": "अ", "आ": "अ", "ई": "इ",
        "ऊ": "उ", "ॠ": "ऋ", "ॡ": "ऌ",
        "ऐ": "ए", "औ": "ओ",
        "ी": "ि", "ू": "ु", "ॄ": "ृ",
        "ॣ": "ॢ", "ै": "े", "ौ": "ो",
    })

    def _norm(self, t: str) -> str:
        # dead n -> bindu happens BEFORE virama deletion (the n + virama
        # pair becomes one anusvara), so handle the bigram first
        t = t.replace("न्", "ं")
        t = t.translate(self._MAP)
        return (
            t.replace("़", "")  # nukta
            .replace("‍", "")
            .replace("‌", "")
            .replace("्", "")  # virama
        )

    def apply(self, tokens: list[str]) -> list[str]:
        return [self._norm(t) for t in tokens]


class HindiStemFilter(TokenFilter):
    """Hindi light stemmer (hi/HindiStemmer.java — Ramanathan & Rao,
    "A Lightweight Stemmer for Hindi"): longest of the 5..1-char
    inflectional suffix layers, each with its minimum-length guard."""

    _S5 = ("ाएंगी", "ाएंगे", "ाऊंगी", "ाऊंगा", "ाइयाँ", "ाइयों", "ाइयां")
    _S4 = ("ाएगी", "ाएगा", "ाओगी", "ाओगे", "एंगी", "ेंगी", "एंगे", "ेंगे",
           "ूंगी", "ूंगा", "ातीं", "नाओं", "नाएं", "ताओं", "ताएं", "ियाँ",
           "ियों", "ियां")
    _S3 = ("ाकर", "ाइए", "ाईं", "ाया", "ेगी", "ेगा", "ोगी", "ोगे", "ाने",
           "ाना", "ाते", "ाती", "ाता", "तीं", "ाओं", "ाएं", "ुओं", "ुएं",
           "ुआं")
    _S2 = ("कर", "ाओ", "िए", "ाई", "ाए", "ने", "नी", "ना", "ते", "ीं",
           "ती", "ता", "ाँ", "ां", "ों", "ें")
    _S1 = ("ो", "े", "ू", "ु", "ी", "ि", "ा")

    def _stem(self, t: str) -> str:
        n = len(t)
        if n > 6 and t[-5:] in self._S5:
            return t[:-5]
        if n > 5 and t[-4:] in self._S4:
            return t[:-4]
        if n > 4 and t[-3:] in self._S3:
            return t[:-3]
        if n > 3 and t[-2:] in self._S2:
            return t[:-2]
        if n > 2 and t[-1] in self._S1:
            return t[:-1]
        return t

    def apply(self, tokens: list[str]) -> list[str]:
        return [self._stem(t) for t in tokens]


def _hindi_analyzer():
    from lucene_spark.analysis.analyzer import StandardAnalyzer
    from lucene_spark.analysis.filters import FilteredAnalyzer

    return FilteredAnalyzer(
        StandardAnalyzer(),
        [HindiNormalizationFilter(), HindiStemFilter()],
        "hindi",
    )


def _persian_analyzer():
    from lucene_spark.analysis.analyzer import StandardAnalyzer
    from lucene_spark.analysis.filters import FilteredAnalyzer

    return FilteredAnalyzer(
        StandardAnalyzer(), [PersianNormalizationFilter()], "persian"
    )


register_analyzer("hindi", _hindi_analyzer)
register_analyzer("persian", _persian_analyzer)


# --------------------------------------------------------------------------
# ICUTransformFilter — the ALGORITHMIC transform subset
# (analysis/icu/src/java/org/apache/lucene/analysis/icu/
# ICUTransformFilter.java wraps any compiled ICU Transliterator; the
# rule-data transliterators (Any-Latin tailorings etc.) are permanently
# descoped as data-bound — SURVEY §12. The transforms below are pure
# codepoint arithmetic / canonical-decomposition inverses, so they
# rebuild without transcribing ICU rule data.)
# --------------------------------------------------------------------------


_HALF_KANA_INV: dict[str, str] | None = None
_HALF_KANA_FWD: dict[str, str] | None = None


def _half_kana_inverse() -> dict[str, str]:
    """fullwidth kana char -> halfwidth form, derived ONCE lazily by
    inverting the NFKC decompositions of U+FF61..U+FF9F (no table is
    transcribed: Unicode's own normalization data IS the mapping)."""
    global _HALF_KANA_INV
    if _HALF_KANA_INV is None:
        import unicodedata

        inv: dict[str, str] = {}
        for cp in range(0xFF61, 0xFFA0):
            h = chr(cp)
            f = unicodedata.normalize("NFKC", h)
            if f != h:
                inv[f] = h
        _HALF_KANA_INV = inv
    return _HALF_KANA_INV


def _half_kana_forward() -> dict[str, str]:
    """halfwidth kana char -> fullwidth form (cached inverse of
    _half_kana_inverse; built once, not per token)."""
    global _HALF_KANA_FWD
    if _HALF_KANA_FWD is None:
        _HALF_KANA_FWD = {h: f for f, h in _half_kana_inverse().items()}
    return _HALF_KANA_FWD


class ScriptTransformFilter(TokenFilter):
    """ICUTransformFilter role for the algorithmic transform ids:

    - ``Katakana-Hiragana`` / ``Hiragana-Katakana``: the kana blocks
      are congruent at a fixed 0x60 codepoint offset
      (U+30A1..U+30F6 <-> U+3041..U+3096) plus the iteration marks
      (U+30FD/30FE <-> U+309D/309E); the prolonged sound mark U+30FC
      maps to itself, exactly as ICU's transliterator leaves it.
    - ``Fullwidth-Halfwidth``: fullwidth ASCII (U+FF01..U+FF5E) to
      basic latin, ideographic space U+3000 to space, and fullwidth
      kana to the halfwidth kana block via the inverted NFKC
      decompositions (voiced kana decompose NFD-first so ガ becomes
      the two-char halfwidth ｶﾞ, matching ICU).
    - ``Halfwidth-Fullwidth``: halfwidth kana block (U+FF61..FF9F,
      incl. kana punctuation) widened via the inverted decompositions,
      voiced/semivoiced marks NFC-composed onto their kana (ｶﾞ -> ガ).
      ICU's transform additionally widens latin/digits; that direction
      is a documented exclusion (search analyzers never want it), and
      non-kana text passes byte-identical.  Both width transforms
      touch ONLY their target codepoints — no whole-token
      renormalization, so unrelated accented/compatibility text is
      never rewritten.
    """

    _KATA_HIRA = {0x30FD: 0x309D, 0x30FE: 0x309E}
    _HIRA_KATA = {v: k for k, v in _KATA_HIRA.items()}
    _IDS = (
        "Katakana-Hiragana", "Hiragana-Katakana",
        "Fullwidth-Halfwidth", "Halfwidth-Fullwidth",
    )

    def __init__(self, transform_id: str = "Katakana-Hiragana"):
        if transform_id not in self._IDS:
            raise ValueError(
                f"unsupported transform {transform_id!r}; "
                f"algorithmic subset: {self._IDS}"
            )
        self.transform_id = transform_id

    def _kata_to_hira(self, t: str) -> str:
        out = []
        for ch in t:
            cp = ord(ch)
            if 0x30A1 <= cp <= 0x30F6:
                out.append(chr(cp - 0x60))
            elif cp in self._KATA_HIRA:
                out.append(chr(self._KATA_HIRA[cp]))
            else:
                out.append(ch)
        return "".join(out)

    def _hira_to_kata(self, t: str) -> str:
        out = []
        for ch in t:
            cp = ord(ch)
            if 0x3041 <= cp <= 0x3096:
                out.append(chr(cp + 0x60))
            elif cp in self._HIRA_KATA:
                out.append(chr(self._HIRA_KATA[cp]))
            else:
                out.append(ch)
        return "".join(out)

    def _full_to_half(self, t: str) -> str:
        import unicodedata

        inv = _half_kana_inverse()
        out = []
        for ch in t:
            cp = ord(ch)
            if 0xFF01 <= cp <= 0xFF5E:
                out.append(chr(cp - 0xFEE0))
                continue
            if cp == 0x3000:
                out.append(" ")
                continue
            if ch in inv:  # unvoiced fullwidth kana / kana punctuation
                out.append(inv[ch])
                continue
            # precomposed voiced kana: canonical-decompose THIS char
            # only (ガ -> カ + U+3099 -> ｶﾞ); any char whose
            # decomposition does not fully map stays byte-identical —
            # non-target text (e.g. 'café') is never renormalized
            dec = unicodedata.normalize("NFD", ch)
            if len(dec) > 1 and all(c in inv for c in dec):
                out.extend(inv[c] for c in dec)
                continue
            out.append(ch)
        return "".join(out)

    def _half_to_full(self, t: str) -> str:
        import unicodedata

        fwd = _half_kana_forward()
        out: list[str] = []
        for ch in t:
            f = fwd.get(ch)
            if f is None:  # not halfwidth kana: untouched (the latin/
                # digit widening of ICU's full transform is a
                # documented exclusion — search analyzers never want it)
                out.append(ch)
                continue
            if out and f in ("゙", "゚"):
                # voiced/semivoiced mark composes with the preceding
                # kana (NFC canonical composition: ｶ + ﾞ -> ガ)
                comp = unicodedata.normalize("NFC", out[-1] + f)
                if len(comp) == 1:
                    out[-1] = comp
                    continue
            out.append(f)
        return "".join(out)

    def apply(self, tokens: list[str]) -> list[str]:
        fn = {
            "Katakana-Hiragana": self._kata_to_hira,
            "Hiragana-Katakana": self._hira_to_kata,
            "Fullwidth-Halfwidth": self._full_to_half,
            "Halfwidth-Fullwidth": self._half_to_full,
        }[self.transform_id]
        return [fn(t) for t in tokens]
