"""Snowball Danish / Norwegian / Dutch / Irish / Armenian / Nepali
stemmers (SURVEY.md §2.2 analysis/common zoo — the snowball language
pack beyond English).

Reference contract: the generated stemmers
``analysis/common/src/java/org/tartarus/snowball/ext/DanishStemmer.java``,
``NorwegianStemmer.java``, ``DutchStemmer.java``, ``IrishStemmer.java``,
``ArmenianStemmer.java``, ``NepaliStemmer.java`` (used by
``analysis/common/.../da/DanishAnalyzer.java``, ``ga/IrishAnalyzer.java``,
``hy/ArmenianAnalyzer.java``, ``ne/NepaliAnalyzer.java`` etc. via
SnowballFilter).
These are mechanical compilations of the published Snowball algorithms
(snowballstem.org); the Python below implements the published algorithms
directly as suffix ladders — same idiom as the r3 light-stemmer pack,
no snowball-VM emulation. Each was verified DIFFERENTIALLY against the
reference's generated stemmer (compiled and driven over suffix-grid
word lists) at development time; the archives are not committed, the
curated goldens live in tests/test_snowball_multi.py.

Shared shape (da/no): R1 = region after the first non-vowel that
follows the first vowel, but starting no earlier than position 3; a
suffix is removable only if it lies entirely inside R1.
"""

from __future__ import annotations

from lucene_spark.analysis.analyzer import Analyzer, StandardAnalyzer
from lucene_spark.analysis.filters import (
    FilteredAnalyzer,
    TokenFilter,
    register_analyzer,
)

__all__ = [
    "danish_stem", "norwegian_stem", "dutch_stem",
    "irish_stem", "armenian_stem", "nepali_stem",
    "DanishStemFilter", "NorwegianStemFilter", "DutchStemFilter",
    "IrishStemFilter", "ArmenianStemFilter", "NepaliStemFilter",
]


def _p1_scand(w: str, vowels: frozenset[str]) -> int:
    """Danish/Norwegian mark_regions: p1 = after the first non-vowel
    following the first vowel, floored at 3; whole word if the pattern
    never completes or the word is shorter than 3."""
    n = len(w)
    if n < 3:
        return n
    i = 0
    while i < n and w[i] not in vowels:
        i += 1
    while i < n and w[i] in vowels:
        i += 1
    if i >= n:
        return n
    return max(i + 1, 3)


# --------------------------------------------------------------------------
# Danish (DanishStemmer.java; snowballstem.org/algorithms/danish)
# --------------------------------------------------------------------------

_DA_V = frozenset("aeiouyåæø")
_DA_S_END = frozenset("abcdfghjklmnoprtvyzå")
# undouble group: ASCII consonants only (g_c spans 98-122)
_DA_C = frozenset("bcdfghjklmnpqrstvwxz")

_DA_MAIN = sorted(
    ["hed", "ethed", "ered", "e", "erede", "ende", "erende", "ene", "erne",
     "ere", "en", "heden", "eren", "er", "heder", "erer", "s", "heds", "es",
     "endes", "erendes", "enes", "ernes", "eres", "ens", "hedens", "erens",
     "ers", "ets", "erets", "et", "eret"],
    key=len, reverse=True,
)
_DA_OTHER = sorted(["ig", "lig", "elig", "els", "løst"], key=len, reverse=True)


def _da_consonant_pair(w: str, p1: int) -> str:
    # gd/dt/gt/kt entirely in R1 -> drop the final letter
    if len(w) >= 2 and len(w) - 2 >= p1 and w[-2:] in ("gd", "dt", "gt", "kt"):
        return w[:-1]
    return w


def danish_stem(word: str) -> str:
    w = word
    p1 = _p1_scand(w, _DA_V)
    # main suffix: longest entry lying entirely in R1
    for s in _DA_MAIN:
        if w.endswith(s) and len(w) - len(s) >= p1:
            if s == "s":
                i = len(w) - 2
                if i >= 0 and w[i] in _DA_S_END:
                    w = w[:-1]
            else:
                w = w[: -len(s)]
            break
    # consonant pair
    w = _da_consonant_pair(w, p1)
    # other suffix: igst loses its st unconditionally, then ig/lig/elig/els
    # in R1 delete (re-trying the consonant pair), løst -> løs
    if w.endswith("igst"):
        w = w[:-2]
    for s in _DA_OTHER:
        if w.endswith(s) and len(w) - len(s) >= p1:
            if s == "løst":
                w = w[:-1]
            else:
                w = w[: -len(s)]
                w = _da_consonant_pair(w, p1)
            break
    # undouble: final double consonant with the second copy in R1
    if (
        len(w) >= 2
        and len(w) - 1 >= p1
        and w[-1] in _DA_C
        and w[-2] == w[-1]
    ):
        w = w[:-1]
    return w


# --------------------------------------------------------------------------
# Norwegian (NorwegianStemmer.java; snowballstem.org/algorithms/norwegian)
# --------------------------------------------------------------------------

_NO_V = _DA_V  # a e i o u y å æ ø
_NO_S_END = frozenset("bcdfghjlmnoprtvyz")

_NO_MAIN = sorted(
    ["a", "e", "ede", "ande", "ende", "ane", "ene", "hetene", "erte", "en",
     "heten", "ar", "er", "heter", "s", "as", "es", "edes", "endes", "enes",
     "hetenes", "ens", "hetens", "ers", "ets", "et", "het", "ert", "ast"],
    key=len, reverse=True,
)
_NO_OTHER = sorted(
    ["leg", "eleg", "ig", "eig", "lig", "elig", "els", "lov", "elov",
     "slov", "hetslov"],
    key=len, reverse=True,
)


def norwegian_stem(word: str) -> str:
    w = word
    p1 = _p1_scand(w, _NO_V)
    for s in _NO_MAIN:
        if w.endswith(s) and len(w) - len(s) >= p1:
            if s in ("erte", "ert"):
                w = w[: -len(s)] + "er"
            elif s == "s":
                # s-ending char, or k itself preceded by a non-vowel
                i = len(w) - 2
                if i >= 0 and (
                    w[i] in _NO_S_END
                    or (w[i] == "k" and i >= 1 and w[i - 1] not in _NO_V)
                ):
                    w = w[:-1]
            else:
                w = w[: -len(s)]
            break
    # consonant pair: dt/vt entirely in R1 -> drop final letter
    if len(w) >= 2 and len(w) - 2 >= p1 and w[-2:] in ("dt", "vt"):
        w = w[:-1]
    for s in _NO_OTHER:
        if w.endswith(s) and len(w) - len(s) >= p1:
            w = w[: -len(s)]
            break
    return w


# --------------------------------------------------------------------------
# Dutch (DutchStemmer.java; snowballstem.org/algorithms/dutch)
# --------------------------------------------------------------------------

_NL_V = frozenset("aeiouyè")          # g_v
_NL_V_J = _NL_V | {"j"}               # g_v_j
_NL_V_I = _NL_V | {"I"}               # g_v_I
_NL_FOLD = str.maketrans("áäéëíïóöúü", "aaeeiioouu")

_NL_A3 = sorted(["ene", "se", "en", "heden", "s"], key=len, reverse=True)
_NL_A4 = sorted(["end", "ig", "ing", "lijk", "baar", "bar"], key=len, reverse=True)


def _nl_regions(w: str) -> tuple[int, int]:
    n = len(w)
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in _NL_V:
        i += 1
    while i < n and w[i] in _NL_V:
        i += 1
    if i >= n:
        return max(p1, 3) if p1 < n else n, p2  # p1 stays n -> no regions
    p1 = max(i + 1, 3)
    while i < n and w[i] not in _NL_V:
        i += 1
    while i < n and w[i] in _NL_V:
        i += 1
    if i < n:
        p2 = i + 1
    return p1, p2


def _nl_undouble(w: str) -> str:
    # dd/kk/tt at the end -> drop one
    if w.endswith(("dd", "kk", "tt")):
        return w[:-1]
    return w


def _nl_en_ending(w: str, suf_len: int, p1: int) -> tuple[str, bool]:
    """en/ene removal: whole suffix in R1, preceded by a non-vowel that
    is not the tail of 'gem'; delete + undouble."""
    start = len(w) - suf_len
    if start < p1 or start < 1:
        return w, False
    if w[start - 1] in _NL_V:
        return w, False
    if w[:start].endswith("gem"):
        return w, False
    return _nl_undouble(w[:start]), True


def dutch_stem(word: str) -> str:
    # prelude: fold accents; protect consonantal y/i as Y/I
    w = word.translate(_NL_FOLD)
    out = list(w)
    if out and out[0] == "y":
        out[0] = "Y"
    for i in range(len(out) - 1):
        if out[i] in _NL_V:
            if out[i + 1] == "i" and i + 2 < len(out) and out[i + 2] in _NL_V:
                out[i + 1] = "I"
            elif out[i + 1] == "y":
                out[i + 1] = "Y"
    w = "".join(out)

    p1, p2 = _nl_regions(w)
    e_found = False

    # a) heden->heid | en/ene | s/se
    for s in _NL_A3:
        if not w.endswith(s):
            continue
        start = len(w) - len(s)
        if s == "heden":
            if start >= p1:
                w = w[:start] + "heid"
        elif s in ("en", "ene"):
            w, _ = _nl_en_ending(w, len(s), p1)
        else:  # s / se
            if start >= p1 and start >= 1 and w[start - 1] not in _NL_V_J:
                w = w[:start]
        break

    # b) e-ending: final e in R1 after a non-vowel -> delete + undouble
    if w.endswith("e") and len(w) - 1 >= p1 and len(w) >= 2 and w[-2] not in _NL_V:
        w = _nl_undouble(w[:-1])
        e_found = True

    # c) heid in R2 not after c -> delete, then a following en-ending
    if w.endswith("heid") and len(w) - 4 >= p2 and not w[: len(w) - 4].endswith("c"):
        w = w[:-4]
        if w.endswith("en"):
            w, _ = _nl_en_ending(w, 2, p1)

    # d) derivational suffixes in R2
    for s in _NL_A4:
        if not w.endswith(s):
            continue
        start = len(w) - len(s)
        if s in ("end", "ing"):
            if start >= p2:
                w = w[:start]
                if (
                    w.endswith("ig")
                    and len(w) - 2 >= p2
                    and not w[: len(w) - 2].endswith("e")
                ):
                    w = w[:-2]
                else:
                    w = _nl_undouble(w)
        elif s == "ig":
            if start >= p2 and not w[:start].endswith("e"):
                w = w[:start]
        elif s == "lijk":
            if start >= p2:
                w = w[:start]
                if (
                    w.endswith("e")
                    and len(w) - 1 >= p1
                    and len(w) >= 2
                    and w[-2] not in _NL_V
                ):
                    w = _nl_undouble(w[:-1])
                    e_found = True
        elif s == "baar":
            if start >= p2:
                w = w[:start]
        else:  # bar — only after an e was removed this run
            if start >= p2 and e_found:
                w = w[:start]
        break

    # e) undouble vowel: C VV C at the end -> drop one vowel of the pair
    if (
        len(w) >= 4
        and w[-1] not in _NL_V_I
        and w[-3:-1] in ("aa", "ee", "oo", "uu")
        and w[-4] not in _NL_V
    ):
        w = w[:-2] + w[-1]

    # postlude
    return w.replace("Y", "y").replace("I", "i")


# --------------------------------------------------------------------------
# Filters + analyzers (DanishAnalyzer.java / NorwegianAnalyzer.java /
# DutchAnalyzer.java chains minus the verbatim stop-word data files —
# same registration shape as the repo's 'english' analyzer)
# --------------------------------------------------------------------------


class DanishStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [danish_stem(t) for t in tokens]


class NorwegianStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [norwegian_stem(t) for t in tokens]


class DutchStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [dutch_stem(t) for t in tokens]


register_analyzer(
    "danish",
    lambda: FilteredAnalyzer(StandardAnalyzer(), [DanishStemFilter()], "danish"),
)
register_analyzer(
    "norwegian",
    lambda: FilteredAnalyzer(StandardAnalyzer(), [NorwegianStemFilter()], "norwegian"),
)
register_analyzer(
    "dutch",
    lambda: FilteredAnalyzer(StandardAnalyzer(), [DutchStemFilter()], "dutch"),
)


# --------------------------------------------------------------------------
# Irish (IrishStemmer.java; snowballstem.org/algorithms/irish) — used by
# analysis/common/.../ga/IrishAnalyzer.java via SnowballFilter
# --------------------------------------------------------------------------

_GA_V = frozenset("aeiouáéíóú")

# initial mutation/eclipsis prefixes: (prefix, replacement), longest first
_GA_PREFIX = sorted(
    [("b'", ""), ("bhf", "f"), ("bh", "b"), ("bp", "p"), ("ch", "c"),
     ("d'fh", "f"), ("d'", ""), ("dh", "d"), ("dt", "t"), ("fh", "f"),
     ("gc", "c"), ("gh", "g"), ("h-", ""), ("m'", ""), ("mb", "b"),
     ("mh", "m"), ("n-", ""), ("nd", "d"), ("ng", "g"), ("ph", "p"),
     ("sh", "s"), ("t-", ""), ("th", "t"), ("ts", "s")],
    key=lambda kv: len(kv[0]), reverse=True,
)

_GA_NOUN_R1 = ("íochta", "aíochta", "abh", "eabh", "ibh", "aibh", "amh",
               "eamh", "imh", "aimh", "íocht", "aíocht")
_GA_NOUN_R2 = ("ire", "aire", "irí", "airí")
_GA_DERIV = {  # suffix -> (replacement, needs_R2)
    **{s: ("", True) for s in ("achta", "eachta", "ach", "each", "acht",
                               "eacht", "achtúil", "eachtúil")},
    **{s: ("arc", False) for s in ("arcachta", "arcacht", "arcachtaí")},
    **{s: ("gin", False) for s in ("gineach", "gineas", "ginis")},
    **{s: ("graf", False) for s in ("grafaíochta", "grafaíoch",
                                    "grafaíocht", "grafaíochtaí")},
    **{s: ("paite", False) for s in ("patacha", "paite", "patach", "pataigh")},
    **{s: ("óid", False) for s in ("óideacha", "óideach", "óidigh")},
}
_GA_DERIV_ORDER = sorted(_GA_DERIV, key=len, reverse=True)
_GA_VERB_RV = ("imid", "aimid", "ímid", "aímid", "faidh", "fidh")
_GA_VERB_R1 = ("adh", "eadh", "áil", "ain", "tear", "tar")


def _regions_v(w: str, vowels: frozenset[str]) -> tuple[int, int, int]:
    """pV = after the first vowel; p1 = after the first non-vowel that
    follows it; p2 = one vowel/non-vowel pair later (limit when the
    pattern runs off the end)."""
    n = len(w)
    pV = p1 = p2 = n
    i = 0
    while i < n and w[i] not in vowels:
        i += 1
    if i >= n:
        return pV, p1, p2
    i += 1
    pV = i
    while i < n and w[i] in vowels:
        i += 1
    if i >= n:
        return pV, p1, p2
    i += 1
    p1 = i
    while i < n and w[i] not in vowels:
        i += 1
    if i >= n:
        return pV, p1, p2
    i += 1
    while i < n and w[i] in vowels:
        i += 1
    if i >= n:
        return pV, p1, p2
    p2 = i + 1
    return pV, p1, p2


def irish_stem(word: str) -> str:
    w = word
    for pre, rep in _GA_PREFIX:
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    pV, p1, p2 = _regions_v(w, _GA_V)

    def _longest(sufs):
        best = None
        for s in sufs:
            if w.endswith(s) and (best is None or len(s) > len(best)):
                best = s
        return best

    # noun suffixes
    s = _longest(_GA_NOUN_R1 + _GA_NOUN_R2)
    if s is not None:
        start = len(w) - len(s)
        if s in _GA_NOUN_R2:
            if start >= p2:
                w = w[:start]
        elif start >= p1:
            w = w[:start]
    # derivational suffixes
    for s in _GA_DERIV_ORDER:
        if w.endswith(s):
            rep, needs_r2 = _GA_DERIV[s]
            start = len(w) - len(s)
            if not needs_r2 or start >= p2:
                w = w[:start] + rep
            break
    # verb suffixes
    s = None
    for cand in sorted(_GA_VERB_RV + _GA_VERB_R1, key=len, reverse=True):
        if w.endswith(cand):
            s = cand
            break
    if s is not None:
        start = len(w) - len(s)
        if s in _GA_VERB_RV:
            if start >= pV:
                w = w[:start]
        elif start >= p1:
            w = w[:start]
    return w


# --------------------------------------------------------------------------
# Armenian (ArmenianStemmer.java; snowballstem.org) — hy/ArmenianAnalyzer
# --------------------------------------------------------------------------

_HY_V = frozenset("աեէըիուօ")

_HY_ADJ = ("րորդ", "երորդ", "ալի", "ակի", "որակ", "եղ", "ական", "արան",
           "են", "եկեն", "երեն", "որէն", "ին", "գին", "ովին", "լայն",
           "վուն", "պես", "իվ", "ատ", "ավետ", "կոտ", "բար")
_HY_VERB = ("ա", "ացա", "եցա", "վե", "ացրի", "ացի", "եցի", "վեցի", "ալ",
            "ըալ", "անալ", "ենալ", "ացնալ", "ել", "ըել", "նել", "ցնել",
            "եցնել", "չել", "վել", "ացվել", "եցվել", "տել", "ատել",
            "ոտել", "կոտել", "ված", "ում", "վում", "ան", "ցան", "ացան",
            "ացրին", "ացին", "եցին", "վեցին", "ալիս", "ելիս", "ավ",
            "ացավ", "եցավ", "ալով", "ելով", "ար", "ացար", "եցար",
            "ացրիր", "ացիր", "եցիր", "վեցիր", "աց", "եց", "ացրեց",
            "ալուց", "ելուց", "ալու", "ելու", "աք", "ցաք", "ացաք",
            "ացրիք", "ացիք", "եցիք", "վեցիք", "անք", "ցանք", "ացանք",
            "ացրինք", "ացինք", "եցինք", "վեցինք")
_HY_NOUN = ("որդ", "ույթ", "ուհի", "ցի", "իլ", "ակ", "յակ", "անակ",
            "իկ", "ուկ", "ան", "պան", "ստան", "արան", "եղէն", "յուն",
            "ություն", "ածո", "իչ", "ուս", "ուստ", "գար", "վոր",
            "ավոր", "ոց", "անօց", "ու", "ք", "չեք", "իք", "ալիք",
            "անիք", "վածք", "ույք", "ենք", "ոնք", "ունք", "մունք",
            "իչք", "արք")
_HY_ENDING = ("սա", "վա", "ամբ", "դ", "անդ", "ությանդ", "վանդ", "ոջդ",
              "երդ", "ներդ", "ուդ", "ը", "անը", "ությանը", "վանը",
              "ոջը", "երը", "ները", "ի", "վի", "երի", "ների", "անում",
              "երում", "ներում", "ն", "ան", "ության", "վան", "ին",
              "երին", "ներին", "ությանն", "երն", "ներն", "ուն", "ոջ",
              "ությանս", "վանս", "ոջս", "ով", "անով", "վով", "երով",
              "ներով", "եր", "ներ", "ց", "ից", "վանից", "ոջից", "վից",
              "երից", "ներից", "ցից", "ոց", "ուց")


def armenian_stem(word: str) -> str:
    w = word
    n = len(w)
    # pV = after the first vowel; p2 = after the second vowel's
    # following non-vowel (ArmenianStemmer.java r_mark_regions)
    pV = p2 = n
    i = 0
    while i < n and w[i] not in _HY_V:
        i += 1
    if i < n:
        pV = i + 1
        i += 1
        while i < n and w[i] in _HY_V:
            i += 1
        if i < n:
            i += 1  # first non-vowel
            while i < n and w[i] not in _HY_V:
                i += 1
            if i < n:
                i += 1  # second vowel
                while i < n and w[i] in _HY_V:
                    i += 1
                if i < n:
                    p2 = i + 1

    def _cut(sufs, needs_r2: bool) -> None:
        nonlocal w
        best = None
        for s in sufs:
            # whole suffix within [pV, end) — limit_backward = I_pV
            if w.endswith(s) and len(w) - len(s) >= pV and (
                best is None or len(s) > len(best)
            ):
                best = s
        if best is not None and (not needs_r2 or len(w) - len(best) >= p2):
            w = w[: len(w) - len(best)]

    _cut(_HY_ENDING, True)
    _cut(_HY_VERB, False)
    _cut(_HY_ADJ, False)
    _cut(_HY_NOUN, False)
    return w


# --------------------------------------------------------------------------
# Nepali (NepaliStemmer.java; snowballstem.org) — ne/NepaliAnalyzer
# --------------------------------------------------------------------------

_NE_CAT1 = sorted(
    ["लाइ", "लाई", "सँग", "संग", "मार्फत", "रत", "का", "मा", "द्वारा",
     "कि", "पछि", "की", "ले", "कै", "सँगै", "मै", "को"],
    key=len, reverse=True,
)
_NE_CAT1_COND = frozenset(["का", "कि", "की", "कै", "को"])
_NE_CAT3 = sorted(
    ["थिए", "छ", "इछ", "एछ", "िछ", "ेछ", "नेछ", "हुनेछ", "इन्छ", "िन्छ",
     "हुन्छ", "एका", "इएका", "िएका", "ेका", "नेका", "दा", "इदा", "िदा",
     "देखि", "माथि", "एकी", "इएकी", "िएकी", "ेकी", "देखी", "थी", "दी",
     "छु", "एछु", "ेछु", "नेछु", "नु", "हरु", "हरू", "छे", "थे", "ने",
     "एकै", "ेकै", "नेकै", "दै", "इदै", "िदै", "एको", "इएको", "िएको",
     "ेको", "नेको", "दो", "इदो", "िदो", "यो", "इयो", "भयो", "ियो",
     "थियो", "दियो", "थ्यो", "छौ", "इछौ", "एछौ", "िछौ", "ेछौ", "नेछौ",
     "यौ", "थियौ", "छ्यौ", "थ्यौ", "छन्", "इछन्", "एछन्", "िछन्",
     "ेछन्", "नेछन्", "लान्", "छिन्", "थिन्", "पर्", "इस्", "थिइस्",
     "छस्", "इछस्", "एछस्", "िछस्", "ेछस्", "नेछस्", "िस्", "थिस्",
     "छेस्", "होस्"],
    key=len, reverse=True,
)


def nepali_stem(word: str) -> str:
    w = word
    # category 1: postpositions; का-family kept after ए / े
    for s in _NE_CAT1:
        if w.endswith(s):
            pre = w[: len(w) - len(s)]
            if s in _NE_CAT1_COND:
                if not (pre.endswith("ए") or pre.endswith("े")):
                    w = pre
            else:
                w = pre
            break
    # repeat: conditional nasal/ai trim (category 2), then the verb/TAM
    # suffix table (category 3); loop while category 3 keeps firing
    while True:
        if w.endswith("ँ") or w.endswith("ं"):
            pre = w[:-1]
            if pre.endswith(("यौ", "छौ", "नौ", "थे")):
                w = pre
        elif w.endswith("ै"):
            pre = w[:-1]
            if pre.endswith("त्र"):
                w = pre
        for s in _NE_CAT3:
            if w.endswith(s):
                w = w[: len(w) - len(s)]
                break
        else:
            break
    return w


class IrishStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [irish_stem(t) for t in tokens]


class ArmenianStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [armenian_stem(t) for t in tokens]


class NepaliStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [nepali_stem(t) for t in tokens]


register_analyzer(
    "irish",
    lambda: FilteredAnalyzer(StandardAnalyzer(), [IrishStemFilter()], "irish"),
)
register_analyzer(
    "armenian",
    lambda: FilteredAnalyzer(StandardAnalyzer(), [ArmenianStemFilter()], "armenian"),
)
register_analyzer(
    "nepali",
    lambda: FilteredAnalyzer(StandardAnalyzer(), [NepaliStemFilter()], "nepali"),
)


# --------------------------------------------------------------------------
# Lithuanian (LithuanianStemmer.java; snowballstem.org) — lt/
# LithuanianAnalyzer.java via SnowballFilter
# --------------------------------------------------------------------------

_LT_V = frozenset("aeiouyąėęįūų")

# inflectional endings (a_0): delete the longest one inside R1
_LT_STEP1 = sorted(
    ['a', 'ia', 'eria', 'osna', 'iosna', 'uosna', 'iuosna', 'ysna', 'ėsna',
     'e', 'ie', 'enie', 'erie', 'oje', 'ioje', 'uje', 'iuje', 'yje',
     'enyje', 'eryje', 'ėje', 'ame', 'iame', 'sime', 'ome', 'ėme',
     'tumėme', 'ose', 'iose', 'uose', 'iuose', 'yse', 'enyse', 'eryse',
     'ėse', 'ate', 'iate', 'ite', 'kite', 'site', 'ote', 'tute', 'ėte',
     'tumėte', 'i', 'ai', 'iai', 'eriai', 'ei', 'tumei', 'ki', 'imi',
     'erimi', 'umi', 'iumi', 'si', 'asi', 'iasi', 'esi', 'iesi', 'siesi',
     'isi', 'aisi', 'eisi', 'tumeisi', 'uisi', 'osi', 'ėjosi', 'uosi',
     'iuosi', 'siuosi', 'usi', 'ausi', 'čiausi', 'ąsi', 'ėsi', 'ųsi',
     'tųsi', 'ti', 'enti', 'inti', 'oti', 'ioti', 'uoti', 'iuoti', 'auti',
     'iauti', 'yti', 'ėti', 'telėti', 'inėti', 'terėti', 'ui', 'iui',
     'eniui', 'oj', 'ėj', 'k', 'am', 'iam', 'iem', 'im', 'sim', 'om',
     'tum', 'ėm', 'tumėm', 'an', 'on', 'ion', 'un', 'iun', 'ėn', 'o',
     'io', 'enio', 'ėjo', 'uo', 's', 'as', 'ias', 'es', 'ies', 'is',
     'ais', 'iais', 'tumeis', 'imis', 'enimis', 'omis', 'iomis', 'umis',
     'ėmis', 'enis', 'asis', 'ysis', 'ams', 'iams', 'iems', 'ims',
     'enims', 'erims', 'oms', 'ioms', 'ums', 'ėms', 'ens', 'os', 'ios',
     'uos', 'iuos', 'ers', 'us', 'aus', 'iaus', 'ius', 'ys', 'enys',
     'erys', 'ąs', 'iąs', 'ės', 'amės', 'iamės', 'imės', 'kimės',
     'simės', 'omės', 'ėmės', 'tumėmės', 'atės', 'iatės', 'sitės',
     'otės', 'ėtės', 'tumėtės', 'įs', 'ūs', 'tųs', 'at', 'iat', 'it',
     'sit', 'ot', 'ėt', 'tumėt', 'u', 'au', 'iau', 'čiau', 'iu', 'eniu',
     'siu', 'y', 'ą', 'ią', 'ė', 'ę', 'į', 'enį', 'erį', 'ų', 'ių',
     'erų'],
    key=len, reverse=True,
)
# derivational endings (a_1): deleted repeatedly inside R1
_LT_STEP2 = sorted(
    ['ing', 'aj', 'iaj', 'iej', 'oj', 'ioj', 'uoj', 'iuoj', 'auj', 'ąj',
     'iąj', 'ėj', 'ųj', 'iųj', 'ok', 'iok', 'iuk', 'uliuk', 'učiuk',
     'išk', 'iul', 'yl', 'ėl', 'am', 'dam', 'jam', 'zgan', 'ain', 'esn',
     'op', 'iop', 'ias', 'ies', 'ais', 'iais', 'os', 'ios', 'uos',
     'iuos', 'aus', 'iaus', 'ąs', 'iąs', 'ęs', 'utėait', 'ant', 'iant',
     'siant', 'int', 'ot', 'uot', 'iuot', 'yt', 'ėt', 'ykšt', 'iau',
     'dav', 'sv', 'šv', 'ykšč', 'ę', 'ėję'],
    key=len, reverse=True,
)
# conflict normalizations (a_2): suffix -> canonical replacement
_LT_CONFLICTS = [
    ("okatės", "okatė"), ("aitės", "aitė"), ("uotės", "uotė"),
    ("ojime", "ojimas"), ("ėjime", "ėjimas"), ("avime", "avimas"),
    ("okate", "okatė"), ("aite", "aitė"), ("uote", "uotė"),
    ("asius", "asys"), ("esiu", "esys"),
]


def lithuanian_stem(word: str) -> str:
    w = word
    n = len(w)
    # R1, with a one-letter skip for long a- prefixed words
    start = 1 if (w.startswith("a") and n > 6) else 0
    p1 = n
    i = start
    while i < n and w[i] not in _LT_V:
        i += 1
    if i < n:
        while i < n and w[i] in _LT_V:
            i += 1
        if i < n:
            p1 = i + 1

    # fix_conflicts (longest suffix, unrestricted)
    best = None
    for s, rep in _LT_CONFLICTS:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, rep)
    if best is not None:
        w = w[: len(w) - len(best[0])] + best[1]

    # step1: one longest inflectional ending inside R1
    for s in _LT_STEP1:
        if w.endswith(s) and len(w) - len(s) >= p1:
            w = w[: len(w) - len(s)]
            break

    def _chdz(x: str) -> str:
        if x.endswith("dž"):
            return x[:-2] + "d"
        if x.endswith("č"):
            return x[:-1] + "t"
        return x

    w = _chdz(w)
    # step2: repeatedly strip derivational endings inside R1
    while True:
        for s in _LT_STEP2:
            if w.endswith(s) and len(w) - len(s) >= p1:
                w = w[: len(w) - len(s)]
                break
        else:
            break
    w = _chdz(w)
    if w.endswith("gd"):
        w = w[:-1]
    return w


class LithuanianStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [lithuanian_stem(t) for t in tokens]


register_analyzer(
    "lithuanian",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [LithuanianStemFilter()], "lithuanian"
    ),
)
