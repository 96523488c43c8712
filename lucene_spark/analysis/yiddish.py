"""Snowball Yiddish stemmer (SURVEY.md §2.2 analysis zoo — snowball pack).

Reference contract: the generated
``analysis/common/src/java/org/tartarus/snowball/ext/YiddishStemmer.java``
— a mechanical compilation of the published Snowball Yiddish algorithm
(snowballstem.org/algorithms/yiddish; Assaf Urieli's design). The
Python below implements the published algorithm directly (prelude
digraph folding, GE/TSU prefix marking, R1 suffix ladders with the
irregular-verb restoration table), same idiom as snowball_multi.py,
and was verified DIFFERENTIALLY against the reference's compiled
YiddishStemmer over a synthesized stem x affix grid at development
time; curated goldens live in tests/test_yiddish.py.

Mechanics worth naming: the marker prefixes are written INTO the
working string as ASCII "GE"/"TSU" (exactly the reference's
slice_from) so suffix positions and R1 see them; they are stripped in
the final cleanup scan. I_p1 is an absolute index never adjusted by
later slices — the reference's I_p1 behaves identically.
"""

from __future__ import annotations

from lucene_spark.analysis.analyzer import StandardAnalyzer
from lucene_spark.analysis.filters import (
    FilteredAnalyzer,
    TokenFilter,
    register_analyzer,
)

__all__ = ["yiddish_stem", "YiddishStemFilter"]

_VOWELS = frozenset("אויעױײ")  # א ו י ע ױ ײ
# g_consonant (YiddishStemmer.java:209): 05D1-05EA minus the vowels
# ו/י/ע and the unassigned 05EB-05EF, plus װ; final forms included
_CONS = frozenset("בגדהזחטךכלםמןנסףפץצקרשתװ")
_NIKED = frozenset(
    chr(c) for c in list(range(0x05B0, 0x05B8))
    + [0x05B8, 0x05B9, 0x05BB, 0x05BC, 0x05BF, 0x05C1, 0x05C2]
)
_FINALS = {
    "ך": "כ", "ם": "מ", "ן": "נ",
    "ף": "פ", "ץ": "צ",
}

# irregular-verb restorations, shared by the ...ן/...ונג ladders
# (a_3 nested under a_4 var 3, and the standalone a_4 entries 5-31)
_IRREG = {
    "גאנג": "גײ",
    "נומ": "נעמ",
    "מיט": "מײד",
    "ביט": "בײט",
    "ביס": "בײס",
    "װיז": "װײז",
    "טריב": "טרײב",
    "ליט": "לײט",
    "קליב": "קלײב",
    "ריב": "רײב",
    "ריס": "רײס",
    "שװיג": "שװײג",
    "שמיס": "שמײס",
    "שניט": "שנײד",
    "שריב": "שרײב",
    "בונד": "בינד",
    "װוטש": "װיטש",
    "זונג": "זינג",
    "טרונק": "טרינק",
    "צװונג": "צװינג",
    "שלונג": "שלינג",
    "בױג": "בײג",
    "הױב": "הײב",
    "פארלױר": "פארליר",
    "שטאנ": "שטײ",
    "שװױר": "שװער",
}

# a_1: particle prefixes that may precede a GE/TSU marker
_PARTICLES = [
    "אדורכ", "אהינ",
    "אהער", "אהײמ",
    "אומ", "אונטער",
    "איבער", "אנ",
    "אנט", "אנטקעגנ",
    "אנידער", "אפ",
    "אפיר", "אקעגנ",
    "אראפ", "ארומ",
    "ארונטער",
    "אריבער", "ארױס",
    "ארױפ", "ארײנ",
    "אװעק", "אױס", "אױפ",
    "אײנ", "בא", "בײ",
    "דורכ", "דער",
    "מיט", "נאכ", "פאר",
    "פארבײ", "פארױס",
    "פונאנדער", "צו",
    "צוזאמענ",
    "צונױפ", "צוריק",
    "צע",
]

# a_2: onset clusters skipped before the 3-consonant test
_ONSETS = ["דזש", "שטר",
           "שטש", "שפר"]

_GE, _TSU = "GE", "TSU"


def _prelude(w: str) -> str:
    out = []
    i, n = 0, len(w)
    while i < n:
        c2 = w[i:i + 2]
        if c2 == "וו" and w[i + 2:i + 3] != "ּ":
            out.append("װ")
            i += 2
        elif c2 == "וי" and w[i + 2:i + 3] != "ִ":
            out.append("ױ")
            i += 2
        elif c2 == "יי" and w[i + 2:i + 3] != "ִ":
            out.append("ײ")
            i += 2
        else:
            out.append(_FINALS.get(w[i], w[i]))
            i += 1
    return "".join(c for c in out if c not in _NIKED)


def _mark_regions(w: str) -> tuple[str, int]:
    """-> (marked word, p1). GE/TSU markers are substituted into the
    string; p1 is an absolute index (never adjusted later)."""
    cur = 0
    # initial גע -> GE unless געלט/געבן
    if w.startswith("גע") and not (
        w[2:4] in ("לט", "בנ")
    ):
        w = _GE + w[2:]
        cur = 2
    # particle prefix, then GE/TSU marking after it
    best = None
    for p in _PARTICLES:
        if w.startswith(p, cur) and (best is None or len(p) > len(best)):
            best = p
    if best is not None:
        c2 = cur + len(best)
        rest = w[c2:]
        if rest in ("צוגנ", "צוקט",
                    "צוקנ"):
            cur = c2
        elif rest.startswith("געבנ"):
            cur = c2
        elif rest.startswith("גע"):
            w = w[:c2] + _GE + w[c2 + 2:]
            cur = c2 + 2
        elif rest.startswith("צו"):
            w = w[:c2] + _TSU + w[c2 + 2:]
            cur = c2 + 3
        # else: none of the four alternatives fired — the reference
        # abandons the whole particle block (cursor = v_4), so `cur`
        # stays at its pre-particle value
    p1 = len(w)
    if cur + 3 > len(w):
        return w, p1
    x = cur + 3
    for o in _ONSETS:
        if w.startswith(o, cur):
            cur += len(o)
            break
    # three consonants straight after the prefixes end the search
    if all(c in _CONS for c in w[cur:cur + 3]) and len(w) >= cur + 3:
        return w, cur + 3
    # gopast the first vowel, then past the vowel run
    i = cur
    while i < len(w) and w[i] not in _VOWELS:
        i += 1
    if i >= len(w):
        return w, p1
    while i < len(w) and w[i] in _VOWELS:
        i += 1
    p1 = max(i, x)
    return w, p1


def _longest(w: str, table) -> tuple[str, int] | None:
    best = None
    for s, v in table:
        if w.endswith(s) and (best is None or len(s) > len(best[0])):
            best = (s, v)
    return best


# a_4: the plural/inflection ladder (suffix, action id)
_A4 = [
    ("ונג", 1), ("סטו", 1), ("ט", 1),
    ("בראכט", 31), ("סט", 1),
    ("יסט", 33), ("עט", 1),
    ("שאפט", 1), ("הײט", 1),
    ("קײט", 1), ("יקײט", 1),
    ("לעכ", 1), ("עלעכ", 1),
    ("יזמ", 1), ("ימ", 1), ("עמ", 1),
    ("ענעמ", 3), ("טענעמ", 4),
    ("נ", 1),
    ("קליבנ", 14), ("ריבנ", 15),
    ("טריבנ", 12), ("שריבנ", 7),
    ("הױבנ", 27), ("שװיגנ", 17),
    ("זונגנ", 22),
    ("שלונגנ", 25),
    ("צװונגנ", 24),
    ("בױגנ", 26), ("בונדנ", 20),
    ("װיזנ", 11), ("טנ", 4),
    ("GEביטנ", 9), ("GEליטנ", 13),
    ("GEמיטנ", 8), ("שניטנ", 19),
    ("סטנ", 1), ("יסטנ", 1),
    ("עטנ", 1), ("GEביסנ", 10),
    ("שמיסנ", 18), ("GEריסנ", 16),
    ("ענ", 1), ("גאנגענ", 5),
    ("עלענ", 1), ("נומענ", 6),
    ("יזמענ", 1),
    ("שטאנענ", 29),
    ("טרונקנ", 23),
    ("פארלױרנ", 28),
    ("שװױרנ", 30), ("װוטשנ", 21),
    ("גײנ", 5),
    ("ס", 1), ("טס", 4), ("עטס", 1),
    ("נס", 1), ("טנס", 4), ("ענס", 3),
    ("עס", 1), ("יעס", 2), ("עלעס", 1),
    ("ערס", 1), ("ענערס", 1),
    ("ע", 1), ("טע", 4), ("סטע", 1),
    ("עטע", 1), ("יע", -1), ("עלע", 1),
    ("ענע", 3), ("טענע", 4),
    ("ער", 1), ("טער", 4), ("סטער", 1),
    ("עטער", 1), ("ענער", 3),
    ("טענער", 4), ("ות", 32),
]

# a_3: irregular stems exposed after dropping ...ען/ענס/ענע(ר|ם)
_A3 = sorted(_IRREG, key=len, reverse=True)

# a_5: noun-forming suffixes
_A5 = [
    ("ונג", 1), ("שאפט", 1),
    ("הײט", 1), ("קײט", 1),
    ("יקײט", 1), ("ל", 2),
]

# a_6: adjective suffixes (בליק/גליק are longest-match blockers)
_A6 = [
    ("יג", 1), ("יק", 1), ("דיק", 1),
    ("נדיק", 1), ("ענדיק", 1),
    ("בליק", -1), ("גליק", -1),
    ("ניק", 1), ("יש", 1),
]


def _standard_suffix(w: str, p1: int) -> str:
    def in_r1(word, suf):
        return len(word) - len(suf) >= p1

    # part 1: inflection ladder
    m = _longest(w, _A4)
    if m is not None:
        s, var = m
        head = w[: -len(s)] if s else w
        if var == 1:
            if in_r1(w, s):
                w = head
        elif var == 2:
            if in_r1(w, s):
                w = head + "יע"
        elif var == 3:
            if in_r1(w, s):
                w2 = head
                stem = _longest(w2, [(k, 1) for k in _A3])
                if stem is not None and _IRREG.get(stem[0]) is not None:
                    k = stem[0]
                    w = w2[: -len(k)] + _IRREG[k]
                else:
                    w = w2  # suffix removed; no irregular restoration
        elif var == 4:
            if in_r1(w, s):
                w2 = head
            else:
                w2 = head + "ט"
            # ...[גע]בראכ -> ...ברענג (the optional גע is consumed
            # INTO the replacement — YiddishStemmer.java:675-686)
            br = "בראכ"
            if w2.endswith(br):
                h2 = w2[: -len(br)]
                if h2.endswith("גע"):
                    h2 = h2[:-2]
                w = h2 + "ברענג"
            else:
                w = w2
        elif var == 31:
            w = head + "ברענג"
        elif var == 32:
            if in_r1(w, s):
                w = head + "ה"
        elif var == 33:
            if head.endswith("ג") or head.endswith("ש"):
                # R1plus3 measured AFTER consuming the ג/ש context
                # (cursor = bra - 1): p1 <= len(w) - len(s) - 1 + 3
                if len(w) - len(s) + 2 >= p1:
                    w = head + "יס"
            elif in_r1(w, s):
                w = head
        elif var > 4:
            # standalone irregular restorations (actions 5-30)
            rep = {
                5: "גײ", 6: "נעמ",
                7: "שרײב", 8: "מײד",
                9: "בײט", 10: "בײס",
                11: "װײז", 12: "טרײב",
                13: "לײט", 14: "קלײב",
                15: "רײב", 16: "רײס",
                17: "שװײג", 18: "שמײס",
                19: "שנײד", 20: "בינד",
                21: "װיטש", 22: "זינג",
                23: "טרינק",
                24: "צװינג",
                25: "שלינג", 26: "בײג",
                27: "הײב",
                28: "פארליר",
                29: "שטײ", 30: "שװער",
            }[var]
            w = head + rep
        # var == -1: longest-match blocker, no action
    # part 2: noun-forming suffixes
    m = _longest(w, _A5)
    if m is not None:
        s, var = m
        if var == 1:
            if in_r1(w, s):
                w = w[: -len(s)]
        else:  # ל after a consonant
            head = w[: -len(s)]
            if in_r1(w, s) and head and head[-1] in _CONS:
                w = head
    # part 3: adjective suffixes
    m = _longest(w, _A6)
    if m is not None:
        s, var = m
        if var == 1 and in_r1(w, s):
            w = w[: -len(s)]
    # part 4: strip every GE/TSU marker
    w = w.replace(_TSU, "").replace(_GE, "")
    return w


def yiddish_stem(word: str) -> str:
    w = _prelude(word)
    w, p1 = _mark_regions(w)
    return _standard_suffix(w, p1)


class YiddishStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [yiddish_stem(t) for t in tokens]


register_analyzer(
    "yiddish",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [YiddishStemFilter()], "yiddish"
    ),
)
