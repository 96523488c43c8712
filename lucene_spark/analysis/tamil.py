"""Snowball Tamil stemmer (SURVEY.md §2.2 analysis zoo — snowball pack).

Reference contract: the generated
``analysis/common/src/java/org/tartarus/snowball/ext/TamilStemmer.java``
(used by ``analysis/common/.../ta/TamilAnalyzer.java`` via
SnowballFilter) — a mechanical compilation of the published Snowball
Tamil algorithm (snowballstem.org/algorithms/tamil; Damodharan &
Rajendran's design). The Python below implements the published
algorithm directly as prefix/suffix ladders over Unicode Tamil
(same idiom as snowball_multi.py — no snowball-VM emulation), and was
verified DIFFERENTIALLY against the reference's compiled TamilStemmer
over a synthesized stem x suffix grid at development time; curated
goldens live in tests/test_tamil.py.

SnowballFilter semantics kept: ``stem()`` returns false for words of
length <= 4 (after the initial ending fix), in which case the filter
leaves the token untouched.
"""

from __future__ import annotations

from lucene_spark.analysis.analyzer import StandardAnalyzer
from lucene_spark.analysis.filters import (
    FilteredAnalyzer,
    TokenFilter,
    register_analyzer,
)

__all__ = ["tamil_stem", "TamilStemFilter"]

# -- Tamil code points ------------------------------------------------------

_A, _AA, _I, _II, _U, _UU = "அ", "ஆ", "இ", "ஈ", "உ", "ஊ"
_E, _EE, _AI, _O, _OO, _AU = "எ", "ஏ", "ஐ", "ஒ", "ஓ", "ஔ"
_KA, _NGA, _CA, _NYA, _TTA, _NNA = "க", "ங", "ச", "ஞ", "ட", "ண"
_TA, _NA, _NNNA, _PA, _MA, _YA = "த", "ந", "ன", "ப", "ம", "ய"
_RA, _RRA, _LA, _LLA, _LLLA, _VA = "ர", "ற", "ல", "ள", "ழ", "வ"
_SAA, _SI, _SII, _SU, _SUU = "ா", "ி", "ீ", "ு", "ூ"
_SE, _SEE, _SAI, _SO, _SOO = "ெ", "ே", "ை", "ொ", "ோ"
_PUL = "்"  # pulli (virama)

# single consonants used by the prefix rules
_CONS = (_KA, _NGA, _CA, _NYA, _TA, _NA, _PA, _MA, _YA, _VA)          # a_1/a_11
_HARD = (_KA, _CA, _TTA, _TA, _PA, _RRA)                              # a_6/a_7/a_12/a_21/a_22
_SOFT = (_NYA, _NNA, _NA, _NNNA, _MA, _YA, _RA, _LA, _LLA, _LLLA, _VA)  # a_8
_VSIGNS8 = (_SAA, _SI, _SII, _SU, _SUU, _SE, _SEE, _SAI)              # a_3/a_16/a_18/a_19/a_24
_VSIGNS9 = _VSIGNS8 + (_PUL,)                                         # a_9
_INDEP_V = (_A, _AA, _I, _II, _U, _UU, _E, _EE, _AI, _O, _OO, _AU)    # a_23


def _longest(w: str, suffixes) -> str | None:
    """Longest entry of `suffixes` that w ends with (the find_among_b
    longest-match contract)."""
    best = None
    for s in suffixes:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


def _ends_any(w: str, items) -> bool:
    return any(w.endswith(s) for s in items)


def _fix_va_start(w: str) -> str:
    for pre, rep in ((_VA + _SOO, _OO), (_VA + _SO, _O),
                     (_VA + _SU, _U), (_VA + _SUU, _UU)):
        if w.startswith(pre):
            return rep + w[2:]
    return w


def _fix_ending(w: str, vetrumai: bool = False) -> tuple[str, bool]:
    """r_fix_ending: one backward ending repair; False when nothing
    applied (drives the r_fix_endings repeat-until-fail loop).
    `vetrumai` is the B_found_vetrumai_urupu flag the த்த் case
    consults — it persists across routines within one stem() run."""
    if len(w) <= 3:
        return w, False
    # ladder A (a_5), longest suffix first
    a5 = {
        _NA + _PUL + _TA: 1, _YA: 1, _VA: 1, _NNNA + _SU: 8,
        _SU + _KA + _PUL: 7, _SU + _KA + _PUL + _KA + _PUL: 7,
        _TTA + _PUL + _KA + _PUL: 3, _RRA + _PUL + _KA + _PUL: 4,
        _NGA + _PUL: 9, _TTA + _PUL + _TTA + _PUL: 5,
        _TA + _PUL + _TA + _PUL: 6, _NA + _PUL + _TA + _PUL: 1,
        _NA + _PUL: 1, _TTA + _PUL + _PA + _PUL: 3, _YA + _PUL: 2,
        _NNNA + _PUL + _RRA + _PUL: 4, _VA + _PUL: 1,
    }
    s = _longest(w, a5)
    if s is not None:
        var, head = a5[s], w[: -len(s)]
        if var == 1:
            return head, True
        if var == 2:  # ய் only after ி/ீ/ை
            if _ends_any(head, (_SI, _SII, _SAI)):
                return head, True
        elif var == 3:
            return head + _LLA + _PUL, True
        elif var == 4:
            return head + _LA + _PUL, True
        elif var == 5:
            return head + _TTA + _SU, True
        elif var == 6:  # த்த் under vetrumai flag, not after ை
            if vetrumai and not head.endswith(_SAI):
                return head + _MA + _PUL, True
        elif var == 7:
            return head + _PUL, True
        elif var == 8:  # னு not after a vowel sign
            if not _ends_any(head, _VSIGNS8):
                return head, True
        elif var == 9:  # ங் -> drop after ை/், else -> ம்
            if head.endswith(_SAI) or head.endswith(_PUL):
                return head, True
            return head + _MA + _PUL, True
        # context check failed: fall through to the pulli ladder? No —
        # the reference restarts at the pulli ladder on ladder-A
        # context failure (lab1 break), so continue below.
    # ladder B: final pulli repairs
    if not w.endswith(_PUL):
        return w, False
    head = w[:-1]
    # hard consonant (+ optional ் + hard consonant) before the pulli
    if head and head[-1] in _HARD:
        h2 = head[:-1]
        if len(h2) >= 2 and h2[-1] == _PUL and h2[-2] in _HARD:
            return h2[:-2], True
        return h2, True
    # soft consonant requiring a pulli before it: drop consonant+pulli
    if head and head[-1] in _SOFT and head[:-1].endswith(_PUL):
        return head[:-1], True
    # vowel sign (or pulli) before the final pulli: drop the pulli
    if head and head[-1] in _VSIGNS9:
        return head, True
    return w, False


def _fix_endings(w: str, vetrumai: bool = False) -> str:
    while True:
        w2, ok = _fix_ending(w, vetrumai)
        if not ok:
            return w
        w = w2


def _remove_question_prefixes(w: str) -> str:
    if (
        len(w) >= 3
        and w[0] == _E
        and w[1] in _CONS
        and w[2] == _PUL
    ):
        return _fix_va_start(w[3:])
    return w


def _remove_pronoun_prefixes(w: str) -> str:
    if (
        len(w) >= 3
        and w[0] in (_A, _I, _U)
        and w[1] in _CONS
        and w[2] == _PUL
    ):
        return _fix_va_start(w[3:])
    return w


def _remove_plural_suffix(w: str) -> str:
    a13 = {
        _KA + _LLA + _PUL: 4,
        _SU + _NGA + _PUL + _KA + _LLA + _PUL: 1,
        _TTA + _PUL + _KA + _LLA + _PUL: 3,
        _RRA + _PUL + _KA + _LLA + _PUL: 2,
    }
    s = _longest(w, a13)
    if s is None:
        return w
    var, head = a13[s], w[: -len(s)]
    if var == 1:
        if head and head[-1] in _HARD:
            return head + _SU + _NGA + _PUL
        return head + _PUL
    if var == 2:
        return head + _LA + _PUL
    if var == 3:
        return head + _LLA + _PUL
    return head


def _remove_question_suffixes(w: str) -> str:
    # the ending fix runs whether or not a question particle matched
    # (TamilStemmer.java:625-645 calls r_fix_endings unconditionally)
    if len(w) <= 4:
        return w
    if w[-1] in (_SAA, _SEE, _SOO):
        w = w[:-1] + _PUL
    return _fix_endings(w)


def _remove_command_suffixes(w: str) -> str:
    if len(w) > 4 and (w.endswith(_PA + _SI) or w.endswith(_VA + _SI)):
        return w[:-2]
    return w


def _remove_um(w: str) -> str:
    if len(w) > 4 and w.endswith(_SU + _MA + _PUL):
        w = w[:-3] + _PUL
        w2, _ok = _fix_ending(w)
        return w2
    return w


def _remove_common_word_endings(w: str) -> tuple[str, bool]:
    if len(w) <= 4:
        return w, False  # noqa: E501 — min-length bail, no ending fix
    a17 = {
        _PA + _TTA + _PUL + _TTA: 3,
        _PA + _TTA + _PUL + _TTA + _NNA: 3,
        _TA + _SAA + _NNNA: 3,
        _PA + _TTA + _SI + _TA + _SAA + _NNNA: 3,
        _SE + _NNNA: 1,
        _SAA + _KA + _SI + _YA: 1,
        _KA + _SU + _RA + _SI + _YA: 3,
        _SU + _TTA + _SAI + _YA: 1,
        _LA + _PUL + _LA: 2,
        _SU + _LLA + _PUL + _LLA: 1,
        _SAA + _KA + _SI: 1,
        _PA + _TTA + _SI: 3,
        _SI + _NNNA + _PUL + _RRA + _SI: 1,
        _PA + _RRA + _PUL + _RRA + _SI: 3,
        _PA + _TTA + _SU: 3,
        _VA + _SI + _TTA + _SU: 3,
        _PA + _TTA + _PUL + _TTA + _SU: 3,
        _VA + _SI + _TTA + _PUL + _TTA + _SU: 3,
        _PA + _TTA + _PUL + _TTA + _TA + _SU: 3,
        _SE + _NNNA + _PUL + _RRA + _SU: 1,
        _SU + _TTA + _SAI: 1,
        _SI + _LA + _PUL + _LA + _SAI: 1,
        _SU + _TTA + _NNNA + _PUL: 1,
        _SI + _TTA + _MA + _PUL: 1,
        _SE + _LA + _PUL + _LA + _SAA + _MA + _PUL: 3,
        _SE + _NNNA + _SU + _MA + _PUL: 1,
    }
    s = _longest(w, a17)
    if s is None:
        return w, False
    var, head = a17[s], w[: -len(s)]
    if var == 1:
        out = head + _PUL
    elif var == 2:
        if _ends_any(head, _VSIGNS8):
            return w, False
        out = head + _PUL
    else:
        out = head
    return _fix_endings(out), True


def _remove_vetrumai_urupukal(w: str) -> tuple[str, bool]:
    """-> (word, vetrumai flag) — the flag survives the rest of the
    stem() run (the த்த் fix-ending case reads it)."""
    if len(w) <= 4:
        return w, False
    a20 = {
        _VA + _SI + _TTA: 2,
        _SII: 7,
        _SO + _TTA + _SU: 2,
        _SOO + _TTA + _SU: 2,
        _TA + _SU: 6,
        _SI + _RA + _SU + _NA + _PUL + _TA + _SU: 2,
        _SI + _NNNA + _PUL + _RRA + _SU: 2,
        _SU + _TTA + _SAI: 2,
        _NNNA + _SAI: 1,
        _KA + _NNA + _PUL: 1,
        _SI + _NNNA + _PUL: 3,
        _MA + _SU + _NNNA + _PUL: 1,
        _SI + _TTA + _MA + _PUL: 4,
        _SI + _RRA + _PUL: 2,
        _MA + _SEE + _RRA + _PUL: 1,
        _LA + _PUL: 5,
        _SAA + _MA + _LA + _PUL: 2,
        _SAA + _LA + _PUL: 2,
        _SI + _LA + _PUL: 2,
        _MA + _SEE + _LA + _PUL: 1,
        _SU + _LLA + _PUL: 2,
        _KA + _SII + _LLLA + _PUL: 1,
    }
    matched = False
    out = w
    s = _longest(w, a20)
    if s is not None:
        var, head = a20[s], w[: -len(s)]
        if var == 1:
            out, matched = head, True
        elif var == 2:
            out, matched = head + _PUL, True
        elif var == 3:
            if not head.endswith(_MA):
                out, matched = head + _PUL, True
        elif var == 4:
            if len(w) >= 7:
                out, matched = head + _PUL, True
        elif var == 5:
            if not _ends_any(head, _VSIGNS8):
                out, matched = head + _PUL, True
        elif var == 6:
            if not _ends_any(head, _VSIGNS8):
                out, matched = head, True
        elif var == 7:
            out, matched = head + _SI, True
    if not matched:
        # the ை alternative
        if not w.endswith(_SAI):
            return w, False
        head = w[:-1]
        ok = not (head and head[-1] in _HARD)
        if not ok:
            # ...் C ை with C hard is still allowed
            ok = (
                len(head) >= 2
                and head[-1] in _HARD
                and head[-2] == _PUL
            )
        if not ok:
            return w, False
        out, matched = head + _PUL, True
    if out.endswith(_SI + _NNNA + _PUL):
        out = out[:-3] + _PUL
    return _fix_endings(out, vetrumai=True), True


def _remove_tense_suffix(w: str, vetrumai: bool) -> tuple[str, bool]:
    """One pass of r_remove_tense_suffix; bool = found a match."""
    found = False
    if len(w) <= 4:
        return w, False
    a25 = {
        _KA: 1, _TA: 1, _NNNA: 1, _PA: 1, _YA: 1,
        _SAA: 5,
        _KA + _SU: 6,
        _PA + _TTA + _SU: 1,
        _TA + _SU: 3,
        _SI + _RRA + _PUL + _RRA + _SU: 1,
        _NNNA + _SAI: 1,
        _VA + _SAI: 1,
        _NNNA + _NNNA + _PUL: 1,
        _PA + _NNNA + _PUL: 1,
        _VA + _NNNA + _PUL: 2,
        _SAA + _NNNA + _PUL: 4,
        _NNNA + _SAA + _NNNA + _PUL: 1,
        _MA + _SI + _NNNA + _PUL: 1,
        _NNNA + _SE + _NNNA + _PUL: 1,
        _SEE + _NNNA + _PUL: 5,
        _NNNA + _MA + _PUL: 1,
        _PA + _MA + _PUL: 1,
        _SAA + _MA + _PUL: 5,
        _KA + _SU + _MA + _PUL: 1,
        _TTA + _SU + _MA + _PUL: 5,
        _TA + _SU + _MA + _PUL: 1,
        _RRA + _SU + _MA + _PUL: 1,
        _SE + _MA + _PUL: 5,
        _SEE + _MA + _PUL: 5,
        _SOO + _MA + _PUL: 5,
        _SAA + _YA + _PUL: 5,
        _NNNA + _RA + _PUL: 1,
        _PA + _RA + _PUL: 1,
        _SII + _YA + _RA + _PUL: 5,
        _VA + _RA + _PUL: 1,
        _SAA + _RA + _PUL: 5,
        _NNNA + _SAA + _RA + _PUL: 1,
        _MA + _SAA + _RA + _PUL: 1,
        _KA + _SO + _NNA + _PUL + _TTA + _SI + _RA + _PUL: 1,
        _NNNA + _SI + _RA + _PUL: 5,
        _SII + _RA + _PUL: 5,
        _NNNA + _LLA + _PUL: 1,
        _PA + _LLA + _PUL: 1,
        _VA + _LLA + _PUL: 1,
        _SAA + _LLA + _PUL: 5,
        _NNNA + _SAA + _LLA + _PUL: 1,
    }
    s = _longest(w, a25)
    if s is not None:
        var, head = a25[s], w[: -len(s)]
        if var == 1:
            w, found = head, True
        elif var == 2:
            if not (head and head[-1] in _INDEP_V):
                w, found = head, True
        elif var == 3:
            if not _ends_any(head, _VSIGNS8):
                w, found = head, True
        elif var == 4:
            if not head.endswith(_CA):
                w, found = head + _PUL, True
        elif var == 5:
            w, found = head + _PUL, True
        elif var == 6:
            if head.endswith(_PUL):
                w, found = head, True
    a26 = (
        _KA + _SI + _RRA,
        _KA + _SI + _NNNA + _PUL + _RRA,
        _SAA + _NA + _SI + _NNNA + _PUL + _RRA,
        _KA + _SI + _RRA + _PUL,
        _KA + _SI + _NNNA + _PUL + _RRA + _PUL,
        _SAA + _NA + _SI + _NNNA + _PUL + _RRA + _PUL,
    )
    s2 = _longest(w, a26)
    if s2 is not None:
        w, found = w[: -len(s2)], True
    return _fix_endings(w, vetrumai), found


def _stem_program(word: str) -> tuple[str, bool]:
    """stem() (TamilStemmer.java:977-1023): the routine pipeline.
    Returns (current, stemmed?) — stemmed? False mirrors the
    has_min_length bail, after which SnowballFilter keeps the
    original token."""
    w, _ = _fix_ending(word)
    if len(w) <= 4:
        return w, False
    w = _remove_question_prefixes(w)
    w = _remove_pronoun_prefixes(w)
    w = _remove_question_suffixes(w)
    w = _remove_um(w)
    w, _ = _remove_common_word_endings(w)
    w, vetrumai = _remove_vetrumai_urupukal(w)
    w = _remove_plural_suffix(w)
    w = _remove_command_suffixes(w)
    found = True
    while found:
        w, found = _remove_tense_suffix(w, vetrumai)
    return w, True


def tamil_stem(word: str) -> str:
    # SnowballFilter takes getCurrent() regardless of stem()'s return
    # (SnowballFilter.java:96-102), so the modified buffer IS the token
    # even when the min-length bail fired after the initial ending fix
    return _stem_program(word)[0]


class TamilStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [tamil_stem(t) for t in tokens]


register_analyzer(
    "tamil",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [TamilStemFilter()], "tamil"
    ),
)
