"""Snowball Turkish stemmer (SURVEY.md §2.2 analysis zoo — snowball pack).

Reference contract: the generated
``analysis/common/src/java/org/tartarus/snowball/ext/TurkishStemmer.java``
(used by ``tr/TurkishAnalyzer.java`` via SnowballFilter) — a mechanical
compilation of the published Snowball Turkish algorithm
(snowballstem.org/algorithms/turkish; Evren (Kapusuz) Çilden's design).

The algorithm is a backward cursor machine: suffix MARK routines
consume material (vowel-harmony-checked, with optional buffer
consonants n/s/y and optional high vowel U), and the nominal-verb /
noun-suffix state machines slice the consumed region. Saves/restores
are END-relative distances, so this module keeps that exact mechanic
in a tiny state helper (`_S`) and expresses each routine as structured
Python — an independent reimplementation of the published semantics,
verified DIFFERENTIALLY against the reference's compiled
TurkishStemmer over a synthesized stem x suffix-chain grid at
development time (curated goldens in tests/test_turkish_stem.py).

SnowballFilter semantics kept: stem() returns false (token unchanged)
for words with fewer than two syllables or the reserved word ad/soyad.
"""

from __future__ import annotations

from lucene_spark.analysis.analyzer import StandardAnalyzer
from lucene_spark.analysis.filters import (
    FilteredAnalyzer,
    TokenFilter,
    register_analyzer,
)

__all__ = ["turkish_stem", "TurkishStemFilter"]

_V = frozenset("aeıioöuü")          # g_vowel
_U = frozenset("ıiuü")              # g_U (high vowels)
_HARM = {                            # vowel-harmony classes
    "a": frozenset("aıou"),          # g_vowel1
    "e": frozenset("eiöü"),          # g_vowel2
    "ı": frozenset("aı"),            # g_vowel3
    "i": frozenset("ei"),            # g_vowel4
    "o": frozenset("ou"),            # g_vowel5
    "u": frozenset("ou"),            # g_vowel5
    "ö": frozenset("öü"),            # g_vowel6
    "ü": frozenset("öü"),            # g_vowel6
}


class _S:
    """Backward snowball cursor: `c` is the cursor index, the consumed
    suffix is w[c:ket]; slices remove/replace [bra:ket]. Saves are
    END-relative distances — the reference's limit-cursor arithmetic."""

    __slots__ = ("w", "c", "ket", "bra")

    def __init__(self, w: str):
        self.w = w
        self.c = len(w)
        self.ket = len(w)
        self.bra = len(w)

    def save(self) -> int:
        return len(self.w) - self.c

    def restore(self, v: int) -> None:
        self.c = len(self.w) - v

    def eq_b(self, s: str) -> bool:
        if self.w[: self.c].endswith(s):
            self.c -= len(s)
            return True
        return False

    def among_b(self, table) -> bool:
        best = None
        head = self.w[: self.c]
        for s in table:
            if head.endswith(s) and (best is None or len(s) > len(best)):
                best = s
        if best is None:
            return False
        self.c -= len(best)
        return True

    def grp_b(self, charset) -> bool:
        if self.c > 0 and self.w[self.c - 1] in charset:
            self.c -= 1
            return True
        return False

    def out_grp_b(self, charset) -> bool:
        if self.c > 0 and self.w[self.c - 1] not in charset:
            self.c -= 1
            return True
        return False

    def set_ket(self) -> None:
        self.ket = self.c

    def slice_del(self) -> None:
        self.w = self.w[: self.c] + self.w[self.ket:]
        self.ket = self.c

    def slice_from(self, rep: str) -> None:
        self.w = self.w[: self.c] + rep + self.w[self.ket:]
        self.ket = self.c  # cursor stays before the replacement


# -- vowel harmony + optional-letter markers --------------------------------


def _check_vowel_harmony(s: _S) -> bool:
    v1 = s.save()
    # go back to the last vowel of the tail
    i = s.c
    while i > 0 and s.w[i - 1] not in _V:
        i -= 1
    if i == 0:
        return False
    last = s.w[i - 1]
    # require a harmony-compatible vowel further back
    grp = _HARM[last]
    j = i - 1
    while j > 0 and s.w[j - 1] not in grp:
        j -= 1
    s.restore(v1)
    return j > 0


def _opt_letter(s: _S, letter: str) -> bool:
    """mark_suffix_with_optional_{n,s,y}_consonant: consume the letter
    when a vowel precedes it; otherwise require (vowel, any-char)
    before the cursor without consuming."""
    if s.c >= 1 and s.w[s.c - 1] == letter:
        if s.c >= 2 and s.w[s.c - 2] in _V:
            s.c -= 1
            return True
        return False
    return s.c >= 2 and s.w[s.c - 2] in _V


def _opt_U(s: _S) -> bool:
    """mark_suffix_with_optional_U_vowel: consume a high vowel when a
    non-vowel precedes it; otherwise require (non-vowel, any-char)."""
    if s.c >= 1 and s.w[s.c - 1] in _U:
        if s.c >= 2 and s.w[s.c - 2] not in _V:
            s.c -= 1
            return True
        return False
    return s.c >= 2 and s.w[s.c - 2] not in _V


def _guard(fn):
    """Run a mark attempt; restore the cursor when it fails."""
    def run(s: _S) -> bool:
        v = s.save()
        if fn(s):
            return True
        s.restore(v)
        return False
    return run


# -- mark routines (each consumes its suffix on success) --------------------

_A0 = ["m", "n", "miz", "niz", "muz", "nuz", "müz", "nüz", "mız", "nız"]
_A2 = ["ni", "nu", "nü", "nı"]
_A3 = ["in", "un", "ün", "ın"]
_A6 = ["da", "ta", "de", "te"]
_A8 = ["dan", "tan", "den", "ten"]
_A12 = ["im", "um", "üm", "ım"]
_A13 = ["sin", "sun", "sün", "sın"]
_A14 = ["iz", "uz", "üz", "ız"]
_A15 = ["siniz", "sunuz", "sünüz", "sınız"]
_A17 = ["niz", "nuz", "nüz", "nız"]
_A18 = ["dir", "tir", "dur", "tur", "dür", "tür", "dır", "tır"]
_A20 = [d + v for d in "dt" for v in ["i", "ik", "im", "in", "u", "ü", "ı"]] \
    + [d + v for d in "dt" for v in ["uk", "ük", "ık", "um", "üm", "ım",
                                     "un", "ün", "ın"]]
_A21 = ["sa", "se", "sak", "sek", "sam", "sem", "san", "sen"]
_A22 = ["miş", "muş", "müş", "mış"]


@_guard
def _mark_possessives(s):
    return s.among_b(_A0) and _opt_U(s)


@_guard
def _mark_sU(s):
    return _check_vowel_harmony(s) and s.grp_b(_U) and _opt_letter(s, "s")


@_guard
def _mark_lArI(s):
    return s.among_b(["leri", "ları"])


@_guard
def _mark_yU(s):
    return _check_vowel_harmony(s) and s.grp_b(_U) and _opt_letter(s, "y")


@_guard
def _mark_nU(s):
    return _check_vowel_harmony(s) and s.among_b(_A2)


@_guard
def _mark_nUn(s):
    return (_check_vowel_harmony(s) and s.among_b(_A3)
            and _opt_letter(s, "n"))


@_guard
def _mark_yA(s):
    return (_check_vowel_harmony(s) and s.among_b(["a", "e"])
            and _opt_letter(s, "y"))


@_guard
def _mark_nA(s):
    return _check_vowel_harmony(s) and s.among_b(["na", "ne"])


@_guard
def _mark_DA(s):
    return _check_vowel_harmony(s) and s.among_b(_A6)


@_guard
def _mark_ndA(s):
    return _check_vowel_harmony(s) and s.among_b(["nda", "nde"])


@_guard
def _mark_DAn(s):
    return _check_vowel_harmony(s) and s.among_b(_A8)


@_guard
def _mark_ndAn(s):
    return _check_vowel_harmony(s) and s.among_b(["ndan", "nden"])


@_guard
def _mark_ylA(s):
    return (_check_vowel_harmony(s) and s.among_b(["la", "le"])
            and _opt_letter(s, "y"))


@_guard
def _mark_ki(s):
    return s.eq_b("ki")


@_guard
def _mark_ncA(s):
    return (_check_vowel_harmony(s) and s.among_b(["ca", "ce"])
            and _opt_letter(s, "n"))


@_guard
def _mark_yUm(s):
    return (_check_vowel_harmony(s) and s.among_b(_A12)
            and _opt_letter(s, "y"))


@_guard
def _mark_sUn(s):
    return _check_vowel_harmony(s) and s.among_b(_A13)


@_guard
def _mark_yUz(s):
    return (_check_vowel_harmony(s) and s.among_b(_A14)
            and _opt_letter(s, "y"))


@_guard
def _mark_sUnUz(s):
    return s.among_b(_A15)


@_guard
def _mark_lAr(s):
    return _check_vowel_harmony(s) and s.among_b(["lar", "ler"])


@_guard
def _mark_nUz(s):
    return _check_vowel_harmony(s) and s.among_b(_A17)


@_guard
def _mark_DUr(s):
    return _check_vowel_harmony(s) and s.among_b(_A18)


@_guard
def _mark_cAsInA(s):
    return s.among_b(["casına", "cesine"])


@_guard
def _mark_yDU(s):
    return (_check_vowel_harmony(s) and s.among_b(_A20)
            and _opt_letter(s, "y"))


@_guard
def _mark_ysA(s):
    return s.among_b(_A21) and _opt_letter(s, "y")


@_guard
def _mark_ymUs(s):
    return (_check_vowel_harmony(s) and s.among_b(_A22)
            and _opt_letter(s, "y"))


@_guard
def _mark_yken(s):
    return s.eq_b("ken") and _opt_letter(s, "y")


# -- suffix state machines --------------------------------------------------


def _stem_nominal_verb_suffixes(s: _S) -> tuple[bool, bool]:
    """-> (matched, continue_stemming_noun_suffixes)."""
    s.set_ket()
    cont = True
    v1 = s.save()
    while True:  # single-shot 'or' ladder, each arm via break
        # (ymUs | yDU | ysA | yken)
        if _mark_ymUs(s) or _mark_yDU(s) or _mark_ysA(s) or _mark_yken(s):
            break
        s.restore(v1)
        # cAsInA (sUnUz|lAr|yUm|sUn|yUz|<nothing>) ymUs
        def casina(s):
            if not _mark_cAsInA(s):
                return False
            v3 = s.save()
            if not (_mark_sUnUz(s) or _mark_lAr(s) or _mark_yUm(s)
                    or _mark_sUn(s) or _mark_yUz(s)):
                s.restore(v3)
            return _mark_ymUs(s)
        if _guard(casina)(s):
            break
        s.restore(v1)
        # lAr -> del, then optional (DUr|yDU|ysA|ymUs); stops noun pass
        if _mark_lAr(s):
            s.slice_del()
            v4 = s.save()
            s.set_ket()
            if not (_mark_DUr(s) or _mark_yDU(s) or _mark_ysA(s)
                    or _mark_ymUs(s)):
                s.restore(v4)
            cont = False
            break
        s.restore(v1)
        # nUz (yDU|ysA)
        def nuz(s):
            return _mark_nUz(s) and (_mark_yDU(s) or _mark_ysA(s))
        if _guard(nuz)(s):
            break
        s.restore(v1)
        # (sUnUz|yUz|sUn|yUm) -> del, then optional ymUs
        if _mark_sUnUz(s) or _mark_yUz(s) or _mark_sUn(s) or _mark_yUm(s):
            s.slice_del()
            v8 = s.save()
            s.set_ket()
            if not _mark_ymUs(s):
                s.restore(v8)
            break
        s.restore(v1)
        # DUr -> del, then optional (sUnUz|lAr|yUm|sUn|yUz|<>) ymUs
        if not _mark_DUr(s):
            return False, cont
        s.slice_del()
        v9 = s.save()
        s.set_ket()

        def tail(s):
            v10 = s.save()
            if not (_mark_sUnUz(s) or _mark_lAr(s) or _mark_yUm(s)
                    or _mark_sUn(s) or _mark_yUz(s)):
                s.restore(v10)
            return _mark_ymUs(s)
        if not _guard(tail)(s):
            s.restore(v9)
        break
    s.slice_del()
    return True, cont


def _stem_suffix_chain_before_ki(s: _S) -> bool:
    s.set_ket()
    if not _mark_ki(s):
        return False
    v1 = s.save()
    # DA branch
    if _mark_DA(s):
        s.slice_del()
        v2 = s.save()
        s.set_ket()
        if _mark_lAr(s):
            s.slice_del()
            v4 = s.save()
            if not _stem_suffix_chain_before_ki(s):
                s.restore(v4)
        elif _mark_possessives(s):
            s.slice_del()
            v5 = s.save()
            s.set_ket()
            if _mark_lAr(s):
                s.slice_del()
                if not _stem_suffix_chain_before_ki(s):
                    s.restore(v5)
            else:
                s.restore(v5)
        else:
            s.restore(v2)
        return True
    s.restore(v1)
    # nUn branch
    if _mark_nUn(s):
        s.slice_del()
        v6 = s.save()
        s.set_ket()
        if _mark_lArI(s):
            s.slice_del()
        else:
            def poss_su(s2):
                s2.set_ket()
                if not (_mark_possessives(s2) or _mark_sU(s2)):
                    return False
                s2.slice_del()
                v9 = s2.save()
                s2.set_ket()
                if _mark_lAr(s2):
                    s2.slice_del()
                    if not _stem_suffix_chain_before_ki(s2):
                        s2.restore(v9)
                else:
                    s2.restore(v9)
                return True
            if _guard(poss_su)(s):
                pass
            elif _stem_suffix_chain_before_ki(s):
                pass
            else:
                s.restore(v6)
        return True
    s.restore(v1)
    # ndA branch
    if _mark_ndA(s):
        if _mark_lArI(s):
            s.slice_del()
            return True
        v10 = s.save()
        if _mark_sU(s):
            s.slice_del()
            v11 = s.save()
            s.set_ket()
            if _mark_lAr(s):
                s.slice_del()
                if not _stem_suffix_chain_before_ki(s):
                    s.restore(v11)
            else:
                s.restore(v11)
            return True
        s.restore(v10)
        return _stem_suffix_chain_before_ki(s)
    return False


def _stem_noun_suffixes(s: _S) -> bool:
    v1 = s.save()
    # lAr -> del, optional ki-chain
    s.set_ket()
    if _mark_lAr(s):
        s.slice_del()
        v2 = s.save()
        if not _stem_suffix_chain_before_ki(s):
            s.restore(v2)
        return True
    s.restore(v1)
    # ncA -> del, then optional [lArI | (poss|sU)(opt lAr ki) | lAr ki]
    s.set_ket()
    if _mark_ncA(s):
        s.slice_del()
        v3 = s.save()
        s.set_ket()
        if _mark_lArI(s):
            s.slice_del()
        else:
            s.restore(v3)
            def poss_su(s2):
                s2.set_ket()
                if not (_mark_possessives(s2) or _mark_sU(s2)):
                    return False
                s2.slice_del()
                v6 = s2.save()
                s2.set_ket()
                if _mark_lAr(s2):
                    s2.slice_del()
                    if not _stem_suffix_chain_before_ki(s2):
                        s2.restore(v6)
                else:
                    s2.restore(v6)
                return True
            if _guard(poss_su)(s):
                pass
            else:
                s.restore(v3)
                s.set_ket()
                if _mark_lAr(s):
                    s.slice_del()
                    if not _stem_suffix_chain_before_ki(s):
                        s.restore(v3)
                else:
                    s.restore(v3)
        return True
    s.restore(v1)
    # (ndA|nA) [lArI del | sU del (opt lAr ki) | ki-chain]
    s.set_ket()
    if _mark_ndA(s) or _mark_nA(s):
        ok = False
        if _mark_lArI(s):
            s.slice_del()
            ok = True
        else:
            v8 = s.save()
            if _mark_sU(s):
                s.slice_del()
                v9 = s.save()
                s.set_ket()
                if _mark_lAr(s):
                    s.slice_del()
                    if not _stem_suffix_chain_before_ki(s):
                        s.restore(v9)
                else:
                    s.restore(v9)
                ok = True
            else:
                s.restore(v8)
                ok = _stem_suffix_chain_before_ki(s)
        if ok:
            return True
    s.restore(v1)
    # (ndAn|nU) [sU del (opt lAr ki) | lArI (no slice)]
    s.set_ket()
    if _mark_ndAn(s) or _mark_nU(s):
        v11 = s.save()
        if _mark_sU(s):
            s.slice_del()
            v12 = s.save()
            s.set_ket()
            if _mark_lAr(s):
                s.slice_del()
                if not _stem_suffix_chain_before_ki(s):
                    s.restore(v12)
            else:
                s.restore(v12)
            return True
        s.restore(v11)
        if _mark_lArI(s):
            return True
    s.restore(v1)
    # DAn -> del, optional [poss del (opt lAr ki) | lAr del (opt ki) | ki]
    s.set_ket()
    if _mark_DAn(s):
        s.slice_del()
        v13 = s.save()
        s.set_ket()
        if _mark_possessives(s):
            s.slice_del()
            v15 = s.save()
            s.set_ket()
            if _mark_lAr(s):
                s.slice_del()
                if not _stem_suffix_chain_before_ki(s):
                    s.restore(v15)
            else:
                s.restore(v15)
        elif _mark_lAr(s):
            s.slice_del()
            v16 = s.save()
            if not _stem_suffix_chain_before_ki(s):
                s.restore(v16)
        elif not _stem_suffix_chain_before_ki(s):
            s.restore(v13)
        return True
    s.restore(v1)
    # (nUn|ylA) -> del, optional [lAr ki | (poss|sU)(opt lAr ki) | ki]
    s.set_ket()
    if _mark_nUn(s) or _mark_ylA(s):
        s.slice_del()
        v18 = s.save()

        def lar_ki(s2):
            s2.set_ket()
            if not _mark_lAr(s2):
                return False
            s2.slice_del()
            return _stem_suffix_chain_before_ki(s2)

        def poss_su(s2):
            s2.set_ket()
            if not (_mark_possessives(s2) or _mark_sU(s2)):
                return False
            s2.slice_del()
            v21 = s2.save()
            s2.set_ket()
            if _mark_lAr(s2):
                s2.slice_del()
                if not _stem_suffix_chain_before_ki(s2):
                    s2.restore(v21)
            else:
                s2.restore(v21)
            return True
        if _guard(lar_ki)(s):
            pass
        elif _guard(poss_su)(s):
            pass
        elif not _stem_suffix_chain_before_ki(s):
            s.restore(v18)
        return True
    s.restore(v1)
    # lArI -> del
    s.set_ket()
    if _mark_lArI(s):
        s.slice_del()
        return True
    s.restore(v1)
    # bare ki-chain
    if _stem_suffix_chain_before_ki(s):
        return True
    s.restore(v1)
    # (DA|yU|yA) -> del, optional [(poss (opt lAr)) | lAr] -> del, ki
    s.set_ket()
    if _mark_DA(s) or _mark_yU(s) or _mark_yA(s):
        s.slice_del()
        v23 = s.save()
        s.set_ket()
        matched = False
        if _mark_possessives(s):
            s.slice_del()
            v25 = s.save()
            s.set_ket()
            if not _mark_lAr(s):
                s.restore(v25)
            matched = True
        elif _mark_lAr(s):
            matched = True
        if matched:
            s.slice_del()
            s.set_ket()
            if not _stem_suffix_chain_before_ki(s):
                s.restore(v23)
        else:
            s.restore(v23)
        return True
    s.restore(v1)
    # (poss|sU) -> del, optional lAr ki
    s.set_ket()
    if _mark_possessives(s) or _mark_sU(s):
        s.slice_del()
        v27 = s.save()
        s.set_ket()
        if _mark_lAr(s):
            s.slice_del()
            if not _stem_suffix_chain_before_ki(s):
                s.restore(v27)
        else:
            s.restore(v27)
        return True
    return False


# -- postlude ---------------------------------------------------------------


def _post_process_last_consonants(s: _S) -> None:
    s.set_ket()
    rep = {"b": "p", "c": "ç", "d": "t", "ğ": "k"}
    if s.c > 0 and s.w[s.c - 1] in rep:
        ch = s.w[s.c - 1]
        s.c -= 1
        s.slice_from(rep[ch])


def _append_U(s: _S) -> None:
    """append_U_to_stems_ending_with_d_or_g: insert the harmony-matched
    high vowel BEFORE the final d/g (slice over the empty [ket, ket)
    span at the end — i.e. append)."""
    s.set_ket()
    end = s.c
    if not (end > 0 and s.w[end - 1] in "dg"):
        return
    # last vowel decides the appended U
    i = end - 1
    while i > 0 and s.w[i - 1] not in _V:
        i -= 1
    if i == 0:
        return
    v = s.w[i - 1]
    u = {"a": "ı", "ı": "ı", "e": "i", "i": "i",
         "o": "u", "u": "u", "ö": "ü", "ü": "ü"}[v]
    s.w = s.w + u
    s.c = len(s.w)
    s.ket = len(s.w)


def _is_reserved(w: str) -> bool:
    """ad / soyad are kept whole (r_is_reserved_word)."""
    return w in ("ad", "soyad")


def _more_than_one_syllable(w: str) -> bool:
    return sum(1 for ch in w if ch in _V) >= 2


def _stem_program(word: str) -> tuple[str, bool]:
    if not _more_than_one_syllable(word):
        return word, False
    s = _S(word)
    v1 = s.save()
    _matched, cont = _stem_nominal_verb_suffixes(s)
    s.restore(v1)
    if not cont:
        # the ...lAr nominal-verb arm stops all further stemming
        # (B_continue_stemming_noun_suffixes); no noun pass, no postlude
        return s.w, False
    v2 = s.save()
    _stem_noun_suffixes(s)
    s.restore(v2)
    # postlude
    if _is_reserved(s.w):
        return s.w, False
    _append_U(s)
    _post_process_last_consonants(s)
    return s.w, True


def turkish_stem(word: str) -> str:
    # SnowballFilter takes getCurrent() regardless of stem()'s return
    # (SnowballFilter.java:96-102), so the modified buffer IS the token
    return _stem_program(word)[0]


class TurkishStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [turkish_stem(t) for t in tokens]


register_analyzer(
    "turkish_snowball",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [TurkishStemFilter()], "turkish_snowball"
    ),
)
