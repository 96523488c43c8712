"""Indonesian stemmer (SURVEY.md §2.2 analysis zoo).

Reference contract: ``analysis/common/src/java/org/apache/lucene/
analysis/id/IndonesianStemmer.java`` (used by id/IndonesianAnalyzer.java
via IndonesianStemFilter) — the published Tala (2003) algorithm: strip
inflectional particles (-kah/-lah/-pun) and possessive pronouns
(-ku/-mu/-nya) while more than two syllables remain, then derivational
first-order prefixes (meng-/meny-/men-/mem-/me-/peng-/peny-/pen-/pem-/
di-/ter-/ke- with the s/t recodings), suffixes (-kan/-an/-i, each
blocked by flags of already-removed prefixes), and second-order
prefixes (ber-/be-CVer/per-/pe-, belajar/pelajar specials). Rule order
mirrors the reference exactly: suffixes run between the two prefix
orders when a first-order prefix fired, after otherwise. Verified
differentially against the compiled reference stemmer (exact match on
the full dev word set; archives not committed).
"""

from __future__ import annotations

from lucene_spark.analysis.analyzer import StandardAnalyzer
from lucene_spark.analysis.filters import (
    FilteredAnalyzer,
    TokenFilter,
    register_analyzer,
)

__all__ = ["indonesian_stem", "IndonesianStemFilter"]

_VOWELS = frozenset("aeiou")

_KE, _PENG, _DI, _MENG, _TER, _BER, _PE = 1, 2, 4, 8, 16, 32, 64


class _State:
    __slots__ = ("syllables", "flags")


def indonesian_stem(word: str, stem_derivational: bool = True) -> str:
    w = word
    st = _State()
    st.flags = 0
    st.syllables = sum(1 for c in w if c in _VOWELS)

    if st.syllables > 2:
        w = _particle(w, st)
    if st.syllables > 2:
        w = _possessive(w, st)
    if stem_derivational:
        old = w
        if st.syllables > 2:
            w = _first_prefix(w, st)
        if w != old:  # a first-order rule fired: suffix, then 2nd prefix
            old = w
            if st.syllables > 2:
                w = _suffix(w, st)
            if w != old and st.syllables > 2:
                w = _second_prefix(w, st)
        else:
            if st.syllables > 2:
                w = _second_prefix(w, st)
            if st.syllables > 2:
                w = _suffix(w, st)
    return w


def _particle(w: str, st: _State) -> str:
    if w.endswith(("kah", "lah", "pun")):
        st.syllables -= 1
        return w[:-3]
    return w


def _possessive(w: str, st: _State) -> str:
    if w.endswith(("ku", "mu")):
        st.syllables -= 1
        return w[:-2]
    if w.endswith("nya"):
        st.syllables -= 1
        return w[:-3]
    return w


def _first_prefix(w: str, st: _State) -> str:
    n = len(w)
    if w.startswith("meng"):
        st.flags |= _MENG
        st.syllables -= 1
        return w[4:]
    if w.startswith("meny") and n > 4 and w[4] in _VOWELS:
        st.flags |= _MENG
        st.syllables -= 1
        return "s" + w[4:]  # meny+V -> recode to s
    if w.startswith(("men", "mem")):
        st.flags |= _MENG
        st.syllables -= 1
        return w[3:]
    if w.startswith("me"):
        st.flags |= _MENG
        st.syllables -= 1
        return w[2:]
    if w.startswith("peng"):
        st.flags |= _PENG
        st.syllables -= 1
        return w[4:]
    if w.startswith("peny"):
        st.flags |= _PENG
        st.syllables -= 1
        if n > 4 and w[4] in _VOWELS:
            return "s" + w[4:]
        return w[4:]
    if w.startswith("pen") and n > 3 and w[3] in _VOWELS:
        st.flags |= _PENG
        st.syllables -= 1
        return "t" + w[3:]  # pen+V -> recode to t
    if w.startswith(("pen", "pem")):
        st.flags |= _PENG
        st.syllables -= 1
        return w[3:]
    if w.startswith("di"):
        st.flags |= _DI
        st.syllables -= 1
        return w[2:]
    if w.startswith("ter"):
        st.flags |= _TER
        st.syllables -= 1
        return w[3:]
    if w.startswith("ke"):
        st.flags |= _KE
        st.syllables -= 1
        return w[2:]
    return w


def _second_prefix(w: str, st: _State) -> str:
    n = len(w)
    if w.startswith("ber"):
        st.flags |= _BER
        st.syllables -= 1
        return w[3:]
    if w == "belajar":
        st.flags |= _BER
        st.syllables -= 1
        return w[3:]
    if (
        w.startswith("be")
        and n > 4
        and w[2] not in _VOWELS
        and w[3] == "e"
        and w[4] == "r"
    ):
        st.flags |= _BER
        st.syllables -= 1
        return w[2:]
    if w.startswith("per"):
        st.syllables -= 1
        return w[3:]
    if w == "pelajar":
        st.syllables -= 1
        return w[3:]
    if w.startswith("pe"):
        st.flags |= _PE
        st.syllables -= 1
        return w[2:]
    return w


def _suffix(w: str, st: _State) -> str:
    if w.endswith("kan") and not st.flags & (_KE | _PENG | _PE):
        st.syllables -= 1
        return w[:-3]
    if w.endswith("an") and not st.flags & (_DI | _MENG | _TER):
        st.syllables -= 1
        return w[:-2]
    if (
        w.endswith("i")
        and not w.endswith("si")
        and not st.flags & (_BER | _KE | _PENG)
    ):
        st.syllables -= 1
        return w[:-1]
    return w


class IndonesianStemFilter(TokenFilter):
    """id/IndonesianStemFilter.java (full derivational stemming)."""

    def __init__(self, stem_derivational: bool = True):
        self.stem_derivational = stem_derivational

    def apply(self, tokens: list[str]) -> list[str]:
        return [indonesian_stem(t, self.stem_derivational) for t in tokens]


register_analyzer(
    "indonesian",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [IndonesianStemFilter()], "indonesian"
    ),
)
