"""Phonetic encoders — the analysis/phonetic module's PhoneticFilter
encoder set (reference analysis/phonetic/src/java/.../PhoneticFilter.java
wraps Apache Commons Codec encoders; the filter itself lives in
extras.py and this module supplies the remaining encoders).

Each encoder here is an independent implementation of the PUBLISHED
algorithm the commons-codec class also implements:

- ``metaphone``   — Lawrence Philips, "Hanging on the Metaphone",
  Computer Language 7(12), 1990 (the 16-rule consonant mapping with
  the commons maxCodeLen=4 default);
- ``caverphone2`` — David Hood, "Caverphone Revisited", Caversham
  Project technical paper CTP150804, 2004 (the full 2.0 rule ladder,
  10-char '1'-padded codes);
- ``nysiis``      — Taft, "New York State Identification and
  Intelligence System", 1970 (strict mode: 6-char truncation);
- ``cologne_phonetic`` — Postel, "Die Kölner Phonetik", 1969 (the
  German-language Soundex analog; context-coded digits, collapsed
  runs, non-initial '0' removed).

Validated against the reference's own TestPhoneticFilter vectors plus
the published test vectors of each algorithm. BeiderMorse,
DaitchMokotoffSoundex and DoubleMetaphone are NOT ported: the first
two are rule-data-driven (porting means copying their rule files —
the SURVEY §10 line), and DoubleMetaphone is ~900 lines of empirical
per-word conditionals with no compact published spec to implement
from; all three are recorded as descoped.

Registered into extras.PhoneticFilter.ENCODERS on import, so
``PhoneticFilter(encoder="metaphone", inject=True)`` works like the
reference factory's ``encoder`` argument.
"""

from __future__ import annotations

__all__ = ["metaphone", "caverphone2", "nysiis", "cologne_phonetic"]

_VOWELS = "AEIOU"


def _clean(word: str) -> str:
    return "".join(c for c in word.upper() if "A" <= c <= "Z")


# ---------------------------------------------------------------------------
# Metaphone (Philips 1990; commons-codec Metaphone semantics, max 4)
# ---------------------------------------------------------------------------


def metaphone(word: str, max_code_len: int = 4) -> str:
    w = _clean(word)
    if not w:
        return ""
    if len(w) == 1:
        return w
    # initial-pair exceptions
    first2 = w[:2]
    if first2 in ("AE", "GN", "KN", "PN", "WR"):
        w = w[1:]
    elif w[0] == "X":
        w = "S" + w[1:]
    elif first2 == "WH":
        w = "W" + w[2:]
    n = len(w)
    out: list[str] = []

    def is_vowel(i: int) -> bool:
        return 0 <= i < n and w[i] in _VOWELS

    i = 0
    while i < n and len(out) < max_code_len:
        c = w[i]
        # duplicate adjacent letters are skipped, except C
        if c != "C" and i > 0 and w[i - 1] == c:
            i += 1
            continue
        # "?" sentinel: "" is a substring of every string, so empty
        # next-chars would satisfy `in "IEY"`-style membership tests
        nxt = w[i + 1] if i + 1 < n else "?"
        nx2 = w[i + 2] if i + 2 < n else "?"
        if c in _VOWELS:
            if i == 0:
                out.append(c)
        elif c == "B":
            # silent in final -MB
            if not (i == n - 1 and i > 0 and w[i - 1] == "M"):
                out.append("B")
        elif c == "C":
            if nxt == "I" and nx2 == "A":  # -CIA-
                out.append("X")
            elif nxt in "IEY":
                if i > 0 and w[i - 1] == "S":  # -SCI/SCE/SCY: silent
                    pass
                else:
                    out.append("S")
            elif nxt == "H":
                # SCH -> K, else CH -> X
                if i > 0 and w[i - 1] == "S":
                    out.append("K")
                else:
                    out.append("X")
            else:
                out.append("K")
        elif c == "D":
            if nxt == "G" and nx2 in "IEY":
                out.append("J")
                i += 2  # consume DG; the I/E/Y vowel is skipped anyway
            else:
                out.append("T")
        elif c == "G":
            silent = False
            if nxt == "H":
                # GH silent unless before a vowel
                if not is_vowel(i + 2):
                    silent = True
            if nxt == "N":
                # GN / GNED: silent G
                if i + 1 == n - 1 or (w[i + 1 :] in ("NED",)):
                    silent = True
            if not silent:
                if nxt in "IEY":
                    out.append("J")
                elif nxt != "H":
                    out.append("K")
                elif not is_vowel(i + 2):
                    pass  # trailing GH already silent
                else:
                    out.append("K")
        elif c == "H":
            # silent after vowel with no following vowel; and after
            # the 'varson' set C,S,P,T,G handled by those rules
            if i > 0 and is_vowel(i - 1) and not is_vowel(i + 1):
                pass
            elif i > 0 and w[i - 1] in "CSPTG":
                pass
            else:
                out.append("H")
        elif c == "F":
            out.append("F")
        elif c == "J":
            out.append("J")
        elif c == "K":
            if not (i > 0 and w[i - 1] == "C"):
                out.append("K")
        elif c in "LMNR":
            out.append({"L": "L", "M": "M", "N": "N", "R": "R"}[c])
        elif c == "P":
            out.append("F" if nxt == "H" else "P")
        elif c == "Q":
            out.append("K")
        elif c == "S":
            if nxt == "H":
                out.append("X")
            elif nxt == "I" and nx2 in ("O", "A"):
                out.append("X")
            else:
                out.append("S")
        elif c == "T":
            if nxt == "I" and nx2 in ("O", "A"):
                out.append("X")
            elif nxt == "H":
                out.append("0")  # theta
                i += 1
            elif not (nxt == "C" and nx2 == "H"):  # -TCH-: T silent
                out.append("T")
        elif c == "V":
            out.append("F")
        elif c == "W":
            if is_vowel(i + 1):
                out.append("W")
        elif c == "X":
            out.append("K")
            if len(out) < max_code_len:
                out.append("S")
        elif c == "Y":
            if is_vowel(i + 1):
                out.append("Y")
        elif c == "Z":
            out.append("S")
        i += 1
    return "".join(out[:max_code_len])


# ---------------------------------------------------------------------------
# Caverphone 2.0 (Hood 2004)
# ---------------------------------------------------------------------------

_CAVER_START = (
    ("cough", "cou2f"), ("rough", "rou2f"), ("tough", "tou2f"),
    ("enough", "enou2f"), ("trough", "trou2f"), ("gn", "2n"),
)
_CAVER_MID = (
    ("cq", "2q"), ("ci", "si"), ("ce", "se"), ("cy", "sy"),
    ("tch", "2ch"), ("c", "k"), ("q", "k"), ("x", "k"), ("v", "f"),
    ("dg", "2g"), ("tio", "sio"), ("tia", "sia"), ("d", "t"),
    ("ph", "fh"), ("b", "p"), ("sh", "s2h"), ("z", "s"),
)


def caverphone2(word: str) -> str:
    import re

    w = "".join(c for c in word.lower() if "a" <= c <= "z")
    if not w:
        return "1111111111"
    if w.endswith("e"):
        w = w[:-1]
    for pre, rep in _CAVER_START:
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    if w.endswith("mb"):
        w = w[:-2] + "m2"
    for pat, rep in _CAVER_MID:
        w = w.replace(pat, rep)
    if w and w[0] in "aeiou":
        w = "A" + w[1:]
    w = re.sub("[aeiou]", "3", w)
    w = w.replace("j", "y")
    if w.startswith("y3"):
        w = "Y3" + w[2:]
    elif w.startswith("y"):
        w = "A" + w[1:]
    w = w.replace("y", "3")
    w = w.replace("3gh3", "3kh3")
    w = w.replace("gh", "22")
    w = w.replace("g", "k")
    for c in "stpkfmn":
        w = re.sub(f"{c}+", c.upper(), w)
    w = w.replace("w3", "W3")
    w = w.replace("wh3", "Wh3")
    if w.endswith("w"):
        w = w[:-1] + "3"
    w = w.replace("w", "2")
    if w.startswith("h"):
        w = "A" + w[1:]
    w = w.replace("h", "2")
    w = w.replace("r3", "R3")
    if w.endswith("r"):
        w = w[:-1] + "3"
    w = w.replace("r", "2")
    w = w.replace("l3", "L3")
    if w.endswith("l"):
        w = w[:-1] + "3"
    w = w.replace("l", "2")
    w = w.replace("2", "")
    if w.endswith("3"):
        w = w[:-1] + "A"
    w = w.replace("3", "")
    return (w + "1111111111")[:10]


# ---------------------------------------------------------------------------
# NYSIIS (Taft 1970; commons-codec strict mode)
# ---------------------------------------------------------------------------


def nysiis(word: str, strict: bool = True) -> str:
    w = _clean(word)
    if not w:
        return ""
    # first-character transcodes
    for pre, rep in (("MAC", "MCC"), ("KN", "NN"), ("K", "C"),
                     ("PH", "FF"), ("PF", "FF"), ("SCH", "SSS")):
        if w.startswith(pre):
            w = rep + w[len(pre):]
            break
    # last-character transcodes
    for suf, rep in (("EE", "Y"), ("IE", "Y"), ("DT", "D"), ("RT", "D"),
                     ("RD", "D"), ("NT", "D"), ("ND", "D")):
        if w.endswith(suf):
            w = w[: -len(suf)] + rep
            break
    key = [w[0]]
    i = 1
    n = len(w)
    while i < n:
        c = w[i]
        nxt = w[i + 1] if i + 1 < n else ""
        prev = w[i - 1]
        rep = c
        skip = 0
        if c == "E" and nxt == "V":
            rep, skip = "AF", 1
        elif c in _VOWELS:
            rep = "A"
        elif c == "Q":
            rep = "G"
        elif c == "Z":
            rep = "S"
        elif c == "M":
            rep = "N"
        elif c == "K":
            if nxt == "N":
                rep, skip = "N", 1
            else:
                rep = "C"
        elif c == "S" and w[i : i + 3] == "SCH":
            rep, skip = "SSS", 2
        elif c == "P" and nxt == "H":
            rep, skip = "FF", 1
        elif c == "H" and (prev not in _VOWELS or nxt not in _VOWELS):
            rep = prev
        elif c == "W" and prev in _VOWELS:
            rep = prev
        # the current position's ORIGINAL letters become part of the
        # string so later prev-checks see the coded form
        w = w[:i] + rep + w[i + 1 + skip :]
        n = len(w)
        for ch in rep:
            if ch != key[-1]:
                key.append(ch)
            i += 1
        if not rep:
            i += 1
    # terminal cleanup: trailing S, AY -> Y, trailing A
    while len(key) > 1 and key[-1] == "S":
        key.pop()
    if len(key) >= 2 and key[-2:] == ["A", "Y"]:
        key = key[:-2] + ["Y"]
    while len(key) > 1 and key[-1] == "A":
        key.pop()
    out = "".join(key)
    return out[:6] if strict else out


# ---------------------------------------------------------------------------
# Kölner Phonetik (Postel 1969)
# ---------------------------------------------------------------------------

# context-free codes; context-dependent letters handled inline below
_KOELN_SIMPLE = {
    **dict.fromkeys("AEIOUJY", "0"),
    "B": "1",  # P handled inline (PH -> 3)
    "F": "3", "V": "3", "W": "3",
    "G": "4", "K": "4", "Q": "4",
    "L": "5",
    "M": "6", "N": "6",
    "R": "7",
    "S": "8", "Z": "8",
}
_KOELN_FOLD = str.maketrans(
    {"Ä": "A", "Ö": "O", "Ü": "U", "ß": "S", "É": "E", "È": "E"}
)


def cologne_phonetic(word: str) -> str:
    w = "".join(
        c for c in word.upper().translate(_KOELN_FOLD) if "A" <= c <= "Z"
    )
    if not w:
        return ""
    n = len(w)
    digits: list[str] = []
    for i, c in enumerate(w):
        prev = w[i - 1] if i > 0 else "?"
        nxt = w[i + 1] if i + 1 < n else "?"
        if c in _KOELN_SIMPLE:
            d = _KOELN_SIMPLE[c]
        elif c == "H":
            d = ""  # H is not coded
        elif c in ("D", "T"):
            d = "8" if nxt in "CSZ" else "2"
        elif c == "P":
            d = "3" if nxt == "H" else "1"
        elif c == "X":
            # X = 48, but 8 only after C,K,Q (already coded 4)
            d = "8" if prev in "CKQ" else "48"
        elif c == "C":
            if i == 0:
                d = "4" if nxt in "AHKLOQRUX" else "8"
            elif prev in "SZ":
                d = "8"
            else:
                d = "4" if nxt in "AHKOQUX" else "8"
        else:
            d = ""
        digits.append(d)
    code = "".join(digits)
    # collapse runs, then drop every non-initial 0
    out: list[str] = []
    last = ""
    for ch in code:
        if ch != last:
            out.append(ch)
        last = ch
    collapsed = "".join(out)
    return collapsed[:1] + collapsed[1:].replace("0", "")


def _register() -> None:
    from lucene_spark.analysis.extras import PhoneticFilter

    PhoneticFilter.ENCODERS.update(
        metaphone=metaphone,
        caverphone2=caverphone2,
        nysiis=nysiis,
        cologne=cologne_phonetic,
    )


_register()
