"""Snowball English stemmer (Porter2).

Reference parity: analysis/common/src/java/org/tartarus/snowball/ext/
EnglishStemmer.java + analysis/common/.../snowball/SnowballFilter.java.
The Java there is machine-generated from the published Snowball source;
this is an independent implementation of the same published algorithm
(snowballstem.org, "The English (Porter2) stemming algorithm"), the
same line the r3 stemmer pack followed: algorithms are public, buffer
code is not shared.

Steps follow the published spec: prelude (apostrophe strip, consonant-y
marking), R1/R2 regions (with the gener-/commun-/arsen- R1 exception),
exceptional word forms, step 0 (possessives), 1a (plural families +
post-1a invariants), 1b (eed/ed/ing families with at/bl/iz, double-
consonant undoubling, short-word e), 1c (y->i), 2/3 (suffix maps in
R1), 4 (R2 deletions, ion after s/t), 5 (e/l endings), postlude.
"""

from __future__ import annotations

from lucene_spark.analysis.filters import TokenFilter, register_analyzer

_VOWELS = frozenset("aeiouy")
_DOUBLES = ("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
_LI_ENDING = frozenset("cdeghkmnrt")

_EXCEPTIONS = {
    "skis": "ski", "skies": "sky",
    "dying": "die", "lying": "lie", "tying": "tie",
    "idly": "idl", "gently": "gentl", "ugly": "ugli",
    "early": "earli", "only": "onli", "singly": "singl",
    "sky": "sky", "news": "news", "howe": "howe",
    "atlas": "atlas", "cosmos": "cosmos", "bias": "bias", "andes": "andes",
}
_EXCEPTIONS_1A = frozenset(
    ["inning", "outing", "canning", "herring", "earring",
     "proceed", "exceed", "succeed"]
)


def _regions(w: str) -> tuple[int, int]:
    """(r1, r2) start offsets. A region is 'after the first non-vowel
    following a vowel'."""

    def after_vc(s: str, base: int) -> int:
        i = base
        n = len(s)
        # find first vowel
        while i < n and s[i] not in "aeiouy":
            i += 1
        # find first non-vowel after it
        while i < n and s[i] in "aeiouy":
            i += 1
        return min(n, i + 1) if i < n else n

    r1 = None
    for p in ("gener", "commun", "arsen"):
        if w.startswith(p):
            r1 = len(p)
            break
    if r1 is None:
        r1 = after_vc(w, 0)
    r2 = after_vc(w, r1)
    return r1, r2


def _has_vowel(w: str, lo: int, hi: int) -> bool:
    return any(c in "aeiouy" for c in w[lo:hi])


def _short_syllable_at_end(w: str) -> bool:
    """Ends in a short syllable: (a) the whole word is vowel+non-vowel
    (begin-of-word case), or (b) non-vowel, vowel, non-vowel(!= w,x,Y)."""
    n = len(w)
    if n == 2 and w[0] in "aeiouy" and w[1] not in "aeiouy":
        return True
    if n >= 3:
        c1, v, c2 = w[-3], w[-2], w[-1]
        if (
            c1 not in "aeiouy"
            and v in "aeiouy"
            and c2 not in "aeiouy"
            and c2 not in "wxY"
        ):
            return True
    return False


def _is_short(w: str, r1: int) -> bool:
    return r1 >= len(w) and _short_syllable_at_end(w)


def porter2_stem(word: str) -> str:
    """Porter2 / Snowball English stem of one lowercase token."""
    w = word
    if len(w) <= 2:
        return w
    if w[0] == "'":
        w = w[1:]
    if w in _EXCEPTIONS:
        return _EXCEPTIONS[w]
    if len(w) <= 2:
        return w
    # prelude: mark consonant y
    chars = list(w)
    if chars[0] == "y":
        chars[0] = "Y"
    for i in range(1, len(chars)):
        if chars[i] == "y" and chars[i - 1] in "aeiou":
            chars[i] = "Y"
    w = "".join(chars)
    r1, r2 = _regions(w)

    # --- step 0: possessives
    for suf in ("'s'", "'s", "'"):
        if w.endswith(suf):
            w = w[: -len(suf)]
            break

    # --- step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ied") or w.endswith("ies"):
        w = w[:-2] if len(w) - 3 > 1 else w[:-1]
    elif w.endswith("us") or w.endswith("ss"):
        pass
    elif w.endswith("s"):
        if _has_vowel(w, 0, len(w) - 2):
            w = w[:-1]

    if w in _EXCEPTIONS_1A:
        return w.replace("Y", "y")

    # --- step 1b
    if w.endswith("eedly"):
        if len(w) - 5 >= r1:
            w = w[:-3]
    elif w.endswith("eed"):
        if len(w) - 3 >= r1:
            w = w[:-1]
    else:
        for suf in ("ingly", "edly", "ing", "ed"):
            if w.endswith(suf):
                stem = w[: -len(suf)]
                if _has_vowel(stem, 0, len(stem)):
                    w = stem
                    if w.endswith(("at", "bl", "iz")):
                        w = w + "e"
                    elif w.endswith(_DOUBLES):
                        # Snowball 2.x revision: keep the double when the
                        # word is exactly [aeo] + double (egg, add, odd)
                        if not (len(w) == 3 and w[0] in "aeo"):
                            w = w[:-1]
                    elif _is_short(w, r1):
                        w = w + "e"
                break

    # --- step 1c: y -> i when preceded by a non-vowel that is not the
    # first letter of the word
    if (
        len(w) > 2
        and w[-1] in "yY"
        and w[-2] not in "aeiouy"
    ):
        w = w[:-1] + "i"

    # --- step 2 (longest suffix, in R1)
    step2 = [
        ("ization", "ize"), ("ational", "ate"), ("fulness", "ful"),
        ("ousness", "ous"), ("iveness", "ive"), ("tional", "tion"),
        ("biliti", "ble"), ("lessli", "less"), ("entli", "ent"),
        ("ation", "ate"), ("alism", "al"), ("aliti", "al"),
        ("ousli", "ous"), ("iviti", "ive"), ("fulli", "ful"),
        ("enci", "ence"), ("anci", "ance"), ("abli", "able"),
        ("izer", "ize"), ("ator", "ate"), ("alli", "al"),
        ("bli", "ble"), ("ogi", None), ("li", None),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ogi":
                    if len(w) > 3 and w[-4] == "l":
                        w = w[:-1]
                elif suf == "li":
                    if len(w) > 2 and w[-3] in _LI_ENDING:
                        w = w[:-2]
                else:
                    w = w[: -len(suf)] + rep
            break

    # --- step 3 (in R1; ative needs R2)
    step3 = [
        ("ational", "ate"), ("tional", "tion"), ("alize", "al"),
        ("icate", "ic"), ("iciti", "ic"), ("ative", ""),
        ("ical", "ic"), ("ness", ""), ("ful", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            if len(w) - len(suf) >= r1:
                if suf == "ative":
                    if len(w) - len(suf) >= r2:
                        w = w[: -len(suf)]
                else:
                    w = w[: -len(suf)] + rep
            break

    # --- step 4 (in R2)
    step4 = [
        "ement", "ance", "ence", "able", "ible", "ment",
        "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize",
        "ion", "al", "er", "ic",
    ]
    for suf in step4:
        if w.endswith(suf):
            if len(w) - len(suf) >= r2:
                if suf == "ion":
                    if len(w) > 3 and w[-4] in "st":
                        w = w[:-3]
                else:
                    w = w[: -len(suf)]
            break

    # --- step 5
    if w.endswith("e"):
        if len(w) - 1 >= r2:
            w = w[:-1]
        elif len(w) - 1 >= r1 and not _short_syllable_at_end(w[:-1]):
            w = w[:-1]
    elif w.endswith("l"):
        if len(w) - 1 >= r2 and len(w) > 1 and w[-2] == "l":
            w = w[:-1]

    return w.replace("Y", "y")


class Porter2StemFilter(TokenFilter):
    """SnowballFilter(EnglishStemmer) role — apply Porter2 per token."""

    def apply(self, tokens: list[str]) -> list[str]:
        return [porter2_stem(t) for t in tokens]


def _register() -> None:
    from lucene_spark.analysis.analyzer import SimpleAnalyzer, StandardAnalyzer
    from lucene_spark.analysis.filters import FilteredAnalyzer

    register_analyzer(
        "english_snowball",
        lambda: FilteredAnalyzer(
            StandardAnalyzer(), [Porter2StemFilter()], "english_snowball"
        ),
    )
    register_analyzer(
        "simple_snowball",
        lambda: FilteredAnalyzer(
            SimpleAnalyzer(), [Porter2StemFilter()], "simple_snowball"
        ),
    )


_register()
