"""Greek analysis (SURVEY.md §2.2 analysis zoo).

Reference contracts:
- ``analysis/common/.../el/GreekLowerCaseFilter.java`` — lowercase with
  final-sigma unification (ς→σ) and tonos/dialytika diacritic removal.
- ``analysis/common/.../el/GreekStemmer.java`` — the Ntais/Saroukos
  algorithm: 21 "short" rules with per-rule exception lists and
  add-back recodings, the rule-21 long suffix ladder only when no short
  rule fired, and the rule-22 comparative/superlative trim. The
  reference's exact boolean-precedence quirks (length guards binding
  only to the first alternative in rules 0 and 8) are replicated
  verbatim — they are part of the shipped behavior.

Verified differentially against the compiled reference stemmer (exact
match on the full dev word set; archives not committed). Used by
el/GreekAnalyzer.java's chain.
"""

from __future__ import annotations

from lucene_spark.analysis.analyzer import Analyzer
from lucene_spark.analysis import uax29
from lucene_spark.analysis.filters import (
    FilteredAnalyzer,
    TokenFilter,
    register_analyzer,
)

__all__ = ["greek_lowercase", "greek_stem", "GreekStemFilter",
           "GreekLowerCaseAnalyzer"]

# GreekLowerCaseFilter.java:54-113
_GREEK_FOLD = {
    "ς": "σ",
    "Ά": "α", "ά": "α",
    "Έ": "ε", "έ": "ε",
    "Ή": "η", "ή": "η",
    "Ί": "ι", "Ϊ": "ι", "ί": "ι", "ϊ": "ι", "ΐ": "ι",
    "Ύ": "υ", "Ϋ": "υ", "ύ": "υ", "ϋ": "υ", "ΰ": "υ",
    "Ό": "ο", "ό": "ο",
    "Ώ": "ω", "ώ": "ω",
    "΢": "ς",
}


def greek_lowercase(text: str) -> str:
    return "".join(_GREEK_FOLD.get(c) or _GREEK_FOLD.get(c.lower(), c.lower())
                   for c in text)


_V = frozenset("αεηιουω")
_V_NO_Y = frozenset("αεηιοω")

_EXC4 = frozenset(["θ", "δ", "ελ", "γαλ", "ν", "π", "ιδ", "παρ"])
_EXC6 = frozenset([
    "αλ", "αδ", "ενδ", "αμαν", "αμμοχαλ", "ηθ", "ανηθ", "αντιδ", "φυσ",
    "βρωμ", "γερ", "εξωδ", "καλπ", "καλλιν", "καταδ", "μουλ", "μπαν",
    "μπαγιατ", "μπολ", "μποσ", "νιτ", "ξικ", "συνομηλ", "πετσ", "πιτσ",
    "πικαντ", "πλιατσ", "ποστελν", "πρωτοδ", "σερτ", "συναδ", "τσαμ",
    "υποδ", "φιλον", "φυλοδ", "χασ"])
_EXC7 = frozenset(["αναπ", "αποθ", "αποκ", "αποστ", "βουβ", "ξεθ", "ουλ",
                   "πεθ", "πικρ", "ποτ", "σιχ", "χ"])
_EXC8A = frozenset(["τρ", "τσ"])
_EXC8B = frozenset([
    "βετερ", "βουλκ", "βραχμ", "γ", "δραδουμ", "θ", "καλπουζ", "καστελ",
    "κορμορ", "λαοπλ", "μωαμεθ", "μ", "μουσουλμ", "ν", "ουλ", "π",
    "πελεκ", "πλ", "πολισ", "πορτολ", "σαρακατσ", "σουλτ", "τσαρλατ",
    "ορφ", "τσιγγ", "τσοπ", "φωτοστεφ", "χ", "ψυχοπλ", "αγ", "γαλ",
    "γερ", "δεκ", "διπλ", "αμερικαν", "ουρ", "πιθ", "πουριτ", "σ",
    "ζωντ", "ικ", "καστ", "κοπ", "λιχ", "λουθηρ", "μαιντ", "μελ", "σιγ",
    "σπ", "στεγ", "τραγ", "τσαγ", "φ", "ερ", "αδαπ", "αθιγγ", "αμηχ",
    "ανικ", "ανοργ", "απηγ", "απιθ", "ατσιγγ", "βασ", "βασκ", "βαθυγαλ",
    "βιομηχ", "βραχυκ", "διατ", "διαφ", "ενοργ", "θυσ", "καπνοβιομηχ",
    "καταγαλ", "κλιβ", "κοιλαρφ", "λιβ", "μεγλοβιομηχ", "μικροβιομηχ",
    "νταβ", "ξηροκλιβ", "ολιγοδαμ", "ολογαλ", "πενταρφ", "περηφ",
    "περιτρ", "πλατ", "πολυδαπ", "πολυμηχ", "στεφ", "ταβ", "τετ",
    "υπερηφ", "υποκοπ", "χαμηλοδαπ", "ψηλοταβ"])
_EXC9 = frozenset(["αβαρ", "βεν", "εναρ", "αβρ", "αδ", "αθ", "αν", "απλ",
                   "βαρον", "ντρ", "σκ", "κοπ", "μπορ", "νιφ", "παγ",
                   "παρακαλ", "σερπ", "σκελ", "συρφ", "τοκ", "υ", "δ",
                   "εμ", "θαρρ", "θ"])
_EXC12A = frozenset(["π", "απ", "συμπ", "ασυμπ", "ακαταπ", "αμεταμφ"])
_EXC12B = frozenset(["αλ", "αρ", "εκτελ", "ζ", "μ", "ξ", "παρακαλ",
                     "προ", "νισ"])
_EXC13 = frozenset(["διαθ", "θ", "παρακαταθ", "προσθ", "συνθ"])
_EXC14 = frozenset(["φαρμακ", "χαδ", "αγκ", "αναρρ", "βρομ", "εκλιπ",
                    "λαμπιδ", "λεχ", "μ", "πατ", "ρ", "λ", "μεδ",
                    "μεσαζ", "υποτειν", "αμ", "αιθ", "ανηκ", "δεσποζ",
                    "ενδιαφερ", "δε", "δευτερευ", "καθαρευ", "πλε",
                    "τσα"])
_EXC15A = frozenset(["αβαστ", "πολυφ", "αδηφ", "παμφ", "ρ", "ασπ", "αφ",
                     "αμαλ", "αμαλλι", "ανυστ", "απερ", "ασπαρ", "αχαρ",
                     "δερβεν", "δροσοπ", "ξεφ", "νεοπ", "νομοτ", "ολοπ",
                     "ομοτ", "προστ", "προσωποπ", "συμπ", "συντ", "τ",
                     "υποτ", "χαρ", "αειπ", "αιμοστ", "ανυπ", "αποτ",
                     "αρτιπ", "διατ", "εν", "επιτ", "κροκαλοπ",
                     "σιδηροπ", "λ", "ναυ", "ουλαμ", "ουρ", "π", "τρ",
                     "μ"])
_EXC15B = frozenset(["ψοφ", "ναυλοχ"])
_EXC16 = frozenset(["ν", "χερσον", "δωδεκαν", "ερημον", "μεγαλον",
                    "επταν"])
_EXC17 = frozenset(["ασβ", "σβ", "αχρ", "χρ", "απλ", "αειμν", "δυσχρ",
                    "ευχρ", "κοινοχρ", "παλιμψ"])
_EXC18 = frozenset(["ν", "ρ", "σπι", "στραβομουτσ", "κακομουτσ", "εξων"])
_EXC19 = frozenset(["παρασουσ", "φ", "χ", "ωριοπλ", "αζ", "αλλοσουσ",
                    "ασουσ"])


def greek_stem(word: str) -> str:
    if len(word) < 4:
        return word
    s = list(word)
    ln = len(s)

    def ew(n: int, suffix: str) -> bool:
        k = len(suffix)
        return n >= k and "".join(s[n - k: n]) == suffix

    def ew_any(n: int, *sufs: str) -> bool:
        return any(ew(n, x) for x in sufs)

    def stem_of(n: int) -> str:
        return "".join(s[:n])

    def ev(n: int) -> bool:
        return n > 0 and s[n - 1] in _V

    def ev_noy(n: int) -> bool:
        return n > 0 and s[n - 1] in _V_NO_Y

    orig = ln

    # rule 0 — irregular neuter nouns
    if ln > 9 and ew_any(ln, "καθεστωτοσ", "καθεστωτων"):
        ln -= 4
    elif ln > 8 and ew_any(ln, "γεγονοτοσ", "γεγονοτων"):
        ln -= 4
    elif ln > 8 and ew(ln, "καθεστωτα"):
        ln -= 3
    elif ln > 7 and ew_any(ln, "τατογιου", "τατογιων"):
        ln -= 4
    elif ln > 7 and ew(ln, "γεγονοτα"):
        ln -= 3
    elif ln > 7 and ew(ln, "καθεστωσ"):
        ln -= 2
    # reference precedence quirk: the len guard binds only to σκαγιου
    elif (ln > 6 and ew(ln, "σκαγιου")) or ew_any(
        ln, "σκαγιων", "ολογιου", "ολογιων", "κρεατοσ", "κρεατων",
        "περατοσ", "περατων", "τερατοσ", "τερατων"
    ):
        ln -= 4
    elif ln > 6 and ew(ln, "τατογια"):
        ln -= 3
    elif ln > 6 and ew(ln, "γεγονοσ"):
        ln -= 2
    elif ln > 5 and ew_any(ln, "φαγιου", "φαγιων", "σογιου", "σογιων"):
        ln -= 4
    elif ln > 5 and ew_any(ln, "σκαγια", "ολογια", "κρεατα", "περατα",
                           "τερατα"):
        ln -= 3
    elif ln > 4 and ew_any(ln, "φαγια", "σογια", "φωτοσ", "φωτων"):
        ln -= 3
    elif ln > 4 and ew_any(ln, "κρεασ", "περασ", "τερασ"):
        ln -= 2
    elif ln > 3 and ew(ln, "φωτα"):
        ln -= 2
    elif ln > 2 and ew(ln, "φωσ"):
        ln -= 1

    # rule 1
    if ln > 4 and ew_any(ln, "αδεσ", "αδων"):
        ln -= 4
        if not ew_any(ln, "οκ", "μαμ", "μαν", "μπαμπ", "πατερ", "γιαγι",
                      "νταντ", "κυρ", "θει", "πεθερ"):
            ln += 2  # add back -αδ

    # rule 2
    if ln > 4 and ew_any(ln, "εδεσ", "εδων"):
        ln -= 4
        if ew_any(ln, "οπ", "ιπ", "εμπ", "υπ", "γηπ", "δαπ", "κρασπ",
                  "μιλ"):
            ln += 2  # add back -εδ

    # rule 3
    if ln > 5 and ew_any(ln, "ουδεσ", "ουδων"):
        ln -= 5
        if ew_any(ln, "αρκ", "καλιακ", "πεταλ", "λιχ", "πλεξ", "σκ", "σ",
                  "φλ", "φρ", "βελ", "λουλ", "χν", "σπ", "τραγ", "φε"):
            ln += 3  # add back -ουδ

    # rule 4
    if ln > 3 and ew_any(ln, "εωσ", "εων"):
        ln -= 3
        if stem_of(ln) in _EXC4:
            ln += 1  # add back -ε

    # rule 5
    if ln > 2 and ew(ln, "ια"):
        ln -= 2
        if ev(ln):
            ln += 1  # add back -ι
    elif ln > 3 and ew_any(ln, "ιου", "ιων"):
        ln -= 3
        if ev(ln):
            ln += 1

    # rule 6
    removed = False
    if ln > 3 and ew_any(ln, "ικα", "ικο"):
        ln -= 3
        removed = True
    elif ln > 4 and ew_any(ln, "ικου", "ικων"):
        ln -= 4
        removed = True
    if removed and (ev(ln) or stem_of(ln) in _EXC6):
        ln += 2  # add back -ικ

    # rule 7
    if ln == 5 and ew(ln, "αγαμε"):
        ln -= 1
    else:
        if ln > 7 and ew(ln, "ηθηκαμε"):
            ln -= 7
        elif ln > 6 and ew(ln, "ουσαμε"):
            ln -= 6
        elif ln > 5 and ew_any(ln, "αγαμε", "ησαμε", "ηκαμε"):
            ln -= 5
        if ln > 3 and ew(ln, "αμε"):
            ln -= 3
            if stem_of(ln) in _EXC7:
                ln += 2  # add back -αμ

    # rule 8 (guards bind only to the first alternative — quirk kept)
    removed = False
    if ln > 8 and ew(ln, "ιουντανε"):
        ln -= 8
        removed = True
    elif (ln > 7 and ew(ln, "ιοντανε")) or ew_any(ln, "ουντανε", "ηθηκανε"):
        ln -= 7
        removed = True
    elif (ln > 6 and ew(ln, "ιοτανε")) or ew_any(ln, "οντανε", "ουσανε"):
        ln -= 6
        removed = True
    elif (ln > 5 and ew(ln, "αγανε")) or ew_any(ln, "ησανε", "οτανε",
                                                "ηκανε"):
        ln -= 5
        removed = True
    if removed and stem_of(ln) in _EXC8A:
        ln += 4
        s[ln - 4: ln] = list("αγαν")
    if ln > 3 and ew(ln, "ανε"):
        ln -= 3
        if ev_noy(ln) or stem_of(ln) in _EXC8B:
            ln += 2  # add back -αν

    # rule 9
    if ln > 5 and ew(ln, "ησετε"):
        ln -= 5
    if ln > 3 and ew(ln, "ετε"):
        ln -= 3
        if (stem_of(ln) in _EXC9 or ev_noy(ln) or ew_any(
            ln, "οδ", "αιρ", "φορ", "ταθ", "διαθ", "σχ", "ενδ", "ευρ",
            "τιθ", "υπερθ", "ραθ", "ενθ", "ροθ", "σθ", "πυρ", "αιν",
            "συνδ", "συν", "συνθ", "χωρ", "πον", "βρ", "καθ", "ευθ",
            "εκθ", "νετ", "ρον", "αρκ", "βαρ", "βολ", "ωφελ"
        )):
            ln += 2  # add back -ετ

    # rule 10
    if ln > 5 and ew_any(ln, "οντασ", "ωντασ"):
        ln -= 5
        if ln == 3 and ew(ln, "αρχ"):
            ln += 3
            s[ln - 3] = "ο"
        if ew(ln, "κρε"):
            ln += 3
            s[ln - 3] = "ω"

    # rule 11
    if ln > 6 and ew(ln, "ομαστε"):
        ln -= 6
        if ln == 2 and ew(ln, "ον"):
            ln += 5  # add back -ομαστ
    elif ln > 7 and ew(ln, "ιομαστε"):
        ln -= 7
        if ln == 2 and ew(ln, "ον"):
            ln += 5
            s[ln - 5: ln] = list("ομαστ")

    # rule 12
    if ln > 5 and ew(ln, "ιεστε"):
        ln -= 5
        if stem_of(ln) in _EXC12A:
            ln += 4  # add back -ιεστ
    if ln > 4 and ew(ln, "εστε"):
        ln -= 4
        if stem_of(ln) in _EXC12B:
            ln += 3  # add back -εστ

    # rule 13
    if ln > 6 and ew(ln, "ηθηκεσ"):
        ln -= 6
    elif ln > 5 and ew_any(ln, "ηθηκα", "ηθηκε"):
        ln -= 5
    removed = False
    if ln > 4 and ew(ln, "ηκεσ"):
        ln -= 4
        removed = True
    elif ln > 3 and ew_any(ln, "ηκα", "ηκε"):
        ln -= 3
        removed = True
    if removed and (stem_of(ln) in _EXC13 or ew_any(
            ln, "σκωλ", "σκουλ", "ναρθ", "σφ", "οθ", "πιθ")):
        ln += 2  # add back -ηκ

    # rule 14
    removed = False
    if ln > 5 and ew(ln, "ουσεσ"):
        ln -= 5
        removed = True
    elif ln > 4 and ew_any(ln, "ουσα", "ουσε"):
        ln -= 4
        removed = True
    if removed and (stem_of(ln) in _EXC14 or ev(ln) or ew_any(
            ln, "ποδαρ", "βλεπ", "πανταχ", "φρυδ", "μαντιλ", "μαλλ",
            "κυματ", "λαχ", "ληγ", "φαγ", "ομ", "πρωτ")):
        ln += 3  # add back -ουσ

    # rule 15
    removed = False
    if ln > 4 and ew(ln, "αγεσ"):
        ln -= 4
        removed = True
    elif ln > 3 and ew_any(ln, "αγα", "αγε"):
        ln -= 3
        removed = True
    if removed:
        cond1 = stem_of(ln) in _EXC15A or ew_any(
            ln, "οφ", "πελ", "χορτ", "λλ", "σφ", "ρπ", "φρ", "πρ",
            "λοχ", "σμην")
        cond2 = stem_of(ln) in _EXC15B or ew(ln, "κολλ")
        if cond1 and not cond2:
            ln += 2  # add back -αγ

    # rule 16
    removed = False
    if ln > 4 and ew(ln, "ησου"):
        ln -= 4
        removed = True
    elif ln > 3 and ew_any(ln, "ησε", "ησα"):
        ln -= 3
        removed = True
    if removed and stem_of(ln) in _EXC16:
        ln += 2  # add back -ησ

    # rule 17
    if ln > 4 and ew(ln, "ηστε"):
        ln -= 4
        if stem_of(ln) in _EXC17:
            ln += 3  # add back -ηστ

    # rule 18
    removed = False
    if ln > 6 and ew_any(ln, "ησουνε", "ηθουνε"):
        ln -= 6
        removed = True
    elif ln > 4 and ew(ln, "ουνε"):
        ln -= 4
        removed = True
    if removed and stem_of(ln) in _EXC18:
        ln += 3
        s[ln - 3: ln] = list("ουν")

    # rule 19
    removed = False
    if ln > 6 and ew_any(ln, "ησουμε", "ηθουμε"):
        ln -= 6
        removed = True
    elif ln > 4 and ew(ln, "ουμε"):
        ln -= 4
        removed = True
    if removed and stem_of(ln) in _EXC19:
        ln += 3
        s[ln - 3: ln] = list("ουμ")

    # rule 20
    if ln > 5 and ew_any(ln, "ματων", "ματοσ"):
        ln -= 3
    elif ln > 4 and ew(ln, "ματα"):
        ln -= 2

    # rule 21 — the long list, only if nothing above fired
    if ln == orig:
        if ln > 9 and ew(ln, "ιοντουσαν"):
            ln -= 9
        elif ln > 8 and ew_any(ln, "ιομασταν", "ιοσασταν", "ιουμαστε",
                               "οντουσαν"):
            ln -= 8
        elif ln > 7 and ew_any(ln, "ιεμαστε", "ιεσαστε", "ιομουνα",
                               "ιοσαστε", "ιοσουνα", "ιουνται",
                               "ιουνταν", "ηθηκατε", "ομασταν",
                               "οσασταν", "ουμαστε"):
            ln -= 7
        elif ln > 6 and ew_any(ln, "ιομουν", "ιονταν", "ιοσουν",
                               "ηθειτε", "ηθηκαν", "ομουνα", "οσαστε",
                               "οσουνα", "ουνται", "ουνταν", "ουσατε"):
            ln -= 6
        elif ln > 5 and ew_any(ln, "αγατε", "ιεμαι", "ιεται", "ιεσαι",
                               "ιοταν", "ιουμα", "ηθεισ", "ηθουν",
                               "ηκατε", "ησατε", "ησουν", "ομουν",
                               "ονται", "ονταν", "οσουν", "ουμαι",
                               "ουσαν"):
            ln -= 5
        elif ln > 4 and ew_any(ln, "αγαν", "αμαι", "ασαι", "αται",
                               "ειτε", "εσαι", "εται", "ηδεσ", "ηδων",
                               "ηθει", "ηκαν", "ησαν", "ησει", "ησεσ",
                               "ομαι", "οταν"):
            ln -= 4
        elif ln > 3 and ew_any(ln, "αει", "εισ", "ηθω", "ησω", "ουν",
                               "ουσ"):
            ln -= 3
        elif ln > 2 and ew_any(ln, "αν", "ασ", "αω", "ει", "εσ", "ησ",
                               "οι", "οσ", "ου", "υσ", "ων"):
            ln -= 2
        elif ln > 1 and ev(ln):
            ln -= 1

    # rule 22 — comparatives / superlatives
    if ew_any(ln, "εστερ", "εστατ"):
        ln -= 5
    elif ew_any(ln, "οτερ", "οτατ", "υτερ", "υτατ", "ωτερ", "ωτατ"):
        ln -= 4

    return "".join(s[:ln])


class GreekStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [greek_stem(t) for t in tokens]


class GreekLowerCaseAnalyzer(Analyzer):
    """StandardTokenizer -> GreekLowerCaseFilter (final sigma + tonos
    folding happens at the case step, before stemming)."""

    name = "greek_lower"

    def tokenize_one(self, text: str) -> list[str]:
        return [greek_lowercase(text[s:e]) for s, e, _ in uax29.scan(text)]

    def tokenize_with_offsets_one(self, text: str):
        toks, starts, ends = [], [], []
        for st, en, _ in uax29.scan(text):
            toks.append(greek_lowercase(text[st:en]))
            starts.append(st)
            ends.append(en)
        return toks, starts, ends


register_analyzer(
    "greek",
    lambda: FilteredAnalyzer(
        GreekLowerCaseAnalyzer(), [GreekStemFilter()], "greek"
    ),
)
