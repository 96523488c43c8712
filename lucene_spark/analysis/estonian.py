"""Snowball Estonian stemmer (SURVEY.md §2.2 analysis zoo).

Reference contract: the generated
``org/tartarus/snowball/ext/EstonianStemmer.java`` used by
``et/EstonianAnalyzer.java`` via SnowballFilter — the published
Snowball Estonian algorithm: whole-word irregular-verb normalization,
-gi/-ki emphasis particles with consonant-class and long-vowel guards,
verb endings, and the substantive pipeline (special noun endings, case
endings, first-three plural cases, degrees, i-plural, nu-forms)
followed by kk/pp/tt undoubling before a final vowel. Verified
differentially against the compiled reference stemmer (archives not
committed; curated goldens in tests/test_snowball_multi.py).
"""

from __future__ import annotations

from lucene_spark.analysis.analyzer import StandardAnalyzer
from lucene_spark.analysis.filters import (
    FilteredAnalyzer,
    TokenFilter,
    register_analyzer,
)

__all__ = ["estonian_stem", "EstonianStemFilter"]

_V1 = frozenset("aeiouäõöü")
_RV = frozenset("aeiou")
_GI = frozenset("aceijlmnoqruvwxäõöü")
_KI = frozenset("bdfghkpstzšž")
_LONGV = ("aa", "ee", "ii", "oo", "uu", "ää", "õõ", "öö", "üü")

_VERB_EXC = {}
for _rep, _forms in [
    ("joo", ["joob", "jood", "joodakse", "jooma", "joomata", "joome",
             "joon", "joote", "joovad", "juua", "juuakse", "jõi", "jõid",
             "jõime", "jõin", "jõite"]),
    ("saa", ["saab", "saad", "saada", "saadakse", "saadi", "saaks",
             "saaksid", "saaksime", "saaksin", "saaksite", "saama",
             "saamata", "saame", "saan", "saate", "saavad", "sai",
             "said", "saime", "sain", "saite"]),
    ("viima", ["viia", "viiakse", "viib", "viid", "viidi", "viiks",
               "viiksid", "viiksime", "viiksin", "viiksite", "viima",
               "viimata", "viime", "viin", "viisime", "viisin",
               "viisite", "viite", "viivad"]),
    ("keesi", ["keeb", "keed", "keedakse", "keeks", "keeksid",
               "keeksime", "keeksin", "keeksite", "keema", "keemata",
               "keeme", "keen", "kees", "keeta", "keete", "keevad"]),
    ("löö", ["lööb", "lööd", "löödakse", "löödi", "lööks", "lööksid",
             "lööksime", "lööksin", "lööksite", "lööma", "löömata",
             "lööme", "löön", "lööte", "löövad", "lüüa", "lüüakse"]),
    ("lõi", ["lõi", "lõid", "lõime", "lõin", "lõite"]),
    ("loo", ["loob", "lood", "loodi", "looks", "looksid", "looksime",
             "looksin", "looksite", "looma", "loomata", "loome", "loon",
             "loote", "loovad", "luua", "luuakse"]),
    ("käisi", ["käia", "käiakse", "käib", "käid", "käidi", "käiks",
               "käiksid", "käiksime", "käiksin", "käiksite", "käima",
               "käimata", "käime", "käin", "käis", "käite", "käivad"]),
    ("söö", ["sõi", "sõid", "sõime", "sõin", "sõite", "sööb", "sööd",
             "söödakse", "söödi", "sööks", "sööksid", "sööksime",
             "sööksin", "sööksite", "sööma", "söömata", "sööme", "söön",
             "sööte", "söövad", "süüa", "süüakse"]),
    ("too", ["toob", "tood", "toodi", "tooks", "tooksid", "tooksime",
             "tooksin", "tooksite", "tooma", "toomata", "toome", "toon",
             "toote", "toovad", "tuua", "tuuakse", "tõi", "tõid",
             "tõime", "tõin", "tõite"]),
    ("võisi", ["võib", "võid", "võida", "võidakse", "võidi", "võiks",
               "võiksid", "võiksime", "võiksin", "võiksite", "võima",
               "võimata", "võime", "võin", "võis", "võite", "võivad"]),
    ("jääma", ["jäi", "jäid", "jäime", "jäin", "jäite", "jääb", "jääd",
               "jääda", "jäädakse", "jäädi", "jääks", "jääksid",
               "jääksime", "jääksin", "jääksite", "jääma", "jäämata",
               "jääme", "jään", "jääte", "jäävad"]),
    ("müüsi", ["müüa", "müüakse", "müüb", "müüd", "müüdi", "müüks",
               "müüksid", "müüksime", "müüksin", "müüksite", "müüma",
               "müümata", "müüme", "müün", "müüs", "müüte", "müüvad"]),
    ("luge", ["loeb", "loed", "loeks", "loeksid", "loeksime", "loeksin",
              "loeksite", "loeme", "loen", "loete", "loevad"]),
    ("põde", ["põeb", "põed", "põeks", "põeksid", "põeksime", "põeksin",
              "põeksite", "põeme", "põen", "põete", "põevad"]),
    ("ladu", ["laob", "laod", "laoks", "laoksid", "laoksime", "laoksin",
              "laoksite", "laome", "laon", "laote", "laovad"]),
    ("tegi", ["teeb", "teed", "teeks", "teeksid", "teeksime", "teeksin",
              "teeksite", "teeme", "teen", "teete", "teevad", "tegema",
              "tegemata", "teha", "tehakse", "tehti"]),
    ("nägi", ["näeb", "näed", "näeks", "näeksid", "näeksime", "näeksin",
              "näeksite", "näeme", "näen", "näete", "näevad", "nägema",
              "nägemata", "näha", "nähakse", "nähti"]),
]:
    for _f in _forms:
        _VERB_EXC[_f] = _rep

_VERB_DEL = sorted(
    ["mata", "ksid", "nuksid", "sime", "ksime", "nuksime", "dakse",
     "takse", "site", "ksite", "nuksite", "sin", "ksin", "nuksin",
     "daks", "taks"], key=len, reverse=True)
_VERB_V1 = ("da", "b", "me", "n")
_VERB_ALL = sorted(_VERB_DEL + ["akse"] + list(_VERB_V1), key=len,
                   reverse=True)
_NOUN_SPECIAL = {
    **{s: "lase" for s in ("lane", "lasse", "lasi", "last")},
    **{s: "mise" for s in ("mine", "misse", "misi", "mist")},
    **{s: "lise" for s in ("line", "lisse", "lisi", "list")},
}
_NOUN_SPECIAL_ORDER = sorted(_NOUN_SPECIAL, key=len, reverse=True)
_CASE_RV = ("ga", "ta", "le", "sse", "l", "s", "ks", "lt", "st")
_CASE_ALL = sorted(_CASE_RV + ("t",), key=len, reverse=True)
_PLURAL = sorted(["ikkude", "ike", "ikke", "sid", "te", "d", "de"],
                 key=len, reverse=True)
_DEGREES = sorted(["mai", "m", "ma"], key=len, reverse=True)
_NU = ("va", "du", "nu", "tu")


def _longv_at(w: str, pos: int) -> bool:
    return pos >= 2 and w[pos - 2: pos] in _LONGV


def estonian_stem(word: str) -> str:
    # whole-word irregular verbs normalize and stop
    rep = _VERB_EXC.get(word)
    if rep is not None:
        return rep

    w = word
    n = len(w)
    # p1 = after the first non-vowel following the first vowel
    p1 = n
    i = 0
    while i < n and w[i] not in _V1:
        i += 1
    if i < n:
        while i < n and w[i] in _V1:
            i += 1
        if i < n:
            p1 = i + 1

    def in_r1(start: int) -> bool:
        return start >= p1

    # emphasis: -gi / -ki inside R1, at least 4 chars before the suffix
    if len(w) >= 2 and w.endswith(("gi", "ki")) and in_r1(len(w) - 2):
        start = len(w) - 2
        if start >= 4:
            if w[-2] == "g":
                if w[start - 1] in _GI and not _longv_at(w, start):
                    w = w[:start]
            elif w[start - 1] in _KI:
                w = w[:start]

    # verb endings OR the substantive pipeline
    verb_fired = False
    for s in _VERB_ALL:
        if w.endswith(s) and in_r1(len(w) - len(s)):
            start = len(w) - len(s)
            if s == "akse":
                w = w[:start] + "a"
                verb_fired = True
            elif s in _VERB_V1:
                if start >= 1 and w[start - 1] in _V1:
                    w = w[:start]
                    verb_fired = True
            else:
                w = w[:start]
                verb_fired = True
            break

    if not verb_fired:
        # special noun endings
        for s in _NOUN_SPECIAL_ORDER:
            if w.endswith(s) and in_r1(len(w) - len(s)):
                w = w[: len(w) - len(s)] + _NOUN_SPECIAL[s]
                break
        # case endings
        for s in _CASE_ALL:
            if w.endswith(s) and in_r1(len(w) - len(s)):
                start = len(w) - len(s)
                if s == "t" and s not in _CASE_RV:
                    if start >= 4:
                        w = w[:start]
                elif start >= 1 and (w[start - 1] in _RV or _longv_at(w, start)):
                    w = w[:start]
                break
        # plural, three first cases
        for s in _PLURAL:
            if w.endswith(s) and in_r1(len(w) - len(s)):
                start = len(w) - len(s)
                if s in ("ikkude", "ike", "ikke"):
                    w = w[:start] + "iku"
                elif s == "sid":
                    if not _longv_at(w, start):
                        w = w[:start]
                elif s == "te":
                    if start >= 4:
                        pre = w[:start]
                        if pre.endswith(("las", "lis", "mis")):
                            w = pre + "e"
                        elif pre.endswith("t"):
                            pass  # matched 't' in the inner among: no action
                        else:
                            w = pre
                    else:
                        w = w[:start] + "t"
                else:  # d / de
                    if start >= 1 and (w[start - 1] in _RV or _longv_at(w, start)):
                        w = w[:start]
                break
        # degrees
        for s in _DEGREES:
            if w.endswith(s) and in_r1(len(w) - len(s)):
                start = len(w) - len(s)
                if s in ("mai", "m"):
                    if start >= 1 and w[start - 1] in _RV:
                        w = w[:start]
                else:  # ma
                    w = w[:start]
                break
        # i-plural
        if w.endswith("i") and in_r1(len(w) - 1):
            start = len(w) - 1
            if start >= 1 and w[start - 1] in _RV:
                w = w[:start]
        # nu-forms
        for s in _NU:
            if w.endswith(s) and in_r1(len(w) - len(s)):
                w = w[: len(w) - len(s)]
                break

    # undouble kk/pp/tt before a final vowel
    if (
        len(w) >= 3
        and w[-1] in _V1
        and len(w) - 1 >= p1
        and w[-3:-1] in ("kk", "pp", "tt")
    ):
        w = w[:-2] + w[-1]

    return w


class EstonianStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [estonian_stem(t) for t in tokens]


register_analyzer(
    "estonian",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [EstonianStemFilter()], "estonian"
    ),
)
