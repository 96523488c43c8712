"""Snowball Romanian, Catalan and Basque stemmers (SURVEY.md §2.2 analysis zoo).

Reference contract: the generated
``org/tartarus/snowball/ext/RomanianStemmer.java`` /
``CatalanStemmer.java`` used by ``ro/RomanianAnalyzer.java`` and
``ca/CatalanAnalyzer.java`` via SnowballFilter — mechanical compilations
of the published Snowball algorithms (snowballstem.org), re-expressed
here as suffix ladders. Verified differentially against the compiled
reference stemmers at development time (archives not committed; curated
goldens in tests/test_snowball_multi.py).
"""

from __future__ import annotations

from lucene_spark.analysis.analyzer import StandardAnalyzer
from lucene_spark.analysis.filters import (
    FilteredAnalyzer,
    TokenFilter,
    register_analyzer,
)

__all__ = ["romanian_stem", "catalan_stem", "basque_stem",
           "RomanianStemFilter", "CatalanStemFilter", "BasqueStemFilter"]


def _p1_p2(w: str, V: frozenset[str]) -> tuple[int, int]:
    """Standard snowball R1/R2: after the first / second
    vowel-followed-by-non-vowel pair."""
    n = len(w)
    p1 = p2 = n
    i = 0
    while i < n and w[i] not in V:
        i += 1
    while i < n and w[i] in V:
        i += 1
    if i < n:
        p1 = i + 1
        i += 1
        while i < n and w[i] not in V:
            i += 1
        while i < n and w[i] in V:
            i += 1
        if i < n:
            p2 = i + 1
    return p1, p2


def _rv_romance(w: str, V: frozenset[str]) -> int:
    """Romance pV: if the 2nd letter is a consonant, after the next
    vowel; if the first two letters are vowels, after the next
    consonant; otherwise (consonant-vowel) after the 3rd letter; end of
    word when not found."""
    n = len(w)
    if n < 2:
        return n
    if w[0] in V:
        if w[1] not in V:
            i = 2
            while i < n and w[i] not in V:
                i += 1
            return i + 1 if i < n else n
        i = 2
        while i < n and w[i] in V:
            i += 1
        return i + 1 if i < n else n
    if w[1] not in V:
        i = 2
        while i < n and w[i] not in V:
            i += 1
        return i + 1 if i < n else n
    return 3 if n > 2 else n


def _longest(w: str, sufs) -> str | None:
    best = None
    for s in sufs:
        if w.endswith(s) and (best is None or len(s) > len(best)):
            best = s
    return best


# --------------------------------------------------------------------------
# Romanian
# --------------------------------------------------------------------------

_RO_V = frozenset("aeiouâîă")

# step 0: plural/article suffixes in R1 -> replacement
_RO_STEP0 = {
    "ul": "", "ului": "",
    "aua": "a",
    "ea": "e", "ele": "e", "elor": "e",
    "ii": "i", "iua": "i", "iei": "i", "iile": "i", "ilor": "i",
    "iilor": "i",
    "ile": "i",  # unless preceded by 'ab'
    "atei": "at",
    "ație": "ați", "ația": "ați",
}
# combining suffixes (R1), applied repeatedly: suffix -> replacement
_RO_COMBO = {
    **{s: "abil" for s in ("abilitate", "abilitati", "abilităi", "abilități")},
    "ibilitate": "ibil",
    **{s: "iv" for s in ("ivitate", "ivitati", "ivităi", "ivități")},
    **{s: "ic" for s in ("icala", "iciva", "icale", "icitate", "icive",
                         "icali", "icatori", "icitati", "icivi", "icităi",
                         "icități", "ical", "icator", "iciv", "icală",
                         "icivă")},
    **{s: "at" for s in ("ativa", "ațiune", "atoare", "ătoare", "ative",
                         "atori", "ători", "ativi", "ator", "ător",
                         "ativ", "ativă")},
    **{s: "it" for s in ("itiva", "ițiune", "itoare", "itive", "itori",
                         "itivi", "itor", "itiv", "itivă")},
}
_RO_COMBO_ORDER = sorted(_RO_COMBO, key=len, reverse=True)
# standard suffixes (R2)
_RO_STD_DEL = ("ica", "abila", "ibila", "oasa", "ata", "ita", "anta",
               "uta", "iva", "ic", "ice", "abile", "ibile", "oase", "ate",
               "itate", "ite", "ante", "ute", "ive", "ici", "abili",
               "ibili", "atori", "osi", "ati", "itati", "iti", "anti",
               "uti", "ivi", "ităi", "oși", "ități", "abil", "ibil",
               "ator", "os", "at", "it", "ant", "ut", "iv", "ică",
               "abilă", "ibilă", "oasă", "ată", "ită", "antă", "ută",
               "ivă")
_RO_STD_IUNE = ("iune", "iuni")
_RO_STD_IST = ("ista", "isme", "iste", "isti", "iști", "ism", "ist",
               "istă")
_RO_STD_ORDER = sorted(_RO_STD_DEL + _RO_STD_IUNE + _RO_STD_IST,
                       key=len, reverse=True)
# verb suffixes (within RV)
_RO_VERB_COND = ("ea", "ia", "esc", "ăsc", "ind", "ând", "are", "ere",
                 "ire", "âre", "ase", "ise", "use", "âse", "ește", "ăște",
                 "eze", "ai", "eai", "iai", "ești", "ăști", "ui", "ezi",
                 "âi", "ași", "aseși", "iseși", "useși", "âseși", "iși",
                 "uși", "âși", "eați", "iați", "arăți", "aserăți",
                 "iserăți", "userăți", "âserăți", "irăți", "urăți",
                 "ârăți", "am", "eam", "iam", "asem", "isem", "usem",
                 "âsem", "arăm", "aserăm", "iserăm", "userăm", "âserăm",
                 "irăm", "urăm", "ârăm", "au", "eau", "iau", "indu",
                 "ându", "ez", "ească", "ară", "aseră", "iseră", "useră",
                 "âseră", "iră", "ură", "âră", "ează")
_RO_VERB_PLAIN = ("se", "sese", "sei", "seși", "seseși", "ați", "eți",
                  "iți", "âți", "serăți", "seserăți", "em", "sesem",
                  "im", "âm", "ăm", "serăm", "seserăm", "seră", "seseră")
_RO_VERB_ORDER = sorted(_RO_VERB_COND + _RO_VERB_PLAIN, key=len,
                        reverse=True)
_RO_VOWEL = sorted(("a", "e", "ie", "i", "ă"), key=len, reverse=True)


def romanian_stem(word: str) -> str:
    # norm: cedilla forms to comma-below forms
    w = word.replace("ş", "ș").replace("ţ", "ț")
    # prelude: u/i between vowels -> U/I
    out = list(w)
    for i in range(1, len(out) - 1):
        if out[i] in ("u", "i") and out[i - 1] in _RO_V and out[i + 1] in _RO_V:
            out[i] = out[i].upper()
    w = "".join(out)

    pV = _rv_romance(w, _RO_V)
    p1, p2 = _p1_p2(w, _RO_V)

    # step 0 (R1)
    s = _longest(w, _RO_STEP0)
    if s is not None and len(w) - len(s) >= p1:
        if not (s == "ile" and w[: len(w) - len(s)].endswith("ab")):
            w = w[: len(w) - len(s)] + _RO_STEP0[s]

    # standard suffixes: repeat combos (R1), then one a_4 action (R2)
    removed = False
    while True:
        s = _longest(w, _RO_COMBO_ORDER)
        if s is not None and len(w) - len(s) >= p1:
            w = w[: len(w) - len(s)] + _RO_COMBO[s]
            removed = True
            continue
        break
    s = _longest(w, _RO_STD_ORDER)
    if s is not None and len(w) - len(s) >= p2:
        if s in _RO_STD_IUNE:
            if w[: len(w) - len(s)].endswith("ț"):
                w = w[: len(w) - len(s) - 1] + "t"
                removed = True
        elif s in _RO_STD_IST:
            w = w[: len(w) - len(s)] + "ist"
            removed = True
        else:
            w = w[: len(w) - len(s)]
            removed = True

    # verb suffixes only when no standard suffix was removed; the among
    # is RV-limited DURING matching (limit_backward = pV), so a longer
    # suffix crossing pV falls back to a shorter in-region one
    if not removed:
        for s in _RO_VERB_ORDER:
            if w.endswith(s) and len(w) - len(s) >= pV:
                start = len(w) - len(s)
                if s in _RO_VERB_PLAIN:
                    w = w[:start]
                elif start > pV and (
                    w[start - 1] not in _RO_V or w[start - 1] == "u"
                ):
                    # preceded (within RV) by a non-vowel or by u
                    w = w[:start]
                break

    # final vowel (RV)
    s = _longest(w, _RO_VOWEL)
    if s is not None and len(w) - len(s) >= pV:
        w = w[: len(w) - len(s)]

    return w.replace("I", "i").replace("U", "u")


# --------------------------------------------------------------------------
# Catalan
# --------------------------------------------------------------------------

_CA_V = frozenset("aeiouàáèéíïòóúü")

_CA_PRONOUN = ("la", "-la", "sela", "le", "me", "-me", "se", "-te", "hi",
               "'hi", "li", "-li", "'l", "'m", "-m", "'n", "-n", "ho",
               "'ho", "lo", "selo", "'s", "las", "selas", "les", "-les",
               "'ls", "-ls", "'ns", "-ns", "ens", "los", "selos", "nos",
               "-nos", "vos", "us", "-us", "'t")
_CA_STD_R1 = ("enca", "ancia", "encia", "ència", "ícia", "inia", "íinia",
              "eria", "ària", "atòria", "alla", "ella", "ívola", "ima",
              "íssima", "ana", "ina", "era", "sfera", "ora", "dora",
              "adora", "adura", "esa", "osa", "assa", "essa", "issa",
              "eta", "ita", "ota", "ista", "ialista", "ionista", "iva",
              "ativa", "nça", "ístic", "enc", "esc", "ud", "atge", "ble",
              "able", "ible", "isme", "ialisme", "ionisme", "ivisme",
              "aire", "icte", "iste", "ici", "íci", "ari", "tori", "al",
              "il", "all", "ell", "ívol", "isam", "issem", "ìssem",
              "íssem", "íssim", "amen", "ìssin", "ar", "ificar", "egar",
              "ejar", "itar", "itzar", "fer", "or", "dor", "dur",
              "doras", "uds", "nces", "ancies", "encies", "ències",
              "ícies", "inies", "ínies", "eries", "àries", "atòries",
              "bles", "ables", "ibles", "imes", "íssimes", "formes",
              "ismes", "ialismes", "ines", "eres", "ores", "dores",
              "idores", "dures", "eses", "oses", "asses", "ictes",
              "ites", "otes", "istes", "ialistes", "ionistes", "ives",
              "atives", "allengües", "icis", "ícis", "aris", "toris",
              "ls", "als", "ells", "ims", "íssims", "ions", "cions",
              "esos", "osos", "assos", "issos", "ers", "ors", "dors",
              "adors", "idors", "ats", "itats", "bilitats", "ivitats",
              "ativitats", "ïtats", "ets", "ants", "ents", "ments",
              "aments", "ots", "uts", "ius", "trius", "atius", "ès",
              "és", "ís", "dís", "ós", "itat", "bilitat", "ivitat",
              "ativitat", "ïtat", "et", "ant", "ent", "ient", "ment",
              "ament", "isament", "ot", "isseu", "ìsseu", "ísseu",
              "triu", "íssiu", "atiu", "ó", "ió", "ció", "ació")
_CA_STD_R2_DEL = ("ada", "ades", "acions")
_CA_STD_LOG = ("lógica", "logia", "logía", "logi", "lógics", "logies",
               "lógiques", "logíes", "logis")
_CA_STD_IC = ("ica", "ic", "ics", "iques")
_CA_STD_C = ("quíssima", "quíssim", "quíssimes", "quíssims")
_CA_STD_ORDER = sorted(
    _CA_STD_R1 + _CA_STD_R2_DEL + _CA_STD_LOG + _CA_STD_IC + _CA_STD_C,
    key=len, reverse=True,
)
_CA_VERB_R1 = ("aba", "esca", "isca", "ïsca", "ada", "ida", "uda", "ïda",
               "ia", "aria", "iria", "ara", "iera", "ira", "adora",
               "ïra", "ava", "ixa", "itza", "ía", "aría", "ería", "iría",
               "ïa", "isc", "ïsc", "ad", "ed", "id", "ie", "re", "dre",
               "ase", "iese", "aste", "iste", "ii", "ini", "esqui",
               "eixi", "itzi", "am", "em", "arem", "irem", "àrem",
               "írem", "àssem", "éssem", "iguem", "ïguem", "avem",
               "àvem", "ávem", "irìem", "íem", "aríem", "iríem",
               "assim", "essim", "issim", "àssim", "èssim", "éssim",
               "íssim", "ïm", "an", "aban", "arian", "aran", "ieran",
               "iran", "ían", "arían", "erían", "irían", "en", "ien",
               "arien", "irien", "aren", "eren", "iren", "àren", "ïren",
               "asen", "iesen", "assen", "essen", "issen", "éssen",
               "ïssen", "esquen", "isquen", "ïsquen", "aven", "ixen",
               "eixen", "ïxen", "ïen", "in", "inin", "sin", "isin",
               "assin", "essin", "issin", "ïssin", "esquin", "eixin",
               "aron", "ieron", "arán", "erán", "irán", "iïn", "ado",
               "ido", "iendo", "io", "ixo", "eixo", "ïxo", "itzo", "ar",
               "tzar", "er", "eixer", "ir", "ador", "as", "abas",
               "adas", "idas", "aras", "ieras", "ías", "arías", "erías",
               "irías", "ids", "es", "ades", "ides", "udes", "ïdes",
               "atges", "ies", "aries", "iries", "ares", "ires",
               "adores", "ïres", "ases", "ieses", "asses", "esses",
               "isses", "ïsses", "ques", "esques", "ïsques", "aves",
               "ixes", "eixes", "ïxes", "ïes", "abais", "arais",
               "ierais", "íais", "aríais", "eríais", "iríais", "aseis",
               "ieseis", "asteis", "isteis", "inis", "sis", "isis",
               "assis", "essis", "issis", "ïssis", "esquis", "eixis",
               "itzis", "áis", "aréis", "eréis", "iréis", "ams", "ados",
               "idos", "amos", "ábamos", "áramos", "iéramos", "íamos",
               "aríamos", "eríamos", "iríamos", "aremos", "eremos",
               "iremos", "ásemos", "iésemos", "imos", "adors", "ass",
               "erass", "ess", "ats", "its", "ents", "às", "aràs",
               "iràs", "arás", "erás", "irás", "és", "arés", "ís",
               "iïs", "at", "it", "ant", "ent", "int", "ut", "ït", "au",
               "erau", "ieu", "ineu", "areu", "ireu", "àreu", "íreu",
               "asseu", "esseu", "eresseu", "àsseu", "ésseu", "igueu",
               "ïgueu", "àveu", "áveu", "itzeu", "ìeu", "irìeu", "íeu",
               "aríeu", "iríeu", "assiu", "issiu", "àssiu", "èssiu",
               "éssiu", "íssiu", "ïu", "ix", "eix", "ïx", "itz", "ià",
               "arà", "irà", "itzà", "ará", "erá", "irá", "irè", "aré",
               "eré", "iré", "í", "iï", "ió")
_CA_VERB_R2 = ("ando",)
_CA_VERB_ORDER = sorted(_CA_VERB_R1 + _CA_VERB_R2, key=len, reverse=True)
_CA_RESIDUAL = sorted(
    ("a", "e", "i", "ïn", "o", "ir", "s", "is", "os", "ïs", "it", "eu",
     "iu", "itz", "à", "á", "é", "ì", "í", "ï", "ó", "iqu"),
    key=len, reverse=True,
)
_CA_CLEAN = str.maketrans(
    {"à": "a", "á": "a", "è": "e", "é": "e", "ì": "i", "í": "i",
     "ï": "i", "ò": "o", "ó": "o", "ú": "u", "ü": "u", "·": "."}
)


def catalan_stem(word: str) -> str:
    w = word
    p1, p2 = _p1_p2(w, _CA_V)

    s = _longest(w, _CA_PRONOUN)
    if s is not None and len(w) - len(s) >= p1:
        w = w[: len(w) - len(s)]

    standard_ok = False
    s = _longest(w, _CA_STD_ORDER)
    if s is not None:
        start = len(w) - len(s)
        if s in _CA_STD_R2_DEL:
            if start >= p2:
                w, standard_ok = w[:start], True
        elif s in _CA_STD_LOG:
            if start >= p2:
                w, standard_ok = w[:start] + "log", True
        elif s in _CA_STD_IC:
            if start >= p2:
                w, standard_ok = w[:start] + "ic", True
        elif s in _CA_STD_C:
            if start >= p1:
                w, standard_ok = w[:start] + "c", True
        elif start >= p1:
            w, standard_ok = w[:start], True

    if not standard_ok:
        s = _longest(w, _CA_VERB_ORDER)
        if s is not None:
            start = len(w) - len(s)
            if s in _CA_VERB_R2:
                if start >= p2:
                    w = w[:start]
            elif start >= p1:
                w = w[:start]

    s = _longest(w, _CA_RESIDUAL)
    if s is not None and len(w) - len(s) >= p1:
        if s == "iqu":
            w = w[: len(w) - 3] + "ic"
        else:
            w = w[: len(w) - len(s)]

    return w.translate(_CA_CLEAN)


class RomanianStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [romanian_stem(t) for t in tokens]


class CatalanStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [catalan_stem(t) for t in tokens]


register_analyzer(
    "romanian",
    lambda: FilteredAnalyzer(StandardAnalyzer(), [RomanianStemFilter()], "romanian"),
)
register_analyzer(
    "catalan",
    lambda: FilteredAnalyzer(StandardAnalyzer(), [CatalanStemFilter()], "catalan"),
)


# --------------------------------------------------------------------------
# Basque (BasqueStemmer.java; snowballstem.org) — eu/BasqueAnalyzer.java
# --------------------------------------------------------------------------

_EU_V = frozenset("aeiou")

# verb suffixes (aditzak): suffix -> (replacement|None=delete, region)
_EU_ADITZAK = {
    **{s: (None, "rv") for s in (
        "idea", "bidea", "kidea", "pidea", "kundea", "galea", "tailea",
        "tzailea", "gunea", "kunea", "tzaga", "gaia", "aldia", "taldia",
        "karia", "karria", "ka", "tzaka", "la", "mena", "pena", "kina",
        "ezina", "tezina", "kuna", "tuna", "kizuna", "era", "bera",
        "kera", "pera", "orra", "korra", "dura", "gura", "kura", "tura",
        "eta", "keta", "gailua", "eza", "erreza", "gaitza", "kaitza",
        "kuntza", "ide", "bide", "kide", "pide", "kunde", "tzake",
        "tzeke", "le", "gale", "taile", "tzaile", "gune", "kune", "tze",
        "atze", "gai", "aldi", "taldi", "ki", "ari", "kari", "lari",
        "tari", "etari", "karri", "arazi", "tarazi", "an", "ean",
        "rean", "kan", "etan", "men", "pen", "kin", "rekin", "ezin",
        "tezin", "tun", "kizun", "go", "ago", "tio", "dako", "or",
        "kor", "tzat", "du", "gailu", "tu", "atu", "aldatu", "tatu",
        "ez", "errez", "tzez", "gaitz", "kaitz")},
    **{s: (None, "r2") for s in ("garria", "tza", "garri")},
    "atseden": ("atseden", None), "arabera": ("arabera", None),
    "baditu": ("baditu", None),
}
# noun suffixes (izenak)
_EU_IZENAK = {
    **{s: (None, "rv") for s in (
        "ada", "kada", "anda", "denda", "gabea", "kabea", "aldea",
        "kaldea", "taldea", "ordea", "zalea", "tzalea", "gilea", "emea",
        "kumea", "nea", "enea", "zionea", "unea", "gunea", "pea",
        "aurrea", "tea", "kotea", "artea", "ostea", "etxea", "ga",
        "anga", "gaia", "aldia", "taldia", "handia", "mendia", "geia",
        "egia", "degia", "tegia", "nahia", "ohia", "kia", "tokia",
        "oia", "koia", "aria", "karia", "laria", "taria", "eria",
        "keria", "teria", "larria", "kirria", "duria", "asia", "tia",
        "ezia", "bizia", "ontzia", "ka", "ska", "xka", "zka", "gibela",
        "gela", "kaila", "skila", "tila", "ola", "na", "kana", "ena",
        "garrena", "gerrena", "urrena", "zaina", "tzaina", "kina",
        "mina", "garna", "una", "duna", "asuna", "tasuna", "ondoa",
        "kondoa", "ngoa", "zioa", "koa", "takoa", "zkoa", "noa",
        "zinoa", "aroa", "taroa", "zaroa", "eroa", "oroa", "osoa",
        "toa", "ttoa", "ztoa", "txoa", "tzoa", "ñoa", "ra", "ara",
        "dara", "liara", "tiara", "tara", "etara", "tzara", "bera",
        "kera", "pera", "tzarra", "korra", "tra", "sa", "osa", "ta",
        "eta", "keta", "sta", "dua", "mendua", "ordua", "lekua",
        "burua", "durua", "tsua", "tua", "mentua", "estua", "txua",
        "zua", "tzua", "za", "eza", "eroza", "koitza", "antza",
        "gintza", "kintza", "kuntza", "gabe", "kabe", "kide", "alde",
        "kalde", "talde", "orde", "ge", "zale", "tzale", "gile", "eme",
        "kume", "ne", "zione", "une", "gune", "pe", "aurre", "te",
        "kote", "arte", "oste", "etxe", "gai", "di", "aldi", "taldi",
        "handi", "mendi", "gei", "egi", "degi", "tegi", "nahi", "ohi",
        "ki", "toki", "oi", "goi", "koi", "ari", "kari", "lari",
        "tari", "larri", "kirri", "duri", "asi", "ti", "ontzi", "ñi",
        "ak", "ek", "tarik", "gibel", "ail", "kail", "kan", "tan",
        "etan", "garren", "gerren", "urren", "zain", "tzain", "kin",
        "min", "dun", "asun", "tasun", "aizun", "ondo", "kondo", "go",
        "ngo", "zio", "ko", "tako", "etako", "eko", "tariko", "sko",
        "tuko", "zko", "no", "zino", "ro", "aro", "taro", "zaro",
        "ero", "giro", "oro", "oso", "to", "tto", "zto", "txo", "tzo",
        "gintzo", "ño", "zp", "ar", "dar", "behar", "liar", "tiar",
        "tar", "tzar", "kor", "os", "ket", "du", "mendu", "ordu",
        "leku", "duru", "tsu", "tu", "mentu", "estu", "txu", "zu",
        "tzu", "gintzu", "z", "ez", "eroz", "tz", "koitz")},
    **{s: (None, "r2") for s in ("garria", "ora", "tza", "garri", "ren",
                                 "or", "buru")},
    "joka": ("jok", None),
    **{s: (None, "r1") for s in ("en", "ten", "tzen", "tatu")},
    "trako": ("tra", None), "minutuko": ("minutu", None),
    "zehar": ("zehar", None), "geldi": ("geldi", None),
    "igaro": ("igaro", None), "aurka": ("aurka", None),
}
# adjective suffixes (adjetiboak)
_EU_ADJ = {
    **{s: (None, "rv") for s in (
        "keria", "la", "era", "dade", "tade", "date", "tate", "gi",
        "ki", "ik", "lanik", "rik", "larik", "ztik", "go", "ro", "ero",
        "to")},
    "zlea": ("z", None),
}
_EU_ADITZAK_ORDER = sorted(_EU_ADITZAK, key=len, reverse=True)
_EU_IZENAK_ORDER = sorted(_EU_IZENAK, key=len, reverse=True)
_EU_ADJ_ORDER = sorted(_EU_ADJ, key=len, reverse=True)


def basque_stem(word: str) -> str:
    """BasqueStemmer.java: repeat aditzak, repeat izenak, one
    adjetiboak pass. The repeat loops do NOT re-anchor at the word end:
    each success leaves the match anchor at the start of the removed or
    replaced region, so self-replacements like atseden/zehar act as
    stop anchors rather than looping."""
    w = word
    rv = _rv_romance(w, _EU_V)
    p1, p2 = _p1_p2(w, _EU_V)
    end = len(w)

    def attempt(order, table) -> bool:
        nonlocal w, end
        seg = w[:end]
        best = None
        for s in order:
            if seg.endswith(s) and (best is None or len(s) > len(best)):
                best = s
        if best is None:
            return False
        start = end - len(best)
        rep, region = table[best]
        if region == "rv" and start < rv:
            return False
        if region == "r1" and start < p1:
            return False
        if region == "r2" and start < p2:
            return False
        w = w[:start] + (rep or "") + w[end:]
        end = start
        return True

    while attempt(_EU_ADITZAK_ORDER, _EU_ADITZAK):
        pass
    while attempt(_EU_IZENAK_ORDER, _EU_IZENAK):
        pass
    attempt(_EU_ADJ_ORDER, _EU_ADJ)
    return w


class BasqueStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [basque_stem(t) for t in tokens]


register_analyzer(
    "basque",
    lambda: FilteredAnalyzer(StandardAnalyzer(), [BasqueStemFilter()], "basque"),
)
