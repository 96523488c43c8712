"""Bengali and Telugu analysis (SURVEY.md §2.2 analysis zoo).

Reference contracts:
- ``analysis/common/.../bn/BengaliNormalizer.java`` — the UzZaman/Khan
  spelling-normalization rules (chandrabindu deletion, long→short
  vowel signs, khio/ja-phala/ba-phala rewrites, visarga handling,
  sh/na/ra unifications) — and ``bn/BengaliStemmer.java`` — the
  Sengupta/Chaudhuri verb-phrase suffix ladder (8→1 char suffixes,
  each guarded by a minimum length).
- ``analysis/common/.../te/TeluguNormalizer.java`` — candrabindu→bindu,
  visarga/zwj deletion, long→short vowels and matras, decomposed
  diphthong recomposition — and ``te/TeluguStemmer.java`` — plural/
  case suffix ladder.

Both verified differentially against the compiled reference classes
(exact match on the full dev word sets; archives not committed). Used
by bn/BengaliAnalyzer.java and te/TeluguAnalyzer.java chains.
"""

from __future__ import annotations

from lucene_spark.analysis.analyzer import StandardAnalyzer
from lucene_spark.analysis.filters import (
    FilteredAnalyzer,
    TokenFilter,
    register_analyzer,
)

__all__ = [
    "bengali_normalize", "bengali_stem", "telugu_normalize", "telugu_stem",
    "BengaliNormalizationFilter", "BengaliStemFilter",
    "TeluguNormalizationFilter", "TeluguStemFilter",
]


def bengali_normalize(word: str) -> str:
    s = list(word)
    i = 0
    while i < len(s):
        c = s[i]
        if c == "ঁ":  # chandrabindu: delete
            del s[i]
            i -= 1
        elif c == "ী":  # dirgho-i kar -> rossho-i kar
            s[i] = "ি"
        elif c == "ূ":  # dirgho-u kar -> rossho-u kar
            s[i] = "ু"
        elif c == "ক":  # khio
            if i + 2 < len(s) and s[i + 1] == "্" and s[i + 2] == "ি":
                if i == 0:
                    s[i] = "খ"
                    del s[i + 2]
                    del s[i + 1]
                else:
                    s[i + 1] = "খ"
                    del s[i + 2]
        elif c == "ঙ":  # nga -> anusvara
            s[i] = "ং"
        elif c == "য":  # ja phala
            if i - 2 == 0 and s[i - 1] == "্":
                s[i - 1] = "ে"
                if i + 1 < len(s) and s[i + 1] == "া":
                    del s[i + 1]
                del s[i]
                i -= 1
            elif i - 1 >= 0 and s[i - 1] == "্":
                del s[i]
                del s[i - 1]
                i -= 2
        elif c == "ব":  # ba phala
            if i == 0 or s[i - 1] != "্":
                pass
            elif i - 2 == 0:
                del s[i]
                del s[i - 1]
                i -= 2
            elif i - 5 >= 0 and s[i - 3] == "্":
                del s[i]
                del s[i - 1]
                i -= 2
            elif i - 2 >= 0:
                s[i - 1] = s[i - 2]
                del s[i]
                i -= 1
        elif c == "ঃ":  # visarga
            if i == len(s) - 1:
                if len(s) <= 3:
                    s[i] = "হ"
                else:
                    del s[i]
            else:
                s[i] = s[i + 1]
        elif c in ("শ", "ষ"):  # sh unification
            s[i] = "স"
        elif c == "ণ":  # na
            s[i] = "ন"
        elif c in ("ড়", "ঢ়"):  # ra
            s[i] = "র"
        elif c == "ৎ":  # khanda-ta -> ta
            s[i] = "ত"
        i += 1
    return "".join(s)


# (min_len, cut, suffixes) ladders — BengaliStemmer.java:31-160.
# The reference literals use PRECOMPOSED U+09DF (য়); source files here
# may carry the decomposed YA+NUKTA form, so normalize at load time to
# keep the suffix lengths (and hence the cut counts) exact.
def _pc(sufs: tuple[str, ...]) -> tuple[str, ...]:
    return tuple(s.replace("\u09af\u09bc", "\u09df") for s in sufs)


_BN_LADDER_RAW = [
    (9, 8, ("িয়াছিলাম", "িতেছিলাম", "িতেছিলেন", "ইতেছিলেন", "িয়াছিলেন",
            "ইয়াছিলেন")),
    (8, 7, ("িতেছিলি", "িতেছিলে", "িয়াছিলা", "িয়াছিলে", "িতেছিলা",
            "িয়াছিলি", "য়েদেরকে")),
    (7, 6, ("িতেছিস", "িতেছেন", "িয়াছিস", "িয়াছেন", "েছিলাম", "েছিলেন",
            "েদেরকে")),
    (6, 5, ("িতেছি", "িতেছা", "িতেছে", "ছিলাম", "ছিলেন", "িয়াছি",
            "িয়াছা", "িয়াছে", "েছিলে", "েছিলা", "য়েদের", "দেরকে")),
    (5, 4, ("িলাম", "িলেন", "িতাম", "িতেন", "িবেন", "ছিলি", "ছিলে",
            "ছিলা", "তেছে", "িতেছ", "খানা", "খানি", "গুলো", "গুলি",
            "য়েরা", "েদের")),
    (4, 3, ("লাম", "িলি", "ইলি", "িলে", "ইলে", "লেন", "িলা", "ইলা",
            "তাম", "িতি", "ইতি", "িতে", "ইতে", "তেন", "িতা", "িবা",
            "ইবা", "িবি", "ইবি", "বেন", "িবে", "ইবে", "ছেন", "য়োন",
            "য়ের", "েরা", "দের")),
    (3, 2, ("িস", "েন", "লি", "লে", "লা", "তি", "তে", "তা", "বি", "বে",
            "বা", "ছি", "ছা", "ছে", "ুন", "ুক", "টা", "টি", "নি", "ের",
            "রা", "কে")),
    (2, 1, ("ি", "ী", "া", "ো", "ে", "ব", "ত")),
]
_BN_LADDER = [(m, c, _pc(sufs)) for m, c, sufs in _BN_LADDER_RAW]


def bengali_stem(word: str) -> str:
    for min_len, cut, sufs in _BN_LADDER:
        if len(word) > min_len and word.endswith(sufs):
            return word[:-cut]
    return word


def telugu_normalize(word: str) -> str:
    s = list(word)
    i = 0
    while i < len(s):
        c = s[i]
        if c in ("ఀ", "ఁ"):  # candrabindu -> bindu
            s[i] = "ం"
        elif c in ("ః", "‍", "‌"):  # visarga / zwj / zwnj
            del s[i]
            i -= 1
        elif c == "ఔ":
            s[i] = "ఓ"
        elif c == "ఐ":
            s[i] = "ఏ"
        elif c == "ఆ":
            s[i] = "అ"
        elif c == "ఈ":
            s[i] = "ఇ"
        elif c == "ఊ":
            s[i] = "ఉ"
        elif c == "ీ":
            s[i] = "ి"
        elif c == "ూ":
            s[i] = "ు"
        elif c == "ే":
            s[i] = "ె"
        elif c == "ో":
            s[i] = "ొ"
        elif c == "ె" and i + 1 < len(s) and s[i + 1] == "ౖ":
            s[i] = "ై"
            del s[i + 1]
        elif c == "ఒ" and i + 1 < len(s):
            if s[i + 1] == "ౕ":
                s[i] = "ఓ"
                del s[i + 1]
            elif s[i + 1] == "ౌ":
                s[i] = "ఔ"
                del s[i + 1]
        i += 1
    return "".join(s)


_TE_LADDER = [
    (5, 4, ("ళ్ళు", "డ్లు")),
    (3, 2, ("డు", "ము", "వు", "లు", "ని", "ను", "చే", "కై", "లో", "ది",
            "కి", "సు", "వై", "పై")),
    (2, 1, ("ి", "ీ", "ు", "ూ", "ె", "ే", "ొ", "ో", "ా")),
]


def telugu_stem(word: str) -> str:
    for min_len, cut, sufs in _TE_LADDER:
        if len(word) > min_len and word.endswith(sufs):
            return word[:-cut]
    return word


class BengaliNormalizationFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [bengali_normalize(t) for t in tokens]


class BengaliStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [bengali_stem(t) for t in tokens]


class TeluguNormalizationFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [telugu_normalize(t) for t in tokens]


class TeluguStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [telugu_stem(t) for t in tokens]


# BengaliAnalyzer.java / TeluguAnalyzer.java chains minus the verbatim
# stop-word data files (same policy as the other language analyzers)
register_analyzer(
    "bengali",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(),
        [BengaliNormalizationFilter(), BengaliStemFilter()],
        "bengali",
    ),
)
register_analyzer(
    "telugu",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(),
        [TeluguNormalizationFilter(), TeluguStemFilter()],
        "telugu",
    ),
)
