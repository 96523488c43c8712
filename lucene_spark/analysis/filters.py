"""Token filters — the analysis/common zoo essentials, composable on
the batch-vectorized Analyzer chain (SURVEY.md §2.2).

Every filter here is ONE-TO-ONE per token (stemming, folding, synonym
canonicalization, stop removal) or emits a fresh stream (shingles,
edge n-grams), so position semantics stay exact: one-to-one filters
preserve the token-list index that segment.py turns into positions;
stream-rewriting filters are meant for their own field (the Lucene
pattern of analyzer-per-field).

Reference semantics:
- PorterStemFilter: analysis/common/src/java/org/apache/lucene/analysis/
  en/PorterStemFilter.java + PorterStemmer.java — the official Porter
  algorithm including the published departures (bli->ble, logi->log).
- EnglishMinimalStemFilter: en/EnglishMinimalStemFilter.java
  (Harman's S-stemmer) — also exactly expressible in ANSI SQL, so it
  carries the driver's stemmed-index correctness gate.
- ASCIIFoldingFilter: miscellaneous/ASCIIFoldingFilter.java — here via
  NFKD decomposition + combining-mark strip + an explicit table for the
  non-decomposable Latin supplements the reference folds by switch.
- SynonymGraphFilter: synonym/SynonymGraphFilter.java — single-token
  canonicalization form (map every synonym to its group's canonical
  term at index AND query time; the multi-token graph-insertion form is
  replaced by query-time SynonymQuery expansion, SURVEY §2.4).
- StopFilter: core StopFilter (positions of survivors keep their
  original slots? — Lucene increments position gaps; here survivors
  re-pack, a documented deviation acceptable because StopFilter defaults
  to OFF, as in StandardAnalyzer).
- ShingleFilter: shingle/ShingleFilter.java word-ngram emission.
- EdgeNGramTokenFilter: ngram/EdgeNGramTokenFilter.java (completion /
  suggest prefix surface).
"""

from __future__ import annotations

import re
import unicodedata

from lucene_spark.analysis.analyzer import (
    Analyzer,
    SimpleAnalyzer,
    StandardAnalyzer,
    _REGISTRY,
)


class TokenFilter:
    """list[str] -> list[str] per document (batch loop lives in the
    analyzer; filters are pure token-list transforms).

    ``offsets_safe``: True when apply() treats tokens independently
    (1:1 rewrites, drops, or same-span expansions) so char offsets can
    ride along per token; cross-token filters (shingles) set False and
    disqualify the chain from store_offsets indexing — exactly the
    OffsetAttribute preservation rule of the reference's filters."""

    offsets_safe = True

    def apply(self, tokens: list[str]) -> list[str]:
        raise NotImplementedError


class FilteredAnalyzer(Analyzer):
    """Tokenizer + filter chain — the Analyzer.TokenStreamComponents
    composition (Analyzer.java createComponents)."""

    def __init__(self, base: Analyzer, filters: list[TokenFilter], name: str):
        self.base = base
        self.filters = list(filters)
        self.name = name

    def tokenize_one(self, text: str) -> list[str]:
        toks = self.base.tokenize_one(text)
        for f in self.filters:
            toks = f.apply(toks)
        return toks

    def supports_offsets(self) -> bool:
        return self.base.supports_offsets() and all(
            f.offsets_safe for f in self.filters
        )

    def tokenize_with_offsets_one(self, text: str):
        toks, starts, ends = self.base.tokenize_with_offsets_one(text)
        for f in self.filters:
            if not f.offsets_safe:
                raise NotImplementedError(
                    f"{self.name}: {type(f).__name__} cannot track offsets"
                )
            hook = getattr(f, "apply_with_offsets", None)
            if hook is not None:
                # offset-aware stream filters (FixBrokenOffsets, limit-by-
                # offset) rewrite the (token, start, end) triples directly
                toks, starts, ends = hook(toks, starts, ends)
                continue
            ot, os_, oe = [], [], []
            # per-token application == batch application for offsets_safe
            # filters (stateless); outputs inherit the source span (the
            # reference's stemmers/edge-ngrams keep original offsets)
            for t, s0, e0 in zip(toks, starts, ends):
                for o in f.apply([t]):
                    ot.append(o)
                    os_.append(s0)
                    oe.append(e0)
            toks, starts, ends = ot, os_, oe
        return toks, starts, ends


# --------------------------------------------------------------------------
# Porter stemmer (PorterStemmer.java contract: official algorithm with
# the published departures)
# --------------------------------------------------------------------------

_VOWELS = set("aeiou")


def _is_cons(w: str, i: int) -> bool:
    c = w[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(w, i - 1)
    return True


def _measure(w: str) -> int:
    """m in [C](VC)^m[V] over the given stem."""
    m = 0
    i = 0
    n = len(w)
    while i < n and _is_cons(w, i):
        i += 1
    while i < n:
        while i < n and not _is_cons(w, i):
            i += 1
        if i >= n:
            break
        m += 1
        while i < n and _is_cons(w, i):
            i += 1
    return m


def _has_vowel(w: str) -> bool:
    return any(not _is_cons(w, i) for i in range(len(w)))


def _ends_double_cons(w: str) -> bool:
    return len(w) >= 2 and w[-1] == w[-2] and _is_cons(w, len(w) - 1)


def _ends_cvc(w: str) -> bool:
    if len(w) < 3:
        return False
    if not (_is_cons(w, len(w) - 3) and not _is_cons(w, len(w) - 2) and _is_cons(w, len(w) - 1)):
        return False
    return w[-1] not in "wxy"


def _replace_if(w: str, rules: list[tuple[str, str]], min_m: int) -> str:
    """First suffix in `rules` that matches decides; replace when the
    remaining stem has measure > min_m (the step-2/3/4 pattern)."""
    for suf, rep in rules:
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if _measure(stem) > min_m:
                return stem + rep
            return w
    return w


def porter_stem(word: str) -> str:
    w = word
    if len(w) <= 2:
        return w
    # step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]
    # step 1b
    flag = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed"):
        if _has_vowel(w[:-2]):
            w = w[:-2]
            flag = True
    elif w.endswith("ing"):
        if _has_vowel(w[:-3]):
            w = w[:-3]
            flag = True
    if flag:
        if w.endswith(("at", "bl", "iz")):
            w = w + "e"
        elif _ends_double_cons(w) and w[-1] not in "lsz":
            w = w[:-1]
        elif _measure(w) == 1 and _ends_cvc(w):
            w = w + "e"
    # step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"
    # step 2 (departures: bli->ble instead of abli->able; logi->log)
    w = _replace_if(
        w,
        [
            ("ational", "ate"), ("tional", "tion"), ("enci", "ence"),
            ("anci", "ance"), ("izer", "ize"), ("bli", "ble"),
            ("alli", "al"), ("entli", "ent"), ("eli", "e"),
            ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
            ("ator", "ate"), ("alism", "al"), ("iveness", "ive"),
            ("fulness", "ful"), ("ousness", "ous"), ("aliti", "al"),
            ("iviti", "ive"), ("biliti", "ble"), ("logi", "log"),
        ],
        0,
    )
    # step 3
    w = _replace_if(
        w,
        [
            ("icate", "ic"), ("ative", ""), ("alize", "al"),
            ("iciti", "ic"), ("ical", "ic"), ("ful", ""), ("ness", ""),
        ],
        0,
    )
    # step 4 (ion only after s/t)
    for suf in (
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant",
        "ement", "ment", "ent", "ion", "ou", "ism", "ate", "iti",
        "ous", "ive", "ize",
    ):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "ion" and not stem.endswith(("s", "t")):
                break
            if _measure(stem) > 1:
                w = stem
            break
    # step 5a
    if w.endswith("e"):
        m = _measure(w[:-1])
        if m > 1 or (m == 1 and not _ends_cvc(w[:-1])):
            w = w[:-1]
    # step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]
    return w


class PorterStemFilter(TokenFilter):
    """Porter stemmer with the KeywordMarkerFilter + StemmerOverrideFilter
    roles fused in (miscellaneous/KeywordMarkerFilter.java,
    StemmerOverrideFilter.java): `protected` tokens pass through
    unstemmed (the KeywordAttribute channel — tokens are plain strings
    here, so the consumer carries the mark), and `overrides` maps a
    token straight to a dictated stem, skipping the algorithm."""

    def __init__(
        self,
        protected: frozenset[str] = frozenset(),
        overrides: dict[str, str] | None = None,
    ):
        self.protected = protected
        self.overrides = overrides or {}

    def apply(self, tokens: list[str]) -> list[str]:
        if not self.protected and not self.overrides:
            return [porter_stem(t) for t in tokens]
        return [
            t
            if t in self.protected
            else self.overrides.get(t) or porter_stem(t)
            for t in tokens
        ]


# --------------------------------------------------------------------------
# EnglishMinimalStemFilter (Harman S-stemmer; SQL-expressible)
# --------------------------------------------------------------------------


def english_minimal_stem(w: str) -> str:
    """EnglishMinimalStemmer.java: plural-only stemming.
    s-suffix removal except -us/-ss; -ies -> -y (not after a/e);
    -Ves kept when V in {i,a,o,e} and the ies-rule did not apply."""
    if len(w) < 3 or not w.endswith("s"):
        return w
    p = w[-2]
    if p in ("u", "s"):
        return w
    if p == "e":
        if len(w) > 3 and w[-3] == "i" and w[-4] not in ("a", "e"):
            return w[:-3] + "y"
        if w[-3] in ("i", "a", "o", "e"):
            return w
    return w[:-1]


def english_minimal_stem_sql(col: str) -> str:
    """The same mapping as ANSI SQL (drives the DuckDB gate oracle)."""
    return f"""CASE
  WHEN length({col}) < 3 OR {col} NOT LIKE '%s' THEN {col}
  WHEN substr({col}, -2, 1) IN ('u', 's') THEN {col}
  WHEN substr({col}, -2, 1) = 'e' AND length({col}) > 3
       AND substr({col}, -3, 1) = 'i'
       AND substr({col}, -4, 1) NOT IN ('a', 'e')
    THEN substr({col}, 1, length({col}) - 3) || 'y'
  WHEN substr({col}, -2, 1) = 'e'
       AND substr({col}, -3, 1) IN ('i', 'a', 'o', 'e') THEN {col}
  ELSE substr({col}, 1, length({col}) - 1)
END"""


class EnglishMinimalStemFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [english_minimal_stem(t) for t in tokens]


# --------------------------------------------------------------------------
# ASCII folding
# --------------------------------------------------------------------------

_FOLD_TABLE = str.maketrans(
    {
        "ß": "ss", "æ": "ae", "Æ": "AE", "ø": "o", "Ø": "O",
        "œ": "oe", "Œ": "OE", "þ": "th", "Þ": "TH", "ð": "d",
        "Ð": "D", "đ": "d", "Đ": "D", "ł": "l", "Ł": "L",
        "ħ": "h", "Ħ": "H", "ı": "i", "ĸ": "q", "ŋ": "n", "Ŋ": "N",
        "ŧ": "t", "Ŧ": "T", "ƒ": "f",
    }
)


def ascii_fold(text: str) -> str:
    """ASCIIFoldingFilter mapping: NFKD-decompose, drop combining
    marks, apply the explicit table for non-decomposable Latin letters;
    characters with no ASCII equivalent pass through unchanged (the
    reference's default for unmapped blocks)."""
    out = []
    for ch in text.translate(_FOLD_TABLE):
        if ord(ch) < 128:
            out.append(ch)
            continue
        dec = unicodedata.normalize("NFKD", ch)
        kept = "".join(c for c in dec if not unicodedata.combining(c))
        out.append(kept if kept and all(ord(c) < 128 for c in kept) else ch)
    return "".join(out)


class ASCIIFoldingFilter(TokenFilter):
    def apply(self, tokens: list[str]) -> list[str]:
        return [ascii_fold(t) for t in tokens]


# --------------------------------------------------------------------------
# synonyms (canonicalization form) + stop
# --------------------------------------------------------------------------


class SynonymCanonicalFilter(TokenFilter):
    """Map every member of a synonym group to the group's canonical
    term. Applying the same filter at index and query time gives
    SynonymGraphFilter's single-token semantics without graph
    positions; multi-token rules are out of scope (query-time
    SynonymQuery covers the scoring side)."""

    def __init__(self, groups: list[list[str]]):
        self.mapping = {}
        for group in groups:
            canon = group[0]
            for t in group:
                self.mapping[t] = canon

    def apply(self, tokens: list[str]) -> list[str]:
        m = self.mapping
        return [m.get(t, t) for t in tokens]


class StopFilter(TokenFilter):
    def __init__(self, stopwords: frozenset[str]):
        self.stopwords = frozenset(stopwords)

    def apply(self, tokens: list[str]) -> list[str]:
        sw = self.stopwords
        return [t for t in tokens if t not in sw]


# --------------------------------------------------------------------------
# stream-rewriting filters (use in their own field)
# --------------------------------------------------------------------------


class ShingleFilter(TokenFilter):
    offsets_safe = False  # crosses token boundaries

    """Word n-grams (shingle/ShingleFilter.java): contiguous token
    windows of size min_size..max_size joined by `sep`. Unigrams kept
    when output_unigrams (the reference default)."""

    def __init__(self, min_size: int = 2, max_size: int = 2,
                 sep: str = " ", output_unigrams: bool = True):
        if min_size < 2 or max_size < min_size:
            raise ValueError("need 2 <= min_size <= max_size")
        self.min_size = min_size
        self.max_size = max_size
        self.sep = sep
        self.output_unigrams = output_unigrams

    def apply(self, tokens: list[str]) -> list[str]:
        out = list(tokens) if self.output_unigrams else []
        for n in range(self.min_size, self.max_size + 1):
            out.extend(
                self.sep.join(tokens[i : i + n])
                for i in range(len(tokens) - n + 1)
            )
        return out


class EdgeNGramFilter(TokenFilter):
    """Leading-edge n-grams (ngram/EdgeNGramTokenFilter.java),
    preserve_original per the keepShortTerm flag."""

    def __init__(self, min_gram: int = 1, max_gram: int = 5,
                 preserve_original: bool = True):
        self.min_gram = min_gram
        self.max_gram = max_gram
        self.preserve_original = preserve_original

    def apply(self, tokens: list[str]) -> list[str]:
        out: list[str] = []
        for t in tokens:
            hi = min(len(t), self.max_gram)
            out.extend(t[:n] for n in range(self.min_gram, hi + 1))
            # preserveOriginal keeps tokens OUTSIDE [min_gram, max_gram]
            # on both sides (EdgeNGramTokenFilter.java): longer than
            # max_gram AND shorter than min_gram (which emit no grams)
            if self.preserve_original and (
                len(t) > self.max_gram or len(t) < self.min_gram
            ):
                out.append(t)
        return out


# --------------------------------------------------------------------------
# registry wiring (SPI: named composite analyzers + custom registration)
# --------------------------------------------------------------------------


def register_analyzer(name: str, factory) -> None:
    """Custom-analyzer extension point (§2.10): factory() -> Analyzer."""
    _REGISTRY[name] = factory


register_analyzer(
    "english",
    lambda: FilteredAnalyzer(StandardAnalyzer(), [PorterStemFilter()], "english"),
)
register_analyzer(
    "simple_porter",
    lambda: FilteredAnalyzer(SimpleAnalyzer(), [PorterStemFilter()], "simple_porter"),
)
register_analyzer(
    "simple_en_min",
    lambda: FilteredAnalyzer(
        SimpleAnalyzer(), [EnglishMinimalStemFilter()], "simple_en_min"
    ),
)
register_analyzer(
    "folding",
    lambda: FilteredAnalyzer(StandardAnalyzer(), [ASCIIFoldingFilter()], "folding"),
)


class LengthFilter(TokenFilter):
    """Drop tokens outside [min_len, max_len] code units
    (miscellaneous/LengthFilter.java)."""

    def __init__(self, min_len: int, max_len: int):
        if min_len < 0 or max_len < min_len:
            raise ValueError("need 0 <= min_len <= max_len")
        self.min_len = min_len
        self.max_len = max_len

    def apply(self, tokens: list[str]) -> list[str]:
        return [t for t in tokens if self.min_len <= len(t) <= self.max_len]


class ReverseStringFilter(TokenFilter):
    offsets_safe = False  # chars no longer map to source spans

    """Reverse each token (reverse/ReverseStringFilter.java) — indexing
    a reversed twin field turns a leading-wildcard query (*est) into a
    FAST trailing-prefix query on the twin (tse*), the standard
    Solr ReversedWildcardFilter trick."""

    def apply(self, tokens: list[str]) -> list[str]:
        return [t[::-1] for t in tokens]


from lucene_spark.analysis.analyzer import Analyzer as _AnalyzerBase  # noqa: E402


class PathHierarchyAnalyzer(_AnalyzerBase):
    """Path-prefix tokenizer (path/PathHierarchyTokenizer.java):
    '/a/b/c' -> ['/a', '/a/b', '/a/b/c'] (or suffixes when reverse,
    the domain-name form); `skip` drops that many leading components.
    Feeds path drill-down facets and prefix-scoped search over the
    corpus's (repo, path) columns."""

    def __init__(self, delimiter: str = "/", reverse: bool = False,
                 skip: int = 0):
        self.name = "path_hierarchy"
        self.delimiter = delimiter
        self.reverse = reverse
        self.skip = skip

    def tokenize_one(self, text: str) -> list[str]:
        if not text:
            return []
        d = self.delimiter
        parts = [p for p in text.split(d) if p != ""]
        if self.reverse:
            parts = parts[::-1]
        parts = parts[self.skip:]
        if not parts:
            return []
        lead = text.startswith(d) and not self.reverse and self.skip == 0
        out = []
        for i in range(1, len(parts) + 1):
            tok = d.join(parts[:i])
            out.append((d + tok) if lead else tok)
        return out


register_analyzer("path_hierarchy", PathHierarchyAnalyzer)
register_analyzer(
    "simple_reversed",
    lambda: FilteredAnalyzer(
        SimpleAnalyzer(), [ReverseStringFilter()], "simple_reversed"
    ),
)


class GermanLightStemFilter(TokenFilter):
    """German light stemmer (de/GermanLightStemmer.java) — the "UniNE"
    algorithm from Savoy, "Light Stemming Approaches for the French,
    Portuguese, German and Hungarian Languages": fold umlauts/accented
    vowels, strip plural/case endings (-ern/-em/-en/-er/-es/-e and
    -s after a valid stem-ending consonant), then the comparative /
    superlative layer (-est/-er/-en and -st after a stem ending)."""

    _ST_END = set("bdfghklmnt")
    _FOLD = str.maketrans("äàáâöòóôïìíîüùúû", "aaaaooooiiiiuuuu")

    def _step1(self, t: str) -> str:
        n = len(t)
        if n > 5 and t.endswith("ern"):
            return t[:-3]
        if n > 4 and len(t) >= 2 and t[-2] == "e" and t[-1] in "mnrs":
            return t[:-2]
        if n > 3 and t[-1] == "e":
            return t[:-1]
        if n > 3 and t[-1] == "s" and t[-2] in self._ST_END:
            return t[:-1]
        return t

    def _step2(self, t: str) -> str:
        n = len(t)
        if n > 5 and t.endswith("est"):
            return t[:-3]
        if n > 4 and t[-2] == "e" and t[-1] in "rn":
            return t[:-2]
        if n > 4 and t.endswith("st") and t[-3] in self._ST_END:
            return t[:-2]
        return t

    def apply(self, tokens: list[str]) -> list[str]:
        return [self._step2(self._step1(t.translate(self._FOLD))) for t in tokens]


class GermanMinimalStemFilter(TokenFilter):
    """German minimal stemmer (de/GermanMinimalStemmer.java) — Savoy,
    "Morphologie et recherche d'information": words shorter than 5
    chars pass through; fold umlauts, strip -nen, then one of
    -en/-se/-es/-er, then a final -n/-e/-s/-r."""

    _FOLD = str.maketrans("äöü", "aou")

    def apply(self, tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            if len(t) < 5:
                out.append(t)
                continue
            t = t.translate(self._FOLD)
            n = len(t)
            if n > 6 and t.endswith("nen"):
                out.append(t[:-3])
                continue
            if n > 5 and t[-2:] in ("en", "se", "es", "er"):
                out.append(t[:-2])
                continue
            if t[-1] in "nesr":
                out.append(t[:-1])
            else:
                out.append(t)
        return out


register_analyzer(
    "german_light",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [GermanLightStemFilter()], "german_light"
    ),
)
register_analyzer(
    "german_minimal",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [GermanMinimalStemFilter()], "german_minimal"
    ),
)


class SwedishLightStemFilter(TokenFilter):
    """Swedish light stemmer (sv/SwedishLightStemmer.java) — Savoy,
    "Report on CLEF-2003 Monolingual Tracks": optional trailing -s,
    then the longest matching suffix layer."""

    def _stem(self, t: str) -> str:
        if len(t) > 4 and t[-1] == "s":
            t = t[:-1]
        n = len(t)
        if n > 7 and t[-5:] in ("elser", "heten"):
            return t[:-5]
        if n > 6 and t[-4:] in (
            "arne", "erna", "ande", "else", "aste", "orna", "aren"
        ):
            return t[:-4]
        if n > 5 and t[-3:] in ("are", "ast", "het"):
            return t[:-3]
        if n > 4 and t[-2:] in ("ar", "er", "or", "en", "at", "te", "et"):
            return t[:-2]
        if n > 3 and t[-1] in "taen":
            return t[:-1]
        return t

    def apply(self, tokens: list[str]) -> list[str]:
        return [self._stem(t) for t in tokens]


class FrenchMinimalStemFilter(TokenFilter):
    """French minimal stemmer (fr/FrenchMinimalStemmer.java) — Savoy,
    "A Stemming procedure and stopword list for general French
    corpora": words under 6 chars pass; -aux -> -al, else strip one
    each of trailing s, r, e, é, then collapse a doubled final
    letter."""

    def _stem(self, t: str) -> str:
        if len(t) < 6:
            return t
        if t[-1] == "x":
            if t[-3:-1] == "au":
                return t[:-2] + "l"
            return t[:-1]
        if t[-1] == "s":
            t = t[:-1]
        if t[-1] == "r":
            t = t[:-1]
        if t[-1] == "e":
            t = t[:-1]
        if t[-1] == "é":
            t = t[:-1]
        if len(t) >= 2 and t[-1] == t[-2] and t[-1].isalpha():
            t = t[:-1]
        return t

    def apply(self, tokens: list[str]) -> list[str]:
        return [self._stem(t) for t in tokens]


register_analyzer(
    "swedish_light",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [SwedishLightStemFilter()], "swedish_light"
    ),
)
register_analyzer(
    "french_minimal",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [FrenchMinimalStemFilter()], "french_minimal"
    ),
)


_ROMANCE_FOLD = str.maketrans(
    "àáâäòóôöèéêëùúûüìíîï", "aaaaooooeeeeuuuuiiii"
)


class ItalianLightStemFilter(TokenFilter):
    """Italian light stemmer (it/ItalianLightStemmer.java) — Savoy,
    "Report on CLEF-2001 Experiments": words under 6 chars pass; fold
    accented vowels, then strip the final vowel (two chars when the
    plural/soft-consonant marker i/h precedes it)."""

    def _stem(self, t: str) -> str:
        if len(t) < 6:
            return t
        t = t.translate(_ROMANCE_FOLD)
        last, prev = t[-1], t[-2]
        if last == "e":
            return t[:-2] if prev in "ih" else t[:-1]
        if last == "i":
            return t[:-2] if prev in "hi" else t[:-1]
        if last in "ao":
            return t[:-2] if prev == "i" else t[:-1]
        return t

    def apply(self, tokens: list[str]) -> list[str]:
        return [self._stem(t) for t in tokens]


class SpanishLightStemFilter(TokenFilter):
    """Spanish light stemmer (es/SpanishLightStemmer.java) — Savoy,
    "Report on CLEF-2001 Experiments": words under 5 chars pass; fold
    accents, strip a final o/a/e, and handle the -s plural layer
    (-eses -> -es, -ces -> -z, -os/-as/-es -> strip two)."""

    def _stem(self, t: str) -> str:
        if len(t) < 5:
            return t
        t = t.translate(_ROMANCE_FOLD)
        last = t[-1]
        if last in "oae":
            return t[:-1]
        if last == "s":
            if t[-4:-1] == "ese":
                return t[:-2]
            if t[-3:-1] == "ce":
                return t[:-3] + "z"
            if t[-2] in "oae":
                return t[:-2]
        return t

    def apply(self, tokens: list[str]) -> list[str]:
        return [self._stem(t) for t in tokens]


register_analyzer(
    "italian_light",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [ItalianLightStemFilter()], "italian_light"
    ),
)
register_analyzer(
    "spanish_light",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [SpanishLightStemFilter()], "spanish_light"
    ),
)


class HungarianLightStemFilter(TokenFilter):
    """Hungarian light stemmer (hu/HungarianLightStemmer.java) — the
    UniNE algorithm from Savoy, "Light Stemming Approaches for the
    French, Portuguese, German and Hungarian Languages": fold accents,
    then case, possessive, plural and final-vowel layers."""

    _FOLD = str.maketrans("áëéíóőõöúűũûü", "aeeioooouuuuu")
    _V = set("aeiouy")

    def _case(self, t: str) -> str:
        n = len(t)
        if n > 6 and t.endswith("kent"):
            return t[:-4]
        if n > 5:
            if t[-3:] in ("nak", "nek", "val", "vel", "ert", "rol", "ban",
                          "ben", "bol", "nal", "nel", "hoz", "hez", "tol"):
                return t[:-3]
            if t[-2:] in ("al", "el") and t[-3] not in self._V and t[-3] == t[-4]:
                return t[:-3]
        if n > 4:
            if t[-2:] in ("at", "et", "ot", "va", "ve", "ra", "re", "ba",
                          "be", "ul", "ig"):
                return t[:-2]
            if t[-2:] in ("on", "en") and t[-3] not in self._V:
                return t[:-2]
            if t[-1] in "tn":
                return t[:-1]
            if t[-1] in "ae" and t[-2] == t[-3] and t[-2] not in self._V:
                return t[:-2]
        return t

    def _possessive(self, t: str) -> str:
        n = len(t)
        if n > 6:
            if t[-5] not in self._V and t[-4:] in ("atok", "otok", "etek"):
                return t[:-4]
            if t[-4:] in ("itek", "itok"):
                return t[:-4]
        if n > 5:
            if t[-4] not in self._V and t[-3:] in ("unk", "tok", "tek"):
                return t[:-3]
            if t[-4] in self._V and t[-3:] == "juk":
                return t[:-3]
            if t[-3:] == "ink":
                return t[:-3]
        if n > 4:
            if t[-3] not in self._V and t[-2:] in ("am", "em", "om", "ad",
                                                   "ed", "od", "uk"):
                return t[:-2]
            if t[-3] in self._V and t[-2:] in ("nk", "ja", "je"):
                return t[:-2]
            if t[-2:] in ("im", "id", "ik"):
                return t[:-2]
        if n > 3:
            if t[-1] in "ae" and t[-2] not in self._V:
                return t[:-1]
            if t[-1] in "md" and t[-2] in self._V:
                return t[:-1]
            if t[-1] == "i":
                return t[:-1]
        return t

    def _plural(self, t: str) -> str:
        if len(t) > 3 and t[-1] == "k":
            if t[-2] in "aoe" and len(t) > 4:
                return t[:-2]
            return t[:-1]
        return t

    def _norm(self, t: str) -> str:
        if len(t) > 3 and t[-1] in "aeio":
            return t[:-1]
        return t

    def apply(self, tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            t = t.translate(self._FOLD)
            out.append(self._norm(self._plural(self._possessive(self._case(t)))))
        return out


class RussianLightStemFilter(TokenFilter):
    """Russian light stemmer (ru/RussianLightStemmer.java) — Dolamic &
    Savoy, "Indexing and Searching Strategies for the Russian
    Language": strip the case-ending layer, then normalize a trailing
    soft sign / и / doubled н."""

    _S4 = ("иями", "оями")
    _S3 = ("иям", "иях", "оях", "ями", "оям", "оьв", "ами", "его", "ему",
           "ери", "ими", "ого", "ому", "ыми", "оев")
    _S2 = ("ая", "яя", "ях", "юю", "ах", "ею", "их", "ия", "ию", "ьв",
           "ою", "ую", "ям", "ых", "ея", "ам", "ем", "ей", "ём", "ев",
           "ий", "им", "ое", "ой", "ом", "ов", "ые", "ый", "ым", "ми")

    def _case(self, t: str) -> str:
        n = len(t)
        if n > 6 and t[-4:] in self._S4:
            return t[:-4]
        if n > 5 and t[-3:] in self._S3:
            return t[:-3]
        if n > 4 and t[-2:] in self._S2:
            return t[:-2]
        if n > 3 and t[-1] in "аеиоуйыяь":
            return t[:-1]
        return t

    def _norm(self, t: str) -> str:
        if len(t) > 3:
            if t[-1] in "ьи":
                return t[:-1]
            if t[-1] == "н" and t[-2] == "н":
                return t[:-1]
        return t

    def apply(self, tokens: list[str]) -> list[str]:
        return [self._norm(self._case(t)) for t in tokens]


register_analyzer(
    "hungarian_light",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [HungarianLightStemFilter()], "hungarian_light"
    ),
)
register_analyzer(
    "russian_light",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [RussianLightStemFilter()], "russian_light"
    ),
)


class FinnishLightStemFilter(TokenFilter):
    """Finnish light stemmer (fi/FinnishLightStemmer.java) — Savoy,
    "Report on CLEF-2003 Monolingual Tracks": fold ä/å/ö, then the
    particle, case and possessive layers, then two normalization
    passes (incl. collapsing doubled k/p/t anywhere in the word)."""

    _FOLD = str.maketrans("äåö", "aao")
    _V = set("aeiouy")

    def _step1(self, t: str) -> str:
        if len(t) > 8:
            if t.endswith("kin"):
                return self._step1(t[:-3])
            if t.endswith("ko"):
                return self._step1(t[:-2])
        if len(t) > 11:
            if t.endswith("dellinen"):
                return t[:-8]
            if t.endswith("dellisuus"):
                return t[:-9]
        return t

    def _step2(self, t: str) -> str:
        if len(t) > 5:
            if t[-3:] in ("lla", "tse", "sti"):
                return t[:-3]
            if t.endswith("ni"):
                return t[:-2]
            if t.endswith("aa"):
                return t[:-1]
        return t

    def _step3(self, t: str) -> str:
        n = len(t)
        if n > 8:
            if t.endswith("nnen"):
                return t[:-4] + "s"
            if t.endswith("ntena"):
                return t[:-5] + "s"
            if t.endswith("tten"):
                return t[:-4]
            if t.endswith("eiden"):
                return t[:-5]
        if n > 6:
            if t[-4:] in ("neen", "niin", "seen", "teen", "inen"):
                return t[:-4]
            if t[-3] == "h" and t[-2] in self._V and t[-1] == "n":
                return t[:-3]
            if t.endswith("den"):
                return t[:-3] + "s"
            if t.endswith("ksen"):
                return t[:-4] + "s"
            if t[-3:] in ("ssa", "sta", "lla", "lta", "tta", "ksi", "lle"):
                return t[:-3]
        if n > 5:
            if t[-2:] in ("na", "ne"):
                return t[:-2]
            if t.endswith("nei"):
                return t[:-3]
        if n > 4:
            if t[-2:] in ("ja", "ta"):
                return t[:-2]
            if t[-1] == "a":
                return t[:-1]
            if t[-1] == "n" and t[-2] in self._V:
                return t[:-2]
            if t[-1] == "n":
                return t[:-1]
        return t

    def _norm1(self, t: str) -> str:
        if len(t) > 5 and t.endswith("hde"):
            t = t[:-3] + "ksi"
        if len(t) > 4 and t[-2:] in ("ei", "at"):
            return t[:-2]
        if len(t) > 3 and t[-1] in "tsjeai":
            return t[:-1]
        return t

    def _norm2(self, t: str) -> str:
        if len(t) > 8 and t[-1] in "eou":
            t = t[:-1]
        if len(t) > 4:
            if t[-1] == "i":
                t = t[:-1]
            if len(t) > 4:
                out = [t[0]]
                for c in t[1:]:
                    if c == out[-1] and c in "kpt":
                        continue
                    out.append(c)
                t = "".join(out)
        return t

    def _stem(self, t: str) -> str:
        if len(t) < 4:
            return t
        t = t.translate(self._FOLD)
        return self._norm2(self._norm1(self._step3(self._step2(self._step1(t)))))

    def apply(self, tokens: list[str]) -> list[str]:
        return [self._stem(t) for t in tokens]


register_analyzer(
    "finnish_light",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [FinnishLightStemFilter()], "finnish_light"
    ),
)


class PortugueseLightStemFilter(TokenFilter):
    """Portuguese light stemmer (pt/PortugueseLightStemmer.java) — the
    UniNE algorithm from Savoy: plural suffix rewrites (-es/-ns/-is
    forms restore the singular consonant), -mente and -s strips,
    feminine -> masculine normalization, a final vowel strip, then
    accent folding."""

    _FOLD = str.maketrans("àáâäãòóôöõèéêëùúûüìíîïç", "aaaaaoooooeeeeuuuuiiiic")

    def _suffix(self, t: str) -> str:
        n = len(t)
        if n > 4 and t.endswith("es") and t[-3] in "rslz":
            return t[:-2]
        if n > 3 and t.endswith("ns"):
            return t[:-2] + "m"
        if n > 4 and (t.endswith("eis") or t.endswith("éis")):
            return t[:-3] + "el"
        if n > 4 and t.endswith("ais"):
            return t[:-2] + "l"
        if n > 4 and t.endswith("óis"):
            return t[:-3] + "ol"
        if n > 4 and t.endswith("is"):
            return t[:-1] + "l"
        if n > 3 and (t.endswith("ões") or t.endswith("ães")):
            return t[:-3] + "ão"
        if n > 6 and t.endswith("mente"):
            return t[:-5]
        if n > 3 and t[-1] == "s":
            return t[:-1]
        return t

    def _feminine(self, t: str) -> str:
        n = len(t)
        if n > 7 and t[-4:] in ("inha", "iaca", "eira"):
            return t[:-1] + "o"
        if n > 6:
            if t[-3:] in ("osa", "ica", "ida", "ada", "iva", "ama"):
                return t[:-1] + "o"
            if t.endswith("ona"):
                return t[:-3] + "ão"
            if t.endswith("ora"):
                return t[:-1]
            if t.endswith("esa"):
                return t[:-3] + "ês"
            if t.endswith("na"):
                return t[:-1] + "o"
        return t

    def _stem(self, t: str) -> str:
        if len(t) < 4:
            return t
        t = self._suffix(t)
        if len(t) > 3 and t[-1] == "a":
            t = self._feminine(t)
        if len(t) > 4 and t[-1] in "eao":
            t = t[:-1]
        return t.translate(self._FOLD)

    def apply(self, tokens: list[str]) -> list[str]:
        return [self._stem(t) for t in tokens]


register_analyzer(
    "portuguese_light",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [PortugueseLightStemFilter()], "portuguese_light"
    ),
)


class CzechStemFilter(TokenFilter):
    """Czech light stemmer (cz/CzechStemmer.java) — Dolamic & Savoy,
    "Indexing and stemming approaches for the Czech language": case
    endings, possessive -ov/-in/-uv, then palatalization normalization
    (čt->ck, št->sk, c/č->k, z/ž->h, e-syncope, ů->o)."""

    def _case(self, t: str) -> str:
        n = len(t)
        if n > 7 and t.endswith("atech"):
            return t[:-5]
        if n > 6 and t[-4:] in ("ětem", "etem", "atům"):
            return t[:-4]
        if n > 5 and t[-3:] in (
            "ech", "ich", "ích", "ého", "ěmi", "emi", "ému", "ěte", "ete",
            "ěti", "eti", "ího", "iho", "ími", "ímu", "imu", "ách", "ata",
            "aty", "ých", "ama", "ami", "ové", "ovi", "ými",
        ):
            return t[:-3]
        if n > 4 and t[-2:] in (
            "em", "es", "ém", "ím", "ům", "at", "ám", "os", "us", "ým",
            "mi", "ou",
        ):
            return t[:-2]
        if n > 3 and t[-1] in "aeiouůyáéíýě":
            return t[:-1]
        return t

    def _possessive(self, t: str) -> str:
        if len(t) > 5 and t[-2:] in ("ov", "in", "ův"):
            return t[:-2]
        return t

    def _norm(self, t: str) -> str:
        if t.endswith("čt"):
            return t[:-2] + "ck"
        if t.endswith("št"):
            return t[:-2] + "sk"
        if t[-1] in "cč":
            return t[:-1] + "k"
        if t[-1] in "zž":
            return t[:-1] + "h"
        if len(t) > 1 and t[-2] == "e":
            return t[:-2] + t[-1]
        if len(t) > 2 and t[-2] == "ů":
            return t[:-2] + "o" + t[-1]
        return t

    def apply(self, tokens: list[str]) -> list[str]:
        out = []
        for t in tokens:
            t = self._possessive(self._case(t))
            out.append(self._norm(t) if t else t)
        return out


register_analyzer(
    "czech",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [CzechStemFilter()], "czech"
    ),
)


class BulgarianStemFilter(TokenFilter):
    """Bulgarian light stemmer (bg/BulgarianStemmer.java) — Savoy's
    "Searching strategies for the Bulgarian language": definite-article
    and plural removal with the consonant-restoring rewrites
    (ци->к, зи->г, си->х, еве->й), final-vowel strips, the fixed ен->н
    rule and the ъN syncope."""

    def _article(self, t: str) -> str:
        n = len(t)
        if n > 6 and t.endswith("ият"):
            return t[:-3]
        if n > 5 and t[-2:] in ("ът", "то", "те", "та", "ия"):
            return t[:-2]
        if n > 4 and t.endswith("ят"):
            return t[:-2]
        return t

    def _plural(self, t: str) -> str:
        n = len(t)
        if n > 6:
            if t.endswith("овци"):
                return t[:-3]
            if t.endswith("ове"):
                return t[:-3]
            if t.endswith("еве"):
                return t[:-3] + "й"
        if n > 5:
            if t.endswith("ища"):
                return t[:-3]
            if t.endswith("та"):
                return t[:-2]
            if t.endswith("ци"):
                return t[:-2] + "к"
            if t.endswith("зи"):
                return t[:-2] + "г"
            if t[-3] == "е" and t[-1] == "и":
                return t[:-3] + "я" + t[-2]
        if n > 4:
            if t.endswith("си"):
                return t[:-2] + "х"
            if t.endswith("и"):
                return t[:-1]
        return t

    def _stem(self, t: str) -> str:
        if len(t) < 4:
            return t
        if len(t) > 5 and t.endswith("ища"):
            return t[:-3]
        t = self._plural(self._article(t))
        if len(t) > 3 and t.endswith("я"):
            t = t[:-1]
        if len(t) > 3 and t[-1] in "аое":
            t = t[:-1]
        if len(t) > 4 and t.endswith("ен"):
            t = t[:-2] + "н"
        if len(t) > 5 and t[-2] == "ъ":
            t = t[:-2] + t[-1]
        return t

    def apply(self, tokens: list[str]) -> list[str]:
        return [self._stem(t) for t in tokens]


class LatvianStemFilter(TokenFilter):
    """Latvian light stemmer (lv/LatvianStemmer.java, after Karlis
    Kreslins' "A stemming algorithm for Latvian"): strip the first
    matching noun/adjective inflection whose vowel-count and length
    guards hold, then un-palatalize declension II/V/VI stems."""

    # (affix, suffix vowel count, fires palatalization)
    _AFFIXES = [
        ("ajiem", 3, False), ("ajai", 3, False), ("ajam", 2, False),
        ("ajām", 2, False), ("ajos", 2, False), ("ajās", 2, False),
        ("iem", 2, True), ("ajā", 2, False), ("ais", 2, False),
        ("ai", 2, False), ("ei", 2, False), ("ām", 1, False),
        ("am", 1, False), ("ēm", 1, False), ("īm", 1, False),
        ("im", 1, False), ("um", 1, False), ("us", 1, True),
        ("as", 1, False), ("ās", 1, False), ("es", 1, False),
        ("os", 1, True), ("ij", 1, False), ("īs", 1, False),
        ("ēs", 1, False), ("is", 1, False), ("ie", 1, False),
        ("u", 1, True), ("a", 1, True), ("i", 1, True),
        ("e", 1, False), ("ā", 1, False), ("ē", 1, False),
        ("ī", 1, False), ("ū", 1, False), ("o", 1, False),
        ("s", 0, False), ("š", 0, False),
    ]
    _VOWELS = set("aeiouāīēū")

    def _unpalatalize(self, stem: str, removed_first: str) -> str:
        if removed_first == "u":
            if stem.endswith("kš"):
                return stem[:-2] + "kst"
            if stem.endswith("ņņ"):
                return stem[:-2] + "nn"
        if stem[-2:] in ("pj", "bj", "mj", "vj"):
            return stem[:-1]
        for src, dst in (("šņ", "sn"), ("žņ", "zn"), ("šļ", "sl"),
                         ("žļ", "zl"), ("ļņ", "ln"), ("ļļ", "ll")):
            if stem.endswith(src):
                return stem[:-2] + dst
        if stem.endswith("č"):
            return stem[:-1] + "c"
        if stem.endswith("ļ"):
            return stem[:-1] + "l"
        if stem.endswith("ņ"):
            return stem[:-1] + "n"
        return stem

    def _stem(self, t: str) -> str:
        nv = sum(1 for c in t if c in self._VOWELS)
        for affix, vc, pal in self._AFFIXES:
            if nv > vc and len(t) >= len(affix) + 3 and t.endswith(affix):
                stem = t[: -len(affix)]
                return self._unpalatalize(stem, affix[0]) if pal else stem
        return t

    def apply(self, tokens: list[str]) -> list[str]:
        return [self._stem(t) for t in tokens]


register_analyzer(
    "bulgarian",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [BulgarianStemFilter()], "bulgarian"
    ),
)
register_analyzer(
    "latvian",
    lambda: FilteredAnalyzer(
        StandardAnalyzer(), [LatvianStemFilter()], "latvian"
    ),
)


class FixedShingleFilter(ShingleFilter):
    """shingle/FixedShingleFilter.java: shingles of EXACTLY one size,
    no unigrams — the simpler cousin used by phrase-speedup fields
    (and by intervals' wrapped-field tricks). shingle_size 2..4 per
    the reference's guard (FixedShingleFilter.java:48-50)."""

    def __init__(self, shingle_size: int = 2, sep: str = " "):
        if not 2 <= shingle_size <= 4:
            raise ValueError(
                f"Shingle size must be between 2 and 4, got {shingle_size}"
            )
        super().__init__(
            min_size=shingle_size, max_size=shingle_size,
            sep=sep, output_unigrams=False,
        )
