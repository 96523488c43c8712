"""Dictionary-driven compound-word decomposition (SURVEY.md §2.2;
reference ``analysis/common/.../compound/``).

DictionaryCompoundWordTokenFilter
(compound/DictionaryCompoundWordTokenFilter.java:74-106 +
CompoundWordTokenFilterBase.java:100-125): for every token of at least
``min_word_size`` chars, slide a window over every start position and
emit each dictionary-member substring of length ``min_subword_size``..
``max_subword_size`` as an extra token AFTER the original (the
reference emits them at posInc 0 with the compound's offsets — here
the same-span expansion keeps the chain offsets-safe). Dictionary
lookup is case-insensitive, matching the reference tests' ignore-case
CharArraySet; the emitted subword keeps the ORIGINAL casing of the
compound's substring. ``only_longest_match`` keeps only the longest
match per start position; ``no_subwords`` additionally skips the scan
past each match (the public onlyLongestMatchIgnoreSubwords ctor flag,
which implies only-longest) — both replayed from decompose().

HyphenationCompoundWordTokenFilter is legitimately descoped: it is
driven by TeX hyphenation-pattern data files (da_UTF8.xml etc.), and
porting it means copying data, not logic (same rationale as
kuromoji/nori/Hunspell in SURVEY §10).
"""

from __future__ import annotations

from lucene_spark.analysis.filters import TokenFilter

__all__ = ["DictionaryCompoundWordFilter"]

DEFAULT_MIN_WORD_SIZE = 5      # CompoundWordTokenFilterBase.java:31
DEFAULT_MIN_SUBWORD_SIZE = 2   # :34
DEFAULT_MAX_SUBWORD_SIZE = 15  # :37


class DictionaryCompoundWordFilter(TokenFilter):
    def __init__(
        self,
        dictionary,
        min_word_size: int = DEFAULT_MIN_WORD_SIZE,
        min_subword_size: int = DEFAULT_MIN_SUBWORD_SIZE,
        max_subword_size: int = DEFAULT_MAX_SUBWORD_SIZE,
        only_longest_match: bool = False,
        no_subwords: bool = False,
    ):
        if min_word_size < 0 or min_subword_size < 0 or max_subword_size < 0:
            raise ValueError("sizes cannot be negative")
        self.dictionary = frozenset(w.lower() for w in dictionary)
        self.min_word_size = min_word_size
        self.min_subword_size = min_subword_size
        self.max_subword_size = max_subword_size
        # the public ignore-subwords ctor flag implies only-longest
        self.only_longest = only_longest_match or no_subwords
        self.no_subwords = no_subwords

    def _decompose(self, word: str) -> list[str]:
        low = word.lower()
        n = len(word)
        out: list[str] = []
        i = 0
        while i <= n - self.min_subword_size:
            longest: tuple[int, int] | None = None
            for j in range(self.min_subword_size, self.max_subword_size + 1):
                if i + j > n:
                    break
                if low[i : i + j] in self.dictionary:
                    if self.only_longest:
                        if longest is None or (longest[1] - longest[0]) < j:
                            longest = (i, i + j)
                    else:
                        out.append(word[i : i + j])
            if longest is not None:
                out.append(word[longest[0] : longest[1]])
                if self.no_subwords:
                    i += (longest[1] - longest[0]) - 1
            i += 1
        return out

    def apply(self, tokens: list[str]) -> list[str]:
        out: list[str] = []
        for t in tokens:
            out.append(t)  # original always survives
            if len(t) >= self.min_word_size:
                out.extend(self._decompose(t))
        return out
