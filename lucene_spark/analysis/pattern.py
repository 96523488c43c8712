"""Pattern analysis module — regex tokenizers + capture-group filter
(SURVEY.md §2.2; reference ``analysis/common/.../pattern/``).

Reference semantics:
- PatternTokenizer (pattern/PatternTokenizer.java:90-129): group >= 0
  emits that capture group of every match (zero-length matches
  skipped); group == -1 is String.split() — the text between matches,
  non-empty pieces only, with the tail after the last match emitted.
- SimplePatternSplitTokenizer / SimplePatternTokenizer
  (pattern/SimplePattern*.java): the same two modes; the reference
  runs a pre-determinized automaton for constant-time-per-char
  scanning — here both ride Python's compiled regex (the module-level
  contract, not the automaton engine, is the ported surface).
- PatternReplaceFilter (pattern/PatternReplaceFilter.java): re.sub
  over each token, all occurrences or first-only.
- PatternCaptureGroupTokenFilter
  (pattern/PatternCaptureGroupTokenFilter.java:88-166): emit one token
  per capture group per match of EVERY pattern, merged across patterns
  in ascending match-start order (each pattern's groups consumed in
  index order within a match, then its next match); zero-length
  captures are skipped; with preserve_original the original token is
  emitted first and a capture equal to the whole token is suppressed;
  with preserve_original=False a token with no captures passes through
  unchanged. The selection loop below is a line-for-line replay of
  nextCapture(); verified against the reference's full test matrix
  (camelCase multi-pattern case included) in tests/test_pattern.py.

PatternTypingFilter is NOT ported: it only rewrites the token-type
attribute, which this engine's flat filter chain does not carry
(token types exist inside the UAX#29 scanner only).
"""

from __future__ import annotations

import re

from lucene_spark.analysis.analyzer import Analyzer
from lucene_spark.analysis.filters import TokenFilter

__all__ = [
    "PatternAnalyzer",
    "PatternCaptureGroupFilter",
    "PatternReplaceFilter",
    "pattern_captures",
]


class PatternAnalyzer(Analyzer):
    """PatternTokenizer as an Analyzer: ``group=-1`` splits on the
    pattern, ``group>=0`` keeps that capture group of each match.
    ``lowercase`` mirrors the common PatternAnalyzer composition."""

    def __init__(self, pattern: str, group: int = -1, lowercase: bool = False,
                 flags: int = 0):
        self.pattern = re.compile(pattern, flags)
        self.group = group
        self.lowercase = lowercase
        self.name = f"pattern({pattern!r},{group})"

    def tokenize_with_offsets_one(self, text: str):
        toks: list[str] = []
        starts: list[int] = []
        ends: list[int] = []
        if self.group >= 0:
            for m in self.pattern.finditer(text):
                s, e = m.span(self.group)
                if s == e:
                    continue  # PatternTokenizer.java:99
                toks.append(text[s:e])
                starts.append(s)
                ends.append(e)
        else:
            # String.split() mode: text between matches, non-empty only
            idx = 0
            for m in self.pattern.finditer(text):
                if m.start() - idx > 0:
                    toks.append(text[idx : m.start()])
                    starts.append(idx)
                    ends.append(m.start())
                idx = m.end()
            if len(text) - idx > 0:  # the tail (PatternTokenizer.java:123)
                toks.append(text[idx:])
                starts.append(idx)
                ends.append(len(text))
        if self.lowercase:
            toks = [t.lower() for t in toks]
        return toks, starts, ends

    def tokenize_one(self, text: str) -> list[str]:
        return self.tokenize_with_offsets_one(text)[0]


class PatternReplaceFilter(TokenFilter):
    """re.sub per token; all=False replaces only the first occurrence
    (PatternReplaceFilter.java replaceAll flag)."""

    def __init__(self, pattern: str, replacement: str = "",
                 all: bool = True, flags: int = 0):
        self.pattern = re.compile(pattern, flags)
        self.replacement = replacement
        self.count = 0 if all else 1

    def apply(self, tokens: list[str]) -> list[str]:
        return [
            self.pattern.sub(self.replacement, t, count=self.count)
            for t in tokens
        ]


class _MatcherState:
    """Per-pattern cursor: current match + current group index, with
    the -1 (need find) / 0 (exhausted) sentinel protocol of
    PatternCaptureGroupTokenFilter.currentGroup."""

    __slots__ = ("it", "m", "g", "n")

    def __init__(self, pat: re.Pattern, text: str):
        self.it = pat.finditer(text)
        self.m: re.Match | None = None
        self.g = -1
        self.n = pat.groups


def _next_capture(states: list[_MatcherState], tlen: int,
                  preserve: bool) -> tuple[int, int] | None:
    # nextCapture() (PatternCaptureGroupTokenFilter.java:88-119): each
    # matcher's head capture obeys the skip rules; the head with the
    # smallest start wins and its group cursor advances post-emission
    min_off: int | None = None
    chosen: _MatcherState | None = None
    for ms in states:
        retry = True
        while retry:
            retry = False
            if ms.g == -1:
                ms.m = next(ms.it, None)
                ms.g = 1 if ms.m is not None else 0
            if ms.g != 0:
                while ms.g < ms.n + 1:
                    start, end = ms.m.span(ms.g)
                    if start == end or (
                        preserve and start == 0 and end == tlen
                    ):
                        ms.g += 1
                        continue
                    if min_off is None or start < min_off:
                        min_off = start
                        chosen = ms
                    break
                if ms.g == ms.n + 1:
                    ms.g = -1
                    retry = True  # the reference's i-- : next find()
    if chosen is None:
        return None
    span = chosen.m.span(chosen.g)
    chosen.g += 1
    return span


def pattern_captures(token: str, patterns: list[re.Pattern],
                     preserve_original: bool) -> list[str]:
    states = [_MatcherState(p, token) for p in patterns]
    out: list[str] = []
    if preserve_original:
        out.append(token)
    else:
        first = _next_capture(states, len(token), preserve_original)
        if first is None:
            return [token]  # no capture: token passes through unchanged
        out.append(token[first[0] : first[1]])
    while True:
        cap = _next_capture(states, len(token), preserve_original)
        if cap is None:
            return out
        out.append(token[cap[0] : cap[1]])


class PatternCaptureGroupFilter(TokenFilter):
    """Same-span expansion (captures inherit the source token's span),
    so the chain stays offsets-safe like EdgeNGramFilter."""

    def __init__(self, patterns: list[str], preserve_original: bool = True,
                 flags: int = 0):
        self.patterns = [re.compile(p, flags) for p in patterns]
        self.preserve_original = preserve_original

    def apply(self, tokens: list[str]) -> list[str]:
        out: list[str] = []
        for t in tokens:
            out.extend(
                pattern_captures(t, self.patterns, self.preserve_original)
            )
        return out
