"""ClassicTokenizer / ClassicAnalyzer and UAX29URLEmailTokenizer analogs
(SURVEY.md §2.2 analysis/common zoo).

Reference semantics:

- ClassicTokenizer — the pre-3.1 StandardTokenizer grammar
  (``analysis/common/src/java/org/apache/lucene/analysis/classic/
  ClassicTokenizerImpl.jflex:70-127``): typed rules ALPHANUM,
  APOSTROPHE (O'Reilly), ACRONYM (U.S.A.), COMPANY (AT&T, Excite@Home),
  EMAIL, HOST (www.foo.com), NUM (every-other-segment-has-a-digit serial
  numbers), CJ (Chinese/Japanese single codepoints) and the deprecated
  ACRONYM_DEP (dotted alphanumerics, surfaced as type <HOST> with the
  trailing dot removed — ClassicTokenizer.java:148-151). JFlex picks the
  LONGEST match at each position, earliest-listed rule on ties; tokens
  longer than max_token_length are skipped, not chopped
  (ClassicTokenizer.java:142-158). The scan here replays that rule list
  with the same longest-match/earliest-rule loop the repo's uax29 module
  uses for the modern grammar.

- ClassicFilter (classic/ClassicFilter.java:43-74): strip trailing 's
  from APOSTROPHE tokens, strip dots from ACRONYM tokens.

- ClassicAnalyzer (classic/ClassicAnalyzer.java:43-63): ClassicTokenizer
  -> ClassicFilter -> LowerCase -> Stop(EnglishAnalyzer.
  ENGLISH_STOP_WORDS_SET — the classic 33-word public list).

- UAX29URLEmailTokenizer (email/UAX29URLEmailTokenizerImpl.jflex):
  UAX#29 word break plus two extra typed rules, <URL> and <EMAIL>,
  matched with highest priority. The reference grammar validates URLs
  against the full RFC 3986 productions and the IANA TLD list compiled
  into the scanner (email/ASCIITLD.jflex); this analog recognizes
  scheme-full URLs (http/https/ftp + ``//``), ``www.``-prefixed hosts,
  and RFC-ish emails with a pragmatic pattern, then delegates the gaps
  to the exact uax29 scan. Deviation (documented): no TLD-list
  validation — bare hostnames without a scheme or www. are left to the
  word-break rules.
"""

from __future__ import annotations

import regex

from lucene_spark.analysis.analyzer import Analyzer
from lucene_spark.analysis import uax29
from lucene_spark.analysis.filters import register_analyzer

__all__ = [
    "ALPHANUM", "APOSTROPHE", "ACRONYM", "COMPANY", "EMAIL", "HOST",
    "NUM", "CJ", "ACRONYM_DEP", "CLASSIC_TOKEN_TYPES",
    "ENGLISH_STOP_WORDS", "classic_scan", "classic_filter",
    "ClassicAnalyzer", "UAX29URLEmailAnalyzer", "URL", "UAX_URLEMAIL_TYPES",
]

# ClassicTokenizer.java:54-76
ALPHANUM = 0
APOSTROPHE = 1
ACRONYM = 2
COMPANY = 3
EMAIL = 4
HOST = 5
NUM = 6
CJ = 7
ACRONYM_DEP = 8
CLASSIC_TOKEN_TYPES = [
    "<ALPHANUM>", "<APOSTROPHE>", "<ACRONYM>", "<COMPANY>", "<EMAIL>",
    "<HOST>", "<NUM>", "<CJ>", "<ACRONYM_DEP>",
]

# EnglishAnalyzer.ENGLISH_STOP_WORDS_SET (en/EnglishAnalyzer.java:46-57)
ENGLISH_STOP_WORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or "
    "such that the their then there these they this to was will with".split()
)

# --- grammar (ClassicTokenizerImpl.jflex:70-116), same macro names --------

# CJ block (NOT Korean)
_CJ = r"[㄀-ㄯ぀-ゟ゠-ヿㇰ-ㇿ㌀-㍿㐀-䶿一-鿿豈-﫿･-ﾟ]"
# LETTER = [:letter:] minus CJ
_LETTER = rf"[\p{{L}}--{_CJ[1:-1]}]" if False else rf"[[\p{{L}}]--{_CJ}]"
_THAI = r"[฀-๙]"
_AN = rf"(?:{_LETTER}|{_THAI}|\d)+"          # ALPHANUM
_ALPHA = rf"{_LETTER}+"
_P = r"[_\-/.,]"
_HAS_DIGIT = rf"(?:{_LETTER}|\d)*\d(?:{_LETTER}|\d)*"

_RULES_SRC: list[tuple[str, int]] = [
    (_AN, ALPHANUM),
    (rf"{_ALPHA}(?:'{_ALPHA})+", APOSTROPHE),
    (rf"{_LETTER}\.(?:{_LETTER}\.)+", ACRONYM),
    (rf"{_ALPHA}[&@]{_ALPHA}", COMPANY),
    (rf"{_AN}(?:[._\-]{_AN})*@{_AN}(?:[.\-]{_AN})+", EMAIL),
    (rf"{_AN}(?:\.{_AN})+", HOST),
    # NUM's six alternation branches as separate rules: JFlex picks the
    # longest match over the whole alternation, Python regex alternation
    # is leftmost-first — separate rules restore longest-match.
    (rf"{_AN}{_P}{_HAS_DIGIT}", NUM),
    (rf"{_HAS_DIGIT}{_P}{_AN}", NUM),
    (rf"{_AN}(?:{_P}{_HAS_DIGIT}{_P}{_AN})+", NUM),
    (rf"{_HAS_DIGIT}(?:{_P}{_AN}{_P}{_HAS_DIGIT})+", NUM),
    (rf"{_AN}{_P}{_HAS_DIGIT}(?:{_P}{_AN}{_P}{_HAS_DIGIT})+", NUM),
    (rf"{_HAS_DIGIT}{_P}{_AN}(?:{_P}{_HAS_DIGIT}{_P}{_AN})+", NUM),
    (_CJ, CJ),
    (rf"{_AN}\.(?:{_AN}\.)+", ACRONYM_DEP),
]
_RULES = [(regex.compile(pat, regex.V1), t) for pat, t in _RULES_SRC]


def classic_scan(text: str) -> list[tuple[int, int, int]]:
    """[(start, end, token_type)] — JFlex longest-match, earliest-rule
    tie-break, unmatched chars skipped (the grammar's [^] ignore rule)."""
    out: list[tuple[int, int, int]] = []
    n = len(text)
    p = 0
    while p < n:
        best_end = p
        best_type = -1
        for pat, ttype in _RULES:
            m = pat.match(text, p)
            if m is not None and m.end() > best_end:
                best_end = m.end()
                best_type = ttype
        if best_type < 0:
            p += 1
            continue
        out.append((p, best_end, best_type))
        p = best_end
    return out


def classic_filter(token: str, ttype: int) -> tuple[str, int]:
    """ClassicFilter.java:43-74 + the tokenizer's ACRONYM_DEP fixup
    (ClassicTokenizer.java:148-151): returns (text, surfaced_type)."""
    if ttype == APOSTROPHE and len(token) >= 2 and token[-2] == "'" and token[-1] in "sS":
        return token[:-2], ttype
    if ttype == ACRONYM:
        return token.replace(".", ""), ttype
    if ttype == ACRONYM_DEP:
        return token[:-1], HOST  # drop extra '.', surface as <HOST>
    return token, ttype


class ClassicAnalyzer(Analyzer):
    """ClassicTokenizer -> ClassicFilter -> LowerCase -> Stop
    (classic/ClassicAnalyzer.java:43-102; default stop set =
    ENGLISH_STOP_WORDS, max token length 255 with skip-not-chop)."""

    name = "classic"

    def __init__(self, stopwords: frozenset[str] = ENGLISH_STOP_WORDS,
                 max_token_length: int = 255):
        self.stopwords = stopwords
        self.max_token_length = max_token_length

    def _spans(self, text: str):
        for s, e, ttype in classic_scan(text):
            if e - s > self.max_token_length:
                continue  # skipped, not chopped (ClassicTokenizer.java:142)
            tok, _ = classic_filter(text[s:e], ttype)
            tok = tok.lower()
            if tok in self.stopwords:
                continue
            yield tok, s, e

    def tokenize_one(self, text: str) -> list[str]:
        return [t for t, _, _ in self._spans(text)]

    def tokenize_with_offsets_one(self, text: str):
        toks, starts, ends = [], [], []
        for t, s, e in self._spans(text):
            toks.append(t)
            starts.append(s)
            ends.append(e)
        return toks, starts, ends

    def tokenize_with_types_one(self, text: str) -> list[tuple[str, str]]:
        """(token, type-string) pairs, pre-lowercase — the TypeAttribute
        surface consumed by type-aware chains."""
        out = []
        for s, e, ttype in classic_scan(text):
            if e - s > self.max_token_length:
                continue
            tok, surfaced = classic_filter(text[s:e], ttype)
            out.append((tok, CLASSIC_TOKEN_TYPES[surfaced]))
        return out


# --- UAX29URLEmail ---------------------------------------------------------

URL = len(uax29.TOKEN_TYPES)  # extra type id, appended after the standard 8
UAX_URLEMAIL_TYPES = uax29.TOKEN_TYPES + ["<URL>", "<EMAIL>"]
_EMAIL_ID = URL + 1

# scheme-full URL / www. host / email — longest match wins between the two
_URL_RE = regex.compile(
    r"(?:(?:https?|ftp)://|www\.)"
    r"[\p{L}\p{Nd}\-._~%:/?#\[\]@!$&'()*+,;=]+"
    r"[\p{L}\p{Nd}/#=&\-_~]",  # last char: no trailing sentence punctuation
    regex.V1 | regex.IGNORECASE,
)
_EMAIL_RE = regex.compile(
    r"[\p{L}\p{Nd}!#$%&'*+/=?^_`{|}~.\-]+@"
    r"[\p{L}\p{Nd}\-]+(?:\.[\p{L}\p{Nd}\-]+)+",
    regex.V1,
)


def urlemail_scan(text: str) -> list[tuple[int, int, int]]:
    """UAX#29 scan + <URL>/<EMAIL> pre-pass: URL/email spans are carved
    out first (leftmost, longest-of-the-two), the gaps get the exact
    word-break scan (UAX29URLEmailTokenizerImpl.jflex gives its URL and
    EMAIL productions the same takes-precedence position)."""
    spans: list[tuple[int, int, int]] = []
    p = 0
    n = len(text)
    while p < n:
        mu = _URL_RE.search(text, p)
        me = _EMAIL_RE.search(text, p)
        cands = [
            (m.start(), -(m.end() - m.start()), tid, m.end())
            for m, tid in ((mu, URL), (me, _EMAIL_ID))
            if m is not None
        ]
        if not cands:
            break
        start, _, tid, end = min(cands)
        spans.append((start, end, tid))
        p = end
    out: list[tuple[int, int, int]] = []
    prev = 0
    for s, e, tid in spans:
        if s > prev:
            out.extend((a + prev, b + prev, t) for a, b, t in uax29.scan(text[prev:s]))
        out.append((s, e, tid))
        prev = e
    if prev < n:
        out.extend((a + prev, b + prev, t) for a, b, t in uax29.scan(text[prev:]))
    return out


class UAX29URLEmailAnalyzer(Analyzer):
    """UAX29URLEmailTokenizer -> LowerCase (email/UAX29URLEmailAnalyzer
    .java chain, default stop set handling left to callers like the
    repo's StandardAnalyzer)."""

    name = "uax29_urlemail"

    def __init__(self, max_token_length: int = 255):
        self.max_token_length = max_token_length

    def tokenize_one(self, text: str) -> list[str]:
        return [
            text[s:e].lower()
            for s, e, _ in urlemail_scan(text)
            if e - s <= self.max_token_length
        ]

    def tokenize_with_offsets_one(self, text: str):
        toks, starts, ends = [], [], []
        for s, e, _ in urlemail_scan(text):
            if e - s > self.max_token_length:
                continue
            toks.append(text[s:e].lower())
            starts.append(s)
            ends.append(e)
        return toks, starts, ends

    def tokenize_with_types_one(self, text: str) -> list[tuple[str, str]]:
        return [
            (text[s:e], UAX_URLEMAIL_TYPES[t])
            for s, e, t in urlemail_scan(text)
            if e - s <= self.max_token_length
        ]


register_analyzer("classic", ClassicAnalyzer)
register_analyzer("uax29_urlemail", UAX29URLEmailAnalyzer)
