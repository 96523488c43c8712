"""Exact UAX#29 word-break scanner — JFlex-parity StandardTokenizer core.

Reference: ``core/analysis/standard/StandardTokenizerImpl.jflex`` (the
grammar Lucene generates its scanner from) and ``StandardTokenizer.java``.
The grammar is eight ordered rules over Unicode Word_Break / Script /
Line_Break / Emoji property classes, matched JFlex-style: at each
position the LONGEST match wins; among equal lengths, the
earliest-listed rule. Tokens produced are typed ALPHANUM / NUM /
SOUTHEAST_ASIAN / IDEOGRAPHIC / HIRAGANA / KATAKANA / HANGUL / EMOJI
(StandardTokenizer.java:43-64); everything else is ignored.

This module re-expresses each JFlex rule as a ``regex``-module pattern
(the ``regex`` package exposes the exact UCD Word_Break / Line_Break /
Emoji properties; the stdlib ``re`` does not) and implements the
longest-match-with-rule-priority loop explicitly. Verified token
stream + offset + type against the reference's own generated scanner
(compiled and replayed during development; see tests/test_uax29.py).

Known version skew, documented: the reference pins Unicode 12.1 (JFlex
tables baked at generation time); this scanner floats with the
installed ``regex`` module's UCD (newer). Codepoints added or
re-classified after 12.1 may segment differently; all differential
goldens in tests/ pass on both.

Offsets are Python codepoint indices (the engine-wide convention);
the reference reports UTF-16 units — tests convert when comparing.
"""

from __future__ import annotations

import regex

__all__ = [
    "ALPHANUM", "NUM", "SOUTHEAST_ASIAN", "IDEOGRAPHIC", "HIRAGANA",
    "KATAKANA", "HANGUL", "EMOJI", "TOKEN_TYPES", "scan", "tokenize",
]

# token types — StandardTokenizer.java:43-64
ALPHANUM = 0
NUM = 1
SOUTHEAST_ASIAN = 2
IDEOGRAPHIC = 3
HIRAGANA = 4
KATAKANA = 5
HANGUL = 6
EMOJI = 7
TOKEN_TYPES = [
    "<ALPHANUM>", "<NUM>", "<SOUTHEAST_ASIAN>", "<IDEOGRAPHIC>",
    "<HIRAGANA>", "<KATAKANA>", "<HANGUL>", "<EMOJI>",
]

# ---- macro classes (jflex lines 52-105), verbatim semantics ----------

# UAX#29 WB4: X (Extend | Format | ZWJ)* -> X
_EFZ = r"[\p{wb=Format}\p{wb=Extend}\p{wb=ZWJ}]*"
# same, minus the text/emoji presentation selectors (emoji handling)
_EFZ_NP = r"[[\p{wb=Format}\p{wb=Extend}\p{wb=ZWJ}]--[\uFE0E\uFE0F]]*"

_KEYCAP_BASE = r"[0-9#*]"
# EmojiChar = Extended_Pictographic | (Emoji minus RI/keycap/accidental/
# modifier) — pinned to UCD 12.1 emoji-data.txt (public Unicode data,
# the version the reference's grammar is generated against) because
# the installed regex module's \p{Extended_Pictographic} table is
# incomplete (it drops non-Emoji pictographs such as U+2701 and the
# reserved pictographic ranges). Reconstructed by probing the
# reference's generated scanner one codepoint at a time: a scalar is
# in this class iff it scans alone to a single <EMOJI> token (minus
# the five skin-tone modifiers, which match via the modifier branch).
_EMOJI_CHAR_CLASS = ("©®‼⁉™ℹ↔-↙"
    "↩-↪⌚-⌛⌨⎈⏏⏩-⏳⏸-⏺"
    "Ⓜ▪-▫▶◀◻-◾☀-★☇-☒"
    "☔-⚅⚐-✅✈-✒✔✖✝✡✨"
    "✳-✴❄❇❌❎❓-❕❗❣-❧"
    "➕-➗➡➰➿⤴-⤵⬅-⬇⬛-⬜"
    "⭐⭕〰〽㊗㊙\U0001F000-\U0001F0FF"
    "\U0001F10D-\U0001F10F\U0001F12F\U0001F16C-\U0001F171"
    "\U0001F17E-\U0001F17F\U0001F18E\U0001F191-\U0001F19A"
    "\U0001F1AD-\U0001F1E5\U0001F201-\U0001F20F\U0001F21A\U0001F22F"
    "\U0001F232-\U0001F23A\U0001F23C-\U0001F23F\U0001F249-\U0001F3FA"
    "\U0001F400-\U0001F53D\U0001F546-\U0001F64F\U0001F680-\U0001F6FF"
    "\U0001F774-\U0001F77F\U0001F7D5-\U0001F7FF\U0001F80C-\U0001F80F"
    "\U0001F848-\U0001F84F\U0001F85A-\U0001F85F\U0001F888-\U0001F88F"
    "\U0001F8AE-\U0001F8FF\U0001F90C-\U0001F93A\U0001F93C-\U0001F945"
    "\U0001F947-\U0001FFFD")
_EMOJI_CHAR = rf"[{_EMOJI_CHAR_CLASS}]"
_EMOJI_CHAR_EX = _EMOJI_CHAR + _EFZ_NP
_EMB_EX = r"\p{Emoji_Modifier_Base}" + _EFZ_NP
_EM_EX = r"\p{Emoji_Modifier}" + _EFZ_NP
_PRES_SEL = r"\uFE0F"
# EmojiCharOrPresSeqOrModSeq
_ECPM = (
    rf"(?:\p{{wb=ZWJ}}*{_EMOJI_CHAR_EX}{_PRES_SEL}?"
    rf"|(?:\p{{wb=ZWJ}}*{_EMB_EX})?{_EM_EX})"
)
_TAG_SPEC = r"[\U000E0020-\U000E007E]"
_TAG_TERM = "\U000E007F"

_HANGUL_EX = r"[\p{Script=Hangul}&&[\p{wb=ALetter}\p{wb=Hebrew_Letter}]]" + _EFZ
_AHLETTER_EX = r"[\p{wb=ALetter}\p{wb=Hebrew_Letter}]" + _EFZ
_NUMERIC_EX = r"\p{wb=Numeric}" + _EFZ
_KATAKANA_EX = r"\p{wb=Katakana}" + _EFZ
_MIDLETTER_EX = r"[\p{wb=MidLetter}\p{wb=MidNumLet}\p{wb=Single_Quote}]" + _EFZ
_MIDNUM_EX = r"[\p{wb=MidNum}\p{wb=MidNumLet}\p{wb=Single_Quote}]" + _EFZ
_ENL_EX = r"\p{wb=ExtendNumLet}" + _EFZ
_HAN_EX = r"\p{Script=Han}" + _EFZ
_HIRAGANA_EX = r"\p{Script=Hiragana}" + _EFZ
_SQ_EX = r"\p{wb=Single_Quote}" + _EFZ
_DQ_EX = r"\p{wb=Double_Quote}" + _EFZ
_HEBREW_EX = r"\p{wb=Hebrew_Letter}" + _EFZ
_RI_EX = r"\p{wb=Regional_Indicator}" + _EFZ
_CC_EX = r"\p{LineBreak=Complex_Context}" + _EFZ

# ---- rules, in jflex file order (determines equal-length ties) -------

# emoji_sequence (TR#51 12.0, as transcribed in the jflex comments)
_R_EMOJI = (
    rf"(?:{_ECPM}(?:(?:\p{{wb=ZWJ}}{_ECPM})*|{_TAG_SPEC}+{_TAG_TERM})"
    rf"|{_KEYCAP_BASE}{_EFZ_NP}{_PRES_SEL}?\u20E3{_EFZ_NP}"
    rf"|(?:{_RI_EX}){{2}})"
)
# WB8/11/12/13a/13b numeric runs
_R_NUMERIC = (
    rf"(?:{_ENL_EX})*{_NUMERIC_EX}"
    rf"(?:(?:(?:{_ENL_EX})*|{_MIDNUM_EX}){_NUMERIC_EX})*"
    rf"(?:{_ENL_EX})*"
)
# typing-only subsets of the word rule (jflex: "subset of the below")
_R_HANGUL = rf"(?:{_HANGUL_EX})+"
_R_KATAKANA = rf"(?:{_KATAKANA_EX})+"
# WB5/6/7/7a/7b/7c/9/10/13/13a/13b word runs
_WORD_CORE = (
    rf"(?:{_KATAKANA_EX}(?:(?:{_ENL_EX})*{_KATAKANA_EX})*"
    rf"|(?:{_HEBREW_EX}(?:{_SQ_EX}|{_DQ_EX}{_HEBREW_EX})"
    rf"|{_NUMERIC_EX}(?:(?:(?:{_ENL_EX})*|{_MIDNUM_EX}){_NUMERIC_EX})*"
    rf"|{_AHLETTER_EX}(?:(?:(?:{_ENL_EX})*|{_MIDLETTER_EX}){_AHLETTER_EX})*"
    rf")+)"
)
_R_WORD = (
    rf"(?:{_ENL_EX})*{_WORD_CORE}"
    rf"(?:(?:{_ENL_EX})+{_WORD_CORE})*"
    rf"(?:{_ENL_EX})*"
)
_R_SEA = rf"(?:{_CC_EX})+"
_R_HAN = _HAN_EX
_R_HIRAGANA = _HIRAGANA_EX

_FLAGS = regex.V1 | regex.UNICODE
# The EMOJI rule is compiled POSIX (leftmost-LONGEST): its classes
# overlap (ZWJ is both WB4-attachable and structural), so greedy
# backtracking can succeed on a shorter match than the jflex DFA's
# longest (a ZWJ family sequence, e.g.). WORD has exactly one such
# internal overlap — Hebrew_Letter is also an AHLetter, so the
# AHLetter loop can starve the Hebrew+quote branch — but the starved
# continuation always begins with U+0027/U+0022, so the scanner runs
# the fast greedy WORD and falls back to the POSIX-compiled twin only
# when the greedy match stops directly before a quote char. The
# remaining rules use disjoint Word_Break property classes — greedy ==
# longest there unconditionally.
_RULES: list[tuple[regex.Pattern, int]] = [
    (regex.compile(_R_EMOJI, _FLAGS | regex.POSIX), EMOJI),
    (regex.compile(_R_NUMERIC, _FLAGS), NUM),
    (regex.compile(_R_HANGUL, _FLAGS), HANGUL),
    (regex.compile(_R_KATAKANA, _FLAGS), KATAKANA),
    (regex.compile(_R_WORD, _FLAGS), ALPHANUM),
    (regex.compile(_R_SEA, _FLAGS), SOUTHEAST_ASIAN),
    (regex.compile(_R_HAN, _FLAGS), IDEOGRAPHIC),
    (regex.compile(_R_HIRAGANA, _FLAGS), HIRAGANA),
]
_WORD_RULE_IDX = 4
_WORD_POSIX = regex.compile(_R_WORD, _FLAGS | regex.POSIX)
_QUOTES = "'\""  # wb=Single_Quote / wb=Double_Quote (single-char classes)
# one combined alternation used only to LOCATE the next position where
# any rule can start (fast skip over ignored chars); the rule choice at
# that position is then made by the longest-match loop below
_SEARCH = regex.compile(
    "|".join(f"(?:{p})" for p in
             (_R_EMOJI, _R_NUMERIC, _R_HANGUL, _R_KATAKANA, _R_WORD,
              _R_SEA, _R_HAN, _R_HIRAGANA)),
    _FLAGS,
)
# first-char gates: rule i can only match at a position whose first
# char is in _GATES[i] — memoized per codepoint so a typical position
# attempts 1-2 rule patterns, not 8
_GATES = [
    regex.compile(
        rf"[{_EMOJI_CHAR_CLASS}0-9#*\p{{Emoji_Modifier}}"
        rf"\p{{wb=ZWJ}}\p{{wb=Regional_Indicator}}]", _FLAGS),
    regex.compile(r"[\p{wb=Numeric}\p{wb=ExtendNumLet}]", _FLAGS),
    regex.compile(
        r"[\p{Script=Hangul}&&[\p{wb=ALetter}\p{wb=Hebrew_Letter}]]",
        _FLAGS),
    regex.compile(r"\p{wb=Katakana}", _FLAGS),
    regex.compile(
        r"[\p{wb=ALetter}\p{wb=Hebrew_Letter}\p{wb=Numeric}"
        r"\p{wb=Katakana}\p{wb=ExtendNumLet}]", _FLAGS),
    regex.compile(r"\p{LineBreak=Complex_Context}", _FLAGS),
    regex.compile(r"\p{Script=Han}", _FLAGS),
    regex.compile(r"\p{Script=Hiragana}", _FLAGS),
]
_char_rules: dict[str, tuple[int, ...]] = {}


def _rules_for(ch: str) -> tuple[int, ...]:
    r = _char_rules.get(ch)
    if r is None:
        r = tuple(i for i, g in enumerate(_GATES) if g.match(ch))
        _char_rules[ch] = r
    return r


def scan(text: str) -> list[tuple[int, int, int]]:
    """JFlex-parity scan: [(start, end, token_type)] over codepoint
    offsets. Longest match wins; equal lengths go to the
    earliest-listed rule (the jflex disambiguation contract)."""
    out: list[tuple[int, int, int]] = []
    pos, n = 0, len(text)
    search = _SEARCH.search
    rules = _RULES
    while pos < n:
        m = search(text, pos)
        if m is None:
            break
        p = m.start()
        best_end = -1
        best_type = ALPHANUM
        for i in _rules_for(text[p]):
            pat, ttype = rules[i]
            r = pat.match(text, p)
            if r is None:
                continue
            e = r.end()
            if (
                i == _WORD_RULE_IDX
                and e < n
                and text[e] in _QUOTES
            ):
                e = _WORD_POSIX.match(text, p).end()
            if e > best_end:
                best_end = e
                best_type = ttype
        if best_end <= p:
            # gate produced no matching rule at the searched position
            # (possible when _SEARCH matched via a rule whose gate char
            # differs) — fall back to the full rule set
            for i, (pat, ttype) in enumerate(rules):
                r = pat.match(text, p)
                if r is None:
                    continue
                e = r.end()
                if i == _WORD_RULE_IDX and e < n and text[e] in _QUOTES:
                    e = _WORD_POSIX.match(text, p).end()
                if e > best_end:
                    best_end = e
                    best_type = ttype
        out.append((p, best_end, best_type))
        pos = best_end
    return out


def tokenize(text: str) -> list[str]:
    return [text[s:e] for s, e, _ in scan(text)]


# ---- ASCII fast path --------------------------------------------------
# For pure-ASCII text only three rules can fire and they collapse to
# one stdlib-re pattern (no Emoji/SEA/CJK/Hebrew/Extend/Format/ZWJ
# codepoints exist below U+0080; ASCII WB values: A-Za-z=ALetter,
# 0-9=Numeric, _=ExtendNumLet, '=Single_Quote, .=MidNumLet,
# :=MidLetter, both , and ; =MidNum). Token TYPE for ASCII spans is
# NUM iff the span contains no letter, else ALPHANUM. Possessive
# quantifiers keep the ambiguous _-split backtracking linear.
# Equivalence to scan() on ASCII is property-tested (test_uax29.py).

import re as _re

_A_NUM = r"[0-9](?:(?:_*+|[.,;'])[0-9])*+"
_A_ALPHA = r"[A-Za-z](?:(?:_*+|[.:'])[A-Za-z])*+"
_A_CORE = rf"(?:{_A_NUM}|{_A_ALPHA})++"
ASCII_WORD_RE = _re.compile(rf"_*+{_A_CORE}(?:_++{_A_CORE})*+_*+")


def tokenize_ascii(text: str) -> list[str]:
    """Fast path: identical output to ``tokenize`` for ASCII input."""
    return ASCII_WORD_RE.findall(text)
