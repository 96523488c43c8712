"""Pattern module goldens — transcribed from the reference's
TestPatternTokenizer.java and TestPatternCaptureGroupTokenFilter.java
(the full matrix, camelCase multi-pattern included)."""

import pytest

from lucene_spark.analysis.pattern import (
    PatternAnalyzer,
    PatternCaptureGroupFilter,
    PatternReplaceFilter,
    pattern_captures,
)


# --- PatternTokenizer (TestPatternTokenizer.java table) ---

TOKENIZER = [
    (-1, "--", "aaa--bbb--ccc", ["aaa", "bbb", "ccc"]),
    (-1, ":", "aaa:bbb:ccc", ["aaa", "bbb", "ccc"]),
    (-1, r"\s", "aaa   bbb \t\tccc  ", ["aaa", "bbb", "ccc"]),
    (-1, ":", "boo:and:foo", ["boo", "and", "foo"]),
    (-1, "o", "boo:and:foo", ["b", ":and:f"]),
    (0, ":", "boo:and:foo", [":", ":"]),
    (0, r"'([^']+)'", "aaa 'bbb' 'ccc'", ["'bbb'", "'ccc'"]),
    (1, r"'([^']+)'", "aaa 'bbb' 'ccc'", ["bbb", "ccc"]),
]


@pytest.mark.parametrize("group,pat,inp,exp", TOKENIZER)
def test_pattern_tokenizer(group, pat, inp, exp):
    a = PatternAnalyzer(pat, group=group)
    toks, starts, ends = a.tokenize_with_offsets_one(inp)
    assert toks == exp
    assert all(inp[s:e] == t for t, s, e in zip(toks, starts, ends))


def test_pattern_replace_filter():
    # PatternReplaceFilter: all vs first-only
    assert PatternReplaceFilter("o", "0").apply(["foo", "boo"]) == ["f00", "b00"]
    assert PatternReplaceFilter("o", "0", all=False).apply(["foo"]) == ["f0o"]


# --- PatternCaptureGroupTokenFilter matrix ---
# rows: (input_tokens, patterns, preserve, expected)

CAPTURE = [
    # testNoPattern
    (["foobarbaz"], [], False, ["foobarbaz"]),
    (["foobarbaz"], [], True, ["foobarbaz"]),
    (["foo", "bar", "baz"], [], False, ["foo", "bar", "baz"]),
    # testNoMatch
    (["foobarbaz"], ["xx"], False, ["foobarbaz"]),
    (["foobarbaz"], ["xx"], True, ["foobarbaz"]),
    (["foo", "bar", "baz"], ["xx"], True, ["foo", "bar", "baz"]),
    # testNoCapture (pattern without groups contributes nothing)
    (["foobarbaz"], [".."], False, ["foobarbaz"]),
    (["foobarbaz"], [".."], True, ["foobarbaz"]),
    # testEmptyCapture
    (["foobarbaz"], [".(y*)"], False, ["foobarbaz"]),
    (["foobarbaz"], [".(y*)"], True, ["foobarbaz"]),
    # testCaptureAll
    (["foobarbaz"], ["(.+)"], False, ["foobarbaz"]),
    (["foobarbaz"], ["(.+)"], True, ["foobarbaz"]),
    (["foo", "bar", "baz"], ["(.+)"], False, ["foo", "bar", "baz"]),
    (["foo", "bar", "baz"], ["(.+)"], True, ["foo", "bar", "baz"]),
    # testCaptureStart
    (["foobarbaz"], ["^(.)"], False, ["f"]),
    (["foobarbaz"], ["^(.)"], True, ["foobarbaz", "f"]),
    (["foo", "bar", "baz"], ["^(.)"], False, ["f", "b", "b"]),
    (["foo", "bar", "baz"], ["^(.)"], True,
     ["foo", "f", "bar", "b", "baz", "b"]),
    # testCaptureMiddle
    (["foobarbaz"], ["^.(.)."], False, ["o"]),
    (["foobarbaz"], ["^.(.)."], True, ["foobarbaz", "o"]),
    (["foo", "bar", "baz"], ["^.(.)."], False, ["o", "a", "a"]),
    (["foo", "bar", "baz"], ["^.(.)."], True,
     ["foo", "o", "bar", "a", "baz", "a"]),
    # testCaptureEnd
    (["foobarbaz"], ["(.)$"], False, ["z"]),
    (["foobarbaz"], ["(.)$"], True, ["foobarbaz", "z"]),
    (["foo", "bar", "baz"], ["(.)$"], False, ["o", "r", "z"]),
    (["foo", "bar", "baz"], ["(.)$"], True,
     ["foo", "o", "bar", "r", "baz", "z"]),
    # testCaptureStartMiddle
    (["foobarbaz"], ["^(.)(.)"], False, ["f", "o"]),
    (["foobarbaz"], ["^(.)(.)"], True, ["foobarbaz", "f", "o"]),
    (["foo", "bar", "baz"], ["^(.)(.)"], False,
     ["f", "o", "b", "a", "b", "a"]),
    (["foo", "bar", "baz"], ["^(.)(.)"], True,
     ["foo", "f", "o", "bar", "b", "a", "baz", "b", "a"]),
    # testCaptureStartEnd
    (["foobarbaz"], ["^(.).+(.)$"], False, ["f", "z"]),
    (["foobarbaz"], ["^(.).+(.)$"], True, ["foobarbaz", "f", "z"]),
    (["foo", "bar", "baz"], ["^(.).+(.)$"], False,
     ["f", "o", "b", "r", "b", "z"]),
    (["foo", "bar", "baz"], ["^(.).+(.)$"], True,
     ["foo", "f", "o", "bar", "b", "r", "baz", "b", "z"]),
    # testCaptureMiddleEnd
    (["foobarbaz"], ["(.)(.)$"], False, ["a", "z"]),
    (["foobarbaz"], ["(.)(.)$"], True, ["foobarbaz", "a", "z"]),
    (["foo", "bar", "baz"], ["(.)(.)$"], False,
     ["o", "o", "a", "r", "a", "z"]),
    (["foo", "bar", "baz"], ["(.)(.)$"], True,
     ["foo", "o", "o", "bar", "a", "r", "baz", "a", "z"]),
    # testMultiCaptureOverlap
    (["foobarbaz"], ["(.(.(.)))"], False,
     ["foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"]),
    (["foobarbaz"], ["(.(.(.)))"], True,
     ["foobarbaz", "foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"]),
    (["foo", "bar", "baz"], ["(.(.(.)))"], False,
     ["foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"]),
    (["foo", "bar", "baz"], ["(.(.(.)))"], True,
     ["foo", "oo", "o", "bar", "ar", "r", "baz", "az", "z"]),
    # testMultiPattern
    (["aaabbbaaa"], ["(aaa)", "(bbb)", "(ccc)"], False,
     ["aaa", "bbb", "aaa"]),
    (["aaabbbaaa"], ["(aaa)", "(bbb)", "(ccc)"], True,
     ["aaabbbaaa", "aaa", "bbb", "aaa"]),
    (["aaa", "bbb", "aaa"], ["(aaa)", "(bbb)", "(ccc)"], False,
     ["aaa", "bbb", "aaa"]),
    (["aaa", "bbb", "aaa"], ["(aaa)", "(bbb)", "(ccc)"], True,
     ["aaa", "bbb", "aaa"]),
    # testCamelCase (4-way pattern merge)
    (["letsPartyLIKEits1999_dude"],
     ["([A-Z]{2,})",
      "(?<![A-Z])([A-Z][a-z]+)",
      r"(?:^|\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)",
      "([0-9]+)"],
     False,
     ["lets", "Party", "LIKE", "its", "1999", "dude"]),
    (["letsPartyLIKEits1999_dude"],
     ["([A-Z]{2,})",
      "(?<![A-Z])([A-Z][a-z]+)",
      r"(?:^|\b|(?<=[0-9_])|(?<=[A-Z]{2}))([a-z]+)",
      "([0-9]+)"],
     True,
     ["letsPartyLIKEits1999_dude",
      "lets", "Party", "LIKE", "its", "1999", "dude"]),
]


@pytest.mark.parametrize("toks,pats,preserve,exp", CAPTURE)
def test_pattern_capture_group(toks, pats, preserve, exp):
    f = PatternCaptureGroupFilter(pats, preserve_original=preserve)
    assert f.apply(toks) == exp


def test_pattern_captures_unmatched_optional_group():
    # non-participating groups report span (-1,-1) == empty -> skipped
    import re
    assert pattern_captures("abc", [re.compile("(x)?(a)")], False) == ["a"]
