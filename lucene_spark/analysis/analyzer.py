"""Analysis chain — the StandardAnalyzer equivalent, vectorized for Arrow batches.

Reference semantics (SURVEY.md §2.2):

- StandardAnalyzer = StandardTokenizer (UAX#29 word break) -> LowerCaseFilter
  -> StopFilter with an EMPTY default stop set
  (lucene/core/src/java/org/apache/lucene/analysis/standard/StandardAnalyzer.java:51-53,84-96).
- maxTokenLength = 255: longer tokens are split at maxTokenLength intervals
  (StandardAnalyzer.java:37,66-69).
- LowerCaseFilter = per-codepoint Character.toLowerCase
  (lucene/core/src/java/org/apache/lucene/analysis/LowerCaseFilter.java:23,38).

StandardAnalyzer's tokenizer is the EXACT UAX#29 word-break scanner in
analysis/uax29.py (jflex-grammar parity, differentially verified
against the reference's generated scanner — see that module's header
for the one documented skew: Unicode version floats with the installed
UCD, the reference pins 12.1). Pure-ASCII rows take a proven-identical
stdlib-re fast path so the index build hot loop stays regex-cheap.

Known deviations (documented): Python's str.lower() differs from Java
Character.toLowerCase for a handful of codepoints (e.g. U+0130).

Everything operates on pandas Series (one call per Arrow batch; no
per-row Python UDF dispatch), per BASELINE.json input_hint.
"""

from __future__ import annotations

import re
from typing import Callable

import pandas as pd

from lucene_spark.analysis import uax29

MAX_TOKEN_LENGTH = 255  # StandardAnalyzer.java:37

_SIMPLE_PATTERN = re.compile(r"[a-z0-9]+")
_WS_PATTERN = re.compile(r"\S+")


def _chop(tokens: list[str], max_len: int) -> list[str]:
    """Split tokens longer than max_len at max_len intervals
    (StandardTokenizer maxTokenLength contract)."""
    if all(len(t) <= max_len for t in tokens):
        return tokens
    out: list[str] = []
    for t in tokens:
        if len(t) <= max_len:
            out.append(t)
        else:
            out.extend(t[i : i + max_len] for i in range(0, len(t), max_len))
    return out


class Analyzer:
    """Base analyzer: a named, picklable tokenize function over Series.

    The Spark analog of Analyzer/TokenStream (CORE/analysis/Analyzer.java):
    one row in -> many terms out, batch-at-a-time.
    """

    name = "base"

    def tokenize_one(self, text: str) -> list[str]:
        raise NotImplementedError

    def tokenize(self, texts: pd.Series) -> pd.Series:
        """Series[str] -> Series[list[str]] (nulls -> empty list)."""
        fn = self.tokenize_one
        return texts.map(lambda t: fn(t) if isinstance(t, str) else [])

    # ---- offsets (OffsetAttribute role) -------------------------------
    # Tokenizers that can report each token's char span implement
    # tokenize_with_offsets_one; store_offsets indexing requires it.

    def supports_offsets(self) -> bool:
        return type(self).tokenize_with_offsets_one is not Analyzer.tokenize_with_offsets_one

    def tokenize_with_offsets_one(self, text: str):
        """-> (tokens, starts, ends) with starts/ends char offsets into
        the ORIGINAL text, or raise if the analyzer cannot track
        offsets (cross-token filters like shingles)."""
        raise NotImplementedError(f"{self.name} does not track offsets")

    # ---- payloads (PayloadAttribute role) -----------------------------
    # Analyzers that attach a per-occurrence payload (a float, the
    # DelimitedPayloadTokenFilter + PayloadHelper.encodeFloat shape)
    # implement tokenize_with_payloads_one; store_payloads indexing
    # requires it.

    def supports_payloads(self) -> bool:
        return (
            type(self).tokenize_with_payloads_one
            is not Analyzer.tokenize_with_payloads_one
        )

    def tokenize_with_payloads_one(self, text: str):
        """-> (tokens, payloads) with one float payload per token."""
        raise NotImplementedError(f"{self.name} does not produce payloads")

    # ---- positions (PositionIncrementAttribute role) -------------------
    # Graph analyzers (analysis/graph.py) flatten to explicit token
    # positions — stacked synonyms share a position (posInc 0), exactly
    # the FlattenGraphFilter index contract. Flat analyzers use the
    # default arange positions the builder derives.

    def supports_positions(self) -> bool:
        return (
            type(self).tokenize_with_positions_one
            is not Analyzer.tokenize_with_positions_one
        )

    def tokenize_with_positions_one(self, text: str):
        """-> (tokens, positions), positions non-decreasing ints;
        repeated values are stacked tokens (posInc 0)."""
        raise NotImplementedError(f"{self.name} does not track positions")


class StandardAnalyzer(Analyzer):
    """Exact UAX#29 word break (uax29.scan) -> lowercase -> empty stop
    set; ASCII rows take the proven-identical stdlib-re fast path."""

    name = "standard"

    def __init__(self, max_token_length: int = MAX_TOKEN_LENGTH, stopwords: frozenset[str] = frozenset()):
        self.max_token_length = max_token_length
        self.stopwords = stopwords

    def tokenize_one(self, text: str) -> list[str]:
        # Tokenize FIRST, lowercase after — LowerCaseFilter runs downstream
        # of StandardTokenizer (StandardAnalyzer.java:93-95), and max-length
        # chopping happens in the tokenizer (pre-lowercase).
        if text.isascii():
            toks = uax29.tokenize_ascii(text)  # identical, ~17x faster
        else:
            toks = uax29.tokenize(text)
        toks = _chop(toks, self.max_token_length)
        toks = [t.lower() for t in toks]
        if self.stopwords:
            toks = [t for t in toks if t not in self.stopwords]
        return toks

    def tokenize_with_offsets_one(self, text: str):
        # offsets refer to the ORIGINAL text; str.lower() is applied
        # per token (length-preserving for the corpus's scripts — the
        # handful of expanding codepoints like U+0130 are in the
        # documented deviations)
        if text.isascii():
            spans = [
                (m.start(), m.end()) for m in uax29.ASCII_WORD_RE.finditer(text)
            ]
        else:
            spans = [(s, e) for s, e, _ in uax29.scan(text)]
        toks: list[str] = []
        starts: list[int] = []
        ends: list[int] = []
        for s, e in spans:
            for i in range(s, e, self.max_token_length):
                j = min(i + self.max_token_length, e)
                low = text[i:j].lower()
                if self.stopwords and low in self.stopwords:
                    continue
                toks.append(low)
                starts.append(i)
                ends.append(j)
        return toks, starts, ends


class SimpleAnalyzer(Analyzer):
    """lowercase -> runs of [a-z0-9].

    Exactly expressible in ANSI SQL
    (``regexp_split_to_array(lower(content), '[^a-z0-9]+')``) — used for
    the driver's DuckDB-oracle correctness gate so both sides tokenize
    identically.
    """

    name = "simple"

    def tokenize_one(self, text: str) -> list[str]:
        return _SIMPLE_PATTERN.findall(text.lower())

    def tokenize_with_offsets_one(self, text: str):
        # scan the LOWERCASED text (str.lower is length-preserving for
        # the ASCII classes this pattern matches) so tokens and spans
        # agree with tokenize_one exactly
        toks, starts, ends = [], [], []
        for m in _SIMPLE_PATTERN.finditer(text.lower()):
            toks.append(m.group(0))
            starts.append(m.start())
            ends.append(m.end())
        return toks, starts, ends


class WhitespaceAnalyzer(Analyzer):
    name = "whitespace"

    def tokenize_one(self, text: str) -> list[str]:
        return _WS_PATTERN.findall(text)

    def tokenize_with_offsets_one(self, text: str):
        toks, starts, ends = [], [], []
        for m in _WS_PATTERN.finditer(text):
            toks.append(m.group(0))
            starts.append(m.start())
            ends.append(m.end())
        return toks, starts, ends


class DelimitedPayloadAnalyzer(Analyzer):
    """WhitespaceTokenizer -> DelimitedPayloadTokenFilter with a float
    encoder (analysis/common/.../payloads/DelimitedPayloadTokenFilter.java:
    splits each token at the FINAL delimiter; the suffix becomes the
    occurrence's payload via PayloadHelper.encodeFloat). Deviations,
    documented: a token with no delimiter (or a non-numeric suffix)
    keeps its full text and carries payload 0.0 — the reference leaves
    the PayloadAttribute unset, a state our fixed-width payload column
    does not represent.
    """

    name = "delimited_payload"

    def __init__(self, delimiter: str = "|"):
        self.delimiter = delimiter

    def _split(self, raw: str) -> tuple[str, float]:
        i = raw.rfind(self.delimiter)
        if i < 0:
            return raw, 0.0
        try:
            return raw[:i], float(raw[i + 1 :])
        except ValueError:
            return raw, 0.0

    def tokenize_one(self, text: str) -> list[str]:
        return [self._split(t)[0] for t in _WS_PATTERN.findall(text)]

    def tokenize_with_payloads_one(self, text: str):
        toks: list[str] = []
        pays: list[float] = []
        for raw in _WS_PATTERN.findall(text):
            t, p = self._split(raw)
            toks.append(t)
            pays.append(p)
        return toks, pays


_CAMEL_SPLIT = re.compile(
    r"""
      \d+                 # digit runs are their own parts
    | [A-Z]+(?![a-z])     # ALLCAPS run not followed by lowercase (HTTPServer -> HTTP)
    | [A-Z][a-z]*         # Capitalized word
    | [a-z]+              # lowercase run
    """,
    re.VERBOSE,
)
_CODE_TOKEN = re.compile(r"[A-Za-z0-9_]+")


class CodeAnalyzer(Analyzer):
    """Source-code identifier analyzer — the WordDelimiterGraphFilter
    role (analysis/common/.../miscellaneous/WordDelimiterGraphFilter.java;
    SURVEY.md §2.2 notes it as the natural code-identifier splitter).

    `parseHTTPResponse_v2` emits the original token (preserveOriginal)
    plus its parts split on case transitions, underscores, and
    letter/digit boundaries: [parsehttpresponse_v2, parse, http,
    response, v, 2]. Subtokens follow the original so phrase positions
    stay anchored on original-token order (one position per source
    identifier would need full graph positions; like Lucene's filter
    with adjustOffsets, parts share the original's position slot here —
    positions are assigned downstream by list order, documented
    approximation for phrase queries over code)."""

    name = "code"

    def __init__(self, preserve_original: bool = True, min_part: int = 1):
        self.preserve_original = preserve_original
        self.min_part = min_part

    def tokenize_one(self, text: str) -> list[str]:
        out: list[str] = []
        for raw in _CODE_TOKEN.findall(text):
            parts = [
                p.lower()
                for seg in raw.split("_")
                for p in _CAMEL_SPLIT.findall(seg)
                if len(p) >= self.min_part
            ]
            low = raw.lower()
            if self.preserve_original:
                out.append(low)
                if parts != [low]:
                    out.extend(parts)
            else:
                out.extend(parts if parts else [low])
        return out


_REGISTRY: dict[str, Callable[[], Analyzer]] = {
    "standard": StandardAnalyzer,
    "simple": SimpleAnalyzer,
    "whitespace": WhitespaceAnalyzer,
    "code": CodeAnalyzer,
    "delimited_payload": DelimitedPayloadAnalyzer,
}


def get_analyzer(name: str) -> Analyzer:
    """SPI-style lookup by name (AnalysisSPILoader analog)."""
    try:
        return _REGISTRY[name]()
    except KeyError:
        raise ValueError(f"unknown analyzer {name!r}; have {sorted(_REGISTRY)}") from None
