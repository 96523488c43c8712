"""Extendable query parser — the ``queryparser/ext`` package.

Reference: ``queryparser/src/java/org/apache/lucene/queryparser/ext/``
— ``ExtendableQueryParser.java`` (a classic QueryParser whose
getFieldQuery dispatches to a registered ``ParserExtension`` when the
field token carries an extension key), ``Extensions.java`` (the
key→extension registry, the delimiter, and splitExtensionField /
escapeExtensionField / buildExtensionField), ``ExtensionQuery.java``
(what an extension receives: the parser, the resolved field, the raw
term text).

Split semantics kept exactly (Extensions.java:106-113): the FIELD
token is split at the FIRST delimiter; no delimiter → classic
behavior; delimiter at position 0 → the default field carries the
extension. Because the classic grammar already claims the first
unescaped ``:`` as the field separator, an extension key rides inside
the field token via escaping — ``aField\\:key:term`` — which
``ExtendableQueryParser._split_field`` unescapes before the extension
split, mirroring the JavaCC-level escape handling."""

from __future__ import annotations

import re

from lucene_spark.search import query as Q
from lucene_spark.search.queryparser import ParseError, QueryParser

__all__ = [
    "ExtensionQuery",
    "ParserExtension",
    "Extensions",
    "ExtendableQueryParser",
]

_UNESCAPED_COLON = re.compile(r"(?<!\\):")


class ExtensionQuery:
    """ExtensionQuery.java: what a ParserExtension gets to work with."""

    def __init__(self, top_level_parser: QueryParser, field: str,
                 raw_term: str):
        self.top_level_parser = top_level_parser
        self.field = field
        self.raw_term = raw_term


class ParserExtension:
    """ParserExtension.java: parse(ExtensionQuery) -> Query."""

    def parse(self, query: ExtensionQuery) -> Q.Query:
        raise NotImplementedError


class Extensions:
    """Extensions.java: the key -> ParserExtension registry."""

    DEFAULT_EXTENSION_FIELD_DELIMITER = ":"

    def __init__(self, delimiter: str = DEFAULT_EXTENSION_FIELD_DELIMITER):
        if len(delimiter) != 1:
            raise ValueError("delimiter must be one character")
        self.delimiter = delimiter
        self._ext: dict[str, ParserExtension] = {}

    def add(self, key: str, extension: ParserExtension) -> None:
        self._ext[key] = extension

    def get_extension(self, key: str | None) -> ParserExtension | None:
        return None if key is None else self._ext.get(key)

    def split_extension_field(
        self, default_field: str, field: str
    ) -> tuple[str, str | None]:
        """(field, extension key): split at the FIRST delimiter; no
        delimiter -> (field, None); empty field part -> default."""
        i = field.find(self.delimiter)
        if i < 0:
            return field, None
        return (default_field if i == 0 else field[:i]), field[i + 1:]

    def escape_extension_field(self, extfield: str) -> str:
        """QueryParserBase.escape over the field token (the classic
        special set)."""
        return re.sub(r'([+\-!(){}\[\]^"~*?:\\/&|])', r"\\\1", extfield)

    def build_extension_field(
        self, extension_key: str, field: str = ""
    ) -> str:
        """Inverse of split_extension_field (field may be empty -> the
        default-field form), escaped for the classic grammar."""
        return self.escape_extension_field(
            f"{field}{self.delimiter}{extension_key}"
        )


class ExtendableQueryParser(QueryParser):
    """ExtendableQueryParser.java: classic parsing everywhere, except a
    field token carrying a registered extension key routes its term to
    the extension."""

    def __init__(self, default_field: str, extensions: Extensions,
                 analyze=None):
        super().__init__(default_field, analyze)
        self.extensions = extensions

    def _split_field(self, word: str) -> tuple[str, str]:
        m = _UNESCAPED_COLON.search(word)
        if not m:
            return self.default_field, word
        raw_field, rest = word[: m.start()], word[m.end():]
        if not rest:
            raise ParseError(f"empty term for field {raw_field}")
        # unescape the field token (the JavaCC discardEscapeChar role;
        # only the chars escape_extension_field escapes appear here)
        return re.sub(r"\\(.)", r"\1", raw_field), rest

    def _field_query(self, field: str, word: str) -> Q.Query:
        f, key = self.extensions.split_extension_field(
            self.default_field, field
        )
        ext = self.extensions.get_extension(key)
        if ext is not None:
            return ext.parse(ExtensionQuery(self, f, word))
        return super()._field_query(field, word)
