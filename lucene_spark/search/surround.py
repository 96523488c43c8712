"""Surround query parser.

The surround language (reference queryparser/surround/parser/
QueryParser.java class doc): positional operators W (ordered) and N
(unordered) with an optional numeric distance prefix 2-99 (default 1 =
adjacent; `3W(a, b)` = up to two terms between a and b), boolean
AND/OR/NOT (case-insensitive, infix or prefix notation), truncation
wildcards `*`/`?`, quoting, grouping, `field:` prefixes and `^boost`
suffixes.

Mapping (reference surround/query/DistanceQuery.java:96 — slop =
opDistance - 1, ordered = W):

- distance ops        -> SpanQuery(SpanNear(..., slop=d-1, in_order))
- truncated operands  -> SpanMulti(Prefix/Wildcard) expanded at compile
                         (SpanNearClauseFactory.java)
- OR inside distance  -> SpanOr; AND/NOT inside a distance op is
                         rejected like the reference's
                         SpanNearClauseFactory (UnsupportedOperation)
- top-level AND/OR    -> BooleanQuery MUST / SHOULD
- infix NOT           -> first operand MUST, rest MUST_NOT
                         (surround/query/NotQuery.java:40)

Terms are NOT analyzed (the surround contract) beyond lowercasing to
match the index's lowercase term dictionary.
"""

from __future__ import annotations

import re

from lucene_spark.search import query as Q


class SurroundParseError(ValueError):
    pass


_TOKEN = re.compile(r'"[^"]*"|[(),:]|\^[0-9]+(?:\.[0-9]+)?|[^\s(),:^"]+')
_DIST = re.compile(r"^([0-9]{1,2})?([wWnN])$")


def _is_word(tok: str) -> bool:
    return tok not in "(),:" and not tok.startswith("^") and not (
        tok.startswith('"') and tok.endswith('"')
    )


class SurroundQueryParser:
    """parse(s) -> Q.Query over `field` (overridable with `f:` prefixes)."""

    def __init__(self, field: str):
        self.field = field

    # -- token stream ------------------------------------------------------

    def parse(self, s: str) -> Q.Query:
        self.toks = _TOKEN.findall(s)
        self.i = 0
        node = self._or_expr(self.field)
        if self.i != len(self.toks):
            raise SurroundParseError(
                f"trailing input at token {self.i}: {self.toks[self.i]!r}"
            )
        return self._to_query(node)

    def _peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> str:
        tok = self._peek()
        if tok is None:
            raise SurroundParseError("unexpected end of input")
        self.i += 1
        return tok

    # -- grammar (precedence: OR < AND < NOT < W/N < atom) -----------------

    def _or_expr(self, field):
        parts = [self._and_expr(field)]
        while (t := self._peek()) is not None and t.upper() == "OR":
            self.i += 1
            parts.append(self._and_expr(field))
        return parts[0] if len(parts) == 1 else ("or", parts)

    def _and_expr(self, field):
        parts = [self._not_expr(field)]
        while (t := self._peek()) is not None and t.upper() == "AND":
            self.i += 1
            parts.append(self._not_expr(field))
        return parts[0] if len(parts) == 1 else ("and", parts)

    def _not_expr(self, field):
        first = self._dist_expr(field)
        rest = []
        while (t := self._peek()) is not None and t.upper() == "NOT":
            self.i += 1
            rest.append(self._dist_expr(field))
        return first if not rest else ("notq", first, rest)

    def _dist_expr(self, field):
        left = self._primary(field)
        while (t := self._peek()) is not None and (m := _DIST.match(t)):
            self.i += 1
            dist = int(m.group(1) or 1)
            ordered = m.group(2).upper() == "W"
            operands = [left, self._primary(field)]
            # chain `a W b W c` into one operator list (the infix
            # grammar collects a query list per operator run)
            while (t2 := self._peek()) is not None and t2.upper() == t.upper():
                self.i += 1
                operands.append(self._primary(field))
            left = (
                "span",
                Q.SpanNear(
                    tuple(self._to_span(o) for o in operands),
                    slop=dist - 1,
                    in_order=ordered,
                ),
                field,
                1.0,
            )
        return left

    def _primary(self, field):
        tok = self._next()
        if tok == "(":
            node = self._or_expr(field)
            if self._next() != ")":
                raise SurroundParseError("expected )")
            return self._boost(node)
        if tok.startswith('"') and tok.endswith('"') and len(tok) >= 2:
            # quoted = literal single term, operators lose their meaning
            return self._boost(("term", tok[1:-1].lower(), field, 1.0))
        if not _is_word(tok):
            raise SurroundParseError(f"unexpected token {tok!r}")
        up = tok.upper()
        if up in ("AND", "OR", "NOT") or _DIST.match(tok):
            if self._peek() == "(":
                return self._boost(self._prefix_op(tok, field))
            raise SurroundParseError(f"operator {tok!r} without operands")
        if self._peek() == ":":
            self.i += 1  # field:atom / field:(...) — FieldsQuery
            return self._primary(tok)
        word = tok.lower()
        if "*" in word or "?" in word:
            if word.endswith("*") and not any(c in "*?" for c in word[:-1]):
                mq = Q.PrefixQuery(field, word[:-1])
            else:
                mq = Q.WildcardQuery(field, word)
            return self._boost(("multi", mq, field, 1.0))
        return self._boost(("term", word, field, 1.0))

    def _prefix_op(self, op: str, field):
        assert self._next() == "("
        args = [self._or_expr(field)]
        while self._peek() == ",":
            self.i += 1
            args.append(self._or_expr(field))
        if self._next() != ")":
            raise SurroundParseError("expected )")
        up = op.upper()
        if up == "AND":
            return ("and", args)
        if up == "OR":
            return ("or", args)
        if up == "NOT":
            if len(args) < 2:
                raise SurroundParseError("NOT() needs at least 2 operands")
            return ("notq", args[0], args[1:])
        m = _DIST.match(op)
        dist = int(m.group(1) or 1)
        return (
            "span",
            Q.SpanNear(
                tuple(self._to_span(a) for a in args),
                slop=dist - 1,
                in_order=m.group(2).upper() == "W",
            ),
            field,
            1.0,
        )

    def _boost(self, node):
        if (t := self._peek()) is not None and t.startswith("^"):
            self.i += 1
            b = float(t[1:])
            if node[0] in ("term", "multi", "span"):
                return (*node[:3], node[3] * b)
            raise SurroundParseError("boost on a boolean group")
        return node

    # -- conversion --------------------------------------------------------

    def _to_span(self, node):
        kind = node[0]
        if kind == "term":
            return Q.SpanTerm(node[1])
        if kind == "multi":
            return Q.SpanMulti(node[1])
        if kind == "span":
            return node[1]
        if kind == "or":
            return Q.SpanOr(tuple(self._to_span(p) for p in node[1]))
        raise SurroundParseError(
            "AND/NOT not allowed inside a distance operator "
            "(SpanNearClauseFactory)"
        )

    def _to_query(self, node) -> Q.Query:
        kind = node[0]
        if kind == "term":
            return Q.TermQuery(node[2], node[1], boost=node[3])
        if kind == "multi":
            mq = node[1]
            return mq if node[3] == 1.0 else _with_boost(mq, node[3])
        if kind == "span":
            return Q.SpanQuery(node[2], node[1], boost=node[3])
        if kind == "or":
            return Q.BooleanQuery(
                should=tuple(self._to_query(p) for p in node[1])
            )
        if kind == "and":
            return Q.BooleanQuery(
                must=tuple(self._to_query(p) for p in node[1])
            )
        if kind == "notq":
            return Q.BooleanQuery(
                must=(self._to_query(node[1]),),
                must_not=tuple(self._to_query(p) for p in node[2]),
            )
        raise SurroundParseError(kind)


def _with_boost(q: Q.Query, b: float) -> Q.Query:
    import dataclasses

    return dataclasses.replace(q, boost=getattr(q, "boost", 1.0) * b)
