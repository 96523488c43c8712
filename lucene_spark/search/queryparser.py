r"""Classic query-string parser -> Query AST (SURVEY.md §3.3).

A hand-rolled recursive-descent parser for the subset of Lucene's
classic QueryParser grammar the reference query sets use
(queryparser/src/java/org/apache/lucene/queryparser/classic/
QueryParser.jj; clause factories QueryParserBase.java:456-792):

    query   := clause*
    clause  := [AND|OR|&&|\|\|] [+|-|NOT] atom [^boost]
    atom    := '(' query ')' | '"' phrase '"' | [field ':'] termish
    termish := word            -> TermQuery (analyzed)
             | word*           -> PrefixQuery (trailing * only)
             | w*rd / w?rd     -> WildcardQuery
             | word~N          -> FuzzyQuery (max_edits N, default 2)
             | [a TO b]        -> TermRangeQuery inclusive
             | {a TO b}        -> TermRangeQuery exclusive

Clause algebra matches QueryParserBase#addClause with the default OR
operator: bare terms are SHOULD; `+`/`AND` promote to MUST (AND also
promotes the previous non-prohibited clause); `-`/`NOT` are MUST_NOT.
Term text runs through the analyzer (getFieldQuery analyzes text —
QueryParserBase.java:456); multi-token analysis of a bare word yields a
PhraseQuery exactly like the classic parser.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from lucene_spark.search import query as Q

_TOKEN_RX = re.compile(
    r"""\s*(?:
        (?P<lparen>\() |
        (?P<rparen>\)) |
        (?P<and>AND\b|&&) |
        (?P<or>OR\b|\|\|) |
        (?P<not>NOT\b) |
        (?P<plus>\+) |
        (?P<minus>-) |
        (?P<quoted>"(?P<qtext>[^"]*)"(?:~(?P<pslop>\d+))?) |
        (?P<range>(?P<lb>[\[{])\s*(?P<lo>\S+)\s+TO\s+(?P<hi>\S+)\s*(?P<rb>[\]}])) |
        (?P<term>[^\s()^+\-][^\s()^]*)
    )""",
    re.VERBOSE,
)

_BOOST_RX = re.compile(r"\^(\d+(?:\.\d+)?)")


class ParseError(ValueError):
    pass


def _default_analyze(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]


class QueryParser:
    """parse(s) -> Query. ``analyze`` maps raw text to index terms and
    must match the analyzer the index was built with."""

    def __init__(
        self,
        default_field: str,
        analyze: Callable[[str], list[str]] | None = None,
    ):
        self.default_field = default_field
        self.analyze = analyze or _default_analyze

    # ---- lexer -----------------------------------------------------------

    def _lex(self, s: str):
        pos = 0
        out = []
        while pos < len(s):
            m = _TOKEN_RX.match(s, pos)
            if not m:
                if s[pos:].strip() == "":
                    break
                raise ParseError(f"cannot lex at: {s[pos:]!r}")
            pos = m.end()
            kind = m.lastgroup if m.lastgroup != "qtext" else "quoted"
            for k in ("lparen", "rparen", "and", "or", "not", "plus", "minus"):
                if m.group(k):
                    out.append((k, m.group(k)))
                    break
            else:
                if m.group("quoted") is not None:
                    tok = {"text": m.group("qtext"), "slop": int(m.group("pslop") or 0)}
                    boost, pos = self._trailing_boost(s, pos)
                    out.append(("phrase", tok, boost))
                elif m.group("range") is not None:
                    tok = {
                        "lo": m.group("lo"),
                        "hi": m.group("hi"),
                        "inc_lo": m.group("lb") == "[",
                        "inc_hi": m.group("rb") == "]",
                    }
                    boost, pos = self._trailing_boost(s, pos)
                    out.append(("rangeq", tok, boost))
                else:
                    word = m.group("term")
                    boost, pos = self._trailing_boost(s, pos)
                    out.append(("word", word, boost))
        return out

    @staticmethod
    def _trailing_boost(s: str, pos: int) -> tuple[float, int]:
        m = _BOOST_RX.match(s, pos)
        if m:
            return float(m.group(1)), m.end()
        return 1.0, pos

    # ---- parser ----------------------------------------------------------

    def parse(self, s: str) -> Q.Query:
        toks = self._lex(s)
        q, rest = self._parse_query(toks)
        if rest:
            raise ParseError(f"unconsumed input: {rest}")
        return Q.rewrite_fixpoint(q)

    def _parse_query(self, toks):
        """clause* with QueryParserBase#addClause occur promotion."""
        clauses: list[tuple[str, Q.Query]] = []  # (occur, query)
        conj = None
        mod = None
        while toks:
            kind = toks[0][0]
            if kind == "rparen":
                break
            if kind in ("and", "or"):
                conj = kind
                toks = toks[1:]
                continue
            if kind == "not":
                mod = "-"
                toks = toks[1:]
                continue
            if kind == "plus":
                mod = "+"
                toks = toks[1:]
                continue
            if kind == "minus":
                mod = "-"
                toks = toks[1:]
                continue
            sub, toks = self._parse_atom(toks)
            if sub is None:
                continue
            # addClause: AND promotes previous non-prohibited to MUST
            if conj == "and" and clauses and clauses[-1][0] != "must_not":
                clauses[-1] = ("must", clauses[-1][1])
            if mod == "-":
                occur = "must_not"
            elif mod == "+" or conj == "and":
                occur = "must"
            else:
                occur = "should"
            clauses.append((occur, sub))
            conj = None
            mod = None

        if not clauses:
            return Q.MatchNoDocsQuery(), toks
        if len(clauses) == 1 and clauses[0][0] != "must_not":
            return clauses[0][1], toks
        return (
            Q.BooleanQuery(
                must=tuple(q for o, q in clauses if o == "must"),
                should=tuple(q for o, q in clauses if o == "should"),
                must_not=tuple(q for o, q in clauses if o == "must_not"),
            ),
            toks,
        )

    def _parse_atom(self, toks):
        kind = toks[0][0]
        if kind == "lparen":
            sub, rest = self._parse_query(toks[1:])
            if not rest or rest[0][0] != "rparen":
                raise ParseError("unbalanced parenthesis")
            return sub, rest[1:]
        if kind == "phrase":
            _k, tok, boost = toks[0]
            terms = self.analyze(tok["text"])
            if not terms:
                return None, toks[1:]
            q = self._phrase_query(terms, tok["slop"])
            return self._boost(q, boost), toks[1:]
        if kind == "rangeq":
            _k, tok, boost = toks[0]
            lo = None if tok["lo"] == "*" else tok["lo"].lower()
            hi = None if tok["hi"] == "*" else tok["hi"].lower()
            q = self._range_query(lo, hi, tok["inc_lo"], tok["inc_hi"])
            return self._boost(q, boost), toks[1:]
        if kind == "word":
            _k, word, boost = toks[0]
            field, word = self._split_field(word)
            q = self._field_query(field, word)
            return self._boost(q, boost), toks[1:]
        raise ParseError(f"unexpected token {toks[0]}")

    def _split_field(self, word: str) -> tuple[str, str]:
        """Isolate the [field ':'] prefix (QueryParserBase field
        handling). Overridable — ExtendableQueryParser honors escaped
        colons inside the field token."""
        if ":" in word:
            field, rest = word.split(":", 1)
            if not rest:
                raise ParseError(f"empty term for field {field}")
            return field, rest
        return self.default_field, word

    def _field_query(self, field: str, word: str) -> Q.Query:
        """getFieldQuery hook (QueryParserBase#getFieldQuery) — the
        override point the ext module plugs into."""
        return self._termish(field, word)

    def _phrase_query(self, terms: list[str], slop: int) -> Q.Query:
        """Default-field phrase hook (MultiFieldQueryParser overrides
        to expand fieldless phrases over its field list)."""
        if len(terms) == 1:
            return Q.TermQuery(self.default_field, terms[0])
        return Q.PhraseQuery(self.default_field, tuple(terms), slop=slop)

    def _range_query(self, lo, hi, inc_lo: bool, inc_hi: bool) -> Q.Query:
        """Default-field range hook (MultiFieldQueryParser overrides)."""
        return Q.TermRangeQuery(self.default_field, lo, hi, inc_lo, inc_hi)

    def _termish(self, field: str, word: str) -> Q.Query:
        fz = re.fullmatch(r"(.+)~(\d*)", word)
        if fz:
            base = fz.group(1).lower()
            edits = int(fz.group(2)) if fz.group(2) else 2
            return Q.FuzzyQuery(field, base, max_edits=min(edits, 2))
        if "*" in word or "?" in word:
            w = word.lower()
            if w.endswith("*") and "*" not in w[:-1] and "?" not in w:
                return Q.PrefixQuery(field, w[:-1])
            return Q.WildcardQuery(field, w)
        terms = self.analyze(word)
        if not terms:
            return Q.MatchNoDocsQuery()
        if len(terms) == 1:
            return Q.TermQuery(field, terms[0])
        # multi-token analysis of one word -> phrase (getFieldQuery)
        return Q.PhraseQuery(field, tuple(terms))

    @staticmethod
    def _boost(q: Q.Query, boost: float) -> Q.Query:
        if boost == 1.0:
            return q
        return Q.BoostQuery(q, boost)


class MultiFieldQueryParser(QueryParser):
    """Classic MultiFieldQueryParser (queryparser/classic/
    MultiFieldQueryParser.java): clauses with NO explicit field expand
    to a SHOULD-disjunction over ``fields``, each arm optionally
    boosted by ``boosts[field]`` (the reference's getFieldQuery /
    getFuzzyQuery / getPrefixQuery / getWildcardQuery / getRangeQuery
    overrides all route through the same expansion); an explicit
    ``field:`` prefix pins the clause to that field exactly as the
    single-field parser would."""

    def __init__(
        self,
        fields: list[str],
        analyze: Callable[[str], list[str]] | None = None,
        boosts: dict[str, float] | None = None,
    ):
        if not fields:
            raise ValueError("MultiFieldQueryParser needs >= 1 field")
        super().__init__(fields[0], analyze)
        self.fields = list(fields)
        self.boosts = dict(boosts or {})

    def _expand(self, make: Callable[[str], Q.Query]) -> Q.Query:
        arms = []
        for f in self.fields:
            q = make(f)
            if isinstance(q, Q.MatchNoDocsQuery):
                continue
            b = self.boosts.get(f)
            if b is not None and b != 1.0:
                q = Q.BoostQuery(q, b)
            arms.append(q)
        if not arms:
            return Q.MatchNoDocsQuery()
        if len(arms) == 1:
            return arms[0]
        return Q.BooleanQuery(should=tuple(arms))

    def _split_field(self, word: str) -> tuple[str | None, str]:
        field, rest = super()._split_field(word)
        if ":" not in word:
            return None, rest  # fieldless -> expand
        return field, rest

    def _field_query(self, field: str | None, word: str) -> Q.Query:
        if field is None:
            return self._expand(lambda f: self._termish(f, word))
        return self._termish(field, word)

    def _phrase_query(self, terms: list[str], slop: int) -> Q.Query:
        def mk(f: str) -> Q.Query:
            if len(terms) == 1:
                return Q.TermQuery(f, terms[0])
            return Q.PhraseQuery(f, tuple(terms), slop=slop)

        return self._expand(mk)

    def _range_query(self, lo, hi, inc_lo: bool, inc_hi: bool) -> Q.Query:
        return self._expand(
            lambda f: Q.TermRangeQuery(f, lo, hi, inc_lo, inc_hi)
        )


def parse_multi(
    queries: list[str],
    fields: list[str],
    flags: list[str] | None = None,
    analyze: Callable[[str], list[str]] | None = None,
) -> Q.Query:
    """MultiFieldQueryParser's static ``parse(String[], String[],
    BooleanClause.Occur[], Analyzer)``: query i parsed against field i,
    combined with the given occur flag ('should' | 'must' |
    'must_not'; default all 'should')."""
    if len(queries) != len(fields):
        raise ValueError("queries and fields must align")
    flags = flags or ["should"] * len(queries)
    if len(flags) != len(queries):
        raise ValueError("flags must align with queries")
    must, should, must_not = [], [], []
    for qs, f, occ in zip(queries, fields, flags):
        q = QueryParser(f, analyze).parse(qs)
        if isinstance(q, Q.MatchNoDocsQuery):
            continue
        {"must": must, "should": should, "must_not": must_not}[occ].append(q)
    return Q.BooleanQuery(
        must=tuple(must), should=tuple(should), must_not=tuple(must_not)
    )


class SimpleQueryParser:
    """Error-tolerant end-user syntax — queryparser/simple/
    SimpleQueryParser.java. Supported operators (the reference's
    default feature set): ``+`` AND, ``|`` OR, ``-`` NOT, ``"..."``
    phrase (with ``~N`` slop), trailing ``*`` prefix, ``~N`` fuzzy,
    ``( )`` grouping. The parser NEVER throws: malformed input
    degrades (unclosed quotes swallow the rest as a phrase, unmatched
    parens group to end-of-string, dangling operators are dropped,
    stray ``)`` is ignored) — the reference's contract that any user
    string produces a query.

    Precedence: ``+`` binds tighter than ``|``; whitespace joins with
    the parser's ``default_operator`` ("or" like the reference default,
    or "and")."""

    def __init__(
        self,
        default_field: str,
        analyze: Callable[[str], list[str]] | None = None,
        default_operator: str = "or",
    ):
        self.default_field = default_field
        self.analyze = analyze or _default_analyze
        self.default_operator = default_operator

    # ---- lexing (tolerant) ----------------------------------------------

    _TOK = re.compile(
        r"""\s*(?:
            (?P<lparen>\() |
            (?P<rparen>\)) |
            (?P<or>\|+) |
            (?P<plus>\+) |
            (?P<minus>-) |
            (?P<quoted>"(?P<qtext>[^"]*)(?:"|$)(?:~(?P<pslop>\d+))?) |
            (?P<term>[^\s()|+\-"]+)
        )""",
        re.VERBOSE,
    )

    def _lex(self, s: str) -> list[tuple[str, object]]:
        out: list[tuple[str, object]] = []
        pos = 0
        while pos < len(s):
            m = self._TOK.match(s, pos)
            if not m:
                break  # trailing whitespace/garbage — never throw
            pos = m.end()
            if m.group("lparen"):
                out.append(("(", None))
            elif m.group("rparen"):
                out.append((")", None))
            elif m.group("or"):
                out.append(("|", None))
            elif m.group("plus"):
                out.append(("+", None))
            elif m.group("minus"):
                out.append(("-", None))
            elif m.group("quoted") is not None:
                slop = int(m.group("pslop") or 0)
                out.append(("phrase", (m.group("qtext"), slop)))
            else:
                out.append(("term", m.group("term")))
        return out

    # ---- parsing ---------------------------------------------------------

    def parse(self, s: str) -> Q.Query:
        toks = self._lex(s or "")
        q, _ = self._or_expr(toks, 0, depth=0)
        return q if q is not None else Q.MatchNoDocsQuery()

    def _or_expr(self, toks, i, depth):
        parts = []
        ops: list[str] = []
        while i < len(toks):
            kind, _val = toks[i]
            if kind == ")":
                if depth:
                    break  # group close handled by caller
                i += 1  # stray ')' at top level: ignore
                continue
            if kind in ("|", "+"):
                if parts:
                    ops.append(kind)
                i += 1  # dangling operator with nothing before: drop
                continue
            sub, i = self._unary(toks, i, depth)
            if sub is not None:
                if parts and len(ops) < len(parts):
                    ops.append(
                        "+" if self.default_operator == "and" else "|"
                    )
                parts.append(sub)
        ops = ops[: max(0, len(parts) - 1)]
        if not parts:
            return None, i
        # fold with precedence: '+' groups adjacent parts into MUST
        # conjunctions, then '|' joins the groups as SHOULD
        groups: list[list[Q.Query]] = [[parts[0]]]
        for op, p in zip(ops, parts[1:]):
            if op == "+":
                groups[-1].append(p)
            else:
                groups.append([p])
        def conj(g: list[Q.Query]) -> Q.Query:
            if len(g) == 1:
                return g[0]
            return Q.BooleanQuery(must=tuple(g))
        folded = [conj(g) for g in groups]
        if len(folded) == 1:
            return folded[0], i
        return Q.BooleanQuery(should=tuple(folded)), i

    def _unary(self, toks, i, depth):
        kind, val = toks[i]
        if kind == "-":
            sub, i = (
                self._unary(toks, i + 1, depth)
                if i + 1 < len(toks)
                else (None, i + 1)
            )
            if sub is None:
                return None, i  # dangling '-': drop
            return Q.BooleanQuery(must_not=(sub,)), i
        if kind == "(":
            sub, j = self._or_expr(toks, i + 1, depth + 1)
            if j < len(toks) and toks[j][0] == ")":
                j += 1  # matched close; unmatched '(' groups to EOS
            return sub, j
        if kind == "phrase":
            text, slop = val
            terms = self.analyze(text)
            if not terms:
                return None, i + 1
            if len(terms) == 1:
                return Q.TermQuery(self.default_field, terms[0]), i + 1
            return (
                Q.PhraseQuery(self.default_field, tuple(terms), slop=slop),
                i + 1,
            )
        if kind == "term":
            return self._term(str(val)), i + 1
        return None, i + 1  # anything else: skip, never throw

    def _term(self, word: str) -> Q.Query | None:
        m = re.match(r"^(.*?)~(\d*)$", word)
        if m and m.group(1):
            terms = self.analyze(m.group(1))
            if not terms:
                return None
            edits = int(m.group(2) or 2)
            return Q.FuzzyQuery(
                self.default_field, terms[-1], max_edits=min(edits, 2)
            )
        if word.endswith("*") and len(word) > 1:
            terms = self.analyze(word[:-1])
            if not terms:
                return None
            return Q.PrefixQuery(self.default_field, terms[-1])
        if word in ("*", "~"):
            return None  # bare operator chars: drop
        terms = self.analyze(word)
        if not terms:
            return None
        if len(terms) == 1:
            return Q.TermQuery(self.default_field, terms[0])
        return Q.PhraseQuery(self.default_field, tuple(terms))


class ComplexPhraseQueryParser(QueryParser):
    """Classic grammar, but phrases may embed wildcards, fuzzy terms,
    ranges, OR-groups and negations — queryparser/complexPhrase/
    ComplexPhraseQueryParser.java. `"(john jon jonathan~) peters*"~2`
    becomes a SpanNear over [SpanOr(john, jon, SpanMulti(jonathan~)),
    SpanMulti(peters*)] with slop 2 (ComplexPhraseQuery.rewrite:334);
    embedded negatives produce SpanNot(SpanNear(positives,
    slop+numNegatives), SpanNear(all, slop)) (rewrite:354-359).
    A single-slot phrase degrades to the plain term/multi-term query
    (rewrite:260-264). `in_order` mirrors setInOrder (default true)."""

    def __init__(
        self,
        default_field: str,
        analyze: Callable[[str], list[str]] | None = None,
        in_order: bool = True,
    ):
        super().__init__(default_field, analyze)
        self.in_order = in_order

    def _parse_atom(self, toks):
        if toks[0][0] != "phrase":
            return super()._parse_atom(toks)
        _k, tok, boost = toks[0]
        q = self._complex_phrase(tok["text"], tok["slop"])
        if q is None:
            return None, toks[1:]
        return self._boost(q, boost), toks[1:]

    # -- phrase-content mini-parser (slot order preserved) -----------------

    def _complex_phrase(self, text: str, slop: int) -> Q.Query | None:
        slots: list[tuple[bool, object]] = []  # (negative, span source)
        toks = self._lex(text)
        neg = False
        while toks:
            kind = toks[0][0]
            if kind in ("minus", "not"):
                neg = True
                toks = toks[1:]
                continue
            if kind in ("and", "or", "plus"):
                toks = toks[1:]
                continue
            if kind == "lparen":
                group, toks = self._phrase_group(toks[1:])
                slots.append((neg, group))
            else:
                src, toks = self._phrase_slot(toks)
                if src is not None:
                    slots.append((neg, src))
            neg = False
        if not slots:
            return None
        field = self.default_field
        if len(slots) == 1 and not slots[0][0]:
            src = slots[0][1]
            if isinstance(src, Q.SpanTerm):
                return Q.TermQuery(field, src.term)
            if isinstance(src, Q.SpanMulti):
                return src.query
            return Q.SpanQuery(field, src)
        positives = tuple(s for n, s in slots if not n)
        n_neg = sum(1 for n, _ in slots if n)
        if n_neg == 0:
            return Q.SpanQuery(
                field,
                Q.SpanNear(positives, slop=slop, in_order=self.in_order),
            )
        if not positives:
            raise ParseError("phrase with only negative clauses")
        include = Q.SpanNear(
            positives, slop=slop + n_neg, in_order=self.in_order
        )
        exclude = Q.SpanNear(
            tuple(s for _n, s in slots), slop=slop, in_order=self.in_order
        )
        return Q.SpanQuery(field, Q.SpanNot(include, exclude))

    def _phrase_group(self, toks):
        """( a b c~ ) inside a phrase -> SpanOr of the alternatives."""
        alts = []
        while toks and toks[0][0] != "rparen":
            if toks[0][0] in ("and", "or", "plus", "minus", "not"):
                toks = toks[1:]
                continue
            src, toks = self._phrase_slot(toks)
            if src is not None:
                alts.append(src)
        if not toks:
            raise ParseError("unbalanced parenthesis in phrase")
        return Q.SpanOr(tuple(alts)), toks[1:]

    def _phrase_slot(self, toks):
        kind = toks[0][0]
        if kind == "rangeq":
            _k, tok, _boost = toks[0]
            lo = None if tok["lo"] == "*" else tok["lo"].lower()
            hi = None if tok["hi"] == "*" else tok["hi"].lower()
            return (
                Q.SpanMulti(
                    Q.TermRangeQuery(
                        self.default_field, lo, hi, tok["inc_lo"],
                        tok["inc_hi"],
                    )
                ),
                toks[1:],
            )
        if kind != "word":
            raise ParseError(
                f"unsupported token {toks[0]!r} inside a complex phrase"
            )
        _k, word, _boost = toks[0]
        q = self._termish(self.default_field, word)
        if isinstance(q, Q.TermQuery):
            return Q.SpanTerm(q.term), toks[1:]
        if isinstance(q, Q.MatchNoDocsQuery):
            return None, toks[1:]
        if isinstance(q, Q.PhraseQuery):
            return (
                Q.SpanNear(
                    tuple(Q.SpanTerm(t) for t in q.terms),
                    slop=0, in_order=True,
                ),
                toks[1:],
            )
        return Q.SpanMulti(q), toks[1:]
