r"""Flexible query parser — the StandardQueryParser surface.

Rebuilds queryparser/flexible/standard/StandardQueryParser.java with the
same three-stage architecture the reference documents (QueryParserHelper:
syntax parser -> QueryNode tree -> processor pipeline -> tree builder):

1. ``_SyntaxParser`` (StandardSyntaxParser.jj role) — a cursor-based
   recursive-descent parser producing a small QueryNode dataclass tree.
2. ``_pipeline`` (StandardQueryNodeProcessorPipeline role) — an ordered
   list of node-tree transforms mirroring the reference processors that
   carry semantics: MultiFieldQueryNodeProcessor (fieldless clauses
   expand over setMultiFields as a disjunction),
   AllowLeadingWildcardProcessor (leading * / ? rejected unless
   enabled — AllowLeadingWildcardProcessor.java), FuzzyQueryNodeProcessor
   (default maxEdits), DefaultPhraseSlopQueryNodeProcessor, and
   AnalyzerQueryNodeProcessor (term text runs through the analyzer;
   multi-token analysis becomes a phrase).
3. ``_build`` (StandardQueryTreeBuilder role) — QueryNode -> the engine
   Query AST (search/query.py), then ``rewrite_fixpoint``.

Syntax beyond the classic parser (StandardQueryParser.java:94-230 class
javadoc), all supported here:

- regexp clauses ``/.est(s|ing)/``
- minimum-should-match groups ``(blue crab fish)@2``
  (nodes/MinShouldMatchNode.java; only pure disjunctions accept it)
- interval functions ``fn:ordered(quick brown fox)``,
  ``title:fn:maxwidth(5 fn:atLeast(2 quick brown fox))`` …
  (nodes/intervalfn/*.java) — mapped onto the engine's minimal-interval
  algebra (query.py IntervalsSource):
    ordered/unordered/phrase  -> IOrdered / IUnordered / IPhrase
    or(..)                    -> IAtLeast(n=1)  (minimal union)
    atLeast(n ..)             -> IAtLeast
    maxgaps(n src)/maxwidth(n src) -> source with the bound applied
    extend(src n m)           -> IExtend
    before/after(src ref)     -> IBefore / IAfter
    nonOverlapping(a b)       -> INonOverlapping
    overlapping(a b)          -> IOverlapping
    containedBy(small big)    -> IContainedBy
    containing(big small)     -> IContaining
    notContaining(big small)  -> INotContaining
    within(src n ref)         -> containedBy(src, extend(ref, n, n))
                                 (Intervals.java:509-512)
    notWithin(src n ref)      -> nonOverlapping(src, extend(ref, n, n))
                                 (Intervals.java:494-498)
    unorderedNoOverlaps(a b)  -> or(ordered(a b), ordered(b a))
                                 (Intervals.java:446-448)
- backslash escaping of special characters in terms
- ``*`` / ``*:*`` bare wildcard -> MatchAllDocs

PointsConfig numeric ranges are descoped: points queries route through
Catalyst column predicates in this engine (SURVEY.md §2.4 PointRange
row), not through the string-query executor.
"""

from __future__ import annotations

import re
from collections.abc import Callable
from dataclasses import dataclass, replace

from lucene_spark.search import query as Q
from lucene_spark.search.queryparser import ParseError, _default_analyze

# ---------------------------------------------------------------------------
# stage 1: QueryNode tree (flexible/core/nodes + standard/nodes role)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class _Node:
    pass


@dataclass(frozen=True)
class TermNode(_Node):
    field: str | None
    text: str


@dataclass(frozen=True)
class PhraseNode(_Node):
    field: str | None
    text: str
    slop: int | None  # None -> DefaultPhraseSlop applies


@dataclass(frozen=True)
class RangeNode(_Node):
    field: str | None
    lo: str | None
    hi: str | None
    inc_lo: bool
    inc_hi: bool


@dataclass(frozen=True)
class FuzzyNode(_Node):
    field: str | None
    text: str
    max_edits: int | None  # None -> FuzzyConfig default applies


@dataclass(frozen=True)
class WildcardNode(_Node):
    field: str | None
    pattern: str


@dataclass(frozen=True)
class RegexpNode(_Node):
    field: str | None
    pattern: str


@dataclass(frozen=True)
class MatchAllNode(_Node):
    pass


@dataclass(frozen=True)
class IntervalFnNode(_Node):
    """fn:name(args) — args hold ints, nested IntervalFnNode, or raw
    text slots (analyzed to ITerm/IPhrase at build)."""
    field: str | None
    name: str
    args: tuple


@dataclass(frozen=True)
class ModifierNode(_Node):
    op: str  # "must" | "must_not"
    child: _Node


@dataclass(frozen=True)
class BooleanNode(_Node):
    """Children with the classic addClause occur algebra already
    resolved (BooleanQuery2ModifierNodeProcessor output shape)."""
    clauses: tuple[tuple[str, _Node], ...]  # (occur, node)
    min_should: int = 0


@dataclass(frozen=True)
class BoostNode(_Node):
    child: _Node
    boost: float


_WORD_RX = re.compile(r"(?:\\.|[^\s()^:~\"/\\])+")
_NUM_RX = re.compile(r"\d+")
_FIELD_RX = re.compile(r"((?:\\.|[^\s()^:~\"/\\])+):")


def _unescape(s: str) -> str:
    return re.sub(r"\\(.)", r"\1", s)


class _SyntaxParser:
    """StandardSyntaxParser.jj role: string -> QueryNode tree. Unlike
    SimpleQueryParser this one throws ParseError on malformed input,
    matching the reference contract."""

    def __init__(self, s: str):
        self.s = s
        self.i = 0

    # -- cursor helpers -----------------------------------------------------

    def _ws(self):
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def _peek(self) -> str:
        return self.s[self.i] if self.i < len(self.s) else ""

    def _match(self, rx: re.Pattern):
        m = rx.match(self.s, self.i)
        if m:
            self.i = m.end()
        return m

    def _expect(self, ch: str):
        if self._peek() != ch:
            raise ParseError(
                f"expected {ch!r} at {self.s[self.i:self.i + 20]!r}"
            )
        self.i += 1

    # -- grammar -------------------------------------------------------------

    def parse(self) -> _Node:
        node = self._query()
        self._ws()
        if self.i < len(self.s):
            raise ParseError(f"unconsumed input: {self.s[self.i:]!r}")
        return node

    def _query(self) -> _Node:
        """clause* with the classic addClause occur promotion
        (QueryParserBase#addClause; the flexible pipeline reproduces it
        in BooleanQuery2ModifierNodeProcessor)."""
        clauses: list[tuple[str, _Node]] = []
        conj: str | None = None
        mod: str | None = None
        while True:
            self._ws()
            if self.i >= len(self.s) or self._peek() == ")":
                break
            kw = self._keyword()
            if kw in ("and", "or"):
                conj = kw
                continue
            if kw == "not":
                mod = "-"
                continue
            if self._peek() == "+":
                self.i += 1
                mod = "+"
                continue
            if self._peek() == "-":
                self.i += 1
                mod = "-"
                continue
            sub = self._clause()
            if sub is None:
                continue
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
            return BooleanNode(())
        if len(clauses) == 1 and clauses[0][0] != "must_not":
            return clauses[0][1]
        return BooleanNode(tuple(clauses))

    def _keyword(self) -> str | None:
        for kw, names in (
            ("and", ("AND", "&&")),
            ("or", ("OR", "||")),
            ("not", ("NOT", "!")),
        ):
            for n in names:
                if self.s.startswith(n, self.i):
                    end = self.i + len(n)
                    if n.isalpha() and end < len(self.s) and not self.s[end].isspace():
                        continue  # NOTICE is a term, not NOT
                    self.i = end
                    return kw
        return None

    def _clause(self) -> _Node | None:
        """[field:] atom [@N] [^boost]"""
        field: str | None = None
        save = self.i
        fm = self._match(_FIELD_RX)
        if fm:
            field = _unescape(fm.group(1))
            if field == "fn" and self._match(re.compile(r"\w+\(")):
                # no field prefix — this was fn:name( itself
                self.i = save
                field = None
        node = self._atom(field)
        node = self._post_modifiers(node)
        return node

    def _post_modifiers(self, node: _Node) -> _Node:
        # @N minimum-should-match (groups only — MinShouldMatchNode.java
        # rejects non-group targets at the syntax level)
        if self._peek() == "@":
            self.i += 1
            m = self._match(_NUM_RX)
            if not m:
                raise ParseError("@ requires an integer")
            if not isinstance(node, BooleanNode):
                raise ParseError(
                    "@<num> minimum-should-match applies to groups only"
                )
            node = replace(node, min_should=int(m.group()))
        if self._peek() == "^":
            self.i += 1
            m = self._match(re.compile(r"\d+(?:\.\d+)?"))
            if not m:
                raise ParseError("^ requires a number")
            node = BoostNode(node, float(m.group()))
        return node

    def _atom(self, field: str | None) -> _Node | None:
        ch = self._peek()
        if ch == "(":
            self.i += 1
            sub = self._query()
            self._ws()
            self._expect(")")
            return self._propagate_field(sub, field)
        if ch == '"':
            return self._quoted(field)
        if ch == "/":
            return self._regexp(field)
        if ch in "[{":
            return self._range(field)
        if self.s.startswith("fn:", self.i):
            return self._interval_fn(field)
        m = self._match(_WORD_RX)
        if not m:
            raise ParseError(
                f"cannot parse at: {self.s[self.i:self.i + 20]!r}"
            )
        word = m.group()
        if word == "*" and field in (None, "*"):
            return MatchAllNode()
        # trailing ~ fuzzy (with optional edits)
        if self._peek() == "~":
            self.i += 1
            em = self._match(_NUM_RX)
            return FuzzyNode(
                field, _unescape(word), int(em.group()) if em else None
            )
        if "*" in word or "?" in word:
            return WildcardNode(field, _unescape_wild(word))
        return TermNode(field, _unescape(word))

    def _propagate_field(self, node: _Node, field: str | None) -> _Node:
        """field:(a b) — the group's field reaches every fieldless leaf
        (the reference parser tracks the field down the subtree)."""
        if field is None:
            return node
        if isinstance(node, BooleanNode):
            return replace(
                node,
                clauses=tuple(
                    (o, self._propagate_field(c, field))
                    for o, c in node.clauses
                ),
            )
        if isinstance(node, (ModifierNode, BoostNode)):
            return replace(node, child=self._propagate_field(node.child, field))
        if hasattr(node, "field") and getattr(node, "field") is None:
            return replace(node, field=field)
        return node

    def _quoted(self, field: str | None) -> _Node:
        self._expect('"')
        j = self.s.find('"', self.i)
        if j < 0:
            raise ParseError("unclosed quote")
        text = self.s[self.i:j]
        self.i = j + 1
        slop: int | None = None
        if self._peek() == "~":
            self.i += 1
            m = self._match(_NUM_RX)
            if not m:
                raise ParseError("~ after phrase requires an integer slop")
            slop = int(m.group())
        return PhraseNode(field, text, slop)

    def _regexp(self, field: str | None) -> _Node:
        self._expect("/")
        out = []
        while self.i < len(self.s):
            c = self.s[self.i]
            if c == "\\" and self.i + 1 < len(self.s):
                out.append(self.s[self.i:self.i + 2])
                self.i += 2
                continue
            if c == "/":
                self.i += 1
                return RegexpNode(field, "".join(out))
            out.append(c)
            self.i += 1
        raise ParseError("unclosed /regexp/")

    def _range(self, field: str | None) -> _Node:
        inc_lo = self._peek() == "["
        self.i += 1
        m = self._match(
            re.compile(r"\s*(\S+)\s+TO\s+(\S+?)\s*([\]}])", re.DOTALL)
        )
        if not m:
            raise ParseError("malformed range (expected `[a TO b]`)")
        lo, hi = m.group(1), m.group(2)
        return RangeNode(
            field,
            None if lo == "*" else _unescape(lo),
            None if hi == "*" else _unescape(hi),
            inc_lo,
            m.group(3) == "]",
        )

    # -- interval functions ---------------------------------------------------

    def _interval_fn(self, field: str | None) -> _Node:
        self.i += 3  # "fn:"
        m = self._match(re.compile(r"(\w+)\("))
        if not m:
            raise ParseError("fn: requires name(")
        name = m.group(1)
        args: list = []
        while True:
            self._ws()
            if self._peek() == ")":
                self.i += 1
                break
            if self.i >= len(self.s):
                raise ParseError(f"unclosed fn:{name}(")
            if self.s.startswith("fn:", self.i):
                args.append(self._interval_fn(None))
                continue
            if self._peek() == '"':
                self._expect('"')
                j = self.s.find('"', self.i)
                if j < 0:
                    raise ParseError("unclosed quote in fn args")
                args.append(("text", self.s[self.i:j]))
                self.i = j + 1
                continue
            nm = self._match(re.compile(r"\d+(?![\w*?])"))
            if nm:
                args.append(("int", int(nm.group())))
                continue
            wm = self._match(_WORD_RX)
            if not wm:
                raise ParseError(
                    f"cannot parse fn argument at: {self.s[self.i:self.i + 20]!r}"
                )
            args.append(("text", _unescape(wm.group())))
        return IntervalFnNode(field, name, tuple(args))


def _unescape_wild(w: str) -> str:
    """Unescape everything except * / ? which stay wildcards."""
    return re.sub(r"\\([^*?])", r"\1", w)


# ---------------------------------------------------------------------------
# stage 2 + 3: processor pipeline and tree builder
# ---------------------------------------------------------------------------


class StandardQueryParser:
    """queryparser/flexible/standard/StandardQueryParser.java rebuilt.

    ``multi_fields`` mirrors setMultiFields (fieldless clauses expand to
    a disjunction over the fields — MultiFieldQueryNodeProcessor);
    ``allow_leading_wildcard`` mirrors setAllowLeadingWildcard (default
    false, AllowLeadingWildcardProcessor rejects); ``fuzzy_max_edits``
    mirrors FuzzyConfig (default 2); ``phrase_slop`` mirrors
    setPhraseSlop (DefaultPhraseSlopQueryNodeProcessor)."""

    _LEADING_WILD = re.compile(r"^[*?]")

    def __init__(
        self,
        default_field: str | None = None,
        analyze: Callable[[str], list[str]] | None = None,
        multi_fields: tuple[str, ...] | None = None,
        allow_leading_wildcard: bool = False,
        fuzzy_max_edits: int = 2,
        phrase_slop: int = 0,
    ):
        self.default_field = default_field
        self.analyze = analyze or _default_analyze
        self.multi_fields = tuple(multi_fields) if multi_fields else None
        self.allow_leading_wildcard = allow_leading_wildcard
        self.fuzzy_max_edits = fuzzy_max_edits
        self.phrase_slop = phrase_slop

    # -- public API -----------------------------------------------------------

    def parse(self, s: str, default_field: str | None = None) -> Q.Query:
        node = _SyntaxParser(s).parse()
        node = self._expand_fields(node, default_field or self.default_field)
        q = self._build(node)
        return Q.rewrite_fixpoint(q)

    # -- MultiFieldQueryNodeProcessor ------------------------------------------

    def _expand_fields(self, node: _Node, default: str | None) -> _Node:
        if isinstance(node, BooleanNode):
            return replace(
                node,
                clauses=tuple(
                    (o, self._expand_fields(c, default))
                    for o, c in node.clauses
                ),
            )
        if isinstance(node, (ModifierNode, BoostNode)):
            return replace(node, child=self._expand_fields(node.child, default))
        if getattr(node, "field", "") is None:
            if self.multi_fields and len(self.multi_fields) > 1:
                return BooleanNode(
                    tuple(
                        ("should", replace(node, field=f))
                        for f in self.multi_fields
                    )
                )
            one = (
                self.multi_fields[0]
                if self.multi_fields
                else default
            )
            if one is None:
                raise ParseError(
                    "no field: set default_field or multi_fields"
                )
            return replace(node, field=one)
        return node

    # -- StandardQueryTreeBuilder ----------------------------------------------

    def _build(self, node: _Node) -> Q.Query:
        if isinstance(node, BooleanNode):
            if not node.clauses:
                return Q.MatchNoDocsQuery()
            if node.min_should:
                if any(o != "should" for o, _ in node.clauses):
                    raise ParseError(
                        "@<num> requires a pure disjunction group"
                    )
                if node.min_should > len(node.clauses):
                    return Q.MatchNoDocsQuery()
            if len(node.clauses) == 1 and node.clauses[0][0] != "must_not" \
                    and not node.min_should:
                return self._build(node.clauses[0][1])
            return Q.BooleanQuery(
                must=tuple(
                    self._build(c) for o, c in node.clauses if o == "must"
                ),
                should=tuple(
                    self._build(c) for o, c in node.clauses if o == "should"
                ),
                must_not=tuple(
                    self._build(c) for o, c in node.clauses if o == "must_not"
                ),
                min_should=node.min_should,
            )
        if isinstance(node, BoostNode):
            return Q.BoostQuery(self._build(node.child), node.boost)
        if isinstance(node, ModifierNode):  # pragma: no cover - folded earlier
            return self._build(node.child)
        if isinstance(node, MatchAllNode):
            return Q.MatchAllQuery()
        if isinstance(node, TermNode):
            terms = self.analyze(node.text)
            if not terms:
                return Q.MatchNoDocsQuery()
            if len(terms) == 1:
                return Q.TermQuery(node.field, terms[0])
            # AnalyzerQueryNodeProcessor: multi-token word -> phrase
            return Q.PhraseQuery(node.field, tuple(terms))
        if isinstance(node, PhraseNode):
            terms = self.analyze(node.text)
            if not terms:
                return Q.MatchNoDocsQuery()
            slop = node.slop if node.slop is not None else self.phrase_slop
            if len(terms) == 1:
                return Q.TermQuery(node.field, terms[0])
            return Q.PhraseQuery(node.field, tuple(terms), slop=slop)
        if isinstance(node, RangeNode):
            return Q.TermRangeQuery(
                node.field,
                node.lo.lower() if node.lo is not None else None,
                node.hi.lower() if node.hi is not None else None,
                node.inc_lo,
                node.inc_hi,
            )
        if isinstance(node, FuzzyNode):
            terms = self.analyze(node.text)
            if not terms:
                return Q.MatchNoDocsQuery()
            edits = (
                node.max_edits
                if node.max_edits is not None
                else self.fuzzy_max_edits
            )
            return Q.FuzzyQuery(node.field, terms[-1], max_edits=min(edits, 2))
        if isinstance(node, WildcardNode):
            w = node.pattern.lower()
            if self._LEADING_WILD.match(w) and not self.allow_leading_wildcard:
                raise ParseError(
                    "leading wildcard not allowed "
                    "(setAllowLeadingWildcard to enable)"
                )
            if w.endswith("*") and "*" not in w[:-1] and "?" not in w:
                return Q.PrefixQuery(node.field, w[:-1])
            return Q.WildcardQuery(node.field, w)
        if isinstance(node, RegexpNode):
            return Q.RegexpQuery(node.field, node.pattern.lower())
        if isinstance(node, IntervalFnNode):
            return Q.IntervalQuery(
                node.field, self._interval_source(node)
            )
        raise ParseError(f"cannot build {node!r}")  # pragma: no cover

    # -- interval fn -> IntervalsSource (IntervalQueryNodeProcessor role) ------

    def _interval_source(self, node: IntervalFnNode) -> Q.IntervalsSource:
        name = node.name.lower()
        # pattern functions take their text argument RAW (the wrapped
        # multi-term query expands against the term dict at compile;
        # analyzing '*'/'?' away would destroy the pattern) —
        # StandardSyntaxParser's fn:wildcard / fn:prefix / fn:fuzzyTerm
        if name in ("wildcard", "prefix", "fuzzyterm"):
            texts = [a[1] for a in node.args
                     if isinstance(a, tuple) and a[0] == "text"]
            nums = [a[1] for a in node.args
                    if isinstance(a, tuple) and a[0] == "int"]
            if len(texts) != 1 or any(isinstance(a, IntervalFnNode)
                                      for a in node.args):
                raise ParseError(f"fn:{node.name}: wrong arguments")
            f = node.field or ""
            if name == "wildcard":
                if nums:
                    raise ParseError("fn:wildcard takes no ints")
                return Q.IMultiTerm(Q.WildcardQuery(f, texts[0].lower()))
            if name == "prefix":
                if nums:
                    raise ParseError("fn:prefix takes no ints")
                return Q.IMultiTerm(Q.PrefixQuery(f, texts[0].lower()))
            max_edits = nums[0] if nums else 2
            return Q.IMultiTerm(
                Q.FuzzyQuery(f, texts[0].lower(), max_edits=max_edits)
            )
        srcs: list[Q.IntervalsSource] = []
        ints: list[int] = []
        for a in node.args:
            if isinstance(a, IntervalFnNode):
                srcs.append(self._interval_source(a))
            elif a[0] == "int":
                ints.append(a[1])
            else:
                srcs.append(self._text_source(a[1]))

        def need(n_src: int | None = None, n_int: int = 0):
            if n_int != len(ints) or (
                n_src is not None and n_src != len(srcs)
            ):
                raise ParseError(f"fn:{node.name}: wrong arguments")

        if name == "ordered":
            need(n_int=0)
            return Q.IOrdered(tuple(srcs))
        if name == "unordered":
            need(n_int=0)
            return Q.IUnordered(tuple(srcs))
        if name == "phrase":
            need(n_int=0)
            return Q.IPhrase(tuple(srcs))
        if name == "or":
            need(n_int=0)
            if len(srcs) == 1:
                return srcs[0]
            return Q.IAtLeast(tuple(srcs), n=1)
        if name == "atleast":
            need(n_int=1)
            return Q.IAtLeast(tuple(srcs), n=ints[0])
        if name in ("maxgaps", "maxwidth"):
            need(n_src=1, n_int=1)
            src = srcs[0]
            if not isinstance(src, (Q.IOrdered, Q.IUnordered, Q.IAtLeast)):
                raise ParseError(
                    f"fn:{node.name} applies to ordered/unordered/atLeast"
                )
            if name == "maxgaps":
                if isinstance(src, Q.IAtLeast):
                    raise ParseError("fn:maxgaps does not apply to atLeast")
                return replace(src, max_gaps=ints[0])
            return replace(src, max_width=ints[0])
        if name == "extend":
            need(n_src=1, n_int=2)
            return Q.IExtend(srcs[0], ints[0], ints[1])
        if name == "before":
            need(n_src=2)
            return Q.IBefore(srcs[0], srcs[1])
        if name == "after":
            need(n_src=2)
            return Q.IAfter(srcs[0], srcs[1])
        if name == "nonoverlapping":
            need(n_src=2)
            return Q.INonOverlapping(srcs[0], srcs[1])
        if name == "overlapping":
            need(n_src=2)
            return Q.IOverlapping(srcs[0], srcs[1])
        if name == "containedby":
            need(n_src=2)
            return Q.IContainedBy(srcs[0], srcs[1])
        if name == "containing":
            need(n_src=2)
            return Q.IContaining(srcs[0], srcs[1])
        if name == "notcontaining":
            need(n_src=2)
            return Q.INotContaining(srcs[0], srcs[1])
        if name == "within":
            need(n_src=2, n_int=1)
            return Q.IContainedBy(
                srcs[0], Q.IExtend(srcs[1], ints[0], ints[0])
            )
        if name == "notwithin":
            need(n_src=2, n_int=1)
            return Q.INonOverlapping(
                srcs[0], Q.IExtend(srcs[1], ints[0], ints[0])
            )
        if name == "unorderednooverlaps":
            # Intervals.java:446-448: or(ordered(a b), ordered(b a))
            need(n_src=2)
            return Q.IAtLeast(
                (
                    Q.IOrdered((srcs[0], srcs[1])),
                    Q.IOrdered((srcs[1], srcs[0])),
                ),
                n=1,
            )
        raise ParseError(f"unknown interval function fn:{node.name}")

    def _text_source(self, text: str) -> Q.IntervalsSource:
        terms = self.analyze(text)
        if not terms:
            raise ParseError(f"fn argument analyzes to nothing: {text!r}")
        if len(terms) == 1:
            return Q.ITerm(terms[0])
        # AnalyzedText.java: multi-token arg becomes a phrase source
        return Q.IPhrase(tuple(Q.ITerm(t) for t in terms))


class _PrecedenceSyntaxParser(_SyntaxParser):
    """flexible/precedence grammar: the StandardSyntaxParser.jj
    precedence ladder KEPT in the tree instead of flattened —
    Query ::= DisjQuery+ (juxtaposition, loosest), DisjQuery ::=
    ConjQuery (OR ConjQuery)*, ConjQuery ::= ModClause (AND
    ModClause)*. Modifier resolution follows
    precedence/processors/BooleanModifiersQueryNodeProcessor.java:
    AND-group children become MUST unless already modified; OR-group
    children stay SHOULD; plain juxtaposition groups become MUST only
    when the default operator is AND."""

    def __init__(self, s: str, default_and: bool = False):
        super().__init__(s)
        self.default_and = default_and

    # -- keyword lookahead (consume only the wanted connector) ---------------

    def _try_kw(self, want: str) -> bool:
        self._ws()
        save = self.i
        kw = self._keyword()
        if kw == want:
            return True
        self.i = save
        return False

    def _at_end(self) -> bool:
        self._ws()
        return self.i >= len(self.s) or self._peek() == ")"

    # -- grammar --------------------------------------------------------------

    @staticmethod
    def _occur(mod: str | None, default: str) -> str:
        if mod == "-":
            return "must_not"
        if mod == "+":
            return "must"
        return default

    def _query(self) -> _Node:
        groups: list[tuple[str | None, _Node]] = []
        while not self._at_end():
            got = self._disj()
            if got is not None:
                groups.append(got)
        if not groups:
            return BooleanNode(())
        default = "must" if self.default_and else "should"
        if len(groups) == 1:
            mod, node = groups[0]
            if mod != "-":
                return node
            return BooleanNode((("must_not", node),))
        return BooleanNode(
            tuple((self._occur(m, default), n) for m, n in groups)
        )

    def _disj(self) -> tuple[str | None, _Node] | None:
        parts = [self._conj()]
        while self._try_kw("or"):
            parts.append(self._conj())
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        return (None, BooleanNode(
            tuple((self._occur(m, "should"), n) for m, n in parts)
        ))

    def _conj(self) -> tuple[str | None, _Node] | None:
        parts = [self._mod_clause()]
        while self._try_kw("and"):
            parts.append(self._mod_clause())
        parts = [p for p in parts if p is not None]
        if not parts:
            return None
        if len(parts) == 1:
            return parts[0]
        return (None, BooleanNode(
            tuple((self._occur(m, "must"), n) for m, n in parts)
        ))

    def _mod_clause(self) -> tuple[str | None, _Node] | None:
        self._ws()
        mod: str | None = None
        if self._try_kw("not"):
            mod = "-"
            self._ws()
        elif self._peek() in "+-":
            mod = self._peek()
            self.i += 1
            self._ws()
        node = self._clause()
        if node is None:
            return None
        return (mod, node)


class PrecedenceQueryParser(StandardQueryParser):
    """flexible/precedence/PrecedenceQueryParser.java: classic syntax
    with boolean PRECEDENCE kept — 'A AND B OR C AND D' parses as
    '(A AND B) OR (C AND D)', and OR binds tighter than juxtaposition
    ('A OR B C' == '(A B) C'). Default operator OR, switchable to AND
    (setDefaultOperator), which promotes only plain juxtaposition
    groups (BooleanModifiersQueryNodeProcessor.java:87-99)."""

    def __init__(self, *args, default_operator: str = "or", **kwargs):
        super().__init__(*args, **kwargs)
        self.default_operator = default_operator

    def set_default_operator(self, op: str) -> None:
        if op not in ("or", "and"):
            raise ValueError(f"unknown operator {op!r}")
        self.default_operator = op

    def parse(self, s: str, default_field: str | None = None) -> Q.Query:
        node = _PrecedenceSyntaxParser(
            s, default_and=self.default_operator == "and"
        ).parse()
        node = self._expand_fields(node, default_field or self.default_field)
        q = self._build(node)
        return Q.rewrite_fixpoint(q)
