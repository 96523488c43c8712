"""XML query parser — the reference queryparser/xml CoreParser
(CoreParser.java, builders/*.java) re-expressed over this engine's
query AST.

Element -> builder mapping (reference builders in parentheses):

- ``TermQuery`` (TermQueryBuilder.java:33-37): raw text term, NOT
  analyzed.
- ``TermsQuery`` (TermsQueryBuilder.java:47-66): text analyzed, one
  SHOULD TermQuery per token, ``minimumNumberShouldMatch`` attr.
- ``BooleanQuery`` / ``Clause occurs=must|mustnot|should|filter``
  (BooleanQueryBuilder.java:46-81), nested arbitrarily (children only,
  not descendants — the NestedBooleanQuery.xml regression).
- ``UserQuery`` (UserInputQueryBuilder.java:69-74): classic QueryParser
  over the element text.
- ``RangeQuery`` (RangeQueryBuilder.java:31-36): TermRangeQuery with
  includeLower/includeUpper (default true).
- ``MatchAllDocsQuery``, ``ConstantScoreQuery``,
  ``DisjunctionMaxQuery tieBreaker=…`` (their respective builders).
- ``BoostingTermQuery`` (BoostingTermBuilder.java:34-42):
  PayloadScoreQuery(SpanTerm, avg) — FLOAT_DECODER payloads.
- Span algebra: ``SpanTerm``, ``SpanOr``, ``SpanOrTerms`` (analyzed),
  ``SpanNear slop= inOrder=``, ``SpanNot`` (Include/Exclude children),
  ``SpanFirst end=``, ``SpanPositionRange start= end=`` (SpanBuilder*
  classes). A span element at query position becomes SpanQuery(field,
  source).
- ``LikeThisQuery`` (LikeThisQueryBuilder.java:54-102): MoreLikeThis
  top-``maxQueryTerms`` tf*idf terms of the element text as SHOULD
  TermQueries (needs a reader for index stats).
- ``FuzzyLikeThisQuery`` / ``Field`` (FuzzyLikeThisQueryBuilder.java):
  each analyzed token becomes a fuzzy-expanded SHOULD clause.
- ``PointRangeQuery`` (PointRangeQueryBuilder.java:76-79): numeric
  range over a registry (DocValues/points) column — returns a
  PointRange marker the caller applies to ``reader.docs()`` with
  ``.predicate()``; it cannot ride the postings kernel.

``fieldName`` inherits from ancestor elements
(DOMUtils.getAttributeWithInheritance); ``boost`` on any query element
wraps the result in BoostQuery. DOCTYPE declarations are rejected
outright (CoreParser forbids DTDs).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from lucene_spark.search import query as Q
from lucene_spark.search.queryparser import ParseError, QueryParser, _default_analyze

_SPAN_TAGS = frozenset({
    "SpanTerm", "SpanOr", "SpanOrTerms", "SpanNear", "SpanNot",
    "SpanFirst", "SpanPositionRange", "BoostingTermQuery",
})


@dataclass(frozen=True)
class PointRange:
    """Parse result of <PointRangeQuery> — a numeric registry-column
    range, applied Spark-side (reader.docs().filter(pr.predicate())),
    never through the postings kernel."""
    field: str
    lower: float | None
    upper: float | None
    type: str = "int"

    def predicate(self) -> Column:
        c = F.col(self.field)
        conds = []
        if self.lower is not None:
            conds.append(c >= self.lower)
        if self.upper is not None:
            conds.append(c <= self.upper)
        if not conds:
            return c.isNotNull()
        out = conds[0]
        for x in conds[1:]:
            out = out & x
        return out


class CoreParser:
    """parse(xml) -> Query. ``analyze`` must match the index analyzer
    (used by TermsQuery/SpanOrTerms/LikeThis/FuzzyLikeThis and the
    nested classic UserQuery parser). ``reader`` is only needed for
    LikeThisQuery (MLT term selection reads index stats)."""

    def __init__(
        self,
        default_field: str,
        analyze: Callable[[str], list[str]] | None = None,
        reader=None,
    ):
        self.default_field = default_field
        self.analyze = analyze or _default_analyze
        self.reader = reader

    # ---- entry -----------------------------------------------------------

    def parse(self, xml: str) -> Q.Query:
        if "<!DOCTYPE" in xml or "<!ENTITY" in xml:
            # CoreParser.java disallows DTDs entirely (XXE hardening)
            raise ParseError("DOCTYPE/ENTITY declarations are not allowed")
        try:
            root = ET.fromstring(xml)
        except ET.ParseError as exc:
            raise ParseError(f"malformed XML: {exc}") from exc
        return self._query(root, self.default_field)

    # ---- helpers ---------------------------------------------------------

    @staticmethod
    def _attr(el, name, default=None):
        v = el.get(name)
        return default if v is None or v == "" else v

    def _field(self, el, inherited: str) -> str:
        return self._attr(el, "fieldName", inherited)

    @staticmethod
    def _text(el) -> str:
        t = (el.text or "").strip()
        if not t:
            raise ParseError(f"<{el.tag}> requires non-blank text")
        return t

    @staticmethod
    def _boost(el) -> float:
        return float(el.get("boost", 1.0))

    def _wrap_boost(self, el, q: Q.Query) -> Q.Query:
        b = self._boost(el)
        return q if b == 1.0 else Q.BoostQuery(q, b)

    def _children(self, el):
        return [c for c in el if isinstance(c.tag, str)]

    def _one_child(self, el):
        kids = self._children(el)
        if len(kids) != 1:
            raise ParseError(f"<{el.tag}> requires exactly one child query")
        return kids[0]

    # ---- query builders --------------------------------------------------

    def _query(self, el, field: str) -> Q.Query:
        field = self._field(el, field)
        tag = el.tag
        if tag == "BoostingTermQuery":
            # a SpanQuery subclass in the reference: payload-scored at
            # query position, plain term spans inside a span tree
            return self._wrap_boost(el, self._q_BoostingTermQuery(el, field))
        if tag in _SPAN_TAGS:
            # a span element in query position: score the spans
            # (SpanQueryBuilderFactory routes these through SpanWeight)
            return self._wrap_boost(
                el, Q.SpanQuery(field, self._span(el, field))
            )
        fn = getattr(self, f"_q_{tag}", None)
        if fn is None:
            raise ParseError(f"unknown query element <{tag}>")
        return self._wrap_boost(el, fn(el, field))

    def _q_TermQuery(self, el, field):
        return Q.TermQuery(field, self._text(el))

    def _q_TermsQuery(self, el, field):
        toks = self.analyze(self._text(el))
        if not toks:
            return Q.MatchNoDocsQuery()
        msm = int(self._attr(el, "minimumNumberShouldMatch", 0))
        return Q.BooleanQuery(
            should=tuple(Q.TermQuery(field, t) for t in toks),
            min_should=msm,
        )

    def _q_BooleanQuery(self, el, field):
        occ = {"must": [], "should": [], "mustnot": [], "filter": []}
        for clause in self._children(el):
            if clause.tag != "Clause":
                raise ParseError(
                    f"<BooleanQuery> child must be <Clause>, got <{clause.tag}>"
                )
            occurs = (clause.get("occurs") or "should").lower()
            if occurs not in occ:
                raise ParseError(f'invalid occurs="{occurs}"')
            occ[occurs].append(self._query(self._one_child(clause), field))
        msm = int(self._attr(el, "minimumNumberShouldMatch", 0))
        return Q.BooleanQuery(
            must=tuple(occ["must"]),
            should=tuple(occ["should"]),
            must_not=tuple(occ["mustnot"]),
            filter=tuple(occ["filter"]),
            min_should=msm,
        )

    def _q_UserQuery(self, el, field):
        return QueryParser(field, self.analyze).parse(self._text(el))

    def _q_RangeQuery(self, el, field):
        return Q.TermRangeQuery(
            field,
            self._attr(el, "lowerTerm"),
            self._attr(el, "upperTerm"),
            include_lower=self._attr(el, "includeLower", "true") == "true",
            include_upper=self._attr(el, "includeUpper", "true") == "true",
        )

    def _q_PointRangeQuery(self, el, field):
        typ = self._attr(el, "type", "int").lower()
        if typ not in ("int", "long", "float", "double"):
            raise ParseError(f"unknown PointRangeQuery type {typ!r}")
        conv = int if typ in ("int", "long") else float
        lo, hi = self._attr(el, "lowerTerm"), self._attr(el, "upperTerm")
        return PointRange(
            field,
            None if lo is None else conv(lo),
            None if hi is None else conv(hi),
            typ,
        )

    def _q_MatchAllDocsQuery(self, el, field):
        return Q.MatchAllQuery()

    def _q_ConstantScoreQuery(self, el, field):
        return Q.ConstantScoreQuery(
            self._query(self._one_child(el), field)
        )

    def _q_DisjunctionMaxQuery(self, el, field):
        subs = tuple(self._query(c, field) for c in self._children(el))
        if not subs:
            raise ParseError("<DisjunctionMaxQuery> requires children")
        return Q.DisjunctionMaxQuery(
            subs, tie_breaker=float(self._attr(el, "tieBreaker", 0.0))
        )

    def _q_LikeThisQuery(self, el, field):
        if self.reader is None:
            raise ParseError("LikeThisQuery needs a CoreParser(reader=…)")
        from lucene_spark.search.classify import mlt_terms_for_text

        fields = [
            f.strip()
            for f in (self._attr(el, "fieldNames") or field).split(",")
        ]
        max_terms = int(self._attr(el, "maxQueryTerms", 20))
        stop = set(self.analyze(self._attr(el, "stopWords") or ""))
        text = self._text(el)
        should = []
        for f in fields:
            terms = mlt_terms_for_text(
                self.reader, text, f, max_terms, tokenize=self.analyze
            )
            should.extend(
                Q.TermQuery(f, t) for t in terms if t not in stop
            )
        if not should:
            return Q.MatchNoDocsQuery()
        return Q.BooleanQuery(should=tuple(should))

    def _q_FuzzyLikeThisQuery(self, el, field):
        should = []
        for fe in self._children(el):
            if fe.tag != "Field":
                raise ParseError(
                    f"<FuzzyLikeThisQuery> child must be <Field>, got <{fe.tag}>"
                )
            f = self._field(fe, field)
            min_sim = float(self._attr(fe, "minSimilarity", 2.0))
            # post-4.0 FuzzyLikeThisQuery: minSimilarity >= 1 is an
            # edit-distance cap (SlowFuzzyQuery semantics dropped)
            max_edits = min(2, max(0, int(min_sim)))
            prefix = int(self._attr(fe, "prefixLength", 0))
            for t in self.analyze(self._text(fe)):
                should.append(
                    Q.ScoringRewriteQuery(
                        Q.FuzzyQuery(f, t, max_edits=max_edits,
                                     prefix_length=prefix)
                    )
                )
        if not should:
            return Q.MatchNoDocsQuery()
        return Q.BooleanQuery(should=tuple(should))

    # ---- span builders ----------------------------------------------------

    def _span(self, el, field) -> Q.SpanSource:
        tag = el.tag
        if tag == "SpanTerm":
            return Q.SpanTerm(self._text(el))
        if tag == "SpanOrTerms":
            toks = self.analyze(self._text(el))
            if not toks:
                raise ParseError("<SpanOrTerms> analyzed to zero tokens")
            return Q.SpanOr(tuple(Q.SpanTerm(t) for t in toks))
        if tag == "SpanOr":
            return Q.SpanOr(
                tuple(self._span(c, field) for c in self._children(el))
            )
        if tag == "SpanNear":
            slop = el.get("slop")
            if slop is None:
                raise ParseError("<SpanNear> requires a slop attribute")
            return Q.SpanNear(
                tuple(self._span(c, field) for c in self._children(el)),
                slop=int(slop),
                in_order=self._attr(el, "inOrder", "false") == "true",
            )
        if tag == "SpanNot":
            inc = exc = None
            for c in self._children(el):
                if c.tag == "Include":
                    inc = self._span(self._one_child(c), field)
                elif c.tag == "Exclude":
                    exc = self._span(self._one_child(c), field)
            if inc is None or exc is None:
                raise ParseError("<SpanNot> requires Include and Exclude")
            return Q.SpanNot(inc, exc)
        if tag == "SpanFirst":
            return Q.SpanFirst(
                self._span(self._one_child(el), field),
                end=int(self._attr(el, "end", 1)),
            )
        if tag == "SpanPositionRange":
            return Q.SpanPositionRange(
                self._span(self._one_child(el), field),
                start=int(self._attr(el, "start", 1)),
                end=int(self._attr(el, "end", 1)),
            )
        if tag == "BoostingTermQuery":
            # inside a span tree the payload function contributes
            # matching spans only; at query position _query() scores it
            return Q.SpanTerm(self._text(el))
        raise ParseError(f"unknown span element <{tag}>")

    def _q_BoostingTermQuery(self, el, field):
        return Q.PayloadScoreQuery(
            field, Q.SpanTerm(self._text(el)), func="avg",
            include_span_score=True,
        )
