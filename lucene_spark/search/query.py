"""Query AST + logical rewrites — the Query/rewrite layer.

Dataclass analogs of lucene/core/src/java/org/apache/lucene/search/
Query subclasses (SURVEY.md §2.4), with the score-preserving boolean
simplifications of BooleanQuery.rewrite (BooleanQuery.java:269-429):
single-clause collapse, nested flattening, pure-negation ->
MatchNoDocs, MatchAll/MatchNone propagation. The fixpoint loop mirrors
IndexSearcher.rewrite (IndexSearcher.java:860-869).
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field


class Query:
    def rewrite(self) -> "Query":
        return self


@dataclass(frozen=True)
class TermQuery(Query):
    field: str
    term: str
    boost: float = 1.0


@dataclass(frozen=True)
class SynonymQuery(Query):
    """Several terms scored as one pseudo-term (SynonymQuery.java):
    freqs summed per doc, docFreq blended to the max of the terms'."""
    field: str
    terms: tuple[str, ...]
    boost: float = 1.0


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Exact phrase (slop=0): terms at consecutive positions; freq =
    number of phrase occurrences; idf = sum of per-term idfs
    (PhraseQuery.java / BM25Similarity.idfExplain for arrays)."""
    field: str
    terms: tuple[str, ...]
    slop: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase with alternatives per position (MultiPhraseQuery.java):
    slot i matches if ANY of slots[i]'s terms occurs there; freq =
    number of phrase alignments; idf = sum over all terms of all slots
    (MultiPhraseQuery idf array semantics)."""
    field: str
    slots: tuple[tuple[str, ...], ...]
    boost: float = 1.0


@dataclass(frozen=True)
class NearQuery(Query):
    """Proximity match (intervals-lite, Intervals.ordered/unordered
    maxwidth analog): both terms within `window` positions, optionally
    in order; constant-score matching."""
    field: str
    term_a: str
    term_b: str
    window: int = 3
    ordered: bool = True
    boost: float = 1.0


class IntervalsSource:
    """Interval-source algebra (queries/intervals/Intervals.java
    factory surface, minimal-interval semantics after Clarke et al. as
    implemented by OrderedIntervalsSource / UnorderedIntervalsSource /
    ContainedByIntervalsSource). Subset shipped: term sources, n-term
    ordered / unordered with max_gaps (term children) and max_width,
    CONTAINED_BY and CONTAINING combinators. Gaps follow the term-child
    definition gaps = width - n_terms (Intervals.maxgaps)."""

    def terms(self) -> tuple[str, ...]:
        raise NotImplementedError


@dataclass(frozen=True)
class ITerm(IntervalsSource):
    term: str

    def terms(self):
        return (self.term,)


@dataclass(frozen=True)
class IOrdered(IntervalsSource):
    """Sources matched in order, each strictly after the previous
    interval's end (Intervals.ordered)."""
    sources: tuple[IntervalsSource, ...]
    max_gaps: int = -1   # -1 = unbounded; term children only
    max_width: int = -1  # -1 = unbounded

    def terms(self):
        return tuple(t for s in self.sources for t in s.terms())


@dataclass(frozen=True)
class IUnordered(IntervalsSource):
    """Sources matched in any order within one span, overlaps allowed
    (Intervals.unordered)."""
    sources: tuple[IntervalsSource, ...]
    max_gaps: int = -1
    max_width: int = -1

    def terms(self):
        return tuple(t for s in self.sources for t in s.terms())


@dataclass(frozen=True)
class IAtLeast(IntervalsSource):
    """Minimal spans containing intervals of at least `n` of the
    sources (Intervals.atLeast / MinimumShouldMatchIntervalsSource)."""
    sources: tuple[IntervalsSource, ...]
    n: int
    max_width: int = -1

    def terms(self):
        return tuple(t for s in self.sources for t in s.terms())


@dataclass(frozen=True)
class IContainedBy(IntervalsSource):
    """Minimal intervals of `small` lying inside an interval of `big`
    (Intervals.containedBy)."""
    small: IntervalsSource
    big: IntervalsSource

    def terms(self):
        return self.small.terms() + self.big.terms()


@dataclass(frozen=True)
class IContaining(IntervalsSource):
    """Minimal intervals of `big` that contain an interval of `small`
    (Intervals.containing)."""
    big: IntervalsSource
    small: IntervalsSource

    def terms(self):
        return self.big.terms() + self.small.terms()


@dataclass(frozen=True)
class IExtend(IntervalsSource):
    """Each interval [s, e] of `source` extended to
    [max(doc_start, s - before), e + after] (Intervals.extend,
    Intervals.java:395-430). Like the reference, the result is NOT
    re-minimalized — extended envelopes may overlap/nest; starts and
    ends stay non-decreasing, which is what parent combinators need."""
    source: IntervalsSource
    before: int
    after: int

    def terms(self):
        return self.source.terms()


@dataclass(frozen=True)
class IBefore(IntervalsSource):
    """Intervals of `source` ending before an interval of `reference`
    begins (Intervals.before)."""
    source: IntervalsSource
    reference: IntervalsSource

    def terms(self):
        return self.source.terms() + self.reference.terms()


@dataclass(frozen=True)
class IAfter(IntervalsSource):
    """Intervals of `source` starting after an interval of `reference`
    ends (Intervals.after)."""
    source: IntervalsSource
    reference: IntervalsSource

    def terms(self):
        return self.source.terms() + self.reference.terms()


@dataclass(frozen=True)
class INonOverlapping(IntervalsSource):
    """Intervals of `source` that overlap NO interval of `reference`
    (Intervals.nonOverlapping); a doc with no reference intervals keeps
    every source interval."""
    source: IntervalsSource
    reference: IntervalsSource

    def terms(self):
        return self.source.terms() + self.reference.terms()


@dataclass(frozen=True)
class IOverlapping(IntervalsSource):
    """Intervals of `source` that overlap an interval of `reference`
    (Intervals.overlapping)."""
    source: IntervalsSource
    reference: IntervalsSource

    def terms(self):
        return self.source.terms() + self.reference.terms()


@dataclass(frozen=True)
class INotContaining(IntervalsSource):
    """Intervals of `big` that contain NO interval of `small`
    (Intervals.notContaining)."""
    big: IntervalsSource
    small: IntervalsSource

    def terms(self):
        return self.big.terms() + self.small.terms()


@dataclass(frozen=True)
class IFixField(IntervalsSource):
    """Intervals.fixField (Intervals.java:456-462): intervals of
    `source` are read from `field` instead of the enclosing query's
    field — cross-field interval composition ("search for stemmed terms
    near unstemmed terms"). The executor rewrites the subtree's term
    leaves to field-qualified postings keys at compile, the same
    mechanism as FieldMaskingSpanQuery."""
    field: str
    source: IntervalsSource

    def terms(self):
        return self.source.terms()


@dataclass(frozen=True)
class IPhrase(IntervalsSource):
    """Sources matched exactly adjacent, in order (Intervals.phrase):
    ordered with zero gaps."""
    sources: tuple[IntervalsSource, ...]

    def terms(self):
        return tuple(t for s in self.sources for t in s.terms())


@dataclass(frozen=True)
class IMultiTerm(IntervalsSource):
    """A multi-term query lifted into interval space
    (Intervals.prefix/wildcard/fuzzy/range -> MultiTermIntervalsSource,
    Intervals.java:258-345): matches intervals of ANY term the wrapped
    query expands to — compile-time desugared to atLeast(1, expansions)
    (== Intervals.or; the reference wraps the expansions the same way).
    Expansion past ``max_expansions`` raises TooManyClauses, mirroring
    the reference's IllegalStateException at 128 by default."""
    query: Query  # Prefix/Wildcard/Regexp/Fuzzy/TermRange query
    max_expansions: int = 128

    def terms(self):
        return ()  # pattern leaf: unknown until expanded at compile


@dataclass(frozen=True)
class PhraseWildcardQuery(Query):
    """Phrase where any slot may be a multi-term pattern
    (sandbox/search/PhraseWildcardQuery.java): each pattern slot expands
    against the term dictionary and the query rewrites to
    MultiPhraseQuery. ``max_expansions`` is the TOTAL expansion budget
    shared across all multi-term slots (PhraseWildcardQuery.java:64-76
    'controls the total number of expansions across all
    MultiTermQuery'), consumed slot by slot in dictionary order. Slots:
    a literal term string, or a multi-term query (PrefixQuery /
    WildcardQuery / RegexpQuery / ...)."""
    field: str
    slots: tuple
    max_expansions: int = 128
    boost: float = 1.0


@dataclass(frozen=True)
class NGramPhraseQuery(Query):
    """Phrase over an n-gram analyzed field (core/search/
    NGramPhraseQuery.java): consecutive grams overlap, so matching every
    n-th gram plus the last (at their original position offsets) is
    equivalent to matching all of them — ~1/n of the posting lists are
    read. Rewrites to a gapped exact-phrase (terms at explicit position
    offsets); scores use the kept terms' idf, exactly like the
    reference's rewrite to a positioned PhraseQuery."""
    field: str
    terms: tuple[str, ...]
    n: int
    boost: float = 1.0


@dataclass(frozen=True)
class IntervalQuery(Query):
    """IntervalQuery over one field. Deviation (documented): matching
    docs score a constant `boost` (the reference scores by an
    IntervalScoreFunction over total interval width; our gate contract
    is match-set identity, like NearQuery)."""
    field: str
    source: IntervalsSource
    boost: float = 1.0


class SpanSource:
    """Span algebra (queries/src/java/org/apache/lucene/queries/spans/
    SpanQuery.java subclasses). Unlike IntervalsSource (minimal
    intervals, match-set semantics), spans enumerate EVERY match and
    feed a per-match sloppy weight 1/(1+gaps) into the similarity as
    the doc's freq (SpanScorer.setFreqCurrentDoc accumulating
    docScorer.computeSlopFactor — SpanScorer.java:116-140)."""

    def terms(self) -> tuple[str, ...]:
        raise NotImplementedError

    def scoring_terms(self) -> tuple[str, ...]:
        """Terms whose stats feed the SimScorer (SpanNotQuery excludes
        its `exclude` subtree — SpanNotQuery.java SpanNotWeight passes
        only the include weight's termStates)."""
        return self.terms()


@dataclass(frozen=True)
class SpanTerm(SpanSource):
    """Single-term spans: [p, p] per occurrence (SpanTermQuery.java)."""
    term: str

    def terms(self):
        return (self.term,)


@dataclass(frozen=True)
class SpanNear(SpanSource):
    """Clause spans combined in document order (in_order=True:
    NearSpansOrdered.java — each clause's first span starting after the
    previous clause's end, anchored at every span of the first clause)
    or any order (NearSpansUnordered.java — the greedy cover at every
    child-span start). A match survives when
    gaps = width - sum(child widths) <= slop."""
    clauses: tuple
    slop: int = 0
    in_order: bool = True

    def terms(self):
        return tuple(t for c in self.clauses for t in c.terms())


@dataclass(frozen=True)
class SpanOr(SpanSource):
    """Union of clause spans in position order (SpanOrQuery.java)."""
    clauses: tuple

    def terms(self):
        return tuple(t for c in self.clauses for t in c.terms())


@dataclass(frozen=True)
class SpanMulti(SpanSource):
    """A multi-term query (Prefix/Wildcard/Fuzzy/Regexp/TermRange) lifted
    into span space (SpanMultiTermQueryWrapper.java): expands against
    the term dictionary at compile time into a SpanOr of SpanTerms
    (SpanNearClauseFactory semantics for the surround parser). The
    `query`'s own field is ignored — the enclosing SpanQuery's field
    applies."""
    query: object

    def terms(self):
        # unexpanded: contributes no statically-known terms; the
        # compile-time expansion (executor._expand_span_source)
        # replaces this node before evaluation
        return ()


@dataclass(frozen=True)
class SpanNot(SpanSource):
    """Include spans with no exclude span overlapping
    [start - pre, end + post] (SpanNotQuery.java)."""
    include: SpanSource
    exclude: SpanSource
    pre: int = 0
    post: int = 0

    def terms(self):
        return self.include.terms() + self.exclude.terms()

    def scoring_terms(self):
        return self.include.scoring_terms()


@dataclass(frozen=True)
class SpanFirst(SpanSource):
    """Spans of `match` that end within the first `end` positions
    (SpanFirstQuery.java / SpanPositionRangeQuery with start=0):
    inclusive end position < end (0-based)."""
    match: SpanSource
    end: int

    def terms(self):
        return self.match.terms()


@dataclass(frozen=True)
class SpanPositionRange(SpanSource):
    """Spans of `match` whose start position is >= `start` and whose
    inclusive end position is < `end` (SpanPositionRangeQuery.java;
    SpanFirst == SpanPositionRange(start=0))."""
    match: SpanSource
    start: int
    end: int

    def terms(self):
        return self.match.terms()


@dataclass(frozen=True)
class SpanContaining(SpanSource):
    """Spans of `big` that contain at least one span of `little`
    (SpanContainingQuery.java); weight/width comes from `big`."""
    big: SpanSource
    little: SpanSource

    def terms(self):
        return self.big.terms() + self.little.terms()


@dataclass(frozen=True)
class SpanWithin(SpanSource):
    """Spans of `little` that lie inside a span of `big`
    (SpanWithinQuery.java); weight/width comes from `little`."""
    little: SpanSource
    big: SpanSource

    def terms(self):
        return self.little.terms() + self.big.terms()


@dataclass(frozen=True)
class SpanPayloadCheck(SpanSource):
    """Spans of `match` whose ordered leaf-position payloads equal
    `payloads` exactly (queries/.../payloads/SpanPayloadCheckQuery.java
    — payload-by-payload equality over the span's positions). Scores
    like the wrapped span source. Supported match shapes: SpanTerm and
    in-order SpanNear trees over SpanTerms (the shapes with a
    well-defined leaf-position sequence per match)."""
    match: SpanSource
    payloads: tuple  # float per leaf position, in span order

    def terms(self):
        return self.match.terms()

    def scoring_terms(self):
        return self.match.scoring_terms()


@dataclass(frozen=True)
class SpanQuery(Query):
    """Top-level scored span query over one field: freq(doc) =
    sum over matches of 1/(1 + max(gaps, 0)), scored through the
    field's Similarity with the scoring-subtree terms' summed stats
    (SpanWeight.buildSimWeight — SpanWeight.java:86-108)."""
    field: str
    source: SpanSource
    boost: float = 1.0


@dataclass(frozen=True)
class SpanFieldMasking(SpanSource):
    """queries/spans/FieldMaskingSpanQuery.java: evaluate `match`
    against `real_field`'s postings while 'lying' about the field, so
    it can participate in a composite single-field span tree (the
    denormalized parent/child example, FieldMaskingSpanQuery.java:36-60).
    Scoring follows the reference's documented caveat
    (FieldMaskingSpanQuery.java:63-65): collection statistics come from
    the enclosing SpanQuery's field, term statistics from the real
    field."""
    match: SpanSource
    real_field: str

    def terms(self):
        return self.match.terms()

    def scoring_terms(self):
        return self.match.scoring_terms()


@dataclass(frozen=True)
class TermAutomatonQuery(Query):
    """sandbox/search/TermAutomatonQuery.java: a proximity query whose
    transitions are terms — a generalization of Phrase/MultiPhrase/
    SpanNear (acts like a disjunction over its terms, then merge-sorts
    positions per doc and counts automaton matches). freq = number of
    times the determinized automaton steps into an accept state during
    the token walk, counting both continuing matches and a fresh start
    at every term position (TermAutomatonScorer.java:215-340; ANY arcs
    advance states across gaps without counting accepts). Score =
    SimScorer(freq, norm) over the summed statistics of every present
    automaton term (TermAutomatonQuery.java:380-399).

    `automaton` is a finished search.automaton.TermAutomaton (the
    builder replays createState/setAccept/addTransition/
    addAnyTransition/finish)."""
    automaton: object
    boost: float = 1.0


@dataclass(frozen=True)
class PayloadScoreQuery(Query):
    """queries/.../payloads/PayloadScoreQuery.java: enumerate the
    source's matching spans per doc, feed the payload at every leaf
    position through a PayloadFunction (`func` = min | max | sum | avg
    — Min/Max/Sum/AveragePayloadFunction), and score the doc by the
    aggregated payload value times `boost` (times the span BM25 score
    when include_span_score, PayloadScoreQuery.java:61-66)."""
    field: str
    source: SpanSource
    func: str = "sum"
    include_span_score: bool = False
    boost: float = 1.0


@dataclass(frozen=True)
class MatchAllQuery(Query):
    boost: float = 1.0


@dataclass(frozen=True)
class MatchNoDocsQuery(Query):
    pass


@dataclass(frozen=True)
class PrefixQuery(Query):
    """Rewrites to a constant-score term-set over the term dictionary
    (MultiTermQuery CONSTANT_SCORE_REWRITE; PrefixQuery.java:29)."""
    field: str
    prefix: str
    boost: float = 1.0


@dataclass(frozen=True)
class WildcardQuery(Query):
    field: str
    pattern: str  # `*` any run, `?` single char (WildcardQuery.java:38)
    boost: float = 1.0


@dataclass(frozen=True)
class RegexpQuery(Query):
    field: str
    regexp: str
    boost: float = 1.0


@dataclass(frozen=True)
class FuzzyQuery(Query):
    """Terms within Levenshtein distance <= max_edits (FuzzyQuery.java;
    LevenshteinAutomata.java:31 caps at 2)."""
    field: str
    term: str
    max_edits: int = 2
    prefix_length: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class TermRangeQuery(Query):
    field: str
    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class TermInSetQuery(Query):
    field: str
    terms: tuple[str, ...]
    boost: float = 1.0


class TooManyClauses(Exception):
    """IndexSearcher.TooManyClauses: a scoring rewrite expanded past
    max_clause_count (BooleanQuery.java maxClauseCount, default 1024)."""


@dataclass(frozen=True)
class ScoringRewriteQuery(Query):
    """MultiTermQuery.SCORING_BOOLEAN_REWRITE: expand the wrapped
    multi-term query's matching terms into a SHOULD disjunction of
    scoring TermQueries (each hit scored by real BM25 instead of the
    constant-score default). Raises TooManyClauses past
    max_clause_count — the BooleanQuery contract."""
    query: Query  # a multi-term query (prefix/wildcard/regexp/fuzzy/range)
    max_clause_count: int = 1024
    boost: float = 1.0


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    query: Query
    boost: float = 1.0

    def rewrite(self) -> Query:
        inner = self.query.rewrite()
        if isinstance(inner, MatchNoDocsQuery):
            return inner
        return ConstantScoreQuery(inner, self.boost)


@dataclass(frozen=True)
class BoostQuery(Query):
    query: Query
    boost: float

    def rewrite(self) -> Query:
        inner = self.query.rewrite()
        if isinstance(inner, MatchNoDocsQuery):
            return inner
        if isinstance(inner, TermQuery):
            return TermQuery(inner.field, inner.term, inner.boost * self.boost)
        if isinstance(inner, BoostQuery):
            return BoostQuery(inner.query, inner.boost * self.boost)
        return BoostQuery(inner, self.boost)


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """score = max(sub) + tie_breaker * (sum(sub) - max(sub))
    (DisjunctionMaxQuery.java)."""
    queries: tuple[Query, ...]
    tie_breaker: float = 0.0

    def rewrite(self) -> Query:
        subs = tuple(
            q2 for q in self.queries
            if not isinstance((q2 := q.rewrite()), MatchNoDocsQuery)
        )
        if not subs:
            return MatchNoDocsQuery()
        if len(subs) == 1:
            return subs[0]
        return DisjunctionMaxQuery(subs, self.tie_breaker)


@dataclass(frozen=True)
class BooleanQuery(Query):
    must: tuple[Query, ...] = ()
    should: tuple[Query, ...] = ()
    must_not: tuple[Query, ...] = ()
    filter: tuple[Query, ...] = ()
    min_should: int = 0

    def rewrite(self) -> Query:
        must = tuple(q.rewrite() for q in self.must)
        should = tuple(q.rewrite() for q in self.should)
        must_not = tuple(q.rewrite() for q in self.must_not)
        filt = tuple(q.rewrite() for q in self.filter)

        # a MUST/FILTER MatchNoDocs kills the query (BooleanQuery.java)
        if any(isinstance(q, MatchNoDocsQuery) for q in must + filt):
            return MatchNoDocsQuery()
        should = tuple(q for q in should if not isinstance(q, MatchNoDocsQuery))
        must_not = tuple(q for q in must_not if not isinstance(q, MatchNoDocsQuery))
        # MatchAll in must_not -> nothing matches
        if any(isinstance(q, MatchAllQuery) for q in must_not):
            return MatchNoDocsQuery()
        if self.min_should > len(should) and not (must or filt):
            return MatchNoDocsQuery()
        if self.min_should > len(should):
            return MatchNoDocsQuery()
        # pure negation matches nothing (BooleanQuery rewrite:
        # MUST_NOT-only queries are unsatisfiable without a positive clause)
        if not must and not should and not filt:
            return MatchNoDocsQuery()
        # single-clause collapse
        if len(must) == 1 and not should and not must_not and not filt:
            return must[0]
        if (
            len(should) == 1
            and not must
            and not must_not
            and not filt
            and self.min_should <= 1
        ):
            return should[0]
        return BooleanQuery(must, should, must_not, filt, self.min_should)


def rewrite_fixpoint(q: Query, max_iters: int = 10) -> Query:
    """Repeated rewrite until it reaches a fixpoint
    (IndexSearcher.java:860-869)."""
    for _ in range(max_iters):
        q2 = q.rewrite()
        if q2 == q:
            return q
        q = q2
    return q


@dataclass(frozen=True)
class TopDoc:
    doc_id: int
    score: float


@dataclass
class TopDocs:
    """Collected hits: score DESC, doc_id ASC tie-break
    (TopScoreDocCollector.java:23-33); merge across segments keeps the
    same order (TopDocs.java:36-45)."""
    total_hits: int
    hits: list[TopDoc] = dc_field(default_factory=list)
