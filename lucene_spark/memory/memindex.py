"""MemoryIndex — the `memory` module analog (single-document, in-heap
index for prospective search).

Reference semantics (memory/src/java/org/apache/lucene/index/memory/
MemoryIndex.java class doc): a "high-performance single-document main
memory" index — add fields of ONE document, then run arbitrary queries
against it and get back a relevance score; 0.0 means no match. Its
canonical use is the percolator/monitor verification stage: a streamed
document is indexed in-memory and each candidate standing query is
executed against it exactly (monitor/DocumentBatch.java builds exactly
such a one-doc reader for singleton batches).

Kept semantics:

- ``add_field(name, text)`` inverts one field value; repeated calls on
  the same field APPEND (MemoryIndex.java addField: subsequent values
  continue at the next position, with the analyzer's position gap —
  our analyzers are filter chains over regex tokenizers whose gap is
  0, Lucene's ``Analyzer.getPositionIncrementGap`` default).
- ``search(query)`` -> float score of the document, 0.0 if no match
  (MemoryIndex.java search(Query): "Convenience method that efficiently
  returns the relevance score; ... 0.0 if the query does not match").
- Scoring sees single-doc collection statistics: docCount=1, avgdl =
  this document's field length — identical to what an IndexSearcher
  over a freshly-built one-doc index computes.

Spark-first design: there is no bespoke single-doc reader. The field is
inverted with the SAME ``build_segment`` kernel the distributed builder
runs per partition, and queries are compiled by the SAME
``IndexSearcher._compile`` and evaluated by the SAME
``_SegmentIndex``/``_eval`` kernel the executor ships into
``applyInPandas`` — so a MemoryIndex score is bit-identical to the full
engine's score for the equivalent one-doc index (asserted in
tests/test_memindex.py), and the entire query surface (boolean,
phrase exact/sloppy, multi-phrase, NEAR, intervals, spans, payloads,
term automata, multi-term rewrites, every registered Similarity) works
without a line of per-query code here.

No SparkSession is required: everything is driver-local pandas/numpy.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_spark.analysis import Analyzer, get_analyzer
from lucene_spark.index.segment import build_segment
from lucene_spark.search import query as Q
from lucene_spark.search.bm25 import CollectionStats
from lucene_spark.search.executor import (
    FIELD_SEP,
    IndexReader,
    IndexSearcher,
    _collect_field,
    _collect_terms,
    _eval,
    _SegmentIndex,
)
from lucene_spark.streaming.percolator import _within_edits


class _MemoryReader:
    """Driver-local stand-in for IndexReader during query compile: the
    term dictionary and field stats of the one in-memory document.
    Reuses IndexReader's own cache-backed ``term_stats``/``expand``
    implementations (the block-tree-on-heap path), so compile-time
    semantics — including multi-term rewrites and TooManyClauses
    budgets — are the engine's, not a reimplementation."""

    TERM_CACHE_MAX_ROWS = IndexReader.TERM_CACHE_MAX_ROWS

    def __init__(self, tc: dict, field_stats: dict, manifest: dict):
        self._tc_data = tc
        self._field_stats = field_stats
        self.manifest = manifest

    def _term_cache(self):
        return self._tc_data

    # borrowed verbatim: both only touch _term_cache()/_tc_by_field
    term_stats = IndexReader.term_stats

    def collection_stats(self, field: str) -> CollectionStats:
        st = self._field_stats.get(field)
        if st is None:
            # unknown field: every term lookup misses, so scorers are
            # never built — any non-degenerate stats row is fine
            return CollectionStats(
                max_doc=1, doc_count=1, sum_total_term_freq=1, sum_doc_freq=0
            )
        return st

    def sum_doc_freq(self, field: str) -> int:
        return sum(1 for (f, _t) in self._tc_data if f == field)

    def expand(self, q: Q.Query) -> list[str]:
        if isinstance(q, Q.FuzzyQuery):
            # the engine's fuzzy expansion is a Spark scan
            # (F.levenshtein, no transpositions); replicate it locally
            # with the same plain-Levenshtein acceptance
            terms = sorted(t for (f, t) in self._tc_data if f == q.field)
            pfx = q.term[: q.prefix_length] if q.prefix_length else ""
            return [
                t
                for t in terms
                if t.startswith(pfx) and _within_edits(q.term, t, q.max_edits)
            ]
        return IndexReader.expand(self, q)


class MemoryIndex:
    def __init__(
        self,
        analyzer: str | Analyzer = "standard",
        k1: float = 1.2,
        b: float = 0.75,
        postings_format: str = "for104",
    ):
        self._default_analyzer = (
            get_analyzer(analyzer) if isinstance(analyzer, str) else analyzer
        )
        self.k1 = k1
        self.b = b
        self._fmt = postings_format
        # field -> (analyzer, [value, ...])
        self._fields: dict[str, tuple[Analyzer, list[str]]] = {}
        self._frozen: tuple | None = None

    # ---- write side --------------------------------------------------

    def add_field(
        self, name: str, text: str, analyzer: str | Analyzer | None = None
    ) -> "MemoryIndex":
        """Invert one field value (MemoryIndex.addField). Repeated calls
        with the same name append the value at the next position; the
        per-field analyzer is fixed by the first call (FieldInfos'
        schema-on-first-use rule)."""
        an = (
            self._default_analyzer
            if analyzer is None
            else get_analyzer(analyzer) if isinstance(analyzer, str) else analyzer
        )
        if name in self._fields:
            prev_an, vals = self._fields[name]
            vals.append(text)
        else:
            self._fields[name] = (an, [text])
        self._frozen = None
        return self

    def reset(self) -> None:
        """MemoryIndex.reset(): recycle for the next document."""
        self._fields = {}
        self._frozen = None

    # ---- freeze: invert with the builder's own kernel ----------------

    def _freeze(self):
        if self._frozen is not None:
            return self._frozen
        posting_frames: list[pd.DataFrame] = []
        field_stats: dict[str, CollectionStats] = {}
        tc: dict[tuple[str, str], object] = {}
        doc_ids = np.zeros(1, dtype=np.int64)
        for field, (an, values) in self._fields.items():
            # multi-value append: values joined on a token break the
            # regex tokenizers never emit or merge across — positions
            # concatenate with gap 0, offsets with gap 1 (the Analyzer
            # getPositionIncrementGap/getOffsetGap defaults)
            text = "\n".join(values)
            staging = build_segment(
                "mem0",
                doc_ids,
                pd.Series([text]),
                an,
                field,
                store_positions=True,
                store_offsets=an.supports_offsets(),
                store_payloads=(
                    not an.supports_offsets() and an.supports_payloads()
                ),
                postings_format=self._fmt,
            )
            docs = staging[staging["row_type"] == 0]
            posts = staging[staging["row_type"] == 1].reset_index(drop=True)
            doc_len = int(docs["doc_len"].iloc[0]) if len(docs) else 0
            field_stats[field] = CollectionStats(
                max_doc=1,
                doc_count=1,
                sum_total_term_freq=doc_len,
                sum_doc_freq=len(posts),
            )
            from lucene_spark.search.bm25 import TermStats

            for t, df_, ttf in zip(
                posts["term"], posts["doc_freq"], posts["total_term_freq"]
            ):
                tc[(field, str(t))] = TermStats(
                    doc_freq=int(df_), total_term_freq=int(ttf)
                )
            posting_frames.append(posts)
        pdf = (
            pd.concat(posting_frames, ignore_index=True)
            if posting_frames
            else pd.DataFrame()
        )
        reader = _MemoryReader(
            tc,
            field_stats,
            {"k1": self.k1, "b": self.b, "postings_format": self._fmt},
        )
        self._frozen = (pdf, reader)
        return self._frozen

    # ---- read side ----------------------------------------------------

    def search(self, q: Q.Query | str, default_field: str = "content",
               similarity=None) -> float:
        """Score of THE document for ``q`` (0.0 = no match). ``q`` may be
        a query string (parsed with the classic QueryParser over
        ``default_field``) or any query-AST node the engine supports."""
        if isinstance(q, str):
            from lucene_spark.search.queryparser import QueryParser

            q = QueryParser(default_field).parse(q)
        q = Q.rewrite_fixpoint(q)
        if isinstance(q, Q.MatchNoDocsQuery):
            return 0.0
        if isinstance(q, Q.MatchAllQuery):
            return float(np.float32(q.boost)) if self._fields else 0.0
        pdf, reader = self._freeze()
        searcher = IndexSearcher(reader, self.k1, self.b, similarity=similarity)
        node = searcher._compile(q)
        if node is None or pdf.empty:
            return 0.0
        # replicate IndexSearcher.search's postings pre-filter on pandas
        terms = sorted(_collect_terms(node))
        field = _collect_field(node)
        plain = [t for t in terms if FIELD_SEP not in t]
        mask = (pdf["field"] == field) & pdf["term"].isin(plain)
        for t in terms:
            if FIELD_SEP in t:
                f, _, raw = t.partition(FIELD_SEP)
                mask |= (pdf["field"] == f) & (pdf["term"] == raw)
        rows = pdf[mask].reset_index(drop=True)
        if rows.empty:
            return 0.0
        ctx = _SegmentIndex(rows, fmt=self._fmt)
        docs, scores = _eval(node, ctx, None)
        hit = scores[docs == 0]
        return float(hit[0]) if len(hit) else 0.0

    def matches(self, q: Q.Query | str, default_field: str = "content") -> bool:
        return self.search(q, default_field) > 0.0

    def payloads_for_query(
        self, q: "Q.Query | str", default_field: str = "content"
    ) -> list[float]:
        """PayloadSpanUtil.getPayloadsForQuery (sandbox/payloads/
        PayloadSpanUtil.java): the payloads at every leaf position of
        the SPAN FORM of a standard query, over THE document — the
        reference's own recommended deployment ("operates like
        Highlighter — IndexReader should only contain doc of interest,
        best to use MemoryIndex"). Conversion table carried from
        queryToSpanQuery: BooleanQuery recurses its non-prohibited
        clauses, PhraseQuery becomes SpanNear(terms, slop,
        in_order=(slop==0)), TermQuery becomes SpanTerm,
        DisjunctionMax recurses each arm, span queries pass through.

        Supported span shapes are the payload-trackable ones (SpanTerm
        / in-order SpanNear — executor._span_leaf_terms); the slop>0
        phrase arm therefore runs IN-ORDER here where the reference
        builds an unordered near (documented divergence: matches are a
        subset for reordered phrases). Requires store_payloads fields;
        returns [] when nothing matches."""
        if isinstance(q, str):
            from lucene_spark.search.queryparser import QueryParser

            q = QueryParser(default_field).parse(q)
        q = Q.rewrite_fixpoint(q)
        pairs: list[tuple[str, Q.SpanSource]] = []

        def convert(node) -> None:
            if isinstance(node, Q.BooleanQuery):
                for c in node.must + node.should + node.filter:
                    convert(c)
            elif isinstance(node, Q.DisjunctionMaxQuery):
                for c in node.queries:
                    convert(c)
            elif isinstance(node, Q.PhraseQuery):
                pairs.append((node.field, Q.SpanNear(
                    tuple(Q.SpanTerm(t) for t in node.terms),
                    slop=node.slop, in_order=True,
                )))
            elif isinstance(node, Q.TermQuery):
                pairs.append((node.field, Q.SpanTerm(node.term)))
            elif isinstance(node, Q.SpanQuery):
                pairs.append((node.field, node.source))
            elif isinstance(node, (Q.MatchAllQuery, Q.MatchNoDocsQuery)):
                pass
            else:
                raise TypeError(
                    f"PayloadSpanUtil cannot convert {type(node).__name__}"
                )

        convert(q)
        pdf, _reader = self._freeze()
        if pdf.empty or not pairs:
            return []
        from lucene_spark.search.executor import (
            _gather_pos_payloads,
            _pos_key_base,
            _span_leaf_terms,
            _spans_eval_leaves,
        )

        out: list[float] = []
        docs = np.array([0], dtype=np.int64)
        for field, src in pairs:
            lt = _span_leaf_terms(src)
            rows = pdf[
                (pdf["field"] == field) & pdf["term"].isin(sorted(set(lt)))
            ].reset_index(drop=True)
            if rows.empty:
                continue
            ctx = _SegmentIndex(rows, fmt=self._fmt)
            terms = [t for t in dict.fromkeys(lt) if ctx.has(t)]
            if len(terms) < len(set(lt)):
                continue
            large = _pos_key_base(ctx, terms, len(lt) + 2)
            s, _e, _g, leaves = _spans_eval_leaves(src, ctx, docs, large)
            if len(s) == 0:
                continue
            for term, key_arr in zip(lt, leaves):
                keys, vals = _gather_pos_payloads(ctx, term, docs, large)
                out.extend(
                    float(v)
                    for v in vals[np.searchsorted(keys, key_arr)]
                )
        return out

    def match_offsets(
        self, q: Q.Query | str, default_field: str = "content"
    ) -> list[tuple[str, int, int]]:
        """Hit spans of a matching query — the HighlightsMatch payload
        (monitor/HighlightsMatch.java: "the hits that the query
        matched", as (term, char start, char end) per occurrence).
        Empty when the query does not match. Requires an
        offsets-tracking analyzer for the queried field.

        Deviation, documented: the reference derives spans from the
        Matches API, which for positional queries reports only the
        occurrences PARTICIPATING in a match; this returns every
        occurrence of each query term present in the document —
        exact for term/boolean/multi-term queries, a superset for
        phrase/interval/span hits."""
        if isinstance(q, str):
            from lucene_spark.search.queryparser import QueryParser

            q = QueryParser(default_field).parse(q)
        q = Q.rewrite_fixpoint(q)
        if self.search(q) <= 0.0:
            return []
        pdf, reader = self._freeze()
        node = IndexSearcher(reader, self.k1, self.b)._compile(q)
        field = _collect_field(node)
        terms = sorted(
            t for t in _collect_terms(node) if FIELD_SEP not in t
        )
        rows = pdf[
            (pdf["field"] == field) & pdf["term"].isin(terms)
        ].reset_index(drop=True)
        ctx = _SegmentIndex(rows, fmt=self._fmt)
        out: list[tuple[str, int, int]] = []
        for t in terms:
            if not ctx.has(t):
                continue
            st, en, _starts, _lens = ctx.flat_offsets(t)
            out.extend((t, int(s), int(e)) for s, e in zip(st, en))
        out.sort(key=lambda x: (x[1], x[2], x[0]))
        return out
