"""Percolator — the monitor module (reverse search): register standing
queries, stream documents through, emit (doc, query_id) matches.

Reference semantics (monitor/src/java/org/apache/lucene/monitor/
Monitor.java, CandidateMatcher.java, presearcher pruning): thousands of
registered queries; each incoming doc is matched only against the
queries whose term fingerprint intersects the doc's terms (the
QueryTermFilter presearcher), then candidates are evaluated exactly.

Spark mapping: the compiled query table (query_id -> AST + a term ->
query_ids prefilter map) is broadcast; documents stream through ONE
``mapInPandas`` that tokenizes, looks up candidate query ids from the
doc's term set, and exactly evaluates just those — a stream-static
join shape with no shuffle. Works identically on a batch DataFrame and
a Structured Streaming source (tested with availableNow).

Supported standing queries: Term, Boolean (must/should/must_not/filter
+ minShouldMatch), Phrase (slop 0), Prefix, Near.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from lucene_spark.analysis import get_analyzer
from lucene_spark.search import query as Q


def _tree_has_pattern(src) -> bool:
    """True if any leaf of an interval/span tree is a multi-term
    pattern whose matching terms are unknown before expansion."""
    import dataclasses

    if isinstance(src, (Q.SpanMulti, Q.IMultiTerm)):
        return True
    if dataclasses.is_dataclass(src):
        for f in dataclasses.fields(src):
            v = getattr(src, f.name)
            for x in v if isinstance(v, tuple) else (v,):
                if isinstance(
                    x, (Q.IntervalsSource, Q.SpanSource)
                ) and _tree_has_pattern(x):
                    return True
    return False


def _required_terms(q: Q.Query) -> set[str]:
    """Presearcher fingerprint: terms at least one of which MUST appear
    in any matching doc (QueryTermFilter semantics — a safe
    overapproximation: returning any non-empty 'one of these is
    necessary' set keeps recall 1.0)."""
    if isinstance(q, Q.TermQuery):
        return {q.term}
    if isinstance(q, Q.PhraseQuery):
        return {q.terms[0]}
    if isinstance(q, Q.NearQuery):
        return {q.term_a}
    if isinstance(q, Q.PrefixQuery):
        return set()  # cannot fingerprint by exact term -> always candidate
    if isinstance(q, Q.TermInSetQuery):
        # any-of the set is necessary — the set IS the fingerprint
        return set(q.terms)
    if isinstance(q, (Q.WildcardQuery, Q.RegexpQuery, Q.FuzzyQuery)):
        return set()  # pattern/edit-distance: always candidate
    if isinstance(q, Q.SynonymQuery):
        return set(q.terms)
    if isinstance(q, Q.MultiPhraseQuery):
        return set(q.slots[0]) if q.slots else set()
    if isinstance(q, (Q.IntervalQuery, Q.SpanQuery)):
        # every leaf term of a PATTERN-FREE interval/span tree appears
        # in terms(), and any match contains at least one of them — the
        # union is a safe any-of fingerprint. A pattern leaf (SpanMulti
        # / IMultiTerm) can match through terms invisible here, so its
        # presence forces always-candidate.
        if _tree_has_pattern(q.source):
            return set()
        ts = set(q.source.terms())
        return ts if ts and all(ts) else set()
    if isinstance(q, (Q.ConstantScoreQuery, Q.BoostQuery)):
        return _required_terms(q.query)
    if isinstance(q, Q.DisjunctionMaxQuery):
        out: set[str] = set()
        for s in q.queries:
            sub = _required_terms(s)
            if not sub:
                return set()
            out |= sub
        return out
    if isinstance(q, Q.BooleanQuery):
        if q.must:
            return _required_terms(q.must[0])
        if q.filter:
            return _required_terms(q.filter[0])
        out: set[str] = set()
        for s in q.should:
            sub = _required_terms(s)
            if not sub:
                return set()
            out |= sub
        return out
    return set()


def _required_term_sets(q: Q.Query, passes: int) -> list[set[str]]:
    """Multipass presearcher fingerprint
    (monitor/MultipassTermFilteredPresearcher.java): up to ``passes``
    any-of term sets, EACH of which must intersect a matching doc's
    tokens (ANDed across passes — the single-pass filter only requires
    one). A conjunction contributes one set per child up to the pass
    budget; a disjunction's pass-i set is the union of its children's
    pass-i sets and exists only if EVERY child has an i-th set. An
    empty list = always-candidate. Deviation, documented: the reference
    rotates terms into passes by a TermWeightor (longest-term-first);
    sets here keep structural order."""
    if passes <= 1:
        one = _required_terms(q)
        return [one] if one else []
    if isinstance(q, Q.TermQuery):
        return [{q.term}]
    if isinstance(q, Q.PhraseQuery):
        return [{t} for t in q.terms[:passes]]
    if isinstance(q, Q.NearQuery):
        return [{q.term_a}, {q.term_b}][:passes]
    if isinstance(q, Q.MultiPhraseQuery):
        return [set(slot) for slot in q.slots[:passes] if slot]
    if isinstance(q, (Q.ConstantScoreQuery, Q.BoostQuery)):
        return _required_term_sets(q.query, passes)
    if isinstance(q, Q.BooleanQuery):
        conj = list(q.must) + list(q.filter)
        if conj:
            out: list[set[str]] = []
            for child in conj:
                for s in _required_term_sets(q=child, passes=passes):
                    out.append(s)
                    if len(out) >= passes:
                        return out
            return out
        if q.should:
            child_sets = [_required_term_sets(s, passes) for s in q.should]
            if any(not cs for cs in child_sets):
                return []
            depth = min(len(cs) for cs in child_sets)
            return [
                set().union(*(cs[i] for cs in child_sets))
                for i in range(min(depth, passes))
            ]
        return []
    if isinstance(q, Q.DisjunctionMaxQuery):
        child_sets = [_required_term_sets(s, passes) for s in q.queries]
        if any(not cs for cs in child_sets):
            return []
        depth = min(len(cs) for cs in child_sets)
        return [
            set().union(*(cs[i] for cs in child_sets))
            for i in range(min(depth, passes))
        ]
    one = _required_terms(q)
    return [one] if one else []


def decompose(q: Q.Query) -> list[Q.Query]:
    """QueryDecomposer (monitor/QueryDecomposer.java:42-117): split a
    top-level disjunction into separately-fingerprinted subqueries so
    the presearcher prunes each arm independently. Boolean: SHOULD arms
    decompose when minShouldMatch <= 1 and there is no MUST/FILTER
    beside them; a single MUST with no SHOULD decomposes the MUST;
    MUST_NOT clauses are re-attached to every decomposed arm. DisMax
    decomposes every disjunct; a boost re-wraps each part."""
    if isinstance(q, Q.BoostQuery):
        subs = decompose(q.query)
        if q.boost == 1.0:
            return subs
        return [Q.BoostQuery(s, q.boost) for s in subs]
    if isinstance(q, Q.DisjunctionMaxQuery):
        out: list[Q.Query] = []
        for s in q.queries:
            out.extend(decompose(s))
        return out
    if isinstance(q, Q.BooleanQuery):
        if q.min_should > 1:
            return [q]
        mandatory = list(q.must) + list(q.filter)
        subs: list[Q.Query] = []
        for s in q.should:
            subs.extend(decompose(s))
        if len(mandatory) > 1 or (mandatory and subs):
            return [q]
        if len(mandatory) == 1:
            subs.extend(decompose(mandatory[0]))
        if not q.must_not:
            return subs
        return [
            Q.BooleanQuery(must=(s,), must_not=tuple(q.must_not))
            for s in subs
        ]
    return [q]


def _regexp_static_substring(pattern: str) -> str:
    """RegexpQueryHandler.selectLongestSubstring (RegexpQueryHandler.
    java:136-144): the longest run of the pattern with no '.', '*' or
    optional ('X?') operators — a substring every match must contain."""
    import re as _re

    selected = ""
    for sub in _re.split(r"\.|\*|.\?", pattern):
        if len(sub) > len(selected):
            selected = sub
    return selected


def _within_edits(a: str, b: str, k: int) -> bool:
    """Banded Levenshtein <= k (the LevenshteinAutomata acceptance
    test, k <= 2 in practice so the band is tiny)."""
    if abs(len(a) - len(b)) > k:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        lo = max(1, i - k)
        hi = min(len(b), i + k)
        if lo > 1:
            cur[lo - 1] = k + 1
        for j in range(lo, hi + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        if hi < len(b):
            cur[hi + 1 :] = [k + 1] * (len(b) - hi)
        if min(cur[lo - 1 : hi + 1]) > k:
            return False
        prev = cur
    return prev[len(b)] <= k


def _matches(q: Q.Query, toks: list[str], tokset: set[str]) -> bool:
    if isinstance(q, Q.TermQuery):
        return q.term in tokset
    if isinstance(q, Q.PrefixQuery):
        return any(t.startswith(q.prefix) for t in tokset)
    if isinstance(q, Q.TermInSetQuery):
        return not tokset.isdisjoint(q.terms)
    if isinstance(q, Q.WildcardQuery):
        import re as _re

        # Lucene wildcards: only * and ? are special ([ is literal, so
        # no fnmatch — WildcardQuery.java:38)
        rx = _re.compile(
            _re.escape(q.pattern).replace(r"\*", ".*").replace(r"\?", ".")
        )
        return any(rx.fullmatch(t) for t in tokset)
    if isinstance(q, Q.RegexpQuery):
        import re as _re

        rx = _re.compile(q.regexp)
        return any(rx.fullmatch(t) for t in tokset)
    if isinstance(q, Q.FuzzyQuery):
        return any(
            _within_edits(q.term, t, q.max_edits) for t in tokset
        )
    if isinstance(q, Q.PhraseQuery):
        n = len(q.terms)
        if any(t not in tokset for t in q.terms):
            return False
        first = q.terms[0]
        for i, t in enumerate(toks):
            if t == first and toks[i : i + n] == list(q.terms):
                return True
        return False
    if isinstance(q, Q.NearQuery):
        if q.term_a not in tokset or q.term_b not in tokset:
            return False
        pa = [i for i, t in enumerate(toks) if t == q.term_a]
        pb = [i for i, t in enumerate(toks) if t == q.term_b]
        for a in pa:
            for b in pb:
                d = b - a
                if 1 <= d <= q.window:
                    return True
                if not q.ordered and 1 <= -d <= q.window:
                    return True
        return False
    if isinstance(q, Q.BooleanQuery):
        if any(not _matches(s, toks, tokset) for s in q.must):
            return False
        if any(not _matches(s, toks, tokset) for s in q.filter):
            return False
        if any(_matches(s, toks, tokset) for s in q.must_not):
            return False
        if q.should:
            n = sum(1 for s in q.should if _matches(s, toks, tokset))
            need = q.min_should if (q.must or q.filter) else max(1, q.min_should)
            if q.min_should == 0 and (q.must or q.filter):
                return True
            return n >= need
        return bool(q.must or q.filter)
    raise TypeError(f"unsupported standing query {type(q).__name__}")


def _candidates(tokset, pre):
    """A doc's candidate query ids. Keys in the prefilter are
    (query_id, subquery_index) — with decomposition a query is a
    candidate when ANY of its decomposed arms has EVERY pass set
    intersected. Regexp arms (RegexpQueryHandler role) are candidates
    when some doc token CONTAINS the pattern's longest static
    substring, or some token exceeds max_token_size (the reference's
    __WILDCARD__ any-token: SuffixingNGramTokenFilter emits it for
    over-long tokens and every regexp query tree accepts it)."""
    prefilter, need, always, re_filters, max_tok = pre
    seen: dict[tuple[str, int], set[int]] = {}
    for t in tokset:
        for key, i in prefilter.get(t, ()):
            seen.setdefault(key, set()).add(i)
    out = set(always)
    for key, ps in seen.items():
        if len(ps) == need[key]:
            out.add(key[0])
    if re_filters:
        has_long = any(len(t) > max_tok for t in tokset)
        for (qid, _j), sel in re_filters.items():
            if qid in out:
                continue
            if has_long or any(
                sel in t for t in tokset if len(t) <= max_tok
            ):
                out.add(qid)
    return out


class Monitor:
    """Standing-query registry + batch/stream matcher."""

    def __init__(
        self,
        analyzer: str = "standard",
        passes: int = 1,
        decompose_queries: bool = True,
        regexp_ngrams: bool = False,
        max_token_size: int = 30,
    ):
        self.analyzer_name = analyzer
        self.passes = passes
        # QueryDecomposer (decompose() above): on by default, as the
        # reference Monitor's default MonitorQuerySerializer path
        self.decompose_queries = decompose_queries
        # RegexpQueryHandler: fingerprint regexp arms by their longest
        # static substring instead of always-candidate
        self.regexp_ngrams = regexp_ngrams
        self.max_token_size = max_token_size
        self.queries: dict[str, Q.Query] = {}
        # original string forms, for MonitorQuerySerializer-style
        # durability (only string-registered queries are persistable —
        # the reference's fromParser contract stores the string and
        # re-parses on load, MonitorQuerySerializer.java)
        self._sources: dict[str, tuple[str, str]] = {}

    def register(self, query_id: str, q: Q.Query | str, default_field: str = "content") -> None:
        if isinstance(q, str):
            from lucene_spark.search.queryparser import QueryParser

            self._sources[query_id] = (q, default_field)
            q = QueryParser(default_field).parse(q)
        else:
            self._sources.pop(query_id, None)
        self.queries[query_id] = Q.rewrite_fixpoint(q)

    def deregister(self, query_id: str) -> None:
        """Monitor.deleteById."""
        self.queries.pop(query_id, None)
        self._sources.pop(query_id, None)

    # ---- durability (MonitorQuerySerializer.fromParser +
    # WritableQueryIndex / ReadonlyQueryIndex roles) -------------------

    def save(self, path: str) -> None:
        """Persist the registry as JSON — query strings + the monitor
        configuration, the exact information the reference's
        string-based serializer commits to its internal query index.
        Raises if any registered query was NOT built from a string
        (the serializer cannot reconstruct an arbitrary Query object —
        same failure mode as the reference without a serializer)."""
        import json as _json
        import os as _os

        missing = sorted(set(self.queries) - set(self._sources))
        if missing:
            raise ValueError(
                "cannot serialize object-registered queries: "
                + ", ".join(missing)
            )
        payload = {
            "config": {
                "analyzer": self.analyzer_name,
                "passes": self.passes,
                "decompose_queries": self.decompose_queries,
                "regexp_ngrams": self.regexp_ngrams,
                "max_token_size": self.max_token_size,
            },
            "queries": {
                qid: {"query": s, "default_field": f}
                for qid, (s, f) in sorted(self._sources.items())
            },
        }
        tmp = path + ".tmp"
        _os.makedirs(_os.path.dirname(path) or ".", exist_ok=True)
        with open(tmp, "w") as fh:
            _json.dump(payload, fh, indent=1, sort_keys=True)
        _os.replace(tmp, path)  # readable registry at every instant

    @classmethod
    def load(cls, path: str) -> "Monitor":
        """ReadonlyQueryIndex role: rebuild the monitor by re-parsing
        the persisted query strings under the persisted config."""
        import json as _json

        with open(path) as fh:
            payload = _json.load(fh)
        cfg = payload["config"]
        m = cls(
            analyzer=cfg["analyzer"],
            passes=cfg["passes"],
            decompose_queries=cfg["decompose_queries"],
            regexp_ngrams=cfg["regexp_ngrams"],
            max_token_size=cfg["max_token_size"],
        )
        for qid, spec in payload["queries"].items():
            m.register(qid, spec["query"], spec["default_field"])
        return m

    def _presearcher(self, queries: dict):
        """term -> {((query_id, sub_idx), pass_index)} + per-arm pass
        count + the always-candidate set (TermFilteredPresearcher role;
        with self.passes > 1 the MultipassTermFilteredPresearcher role
        — a doc is a candidate only if its tokens hit EVERY pass set).
        Queries are first split by the QueryDecomposer so each
        disjunction arm gets its own selective fingerprint; regexp arms
        go to the RegexpQueryHandler substring filter when enabled.
        Matching always evaluates the FULL parent query, so candidates
        only need recall 1.0, never precision."""
        prefilter: dict[str, set[tuple[tuple[str, int], int]]] = {}
        need: dict[tuple[str, int], int] = {}
        always: set[str] = set()
        re_filters: dict[tuple[str, int], str] = {}
        for qid, q in queries.items():
            subs = decompose(q) if self.decompose_queries else [q]
            for j, sub in enumerate(subs):
                if self.regexp_ngrams and isinstance(sub, Q.RegexpQuery):
                    sel = _regexp_static_substring(sub.regexp)
                    if sel:
                        re_filters[(qid, j)] = sel
                        continue
                sets = _required_term_sets(sub, self.passes)
                if not sets:
                    always.add(qid)
                    continue
                need[(qid, j)] = len(sets)
                for i, ts in enumerate(sets):
                    for t in ts:
                        prefilter.setdefault(t, set()).add(((qid, j), i))
        return prefilter, need, always, re_filters, self.max_token_size

    def match_df(self, docs: DataFrame, content_col: str = "content") -> DataFrame:
        """-> (doc_id, query_id) for every (live doc, matching standing
        query) pair. Same code path for batch and streaming inputs."""
        queries = dict(self.queries)
        analyzer_name = self.analyzer_name
        pre = self._presearcher(queries)

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            an = get_analyzer(analyzer_name)
            for pdf in batches:
                rows = []
                tok_series = an.tokenize(pdf[content_col])
                for did, toks in zip(pdf["doc_id"], tok_series):
                    tokset = set(toks)
                    cands = _candidates(tokset, pre)
                    for qid in sorted(cands):
                        if _matches(queries[qid], toks, tokset):
                            rows.append((int(did), qid))
                yield pd.DataFrame(rows, columns=["doc_id", "query_id"])

        return docs.select("doc_id", content_col).mapInPandas(
            run, schema="doc_id long, query_id string"
        )

    def match_scores_df(
        self, docs: DataFrame, content_col: str = "content",
        field: str = "content",
    ) -> DataFrame:
        """ScoringMatch matcher (monitor/ScoringMatch.java +
        CollectingMatcher): -> (doc_id, query_id, score) with the REAL
        BM25 score of each match, computed exactly like the reference —
        each streamed document becomes a one-doc in-memory index
        (monitor/DocumentBatch.java builds exactly that for singleton
        batches) and every presearcher candidate runs against it.

        Because the verification stage is a full MemoryIndex (not the
        boolean `_matches` walker), ANY engine-supported query can stand
        here — intervals, spans, sloppy phrases, multi-term rewrites —
        and scores are bit-identical to a one-doc engine search.
        Shape: one narrow mapInPandas, candidates pruned per doc by the
        broadcast term->query map; no shuffle, no driver state."""
        queries = dict(self.queries)
        analyzer_name = self.analyzer_name
        pre = self._presearcher(queries)

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from lucene_spark.memory import MemoryIndex

            an = get_analyzer(analyzer_name)
            for pdf in batches:
                rows = []
                tok_series = an.tokenize(pdf[content_col])
                for did, text, toks in zip(
                    pdf["doc_id"], pdf[content_col], tok_series
                ):
                    cands = _candidates(set(toks), pre)
                    if not cands:
                        continue
                    mi = MemoryIndex(analyzer_name)
                    mi.add_field(field, text)
                    for qid in sorted(cands):
                        s = mi.search(queries[qid])
                        if s > 0.0:
                            rows.append((int(did), qid, s))
                yield pd.DataFrame(
                    rows, columns=["doc_id", "query_id", "score"]
                ).astype({"doc_id": "int64", "score": "float32"})

        return docs.select("doc_id", content_col).mapInPandas(
            run, schema="doc_id long, query_id string, score float"
        )

    def match_highlights_df(
        self, docs: DataFrame, content_col: str = "content",
        field: str = "content",
    ) -> DataFrame:
        """HighlightsMatch matcher (monitor/HighlightsMatch.java): one
        row per (doc, matching standing query, query-term occurrence)
        with the occurrence's char span — what a reverse-search UI
        highlights in the streamed document. Same presearcher + one-doc
        MemoryIndex shape as the scoring matcher; the analyzer must
        track offsets. -> (doc_id, query_id, term, start, end)."""
        queries = dict(self.queries)
        analyzer_name = self.analyzer_name
        pre = self._presearcher(queries)

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from lucene_spark.memory import MemoryIndex

            an = get_analyzer(analyzer_name)
            for pdf in batches:
                rows = []
                tok_series = an.tokenize(pdf[content_col])
                for did, text, toks in zip(
                    pdf["doc_id"], pdf[content_col], tok_series
                ):
                    cands = _candidates(set(toks), pre)
                    if not cands:
                        continue
                    mi = MemoryIndex(analyzer_name)
                    mi.add_field(field, text)
                    for qid in sorted(cands):
                        for term, s, e in mi.match_offsets(queries[qid]):
                            rows.append((int(did), qid, term, s, e))
                yield pd.DataFrame(
                    rows,
                    columns=["doc_id", "query_id", "term", "start", "end"],
                ).astype({"doc_id": "int64", "start": "int64", "end": "int64"})

        return docs.select("doc_id", content_col).mapInPandas(
            run,
            schema="doc_id long, query_id string, term string, "
                   "start long, end long",
        )
