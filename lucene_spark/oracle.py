"""Naive full-scan BM25 oracle — the CheckHits analog (SURVEY.md §5).

Scores every document by brute force (no index, no pruning) with the
same float32 math (bm25.py), same norm quantization (smallfloat.py) and
the same (score DESC, doc_id ASC) tie-break as the engine
(TopScoreDocCollector.java:23-33). Engine results must be rank- and
score-identical to this, pruned or not.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_spark.analysis import Analyzer
from lucene_spark.search import query as Q
from lucene_spark.search.bm25 import BM25Scorer, CollectionStats, TermStats
from lucene_spark.util.smallfloat import int_to_byte4_vec


class OracleIndex:
    """In-memory corpus: doc_id -> token list."""

    def __init__(self, doc_ids: np.ndarray, texts: list[str], analyzer: Analyzer):
        self.doc_ids = np.asarray(doc_ids, dtype=np.int64)
        order = np.argsort(self.doc_ids)
        self.doc_ids = self.doc_ids[order]
        self.tokens = [analyzer.tokenize_one(texts[i] or "") for i in order]
        lens = np.array([len(t) for t in self.tokens], dtype=np.int64)
        self.norm_codes = int_to_byte4_vec(lens).astype(np.int64)
        self.coll = CollectionStats(
            max_doc=int(self.doc_ids.max()) + 1 if len(self.doc_ids) else 0,
            doc_count=len(self.doc_ids),
            sum_total_term_freq=int(lens.sum()),
            sum_doc_freq=int(lens.sum()),
        )
        self._counts = [pd.Series(t).value_counts() if t else pd.Series(dtype=int) for t in self.tokens]

    def term_stats(self, term: str) -> TermStats:
        df = sum(1 for c in self._counts if term in c.index)
        ttf = sum(int(c.get(term, 0)) for c in self._counts)
        return TermStats(doc_freq=df, total_term_freq=ttf)

    def freq(self, term: str) -> np.ndarray:
        return np.array([int(c.get(term, 0)) for c in self._counts], dtype=np.int64)

    def phrase_freq(self, terms: list[str]) -> np.ndarray:
        out = np.zeros(len(self.tokens), dtype=np.int64)
        for i, toks in enumerate(self.tokens):
            n = 0
            for j in range(len(toks) - len(terms) + 1):
                if toks[j : j + len(terms)] == list(terms):
                    n += 1
            out[i] = n
        return out

    def vocab(self) -> list[str]:
        v: set[str] = set()
        for c in self._counts:
            v |= set(c.index)
        return sorted(v)


def _scores(oracle: OracleIndex, q: Q.Query, boost: float = 1.0):
    """-> (match bool array, float32 score array) over all docs."""
    n = len(oracle.doc_ids)
    if isinstance(q, Q.MatchNoDocsQuery):
        return np.zeros(n, bool), np.zeros(n, np.float32)
    if isinstance(q, Q.MatchAllQuery):
        return np.ones(n, bool), np.full(n, np.float32(boost * q.boost))
    if isinstance(q, Q.TermQuery):
        st = oracle.term_stats(q.term)
        if st.doc_freq == 0:
            return np.zeros(n, bool), np.zeros(n, np.float32)
        sc = BM25Scorer(oracle.coll, [st], boost=boost * q.boost)
        f = oracle.freq(q.term)
        s = sc.score(f, oracle.norm_codes)
        return f > 0, np.where(f > 0, s, np.float32(0))
    if isinstance(q, Q.SynonymQuery):
        sts = {t: oracle.term_stats(t) for t in q.terms}
        present = [t for t in q.terms if sts[t].doc_freq > 0]
        if not present:
            return np.zeros(n, bool), np.zeros(n, np.float32)
        blended = TermStats(
            doc_freq=max(sts[t].doc_freq for t in present),
            total_term_freq=sum(sts[t].total_term_freq for t in present),
        )
        sc = BM25Scorer(oracle.coll, [blended], boost=boost * q.boost)
        f = np.sum([oracle.freq(t) for t in present], axis=0)
        s = sc.score(f, oracle.norm_codes)
        return f > 0, np.where(f > 0, s, np.float32(0))
    if isinstance(q, Q.PhraseQuery):
        sts = [oracle.term_stats(t) for t in q.terms]
        if any(s.doc_freq == 0 for s in sts):
            return np.zeros(n, bool), np.zeros(n, np.float32)
        sc = BM25Scorer(oracle.coll, sts, boost=boost * q.boost)
        f = oracle.phrase_freq(list(q.terms))
        s = sc.score(f, oracle.norm_codes)
        return f > 0, np.where(f > 0, s, np.float32(0))
    if isinstance(q, (Q.PrefixQuery, Q.WildcardQuery, Q.RegexpQuery,
                      Q.FuzzyQuery, Q.TermRangeQuery, Q.TermInSetQuery)):
        terms = _expand_oracle(oracle, q)
        match = np.zeros(n, bool)
        for t in terms:
            match |= oracle.freq(t) > 0
        w = np.float32(boost * q.boost)
        return match, np.where(match, w, np.float32(0))
    if isinstance(q, Q.ConstantScoreQuery):
        m, _ = _scores(oracle, q.query, 1.0)
        w = np.float32(boost * q.boost)
        return m, np.where(m, w, np.float32(0))
    if isinstance(q, Q.BoostQuery):
        return _scores(oracle, q.query, boost * q.boost)
    if isinstance(q, Q.DisjunctionMaxQuery):
        ms, ss = zip(*(_scores(oracle, s, boost) for s in q.queries))
        match = np.logical_or.reduce(ms)
        stack = np.stack(ss).astype(np.float64)
        smax = stack.max(axis=0)
        ssum = stack.sum(axis=0)
        out = (smax + q.tie_breaker * (ssum - smax)).astype(np.float32)
        return match, np.where(match, out, np.float32(0))
    if isinstance(q, Q.BooleanQuery):
        must = [_scores(oracle, s, boost) for s in q.must]
        filt = [_scores(oracle, s, boost) for s in q.filter]
        should = [_scores(oracle, s, boost) for s in q.should]
        must_not = [_scores(oracle, s, boost) for s in q.must_not]
        match = np.ones(n, bool)
        for m, _ in must + filt:
            match &= m
        if should:
            cnt = np.sum([m for m, _ in should], axis=0)
            need = q.min_should if (q.must or q.filter) else max(1, q.min_should)
            if not (q.must or q.filter):
                match &= cnt >= need
            elif q.min_should > 0:
                match &= cnt >= q.min_should
        for m, _ in must_not:
            match &= ~m
        acc = np.zeros(n, dtype=np.float64)
        for m, s in must:
            acc += s.astype(np.float64)
        for m, s in should:
            acc += np.where(m, s, 0).astype(np.float64)
        return match, np.where(match, acc.astype(np.float32), np.float32(0))
    raise TypeError(type(q).__name__)


def _expand_oracle(oracle: OracleIndex, q: Q.Query) -> list[str]:
    import fnmatch as fn
    import re as _re
    vocab = oracle.vocab()
    if isinstance(q, Q.PrefixQuery):
        return [t for t in vocab if t.startswith(q.prefix)]
    if isinstance(q, Q.WildcardQuery):
        return [t for t in vocab if fn.fnmatchcase(t, q.pattern)]
    if isinstance(q, Q.RegexpQuery):
        rx = _re.compile(f"^(?:{q.regexp})$")
        return [t for t in vocab if rx.match(t)]
    if isinstance(q, Q.FuzzyQuery):
        return [
            t for t in vocab
            if t.startswith(q.term[: q.prefix_length]) and _lev(t, q.term) <= q.max_edits
        ]
    if isinstance(q, Q.TermRangeQuery):
        out = vocab
        if q.lower is not None:
            out = [t for t in out if (t >= q.lower if q.include_lower else t > q.lower)]
        if q.upper is not None:
            out = [t for t in out if (t <= q.upper if q.include_upper else t < q.upper)]
        return out
    if isinstance(q, Q.TermInSetQuery):
        return list(q.terms)
    raise TypeError(type(q).__name__)


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def search(oracle: OracleIndex, q: Q.Query, k: int = 10) -> Q.TopDocs:
    q = Q.rewrite_fixpoint(q)
    match, scores = _scores(oracle, q)
    idx = np.where(match)[0]
    if len(idx) == 0:
        return Q.TopDocs(total_hits=0, hits=[])
    d = oracle.doc_ids[idx]
    s = scores[idx].astype(np.float32)
    order = np.lexsort((d, -s))[:k]
    return Q.TopDocs(
        total_hits=len(idx),
        hits=[Q.TopDoc(int(d[i]), float(s[i])) for i in order],
    )
