"""Pluggable Similarity — the reference's similarities/ package as an
injection point (SURVEY.md §2.7).

Reference surface (core/src/java/org/apache/lucene/search/similarities/):
``Similarity`` produces a ``SimScorer`` per (collection stats, term
stats, boost); ``IndexSearcher`` threads one similarity through every
scoring leaf. We mirror exactly that contract: ``IndexSearcher(reader,
similarity=...)`` hands each compiled leaf node a picklable SimScorer
whose ``score(freqs, norm_codes)`` is a vectorized numpy kernel — the
per-segment applyInPandas executor calls it on Arrow batches, so a new
similarity never touches the kernel plumbing.

Implemented (each cites its reference formula):

- ``BM25Similarity`` — BM25Similarity.java; delegates to the float32-
  exact ``BM25Scorer`` (bm25.py), the engine default.
- ``ClassicSimilarity`` — ClassicSimilarity.java / TFIDFSimilarity.java:
  idf = ln((docCount+1)/(docFreq+1)) + 1, tf = sqrt(freq),
  lengthNorm = 1/sqrt(dl); score = boost * idf * tf * lengthNorm.
- ``LMDirichletSimilarity`` — LMDirichletSimilarity.java:
  score = boost * (log(1 + freq/(mu*P(w|C))) + log(mu/(dl+mu))).
- ``LMJelinekMercerSimilarity`` — LMJelinekMercerSimilarity.java:
  score = boost * log(1 + ((1-lambda)*freq/dl) / (lambda*P(w|C))).
- ``BooleanSimilarity`` — BooleanSimilarity.java: score = boost,
  freq- and length-independent.
- ``DFRSimilarity`` — DFRSimilarity.java with BasicModelIn /
  AfterEffectL / NormalizationH2.
- ``IBSimilarity`` — IBSimilarity.java with DistributionSPL /
  LambdaDF / NormalizationH2.
- ``AxiomaticF2EXP`` — AxiomaticF2EXP.java (Fang & Zhai's F2-EXP).
- ``DFISimilarity`` — DFISimilarity.java, standardized independence
  measure.

All non-BM25 scorers decode the quantized doc length through the shared
256-entry ``LENGTH_TABLE`` (SmallFloat), exactly as the reference: every
similarity reads the norms the codec stored, none re-reads raw lengths.
Scores are float32 (the Java ``float score`` contract). Block-max
bounds come from ``max_score`` over the stored impact (freq, norm)
pairs — valid for every similarity here because each is monotone
non-decreasing in freq and non-increasing in doc length, so the impact
pareto frontier covers the block maximum.
"""

from __future__ import annotations

import math

import numpy as np

from lucene_spark.search.bm25 import (
    BM25Scorer,
    CollectionStats,
    K1_DEFAULT,
    B_DEFAULT,
    TermStats,
)
from lucene_spark.util.smallfloat import LENGTH_TABLE


class Similarity:
    """Factory contract: one SimScorer per compiled scoring leaf."""

    def scorer(
        self, collection: CollectionStats, terms: list[TermStats], boost: float
    ):
        raise NotImplementedError


class _TableScorer:
    """Shared shape for table-driven scorers: a per-norm-code float32
    multiplier table plus a weight; subclasses define score()."""

    def _lengths(self, norm_codes: np.ndarray) -> np.ndarray:
        return LENGTH_TABLE[np.asarray(norm_codes, dtype=np.int64) & 0xFF]

    def max_score(self, freqs: np.ndarray, norm_codes: np.ndarray) -> np.float32:
        if len(freqs) == 0:
            return np.float32(0.0)
        return np.float32(self.score(freqs, norm_codes).max())


class BM25Similarity(Similarity):
    def __init__(self, k1: float = K1_DEFAULT, b: float = B_DEFAULT):
        self.k1 = float(k1)
        self.b = float(b)

    def scorer(self, collection, terms, boost):
        return BM25Scorer(collection, terms, self.k1, self.b, boost)


class _ClassicScorer(_TableScorer):
    def __init__(self, idf: float, boost: float):
        self.idf = np.float32(idf)
        self.weight = np.float32(np.float32(boost) * np.float32(idf))

    def score(self, freqs, norm_codes):
        tf = np.sqrt(np.asarray(freqs, dtype=np.float32))
        inv_len = (
            np.float32(1.0)
            / np.sqrt(self._lengths(norm_codes).astype(np.float32))
        )
        return (self.weight * tf * inv_len).astype(np.float32)


class ClassicSimilarity(Similarity):
    """TF-IDF (ClassicSimilarity.java): idf summed over phrase terms,
    like the reference's idfExplain over term arrays."""

    def scorer(self, collection, terms, boost):
        idf = sum(
            math.log((collection.doc_count + 1) / (t.doc_freq + 1)) + 1.0
            for t in terms
        )
        return _ClassicScorer(idf, boost)


class _LMDirichletScorer(_TableScorer):
    def __init__(self, mu: float, p_w: float, boost: float):
        self.mu = np.float32(mu)
        self.p_w = float(p_w)
        self.weight = np.float32(boost)

    def score(self, freqs, norm_codes):
        dl = self._lengths(norm_codes).astype(np.float64)
        f = np.asarray(freqs, dtype=np.float64)
        mu = float(self.mu)
        s = np.log(1.0 + f / (mu * self.p_w)) + np.log(mu / (dl + mu))
        return (float(self.weight) * s).astype(np.float32)


class LMDirichletSimilarity(Similarity):
    def __init__(self, mu: float = 2000.0):
        self.mu = float(mu)

    def scorer(self, collection, terms, boost):
        ttf = sum(t.total_term_freq for t in terms)
        p_w = ttf / float(collection.sum_total_term_freq)
        return _LMDirichletScorer(self.mu, p_w, boost)


class _LMJelinekMercerScorer(_TableScorer):
    def __init__(self, lam: float, p_w: float, boost: float):
        self.lam = float(lam)
        self.p_w = float(p_w)
        self.weight = np.float32(boost)

    def score(self, freqs, norm_codes):
        dl = self._lengths(norm_codes).astype(np.float64)
        f = np.asarray(freqs, dtype=np.float64)
        s = np.log(1.0 + ((1.0 - self.lam) * f / dl) / (self.lam * self.p_w))
        return (float(self.weight) * s).astype(np.float32)


class LMJelinekMercerSimilarity(Similarity):
    def __init__(self, lam: float = 0.1):
        self.lam = float(lam)

    def scorer(self, collection, terms, boost):
        ttf = sum(t.total_term_freq for t in terms)
        p_w = ttf / float(collection.sum_total_term_freq)
        return _LMJelinekMercerScorer(self.lam, p_w, boost)


class _BooleanScorer(_TableScorer):
    def __init__(self, boost: float):
        self.weight = np.float32(boost)

    def score(self, freqs, norm_codes):
        return np.full(len(freqs), self.weight, dtype=np.float32)


class BooleanSimilarity(Similarity):
    def scorer(self, collection, terms, boost):
        return _BooleanScorer(boost)


class _TfnScorer(_TableScorer):
    """Shared H2-normalized-tf base (NormalizationH2.java):
    tfn = freq * log2(1 + c * avgdl / dl)."""

    def __init__(self, collection: CollectionStats, c: float, boost: float):
        self.avgdl = collection.sum_total_term_freq / float(
            collection.doc_count
        )
        self.c = float(c)
        self.weight = np.float32(boost)

    def _tfn(self, freqs, norm_codes):
        dl = self._lengths(norm_codes).astype(np.float64)
        f = np.asarray(freqs, dtype=np.float64)
        return f * np.log2(1.0 + self.c * self.avgdl / dl)


class _DFRInL2Scorer(_TfnScorer):
    def __init__(self, collection, df: int, c: float, boost: float):
        super().__init__(collection, c, boost)
        self.idf2 = math.log2((collection.doc_count + 1) / (df + 0.5))

    def score(self, freqs, norm_codes):
        tfn = self._tfn(freqs, norm_codes)
        s = (tfn / (1.0 + tfn)) * self.idf2
        return (float(self.weight) * s).astype(np.float32)


class DFRSimilarity(Similarity):
    """Divergence From Randomness, the In/L/H2 configuration
    (DFRSimilarity.java composing BasicModelIn.java [inf1 =
    tfn * log2((N+1)/(df+0.5))], AfterEffectL.java [1/(1+tfn)],
    NormalizationH2.java [tfn = freq*log2(1 + c*avgdl/dl)]):
    score = boost * tfn/(1+tfn) * log2((N+1)/(df+0.5))."""

    def __init__(self, c: float = 1.0):
        self.c = float(c)

    def scorer(self, collection, terms, boost):
        df = max(t.doc_freq for t in terms)
        return _DFRInL2Scorer(collection, df, self.c, boost)


class _IBSPLScorer(_TfnScorer):
    def __init__(self, collection, df: int, c: float, boost: float):
        super().__init__(collection, c, boost)
        self.lam = (df + 1.0) / (collection.doc_count + 1.0)

    def score(self, freqs, norm_codes):
        tfn = self._tfn(freqs, norm_codes)
        lam = self.lam
        s = -np.log((np.power(lam, tfn / (tfn + 1.0)) - lam) / (1.0 - lam))
        return (float(self.weight) * s).astype(np.float32)


class IBSimilarity(Similarity):
    """Information-Based model, SPL/LambdaDF/H2 (IBSimilarity.java
    composing DistributionSPL.java [-log((lambda^(tfn/(tfn+1)) -
    lambda)/(1-lambda))], LambdaDF.java [(df+1)/(N+1)],
    NormalizationH2.java)."""

    def __init__(self, c: float = 1.0):
        self.c = float(c)

    def scorer(self, collection, terms, boost):
        df = max(t.doc_freq for t in terms)
        return _IBSPLScorer(collection, df, self.c, boost)


class _AxiomaticF2EXPScorer(_TableScorer):
    def __init__(self, collection, df: int, s: float, k: float, boost: float):
        self.avgdl = collection.sum_total_term_freq / float(
            collection.doc_count
        )
        self.gamma = ((collection.doc_count + 1.0) / df) ** k
        self.s = float(s)
        self.weight = np.float32(boost)

    def score(self, freqs, norm_codes):
        dl = self._lengths(norm_codes).astype(np.float64)
        f = np.asarray(freqs, dtype=np.float64)
        s_ = self.s
        out = self.gamma * f / (f + s_ + s_ * dl / self.avgdl)
        return (float(self.weight) * out).astype(np.float32)


class AxiomaticF2EXP(Similarity):
    """Axiomatic F2-EXP (AxiomaticF2EXP.java; Fang & Zhai 2005):
    score = boost * ((N+1)/df)^k * freq/(freq + s + s*dl/avgdl),
    s = 0.5, k = 0.35."""

    def __init__(self, s: float = 0.5, k: float = 0.35):
        self.s = float(s)
        self.k = float(k)

    def scorer(self, collection, terms, boost):
        df = max(t.doc_freq for t in terms)
        return _AxiomaticF2EXPScorer(collection, df, self.s, self.k, boost)


class _DFIScorer(_TableScorer):
    def __init__(self, collection, ttf: int, boost: float):
        self.rate = ttf / float(collection.sum_total_term_freq)
        self.weight = np.float32(boost)

    def score(self, freqs, norm_codes):
        dl = self._lengths(norm_codes).astype(np.float64)
        f = np.asarray(freqs, dtype=np.float64)
        e = self.rate * dl
        m = (f - e) / np.sqrt(e)
        out = np.where(f > e, np.log2(np.maximum(m, 0.0) + 1.0), 0.0)
        return (float(self.weight) * out).astype(np.float32)


class DFISimilarity(Similarity):
    """Divergence From Independence, standardized measure
    (DFISimilarity.java + IndependenceStandardized.java): expected =
    ttf * dl / sumTotalTermFreq; score = boost * log2(1 +
    (freq - expected)/sqrt(expected)) when freq exceeds expectation,
    else 0 (frequencies at or below chance carry no information)."""

    def scorer(self, collection, terms, boost):
        ttf = sum(t.total_term_freq for t in terms)
        return _DFIScorer(collection, ttf, boost)
