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
- ``DFRSimilarity`` — the full DFR grid (DFRSimilarity.java): any
  BasicModel{G, IF, In, Ine} x AfterEffect{B, L} x
  Normalization{H1, H2, H3, Z, none}; default In/L/H2.
- ``IBSimilarity`` — the full IB grid (IBSimilarity.java): any
  Distribution{LL, SPL} x Lambda{DF, TTF} x Normalization;
  default SPL/DF/H2.
- ``Axiomatic`` family — AxiomaticF{1,2,3}{EXP,LOG}.java
  (Fang & Zhai 2005), with F3's query-length gamma and the
  negative-score clamp (Axiomatic.java:116).
- ``DFISimilarity`` — DFISimilarity.java with pluggable
  Independence{Standardized, Saturated, ChiSquared}.
- ``IndriDirichletSimilarity`` — IndriDirichletSimilarity.java.
- ``RawTFSimilarity`` — RawTFSimilarity.java: boost * freq.
- ``MultiSimilarity`` — MultiSimilarity.java: mean of children.
- ``PerFieldSimilarityWrapper`` — PerFieldSimilarityWrapper.java,
  resolved per scoring leaf via ``Similarity.for_field``.

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

    def for_field(self, field: str) -> "Similarity":
        """PerFieldSimilarityWrapper hook; the base returns itself."""
        return self


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


class _BasicStats:
    """The BasicStats.java bundle every SimilarityBase component reads:
    N (docs with field), avgdl, sumTTF (numberOfFieldTokens), and the
    blended per-term df/ttf (multi-term leaves blend like the reference's
    per-term array: df = max, ttf = sum)."""

    __slots__ = ("n", "avgdl", "sum_ttf", "df", "ttf")

    def __init__(self, collection: CollectionStats, terms: list[TermStats]):
        self.n = float(collection.doc_count)
        self.sum_ttf = float(collection.sum_total_term_freq)
        self.avgdl = self.sum_ttf / self.n
        self.df = float(max(t.doc_freq for t in terms))
        self.ttf = float(sum(t.total_term_freq for t in terms))


# ---- DFR components (similarities/BasicModel*, AfterEffect*,
# Normalization* — each cites its tfn/score closed form) ----------------


class Normalization:
    """Normalization.java: tfn(stats, freq, dl)."""

    def tfn(self, st: _BasicStats, f: np.ndarray, dl: np.ndarray) -> np.ndarray:
        raise NotImplementedError


class NormalizationH1(Normalization):
    """NormalizationH1.java: tfn = freq * c * avgdl / dl."""

    def __init__(self, c: float = 1.0):
        self.c = float(c)

    def tfn(self, st, f, dl):
        return f * self.c * (st.avgdl / dl)


class NormalizationH2(Normalization):
    """NormalizationH2.java: tfn = freq * log2(1 + c * avgdl / dl)."""

    def __init__(self, c: float = 1.0):
        self.c = float(c)

    def tfn(self, st, f, dl):
        return f * np.log2(1.0 + self.c * st.avgdl / dl)


class NormalizationH3(Normalization):
    """NormalizationH3.java (Dirichlet-prior smoothing): tfn =
    (freq + mu*(ttf+1)/(sumTTF+1)) / (dl + mu) * mu."""

    def __init__(self, mu: float = 800.0):
        self.mu = float(mu)

    def tfn(self, st, f, dl):
        mu = self.mu
        return (f + mu * (st.ttf + 1.0) / (st.sum_ttf + 1.0)) / (dl + mu) * mu


class NormalizationZ(Normalization):
    """NormalizationZ.java (Pareto-Zipf): tfn = freq * (avgdl/dl)^z."""

    def __init__(self, z: float = 0.30):
        self.z = float(z)

    def tfn(self, st, f, dl):
        return f * np.power(st.avgdl / dl, self.z)


class NoNormalization(Normalization):
    """Normalization.NoNormalization: tfn = freq."""

    def tfn(self, st, f, dl):
        return f


class AfterEffect:
    """AfterEffect.java: the information-gain factor, supplied to the
    basic model pre-multiplied by (1+tfn) (scoreTimes1pTfn)."""

    def score_times_1p_tfn(self, st: _BasicStats) -> float:
        raise NotImplementedError


class AfterEffectL(AfterEffect):
    """AfterEffectL.java: 1/(1+tfn) -> scoreTimes1pTfn = 1."""

    def score_times_1p_tfn(self, st):
        return 1.0


class AfterEffectB(AfterEffect):
    """AfterEffectB.java (ratio of two Bernoulli processes):
    (F+1)/(n*(1+tfn)) -> scoreTimes1pTfn = (F+1)/n."""

    def score_times_1p_tfn(self, st):
        return (st.ttf + 1.0) / st.df


class BasicModel:
    """BasicModel.java: score(stats, tfn, aeTimes1pTfn); the after-effect
    coupling is folded in exactly as the reference does (the rewrite
    keeping score monotone in tfn for block-max safety)."""

    def score(self, st: _BasicStats, tfn: np.ndarray, ae1p: float) -> np.ndarray:
        raise NotImplementedError


class BasicModelIn(BasicModel):
    """BasicModelIn.java: tfn * log2((N+1)/(df+0.5)), composed as
    A * ae1p * (1 - 1/(1+tfn))."""

    def score(self, st, tfn, ae1p):
        a = math.log2((st.n + 1.0) / (st.df + 0.5))
        return a * ae1p * (1.0 - 1.0 / (1.0 + tfn))


class BasicModelIF(BasicModel):
    """BasicModelIF.java: tfn * log2(1 + (N+1)/(F+0.5))."""

    def score(self, st, tfn, ae1p):
        a = math.log2(1.0 + (st.n + 1.0) / (st.ttf + 0.5))
        return a * ae1p * (1.0 - 1.0 / (1.0 + tfn))


class BasicModelIne(BasicModel):
    """BasicModelIne.java: expected-df variant, ne = N*(1-((N-1)/N)^F);
    tfn * log2((N+1)/(ne+0.5))."""

    def score(self, st, tfn, ae1p):
        ne = st.n * (1.0 - ((st.n - 1.0) / st.n) ** st.ttf)
        a = math.log2((st.n + 1.0) / (ne + 0.5))
        return a * ae1p * (1.0 - 1.0 / (1.0 + tfn))


class BasicModelG(BasicModel):
    """BasicModelG.java (geometric): lambda = (F+1)/(N+F+1);
    A + B*tfn with A = log2(1+lambda), B = log2((1+lambda)/lambda),
    composed as (B - (B-A)/(1+tfn)) * ae1p."""

    def score(self, st, tfn, ae1p):
        big_f = st.ttf + 1.0
        lam = big_f / (st.n + big_f)
        a = math.log2(lam + 1.0)
        b = math.log2((1.0 + lam) / lam)
        return (b - (b - a) / (1.0 + tfn)) * ae1p


class _DFRScorer(_TableScorer):
    def __init__(self, st, model, ae, norm, boost):
        self.st, self.model, self.norm = st, model, norm
        self.ae1p = ae.score_times_1p_tfn(st)
        self.weight = np.float32(boost)

    def score(self, freqs, norm_codes):
        dl = self._lengths(norm_codes).astype(np.float64)
        f = np.asarray(freqs, dtype=np.float64)
        tfn = self.norm.tfn(self.st, f, dl)
        s = self.model.score(self.st, tfn, self.ae1p)
        return (float(self.weight) * s).astype(np.float32)


class DFRSimilarity(Similarity):
    """Divergence From Randomness framework (DFRSimilarity.java): any
    BasicModel x AfterEffect x Normalization; default In/L/H2(c) —
    the configuration round 2 shipped hardcoded."""

    def __init__(
        self,
        basic_model: BasicModel | None = None,
        after_effect: AfterEffect | None = None,
        normalization: Normalization | None = None,
        c: float = 1.0,
    ):
        self.basic_model = basic_model or BasicModelIn()
        self.after_effect = after_effect or AfterEffectL()
        self.normalization = normalization or NormalizationH2(c)

    def scorer(self, collection, terms, boost):
        st = _BasicStats(collection, terms)
        return _DFRScorer(
            st, self.basic_model, self.after_effect, self.normalization, boost
        )


# ---- IB components (Distribution*, Lambda*) ---------------------------


class Distribution:
    def score(self, tfn: np.ndarray, lam: float) -> np.ndarray:
        raise NotImplementedError


class DistributionLL(Distribution):
    """DistributionLL.java: -log(lambda/(tfn+lambda))."""

    def score(self, tfn, lam):
        return -np.log(lam / (tfn + lam))


class DistributionSPL(Distribution):
    """DistributionSPL.java: -log((lambda^(tfn/(tfn+1)) - lambda)/(1-lambda))."""

    def score(self, tfn, lam):
        return -np.log((np.power(lam, tfn / (tfn + 1.0)) - lam) / (1.0 - lam))


class LambdaDF:
    """LambdaDF.java: (df+1)/(N+1)."""

    def lam(self, st: _BasicStats) -> float:
        return (st.df + 1.0) / (st.n + 1.0)


class LambdaTTF:
    """LambdaTTF.java: (F+1)/(N+1), nudged off 1.0 for SPL."""

    def lam(self, st: _BasicStats) -> float:
        v = (st.ttf + 1.0) / (st.n + 1.0)
        return math.nextafter(v, math.inf) if v == 1.0 else v


class _IBScorer(_TableScorer):
    def __init__(self, st, dist, lam, norm, boost):
        self.st, self.dist, self.norm = st, dist, norm
        self.lam_v = lam.lam(st)
        self.weight = np.float32(boost)

    def score(self, freqs, norm_codes):
        dl = self._lengths(norm_codes).astype(np.float64)
        f = np.asarray(freqs, dtype=np.float64)
        tfn = self.norm.tfn(self.st, f, dl)
        s = self.dist.score(tfn, self.lam_v)
        return (float(self.weight) * s).astype(np.float32)


class IBSimilarity(Similarity):
    """Information-Based framework (IBSimilarity.java): any
    Distribution x Lambda x Normalization; default SPL/LambdaDF/H2(c)."""

    def __init__(
        self,
        distribution: Distribution | None = None,
        lambda_: "LambdaDF | LambdaTTF | None" = None,
        normalization: Normalization | None = None,
        c: float = 1.0,
    ):
        self.distribution = distribution or DistributionSPL()
        self.lambda_ = lambda_ or LambdaDF()
        self.normalization = normalization or NormalizationH2(c)

    def scorer(self, collection, terms, boost):
        st = _BasicStats(collection, terms)
        return _IBScorer(
            st, self.distribution, self.lambda_, self.normalization, boost
        )


# ---- Axiomatic family (Axiomatic.java + six variants) -----------------


class _AxiomaticScorer(_TableScorer):
    def __init__(self, st, sim, boost):
        self.st = st
        self.sim = sim
        self.weight = np.float32(boost)

    def score(self, freqs, norm_codes):
        dl = self._lengths(norm_codes).astype(np.float64)
        f = np.asarray(freqs, dtype=np.float64)
        x = self.sim
        s = (
            x._tf(self.st, f, dl)
            * x._ln(self.st, f, dl)
            * x._tfln(self.st, f, dl)
            * x._idf(self.st)
            - x._gamma(self.st, dl)
        ) * float(self.weight)
        # Axiomatic.java:116 — F3's gamma can push scores negative
        return np.maximum(s, 0.0).astype(np.float32)


class Axiomatic(Similarity):
    """Axiomatic retrieval (Axiomatic.java; Fang & Zhai 2005):
    score = boost * max(0, tf * ln * tfln * idf - gamma). Defaults
    s=0.25, queryLen=1, k=0.35 per Axiomatic.java:102-104."""

    def __init__(self, s: float = 0.25, query_len: int = 1, k: float = 0.35):
        self.s = float(s)
        self.query_len = int(query_len)
        self.k = float(k)

    # component slots (AxiomaticF*.java tf/ln/tfln/idf/gamma)
    def _tf(self, st, f, dl):
        return 1.0

    def _ln(self, st, f, dl):
        return 1.0

    def _tfln(self, st, f, dl):
        return 1.0

    def _idf(self, st):
        return 1.0

    def _gamma(self, st, dl):
        return 0.0

    # shared component implementations
    def _tf_log2x(self, f):
        return 1.0 + np.log(1.0 + np.log(f))

    def _ln_growth(self, st, dl):
        return (st.avgdl + self.s) / (st.avgdl + dl * self.s)

    def _tfln_sat(self, st, f, dl):
        return f / (f + self.s + self.s * dl / st.avgdl)

    def _idf_exp(self, st):
        return ((st.n + 1.0) / st.df) ** self.k

    def _idf_log(self, st):
        return math.log((st.n + 1.0) / st.df)

    def _gamma_f3(self, st, dl):
        return (dl - self.query_len) * self.s * self.query_len / st.avgdl

    def scorer(self, collection, terms, boost):
        return _AxiomaticScorer(_BasicStats(collection, terms), self, boost)


class AxiomaticF1EXP(Axiomatic):
    """AxiomaticF1EXP.java: tf=1+ln(1+ln(f)), ln=(avgdl+s)/(avgdl+dl*s),
    idf=((N+1)/df)^k."""

    def _tf(self, st, f, dl):
        return self._tf_log2x(f)

    def _ln(self, st, f, dl):
        return self._ln_growth(st, dl)

    def _idf(self, st):
        return self._idf_exp(st)


class AxiomaticF1LOG(AxiomaticF1EXP):
    """AxiomaticF1LOG.java: F1EXP with idf = ln((N+1)/df)."""

    def _idf(self, st):
        return self._idf_log(st)


class AxiomaticF2EXP(Axiomatic):
    """AxiomaticF2EXP.java: tfln = f/(f + s + s*dl/avgdl),
    idf = ((N+1)/df)^k."""

    def _tfln(self, st, f, dl):
        return self._tfln_sat(st, f, dl)

    def _idf(self, st):
        return self._idf_exp(st)


class AxiomaticF2LOG(AxiomaticF2EXP):
    """AxiomaticF2LOG.java: F2EXP with idf = ln((N+1)/df)."""

    def _idf(self, st):
        return self._idf_log(st)


class AxiomaticF3EXP(Axiomatic):
    """AxiomaticF3EXP.java: tf=1+ln(1+ln(f)), idf=((N+1)/df)^k,
    gamma=(dl-queryLen)*s*queryLen/avgdl. s=0.5 default per F3EXP."""

    def __init__(self, s: float = 0.5, query_len: int = 1, k: float = 0.35):
        super().__init__(s, query_len, k)

    def _tf(self, st, f, dl):
        return self._tf_log2x(f)

    def _idf(self, st):
        return self._idf_exp(st)

    def _gamma(self, st, dl):
        return self._gamma_f3(st, dl)


class AxiomaticF3LOG(AxiomaticF3EXP):
    """AxiomaticF3LOG.java: F3EXP with idf = ln((N+1)/df)."""

    def _idf(self, st):
        return self._idf_log(st)


# ---- DFI with pluggable independence measures -------------------------


class IndependenceStandardized:
    """IndependenceStandardized.java: (f-e)/sqrt(e)."""

    def score(self, f, e):
        return (f - e) / np.sqrt(e)


class IndependenceSaturated:
    """IndependenceSaturated.java: (f-e)/e."""

    def score(self, f, e):
        return (f - e) / e


class IndependenceChiSquared:
    """IndependenceChiSquared.java: (f-e)^2/e."""

    def score(self, f, e):
        return (f - e) * (f - e) / e


class _DFIScorer(_TableScorer):
    def __init__(self, st, independence, boost):
        self.rate = (st.ttf + 1.0) / (st.sum_ttf + 1.0)
        self.independence = independence
        self.weight = np.float32(boost)

    def score(self, freqs, norm_codes):
        dl = self._lengths(norm_codes).astype(np.float64)
        f = np.asarray(freqs, dtype=np.float64)
        e = self.rate * dl
        m = self.independence.score(f, e)
        out = np.where(f > e, np.log2(np.maximum(m, 0.0) + 1.0), 0.0)
        return (float(self.weight) * out).astype(np.float32)


class DFISimilarity(Similarity):
    """Divergence From Independence (DFISimilarity.java): expected =
    (ttf+1) * dl / (sumTTF+1); score = boost * log2(measure + 1) when
    freq exceeds expectation, else 0; measure pluggable
    (Independence{Standardized,Saturated,ChiSquared})."""

    def __init__(self, independence=None):
        self.independence = independence or IndependenceStandardized()

    def scorer(self, collection, terms, boost):
        return _DFIScorer(_BasicStats(collection, terms), self.independence, boost)


# ---- remaining package surface ----------------------------------------


class _IndriScorer(_TableScorer):
    def __init__(self, mu, p_wc, boost):
        self.mu, self.p_wc = float(mu), float(p_wc)
        self.weight = np.float32(boost)

    def score(self, freqs, norm_codes):
        dl = self._lengths(norm_codes).astype(np.float64)
        f = np.asarray(freqs, dtype=np.float64)
        s = np.log((f + self.mu * self.p_wc) / (dl + self.mu))
        return (float(self.weight) * s).astype(np.float32)


class IndriDirichletSimilarity(Similarity):
    """IndriDirichletSimilarity.java: score = log((freq + mu*P(w|C)) /
    (dl + mu)) with Indri's collection model P(w|C) = (ttf+1)/(sumTTF+1)
    (LMSimilarity.DefaultCollectionModel uses ttf/sumTTF; Indri ships
    its own +1-smoothed model)."""

    def __init__(self, mu: float = 2000.0):
        self.mu = float(mu)

    def scorer(self, collection, terms, boost):
        st = _BasicStats(collection, terms)
        p_wc = (st.ttf + 1.0) / (st.sum_ttf + 1.0)
        return _IndriScorer(self.mu, p_wc, boost)


class _SweetSpotScorer(_TableScorer):
    def __init__(self, idf, boost, ln_min, ln_max, steepness,
                 tf_base, tf_min, hyper):
        self.weight = np.float32(np.float32(boost) * np.float32(idf))
        self.ln_min = float(ln_min)
        self.ln_max = float(ln_max)
        self.steepness = float(steepness)
        self.tf_base = float(tf_base)
        self.tf_min = float(tf_min)
        self.hyper = hyper  # None or (min, max, base, xoffset)

    def _tf(self, f: np.ndarray) -> np.ndarray:
        if self.hyper is not None:
            mn, mx, base, xoff = self.hyper
            t = np.tanh((f - xoff) * math.log(base))
            tf = mn + (mx - mn) / 2.0 * (t + 1.0)
        else:
            tf = np.where(
                f <= self.tf_min,
                self.tf_base,
                np.sqrt(f + self.tf_base * self.tf_base - self.tf_min),
            )
        return np.where(f == 0.0, 0.0, tf)

    def score(self, freqs, norm_codes):
        f = np.asarray(freqs, dtype=np.float64)
        ln = self._lengths(norm_codes).astype(np.float64)
        norm = 1.0 / np.sqrt(
            self.steepness
            * (np.abs(ln - self.ln_min) + np.abs(ln - self.ln_max)
               - (self.ln_max - self.ln_min))
            + 1.0
        )
        return (float(self.weight) * self._tf(f) * norm).astype(np.float32)

    def max_score(self, freqs, norm_codes):
        # the plateau makes lengthNorm NON-monotone in doc length, so
        # the stored impact pairs (a pareto frontier assuming low norm
        # is best) cannot be evaluated directly; bound with the
        # plateau's norm == 1.0 at the block's max freq (tf monotone)
        if len(freqs) == 0:
            return np.float32(0.0)
        fmax = np.asarray([np.asarray(freqs).max()], dtype=np.float64)
        return np.float32(float(self.weight) * self._tf(fmax)[0])


class SweetSpotSimilarity(Similarity):
    """SweetSpotSimilarity (misc/.../SweetSpotSimilarity.java): Classic
    TF-IDF with a length-norm PLATEAU — docs whose length falls in
    [ln_min, ln_max] get norm 1.0, outside it decays as
    1/sqrt(steepness*(|l-min|+|l-max|-(max-min))+1) — and a choice of
    baselineTf (flat `base` up to tf_min, then sqrt) or hyperbolicTf
    (tanh ramp between hyper_min and hyper_max centered at xoffset).
    Defaults reproduce the reference's: plateau [1,1], steepness 0.5,
    baseline tf with base=0/min=0 (== sqrt(freq))."""

    def __init__(self, ln_min: int = 1, ln_max: int = 1,
                 steepness: float = 0.5, tf_base: float = 0.0,
                 tf_min: float = 0.0, hyper: tuple | None = None):
        self.params = (ln_min, ln_max, steepness, tf_base, tf_min, hyper)

    def scorer(self, collection, terms, boost):
        idf = sum(
            math.log((collection.doc_count + 1) / (t.doc_freq + 1)) + 1.0
            for t in terms
        )
        return _SweetSpotScorer(idf, boost, *self.params)


class _RawTFScorer(_TableScorer):
    def __init__(self, boost):
        self.weight = np.float32(boost)

    def score(self, freqs, norm_codes):
        return (
            float(self.weight) * np.asarray(freqs, dtype=np.float64)
        ).astype(np.float32)


class RawTFSimilarity(Similarity):
    """RawTFSimilarity.java: score = boost * freq."""

    def scorer(self, collection, terms, boost):
        return _RawTFScorer(boost)


class _MultiScorer(_TableScorer):
    def __init__(self, subs):
        self.subs = subs
        self.weight = np.float32(np.mean([s.weight for s in subs]))

    def score(self, freqs, norm_codes):
        total = self.subs[0].score(freqs, norm_codes).astype(np.float64)
        for s in self.subs[1:]:
            total += s.score(freqs, norm_codes)
        return (total / len(self.subs)).astype(np.float32)


class MultiSimilarity(Similarity):
    """MultiSimilarity.java: the arithmetic mean of the sub-similarities'
    scores (MultiSimScorer.score sums and divides by count)."""

    def __init__(self, sims: list[Similarity]):
        if not sims:
            raise ValueError("MultiSimilarity needs at least one child")
        self.sims = list(sims)

    def scorer(self, collection, terms, boost):
        return _MultiScorer([s.scorer(collection, terms, boost) for s in self.sims])


class PerFieldSimilarityWrapper(Similarity):
    """PerFieldSimilarityWrapper.java: route each field to its own
    Similarity. IndexSearcher resolves ``for_field`` at every scoring
    leaf, so one query may mix similarities across fields."""

    def __init__(self, default: Similarity, per_field: dict | None = None):
        self.default = default
        self.per_field = dict(per_field or {})

    def get(self, field: str) -> Similarity:
        return self.per_field.get(field, self.default)

    def for_field(self, field: str) -> Similarity:
        return self.get(field)

    def scorer(self, collection, terms, boost):  # pragma: no cover
        raise TypeError(
            "PerFieldSimilarityWrapper must be resolved via for_field()"
        )
