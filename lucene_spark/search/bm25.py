"""BM25 scoring kernel — float32-exact replication of Lucene's BM25Similarity.

Semantics (lucene/core/src/java/org/apache/lucene/search/similarities/
BM25Similarity.java):

- ``idf = (float) log(1 + (docCount - docFreq + 0.5) / (docFreq + 0.5))``
  computed in float64, cast to float32 (:101-104).
- multi-term idf = float64 sum of the per-term *float32* idfs, cast back
  to float32 (:162-171, "sum into a double before casting into a float").
- ``avgdl = (float) (sumTotalTermFreq / (double) docCount)`` (:107-109).
- a 256-entry float32 cache ``1f / (k1 * ((1 - b) + b * LENGTH_TABLE[i]
  / avgdl))`` over the SmallFloat-decoded norm bytes (:181-185).
- ``score(freq, norm) = weight - weight / (1 + freq * cache[norm])`` with
  ``weight = boost * idf`` — the monotonicity-preserving float32 rewrite
  (:221-238). Every op stays in binary32.

All of this is IEEE-754 binary32 with round-to-nearest-even in both the
JVM and numpy, so replicating the op order reproduces bit-identical
floats.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from lucene_spark.util.smallfloat import LENGTH_TABLE

K1_DEFAULT = 1.2
B_DEFAULT = 0.75


def idf_f32(doc_freq: int, doc_count: int) -> np.float32:
    """Per-term idf, float64 log then cast to float32."""
    return np.float32(math.log(1.0 + (doc_count - doc_freq + 0.5) / (doc_freq + 0.5)))


def idf_sum_f32(idfs: list[np.float32]) -> np.float32:
    """Phrase/synonym idf: float64 sum of float32 idfs, cast to float32."""
    acc = 0.0
    for v in idfs:
        acc += float(np.float32(v))
    return np.float32(acc)


@dataclass(frozen=True)
class CollectionStats:
    """CollectionStatistics (IndexSearcher.java:1134-1149): per-field,
    summed across all segments."""

    max_doc: int
    doc_count: int
    sum_total_term_freq: int
    sum_doc_freq: int


@dataclass(frozen=True)
class TermStats:
    """TermStatistics (IndexSearcher.java:1119-1123)."""

    doc_freq: int
    total_term_freq: int


class BM25Scorer:
    """The SimScorer analog: precomputes weight and the norm-inverse cache.

    Vectorized over numpy arrays — the analog of BulkSimScorer.score
    (BM25Similarity.java:241-261), which is the auto-vectorized JVM loop.
    """

    def __init__(
        self,
        collection: CollectionStats,
        terms: list[TermStats],
        k1: float = K1_DEFAULT,
        b: float = B_DEFAULT,
        boost: float = 1.0,
    ) -> None:
        if len(terms) == 1:
            idf = idf_f32(terms[0].doc_freq, collection.doc_count)
        else:
            idf = idf_sum_f32(
                [idf_f32(t.doc_freq, collection.doc_count) for t in terms]
            )
        self.idf = idf
        # avgdl: double division cast to float (:107-109)
        self.avgdl = np.float32(
            collection.sum_total_term_freq / float(collection.doc_count)
        )
        k1f = np.float32(k1)
        bf = np.float32(b)
        one = np.float32(1.0)
        # cache[i] = 1f / (k1 * ((1-b) + b * LENGTH_TABLE[i] / avgdl)),
        # strictly in float32 op order: ((b*L)/avgdl) per Java left-to-right.
        length_f32 = LENGTH_TABLE.astype(np.float32)
        denom = k1f * ((one - bf) + (bf * length_f32) / self.avgdl)
        self.cache = (one / denom).astype(np.float32)
        self.weight = np.float32(np.float32(boost) * idf)

    def score(self, freqs: np.ndarray, norm_codes: np.ndarray) -> np.ndarray:
        """score = weight - weight / (1 + freq * normInverse), float32."""
        norm_inv = self.cache[np.asarray(norm_codes, dtype=np.int64) & 0xFF]
        freqs32 = np.asarray(freqs, dtype=np.float32)
        one = np.float32(1.0)
        return (self.weight - self.weight / (one + freqs32 * norm_inv)).astype(
            np.float32
        )

    def max_score(self, freqs: np.ndarray, norm_codes: np.ndarray) -> np.float32:
        """Block-max bound: max score over the impact (freq, norm) pairs —
        the ImpactsDISI.getMaxScore analog (CORE/search/ImpactsDISI.java:60-97).
        """
        if len(freqs) == 0:
            return np.float32(0.0)
        return np.float32(self.score(freqs, norm_codes).max())
