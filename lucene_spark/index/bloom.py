"""Bloom postings sidecar — the BloomFilteringPostingsFormat role
(reference codecs/src/java/org/apache/lucene/codecs/bloom/
BloomFilteringPostingsFormat.java + FuzzySet.java).

The reference wraps a delegate postings format and keeps one
right-sized single-hash bitset per (segment, field); ``seekExact`` on
a term first asks the bitset and skips the term-dictionary seek when
the bit is clear — the primary-key-lookup / absent-term fast path.
This module keeps exactly that contract on Spark's layout:

- the **delegate** is whatever postings format the index already uses
  (the sidecar never touches postings bytes — formats.py stays the
  single owner of the blob layout);
- the **bitset per (segment, field)** is built in ONE distributed pass
  over the term dictionary (``applyInPandas`` per segment — numpy bit
  ops, no per-row Python) and stored as a parquet sidecar table plus a
  generation-stamped meta file;
- the **seekExact gate** becomes a driver-side segment prune: before a
  term query's postings scan is planned, segments whose bitsets clear
  every query term are dropped from the scan (and an all-clear answer
  short-circuits to an empty result with NO Spark job at all).

FuzzySet semantics kept: a single hash function per term (not a
k-hash Bloom — FuzzySet.java uses one MurmurHash position per value),
bitset sized per segment so the expected saturation stays at the
target (default 10%, FuzzySet's default), power-of-two lengths so the
position is a mask. False-positive rate == saturation; false
negatives are impossible for any term the segment wrote.

Staleness: the sidecar records the manifest generation it was built
from. A reader over any OTHER generation ignores it (returns "no
information"), so commits after the build degrade to a full scan, never
to a wrong answer — the same fail-open contract as the reference's
per-segment files, which are simply rebuilt by the next merge.

100-TB shape: the build is one narrow pass over the term dictionary
(no shuffle beyond the existing segment partitioning); the sidecar is
O(segments x bits/8) ~ 128 KB per 1M-term segment; lookups are driver
bit-math with zero cluster I/O for absent terms. The in-heap cache is
byte-bounded (``MAX_CACHE_BYTES``) and falls open when exceeded.
"""

from __future__ import annotations

import json
import math
import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.analysis.minhash import murmur3_x64_128
from lucene_spark.index import manifest as mani

__all__ = [
    "bits_for",
    "term_position",
    "write_bloom_sidecar",
    "BloomSidecar",
]

_DIR = "blooms"
_META = "_bloom_meta.json"
DEFAULT_SATURATION = 0.10
MAX_CACHE_BYTES = 512 << 20


def bits_for(n_terms: int, saturation: float = DEFAULT_SATURATION) -> int:
    """Power-of-two bitset length whose expected saturation after
    ``n_terms`` single-hash inserts stays <= ``saturation``
    (E[frac set] = 1 - e^(-n/m) -> m >= n / -ln(1 - s))."""
    if not 0 < saturation < 1:
        raise ValueError("saturation must be in (0, 1)")
    need = max(64, int(math.ceil(n_terms / -math.log(1.0 - saturation))))
    return 1 << (need - 1).bit_length()


def term_position(field: str, term: str) -> int:
    """Unmasked 64-bit hash position of a (field, term) value —
    murmur3 x64-128's first word over the NUL-joined UTF-8 bytes."""
    return murmur3_x64_128(f"{field}\x00{term}".encode("utf-8"))[0]


def write_bloom_sidecar(
    spark: SparkSession,
    index_dir: str,
    saturation: float = DEFAULT_SATURATION,
) -> dict:
    """Build the sidecar for the index's CURRENT committed generation:
    one bitset row per live (segment, field), one pass over the term
    dictionary. Returns the meta dict."""
    m = mani.read_manifest(index_dir)
    live = mani.live_segment_ids(m)
    post = spark.read.parquet(f"{index_dir}/postings").select(
        "segment_id", "field", "term"
    )
    if live is not None:
        post = post.filter(F.col("segment_id").isin(sorted(live)))

    def _build(pdf: pd.DataFrame) -> pd.DataFrame:
        out = []
        for (seg, field), grp in pdf.groupby(["segment_id", "field"]):
            terms = grp["term"].unique()
            nbits = bits_for(len(terms), saturation)
            bits = np.zeros(nbits >> 3, dtype=np.uint8)
            for t in terms:
                p = term_position(field, t) & (nbits - 1)
                bits[p >> 3] |= 1 << (p & 7)
            out.append((seg, field, nbits, int(len(terms)), bits.tobytes()))
        return pd.DataFrame(
            out,
            columns=["segment_id", "field", "num_bits", "num_terms", "bits"],
        )

    schema = (
        "segment_id string, field string, num_bits long, "
        "num_terms long, bits binary"
    )
    (
        post.groupBy("segment_id")
        .applyInPandas(_build, schema)
        .write.mode("overwrite")
        .parquet(os.path.join(index_dir, _DIR))
    )
    meta = {
        "generation": m.get("generation"),
        "saturation": saturation,
        "hash": "murmur3_x64_128[0]",
    }
    with open(os.path.join(index_dir, _META), "w") as f:
        json.dump(meta, f)
    return meta


class BloomSidecar:
    """Reader-side gate. ``segments_maybe_containing`` answers "which
    of these segments MAY contain at least one of the (field, term)
    pairs" — or None when the sidecar is absent, stale, or over the
    cache bound (fail-open: the caller scans everything, as before)."""

    def __init__(self, spark: SparkSession, index_dir: str, manifest: dict):
        self.spark = spark
        self.index_dir = index_dir
        self.generation = manifest.get("generation")
        self._bitsets: dict[tuple[str, str], tuple[int, np.ndarray]] | None
        self._bitsets = None
        self._loaded = False

    def _load(self) -> None:
        if self._loaded:
            return
        self._loaded = True
        meta_path = os.path.join(self.index_dir, _META)
        try:
            with open(meta_path) as f:
                meta = json.load(f)
        except (FileNotFoundError, ValueError):
            return
        if meta.get("generation") != self.generation:
            return  # stale sidecar: fail open
        rows = self.spark.read.parquet(
            os.path.join(self.index_dir, _DIR)
        ).collect()
        total = sum(len(r["bits"]) for r in rows)
        if total > MAX_CACHE_BYTES:
            return
        self._bitsets = {
            (r["segment_id"], r["field"]): (
                r["num_bits"],
                np.frombuffer(r["bits"], dtype=np.uint8),
            )
            for r in rows
        }

    def segments_maybe_containing(
        self, pairs: list[tuple[str, str]]
    ) -> set[str] | None:
        """-> segment_ids that may contain ANY of the (field, term)
        pairs, or None for "no information". A segment with no bitset
        row for a queried field is kept (that field was never bloomed
        there — fail open per segment, the delegate-format contract)."""
        self._load()
        if self._bitsets is None or not pairs:
            return None
        positions = [
            (f, term_position(f, t)) for f, t in pairs
        ]
        segs = {s for s, _ in self._bitsets}
        fields = {f for _, f in self._bitsets}
        keep: set[str] = set()
        for s in segs:
            hit = False
            for f, p in positions:
                if f not in fields:
                    hit = True  # un-bloomed field: cannot rule out
                    break
                entry = self._bitsets.get((s, f))
                if entry is None:
                    continue  # field bloomed elsewhere, absent here
                nbits, bits = entry
                q = p & (nbits - 1)
                if bits[q >> 3] & (1 << (q & 7)):
                    hit = True
                    break
            if hit:
                keep.add(s)
        return keep
