"""Norm codec: Lucene's SmallFloat int<->byte4 encoding, in numpy.

Semantics from lucene/core/src/java/org/apache/lucene/util/SmallFloat.java:103-167
(longToInt4 / int4ToLong / intToByte4 / byte4ToInt): a float-like,
order-preserving encoding of non-negative ints into one byte, exact for
values < 24 (NUM_FREE_VALUES), 4 significant bits above.

Pure integer math — trivially exact vs the Java reference.
"""

from __future__ import annotations

import numpy as np

# longToInt4(Integer.MAX_VALUE): numBits=31, shift=27,
# (2**31-1)>>27 = 15 -> &7 = 7, | (28<<3) = 231.
_MAX_INT4 = 231
NUM_FREE_VALUES = 255 - _MAX_INT4  # 24


def long_to_int4(i: int) -> int:
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    num_bits = i.bit_length()
    if num_bits < 4:
        return i
    shift = num_bits - 4
    encoded = (i >> shift) & 0x07
    return encoded | ((shift + 1) << 3)


def int4_to_long(i: int) -> int:
    bits = i & 0x07
    shift = (i >> 3) - 1
    if shift == -1:
        return bits
    return (bits | 0x08) << shift


def int_to_byte4(i: int) -> int:
    """Encode a non-negative int to an unsigned byte code (0..255)."""
    if i < 0:
        raise ValueError(f"Only supports positive values, got {i}")
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + long_to_int4(i - NUM_FREE_VALUES)


def byte4_to_int(b: int) -> int:
    """Decode an unsigned byte code (0..255) back to the quantized int."""
    i = b & 0xFF
    if i < NUM_FREE_VALUES:
        return i
    return NUM_FREE_VALUES + int4_to_long(i - NUM_FREE_VALUES)


# ---- vectorized forms ------------------------------------------------------

#: LENGTH_TABLE[code] = byte4ToInt(code) — the 256-entry decode table that
#: BM25Similarity.java:112-118 builds.
LENGTH_TABLE = np.array([byte4_to_int(i) for i in range(256)], dtype=np.int64)

# Encode via searchsorted over the decode table (it is strictly increasing):
# int_to_byte4(x) == index of the largest table entry <= x, because the
# encoding rounds down to the representable value below.
assert np.all(np.diff(LENGTH_TABLE) > 0)


def int_to_byte4_vec(arr: np.ndarray) -> np.ndarray:
    """Vectorized intToByte4 over a non-negative int array -> uint8 codes."""
    arr = np.asarray(arr, dtype=np.int64)
    if arr.size and arr.min() < 0:
        raise ValueError("Only supports positive values")
    codes = np.searchsorted(LENGTH_TABLE, arr, side="right") - 1
    return codes.astype(np.uint8)


def byte4_to_int_vec(codes: np.ndarray) -> np.ndarray:
    """Vectorized byte4ToInt over uint8 codes."""
    return LENGTH_TABLE[np.asarray(codes, dtype=np.int64) & 0xFF]
