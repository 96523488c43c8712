"""HalfFloatPoint (sandbox/document/HalfFloatPoint.java): half-precision
(IEEE fp16) numeric points — values are rounded to the nearest half
float at index time (round-half-to-even), stored as ORDER-PRESERVING
sortable int16, and range queries compare sortable shorts directly, so
a 2-byte column replaces an 8-byte one (the reference's pitch: "takes
half the space ... at the cost of some precision").

The encode is the reference bit algorithm carried exactly
(HalfFloatPoint.java halfFloatToShortBits/shortBitsToHalfFloat/
sortableShortBits/roundShift):

- float32 -> fp16 with round-half-to-even on the truncated mantissa,
- exponent overflow -> infinity; float32 denormals -> zero ("even the
  largest denormal float cannot be represented as a half float"),
- fp16 denormals produced exactly (the shift-denormalize branch),
- NaN keeps its top-10 mantissa bits (payload-preserving),
- sortable transform s ^ ((s >> 15) & 0x7fff) makes signed-short order
  equal float order (negatives reversed).

Everything is vectorized numpy over int32 bit arrays — no per-row
Python; the Spark column encode rides one Arrow-batched pandas UDF.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.functions import pandas_udf


def round_shift(i: np.ndarray, shift: int) -> np.ndarray:
    """HalfFloatPoint.roundShift: divide by 2^shift rounding half to
    even — add 2^(shift-1), subtract the shift-th bit on exact ties."""
    i = i.astype(np.int64)  # headroom for the +2^(shift-1) carry
    i = i + (1 << (shift - 1))
    i = i - ((i >> shift) & 1)
    return (i >> shift).astype(np.int32)


def half_float_to_short_bits(v: np.ndarray) -> np.ndarray:
    """float32 array -> fp16 bit patterns (int32 holding uint16)."""
    v = np.asarray(v, dtype=np.float32)
    bits = v.view(np.int32)
    sign = (bits >> 31) & 1
    exp = (bits >> 23) & 0xFF
    mant = bits & 0x7FFFFF

    out_exp = np.zeros_like(exp)
    out_mant = np.zeros_like(mant)

    is_special = exp == 0xFF  # NaN / inf: keep top mantissa bits
    is_denorm32 = exp == 0x00  # float32 denormal -> zero

    e = exp - 127 + 15
    too_large = (~is_special) & (~is_denorm32) & (e >= 0x1F)
    to_denorm = (~is_special) & (~is_denorm32) & (e <= 0)
    normal = (~is_special) & (~is_denorm32) & (e > 0) & (e < 0x1F)

    # special: NaN / infinity
    out_exp = np.where(is_special, 0x1F, out_exp)
    out_mant = np.where(is_special, mant >> (23 - 10), out_mant)

    # exponent too large for fp16 -> infinity (exp=0x1F, mantissa=0)
    out_exp = np.where(too_large, 0x1F, out_exp)
    out_mant = np.where(too_large, 0, out_mant)

    # normal: round the (exp<<23|mantissa) block by 13 bits; mantissa
    # overflow carries into the exponent naturally
    nm = round_shift((e << 23) | mant, 23 - 10)
    out_exp = np.where(normal, nm >> 10, out_exp)
    out_mant = np.where(normal, nm & 0x3FF, out_mant)

    # fp16 denormal: add the implicit bit then round-shift
    shift = np.clip(23 - 10 - e + 1, 1, 31)  # >=32 handled by zero mask
    # per-element shift: the roundShift formula inline on int64
    m64 = (mant | 0x800000).astype(np.int64)
    m64 = m64 + (np.int64(1) << (shift - 1).astype(np.int64))
    m64 = m64 - ((m64 >> shift.astype(np.int64)) & 1)
    dm = (m64 >> shift.astype(np.int64)).astype(np.int32)
    zero_shift = (23 - 10 - e + 1) >= 32
    dm = np.where(zero_shift, 0, dm)
    out_exp = np.where(to_denorm, dm >> 10, out_exp)
    out_mant = np.where(to_denorm, dm & 0x3FF, out_mant)

    return ((sign << 15) | (out_exp << 10) | out_mant).astype(np.int32)


def short_bits_to_half_float(s: np.ndarray) -> np.ndarray:
    """fp16 bit patterns (int holding uint16) -> float32 array."""
    s = np.asarray(s).astype(np.int32) & 0xFFFF
    sign = (s >> 15) & 1
    exp = (s >> 10) & 0x1F
    mant = s & 0x3FF

    out_exp = np.zeros_like(exp)
    out_mant = np.zeros_like(mant)

    special = exp == 0x1F
    zero = (exp == 0) & (mant == 0)
    denorm = (exp == 0) & (mant != 0)
    normal = (~special) & (~zero) & (~denorm)

    out_exp = np.where(special, 0xFF, out_exp)
    out_mant = np.where(special, mant << (23 - 10), out_mant)

    # denormal fp16 -> normal float32: shift the mantissa up to the
    # implicit-bit position (numberOfLeadingZeros(mant) - (32-11))
    with np.errstate(all="ignore"):
        nlz = 32 - np.where(
            mant > 0,
            np.floor(np.log2(np.maximum(mant, 1))).astype(np.int32) + 1,
            0,
        )
    shift = nlz - (32 - 11)
    dmant = (mant << np.clip(shift, 0, 31)) & 0x3FF
    dexp = 0 - shift + 1
    out_exp = np.where(denorm, dexp + 127 - 15, out_exp)
    out_mant = np.where(denorm, dmant << (23 - 10), out_mant)

    out_exp = np.where(normal, exp + 127 - 15, out_exp)
    out_mant = np.where(normal, mant << (23 - 10), out_mant)

    bits = (sign << 31) | (out_exp << 23) | out_mant
    return bits.astype(np.int32).view(np.float32)


def sortable_short_bits(s: np.ndarray) -> np.ndarray:
    """Self-inverse order-preserving transform: s ^ ((s >> 15) & 0x7fff)
    on SIGNED int16 semantics."""
    s = np.asarray(s).astype(np.int16)
    return (s ^ ((s >> 15) & 0x7FFF)).astype(np.int16)


def half_float_to_sortable_short(v: np.ndarray) -> np.ndarray:
    return sortable_short_bits(half_float_to_short_bits(v).astype(np.int16))


def sortable_short_to_half_float(s: np.ndarray) -> np.ndarray:
    return short_bits_to_half_float(
        sortable_short_bits(s).astype(np.int32) & 0xFFFF
    )


def next_up(v: float) -> float:
    """First half float immediately greater than v (HalfFloatPoint.nextUp)."""
    fv = np.float32(v)
    if np.isnan(fv) or fv == np.float32(np.inf):
        return float(fv)
    s = half_float_to_sortable_short(np.array([fv]))[0]
    r = sortable_short_to_half_float(np.array([s]))[0]
    if r <= fv:
        r = sortable_short_to_half_float(np.array([np.int16(s + 1)]))[0]
    return float(r)


def next_down(v: float) -> float:
    """First half float immediately smaller than v (HalfFloatPoint.nextDown)."""
    fv = np.float32(v)
    if np.isnan(fv) or fv == np.float32(-np.inf):
        return float(fv)
    s = half_float_to_sortable_short(np.array([fv]))[0]
    r = sortable_short_to_half_float(np.array([s]))[0]
    if r >= fv:
        r = sortable_short_to_half_float(np.array([np.int16(s - 1)]))[0]
    return float(r)


def half_float_sortable_col(col: Column) -> Column:
    """Encode a numeric column to its fp16 sortable-short form — the
    HalfFloatPoint index-time encode (value rounded to the nearest half
    float, stored in 2 bytes). One Arrow-batched pandas UDF."""

    @pandas_udf("smallint")
    def _enc(v: pd.Series) -> pd.Series:
        arr = v.to_numpy(dtype=np.float32, na_value=np.nan)
        out = half_float_to_sortable_short(arr)
        res = pd.Series(out.astype(np.int16))
        res[v.isna().to_numpy()] = None
        return res

    return _enc(col.cast("float"))


def with_half_float_point(df: DataFrame, src_col: str, point_col: str) -> DataFrame:
    """Materialize the HalfFloatPoint column beside the source — the
    index-time add (HalfFloatPoint constructor + setFloatValue)."""
    return df.withColumn(point_col, half_float_sortable_col(F.col(src_col)))


def half_float_range_topk(
    df: DataFrame,
    point_col: str,
    id_col: str,
    lower: float,
    upper: float,
    k: int = 10,
) -> DataFrame:
    """HalfFloatPoint.newRangeQuery(field, lower, upper): both bounds
    are themselves rounded to the nearest half float (encodeDimension
    calls halfFloatToSortableShort), then the match is an INCLUSIVE
    sortable-short comparison — pure smallint predicates that push to
    the parquet scan (row groups outside the encoded range prune on
    min/max stats). Callers wanting open bounds pass
    next_up(lower)/next_down(upper), the reference's documented idiom.
    -> (id, hf_sortable) ordered by (hf_sortable, id)."""
    lo = int(half_float_to_sortable_short(np.array([np.float32(lower)]))[0])
    hi = int(half_float_to_sortable_short(np.array([np.float32(upper)]))[0])
    return (
        df.where(
            F.col(point_col).isNotNull()
            & (F.col(point_col) >= lo) & (F.col(point_col) <= hi)
        )
        .select(F.col(id_col), F.col(point_col).cast("int").alias("hf_sortable"))
        .orderBy(F.col("hf_sortable").asc(), F.col(id_col).asc())
        .limit(k)
    )
