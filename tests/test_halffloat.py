"""HalfFloatPoint (sandbox/document/HalfFloatPoint.java): fp16
encode/decode bit algebra, sortable ordering, nextUp/nextDown, and the
Spark range-query path (reference tests: TestHalfFloatPoint.java)."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from lucene_spark.util import halffloat as hf


def _enc1(v):
    return int(hf.half_float_to_short_bits(np.array([v], dtype=np.float32))[0]) & 0xFFFF


def test_known_bit_patterns():
    # TestHalfFloatPoint.java:40-42
    assert _enc1(0.0) == 0
    assert _enc1(-0.0) == 1 << 15
    assert _enc1(np.float32(1.4e-45)) == 0  # Float.MIN_VALUE rounds to zero
    assert _enc1(1.0) == 0x3C00
    assert _enc1(65504.0) == 0x7BFF  # fp16 max
    assert _enc1(65520.0) == 0x7C00  # rounds to +inf
    assert _enc1(float("inf")) == 0x7C00
    assert _enc1(float("-inf")) == 0xFC00


def test_round_shift_half_to_even():
    # TestHalfFloatPoint.java:61-77 — the full tie table for shift=2
    want = [0, 0, 0, 1, 1, 1, 2, 2, 2, 2, 2, 3, 3, 3, 4, 4, 4]
    got = [int(hf.round_shift(np.array([i]), 2)[0]) for i in range(17)]
    assert got == want


@settings(max_examples=300, deadline=None)
@given(st.floats(width=32, allow_nan=False))
def test_encode_matches_ieee_fp16(x):
    # numpy's astype(float16) is IEEE round-to-nearest-even — the same
    # contract the reference bit algorithm implements
    mine = _enc1(np.float32(x))
    ref = int(np.float32(x).astype(np.float16).view(np.uint16))
    assert mine == ref


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-32768, max_value=32767))
def test_sortable_short_enumerates_half_floats_in_order(i):
    # TestHalfFloatPoint.java:156: sortableShortToHalfFloat(i) and back
    # round-trips for every non-NaN code point, and order is monotone
    v = hf.sortable_short_to_half_float(np.array([i], dtype=np.int16))[0]
    if not np.isnan(v):
        back = int(hf.half_float_to_sortable_short(np.array([v]))[0])
        assert back == i
        if i < 32767:
            nxt = hf.sortable_short_to_half_float(
                np.array([i + 1], dtype=np.int16))[0]
            if not np.isnan(nxt):
                assert v < nxt or (v == 0.0 and nxt == 0.0)


def test_next_up_down():
    assert hf.next_up(1.0) == 1.0009765625
    assert hf.next_down(1.0) == 0.99951171875
    assert hf.next_up(0.0) == 5.960464477539063e-08
    # nextDown(+0) is -0 (FloatPoint/HalfFloatPoint contract)
    nd = hf.next_down(0.0)
    assert nd == 0.0 and np.signbit(nd)
    assert hf.next_up(65504.0) == float("inf")
    assert hf.next_down(float("inf")) == 65504.0
    assert hf.next_up(float("-inf")) == -65504.0
    assert np.isnan(hf.next_up(float("nan")))


def test_range_query_quantized_semantics(spark):
    # TestHalfFloatPoint.java:188-196 shape: a stored 1.25 matches
    # [1, 2]; a stored 2.5 (not representable boundary games) — and a
    # value that ROUNDS INTO the range at index time matches even
    # though its exact value is outside (quantization is index-time)
    df = spark.createDataFrame(
        [(1, 1.25), (2, 2.0004882), (3, 0.5), (4, None), (5, 2.6)],
        "id long, v double",
    )
    d = hf.with_half_float_point(df, "v", "v_hf")
    got = hf.half_float_range_topk(d, "v_hf", "id", 1.0, 2.0, k=10).toPandas()
    # 2.0004882 rounds to the half float 2.0 -> matches; 2.6 doesn't;
    # NULL never matches
    assert got.id.tolist() == [1, 2]
    # footprint: the point column is a 2-byte smallint
    assert dict(d.dtypes)["v_hf"] == "smallint"
