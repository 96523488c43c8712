"""SmallFloat codec vs golden semantics (SmallFloat.java:103-167)."""

import numpy as np
import pytest
from hypothesis import given, strategies as st

from lucene_spark.util import smallfloat as sf


def test_free_values_exact():
    # values below NUM_FREE_VALUES (24) encode exactly
    for i in range(sf.NUM_FREE_VALUES):
        assert sf.int_to_byte4(i) == i
        assert sf.byte4_to_int(i) == i


def test_known_anchors():
    # longToInt4(Integer.MAX_VALUE) == 231 -> NUM_FREE_VALUES == 24
    assert sf.long_to_int4(2**31 - 1) == 231
    assert sf.NUM_FREE_VALUES == 24
    # byte4ToInt is the identity below 24 then 4-significant-bit steps
    assert sf.byte4_to_int(24) == 24
    assert sf.byte4_to_int(255) == 24 + sf.int4_to_long(231)


def test_decode_table_strictly_increasing():
    assert np.all(np.diff(sf.LENGTH_TABLE) > 0)
    assert sf.LENGTH_TABLE[0] == 0


@given(st.integers(min_value=0, max_value=2**31 - 1))
def test_roundtrip_properties(i):
    code = sf.int_to_byte4(i)
    assert 0 <= code <= 255
    decoded = sf.byte4_to_int(code)
    # decode rounds down to the representable value <= i
    assert decoded <= i
    # and the NEXT representable value is > i
    if code < 255:
        assert sf.byte4_to_int(code + 1) > i


@given(st.lists(st.integers(min_value=0, max_value=2**31 - 1), min_size=1, max_size=200))
def test_vectorized_matches_scalar(vals):
    arr = np.array(vals, dtype=np.int64)
    codes = sf.int_to_byte4_vec(arr)
    assert [int(c) for c in codes] == [sf.int_to_byte4(v) for v in vals]
    dec = sf.byte4_to_int_vec(codes)
    assert [int(d) for d in dec] == [sf.byte4_to_int(sf.int_to_byte4(v)) for v in vals]


def test_monotone():
    xs = np.arange(0, 100000, 7)
    codes = sf.int_to_byte4_vec(xs)
    assert np.all(np.diff(codes.astype(int)) >= 0)


def test_negative_rejected():
    with pytest.raises(ValueError):
        sf.int_to_byte4(-1)
