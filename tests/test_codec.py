"""Posting block codec roundtrip + impacts (the BasePostingsFormatTestCase
analog — SURVEY.md §5 pillar 2)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from lucene_spark.index import codec


@given(st.lists(st.integers(min_value=0, max_value=2**40), min_size=0, max_size=300),
       st.integers(min_value=0, max_value=63))
def test_pack_bits_roundtrip(vals, extra_bits):
    bits = max([v.bit_length() for v in vals], default=0)
    arr = np.array(vals, dtype=np.uint64)
    buf = codec.pack_bits(arr, bits)
    out = codec.unpack_bits(buf, len(vals), bits)
    assert out.tolist() == vals


@given(st.lists(st.integers(min_value=0, max_value=2**50), min_size=0, max_size=500))
def test_varint_roundtrip(vals):
    arr = np.array(vals, dtype=np.uint64)
    buf = codec.encode_varints(arr)
    out = codec.decode_varints(buf, len(vals))
    assert out.tolist() == vals


@settings(max_examples=50)
@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=5000),
                  st.integers(min_value=1, max_value=300),
                  st.integers(min_value=0, max_value=255)),
        min_size=1, max_size=1200,
    )
)
def test_postings_roundtrip(rows):
    # build strictly increasing docIDs from positive gaps
    gaps = np.array([r[0] for r in rows], dtype=np.int64)
    doc_ids = np.cumsum(gaps) - 1
    freqs = np.array([r[1] for r in rows], dtype=np.int64)
    norms = np.array([r[2] for r in rows], dtype=np.int64)
    blob, block_last, imp_f, imp_n = codec.encode_postings(doc_ids, freqs, norms)
    d, f = codec.decode_postings(blob)
    assert d.tolist() == doc_ids.tolist()
    assert f.tolist() == freqs.tolist()
    # skip metadata: one entry per 256-doc block, last docID per block
    nblocks = (len(rows) + codec.BLOCK_SIZE - 1) // codec.BLOCK_SIZE
    assert len(block_last) == nblocks == len(imp_f) == len(imp_n)
    assert block_last[-1] == int(doc_ids[-1])
    # impacts: per block, max freq present; every (freq,norm) in block is
    # dominated by some skyline pair (freq' >= freq and norm' <= norm)
    for bi in range(nblocks):
        s, e = bi * codec.BLOCK_SIZE, min((bi + 1) * codec.BLOCK_SIZE, len(rows))
        bf, bn = freqs[s:e], norms[s:e]
        assert max(imp_f[bi]) == int(bf.max())
        for fq, nc in zip(bf, bn):
            assert any(fs >= fq and ns <= nc for fs, ns in zip(imp_f[bi], imp_n[bi]))
        # skyline: as freq decreases, norm must strictly decrease
        # (otherwise the pair would be dominated)
        assert sorted(imp_f[bi], reverse=True) == list(imp_f[bi])
        assert sorted(imp_n[bi], reverse=True) == list(imp_n[bi])
        assert len(set(imp_f[bi])) == len(imp_f[bi])


def test_positions_roundtrip():
    rng = np.random.default_rng(42)
    freqs = rng.integers(1, 8, size=50)
    positions = [np.cumsum(rng.integers(1, 20, size=f)) for f in freqs]
    blob = codec.encode_positions(freqs, positions)
    out = codec.decode_positions(blob, freqs)
    for a, b in zip(positions, out):
        assert a.tolist() == b.tolist()


def test_empty_postings_rejected():
    import pytest
    with pytest.raises(AssertionError):
        codec.encode_postings(np.array([], dtype=np.int64), np.array([], dtype=np.int64))
    with pytest.raises(ValueError):
        codec.encode_postings(np.array([3, 3]), np.array([1, 1]))
    with pytest.raises(ValueError):
        codec.encode_postings(np.array([1, 2]), np.array([0, 1]))
