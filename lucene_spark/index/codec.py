"""Posting-list block codec — numpy FOR bit-packing + varint positions.

The byte layout is OUR choice (no Lucene file-format compatibility is
required), but it keeps the load-bearing structure of
Lucene104PostingsWriter (lucene/core/src/java/org/apache/lucene/codecs/
lucene104/Lucene104PostingsWriter.java:257-298,389-509):

- 256-doc blocks (ForUtil.java:33 BLOCK_SIZE), docID *deltas* bit-packed
  at the block's required width (FOR);
- freqs packed per block at their own width (PFOR's patching is skipped —
  plain FOR; layout freedom we exercise);
- per-block skip metadata (last docID) and per-block *competitive impacts*
  — the Pareto skyline of (freq max, norm-code min) pairs
  (CompetitiveImpactAccumulator semantics, CORE/codecs/
  CompetitiveImpactAccumulator.java) — kept as plain array columns so
  block-max WAND can bound scores without decoding.

Postings binary layout (little-endian):
  u32 n_docs
  then per 256-doc block:
    u16 count | u8 doc_bits | u8 freq_bits
    packed (delta-1) values   [count * doc_bits bits, padded to byte]
    packed (freq-1)  values   [count * freq_bits bits, padded to byte]
  deltas are vs the previous docID (previous block's last for block
  starts; -1 origin for the very first doc).

Positions binary layout: varint-encoded within-doc position deltas,
doc-major, counts given by the freqs.
"""

from __future__ import annotations

import struct

import numpy as np

BLOCK_SIZE = 256  # ForUtil.java:33


# ---- bit packing ------------------------------------------------------------


def pack_bits(arr: np.ndarray, bits: int) -> bytes:
    """Pack non-negative uint64 values at `bits` width, LSB-first."""
    if bits == 0 or len(arr) == 0:
        return b""
    arr = np.ascontiguousarray(arr, dtype=np.uint64)
    shifts = np.arange(bits, dtype=np.uint64)
    bitmat = ((arr[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bitmat.reshape(-1), bitorder="little").tobytes()


def unpack_bits(buf: bytes, n: int, bits: int) -> np.ndarray:
    """Inverse of pack_bits -> uint64 array of length n."""
    if bits == 0 or n == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    bitvec = np.unpackbits(raw, bitorder="little")[: n * bits]
    bitmat = bitvec.reshape(n, bits).astype(np.uint64)
    weights = (np.uint64(1) << np.arange(bits, dtype=np.uint64)).astype(np.uint64)
    return bitmat @ weights


def bits_required(max_val: int) -> int:
    return int(max_val).bit_length()


# ---- varints (for positions) ------------------------------------------------


def encode_varints(arr: np.ndarray) -> bytes:
    """LEB128 varint encode a non-negative int array (vectorized by layer)."""
    arr = np.asarray(arr, dtype=np.uint64)
    if arr.size == 0:
        return b""
    nbytes = np.maximum(1, np.ceil((64 - _clz64(arr)) / 7).astype(np.int64))
    buf = np.zeros(int(nbytes.sum()), dtype=np.uint8)
    offsets = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    vals = arr.copy()
    for layer in range(int(nbytes.max())):
        sel = nbytes > layer
        more = nbytes[sel] > layer + 1
        buf[offsets[sel] + layer] = (vals[sel] & np.uint64(0x7F)).astype(np.uint8) | (
            more.astype(np.uint8) << 7
        )
        vals[sel] >>= np.uint64(7)
    return buf.tobytes()


def _clz64(vals: np.ndarray) -> np.ndarray:
    """Count leading zeros of uint64 values (0 -> 64)."""
    res = np.full(len(vals), 64, dtype=np.int64)
    v = vals.copy()
    bits = np.zeros(len(vals), dtype=np.int64)
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v >= (np.uint64(1) << np.uint64(shift))
        bits[mask] += shift
        v[mask] >>= np.uint64(shift)
    nz = vals != 0
    res[nz] = 63 - bits[nz]
    return res


def encode_varints_offsets(arr: np.ndarray) -> tuple[bytes, np.ndarray]:
    """encode_varints for a whole stream at once, returning the buffer
    AND the per-value END byte offsets, so callers can slice out any
    contiguous sub-range's bytes without re-encoding (the segment
    builder encodes ALL position deltas in one call and slices per-term
    blobs — the 100x-fewer-numpy-calls path)."""
    arr = np.asarray(arr, dtype=np.uint64)
    if arr.size == 0:
        return b"", np.zeros(0, dtype=np.int64)
    nbytes = np.maximum(1, np.ceil((64 - _clz64(arr)) / 7).astype(np.int64))
    ends = np.cumsum(nbytes)
    buf = np.zeros(int(ends[-1]), dtype=np.uint8)
    offsets = ends - nbytes
    vals = arr.copy()
    for layer in range(int(nbytes.max())):
        sel = nbytes > layer
        more = nbytes[sel] > layer + 1
        buf[offsets[sel] + layer] = (vals[sel] & np.uint64(0x7F)).astype(np.uint8) | (
            more.astype(np.uint8) << 7
        )
        vals[sel] >>= np.uint64(7)
    return buf.tobytes(), ends


def decode_varints(buf: bytes, n: int) -> np.ndarray:
    """Decode n LEB128 varints."""
    if n == 0:
        return np.zeros(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    out = np.zeros(n, dtype=np.uint64)
    ends = np.where((raw & 0x80) == 0)[0][:n]
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    for layer in range(int(lengths.max())):
        sel = lengths > layer
        out[sel] |= (raw[starts[sel] + layer].astype(np.uint64) & np.uint64(0x7F)) << np.uint64(
            7 * layer
        )
    return out


# ---- postings ---------------------------------------------------------------


def impacts_skyline(freqs: np.ndarray, norm_codes: np.ndarray) -> tuple[list[int], list[int]]:
    """Competitive (freq, norm_code) pairs: Pareto frontier with freq
    maximal, norm_code (∝ doc length) minimal. Score is increasing in freq
    and decreasing in norm length, so any block-max bound only needs these.
    """
    order = np.lexsort((norm_codes, -freqs))  # freq desc, norm asc
    f_out: list[int] = []
    n_out: list[int] = []
    best_norm = 1 << 30
    last_freq = -1
    for i in order:
        f, c = int(freqs[i]), int(norm_codes[i])
        if c < best_norm:
            if f == last_freq and f_out:
                # same freq with smaller norm dominates the previous entry
                f_out[-1], n_out[-1] = f, c
            else:
                f_out.append(f)
                n_out.append(c)
            best_norm = c
            last_freq = f
    return f_out, n_out


def encode_postings(
    doc_ids: np.ndarray, freqs: np.ndarray, norm_codes: np.ndarray | None = None
) -> tuple[bytes, list[int], list[list[int]], list[list[int]]]:
    """Encode a posting list (docIDs strictly increasing, freqs >= 1).

    Returns (blob, block_last_doc, impact_freqs, impact_norms) where the
    last three are per-block skip/impact metadata.
    """
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    freqs = np.asarray(freqs, dtype=np.int64)
    n = len(doc_ids)
    assert n > 0 and len(freqs) == n
    if n > 1 and not (np.diff(doc_ids) > 0).all():
        raise ValueError("docIDs must be strictly increasing")
    if (freqs < 1).any():
        raise ValueError("freqs must be >= 1")
    if norm_codes is None:
        norm_codes = np.zeros(n, dtype=np.int64)

    deltas = np.diff(doc_ids, prepend=np.int64(-1)) - 1  # >= 0
    parts = [struct.pack("<I", n)]
    block_last: list[int] = []
    imp_f: list[list[int]] = []
    imp_n: list[list[int]] = []
    for s in range(0, n, BLOCK_SIZE):
        e = min(s + BLOCK_SIZE, n)
        d = deltas[s:e].astype(np.uint64)
        f = (freqs[s:e] - 1).astype(np.uint64)
        db = bits_required(int(d.max())) if len(d) else 0
        fb = bits_required(int(f.max())) if len(f) else 0
        parts.append(struct.pack("<HBB", e - s, db, fb))
        parts.append(pack_bits(d, db))
        parts.append(pack_bits(f, fb))
        block_last.append(int(doc_ids[e - 1]))
        sf, sn = impacts_skyline(freqs[s:e], np.asarray(norm_codes[s:e]))
        imp_f.append(sf)
        imp_n.append(sn)
    return b"".join(parts), block_last, imp_f, imp_n


def decode_postings(blob: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Decode -> (doc_ids int64, freqs int64)."""
    (n,) = struct.unpack_from("<I", blob, 0)
    pos = 4
    doc_ids = np.empty(n, dtype=np.int64)
    freqs = np.empty(n, dtype=np.int64)
    filled = 0
    while filled < n:
        cnt, db, fb = struct.unpack_from("<HBB", blob, pos)
        pos += 4
        dlen = (cnt * db + 7) // 8
        flen = (cnt * fb + 7) // 8
        d = unpack_bits(blob[pos : pos + dlen], cnt, db).astype(np.int64)
        pos += dlen
        f = unpack_bits(blob[pos : pos + flen], cnt, fb).astype(np.int64)
        pos += flen
        doc_ids[filled : filled + cnt] = d
        freqs[filled : filled + cnt] = f + 1
        filled += cnt
    # undo delta-1 encoding
    np.cumsum(doc_ids + 1, out=doc_ids)
    doc_ids -= 1
    return doc_ids, freqs


def block_layout(blob: bytes) -> list[tuple[int, int, int, int]]:
    """Scan block headers only -> [(count, doc_bits, freq_bits, offset)]
    where offset points at the packed doc-delta bytes. The skip-data
    analog: lets a reader jump to a block without decoding predecessors
    (two-level skip list role, Lucene104PostingsFormat.java:343-353 —
    one level suffices since headers are O(n/256) and scanned in numpy
    time)."""
    (n,) = struct.unpack_from("<I", blob, 0)
    pos = 4
    out = []
    seen = 0
    while seen < n:
        cnt, db, fb = struct.unpack_from("<HBB", blob, pos)
        pos += 4
        out.append((cnt, db, fb, pos))
        pos += (cnt * db + 7) // 8 + (cnt * fb + 7) // 8
        seen += cnt
    return out


def decode_blocks_selective(
    blob: bytes, block_last: list[int], mask: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Decode only the blocks where mask[j] is True.

    ``block_last`` (the per-block skip metadata stored alongside the
    posting row) supplies each block's docID base, so skipped blocks
    never touch the delta chain. Returns (doc_ids, freqs) of the
    selected blocks only.
    """
    layout = block_layout(blob)
    docs_out: list[np.ndarray] = []
    freqs_out: list[np.ndarray] = []
    for j, (cnt, db, fb, off) in enumerate(layout):
        if not mask[j]:
            continue
        dlen = (cnt * db + 7) // 8
        flen = (cnt * fb + 7) // 8
        d = unpack_bits(blob[off : off + dlen], cnt, db).astype(np.int64)
        f = unpack_bits(blob[off + dlen : off + dlen + flen], cnt, fb).astype(np.int64)
        base = np.int64(-1) if j == 0 else np.int64(block_last[j - 1])
        np.cumsum(d + 1, out=d)
        d += base
        docs_out.append(d)
        freqs_out.append(f + 1)
    if not docs_out:
        return np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.int64)
    return np.concatenate(docs_out), np.concatenate(freqs_out)


# ---- positions --------------------------------------------------------------


def encode_positions(freqs: np.ndarray, positions: list[np.ndarray]) -> bytes:
    """Encode per-doc position lists (each strictly increasing) as
    within-doc delta varints, doc-major."""
    deltas = [
        np.diff(np.asarray(p, dtype=np.int64), prepend=np.int64(0)) for p in positions
    ]
    if not deltas:
        return b""
    return encode_varints(np.concatenate(deltas))


def decode_positions_flat(blob: bytes, freqs: np.ndarray):
    """Decode -> (flat absolute positions, per-doc lens) with NO
    per-doc Python loop: one global cumsum of the deltas, then each
    doc's base (the cumsum just before its range) is repeated and
    subtracted — a segmented cumsum in three numpy ops."""
    freqs = np.asarray(freqs, dtype=np.int64)
    total = int(freqs.sum())
    flat = decode_varints(blob, total).astype(np.int64)
    if total == 0:
        return flat, freqs
    c = np.cumsum(flat)
    starts = np.cumsum(freqs) - freqs
    base = np.where(starts > 0, c[np.maximum(starts - 1, 0)], 0)
    return c - np.repeat(base, freqs), freqs


def decode_positions(blob: bytes, freqs: np.ndarray) -> list[np.ndarray]:
    """Decode -> list of per-doc position arrays (len == freq per doc).
    Thin per-doc view over decode_positions_flat (use the flat form in
    hot paths)."""
    flat, lens = decode_positions_flat(blob, freqs)
    ends = np.cumsum(lens)
    starts = ends - lens
    return [flat[s:e] for s, e in zip(starts, ends)]


# ---- offsets (IndexOptions ..._AND_OFFSETS role) ----------------------------


def decode_offsets_flat(blob: bytes, freqs: np.ndarray):
    """Decode stored char offsets -> (flat starts, flat ends, per-doc
    lens), doc-major, aligned with decode_positions_flat. The wire form
    is interleaved varints [start_delta, length, ...] per occurrence,
    with start deltas resetting at each doc boundary (the
    ..._AND_OFFSETS posting payload of Lucene's PostingsFormat,
    IndexOptions.java:26-50 — byte layout is OUR choice)."""
    freqs = np.asarray(freqs, dtype=np.int64)
    total = int(freqs.sum())
    if total == 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, freqs
    vals = decode_varints(blob, 2 * total).astype(np.int64)
    sdel = vals[0::2]
    lens = vals[1::2]
    c = np.cumsum(sdel)
    gstarts = np.cumsum(freqs) - freqs
    base = np.where(gstarts > 0, c[np.maximum(gstarts - 1, 0)], 0)
    starts = c - np.repeat(base, freqs)
    return starts, starts + lens, freqs


def decode_payloads_flat(blob: bytes, freqs: np.ndarray) -> np.ndarray:
    """Decode per-occurrence payloads -> flat uint32 values, doc-major,
    aligned with decode_positions_flat. Wire form: one plain varint per
    occurrence (no deltas — payload values carry no ordering). Float
    payloads travel as their IEEE-754 float32 bit patterns (exact,
    non-negative as an int), the analog of Lucene's per-position
    payload bytes (PostingsFormat .pay file; byte layout is OUR
    choice)."""
    freqs = np.asarray(freqs, dtype=np.int64)
    total = int(freqs.sum())
    if total == 0:
        return np.zeros(0, dtype=np.uint32)
    return decode_varints(blob, total).astype(np.uint32)
