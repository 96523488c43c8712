"""Pluggable postings formats — the codec SPI (reference
core/codecs/PostingsFormat.java `forName` + NamedSPILoader, plus the
alternative formats module codecs/: bloom, direct, simpletext,
uniformsplit).

A format owns ONLY the postings blob byte layout. Everything around it
is format-independent by construction: per-block skip metadata
(block_last_doc) and competitive impacts live in plain table columns,
norms/positions/offsets/payloads have their own codecs, so block-max
WAND and the positional kernels work unchanged under any format here.

Shipped formats:

- ``for104`` (default): 256-doc FOR bit-packed blocks
  (Lucene104PostingsWriter layout twin — codec.py).
- ``varint``: plain varint deltas, no bit-packing — the
  simpletext/direct-style "trade size for simplicity" alternative
  (codecs/simpletext/SimpleTextPostingsFormat.java role). Selective
  block decode falls back to full-decode + block slice (no packed
  sub-block seeks), which is the honest cost of the simpler layout.

The name is recorded in the index manifest (SegmentInfos.codec role)
and resolved per reader/worker through ``get_postings_format`` — the
NamedSPILoader.lookup analog. addIndexes re-encodes into the
destination index's format (IndexWriter.addIndexes semantics: the
incoming segments adopt the writer's codec).
"""

from __future__ import annotations

import struct

import numpy as np

from lucene_spark.index import codec

DEFAULT_FORMAT = "for104"


class For104Format:
    """The default FOR-blocked layout (codec.py)."""

    name = "for104"

    encode = staticmethod(codec.encode_postings)
    decode = staticmethod(codec.decode_postings)
    decode_selective = staticmethod(codec.decode_blocks_selective)

    @staticmethod
    def encode_single(doc: int, freq: int) -> bytes:
        """df==1 fast path: byte layout identical to encode_postings
        for a single posting (no numpy calls)."""
        db = doc.bit_length()
        fb = (freq - 1).bit_length()
        return (
            b"\x01\x00\x00\x00"
            + bytes((1, 0, db, fb))
            + doc.to_bytes((db + 7) // 8, "little")
            + (freq - 1).to_bytes((fb + 7) // 8, "little")
        )


class VarintFormat:
    """u32 n | u32 doc_bytes | varint (delta-1)s | varint (freq-1)s.
    Same delta origin (-1) and per-256-block skip/impact metadata as
    for104 — only the packing differs."""

    name = "varint"

    @staticmethod
    def encode(doc_ids, freqs, norm_codes=None):
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
        deltas = np.diff(doc_ids, prepend=np.int64(-1)) - 1
        dbuf = codec.encode_varints(deltas)
        fbuf = codec.encode_varints(freqs - 1)
        blob = struct.pack("<II", n, len(dbuf)) + dbuf + fbuf
        block_last, imp_f, imp_n = [], [], []
        for s in range(0, n, codec.BLOCK_SIZE):
            e = min(s + codec.BLOCK_SIZE, n)
            block_last.append(int(doc_ids[e - 1]))
            sf, sn = codec.impacts_skyline(
                freqs[s:e], np.asarray(norm_codes[s:e])
            )
            imp_f.append(sf)
            imp_n.append(sn)
        return blob, block_last, imp_f, imp_n

    @staticmethod
    def encode_single(doc: int, freq: int) -> bytes:
        def vi(v: int) -> bytes:
            out = bytearray()
            while v >= 0x80:
                out.append((v & 0x7F) | 0x80)
                v >>= 7
            out.append(v)
            return bytes(out)

        dbuf = vi(doc)
        return struct.pack("<II", 1, len(dbuf)) + dbuf + vi(freq - 1)

    @staticmethod
    def decode(blob: bytes):
        n, dlen = struct.unpack_from("<II", blob, 0)
        deltas = codec.decode_varints(blob[8 : 8 + dlen], n)
        freqs = codec.decode_varints(blob[8 + dlen :], n) + 1
        doc_ids = np.cumsum(deltas + 1) - 1
        return doc_ids.astype(np.int64), freqs.astype(np.int64)

    @staticmethod
    def decode_selective(blob: bytes, block_last, mask):
        # no packed sub-block seeks in this layout: decode fully, then
        # slice the selected 256-doc blocks
        docs, freqs = VarintFormat.decode(blob)
        keep = np.repeat(
            np.asarray(mask, dtype=bool),
            [
                min(codec.BLOCK_SIZE, len(docs) - s)
                for s in range(0, len(docs), codec.BLOCK_SIZE)
            ],
        )
        return docs[keep], freqs[keep]


class SimpleTextFormat:
    """codecs/simpletext/SimpleTextPostingsFormat.java role: the
    postings blob is literal ASCII text — a header line plus one
    ``doc <id> freq <f>`` line per posting — readable in any editor,
    the debugging codec (the reference ships SimpleTextCodec "FOR
    RECREATIONAL USE ONLY", never for production). Same per-256-block
    skip/impact metadata columns as the packed formats, so search,
    merge, WAND and CheckIndex work unchanged on top; selective decode
    is full-decode + block slice (the honest cost of a text layout)."""

    name = "simpletext"

    @staticmethod
    def encode(doc_ids, freqs, norm_codes=None):
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
        lines = [f"n {n}"]
        lines.extend(
            f"doc {int(d)} freq {int(f)}" for d, f in zip(doc_ids, freqs)
        )
        blob = "\n".join(lines).encode("ascii")
        block_last, imp_f, imp_n = [], [], []
        for s in range(0, n, codec.BLOCK_SIZE):
            e = min(s + codec.BLOCK_SIZE, n)
            block_last.append(int(doc_ids[e - 1]))
            sf, sn = codec.impacts_skyline(
                freqs[s:e], np.asarray(norm_codes[s:e])
            )
            imp_f.append(sf)
            imp_n.append(sn)
        return blob, block_last, imp_f, imp_n

    @staticmethod
    def encode_single(doc: int, freq: int) -> bytes:
        return f"n 1\ndoc {doc} freq {freq}".encode("ascii")

    @staticmethod
    def decode(blob: bytes):
        lines = blob.decode("ascii").split("\n")
        n = int(lines[0].split()[1])
        docs = np.empty(n, dtype=np.int64)
        freqs = np.empty(n, dtype=np.int64)
        for i, ln in enumerate(lines[1 : n + 1]):
            parts = ln.split()
            docs[i] = int(parts[1])
            freqs[i] = int(parts[3])
        return docs, freqs

    @staticmethod
    def decode_selective(blob: bytes, block_last, mask):
        docs, freqs = SimpleTextFormat.decode(blob)
        keep = np.repeat(
            np.asarray(mask, dtype=bool),
            [
                min(codec.BLOCK_SIZE, len(docs) - s)
                for s in range(0, len(docs), codec.BLOCK_SIZE)
            ],
        )
        return docs[keep], freqs[keep]


_FORMATS = {
    f.name: f for f in (For104Format, VarintFormat, SimpleTextFormat)
}


def get_postings_format(name: str | None):
    """NamedSPILoader.lookup analog (PostingsFormat.forName)."""
    key = name or DEFAULT_FORMAT
    try:
        return _FORMATS[key]
    except KeyError:
        raise ValueError(
            f"unknown postings format {key!r}; available: {sorted(_FORMATS)}"
        ) from None


def register_postings_format(fmt) -> None:
    """Test/extension hook: add a format class with the SPI surface
    (name, encode, encode_single, decode, decode_selective)."""
    _FORMATS[fmt.name] = fmt
