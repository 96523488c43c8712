"""Per-partition segment construction — the DWPT analog.

One Spark partition = one DocumentsWriterPerThread = one segment
(lucene/core/src/java/org/apache/lucene/index/DocumentsWriter.java:52-58:
"Multiple threads ... allocates a DWPT ... Each DWPT corresponds to one
segment being written"). The whole inversion is one vectorized pass per
partition: tokenize -> lexsort (term, doc, position) -> boundary diffs
(the IndexingChain.processDocument + FreqProxTermsWriter sort-at-flush
pipeline, IndexingChain.java:553,1175-1281, FreqProxTermsWriter.java:83-132)
-> FOR-encoded posting blocks (codec.py).

Norm bytes are stored *inside* each posting row (one uint8 per posting)
— unlike Lucene's separate .nvd file — so BM25 scoring never joins the
docs table. This is the single most important 100-TB design choice in
the query path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from lucene_spark.analysis import Analyzer
from lucene_spark.index import codec
from lucene_spark.util.smallfloat import int_to_byte4_vec

# Arrow/Spark schema of the union-typed staging rows a segment build emits.
# row_type: 0 = doc row, 1 = posting row.
STAGING_SCHEMA = (
    "segment_id string, row_type int, doc_id long, doc_len int, doc_len_code int, "
    "field string, term string, doc_freq int, total_term_freq long, "
    "postings binary, norms binary, positions binary, offsets binary, "
    "payloads binary, "
    "block_last_doc array<long>, impact_freqs array<array<int>>, "
    "impact_norms array<array<int>>"
)

_POST_COLS = [
    "segment_id", "row_type", "doc_id", "doc_len", "doc_len_code", "field", "term",
    "doc_freq", "total_term_freq", "postings", "norms", "positions", "offsets",
    "payloads", "block_last_doc", "impact_freqs", "impact_norms",
]


def build_segment(
    segment_id: str,
    doc_ids: np.ndarray,
    texts: pd.Series,
    analyzer: Analyzer,
    field: str,
    store_positions: bool = True,
    store_offsets: bool = False,
    store_payloads: bool = False,
    postings_format: str = "for104",
) -> pd.DataFrame:
    """Invert one segment. doc_ids must be strictly increasing (the
    docs-in-order invariant, Lucene104PostingsWriter.java:263-268).

    Returns the union-schema staging frame: one row per doc (doc_len,
    norm) + one row per distinct term (encoded postings).

    ``store_offsets`` additionally stores each occurrence's char span
    (IndexOptions DOCS_AND_FREQS_AND_POSITIONS_AND_OFFSETS role,
    IndexOptions.java:26-50) as interleaved (start-delta, length)
    varints beside the position blob; requires an analyzer whose chain
    tracks offsets (analyzer.supports_offsets()).

    ``store_payloads`` stores one float payload per occurrence (the
    PostingsFormat .pay file role) as its IEEE-754 float32 bit pattern,
    one plain varint per occurrence beside the position blob; requires
    a payload-producing analyzer (analyzer.supports_payloads()).
    """
    from lucene_spark.index.formats import get_postings_format

    fmt = get_postings_format(postings_format)
    n_docs = len(doc_ids)
    if store_offsets and store_payloads:
        raise ValueError("store_offsets + store_payloads is not supported")
    if analyzer.supports_positions() and (store_offsets or store_payloads):
        raise ValueError(
            "graph analyzers (explicit positions) do not combine with "
            "store_offsets/store_payloads"
        )
    off_start_lists = off_end_lists = pay_lists = None
    pos_lists = None
    if store_offsets:
        trip = [
            analyzer.tokenize_with_offsets_one(t) if isinstance(t, str)
            else ([], [], [])
            for t in texts
        ]
        token_lists = pd.Series([t[0] for t in trip], index=texts.index)
        off_start_lists = [t[1] for t in trip]
        off_end_lists = [t[2] for t in trip]
    elif store_payloads:
        duo = [
            analyzer.tokenize_with_payloads_one(t) if isinstance(t, str)
            else ([], [])
            for t in texts
        ]
        token_lists = pd.Series([t[0] for t in duo], index=texts.index)
        pay_lists = [t[1] for t in duo]
    elif analyzer.supports_positions():
        # graph analyzer (analysis/graph.py): flattened explicit
        # positions — stacked tokens (posInc 0) share a position
        duo = [
            analyzer.tokenize_with_positions_one(t) if isinstance(t, str)
            else ([], [])
            for t in texts
        ]
        token_lists = pd.Series([d[0] for d in duo], index=texts.index)
        pos_lists = [d[1] for d in duo]
    else:
        token_lists = analyzer.tokenize(texts)
    lens = np.fromiter((len(t) for t in token_lists), dtype=np.int64, count=n_docs)

    # --- doc rows: norms (Similarity.computeNorm analog: numTerms encoded
    # via SmallFloat.intToByte4 — Similarity.java:153-162). With explicit
    # positions the field length DISCOUNTS stacked tokens (posInc 0), the
    # BM25Similarity discountOverlaps=true default (BM25Similarity.java):
    # dl = number of distinct positions, so index-time synonyms do not
    # inflate a doc's length (and sum(doc_len), hence avgdl, stays the
    # surface token count — self-consistent with the oracle).
    if pos_lists is not None:
        dl_lens = np.fromiter(
            (
                (1 + int((np.diff(np.asarray(p)) > 0).sum())) if len(p) else 0
                for p in pos_lists
            ),
            dtype=np.int64,
            count=n_docs,
        )
    else:
        dl_lens = lens
    norm_codes_per_doc = int_to_byte4_vec(dl_lens)
    doc_rows = pd.DataFrame(
        {
            "segment_id": segment_id,
            "row_type": 0,
            "doc_id": doc_ids,
            "doc_len": dl_lens.astype(np.int32),
            "doc_len_code": norm_codes_per_doc.astype(np.int32),
        }
    )

    def _pad(pdf: pd.DataFrame) -> pd.DataFrame:
        # missing union-schema columns must be None (not NaN) so the
        # Arrow conversion of array/binary/int columns sees nulls
        out = pdf.reindex(columns=_POST_COLS)
        for c in _POST_COLS:
            if c not in pdf.columns:
                out[c] = None
        return out

    total_tokens = int(lens.sum())
    if total_tokens == 0:
        return _pad(doc_rows)

    # --- inversion, fully vectorized
    flat_terms = np.concatenate([np.asarray(t, dtype=object) for t in token_lists if t])
    doc_idx = np.repeat(np.arange(n_docs), lens)
    # within-doc token position (for phrase queries): analyzer-provided
    # for graph analyzers (stacked tokens repeat a position), else the
    # flat arange
    if pos_lists is not None:
        pos_in_doc = np.concatenate(
            [np.asarray(p, dtype=np.int64) for p in pos_lists if len(p)]
        )
    else:
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos_in_doc = np.arange(total_tokens) - np.repeat(starts, lens)

    term_codes, uniq_terms = pd.factorize(flat_terms, sort=True)
    order = np.lexsort((pos_in_doc, doc_idx, term_codes))
    t_sorted = term_codes[order]
    d_sorted = doc_idx[order]
    p_sorted = pos_in_doc[order]

    # (term, doc) group boundaries
    pair_change = np.empty(total_tokens, dtype=bool)
    pair_change[0] = True
    pair_change[1:] = (t_sorted[1:] != t_sorted[:-1]) | (d_sorted[1:] != d_sorted[:-1])
    pair_starts = np.where(pair_change)[0]
    pair_ends = np.concatenate((pair_starts[1:], [total_tokens]))
    freqs_all = (pair_ends - pair_starts).astype(np.int64)
    pair_term = t_sorted[pair_starts]
    pair_doc = d_sorted[pair_starts]

    # term group boundaries over the (term, doc) pairs
    term_change = np.empty(len(pair_term), dtype=bool)
    term_change[0] = True
    term_change[1:] = pair_term[1:] != pair_term[:-1]
    term_starts = np.where(term_change)[0]
    term_ends = np.concatenate((term_starts[1:], [len(pair_term)]))

    doc_ids64 = np.asarray(doc_ids, dtype=np.int64)

    # --- positions: ONE vectorized delta + varint pass over the whole
    # token stream (per-term blobs are byte slices; identical bytes to
    # per-doc encode_positions — within-doc deltas with 0-prepend)
    pos_buf = b""
    tok_byte_ends = None
    if store_positions and total_tokens:
        deltas = p_sorted.astype(np.int64).copy()
        deltas[1:] -= p_sorted[:-1]
        deltas[pair_starts] = p_sorted[pair_starts]  # doc boundaries reset
        pos_buf, tok_byte_ends = codec.encode_varints_offsets(deltas)

    def term_pos_blob(ts: int, te: int):
        if not store_positions:
            return None
        tok_lo = pair_starts[ts]
        tok_hi = pair_ends[te - 1]
        lo = 0 if tok_lo == 0 else int(tok_byte_ends[tok_lo - 1])
        return pos_buf[lo : int(tok_byte_ends[tok_hi - 1])]

    # --- offsets: same one-pass encode/slice scheme as positions, but
    # interleaved (start-delta, length) pairs per occurrence
    off_buf = b""
    off_byte_ends = None
    if store_offsets and total_tokens:
        flat_starts = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in off_start_lists if x]
        )
        flat_ends_c = np.concatenate(
            [np.asarray(x, dtype=np.int64) for x in off_end_lists if x]
        )
        s_sorted = flat_starts[order]
        e_sorted = flat_ends_c[order]
        sdel = s_sorted.copy()
        sdel[1:] -= s_sorted[:-1]
        sdel[pair_starts] = s_sorted[pair_starts]
        inter = np.empty(2 * total_tokens, dtype=np.int64)
        inter[0::2] = sdel
        inter[1::2] = e_sorted - s_sorted
        off_buf, off_byte_ends = codec.encode_varints_offsets(inter)

    def term_off_blob(ts: int, te: int):
        if not (store_offsets and total_tokens):
            return None
        tok_lo = pair_starts[ts]
        tok_hi = pair_ends[te - 1]
        lo = 0 if tok_lo == 0 else int(off_byte_ends[2 * tok_lo - 1])
        return off_buf[lo : int(off_byte_ends[2 * tok_hi - 1])]

    # --- payloads: float32 bit patterns, one plain varint per
    # occurrence (no deltas — payload values carry no ordering), same
    # one-pass encode/slice scheme as positions
    pay_buf = b""
    pay_byte_ends = None
    if store_payloads and total_tokens:
        flat_pays = np.concatenate(
            [np.asarray(x, dtype=np.float32) for x in pay_lists if x]
        )
        pay_bits = flat_pays.view(np.uint32)[order].astype(np.uint64)
        pay_buf, pay_byte_ends = codec.encode_varints_offsets(pay_bits)

    def term_pay_blob(ts: int, te: int):
        if not (store_payloads and total_tokens):
            return None
        tok_lo = pair_starts[ts]
        tok_hi = pair_ends[te - 1]
        lo = 0 if tok_lo == 0 else int(pay_byte_ends[tok_lo - 1])
        return pay_buf[lo : int(pay_byte_ends[tok_hi - 1])]

    records = []
    for ts, te in zip(term_starts, term_ends):
        term = uniq_terms[pair_term[ts]]
        if te - ts == 1:
            # df==1 fast path: the format's single-posting encoder
            # (byte-identical to its encode() for one posting; no
            # numpy calls)
            doc = int(doc_ids64[pair_doc[ts]])
            f = int(freqs_all[ts])
            nrm = int(norm_codes_per_doc[pair_doc[ts]])
            blob = fmt.encode_single(doc, f)
            records.append(
                (
                    segment_id, 1, None, None, None, field, str(term),
                    1, f, blob, bytes((nrm,)), term_pos_blob(ts, te),
                    term_off_blob(ts, te), term_pay_blob(ts, te),
                    [doc], [[f]], [[nrm]],
                )
            )
            continue
        local_docs = pair_doc[ts:te]
        g_docs = doc_ids64[local_docs]
        g_freqs = freqs_all[ts:te]
        g_norms = norm_codes_per_doc[local_docs].astype(np.int64)
        blob, block_last, imp_f, imp_n = fmt.encode(g_docs, g_freqs, g_norms)
        records.append(
            (
                segment_id, 1, None, None, None, field, str(term),
                int(len(g_docs)), int(g_freqs.sum()), blob,
                g_norms.astype(np.uint8).tobytes(), term_pos_blob(ts, te),
                term_off_blob(ts, te), term_pay_blob(ts, te),
                [int(x) for x in block_last],
                [[int(v) for v in fs] for fs in imp_f],
                [[int(v) for v in ns] for ns in imp_n],
            )
        )
    post_rows = pd.DataFrame.from_records(records, columns=_POST_COLS)
    return pd.concat([_pad(doc_rows), post_rows], ignore_index=True)
