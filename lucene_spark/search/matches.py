"""Matches API — exact match occurrences with positions and offsets.

Reference: ``core/search/Matches.java`` / ``MatchesIterator.java``
(``Weight#matches(LeafReaderContext, doc)``: iterate the (position,
startOffset, endOffset) occurrences that made the query match a given
document) and the consumer built on it,
``highlighter/src/java/org/apache/lucene/search/matchhighlight/
MatchRegionRetriever.java`` (collect per-document match regions for
highlighting that is CORRECT for any query, because the regions come
from the query's own matching logic, not from re-running a text
regex).

Two query shapes here (the ones with well-defined occurrence sets):

- ``term_match_regions``: every occurrence of each term — the
  TermQuery MatchesIterator;
- ``phrase_match_regions``: every EXACT phrase occurrence — start
  offset of the first word through end offset of the last
  (PhraseQuery's matches; slop 0).

Both run per segment over the stored positions+offsets blobs (an
index built with ``store_offsets``), the same applyInPandas shape as
highlight_from_index: the postings rows of the requested terms group
by segment, each worker emits occurrence rows for the requested docs
only. -> (doc_id, position, start_offset, end_offset [, term]).

100-TB shape: the scan touches only the requested terms' postings rows
(term-dictionary pushdown) and candidate docs are pruned inside the
kernel by searchsorted; output is O(occurrences in the requested
docs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["term_match_regions", "phrase_match_regions"]


def _doc_occurrences(ctx, term: str, cand: np.ndarray):
    """-> {doc_id: (positions, off_starts, off_ends)} for candidate docs."""
    out = {}
    if not ctx.has(term):
        return out
    tdocs, _, _ = ctx.postings(term)
    flat_pos, p_starts, p_lens = ctx.flat_positions(term)
    o_st, o_en, _, _ = ctx.flat_offsets(term)
    idx = np.searchsorted(tdocs, cand)
    ok = (idx < len(tdocs)) & (tdocs[np.minimum(idx, len(tdocs) - 1)] == cand)
    for ci in np.where(ok)[0]:
        j = idx[ci]
        lo, n = int(p_starts[j]), int(p_lens[j])
        sl = slice(lo, lo + n)
        out[int(cand[ci])] = (flat_pos[sl], o_st[sl], o_en[sl])
    return out


def term_match_regions(
    reader, field: str, terms: list[str], doc_ids: list[int]
) -> DataFrame:
    """-> (doc_id, term, position, start_offset, end_offset), one row
    per occurrence, document/position ordered."""
    from lucene_spark.search.executor import _SegmentIndex

    cand = np.asarray(sorted(set(int(d) for d in doc_ids)), dtype=np.int64)
    tset = sorted(set(terms))
    fmt = reader.manifest.get("postings_format", "for104")

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        ctx = _SegmentIndex(pdf, fmt=fmt)
        rows = []
        for t in tset:
            for d, (pos, st, en) in _doc_occurrences(ctx, t, cand).items():
                for x in range(len(pos)):
                    rows.append((d, t, int(pos[x]), int(st[x]), int(en[x])))
        return pd.DataFrame(
            rows,
            columns=["doc_id", "term", "position", "start_offset", "end_offset"],
        )

    src = reader.postings().filter(
        (F.col("field") == field) & (F.col("term").isin(tset))
    )
    return (
        src.groupBy("segment_id")
        .applyInPandas(
            per_segment,
            schema="doc_id long, term string, position int, "
                   "start_offset int, end_offset int",
        )
        .orderBy("doc_id", "position", "term")
    )


def phrase_match_regions(
    reader, field: str, terms: list[str], doc_ids: list[int]
) -> DataFrame:
    """-> (doc_id, position, start_offset, end_offset): one row per
    exact phrase occurrence — term i at position p+i for every i; the
    region spans first-word start to last-word end."""
    from lucene_spark.search.executor import _SegmentIndex

    if len(terms) < 2:
        raise ValueError("phrase needs >= 2 terms")
    cand = np.asarray(sorted(set(int(d) for d in doc_ids)), dtype=np.int64)
    fmt = reader.manifest.get("postings_format", "for104")
    tlist = list(terms)

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        ctx = _SegmentIndex(pdf, fmt=fmt)
        occ = [_doc_occurrences(ctx, t, cand) for t in tlist]
        rows = []
        common = set(occ[0])
        for o in occ[1:]:
            common &= set(o)
        for d in sorted(common):
            p0, st0, _ = occ[0][d]
            rest = [occ[i][d] for i in range(1, len(tlist))]
            for x in range(len(p0)):
                p = int(p0[x])
                end_off = None
                ok = True
                for i, (pi, _sti, eni) in enumerate(rest, start=1):
                    j = int(np.searchsorted(pi, p + i))
                    if j >= len(pi) or int(pi[j]) != p + i:
                        ok = False
                        break
                    if i == len(tlist) - 1:
                        end_off = int(eni[j])
                if ok:
                    rows.append((d, p, int(st0[x]), end_off))
        return pd.DataFrame(
            rows,
            columns=["doc_id", "position", "start_offset", "end_offset"],
        )

    src = reader.postings().filter(
        (F.col("field") == field) & (F.col("term").isin(sorted(set(tlist))))
    )
    return (
        src.groupBy("segment_id")
        .applyInPandas(
            per_segment,
            schema="doc_id long, position int, "
                   "start_offset int, end_offset int",
        )
        .orderBy("doc_id", "position")
    )
