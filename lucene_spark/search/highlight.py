"""Passage highlighting — the highlighter module role
(lucene/highlighter UnifiedHighlighter, best-passage form).

``highlight`` scans each document's token stream for the best window of
``window`` tokens (most *distinct* query-term hits; ties -> most total
hits -> earliest start), and emits the passage with query terms wrapped
in pre/post tags. Pure presentation op: Arrow-batched ``mapInPandas``
over the docs that matched (drive it with the top-k doc ids), no
shuffle, deterministic output.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

_TOKEN_RE = re.compile(r"[A-Za-z0-9]+")


def best_passage(
    text: str,
    terms: set[str],
    window: int = 8,
    pre: str = "<b>",
    post: str = "</b>",
) -> tuple[str, int]:
    """-> (highlighted snippet of <= window tokens, n term hits,
    1-based token index of the passage start). Token matching is
    lowercase (SimpleAnalyzer parity); the (start, n_hits) pair is the
    value-comparable passage identity the driver oracle checks."""
    spans = [(m.start(), m.end(), m.group(0).lower()) for m in _TOKEN_RE.finditer(text)]
    if not spans:
        return "", 0, 0
    hits = [i for i, (_s, _e, t) in enumerate(spans) if t in terms]
    if not hits:
        return "", 0, 0
    best = (0, 0, 0)  # (n_distinct, n_total, -start) maximized
    best_start = 0
    n = len(spans)
    for start in range(0, n):
        end = min(start + window, n)
        in_win = [i for i in hits if start <= i < end]
        if not in_win:
            continue
        key = (
            len({spans[i][2] for i in in_win}),
            len(in_win),
            -start,
        )
        if key > best:
            best = key
            best_start = start
        if end == n:
            break
    start = best_start
    end = min(start + window, n)
    lo = spans[start][0]
    hi = spans[end - 1][1]
    # wrap hit tokens inside the window (right-to-left keeps offsets valid)
    out = text[lo:hi]
    for i in range(end - 1, start - 1, -1):
        s, e, t = spans[i]
        if t in terms:
            out = out[: s - lo] + pre + out[s - lo : e - lo] + post + out[e - lo :]
    n_total = sum(1 for i in hits if start <= i < end)
    return out, n_total, start + 1


def highlight(
    docs: DataFrame,
    terms: list[str],
    content_col: str = "text",
    window: int = 8,
    pre: str = "<b>",
    post: str = "</b>",
) -> DataFrame:
    """-> (doc_id, snippet, n_hits, passage_start) for docs with >= 1
    hit; passage_start is the 1-based token index of the best window."""
    tset = {t.lower() for t in terms}

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, text in zip(pdf["doc_id"], pdf[content_col]):
                snip, nh, ps = best_passage(str(text), tset, window, pre, post)
                if nh:
                    rows.append((int(did), snip, nh, ps))
            yield pd.DataFrame(
                rows, columns=["doc_id", "snippet", "n_hits", "passage_start"]
            )

    return docs.select("doc_id", content_col).mapInPandas(
        run, schema="doc_id long, snippet string, n_hits int, passage_start int"
    )


def highlight_from_index(
    reader,
    field: str,
    terms: list[str],
    docs: DataFrame,
    doc_ids: list[int],
    window: int = 8,
    pre: str = "<b>",
    post: str = "</b>",
    content_col: str = "text",
    num_passages: int = 1,
    ellipsis: str = "... ",
) -> DataFrame:
    """UnifiedHighlighter offsets mode (reference UnifiedHighlighter
    consuming IndexOptions ..._AND_OFFSETS postings /
    TermVectorsFormat.java:26): highlight from the STORED positions and
    char offsets instead of re-tokenizing — the only correct option
    when the index analyzer (stemming, per-field chains) disagrees with
    any query-time regex. ``terms`` are ANALYZED terms (e.g. Porter
    stems); the emitted snippet wraps the original surface forms via
    their stored spans.

    Passage = best window of ``window`` token positions ANCHORED AT A
    HIT (most distinct terms, then most hits, then earliest anchor) —
    anchoring at match positions is lossless for the max and mirrors
    the reference's passage scoring over match offsets.

    -> (doc_id, snippet, n_hits, passage_start) where passage_start is
    the 0-based token position of the anchoring hit.

    ``num_passages > 1`` returns the top-N NON-OVERLAPPING passages
    (greedy by the same key, the reference's passage queue), emitted in
    document order and joined by ``ellipsis`` — the UnifiedHighlighter
    maxPassages surface; n_hits then counts hits across all chosen
    passages and passage_start is the first passage's anchor.
    """
    import numpy as np
    from pyspark.sql import functions as F

    from lucene_spark.search.executor import _SegmentIndex

    cand = np.asarray(sorted(set(int(d) for d in doc_ids)), dtype=np.int64)
    tset = sorted(set(terms))

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        ctx = _SegmentIndex(pdf)
        per_doc: dict[int, list[tuple[int, int, int, int]]] = {}
        for ti, t in enumerate(tset):
            if not ctx.has(t):
                continue
            tdocs, _, _ = ctx.postings(t)
            flat_pos, p_starts, p_lens = ctx.flat_positions(t)
            o_st, o_en, o_starts, _ = ctx.flat_offsets(t)
            idx = np.searchsorted(tdocs, cand)
            ok = (idx < len(tdocs)) & (
                tdocs[np.minimum(idx, len(tdocs) - 1)] == cand
            )
            for ci in np.where(ok)[0]:
                j = idx[ci]
                lo, n = int(p_starts[j]), int(p_lens[j])
                d = int(cand[ci])
                hits = per_doc.setdefault(d, [])
                for x in range(lo, lo + n):
                    hits.append(
                        (int(flat_pos[x]), int(o_st[x]), int(o_en[x]), ti)
                    )
        rows = []
        for d, hits in per_doc.items():
            hits.sort()
            chosen: list[list[tuple[int, int, int, int]]] = []
            remaining = hits
            for _round in range(max(1, num_passages)):
                if not remaining:
                    break
                pos = np.array([h[0] for h in remaining], dtype=np.int64)
                best_key, best_i = None, None
                for i in range(len(remaining)):
                    a = pos[i]
                    hi = int(np.searchsorted(pos, a + window, side="left"))
                    in_win = remaining[i:hi]
                    key = (len({h[3] for h in in_win}), len(in_win), -a)
                    if best_key is None or key > best_key:
                        best_key, best_i = key, i
                a = int(pos[best_i])
                hi = int(np.searchsorted(pos, a + window, side="left"))
                chosen.append(remaining[best_i:hi])
                remaining = remaining[:best_i] + remaining[hi:]
            chosen.sort(key=lambda w: w[0][0])  # document order
            allw = [h for w in chosen for h in w]
            rows.append(
                (
                    d,
                    len(allw),
                    int(chosen[0][0][0]),
                    [h[1] for h in allw],
                    [h[2] for h in allw],
                    [min(h[1] for h in w) for w in chosen],
                    [max(h[2] for h in w) for w in chosen],
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_hits", "passage_start", "starts", "ends",
                "p_lo", "p_hi",
            ],
        )

    rows = reader.postings().filter(
        (F.col("field") == field) & (F.col("term").isin(tset))
    )
    hitdf = rows.groupBy("segment_id").applyInPandas(
        per_segment,
        schema=(
            "doc_id long, n_hits int, passage_start int, "
            "starts array<long>, ends array<long>, "
            "p_lo array<long>, p_hi array<long>"
        ),
    )
    joined = hitdf.join(docs.select("doc_id", content_col), "doc_id")

    def wrap(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def render(text: str, lo: int, hi: int, spans) -> str:
            snip = text[lo:hi]
            for s, e in reversed(spans):
                snip = (
                    snip[: s - lo] + pre + snip[s - lo : e - lo] + post
                    + snip[e - lo :]
                )
            return snip

        for pdf in batches:
            out = []
            for r in pdf.itertuples():
                text = str(getattr(r, content_col))
                spans = sorted(zip(list(r.starts), list(r.ends)))
                # passage char bounds, merged when adjacent rounds
                # produced overlapping ranges
                bounds = sorted(zip(list(r.p_lo), list(r.p_hi)))
                merged: list[list[int]] = []
                for lo, hi in bounds:
                    if merged and lo <= merged[-1][1]:
                        merged[-1][1] = max(merged[-1][1], hi)
                    else:
                        merged.append([lo, hi])
                pieces = [
                    render(
                        text, lo, hi,
                        [(s, e) for s, e in spans if lo <= s and e <= hi],
                    )
                    for lo, hi in merged
                ]
                out.append(
                    (r.doc_id, ellipsis.join(pieces), r.n_hits, r.passage_start)
                )
            yield pd.DataFrame(
                out, columns=["doc_id", "snippet", "n_hits", "passage_start"]
            )

    return joined.mapInPandas(
        wrap, schema="doc_id long, snippet string, n_hits int, passage_start int"
    )
