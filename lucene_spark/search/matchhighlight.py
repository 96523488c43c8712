"""MatchHighlighter family — highlighting driven by the Matches API.

Reference: ``highlighter/src/java/org/apache/lucene/search/
matchhighlight/`` — ``PassageSelector.java`` (pick the best-scoring
passage windows for a set of match markers), ``PassageFormatter.java``
(render passages with ellipsis + start/end markers, handling nested
and overlapping markers via a marker stack), ``Passage.java`` /
``OffsetRange.java``, and ``MatchHighlighter.java`` /
``MatchRegionRetriever.java`` (drive selection from the query's OWN
match regions — search/matches.py here — so highlighting is correct
for any query shape, not a re-tokenization guess).

The selector/formatter are pure per-document kernels: the distributed
entry point ``match_highlight`` computes match regions with the
Matches API (term/phrase regions from indexed positions+offsets) and
runs selection per doc inside one applyInPandas over the stored text —
O(matched docs), no corpus re-scan, exactly the highlight_from_index
plan shape.

Default passage scoring (PassageSelector.DEFAULT_SCORER): more
markers > more covered characters > earlier start.
"""

from __future__ import annotations

from dataclasses import dataclass

__all__ = ["Passage", "pick_best", "format_passages", "match_highlight"]


@dataclass(frozen=True)
class Passage:
    """OffsetRange with the markers inside it (Passage.java:26-33)."""

    start: int
    end: int
    markers: tuple[tuple[int, int], ...]


def _split_to_windows(markers, max_window, permitted):
    """PassageSelector.splitOrTruncateToWindows: clip each marker to
    every permitted range it overlaps, then cap at the window size."""
    out = []
    for mf, mt in markers:
        for pf, pt in permitted:
            f, t = max(mf, pf), min(mt, pt)
            if f >= t:
                continue
            if t - f > max_window:
                t = f + max_window
            out.append((f, t))
    return out


def pick_best(value, markers, max_window, max_passages, permitted=None):
    """PassageSelector.pickBest (PassageSelector.java:76-222): one
    candidate window centered on every (clipped) marker, scored by
    (marker count, covered chars, earlier start), best kept with
    overlapping/adjacent losers removed, re-sorted by offset. Falls
    back to the first non-empty permitted window(s) when nothing
    matched. -> list[Passage]."""
    if permitted is None:
        permitted = [(0, len(value))]
    if not value or max_window == 0:
        return []
    pq_size = max(16, max_passages)
    markers = sorted(_split_to_windows(markers, max_window, permitted))

    candidates = []
    mi = 0
    n = len(markers)
    for pf, pt in permitted:
        pt = min(pt, len(value))
        if pf >= pt:
            continue
        while mi < n:
            mf, mt = markers[mi]
            if mf >= pt:
                break  # same marker retried against the next range
            if mf >= pf and mt <= pt and mt - mf <= max_window:
                # centre the window on the marker, clamp to the range
                # (int() truncates toward zero = Java integer division)
                f = int((mf + mt - max_window) / 2)
                t = int((mf + mt + max_window) / 2)
                if f < pf:
                    t += pf - f
                    f = pf
                if t > pt:
                    f -= t - pt
                    t = pt
                    if f < pf:
                        f = pf
                if f < t and t <= len(value):
                    i = mi
                    while i > 0 and markers[i - 1][0] >= f:
                        i -= 1
                    inside = []
                    while i < n and markers[i][0] < t:
                        if markers[i][1] <= t:
                            inside.append(markers[i])
                        i += 1
                    if inside:
                        candidates.append(Passage(f, t, tuple(inside)))
            mi += 1

    if candidates:
        # DEFAULT_SCORER order, best first; PQ size bounds the pool
        candidates.sort(
            key=lambda p: (
                -len(p.markers),
                -sum(t - f for f, t in p.markers),
                p.start,
            )
        )
        passages = candidates[:pq_size]
    else:
        # pickDefaultPassage: first non-empty permitted window(s)
        passages = []
        for pf, pt in permitted:
            if len(passages) >= max_passages:
                break
            pt2 = min(len(value), pt)
            if pf < pt2:
                passages.append(
                    Passage(pf, pf + min(max_window, pt - pf), ())
                )

    # best-first overlap removal (adjacent counts as overlapping)
    kept: list[Passage] = []
    for p in passages:
        if p.end <= p.start:
            continue
        if any(
            (p.start >= q.start and p.start <= q.end - 1)
            or (p.start < q.start and p.end - 1 >= q.start)
            for q in kept
        ):
            continue
        kept.append(p)
        if len(kept) == max_passages:
            break
    kept.sort(key=lambda p: p.start)
    return kept


def format_passages(
    value,
    passages,
    permitted=None,
    ellipsis="...",
    marker_start=">",
    marker_end="<",
):
    """PassageFormatter.format (PassageFormatter.java:56-173): render
    each passage with ellipsis where it does not touch its permitted
    range's edge; nested/overlapping markers close and reopen the
    enclosing markers via the marker stack (END sorts before START at
    one offset). -> list[str]."""
    if permitted is None:
        permitted = [(0, len(value))]
    if not permitted:
        return []
    out = []
    ri = 0
    rf, rt = permitted[0]
    for p in passages:
        while p.start >= rt:
            ri += 1
            if ri == len(permitted):
                return out
            rf, rt = permitted[ri]
        buf = []
        if rf < p.start:
            buf.append(ellipsis)
        # slice points: (offset, type) with END(1) before START(2);
        # ties: longer STARTs first, inner (larger-from) ENDs first
        points = []
        for m in p.markers:
            points.append((m[0], 2, -m[1], m))
            points.append((m[1], 1, -m[0], m))
        points.sort(key=lambda x: (x[0], x[1], x[2]))
        at = p.start
        stack: list[tuple[int, int]] = []
        for off, typ, _tie, m in points:
            buf.append(value[at:off])
            if typ == 2:
                stack.append(m)
                buf.append(marker_start)
            else:
                k = len(stack) - 1 - stack[::-1].index(m)
                buf.extend(marker_end for _ in stack[k:])
                stack.pop(k)
                buf.extend(marker_start for _ in stack[k:])
            at = off
        buf.append(value[at:p.end])
        if rt > p.end:
            buf.append(ellipsis)
        out.append("".join(buf))
    return out


def match_highlight(
    reader,
    stored,
    field: str,
    terms: list[str],
    text_col: str = "text",
    max_window: int = 100,
    max_passages: int = 1,
    k: int = 10,
):
    """MatchHighlighter.java / MatchRegionRetriever.java role: top-k
    BM25 docs for the terms, their match REGIONS from the Matches API
    (indexed positions+offsets — correct for stemmed/graph analyzers
    where re-tokenization would lie), passages selected and rendered
    per doc inside one grouped kernel. -> (doc_id, passages
    array<string>) by doc_id."""
    import pandas as pd
    from pyspark.sql import functions as F

    from lucene_spark.search.matches import term_match_regions
    from lucene_spark.search.sqlpath import bool_bm25_topk

    top = bool_bm25_topk(reader, field, should=terms, k=k).select("doc_id")
    ids = [r["doc_id"] for r in top.collect()]  # k rows — bounded
    regions = term_match_regions(reader, field, terms, ids)
    docs = stored.filter(F.col("doc_id").isin(ids)).select(
        "doc_id", F.col(text_col).alias("_text")
    )
    joined = docs.join(
        regions.select("doc_id", "start_offset", "end_offset"),
        "doc_id",
        "left",
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for doc_id, g in pdf.groupby("doc_id"):
            text = g["_text"].iloc[0]
            ms = [
                (int(f), int(t))
                for f, t in zip(g["start_offset"], g["end_offset"])
                if pd.notna(f)
            ]
            ps = pick_best(text, ms, max_window, max_passages)
            rows.append((doc_id, format_passages(text, ps)))
        return pd.DataFrame(rows, columns=["doc_id", "passages"])

    return (
        joined.groupBy("doc_id")
        .applyInPandas(
            lambda _key, pdf: fn(pdf),
            schema="doc_id long, passages array<string>",
        )
        .orderBy("doc_id")
    )
