"""FastVectorHighlighter — term-vector highlighting with per-field
fragment control.

Reference parity (highlighter/src/java/org/apache/lucene/search/
vectorhighlight/):

- FieldTermStack.java: the doc's query-term hits (position, start
  offset, end offset) read from the INDEX (here: the postings table's
  positions+offsets blobs — the same columnar transpose
  termvectors.py documents), never from re-analysis;
- FieldPhraseList.java: phrase-aware matching — a multi-term phrase
  contributes ONE WeightedPhraseInfo spanning first-term start to
  last-term end, only where the terms sit at consecutive positions
  (the FVH signature behavior: "foo bar" highlights the phrase, not
  stray foos);
- SimpleFragListBuilder.java: greedy char-window packing of phrase
  infos into fragments of ``frag_char_size`` chars with the reference's
  margin (fragCharSize/4 ahead of the first phrase), fragment score =
  sum of phrase boosts;
- SimpleFragmentsBuilder / ScoreOrderFragmentsBuilder.java:
  ``score_order`` picks score-desc fragments, else source order; each
  phrase span wrapped in pre/post tags.

Per-doc boosts default to 1 per query unit (the reference uses query
boosts); pass ``weights`` to emulate BoostQuery'd clauses.

Plan shape: one applyInPandas over the (field, terms)-pruned postings
rows groups by segment (offset decode), a broadcast-size hit frame
joins the stored text, and one mapInPandas renders — no shuffle wider
than the matched doc ids, same scale contract as highlight.py.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

QueryUnit = tuple[str, ...]  # 1 term = term query, n terms = phrase


def _phrase_infos(
    hits_by_term: dict[str, list[tuple[int, int, int]]],
    units: list[QueryUnit],
    weights: dict[str, float] | None,
) -> list[tuple[int, int, float, list[tuple[int, int]]]]:
    """FieldPhraseList: -> [(start, end, boost, [term spans])] sorted by
    start offset. hits_by_term: term -> [(pos, start, end)]."""
    out = []
    w = weights or {}
    for unit in units:
        first = hits_by_term.get(unit[0])
        if not first:
            continue
        boost = sum(w.get(t, 1.0) for t in unit)
        if len(unit) == 1:
            for _p, s, e in first:
                out.append((s, e, boost, [(s, e)]))
            continue
        pos_maps = []
        ok = True
        for t in unit[1:]:
            h = hits_by_term.get(t)
            if not h:
                ok = False
                break
            pos_maps.append({p: (s, e) for p, s, e in h})
        if not ok:
            continue
        for p, s, e in first:
            spans = [(s, e)]
            good = True
            for off, pm in enumerate(pos_maps, start=1):
                nxt = pm.get(p + off)
                if nxt is None:
                    good = False
                    break
                spans.append(nxt)
            if good:
                out.append((s, spans[-1][1], boost, spans))
    out.sort()
    return out


def _frag_list(
    infos: list[tuple[int, int, float, list[tuple[int, int]]]],
    frag_char_size: int,
    text_len: int,
) -> list[tuple[int, int, float, list[tuple[int, int]]]]:
    """SimpleFragListBuilder: -> [(frag_lo, frag_hi, score, spans)]."""
    margin = frag_char_size // 4
    frags = []
    i = 0
    n = len(infos)
    while i < n:
        s0 = infos[i][0]
        lo = max(0, s0 - margin)
        hi = min(text_len, lo + frag_char_size)
        score = 0.0
        spans: list[tuple[int, int]] = []
        j = i
        while j < n and infos[j][1] <= hi:
            score += infos[j][2]
            spans.extend(infos[j][3])
            j += 1
        if j == i:  # the phrase itself exceeds the fragment: clip it
            score = infos[i][2]
            spans = [(a, min(b, hi)) for a, b in infos[i][3] if a < hi]
            j = i + 1
        frags.append((lo, hi, score, spans))
        i = j
    return frags


def highlight_doc(
    text: str,
    hits_by_term: dict[str, list[tuple[int, int, int]]],
    units: list[QueryUnit],
    frag_char_size: int = 100,
    max_num_fragments: int = 3,
    score_order: bool = True,
    pre: str = "<b>",
    post: str = "</b>",
    weights: dict[str, float] | None = None,
) -> list[tuple[str, float]]:
    """One document through the full FVH pipeline ->
    [(fragment, score)] (the testable kernel)."""
    infos = _phrase_infos(hits_by_term, units, weights)
    if not infos:
        return []
    frags = _frag_list(infos, frag_char_size, len(text))
    if score_order:
        ranked = sorted(frags, key=lambda fr: (-fr[2], fr[0]))
    else:
        ranked = frags
    ranked = ranked[:max_num_fragments]
    if score_order:
        pass  # ScoreOrderFragmentsBuilder emits in score order
    out = []
    for lo, hi, score, spans in ranked:
        snip = text[lo:hi]
        for s, e in sorted(set(spans), reverse=True):
            if s >= hi or e > hi or s < lo:
                continue
            snip = snip[: s - lo] + pre + snip[s - lo : e - lo] + post + snip[e - lo :]
        out.append((snip, score))
    return out


def fast_vector_highlight(
    reader,
    field: str,
    units: list[QueryUnit],
    docs: DataFrame,
    doc_ids: list[int],
    frag_char_size: int = 100,
    max_num_fragments: int = 3,
    score_order: bool = True,
    pre: str = "<b>",
    post: str = "</b>",
    weights: dict[str, float] | None = None,
    content_col: str = "text",
) -> DataFrame:
    """-> (doc_id, fragments array<string>, scores_x1e6 array<long>)
    for the requested docs that have at least one highlight; ordered by
    doc_id. Requires an index built with store_offsets."""
    from lucene_spark.search.executor import _SegmentIndex

    tset = sorted({t for u in units for t in u})
    cand = np.asarray(sorted(set(int(d) for d in doc_ids)), dtype=np.int64)

    def per_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        ctx = _SegmentIndex(pdf)
        per_doc: dict[int, dict[str, list[tuple[int, int, int]]]] = {}
        for t in tset:
            if not ctx.has(t):
                continue
            tdocs, _, _ = ctx.postings(t)
            flat_pos, p_starts, p_lens = ctx.flat_positions(t)
            o_st, o_en, _o_starts, _ = ctx.flat_offsets(t)
            idx = np.searchsorted(tdocs, cand)
            ok = (idx < len(tdocs)) & (
                tdocs[np.minimum(idx, len(tdocs) - 1)] == cand
            )
            for ci in np.where(ok)[0]:
                j = idx[ci]
                lo, n = int(p_starts[j]), int(p_lens[j])
                d = int(cand[ci])
                ht = per_doc.setdefault(d, {}).setdefault(t, [])
                for x in range(lo, lo + n):
                    ht.append((int(flat_pos[x]), int(o_st[x]), int(o_en[x])))
        rows = []
        for d, by_term in per_doc.items():
            terms, poss, sts, ens = [], [], [], []
            for t, hs in by_term.items():
                for p, s, e in hs:
                    terms.append(t)
                    poss.append(p)
                    sts.append(s)
                    ens.append(e)
            rows.append((d, terms, poss, sts, ens))
        return pd.DataFrame(
            rows, columns=["doc_id", "terms", "poss", "starts", "ends"]
        )

    rows = reader.postings().filter(
        (F.col("field") == field) & (F.col("term").isin(tset))
    )
    hitdf = rows.groupBy("segment_id").applyInPandas(
        per_segment,
        schema=(
            "doc_id long, terms array<string>, poss array<long>, "
            "starts array<long>, ends array<long>"
        ),
    )
    joined = hitdf.join(docs.select("doc_id", content_col), "doc_id")
    u_list = [tuple(u) for u in units]

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for r in pdf.itertuples(index=False):
                by_term: dict[str, list[tuple[int, int, int]]] = {}
                for t, p, s, e in zip(r.terms, r.poss, r.starts, r.ends):
                    by_term.setdefault(t, []).append((int(p), int(s), int(e)))
                for t in by_term:
                    by_term[t].sort()
                frags = highlight_doc(
                    getattr(r, content_col),
                    by_term,
                    u_list,
                    frag_char_size,
                    max_num_fragments,
                    score_order,
                    pre,
                    post,
                    weights,
                )
                if frags:
                    out_rows.append(
                        (
                            r.doc_id,
                            [f for f, _s in frags],
                            [int(round(s * 1e6)) for _f, s in frags],
                        )
                    )
            yield pd.DataFrame(
                out_rows, columns=["doc_id", "fragments", "scores_x1e6"]
            )

    return (
        joined.mapInPandas(
            render,
            schema="doc_id long, fragments array<string>, scores_x1e6 array<long>",
        )
        .orderBy("doc_id")
    )
