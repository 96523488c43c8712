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
