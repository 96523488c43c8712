"""Span queries vs a brute-force reference.

The reference replays the documented greedy semantics step by step
(queries/spans: NearSpansOrdered.java anchored-greedy chaining,
NearSpansUnordered.java cover-at-anchor, SpanNotQuery pre/post windows,
SpanContaining/SpanWithin containment) per doc in pure Python; the
engine's vectorized searchsorted kernels must produce the same span
sets AND the same per-doc sloppy freqs sum(1/(1+max(width,0)))
(SpanScorer.java:116-140).
"""

import numpy as np
import pytest

from lucene_spark.search import query as Q


# --------------------------------------------------------------------------
# brute-force reference (per doc): list of (start, end, width) spans
# --------------------------------------------------------------------------


def _ref_spans(src, pos: dict[str, list[int]]):
    if isinstance(src, Q.SpanTerm):
        return sorted((p, p, 0) for p in pos.get(src.term, []))
    if isinstance(src, Q.SpanNear):
        subs = [_ref_spans(c, pos) for c in src.clauses]
        out = []
        if src.in_order:
            if any(not s for s in subs):
                return []
            for s0, e0, _w0 in subs[0]:
                cur_e, gaps, ok = e0, 0, True
                for sub in subs[1:]:
                    nxt = [x for x in sub if x[0] > cur_e]
                    if not nxt:
                        ok = False
                        break
                    cs, ce, _ = nxt[0]
                    gaps += cs - cur_e - 1
                    cur_e = ce
                if ok and gaps <= src.slop:
                    out.append((s0, cur_e, gaps))
        else:
            if any(not s for s in subs):
                return []
            anchors = sorted({x[0] for sub in subs for x in sub})
            for a in anchors:
                chosen = []
                for sub in subs:
                    nxt = [x for x in sub if x[0] >= a]
                    if not nxt:
                        chosen = None
                        break
                    chosen.append(nxt[0])
                if chosen is None:
                    continue
                e = max(c[1] for c in chosen)
                covered = sum(c[1] - c[0] + 1 for c in chosen)
                w = (e - a + 1) - covered
                if w <= src.slop:
                    out.append((a, e, w))
        return sorted(out)
    if isinstance(src, Q.SpanOr):
        out = []
        for c in src.clauses:
            out.extend(_ref_spans(c, pos))
        return sorted(out)
    if isinstance(src, Q.SpanNot):
        inc = _ref_spans(src.include, pos)
        exc = _ref_spans(src.exclude, pos)
        return [
            (s, e, w)
            for s, e, w in inc
            if not any(xs <= e + src.post and xe >= s - src.pre
                       for xs, xe, _ in exc)
        ]
    if isinstance(src, Q.SpanFirst):
        return [
            (s, e, w)
            for s, e, w in _ref_spans(src.match, pos)
            if e < src.end
        ]
    if isinstance(src, Q.SpanContaining):
        big = _ref_spans(src.big, pos)
        little = _ref_spans(src.little, pos)
        return [
            (s, e, w)
            for s, e, w in big
            if any(s <= ls and le <= e for ls, le, _ in little)
        ]
    if isinstance(src, Q.SpanWithin):
        little = _ref_spans(src.little, pos)
        big = _ref_spans(src.big, pos)
        return [
            (s, e, w)
            for s, e, w in little
            if any(bs <= s and e <= be for bs, be, _ in big)
        ]
    raise TypeError(src)


def _ref_freq(src, toks: list[str]) -> float:
    pos: dict[str, list[int]] = {}
    for i, t in enumerate(toks):
        pos.setdefault(t, []).append(i)
    spans = _ref_spans(src, pos)
    return float(
        np.float32(sum(1.0 / (1.0 + max(w, 0)) for _s, _e, w in spans))
    )


VOCAB = ["aa", "bb", "cc", "dd", "ee"]


@pytest.fixture(scope="module")
def span_index(spark, tmp_path_factory):
    import pandas as pd

    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    rng = np.random.default_rng(11)
    docs = [
        " ".join(rng.choice(VOCAB, size=rng.integers(4, 40)))
        for _ in range(120)
    ]
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
    )
    path = str(tmp_path_factory.mktemp("sp") / "idx")
    cfg = IndexConfig(
        field="text", content_col="text", analyzer="simple",
        doc_id_col="doc_id", docs_per_segment=40,
    )
    build_index(spark, spark.createDataFrame(pdf), path, cfg)
    return IndexReader(spark, path), docs


SOURCES = [
    Q.SpanNear((Q.SpanTerm("aa"), Q.SpanTerm("bb")), slop=2, in_order=True),
    Q.SpanNear(
        (Q.SpanTerm("aa"), Q.SpanTerm("bb"), Q.SpanTerm("cc")),
        slop=4, in_order=True,
    ),
    Q.SpanNear((Q.SpanTerm("cc"), Q.SpanTerm("dd")), slop=3, in_order=False),
    Q.SpanNear(
        (Q.SpanTerm("aa"), Q.SpanTerm("dd"), Q.SpanTerm("ee")),
        slop=5, in_order=False,
    ),
    Q.SpanOr((Q.SpanTerm("aa"), Q.SpanTerm("ee"))),
    Q.SpanOr((
        Q.SpanNear((Q.SpanTerm("aa"), Q.SpanTerm("bb")), slop=1, in_order=True),
        Q.SpanTerm("ee"),
    )),
    Q.SpanNot(Q.SpanTerm("aa"), Q.SpanTerm("cc"), pre=1, post=1),
    Q.SpanNot(
        Q.SpanNear((Q.SpanTerm("aa"), Q.SpanTerm("bb")), slop=3, in_order=True),
        Q.SpanTerm("ee"), pre=0, post=0,
    ),
    Q.SpanFirst(Q.SpanTerm("bb"), 5),
    Q.SpanFirst(
        Q.SpanNear((Q.SpanTerm("aa"), Q.SpanTerm("cc")), slop=2, in_order=False),
        8,
    ),
    Q.SpanContaining(
        Q.SpanNear((Q.SpanTerm("aa"), Q.SpanTerm("cc")), slop=4, in_order=True),
        Q.SpanTerm("bb"),
    ),
    Q.SpanWithin(
        Q.SpanTerm("bb"),
        Q.SpanNear((Q.SpanTerm("aa"), Q.SpanTerm("cc")), slop=4, in_order=True),
    ),
    # nested: near over an or
    Q.SpanNear(
        (Q.SpanOr((Q.SpanTerm("aa"), Q.SpanTerm("dd"))), Q.SpanTerm("bb")),
        slop=2, in_order=True,
    ),
    # a missing term: Or survives, Near dies
    Q.SpanOr((Q.SpanTerm("zzzz"), Q.SpanTerm("ee"))),
    Q.SpanNear((Q.SpanTerm("aa"), Q.SpanTerm("zzzz")), slop=9, in_order=True),
]


def _engine_freqs(reader, src):
    """Per-doc sloppy freqs via the per-segment kernel, exactly as the
    sql64 path drives it."""
    import pandas as pd

    from lucene_spark.search.executor import _span_freqs, _SegmentIndex

    terms = sorted(set(src.terms()))
    pdf = (
        reader.postings()
        .filter(reader.postings().term.isin(terms))
        .toPandas()
    )
    out: dict[int, float] = {}
    for _sid, grp in pdf.groupby("segment_id"):
        docs, freqs, _norms = _span_freqs(src, _SegmentIndex(grp))
        for d, f in zip(docs, freqs):
            out[int(d)] = float(f)
    return out


@pytest.mark.parametrize("si", range(len(SOURCES)))
def test_span_freqs_match_reference(span_index, si):
    reader, docs = span_index
    src = SOURCES[si]
    got = _engine_freqs(reader, src)
    want = {
        d: f
        for d, txt in enumerate(docs)
        if (f := _ref_freq(src, txt.split())) > 0
    }
    assert set(got) == set(want), f"source {si} match sets differ"
    for d in want:
        assert np.isclose(got[d], want[d], rtol=1e-6), (
            f"source {si} doc {d}: {got[d]} vs {want[d]}"
        )


def test_spans_sqlpath_matches_exact32(span_index):
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.executor import IndexSearcher

    reader, _docs = span_index
    src = SOURCES[1]
    df = sp.spans_topk(reader, "text", src, k=1000)
    got = {r["doc_id"]: r["score_x1e6"] for r in df.collect()}
    top = IndexSearcher(reader).search(
        Q.SpanQuery("text", src), k=1000, prune=False
    )
    want = {h.doc_id: round(h.score * 1e6) for h in top.hits}
    # the exact32 path scores in float32 (the Lucene contract), the SQL
    # path in float64 — identical match sets, scores within 2 micro-units
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) <= 2, (d, got[d], want[d])


def test_spans_missing_required_term_empty(span_index):
    from lucene_spark.search.executor import IndexSearcher

    reader, _docs = span_index
    src = Q.SpanNear((Q.SpanTerm("aa"), Q.SpanTerm("zzzz")), slop=9)
    top = IndexSearcher(reader).search(Q.SpanQuery("text", src), k=10)
    assert top.total_hits == 0
