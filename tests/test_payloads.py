"""Per-occurrence payloads (PostingsFormat .pay role): the
DelimitedPayloadTokenFilter-style analyzer, store_payloads indexing,
PayloadScoreQuery (queries/.../payloads/PayloadScoreQuery.java with
Min/Max/Sum/AveragePayloadFunction) and SpanPayloadCheckQuery
(queries/.../payloads/SpanPayloadCheckQuery.java), all verified against
a per-doc pure-Python replay of the documented semantics."""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.search import query as Q

VOCAB = ["aa", "bb", "cc", "dd", "ee"]
WEIGHTS = [0.25, 0.5, 1.0, 1.5, 2.0, 3.0]  # exact in float32


def _make_docs(n=120, seed=7):
    rng = np.random.default_rng(seed)
    docs = []
    for _ in range(n):
        toks = rng.choice(VOCAB, size=rng.integers(4, 30))
        pays = rng.choice(WEIGHTS, size=len(toks))
        docs.append(" ".join(f"{t}|{p}" for t, p in zip(toks, pays)))
    return docs


@pytest.fixture(scope="module")
def payload_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    docs = _make_docs()
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
    )
    path = str(tmp_path_factory.mktemp("pay") / "idx")
    cfg = IndexConfig(
        field="text", content_col="text", analyzer="delimited_payload",
        doc_id_col="doc_id", docs_per_segment=40, store_payloads=True,
    )
    build_index(spark, spark.createDataFrame(pdf), path, cfg)
    return IndexReader(spark, path), docs


def _doc_tokens(doc: str):
    """(tokens, payloads) exactly as the analyzer sees them."""
    toks, pays = [], []
    for raw in doc.split():
        t, _, p = raw.rpartition("|")
        toks.append(t)
        pays.append(float(p))
    return toks, pays


# --------------------------------------------------------------------------
# stored payloads round-trip
# --------------------------------------------------------------------------


def test_payloads_round_trip_against_analyzer(payload_index):
    """Stored per-occurrence payloads equal the analyzer's, doc-major,
    through the flat decode path."""
    from lucene_spark.search.executor import _SegmentIndex

    reader, docs = payload_index
    want: dict[tuple[int, str], list[float]] = {}
    for did, doc in enumerate(docs):
        toks, pays = _doc_tokens(doc)
        for t, p in zip(toks, pays):
            want.setdefault((did, t), []).append(p)
    pdf = reader.postings().toPandas()
    checked = 0
    for _, grp in pdf.groupby("segment_id"):
        ctx = _SegmentIndex(grp.reset_index(drop=True))
        for term in VOCAB:
            if not ctx.has(term):
                continue
            tdocs, _freqs, _ = ctx.postings(term)
            vals, starts, lens = ctx.flat_payloads(term)
            for j, d in enumerate(tdocs):
                lo, n = int(starts[j]), int(lens[j])
                got = [float(v) for v in vals[lo:lo + n]]
                assert got == want[(int(d), term)]
                checked += 1
    assert checked > 100


# --------------------------------------------------------------------------
# PayloadScoreQuery vs brute force
# --------------------------------------------------------------------------


def _ref_spans_leaves(src, pos):
    """list of (start, end, gaps, leaf-position tuple), sorted — the
    greedy in-order chain of NearSpansOrdered with leaves tracked."""
    if isinstance(src, Q.SpanTerm):
        return sorted((p, p, 0, (p,)) for p in pos.get(src.term, []))
    if isinstance(src, Q.SpanNear) and src.in_order:
        subs = [_ref_spans_leaves(c, pos) for c in src.clauses]
        if any(not s for s in subs):
            return []
        out = []
        for s0, e0, _w0, l0 in subs[0]:
            cur_e, gaps, ok, leaves = e0, 0, True, list(l0)
            for sub in subs[1:]:
                nxt = [x for x in sub if x[0] > cur_e]
                if not nxt:
                    ok = False
                    break
                cs, ce, _, cl = nxt[0]
                gaps += cs - cur_e - 1
                cur_e = ce
                leaves.extend(cl)
            if ok and gaps <= src.slop:
                out.append((s0, cur_e, gaps, tuple(leaves)))
        return sorted(out)
    raise TypeError(src)


def _ref_payload_score(src, func, doc):
    toks, pays = _doc_tokens(doc)
    pos: dict[str, list[int]] = {}
    for i, t in enumerate(toks):
        pos.setdefault(t, []).append(i)
    spans = _ref_spans_leaves(src, pos)
    vals = [
        np.float32(pays[p]) for _s, _e, _g, leaves in spans for p in leaves
    ]
    if not vals:
        return None
    if func == "min":
        return float(min(vals))
    if func == "max":
        return float(max(vals))
    if func == "sum":
        return float(sum(float(v) for v in vals))
    return float(sum(float(v) for v in vals) / len(vals))


PAYLOAD_SOURCES = [
    Q.SpanTerm("aa"),
    Q.SpanTerm("ee"),
    Q.SpanNear((Q.SpanTerm("aa"), Q.SpanTerm("bb")), slop=2, in_order=True),
    Q.SpanNear(
        (Q.SpanTerm("cc"), Q.SpanTerm("dd"), Q.SpanTerm("ee")),
        slop=4, in_order=True,
    ),
    # nested in-order tree
    Q.SpanNear(
        (
            Q.SpanNear((Q.SpanTerm("aa"), Q.SpanTerm("bb")), slop=1,
                       in_order=True),
            Q.SpanTerm("cc"),
        ),
        slop=3, in_order=True,
    ),
]


def _engine_scores(reader, q):
    from lucene_spark.search.executor import IndexSearcher

    top = IndexSearcher(reader).search(q, k=500)
    return {h.doc_id: h.score for h in top.hits}


@pytest.mark.parametrize("si", range(len(PAYLOAD_SOURCES)))
@pytest.mark.parametrize("func", ["min", "max", "sum", "avg"])
def test_payload_score_matches_reference(payload_index, si, func):
    reader, docs = payload_index
    src = PAYLOAD_SOURCES[si]
    got = _engine_scores(
        reader, Q.PayloadScoreQuery("text", src, func=func, boost=2.0)
    )
    want = {
        d: 2.0 * s
        for d, doc in enumerate(docs)
        if (s := _ref_payload_score(src, func, doc)) is not None
    }
    assert set(got) == set(want), f"source {si}/{func} match sets differ"
    for d in want:
        assert np.isclose(got[d], want[d], rtol=1e-5), (
            f"source {si}/{func} doc {d}: {got[d]} vs {want[d]}"
        )


def test_payload_score_include_span_score(payload_index):
    """include_span_score multiplies the wrapped span's BM25 sloppy-freq
    score (PayloadScoreQuery.java:61-66)."""
    reader, docs = payload_index
    src = PAYLOAD_SOURCES[2]
    pay = _engine_scores(
        reader,
        Q.PayloadScoreQuery("text", src, func="sum", include_span_score=True),
    )
    span = _engine_scores(reader, Q.SpanQuery("text", src))
    assert set(pay) == set(span)
    for d in pay:
        agg = _ref_payload_score(src, "sum", docs[d])
        assert np.isclose(pay[d], agg * span[d], rtol=1e-5)


def test_payload_score_rejects_bad_shapes(payload_index):
    reader, _ = payload_index
    from lucene_spark.search.executor import IndexSearcher

    bad = Q.SpanNear((Q.SpanTerm("aa"), Q.SpanTerm("bb")), slop=3,
                     in_order=False)
    with pytest.raises(TypeError):
        IndexSearcher(reader).search(
            Q.PayloadScoreQuery("text", bad, func="sum"), k=5
        )
    with pytest.raises(ValueError):
        IndexSearcher(reader).search(
            Q.PayloadScoreQuery("text", Q.SpanTerm("aa"), func="median"), k=5
        )


# --------------------------------------------------------------------------
# SpanPayloadCheckQuery
# --------------------------------------------------------------------------


def _ref_payload_check_freq(src, payloads, doc):
    toks, pays = _doc_tokens(doc)
    pos: dict[str, list[int]] = {}
    for i, t in enumerate(toks):
        pos.setdefault(t, []).append(i)
    spans = [
        (s, e, g)
        for s, e, g, leaves in _ref_spans_leaves(src, pos)
        if len(leaves) == len(payloads)
        and all(
            np.float32(pays[p]) == np.float32(x)
            for p, x in zip(leaves, payloads)
        )
    ]
    return float(
        np.float32(sum(1.0 / (1.0 + max(g, 0)) for _s, _e, g in spans))
    )


@pytest.mark.parametrize(
    "src,payloads",
    [
        (Q.SpanTerm("aa"), (1.5,)),
        (Q.SpanTerm("bb"), (0.25,)),
        (
            Q.SpanNear((Q.SpanTerm("aa"), Q.SpanTerm("bb")), slop=2,
                       in_order=True),
            (1.0, 2.0),
        ),
        (
            Q.SpanNear((Q.SpanTerm("aa"), Q.SpanTerm("bb")), slop=2,
                       in_order=True),
            (1.0,),  # wrong arity -> no matches
        ),
    ],
)
def test_span_payload_check(payload_index, src, payloads):
    from lucene_spark.search.executor import _SegmentIndex, _span_freqs

    reader, docs = payload_index
    check = Q.SpanPayloadCheck(src, payloads)
    terms = sorted(set(check.terms()))
    pdf = (
        reader.postings()
        .filter(reader.postings().term.isin(terms))
        .toPandas()
    )
    got: dict[int, float] = {}
    for _sid, grp in pdf.groupby("segment_id"):
        sdocs, freqs, _ = _span_freqs(check, _SegmentIndex(grp))
        for d, f in zip(sdocs, freqs):
            got[int(d)] = float(f)
    want = {
        d: f
        for d, doc in enumerate(docs)
        if (f := _ref_payload_check_freq(src, payloads, doc)) > 0
    }
    assert set(got) == set(want)
    for d in want:
        assert np.isclose(got[d], want[d], rtol=1e-6)


# --------------------------------------------------------------------------
# lifecycle: deletes + merge keep payloads consistent
# --------------------------------------------------------------------------


def test_payloads_survive_delete_and_merge(spark, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.index.deletes import delete_by_ids
    from lucene_spark.index.merge import force_merge
    from lucene_spark.search.executor import IndexReader

    docs = _make_docs(n=60, seed=13)
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
    )
    path = str(tmp_path / "idx")
    cfg = IndexConfig(
        field="text", content_col="text", analyzer="delimited_payload",
        doc_id_col="doc_id", docs_per_segment=15, store_payloads=True,
    )
    build_index(spark, spark.createDataFrame(pdf), path, cfg)
    dead = [3, 7, 20, 21, 45]
    delete_by_ids(
        spark, path,
        spark.createDataFrame([(v,) for v in dead], "doc_id long"),
    )
    force_merge(spark, path, max_segments=1)
    reader = IndexReader(spark, path)
    src = Q.SpanTerm("aa")
    got = _engine_scores(
        reader, Q.PayloadScoreQuery("text", src, func="sum")
    )
    want = {
        d: s
        for d, doc in enumerate(docs)
        if d not in dead
        and (s := _ref_payload_score(src, "sum", doc)) is not None
    }
    assert got.keys() == want.keys()
    for d in want:
        assert np.isclose(got[d], want[d], rtol=1e-5)


def test_store_payloads_requires_payload_analyzer(spark, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index

    pdf = pd.DataFrame({"doc_id": [0], "text": ["aa bb"]})
    cfg = IndexConfig(
        field="text", content_col="text", analyzer="standard",
        doc_id_col="doc_id", store_payloads=True,
    )
    with pytest.raises(ValueError, match="store_payloads"):
        build_index(
            spark, spark.createDataFrame(pdf), str(tmp_path / "i"), cfg
        )


# --- PayloadSpanUtil (sandbox/payloads/PayloadSpanUtil.java) ---------


def test_payload_span_util_term_and_phrase():
    from lucene_spark.memory.memindex import MemoryIndex
    from lucene_spark.search import query as Q

    m = MemoryIndex(analyzer="delimited_payload")
    m.add_field("content", "fast|1.5 table|2.0 scan|0.25 fast|3.0")
    # TermQuery -> SpanTerm: every occurrence's payload
    got = sorted(m.payloads_for_query(Q.TermQuery("content", "fast")))
    assert got == [1.5, 3.0]
    # PhraseQuery slop=0 -> in-order SpanNear: payloads of BOTH leaves
    # of the one matching span
    got = sorted(m.payloads_for_query(
        Q.PhraseQuery("content", ("fast", "table"))))
    assert got == [1.5, 2.0]
    # no match -> empty (in-order adjacency fails both ways here)
    assert m.payloads_for_query(
        Q.PhraseQuery("content", ("table", "fast"), slop=0)) == []
    assert m.payloads_for_query(
        Q.PhraseQuery("content", ("scan", "table"))) == []


def test_payload_span_util_boolean_and_dismax():
    from lucene_spark.memory.memindex import MemoryIndex
    from lucene_spark.search import query as Q

    m = MemoryIndex(analyzer="delimited_payload")
    m.add_field("content", "alpha|1.0 beta|2.0 gamma|4.0")
    b = Q.BooleanQuery(
        must=(Q.TermQuery("content", "alpha"),),
        should=(Q.TermQuery("content", "gamma"),),
        must_not=(Q.TermQuery("content", "beta"),),  # prohibited: skipped
    )
    assert sorted(m.payloads_for_query(b)) == [1.0, 4.0]
    d = Q.DisjunctionMaxQuery(
        (Q.TermQuery("content", "beta"), Q.TermQuery("content", "gamma"))
    )
    assert sorted(m.payloads_for_query(d)) == [2.0, 4.0]


def test_payload_span_util_span_passthrough_and_errors():
    import pytest as _pytest

    from lucene_spark.memory.memindex import MemoryIndex
    from lucene_spark.search import query as Q

    m = MemoryIndex(analyzer="delimited_payload")
    m.add_field("content", "a|0.5 b|1.5 c|2.5 a|3.5")
    sq = Q.SpanQuery(field="content", source=Q.SpanNear(
        (Q.SpanTerm("a"), Q.SpanTerm("b")), slop=0, in_order=True))
    assert sorted(m.payloads_for_query(sq)) == [0.5, 1.5]
    with _pytest.raises(TypeError, match="cannot convert"):
        m.payloads_for_query(Q.FuzzyQuery("content", "ab", max_edits=1))
