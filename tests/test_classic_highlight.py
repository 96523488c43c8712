"""Classic Highlighter (QueryScorer + fragmenters) — golden behaviors
mirroring the reference's HighlighterTest.java."""

import pytest

from lucene_spark.search.classic_highlight import (
    best_fragments_doc,
    classic_highlight,
    weighted_span_terms,
)


def frags(text, **kw):
    wst = weighted_span_terms(
        kw.pop("terms", None), kw.pop("weights", None), kw.pop("phrases", None)
    )
    return best_fragments_doc(text, wst, **kw)


def test_distinct_term_scoring():
    # QueryScorer counts each matched term ONCE per fragment
    out = frags("foo foo bar baz", terms=["foo", "bar"],
                weights={"foo": 2.0, "bar": 3.0}, fragment_size=100)
    assert len(out) == 1
    fi, score, txt = out[0]
    assert fi == 0
    assert score == pytest.approx(5.0)  # 2 + 3, second foo not re-added
    assert txt == "<b>foo</b> <b>foo</b> <b>bar</b> baz"


def test_fragment_boundaries_closed_form():
    # tokens "aaa bbb ccc ..." of len 3: end offsets 3,7,11,...;
    # fragment index must equal end_offset // fragment_size
    toks = [f"t{i:02d}" for i in range(40)]  # len-3 tokens
    text = " ".join(toks)
    out = frags(text, terms=toks, fragment_size=40, max_fragments=100)
    # every fragment scores > 0 (all tokens are query terms)
    got = {}
    for fi, _sc, txt in out:
        for t in txt.replace("<b>", "").replace("</b>", "").split():
            got[t] = fi
    ends = {}
    off = 0
    for t in toks:
        off += len(t)
        ends[t] = off
        off += 1
    for t in toks:
        assert got[t] == ends[t] // 40, t


def test_best_first_ordering_and_max_fragments():
    # fragment with 2 distinct terms outranks fragment with 1; ties in
    # score resolve to source order
    text = ("xx " * 13) + "foo bar " + ("yy " * 11) + "foo " + ("zz " * 11) + "bar"
    out = frags(text, terms=["foo", "bar"], fragment_size=40, max_fragments=2)
    assert len(out) == 2
    assert out[0][1] > out[1][1]  # best first
    assert "foo" in out[0][2] and "bar" in out[0][2]


def test_position_sensitive_phrase():
    # phrase ("fast","table"): stray "fast" neither scores nor marks up
    text = "fast car and then fast table end"
    out = frags(text, phrases=[("fast", "table")], fragment_size=200)
    assert len(out) == 1
    _fi, score, txt = out[0]
    assert score == pytest.approx(2.0)  # both phrase members, distinct
    assert txt == "fast car and then <b>fast</b> <b>table</b> end"


def test_span_fragmenter_keeps_phrase_whole():
    # default fragmenter splits the phrase across the 40-char boundary;
    # SimpleSpanFragmenter defers the cut
    # "aa "*11 = 33 chars: "fast" ends at 37 (frag 0), "table" ends at
    # 43 (crosses 40 -> frag 1) — the default fragmenter splits them
    text = ("aa " * 11) + "fast table " + ("bb " * 10)
    plain = frags(text, phrases=[("fast", "table")], fragment_size=40,
                  max_fragments=4)
    spanned = frags(text, phrases=[("fast", "table")], fragment_size=40,
                    max_fragments=4, span_fragmenter=True)
    # plain: the two members land in different fragments -> two
    # fragments each scoring 1.0; spanned: one fragment scoring 2.0
    assert max(sc for _f, sc, _t in plain) == pytest.approx(1.0)
    assert max(sc for _f, sc, _t in spanned) == pytest.approx(2.0)
    best = [t for _f, sc, t in spanned if sc == 2.0][0]
    assert "<b>fast</b> <b>table</b>" in best


def test_merge_contiguous():
    # frag 0: foo@3 + filler; frag 1: foo@43; frag 2+: filler; last
    # fragment: foo bar (score 2.0). Top-3 = {last, f0, f1}; f0 and f1
    # are adjacent -> merged with summed score.
    text = "foo " + ("xx " * 12) + "foo " + ("yy " * 24) + "zz foo bar"
    pre = frags(text, terms=["foo", "bar"], fragment_size=40,
                max_fragments=3)
    assert sorted(f for f, _s, _t in pre) == [0, 1, 3]
    out = frags(text, terms=["foo", "bar"], fragment_size=40,
                max_fragments=3, merge_contiguous=True)
    scores = sorted(sc for _f, sc, _t in out)
    assert len(out) == 2
    assert scores == [pytest.approx(2.0), pytest.approx(2.0)]
    merged = [t for _f, _s, t in out if t.count("<b>foo</b>") == 2]
    assert merged, out


def test_spark_matches_local(spark):
    rows = [
        (1, "foo foo bar baz"),
        (2, "fast car and then fast table end"),
        (3, "no hits here at all"),
        (4, ("xx " * 13) + "foo bar " + ("yy " * 11) + "foo"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = classic_highlight(
        df, terms=["foo", "bar"], fragment_size=40, max_fragments=2
    ).toPandas()
    wst = weighted_span_terms(["foo", "bar"])
    want = []
    for did, text in rows:
        for fi, sc, txt in best_fragments_doc(
            text, wst, fragment_size=40, max_fragments=2
        ):
            want.append((did, fi, int(round(sc * 1000)), txt))
    got = sorted(map(tuple, out.itertuples(index=False)))
    assert got == sorted(want)
    assert not any(did == 3 for did, *_ in got)
