"""FastVectorHighlighter (lucene_spark/search/fvh.py): phrase-aware
highlighting from indexed term vectors, fragment packing/scoring/
ordering — the vectorhighlight package semantics."""

import pytest

from lucene_spark.search.fvh import _frag_list, _phrase_infos, highlight_doc


def hits(text, terms):
    """Build hits_by_term from whitespace tokens (test helper)."""
    out = {}
    pos = 0
    off = 0
    for tok in text.split(" "):
        t = tok.lower()
        if t in terms:
            out.setdefault(t, []).append((pos, off, off + len(tok)))
        off += len(tok) + 1
        pos += 1
    return out


def test_single_term_fragments():
    text = "the quick brown fox jumps over the lazy dog"
    got = highlight_doc(
        text, hits(text, {"fox"}), [("fox",)], frag_char_size=30
    )
    assert len(got) == 1
    frag, score = got[0]
    assert "<b>fox</b>" in frag and score == 1.0


def test_phrase_only_highlights_adjacent():
    """The FVH signature: a phrase query highlights only consecutive
    occurrences, never the stray single terms."""
    text = "foo alone here then foo bar together and bar alone"
    got = highlight_doc(
        text,
        hits(text, {"foo", "bar"}),
        [("foo", "bar")],
        frag_char_size=200,
    )
    assert len(got) == 1
    frag, score = got[0]
    assert "<b>foo</b> <b>bar</b> together" in frag
    assert frag.count("<b>") == 2  # stray foo/bar untagged
    assert score == 2.0  # phrase boost = sum of term weights


def test_fragment_scores_and_score_order():
    text = ("alpha " * 30) + "beta beta beta " + ("filler " * 30) + "beta"
    h = hits(text, {"beta"})
    got = highlight_doc(
        text, h, [("beta",)], frag_char_size=40, max_num_fragments=2,
        score_order=True,
    )
    assert len(got) == 2
    # densest fragment (3 betas) first under score order
    assert got[0][1] == 3.0 and got[1][1] == 1.0
    got_src = highlight_doc(
        text, h, [("beta",)], frag_char_size=40, max_num_fragments=2,
        score_order=False,
    )
    assert [s for _f, s in got_src] == [3.0, 1.0]  # source order same here


def test_weights_scale_boosts():
    text = "x y"
    got = highlight_doc(
        text, hits(text, {"x", "y"}), [("x",), ("y",)],
        weights={"x": 5.0}, frag_char_size=50,
    )
    assert got[0][1] == 6.0  # 5 + 1 in one fragment


def test_frag_margin_and_packing():
    infos = [(100, 104, 1.0, [(100, 104)]), (120, 124, 1.0, [(120, 124)])]
    frags = _frag_list(infos, frag_char_size=100, text_len=1000)
    # margin = 25 chars ahead; both phrases fit one fragment
    assert len(frags) == 1
    lo, hi, score, spans = frags[0]
    assert lo == 75 and hi == 175 and score == 2.0 and len(spans) == 2


def test_phrase_infos_span_and_order():
    h = {
        "new": [(3, 30, 33)],
        "york": [(4, 34, 38), (9, 80, 84)],
    }
    infos = _phrase_infos(h, [("new", "york")], None)
    assert infos == [(30, 38, 2.0, [(30, 33), (34, 38)])]


def test_end_to_end_from_index(spark, tmp_path):
    import pandas as pd

    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader
    from lucene_spark.search.fvh import fast_vector_highlight

    rows = pd.DataFrame(
        {
            "repo": ["r"] * 3,
            "path": ["a", "b", "c"],
            "commit": ["c"] * 3,
            "lang": ["txt"] * 3,
            "content": [
                "the fast table scan beats the slow table walk",
                "fast cars and fast table tennis",
                "nothing relevant here at all",
            ],
        }
    )
    idx = str(tmp_path / "fvhidx")
    build_index(
        spark,
        spark.createDataFrame(rows),
        idx,
        IndexConfig(
            analyzer="simple", docs_per_segment=10, num_batches=1,
            store_offsets=True,
        ),
    )
    r = IndexReader(spark, idx)
    # stored text straight from the fixture frame (doc order = sorted
    # (repo, path, commit) = a, b, c)
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0, 1, 2], "text": rows["content"]})
    )
    out = fast_vector_highlight(
        r, "content", [("fast", "table")], docs, [0, 1, 2],
        frag_char_size=30, max_num_fragments=2,
    ).toPandas()
    assert out["doc_id"].tolist() == [0, 1]
    assert any("<b>fast</b> <b>table</b>" in f for f in out.iloc[0]["fragments"])
    # doc 1: "fast cars" must NOT be tagged — phrase-aware
    frag1 = " ".join(out.iloc[1]["fragments"])
    assert "<b>fast</b> <b>table</b> tennis" in frag1
    assert "<b>fast</b> cars" not in frag1
