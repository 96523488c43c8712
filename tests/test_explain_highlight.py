"""explain() and highlighter tests.

The explain contract is CheckHits (TF/search/CheckHits.java:318-333):
for every collected hit, explain(query, doc).value must reproduce the
collected score exactly; non-matching docs must report match=False.
"""

import pytest


@pytest.fixture(scope="module")
def searcher(built_index):
    from lucene_spark.search.executor import IndexSearcher

    return IndexSearcher(built_index)


QUERIES = []


def _queries():
    from lucene_spark.search import query as Q

    return [
        Q.TermQuery("content", "def"),
        Q.BooleanQuery(must=(Q.TermQuery("content", "def"),
                             Q.TermQuery("content", "return"))),
        Q.BooleanQuery(should=(Q.TermQuery("content", "import"),
                               Q.TermQuery("content", "class"))),
        Q.SynonymQuery("content", ("def", "return")),
        Q.DisjunctionMaxQuery(
            (Q.TermQuery("content", "def"), Q.TermQuery("content", "class")), 0.4
        ),
        Q.PhraseQuery("content", ("def", "parse_writer_0"), slop=2),
    ]


def test_explain_reproduces_scores(searcher):
    for q in _queries():
        top = searcher.search(q, k=5)
        if not top.hits:
            continue
        for h in top.hits:
            ex = searcher.explain(q, h.doc_id)
            assert ex["match"], (q, h)
            assert ex["value"] == h.score, (q, h.doc_id, ex["value"], h.score)


def test_explain_nonmatching_doc(searcher, built_index):
    from lucene_spark.search import query as Q

    # a doc NOT containing 'def': find one via match-all minus matches
    top = searcher.search(Q.TermQuery("content", "def"), k=10_000, prune=False)
    matched = {h.doc_id for h in top.hits}
    all_ids = {
        r["doc_id"] for r in built_index.doclens().select("doc_id").collect()
    }
    non = sorted(all_ids - matched)
    assert non
    ex = searcher.explain(Q.TermQuery("content", "def"), non[0])
    assert not ex["match"] and ex["value"] == 0.0


def test_explain_term_details(searcher):
    from lucene_spark.search import query as Q

    q = Q.TermQuery("content", "def")
    h = searcher.search(q, k=1).hits[0]
    ex = searcher.explain(q, h.doc_id)
    descs = [d["description"] for d in ex["details"]]
    assert any("freq" in d for d in descs)
    assert any("idf" in d for d in descs)
    assert any("normInverse" in d for d in descs)


def test_best_passage_picks_densest_window():
    from lucene_spark.search.highlight import best_passage

    text = "alpha beta gamma delta FOX epsilon fox zeta fox eta theta"
    snip, n, start = best_passage(text, {"fox"}, window=4)
    # window containing two 'fox' tokens beats single-hit windows
    assert n >= 2
    assert snip.count("<b>") == n
    assert "<b>FOX</b>" in snip or "<b>fox</b>" in snip
    assert start >= 1


def test_best_passage_no_hit():
    from lucene_spark.search.highlight import best_passage

    assert best_passage("nothing to see", {"fox"}, 5) == ("", 0, 0)


def test_highlight_dataframe(spark):
    from lucene_spark.search.highlight import highlight

    docs = spark.createDataFrame(
        [(0, "the quick brown fox jumps"), (1, "no animals at all"),
         (2, "fox and another Fox here")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in highlight(docs, ["fox", "quick"]).collect()}
    assert set(out) == {0, 2}
    assert "<b>quick</b>" in out[0]["snippet"] and "<b>fox</b>" in out[0]["snippet"]
    assert out[2]["n_hits"] == 2
