"""Percolator tests: standing-query matching semantics, presearcher
recall, and the real Structured Streaming path."""

import os

import pytest

from lucene_spark.search import query as Q


@pytest.fixture(scope="module")
def monitor():
    from lucene_spark.streaming.percolator import Monitor

    m = Monitor(analyzer="standard")
    m.register("q_term", Q.TermQuery("content", "alert"))
    m.register("q_bool", "error AND (disk OR network)")
    m.register("q_phrase", Q.PhraseQuery("content", ("out", "of", "memory")))
    m.register("q_not", "warning NOT ignored")
    m.register("q_prefix", Q.PrefixQuery("content", "auth"))
    m.register("q_near", Q.NearQuery("content", "failed", "login", window=3))
    return m


@pytest.fixture(scope="module")
def doc_rows(spark):
    rows = [
        (0, "ALERT something happened"),
        (1, "error on the disk array"),
        (2, "error over the network link"),
        (3, "plain error without cause"),
        (4, "process ran out of memory yesterday"),
        (5, "memory of out order words"),
        (6, "warning raised and handled"),
        (7, "warning safely ignored here"),
        (8, "authentication subsystem booted"),
        (9, "failed user login attempt"),
        (10, "login never failed today"),
        (11, "nothing interesting"),
    ]
    return spark.createDataFrame(rows, "doc_id long, content string")


def _pairs(monitor, docs):
    return {(r["doc_id"], r["query_id"]) for r in monitor.match_df(docs).collect()}


def test_percolator_semantics(monitor, doc_rows):
    got = _pairs(monitor, doc_rows)
    assert (0, "q_term") in got            # lowercased by the analyzer
    assert (1, "q_bool") in got and (2, "q_bool") in got
    assert (3, "q_bool") not in got        # neither disk nor network
    assert (4, "q_phrase") in got
    assert (5, "q_phrase") not in got      # words present, order wrong
    assert (6, "q_not") in got
    assert (7, "q_not") not in got         # 'ignored' vetoes
    assert (8, "q_prefix") in got
    assert (9, "q_near") in got            # failed ... login within 3
    assert (10, "q_near") not in got       # reversed, ordered query
    assert all(d != 11 for d, _ in got)


def test_presearcher_is_safe(monitor, doc_rows):
    """Brute-force evaluation (no prefilter) must produce the same
    pairs — the presearcher only prunes, never drops a match."""
    from lucene_spark.streaming.percolator import _matches
    from lucene_spark.analysis import get_analyzer

    an = get_analyzer("standard")
    want = set()
    for r in doc_rows.collect():
        toks = an.tokenize_one(r["content"])
        for qid, q in monitor.queries.items():
            if _matches(q, toks, set(toks)):
                want.add((r["doc_id"], qid))
    assert _pairs(monitor, doc_rows) == want


def test_percolator_streaming(monitor, doc_rows, spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    doc_rows.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(doc_rows.schema).parquet(src)
    out = monitor.match_df(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("perc_test")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["doc_id"], r["query_id"])
        for r in spark.sql("SELECT * FROM perc_test").collect()
    }
    assert got == _pairs(monitor, doc_rows)


def test_multiterm_standing_queries(spark):
    """Wildcard / regexp / term-set / fuzzy standing queries (Monitor
    accepts any Query; presearcher: exact-set queries fingerprint by
    the set, pattern queries are always-candidates)."""
    import pandas as pd

    from lucene_spark.search import query as Q
    from lucene_spark.streaming.percolator import Monitor

    m = Monitor()
    m.register("w", Q.WildcardQuery("content", "merg*"))
    m.register("r", Q.RegexpQuery("content", "so.t"))
    m.register("s", Q.TermInSetQuery("content", ("alpha", "beta")))
    m.register("f", Q.FuzzyQuery("content", "spark", max_edits=1))
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "content": [
                    "merge sort wins",      # w (merge), r (sort)
                    "beta release spork",   # s (beta), f (spork~spark)
                    "nothing relevant",
                    "merged alpha",         # w (merged), s (alpha)
                ],
            }
        )
    )
    got = sorted(
        (r["doc_id"], r["query_id"])
        for r in m.match_df(docs).collect()
    )
    assert got == [(0, "r"), (0, "w"), (1, "f"), (1, "s"), (3, "s"), (3, "w")]


def test_fuzzy_banded_levenshtein():
    from lucene_spark.streaming.percolator import _within_edits

    assert _within_edits("spark", "spork", 1)
    assert not _within_edits("spark", "spoke", 2)  # distance 3
    assert _within_edits("spark", "sparkle", 2)  # two inserts
    assert _within_edits("abc", "abc", 0)
    assert not _within_edits("abc", "abcd", 0)
    assert _within_edits("", "ab", 2)
    assert not _within_edits("kitten", "sitting", 2)  # distance 3


def test_scoring_matcher_parity_and_scores(monitor, doc_rows):
    """ScoringMatch path: same match set as the boolean matcher, plus
    scores bit-identical to a per-doc MemoryIndex search."""
    import numpy as np

    from lucene_spark.memory import MemoryIndex

    scored = monitor.match_scores_df(doc_rows).collect()
    assert {(r["doc_id"], r["query_id"]) for r in scored} == _pairs(
        monitor, doc_rows
    )
    texts = {r["doc_id"]: r["content"] for r in doc_rows.collect()}
    for r in scored:
        assert r["score"] > 0.0
        mi = MemoryIndex("standard")
        mi.add_field("content", texts[r["doc_id"]])
        assert np.float32(r["score"]) == np.float32(
            mi.search(monitor.queries[r["query_id"]])
        )


def test_scoring_matcher_widens_query_surface(spark):
    """Interval/span/sloppy standing queries work on the scoring path
    (the boolean _matches walker does not support them)."""
    from lucene_spark.streaming.percolator import Monitor

    m = Monitor(analyzer="standard")
    m.register(
        "q_interval",
        Q.IntervalQuery(
            "content",
            Q.IOrdered((Q.ITerm("disk"), Q.ITerm("failure")), max_gaps=2),
        ),
    )
    m.register("q_sloppy", Q.PhraseQuery("content", ("kernel", "panic"), slop=2))
    docs = spark.createDataFrame(
        [
            (0, "disk controller failure detected"),
            (1, "failure of the disk"),
            (2, "kernel mode panic trace"),
            (3, "panic kernel trace"),
            (4, "unrelated text"),
        ],
        "doc_id long, content string",
    )
    got = {(r["doc_id"], r["query_id"]) for r in m.match_scores_df(docs).collect()}
    assert (0, "q_interval") in got
    assert (1, "q_interval") not in got  # ordered
    assert (2, "q_sloppy") in got
    assert (3, "q_sloppy") in got  # slop 2 allows transposition
    assert all(d != 4 for d, _ in got)


def test_highlights_matcher_spans(spark):
    """HighlightsMatch: spans point at the original surface text of the
    query terms, per matching (doc, query)."""
    from lucene_spark.streaming.percolator import Monitor

    m = Monitor(analyzer="standard")
    m.register("q_disk", "disk AND failure")
    m.register("q_other", Q.TermQuery("content", "kernel"))
    docs = spark.createDataFrame(
        [
            (0, "Disk failure: the disk died"),
            (1, "kernel panic"),
            (2, "nothing"),
        ],
        "doc_id long, content string",
    )
    rows = m.match_highlights_df(docs).collect()
    texts = {0: "Disk failure: the disk died", 1: "kernel panic"}
    assert {(r["doc_id"], r["query_id"]) for r in rows} == {
        (0, "q_disk"), (1, "q_other")
    }
    for r in rows:
        assert texts[r["doc_id"]][r["start"]:r["end"]].lower() == r["term"]
    # every occurrence of each query term is reported: 'disk' twice
    assert sum(1 for r in rows if r["term"] == "disk") == 2


# ---------------------------------------------------------------------------
# multipass presearcher (monitor/MultipassTermFilteredPresearcher.java)
# ---------------------------------------------------------------------------


def test_multipass_term_sets():
    from lucene_spark.search import query as Q
    from lucene_spark.streaming.percolator import _required_term_sets

    ph = Q.PhraseQuery("content", ("foo", "bar"))
    assert _required_term_sets(ph, 2) == [{"foo"}, {"bar"}]
    assert _required_term_sets(ph, 1) == [{"foo"}]
    bq = Q.BooleanQuery(
        must=(Q.TermQuery("content", "a"), Q.TermQuery("content", "b"))
    )
    assert _required_term_sets(bq, 2) == [{"a"}, {"b"}]
    # disjunction: pass-i set unions children; missing child depth stops
    dq = Q.BooleanQuery(should=(ph, Q.PhraseQuery("content", ("x", "y"))))
    assert _required_term_sets(dq, 2) == [{"foo", "x"}, {"bar", "y"}]
    # pattern child forces always-candidate
    dq2 = Q.BooleanQuery(
        should=(Q.TermQuery("content", "a"), Q.WildcardQuery("content", "b*"))
    )
    assert _required_term_sets(dq2, 2) == []


def test_multipass_prunes_candidates_keeps_matches(spark):
    """A phrase query over two terms: single-pass admits every doc
    containing either term; two passes admit only docs containing BOTH
    — strictly fewer candidates, identical final matches."""
    import pandas as pd

    from lucene_spark.search import query as Q
    from lucene_spark.streaming.percolator import Monitor, _candidates

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(4),
                "content": [
                    "spark table scan",        # has neither pair term
                    "fast cars on the road",   # 'fast' only
                    "a fast table indeed",     # both, adjacent -> match
                    "table first fast later",  # both, not adjacent
                ],
            }
        )
    )
    q = Q.PhraseQuery("content", ("fast", "table"))
    results = {}
    cand_counts = {}
    for passes in (1, 2):
        m = Monitor(analyzer="simple", passes=passes)
        m.register("p", q)
        results[passes] = sorted(
            (r["doc_id"], r["query_id"]) for r in m.match_df(docs).collect()
        )
        pre = m._presearcher(m.queries)
        an_toks = [
            set(t.split()) for t in [
                "spark table scan", "fast cars on the road",
                "a fast table indeed", "table first fast later",
            ]
        ]
        cand_counts[passes] = sum(
            len(_candidates(ts, pre)) for ts in an_toks
        )
    assert results[1] == results[2] == [(2, "p")]
    assert cand_counts[2] < cand_counts[1]  # 2 docs vs 3 docs admitted


def test_multipass_recall_equals_single_pass(spark, corpus):
    from lucene_spark.search import query as Q
    from lucene_spark.streaming.percolator import Monitor

    docs = spark.createDataFrame(corpus).limit(150).selectExpr(
        "monotonically_increasing_id() AS doc_id", "content"
    )
    queries = {
        "t": Q.TermQuery("content", "return"),
        "b": Q.BooleanQuery(
            must=(Q.TermQuery("content", "def"), Q.TermQuery("content", "return"))
        ),
        "ph": Q.PhraseQuery("content", ("def", "main")),
        "pre": Q.PrefixQuery("content", "im"),
    }
    outs = {}
    for passes in (1, 3):
        m = Monitor(analyzer="simple", passes=passes)
        for k, v in queries.items():
            m.register(k, v)
        outs[passes] = sorted(
            (r["doc_id"], r["query_id"]) for r in m.match_df(docs).collect()
        )
    assert outs[1] == outs[3]
