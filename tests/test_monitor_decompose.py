"""Monitor QueryDecomposer + RegexpQueryHandler
(monitor/QueryDecomposer.java, RegexpQueryHandler.java,
SuffixingNGramTokenFilter.java; TestQueryDecomposer /
TestRegexpQueryHandler patterns)."""

import pandas as pd

from lucene_spark.search import query as Q
from lucene_spark.streaming.percolator import (
    Monitor,
    _candidates,
    _regexp_static_substring,
    decompose,
)

T = Q.TermQuery


def test_decompose_disjunction():
    q = Q.BooleanQuery(should=(T("f", "a"), T("f", "b")))
    assert decompose(q) == [T("f", "a"), T("f", "b")]
    # nested disjunctions flatten
    q2 = Q.BooleanQuery(should=(q, T("f", "c")))
    assert decompose(q2) == [T("f", "a"), T("f", "b"), T("f", "c")]


def test_decompose_keeps_conjunctions_whole():
    q = Q.BooleanQuery(must=(T("f", "a"),), should=(T("f", "b"),))
    assert decompose(q) == [q]
    q2 = Q.BooleanQuery(should=(T("f", "a"), T("f", "b")), min_should=2)
    assert decompose(q2) == [q2]
    q3 = Q.BooleanQuery(must=(T("f", "a"), T("f", "b")))
    assert decompose(q3) == [q3]


def test_decompose_single_must_recurses():
    inner = Q.BooleanQuery(should=(T("f", "a"), T("f", "b")))
    q = Q.BooleanQuery(must=(inner,))
    assert decompose(q) == [T("f", "a"), T("f", "b")]


def test_decompose_reattaches_exclusions():
    q = Q.BooleanQuery(
        should=(T("f", "a"), T("f", "b")), must_not=(T("f", "x"),)
    )
    got = decompose(q)
    assert got == [
        Q.BooleanQuery(must=(T("f", "a"),), must_not=(T("f", "x"),)),
        Q.BooleanQuery(must=(T("f", "b"),), must_not=(T("f", "x"),)),
    ]


def test_decompose_dismax_and_boost():
    q = Q.DisjunctionMaxQuery((T("f", "a"), T("f", "b")))
    assert decompose(q) == [T("f", "a"), T("f", "b")]
    b = Q.BoostQuery(
        Q.BooleanQuery(should=(T("f", "a"), T("f", "b"))), 2.0
    )
    assert decompose(b) == [
        Q.BoostQuery(T("f", "a"), 2.0),
        Q.BoostQuery(T("f", "b"), 2.0),
    ]


def test_regexp_static_substring():
    # split on '.', '*' and 'X?' exactly as the reference
    assert _regexp_static_substring("foo.*bar") == "foo"
    assert _regexp_static_substring("he.l*owor") == "owor"
    assert _regexp_static_substring("dat.*base") == "base"
    assert _regexp_static_substring("colou?r") == "colo"


def test_decomposed_presearcher_prunes_per_arm():
    m = Monitor()
    m.register("q1", Q.BooleanQuery(
        should=(T("content", "alpha"), T("content", "beta"))
    ))
    pre = m._presearcher(m.queries)
    prefilter, need, always, re_f, _ = pre
    assert not always and not re_f
    assert len(need) == 2  # two independently-fingerprinted arms
    assert _candidates({"beta", "zzz"}, pre) == {"q1"}
    assert _candidates({"gamma"}, pre) == set()


def test_regexp_handler_prunes_and_matches():
    m = Monitor(regexp_ngrams=True)
    m.register("r1", Q.RegexpQuery("content", "dat.*se"))
    pre = m._presearcher(m.queries)
    _, _, always, re_f, _ = pre
    assert not always and list(re_f.values()) == ["dat"]
    # substring hit -> candidate; no hit -> pruned
    assert _candidates({"database", "x"}, pre) == {"r1"}
    assert _candidates({"nothing", "here"}, pre) == set()
    # over-long token -> wildcard acceptance
    assert _candidates({"a" * 31}, pre) == {"r1"}
    # without the handler the regexp is always-candidate
    m2 = Monitor(regexp_ngrams=False)
    m2.register("r1", Q.RegexpQuery("content", "dat.*se"))
    pre2 = m2._presearcher(m2.queries)
    assert _candidates({"nothing"}, pre2) == {"r1"}


def test_end_to_end_match_df(spark):
    m = Monitor(regexp_ngrams=True)
    m.register("disj", "alpha OR beta")
    m.register("conj", "+alpha +gamma")
    m.register("rex", Q.RegexpQuery("content", "dat.*se"))
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                "content": [
                    "only beta here",
                    "alpha gamma both",
                    "the database rows",
                    "nothing relevant",
                ],
            }
        )
    )
    got = (
        m.match_df(docs)
        .toPandas()
        .sort_values(["doc_id", "query_id"])
        .values.tolist()
    )
    assert got == [[0, "disj"], [1, "conj"], [1, "disj"], [2, "rex"]]


# ---------------------------------------------------------------------------
# MonitorQuerySerializer durability (monitor/MonitorQuerySerializer
# .java fromParser + WritableQueryIndex / ReadonlyQueryIndex)
# ---------------------------------------------------------------------------


def test_monitor_save_load_roundtrip(spark, tmp_path):
    import pandas as pd

    from lucene_spark.streaming.percolator import Monitor

    m = Monitor(analyzer="simple", passes=2, regexp_ngrams=True)
    m.register("q1", "alpha AND beta", "content")
    m.register("q2", '"exact phrase"', "content")
    p = str(tmp_path / "monitor.json")
    m.save(p)
    m2 = Monitor.load(p)
    assert set(m2.queries) == {"q1", "q2"}
    assert m2.passes == 2 and m2.analyzer_name == "simple"
    assert m2.regexp_ngrams is True
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2],
                "content": [
                    "alpha beta gamma",
                    "only alpha here",
                    "an exact phrase appears",
                ],
            }
        )
    )
    got = {
        (r.doc_id, r.query_id)
        for r in m2.match_df(docs).collect()
    }
    want = {
        (r.doc_id, r.query_id)
        for r in m.match_df(docs).collect()
    }
    assert got == want and (0, "q1") in got and (2, "q2") in got


def test_monitor_save_object_query_raises(tmp_path):
    import pytest as _pytest

    from lucene_spark.search import query as Q
    from lucene_spark.streaming.percolator import Monitor

    m = Monitor()
    m.register("obj", Q.TermQuery("content", "alpha"))
    with _pytest.raises(ValueError, match="object-registered"):
        m.save(str(tmp_path / "m.json"))


def test_monitor_deregister(tmp_path):
    from lucene_spark.streaming.percolator import Monitor

    m = Monitor()
    m.register("a", "alpha")
    m.register("b", "beta")
    m.deregister("a")
    p = str(tmp_path / "m.json")
    m.save(p)
    assert set(Monitor.load(p).queries) == {"b"}
