"""suggest/document completion queries — lucene_spark/search/completion.py.

Reference semantics: TestSuggestField.java / TestContextQuery.java /
TestFuzzyCompletionQuery.java shapes — per-document entries with
index-time weights, the CompletionScorer score algebra, the fuzzy
common-prefix boost, and context boosting/filtering.
"""

import pytest
from pyspark.sql import Row, functions as F

from lucene_spark.search.completion import (
    build_suggest_entries,
    context_completion,
    fuzzy_completion,
    prefix_completion,
    regex_completion,
)


@pytest.fixture(scope="module")
def entries(spark):
    rows = [
        Row(doc_id=1, sugg="suggestion", w=4, ctx=["type1"]),
        Row(doc_id=2, sugg="suggestion", w=3, ctx=["type2"]),
        Row(doc_id=3, sugg="sugfoo", w=10, ctx=["type2", "type3"]),
        Row(doc_id=4, sugg="summer", w=7, ctx=["type4"]),
        Row(doc_id=5, sugg="Sweet Dreams", w=2, ctx=None),
        Row(doc_id=6, sugg="abc", w=0, ctx=["type1"]),
    ]
    docs = spark.createDataFrame(rows).withColumn(
        "ctx1", F.explode_outer("ctx")
    )
    return build_suggest_entries(
        docs, "sugg", "w", contexts_col="ctx1"
    ).cache()


def _rows(df):
    return [(r["doc_id"], r["surface"], r["score_x1e6"]) for r in df.collect()]


def test_prefix_completion_weight_order(entries):
    # TestSuggestField#testSimple: prefix walk, weight DESC, score ==
    # index weight (boost 0)
    got = _rows(prefix_completion(entries, "sug", k=10))
    assert got == [
        (3, "sugfoo", 10),
        (1, "suggestion", 4),
        (2, "suggestion", 3),
    ]


def test_prefix_analyzed_multi_token_key(entries):
    # the surface analyzes to "sweet dreams"; typed "Sweet dr" goes
    # through the same chain (CompletionAnalyzer role)
    got = _rows(prefix_completion(entries, "Sweet dr", k=5))
    assert got == [(5, "Sweet Dreams", 2)]


def test_prefix_skip_duplicates(entries):
    # SuggestIndexSearcher.suggest(n, skipDuplicates=true): one row per
    # surface, best (score, doc_id) kept
    got = _rows(prefix_completion(entries, "sug", k=10, skip_duplicates=True))
    assert got == [(3, "sugfoo", 10), (1, "suggestion", 4)]


def test_prefix_filter_bitsproducer(entries):
    # BitsProducer analog: arbitrary boolean filter over the entries
    got = _rows(
        prefix_completion(entries, "sug", k=10, filter_expr=F.col("doc_id") > 1)
    )
    assert got == [(3, "sugfoo", 10), (2, "suggestion", 3)]


def test_regex_is_prefix_anchored_and_unanalyzed(entries):
    got = _rows(regex_completion(entries, "su[gm]", k=10))
    assert got == [
        (3, "sugfoo", 10),
        (4, "summer", 7),
        (1, "suggestion", 4),
        (2, "suggestion", 3),
    ]
    # no implicit '.*' prefix: pattern must match from the first char
    assert _rows(regex_completion(entries, "ug", k=10)) == []


def test_fuzzy_boost_common_prefix(entries):
    # typed 'sugg' (len 4): exact-prefix matches boost at len-1 = 3;
    # 'sugfoo' matches via prefix 'sugf' (1 edit), lcp = 3 -> also 3
    # (FuzzyCompletionQuery:268 — end-edit == exact); 'summer' matches
    # via 'sumr'? no — lev('sugg', 'summ')=2 > 1 -> out
    got = _rows(fuzzy_completion(entries, "sugg", k=10))
    assert got == [
        (3, "sugfoo", 30),   # 10 * 3
        (1, "suggestion", 12),  # 4 * 3
        (2, "suggestion", 9),
    ]


def test_fuzzy_mid_edit_lower_boost(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=1, sugg="sxggest", w=5, c=None)],
        "doc_id long, sugg string, w long, c string",
    )
    e = build_suggest_entries(docs, "sugg", "w", contexts_col="c")
    # typed 'sugg': key 'sxggest' matches prefix 'sxgg' with 1 edit at
    # position 2 -> lcp = 1 -> score 5 * 1
    got = _rows(fuzzy_completion(e, "sugg", k=5))
    assert got == [(1, "sxggest", 5)]


def test_fuzzy_short_key_exact_only(entries):
    # typed below min_fuzzy_length matches exactly only; the boost
    # machinery still applies on the exact path (setNextMatch runs for
    # every match): lcp 2 capped at len-1 = 1, weight 0 -> score 1
    assert _rows(fuzzy_completion(entries, "ab", k=5)) == [(6, "abc", 1)]
    # and a fuzzy variant below the length bar does NOT match
    assert _rows(fuzzy_completion(entries, "ax", k=5)) == []


def test_score_algebra_zero_weight(entries):
    # CompletionScorer.score: weight == 0 -> boost
    got = _rows(fuzzy_completion(entries, "abcd", k=5, min_fuzzy_length=3))
    # key 'abc' matches 'abcd' via prefix 'abc' (1 deletion);
    # lcp('abcd','abc') = 3 == len-1 cap; weight 0 -> score = boost = 3
    assert got == [(6, "abc", 3)]


def test_context_filter_and_boost(entries):
    # TestContextQuery: exact contexts with boosts; scores multiply
    got = _rows(
        context_completion(
            entries, "sug",
            contexts={"type1": (2.0, True), "type2": (3.0, True)},
            k=10,
        )
    )
    # doc 3 ('sugfoo', w=10, ctx type2+type3): best = type2 boost 3 -> 30
    # doc 1 (w=4, type1): 4*2=8; doc 2 (w=3, type2): 3*3=9
    assert got == [(3, "sugfoo", 30), (2, "suggestion", 9), (1, "suggestion", 8)]


def test_context_prefix_match(entries):
    # non-exact context = prefix match over contexts
    got = _rows(
        context_completion(entries, "sug", contexts={"type": (2.0, False)}, k=10)
    )
    assert got == [(3, "sugfoo", 20), (1, "suggestion", 8), (2, "suggestion", 6)]


def test_context_match_all_reaches_null_context(entries):
    # addAllContexts: every entry matches with context boost 0 (score =
    # weight), incl. plain SuggestField (NULL-context) entries
    got = _rows(context_completion(entries, "s", match_all=True, k=10))
    assert got == [
        (3, "sugfoo", 10),
        (4, "summer", 7),
        (1, "suggestion", 4),
        (2, "suggestion", 3),
        (5, "Sweet Dreams", 2),
    ]


def test_context_unmatched_filtered_out(entries):
    got = _rows(
        context_completion(entries, "summ", contexts={"type9": (1.0, True)}, k=10)
    )
    assert got == []
