"""MultiPhraseQuery and NEAR semantics on hand-built docs."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def prox_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    docs = pd.DataFrame(
        {
            "repo": ["r"] * 5,
            "path": [f"f{i}" for i in range(5)],
            "commit": ["c"] * 5,
            "content": [
                "the quick brown fox",       # 0: quick->brown adjacent
                "the slow brown dog",        # 1: slow->brown adjacent
                "quick red fox brown",       # 2: quick..brown far
                "brown quick",               # 3: reversed
                "nothing here",              # 4
            ],
        }
    )
    idx = str(tmp_path_factory.mktemp("prox") / "idx")
    build_index(spark, spark.createDataFrame(docs), idx, IndexConfig(docs_per_segment=10))
    return IndexReader(spark, idx)


def test_multi_phrase_alternatives(prox_index):
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher

    s = IndexSearcher(prox_index)
    # (quick|slow) brown : docs 0 and 1
    top = s.search(
        Q.MultiPhraseQuery("content", (("quick", "slow"), ("brown",))), k=10
    )
    assert sorted(h.doc_id for h in top.hits) == [0, 1]
    # missing-term slot alternatives are pruned, absent slot kills query
    none = s.search(
        Q.MultiPhraseQuery("content", (("zzz",), ("brown",))), k=10
    )
    assert none.hits == []


def test_multi_phrase_matches_single_phrase_when_one_alt(prox_index):
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher

    s = IndexSearcher(prox_index)
    mp = s.search(Q.MultiPhraseQuery("content", (("quick",), ("brown",))), k=10)
    ph = s.search(Q.PhraseQuery("content", ("quick", "brown")), k=10)
    assert [(h.doc_id, h.score) for h in mp.hits] == [
        (h.doc_id, h.score) for h in ph.hits
    ]


def test_near_ordered_and_window(prox_index):
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher

    s = IndexSearcher(prox_index)

    def ids(window, ordered):
        top = s.search(
            Q.NearQuery("content", "quick", "brown", window=window, ordered=ordered),
            k=10,
        )
        return sorted(h.doc_id for h in top.hits)

    assert ids(1, True) == [0]          # adjacent only
    assert ids(2, True) == [0]          # doc2 gap is 3 -> excluded at 2
    assert ids(3, True) == [0, 2]       # doc2: quick@0, brown@3
    assert ids(1, False) == [0, 3]      # unordered picks up the reversal


def test_near_sqlpath_matches_executor(prox_index):
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher
    from lucene_spark.search.sqlpath import near_match_topk

    s = IndexSearcher(prox_index)
    a = sorted(
        h.doc_id
        for h in s.search(
            Q.NearQuery("content", "quick", "brown", window=3, ordered=True), k=10
        ).hits
    )
    b = sorted(
        r["doc_id"]
        for r in near_match_topk(
            prox_index, "content", "quick", "brown", window=3, ordered=True
        ).collect()
    )
    assert a == b


def test_scoring_rewrite_equals_expanded_bool(built_index):
    """SCORING_BOOLEAN_REWRITE == explicit SHOULD of the expanded
    terms, float32-identical; TooManyClauses past the cap."""
    import pytest

    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher

    r = built_index
    s = IndexSearcher(r)
    pq = Q.PrefixQuery("content", "s")
    terms = r.expand(pq)
    assert len(terms) > 1
    a = s.search(Q.ScoringRewriteQuery(pq), k=10)
    b = s.search(
        Q.BooleanQuery(should=tuple(Q.TermQuery("content", t) for t in terms)),
        k=10,
    )
    assert [(h.doc_id, h.score) for h in a.hits] == [
        (h.doc_id, h.score) for h in b.hits
    ]
    # constant-score default differs (all matches score boost)
    c = s.search(pq, k=10)
    assert all(h.score == 1.0 for h in c.hits)
    with pytest.raises(Q.TooManyClauses):
        s.search(Q.ScoringRewriteQuery(pq, max_clause_count=1), k=10)
