"""Sandbox query extras: PhraseWildcardQuery, NGramPhraseQuery,
MultiRangeQuery (reference sandbox/ module analogs)."""

import numpy as np
import pandas as pd
import pytest


def test_phrase_wildcard_equals_expanded_multiphrase(built_index):
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher

    s = IndexSearcher(built_index)
    wq = Q.PhraseWildcardQuery(
        "content", (Q.PrefixQuery("content", "re"), Q.TermQuery("content", "x"))
    )
    # manual expansion through the same term dictionary
    ex = tuple(sorted(built_index.expand(Q.PrefixQuery("content", "re"))))
    assert ex  # corpus has re* terms (return, ...)
    mq = Q.MultiPhraseQuery("content", (ex, ("x",)))
    a = s.search(wq, k=50)
    b = s.search(mq, k=50)
    assert [(h.doc_id, h.score) for h in a.hits] == [
        (h.doc_id, h.score) for h in b.hits
    ]


def test_phrase_wildcard_empty_expansion_matches_nothing(built_index):
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher

    wq = Q.PhraseWildcardQuery(
        "content", (Q.PrefixQuery("content", "zzzzz"), "def")
    )
    assert IndexSearcher(built_index).search(wq, k=5).total_hits == 0


@pytest.fixture(scope="module")
def ngram_index(spark, tmp_path_factory):
    """Index whose field is 2-gram analyzed text — the NGramPhraseQuery
    habitat. Grams are synthesized as space-joined tokens so the plain
    analyzer produces the gram stream with correct positions."""
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    rng = np.random.default_rng(11)
    docs = []
    for _ in range(60):
        word = "".join(rng.choice(list("abcd"), size=rng.integers(4, 12)))
        grams = [word[i:i + 2] for i in range(len(word) - 1)]
        docs.append(" ".join(grams))
    pdf = pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    idx = str(tmp_path_factory.mktemp("ng") / "idx")
    build_index(
        spark, spark.createDataFrame(pdf), idx,
        IndexConfig(
            field="text", content_col="text", analyzer="whitespace",
            doc_id_col="doc_id", docs_per_segment=25,
        ),
    )
    return IndexReader(spark, idx), docs


def test_ngram_phrase_matches_full_phrase(ngram_index):
    """The every-n-th-gram rewrite must return the same DOCS as the
    full gram phrase (the NGramPhraseQuery equivalence)."""
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher

    reader, docs = ngram_index
    s = IndexSearcher(reader)
    # search for the gram streams of a few substrings
    for target in ("abca", "dcba", "aabb", "abcd"):
        grams = tuple(target[i:i + 2] for i in range(len(target) - 1))
        full = s.search(Q.PhraseQuery("text", grams), k=100, prune=False)
        ng = s.search(Q.NGramPhraseQuery("text", grams, n=2), k=100, prune=False)
        assert sorted(h.doc_id for h in ng.hits) == sorted(
            h.doc_id for h in full.hits
        ), target
        # ground truth against the raw text
        want = sorted(
            i for i, d in enumerate(docs)
            if " ".join(grams) in d or d.startswith(" ".join(grams))
        )
        have = sorted(h.doc_id for h in full.hits)
        # phrase over gram stream == substring of the gram stream
        want2 = sorted(
            i for i, d in enumerate(docs)
            if " ".join(grams) in f" {d} ".replace("  ", " ")
        )
        assert have == sorted(
            i for i, d in enumerate(docs) if _gram_contains(d, grams)
        ), target


def _gram_contains(doc: str, grams) -> bool:
    toks = doc.split()
    n = len(grams)
    return any(
        tuple(toks[i:i + n]) == tuple(grams) for i in range(len(toks) - n + 1)
    )


def test_multi_range_query(built_index, spark):
    from pyspark.sql import functions as F

    from lucene_spark.search import sqlpath as sp

    # the built_index docs registry carries no numeric col beyond what
    # the corpus has; synthesize length via the registry's content? use
    # the gate index over documents instead
    from lucene_spark.gate import ensure_index

    r = ensure_index(spark, "/root/testdata/sf0.001")
    got = sp.multi_range_topk(r, "n_chars", [(50, 90), (300, 350)], k=100)
    rows = got.collect()
    vals = {
        x["doc_id"]: x["n_chars"]
        for x in r.docs().select("doc_id", "n_chars").collect()
    }
    assert rows
    for row in rows:
        v = vals[row["doc_id"]]
        assert 50 <= v <= 90 or 300 <= v <= 350


def test_phrase_wildcard_shared_expansion_budget(built_index):
    """max_expansions is a TOTAL budget across multi-term slots
    (PhraseWildcardQuery.java:64-76), not per-slot: a first slot that
    consumes the whole budget leaves nothing for the second."""
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher

    s = IndexSearcher(built_index)
    p1 = Q.PrefixQuery("content", "st")   # static/string/struct
    p2 = Q.PrefixQuery("content", "im")   # impl/import
    n1 = len(built_index.expand(p1))
    n2 = len(built_index.expand(p2))
    assert n1 >= 2 and n2 >= 2

    # ample budget: equals the fully-expanded MultiPhrase, and matches
    # real docs ("struct import" occurs in the fixture corpus)
    full = s.search(Q.PhraseWildcardQuery("content", (p1, p2)), k=50)
    assert full.total_hits > 0
    ex1 = tuple(sorted(built_index.expand(p1)))
    ex2 = tuple(sorted(built_index.expand(p2)))
    mq = Q.MultiPhraseQuery("content", (ex1, ex2))
    b = s.search(mq, k=50)
    assert [(h.doc_id, h.score) for h in full.hits] == [
        (h.doc_id, h.score) for h in b.hits
    ]

    # budget covers slot 1 fully plus ONE term of slot 2
    wq = Q.PhraseWildcardQuery("content", (p1, p2), max_expansions=n1 + 1)
    mq1 = Q.MultiPhraseQuery("content", (ex1, ex2[:1]))
    a = s.search(wq, k=50)
    c = s.search(mq1, k=50)
    assert [(h.doc_id, h.score) for h in a.hits] == [
        (h.doc_id, h.score) for h in c.hits
    ]

    # budget exhausted by slot 1 -> slot 2 expands to nothing -> no hits
    wq0 = Q.PhraseWildcardQuery("content", (p1, p2), max_expansions=n1)
    assert s.search(wq0, k=5).total_hits == 0


# ---------------------------------------------------------------------------
# FuzzyLikeThisQuery (sandbox/queries/FuzzyLikeThisQuery.java)
# ---------------------------------------------------------------------------


def test_fuzzy_like_this_matches_python_replay(spark, built_index):
    import math

    from lucene_spark.search.fuzzylikethis import (
        MAX_VARIANTS_PER_TERM,
        fuzzy_like_this_topk,
    )

    r = built_index
    text, max_edits, plen, mnt = "defx clsas", 1, 1, 6

    # driver replay over the index's own term dictionary
    rows = (
        r.postings().select("term", "doc_freq").groupBy("term")
        .agg({"doc_freq": "sum"}).collect()
    )
    vocab = {x["term"]: int(x["sum(doc_freq)"]) for x in rows}
    num_docs = r.collection_stats("content").doc_count

    def ed(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    chosen = []
    for t in ["defx", "clsas"]:
        vs = [
            v for v in vocab
            if v[:plen] == t[:plen] and ed(t, v) <= max_edits
        ]
        if not vs:
            continue
        scored = sorted(
            ((1.0 if v == t else 1.0 - ed(t, v) / min(len(v), len(t))), v)
            for v in vs
        )
        scored = sorted(scored, key=lambda bv: (-bv[0], bv[1]))[:MAX_VARIANTS_PER_TERM]
        df = vocab.get(t, 0)
        if df == 0:
            df = sum(vocab[v] for v in vs) // len(vs)
        idf = math.log((num_docs + 1) / (df + 1)) + 1.0
        chosen += [(b * b * idf, v) for b, v in scored]
    chosen.sort(key=lambda sv: (-sv[0], sv[1]))
    qscores = {v: int(round(s * 1e6)) for s, v in chosen[:mnt]}

    # expected per-doc sums over distinct matched variants
    from lucene_spark.search.sqlpath import exploded_postings

    want = {}

    m = exploded_postings(r, "content", list(qscores)).select(
        "term", "doc_id"
    ).distinct().collect()
    for row in m:
        want[row["doc_id"]] = want.get(row["doc_id"], 0) + qscores[row["term"]]
    want_top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = [
        (x["doc_id"], x["score_x1e6"])
        for x in fuzzy_like_this_topk(
            r, "content", text, k=10, max_num_terms=mnt,
            max_edits=max_edits, prefix_length=plen,
        ).collect()
    ]
    assert got == [(d, s) for d, s in want_top]
    assert len(got) > 0
