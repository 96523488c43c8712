"""FreeTextSuggester (stupid-backoff n-gram LM) vs a pure-Python replay
of FreeTextSuggester.java's lookup math over the sf0.001 documents."""

import re
from collections import Counter

import pytest

SF = "/root/testdata/sf0.001"
ALPHA = 0.4


def _toks(s):
    return re.findall(r"[a-z0-9]+", s.lower())


@pytest.fixture(scope="module")
def corpus_tokens():
    import duckdb

    rows = (
        duckdb.connect()
        .execute(
            f"SELECT text FROM read_parquet('{SF}/documents.parquet') ORDER BY doc_id"
        )
        .fetchall()
    )
    return [_toks(r[0]) for r in rows]


@pytest.fixture(scope="module")
def model(spark):
    from lucene_spark.search.freetext import freetext_model

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    return freetext_model(docs, "text", grams=2).cache()


def _replay(corpus, key, num, grams=2):
    """FreeTextSuggester.lookup replayed per the documented math."""
    uni, bi = Counter(), Counter()
    for ts in corpus:
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
    tot = sum(uni.values())
    toks = _toks(key)
    ended = bool(key) and not key[-1].isalnum()
    if ended or not toks:
        ctx_toks, frag = toks[-(grams - 1):] if grams > 1 else [], ""
    else:
        ctx_toks, frag = toks[:-1][-(grams - 1):] if grams > 1 else [], toks[-1]
    rows = []  # (order, gram_text, last, score)
    if len(ctx_toks) >= 1:
        c = ctx_toks[-1]
        for (a, b), n in bi.items():
            if a == c and b.startswith(frag):
                rows.append((2, f"{a} {b}", b, n / uni[c]))
    if frag or not key:
        for t, n in uni.items():
            if t.startswith(frag):
                rows.append((1, t, t, ALPHA * n / tot))
    best = {}
    for order, gram, last, score in rows:
        if last not in best or best[last][0] < order:
            best[last] = (order, gram, score)
    out = [
        (gram, round(score * 1e6))
        for _, gram, score in best.values()
    ]
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:num]


@pytest.mark.parametrize("key", ["data m", "data ", "m", "the s"])
def test_lookup_matches_replay(spark, model, corpus_tokens, key):
    from lucene_spark.search.freetext import freetext_lookup

    got = [
        (r["term"], r["score_x1e6"])
        for r in freetext_lookup(model, key, num=5).collect()
    ]
    want = _replay(corpus_tokens, key, num=5)
    assert got == want, key
    assert got  # the corpus vocabulary covers every probed key


def test_bigram_outranks_and_dedups_unigram(spark, model, corpus_tokens):
    """A token predicted by the bigram model must appear once, as the
    bigram (context included), not again as a backed-off unigram."""
    from lucene_spark.search.freetext import freetext_lookup

    got = freetext_lookup(model, "data m", num=50).collect()
    lasts = [r["term"].split(" ")[-1] for r in got]
    assert len(lasts) == len(set(lasts))
    bigram_lasts = {
        r["term"].split(" ")[1] for r in got if " " in r["term"]
    }
    for r in got:
        if " " not in r["term"]:
            assert r["term"] not in bigram_lasts


def test_empty_key_suggests_top_unigrams(spark, model, corpus_tokens):
    from lucene_spark.search.freetext import freetext_lookup

    got = [(r["term"], r["score_x1e6"])
           for r in freetext_lookup(model, "", num=3).collect()]
    uni = Counter(t for ts in corpus_tokens for t in ts)
    tot = sum(uni.values())
    want = sorted(
        ((t, round(ALPHA * n / tot * 1e6)) for t, n in uni.items()),
        key=lambda x: (-x[1], x[0]),
    )[:3]
    assert got == want


def test_unseen_context_backs_off_to_unigrams(spark, model):
    from lucene_spark.search.freetext import freetext_lookup

    got = freetext_lookup(model, "zzzzqqq m", num=5).collect()
    assert got  # bigram order contributes nothing; unigrams remain
    assert all(" " not in r["term"] for r in got)
