"""Index build conformance — the CheckIndex/BasePostingsFormat analogs:
decoded postings must equal a brute-force recount (SURVEY.md §5), plus
the sha256 per-row invariant and stats identities."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lucene_spark.analysis import StandardAnalyzer
from lucene_spark.index import codec


@pytest.fixture(scope="module")
def seg_frames(built_index):
    post = built_index.postings().toPandas()
    dl = built_index.doclens().toPandas()
    return post, dl


def test_docid_assignment_matches_key_order(built_index, corpus):
    docs = built_index.docs().toPandas().sort_values("doc_id").reset_index(drop=True)
    expect = corpus.sort_values(["repo", "path", "commit"]).reset_index(drop=True)
    assert docs["doc_id"].tolist() == list(range(len(corpus)))
    assert docs["repo"].tolist() == expect["repo"].tolist()
    assert docs["path"].tolist() == expect["path"].tolist()


def test_sha256_invariant(built_index, corpus, spark):
    """per-row sha256(content) equality vs the source table
    (BASELINE.json invariant)."""
    import hashlib

    docs = built_index.docs().select("repo", "path", "commit", "content_sha256").toPandas()
    src = corpus.copy()
    src["expect"] = src["content"].map(lambda c: hashlib.sha256(c.encode()).hexdigest())
    merged = docs.merge(src, on=["repo", "path", "commit"])
    assert len(merged) == len(corpus)
    assert (merged["content_sha256"] == merged["expect"]).all()


def test_postings_match_bruteforce_recount(seg_frames, oracle_index):
    """CheckIndex.testPostings analog: for every (term), decoded postings
    == naive per-doc recount; docIDs strictly increasing; doc_freq and
    total_term_freq consistent."""
    post, dl = seg_frames
    # aggregate decoded postings across segments per term
    got: dict[str, dict[int, int]] = {}
    for _, r in post.iterrows():
        d, f = codec.decode_postings(bytes(r["postings"]))
        assert (np.diff(d) > 0).all() or len(d) == 1
        assert (f >= 1).all()
        assert len(d) == r["doc_freq"]
        assert int(f.sum()) == r["total_term_freq"]
        bucket = got.setdefault(r["term"], {})
        for dd, ff in zip(d.tolist(), f.tolist()):
            assert dd not in bucket  # a doc lives in exactly one segment
            bucket[dd] = ff
    # brute force recount from the oracle tokenization
    for term in list(got)[::7] + ["class", "import"]:
        f = oracle_index.freq(term)
        expect = {
            int(oracle_index.doc_ids[i]): int(f[i]) for i in np.where(f > 0)[0]
        }
        assert got.get(term, {}) == expect, term


def test_norms_match_doc_lengths(seg_frames, oracle_index):
    post, dl = seg_frames
    dl = dl.sort_values("doc_id")
    lens = np.array([len(t) for t in oracle_index.tokens])
    assert dl["doc_len"].to_numpy().tolist() == lens.tolist()
    assert dl["doc_len_code"].to_numpy().tolist() == oracle_index.norm_codes.tolist()
    # norms stored inside posting rows match the doc's norm
    code_by_doc = dict(zip(dl["doc_id"], dl["doc_len_code"]))
    sample = post.sample(n=min(50, len(post)), random_state=1)
    for _, r in sample.iterrows():
        d, f = codec.decode_postings(bytes(r["postings"]))
        norms = np.frombuffer(bytes(r["norms"]), dtype=np.uint8)
        for dd, nn in zip(d.tolist(), norms.tolist()):
            assert code_by_doc[dd] == nn


def test_field_stats_identities(built_index, oracle_index, spark):
    """field_stats.sum_total_term_freq == sum(doc_len) (FIXTURES.md §6)."""
    coll = built_index.collection_stats("content")
    assert coll.doc_count == len(oracle_index.doc_ids)
    assert coll.sum_total_term_freq == sum(len(t) for t in oracle_index.tokens)


def test_term_stats_match_oracle(built_index, oracle_index):
    for term in ["class", "import", "return", "café"]:
        st = built_index.term_stats("content", [term])[term]
        ost = oracle_index.term_stats(term)
        assert (st.doc_freq, st.total_term_freq) == (ost.doc_freq, ost.total_term_freq)


def test_positions_roundtrip_in_index(seg_frames, oracle_index):
    post, _ = seg_frames
    r = post[post["term"] == "class"].iloc[0]
    d, f = codec.decode_postings(bytes(r["postings"]))
    pos = codec.decode_positions(bytes(r["positions"]), f)
    by_doc = dict(zip(oracle_index.doc_ids.tolist(), oracle_index.tokens))
    for dd, pp in zip(d.tolist(), pos):
        toks = by_doc[dd]
        expect = [i for i, t in enumerate(toks) if t == "class"]
        assert pp.tolist() == expect
