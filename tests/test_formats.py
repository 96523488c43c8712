"""Postings-format SPI: varint format round-trips, byte-level parity of
the df==1 fast paths, and full search/merge/CheckIndex equivalence
between a for104 index and a varint index over the same corpus."""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.index import codec
from lucene_spark.index.formats import (
    For104Format,
    VarintFormat,
    get_postings_format,
)


def _postings_case(n, seed):
    rng = np.random.default_rng(seed)
    docs = np.cumsum(rng.integers(1, 50, size=n)).astype(np.int64)
    freqs = rng.integers(1, 9, size=n).astype(np.int64)
    norms = rng.integers(0, 255, size=n).astype(np.int64)
    return docs, freqs, norms


@pytest.mark.parametrize("n", [1, 3, 255, 256, 257, 1000])
def test_varint_roundtrip_and_metadata_parity(n):
    docs, freqs, norms = _postings_case(n, seed=n)
    vblob, vbl, vif, vin = VarintFormat.encode(docs, freqs, norms)
    d2, f2 = VarintFormat.decode(vblob)
    assert (d2 == docs).all() and (f2 == freqs).all()
    # skip/impact metadata is format-independent: must equal for104's
    _, fbl, fif, fin = For104Format.encode(docs, freqs, norms)
    assert vbl == fbl and vif == fif and vin == fin


@pytest.mark.parametrize("fmt", [For104Format, VarintFormat])
def test_encode_single_matches_encode(fmt):
    for doc, f in [(0, 1), (7, 3), (123456, 200)]:
        blob, _, _, _ = fmt.encode(
            np.array([doc], dtype=np.int64), np.array([f], dtype=np.int64)
        )
        assert fmt.encode_single(doc, f) == blob


def test_varint_selective_decode_matches_for104():
    docs, freqs, norms = _postings_case(1000, seed=9)
    vblob, bl, _, _ = VarintFormat.encode(docs, freqs, norms)
    fblob, _, _, _ = For104Format.encode(docs, freqs, norms)
    rng = np.random.default_rng(3)
    mask = rng.random(len(bl)) < 0.5
    vd, vf = VarintFormat.decode_selective(vblob, bl, mask)
    fd, ff = For104Format.decode_selective(fblob, bl, mask)
    assert (vd == fd).all() and (vf == ff).all()


def test_unknown_format_rejected():
    with pytest.raises(ValueError, match="unknown postings format"):
        get_postings_format("simpletext9000")


# --------------------------------------------------------------------------
# end-to-end: same corpus, two formats, identical search behavior
# --------------------------------------------------------------------------


def _build(spark, tmp_path_factory, fmt_name, docs_per_segment=40):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    rng = np.random.default_rng(77)
    vocab = ["alpha", "beta", "gamma", "delta", "omega"]
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(4, 30)))
        for _ in range(120)
    ]
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
    )
    path = str(tmp_path_factory.mktemp(f"fmt_{fmt_name}") / "idx")
    cfg = IndexConfig(
        field="text", content_col="text", analyzer="simple",
        doc_id_col="doc_id", docs_per_segment=docs_per_segment,
        postings_format=fmt_name,
    )
    build_index(spark, spark.createDataFrame(pdf), path, cfg)
    return IndexReader(spark, path), path


@pytest.fixture(scope="module")
def two_indexes(spark, tmp_path_factory):
    r1, p1 = _build(spark, tmp_path_factory, "for104")
    r2, p2 = _build(spark, tmp_path_factory, "varint")
    return r1, p1, r2, p2


def _hits(reader, q, k=200):
    from lucene_spark.search.executor import IndexSearcher

    top = IndexSearcher(reader).search(q, k=k)
    return [(h.doc_id, round(h.score, 5)) for h in top.hits]


def test_search_identical_across_formats(two_indexes):
    from lucene_spark.search import query as Q

    r1, _, r2, _ = two_indexes
    assert r2.manifest["postings_format"] == "varint"
    queries = [
        Q.TermQuery("text", "alpha"),
        Q.BooleanQuery(
            must=(Q.TermQuery("text", "alpha"),),
            should=(Q.TermQuery("text", "beta"),),
            must_not=(Q.TermQuery("text", "omega"),),
        ),
        Q.PhraseQuery("text", ("alpha", "beta")),
        Q.PhraseQuery("text", ("alpha", "gamma"), slop=3),
    ]
    for q in queries:
        assert _hits(r1, q) == _hits(r2, q), q


def test_sql_path_identical_across_formats(two_indexes):
    from lucene_spark.search import sqlpath as sp

    r1, _, r2, _ = two_indexes
    a = sp.bool_bm25_topk(r1, "text", must=["alpha"], should=["beta"], k=20)
    b = sp.bool_bm25_topk(r2, "text", must=["alpha"], should=["beta"], k=20)
    assert [tuple(r) for r in a.collect()] == [tuple(r) for r in b.collect()]


def test_checkindex_green_on_varint(spark, two_indexes):
    from lucene_spark.index.checkindex import check_index

    _, _, _, p2 = two_indexes
    rep = check_index(spark, p2)
    assert rep["ok"], rep["violations"]


def test_merge_preserves_varint_results(spark, tmp_path_factory):
    from lucene_spark.index.merge import force_merge
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexReader

    r, path = _build(spark, tmp_path_factory, "varint", docs_per_segment=20)
    q = Q.BooleanQuery(must=(Q.TermQuery("text", "alpha"),),
                       should=(Q.TermQuery("text", "delta"),))
    before = _hits(r, q)
    assert force_merge(spark, path, max_segments=1) > 0
    after = _hits(IndexReader(spark, path), q)
    assert before == after


def test_simpletext_index_matches_for104(spark, tmp_path_factory):
    # the debugging codec: blobs are literal ASCII; results identical
    from lucene_spark.search import sqlpath as sp

    r1, _ = _build(spark, tmp_path_factory, "for104")
    r3, p3 = _build(spark, tmp_path_factory, "simpletext")
    assert r3.manifest["postings_format"] == "simpletext"
    for terms in (["alpha"], ["alpha", "gamma"]):
        a = sp.bool_bm25_topk(r1, "text", must=terms, k=20).collect()
        b = sp.bool_bm25_topk(r3, "text", must=terms, k=20).collect()
        assert [tuple(x) for x in a] == [tuple(x) for x in b], terms
    # the blob really is readable text
    row = r3.postings().select("postings").head()
    assert row["postings"].startswith(b"n ")
    assert b"doc " in row["postings"] and b"freq " in row["postings"]


def test_simpletext_roundtrip_and_selective():
    import numpy as np

    from lucene_spark.index import codec
    from lucene_spark.index.formats import get_postings_format

    f = get_postings_format("simpletext")
    rng = np.random.default_rng(5)
    docs = np.cumsum(rng.integers(1, 9, size=700))
    freqs = rng.integers(1, 30, size=700)
    blob, bl, _, _ = f.encode(docs, freqs)
    d, q = f.decode(blob)
    assert (d == docs).all() and (q == freqs).all()
    n_blocks = (len(docs) + codec.BLOCK_SIZE - 1) // codec.BLOCK_SIZE
    mask = [i % 2 == 0 for i in range(n_blocks)]
    ds, qs = f.decode_selective(blob, bl, mask)
    want = np.concatenate([
        docs[s:s + codec.BLOCK_SIZE]
        for i, s in enumerate(range(0, len(docs), codec.BLOCK_SIZE))
        if mask[i]
    ])
    assert (ds == want).all()
