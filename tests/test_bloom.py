"""Bloom postings sidecar (index/bloom.py — the
BloomFilteringPostingsFormat / FuzzySet role): no false negatives ever,
absent terms short-circuit with no scan, results identical with the
gate on, stale sidecars fail open."""

import json
import os

import pytest

from lucene_spark.index.bloom import (
    BloomSidecar,
    bits_for,
    term_position,
    write_bloom_sidecar,
)
from lucene_spark.index.builder import IndexConfig, build_index
from lucene_spark.search import query as Q
from lucene_spark.search.executor import IndexReader, IndexSearcher


@pytest.fixture(scope="module")
def bloomed(spark, corpus, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("bloomidx") / "idx")
    build_index(
        spark, spark.createDataFrame(corpus), p,
        IndexConfig(docs_per_segment=100),
    )
    write_bloom_sidecar(spark, p)
    return p, IndexReader(spark, p)


def test_bits_for_sizing():
    # power of two, and big enough that single-hash saturation <= target
    import math

    for n in (1, 100, 10_000, 1_000_000):
        m = bits_for(n, 0.10)
        assert m & (m - 1) == 0
        assert 1 - math.exp(-n / m) <= 0.10 + 1e-9
    with pytest.raises(ValueError):
        bits_for(100, 1.5)


def test_no_false_negatives_and_field_separation(spark, bloomed):
    path, r = bloomed
    post = (
        spark.read.parquet(f"{path}/postings")
        .select("segment_id", "field", "term")
        .collect()
    )
    owners: dict[tuple[str, str], set] = {}
    for row in post:
        owners.setdefault((row["field"], row["term"]), set()).add(
            row["segment_id"]
        )
    sc = r.bloom()
    # every written term must survive the gate in every owning segment
    for (field, term), segs in list(owners.items())[:500]:
        maybe = sc.segments_maybe_containing([(field, term)])
        assert maybe is not None and segs <= maybe, (field, term)


def test_absent_term_short_circuits(spark, bloomed):
    path, r = bloomed
    s = IndexSearcher(r)
    # count how many truly-absent probes the bitsets clear everywhere
    sc = r.bloom()
    cleared = sum(
        1
        for i in range(200)
        if sc.segments_maybe_containing(
            [("content", f"zz_never_written_{i}")]
        ) == set()
    )
    # saturation 0.10, a handful of segments: most probes must clear
    assert cleared > 100, cleared
    td = s.search(Q.TermQuery("content", "zz_never_written_0"), k=5)
    assert td.total_hits == 0 and td.hits == []


def test_results_identical_with_gate(spark, corpus, tmp_path):
    plain = str(tmp_path / "plain")
    build_index(
        spark, spark.createDataFrame(corpus), plain,
        IndexConfig(docs_per_segment=100),
    )
    rp = IndexReader(spark, plain)
    write_bloom_sidecar(spark, plain)
    rb = IndexReader(spark, plain)
    sp_, sb = IndexSearcher(rp), IndexSearcher(rb)
    # the un-bloomed reader was opened before the sidecar existed, but
    # readers are lazy — force its gate to "absent" deterministically
    rp.bloom()._loaded, rp.bloom()._bitsets = True, None
    for q in (
        Q.TermQuery("content", "def"),
        Q.BooleanQuery(
            must=[Q.TermQuery("content", "def")],
            must_not=[Q.TermQuery("content", "import")],
        ),
        Q.PhraseQuery("content", ["def", "main"]),
    ):
        a = [(h.doc_id, round(h.score, 5)) for h in sp_.search(q, k=20).hits]
        b = [(h.doc_id, round(h.score, 5)) for h in sb.search(q, k=20).hits]
        assert a == b, q


def test_stale_generation_fails_open(spark, bloomed):
    path, r = bloomed
    meta_path = os.path.join(path, "_bloom_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    try:
        with open(meta_path, "w") as f:
            json.dump({**meta, "generation": meta["generation"] + 999}, f)
        fresh = IndexReader(spark, path)
        assert fresh.bloom().segments_maybe_containing(
            [("content", "def")]
        ) is None
        td = IndexSearcher(fresh).search(Q.TermQuery("content", "def"), k=5)
        assert td.total_hits > 0
    finally:
        with open(meta_path, "w") as f:
            json.dump(meta, f)


def test_false_positive_rate_near_saturation(spark, bloomed):
    path, r = bloomed
    sc = r.bloom()
    sc._load()
    assert sc._bitsets is not None
    segs = {s for s, _ in sc._bitsets}
    n_segs = len(segs)
    assert n_segs >= 2  # docs_per_segment=100 over a 400-doc corpus
    trials, hits = 0, 0
    for i in range(300):
        maybe = sc.segments_maybe_containing([("content", f"qq_absent_{i}")])
        trials += n_segs
        hits += len(maybe)
    rate = hits / trials
    assert rate < 0.25, rate  # target saturation 0.10 with slack


def test_position_is_stable():
    # the on-disk bitsets depend on this hash: lock it
    assert term_position("content", "def") == term_position("content", "def")
    assert term_position("content", "def") != term_position("path", "def")


def test_checkindex_verifies_bloom(spark, bloomed):
    import numpy as np

    from lucene_spark.index.checkindex import check_index

    path, r = bloomed
    res = check_index(spark, path)
    assert res["ok"], res["violations"]
    # corrupt one bitset byte -> byte-equality violation
    import glob

    import pandas as pd
    import pyarrow.parquet as pq
    import pyarrow as pa

    f = sorted(glob.glob(f"{path}/blooms/*.parquet"))[0]
    crc = os.path.join(os.path.dirname(f), f".{os.path.basename(f)}.crc")
    if os.path.exists(crc):
        os.remove(crc)  # hadoop checksum would reject the rewrite
    t = pq.read_table(f).to_pandas()
    raw = bytearray(t.loc[0, "bits"])
    raw[0] ^= 0xFF
    t.loc[0, "bits"] = bytes(raw)
    pq.write_table(pa.Table.from_pandas(t), f)
    try:
        res2 = check_index(spark, path)
        assert not res2["ok"]
        assert any("bloom" in v for v in res2["violations"])
    finally:
        raw[0] ^= 0xFF
        t.loc[0, "bits"] = bytes(raw)
        pq.write_table(pa.Table.from_pandas(t), f)
    assert check_index(spark, path)["ok"]
