"""Delete/update tests — the Lucene tombstone contract:
- deleted docs vanish from every query path immediately;
- scores of surviving docs are UNCHANGED (stats count deletions until
  merge — the docFreq contract);
- merge purges tombstones physically and stats then shrink;
- update = atomic delete-by-term + append.
"""

import pytest


@pytest.fixture()
def idx(spark, corpus, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    p = str(tmp_path / "idx")
    build_index(spark, spark.createDataFrame(corpus), p, IndexConfig(docs_per_segment=100))
    return p, IndexReader(spark, p)


def _topk(reader, must, k=10):
    from lucene_spark.search import sqlpath as sp

    return [
        (r["doc_id"], r["score_x1e6"])
        for r in sp.bool_bm25_topk(reader, "content", must=must, k=k).collect()
    ]


def test_delete_hides_docs_but_keeps_scores(spark, idx):
    from lucene_spark.index.deletes import delete_by_ids, live_doc_count
    from lucene_spark.search.executor import IndexReader

    path, r0 = idx
    before = _topk(r0, ["def"], k=20)
    victims = [before[0][0], before[2][0]]
    delete_by_ids(spark, path, spark.createDataFrame([(v,) for v in victims], "doc_id long"))
    r1 = IndexReader(spark, path)
    after = _topk(r1, ["def"], k=20)
    after_ids = [d for d, _ in after]
    assert all(v not in after_ids for v in victims)
    # surviving docs keep their exact scores and relative order
    survivors = [(d, s) for d, s in before if d not in victims]
    assert after[: len(survivors[:18])] == survivors[: len(after)]
    assert live_doc_count(spark, path) == r1.manifest["num_docs_total"] - 2


def test_exact32_searcher_skips_deleted(spark, idx):
    from lucene_spark.index.deletes import delete_by_ids
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexReader, IndexSearcher

    path, r0 = idx
    s0 = IndexSearcher(r0)
    before = s0.search(Q.TermQuery("content", "def"), k=5).hits
    victim = before[0].doc_id
    delete_by_ids(spark, path, spark.createDataFrame([(victim,)], "doc_id long"))
    r1 = IndexReader(spark, path)
    after = IndexSearcher(r1).search(Q.TermQuery("content", "def"), k=5).hits
    assert victim not in [h.doc_id for h in after]
    # survivors keep identical float32 scores
    b = {h.doc_id: h.score for h in before}
    for h in after:
        if h.doc_id in b:
            assert h.score == b[h.doc_id]
    # match-all honours live docs
    total = IndexSearcher(r1).search(Q.MatchAllQuery(), k=1).total_hits
    assert total == r1.manifest["num_docs_total"] - 1


def test_delete_by_term_then_merge_purges(spark, idx):
    from pyspark.sql import functions as F

    from lucene_spark.index import manifest as mani
    from lucene_spark.index.checkindex import check_index
    from lucene_spark.index.deletes import delete_by_term, deleted_ids_df
    from lucene_spark.index.merge import force_merge
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.executor import IndexReader

    path, r0 = idx
    stats_before = r0.collection_stats("content")
    n_del = (
        sp.exploded_postings(r0, "content", ["import"]).select("doc_id").distinct().count()
    )
    assert n_del > 0
    delete_by_term(spark, path, "content", "import")

    r1 = IndexReader(spark, path)
    # stats UNCHANGED until merge (docFreq counts deletions)
    assert r1.collection_stats("content") == stats_before
    assert sp.bool_bm25_topk(r1, "content", must=["import"]).count() == 0
    # Weight#count falls back to live counting under deletes
    assert sp.term_count(r1, "content", "import").collect()[0]["cnt"] == 0

    force_merge(spark, path, max_segments=1)
    r2 = IndexReader(spark, path)
    m = r2.manifest
    assert m["purged_docs"] == n_del
    assert deleted_ids_df(spark, path, m) is None  # tombstones cleared
    # stats now exclude purged docs
    assert r2.collection_stats("content").doc_count == m["num_docs_total"] - n_del
    # the term is physically gone from live postings
    assert (
        r2.postings().filter(F.col("term") == "import").count() == 0
    )
    rep = check_index(spark, path)
    assert rep["ok"], rep["violations"][:5]


def test_update_document(spark, idx, corpus):
    from lucene_spark.index.builder import IndexConfig
    from lucene_spark.index.deletes import update_document
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.executor import IndexReader

    path, r0 = idx
    # replace every doc containing the unique-ish token of doc X with one new doc
    import pandas as pd

    new_doc = pd.DataFrame(
        {
            "repo": ["zzz/updated"],
            "path": ["src/new.py"],
            "commit": ["deadbeef"],
            "lang": ["py"],
            "content": ["freshly updated replacement xyzreplacement def"],
        }
    )
    n_old = sp.exploded_postings(r0, "content", ["import"]).select("doc_id").distinct().count()
    update_document(
        spark, path, "content", "import",
        spark.createDataFrame(new_doc), IndexConfig(docs_per_segment=100),
    )
    r1 = IndexReader(spark, path)
    # old docs gone, replacement searchable
    assert sp.bool_bm25_topk(r1, "content", must=["import"]).count() == 0
    got = sp.bool_bm25_topk(r1, "content", must=["xyzreplacement"]).collect()
    assert len(got) == 1
    from lucene_spark.index.deletes import live_doc_count

    assert live_doc_count(spark, path) == r0.manifest["num_docs_total"] - n_old + 1


def test_wand_prune_respects_deletes(spark, idx):
    """ADVICE r01 (high): WAND theta must be computed over LIVE docs —
    deleting docs that rank in a segment's top-k must not prune live
    docs that belong in the live top-k. prune == no-prune under deletes."""
    from lucene_spark.index.deletes import delete_by_ids
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexReader, IndexSearcher

    path, r0 = idx
    dis = Q.BooleanQuery(
        should=(Q.TermQuery("content", "def"), Q.TermQuery("content", "import"))
    )
    before = IndexSearcher(r0).search(dis, k=5, prune=True).hits
    victims = [h.doc_id for h in before[:3]]
    delete_by_ids(
        spark, path, spark.createDataFrame([(v,) for v in victims], "doc_id long")
    )
    r1 = IndexReader(spark, path)
    s1 = IndexSearcher(r1)
    pruned = s1.search(dis, k=5, prune=True).hits
    full = s1.search(dis, k=5, prune=False).hits
    assert [(h.doc_id, h.score) for h in pruned] == [
        (h.doc_id, h.score) for h in full
    ]
    assert not set(victims) & {h.doc_id for h in pruned}
    assert len(pruned) == 5


def test_merge_purge_respects_segment_ranges(spark, corpus, tmp_path):
    """ADVICE r01 (high): a tombstone on a NON-merged segment's doc that
    falls inside the merged group's doc-id hull must survive the merge
    (not be silently un-tombstoned without a postings rewrite)."""
    from lucene_spark.fixtures import generate_source_files
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.index.deletes import delete_by_ids, deleted_ids_df
    from lucene_spark.index.merge import merge_round
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexReader, IndexSearcher
    from lucene_spark.streaming.nrt import append_batch

    path = str(tmp_path / "idx")
    cfg = IndexConfig(docs_per_segment=100)
    # seg layout: base [0,100), append A -> 3 segs [100,400), append B
    # -> 1 small seg [400,420). Smallest-first merge picks {B, base}:
    # doc-id hull [0,420) COVERS the non-merged A segments.
    build_index(spark, spark.createDataFrame(corpus.iloc[:100]), path, cfg)
    append_batch(
        spark, spark.createDataFrame(generate_source_files(300, seed=7)), path, cfg
    )
    append_batch(
        spark, spark.createDataFrame(generate_source_files(20, seed=9)), path, cfg
    )
    victim = 150  # lives in an A segment — not part of the merge group
    delete_by_ids(spark, path, spark.createDataFrame([(victim,)], "doc_id long"))

    n = merge_round(spark, path, segs_per_tier=4, max_merge_at_once=2)
    assert n == 1
    r = IndexReader(spark, path)
    m = r.manifest
    merged_inputs = set(m["merges"][-1]["inputs"])
    victim_seg = {
        s["segment_id"]
        for b in m["batches"]
        for s in b["segments"]
        if s["first_doc_id"] <= victim <= s["last_doc_id"]
    }
    assert not victim_seg & merged_inputs, "test setup: victim must be outside the group"
    # the tombstone must survive (victim's postings were never rewritten)
    dels = deleted_ids_df(spark, path, m)
    assert dels is not None and victim in {r_["doc_id"] for r_ in dels.collect()}
    assert int(m.get("purged_docs", 0)) == 0
    # and the doc stays invisible to search
    total = IndexSearcher(r).search(Q.MatchAllQuery(), k=1).total_hits
    assert total == m["num_docs_total"] - 1


# ------------------- delete-by-query (IndexWriter.java:1816) -----------


def _postings_docs(reader, term):
    from lucene_spark.search import sqlpath as sp

    return {
        r["doc_id"]
        for r in sp.exploded_postings(reader, "content", [term])
        .select("doc_id").collect()
    }


def _two_terms(reader):
    """Two mid-frequency terms from the live term dictionary."""
    from pyspark.sql import functions as F

    rows = (
        reader.term_stats_df()
        .filter(F.col("field") == "content")
        .groupBy("term").agg(F.sum("doc_freq").alias("df"))
        .filter((F.col("df") >= 5) & (F.col("df") <= 200))
        .orderBy(F.col("df").desc(), "term")
        .limit(2)
        .collect()
    )
    assert len(rows) == 2
    return rows[0]["term"], rows[1]["term"]


def test_matching_ids_boolean_algebra(spark, idx):
    from lucene_spark.index.deletes import matching_ids
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexReader

    path, reader = idx
    t1, t2 = _two_terms(reader)
    d1, d2 = _postings_docs(reader, t1), _postings_docs(reader, t2)

    got = {
        r["doc_id"]
        for r in matching_ids(reader, Q.BooleanQuery(
            must=(Q.TermQuery("content", t1),),
            must_not=(Q.TermQuery("content", t2),),
        )).collect()
    }
    assert got == d1 - d2

    # minimum-should-match 2 of 2 == intersection
    got2 = {
        r["doc_id"]
        for r in matching_ids(reader, Q.BooleanQuery(
            should=(Q.TermQuery("content", t1), Q.TermQuery("content", t2)),
            min_should=2,
        )).collect()
    }
    assert got2 == d1 & d2

    # nested: (t1 OR t2) AND NOT (t1 AND t2) == symmetric difference
    got3 = {
        r["doc_id"]
        for r in matching_ids(reader, Q.BooleanQuery(
            must=(Q.BooleanQuery(
                should=(Q.TermQuery("content", t1),
                        Q.TermQuery("content", t2)),
                min_should=1,
            ),),
            must_not=(Q.BooleanQuery(
                must=(Q.TermQuery("content", t1),
                      Q.TermQuery("content", t2)),
            ),),
        )).collect()
    }
    assert got3 == d1 ^ d2


def test_matching_ids_unsupported_raises(spark, idx):
    import pytest

    from lucene_spark.index.deletes import matching_ids
    from lucene_spark.search import query as Q

    _, reader = idx
    with pytest.raises(TypeError):
        matching_ids(reader, Q.PhraseQuery("content", ("a", "b")))


def test_delete_by_query_removes_matches_and_accounts_exactly(spark, idx):
    from lucene_spark.index import manifest as mani
    from lucene_spark.index.deletes import delete_by_query
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexReader, IndexSearcher

    path, reader = idx
    t1, t2 = _two_terms(reader)
    d1, d2 = _postings_docs(reader, t1), _postings_docs(reader, t2)
    expect = d1 - d2
    assert expect

    g1 = delete_by_query(spark, path, Q.BooleanQuery(
        must=(Q.TermQuery("content", t1),),
        must_not=(Q.TermQuery("content", t2),),
    ))
    m = mani.read_manifest(path)
    assert m["generation"] == g1
    assert int(m["num_deleted"]) == len(expect)

    # every query path skips the tombstoned docs now
    r2 = IndexReader(spark, path)
    live = _postings_docs(r2, t1)
    assert live == d1 & d2
    hits = IndexSearcher(r2).search(Q.TermQuery("content", t1), k=400).hits
    assert {h.doc_id for h in hits} == d1 & d2

    # repeating the same delete is a no-op: live matches are excluded
    # before staging, so accounting does not double-count
    g2 = delete_by_query(spark, path, Q.BooleanQuery(
        must=(Q.TermQuery("content", t1),),
        must_not=(Q.TermQuery("content", t2),),
    ))
    m2 = mani.read_manifest(path)
    assert g2 == g1
    assert int(m2["num_deleted"]) == len(expect)


def test_matching_ids_random_boolean_trees(spark, idx):
    """12 seeded random boolean trees over real dictionary terms:
    matching_ids' distributed set algebra must equal a driver-side
    set evaluation of the same tree (the brute-force oracle)."""
    import random

    from pyspark.sql import functions as F

    from lucene_spark.index.deletes import matching_ids
    from lucene_spark.search import query as Q

    path, reader = idx
    rows = (
        reader.term_stats_df()
        .filter(F.col("field") == "content")
        .groupBy("term").agg(F.sum("doc_freq").alias("df"))
        .filter(F.col("df") >= 3)
        .orderBy(F.col("df").desc(), "term")
        .limit(12)
        .collect()
    )
    terms = [r["term"] for r in rows]
    docs = {t: _postings_docs(reader, t) for t in terms}
    all_ids = {
        r["doc_id"] for r in reader.docs().select("doc_id").collect()
    }

    def gen(rng, depth):
        if depth == 0 or rng.random() < 0.4:
            return Q.TermQuery("content", rng.choice(terms))
        kids = [gen(rng, depth - 1) for _ in range(rng.randint(2, 3))]
        mode = rng.choice(["must", "should", "mixed"])
        if mode == "must":
            return Q.BooleanQuery(must=tuple(kids))
        if mode == "should":
            m = rng.randint(1, len(kids))
            return Q.BooleanQuery(should=tuple(kids), min_should=m)
        return Q.BooleanQuery(
            must=(kids[0],), must_not=(kids[1],),
            should=tuple(kids[2:]),
        )

    def ev(node):
        if isinstance(node, Q.TermQuery):
            return docs[node.term]
        if isinstance(node, Q.MatchAllQuery):
            return set(all_ids)
        if isinstance(node, Q.MatchNoDocsQuery):
            return set()
        assert isinstance(node, Q.BooleanQuery)
        out = None
        for c in list(node.must) + list(node.filter):
            s = ev(c)
            out = s if out is None else out & s
        if node.should:
            need = max(node.min_should, 0 if out is not None else 1)
            if need > 0 or out is None:
                from collections import Counter

                cnt = Counter()
                for c in node.should:
                    for d in ev(c):
                        cnt[d] += 1
                sh = {d for d, n in cnt.items() if n >= need}
                out = sh if out is None else out & sh
        for c in node.must_not:
            out = out - ev(c)
        return out

    rng = random.Random(20260821)
    for i in range(12):
        q = gen(rng, 2)
        # the engine rewrites first, exactly like delete_by_query does
        want = ev(Q.rewrite_fixpoint(q))
        got = {r["doc_id"] for r in matching_ids(reader, q).collect()}
        assert got == want, (i, q)


def test_delete_by_query_two_phase_crash_is_invisible(spark, idx, monkeypatch):
    """Two-phase contract: a crash AFTER the tombstone parquet is
    staged but BEFORE the manifest publish leaves readers on the old
    generation with zero visible deletes (the orphan batch is
    unreferenced); the retried delete reuses the batch slot
    (mode=overwrite) and publishes exactly once."""
    from lucene_spark.index import manifest as mani
    from lucene_spark.index.deletes import delete_by_query
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexReader, IndexSearcher

    path, reader = idx
    t1, t2 = _two_terms(reader)
    expect = _postings_docs(reader, t1) - _postings_docs(reader, t2)
    assert expect
    gen0 = mani.read_manifest(path)["generation"]
    n0 = IndexSearcher(IndexReader(spark, path)).count(Q.MatchAllQuery())

    real_commit = mani.commit_manifest

    def boom(index_dir, m):
        raise RuntimeError("injected crash before manifest publish")

    monkeypatch.setattr(mani, "commit_manifest", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="injected"):
        delete_by_query(spark, path, Q.BooleanQuery(
            must=(Q.TermQuery("content", t1),),
            must_not=(Q.TermQuery("content", t2),),
        ))
    monkeypatch.setattr(mani, "commit_manifest", real_commit)

    # the failed delete is INVISIBLE: same generation, same live count
    m = mani.read_manifest(path)
    assert m["generation"] == gen0
    assert not m.get("delete_batches")
    assert IndexSearcher(
        IndexReader(spark, path)
    ).count(Q.MatchAllQuery()) == n0

    # the retry publishes once, with exact accounting
    g = delete_by_query(spark, path, Q.BooleanQuery(
        must=(Q.TermQuery("content", t1),),
        must_not=(Q.TermQuery("content", t2),),
    ))
    m2 = mani.read_manifest(path)
    assert m2["generation"] == g > gen0
    assert int(m2["num_deleted"]) == len(expect)
    assert IndexSearcher(
        IndexReader(spark, path)
    ).count(Q.MatchAllQuery()) == n0 - len(expect)


def test_matching_ids_multiterm_and_wrappers(spark, idx):
    """Every supported leaf shape resolves: literal term sets need no
    dictionary expansion, pattern queries expand through the term
    dictionary, and scoreless wrappers unwrap."""
    from lucene_spark.index.deletes import matching_ids
    from lucene_spark.search import query as Q

    _, reader = idx
    t1, _ = _two_terms(reader)
    base = _postings_docs(reader, t1)
    for q in [
        Q.TermInSetQuery("content", (t1,)),
        Q.ConstantScoreQuery(Q.TermQuery("content", t1), 2.0),
        Q.BoostQuery(Q.TermInSetQuery("content", (t1, "zz_absent")), 3.0),
        Q.PrefixQuery("content", t1),
        Q.TermRangeQuery("content", t1, t1 + "￿"),
    ]:
        got = {r["doc_id"] for r in matching_ids(reader, q).collect()}
        assert got >= base, q
