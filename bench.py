"""Benchmark: index-build throughput (files/sec) + BM25 top-10 query
latency over $SPARK_GRAFT_SF_DIR documents, on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...,
 "build": {"files_per_sec": ..., "num_docs": ...}}

Run at two parallelism levels for the scaling-efficiency evidence:
  SPARK_GRAFT_CPUS=8 python bench.py
  SPARK_GRAFT_CPUS=32 python bench.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from lucene_spark import get_spark
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.executor import IndexReader, IndexSearcher
    from lucene_spark.search import query as Q

    from lucene_spark.pipeline import dedup as dd
    from lucene_spark.pipeline import graphann as ga
    from lucene_spark.pipeline import packing as pk
    from lucene_spark.pipeline import lateinteraction as _li
    from lucene_spark.pipeline import pq as pqm
    from lucene_spark.pipeline import similarity as sim
    from lucene_spark.pipeline.similarity import _query_vec as _qv
    from pyspark.sql.functions import col as _col

    spark = get_spark("bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_docs = docs.count()

    idx = f"/tmp/lucene_spark_bench_{os.path.basename(SF_DIR.rstrip('/'))}_{CPUS}"
    shutil.rmtree(idx, ignore_errors=True)

    # warm the Python workers + Arrow path once, so the timed build
    # measures engine throughput, not per-session process spin-up (the
    # queries below get the same treatment via their untimed warm call)
    import pandas as _pd

    warm = spark.createDataFrame(_pd.DataFrame({"x": range(4 * CPUS)}))
    warm.repartition(CPUS).mapInPandas(
        lambda it: it, schema="x long"
    ).count()
    # segment sizing: 1000-doc floor balances build parallelism against
    # per-segment query overhead at this SF (lowering the floor to 250
    # doubles standalone build throughput by filling all cores, but adds
    # ~0.15 s to EVERY query: 20 applyInPandas groups instead of 5 —
    # measured, and the wrong trade for the query-total headline)
    cfg = IndexConfig(
        field="text", content_col="text", analyzer="simple",
        doc_id_col="doc_id", docs_per_segment=max(1000, n_docs // (2 * CPUS)),
        num_batches=1,
    )
    # warm the ENGINE path too: one tiny throwaway build exercises the
    # invert closure's unpickle + module imports inside the reused
    # Python workers and the staging plan's JVM codegen — one-time
    # per-session costs (~3.5 s, and growing with the package) that are
    # not build throughput.  Then time best-of-3 full builds, the same
    # estimator policy _time() documents for the queries: this host is
    # co-tenant, and a SINGLE cold build timing has measured 2-5x
    # inflation under load spikes (the r1->r4 driver-side build
    # "decline" — 689->205 files/s while interleaved same-host A/B held
    # 841~846 — was exactly this: one cold single-shot sample).  Every
    # rep is a full from-scratch build of all n_docs; all reps and the
    # 1-minute load average are reported so a noisy run is readable.
    warm_idx = f"{idx}_warm"
    shutil.rmtree(warm_idx, ignore_errors=True)
    build_index(spark, docs.limit(64), warm_idx, cfg)
    shutil.rmtree(warm_idx, ignore_errors=True)

    build_reps: list[float] = []
    for _ in range(3):
        shutil.rmtree(idx, ignore_errors=True)
        t0 = time.time()
        build_index(spark, docs, idx, cfg)
        build_reps.append(round(time.time() - t0, 3))
    build_sec = min(build_reps)
    reader = IndexReader(spark, idx)
    searcher = IndexSearcher(reader)

    F = "text"
    bench_queries = {
        "q1_term_hot": lambda: searcher.search(Q.TermQuery(F, "table"), k=10),
        "q2_term_mid": lambda: searcher.search(Q.TermQuery(F, "spark"), k=10),
        "q3_and": lambda: searcher.search(
            Q.BooleanQuery(must=(Q.TermQuery(F, "table"), Q.TermQuery(F, "spark"))), k=10
        ),
        "q4_or_hot": lambda: searcher.search(
            Q.BooleanQuery(should=(
                Q.TermQuery(F, "table"), Q.TermQuery(F, "query"),
                Q.TermQuery(F, "value"), Q.TermQuery(F, "row"),
            )), k=10
        ),
        "q5_phrase": lambda: searcher.search(Q.PhraseQuery(F, ("fast", "table")), k=10),
        # high-df phrase: both terms near the top of the df histogram —
        # exercises the vectorized positional kernel at its worst case
        "q5b_phrase_hot": lambda: searcher.search(
            Q.PhraseQuery(F, ("scan", "column")), k=10
        ),
        "q5c_near_hot": lambda: searcher.search(
            Q.IntervalQuery(F, Q.IOrdered(
                (Q.ITerm("scan"), Q.ITerm("column"), Q.ITerm("window")),
                max_gaps=4,
            )), k=10
        ),
        # high-df sloppy phrase: the batched-greedy kernel at its worst
        # case (every round advances thousands of docs in lockstep)
        "q5d_sloppy_hot": lambda: searcher.search(
            Q.PhraseQuery(F, ("scan", "column"), slop=4), k=10
        ),
        "q6_prefix": lambda: searcher.search(Q.PrefixQuery(F, "qu"), k=10),
        "q7_sql64_bool": lambda: sp.bool_bm25_topk(
            reader, F, must=["spark"], should=["merge", "customer"], k=10
        ).collect(),
        "q8_dismax": lambda: searcher.search(
            Q.DisjunctionMaxQuery((Q.TermQuery(F, "table"), Q.TermQuery(F, "spark")), 0.3),
            k=10,
        ),
        "q9_minhash_dedup": lambda: dd.minhash_lsh_pairs(docs, threshold=0.1).collect(),
        "q10_ann_cosine": lambda: sim.cosine_topk(emb, query_id=0, k=10).collect(),
    }

    # persisted-HNSW fixture: built ONCE (untimed — it is the write
    # path; x_hnsw_persisted_query times the read path)
    _hnsw_dir = f"{idx}_hnsw"
    _hnsw_built = {}

    def _hnsw_idx():
        if not _hnsw_built:
            shutil.rmtree(_hnsw_dir, ignore_errors=True)
            ga.hnsw_index_write(emb, _hnsw_dir)
            _hnsw_built["done"] = True
        return _hnsw_dir

    _qv_cache = {}

    def _qv0():
        if "v" not in _qv_cache:
            from lucene_spark.pipeline.similarity import query_vec

            _qv_cache["v"] = query_vec(emb, 0)
        return _qv_cache["v"]

    _pq_dir = f"{idx}_pq"
    _pq_built = {}

    def _pq_idx():
        if not _pq_built:
            shutil.rmtree(_pq_dir, ignore_errors=True)
            pqm.pq_index_write(emb, _pq_dir, m=16, n_codes=16, iters=1)
            _pq_built["done"] = True
        return _pq_dir

    # r3 additions, reported separately: NOT part of the round-comparable
    # headline total (these rebuild their index/graph per call by design)
    extra_queries = {
        "x_hnsw_ann": lambda: ga.ann_hnsw_topk(emb, query_id=0, k=10).collect(),
        # IVF-routed HNSW (r5): router prunes to n_probe lists before
        # any graph work — the every-partition vs routed comparison
        # against x_hnsw_ann is the 100-TB fan-out evidence
        "x_routed_hnsw": lambda: ga.ann_routed_hnsw_topk(
            emb, query_id=0, k=10, n_centroids=16, n_probe=4
        ).collect(),
        # persisted-graph query (r5): the Lucene99HnswVectorsFormat
        # read path — graphs stored at build time, queries only read;
        # the gap to x_hnsw_ann is the per-call rebuild cost the
        # persisted index amortizes
        "x_hnsw_persisted_query": lambda: ga.hnsw_index_topk(
            spark, _hnsw_idx(), _qv0(), k=10, exclude_vec_id=0
        ).collect(),
        # persisted-PQ query (r5): ADC over the stored codes table +
        # exact refine — the gap to x_ann_ivfpq is the train+encode
        # cost the persisted codes amortize
        "x_pq_persisted_query": lambda: pqm.pq_index_topk(
            spark, emb, _pq_idx(), query_id=0, k=10, refine=8
        ).collect(),
        "x_dedup_clusters": lambda: dd.dedup_clusters(
            dd.minhash_lsh_pairs(docs, threshold=0.1)
        ).collect(),
        # r4 final-session pipeline additions (each a full scan job)
        "x_substr_dedup": lambda: dd.substring_dedup_stats(
            docs, min_len=8, k=200
        ).collect(),
        "x_pack_sequences": lambda: pk.pack_sequences(
            docs, 512, k=200
        ).collect(),
        # IVF-PQ query half: ADC over the codes table + exact refine
        # (train+encode inside the timing: the full cold-path cost)
        "x_ann_ivfpq": lambda: pqm.ann_pq_topk(
            emb, query_id=0, k=10, m=16, refine=8
        ).collect(),
        # ColBERT-style SUM_MAX_SIM rescoring over vec_id%50 groups
        "x_late_interaction": lambda: _li.late_interaction_rescore_flat(
            emb.select((_col("vec_id") % 50).alias("gid"), "embedding"),
            "gid", "embedding",
            [_qv(emb, 0), _qv(emb, 1)], k=10,
        ).collect(),
        # vector-similarity THRESHOLD query (exact codegen scan,
        # result set not top-k) — continuation-session addition
        "x_vecsim_threshold": lambda: sim.vector_similarity_all(
            emb, query_id=0, result_similarity=0.6
        ).collect(),
    }

    def _time(fns):
        # best-of-reps, not mean: this sandbox shares its host, and
        # load-average spikes with zero local processes inflate single
        # timings 2-5x run to run (measured); the minimum is the
        # standard capability estimator under co-tenant noise and is
        # what the cross-round comparison needs to track ENGINE changes
        out: dict[str, float] = {}
        for name, fn in fns.items():
            fn()  # warm (plan + code paths)
            reps = 3
            best = float("inf")
            for _ in range(reps):
                t = time.time()
                fn()
                best = min(best, time.time() - t)
            out[name] = round(best, 4)
        return out

    timings = _time(bench_queries)
    extra = _time(extra_queries)

    # LRUQueryCache analog (search/querycache.py): identical FILTER
    # doc-set, cold build vs cached reuse — the warm run scans the
    # persisted blocks instead of re-decoding postings. Timed outside
    # _time because cold-vs-warm IS the measurement.
    from lucene_spark.search.querycache import LRUQueryCache, cached_filter_docset

    qc = LRUQueryCache(min_uses=1)

    def filtered_count():
        return cached_filter_docset(
            reader, F, ["merge", "customer", "window"], cache=qc
        ).count()

    t = time.time()
    filtered_count()
    extra["x_qcache_cold"] = round(time.time() - t, 4)
    warm_best = float("inf")
    for _ in range(3):
        t = time.time()
        filtered_count()
        warm_best = min(warm_best, time.time() - t)
    extra["x_qcache_warm"] = round(warm_best, 4)

    # Bloom postings sidecar (index/bloom.py): sidecar build cost plus
    # the segment-prune ratio for a sparse term (segments the seekExact
    # gate admits / total) — the absent-term fast path itself is
    # asserted in tests/test_bloom.py; at this SF the driver term cache
    # already short-circuits absent terms, so timing it here would
    # measure the cache, not the bloom.
    from lucene_spark.index.bloom import write_bloom_sidecar

    t = time.time()
    write_bloom_sidecar(spark, idx)
    extra["x_bloom_build"] = round(time.time() - t, 4)
    reader_b = IndexReader(spark, idx)
    rare = (
        reader_b.term_stats_df()
        .filter(_col("field") == F)
        .orderBy("doc_freq")
        .select("term").head()
    )
    if rare is not None:
        sc_ = reader_b.bloom()
        maybe = sc_.segments_maybe_containing([(F, rare["term"])])
        sc_._load()
        n_segs = len({s for s, _ in (sc_._bitsets or {})}) or 1
        extra["x_bloom_seg_admit_frac"] = round(len(maybe or set()) / n_segs, 4)

    total_query_sec = round(sum(timings.values()), 4)
    out = {
        "metric": "bm25_bench_total_query_sec",
        "value": total_query_sec,
        "unit": "sec",
        "queries": timings,
        "queries_extra": extra,
        "sf": SF_DIR,
        "cpus": CPUS,
        "load_avg_1m": float(
            open("/proc/loadavg").read().split()[0]
        ),
        "build": {
            "build_sec": round(build_sec, 3),
            "build_reps_sec": build_reps,
            "num_docs": n_docs,
            "files_per_sec": round(n_docs / build_sec, 1),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
