"""spark-submit entrypoint (north rule: `spark-submit --py-files`).

Usage on a cluster (the --py-files zip ships the package to executors;
lucene_spark.session.make_pyfiles_zip builds it):

    ZIP=$(python -c 'from lucene_spark.session import make_pyfiles_zip as z; print(z())')
    spark-submit --master <master> --py-files "$ZIP" submit.py \
        build --source /data/source_files --index /data/index \
        [--analyzer standard] [--content-col content] [--field content] \
        [--docs-per-segment 250000] [--num-batches 1] [--doc-id-col NAME]

    spark-submit ... submit.py merge  --index /data/index [--force 1]
    spark-submit ... submit.py search --index /data/index --query 'a AND b' [--k 10]
    spark-submit ... submit.py check  --index /data/index

Under spark-submit the session comes from the submit context
(SparkSession.builder.getOrCreate picks up the submitted conf); run
standalone it falls back to lucene_spark.get_spark() local mode.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _spark():
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from lucene_spark import get_spark

    return get_spark("lucene_spark_submit")


def cmd_build(args) -> None:
    from lucene_spark.index.builder import IndexConfig, build_index

    spark = _spark()
    src = spark.read.parquet(args.source)
    cfg = IndexConfig(
        field=args.field,
        content_col=args.content_col,
        analyzer=args.analyzer,
        docs_per_segment=args.docs_per_segment,
        num_batches=args.num_batches,
        doc_id_col=args.doc_id_col,
    )
    t0 = time.time()
    build_index(spark, src, args.index, cfg)
    n = spark.read.parquet(f"{args.index}/docs").count()
    sec = time.time() - t0
    print(json.dumps({
        "cmd": "build", "index": args.index, "num_docs": n,
        "build_sec": round(sec, 2), "files_per_sec": round(n / sec, 1),
    }))


def cmd_merge(args) -> None:
    from lucene_spark.index.merge import force_merge, merge_round

    spark = _spark()
    if args.force:
        rounds = force_merge(spark, args.index, max_segments=args.force)
        print(json.dumps({"cmd": "force_merge", "rounds": rounds}))
    else:
        n = merge_round(spark, args.index)
        print(json.dumps({"cmd": "merge_round", "merges": n}))


def cmd_search(args) -> None:
    from lucene_spark.search.executor import IndexReader, IndexSearcher
    from lucene_spark.search.queryparser import QueryParser

    spark = _spark()
    reader = IndexReader(spark, args.index)
    field = reader.manifest["field"]
    q = QueryParser(field).parse(args.query)
    top = IndexSearcher(reader).search(q, k=args.k)
    print(json.dumps({
        "cmd": "search", "query": args.query, "total_hits": top.total_hits,
        "hits": [{"doc_id": h.doc_id, "score": float(h.score)} for h in top.hits],
    }))


def cmd_check(args) -> None:
    from lucene_spark.index.checkindex import check_index, exorcise

    spark = _spark()
    rep = check_index(spark, args.index)
    if not rep["ok"] and args.exorcise:
        # CheckIndex -exorcise: drop the violating segments, recommit
        rep["exorcised"] = exorcise(spark, args.index)
        rep = {**check_index(spark, args.index), "exorcised": rep["exorcised"]}
    print(json.dumps(rep))
    if not rep["ok"]:
        sys.exit(2)


def cmd_inspect(args) -> None:
    """luke / misc-tools role: overview + HighFreqTerms + segments."""
    from lucene_spark.index.inspect import (
        high_freq_terms,
        overview,
        segment_report,
    )
    from lucene_spark.search.executor import IndexReader

    reader = IndexReader(_spark(), args.index)
    out = {"cmd": "inspect", "overview": overview(reader)}
    if args.term and args.field:
        # GetTermInfo (misc/GetTermInfo.java): df + ttf for one term
        from lucene_spark.index.inspect import term_info

        out["term_info"] = term_info(reader, args.field, args.term)
    if args.field:
        out["high_freq_terms"] = [
            r.asDict()
            for r in high_freq_terms(
                reader, args.field, k=args.top,
                by_total_term_freq=args.by_ttf,
            ).collect()
        ]
    out["segments"] = [r.asDict() for r in segment_report(reader).collect()]
    print(json.dumps(out))


def cmd_split(args) -> None:
    """PKIndexSplitter role."""
    from pyspark.sql import functions as F

    from lucene_spark.index.addindexes import split_index

    n_pass, n_fail = split_index(
        _spark(), args.index, args.out_pass, args.out_fail,
        F.expr(args.predicate),
    )
    print(json.dumps({"cmd": "split", "pass_docs": n_pass, "fail_docs": n_fail}))


def cmd_multipass_split(args) -> None:
    """MultiPassIndexSplitter role: N-way split, round-robin or -seq."""
    from lucene_spark.index.addindexes import multipass_split_index

    outs = args.out
    counts = multipass_split_index(
        _spark(), args.index, outs, sequential=args.seq
    )
    print(json.dumps({"cmd": "multipass_split", "parts": counts}))


def cmd_replicate(args) -> None:
    """ReplicaNode.sync role: pull the primary's newest version."""
    from lucene_spark.index.nrtreplication import PrimaryNode, ReplicaNode

    state = PrimaryNode(args.primary).copy_state()
    out = ReplicaNode(args.replica).sync(state)
    print(json.dumps({"cmd": "replicate", **out}))


def cmd_upgrade(args) -> None:
    """IndexUpgrader role."""
    from lucene_spark.index.addindexes import upgrade_index

    gen = upgrade_index(_spark(), args.index, args.format)
    print(json.dumps({"cmd": "upgrade", "format": args.format, "generation": gen}))


def cmd_reorder(args) -> None:
    """BPIndexReorderer role: graph-bisection doc-id reordering."""
    from lucene_spark.index.reorder import bp_reorder_index

    gen = bp_reorder_index(
        _spark(), args.index, args.out,
        field=args.field, max_iters=args.max_iters,
    )
    print(json.dumps({"cmd": "reorder", "out": args.out, "generation": gen}))


def cmd_dedup(args) -> None:
    """Curation-pipeline dedup pass over a documents parquet: exact
    (content hash), minhash (banded LSH pairs + CC canonical ids), or
    lines-kept stats; writes the result parquet."""
    from lucene_spark.pipeline import dedup as dd

    spark = _spark()
    docs = spark.read.parquet(args.source)
    if args.method == "exact":
        out = dd.exact_dedup(docs, k=args.limit)
    elif args.method == "minhash":
        pairs = dd.minhash_lsh_pairs(
            docs, threshold=args.threshold, k=args.limit
        )
        out = dd.dedup_clusters(pairs) if args.clusters else pairs
    elif args.method == "simhash":
        out = dd.simhash_pairs(
            docs, max_hamming=args.max_hamming, k=args.limit
        )
    else:
        raise SystemExit(f"unknown method {args.method}")
    out.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"cmd": "dedup", "method": args.method,
                      "out": args.out, "rows": n}))


def cmd_quality(args) -> None:
    """Quality scoring pass: Gopher rule bitmask + C4 heuristics +
    token stats joined on doc_id, written as one parquet."""
    from lucene_spark.pipeline import textstats as ts

    spark = _spark()
    docs = spark.read.parquet(args.source)
    g = ts.gopher_rules(docs, k=args.limit)
    c = ts.c4_filters(docs, k=args.limit)
    t = ts.token_stats(docs, k=args.limit)
    out = g.join(c, "doc_id").join(t, "doc_id")
    out.write.mode("overwrite").parquet(args.out)
    n = spark.read.parquet(args.out).count()
    print(json.dumps({"cmd": "quality", "out": args.out, "rows": n}))


def cmd_ann(args) -> None:
    """ANN query over an embeddings parquet: brute cosine, IVF, HNSW,
    or IVF-routed HNSW."""
    from lucene_spark.pipeline import graphann as ga
    from lucene_spark.pipeline import similarity as sim

    spark = _spark()
    emb = spark.read.parquet(args.source)
    if args.method == "cosine":
        out = sim.cosine_topk(emb, args.query_id, args.k)
    elif args.method == "ivf":
        out = sim.ann_ivf_topk(
            emb, args.query_id, args.k,
            n_centroids=args.n_centroids, n_probe=args.n_probe,
        )
    elif args.method == "hnsw":
        out = ga.ann_hnsw_topk(emb, args.query_id, args.k)
    elif args.method == "routed":
        out = ga.ann_routed_hnsw_topk(
            emb, args.query_id, args.k,
            n_centroids=args.n_centroids, n_probe=args.n_probe,
        )
    else:
        raise SystemExit(f"unknown method {args.method}")
    rows = [(r["vec_id"], r["cos_x1e6"]) for r in out.collect()]
    print(json.dumps({"cmd": "ann", "method": args.method, "hits": rows}))


def main() -> None:
    p = argparse.ArgumentParser(prog="submit.py")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--source", required=True)
    b.add_argument("--index", required=True)
    b.add_argument("--field", default="content")
    b.add_argument("--content-col", default="content")
    b.add_argument("--analyzer", default="standard")
    b.add_argument("--docs-per-segment", type=int, default=250_000)
    b.add_argument("--num-batches", type=int, default=1)
    b.add_argument("--doc-id-col", default=None)
    b.set_defaults(fn=cmd_build)

    m = sub.add_parser("merge")
    m.add_argument("--index", required=True)
    m.add_argument("--force", type=int, default=0)
    m.set_defaults(fn=cmd_merge)

    s = sub.add_parser("search")
    s.add_argument("--index", required=True)
    s.add_argument("--query", required=True)
    s.add_argument("--k", type=int, default=10)
    s.set_defaults(fn=cmd_search)

    c = sub.add_parser("check")
    c.add_argument("--index", required=True)
    c.add_argument("--exorcise", action="store_true")
    c.set_defaults(fn=cmd_check)

    i = sub.add_parser("inspect")
    i.add_argument("--index", required=True)
    i.add_argument("--field", default=None)
    i.add_argument("--top", type=int, default=20)
    i.add_argument("--by-ttf", action="store_true")
    i.add_argument("--term", default=None)
    i.set_defaults(fn=cmd_inspect)

    sp_ = sub.add_parser("split")
    sp_.add_argument("--index", required=True)
    sp_.add_argument("--out-pass", required=True)
    sp_.add_argument("--out-fail", required=True)
    sp_.add_argument("--predicate", required=True,
                     help="SQL predicate over the docs registry")
    sp_.set_defaults(fn=cmd_split)

    mp = sub.add_parser("multipass_split")
    mp.add_argument("--index", required=True)
    mp.add_argument("--out", action="append", required=True,
                    help="repeat once per output part (>= 2)")
    mp.add_argument("--seq", action="store_true",
                    help="contiguous ranges instead of round-robin")
    mp.set_defaults(fn=cmd_multipass_split)

    rp = sub.add_parser("replicate")
    rp.add_argument("--primary", required=True)
    rp.add_argument("--replica", required=True)
    rp.set_defaults(fn=cmd_replicate)

    u = sub.add_parser("upgrade")
    u.add_argument("--index", required=True)
    u.add_argument("--format", required=True)
    u.set_defaults(fn=cmd_upgrade)

    ro = sub.add_parser("reorder")
    ro.add_argument("--index", required=True)
    ro.add_argument("--out", required=True)
    ro.add_argument("--field", default=None)
    ro.add_argument("--max-iters", type=int, default=20)
    ro.set_defaults(fn=cmd_reorder)

    dd = sub.add_parser("dedup")
    dd.add_argument("--source", required=True)
    dd.add_argument("--out", required=True)
    dd.add_argument("--method", default="minhash",
                    choices=["exact", "minhash", "simhash"])
    dd.add_argument("--threshold", type=float, default=0.2)
    dd.add_argument("--max-hamming", type=int, default=6)
    dd.add_argument("--clusters", action="store_true")
    dd.add_argument("--limit", type=int, default=1_000_000)
    dd.set_defaults(fn=cmd_dedup)

    q = sub.add_parser("quality")
    q.add_argument("--source", required=True)
    q.add_argument("--out", required=True)
    q.add_argument("--limit", type=int, default=1_000_000)
    q.set_defaults(fn=cmd_quality)

    an = sub.add_parser("ann")
    an.add_argument("--source", required=True)
    an.add_argument("--method", default="routed",
                    choices=["cosine", "ivf", "hnsw", "routed"])
    an.add_argument("--query-id", type=int, default=0)
    an.add_argument("--k", type=int, default=10)
    an.add_argument("--n-centroids", type=int, default=16)
    an.add_argument("--n-probe", type=int, default=4)
    an.set_defaults(fn=cmd_ann)

    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
