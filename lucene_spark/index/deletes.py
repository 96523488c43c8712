"""Deletes — Lucene's tombstone model (SURVEY.md §2.3).

Reference semantics (CORE/index/BufferedUpdates.java,
Lucene90LiveDocsFormat.java): a delete marks docs in a live-docs bitset;
queries skip deleted docs but **collection/term statistics keep counting
them until the docs are physically purged by a merge**
(IndexWriter docFreq contract). ``updateDocument`` = atomic
delete-by-term + add.

Table mapping: tombstones live in ``deletes/batch=K`` parquet
(doc_id bigint), published by a manifest commit (readers never see a
half-written tombstone batch). Query-side, every matched-doc stream is
anti-joined against the tombstone set (executor passes a broadcast
frozenset into the per-segment kernel; sqlpath anti-joins lazily).
Merge purges: postings of merged segments drop tombstoned docs, and the
covered tombstones are rewritten out; manifest tracks the cumulative
``purged_docs`` count so CheckIndex can reconcile live doc counts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.index import manifest as mani


def _next_delete_batch(m: dict) -> int:
    return 1 + max([d["batch"] for d in m.get("delete_batches", [])], default=-1)


def deleted_ids_df(spark: SparkSession, index_dir: str, m: dict | None = None) -> DataFrame | None:
    """Committed tombstones as DataFrame(doc_id), or None if none."""
    m = m or mani.read_manifest(index_dir)
    batches = m.get("delete_batches", [])
    if not batches:
        return None
    return spark.read.parquet(
        *[f"{index_dir}/deletes/batch={d['batch']}" for d in batches]
    ).select("doc_id").distinct()


def live_total(m: dict, dels: DataFrame | None) -> int:
    """The live-doc arithmetic shared by IndexSearcher.count(MatchAll),
    the MatchAll collector total and live_doc_count: manifest total
    minus merge-purged docs minus distinct live tombstones."""
    total = int(m["num_docs_total"]) - int(m.get("purged_docs", 0))
    if dels is not None:
        total -= dels.select("doc_id").distinct().count()
    return total


def delete_by_ids(spark: SparkSession, index_dir: str, ids: DataFrame) -> int:
    """Tombstone the given doc ids (DataFrame with a doc_id column).
    Returns the new manifest generation. Two-phase: parquet first,
    manifest publish second."""
    m = mani.read_manifest(index_dir)
    b = _next_delete_batch(m)
    ids = ids.select("doc_id").distinct()
    n = ids.count()
    if n == 0:
        return m["generation"]
    ids.write.mode("overwrite").parquet(f"{index_dir}/deletes/batch={b}")
    out = dict(m)
    out.pop("generation", None)
    out.pop("committed_at", None)
    out["delete_batches"] = list(m.get("delete_batches", [])) + [
        {"batch": b, "num_docs": int(n)}
    ]
    out["num_deleted"] = int(m.get("num_deleted", 0) + n)
    return mani.commit_manifest(index_dir, out)


def delete_by_term(spark: SparkSession, index_dir: str, field: str, term: str) -> int:
    """Delete every live doc containing `term` (IndexWriter
    deleteDocuments(Term) analog)."""
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.executor import IndexReader

    reader = IndexReader(spark, index_dir)
    matched = sp.exploded_postings(reader, field, [term]).select("doc_id").distinct()
    return delete_by_ids(spark, index_dir, matched)


def update_document(
    spark: SparkSession,
    index_dir: str,
    field: str,
    term: str,
    new_docs: DataFrame,
    cfg,
) -> int:
    """updateDocuments semantics (IndexWriter.java:1538-1558): atomic
    delete-by-term + append of the replacement docs. The tombstone
    parquet and the appended segment parquet are both staged first, then
    published by ONE manifest commit — readers see either the old doc or
    (tombstone + new doc), never neither."""
    from lucene_spark.search import sqlpath as sp
    from lucene_spark.search.executor import IndexReader
    from lucene_spark.streaming.nrt import append_batch

    reader = IndexReader(spark, index_dir)
    matched = sp.exploded_postings(reader, field, [term]).select("doc_id").distinct()
    return append_batch(
        spark, new_docs, index_dir, cfg, pending_deletes=matched
    )


def live_doc_count(spark: SparkSession, index_dir: str) -> int:
    """numDocs analog: maxDoc-ish total minus current tombstones."""
    m = mani.read_manifest(index_dir)
    return live_total(m, deleted_ids_df(spark, index_dir, m))


def matching_ids(reader, q) -> DataFrame:
    """The UNSCORED relational match set of a query: DataFrame(doc_id)
    of every LIVE doc matching ``q`` (tombstoned docs are excluded on
    every branch — the term paths inherit exploded_postings' liveDocs
    anti-join and the MatchAll branch applies it explicitly) — the
    doc-id resolution step of ``IndexWriter.deleteDocuments(Query...)``
    (CORE/index/IndexWriter.java:1816; the reference resolves the
    query lazily per segment at flush — here the resolution is one
    distributed set-algebra plan over the term-pruned postings scan,
    never a driver-side candidate list).

    Supported query family (the delete-by-query shapes): Term,
    Synonym, the multi-term rewrites (Prefix/Wildcard/Regexp/Fuzzy/
    TermRange/TermInSet), MatchAll/MatchNoDocs, Constant/Boost
    wrappers (scoreless here), and arbitrarily nested BooleanQuery
    (MUST intersect, FILTER intersect, SHOULD with minimum-should-
    match, MUST_NOT anti-join). Positional and other scoring-only
    queries raise — compose those via the searcher + delete_by_ids.
    """
    from lucene_spark.search import query as Q
    from lucene_spark.search import sqlpath as sp

    spark = reader.spark
    q = Q.rewrite_fixpoint(q)

    def ids(node) -> DataFrame:
        if isinstance(node, (Q.ConstantScoreQuery, Q.BoostQuery)):
            return ids(node.query)
        if isinstance(node, Q.MatchAllQuery):
            alive = reader.docs().select("doc_id")
            dead = reader.deleted_df()
            if dead is not None:
                alive = alive.join(dead, "doc_id", "left_anti")
            return alive
        if isinstance(node, Q.MatchNoDocsQuery):
            return spark.createDataFrame([], "doc_id long")
        if isinstance(node, Q.TermQuery):
            return (
                sp.exploded_postings(reader, node.field, [node.term])
                .select("doc_id").distinct()
            )
        if isinstance(node, Q.SynonymQuery):
            return (
                sp.exploded_postings(
                    reader, node.field, sorted(set(node.terms))
                ).select("doc_id").distinct()
            )
        if isinstance(node, Q.TermInSetQuery):
            # literal term set — no dictionary expansion needed
            terms = sorted(set(node.terms))
            return (
                sp.exploded_postings(reader, node.field, terms)
                .select("doc_id").distinct()
            )
        if isinstance(node, (
            Q.PrefixQuery, Q.WildcardQuery, Q.RegexpQuery,
            Q.FuzzyQuery, Q.TermRangeQuery,
        )):
            if hasattr(reader, "expand"):
                terms = reader.expand(node)
            else:
                # composite readers expand through their sub-readers'
                # term dictionaries (union — MultiTermQuery rewrite
                # over the logical union dictionary)
                subs = getattr(reader, "readers", None)
                if subs is None:
                    raise TypeError(
                        f"reader {type(reader).__name__} cannot expand "
                        f"{type(node).__name__}"
                    )
                acc: set[str] = set()
                for r in subs:
                    acc.update(r.expand(node))
                terms = sorted(acc)
            if not terms:
                return spark.createDataFrame([], "doc_id long")
            return (
                sp.exploded_postings(reader, node.field, sorted(terms))
                .select("doc_id").distinct()
            )
        if isinstance(node, Q.BooleanQuery):
            out = None
            for c in list(node.must) + list(node.filter):
                ci = ids(c)
                out = ci if out is None else out.join(ci, "doc_id")
            if node.should:
                # a should-only boolean needs >= 1 clause; with MUST/
                # FILTER present, minShouldMatch=0 means the SHOULD
                # clauses are scoring-only and do NOT constrain the
                # match set (BooleanQuery.java required-clause rule)
                m = max(node.min_should, 0 if out is not None else 1)
                if m >= 1:
                    parts = [
                        ids(c).withColumn("_cl", F.lit(i))
                        for i, c in enumerate(node.should)
                    ]
                    u = parts[0]
                    for p in parts[1:]:
                        u = u.unionByName(p)
                    sh = (
                        u.groupBy("doc_id")
                        .agg(F.countDistinct("_cl").alias("_n"))
                        .filter(F.col("_n") >= m)
                        .select("doc_id")
                    )
                    out = sh if out is None else out.join(sh, "doc_id")
            if out is None:
                raise ValueError("BooleanQuery with no positive clause")
            for c in node.must_not:
                out = out.join(ids(c), "doc_id", "left_anti")
            return out
        raise TypeError(
            f"delete-by-query does not support {type(node).__name__}; "
            "run the query through the searcher and use delete_by_ids"
        )

    return ids(q)


def delete_by_query(spark: SparkSession, index_dir: str, q) -> int:
    """``IndexWriter.deleteDocuments(Query...)`` analog
    (CORE/index/IndexWriter.java:1816): tombstone every LIVE doc
    matching the query (matching_ids is live-only, so ``num_deleted``
    accounting stays exact across repeated deletes). Same two-phase
    contract as delete_by_ids: tombstone parquet first, one manifest
    generation publish second."""
    from lucene_spark.search.executor import IndexReader

    reader = IndexReader(spark, index_dir)
    return delete_by_ids(spark, index_dir, matching_ids(reader, q))
