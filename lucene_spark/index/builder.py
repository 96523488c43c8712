"""Distributed index build — the IndexWriter analog, Spark-first.

Pipeline (SURVEY.md §3.1 mapped to Spark):

1. deterministic global doc_id assignment from a total order on the id
   columns (Lucene analog: insertion order; ours must be reproducible
   across runs AND cluster sizes, so it derives from data, never from
   scheduling) — range partition + sortWithinPartitions + per-partition
   offsets; no single-partition global sort, no window over all rows;
2. per-partition segment inversion via ``mapInPandas``
   (segment.build_segment — the DWPT pass). ONE tokenize pass produces
   both doc rows and posting rows (union schema), because tokenization
   dominates build cost at 100 TB;
3. staging parquet is split (shuffle-free filter-write) into
   ``postings/`` (term-sorted within each segment file) and
   ``doclens/``;
4. global ``term_stats``/``field_stats`` aggregation — the only shuffle
   in the build, map-side-combined by Spark, tiny output
   (IndexSearcher.java:1119-1149 stats semantics: summed over segments);
5. two-phase manifest commit (manifest.py) with per-batch lineage +
   metrics -> checkpoint-resumable: committed batches are skipped on
   rerun.

Batches: the corpus is split by doc_id range into ``num_batches``
independent build jobs. Each batch commits its own manifest generation;
a killed build resumes at the first uncommitted batch. (TieredMergePolicy
compaction of many small segments is in merge.py.)

The docs registry (doc_id + source columns + sha256) is written purely
JVM-side (F.sha2) — the per-row content-sha256 invariant never touches
Python.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dc_field

from pyspark import TaskContext
from pyspark.sql import DataFrame, SparkSession, functions as F

from lucene_spark.analysis import get_analyzer
from lucene_spark.index import manifest as mani
from lucene_spark.index.segment import STAGING_SCHEMA, build_segment


LAYOUT_VERSION = 4  # bump when table schemas change (postings gained `payloads`)


@dataclass
class IndexConfig:
    field: str = "content"
    content_col: str = "content"
    analyzer: str = "standard"
    store_positions: bool = True
    # store each occurrence's char span beside positions (IndexOptions
    # ..._AND_OFFSETS role) — required for index-driven highlighting;
    # needs an offsets-tracking analyzer chain
    store_offsets: bool = False
    # store one float payload per occurrence (PostingsFormat .pay role,
    # fed by a DelimitedPayloadTokenFilter-style analyzer) — consumed
    # by PayloadScoreQuery / SpanPayloadCheckQuery
    store_payloads: bool = False
    # multi-field indexing (Document = bag of fields, SURVEY §1.1):
    # extra fields as {field_name: content_column}; the primary
    # `field`/`content_col` pair carries the sha256 invariant and the
    # manifest doc counts.
    extra_fields: dict | None = None
    # PerFieldAnalyzerWrapper role (analysis/miscellaneous/
    # PerFieldAnalyzerWrapper.java): per-field analyzer-name overrides;
    # fields absent from the map use `analyzer`.
    field_analyzers: dict | None = None
    # Postings blob codec (PostingsFormat SPI, codecs module):
    # "for104" (FOR-blocked, default) or "varint" — recorded in the
    # manifest, resolved by name everywhere postings are (de)coded
    postings_format: str = "for104"
    # Index sorting (IndexWriterConfig.java:475-482 setIndexSort): when
    # set, doc ids are assigned in ascending order of this column (then
    # id_cols as tie-break), segments record per-segment min/max of the
    # key in the manifest, and field_sort_topk early-terminates by
    # skipping segments whose range cannot compete
    # (TopFieldCollector.java canEarlyTerminate). Incompatible with
    # doc_id_col (a preassigned id fixes the doc order).
    sort_by: str | None = None
    # Lucene slices cap at 250k docs (IndexSearcher.java:106-108); our
    # segments target the same order of magnitude.
    docs_per_segment: int = 250_000
    num_batches: int = 1
    id_cols: tuple[str, ...] = ("repo", "path", "commit")
    doc_id_col: str | None = None  # use an existing unique id column
    k1: float = 1.2
    b: float = 0.75
    extra: dict = dc_field(default_factory=dict)

    def analyzer_for(self, field: str) -> str:
        if self.field_analyzers and field in self.field_analyzers:
            return self.field_analyzers[field]
        return self.analyzer

    def all_fields(self) -> dict:
        out = {self.field: self.content_col}
        if self.extra_fields:
            for f, c in self.extra_fields.items():
                if f != self.field:
                    out[f] = c
        return out


def _sortable_str(df: DataFrame, col: str) -> F.Column:
    """Order-preserving string encoding of a sort column: integral types
    become fixed-width offset-shifted decimals (so '2' < '10' sorts
    numerically); strings pass through. The index-sort key must be
    expressible as a string because it joins the range-partition key."""
    dt = dict((f.name, f.dataType.simpleString()) for f in df.schema.fields)[col]
    if dt in ("tinyint", "smallint", "int", "bigint", "long", "date", "timestamp"):
        # shift by 2^62 keeps negatives positive; %019d is fixed width
        return F.format_string(
            "%019d", F.col(col).cast("long") + F.lit(1 << 62).cast("long")
        )
    return F.col(col).cast("string")


def assign_doc_ids(df: DataFrame, cfg: IndexConfig) -> DataFrame:
    """Deterministic dense doc_id from the total order on id_cols.

    Scalable zipWithIndex: range-partition by the key, sort within
    partitions, then offset each partition by the cumulative count of the
    partitions before it (two passes, no global single-partition sort).
    Partition boundaries do not affect the resulting order, so the ids
    are stable across cluster sizes.
    """
    if cfg.doc_id_col:
        return df.withColumnRenamed(cfg.doc_id_col, "doc_id") if cfg.doc_id_col != "doc_id" else df

    keys = [F.col(c) for c in cfg.id_cols]
    n = df.count()
    parts = max(1, (n + cfg.docs_per_segment - 1) // cfg.docs_per_segment)
    ordered = df.repartitionByRange(parts, *keys).sortWithinPartitions(*keys)

    def add_local(it):
        import pandas as pd  # noqa: F401
        pid = TaskContext.get().partitionId()
        i = 0
        for pdf in it:
            pdf = pdf.copy()
            pdf["_pid"] = pid
            pdf["_local"] = range(i, i + len(pdf))
            i += len(pdf)
            yield pdf

    from pyspark.sql import types as T

    schema = T.StructType(
        list(ordered.schema.fields)
        + [T.StructField("_pid", T.IntegerType()), T.StructField("_local", T.LongType())]
    )
    with_local = ordered.mapInPandas(add_local, schema=schema)
    with_local = with_local.persist()
    counts = {
        r["_pid"]: r["cnt"]
        for r in with_local.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_df = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    out = with_local.withColumn(
        "doc_id", F.element_at(off_df, F.col("_pid")) + F.col("_local")
    ).drop("_pid", "_local")
    return out


def _invert_fields(
    seg_id, doc_ids, pdf, ans, fields: dict, store_pos: bool,
    store_off: bool = False, store_pay: bool = False,
    postings_format: str = "for104",
):
    """Invert every (field, content_col) of one segment; doc rows carry
    their field so doclens are per (doc, field) — a Document is a bag of
    fields (SURVEY §1.1). ``ans``: field -> Analyzer (the
    PerFieldAnalyzerWrapper role), or a single Analyzer for all."""
    import pandas as pd

    frames = []
    for fname, col in fields.items():
        an = ans[fname] if isinstance(ans, dict) else ans
        seg = build_segment(
            seg_id, doc_ids, pdf[col], an, fname, store_positions=store_pos,
            store_offsets=store_off, store_payloads=store_pay,
            postings_format=postings_format,
        )
        seg.loc[seg["row_type"] == 0, "field"] = fname
        frames.append(seg)
    return pd.concat(frames, ignore_index=True) if len(frames) > 1 else frames[0]


def make_invert_fn(
    analyzer_name: str, content_col: str, fieldname: str, store_pos: bool,
    fields: dict | None = None, field_analyzers: dict | None = None,
    store_off: bool = False, store_pay: bool = False,
    postings_format: str = "for104",
):
    """The DWPT pass as a mapInPandas closure: one partition -> one
    segment (tokenize, count freqs, sort terms once). Shared by the
    batch builder and the streaming NRT appender."""
    fields = fields or {fieldname: content_col}

    def invert(it):
        pid = TaskContext.get().partitionId()
        an = {
            f: get_analyzer((field_analyzers or {}).get(f, analyzer_name))
            for f in fields
        }
        import pandas as pd

        bufs = []
        for pdf in it:
            bufs.append(pdf)
        if bufs:
            pdf = pd.concat(bufs, ignore_index=True)
            pdf = pdf.sort_values("doc_id")
            seg_id = f"b{pdf['_batch'].iat[0]:04d}p{pid:05d}"
            yield _invert_fields(
                seg_id, pdf["doc_id"].to_numpy(), pdf, an, fields, store_pos,
                store_off, store_pay, postings_format,
            )

    return invert


def _make_fused_fn(
    analyzer_name: str,
    content_col: str,
    fieldname: str,
    store_pos: bool,
    meta_cols: list[str],
    offsets: dict[int, int] | None,
    fields: dict | None = None,
    field_analyzers: dict | None = None,
    store_off: bool = False,
    store_pay: bool = False,
    postings_format: str = "for104",
):
    """The fused DWPT pass: ONE Python crossing per partition that
    (a) assigns dense deterministic doc_ids from the per-partition
    offsets (None = a pre-assigned doc_id column exists), (b) computes
    the content sha256 invariant, (c) inverts the segment. Doc rows
    carry registry metadata; posting rows carry the index."""

    def run(it):
        import hashlib

        import numpy as np
        import pandas as pd

        flds = fields or {fieldname: content_col}
        an = {
            f: get_analyzer((field_analyzers or {}).get(f, analyzer_name))
            for f in flds
        }
        bufs = list(it)
        if not bufs:
            return
        full = pd.concat(bufs, ignore_index=True)
        if len(full) == 0:
            return
        # a physical partition may hold several pid groups (hash
        # placement of the explicit range ids) — one segment per pid
        for pid, pdf in full.groupby("_pid", sort=True):
            pid = int(pid)
            pdf = pdf.reset_index(drop=True)
            if offsets is None:
                pdf = pdf.sort_values("doc_id").reset_index(drop=True)
                doc_ids = pdf["doc_id"].to_numpy()
            else:
                # rows arrive in sortWithinPartitions (_pid, keys) order —
                # already the total key order within this range group
                doc_ids = offsets[pid] + np.arange(len(pdf), dtype=np.int64)
            batch_no = int(pdf["_batch"].iat[0])
            seg_id = f"b{batch_no:04d}p{pid:05d}"
            out = _invert_fields(
                seg_id, doc_ids, pdf, an, fields or {fieldname: content_col},
                store_pos, store_off, store_pay, postings_format,
            )
            # attach registry columns to the PRIMARY field's doc rows
            # (aligned: build_segment emits doc rows first in doc_id
            # order == pdf order, and the primary field is inverted first)
            n_docs = len(pdf)
            # null content hashes to NULL — parity with the JVM path's
            # F.sha2(NULL) = NULL (NRT appender, registry invariant)
            sha = pdf[content_col].map(
                lambda s: None
                if s is None or (isinstance(s, float) and pd.isna(s))
                else hashlib.sha256(str(s).encode("utf-8")).hexdigest()
            )
            for c in meta_cols:
                vals = pd.Series([None] * len(out), dtype=object)
                vals.iloc[:n_docs] = pdf[c].astype(object).to_numpy()
                out[c] = vals
            sha_col = pd.Series([None] * len(out), dtype=object)
            sha_col.iloc[:n_docs] = sha.to_numpy()
            out["content_sha256"] = sha_col
            yield out

    return run


def build_index(
    spark: SparkSession,
    source: DataFrame,
    index_dir: str,
    cfg: IndexConfig | None = None,
    fail_after_batch: int | None = None,
) -> None:
    """Build (or resume) the index at index_dir from the source DataFrame.

    Single-pass design (the 100 TB shape): ONE shuffle (range partition
    by the doc order key), one cheap JVM-only count per partition, then
    ONE fused mapInPandas pass per batch that assigns doc_ids, computes
    the sha256 invariant, and inverts — emitting docs-registry, doclens
    and postings rows together. No staging table, no second shuffle, no
    extra Arrow crossing of the content column.

    ``fail_after_batch`` injects a crash after committing that many
    batches — used by the resume test (SURVEY.md §5 e2e plan).
    """
    cfg = cfg or IndexConfig()
    analyzer_name = cfg.analyzer
    fieldname = cfg.field
    store_pos = cfg.store_positions

    # resume: find already-committed batches
    done: set[int] = set()
    try:
        m = mani.read_manifest(index_dir)
        done = {b["batch"] for b in m.get("batches", [])}
    except FileNotFoundError:
        m = None
    committed = list(m.get("batches", [])) if m else []

    if cfg.doc_id_col and cfg.doc_id_col != "doc_id":
        source = source.withColumnRenamed(cfg.doc_id_col, "doc_id")
    preassigned = bool(cfg.doc_id_col)
    keys = ["doc_id"] if preassigned else list(cfg.id_cols)

    n_docs = source.count()
    parts = max(1, (n_docs + cfg.docs_per_segment - 1) // cfg.docs_per_segment)
    num_batches = max(1, min(cfg.num_batches, parts))
    pids_per_batch = (parts + num_batches - 1) // num_batches

    from pyspark.storagelevel import StorageLevel

    # Deterministic range boundaries from a seeded sample of the KEY
    # columns (a column-pruned parquet scan — a fraction of the data).
    # Explicit boundaries (instead of repartitionByRange's private
    # sampling) let the doc-count pass also run over keys only, so the
    # full text crosses the cluster exactly ONCE (the data shuffle) with
    # no persist. doc_ids stay data-derived and cluster-size-stable:
    # order comes from the key values, never from scheduling.
    if preassigned:
        if cfg.sort_by:
            raise ValueError("sort_by is incompatible with doc_id_col")
        sort_key = F.col("doc_id").cast("double")
    elif cfg.sort_by:
        # index sort: the sort column leads the key (order-preserving
        # fixed-width encoding for integral types), id_cols tie-break
        sort_key = F.concat_ws(
            "\x01",
            _sortable_str(source, cfg.sort_by),
            *[F.col(c) for c in keys],
        )
    else:
        # lexicographic tuple order via \x01-joined key string (safe for
        # keys above control characters, which repo/path/commit are)
        sort_key = F.concat_ws("\x01", *[F.col(c) for c in keys])
    keyed = source.select(sort_key.alias("_sk"))
    # bound the driver-side boundary sample: 200 keys/part until the
    # total would exceed ~1M keys, then shrink per-part (>= 20) so the
    # collect stays O(1M) regardless of parts (the RangePartitioner
    # sample-cap analog). parts <= 5000 is unchanged -> doc ids on all
    # existing fixtures are byte-identical.
    per_part = 200.0 if parts <= 5000 else max(20.0, 1_000_000.0 / parts)
    frac = min(1.0, (per_part * parts) / max(1, n_docs))
    sample = (
        sorted(r["_sk"] for r in keyed.sample(fraction=frac, seed=42).collect())
        if parts > 1
        else []  # single partition: no boundaries, skip the sample job
    )
    if parts > 1 and sample:
        step = len(sample) / parts
        bounds = [sample[int(i * step)] for i in range(1, parts)]
    else:
        bounds = []
    if bounds:
        # vectorized partition assignment: pid = #bounds <= key, i.e.
        # np.searchsorted(bounds, key, side="right") — O(log parts) per
        # row on an Arrow batch, vs the O(parts)-per-row array-literal
        # scan this replaces (builds at 10^12 files have parts ~ 4M:
        # a linear scan per row is O(n*parts); this is O(n log parts)).
        # Bounds ride a Spark broadcast: shipped once per executor, not
        # embedded in the plan as a 4M-element literal.
        from pyspark.sql.functions import pandas_udf

        b_bc = spark.sparkContext.broadcast(bounds)
        numeric_key = preassigned

        @pandas_udf("int")
        def _pid_udf(sk):
            import numpy as np
            import pandas as pd

            bs = b_bc.value
            if numeric_key:
                barr = np.asarray(bs, dtype="float64")
                vals = sk.to_numpy(dtype="float64")
            else:
                # python-str comparison == UTF-8 byte order (UTF-8 is
                # code-point-order preserving), matching Spark's string
                # ordering that produced the sample
                barr = np.asarray(bs, dtype=object)
                vals = sk.to_numpy(dtype=object)
            pid = np.searchsorted(barr, vals, side="right")
            return pd.Series(pid.astype("int32"))

        pid_expr = _pid_udf(F.col("_sk"))
    else:
        pid_expr = F.lit(0)

    # doc-count pass over keys only (column pruning keeps it tiny) —
    # needed ONLY to derive per-partition doc_id offsets when ids are
    # assigned by the build; preassigned ids carry their own values, so
    # that whole job is skipped (one fewer scan per batch)
    offsets: dict[int, int] = {}
    if not preassigned:
        counts = {
            r["_pid"]: r["cnt"]
            for r in keyed.withColumn("_pid", pid_expr)
            .groupBy("_pid")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        acc = 0
        for pid in range(parts):
            offsets[pid] = acc
            acc += counts.get(pid, 0)

    ordered = (
        source.withColumn("_sk", sort_key)
        .withColumn("_pid", pid_expr)
        .withColumn("_batch", (F.col("_pid") / pids_per_batch).cast("int"))
    )
    if cfg.sort_by:
        # index-sorted build: rows order by the full sort key (sort_by
        # leads, id_cols tie-break) — doc ids come out globally sorted
        # by the sort column
        ordered = ordered.repartitionByRange(
            parts, F.col("_pid")
        ).sortWithinPartitions("_pid", "_sk")
    else:
        ordered = (
            ordered.drop("_sk")
            # range-place the integer pids (near-identity: one pid per
            # task; hash placement would collide pids and create 2x
            # stragglers)
            .repartitionByRange(parts, F.col("_pid"))
            .sortWithinPartitions("_pid", *keys)
        )
    if num_batches > 1:
        # multi-batch builds re-read the shuffled frame once per batch
        ordered = ordered.persist(StorageLevel.MEMORY_AND_DISK)

    fields = cfg.all_fields()
    content_cols = set(fields.values())
    meta_cols = [
        c for c in source.columns if c not in content_cols and c != "doc_id"
    ]
    if cfg.store_offsets:
        # fail fast: every field's analyzer chain must track offsets
        for f in fields:
            if not get_analyzer(cfg.analyzer_for(f)).supports_offsets():
                raise ValueError(
                    f"store_offsets: analyzer {cfg.analyzer_for(f)!r} for "
                    f"field {f!r} cannot track offsets"
                )
    if cfg.store_payloads:
        for f in fields:
            if not get_analyzer(cfg.analyzer_for(f)).supports_payloads():
                raise ValueError(
                    f"store_payloads: analyzer {cfg.analyzer_for(f)!r} for "
                    f"field {f!r} does not produce payloads"
                )
    fused = _make_fused_fn(
        analyzer_name, cfg.content_col, fieldname, store_pos, meta_cols,
        None if preassigned else offsets, fields, cfg.field_analyzers,
        cfg.store_offsets, cfg.store_payloads, cfg.postings_format,
    )
    meta_ddl = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in source.schema.fields
        if f.name in meta_cols
    )
    staging_schema = STAGING_SCHEMA + ", " + meta_ddl + ", content_sha256 string" if meta_ddl else (
        STAGING_SCHEMA + ", content_sha256 string"
    )

    try:
        for b in range(num_batches):
            if b in done:
                continue
            t0 = time.time()
            lo_pid = b * pids_per_batch
            hi_pid = min((b + 1) * pids_per_batch, parts)
            subset = ordered.filter(
                (F.col("_pid") >= lo_pid) & (F.col("_pid") < hi_pid)
            )
            staging = subset.mapInPandas(fused, schema=staging_schema).persist(
                StorageLevel.MEMORY_AND_DISK
            )
            staging.filter("row_type = 1").select(
                "segment_id", "field", "term", "doc_freq", "total_term_freq",
                "postings", "norms", "positions", "offsets", "payloads",
                "block_last_doc", "impact_freqs", "impact_norms",
            ).write.mode("overwrite").parquet(f"{index_dir}/postings/batch={b}")
            staging.filter("row_type = 0").select(
                "segment_id", "field", "doc_id", "doc_len", "doc_len_code"
            ).write.mode("overwrite").parquet(f"{index_dir}/doclens/batch={b}")
            staging.filter(
                (F.col("row_type") == 0) & (F.col("field") == fieldname)
            ).select(
                "doc_id", *meta_cols, "content_sha256"
            ).write.mode("overwrite").parquet(f"{index_dir}/docs/batch={b}")

            aggs = [
                F.count("*").alias("num_docs"),
                F.sum("doc_len").alias("sum_doc_len"),
                F.min("doc_id").alias("first_doc_id"),
                F.max("doc_id").alias("last_doc_id"),
            ]
            if cfg.sort_by:
                # per-segment sort-key range — the manifest metadata that
                # drives sorted-segment early termination at query time
                aggs += [
                    F.min(cfg.sort_by).alias("sort_min"),
                    F.max(cfg.sort_by).alias("sort_max"),
                ]
            seg_metrics = [
                r.asDict()
                for r in staging.filter(
                    (F.col("row_type") == 0) & (F.col("field") == fieldname)
                )
                .groupBy("segment_id")
                .agg(*aggs)
                .collect()
            ]
            if not done and num_batches == 1:
                # fresh single-batch build: stats straight from the
                # cached staging (no disk re-read of postings/doclens)
                _recompute_stats(
                    spark, index_dir, fieldname,
                    postings_df=staging.filter("row_type = 1"),
                    doclens_df=staging.filter("row_type = 0").select(
                        "segment_id", "field", "doc_id", "doc_len"
                    ),
                )
                stats_done = True
            else:
                stats_done = False
            staging.unpersist(blocking=False)
            lo = min((s["first_doc_id"] for s in seg_metrics), default=0)
            hi = max((s["last_doc_id"] + 1 for s in seg_metrics), default=0)
            committed.append(
                {
                    "batch": b,
                    "doc_id_range": [int(lo), int(hi)],
                    "segments": sorted(seg_metrics, key=lambda s: s["segment_id"]),
                    "build_sec": round(time.time() - t0, 3),
                    "status": "committed",
                }
            )
            if not stats_done:
                _recompute_stats(spark, index_dir, fieldname)
            mani.commit_manifest(
                index_dir,
                {
                    "field": fieldname,
                    "analyzer": analyzer_name,
                    "k1": cfg.k1,
                    "b": cfg.b,
                    "store_positions": store_pos,
                    "store_offsets": cfg.store_offsets,
                    "store_payloads": cfg.store_payloads,
                    "postings_format": cfg.postings_format,
                    "sort_by": cfg.sort_by,
                    "num_docs_total": int(n_docs),
                    "layout_version": LAYOUT_VERSION,
                    "fields": list(fields),
                    "field_analyzers": cfg.field_analyzers,
                    "num_batches": num_batches,
                    "id_cols": list(cfg.id_cols),
                    "doc_id_col": cfg.doc_id_col,
                    "batches": committed,
                    "lineage": {"source_count": int(n_docs), **cfg.extra},
                },
            )
            if fail_after_batch is not None and b + 1 >= fail_after_batch:
                raise RuntimeError(f"injected failure after batch {b}")
    finally:
        ordered.unpersist()


def _recompute_stats(
    spark: SparkSession,
    index_dir: str,
    fieldname: str,
    live_ids: set[str] | None = None,
    postings_df: DataFrame | None = None,
    doclens_df: DataFrame | None = None,
) -> None:
    """Global stats, recomputed after EVERY commit — avgdl must always
    reflect all committed LIVE segments (IndexSearcher.java:1134-1149;
    SURVEY.md §7 known-hard #3). ``live_ids`` excludes merged-away
    segments (None = everything is live, the pure-append case).
    ``postings_df``/``doclens_df`` short-circuit the parquet re-read
    when the caller already holds the full live row set in memory
    (fresh single-batch builds)."""
    postings = (
        postings_df
        if postings_df is not None
        else spark.read.parquet(f"{index_dir}/postings")
    )
    doclens = (
        doclens_df
        if doclens_df is not None
        else spark.read.parquet(f"{index_dir}/doclens")
    )
    if live_ids is not None:
        sel = F.col("segment_id").isin(sorted(live_ids))
        postings = postings.filter(sel)
        doclens = doclens.filter(sel)
    (
        postings.groupBy("field", "term")
        .agg(
            F.sum("doc_freq").alias("doc_freq"),
            F.sum("total_term_freq").alias("total_term_freq"),
        )
        .write.mode("overwrite")
        .parquet(f"{index_dir}/term_stats")
    )
    if "field" in doclens.columns:
        per_field = doclens.groupBy("field")
    else:  # pre-multi-field layout: one implicit field
        per_field = doclens.withColumn("field", F.lit(fieldname)).groupBy("field")
    (
        per_field.agg(
            F.count("*").alias("doc_count"),
            F.max("doc_id").alias("max_doc_id"),
            F.sum("doc_len").alias("sum_total_term_freq"),
        )
        .write.mode("overwrite")
        .parquet(f"{index_dir}/field_stats")
    )
