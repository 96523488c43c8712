"""Index inspection — the `luke` module + misc/HighFreqTerms analog.

Reference roles:

- luke (lucene/luke, the index-browser app): Overview tab (doc counts,
  deletions, field list, per-field term counts, top terms), Segments
  tab (per-segment doc counts / live docs / lineage), Documents tab
  (browse one doc's indexed terms — covered by search/termvectors.py).
- HighFreqTerms (misc/src/java/org/apache/lucene/misc/
  HighFreqTerms.java): "Extracts the top n most frequent terms by
  document frequency" with the -t flag switching to totalTermFreq
  order.
- TermStats (misc/.../TermStats.java): the (field, term, docFreq,
  totalTermFreq) record the tool prints.

Spark mapping: every report is a declarative aggregation over the
committed catalog tables (term_stats / doclens / manifest), so Catalyst
prunes columns down to what each report touches and the only data that
ever reaches the driver is the report itself (top-k rows / a handful of
aggregate scalars). Nothing here scans postings blobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_spark.index import manifest as mani


def _all_segments(manifest: dict) -> list[dict]:
    """Every segment entry the manifest records: batch outputs + merge
    outputs (the SegmentInfos list; liveness is a separate filter)."""
    out = [
        s for b in manifest.get("batches", []) for s in b.get("segments", [])
    ]
    for m in manifest.get("merges") or []:
        out.extend(m.get("segments", []))
    return out


def high_freq_terms(
    reader, field: str | None = None, k: int = 100, by_total_term_freq: bool = False
) -> DataFrame:
    """Top-k terms by docFreq (HighFreqTerms.java default) or by
    totalTermFreq (-t flag). ``field=None`` ranks across all fields
    (HighFreqTerms with no field arg iterates every field).

    -> (field, term, doc_freq, total_term_freq) — the TermStats record.
    One partial-agg-free scan of the term dictionary; top-k is
    TakeOrdered (never a global sort)."""
    ts = reader.term_stats_df()
    if field is not None:
        ts = ts.filter(F.col("field") == field)
    key = "total_term_freq" if by_total_term_freq else "doc_freq"
    return (
        ts.select("field", "term", "doc_freq", "total_term_freq")
        .orderBy(F.col(key).desc(), F.col("term").asc())
        .limit(k)
    )


def field_report(reader) -> DataFrame:
    """Per-field overview row (luke Overview tab's field table):
    distinct terms, postings (sum docFreq), tokens (sum totalTermFreq),
    and the top term by docFreq. One shuffle (groupBy field)."""
    ts = reader.term_stats_df()
    ranked = ts.withColumn(
        "_rk",
        F.row_number().over(
            Window.partitionBy("field").orderBy(
                F.col("doc_freq").desc(), F.col("term").asc()
            )
        ),
    )
    agg = ts.groupBy("field").agg(
        F.count("*").alias("distinct_terms"),
        F.sum("doc_freq").alias("sum_doc_freq"),
        F.sum("total_term_freq").alias("sum_total_term_freq"),
    )
    top = ranked.filter(F.col("_rk") == 1).select(
        "field", F.col("term").alias("top_term"), F.col("doc_freq").alias("top_term_doc_freq")
    )
    return agg.join(top, "field", "left").orderBy("field")


def segment_report(reader) -> DataFrame:
    """Per-segment rows (luke Segments tab): doc counts from the
    manifest lineage plus live-doc counts after tombstones. The
    manifest is driver-resident already; only the tombstone count is a
    Spark agg."""
    spark = reader.spark
    segs = _all_segments(reader.manifest)
    live = mani.live_segment_ids(reader.manifest)
    rows = [
        (
            s["segment_id"],
            int(s.get("first_doc_id", 0)),
            int(s.get("num_docs", 0)),
            bool(live is None or s["segment_id"] in live),
        )
        for s in segs
    ]
    base = spark.createDataFrame(
        rows, "segment_id string, first_doc_id long, num_docs long, live boolean"
    )
    dels = reader.deleted_by_segment_df()
    if dels is None:
        return base.withColumn("deleted_docs", F.lit(0).cast("long")).orderBy(
            "first_doc_id"
        )
    dcounts = dels.groupBy("segment_id").agg(
        F.count("*").alias("deleted_docs")
    )
    return (
        base.join(dcounts, "segment_id", "left")
        .na.fill({"deleted_docs": 0})
        .orderBy("first_doc_id")
    )


def doc_len_histogram(reader, field: str, num_bins: int = 16) -> DataFrame:
    """Histogram of field lengths (the norms distribution luke plots).
    Buckets are equal-width over [min, max]; one scan + one tiny
    groupBy on the bucket id."""
    dl = reader.doclens().filter(F.col("field") == field).select("doc_len")
    lo, hi = dl.agg(F.min("doc_len"), F.max("doc_len")).first()
    if lo is None:
        return reader.spark.createDataFrame(
            [], "bucket int, lo long, hi long, num_docs long"
        )
    width = max(1, (int(hi) - int(lo) + num_bins) // num_bins)
    return (
        dl.withColumn(
            "bucket",
            F.least(
                F.floor((F.col("doc_len") - F.lit(int(lo))) / F.lit(width)),
                F.lit(num_bins - 1),
            ).cast("int"),
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("num_docs"))
        .withColumn("lo", (F.lit(int(lo)) + F.col("bucket") * F.lit(width)).cast("long"))
        .withColumn("hi", (F.col("lo") + F.lit(width - 1)).cast("long"))
        .select("bucket", "lo", "hi", "num_docs")
        .orderBy("bucket")
    )


def overview(reader) -> dict:
    """The luke Overview tab as one dict: generation, segment/doc/
    deletion counts, field names, index options recorded in the
    manifest. Aggregate scalars only — safe on any index size."""
    m = reader.manifest
    live = mani.live_segment_ids(m)
    live_segs = [
        s
        for s in _all_segments(m)
        if live is None or s["segment_id"] in live
    ]
    dels = reader.deleted_df()
    n_deleted = int(dels.count()) if dels is not None else 0
    fields = sorted(reader._field_stats)
    return {
        "generation": int(m.get("generation", 0)),
        "num_segments": len(live_segs),
        "num_docs": int(sum(s.get("num_docs", 0) for s in live_segs)),
        "num_deleted_docs": n_deleted,
        "fields": fields,
        "postings_format": m.get("postings_format", "for104"),
        "analyzer": m.get("analyzer"),
        "k1": m.get("k1"),
        "b": m.get("b"),
        "sort_by": m.get("sort_by"),
    }


def term_info(reader, field: str, term: str) -> dict:
    """GetTermInfo (misc/GetTermInfo.java + TermStats): docFreq and
    totalTermFreq of one (field, term) straight from the term
    dictionary — one tiny filtered aggregate, no postings decoded."""
    from pyspark.sql import functions as F

    row = (
        reader.term_stats_df()
        .filter((F.col("field") == field) & (F.col("term") == term))
        .agg(
            F.coalesce(F.sum("doc_freq"), F.lit(0)).alias("df"),
            F.coalesce(F.sum("total_term_freq"), F.lit(0)).alias("ttf"),
        )
        .head()
    )
    return {
        "field": field,
        "term": term,
        "doc_freq": int(row["df"]),
        "total_term_freq": int(row["ttf"]),
    }
