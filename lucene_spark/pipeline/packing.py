"""Sequence packing — concat-and-chunk documents into fixed-length
training sequences.

Not a reference-engine surface — part of the LLM-data-pipeline
operator set. The standard GPT-style packing: documents are
concatenated in a deterministic global order (doc_id) and the token
stream is cut into sequences of exactly ``seq_len`` tokens; each
document lands at a (sequence id, offset) and may straddle sequence
boundaries (``n_splits`` counts the extra sequences it spills into).
Token counts come from the same SimpleAnalyzer tokenization the whole
correctness gate uses (textstats.tokens_col), so the layout is exactly
reproducible by the DuckDB oracle.

The core is a GLOBAL prefix sum over doc_id order. A naive
``Window.orderBy("doc_id")`` funnels 100 TB through one partition, so
this runs the classic two-level distributed prefix sum instead:

1. in-bucket cumulative sums, partitioned by ``doc_id // bucket``
   (parallel window, each bucket independent);
2. per-bucket totals -> one tiny O(#buckets) cumulative sum (the only
   serial step, thousands of rows regardless of corpus size) ->
   broadcast-joined back as bucket offsets.

Everything stays JVM-side; one narrow shuffle for the bucket window,
one broadcast join. The oracle uses the naive single window — same
math, oracle-scale input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["pack_sequences", "pack_sequences_sql"]


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    text_col: str = "text",
    bucket: int = 4096,
    k: int | None = 300,
) -> DataFrame:
    """-> (doc_id, n_tokens, seq_id, offset, n_splits): the packed
    layout of each document in the concatenated token stream."""
    from lucene_spark.pipeline.textstats import tokens_col

    base = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.size(tokens_col(F.col(text_col))).cast("long").alias("n_tokens"),
    ).withColumn("bkt", F.floor(F.col("doc_id") / bucket))
    win_in = (
        Window.partitionBy("bkt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_in = F.coalesce(F.sum("n_tokens").over(win_in), F.lit(0))
    totals = base.groupBy("bkt").agg(F.sum("n_tokens").alias("tot"))
    # O(#buckets) rows: the single-partition window is the serial step
    # of the prefix sum and stays tiny at any corpus size
    win_b = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = totals.select(
        "bkt", F.coalesce(F.sum("tot").over(win_b), F.lit(0)).alias("boff")
    )
    cum_before = F.col("boff") + F.col("cin")
    out = (
        base.withColumn("cin", cum_in)
        .join(F.broadcast(offs), "bkt")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(cum_before / seq_len).cast("long").alias("seq_id"),
            (cum_before % seq_len).cast("long").alias("offset"),
            (
                F.floor(
                    (cum_before + F.greatest(F.col("n_tokens"), F.lit(1)) - 1)
                    / seq_len
                )
                - F.floor(cum_before / seq_len)
            ).cast("long").alias("n_splits"),
        )
        .orderBy("doc_id")
    )
    return out.limit(k) if k is not None else out


def pack_sequences_sql(
    seq_len: int, k: int | None = 300, table: str = "documents"
) -> str:
    """DuckDB twin: the same layout via one naive window cumsum."""
    from lucene_spark.pipeline.textstats import _TOKS_SQL

    lim = f" LIMIT {k}" if k is not None else ""
    return f"""WITH {_TOKS_SQL},
n AS (
  SELECT d.doc_id, CAST(coalesce(a.n, 0) AS BIGINT) AS n_tokens
  FROM {table} d LEFT JOIN (
    SELECT doc_id, count(*) AS n FROM toks GROUP BY doc_id
  ) a ON d.doc_id = a.doc_id
),
c AS (
  SELECT doc_id, n_tokens,
    coalesce(SUM(n_tokens) OVER (ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
  FROM n
)
SELECT doc_id, n_tokens,
  CAST(cb // {seq_len} AS BIGINT) AS seq_id,
  CAST(cb % {seq_len} AS BIGINT) AS offset,
  CAST((cb + greatest(n_tokens, 1) - 1) // {seq_len}
       - cb // {seq_len} AS BIGINT) AS n_splits
FROM c ORDER BY doc_id{lim}"""
