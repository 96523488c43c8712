"""Grouping-module completion (SURVEY.md §2.6) — the collectors of
``lucene/grouping`` not yet covered by ``sqlpath.grouped_topk`` /
``grouped_distinct_values`` / ``group_facet_counts``:

- AllGroupsCollector (grouping/AllGroupsCollector.java): the distinct
  set of group values among matching docs.
- AllGroupHeadsCollector (grouping/AllGroupHeadsCollector.java): the
  single most-relevant doc of every group.
- LongRangeGroupSelector / LongRangeFactory
  (grouping/LongRangeGroupSelector.java, LongRangeFactory.java): group
  key = the [lo, hi) bucket a numeric docvalue falls in, with
  single catch-all buckets below ``min`` and at/above ``max``.
- ValueSourceGroupSelector (grouping/ValueSourceGroupSelector.java):
  group key = a compiled expression over the docs registry.
- BlockGroupingCollector (grouping/BlockGroupingCollector.java):
  groups are index-time doc blocks; top groups ranked by their best
  doc, top docs within each group.
- GroupingSearch facade (grouping/GroupingSearch.java): one
  configurable entry point over all of the above.

Spark-first design: every collector is ONE window over the scored-docs
DataFrame, partitioned by the group key — a single shuffle keyed by
group, rank computed per partition, no global sort until the final
top-k cut. TopGroups.merge / SearchGroup.merge (shard-merge plumbing)
are subsumed by that shuffle: Spark's exchange IS the merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from lucene_spark.search.executor import IndexReader
from lucene_spark.search.sqlpath import term_scored

LONG_MIN = -(2**63)
LONG_MAX = 2**63 - 1

_W_SCORE = lambda key: Window.partitionBy(key).orderBy(  # noqa: E731
    F.col("score_x1e6").desc(), F.col("doc_id").asc()
)


def _scored_with_docs(
    reader: IndexReader, field: str, term: str, cols: list[str]
) -> DataFrame:
    docs = reader.docs().select("doc_id", *cols)
    return term_scored(reader, field, term).join(docs, "doc_id")


def all_groups(
    reader: IndexReader, field: str, term: str, group_col: str
) -> DataFrame:
    """AllGroupsCollector.java:30 (getGroupCount/getGroups): every
    distinct group value among the query's matches. One shuffle
    (partial-combined distinct). -> (grp) sorted."""
    j = _scored_with_docs(reader, field, term, [group_col])
    return (
        j.select(F.col(group_col).cast("string").alias("grp"))
        .distinct()
        .orderBy("grp")
    )


def all_group_heads(
    reader: IndexReader, field: str, term: str, group_col: str
) -> DataFrame:
    """AllGroupHeadsCollector.java:37 (retrieveGroupHeads): the single
    most-relevant doc per group (score DESC, doc_id ASC tiebreak —
    the collector's doc-id-order replacement rule). One window over
    one group-keyed shuffle. -> (grp, doc_id, score_x1e6)."""
    j = _scored_with_docs(reader, field, term, [group_col])
    j = j.withColumn("grp", F.col(group_col).cast("string"))
    return (
        j.withColumn("rn", F.row_number().over(_W_SCORE("grp")))
        .filter(F.col("rn") == 1)
        .select("grp", "doc_id", "score_x1e6")
        .orderBy("grp")
    )


def range_group_key(value, lo: int, width: int, hi: int):
    """LongRangeFactory.getRange(LongRangeFactory.java:47-66) as two
    Columns: values below ``lo`` collapse to [LONG_MIN, lo); values at
    or above ``hi`` to [hi, LONG_MAX); in between, [lo + b*width,
    lo + (b+1)*width) with b = (value - lo) / width (floor)."""
    v = value.cast("long")
    bucket_lo = F.lit(lo) + F.floor((v - F.lit(lo)) / F.lit(width)).cast(
        "long"
    ) * F.lit(width)
    grp_lo = (
        F.when(v < lo, F.lit(LONG_MIN))
        .when(v >= hi, F.lit(hi))
        .otherwise(bucket_lo)
        .cast("long")
    )
    grp_hi = (
        F.when(v < lo, F.lit(lo))
        .when(v >= hi, F.lit(LONG_MAX))
        .otherwise(bucket_lo + F.lit(width))
        .cast("long")
    )
    return grp_lo, grp_hi


def range_grouped_topk(
    reader: IndexReader,
    field: str,
    term: str,
    value_col: str,
    lo: int,
    width: int,
    hi: int,
    per_group: int = 2,
) -> DataFrame:
    """LongRangeGroupSelector.java:33 (advanceTo -> currentValue):
    two-pass grouping where the group key is the numeric range bucket
    of a docvalue. DoubleRangeGroupSelector is the same selector over
    a double column (pass the column pre-cast). One group-keyed
    shuffle + per-partition rank. -> (grp_lo, grp_hi, doc_id,
    score_x1e6, rn)."""
    j = _scored_with_docs(reader, field, term, [value_col])
    glo, ghi = range_group_key(F.col(value_col), lo, width, hi)
    j = j.withColumn("grp_lo", glo).withColumn("grp_hi", ghi)
    return (
        j.withColumn("rn", F.row_number().over(_W_SCORE(["grp_lo"])))
        .filter(F.col("rn") <= per_group)
        .select("grp_lo", "grp_hi", "doc_id", "score_x1e6", "rn")
        .orderBy("grp_lo", "rn")
    )


def value_source_grouped_topk(
    reader: IndexReader,
    field: str,
    term: str,
    source: str,
    per_group: int = 2,
) -> DataFrame:
    """ValueSourceGroupSelector.java:30: group key = a value source
    evaluated per doc — compiled here from the expressions module's
    JS grammar into ONE Catalyst Column (whole-stage codegen; free
    variables bind to docs-registry columns). Integer-valued sources
    keep the key engine-independent. -> (grp, doc_id, score_x1e6,
    rn)."""
    from lucene_spark.search.expressions import compile_expression

    doc_cols = [c for c in reader.docs().columns if c != "doc_id"]
    j = _scored_with_docs(reader, field, term, doc_cols)
    key = compile_expression(source).column()
    j = j.withColumn("grp", key.cast("long"))
    return (
        j.withColumn("rn", F.row_number().over(_W_SCORE("grp")))
        .filter(F.col("rn") <= per_group)
        .select("grp", "doc_id", "score_x1e6", "rn")
        .orderBy("grp", "rn")
    )


def block_grouped_topk(
    child_df: DataFrame,
    child_filter,
    score_col,
    block_key: str,
    child_id: str,
    group_limit: int = 5,
    per_block: int = 2,
    score_scale: int = 100,
) -> DataFrame:
    """BlockGroupingCollector.java:46 (getTopGroups): grouping over
    index-time doc blocks — the block IS the group, no group-key
    docvalue needed. Top ``group_limit`` blocks ranked by their best
    child's score (relevance group-sort), then the top ``per_block``
    children within each. Same block model as the join module
    (joins.to_parent_block_join): children carry their parent key.

    Two windows over ONE block-keyed shuffle (the group rank reuses
    the intra-block partitioning via max-over-partition, so no second
    exchange until the final group_limit cut). -> (grp_rank, blk, id,
    score_x1e6, rn)."""
    ch = child_df.filter(child_filter).select(
        F.col(block_key).cast("long").alias("blk"),
        F.col(child_id).cast("long").alias("id"),
        F.round(score_col * F.lit(score_scale)).cast("long").alias(
            "score_x1e6"
        ),
    )
    w_in = Window.partitionBy("blk").orderBy(
        F.col("score_x1e6").desc(), F.col("id").asc()
    )
    ch = ch.withColumn("rn", F.row_number().over(w_in)).filter(
        F.col("rn") <= per_block
    )
    # rn==1 rows ARE the block heads; the global top-N-groups cut is a
    # TakeOrderedAndProject (distributed partial top-k per partition),
    # and only the surviving <=group_limit rows see a window
    w_grp = Window.orderBy(F.col("head").desc(), F.col("blk").asc())
    top_blocks = (
        ch.filter(F.col("rn") == 1)
        .select("blk", F.col("score_x1e6").alias("head"))
        .orderBy(F.col("head").desc(), F.col("blk").asc())
        .limit(group_limit)
        .withColumn("grp_rank", F.row_number().over(w_grp))
        .select("blk", "grp_rank")
    )
    return (
        ch.join(F.broadcast(top_blocks), "blk")
        .select("grp_rank", "blk", "id", "score_x1e6", "rn")
        .orderBy("grp_rank", "rn")
    )


class GroupingSearch:
    """GroupingSearch.java:42 facade: configure a group selector (term
    field, numeric range, or value source), then ``search`` runs the
    two-pass collectors and ``all_matching_groups`` /
    ``all_group_heads`` expose the auxiliary collectors — the same
    surface the reference exposes through setAllGroups /
    setAllGroupHeads / setGroupDocsLimit."""

    def __init__(
        self,
        group_field: str | None = None,
        range_spec: tuple[str, int, int, int] | None = None,
        value_source: str | None = None,
    ):
        if sum(x is not None for x in (group_field, range_spec, value_source)) != 1:
            raise ValueError(
                "exactly one of group_field / range_spec / value_source"
            )
        self.group_field = group_field
        self.range_spec = range_spec
        self.value_source = value_source
        self.group_docs_limit = 1  # setGroupDocsLimit default

    def set_group_docs_limit(self, n: int) -> "GroupingSearch":
        self.group_docs_limit = n
        return self

    def search(self, reader: IndexReader, field: str, term: str) -> DataFrame:
        if self.group_field is not None:
            from lucene_spark.search.sqlpath import grouped_topk

            return grouped_topk(
                reader, field, term, self.group_field,
                per_group=self.group_docs_limit, k=1 << 30,
            )
        if self.range_spec is not None:
            col, lo, width, hi = self.range_spec
            return range_grouped_topk(
                reader, field, term, col, lo, width, hi,
                per_group=self.group_docs_limit,
            )
        return value_source_grouped_topk(
            reader, field, term, self.value_source,
            per_group=self.group_docs_limit,
        )

    def all_matching_groups(
        self, reader: IndexReader, field: str, term: str
    ) -> DataFrame:
        if self.group_field is None:
            raise ValueError("allGroups needs a term group selector")
        return all_groups(reader, field, term, self.group_field)

    def all_group_heads(
        self, reader: IndexReader, field: str, term: str
    ) -> DataFrame:
        if self.group_field is None:
            raise ValueError("allGroupHeads needs a term group selector")
        return all_group_heads(reader, field, term, self.group_field)
