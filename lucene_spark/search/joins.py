"""Lucene join-module analogs (SURVEY.md §2.5) as first-class Spark
joins.

Lucene has three specialized join forms; the two queryable ones are
rebuilt here over arbitrary parent/child DataFrames:

- ``to_parent_block_join`` — ToParentBlockJoinQuery
  (join/.../ToParentBlockJoinQuery.java): children matching a child
  query are aggregated to their parent with ScoreMode max/avg/total/min
  (join/.../ScoreMode.java). Lucene gets the parent mapping from doc
  adjacency inside a block; relationally it is just the foreign key, so
  the operator is a join + groupBy — one shuffle keyed by parent id,
  map-side combined.

- ``join_util_semi`` — JoinUtil.createJoinQuery
  (join/.../JoinUtil.java): semi-join — docs in the "to" table whose
  join field appears among the "from" docs matching fromQuery. Spark's
  left_semi join is the exact physical form (with the from-side usually
  broadcast-sized after its filter).

Taxonomy-style dimension joins (facet/taxonomy/TaxonomyReader.java) are
plain broadcast dim joins and are exercised by the facet operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SCORE_MODES = {
    "max": F.max,
    "min": F.min,
    "total": F.sum,
    "avg": F.avg,
}


def to_parent_block_join(
    children: DataFrame,
    child_filter: Column,
    child_score: Column,
    parent_key: str,
    score_mode: str = "max",
    k: int = 10,
) -> DataFrame:
    """Parents of children matching `child_filter`, scored by
    aggregating `child_score` per ScoreMode. -> (parent_id,
    score_x1e6, n_children), (score DESC, parent_id ASC) top-k."""
    agg_fn = _SCORE_MODES[score_mode]
    matched = children.filter(child_filter).select(
        F.col(parent_key).alias("parent_id"), child_score.cast("double").alias("s")
    )
    agg = matched.groupBy("parent_id").agg(
        agg_fn(F.col("s")).alias("score"), F.count("*").alias("n_children")
    )
    return (
        agg.select(
            "parent_id",
            F.round(F.col("score") * 1e6).cast("long").alias("score_x1e6"),
            "n_children",
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("parent_id").asc())
        .limit(k)
    )


def join_util_semi(
    from_df: DataFrame,
    from_filter: Column,
    from_field: str,
    to_df: DataFrame,
    to_field: str,
    select_cols: list[str],
    order_col: str,
    k: int = 10,
) -> DataFrame:
    """JoinUtil semi-join: rows of `to_df` whose `to_field` appears in
    `from_df` rows matching `from_filter`. The from-side keys are
    deduplicated before the semi-join (GlobalOrdinalsQuery's one-pass
    term set), and broadcast when small."""
    keys = (
        from_df.filter(from_filter)
        .select(F.col(from_field).alias(to_field))
        .distinct()
    )
    out = to_df.join(F.broadcast(keys), to_field, "left_semi")
    return out.select(*select_cols).orderBy(F.col(order_col).asc()).limit(k)
