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

- ``to_child_block_join`` — ToChildBlockJoinQuery
  (join/.../ToChildBlockJoinQuery.java): the inverse — children of
  parents matching a parent query, each child scored with its parent's
  score (the reference's ChildrenMatchesScorer hands the parent score
  to every child in the block). Relationally: filter parents, then an
  equi-join children->parents on the foreign key, parent side broadcast
  when small.

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


def to_child_block_join(
    parents: DataFrame,
    parent_filter: Column,
    parent_score: Column,
    parent_key: str,
    children: DataFrame,
    child_key: str,
    child_tiebreak: str,
    k: int = 10,
) -> DataFrame:
    """Children of parents matching `parent_filter`, each carrying the
    parent's score. -> (id1=child's parent key, id2=tiebreak column,
    score_x1e6), (score DESC, id1 ASC, id2 ASC) top-k."""
    matched = parents.filter(parent_filter).select(
        F.col(parent_key).alias("_pk"),
        parent_score.cast("double").alias("_ps"),
    )
    out = children.join(
        F.broadcast(matched), children[child_key] == F.col("_pk"), "inner"
    )
    return (
        out.select(
            F.col(child_key).alias("id1"),
            F.col(child_tiebreak).alias("id2"),
            F.round(F.col("_ps") * 1e6).cast("long").alias("score_x1e6"),
        )
        .orderBy(
            F.col("score_x1e6").desc(), F.col("id1").asc(), F.col("id2").asc()
        )
        .limit(k)
    )


def check_join_index(
    parents: DataFrame,
    children: DataFrame,
    parent_key: str,
    child_parent_key: str,
) -> None:
    """CheckJoinIndex.check (join/CheckJoinIndex.java:37-80) mapped to
    the relational block contract. Lucene's invariants — every segment
    block ends with a parent, live bits agree across a block — become:
    every child row references an existing parent key (an orphaned
    child is exactly a block whose parent doc is missing/deleted).
    One LEFT-ANTI join (the distinct parent-key side broadcasts);
    raises like the reference's IllegalStateException on violation."""
    keys = parents.select(
        F.col(parent_key).alias(child_parent_key)
    ).distinct()
    orphan = (
        children.join(F.broadcast(keys), child_parent_key, "left_anti")
        .select(child_parent_key)
        .first()
    )
    if orphan is not None:
        raise ValueError(
            f"orphaned child rows: {child_parent_key}="
            f"{orphan[child_parent_key]!r} has no parent "
            f"(CheckJoinIndex contract)"
        )


def block_join_sort_topk(
    parents: DataFrame,
    parent_key: str,
    children: DataFrame,
    child_filter: Column,
    child_val: Column,
    child_parent_key: str,
    selector: str = "min",
    ascending: bool = True,
    k: int = 10,
    missing_val: float = -1.0,
) -> DataFrame:
    """ToParentBlockJoinSortField (join/.../ToParentBlockJoinSortField.java
    + BlockJoinSelector.java wrap): PARENT hits ordered by ONE value
    selected — min or max — from their matching children's sort values.
    Parents whose children all fail `child_filter` still rank, carrying
    `missing_val` (the comparator's missingValue slot; the reference
    defaults it to the type's MIN/MAX sentinel so missing parents sink
    to one end). -> (parent_id, n_children, sel_x1e6) top-k by
    (sel asc/desc, parent_id asc).

    100-TB shape: the child side is one filter + map-side-combined
    groupBy on the parent key (one shuffle), LEFT-joined back to the
    parents (broadcastable once aggregated), then
    TakeOrderedAndProject — never a per-parent scan of child blocks."""
    if selector not in ("min", "max"):
        raise ValueError(f"unknown selector {selector!r}")
    agg_fn = _SCORE_MODES[selector]
    cagg = (
        children.filter(child_filter)
        .select(
            F.col(child_parent_key).alias("parent_id"),
            child_val.cast("double").alias("_v"),
        )
        .groupBy("parent_id")
        .agg(agg_fn("_v").alias("_sel"), F.count("*").alias("n_children"))
    )
    out = (
        parents.select(F.col(parent_key).alias("parent_id"))
        .join(cagg, "parent_id", "left")
        .select(
            "parent_id",
            F.coalesce("n_children", F.lit(0)).cast("long").alias("n_children"),
            F.round(F.coalesce("_sel", F.lit(float(missing_val))) * 1e6)
            .cast("long").alias("sel_x1e6"),
        )
    )
    order = F.col("sel_x1e6").asc() if ascending else F.col("sel_x1e6").desc()
    return out.orderBy(order, F.col("parent_id").asc()).limit(k)


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


def parent_children_block_join(
    children: DataFrame,
    parent_id,
    parent_key: str,
    child_filter: Column,
    child_score: Column,
    child_tiebreak: str,
    k: int = 10,
) -> DataFrame:
    """ParentChildrenBlockJoinQuery (join/.../
    ParentChildrenBlockJoinQuery.java): "return the matching children
    of ONE parent" — the detail query an application runs after a
    ToParentBlockJoin hit to show which children produced it, with
    their own child-query scores.

    Relationally: an equi-filter on the parent key (pushed to the scan
    — a single-parent partition prune at scale) + the child filter,
    scored by the child query. -> (id2=tiebreak, score_x1e6),
    (score DESC, id2 ASC) top-k."""
    out = children.filter(
        (F.col(parent_key) == F.lit(parent_id)) & child_filter
    )
    return (
        out.select(
            F.col(child_tiebreak).alias("id2"),
            F.round(child_score.cast("double") * 1e6).cast("long").alias(
                "score_x1e6"
            ),
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("id2").asc())
        .limit(k)
    )


def join_util_score(
    from_df: DataFrame,
    from_filter: Column,
    from_field: str,
    from_score: Column,
    to_df: DataFrame,
    to_field: str,
    score_mode: str = "max",
    k: int = 10,
) -> DataFrame:
    """JoinUtil.createJoinQuery with a scoring ScoreMode
    (join/.../JoinUtil.java -> GlobalOrdinalsWithScoreQuery): from-side
    docs matching `from_filter` contribute `from_score`, aggregated per
    join value by `score_mode` (max/min/total/avg — join/ScoreMode.java),
    and every to-side doc carries its join value's aggregate.

    Relationally: ONE map-side-combined groupBy of the filtered from
    side (the ordinal->score map the reference builds per segment),
    broadcast to the to side. -> (id1=to_field, score_x1e6),
    (score DESC, id1 ASC) top-k."""
    agg_fn = _SCORE_MODES[score_mode]
    keyed = (
        from_df.filter(from_filter)
        .select(
            F.col(from_field).alias(to_field),
            from_score.cast("double").alias("_s"),
        )
        .groupBy(to_field)
        .agg(agg_fn(F.col("_s")).alias("_score"))
    )
    out = to_df.join(F.broadcast(keyed), to_field, "inner")
    return (
        out.select(
            F.col(to_field).alias("id1"),
            F.round(F.col("_score") * 1e6).cast("long").alias("score_x1e6"),
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("id1").asc())
        .limit(k)
    )
