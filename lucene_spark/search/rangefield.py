"""RangeField family — documents that store d-dimensional *ranges*
and queries that RELATE a literal query range to them.

Reference: ``core/document/IntRange.java`` / ``LongRange.java`` /
``FloatRange.java`` / ``DoubleRange.java`` (factories) and
``core/document/RangeFieldQuery.java`` (the shared query machinery —
``QueryType`` INTERSECTS / WITHIN / CONTAINS / CROSSES). Per-dim
``matches`` semantics, stored range [s_min, s_max] vs query range
[q_min, q_max] (RangeFieldQuery.java:75-270):

- INTERSECTS: q_max >= s_min AND q_min <= s_max
- WITHIN:     q_min <= s_min AND q_max >= s_max  (stored inside query)
- CONTAINS:   s_min <= q_min AND s_max >= q_max  (stored covers query)
- CROSSES:    INTERSECTS AND NOT WITHIN (RangeFieldQuery.java:266)

A doc matches iff every dimension matches; a doc with a NULL bound in
any queried dimension never matches (the no-field contract — SQL
three-valued logic gives this for free in BOTH engines, because every
relation is a conjunction of non-negated comparisons on the stored
bounds, and CROSSES' negation wraps a conjunction that is itself NULL
when a bound is NULL).

The reference indexes a d-dim range as a 2d-dimensional point in its
BKD tree (min coords then max coords) and descends cells with the
relation-specific ``compare``. The Spark mapping reuses the Z-order
points sink (index/points.bkd_write) over the flattened
``[min_0, max_0, min_1, max_1, ...]`` columns, and the file-manifest
prune applies the SAME per-cell outside tests as ``compare``:

- INTERSECTS: outside iff q_max < lo(s_min) or q_min > hi(s_max)
- WITHIN:     outside iff q_max < lo(s_max) or q_min > hi(s_min)
- CONTAINS:   outside iff q_max > hi(s_max) or q_min < lo(s_min)
- CROSSES:    outside iff INTERSECTS-outside, or the cell is entirely
  WITHIN the query (every stored range inside => nothing crosses,
  RangeFieldQuery.java:247-249)

100-TB shape: the relation predicate is a flat AND of column-vs-literal
comparisons — whole-stage codegen'd and pushed into the Parquet scan
(row-group stats prune the leaf level), with the manifest pruning whole
files before the plan exists. No Python in the match path.


Covers-also note: the doc-values range family
(core/document/IntRangeDocValuesField.java ..
DoubleRangeDocValuesField.java, BinaryRangeDocValuesField.java +
the *SlowRangeQuery classes) verifies the same four relations per
document over stored range bounds — which is precisely how
range_relation_expr executes here (a codegen predicate over the
stored min/max columns); InetAddressRange gets the same treatment in
ippoint.ip_range_relation.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

__all__ = [
    "RANGE_RELATIONS",
    "range_relation_expr",
    "range_query_topk",
    "write_range_index",
    "range_index_query_topk",
    "range_query_sql",
    "range_on_range_facet_counts",
    "range_on_range_facet_sql",
]

RANGE_RELATIONS = ("intersects", "within", "contains", "crosses")


def _dim_pred(relation: str, smin: Column, smax: Column,
              qmin: float, qmax: float) -> Column:
    qlo, qhi = F.lit(qmin), F.lit(qmax)
    if relation == "intersects":
        return (qhi >= smin) & (qlo <= smax)
    if relation == "within":
        return (qlo <= smin) & (qhi >= smax)
    if relation == "contains":
        return (smin <= qlo) & (smax >= qhi)
    raise ValueError(f"unknown relation {relation!r}")


def range_relation_expr(
    dims: list[tuple[str, str]],
    query: list[tuple[float, float]],
    relation: str,
) -> Column:
    """Boolean Column: does the stored range (columns ``dims`` =
    [(min_col, max_col), ...]) relate to the literal ``query`` ranges
    under ``relation``? Pure comparisons — stays in codegen."""
    if relation not in RANGE_RELATIONS:
        raise ValueError(f"unknown relation {relation!r}")
    if len(dims) != len(query):
        raise ValueError("dims/query arity mismatch")

    def conj(rel: str) -> Column:
        p = None
        for (mn, mx), (qlo, qhi) in zip(dims, query):
            t = _dim_pred(rel, F.col(mn), F.col(mx), qlo, qhi)
            p = t if p is None else p & t
        return p

    if relation == "crosses":
        return conj("intersects") & ~conj("within")
    return conj(relation)


def range_query_topk(
    df: DataFrame,
    dims: list[tuple[str, str]],
    query: list[tuple[float, float]],
    relation: str,
    id_col: str,
    k: int = 20,
) -> DataFrame:
    """Constant-score relation query over an un-indexed DataFrame —
    the ``*SlowRangeQuery`` role (document/IntRangeSlowRangeQuery.java
    et al., the DocValues fallback). -> (doc_id, score_x1e6)."""
    return (
        df.filter(range_relation_expr(dims, query, relation))
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.lit(1_000_000).cast("long").alias("score_x1e6"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def write_range_index(
    df: DataFrame,
    dims: list[tuple[str, str]],
    path: str,
    num_files: int = 32,
) -> dict:
    """Index stored ranges as 2d-dim points (min coords + max coords
    interleaved per dimension), the reference's packing
    (RangeFieldQuery.java minOffset/maxOffset halves), through the
    Z-order points sink. Bits-per-dim shrinks so the Morton code stays
    inside a signed BIGINT at any arity the reference supports (<= 4
    range dims = 8 point dims)."""
    from lucene_spark.index.points import bkd_write

    cols = [c for mn_mx in dims for c in mn_mx]
    bits = min(16, 63 // len(cols))
    return bkd_write(df, cols, path, num_files=num_files, bits=bits)


def _file_survives(relation: str, row, dims, query) -> bool:
    """The per-cell visit test of RangeFieldQuery.QueryType.compare,
    over a manifest row's per-column bounds: True unless the cell is
    provably CELL_OUTSIDE_QUERY."""

    def outside(rel: str) -> bool:
        for (mn, mx), (qlo, qhi) in zip(dims, query):
            if rel == "intersects":
                if qhi < row[f"lo_{mn}"] or qlo > row[f"hi_{mx}"]:
                    return True
            elif rel == "within":
                if qhi < row[f"lo_{mx}"] or qlo > row[f"hi_{mn}"]:
                    return True
            elif rel == "contains":
                if qhi > row[f"hi_{mx}"] or qlo < row[f"lo_{mn}"]:
                    return True
        return False

    def within_inside() -> bool:
        # cell entirely inside the WITHIN relation: every stored range
        # in the file sits inside the query box in every dim
        return all(
            qlo <= row[f"lo_{mn}"] and qhi >= row[f"hi_{mx}"]
            for (mn, mx), (qlo, qhi) in zip(dims, query)
        )

    if relation == "crosses":
        return not outside("intersects") and not within_inside()
    return not outside(relation)


def range_index_query_topk(
    spark: SparkSession,
    path: str,
    dims: list[tuple[str, str]],
    query: list[tuple[float, float]],
    relation: str,
    id_col: str,
    k: int = 20,
    stats: dict | None = None,
) -> DataFrame:
    """Relation query over a write_range_index path: manifest files are
    pruned with the relation's own cell test, survivors scanned with
    the codegen'd predicate pushed down. -> (doc_id, score_x1e6)."""
    if relation not in RANGE_RELATIONS:
        raise ValueError(f"unknown relation {relation!r}")
    from lucene_spark.index.points import _MANIFEST

    man = spark.read.parquet(os.path.join(path, _MANIFEST)).collect()
    files = [
        r["file"] for r in man if _file_survives(relation, r, dims, query)
    ]
    if stats is not None:
        stats["files_total"] = len(man)
        stats["files_scanned"] = len(files)
    schema = spark.read.parquet(os.path.join(path, "data")).schema
    if not files:
        base = spark.createDataFrame([], schema)
    else:
        base = spark.read.schema(schema).parquet(*files)
    return range_query_topk(base, dims, query, relation, id_col, k=k)


def range_on_range_facet_counts(
    df: DataFrame,
    dims: list[tuple[str, str]],
    label_ranges: list[tuple[str, list[tuple[float, float]]]],
    relation: str,
    filter_expr: Column | None = None,
) -> DataFrame:
    """RangeOnRangeFacetCounts analog (facet/rangeonrange/
    RangeOnRangeFacetCounts.java + Long/DoubleRangeOnRangeFacetCounts):
    for each labeled query range, count the hit docs whose STORED range
    relates to it under ``relation`` (the RangeFieldQuery.QueryType
    matches test, RangeOnRangeFacetCounts.java:104-113). A doc may
    count toward many labels; a doc matching none (or with missing
    bounds) is the reference's ``missingCount`` and is excluded from
    the total (RangeOnRangeFacetCounts.java:114-122), reported here as
    the ``__total__`` row (FacetResult.value).

    Scale shape: ONE aggregation pass — every label is a conditional
    sum over the same scan (map-side combined, a single 1-row shuffle),
    exactly the reference's one-iterator-pass structure; the per-label
    predicates are flat codegen comparisons. -> (bucket, cnt) in label
    order, total last.
    """
    preds = [
        range_relation_expr(dims, q, relation) for _, q in label_ranges
    ]
    base = df.filter(filter_expr) if filter_expr is not None else df
    any_pred = None
    aggs = []
    for (lab, _), p in zip(label_ranges, preds):
        aggs.append(
            F.sum(F.when(p, 1).otherwise(0)).cast("long").alias(lab)
        )
        cond = F.coalesce(p, F.lit(False))
        any_pred = cond if any_pred is None else (any_pred | cond)
    aggs.append(
        F.sum(F.when(any_pred, 1).otherwise(0)).cast("long")
        .alias("__total__")
    )
    row = base.agg(*aggs)
    stack = ", ".join(
        f"'{lab}', `{lab}`"
        for lab in [lab for lab, _ in label_ranges] + ["__total__"]
    )
    n = len(label_ranges) + 1
    return row.selectExpr(f"stack({n}, {stack}) AS (bucket, cnt)").select(
        "bucket", F.coalesce(F.col("cnt"), F.lit(0)).cast("long").alias("cnt")
    )


def range_on_range_facet_sql(
    from_clause: str,
    dims: list[tuple[str, str]],
    label_ranges: list[tuple[str, list[tuple[float, float]]]],
    relation: str,
    where: str | None = None,
) -> str:
    """DuckDB oracle twin of range_on_range_facet_counts: the same
    conditional sums over the same relation conjunctions."""

    def conj(rel: str, query: list[tuple[float, float]]) -> str:
        ps = []
        for (mn, mx), (qlo, qhi) in zip(dims, query):
            if rel == "intersects":
                ps.append(f"({qhi!r} >= {mn} AND {qlo!r} <= {mx})")
            elif rel == "within":
                ps.append(f"({qlo!r} <= {mn} AND {qhi!r} >= {mx})")
            elif rel == "contains":
                ps.append(f"({mn} <= {qlo!r} AND {mx} >= {qhi!r})")
        return " AND ".join(ps)

    def pred(query: list[tuple[float, float]]) -> str:
        if relation == "crosses":
            return (f"(({conj('intersects', query)}) "
                    f"AND NOT ({conj('within', query)}))")
        return f"({conj(relation, query)})"

    cols = [
        f"SUM(CASE WHEN {pred(q)} THEN 1 ELSE 0 END) AS \"{lab}\""
        for lab, q in label_ranges
    ]
    any_p = " OR ".join(
        f"COALESCE({pred(q)}, FALSE)" for _, q in label_ranges
    )
    cols.append(f"SUM(CASE WHEN {any_p} THEN 1 ELSE 0 END) AS \"__total__\"")
    w = f" WHERE {where}" if where else ""
    selects = [
        f"SELECT '{lab}' AS bucket, "
        f"CAST(COALESCE(\"{lab}\", 0) AS BIGINT) AS cnt FROM a"
        for lab, _ in label_ranges + [("__total__", None)]
    ]
    return (
        f"WITH a AS (SELECT {', '.join(cols)} FROM {from_clause}{w}) "
        + " UNION ALL ".join(selects)
    )


def range_query_sql(
    from_clause: str,
    dims: list[tuple[str, str]],
    query: list[tuple[float, float]],
    relation: str,
    id_col: str,
    k: int = 20,
) -> str:
    """DuckDB oracle twin: the same relation conjunction as a WHERE
    clause over ``from_clause`` (a table name or parenthesized CTE)."""
    if relation not in RANGE_RELATIONS:
        raise ValueError(f"unknown relation {relation!r}")

    def conj(rel: str) -> str:
        ps = []
        for (mn, mx), (qlo, qhi) in zip(dims, query):
            if rel == "intersects":
                ps.append(f"({qhi!r} >= {mn} AND {qlo!r} <= {mx})")
            elif rel == "within":
                ps.append(f"({qlo!r} <= {mn} AND {qhi!r} >= {mx})")
            elif rel == "contains":
                ps.append(f"({mn} <= {qlo!r} AND {mx} >= {qhi!r})")
        return " AND ".join(ps)

    where = (
        f"({conj('intersects')}) AND NOT ({conj('within')})"
        if relation == "crosses"
        else conj(relation)
    )
    return (
        f"SELECT {id_col} AS doc_id, CAST(1000000 AS BIGINT) AS score_x1e6 "
        f"FROM {from_clause} WHERE {where} ORDER BY doc_id LIMIT {k}"
    )
