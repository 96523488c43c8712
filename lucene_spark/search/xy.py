"""Cartesian (XY) geometries — the XYPoint / XYShape surface.

Reference: ``core/document/XYPointField.java`` (newBoxQuery /
newDistanceQuery / newPolygonQuery over float x/y planes),
``core/document/XYShape.java`` (the same query geometries over
tessellated triangles), ``core/geo/XYCircle.java`` /
``XYRectangle.java`` / ``XYPolygon.java``. Everything LatLonPoint does
on the sphere, XY does on a flat plane: no dateline, no poles, plain
Euclidean distance — which makes the circle-vs-triangle relations
EXACT here (the geo module's equirectangular edge-proximity
approximation has no cartesian counterpart; the reference's
``Component2D`` math is exact in both spaces).

Shares the triangle relation machinery with shapes.py verbatim
(``polygon_relation_expr`` / ``line_relation_expr`` are pure 2-D
geometry with no spherical terms); only the distance relation is
re-derived for the Euclidean metric.

The corpus has no coordinates: ``synthesize_xy`` derives deterministic
(x, y) in [0, 1000) per doc from md5 integers, mirrored in ANSI SQL
for the oracle (the synthesize_geo pattern).

100-TB shape: identical to the geo paths — plain double-column
predicates (codegen + parquet stats pruning; a production layout adds
a z-order sort key on (x, y)), exact refinement in the same scan, no
UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from lucene_spark.search.shapes import _LIT, _V, _in_tri, _seg_cross

__all__ = [
    "synthesize_xy",
    "xy_box_topk",
    "xy_box_sql",
    "xy_distance_topk",
    "xy_distance_sql",
    "xy_polygon_topk",
    "xy_polygon_sql",
    "xy_circle_relation_expr",
    "xyshape_circle_topk",
    "xyshape_circle_sql",
]


def synthesize_xy(docs: DataFrame) -> DataFrame:
    """-> (doc_id, x, y): deterministic pseudo-coordinates in
    [0, 1000), 3 decimal places (exact in double for both engines)."""
    key = F.col("doc_id").cast("string")
    h1 = F.conv(F.substring(F.md5(F.concat(key, F.lit("_x"))), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(F.concat(key, F.lit("_y"))), 1, 8), 16, 10).cast("long")
    return docs.select(
        "doc_id",
        ((h1 % 1000000) / 1000.0).alias("x"),
        ((h2 % 1000000) / 1000.0).alias("y"),
    )


_XY_SQL = """xy AS (
  SELECT doc_id,
    CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'_x'),1,8)) AS BIGINT) % 1000000 / 1000.0 AS x,
    CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'_y'),1,8)) AS BIGINT) % 1000000 / 1000.0 AS y
  FROM documents
)"""


def xy_box_topk(
    docs: DataFrame,
    min_x: float, max_x: float, min_y: float, max_y: float,
    k: int = 50,
) -> DataFrame:
    """XYPointField.newBoxQuery: plain rectangle membership.
    -> (doc_id, x_x1e3, y_x1e3)."""
    g = synthesize_xy(docs)
    return (
        g.filter(
            (F.col("x") >= min_x) & (F.col("x") <= max_x)
            & (F.col("y") >= min_y) & (F.col("y") <= max_y)
        )
        .select(
            "doc_id",
            F.round(F.col("x") * 1000).cast("long").alias("x_x1e3"),
            F.round(F.col("y") * 1000).cast("long").alias("y_x1e3"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def xy_box_sql(
    min_x: float, max_x: float, min_y: float, max_y: float, k: int = 50
) -> str:
    return f"""WITH {_XY_SQL}
SELECT doc_id, CAST(ROUND(x*1000) AS BIGINT) AS x_x1e3,
       CAST(ROUND(y*1000) AS BIGINT) AS y_x1e3
FROM xy
WHERE x BETWEEN {min_x} AND {max_x} AND y BETWEEN {min_y} AND {max_y}
ORDER BY doc_id LIMIT {k}"""


def xy_distance_topk(
    docs: DataFrame, cx: float, cy: float, radius: float, k: int = 20
) -> DataFrame:
    """XYPointField.newDistanceQuery: docs within an XYCircle, nearest
    first (exact Euclidean; distance emitted at 1e-3 granularity with
    doc_id tiebreak). -> (doc_id, dist_x1e3)."""
    g = synthesize_xy(docs)
    dx = F.col("x") - F.lit(float(cx))
    dy = F.col("y") - F.lit(float(cy))
    dist = F.sqrt(dx * dx + dy * dy)
    return (
        g.withColumn("__d", dist)
        .filter(F.col("__d") <= radius)
        .select(
            "doc_id",
            F.round(F.col("__d") * 1000).cast("long").alias("dist_x1e3"),
        )
        .orderBy(F.col("dist_x1e3").asc(), F.col("doc_id").asc())
        .limit(k)
    )


def xy_distance_sql(cx: float, cy: float, radius: float, k: int = 20) -> str:
    d = f"sqrt((x - {float(cx)!r}) * (x - {float(cx)!r}) + (y - {float(cy)!r}) * (y - {float(cy)!r}))"
    return f"""WITH {_XY_SQL}
SELECT doc_id, CAST(ROUND({d} * 1000) AS BIGINT) AS dist_x1e3
FROM xy WHERE {d} <= {float(radius)!r}
ORDER BY dist_x1e3 ASC, doc_id ASC LIMIT {k}"""


def _poly_where(poly: list[tuple[float, float]]) -> str:
    """Even-odd ray casting over the literal polygon — the same
    Component2D#contains unroll shapes._pt_in_poly uses, over the xy
    frame's (x, y) columns."""
    from lucene_spark.search.shapes import _pt_in_poly

    return _pt_in_poly("x", "y", [(float(a), float(b)) for a, b in poly])


def xy_polygon_topk(
    docs: DataFrame, poly: list[tuple[float, float]], k: int = 50
) -> DataFrame:
    """XYPointField.newPolygonQuery (concave-safe even-odd test).
    ``poly`` is [(x, y), ...]. -> (doc_id, x_x1e3, y_x1e3)."""
    g = synthesize_xy(docs)
    return (
        g.filter(F.expr(_poly_where(poly)))
        .select(
            "doc_id",
            F.round(F.col("x") * 1000).cast("long").alias("x_x1e3"),
            F.round(F.col("y") * 1000).cast("long").alias("y_x1e3"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def xy_polygon_sql(poly: list[tuple[float, float]], k: int = 50) -> str:
    return f"""WITH {_XY_SQL}
SELECT doc_id, CAST(ROUND(x*1000) AS BIGINT) AS x_x1e3,
       CAST(ROUND(y*1000) AS BIGINT) AS y_x1e3
FROM xy WHERE {_poly_where(poly)}
ORDER BY doc_id LIMIT {k}"""


def xy_circle_relation_expr(
    relation: str, cx: float, cy: float, radius: float
) -> str:
    """Triangle-vs-XYCircle relation (XYShape.newDistanceQuery), exact
    under the Euclidean metric:

    - INTERSECTS: any vertex inside the circle, or the center inside
      the triangle, or any edge's closest point within radius;
    - WITHIN: all three vertices inside (circle convex -> exact);
    - CONTAINS: center inside the triangle AND every edge at least
      radius away (triangle convex -> exact);
    - DISJOINT: NOT INTERSECTS.
    """
    lit_r = _LIT(radius)
    cxl, cyl = _LIT(cx), _LIT(cy)

    def vert_in(px: str, py: str) -> str:
        return (
            f"(({px} - {cxl}) * ({px} - {cxl})"
            f" + ({py} - {cyl}) * ({py} - {cyl}) <= {lit_r} * {lit_r})"
        )

    def seg_dist2(p1, p2) -> str:
        ax_, ay_ = f"({p1[0]} - {cxl})", f"({p1[1]} - {cyl})"
        bx_, by_ = f"({p2[0]} - {cxl})", f"({p2[1]} - {cyl})"
        dx, dy = f"({bx_} - {ax_})", f"({by_} - {ay_})"
        t = (
            f"LEAST(1.0, GREATEST(0.0, (-({ax_}) * {dx} - ({ay_}) * {dy})"
            f" / NULLIF({dx} * {dx} + {dy} * {dy}, 0.0)))"
        )
        px_ = f"({ax_} + {t} * {dx})"
        py_ = f"({ay_} + {t} * {dy})"
        return (
            f"(COALESCE({px_} * {px_} + {py_} * {py_},"
            f" ({ax_})*({ax_}) + ({ay_})*({ay_})))"
        )

    verts_in = [vert_in(x, y) for x, y in _V]
    center_in = _in_tri(cxl, cyl)
    tri_edges = list(zip(_V, _V[1:] + _V[:1]))
    edge_near = [
        f"({seg_dist2(p1, p2)} <= {lit_r} * {lit_r})" for p1, p2 in tri_edges
    ]
    edge_far = [
        f"({seg_dist2(p1, p2)} > {lit_r} * {lit_r})" for p1, p2 in tri_edges
    ]
    if relation == "within":
        return "(" + " AND ".join(verts_in) + ")"
    if relation == "contains":
        return "(" + center_in + " AND " + " AND ".join(edge_far) + ")"
    if relation in ("intersects", "disjoint"):
        inter = "(" + " OR ".join(verts_in + [center_in] + edge_near) + ")"
        return inter if relation == "intersects" else f"(NOT {inter})"
    raise ValueError(f"unknown relation {relation!r}")


def xyshape_circle_topk(
    tri_docs: DataFrame, relation: str,
    cx: float, cy: float, radius: float, k: int = 50,
) -> DataFrame:
    """XYShape.newDistanceQuery over indexed triangles (the stored
    shape-index frame from shapes.py; XY treats the lon/lat-named
    columns as plain plane coordinates)."""
    from lucene_spark.search.shapes import _shape_query

    return _shape_query(
        tri_docs, xy_circle_relation_expr(relation, cx, cy, radius), k
    )


def xyshape_circle_sql(
    relation: str, cx: float, cy: float, radius: float, k: int = 50
) -> str:
    from lucene_spark.search.shapes import _shape_sql

    return _shape_sql(xy_circle_relation_expr(relation, cx, cy, radius), k)
