"""LatLonShape — indexed shapes with box queries over the four spatial
relations (reference core/document/LatLonShape.java,
LatLonShapeBoundingBoxQuery / ShapeQuery QueryRelation
INTERSECTS | WITHIN | CONTAINS | DISJOINT).

The reference tessellates every shape into triangles
(core/document/Tessellator.java) and indexes the triangles in a 7-dim
BKD; queries test each triangle against the query geometry. This
module keeps exactly that unit: one TRIANGLE per document, stored as
six plain double columns plus its bounding box. Spark-first shape of
the plan:

- the bbox prune (the BKD inner-node role) is a plain min/max column
  filter — Parquet zone maps + Catalyst pushdown skip non-overlapping
  row groups with no custom structure;
- the exact relation test is convex-convex geometry (orientation
  tests), generated ONCE as a SQL boolean expression string and used
  verbatim by both the Spark plan (`F.expr`) and the DuckDB oracle —
  whole-stage-codegen JVM arithmetic, no UDF, and no formula drift
  between engine and oracle.

Relation semantics on convex shapes (triangle T, box B):

- WITHIN  (T inside B): all 3 vertices in B           (B convex)
- CONTAINS (T contains B): all 4 corners of B in T    (T convex)
- INTERSECTS: some vertex of T in B, or some corner of B in T, or a
  T-edge properly crosses a B-edge — exact for convex-convex overlap
- DISJOINT: NOT INTERSECTS

Line/polygon query geometries and distance (circle) queries are not
implemented; the reference reduces them to the same per-triangle
relation tests, so the box query carries the representative plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

RELATIONS = ("intersects", "within", "contains", "disjoint")

# (lon, lat) component column names of the triangle's three vertices
_V = (("ax", "ay"), ("bx", "by"), ("cx", "cy"))


def _synth_coord(tag: str, mod: int, div: float, off: float) -> str:
    """Deterministic md5-derived coordinate, mirrored in SQL (same
    pattern as geo.synthesize_geo: exact-compared doubles)."""
    return (
        f"CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'{tag}'),1,8)) "
        f"AS BIGINT) % {mod} / {div} - {off}"
    )


def _spark_synth(tag: str, mod: int, div: float, off: float):
    key = F.col("doc_id").cast("string")
    h = F.conv(
        F.substring(F.md5(F.concat(key, F.lit(tag))), 1, 8), 16, 10
    ).cast("long")
    return (h % mod) / div - off


def synthesize_triangles(docs: DataFrame) -> DataFrame:
    """-> (doc_id, ax..cy, min/max lat/lon): one deterministic triangle
    per doc — a center point (the synthesize_geo distribution) plus
    three md5-derived vertex offsets within +-20 deg lat / +-40 deg
    lon (the Tessellator-output analog at one triangle per shape)."""
    clat = _spark_synth("_lat", 180000, 1000.0, 90.0)
    clon = _spark_synth("_lon", 360000, 1000.0, 180.0)
    cols = {"doc_id": F.col("doc_id")}
    for i, (x, y) in enumerate(_V):
        cols[y] = clat + _spark_synth(f"_t{i}a", 40000, 1000.0, 20.0)
        cols[x] = clon + _spark_synth(f"_t{i}o", 80000, 1000.0, 40.0)
    out = docs.select(*[c.alias(n) for n, c in cols.items()])
    ys = [y for _, y in _V]
    xs = [x for x, _ in _V]
    return out.select(
        "*",
        F.least(*[F.col(y) for y in ys]).alias("min_lat"),
        F.greatest(*[F.col(y) for y in ys]).alias("max_lat"),
        F.least(*[F.col(x) for x in xs]).alias("min_lon"),
        F.greatest(*[F.col(x) for x in xs]).alias("max_lon"),
    )


_TRI_SQL = "tri AS (\n  SELECT doc_id,\n" + ",\n".join(
    f"    {_synth_coord('_lat', 180000, 1000.0, 90.0)}"
    f" + {_synth_coord(f'_t{i}a', 40000, 1000.0, 20.0)} AS {y},\n"
    f"    {_synth_coord('_lon', 360000, 1000.0, 180.0)}"
    f" + {_synth_coord(f'_t{i}o', 80000, 1000.0, 40.0)} AS {x}"
    for i, (x, y) in enumerate(_V)
) + "\n  FROM documents\n)"


def _orient(ax, ay, bx, by, cx, cy) -> str:
    return f"(({bx}-{ax})*({cy}-{ay}) - ({by}-{ay})*({cx}-{ax}))"


def _in_box(px, py, b) -> str:
    return (
        f"({px} >= {b[2]} AND {px} <= {b[3]} "
        f"AND {py} >= {b[0]} AND {py} <= {b[1]})"
    )


def _in_tri(px, py) -> str:
    os = [
        _orient(ax, ay, bx, by, px, py)
        for (ax, ay), (bx, by) in zip(_V, _V[1:] + _V[:1])
    ]
    pos = " AND ".join(f"{o} >= 0" for o in os)
    neg = " AND ".join(f"{o} <= 0" for o in os)
    return f"(({pos}) OR ({neg}))"


def _seg_cross(p1, p2, q1, q2) -> str:
    """Proper segment intersection (strict orientation sign flips)."""
    o1 = _orient(p1[0], p1[1], p2[0], p2[1], q1[0], q1[1])
    o2 = _orient(p1[0], p1[1], p2[0], p2[1], q2[0], q2[1])
    o3 = _orient(q1[0], q1[1], q2[0], q2[1], p1[0], p1[1])
    o4 = _orient(q1[0], q1[1], q2[0], q2[1], p2[0], p2[1])
    return f"({o1}*{o2} < 0 AND {o3}*{o4} < 0)"


def relation_expr(
    relation: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> str:
    """Boolean SQL over the triangle columns — the shared engine/oracle
    predicate (QueryRelation semantics in the module docstring)."""
    # every literal is parenthesized: a bare negative after '-' would
    # form '--', which SQL lexes as a line comment
    lit = lambda v: f"({float(v)!r})"  # noqa: E731
    b = (lit(min_lat), lit(max_lat), lit(min_lon), lit(max_lon))
    corners = [
        (lit(min_lon), lit(min_lat)), (lit(min_lon), lit(max_lat)),
        (lit(max_lon), lit(max_lat)), (lit(max_lon), lit(min_lat)),
    ]
    if relation == "within":
        return "(" + " AND ".join(_in_box(x, y, b) for x, y in _V) + ")"
    if relation == "contains":
        return "(" + " AND ".join(_in_tri(cx, cy) for cx, cy in corners) + ")"
    if relation in ("intersects", "disjoint"):
        verts_in = [_in_box(x, y, b) for x, y in _V]
        corners_in = [_in_tri(cx, cy) for cx, cy in corners]
        box_edges = list(zip(corners, corners[1:] + corners[:1]))
        tri_edges = list(zip(_V, _V[1:] + _V[:1]))
        crossings = [
            _seg_cross(p1, p2, q1, q2)
            for p1, p2 in tri_edges
            for q1, q2 in box_edges
        ]
        inter = "(" + " OR ".join(verts_in + corners_in + crossings) + ")"
        return inter if relation == "intersects" else f"(NOT {inter})"
    raise ValueError(f"unknown relation {relation!r}; use one of {RELATIONS}")


def _centroid_cols():
    cy = "(" + " + ".join(y for _, y in _V) + ")/3*1000"
    cx = "(" + " + ".join(x for x, _ in _V) + ")/3*1000"
    return cy, cx


def shape_box_topk(
    docs: DataFrame,
    relation: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    k: int = 50,
) -> DataFrame:
    """LatLonShape.newBoxQuery(field, relation, box) over the per-doc
    triangles -> (doc_id, clat_x1e3, clon_x1e3) ordered by doc_id,
    constant-score. The bbox prune runs first (min/max columns — the
    BKD-node role); DISJOINT/CONTAINS scan all rows by necessity."""
    tri = synthesize_triangles(docs)
    if relation in ("intersects", "within"):
        tri = tri.filter(
            (F.col("max_lat") >= min_lat) & (F.col("min_lat") <= max_lat)
            & (F.col("max_lon") >= min_lon) & (F.col("min_lon") <= max_lon)
        )
    expr = relation_expr(relation, min_lat, max_lat, min_lon, max_lon)
    cy, cx = _centroid_cols()
    return (
        tri.filter(F.expr(expr))
        .select(
            "doc_id",
            F.expr(f"CAST(ROUND({cy}) AS BIGINT)").alias("clat_x1e3"),
            F.expr(f"CAST(ROUND({cx}) AS BIGINT)").alias("clon_x1e3"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def shape_box_sql(
    relation: str,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    k: int = 50,
) -> str:
    """DuckDB oracle: identical synthesis + identical relation
    expression string."""
    expr = relation_expr(relation, min_lat, max_lat, min_lon, max_lon)
    cy, cx = _centroid_cols()
    return f"""WITH {_TRI_SQL}
SELECT doc_id, CAST(ROUND({cy}) AS BIGINT) AS clat_x1e3,
       CAST(ROUND({cx}) AS BIGINT) AS clon_x1e3
FROM tri WHERE {expr}
ORDER BY doc_id LIMIT {k}"""
