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
  row groups with no custom structure. ``write_shape_index`` is the
  write path that makes this real: triangles land as plain Parquet
  columns Z-order-clustered by their bounding box (index/points.py
  bkd_write — the same BKD-role mapping the Points sink uses), and
  ``read_shape_index`` prunes whole files through the bounds manifest
  before the scan plan is built. Materializing also keeps the relation
  filter inside whole-stage codegen: filtering the on-the-fly
  synthesized fixture re-expands each md5-derived vertex expression
  into every orientation term under Catalyst projection collapse,
  producing >64 KB generated methods that janino rejects (interpreted
  fallback); over stored columns the same predicate is a few hundred
  plain arithmetic terms;
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

Covers-also note (same semantics, different reference packaging): the
doc-values shape family — core/document/ShapeDocValuesField.java /
LatLonShapeDocValuesField.java / LatLonShapeDocValuesQuery.java /
XYShapeDocValuesField.java / XYShapeDocValuesQuery.java /
BaseShapeDocValuesQuery.java and spatial-extras
serialized/SerializedDVStrategy.java — stores the tessellation PER
DOCUMENT and verifies the relation per document instead of walking a
points index. That is exactly what the stored-triangle columns here
are: the relation predicate runs per row over the doc's own geometry
(a docvalues read), and `read_shape_index(bbox=None)` IS the
no-index-prune, verify-everything path those classes implement. The
composite strategy (spatial-extras composite/CompositeSpatialStrategy
.java + IntersectsRPTVerifyQuery.java: prefix-tree candidates ->
exact DV verify) is the same two-phase shape as
prefixtree.geo_box_prefixtree (grid-term candidates -> boundary
refine).

Beyond the box (r4): polygon (concave-safe even-odd containment),
line, and distance (haversine vertices + equirectangular edge
proximity) query geometries, each unrolled from a literal query shape
into the same shared engine/oracle SQL boolean — see
polygon_relation_expr / line_relation_expr / distance_relation_expr.
Index-time polygon -> triangle tessellation lives in tessellator.py.
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


# bbox dims of the stored-triangle index; 15 bits x 4 dims = 60 <= 63
SHAPE_DIMS = ["min_lat", "max_lat", "min_lon", "max_lon"]


def write_shape_index(docs_or_tri: DataFrame, path: str,
                      num_files: int = 32) -> dict:
    """LatLonShape write path (LatLonShape.java createIndexableFields +
    the BKD add): tessellated triangles stored as plain columns,
    Z-order-clustered by bounding box via index/points.py bkd_write,
    with the per-file bounds manifest as the inner-node level. Accepts
    either a documents table (tessellates the synthetic fixture) or a
    ready triangle table (``ax`` column present — e.g. tessellator.py
    output)."""
    from lucene_spark.index.points import bkd_write

    tri = (
        docs_or_tri if "ax" in docs_or_tri.columns
        else synthesize_triangles(docs_or_tri)
    )
    return bkd_write(tri, SHAPE_DIMS, path, num_files=num_files, bits=15)


def read_shape_index(
    spark,
    path: str,
    bbox: tuple[float, float, float, float] | None = None,
    stats: dict | None = None,
) -> DataFrame:
    """Triangle scan over a write_shape_index layout. ``bbox`` =
    (min_lat, max_lat, min_lon, max_lon) applies the bbox-overlap
    prune (file manifest + pushed row-group predicates): a stored
    triangle can intersect the query box only if its box overlaps, so
    min_* dims are capped above and max_* dims below. CONTAINS /
    DISJOINT scan everything by necessity — pass bbox=None."""
    from lucene_spark.index.points import bkd_scan

    ranges: dict[str, tuple] = {}
    if bbox is not None:
        qlat_lo, qlat_hi, qlon_lo, qlon_hi = bbox
        ranges = {
            "min_lat": (None, qlat_hi), "max_lat": (qlat_lo, None),
            "min_lon": (None, qlon_hi), "max_lon": (qlon_lo, None),
        }
    return bkd_scan(spark, path, ranges, stats=stats)


def _as_triangles(docs_or_tri: DataFrame) -> DataFrame:
    return (
        docs_or_tri if "ax" in docs_or_tri.columns
        else synthesize_triangles(docs_or_tri)
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
    BKD-node role); DISJOINT/CONTAINS scan all rows by necessity.
    ``docs`` may be a documents table (fixture tessellation) or a
    stored-triangle table from read_shape_index."""
    tri = _as_triangles(docs)
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


# ---------------------------------------------------------------------------
# query geometries beyond the box: polygon / line / distance
# (LatLonShape.newPolygonQuery / newLineQuery / newDistanceQuery —
# each reduces to the same per-triangle relation test; the query
# geometry is a plan-time LITERAL, so every test unrolls into one
# shared engine/oracle SQL boolean over the six triangle columns)
# ---------------------------------------------------------------------------

_LIT = lambda v: f"({float(v)!r})"  # noqa: E731


def _pt_in_poly(px: str, py: str, poly: list[tuple[float, float]]) -> str:
    """Even-odd ray casting unrolled over the literal polygon edges
    (concave-safe — the Component2D#contains role)."""
    terms = []
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if y1 == y2:
            continue  # horizontal edge never crosses the horizontal ray
        terms.append(
            f"(CASE WHEN (({_LIT(y1)} > {py}) <> ({_LIT(y2)} > {py}))"
            f" AND ({px} < ({_LIT(x2)} - {_LIT(x1)}) * ({py} - {_LIT(y1)})"
            f" / ({_LIT(y2)} - {_LIT(y1)}) + {_LIT(x1)}) THEN 1 ELSE 0 END)"
        )
    return f"((({' + '.join(terms)}) % 2) = 1)"


def polygon_relation_expr(
    relation: str, poly: list[tuple[float, float]]
) -> str:
    """Triangle-vs-literal-polygon relation (LatLonShape.newPolygonQuery
    QueryRelation semantics; polygon may be concave):

    - INTERSECTS: tri vertex in poly, or poly vertex in tri, or any
      edge pair properly crosses;
    - WITHIN (tri inside poly): all 3 tri vertices inside AND no edge
      crossings (the crossing guard is what makes it concave-safe);
    - CONTAINS (tri contains poly): all poly vertices inside the
      triangle (sufficient — the triangle is convex);
    - DISJOINT: NOT INTERSECTS

Covers-also note (same semantics, different reference packaging): the
doc-values shape family — core/document/ShapeDocValuesField.java /
LatLonShapeDocValuesField.java / LatLonShapeDocValuesQuery.java /
XYShapeDocValuesField.java / XYShapeDocValuesQuery.java /
BaseShapeDocValuesQuery.java and spatial-extras
serialized/SerializedDVStrategy.java — stores the tessellation PER
DOCUMENT and verifies the relation per document instead of walking a
points index. That is exactly what the stored-triangle columns here
are: the relation predicate runs per row over the doc's own geometry
(a docvalues read), and `read_shape_index(bbox=None)` IS the
no-index-prune, verify-everything path those classes implement. The
composite strategy (spatial-extras composite/CompositeSpatialStrategy
.java + IntersectsRPTVerifyQuery.java: prefix-tree candidates ->
exact DV verify) is the same two-phase shape as
prefixtree.geo_box_prefixtree (grid-term candidates -> boundary
refine)..
    """
    pl = [(float(x), float(y)) for x, y in poly]
    tri_in_poly = [_pt_in_poly(x, y, pl) for x, y in _V]
    poly_in_tri = [_in_tri(_LIT(px), _LIT(py)) for px, py in pl]
    poly_edges = [
        ((_LIT(pl[i][0]), _LIT(pl[i][1])),
         (_LIT(pl[(i + 1) % len(pl)][0]), _LIT(pl[(i + 1) % len(pl)][1])))
        for i in range(len(pl))
    ]
    tri_edges = list(zip(_V, _V[1:] + _V[:1]))
    crossings = [
        _seg_cross(p1, p2, q1, q2)
        for p1, p2 in tri_edges
        for q1, q2 in poly_edges
    ]
    if relation == "within":
        return (
            "(" + " AND ".join(tri_in_poly)
            + " AND NOT (" + " OR ".join(crossings) + "))"
        )
    if relation == "contains":
        return "(" + " AND ".join(poly_in_tri) + ")"
    if relation in ("intersects", "disjoint"):
        inter = "(" + " OR ".join(tri_in_poly + poly_in_tri + crossings) + ")"
        return inter if relation == "intersects" else f"(NOT {inter})"
    raise ValueError(f"unknown relation {relation!r}; use one of {RELATIONS}")


def line_relation_expr(
    relation: str, line: list[tuple[float, float]]
) -> str:
    """Triangle-vs-literal-polyline relation (LatLonShape.newLineQuery):

    - INTERSECTS: any line vertex inside the triangle or any segment
      properly crosses a triangle edge;
    - CONTAINS (tri contains line): every line vertex inside (convexity
      of the triangle makes that sufficient);
    - DISJOINT: NOT INTERSECTS

Covers-also note (same semantics, different reference packaging): the
doc-values shape family — core/document/ShapeDocValuesField.java /
LatLonShapeDocValuesField.java / LatLonShapeDocValuesQuery.java /
XYShapeDocValuesField.java / XYShapeDocValuesQuery.java /
BaseShapeDocValuesQuery.java and spatial-extras
serialized/SerializedDVStrategy.java — stores the tessellation PER
DOCUMENT and verifies the relation per document instead of walking a
points index. That is exactly what the stored-triangle columns here
are: the relation predicate runs per row over the doc's own geometry
(a docvalues read), and `read_shape_index(bbox=None)` IS the
no-index-prune, verify-everything path those classes implement. The
composite strategy (spatial-extras composite/CompositeSpatialStrategy
.java + IntersectsRPTVerifyQuery.java: prefix-tree candidates ->
exact DV verify) is the same two-phase shape as
prefixtree.geo_box_prefixtree (grid-term candidates -> boundary
refine).;
    - WITHIN is identically FALSE for full-area triangles vs a
      zero-area line (kept callable for QueryRelation parity).
    """
    pts = [(float(x), float(y)) for x, y in line]
    verts_in = [_in_tri(_LIT(px), _LIT(py)) for px, py in pts]
    segs = [
        ((_LIT(pts[i][0]), _LIT(pts[i][1])),
         (_LIT(pts[i + 1][0]), _LIT(pts[i + 1][1])))
        for i in range(len(pts) - 1)
    ]
    tri_edges = list(zip(_V, _V[1:] + _V[:1]))
    crossings = [
        _seg_cross(p1, p2, q1, q2) for p1, p2 in tri_edges for q1, q2 in segs
    ]
    if relation == "within":
        return "(1 = 0)"
    if relation == "contains":
        return "(" + " AND ".join(verts_in) + ")"
    if relation in ("intersects", "disjoint"):
        inter = "(" + " OR ".join(verts_in + crossings) + ")"
        return inter if relation == "intersects" else f"(NOT {inter})"
    raise ValueError(f"unknown relation {relation!r}; use one of {RELATIONS}")


_EARTH_M = 6371008.7714  # GeoUtils.EARTH_MEAN_RADIUS_METERS


def _haversine_m(px: str, py: str, qlat: float, qlon: float) -> str:
    return (
        f"(2 * {_EARTH_M!r} * ASIN(SQRT("
        f"POWER(SIN(RADIANS(({py} - {_LIT(qlat)}) / 2)), 2)"
        f" + COS(RADIANS({_LIT(qlat)})) * COS(RADIANS({py}))"
        f" * POWER(SIN(RADIANS(({px} - {_LIT(qlon)}) / 2)), 2))))"
    )


def distance_relation_expr(
    relation: str, qlat: float, qlon: float, radius_m: float
) -> str:
    """Triangle-vs-circle relation (LatLonShape.newDistanceQuery):

    - INTERSECTS: any triangle vertex within radius (haversine,
      SloppyMath.haversinMeters formula), or the center inside the
      triangle, or any triangle edge passing within radius of the
      center — the edge proximity uses the closest point on the
      segment in an equirectangular projection scaled by cos(lat)
      (documented approximation of the reference's exact
      Component2D/GeoUtils math; exact at the vertices and the
      center-in test, approximate only on long edges at high latitude);
    - WITHIN: all three vertices within radius AND no edge farther
      excursion — for a convex circle all-vertices-in implies the
      whole triangle is in, so the vertex test is exact;
    - CONTAINS: the triangle contains the whole circle: center inside
      AND every edge at least radius away;
    - DISJOINT: NOT INTERSECTS

Covers-also note (same semantics, different reference packaging): the
doc-values shape family — core/document/ShapeDocValuesField.java /
LatLonShapeDocValuesField.java / LatLonShapeDocValuesQuery.java /
XYShapeDocValuesField.java / XYShapeDocValuesQuery.java /
BaseShapeDocValuesQuery.java and spatial-extras
serialized/SerializedDVStrategy.java — stores the tessellation PER
DOCUMENT and verifies the relation per document instead of walking a
points index. That is exactly what the stored-triangle columns here
are: the relation predicate runs per row over the doc's own geometry
(a docvalues read), and `read_shape_index(bbox=None)` IS the
no-index-prune, verify-everything path those classes implement. The
composite strategy (spatial-extras composite/CompositeSpatialStrategy
.java + IntersectsRPTVerifyQuery.java: prefix-tree candidates ->
exact DV verify) is the same two-phase shape as
prefixtree.geo_box_prefixtree (grid-term candidates -> boundary
refine)..
    """
    lit_r = _LIT(radius_m)
    verts_in = [f"({_haversine_m(x, y, qlat, qlon)} <= {lit_r})" for x, y in _V]
    center_in = _in_tri(_LIT(qlon), _LIT(qlat))
    # equirectangular meters per degree at the query latitude
    import math as _m

    kx = _m.cos(_m.radians(qlat)) * _m.pi / 180.0 * _EARTH_M
    ky = _m.pi / 180.0 * _EARTH_M

    def seg_dist2(p1, p2) -> str:
        ax_, ay_ = f"(({p1[0]} - {_LIT(qlon)}) * {kx!r})", f"(({p1[1]} - {_LIT(qlat)}) * {ky!r})"
        bx_, by_ = f"(({p2[0]} - {_LIT(qlon)}) * {kx!r})", f"(({p2[1]} - {_LIT(qlat)}) * {ky!r})"
        dx, dy = f"({bx_} - {ax_})", f"({by_} - {ay_})"
        t = (
            f"LEAST(1.0, GREATEST(0.0, (-({ax_}) * {dx} - ({ay_}) * {dy})"
            f" / NULLIF({dx} * {dx} + {dy} * {dy}, 0.0)))"
        )
        cx_ = f"({ax_} + {t} * {dx})"
        cy_ = f"({ay_} + {t} * {dy})"
        return f"(COALESCE({cx_} * {cx_} + {cy_} * {cy_}, ({ax_})*({ax_}) + ({ay_})*({ay_})))"

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
    raise ValueError(f"unknown relation {relation!r}; use one of {RELATIONS}")


def _shape_query(docs: DataFrame, expr: str, k: int) -> DataFrame:
    tri = _as_triangles(docs)
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


def _shape_sql(expr: str, k: int) -> str:
    cy, cx = _centroid_cols()
    return f"""WITH {_TRI_SQL}
SELECT doc_id, CAST(ROUND({cy}) AS BIGINT) AS clat_x1e3,
       CAST(ROUND({cx}) AS BIGINT) AS clon_x1e3
FROM tri WHERE {expr}
ORDER BY doc_id LIMIT {k}"""


def shape_polygon_topk(docs, relation, poly, k: int = 50) -> DataFrame:
    return _shape_query(docs, polygon_relation_expr(relation, poly), k)


def shape_polygon_sql(relation, poly, k: int = 50) -> str:
    return _shape_sql(polygon_relation_expr(relation, poly), k)


def shape_line_topk(docs, relation, line, k: int = 50) -> DataFrame:
    return _shape_query(docs, line_relation_expr(relation, line), k)


def shape_line_sql(relation, line, k: int = 50) -> str:
    return _shape_sql(line_relation_expr(relation, line), k)


def shape_distance_topk(docs, relation, qlat, qlon, radius_m, k: int = 50) -> DataFrame:
    return _shape_query(
        docs, distance_relation_expr(relation, qlat, qlon, radius_m), k
    )


def shape_distance_sql(relation, qlat, qlon, radius_m, k: int = 50) -> str:
    return _shape_sql(distance_relation_expr(relation, qlat, qlon, radius_m), k)
