"""spatial3d minimal surface — unit-sphere vector geometry
(lucene/spatial3d: GeoPoint / GeoCircle / GeoStandardPath over
PlanetModel.SPHERE).

The reference module's idea is to do spherical geometry EXACTLY with 3D
vector algebra (points are unit vectors; circles and path edges are
planes) instead of lat/lon trigonometry. This rebuild keeps that shape:

- ``xyz_cols`` — GeoPoint: (lat, lon) -> unit vector (x, y, z);
- ``geo3d_circle_topk`` — GeoCircle membership: angular distance
  acos(P·Q) <= cutoff, nearest first;
- ``geo3d_path_topk`` — GeoStandardPath: min angular distance to a
  polyline of great-circle arcs; per segment (A, B) with normal
  n = A x B, the cross-track distance asin(|P·n̂|) applies when P
  projects inside the arc (scalar-triple sign tests — the component of
  P along n contributes zero to the triples, so no explicit projection
  is needed), else the distance to the nearer endpoint.

Every expression is plain float64 arithmetic over constants, mirrored
verbatim in the DuckDB oracle; angles are emitted at 1e-4 rad
granularity so trig ulp differences between engines cannot flip values.
Coordinates come from geo.synthesize_geo (deterministic, 3 decimals).

Scale: membership is one narrow JVM expression per row (prunable by a
lat-band column predicate exactly like geo.py's box prefilter at real
scale); no shuffle, no UDF.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from lucene_spark.search.geo import _GEO_SQL, synthesize_geo


def _unit(lat_deg: float, lon_deg: float) -> tuple[float, float, float]:
    la, lo = math.radians(lat_deg), math.radians(lon_deg)
    return (
        math.cos(la) * math.cos(lo),
        math.cos(la) * math.sin(lo),
        math.sin(la),
    )


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _norm(v):
    n = math.sqrt(v[0] ** 2 + v[1] ** 2 + v[2] ** 2)
    return (v[0] / n, v[1] / n, v[2] / n)


def xyz_cols(g: DataFrame) -> DataFrame:
    """GeoPoint: lat/lon degrees -> unit-sphere (x, y, z) columns."""
    la = F.radians(F.col("lat"))
    lo = F.radians(F.col("lon"))
    return g.select(
        "doc_id",
        (F.cos(la) * F.cos(lo)).alias("x"),
        (F.cos(la) * F.sin(lo)).alias("y"),
        F.sin(la).alias("z"),
    )


_XYZ_SQL = """xyz AS (
  SELECT doc_id,
    cos(radians(lat)) * cos(radians(lon)) AS x,
    cos(radians(lat)) * sin(radians(lon)) AS y,
    sin(radians(lat)) AS z
  FROM g
)"""


def _dot_expr(q):
    return F.col("x") * q[0] + F.col("y") * q[1] + F.col("z") * q[2]


def _angle(dot_col):
    return F.acos(F.least(F.lit(1.0), F.greatest(F.lit(-1.0), dot_col)))


def geo3d_circle_topk(
    docs: DataFrame, qlat: float, qlon: float, max_angle_deg: float,
    k: int = 50,
) -> DataFrame:
    """GeoCircle: docs within the angular cutoff of the center, nearest
    first. -> (doc_id, angle_x1e4) ordered (angle, doc_id)."""
    q = _unit(qlat, qlon)
    cutoff = math.radians(max_angle_deg)
    p = xyz_cols(synthesize_geo(docs))
    ang = _angle(_dot_expr(q))
    return (
        p.withColumn("ang", ang)
        .filter(F.col("ang") <= cutoff)
        .select(
            "doc_id",
            F.round(F.col("ang") * 1e4).cast("long").alias("angle_x1e4"),
        )
        .orderBy("angle_x1e4", "doc_id")
        .limit(k)
    )


def geo3d_circle_sql(
    qlat: float, qlon: float, max_angle_deg: float, k: int = 50
) -> str:
    q = _unit(qlat, qlon)
    cutoff = math.radians(max_angle_deg)
    return f"""WITH {_GEO_SQL},
{_XYZ_SQL}
SELECT doc_id,
  CAST(ROUND(acos(least(1.0, greatest(-1.0,
    x * {q[0]!r} + y * {q[1]!r} + z * {q[2]!r}))) * 10000) AS BIGINT)
    AS angle_x1e4
FROM xyz
WHERE acos(least(1.0, greatest(-1.0,
    x * {q[0]!r} + y * {q[1]!r} + z * {q[2]!r}))) <= {cutoff!r}
ORDER BY angle_x1e4, doc_id LIMIT {k}"""


def _segment_angle_expr(a, b):
    """Column: angular distance from the row's point to great-circle
    arc A->B (GeoStandardPath segment math)."""
    n = _norm(_cross(a, b))
    # along-arc sign tests via scalar triples:
    # triple(A, P, n) = (A x P) . n = P . (n x A)   — past A toward B
    # triple(P, B, n) = (P x B) . n = P . (B x n)   — before B
    t1 = _dot_expr(_cross(n, a))
    t2 = _dot_expr(_cross(b, n))
    cross_track = F.asin(
        F.least(
            F.lit(1.0),
            F.greatest(F.lit(-1.0), F.abs(_dot_expr(n))),
        )
    )
    end_a = _angle(_dot_expr(a))
    end_b = _angle(_dot_expr(b))
    return F.when((t1 >= 0) & (t2 >= 0), cross_track).otherwise(
        F.least(end_a, end_b)
    )


def geo3d_path_topk(
    docs: DataFrame,
    vertices: list[tuple[float, float]],
    max_angle_deg: float,
    k: int = 50,
) -> DataFrame:
    """GeoStandardPath: docs within the angular cutoff of a polyline of
    great-circle arcs. -> (doc_id, angle_x1e4) ordered (angle, doc_id)."""
    pts = [_unit(la, lo) for la, lo in vertices]
    cutoff = math.radians(max_angle_deg)
    p = xyz_cols(synthesize_geo(docs))
    dist = None
    for a, b in zip(pts, pts[1:]):
        seg = _segment_angle_expr(a, b)
        dist = seg if dist is None else F.least(dist, seg)
    return (
        p.withColumn("ang", dist)
        .filter(F.col("ang") <= cutoff)
        .select(
            "doc_id",
            F.round(F.col("ang") * 1e4).cast("long").alias("angle_x1e4"),
        )
        .orderBy("angle_x1e4", "doc_id")
        .limit(k)
    )


def _seg_sql(a, b) -> str:
    n = _norm(_cross(a, b))
    nxa = _cross(n, a)
    bxn = _cross(b, n)

    def dot(v):
        return f"(x * {v[0]!r} + y * {v[1]!r} + z * {v[2]!r})"

    ang = (
        lambda v: f"acos(least(1.0, greatest(-1.0, {dot(v)})))"
    )
    return (
        f"CASE WHEN {dot(nxa)} >= 0 AND {dot(bxn)} >= 0 "
        f"THEN asin(least(1.0, greatest(-1.0, abs({dot(n)})))) "
        f"ELSE least({ang(a)}, {ang(b)}) END"
    )


def geo3d_path_sql(
    vertices: list[tuple[float, float]], max_angle_deg: float, k: int = 50
) -> str:
    pts = [_unit(la, lo) for la, lo in vertices]
    cutoff = math.radians(max_angle_deg)
    segs = [_seg_sql(a, b) for a, b in zip(pts, pts[1:])]
    dist = segs[0]
    for s in segs[1:]:
        dist = f"least({dist}, {s})"
    return f"""WITH {_GEO_SQL},
{_XYZ_SQL}
SELECT doc_id, CAST(ROUND(({dist}) * 10000) AS BIGINT) AS angle_x1e4
FROM xyz
WHERE ({dist}) <= {cutoff!r}
ORDER BY angle_x1e4, doc_id LIMIT {k}"""


# ---------------------------------------------------------------------------
# GeoConvexPolygon / GeoCompositePolygon (spatial3d geom/GeoConvexPolygon
# .java, GeoCompositePolygon.java): membership = the point lies on the
# interior side of every edge's great-circle plane (SidedPlane role).
# Orientation is normalized at build time against the polygon's interior
# point (the GeoPolygonFactory pole-check role), so vertex order — CW or
# CCW — does not matter. A composite (concave) polygon is the OR of its
# convex pieces.
# ---------------------------------------------------------------------------


def _convex_planes(
    vertices: list[tuple[float, float]]
) -> list[tuple[float, float, float]]:
    """Edge-plane normals oriented so the polygon interior satisfies
    P·n >= 0 for every edge."""
    pts = [_unit(la, lo) for la, lo in vertices]
    if len(pts) < 3:
        raise ValueError("polygon needs >= 3 vertices")
    interior = _norm(tuple(sum(c[i] for c in pts) for i in range(3)))
    planes = []
    for a, b in zip(pts, pts[1:] + pts[:1]):
        n = _norm(_cross(a, b))
        side = sum(interior[i] * n[i] for i in range(3))
        if abs(side) < 1e-12:
            raise ValueError("degenerate edge plane through the interior")
        if side < 0:
            n = (-n[0], -n[1], -n[2])
        planes.append(n)
    return planes


def _polygon_member_expr(polygons: list[list[tuple[float, float]]]):
    member = None
    for poly in polygons:
        inside = None
        for n in _convex_planes(poly):
            t = _dot_expr(n) >= 0
            inside = t if inside is None else (inside & t)
        member = inside if member is None else (member | inside)
    return member


def geo3d_polygon_topk(
    docs: DataFrame,
    polygons: list[list[tuple[float, float]]],
    k: int = 50,
) -> DataFrame:
    """Docs inside the union of convex spherical polygons ((lat, lon)
    vertex lists) -> (doc_id, lat_x1e3, lon_x1e3) ordered by doc_id,
    constant-score — the GeoCompositePolygon isWithin contract."""
    g = synthesize_geo(docs)
    p = xyz_cols(g).join(g.select("doc_id", "lat", "lon"), "doc_id")
    return (
        p.filter(_polygon_member_expr(polygons))
        .select(
            "doc_id",
            F.round(F.col("lat") * 1000).cast("long").alias("lat_x1e3"),
            F.round(F.col("lon") * 1000).cast("long").alias("lon_x1e3"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def geo3d_polygon_sql(
    polygons: list[list[tuple[float, float]]], k: int = 50
) -> str:
    def dot(v):
        return f"(x * {v[0]!r} + y * {v[1]!r} + z * {v[2]!r})"

    parts = []
    for poly in polygons:
        conj = " AND ".join(f"{dot(n)} >= 0" for n in _convex_planes(poly))
        parts.append(f"({conj})")
    member = " OR ".join(parts)
    return f"""WITH {_GEO_SQL},
{_XYZ_SQL}
SELECT p.doc_id, CAST(ROUND(g.lat*1000) AS BIGINT) AS lat_x1e3,
       CAST(ROUND(g.lon*1000) AS BIGINT) AS lon_x1e3
FROM xyz p JOIN g ON p.doc_id = g.doc_id
WHERE {member}
ORDER BY p.doc_id LIMIT {k}"""
