"""spatial3d minimal surface: GeoCircle / GeoStandardPath membership by
unit-vector algebra, cross-checked against numpy brute-force spherical
geometry on the synthesized coordinates."""

import math

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def latlon(spark):
    from lucene_spark.search.geo import synthesize_geo

    d = spark.read.parquet(f"{SF}/documents.parquet")
    g = synthesize_geo(d).collect()
    return d, {r["doc_id"]: (r["lat"], r["lon"]) for r in g}


def _unit(lat, lon):
    la, lo = math.radians(lat), math.radians(lon)
    return np.array(
        [math.cos(la) * math.cos(lo), math.cos(la) * math.sin(lo), math.sin(la)]
    )


def _arc_dist(p, a, b):
    n = np.cross(a, b)
    n = n / np.linalg.norm(n)
    if np.dot(p, np.cross(n, a)) >= 0 and np.dot(p, np.cross(b, n)) >= 0:
        return math.asin(min(1.0, abs(float(np.dot(p, n)))))
    return min(
        math.acos(max(-1.0, min(1.0, float(np.dot(p, a))))),
        math.acos(max(-1.0, min(1.0, float(np.dot(p, b))))),
    )


def test_circle_matches_brute_force(latlon):
    from lucene_spark.search.geo3d import geo3d_circle_topk

    d, pts = latlon
    qlat, qlon, deg = 35.0, 10.0, 25.0
    got = {
        r["doc_id"]: r["angle_x1e4"]
        for r in geo3d_circle_topk(d, qlat, qlon, deg, k=10_000).collect()
    }
    q = _unit(qlat, qlon)
    want = {}
    for did, (la, lo) in pts.items():
        ang = math.acos(max(-1.0, min(1.0, float(np.dot(q, _unit(la, lo))))))
        if ang <= math.radians(deg):
            want[did] = round(ang * 1e4)
    assert got == want and want


def test_path_matches_brute_force(latlon):
    from lucene_spark.search.geo3d import geo3d_path_topk

    d, pts = latlon
    verts = [(10.0, -30.0), (25.0, 0.0), (40.0, 30.0)]
    deg = 12.0
    got = {
        r["doc_id"]: r["angle_x1e4"]
        for r in geo3d_path_topk(d, verts, deg, k=10_000).collect()
    }
    vs = [_unit(la, lo) for la, lo in verts]
    want = {}
    for did, (la, lo) in pts.items():
        p = _unit(la, lo)
        ang = min(_arc_dist(p, a, b) for a, b in zip(vs, vs[1:]))
        if ang <= math.radians(deg):
            want[did] = round(ang * 1e4)
    assert got == want and want


def test_circle_equals_haversine_membership(latlon):
    """A GeoCircle is exactly a distance query on the sphere: the 3D
    angular cutoff and the haversine-km cutoff must select the same
    docs when the radii agree."""
    from lucene_spark.search.geo import EARTH_RADIUS_KM, geo_distance_topk
    from lucene_spark.search.geo3d import geo3d_circle_topk

    d, _ = latlon
    deg = 20.0
    radius_km = math.radians(deg) * EARTH_RADIUS_KM
    a = {r["doc_id"] for r in geo3d_circle_topk(d, 35.0, 10.0, deg, k=10_000).collect()}
    b = {
        r["doc_id"]
        for r in geo_distance_topk(d, 35.0, 10.0, radius_km, k=10_000).collect()
    }
    assert a == b and a


def test_polygon_membership_brute_force(spark):
    import math

    from lucene_spark.search import geo3d
    from lucene_spark.search.geo import synthesize_geo

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    poly = [(0.0, -30.0), (40.0, 0.0), (10.0, 45.0), (-25.0, 10.0)]
    got = {
        r["doc_id"]
        for r in geo3d.geo3d_polygon_topk(docs, [poly], k=10**6).collect()
    }

    planes = geo3d._convex_planes(poly)
    want = set()
    for r in synthesize_geo(docs).collect():
        la, lo = math.radians(r["lat"]), math.radians(r["lon"])
        p = (math.cos(la) * math.cos(lo),
             math.cos(la) * math.sin(lo),
             math.sin(la))
        if all(sum(p[i] * n[i] for i in range(3)) >= 0 for n in planes):
            want.add(r["doc_id"])
    assert got == want and len(got) > 0


def test_polygon_vertex_order_insensitive(spark):
    from lucene_spark.search import geo3d

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    poly = [(0.0, -30.0), (40.0, 0.0), (10.0, 45.0), (-25.0, 10.0)]
    fwd = {r["doc_id"] for r in
           geo3d.geo3d_polygon_topk(docs, [poly], k=10**6).collect()}
    rev = {r["doc_id"] for r in
           geo3d.geo3d_polygon_topk(docs, [poly[::-1]], k=10**6).collect()}
    assert fwd == rev


def test_composite_polygon_is_union(spark):
    from lucene_spark.search import geo3d

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = [(0.0, -30.0), (40.0, 0.0), (10.0, 45.0), (-25.0, 10.0)]
    b = [(-50.0, 100.0), (-20.0, 130.0), (-45.0, 160.0)]
    u = {r["doc_id"] for r in
         geo3d.geo3d_polygon_topk(docs, [a, b], k=10**6).collect()}
    sa = {r["doc_id"] for r in
          geo3d.geo3d_polygon_topk(docs, [a], k=10**6).collect()}
    sb = {r["doc_id"] for r in
          geo3d.geo3d_polygon_topk(docs, [b], k=10**6).collect()}
    assert u == (sa | sb) and sa and sb


def test_polygon_validation():
    import pytest as _pytest

    from lucene_spark.search import geo3d

    with _pytest.raises(ValueError):
        geo3d._convex_planes([(0.0, 0.0), (10.0, 10.0)])
