"""Cartesian XYPoint / XYShape queries — lucene_spark/search/xy.py.

Reference semantics: core/document/XYPointField.java (box / distance /
polygon over a flat plane) and XYShape.java newDistanceQuery
(triangle-vs-XYCircle relations, exact under the Euclidean metric).
Ground truth is a driver-side Python replay of the same geometry.
"""

import math

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def many_docs(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(3000), "text": ["x"] * 3000})
    )


@pytest.fixture(scope="module")
def pts(spark, many_docs):
    from lucene_spark.search.xy import synthesize_xy

    return {
        r["doc_id"]: (r["x"], r["y"])
        for r in synthesize_xy(many_docs).collect()
    }


def test_box_matches_brute_force(spark, many_docs, pts):
    from lucene_spark.search.xy import xy_box_topk

    got = [
        (r["doc_id"], r["x_x1e3"], r["y_x1e3"])
        for r in xy_box_topk(many_docs, 100.0, 300.0, 400.0, 600.0, k=10_000).collect()
    ]
    want = sorted(
        (d, round(x * 1000), round(y * 1000))
        for d, (x, y) in pts.items()
        if 100.0 <= x <= 300.0 and 400.0 <= y <= 600.0
    )
    assert got == want and len(got) > 10


def test_distance_matches_brute_force(spark, many_docs, pts):
    from lucene_spark.search.xy import xy_distance_topk

    got = [
        (r["dist_x1e3"], r["doc_id"])
        for r in xy_distance_topk(many_docs, 500.0, 500.0, 120.0, k=25).collect()
    ]
    want = sorted(
        (round(math.hypot(x - 500.0, y - 500.0) * 1000), d)
        for d, (x, y) in pts.items()
        if math.hypot(x - 500.0, y - 500.0) <= 120.0
    )[:25]
    assert got == want and len(got) == 25


def test_polygon_matches_raycast_replay(spark, many_docs, pts):
    from lucene_spark.search.xy import xy_polygon_topk

    # concave arrowhead
    poly = [(100.0, 100.0), (900.0, 200.0), (500.0, 500.0), (900.0, 800.0), (100.0, 900.0)]

    def inside(px, py):
        c = False
        n = len(poly)
        for i in range(n):
            x1, y1 = poly[i]
            x2, y2 = poly[(i + 1) % n]
            if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
                c = not c
        return c

    got = sorted(
        r["doc_id"] for r in xy_polygon_topk(many_docs, poly, k=10_000).collect()
    )
    want = sorted(d for d, (x, y) in pts.items() if inside(x, y))
    assert got == want and len(got) > 50


@pytest.fixture(scope="module")
def tris(spark, many_docs):
    from lucene_spark.search.shapes import synthesize_triangles

    df = synthesize_triangles(many_docs.limit(800))
    rows = {
        r["doc_id"]: [(r["ax"], r["ay"]), (r["bx"], r["by"]), (r["cx"], r["cy"])]
        for r in df.collect()
    }
    return df, rows


def _seg_d(p, a, b):
    ax, ay = a[0] - p[0], a[1] - p[1]
    bx, by = b[0] - p[0], b[1] - p[1]
    dx, dy = bx - ax, by - ay
    den = dx * dx + dy * dy
    if den == 0:
        return math.hypot(ax, ay)
    t = min(1.0, max(0.0, (-ax * dx - ay * dy) / den))
    return math.hypot(ax + t * dx, ay + t * dy)


def _in_tri_py(p, v):
    def orient(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    d1 = orient(v[0], v[1], p)
    d2 = orient(v[1], v[2], p)
    d3 = orient(v[2], v[0], p)
    has_neg = d1 < 0 or d2 < 0 or d3 < 0
    has_pos = d1 > 0 or d2 > 0 or d3 > 0
    return not (has_neg and has_pos)


def _circle_rel(rel, v, c, r):
    verts_in = [math.hypot(px - c[0], py - c[1]) <= r for px, py in v]
    center_in = _in_tri_py(c, v)
    edges = [(v[0], v[1]), (v[1], v[2]), (v[2], v[0])]
    edge_near = [_seg_d(c, a, b) <= r for a, b in edges]
    if rel == "within":
        return all(verts_in)
    if rel == "contains":
        return center_in and all(_seg_d(c, a, b) > r for a, b in edges)
    inter = any(verts_in) or center_in or any(edge_near)
    return inter if rel == "intersects" else not inter


@pytest.mark.parametrize("rel", ["intersects", "within", "contains", "disjoint"])
def test_shape_circle_relation_matches_replay(spark, tris, rel):
    from lucene_spark.search.xy import xyshape_circle_topk

    df, rows = tris
    # CONTAINS needs a circle small enough to fit inside a triangle
    c, r = (10.0, 20.0), (1.0 if rel == "contains" else 28.0)
    got = sorted(
        x["doc_id"]
        for x in xyshape_circle_topk(df, rel, c[0], c[1], r, k=10_000).collect()
    )
    want = sorted(d for d, v in rows.items() if _circle_rel(rel, v, c, r))
    assert got == want, rel
    assert len(want) > 0


def test_shape_circle_partition(spark, tris):
    # within ∪ crosses-boundary == intersects; disjoint is the complement
    from lucene_spark.search.xy import xyshape_circle_topk

    df, rows = tris
    ids = {
        rel: {
            x["doc_id"]
            for x in xyshape_circle_topk(df, rel, 10.0, 20.0, 28.0, k=10_000).collect()
        }
        for rel in ("intersects", "within", "contains", "disjoint")
    }
    assert ids["within"] <= ids["intersects"]
    assert ids["contains"] <= ids["intersects"]
    assert ids["disjoint"] == set(rows) - ids["intersects"]
