"""Tessellator (core/document/Tessellator.java role): ear-clipping
polygon -> triangles, area/coverage invariants, and the index-time
composition with the shapes.py relation machinery."""

import math
import random

import pytest

from lucene_spark.search.tessellator import (
    _signed_area,
    tessellate,
    tessellate_df,
)

SQUARE = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)]
CONCAVE = [(0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (5.0, 3.0), (0.0, 10.0)]
STAR = [
    (0.0, 5.0), (1.5, 1.5), (5.0, 0.0), (1.5, -1.5), (0.0, -5.0),
    (-1.5, -1.5), (-5.0, 0.0), (-1.5, 1.5),
]


def tri_area(t):
    (ax, ay), (bx, by), (cx, cy) = t
    return abs((bx - ax) * (cy - ay) - (by - ay) * (cx - ax)) / 2


def pt_in_tri(p, t):
    def orient(a, b, c):
        return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])

    os = [orient(t[i], t[(i + 1) % 3], p) for i in range(3)]
    return all(o >= 0 for o in os) or all(o <= 0 for o in os)


def pt_in_poly(p, poly):
    px, py = p
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


@pytest.mark.parametrize("poly", [SQUARE, CONCAVE, STAR])
def test_count_orientation_area(poly):
    tris = tessellate(poly)
    assert len(tris) == len(poly) - 2
    # every output triangle is CCW
    for (a, b, c) in tris:
        assert (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0]) > 0
    assert math.isclose(
        sum(tri_area(t) for t in tris), abs(_signed_area(poly)), rel_tol=1e-12
    )


@pytest.mark.parametrize("poly", [SQUARE, CONCAVE, STAR])
def test_coverage_equivalence(poly):
    """A sampled point is inside the polygon iff it is inside some
    output triangle (the property that makes per-triangle relation
    queries equal per-shape queries)."""
    tris = tessellate(poly)
    rng = random.Random(7)
    xs = [p[0] for p in poly]
    ys = [p[1] for p in poly]
    for _ in range(500):
        p = (
            rng.uniform(min(xs) - 1, max(xs) + 1),
            rng.uniform(min(ys) - 1, max(ys) + 1),
        )
        assert pt_in_poly(p, poly) == any(pt_in_tri(p, t) for t in tris)


def test_cw_input_normalized_and_closed_ring_accepted():
    cw = list(reversed(SQUARE))
    assert len(tessellate(cw)) == 2
    closed = SQUARE + [SQUARE[0]]
    assert len(tessellate(closed)) == 2


def test_degenerate_rejected():
    with pytest.raises(ValueError):
        tessellate([(0, 0), (1, 1)])
    with pytest.raises(ValueError):
        tessellate([(0, 0), (1, 1), (2, 2)])  # zero area


def test_tessellate_df_and_box_query_composition(spark):
    """Index-time path: polygons -> triangle rows -> box relation over
    the triangles; a doc matches INTERSECTS iff any of its triangles
    does, which equals the polygon-vs-box python replay."""
    from pyspark.sql import functions as F

    from lucene_spark.search.shapes import relation_expr

    rng = random.Random(3)
    polys = []
    for d in range(60):
        cx, cy = rng.uniform(-150, 150), rng.uniform(-60, 60)
        # star-shaped (hence simple) random polygon: evenly spaced
        # angles with sub-spacing jitter keep the center interior
        n = rng.randint(4, 9)
        angs = [
            (i + rng.uniform(-0.4, 0.4)) * 2 * math.pi / n for i in range(n)
        ]
        pts = [
            [cx + rng.uniform(2, 12) * math.cos(a),
             cy + rng.uniform(2, 12) * math.sin(a)]
            for a in angs
        ]
        polys.append((d, pts))
    pdf = spark.createDataFrame(
        polys, "doc_id long, polygon array<array<double>>"
    )
    tris = tessellate_df(pdf)
    assert tris.filter(F.col("tri_id") > 0).count() > 0  # multi-tri docs
    box = (-20.0, 40.0, -30.0, 50.0)
    got = set(
        r["doc_id"]
        for r in tris.filter(F.expr(relation_expr("intersects", *box)))
        .select("doc_id")
        .distinct()
        .collect()
    )

    def poly_box_intersects(poly, b):
        corners = [(b[2], b[0]), (b[2], b[1]), (b[3], b[1]), (b[3], b[0])]
        if any(
            b[2] <= x <= b[3] and b[0] <= y <= b[1] for x, y in poly
        ):
            return True
        if any(pt_in_poly(c, poly) for c in corners):
            return True

        def orient(a, bb, c):
            return (bb[0] - a[0]) * (c[1] - a[1]) - (bb[1] - a[1]) * (c[0] - a[0])

        def cross(p1, p2, q1, q2):
            return (
                orient(p1, p2, q1) * orient(p1, p2, q2) < 0
                and orient(q1, q2, p1) * orient(q1, q2, p2) < 0
            )

        pe = [(poly[i], poly[(i + 1) % len(poly)]) for i in range(len(poly))]
        be = [(corners[i], corners[(i + 1) % 4]) for i in range(4)]
        return any(cross(p1, p2, q1, q2) for p1, p2 in pe for q1, q2 in be)

    want = {
        d for d, poly in polys
        if poly_box_intersects([tuple(p) for p in poly], box)
    }
    assert got == want
