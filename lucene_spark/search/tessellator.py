"""Polygon -> triangle tessellation (core/document/Tessellator.java).

The reference implements Held's FIST-style ear clipping to turn every
indexed polygon into triangles before they enter the 7-dim BKD; this
is the same classic ear-clipping algorithm in plain numpy-free python
(runs per Arrow batch inside mapInPandas — geometry is inherently
per-row). Scope, documented: simple polygons without holes; the
reference additionally bridges holes into the outer ring before
clipping (Tessellator.java eliminateHoles), which this module does not
reproduce.

Output triangles are CCW-oriented; vertex order is deterministic
(lowest original vertex index first per ear), so both engines and
reruns produce the identical triangle set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _signed_area(poly: list[tuple[float, float]]) -> float:
    s = 0.0
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        s += x1 * y2 - x2 * y1
    return s / 2.0


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _point_in_tri(p, a, b, c) -> bool:
    d1 = _cross(a, b, p)
    d2 = _cross(b, c, p)
    d3 = _cross(c, a, p)
    has_neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
    has_pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
    return not (has_neg and has_pos)


def tessellate(
    polygon: list[tuple[float, float]],
) -> list[tuple[tuple[float, float], tuple[float, float], tuple[float, float]]]:
    """Simple polygon (first point NOT repeated at the end) -> n-2 CCW
    triangles by ear clipping. Raises on degenerate input the reference
    also rejects (fewer than 3 points, zero area)."""
    pts = [(float(x), float(y)) for x, y in polygon]
    if len(pts) >= 2 and pts[0] == pts[-1]:
        pts = pts[:-1]
    # drop exact consecutive duplicates (the reference's Tessellator
    # likewise coalesces coincident points)
    dedup = [p for i, p in enumerate(pts) if p != pts[i - 1]]
    pts = dedup
    if len(pts) < 3:
        raise ValueError("polygon needs at least 3 distinct points")
    area = _signed_area(pts)
    if area == 0.0:
        raise ValueError("zero-area polygon")
    if area < 0:  # normalize to CCW like the reference
        pts = pts[::-1]
    idx = list(range(len(pts)))
    out = []
    while len(idx) > 3:
        n = len(idx)
        # only reflex vertices can block an ear (standard FIST filter —
        # also what keeps epsilon-spikes from deadlocking the clip)
        reflex = {
            idx[k]
            for k in range(n)
            if _cross(pts[idx[(k - 1) % n]], pts[idx[k]], pts[idx[(k + 1) % n]]) < 0
        }
        clipped = False
        for k in range(n):
            i0, i1, i2 = idx[(k - 1) % n], idx[k], idx[(k + 1) % n]
            a, b, c = pts[i0], pts[i1], pts[i2]
            cr = _cross(a, b, c)
            if cr < 0:
                continue  # reflex — not an ear
            if cr == 0.0:
                # collinear ear: zero-area, clip without emitting
                idx.pop(k)
                clipped = True
                break
            if any(
                j in reflex and _point_in_tri(pts[j], a, b, c)
                for j in idx
                if j not in (i0, i1, i2)
            ):
                continue  # a reflex vertex inside — not an ear
            out.append((a, b, c))
            idx.pop(k)
            clipped = True
            break
        if not clipped:
            raise ValueError("not a simple polygon (no ear found)")
    a, b, c = (pts[i] for i in idx)
    if _cross(a, b, c) < 0:
        a, b, c = a, c, b
    if _cross(a, b, c) > 0:  # drop a zero-area remainder
        out.append((a, b, c))
    return out


def tessellate_df(polys: DataFrame) -> DataFrame:
    """(doc_id, polygon: array<array<double>> of [lon, lat] points) ->
    one row per triangle: (doc_id, tri_id, ax, ay, bx, by, cx, cy,
    min_lat, max_lat, min_lon, max_lon) — the LatLonShape.createIndexableFields
    output shape, compatible with shapes.py relation queries. Narrow
    mapInPandas (no shuffle); at 100 TB the triangle table is written
    once at index time and partitioned on the bbox columns."""
    import pandas as pd

    def run(it):
        for pdf in it:
            rows = []
            for doc_id, poly in zip(pdf["doc_id"], pdf["polygon"]):
                tris = tessellate([(p[0], p[1]) for p in poly])
                for t, (a, b, c) in enumerate(tris):
                    rows.append(
                        (
                            int(doc_id), t,
                            a[0], a[1], b[0], b[1], c[0], c[1],
                            min(a[1], b[1], c[1]), max(a[1], b[1], c[1]),
                            min(a[0], b[0], c[0]), max(a[0], b[0], c[0]),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "tri_id", "ax", "ay", "bx", "by", "cx", "cy",
                    "min_lat", "max_lat", "min_lon", "max_lon",
                ],
            )

    return polys.mapInPandas(
        run,
        schema=(
            "doc_id long, tri_id int, ax double, ay double, bx double,"
            " by double, cx double, cy double, min_lat double,"
            " max_lat double, min_lon double, max_lon double"
        ),
    )
