"""Geo query tests — in particular the antimeridian wraparound fix
(ADVICE r02): the bounding-box prefilter must not drop in-radius docs on
the far side of the dateline."""

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def many_docs(spark):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(4000), "text": ["x"] * 4000})
    )


def _truth(spark, docs, qlat, qlon, radius_km, k):
    """Ground truth: full haversine scan, NO prefilter."""
    from pyspark.sql import functions as F

    from lucene_spark.search.geo import _haversine_km, synthesize_geo

    g = synthesize_geo(docs)
    dist = _haversine_km(F.col("lat"), F.col("lon"), qlat, qlon)
    return (
        g.withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= radius_km)
        .select(
            "doc_id",
            F.round(F.col("dist_km") * 10).cast("long").alias("dist_x10km"),
        )
        .orderBy(F.col("dist_x10km").asc(), F.col("doc_id").asc())
        .limit(k)
        .collect()
    )


@pytest.mark.parametrize(
    "qlat,qlon,radius",
    [
        (0.0, 179.7, 800.0),    # east wrap
        (10.0, -179.8, 800.0),  # west wrap
        (0.0, 0.0, 800.0),      # no wrap (regression)
        (89.0, 0.0, 500.0),     # pole: dlon blows past 180 -> lat band
    ],
)
def test_distance_query_matches_unfiltered_scan(
    spark, many_docs, qlat, qlon, radius
):
    from lucene_spark.search.geo import geo_distance_topk

    got = geo_distance_topk(many_docs, qlat, qlon, radius, k=50).collect()
    want = _truth(spark, many_docs, qlat, qlon, radius, k=50)
    assert [(r["doc_id"], r["dist_x10km"]) for r in got] == [
        (r["doc_id"], r["dist_x10km"]) for r in want
    ]
    if abs(qlon) > 179.0:
        # the wraparound case must actually see docs on BOTH sides
        from lucene_spark.search.geo import synthesize_geo

        hit_ids = [r["doc_id"] for r in got]
        lons = {
            r["lon"] > 0
            for r in synthesize_geo(many_docs)
            .filter(f"doc_id IN ({','.join(map(str, hit_ids))})")
            .select("lon")
            .collect()
        }
        assert lons == {True, False}, "hits must straddle the dateline"


def test_polygon_query_matches_reference_raycast(spark, many_docs):
    """Even-odd ray casting vs an independent pure-python point-in-
    polygon implementation, on a CONCAVE ring."""
    from lucene_spark.search.geo import geo_polygon_topk, synthesize_geo

    poly = [(-10.0, -50.0), (40.0, -40.0), (5.0, 0.0), (45.0, 40.0),
            (-25.0, 30.0)]  # concave (the third vertex dents inward)

    def inside(py, px):
        n = len(poly)
        c = False
        for i in range(n):
            y1, x1 = poly[i]
            y2, x2 = poly[(i + 1) % n]
            if ((y1 > py) != (y2 > py)) and (
                px < (x2 - x1) * (py - y1) / (y2 - y1) + x1
            ):
                c = not c
        return c

    got = sorted(
        r["doc_id"]
        for r in geo_polygon_topk(many_docs, poly, k=100000).collect()
    )
    pts = {
        r["doc_id"]: (r["lat"], r["lon"])
        for r in synthesize_geo(many_docs).collect()
    }
    want = sorted(d for d, (la, lo) in pts.items() if inside(la, lo))
    assert got == want
    assert len(got) > 5  # the ring actually contains docs


@pytest.mark.parametrize(
    "qlat,qlon",
    [
        (48.85, 2.35),    # mid-latitude
        (88.5, 10.0),     # near-pole: naive lon-clamp bounds are
                          # inadmissible here; the cross-track bound must
                          # keep pruning sound
        (0.0, 179.9),     # dateline
    ],
)
def test_nearest_matches_full_scan(spark, many_docs, tmp_path_factory, qlat, qlon):
    """LatLonPoint.nearest parity: the best-first file traversal must
    return exactly the full-scan haversine top-k (same rounding, same
    doc_id tiebreak) while opening fewer files than the manifest holds."""
    from lucene_spark.index.points import bkd_write
    from lucene_spark.search.geo import geo_nearest_topk, synthesize_geo

    path = str(tmp_path_factory.mktemp("latlon") / f"idx_{qlat}_{qlon}")
    bkd_write(synthesize_geo(many_docs), ["lat", "lon"], path, num_files=16)
    stats = {}
    got = [
        (r["dist_x10km"], r["doc_id"])
        for r in geo_nearest_topk(
            spark, path, qlat, qlon, k=20, stats=stats
        ).collect()
    ]
    want = [
        (r["dist_x10km"], r["doc_id"])
        for r in _truth(spark, many_docs, qlat, qlon, radius_km=1e9, k=20)
    ]
    assert got == want
    assert stats["files_scanned"] <= stats["files_total"]
    if (qlat, qlon) == (48.85, 2.35):
        # mid-latitude, well clear of every wrap: the coarse 16-file
        # layout must actually prune (the edge cases above only have
        # to stay CORRECT — at 16 files per globe their k-th-distance
        # radius legitimately reaches every bbox)
        assert stats["files_scanned"] < stats["files_total"]
