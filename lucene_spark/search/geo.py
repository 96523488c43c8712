"""Geo queries — the LatLonPoint surface (SURVEY.md §2.4 geo row).

Reference semantics:
- LatLonPoint.newBoxQuery (core/document/LatLonBoundingBoxQuery role):
  docs whose point falls in a lat/lon rectangle. BKD pruning's job is
  done by Catalyst + parquet min/max stats over plain double columns —
  at 100 TB the table would be additionally laid out with a space-
  filling-curve sort key (e.g. z-order on (lat, lon)) so row groups
  prune tightly; the predicate itself stays a pair of range filters.
- LatLonPoint.newDistanceQuery (search/LatLonPointDistanceQuery role):
  docs within radius_m of a center, ranked by haversine distance. The
  reference prunes with the BKD tree and refines with exact haversine;
  here a cheap bounding-box pre-filter (the same prune geometry) feeds
  the exact haversine refinement, so the scan prunes identically.

The corpus has no coordinates, so `synthesize_geo` derives a
deterministic (lat, lon) per doc from md5 integers — reproducible in
ANSI SQL for the oracle (same pattern as pipeline/multimodal.py).


Covers-also note: core/document/LatLonDocValuesField.java's
newSlowBoxQuery / newSlowDistanceQuery (LatLonDocValuesBoxQuery.java,
LatLonDocValuesQuery.java) are per-document verification twins of the
point-index queries — in this engine every geo predicate already
evaluates per row over the stored lat/lon columns, so the "slow" DV
path and the indexed path are the SAME plan here, with the z-order
file prune (ensure_latlon_index) playing the points-index role when
present. LatLonPointSortField / XYPointSortField (distance sort) are
geo_nearest_topk's ordering; spatial-extras
vector/PointVectorStrategy.java + DistanceValueSource.java are the
same two-column design queried by box/distance and ranked by
distance.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

EARTH_RADIUS_KM = 6371.0088  # mean earth radius, the SloppyMath value


def synthesize_geo(docs: DataFrame) -> DataFrame:
    """-> (doc_id, lat, lon): deterministic pseudo-coordinates.
    lat in [-90, 90), lon in [-180, 180), 3 decimal places (exact in
    double, so both engines compare equal)."""
    key = F.col("doc_id").cast("string")
    h1 = F.conv(F.substring(F.md5(F.concat(key, F.lit("_lat"))), 1, 8), 16, 10).cast("long")
    h2 = F.conv(F.substring(F.md5(F.concat(key, F.lit("_lon"))), 1, 8), 16, 10).cast("long")
    return docs.select(
        "doc_id",
        ((h1 % 180000) / 1000.0 - 90.0).alias("lat"),
        ((h2 % 360000) / 1000.0 - 180.0).alias("lon"),
    )


def geo_box(
    docs: DataFrame,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    k: int = 50,
) -> DataFrame:
    """LatLonPoint.newBoxQuery: points inside the rectangle.
    -> (doc_id, lat_x1e3, lon_x1e3) ordered by doc_id."""
    g = synthesize_geo(docs)
    return (
        g.filter(
            (F.col("lat") >= min_lat) & (F.col("lat") <= max_lat)
            & (F.col("lon") >= min_lon) & (F.col("lon") <= max_lon)
        )
        .select(
            "doc_id",
            F.round(F.col("lat") * 1e3).cast("long").alias("lat_x1e3"),
            F.round(F.col("lon") * 1e3).cast("long").alias("lon_x1e3"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def _haversine_km(lat, lon, qlat: float, qlon: float):
    """Haversine distance column (SloppyMath.haversinMeters formula,
    exact double trig)."""
    rl1 = F.radians(F.lit(qlat))
    rl2 = F.radians(lat)
    dlat = F.radians(lat - qlat)
    dlon = F.radians(lon - qlon)
    a = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(rl1) * F.cos(rl2) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    return F.lit(2.0 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def geo_distance_topk(
    docs: DataFrame, qlat: float, qlon: float, radius_km: float, k: int = 20
) -> DataFrame:
    """LatLonPoint.newDistanceQuery + distance sort: docs within
    radius_km of (qlat, qlon), nearest first. A bounding-box pre-filter
    (partition/row-group prunable) wraps the exact haversine refine —
    the BKD prune-then-refine shape. Distance is emitted at 0.1 km
    granularity so double-trig ulp differences between engines cannot
    flip the rounded value. -> (doc_id, dist_x10km)."""
    g = synthesize_geo(docs)
    dlat = math.degrees(radius_km / EARTH_RADIUS_KM)
    # longitude shrinks with cos(lat); clamp for the pre-filter only
    coslat = max(0.01, math.cos(math.radians(abs(qlat) + dlat)))
    dlon = dlat / coslat
    lat_pred = (F.col("lat") >= qlat - dlat) & (F.col("lat") <= qlat + dlat)
    if dlon >= 180.0:
        # the box spans every longitude — lat band only
        lon_pred = F.lit(True)
    elif qlon - dlon < -180.0:
        # antimeridian wraparound west: split the range at the dateline
        # (LatLonPointDistanceQuery splits its box the same way)
        lon_pred = (F.col("lon") <= qlon + dlon) | (
            F.col("lon") >= qlon - dlon + 360.0
        )
    elif qlon + dlon > 180.0:
        # wraparound east
        lon_pred = (F.col("lon") >= qlon - dlon) | (
            F.col("lon") <= qlon + dlon - 360.0
        )
    else:
        lon_pred = (F.col("lon") >= qlon - dlon) & (F.col("lon") <= qlon + dlon)
    pre = g.filter(lat_pred & lon_pred)
    dist = _haversine_km(F.col("lat"), F.col("lon"), qlat, qlon)
    return (
        pre.withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= radius_km)
        .select(
            "doc_id", F.round(F.col("dist_km") * 10).cast("long").alias("dist_x10km")
        )
        .orderBy(F.col("dist_x10km").asc(), F.col("doc_id").asc())
        .limit(k)
    )


_GEO_SQL = """g AS (
  SELECT doc_id,
    CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'_lat'),1,8)) AS BIGINT) % 180000 / 1000.0 - 90.0 AS lat,
    CAST(('0x'||substr(md5(CAST(doc_id AS VARCHAR)||'_lon'),1,8)) AS BIGINT) % 360000 / 1000.0 - 180.0 AS lon
  FROM documents
)"""


def geo_box_sql(
    min_lat: float, max_lat: float, min_lon: float, max_lon: float, k: int = 50
) -> str:
    return f"""WITH {_GEO_SQL}
SELECT doc_id, CAST(ROUND(lat*1000) AS BIGINT) AS lat_x1e3,
       CAST(ROUND(lon*1000) AS BIGINT) AS lon_x1e3
FROM g
WHERE lat BETWEEN {min_lat} AND {max_lat}
  AND lon BETWEEN {min_lon} AND {max_lon}
ORDER BY doc_id LIMIT {k}"""


def geo_distance_sql(qlat: float, qlon: float, radius_km: float, k: int = 20) -> str:
    r = EARTH_RADIUS_KM
    return f"""WITH {_GEO_SQL},
d AS (
  SELECT doc_id,
    2 * {r} * asin(sqrt(
      sin(radians(lat - {qlat})/2) * sin(radians(lat - {qlat})/2)
      + cos(radians({qlat})) * cos(radians(lat))
        * sin(radians(lon - {qlon})/2) * sin(radians(lon - {qlon})/2)
    )) AS dist_km
  FROM g
)
SELECT doc_id, CAST(ROUND(dist_km * 10) AS BIGINT) AS dist_x10km
FROM d WHERE dist_km <= {radius_km}
ORDER BY dist_x10km ASC, doc_id ASC LIMIT {k}"""


def geo_polygon_topk(
    docs: DataFrame, vertices: list[tuple[float, float]], k: int = 50
) -> DataFrame:
    """LatLonPoint polygon query (core/document/LatLonPoint.java
    newPolygonQuery + geo/Polygon.java contains): docs whose synthesized
    point lies inside the (lat, lon) vertex ring, by even-odd ray
    casting. The polygon's bounding box runs first as a prunable column
    predicate (the LatLonShape/BKD prune-then-refine shape); the exact
    crossing test is a pure float64 JVM expression, mirrored verbatim
    by the DuckDB oracle so both engines agree bit-for-bit.
    -> (doc_id, lat_x1e3, lon_x1e3) ordered by doc_id."""
    g = synthesize_geo(docs)
    lats = [v[0] for v in vertices]
    lons = [v[1] for v in vertices]
    pre = (
        (F.col("lat") >= min(lats)) & (F.col("lat") <= max(lats))
        & (F.col("lon") >= min(lons)) & (F.col("lon") <= max(lons))
    )
    crossings = None
    n = len(vertices)
    for i in range(n):
        y1, x1 = vertices[i]
        y2, x2 = vertices[(i + 1) % n]
        c = F.when(
            ((F.lit(y1) > F.col("lat")) != (F.lit(y2) > F.col("lat")))
            & (
                F.col("lon")
                < (F.lit(x2) - F.lit(x1))
                * (F.col("lat") - F.lit(y1))
                / (F.lit(y2) - F.lit(y1))
                + F.lit(x1)
            ),
            F.lit(1),
        ).otherwise(F.lit(0))
        crossings = c if crossings is None else crossings + c
    return (
        g.filter(pre)
        .filter(crossings % 2 == 1)
        .select(
            "doc_id",
            F.round(F.col("lat") * 1e3).cast("long").alias("lat_x1e3"),
            F.round(F.col("lon") * 1e3).cast("long").alias("lon_x1e3"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def geo_distance_feature_topk(
    scored: DataFrame,
    docs: DataFrame,
    qlat: float,
    qlon: float,
    pivot_km: float,
    weight: float = 1.0,
    k: int = 10,
) -> DataFrame:
    """LatLonPoint.newDistanceFeatureQuery (core/document/
    LatLonPointDistanceFeatureQuery.java:241-243 `weight *
    (pivotDistance / (pivotDistance + distance))`) in its intended
    SHOULD-beside-a-MUST composition: ``scored`` is the BM25 MUST's
    (doc_id, score_x1e6) hit set; each hit gains
    `weight * pivot / (pivot + haversine_km(doc, origin))`.

    The haversine is quantized to 0.1 km BEFORE the saturation curve —
    the same granularity the geo gates use — so double-trig ulp
    differences between engines cannot flip the x1e6-rounded score.
    One broadcast-sized join against the synthesized geo columns, flat
    codegen boost, no shuffle beyond the MUST's own top-k.
    -> (doc_id, score_x1e6)."""
    g = synthesize_geo(docs)
    dist10 = F.round(
        _haversine_km(F.col("lat"), F.col("lon"), qlat, qlon) * 10
    ).cast("long")
    boost = (
        F.lit(float(weight)) * F.lit(float(pivot_km))
        / (F.lit(float(pivot_km)) + dist10 / F.lit(10.0))
    )
    total = F.col("score_x1e6") / 1e6 + boost
    return (
        scored.join(g, "doc_id")
        .select(
            "doc_id", F.round(total * 1e6).cast("long").alias("score_x1e6")
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def geo_distance_feature_sql(
    scored_ctes: str, qlat: float, qlon: float,
    pivot_km: float, weight: float = 1.0, k: int = 10,
) -> str:
    """DuckDB twin of geo_distance_feature_topk: identical haversine,
    identical 0.1 km quantization, identical saturation arithmetic.
    ``scored_ctes`` must end in a `scored(doc_id, score_x1e6)` CTE."""
    r = EARTH_RADIUS_KM
    return f"""{scored_ctes},
{_GEO_SQL},
dfd AS (
  SELECT doc_id, CAST(ROUND(2 * {r} * asin(sqrt(
      sin(radians(lat - {qlat})/2) * sin(radians(lat - {qlat})/2)
      + cos(radians({qlat})) * cos(radians(lat))
        * sin(radians(lon - {qlon})/2) * sin(radians(lon - {qlon})/2)
    )) * 10) AS BIGINT) AS dist10
  FROM g
)
SELECT s.doc_id,
  CAST(ROUND((s.score_x1e6/1000000.0
       + {weight} * {pivot_km} / ({pivot_km} + dfd.dist10/10.0))
       * 1000000) AS BIGINT) AS score_x1e6
FROM scored s JOIN dfd ON dfd.doc_id = s.doc_id
ORDER BY score_x1e6 DESC, s.doc_id ASC LIMIT {k}"""


def geo_polygon_sql(vertices: list[tuple[float, float]], k: int = 50) -> str:
    """DuckDB twin of geo_polygon_topk — identical crossing arithmetic."""
    terms = []
    n = len(vertices)
    for i in range(n):
        y1, x1 = vertices[i]
        y2, x2 = vertices[(i + 1) % n]
        terms.append(
            f"(CASE WHEN (({y1} > lat) <> ({y2} > lat)) AND "
            f"(lon < ({x2} - {x1}) * (lat - {y1}) / ({y2} - {y1}) + {x1}) "
            f"THEN 1 ELSE 0 END)"
        )
    lats = [v[0] for v in vertices]
    lons = [v[1] for v in vertices]
    return f"""WITH {_GEO_SQL}
SELECT doc_id, CAST(ROUND(lat*1000) AS BIGINT) AS lat_x1e3,
       CAST(ROUND(lon*1000) AS BIGINT) AS lon_x1e3
FROM g
WHERE lat BETWEEN {min(lats)} AND {max(lats)}
  AND lon BETWEEN {min(lons)} AND {max(lons)}
  AND ({' + '.join(terms)}) % 2 = 1
ORDER BY doc_id LIMIT {k}"""


def _sphere_box_lower_bound_km(
    qlat: float, qlon: float,
    lat_lo: float, lat_hi: float, lon_lo: float, lon_hi: float,
) -> float:
    """Admissible (never-overestimating) great-circle distance from a
    query point to a lat/lon rectangle, for best-first nearest-file
    pruning (the role of NearestNeighbor.java's cell distanceSortKey).
    Two independent true lower bounds, combined by max:

    - latitude gap: any geodesic into the box crosses the nearer
      bounding parallel, and great-circle distance >= R * |dlat|;
    - meridian cross-track: with qlon outside [lon_lo, lon_hi], the
      geodesic must cross one of the two edge-meridian great circles;
      point-to-great-circle distance = R * asin(|cos(lat) sin(dlon)|).
      (The naive "clamp the longitude" bound is NOT admissible on a
      sphere — near the poles the closest point on a meridian edge
      sits at a different latitude than the query's.)

    Looser than the reference's Rectangle machinery — admissibility is
    what correctness requires; looseness only admits extra candidate
    files."""
    lat_gap = max(0.0, lat_lo - qlat, qlat - lat_hi)
    b_lat = math.radians(lat_gap) * EARTH_RADIUS_KM
    if lon_lo <= qlon <= lon_hi:
        return b_lat
    b_lon = None
    for edge in (lon_lo, lon_hi):
        d = abs(qlon - edge) % 360.0
        d = min(d, 360.0 - d)
        ct = (
            math.asin(
                abs(math.cos(math.radians(qlat)) * math.sin(math.radians(d)))
            )
            * EARTH_RADIUS_KM
        )
        b_lon = ct if b_lon is None else min(b_lon, ct)
    return max(b_lat, b_lon)


def geo_nearest_topk(
    spark, index_path: str, qlat: float, qlon: float, k: int = 10,
    stats: dict | None = None,
) -> DataFrame:
    """LatLonPoint.nearest (core/document/LatLonPoint.java nearest +
    core/document/NearestNeighbor.java, surfaced as
    LatLonPointPrototypeQueries.nearest): the k globally closest
    indexed points, nearest first — no radius. Runs as a best-first
    traversal over the z-order latlon index's file manifest
    (points.bkd_nearest): seed files around the query give the k-th
    distance, then only files whose admissible spherical bound beats
    it are opened. Distance is emitted at 0.1 km granularity (the
    geo_distance_topk convention) with doc_id tiebreak, and the
    traversal widens its cut by one rounding quantum so the rounded
    top-k frontier is complete. -> (doc_id, dist_x10km)."""
    from lucene_spark.index.points import bkd_nearest

    def dist_of(df: DataFrame):
        return _haversine_km(F.col("lat"), F.col("lon"), qlat, qlon)

    def bound_of(row) -> float:
        return _sphere_box_lower_bound_km(
            qlat, qlon,
            row["lo_lat"], row["hi_lat"], row["lo_lon"], row["hi_lon"],
        )

    cand = bkd_nearest(
        spark, index_path, dist_of, bound_of, k, slack=0.1, stats=stats
    )
    return (
        cand.select(
            "doc_id",
            F.round(F.col("__dist") * 10).cast("long").alias("dist_x10km"),
        )
        .orderBy(F.col("dist_x10km").asc(), F.col("doc_id").asc())
        .limit(k)
    )


def geo_nearest_sql(qlat: float, qlon: float, k: int = 10) -> str:
    """DuckDB twin of geo_nearest_topk: full-scan haversine over the
    synthesized coordinates, same rounding and tiebreak (the oracle
    needs no index)."""
    r = EARTH_RADIUS_KM
    return f"""WITH {_GEO_SQL},
d AS (
  SELECT doc_id,
    2 * {r} * asin(sqrt(
      sin(radians(lat - {qlat})/2) * sin(radians(lat - {qlat})/2)
      + cos(radians({qlat})) * cos(radians(lat))
        * sin(radians(lon - {qlon})/2) * sin(radians(lon - {qlon})/2)
    )) AS dist_km
  FROM g
)
SELECT doc_id, CAST(ROUND(dist_km * 10) AS BIGINT) AS dist_x10km
FROM d ORDER BY dist_x10km ASC, doc_id ASC LIMIT {k}"""
