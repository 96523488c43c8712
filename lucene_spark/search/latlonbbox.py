"""LatLonBoundingBox (sandbox/document/LatLonBoundingBox.java): stored
geo bounding boxes (minLat, minLon, maxLat, maxLon) with the four
RangeFieldQuery relations — INTERSECTS / WITHIN / CONTAINS / CROSSES.

The reference stores each corner through the LatLonPoint encoding
(core/geo/GeoEncodingUtils.java): latitude quantized to 32 bits by
floor(lat * 2^32/180) (rounding toward -90), longitude by
floor(lon * 2^32/360), with the +90/+180 maxima nudged to nextDown
because they'd overflow ("the maximum possible value cannot be encoded
without overflow") — i.e. they encode to 2^31-1. Query bounds pass
through the SAME quantizer (LatLonBoundingBox.encode is used for both
the field and newRangeQuery), so relations compare on the quantized
integer grid — carried exactly here, with the encode expression being
ONE shared SQL string so Spark and the oracle evaluate identical
float ops. Documented limitations kept: no dateline wrapping
(minLon > maxLon raises), no pole crossing (minLat > maxLat raises).

Scale shape: the relation predicate is a flat conjunction of integer
comparisons over four encoded columns (rangefield.range_relation_expr)
— whole-stage codegen, pushable to the scan; indexing through the
Z-order points sink (write_range_index) adds the file-manifest prune
exactly like the generic RangeField path.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from lucene_spark.search.rangefield import range_relation_expr

LAT_SCALE = (1 << 32) / 180.0
LON_SCALE = (1 << 32) / 360.0
_MAX_ENC = 2147483647  # encode(nextDown(90 deg)) / encode(nextDown(180 deg))


def check_args(min_lat: float, min_lon: float,
               max_lat: float, max_lon: float) -> None:
    """LatLonBoundingBox.checkArgs: dateline and pole crossing are not
    supported."""
    if min_lon > max_lon:
        raise ValueError(
            f"cannot have minLon [{min_lon}] exceed maxLon [{max_lon}].")
    if min_lat > max_lat:
        raise ValueError(
            f"cannot have minLat [{min_lat}] exceed maxLat [{max_lat}].")
    if not (-90.0 <= min_lat <= 90.0 and -90.0 <= max_lat <= 90.0):
        raise ValueError("latitude out of bounds")
    if not (-180.0 <= min_lon <= 180.0 and -180.0 <= max_lon <= 180.0):
        raise ValueError("longitude out of bounds")


def encode_latitude(lat: float) -> int:
    """GeoEncodingUtils.encodeLatitude (floor toward -90; 90 -> 2^31-1)."""
    if lat == 90.0:
        return _MAX_ENC
    return int(math.floor(lat * LAT_SCALE))


def encode_longitude(lon: float) -> int:
    """GeoEncodingUtils.encodeLongitude (floor toward -180; 180 -> 2^31-1)."""
    if lon == 180.0:
        return _MAX_ENC
    return int(math.floor(lon * LON_SCALE))


def encode_lat_sql(e: str) -> str:
    """The encodeLatitude formula as ANSI SQL, shared by both engines."""
    return (f"(CASE WHEN ({e}) = 90.0 THEN {_MAX_ENC} "
            f"ELSE CAST(FLOOR(({e}) * {LAT_SCALE!r}) AS BIGINT) END)")


def encode_lon_sql(e: str) -> str:
    return (f"(CASE WHEN ({e}) = 180.0 THEN {_MAX_ENC} "
            f"ELSE CAST(FLOOR(({e}) * {LON_SCALE!r}) AS BIGINT) END)")


# ---- deterministic stored boxes over the synthesized coordinates ----
# (the corpus has no boxes; the southwest corner is geo.synthesize_geo's
# point, spans derive from doc_id, maxima clip at the poles/dateline)

_SPAN_LAT = "(1 + doc_id % 13)"
_SPAN_LON = "(1 + doc_id % 29)"


def synthesize_boxes(docs: DataFrame) -> DataFrame:
    """-> (doc_id, min_lat, min_lon, max_lat, max_lon)."""
    from lucene_spark.search.geo import synthesize_geo

    g = synthesize_geo(docs)
    return g.select(
        "doc_id",
        F.col("lat").alias("min_lat"),
        F.col("lon").alias("min_lon"),
        F.least(F.lit(90.0), F.col("lat") + F.expr(_SPAN_LAT)).alias("max_lat"),
        F.least(F.lit(180.0), F.col("lon") + F.expr(_SPAN_LON)).alias("max_lon"),
    )


def boxes_sql() -> str:
    """DuckDB CTE twin of synthesize_boxes, named ``bx``."""
    from lucene_spark.search.geo import _GEO_SQL

    return f"""{_GEO_SQL},
bx AS (
  SELECT doc_id, lat AS min_lat, lon AS min_lon,
    LEAST(90.0, lat + {_SPAN_LAT}) AS max_lat,
    LEAST(180.0, lon + {_SPAN_LON}) AS max_lon
  FROM g
)"""


def _encoded(boxes: DataFrame) -> DataFrame:
    return boxes.select(
        "doc_id",
        F.expr(encode_lat_sql("min_lat")).alias("elat_min"),
        F.expr(encode_lat_sql("max_lat")).alias("elat_max"),
        F.expr(encode_lon_sql("min_lon")).alias("elon_min"),
        F.expr(encode_lon_sql("max_lon")).alias("elon_max"),
    )


def bbox_query_topk(
    boxes: DataFrame,
    relation: str,
    min_lat: float,
    min_lon: float,
    max_lat: float,
    max_lon: float,
    k: int = 50,
) -> DataFrame:
    """new{Intersects,Within,Contains,Crosses}Query over stored boxes:
    both sides quantized with the shared encoder, then the generic
    RangeFieldQuery relation algebra on the integer grid.
    -> (doc_id, elat_min, elon_min) ordered by doc_id."""
    check_args(min_lat, min_lon, max_lat, max_lon)
    q = [
        (encode_latitude(min_lat), encode_latitude(max_lat)),
        (encode_longitude(min_lon), encode_longitude(max_lon)),
    ]
    enc = _encoded(boxes)
    pred = range_relation_expr(
        [("elat_min", "elat_max"), ("elon_min", "elon_max")], q, relation
    )
    return (
        enc.filter(pred)
        .select("doc_id", "elat_min", "elon_min")
        .orderBy("doc_id")
        .limit(k)
    )


def bbox_query_sql(
    relation: str,
    min_lat: float,
    min_lon: float,
    max_lat: float,
    max_lon: float,
    k: int = 50,
) -> str:
    """DuckDB twin: same synth, same shared encode SQL, same relation
    algebra (crosses = intersects AND NOT within)."""
    check_args(min_lat, min_lon, max_lat, max_lon)
    qlat = (encode_latitude(min_lat), encode_latitude(max_lat))
    qlon = (encode_longitude(min_lon), encode_longitude(max_lon))
    dims = [
        (encode_lat_sql("min_lat"), encode_lat_sql("max_lat"), qlat),
        (encode_lon_sql("min_lon"), encode_lon_sql("max_lon"), qlon),
    ]

    def conj(rel: str) -> str:
        parts = []
        for smin, smax, (qlo, qhi) in dims:
            if rel == "intersects":
                parts.append(f"({smin} <= {qhi} AND {smax} >= {qlo})")
            elif rel == "within":
                parts.append(f"({smin} >= {qlo} AND {smax} <= {qhi})")
            elif rel == "contains":
                parts.append(f"({smin} <= {qlo} AND {smax} >= {qhi})")
        return " AND ".join(parts)

    if relation == "crosses":
        pred = f"({conj('intersects')}) AND NOT ({conj('within')})"
    else:
        pred = conj(relation)
    return f"""WITH {boxes_sql()}
SELECT doc_id,
  {encode_lat_sql("min_lat")} AS elat_min,
  {encode_lon_sql("min_lon")} AS elon_min
FROM bx WHERE {pred}
ORDER BY doc_id LIMIT {k}"""
