"""spatial-extras query surface: SpatialOperation / SpatialArgs /
SpatialArgsParser + the BBox strategy's overlap-ratio ranking.

Reference contracts:
- spatial-extras/src/java/org/apache/lucene/spatial/query/
  SpatialOperation.java — the 8 named predicates (BBoxIntersects,
  BBoxWithin, Contains, Intersects, Equals, Disjoint, Within, Overlaps)
  with their alias registry (BBoxCoveredBy, Covers, IsEqualTo,
  IsDisjointTo, IsWithin, CoveredBy; lookup is case-insensitive).
- query/SpatialArgs.java + SpatialArgsParser.java — the
  ``Operation(shape [key=value ...])`` string form with distErrPct /
  distErr options.
- bbox/BBoxStrategy.java + bbox/BBoxOverlapRatioValueSource.java +
  BBoxSimilarityValueSource.java — stored per-doc rectangles queried by
  relation and RANKED by the overlap-ratio score
  queryRatio * prop + targetRatio * (1 - prop).

Execution model: stored boxes are four plain double columns
(latlonbbox.synthesize_boxes supplies the deterministic fixture), each
operation is a flat conjunction of comparisons — whole-stage codegen,
pushable to the parquet scan — and the overlap-ratio score is ONE
shared SQL expression string evaluated identically by Spark and the
DuckDB oracle.  Indexed shapes here ARE rectangles (the BBoxStrategy
field type), so BBoxIntersects == Intersects and BBoxWithin == Within
(SpatialOperation.java evaluates those through
indexedShape.getBoundingBox(), the identity on a rectangle).

Dateline-crossing boxes are not representable in this store
(latlonbbox.check_args raises), so the overlap-ratio width calculation
keeps only the both-non-crossing branch of
BBoxOverlapRatioValueSource.java:73-115; the both-adjacent-to-±180
special case cannot arise for the same reason.

At 100 TB: relation filters and the ratio projection are narrow
map-side work; the only exchange is the final TakeOrderedAndProject.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

# ---------------------------------------------------------------------------
# SpatialOperation registry (SpatialOperation.java: register() puts the
# name and its upper-case form; aliases point at the same op)
# ---------------------------------------------------------------------------

_CANONICAL = (
    "BBoxIntersects",
    "BBoxWithin",
    "Contains",
    "Intersects",
    "Equals",
    "Disjoint",
    "Within",
    "Overlaps",
)

_ALIASES = {
    "BBoxCoveredBy": "BBoxWithin",
    "Covers": "Contains",
    "IsEqualTo": "Equals",
    "IsDisjointTo": "Disjoint",
    "IsWithin": "Within",
    "CoveredBy": "Within",
}

_REGISTRY: dict[str, str] = {}
for _n in _CANONICAL:
    _REGISTRY[_n.upper()] = _n
for _a, _c in _ALIASES.items():
    _REGISTRY[_a.upper()] = _c


def get_operation(name: str) -> str:
    """SpatialOperation.get: case-insensitive, alias-aware; raises on
    unknown names exactly like the reference."""
    op = _REGISTRY.get(name.strip().upper())
    if op is None:
        raise ValueError(f"Unknown Operation: {name}")
    return op


# ---------------------------------------------------------------------------
# Shapes (the WKT subset the fixture needs: ENVELOPE + POINT)
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Rect:
    """A spatial4j Rectangle in degrees (no dateline crossing)."""

    min_x: float
    max_x: float
    min_y: float
    max_y: float

    def __post_init__(self):
        if self.min_x > self.max_x or self.min_y > self.max_y:
            raise ValueError(f"malformed rectangle {self}")

    @property
    def width(self) -> float:
        return self.max_x - self.min_x

    @property
    def height(self) -> float:
        return self.max_y - self.min_y


def parse_shape(body: str) -> Rect:
    """The spatial4j WKT subset: ``ENVELOPE(minX, maxX, maxY, minY)``
    (note the spatial4j argument order) and ``POINT(x y)`` (a
    degenerate rectangle)."""
    s = body.strip()
    up = s.upper()
    if up.startswith("ENVELOPE"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        parts = [float(p.strip()) for p in inner.split(",")]
        if len(parts) != 4:
            raise ValueError(f"ENVELOPE needs 4 values: {body}")
        min_x, max_x, max_y, min_y = parts
        return Rect(min_x, max_x, min_y, max_y)
    if up.startswith("POINT"):
        inner = s[s.index("(") + 1 : s.rindex(")")]
        xy = [float(p) for p in inner.replace(",", " ").split()]
        if len(xy) != 2:
            raise ValueError(f"POINT needs 2 values: {body}")
        return Rect(xy[0], xy[0], xy[1], xy[1])
    raise ValueError(f"unsupported shape: {body}")


# ---------------------------------------------------------------------------
# SpatialArgs + parser
# ---------------------------------------------------------------------------


@dataclass
class SpatialArgs:
    """query/SpatialArgs.java: operation + shape + optional accuracy
    knobs.  validate() enforces the reference's mutual exclusion."""

    operation: str
    shape: Rect
    dist_err_pct: float | None = None
    dist_err: float | None = None

    def validate(self) -> None:
        if self.dist_err is not None and self.dist_err_pct is not None:
            raise ValueError(
                "Only distErr or distErrPct can be specified."
            )

    def resolve_dist_err(self, default_dist_err_pct: float = 0.025) -> float:
        """SpatialArgs.resolveDistErr + calcDistanceFromErrPct
        (SpatialArgs.java:91-118): an explicit distErr wins; otherwise
        the allowed error is distErrPct times the distance from the
        shape's bbox center to its nearer-the-equator corner (the
        "closest corner for greater precision" rule), haversine
        metric.  distErrPct outside [0, 0.5] raises; points and pct 0
        resolve to 0."""
        if self.dist_err is not None:
            return self.dist_err
        pct = (
            self.dist_err_pct
            if self.dist_err_pct is not None
            else default_dist_err_pct
        )
        return calc_distance_from_err_pct(self.shape, pct)

    def __str__(self) -> str:
        # SpatialArgsParser.writeSpatialArgs
        out = f"{self.operation}({self.shape}"
        if self.dist_err_pct is not None:
            out += f" distErrPct={self.dist_err_pct * 100:.2f}%"
        if self.dist_err is not None:
            out += f" distErr={self.dist_err}"
        return out + ")"


def parse_spatial_args(v: str) -> SpatialArgs:
    """SpatialArgsParser.parse: ``Operation(shapeWKT [k=v ...])``.
    Unknown trailing parameters raise (SpatialArgsParser.java:66-69:
    "unused parameters"), missing parens / empty body raise with the
    reference's messages."""
    idx = v.find("(")
    edx = v.rfind(")")
    if idx < 0 or idx > edx:
        raise ValueError(f"missing parens: {v}")
    op = get_operation(v[:idx])
    body = v[idx + 1 : edx].strip()
    if not body:
        raise ValueError(f"missing body : {v}")
    # the shape may itself contain parens (ENVELOPE(...)); options
    # follow the shape's closing paren inside the outer parens
    if body.upper().startswith(("ENVELOPE", "POINT")):
        close = body.index(")")
        shape_str, opts_str = body[: close + 1], body[close + 1 :].strip()
    else:
        shape_str, opts_str = body, ""
    shape = parse_shape(shape_str)
    args = SpatialArgs(op, shape)
    if opts_str:
        opts: dict[str, str] = {}
        for tok in opts_str.split():
            if "=" in tok:
                k, _, val = tok.partition("=")
                opts[k] = val
            else:
                opts[tok] = tok
        if "distErrPct" in opts:
            args.dist_err_pct = float(opts.pop("distErrPct"))
        if "distErr" in opts:
            args.dist_err = float(opts.pop("distErr"))
        if opts:
            raise ValueError(f"unused parameters: {opts}")
    args.validate()
    return args


# ---------------------------------------------------------------------------
# Operation predicates over stored boxes (degrees, closed intervals —
# the boundary-neutral OGC-ish semantics the javadoc describes)
# ---------------------------------------------------------------------------


def _intersects_sql(q: Rect) -> str:
    return (
        f"(min_lon <= {q.max_x!r} AND max_lon >= {q.min_x!r}"
        f" AND min_lat <= {q.max_y!r} AND max_lat >= {q.min_y!r})"
    )


def _within_sql(q: Rect) -> str:
    return (
        f"(min_lon >= {q.min_x!r} AND max_lon <= {q.max_x!r}"
        f" AND min_lat >= {q.min_y!r} AND max_lat <= {q.max_y!r})"
    )


def _contains_sql(q: Rect) -> str:
    return (
        f"(min_lon <= {q.min_x!r} AND max_lon >= {q.max_x!r}"
        f" AND min_lat <= {q.min_y!r} AND max_lat >= {q.max_y!r})"
    )


def _equals_sql(q: Rect) -> str:
    return (
        f"(min_lon = {q.min_x!r} AND max_lon = {q.max_x!r}"
        f" AND min_lat = {q.min_y!r} AND max_lat = {q.max_y!r})"
    )


def operation_predicate_sql(operation: str, q: Rect) -> str:
    """evaluate(indexedShape, queryShape) as one SQL boolean over the
    stored-box columns (min_lat/min_lon/max_lat/max_lon).  Indexed
    shapes are rectangles, so the two BBox* forms coincide with their
    plain twins (SpatialOperation.java:35-47 applies getBoundingBox()
    first — the identity here).  Within/Contains use closed intervals,
    which subsumes the reference's explicit ``|| equals`` arms;
    Overlaps is the strict INTERSECTS classification (not contains,
    within, or disjoint — SpatialOperation.java:118-126)."""
    op = get_operation(operation)
    if op in ("Intersects", "BBoxIntersects"):
        return _intersects_sql(q)
    if op in ("Within", "BBoxWithin"):
        return _within_sql(q)
    if op == "Contains":
        return _contains_sql(q)
    if op == "Equals":
        return _equals_sql(q)
    if op == "Disjoint":
        return f"(NOT {_intersects_sql(q)})"
    if op == "Overlaps":
        return (
            f"({_intersects_sql(q)} AND NOT {_within_sql(q)}"
            f" AND NOT {_contains_sql(q)})"
        )
    raise ValueError(f"unhandled operation {op}")


def spatial_query_topk(
    boxes: DataFrame, args: str | SpatialArgs, k: int = 50
) -> DataFrame:
    """Parse-and-execute (the SpatialArgsParser -> strategy.makeQuery
    flow): boxes matching the operation, first k by doc_id.
    -> (doc_id, min_lat, min_lon)."""
    a = parse_spatial_args(args) if isinstance(args, str) else args
    pred = operation_predicate_sql(a.operation, a.shape)
    return (
        boxes.filter(F.expr(pred))
        .select(
            "doc_id",
            F.expr(_X1E3("min_lat")).alias("lat_x1e3"),
            F.expr(_X1E3("min_lon")).alias("lon_x1e3"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def _X1E3(e: str) -> str:
    return f"CAST(ROUND(({e}) * 1000) AS BIGINT)"


def spatial_query_sql(args: str | SpatialArgs, k: int = 50) -> str:
    """DuckDB twin over the shared ``bx`` CTE."""
    from lucene_spark.search.latlonbbox import boxes_sql

    a = parse_spatial_args(args) if isinstance(args, str) else args
    pred = operation_predicate_sql(a.operation, a.shape)
    return f"""WITH {boxes_sql()}
SELECT doc_id, {_X1E3('min_lat')} AS lat_x1e3, {_X1E3('min_lon')} AS lon_x1e3
FROM bx WHERE {pred} ORDER BY doc_id LIMIT {k}"""


# ---------------------------------------------------------------------------
# BBoxOverlapRatioValueSource ranking
# ---------------------------------------------------------------------------


def _overlap_ratio_score_sql(
    q: Rect, query_target_proportion: float, min_side_length: float
) -> str:
    """BBoxOverlapRatioValueSource.score (bbox/
    BBoxOverlapRatioValueSource.java:95-150) as one SQL expression:
    queryRatio * prop + targetRatio * (1 - prop), with
    calcArea(w, h) = max(minSideLength, w) * max(minSideLength, h)
    (BBoxOverlapRatioValueSource.java:268-270) and the degenerate
    line/point ladders for both ratios.  NULL means no intersection
    (the reference scores those 0 via Explanation.noMatch)."""
    if not (0.0 <= query_target_proportion <= 1.0):
        raise ValueError("queryTargetProportion must be >= 0 and <= 1")
    msl = float(min_side_length)
    prop = float(query_target_proportion)
    h = f"(LEAST({q.max_y!r}, max_lat) - GREATEST({q.min_y!r}, min_lat))"
    left = f"GREATEST({q.min_x!r}, min_lon)"
    right = f"LEAST({q.max_x!r}, max_lon)"
    w = f"({right} - {left})"
    ia = f"(GREATEST({msl!r}, {w}) * GREATEST({msl!r}, {h}))"
    # query side is a literal: resolve its ratio form in Python
    q_area = max(msl, q.width) * max(msl, q.height)
    if q_area > 0:
        qr = f"({ia} / {q_area!r})"
    elif q.height > 0:
        qr = f"({h} / {q.height!r})"
    elif q.width > 0:
        qr = f"({w} / {q.width!r})"
    else:
        qr = "1.0"  # a point query intersecting the target
    t_w = "(max_lon - min_lon)"
    t_h = "(max_lat - min_lat)"
    t_area = f"(GREATEST({msl!r}, {t_w}) * GREATEST({msl!r}, {t_h}))"
    tr = (
        f"(CASE WHEN {t_area} > 0 THEN {ia} / {t_area}"
        f" WHEN {t_h} > 0 THEN {h} / {t_h}"
        f" WHEN {t_w} > 0 THEN {w} / {t_w}"
        f" ELSE 1.0 END)"
    )
    return (
        f"(CASE WHEN {h} >= 0 AND {left} <= {right}"
        f" THEN {qr} * {prop!r} + {tr} * {1.0 - prop!r}"
        f" ELSE NULL END)"
    )


def bbox_overlap_ratio_topk(
    boxes: DataFrame,
    q: Rect,
    query_target_proportion: float = 0.25,
    min_side_length: float = 0.0,
    k: int = 20,
) -> DataFrame:
    """Boxes ranked by the overlap-ratio score.  Non-intersecting
    boxes score 0 (BBoxOverlapRatioValueSource.score returns 0 for
    them, spatial-extras bbox/BBoxOverlapRatioValueSource.java:155),
    so when fewer than k docs intersect the query box the remainder
    still rank at 0 — same as the reference.
    -> (doc_id, score_x1e6), (score DESC, doc_id ASC)."""
    score = _overlap_ratio_score_sql(
        q, query_target_proportion, min_side_length
    )
    return (
        boxes.select(
            "doc_id",
            F.coalesce(
                F.round(F.expr(score) * 1e6).cast("long"), F.lit(0)
            ).alias("score_x1e6"),
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def bbox_overlap_ratio_sql(
    q: Rect,
    query_target_proportion: float = 0.25,
    min_side_length: float = 0.0,
    k: int = 20,
) -> str:
    from lucene_spark.search.latlonbbox import boxes_sql

    score = _overlap_ratio_score_sql(
        q, query_target_proportion, min_side_length
    )
    return f"""WITH {boxes_sql()}
SELECT doc_id, score_x1e6 FROM (
  SELECT doc_id,
    COALESCE(CAST(ROUND({score} * 1000000) AS BIGINT), 0) AS score_x1e6
  FROM bx
)
ORDER BY score_x1e6 DESC, doc_id ASC LIMIT {k}"""


# ---------------------------------------------------------------------------
# Shape value sources (spatial-extras util/ShapeAreaValueSource.java,
# util/DistanceToShapeValueSource.java) over the stored boxes
# ---------------------------------------------------------------------------

from lucene_spark.search.geo import EARTH_RADIUS_KM as _EARTH_R_KM  # noqa: E402


def shape_area_topk(
    boxes: DataFrame, geodetic: bool = False, k: int = 20
) -> DataFrame:
    """ShapeAreaValueSource (spatial-extras util/ShapeAreaValueSource
    .java): rank documents by their shape's area.  geodetic=False is
    the flat width*height degree^2 area (the non-geo SpatialContext
    form); geodetic=True is the spherical zone area of a lat-lon rect,
    R^2 * dLonRadians * (sin(maxLat) - sin(minLat)) km^2 — the
    standard spherical-excess formula spatial4j's GeoSurface area
    implements.  -> (doc_id, area_x1e3), (area DESC, doc_id ASC)."""
    if geodetic:
        area = (
            F.lit(_EARTH_R_KM * _EARTH_R_KM)
            * F.radians(F.col("max_lon") - F.col("min_lon"))
            * (
                F.sin(F.radians(F.col("max_lat")))
                - F.sin(F.radians(F.col("min_lat")))
            )
        )
    else:
        area = (F.col("max_lon") - F.col("min_lon")) * (
            F.col("max_lat") - F.col("min_lat")
        )
    return (
        boxes.select(
            "doc_id",
            F.round(area * 1e3).cast("long").alias("area_x1e3"),
        )
        .orderBy(F.col("area_x1e3").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def shape_area_sql(geodetic: bool = False, k: int = 20) -> str:
    from lucene_spark.search.latlonbbox import boxes_sql

    if geodetic:
        area = (
            f"{_EARTH_R_KM * _EARTH_R_KM!r}"
            " * radians(max_lon - min_lon)"
            " * (sin(radians(max_lat)) - sin(radians(min_lat)))"
        )
    else:
        area = "(max_lon - min_lon) * (max_lat - min_lat)"
    return f"""WITH {boxes_sql()}
SELECT doc_id, CAST(ROUND(({area}) * 1000) AS BIGINT) AS area_x1e3
FROM bx ORDER BY area_x1e3 DESC, doc_id ASC LIMIT {k}"""


def distance_to_shape_topk(
    boxes: DataFrame, qlat: float, qlon: float, k: int = 20
) -> DataFrame:
    """DistanceToShapeValueSource (spatial-extras util/
    DistanceToShapeValueSource.java): the distance from the query
    point to each document's shape — 0 when the point is inside; else
    the haversine distance to the box's nearest point (the clamp of
    the query point into the box, exact for non-dateline rectangles).
    -> (doc_id, dist_x10km), (dist ASC, doc_id ASC)."""
    from lucene_spark.search.geo import _haversine_km

    nlat = F.greatest(
        F.col("min_lat"), F.least(F.col("max_lat"), F.lit(float(qlat)))
    )
    nlon = F.greatest(
        F.col("min_lon"), F.least(F.col("max_lon"), F.lit(float(qlon)))
    )
    dist = _haversine_km(nlat, nlon, float(qlat), float(qlon))
    return (
        boxes.select(
            "doc_id",
            F.round(dist * 10).cast("long").alias("dist_x10km"),
        )
        .orderBy(F.col("dist_x10km").asc(), F.col("doc_id").asc())
        .limit(k)
    )


def distance_to_shape_sql(qlat: float, qlon: float, k: int = 20) -> str:
    from lucene_spark.search.latlonbbox import boxes_sql

    r = _EARTH_R_KM
    return f"""WITH {boxes_sql()},
n AS (
  SELECT doc_id,
    GREATEST(min_lat, LEAST(max_lat, {qlat!r})) AS nlat,
    GREATEST(min_lon, LEAST(max_lon, {qlon!r})) AS nlon
  FROM bx
)
SELECT doc_id, CAST(ROUND(
  2 * {r!r} * asin(sqrt(
    sin(radians(nlat - {qlat!r})/2) * sin(radians(nlat - {qlat!r})/2)
    + cos(radians({qlat!r})) * cos(radians(nlat))
      * sin(radians(nlon - {qlon!r})/2) * sin(radians(nlon - {qlon!r})/2)
  )) * 10) AS BIGINT) AS dist_x10km
FROM n ORDER BY dist_x10km ASC, doc_id ASC LIMIT {k}"""


def calc_distance_from_err_pct(shape: Rect, dist_err_pct: float) -> float:
    """SpatialArgs.calcDistanceFromErrPct (SpatialArgs.java:91-108):
    bbox-center to the corner on the equator side (y = maxY when the
    center is in the northern hemisphere, minY otherwise), times the
    percentage; haversine km metric (the geo SpatialContext distance
    calculator)."""
    import math

    from lucene_spark.search.geo import EARTH_RADIUS_KM

    if dist_err_pct < 0 or dist_err_pct > 0.5:
        raise ValueError(
            f"distErrPct {dist_err_pct} must be between [0 to 0.5]"
        )
    if dist_err_pct == 0 or (shape.width == 0 and shape.height == 0):
        return 0.0
    cy = (shape.min_y + shape.max_y) / 2.0
    cx = (shape.min_x + shape.max_x) / 2.0
    y = shape.max_y if cy >= 0 else shape.min_y
    la1, lo1 = math.radians(cy), math.radians(cx)
    la2, lo2 = math.radians(y), math.radians(shape.max_x)
    a = (
        math.sin((la2 - la1) / 2) ** 2
        + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2
    )
    return 2.0 * EARTH_RADIUS_KM * math.asin(math.sqrt(a)) * dist_err_pct
