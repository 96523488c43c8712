"""SpatialOperation / SpatialArgs / SpatialArgsParser + BBox overlap
ratio (spatial-extras query/ + bbox/).

Golden expectations mirror the reference's TestSpatialArgs /
TestBBoxStrategy.testOverlapRatio cases where they are pure-Java
arithmetic (no spatial4j context needed).
"""

import pytest

from lucene_spark.search.spatialargs import (
    Rect,
    SpatialArgs,
    get_operation,
    parse_shape,
    parse_spatial_args,
)


# --------------------------- registry ---------------------------------


def test_operation_aliases_and_case():
    # SpatialOperation.java register(): aliases + upper-case forms
    assert get_operation("Intersects") == "Intersects"
    assert get_operation("INTERSECTS") == "Intersects"
    assert get_operation("intersects") == "Intersects"
    assert get_operation("BBoxCoveredBy") == "BBoxWithin"
    assert get_operation("Covers") == "Contains"
    assert get_operation("IsEqualTo") == "Equals"
    assert get_operation("IsDisjointTo") == "Disjoint"
    assert get_operation("CoveredBy") == "Within"
    assert get_operation("IsWithin") == "Within"
    with pytest.raises(ValueError, match="Unknown Operation"):
        get_operation("Touches")


# --------------------------- parser -----------------------------------


def test_parse_envelope_argument_order():
    # spatial4j ENVELOPE order: minX, maxX, maxY, minY
    r = parse_shape("ENVELOPE(-10, 30, 40, 20)")
    assert (r.min_x, r.max_x, r.min_y, r.max_y) == (-10.0, 30.0, 20.0, 40.0)


def test_parse_point_is_degenerate_rect():
    r = parse_shape("POINT(5 7)")
    assert (r.min_x, r.max_x, r.min_y, r.max_y) == (5.0, 5.0, 7.0, 7.0)
    assert r.width == 0 and r.height == 0


def test_parse_args_with_options():
    a = parse_spatial_args(
        "Intersects(ENVELOPE(-10, 30, 40, 20) distErrPct=0.25)"
    )
    assert a.operation == "Intersects"
    assert a.dist_err_pct == 0.25
    assert a.dist_err is None


def test_parse_args_dist_err():
    a = parse_spatial_args("IsWithin(POINT(1 2) distErr=12.5)")
    assert a.operation == "Within"
    assert a.dist_err == 12.5


def test_parse_missing_parens_raises():
    with pytest.raises(ValueError, match="missing parens"):
        parse_spatial_args("Intersects ENVELOPE")


def test_parse_empty_body_raises():
    with pytest.raises(ValueError, match="missing body"):
        parse_spatial_args("Intersects()")


def test_parse_unused_params_raise():
    # SpatialArgsParser.java:66-69
    with pytest.raises(ValueError, match="unused parameters"):
        parse_spatial_args("Intersects(POINT(0 0) bogus=1)")


def test_validate_mutual_exclusion():
    a = SpatialArgs("Intersects", Rect(0, 1, 0, 1),
                    dist_err_pct=0.1, dist_err=5.0)
    with pytest.raises(ValueError, match="Only distErr or distErrPct"):
        a.validate()


def test_write_spatial_args_format():
    a = SpatialArgs("Intersects", Rect(0, 1, 0, 1), dist_err_pct=0.025)
    s = str(a)
    assert s.startswith("Intersects(") and "distErrPct=2.50%" in s


# ------------------------ operation semantics --------------------------


def _matches(op, target: Rect, query: Rect) -> bool:
    """Evaluate the SQL predicate in Python over one box."""
    from lucene_spark.search.spatialargs import operation_predicate_sql

    sql = operation_predicate_sql(op, query)
    env = {
        "min_lon": target.min_x, "max_lon": target.max_x,
        "min_lat": target.min_y, "max_lat": target.max_y,
    }
    py = sql.replace("AND", "and").replace("NOT", "not").replace("=", "==")
    py = py.replace("<==", "<=").replace(">==", ">=")
    return bool(eval(py, {}, env))


Q = Rect(0.0, 10.0, 0.0, 10.0)


def test_intersects_and_disjoint():
    assert _matches("Intersects", Rect(5, 15, 5, 15), Q)
    assert _matches("Intersects", Rect(10, 20, 10, 20), Q)  # corner touch
    assert not _matches("Intersects", Rect(11, 20, 0, 10), Q)
    assert _matches("Disjoint", Rect(11, 20, 0, 10), Q)
    assert not _matches("Disjoint", Rect(5, 15, 5, 15), Q)


def test_within_includes_equality():
    # the reference's `relate == WITHIN || equals` arm
    assert _matches("Within", Rect(2, 8, 2, 8), Q)
    assert _matches("Within", Q, Q)
    assert not _matches("Within", Rect(-1, 8, 2, 8), Q)
    assert _matches("BBoxCoveredBy", Rect(2, 8, 2, 8), Q)


def test_contains_includes_equality():
    assert _matches("Contains", Rect(-5, 15, -5, 15), Q)
    assert _matches("Covers", Q, Q)
    assert not _matches("Contains", Rect(2, 8, 2, 8), Q)


def test_overlaps_is_strict_intersection():
    # SpatialOperation.java:118-126: INTERSECTS classification only —
    # not contains, not within, not disjoint
    assert _matches("Overlaps", Rect(5, 15, 5, 15), Q)
    assert not _matches("Overlaps", Rect(2, 8, 2, 8), Q)      # within
    assert not _matches("Overlaps", Rect(-5, 15, -5, 15), Q)  # contains
    assert not _matches("Overlaps", Rect(11, 20, 0, 10), Q)   # disjoint
    assert not _matches("Overlaps", Q, Q)                      # equals


def test_equals():
    assert _matches("Equals", Q, Q)
    assert _matches("IsEqualTo", Q, Q)
    assert not _matches("Equals", Rect(0, 10, 0, 11), Q)


# ------------------------ overlap ratio --------------------------------


def _score(target: Rect, query: Rect, prop=0.25, msl=0.0):
    """Python twin of BBoxOverlapRatioValueSource.score (non-crossing
    branch) for cross-checking the SQL."""
    top = min(query.max_y, target.max_y)
    bottom = max(query.min_y, target.min_y)
    height = top - bottom
    if height < 0:
        return None
    left = max(query.min_x, target.min_x)
    right = min(query.max_x, target.max_x)
    if left > right:
        return None
    width = right - left

    def area(w, h):
        return max(msl, w) * max(msl, h)

    ia = area(width, height)
    qa = area(query.width, query.height)
    if qa > 0:
        qr = ia / qa
    elif query.height > 0:
        qr = height / query.height
    elif query.width > 0:
        qr = width / query.width
    else:
        qr = 1.0
    ta = area(target.width, target.height)
    if ta > 0:
        tr = ia / ta
    elif target.height > 0:
        tr = height / target.height
    elif target.width > 0:
        tr = width / target.width
    else:
        tr = 1.0
    return qr * prop + tr * (1.0 - prop)


def _sql_score(target: Rect, query: Rect, prop=0.25, msl=0.0):
    from lucene_spark.search.spatialargs import _overlap_ratio_score_sql

    sql = _overlap_ratio_score_sql(query, prop, msl)
    env = {
        "min_lon": target.min_x, "max_lon": target.max_x,
        "min_lat": target.min_y, "max_lat": target.max_y,
        "LEAST": min, "GREATEST": max, "NULL": None,
    }
    # translate the single CASE WHEN ... THEN ... ELSE NULL END
    import re

    m = re.match(r"\(CASE WHEN (.*?) THEN (.*) ELSE NULL END\)$", sql,
                 re.DOTALL)
    cond, body = m.group(1), m.group(2)
    cond_py = cond.replace("AND", "and")
    if not eval(cond_py, {}, env):
        return None
    # inner CASE for targetRatio
    def eval_expr(e):
        im = re.search(
            r"\(CASE WHEN (.*?) THEN (.*?) WHEN (.*?) THEN (.*?)"
            r" WHEN (.*?) THEN (.*?) ELSE 1\.0 END\)", e, re.DOTALL)
        if im:
            c1, v1, c2, v2, c3, v3 = im.groups()
            if eval(c1, {}, env):
                val = eval(v1, {}, env)
            elif eval(c2, {}, env):
                val = eval(v2, {}, env)
            elif eval(c3, {}, env):
                val = eval(v3, {}, env)
            else:
                val = 1.0
            e = e[: im.start()] + repr(val) + e[im.end():]
        return eval(e, {}, env)

    return eval_expr(body)


@pytest.mark.parametrize("target", [
    Rect(5, 15, 5, 15),     # partial overlap
    Rect(2, 8, 2, 8),       # within
    Rect(-5, 15, -5, 15),   # contains
    Rect(0, 10, 0, 10),     # equal (score == 1)
    Rect(10, 20, 10, 20),   # corner touch (zero area intersection)
    Rect(11, 20, 0, 10),    # disjoint -> None
    Rect(3, 3, 1, 9),       # vertical-line target
])
def test_overlap_ratio_sql_matches_python(target):
    got = _sql_score(target, Q)
    want = _score(target, Q)
    if want is None:
        assert got is None
    else:
        assert got == pytest.approx(want, abs=1e-12)


def test_overlap_ratio_equal_boxes_score_one():
    assert _score(Q, Q) == pytest.approx(1.0)
    assert _sql_score(Q, Q) == pytest.approx(1.0)


def test_overlap_ratio_min_side_length():
    # minSideLength inflates degenerate intersections
    # (calcArea = max(msl, w) * max(msl, h))
    t = Rect(10, 20, 0, 10)  # line-touch at x=10
    assert _score(t, Q, msl=0.5) == pytest.approx(
        _sql_score(t, Q, msl=0.5), abs=1e-12)
    assert _sql_score(t, Q, msl=0.5) > 0


def test_query_target_proportion_bounds():
    from lucene_spark.search.spatialargs import _overlap_ratio_score_sql

    with pytest.raises(ValueError, match="queryTargetProportion"):
        _overlap_ratio_score_sql(Q, 1.5, 0.0)


# ------------------------ Spark end-to-end -----------------------------


def test_spatial_query_topk_spark(spark):
    from lucene_spark.search.latlonbbox import synthesize_boxes
    from lucene_spark.search.spatialargs import spatial_query_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    boxes = synthesize_boxes(docs)
    inter = spatial_query_topk(
        boxes, "Intersects(ENVELOPE(-10, 30, 40, 20))", k=50
    ).toPandas()
    disj = spatial_query_topk(
        boxes, "Disjoint(ENVELOPE(-10, 30, 40, 20))", k=10_000
    ).toPandas()
    n = docs.count()
    assert len(inter) > 0
    # Disjoint is the complement of Intersects
    assert set(inter.doc_id).isdisjoint(set(disj.doc_id))
    full_inter = spatial_query_topk(
        boxes, "Intersects(ENVELOPE(-10, 30, 40, 20))", k=10_000
    ).toPandas()
    assert len(full_inter) + len(disj) == n


def test_bbox_overlap_ratio_topk_spark(spark):
    from lucene_spark.search.latlonbbox import synthesize_boxes
    from lucene_spark.search.spatialargs import (
        Rect as R,
        bbox_overlap_ratio_topk,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    boxes = synthesize_boxes(docs)
    out = bbox_overlap_ratio_topk(boxes, R(-10, 30, 20, 40), k=20).toPandas()
    # sf0.001 has ~9 intersecting boxes; they rank first, and the
    # non-intersecting remainder fills out the top-k at score 0
    # (BBoxOverlapRatioValueSource.score returns 0, .java:155)
    assert len(out) == 20
    assert (out.score_x1e6.values[:-1] >= out.score_x1e6.values[1:]).all()
    assert (out.score_x1e6 <= 1_000_000).all()
    assert (out.score_x1e6 >= 0).all()
    assert (out.score_x1e6 > 0).any()
    assert (out.score_x1e6 == 0).any()


# ------------------ shape value sources ------------------------------


def test_shape_area_flat_vs_geodetic(spark):
    import math

    from lucene_spark.search.latlonbbox import synthesize_boxes
    from lucene_spark.search.spatialargs import shape_area_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    boxes = synthesize_boxes(docs)
    flat = shape_area_topk(boxes, geodetic=False, k=5).toPandas()
    geo = shape_area_topk(boxes, geodetic=True, k=5).toPandas()
    assert (flat.area_x1e3.values[:-1] >= flat.area_x1e3.values[1:]).all()
    # geodetic area of one box matches the zone formula by hand
    b = boxes.orderBy("doc_id").limit(1).collect()[0]
    from lucene_spark.search.geo import EARTH_RADIUS_KM

    want = (
        EARTH_RADIUS_KM ** 2
        * math.radians(b.max_lon - b.min_lon)
        * (math.sin(math.radians(b.max_lat)) - math.sin(math.radians(b.min_lat)))
    )
    got = {
        r.doc_id: r.area_x1e3
        for r in shape_area_topk(boxes, geodetic=True, k=10_000).collect()
    }
    assert abs(got[b.doc_id] - round(want * 1e3)) <= 1


def test_distance_to_shape_zero_inside(spark):
    from lucene_spark.search.latlonbbox import synthesize_boxes
    from lucene_spark.search.spatialargs import distance_to_shape_topk

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    boxes = synthesize_boxes(docs)
    pdf = boxes.toPandas()
    # pick a point inside the first box
    b = pdf.iloc[0]
    qlat = (b.min_lat + b.max_lat) / 2
    qlon = (b.min_lon + b.max_lon) / 2
    got = {
        r.doc_id: r.dist_x10km
        for r in distance_to_shape_topk(
            boxes, qlat, qlon, k=10_000
        ).collect()
    }
    assert got[b.doc_id] == 0
    # every distance is the clamp-haversine (monotone sanity: the
    # containing box is at 0, others nonnegative)
    assert min(got.values()) == 0


# ------------------- resolveDistErr ------------------------------------


def test_calc_distance_from_err_pct():
    import math

    from lucene_spark.search.geo import EARTH_RADIUS_KM
    from lucene_spark.search.spatialargs import calc_distance_from_err_pct

    # point -> 0; pct 0 -> 0 (SpatialArgs.java:98-100)
    assert calc_distance_from_err_pct(Rect(5, 5, 7, 7), 0.1) == 0.0
    assert calc_distance_from_err_pct(Rect(0, 10, 0, 10), 0.0) == 0.0
    with pytest.raises(ValueError, match=r"between \[0 to 0.5\]"):
        calc_distance_from_err_pct(Rect(0, 10, 0, 10), 0.6)
    # northern-hemisphere center -> the maxY corner is used
    r = Rect(0.0, 10.0, 0.0, 10.0)   # center (5, 5), corner (10, 10)
    d = calc_distance_from_err_pct(r, 0.1)
    la1, lo1 = math.radians(5.0), math.radians(5.0)
    la2, lo2 = math.radians(10.0), math.radians(10.0)
    a = (math.sin((la2 - la1) / 2) ** 2
         + math.cos(la1) * math.cos(la2) * math.sin((lo2 - lo1) / 2) ** 2)
    want = 2 * EARTH_RADIUS_KM * math.asin(math.sqrt(a)) * 0.1
    assert d == pytest.approx(want)
    # southern center -> minY corner (the "closest corner" rule)
    rs = Rect(0.0, 10.0, -10.0, 0.0)
    ds = calc_distance_from_err_pct(rs, 0.1)
    assert ds == pytest.approx(d)  # symmetric case


def test_resolve_dist_err_precedence():
    from lucene_spark.search.spatialargs import SpatialArgs

    r = Rect(0.0, 10.0, 0.0, 10.0)
    # explicit distErr wins
    assert SpatialArgs("Intersects", r, dist_err=42.0).resolve_dist_err() == 42.0
    # explicit pct used, else the default pct
    a = SpatialArgs("Intersects", r, dist_err_pct=0.1)
    b = SpatialArgs("Intersects", r)
    assert a.resolve_dist_err() == pytest.approx(
        b.resolve_dist_err(default_dist_err_pct=0.1))
    assert b.resolve_dist_err(0.0) == 0.0
