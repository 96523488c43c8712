"""LatLonShape box queries: engine vs a pure-Python computational-
geometry replay (shapely-free), plus relation-algebra invariants."""

import hashlib

import pytest

SF = "/root/testdata/sf0.001"
BOX = (0.0, 30.0, 0.0, 60.0)  # (min_lat, max_lat, min_lon, max_lon)


def _h(doc_id, tag, mod):
    v = int(hashlib.md5(f"{doc_id}{tag}".encode()).hexdigest()[:8], 16)
    return v % mod


def _triangle(doc_id):
    clat = _h(doc_id, "_lat", 180000) / 1000.0 - 90.0
    clon = _h(doc_id, "_lon", 360000) / 1000.0 - 180.0
    return [
        (
            clon + _h(doc_id, f"_t{i}o", 80000) / 1000.0 - 40.0,
            clat + _h(doc_id, f"_t{i}a", 40000) / 1000.0 - 20.0,
        )
        for i in range(3)
    ]


def _orient(a, b, c):
    return (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])


def _in_box(p, box):
    return box[2] <= p[0] <= box[3] and box[0] <= p[1] <= box[1]


def _in_tri(p, tri):
    os = [_orient(tri[i], tri[(i + 1) % 3], p) for i in range(3)]
    return all(o >= 0 for o in os) or all(o <= 0 for o in os)


def _cross(p1, p2, q1, q2):
    return (
        _orient(p1, p2, q1) * _orient(p1, p2, q2) < 0
        and _orient(q1, q2, p1) * _orient(q1, q2, p2) < 0
    )


def _relation(tri, box, rel):
    corners = [
        (box[2], box[0]), (box[2], box[1]), (box[3], box[1]), (box[3], box[0])
    ]
    if rel == "within":
        return all(_in_box(v, box) for v in tri)
    if rel == "contains":
        return all(_in_tri(c, tri) for c in corners)
    inter = (
        any(_in_box(v, box) for v in tri)
        or any(_in_tri(c, tri) for c in corners)
        or any(
            _cross(tri[i], tri[(i + 1) % 3], corners[j], corners[(j + 1) % 4])
            for i in range(3)
            for j in range(4)
        )
    )
    return inter if rel == "intersects" else not inter


@pytest.fixture(scope="module")
def doc_ids(spark):
    return sorted(
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id").collect()
    )


@pytest.mark.parametrize("rel", ["intersects", "within", "contains", "disjoint"])
def test_relation_matches_python_replay(spark, doc_ids, rel):
    from lucene_spark.search import shapes

    box = (10.0, 11.0, 10.0, 12.0) if rel == "contains" else BOX
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = sorted(
        r["doc_id"]
        for r in shapes.shape_box_topk(docs, rel, *box, k=10**6).collect()
    )
    want = sorted(
        d for d in doc_ids if _relation(_triangle(d), box, rel)
    )
    assert got == want
    assert got  # every relation branch is non-trivial on this corpus


def test_relation_algebra(spark, doc_ids):
    """WITHIN and CONTAINS imply INTERSECTS; DISJOINT is its complement
    (ShapeQuery QueryRelation contract)."""
    from lucene_spark.search import shapes

    docs = spark.read.parquet(f"{SF}/documents.parquet")

    def ids(rel, box):
        return {
            r["doc_id"]
            for r in shapes.shape_box_topk(docs, rel, *box, k=10**6).collect()
        }

    inter = ids("intersects", BOX)
    assert ids("within", BOX) <= inter
    assert ids("disjoint", BOX) == set(doc_ids) - inter
    big = (-60.0, 60.0, -120.0, 120.0)
    assert ids("contains", (10.0, 11.0, 10.0, 12.0)) <= ids(
        "intersects", (10.0, 11.0, 10.0, 12.0)
    )
    assert ids("within", big) <= ids("intersects", big)


def test_bbox_prune_preserves_results(spark):
    """The min/max-column prefilter (BKD-node role) must not change the
    INTERSECTS result set vs the pure relation expression."""
    from pyspark.sql import functions as F

    from lucene_spark.search import shapes

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    tri = shapes.synthesize_triangles(docs)
    expr = shapes.relation_expr("intersects", *BOX)
    unpruned = sorted(
        r["doc_id"] for r in tri.filter(F.expr(expr)).select("doc_id").collect()
    )
    pruned = sorted(
        r["doc_id"]
        for r in shapes.shape_box_topk(docs, "intersects", *BOX, k=10**6)
        .select("doc_id").collect()
    )
    assert pruned == unpruned


def test_unknown_relation_rejected(spark):
    from lucene_spark.search import shapes

    with pytest.raises(ValueError, match="unknown relation"):
        shapes.relation_expr("touches", 0, 1, 0, 1)


# ---------------------------------------------------------------------------
# query geometries beyond the box: polygon / line / distance
# (r4: LatLonShape.newPolygonQuery / newLineQuery / newDistanceQuery)
# ---------------------------------------------------------------------------

POLY = [(-30.0, -10.0), (40.0, -20.0), (50.0, 30.0), (5.0, 10.0),
        (0.0, 55.0), (-45.0, 20.0)]  # concave at (5,10)
LINE = [(-120.0, -40.0), (-60.0, 10.0), (0.0, -20.0), (60.0, 25.0)]


def _pt_in_poly(p, poly):
    px, py = p
    inside = False
    n = len(poly)
    for i in range(n):
        x1, y1 = poly[i]
        x2, y2 = poly[(i + 1) % n]
        if (y1 > py) != (y2 > py) and px < (x2 - x1) * (py - y1) / (y2 - y1) + x1:
            inside = not inside
    return inside


def _poly_relation(tri, poly, rel):
    tri_edges = [(tri[i], tri[(i + 1) % 3]) for i in range(3)]
    poly_edges = [(poly[i], poly[(i + 1) % len(poly)]) for i in range(len(poly))]
    crossings = any(
        _cross(p1, p2, q1, q2) for p1, p2 in tri_edges for q1, q2 in poly_edges
    )
    if rel == "within":
        return all(_pt_in_poly(v, poly) for v in tri) and not crossings
    if rel == "contains":
        return all(_in_tri(c, tri) for c in poly)
    inter = (
        any(_pt_in_poly(v, poly) for v in tri)
        or any(_in_tri(c, tri) for c in poly)
        or crossings
    )
    return inter if rel == "intersects" else not inter


def _line_relation(tri, line, rel):
    tri_edges = [(tri[i], tri[(i + 1) % 3]) for i in range(3)]
    segs = list(zip(line, line[1:]))
    crossings = any(
        _cross(p1, p2, q1, q2) for p1, p2 in tri_edges for q1, q2 in segs
    )
    if rel == "within":
        return False
    if rel == "contains":
        return all(_in_tri(v, tri) for v in line)
    inter = any(_in_tri(v, tri) for v in line) or crossings
    return inter if rel == "intersects" else not inter


@pytest.mark.parametrize("rel", ["intersects", "within", "contains", "disjoint"])
def test_polygon_relation_matches_python_replay(spark, rel):
    from pyspark.sql import functions as F

    from lucene_spark.search.shapes import shape_polygon_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = set(
        shape_polygon_topk(docs, rel, POLY, k=10_000).toPandas()["doc_id"]
    )
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    want = {d for d in ids if _poly_relation(_triangle(d), POLY, rel)}
    assert got == want, rel


@pytest.mark.parametrize("rel", ["intersects", "contains", "disjoint", "within"])
def test_line_relation_matches_python_replay(spark, rel):
    from lucene_spark.search.shapes import shape_line_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = set(shape_line_topk(docs, rel, LINE, k=10_000).toPandas()["doc_id"])
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    want = {d for d in ids if _line_relation(_triangle(d), LINE, rel)}
    assert got == want, rel


def test_distance_relation_vertex_and_algebra(spark):
    """Vertex containment is exact haversine; check INTERSECTS ⊇ WITHIN,
    DISJOINT = complement of INTERSECTS, and WITHIN's all-vertices rule
    against a pure-python haversine replay."""
    import math

    from lucene_spark.search.shapes import shape_distance_topk

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    qlat, qlon, r = 35.0, 10.0, 2_500_000.0

    def hav(p):
        lon, lat = p
        a = (
            math.sin(math.radians(lat - qlat) / 2) ** 2
            + math.cos(math.radians(qlat))
            * math.cos(math.radians(lat))
            * math.sin(math.radians(lon - qlon) / 2) ** 2
        )
        return 2 * 6371008.7714 * math.asin(math.sqrt(a))

    ids = [row["doc_id"] for row in docs.select("doc_id").collect()]
    inter = set(
        shape_distance_topk(docs, "intersects", qlat, qlon, r, k=10_000)
        .toPandas()["doc_id"]
    )
    within = set(
        shape_distance_topk(docs, "within", qlat, qlon, r, k=10_000)
        .toPandas()["doc_id"]
    )
    disjoint = set(
        shape_distance_topk(docs, "disjoint", qlat, qlon, r, k=10_000)
        .toPandas()["doc_id"]
    )
    assert within <= inter
    assert disjoint == set(ids) - inter
    want_within = {
        d for d in ids if all(hav(v) <= r for v in _triangle(d))
    }
    assert within == want_within
    # every triangle with a vertex inside must intersect
    has_vertex_in = {d for d in ids if any(hav(v) <= r for v in _triangle(d))}
    assert has_vertex_in <= inter


def test_shape_index_stored_vs_synthesized(spark, tmp_path):
    """write_shape_index/read_shape_index: stored triangles give the
    same answers as the on-the-fly fixture, the bbox manifest prune
    skips files, and the relation filter over stored columns survives
    STRICT whole-stage codegen (no janino interpreted fallback — the
    synthesized form exceeds the 64 KB method limit)."""
    from lucene_spark.search import shapes

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "shapeidx")
    meta = shapes.write_shape_index(docs, path, num_files=8)
    assert meta["rows"] == docs.count()

    def ids(df):
        return sorted(r["doc_id"] for r in df.collect())

    poly = [(-30.0, -10.0), (40.0, -20.0), (50.0, 30.0), (5.0, 10.0)]
    # the on-the-fly synthesized form is exactly the janino-falling-back
    # path, so compute all expected answers BEFORE strict mode
    want_box = {
        rel: ids(shapes.shape_box_topk(docs, rel, *BOX, k=10**6))
        for rel in shapes.RELATIONS
    }
    want_poly = ids(shapes.shape_polygon_topk(docs, "intersects", poly, k=10**6))
    want_dist = ids(shapes.shape_distance_topk(
        docs, "intersects", 35.0, 10.0, 2_500_000.0, k=10**6))

    spark.conf.set("spark.sql.codegen.fallback", "false")
    try:
        for rel in shapes.RELATIONS:
            bbox = BOX if rel in ("intersects", "within") else None
            stats = {}
            tri = shapes.read_shape_index(spark, path, bbox=bbox, stats=stats)
            got = ids(shapes.shape_box_topk(tri, rel, *BOX, k=10**6))
            assert got == want_box[rel], rel
            if bbox is not None:
                assert stats["files_scanned"] <= stats["files_total"]
        # a tiny query box prunes whole files via the bounds manifest
        stats = {}
        small = (10.0, 10.5, 10.0, 10.5)
        shapes.read_shape_index(
            spark, path,
            bbox=small, stats=stats,
        ).count()
        assert stats["files_scanned"] < stats["files_total"], stats
        # polygon / distance over the stored table, strict codegen
        tri = shapes.read_shape_index(spark, path)
        assert ids(shapes.shape_polygon_topk(
            tri, "intersects", poly, k=10**6)) == want_poly
        assert ids(shapes.shape_distance_topk(
            tri, "intersects", 35.0, 10.0, 2_500_000.0, k=10**6)) == want_dist
    finally:
        spark.conf.set("spark.sql.codegen.fallback", "true")
