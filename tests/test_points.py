"""Z-order points index (BKD analog) — lucene_spark/index/points.py.

Reference semantics: ``core/util/bkd/BKDWriter.java`` /
``core/search/PointRangeQuery.java`` — a multi-dim range query visits
only tree cells intersecting the box and never matches docs missing
the point. Here: box results equal a brute-force filter, the manifest
prunes files, NULL dims never match, and disjoint boxes return empty.
"""

import math

import pytest
from pyspark.sql import Row, functions as F

from lucene_spark.index.points import (
    bkd_range_query,
    bkd_scan,
    bkd_write,
    zorder_expr,
)


def _make_points(spark, n=5000, seed=7):
    """Deterministic 3-dim point set with some NULLs in dim z."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append(
            Row(
                pid=i,
                x=rng.uniform(-100.0, 100.0),
                y=rng.uniform(0.0, 1000.0),
                z=None if i % 97 == 0 else float(rng.randint(0, 50)),
            )
        )
    return spark.createDataFrame(rows)


@pytest.fixture(scope="module")
def points_idx(spark, tmp_path_factory):
    df = _make_points(spark)
    path = str(tmp_path_factory.mktemp("pts") / "idx")
    meta = bkd_write(df, ["x", "y", "z"], path, num_files=16)
    return path, df, meta


def test_zorder_interleave_exact(spark):
    # 2-dim, 4-bit: the expression must equal the classic Morton
    # interleave computed in Python over the same quantization
    df = spark.createDataFrame(
        [Row(a=float(i), b=float(j)) for i in range(16) for j in range(16)]
    )
    expr = zorder_expr(["a", "b"], {"a": (0.0, 15.0), "b": (0.0, 15.0)}, bits=4)
    got = {
        (r["a"], r["b"]): r["zc"]
        for r in df.select("a", "b", F.expr(expr).alias("zc")).collect()
    }
    for i in range(16):
        for j in range(16):
            want = 0
            for b in range(4):
                want |= ((i >> b) & 1) << (2 * b)
                want |= ((j >> b) & 1) << (2 * b + 1)
            assert got[(float(i), float(j))] == want


def test_zorder_bits_overflow_rejected():
    with pytest.raises(ValueError):
        zorder_expr(["a", "b", "c", "d"], {c: (0, 1) for c in "abcd"}, bits=16)


def test_box_query_matches_brute_force(points_idx):
    path, df, _ = points_idx
    ranges = {"x": (-50.0, 10.0), "y": (100.0, 400.0), "z": (5.0, 30.0)}
    got = sorted(
        r["pid"] for r in bkd_scan(df.sparkSession, path, ranges).collect()
    )
    want = sorted(
        r["pid"]
        for r in df.filter(
            (F.col("x") >= -50.0) & (F.col("x") <= 10.0)
            & (F.col("y") >= 100.0) & (F.col("y") <= 400.0)
            & (F.col("z") >= 5.0) & (F.col("z") <= 30.0)
        ).collect()
    )
    assert got == want and len(want) > 0


def test_half_open_ranges(points_idx):
    path, df, _ = points_idx
    got = sorted(
        r["pid"]
        for r in bkd_scan(
            df.sparkSession, path, {"x": (None, -80.0), "y": (900.0, None)}
        ).collect()
    )
    want = sorted(
        r["pid"]
        for r in df.filter((F.col("x") <= -80.0) & (F.col("y") >= 900.0)).collect()
    )
    assert got == want and len(want) > 0


def test_null_dim_never_matches(points_idx):
    # PointRangeQuery semantics: a doc without the point is not a hit,
    # even for a box covering the whole space
    path, df, _ = points_idx
    got = bkd_scan(
        df.sparkSession, path, {"z": (float("-inf"), float("inf"))}
    ).count()
    assert got == df.filter(F.col("z").isNotNull()).count() < df.count()


def test_manifest_prunes_files(points_idx):
    # a small box in z-ordered layout must skip most files; a disjoint
    # box must skip all of them without a scan
    path, df, _ = points_idx
    stats = {}
    bkd_scan(
        df.sparkSession, path,
        {"x": (-10.0, 0.0), "y": (0.0, 100.0)}, stats=stats,
    ).count()
    assert stats["files_total"] == 16
    assert 0 < stats["files_scanned"] < stats["files_total"]

    stats = {}
    out = bkd_scan(df.sparkSession, path, {"x": (500.0, 600.0)}, stats=stats)
    assert stats["files_scanned"] == 0 and out.count() == 0


def test_schema_preserved_no_zcode(points_idx):
    path, df, _ = points_idx
    assert bkd_scan(df.sparkSession, path, {}).columns == df.columns


def test_range_query_gate_shape(points_idx):
    path, df, _ = points_idx
    out = bkd_range_query(
        df.sparkSession, path, {"x": (-50.0, 50.0)}, id_col="pid", k=10
    )
    rows = out.collect()
    assert out.columns == ["doc_id", "score_x1e6"]
    assert len(rows) == 10
    assert [r["doc_id"] for r in rows] == sorted(r["doc_id"] for r in rows)
    assert all(r["score_x1e6"] == 1_000_000 for r in rows)


def test_zorder_locality_beats_random(points_idx):
    # the clustering claim itself: per-file bounding boxes must be much
    # smaller than the full space (random layout => every file spans
    # ~everything and nothing ever prunes)
    path, df, meta = points_idx
    man = df.sparkSession.read.parquet(f"{path}/bkd_manifest").collect()
    (xlo, xhi) = meta["bounds"]["x"]
    (ylo, yhi) = meta["bounds"]["y"]
    full_area = (xhi - xlo) * (yhi - ylo)
    areas = [
        (r["hi_x"] - r["lo_x"]) * (r["hi_y"] - r["lo_y"]) for r in man
    ]
    # 16 z-order files over 2 effective dims: mean cell area well under
    # half the space (random placement would put every cell near 1.0x)
    assert len(areas) == 16
    assert sum(areas) / len(areas) < 0.5 * full_area
    assert math.isfinite(sum(areas))


def _brute_nearest(df, point, k, scale=1000):
    """Driver-side ground truth: exact Euclidean over every row whose
    queried dims are all non-NULL, rounded + tie-broken like the engine."""
    rows = []
    for r in df.collect():
        if any(r[c] is None for c in point):
            continue
        d = math.sqrt(sum((float(r[c]) - q) ** 2 for c, q in point.items()))
        rows.append((int(round(d * scale)), r["pid"]))
    rows.sort()
    return rows[:k]


def test_nearest_matches_brute_force(points_idx):
    from lucene_spark.index.points import point_nearest_topk

    path, df, _ = points_idx
    point = {"x": 3.25, "y": 512.0}
    got = [
        (r["dist_scaled"], r["doc_id"])
        for r in point_nearest_topk(
            df.sparkSession, path, point, id_col="pid", k=25
        ).collect()
    ]
    assert got == _brute_nearest(df, point, k=25)


def test_nearest_prunes_files(spark, tmp_path):
    # best-first contract: a query near one corner of a 2-dim z-order
    # layout must NOT open every file — the seed prefix + the
    # d_k-radius survivors stay well under the total
    from lucene_spark.index.points import point_nearest_topk

    df = _make_points(spark).select("pid", "x", "y")
    path = str(tmp_path / "xy")
    bkd_write(df, ["x", "y"], path, num_files=16)
    stats = {}
    got = point_nearest_topk(
        spark, path, {"x": -99.0, "y": 5.0}, id_col="pid", k=5, stats=stats
    ).collect()
    assert [(r["dist_scaled"], r["doc_id"]) for r in got] == _brute_nearest(
        df, {"x": -99.0, "y": 5.0}, k=5
    )
    assert stats["files_total"] == 16
    assert stats["files_scanned"] < stats["files_total"]


def test_nearest_null_dim_never_matches(points_idx):
    # PointRangeQuery contract carried over: a row with NULL in any
    # queried dim is invisible to nearest, even with k > matching rows
    from lucene_spark.index.points import point_nearest_topk

    path, df, _ = points_idx
    point = {"x": 0.0, "y": 500.0, "z": 25.0}
    got = [
        (r["dist_scaled"], r["doc_id"])
        for r in point_nearest_topk(
            df.sparkSession, path, point, id_col="pid", k=40
        ).collect()
    ]
    want = _brute_nearest(df, point, k=40)
    assert got == want
    null_ids = {r["pid"] for r in df.collect() if r["z"] is None}
    assert null_ids  # the fixture really plants NULLs
    assert not null_ids & {d for _, d in got}


def test_nearest_k_exceeds_corpus(spark, tmp_path):
    from pyspark.sql import Row

    from lucene_spark.index.points import point_nearest_topk

    df = spark.createDataFrame(
        [Row(pid=i, x=float(i), y=0.0) for i in range(7)]
    )
    path = str(tmp_path / "tiny")
    bkd_write(df, ["x", "y"], path, num_files=4)
    got = point_nearest_topk(
        spark, path, {"x": 2.0, "y": 0.0}, id_col="pid", k=50
    ).collect()
    assert len(got) == 7
    assert got[0]["doc_id"] == 2 and got[0]["dist_scaled"] == 0


def test_check_points_index_clean(points_idx):
    from lucene_spark.index.points import check_points_index

    path, df, _ = points_idx
    rep = check_points_index(df.sparkSession, path)
    assert rep["ok"], rep["violations"]
    assert rep["files"] == 16


def test_check_points_index_catches_planted_corruption(spark, tmp_path):
    # unsound bounds are exactly what pruning relies on — plant a lie
    # in the manifest and the checker must name the file
    import pyspark.sql.functions as F

    from lucene_spark.index.points import check_points_index

    df = _make_points(spark, n=800).select("pid", "x", "y")
    path = str(tmp_path / "bad")
    bkd_write(df, ["x", "y"], path, num_files=4)
    man_path = f"{path}/bkd_manifest"
    man = spark.read.parquet(man_path)
    first = man.head()["file"]
    corrupted = man.withColumn(
        "hi_x",
        F.when(F.col("file") == first, F.col("hi_x") - 50.0)
        .otherwise(F.col("hi_x")),
    )
    corrupted.toPandas().to_parquet(f"{man_path}/corrupt.parquet")
    import glob as g
    import os as o

    for p in g.glob(f"{man_path}/part-*.parquet"):
        o.remove(p)
    rep = check_points_index(spark, path)
    assert not rep["ok"]
    assert any("hi_x" in s for s in rep["violations"])
