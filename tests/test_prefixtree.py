"""Geohash prefix-tree geo indexing (spatial-extras
RecursivePrefixTreeStrategy analog): encode/bbox invariants, covering
correctness, and end-to-end identity with the full-scan box filter."""

import hashlib

import pandas as pd
import pytest

from lucene_spark.search.prefixtree import (
    cover_box,
    geo_box_prefixtree,
    geohash,
    geohash_bbox,
    GeohashAnalyzer,
)


def test_geohash_known_values():
    # public reference points (geohash.org)
    assert geohash(57.64911, 10.40744, 11) == "u4pruydqqvj"
    assert geohash(42.6, -5.6, 5) == "ezs42"
    assert geohash(0.0, 0.0, 1) == "s"


def test_bbox_roundtrip():
    for lat, lon in [(57.64911, 10.40744), (-33.9, 151.2), (0.001, -0.001)]:
        for p in (1, 3, 5, 7):
            cell = geohash(lat, lon, p)
            lo_lat, hi_lat, lo_lon, hi_lon = geohash_bbox(cell)
            assert lo_lat <= lat < hi_lat
            assert lo_lon <= lon < hi_lon
            # child cells tile the parent
            assert geohash(lat, lon, p + 1).startswith(cell)


def test_cover_box_partitions_plane():
    inside, boundary = cover_box(10.0, 20.0, 30.0, 45.0, max_level=3)
    assert inside and boundary
    # every inside cell lies fully within the box
    for c in inside:
        lo_lat, hi_lat, lo_lon, hi_lon = geohash_bbox(c)
        assert lo_lat >= 10.0 and hi_lat <= 20.0
        assert lo_lon >= 30.0 and hi_lon <= 45.0
    # every boundary cell intersects the box
    for c in boundary:
        lo_lat, hi_lat, lo_lon, hi_lon = geohash_bbox(c)
        assert hi_lat > 10.0 and lo_lat <= 20.0
        assert hi_lon > 30.0 and lo_lon <= 45.0
    # a sampled grid of points is classified consistently
    import numpy as np

    rng = np.random.default_rng(7)
    for lat, lon in zip(rng.uniform(5, 25, 200), rng.uniform(25, 50, 200)):
        h = geohash(lat, lon, 3)
        in_box = 10.0 <= lat <= 20.0 and 30.0 <= lon <= 45.0
        covered_in = any(h.startswith(c) for c in inside)
        covered_bd = any(h.startswith(c) for c in boundary)
        if in_box:
            assert covered_in or covered_bd  # recall: never missed
        if covered_in:
            assert in_box  # inside cells never admit outside points


def test_analyzer_cell_chain():
    an = GeohashAnalyzer(precision=5)
    toks = an.tokenize_one("42.6,-5.6")
    assert toks == ["e", "ez", "ezs", "ezs4", "ezs42"]
    assert an.tokenize_one("garbage") == []


def _coords(n: int) -> pd.DataFrame:
    """Deterministic pseudo-coordinates, same md5 recipe as
    geo.synthesize_geo (doc ids 0..n-1)."""
    rows = []
    for i in range(n):
        h1 = int(hashlib.md5(f"{i}_lat".encode()).hexdigest()[:8], 16)
        h2 = int(hashlib.md5(f"{i}_lon".encode()).hexdigest()[:8], 16)
        rows.append((i, h1 % 180000 / 1000.0 - 90.0, h2 % 360000 / 1000.0 - 180.0))
    return pd.DataFrame(rows, columns=["doc_id", "lat", "lon"])


@pytest.fixture(scope="module")
def geo_index(spark, tmp_path_factory):
    """Index 600 synthetic points under the geohash analyzer; doc ids
    align with _coords by (repo, path, commit) sort order."""
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    pts = _coords(600)
    rows = [
        ("r", f"p{int(r.doc_id):06d}", "c", "geo", f"{r.lat},{r.lon}")
        for r in pts.itertuples()
    ]
    src = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    idx = str(tmp_path_factory.mktemp("geoidx") / "idx")
    build_index(
        spark, src, idx,
        IndexConfig(analyzer="geohash", docs_per_segment=200),
    )
    geo = spark.createDataFrame(pts)
    return IndexReader(spark, idx), geo, pts


@pytest.mark.parametrize(
    "box",
    [
        (10.0, 45.0, 30.0, 80.0),     # large: inside cells dominate
        (-5.0, 5.0, -5.0, 5.0),       # straddles the s/7/e/k corner
        (51.0, 52.0, -0.5, 0.5),      # small: boundary cells only
        (80.0, 90.0, 150.0, 180.0),   # domain corner
    ],
)
def test_box_identity_with_full_scan(geo_index, box):
    reader, geo, pts = geo_index
    got = geo_box_prefixtree(reader, geo, *box, field="content", k=600).toPandas()
    want = pts[
        (pts.lat >= box[0]) & (pts.lat <= box[1])
        & (pts.lon >= box[2]) & (pts.lon <= box[3])
    ].sort_values("doc_id")
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["lat_x1e3"].tolist() == [round(v * 1000) for v in want["lat"]]


def test_postings_scan_is_pruned(geo_index):
    """The inverted path touches only the covering cells' postings rows
    — never the whole term dictionary (the 100-TB argument)."""
    reader, geo, _pts = geo_index
    from lucene_spark.search.prefixtree import cover_box

    inside, boundary = cover_box(10.0, 45.0, 30.0, 80.0, max_level=5)
    n_terms = reader.postings().count()
    assert len(inside) + len(boundary) < 140 < n_terms


def test_heatmap_cell_size_matches_geohash_cells():
    from lucene_spark.search.prefixtree import (
        geohash,
        geohash_bbox,
        heatmap_cell_size,
    )

    for level in (1, 2, 3):
        cw, ch = heatmap_cell_size(level)
        lat_lo, lat_hi, lon_lo, lon_hi = geohash_bbox(
            geohash(12.3, 45.6, precision=level)
        )
        assert abs((lon_hi - lon_lo) - cw) < 1e-9
        assert abs((lat_hi - lat_lo) - ch) < 1e-9


def test_heatmap_counts_brute_force(spark):
    import hashlib
    import math

    from lucene_spark.search.geo import synthesize_geo
    from lucene_spark.search.prefixtree import (
        heatmap_cell_size,
        heatmap_facet_counts,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    box = (10.0, 55.0, -40.0, 60.0)
    level = 2
    got = {
        (r["col"], r["row"]): r["cnt"]
        for r in heatmap_facet_counts(
            synthesize_geo(docs), level, *box
        ).collect()
    }

    def coord(doc_id, tag, mod, off):
        v = int(hashlib.md5(f"{doc_id}{tag}".encode()).hexdigest()[:8], 16)
        return v % mod / 1000.0 - off

    cw, ch = heatmap_cell_size(level)
    cx0 = int((box[2] + 180.0) // cw)
    cy0 = int((box[0] + 90.0) // ch)
    columns = int((box[3] + 180.0) // cw) - cx0 + 1
    rows = int((box[1] + 90.0) // ch) - cy0 + 1
    want: dict = {}
    outside_rect_counted = False
    for r in docs.select("doc_id").collect():
        lat = coord(r["doc_id"], "_lat", 180000, 90.0)
        lon = coord(r["doc_id"], "_lon", 360000, 180.0)
        c = math.floor((lon + 180.0) / cw) - cx0
        w = math.floor((lat + 90.0) / ch) - cy0
        if 0 <= c < columns and 0 <= w < rows:
            want[(c, w)] = want.get((c, w), 0) + 1
            if not (box[0] <= lat <= box[1] and box[2] <= lon <= box[3]):
                outside_rect_counted = True  # whole-cell contract
    assert got == want
    assert outside_rect_counted  # edge cells count their whole cell
    assert sum(got.values()) >= 1


def test_heatmap_accept_filter_and_dateline(spark):
    import pytest as _pytest

    from pyspark.sql import functions as F
    from lucene_spark.search.geo import synthesize_geo
    from lucene_spark.search.prefixtree import heatmap_facet_counts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    g = synthesize_geo(docs)
    accept = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id")
    full = heatmap_facet_counts(g, 2, 10.0, 55.0, -40.0, 60.0)
    half = heatmap_facet_counts(g, 2, 10.0, 55.0, -40.0, 60.0, accept=accept)
    n_full = sum(r["cnt"] for r in full.collect())
    n_half = sum(r["cnt"] for r in half.collect())
    assert 0 < n_half < n_full
    with _pytest.raises(ValueError):
        heatmap_facet_counts(g, 2, 10.0, 55.0, 170.0, -170.0)
