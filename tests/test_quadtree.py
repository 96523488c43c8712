"""QuadPrefixTree / PackedQuadPrefixTree cells (spatial-extras
prefix/tree/QuadPrefixTree.java, PackedQuadPrefixTree.java)."""

import random

import pytest

from lucene_spark.search.prefixtree import (
    packed_quad_token,
    quad_cell_rect,
    quad_cell_size,
    quad_cell_token,
)


def test_cell_sizes_halve_per_level():
    assert quad_cell_size(1) == (180.0, 90.0)
    assert quad_cell_size(2) == (90.0, 45.0)
    w4, h4 = quad_cell_size(4)
    assert (w4, h4) == (22.5, 11.25)
    with pytest.raises(ValueError):
        quad_cell_size(0)


def test_letter_quadrants_level1():
    # A=upper-left B=upper-right C=lower-left D=lower-right
    # (QuadPrefixTree.java makeShape:310-321)
    assert quad_cell_token(45.0, -90.0, 1) == "A"
    assert quad_cell_token(45.0, 90.0, 1) == "B"
    assert quad_cell_token(-45.0, -90.0, 1) == "C"
    assert quad_cell_token(-45.0, 90.0, 1) == "D"


def test_token_rect_roundtrip():
    """token(point) -> makeShape rect must contain the point, with the
    exact reference geometry."""
    rng = random.Random(11)
    for _ in range(300):
        lat = rng.uniform(-90, 90)
        lon = rng.uniform(-180, 180)
        for level in (1, 2, 4, 7):
            tok = quad_cell_token(lat, lon, level)
            assert len(tok) == level
            y0, x0, y1, x1 = quad_cell_rect(tok)
            assert y0 <= lat <= y1 and x0 <= lon <= x1, (tok, lat, lon)
            w, h = quad_cell_size(level)
            assert x1 - x0 == pytest.approx(w)
            assert y1 - y0 == pytest.approx(h)


def test_world_edges_clamp():
    # valid max-edge points stay inside the last cell
    assert quad_cell_token(90.0, 180.0, 3) == "BBB"
    assert quad_cell_token(-90.0, -180.0, 3) == "CCC"


def test_packed_token_matches_letters():
    """The packed form is the letter token's (y, x) bit pairs
    (PackedQuadPrefixTree's space optimization — same identity)."""
    letter_bits = {"C": 0b00, "D": 0b01, "A": 0b10, "B": 0b11}
    rng = random.Random(5)
    for _ in range(200):
        lat = rng.uniform(-90, 90)
        lon = rng.uniform(-180, 180)
        lv = rng.choice([1, 2, 5])
        tok = quad_cell_token(lat, lon, lv)
        want = 0
        for c in tok:
            want = (want << 2) | letter_bits[c]
        assert packed_quad_token(lat, lon, lv) == want


def test_quad_heatmap_matches_brute(spark):
    from lucene_spark.search.geo import synthesize_geo
    from lucene_spark.search.prefixtree import quad_heatmap_facet_counts

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    g = synthesize_geo(docs)
    out = quad_heatmap_facet_counts(
        g, 4, 10.0, 55.0, -40.0, 60.0
    ).toPandas()
    pts = g.toPandas()
    cw, ch = quad_cell_size(4)
    cx0 = int((-40.0 + 180.0) // cw)
    cy0 = int((10.0 + 90.0) // ch)
    cols = int((60.0 + 180.0) // cw) - cx0 + 1
    rows = int((55.0 + 90.0) // ch) - cy0 + 1
    brute = {}
    for r in pts.itertuples():
        c = int((r.lon + 180.0) // cw) - cx0
        w = int((r.lat + 90.0) // ch) - cy0
        if 0 <= c < cols and 0 <= w < rows:
            brute[(c, w)] = brute.get((c, w), 0) + 1
    got = {(r.col, r.row): r.cnt for r in out.itertuples()}
    assert got == brute and len(got) > 0
