"""Geohash prefix-tree geo indexing — the spatial-extras
RecursivePrefixTreeStrategy analog.

Reference semantics (spatial-extras/src/java/org/apache/lucene/spatial/
prefix/RecursivePrefixTreeStrategy.java + prefix/tree/
GeohashPrefixTree.java): a point is indexed as the chain of grid cells
containing it — its geohash plus every prefix — so spatial filters
become TERM queries: cover the query shape with grid cells, accept
every doc indexed under a fully-contained cell, and exactly refine only
the docs under boundary cells (the INTERSECTS recursion with
detailLevel bounding).

Why this matters at 100 TB: the column-predicate geo path (search/
geo.py) scans every row group the box's lat/lon stats admit; the
prefix-tree path goes through the INVERTED index — the postings scan is
pruned to a few dozen (field, term) rows regardless of corpus size, and
only boundary-cell candidates are joined back for exact refinement.
This is precisely the Lucene trade: term-indexed grids when the filter
is much smaller than the data.

Geohash (public domain, Niemeyer 2008): interleaved lon/lat bit
bisection, base-32 alphabet ``0123456789bcdefghjkmnpqrstuvwxyz``; each
extra character multiplies precision by 32 (level-5 cells are about
4.9 km x 4.9 km). Cells are half-open [min, max) in both axes, so a
point on a cell's max edge encodes into the neighbor — fully-contained
cell acceptance stays exact against the inclusive box refine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from lucene_spark.analysis.analyzer import Analyzer

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash(lat: float, lon: float, precision: int = 7) -> str:
    """Encode one point. Bits alternate lon (even) / lat (odd)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    out = []
    bit = 0
    ch = 0
    even = True
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch <<= 1
                lat_hi = mid
        even = not even
        bit += 1
        if bit == 5:
            out.append(_BASE32[ch])
            bit = 0
            ch = 0
    return "".join(out)


def geohash_bbox(cell: str) -> tuple[float, float, float, float]:
    """-> (min_lat, max_lat, min_lon, max_lon) of a cell (half-open)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    even = True
    for c in cell:
        v = _BASE32.index(c)
        for b in (16, 8, 4, 2, 1):
            if even:
                mid = (lon_lo + lon_hi) / 2
                if v & b:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if v & b:
                    lat_lo = mid
                else:
                    lat_hi = mid
            even = not even
    return lat_lo, lat_hi, lon_lo, lon_hi


def cover_box(
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    max_level: int = 5,
    max_cells: int = 128,
) -> tuple[list[str], list[str]]:
    """Cover the box with grid cells (the INTERSECTS recursion):
    -> (inside_cells, boundary_cells). Inside cells lie fully within
    the box; boundary cells intersect it partially and need per-doc
    refinement. Descent stops at max_level or when splitting would
    exceed max_cells (the cell is then kept as boundary — coarser but
    still correct)."""
    inside: list[str] = []
    boundary: list[str] = []
    frontier = [c for c in _BASE32]

    def classify(cell: str) -> str:
        c_lat_lo, c_lat_hi, c_lon_lo, c_lon_hi = geohash_bbox(cell)
        # cells hold points in [lo, hi); the box test is inclusive.
        # disjoint: every cell point is strictly outside the box
        if (
            c_lat_hi <= min_lat or c_lat_lo > max_lat
            or c_lon_hi <= min_lon or c_lon_lo > max_lon
        ):
            return "out"
        # contained: every cell point satisfies the inclusive box
        # (conservative on the max edge — a cell whose hi exceeds the
        # box max goes to boundary and is refined exactly)
        if (
            c_lat_lo >= min_lat and c_lat_hi <= max_lat
            and c_lon_lo >= min_lon and c_lon_hi <= max_lon
        ):
            return "in"
        return "part"

    while frontier:
        cell = frontier.pop()
        cls = classify(cell)
        if cls == "out":
            continue
        if cls == "in":
            inside.append(cell)
            continue
        if (
            len(cell) >= max_level
            or len(inside) + len(boundary) + len(frontier) + 32 > max_cells
        ):
            boundary.append(cell)
        else:
            frontier.extend(cell + c for c in _BASE32)
    return sorted(inside), sorted(boundary)


class GeohashAnalyzer(Analyzer):
    """Index-side tokenizer: field text ``"lat,lon"`` -> the cell chain
    [h[:1], h[:2], ..., h[:precision]] (RecursivePrefixTreeStrategy
    indexes every ancestor cell so coarse covering cells hit directly).
    """

    name = "geohash"

    def __init__(self, precision: int = 7):
        self.precision = precision

    def tokenize_one(self, text: str) -> list[str]:
        try:
            lat_s, lon_s = text.split(",", 1)
            h = geohash(float(lat_s), float(lon_s), self.precision)
        except (ValueError, AttributeError):
            return []
        return [h[:i] for i in range(1, self.precision + 1)]


def _docs_for_cells(reader, field: str, cells: list[str]) -> DataFrame:
    """Doc ids indexed under any of the cells — a pruned postings scan
    (field + term-in-set reach the parquet reader), decoded once."""
    from lucene_spark.search.sqlpath import exploded_postings

    spark = reader.spark
    if not cells:
        return spark.createDataFrame([], "doc_id long")
    return exploded_postings(reader, field, cells).select("doc_id").distinct()


def geo_box_prefixtree(
    reader,
    geo: DataFrame,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    field: str = "geo",
    max_level: int = 5,
    k: int = 50,
) -> DataFrame:
    """Box filter through the prefix tree: inside-cell docs accepted
    from the postings alone; boundary-cell docs joined to `geo`
    (doc_id, lat, lon) for the exact inclusive test. -> (doc_id,
    lat_x1e3, lon_x1e3) ordered by doc_id, same contract as
    geo.geo_box."""
    inside, boundary = cover_box(min_lat, max_lat, min_lon, max_lon, max_level)
    accepted = _docs_for_cells(reader, field, inside)
    cand = _docs_for_cells(reader, field, boundary)
    refined = (
        cand.join(geo, "doc_id")
        .filter(
            (F.col("lat") >= min_lat) & (F.col("lat") <= max_lat)
            & (F.col("lon") >= min_lon) & (F.col("lon") <= max_lon)
        )
        .select("doc_id")
    )
    hits = accepted.unionByName(refined).distinct().join(geo, "doc_id")
    return (
        hits.select(
            "doc_id",
            F.round(F.col("lat") * 1000).cast("long").alias("lat_x1e3"),
            F.round(F.col("lon") * 1000).cast("long").alias("lon_x1e3"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# HeatmapFacetCounter (spatial-extras prefix/HeatmapFacetCounter.java):
# per-grid-cell doc counts at a target tree level. A geohash level-L
# cell IS a regular grid cell (5L interleaved bits: ceil(5L/2) lon
# bisections x floor(5L/2) lat bisections), so counting docs per cell
# is one floor-quantize + groupBy — map-side combined, one shuffle of
# at most columns x rows rows, no custom structure. Point fields index
# full-depth cell chains, so the reference's ancestor-redistribution
# branch (non-point shapes coarser than facetLevel) never fires here.
# ---------------------------------------------------------------------------


def heatmap_cell_size(level: int) -> tuple[float, float]:
    """(cell_width_deg, cell_height_deg) of geohash cells at `level`."""
    bits = 5 * level
    return 360.0 / (1 << ((bits + 1) // 2)), 180.0 / (1 << (bits // 2))


def _heatmap_frame(
    level: int, min_lat: float, max_lat: float,
    min_lon: float, max_lon: float,
) -> tuple[float, float, int, int, int, int]:
    """-> (cw, ch, cx0, cy0, columns, rows): the corner-cell-anchored
    grid covering the input rect (calcFacets corner-cell + calcRowsOrCols
    roles). Dateline-crossing rects are not supported (raise), matching
    this engine's box-query contract of explicit pre-split."""
    if min_lon > max_lon:
        raise ValueError("dateline-crossing heatmap rect: split it first")
    cw, ch = heatmap_cell_size(level)
    cx0 = int((min_lon + 180.0) // cw)
    cy0 = int((min_lat + 90.0) // ch)
    columns = int((max_lon + 180.0) // cw) - cx0 + 1
    rows = int((max_lat + 90.0) // ch) - cy0 + 1
    return cw, ch, cx0, cy0, columns, rows


def heatmap_facet_counts(
    geo: DataFrame,
    level: int,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    accept: DataFrame | None = None,
) -> DataFrame:
    """-> (col, row, cnt) for the NON-ZERO level-`level` cells whose
    grid square intersects the rect; col/row are relative to the corner
    cell (the cell containing the rect's min corner — the reference's
    Heatmap coordinate frame, sparse instead of the dense int[] since
    a 100-TB heatmap response should be O(occupied cells)). Edge cells
    count ALL their docs, including those outside the rect — the
    reference counts whole cells, not clipped points. ``accept``
    (optional DataFrame of doc_id) is the topAcceptDocs bitset role."""
    cw, ch, cx0, cy0, columns, rows = _heatmap_frame(
        level, min_lat, max_lat, min_lon, max_lon
    )
    g = geo
    if accept is not None:
        g = g.join(accept.select("doc_id"), "doc_id", "left_semi")
    col = F.floor((F.col("lon") + 180.0) / cw).cast("long") - cx0
    row = F.floor((F.col("lat") + 90.0) / ch).cast("long") - cy0
    return (
        g.select(col.alias("col"), row.alias("row"))
        .filter(
            (F.col("col") >= 0) & (F.col("col") < columns)
            & (F.col("row") >= 0) & (F.col("row") < rows)
        )
        .groupBy("col", "row")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def heatmap_sql(
    level: int,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> str:
    """DuckDB oracle: identical frame + floor quantization over the
    synthesized coordinates (geo._GEO_SQL)."""
    from lucene_spark.search.geo import _GEO_SQL

    cw, ch, cx0, cy0, columns, rows = _heatmap_frame(
        level, min_lat, max_lat, min_lon, max_lon
    )
    return f"""WITH {_GEO_SQL}
SELECT col, row, COUNT(*) AS cnt FROM (
  SELECT CAST(FLOOR((lon + 180.0) / {cw!r}) AS BIGINT) - {cx0} AS col,
         CAST(FLOOR((lat + 90.0) / {ch!r}) AS BIGINT) - {cy0} AS row
  FROM g
)
WHERE col >= 0 AND col < {columns} AND row >= 0 AND row < {rows}
GROUP BY col, row"""


# ---------------------------------------------------------------------------
# QuadPrefixTree (spatial-extras prefix/tree/QuadPrefixTree.java +
# PackedQuadPrefixTree.java): the alternative grid beside geohash —
# every level splits the cell in four (A/B/C/D letters in the legacy
# tree; interleaved y,x bit pairs in the packed tree).  A level-L quad
# cell is a regular 360/2^L x 180/2^L degree square, so the heatmap /
# facet machinery reuses the corner-anchored sparse-grid shape.
# ---------------------------------------------------------------------------


def quad_cell_size(level: int) -> tuple[float, float]:
    """(cell width, cell height) of a level-`level` quad cell over the
    geo world bounds (QuadPrefixTree.java:58-66: levelW[i] =
    gridW / 2^(i+1) — level L cells are gridW/2^L wide)."""
    if level < 1:
        raise ValueError("level must be >= 1")
    return 360.0 / (1 << level), 180.0 / (1 << level)


def quad_cell_token(lat: float, lon: float, level: int) -> str:
    """The legacy QuadCell letter token of the level-`level` cell
    containing the point (QuadPrefixTree.java makeShape:302-335 run in
    reverse): per level, A=upper-left, B=upper-right, C=lower-left,
    D=lower-right of the parent cell.  Points on the world's max edges
    clamp into the last cell (the reference's grid never emits an
    out-of-range cell for a valid point)."""
    if level < 1:
        raise ValueError("level must be >= 1")
    n = 1 << level
    ix = min(int((lon + 180.0) / (360.0 / n)), n - 1)
    iy = min(int((lat + 90.0) / (180.0 / n)), n - 1)
    out = []
    for i in range(level - 1, -1, -1):
        xb = (ix >> i) & 1
        yb = (iy >> i) & 1
        out.append("CD"[xb] if yb == 0 else "AB"[xb])
    return "".join(out)


def packed_quad_token(lat: float, lon: float, level: int) -> int:
    """PackedQuadPrefixTree.java cell identity: the interleaved
    (y, x) bit pairs of the cell coordinates — identical information
    to the letter token, packed into an integer (the packed tree
    exists precisely because the letters waste 6 bits/level)."""
    if level < 1:
        raise ValueError("level must be >= 1")
    n = 1 << level
    ix = min(int((lon + 180.0) / (360.0 / n)), n - 1)
    iy = min(int((lat + 90.0) / (180.0 / n)), n - 1)
    out = 0
    for i in range(level - 1, -1, -1):
        out = (out << 2) | (((iy >> i) & 1) << 1) | ((ix >> i) & 1)
    return out


def quad_cell_rect(token: str) -> tuple[float, float, float, float]:
    """QuadCell.makeShape (QuadPrefixTree.java:302-335) verbatim:
    token -> (min_lat, min_lon, max_lat, max_lon)."""
    xmin, ymin = -180.0, -90.0
    level_w = [360.0 / (1 << (i + 1)) for i in range(len(token))]
    level_h = [180.0 / (1 << (i + 1)) for i in range(len(token))]
    for i, c in enumerate(token):
        if c == "A":
            ymin += level_h[i]
        elif c == "B":
            xmin += level_w[i]
            ymin += level_h[i]
        elif c == "D":
            xmin += level_w[i]
        elif c != "C":
            raise ValueError(f"unexpected char: {c}")
    w = level_w[-1] if token else 360.0
    h = level_h[-1] if token else 180.0
    return ymin, xmin, ymin + h, xmin + w


def quad_heatmap_facet_counts(
    geo: DataFrame,
    level: int,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
    accept: DataFrame | None = None,
) -> DataFrame:
    """HeatmapFacetCounter over a QuadPrefixTree grid instead of the
    geohash grid: -> (col, row, cnt) of non-zero level-`level` quad
    cells intersecting the rect, corner-cell coordinate frame,
    whole-cell counting (see heatmap_facet_counts for the contract).
    One floor-quantize + map-side-combined groupBy — the same single
    shuffle regardless of grid flavor."""
    if min_lon > max_lon:
        raise ValueError("dateline-crossing heatmap rect: split it first")
    cw, ch = quad_cell_size(level)
    cx0 = int((min_lon + 180.0) // cw)
    cy0 = int((min_lat + 90.0) // ch)
    columns = int((max_lon + 180.0) // cw) - cx0 + 1
    rows = int((max_lat + 90.0) // ch) - cy0 + 1
    g = geo
    if accept is not None:
        g = g.join(accept.select("doc_id"), "doc_id", "left_semi")
    col = F.floor((F.col("lon") + 180.0) / cw).cast("long") - cx0
    row = F.floor((F.col("lat") + 90.0) / ch).cast("long") - cy0
    return (
        g.select(col.alias("col"), row.alias("row"))
        .filter(
            (F.col("col") >= 0) & (F.col("col") < columns)
            & (F.col("row") >= 0) & (F.col("row") < rows)
        )
        .groupBy("col", "row")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def quad_heatmap_sql(
    level: int,
    min_lat: float,
    max_lat: float,
    min_lon: float,
    max_lon: float,
) -> str:
    """DuckDB twin over the shared geo CTE (g)."""
    from lucene_spark.search.geo import _GEO_SQL

    cw, ch = quad_cell_size(level)
    cx0 = int((min_lon + 180.0) // cw)
    cy0 = int((min_lat + 90.0) // ch)
    columns = int((max_lon + 180.0) // cw) - cx0 + 1
    rows = int((max_lat + 90.0) // ch) - cy0 + 1
    return f"""WITH {_GEO_SQL}
SELECT col, row, count(*) AS cnt FROM (
  SELECT CAST(FLOOR((lon + 180.0) / {cw!r}) AS BIGINT) - {cx0} AS col,
         CAST(FLOOR((lat + 90.0) / {ch!r}) AS BIGINT) - {cy0} AS row
  FROM g
) WHERE col >= 0 AND col < {columns} AND row >= 0 AND row < {rows}
GROUP BY col, row"""
