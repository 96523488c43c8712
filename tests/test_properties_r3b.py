"""Property tests for the round-3 continuation kernels (no Spark):
geohash encode/cover soundness, the fuzzy-suggester prefix-edit-distance
band lemma, phonetic encoder invariants, n-gram tiling."""

from hypothesis import given, settings, strategies as st

from lucene_spark.analysis.extras import (
    NGramFilter,
    refined_soundex,
    soundex,
)
from lucene_spark.search.prefixtree import cover_box, geohash, geohash_bbox

lats = st.floats(min_value=-90.0, max_value=89.999, allow_nan=False)
lons = st.floats(min_value=-180.0, max_value=179.999, allow_nan=False)


@given(lats, lons, st.integers(min_value=1, max_value=9))
def test_geohash_bbox_contains_point_and_nests(lat, lon, p):
    cell = geohash(lat, lon, p)
    lo_lat, hi_lat, lo_lon, hi_lon = geohash_bbox(cell)
    assert lo_lat <= lat < hi_lat
    assert lo_lon <= lon < hi_lon
    # child cell refines the parent
    child = geohash(lat, lon, p + 1)
    assert child.startswith(cell)
    c_lo_lat, c_hi_lat, c_lo_lon, c_hi_lon = geohash_bbox(child)
    assert lo_lat <= c_lo_lat and c_hi_lat <= hi_lat
    assert lo_lon <= c_lo_lon and c_hi_lon <= hi_lon


@settings(deadline=None, max_examples=40)
@given(
    st.floats(min_value=-89.0, max_value=88.0),
    st.floats(min_value=0.5, max_value=40.0),
    st.floats(min_value=-179.0, max_value=139.0),
    st.floats(min_value=0.5, max_value=40.0),
    st.lists(st.tuples(lats, lons), min_size=1, max_size=25),
)
def test_cover_box_soundness(lat0, dlat, lon0, dlon, points):
    """No in-box point escapes the covering; no inside-cell admits an
    out-of-box point (the exactness contract of the prefix-tree path)."""
    box = (lat0, min(89.999, lat0 + dlat), lon0, min(179.999, lon0 + dlon))
    inside, boundary = cover_box(*box, max_level=4)
    for lat, lon in points:
        h = geohash(lat, lon, 4)
        in_box = box[0] <= lat <= box[1] and box[2] <= lon <= box[3]
        hits_in = any(h.startswith(c) for c in inside)
        hits_bd = any(h.startswith(c) for c in boundary)
        if in_box:
            assert hits_in or hits_bd
        if hits_in:
            assert in_box


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@settings(deadline=None, max_examples=200)
@given(
    st.text(alphabet="abcd", min_size=1, max_size=8),
    st.text(alphabet="abcd", min_size=1, max_size=14),
    st.integers(min_value=1, max_value=2),
)
def test_prefix_edit_distance_band_lemma(q, key, k):
    """The fuzzy suggester evaluates min levenshtein only over prefix
    lengths in [len(q)-k, len(q)+k]. Lemma: whenever the true prefix
    edit distance (min over ALL prefix lengths) is <= k, the banded
    minimum equals it — so the predicate `banded <= k` is exact."""
    all_l = min(_lev(q, key[:L]) for L in range(len(key) + 1))
    # substr(key, 1, L) caps L at len(key) — mirror that, so the band
    # is never empty even for keys shorter than len(q) - k
    band = min(
        _lev(q, key[: min(L, len(key))])
        for L in range(max(0, len(q) - k), len(q) + k + 1)
    )
    assert band >= all_l
    if all_l <= k:
        assert band == all_l


@given(
    st.text(
        alphabet="abcdefghijklmnopqrstuvwxyzABCXYZ0123 .-'", max_size=12
    )
)
def test_soundex_shape(word):
    code = soundex(word)
    if any("a" <= c.lower() <= "z" for c in word):
        assert len(code) == 4
        assert code[0].isalpha() and code[0].isupper()
        assert all(c.isdigit() for c in code[1:])
    else:
        assert code == ""
    # stable under case and non-letter noise
    assert code == soundex(word.upper()) == soundex(word.lower())
    r = refined_soundex(word)
    if code:
        assert r[0] == code[0]
        assert all(c.isdigit() for c in r[1:])


@given(st.text(alphabet="xyz", max_size=10), st.integers(1, 3), st.integers(0, 3))
def test_ngram_filter_tiles(tok, mn, extra):
    mx = mn + extra
    grams = NGramFilter(mn, mx).apply([tok])
    # every gram is a substring with length in range, in scan order
    for g in grams:
        assert mn <= len(g) <= mx and g in tok
    want = [
        tok[i : i + g]
        for i in range(len(tok))
        for g in range(mn, min(mx, len(tok) - i) + 1)
    ]
    assert grams == want
