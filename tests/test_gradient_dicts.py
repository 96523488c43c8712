"""GradientFormatter / SpanGradientFormatter + the spell dictionary
sources (HighFrequencyDictionary, PlainTextDictionary)."""

import pytest

from lucene_spark.search.classic_highlight import (
    GradientFormatter,
    SpanGradientFormatter,
    _hex_to_int,
    _int_to_hex,
)

SF_DIR = "/root/testdata/sf0.001"


def test_hex_roundtrip():
    assert _hex_to_int("FF") == 255
    assert _hex_to_int("00") == 0
    assert _hex_to_int("7f") == 127  # Character.digit accepts lower
    assert _int_to_hex(255) == "FF"
    assert _int_to_hex(0) == "00"
    assert _int_to_hex(171) == "AB"
    with pytest.raises(ValueError):
        _hex_to_int("zz")


def test_gradient_interpolation_endpoints():
    g = GradientFormatter(
        1.0, min_background="#000000", max_background="#FF0000"
    )
    # score 0 -> original untouched (highlightTerm early return)
    assert g.highlight_term("word", 0.0) == "word"
    assert g.background(1.0) == "#FF0000"
    # half score: int truncation of 255 * 0.5 = 127 -> 7F
    assert g.background(0.5) == "#7F0000"
    # scores above maxScore clamp (min(maxScore, score))
    assert g.background(9.0) == "#FF0000"


def test_gradient_min_equals_max_channel():
    g = GradientFormatter(
        1.0, min_background="#12AB34", max_background="#12AB34"
    )
    assert g.background(0.3) == "#12AB34"


def test_gradient_markup_shape():
    g = GradientFormatter(
        1.0,
        min_foreground="#000000", max_foreground="#FFFFFF",
        min_background="#202020", max_background="#404040",
    )
    out = g.highlight_term("hit", 1.0)
    assert out.startswith("<font ") and out.endswith("</font>")
    assert 'color="#FFFFFF"' in out and 'bgcolor="#404040"' in out


def test_gradient_descending_channels_quirk():
    """getColorVal (GradientFormatter.java:100-108) interpolates from
    min(colorMin, colorMax) UPWARD regardless of which endpoint is the
    min color — a descending channel therefore BRIGHTENS with score.
    Kept faithfully."""
    g = GradientFormatter(
        1.0, min_background="#FF0000", max_background="#000000"
    )
    assert g.background(1.0) == "#FF0000"
    assert g.background(0.0) == "#000000"


def test_bad_color_raises():
    with pytest.raises(ValueError, match="7 bytes"):
        GradientFormatter(1.0, min_background="#FFF", max_background="#FFFFFF")


def test_span_gradient_css():
    g = SpanGradientFormatter(
        1.0, min_background="#000000", max_background="#FF0000"
    )
    out = g.highlight_term("hit", 1.0)
    assert out == '<span style="background: #FF0000; ">hit</span>'


# --------------------------- dictionaries ------------------------------


def test_high_frequency_dictionary(spark):
    from lucene_spark.gate import ensure_index
    from lucene_spark.search.suggesters import high_frequency_dictionary

    r = ensure_index(spark, SF_DIR)
    coll = r.collection_stats("text")
    thresh = 0.5
    out = high_frequency_dictionary(r, "text", thresh).toPandas()
    min_docs = int(thresh * coll.doc_count)
    assert (out.weight >= min_docs).all()
    # thresh 0 == LuceneDictionary: the whole term dictionary
    full = high_frequency_dictionary(r, "text", 0.0).toPandas()
    assert len(full) > len(out)
    assert set(out.surface) <= set(full.surface)


def test_plain_text_dictionary(spark, tmp_path):
    from lucene_spark.search.suggesters import plain_text_dictionary

    p = tmp_path / "words.txt"
    p.write_text("alpha\nbeta\n\n  gamma  \n")
    out = plain_text_dictionary(spark, str(p)).toPandas()
    assert sorted(out.surface) == ["alpha", "beta", "gamma"]
    assert (out.weight == 1).all()
