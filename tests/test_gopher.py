"""Gopher quality rules (Rae et al. 2021 appendix A1.1)."""

import pytest
from pyspark.sql import functions as F

from lucene_spark.pipeline.textstats import GOPHER_STOPWORDS, gopher_rules


def _eval(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = gopher_rules(df, k=100).toPandas()
    return {r.doc_id: r for r in out.itertuples()}


def test_word_count_bounds(spark):
    short = "the be to of and that have with more words here"
    ok = " ".join(["the be to of and that have with okay fine"] * 8)
    got = _eval(spark, [short, ok])
    assert got[0].fail_mask & 1  # 11 words < 50
    assert not (got[1].fail_mask & 1)


def test_mean_word_length(spark):
    # 60 single-char words -> mean 1 < 3 -> bit 2
    t = " ".join(["a"] * 58 + ["the", "be"])
    got = _eval(spark, [t])
    assert got[0].fail_mask & 2


def test_symbol_ratio(spark):
    base = ["the be to of and that have with word" + str(i) for i in range(6)]
    noisy = " ".join(base) + " " + "# " * 30
    got = _eval(spark, [noisy])
    assert got[0].fail_mask & 4


def test_bullet_and_ellipsis_lines(spark):
    words = "the be to of and that have with"
    bullets = "\n".join(f"- item {i} {words}" for i in range(10))
    got = _eval(spark, [bullets])
    assert got[0].fail_mask & 8
    ell = "\n".join(f"truncated {words} line {i}..." for i in range(10))
    got2 = _eval(spark, [ell])
    assert got2[0].fail_mask & 16


def test_alpha_and_stopwords(spark):
    nums = " ".join(str(i) for i in range(60)) + " the be"
    got = _eval(spark, [nums])
    assert got[0].fail_mask & 32
    nostop = " ".join(f"word{i}" for i in range(60))
    got2 = _eval(spark, [nostop])
    assert got2[0].fail_mask & 64
    assert len(GOPHER_STOPWORDS) == 8


def test_clean_doc_kept(spark):
    t = " ".join(
        ["the quick brown fox jumps over lazy dogs be to of and that"
         " have with plenty more normal words in this document"] * 5
    )
    got = _eval(spark, [t])
    assert got[0].fail_mask == 0 and got[0].kept == 1


# --------------------------- C4 heuristics -----------------------------


def _c4(spark, texts):
    from lucene_spark.pipeline.textstats import c4_filters

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = c4_filters(df, k=100).toPandas()
    return {r.doc_id: r for r in out.itertuples()}


def test_c4_line_rules(spark):
    good = "This sentence has at least five words here."
    short = "Too short."                       # < 5 words
    nopunct = "this line has five words but no terminal"
    js = "Please enable javascript to view this page content."
    page = "\n".join([good, good, good, short, nopunct, js])
    got = _c4(spark, [page])
    assert got[0].n_lines == 6
    assert got[0].n_kept == 3
    assert got[0].page_kept == 1


def test_c4_page_rules(spark):
    good = "This sentence has at least five words here."
    two = "\n".join([good, good])              # < 3 surviving lines
    lorem = "\n".join([good] * 4) + "\nLorem Ipsum dolor sit amet."
    brace = "\n".join([good] * 4) + "\nfunction f() { return 1; }"
    got = _c4(spark, [two, lorem, brace, "\n".join([good] * 3)])
    assert got[0].page_kept == 0
    assert got[1].page_kept == 0
    assert got[2].page_kept == 0
    assert got[3].page_kept == 1


def test_c4_quote_terminal(spark):
    q = 'He said the whole thing was "absolutely fine and normal."'
    qq = 'She replied that everything would be "handled by tomorrow evening."'
    r = "A third sentence with plenty of words to survive."
    got = _c4(spark, ["\n".join([q, qq, r])])
    assert got[0].n_kept == 3 and got[0].page_kept == 1
