"""Classic n-gram SpellChecker (suggest/spell/SpellChecker.java)."""

import pytest

from lucene_spark.search.spelldistance import (
    spell_gram_lengths,
    spellchecker_suggest,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def reader(spark):
    from lucene_spark.gate import ensure_index

    return ensure_index(spark, SF_DIR)


def test_gram_lengths_table():
    # SpellChecker.java:554-572
    assert spell_gram_lengths(10) == (3, 4)
    assert spell_gram_lengths(6) == (3, 4)
    assert spell_gram_lengths(5) == (2, 3)
    assert spell_gram_lengths(4) == (1, 2)
    assert spell_gram_lengths(2) == (1, 2)
    assert spell_gram_lengths(1) == (1, 1)


def test_not_in_index_returns_word_itself(reader):
    """SpellChecker.java:331-334: a word present in the field with
    SUGGEST_WHEN_NOT_IN_INDEX yields the word alone."""
    out = spellchecker_suggest(
        reader, "text", "table", suggest_mode="not_in_index"
    ).toPandas()
    assert list(out.word) == ["table"]
    assert out.freq.iloc[0] > 0


def test_always_mode_suggests_despite_presence(reader):
    out = spellchecker_suggest(
        reader, "text", "table", suggest_mode="always", accuracy=0.1
    ).toPandas()
    assert "table" not in set(out.word)  # never suggests itself
    assert len(out) > 0


def test_misspelling_finds_correction(reader):
    out = spellchecker_suggest(
        reader, "text", "tabel", suggest_mode="always", accuracy=0.4,
        num_sug=5,
    ).toPandas()
    assert "table" in set(out.word)
    # ranked by (score desc, freq desc)
    s = out.score_x1e6.values
    assert (s[:-1] >= s[1:]).all()


def test_more_popular_gates_on_goal_freq(reader):
    """SpellChecker.java:390: with SUGGEST_MORE_POPULAR only
    candidates as frequent or more frequent than the query word pass
    (the reference skips iff goalFreq > sugWord.freq)."""
    from pyspark.sql import functions as F

    dic = (
        reader.term_stats_df()
        .filter(F.col("field") == "text")
        .groupBy("term")
        .agg(F.sum("doc_freq").alias("freq"))
        .toPandas()
    )
    freqs = dict(zip(dic.term, dic.freq))
    word = "table"
    out = spellchecker_suggest(
        reader, "text", word, suggest_mode="more_popular", accuracy=0.3,
        num_sug=50,
    ).toPandas()
    goal = freqs[word]
    for r in out.itertuples():
        assert r.freq >= goal
        assert r.word != word


def test_accuracy_floor(reader):
    hi = spellchecker_suggest(
        reader, "text", "spork", suggest_mode="always", accuracy=0.8,
        num_sug=100,
    ).toPandas()
    lo = spellchecker_suggest(
        reader, "text", "spork", suggest_mode="always", accuracy=0.3,
        num_sug=100,
    ).toPandas()
    assert set(hi.word) <= set(lo.word)
    assert (hi.score_x1e6 >= 800000).all()


def test_unknown_distance_raises(reader):
    with pytest.raises(ValueError, match="unknown distance"):
        spellchecker_suggest(reader, "text", "spork", distance="cosine")
