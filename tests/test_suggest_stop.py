"""SuggestStopFilter (suggest/analyzing/SuggestStopFilter.java):
a final stopword with NO trailing separator survives; everything else
stops out (reference TestSuggestStopFilter scenarios)."""

import pandas as pd
import pytest

from lucene_spark.search.suggesters import analyzing_suggest, suggest_stop_key

STOPS = {"to", "the", "a"}


@pytest.mark.parametrize("typed,key", [
    ("go to ", "go"),            # trailing separator: 'to' is a stopword
    ("go to", "go to"),          # mid-typing: kept
    ("go to the school", "go school"),
    ("go to the", "go the"),     # inner 'to' dropped, final 'the' kept
    ("the", "the"),              # lone trailing stopword kept
    ("the ", ""),                # lone completed stopword dropped
    ("find the popsicle", "find popsicle"),
])
def test_suggest_stop_key(typed, key):
    assert suggest_stop_key(typed, STOPS, "simple") == key


def test_analyzing_suggest_with_stop_words(spark):
    d = spark.createDataFrame(pd.DataFrame({
        "surface": ["find the theory", "find popsicle", "find the port"],
        "weight": [3, 2, 1],
    }))
    # 'find the' keeps 'the' -> matches keys whose next token starts
    # with 'the' (dictionary side drops stopwords: 'find theory' ...)
    got = analyzing_suggest(d, "find the", stop_words=STOPS, k=5)
    assert [r["surface"] for r in got.collect()] == ["find the theory"]
    # trailing separator completes the stopword -> all 'find ...' match
    got = analyzing_suggest(d, "find the ", stop_words=STOPS, k=5)
    assert [r["surface"] for r in got.collect()] == [
        "find the theory", "find popsicle", "find the port"]


def test_file_dictionary(spark, tmp_path):
    from lucene_spark.search.suggesters import analyzing_suggest, file_dictionary

    p = tmp_path / "dict.txt"
    p.write_text(
        "word1 word2\t100\tpayload1\n"
        "word3\t101\n"
        "word4 word3\n"
        "word5\t20\n"
    )
    d = file_dictionary(spark, str(p))
    rows = {r["surface"]: (r["weight"], r["payload"]) for r in d.collect()}
    assert rows == {
        "word1 word2": (100, "payload1"),
        "word3": (101, ""),
        "word4 word3": (1, ""),   # missing weight defaults to 1
        "word5": (20, ""),
    }
    got = analyzing_suggest(d, "word", k=2)
    assert [r["surface"] for r in got.collect()] == ["word3", "word1 word2"]


def test_check_join_index(spark):
    import pandas as pd
    import pytest as _pytest

    from lucene_spark.search.joins import check_join_index

    parents = spark.createDataFrame(pd.DataFrame({"pid": [1, 2]}))
    ok_children = spark.createDataFrame(
        pd.DataFrame({"pid": [1, 1, 2], "v": [1, 2, 3]}))
    check_join_index(parents, ok_children, "pid", "pid")  # silent
    bad_children = spark.createDataFrame(
        pd.DataFrame({"pid": [1, 3], "v": [1, 2]}))
    with _pytest.raises(ValueError, match="orphaned child"):
        check_join_index(parents, bad_children, "pid", "pid")
