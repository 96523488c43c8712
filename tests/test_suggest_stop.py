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
