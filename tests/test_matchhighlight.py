"""MatchHighlighter family: PassageSelector + PassageFormatter golden
grid mirrored from the reference's TestPassageSelector.java, plus the
distributed match_highlight end-to-end over an offsets index."""

import pytest

from lucene_spark.search.matchhighlight import (
    format_passages,
    match_highlight,
    pick_best,
)


def passages(value, window, max_passages, highlights, permitted=None):
    ps = pick_best(value, highlights, window, max_passages, permitted)
    return "|".join(format_passages(value, ps, permitted))


# TestPassageSelector goldens (checkPassages calls), verbatim expected
CASES = [
    ("foo >>bar<< baz abc", "foo bar baz abc", 300, 100,
     [(4, 7), (4, 7)], None),
    (">foo >bar< >baz<< abc", "foo bar baz abc", 300, 100,
     [(0, 11), (4, 7), (8, 11)], None),
    (">>foo< bar >baz<< abc", "foo bar baz abc", 300, 100,
     [(0, 11), (0, 3), (8, 11)], None),
    ("foo >bar >baz<<> abc< xyz", "foo bar baz abc xyz", 300, 100,
     [(4, 11), (8, 15)], None),
    (">0<123456789a", "0123456789a", 300, 1, [(0, 1)], None),
    ("0123456789>a<", "0123456789a", 300, 1, [(10, 11)], None),
    (">0123456789a<", "0123456789a", 300, 1, [(0, 11)], None),
    ("0123456789a", "0123456789a", 300, 1, [], None),
    ("01234...", "0123456789a", 5, 1, [], None),
    ("0123|45678", "0123456789a", 15, 2, [], [(0, 4), (4, 9)]),
    (">0<12...", "0123456789a", 4, 1, [(0, 1)], None),
    ("...789>a<", "0123456789a", 4, 1, [(10, 11)], None),
    ("...>3456<...", "0123456789a", 4, 1, [(3, 7)], None),
    ("...3>45<6...", "0123456789a", 4, 1, [(4, 6)], None),
    (">0123<...", "0123456789a", 4, 1, [(0, 11)], None),
    ("...>123456<...", "0123456789a", 6, 1, [(1, 11)], None),
    ("0>12<3>45<6789a", "0123456789a", 300, 1, [(1, 3), (4, 6)], None),
    ("0>123<>45<6789a", "0123456789a", 300, 1, [(1, 4), (4, 6)], None),
    ("0123456789a", "0123456789a", 300, 1, [(100, 200)], None),
    ("01234>567<89a", "0123456789a", 2**31 - 1, 1, [(5, 8)], None),
    ("0>12<3...|...6>78<9...", "0123456789a", 4, 2, [(1, 3), (7, 9)], None),
    ("0>12<|>456789<...", "0123456789a", 6, 2,
     [(1, 11)], [(0, 3), (4, 11)]),
    (">01<...|>45<...", "0123456789a", 2, 2,
     [(0, 11)], [(0, 3), (4, 11)]),
    ("...and then >two< >matches<...|...and then >two< big lon...",
     "a fair amount of space and then two matches here and then two "
     "big long spaces for matches", 20, 2,
     [(32, 35), (36, 43), (58, 61)], None),
]


@pytest.mark.parametrize("expected,value,window,maxp,hl,ranges", CASES)
def test_passage_selector_goldens(expected, value, window, maxp, hl, ranges):
    assert passages(value, window, maxp, hl, ranges) == expected


def test_match_highlight_end_to_end(spark, tmp_path):
    import pandas as pd

    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    rows = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "content": [
            "spark shuffles data between query stages",
            "a query plans the spark work and the query runs",
            "nothing relevant here at all",
        ],
    })
    idx = str(tmp_path / "idx")
    src = spark.createDataFrame(rows)
    build_index(
        spark, src, idx, IndexConfig(doc_id_col="doc_id", store_offsets=True)
    )
    r = IndexReader(spark, idx)
    out = match_highlight(
        r, src, "content", ["query", "spark"], text_col="content",
        max_window=30, max_passages=1, k=10,
    ).collect()
    got = {row["doc_id"]: row["passages"] for row in out}
    assert 2 not in got
    assert got[0] == [">spark< shuffles data between q..."]
    # doc 1's best window holds two markers (more markers wins)
    assert any(">query<" in p and ">spark<" in p for p in got[1])
