"""Matches API — lucene_spark/search/matches.py (Weight#matches /
MatchesIterator semantics; MatchRegionRetriever consumer shape)."""

import re

import pandas as pd
import pytest

from lucene_spark.search.matches import (
    phrase_match_regions,
    term_match_regions,
)

TEXTS = {
    0: "fast scan beats slow scan on a fast table",
    1: "the fast scan wins; fast scan again",
    2: "nothing relevant here",
    3: "scan fast is not fast scan",
}


@pytest.fixture(scope="module")
def offsets_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    path = str(tmp_path_factory.mktemp("match") / "idx")
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": list(TEXTS), "text": list(TEXTS.values())})
    )
    build_index(
        spark, docs, path,
        IndexConfig(field="text", content_col="text", analyzer="simple",
                    doc_id_col="doc_id", docs_per_segment=2,
                    store_offsets=True),
    )
    return IndexReader(spark, path)


def _replay(term):
    """Ground truth straight from the text: simple-analyzer occurrence
    list (doc, position, char start, char end)."""
    out = []
    for d, t in TEXTS.items():
        pos = -1
        for m in re.finditer(r"[a-z0-9]+", t.lower()):
            pos += 1
            if m.group(0) == term:
                out.append((d, term, pos, m.start(), m.end()))
    return out


def test_term_regions_match_text_replay(offsets_index):
    got = [
        tuple(r)
        for r in term_match_regions(
            offsets_index, "text", ["fast", "scan"], doc_ids=[0, 1, 2, 3]
        ).collect()
    ]
    want = sorted(
        _replay("fast") + _replay("scan"),
        key=lambda r: (r[0], r[2], r[1]),
    )
    assert got == want


def test_term_regions_respect_doc_filter(offsets_index):
    got = term_match_regions(
        offsets_index, "text", ["fast"], doc_ids=[1]
    ).collect()
    assert {r["doc_id"] for r in got} == {1}
    assert len(got) == 2


def test_phrase_regions_exact_only(offsets_index):
    got = [
        (r["doc_id"], r["position"], r["start_offset"], r["end_offset"])
        for r in phrase_match_regions(
            offsets_index, "text", ["fast", "scan"], doc_ids=[0, 1, 2, 3]
        ).collect()
    ]
    # replay: exact adjacent 'fast scan' occurrences with char spans
    want = []
    for d, t in TEXTS.items():
        toks = [(m.group(0), m.start(), m.end())
                for m in re.finditer(r"[a-z0-9]+", t.lower())]
        for i in range(len(toks) - 1):
            if toks[i][0] == "fast" and toks[i + 1][0] == "scan":
                want.append((d, i, toks[i][1], toks[i + 1][2]))
    assert got == sorted(want)
    # doc 3 contains 'scan fast' (reversed) AND 'fast scan' — only the
    # in-order occurrence reports
    assert sum(1 for r in got if r[0] == 3) == 1


def test_region_text_roundtrip(offsets_index):
    # MatchRegionRetriever contract: the offsets slice the ORIGINAL
    # text back to the matched surface
    for r in phrase_match_regions(
        offsets_index, "text", ["fast", "scan"], doc_ids=[0, 1, 3]
    ).collect():
        assert TEXTS[r["doc_id"]][r["start_offset"]:r["end_offset"]].lower() == "fast scan"
