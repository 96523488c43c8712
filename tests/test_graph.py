"""Token-graph analysis: SynonymGraphFilter / WordDelimiterGraphFilter /
FlattenGraphFilter / analyzeGraphPhrase (lucene_spark/analysis/graph.py).

Golden (term, posInc, posLen) streams mirror the reference's
assertTokenStreamContents expectations (TestSynonymGraphFilter.java,
TestWordDelimiterGraphFilter.java, TestFlattenGraphFilter.java), e.g.
dns => "domain name service" keepOrig flattens to domain(1,1) dns(0,3)
name(1,1) service(1,1).
"""

import pytest

from lucene_spark.analysis.graph import (
    GraphAnalyzer,
    SynonymGraphFilter,
    SynonymGraphMap,
    WordDelimiterGraphFilter,
    flatten_graph,
    graph_paths,
    linear_edges,
    to_stream,
)
from lucene_spark.analysis import SimpleAnalyzer, WhitespaceAnalyzer


def syn_stream(rules, tokens, keep_orig=True):
    m = SynonymGraphMap()
    for inp, out in rules:
        m.add(inp, out, keep_orig)
    return to_stream(flatten_graph(SynonymGraphFilter(m).apply_graph(tokens)))


def wdg_stream(tokens, **flags):
    f = WordDelimiterGraphFilter(**flags)
    return to_stream(flatten_graph(f.apply_graph(tokens)))


# ---------------------------------------------------------------------------
# SynonymGraphFilter goldens
# ---------------------------------------------------------------------------


def test_multiword_output_keep_orig():
    # dns => domain name service (TestSynonymGraphFilter shape)
    got = syn_stream([(["dns"], ["domain", "name", "service"])], ["dns", "is", "up"])
    assert got == [
        ("domain", 1, 1),
        ("dns", 0, 3),
        ("name", 1, 1),
        ("service", 1, 1),
        ("is", 1, 1),
        ("up", 1, 1),
    ]


def test_multiword_input_single_output():
    # wi fi => wifi: single token spans 2 positions
    got = syn_stream([(["wi", "fi"], ["wifi"])], ["fast", "wi", "fi", "network"])
    assert got == [
        ("fast", 1, 1),
        ("wifi", 1, 2),
        ("wi", 0, 1),
        ("fi", 1, 1),
        ("network", 1, 1),
    ]


def test_no_keep_orig_replaces():
    got = syn_stream(
        [(["new", "york"], ["ny"])], ["i", "love", "new", "york"], keep_orig=False
    )
    assert got == [("i", 1, 1), ("love", 1, 1), ("ny", 1, 1)]


def test_longest_match_wins():
    m = SynonymGraphMap()
    m.add(["a", "b"], ["ab"], keep_orig=False)
    m.add(["a", "b", "c"], ["abc"], keep_orig=False)
    got = to_stream(
        flatten_graph(SynonymGraphFilter(m).apply_graph(["a", "b", "c"]))
    )
    assert got == [("abc", 1, 1)]


def test_matches_do_not_overlap():
    # after consuming "a b", scanning resumes at "c": "b c" cannot match
    m = SynonymGraphMap()
    m.add(["a", "b"], ["ab"], keep_orig=False)
    m.add(["b", "c"], ["bc"], keep_orig=False)
    got = to_stream(flatten_graph(SynonymGraphFilter(m).apply_graph(["a", "b", "c"])))
    assert got == [("ab", 1, 1), ("c", 1, 1)]


def test_multiple_outputs_for_one_input():
    m = SynonymGraphMap()
    m.add(["usa"], ["united", "states"], keep_orig=True)
    m.add(["usa"], ["america"], keep_orig=True)
    got = to_stream(flatten_graph(SynonymGraphFilter(m).apply_graph(["usa"])))
    # both side paths, then the original, all realigning at the sink
    assert ("united", 1, 1) == got[0]
    assert ("america", 0, 2) in got and ("usa", 0, 2) in got
    assert ("states", 1, 1) == got[-1]


def test_offsets_cover_the_match():
    m = SynonymGraphMap().add(["wi", "fi"], ["wifi"])
    edges = SynonymGraphFilter(m).apply_graph(
        ["wi", "fi"], starts=[0, 3], ends=[2, 5]
    )
    wifi = [e for e in edges if e.term == "wifi"][0]
    assert (wifi.start, wifi.end) == (0, 5)


# ---------------------------------------------------------------------------
# WordDelimiterGraphFilter goldens
# ---------------------------------------------------------------------------


def test_wdg_case_split_catenate_words():
    got = wdg_stream(["PowerShot"], catenate_words=True)
    assert got == [("PowerShot", 1, 2), ("Power", 0, 1), ("Shot", 1, 1)]


def test_wdg_parts_only():
    assert wdg_stream(["PowerShot"]) == [("Power", 1, 1), ("Shot", 1, 1)]


def test_wdg_preserve_and_catenate_all():
    got = wdg_stream(["fooBar_baz2000"], catenate_all=True, preserve_original=True)
    assert got == [
        ("fooBar_baz2000", 1, 4),
        ("fooBarbaz2000", 0, 4),
        ("foo", 0, 1),
        ("Bar", 1, 1),
        ("baz", 1, 1),
        ("2000", 1, 1),
    ]


def test_wdg_possessive_and_single_part():
    assert wdg_stream(["O'Neil's"]) == [("O", 1, 1), ("Neil", 1, 1)]
    assert wdg_stream(["hello"]) == [("hello", 1, 1)]


def test_wdg_number_catenation():
    got = wdg_stream(["1-2-3"], catenate_numbers=True, generate_word_parts=False)
    assert got == [("123", 1, 3), ("1", 0, 1), ("2", 1, 1), ("3", 1, 1)]


def test_wdg_all_delimiter_token_vanishes():
    # '--' has no parts: its boundary nodes are still referenced by the
    # neighbours, so the deleted token leaves a posInc-2 hole exactly
    # like the reference's StopFilter contract
    assert wdg_stream(["a", "--", "b"]) == [("a", 1, 1), ("b", 2, 1)]
    # a MULTI-token hole partially collapses (interior nodes are
    # unreferenced) — the one documented deviation
    assert wdg_stream(["a", "--", "--", "b"]) == [("a", 1, 1), ("b", 2, 1)]


def test_wdg_no_split_on_case_change():
    got = wdg_stream(["PowerShot"], split_on_case_change=False)
    assert got == [("PowerShot", 1, 1)]


# ---------------------------------------------------------------------------
# flatten + paths
# ---------------------------------------------------------------------------


def test_flatten_identity_on_linear_stream():
    got = to_stream(flatten_graph(linear_edges(["a", "b", "c"])))
    assert got == [("a", 1, 1), ("b", 1, 1), ("c", 1, 1)]


def test_graph_paths_enumeration():
    m = SynonymGraphMap().add(["ny"], ["new", "york"])
    edges = SynonymGraphFilter(m).apply_graph(["visit", "ny", "today"])
    assert graph_paths(edges) == [
        ["visit", "new", "york", "today"],
        ["visit", "ny", "today"],
    ]


def test_graph_paths_expansion_guard():
    m = SynonymGraphMap()
    for t in "abcdefgh":
        m.add([t], [t + t])
    edges = SynonymGraphFilter(m).apply_graph(list("abcdefgh"))
    with pytest.raises(ValueError, match="phrase paths"):
        graph_paths(edges, max_paths=100)  # 2^8 = 256 paths


# ---------------------------------------------------------------------------
# GraphAnalyzer surface
# ---------------------------------------------------------------------------


def test_graph_analyzer_positions_and_lowercase():
    a = GraphAnalyzer(
        WhitespaceAnalyzer(),
        WordDelimiterGraphFilter(catenate_all=True),
        lowercase=True,
    )
    terms, pos = a.tokenize_with_positions_one("getFooBar baz")
    assert terms == ["getfoobar", "get", "foo", "bar", "baz"]
    assert pos == [0, 0, 1, 2, 3]
    assert a.supports_positions()


def test_graph_analyzer_query_paths():
    from lucene_spark.analysis import get_analyzer

    a = get_analyzer("simple_syngraph")
    assert a.paths_one("big window join") == [
        ["big", "merge"],
        ["big", "window", "join"],
    ]


# ---------------------------------------------------------------------------
# index round-trip: stacked positions are searchable
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def graph_index(spark, tmp_path_factory):
    import pandas as pd

    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    rows = pd.DataFrame(
        {
            "repo": ["r"] * 4,
            "path": [f"p{i}" for i in range(4)],
            "commit": ["c"] * 4,
            "lang": ["txt"] * 4,
            "content": [
                "the window join runs nightly",      # surface form A
                "a merge pass runs nightly",          # surface form B
                "window functions but no adjacency join here",
                "big window join scan",
            ],
        }
    )
    idx = str(tmp_path_factory.mktemp("gidx") / "idx")
    cfg = IndexConfig(
        analyzer="simple_syngraph", docs_per_segment=10, num_batches=1
    )
    build_index(spark, spark.createDataFrame(rows), idx, cfg)
    return IndexReader(spark, idx)


def test_term_query_matches_both_surfaces(graph_index):
    from lucene_spark.search import sqlpath as sp

    got = sp.bool_bm25_topk(graph_index, "content", must=["merge"]).toPandas()
    # doc 0 (window join), doc 1 (merge), doc 3 (window join) — NOT doc 2
    assert sorted(got["doc_id"].tolist()) == [0, 1, 3]


def test_phrase_across_stacked_position(graph_index):
    from lucene_spark.search import sqlpath as sp

    got = sp.phrase_bm25_topk(graph_index, "content", ["big", "merge"]).toPandas()
    assert got["doc_id"].tolist() == [3]


def test_doc_len_discounts_stacked_tokens(graph_index):
    # doc 0: 5 surface tokens; the stacked merge must not inflate dl
    dl = {
        r["doc_id"]: r["doc_len"]
        for r in graph_index.doclens().collect()
    }
    assert dl[0] == 5 and dl[3] == 4


def test_graph_phrase_const_topk(graph_index, spark):
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.search import sqlpath as sp

    paths = get_analyzer("simple_syngraph").paths_one("window join")
    got = sp.graph_phrase_const_topk(graph_index, "content", paths).toPandas()
    # any-path match: merge OR the exact phrase window-join
    assert got["doc_id"].tolist() == [0, 1, 3]
    assert set(got["score_x1e6"]) == {1_000_000}
