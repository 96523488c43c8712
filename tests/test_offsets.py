"""Stored char offsets (IndexOptions ..._AND_OFFSETS role) + the
index-driven highlighter (UnifiedHighlighter-over-offsets)."""

import numpy as np
import pandas as pd
import pytest


@pytest.fixture(scope="module")
def stem_off_idx(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    docs = pd.DataFrame(
        {
            "doc_id": range(6),
            "text": [
                "The Tables were QUERIED by many tables yesterday",
                "nothing relevant here at all",
                "querying tables requires queries and tables",
                "one table",
                "Queried TABLES queried tables queried",
                "table table table table table table table table table",
            ],
        }
    )
    idx = str(tmp_path_factory.mktemp("offidx") / "idx")
    cfg = IndexConfig(
        field="text", content_col="text", analyzer="simple_porter",
        doc_id_col="doc_id", docs_per_segment=3, store_offsets=True,
    )
    sdf = spark.createDataFrame(docs)
    build_index(spark, sdf, idx, cfg)
    return IndexReader(spark, idx), sdf, docs


def test_offsets_round_trip_against_analyzer(stem_off_idx):
    """Stored spans must equal the analyzer's reported spans, per
    occurrence, across the flat decode path."""
    from lucene_spark.analysis import get_analyzer
    from lucene_spark.search.executor import _SegmentIndex

    reader, _, docs = stem_off_idx
    an = get_analyzer("simple_porter")
    want: dict[tuple[int, str], list[tuple[int, int]]] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        toks, starts, ends = an.tokenize_with_offsets_one(text)
        for t, s, e in zip(toks, starts, ends):
            want.setdefault((did, t), []).append((s, e))
    pdf = reader.postings().toPandas()
    checked = 0
    for _, grp in pdf.groupby("segment_id"):
        ctx = _SegmentIndex(grp.reset_index(drop=True))
        for term in {"tabl", "queri"}:
            if not ctx.has(term):
                continue
            tdocs, freqs, _ = ctx.postings(term)
            st, en, seg_starts, lens = ctx.flat_offsets(term)
            for j, d in enumerate(tdocs):
                lo, n = int(seg_starts[j]), int(lens[j])
                got = list(zip(st[lo:lo + n].tolist(), en[lo:lo + n].tolist()))
                assert got == want[(int(d), term)]
                checked += n
    assert checked > 10


def test_highlight_from_index_wraps_surface_forms(stem_off_idx):
    """The stem term never appears as a surface token — regex
    re-tokenization would produce zero hits; stored offsets recover the
    original forms."""
    from lucene_spark.search.highlight import highlight, highlight_from_index

    reader, sdf, _ = stem_off_idx
    out = {
        r["doc_id"]: r
        for r in highlight_from_index(
            reader, "text", ["tabl", "queri"], sdf, [0, 1, 2, 4]
        ).collect()
    }
    assert 1 not in out  # no hits
    assert "<b>Tables</b>" in out[0]["snippet"]
    assert "<b>QUERIED</b>" in out[0]["snippet"]
    assert "<b>querying</b>" in out[2]["snippet"]
    assert out[4]["n_hits"] == 5  # all five hit tokens within window 8
    # the re-tokenizing highlighter CANNOT find the stem terms
    legacy = highlight(sdf, ["tabl", "queri"], content_col="text").collect()
    assert len(legacy) == 0


def test_offsets_survive_merge_and_purge(spark, stem_off_idx, tmp_path):
    """Merge concatenates offset blobs raw; purge re-encodes them for
    surviving docs only."""
    import shutil

    from lucene_spark.index.deletes import delete_by_ids
    from lucene_spark.index.merge import force_merge
    from lucene_spark.search.executor import IndexReader
    from lucene_spark.search.highlight import highlight_from_index

    reader, sdf, _ = stem_off_idx
    idx2 = str(tmp_path / "idx2")
    shutil.copytree(reader.index_dir, idx2)
    delete_by_ids(
        spark, idx2, spark.createDataFrame(pd.DataFrame({"doc_id": [0]}))
    )
    force_merge(spark, idx2, max_segments=1)
    r2 = IndexReader(spark, idx2)
    out = {
        r["doc_id"]: r
        for r in highlight_from_index(
            r2, "text", ["tabl", "queri"], sdf, [0, 2, 4]
        ).collect()
    }
    assert 0 not in out  # purged
    assert "<b>querying</b>" in out[2]["snippet"]
    assert out[4]["n_hits"] == 5


def test_store_offsets_requires_capable_analyzer(spark, tmp_path):
    from lucene_spark.index.builder import IndexConfig, build_index

    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": [0], "text": ["a b c"]})
    )
    with pytest.raises(ValueError, match="offsets"):
        build_index(
            spark, docs, str(tmp_path / "idx"),
            IndexConfig(
                field="text", content_col="text", analyzer="code",
                doc_id_col="doc_id", store_offsets=True,
            ),
        )


def test_multi_passage_highlight(stem_off_idx):
    """UnifiedHighlighter maxPassages surface: num_passages > 1 returns
    the top non-overlapping windows in document order, ellipsis-joined;
    num_passages=1 stays byte-identical to the single-passage output."""
    from lucene_spark.search.highlight import highlight_from_index

    reader, sdf, _docs = stem_off_idx

    def run(n, window=3):
        return {
            r["doc_id"]: r
            for r in highlight_from_index(
                reader, "text", ["tabl", "queri"], sdf, [0, 2, 4],
                window=window, num_passages=n,
            ).collect()
        }

    one = run(1)
    two = run(2)
    # doc 0: "The Tables were QUERIED by many tables yesterday" —
    # window 3 holds (Tables, QUERIED); a second passage adds the later
    # "tables" hit
    assert one[0]["snippet"] == "<b>Tables</b> were <b>QUERIED</b>"
    assert two[0]["snippet"].startswith("<b>Tables</b> were <b>QUERIED</b>")
    assert two[0]["snippet"].endswith("<b>tables</b>")
    assert "... " in two[0]["snippet"]
    assert two[0]["n_hits"] == one[0]["n_hits"] + 1
    # passages come back in document order regardless of score order
    s = two[2]["snippet"]
    assert s.index("<b>querying</b>") < s.index("<b>queri") or s.startswith(
        "<b>querying</b>"
    )
    # single-passage path unchanged
    baseline = {
        r["doc_id"]: r["snippet"]
        for r in highlight_from_index(
            reader, "text", ["tabl", "queri"], sdf, [0, 2, 4], window=3
        ).collect()
    }
    assert baseline == {d: one[d]["snippet"] for d in one}
