"""Surround parser golden ASTs + end-to-end spans execution."""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.search import query as Q
from lucene_spark.search.surround import SurroundParseError, SurroundQueryParser


def P(s):
    return SurroundQueryParser("text").parse(s)


def test_infix_distance_ordered():
    assert P("aa 3w bb") == Q.SpanQuery(
        "text",
        Q.SpanNear((Q.SpanTerm("aa"), Q.SpanTerm("bb")), slop=2, in_order=True),
    )


def test_infix_distance_unordered_default_1():
    assert P("aa N bb") == Q.SpanQuery(
        "text",
        Q.SpanNear((Q.SpanTerm("aa"), Q.SpanTerm("bb")), slop=0, in_order=False),
    )


def test_prefix_notation_and_chain():
    assert P("5n(aa, bb, cc)") == Q.SpanQuery(
        "text",
        Q.SpanNear(
            (Q.SpanTerm("aa"), Q.SpanTerm("bb"), Q.SpanTerm("cc")),
            slop=4, in_order=False,
        ),
    )
    assert P("aa w bb w cc") == Q.SpanQuery(
        "text",
        Q.SpanNear(
            (Q.SpanTerm("aa"), Q.SpanTerm("bb"), Q.SpanTerm("cc")),
            slop=0, in_order=True,
        ),
    )


def test_boolean_levels():
    q = P("aa AND bb OR cc")
    assert q == Q.BooleanQuery(
        should=(
            Q.BooleanQuery(must=(Q.TermQuery("text", "aa"),
                                 Q.TermQuery("text", "bb"))),
            Q.TermQuery("text", "cc"),
        )
    )
    assert P("aa NOT bb") == Q.BooleanQuery(
        must=(Q.TermQuery("text", "aa"),),
        must_not=(Q.TermQuery("text", "bb"),),
    )


def test_truncation_inside_distance():
    q = P("a* 2w cc")
    assert q == Q.SpanQuery(
        "text",
        Q.SpanNear(
            (Q.SpanMulti(Q.PrefixQuery("text", "a")), Q.SpanTerm("cc")),
            slop=1, in_order=True,
        ),
    )


def test_or_inside_distance():
    q = P("(aa OR bb) 3n cc")
    assert q == Q.SpanQuery(
        "text",
        Q.SpanNear(
            (Q.SpanOr((Q.SpanTerm("aa"), Q.SpanTerm("bb"))), Q.SpanTerm("cc")),
            slop=2, in_order=False,
        ),
    )


def test_field_override_and_boost():
    assert P("title:aa^2") == Q.TermQuery("title", "aa", boost=2.0)
    assert P('"and"') == Q.TermQuery("text", "and")


def test_and_inside_distance_rejected():
    with pytest.raises(SurroundParseError):
        P("(aa AND bb) 3w cc")


def test_operators_case_insensitive():
    assert P("aa and bb") == P("aa AND bb")
    assert P("aa 3W bb") == P("aa 3w bb")


@pytest.fixture(scope="module")
def surround_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    rng = np.random.default_rng(23)
    vocab = ["alpha", "beta", "gamma", "delta", "axle"]
    docs = [
        " ".join(rng.choice(vocab, size=rng.integers(4, 30)))
        for _ in range(80)
    ]
    pdf = pd.DataFrame(
        {"doc_id": np.arange(len(docs), dtype=np.int64), "text": docs}
    )
    path = str(tmp_path_factory.mktemp("sur") / "idx")
    cfg = IndexConfig(
        field="text", content_col="text", analyzer="simple",
        doc_id_col="doc_id", docs_per_segment=40,
    )
    build_index(spark, spark.createDataFrame(pdf), path, cfg)
    return IndexReader(spark, path), docs


def test_surround_executes_as_spans(surround_index):
    from lucene_spark.search.executor import IndexSearcher

    reader, docs = surround_index
    top = IndexSearcher(reader).search(P("alpha 3w beta"), k=100, prune=False)
    got = sorted(h.doc_id for h in top.hits)

    def matches(toks):
        pa = [i for i, t in enumerate(toks) if t == "alpha"]
        pb = [i for i, t in enumerate(toks) if t == "beta"]
        return any(0 < b - a <= 3 for a in pa for b in pb)

    want = [d for d, txt in enumerate(docs) if matches(txt.split())]
    assert got == want


def test_surround_truncation_expands(surround_index):
    from lucene_spark.search.executor import IndexSearcher

    reader, docs = surround_index
    # a* expands over the term dictionary to {alpha, axle}
    top = IndexSearcher(reader).search(P("a* 1n gamma"), k=100, prune=False)
    got = sorted(h.doc_id for h in top.hits)

    def matches(toks):
        pa = [i for i, t in enumerate(toks) if t.startswith("a")]
        pg = [i for i, t in enumerate(toks) if t == "gamma"]
        return any(abs(b - a) == 1 for a in pa for b in pg)

    want = [d for d, txt in enumerate(docs) if matches(txt.split())]
    assert got == want
