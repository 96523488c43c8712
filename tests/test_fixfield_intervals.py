"""Intervals.fixField (Intervals.java:456-462): a fixField subtree
reads another field's positions inside one interval tree — the
cross-field composition example from the reference javadoc ("search
for stemmed terms near unstemmed terms")."""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.search import query as Q

WORDS = ["fast", "table", "scan", "merge", "sort", "key"]


@pytest.fixture(scope="module")
def ff_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    rng = np.random.default_rng(7)
    body, tags = [], []
    for _ in range(120):
        body.append(" ".join(rng.choice(WORDS, size=rng.integers(3, 9))))
        tags.append(" ".join(rng.choice(WORDS, size=rng.integers(1, 4))))
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(120, dtype=np.int64),
            "body": body,
            "tags": tags,
        }
    )
    path = str(tmp_path_factory.mktemp("ff") / "idx")
    cfg = IndexConfig(
        field="body", content_col="body", analyzer="whitespace",
        doc_id_col="doc_id", docs_per_segment=41,
        extra_fields={"tags": "tags"},
    )
    build_index(spark, spark.createDataFrame(pdf), path, cfg)
    return IndexReader(spark, path), body, tags


def _brute_unordered_within(body, tags, a, b, width):
    """Docs where body-term `a` and tags-term `b` (their per-field
    positions interleaved into one stream, as the kernel sees them)
    co-occur within an interval of <= width positions."""
    out = set()
    for did, (bt, tg) in enumerate(zip(body, tags)):
        pa = [i for i, t in enumerate(bt.split()) if t == a]
        pb = [i for i, t in enumerate(tg.split()) if t == b]
        if any(abs(x - y) + 1 <= width for x in pa for y in pb):
            out.add(did)
    return out


def test_fixfield_cross_field_unordered(ff_index):
    from lucene_spark.search.executor import IndexSearcher

    reader, body, tags = ff_index
    q = Q.IntervalQuery(
        "body",
        Q.IUnordered(
            (
                Q.ITerm("fast"),
                Q.IFixField("tags", Q.ITerm("key")),
            ),
            max_width=3,
        ),
    )
    td = IndexSearcher(reader).search(q, k=200)
    got = {h.doc_id for h in td.hits}
    want = _brute_unordered_within(body, tags, "fast", "key", 3)
    assert got == want
    assert want  # the fixture must actually exercise the path


def test_fixfield_leaf_qualification_rewrite():
    """The compile rewrite must qualify exactly the fixField subtree's
    leaves, leave outer leaves plain, and respect inner fixFields."""
    from lucene_spark.search.executor import FIELD_SEP, _fix_interval_fields

    src = Q.IOrdered(
        (
            Q.ITerm("a"),
            Q.IFixField(
                "f2",
                Q.IUnordered(
                    (Q.ITerm("b"), Q.IFixField("f3", Q.ITerm("c"))),
                ),
            ),
        )
    )
    out = _fix_interval_fields(src)
    t0, t1 = out.sources[0], out.sources[1]
    assert t0 == Q.ITerm("a")
    assert t1.sources[0].term == "f2" + FIELD_SEP + "b"
    assert t1.sources[1].term == "f3" + FIELD_SEP + "c"  # inner wins


def test_fixfield_absent_field_matches_nothing(ff_index):
    from lucene_spark.search.executor import IndexSearcher

    reader, _, _ = ff_index
    q = Q.IntervalQuery(
        "body",
        Q.IOrdered(
            (Q.ITerm("fast"), Q.IFixField("nope", Q.ITerm("key")))
        ),
    )
    td = IndexSearcher(reader).search(q, k=10)
    assert td.total_hits == 0


def test_fixfield_multiterm_expansion(ff_index):
    """An IMultiTerm inside fixField expands against the FIXED field's
    term dictionary, not the enclosing query field."""
    from lucene_spark.search.executor import IndexSearcher

    reader, body, tags = ff_index
    # fn-equivalent of: body 'fast' unordered-near ANY tags term with
    # prefix 'me' (expands to 'merge' in the tags dictionary)
    q = Q.IntervalQuery(
        "body",
        Q.IUnordered(
            (
                Q.ITerm("fast"),
                Q.IFixField("tags", Q.IMultiTerm(Q.PrefixQuery("", "me"))),
            ),
            max_width=3,
        ),
    )
    top = IndexSearcher(reader).search(q, k=1000, prune=False)
    got = sorted(h.doc_id for h in top.hits)
    want = sorted(_brute_unordered_within(body, tags, "fast", "merge", 3))
    assert got == want and got  # non-trivial on this corpus
