"""FieldMaskingSpanQuery (queries/spans/FieldMaskingSpanQuery.java):
masked span clauses evaluate against their real field's postings while
participating in a single composite span tree — the denormalized
parent/child example (FieldMaskingSpanQuery.java:36-60): parallel
`first`/`last` name fields, SpanNear(slop=-1, unordered) requiring the
two terms at the SAME position, i.e. the same child."""

import numpy as np
import pandas as pd
import pytest

from lucene_spark.search import query as Q

FIRST = ["james", "sally", "maria", "chen", "priya"]
LAST = ["jones", "smith", "garcia", "lee", "patel"]


@pytest.fixture(scope="module")
def mask_index(spark, tmp_path_factory):
    from lucene_spark.index.builder import IndexConfig, build_index
    from lucene_spark.search.executor import IndexReader

    rng = np.random.default_rng(31)
    firsts, lasts = [], []
    for _ in range(100):
        n = rng.integers(1, 6)
        firsts.append(" ".join(rng.choice(FIRST, size=n)))
        lasts.append(" ".join(rng.choice(LAST, size=n)))
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(100, dtype=np.int64),
            "first": firsts,
            "last": lasts,
        }
    )
    path = str(tmp_path_factory.mktemp("fm") / "idx")
    cfg = IndexConfig(
        field="last", content_col="last", analyzer="whitespace",
        doc_id_col="doc_id", docs_per_segment=34,
        extra_fields={"first": "first"},
    )
    build_index(spark, spark.createDataFrame(pdf), path, cfg)
    return IndexReader(spark, path), firsts, lasts


def _same_person_src(first: str, last: str) -> Q.SpanNear:
    return Q.SpanNear(
        (
            Q.SpanTerm(last),
            Q.SpanFieldMasking(Q.SpanTerm(first), real_field="first"),
        ),
        slop=-1,
        in_order=False,
    )


def test_masked_near_matches_same_position_only(mask_index):
    """'james jones' must be the SAME child: docs with james@i in
    `first` and jones@i in `last` for some i — not a cross product."""
    from lucene_spark.search.executor import IndexSearcher

    reader, firsts, lasts = mask_index
    top = IndexSearcher(reader).search(
        Q.SpanQuery("last", _same_person_src("james", "jones")), k=200
    )
    want = {
        d
        for d, (fs, ls) in enumerate(zip(firsts, lasts))
        if any(
            f == "james" and l == "jones"
            for f, l in zip(fs.split(), ls.split())
        )
    }
    assert {h.doc_id for h in top.hits} == want
    assert len(want) > 0
    assert all(h.score > 0 for h in top.hits)
    # docs holding both names but never on the same child are excluded
    cross_only = {
        d
        for d, (fs, ls) in enumerate(zip(firsts, lasts))
        if "james" in fs.split() and "jones" in ls.split()
    } - want
    assert cross_only.isdisjoint({h.doc_id for h in top.hits})


def test_masked_freqs_match_reference(mask_index):
    """Sloppy freqs of the masked tree equal a per-doc replay: every
    same-position (first, last) pair contributes 1/(1+0) (unordered
    cover width -1, clamped to 0)."""
    from lucene_spark.search.executor import (
        IndexSearcher, _SegmentIndex, _span_freqs,
    )

    reader, firsts, lasts = mask_index
    searcher = IndexSearcher(reader)
    for fname, lname in [("james", "jones"), ("sally", "smith"),
                         ("maria", "patel")]:
        q = Q.SpanQuery("last", _same_person_src(fname, lname))
        node = searcher._compile(q)
        if node is None:
            continue
        pdf = reader.postings().toPandas()
        got: dict[int, float] = {}
        for _sid, grp in pdf.groupby("segment_id"):
            docs, freqs, _ = _span_freqs(
                node["source"], _SegmentIndex(grp), "last"
            )
            for d, f in zip(docs, freqs):
                got[int(d)] = float(f)
        want = {}
        for d, (fs, ls) in enumerate(zip(firsts, lasts)):
            n = sum(
                1 for f, l in zip(fs.split(), ls.split())
                if f == fname and l == lname
            )
            if n:
                want[d] = float(np.float32(n))
        assert got == want, f"{fname} {lname}"


def test_masked_or_across_fields(mask_index):
    """SpanOr mixing fields: last:jones OR masked(first:chen)."""
    from lucene_spark.search.executor import IndexSearcher

    reader, firsts, lasts = mask_index
    src = Q.SpanOr(
        (
            Q.SpanTerm("jones"),
            Q.SpanFieldMasking(Q.SpanTerm("chen"), real_field="first"),
        )
    )
    top = IndexSearcher(reader).search(Q.SpanQuery("last", src), k=200)
    want = {
        d
        for d, (fs, ls) in enumerate(zip(firsts, lasts))
        if "jones" in ls.split() or "chen" in fs.split()
    }
    assert {h.doc_id for h in top.hits} == want


def test_unmasked_trees_unaffected(mask_index):
    """A plain span query on one field compiles without qualification
    and still matches exactly."""
    from lucene_spark.search.executor import IndexSearcher

    reader, _firsts, lasts = mask_index
    top = IndexSearcher(reader).search(
        Q.SpanQuery("last", Q.SpanTerm("lee")), k=200
    )
    want = {d for d, ls in enumerate(lasts) if "lee" in ls.split()}
    assert {h.doc_id for h in top.hits} == want
