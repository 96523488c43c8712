"""Pluggable-Similarity tests: IndexSearcher(similarity=...) must thread
any Similarity through the exact32 kernel, with results consistent with
the float64 sql64 formulas, and the default must stay bit-identical
BM25."""

import numpy as np
import pytest


def _search(reader, sim, query, k=10):
    from lucene_spark.search.executor import IndexSearcher

    s = IndexSearcher(reader, similarity=sim)
    top = s.search(query, k=k)
    return {h.doc_id: h.score for h in top.hits}


def test_default_is_bm25_bit_identical(built_index):
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher
    from lucene_spark.search.similarities import BM25Similarity

    q = Q.BooleanQuery(
        should=(Q.TermQuery("content", "def"), Q.TermQuery("content", "return"))
    )
    default = IndexSearcher(built_index).search(q, k=10)
    explicit = IndexSearcher(
        built_index, similarity=BM25Similarity(1.2, 0.75)
    ).search(q, k=10)
    assert [(h.doc_id, h.score) for h in default.hits] == [
        (h.doc_id, h.score) for h in explicit.hits
    ]


@pytest.mark.parametrize(
    "name", ["classic", "lm_jm", "lm_dirichlet", "dfr", "ib"]
)
def test_injected_similarity_matches_sql_path(built_index, name):
    """exact32 scores (float32 kernel) vs sql64 float64 formulas — same
    docs, values within float32 tolerance."""
    from lucene_spark.search import query as Q, sqlpath as sp
    from lucene_spark.search import similarities as S

    term = "def"
    if name == "classic":
        sim, ref = S.ClassicSimilarity(), sp.classic_topk(
            built_index, "content", term, k=30
        )
    elif name == "lm_jm":
        sim, ref = S.LMJelinekMercerSimilarity(0.1), sp.lm_jelinek_mercer_topk(
            built_index, "content", term, lam=0.1, k=30
        )
    elif name == "lm_dirichlet":
        sim, ref = S.LMDirichletSimilarity(2000.0), sp.lm_dirichlet_topk(
            built_index, "content", term, mu=2000.0, k=30
        )
    elif name == "dfr":
        sim, ref = S.DFRSimilarity(), sp.dfr_inl2_topk(
            built_index, "content", term, k=30
        )
    else:
        sim, ref = S.IBSimilarity(), sp.ib_spl_topk(
            built_index, "content", term, k=30
        )
    got = _search(built_index, sim, Q.TermQuery("content", term), k=30)
    want = {r["doc_id"]: r["score_x1e6"] / 1e6 for r in ref.collect()}
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-4, abs=2e-4), (d, name)


def test_boolean_similarity_scores_are_boosts(built_index):
    from lucene_spark.search import query as Q
    from lucene_spark.search.similarities import BooleanSimilarity

    got = _search(
        built_index,
        BooleanSimilarity(),
        Q.BooleanQuery(
            should=(Q.TermQuery("content", "def"), Q.TermQuery("content", "return"))
        ),
        k=20,
    )
    assert got and all(s in (1.0, 2.0) for s in got.values())
    assert 2.0 in got.values()  # docs matching both terms score 2


def test_classic_similarity_phrase_sums_idf(built_index):
    """Phrase leaves must route through the injected similarity too
    (idfExplain over the term array)."""
    from lucene_spark.search import query as Q
    from lucene_spark.search.similarities import ClassicSimilarity

    got = _search(
        built_index,
        ClassicSimilarity(),
        Q.PhraseQuery("content", ("for", "function"), slop=2),
        k=10,
    )
    assert got
    for s in got.values():
        assert np.isfinite(s) and s > 0
    # weight = boost * summed idf: two-term phrase idf exceeds either
    # single-term idf under Classic's ln((N+1)/(df+1))+1 >= 1
    from lucene_spark.search.executor import IndexSearcher
    from lucene_spark.search.similarities import ClassicSimilarity as CS

    searcher = IndexSearcher(built_index, similarity=CS())
    node = searcher._compile(Q.PhraseQuery("content", ("for", "function"), slop=2))
    n1 = searcher._compile(Q.TermQuery("content", "def"))
    assert float(node["weight"]) > float(n1["weight"]) >= 1.0


def test_axiomatic_and_dfi_formulas(built_index):
    """Direct formula check for the similarities without a sql64 twin:
    scorer output equals the cited closed form on real stats."""
    import math

    from lucene_spark.search.bm25 import TermStats
    from lucene_spark.search.similarities import AxiomaticF2EXP, DFISimilarity
    from lucene_spark.util.smallfloat import LENGTH_TABLE

    coll = built_index.collection_stats("content")
    st = built_index.term_stats("content", ["def"])["def"]
    avgdl = coll.sum_total_term_freq / coll.doc_count
    freqs = np.array([1, 3, 7])
    codes = np.array([10, 60, 120])
    dl = LENGTH_TABLE[codes].astype(float)

    # reference defaults: s=0.25 (Axiomatic.java:102-104)
    ax = AxiomaticF2EXP().scorer(coll, [st], 1.0)
    want = ((coll.doc_count + 1) / st.doc_freq) ** 0.35 * freqs / (
        freqs + 0.25 + 0.25 * dl / avgdl
    )
    assert np.allclose(ax.score(freqs, codes), want, rtol=1e-6)

    # DFISimilarity.java:72-73 — expected = (ttf+1)*dl/(sumTTF+1)
    dfi = DFISimilarity().scorer(coll, [st], 1.0)
    e = (st.total_term_freq + 1) * dl / (coll.sum_total_term_freq + 1)
    m = (freqs - e) / np.sqrt(e)
    want = np.where(freqs > e, np.log2(np.maximum(m, 0) + 1), 0.0)
    assert np.allclose(dfi.score(freqs, codes), want, rtol=1e-5, atol=1e-6)

    # both run end-to-end through the injected executor
    from lucene_spark.search import query as Q

    for sim in (AxiomaticF2EXP(), DFISimilarity()):
        got = _search(built_index, sim, Q.TermQuery("content", "def"), k=10)
        assert got and all(np.isfinite(v) and v >= 0 for v in got.values())


@pytest.mark.parametrize(
    "name",
    ["dfr_gb1", "dfr_ine_z", "ib_ll_ttf", "ax_f1exp", "ax_f2log",
     "ax_f3exp", "dfi_sat", "indri"],
)
def test_similarity_grid_matches_sql_path(built_index, name):
    """r3 grid: every new similarity family member, injected through the
    exact32 executor, agrees with its float64 sql64 twin."""
    from lucene_spark.search import query as Q, sqlpath as sp
    from lucene_spark.search import similarities as S

    term = "def"
    if name == "dfr_gb1":
        sim = S.DFRSimilarity(S.BasicModelG(), S.AfterEffectB(), S.NormalizationH1())
        ref = sp.dfr_topk(built_index, "content", term, model="g",
                          after_effect="b", norm="h1", k=30)
    elif name == "dfr_ine_z":
        sim = S.DFRSimilarity(S.BasicModelIne(), S.AfterEffectB(), S.NormalizationZ())
        ref = sp.dfr_topk(built_index, "content", term, model="ine",
                          after_effect="b", norm="z", k=30)
    elif name == "ib_ll_ttf":
        sim = S.IBSimilarity(S.DistributionLL(), S.LambdaTTF(), S.NormalizationH3())
        ref = sp.ib_topk(built_index, "content", term, distribution="ll",
                         lam="ttf", norm="h3", k=30)
    elif name == "ax_f1exp":
        sim, ref = S.AxiomaticF1EXP(), sp.axiomatic_topk(
            built_index, "content", term, "f1exp", k=30)
    elif name == "ax_f2log":
        sim, ref = S.AxiomaticF2LOG(), sp.axiomatic_topk(
            built_index, "content", term, "f2log", k=30)
    elif name == "ax_f3exp":
        sim, ref = S.AxiomaticF3EXP(), sp.axiomatic_topk(
            built_index, "content", term, "f3exp", k=30)
    elif name == "dfi_sat":
        sim = S.DFISimilarity(S.IndependenceSaturated())
        ref = sp.dfi_topk(built_index, "content", term,
                          independence="saturated", k=30)
    else:
        sim, ref = S.IndriDirichletSimilarity(), sp.indri_topk(
            built_index, "content", term, k=30)
    got = _search(built_index, sim, Q.TermQuery("content", term), k=30)
    want = {r["doc_id"]: r["score_x1e6"] / 1e6 for r in ref.collect()}
    assert set(got) == set(want)
    for d in got:
        assert got[d] == pytest.approx(want[d], rel=1e-4, abs=2e-4), (d, name)


def test_multi_and_per_field_and_rawtf(built_index):
    """MultiSimilarity averages children; PerFieldSimilarityWrapper
    resolves per leaf; RawTF scores are the raw frequencies."""
    import numpy as np

    from lucene_spark.search import query as Q
    from lucene_spark.search import similarities as S

    q = Q.TermQuery("content", "def")
    # fetch components over every matching doc (k wide) so the multi
    # top-20's members are all present despite tie-break differences
    raw = _search(built_index, S.RawTFSimilarity(), q, k=10_000)
    assert raw and all(v == int(v) and v >= 1 for v in raw.values())

    bool_s = _search(built_index, S.BooleanSimilarity(), q, k=10_000)
    multi = _search(
        built_index,
        S.MultiSimilarity([S.RawTFSimilarity(), S.BooleanSimilarity()]),
        q,
        k=20,
    )
    for d, v in multi.items():
        want = np.float32((np.float64(np.float32(raw[d])) + np.float32(bool_s[d])) / 2)
        assert v == pytest.approx(float(want), rel=1e-6), d

    # per-field: content routed to Boolean, everything else default BM25
    pf = S.PerFieldSimilarityWrapper(
        S.BM25Similarity(), {"content": S.BooleanSimilarity()}
    )
    got = _search(built_index, pf, q, k=20)
    assert got == {d: 1.0 for d in got}


def test_sweetspot_formula_and_plateau(built_index, oracle_index):
    """SweetSpotSimilarity (misc module): exact formula check against a
    recomputation from the oracle's term stats + quantized doc lengths,
    plus the prune==no-prune guarantee under the non-monotone length
    norm (its max_score override must stay an upper bound)."""
    import math

    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import IndexSearcher
    from lucene_spark.search.similarities import SweetSpotSimilarity
    from lucene_spark.util.smallfloat import LENGTH_TABLE, int_to_byte4_vec

    sim = SweetSpotSimilarity(ln_min=30, ln_max=120, steepness=0.5)
    q = Q.TermQuery("content", "return")
    got = _search(built_index, sim, q, k=15)
    assert got

    # oracle recomputation
    df = sum(1 for toks in oracle_index.tokens if "return" in toks)
    n = len(oracle_index.tokens)
    idf = math.log((n + 1) / (df + 1)) + 1.0
    for doc_id, score in got.items():
        toks = oracle_index.tokens[doc_id]
        freq = float(sum(1 for t in toks if t == "return"))
        ln = float(LENGTH_TABLE[int(int_to_byte4_vec(np.array([len(toks)]))[0])])
        norm = 1.0 / math.sqrt(
            0.5 * (abs(ln - 30) + abs(ln - 120) - 90) + 1.0
        )
        # weight is quantized to float32 before the float64 product
        # (the scorer's op order)
        want = np.float32(float(np.float32(idf)) * math.sqrt(freq) * norm)
        assert np.float32(score) == want

    # plateau docs (length in [30, 120]) carry norm exactly 1.0
    searcher = IndexSearcher(built_index, similarity=sim)
    pruned = searcher.search(q, k=15, prune=True)
    unpruned = searcher.search(q, k=15, prune=False)
    assert [(h.doc_id, h.score) for h in pruned.hits] == [
        (h.doc_id, h.score) for h in unpruned.hits
    ]
