"""Vector-similarity threshold queries, patience early exit, and seeded
entry points.

Reference contracts:
- core/search/AbstractVectorSimilarityQuery.java +
  VectorSimilarityCollector.java — all vectors above resultSimilarity,
  graph traversal bounded by traversalSimilarity, exact fallback when a
  filtered traversal exhausts its visit budget.
- core/search/PatienceKnnVectorQuery.java +
  HnswQueueSaturationCollector.java — queue-saturation early exit.
- core/search/SeededKnnVectorQuery.java + knn/KnnSearchStrategy.Seeded
  — seed docs become layer-0 entry points, replacing the descent.
"""

import numpy as np
import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def exact_sims(emb):
    """vec_id -> lucene-normalized sim vs query 0, computed in numpy."""
    pdf = emb.toPandas()
    mat = np.stack(pdf["embedding"].map(np.asarray).to_numpy()).astype(
        np.float64
    )
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    q = mat[pdf.index[pdf["vec_id"] == 0][0]]
    sims = (mat @ q + 1.0) / 2.0
    return dict(zip(pdf["vec_id"].tolist(), sims.tolist()))


def test_exact_threshold_matches_numpy(emb, exact_sims):
    from lucene_spark.pipeline.similarity import vector_similarity_all

    got = {
        r["vec_id"]: r["sim_x1e6"]
        for r in vector_similarity_all(
            emb, query_id=0, result_similarity=0.6
        ).collect()
    }
    want = {
        vid: round(s * 1e6)
        for vid, s in exact_sims.items()
        if vid != 0 and round(s * 1e6) >= 600000
    }
    assert set(got) == set(want)
    for vid in got:
        assert abs(got[vid] - want[vid]) <= 1


def test_exact_threshold_filtered(emb, exact_sims):
    from lucene_spark.pipeline.similarity import vector_similarity_all

    lab = {
        r["vec_id"]: r["label"]
        for r in emb.select("vec_id", "label").collect()
    }
    got = {
        r["vec_id"]
        for r in vector_similarity_all(
            emb, query_id=0, result_similarity=0.55, filter_expr="label = 1"
        ).collect()
    }
    want = {
        vid
        for vid, s in exact_sims.items()
        if vid != 0 and round(s * 1e6) >= 550000 and lab[vid] == 1
    }
    assert got == want and len(got) > 0


def test_traversal_above_result_raises(emb):
    from lucene_spark.pipeline.graphann import vector_similarity_graph

    with pytest.raises(ValueError):
        vector_similarity_graph(
            emb, 0, traversal_similarity=0.8, result_similarity=0.6
        )


def test_graph_threshold_recall_and_precision(emb, exact_sims):
    """Graph path: every returned doc is genuinely above the threshold
    (exact similarity is recomputed, so precision is 1 by construction
    — assert it anyway) and recall vs the exact set is high."""
    from lucene_spark.pipeline.graphann import vector_similarity_graph

    got = {
        r["vec_id"]: r["sim_x1e6"]
        for r in vector_similarity_graph(
            emb,
            0,
            traversal_similarity=0.5,
            result_similarity=0.6,
            hnsw_threshold=100,  # force the graph path (500 rows)
        ).collect()
    }
    want = {
        vid
        for vid, s in exact_sims.items()
        if vid != 0 and round(s * 1e6) >= 600000
    }
    assert set(got) <= want  # no false positives
    assert len(got) / len(want) >= 0.9, (len(got), len(want))
    for vid, sv in got.items():
        assert abs(sv - round(exact_sims[vid] * 1e6)) <= 1


def test_graph_threshold_small_partition_is_exact(emb, exact_sims):
    """At or below hnsw_threshold the partition runs the exact scan, so
    the result IS the exact set."""
    from lucene_spark.pipeline.graphann import vector_similarity_graph

    got = {
        r["vec_id"]
        for r in vector_similarity_graph(
            emb, 0, 0.5, 0.6, hnsw_threshold=10_000
        ).collect()
    }
    want = {
        vid
        for vid, s in exact_sims.items()
        if vid != 0 and round(s * 1e6) >= 600000
    }
    assert got == want


def test_graph_threshold_filtered_subset(emb, exact_sims):
    from lucene_spark.pipeline.graphann import vector_similarity_graph

    lab = {
        r["vec_id"]: r["label"]
        for r in emb.select("vec_id", "label").collect()
    }
    got = {
        r["vec_id"]
        for r in vector_similarity_graph(
            emb, 0, 0.5, 0.55, filter_expr="label = 1", hnsw_threshold=100
        ).collect()
    }
    want = {
        vid
        for vid, s in exact_sims.items()
        if vid != 0 and round(s * 1e6) >= 550000 and lab[vid] == 1
    }
    # filtered traversal has a visit budget == filter cardinality; when
    # exhausted it falls back to the exact filtered scan, so the result
    # must still be a high-recall subset of the true filtered set
    assert got <= want
    assert len(got) / max(1, len(want)) >= 0.9


# ---------------------------------------------------------------------------
# VectorSimilarityCollector traversal semantics on a hand-built graph
# ---------------------------------------------------------------------------


def _line_graph():
    """Five unit vectors at increasing angles from the query + a path
    graph 0-1-2-3-4, query = [1, 0]."""
    angles = np.array([0.1, 0.35, 0.8, 1.4, 2.6])
    mat = np.stack([np.cos(angles), np.sin(angles)], axis=1)
    adj = [[1], [0, 2], [1, 3], [2, 4], [3]]
    q = np.array([1.0, 0.0])
    sims = (mat @ q + 1.0) / 2.0
    return mat, adj, q, sims


def test_similarity_collector_stops_below_traversal():
    """Traversal must stop once the best frontier candidate drops below
    traversalSimilarity (VectorSimilarityCollector
    .minCompetitiveSimilarity), so far nodes are never visited."""
    from lucene_spark.pipeline.graphann import _search_layer_similarity

    mat, adj, q, sims = _line_graph()
    # thresholds between sims[2] and sims[1]: traversal should walk
    # 0, 1, 2 (2 is pushed while competitive) but never reach 3, 4
    ts = float((sims[1] + sims[2]) / 2)
    rs = float(sims[1])  # collect nodes 0 and 1
    res, visited, completed = _search_layer_similarity(
        mat, adj, q, [0], ts, rs
    )
    assert completed
    got = {n for _s, n in res}
    assert got == {0, 1}
    assert visited <= 3  # 3 scored (0,1,2), 3-4 never reached... 4 never


def test_similarity_collector_visit_limit_reports_incomplete():
    from lucene_spark.pipeline.graphann import _search_layer_similarity

    mat, adj, q, sims = _line_graph()
    res, visited, completed = _search_layer_similarity(
        mat, adj, q, [0], 0.0, 0.0, visit_limit=2
    )
    assert not completed


def test_similarity_collector_result_above_traversal_collects_all():
    """With traversal low enough to walk the whole component, exactly
    the >= result nodes are collected."""
    from lucene_spark.pipeline.graphann import _search_layer_similarity

    mat, adj, q, sims = _line_graph()
    rs = float(sims[2])
    res, visited, completed = _search_layer_similarity(
        mat, adj, q, [0], 0.0, rs
    )
    assert completed and visited == 5
    assert {n for _s, n in res} == {0, 1, 2}


# ---------------------------------------------------------------------------
# Patience
# ---------------------------------------------------------------------------


def test_default_patience_formula():
    from lucene_spark.pipeline.graphann import default_patience

    # PatienceKnnVectorQuery.java:175-177
    assert default_patience(10) == 7
    assert default_patience(100) == 30
    assert default_patience(1) == 7


def _clustered(n=400, d=16, seed=5):
    rng = np.random.RandomState(seed)
    mat = rng.randn(n, d)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    return mat


def test_patience_subset_of_plain_and_fewer_visits():
    """An aggressive patience setting must terminate no later than the
    plain beam (fewer or equal visited nodes) while keeping the results
    a subset of the plain beam's on the same graph."""
    from lucene_spark.pipeline.graphann import (
        _build_hnsw,
        _search_layer,
        _search_layer_patience,
    )

    mat = _clustered()
    q = mat[0]
    levels, graphs, entry, entry_level = _build_hnsw(
        mat, m=8, ef_construction=48, seed=42
    )
    eps = [entry]
    for lvl in range(entry_level, 0, -1):
        eps = [max(_search_layer(mat, graphs[lvl], q, eps, 1),
                   key=lambda x: x[0])[1]]
    plain = _search_layer(mat, graphs[0], q, eps, 24)
    # saturation_threshold 0 saturates EVERY pop: exit after patience+1
    got, visited, completed = _search_layer_patience(
        mat, graphs[0], q, eps, 24,
        saturation_threshold=0.0, patience=2,
    )
    assert completed
    assert visited <= len(mat)
    assert len(got) <= len(plain)
    # lax-threshold patience == plain beam (never saturates)
    same, _v, _c = _search_layer_patience(
        mat, graphs[0], q, eps, 24,
        saturation_threshold=1.01, patience=2,
    )
    assert sorted(same) == sorted(plain)


def test_patience_topk_recall(emb):
    """End-to-end: patience top-k at default settings keeps recall vs
    brute force."""
    from lucene_spark.pipeline.graphann import ann_patience_topk
    from lucene_spark.pipeline.similarity import cosine_topk

    got = {r["vec_id"] for r in ann_patience_topk(emb, 0, 10).collect()}
    want = {r["vec_id"] for r in cosine_topk(emb, 0, 10).collect()}
    assert len(got & want) / 10 >= 0.9


def test_patience_topk_filtered(emb):
    from lucene_spark.pipeline.graphann import ann_patience_topk
    from lucene_spark.pipeline.similarity import cosine_topk

    got = ann_patience_topk(
        emb, 0, 5, filter_expr="label = 2"
    ).collect()
    assert len(got) == 5
    lab = {
        r["vec_id"] for r in emb.filter("label = 2").select("vec_id").collect()
    }
    assert {r["vec_id"] for r in got} <= lab


# ---------------------------------------------------------------------------
# Seeded
# ---------------------------------------------------------------------------


def test_seeded_good_seed_converges(emb):
    """Seeding with docs labeled like the near-neighbors keeps recall
    while skipping the descent."""
    from lucene_spark.pipeline.graphann import ann_seeded_topk
    from lucene_spark.pipeline.similarity import cosine_topk

    want = {r["vec_id"] for r in cosine_topk(emb, 0, 10).collect()}
    # seed: a cheap predicate that includes some near docs
    got = {
        r["vec_id"]
        for r in ann_seeded_topk(
            emb, 0, 10, seed_expr="vec_id % 7 = 0"
        ).collect()
    }
    assert len(got & want) / 10 >= 0.8


def test_seeded_no_match_falls_back(emb):
    """A seed matching nothing must fall back to the default descent
    (SeededKnnVectorQuery falls back to the delegate strategy)."""
    from lucene_spark.pipeline.graphann import ann_seeded_topk
    from lucene_spark.pipeline.similarity import cosine_topk

    want = {r["vec_id"] for r in cosine_topk(emb, 0, 10).collect()}
    got = {
        r["vec_id"]
        for r in ann_seeded_topk(emb, 0, 10, seed_expr="label = -1").collect()
    }
    assert len(got & want) / 10 >= 0.9
