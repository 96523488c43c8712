"""Semantic tests of the training-data pipeline operators: planted
duplicates must be found by every dedup family, and similarity search
must return the planted nearest neighbor. (Cross-engine value parity
with DuckDB is covered separately by test_gate_parity.py.)"""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def docs_df(spark):
    base = [
        "the quick brown fox jumps over the lazy dog near the river bank",
        "spark builds distributed inverted index postings with merge policy",
        "every document gets tokenized scored and ranked by bm25 weights",
        "completely unrelated text about cooking pasta with tomato sauce",
    ]
    rows = []
    # 0..3 distinct; 4 = exact dup of 0; 5 = near dup of 0 (one word
    # changed); 6 = near dup of 1 (one word appended); 7 = shuffled 2
    rows.append((0, base[0]))
    rows.append((1, base[1]))
    rows.append((2, base[2]))
    rows.append((3, base[3]))
    rows.append((4, base[0]))
    rows.append((5, base[0].replace("lazy", "sleepy")))
    rows.append((6, base[1] + " daily"))
    rows.append((7, "ranked bm25 by weights and scored gets tokenized every document"))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(20, 16).astype("float32")
    vecs[4] = vecs[0] + rng.randn(16).astype("float32") * 0.01  # near-dup of 0
    rows = [(int(i), [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_exact_dedup_finds_planted_dup(docs_df):
    from lucene_spark.pipeline.dedup import exact_dedup

    out = {r["doc_id"]: r for r in exact_dedup(docs_df).collect()}
    assert out[0]["group_size"] == 2 and out[0]["is_canonical"]
    assert out[4]["group_size"] == 2 and not out[4]["is_canonical"]
    assert out[1]["group_size"] == 1


def test_ngram_jaccard_finds_near_dups(docs_df):
    from lucene_spark.pipeline.dedup import ngram_jaccard_pairs

    pairs = {(r["a"], r["b"]): r["jaccard_x1e6"] for r in
             ngram_jaccard_pairs(docs_df, n=3, threshold=0.3).collect()}
    assert pairs[(0, 4)] == 1_000_000  # exact dup -> jaccard 1
    assert (0, 5) in pairs  # one-word change shares most 3-shingles
    assert (1, 6) in pairs
    assert (2, 7) not in pairs  # word order destroyed -> low 3-gram overlap
    assert all(a != 3 and b != 3 for a, b in pairs)  # unrelated doc clean


def test_minhash_lsh_finds_near_dups(docs_df):
    from lucene_spark.pipeline.dedup import minhash_lsh_pairs

    pairs = {(r["a"], r["b"]) for r in
             minhash_lsh_pairs(docs_df, n=3, threshold=0.3).collect()}
    assert (0, 4) in pairs
    assert all(a != 3 and b != 3 for a, b in pairs)


def test_minhash_is_subset_of_exact_jaccard(docs_df):
    """LSH candidates are verified with exact Jaccard, so minhash pairs
    must be a subset of the exhaustive n-gram Jaccard pairs."""
    from lucene_spark.pipeline.dedup import minhash_lsh_pairs, ngram_jaccard_pairs

    mh = {(r["a"], r["b"]) for r in minhash_lsh_pairs(docs_df, n=3, threshold=0.3).collect()}
    ex = {(r["a"], r["b"]) for r in ngram_jaccard_pairs(docs_df, n=3, threshold=0.3).collect()}
    assert mh <= ex


def test_simhash_near_dup_low_hamming(docs_df):
    from lucene_spark.pipeline.dedup import simhash_pairs

    pairs = {(r["a"], r["b"]): r["hamming"] for r in
             simhash_pairs(docs_df, max_hamming=8).collect()}
    assert pairs[(0, 4)] == 0  # identical text -> identical simhash
    assert (0, 5) in pairs  # one-word change -> few bits flip


def test_embedding_near_dups(emb_df):
    from lucene_spark.pipeline.dedup import embedding_near_dups

    pairs = {(r["a"], r["b"]) for r in embedding_near_dups(emb_df, threshold=0.95).collect()}
    assert (0, 4) in pairs


def test_cosine_topk_finds_planted_neighbor(emb_df):
    from lucene_spark.pipeline.similarity import cosine_topk

    top = cosine_topk(emb_df, query_id=0, k=3).collect()
    assert top[0]["vec_id"] == 4
    assert top[0]["cos_x1e6"] > 990_000
    # ranking is (cos DESC, vec_id ASC)
    scores = [r["cos_x1e6"] for r in top]
    assert scores == sorted(scores, reverse=True)


def test_ann_lsh_recalls_planted_neighbor(emb_df):
    """A near-identical vector lands in the same hyperplane bucket, so
    the ANN path must recall it as the top hit."""
    from lucene_spark.pipeline.similarity import ann_lsh_topk, cosine_topk, lsh_buckets

    b = {r["vec_id"]: r["bucket"] for r in lsh_buckets(emb_df, 8).collect()}
    assert b[0] == b[4]
    top = ann_lsh_topk(emb_df, query_id=0, k=3, n_planes=8).collect()
    assert top and top[0]["vec_id"] == 4
    # ANN scores agree exactly with brute force for returned ids
    brute = {r["vec_id"]: r["cos_x1e6"] for r in cosine_topk(emb_df, 0, 20).collect()}
    for r in top:
        assert brute[r["vec_id"]] == r["cos_x1e6"]


def test_lang_id_and_quality_shapes(spark):
    from lucene_spark.pipeline.textstats import lang_id, quality_scores, token_stats

    docs = spark.createDataFrame(
        [(0, "the cat and the dog is a pet"), (1, "der hund und die katze ist nicht da")],
        "doc_id long, text string",
    )
    langs = {r["doc_id"]: r["pred_lang"] for r in lang_id(docs).collect()}
    assert langs[0] == "en" and langs[1] == "de"
    q = {r["doc_id"]: r for r in quality_scores(docs).collect()}
    assert 0 < q[0]["quality_x1e6"] <= 1_000_000
    t = {r["doc_id"]: r for r in token_stats(docs).collect()}
    assert t[0]["n_tok"] == 8 and t[0]["n_distinct"] == 7  # 'the' twice


def test_fingerprint_word_order_invariant(spark):
    from lucene_spark.pipeline.textstats import fingerprints

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma  ALPHA beta"), (2, "alpha beta delta")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r for r in fingerprints(docs).collect()}
    assert fp[0]["canon_fp"] == fp[1]["canon_fp"]
    assert fp[0]["canon_fp"] != fp[2]["canon_fp"]
    assert fp[0]["content_hash"] != fp[1]["content_hash"]


def test_boilerplate_bomb_bounded_candidates(spark):
    """Occupancy cap (VERDICT r02 'do this' #6): thousands of identical
    docs land in ONE LSH bucket; the hub-star fallback must keep the
    candidate set O(m) (every pair anchored at the bucket's min doc id)
    instead of O(m^2), while still surfacing the dup cluster."""
    import pandas as pd

    from lucene_spark.pipeline.dedup import minhash_lsh_pairs, simhash_pairs

    n = 2000
    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(n),
                "text": ["the exact same boilerplate text block here"] * n,
            }
        )
    )
    mh = minhash_lsh_pairs(docs, threshold=0.5, k=5 * n).collect()
    assert len(mh) == n - 1  # hub-star: one pair per non-hub member
    assert all(r["a"] == 0 for r in mh)
    assert all(r["jaccard_x1e6"] == 1_000_000 for r in mh)

    sh = simhash_pairs(docs, max_hamming=3, k=5 * n).collect()
    assert len(sh) == n - 1
    assert all(r["a"] == 0 and r["hamming"] == 0 for r in sh)


def test_ivf_kmeans_training_recall(spark):
    """Lloyd-trained IVF centroids must reach at least the seeded
    quantizer's recall@k at equal n_probe (averaged over queries), and
    the trained path must stay a valid ANN result (subset semantics +
    correct scores)."""
    from lucene_spark.pipeline.similarity import (
        ann_ivf_topk,
        cosine_topk,
        ivf_train_kmeans,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

    def recall(kmeans_iters, qid):
        exact = {r["vec_id"] for r in cosine_topk(emb, qid, 10).collect()}
        approx = {
            r["vec_id"]
            for r in ann_ivf_topk(
                emb, qid, 10, n_centroids=16, n_probe=4,
                kmeans_iters=kmeans_iters,
            ).collect()
        }
        return len(exact & approx) / 10.0

    qids = [0, 3, 7]
    seeded = sum(recall(0, q) for q in qids) / len(qids)
    trained = sum(recall(2, q) for q in qids) / len(qids)
    assert trained >= seeded - 1e-9, (seeded, trained)

    # trained centroids: right count, right shape, finite values
    cents = ivf_train_kmeans(emb, n_centroids=8, iters=2).collect()
    assert len(cents) == 8
    import math

    for c in cents:
        assert all(math.isfinite(x) for x in c["cvec"])


def test_graph_ann_recall_and_exactness(spark):
    """Per-segment NSW graph ANN (the HNSW slot): measured recall@10
    must be high on the gate corpus, and every returned score must be
    the EXACT cosine of that vector (graph search approximates the
    candidate set, never the scores)."""
    from lucene_spark.pipeline.graphann import ann_graph_topk, graph_recall
    from lucene_spark.pipeline.similarity import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    rec = graph_recall(emb, [0, 3, 7, 11], k=10, m=8, ef=48, n_seeds=4)
    assert rec >= 0.9, rec  # beam over in-partition exact-kNN graphs

    got = ann_graph_topk(emb, query_id=0, k=10).collect()
    exact = {
        r["vec_id"]: r["cos_x1e6"]
        for r in cosine_topk(emb, 0, 200).collect()
    }
    for r in got:
        assert r["vec_id"] in exact
        assert abs(r["cos_x1e6"] - exact[r["vec_id"]]) <= 1

    # multi-partition path: graphs never span partitions, results merge
    got4 = ann_graph_topk(emb, query_id=0, k=10, partitions=4).collect()
    assert len(got4) == 10


def test_incremental_dedup_finds_cross_side_pairs_only(spark):
    """incremental_minhash_pairs must pair batch docs with corpus docs
    only (never batch-batch or corpus-corpus), and an injected
    near-duplicate of a corpus doc must be caught."""
    import pandas as pd
    from pyspark.sql import functions as F

    from lucene_spark.pipeline.dedup import incremental_minhash_pairs

    corpus_rows = [
        (i, f"the quick brown fox jumps over the lazy dog variant {i} "
            f"with unique tail {i * 17}")
        for i in range(20)
    ]
    # doc 100 near-duplicates corpus doc 3; doc 101 is novel
    batch_rows = [
        (100, corpus_rows[3][1] + " extra"),
        (101, "completely different content about spark dataframes and "
              "parquet column pruning strategies"),
    ]
    corpus = spark.createDataFrame(
        pd.DataFrame(corpus_rows, columns=["doc_id", "text"])
    )
    batch = spark.createDataFrame(
        pd.DataFrame(batch_rows, columns=["doc_id", "text"])
    )
    got = incremental_minhash_pairs(batch, corpus, threshold=0.5).collect()
    assert all(r["a"] >= 100 and r["b"] < 100 for r in got)
    assert (100, 3) in {(r["a"], r["b"]) for r in got}
    assert all(r["a"] != 101 for r in got)


def test_connected_components_clusters(spark):
    """Pairs -> components: chain {1-2, 2-3}, island {10-11}, and the
    min-id canonical election; singletons never appear."""
    from lucene_spark.pipeline.dedup import connected_components, dedup_clusters

    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (3, 7)], ["a", "b"]
    )
    comp = {
        r["node"]: r["comp"] for r in connected_components(pairs).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}
    rows = dedup_clusters(pairs).collect()
    assert [(r["doc_id"], r["component"], r["cluster_size"]) for r in rows] == [
        (1, 1, 4), (2, 1, 4), (3, 1, 4), (7, 1, 4), (10, 10, 2), (11, 10, 2),
    ]
    # canonical = doc_id == component, exactly one per cluster
    canon = [r["doc_id"] for r in rows if r["doc_id"] == r["component"]]
    assert canon == [1, 10]


def test_connected_components_long_chain_converges(spark):
    """A 12-node path needs multiple propagation rounds — the loop must
    reach the fixpoint, not stop after one round."""
    from lucene_spark.pipeline.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], ["a", "b"]
    )
    comp = connected_components(pairs).collect()
    assert {r["comp"] for r in comp} == {0}
    assert {r["node"] for r in comp} == set(range(13))


def test_hnsw_hierarchy_recall_and_exactness(spark):
    """True hierarchical HNSW (HnswGraphBuilder/HnswGraphSearcher):
    the layer hierarchy must actually form, recall@10 must be high,
    scores must be exact cosines, and the multi-partition merge must
    hold (one graph per partition, like one graph per segment)."""
    import numpy as np

    from lucene_spark.pipeline.graphann import (
        _build_hnsw,
        _normalize,
        ann_hnsw_topk,
        graph_recall,
    )
    from lucene_spark.pipeline.similarity import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")

    # hierarchy forms: with M=8 and n>=200, P(all levels 0) ~ 0
    mat = _normalize(
        np.stack(
            emb.limit(200).toPandas()["embedding"].map(np.asarray).to_numpy()
        ).astype(np.float64)
    )
    levels, graphs, entry, entry_level = _build_hnsw(
        mat, m=8, ef_construction=48, seed=42
    )
    assert entry_level >= 1 and len(graphs) == entry_level + 1
    assert int(levels[entry]) == entry_level
    # layer-0 degree bounded by 2M, upper layers by M
    assert max(len(a) for a in graphs[0]) <= 16
    if entry_level >= 1:
        assert max(len(a) for a in graphs[1]) <= 8

    rec = graph_recall(
        emb, [0, 3, 7, 11], k=10, method="hnsw", m=8, ef=48
    )
    assert rec >= 0.9, rec

    got = ann_hnsw_topk(emb, query_id=0, k=10).collect()
    exact = {
        r["vec_id"]: r["cos_x1e6"]
        for r in cosine_topk(emb, 0, 200).collect()
    }
    for r in got:
        assert r["vec_id"] in exact
        assert abs(r["cos_x1e6"] - exact[r["vec_id"]]) <= 1

    got4 = ann_hnsw_topk(emb, query_id=0, k=10, partitions=4).collect()
    assert len(got4) == 10


# ---------------------------------------------------------------------------
# filtered kNN (AbstractKnnVectorQuery pre-filter / visitedLimit /
# exactSearch-fallback contract)
# ---------------------------------------------------------------------------


def test_filtered_knn_decision_contract():
    from lucene_spark.pipeline.similarity import filtered_knn_decision

    # tiny filter -> exact (filterCard <= k)
    assert filtered_knn_decision(m=8, visited=100, n_cand=8, k=10)
    # approx would visit more rows than the exact scan costs -> exact
    assert filtered_knn_decision(m=50, visited=120, n_cand=30, k=10)
    # cannot return k filtered hits -> exact
    assert filtered_knn_decision(m=300, visited=120, n_cand=6, k=10)
    # otherwise -> approximate path
    assert not filtered_knn_decision(m=300, visited=120, n_cand=60, k=10)


def test_filtered_knn_selective_filter_is_exact(spark):
    """label=3 holds ~12% of rows while the probe visits ~25%: the
    visitedLimit contract fires and the result must be EXACTLY the
    brute force over the filtered rows."""
    from pyspark.sql import functions as F

    from lucene_spark.pipeline.similarity import ann_filtered_topk, cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    got = ann_filtered_topk(emb, "label = 3", query_id=0, k=10).toPandas()
    want = cosine_topk(
        emb.filter((F.col("label") == 3) | (F.col("vec_id") == 0)), 0, 10
    ).toPandas()
    assert got.values.tolist() == want.values.tolist()
    labels = {
        r["label"]
        for r in emb.join(
            spark.createDataFrame(got[["vec_id"]]), "vec_id", "left_semi"
        ).collect()
    }
    assert labels == {3}


def test_filtered_knn_permissive_filter_takes_approx_path(spark):
    """label%2=0 holds ~half the rows, the 4/16 probe visits ~25%:
    the approximate path runs; every hit passes the filter and recall
    vs filtered brute force is decent."""
    from pyspark.sql import functions as F

    from lucene_spark.pipeline.similarity import (
        ann_filtered_topk,
        cosine_topk,
        filtered_knn_decision,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    pred = "label % 2 = 0"
    m = emb.filter(F.expr(pred) & (F.col("vec_id") != 0)).count()
    got = ann_filtered_topk(emb, pred, query_id=0, k=10).toPandas()
    assert len(got) == 10
    labels = {
        r["label"]
        for r in emb.join(
            spark.createDataFrame(got[["vec_id"]]), "vec_id", "left_semi"
        ).collect()
    }
    assert all(l % 2 == 0 for l in labels)
    truth = set(
        cosine_topk(
            emb.filter(F.expr(pred) | (F.col("vec_id") == 0)), 0, 10
        ).toPandas()["vec_id"]
    )
    recall = len(truth & set(got["vec_id"])) / 10
    assert recall >= 0.3  # IVF probe quality, same bar the gate records
    # and the decision really was the approximate branch: visited < m
    assert m > 120  # ~244 rows pass; the probe visits ~125


def test_hnsw_filtered_search_and_fallback(spark):
    """Filtered HNSW: permissive filter searches the graph with
    filtered acceptance (results all pass the filter, recall high);
    selective filter trips the per-partition visit budget or the
    n_acc<=k shortcut and falls back to the exact accepted scan."""
    from pyspark.sql import functions as F

    from lucene_spark.pipeline.graphann import ann_hnsw_topk
    from lucene_spark.pipeline.similarity import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    for pred in ["label % 2 = 0", "label = 3"]:
        got = ann_hnsw_topk(
            emb, query_id=0, k=10, partitions=2, filter_expr=pred
        ).toPandas()
        truth = cosine_topk(
            emb.filter(F.expr(pred) | (F.col("vec_id") == 0)), 0, 10
        ).toPandas()
        recall = len(set(truth["vec_id"]) & set(got["vec_id"])) / 10
        assert recall >= 0.9, (pred, recall)
        labels = {
            r["label"]
            for r in emb.join(
                spark.createDataFrame(got[["vec_id"]]), "vec_id", "left_semi"
            ).collect()
        }
        if pred == "label = 3":
            assert labels == {3}
        else:
            assert all(lab % 2 == 0 for lab in labels)


def test_search_layer_filtered_budget_exhaustion():
    import numpy as np

    from lucene_spark.pipeline.graphann import (
        _exact_accepted,
        _normalize,
        _search_layer_filtered,
    )

    rng = np.random.default_rng(3)
    mat = _normalize(rng.normal(size=(50, 8)))
    # a ring graph forces a long walk; only 3 accepted nodes
    adj = [[(i + 1) % 50, (i - 1) % 50] for i in range(50)]
    accept = np.zeros(50, dtype=bool)
    accept[[40, 41, 42]] = True
    q = mat[40]
    best, visited, completed = _search_layer_filtered(
        mat, adj, q, [0], ef=10, accept=accept, visit_limit=5
    )
    assert not completed and visited >= 5
    # the fallback returns the true filtered top
    top = _exact_accepted(mat, accept, q, 3)
    assert {n for _s, n in top} == {40, 41, 42}


def test_connected_components_chain_converges_in_log_rounds(spark):
    """Adversarial 10k-doc chain (the boilerplate worst case): the
    alternating large-star/small-star rounds (Kiveris et al. SoCC'14)
    must converge in O(log n) rounds — plain min-label propagation
    needs diameter (= 10k) rounds here."""
    import math

    from pyspark.sql import functions as F

    from lucene_spark.pipeline.dedup import connected_components

    n = 10_000
    pairs = spark.range(n - 1).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    ).coalesce(4)
    stats = {}
    out = connected_components(pairs, max_iter=50, stats=stats).toPandas()
    assert (out["comp"] == 0).all() and len(out) == n
    assert stats["rounds"] <= 2 * math.log2(n)  # 15 measured, bound 26


def test_connected_components_shapes(spark):
    """Cliques, stars, two components, a singleton pair — exact labels."""
    from lucene_spark.pipeline.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1),     # triangle -> 1
         (10, 11), (10, 12), (10, 13),  # star -> 10
         (20, 21)],                   # pair -> 20
        "a long, b long",
    )
    got = {
        r["node"]: r["comp"] for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10,
                   20: 20, 21: 20}


def test_ann_graph_default_routes_to_hnsw(spark):
    """Above the partition-size threshold ann_graph_topk must take the
    HNSW build (r3 fix: O(p^2) NSW demoted to small-partition fast
    path) and still recall the true neighbors."""
    from lucene_spark.pipeline.graphann import ann_graph_topk
    from lucene_spark.pipeline.similarity import cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    exact = set(cosine_topk(emb, 0, 10).toPandas()["vec_id"])
    # threshold 100 forces the 500-row single partition through HNSW
    got = set(
        ann_graph_topk(emb, 0, 10, partitions=1, hnsw_threshold=100)
        .toPandas()["vec_id"]
    )
    assert len(exact & got) / 10 >= 0.9


def test_unrolled_cosine_bit_identical_to_hof_and_codegen(spark):
    """The string-built unrolled cosine (one F.expr parse — plan
    construction in O(1) py4j calls) must be bit-identical to the
    higher-order-function formulation it replaced, and the scoring
    projection must sit inside whole-stage codegen (the HOF form is a
    CodegenFallback expression and forced interpreted eval)."""
    from pyspark.sql import functions as F

    from lucene_spark.pipeline.similarity import _query_vec, cosine_lit_col

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qv = _query_vec(emb, 0)

    def hof(vec_col):
        import math

        nq = math.sqrt(sum(float(x) * float(x) for x in qv))
        q = F.array(*[F.lit(float(x)) for x in qv])
        dot = F.aggregate(
            F.zip_with(
                vec_col.cast("array<double>"), q, lambda a, b: a * b
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sq = F.aggregate(
            F.transform(vec_col.cast("array<double>"), lambda a: a * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return dot / (F.sqrt(sq) * F.lit(nq))

    a = (
        emb.select("vec_id", hof(F.col("embedding")).alias("c"))
        .toPandas()
        .sort_values("vec_id")["c"]
        .to_numpy()
    )
    df = emb.select("vec_id", cosine_lit_col("embedding", qv).alias("c"))
    b = df.toPandas().sort_values("vec_id")["c"].to_numpy()
    assert (a == b).all()

    # "*(n) Project" = the projection is inside a WholeStageCodegen stage
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "*(1) Project" in plan, plan.splitlines()[0]


def test_semantic_dedup_matches_bruteforce_within_clusters(spark):
    # SemDeDup: a vector is dropped iff a lower-id CLUSTER-MATE reaches
    # the threshold; exemplar = smallest such keeper — replay in numpy
    import numpy as np
    from pyspark.sql import functions as F

    from lucene_spark.pipeline.dedup import semantic_dedup
    from lucene_spark.pipeline.similarity import ivf_assign, ivf_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    th = 0.4
    got = [
        (r["a"], r["b"], r["cos_x1e6"])
        for r in semantic_dedup(emb, threshold=th).collect()
    ]
    assign = {
        r["vec_id"]: r["cid"]
        for r in ivf_assign(emb, ivf_centroids(emb, 16), 64).collect()
    }
    pdf = emb.orderBy("vec_id").toPandas()
    ids = list(pdf["vec_id"])
    vecs = np.array([np.array(v, float) for v in pdf["embedding"]])
    vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    want = {}
    for bi, b in enumerate(ids):
        best = None
        for ai, a in enumerate(ids):
            if a >= b or assign[a] != assign[b]:
                continue
            cos = float(vecs[ai] @ vecs[bi])
            if cos >= th:
                cx = round(cos * 1e6)
                if best is None or a < best[0]:
                    best = (a, cx)
        if best is not None:
            want[b] = best
    assert {(a, b, c) for a, b, c in got} == {
        (a, b, c) for b, (a, c) in want.items()
    }
    # the dropped set never contains a keeper
    dropped = {b for _, b, _ in got}
    keepers = {a for a, _, _ in got}
    assert not (dropped & keepers) or all(
        a < b for a, b, _ in got
    )


def test_routed_hnsw_recall_and_pruning(spark):
    """IVF-routed HNSW (r5): the coarse router must prune the corpus —
    only the probed lists' vectors are searched — while recall vs the
    exact top-k stays high, and scores remain exact cosines."""
    from lucene_spark.pipeline.graphann import ann_routed_hnsw_topk
    from lucene_spark.pipeline.similarity import (
        cosine_topk,
        ivf_assign,
        ivf_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    dims = len(emb.select("embedding").head()["embedding"])

    got = ann_routed_hnsw_topk(
        emb, query_id=0, k=10, n_centroids=16, n_probe=6, m=8, ef=64
    ).collect()
    assert len(got) == 10
    exact = {
        r["vec_id"]: r["cos_x1e6"]
        for r in cosine_topk(emb, 0, 500).collect()
    }
    # scores are exact cosines for every returned id
    hit = 0
    exact10 = set(list(exact)[:10])
    for r in got:
        assert r["vec_id"] in exact
        assert abs(r["cos_x1e6"] - exact[r["vec_id"]]) <= 1
        hit += r["vec_id"] in exact10
    assert hit >= 7, f"routed recall@10 too low: {hit}/10"

    # pruning actually happened: the probed lists hold a strict subset
    cents = ivf_centroids(emb, 16)
    sizes = (
        ivf_assign(emb, cents, dims).groupBy("cid").count().collect()
    )
    total = sum(r["count"] for r in sizes)
    top6 = sum(sorted((r["count"] for r in sizes), reverse=True)[:6])
    assert top6 < total


def test_persisted_hnsw_index_matches_fused(spark, tmp_path):
    """Persisted per-partition HNSW (Lucene99HnswVectorsFormat role):
    write once, query many — results bit-identical to the fused
    build+search path (same seed, same partitioning), and the query
    path runs NO graph build."""
    from lucene_spark.pipeline import graphann as ga
    from lucene_spark.pipeline.similarity import _query_vec

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    idx = str(tmp_path / "hnsw")
    ga.hnsw_index_write(emb, idx)

    for qid in (0, 7):
        qv = _query_vec(emb, qid)
        got = ga.hnsw_index_topk(
            spark, idx, qv, k=10, exclude_vec_id=qid
        ).collect()
        fused = ga.ann_hnsw_topk(emb, query_id=qid, k=10).collect()
        assert [(r["vec_id"], r["cos_x1e6"]) for r in got] == [
            (r["vec_id"], r["cos_x1e6"]) for r in fused
        ]

    # the query path reads ONLY the stored graph parquet — its plan
    # scans {idx}/graph and never the embeddings source
    qv = _query_vec(emb, 3)
    qdf = ga.hnsw_index_topk(spark, idx, qv, k=5, exclude_vec_id=3)
    plan = qdf._jdf.queryExecution().executedPlan().toString()
    assert "row_type:int" in plan  # the stored graph rows' schema
    assert "embedding" not in plan
    assert len(qdf.collect()) == 5


def test_persisted_hnsw_multi_partition(spark, tmp_path):
    from lucene_spark.pipeline import graphann as ga
    from lucene_spark.pipeline.similarity import _query_vec, cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    idx = str(tmp_path / "hnsw4")
    ga.hnsw_index_write(emb, idx, partitions=4)
    qv = _query_vec(emb, 0)
    got = ga.hnsw_index_topk(spark, idx, qv, k=10, exclude_vec_id=0).collect()
    assert len(got) == 10
    exact = {r["vec_id"]: r["cos_x1e6"] for r in cosine_topk(emb, 0, 200).collect()}
    for r in got:
        assert r["vec_id"] in exact
        assert abs(r["cos_x1e6"] - exact[r["vec_id"]]) <= 1


def test_persisted_hnsw_routed_query(spark, tmp_path):
    """Cluster-partitioned persisted index + stored-centroid routing:
    the probed scan reads only n_probe of the cluster_by partition
    directories (physical partition pruning on pid), recall stays
    high, scores stay exact."""
    from lucene_spark.pipeline import graphann as ga
    from lucene_spark.pipeline.similarity import _query_vec, cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    idx = str(tmp_path / "hnsw_routed")
    ga.hnsw_index_write(emb, idx, cluster_by=8)

    routed = ga.hnsw_index_topk(
        spark, idx, _query_vec(emb, 0), k=10, ef=64,
        exclude_vec_id=0, n_probe=6,
    )
    plan = routed._jdf.queryExecution().executedPlan().toString()
    # physical pruning: the pid partition filter reaches the scan
    assert "pid" in plan and (
        "PartitionFilters" in plan or "pid IN" in plan.replace("#", " ")
    )

    # mean recall over several queries (the synthetic embeddings are
    # near-uniform, so clusters are weak — the honest setting measures
    # the routing trade, not one lucky query); scores stay exact
    hits_tot = 0
    for qid in (0, 3, 7, 11):
        qv = _query_vec(emb, qid)
        got = ga.hnsw_index_topk(
            spark, idx, qv, k=10, ef=64, exclude_vec_id=qid, n_probe=6
        ).collect()
        assert len(got) == 10
        exact = {
            r["vec_id"]: r["cos_x1e6"]
            for r in cosine_topk(emb, qid, 500).collect()
        }
        exact10 = set(list(exact)[:10])
        for r in got:
            assert r["vec_id"] in exact
            assert abs(r["cos_x1e6"] - exact[r["vec_id"]]) <= 1
            hits_tot += r["vec_id"] in exact10
    assert hits_tot >= 34, f"routed persisted recall: {hits_tot}/40"


def test_persisted_hnsw_partition_larger_than_arrow_batch(spark, tmp_path):
    """A partition above spark.sql.execution.arrow.maxRecordsPerBatch
    (10k default) arrives at mapInPandas as MULTIPLE pandas batches —
    the build must buffer them into ONE graph (one meta row, one
    centroid row, unique local ids) or the stored index silently
    corrupts. Regression for the per-batch-graph bug."""
    from pyspark.sql import functions as F

    from lucene_spark.pipeline import graphann as ga
    from lucene_spark.pipeline.similarity import cosine_topk, query_vec

    emb = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
    n = emb.count()
    big = emb
    for i in (1, 2, 3, 4, 5):
        big = big.unionByName(
            emb.select(
                (F.col("vec_id") + F.lit(i * n)).alias("vec_id"),
                "embedding", *[c for c in emb.columns
                               if c not in ("vec_id", "embedding")],
            )
        )
    assert big.count() > 10_000
    idx = str(tmp_path / "big")
    ga.hnsw_index_write(big, idx, partitions=1)

    g = spark.read.parquet(f"{idx}/graph")
    meta_rows = g.filter(F.col("row_type") == 2).count()
    assert meta_rows == 1, f"one graph per partition, got {meta_rows}"
    vec_rows = g.filter(F.col("row_type") == 0)
    assert vec_rows.count() == big.count()
    assert (
        vec_rows.select("local_id").distinct().count() == big.count()
    ), "local ids must be unique within the partition"

    got = ga.hnsw_index_topk(
        spark, idx, query_vec(big, 0), k=10, exclude_vec_id=0
    ).collect()
    assert len(got) == 10
    exact = {
        r["vec_id"]: r["cos_x1e6"]
        for r in cosine_topk(big, 0, 200).collect()
    }
    for r in got:
        assert r["vec_id"] in exact
        assert abs(r["cos_x1e6"] - exact[r["vec_id"]]) <= 1
