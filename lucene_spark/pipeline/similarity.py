"""Similarity search over the ``embeddings`` table (vec_id, embedding
float[], label).

Two execution strategies:

- ``cosine_topk``  — exact brute-force: the query vector is collected
  once and inlined as a JVM literal array; every row computes
  dot/(|a||q|) inside whole-stage codegen (zip_with + aggregate — no
  Python, no shuffle; the only exchange is the final
  TakeOrderedAndProject). This is the O(n·d) scan baseline — at 100 TB
  it is a single narrow map stage, embarrassingly parallel.

- ``ann_lsh_topk`` — random-hyperplane LSH: P deterministic integer
  hyperplanes (md5-derived, so the identical planes are computable in
  ANSI SQL); each vector's bucket is the P-bit sign pattern of its
  plane dots. Candidates = rows in the query's bucket; exact cosine
  re-rank inside the bucket. At scale the bucket id becomes the table's
  partition key, so a query touches 1/2^P of the data.

Oracle SQL twins are generated alongside each operator.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

# plane weights are integers in [-1000, 1000] derived from md5 — exact
# in both engines, no float-literal drift
_PLANE_MOD = 2001
_PLANE_OFF = 1000


def _emb_double(col: str = "embedding") -> Column:
    return F.col(col).cast("array<double>")


def _query_vec(emb: DataFrame, query_id: int) -> list[float]:
    row = emb.filter(F.col("vec_id") == query_id).select("embedding").head()
    if row is None:
        raise ValueError(f"query vec_id {query_id} not found")
    return [float(x) for x in row[0]]


def query_vec(emb: DataFrame, vec_id: int) -> list[float]:
    """Public accessor: the stored embedding of one vec_id as a float
    list — the query-vector input the persisted ANN indexes
    (graphann.hnsw_index_topk, pq.pq_index_topk) take. One pushed-down
    single-row lookup."""
    return _query_vec(emb, vec_id)


def _dlit(x: float) -> str:
    """Shortest-roundtrip SQL double literal. repr() of a Python float
    is the shortest decimal that parses back to the same IEEE-754
    double, and Spark's literal parser does correctly-rounded decimal
    -> double, so the JVM sees bit-identical values."""
    v = float(x)
    if v != v or v in (float("inf"), float("-inf")):
        raise ValueError(f"non-finite component {v!r}")
    return f"{v!r}D" if v >= 0 else f"(-{-v!r}D)"


def _unrolled_cos_sql(vec_sql: str, qv: list[float]) -> str:
    """The cosine-vs-literal expression as ONE SQL string. Semantics
    (element_at chains, left-associated adds in ascending index order)
    are identical to building the same tree with Column operators —
    the string form exists because constructing a 3x128-node tree
    through py4j costs ~0.4 s of driver time PER PLAN, while parsing
    one expression string is one JVM call."""
    els = [f"CAST(element_at({vec_sql}, {i + 1}) AS DOUBLE)" for i in range(len(qv))]
    nq = math.sqrt(sum(float(x) * float(x) for x in qv))
    dot = " + ".join(f"{e} * {_dlit(q)}" for e, q in zip(els, qv))
    sq = " + ".join(f"{e} * {e}" for e in els)
    return f"({dot}) / (SQRT({sq}) * {_dlit(nq)})"


def cosine_lit_col(vec_sql: str, qv: list[float]) -> Column:
    """cosine(vec column, literal query vector) as a whole-stage-codegen
    Column. Higher-order functions (zip_with / aggregate / transform)
    are CodegenFallback expressions in Spark — any projection that
    contains one runs interpreted — so the dot product and the row
    norm are unrolled into element_at chains. The adds are
    left-associated in ascending index order, the exact accumulation
    order of aggregate(acc + x), so the doubles are bit-identical to
    the HOF formulation this replaces. ``vec_sql`` is a SQL fragment
    naming the vector column (e.g. ``"embedding"``)."""
    return F.expr(_unrolled_cos_sql(vec_sql, qv))


def cosine_topk(emb: DataFrame, query_id: int = 0, k: int = 10) -> DataFrame:
    """Exact brute-force cosine top-k for the row with vec_id=query_id
    (self excluded). -> (vec_id, cos_x1e6), (cos DESC, vec_id ASC)."""
    qv = _query_vec(emb, query_id)
    cos = cosine_lit_col("embedding", qv)
    return (
        emb.filter(F.col("vec_id") != query_id)
        .select("vec_id", F.round(cos * 1e6).cast("long").alias("cos_x1e6"))
        .orderBy(F.col("cos_x1e6").desc(), F.col("vec_id").asc())
        .limit(k)
    )


_COMP_SQL = """comp AS (
  SELECT vec_id, unnest(generate_series(1, len(embedding))) - 1 AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings
)"""


def cosine_topk_sql(
    query_id: int = 0, k: int = 10, filter_expr: str | None = None
) -> str:
    fpred = (
        f" AND c.vec_id IN (SELECT vec_id FROM embeddings WHERE ({filter_expr}))"
        if filter_expr
        else ""
    )
    return f"""WITH {_COMP_SQL},
qc AS (SELECT pos, v FROM comp WHERE vec_id = {query_id}),
nq AS (SELECT sqrt(SUM(v*v)) AS nq FROM qc),
dots AS (
  SELECT c.vec_id, SUM(c.v * q.v) AS dot, sqrt(SUM(c.v * c.v)) AS na
  FROM comp c JOIN qc q USING (pos)
  WHERE c.vec_id <> {query_id}{fpred}
  GROUP BY c.vec_id
)
SELECT d.vec_id, CAST(ROUND(d.dot/(d.na*nq.nq)*1000000) AS BIGINT) AS cos_x1e6
FROM dots d CROSS JOIN nq
ORDER BY cos_x1e6 DESC, d.vec_id ASC LIMIT {k}"""


def diversifying_children_topk(
    emb: DataFrame, parent_col: str, query_id: int = 0, k: int = 10
) -> DataFrame:
    """DiversifyingChildrenFloatKnnVectorQuery (join/.../
    DiversifyingChildrenFloatKnnVectorQuery.java +
    DiversifyingNearestChildrenKnnCollector.java): nearest child
    vectors DEDUPLICATED to the single best child per parent — the
    result is top-k PARENTS, each represented by its best child's
    similarity (so one hot parent cannot fill the whole top-k).
    `parent_col` is the child row's parent key (the reference derives
    it from block adjacency; relationally it is the foreign key).
    -> (parent, vec_id, cos_x1e6), (cos DESC, parent ASC) top-k.

    100-TB shape: exact scoring is one codegen projection; the
    per-parent dedup is a WindowGroupLimit (rank-1 per parent) that
    prunes map-side BEFORE the single shuffle, then
    TakeOrderedAndProject — the same diversified-top-k plan as
    sqlpath.diversified_topk. Approximate variant: route the children
    through ann_hnsw_topk with oversampling, then apply the same
    rank-1 window (recall-gated, not exactness-gated)."""
    from pyspark.sql import Window

    qv = _query_vec(emb, query_id)
    cos = cosine_lit_col("embedding", qv)
    scored = emb.filter(F.col("vec_id") != query_id).select(
        F.col(parent_col).alias("parent"),
        "vec_id",
        F.round(cos * 1e6).cast("long").alias("cos_x1e6"),
    )
    w = Window.partitionBy("parent").orderBy(
        F.col("cos_x1e6").desc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
        .orderBy(F.col("cos_x1e6").desc(), F.col("parent").asc())
        .limit(k)
    )


def _planes_df(spark, n_planes: int, dims: int) -> DataFrame:
    """(p, pos, w): deterministic integer hyperplane components."""
    rows = spark.range(n_planes * dims).select(
        (F.col("id") / dims).cast("int").alias("p"),
        (F.col("id") % dims).cast("int").alias("pos"),
    )
    key = F.concat(F.col("p").cast("string"), F.lit("_"), F.col("pos").cast("string"))
    w = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % _PLANE_MOD
        - _PLANE_OFF
    )
    return rows.withColumn("w", w.cast("double"))


def lsh_buckets(emb: DataFrame, n_planes: int = 8) -> DataFrame:
    """-> (vec_id, bucket): P-bit random-hyperplane sign bucket.
    Plane dots via a broadcast join on component position + one
    groupBy(vec_id) — a single shuffle, map-side combined."""
    spark = emb.sparkSession
    dims = len(emb.select("embedding").head()[0])
    planes = _planes_df(spark, n_planes, dims)
    comp = emb.select(
        "vec_id", F.posexplode(_emb_double()).alias("pos", "v")
    )
    dots = (
        comp.join(F.broadcast(planes), "pos")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("v") * F.col("w")).alias("dot"))
    )
    bucket = F.sum(
        F.when(F.col("dot") > 0, F.expr("shiftleft(1L, p)")).otherwise(F.lit(0))
    )
    return dots.groupBy("vec_id").agg(bucket.cast("long").alias("bucket"))


def ann_lsh_topk(
    emb: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_planes: int = 8,
    multiprobe: int = 0,
) -> DataFrame:
    """Approximate NN: exact cosine re-rank restricted to the query's
    LSH bucket. ``multiprobe=1`` additionally probes every bucket at
    hamming distance 1 (the classic multi-probe LSH recall lever —
    n_planes+1 buckets instead of 1, still a bucket equi/IN join).
    -> (vec_id, cos_x1e6)."""
    buckets = lsh_buckets(emb, n_planes)
    qb = buckets.filter(F.col("vec_id") == query_id).select(
        F.col("bucket").alias("qbucket")
    )
    cond = F.col("bucket") == F.col("qbucket")
    if multiprobe >= 1:
        for i in range(n_planes):
            cond = cond | (
                F.col("bucket") == F.col("qbucket").bitwiseXOR(F.lit(1 << i))
            )
    cand = (
        buckets.join(F.broadcast(qb), cond)
        .select("vec_id")
        .filter(F.col("vec_id") != query_id)
    )
    restricted = emb.join(cand, "vec_id", "left_semi")
    return cosine_topk(
        restricted.unionByName(emb.filter(F.col("vec_id") == query_id)),
        query_id,
        k,
    )


def ivf_centroids(emb: DataFrame, n_centroids: int = 16) -> DataFrame:
    """Deterministic coarse quantizer for IVF: the centroids are the
    n_centroids corpus vectors with the smallest md5(vec_id) rank — a
    seeded sample, no Lloyd iterations, so both engines derive the
    IDENTICAL quantizer (float-sum-order-free). -> (cid, cvec)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("vec_id").cast("string"), F.lit("_c"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    picked = (
        emb.select("vec_id", h.alias("h"))
        .orderBy("h", "vec_id")
        .limit(n_centroids)
        .select("vec_id")
    )
    return emb.join(picked, "vec_id", "left_semi").select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )


def _cos_sql(vsql: str, csql: str, dims: int) -> Column:
    """cosine(two runtime vector columns named by SQL fragments),
    unrolled into element_at chains (same accumulation order as the
    HOF form) so it stays inside whole-stage codegen. Built as ONE
    expression string for the same plan-construction-cost reason as
    _unrolled_cos_sql."""
    ve = [f"CAST(element_at({vsql}, {i + 1}) AS DOUBLE)" for i in range(dims)]
    ce = [f"CAST(element_at({csql}, {i + 1}) AS DOUBLE)" for i in range(dims)]
    dot = " + ".join(f"{a} * {b}" for a, b in zip(ve, ce))
    na2 = " + ".join(f"{a} * {a}" for a in ve)
    nb2 = " + ".join(f"{b} * {b}" for b in ce)
    return F.expr(f"({dot}) / (SQRT({na2}) * SQRT({nb2}))")


def _cos_cols(vcol: Column, ccol: Column) -> Column:
    """cosine(vcol, ccol) in higher-order-function form — kept for
    variable-length arrays / tiny inputs where interpreted eval is
    fine (e.g. the n_centroids-row probe scan)."""
    dot = F.aggregate(
        F.zip_with(vcol, ccol, lambda a, b: a * b), F.lit(0.0), lambda acc, x: acc + x
    )
    na = F.sqrt(
        F.aggregate(F.transform(vcol, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(ccol, lambda a: a * a), F.lit(0.0), lambda acc, x: acc + x)
    )
    return dot / (na * nb)


def ivf_assign(
    emb: DataFrame, cents: DataFrame, dims: int | None = None
) -> DataFrame:
    """-> (vec_id, cid): each vector assigned to its nearest centroid
    by cosine (argmax cos, ties to the smaller cid). One broadcast
    nested-loop against the tiny centroid table + a window argmax —
    shuffle only by vec_id. At 100 TB the assignment IS the table's
    partition key (the inverted-file layout). ``dims`` (when the
    embedding width is known) unrolls the cosine so the n x k scoring
    pass stays in whole-stage codegen."""
    from pyspark.sql.window import Window

    pairs = emb.select("vec_id", _emb_double().alias("v")).crossJoin(
        F.broadcast(cents.select("cid", F.col("cvec").cast("array<double>").alias("c")))
    )
    cos = (
        _cos_sql("v", "c", dims)
        if dims is not None
        else _cos_cols(F.col("v"), F.col("c"))
    )
    scored = pairs.select("vec_id", "cid", cos.alias("cos"))
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "cid")
    )


def ivf_train_kmeans(
    emb: DataFrame,
    n_centroids: int | None = None,
    iters: int = 3,
    dims: int | None = None,
) -> DataFrame:
    """Lloyd-refined coarse quantizer (the KMeans step of a production
    IVF index, cf. the reference's vector-quality machinery around
    util/hnsw): seed with the deterministic md5 sample (ivf_centroids),
    then ``iters`` rounds of assign -> per-cluster mean. Each round is
    one broadcast argmax (ivf_assign) plus ONE groupBy over exploded
    components — map-side combined, shuffle output = k x dims rows.
    Empty clusters keep their previous centroid. ``n_centroids`` = None
    picks ~sqrt(n), the standard IVF sizing. -> (cid, cvec).

    Not wired into the value-checked gates (the DuckDB oracle mirrors
    the iteration-free seeded quantizer; float reduction order across
    engines makes iterated means oracle-hostile) — quality is instead
    evidenced by the recall test (tests/test_pipeline.py), which shows
    trained centroids reach at-least-seeded recall at equal n_probe."""
    if n_centroids is None:
        n = emb.count()
        n_centroids = max(4, int(n ** 0.5))
    cents = ivf_centroids(emb, n_centroids)
    for _ in range(max(0, iters)):
        assign = ivf_assign(emb, cents, dims)
        comp = (
            emb.join(assign, "vec_id")
            .select("cid", F.posexplode(_emb_double()).alias("pos", "val"))
            .groupBy("cid", "pos")
            .agg(F.avg("val").alias("m"))
        )
        means = (
            comp.groupBy("cid")
            .agg(
                F.array_sort(
                    F.collect_list(F.struct("pos", "m"))
                ).alias("pm")
            )
            .select(
                "cid",
                F.transform(F.col("pm"), lambda x: x["m"]).alias("new_cvec"),
            )
        )
        cents = (
            cents.join(means, "cid", "left")
            .select(
                "cid",
                F.coalesce(
                    F.col("new_cvec"),
                    F.col("cvec").cast("array<double>"),
                ).alias("cvec"),
            )
        )
    return cents


def ann_ivf_topk(
    emb: DataFrame,
    query_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    kmeans_iters: int = 0,
) -> DataFrame:
    """IVF-flat approximate NN (the scalable coarse-quantize-then-
    refine shape; HnswGraphSearcher's quality slot): probe the n_probe
    nearest inverted lists, exact cosine re-rank inside them. A query
    touches ~n_probe/n_centroids of the data. -> (vec_id, cos_x1e6)."""
    qv = _query_vec(emb, query_id)
    dims = len(qv)
    cents = (
        ivf_train_kmeans(emb, n_centroids, kmeans_iters, dims=dims)
        if kmeans_iters > 0
        else ivf_centroids(emb, n_centroids)
    )
    assign = ivf_assign(emb, cents, dims)
    probe = (
        cents.select(
            "cid",
            cosine_lit_col("CAST(cvec AS ARRAY<DOUBLE>)", qv).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("cid").asc())
        .limit(n_probe)
        .select("cid")
    )
    cand = (
        assign.join(F.broadcast(probe), "cid")
        .select("vec_id")
        .filter(F.col("vec_id") != query_id)
    )
    restricted = emb.join(cand, "vec_id", "left_semi")
    return cosine_topk(
        restricted.unionByName(emb.filter(F.col("vec_id") == query_id)),
        query_id,
        k,
    )


def ann_ivf_topk_sql(
    query_id: int = 0, k: int = 10, n_centroids: int = 16, n_probe: int = 4
) -> str:
    return f"""WITH {_COMP_SQL},
cent AS (
  SELECT vec_id AS cid FROM (
    SELECT vec_id,
      CAST(('0x'||substr(md5(CAST(vec_id AS VARCHAR)||'_c'),1,8)) AS BIGINT) AS h
    FROM embeddings ORDER BY h, vec_id LIMIT {n_centroids}
  )
),
norms AS (SELECT vec_id, sqrt(SUM(v*v)) AS nrm FROM comp GROUP BY vec_id),
cdots AS (
  SELECT e.vec_id, c.vec_id AS cid, SUM(e.v * c.v) AS dot
  FROM comp e JOIN comp c USING (pos) JOIN cent ON c.vec_id = cent.cid
  GROUP BY e.vec_id, c.vec_id
),
ccos AS (
  SELECT d.vec_id, d.cid, d.dot/(ne.nrm*nc.nrm) AS cos
  FROM cdots d JOIN norms ne ON ne.vec_id = d.vec_id
       JOIN norms nc ON nc.vec_id = d.cid
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, cid ASC) AS rn
    FROM ccos
  ) WHERE rn = 1
),
probe AS (
  SELECT cid FROM ccos WHERE vec_id = {query_id}
  ORDER BY cos DESC, cid ASC LIMIT {n_probe}
),
cand AS (
  SELECT a.vec_id FROM assign a JOIN probe USING (cid)
  WHERE a.vec_id <> {query_id}
),
qc AS (SELECT pos, v FROM comp WHERE vec_id = {query_id}),
nq AS (SELECT sqrt(SUM(v*v)) AS nq FROM qc),
dots AS (
  SELECT c.vec_id, SUM(c.v * q.v) AS dot, sqrt(SUM(c.v * c.v)) AS na
  FROM comp c JOIN qc q USING (pos) JOIN cand ON c.vec_id = cand.vec_id
  GROUP BY c.vec_id
)
SELECT d.vec_id, CAST(ROUND(d.dot/(d.na*nq.nq)*1000000) AS BIGINT) AS cos_x1e6
FROM dots d CROSS JOIN nq
ORDER BY cos_x1e6 DESC, d.vec_id ASC LIMIT {k}"""


def lsh_table_buckets(
    emb: DataFrame, n_planes: int = 4, n_tables: int = 6
) -> DataFrame:
    """-> (vec_id, t, bucket): one sign-bucket per hash TABLE (the
    multi-table LSH layout; table t uses planes [t*n_planes,
    (t+1)*n_planes)). All n_planes*n_tables plane dots come from ONE
    broadcast join + ONE groupBy — map-side combined, single shuffle."""
    spark = emb.sparkSession
    dims = len(emb.select("embedding").head()[0])
    planes = _planes_df(spark, n_planes * n_tables, dims)
    comp = emb.select("vec_id", F.posexplode(_emb_double()).alias("pos", "v"))
    dots = (
        comp.join(F.broadcast(planes), "pos")
        .groupBy("vec_id", "p")
        .agg(F.sum(F.col("v") * F.col("w")).alias("dot"))
    )
    bucket = F.sum(
        F.when(
            F.col("dot") > 0,
            F.expr(f"shiftleft(1L, CAST(p % {n_planes} AS INT))"),
        ).otherwise(F.lit(0))
    )
    return (
        dots.withColumn("t", (F.col("p") / n_planes).cast("int"))
        .groupBy("vec_id", "t")
        .agg(bucket.cast("long").alias("bucket"))
    )


def filtered_knn_decision(
    m: int, visited: int, n_cand: int, k: int
) -> bool:
    """True = exact scan over the filter (the reference's exactSearch
    fallback, core/search/AbstractKnnVectorQuery.java): when the filter
    is tiny (m <= k), when the approximate path would score more rows
    than the exact scan costs (visited > m — the visitedLimit contract),
    or when it cannot return k filtered hits (n_cand < k)."""
    return m <= k or visited > m or n_cand < k


def ann_filtered_topk(
    emb: DataFrame,
    filter_expr: str,
    query_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> DataFrame:
    """Filtered kNN (KnnFloatVectorQuery.java + AbstractKnnVectorQuery
    .java): evaluate the filter once (BitSetCollector role, cardinality
    m), then either (a) EXACT cosine over the m filtered vectors when
    the filter is selective — m <= k, or the IVF probe would visit more
    rows than m (the visitedLimit contract), or the probed lists hold
    fewer than k filtered candidates — or (b) the IVF-restricted path:
    probe the n_probe nearest inverted lists, keep filtered candidates,
    exact cosine re-rank. ``filter_expr`` is ANSI SQL over the
    embeddings columns so the DuckDB twin evaluates the identical
    predicate. Either path ends in an exact re-rank, so results are
    deterministic. -> (vec_id, cos_x1e6).

    Scale shape: the filter evaluation and all three cardinalities are
    single column-pruned aggregations; the exact branch is a narrow
    filtered scan; the approximate branch touches ~n_probe/n_centroids
    of the table (the inverted-file partition key at 100 TB)."""
    qv = _query_vec(emb, query_id)
    dims = len(qv)
    pred = F.expr(filter_expr)
    femb = emb.filter(pred)
    m = femb.filter(F.col("vec_id") != query_id).count()
    cents = ivf_centroids(emb, n_centroids)
    assign = ivf_assign(emb, cents, dims)
    probe = (
        cents.select(
            "cid",
            cosine_lit_col("CAST(cvec AS ARRAY<DOUBLE>)", qv).alias("cos"),
        )
        .orderBy(F.col("cos").desc(), F.col("cid").asc())
        .limit(n_probe)
        .select("cid")
    )
    probed = assign.join(F.broadcast(probe), "cid").filter(
        F.col("vec_id") != query_id
    )
    visited = probed.count()
    cand = probed.join(
        emb.filter(pred).select("vec_id"), "vec_id", "left_semi"
    )
    n_cand = cand.count()
    base = femb if filtered_knn_decision(m, visited, n_cand, k) else emb.join(
        cand.select("vec_id"), "vec_id", "left_semi"
    )
    return cosine_topk(
        base.filter(F.col("vec_id") != query_id).unionByName(
            emb.filter(F.col("vec_id") == query_id)
        ),
        query_id,
        k,
    )


def ann_filtered_topk_sql(
    filter_expr: str,
    query_id: int = 0,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
) -> str:
    """DuckDB twin of ann_filtered_topk: the same IVF CTEs, the same
    three cardinalities, the same exact-vs-approximate decision as a
    scalar predicate gating two UNION ALL branches."""
    return f"""WITH {_COMP_SQL},
cent AS (
  SELECT vec_id AS cid FROM (
    SELECT vec_id,
      CAST(('0x'||substr(md5(CAST(vec_id AS VARCHAR)||'_c'),1,8)) AS BIGINT) AS h
    FROM embeddings ORDER BY h, vec_id LIMIT {n_centroids}
  )
),
norms AS (SELECT vec_id, sqrt(SUM(v*v)) AS nrm FROM comp GROUP BY vec_id),
cdots AS (
  SELECT e.vec_id, c.vec_id AS cid, SUM(e.v * c.v) AS dot
  FROM comp e JOIN comp c USING (pos) JOIN cent ON c.vec_id = cent.cid
  GROUP BY e.vec_id, c.vec_id
),
ccos AS (
  SELECT d.vec_id, d.cid, d.dot/(ne.nrm*nc.nrm) AS cos
  FROM cdots d JOIN norms ne ON ne.vec_id = d.vec_id
       JOIN norms nc ON nc.vec_id = d.cid
),
assign AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, cid ASC) AS rn
    FROM ccos
  ) WHERE rn = 1
),
probe AS (
  SELECT cid FROM ccos WHERE vec_id = {query_id}
  ORDER BY cos DESC, cid ASC LIMIT {n_probe}
),
femb AS (SELECT vec_id FROM embeddings
         WHERE ({filter_expr}) AND vec_id <> {query_id}),
probed AS (
  SELECT a.vec_id FROM assign a JOIN probe USING (cid)
  WHERE a.vec_id <> {query_id}
),
candf AS (SELECT p.vec_id FROM probed p JOIN femb USING (vec_id)),
decide AS (SELECT
  ((SELECT count(*) FROM femb) <= {k}
   OR (SELECT count(*) FROM probed) > (SELECT count(*) FROM femb)
   OR (SELECT count(*) FROM candf) < {k}) AS use_exact),
base AS (
  SELECT vec_id FROM femb WHERE (SELECT use_exact FROM decide)
  UNION ALL
  SELECT vec_id FROM candf WHERE NOT (SELECT use_exact FROM decide)
),
qc AS (SELECT pos, v FROM comp WHERE vec_id = {query_id}),
nq AS (SELECT sqrt(SUM(v*v)) AS nq FROM qc),
dots AS (
  SELECT c.vec_id, SUM(c.v * q.v) AS dot, sqrt(SUM(c.v * c.v)) AS na
  FROM comp c JOIN qc q USING (pos) JOIN base ON c.vec_id = base.vec_id
  GROUP BY c.vec_id
)
SELECT d.vec_id, CAST(ROUND(d.dot/(d.na*nq.nq)*1000000) AS BIGINT) AS cos_x1e6
FROM dots d CROSS JOIN nq
ORDER BY cos_x1e6 DESC, d.vec_id ASC LIMIT {k}"""


def ann_recall(
    emb: DataFrame, query_id: int = 0, k: int = 10, n_planes: int = 6
) -> DataFrame:
    """Recall@k of every approximate path against the exact brute-force
    top-k — the quality evidence the reference gets from
    HnswGraphSearcher recall tests, measured rather than assumed.
    -> (method, recall_x1e6) for lsh / lsh_mp (multi-probe) / ivf, plus
    the FILTERED-kNN branches (each against brute force OVER THE SAME
    FILTER): ivf_filt (permissive filter — the approximate IVF path
    with filtered candidates) and filt_exact (selective filter — the
    probe visits more rows than the filter holds, so the exactSearch
    fallback fires and recall is 1 by construction)."""
    from lucene_spark.pipeline.quantize import sq_cosine_topk

    exact = cosine_topk(emb, query_id, k).select("vec_id")
    permissive, selective = "label % 2 = 0", "label = 3"
    methods = {
        # int8 scalar quantization: recall delta vs float32 brute force
        # (the Lucene99ScalarQuantizedVectorsFormat quality evidence)
        "sq8": (exact, sq_cosine_topk(emb, query_id, k, confidence=0.9)),
        "lsh": (exact, ann_lsh_topk(emb, query_id, k, n_planes)),
        "lsh_mp": (exact, ann_lsh_topk(emb, query_id, k, 4, multiprobe=1)),
        "ivf": (exact, ann_ivf_topk(emb, query_id, k, 16, 4)),
        "ivf_filt": (
            cosine_topk(
                emb.filter(F.expr(permissive) | (F.col("vec_id") == query_id)),
                query_id,
                k,
            ).select("vec_id"),
            ann_filtered_topk(emb, permissive, query_id, k, 16, 4),
        ),
        "filt_exact": (
            cosine_topk(
                emb.filter(F.expr(selective) | (F.col("vec_id") == query_id)),
                query_id,
                k,
            ).select("vec_id"),
            ann_filtered_topk(emb, selective, query_id, k, 16, 4),
        ),
    }
    out = None
    for m, (truth, approx) in methods.items():
        r = truth.join(approx.select("vec_id"), "vec_id", "left_semi").agg(
            F.lit(m).alias("method"),
            F.round(F.count("*") * 1e6 / k).cast("long").alias("recall_x1e6"),
        )
        out = r if out is None else out.unionByName(r)
    return out


def ann_recall_sql(query_id: int = 0, k: int = 10, n_planes: int = 6) -> str:
    from lucene_spark.pipeline.quantize import sq_cosine_topk_sql

    permissive, selective = "label % 2 = 0", "label = 3"
    return f"""WITH exact_k AS ({cosine_topk_sql(query_id, k)}),
sq8_k AS ({sq_cosine_topk_sql(query_id, k, confidence=0.9)}),
lsh_k AS ({ann_lsh_topk_sql(query_id, k, n_planes)}),
lshmp_k AS ({ann_lsh_topk_sql(query_id, k, 4, multiprobe=1)}),
ivf_k AS ({ann_ivf_topk_sql(query_id, k, 16, 4)}),
fexact_perm AS ({cosine_topk_sql(query_id, k, permissive)}),
fexact_sel AS ({cosine_topk_sql(query_id, k, selective)}),
ivff_k AS ({ann_filtered_topk_sql(permissive, query_id, k, 16, 4)}),
filtx_k AS ({ann_filtered_topk_sql(selective, query_id, k, 16, 4)})
SELECT 'lsh' AS method,
  CAST(ROUND((SELECT count(*) FROM exact_k JOIN lsh_k USING (vec_id)) * 1000000.0 / {k}) AS BIGINT) AS recall_x1e6
UNION ALL
SELECT 'lsh_mp' AS method,
  CAST(ROUND((SELECT count(*) FROM exact_k JOIN lshmp_k USING (vec_id)) * 1000000.0 / {k}) AS BIGINT) AS recall_x1e6
UNION ALL
SELECT 'ivf' AS method,
  CAST(ROUND((SELECT count(*) FROM exact_k JOIN ivf_k USING (vec_id)) * 1000000.0 / {k}) AS BIGINT) AS recall_x1e6
UNION ALL
SELECT 'ivf_filt' AS method,
  CAST(ROUND((SELECT count(*) FROM fexact_perm JOIN ivff_k USING (vec_id)) * 1000000.0 / {k}) AS BIGINT) AS recall_x1e6
UNION ALL
SELECT 'filt_exact' AS method,
  CAST(ROUND((SELECT count(*) FROM fexact_sel JOIN filtx_k USING (vec_id)) * 1000000.0 / {k}) AS BIGINT) AS recall_x1e6
UNION ALL
SELECT 'sq8' AS method,
  CAST(ROUND((SELECT count(*) FROM exact_k JOIN sq8_k USING (vec_id)) * 1000000.0 / {k}) AS BIGINT) AS recall_x1e6"""


def ann_lsh_topk_sql(
    query_id: int = 0, k: int = 10, n_planes: int = 8, multiprobe: int = 0
) -> str:
    probe_cond = "b.bucket = qb.bucket"
    if multiprobe >= 1:
        probe_cond += "".join(
            f" OR b.bucket = xor(qb.bucket, {1 << i})" for i in range(n_planes)
        )
    return f"""WITH {_COMP_SQL},
planes AS (
  SELECT p, pos,
    CAST((CAST(('0x'||substr(md5(CAST(p AS VARCHAR)||'_'||CAST(pos AS VARCHAR)),1,8))
      AS BIGINT) % {_PLANE_MOD}) - {_PLANE_OFF} AS DOUBLE) AS w
  FROM (SELECT unnest(generate_series(0, {n_planes - 1})) AS p),
       (SELECT unnest(generate_series(0,
          (SELECT len(embedding) FROM embeddings LIMIT 1) - 1)) AS pos)
),
pdots AS (
  SELECT c.vec_id, pl.p, SUM(c.v * pl.w) AS dot
  FROM comp c JOIN planes pl USING (pos)
  GROUP BY c.vec_id, pl.p
),
buckets AS (
  SELECT vec_id,
    CAST(SUM(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS BIGINT) AS bucket
  FROM pdots GROUP BY vec_id
),
qb AS (SELECT bucket FROM buckets WHERE vec_id = {query_id}),
cand AS (
  SELECT b.vec_id FROM buckets b JOIN qb ON ({probe_cond})
  WHERE b.vec_id <> {query_id}
),
qc AS (SELECT pos, v FROM comp WHERE vec_id = {query_id}),
nq AS (SELECT sqrt(SUM(v*v)) AS nq FROM qc),
dots AS (
  SELECT c.vec_id, SUM(c.v * q.v) AS dot, sqrt(SUM(c.v * c.v)) AS na
  FROM comp c JOIN qc q USING (pos) JOIN cand ON c.vec_id = cand.vec_id
  GROUP BY c.vec_id
)
SELECT d.vec_id, CAST(ROUND(d.dot/(d.na*nq.nq)*1000000) AS BIGINT) AS cos_x1e6
FROM dots d CROSS JOIN nq
ORDER BY cos_x1e6 DESC, d.vec_id ASC LIMIT {k}"""


def vector_similarity_all(
    emb: DataFrame,
    query_id: int = 0,
    result_similarity: float = 0.7,
    filter_expr: str | None = None,
) -> DataFrame:
    """FloatVectorSimilarityQuery exact path
    (core/search/FloatVectorSimilarityQuery.java +
    AbstractVectorSimilarityQuery.java): EVERY vector whose
    lucene-normalized cosine similarity ((1 + cos) / 2,
    VectorSimilarityFunction.COSINE.compare) reaches
    ``result_similarity`` — a threshold query, not a top-k.  The
    membership test runs on the ROUNDED x1e6 similarity so the oracle
    and the engine agree bit-for-bit at the boundary.  One codegen
    filter over a narrow scan — at 100 TB this is an embarrassingly
    parallel map with the filter inside WholeStageCodegen; no shuffle
    at all (the orderBy exists only for the deterministic gate hash).
    -> (vec_id, sim_x1e6)."""
    qv = _query_vec(emb, query_id)
    sim = (cosine_lit_col("embedding", qv) + F.lit(1.0)) / F.lit(2.0)
    out = emb.filter(F.col("vec_id") != query_id)
    if filter_expr:
        out = out.filter(F.expr(filter_expr))
    thr = int(round(float(result_similarity) * 1e6))
    return (
        out.select(
            "vec_id", F.round(sim * 1e6).cast("long").alias("sim_x1e6")
        )
        .filter(F.col("sim_x1e6") >= F.lit(thr))
        .orderBy("vec_id")
    )


def vector_similarity_all_sql(
    query_id: int = 0,
    result_similarity: float = 0.7,
    filter_expr: str | None = None,
) -> str:
    """DuckDB twin of vector_similarity_all."""
    thr = int(round(float(result_similarity) * 1e6))
    fpred = (
        f" AND c.vec_id IN (SELECT vec_id FROM embeddings WHERE ({filter_expr}))"
        if filter_expr
        else ""
    )
    return f"""WITH {_COMP_SQL},
qc AS (SELECT pos, v FROM comp WHERE vec_id = {query_id}),
nq AS (SELECT sqrt(SUM(v*v)) AS nq FROM qc),
dots AS (
  SELECT c.vec_id, SUM(c.v * q.v) AS dot, sqrt(SUM(c.v * c.v)) AS na
  FROM comp c JOIN qc q USING (pos)
  WHERE c.vec_id <> {query_id}{fpred}
  GROUP BY c.vec_id
)
SELECT vec_id, sim_x1e6 FROM (
  SELECT d.vec_id,
         CAST(ROUND((d.dot/(d.na*nq.nq) + 1)/2*1000000) AS BIGINT) AS sim_x1e6
  FROM dots d CROSS JOIN nq
) WHERE sim_x1e6 >= {thr} ORDER BY vec_id"""
