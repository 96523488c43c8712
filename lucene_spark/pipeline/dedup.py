"""Deduplication operators — the curation core of a 100 TB text pipeline.

Five dedup families, each JVM-side with a paired DuckDB oracle:

- exact:            md5(text) groupBy, canonical = min doc_id
- n-gram Jaccard:   word-shingle inverted join -> exact Jaccard >= t
- MinHash + LSH:    H hash-min signatures -> B band buckets -> candidate
                    join -> exact-Jaccard verification (the standard
                    shingle->minhash->band->bucket-join pipeline)
- SimHash:          tf-weighted 32-bit sign-hash; banded byte buckets
                    (pigeonhole: hamming<=3 pairs share one of 4 bytes)
                    -> hamming verification
- embedding cosine: near-dup pairs over ``embeddings`` (see
                    similarity.py for the top-k search variants)

Scale notes (100 TB): every candidate-generation step is a shuffle on a
*bucket key* (shingle hash, band key, simhash byte), never an O(n^2)
cross join; hot buckets (boilerplate shingles) are the skew risk — the
shingle join drops shingles with document-frequency above
``max_shingle_df`` (boilerplate carries no dedup signal but creates
quadratic candidate blowup; same rationale as Lucene's hot-term salting,
SURVEY.md §4.2). Hashes are md5-derived 32-bit ints so the identical
integers are computable in ANSI SQL on any engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from lucene_spark.pipeline.textstats import TOKEN_RX

# ---------------------------------------------------------------------------
# shared helpers (Spark side)
# ---------------------------------------------------------------------------


def _hexint(c: Column) -> Column:
    """First 32 bits of md5 as a non-negative bigint — identical in
    DuckDB as CAST('0x'||substr(md5(x),1,8) AS BIGINT)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def _toks_sql_expr() -> str:
    return (
        "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), t -> t <> '')"
    )


def _shingles(docs: DataFrame, n: int) -> DataFrame:
    """-> (doc_id, sh): distinct word n-gram strings per doc."""
    toks = F.filter(F.split(F.lower(F.col("text")), TOKEN_RX), lambda t: t != "")
    sh = F.when(
        F.size(toks) >= n,
        F.expr(
            f"transform(sequence(1, size(_toks) - {n} + 1), "
            f"i -> array_join(slice(_toks, i, {n}), ' '))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        docs.withColumn("_toks", toks)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("sh"))
    )


def _shingles_sql(n: int) -> str:
    """CTE `shingles(doc_id, sh)` — must mirror _shingles exactly."""
    return f"""tl AS (SELECT doc_id, {_toks_sql_expr()} AS toks FROM documents),
shingles AS (
  SELECT DISTINCT doc_id, sh FROM (
    SELECT doc_id, unnest(CASE WHEN len(toks) >= {n}
      THEN list_transform(generate_series(1, len(toks) - {n} + 1),
                          i -> array_to_string(list_slice(toks, i, i + {n} - 1), ' '))
      ELSE [] END) AS sh
    FROM tl)
)"""


def _jaccard_pairs(
    cand: DataFrame, shingles: DataFrame, threshold: float
) -> DataFrame:
    """Verify candidate (a, b) pairs with exact Jaccard over shingle sets.
    cand: (a, b) distinct, a < b. -> (a, b, jaccard_x1e6).

    Shape: ONE groupBy builds a per-doc shingle-set table, then two
    equi-joins attach each side's set to the pair and the intersection
    is a JVM `array_intersect` per row — three shuffles total, vs the
    naive explode-join-regroup (join shingles on a, join shingles on
    (b, shingle), regroup) which shuffles the full shingle table twice
    per verify. Candidate counts are bounded (bucket caps upstream), so
    the per-pair arrays are the verify's natural unit of work."""
    doc_sets = shingles.groupBy("doc_id").agg(
        F.collect_set("sh").alias("s"), F.count("*").alias("sz")
    )
    out = (
        cand.join(
            doc_sets.select(
                F.col("doc_id").alias("a"),
                F.col("s").alias("sa"),
                F.col("sz").alias("sza"),
            ),
            "a",
        )
        .join(
            doc_sets.select(
                F.col("doc_id").alias("b"),
                F.col("s").alias("sb"),
                F.col("sz").alias("szb"),
            ),
            "b",
        )
        .withColumn("inter", F.size(F.array_intersect("sa", "sb")))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out.select(
        "a",
        "b",
        F.round(F.col("jaccard") * 1e6).cast("long").alias("jaccard_x1e6"),
    ).orderBy("a", "b")


# ---------------------------------------------------------------------------
# 1. exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(docs: DataFrame, k: int = 200) -> DataFrame:
    """Exact dedup by content hash: canonical row = min doc_id per group.

    -> (doc_id, content_hash, group_size, is_canonical)

    Scale: one shuffle on the 128-bit hash (uniform by construction, no
    skew); group state is two longs — holds at any corpus size.
    """
    hashed = docs.select("doc_id", F.md5(F.col("text")).alias("content_hash"))
    groups = hashed.groupBy("content_hash").agg(
        F.count("*").alias("group_size"), F.min("doc_id").alias("canon_id")
    )
    return (
        hashed.join(groups, "content_hash")
        .select(
            "doc_id",
            "content_hash",
            "group_size",
            (F.col("doc_id") == F.col("canon_id")).alias("is_canonical"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def exact_dedup_sql(k: int = 200) -> str:
    return f"""WITH hashed AS (SELECT doc_id, md5(text) AS content_hash FROM documents),
groups AS (
  SELECT content_hash, count(*) AS group_size, min(doc_id) AS canon_id
  FROM hashed GROUP BY content_hash
)
SELECT h.doc_id, h.content_hash, g.group_size,
       h.doc_id = g.canon_id AS is_canonical
FROM hashed h JOIN groups g USING (content_hash)
ORDER BY h.doc_id LIMIT {k}"""


# ---------------------------------------------------------------------------
# 2. n-gram Jaccard dedup
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    max_shingle_df: int = 1000,
    k: int = 200,
) -> DataFrame:
    """Near-dup pairs by exact n-gram-shingle Jaccard similarity.

    Candidates come from the shingle inverted join (docs sharing >= 1
    shingle); shingles with df > max_shingle_df are dropped before the
    join (boilerplate skew guard). -> (a, b, jaccard_x1e6).
    """
    # shingles feed the df-filter, both sides of the inverted self-join,
    # and three arms of the Jaccard verify — materialize once (see the
    # minhash note below)
    sh = _shingles(docs, n).persist()
    rare = (
        sh.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_shingle_df)
        .select("sh")
    )
    sh_j = sh.join(rare, "sh", "left_semi")
    cand = (
        sh_j.alias("x")
        .join(sh_j.alias("y"), "sh")
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    return _jaccard_pairs(cand, sh, threshold).limit(k)


def ngram_jaccard_sql(
    n: int = 3, threshold: float = 0.2, max_shingle_df: int = 1000, k: int = 200
) -> str:
    return f"""WITH {_shingles_sql(n)},
rare AS (SELECT sh FROM shingles GROUP BY sh HAVING count(*) <= {max_shingle_df}),
shj AS (SELECT s.doc_id, s.sh FROM shingles s JOIN rare USING (sh)),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM shj x JOIN shj y ON x.sh = y.sh AND x.doc_id < y.doc_id
),
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.a
  JOIN shingles sb ON sb.doc_id = c.b AND sb.sh = sa.sh
  GROUP BY c.a, c.b
)
SELECT i.a, i.b,
  CAST(ROUND(i.inter::DOUBLE / (za.sz + zb.sz - i.inter) * 1000000) AS BIGINT)
    AS jaccard_x1e6
FROM inter i
JOIN sizes za ON za.doc_id = i.a
JOIN sizes zb ON zb.doc_id = i.b
WHERE i.inter::DOUBLE / (za.sz + zb.sz - i.inter) >= {threshold}
ORDER BY i.a, i.b LIMIT {k}"""


# ---------------------------------------------------------------------------
# 3. MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
    k: int = 200,
    max_bucket_size: int = 64,
) -> DataFrame:
    """MinHash-LSH near-dup pairs: H min-hash signatures per doc, banded
    into B buckets; docs sharing a band bucket are candidates, verified
    with exact shingle Jaccard >= threshold.

    -> (a, b, jaccard_x1e6)

    Scale: the signature build is ONE groupBy(doc_id) with H min()
    aggregates (map-side combined); the bucket join shuffles on
    (band, band_key) — uniform md5 buckets, no skew. Candidate count is
    controlled by B/H (the standard S-curve), not corpus size.

    ``max_bucket_size`` caps bucket OCCUPANCY (the boilerplate-bomb
    guard): a (band, key) bucket with m > cap members would emit m^2
    all-pairs candidates into one reducer — such members are
    near-identical by construction, so over-cap buckets switch to a
    hub-star expansion (every member pairs with the bucket's min doc_id
    only): O(m) candidates, dup CLUSTERS still surface via the hub, and
    the exact-Jaccard verification is unchanged. Mirrored exactly in
    the SQL oracle.
    """
    rows = num_hashes // bands
    # materialize the shingle table once: it feeds the signature build
    # AND three arms of the exact-Jaccard verify — without this the
    # tokenize->shingle explode recomputes per arm (measured 6-7 full
    # scans at sf0.1; at 100 TB this is THE standard pipeline
    # materialization, disk-backed and evicted LRU)
    sh = _shingles(docs, n).persist()
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(_hexint(F.concat(F.lit(f"{i}|"), F.col("sh")))).alias(f"h{i}")
            for i in range(num_hashes)
        ]
    )
    # one pass over sig: all B band keys computed in the same projection
    # and posexploded (a B-way union would re-run the H-min-agg signature
    # lineage B times; measured ~4x more scan work at B=4)
    band_keys = [
        F.md5(
            F.concat_ws(
                "_",
                *[
                    F.col(f"h{i}").cast("string")
                    for i in range(b * rows, (b + 1) * rows)
                ],
            )
        )
        for b in range(bands)
    ]
    # materialize the banded signature table: the bucket window, both
    # self-join probe sides, and the hub-star arm all read it (the
    # signature table is computed once per corpus in any production
    # MinHash pipeline; Spark otherwise re-runs the 16-min-agg per arm)
    banded = sig.select(
        "doc_id",
        F.posexplode(F.array(*band_keys)).alias("band", "band_key"),
    ).persist()
    # bucket stats via ONE window over (band, key): a single shuffle of
    # the banded rows, computed in the same pass that feeds the join
    # probes. (An aggregate+join would re-run the 16-min-agg signature
    # lineage twice — measured 40% slower end-to-end.)
    from pyspark.sql.window import Window

    w = Window.partitionBy("band", "band_key")
    banded = banded.withColumn("_bsz", F.count("*").over(w)).withColumn(
        "_hub", F.min("doc_id").over(w)
    )
    small = banded.filter(F.col("_bsz") <= max_bucket_size)
    cand_small = (
        small.alias("x")
        .join(small.alias("y"), ["band", "band_key"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
    )
    cand_big = (
        banded.filter(
            (F.col("_bsz") > max_bucket_size) & (F.col("doc_id") > F.col("_hub"))
        )
        .select(F.col("_hub").alias("a"), F.col("doc_id").alias("b"))
    )
    cand = cand_small.unionByName(cand_big).distinct()
    return _jaccard_pairs(cand, sh, threshold).limit(k)


def minhash_lsh_sql(
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
    k: int = 200,
    max_bucket_size: int = 64,
) -> str:
    rows = num_hashes // bands
    mins = ",\n    ".join(
        f"min(CAST(('0x'||substr(md5('{i}|'||sh),1,8)) AS BIGINT)) AS h{i}"
        for i in range(num_hashes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS band_key FROM sig".format(
            b=b,
            key="||'_'||".join(
                f"CAST(h{i} AS VARCHAR)" for i in range(b * rows, (b + 1) * rows)
            ),
        )
        for b in range(bands)
    )
    return f"""WITH {_shingles_sql(n)},
sig AS (
  SELECT doc_id,
    {mins}
  FROM shingles GROUP BY doc_id
),
banded0 AS ({band_selects}),
banded AS (
  SELECT *, count(*) OVER (PARTITION BY band, band_key) AS bsz,
         min(doc_id) OVER (PARTITION BY band, band_key) AS hub
  FROM banded0
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id
   AND x.bsz <= {max_bucket_size} AND y.bsz <= {max_bucket_size}
  UNION
  SELECT DISTINCT hub AS a, doc_id AS b FROM banded
  WHERE bsz > {max_bucket_size} AND doc_id > hub
),
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.a
  JOIN shingles sb ON sb.doc_id = c.b AND sb.sh = sa.sh
  GROUP BY c.a, c.b
)
SELECT i.a, i.b,
  CAST(ROUND(i.inter::DOUBLE / (za.sz + zb.sz - i.inter) * 1000000) AS BIGINT)
    AS jaccard_x1e6
FROM inter i
JOIN sizes za ON za.doc_id = i.a
JOIN sizes zb ON zb.doc_id = i.b
WHERE i.inter::DOUBLE / (za.sz + zb.sz - i.inter) >= {threshold}
ORDER BY i.a, i.b LIMIT {k}"""


def incremental_minhash_pairs(
    new_docs: DataFrame,
    corpus: DataFrame,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
    k: int = 200,
) -> DataFrame:
    """Incremental dedup: near-dup pairs between an INCOMING batch and
    an EXISTING corpus (the batch-vs-training-set admission check every
    continuously-fed pipeline runs; doc_ids must be disjoint across the
    two frames). -> (a = new doc_id, b = corpus doc_id, jaccard_x1e6).

    Scale shape: the corpus side's banded-signature table is the
    precomputable artifact — at 100 TB it is built once, persisted
    partitioned by (band, band_key), and each incoming batch only
    signatures ITSELF and equi-joins into those buckets: cost
    proportional to the batch, never the corpus. The join is new X
    corpus (no self-join, no a<b filter); a batch doc with any verified
    match >= threshold is a reject."""
    sh_new = _shingles(new_docs, n).persist()
    sh_old = _shingles(corpus, n).persist()

    def _banded(sh):
        rows = num_hashes // bands
        sig = sh.groupBy("doc_id").agg(
            *[
                F.min(
                    _hexint(F.concat(F.lit(f"{i}|"), F.col("sh")))
                ).alias(f"h{i}")
                for i in range(num_hashes)
            ]
        )
        keys = [
            F.md5(
                F.concat_ws(
                    "_",
                    *[
                        F.col(f"h{i}").cast("string")
                        for i in range(b * rows, (b + 1) * rows)
                    ],
                )
            )
            for b in range(bands)
        ]
        return sig.select(
            "doc_id", F.posexplode(F.array(*keys)).alias("band", "band_key")
        )

    cand = (
        _banded(sh_new).alias("x")
        .join(_banded(sh_old).alias("y"), ["band", "band_key"])
        .select(F.col("x.doc_id").alias("a"), F.col("y.doc_id").alias("b"))
        .distinct()
    )
    return _jaccard_pairs(
        cand, sh_new.unionByName(sh_old), threshold
    ).limit(k)


def incremental_minhash_sql(
    new_pred: str,
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.2,
    k: int = 200,
) -> str:
    """Oracle twin of incremental_minhash_pairs with the batch defined
    as `documents WHERE new_pred` and the corpus as its complement."""
    rows = num_hashes // bands
    mins = ",\n    ".join(
        f"min(CAST(('0x'||substr(md5('{i}|'||sh),1,8)) AS BIGINT)) AS h{i}"
        for i in range(num_hashes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {b} AS band, md5({key}) AS band_key FROM sig".format(
            b=b,
            key="||'_'||".join(
                f"CAST(h{i} AS VARCHAR)" for i in range(b * rows, (b + 1) * rows)
            ),
        )
        for b in range(bands)
    )
    return f"""WITH {_shingles_sql(n)},
sig AS (
  SELECT doc_id,
    {mins}
  FROM shingles GROUP BY doc_id
),
banded AS ({band_selects}),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.band_key = y.band_key
  WHERE x.doc_id IN (SELECT doc_id FROM documents WHERE {new_pred})
    AND y.doc_id NOT IN (SELECT doc_id FROM documents WHERE {new_pred})
),
sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS inter
  FROM cand c
  JOIN shingles sa ON sa.doc_id = c.a
  JOIN shingles sb ON sb.doc_id = c.b AND sb.sh = sa.sh
  GROUP BY c.a, c.b
)
SELECT i.a, i.b,
  CAST(ROUND(i.inter::DOUBLE / (za.sz + zb.sz - i.inter) * 1000000) AS BIGINT)
    AS jaccard_x1e6
FROM inter i
JOIN sizes za ON za.doc_id = i.a
JOIN sizes zb ON zb.doc_id = i.b
WHERE i.inter::DOUBLE / (za.sz + zb.sz - i.inter) >= {threshold}
ORDER BY i.a, i.b LIMIT {k}"""


# ---------------------------------------------------------------------------
# 4. SimHash
# ---------------------------------------------------------------------------

SIMHASH_BITS = 32
SIMHASH_BANDS = 4  # 8-bit bytes; hamming<=3 pairs must share >=1 byte


def simhash(docs: DataFrame) -> DataFrame:
    """tf-weighted 32-bit SimHash per doc. -> (doc_id, simhash)."""
    toks = F.filter(F.split(F.lower(F.col("text")), TOKEN_RX), lambda t: t != "")
    tf = (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
        .withColumn("h", _hexint(F.col("tok")))
    )
    bit_sums = tf.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.expr(f"(h >> {j}) & 1") == 1, F.col("tf")
                ).otherwise(-F.col("tf"))
            ).alias(f"s{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sim = None
    for j in range(SIMHASH_BITS):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sim = term if sim is None else sim + term
    return bit_sums.select("doc_id", sim.cast("long").alias("simhash"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    k: int = 200,
    max_bucket_size: int = 64,
) -> DataFrame:
    """Near-dup pairs with simhash hamming distance <= max_hamming,
    candidates from banded byte buckets (any pair within hamming 3 of a
    32-bit hash agrees on at least one of its 4 bytes — pigeonhole).

    -> (a, b, hamming)

    ``max_bucket_size``: occupancy cap per (band, byte) bucket — same
    boilerplate-bomb guard as minhash_lsh_pairs; over-cap buckets use a
    hub-star expansion (O(m) candidates), mirrored in the SQL oracle.
    """
    sh = simhash(docs)
    # one pass over the simhash table: all 4 band bytes posexploded, and
    # the banded table materialized once — the bucket window, both
    # self-join probe sides, and the hub-star arm all read it (a 4-way
    # union re-ran the tf-weighted bit-sum aggregate per arm)
    banded = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.expr(f"(simhash >> {8 * b}) & 255")
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band", "bval"),
    ).persist()
    from pyspark.sql.window import Window

    w = Window.partitionBy("band", "bval")
    wo = w.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    banded = (
        banded.withColumn("_bsz", F.count("*").over(w))
        .withColumn("_hub", F.min("doc_id").over(w))
        .withColumn("_hub_sim", F.first("simhash").over(wo))
    )
    small = banded.filter(F.col("_bsz") <= max_bucket_size)
    cand_small = (
        small.alias("x")
        .join(small.alias("y"), ["band", "bval"])
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("a"),
            F.col("y.doc_id").alias("b"),
            F.col("x.simhash").alias("ha"),
            F.col("y.simhash").alias("hb"),
        )
    )
    cand_big = (
        banded.filter(
            (F.col("_bsz") > max_bucket_size) & (F.col("doc_id") > F.col("_hub"))
        )
        .select(
            F.col("_hub").alias("a"),
            F.col("doc_id").alias("b"),
            F.col("_hub_sim").alias("ha"),
            F.col("simhash").alias("hb"),
        )
    )
    cand = cand_small.unionByName(cand_big).distinct()
    return (
        cand.withColumn("hamming", F.expr("bit_count(ha ^ hb)"))
        .filter(F.col("hamming") <= max_hamming)
        .select("a", "b", "hamming")
        .orderBy("a", "b")
        .limit(k)
    )


def simhash_pairs_sql(
    max_hamming: int = 3, k: int = 200, max_bucket_size: int = 64
) -> str:
    bit_sums = ",\n    ".join(
        f"SUM(CASE WHEN (h >> {j}) & 1 = 1 THEN tf ELSE -tf END) AS s{j}"
        for j in range(SIMHASH_BITS)
    )
    sim_expr = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(SIMHASH_BITS)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band, (simhash >> {8 * b}) & 255 AS bval FROM sh"
        for b in range(SIMHASH_BANDS)
    )
    return f"""WITH toks AS (SELECT doc_id, tok FROM (SELECT doc_id,
    unnest({_toks_sql_expr()}) AS tok FROM documents) WHERE tok <> ''),
tf AS (
  SELECT doc_id, tok, count(*) AS tf,
         CAST(('0x'||substr(md5(tok),1,8)) AS BIGINT) AS h
  FROM toks GROUP BY doc_id, tok
),
bits AS (
  SELECT doc_id,
    {bit_sums}
  FROM tf GROUP BY doc_id
),
sh AS (SELECT doc_id, CAST({sim_expr} AS BIGINT) AS simhash FROM bits),
banded0 AS ({band_selects}),
banded AS (
  SELECT *, count(*) OVER (PARTITION BY band, bval) AS bsz,
         min(doc_id) OVER (PARTITION BY band, bval) AS hub,
         first_value(simhash) OVER (
           PARTITION BY band, bval ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
         ) AS hub_sim
  FROM banded0
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b,
         x.simhash AS ha, y.simhash AS hb
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bval = y.bval AND x.doc_id < y.doc_id
   AND x.bsz <= {max_bucket_size} AND y.bsz <= {max_bucket_size}
  UNION
  SELECT DISTINCT hub AS a, doc_id AS b, hub_sim AS ha, simhash AS hb
  FROM banded WHERE bsz > {max_bucket_size} AND doc_id > hub
)
SELECT a, b, bit_count(xor(ha, hb)) AS hamming
FROM cand WHERE bit_count(xor(ha, hb)) <= {max_hamming}
ORDER BY a, b LIMIT {k}"""


# ---------------------------------------------------------------------------
# 5. embedding-cosine near-dup (pairs; top-k search lives in similarity.py)
# ---------------------------------------------------------------------------


def embedding_near_dups(
    emb: DataFrame, threshold: float = 0.9, k: int = 200
) -> DataFrame:
    """Pairs of embedding rows with cosine similarity >= threshold.

    -> (a, b, cos_x1e6)

    This exact variant joins on vector-component position (one shuffle
    keyed (pos), then groupBy pair) — correct but O(n^2 d) at the
    candidate step; at 100 TB use the LSH-bucketed variant
    (similarity.lsh_buckets) to restrict candidate pairs first.
    """
    comp = emb.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    )
    norms = comp.groupBy("vec_id").agg(F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm"))
    a = comp.select(F.col("vec_id").alias("a"), "pos", F.col("v").alias("va"))
    b = comp.select(F.col("vec_id").alias("b"), "pos", F.col("v").alias("vb"))
    dots = (
        a.join(b, "pos")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    na = norms.select(F.col("vec_id").alias("a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("vec_id").alias("b"), F.col("nrm").alias("nb"))
    out = (
        dots.join(na, "a")
        .join(nb, "b")
        .withColumn("cos", F.col("dot") / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
    )
    return (
        out.select("a", "b", F.round(F.col("cos") * 1e6).cast("long").alias("cos_x1e6"))
        .orderBy("a", "b")
        .limit(k)
    )


def embedding_near_dups_lsh(
    emb: DataFrame,
    threshold: float = 0.9,
    n_planes: int = 4,
    n_tables: int = 6,
    k: int = 200,
) -> DataFrame:
    """Scale-path embedding near-dup: multi-table random-hyperplane LSH
    candidates -> exact cosine verification. Same output contract as
    embedding_near_dups (a, b, cos_x1e6 with cos >= threshold), but
    candidate generation is a bucket equi-join on (table, bucket) —
    pairs per reducer bounded by bucket occupancy, never all-pairs.
    Deterministic md5-integer planes, so the identical candidate set is
    computable in the SQL oracle (both engines agree exactly; recall of
    the table bank is evidenced separately by q_ann_recall)."""
    from lucene_spark.pipeline.similarity import lsh_table_buckets

    buckets = lsh_table_buckets(emb, n_planes, n_tables)
    cand = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.t") == F.col("y.t"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.vec_id") < F.col("y.vec_id")),
        )
        .select(F.col("x.vec_id").alias("a"), F.col("y.vec_id").alias("b"))
        .distinct()
    )
    comp = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    )
    norms = comp.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )
    ca = comp.select(F.col("vec_id").alias("a"), "pos", F.col("v").alias("va"))
    cb = comp.select(F.col("vec_id").alias("b"), "pos", F.col("v").alias("vb"))
    dots = (
        cand.join(ca, "a")
        .join(cb, ["b", "pos"])
        .groupBy("a", "b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    na = norms.select(F.col("vec_id").alias("a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("vec_id").alias("b"), F.col("nrm").alias("nb"))
    out = (
        dots.join(na, "a")
        .join(nb, "b")
        .withColumn("cos", F.col("dot") / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
    )
    return (
        out.select(
            "a", "b", F.round(F.col("cos") * 1e6).cast("long").alias("cos_x1e6")
        )
        .orderBy("a", "b")
        .limit(k)
    )


def embedding_near_dups_lsh_sql(
    threshold: float = 0.9,
    n_planes: int = 4,
    n_tables: int = 6,
    k: int = 200,
) -> str:
    from lucene_spark.pipeline.similarity import _PLANE_MOD, _PLANE_OFF

    total = n_planes * n_tables
    return f"""WITH comp AS (
  SELECT vec_id, unnest(generate_series(1, len(embedding))) - 1 AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings
),
planes AS (
  SELECT p, pos,
    CAST((CAST(('0x'||substr(md5(CAST(p AS VARCHAR)||'_'||CAST(pos AS VARCHAR)),1,8))
      AS BIGINT) % {_PLANE_MOD}) - {_PLANE_OFF} AS DOUBLE) AS w
  FROM (SELECT unnest(generate_series(0, {total - 1})) AS p),
       (SELECT unnest(generate_series(0,
          (SELECT len(embedding) FROM embeddings LIMIT 1) - 1)) AS pos)
),
pdots AS (
  SELECT c.vec_id, pl.p, SUM(c.v * pl.w) AS dot
  FROM comp c JOIN planes pl USING (pos)
  GROUP BY c.vec_id, pl.p
),
buckets AS (
  SELECT vec_id, CAST(p // {n_planes} AS INT) AS t,
    CAST(SUM(CASE WHEN dot > 0 THEN 1 << (p % {n_planes}) ELSE 0 END) AS BIGINT) AS bucket
  FROM pdots GROUP BY vec_id, t
),
cand AS (
  SELECT DISTINCT x.vec_id AS a, y.vec_id AS b
  FROM buckets x JOIN buckets y
    ON x.t = y.t AND x.bucket = y.bucket AND x.vec_id < y.vec_id
),
norms AS (SELECT vec_id, sqrt(SUM(v*v)) AS nrm FROM comp GROUP BY vec_id),
dots AS (
  SELECT cd.a, cd.b, SUM(x.v * y.v) AS dot
  FROM cand cd JOIN comp x ON x.vec_id = cd.a
       JOIN comp y ON y.vec_id = cd.b AND y.pos = x.pos
  GROUP BY cd.a, cd.b
)
SELECT d.a, d.b, CAST(ROUND(d.dot/(na.nrm*nb.nrm)*1000000) AS BIGINT) AS cos_x1e6
FROM dots d JOIN norms na ON na.vec_id = d.a JOIN norms nb ON nb.vec_id = d.b
WHERE d.dot/(na.nrm*nb.nrm) >= {threshold}
ORDER BY d.a, d.b LIMIT {k}"""


def embedding_near_dups_sql(threshold: float = 0.9, k: int = 200) -> str:
    return f"""WITH comp AS (
  SELECT vec_id, unnest(generate_series(1, len(embedding))) - 1 AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings
),
norms AS (SELECT vec_id, sqrt(SUM(v*v)) AS nrm FROM comp GROUP BY vec_id),
dots AS (
  SELECT x.vec_id AS a, y.vec_id AS b, SUM(x.v * y.v) AS dot
  FROM comp x JOIN comp y ON x.pos = y.pos AND x.vec_id < y.vec_id
  GROUP BY x.vec_id, y.vec_id
)
SELECT d.a, d.b, CAST(ROUND(d.dot/(na.nrm*nb.nrm)*1000000) AS BIGINT) AS cos_x1e6
FROM dots d JOIN norms na ON na.vec_id = d.a JOIN norms nb ON nb.vec_id = d.b
WHERE d.dot/(na.nrm*nb.nrm) >= {threshold}
ORDER BY d.a, d.b LIMIT {k}"""


def semantic_dedup(
    emb: DataFrame,
    n_centroids: int = 16,
    threshold: float = 0.7,
    k: int = 200,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the
    embeddings with the deterministic coarse quantizer, compare pairs
    ONLY within a cluster (the paper's trick that bounds the quadratic
    term — sizing n_centroids ~ n/target keeps per-cluster occupancy
    constant, so total work is O(n·c) not O(n^2)), and drop every
    vector whose cosine to an earlier (lower-id) cluster-mate reaches
    ``threshold`` (the paper keeps one exemplar per semantic-dup set;
    keep-lowest-id is this engine's deterministic exemplar rule, the
    same rule exact dedup uses). -> (a, b, cos_x1e6): b is dropped,
    a is its smallest qualifying keeper, ordered (a, b).

    Scale shape: one broadcast centroid assign, one (cid)-equi-join for
    candidates (pairs bounded by cluster occupancy), component-exploded
    codegen cosine on candidates only, one min-struct aggregation."""
    from lucene_spark.pipeline.similarity import ivf_assign, ivf_centroids

    dims = len(emb.select("embedding").head()["embedding"])
    assign = ivf_assign(emb, ivf_centroids(emb, n_centroids), dims)
    pa = assign.select(F.col("vec_id").alias("a"), "cid")
    pb = assign.select(F.col("vec_id").alias("b"), "cid")
    cand = (
        pa.join(pb, "cid")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
    )
    comp = emb.select(
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v"),
    )
    norms = comp.groupBy("vec_id").agg(
        F.sqrt(F.sum(F.col("v") * F.col("v"))).alias("nrm")
    )
    ca = comp.select(F.col("vec_id").alias("a"), "pos", F.col("v").alias("va"))
    cb = comp.select(F.col("vec_id").alias("b"), "pos", F.col("v").alias("vb"))
    dots = (
        cand.join(ca, "a")
        .join(cb, ["b", "pos"])
        .groupBy("a", "b")
        .agg(F.sum(F.col("va") * F.col("vb")).alias("dot"))
    )
    pairs = (
        dots.join(norms.select(F.col("vec_id").alias("a"),
                               F.col("nrm").alias("na")), "a")
        .join(norms.select(F.col("vec_id").alias("b"),
                           F.col("nrm").alias("nb")), "b")
        .withColumn("cos", F.col("dot") / (F.col("na") * F.col("nb")))
        .filter(F.col("cos") >= threshold)
        .select(
            "a", "b",
            F.round(F.col("cos") * 1e6).cast("long").alias("cos_x1e6"),
        )
    )
    # exemplar per dropped vector: the SMALLEST qualifying keeper
    return (
        pairs.groupBy("b")
        .agg(F.min(F.struct("a", "cos_x1e6")).alias("m"))
        .select(F.col("m.a").alias("a"), "b", F.col("m.cos_x1e6")
                .alias("cos_x1e6"))
        .orderBy("a", "b")
        .limit(k)
    )


def semantic_dedup_sql(
    n_centroids: int = 16, threshold: float = 0.7, k: int = 200
) -> str:
    """DuckDB twin: same seeded centroids, same argmax assignment, same
    within-cluster pairwise + keep-lowest exemplar."""
    return f"""WITH comp AS (
  SELECT vec_id, unnest(generate_series(1, len(embedding))) - 1 AS pos,
         unnest(CAST(embedding AS DOUBLE[])) AS v
  FROM embeddings
),
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
cand AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM assign x JOIN assign y
    ON x.cid = y.cid AND x.vec_id < y.vec_id
),
dots AS (
  SELECT c.a, c.b, SUM(x.v * y.v) AS dot
  FROM cand c JOIN comp x ON x.vec_id = c.a
       JOIN comp y ON y.vec_id = c.b AND y.pos = x.pos
  GROUP BY c.a, c.b
),
pairs AS (
  SELECT d.a, d.b,
    CAST(ROUND(d.dot/(na.nrm*nb.nrm)*1000000) AS BIGINT) AS cos_x1e6
  FROM dots d JOIN norms na ON na.vec_id = d.a
       JOIN norms nb ON nb.vec_id = d.b
  WHERE d.dot/(na.nrm*nb.nrm) >= {threshold}
),
rep AS (
  SELECT b, MIN(struct_pack(a := a, c := cos_x1e6)) AS m
  FROM pairs GROUP BY b
)
SELECT m.a AS a, b, m.c AS cos_x1e6 FROM rep
ORDER BY a, b LIMIT {k}"""


# ---------------------------------------------------------------------------
# duplicate-cluster canonicalization (pairs -> connected components)
# ---------------------------------------------------------------------------


def _symmetrize(directed: DataFrame) -> DataFrame:
    """(a,b) undirected pairs -> both directions, distinct."""
    return (
        directed.unionByName(
            directed.select(F.col("b").alias("a"), F.col("a").alias("b"))
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def _contract_local(pairs: DataFrame) -> DataFrame:
    """Partition-local union-find contraction: each Arrow batch's edges
    collapse to a star per LOCAL component (node -> local min). Global
    connectivity is preserved (nodes shared across batches still link
    through their local roots), the edge count drops from O(edges) to
    O(nodes) per batch, and any chain that fits a batch collapses to
    depth 1 — so the star loop starts from a much shallower graph.
    Narrow (mapInPandas, zero shuffle); the standard pre-step for
    MapReduce CC (Kiveris et al. SoCC'14 §4 'local contraction')."""
    import numpy as np
    import pandas as pd

    def run(batches):
        for pdf in batches:
            a = pdf["a"].to_numpy(np.int64)
            b = pdf["b"].to_numpy(np.int64)
            nodes, inv = np.unique(np.concatenate([a, b]),
                                   return_inverse=True)
            ea, eb = inv[: len(a)], inv[len(a):]
            lab = np.arange(len(nodes), dtype=np.int64)
            while True:
                # vectorized hash-min over edges + pointer jumping:
                # O(log n) passes, each one numpy sweep over the batch
                m = np.minimum(lab[ea], lab[eb])
                new = lab.copy()
                np.minimum.at(new, ea, m)
                np.minimum.at(new, eb, m)
                new = new[new]
                if np.array_equal(new, lab):
                    break
                lab = new
            yield pd.DataFrame({"a": nodes, "b": nodes[lab]})

    return pairs.mapInPandas(run, schema="a long, b long").filter(
        F.col("a") != F.col("b")
    )


def connected_components(
    pairs: DataFrame,
    max_iter: int = 50,
    stats: dict | None = None,
    pre_contract: bool = True,
) -> DataFrame:
    """Near-dup pairs (a, b) -> (node, comp): comp = min doc_id
    reachable through the pair graph — the cluster id every production
    dedup pipeline needs before it can elect one canonical doc per
    duplicate group and drop the rest.

    Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris et al.,
    "Connected Components in MapReduce and Beyond", SoCC'14 Alg. 2-3) —
    O(log n) rounds even on adversarial chains (the boilerplate-corpus
    case plain min-label propagation needs diameter rounds for):

    - large-star(u): m = min(N(u) ∪ {u}); re-link every LARGER
      neighbor v > u to m.
    - small-star(u): m = min of the <=-u neighborhood; re-link every
      smaller neighbor AND u itself to m.

    Each half-round is one groupBy(min) + one join on the symmetric
    edge list — exactly the shuffle shape of a label-propagation round,
    just with geometric (not linear) convergence. Rounds are eagerly
    localCheckpoint-ed to truncate the self-referential lineage (the
    analyzer, not the data, blows up otherwise); on a real cluster swap
    for reliable checkpoints. Convergence = the edge set is a fixed
    point (two anti-join counts); the converged graph is a union of
    stars centered at each component's min, so labels read directly
    off the final adjacency. ``stats['rounds']`` (optional) records the
    round count — the O(log n) evidence the chain test asserts.

    Only docs appearing in >= 1 pair are returned (singletons are not
    duplicates of anything).
    """
    pairs = pairs.persist()
    # eager localCheckpoint: materializes (so the potentially expensive
    # upstream pair pipeline runs exactly once) AND truncates lineage
    raw = pairs.select(F.col("a").cast("long"), F.col("b").cast("long"))
    if pre_contract:
        raw = _contract_local(raw)
    edges = _symmetrize(raw).localCheckpoint(eager=True)
    edges0 = edges  # the node universe is read off the contracted edges
    pairs.unpersist()
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        # ---- large-star: v>u re-linked to min(N(u) ∪ {u})
        mins = edges.groupBy("a").agg(
            F.least(F.min("b"), F.first("a")).alias("m")
        )
        # lazily persisted, not checkpointed: it is consumed three
        # times inside `new`'s plan, so the cache fills during new's
        # single materialization job — one Spark action per half-round
        # pair instead of two (round overhead, not shuffle count, is
        # what the toy-scale bench sees; the shuffle shape at 100 TB
        # is identical either way)
        large = _symmetrize(
            edges.join(mins, "a")
            .filter(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), F.col("m").alias("b"))
        ).persist()
        # ---- small-star: u and its smaller neighbors re-linked to
        # their min (rows with b<=a are exactly the <=-neighborhood)
        small_side = large.filter(F.col("b") < F.col("a"))
        smins = small_side.groupBy("a").agg(F.min("b").alias("m"))
        relink = small_side.join(smins, "a").select(
            F.col("b").alias("a"), F.col("m").alias("b")
        )
        self_link = smins.select(F.col("a"), F.col("m").alias("b"))
        new = _symmetrize(
            relink.unionByName(self_link).filter(F.col("a") != F.col("b"))
        ).localCheckpoint(eager=True)
        large.unpersist()
        # ---- fixed point? (set equality — ONE action: the union of
        # both anti-join directions is empty iff the sets are equal)
        converged = (
            new.join(edges, ["a", "b"], "left_anti")
            .unionByName(edges.join(new, ["a", "b"], "left_anti"))
            .isEmpty()
        )
        edges = new
        if converged:
            break
    if stats is not None:
        stats["rounds"] = rounds
    # converged: stars centered at component minima — comp(u) =
    # min(N(u) ∪ {u}); nodes whose edges collapsed entirely (a 2-node
    # component keeps one edge; larger ones keep their star) are
    # centers of their own star
    labels = edges.groupBy(F.col("a").alias("node")).agg(
        F.least(F.min("b"), F.first("a")).alias("comp")
    )
    all_nodes = edges0.select(F.col("a").alias("node")).distinct()
    return all_nodes.join(labels, "node", "left").select(
        "node", F.coalesce("comp", F.col("node")).alias("comp")
    )


def dedup_clusters(pairs: DataFrame) -> DataFrame:
    """Pairs -> one row per clustered doc:
    (doc_id, component, cluster_size), ordered (component, doc_id).
    Docs with doc_id == component are the elected canonicals (min id
    wins, matching exact_dedup's canonical rule)."""
    comp = connected_components(pairs)
    from pyspark.sql.window import Window

    w = Window.partitionBy("comp")
    return (
        comp.withColumn("cluster_size", F.count("*").over(w))
        .select(
            F.col("node").alias("doc_id"),
            F.col("comp").alias("component"),
            F.col("cluster_size").cast("long"),
        )
        .orderBy("component", "doc_id")
    )


def dedup_clusters_sql(pairs_sql: str) -> str:
    """DuckDB twin of ``dedup_clusters`` over the pair set produced by
    ``pairs_sql`` (any SELECT with columns a, b): min-reachable-id via a
    recursive CTE, then per-component sizes."""
    return f"""WITH RECURSIVE pr AS ({pairs_sql}),
eg AS (SELECT a, b FROM pr UNION SELECT b AS a, a AS b FROM pr),
reach(node, r) AS (
  SELECT a AS node, a AS r FROM eg
  UNION
  SELECT e.a AS node, reach.r FROM eg e JOIN reach ON reach.node = e.b
),
comp AS (SELECT node, min(r) AS comp FROM reach GROUP BY node)
SELECT c.node AS doc_id, c.comp AS component,
       CAST(count(*) OVER (PARTITION BY c.comp) AS BIGINT) AS cluster_size
FROM comp c
ORDER BY component, doc_id"""


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    threshold: float = 0.5,
    max_shingle_df: int = 1000,
    k: int = 200,
) -> DataFrame:
    """Benchmark decontamination — the n-gram test-set-overlap filter a
    training-data pipeline runs before training: flag corpus docs that
    CONTAIN a benchmark item's n-grams. Score = containment
    |shingles(bench) ∩ shingles(doc)| / |shingles(bench)| (not Jaccard:
    a short benchmark item buried in a long document must still flag).

    Shape at 100 TB: the benchmark side is tiny (thousands of items) —
    its shingle table broadcasts; candidates come from ONE corpus-scan
    equi-join on the shingle key, with the same max_shingle_df
    boilerplate guard as the near-dup paths applied to CANDIDATE
    GENERATION only (exact containment is then recomputed on candidate
    pairs from the unguarded sets, so the guard can't deflate scores).

    `benchmark`: (bench_id, text). -> (doc_id, bench_id,
    containment_x1e6) with containment >= threshold, ordered
    (containment DESC, doc_id, bench_id), top-k.
    """
    sh_d = _shingles(docs, n).persist()
    sh_b = (
        _shingles(benchmark.select(F.col("bench_id").alias("doc_id"), "text"), n)
        .select(F.col("doc_id").alias("bench_id"), "sh")
        .persist()
    )
    rare = (
        sh_d.groupBy("sh")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") <= max_shingle_df)
        .select("sh")
    )
    cand = (
        sh_d.join(rare, "sh", "left_semi")
        .join(F.broadcast(sh_b), "sh")
        .select("doc_id", "bench_id")
        .distinct()
    )
    sizes_b = sh_b.groupBy("bench_id").agg(F.count("*").alias("bsz"))
    inter = (
        cand.join(sh_b, "bench_id")
        .join(sh_d, ["doc_id", "sh"], "left_semi")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("inter"))
    )
    return (
        inter.join(F.broadcast(sizes_b), "bench_id")
        .withColumn(
            "containment_x1e6",
            F.round(F.col("inter") / F.col("bsz") * 1e6).cast("long"),
        )
        .filter(F.col("inter") / F.col("bsz") >= threshold)
        .select("doc_id", "bench_id", "containment_x1e6")
        .orderBy(
            F.col("containment_x1e6").desc(),
            F.col("doc_id").asc(),
            F.col("bench_id").asc(),
        )
        .limit(k)
    )


def decontaminate_sql(
    bench_pred: str, n: int = 8, threshold: float = 0.5,
    max_shingle_df: int = 1000, k: int = 200,
) -> str:
    """DuckDB twin of `decontaminate` with the benchmark drawn from the
    documents table by `bench_pred` (the gate's deterministic synthetic
    benchmark)."""
    return f"""WITH {_shingles_sql(n)},
bsh AS (SELECT doc_id AS bench_id, sh FROM shingles
        WHERE bench_id IN (SELECT doc_id FROM documents WHERE {bench_pred})),
rare AS (SELECT sh FROM shingles GROUP BY sh HAVING count(*) <= {max_shingle_df}),
cand AS (
  SELECT DISTINCT d.doc_id, b.bench_id
  FROM shingles d JOIN rare USING (sh) JOIN bsh b ON b.sh = d.sh
),
bsz AS (SELECT bench_id, count(*) AS bsz FROM bsh GROUP BY bench_id),
inter AS (
  SELECT c.doc_id, c.bench_id, count(*) AS i
  FROM cand c JOIN bsh b ON b.bench_id = c.bench_id
  JOIN shingles d ON d.doc_id = c.doc_id AND d.sh = b.sh
  GROUP BY c.doc_id, c.bench_id
)
SELECT i.doc_id, i.bench_id,
       CAST(ROUND(i.i * 1000000.0 / s.bsz) AS BIGINT) AS containment_x1e6
FROM inter i JOIN bsz s USING (bench_id)
WHERE i.i * 1.0 / s.bsz >= {threshold}
ORDER BY containment_x1e6 DESC, doc_id ASC, bench_id ASC LIMIT {k}"""


# ---------------------------------------------------------------------------
# Exact duplicate-substring detection / removal (Lee et al. 2022,
# "Deduplicating Training Data Makes Language Models Better"). The
# paper removes every substring of >= min_len tokens that appears more
# than once in the corpus, found with a giant suffix array. The
# distributed reduction here is EXACT for that membership question: a
# token position sits inside a duplicated substring of length >=
# min_len IFF it is covered by some duplicated min_len-gram (every
# window of the long duplicate is itself duplicated, and the windows
# cover all its positions). So the suffix array becomes one positional
# n-gram groupBy:
#
#   positional grams -> global count > 1 -> covered positions = union
#   of [start, start + min_len) over duplicated occurrences.
#
# 100-TB shape: one map-side-combinable count on the gram column, one
# shuffle join back, and a bounded explode (min_len x duplicated
# occurrences — duplicated grams are the minority in a deduplicated
# corpus, and hot boilerplate grams cost O(their occurrences), not
# O(n^2)). Interval merging instead of the explode is a constant-factor
# option; the explode keeps both engines trivially identical.
# ---------------------------------------------------------------------------


def _positional_grams(docs: DataFrame, n: int) -> DataFrame:
    """-> (doc_id, start, sh): EVERY n-gram occurrence with its 1-based
    token start (within-doc repeats kept — the suffix array sees them)."""
    toks = F.filter(F.split(F.lower(F.col("text")), TOKEN_RX), lambda t: t != "")
    return (
        docs.withColumn("_toks", toks)
        .filter(F.size("_toks") >= n)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"transform(sequence(1, size(_toks) - {n} + 1), "
                    f"i -> struct(i AS start, "
                    f"array_join(slice(_toks, i, {n}), ' ') AS sh))"
                )
            ).alias("g"),
        )
        .select("doc_id", F.col("g.start").alias("start"), F.col("g.sh").alias("sh"))
    )


def substring_dedup_stats(
    docs: DataFrame, min_len: int = 10, k: int = 200
) -> DataFrame:
    """Per-doc duplicated-span accounting
    -> (doc_id, n_tokens, n_dup_pos, dup_ratio_x1e6): how many token
    positions sit inside some corpus-duplicated substring of
    >= min_len tokens (the paper's removal target)."""
    grams = _positional_grams(docs, min_len)
    dup = (
        grams.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .select("sh")
    )
    covered = (
        grams.join(dup, "sh")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (min_len - 1))
            ).alias("pos"),
        )
        .groupBy("doc_id")
        .agg(F.count_distinct("pos").alias("n_dup_pos"))
    )
    toks = F.filter(F.split(F.lower(F.col("text")), TOKEN_RX), lambda t: t != "")
    base = docs.select("doc_id", F.size(toks).cast("long").alias("n_tokens"))
    return (
        base.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_dup_pos"), F.lit(0)).cast("long").alias("n_dup_pos"),
            F.round(
                F.coalesce(F.col("n_dup_pos"), F.lit(0))
                / F.greatest(F.col("n_tokens"), F.lit(1)) * 1e6
            ).cast("long").alias("dup_ratio_x1e6"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def substring_dedup_stats_sql(min_len: int = 10, k: int = 200) -> str:
    n = min_len
    return f"""WITH tl AS (SELECT doc_id, {_toks_sql_expr()} AS toks FROM documents),
grams AS (
  SELECT doc_id, i AS start,
         array_to_string(list_slice(toks, i, i + {n} - 1), ' ') AS sh
  FROM tl, unnest(generate_series(1, len(toks) - {n} + 1)) AS t(i)
  WHERE len(toks) >= {n}
),
dup AS (SELECT sh FROM grams GROUP BY sh HAVING count(*) > 1),
covered AS (
  SELECT doc_id, count(DISTINCT pos) AS n_dup_pos FROM (
    SELECT g.doc_id, unnest(generate_series(g.start, g.start + {n} - 1)) AS pos
    FROM grams g JOIN dup d ON g.sh = d.sh
  ) GROUP BY doc_id
)
SELECT t.doc_id, CAST(len(t.toks) AS BIGINT) AS n_tokens,
       CAST(coalesce(c.n_dup_pos, 0) AS BIGINT) AS n_dup_pos,
       CAST(ROUND(coalesce(c.n_dup_pos, 0)
            / greatest(len(t.toks), 1) * 1000000.0) AS BIGINT) AS dup_ratio_x1e6
FROM tl t LEFT JOIN covered c ON t.doc_id = c.doc_id
ORDER BY t.doc_id LIMIT {k}"""


def substring_dedup_clean(docs: DataFrame, min_len: int = 10) -> DataFrame:
    """The removal op itself -> (doc_id, clean_text): tokens covered by
    a duplicated >= min_len-gram dropped, survivors rejoined with
    single spaces (the paper removes the span; token granularity here
    because the engine's unit is the token)."""
    grams = _positional_grams(docs, min_len)
    dup = (
        grams.groupBy("sh").agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1).select("sh")
    )
    covered = (
        grams.join(dup, "sh")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("start"), F.col("start") + (min_len - 1))
            ).alias("pos"),
        )
        .groupBy("doc_id")
        .agg(F.collect_set("pos").alias("dead"))
    )
    toks = F.filter(F.split(F.lower(F.col("text")), TOKEN_RX), lambda t: t != "")
    return (
        docs.select("doc_id", toks.alias("_toks"))
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.array_join(
                F.when(F.col("dead").isNull(), F.col("_toks")).otherwise(
                    F.expr(
                        "filter(transform(_toks, (t, i) -> "
                        "struct(t AS t, i + 1 AS p)), "
                        "s -> NOT array_contains(dead, s.p))"
                    ).getField("t")
                ),
                " ",
            ).alias("clean_text"),
        )
    )
