"""sql64 execution mode — JVM/codegen scoring path + DuckDB-oracle parity.

The exact32 path (executor.py) replicates Lucene's float32 bit-for-bit.
This module is the second execution mode: postings are decoded once by a
vectorized pandas UDF into arrays, exploded JVM-side, and BM25 is
computed in *float64 Spark SQL expressions* (whole-stage codegen, no
Python in the scoring loop). The identical formula is expressible in
ANSI SQL, which is what the driver's DuckDB correctness gate runs.

Scores are exposed as ``score_x1e6`` (round(score*1e6) as bigint) so the
row set is bit-stable across engines; ranking is (score_x1e6 DESC,
doc_id ASC).

Formula (canonical BM25, float64; the algebraic form of
BM25Similarity.java:221-232 without the float32 rewrite):

    idf  = ln(1 + (N - df + 0.5) / (df + 0.5))
    dlq  = byte4ToInt(intToByte4(doc_len))        -- quantized, as Lucene
    score = sum over matched terms of
            idf * freq / (freq + k1 * (1 - b + b * dlq / avgdl))
    avgdl = sum_doc_len / N
"""

from __future__ import annotations

import math
from functools import lru_cache

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from lucene_spark.search.executor import IndexReader
from lucene_spark.util.smallfloat import LENGTH_TABLE

def _fmt(reader: "IndexReader") -> str:
    """Manifest postings-format name (SegmentInfos codec role)."""
    return reader.manifest.get("postings_format") or "for104"


K1 = 1.2
B = 0.75

_DECODE_TYPE = T.StructType(
    [
        T.StructField("docs", T.ArrayType(T.LongType())),
        T.StructField("freqs", T.ArrayType(T.IntegerType())),
        T.StructField("norms", T.ArrayType(T.IntegerType())),
    ]
)


@lru_cache(maxsize=None)
def _decode_udf(fmt_name: str = "for104"):
    """Arrow-batched postings decode bound to one postings format
    (the manifest's SegmentInfos-codec role)."""

    @F.pandas_udf(_DECODE_TYPE)
    def decode(blobs: pd.Series, norm_blobs: pd.Series) -> pd.DataFrame:
        import numpy as np

        from lucene_spark.index.formats import get_postings_format

        fmt = get_postings_format(fmt_name)
        docs, freqs, norms = [], [], []
        for blob, nb in zip(blobs, norm_blobs):
            d, f = fmt.decode(bytes(blob))
            docs.append(d.tolist())
            freqs.append(f.astype(np.int32).tolist())
            norms.append(np.frombuffer(bytes(nb), dtype=np.uint8).astype(np.int32).tolist())
        return pd.DataFrame({"docs": docs, "freqs": freqs, "norms": norms})

    return decode


def exploded_postings(reader: IndexReader, field: str, terms: list[str]) -> DataFrame:
    """-> DataFrame(term, doc_id, freq, norm_code): decode once in Python
    (Arrow-batched), explode JVM-side. Tombstoned docs are anti-joined
    out (liveDocs role); BM25 stats still count them until merge.

    Composite readers (search/composite.py MultiReader /
    ParallelReader — the BaseCompositeReader role) provide their own
    doc-base-rebased decode; the duck-typed hook keeps every sqlpath
    scoring function working over composites unchanged."""
    if hasattr(reader, "exploded_postings"):
        return reader.exploded_postings(field, terms)
    rows = reader.term_rows(field, terms)
    dec = rows.select(
        "term",
        _decode_udf(_fmt(reader))("postings", "norms").alias("p"),
    )
    z = dec.select(
        "term", F.explode(F.arrays_zip("p.docs", "p.freqs", "p.norms")).alias("e")
    )
    out = z.select(
        "term",
        F.col("e.docs").alias("doc_id"),
        F.col("e.freqs").alias("freq"),
        F.col("e.norms").alias("norm_code"),
    )
    dels = reader.deleted_df()
    if dels is not None:
        # plain anti-join, NO broadcast hint: AQE picks broadcast while
        # the tombstone set is small and switches to a shuffled join
        # under heavy churn — a forced broadcast would ship every
        # tombstone to every executor on every query
        out = out.join(dels, "doc_id", "left_anti")
    return out


def _length_table_col(code: Column) -> Column:
    """Quantized doc length from a norm code — the 256-entry decode table
    as a JVM literal array (BM25Similarity LENGTH_TABLE analog)."""
    arr = F.array(*[F.lit(int(v)) for v in LENGTH_TABLE])
    return F.element_at(arr, code + 1)


def _score_col(freq: Column, dlq: Column, df: Column, n_docs: Column, avgdl: Column) -> Column:
    idf = F.log(F.lit(1.0) + (n_docs - df + 0.5) / (df + 0.5))
    return idf * freq / (freq + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dlq / avgdl))


def _with_stats(reader: IndexReader, field: str, scored_terms: list[str]) -> tuple[DataFrame, Column, Column]:
    """(df per term broadcast frame, N literal, avgdl literal).

    Per-term docFreq stays a LAZY broadcast join against the term_stats
    table (no driver collect — one less job per query); collection
    stats are cached at reader construction."""
    coll = reader.collection_stats(field)
    df_df = (
        reader.term_stats_df()
        .filter(
            (F.col("field") == field)
            & (F.col("term").isin(list(set(scored_terms))))
        )
        .select("term", F.col("doc_freq").cast("double").alias("df"))
    )
    n = F.lit(float(coll.doc_count))
    avgdl = F.lit(coll.sum_total_term_freq / float(coll.doc_count))
    return df_df, n, avgdl


# cap on the literal-df fast path: beyond this many terms the map
# literal bloats the plan more than the broadcast join costs
_DF_LITERAL_MAX_TERMS = 64


def _attach_df(
    reader: IndexReader, field: str, ep: DataFrame, df_df: DataFrame,
    terms: list[str],
) -> DataFrame:
    """Attach the per-term docFreq column to the exploded postings.

    Fast path: for few-term queries the doc freqs come from the
    reader's driver term cache (zero jobs warm; a <= n_terms-row
    pushed-down collect cold) and ride the plan as a LITERAL map
    lookup — removing the broadcast-exchange job the lazy join costs
    on EVERY query. ep only ever holds terms present in the index, so
    the literal map is total over ep's term column and the semantics
    are identical to the inner join. Fallback (many-term expansions,
    readers without the cache path): the lazy broadcast join —
    plan-size-bounded, one exchange."""
    ts = sorted(set(terms))
    if 0 < len(ts) <= _DF_LITERAL_MAX_TERMS:
        try:
            st = reader.term_stats(field, ts)
        except Exception:
            st = None
        if st is not None:
            present = [t for t in ts if t in st]
            if not present:
                # inner-join semantics: no stats -> no scored rows
                return ep.filter(F.lit(False)).withColumn(
                    "df", F.lit(0.0)
                )
            pairs: list = []
            for t in present:
                pairs += [F.lit(t), F.lit(float(st[t].doc_freq))]
            # restrict to keyed terms FIRST so (a) rows whose term has
            # no stats drop exactly like the inner join did, and
            # (b) element_at never sees a missing key (ANSI mode
            # throws on map misses)
            return ep.filter(F.col("term").isin(present)).withColumn(
                "df", F.element_at(F.create_map(*pairs), F.col("term"))
            )
    return ep.join(F.broadcast(df_df), "term")


def bool_bm25_topk(
    reader: IndexReader,
    field: str,
    must: list[str] | None = None,
    should: list[str] | None = None,
    must_not: list[str] | None = None,
    filter_terms: list[str] | None = None,
    min_should: int = 0,
    k: int = 10,
) -> DataFrame:
    """Boolean BM25 top-k, all-JVM scoring -> (doc_id, score_x1e6).

    MUST terms must all match; SHOULD terms optional (>= min_should, or
    >=1 if there are no MUST clauses); MUST_NOT excludes; FILTER terms
    must match but do NOT contribute score (BooleanClause.Occur.FILTER)
    — a semi-join on the matched set; score = sum of matched scoring
    clauses.
    """
    must, should, must_not = must or [], should or [], must_not or []
    filter_terms = filter_terms or []
    scoring = sorted(set(must) | set(should))
    ep = exploded_postings(reader, field, scoring)
    df_df, n, avgdl = _with_stats(reader, field, scoring)
    dlq = _length_table_col(F.col("norm_code"))
    scored = _attach_df(reader, field, ep, df_df, scoring).withColumn(
        "tscore", _score_col(F.col("freq"), dlq, F.col("df"), n, avgdl)
    )
    is_must = F.col("term").isin(must) if must else F.lit(False)
    is_should = F.col("term").isin(should) if should else F.lit(False)
    agg = scored.groupBy("doc_id").agg(
        F.sum("tscore").alias("score"),
        F.count_distinct(F.when(is_must, F.col("term"))).alias("n_must"),
        F.count_distinct(F.when(is_should, F.col("term"))).alias("n_should"),
    )
    cond = F.lit(True)
    if must:
        cond = cond & (F.col("n_must") == len(must))
    need = min_should if must else max(1, min_should)
    if should and (need > 0 or not must):
        cond = cond & (F.col("n_should") >= need)
    out = agg.filter(cond)
    if filter_terms:
        # ONE postings scan + ONE semi-join for all FILTER terms: a doc
        # passes iff it matches every filter term (count distinct terms
        # per doc == number of filter terms) — no per-term join chain
        fts = sorted(set(filter_terms))
        fm = (
            exploded_postings(reader, field, fts)
            .groupBy("doc_id")
            .agg(F.count_distinct("term").alias("_nf"))
            .filter(F.col("_nf") == len(fts))
            .select("doc_id")
        )
        out = out.join(fm, "doc_id", "left_semi")
    if must_not:
        mn = exploded_postings(reader, field, must_not).select("doc_id").distinct()
        out = out.join(mn, "doc_id", "left_anti")
    return (
        out.select(
            "doc_id",
            F.round(F.col("score") * 1e6).cast("long").alias("score_x1e6"),
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def const_score_topk(reader: IndexReader, field: str, terms: list[str], k: int = 10) -> DataFrame:
    """Constant-score multi-term (prefix/wildcard/fuzzy/range/set rewrite
    target): matching docs ordered by doc_id."""
    if not terms:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    ep = exploded_postings(reader, field, terms)
    return (
        ep.select("doc_id")
        .distinct()
        .withColumn("score_x1e6", F.lit(1_000_000).cast("long"))
        .orderBy("doc_id")
        .limit(k)
    )


def phrase_bm25_topk(reader: IndexReader, field: str, terms: list[str], k: int = 10) -> DataFrame:
    """Exact-phrase BM25: phrase freq from the positional index (pandas
    kernel per segment), scored in float64 JVM expressions.
    idf = sum of per-term idfs (BM25Similarity.idfExplain array form)."""
    from lucene_spark.search import query as Q
    from lucene_spark.search.executor import _make_phrase_freq_fn

    coll = reader.collection_stats(field)
    st = reader.term_stats(field, terms)
    if len(st) < len(set(terms)):
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    rows = reader.term_rows(field, terms)
    freqs = rows.groupBy("segment_id").applyInPandas(
        _make_phrase_freq_fn(terms, fmt=_fmt(reader)),
        schema="doc_id long, freq int, norm_code int",
    )
    dels = reader.deleted_df()
    if dels is not None:
        freqs = freqs.join(dels, "doc_id", "left_anti")
    import math

    idf_sum = sum(
        math.log(1.0 + (coll.doc_count - st[t].doc_freq + 0.5) / (st[t].doc_freq + 0.5))
        for t in terms
    )
    avgdl = coll.sum_total_term_freq / float(coll.doc_count)
    dlq = _length_table_col(F.col("norm_code"))
    score = F.lit(idf_sum) * F.col("freq") / (
        F.col("freq") + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dlq / F.lit(avgdl))
    )
    return (
        freqs.select(
            "doc_id", F.round(score * 1e6).cast("long").alias("score_x1e6")
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def graph_phrase_const_topk(
    reader: IndexReader, field: str, paths: list[list[str]], k: int = 10
) -> DataFrame:
    """Graph phrase query (core/util/QueryBuilder.java analyzeGraphPhrase
    + core/analysis/GraphTokenFilter.java): the query analyzer produced
    a token GRAPH (multi-word synonyms / word-delimiter splits); a doc
    matches if ANY root-to-sink path occurs as an exact phrase. Wrapped
    in ConstantScore (the count/filter use; the reference's span-union
    scoring is rank-unstable across engines). Each multi-term path is a
    per-segment positional-intersection kernel; single-term paths are a
    postings lookup; the union is one distinct. Paths with an unindexed
    term match nothing, like the reference's empty-term SpanNear.
    -> (doc_id, score_x1e6=1e6), doc_id ASC."""
    from lucene_spark.search.executor import _make_phrase_freq_fn

    sets: list[DataFrame] = []
    for p in paths:
        st = reader.term_stats(field, p)
        if len(st) < len(set(p)):
            continue  # a path term is absent from the index
        if len(p) == 1:
            sets.append(exploded_postings(reader, field, [p[0]]).select("doc_id"))
            continue
        rows = reader.term_rows(field, p)
        freqs = rows.groupBy("segment_id").applyInPandas(
            _make_phrase_freq_fn(p, fmt=_fmt(reader)),
            schema="doc_id long, freq int, norm_code int",
        )
        sets.append(freqs.filter(F.col("freq") > 0).select("doc_id"))
    if not sets:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    out = sets[0]
    for s in sets[1:]:
        out = out.unionByName(s)
    out = out.distinct()
    dels = reader.deleted_df()
    if dels is not None:
        out = out.join(dels, "doc_id", "left_anti")
    return (
        out.select("doc_id", F.lit(1_000_000).cast("long").alias("score_x1e6"))
        .orderBy("doc_id")
        .limit(k)
    )


def covering_topk(
    reader: IndexReader,
    field: str,
    terms: list[str],
    min_match_expr: str,
    k: int = 10,
) -> DataFrame:
    """CoveringQuery (sandbox/search/CoveringQuery.java): a disjunction
    whose minimum-should-match is a PER-DOCUMENT value source rather
    than a constant — here any SQL expression over the docs registry
    (e.g. a stored `required_matches` column, or a derived one). Score =
    sum of matching clause scores, like the reference. ->
    (doc_id, score_x1e6)."""
    ep = exploded_postings(reader, field, sorted(set(terms)))
    df_df, n, avgdl = _with_stats(reader, field, sorted(set(terms)))
    dlq = _length_table_col(F.col("norm_code"))
    scored = _attach_df(
        reader, field, ep, df_df, sorted(set(terms))
    ).withColumn(
        "tscore", _score_col(F.col("freq"), dlq, F.col("df"), n, avgdl)
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("tscore").alias("score"),
        F.count_distinct("term").alias("n_matched"),
    )
    need = reader.docs().select(
        "doc_id", F.expr(min_match_expr).cast("long").alias("_need")
    )
    return (
        agg.join(need, "doc_id")
        .filter(F.col("n_matched") >= F.col("_need"))
        .select(
            "doc_id",
            F.round(F.col("score") * 1e6).cast("long").alias("score_x1e6"),
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def classic_topk(
    reader: IndexReader, field: str, term: str, k: int = 10
) -> DataFrame:
    """ClassicSimilarity (search/similarities/ClassicSimilarity.java /
    TFIDFSimilarity.java): idf = ln((docCount+1)/(docFreq+1)) + 1,
    tf = sqrt(freq), lengthNorm = 1/sqrt(dl) over the QUANTIZED doc
    length. score = idf * tf * lengthNorm. -> (doc_id, score_x1e6)."""
    ep = exploded_postings(reader, field, [term])
    coll = reader.collection_stats(field)
    st = reader.term_stats(field, [term])
    if term not in st:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    idf = F.lit(
        math.log((coll.doc_count + 1) / (st[term].doc_freq + 1)) + 1.0
    )
    dlq = _length_table_col(F.col("norm_code")).cast("double")
    score = idf * F.sqrt(F.col("freq").cast("double")) / F.sqrt(dlq)
    return (
        ep.select(
            "doc_id", F.round(score * 1e6).cast("long").alias("score_x1e6")
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def lm_jelinek_mercer_topk(
    reader: IndexReader, field: str, term: str, lam: float = 0.1, k: int = 10
) -> DataFrame:
    """LMJelinekMercerSimilarity (search/similarities/
    LMJelinekMercerSimilarity.java): score = log(1 +
    ((1-lambda) * freq / dl) / (lambda * P(w|C))) with dl the quantized
    doc length and P(w|C) = totalTermFreq / sumTotalTermFreq.
    -> (doc_id, score_x1e6)."""
    ep = exploded_postings(reader, field, [term])
    coll = reader.collection_stats(field)
    st = reader.term_stats(field, [term])
    if term not in st:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    p_w = st[term].total_term_freq / float(coll.sum_total_term_freq)
    dlq = _length_table_col(F.col("norm_code")).cast("double")
    score = F.log(
        F.lit(1.0)
        + (F.lit(1.0 - lam) * F.col("freq") / dlq) / F.lit(lam * p_w)
    )
    return (
        ep.select(
            "doc_id", F.round(score * 1e6).cast("long").alias("score_x1e6")
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def boolean_sim_topk(
    reader: IndexReader, field: str, terms: list[str], k: int = 10
) -> DataFrame:
    """BooleanSimilarity (search/similarities/BooleanSimilarity.java):
    every matching term contributes exactly its boost (1.0 here),
    independent of freq and length — a SHOULD disjunction scores the
    count of matched terms. -> (doc_id, score_x1e6)."""
    ep = exploded_postings(reader, field, terms)
    out = ep.groupBy("doc_id").agg(
        (F.count_distinct("term").cast("double") * 1e6)
        .cast("long")
        .alias("score_x1e6")
    )
    return out.orderBy(
        F.col("score_x1e6").desc(), F.col("doc_id").asc()
    ).limit(k)


def _sim_scaffold(reader: IndexReader, field: str, term: str):
    """Shared SimilarityBase scaffold: exploded postings for the term +
    the BasicStats scalars every model reads. None if term absent."""
    st = reader.term_stats(field, [term])
    if term not in st:
        return None
    coll = reader.collection_stats(field)
    ep = exploded_postings(reader, field, [term])
    stats = {
        "n": float(coll.doc_count),
        "sumttf": float(coll.sum_total_term_freq),
        "avgdl": coll.sum_total_term_freq / float(coll.doc_count),
        "df": float(st[term].doc_freq),
        "ttf": float(st[term].total_term_freq),
    }
    return ep, stats


def _sim_rank(ep: DataFrame, score, k: int) -> DataFrame:
    return (
        ep.select(
            "doc_id", F.round(score * 1e6).cast("long").alias("score_x1e6")
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


_LN2 = math.log(2.0)


def _tfn_expr(norm: str, s: dict, c: float, mu: float, z: float):
    """Normalization{H1,H2,H3,Z,none}.tfn as a JVM column over the
    quantized doc length (NormalizationH1/H2/H3/Z.java)."""
    dlq = _length_table_col(F.col("norm_code")).cast("double")
    f = F.col("freq").cast("double")
    if norm == "h1":
        return f * F.lit(c * s["avgdl"]) / dlq
    if norm == "h2":
        return f * F.log(F.lit(1.0) + F.lit(c * s["avgdl"]) / dlq) / F.lit(_LN2)
    if norm == "h3":
        prior = mu * (s["ttf"] + 1.0) / (s["sumttf"] + 1.0)
        return (f + F.lit(prior)) / (dlq + F.lit(mu)) * F.lit(mu)
    if norm == "z":
        return f * F.pow(F.lit(s["avgdl"]) / dlq, F.lit(z))
    if norm == "none":
        return f
    raise ValueError(f"unknown normalization {norm!r}")


def dfr_topk(
    reader: IndexReader,
    field: str,
    term: str,
    model: str = "in",
    after_effect: str = "l",
    norm: str = "h2",
    c: float = 1.0,
    mu: float = 800.0,
    z: float = 0.30,
    k: int = 10,
) -> DataFrame:
    """The full DFR grid on the sql64 path (DFRSimilarity.java):
    BasicModel{g,if,in,ine} x AfterEffect{b,l} x
    Normalization{h1,h2,h3,z,none}. score = boost * basic(tfn, ae1p)
    with ae1p = 1 (L) or (F+1)/df (B), float64 JVM expressions over the
    quantized doc length. -> (doc_id, score_x1e6)."""
    got = _sim_scaffold(reader, field, term)
    if got is None:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    ep, s = got
    tfn = _tfn_expr(norm, s, c, mu, z)
    ae1p = 1.0 if after_effect == "l" else (s["ttf"] + 1.0) / s["df"]
    one = F.lit(1.0)
    if model == "g":
        big_f = s["ttf"] + 1.0
        lam = big_f / (s["n"] + big_f)
        a = math.log2(lam + 1.0)
        b = math.log2((1.0 + lam) / lam)
        score = (F.lit(b) - F.lit(b - a) / (one + tfn)) * F.lit(ae1p)
    else:
        if model == "in":
            a = math.log2((s["n"] + 1.0) / (s["df"] + 0.5))
        elif model == "if":
            a = math.log2(1.0 + (s["n"] + 1.0) / (s["ttf"] + 0.5))
        elif model == "ine":
            ne = s["n"] * (1.0 - ((s["n"] - 1.0) / s["n"]) ** s["ttf"])
            a = math.log2((s["n"] + 1.0) / (ne + 0.5))
        else:
            raise ValueError(f"unknown basic model {model!r}")
        score = F.lit(a * ae1p) * (tfn / (one + tfn))
    return _sim_rank(ep, score, k)


def dfr_inl2_topk(
    reader: IndexReader, field: str, term: str, c: float = 1.0, k: int = 10
) -> DataFrame:
    """DFR In/L/H2 — the round-2 configuration, now a grid point."""
    return dfr_topk(reader, field, term, model="in", after_effect="l",
                    norm="h2", c=c, k=k)


def ib_topk(
    reader: IndexReader,
    field: str,
    term: str,
    distribution: str = "spl",
    lam: str = "df",
    norm: str = "h2",
    c: float = 1.0,
    mu: float = 800.0,
    z: float = 0.30,
    k: int = 10,
) -> DataFrame:
    """The full IB grid on the sql64 path (IBSimilarity.java):
    Distribution{ll,spl} x Lambda{df,ttf} x Normalization.
    LL: -ln(lambda/(tfn+lambda)); SPL: -ln((lambda^(tfn/(tfn+1)) -
    lambda)/(1-lambda)); lambda = (df+1)/(N+1) or (F+1)/(N+1).
    -> (doc_id, score_x1e6)."""
    got = _sim_scaffold(reader, field, term)
    if got is None:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    ep, s = got
    tfn = _tfn_expr(norm, s, c, mu, z)
    lv = (
        (s["df"] + 1.0) / (s["n"] + 1.0)
        if lam == "df"
        else (s["ttf"] + 1.0) / (s["n"] + 1.0)
    )
    one = F.lit(1.0)
    if distribution == "ll":
        score = -F.log(F.lit(lv) / (tfn + F.lit(lv)))
    elif distribution == "spl":
        score = -F.log(
            (F.pow(F.lit(lv), tfn / (tfn + one)) - F.lit(lv)) / F.lit(1.0 - lv)
        )
    else:
        raise ValueError(f"unknown distribution {distribution!r}")
    return _sim_rank(ep, score, k)


def ib_spl_topk(
    reader: IndexReader, field: str, term: str, c: float = 1.0, k: int = 10
) -> DataFrame:
    """IB SPL/LambdaDF/H2 — the round-2 configuration, now a grid point."""
    return ib_topk(reader, field, term, distribution="spl", lam="df",
                   norm="h2", c=c, k=k)


def axiomatic_topk(
    reader: IndexReader,
    field: str,
    term: str,
    variant: str = "f2exp",
    s_param: float | None = None,
    k_param: float = 0.35,
    query_len: int = 1,
    k: int = 10,
) -> DataFrame:
    """Axiomatic family (Axiomatic.java + AxiomaticF{1,2,3}{EXP,LOG}):
    score = max(0, tf * ln * tfln * idf - gamma). Defaults s=0.25
    (F1/F2) / s=0.5 (F3), k=0.35, queryLen=1. -> (doc_id, score_x1e6)."""
    variant = variant.lower()
    if variant not in {"f1exp", "f1log", "f2exp", "f2log", "f3exp", "f3log"}:
        raise ValueError(f"unknown axiomatic variant {variant!r}")
    sp = float(s_param) if s_param is not None else (
        0.5 if variant.startswith("f3") else 0.25
    )
    got = _sim_scaffold(reader, field, term)
    if got is None:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    ep, s = got
    dlq = _length_table_col(F.col("norm_code")).cast("double")
    f = F.col("freq").cast("double")
    one = F.lit(1.0)
    tf = (
        one + F.log(one + F.log(f))
        if variant[1] in "13"
        else one
    )
    lnc = (
        F.lit(s["avgdl"] + sp) / (F.lit(s["avgdl"]) + dlq * F.lit(sp))
        if variant[1] == "1"
        else one
    )
    tfln = (
        f / (f + F.lit(sp) + F.lit(sp) * dlq / F.lit(s["avgdl"]))
        if variant[1] == "2"
        else one
    )
    idf = F.lit(
        ((s["n"] + 1.0) / s["df"]) ** k_param
        if variant.endswith("exp")
        else math.log((s["n"] + 1.0) / s["df"])
    )
    gamma = (
        (dlq - F.lit(float(query_len)))
        * F.lit(sp * query_len / s["avgdl"])
        if variant[1] == "3"
        else F.lit(0.0)
    )
    score = F.greatest(tf * lnc * tfln * idf - gamma, F.lit(0.0))
    return _sim_rank(ep, score, k)


def dfi_topk(
    reader: IndexReader,
    field: str,
    term: str,
    independence: str = "standardized",
    k: int = 10,
) -> DataFrame:
    """DFISimilarity with pluggable independence (DFISimilarity.java +
    Independence{Standardized,Saturated,ChiSquared}.java): expected =
    (ttf+1)*dl/(sumTTF+1); score = log2(measure+1) when freq > expected,
    else 0. -> (doc_id, score_x1e6)."""
    got = _sim_scaffold(reader, field, term)
    if got is None:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    ep, s = got
    dlq = _length_table_col(F.col("norm_code")).cast("double")
    f = F.col("freq").cast("double")
    e = F.lit((s["ttf"] + 1.0) / (s["sumttf"] + 1.0)) * dlq
    if independence == "standardized":
        m = (f - e) / F.sqrt(e)
    elif independence == "saturated":
        m = (f - e) / e
    elif independence == "chisquared":
        m = (f - e) * (f - e) / e
    else:
        raise ValueError(f"unknown independence {independence!r}")
    score = F.when(
        f > e,
        F.log(F.greatest(m, F.lit(0.0)) + F.lit(1.0)) / F.lit(_LN2),
    ).otherwise(F.lit(0.0))
    return _sim_rank(ep, score, k)


def indri_topk(
    reader: IndexReader, field: str, term: str, mu: float = 2000.0, k: int = 10
) -> DataFrame:
    """IndriDirichletSimilarity.java: score = ln((freq + mu*P(w|C)) /
    (dl + mu)) with Indri's +1-smoothed collection model
    P(w|C) = (ttf+1)/(sumTTF+1). Scores are negative log-probabilities;
    ranking is still score DESC. -> (doc_id, score_x1e6)."""
    got = _sim_scaffold(reader, field, term)
    if got is None:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    ep, s = got
    dlq = _length_table_col(F.col("norm_code")).cast("double")
    f = F.col("freq").cast("double")
    p_wc = (s["ttf"] + 1.0) / (s["sumttf"] + 1.0)
    score = F.log((f + F.lit(mu * p_wc)) / (dlq + F.lit(mu)))
    return _sim_rank(ep, score, k)


def lm_dirichlet_topk(
    reader: IndexReader, field: str, term: str, mu: float = 2000.0, k: int = 10
) -> DataFrame:
    """LMDirichletSimilarity (search/similarities/
    LMDirichletSimilarity.java): pluggable-Similarity evidence beyond
    BM25. score = log(1 + freq/(mu*P(w|C))) + log(mu/(dl + mu)), with
    P(w|C) = totalTermFreq / sumTotalTermFreq and dl the QUANTIZED doc
    length (norms are shared across similarities — the reference decode
    path). Scores can be negative for long docs; the reference clamps
    at 0 via `Math.max` in scorers that require it — we keep the raw
    value (documented). -> (doc_id, score_x1e6)."""
    ep = exploded_postings(reader, field, [term])
    coll = reader.collection_stats(field)
    st = reader.term_stats(field, [term])
    if term not in st:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    p_w = st[term].total_term_freq / float(coll.sum_total_term_freq)
    dlq = _length_table_col(F.col("norm_code")).cast("double")
    score = F.log(F.lit(1.0) + F.col("freq") / (F.lit(mu) * F.lit(p_w))) + F.log(
        F.lit(mu) / (dlq + F.lit(mu))
    )
    return (
        ep.select(
            "doc_id", F.round(score * 1e6).cast("long").alias("score_x1e6")
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def sloppy_phrase_bm25_topk(
    reader: IndexReader, field: str, terms: list[str], slop: int, k: int = 10
) -> DataFrame:
    """Sloppy-phrase BM25: float32 sloppyFreq from the greedy matcher
    (SloppyPhraseMatcher.java semantics, executor._sloppy_phrase_freqs)
    per segment, scored in float64 JVM expressions like the exact
    phrase. The DuckDB oracle replays the SAME greedy step-for-step in
    a recursive CTE (gate._sql_sloppy_phrase), so freqs — including
    their float32 accumulation — are value-identical."""
    from lucene_spark.search.executor import _make_sloppy_phrase_freq_fn

    coll = reader.collection_stats(field)
    st = reader.term_stats(field, terms)
    if len(st) < len(set(terms)):
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    rows = reader.term_rows(field, terms)
    freqs = rows.groupBy("segment_id").applyInPandas(
        _make_sloppy_phrase_freq_fn(terms, slop, fmt=_fmt(reader)),
        schema="doc_id long, freq float, norm_code int",
    )
    dels = reader.deleted_df()
    if dels is not None:
        freqs = freqs.join(dels, "doc_id", "left_anti")
    import math

    idf_sum = sum(
        math.log(1.0 + (coll.doc_count - st[t].doc_freq + 0.5) / (st[t].doc_freq + 0.5))
        for t in terms
    )
    avgdl = coll.sum_total_term_freq / float(coll.doc_count)
    dlq = _length_table_col(F.col("norm_code"))
    f64 = F.col("freq").cast("double")
    score = F.lit(idf_sum) * f64 / (
        f64 + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dlq / F.lit(avgdl))
    )
    return (
        freqs.filter(F.col("freq") > 0)
        .select("doc_id", F.round(score * 1e6).cast("long").alias("score_x1e6"))
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def spans_topk(
    reader: IndexReader, field: str, source, k: int = 10
) -> DataFrame:
    """Scored span query (queries/spans SpanQuery.java family):
    per-segment span enumeration (executor._span_freqs — every match,
    not just minimal intervals) yields a float32 sloppy freq
    sum(1/(1+width)) per doc (SpanScorer.java:116-140), scored with
    BM25 over the scoring subtree's summed idf
    (SpanWeight.buildSimWeight). Plan shape = the sloppy-phrase path:
    one postings scan filtered to the tree's terms, one
    applyInPandas per segment, broadcast-free JVM scoring, TakeOrdered."""
    from lucene_spark.search.executor import (
        _expand_span_source,
        _make_spans_freq_fn,
    )

    source = _expand_span_source(source, reader, field)
    all_terms = sorted(set(source.terms()))
    score_terms = sorted(set(source.scoring_terms()))
    coll = reader.collection_stats(field)
    st = reader.term_stats(field, score_terms)
    present = [t for t in score_terms if t in st]
    if not present:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    rows = reader.term_rows(field, all_terms)
    freqs = rows.groupBy("segment_id").applyInPandas(
        _make_spans_freq_fn(source, fmt=_fmt(reader)),
        schema="doc_id long, freq float, norm_code int",
    )
    dels = reader.deleted_df()
    if dels is not None:
        freqs = freqs.join(dels, "doc_id", "left_anti")
    import math

    idf_sum = sum(
        math.log(1.0 + (coll.doc_count - st[t].doc_freq + 0.5) / (st[t].doc_freq + 0.5))
        for t in present
    )
    avgdl = coll.sum_total_term_freq / float(coll.doc_count)
    dlq = _length_table_col(F.col("norm_code"))
    f64 = F.col("freq").cast("double")
    score = F.lit(idf_sum) * f64 / (
        f64 + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dlq / F.lit(avgdl))
    )
    return (
        freqs.filter(F.col("freq") > 0)
        .select("doc_id", F.round(score * 1e6).cast("long").alias("score_x1e6"))
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def synonym_bm25_topk(reader: IndexReader, field: str, terms: list[str], k: int = 10) -> DataFrame:
    """SynonymQuery semantics: freqs summed per doc, df blended to max."""
    ep = exploded_postings(reader, field, terms)
    coll = reader.collection_stats(field)
    st = reader.term_stats(field, terms)
    present = [t for t in terms if t in st]
    if not present:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    df_blend = max(st[t].doc_freq for t in present)
    n = F.lit(float(coll.doc_count))
    avgdl = F.lit(coll.sum_total_term_freq / float(coll.doc_count))
    agg = ep.groupBy("doc_id").agg(
        F.sum("freq").alias("freq"), F.first("norm_code").alias("norm_code")
    )
    dlq = _length_table_col(F.col("norm_code"))
    score = _score_col(F.col("freq"), dlq, F.lit(float(df_blend)), n, avgdl)
    return (
        agg.select("doc_id", F.round(score * 1e6).cast("long").alias("score_x1e6"))
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def dismax_topk(
    reader: IndexReader, field: str, terms: list[str], tie: float = 0.0, k: int = 10
) -> DataFrame:
    """DisjunctionMax over single-term queries:
    score = max + tie*(sum-max)."""
    ep = exploded_postings(reader, field, terms)
    df_df, n, avgdl = _with_stats(reader, field, sorted(set(terms)))
    dlq = _length_table_col(F.col("norm_code"))
    scored = _attach_df(
        reader, field, ep, df_df, sorted(set(terms))
    ).withColumn(
        "tscore", _score_col(F.col("freq"), dlq, F.col("df"), n, avgdl)
    )
    agg = scored.groupBy("doc_id").agg(
        F.max("tscore").alias("smax"), F.sum("tscore").alias("ssum")
    )
    score = F.col("smax") + F.lit(tie) * (F.col("ssum") - F.col("smax"))
    return (
        agg.select("doc_id", F.round(score * 1e6).cast("long").alias("score_x1e6"))
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def term_count(reader: IndexReader, field: str, term: str) -> DataFrame:
    """Hit count answered from stats WITHOUT touching postings — the
    Weight#count shortcut (Weight.java:198, TermQuery.java:260). With
    tombstones present the shortcut is unavailable (Weight#count
    returns -1 when deletions exist) and the count falls back to the
    live posting stream."""
    if reader.manifest.get("delete_batches"):
        return (
            exploded_postings(reader, field, [term])
            .groupBy()
            .agg(F.count_distinct("doc_id").alias("cnt"))
        )
    return (
        reader.term_stats_df()
        .filter((F.col("field") == field) & (F.col("term") == term))
        .groupBy()
        .agg(F.coalesce(F.sum("doc_freq"), F.lit(0)).alias("cnt"))
    )


def facet_counts(
    reader: IndexReader, field: str, term: str, facet_col: str, k: int = 20
) -> DataFrame:
    """Facet counting: docs matching `term`, counted per category of the
    docs-registry column (FastTaxonomyFacetCounts analog: groupBy+count,
    broadcast-joined on the matched doc set)."""
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    docs = reader.docs()
    return (
        docs.join(matched, "doc_id", "left_semi")
        .groupBy(facet_col)
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col(facet_col).asc())
        .limit(k)
    )


def long_value_facet_counts(
    reader: IndexReader, field: str, term: str, value_col: str, k: int = 10
) -> DataFrame:
    """LongValueFacetCounts (facet/LongValueFacetCounts.java): counts for
    every unique long value of ``value_col`` over the hit docs;
    getTopChildren order = count DESC then value ASC
    (LongValueFacetCounts.java:452-476), plus the FacetResult total —
    the number of hits that had a value (totCount,
    LongValueFacetCounts.java:66-70) — as a ``__total__`` row.

    Scale shape: ONE rollup aggregation (map-side combined) yields both
    the per-value counts and the grand total; the two consumers of the
    grouped frame share the exchange (Spark ReusedExchange), so the
    scan runs once. -> (path, cnt): path = zero-padded value.
    """
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    vals = (
        reader.docs()
        .join(matched, "doc_id", "left_semi")
        .where(F.col(value_col).isNotNull())
        .select(F.col(value_col).cast("long").alias("value"))
    )
    agg = vals.rollup("value").agg(F.count("*").cast("long").alias("cnt"))
    top = (
        agg.where(F.col("value").isNotNull())
        .orderBy(F.col("cnt").desc(), F.col("value").asc())
        .limit(k)
        .select(F.format_string("%06d", F.col("value")).alias("path"), "cnt")
    )
    total = agg.where(F.col("value").isNull()).select(
        F.lit("__total__").alias("path"), "cnt"
    )
    return top.unionByName(total)


def string_value_facet_counts(
    reader: IndexReader, field: str, term: str,
    value_cols: list[str], k: int = 10,
) -> DataFrame:
    """StringValueFacetCounts (facet/StringValueFacetCounts.java) over a
    multi-valued string field: per-doc DISTINCT values (SortedSetDocValues
    dedups within a doc), doc counts per value, top-k by count DESC then
    value ASC (TopOrdAndIntQueue order), plus totalDocCount — docs with
    at least one value (StringValueFacetCounts.java:76,419) — as a
    ``__total__`` row. The multi-valued field is synthesized as
    array(value_cols) per doc.

    Scale shape: array_distinct + explode is a narrow op (no shuffle);
    one groupBy(value) count for the children and one count for the
    total — both map-side combined. -> (path, cnt).
    """
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    per_doc = (
        reader.docs()
        .join(matched, "doc_id", "left_semi")
        .select(
            "doc_id",
            F.array_distinct(
                F.filter(
                    F.array(*[F.col(c).cast("string") for c in value_cols]),
                    lambda v: v.isNotNull(),
                )
            ).alias("vs"),
        )
        .where(F.size("vs") > 0)
    )
    exploded = per_doc.select("doc_id", F.explode("vs").alias("value"))
    top = (
        exploded.groupBy("value")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("value").asc())
        .limit(k)
        .select(F.col("value").alias("path"), "cnt")
    )
    total = per_doc.agg(F.count("*").cast("long").alias("cnt")).select(
        F.lit("__total__").alias("path"), "cnt"
    )
    return top.unionByName(total)


def _floor_div(col: Column, width: int) -> Column:
    # Math.floorDiv: subtracting pmod first makes the numerator exactly
    # divisible, so the double division is exact for |v| < 2^53 (the
    # docvalue ranges histograms bucket; beyond that, bucket keys would
    # need a decimal div).
    return (col - F.pmod(col, F.lit(width))) / F.lit(width)


def histogram_facet_counts(
    reader: IndexReader,
    field: str,
    term: str,
    value_cols: list[str],
    bucket_width: int,
    max_buckets: int = 1024,
    enforce_max_buckets: bool = True,
) -> DataFrame:
    """HistogramCollectorManager (sandbox/facet/plain/histograms/
    HistogramCollectorManager.java + HistogramCollector.java): doc
    counts per value interval — bucket key k = Math.floorDiv(value,
    bucketWidth) maps to [k*w, (k+1)*w). Contract carried exactly:
    bucketWidth >= 2 (HistogramCollectorManager.java:78), per-doc
    DISTINCT buckets for multi-valued fields ("we must not double-count
    values that map to the same bucket since this returns doc counts",
    HistogramCollector.java:161-166), docs with no value don't count,
    and the best-effort maxBuckets guard (checkMaxBuckets raise,
    default 1024).

    Scale shape: the reference's two fast paths — the PointTree bulk
    collector (whole BKD cells inside one bucket counted wholesale) and
    the DocValuesSkipper dense-array collector for index-sorted fields
    (the TencentCLS trick the javadoc cites) — are both answers to
    row-at-a-time collection; in Spark the same histogram IS one
    map-side-combined groupBy over a single pruned column scan (partial
    aggregation plays the per-cell bulk-count role: each partition
    emits one row per occupied bucket, never per doc), so no separate
    fast path exists to route to. -> (path, cnt), path = zero-padded
    bucket key, ordered by path.
    """
    if bucket_width < 2:
        raise ValueError(f"bucketWidth must be at least 2, got: {bucket_width}")
    if max_buckets < 1:
        raise ValueError(f"maxBuckets must be at least 1, got: {max_buckets}")
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    hits = reader.docs().join(matched, "doc_id", "left_semi")
    if len(value_cols) == 1:
        buckets = hits.where(F.expr(value_cols[0]).isNotNull()).select(
            _floor_div(F.expr(value_cols[0]).cast("long"), bucket_width)
            .cast("long").alias("bucket")
        )
    else:
        # multi-valued (SortedNumericDocValues): per-doc distinct buckets
        buckets = (
            hits.select(
                F.explode(
                    F.array_distinct(
                        F.transform(
                            F.filter(
                                F.array(*[F.expr(c).cast("long") for c in value_cols]),
                                lambda v: v.isNotNull(),
                            ),
                            lambda v: _floor_div(v, bucket_width).cast("long"),
                        )
                    )
                ).alias("bucket")
            )
        )
    agg = (
        buckets.groupBy("bucket")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    if enforce_max_buckets:
        n = agg.count()
        if n > max_buckets:
            raise RuntimeError(
                f"Collected {n} buckets, which is more than the configured "
                f"max number of buckets: {max_buckets}"
            )
    return agg.select(
        F.format_string("%06d", F.col("bucket")).alias("path"), "cnt"
    ).orderBy("path")


def taxonomy_facet_counts(
    reader: IndexReader,
    field: str,
    term: str,
    dim_cols: list[str],
    k: int = 50,
) -> DataFrame:
    """Hierarchical taxonomy facets (facet/taxonomy/
    FastTaxonomyFacetCounts.java): the dim hierarchy is the column list
    (e.g. [source, lang] = path source/lang), counts at EVERY level.

    Spark shape: ONE rollup aggregation over the matched docs — a
    single shuffle produces all levels (the taxonomy ordinal-counting
    pass); paths render as '/'-joined prefixes. -> (path, cnt) ordered
    by path."""
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    docs = reader.docs().join(matched, "doc_id", "left_semi")
    # grouping() distinguishes the rollup's aggregated-away levels from
    # REAL NULL category values (ADVICE r02): a doc whose first dim is
    # NULL must still be counted (rendered "(null)"), and only the
    # grand-total row (first dim aggregated) is dropped. A NULL at a
    # deeper level renders explicitly so its path never collapses onto
    # the parent prefix.
    gcols = [F.grouping(c).alias(f"_g{i}") for i, c in enumerate(dim_cols)]
    rolled = docs.rollup(*dim_cols).agg(F.count("*").alias("cnt"), *gcols)
    parts = [
        F.when(F.col(f"_g{i}") == 1, F.lit(None)).otherwise(
            F.coalesce(F.col(c).cast("string"), F.lit("(null)"))
        )
        for i, c in enumerate(dim_cols)
    ]
    path = F.concat_ws("/", *parts)  # concat_ws skips the NULL tail
    return (
        rolled.filter(F.col("_g0") == 0)  # drop ONLY the grand total
        .select(path.alias("path"), "cnt")
        .orderBy("path")
        .limit(k)
    )


def facet_associations(
    reader: IndexReader,
    field: str,
    term: str,
    facet_col: str,
    value_col: str,
    k: int = 20,
) -> DataFrame:
    """Facet associations (facet/taxonomy/
    TaxonomyFacetIntAssociations.java, AssociationAggregationFunction
    SUM/MAX): aggregate a per-doc integer association under each
    category of the matched docs. -> (category, sum_assoc, max_assoc)."""
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    docs = reader.docs().join(matched, "doc_id", "left_semi")
    return (
        docs.groupBy(F.col(facet_col).alias("category"))
        .agg(
            F.sum(value_col).cast("long").alias("sum_assoc"),
            F.max(value_col).cast("long").alias("max_assoc"),
        )
        .orderBy("category")
        .limit(k)
    )


def facet_float_associations(
    reader: IndexReader,
    field: str,
    term: str,
    facet_col: str,
    value_expr: str,
    k: int = 20,
) -> DataFrame:
    """Float associations from a value source (facet/taxonomy/
    TaxonomyFacetFloatAssociations.java aggregateValues(DoubleValuesSource)
    + AssociationAggregationFunction SUM/MAX): aggregate an ARBITRARY
    double expression per category of the matched docs — the value
    source is a SQL expression (the engine's DoubleValuesSource
    surface), so any reference composition is a one-liner and
    ANSI-portable to the oracle. x1e6-quantized like every float path.
    -> (category, sum_x1e6, max_x1e6)."""
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    docs = reader.docs().join(matched, "doc_id", "left_semi")
    # per-doc x1e6 quantization BEFORE the sum: integer addition is
    # order-free, so the distributed sum equals the oracle's regardless
    # of partitioning (the FuzzyLikeThis cross-engine convention)
    v = F.round(F.expr(value_expr).cast("double") * 1e6).cast("long")
    return (
        docs.groupBy(F.col(facet_col).alias("category"))
        .agg(
            F.sum(v).cast("long").alias("sum_x1e6"),
            F.max(v).cast("long").alias("max_x1e6"),
        )
        .orderBy("category")
        .limit(k)
    )


def vector_similarity_score_topk(
    reader: IndexReader,
    field: str,
    term: str,
    emb: DataFrame,
    query_id: int = 0,
    k: int = 10,
) -> DataFrame:
    """FunctionScoreQuery over a vector-similarity value source
    (queries/function/valuesource/FloatVectorSimilarityFunction.java +
    FloatKnnVectorFieldSource.java + ConstKnnFloatValueSource for the
    query vector): final score = BM25 x cosine(doc vector, query
    vector). The query vector is one driver-pulled row; the doc-side
    cosine is an unrolled element_at chain (scalar JVM expressions that
    stay inside whole-stage codegen — the zip_with/aggregate
    higher-order form is a CodegenFallback expression and forced the
    projection to interpreted eval), joined to the scored docs on
    doc_id. Both factors quantize to x1e6 integers BEFORE the product
    so the composed score is engine-stable. -> (doc_id, score_x1e6)."""
    from lucene_spark.pipeline.similarity import cosine_lit_col

    scored = term_scored(reader, field, term)
    qv = [
        float(x)
        for x in emb.filter(F.col("vec_id") == query_id).head()["embedding"]
    ]
    cos_x1e6 = F.round(cosine_lit_col("embedding", qv) * 1e6).cast("long")
    j = scored.join(
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
    )
    return (
        j.select(
            "doc_id",
            F.round(F.col("score_x1e6") * cos_x1e6 / F.lit(1e6))
            .cast("long")
            .alias("score_x1e6"),
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def group_facet_counts(
    reader: IndexReader,
    field: str,
    term: str,
    group_col: str,
    facet_col: str,
    k: int = 20,
) -> DataFrame:
    """Grouped facet counts (grouping/GroupFacetCollector.java: 'the
    counts are based on distinct groups' — a facet value counts each
    group once, however many of the group's docs match). One
    count-distinct aggregation over the matched docs; Spark's partial
    distinct handles the combine map-side. -> (facet, cnt) by facet."""
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    docs = reader.docs().join(matched, "doc_id", "left_semi")
    return (
        docs.groupBy(F.col(facet_col).alias("facet"))
        .agg(F.count_distinct(group_col).alias("cnt"))
        .orderBy("facet")
        .limit(k)
    )


def facet_set_counts(
    reader: IndexReader,
    field: str,
    term: str,
    matchers: list[tuple[str, list[tuple]]],
) -> DataFrame:
    """Facet-set matching (facet/facetset/MatchingFacetSetsCounts.java):
    count matched docs whose multi-dim facet set satisfies each matcher.

    The reference packs k-dim long points per doc (FacetSetsField) and
    counts hits per FacetSetMatcher — ExactFacetSetMatcher (every dim
    equal) or RangeFacetSetMatcher (every dim inside a DimRange,
    FacetSet.java / DimRange.java). Here the dims are docs-registry
    columns, which generalizes the long-only reference encoding; an
    exact dim is a singleton range, exactly as
    RangeFacetSetMatcher.fromLongs models it.

    `matchers` = [(name, [(col, "exact", v) | (col, "range", lo, hi)])].
    All matchers are evaluated in ONE conditional-aggregation pass over
    the matched docs (a single count job, no per-matcher scan — the
    MatchingFacetSetsCounts single-pass contract). -> (matcher, cnt)
    ordered by matcher name."""
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    docs = reader.docs().join(matched, "doc_id", "left_semi")

    def _cond(specs) -> Column:
        c = F.lit(True)
        for s in specs:
            if s[1] == "exact":
                c = c & (F.col(s[0]) == F.lit(s[2]))
            else:
                c = c & F.col(s[0]).between(F.lit(s[2]), F.lit(s[3]))
        return c

    aggs = [
        F.sum(_cond(specs).cast("long")).alias(name)
        for name, specs in matchers
    ]
    one = docs.agg(*aggs)
    pairs = []
    for name, _ in matchers:
        pairs.append(F.lit(name))
        pairs.append(F.coalesce(F.col(name), F.lit(0)).cast("long"))
    return (
        one.select(
            F.explode(F.create_map(*pairs)).alias("matcher", "cnt")
        )
        .orderBy("matcher")
    )


def diversified_topk(
    reader: IndexReader,
    field: str,
    term: str,
    key_col: str,
    max_per_key: int = 1,
    k: int = 10,
) -> DataFrame:
    """Diversified top-k (misc/search/DiversifiedTopDocsCollector.java):
    the classic top-k collector with at most `max_per_key` hits sharing
    one key — lower-scored hits of an over-represented key are
    dominated and dropped, exactly the reference's per-key mini-queue
    rule. Spark shape: one rank window partitioned by key (single
    shuffle) then a global TakeOrdered — never a full sort.
    -> (doc_id, grp, score_x1e6) by (score DESC, doc_id ASC)."""
    from pyspark.sql.window import Window

    scored = term_scored(reader, field, term)
    docs = reader.docs().select("doc_id", F.col(key_col).alias("grp"))
    j = scored.join(docs, "doc_id")
    w = Window.partitionBy("grp").orderBy(
        F.col("score_x1e6").desc(), F.col("doc_id").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max_per_key)
        .select("doc_id", "grp", "score_x1e6")
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def sampled_facet_counts(
    reader: IndexReader,
    field: str,
    term: str,
    facet_col: str,
    sample_mod: int = 4,
    k: int = 20,
) -> DataFrame:
    """Sampled facet counting (facet/RandomSamplingFacetsCollector.java
    role): count facets over a deterministic 1/sample_mod subsample of
    the matched docs and amortize (scale) the counts back up — the
    collector's sampled-then-corrected contract. Sampling here is
    doc_id % sample_mod == 0 (deterministic, partition-local, and
    exactly reproducible by the SQL oracle) rather than the reference's
    seeded XORShift; the statistical contract is the same.
    -> (category, sampled_cnt, scaled_cnt)."""
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    docs = reader.docs().join(matched, "doc_id", "left_semi").filter(
        F.col("doc_id") % sample_mod == 0
    )
    return (
        docs.groupBy(F.col(facet_col).alias("category"))
        .agg(F.count("*").alias("sampled_cnt"))
        .select(
            "category",
            "sampled_cnt",
            (F.col("sampled_cnt") * sample_mod).cast("long").alias("scaled_cnt"),
        )
        .orderBy("category")
        .limit(k)
    )


# ---------------------------------------------------------------------------
# collector / ranking extensions: field sort, grouping, range facets,
# RRF fusion, rescoring, feature scoring, match-all
# ---------------------------------------------------------------------------


def term_scored(reader: IndexReader, field: str, term: str) -> DataFrame:
    """Single-term BM25 as (doc_id, score_x1e6) WITHOUT top-k cut — the
    scored-docs building block for collectors below. Integer scores make
    downstream ranks engine-independent."""
    ep = exploded_postings(reader, field, [term])
    df_df, n, avgdl = _with_stats(reader, field, [term])
    dlq = _length_table_col(F.col("norm_code"))
    scored = _attach_df(reader, field, ep, df_df, [term]).withColumn(
        "score", _score_col(F.col("freq"), dlq, F.col("df"), n, avgdl)
    )
    return scored.select(
        "doc_id", F.round(F.col("score") * 1e6).cast("long").alias("score_x1e6")
    )


def term_stat_score_topk(
    reader: IndexReader,
    field: str,
    term: str,
    stat_term: str,
    source: str,
    k: int = 10,
) -> DataFrame:
    """Term/index-STATISTIC value sources under FunctionScoreQuery
    (queries/function/valuesource/TermFreqValueSource.java,
    TFValueSource.java, DocFreqValueSource.java, IDFValueSource.java,
    TotalTermFreqValueSource.java, SumTotalTermFreqValueSource.java,
    NormValueSource.java, MaxDocValueSource.java,
    NumDocsValueSource.java): docs matching `term` BM25-scored, the
    score multiplied by a value source reading index statistics rather
    than docvalues columns.

    Per-doc sources: 'termfreq' = raw tf(stat_term) (0 when absent);
    'tf' = sqrt(tf) (TFValueSource under ClassicSimilarity's tf());
    'norm' = 1/sqrt(quantized doc length) (NormValueSource decoding the
    stored length norm through the TFIDF lengthNorm — the engine's
    SmallFloat-quantized length is the stored norm). Per-index
    constants: 'docfreq'; 'idf' = ln((docCount+1)/(df+1)) + 1
    (TFIDFSimilarity.idf); 'totaltermfreq'; 'sumtotaltermfreq';
    'maxdoc'; 'numdocs'.

    100-TB shape: constants come from the bounded driver term-stats
    cache (the same path BM25 df resolution uses) and fold into ONE
    literal; per-doc tf sources add one LEFT postings join (the
    stat-term side is a term-sliced scan, broadcastable); 'norm' joins
    the doclens table on (doc_id) — never a second corpus scan.
    -> (doc_id, score_x1e6)."""
    scored = term_scored(reader, field, term)
    if source in ("termfreq", "tf"):
        tfdf = exploded_postings(reader, field, [stat_term]).select(
            "doc_id", F.col("freq").alias("_f")
        )
        fr = F.coalesce(F.col("_f"), F.lit(0)).cast("double")
        v = fr if source == "termfreq" else F.sqrt(fr)
        base = scored.join(tfdf, "doc_id", "left")
    elif source == "norm":
        dl = reader.doclens().filter(F.col("field") == field).select(
            "doc_id", _length_table_col(F.col("doc_len_code")).alias("_dlq")
        )
        v = F.lit(1.0) / F.sqrt(F.col("_dlq"))
        base = scored.join(dl, "doc_id")
    elif source == "joindf":
        # JoinDocFreqValueSource (queries/function/valuesource/
        # JoinDocFreqValueSource.java): the doc's STRING value from a
        # docvalues column (stat_term is a column name or SQL
        # expression over the registry),
        # looked up as a term in `field` — value = that term's
        # docFreq. One broadcast join against the term dictionary.
        vals = reader.docs().selectExpr(
            "doc_id", f"({stat_term}) AS _jv"
        )
        dfs = (
            reader.term_stats_df()
            .filter(F.col("field") == field)
            .groupBy("term")
            .agg(F.sum("doc_freq").alias("_jdf"))
        )
        base = (
            scored.join(vals, "doc_id")
            .join(
                F.broadcast(dfs),
                F.col("_jv") == F.col("term"),
                "left",
            )
        )
        v = F.coalesce(F.col("_jdf"), F.lit(0)).cast("double")
    else:
        coll = reader.collection_stats(field)
        if source in ("docfreq", "idf", "totaltermfreq"):
            ts = reader.term_stats(field, [stat_term]).get(stat_term)
            df_ = ts.doc_freq if ts else 0
            ttf = ts.total_term_freq if ts else 0
            const = {
                "docfreq": float(df_),
                "idf": math.log((coll.doc_count + 1) / (df_ + 1)) + 1.0,
                "totaltermfreq": float(ttf),
            }[source]
        elif source == "sumtotaltermfreq":
            const = float(coll.sum_total_term_freq)
        elif source == "maxdoc":
            const = float(coll.max_doc)
        elif source == "numdocs":
            const = float(coll.doc_count)
        else:
            raise ValueError(f"unknown value source {source!r}")
        v = F.lit(const)
        base = scored
    new = (F.col("score_x1e6") / 1e6) * v
    return (
        base.select(
            "doc_id", F.round(new * 1e6).cast("long").alias("score_x1e6")
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def match_all_topk(reader: IndexReader, k: int = 10) -> DataFrame:
    """MatchAllDocsQuery (MatchAllDocsQuery.java:23): every live doc,
    constant score 1, doc_id order. Live = doclens minus tombstones
    (purged docs have already left doclens)."""
    out = reader.doclens().select("doc_id").distinct()
    dels = reader.deleted_df()
    if dels is not None:
        out = out.join(dels, "doc_id", "left_anti")
    return (
        out.select("doc_id", F.lit(1_000_000).cast("long").alias("score_x1e6"))
        .orderBy("doc_id")
        .limit(k)
    )


def field_sort_topk(
    reader: IndexReader,
    field: str,
    term: str,
    sort_col: str,
    ascending: bool = False,
    k: int = 10,
    out_id_col: str = "doc_id",
    prune_stats: dict | None = None,
) -> DataFrame:
    """TopFieldCollector analog (SortField.java:59-119): docs matching
    `term`, ordered by a docvalues column with doc_id tie-break.
    -> (doc_id, sort_val). Spark plans this as TakeOrderedAndProject —
    the same O(k) per-partition heap Lucene uses per leaf.

    On an index built with ``IndexConfig.sort_by == sort_col`` the scan
    early-terminates: segments whose manifest key range cannot compete
    are dropped BEFORE the scan (reader.sorted_segment_plan — the
    canEarlyTerminate analog), and the surviving doc_id ranges reach the
    parquet reader as pushed-down predicates. ``out_id_col`` selects an
    alternate registry column as the returned id (sorted indexes
    reassign internal doc ids, so callers keep their original key in a
    metadata column). ``prune_stats`` (optional dict) receives
    {"pruned_segments": n}."""
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    docs = reader.docs().join(matched, "doc_id", "left_semi")
    ranges, pruned = reader.sorted_segment_plan(
        field, term, sort_col, ascending, k
    )
    if prune_stats is not None:
        prune_stats["pruned_segments"] = pruned
    if ranges is not None and pruned:
        cond = None
        for lo, hi in ranges:
            c = (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
            cond = c if cond is None else (cond | c)
        docs = docs.filter(cond)
    order = F.col(sort_col).asc() if ascending else F.col(sort_col).desc()
    return (
        docs.select(
            F.col(out_id_col).alias("doc_id"),
            F.col(sort_col).cast("long").alias("sort_val"),
        )
        .orderBy(order, F.col("doc_id").asc())
        .limit(k)
    )


def selector_sort_topk(
    reader: IndexReader,
    stored: DataFrame,
    field: str,
    term: str,
    selector: str,
    ascending: bool = True,
    k: int = 10,
) -> DataFrame:
    """SortedSetSelector / SortedNumericSelector sort
    (core/search/SortedSetSelector.java:26-104,
    SortedNumericSelector.java): order docs matching `term` by ONE value
    selected from a multi-valued per-doc set — the doc's sorted set of
    distinct terms (SORTED_SET string ords) or its term-length values
    (SORTED_NUMERIC). Selectors: ss_min / ss_max / ss_middle_min /
    ss_middle_max (even-sized sets pick the lower / higher middle —
    SortedSetSelector.java Type docs) and sn_min / sn_max.

    100-TB shape: the multi-value set is computed from the stored doc
    row AFTER the match semi-join (docvalues are per-doc columns, not
    postings), entirely in JVM expressions — split/array_distinct/
    array_sort/element_at — so the plan is scan → semi-join →
    TakeOrderedAndProject with no Python and no extra shuffle.
    `stored` is the stored-fields table carrying (doc_id, <field>).
    -> (doc_id, sel_val string)."""
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    docs = stored.join(matched, "doc_id", "left_semi")
    toks = F.filter(
        F.split(F.lower(F.col(field)), "[^a-z0-9]+"), lambda t: t != ""
    )
    ss = F.array_sort(F.array_distinct(toks))
    n = F.size(ss)
    if selector == "ss_min":
        val = F.element_at(ss, 1)
    elif selector == "ss_max":
        val = F.element_at(ss, -1)
    elif selector == "ss_middle_min":
        val = F.element_at(ss, F.floor((n + 1) / 2).cast("int"))
    elif selector == "ss_middle_max":
        val = F.element_at(ss, F.floor(n / 2).cast("int") + 1)
    elif selector == "sn_min":
        val = F.array_min(F.transform(toks, F.length)).cast("string")
    elif selector == "sn_max":
        val = F.array_max(F.transform(toks, F.length)).cast("string")
    else:
        raise ValueError(f"unknown selector {selector!r}")
    order = F.col("sel_val").asc() if ascending else F.col("sel_val").desc()
    return (
        docs.select("doc_id", val.alias("sel_val"))
        .orderBy(order, F.col("doc_id").asc())
        .limit(k)
    )


def multi_range_topk(
    reader: IndexReader,
    num_col: str,
    ranges: list[tuple[int, int]],
    k: int = 20,
) -> DataFrame:
    """MultiRangeQuery (sandbox/search/MultiRangeQuery.java): docs whose
    numeric docvalue falls in ANY of the inclusive ranges — one scan,
    the range disjunction pushed into the parquet reader as a single
    predicate (the reference merges overlapping ranges for one BKD
    visit; Catalyst's OR-of-BETWEENs plays that role).
    -> (doc_id, score_x1e6) constant score, ordered by doc_id."""
    cond = None
    for lo, hi in ranges:
        c = (F.col(num_col) >= lo) & (F.col(num_col) <= hi)
        cond = c if cond is None else (cond | c)
    return (
        reader.docs()
        .filter(cond)
        .select(
            "doc_id", F.lit(1_000_000).cast("long").alias("score_x1e6")
        )
        .orderBy("doc_id")
        .limit(k)
    )


def range_facet_counts(
    reader: IndexReader, field: str, term: str, num_col: str, edges: list[int]
) -> DataFrame:
    """LongRangeFacetCounts analog: count matched docs per numeric range
    [edges[i], edges[i+1]). -> (bucket, cnt) ordered by bucket."""
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    docs = reader.docs().join(matched, "doc_id", "left_semi")
    c = F.col(num_col)
    bucket = F.lit(None).cast("string")
    for i in range(len(edges) - 1):
        lo, hi = edges[i], edges[i + 1]
        lab = f"{lo:06d}_{hi:06d}"
        bucket = F.when((c >= lo) & (c < hi), F.lit(lab)).otherwise(bucket)
    return (
        docs.select(bucket.alias("bucket"))
        .filter(F.col("bucket").isNotNull())
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .orderBy("bucket")
    )


def long_range_facet_counts(
    reader: IndexReader,
    field: str,
    term: str,
    num_col: str,
    ranges: list[tuple[str, int, bool, int, bool]],
) -> DataFrame:
    """LongRangeFacetCounts over ARBITRARY LongRange objects
    (facet/range/LongRange.java:54-63, LongRangeFacetCounts.java):
    ranges carry inclusive/exclusive bounds and MAY OVERLAP — every
    range counts matching docs independently (a doc can land in
    several), and zero-count ranges still report. `ranges` rows are
    (label, min, min_inclusive, max, max_inclusive); exclusive bounds
    are normalized to inclusive by +-1 exactly as the constructor does.

    100-TB shape: one conditional aggregation per range inside a SINGLE
    single-row agg pass (map-side combined; the shuffle carries one
    len(ranges)-wide row per task), then a stack() unpivot — no explode
    of docs x ranges, no per-range scan. -> (bucket, cnt) by bucket."""
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    docs = reader.docs().join(matched, "doc_id", "left_semi")
    c = F.col(num_col)
    aggs = []
    for i, (label, lo, lo_incl, hi, hi_incl) in enumerate(ranges):
        lo = lo if lo_incl else lo + 1
        hi = hi if hi_incl else hi - 1
        aggs.append(
            F.sum(F.when((c >= lo) & (c <= hi), 1).otherwise(0))
            .cast("long").alias(f"_r{i}")
        )
    pairs = ", ".join(
        f"'{label}', _r{i}" for i, (label, *_rest) in enumerate(ranges)
    )
    return (
        docs.agg(*aggs)
        .selectExpr(f"stack({len(ranges)}, {pairs}) AS (bucket, cnt)")
        .orderBy("bucket")
    )


def dynamic_range_facets(
    reader: IndexReader,
    field: str,
    term: str,
    num_col: str,
    n_ranges: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """DynamicRangeUtil.computeDynamicNumericRanges analog (facet/.../range/
    DynamicRangeUtil.java): split the matched docs into ``n_ranges`` buckets
    of ~equal TOTAL WEIGHT along ``num_col``. The boundary arithmetic is
    ours (bucket = min(n-1, exclusive-prefix-weight * n DIV total), exact
    integer math over the (value, doc_id) order) so the Spark plan and the
    SQL twin agree bit-for-bit; the reference's accumulate-and-cut loop
    walks the same sorted order. -> (bucket, cnt) where bucket packs
    ``idx_min_max_weight``.

    Scale shape: one sort + running-sum window + one groupBy. The global
    window is a single-reducer prefix sum — at 100 TB swap in the standard
    two-pass distributed prefix sum (per-partition totals broadcast as
    offsets); the cut logic is unchanged.
    """
    from pyspark.sql.window import Window

    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    docs = reader.docs().join(matched, "doc_id", "left_semi")
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("long")
    base = docs.select(
        F.col(num_col).cast("long").alias("v"), "doc_id", w.alias("w")
    )
    order = Window.orderBy(F.col("v").asc(), F.col("doc_id").asc())
    cum = base.select(
        "v",
        "w",
        F.coalesce(
            F.sum("w").over(order.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("cw"),
        F.sum("w").over(Window.partitionBy()).alias("tot"),
    )
    idx = F.least(F.lit(n_ranges - 1), F.expr(f"(cw * {n_ranges}) div tot"))
    return (
        cum.select(idx.alias("idx"), "v", "w")
        .groupBy("idx")
        .agg(
            F.min("v").alias("minv"),
            F.max("v").alias("maxv"),
            F.count("*").alias("cnt"),
            F.sum("w").alias("wsum"),
        )
        .select(
            F.format_string(
                "%02d_%06d_%06d_%09d", "idx", "minv", "maxv", "wsum"
            ).alias("bucket"),
            "cnt",
        )
        .orderBy("bucket")
    )


def grouped_topk(
    reader: IndexReader,
    field: str,
    term: str,
    group_col: str,
    per_group: int = 2,
    k: int = 20,
) -> DataFrame:
    """Two-pass grouping collector analog (FirstPass/SecondPass
    GroupingCollector): top `per_group` docs per group by BM25.
    -> (group, doc_id, score_x1e6, rn). One shuffle keyed by group;
    the rank window runs per group partition (no global sort)."""
    from pyspark.sql.window import Window

    scored = term_scored(reader, field, term)
    docs = reader.docs().select("doc_id", F.col(group_col).alias("grp"))
    j = scored.join(docs, "doc_id")
    w = Window.partitionBy("grp").orderBy(
        F.col("score_x1e6").desc(), F.col("doc_id").asc()
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_group)
        .select(F.col("grp").alias("grp"), "doc_id", "score_x1e6", "rn")
        .orderBy("grp", "rn")
        .limit(k)
    )


def multifield_disjunction_topk(
    reader: IndexReader,
    arms: list[tuple[str, str, float]],
    k: int = 10,
) -> DataFrame:
    """Cross-field SHOULD execution — the sql64 twin of what the
    exact32 searcher does for a MultiFieldQueryParser tree
    (queryparser/classic/MultiFieldQueryParser.java getFieldQuery:
    fieldless clauses expand to per-field arms, each with its own
    field's stats, summed per doc). ``arms`` = [(field, term, boost)].

    Identity contract: score_x1e6 = SUM over arms of
    boost * ROUND(arm_bm25 * 1e6) — per-arm quantization BEFORE the
    sum keeps the value engine-independent. Plan: one postings scan
    per distinct field (term+field pushed to the parquet scan), each
    a broadcast-stats join, then a single union + sum groupBy — the
    shuffle is keyed by doc_id over only the matching docs."""
    parts = []
    for field, term, boost in arms:
        s = term_scored(reader, field, term)
        if boost != 1.0:
            s = s.select(
                "doc_id",
                F.round(F.col("score_x1e6") * F.lit(float(boost)))
                .cast("long")
                .alias("score_x1e6"),
            )
        parts.append(s)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.groupBy("doc_id")
        .agg(F.sum("score_x1e6").alias("score_x1e6"))
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def rrf_topk(
    reader: IndexReader,
    field: str,
    term_a: str,
    term_b: str,
    kconst: int = 60,
    k: int = 10,
    depth: int = 100,
) -> DataFrame:
    """Reciprocal-rank fusion of two single-term rankings
    (TopDocs.rrf, TopDocs.java:372): score = sum over rankings of
    1/(kconst + rank); ranks from (score_x1e6 DESC, doc_id ASC).
    -> (doc_id, rrf_x1e6).

    Each input ranking is first cut to `depth` hits (TopDocs are always
    finite collections), so the rank window runs over <=depth rows —
    never a global sort of all matches."""
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())

    def ranked(term: str) -> DataFrame:
        top = (
            term_scored(reader, field, term)
            .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
            .limit(depth)
        )
        return top.withColumn("rank", F.row_number().over(w))

    ra = ranked(term_a)
    rb = ranked(term_b)
    both = ra.select("doc_id", "rank").unionByName(rb.select("doc_id", "rank"))
    rrf = both.groupBy("doc_id").agg(
        F.sum(F.lit(1.0) / (F.lit(float(kconst)) + F.col("rank"))).alias("rrf")
    )
    return (
        rrf.select(
            "doc_id", F.round(F.col("rrf") * 1e6).cast("long").alias("rrf_x1e6")
        )
        .orderBy(F.col("rrf_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def function_score_topk(
    reader: IndexReader,
    field: str,
    term: str,
    value_expr: str,
    mode: str = "mult",
    k: int = 10,
) -> DataFrame:
    """Generic FunctionScoreQuery (queries/function/
    FunctionScoreQuery.java + the 59 value sources): the value source
    is an ARBITRARY SQL expression over the docs-registry columns —
    Spark's `expr()` is the DoubleValuesSource surface (SURVEY §2.8
    mapping), so any composition the reference builds from value
    sources is a one-liner here, ANSI-portable to the oracle.

    mode: 'mult' = boostByValue (score * v), 'sum' = score + v,
    'replace' = v (pure FunctionQuery). -> (doc_id, score_x1e6)."""
    scored = term_scored(reader, field, term)
    base = scored.join(reader.docs(), "doc_id")
    v = F.expr(value_expr).cast("double")
    s = F.col("score_x1e6") / 1e6
    new = {"mult": s * v, "sum": s + v, "replace": v}[mode]
    return (
        base.select(
            "doc_id", F.round(new * 1e6).cast("long").alias("score_x1e6")
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def rangemap_expr(src: str, lo: float, hi: float,
                  target: str, default: str | None = None) -> str:
    """RangeMapFloatFunction (queries/function/valuesource/
    RangeMapFloatFunction.java): values of ``src`` within [lo, hi]
    INCLUSIVE map to ``target``, others to ``default`` (or pass through
    when null — RangeMapFloatFunction.java:100-104). Returns one ANSI
    SQL string shared verbatim by the Spark plan and the oracle."""
    d = f"({src})" if default is None else f"({default})"
    return (
        f"(CASE WHEN ({src}) >= {lo} AND ({src}) <= {hi} "
        f"THEN ({target}) ELSE {d} END)"
    )


def reciprocal_expr(src: str, m: float, a: float, b: float) -> str:
    """ReciprocalFloatFunction (queries/function/valuesource/
    ReciprocalFloatFunction.java): f(x) = a/(m*x+b) — the classic
    recency boost shape. One ANSI SQL string for both engines."""
    return f"({a} / ({m} * ({src}) + {b}))"


def distance_feature_expr(dist_sql: str, pivot: float,
                          weight: float = 1.0) -> str:
    """DistanceFeatureQuery boost (core/document/
    LongDistanceFeatureQuery.java:214-216 `weight * (float)
    (pivotDistance / (pivotDistance + distance))`, built by
    LongPoint#newDistanceFeatureQuery / LongField): a saturation curve
    that scores 1·weight at the origin, weight/2 at the pivot distance
    and decays hyperbolically beyond it. ``dist_sql`` is the distance
    expression (e.g. ``abs(ts - origin)``). One ANSI SQL string shared
    verbatim by the Spark plan and the DuckDB oracle."""
    return f"({weight} * {pivot} / ({pivot} + ({dist_sql})))"


def distance_feature_topk(
    reader: IndexReader,
    field: str,
    term: str,
    dist_sql: str,
    pivot: float,
    weight: float = 1.0,
    k: int = 10,
) -> DataFrame:
    """LongPoint.newDistanceFeatureQuery in its intended composition
    (LongDistanceFeatureQuery javadoc: "this query is typically useful
    to boost results based on recency by adding this query to a
    Should clause of a BooleanQuery"): the BM25 term query is the
    MUST, the distance feature joins as a SHOULD whose contribution is
    `weight * pivot / (pivot + |value − origin|)`. The boost is one
    flat codegen projection over the docs registry — no per-doc work
    beyond the MUST's own hit set, the reference's
    DistanceFeatureWeight iterator-over-matching-docs contract.
    -> (doc_id, score_x1e6)."""
    return function_score_topk(
        reader, field, term,
        distance_feature_expr(dist_sql, pivot, weight),
        mode="sum", k=k,
    )


def function_range_topk(
    reader: IndexReader,
    value_expr: str,
    lower: float | None = None,
    upper: float | None = None,
    include_lower: bool = True,
    include_upper: bool = True,
    k: int = 10,
) -> DataFrame:
    """FunctionRangeQuery (queries/function/FunctionRangeQuery.java):
    matches docs whose value-source value falls in the range; the SCORE
    IS the value itself (ValueSourceScorer over
    FunctionValues.getRangeScorer), docs without a value never match.
    The reference javadoc calls it "a slow query if run by itself since
    it must visit all docs" — here the linear scan is a single pruned
    column pass with the range predicate pushed to the parquet scan,
    so row groups outside the value range never decompress.
    -> (doc_id, score_x1e6)."""
    v = F.expr(value_expr).cast("double")
    cond = v.isNotNull() & ~F.isnan(v)
    if lower is not None:
        cond = cond & ((v >= lower) if include_lower else (v > lower))
    if upper is not None:
        cond = cond & ((v <= upper) if include_upper else (v < upper))
    return (
        reader.docs()
        .where(cond)
        .select("doc_id", F.round(v * 1e6).cast("long").alias("score_x1e6"))
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def function_match_topk(
    reader: IndexReader,
    field: str,
    term: str,
    predicate_expr: str,
    k: int = 10,
) -> DataFrame:
    """FunctionMatchQuery (queries/function/FunctionMatchQuery.java) in
    its intended composition ("best used in conjunction with other
    queries that can restrict the number of documents visited"): the
    term query scores BM25 as the BooleanQuery MUST, the double
    predicate joins as a non-scoring FILTER (ConstantScoreWeight — it
    never contributes to the score). The predicate evaluates only on
    the term's hits, the TwoPhaseIterator contract.
    -> (doc_id, score_x1e6)."""
    scored = term_scored(reader, field, term).join(reader.docs(), "doc_id")
    return (
        scored.where(F.expr(predicate_expr))
        .select("doc_id", "score_x1e6")
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def scale_score_topk(
    reader: IndexReader,
    field: str,
    term: str,
    value_expr: str,
    to_min: float,
    to_max: float,
    mode: str = "mult",
    k: int = 10,
) -> DataFrame:
    """ScaleFloatFunction (queries/function/valuesource/
    ScaleFloatFunction.java): scales the value source into
    [to_min, to_max] using the CORPUS-WIDE min/max — the reference
    "traverses all of the source values to obtain their min and max"
    (createScaleInfo); docs without a value and non-finite values are
    excluded from the stats (the raw-bits exponent check), an empty
    corpus degrades to min=max=0, and a span-less corpus uses scale=0
    so every doc scores to_min (ScaleFloatFunction.java:111-115).

    Scale shape: the traversal is ONE map-side-combined min/max
    aggregation over a single pruned column (a few bytes per partition
    to the driver side of the exchange), broadcast back into the
    scoring join — two tiny stages, no collect, no second full scan of
    anything but the one column. -> (doc_id, score_x1e6)."""
    docs = reader.docs()
    v_all = F.expr(value_expr).cast("double")
    finite = docs.where(
        v_all.isNotNull() & ~F.isnan(v_all)
        & (F.abs(v_all) != float("inf"))
    )
    stats = finite.agg(
        F.coalesce(F.min(v_all), F.lit(0.0)).alias("__mn"),
        F.coalesce(F.max(v_all), F.lit(0.0)).alias("__mx"),
    )
    base = term_scored(reader, field, term).join(docs, "doc_id")
    j = base.crossJoin(F.broadcast(stats))
    scale = F.when(F.col("__mx") == F.col("__mn"), F.lit(0.0)).otherwise(
        (F.lit(float(to_max)) - F.lit(float(to_min)))
        / (F.col("__mx") - F.col("__mn"))
    )
    scaled = (F.expr(value_expr).cast("double") - F.col("__mn")) * scale + F.lit(
        float(to_min)
    )
    s = F.col("score_x1e6") / 1e6
    new = {"mult": s * scaled, "sum": s + scaled, "replace": scaled}[mode]
    return (
        j.select("doc_id", F.round(new * 1e6).cast("long").alias("score_x1e6"))
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def expression_score_topk(
    reader: IndexReader,
    field: str,
    term: str,
    source: str,
    k: int = 10,
) -> DataFrame:
    """ExpressionRescorer (expressions/ExpressionRescorer.java): compile
    a JavaScript-syntax expression (JavascriptCompiler.java grammar +
    function table) and re-rank the term query's hits by it, with
    ``_score`` bound to the BM25 score and every other free variable
    bound to a docs-registry column. The compiled expression is one
    Catalyst Column — whole-stage codegen, no Python per row.
    -> (doc_id, score_x1e6)."""
    from lucene_spark.search.expressions import compile_expression

    e = compile_expression(source)
    scored = term_scored(reader, field, term)
    base = scored.join(reader.docs(), "doc_id")
    col = e.column(
        lambda n: (F.col("score_x1e6") / 1e6) if n == "_score" else F.col(n)
    )
    return (
        base.select(
            "doc_id", F.round(col * 1e6).cast("long").alias("score_x1e6")
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def rescore_topk(
    reader: IndexReader,
    field: str,
    term: str,
    num_col: str,
    weight: float = 1.0,
    first_n: int = 40,
    k: int = 10,
) -> DataFrame:
    """QueryRescorer analog (QueryRescorer.java): first-pass top
    `first_n` by BM25, re-ranked by score + weight*ln(1 + num_col).
    -> (doc_id, rescored_x1e6). The expensive second pass touches only
    first_n rows — at scale that's a broadcast-sized frame."""
    first = (
        term_scored(reader, field, term)
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(first_n)
    )
    docs = reader.docs().select("doc_id", F.col(num_col).cast("double").alias("feat"))
    re2 = first.join(docs, "doc_id").withColumn(
        "rescored",
        F.col("score_x1e6") / 1e6 + F.lit(weight) * F.log(F.lit(1.0) + F.col("feat")),
    )
    return (
        re2.select(
            "doc_id",
            F.round(F.col("rescored") * 1e6).cast("long").alias("rescored_x1e6"),
        )
        .orderBy(F.col("rescored_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def feature_topk(
    reader: IndexReader,
    field: str,
    term: str,
    num_col: str,
    weight: float = 0.5,
    k: int = 10,
    function: str = "log",
    pivot: float = 1.0,
    exponent: float = 1.0,
) -> DataFrame:
    """FeatureField/FeatureQuery analog (FeatureField.java — the three
    published scoring functions, newLogQuery:353 / newSaturationQuery:
    398 / newSigmoidQuery:442): BM25 term score plus the static
    per-doc feature S folded in as
    'log'        weight * ln(1 + S)
    'saturation' weight * S / (S + pivot)
    'sigmoid'    weight * S^a / (S^a + pivot^a)
    -> (doc_id, score_x1e6)."""
    scored = term_scored(reader, field, term)
    docs = reader.docs().select("doc_id", F.col(num_col).cast("double").alias("feat"))
    s_ = F.col("feat")
    if function == "log":
        boost = F.log(F.lit(1.0) + s_)
    elif function == "saturation":
        boost = s_ / (s_ + F.lit(float(pivot)))
    elif function == "sigmoid":
        sa = F.pow(s_, float(exponent))
        boost = sa / (sa + F.lit(float(pivot) ** float(exponent)))
    else:
        raise ValueError(f"unknown feature function {function!r}")
    j = scored.join(docs, "doc_id").withColumn(
        "total", F.col("score_x1e6") / 1e6 + F.lit(weight) * boost,
    )
    return (
        j.select(
            "doc_id", F.round(F.col("total") * 1e6).cast("long").alias("score_x1e6")
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# suggest / more-like-this / common-terms
# ---------------------------------------------------------------------------


def suggest_terms(
    reader: IndexReader, field: str, word: str, max_edits: int = 2, k: int = 5
) -> DataFrame:
    """Spell suggestions from the term dictionary — the DirectSpellChecker
    analog (suggest/.../DirectSpellChecker.java): candidate terms within
    levenshtein distance <= max_edits of `word`, ranked by
    (distance ASC, doc_freq DESC, term ASC).
    -> (term, distance, doc_freq). JVM-only scan of the tiny term-stats
    table (at 100 TB this is the one table small enough to broadcast)."""
    ts = reader.term_stats_df().filter(F.col("field") == field)
    dist = F.levenshtein(F.col("term"), F.lit(word))
    return (
        ts.withColumn("distance", dist)
        .filter((F.col("distance") <= max_edits) & (F.col("term") != word))
        .groupBy("term", "distance")
        .agg(F.sum("doc_freq").alias("doc_freq"))
        .orderBy(F.col("distance").asc(), F.col("doc_freq").desc(), F.col("term").asc())
        .limit(k)
    )


def prefix_complete(
    reader: IndexReader, field: str, prefix: str, k: int = 5
) -> DataFrame:
    """Completion suggester (suggest/document/CompletionQuery / FST
    role): terms starting with `prefix`, best-weight-first (weight =
    doc_freq, the default popularity weight). JVM-side predicate over
    the sorted term dictionary — the FST's prefix walk becomes a
    row-group-pruned range scan. -> (term, doc_freq)."""
    return (
        reader.term_stats_df()
        .filter((F.col("field") == field) & F.col("term").startswith(prefix))
        .select("term", "doc_freq")
        .orderBy(F.col("doc_freq").desc(), F.col("term").asc())
        .limit(k)
    )


def infix_suggest(
    reader: IndexReader, field: str, needle: str, k: int = 5
) -> DataFrame:
    """AnalyzingInfixSuggester role (suggest/analyzing/
    AnalyzingInfixSuggester.java): suggestions whose text CONTAINS the
    typed fragment anywhere, popularity-ranked. -> (term, doc_freq)."""
    return (
        reader.term_stats_df()
        .filter((F.col("field") == field) & F.col("term").contains(needle))
        .select("term", "doc_freq")
        .orderBy(F.col("doc_freq").desc(), F.col("term").asc())
        .limit(k)
    )


def word_break_suggest(
    reader: IndexReader,
    field: str,
    word: str,
    max_changes: int = 1,
    min_break_length: int = 1,
    k: int = 5,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordBreaks analog (suggest/spell/
    WordBreakSpellChecker.java:86-133): split ``word`` into 2..max_changes+1
    dictionary words, every part a real indexed term of length >=
    ``min_break_length``. Ranked NUM_CHANGES_THEN_SUMMED_FREQUENCY:
    (changes ASC, summed doc_freq DESC, term ASC); ``distance`` carries the
    number of breaks. -> (term, distance, doc_freq).

    Spark shape: each round is one equi-ish join against the aggregated
    term dictionary — the one table small enough to broadcast at any
    corpus size (|dict| grows ~log corpus) — so the whole suggester is
    driver-free and O(max_changes) tiny joins.
    """
    ts = (
        reader.term_stats_df()
        .filter(F.col("field") == field)
        .groupBy("term")
        .agg(F.sum("doc_freq").alias("doc_freq"))
        .filter(F.length("term") >= min_break_length)
    )
    # disambiguated dictionary copy for the (repeated) self-joins below
    d = ts.select(F.col("term").alias("_dt"), F.col("doc_freq").alias("_df"))
    # frontier: (parts, freq, rest) — parts = dictionary words consumed so
    # far (space-joined), rest = unconsumed suffix of `word`.
    frontier = (
        ts.filter(F.lit(word).startswith(F.col("term")) & (F.col("term") != word))
        .select(
            F.col("term").alias("parts"),
            F.col("doc_freq").alias("freq"),
            F.substr(F.lit(word), F.length("term") + F.lit(1)).alias("rest"),
        )
    )
    results = []
    for change in range(1, max_changes + 1):
        done = frontier.join(F.broadcast(d), F.col("rest") == F.col("_dt")).select(
            F.concat_ws(" ", "parts", "rest").alias("term"),
            F.lit(change).cast("int").alias("distance"),
            (F.col("freq") + F.col("_df")).alias("doc_freq"),
        )
        results.append(done)
        if change < max_changes:
            nxt = frontier.join(
                F.broadcast(d),
                F.col("rest").startswith(F.col("_dt"))
                & (F.col("rest") != F.col("_dt")),
            )
            frontier = nxt.select(
                F.concat_ws(" ", "parts", "_dt").alias("parts"),
                (F.col("freq") + F.col("_df")).alias("freq"),
                F.substr(F.col("rest"), F.length("_dt") + F.lit(1)).alias("rest"),
            )
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out.orderBy(
        F.col("distance").asc(), F.col("doc_freq").desc(), F.col("term").asc()
    ).limit(k)


def word_combine_suggest(
    reader: IndexReader,
    field: str,
    terms: list[str],
    max_changes: int = 2,
    max_combine_length: int = 20,
    k: int = 5,
) -> DataFrame:
    """WordBreakSpellChecker.suggestWordCombinations analog (suggest/spell/
    WordBreakSpellChecker.java:135-191): combine runs of 2..max_changes+1
    ADJACENT query terms into one word that exists in the dictionary.
    ``distance`` = words combined - 1, ranked (distance ASC, doc_freq DESC,
    term ASC). -> (term, distance, doc_freq).

    Candidate concatenations are enumerated from the parsed query terms
    (driver-side by nature — a query is a handful of tokens); dictionary
    membership + frequency is one broadcast semi-join against term stats.
    """
    cands = []
    for i in range(len(terms)):
        joined = terms[i]
        for j in range(i + 1, min(len(terms), i + 1 + max_changes)):
            joined = joined + terms[j]
            if len(joined) <= max_combine_length:
                cands.append((joined, j - i))
    ts = (
        reader.term_stats_df()
        .filter(F.col("field") == field)
        .groupBy("term")
        .agg(F.sum("doc_freq").alias("doc_freq"))
    )
    if not cands:
        return ts.select(
            "term", F.lit(0).cast("int").alias("distance"), "doc_freq"
        ).limit(0)
    cdf = reader.spark.createDataFrame(cands, "term string, distance int").dropDuplicates(
        ["term", "distance"]
    )
    return (
        ts.join(F.broadcast(cdf), "term")
        .select("term", "distance", "doc_freq")
        .orderBy(F.col("distance").asc(), F.col("doc_freq").desc(), F.col("term").asc())
        .limit(k)
    )


def mlt_select_terms(
    reader: IndexReader,
    docs_src: DataFrame,
    doc_id: int,
    content_col: str = "text",
    max_terms: int = 5,
) -> list[str]:
    """MoreLikeThis term selection (queries/mlt/MoreLikeThis.java): the
    seed doc's terms ranked by tf*idf, top max_terms, ties by term ASC.
    idf = ln(1 + (N - df + 0.5)/(df + 0.5)) from the global stats."""
    from lucene_spark.pipeline.textstats import tokens_col

    coll = reader.collection_stats(reader.manifest["field"])
    toks = (
        docs_src.filter(F.col("doc_id") == doc_id)
        .select(F.explode(tokens_col(F.col(content_col))).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("tf"))
    )
    ts = reader.term_stats_df().filter(
        F.col("field") == reader.manifest["field"]
    ).select("term", "doc_freq")
    n = float(coll.doc_count)
    scored = toks.join(ts, "term").withColumn(
        "tfidf",
        F.col("tf")
        * F.log(F.lit(1.0) + (F.lit(n) - F.col("doc_freq") + 0.5) / (F.col("doc_freq") + 0.5)),
    )
    rows = (
        scored.orderBy(F.col("tfidf").desc(), F.col("term").asc())
        .limit(max_terms)
        .collect()
    )
    return [r["term"] for r in rows]


def mlt_topk(
    reader: IndexReader,
    docs_src: DataFrame,
    doc_id: int,
    content_col: str = "text",
    max_terms: int = 5,
    k: int = 10,
) -> DataFrame:
    """MoreLikeThis: select the seed doc's top tf*idf terms, then run
    them as a SHOULD boolean BM25 query. -> (doc_id, score_x1e6)."""
    field = reader.manifest["field"]
    terms = mlt_select_terms(reader, docs_src, doc_id, content_col, max_terms)
    if not terms:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    return bool_bm25_topk(reader, field, should=terms, k=k)


def mlt_by_doc(
    reader: IndexReader,
    doc_id: int,
    max_terms: int = 5,
    k: int = 10,
) -> DataFrame:
    """MoreLikeThis.like(docID) (queries/mlt/MoreLikeThis.java:126-133
    'lookup the document's term vector'): the seed terms come from the
    INDEX term vector, not a re-tokenization of the source text — on a
    stemmed or per-field-analyzed index the two differ, and the vector
    is authoritative (same argument as index-driven highlighting).
    Ranking and the downstream SHOULD query match mlt_topk exactly.
    -> (doc_id, score_x1e6)."""
    from lucene_spark.search.termvectors import term_vectors

    field = reader.manifest["field"]
    coll = reader.collection_stats(field)
    tv = term_vectors(reader, [doc_id], field=field).select(
        "term", F.col("freq").alias("tf")
    )
    ts = reader.term_stats_df().filter(F.col("field") == field).select(
        "term", "doc_freq"
    )
    n = float(coll.doc_count)
    scored = tv.join(ts, "term").withColumn(
        "tfidf",
        F.col("tf")
        * F.log(
            F.lit(1.0)
            + (F.lit(n) - F.col("doc_freq") + 0.5) / (F.col("doc_freq") + 0.5)
        ),
    )
    rows = (
        scored.orderBy(F.col("tfidf").desc(), F.col("term").asc())
        .limit(max_terms)
        .collect()
    )
    terms = [r["term"] for r in rows]
    if not terms:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    return bool_bm25_topk(reader, field, should=terms, k=k)


def common_terms_topk(
    reader: IndexReader,
    field: str,
    terms: list[str],
    max_doc_ratio: float = 0.3,
    k: int = 10,
) -> DataFrame:
    """CommonTermsQuery (queries/CommonTermsQuery.java): terms with
    df/N > max_doc_ratio are "common" — they only CONTRIBUTE SCORE to
    docs that match at least one rare term; rare terms drive matching
    (default SHOULD semantics, minShouldMatch=1 on the rare group).
    With no rare terms the query degrades to a plain disjunction.
    -> (doc_id, score_x1e6)."""
    coll = reader.collection_stats(field)
    st = reader.term_stats(field, terms)
    n = float(coll.doc_count)
    present = [t for t in terms if t in st]
    rare = [t for t in present if st[t].doc_freq / n <= max_doc_ratio]
    if not rare:
        return bool_bm25_topk(reader, field, should=present, k=k)
    ep = exploded_postings(reader, field, present)
    df_df, n_col, avgdl = _with_stats(reader, field, present)
    dlq = _length_table_col(F.col("norm_code"))
    scored = _attach_df(reader, field, ep, df_df, present).withColumn(
        "tscore", _score_col(F.col("freq"), dlq, F.col("df"), n_col, avgdl)
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("tscore").alias("score"),
        F.count_distinct(
            F.when(F.col("term").isin(rare), F.col("term"))
        ).alias("n_rare"),
    )
    return (
        agg.filter(F.col("n_rare") >= 1)
        .select(
            "doc_id", F.round(F.col("score") * 1e6).cast("long").alias("score_x1e6")
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def multi_phrase_bm25_topk(
    reader: IndexReader,
    field: str,
    slots: list[list[str]],
    k: int = 10,
) -> DataFrame:
    """MultiPhraseQuery (per-position alternatives), float64 scoring:
    freq = number of phrase alignments where slot i matches any of its
    terms; idf = sum over all PRESENT terms of all slots
    (MultiPhraseQuery.java idf array semantics).
    -> (doc_id, score_x1e6)."""
    import math

    from lucene_spark.search.executor import _make_multi_phrase_freq_fn

    coll = reader.collection_stats(field)
    all_terms = [t for slot in slots for t in slot]
    st = reader.term_stats(field, all_terms)
    pruned = [[t for t in slot if t in st] for slot in slots]
    if any(not s for s in pruned):
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    present = [t for slot in pruned for t in slot]
    rows = reader.term_rows(field, present)
    freqs = rows.groupBy("segment_id").applyInPandas(
        _make_multi_phrase_freq_fn(pruned, fmt=_fmt(reader)),
        schema="doc_id long, freq int, norm_code int",
    )
    dels = reader.deleted_df()
    if dels is not None:
        freqs = freqs.join(dels, "doc_id", "left_anti")
    idf_sum = sum(
        math.log(1.0 + (coll.doc_count - st[t].doc_freq + 0.5) / (st[t].doc_freq + 0.5))
        for t in present
    )
    avgdl = coll.sum_total_term_freq / float(coll.doc_count)
    dlq = _length_table_col(F.col("norm_code"))
    score = F.lit(idf_sum) * F.col("freq") / (
        F.col("freq") + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dlq / F.lit(avgdl))
    )
    return (
        freqs.select("doc_id", F.round(score * 1e6).cast("long").alias("score_x1e6"))
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def near_match_topk(
    reader: IndexReader,
    field: str,
    term_a: str,
    term_b: str,
    window: int = 3,
    ordered: bool = True,
    k: int = 10,
) -> DataFrame:
    """NEAR proximity matching (intervals-lite): docs where term_b
    occurs within `window` positions after term_a (ordered) or within
    `window` in either direction (unordered); constant score.
    -> (doc_id, score_x1e6) ordered by doc_id."""
    from lucene_spark.search.executor import _make_near_fn

    st = reader.term_stats(field, [term_a, term_b])
    if term_a not in st or term_b not in st:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    rows = reader.term_rows(field, [term_a, term_b])
    matched = rows.groupBy("segment_id").applyInPandas(
        _make_near_fn(term_a, term_b, window, ordered, fmt=_fmt(reader)),
        schema="doc_id long",
    )
    dels = reader.deleted_df()
    if dels is not None:
        matched = matched.join(dels, "doc_id", "left_anti")
    return (
        matched.select(
            "doc_id", F.lit(1_000_000).cast("long").alias("score_x1e6")
        )
        .orderBy("doc_id")
        .limit(k)
    )


def intervals_match_topk(
    reader: IndexReader,
    field: str,
    source,
    k: int = 10,
) -> DataFrame:
    """IntervalQuery matching (queries/intervals/Intervals.java subset:
    n-term ordered/unordered with max_gaps/max_width, containedBy /
    containing): docs with >= 1 minimal interval of `source`; constant
    score. -> (doc_id, score_x1e6) ordered by doc_id."""
    from lucene_spark.search.executor import _make_intervals_fn

    terms = sorted(set(source.terms()))
    st = reader.term_stats(field, terms)
    # absent terms are NOT uniformly fatal: IAtLeast(n) still matches
    # with n of the remaining sources (ADVICE r02). Mirror the executor:
    # bail only when nothing is present, and let the structure-aware
    # evaluator handle per-source absences exactly (ordered/unordered/
    # contained sources with a missing term simply produce no intervals).
    if not st:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    rows = reader.term_rows(field, terms)
    matched = rows.groupBy("segment_id").applyInPandas(
        _make_intervals_fn(source, terms, fmt=_fmt(reader)),
        schema="doc_id long",
    )
    dels = reader.deleted_df()
    if dels is not None:
        matched = matched.join(dels, "doc_id", "left_anti")
    return (
        matched.select(
            "doc_id", F.lit(1_000_000).cast("long").alias("score_x1e6")
        )
        .orderBy("doc_id")
        .limit(k)
    )


def drill_sideways(
    reader: IndexReader,
    field: str,
    term: str,
    selections: dict[str, str],
    dims: list[str],
    k_per_dim: int = 10,
) -> DataFrame:
    """DrillSideways (facet/DrillSideways.java): given a base query and
    per-dimension selections, count each dimension's values with every
    OTHER dimension's filter applied but its own removed — the counts a
    faceted UI shows next to the selected value.

    -> (dim, value, cnt) ordered by (dim, cnt DESC, value).
    One pass per dimension over the matched set (Lucene runs one
    DrillSidewaysScorer pass; relationally each dim is an independent
    groupBy over a differently-filtered semi-join — still
    broadcast-sized filters over one base match).

    A selection value may be a LIST: DrillDownQuery.add(dim, path)
    called repeatedly for one dim ORs the paths (DrillDownQuery.java
    'add' javadoc; MultiFacetQuery.java is the same disjunction) —
    multi-value dims become one IN predicate, still pushable."""
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    docs = reader.docs().join(matched, "doc_id", "left_semi")
    outs = []
    for dim in dims:
        d = docs
        for sdim, sval in selections.items():
            if sdim != dim:
                vals = (
                    list(sval)
                    if isinstance(sval, (list, tuple, set))
                    else [sval]
                )
                d = d.filter(F.col(sdim).isin(vals))
        outs.append(
            d.groupBy(F.col(dim).alias("value"))
            .agg(F.count("*").alias("cnt"))
            .withColumn("dim", F.lit(dim))
            .orderBy(F.col("cnt").desc(), F.col("value").asc())
            .limit(k_per_dim)
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.select("dim", "value", "cnt").orderBy(
        "dim", F.col("cnt").desc(), "value"
    )


def grouped_distinct_values(
    reader: IndexReader,
    field: str,
    term: str,
    group_col: str,
    value_col: str,
    k: int = 50,
) -> DataFrame:
    """DistinctValuesCollector (grouping module): per group, the count
    of distinct values of another field among matched docs.
    -> (grp, n_distinct)."""
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    docs = reader.docs().join(matched, "doc_id", "left_semi")
    return (
        docs.groupBy(F.col(group_col).alias("grp"))
        .agg(F.count_distinct(F.col(value_col)).alias("n_distinct"))
        .orderBy("grp")
        .limit(k)
    )


def combined_field_topk(
    reader: IndexReader,
    field_weights: dict[str, float],
    term: str,
    k: int = 10,
) -> DataFrame:
    """CombinedFieldQuery / BM25F-lite (CORE/search/CombinedFieldQuery):
    one term scored as if the weighted fields were a single field:

        freq'  = sum_f w_f * freq_{f,d}
        dl'_d  = sum_f w_f * dlq_{f,d}      (per-field quantized lengths)
        avgdl' = sum_f w_f * sum_ttf_f / N  (true lengths, field_stats)
        df'    = |docs matching in ANY field|
        score  = idf(df') * freq' / (freq' + k1*(1-b + b*dl'/avgdl'))

    (Deviation from Lucene documented: dl' uses the stored quantized
    per-field lengths rather than re-quantizing the weighted sum.)
    -> (doc_id, score_x1e6)."""
    fields = sorted(field_weights)
    coll0 = reader.collection_stats(fields[0])
    n = float(coll0.doc_count)
    avgdl = sum(
        field_weights[f] * reader.collection_stats(f).sum_total_term_freq / n
        for f in fields
    )
    # weighted freq per doc across fields
    parts = []
    for f in fields:
        ep = exploded_postings(reader, f, [term]).select(
            "doc_id", (F.col("freq") * F.lit(field_weights[f])).alias("wfreq")
        )
        parts.append(ep)
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    freqs = union.groupBy("doc_id").agg(F.sum("wfreq").alias("freq"))
    # weighted quantized doc length across fields (doclens join)
    dl = reader.doclens().filter(F.col("field").isin(fields))
    dlq = _length_table_col(F.col("doc_len_code"))
    wmap = F.create_map(*[x for f in fields for x in (F.lit(f), F.lit(field_weights[f]))])
    dlw = (
        dl.select("doc_id", (dlq * F.element_at(wmap, F.col("field"))).alias("wdl"))
        .groupBy("doc_id")
        .agg(F.sum("wdl").alias("dlc"))
    )
    # df' as a LAZY broadcast scalar (no eager .count() job mid-plan —
    # one Spark job for the whole query instead of two)
    dfp = freqs.agg(F.count("*").cast("double").alias("dfp"))
    idf = F.log(F.lit(1.0) + (F.lit(n) - F.col("dfp") + 0.5) / (F.col("dfp") + 0.5))
    j = freqs.join(dlw, "doc_id").crossJoin(F.broadcast(dfp))
    score = idf * F.col("freq") / (
        F.col("freq")
        + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * F.col("dlc") / F.lit(avgdl))
    )
    return (
        j.select("doc_id", F.round(score * 1e6).cast("long").alias("score_x1e6"))
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def blended_term_topk(
    reader: IndexReader,
    fields: list[str],
    term: str,
    k: int = 10,
) -> DataFrame:
    """BlendedTermQuery (CORE/search/BlendedTermQuery.java): one term
    across several fields with docFreq blended to the MAX across fields
    (so a rare field doesn't make its copy of the term look more
    important); per-field BM25 scores then sum (BooleanQueryRewrite).
    -> (doc_id, score_x1e6)."""
    import math

    dfs = {}
    for f in fields:
        st = reader.term_stats(f, [term])
        dfs[f] = st[term].doc_freq if term in st else 0
    df_blend = max(dfs.values() or [0])
    if df_blend == 0:
        return reader.spark.createDataFrame([], "doc_id long, score_x1e6 long")
    parts = []
    for f in fields:
        if dfs[f] == 0:
            continue
        coll = reader.collection_stats(f)
        n = float(coll.doc_count)
        avgdl = coll.sum_total_term_freq / n
        idf = math.log(1.0 + (n - df_blend + 0.5) / (df_blend + 0.5))
        ep = exploded_postings(reader, f, [term])
        dlq = _length_table_col(F.col("norm_code"))
        score = F.lit(idf) * F.col("freq") / (
            F.col("freq")
            + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * dlq / F.lit(avgdl))
        )
        parts.append(ep.select("doc_id", score.alias("s")))
    union = parts[0]
    for p in parts[1:]:
        union = union.unionByName(p)
    return (
        union.groupBy("doc_id")
        .agg(F.round(F.sum("s") * 1e6).cast("long").alias("score_x1e6"))
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def field_sort_search_after(
    reader: IndexReader,
    field: str,
    term: str,
    sort_col: str,
    after_val: int,
    after_doc: int,
    ascending: bool = False,
    k: int = 10,
) -> DataFrame:
    """searchAfter on a FIELD sort — IndexSearcher.searchAfter(FieldDoc,
    query, n, sort) / TopFieldCollector.create(sort, n, after, ...):
    only hits strictly after the (sort value, doc id) cursor in sort
    order compete; the doc-id tie-break matches the collector's
    after.doc comparison. Same TakeOrderedAndProject plan as
    field_sort_topk — the cursor predicate reaches the scan as a
    pushed-down filter, which is the whole point of searchAfter at
    scale (page N costs the same as page 1, no deep offset).
    -> (doc_id, sort_val)."""
    matched = exploded_postings(reader, field, [term]).select("doc_id").distinct()
    docs = reader.docs().join(matched, "doc_id", "left_semi")
    sc = F.col(sort_col)
    if ascending:
        cond = (sc > after_val) | (
            (sc == after_val) & (F.col("doc_id") > after_doc)
        )
        order = sc.asc()
    else:
        cond = (sc < after_val) | (
            (sc == after_val) & (F.col("doc_id") > after_doc)
        )
        order = sc.desc()
    return (
        docs.filter(cond)
        .select("doc_id", sc.cast("long").alias("sort_val"))
        .orderBy(order, F.col("doc_id").asc())
        .limit(k)
    )


def high_freq_terms(
    reader: IndexReader,
    field: str,
    n: int = 10,
    order_by: str = "ttf",
) -> DataFrame:
    """HighFreqTerms (misc/src/java/org/apache/lucene/misc/HighFreqTerms.java
    + TermStats.java): the N highest-frequency terms of a field, by
    total term frequency (the tool's -t flag) or by doc freq. Answered
    from the TERM DICTIONARY alone — per-segment (doc_freq,
    total_term_freq) pairs sum across segments; no postings decoded,
    the same O(vocabulary) pass the tool makes over TermsEnum.
    -> (term, df, ttf)."""
    if order_by not in ("ttf", "df"):
        raise ValueError("order_by must be 'ttf' or 'df'")
    agg = (
        reader.postings()
        .filter(F.col("field") == field)
        .groupBy("term")
        .agg(
            F.sum("doc_freq").cast("long").alias("df"),
            F.sum("total_term_freq").cast("long").alias("ttf"),
        )
    )
    key = F.col("ttf") if order_by == "ttf" else F.col("df")
    return agg.orderBy(key.desc(), F.col("term").asc()).limit(n)


def dv_multi_range_topk(
    reader: IndexReader,
    value_exprs: list[str],
    ranges: list[tuple],
    k: int = 20,
    id_col: str = "doc_id",
) -> DataFrame:
    """SortedNumeric/SortedSetDocValuesMultiRangeQuery (sandbox/search/
    DocValuesMultiRangeQuery.java + SortedNumericDocValuesMultiRange
    Query.java / SortedSetDocValuesMultiRangeQuery.java): a doc with a
    MULTI-VALUED docvalues field matches when ANY of its values falls
    in ANY of the ranges (the unioned-clause contract; numeric and
    bytes variants share it — bounds compare in the column's type).
    The multi-valued field is the array of ``value_exprs`` over the
    docs registry; matching is one F.exists over OR'd between-predicates
    — flat codegen, no explode, no shuffle before the top-k. Constant
    score. -> (doc_id, score_x1e6)."""
    arr = F.array(*[F.expr(e) for e in value_exprs])

    def in_any_range(v):
        out = None
        for lo, hi in ranges:
            c = (v >= F.lit(lo)) & (v <= F.lit(hi))
            out = c if out is None else (out | c)
        return out

    return (
        reader.docs()
        .filter(F.exists(arr, in_any_range))
        .select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.lit(1_000_000).cast("long").alias("score_x1e6"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def named_matches_topk(
    reader: IndexReader,
    field: str,
    named: dict[str, list[str]],
    k: int = 50,
) -> DataFrame:
    """NamedMatches (core/search/NamedMatches.java: wrapQuery +
    findNamedMatches): wrap each sub-query with a name, run the SHOULD
    union, and report PER DOCUMENT which named sub-queries matched —
    the "which clause fired" diagnostic ES-style named queries expose.
    Each named query here is a term conjunction (MUST of its terms).
    -> (doc_id, names, n_names) ordered by doc_id, first k.

    Scale shape: ONE postings scan for the union of all named terms
    (term-dictionary pushdown), a per-name distinct-term count (the
    conjunction test), then a single groupBy doc collect_set — two
    map-side-combined shuffles regardless of how many names there are.
    """
    all_terms = sorted({t for ts in named.values() for t in ts})
    ep = exploded_postings(reader, field, all_terms).select(
        "term", "doc_id"
    ).distinct()
    name_rows = [
        (name, t) for name, ts in named.items() for t in set(ts)
    ]
    spark = ep.sparkSession
    nm = spark.createDataFrame(name_rows, "name string, term string")
    need = nm.groupBy("name").count().withColumnRenamed("count", "need")
    hit = (
        ep.join(F.broadcast(nm), "term")
        .groupBy("doc_id", "name")
        .agg(F.countDistinct("term").alias("got"))
        .join(F.broadcast(need), "name")
        .filter(F.col("got") == F.col("need"))
    )
    return (
        hit.groupBy("doc_id")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("name")), ","
            ).alias("names"),
            F.countDistinct("name").alias("n_names"),
        )
        .orderBy("doc_id")
        .limit(k)
    )


def sort_rescore_topk(
    reader: IndexReader,
    field: str,
    term: str,
    sort_col: str,
    ascending: bool = False,
    first_n: int = 40,
    k: int = 10,
) -> DataFrame:
    """SortRescorer (core/search/SortRescorer.java): re-order the
    first-pass top-N by a Sort over a doc-values column; the returned
    hits keep their ORIGINAL first-pass scores
    (SortRescorer.java:64-66 copies scores from the input ScoreDocs).
    -> (doc_id, score_x1e6, v = the sort value), top k by
    (sort value, doc_id).  Second pass touches only first_n rows —
    broadcast-sized at any corpus scale."""
    first = (
        term_scored(reader, field, term)
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(first_n)
    )
    docs = reader.docs().select(
        "doc_id", F.col(sort_col).cast("long").alias("v")
    )
    srt = F.col("v").asc() if ascending else F.col("v").desc()
    return (
        first.join(docs, "doc_id")
        .orderBy(srt, F.col("doc_id").asc())
        .limit(k)
        .select("doc_id", "score_x1e6", "v")
    )


def dvs_rescore_topk(
    reader: IndexReader,
    field: str,
    term: str,
    value_expr: str,
    combine: str = "sum",
    first_n: int = 40,
    k: int = 10,
) -> DataFrame:
    """DoubleValuesSourceRescorer (core/search/
    DoubleValuesSourceRescorer.java): the first-pass top-N rescored by
    combine(firstPassScore, valuePresent, sourceValue) — the combine is
    the abstract injection point; the stock forms here are 'sum',
    'multiply' and 'replace'.  A NULL source value plays the
    advanceExact-false branch (valuePresent=false -> sourceValue 0).
    -> (doc_id, rescored_x1e6)."""
    first = (
        term_scored(reader, field, term)
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(first_n)
    )
    docs = reader.docs().selectExpr(
        "doc_id", f"CAST(({value_expr}) AS DOUBLE) AS src"
    )
    j = first.join(docs, "doc_id").withColumn(
        "srcv", F.coalesce(F.col("src"), F.lit(0.0))
    )
    s = F.col("score_x1e6") / 1e6
    if combine == "sum":
        res = s + F.col("srcv")
    elif combine == "multiply":
        res = s * F.col("srcv")
    elif combine == "replace":
        res = F.col("srcv")
    else:
        raise ValueError(f"unknown combine {combine!r}")
    return (
        j.select(
            "doc_id",
            F.round(res * 1e6).cast("long").alias("rescored_x1e6"),
        )
        .orderBy(F.col("rescored_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def indri_and_topk(
    reader: IndexReader,
    field: str,
    terms: list[str],
    boosts: list[float] | None = None,
    mu: float = 2000.0,
    k: int = 10,
) -> DataFrame:
    """IndriAndQuery (core/search/IndriAndQuery.java + IndriAndScorer
    .java:scoreDoc + IndriDisjunctionScorer.java): the Indri soft-AND —
    candidates are the UNION of the clause matches (a disjunction
    iterator), but EVERY clause contributes to every candidate's score:
    a clause whose term is present scores ln((tf + mu*P(w|C)) /
    (dlq + mu)) (IndriDirichletSimilarity.java:69-73, the engine's
    +1-smoothed collection model); an absent clause contributes its
    smoothingScore — the SAME formula with tf = 0 (the "idf-like"
    background probability).  Per-clause boosts weight the sum and the
    final score divides by the boost sum (IndriAndScorer.java:45-60).
    -> (doc_id, score_x1e6).

    Scale shape: ONE postings scan for all clause terms (pushed term
    set), candidates from a map-side-combined groupBy carrying the
    shared norm code, then |terms| broadcast-sized left joins of
    per-term tf frames — no per-row Python, codegen arithmetic."""
    if not terms:
        raise ValueError("IndriAndQuery needs at least one clause")
    if boosts is None:
        boosts = [1.0] * len(terms)
    if len(boosts) != len(terms):
        raise ValueError("boosts must align with terms")
    uniq = list(dict.fromkeys(terms))
    ep = exploded_postings(reader, field, uniq)
    # ONE decode pass, ONE map-side-combined shuffle: per-doc term
    # freqs come out of a conditional aggregation (tf_i = sum(freq
    # where term = t_i)) instead of per-term self-joins that would
    # re-decode the postings once per clause
    aggs = [F.first("norm_code").alias("norm_code")] + [
        F.sum(F.when(F.col("term") == t, F.col("freq"))).alias(f"tf_{i}")
        for i, t in enumerate(uniq)
    ]
    out = ep.groupBy("doc_id").agg(*aggs)
    dlq = _length_table_col(F.col("norm_code")).cast("double")
    out = out.withColumn("dlq", dlq)

    stats = reader.term_stats(field, uniq)
    coll = reader.collection_stats(field)
    sumttf = float(coll.sum_total_term_freq)

    idx_of = {t: i for i, t in enumerate(uniq)}
    score_terms = []
    for t, b in zip(terms, boosts):
        ttf = float(stats[t].total_term_freq) if t in stats else 0.0
        p_wc = (ttf + 1.0) / (sumttf + 1.0)
        tf = F.coalesce(F.col(f"tf_{idx_of[t]}"), F.lit(0)).cast("double")
        score_terms.append(
            F.lit(float(b))
            * F.log((tf + F.lit(mu * p_wc)) / (F.col("dlq") + F.lit(mu)))
        )
    total = score_terms[0]
    for s in score_terms[1:]:
        total = total + s
    total = total / F.lit(float(sum(boosts)))
    return (
        out.select(
            "doc_id",
            F.round(total * 1e6).cast("long").alias("score_x1e6"),
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def _wildcard_to_like(pattern: str) -> str:
    """Lucene wildcard (* any run, ? single char) -> SQL LIKE, escaping
    LIKE's own metacharacters."""
    out = []
    for ch in pattern:
        if ch == "*":
            out.append("%")
        elif ch == "?":
            out.append("_")
        elif ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "".join(out)


def docvalues_rewrite_topk(
    reader: IndexReader,
    dv_col: str,
    kind: str,
    pattern: str,
    k: int = 50,
) -> DataFrame:
    """DocValuesRewriteMethod (core/search/DocValuesRewriteMethod.java):
    a MultiTermQuery answered by PER-DOCUMENT verification of the
    pattern against a doc-values column instead of expanding the term
    dictionary through postings — constant score (the rewrite produces
    a ConstantScoreQuery; scores are 1.0 * boost).  kinds: ``prefix``,
    ``wildcard`` (Lucene * and ?), ``regexp`` (anchored full-match, the
    RegExp contract).  -> (doc_id, score_x1e6) first k by doc_id.

    Scale trade-off, exactly the reference's: the postings rewrite
    explodes on huge term sets (TooManyClauses) but touches only
    matching postings; the DV rewrite is ONE codegen predicate scan of
    the column — linear in docs, immune to term-set size.  Pair with
    IndexOrDocValuesQuery-style leads when a cheap pre-filter exists."""
    col = F.col(dv_col)
    if kind == "prefix":
        pred = col.startswith(pattern)
    elif kind == "wildcard":
        pred = col.like(_wildcard_to_like(pattern))
    elif kind == "regexp":
        pred = col.rlike(f"^(?:{pattern})$")
    else:
        raise ValueError(f"unknown multiterm kind {kind!r}")
    return (
        reader.docs()
        .filter(col.isNotNull() & pred)
        .select("doc_id", F.lit(1_000_000).cast("long").alias("score_x1e6"))
        .orderBy("doc_id")
        .limit(k)
    )
