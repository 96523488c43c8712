"""Classification over the index — the reference's classification/
module re-expressed Spark-first.

Two classifiers, both using the inverted index as the training set:

- ``knn_classify`` — KNearestNeighborClassifier.java: build a
  MoreLikeThis query from the input text, take the BM25 top-k, and
  vote the class field of the neighbours (score-weighted, normalized
  by k, with the sumdoc<k correction at
  KNearestNeighborClassifier.java:218-236).
- ``naive_bayes_classify`` — SimpleNaiveBayesClassifier.java: per
  class c, score = log-prior + add-one-smoothed log-likelihood of the
  input tokens, then softmax-normalized to (0,1]
  (SimpleNaiveBayesClassifier.java:140-158, 209-231, 293-318).

Scale shape: classification of one input is a term-pruned postings
scan (only the input's tokens) joined to the docs-registry class
column, aggregated down to n_classes rows — the same plan family as a
boolean query. No driver-side loops over documents; the only
driver-side work is tokenizing the (single) input text and ranking
its terms, both bounded by the input length.
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lucene_spark.search.executor import IndexReader
from lucene_spark.search.sqlpath import bool_bm25_topk, exploded_postings


def _tokenize(reader: IndexReader, text: str, tokenize=None) -> list[str]:
    """Tokenize the input with the index's own analyzer (the reference
    classifiers tokenize with the supplied Analyzer — matching the
    index contents is the caller's job there too)."""
    if tokenize is not None:
        return list(tokenize(text))
    from lucene_spark.analysis.analyzer import get_analyzer

    name = reader.manifest.get("analyzer", "standard")
    return list(get_analyzer(name).tokenize_one(text))


def mlt_terms_for_text(
    reader: IndexReader,
    text: str,
    field: str | None = None,
    max_terms: int = 5,
    tokenize=None,
) -> list[str]:
    """MoreLikeThis term selection over raw input text (the
    MoreLikeThis.java like(fieldName, Reader) path used by
    KNearestNeighborClassifier.java:156-179): rank the input's tokens
    by tf*idf against the index stats, keep the top ``max_terms``
    (ties by term ASC). Driver-side — the input is one document."""
    field = field or reader.manifest["field"]
    toks = _tokenize(reader, text, tokenize)
    if not toks:
        return []
    tf = Counter(toks)
    st = reader.term_stats(field, sorted(tf))
    coll = reader.collection_stats(field)
    n = float(coll.doc_count)
    scored = [
        (t, c * math.log(1.0 + (n - st[t].doc_freq + 0.5) / (st[t].doc_freq + 0.5)))
        for t, c in tf.items()
        if t in st
    ]
    scored.sort(key=lambda x: (-x[1], x[0]))
    return [t for t, _ in scored[:max_terms]]


def _knn_vote(topk: DataFrame, reader, class_col: str) -> DataFrame:
    """buildListFromTopDocs vote prep shared by the KNN classifiers:
    maxScore is topDocs.scoreDocs[0].score — the overall best hit
    whether or not it carries a class value (KNearestNeighbor
    Classifier.java:195) — so it is taken over the FULL top-k frame
    BEFORE the clazz-not-null filter; sumdoc counts only the labeled
    hits.  One unpartitioned window over <= k rows (tiny frame)."""
    maxed = topk.withColumn(
        "max_s", F.max("score_x1e6").over(Window.partitionBy())
    )
    labeled = maxed.join(
        reader.docs().select("doc_id", F.col(class_col).alias("clazz")),
        "doc_id",
    ).filter(F.col("clazz").isNotNull())
    return labeled.select(
        "clazz",
        (F.col("score_x1e6") / F.col("max_s")).alias("boost"),
        F.count("*").over(Window.partitionBy()).alias("sumdoc"),
    )


def knn_classify(
    reader: IndexReader,
    text: str,
    class_col: str,
    field: str | None = None,
    k: int = 10,
    max_terms: int = 5,
    tokenize=None,
) -> DataFrame:
    """KNearestNeighborClassifier: MLT query from ``text`` -> BM25
    top-k -> class vote. Per class c among the neighbours:

        boost_c = sum(score_i / maxScore)          (rank-position boost)
        score(c) = boost_c / k                     (.java:218-227)
        if sumdoc < k: score(c) *= k / sumdoc      (.java:229-233)

    i.e. score(c) = boost_c / min(k, sumdoc) for single-valued class
    fields. -> DataFrame(clazz, score_x1e6) ordered score DESC, clazz
    ASC. Votes are computed over the engine's rounded score_x1e6 so
    the result is bit-stable against the SQL oracle."""
    field = field or reader.manifest["field"]
    terms = mlt_terms_for_text(reader, text, field, max_terms, tokenize)
    spark = reader.spark
    if not terms:
        return spark.createDataFrame([], "clazz string, score_x1e6 long")
    topk = bool_bm25_topk(reader, field, should=terms, k=k)
    voted = _knn_vote(topk, reader, class_col)
    out = voted.groupBy("clazz", "sumdoc").agg(
        F.sum("boost").alias("bsum")
    ).select(
        "clazz",
        F.round(
            F.col("bsum")
            / F.least(F.lit(float(k)), F.col("sumdoc").cast("double"))
            * 1e6
        )
        .cast("long")
        .alias("score_x1e6"),
    )
    return out.orderBy(F.col("score_x1e6").desc(), F.col("clazz").asc())


def naive_bayes_classify(
    reader: IndexReader,
    text: str,
    class_col: str,
    field: str | None = None,
    tokenize=None,
) -> DataFrame:
    """SimpleNaiveBayesClassifier: for each class c,

        raw(c) = ln(df_c) - ln(docsWithClass)                  (prior)
               + sum over input tokens w (with multiplicity) of
                 ln((n_wc + 1) / (avgUniqueTerms * df_c + docsWithClass))

    where n_wc = #docs containing w with class c, avgUniqueTerms =
    sumDocFreq/docCount of the text field
    (SimpleNaiveBayesClassifier.java:209-258), followed by the
    softmax normalization to (0,1] (.java:293-318).

    -> DataFrame(clazz, score_x1e6) ordered score DESC, clazz ASC.
    The final softmax runs in an unpartitioned window over the
    n_classes aggregated rows — fine up to very large class
    vocabularies; everything upstream is term-pruned and
    shuffle-aggregated."""
    field = field or reader.manifest["field"]
    toks = _tokenize(reader, text, tokenize)
    spark = reader.spark
    if not toks:
        return spark.createDataFrame([], "clazz string, score_x1e6 long")
    coll = reader.collection_stats(field)
    avg_unique = float(reader.sum_doc_freq(field)) / float(coll.doc_count)

    docs = reader.docs().select(
        "doc_id", F.col(class_col).alias("clazz")
    ).filter(F.col("clazz").isNotNull())
    dels = reader.deleted_df()
    if dels is not None:
        docs = docs.join(dels, "doc_id", "left_anti")
    cls = docs.groupBy("clazz").agg(F.count("*").alias("df_c"))
    # docsWithClass as a lazy scalar (one extra tiny agg, no collect)
    dwc = docs.agg(F.count("*").alias("dwc"))

    # per-(class, input-term) doc counts: term-pruned postings join
    tf = Counter(toks)
    ep = exploded_postings(reader, field, sorted(tf)).select("term", "doc_id")
    wc = ep.join(docs, "doc_id").groupBy("clazz", "term").agg(
        F.count("*").alias("n_wc")
    )
    tfdf = spark.createDataFrame(
        [(t, int(c)) for t, c in sorted(tf.items())], "term string, tf int"
    )
    grid = (
        cls.crossJoin(F.broadcast(tfdf))
        .join(wc, ["clazz", "term"], "left")
        .fillna(0, subset=["n_wc"])
        .crossJoin(F.broadcast(dwc))
    )
    scored = grid.withColumn(
        "ll",
        F.col("tf")
        * F.log(
            (F.col("n_wc") + F.lit(1.0))
            / (F.lit(avg_unique) * F.col("df_c") + F.col("dwc"))
        ),
    )
    per_class = scored.groupBy("clazz", "df_c", "dwc").agg(
        F.sum("ll").alias("loglik")
    ).select(
        "clazz",
        (F.log(F.col("df_c").cast("double")) - F.log(F.col("dwc").cast("double"))
         + F.col("loglik")).alias("raw"),
    )
    # softmax over the (tiny) per-class frame: exp(raw - logsumexp)
    win = Window.partitionBy()
    smax = F.max("raw").over(win)
    lse = smax + F.log(F.sum(F.exp(F.col("raw") - smax)).over(win))
    out = per_class.select(
        "clazz",
        F.round(F.exp(F.col("raw") - lse) * 1e6).cast("long").alias("score_x1e6"),
    )
    return out.orderBy(F.col("score_x1e6").desc(), F.col("clazz").asc())


def bm25nb_classify(
    reader: IndexReader,
    text: str,
    class_field: str,
    text_field: str | None = None,
    tokenize=None,
) -> DataFrame:
    """BM25NBClassifier (classification/BM25NBClassifier.java): naive
    Bayes whose probabilities are BM25 top-1 scores instead of counts.
    Per class c (a term of the indexed ``class_field``):

        prior(c)  = ln(top-1 BM25 score of {MUST c})          (:171-183)
        P(w|c)    = top-1 BM25 score of {MUST c, SHOULD w}    (:147-169)
        raw(c)    = prior(c) + sum over input tokens (with
                    multiplicity) of ln(P(w|c))               (:139-145)

    then the softmax normalization shared with the other NB classifier
    (normClassificationResults, :101-123). Because SHOULD under a live
    MUST doesn't constrain matching, {MUST c, SHOULD w}'s top-1 equals
    max over docs of class c of cscore(doc,c) + wscore(doc,w) where a
    doc without w contributes wscore = 0 — so
    P(w|c) = greatest(M_c, max over docs of c containing w of
    (cscore + wscore)) with M_c = the prior max.

    Scale shape: one postings scan per field (class postings = one row
    per live doc; word postings term-pruned to the input vocabulary),
    one doc_id equi-join, two map-side-combined max/sum aggregations;
    the class vocabulary rides a tiny driver collect (the reference's
    TermsEnum loop over classes, bounded by label cardinality).
    -> DataFrame(clazz, score_x1e6) ordered score DESC, clazz ASC."""
    text_field = text_field or reader.manifest["field"]
    toks = _tokenize(reader, text, tokenize)
    spark = reader.spark
    if not toks:
        return spark.createDataFrame([], "clazz string, score_x1e6 long")
    classes = sorted(
        r["term"]
        for r in reader.term_stats_df()
        .filter(F.col("field") == class_field)
        .select("term").distinct().collect()
    )
    if not classes:
        return spark.createDataFrame([], "clazz string, score_x1e6 long")
    from lucene_spark.search.sqlpath import (
        _length_table_col,
        _score_col,
        _with_stats,
        exploded_postings,
    )

    def _scored(field: str, terms: list[str]) -> DataFrame:
        ep = exploded_postings(reader, field, terms)
        df_df, n, avgdl = _with_stats(reader, field, terms)
        dlq = _length_table_col(F.col("norm_code"))
        return ep.join(F.broadcast(df_df), "term").select(
            F.col("term"), F.col("doc_id"),
            _score_col(F.col("freq"), dlq, F.col("df"), n, avgdl)
            .alias("tscore"),
        )
    csc = _scored(class_field, classes).select(
        F.col("term").alias("clazz"), "doc_id",
        F.col("tscore").alias("cscore"),
    )
    tf = Counter(toks)
    wsc = _scored(text_field, sorted(tf)).select(
        F.col("term").alias("tok"), "doc_id",
        F.col("tscore").alias("wscore"),
    )
    mc = csc.groupBy("clazz").agg(F.max("cscore").alias("m_c"))
    inner = (
        csc.join(wsc, "doc_id")
        .groupBy("clazz", "tok")
        .agg(F.max(F.col("cscore") + F.col("wscore")).alias("i_cw"))
    )
    tfdf = spark.createDataFrame(
        [(t, int(c)) for t, c in sorted(tf.items())], "tok string, tf int"
    )
    grid = (
        mc.crossJoin(F.broadcast(tfdf))
        .join(inner, ["clazz", "tok"], "left")
        .select(
            "clazz", "m_c", "tf",
            F.greatest(F.col("m_c"), F.coalesce("i_cw", F.lit(0.0)))
            .alias("p_wc"),
        )
    )
    raw = grid.groupBy("clazz", "m_c").agg(
        F.sum(F.col("tf") * F.log("p_wc")).alias("loglik")
    ).select("clazz", (F.log("m_c") + F.col("loglik")).alias("raw"))
    win = Window.partitionBy()
    smax = F.max("raw").over(win)
    lse = smax + F.log(F.sum(F.exp(F.col("raw") - smax)).over(win))
    return raw.select(
        "clazz",
        F.round(F.exp(F.col("raw") - lse) * 1e6).cast("long")
        .alias("score_x1e6"),
    ).orderBy(F.col("score_x1e6").desc(), F.col("clazz").asc())


def knn_fuzzy_classify(
    reader: IndexReader,
    text: str,
    class_col: str,
    field: str | None = None,
    k: int = 10,
    tokenize=None,
) -> DataFrame:
    """KNearestFuzzyClassifier (classification/KNearestFuzzyClassifier
    .java + utils/NearestFuzzyQuery.java): the input is FUZZIFIED —
    each analyzed term enumerates fuzzy variants (maxEdits=1,
    prefixLength=2, top-50/term by FuzzyTermsEnum boost, rescored
    boost^2 * idf with the source term's df, global top-300:
    NearestFuzzyQuery.java:56-58,130-196, the FuzzyLikeThisQuery
    ladder) — then each variant scores per doc as
    ``variantScore * BM25(term, doc | artificial df = ttf = 1)``
    (newTermQuery, :202-216) summed per doc, plus the constant 1.0 of
    the class-exists wildcard MUST (knnSearch, :163-168). The top-k
    docs vote exactly like KNearestNeighborClassifier
    (buildListFromTopDocs): boost_c = sum(score/maxScore),
    score(c) = boost_c / min(k, sumdoc).

    Determinism: each per-(doc, variant) contribution is quantized to
    1e-6 before summation, and the vote runs over the rounded
    score_x1e6 — the engine and the SQL oracle add identical integers.
    Scale shape: variant enumeration rides the term-dictionary
    expansion; doc scoring is one term-pruned postings scan +
    broadcast boost join + map-side-combined sum; the vote is a window
    over <= k rows. -> DataFrame(clazz, score_x1e6)."""
    from lucene_spark.search.fuzzylikethis import _variant_scores
    from lucene_spark.search.sqlpath import (
        _length_table_col,
        _with_stats,
    )

    field = field or reader.manifest["field"]
    toks = _tokenize(reader, text, tokenize)
    spark = reader.spark
    empty = spark.createDataFrame([], "clazz string, score_x1e6 long")
    if not toks:
        return empty
    chosen = _variant_scores(
        reader, field, toks, max_num_terms=300, max_edits=1,
        prefix_length=2,
    )
    if not chosen:
        return empty
    boosts = spark.createDataFrame(chosen, "term string, s long")
    ep = exploded_postings(reader, field, [v for v, _ in chosen])
    _, n, avgdl = _with_stats(reader, field, [v for v, _ in chosen])
    dlq = _length_table_col(F.col("norm_code"))
    from lucene_spark.search.sqlpath import _score_col

    contrib = ep.join(F.broadcast(boosts), "term").select(
        "doc_id",
        F.round(
            (F.col("s") / 1e6)
            * _score_col(F.col("freq"), dlq, F.lit(1.0), n, avgdl) * 1e6
        ).cast("long").alias("c_x1e6"),
    )
    topk = (
        contrib.groupBy("doc_id")
        .agg((F.sum("c_x1e6") + F.lit(1_000_000)).alias("score_x1e6"))
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    voted = _knn_vote(topk, reader, class_col)
    out = voted.groupBy("clazz", "sumdoc").agg(
        F.sum("boost").alias("bsum")
    ).select(
        "clazz",
        F.round(
            F.col("bsum")
            / F.least(F.lit(float(k)), F.col("sumdoc").cast("double"))
            * 1e6
        ).cast("long").alias("score_x1e6"),
    )
    return out.orderBy(F.col("score_x1e6").desc(), F.col("clazz").asc())


def _all_postings_tf(reader: IndexReader, field: str) -> DataFrame:
    """(term, doc_id, freq) for EVERY term of ``field`` — the
    perceptron trains on the whole vocabulary, so no term-list prune
    (one decode pass over the postings table, Arrow-batched)."""
    from lucene_spark.search.sqlpath import _decode_udf, _fmt

    rows = reader.postings().filter(F.col("field") == field)
    dec = rows.select(
        "term", _decode_udf(_fmt(reader))("postings", "norms").alias("p")
    )
    out = dec.select(
        "term", F.explode(F.arrays_zip("p.docs", "p.freqs")).alias("e")
    ).select(
        "term", F.col("e.docs").alias("doc_id"), F.col("e.freqs").alias("freq")
    )
    dels = reader.deleted_df()
    if dels is not None:
        out = out.join(dels, "doc_id", "left_anti")
    return out


def boolean_perceptron_train(
    reader: IndexReader,
    class_col: str,
    true_value: str,
    field: str | None = None,
    epochs: int = 1,
) -> tuple[DataFrame, float]:
    """BooleanPerceptronClassifier training
    (classification/BooleanPerceptronClassifier.java:46-139), batch
    variant: weights initialize to each term's totalTermFreq (:46-52),
    bias = sumTotalTermFreq/docCount (:33-40); each epoch classifies
    EVERY labeled doc under the frozen weights (output = sum of
    tf*weight >= bias), then updates each term from its misclassified
    docs. The reference refreshes the frozen FST every ``batchSize``
    docs and OVERWRITES a term's weight per doc update
    (weights.put(max(0, frozenPrev + modifier*tf)), :96-126) — so
    within a batch the LAST updating doc wins; this analog is exactly
    that with batchSize = the whole pass (max_by doc_id), which is
    what makes the epoch order-free and distributable: one postings
    scan, one weight join (shuffle on term), one max_by aggregation.
    Weights never go negative (:121). -> (weights(term, w), bias)."""
    field = field or reader.manifest["field"]
    coll = reader.collection_stats(field)
    bias = coll.sum_total_term_freq / float(coll.doc_count)
    w = (
        reader.term_stats_df()
        .filter(F.col("field") == field)
        .select("term", F.col("total_term_freq").cast("long").alias("w"))
    )
    tfall = _all_postings_tf(reader, field)
    labels = reader.docs().select(
        "doc_id",
        (F.col(class_col) == F.lit(true_value)).alias("correct"),
    ).filter(F.col("correct").isNotNull())
    for _ in range(max(0, epochs)):
        outd = (
            tfall.join(w, "term")
            .groupBy("doc_id")
            .agg(F.sum(F.col("freq") * F.col("w")).alias("out"))
        )
        mis = (
            outd.join(labels, "doc_id")
            .withColumn("assigned", F.col("out") >= F.lit(bias))
            .filter(F.col("assigned") != F.col("correct"))
            .select(
                "doc_id",
                F.when(F.col("correct"), F.lit(1)).otherwise(F.lit(-1))
                .alias("modifier"),
            )
        )
        upd = (
            tfall.join(mis, "doc_id")
            .groupBy("term")
            .agg(
                F.max_by(
                    F.struct("modifier", "freq"), F.col("doc_id")
                ).alias("u")
            )
            .select(
                "term",
                (F.col("u.modifier") * F.col("u.freq")).alias("delta"),
            )
        )
        w = (
            w.join(upd, "term", "left")
            .select(
                "term",
                F.when(
                    F.col("delta").isNotNull(),
                    F.greatest(F.lit(0), F.col("w") + F.col("delta")),
                ).otherwise(F.col("w")).cast("long").alias("w"),
            )
        )
    return w, bias


def boolean_perceptron_classify(
    reader: IndexReader,
    weights: DataFrame,
    bias: float,
    text: str,
    tokenize=None,
) -> DataFrame:
    """assignClass (:147-164): output = sum of weights over the input's
    token OCCURRENCES; class = output >= bias;
    score = 1 - exp(-|bias - output| / bias). -> 1 row
    (assigned boolean, output long, score_x1e6 long)."""
    toks = _tokenize(reader, text, tokenize)
    spark = reader.spark
    if not toks:
        return spark.createDataFrame(
            [], "assigned boolean, output long, score_x1e6 long"
        )
    tf = Counter(toks)
    tfdf = spark.createDataFrame(
        [(t, int(c)) for t, c in sorted(tf.items())], "term string, tf int"
    )
    return (
        weights.join(F.broadcast(tfdf), "term")
        .agg(F.coalesce(F.sum(F.col("tf") * F.col("w")), F.lit(0))
             .cast("long").alias("output"))
        .select(
            (F.col("output") >= F.lit(bias)).alias("assigned"),
            "output",
            F.round(
                (F.lit(1.0)
                 - F.exp(-F.abs(F.lit(bias) - F.col("output")) / F.lit(bias)))
                * 1e6
            ).cast("long").alias("score_x1e6"),
        )
    )


class CachingNaiveBayesModel:
    """CachingNaiveBayesClassifier (classification/
    CachingNaiveBayesClassifier.java): SimpleNaiveBayes with the
    per-(class, term) doc counts PRECOMPUTED once (reTrainModel builds
    the word-class cache, :118-183) so repeated classifications skip
    the postings join. Spark mapping: the cache is a persisted
    (clazz, term, n_wc) frame over the WHOLE vocabulary plus the class
    frame and scalars — train once, classify many. Results are
    bit-identical to naive_bayes_classify (asserted in tests)."""

    def __init__(self, reader: IndexReader, class_col: str,
                 field: str | None = None):
        self.reader = reader
        self.field = field or reader.manifest["field"]
        coll = reader.collection_stats(self.field)
        self.avg_unique = (
            float(reader.sum_doc_freq(self.field)) / float(coll.doc_count)
        )
        docs = reader.docs().select(
            "doc_id", F.col(class_col).alias("clazz")
        ).filter(F.col("clazz").isNotNull())
        dels = reader.deleted_df()
        if dels is not None:
            docs = docs.join(dels, "doc_id", "left_anti")
        self.cls = docs.groupBy("clazz").agg(
            F.count("*").alias("df_c")
        ).persist()
        self.dwc = float(
            self.cls.agg(F.sum("df_c")).head()[0] or 0
        )
        wc_all = (
            _all_postings_tf(reader, self.field)
            .select("term", "doc_id")
            .join(docs, "doc_id")
            .groupBy("clazz", "term")
            .agg(F.count("*").alias("n_wc"))
        )
        self.wc = wc_all.persist()
        self.wc.count()  # materialize the cache (reTrainModel)

    def classify(self, text: str, tokenize=None) -> DataFrame:
        """Same math as naive_bayes_classify, joined against the
        cached counts — no postings scan per query."""
        toks = _tokenize(self.reader, text, tokenize)
        spark = self.reader.spark
        if not toks:
            return spark.createDataFrame([], "clazz string, score_x1e6 long")
        tf = Counter(toks)
        tfdf = spark.createDataFrame(
            [(t, int(c)) for t, c in sorted(tf.items())], "term string, tf int"
        )
        grid = (
            self.cls.crossJoin(F.broadcast(tfdf))
            .join(self.wc, ["clazz", "term"], "left")
            .fillna(0, subset=["n_wc"])
        )
        scored = grid.withColumn(
            "ll",
            F.col("tf")
            * F.log(
                (F.col("n_wc") + F.lit(1.0))
                / (F.lit(self.avg_unique) * F.col("df_c") + F.lit(self.dwc))
            ),
        )
        per_class = scored.groupBy("clazz", "df_c").agg(
            F.sum("ll").alias("loglik")
        ).select(
            "clazz",
            (F.log(F.col("df_c").cast("double")) - F.lit(math.log(self.dwc))
             + F.col("loglik")).alias("raw"),
        )
        win = Window.partitionBy()
        smax = F.max("raw").over(win)
        lse = smax + F.log(F.sum(F.exp(F.col("raw") - smax)).over(win))
        return per_class.select(
            "clazz",
            F.round(F.exp(F.col("raw") - lse) * 1e6).cast("long")
            .alias("score_x1e6"),
        ).orderBy(F.col("score_x1e6").desc(), F.col("clazz").asc())

    def classify_df(
        self, docs: DataFrame, id_col: str, text_col: str
    ) -> DataFrame:
        """Distributed batch classification — EVERY input row argmaxed
        in one plan (the shape ConfusionMatrixGenerator needs: the
        reference loops classify() per doc on an executor pool,
        ConfusionMatrixGenerator.java:75-120; at 100 TB that loop is a
        groupBy). Tokenization is the index analyzer's own vectorized
        pandas path, so tokens match classify() exactly.
        -> (id_col, clazz) with the same (max raw, min clazz) argmax
        tie-break as the single-text path."""
        from pyspark.sql import types as T

        from lucene_spark.analysis.analyzer import get_analyzer

        name = self.reader.manifest.get("analyzer", "standard")

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def toks(s):
            return get_analyzer(name).tokenize(s)

        tf = (
            docs.select(F.col(id_col).alias("_id"), toks(F.col(text_col)).alias("_t"))
            .select("_id", F.explode("_t").alias("term"))
            .groupBy("_id", "term")
            .agg(F.count("*").alias("tf"))
        )
        grid = (
            tf.crossJoin(F.broadcast(self.cls))
            .join(self.wc, ["clazz", "term"], "left")
            .fillna(0, subset=["n_wc"])
        )
        scored = grid.withColumn(
            "ll",
            F.col("tf")
            * F.log(
                (F.col("n_wc") + F.lit(1.0))
                / (F.lit(self.avg_unique) * F.col("df_c") + F.lit(self.dwc))
            ),
        )
        per = scored.groupBy("_id", "clazz", "df_c").agg(
            F.sum("ll").alias("loglik")
        ).select(
            "_id", "clazz",
            (F.log(F.col("df_c").cast("double")) - F.lit(math.log(self.dwc))
             + F.col("loglik")).alias("raw"),
        )
        w = Window.partitionBy("_id").orderBy(
            F.col("raw").desc(), F.col("clazz").asc()
        )
        return (
            per.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select(F.col("_id").alias(id_col), "clazz")
        )

    def unpersist(self) -> None:
        self.cls.unpersist()
        self.wc.unpersist()


def confusion_matrix_df(
    pred: DataFrame, actual_col: str = "actual", predicted_col: str = "predicted"
) -> DataFrame:
    """Linearized confusion matrix (classification/utils/
    ConfusionMatrixGenerator.java:163-180): keys are the CORRECT
    answers, values the predicted answers' counts. One
    map-side-combined groupBy. -> (actual, predicted, cnt)."""
    return (
        pred.groupBy(
            F.col(actual_col).alias("actual"),
            F.col(predicted_col).alias("predicted"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy("actual", "predicted")
    )


class ConfusionMatrix:
    """Metric surface of ConfusionMatrixGenerator.ConfusionMatrix
    (ConfusionMatrixGenerator.java:183-320), replicated formula-exact —
    including the idiosyncratic accuracy denominator that counts a
    'tn' unit per (class, actual-row) pair whose row lacks the class,
    and the >0 guards that zero precision/recall/F1 instead of NaN.
    Operates on the COLLECTED matrix (|classes|^2 rows — driver-tiny
    regardless of corpus size; the corpus-sized work happened in
    confusion_matrix_df's one groupBy)."""

    def __init__(self, matrix_df: DataFrame):
        self.m: dict[str, dict[str, int]] = {}
        for r in matrix_df.collect():
            self.m.setdefault(r["actual"], {})[r["predicted"]] = int(r["cnt"])

    def precision(self, klass: str) -> float:
        classifications = self.m.get(klass)
        tp = den = 0.0
        if classifications is not None:
            tp = float(classifications.get(klass, 0))
            for values in self.m.values():
                if klass in values:
                    den += values[klass]
        return tp / den if tp > 0 else 0.0

    def recall(self, klass: str) -> float:
        classifications = self.m.get(klass)
        tp = fn = 0.0
        if classifications is not None:
            for pred, cnt in classifications.items():
                if pred == klass:
                    tp += cnt
                else:
                    fn += cnt
        return tp / (tp + fn) if tp + fn > 0 else 0.0

    def f1(self, klass: str) -> float:
        r, p = self.recall(klass), self.precision(klass)
        return 2 * p * r / (p + r) if p > 0 and r > 0 else 0.0

    def macro_precision(self) -> float:
        return sum(self.precision(k) for k in self.m) / len(self.m)

    def macro_recall(self) -> float:
        return sum(self.recall(k) for k in self.m) / len(self.m)

    def macro_f1(self) -> float:
        r, p = self.macro_recall(), self.macro_precision()
        return 2 * p * r / (p + r) if p > 0 and r > 0 else 0.0

    def accuracy(self) -> float:
        tp = tn = tfp = fn = 0.0
        for klass, values in self.m.items():
            for pred, cnt in values.items():
                if pred == klass:
                    tp += cnt
                else:
                    fn += cnt
            for row in self.m.values():
                if klass in row:
                    tfp += row[klass]
                else:
                    tn += 1
        return (tp + tn) / (tfp + fn + tn)


def dataset_splitter(
    docs: DataFrame,
    class_col: str,
    test_ratio: float,
    cv_ratio: float,
    order_col: str = "doc_id",
) -> DataFrame:
    """DatasetSplitter (classification/utils/DatasetSplitter.java:
    136-166): per-CLASS (stratified) deterministic split. The reference
    walks each class's docs with a counter b, sending even-b docs to
    test while test is under totalHits*testRatio, then filling cv, then
    train. That sequential walk has a closed form — even b goes to test
    iff b/2 < testSize; cv fills in walk order among the remaining docs
    while under cvSize — so the split is two window ranks per class:
    one shuffle, no driver iteration, identical assignments.
    -> docs + 'split' column in {'test', 'cv', 'train'}."""
    cw = Window.partitionBy(class_col).orderBy(F.col(order_col).asc())
    total = F.count("*").over(Window.partitionBy(class_col))
    b = F.row_number().over(cw) - 1
    test_size = total * float(test_ratio)
    cv_size = total * float(cv_ratio)
    is_test = ((b % 2) == 0) & ((b / 2) < test_size)
    with_b = docs.withColumn("_b", b).withColumn("_istest", is_test) \
                 .withColumn("_cvsize", cv_size)
    ntw = Window.partitionBy(class_col).orderBy(F.col("_b").asc())
    nt_rank = F.sum(F.when(~F.col("_istest"), 1).otherwise(0)).over(ntw)
    split = (
        F.when(F.col("_istest"), F.lit("test"))
        .when((nt_rank - 1) < F.col("_cvsize"), F.lit("cv"))
        .otherwise(F.lit("train"))
    )
    return with_b.withColumn("split", split).drop("_b", "_istest", "_cvsize")


def _parse_field_boosts(fields: list[str]) -> list[tuple[str, float]]:
    """'title^2' -> ('title', 2.0) (the DocumentClassifier field-boost
    notation, KNearestNeighborDocumentClassifier.java:102-108)."""
    out = []
    for f in fields:
        if "^" in f:
            name, _, b = f.partition("^")
            out.append((name, float(b)))
        else:
            out.append((f, 1.0))
    return out


def knn_classify_document(
    reader: IndexReader,
    doc: dict[str, str],
    class_col: str,
    fields: list[str],
    k: int = 10,
    max_terms: int = 5,
    tokenize=None,
) -> DataFrame:
    """KNearestNeighborDocumentClassifier (classification/document/
    KNearestNeighborDocumentClassifier.java knnSearch:118-139): the
    multi-FIELD variant of the kNN classifier — per text field, MLT
    term selection runs on THAT field's content against THAT field's
    statistics (the per-field analyzer slot is ``tokenize``), the
    per-field term clauses are SHOULD-combined, and a trailing
    '^boost' on a field name multiplies that field's contribution
    (mlt.setBoostFactor).  Neighbour voting is the base classifier's
    rank vote (KNearestNeighborClassifier.java:218-233).
    -> (clazz, score_x1e6) ordered score DESC, clazz ASC.

    Scale shape: one term-pruned scored frame per (field, term) —
    shared postings scan per field — summed per doc in a single
    map-side-combined groupBy; the vote runs over <= k rows."""
    from lucene_spark.search.sqlpath import term_scored

    fb = _parse_field_boosts(fields)
    spark = reader.spark
    scored_parts = []
    for fname, boost in fb:
        content = doc.get(fname, "")
        terms = mlt_terms_for_text(
            reader, content, fname, max_terms, tokenize
        )
        for t in terms:
            s = term_scored(reader, fname, t).select(
                "doc_id",
                (F.col("score_x1e6") * F.lit(float(boost))).alias("s"),
            )
            scored_parts.append(s)
    if not scored_parts:
        return spark.createDataFrame([], "clazz string, score_x1e6 long")
    allsc = scored_parts[0]
    for p in scored_parts[1:]:
        allsc = allsc.unionByName(p)
    topk = (
        allsc.groupBy("doc_id")
        .agg(F.round(F.sum("s")).cast("long").alias("score_x1e6"))
        .orderBy(F.col("score_x1e6").desc(), F.col("doc_id").asc())
        .limit(k)
    )
    voted = _knn_vote(topk, reader, class_col)
    out = voted.groupBy("clazz", "sumdoc").agg(
        F.sum("boost").alias("bsum")
    ).select(
        "clazz",
        F.round(
            F.col("bsum")
            / F.least(F.lit(float(k)), F.col("sumdoc").cast("double"))
            * 1e6
        )
        .cast("long")
        .alias("score_x1e6"),
    )
    return out.orderBy(F.col("score_x1e6").desc(), F.col("clazz").asc())


def naive_bayes_classify_document(
    reader: IndexReader,
    doc: dict[str, str],
    class_col: str,
    fields: list[str],
    tokenize=None,
) -> DataFrame:
    """SimpleNaiveBayesDocumentClassifier (classification/document/
    SimpleNaiveBayesDocumentClassifier.java assignNormClasses:109-137):
    classScore(c) = sum over fields of
    [ logPrior(c) + logLikelihood(field tokens | c, field) * boost ]
    — the prior is added once PER FIELD (the reference's exact loop
    shape, .java:126-129), each field's likelihood uses that field's
    own statistics, and a '^boost' suffix multiplies only the
    likelihood.  Softmax normalization as in the single-field
    classifier.  -> (clazz, score_x1e6) ordered score DESC, clazz ASC.
    """
    spark = reader.spark
    fb = _parse_field_boosts(fields)
    docs = reader.docs().select(
        "doc_id", F.col(class_col).alias("clazz")
    ).filter(F.col("clazz").isNotNull())
    dels = reader.deleted_df()
    if dels is not None:
        docs = docs.join(dels, "doc_id", "left_anti")
    cls = docs.groupBy("clazz").agg(F.count("*").alias("df_c"))
    dwc = docs.agg(F.count("*").alias("dwc"))

    n_fields_with_tokens = 0
    ll_parts = []
    for fname, boost in fb:
        toks = _tokenize(reader, doc.get(fname, ""), tokenize)
        if not toks:
            continue
        n_fields_with_tokens += 1
        coll = reader.collection_stats(fname)
        avg_unique = float(reader.sum_doc_freq(fname)) / float(
            coll.doc_count
        )
        tf = Counter(toks)
        ep = exploded_postings(reader, fname, sorted(tf)).select(
            "term", "doc_id"
        )
        wc = ep.join(docs, "doc_id").groupBy("clazz", "term").agg(
            F.count("*").alias("n_wc")
        )
        tfdf = spark.createDataFrame(
            [(t, int(c)) for t, c in sorted(tf.items())],
            "term string, tf int",
        )
        grid = (
            cls.crossJoin(F.broadcast(tfdf))
            .join(wc, ["clazz", "term"], "left")
            .fillna(0, subset=["n_wc"])
            .crossJoin(F.broadcast(dwc))
        )
        ll = grid.select(
            "clazz",
            (
                F.col("tf")
                * F.log(
                    (F.col("n_wc") + F.lit(1.0))
                    / (
                        F.lit(avg_unique) * F.col("df_c")
                        + F.col("dwc")
                    )
                )
                * F.lit(float(boost))
            ).alias("ll"),
        )
        ll_parts.append(ll)
    if not ll_parts:
        return spark.createDataFrame([], "clazz string, score_x1e6 long")
    allll = ll_parts[0]
    for p in ll_parts[1:]:
        allll = allll.unionByName(p)
    # prior added once per field-with-tokens (the reference loop shape)
    raw = (
        allll.groupBy("clazz")
        .agg(F.sum("ll").alias("llsum"))
        .join(cls, "clazz")
        .crossJoin(F.broadcast(dwc))
        .select(
            "clazz",
            (
                F.lit(float(n_fields_with_tokens))
                * (F.log(F.col("df_c")) - F.log(F.col("dwc")))
                + F.col("llsum")
            ).alias("raw"),
        )
    )
    # normClassificationResults: the same logsumexp softmax as the
    # single-field classifier
    win = Window.partitionBy()
    smax = F.max("raw").over(win)
    lse = smax + F.log(F.sum(F.exp(F.col("raw") - smax)).over(win))
    out = raw.select(
        "clazz",
        F.round(F.exp(F.col("raw") - lse) * 1e6).cast("long").alias(
            "score_x1e6"
        ),
    )
    return out.orderBy(F.col("score_x1e6").desc(), F.col("clazz").asc())
