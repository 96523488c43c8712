"""AnalyzingSuggester / FuzzySuggester — the suggest/analyzing pair
(suggest/src/java/org/apache/lucene/search/suggest/analyzing/
AnalyzingSuggester.java, FuzzySuggester.java).

Reference semantics: the suggester is built from (surface, weight)
input pairs; each surface is ANALYZED and the analyzed form becomes the
lookup key (AnalyzingSuggester.java class doc: "the underlying analyzed
form used for suggestions is separate from the surface form"), so a
typed query matches through the same analysis chain (case, stemming,
stopwords) while the ORIGINAL surface text is returned, best weight
first. FuzzySuggester additionally tolerates up to ``max_edits``
Levenshtein edits between the analyzed query and a PREFIX of the
analyzed key, with the first ``non_fuzzy_prefix`` characters required
to match exactly and queries shorter than ``min_fuzzy_length`` handled
exactly (FuzzySuggester.java DEFAULT_* constants: maxEdits=1,
nonFuzzyPrefix=1, minFuzzyLength=3).

Spark mapping: the reference compiles the dictionary into an FST and
intersects it with a (Levenshtein) automaton; relationally the
dictionary is a DataFrame with a computed ``_key`` column (one
Arrow-batched analysis pass), the prefix walk is a ``startswith``
predicate over the sorted key column (row-group pruned), and the fuzzy
automaton becomes a prefix-edit-distance bound — evaluated JVM-side as
``least(levenshtein(query, substr(key, 1, L)))`` over the feasible
prefix lengths L in [len(q)-max_edits, len(q)+max_edits] (exact: any
optimal prefix has length within max_edits of the query's). Suggestion
dictionaries grow ~log(corpus), so at 100 TB this stays a
broadcast-sized side table; nothing here shuffles.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from lucene_spark.analysis import get_analyzer


def _with_key(
    suggestions: DataFrame, analyzer: str, surface_col: str
) -> DataFrame:
    """Append the analyzed-form key column: tokens joined by a space
    (the reference's SEP_LABEL between analyzed tokens)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        an = get_analyzer(analyzer)
        for pdf in batches:
            pdf = pdf.copy()
            pdf["_key"] = [
                " ".join(toks) for toks in an.tokenize(pdf[surface_col])
            ]
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in suggestions.schema.fields
    )
    return suggestions.mapInPandas(run, schema=schema + ", _key string")


def _analyze_query(analyzer: str, typed: str) -> str:
    return " ".join(get_analyzer(analyzer).tokenize_one(typed))


def file_dictionary(spark, path: str, delimiter: str = "\t") -> DataFrame:
    """FileDictionary (suggest/FileDictionary.java:38-66): plain-text
    suggestion entries, one per line — ``suggestion [delim weight
    [delim payload]]`` — with weight defaulting to 1 when absent.
    Parsed distributed (spark.read.text + one split projection), so a
    100-TB dictionary never routes through the driver.
    -> (surface, weight, payload)."""
    parts = F.split(F.col("value"), re.escape(delimiter))
    return spark.read.text(path).select(
        F.get(parts, 0).alias("surface"),
        F.coalesce(F.get(parts, 1).cast("long"), F.lit(1)).alias("weight"),
        F.coalesce(F.get(parts, 2), F.lit("")).alias("payload"),
    )


def suggest_stop_key(
    typed: str, stop_words, analyzer: str = "simple"
) -> str:
    """SuggestStopFilter (suggest/analyzing/SuggestStopFilter.java:
    30-115): StopFilter for the QUERY side of a suggester that KEEPS a
    final stopword not followed by a token separator — 'find the'
    preserves 'the' (the user may be mid-word: 'theory'), 'find the '
    (trailing separator) and 'find the popsicle' drop it. The
    preserved token is keyword-marked in the reference so stemmers
    skip it; here the returned key is final. Detection mirrors the
    reference exactly: the stopword survives iff its end offset equals
    the stream's final offset (= len(typed))."""
    an = get_analyzer(analyzer)
    toks, _starts, ends = an.tokenize_with_offsets_one(typed)
    stop = {s.lower() for s in stop_words}
    out = [
        t for i, t in enumerate(toks)
        if t not in stop
        or (i == len(toks) - 1 and ends[i] == len(typed))
    ]
    return " ".join(out)


def analyzing_suggest(
    suggestions: DataFrame,
    typed: str,
    analyzer: str = "simple",
    k: int = 5,
    surface_col: str = "surface",
    weight_col: str = "weight",
    stop_words=None,
) -> DataFrame:
    """-> (surface, weight), weight DESC then surface ASC top-k, for
    dictionary entries whose analyzed key starts with the analyzed
    query (AnalyzingSuggester.lookup: exactFirst/prefix walk).

    ``stop_words`` wires the reference's suggester stop setup
    (SuggestStopFilter javadoc): the DICTIONARY side drops every
    stopword (ordinary StopFilter in the index analyzer), the QUERY
    side keeps a final partially-typed stopword (suggest_stop_key)."""
    if stop_words is not None:
        qkey = suggest_stop_key(typed, stop_words, analyzer)
        stop = sorted({s.lower() for s in stop_words})
        keyed = _with_key(suggestions, analyzer, surface_col).withColumn(
            "_key",
            F.array_join(
                F.filter(
                    F.split(F.col("_key"), " "),
                    lambda t: ~t.isin(stop),
                ),
                " ",
            ),
        )
        return (
            keyed.filter(F.col("_key").startswith(qkey))
            .select(
                F.col(surface_col).alias("surface"),
                F.col(weight_col).alias("weight"),
            )
            .orderBy(F.col("weight").desc(), F.col("surface").asc())
            .limit(k)
        )
    qkey = _analyze_query(analyzer, typed)
    keyed = _with_key(suggestions, analyzer, surface_col)
    return (
        keyed.filter(F.col("_key").startswith(qkey))
        .select(F.col(surface_col).alias("surface"), F.col(weight_col).alias("weight"))
        .orderBy(F.col("weight").desc(), F.col("surface").asc())
        .limit(k)
    )


def fuzzy_suggest(
    suggestions: DataFrame,
    typed: str,
    analyzer: str = "simple",
    max_edits: int = 1,
    non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
    k: int = 5,
    surface_col: str = "surface",
    weight_col: str = "weight",
) -> DataFrame:
    """-> (surface, distance, weight): entries whose analyzed key has a
    prefix within ``max_edits`` of the analyzed query; exact-prefix
    matches report distance 0. Ranked weight DESC, surface ASC (the
    reference ranks by weight too — edits do not demote)."""
    if max_edits > 2:
        raise ValueError("max_edits <= 2 (LevenshteinAutomata.java:31)")
    qkey = _analyze_query(analyzer, typed)
    keyed = _with_key(suggestions, analyzer, surface_col)
    exact = F.col("_key").startswith(qkey)
    if len(qkey) < min_fuzzy_length:
        cond = exact
        dist = F.lit(0)
    else:
        qlit = F.lit(qkey)
        peds = [
            F.levenshtein(qlit, F.substring(F.col("_key"), 1, L))
            for L in range(
                max(non_fuzzy_prefix, len(qkey) - max_edits),
                len(qkey) + max_edits + 1,
            )
        ]
        ped = F.least(*peds) if len(peds) > 1 else peds[0]
        same_pfx = F.substring(F.col("_key"), 1, non_fuzzy_prefix) == F.lit(
            qkey[:non_fuzzy_prefix]
        )
        cond = exact | (same_pfx & (ped <= max_edits))
        dist = F.when(exact, F.lit(0)).otherwise(ped)
    return (
        keyed.filter(cond)
        .select(
            F.col(surface_col).alias("surface"),
            dist.cast("int").alias("distance"),
            F.col(weight_col).alias("weight"),
        )
        .orderBy(F.col("weight").desc(), F.col("surface").asc())
        .limit(k)
    )


def document_dictionary(
    docs: DataFrame,
    term_col: str,
    weight_col: str | None = None,
    weight_expr: str | None = None,
) -> DataFrame:
    """Suggester dictionary fed from stored documents
    (suggest/DocumentDictionary.java; with ``weight_expr`` it is
    DocumentValueSourceDictionary.java — weight computed by an
    expression over the document instead of a stored field).

    Each document contributes its ``term_col`` value as a suggestion
    surface; NULL terms are skipped (the InputIterator contract).
    Duplicate surfaces keep their max weight — exactly what the
    suggesters' weight-ranked lookup observes — so the dictionary is
    one map-side-combined aggregation. -> (surface, weight), the input
    shape of analyzing_suggest / fuzzy_suggest."""
    if weight_expr is not None:
        w = F.expr(weight_expr)
    elif weight_col is not None:
        w = F.col(weight_col)
    else:
        w = F.lit(1)
    return (
        docs.filter(F.col(term_col).isNotNull())
        .select(
            F.col(term_col).cast("string").alias("surface"),
            w.cast("long").alias("weight"),
        )
        .groupBy("surface")
        .agg(F.max("weight").alias("weight"))
    )


def blended_infix_suggest(
    suggestions: DataFrame,
    typed: str,
    blender: str = "linear",
    exponent: float = 2.0,
    analyzer: str = "simple",
    k: int = 5,
    surface_col: str = "surface",
    weight_col: str = "weight",
) -> DataFrame:
    """BlendedInfixSuggester (suggest/analyzing/BlendedInfixSuggester
    .java): infix suggestions whose score BLENDS the stored weight with
    the POSITION of the first matched token — linear
    ``weight*(1 - 0.10*position)``, reciprocal ``weight/(1+position)``,
    exponential_reciprocal ``weight/(1+position)^exponent`` (:21-29,
    :246-263); coefficient 1 when the analyzed key starts with the
    query (:177-181); weight 0 -> 1 and |weight| < 1/0.10 scales by
    1/0.10 before blending (:182-188); score = long(weight*coef).
    Matching = any analyzed token prefix-matches the typed fragment
    (the reference's prefixToken path for a partial last token).
    -> (surface, score) score DESC, surface ASC top-k. One narrow
    tokenize pass + a posexplode aggregation — no shuffle beyond the
    min-position groupBy."""
    qkey = _analyze_query(analyzer, typed)
    keyed = _with_key(suggestions, analyzer, surface_col)
    toks = keyed.select(
        surface_col, weight_col, "_key",
        F.posexplode(F.split(F.col("_key"), " ")).alias("pos", "tok"),
    )
    matched = (
        toks.filter(F.col("tok").startswith(qkey))
        .groupBy(surface_col, weight_col, "_key")
        .agg(F.min("pos").alias("position"))
    )
    w = F.col(weight_col).cast("double")
    w = F.when(w == 0, F.lit(1.0)).otherwise(w)
    w = F.when((w < 10.0) & (w > -10.0), w * 10.0).otherwise(w)
    if blender == "linear":
        coef = F.lit(1.0) - F.lit(0.10) * F.col("position")
    elif blender == "reciprocal":
        coef = F.lit(1.0) / (F.lit(1.0) + F.col("position"))
    elif blender == "exponential_reciprocal":
        coef = F.lit(1.0) / F.pow(
            F.lit(1.0) + F.col("position"), F.lit(float(exponent))
        )
    else:
        raise ValueError(f"unknown blender {blender!r}")
    coef = F.when(F.col("_key").startswith(qkey), F.lit(1.0)).otherwise(coef)
    return (
        matched.select(
            F.col(surface_col).alias("surface"),
            F.floor(w * coef).cast("long").alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("surface").asc())
        .limit(k)
    )


def fst_completion_build(
    entries: DataFrame, buckets: int = 10
) -> DataFrame:
    """FSTCompletionLookup.build (suggest/fst/FSTCompletionLookup.java:
    185-240): weights are DISCRETIZED — entries sorted by weight
    ascending, bucket = line * buckets / count, with equal weights
    sharing the bucket of their run's first line. That per-line rule
    collapses to a per-weight value: bucket(w) = (count of entries with
    strictly smaller weight) * buckets div n — which is how it's
    computed here without a global sort. Shape: one weight-histogram
    groupBy (the only shuffle over the dictionary), a cumulative window
    over the tiny distinct-weight table, and a broadcast join back.
    ``entries`` = (term, weight) -> adds ``bucket``."""
    from pyspark.sql.window import Window

    n = entries.count()
    if n == 0:
        return entries.withColumn("bucket", F.lit(0).cast("long"))
    wc = entries.groupBy("weight").agg(F.count("*").alias("c"))
    w = Window.orderBy("weight").rowsBetween(Window.unboundedPreceding, -1)
    cum = wc.withColumn(
        "cnt_lt", F.coalesce(F.sum("c").over(w), F.lit(0))
    ).select(
        "weight",
        F.expr(f"(cnt_lt * {int(buckets)}) div {int(n)}")
        .cast("long")
        .alias("bucket"),
    )
    return entries.join(F.broadcast(cum), "weight").select(
        "term", "weight", "bucket"
    )


def fst_completion_lookup(
    built: DataFrame, key: str, num: int = 5, exact_first: bool = True
) -> DataFrame:
    """FSTCompletion.lookup (suggest/fst/FSTCompletion.java:148-199,
    higher-weights-first mode): prefix matches ordered by bucket
    descending, then alphabetically within a bucket (the FST walk is
    lexicographic per root arc); ``exact_first`` promotes the exact
    key to the top across buckets (checkExistingAndReorder).
    -> (term, bucket)."""
    m = built.filter(F.col("term").startswith(key))
    order = [F.col("bucket").desc(), F.col("term").asc()]
    if exact_first:
        order = [(F.col("term") == key).desc()] + order
    return m.select("term", "bucket").orderBy(*order).limit(num)


def wfst_lookup(
    entries: DataFrame, key: str, num: int = 5, exact_first: bool = True
) -> DataFrame:
    """WFSTCompletionLookup.lookup (suggest/fst/WFSTCompletionLookup.
    java:151-214): EXACT long weights (no discretization — the class
    doc's stated contrast with FSTCompletionLookup), results by weight
    descending via shortest-path over cost = MAX - weight, ties broken
    by the lexicographic order of the remaining suffix; ``exact_first``
    pops the exact key first. TSTLookup and the deprecated
    JaspellLookup share this exact-weight contract and are subsumed by
    the same scan. -> (term, weight)."""
    m = entries.filter(F.col("term").startswith(key))
    order = [F.col("weight").desc(), F.col("term").asc()]
    if exact_first:
        order = [(F.col("term") == key).desc()] + order
    return m.select("term", "weight").orderBy(*order).limit(num)


def high_frequency_dictionary(
    reader, field: str, thresh: float
) -> DataFrame:
    """HighFrequencyDictionary (suggest/spell/HighFrequencyDictionary
    .java): the field's terms whose docFreq >= thresh * numDocs
    (minNumDocs = int(thresh * numDocs), isFrequent uses >=), as a
    (surface, weight=docFreq) dictionary frame any suggester here
    accepts.  LuceneDictionary (spell/LuceneDictionary.java) is the
    thresh=0 special case — every term.  One filtered scan of the
    term-stats table; no postings are touched."""
    coll = reader.collection_stats(field)
    min_docs = int(float(thresh) * float(coll.doc_count))
    return (
        reader.term_stats_df()
        .filter(F.col("field") == field)
        .groupBy("term")
        .agg(F.sum("doc_freq").alias("weight"))
        .filter(F.col("weight") >= F.lit(min_docs))
        .select(F.col("term").alias("surface"), "weight")
    )


def plain_text_dictionary(spark, path: str) -> DataFrame:
    """PlainTextDictionary (suggest/spell/PlainTextDictionary.java):
    one word per line, weight 1 — the trivial file-backed dictionary
    (FileDictionary handles the delimited weighted form)."""
    return (
        spark.read.text(path)
        .select(F.trim(F.col("value")).alias("surface"))
        .filter(F.col("surface") != "")
        .withColumn("weight", F.lit(1).cast("long"))
    )
