"""Document-based completion — the ``suggest/document`` package.

Reference: ``suggest/src/java/org/apache/lucene/search/suggest/document/``
— ``SuggestField.java`` / ``ContextSuggestField.java`` (per-document
suggestion entries with an index-time weight and optional contexts),
``PrefixCompletionQuery.java`` / ``RegexCompletionQuery.java`` /
``FuzzyCompletionQuery.java`` / ``ContextQuery.java`` (the query
family), ``SuggestIndexSearcher.java`` + ``TopSuggestDocsCollector.java``
(execution: top-n (doc, key, score) with optional duplicate-key skip),
and ``CompletionScorer.java`` (the score algebra).

Unlike the suggest/analyzing lookups (suggesters.py), these queries
return DOCUMENTS: each hit is (doc_id, surface, score), filterable by
a ``BitsProducer`` (here: an arbitrary boolean Column over the entry
frame) and context-aware through ContextSuggestField.

Semantics kept exactly:

- the surface is ANALYZED into the match key (CompletionAnalyzer role);
  the typed prefix goes through the same chain;
- score algebra (CompletionScorer.java:98-106): ``boost == 0 ->
  weight``, ``weight == 0 -> boost``, else ``weight * boost``;
- PrefixCompletionQuery / RegexCompletionQuery carry boost 0 (their
  CompletionWeight never overrides boost()) -> score == index weight;
  the regex is NOT analyzed and matches a PREFIX of the key (the
  automaton-intersection contract);
- FuzzyCompletionQuery: a key matches if some prefix of it is within
  ``max_edits`` of the typed key (length feasibility bounds the prefix
  window, as in suggesters.fuzzy_suggest), the first
  ``non_fuzzy_prefix`` characters must match exactly, and typed keys
  shorter than ``min_fuzzy_length`` match exactly only. Its boost is
  the longest common prefix between the typed key and the matched key
  CAPPED at len(typed)-1 — FuzzyCompletionQuery.java:266-286: "the
  last letter of the matched prefix for the exact match never makes it
  through here, so an exact match and a match with only an edit at the
  end is boosted the same". Transpositions count as two edits
  (classic Levenshtein; the reference defaults Damerau) — documented
  divergence shared with suggesters.fuzzy_suggest;
- ContextQuery: per-context (boost, exact) pairs; an entry matches if
  its context equals an exact context or starts with a non-exact one;
  total boost = context boost + inner boost (ContextCompletionWeight
  .boost()), a doc's best-scoring entry wins; with no contexts added
  (or match_all) every entry matches with context boost 0. A plain
  SuggestField entry (NULL context) is only reachable through
  match_all, mirroring "ContextQuery against a SuggestField yields
  results ignoring context" only for the all-contexts walk.

100-TB shape: suggestion entries are one narrow (doc_id, surface,
weight, context, _key) table — the analysis pass is one Arrow batch
job at build time; every query after that is a pushed-down
startswith/RLIKE/levenshtein-window predicate plus a TopK — no
shuffle except the final ordered limit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from lucene_spark.search.suggesters import _analyze_query, _with_key

__all__ = [
    "build_suggest_entries",
    "completion_score",
    "prefix_completion",
    "regex_completion",
    "fuzzy_completion",
    "context_completion",
]


def build_suggest_entries(
    docs: DataFrame,
    surface_col: str,
    weight_expr: str,
    contexts_col: str | None = None,
    analyzer: str = "simple",
    id_col: str = "doc_id",
) -> DataFrame:
    """SuggestField / ContextSuggestField sink: one row per
    (document, suggestion entry, context) with the analyzed match key.
    ``contexts_col`` may be an array<string> column (exploded; the
    reference stores one FST arc set per context) or a plain string
    column; None produces context-less SuggestField entries."""
    base = docs.select(
        F.col(id_col).cast("long").alias("doc_id"),
        F.col(surface_col).cast("string").alias("surface"),
        F.expr(weight_expr).cast("long").alias("weight"),
        (
            F.lit(None).cast("string")
            if contexts_col is None
            else F.col(contexts_col).cast("string")
        ).alias("context"),
    ).filter(F.col("surface").isNotNull())
    return _with_key(base, analyzer, "surface")


def completion_score(weight: Column, boost: Column) -> Column:
    """CompletionScorer.score(weight, boost) exactly."""
    return (
        F.when(boost == 0, weight)
        .when(weight == 0, boost)
        .otherwise(weight * boost)
        .cast("long")
    )


def _top(matched: DataFrame, k: int, skip_duplicates: bool) -> DataFrame:
    """TopSuggestDocsCollector: best entry per doc, optional duplicate
    surface skip (SuggestIndexSearcher.suggest(n, skipDuplicates)),
    score DESC with deterministic ties."""
    from pyspark.sql import Window

    per_doc = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("surface").asc()
    )
    out = (
        matched.withColumn("__r", F.row_number().over(per_doc))
        .filter(F.col("__r") == 1)
        .drop("__r")
    )
    if skip_duplicates:
        per_key = Window.partitionBy("surface").orderBy(
            F.col("score").desc(), F.col("doc_id").asc()
        )
        out = (
            out.withColumn("__r", F.row_number().over(per_key))
            .filter(F.col("__r") == 1)
            .drop("__r")
        )
    return (
        out.select("doc_id", "surface", F.col("score").alias("score_x1e6"))
        .orderBy(
            F.col("score_x1e6").desc(),
            F.col("surface").asc(),
            F.col("doc_id").asc(),
        )
        .limit(k)
    )


def prefix_completion(
    entries: DataFrame,
    typed: str,
    k: int = 5,
    analyzer: str = "simple",
    filter_expr: Column | None = None,
    skip_duplicates: bool = False,
) -> DataFrame:
    """PrefixCompletionQuery: analyzed-prefix walk, score = weight
    (boost 0). -> (doc_id, surface, score_x1e6)."""
    qkey = _analyze_query(analyzer, typed)
    m = entries.filter(F.col("_key").startswith(qkey))
    if filter_expr is not None:
        m = m.filter(filter_expr)
    m = m.withColumn("score", completion_score(F.col("weight"), F.lit(0)))
    return _top(m.dropDuplicates(["doc_id", "surface"]), k, skip_duplicates)


def regex_completion(
    entries: DataFrame,
    pattern: str,
    k: int = 5,
    filter_expr: Column | None = None,
    skip_duplicates: bool = False,
) -> DataFrame:
    """RegexCompletionQuery: the UN-analyzed regex intersected as a
    key prefix (anchored at the start; the automaton accepts any key
    extension). Score = weight."""
    m = entries.filter(F.col("_key").rlike(f"^(?:{pattern})"))
    if filter_expr is not None:
        m = m.filter(filter_expr)
    m = m.withColumn("score", completion_score(F.col("weight"), F.lit(0)))
    return _top(m.dropDuplicates(["doc_id", "surface"]), k, skip_duplicates)


def _fuzzy_match_and_boost(
    qkey: str, max_edits: int, non_fuzzy_prefix: int, min_fuzzy_length: int
) -> tuple[Column, Column]:
    exact = F.col("_key").startswith(qkey)
    if len(qkey) < min_fuzzy_length or len(qkey) <= non_fuzzy_prefix:
        cond = exact
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
        same_pfx = F.substring(
            F.col("_key"), 1, non_fuzzy_prefix
        ) == F.lit(qkey[:non_fuzzy_prefix])
        cond = exact | (same_pfx & (ped <= max_edits))
    # boost = lcp(typed, key) capped at len(typed)-1 (the exact match's
    # last letter "never makes it through" — FuzzyCompletionQuery:268)
    lcp_terms = [
        F.when(
            F.substring(F.col("_key"), 1, i) == F.lit(qkey[:i]), F.lit(i)
        ).otherwise(F.lit(0))
        for i in range(1, len(qkey) + 1)
    ]
    lcp = F.greatest(*lcp_terms, F.lit(0)) if lcp_terms else F.lit(0)
    boost = F.least(lcp, F.lit(max(len(qkey) - 1, 0)))
    return cond, boost


def fuzzy_completion(
    entries: DataFrame,
    typed: str,
    k: int = 5,
    analyzer: str = "simple",
    max_edits: int = 1,
    non_fuzzy_prefix: int = 1,
    min_fuzzy_length: int = 3,
    filter_expr: Column | None = None,
    skip_duplicates: bool = False,
) -> DataFrame:
    """FuzzyCompletionQuery: prefix-edit-distance match with the
    common-prefix boost; score = weight * boost per the algebra."""
    if max_edits > 2:
        raise ValueError("max_edits <= 2 (LevenshteinAutomata.java:31)")
    qkey = _analyze_query(analyzer, typed)
    cond, boost = _fuzzy_match_and_boost(
        qkey, max_edits, non_fuzzy_prefix, min_fuzzy_length
    )
    m = entries.filter(cond).withColumn(
        "score", completion_score(F.col("weight"), boost)
    )
    return _top(m.dropDuplicates(["doc_id", "surface"]), k, skip_duplicates)


def context_completion(
    entries: DataFrame,
    typed: str,
    contexts: dict[str, tuple[float, bool]] | None = None,
    match_all: bool = False,
    k: int = 5,
    analyzer: str = "simple",
    inner: str = "prefix",
    filter_expr: Column | None = None,
    skip_duplicates: bool = False,
    **inner_kwargs,
) -> DataFrame:
    """ContextQuery over an inner prefix/fuzzy completion. ``contexts``
    maps context -> (boost, exact); ``match_all`` (or no contexts)
    admits every entry with context boost 0. Total boost = context
    boost + inner boost; a doc's best entry wins."""
    qkey = _analyze_query(analyzer, typed)
    if inner == "prefix":
        cond, iboost = F.col("_key").startswith(qkey), F.lit(0)
    elif inner == "fuzzy":
        cond, iboost = _fuzzy_match_and_boost(
            qkey,
            inner_kwargs.get("max_edits", 1),
            inner_kwargs.get("non_fuzzy_prefix", 1),
            inner_kwargs.get("min_fuzzy_length", 3),
        )
    else:
        raise ValueError(f"unsupported inner query {inner!r}")
    m = entries.filter(cond)
    if filter_expr is not None:
        m = m.filter(filter_expr)
    if contexts and not match_all:
        cmatch = F.lit(False)
        # earlier entries win on overlap: a CASE ladder in insertion
        # order (the reference keys contexts by exact IntsRef, so
        # overlap only arises between exact and prefix contexts)
        expr = None
        for ctx, (b, is_exact) in contexts.items():
            pred = (
                (F.col("context") == ctx)
                if is_exact
                else F.col("context").startswith(ctx)
            )
            cmatch = cmatch | pred
            expr = (
                F.when(pred, F.lit(float(b)))
                if expr is None
                else expr.when(pred, F.lit(float(b)))
            )
        m = m.filter(cmatch).withColumn(
            "score",
            completion_score(
                F.col("weight"), expr.otherwise(F.lit(0.0)) + iboost
            ),
        )
    else:
        m = m.withColumn(
            "score", completion_score(F.col("weight"), F.lit(0) + iboost)
        )
    return _top(m, k, skip_duplicates)
