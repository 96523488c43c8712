"""FreeTextSuggester — the reference's stupid-backoff n-gram language
model suggester (suggest/analyzing/FreeTextSuggester.java) re-expressed
Spark-first.

Build: one DataFrame of gram counts for every order 1..grams — shingles
are produced JVM-side with transform/slice over the token array and
counted with a single map-side-combined groupBy (the ShingleFilter →
FST build of FreeTextSuggester.build, .java:254-330). At 100 TB the
model is one shuffle keyed by (n, gram); lookups touch only the
(n, context) slices, so persist the model bucketed by ``context``.

Lookup (.java:436-720): split the key into a context of whole tokens
plus a trailing fragment (empty when the key ends mid-separator — the
"upgrade" at .java:504-520); for each order g from ``grams`` down to 1,
candidates are that order's grams whose context matches and whose last
token starts with the fragment, scored

    score(gram) = alpha^(grams-g) * count(gram) / count(context)

with count(context) read from the (g-1)-order model and totTokens for
unigrams (.java:578-591), alpha = 0.4 (the "Large language models in
machine translation" stupid-backoff constant). A completed token
suggested by a higher order suppresses the same token at lower orders
(the ``seen`` set, .java:573-576/705-712); ties sort key-ascending
(.java:723-735). Scores are emitted as round(score*1e6) (the reference
scales by Long.MAX_VALUE; same ordering).

Unlike the reference's per-order top-N FST search, candidate sets are
not truncated before the global sort — a pure superset that can only
improve the returned top-N (documented divergence).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ALPHA = 0.4
_TOKEN_RE = re.compile(r"[a-z0-9]+")


def _tokens_col(text_col):
    """Analyzer twin of the gate's _TOKS CTE: lowercase, split on
    non-alphanumeric, drop empties — JVM expressions only."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"), lambda t: t != ""
    )


def freetext_model(
    docs: DataFrame, text_col: str = "text", grams: int = 2
) -> DataFrame:
    """-> (n, context, last, gram, cnt): counts of every 1..grams-gram.
    ``context`` is the first n-1 tokens space-joined ('' for unigrams),
    ``gram`` the full space-joined text."""
    if grams < 1:
        raise ValueError("grams must be >= 1")
    ts = docs.select(_tokens_col(text_col).alias("ts"))
    parts = []
    for g in range(1, grams + 1):
        shingles = F.expr(
            f"transform(sequence(1, size(ts) - {g - 1}), i -> "
            f"struct(concat_ws(' ', slice(ts, i, {g - 1})) AS context, "
            f"element_at(ts, i + {g - 1}) AS last))"
        )
        parts.append(
            ts.filter(F.size("ts") >= g)
            .select(F.explode(shingles).alias("s"))
            .select(
                F.lit(g).alias("n"),
                F.col("s.context").alias("context"),
                F.col("s.last").alias("last"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return (
        out.groupBy("n", "context", "last")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "gram",
            F.when(F.col("context") == "", F.col("last")).otherwise(
                F.concat_ws(" ", "context", "last")
            ),
        )
    )


def _split_key(key: str, grams: int) -> tuple[list[str], str]:
    """-> (context tokens, trailing fragment). A key ending in a
    separator 'upgrades' the tokens: the last full token becomes
    context and the fragment is empty (.java:504-520)."""
    toks = _TOKEN_RE.findall(key.lower())
    ended = bool(key) and not key[-1].isalnum()
    if ended or not toks:
        return toks[-(grams - 1):] if grams > 1 else [], ""
    ctx = toks[:-1]
    return ctx[-(grams - 1):] if grams > 1 else [], toks[-1]


def freetext_lookup(
    model: DataFrame,
    key: str,
    num: int = 5,
    grams: int = 2,
    alpha: float = ALPHA,
) -> DataFrame:
    """-> (term, score_x1e6): top-``num`` suggestions for ``key``,
    term = the full matched gram text. Only the (single, short) key is
    processed on the driver; scoring is DataFrame joins against the
    model's (n, context) slices."""
    spark = model.sparkSession
    ctx_toks, fragment = _split_key(key, grams)
    tot = model.filter(F.col("n") == 1).agg(
        F.sum("cnt").cast("double").alias("ctx_cnt")
    )
    scored = []
    for g in range(grams, 0, -1):
        need = g - 1
        if len(ctx_toks) < need:
            continue  # input didn't have enough tokens (.java:538-543)
        if g == 1 and fragment == "" and key:
            continue  # no unigram predictions from empty string
        ctx = " ".join(ctx_toks[-need:]) if need else ""
        cands = model.filter(
            (F.col("n") == g) & (F.col("context") == ctx)
        )
        if fragment:
            cands = cands.filter(F.col("last").startswith(fragment))
        if need:
            denom = model.filter(
                (F.col("n") == need) & (F.col("gram") == ctx)
            ).select(F.col("cnt").cast("double").alias("ctx_cnt"))
        else:
            denom = tot
        backoff = alpha ** (grams - g)
        scored.append(
            cands.crossJoin(F.broadcast(denom)).select(
                F.lit(g).alias("order_n"),
                "gram",
                "last",
                (F.lit(backoff) * F.col("cnt") / F.col("ctx_cnt")).alias(
                    "score"
                ),
            )
        )
    if not scored:
        return spark.createDataFrame([], "term string, score_x1e6 long")
    out = scored[0]
    for p in scored[1:]:
        out = out.unionByName(p)
    # a completed token seen at a higher order suppresses lower orders
    w = Window.partitionBy("last").orderBy(F.col("order_n").desc())
    return (
        out.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("gram").alias("term"),
            F.round(F.col("score") * 1e6).cast("long").alias("score_x1e6"),
        )
        .orderBy(F.col("score_x1e6").desc(), F.col("term").asc())
        .limit(num)
    )
