"""URL curation ops for web-scale corpus pipelines: canonicalization,
domain extraction, and per-domain occupancy caps — the CCNet /
RefinedWeb-style hygiene pass that runs before dedup at 100 TB (URL
normalization collapses trivially-distinct crawls of one page; domain
caps stop a single site from dominating the training mix).

Everything is built from ONE set of shared ANSI SQL expression strings
(the PII-block precedent, textstats.py): regexes stay in the
Java-regex ∩ RE2 ∩ DuckDB subset and replacements are EMPTY strings
only (Spark spells backreferences $1, DuckDB \\1 — avoiding captures in
replacements keeps the strings engine-portable); backslash escapes are
avoided entirely (Spark SQL literals eat them, DuckDB keeps them) —
character classes like [.] and [?] spell the literals instead.

Normalization steps (applied in order):
 1. drop the #fragment;
 2. lowercase the scheme and the host, strip a leading ``www.`` and a
    default ``:80``/``:443`` port;
 3. strip tracking query params (utm_*, fbclid, gclid, ref) and tidy
    the separators;
 4. strip a trailing slash when the path is not just ``/``.

Scale shape: normalization/domain are pure per-row expressions (codegen,
no shuffle). The domain cap is skew-aware: ONE map-side-combined count
per domain first; under-cap domains (the overwhelming majority) pass
through with NO window, only over-cap domains shuffle into the
row_number rank — the hot-domain sort never touches the rest of the
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_TRACKING = "(utm_[A-Za-z]+|fbclid|gclid|ref)"


def normalize_url_sql(e: str) -> str:
    """Canonicalized URL as one shared SQL expression over ``e``."""
    nofrag = f"regexp_replace({e}, '#.*$', '')"
    scheme = f"lower(regexp_extract({nofrag}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    hostport = (
        f"lower(regexp_extract({nofrag}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    )
    host = (
        f"regexp_replace(regexp_replace({hostport}, '^www[.]', ''), "
        f"':(443|80)$', '')"
    )
    rest = (
        f"regexp_extract({nofrag}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1)"
    )
    # tracking params: mid-query (own & follows), then trailing (its
    # leading ? or & goes with it), then a dangling '?'
    r1 = f"regexp_replace({rest}, '{_TRACKING}=[^&]*&', '')"
    r2 = f"regexp_replace({r1}, '[?&]{_TRACKING}=[^&]*$', '')"
    r3 = f"regexp_replace({r2}, '[?]$', '')"
    tidy = (
        f"(CASE WHEN {r3} LIKE '%/' AND length({r3}) > 1 "
        f"THEN substr({r3}, 1, length({r3}) - 1) ELSE {r3} END)"
    )
    return f"({scheme} || '://' || {host} || {tidy})"


def extract_domain_sql(e: str) -> str:
    """Registrable host (lowercased, www-stripped, port-stripped)."""
    hostport = (
        f"lower(regexp_extract({e}, "
        f"'^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    )
    return (
        f"regexp_replace(regexp_replace({hostport}, '^www[.]', ''), "
        f"':[0-9]+$', '')"
    )


def normalize_urls(df: DataFrame, url_col: str) -> DataFrame:
    """-> df + (norm_url, domain)."""
    return df.withColumn(
        "norm_url", F.expr(normalize_url_sql(url_col))
    ).withColumn("domain", F.expr(extract_domain_sql(url_col)))


def domain_cap_sample(
    df: DataFrame,
    domain_col: str,
    id_col: str,
    cap: int,
    salt: str = "cap0",
) -> DataFrame:
    """Keep at most ``cap`` rows per domain, chosen deterministically by
    a salted hash rank (redrawing the salt redraws the survivors —
    sampling.py's salting convention). Under-cap domains skip the rank
    entirely. -> the kept rows of ``df``."""
    counts = df.groupBy(domain_col).agg(F.count("*").alias("__n"))
    with_n = df.join(counts, domain_col)  # un-hinted: AQE decides
    small = with_n.where(F.col("__n") <= cap).drop("__n")
    big = with_n.where(F.col("__n") > cap).drop("__n")
    from pyspark.sql import Window

    rk = F.row_number().over(
        Window.partitionBy(domain_col).orderBy(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))),
            F.col(id_col),
        )
    )
    capped = big.withColumn("__rk", rk).where(F.col("__rk") <= cap).drop("__rk")
    return small.unionByName(capped)


def domain_cap_sql(
    base: str, domain_expr: str, id_col: str, cap: int, salt: str = "cap0"
) -> str:
    """DuckDB twin of domain_cap_sample over ``base`` (a FROM-able)."""
    return f"""WITH b AS (SELECT *, {domain_expr} AS __dom FROM {base}),
c AS (SELECT __dom, count(*) AS __n FROM b GROUP BY __dom),
r AS (SELECT b.*, c.__n, row_number() OVER (
        PARTITION BY b.__dom
        ORDER BY md5('{salt}' || CAST(b.{id_col} AS VARCHAR)), b.{id_col}
      ) AS __rk
      FROM b JOIN c USING (__dom))
SELECT * EXCLUDE (__n, __rk, __dom) FROM r WHERE __n <= {cap} OR __rk <= {cap}"""
