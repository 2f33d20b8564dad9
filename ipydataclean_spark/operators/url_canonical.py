"""L76 — URL canonicalization + canonical-URL dedup: the FIRST dedup
of every crawl pipeline (before any content hash runs, the frontier
and the corpus are deduped by canonical URL — RFC 3986 §6 syntax-
based normalization plus the tracking-parameter strip every modern
pipeline adds).

The same logical page arrives under many raw URLs: scheme/host case
("HTTPS://EXAMPLE.COM"), explicit default ports (":443"), query-
parameter order, tracking parameters (utm_*, fbclid, gclid), and
fragments. Canonicalization collapses them so one fetch/one document
survives.

Spark-first shape: PURE JVM — regexp_extract/replace for the URL
grammar split (scheme, authority, path, query, fragment per RFC 3986
appendix B), a lazy CASE for the scheme-specific default-port strip,
and the query rewrite as split -> filter -> array_sort -> array_join
(all JVM HOFs; no Python in the plan, plan-gated in tests). Linear
scan; the dedup is one groupBy on the canonical key.

Honest subset (documented, pinned): syntax-based normalization only —
no percent-encoding normalization, no dot-segment removal, no IDN; a userinfo component, if present, is folded with the authority (crawl URLs carrying credentials are dropped upstream in practice).
Strings without a scheme pass through unchanged (garbage in, same
garbage out — never a false merge).

Closed-form oracle: the fixture synthesizes the messy variants from
doc_id INSIDE the query (md5-coin keyed: case / default port / param
order / tracking params / fragment), and DuckDB recomputes both the
messy URL and the canonicalization with its own regex/list functions
— a hash match certifies the TWO independent implementations of the
canonicalizer (Spark JVM expressions vs DuckDB SQL) agree end-to-end,
including the dedup aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register

#: tracking parameters stripped during canonicalization (public
#: convention: UTM campaign params + the Facebook/Google click ids).
#: ONE definition, formatted into both dialects.
_TRACKING_RE = "^(utm_[a-z]+|fbclid|gclid)="

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"


def canonical_url(col: Column) -> Column:
    """RFC 3986 syntax-based canonical form of a URL column (see
    module docstring for the subset): lowercase scheme+authority,
    strip the scheme's default port, drop the fragment, drop tracking
    params, sort the rest. Non-URL strings (no scheme) pass through
    unchanged."""
    scheme = F.lower(F.regexp_extract(col, _SCHEME_RE, 1))
    rest = F.regexp_replace(col, _SCHEME_RE, "")
    rest = F.regexp_replace(rest, "#.*$", "")  # fragment, first
    authority = F.lower(F.regexp_extract(rest, "^([^/?#]*)", 1))
    authority = F.when(
        (scheme == "https") & authority.endswith(":443"),
        F.regexp_replace(authority, ":443$", ""),
    ).when(
        (scheme == "http") & authority.endswith(":80"),
        F.regexp_replace(authority, ":80$", ""),
    ).otherwise(authority)
    path = F.regexp_extract(rest, "^[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(rest, "\\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda x: (x != "") & ~x.rlike(_TRACKING_RE),
        )
    )
    q = F.array_join(params, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        authority,
        path,
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", col).otherwise(canon)


def canonical_url_sql(expr: str) -> str:
    """The DuckDB twin — the SAME spec in the other dialect (the
    driver hash certifies the two stay equivalent)."""
    scheme = f"lower(regexp_extract({expr}, '{_SCHEME_RE}', 1))"
    rest = (
        f"regexp_replace(regexp_replace({expr}, '{_SCHEME_RE}', ''), "
        "'#.*$', '')"
    )
    auth_raw = f"lower(regexp_extract({rest}, '^([^/?#]*)', 1))"
    authority = (
        f"CASE WHEN {scheme} = 'https' AND {auth_raw} LIKE '%:443' "
        f"THEN regexp_replace({auth_raw}, ':443$', '') "
        f"WHEN {scheme} = 'http' AND {auth_raw} LIKE '%:80' "
        f"THEN regexp_replace({auth_raw}, ':80$', '') "
        f"ELSE {auth_raw} END"
    )
    path = f"regexp_extract({rest}, '^[^/?#]*([^?#]*)', 1)"
    query = f"regexp_extract({rest}, '\\?([^#]*)', 1)"
    q = (
        "array_to_string(list_sort(list_filter("
        f"string_split({query}, '&'), "
        f"x -> x <> '' AND NOT regexp_matches(x, '{_TRACKING_RE}'))), '&')"
    )
    canon = (
        f"{scheme} || '://' || {authority} || {path} || "
        f"CASE WHEN {q} <> '' THEN '?' || {q} ELSE '' END"
    )
    return f"CASE WHEN {scheme} = '' THEN {expr} ELSE {canon} END"


def dedup_by_canonical_url(df: DataFrame, url_col: str) -> DataFrame:
    """The dedup aggregate: (canonical_url, n_docs, n_raw_variants,
    min_doc) — keep min_doc per canonical, the L1 exact-dedup shape
    keyed by canonical URL instead of content hash."""
    return (
        df.withColumn("canonical_url", canonical_url(F.col(url_col)))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct(url_col).cast("long").alias("n_raw_variants"),
            F.min("doc_id").cast("long").alias("min_doc"),
        )
    )


#: the messy-variant CASE, keyed by an md5 coin — shared shape between
#: the Spark fixture and the oracle CTE. k = doc_id % 50 is the
#: logical page; ~6 docs per page at the slice size, each arriving
#: with a different raw-URL damage class.
_L76_COIN_SQL = exact.md5_prefix_int_sql("'l76:' || CAST(doc_id AS VARCHAR)")

_L76_ORACLE = (
    "WITH u AS (SELECT doc_id, "
    "CAST(doc_id % 50 AS VARCHAR) AS k, "
    f"({_L76_COIN_SQL} % 6) AS v "
    "FROM documents WHERE doc_id % 3 = 1), "
    "raw AS (SELECT doc_id, CASE v "
    "WHEN 0 THEN 'https://example.com/p/' || k || '?id=' || k || '&x=1' "
    "WHEN 1 THEN 'HTTPS://EXAMPLE.COM/p/' || k || '?id=' || k || '&x=1' "
    "WHEN 2 THEN 'https://example.com:443/p/' || k || '?id=' || k || '&x=1' "
    "WHEN 3 THEN 'https://example.com/p/' || k || '?x=1&id=' || k "
    "WHEN 4 THEN 'https://example.com/p/' || k || '?id=' || k "
    "|| '&utm_source=feed&x=1' "
    "ELSE 'https://example.com/p/' || k || '?id=' || k || '&x=1#section-2' "
    "END AS url FROM u) "
    "SELECT "
    + canonical_url_sql("url")
    + " AS canonical_url, "
    "CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_variants, "
    "CAST(MIN(doc_id) AS BIGINT) AS min_doc "
    "FROM raw GROUP BY 1 ORDER BY canonical_url"
)


@register(
    "l76_url_canonical_dedup",
    oracle=_L76_ORACLE,
    tags=("L76", "L1", "quality", "dedup"),
)
def l76_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L76: canonical-URL dedup end-to-end — synthesize the six messy
    raw-URL variants of each logical page from doc_id (case, default
    port, param order, tracking params, fragment, clean), then
    canonicalize (pure JVM) and aggregate to the dedup table. All six
    variants of one page MUST collapse to one canonical row; the
    oracle recomputes variants and canonicalization with DuckDB's own
    regex/list functions, so the hash certifies two independent
    canonicalizer implementations agree, damage class by damage
    class. Hand vectors, idempotence, and the no-scheme passthrough
    are pinned in tests/test_url_canonical.py."""
    u = (
        T(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 3 == 1)
        .select(
            "doc_id",
            (F.col("doc_id") % 50).cast("string").alias("k"),
            (
                exact.md5_prefix_int(
                    F.concat(F.lit("l76:"), F.col("doc_id").cast("string"))
                )
                % 6
            ).alias("v"),
        )
    )
    base = F.concat(F.lit("https://example.com/p/"), F.col("k"))
    idq = F.concat(F.lit("?id="), F.col("k"), F.lit("&x=1"))
    raw = (
        F.when(F.col("v") == 0, F.concat(base, idq))
        .when(
            F.col("v") == 1,
            F.concat(F.lit("HTTPS://EXAMPLE.COM/p/"), F.col("k"), idq),
        )
        .when(
            F.col("v") == 2,
            F.concat(F.lit("https://example.com:443/p/"), F.col("k"), idq),
        )
        .when(
            F.col("v") == 3,
            F.concat(base, F.lit("?x=1&id="), F.col("k")),
        )
        .when(
            F.col("v") == 4,
            F.concat(
                base, F.lit("?id="), F.col("k"), F.lit("&utm_source=feed&x=1")
            ),
        )
        .otherwise(F.concat(base, idq, F.lit("#section-2")))
    )
    urls = u.select("doc_id", raw.alias("url"))
    return dedup_by_canonical_url(urls, "url").orderBy("canonical_url")
