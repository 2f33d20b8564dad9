"""L77 — robots.txt evaluation (RFC 9309, the Robots Exclusion
Protocol): the crawl-side filter that decides which URLs may enter
the corpus at all — the step BEFORE l74's fetch in a real pipeline.

Semantics implemented (the public spec, §2.2):
- group assignment: each Allow/Disallow rule belongs to the most
  recent preceding ``User-agent`` line;
- group selection: a crawler uses the group(s) matching its OWN
  product token when any exist, otherwise the ``*`` groups — never
  both;
- rule matching: longest-path-match wins; on a length tie the least
  restrictive (Allow) rule wins; a URL matching no rule is allowed.

Spark-first shape: the whole evaluator is RELATIONAL — posexplode of
lines, regexp directive parse, ``last(..., ignorenulls)`` over a
position window for group assignment, one equi-join host->rules with
a ``startswith`` predicate for candidates, and a row_number argmax
for longest-match. No Python anywhere (plan-gated); the rules side
is tiny in practice (one robots.txt per host) so Catalyst broadcasts
it under the join threshold.

Honest subset (documented, pinned): no ``$`` anchors or ``*``
wildcards inside rule paths (RFC 9309 §2.2.3 optional syntax), no
percent-encoding normalization (compose with l76 upstream), byte-
literal path prefix match.

Closed-form oracle: the fixture synthesizes per-host robots.txt TEXT
and per-doc URL paths from doc_id in-query; DuckDB re-runs the SAME
relational evaluation (parallel unnest with ordinality, IGNORE NULLS
window, starts_with join, argmax) — one hash certifies parsing,
group assignment, group selection precedence, and longest-match
semantics in both dialects at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register


def parse_robots(robots: DataFrame, host_col: str = "host",
                 txt_col: str = "robots_txt") -> DataFrame:
    """(host, robots_txt) -> one row per rule: (host, ua, directive,
    path). Group assignment per RFC 9309 §2.2.1: a rule belongs to
    the most recent preceding User-agent line (case-insensitive
    directive names; rules before any User-agent line are dropped;
    empty rule values are no-ops)."""
    lines = robots.select(
        host_col,
        F.posexplode(F.split(F.col(txt_col), "\n")).alias("pos", "line"),
    )
    parsed = lines.select(
        host_col,
        "pos",
        F.lower(F.regexp_extract("line", "^([A-Za-z-]+):", 1)).alias("key"),
        F.trim(F.regexp_extract("line", "^[A-Za-z-]+:(.*)$", 1)).alias("val"),
    )
    w = (
        Window.partitionBy(host_col)
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_ua = parsed.withColumn(
        "ua",
        F.last(
            F.when(F.col("key") == "user-agent", F.lower(F.col("val"))),
            ignorenulls=True,
        ).over(w),
    )
    return with_ua.where(
        F.col("key").isin("allow", "disallow")
        & (F.col("val") != "")
        & F.col("ua").isNotNull()
    ).select(
        host_col,
        "ua",
        F.col("key").alias("directive"),
        F.col("val").alias("path"),
    )


def robots_decisions(urls: DataFrame, rules: DataFrame,
                     agent: str = "trainbot") -> DataFrame:
    """(doc_id, host, upath) x rules -> + (decision, matched_rule).
    Group selection (most specific group wins, never both), longest-
    path-match, Allow wins length ties, no-match = allowed."""
    hs = rules.groupBy("host").agg(
        F.max((F.col("ua") == agent).cast("int")).alias("has_specific")
    )
    eff = rules.join(hs, "host").where(
        ((F.col("has_specific") == 1) & (F.col("ua") == agent))
        | ((F.col("has_specific") == 0) & (F.col("ua") == "*"))
    )
    cand = urls.join(eff, "host").where(F.col("upath").startswith(F.col("path")))
    best = cand.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(
                F.length("path").desc(),
                (F.col("directive") == "allow").desc(),
                F.col("path"),
                F.col("directive"),
            )
        ),
    ).where(F.col("rn") == 1).select(
        F.col("doc_id").alias("__d"), "directive", F.col("path").alias("__mp")
    )
    out = urls.join(best, urls["doc_id"] == best["__d"], "left")
    return out.select(
        "doc_id",
        "host",
        "upath",
        F.when(
            F.col("directive").isNull() | (F.col("directive") == "allow"),
            F.lit("allowed"),
        )
        .otherwise(F.lit("disallowed"))
        .alias("decision"),
        F.coalesce(F.col("__mp"), F.lit("-")).alias("matched_rule"),
    )


_L77_COIN_SQL = exact.md5_prefix_int_sql("'l77:' || CAST(doc_id AS VARCHAR)")

_L77_CTES = (
    "WITH u AS (SELECT doc_id, CAST(doc_id % 20 AS BIGINT) AS j, "
    f"({_L77_COIN_SQL} % 5) AS v FROM documents WHERE doc_id % 4 = 2), "
    "urls AS (SELECT doc_id, 'h' || CAST(j AS VARCHAR) || '.example.com' "
    "AS host, CASE v "
    "WHEN 0 THEN '/public/page' || CAST(doc_id AS VARCHAR) "
    "WHEN 1 THEN '/private/x' || CAST(doc_id AS VARCHAR) "
    "WHEN 2 THEN '/private/ok/y' || CAST(doc_id AS VARCHAR) "
    "WHEN 3 THEN '/tmp' || CAST(j AS VARCHAR) || '/z' "
    "ELSE '/' END AS upath FROM u), "
    "hosts AS (SELECT DISTINCT j, 'h' || CAST(j AS VARCHAR) || "
    "'.example.com' AS host, "
    "'User-agent: badbot' || chr(10) || 'Disallow: /' || chr(10) || "
    "chr(10) || 'User-agent: *' || chr(10) || 'Disallow: /private' || "
    "chr(10) || 'Allow: /private/ok' || chr(10) || 'Disallow: /tmp' || "
    "CAST(j AS VARCHAR) || "
    "CASE WHEN j % 4 = 0 THEN chr(10) || 'User-agent: trainbot' || "
    "chr(10) || 'Allow: /private' || chr(10) || 'Disallow: /tmp' || "
    "CAST(j AS VARCHAR) ELSE '' END AS robots_txt FROM u), "
    "lines AS (SELECT host, i AS pos, line FROM (SELECT host, "
    "unnest(string_split(robots_txt, chr(10))) AS line, "
    "unnest(range(1, len(string_split(robots_txt, chr(10))) + 1)) AS i "
    "FROM hosts)), "
    "parsed AS (SELECT host, pos, "
    "lower(regexp_extract(line, '^([A-Za-z-]+):', 1)) AS key, "
    "trim(regexp_extract(line, '^[A-Za-z-]+:(.*)$', 1)) AS val "
    "FROM lines), "
    "with_ua AS (SELECT *, last_value(CASE WHEN key = 'user-agent' "
    "THEN lower(val) END IGNORE NULLS) OVER (PARTITION BY host ORDER "
    "BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ua "
    "FROM parsed), "
    "rules AS (SELECT host, ua, key AS directive, val AS path FROM "
    "with_ua WHERE key IN ('allow', 'disallow') AND val <> '' AND "
    "ua IS NOT NULL), "
    "hs AS (SELECT host, MAX(CASE WHEN ua = 'trainbot' THEN 1 ELSE 0 "
    "END) AS has_specific FROM rules GROUP BY host), "
    "eff AS (SELECT r.* FROM rules r JOIN hs USING (host) WHERE "
    "(hs.has_specific = 1 AND r.ua = 'trainbot') OR "
    "(hs.has_specific = 0 AND r.ua = '*')), "
    "cand AS (SELECT urls.doc_id, eff.directive, eff.path FROM urls "
    "JOIN eff USING (host) WHERE starts_with(urls.upath, eff.path)), "
    "best AS (SELECT doc_id, directive, path, ROW_NUMBER() OVER ("
    "PARTITION BY doc_id ORDER BY strlen(path) DESC, "
    "(directive = 'allow') DESC, path, directive) AS rn FROM cand) "
    # dec: the per-URL decision table (the l77 result grain), shared
    # with the pipeline_crawl_frontend oracle
    ", dec AS (SELECT urls.doc_id, urls.host, urls.upath, "
    "CASE WHEN b.directive IS NULL OR b.directive = 'allow' "
    "THEN 'allowed' ELSE 'disallowed' END AS decision, "
    "COALESCE(b.path, '-') AS matched_rule "
    "FROM urls LEFT JOIN (SELECT * FROM best WHERE rn = 1) b "
    "USING (doc_id)) "
)

_L77_ORACLE = _L77_CTES + "SELECT * FROM dec ORDER BY doc_id"


@register(
    "l77_robots_filter",
    oracle=_L77_ORACLE,
    tags=("L77", "L7", "quality", "crawl"),
)
def l77_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L77: robots.txt evaluation end-to-end — synthesize one
    robots.txt per host (a badbot group that must be IGNORED, a ``*``
    group, and a ``trainbot`` group on every 4th host whose rules
    INVERT the /private decision — the group-precedence
    certification) plus five URL-path shapes per doc (no match /
    group-dependent /private / longest-match /private/ok / disallowed
    /tmpJ / bare root), then parse, select groups, and longest-match.
    The oracle re-runs the identical relational evaluation in DuckDB,
    so one hash certifies line parsing, IGNORE-NULLS group
    assignment, specific-over-* group selection, startswith
    candidate generation, and the longest-match/Allow-tie argmax in
    both dialects. Hand vectors and the plan gate are pinned in
    tests/test_robots_filter.py."""
    u = (
        T(spark, sf_dir, "documents")
        .where(F.col("doc_id") % 4 == 2)
        .select(
            "doc_id",
            (F.col("doc_id") % 20).cast("long").alias("j"),
            (
                exact.md5_prefix_int(
                    F.concat(F.lit("l77:"), F.col("doc_id").cast("string"))
                )
                % 5
            ).alias("v"),
        )
    )
    js = F.col("j").cast("string")
    host = F.concat(F.lit("h"), js, F.lit(".example.com"))
    did = F.col("doc_id").cast("string")
    upath = (
        F.when(F.col("v") == 0, F.concat(F.lit("/public/page"), did))
        .when(F.col("v") == 1, F.concat(F.lit("/private/x"), did))
        .when(F.col("v") == 2, F.concat(F.lit("/private/ok/y"), did))
        .when(F.col("v") == 3, F.concat(F.lit("/tmp"), js, F.lit("/z")))
        .otherwise(F.lit("/"))
    )
    urls = u.select("doc_id", host.alias("host"), upath.alias("upath"))
    base_txt = F.concat(
        F.lit(
            "User-agent: badbot\nDisallow: /\n\n"
            "User-agent: *\nDisallow: /private\nAllow: /private/ok\n"
            "Disallow: /tmp"
        ),
        js,
    )
    spec_txt = F.when(
        F.col("j") % 4 == 0,
        F.concat(
            F.lit("\nUser-agent: trainbot\nAllow: /private\nDisallow: /tmp"),
            js,
        ),
    ).otherwise(F.lit(""))
    robots = (
        u.select("j").distinct().select(
            F.concat(F.lit("h"), js, F.lit(".example.com")).alias("host"),
            F.concat(base_txt, spec_txt).alias("robots_txt"),
        )
    )
    rules = parse_robots(robots)
    return robots_decisions(urls, rules).orderBy("doc_id")


# ---------------------------------------------------------------------------
# The crawl front end, composed: robots -> messy URL -> canonical
# dedup -> per-host frontier report (one oracle hash certifies the
# whole chain)
# ---------------------------------------------------------------------------

from ipydataclean_spark.operators.url_canonical import (  # noqa: E402
    canonical_url,
    canonical_url_sql,
)

_PCF_COIN_SQL = exact.md5_prefix_int_sql("'pcf:' || CAST(doc_id AS VARCHAR)")

_PCF_ORACLE = (
    _L77_CTES
    + ", raw AS (SELECT dec.*, "
    f"({_PCF_COIN_SQL} % 4) AS w FROM dec), "
    "full_url AS (SELECT doc_id, host, decision, CASE w "
    "WHEN 0 THEN 'https://' || host || upath "
    "WHEN 1 THEN 'https://' || upper(host) || upath "
    "WHEN 2 THEN 'https://' || host || ':443' || upath "
    "|| '?utm_source=feed' "
    "ELSE 'https://' || host || upath || '#top' END AS url FROM raw), "
    "canon AS (SELECT doc_id, host, decision, "
    + canonical_url_sql("url")
    + " AS curl FROM full_url) "
    "SELECT host, "
    "CAST(COUNT(*) AS BIGINT) AS n_urls, "
    "CAST(SUM(CASE WHEN decision = 'allowed' THEN 1 ELSE 0 END) AS BIGINT) "
    "AS n_allowed, "
    "CAST(COUNT(DISTINCT CASE WHEN decision = 'allowed' THEN curl END) "
    "AS BIGINT) AS n_pages "
    "FROM canon GROUP BY host ORDER BY host"
)


@register(
    "pipeline_crawl_frontend",
    oracle=_PCF_ORACLE,
    tags=("pipeline", "L76", "L77", "crawl", "dedup"),
)
def pipeline_crawl_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl front end COMPOSED: l77's robots evaluation feeds
    l76's canonicalizer — per doc, build the full raw URL with a
    second md5-coin's damage class (host case / explicit default port
    + tracking param / fragment), canonicalize, and reduce to the
    per-host frontier report (n_urls, n_allowed, n_pages = distinct
    canonical pages among allowed URLs — the number a crawl scheduler
    actually budgets by; the '/' path shape dedups across its host's
    docs, so n_pages < n_allowed on most hosts). Still pure JVM end
    to end. ONE oracle hash certifies robots parsing + group
    precedence + longest-match + URL canonicalization + the dedup
    aggregate, composed — the pipeline_corpus_curation pattern for
    the crawl stage."""
    dec = l77_robots_filter(spark, sf_dir)
    w = (
        exact.md5_prefix_int(
            F.concat(F.lit("pcf:"), F.col("doc_id").cast("string"))
        )
        % 4
    )
    url = (
        F.when(w == 0, F.concat(F.lit("https://"), F.col("host"), F.col("upath")))
        .when(
            w == 1,
            F.concat(F.lit("https://"), F.upper(F.col("host")), F.col("upath")),
        )
        .when(
            w == 2,
            F.concat(
                F.lit("https://"), F.col("host"), F.lit(":443"),
                F.col("upath"), F.lit("?utm_source=feed"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://"), F.col("host"), F.col("upath"), F.lit("#top")
            )
        )
    )
    canon = dec.select(
        "host",
        "decision",
        canonical_url(url).alias("curl"),
    )
    return (
        canon.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.sum((F.col("decision") == "allowed").cast("int"))
            .cast("long")
            .alias("n_allowed"),
            F.countDistinct(
                F.when(F.col("decision") == "allowed", F.col("curl"))
            )
            .cast("long")
            .alias("n_pages"),
        )
        .orderBy("host")
    )
