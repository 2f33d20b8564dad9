"""Time-series resampling, feature preparation, and PII redaction.

The reference's cleaning surface feeds models; the pandas steps that
usually follow cleaning are resample/asfreq (regularize a time grid),
one-hot encoding, binning, and min-max / z-score scaling — plus, for
LLM corpus curation, PII redaction before training. Each op here is
the Spark-native form with a DuckDB oracle twin: grid generation via
sequence+explode (no driver loop), scalings as two-phase literal
substitution (tiny scalar job, then one codegen pass — never a
window-over-the-whole-table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register

# ---------------------------------------------------------------------------
# Reusable cleaning fns (Recipe-composable; the registered queries below
# are their driver-checked instantiations)
# ---------------------------------------------------------------------------


def parse_dates(df: DataFrame, col: str, formats: list[str], out: str | None = None) -> DataFrame:
    """Coerce a multi-format date-string column to DATE (C19): try each
    format in order, first hit wins, unparseable -> NULL."""
    parsed = F.coalesce(
        *[F.try_to_timestamp(F.col(col), F.lit(f)) for f in formats]
    ).cast("date")
    return df.withColumn(out or col, parsed)


def standardize_units(
    df: DataFrame, col: str, conversions: dict[str, float], out: str | None = None
) -> DataFrame:
    """Split '<magnitude><unit>' strings and convert to a canonical
    unit (C20). ``conversions`` maps unit suffix -> factor; unitless
    values keep factor 1.0."""
    num = F.regexp_extract(F.col(col), r"^([0-9.]+)", 1).try_cast("double")
    unit = F.regexp_extract(F.col(col), r"([a-z]+)$", 1)
    factor = F.lit(1.0)
    for u, k in sorted(conversions.items()):
        factor = F.when(unit == u, F.lit(float(k))).otherwise(factor)
    return df.withColumn(out or col, num * factor)


def scale_zscore(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """Z-score standardization (C24), two-phase: one scalar job for
    exact mean/stddev, then a literal-substituted codegen pass. A
    (near-)constant column has sd == 0 — ANSI mode would raise on the
    division, so it scales to 0.0 (already centered) instead."""
    m, sd = df.agg(exact.davg(col), exact.dstddev(col)).first()
    if not sd or sd == 0.0:
        return df.withColumn(out or col, F.when(F.col(col).isNotNull(), F.lit(0.0)))
    return df.withColumn(out or col, (F.col(col) - F.lit(m)) / F.lit(sd))


def scale_minmax(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """Min-max scaling to [0, 1] (C24), two-phase like scale_zscore;
    a constant column maps to 0.0 (ANSI-safe, no 0/0)."""
    lo, hi = df.agg(F.min(col), F.max(col)).first()
    if lo is None or hi is None or lo == hi:
        return df.withColumn(out or col, F.when(F.col(col).isNotNull(), F.lit(0.0)))
    return df.withColumn(
        out or col, (F.col(col) - F.lit(lo)) / (F.lit(hi) - F.lit(lo))
    )


def one_hot(
    df: DataFrame,
    col: str,
    values: list[str] | None = None,
    max_categories: int = 10_000,
) -> DataFrame:
    """One-hot indicator columns for each category (C22). If ``values``
    is None, derive the category list with a tiny distinct job first
    (fine interactively; pass it explicitly in pipelines). The implicit
    derivation is capped at ``max_categories`` — a high-cardinality
    column (user ids, free text) fails loud instead of collecting
    millions of rows to the driver and emitting millions of columns."""
    if values is None:
        rows = df.select(col).distinct().limit(max_categories + 1).collect()
        if len(rows) > max_categories:
            raise ValueError(
                f"one_hot: column {col!r} has more than {max_categories} "
                "distinct values; pass explicit `values` (or raise "
                "`max_categories`) — implicit derivation on a "
                "high-cardinality column would explode the schema"
            )
        # NULL is absence, not a category — and sorted() below would
        # raise a confusing TypeError on a None mixed into strings
        values = [r[0] for r in rows if r[0] is not None]
    cols: dict[str, F.Column] = {}
    for v in sorted(values):
        name = f"{col}__{str(v).lower().replace(' ', '_').replace('-', '_')}"
        if name in cols:
            # distinct categories ('A-B' vs 'a b') collapsing to one
            # normalized name would silently drop an indicator
            raise ValueError(
                f"one_hot: categories collide on normalized column name {name!r}; "
                "pass explicit disambiguated values"
            )
        cols[name] = F.when(F.col(col) == v, 1).otherwise(0).cast("int")
    return df.withColumns(cols)


def redact_patterns(
    df: DataFrame, col: str, patterns: dict[str, str], out: str | None = None
) -> DataFrame:
    """Mask every regex match with its placeholder (L16)."""
    c = F.col(col)
    for pat, repl in patterns.items():
        c = F.regexp_replace(c, pat, repl)
    return df.withColumn(out or col, c)

# ---------------------------------------------------------------------------
# C21: resample an event stream onto a regular time grid (pandas asfreq/ffill)
# ---------------------------------------------------------------------------


@register(
    "c21_resample_timeseries",
    oracle=(
        "WITH ev AS (SELECT user_id, ts, value FROM events WHERE user_id % 15 = 0), "
        "b AS (SELECT user_id, date_trunc('hour', ts) AS h, "
        f"{exact.dsum_sql('value')} AS v, CAST(COUNT(*) AS BIGINT) AS n FROM ev GROUP BY 1, 2), "
        "rng AS (SELECT user_id, MIN(date_trunc('hour', ts)) AS h0, "
        "MAX(date_trunc('hour', ts)) AS h1 FROM ev GROUP BY 1), "
        "grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h FROM rng) "
        "SELECT g.user_id, g.h, COALESCE(b.n, 0) AS n_events, "
        "last_value(b.v IGNORE NULLS) OVER (PARTITION BY g.user_id ORDER BY g.h "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled "
        "FROM grid g LEFT JOIN b ON g.user_id = b.user_id AND g.h = b.h "
        "ORDER BY g.user_id, g.h"
    ),
    tags=("C21", "C6"),
)
def c21_resample_timeseries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C21: pandas resample('1H').sum().ffill() — regularize per-user
    events onto an hourly grid, zero-count empty buckets, forward-fill
    the value. The grid is sequence()+explode per user (distributed —
    no driver loop, no crossJoin with a calendar table); the ffill
    window partitions by user so no global-order funnel exists at
    scale."""
    ev = (
        T(spark, sf_dir, "events")
        .where(F.col("user_id") % 15 == 0)
        .select("user_id", "ts", "value")
    )
    h = F.date_trunc("hour", F.col("ts"))
    b = ev.groupBy("user_id", h.alias("h")).agg(
        exact.dsum("value").alias("v"), F.count(F.lit(1)).alias("n")
    )
    rng = ev.groupBy("user_id").agg(
        F.min(h).alias("h0"), F.max(h).alias("h1")
    )
    grid = rng.select(
        "user_id",
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(b, ["user_id", "h"], "left")
        .select(
            "user_id",
            "h",
            F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n_events"),
            F.last("v", ignorenulls=True).over(w).alias("v_filled"),
        )
        .orderBy("user_id", "h")
    )


# ---------------------------------------------------------------------------
# C22: one-hot encoding
# ---------------------------------------------------------------------------

_PRIORITIES = ("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")


@register(
    "c22_one_hot",
    oracle=(
        "SELECT o_orderkey, "
        + ", ".join(
            f"CAST(CASE WHEN o_orderpriority = '{p}' THEN 1 ELSE 0 END AS INTEGER) AS is_p{i + 1}"
            for i, p in enumerate(_PRIORITIES)
        )
        + " FROM orders ORDER BY o_orderkey"
    ),
    tags=("C22",),
)
def c22_one_hot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C22: one-hot encode a low-cardinality category (pandas
    get_dummies). Pure projection — codegen, zero shuffles; the
    category list comes from a tiny distinct scan in the interactive
    flow and is baked into the plan as literals."""
    o = T(spark, sf_dir, "orders")
    cols = [F.col("o_orderkey")] + [
        F.when(F.col("o_orderpriority") == p, 1)
        .otherwise(0)
        .cast("int")
        .alias(f"is_p{i + 1}")
        for i, p in enumerate(_PRIORITIES)
    ]
    return o.select(*cols).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# C23: binning (equal-width + quantile)
# ---------------------------------------------------------------------------


@register(
    "c23_binning",
    oracle=(
        "WITH s AS (SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi FROM lineitem), "
        "q AS (SELECT QUANTILE_CONT(l_extendedprice, 0.25) AS q1, "
        "QUANTILE_CONT(l_extendedprice, 0.5) AS q2, "
        "QUANTILE_CONT(l_extendedprice, 0.75) AS q3 FROM lineitem) "
        "SELECT l_orderkey, l_linenumber, "
        "CAST(LEAST(FLOOR((l_extendedprice - lo) / ((hi - lo) / 10.0)), 9.0) AS INTEGER) AS width_bin, "
        "CAST(CASE WHEN l_extendedprice <= q1 THEN 1 WHEN l_extendedprice <= q2 THEN 2 "
        "WHEN l_extendedprice <= q3 THEN 3 ELSE 4 END AS INTEGER) AS quartile "
        "FROM lineitem, s, q ORDER BY l_orderkey, l_linenumber"
    ),
    tags=("C23", "P7"),
)
def c23_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C23: per-row bin labels — equal-width (10 bins over [min, max])
    and quantile bins against exact quartile boundaries. Boundary-
    compare binning is tie-deterministic (unlike ntile, whose output
    depends on row order within ties). Two-phase: one tiny scalar job
    for bounds, then a single codegen labeling pass."""
    from ipydataclean_spark.functions.quantiles import exact_quantiles

    li = T(spark, sf_dir, "lineitem")
    lo, hi = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
    q1, q2, q3 = exact_quantiles(li, "l_extendedprice", [0.25, 0.5, 0.75])
    x = F.col("l_extendedprice")
    width = (F.lit(hi) - F.lit(lo)) / F.lit(10.0)
    width_bin = F.least(F.floor((x - F.lit(lo)) / width), F.lit(9.0)).cast("int")
    quartile = (
        F.when(x <= q1, 1).when(x <= q2, 2).when(x <= q3, 3).otherwise(4).cast("int")
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        width_bin.alias("width_bin"),
        quartile.alias("quartile"),
    ).orderBy("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# C24: feature scaling (min-max + z-score)
# ---------------------------------------------------------------------------


@register(
    "c24_feature_scaling",
    oracle=(
        "WITH s AS (SELECT MIN(l_quantity) AS lo, MAX(l_quantity) AS hi, "
        f"{exact.davg_sql('l_quantity')} AS m, {exact.dstddev_sql('l_quantity')} AS sd FROM lineitem) "
        "SELECT l_orderkey, l_linenumber, "
        "(l_quantity - lo) / (hi - lo) AS minmax_scaled, "
        "(l_quantity - m) / sd AS z_scaled "
        "FROM lineitem, s ORDER BY l_orderkey, l_linenumber"
    ),
    tags=("C24", "C2"),
)
def c24_feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C24: min-max and z-score scaling, two-phase (scalar agg →
    literal substitution). The mean/stddev are order-independent
    decimal forms (functions/exact.py) so the scaled values are
    bit-identical at any partition count."""
    li = T(spark, sf_dir, "lineitem")
    lo, hi, m, sd = li.agg(
        F.min("l_quantity"),
        F.max("l_quantity"),
        exact.davg("l_quantity"),
        exact.dstddev("l_quantity"),
    ).first()
    x = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        ((x - F.lit(lo)) / (F.lit(hi) - F.lit(lo))).alias("minmax_scaled"),
        ((x - F.lit(m)) / F.lit(sd)).alias("z_scaled"),
    ).orderBy("l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# L16: PII redaction (corpus curation)
# ---------------------------------------------------------------------------

# deterministic PII injection (dirty.py discipline): every 7th doc
# gains a synthetic email + phone, in the shared SQL dialect.
PII_TEXT = (
    "CASE WHEN doc_id % 7 = 0 THEN CONCAT(text, ' contact user', "
    "CAST(doc_id AS STRING), '@example.com or +1-555-', "
    "CAST(doc_id % 10000 AS STRING)) ELSE text END"
)
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+"
_PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]+"


@register(
    "l16_pii_redact",
    oracle=(
        f"WITH p AS (SELECT doc_id, {PII_TEXT} AS text FROM documents) "
        "SELECT doc_id, "
        f"regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '[EMAIL]', 'g'), "
        f"'{_PHONE_RE}', '[PHONE]', 'g') AS redacted, "
        f"(regexp_matches(text, '{_EMAIL_RE}')) AS had_email "
        "FROM p ORDER BY doc_id"
    ),
    tags=("L16", "L7"),
)
def l16_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L16: PII scrubbing before training — mask emails/phones with
    placeholder tokens. One codegen regexp pass over the corpus; at
    100 TB this is a map-only stage (no shuffle), and the had_email
    flag feeds the curation audit trail."""
    docs = T(spark, sf_dir, "documents").select(
        "doc_id", F.expr(PII_TEXT).alias("text")
    )
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "[EMAIL]"),
        _PHONE_RE,
        "[PHONE]",
    )
    return docs.select(
        "doc_id",
        redacted.alias("redacted"),
        F.col("text").rlike(_EMAIL_RE).alias("had_email"),
    ).orderBy("doc_id")


@register(
    "c29_target_encode",
    oracle=(
        "WITH g AS (SELECT o_orderpriority AS cat, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS s, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM orders GROUP BY 1) "
        "SELECT o_orderkey, o_orderpriority, "
        "ROUND((s - CAST(o_totalprice AS DOUBLE)) / CAST(n - 1 AS DOUBLE), 8) "
        "AS te_priority "
        "FROM orders JOIN g ON o_orderpriority = g.cat "
        "WHERE o_orderkey % 200 = 0 ORDER BY o_orderkey"
    ),
    tags=("C29", "C22", "featprep"),
)
def c29_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C29: leave-one-out mean target encoding — replace a category
    with the mean target of the OTHER rows in its category
    ((sum − own)/(n − 1)), the standard leakage guard over naive mean
    encoding. Two-phase: per-category (decimal-exact sum, count) is a
    tiny partial-agg table BROADCAST back onto the fact rows — no
    fact-side re-shuffle, no window over the fact table. The
    subtraction/division are the same two IEEE ops both engines."""
    o = T(spark, sf_dir, "orders")
    g = o.groupBy(F.col("o_orderpriority").alias("cat")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).cast("double").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    te = (F.col("s") - F.col("o_totalprice").cast("double")) / (
        F.col("n") - 1
    ).cast("double")
    return (
        o.where(F.col("o_orderkey") % 200 == 0)
        .join(F.broadcast(g), o.o_orderpriority == F.col("cat"))
        .select("o_orderkey", "o_orderpriority", F.round(te, 8).alias("te_priority"))
        .orderBy("o_orderkey")
    )


@register(
    "c33_robust_scale",
    oracle=(
        "WITH s AS (SELECT QUANTILE_CONT(l_quantity, 0.25) AS q1, "
        "QUANTILE_CONT(l_quantity, 0.5) AS q2, "
        "QUANTILE_CONT(l_quantity, 0.75) AS q3 FROM lineitem) "
        "SELECT l_orderkey, l_linenumber, "
        "ROUND((l_quantity - q2) / (q3 - q1), 8) AS robust_scaled "
        "FROM lineitem, s ORDER BY l_orderkey, l_linenumber"
    ),
    tags=("C24", "C33", "featprep"),
)
def c33_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C33: ROBUST scaling — (x − median) / IQR, the outlier-immune
    alternative to z-score (one injected 1000× price would drag a
    mean/stddev scaler's parameters; the median and quartiles don't
    move). Same two-phase shape as c24: the three quartiles come from
    the histogram-refinement exact path (functions/quantiles —
    interpolated, ≡ QUANTILE_CONT, O(1) executor memory), then one
    literal-substituted codegen pass over the table; no window, no
    join."""
    from ipydataclean_spark.functions.quantiles import exact_quantiles

    li = T(spark, sf_dir, "lineitem")
    q1, q2, q3 = exact_quantiles(li, "l_quantity", [0.25, 0.5, 0.75])
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.round(
                (F.col("l_quantity") - F.lit(q2)) / F.lit(q3 - q1), 8
            ).alias("robust_scaled"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


def value_cluster_mapping(df: DataFrame, col: str) -> tuple[DataFrame, DataFrame]:
    """The fingerprint-clustering core shared by c34 (report), c35
    (bulk repair), and Recipe.standardize_values — ONE definition of
    the clustering rule so the report, the repair, and the recipe can
    never desynchronize (round-5 second-session review).

    Returns (variants (fp, raw, n), canonical (fp, canonical)):
    fingerprint = lower+trim (swap in a token-sort or phonetic key for
    messier data — every caller inherits it), canonical = each
    cluster's most frequent raw variant, ties to the
    lexicographically first. Both tables are variant-cardinality-sized
    (two partial-agg shuffles + a window over the tiny variant
    table), never row-proportional."""
    fp = F.lower(F.trim(F.col(col)))
    v = df.groupBy(fp.alias("fp"), F.col(col).alias("raw")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("fp").orderBy(F.desc("n"), F.asc("raw"))
    canon = (
        v.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("fp", F.col("raw").alias("canonical"))
    )
    return v, canon


def standardize_values_cluster(
    df: DataFrame, col: str, out: str | None = None
) -> DataFrame:
    """Bulk value standardization behind Recipe.standardize_values
    (c34/c35 machinery): fingerprint-cluster the column's variants
    (value_cluster_mapping), then replace every raw value with its
    cluster canonical via a broadcast join. NULLs pass through
    unchanged. The mapping table is variant-cardinality-sized — the
    apply never shuffles the fact side."""
    tgt = out or col
    fp = F.lower(F.trim(F.col(col)))
    _, canon = value_cluster_mapping(df.where(F.col(col).isNotNull()), col)
    canon = canon.select(
        F.col("fp").alias("__fp"), F.col("canonical").alias("__canonical")
    )
    joined = df.join(F.broadcast(canon), fp == F.col("__fp"), "left")
    std = F.coalesce(F.col("__canonical"), F.col(col))
    if tgt == col:
        result = joined.withColumn(col, std)
    else:
        result = joined.withColumn(tgt, std)
    return result.drop("__fp", "__canonical")
