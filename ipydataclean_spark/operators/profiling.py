"""Profiling / column statistics — SURVEY.md §2.2 (P1-P10).

The reference's profiling scan [P] computes per-column dtype, null
counts, distribution stats and histograms to drive its UI. Here each
profile is a Spark aggregate; the engine rule for 100 TB is ONE wide
agg per table (single scan, map-side partial aggregation), never one
job per column.

Exactness: float sums/avgs/stddevs route through DECIMAL
(functions/exact.py) so results are partition-order independent —
identical on local[32] and a 1000-executor cluster, and hash-equal to
the DuckDB oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, FloatType, NumericType

from ipydataclean_spark.functions import exact
from ipydataclean_spark.operators.qhelp import T, lineitem_dirty, with_lineitem_dirty
from ipydataclean_spark.registry import register

# ---------------------------------------------------------------------------
# Reusable profiling API (the engine surface mirroring the reference)
# ---------------------------------------------------------------------------


def profile_exprs(df: DataFrame, cols: list[str] | None = None) -> list[F.Column]:
    """P10: fused profile expressions for one wide agg — P1/P2/P3(approx)/P4."""
    cols = cols or df.columns
    exprs: list[F.Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        field = df.schema[c]
        exprs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"))
        exprs.append(F.approx_count_distinct(c).alias(f"{c}__approx_distinct"))
        if isinstance(field.dataType, NumericType):
            exprs.append(F.min(c).alias(f"{c}__min"))
            exprs.append(F.max(c).alias(f"{c}__max"))
            if isinstance(field.dataType, (DoubleType, FloatType)):
                exprs.append(exact.dsum(c).alias(f"{c}__sum"))
            else:
                exprs.append(exact.isum(c).alias(f"{c}__sum"))
    return exprs


def profile(df: DataFrame, cols: list[str] | None = None) -> dict:
    """Single-scan whole-table profile (driver UI analogue). One job."""
    row = df.agg(*profile_exprs(df, cols)).first()
    return row.asDict()


def histogram(df: DataFrame, col: str, n_buckets: int = 20) -> DataFrame:
    """P7: two-phase histogram — tiny min/max job, then one bucketized agg.

    No crossJoin of the scalar bounds: they come back to the driver
    (constant-size) and are embedded as literals, so the big scan stays
    a single stage with map-side combine.
    """
    lo, hi = df.agg(F.min(col), F.max(col)).first()
    width = (hi - lo) / n_buckets if hi != lo else 1.0
    bucket = F.least(
        F.floor((F.col(col) - F.lit(lo)) / F.lit(width)), F.lit(n_buckets - 1)
    ).cast("long")
    return (
        df.where(F.col(col).isNotNull())
        .groupBy(bucket.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Registered queries (driver correctness gate)
# ---------------------------------------------------------------------------


@register(
    "p1_table_counts",
    oracle=" UNION ALL ".join(
        f"SELECT '{t}' AS tbl, COUNT(*) AS n_rows FROM {t}"
        for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings")
    ),
    tags=("P1",),
)
def p1_table_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 row count for every catalog table, one row per table."""
    tables = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem", "events", "documents", "embeddings")
    parts = [
        T(spark, sf_dir, t).agg(F.count(F.lit(1)).alias("n_rows")).select(F.lit(t).alias("tbl"), "n_rows")
        for t in tables
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


@register(
    "p2_null_profile",
    oracle=with_lineitem_dirty(
        "SELECT COUNT(*) AS n_rows, "
        "CAST(SUM(CASE WHEN quantity_str IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
        "(CAST(SUM(CASE WHEN quantity_str IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)) AS null_frac "
        "FROM lineitem_dirty"
    ),
    tags=("P2", "D1"),
)
def p2_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 null count / fraction over the dirty string column."""
    df = lineitem_dirty(spark, sf_dir)
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("quantity_str").isNull().cast("long")).alias("n_null"),
        (F.sum(F.col("quantity_str").isNull().cast("long")).cast("double") / F.count(F.lit(1))).alias("null_frac"),
    )


@register(
    "p3_distinct_counts",
    oracle=(
        "SELECT CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS d_returnflag, "
        "CAST(COUNT(DISTINCT l_linestatus) AS BIGINT) AS d_linestatus, "
        "CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS d_partkey, "
        "CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS d_orderkey FROM lineitem"
    ),
    tags=("P3",),
)
def p3_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 exact distinct counts (scale path: approx_count_distinct)."""
    df = T(spark, sf_dir, "lineitem")
    return df.agg(
        F.countDistinct("l_returnflag").alias("d_returnflag"),
        F.countDistinct("l_linestatus").alias("d_linestatus"),
        F.countDistinct("l_partkey").alias("d_partkey"),
        F.countDistinct("l_orderkey").alias("d_orderkey"),
    )


@register(
    "p4_numeric_profile",
    oracle=(
        "SELECT MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty, "
        f"{exact.davg_sql('l_quantity')} AS avg_qty, "
        f"{exact.dstddev_sql('l_quantity')} AS std_qty, "
        "MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price, "
        f"{exact.davg_sql('l_extendedprice')} AS avg_price, "
        f"{exact.dstddev_sql('l_extendedprice')} AS std_price FROM lineitem"
    ),
    tags=("P4",),
)
def p4_numeric_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 min/max/mean/stddev numeric profile, one scan, exact."""
    df = T(spark, sf_dir, "lineitem")
    return df.agg(
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        exact.davg("l_quantity").alias("avg_qty"),
        exact.dstddev("l_quantity").alias("std_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        exact.davg("l_extendedprice").alias("avg_price"),
        exact.dstddev("l_extendedprice").alias("std_price"),
    )


@register(
    "p5_quantiles",
    oracle=(
        "SELECT MEDIAN(l_extendedprice) AS med_price, "
        "QUANTILE_CONT(l_extendedprice, 0.25) AS q25_price, "
        "QUANTILE_CONT(l_extendedprice, 0.75) AS q75_price, "
        "MEDIAN(o_totalprice_all) AS med_total FROM ("
        "SELECT l_extendedprice, NULL AS o_totalprice_all FROM lineitem "
        "UNION ALL SELECT NULL, o_totalprice FROM orders)"
    ),
    tags=("P5",),
)
def p5_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 exact median/quantiles (scale path: percentile_approx knob)."""
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice"), F.lit(None).cast("double").alias("o_totalprice_all")
    )
    od = T(spark, sf_dir, "orders").select(
        F.lit(None).cast("double").alias("l_extendedprice"), F.col("o_totalprice").alias("o_totalprice_all")
    )
    u = li.unionByName(od)
    return u.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("med_price"),
        F.expr("percentile(l_extendedprice, 0.25)").alias("q25_price"),
        F.expr("percentile(l_extendedprice, 0.75)").alias("q75_price"),
        F.expr("percentile(o_totalprice_all, 0.5)").alias("med_total"),
    )


@register(
    "p6_mode",
    oracle=(
        "SELECT l_quantity AS mode_qty, CAST(cnt AS BIGINT) AS mode_n FROM ("
        "SELECT l_quantity, COUNT(*) AS cnt FROM lineitem GROUP BY l_quantity) "
        "ORDER BY cnt DESC, l_quantity ASC LIMIT 1"
    ),
    tags=("P6",),
)
def p6_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 mode with deterministic tie-break (max count, then min value)."""
    df = T(spark, sf_dir, "lineitem")
    return (
        df.groupBy(F.col("l_quantity").alias("mode_qty"))
        .agg(F.count(F.lit(1)).alias("mode_n"))
        .orderBy(F.desc("mode_n"), F.asc("mode_qty"))
        .limit(1)
    )


@register(
    "p7_histogram",
    oracle=(
        "WITH bounds AS (SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi FROM lineitem) "
        "SELECT CAST(LEAST(FLOOR((l_extendedprice - lo) / ((hi - lo) / 20.0)), 19) AS BIGINT) AS bucket, "
        "COUNT(*) AS n FROM lineitem, bounds GROUP BY 1 ORDER BY bucket"
    ),
    tags=("P7",),
)
def p7_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 20-bucket histogram, two-phase (scalar bounds then one agg)."""
    df = T(spark, sf_dir, "lineitem")
    lo, hi = df.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).first()
    width = (hi - lo) / 20.0
    bucket = F.least(F.floor((F.col("l_extendedprice") - F.lit(lo)) / F.lit(width)), F.lit(19)).cast("long")
    return df.groupBy(bucket.alias("bucket")).agg(F.count(F.lit(1)).alias("n")).orderBy("bucket")


@register(
    "p8_castability",
    oracle=with_lineitem_dirty(
        "SELECT COUNT(quantity_str) AS n_nonnull, "
        "CAST(SUM(CASE WHEN TRY_CAST(quantity_str AS DOUBLE) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric, "
        "(CAST(SUM(CASE WHEN TRY_CAST(quantity_str AS DOUBLE) IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) "
        "/ COUNT(quantity_str)) AS frac_numeric "
        "FROM lineitem_dirty WHERE quantity_str IS NOT NULL"
    ),
    tags=("P8", "D6"),
)
def p8_castability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 castability profile: fraction of non-null strings parseable as
    double — drives the reference's string-mismatch suggestions [P]."""
    df = lineitem_dirty(spark, sf_dir).where(F.col("quantity_str").isNotNull())
    ok = F.expr("TRY_CAST(quantity_str AS DOUBLE)").isNotNull().cast("long")
    return df.agg(
        F.count("quantity_str").alias("n_nonnull"),
        F.sum(ok).alias("n_numeric"),
        (F.sum(ok).cast("double") / F.count("quantity_str")).alias("frac_numeric"),
    )


@register(
    "p9_topk_values",
    oracle=(
        "SELECT p_brand, COUNT(*) AS n FROM part GROUP BY p_brand "
        "ORDER BY n DESC, p_brand ASC LIMIT 10"
    ),
    tags=("P9", "R17"),
)
def p9_topk_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 top-k frequent values (deterministic tie-break by value)."""
    df = T(spark, sf_dir, "part")
    return (
        df.groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("p_brand"))
        .limit(10)
    )


@register(
    "p10_summary_bundle",
    oracle=(
        "SELECT COUNT(*) AS n_rows, "
        "CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS qty_nulls, "
        "MIN(l_quantity) AS qty_min, MAX(l_quantity) AS qty_max, "
        f"{exact.dsum_sql('l_quantity')} AS qty_sum, "
        "CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS disc_nulls, "
        "MIN(l_discount) AS disc_min, MAX(l_discount) AS disc_max, "
        f"{exact.dsum_sql('l_discount')} AS disc_sum, "
        "CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS price_nulls, "
        "MIN(l_extendedprice) AS price_min, MAX(l_extendedprice) AS price_max, "
        f"{exact.dsum_sql('l_extendedprice')} AS price_sum "
        "FROM lineitem"
    ),
    tags=("P10",),
)
def p10_summary_bundle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P10 fused multi-column profile — ONE scan for all columns (the
    100 TB rule: never one job per column)."""
    df = T(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c, tag in (("l_quantity", "qty"), ("l_discount", "disc"), ("l_extendedprice", "price")):
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{tag}_nulls"),
            F.min(c).alias(f"{tag}_min"),
            F.max(c).alias(f"{tag}_max"),
            exact.dsum(c).alias(f"{tag}_sum"),
        ]
    return df.agg(*aggs)


@register(
    "p11_column_entropy",
    oracle=(
        "WITH freq AS (SELECT o_orderpriority AS v, CAST(COUNT(*) AS DOUBLE) AS c "
        "FROM orders GROUP BY o_orderpriority), "
        "tot AS (SELECT CAST(SUM(CAST(c AS BIGINT)) AS DOUBLE) AS n FROM freq) "
        "SELECT ROUND(-SUM((c / n) * LN(c / n)), 8) AS entropy_nats, "
        "CAST(COUNT(*) AS BIGINT) AS n_distinct, "
        "ROUND(MAX(c / n), 8) AS top_fraction "
        "FROM freq CROSS JOIN tot"
    ),
    tags=("P11", "profiling"),
)
def p11_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: Shannon entropy of a categorical column (profiling signal
    the reference's per-column UI implies: uniformity / skew of the
    value distribution; also the split-quality metric feature
    pipelines compute). Two partial-aggregable stages: value counts,
    then -Σ p·ln p over the (distinct-values-sized) count table.
    LN is libm → rounded to 8 dp on both sides (module convention).
    ONE scan: the total is a window-sum over the tiny count table
    (its single-partition funnel holds |distinct| rows, not |table|),
    not a second pass over orders."""
    from pyspark.sql import Window

    freq = (
        T(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("v"))
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    total = F.sum(F.col("c").cast("long")).over(Window.partitionBy()).cast("double")
    freq = freq.withColumn("p", F.col("c") / total)
    p = F.col("p")
    return freq.agg(
        F.round(-F.sum(p * F.log(p)), 8).alias("entropy_nats"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.round(F.max(p), 8).alias("top_fraction"),
    )


@register(
    "p20_skew_profile",
    oracle=(
        "WITH c AS (SELECT l_partkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt "
        "FROM lineitem GROUP BY l_partkey), "
        "t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, "
        "CAST(SUM(cnt) AS BIGINT) AS total FROM c) "
        "SELECT key, cnt, "
        "ROUND(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE), 8) AS share, "
        "ROUND(CAST(cnt * n_keys AS DOUBLE) / CAST(total AS DOUBLE), 8) AS skew_ratio, "
        "CAST(CEIL(CAST(cnt * n_keys AS DOUBLE) / CAST(total AS DOUBLE)) AS INTEGER) AS suggested_salt "
        "FROM c CROSS JOIN t ORDER BY cnt DESC, key LIMIT 10"
    ),
    tags=("P20", "profiling", "scale"),
)
def p20_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P20: join-key skew audit — the pre-shuffle planning signal for
    salting/AQE decisions (groupstats.salted_sum consumes exactly this
    shape). Per hottest key: row count, share of table, skew ratio vs
    a uniform spread (cnt / (total/n_keys)), and the salt factor that
    would level it. Two partial-aggregable stages: per-key counts (one
    scan, map-side combine), then window totals over the
    |distinct-keys|-sized count table — never a second fact scan.
    skew_ratio is computed as (cnt·n_keys)/total — one integer product
    and ONE double division, the same IEEE op order both engines."""
    from pyspark.sql import Window

    counts = (
        T(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("key"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy()
    counts = counts.withColumn("n_keys", F.count(F.lit(1)).over(w)).withColumn(
        "total", F.sum("cnt").over(w)
    )
    ratio = (F.col("cnt") * F.col("n_keys")).cast("double") / F.col("total").cast("double")
    return (
        counts.select(
            "key",
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("total").cast("double"), 8).alias("share"),
            F.round(ratio, 8).alias("skew_ratio"),
            F.ceil(ratio).cast("int").alias("suggested_salt"),
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(10)
    )


@register(
    "p28_histogram_2d",
    oracle=(
        "WITH b AS (SELECT "
        "CAST(LEAST(CAST(FLOOR(l_quantity / 10.0) AS INT), 4) AS INT) AS qty_bin, "
        "CAST(LEAST(CAST(FLOOR(l_discount / 0.02) AS INT), 4) AS INT) AS disc_bin "
        "FROM lineitem WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL) "
        "SELECT qty_bin, disc_bin, COUNT(*) AS n "
        "FROM b GROUP BY qty_bin, disc_bin ORDER BY qty_bin, disc_bin"
    ),
    tags=("P28", "P7"),
)
def p28_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P28: two-dimensional histogram (quantity × discount density) —
    the binned heatmap a profiler draws instead of a 600M-point
    scatter. ONE scan, fixed 5×5 equi-width grid with a top clamp, a
    bounded-cardinality groupBy: the classic scatter-at-scale move
    (bin server-side, render the ≤25-cell grid client-side)."""
    li = T(spark, sf_dir, "lineitem").where(
        F.col("l_quantity").isNotNull() & F.col("l_discount").isNotNull()
    )
    qty_bin = F.least(F.floor(F.col("l_quantity") / 10.0).cast("int"), F.lit(4))
    disc_bin = F.least(F.floor(F.col("l_discount") / 0.02).cast("int"), F.lit(4))
    return (
        li.groupBy(qty_bin.alias("qty_bin"), disc_bin.alias("disc_bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("qty_bin", "disc_bin")
    )


@register(
    "p30_functional_dependencies",
    oracle=(
        "WITH m AS (SELECT "
        "CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS d_key, "
        "CAST(COUNT(DISTINCT c_name) AS BIGINT) AS d_name, "
        "CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS d_seg, "
        "CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS d_nat, "
        "CAST(COUNT(DISTINCT (c_custkey, c_name)) AS BIGINT) AS d_key_name, "
        "CAST(COUNT(DISTINCT (c_custkey, c_mktsegment)) AS BIGINT) AS d_key_seg, "
        "CAST(COUNT(DISTINCT (c_nationkey, c_mktsegment)) AS BIGINT) AS d_nat_seg "
        "FROM customer) "
        "SELECT p.col_a, p.col_b, p.da, p.db, p.dab, "
        "CAST(p.dab = p.da AS INT) AS fd_a_to_b, "
        "CAST(p.dab = p.db AS INT) AS fd_b_to_a, "
        "CAST(p.dab = p.da AND p.dab = p.db AS INT) AS bijection "
        "FROM m, LATERAL (VALUES "
        "('c_custkey', 'c_name', m.d_key, m.d_name, m.d_key_name), "
        "('c_custkey', 'c_mktsegment', m.d_key, m.d_seg, m.d_key_seg), "
        "('c_nationkey', 'c_mktsegment', m.d_nat, m.d_seg, m.d_nat_seg)"
        ") AS p(col_a, col_b, da, db, dab) "
        "ORDER BY p.col_a, p.col_b"
    ),
    tags=("P30", "P3", "profiling"),
)
def p30_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P30: functional-dependency / duplicate-column discovery — for
    candidate column pairs, compare |distinct(a)|, |distinct(b)| and
    |distinct(a,b)|: dab = da means a → b (b is derivable from a);
    equality all around means the columns are 1:1 copies (the
    redundant-column signal a profiler surfaces before anyone joins
    on the wrong one). ONE scan computes every count (multi-distinct
    aggregate — Catalyst expands once, no per-pair rescans); the pair
    table is assembled driver-side from the 1-row result."""
    c = T(spark, sf_dir, "customer")
    m = c.agg(
        F.countDistinct("c_custkey").alias("d_key"),
        F.countDistinct("c_name").alias("d_name"),
        F.countDistinct("c_mktsegment").alias("d_seg"),
        F.countDistinct("c_nationkey").alias("d_nat"),
        F.countDistinct("c_custkey", "c_name").alias("d_key_name"),
        F.countDistinct("c_custkey", "c_mktsegment").alias("d_key_seg"),
        F.countDistinct("c_nationkey", "c_mktsegment").alias("d_nat_seg"),
    ).collect()[0]
    pairs = [
        ("c_custkey", "c_name", m["d_key"], m["d_name"], m["d_key_name"]),
        ("c_custkey", "c_mktsegment", m["d_key"], m["d_seg"], m["d_key_seg"]),
        ("c_nationkey", "c_mktsegment", m["d_nat"], m["d_seg"], m["d_nat_seg"]),
    ]
    rows = [
        (a, b, da, db, dab, int(dab == da), int(dab == db), int(dab == da == db))
        for a, b, da, db, dab in pairs
    ]
    return spark.createDataFrame(
        rows,
        "col_a string, col_b string, da long, db long, dab long, "
        "fd_a_to_b int, fd_b_to_a int, bijection int",
    ).orderBy("col_a", "col_b")


_P33_PAIRS = (
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("customer", "c_nationkey", "supplier", "s_nationkey"),
    ("orders", "o_orderkey", "customer", "c_custkey"),  # a NON-key pair
)

_P33_ORACLE = " UNION ALL ".join(
    "SELECT '" + f"{ta}.{ca}->{tb}.{cb}" + "' AS pair, "
    f"CAST((SELECT COUNT(DISTINCT {ca}) FROM {ta}) AS BIGINT) AS n_left, "
    f"CAST((SELECT COUNT(DISTINCT {cb}) FROM {tb}) AS BIGINT) AS n_right, "
    f"CAST((SELECT COUNT(*) FROM (SELECT DISTINCT {ca} FROM {ta}) a "
    f"JOIN (SELECT DISTINCT {cb} FROM {tb}) b ON a.{ca} = b.{cb}) AS BIGINT) "
    "AS n_common, "
    f"ROUND(CAST((SELECT COUNT(*) FROM (SELECT DISTINCT {ca} FROM {ta}) a "
    f"JOIN (SELECT DISTINCT {cb} FROM {tb}) b ON a.{ca} = b.{cb}) AS DOUBLE) "
    f"/ (SELECT COUNT(DISTINCT {ca}) FROM {ta}), 8) AS containment_lr"
    for ta, ca, tb, cb in _P33_PAIRS
) + " ORDER BY pair"


@register(
    "p33_joinability",
    oracle="SELECT * FROM (" + _P33_ORACLE + ") ORDER BY pair",
    tags=("P33", "P16", "P3", "profiling"),
)
def p33_joinability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P33: JOINABILITY DISCOVERY — for candidate column pairs, the
    distinct-value CONTAINMENT |A∩B| / |A| (the data-catalog signal
    that proposes foreign keys before anyone declares them: a true FK
    scores ~1.0, an unrelated pair near 0). p16 VALIDATES a declared
    FK; this one FINDS candidates — together they are the
    relationship-profiling loop. The fixture list plants one known
    non-key pair (orders.o_orderkey -> customer.c_custkey) so the
    score separation itself is value-checked.

    Plan: per pair, two distinct partial aggs + one distinct-keyed
    equi-join on the value — each input is the column's DISTINCT set
    (cardinality-bounded, never row-bounded after the first partial
    agg). At catalog scale the candidate list comes from minhash
    sketches over distinct sets (l2's machinery); these exact joins
    then confirm the shortlist."""
    out = None
    for ta, ca, tb, cb in _P33_PAIRS:
        a = T(spark, sf_dir, ta).select(F.col(ca).alias("v")).distinct()
        b = T(spark, sf_dir, tb).select(F.col(cb).alias("v")).distinct()
        # fully declarative: three 1-row aggregates combined by
        # crossJoin (no driver-side .count() round-trips), unioned
        # into ONE plan across all candidate pairs
        row = (
            a.agg(F.count(F.lit(1)).alias("n_left"))
            .crossJoin(b.agg(F.count(F.lit(1)).alias("n_right")))
            .crossJoin(a.join(b, "v").agg(F.count(F.lit(1)).alias("n_common")))
            .select(
                F.lit(f"{ta}.{ca}->{tb}.{cb}").alias("pair"),
                "n_left", "n_right", "n_common",
                F.round(
                    F.col("n_common").cast("double") / F.col("n_left"), 8
                ).alias("containment_lr"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("pair")
