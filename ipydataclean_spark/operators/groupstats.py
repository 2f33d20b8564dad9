"""Per-group statistics + ordered string aggregation + stratified
sampling — continuation coverage widening.

p5 (profiling.py) computes GLOBAL exact quantiles via histogram
refinement; p5b is the per-group form. Per-group quantile state is
bounded by the group's row count, so Spark's exact `percentile`
aggregate (sort-based buffer per group) is the right tool below
~10M rows/group; beyond that, run the global histogram-refinement
per partition-key slice (same code path, keyed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register


@register(
    "p5b_group_quantiles",
    oracle=(
        "SELECT l_returnflag, "
        "QUANTILE_CONT(l_extendedprice, 0.5) AS median_price, "
        "QUANTILE_CONT(l_extendedprice, 0.9) AS p90_price "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("P5", "R11"),
)
def p5b_group_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5b: exact per-group quantiles. Both engines interpolate as
    lower + (upper − lower)·frac at rank p·(n−1), so the doubles are
    bit-identical and hash-checkable."""
    li = T(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("median_price"),
            F.percentile("l_extendedprice", F.lit(0.9)).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "r14b_listagg",
    oracle=(
        "SELECT l_returnflag, "
        "string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses, "
        "string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority) AS priorities "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("R14",),
)
def r14b_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R14b: ordered string aggregation (listagg/string_agg). Rendered
    as array_sort(collect_set)→array_join: deterministic output
    independent of partitioning (collect order never leaks into the
    result), identical to both engines' ORDER BY string_agg."""
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    j = li.join(o, li.l_orderkey == o.o_orderkey)
    return (
        j.groupBy("l_returnflag")
        .agg(
            F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias(
                "statuses"
            ),
            F.array_join(F.array_sort(F.collect_set("o_orderpriority")), "|").alias(
                "priorities"
            ),
        )
        .orderBy("l_returnflag")
    )


@register("r22b_stratified_sample", oracle=None, tags=("R22",))
def r22b_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R22b: stratified sampling — per-stratum Bernoulli fractions via
    sampleBy (seeded; rows-only check: sampling RNG is engine-
    specific). The 100 TB preview tool: bound every stratum's sample
    instead of letting a dominant stratum swamp a uniform sample."""
    li = T(spark, sf_dir, "lineitem")
    frac = {"A": 0.05, "N": 0.01, "R": 0.05}
    return (
        li.sampleBy("l_returnflag", frac, seed=42)
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag")
    )


@register(
    "w6_validity_intervals",
    oracle=(
        "WITH s AS (SELECT o_custkey, o_orderdate, o_orderstatus, "
        "lag(o_orderstatus) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_status, "
        "o_orderkey FROM orders), "
        "chg AS (SELECT o_custkey, o_orderdate, o_orderstatus, o_orderkey FROM s "
        "WHERE prev_status IS NULL OR prev_status <> o_orderstatus) "
        "SELECT o_custkey, o_orderstatus AS status, o_orderdate AS valid_from, "
        "lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to "
        "FROM chg ORDER BY o_custkey, valid_from, status"
    ),
    tags=("W6", "W2"),
)
def w6_validity_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: SCD2-style validity intervals — collapse a change stream to
    [valid_from, valid_to) rows per key (open interval = current).
    Two keyed windows (lag to find change points, lead to close the
    interval); no self-join, no global order. The MERGE-shaped upsert
    twin is c18_merge_upsert."""
    from pyspark.sql import Window

    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = o.withColumn(
        "prev_status", F.lag("o_orderstatus").over(w)
    ).where(
        F.col("prev_status").isNull()
        | (F.col("prev_status") != F.col("o_orderstatus"))
    )
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return chg.select(
        "o_custkey",
        F.col("o_orderstatus").alias("status"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w2).alias("valid_to"),
    ).orderBy("o_custkey", "valid_from", "status")


@register(
    "c25_hash_split",
    oracle=(
        "SELECT CAST(SUM(CASE WHEN md5(CAST(l_orderkey AS STRING)) < 'cccccccc' "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_train, "
        "CAST(SUM(CASE WHEN md5(CAST(l_orderkey AS STRING)) >= 'cccccccc' "
        "THEN 1 ELSE 0 END) AS BIGINT) AS n_test, "
        "CAST(COUNT(*) AS BIGINT) AS n_total FROM lineitem"
    ),
    tags=("C25", "R22"),
)
def c25_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C25: deterministic train/test split by hash of a stable key —
    the reproducible alternative to rand() sampling: every engine,
    run, and cluster size assigns each row identically, and new rows
    never reshuffle old assignments. md5-hex < 'cccccccc' ≈ 80%
    ('c'/16 = 0.75 + 0.05 from the next digit). One scan; the split
    predicate is codegen and pushes into downstream reads if the
    split column is persisted."""
    li = T(spark, sf_dir, "lineitem")
    h = F.md5(F.col("l_orderkey").cast("string"))
    is_train = h < "cccccccc"
    return li.agg(
        F.sum(is_train.cast("long")).alias("n_train"),
        F.sum((~is_train).cast("long")).alias("n_test"),
        F.count(F.lit(1)).alias("n_total"),
    )


def salted_sum(
    df: DataFrame, key: str, val, out: str, salt_n: int = 16
) -> DataFrame:
    """Two-stage skew-safe aggregation: stage 1 groups by (key, salt)
    — a hot key's rows spread over ``salt_n`` reducers — stage 2
    re-aggregates the per-salt partials by key. Decimal partials make
    the re-sum exact, so the result is identical to a direct groupBy
    at any salt_n. AQE's skew handling covers joins; aggregation-side
    hot keys still need this explicit spread when one key dominates a
    100 TB shuffle.

    The salt is ``spark_partition_id() % salt_n`` — deterministic under
    task retry (a retried task keeps its partition id), unlike
    rand()/monotonically_increasing_id() salts whose reassignment on
    shuffle-retry can double-count partially-fetched map output. Each
    input partition lands on one reducer salt, which spreads a hot key
    across however many input partitions carry it."""
    part = (
        df.withColumn("__salt", F.pmod(F.spark_partition_id().cast("long"), F.lit(salt_n)))
        .groupBy(key, "__salt")
        .agg(F.sum(val.cast("decimal(28,6)")).alias("__p"))
    )
    return part.groupBy(key).agg(F.sum("__p").cast("double").alias(out))


@register(
    "r11b_salted_agg",
    oracle=(
        "SELECT l_returnflag, CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) "
        "AS revenue FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("R11", "skew"),
)
def r11b_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11b: salted two-stage aggregation over a 3-value (maximally
    hot) grouping key — hash-checked identical to the direct groupBy
    because the partials are decimal-exact and associative."""
    li = T(spark, sf_dir, "lineitem")
    return salted_sum(
        li, "l_returnflag", F.col("l_extendedprice"), "revenue", salt_n=16
    ).orderBy("l_returnflag")


@register(
    "p27_weighted_median",
    oracle=(
        "WITH pw AS (SELECT l_returnflag, l_extendedprice AS price, "
        "SUM(CAST(l_quantity AS DECIMAL(28,6))) AS w "
        "FROM lineitem GROUP BY l_returnflag, l_extendedprice), "
        "c AS (SELECT l_returnflag, price, w, "
        "SUM(w) OVER (PARTITION BY l_returnflag ORDER BY price) AS cw, "
        "SUM(w) OVER (PARTITION BY l_returnflag) AS tw FROM pw) "
        "SELECT l_returnflag, "
        "MIN(CASE WHEN 2 * cw >= tw THEN price END) AS weighted_median_price, "
        "CAST(MAX(tw) AS DOUBLE) AS total_weight "
        "FROM c GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("P27", "P5", "W3"),
)
def p27_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P27: weighted median (price weighted by quantity) per group —
    the smallest price whose cumulative weight reaches half the total.

    Scale shape: phase 1 collapses the fact table to one row per
    (group, DISTINCT price) with an exact decimal weight sum — a
    map-side-combinable aggregate, so the windowed phase 2 runs over
    the value-cardinality table, not the raw rows (the standard
    pre-aggregation that keeps the per-group ordered scan bounded by
    distinct values; beyond ~10M distinct values per group the move is
    functions/quantiles.weighted_quantiles — the histogram-refinement
    scale path, IMPLEMENTED and equality-tested against this form in
    tests/test_properties.py).

    Exactness: weights stay DECIMAL through both window sums, so the
    2·cw ≥ tw threshold compares exact decimals on both engines; the
    selected price is a stored double, bit-identical.
    """
    from pyspark.sql import Window

    li = T(spark, sf_dir, "lineitem")
    pw = (
        li.groupBy("l_returnflag", F.col("l_extendedprice").alias("price"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("w"))
    )
    wc = Window.partitionBy("l_returnflag").orderBy("price")
    wt = Window.partitionBy("l_returnflag")
    c = pw.select(
        "l_returnflag",
        "price",
        F.sum("w").over(wc).alias("cw"),
        F.sum("w").over(wt).alias("tw"),
    )
    return (
        c.groupBy("l_returnflag")
        .agg(
            F.min(F.when(F.lit(2) * F.col("cw") >= F.col("tw"), F.col("price"))).alias(
                "weighted_median_price"
            ),
            F.max("tw").cast("double").alias("total_weight"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "c32_stratified_sample",
    oracle=(
        "SELECT o_orderkey, o_orderpriority, o_totalprice FROM orders "
        "WHERE md5(CAST(o_orderkey AS STRING)) < "
        "(CASE WHEN o_orderpriority = '1-URGENT' THEN '80000000' "
        "WHEN o_orderpriority = '2-HIGH' THEN '40000000' "
        "ELSE '1a000000' END) "
        "ORDER BY o_orderkey"
    ),
    tags=("C32", "R22", "sampling"),
)
def c32_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C32: DETERMINISTIC stratified sampling — per-stratum rates via
    an md5-hex threshold on a stable key (the c25 technique, extended
    to per-group rates): urgent orders keep ~50%, high ~25%, the rest
    ~10%. Unlike sampleBy/rand(), every engine, run, retry, and
    cluster size selects the IDENTICAL row set (so the sample is
    row-level hash-verifiable, and downsampling a 100 TB corpus is
    reproducible and appendable — new rows never reshuffle old
    assignments). Map-only: one scan, a codegen predicate, no
    shuffle; the per-stratum rate map is a literal CASE."""
    o = T(spark, sf_dir, "orders")
    h = F.md5(F.col("o_orderkey").cast("string"))
    thr = (
        F.when(F.col("o_orderpriority") == "1-URGENT", "80000000")
        .when(F.col("o_orderpriority") == "2-HIGH", "40000000")
        .otherwise("1a000000")
    )
    return (
        o.where(h < thr)
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
        .orderBy("o_orderkey")
    )
