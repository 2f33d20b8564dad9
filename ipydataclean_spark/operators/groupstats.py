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
