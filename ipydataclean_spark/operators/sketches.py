"""Mergeable-sketch and data-layout operators — the 100 TB profile path.

At scale, exact per-slice distinct counts are recomputed constantly
(daily rollups, dashboard slices). The mergeable-sketch pattern builds
a small summary per partition/slice ONCE and answers every coarser
rollup by merging summaries — no fact rescan. Spark 4.x ships Apache
DataSketches HLL + Theta aggregates and exact roaring-bitmap
aggregates as built-ins; these ops exercise all three plus a Z-order
layout primitive for data-skipping writes.

Estimates are engine-specific (no DuckDB twin) → rows-only checks,
with error-bound pytest coverage (tests/test_sketches.py). The bitmap
op is EXACT and oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register

# ---------------------------------------------------------------------------
# P15: exact distinct via roaring-bitmap rollup (mergeable AND exact)
# ---------------------------------------------------------------------------


@register(
    "p15_bitmap_distinct",
    oracle=(
        "SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS n_distinct_parts "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("P15", "P3"),
)
def p15_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P15: exact distinct-count per group via bitmap rollup.
    groupBy(key, bucket) builds one roaring bitmap per 32k-id bucket
    (map-side partial, tiny state), then the per-key distinct is the
    SUM of bucket popcounts. Unlike COUNT(DISTINCT) this intermediate
    is mergeable: daily bitmaps OR together into monthly/era rollups
    without touching the fact table again."""
    li = T(spark, sf_dir, "lineitem")
    per_bucket = li.groupBy(
        "l_returnflag", F.bitmap_bucket_number("l_partkey").alias("bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("l_partkey")).alias("bm"))
    return (
        per_bucket.groupBy("l_returnflag")
        .agg(F.sum(F.bitmap_count("bm")).cast("long").alias("n_distinct_parts"))
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# P12: HLL sketch profile (approx distinct, mergeable)
# ---------------------------------------------------------------------------


@register("p12_hll_profile", oracle=None, tags=("P12", "P3"))
def p12_hll_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: per-source distinct-doc estimates from HLL sketches, plus
    the corpus-wide estimate obtained by MERGING the per-source
    sketches (hll_union_agg) — the rollup never rescans documents.
    DataSketches HLL, lgConfigK=12 → ~1.6% rsd, 2-4 KB per sketch;
    error bounds pinned in tests/test_sketches.py."""
    docs = T(spark, sf_dir, "documents")
    per_source = docs.groupBy("source").agg(
        F.hll_sketch_agg("doc_id", F.lit(12)).alias("sk")
    )
    per = per_source.select(
        "source", F.hll_sketch_estimate("sk").alias("n_distinct_est")
    )
    merged = per_source.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias(
            "n_distinct_est"
        )
    ).select(F.lit("__all__").alias("source"), "n_distinct_est")
    return per.unionByName(merged).orderBy("source")


# ---------------------------------------------------------------------------
# P14: Theta sketch set algebra (distinct users across event types)
# ---------------------------------------------------------------------------


@register("p14_theta_setops", oracle=None, tags=("P14", "P3"))
def p14_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14: audience set algebra without a self-join — Theta sketches
    support union/intersection/difference on the SUMMARIES. 'users who
    clicked AND purchased' at 100 TB is two sketch builds (one scan)
    plus O(sketch) set ops, vs a distinct-distinct join. Bounds pinned
    in tests/test_sketches.py."""
    ev = T(spark, sf_dir, "events")
    sk = ev.agg(
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "click", F.col("user_id"))
        ).alias("click_sk"),
        F.theta_sketch_agg(
            F.when(F.col("event_type") == "purchase", F.col("user_id"))
        ).alias("purchase_sk"),
    )
    return sk.select(
        F.theta_sketch_estimate("click_sk").cast("long").alias("n_click_users"),
        F.theta_sketch_estimate("purchase_sk").cast("long").alias("n_purchase_users"),
        F.theta_sketch_estimate(F.theta_union("click_sk", "purchase_sk"))
        .cast("long")
        .alias("n_either"),
        F.theta_sketch_estimate(F.theta_intersection("click_sk", "purchase_sk"))
        .cast("long")
        .alias("n_both"),
        F.theta_sketch_estimate(F.theta_difference("click_sk", "purchase_sk"))
        .cast("long")
        .alias("n_click_only"),
    )


# ---------------------------------------------------------------------------
# Z1: Z-order (Morton) interleaving for multi-column data skipping
# ---------------------------------------------------------------------------


def zvalue(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton code: interleave the low ``bits`` of two non-negative
    ints. Sorting/range-partitioning by this key clusters BOTH
    dimensions, so parquet row-group min/max stats prune scans on
    either column — the layout trick behind Delta/Iceberg OPTIMIZE
    ZORDER, here as a pure codegen expression."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1).cast("long")), 2 * i)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(y, i).bitwiseAND(F.lit(1).cast("long")), 2 * i + 1
            )
        )
    return z


def zvalue_sql(x: str, y: str, bits: int = 8) -> str:
    """DuckDB twin of :func:`zvalue` (same bit algebra, infix ops)."""
    parts = []
    for i in range(bits):
        parts.append(f"((({x} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "CAST((" + " | ".join(parts) + ") AS BIGINT)"


@register(
    "z1_zorder_values",
    oracle=(
        "WITH b AS (SELECT l_orderkey, l_linenumber, "
        "CAST(l_partkey % 256 AS BIGINT) AS bx, CAST(l_suppkey % 256 AS BIGINT) AS by_ FROM lineitem) "
        f"SELECT l_orderkey, l_linenumber, bx, by_, {zvalue_sql('bx', 'by_')} AS zval "
        "FROM b ORDER BY zval, l_orderkey, l_linenumber LIMIT 200"
    ),
    tags=("Z1",),
)
def z1_zorder_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z1: Morton z-values over bucketed (partkey, suppkey) — the sort
    key a layout-optimizing writer range-partitions on (see
    tests/test_sketches.py for the file-skipping assertion)."""
    li = T(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_partkey") % 256).cast("long").alias("bx"),
        (F.col("l_suppkey") % 256).cast("long").alias("by_"),
    )
    return (
        li.withColumn("zval", zvalue(F.col("bx"), F.col("by_")))
        .orderBy("zval", "l_orderkey", "l_linenumber")
        .limit(200)
    )


def zorder_write(
    df: DataFrame, path: str, x: str, y: str, n_files: int = 8, bits: int = 8
) -> None:
    """Write ``df`` parquet range-partitioned by the z-value of
    (x % 2^bits, y % 2^bits): each output file covers a compact z-range,
    so per-file min/max footer stats on BOTH x and y are tight and
    selective scans skip most files."""
    mod = 1 << bits
    z = zvalue((F.col(x) % mod).cast("long"), (F.col(y) % mod).cast("long"), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
