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


@register(
    "p12_hll_profile",
    oracle=(
        "SELECT source, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_distinct_exact, "
        "1 AS est_within_5pct FROM documents GROUP BY source "
        "UNION ALL SELECT '__all__', CAST(COUNT(DISTINCT doc_id) AS BIGINT), 1 FROM documents "
        "ORDER BY source"
    ),
    tags=("P12", "P3", "P15"),
)
def p12_hll_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12: per-source distinct-doc counts with HLL estimates checked
    IN-PLAN against an exact mergeable rollup. One scan builds BOTH
    summaries per (source, bitmap-bucket): a roaring bitmap (exact,
    mergeable — the p15 pattern) and a DataSketches HLL sketch
    (lgConfigK=12, ~1.6% rsd). Per-source and corpus-wide ('__all__')
    rollups then merge summaries only — no fact rescan.

    Driver-checkable promotion (was rows-only): the output carries the
    exact counts plus ``est_within_5pct`` = |hll_est − exact|/exact
    ≤ 0.05 as 0/1. The oracle computes the exact counts and expects 1 —
    if the sketch estimate ever drifts out of bounds, the row hashes
    red. HLL union is register-wise max, so merged estimates equal a
    single-pass sketch of the union exactly."""
    docs = T(spark, sf_dir, "documents")
    per_bucket = (
        docs.groupBy("source", F.bitmap_bucket_number("doc_id").alias("bucket"))
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position("doc_id")).alias("bm"),
            F.hll_sketch_agg("doc_id", F.lit(12)).alias("sk"),
        )
        .localCheckpoint(eager=False)  # tiny; both rollups reuse one scan
    )
    within = lambda est, ex: (  # noqa: E731
        (F.abs(est.cast("double") - ex) / ex) <= 0.05
    ).cast("int")
    per = per_bucket.groupBy("source").agg(
        F.sum(F.bitmap_count("bm")).cast("long").alias("n_distinct_exact"),
        F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias("est"),
    )
    per = per.select(
        "source", "n_distinct_exact", within(F.col("est"), F.col("n_distinct_exact")).alias("est_within_5pct")
    )
    overall = (
        per_bucket.groupBy("bucket")
        .agg(F.bitmap_or_agg("bm").alias("bm"), F.hll_union_agg("sk", F.lit(False)).alias("sk"))
        .agg(
            F.sum(F.bitmap_count("bm")).cast("long").alias("n_distinct_exact"),
            F.hll_sketch_estimate(F.hll_union_agg("sk", F.lit(False))).alias("est"),
        )
        .select(
            F.lit("__all__").alias("source"),
            "n_distinct_exact",
            within(F.col("est"), F.col("n_distinct_exact")).alias("est_within_5pct"),
        )
    )
    return per.unionByName(overall).orderBy("source")


# ---------------------------------------------------------------------------
# P14: Theta sketch set algebra (distinct users across event types)
# ---------------------------------------------------------------------------


@register(
    "p14_theta_setops",
    oracle=(
        "SELECT CAST(COUNT(DISTINCT CASE WHEN event_type = 'click' THEN user_id END) AS BIGINT) AS n_click_users, "
        "CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase' THEN user_id END) AS BIGINT) AS n_purchase_users, "
        "CAST(COUNT(DISTINCT CASE WHEN event_type IN ('click','purchase') THEN user_id END) AS BIGINT) AS n_either, "
        "CAST((SELECT COUNT(*) FROM (SELECT user_id FROM events WHERE event_type = 'click' "
        "INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase') i) AS BIGINT) AS n_both, "
        "CAST((SELECT COUNT(*) FROM (SELECT user_id FROM events WHERE event_type = 'click' "
        "EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase') e) AS BIGINT) AS n_click_only, "
        "1 AS sketch_within_5pct FROM events"
    ),
    tags=("P14", "P3"),
)
def p14_theta_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P14: audience set algebra without a self-join — Theta sketches
    support union/intersection/difference on the SUMMARIES. 'users who
    clicked AND purchased' at 100 TB is two sketch builds (one scan)
    plus O(sketch) set ops, vs a distinct-distinct join.

    Driver-checkable promotion (was rows-only): the exact five counts
    come from the same scan (conditional distinct aggregates; the set
    ops the sketches replace at scale), and ``sketch_within_5pct``
    verifies ALL five theta estimates against them in-plan (theta is
    exact below its k=4096 retention, ±5% above). The oracle expects
    the exact counts and indicator 1 — sketch drift turns the driver
    row red."""
    ev = T(spark, sf_dir, "events")
    click = F.when(F.col("event_type") == "click", F.col("user_id"))
    purchase = F.when(F.col("event_type") == "purchase", F.col("user_id"))
    either = F.when(F.col("event_type").isin("click", "purchase"), F.col("user_id"))
    sk = ev.agg(
        F.theta_sketch_agg(click).alias("click_sk"),
        F.theta_sketch_agg(purchase).alias("purchase_sk"),
        F.count_distinct(click).alias("x_click"),
        F.count_distinct(purchase).alias("x_purchase"),
        F.count_distinct(either).alias("x_either"),
    )
    est = sk.select(
        "x_click",
        "x_purchase",
        "x_either",
        F.theta_sketch_estimate("click_sk").alias("e_click"),
        F.theta_sketch_estimate("purchase_sk").alias("e_purchase"),
        F.theta_sketch_estimate(F.theta_union("click_sk", "purchase_sk")).alias("e_either"),
        F.theta_sketch_estimate(F.theta_intersection("click_sk", "purchase_sk")).alias("e_both"),
        F.theta_sketch_estimate(F.theta_difference("click_sk", "purchase_sk")).alias("e_click_only"),
    )
    # inclusion-exclusion closes the exact both/only counts from the
    # three conditional distincts — still the single scan
    est = est.withColumn("x_both", F.col("x_click") + F.col("x_purchase") - F.col("x_either"))
    est = est.withColumn("x_click_only", F.col("x_click") - F.col("x_both"))
    ok = F.lit(True)
    for e, x in (
        ("e_click", "x_click"),
        ("e_purchase", "x_purchase"),
        ("e_either", "x_either"),
        ("e_both", "x_both"),
        ("e_click_only", "x_click_only"),
    ):
        ok = ok & (
            F.abs(F.col(e) - F.col(x).cast("double"))
            <= 0.05 * F.greatest(F.col(x).cast("double"), F.lit(1.0))
        )
    return est.select(
        F.col("x_click").cast("long").alias("n_click_users"),
        F.col("x_purchase").cast("long").alias("n_purchase_users"),
        F.col("x_either").cast("long").alias("n_either"),
        F.col("x_both").cast("long").alias("n_both"),
        F.col("x_click_only").cast("long").alias("n_click_only"),
        ok.cast("int").alias("sketch_within_5pct"),
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


# ---------------------------------------------------------------------------
# P31: mergeable histogram-quantile sketch (slice-build -> merge -> estimate)
# ---------------------------------------------------------------------------

_P31_BINS = 1024
_P31_QS = (0.25, 0.5, 0.75, 0.95)

_P31_ORACLE = (
    "WITH mm AS (SELECT CAST(MIN(l_extendedprice) AS DOUBLE) AS lo, "
    "CAST(MAX(l_extendedprice) AS DOUBLE) AS hi, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem), "
    "binned AS (SELECT CAST(date_trunc('month', l_shipdate) AS DATE) AS slice, "
    f"LEAST({_P31_BINS - 1}, CAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - mm.lo) "
    f"/ ((mm.hi - mm.lo) / {_P31_BINS}.0) ) AS BIGINT)) AS bin "
    "FROM lineitem CROSS JOIN mm), "
    "sk AS (SELECT slice, bin, CAST(COUNT(*) AS BIGINT) AS cnt "
    "FROM binned GROUP BY slice, bin), "
    "merged AS (SELECT bin, CAST(SUM(cnt) AS BIGINT) AS cnt FROM sk GROUP BY bin), "
    "cum AS (SELECT bin, cnt, "
    "SUM(cnt) OVER (ORDER BY bin) AS cum, "
    "COALESCE(SUM(cnt) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING "
    "AND 1 PRECEDING), 0) AS cum_before FROM merged), "
    "qs AS (SELECT q, CAST(CEIL(q * mm.n) AS BIGINT) AS r, mm.lo, mm.hi "
    "FROM (VALUES (0.25), (0.5), (0.75), (0.95)) v(q) CROSS JOIN mm), "
    "hit AS (SELECT qs.q, qs.r, qs.lo, qs.hi, c.bin, c.cnt, c.cum_before, "
    "ROW_NUMBER() OVER (PARTITION BY qs.q ORDER BY c.bin) AS rn "
    "FROM qs JOIN cum c ON c.cum >= qs.r) "
    "SELECT CAST(q AS DOUBLE) AS q, "
    f"ROUND(lo + (CAST(bin AS DOUBLE) + (CAST(r - cum_before AS DOUBLE) "
    f"/ CAST(cnt AS DOUBLE))) * ((hi - lo) / {_P31_BINS}.0), 6) AS estimate, "
    f"ROUND((hi - lo) / {_P31_BINS}.0, 6) AS err_bound "
    "FROM hit WHERE rn = 1 ORDER BY q"
)


@register(
    "p31_quantile_sketch_merge",
    oracle=_P31_ORACLE,
    tags=("P31", "P5", "P12", "sketch"),
)
def p31_quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P31: MERGEABLE quantile sketch — the missing member of the
    sketch family (HLL=distinct, theta=set ops, bitmap=exact distinct,
    count-min=heavy hitters; this one = quantiles): build a 1024-bin
    equi-width histogram PER SLICE (month), MERGE slices by summing
    bin counts (the associative, order-independent sketch property —
    a t-digest/KLL drop-in at the same plan shape), and estimate
    quantiles from the merged histogram by interpolating inside the
    containing bin. Deterministic by construction, so unlike the HLL
    family it carries a full value-hash oracle; the error bound is one
    bin width, asserted against the EXACT engine quantiles in
    tests/test_sketches.py.

    Scale shape: the per-slice sketches are (slice x 1024)-bounded —
    persisted once, every coarser rollup (quarter, year, global) is a
    bin-count SUM with no fact rescan; the estimate runs on a
    1024-row table. Two fact passes total (min/max, then binning) at
    build time only."""
    li = T(spark, sf_dir, "lineitem")
    x = F.col("l_extendedprice").cast("double")
    mm = li.agg(
        F.min(x).alias("lo"), F.max(x).alias("hi"),
        F.count(F.lit(1)).alias("n"),
    )
    w = (F.col("hi") - F.col("lo")) / F.lit(float(_P31_BINS))
    binned = li.crossJoin(F.broadcast(mm)).select(
        F.date_trunc("month", "l_shipdate").cast("date").alias("slice"),
        F.least(
            F.lit(_P31_BINS - 1),
            F.floor((x - F.col("lo")) / w).cast("long"),
        ).alias("bin"),
    )
    sk = binned.groupBy("slice", "bin").agg(F.count(F.lit(1)).alias("cnt"))
    merged = sk.groupBy("bin").agg(F.sum("cnt").cast("long").alias("cnt"))
    from pyspark.sql import Window

    wo = Window.orderBy("bin")
    cum = merged.select(
        "bin", "cnt",
        F.sum("cnt").over(wo).alias("cum"),
        F.coalesce(
            F.sum("cnt").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        ).alias("cum_before"),
    )
    qs = (
        spark.range(1)
        .select(F.explode(F.array(*[F.lit(q) for q in _P31_QS])).alias("q"))
        .crossJoin(F.broadcast(mm))
        .select("q", F.ceil(F.col("q") * F.col("n")).cast("long").alias("r"), "lo", "hi")
    )
    hit = (
        qs.join(cum, cum.cum >= qs.r)
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("q").orderBy("bin")),
        )
        .where(F.col("rn") == 1)
    )
    wd = (F.col("hi") - F.col("lo")) / F.lit(float(_P31_BINS))
    est = F.col("lo") + (
        F.col("bin").cast("double")
        + (F.col("r") - F.col("cum_before")).cast("double") / F.col("cnt").cast("double")
    ) * wd
    return hit.select(
        F.col("q").cast("double").alias("q"),
        F.round(est, 6).alias("estimate"),
        F.round(wd, 6).alias("err_bound"),
    ).orderBy("q")
