"""Relational core — SURVEY.md §2.5 (R1-R25) + flagship query.

All declarative DataFrame API: Catalyst supplies pushdown, pruning,
join selection, and AQE supplies runtime coalescing/skew handling
(SURVEY.md §4.2). Dimension joins broadcast explicitly (R6) so a
1000-executor plan never shuffles the fact table against a 25-row dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.operators.qhelp import T, lineitem_dirty, with_lineitem_dirty
from ipydataclean_spark.registry import register

# ---------------------------------------------------------------------------
# Flagship (M0): clean (C9 parse + C2 fill-mean) then TPC-H-Q1-style agg
# ---------------------------------------------------------------------------

_Q1_MEAN_SQL = with_lineitem_dirty(
    f"SELECT {exact.davg_sql('qty_parsed')} AS m FROM lineitem_dirty"
)


@register(
    "q1_pricing_summary_cleaned",
    oracle=with_lineitem_dirty(
        "SELECT l_returnflag, l_linestatus, "
        f"{exact.dsum_sql(f'COALESCE(qty_parsed, ({_Q1_MEAN_SQL}))')} AS sum_qty, "
        f"{exact.dsum_sql('l_extendedprice')} AS sum_base_price, "
        f"{exact.dsum_sql('l_extendedprice * (1 - l_discount)')} AS sum_disc_price, "
        f"{exact.dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge, "
        f"{exact.davg_sql(f'COALESCE(qty_parsed, ({_Q1_MEAN_SQL}))')} AS avg_qty, "
        f"{exact.davg_sql('l_extendedprice')} AS avg_price, "
        f"{exact.davg_sql('l_discount')} AS avg_disc, "
        "COUNT(*) AS count_order "
        "FROM lineitem_dirty GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus"
    ),
    tags=("flagship", "C9", "C2", "R11"),
)
def q1_pricing_summary_cleaned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: dirty lineitem → C9 string→numeric parse → C2 fill-mean
    → Q1-style grouped pricing summary — in ONE lazy fact scan.

    Round-13 fusion (VERDICT r12 #3; guide §2.4 "remove passes"): the
    fill-mean used to need a scalar pre-pass (an eager davg collect
    inside fn()) before the grouped pass — two fact scans. Here the
    grouped pass collects exact per-group partials (decimal sums kept
    AS decimal, null counts) and the fill recombines IN-PLAN:

        m (global mean)  = cast(Σ_g qty_dec_g AS double) / Σ_g n_qty_g
                           — an empty-partition window over the GROUP
                           rows (4 rows), so no second subtree and no
                           self-join; decimal addition is associative,
                           so the windowed total equals the pre-pass's
                           single decimal sum bit-for-bit, and the
                           final double division is the same IEEE op.
        sum_qty_g        = qty_dec_g + n_null_g · cast(m AS dec(28,6))
                           — each null row contributes exactly the
                           per-row cast the COALESCE form applied.

    Unlike the round-12 NEGATIVE RESULT (the q1b-style collect +
    driver recombine, which forced every decimal aggregate eager and
    benched 0.68 → 2.3 s under count()), this form stays fully LAZY: a
    count() terminal action still prunes the aggregates (the window
    column is unused), while the noop sink measures one scan instead
    of two. Proven hash-identical to the two-scan oracle at
    sf0.01 + sf0.1. q1b remains the registered collect-form variant."""
    df = lineitem_dirty(spark, sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    parts = df.groupBy("l_returnflag", "l_linestatus").agg(
        exact.dsum_dec("qty_parsed").alias("qty_dec"),
        F.count("qty_parsed").alias("n_qty"),
        F.sum(F.col("qty_parsed").isNull().cast("long")).alias("n_null"),
        exact.dsum_dec("l_extendedprice").alias("price_dec"),
        F.count("l_extendedprice").alias("n_price"),
        exact.dsum_dec(disc_price).alias("disc_price_dec"),
        exact.dsum_dec(charge).alias("charge_dec"),
        exact.dsum_dec("l_discount").alias("disc_dec"),
        F.count("l_discount").alias("n_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )
    w = Window.partitionBy()  # 4 group rows: single-partition window is free
    m = F.sum("qty_dec").over(w).cast("double") / F.sum("n_qty").over(w)
    filled = (F.col("qty_dec") + F.col("n_null") * m.cast(exact.DEC)).cast("double")
    return parts.select(
        "l_returnflag",
        "l_linestatus",
        filled.alias("sum_qty"),
        F.col("price_dec").cast("double").alias("sum_base_price"),
        F.col("disc_price_dec").cast("double").alias("sum_disc_price"),
        F.col("charge_dec").cast("double").alias("sum_charge"),
        (filled / F.col("count_order")).alias("avg_qty"),
        (F.col("price_dec").cast("double") / F.col("n_price")).alias("avg_price"),
        (F.col("disc_dec").cast("double") / F.col("n_disc")).alias("avg_disc"),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


@register(
    "q6_revenue_band",
    oracle=(
        f"SELECT {exact.dsum_sql('l_extendedprice * l_discount')} AS revenue, "
        "COUNT(*) AS n FROM lineitem "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24"
    ),
    tags=("R2", "R13"),
)
def q6_revenue_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6-style filtered aggregate — pushdown-friendly predicates
    (all reach the parquet scan as PushedFilters)."""
    df = T(spark, sf_dir, "lineitem")
    return (
        df.where(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            exact.dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q3_top_orders",
    oracle=(
        "SELECT l_orderkey, "
        f"{exact.dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue, "
        "MIN(o_orderdate) AS o_orderdate "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01' "
        "GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10"
    ),
    tags=("R3", "R11", "R17"),
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q3-style 3-table join + top-k (TakeOrderedAndProject).

    No broadcast hint on customer: it is SF-scaled (tens of GB at
    100 TB), so forcing a broadcast is a driver OOM at scale — AQE +
    autoBroadcastJoinThreshold picks broadcast when the filtered dim
    is actually small (it is at bench SF; plan-asserted), and falls
    back to shuffle join when it isn't (VERDICT r06 #1)."""
    cust = T(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = T(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    li = T(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey")
        .agg(
            exact.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.min("o_orderdate").alias("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_nation_revenue",
    oracle=(
        "SELECT n_name, r_name, "
        f"{exact.dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue "
        "FROM region JOIN nation ON n_regionkey = r_regionkey "
        "JOIN customer ON c_nationkey = n_nationkey "
        "JOIN orders ON o_custkey = c_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "GROUP BY n_name, r_name ORDER BY revenue DESC, n_name"
    ),
    tags=("R3", "R6", "R11"),
)
def q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-style star join: fact joins broadcast dims (R6).

    region/nation keep explicit broadcast hints (true fixed-size dims);
    the customer-derived dim gets NO hint — it is SF-scaled, so the
    size-based choice belongs to AQE/autoBroadcastJoinThreshold: at
    bench SF it still broadcasts (plan-asserted), at 100 TB it degrades
    to a shuffle join instead of a driver OOM (VERDICT r06 #1)."""
    region = T(spark, sf_dir, "region")
    nation = T(spark, sf_dir, "nation")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = T(spark, sf_dir, "orders")
    li = T(spark, sf_dir, "lineitem")
    # customer joins the fact DIRECTLY (not pre-joined with nation into
    # a dim frame): a base-table scan has an accurate size estimate, so
    # the planner still picks broadcast at bench SF without the hint —
    # a pre-joined dim's estimated size is the product of its inputs,
    # which blows past autoBroadcastJoinThreshold and forces a shuffle
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name", "r_name")
        .agg(exact.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


# ---------------------------------------------------------------------------
# R-series substrate
# ---------------------------------------------------------------------------


@register(
    "r2_filter_predicates",
    oracle=(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders "
        "WHERE o_orderstatus IN ('O', 'F') AND o_totalprice BETWEEN 1000 AND 50000 "
        "AND o_orderpriority LIKE '%URGENT%' AND o_custkey IS NOT NULL "
        "ORDER BY o_orderkey"
    ),
    tags=("R1", "R2", "R15"),
)
def r2_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2: conjunctive IN/BETWEEN/LIKE/NULL filters (all pushed down)."""
    df = T(spark, sf_dir, "orders")
    return (
        df.where(
            F.col("o_orderstatus").isin("O", "F")
            & F.col("o_totalprice").between(1000, 50000)
            & F.col("o_orderpriority").like("%URGENT%")
            & F.col("o_custkey").isNotNull()
        )
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .orderBy("o_orderkey")
    )


@register(
    "r4_left_join_counts",
    oracle=(
        "SELECT c_custkey, COUNT(o_orderkey) AS n_orders, "
        f"{exact.dsum_sql('o_totalprice')} AS total_spend "
        "FROM customer LEFT JOIN orders ON o_custkey = c_custkey "
        "GROUP BY c_custkey ORDER BY c_custkey"
    ),
    tags=("R4", "R11"),
)
def r4_left_join_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4: left outer join keeping customers with zero orders.

    dsum over an all-NULL group returns NULL in both engines."""
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            exact.dsum("o_totalprice").alias("total_spend"),
        )
        .orderBy("c_custkey")
    )


@register(
    "r5_semi_anti",
    oracle=(
        "SELECT 'with_orders' AS kind, COUNT(*) AS n FROM customer "
        "WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey) "
        "UNION ALL "
        "SELECT 'without_orders' AS kind, COUNT(*) AS n FROM customer "
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"
    ),
    tags=("R5",),
)
def r5_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R5: left-semi and left-anti joins (EXISTS / NOT EXISTS twins)."""
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    semi = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("with_orders").alias("kind"), "n")
    )
    anti = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("without_orders").alias("kind"), "n")
    )
    return semi.unionByName(anti)


@register(
    "r7_cross_join",
    oracle=(
        "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name"
    ),
    tags=("R7",),
)
def r7_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7: cross join (tiny dims only — guarded at scale)."""
    return (
        T(spark, sf_dir, "region")
        .crossJoin(T(spark, sf_dir, "nation"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


@register(
    "r8_range_join",
    oracle=(
        "WITH months AS (SELECT CAST(TIMESTAMP '1996-01-01' + INTERVAL (m) MONTH AS TIMESTAMP) AS m_start, "
        "CAST(TIMESTAMP '1996-01-01' + INTERVAL (m + 1) MONTH AS TIMESTAMP) AS m_end "
        "FROM (SELECT UNNEST(range(12)) AS m)) "
        "SELECT m_start, COUNT(o_orderkey) AS n_orders, "
        f"{exact.dsum_sql('o_totalprice')} AS month_total "
        "FROM months LEFT JOIN orders ON o_orderdate >= m_start AND o_orderdate < m_end "
        "GROUP BY m_start ORDER BY m_start"
    ),
    tags=("R8",),
)
def r8_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8: non-equi range join (orders into month intervals).

    The 12-row interval side is broadcast, so the non-equi condition is
    evaluated as a broadcast nested-loop join — the right plan at any
    scale when the interval side is small; bucket-prefilter otherwise."""
    months = (
        spark.range(12)
        .select(
            F.add_months(F.lit("1996-01-01").cast("date"), F.col("id").cast("int")).cast("timestamp").alias("m_start"),
            F.add_months(F.lit("1996-01-01").cast("date"), F.col("id").cast("int") + 1).cast("timestamp").alias("m_end"),
        )
    )
    orders = T(spark, sf_dir, "orders")
    return (
        F.broadcast(months)
        .join(orders, (orders.o_orderdate >= months.m_start) & (orders.o_orderdate < months.m_end), "left")
        .groupBy("m_start")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            exact.dsum("o_totalprice").alias("month_total"),
        )
        .orderBy("m_start")
    )


@register(
    "r9_asof_join",
    oracle=(
        "WITH probes AS (SELECT UNNEST(['2024-01-08 00:00:00', '2024-01-15 00:00:00', '2024-01-22 00:00:00']) AS p), "
        "probe_ts AS (SELECT CAST(p AS TIMESTAMP) AS probe_ts FROM probes), "
        "u AS (SELECT DISTINCT user_id FROM events) "
        "SELECT u.user_id, probe_ts, MAX(e.ts) AS last_ts, ARG_MAX(e.value, e.ts) AS last_value "
        "FROM u CROSS JOIN probe_ts "
        "LEFT JOIN events e ON e.user_id = u.user_id AND e.ts <= probe_ts "
        "GROUP BY u.user_id, probe_ts ORDER BY u.user_id, probe_ts"
    ),
    tags=("R9",),
)
def r9_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9: as-of join — latest event value at-or-before each probe time
    per user. Implemented as broadcast probe join + max_by (argmax);
    per-user ts is unique in the fixture so argmax is deterministic.
    Streaming twin: stream-stream join with watermark (SURVEY §2.8)."""
    ev = T(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    probes = spark.createDataFrame(
        [("2024-01-08 00:00:00",), ("2024-01-15 00:00:00",), ("2024-01-22 00:00:00",)], ["p"]
    ).select(F.col("p").cast("timestamp").alias("probe_ts"))
    grid = users.crossJoin(F.broadcast(probes))
    e = ev.select(F.col("user_id").alias("e_user"), "ts", "value")
    return (
        grid.join(e, (e.e_user == grid.user_id) & (e.ts <= grid.probe_ts), "left")
        .groupBy("user_id", "probe_ts")
        .agg(F.max("ts").alias("last_ts"), F.max_by("value", "ts").alias("last_value"))
        .orderBy("user_id", "probe_ts")
    )


@register(
    "r10_interval_self_join",
    oracle=(
        "SELECT e1.event_id AS base_event, COUNT(e2.event_id) AS n_following "
        "FROM events e1 JOIN events e2 ON e2.user_id = e1.user_id "
        "AND e2.ts > e1.ts AND e2.ts <= e1.ts + INTERVAL 5 MINUTE "
        "WHERE e1.event_type = 'purchase' "
        "GROUP BY e1.event_id ORDER BY e1.event_id"
    ),
    tags=("R10",),
)
def r10_interval_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R10: interval join — events within 5 minutes after each purchase,
    equi-key (user_id) prefilter makes the range condition a per-key
    nested loop, which scales (shuffle on user_id, not cross join)."""
    ev = T(spark, sf_dir, "events")
    e1 = ev.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("base_event"), F.col("user_id").alias("u1"), F.col("ts").alias("t1")
    )
    e2 = ev.select(F.col("event_id").alias("e2_id"), F.col("user_id").alias("u2"), F.col("ts").alias("t2"))
    return (
        e1.join(
            e2,
            (e1.u1 == e2.u2)
            & (e2.t2 > e1.t1)
            & (e2.t2 <= e1.t1 + F.expr("INTERVAL 5 MINUTE")),
            "inner",
        )
        .groupBy("base_event")
        .agg(F.count("e2_id").alias("n_following"))
        .orderBy("base_event")
    )


@register(
    "r11_groupby_agg",
    oracle=(
        "SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n, "
        f"{exact.dsum_sql('o_totalprice')} AS total, "
        "MIN(o_orderdate) AS first_date, MAX(o_orderdate) AS last_date "
        "FROM orders GROUP BY o_orderstatus, o_orderpriority "
        "ORDER BY o_orderstatus, o_orderpriority"
    ),
    tags=("R11",),
)
def r11_groupby_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R11: multi-key hash aggregate (partial+final, map-side combine)."""
    return (
        T(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact.dsum("o_totalprice").alias("total"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


@register(
    "r12_rollup",
    oracle=(
        "SELECT COALESCE(r_name, 'ALL') AS region_name, "
        "COALESCE(n_name, 'ALL') AS nation_name, COUNT(*) AS n_customers "
        "FROM customer JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "GROUP BY ROLLUP (r_name, n_name) ORDER BY region_name, nation_name"
    ),
    tags=("R12",),
)
def r12_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12: rollup hierarchy totals (region → nation → grand total)."""
    cust = T(spark, sf_dir, "customer")
    nation = T(spark, sf_dir, "nation")
    region = T(spark, sf_dir, "region")
    joined = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .select(
            F.coalesce("r_name", F.lit("ALL")).alias("region_name"),
            F.coalesce("n_name", F.lit("ALL")).alias("nation_name"),
            "n_customers",
        )
        .orderBy("region_name", "nation_name")
    )


_R12B_SQL = (
    "SELECT COALESCE(o_orderstatus, 'ALL') AS status, "
    "COALESCE(o_orderpriority, 'ALL') AS priority, "
    "CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status, "
    "CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority, "
    "COUNT(*) AS n, "
    f"{exact.dsum_sql('o_totalprice')} AS total "
    "FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority) "
    "ORDER BY status, priority"
)


@register("r12b_cube_sql", oracle=_R12B_SQL, tags=("R12", "SQL-entry"))
def r12b_cube_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12 cube via the SQL entry point (SURVEY §3.2(2)): register temp
    views, run the IDENTICAL ANSI text Spark-side that DuckDB runs as
    oracle — the dialect-intersection discipline, demonstrated."""
    from ipydataclean_spark.catalog import register_views

    register_views(spark, sf_dir, only=("orders",))
    return spark.sql(_R12B_SQL)


@register(
    "r25b_correlated_subquery_sql",
    oracle=(
        "SELECT c_custkey, c_acctbal FROM customer c WHERE c_acctbal > "
        "(SELECT 2 * AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey) "
        "ORDER BY c_custkey"
    ),
    tags=("R25", "SQL-entry"),
)
def r25b_correlated_subquery_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R25 correlated scalar subquery through Catalyst's decorrelation
    (RewriteCorrelatedScalarSubquery turns it into an aggregate+join —
    no per-row subquery execution at any scale).

    AVG here is per-nation over ≤hundreds of rows with identical
    grouping on both engines... but float sum order could still differ;
    2*avg comparison boundaries are far from data points in this
    fixture (verified), and the OUTPUT columns are raw stored values,
    so the hash is safe."""
    from ipydataclean_spark.catalog import register_views

    register_views(spark, sf_dir, only=("customer",))
    return spark.sql(
        "SELECT c_custkey, c_acctbal FROM customer c WHERE c_acctbal > "
        "(SELECT 2 * AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey) "
        "ORDER BY c_custkey"
    )


@register(
    "r13_conditional_agg",
    oracle=(
        "SELECT l_returnflag, "
        "CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_disc, "
        f"{exact.dsum_sql('CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0 END')} AS high_disc_price, "
        "COUNT(*) FILTER (WHERE l_quantity >= 25) AS n_bulk "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("R13",),
)
def r13_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R13: conditional aggregation (CASE-sum + FILTER clause)."""
    df = T(spark, sf_dir, "lineitem")
    high = F.col("l_discount") > 0.05
    return (
        df.groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("long")).alias("n_high_disc"),
            exact.dsum(F.when(high, F.col("l_extendedprice")).otherwise(F.lit(0.0))).alias("high_disc_price"),
            F.count(F.when(F.col("l_quantity") >= 25, 1)).alias("n_bulk"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "r14_collect_set",
    oracle=(
        "SELECT l_returnflag, ARRAY_TO_STRING(LIST_SORT(LIST(DISTINCT l_linestatus)), ',') AS statuses, "
        "ARRAY_TO_STRING(LIST_SORT(COALESCE(LIST(DISTINCT CAST(l_quantity AS BIGINT)) FILTER (WHERE l_quantity <= 3), [])), ',') AS small_qtys "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("R14",),
)
def r14_collect_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R14: collect_set, flattened to sorted CSV strings.

    The sets are sorted then ``array_join``-ed so the output is scalar-typed:
    the driver harness canonicalizes results with pandas ``sort_values`` /
    ``factorize``, which cannot hash list-typed cells (round-2 red row).
    Sorting happens on the native element type (long for quantities) BEFORE
    stringification so numeric order is preserved.
    """
    df = T(spark, sf_dir, "lineitem")
    return (
        df.groupBy("l_returnflag")
        .agg(
            F.array_join(F.array_sort(F.collect_set("l_linestatus")), ",").alias("statuses"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_set(F.when(F.col("l_quantity") <= 3, F.col("l_quantity").cast("long")))
                    ),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("small_qtys"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "r15_sort_nulls",
    oracle=(
        "SELECT o_orderkey, NULLIF(o_orderpriority, '1-URGENT') AS prio_or_null, o_totalprice "
        "FROM orders ORDER BY prio_or_null DESC NULLS LAST, o_totalprice DESC, o_orderkey LIMIT 100"
    ),
    tags=("R15",),
)
def r15_sort_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R15: multi-key sort with explicit null ordering."""
    df = T(spark, sf_dir, "orders")
    return (
        df.select(
            "o_orderkey",
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("prio_or_null"),
            "o_totalprice",
        )
        .orderBy(F.col("prio_or_null").desc_nulls_last(), F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "r16_limit_offset",
    oracle=("SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_orderkey LIMIT 50 OFFSET 100"),
    tags=("R16",),
)
def r16_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R16: deterministic limit/offset (Spark 4.x offset)."""
    return (
        T(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


@register(
    "r18_topk_per_group",
    oracle=(
        "SELECT c_mktsegment, c_custkey, c_acctbal FROM ("
        "SELECT c_mktsegment, c_custkey, c_acctbal, "
        "ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn "
        "FROM customer) WHERE rn <= 3 ORDER BY c_mktsegment, c_acctbal DESC, c_custkey"
    ),
    tags=("R18", "W1"),
)
def r18_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R18: top-k per group via ranking window (shuffles once on the
    group key; AQE handles group-count skew)."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        T(spark, sf_dir, "customer")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("c_mktsegment", "c_custkey", "c_acctbal")
        .orderBy("c_mktsegment", F.desc("c_acctbal"), "c_custkey")
    )


@register(
    "r19_union",
    oracle=(
        "SELECT 'all' AS kind, COUNT(*) AS n FROM "
        "(SELECT c_nationkey AS k FROM customer UNION ALL SELECT s_nationkey FROM supplier) "
        "UNION ALL SELECT 'distinct' AS kind, COUNT(*) AS n FROM "
        "(SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier)"
    ),
    tags=("R19",),
)
def r19_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R19: union all vs union distinct."""
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    ua = c.unionByName(s).agg(F.count(F.lit(1)).alias("n")).select(F.lit("all").alias("kind"), "n")
    ud = (
        c.unionByName(s).distinct().agg(F.count(F.lit(1)).alias("n")).select(F.lit("distinct").alias("kind"), "n")
    )
    return ua.unionByName(ud)


@register(
    "r20_intersect_except",
    oracle=(
        "SELECT 'both' AS kind, k FROM "
        "(SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier) "
        "UNION ALL "
        "SELECT 'customer_only' AS kind, k FROM "
        "(SELECT c_nationkey AS k FROM customer EXCEPT SELECT s_nationkey FROM supplier) "
        "ORDER BY kind, k"
    ),
    tags=("R20",),
)
def r20_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R20: intersect / except (distinct set semantics)."""
    c = T(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = T(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    both = c.intersect(s).select(F.lit("both").alias("kind"), "k")
    only = c.subtract(s).select(F.lit("customer_only").alias("kind"), "k")
    return both.unionByName(only).orderBy("kind", "k")


@register(
    "r21_distinct",
    oracle=(
        "SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY l_returnflag, l_linestatus"
    ),
    tags=("R21",),
)
def r21_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R21: distinct (hash aggregate without agg functions)."""
    return (
        T(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_linestatus")
        .distinct()
        .orderBy("l_returnflag", "l_linestatus")
    )


@register("r22_sample", oracle=None, tags=("R22",))
def r22_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R22: seeded Bernoulli sample (rows-only: engine-specific RNG)."""
    return T(spark, sf_dir, "lineitem").sample(fraction=0.1, seed=42)


from ipydataclean_spark.functions.exact import md5_prefix_int_sql as _md5_sql

#: shared md5 row-key coin over lineitem (r22d + r8c's slice)
_U_LINEITEM = (
    "(" + _md5_sql(
        "CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)"
    ) + " + 0.5) / 16777216.0"
)

_R22D_ORACLE = (
    "SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS qty "
    "FROM lineitem WHERE " + _U_LINEITEM + " "
    "< 0.1 ORDER BY l_orderkey, l_linenumber"
)


@register("r22d_hash_sample", oracle=_R22D_ORACLE, tags=("R22",))
def r22d_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R22 ORACLE-CERTIFIED sampling: a 10% Bernoulli sample whose
    coin is the md5 24-bit prefix of the row key (u = (h + 0.5)/2^24
    < 0.1 — the curation.md5_prefix_int rule, the same deterministic
    slice r8c and l39 build on) instead of r22's engine-RNG
    ``df.sample`` — hash-certified row-for-row against DuckDB.
    Besides certifiability, key-hash sampling is what a 100 TB
    pipeline wants anyway: the sample is REPRODUCIBLE across engines,
    retries, repartitioning, and incremental reruns (a row's fate
    never depends on task boundaries, unlike RNG-per-partition), and
    it pushes down as an ordinary predicate."""
    from ipydataclean_spark.operators.curation import md5_prefix_int

    li = T(spark, sf_dir, "lineitem")
    u = (
        md5_prefix_int(
            F.concat_ws(
                "-",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        )
        + F.lit(0.5)
    ) / F.lit(16777216.0)
    return (
        li.where(u < 0.1)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("qty"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "r23_pivot",
    oracle=(
        "SELECT l_returnflag, "
        "CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F, "
        "CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O "
        "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("R23",),
)
def r23_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R23: pivot with explicit value list (no extra distinct-values job)."""
    return (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O"])
        .orderBy("l_returnflag")
    )


@register(
    "r24_unpivot",
    oracle=(
        "SELECT p_partkey, metric, CAST(val AS DOUBLE) AS val FROM part "
        "UNPIVOT (val FOR metric IN (p_size, p_retailprice)) "
        "ORDER BY p_partkey, metric"
    ),
    tags=("R24",),
)
def r24_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R24: unpivot/melt wide → long."""
    df = T(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    return df.unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "val").orderBy(
        "p_partkey", "metric"
    )


@register(
    "r25_scalar_subquery",
    oracle=(
        "SELECT COUNT(*) AS n_above, "
        f"{exact.dsum_sql('o_totalprice')} AS sum_above "
        f"FROM orders WHERE o_totalprice > (SELECT {exact.davg_sql('o_totalprice')} FROM orders)"
    ),
    tags=("R25",),
)
def r25_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R25: scalar subquery via compute-then-literal (two-phase — the
    scale-safe rewrite of a correlated scalar subquery)."""
    orders = T(spark, sf_dir, "orders")
    avg_total = orders.agg(exact.davg("o_totalprice")).first()[0]
    return orders.where(F.col("o_totalprice") > F.lit(avg_total)).agg(
        F.count(F.lit(1)).alias("n_above"),
        exact.dsum("o_totalprice").alias("sum_above"),
    )


@register(
    "q4_priority_count",
    oracle=(
        "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01' "
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
        "AND l_shipdate > o_orderdate) "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    tags=("R5", "R11"),
)
def q4_priority_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4-style: EXISTS as a left-semi join on a non-trivial
    condition, then priority counts."""
    orders = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q7_volume_shipping",
    oracle=(
        "SELECT supp_nation, cust_nation, l_year, "
        f"{exact.dsum_sql('volume')} AS revenue FROM ("
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        "CAST(YEAR(l_shipdate) AS INTEGER) AS l_year, "
        "l_extendedprice * (1 - l_discount) AS volume "
        "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey "
        "JOIN orders ON o_orderkey = l_orderkey "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
        "WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
        "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')) "
        "AND l_shipdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1997-12-31') "
        "GROUP BY supp_nation, cust_nation, l_year "
        "ORDER BY supp_nation, cust_nation, l_year"
    ),
    tags=("R3", "R6", "R11"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7-style: 6-way join with a disjunctive nation-pair filter
    and per-year revenue; both nation joins broadcast."""
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = T(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    j = (
        T(spark, sf_dir, "supplier")
        .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(T(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(T(spark, sf_dir, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
    )
    return (
        j.select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(exact.dsum("volume").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q10_returned_items",
    oracle=(
        "SELECT c_custkey, c_name, n_name, "
        f"{exact.dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue "
        "FROM customer JOIN orders ON c_custkey = o_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE l_returnflag = 'R' AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1996-07-01' "
        "GROUP BY c_custkey, c_name, n_name "
        "ORDER BY revenue DESC, c_custkey LIMIT 20"
    ),
    tags=("R3", "R6", "R17"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10-style: returned-item revenue ranking, top 20."""
    orders = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = T(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    j = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(T(spark, sf_dir, "customer"), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(T(spark, sf_dir, "nation")), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("c_custkey", "c_name", "n_name")
        .agg(exact.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q15_top_supplier",
    oracle=(
        "WITH revenue AS (SELECT l_suppkey AS supplier_no, "
        f"{exact.dsum_sql('l_extendedprice * (1 - l_discount)')} AS total_revenue "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, total_revenue FROM supplier "
        "JOIN revenue ON s_suppkey = supplier_no "
        "WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue) "
        "ORDER BY s_suppkey"
    ),
    tags=("R3", "R25"),
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15-style: view + scalar-subquery max (two-phase: the max
    is a scalar literal — exact decimal sums make the equality safe)."""
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        exact.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue")).first()[0]
    return (
        T(spark, sf_dir, "supplier")
        .join(revenue.where(F.col("total_revenue") == F.lit(max_rev)),
              F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q1b_pricing_summary_single_scan",
    oracle=with_lineitem_dirty(
        "SELECT l_returnflag, l_linestatus, "
        f"{exact.dsum_sql(f'COALESCE(qty_parsed, ({_Q1_MEAN_SQL}))')} AS sum_qty, "
        f"{exact.dsum_sql('l_extendedprice')} AS sum_base_price, "
        f"{exact.davg_sql(f'COALESCE(qty_parsed, ({_Q1_MEAN_SQL}))')} AS avg_qty, "
        "COUNT(*) AS count_order "
        "FROM lineitem_dirty GROUP BY l_returnflag, l_linestatus "
        "ORDER BY l_returnflag, l_linestatus"
    ),
    tags=("flagship", "optimization"),
)
def q1b_pricing_summary_single_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship, ONE distributed scan: the fill-mean normally needs a
    scalar pass before the grouped pass; here the grouped pass collects
    per-group partials (decimal sums kept AS DECIMAL, null counts) and
    the driver recombines them exactly:

        global mean  m = Σ_g dec_sum_g / Σ_g n_nonnull_g   (exact)
        sum_qty_g      = dec_sum_g + n_null_g · dec6(m)    (exact)

    dec6(m) is the 6-dp decimal quantization of the double m — the
    identical rounding Spark/DuckDB apply per row in COALESCE(q, m)
    cast to DECIMAL (no double sits on a half boundary, so the mode
    tie-break never fires). Result is bit-equal to the two-scan oracle.

    At 100 TB this halves the flagship's I/O; driver work is O(groups).
    """
    from decimal import ROUND_HALF_EVEN, Decimal

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    df = lineitem_dirty(spark, sf_dir)
    parts = (
        df.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("qty_parsed").cast(exact.DEC)).alias("qty_dec_sum"),
            F.count("qty_parsed").alias("n_nonnull"),
            F.sum(F.col("qty_parsed").isNull().cast("long")).alias("n_null"),
            F.sum(F.col("l_extendedprice").cast(exact.DEC)).alias("price_dec_sum"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .collect()
    )
    total_dec = sum((r.qty_dec_sum for r in parts), Decimal(0))
    total_n = sum(r.n_nonnull for r in parts)
    m = float(total_dec) / total_n
    # Decimal(m) is the EXACT binary expansion (what the engines round);
    # Decimal(repr(m)) would quantize the shortest string instead and
    # can land on a fake half-boundary.
    dec_m = Decimal(m).quantize(Decimal("0.000001"), rounding=ROUND_HALF_EVEN)
    rows = []
    for r in sorted(parts, key=lambda r: (r.l_returnflag, r.l_linestatus)):
        filled_dec = r.qty_dec_sum + r.n_null * dec_m
        rows.append(
            (
                r.l_returnflag,
                r.l_linestatus,
                float(filled_dec),
                float(r.price_dec_sum),
                float(filled_dec) / r.count_order,
                r.count_order,
            )
        )
    schema = StructType(
        [
            StructField("l_returnflag", StringType()),
            StructField("l_linestatus", StringType()),
            StructField("sum_qty", DoubleType()),
            StructField("sum_base_price", DoubleType()),
            StructField("avg_qty", DoubleType()),
            StructField("count_order", LongType()),
        ]
    )
    return spark.createDataFrame(rows, schema).orderBy("l_returnflag", "l_linestatus")


@register(
    "r9b_asof_join_forward",
    oracle=(
        "WITH probes AS (SELECT UNNEST(['2024-01-08 00:00:00', '2024-01-15 00:00:00', '2024-01-22 00:00:00']) AS p), "
        "probe_ts AS (SELECT CAST(p AS TIMESTAMP) AS probe_ts FROM probes), "
        "u AS (SELECT DISTINCT user_id FROM events) "
        "SELECT u.user_id, probe_ts, MIN(e.ts) AS next_ts, ARG_MIN(e.value, e.ts) AS next_value "
        "FROM u CROSS JOIN probe_ts "
        "LEFT JOIN events e ON e.user_id = u.user_id AND e.ts >= probe_ts "
        "GROUP BY u.user_id, probe_ts ORDER BY u.user_id, probe_ts"
    ),
    tags=("R9",),
)
def r9b_asof_join_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9 forward variant: first event value at-or-after each probe
    time per user (min_by argmin mirror of r9_asof_join)."""
    ev = T(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    probes = spark.createDataFrame(
        [("2024-01-08 00:00:00",), ("2024-01-15 00:00:00",), ("2024-01-22 00:00:00",)], ["p"]
    ).select(F.col("p").cast("timestamp").alias("probe_ts"))
    grid = users.crossJoin(F.broadcast(probes))
    e = ev.select(F.col("user_id").alias("e_user"), "ts", "value")
    return (
        grid.join(e, (e.e_user == grid.user_id) & (e.ts >= grid.probe_ts), "left")
        .groupBy("user_id", "probe_ts")
        .agg(F.min("ts").alias("next_ts"), F.min_by("value", "ts").alias("next_value"))
        .orderBy("user_id", "probe_ts")
    )


_R12C_SQL = (
    "SELECT o_orderstatus, o_orderpriority, "
    "CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status, "
    "CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio, "
    f"COUNT(*) AS n, {exact.dsum_sql('o_totalprice')} AS total "
    "FROM orders "
    "GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ()) "
    "ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"
)


@register("r12c_grouping_sets_sql", oracle=_R12C_SQL, tags=("R12", "SQL-entry"))
def r12c_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R12 explicit GROUPING SETS via the SQL entry point (identical
    ANSI text both engines; NULLS FIRST pinned — Spark and DuckDB
    default null ordering differs). One Expand+HashAggregate pass, not
    one scan per set."""
    from ipydataclean_spark.catalog import register_views

    register_views(spark, sf_dir, only=("orders",))
    return spark.sql(_R12C_SQL)


@register("r22c_weighted_sample", oracle=None, tags=("R22",))
def r22c_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R22c: weighted sampling without replacement (Efraimidis-Spirakis
    A-ES): each row draws u ∈ (0,1] and ranks by u^(1/weight); the
    global top-k is a weighted sample without replacement. u comes from
    xxhash64 of the row key — NOT rand() — so the sample is a pure
    function of the data (reproducible across retries, partitionings,
    and cluster re-runs; rand(seed) is only deterministic per partition
    layout). Selection is TakeOrderedAndProject — O(k) per partition,
    no global sort. Rows-only: DuckDB has no xxhash64 twin; the
    distributional contract is pinned in tests/test_properties.py."""
    o = T(spark, sf_dir, "orders")
    u = (F.pmod(F.xxhash64("o_orderkey"), F.lit(1 << 20)) + 1).cast("double") / F.lit(
        float(1 << 20)
    )
    score = F.pow(u, F.lit(1.0) / F.col("o_totalprice"))
    return (
        o.select("o_orderkey", "o_totalprice", score.alias("es_key"))
        .orderBy(F.desc("es_key"), "o_orderkey")
        .limit(200)
    )


_R26_SQL = (
    "SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice "
    "FROM orders o, LATERAL ("
    "SELECT l_linenumber, l_extendedprice FROM lineitem l "
    "WHERE l.l_orderkey = o.o_orderkey "
    "ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2) t "
    "WHERE o.o_orderkey % 500 = 0 "
    "ORDER BY o.o_orderkey, t.l_extendedprice DESC, t.l_linenumber"
)


@register("r26_lateral_topk_sql", oracle=_R26_SQL, tags=("R26", "R18", "SQL-entry"))
def r26_lateral_topk_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R26: correlated LATERAL subquery — per-order top-2 line items
    via the SQL entry point, identical ANSI text on both engines. The
    declarative twin of r18's window-rank form: Catalyst decorrelates
    the LATERAL into a join + per-key rank rather than executing the
    inner query once per outer row (which a naive nested-loop LATERAL
    would — the difference between O(n) subquery launches and one
    shuffle at 100 TB)."""
    from ipydataclean_spark.catalog import register_views

    register_views(spark, sf_dir, only=("orders", "lineitem"))
    return spark.sql(_R26_SQL)


@register(
    "r9c_asof_join_tolerance",
    oracle=(
        "WITH probes AS (SELECT UNNEST(['2024-01-08 00:00:00', "
        "'2024-01-15 00:00:00', '2024-01-22 00:00:00']) AS p), "
        "probe_ts AS (SELECT CAST(p AS TIMESTAMP) AS probe_ts FROM probes), "
        "u AS (SELECT DISTINCT user_id FROM events) "
        "SELECT u.user_id, probe_ts, MAX(e.ts) AS last_ts, "
        "ARG_MAX(e.value, e.ts) AS last_value "
        "FROM u CROSS JOIN probe_ts "
        "LEFT JOIN events e ON e.user_id = u.user_id AND e.ts <= probe_ts "
        "AND e.ts >= probe_ts - INTERVAL 36 HOUR "
        "GROUP BY u.user_id, probe_ts ORDER BY u.user_id, probe_ts"
    ),
    tags=("R9", "R8"),
)
def r9c_asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R9c: as-of join WITH TOLERANCE (pandas merge_asof(tolerance=...)
    semantics): the latest event at-or-before each probe counts only if
    it is within 36 hours — staler state is treated as missing (the
    telemetry-join rule: a reading that old is no reading). Same
    broadcast-probe + argmax shape as r9; the tolerance is one extra
    range predicate evaluated inside the join, so the plan — and its
    scale behavior — is unchanged."""
    ev = T(spark, sf_dir, "events")
    users = ev.select("user_id").distinct()
    probes = spark.createDataFrame(
        [("2024-01-08 00:00:00",), ("2024-01-15 00:00:00",), ("2024-01-22 00:00:00",)],
        ["p"],
    ).select(F.col("p").cast("timestamp").alias("probe_ts"))
    grid = users.crossJoin(F.broadcast(probes))
    e = ev.select(F.col("user_id").alias("e_user"), "ts", "value")
    return (
        grid.join(
            e,
            (e.e_user == grid.user_id)
            & (e.ts <= grid.probe_ts)
            & (e.ts >= grid.probe_ts - F.expr("INTERVAL 36 HOUR")),
            "left",
        )
        .groupBy("user_id", "probe_ts")
        .agg(F.max("ts").alias("last_ts"), F.max_by("value", "ts").alias("last_value"))
        .orderBy("user_id", "probe_ts")
    )


_R27_SQL = (
    "WITH RECURSIVE chain AS ("
    "SELECT s_suppkey AS suppkey, 0 AS depth FROM supplier WHERE s_suppkey = 0 "
    "UNION ALL "
    "SELECT s.s_suppkey, c.depth + 1 FROM supplier s JOIN chain c "
    "ON CAST(FLOOR(s.s_suppkey / 2.0) AS BIGINT) = c.suppkey "
    "AND s.s_suppkey > c.suppkey) "
    "SELECT depth, CAST(COUNT(*) AS BIGINT) AS n_suppliers, "
    "CAST(MIN(suppkey) AS BIGINT) AS min_key, "
    "CAST(MAX(suppkey) AS BIGINT) AS max_key "
    "FROM chain GROUP BY depth ORDER BY depth"
)


@register("r27_recursive_cte_sql", oracle=_R27_SQL, tags=("R27", "SQL-entry"))
def r27_recursive_cte_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R27: recursive CTE (hierarchy walk) through the SQL entry point
    — Spark 4.1's WITH RECURSIVE (UnionLoop iterates join+filter
    steps until fixpoint) over an implicit binary-tree hierarchy on
    supplier keys (parent(k) = floor(k/2); depth ≈ log2(n) keeps the
    iteration count scale-independent). IDENTICAL ANSI text runs on
    DuckDB as the oracle — the dialect-intersection discipline, now
    covering iteration. The anchor is key 0; the strictly-increasing
    join guard (child > parent) terminates the recursion."""
    from ipydataclean_spark.catalog import register_views

    register_views(spark, sf_dir, only=("supplier",))
    return spark.sql(_R27_SQL)


@register(
    "r28_null_safe_join",
    oracle=(
        "WITH a AS (SELECT CASE WHEN event_id % 7 = 0 THEN NULL "
        "ELSE (event_id // 2) % 50 END AS k, CAST(COUNT(*) AS BIGINT) AS n_a "
        "FROM events WHERE event_id % 2 = 0 GROUP BY 1), "
        "b AS (SELECT CASE WHEN event_id % 7 = 0 THEN NULL "
        "ELSE (event_id // 2) % 50 END AS k, CAST(COUNT(*) AS BIGINT) AS n_b "
        "FROM events WHERE event_id % 2 = 1 GROUP BY 1) "
        "SELECT a.k, n_a, n_b FROM a JOIN b "
        "ON a.k IS NOT DISTINCT FROM b.k "
        "ORDER BY a.k NULLS FIRST"
    ),
    tags=("R28", "R4", "SQL-semantics"),
)
def r28_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R28: NULL-SAFE equi-join (Spark ``<=>`` ≡ ANSI IS NOT DISTINCT
    FROM) — the join a sessionization or SCD pipeline needs when the
    key legitimately carries NULL as a value ("no campaign", "unknown
    device") and a plain ``=`` would silently drop those rows. Both
    sides pre-aggregate to key grain before the join (dimension-sized
    at any scale); the null-safe predicate still hash-partitions on
    the key — NULLs form one group, they do not fan out."""
    ev = T(spark, sf_dir, "events")
    k = F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(
        (F.col("event_id") / 2).cast("long") % 50
    )
    a = (
        ev.where(F.col("event_id") % 2 == 0)
        .select(k.alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_a"))
    )
    b = (
        ev.where(F.col("event_id") % 2 == 1)
        .select(k.alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_b"))
    )
    return (
        a.join(b, a["k"].eqNullSafe(b["k"]))
        .select(a["k"].alias("k"), "n_a", "n_b")
        .orderBy(F.asc_nulls_first("k"))
    )



def _weekly_bucket_range_join(o_src: DataFrame, li_src: DataFrame) -> DataFrame:
    """Shared body of r8b/r8c (round-6 review #6 — the zero-match fix
    had to be written twice): bucket time into 7-day epochs, EXPLODE
    each order's [o_orderdate, o_orderdate+7) window into its <= 2
    buckets, hash-join lineitems on the bucket key, and
    CONDITIONALLY count the exact range per order (zero-match orders
    aggregate to n=0 exactly like a naive left join), then roll up by
    year. Inputs: o_src with (o_orderkey, o_orderdate date),
    li_src with (l_orderkey, l_shipdate castable to date)."""
    epoch = F.lit("1992-01-01").cast("date")
    li = li_src.select(
        "l_orderkey",
        F.col("l_shipdate").cast("date").alias("l_shipdate"),
        F.floor(F.datediff(F.col("l_shipdate").cast("date"), epoch) / 7).alias("wk"),
    )
    o = o_src.select(
        "o_orderkey",
        F.col("o_orderdate").cast("date").alias("o_orderdate"),
        F.year(F.col("o_orderdate").cast("date")).alias("y"),
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor(F.datediff(F.col("o_orderdate").cast("date"), epoch) / 7),
                    F.floor(
                        F.datediff(
                            F.date_add(F.col("o_orderdate").cast("date"), 6), epoch
                        )
                        / 7
                    ),
                )
            )
        ).alias("wk"),
    )
    in_range = (F.col("l_shipdate") >= F.col("o_orderdate")) & (
        F.col("l_shipdate") < F.date_add("o_orderdate", 7)
    )
    per_order = (
        o.join(li, "wk", "left")
        .groupBy("o_orderkey", "y")
        .agg(F.sum(F.when(in_range, F.lit(1)).otherwise(F.lit(0))).alias("n"))
    )
    return (
        per_order.groupBy(F.col("y").cast("int").alias("y"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n").cast("long").alias("total_pairs"),
            F.round(
                F.sum("n").cast("double") / F.count(F.lit(1)), 8
            ).alias("avg_per_order"),
        )
        .orderBy("y")
    )


_R8B_ORACLE = (
    "WITH j AS (SELECT o.o_orderkey, YEAR(o.o_orderdate) AS y, "
    "CAST(COUNT(l.l_orderkey) AS BIGINT) AS n "
    "FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate FROM orders "
    "WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01') o "
    "LEFT JOIN (SELECT l_orderkey, CAST(l_shipdate AS DATE) AS l_shipdate FROM lineitem) l "
    "ON l.l_shipdate >= o.o_orderdate AND l.l_shipdate < o.o_orderdate + 7 "
    "GROUP BY 1, 2) "
    "SELECT CAST(y AS INTEGER) AS y, CAST(COUNT(*) AS BIGINT) AS n_orders, "
    "CAST(SUM(n) AS BIGINT) AS total_pairs, "
    "ROUND(CAST(SUM(n) AS DOUBLE) / COUNT(*), 8) AS avg_per_order "
    "FROM j GROUP BY y ORDER BY y"
)


@register(
    "r8b_range_join_bucketed",
    oracle=_R8B_ORACLE,
    tags=("R8", "scale-pattern"),
)
def r8b_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8b: FACT x FACT range join via BUCKET EQUI-JOIN — the scale
    form r8's docstring promises: when BOTH sides are fact-sized
    (orders joined to every lineitem shipped in the order's first
    week), a broadcast NLJ is impossible and a naive non-equi join is
    a cartesian. The rewrite: bucket time into 7-day epochs, EXPLODE
    each order's window into the (at most 2) buckets it straddles,
    hash-join on the bucket key, and post-filter the exact range.
    Candidate volume = rows sharing a week bucket — linear in data at
    fixed time density, shuffle-partitioned by bucket at any scale.
    NOTE on the fixture's scaling: sf replication multiplies rows on
    the SAME 7-year span, so per-day density (and hence pairs-per-
    order) grows with sf and any per-order x density join is
    quadratic in sf here — real growth adds history, holding density
    ~constant, which is the regime the bucket join is linear in. The
    registered demo takes one order quarter to keep the pair volume
    proportionate; the pattern is slice-independent.

    The ORACLE is the NAIVE non-equi join, so the driver hash
    certifies the rewrite EQUAL to the plain semantics (each matching
    pair shares exactly one shipdate bucket — no dedup needed; an
    order with no matches still counts 0 through the left join).
    Zero-match orders are preserved by CONDITIONAL aggregation, not a
    post-join filter: an order whose week buckets contain lineitems
    but none inside [o_orderdate, o_orderdate+7) must still aggregate
    to n=0 exactly like the oracle's left join — a post-join
    ``.where`` would drop it entirely on sparse data (VERDICT r05 #2).
    Partial map-side SUM collapses the candidate rows before the
    per-order shuffle, so the conditional form costs no extra shuffle
    volume versus the filtered form.
    Plan gate: the join is a shuffle/hash join on the bucket key, no
    BroadcastNestedLoop, no CartesianProduct."""
    o = T(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("date"))
        & (F.col("o_orderdate") < F.lit("1995-04-01").cast("date"))
    ).select("o_orderkey", "o_orderdate")
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return _weekly_bucket_range_join(o, li)


_R8C_U_L = _U_LINEITEM
_R8C_U_O = "(" + _md5_sql("CAST(o_orderkey AS VARCHAR)") + " + 0.5) / 16777216.0"

_R8C_ORACLE = (
    "WITH lc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM lineitem), "
    "oc AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM orders), "
    "l AS (SELECT l_orderkey, CAST(l_shipdate AS DATE) AS l_shipdate "
    f"FROM lineitem, lc WHERE {_R8C_U_L} < LEAST(1.0, 144000.0 / lc.n)), "
    "o AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate "
    f"FROM orders, oc WHERE {_R8C_U_O} < LEAST(1.0, 36000.0 / oc.n)), "
    "j AS (SELECT o.o_orderkey, YEAR(o.o_orderdate) AS y, "
    "CAST(COUNT(l.l_orderkey) AS BIGINT) AS n "
    "FROM o LEFT JOIN l "
    "ON l.l_shipdate >= o.o_orderdate AND l.l_shipdate < o.o_orderdate + 7 "
    "GROUP BY 1, 2) "
    "SELECT CAST(y AS INTEGER) AS y, CAST(COUNT(*) AS BIGINT) AS n_orders, "
    "CAST(SUM(n) AS BIGINT) AS total_pairs, "
    "ROUND(CAST(SUM(n) AS DOUBLE) / COUNT(*), 8) AS avg_per_order "
    "FROM j GROUP BY y ORDER BY y"
)


@register(
    "r8c_range_join_sparse",
    oracle=_R8C_ORACLE,
    tags=("R8", "scale-pattern"),
)
def r8c_range_join_sparse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R8c: the bucketed range join in its LINEAR regime — full 7-year
    span at FIXED absolute time-density (VERDICT r05 #8). r8b's
    docstring notes the fixture's sf replication grows per-day density
    (so pairs-per-order grows with sf and any range join is quadratic
    in sf THERE), while real growth adds history at ~constant density
    — the regime the bucket join is linear in. This variant pins that
    regime on the fixture itself: both facts are downsampled to a
    fixed absolute density (144k lineitems / 36k orders ≈ 400 and 100
    per week over the 7-year span, ~sf0.1's density) by a
    DETERMINISTIC cross-engine hash slice — u = (md5 24-bit prefix +
    0.5)/2^24 < LEAST(1, target/count), the curation.md5_prefix_int
    rule — with the keep-fraction derived DECLARATIVELY from a 1-row
    count agg broadcast into the filter (no driver-side count; at
    sf<=0.01 the fraction saturates at 1 so the oracle is the plain
    full-span naive join). Past the saturation point the kept volume
    — and hence the bucket join's candidate volume Sum|o_b|x|l_b| —
    is CONSTANT in sf, so wall time grows only with the scan: the
    sf0.1 -> sf1 ratio measures the linear regime directly (BENCH.md
    row), versus r8b's quarter-slice density regime. Join shape is
    identical to r8b: explode each order's 7-day window into its <=2
    week buckets, hash-join on the bucket key, conditional-count the
    exact range so zero-match orders aggregate to n=0."""
    from ipydataclean_spark.functions.exact import md5_prefix_int

    li_all = T(spark, sf_dir, "lineitem")
    lc = li_all.agg((F.lit(144000.0) / F.count(F.lit(1))).alias("frac_l"))
    u_l = (
        md5_prefix_int(
            F.concat_ws("-", F.col("l_orderkey").cast("string"),
                        F.col("l_linenumber").cast("string"))
        )
        + F.lit(0.5)
    ) / F.lit(16777216.0)
    li = (
        li_all.crossJoin(F.broadcast(lc))
        .where(u_l < F.least(F.lit(1.0), F.col("frac_l")))
        .select("l_orderkey", "l_shipdate")
    )
    o_all = T(spark, sf_dir, "orders")
    oc = o_all.agg((F.lit(36000.0) / F.count(F.lit(1))).alias("frac_o"))
    u_o = (
        md5_prefix_int(F.col("o_orderkey").cast("string")) + F.lit(0.5)
    ) / F.lit(16777216.0)
    o = (
        o_all.crossJoin(F.broadcast(oc))
        .where(u_o < F.least(F.lit(1.0), F.col("frac_o")))
        .select("o_orderkey", "o_orderdate")
    )
    return _weekly_bucket_range_join(o, li)
