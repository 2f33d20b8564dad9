"""TPC-H analogue corpus, part 2 — the remaining TPC-H query shapes
(Q2, Q8, Q9, Q11-Q14, Q16-Q22) adapted to the fixture schema
(FIXTURES.md; no partsupp table, so partsupp-based queries use
lineitem-derived supply metrics with identical relational shape:
correlated min, share-of-total thresholds, multi-EXISTS, etc.).

Together with relational.py (Q1/Q3/Q4/Q5/Q6/Q7/Q10/Q15) this gives
the full 22-query TPC-H pattern coverage, every one DuckDB-oracle
value-hash-checked. All joins against dims (part/supplier/nation/
customer) are broadcast (R6) so at 100 TB only fact-fact joins
shuffle; scalar thresholds are two-phase (tiny job → literal) per
SURVEY.md §4.3.2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register


@register(
    "q2_min_cost_supplier",
    oracle=(
        "WITH cost AS (SELECT l_partkey, l_suppkey, "
        f"({exact.dsum_sql('l_extendedprice')} / {exact.dsum_sql('l_quantity')}) AS unit_cost "
        "FROM lineitem GROUP BY l_partkey, l_suppkey), "
        "ranked AS (SELECT l_partkey, l_suppkey, unit_cost, "
        "MIN(unit_cost) OVER (PARTITION BY l_partkey) AS min_cost FROM cost) "
        "SELECT p_partkey, p_name, s_name, unit_cost FROM ranked "
        "JOIN part ON p_partkey = l_partkey JOIN supplier ON s_suppkey = l_suppkey "
        "WHERE unit_cost = min_cost AND p_size <= 15 AND p_type = 'LARGE' "
        "ORDER BY p_partkey, s_name"
    ),
    tags=("R3", "R25", "W1"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape (min-cost supplier per part): the correlated
    `= (SELECT MIN ...)` subquery decorrelated as a window-min over the
    per-(part,supplier) aggregate — one shuffle on l_partkey serves
    both the aggregate and the window. Unit cost is ratio-of-sums
    (Σ price / Σ qty), not avg-of-ratios: per-row quotients carry
    arbitrary fractional digits and their double→decimal cast is the
    one op Spark and DuckDB round differently (exact.py contract)."""
    cost = (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey")
        .agg((exact.dsum("l_extendedprice") / exact.dsum("l_quantity")).alias("unit_cost"))
    )
    ranked = cost.withColumn(
        "min_cost", F.min("unit_cost").over(Window.partitionBy("l_partkey"))
    ).where(F.col("unit_cost") == F.col("min_cost"))
    part = T(spark, sf_dir, "part").where((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE"))
    supp = T(spark, sf_dir, "supplier")
    return (
        ranked.join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("p_partkey", "p_name", "s_name", "unit_cost")
        .orderBy("p_partkey", "s_name")
    )


@register(
    "q8_market_share",
    oracle=(
        "SELECT o_year, "
        f"({exact.dsum_sql('nation_volume')} / {exact.dsum_sql('volume')}) AS mkt_share "
        "FROM (SELECT CAST(YEAR(o_orderdate) AS INTEGER) AS o_year, "
        "l_extendedprice * (1 - l_discount) AS volume, "
        "CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) "
        "ELSE 0.0 END AS nation_volume "
        "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
        "JOIN customer ON c_custkey = o_custkey "
        "JOIN nation n1 ON n1.n_nationkey = c_nationkey "
        "JOIN region ON r_regionkey = n1.n_regionkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation n2 ON n2.n_nationkey = s_nationkey "
        "JOIN part ON p_partkey = l_partkey "
        "WHERE r_name = 'ASIA' AND p_type = 'PROMO') "
        "GROUP BY o_year ORDER BY o_year"
    ),
    tags=("R3", "R6", "R13"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape (national market share by year): conditional
    volume / total volume per year; every dim join broadcast."""
    n1 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = T(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = T(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    part = T(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (
        T(spark, sf_dir, "lineitem")
        .join(T(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(T(spark, sf_dir, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("n1_key") == F.col("c_nationkey"))
        .join(F.broadcast(region), F.col("r_regionkey") == F.col("n1_region"))
        .join(T(spark, sf_dir, "supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n2), F.col("n2_key") == F.col("s_nationkey"))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            vol.alias("volume"),
            F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0.0)).alias(
                "nation_volume"
            ),
        )
    )
    return (
        j.groupBy("o_year")
        .agg((exact.dsum("nation_volume") / exact.dsum("volume")).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "q9_product_profit",
    oracle=(
        "SELECT n_name AS nation, o_year, "
        f"{exact.dsum_sql('amount')} AS sum_profit FROM ("
        "SELECT n_name, CAST(YEAR(o_orderdate) AS INTEGER) AS o_year, "
        "l_extendedprice * (1 - l_discount) - 0.6 * p_retailprice * l_quantity AS amount "
        "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
        "JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON n_nationkey = s_nationkey "
        "JOIN part ON p_partkey = l_partkey "
        "WHERE p_name LIKE '%gear%') "
        "GROUP BY n_name, o_year ORDER BY nation, o_year DESC"
    ),
    tags=("R3", "R6", "R11"),
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape (product-type profit by nation and year).
    ps_supplycost is modeled as 0.6·p_retailprice (no partsupp table,
    FIXTURES.md) — the relational shape (part-name LIKE filter, 5-way
    join, profit expression, nation×year rollup) is identical."""
    part = T(spark, sf_dir, "part").where(F.col("p_name").like("%gear%"))
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.6) * F.col("p_retailprice") * F.col("l_quantity")
    )
    j = (
        T(spark, sf_dir, "lineitem")
        .join(T(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(T(spark, sf_dir, "supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(T(spark, sf_dir, "nation")), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
            amount.alias("amount"),
        )
    )
    return (
        j.groupBy("nation", "o_year")
        .agg(exact.dsum("amount").alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@register(
    "q11_important_parts",
    oracle=(
        "WITH pv AS (SELECT l_partkey, "
        f"{exact.dsum_sql('l_extendedprice * l_quantity')} AS part_value "
        "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON n_nationkey = s_nationkey "
        "WHERE n_name = 'NATION_1' GROUP BY l_partkey) "
        "SELECT l_partkey, part_value FROM pv "
        "WHERE part_value > (SELECT "
        f"{exact.dsum_sql('l_extendedprice * l_quantity')} * 0.001 "
        "FROM lineitem JOIN supplier ON s_suppkey = l_suppkey "
        "JOIN nation ON n_nationkey = s_nationkey WHERE n_name = 'NATION_1') "
        "ORDER BY part_value DESC, l_partkey"
    ),
    tags=("R3", "R25"),
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 shape (important stock): per-part value for one
    nation's suppliers, kept if above a fraction of the national total.
    Two-phase scalar threshold; the per-part agg is reused for the
    total via a second tiny agg over it (no second fact scan)."""
    supp = (
        T(spark, sf_dir, "supplier")
        .join(
            F.broadcast(T(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .select("s_suppkey")
    )
    pv = (
        T(spark, sf_dir, "lineitem")
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum((F.col("l_extendedprice") * F.col("l_quantity")).cast(exact.DEC)).alias(
                "pv_dec"
            )
        )
        .localCheckpoint()
    )
    # ONE fact scan: the per-part DECIMAL partials re-sum to the exact
    # national total (decimal addition is associative — identical to a
    # direct decimal sum, so the threshold math matches DuckDB's
    # independent full-scan computation bit-for-bit). localCheckpoint
    # materializes pv so the scalar job and the filter reuse it.
    # None when the nation has no lineitems at tiny SF — 0.0 keeps the
    # filter well-formed and the (empty) result identical to the oracle's
    # NULL-threshold comparison.
    total = pv.agg(F.sum("pv_dec").cast("double")).first()[0] or 0.0
    return (
        pv.select("l_partkey", F.col("pv_dec").cast("double").alias("part_value"))
        .where(F.col("part_value") > F.lit(total * 0.001))
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


@register(
    "q12_priority_by_status",
    oracle=(
        "SELECT l_linestatus, "
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count "
        "FROM lineitem JOIN orders ON o_orderkey = l_orderkey "
        "WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01' "
        "AND l_shipdate > o_orderdate "
        "GROUP BY l_linestatus ORDER BY l_linestatus"
    ),
    tags=("R3", "R13"),
)
def q12_priority_by_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape (shipping-priority counts; l_linestatus stands
    in for the absent l_shipmode): conditional counts over a
    fact⋈fact join with a cross-column date predicate."""
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(T(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .where(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("long").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q13_order_count_distribution",
    oracle=(
        "SELECT c_count, COUNT(*) AS custdist FROM ("
        "SELECT c_custkey, COUNT(o_orderkey) AS c_count FROM customer "
        "LEFT JOIN orders ON o_custkey = c_custkey AND o_orderpriority <> '1-URGENT' "
        "GROUP BY c_custkey) "
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"
    ),
    tags=("R4", "R11"),
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q13 shape (customer order-count distribution): left join
    with an extra ON-clause predicate, then a double aggregation."""
    cust = T(spark, sf_dir, "customer")
    orders = T(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


_Q14_PROMO_CASE = "CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END"


@register(
    "q14_promo_revenue",
    oracle=(
        "SELECT (100.0 * "
        f"{exact.dsum_sql(_Q14_PROMO_CASE)}"
        f" / {exact.dsum_sql('l_extendedprice * (1 - l_discount)')}) AS promo_revenue "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1997-03-01' AND l_shipdate < TIMESTAMP '1997-04-01'"
    ),
    tags=("R3", "R6", "R13"),
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 (promo revenue percent in a month): broadcast part
    join; the month filter is pushed to the parquet scan."""
    li = T(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0.0))
    return (
        li.join(T(spark, sf_dir, "part"), F.col("p_partkey") == F.col("l_partkey"))
        .agg((F.lit(100.0) * exact.dsum(promo) / exact.dsum(vol)).alias("promo_revenue"))
    )


@register(
    "q16_supplier_count",
    oracle=(
        "SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand <> 'Brand#5' AND p_type NOT LIKE 'MEDIUM%' "
        "AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49) "
        "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY p_brand, p_type, p_size "
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"
    ),
    tags=("R5", "R6", "R11"),
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q16 shape (supplier count by part attributes): NOT IN
    blacklist as a left-anti join (negative-acctbal suppliers stand in
    for the absent comment column), distinct-count aggregate."""
    part = T(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & ~F.col("p_type").like("MEDIUM%")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = T(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        T(spark, sf_dir, "lineitem")
        .join(bad_supp, F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "q17_small_quantity_revenue",
    oracle=(
        "WITH pa AS (SELECT l_partkey AS avg_partkey, "
        f"{exact.davg_sql('l_quantity')} AS avg_qty FROM lineitem GROUP BY l_partkey) "
        f"SELECT ({exact.dsum_sql('l_extendedprice')} / 7.0) AS avg_yearly "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "JOIN pa ON avg_partkey = l_partkey "
        "WHERE p_brand = 'Brand#3' AND l_quantity < 0.2 * avg_qty"
    ),
    tags=("R3", "R25"),
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 (small-quantity-order revenue): the correlated
    per-part AVG subquery decorrelated into an aggregate + join —
    at scale both sides shuffle on l_partkey once."""
    pa = (
        T(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_partkey").alias("avg_partkey"))
        .agg(exact.davg("l_quantity").alias("avg_qty"))
    )
    part = T(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    return (
        T(spark, sf_dir, "lineitem")
        .join(part, F.col("p_partkey") == F.col("l_partkey"))
        .join(pa, F.col("avg_partkey") == F.col("l_partkey"))
        .where(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
        .agg((exact.dsum("l_extendedprice") / F.lit(7.0)).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    oracle=(
        "SELECT c_name, c_custkey, o_orderkey, MIN(o_orderdate) AS o_orderdate, "
        f"MIN(o_totalprice) AS o_totalprice, {exact.dsum_sql('l_quantity')} AS sum_qty "
        "FROM customer JOIN orders ON o_custkey = c_custkey "
        "JOIN lineitem ON l_orderkey = o_orderkey "
        "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem "
        f"GROUP BY l_orderkey HAVING {exact.dsum_sql('l_quantity')} > 300) "
        "GROUP BY c_name, c_custkey, o_orderkey "
        "ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100"
    ),
    tags=("R3", "R5", "R11", "R17"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q18 (large-volume customers): HAVING-filtered IN subquery
    as a semi join on the pre-aggregated order quantities."""
    big = (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(exact.dsum("l_quantity").alias("sq"))
        .where(F.col("sq") > 300)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        T(spark, sf_dir, "lineitem")
        .join(big, F.col("big_orderkey") == F.col("l_orderkey"), "left_semi")
        .join(T(spark, sf_dir, "orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(T(spark, sf_dir, "customer"), F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey")
        .agg(
            F.min("o_orderdate").alias("o_orderdate"),
            F.min("o_totalprice").alias("o_totalprice"),
            exact.dsum("l_quantity").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderdate"), F.asc("o_orderkey"))
        .limit(100)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=(
        f"SELECT {exact.dsum_sql('l_extendedprice * (1 - l_discount)')} AS revenue, "
        "COUNT(*) AS n FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11) "
        "OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20) "
        "OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"
    ),
    tags=("R2", "R6", "R8"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 (disjunctive brand/size/quantity predicates): the OR
    spans both join sides, so it cannot be pushed below the join —
    Catalyst still extracts the common p/l prefilters; part stays
    broadcast."""

    def band(brand: str, size_hi: int, q_lo: int, q_hi: int):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, size_hi)
            & F.col("l_quantity").between(q_lo, q_hi)
        )

    return (
        T(spark, sf_dir, "lineitem")
        .join(T(spark, sf_dir, "part"), F.col("p_partkey") == F.col("l_partkey"))
        .where(band("Brand#12", 5, 1, 11) | band("Brand#23", 10, 10, 20) | band("Brand#34", 15, 20, 30))
        .agg(
            exact.dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "q20_part_share_suppliers",
    oracle=(
        "WITH shipped AS (SELECT l_suppkey, l_partkey, "
        f"{exact.dsum_sql('l_quantity')} AS supp_qty "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_type = 'PROMO' AND l_shipdate >= TIMESTAMP '1997-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' GROUP BY l_suppkey, l_partkey), "
        "shares AS (SELECT l_suppkey, supp_qty / SUM(supp_qty) OVER (PARTITION BY l_partkey) AS share "
        "FROM shipped) "
        "SELECT DISTINCT s_suppkey, s_name FROM supplier "
        "JOIN nation ON n_nationkey = s_nationkey "
        "WHERE n_name = 'NATION_2' AND EXISTS ("
        "SELECT 1 FROM shares WHERE l_suppkey = s_suppkey AND share > 0.3) "
        "ORDER BY s_suppkey"
    ),
    tags=("R5", "R25", "W1"),
)
def q20_part_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q20 shape (suppliers with excess share of a part's supply;
    availqty modeled as shipped share — no partsupp table): per-pair
    agg → window share-of-total → EXISTS as semi join into the
    nation-filtered supplier dim."""
    shipped = (
        T(spark, sf_dir, "lineitem")
        .where(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(
            T(spark, sf_dir, "part").where(F.col("p_type") == "PROMO"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(exact.dsum("l_quantity").alias("supp_qty"))
    )
    shares = shipped.withColumn(
        "share",
        F.col("supp_qty") / F.sum("supp_qty").over(Window.partitionBy("l_partkey")),
    ).where(F.col("share") > 0.3)
    nation = T(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_2")
    return (
        T(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(shares, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@register(
    "q21_sole_return_suppliers",
    oracle=(
        "WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem "
        "JOIN orders ON o_orderkey = l_orderkey WHERE o_orderstatus = 'F'), "
        "rpairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem "
        "JOIN orders ON o_orderkey = l_orderkey "
        "WHERE o_orderstatus = 'F' AND l_returnflag = 'R') "
        "SELECT s_name, COUNT(*) AS numwait FROM rpairs r JOIN supplier ON s_suppkey = r.l_suppkey "
        "WHERE EXISTS (SELECT 1 FROM pairs p WHERE p.l_orderkey = r.l_orderkey "
        "AND p.l_suppkey <> r.l_suppkey) "
        "AND NOT EXISTS (SELECT 1 FROM rpairs r2 WHERE r2.l_orderkey = r.l_orderkey "
        "AND r2.l_suppkey <> r.l_suppkey) "
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10"
    ),
    tags=("R5", "R11", "R17"),
)
def q21_sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape (suppliers solely responsible in multi-supplier
    orders; returnflag='R' stands in for the absent receipt/commit
    delay).

    Optimization round 12 (guide §2.4): the EXISTS/NOT-EXISTS pair was
    previously three separate lineitem scans (pairs, rpairs, rother) +
    two-level distincts + SortMergeJoin semi/anti self-joins on a
    non-equi key. Both quantifiers are per-order counting statements
    over the distinct (order, supplier) pair grain:

      EXISTS other-supplier pair      <=>  n_supp_in_order >= 2
      NOT EXISTS other-R-supplier     <=>  n_r_supp_in_order == 1
                                           (this pair being one of them)

    so ONE scan builds the pair grain (groupBy order+supp with a
    MAX(is R) flag — map-side partial agg) and ONE order-keyed window
    derives both counts; the semi/anti joins and two extra fact scans
    disappear. Output proven identical against the unchanged oracle
    (hash-green) and the old plan's rows."""
    base = (
        T(spark, sf_dir, "lineitem")
        .join(
            T(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select("l_orderkey", "l_suppkey", "l_returnflag")
    )
    pair = base.groupBy("l_orderkey", "l_suppkey").agg(
        F.max((F.col("l_returnflag") == "R").cast("int")).alias("has_r")
    )
    wo = Window.partitionBy("l_orderkey")
    sole = (
        pair.withColumn("n_supp", F.count(F.lit(1)).over(wo))
        .withColumn("n_r_supp", F.sum("has_r").over(wo))
        .where((F.col("has_r") == 1) & (F.col("n_supp") >= 2) & (F.col("n_r_supp") == 1))
    )
    return (
        sole.join(T(spark, sf_dir, "supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@register(
    "q22_dormant_customers",
    oracle=(
        "WITH avg_bal AS (SELECT "
        f"{exact.davg_sql('c_acctbal')} AS ab FROM customer "
        "WHERE c_acctbal > 0.0 AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)) "
        "SELECT c_nationkey, COUNT(*) AS numcust, "
        f"{exact.dsum_sql('c_acctbal')} AS totacctbal "
        "FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13) "
        "AND c_acctbal > (SELECT ab FROM avg_bal) "
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderdate >= TIMESTAMP '1999-01-01') "
        "GROUP BY c_nationkey ORDER BY c_nationkey"
    ),
    tags=("R5", "R25", "R11"),
)
def q22_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape (wealthy customers with no recent orders;
    nationkey set stands in for the absent phone prefix): scalar avg
    threshold (two-phase) + anti join against recent orders."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    cust = T(spark, sf_dir, "customer").where(F.col("c_nationkey").isin(nations))
    avg_bal = cust.where(F.col("c_acctbal") > 0.0).agg(exact.davg("c_acctbal")).first()[0]
    recent = T(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    )
    return (
        cust.where(F.col("c_acctbal") > F.lit(avg_bal))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            exact.dsum("c_acctbal").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


@register(
    "q23_part_cooccurrence",
    oracle=(
        "WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) "
        "SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
        "CAST(COUNT(*) AS BIGINT) AS n_orders "
        "FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey "
        "GROUP BY 1, 2 ORDER BY n_orders DESC, part_a, part_b LIMIT 25"
    ),
    tags=("Q23", "R3", "analytics"),
)
def q23_part_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q23 (beyond TPC-H): market-basket co-occurrence — part pairs
    bought together, the association-mining primitive. Basket-keyed
    self-join on the distinct (order, part) table: fanout per order is
    C(basket,2), bounded by basket size (≤ 7 here), so the pair table
    stays ~(avg_basket · rows) — NOT n². At 100 TB the guard is a
    basket-size cap before the join (one mega-basket explodes
    quadratically; filter or sample those first), then this exact
    shape. Pair counts are one partial-agg shuffle keyed (a, b);
    TakeOrderedAndProject serves the top-k."""
    items = (
        T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    return (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(25)
    )
