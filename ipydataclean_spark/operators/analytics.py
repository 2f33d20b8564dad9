"""Event-pipeline analytics operators: funnel, cohort retention, and
fuzzy string matching — the classic product-analytics queries a
reference user would run after cleaning (REF-adjacent), each a single
declarative plan with a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import QUERIES, register


@register(
    "q_funnel_conversion",
    oracle=(
        "WITH per_user AS (SELECT user_id, "
        "MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view, "
        "MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click, "
        "MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase "
        "FROM events GROUP BY user_id) "
        "SELECT CAST(COUNT_IF(t_view IS NOT NULL) AS BIGINT) AS n_viewed, "
        "CAST(COUNT_IF(t_view IS NOT NULL AND t_click > t_view) AS BIGINT) AS n_clicked_after_view, "
        "CAST(COUNT_IF(t_view IS NOT NULL AND t_click > t_view AND t_purchase > t_click) AS BIGINT) AS n_purchased_after_click "
        "FROM per_user"
    ),
    tags=("analytics", "R11", "R13"),
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis (view → click → purchase, ordered first-touch):
    one conditional-min aggregate per user, then one global conditional
    count — two partial-aggregable stages, no self-joins (the naive
    form is a 3-way self-join; this is the plan that survives 100 TB).

    COUNT_IF note: DuckDB's returns HUGEINT — cast to BIGINT in the
    oracle for schema parity with Spark's count_if.
    """
    per_user = (
        T(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
            F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
            F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("t_purchase"),
        )
    )
    viewed = F.col("t_view").isNotNull()
    clicked = viewed & (F.col("t_click") > F.col("t_view"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return per_user.agg(
        F.count_if(viewed).alias("n_viewed"),
        F.count_if(clicked).alias("n_clicked_after_view"),
        F.count_if(purchased).alias("n_purchased_after_click"),
    )


@register(
    "q_cohort_retention",
    oracle=(
        "WITH firsts AS (SELECT user_id, CAST(DATE_TRUNC('week', MIN(ts)) AS DATE) AS cohort_week "
        "FROM events GROUP BY user_id), "
        "active AS (SELECT DISTINCT user_id, CAST(DATE_TRUNC('week', ts) AS DATE) AS active_week "
        "FROM events) "
        "SELECT cohort_week, "
        "CAST(DATEDIFF('day', cohort_week, active_week) / 7 AS INTEGER) AS week_offset, "
        "COUNT(*) AS n_active_users "
        "FROM active JOIN firsts USING (user_id) "
        "GROUP BY cohort_week, week_offset ORDER BY cohort_week, week_offset"
    ),
    tags=("analytics", "R3", "R11"),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity week, counted
    in each subsequent active week. Both sides aggregate BEFORE the
    join (first-touch table is |users| rows; the active table is
    |users|×weeks) — the join is dimension-sized at any scale, and the
    user_id shuffle is shared by both aggregates."""
    ev = T(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).cast("date").alias("active_week")
    ).distinct()
    return (
        active.join(firsts, "user_id")
        .select(
            "cohort_week",
            (F.datediff("active_week", "cohort_week") / 7).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "l2e_fuzzy_match_join",
    oracle=(
        "WITH sub AS (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 50 = 0) "
        "SELECT a.c_custkey AS key_a, b.c_custkey AS key_b, "
        "CAST(LEVENSHTEIN(a.c_name, b.c_name) AS INTEGER) AS edit_dist "
        "FROM sub a JOIN sub b ON LENGTH(a.c_name) = LENGTH(b.c_name) "
        "AND a.c_custkey < b.c_custkey "
        "WHERE LEVENSHTEIN(a.c_name, b.c_name) <= 2 "
        "ORDER BY key_a, key_b"
    ),
    tags=("L2", "R8", "fuzzy"),
)
def l2e_fuzzy_match_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string-match join: pairs within edit distance 2, with a
    cheap equi-join blocking key (string length) ahead of the O(n·m)
    levenshtein predicate — the blocked form of a similarity join (at
    scale the block key becomes length+prefix or a q-gram bucket, same
    plan shape; an unblocked version is a pure cross join). Pair logic
    lives in fuzzy_name_pairs, shared with er1's match step."""
    return fuzzy_name_pairs(spark, sf_dir).orderBy("key_a", "key_b")


def fuzzy_name_pairs(
    spark: SparkSession, sf_dir: str, same_nation: bool = False
) -> DataFrame:
    """(key_a < key_b, edit_dist ≤ 2) customer-name match pairs over
    the %50 subset — the blocked similarity join behind l2e and er1.
    ``same_nation`` adds the second match predicate er1 needs: name
    similarity alone glues the synthetic digit-named customers into
    one giant chain component; similarity AND shared nation is the
    realistic multi-attribute match rule and fragments the graph."""
    sub = (
        T(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 50 == 0)
        .select(
            "c_custkey", "c_name", "c_nationkey",
            F.length("c_name").alias("name_len"),
        )
    )
    a = sub.select(
        F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nat_a"), F.col("name_len")
    )
    b = sub.select(
        F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nat_b"), F.col("name_len").alias("len_b"),
    )
    cond = (F.col("name_len") == F.col("len_b")) & (F.col("key_a") < F.col("key_b"))
    if same_nation:
        cond = cond & (F.col("nat_a") == F.col("nat_b"))
    return (
        a.join(b, cond)
        .where(F.levenshtein("name_a", "name_b") <= 2)
        .select("key_a", "key_b", F.levenshtein("name_a", "name_b").alias("edit_dist"))
    )


_ER1_ORACLE = (
    "WITH RECURSIVE "
    "sub AS (SELECT c_custkey, c_name, c_acctbal, c_nationkey FROM customer "
    "WHERE c_custkey % 50 = 0), "
    "pairs AS (SELECT a.c_custkey AS ka, b.c_custkey AS kb FROM sub a "
    "JOIN sub b ON LENGTH(a.c_name) = LENGTH(b.c_name) "
    "AND a.c_nationkey = b.c_nationkey "
    "AND a.c_custkey < b.c_custkey "
    "WHERE LEVENSHTEIN(a.c_name, b.c_name) <= 2), "
    "edges AS (SELECT ka AS a, kb AS b FROM pairs "
    "UNION SELECT kb, ka FROM pairs), "
    # transitive closure: cluster = min reachable id (exact fixpoint)
    "r(a, b) AS (SELECT c_custkey, c_custkey FROM sub "
    "UNION SELECT r.a, e.b FROM r JOIN edges e ON r.b = e.a), "
    "lbl AS (SELECT a AS id, MIN(b) AS cluster_id FROM r GROUP BY a), "
    "sized AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members "
    "FROM lbl GROUP BY cluster_id), "
    "ranked AS (SELECT l.cluster_id, s.c_custkey, s.c_name, s.c_acctbal, "
    "ROW_NUMBER() OVER (PARTITION BY l.cluster_id "
    "ORDER BY s.c_acctbal DESC, s.c_custkey) AS rn "
    "FROM sub s JOIN lbl l ON s.c_custkey = l.id) "
    "SELECT rk.cluster_id, rk.c_custkey AS canonical_key, "
    "rk.c_name AS canonical_name, rk.c_acctbal AS canonical_acctbal, "
    "z.n_members "
    "FROM ranked rk JOIN sized z ON rk.cluster_id = z.cluster_id "
    "WHERE rk.rn = 1 ORDER BY rk.cluster_id"
)


@register(
    "er1_entity_resolution",
    oracle=_ER1_ORACLE,
    tags=("ER1", "L2", "C16", "fuzzy", "cleaning"),
)
def er1_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER1: end-to-end ENTITY RESOLUTION — the flagship multi-record
    cleaning pipeline: block (name length) → fuzzy match (edit ≤ 2
    AND same nation — the multi-attribute rule; name similarity alone
    chains the synthetic digit names into one component) → cluster
    (connected components over the match graph) → GOLDEN RECORD per
    cluster (survivor = highest account balance, ties to the lowest
    key) with the member count.

    The notable part is the correctness proof of the ITERATIVE stage:
    Spark runs alternating large-star/small-star connected components
    (llm_extra.cluster_pairs — O(log n) rounds over a contracting
    edge table, early-exit on fixpoint), while the oracle computes
    the same components as a RECURSIVE-CTE transitive closure
    (cluster = min reachable id) — two entirely different fixpoint
    mechanisms whose driver hash must agree, upgrading the clustering
    primitive from rows-only/golden (l2d) to value-hash-certified.
    Closure cost is Σ|component|² — fine for an oracle at sf0.01; the
    Spark side never joins a corpus-wide label table, the 100 TB
    shape (max_iter 30 is ample for O(log n) convergence;
    cluster_pairs breaks early)."""
    from ipydataclean_spark.operators.llm_extra import cluster_pairs
    from pyspark.sql import Window

    sub = (
        T(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 50 == 0)
        .select("c_custkey", "c_name", "c_acctbal")
    )
    pairs = fuzzy_name_pairs(spark, sf_dir, same_nation=True).select(
        F.col("key_a").alias("a"), F.col("key_b").alias("b")
    )
    labels = cluster_pairs(
        sub.select(F.col("c_custkey").alias("id")), pairs, max_iter=30
    )
    sized = labels.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    )
    ranked = (
        sub.join(labels, sub.c_custkey == labels.id)
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("cluster_id").orderBy(
                    F.desc("c_acctbal"), F.asc("c_custkey")
                )
            ),
        )
        .where(F.col("rn") == 1)
    )
    return (
        ranked.join(sized, "cluster_id")
        .select(
            "cluster_id",
            F.col("c_custkey").alias("canonical_key"),
            F.col("c_name").alias("canonical_name"),
            F.col("c_acctbal").alias("canonical_acctbal"),
            "n_members",
        )
        .orderBy("cluster_id")
    )


_T1_SQL = (
    "SELECT CAST(GROUPING(d) AS INTEGER) AS g_day, "
    "CAST(GROUPING(h) AS INTEGER) AS g_hour, d AS day_bucket, h AS hour_bucket, "
    f"COUNT(*) AS n_events, {exact.dsum_sql('value')} AS total_value "
    "FROM (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, "
    "CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, value FROM events) "
    "GROUP BY GROUPING SETS ((d, h), (d), ()) "
    "ORDER BY g_day, g_hour, day_bucket NULLS FIRST, hour_bucket NULLS FIRST"
)


@register("t1_time_rollup_sql", oracle=_T1_SQL, tags=("analytics", "R12", "SQL-entry", "ST1"))
def t1_time_rollup_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity time rollup: hour buckets,
    day buckets, and the grand total in ONE Expand+HashAggregate pass
    over events (GROUPING SETS — never one scan per granularity).
    The continuous-aggregate shape a time-series store maintains
    incrementally; inc1_incremental_stats carries the delta-merge form.
    SQL entry point: identical ANSI text on both engines; grouping
    flags disambiguate the NULL bucket rows."""
    from ipydataclean_spark.catalog import register_views

    register_views(spark, sf_dir, only=("events",))
    return spark.sql(_T1_SQL)


@register(
    "q_rfm_segments",
    oracle=(
        "WITH rfm AS (SELECT o_custkey, MAX(o_orderdate) AS r, "
        "CAST(COUNT(*) AS BIGINT) AS f, "
        + exact.dsum_sql("o_totalprice")
        + " AS m FROM orders GROUP BY o_custkey), "
        "tiles AS (SELECT o_custkey, m, "
        "NTILE(4) OVER (ORDER BY r DESC, o_custkey) AS rt, "
        "NTILE(4) OVER (ORDER BY f DESC, o_custkey) AS ft, "
        "NTILE(4) OVER (ORDER BY m DESC, o_custkey) AS mt FROM rfm) "
        "SELECT CAST(rt AS INT) AS r_tile, CAST(ft AS INT) AS f_tile, "
        "CAST(mt AS INT) AS m_tile, CAST(COUNT(*) AS BIGINT) AS n_customers, "
        "ROUND(" + exact.dsum_sql("m") + ", 2) AS total_monetary "
        "FROM tiles GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"
    ),
    tags=("analytics", "W1", "R13"),
)
def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — quartile-bin each customer on
    Recency (latest order), Frequency (order count), Monetary (exact
    decimal spend), then size each of the ≤64 segments (the classic
    retention-marketing rollup a reference user runs post-clean).

    Determinism: every NTILE orders by (metric, o_custkey) so tile
    assignment is total-order stable across engines/partitionings.
    Plan: one o_custkey-keyed partial agg, then three DISTRIBUTED
    NTILE passes (functions/ranking.py: range-repartition + parallel
    per-partition rank + P-row offset side plan — bit-identical to
    the global window, no single-partition sort; VERDICT r03 #2),
    one tiny final agg. Every stage is parallel at any |customers|."""
    from ipydataclean_spark.functions.ranking import with_global_ntile

    rfm = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.max("o_orderdate").alias("r"),
            F.count(F.lit(1)).alias("f"),
            exact.dsum("o_totalprice").alias("m"),
        )
    )
    # three INDEPENDENT narrow passes (custkey, metric) joined back on
    # the key — chaining them would nest each pass's offset side plan
    # inside the next pass's lineage; independent passes all hang off
    # the same orders aggregate, which AQE executes once (stage reuse)
    tiles = rfm.select("o_custkey", "m")
    for metric, out in (("r", "r_tile"), ("f", "f_tile"), ("m", "m_tile")):
        t = with_global_ntile(
            rfm.select("o_custkey", metric),
            [F.desc(metric), F.asc("o_custkey")],
            4,
            out,
        ).select("o_custkey", out)
        tiles = tiles.join(t, "o_custkey")
    return (
        tiles.groupBy("r_tile", "f_tile", "m_tile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(exact.dsum("m"), 2).alias("total_monetary"),
        )
        .orderBy("r_tile", "f_tile", "m_tile")
    )


@register(
    "q_pareto_revenue",
    oracle=(
        "WITH rev AS (SELECT o_custkey, "
        + exact.dsum_sql("o_totalprice")
        + " AS m FROM orders GROUP BY o_custkey), "
        "tot AS (SELECT " + exact.dsum_sql("m") + " AS total, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM rev), "
        "ranked AS (SELECT ROW_NUMBER() OVER (ORDER BY m DESC, o_custkey) AS rnk, "
        "CAST(SUM(CAST(m AS DECIMAL(28,6))) OVER (ORDER BY m DESC, o_custkey "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum FROM rev) "
        "SELECT CAST(tot.n AS BIGINT) AS n_customers, "
        "ROUND(CAST(MIN(CASE WHEN cum / tot.total >= 0.5 THEN rnk END) AS DOUBLE) / tot.n, 8) AS frac_for_50pct, "
        "ROUND(CAST(MIN(CASE WHEN cum / tot.total >= 0.8 THEN rnk END) AS DOUBLE) / tot.n, 8) AS frac_for_80pct, "
        "ROUND(CAST(MIN(CASE WHEN cum / tot.total >= 0.9 THEN rnk END) AS DOUBLE) / tot.n, 8) AS frac_for_90pct "
        "FROM ranked CROSS JOIN tot GROUP BY tot.n"
    ),
    tags=("analytics", "W2"),
)
def q_pareto_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue concentration (Pareto curve readout): the smallest
    fraction of customers whose exact cumulative revenue reaches
    50% / 80% / 90% of the total — the "how top-heavy is this
    dimension" profile a skew-aware pipeline checks before choosing
    join/partition strategies (it is literally the skew diagnostic
    for o_custkey).

    Exactness: per-customer revenue and the running total both sum in
    DECIMAL, so the cum/total division and threshold comparisons see
    bit-identical inputs on both engines. Plan: one partial agg keyed
    o_custkey; rank AND running decimal sum come from the distributed
    ranking pattern (functions/ranking.py — range-repartition, keyed
    per-partition window, P-row offset side plan; no single-partition
    sort at any |customers|, VERDICT r03 #3); final fold is a 1-row
    agg."""
    from ipydataclean_spark.functions.ranking import with_global_rank

    rev = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(exact.dsum("o_totalprice").alias("m"))
    )
    ranked = with_global_rank(
        rev,
        [F.desc("m"), F.asc("o_custkey")],
        out="rnk",
        running_sums={"__cum_dec": F.col("m").cast("decimal(28,6)")},
    ).select("rnk", F.col("__cum_dec").cast("double").alias("cum"))
    tot = rev.agg(
        exact.dsum("m").alias("total"), F.count(F.lit(1)).cast("long").alias("n")
    )
    share = F.col("cum") / F.col("total")
    frac = lambda thr: F.round(  # noqa: E731
        F.min(F.when(share >= thr, F.col("rnk"))).cast("double") / F.col("n"), 8
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .groupBy("n")
        .agg(
            frac(0.5).alias("frac_for_50pct"),
            frac(0.8).alias("frac_for_80pct"),
            frac(0.9).alias("frac_for_90pct"),
        )
        .select(
            F.col("n").alias("n_customers"),
            "frac_for_50pct",
            "frac_for_80pct",
            "frac_for_90pct",
        )
    )


@register(
    "q24_ship_latency",
    oracle=(
        "SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_lines, "
        "ROUND(CAST(SUM(CAST(DATEDIFF('day', o_orderdate, l_shipdate) AS "
        "DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 8) AS avg_days, "
        "CAST(MIN(DATEDIFF('day', o_orderdate, l_shipdate)) AS BIGINT) AS min_days, "
        "CAST(MAX(DATEDIFF('day', o_orderdate, l_shipdate)) AS BIGINT) AS max_days, "
        "CAST(COUNT_IF(DATEDIFF('day', o_orderdate, l_shipdate) > 90) AS BIGINT) "
        "AS n_late "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    tags=("Q24", "R3", "analytics"),
)
def q24_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q24 (beyond TPC-H): order→ship latency per priority — the
    fulfillment-SLA rollup (mean/min/max days plus a >90-day breach
    count). The operational dashboard query a cleaned orders pipeline
    feeds.

    Exactness: day deltas are integers; the mean routes them through
    DECIMAL so the per-priority average is order-independent. Plan:
    one fact⋈orders equi-join (the irreducible shuffle — both sides
    fact-sized; bucketed layout is the recurring-workload remedy),
    then a tiny priority-keyed partial agg."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    days = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(
                F.sum(days.cast("decimal(28,6)")).cast("double") / F.count(F.lit(1)),
                8,
            ).alias("avg_days"),
            F.min(days).cast("long").alias("min_days"),
            F.max(days).cast("long").alias("max_days"),
            F.sum((days > 90).cast("long")).alias("n_late"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "q25_repeat_purchase",
    oracle=(
        "WITH gaps AS (SELECT o_custkey, "
        "DATEDIFF('day', LAG(o_orderdate) OVER "
        "(PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), o_orderdate) "
        "AS gap_days FROM orders), "
        "per_cust AS (SELECT o_custkey, CAST(COUNT(*) + 1 AS BIGINT) AS n_orders, "
        "ROUND(CAST(SUM(CAST(gap_days AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 8) "
        "AS avg_gap_days FROM gaps WHERE gap_days IS NOT NULL GROUP BY o_custkey) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_repeat_customers, "
        "CAST(MIN(n_orders) AS BIGINT) AS min_orders, "
        "CAST(MAX(n_orders) AS BIGINT) AS max_orders, "
        "ROUND(CAST(SUM(CAST(avg_gap_days AS DECIMAL(28,6))) AS DOUBLE) / COUNT(*), 8) "
        "AS mean_avg_gap_days "
        "FROM per_cust"
    ),
    tags=("Q25", "W2", "analytics"),
)
def q25_repeat_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q25 (beyond TPC-H): repeat-purchase cadence — per returning
    customer, the mean days between consecutive orders (lag window),
    rolled up to the population (the retention-health metric cohort
    analysis drills into).

    Exactness: day gaps are ints; both the per-customer mean and the
    population mean route through DECIMAL. Plan: ONE window shuffle
    keyed o_custkey (lag), a customer-keyed partial agg, and a 1-row
    fold — no fact-fact join."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (
        T(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.datediff(
                F.col("o_orderdate"), F.lag("o_orderdate").over(w)
            ).alias("gap_days"),
        )
        .where(F.col("gap_days").isNotNull())
    )
    per_cust = gaps.groupBy("o_custkey").agg(
        (F.count(F.lit(1)) + 1).cast("long").alias("n_orders"),
        F.round(
            F.sum(F.col("gap_days").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)),
            8,
        ).alias("avg_gap_days"),
    )
    return per_cust.agg(
        F.count(F.lit(1)).cast("long").alias("n_repeat_customers"),
        F.min("n_orders").cast("long").alias("min_orders"),
        F.max("n_orders").cast("long").alias("max_orders"),
        F.round(
            F.sum(F.col("avg_gap_days").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1)),
            8,
        ).alias("mean_avg_gap_days"),
    )


@register(
    "q26_stickiness",
    oracle=(
        "WITH d AS (SELECT CAST(ts AS DATE) AS day, user_id FROM events), "
        "dau AS (SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau "
        "FROM d GROUP BY day), "
        "mau AS (SELECT DATE_TRUNC('month', day) AS mon, "
        "CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau FROM d GROUP BY 1) "
        "SELECT dau.day, dau.dau, mau.mau, "
        "ROUND(CAST(dau.dau AS DOUBLE) / mau.mau, 8) AS stickiness "
        "FROM dau JOIN mau ON DATE_TRUNC('month', dau.day) = mau.mon "
        "ORDER BY dau.day"
    ),
    tags=("Q26", "analytics", "ST1"),
)
def q26_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q26: DAU/MAU stickiness — daily active users over the month's
    active users (the engagement-health ratio every product dashboard
    leads with).

    Plan: one event scan feeds BOTH distinct aggregations (day-keyed
    and month-keyed — each a partial-aggregable distinct); the join
    back is calendar-sized (days ⋈ months), broadcast regardless of
    fact size. No windows, no fact-fact join."""
    ev = T(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "user_id"
    )
    dau = ev.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    mau = (
        ev.groupBy(F.date_trunc("month", F.col("day")).cast("date").alias("mon"))
        .agg(F.countDistinct("user_id").alias("mau"))
    )
    return (
        dau.join(
            F.broadcast(mau),
            F.date_trunc("month", F.col("day")).cast("date") == F.col("mon"),
        )
        .select(
            "day",
            "dau",
            "mau",
            F.round(F.col("dau").cast("double") / F.col("mau"), 8).alias("stickiness"),
        )
        .orderBy("day")
    )


@register(
    "q27_yoy_growth",
    oracle=(
        "WITH yearly AS (SELECT n_name, CAST(YEAR(o_orderdate) AS INT) AS yr, "
        f"{exact.dsum_sql('o_totalprice')} AS revenue "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "GROUP BY n_name, YEAR(o_orderdate)) "
        "SELECT n_name, yr, revenue, "
        "LAG(revenue) OVER (PARTITION BY n_name ORDER BY yr) AS prev_revenue, "
        "ROUND((revenue - LAG(revenue) OVER (PARTITION BY n_name ORDER BY yr)) "
        "/ LAG(revenue) OVER (PARTITION BY n_name ORDER BY yr) * 100.0, 8) "
        "AS growth_pct "
        "FROM yearly ORDER BY n_name, yr"
    ),
    tags=("Q27", "W2", "analytics"),
)
def q27_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q27: year-over-year revenue growth per nation — the standard
    period-over-period readout. Plan: one fact scan rolls orders up to
    (nation, year) with broadcast dims (the only fact-sized shuffle is
    the groupBy partial-agg); the LAG window then runs over the tiny
    nation×year rollup, so the WindowExec input is dozens of rows no
    matter how large orders is."""
    from pyspark.sql import Window

    orders = T(spark, sf_dir, "orders")
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = T(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    yearly = (
        # customer is SF-scaled — no broadcast hint (VERDICT r06 #1),
        # and it joins the fact DIRECTLY so the planner sees the
        # accurate base-table size estimate and still picks broadcast
        # at bench SF; nation keeps its hint (fixed-size dim)
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", F.year("o_orderdate").cast("int").alias("yr"))
        .agg(exact.dsum("o_totalprice").alias("revenue"))
    )
    w = Window.partitionBy("n_name").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return yearly.select(
        "n_name", "yr", "revenue",
        prev.alias("prev_revenue"),
        F.round((F.col("revenue") - prev) / prev * F.lit(100.0), 8).alias("growth_pct"),
    ).orderBy("n_name", "yr")


@register(
    "q28_association_rules",
    oracle=(
        "WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
        "n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_baskets "
        "FROM items), "
        "cnt AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item FROM items "
        "GROUP BY l_partkey), "
        "pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
        "CAST(COUNT(*) AS BIGINT) AS n_ab "
        "FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey GROUP BY 1, 2 HAVING COUNT(*) >= 3) "
        "SELECT part_a, part_b, n_ab, ca.n_item AS n_a, cb.n_item AS n_b, "
        "ROUND(CAST(n_ab AS DOUBLE) / CAST(ca.n_item AS DOUBLE), 8) AS confidence, "
        "ROUND(CAST(n_ab AS DOUBLE) * n_baskets / "
        "(CAST(ca.n_item AS DOUBLE) * CAST(cb.n_item AS DOUBLE)), 8) AS lift "
        "FROM pairs JOIN cnt ca ON part_a = ca.l_partkey "
        "JOIN cnt cb ON part_b = cb.l_partkey CROSS JOIN n "
        "ORDER BY lift DESC, part_a, part_b LIMIT 25"
    ),
    tags=("Q28", "Q23", "analytics"),
)
def q28_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q28: association rules over the basket pairs — support,
    confidence(a→b) and lift for pairs co-bought in ≥ 3 orders (the
    Apriori readout on top of q23's co-occurrence primitive).

    Plan: one distinct (order, part) pass feeds BOTH the item-count
    aggregate and the pair self-join (same basket-bounded fanout as
    q23); per-item counts are a part-cardinality table joined back
    keyed on the part — partial-agg shuffles only. All metrics are
    ratios of integer counts computed with identical IEEE expression
    trees on both engines, ROUND(8)-pinned.

    Registered with prefilter="off": BENCH.md's A/B shows the filter
    prunes nothing here, and "auto" pays its estimate job eagerly at
    DataFrame-construction time (round-5 review) — the knob remains
    for workloads where the guard earns its scan."""
    return association_rules(spark, sf_dir, prefilter="off")


def association_rules(
    spark: SparkSession,
    sf_dir: str,
    min_support: int = 3,
    prefilter: str = "auto",
    frequent_fraction_cutoff: float = 0.8,
) -> DataFrame:
    """Parameterized q28 with the Apriori anti-monotone PRE-FILTER as a
    selectable knob (VERDICT r04 #5): a pair cannot reach min-support
    if either item doesn't, so dropping infrequent items BEFORE the
    basket self-join caps the ΣC(basket,2) pair shuffle — the 100 TB
    shape for long-tail catalogs.

    ``prefilter``:
      - ``"on"``   — always semi-join items against the frequent set;
      - ``"off"``  — the plain self-join (this fixture's fastest plan:
        the measured A/B found the filter prunes nothing at
        min_support=3 on TPC-H-ish baskets and costs ~2× — BENCH.md);
      - ``"auto"`` — apply the measured applicability guard: one tiny
        scalar aggregate estimates the frequent-item fraction and the
        filter is SKIPPED when ≈ all items are frequent
        (fraction ≥ ``frequent_fraction_cutoff``), since then it prunes
        nothing and only adds a join. NOTE: the estimate is a Spark
        job executed EAGERLY when this function is called (the price
        of a driver-side plan decision) — at scale it is one
        partial-agg scan, cheap next to a wasted unpruned pair join,
        but callers constructing plans lazily should pick on/off.

    Either path returns identical rows (the Apriori property), pinned
    by tests/test_scale_patterns.py's on-vs-off A/B."""
    items = (
        T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    )
    cnt = items.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_item"))
    # basket universe and per-item counts are metrics of the FULL data —
    # computed before any pruning (a basket of only-infrequent items
    # still counts toward n_baskets, or lift would change under the knob)
    n_baskets = items.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n_baskets")
    )
    if prefilter == "auto":
        # two-phase scalar (sanctioned .collect-tiny pattern): the
        # estimate costs one extra partial-agg scan, trivial next to a
        # wasted unpruned pair join at scale
        frac = cnt.agg(
            F.avg((F.col("n_item") >= min_support).cast("double"))
        ).first()[0]
        use_prefilter = frac is not None and frac < frequent_fraction_cutoff
    else:
        use_prefilter = prefilter == "on"
    if use_prefilter:
        frequent = cnt.where(F.col("n_item") >= min_support).select("l_partkey")
        items = items.join(frequent, "l_partkey", "left_semi")
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "ok")
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= min_support)
    )
    ca = cnt.select(F.col("l_partkey").alias("part_a"), F.col("n_item").alias("n_a"))
    cb = cnt.select(F.col("l_partkey").alias("part_b"), F.col("n_item").alias("n_b"))
    dn_ab = F.col("n_ab").cast("double")
    dn_a, dn_b = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    return (
        pairs.join(ca, "part_a")
        .join(cb, "part_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "part_a", "part_b", "n_ab", "n_a", "n_b",
            F.round(dn_ab / dn_a, 8).alias("confidence"),
            F.round(dn_ab * F.col("n_baskets") / (dn_a * dn_b), 8).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(25)
    )


@register(
    "q28b_apriori_prefilter",
    oracle=(
        "WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
        "n AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_baskets "
        "FROM items), "
        "cnt AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_item FROM items "
        "GROUP BY l_partkey), "
        # the Apriori anti-monotone pre-filter, written into the twin's
        # algebra so the oracle certifies the PRUNED pipeline, not just
        # its (provably equal) unpruned cousin
        "freq AS (SELECT l_partkey FROM cnt WHERE n_item >= 3), "
        "fitems AS (SELECT i.l_orderkey, i.l_partkey FROM items i "
        "WHERE i.l_partkey IN (SELECT l_partkey FROM freq)), "
        "pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, "
        "CAST(COUNT(*) AS BIGINT) AS n_ab "
        "FROM fitems a JOIN fitems b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey GROUP BY 1, 2 HAVING COUNT(*) >= 3) "
        "SELECT part_a, part_b, n_ab, ca.n_item AS n_a, cb.n_item AS n_b, "
        "ROUND(CAST(n_ab AS DOUBLE) / CAST(ca.n_item AS DOUBLE), 8) AS confidence, "
        "ROUND(CAST(n_ab AS DOUBLE) * n_baskets / "
        "(CAST(ca.n_item AS DOUBLE) * CAST(cb.n_item AS DOUBLE)), 8) AS lift "
        "FROM pairs JOIN cnt ca ON part_a = ca.l_partkey "
        "JOIN cnt cb ON part_b = cb.l_partkey CROSS JOIN n "
        "ORDER BY lift DESC, part_a, part_b LIMIT 25"
    ),
    tags=("Q28", "analytics", "scale"),
)
def q28b_apriori_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q28b: the 100 TB-shape association-rules plan — the Apriori
    anti-monotone PRE-FILTER applied unconditionally (prefilter="on"),
    registered as its own oracle-checked query so the pruned pipeline
    carries a driver value-hash proof, not just the on-vs-off pytest
    A/B. The oracle twin spells the semi-join out in SQL (freq/fitems
    CTEs) — both engines run the PRUNED algebra and must agree.

    On this fixture the filter prunes nothing (every part reaches
    min_support=3 — BENCH.md A/B), so q28 stays registered with
    prefilter="off" as the local-optimal plan; THIS entry certifies
    the long-tail-catalog shape where the semi-join caps the
    ΣC(basket,2) pair shuffle."""
    return association_rules(spark, sf_dir, prefilter="on")


_ER2_ORACLE = (
    # truth = the er1 match rule WITHOUT the blocking key: same nation,
    # edit distance <= 2, over all subset pairs (a < b)
    "WITH sub AS (SELECT c_custkey, c_name, c_nationkey FROM customer "
    "WHERE c_custkey % 50 = 0), "
    "allp AS (SELECT a.c_custkey AS ka, b.c_custkey AS kb, "
    "LENGTH(a.c_name) = LENGTH(b.c_name) AS blocked, "
    "(a.c_nationkey = b.c_nationkey AND "
    "LEVENSHTEIN(a.c_name, b.c_name) <= 2) AS is_match "
    "FROM sub a JOIN sub b ON a.c_custkey < b.c_custkey), "
    "m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_all_pairs, "
    "CAST(COUNT_IF(blocked) AS BIGINT) AS n_candidates, "
    "CAST(COUNT_IF(is_match) AS BIGINT) AS n_true_matches, "
    "CAST(COUNT_IF(is_match AND blocked) AS BIGINT) AS n_found FROM allp) "
    "SELECT n_all_pairs, n_candidates, n_true_matches, n_found, "
    "CASE WHEN n_all_pairs > 0 THEN "
    "ROUND(1.0 - CAST(n_candidates AS DOUBLE) / CAST(n_all_pairs AS DOUBLE), 8) "
    "END AS reduction_ratio, "
    "CASE WHEN n_true_matches > 0 THEN "
    "ROUND(CAST(n_found AS DOUBLE) / CAST(n_true_matches AS DOUBLE), 8) "
    "END AS pairs_completeness FROM m"
)


@register(
    "er2_blocking_metrics",
    oracle=_ER2_ORACLE,
    tags=("ER1", "L2", "fuzzy", "quality"),
)
def er2_blocking_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ER2: blocking-quality audit for the er1 entity-resolution
    pipeline — the two standard record-linkage metrics: REDUCTION
    RATIO (fraction of the all-pairs comparison space the blocking key
    eliminates) and PAIRS COMPLETENESS (recall: fraction of true
    matches the blocking retains). Truth = the er1 match rule (same
    nation AND edit distance ≤ 2) evaluated WITHOUT the block;
    candidates = the name-length block er1/l2e actually use.

    Plan: ONE subset self-join (a < b) computes blocked/is_match flags
    per pair, one global conditional-count agg — no second pass. The
    all-pairs join is quadratic in the SUBSET (the %50 sample), which
    is the point: at 100 TB you measure blocking quality on a sample
    where ground truth is computable, then apply the measured block to
    the full corpus; the sample knob is the subset predicate."""
    sub = (
        T(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 50 == 0)
        .select("c_custkey", "c_name", "c_nationkey")
    )
    a = sub.select(
        F.col("c_custkey").alias("ka"), F.col("c_name").alias("name_a"),
        F.col("c_nationkey").alias("nat_a"),
    )
    b = sub.select(
        F.col("c_custkey").alias("kb"), F.col("c_name").alias("name_b"),
        F.col("c_nationkey").alias("nat_b"),
    )
    flagged = a.join(b, F.col("ka") < F.col("kb")).select(
        (F.length("name_a") == F.length("name_b")).alias("blocked"),
        (
            (F.col("nat_a") == F.col("nat_b"))
            & (F.levenshtein("name_a", "name_b") <= 2)
        ).alias("is_match"),
    )
    m = flagged.agg(
        F.count(F.lit(1)).alias("n_all_pairs"),
        F.sum(F.col("blocked").cast("long")).alias("n_candidates"),
        F.sum(F.col("is_match").cast("long")).alias("n_true_matches"),
        F.sum((F.col("is_match") & F.col("blocked")).cast("long")).alias("n_found"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    # NULL (not an error, not a fake 0) when a denominator is empty —
    # a tiny audit sample with no true matches has UNDEFINED recall
    return m.select(
        "n_all_pairs", "n_candidates", "n_true_matches", "n_found",
        F.when(
            F.col("n_all_pairs") > 0,
            F.round(F.lit(1.0) - d("n_candidates") / d("n_all_pairs"), 8),
        ).alias("reduction_ratio"),
        F.when(
            F.col("n_true_matches") > 0,
            F.round(d("n_found") / d("n_true_matches"), 8),
        ).alias("pairs_completeness"),
    )


@register(
    "q29_session_conversion",
    oracle=(
        "WITH seq AS (SELECT user_id, ts, event_id, event_type, "
        "CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "IS NULL OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "> INTERVAL 4 HOUR THEN 1 ELSE 0 END AS new_sess FROM events), "
        "sess AS (SELECT user_id, event_type, "
        "SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS UNBOUNDED PRECEDING) AS sess_id FROM seq), "
        "per_sess AS (SELECT user_id, sess_id, "
        "CAST(COUNT(*) AS BIGINT) AS n_events, "
        "CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT) "
        "AS converted FROM sess GROUP BY user_id, sess_id) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions, "
        "CAST(SUM(converted) AS BIGINT) AS n_converted, "
        "ROUND(CAST(SUM(converted) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 8) "
        "AS conversion_rate, "
        "ROUND(CAST(SUM(n_events) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 8) "
        "AS avg_session_events "
        "FROM per_sess"
    ),
    tags=("Q29", "ST3", "analytics"),
)
def q29_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q29: per-session conversion — sessionize each user's events with
    the lag+cumsum 4-hour-gap rule (the st3 machinery), then one
    converted-flag rollup per session and a global readout. All
    windows are user-keyed; the session table collapses before the
    global aggregate, so the funnel-to-session-grain join the naive
    form needs never exists."""
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ROWS frame ordered by (ts, event_id): with only ts the tie-break
    # between duplicate timestamps is engine-dependent and the session
    # assignment (hence the hash) can flake — the frame must be total
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    lag_ts = F.lag("ts").over(w)
    new_sess = F.when(
        lag_ts.isNull()
        | (F.unix_micros("ts") - F.unix_micros(lag_ts) > 4 * 3600 * 1_000_000),
        1,
    ).otherwise(0)
    sess = ev.select(
        "user_id", "event_type",
        F.sum(new_sess).over(w_run).alias("sess_id"),
    )
    per_sess = sess.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).cast("int").alias("converted"),
    )
    n = F.count(F.lit(1)).cast("long")
    conv = F.sum("converted").cast("long")
    return per_sess.agg(
        n.alias("n_sessions"),
        conv.alias("n_converted"),
        F.round(conv.cast("double") / n.cast("double"), 8).alias("conversion_rate"),
        F.round(
            F.sum("n_events").cast("double") / n.cast("double"), 8
        ).alias("avg_session_events"),
    )


@register(
    "q31_trending_parts",
    oracle=(
        "WITH wk AS (SELECT l_partkey, "
        "CAST(date_trunc('week', o_orderdate) AS TIMESTAMP) AS week, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "GROUP BY l_partkey, date_trunc('week', o_orderdate)), "
        "lagged AS (SELECT l_partkey, week, n, "
        "LAG(n) OVER (PARTITION BY l_partkey ORDER BY week) AS prev_n, "
        "LAG(week) OVER (PARTITION BY l_partkey ORDER BY week) AS prev_week "
        "FROM wk), "
        "latest AS (SELECT MAX(week) AS max_week FROM wk) "
        "SELECT l_partkey, n AS n_current, "
        "CASE WHEN prev_week = max_week - INTERVAL 7 DAY THEN prev_n "
        "ELSE NULL END AS n_previous, "
        "ROUND(CAST(n + 1 AS DOUBLE) / CAST((CASE WHEN prev_week = "
        "max_week - INTERVAL 7 DAY THEN prev_n ELSE NULL END) + 1 AS DOUBLE), 8) "
        "AS growth "
        "FROM lagged CROSS JOIN latest WHERE week = max_week "
        "AND prev_week = max_week - INTERVAL 7 DAY "
        "ORDER BY growth DESC, l_partkey LIMIT 20"
    ),
    tags=("Q31", "W2", "analytics"),
)
def q31_trending_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q31: trending items — week-over-week demand risers: weekly part
    counts, LAG against the part's previous ACTIVE week (only counted
    as "previous" if it is literally last week — a part dormant for a
    month is not a riser), Laplace-smoothed growth, top 20 in the
    latest week. (Round 5: the original "support ≥ 3" gate was
    vacuous on this fixture — a part sells ~once per week at every
    SF, so the query was 0 rows and its driver green row pinned
    nothing; the adjacency requirement alone is the discriminating
    condition here, and a min-support knob belongs to denser-basket
    data.)

    Plan: the fact join rolls up to (part, week) first — the LAG
    window runs over that rollup, bounded by parts × weeks, never raw
    lineitem; the latest-week scalar rides a broadcast. The trending
    feed a marketplace recomputes hourly at 100 TB with exactly this
    shape (rollup → keyed lag → top-k)."""
    return _trending_from_weekly(weekly_counts_direct(spark, sf_dir))


def weekly_counts_direct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part, week, n) rollup over a plain shuffled lineitem⋈orders."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    orders = T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            "l_partkey",
            F.date_trunc("week", "o_orderdate").alias("week"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _trending_from_weekly(wk: DataFrame) -> DataFrame:
    """Shared q31 tail: keyed LAG over the (part, week) rollup, then
    latest-week risers top-20 (bounded by parts × weeks, never raw
    lineitem)."""
    from pyspark.sql import Window

    w = Window.partitionBy("l_partkey").orderBy("week")
    lagged = wk.select(
        "l_partkey", "week", "n",
        F.lag("n").over(w).alias("prev_n"),
        F.lag("week").over(w).alias("prev_week"),
    )
    latest = wk.agg(F.max("week").alias("max_week"))
    adjacent = F.col("prev_week") == F.col("max_week") - F.expr("INTERVAL 7 DAY")
    n_prev = F.when(adjacent, F.col("prev_n"))
    return (
        lagged.crossJoin(F.broadcast(latest))
        .where((F.col("week") == F.col("max_week")) & adjacent)
        .select(
            "l_partkey",
            F.col("n").alias("n_current"),
            n_prev.alias("n_previous"),
            F.round(
                (F.col("n") + 1).cast("double") / (n_prev + 1).cast("double"), 8
            ).alias("growth"),
        )
        .orderBy(F.desc("growth"), "l_partkey")
        .limit(20)
    )


_Q31_ORACLE = QUERIES["q31_trending_parts"]["oracle"]


@register(
    "q31b_trending_parts_bucketed",
    oracle=_Q31_ORACLE,
    tags=("Q31", "W2", "analytics", "scale-pattern"),
)
def q31b_trending_parts_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q31b: same trending-parts semantics as q31, with the fact⋈fact
    join served from tables BUCKETED on the order key — the recorded
    scale remedy for q31's 9.2×-at-10×-data lineitem⋈orders shuffle
    (VERDICT r04 #3). Both facts are written ``bucketBy(orderkey)``
    + sorted within buckets, so the sort-merge join reads co-located
    buckets with ZERO Exchange (and zero Sort) below it; the plan is
    asserted in-query, so a regression to shuffle-everything fails
    loudly rather than silently costing the two biggest shuffles in
    the pipeline. At 100 TB both facts are written bucketed ONCE and
    every recurring orderkey join (hourly trending recompute, q3/q9
    shapes) amortizes the layout; the bucket count scales with data
    (8 here, thousands there).

    The oracle is IDENTICAL to q31's — value-hash equality across the
    two physical strategies is exactly the point;
    tests/test_scale_patterns.py additionally pins the FULL weekly
    rollup equal between the two join strategies (stronger than the
    top-20 readout)."""
    return _trending_from_weekly(weekly_counts_bucketed(spark, sf_dir))


def weekly_counts_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part, week, n) rollup over lineitem⋈orders served from
    orderkey-bucketed tables, plan-asserted shuffle-free below the
    join."""
    from ipydataclean_spark.operators.qhelp import scratch_dir
    from ipydataclean_spark.plans import plan_tree

    root = scratch_dir(spark, "q31b")
    li_tbl = f"q31b_li_{spark.sparkContext.applicationId.replace('-', '_')}"
    ord_tbl = f"q31b_ord_{spark.sparkContext.applicationId.replace('-', '_')}"
    spark.sql(f"DROP TABLE IF EXISTS {li_tbl}")
    spark.sql(f"DROP TABLE IF EXISTS {ord_tbl}")
    (
        T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", f"{root}/li").mode("overwrite").saveAsTable(li_tbl)
    )
    (
        T(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", f"{root}/ord").mode("overwrite").saveAsTable(ord_tbl)
    )
    li = spark.table(li_tbl)
    orders = spark.table(ord_tbl)
    # hint("merge") forces SMJ without touching session conf (at sf0.01
    # orders would otherwise broadcast, bypassing the bucketed layout
    # this query exists to demonstrate)
    joined = li.join(
        orders.hint("merge"), li.l_orderkey == orders.o_orderkey
    )
    wk = joined.groupBy(
        "l_partkey",
        F.date_trunc("week", "o_orderdate").alias("week"),
    ).agg(F.count(F.lit(1)).alias("n"))
    # explicit raises (not bare assert — stripped under python -O) so
    # the shuffle-free guarantee fails loudly on regression, matching
    # the tx2/tx4 in-query gate idiom (ADVICE r05)
    tree = plan_tree(wk)
    join_idx = [i for i, line in enumerate(tree) if "SortMergeJoin" in line]
    if not join_idx:
        raise AssertionError(
            "q31b: expected a SortMergeJoin over bucketed facts:\n" + "\n".join(tree)
        )
    below = tree[join_idx[0] + 1 :]
    if any("Exchange" in line for line in below):
        raise AssertionError(
            "q31b: bucketed join must have no Exchange below it:\n" + "\n".join(tree)
        )
    return wk


@register(
    "q32_event_transitions",
    oracle=(
        "WITH seq AS (SELECT user_id, event_type, "
        "LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "AS next_type FROM events), "
        "pairs AS (SELECT event_type AS from_type, next_type AS to_type, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM seq WHERE next_type IS NOT NULL "
        "GROUP BY event_type, next_type) "
        "SELECT from_type, to_type, n, "
        "ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER (PARTITION BY from_type) "
        "AS DOUBLE), 8) AS p "
        "FROM pairs ORDER BY from_type, to_type"
    ),
    tags=("Q32", "W2", "analytics"),
)
def q32_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q32: event-transition matrix (the user-flow / Markov-chain
    readout behind every sankey diagram): consecutive event-type pairs
    per user via one user-keyed LEAD, pair counts, and row-normalized
    transition probabilities. The probability window runs over the
    |event_types|² pair table — bounded regardless of event volume."""
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    pairs = (
        seq.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_from = Window.partitionBy("from_type")
    return pairs.select(
        "from_type", "to_type", "n",
        F.round(
            F.col("n").cast("double") / F.sum("n").over(w_from).cast("double"), 8
        ).alias("p"),
    ).orderBy("from_type", "to_type")


@register(
    "q33_cohort_ltv",
    oracle=(
        "WITH first_order AS (SELECT o_custkey, "
        "CAST(date_trunc('month', MIN(o_orderdate)) AS TIMESTAMP) AS cohort "
        "FROM orders GROUP BY o_custkey), "
        "rev AS (SELECT f.cohort, "
        "CAST((YEAR(o.o_orderdate) - YEAR(f.cohort)) * 12 "
        "+ (MONTH(o.o_orderdate) - MONTH(f.cohort)) AS INT) AS month_idx, "
        "o.o_totalprice FROM orders o JOIN first_order f "
        "ON o.o_custkey = f.o_custkey), "
        "cells AS (SELECT cohort, month_idx, "
        f"{exact.dsum_sql('o_totalprice')} AS month_rev "
        "FROM rev WHERE month_idx <= 11 GROUP BY cohort, month_idx) "
        "SELECT cohort, month_idx, month_rev, "
        "CAST(SUM(CAST(month_rev AS DECIMAL(28,6))) OVER "
        "(PARTITION BY cohort ORDER BY month_idx) AS DOUBLE) AS cum_ltv "
        "FROM cells WHERE cohort <= TIMESTAMP '1995-12-01' "
        "ORDER BY cohort, month_idx"
    ),
    tags=("Q33", "analytics", "W3"),
)
def q33_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q33: cohort lifetime-value matrix — customers grouped by
    first-order month, revenue accumulated per months-since-first
    (the LTV curve every subscription/retail team tracks; the cohort
    twin of q_cohort_retention's counts). Plan: first-order table is
    one customer-keyed partial agg joined back (no window over the
    fact); the cumulative LTV window runs over the cohort×month CELL
    table (≤ cohorts × 12 rows). Decimal sums keep both the cell
    revenue and the running cumulation exact."""
    from pyspark.sql import Window

    orders = T(spark, sf_dir, "orders")
    first = (
        orders.groupBy("o_custkey")
        .agg(F.date_trunc("month", F.min("o_orderdate")).alias("cohort"))
    )
    month_idx = (
        (F.year("o_orderdate") - F.year("cohort")) * 12
        + (F.month("o_orderdate") - F.month("cohort"))
    ).cast("int")
    cells = (
        orders.join(first, "o_custkey")
        .select("cohort", month_idx.alias("month_idx"), "o_totalprice")
        .where(F.col("month_idx") <= 11)
        .groupBy("cohort", "month_idx")
        .agg(exact.dsum("o_totalprice").alias("month_rev"))
    )
    w = Window.partitionBy("cohort").orderBy("month_idx")
    return (
        cells.where(F.col("cohort") <= F.lit("1995-12-01").cast("timestamp"))
        .select(
            "cohort", "month_idx", "month_rev",
            F.sum(F.col("month_rev").cast("decimal(28,6)"))
            .over(w).cast("double").alias("cum_ltv"),
        )
        .orderBy("cohort", "month_idx")
    )


@register(
    "q_revenue_deciles",
    oracle=(
        "WITH rev AS (SELECT o_custkey, "
        + exact.dsum_sql("o_totalprice")
        + " AS m FROM orders GROUP BY o_custkey), "
        "tiled AS (SELECT m, NTILE(10) OVER (ORDER BY m DESC, o_custkey) AS decile "
        "FROM rev) "
        "SELECT CAST(decile AS INT) AS decile, "
        "CAST(COUNT(*) AS BIGINT) AS n_customers, "
        "ROUND(" + exact.dsum_sql("m") + ", 2) AS revenue, "
        "ROUND(MIN(m), 2) AS floor_revenue "
        "FROM tiled GROUP BY decile ORDER BY decile"
    ),
    tags=("analytics", "W1"),
)
def q_revenue_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue decile report — customers NTILE(10)-ranked by exact
    decimal spend, with each decile's population, revenue mass, and
    entry threshold (the concentration table a curation pipeline uses
    to set per-tier budgets). The NTILE comes from the distributed
    ranking pattern (functions/ranking.py — range repartition +
    parallel per-partition rank + P-row offsets), bit-identical to
    the engine NTILE at any table size, no single-partition sort."""
    from ipydataclean_spark.functions.ranking import with_global_ntile

    rev = (
        T(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(exact.dsum("o_totalprice").alias("m"))
    )
    tiled = with_global_ntile(rev, [F.desc("m"), F.asc("o_custkey")], 10, "decile")
    return (
        tiled.groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(exact.dsum("m"), 2).alias("revenue"),
            F.round(F.min("m"), 2).alias("floor_revenue"),
        )
        .orderBy("decile")
    )


@register(
    "q34_rolling_corr",
    oracle=(
        "WITH daily AS (SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) "
        "AS day, CAST(COUNT(*) AS DECIMAL(18,2)) AS x, "
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DECIMAL(18,2)) AS y "
        "FROM orders GROUP BY 1), "
        "s AS (SELECT day, "
        "COUNT(*) OVER w AS n, "
        "SUM(x) OVER w AS sx, SUM(y) OVER w AS sy, "
        "SUM(CAST(x * y AS DECIMAL(38,4))) OVER w AS sxy, "
        "SUM(CAST(x * x AS DECIMAL(38,4))) OVER w AS sxx, "
        "SUM(CAST(y * y AS DECIMAL(38,4))) OVER w AS syy "
        "FROM daily WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND "
        "CURRENT ROW)) "
        "SELECT day, ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / "
        "SQRT((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) "
        "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) "
        "* (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) "
        "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 8) AS corr_7d "
        "FROM s WHERE n = 7 ORDER BY day"
    ),
    tags=("analytics", "W3", "Q34"),
)
def q34_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q34: 7-day trailing Pearson correlation between daily order
    count and daily revenue — the co-movement monitor that separates
    "volume is driving revenue" days from price-mix shifts (corr
    dropping while both series rise is the classic mix-change
    signal).

    Exactness: the five power sums accumulate in DECIMAL from
    2-dp-quantized daily inputs, so every engine sees IDENTICAL sums;
    the final correlation is one deterministic double expression
    (multiply/divide/sqrt of identical inputs — sqrt is correctly
    rounded per IEEE), rounded to 8 dp. Scale shape: the fact table
    collapses to the day-grain rollup first; the trailing windows run
    over one row per calendar day (bounded by time, not data
    volume)."""
    from pyspark.sql import Window

    daily = (
        T(spark, sf_dir, "orders")
        .groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(
            F.count(F.lit(1)).cast("decimal(18,2)").alias("x"),
            F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
            .cast("decimal(18,2)")
            .alias("y"),
        )
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    s = daily.select(
        "day",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("sx"),
        F.sum("y").over(w).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast("decimal(38,4)")).over(w).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,4)")).over(w).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast("decimal(38,4)")).over(w).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx, syy = (
        F.col("sxy").cast("double"),
        F.col("sxx").cast("double"),
        F.col("syy").cast("double"),
    )
    corr = (n * sxy - sx * sy) / F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return (
        s.where(F.col("n") == 7)
        .select("day", F.round(corr, 8).alias("corr_7d"))
        .orderBy("day")
    )
