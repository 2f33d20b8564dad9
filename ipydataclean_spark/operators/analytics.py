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
from ipydataclean_spark.registry import register


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
    plan shape; an unblocked version is a pure cross join)."""
    sub = (
        T(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 50 == 0)
        .select("c_custkey", "c_name", F.length("c_name").alias("name_len"))
    )
    a = sub.select(
        F.col("c_custkey").alias("key_a"), F.col("c_name").alias("name_a"), F.col("name_len")
    )
    b = sub.select(
        F.col("c_custkey").alias("key_b"), F.col("c_name").alias("name_b"),
        F.col("name_len").alias("len_b"),
    )
    return (
        a.join(b, (F.col("name_len") == F.col("len_b")) & (F.col("key_a") < F.col("key_b")))
        .where(F.levenshtein("name_a", "name_b") <= 2)
        .select("key_a", "key_b", F.levenshtein("name_a", "name_b").alias("edit_dist"))
        .orderBy("key_a", "key_b")
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
