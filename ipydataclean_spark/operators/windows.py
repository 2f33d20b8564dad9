"""Window functions — SURVEY.md §2.6 (W1-W4).

All windows partition by a natural key (user_id / mktsegment) so the
shuffle is one exchange on the partition key and no single-partition
funnel exists at scale. Window float sums go through DECIMAL: engines
are free to aggregate frames in any order (segment trees vs running
sums), so only an associative exact type guarantees stable results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipydataclean_spark.functions.exact import DEC, DEC_SQL
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register


@register(
    "w1_ranking",
    oracle=(
        "SELECT c_custkey, c_mktsegment, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rn, "
        "CAST(RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS INTEGER) AS rnk, "
        "CAST(DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS INTEGER) AS drnk, "
        "CAST(NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS quartile, "
        "PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS prk, "
        "CUME_DIST() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS cd "
        "FROM customer ORDER BY c_custkey"
    ),
    tags=("W1",),
)
def w1_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: full ranking family over a keyed window."""
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    wv = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"))
    return (
        T(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.row_number().over(w).alias("rn"),
            F.rank().over(wv).alias("rnk"),
            F.dense_rank().over(wv).alias("drnk"),
            F.ntile(4).over(w).alias("quartile"),
            F.percent_rank().over(wv).alias("prk"),
            F.cume_dist().over(wv).alias("cd"),
        )
        .orderBy("c_custkey")
    )


@register(
    "w2_analytic",
    oracle=(
        "SELECT event_id, user_id, "
        "LAG(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS prev_value, "
        "LEAD(value, 1) OVER (PARTITION BY user_id ORDER BY ts) AS next_value, "
        "FIRST_VALUE(value) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_val, "
        "NTH_VALUE(value, 2) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS second_val "
        "FROM events ORDER BY event_id"
    ),
    tags=("W2",),
)
def w2_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: lag/lead/first/nth analytic functions per user."""
    wo = Window.partitionBy("user_id").orderBy("ts")
    wf = wo.rowsBetween(Window.unboundedPreceding, 0)
    return (
        T(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.lag("value", 1).over(wo).alias("prev_value"),
            F.lead("value", 1).over(wo).alias("next_value"),
            F.first("value").over(wf).alias("first_val"),
            F.nth_value("value", 2).over(wf).alias("second_val"),
        )
        .orderBy("event_id")
    )


@register(
    "w3_frames",
    oracle=(
        "SELECT event_id, "
        f"CAST(SUM(CAST(value AS {DEC_SQL})) OVER "
        "(PARTITION BY user_id ORDER BY ts ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum4, "
        "COUNT(*) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS frame_n, "
        f"CAST(SUM(CAST(value AS {DEC_SQL})) OVER "
        "(PARTITION BY user_id ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT) RANGE BETWEEN 600 PRECEDING AND CURRENT ROW) AS DOUBLE) AS range_sum_10min "
        "FROM events ORDER BY event_id"
    ),
    tags=("W3",),
)
def w3_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3: rows frames + time-range frame (rangeBetween over epoch secs)."""
    ev = T(spark, sf_dir, "events").withColumn("epoch_s", F.unix_timestamp("ts"))
    w_rows = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-3, 0)
    w_range = Window.partitionBy("user_id").orderBy("epoch_s").rangeBetween(-600, 0)
    return (
        ev.select(
            "event_id",
            F.sum(F.col("value").cast(DEC)).over(w_rows).cast("double").alias("moving_sum4"),
            F.count(F.lit(1)).over(w_rows).alias("frame_n"),
            F.sum(F.col("value").cast(DEC)).over(w_range).cast("double").alias("range_sum_10min"),
        )
        .orderBy("event_id")
    )


@register(
    "w4_moving_avg",
    oracle=(
        "SELECT event_id, "
        f"(CAST(SUM(CAST(value AS {DEC_SQL})) OVER w AS DOUBLE) / COUNT(value) OVER w) AS moving_avg8, "
        "MIN(value) OVER w AS moving_min8, MAX(value) OVER w AS moving_max8 "
        "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) "
        "ORDER BY event_id"
    ),
    tags=("W4",),
)
def w4_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4: rolling stats (exact moving average = decimal sum / count)."""
    w = Window.partitionBy("user_id").orderBy("ts").rowsBetween(-7, 0)
    return (
        T(spark, sf_dir, "events")
        .select(
            "event_id",
            (F.sum(F.col("value").cast(DEC)).over(w).cast("double") / F.count("value").over(w)).alias("moving_avg8"),
            F.min("value").over(w).alias("moving_min8"),
            F.max("value").over(w).alias("moving_max8"),
        )
        .orderBy("event_id")
    )


@register(
    "w5_rolling_median",
    oracle=(
        "SELECT event_id, user_id, "
        "quantile_cont(value, 0.5) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS med10 "
        "FROM events ORDER BY event_id"
    ),
    tags=("W5", "W4", "P5"),
)
def w5_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: rolling median over the trailing 10 events per user — the
    robust denoiser a rolling mean can't be (one spike shifts a mean,
    not a median). Keyed frames only; both engines interpolate
    identically, so it hash-checks. Frame state is 10 values/row —
    O(frame) not O(partition) memory at scale."""
    from ipydataclean_spark.operators.qhelp import T

    ev = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.percentile("value", F.lit(0.5)).over(w).alias("med10"),
    ).orderBy("event_id")


@register(
    "w7_distribution_ranks",
    oracle=(
        "SELECT o_orderkey, o_orderpriority, "
        "CAST(NTILE(4) OVER w AS BIGINT) AS price_quartile, "
        "ROUND(CUME_DIST() OVER w, 8) AS cume, "
        "ROUND(PERCENT_RANK() OVER w, 8) AS pct_rank "
        "FROM orders "
        "WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey) "
        "ORDER BY o_orderkey"
    ),
    tags=("W7", "W1"),
)
def w7_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7: distribution-position window family — ntile quartiles,
    cumulative distribution, percent rank, all per priority class over
    one keyed sort (ONE window spec → one shuffle+sort serves all
    three functions; Spark collapses same-spec windows into a single
    WindowExec). Keyed partitions bound sort memory at scale; ranks
    are tie-broken on the key for cross-engine determinism. The
    divisions are single IEEE ops, rounded to 8 dp (module
    convention for libm-free but division-bearing outputs)."""
    from ipydataclean_spark.operators.qhelp import T

    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("price_quartile"),
        F.round(F.cume_dist().over(w), 8).alias("cume"),
        F.round(F.percent_rank().over(w), 8).alias("pct_rank"),
    ).orderBy("o_orderkey")


@register(
    "w8_cumulative_distinct",
    oracle=(
        "WITH flagged AS (SELECT user_id, ts, event_id, event_type, "
        "CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type "
        "ORDER BY ts, event_id) = 1 THEN 1 ELSE 0 END AS first_seen "
        "FROM events), "
        "r AS (SELECT user_id, ts, event_id, "
        "CAST(SUM(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) "
        "AS distinct_types_so_far FROM flagged) "
        "SELECT user_id, event_id, distinct_types_so_far FROM r "
        "WHERE user_id % 25 = 0 ORDER BY user_id, event_id"
    ),
    tags=("W8", "W2", "analytics"),
)
def w8_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8: running DISTINCT count over an event stream — distinct
    event types each user has seen up to each event (the
    breadth-of-engagement feature; also the standard workaround shape,
    since neither Spark nor DuckDB supports COUNT(DISTINCT) OVER).

    Method: flag each (user, type)'s FIRST occurrence with one
    row_number window, then a running sum of the flags — two
    WindowExecs, both partitioned on user_id (single exchange reused;
    no single-partition funnel). The same trick handles any
    accumulate-distinct-over-time ask at 100 TB because both windows
    key on the entity."""
    ev = T(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn(
            "first_seen",
            F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
        )
        .withColumn(
            "distinct_types_so_far",
            F.sum("first_seen").over(w_run).cast("long"),
        )
        .where(F.col("user_id") % 25 == 0)
        .select("user_id", "event_id", "distinct_types_so_far")
        .orderBy("user_id", "event_id")
    )


@register(
    "w9_value_streaks",
    oracle=(
        "WITH flagged AS (SELECT user_id, ts, event_id, "
        "CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS hot FROM events "
        "WHERE value IS NOT NULL), "
        "grp AS (SELECT user_id, hot, "
        "ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) "
        "- ROW_NUMBER() OVER (PARTITION BY user_id, hot ORDER BY ts, event_id) "
        "AS island FROM flagged), "
        "streaks AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS len "
        "FROM grp WHERE hot = 1 GROUP BY user_id, island) "
        "SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_streaks, "
        "MAX(len) AS max_streak "
        "FROM streaks GROUP BY user_id HAVING MAX(len) >= 3 "
        "ORDER BY max_streak DESC, user_id LIMIT 100"
    ),
    tags=("W9", "W2", "gaps-islands"),
)
def w9_value_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9: gap-and-islands — per user, maximal runs of CONSECUTIVE
    events (event-time order) with value ≥ 50, via the classic
    row_number-difference trick: rn_over_all − rn_over_condition is
    constant exactly within an unbroken run. Output: users with a
    streak ≥ 3, their streak count and longest streak.

    Scale shape: both row_numbers share the user_id partitioning (one
    exchange, two sorts over the same keyed partitions — Spark fuses
    them into a single WindowExec group where orderings align); the
    island rollup and per-user rollup are map-side-combinable aggs on
    the same key. No global window anywhere.
    """
    ev = T(spark, sf_dir, "events").where(F.col("value").isNotNull())
    flagged = ev.select(
        "user_id", "ts", "event_id",
        F.when(F.col("value") >= 50.0, 1).otherwise(0).alias("hot"),
    )
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_hot = Window.partitionBy("user_id", "hot").orderBy("ts", "event_id")
    grp = flagged.select(
        "user_id", "hot",
        (F.row_number().over(w_all) - F.row_number().over(w_hot)).alias("island"),
    )
    streaks = (
        grp.where(F.col("hot") == 1)
        .groupBy("user_id", "island")
        .agg(F.count(F.lit(1)).alias("len"))
    )
    return (
        streaks.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_streaks"),
            F.max("len").alias("max_streak"),
        )
        .where(F.col("max_streak") >= 3)
        .orderBy(F.desc("max_streak"), "user_id")
        .limit(100)
    )


@register(
    "w10_last_touch_attribution",
    oracle=(
        "WITH seq AS (SELECT user_id, ts, event_id, event_type, "
        "LAST_VALUE(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_id, "
        "LAST_VALUE(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS) "
        "OVER (PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_ts "
        "FROM events) "
        "SELECT user_id, event_id AS purchase_id, click_id AS attributed_click, "
        "CAST(FLOOR((FLOOR(EPOCH(ts)) - FLOOR(EPOCH(click_ts))) / 60) AS BIGINT) AS minutes_since_click "
        "FROM seq WHERE event_type = 'purchase' AND click_id IS NOT NULL "
        "ORDER BY user_id, purchase_id LIMIT 500"
    ),
    tags=("W10", "W2", "analytics"),
)
def w10_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10: last-touch attribution — each purchase attributed to the
    user's most recent PRIOR click via last(..., ignorenulls=True)
    over a running user-keyed frame (the conditional carry-forward
    pattern; strictly-before frame excludes self-attribution). One
    user-keyed exchange + sort, no self-join — the naive form is an
    interval self-join like r10, quadratic per hot user; this is
    linear in events per user."""
    ev = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.last(
        F.when(F.col("event_type") == "click", F.col("event_id")), ignorenulls=True
    ).over(w)
    click_ts = F.last(
        F.when(F.col("event_type") == "click", F.col("ts")), ignorenulls=True
    ).over(w)
    seq = ev.select(
        "user_id", "ts", "event_id", "event_type",
        click_id.alias("click_id"), click_ts.alias("click_ts"),
    )
    return (
        seq.where((F.col("event_type") == "purchase") & F.col("click_id").isNotNull())
        .select(
            "user_id",
            F.col("event_id").alias("purchase_id"),
            F.col("click_id").alias("attributed_click"),
            (
                (F.col("ts").cast("long") - F.col("click_ts").cast("long")) / 60
            ).cast("long").alias("minutes_since_click"),
        )
        .orderBy("user_id", "purchase_id")
        .limit(500)
    )


_W11_ORACLE = (
    "WITH d AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) "
    "AS day FROM events), "
    "k AS (SELECT user_id, day, day - CAST(ROW_NUMBER() OVER "
    "(PARTITION BY user_id ORDER BY day) AS INTEGER) AS island "
    "FROM d) "
    "SELECT user_id, MIN(day) AS streak_start, MAX(day) AS streak_end, "
    "CAST(COUNT(*) AS BIGINT) AS n_days "
    "FROM k GROUP BY user_id, island "
    "HAVING COUNT(*) >= 3 ORDER BY user_id, streak_start"
)


@register(
    "w11_gap_islands",
    oracle=_W11_ORACLE,
    tags=("W11", "W9", "D17", "windows"),
)
def w11_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W11: GAPS-AND-ISLANDS — each user's contiguous activity streaks
    (runs of consecutive calendar days with events), the inverse view
    of d17's missing-day audit and the engagement-streak metric every
    product dashboard wants. The classic constant-space trick: within
    a user, day minus its row_number is CONSTANT exactly across a
    consecutive run, so the difference IS the island key and one
    groupBy finishes the job — no self-join, no iterative chaining.

    Plan: distinct (user, day) partial agg → ONE user-keyed window →
    island-keyed partial agg. Everything is keyed by user; no global
    order anywhere. Streaks ≥ 3 days reported (the knob)."""
    from ipydataclean_spark.operators.qhelp import T

    d = (
        T(spark, sf_dir, "events")
        .select(
            "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day")
    k = d.withColumn(
        "island", F.date_sub("day", F.row_number().over(w))
    )
    return (
        k.groupBy("user_id", "island")
        .agg(
            F.min("day").alias("streak_start"),
            F.max("day").alias("streak_end"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .where(F.col("n_days") >= 3)
        .select("user_id", "streak_start", "streak_end", "n_days")
        .orderBy("user_id", "streak_start")
    )


_W12_ORACLE = (
    "WITH iv AS (SELECT user_id, ts AS s, ts + INTERVAL 2 HOUR AS e "
    "FROM events), "
    "m AS (SELECT user_id, s, e, "
    "MAX(e) OVER (PARTITION BY user_id ORDER BY s, e "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max_e "
    "FROM iv), "
    "k AS (SELECT user_id, s, e, "
    "SUM(CASE WHEN prev_max_e IS NULL OR s > prev_max_e THEN 1 ELSE 0 END) "
    "OVER (PARTITION BY user_id ORDER BY s, e "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island FROM m) "
    "SELECT user_id, MIN(s) AS merged_start, MAX(e) AS merged_end, "
    "CAST(COUNT(*) AS BIGINT) AS n_events "
    "FROM k GROUP BY user_id, island "
    "ORDER BY user_id, merged_start"
)


@register(
    "w12_merge_intervals",
    oracle=_W12_ORACLE,
    tags=("W12", "W6", "R10", "windows"),
)
def w12_merge_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W12: MERGE OVERLAPPING INTERVALS — union each user's [ts,
    ts+2h) activity windows into maximal disjoint spans (the coverage
    question behind billing sessions, machine-uptime stitching, and
    on-call coverage; r10 JOINS intervals, w6 builds validity
    intervals — this REDUCES them). The classic two-window trick: a
    running MAX of previous interval ends detects a new span exactly
    when the next start clears everything seen (touching spans merge:
    the predicate is strictly >), and the running SUM of those breaks
    is the span id — one user-keyed sort, zero self-joins, linear at
    any scale.

    Both windows share one (user_id, s, e) sort order, so Spark plans
    a single Window operator pass."""
    from ipydataclean_spark.operators.qhelp import T

    iv = T(spark, sf_dir, "events").select(
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("e"),
    )
    w = Window.partitionBy("user_id").orderBy("s", "e")
    m = iv.withColumn(
        "prev_max_e",
        F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)),
    )
    brk = (
        F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e"))
    ).cast("int")
    k = m.withColumn(
        "island",
        F.sum(brk).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        k.groupBy("user_id", "island")
        .agg(
            F.min("s").alias("merged_start"),
            F.max("e").alias("merged_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "merged_start", "merged_end", "n_events")
        .orderBy("user_id", "merged_start")
    )
