"""Cleaning transformations — SURVEY.md §2.4 (C1-C17).

The reference's fix surface [P]: fills, interpolation, drops,
conversions, replacements, outlier treatment, dedup. All pure
DataFrame→DataFrame, recipe-composable (recipe.py).

Scale rules baked in:
  - aggregate fills (C2-C4) are two-phase: a tiny scalar job, then a
    literal substitution — never a window over the whole table;
  - interpolation (C5) is per-key partitioned where semantics allow;
    the global-order form is the documented small-data fallback;
  - dedup (C16) shuffles on the dedup key once (window row_number),
    deterministic survivor choice (min row id).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.functions.text import norm_text_col, norm_text_sql
from ipydataclean_spark.operators.qhelp import (
    T,
    documents_dup,
    scratch_dir,
    events_dirty,
    lineitem_dirty,
    with_documents_dup,
    with_events_dirty,
    with_lineitem_dirty,
)
from ipydataclean_spark.registry import register

# ---------------------------------------------------------------------------
# Reusable cleaning API (RecipeStep bodies)
# ---------------------------------------------------------------------------


def fill_value(df: DataFrame, col: str, value) -> DataFrame:
    """C1: fillna with constant."""
    return df.withColumn(col, F.coalesce(F.col(col), F.lit(value)))


def fill_aggregate(df: DataFrame, col: str, strategy: str = "mean") -> DataFrame:
    """C2/C3/C4: fill with mean/median/mode — two-phase scalar+literal."""
    if strategy == "mean":
        scalar = df.agg(exact.davg(col)).first()[0]
    elif strategy == "median":
        from ipydataclean_spark.functions.quantiles import exact_median

        scalar = exact_median(df, col)
    elif strategy == "mode":
        scalar = (
            df.where(F.col(col).isNotNull())
            .groupBy(col)
            .count()
            .orderBy(F.desc("count"), F.asc(col))
            .first()[0]
        )
    else:
        raise ValueError(f"unknown fill strategy: {strategy}")
    return fill_value(df, col, scalar)


#: Hard cap for the GLOBAL (single-partition) interpolate form. Above
#: this, the un-partitioned window is an executor-memory funnel; callers
#: must supply ``partition_by`` (the c5b scale path).
GLOBAL_INTERP_MAX_ROWS = 5_000_000


def interpolate_linear(
    df: DataFrame,
    col: str,
    order_col: str,
    partition_by: str | None = None,
    max_global_rows: int = GLOBAL_INTERP_MAX_ROWS,
) -> DataFrame:
    """C5: linear interpolation over row order (pandas Series.interpolate
    parity: interior gaps blended, leading NULLs kept, trailing ffilled).

    ``partition_by`` is the scale path (per-key windows); the global
    form funnels one partition and is GUARDED: above
    ``max_global_rows`` it raises instead of silently building a plan
    that funnels the table through one task (SURVEY hard-parts note —
    enforced in code, not docs).

    Both lookups are RUNNING windows (unboundedPreceding..current):
    the 'next non-null' uses a descending sort instead of an
    unboundedFollowing frame — following-frames degrade to per-row
    frame scans (measured minutes at 100k rows), running frames
    stream in O(n)."""
    if partition_by is None:
        n = df.count()
        if n > max_global_rows:
            raise ValueError(
                f"global interpolate_linear funnels all {n:,} rows through ONE "
                f"partition (> {max_global_rows:,} cap); pass partition_by= for "
                "the per-key scale path (c5b_interpolate_per_user)"
            )
    wp = Window.partitionBy(partition_by) if partition_by else Window.partitionBy()
    w_prev = wp.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)
    w_next = wp.orderBy(F.desc(order_col)).rowsBetween(Window.unboundedPreceding, 0)
    pos = F.col(order_col)
    marked = F.when(F.col(col).isNotNull(), pos)
    prev_val = F.last(col, ignorenulls=True).over(w_prev)
    prev_pos = F.last(marked, ignorenulls=True).over(w_prev)
    next_val = F.last(col, ignorenulls=True).over(w_next)
    next_pos = F.last(marked, ignorenulls=True).over(w_next)
    blend = prev_val + (next_val - prev_val) * (pos - prev_pos) / (next_pos - prev_pos)
    out = (
        F.when(F.col(col).isNotNull(), F.col(col))
        .when(prev_val.isNotNull() & next_val.isNotNull(), blend)
        .when(prev_val.isNotNull(), prev_val)
    )
    return df.withColumn(col, out)


def fill_directional(df: DataFrame, col: str, order_col: str, partition_by: str, direction: str = "forward") -> Column:
    """C6: ffill/bfill expression over a per-key RUNNING window (bfill
    = ffill over the reversed sort — streams in O(n), no following
    frame)."""
    if direction == "forward":
        wp = Window.partitionBy(partition_by).orderBy(order_col)
    else:
        wp = Window.partitionBy(partition_by).orderBy(F.desc(order_col))
    return F.last(col, ignorenulls=True).over(wp.rowsBetween(Window.unboundedPreceding, 0))


def clip(df: DataFrame, col: str, lo: float, hi: float) -> DataFrame:
    """C11: winsorize at bounds."""
    return df.withColumn(col, F.greatest(F.least(F.col(col), F.lit(hi)), F.lit(lo)))


def dedup_exact(df: DataFrame, keys: list[str], order_col: str) -> DataFrame:
    """C16: deterministic dedup — keep min(order_col) per key group."""
    w = Window.partitionBy(*keys).orderBy(order_col)
    return df.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


@register(
    "c1_fill_value",
    oracle=with_lineitem_dirty(
        "SELECT l_returnflag, COUNT(*) AS n, "
        f"{exact.dsum_sql('COALESCE(qty_parsed, 0.0)')} AS sum_filled, "
        "CAST(SUM(CASE WHEN qty_parsed IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_was_null "
        "FROM lineitem_dirty GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("C1",),
)
def c1_fill_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1: constant fill; checksum per group proves row count invariance."""
    df = lineitem_dirty(spark, sf_dir)
    return (
        df.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact.dsum(F.coalesce(F.col("qty_parsed"), F.lit(0.0))).alias("sum_filled"),
            F.sum(F.col("qty_parsed").isNull().cast("long")).alias("n_was_null"),
        )
        .orderBy("l_returnflag")
    )


_MEAN_SQL = f"(SELECT {exact.davg_sql('qty_parsed')} FROM lineitem_dirty)"
_MEDIAN_SQL = "(SELECT QUANTILE_CONT(qty_parsed, 0.5) FROM lineitem_dirty)"
_MODE_SQL = (
    "(SELECT qty_parsed FROM lineitem_dirty WHERE qty_parsed IS NOT NULL "
    "GROUP BY qty_parsed ORDER BY COUNT(*) DESC, qty_parsed ASC LIMIT 1)"
)


@register(
    "c2_fill_mean",
    oracle=with_lineitem_dirty(
        "SELECT l_returnflag, "
        f"{exact.dsum_sql(f'COALESCE(qty_parsed, {_MEAN_SQL})')} AS sum_filled, "
        f"{exact.davg_sql(f'COALESCE(qty_parsed, {_MEAN_SQL})')} AS avg_filled "
        "FROM lineitem_dirty GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("C2",),
)
def c2_fill_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2: fill-with-mean (exact order-independent mean, two-phase)."""
    df = lineitem_dirty(spark, sf_dir)
    filled = F.coalesce(F.col("qty_parsed"), F.lit(df.agg(exact.davg("qty_parsed")).first()[0]))
    return (
        df.groupBy("l_returnflag")
        .agg(exact.dsum(filled).alias("sum_filled"), exact.davg(filled).alias("avg_filled"))
        .orderBy("l_returnflag")
    )


@register(
    "c3_fill_median",
    oracle=with_lineitem_dirty(
        "SELECT l_returnflag, "
        f"{exact.dsum_sql(f'COALESCE(qty_parsed, {_MEDIAN_SQL})')} AS sum_filled "
        "FROM lineitem_dirty GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("C3",),
)
def c3_fill_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3: fill-with-median (exact percentile; approx knob at scale)."""
    df = lineitem_dirty(spark, sf_dir)
    from ipydataclean_spark.functions.quantiles import exact_median

    filled = F.coalesce(F.col("qty_parsed"), F.lit(exact_median(df, "qty_parsed")))
    return (
        df.groupBy("l_returnflag")
        .agg(exact.dsum(filled).alias("sum_filled"))
        .orderBy("l_returnflag")
    )


@register(
    "c4_fill_mode",
    oracle=with_lineitem_dirty(
        "SELECT l_returnflag, "
        f"{exact.dsum_sql(f'COALESCE(qty_parsed, {_MODE_SQL})')} AS sum_filled "
        "FROM lineitem_dirty GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("C4",),
)
def c4_fill_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4: fill-with-mode, deterministic tie-break (max count, min value)."""
    df = lineitem_dirty(spark, sf_dir)
    mode = (
        df.where(F.col("qty_parsed").isNotNull())
        .groupBy("qty_parsed")
        .count()
        .orderBy(F.desc("count"), F.asc("qty_parsed"))
        .first()[0]
    )
    filled = F.coalesce(F.col("qty_parsed"), F.lit(mode))
    return (
        df.groupBy("l_returnflag")
        .agg(exact.dsum(filled).alias("sum_filled"))
        .orderBy("l_returnflag")
    )


@register(
    "c5_interpolate_linear",
    oracle=with_events_dirty(
        ", w AS (SELECT event_id, row_id, value_gap, "
        "LAST_VALUE(value_gap IGNORE NULLS) OVER (ORDER BY row_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val, "
        "LAST_VALUE(CASE WHEN value_gap IS NOT NULL THEN row_id END IGNORE NULLS) OVER (ORDER BY row_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_pos, "
        "FIRST_VALUE(value_gap IGNORE NULLS) OVER (ORDER BY row_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val, "
        "FIRST_VALUE(CASE WHEN value_gap IS NOT NULL THEN row_id END IGNORE NULLS) OVER (ORDER BY row_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_pos "
        "FROM events_dirty) "
        "SELECT event_id, CASE WHEN value_gap IS NOT NULL THEN value_gap "
        "WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN "
        "prev_val + (next_val - prev_val) * (row_id - prev_pos) / (next_pos - prev_pos) "
        "WHEN prev_val IS NOT NULL THEN prev_val ELSE NULL END AS value_interp "
        "FROM w ORDER BY event_id"
    ),
    tags=("C5", "W2", "W3"),
)
def c5_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5: linear interpolation over global row order (pandas parity;
    global window documented as small-data path — see c5b for scale)."""
    df = interpolate_linear(events_dirty(spark, sf_dir), "value_gap", "row_id")
    return df.select("event_id", F.col("value_gap").alias("value_interp")).orderBy("event_id")


@register(
    "c5b_interpolate_per_user",
    oracle=with_events_dirty(
        ", w AS (SELECT event_id, row_id, user_id, value_gap, "
        "LAST_VALUE(value_gap IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY row_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val, "
        "LAST_VALUE(CASE WHEN value_gap IS NOT NULL THEN row_id END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY row_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_pos, "
        "FIRST_VALUE(value_gap IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY row_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val, "
        "FIRST_VALUE(CASE WHEN value_gap IS NOT NULL THEN row_id END IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY row_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_pos "
        "FROM events_dirty) "
        "SELECT event_id, CASE WHEN value_gap IS NOT NULL THEN value_gap "
        "WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN "
        "prev_val + (next_val - prev_val) * (row_id - prev_pos) / (next_pos - prev_pos) "
        "WHEN prev_val IS NOT NULL THEN prev_val ELSE NULL END AS value_interp "
        "FROM w ORDER BY event_id"
    ),
    tags=("C5",),
)
def c5b_interpolate_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 scale path: per-user partitioned interpolation — the window
    shuffles once on user_id; no single-partition funnel."""
    df = interpolate_linear(events_dirty(spark, sf_dir), "value_gap", "row_id", partition_by="user_id")
    return df.select("event_id", F.col("value_gap").alias("value_interp")).orderBy("event_id")


@register(
    "c6_ffill_bfill",
    oracle=with_events_dirty(
        "SELECT event_id, "
        "LAST_VALUE(value_gap IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY row_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffilled, "
        "FIRST_VALUE(value_gap IGNORE NULLS) OVER (PARTITION BY user_id ORDER BY row_id ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfilled "
        "FROM events_dirty ORDER BY event_id"
    ),
    tags=("C6", "W2"),
)
def c6_ffill_bfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: forward/backward fill per user (partitioned window — scales)."""
    df = events_dirty(spark, sf_dir)
    return df.select(
        "event_id",
        fill_directional(df, "value_gap", "row_id", "user_id", "forward").alias("ffilled"),
        fill_directional(df, "value_gap", "row_id", "user_id", "backward").alias("bfilled"),
    ).orderBy("event_id")


@register(
    "c7_dropna",
    oracle=with_lineitem_dirty(
        "SELECT COUNT(*) AS n_kept, "
        f"{exact.dsum_sql('qty_parsed')} AS sum_kept "
        "FROM lineitem_dirty WHERE qty_parsed IS NOT NULL"
    ),
    tags=("C7",),
)
def c7_dropna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: drop rows with missing values in subset."""
    df = lineitem_dirty(spark, sf_dir).na.drop(subset=["qty_parsed"])
    return df.agg(F.count(F.lit(1)).alias("n_kept"), exact.dsum("qty_parsed").alias("sum_kept"))


@register(
    "c8_drop_by_predicate",
    oracle=with_lineitem_dirty(
        ", bounds AS (SELECT QUANTILE_CONT(price_out, 0.25) AS q1, "
        "QUANTILE_CONT(price_out, 0.75) AS q3 FROM lineitem_dirty) "
        "SELECT COUNT(*) AS n_kept, "
        f"{exact.dsum_sql('price_out')} AS sum_kept "
        "FROM lineitem_dirty, bounds "
        "WHERE NOT (price_out < q1 - 1.5 * (q3 - q1) OR price_out > q3 + 1.5 * (q3 - q1))"
    ),
    tags=("C8", "C12"),
)
def c8_drop_by_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8/C12-drop: remove problem rows by detector predicate."""
    df = lineitem_dirty(spark, sf_dir)
    from ipydataclean_spark.functions.quantiles import exact_quantiles

    q1, q3 = exact_quantiles(df, "price_out", [0.25, 0.75])
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    kept = df.where(~((F.col("price_out") < F.lit(lo)) | (F.col("price_out") > F.lit(hi))))
    return kept.agg(F.count(F.lit(1)).alias("n_kept"), exact.dsum("price_out").alias("sum_kept"))


@register(
    "c9_convert_string_numeric",
    oracle=with_lineitem_dirty(
        "SELECT l_orderkey, l_linenumber, quantity_str, "
        "TRY_CAST(REPLACE(REPLACE(quantity_str, ' kg', ''), ',', '') AS DOUBLE) AS qty_converted "
        "FROM lineitem_dirty WHERE l_orderkey % 10 = 0 ORDER BY l_orderkey, l_linenumber"
    ),
    tags=("C9",),
)
def c9_convert_string_numeric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9: coerce parseable strings to numeric (unit/thousands cleanup
    then try_cast; unparseable → NULL feeds the D1/C1 pipeline)."""
    df = lineitem_dirty(spark, sf_dir).where(F.col("l_orderkey") % 10 == 0)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        "quantity_str",
        F.expr(
            "TRY_CAST(REPLACE(REPLACE(quantity_str, ' kg', ''), ',', '') AS DOUBLE)"
        ).alias("qty_converted"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "c10_replace_value",
    oracle=with_lineitem_dirty(
        "SELECT COUNT(*) AS n_rows, "
        "CAST(SUM(CASE WHEN quantity_str = 'N/A' THEN 1 ELSE 0 END) AS BIGINT) AS n_na_before, "
        "CAST(SUM(CASE WHEN CASE WHEN quantity_str = 'N/A' THEN '0' ELSE quantity_str END = '0' THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_after "
        "FROM lineitem_dirty"
    ),
    tags=("C10",),
)
def c10_replace_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10: replace a specific mismatched value (reference 'replace' fix)."""
    df = lineitem_dirty(spark, sf_dir)
    replaced = F.when(F.col("quantity_str") == "N/A", F.lit("0")).otherwise(F.col("quantity_str"))
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("quantity_str") == "N/A").cast("long")).alias("n_na_before"),
        F.sum((replaced == "0").cast("long")).alias("n_zero_after"),
    )


@register(
    "c11_clip_outliers",
    oracle=with_lineitem_dirty(
        ", bounds AS (SELECT QUANTILE_CONT(price_out, 0.25) AS q1, "
        "QUANTILE_CONT(price_out, 0.75) AS q3 FROM lineitem_dirty) "
        "SELECT COUNT(*) AS n, "
        "MIN(GREATEST(LEAST(price_out, q3 + 1.5 * (q3 - q1)), q1 - 1.5 * (q3 - q1))) AS min_clipped, "
        "MAX(GREATEST(LEAST(price_out, q3 + 1.5 * (q3 - q1)), q1 - 1.5 * (q3 - q1))) AS max_clipped, "
        f"{exact.dsum_sql('GREATEST(LEAST(price_out, q3 + 1.5 * (q3 - q1)), q1 - 1.5 * (q3 - q1))')} AS sum_clipped "
        "FROM lineitem_dirty, bounds"
    ),
    tags=("C11",),
)
def c11_clip_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11: winsorize at Tukey fences (greatest/least — no branching)."""
    df = lineitem_dirty(spark, sf_dir)
    from ipydataclean_spark.functions.quantiles import exact_quantiles

    q1, q3 = exact_quantiles(df, "price_out", [0.25, 0.75])
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    clipped = F.greatest(F.least(F.col("price_out"), F.lit(hi)), F.lit(lo))
    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(clipped).alias("min_clipped"),
        F.max(clipped).alias("max_clipped"),
        exact.dsum(clipped).alias("sum_clipped"),
    )


@register(
    "c12_outlier_to_null",
    oracle=with_lineitem_dirty(
        ", bounds AS (SELECT QUANTILE_CONT(price_out, 0.25) AS q1, "
        "QUANTILE_CONT(price_out, 0.75) AS q3 FROM lineitem_dirty) "
        "SELECT COUNT(*) AS n_rows, "
        "CAST(SUM(CASE WHEN price_out < q1 - 1.5 * (q3 - q1) OR price_out > q3 + 1.5 * (q3 - q1) THEN 1 ELSE 0 END) AS BIGINT) AS n_nulled, "
        f"{exact.dsum_sql('CASE WHEN price_out < q1 - 1.5 * (q3 - q1) OR price_out > q3 + 1.5 * (q3 - q1) THEN NULL ELSE price_out END')} AS sum_kept "
        "FROM lineitem_dirty, bounds"
    ),
    tags=("C12",),
)
def c12_outlier_to_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12: outlier → NULL (then the missing-value pipeline applies)."""
    df = lineitem_dirty(spark, sf_dir)
    from ipydataclean_spark.functions.quantiles import exact_quantiles

    q1, q3 = exact_quantiles(df, "price_out", [0.25, 0.75])
    lo, hi = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    is_out = (F.col("price_out") < F.lit(lo)) | (F.col("price_out") > F.lit(hi))
    return df.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(is_out.cast("long")).alias("n_nulled"),
        exact.dsum(F.when(is_out, F.lit(None)).otherwise(F.col("price_out"))).alias("sum_kept"),
    )


@register(
    "c13_cast_column",
    oracle=(
        "SELECT l_orderkey, l_linenumber, CAST(l_shipdate AS DATE) AS ship_date, "
        "TRY_CAST(CAST(l_quantity AS STRING) AS DOUBLE) AS qty_roundtrip "
        "FROM lineitem WHERE l_orderkey % 25 = 0 ORDER BY l_orderkey, l_linenumber"
    ),
    tags=("C13",),
)
def c13_cast_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13: cast column (strict + lenient try_cast round-trip)."""
    df = T(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 25 == 0)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.expr("TRY_CAST(CAST(l_quantity AS STRING) AS DOUBLE)").alias("qty_roundtrip"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "c14_15_rename_drop",
    oracle=(
        "SELECT c_custkey AS customer_id, c_name AS customer_name, c_mktsegment AS segment "
        "FROM customer ORDER BY customer_id"
    ),
    tags=("C14", "C15", "R1"),
)
def c14_15_rename_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14 rename + C15 drop (projection narrowing reaches the scan)."""
    return (
        T(spark, sf_dir, "customer")
        .withColumnRenamed("c_custkey", "customer_id")
        .withColumnRenamed("c_name", "customer_name")
        .withColumnRenamed("c_mktsegment", "segment")
        .drop("c_nationkey", "c_acctbal")
        .orderBy("customer_id")
    )


@register(
    "c16_dedup_exact",
    oracle=with_documents_dup(
        ", keyed AS (SELECT doc_id, lang, source, "
        f"MD5({norm_text_sql('text')}) AS dup_key, "
        f"ROW_NUMBER() OVER (PARTITION BY MD5({norm_text_sql('text')}) ORDER BY doc_id) AS rn "
        "FROM documents_dup) "
        "SELECT doc_id, lang, source FROM keyed WHERE rn = 1 ORDER BY doc_id"
    ),
    tags=("C16",),
)
def c16_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C16: exact dedup, deterministic survivor (min doc_id per norm-key).

    Window form (not dropDuplicates) so the survivor is stable across
    partitionings — required for cluster-reproducible dedup."""
    docs = documents_dup(spark, sf_dir).withColumn("dup_key", F.md5(norm_text_col("text")))
    deduped = dedup_exact(docs, ["dup_key"], "doc_id")
    return deduped.select("doc_id", "lang", "source").orderBy("doc_id")


@register(
    "recipe_pipeline",
    oracle=with_lineitem_dirty(
        ", conv AS (SELECT l_returnflag, "
        "TRY_CAST(REPLACE(REPLACE(quantity_str, ' kg', ''), ',', '') AS DOUBLE) AS qty2 "
        "FROM lineitem_dirty), "
        "filled AS (SELECT l_returnflag, "
        "COALESCE(qty2, (SELECT QUANTILE_CONT(qty2, 0.5) FROM conv)) AS qty3 FROM conv) "
        "SELECT l_returnflag, COUNT(*) AS n, "
        f"{exact.dsum_sql('qty3')} AS sum_qty "
        "FROM filled GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("recipe", "C9", "C3"),
)
def recipe_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed Recipe session (the engine's op-history IR): C9 parse →
    C3 median fill, folded into one lazy plan, then summarized.
    ``Recipe.to_code()`` round-trip is property-tested in tests."""
    from ipydataclean_spark.recipe import Recipe

    recipe = (
        Recipe()
        .convert_numeric("quantity_str", out="qty2")
        .fill_aggregate("qty2", "median")
    )
    cleaned = recipe.apply(lineitem_dirty(spark, sf_dir))
    return (
        cleaned.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), exact.dsum("qty2").alias("sum_qty"))
        .orderBy("l_returnflag")
    )


@register(
    "c17_normalize_text",
    oracle=with_documents_dup(
        f"SELECT doc_id, {norm_text_sql('text')} AS norm_text "
        "FROM documents_dup WHERE doc_id % 7 = 0 ORDER BY doc_id"
    ),
    tags=("C17",),
)
def c17_normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C17: trim/lower/collapse-whitespace normalization."""
    return (
        documents_dup(spark, sf_dir)
        .where(F.col("doc_id") % 7 == 0)
        .select("doc_id", norm_text_col("text").alias("norm_text"))
        .orderBy("doc_id")
    )


_MERGE_UPDATES_SQL = (
    "SELECT o_orderkey AS u_orderkey, o_totalprice * 1.10 AS u_totalprice, "
    "'P' AS u_orderstatus FROM orders WHERE o_orderkey % 13 = 0 "
    "UNION ALL "
    "SELECT o_orderkey + 10000000 AS u_orderkey, o_totalprice AS u_totalprice, "
    "'N' AS u_orderstatus FROM orders WHERE o_orderkey % 17 = 0"
)


@register(
    "c18_merge_upsert",
    oracle=(
        f"WITH updates AS ({_MERGE_UPDATES_SQL}) "
        "SELECT COALESCE(u_orderkey, o_orderkey) AS o_orderkey, "
        "COALESCE(u_totalprice, o_totalprice) AS o_totalprice, "
        "COALESCE(u_orderstatus, o_orderstatus) AS o_orderstatus, "
        "CASE WHEN o_orderkey IS NULL THEN 'insert' "
        "WHEN u_orderkey IS NULL THEN 'keep' ELSE 'update' END AS merge_action "
        "FROM orders FULL JOIN updates ON u_orderkey = o_orderkey "
        "ORDER BY o_orderkey"
    ),
    tags=("C18", "R4"),
)
def c18_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C18: MERGE/upsert without a table format — the full-outer-join
    form of `MERGE INTO target USING updates ON key WHEN MATCHED THEN
    UPDATE WHEN NOT MATCHED THEN INSERT`. The updates side is a
    deterministic CTE over orders (keys %13 repriced, %17 offset-keyed
    as inserts).

    At scale this is ONE shuffle on the merge key for both sides; with
    a bucketed target (tests/test_scale_patterns.py) the shuffle
    disappears entirely. Delta/Iceberg MERGE is this same plan plus
    file-level conflict tracking (not in this container — STATUS.md
    round-2 queue)."""
    orders = T(spark, sf_dir, "orders")
    updates = orders.where(F.col("o_orderkey") % 13 == 0).select(
        F.col("o_orderkey").alias("u_orderkey"),
        (F.col("o_totalprice") * F.lit(1.10)).alias("u_totalprice"),
        F.lit("P").alias("u_orderstatus"),
    ).unionByName(
        orders.where(F.col("o_orderkey") % 17 == 0).select(
            (F.col("o_orderkey") + 10000000).alias("u_orderkey"),
            F.col("o_totalprice").alias("u_totalprice"),
            F.lit("N").alias("u_orderstatus"),
        )
    )
    merged = orders.join(updates, F.col("u_orderkey") == F.col("o_orderkey"), "full_outer")
    return merged.select(
        F.coalesce("u_orderkey", "o_orderkey").alias("o_orderkey"),
        F.coalesce("u_totalprice", "o_totalprice").alias("o_totalprice"),
        F.coalesce("u_orderstatus", "o_orderstatus").alias("o_orderstatus"),
        F.when(F.col("o_orderkey").isNull(), "insert")
        .when(F.col("u_orderkey").isNull(), "keep")
        .otherwise("update")
        .alias("merge_action"),
    ).orderBy("o_orderkey")


# ---------------------------------------------------------------------------
# C18b: file-level MERGE into partitioned parquet (no table format)
# ---------------------------------------------------------------------------


@register(
    "c18b_merge_files",
    oracle=(
        "WITH updates AS ("
        "SELECT o_orderkey AS u_orderkey, o_totalprice * 1.10 AS u_totalprice, "
        "'P' AS u_orderstatus FROM orders WHERE o_orderkey % 64 = 0 "
        "UNION ALL "
        "SELECT o_orderkey + 10000000 AS u_orderkey, o_totalprice AS u_totalprice, "
        "'N' AS u_orderstatus FROM orders WHERE o_orderkey % 128 = 0) "
        "SELECT COALESCE(u_orderkey, o_orderkey) AS o_orderkey, "
        "COALESCE(u_totalprice, o_totalprice) AS o_totalprice, "
        "COALESCE(u_orderstatus, o_orderstatus) AS o_orderstatus, "
        "CAST(COALESCE(u_orderkey, o_orderkey) % 16 AS BIGINT) AS pk "
        "FROM orders FULL JOIN updates ON u_orderkey = o_orderkey "
        "ORDER BY o_orderkey"
    ),
    tags=("C18", "S5", "S9"),
)
def c18b_merge_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C18b: MERGE executed at the FILE level against a partitioned
    parquet dataset (sources.merge_into_parquet) — the incremental-
    cleaning-run path VERDICT r01 #5 asked for. The target is seeded
    from orders partitioned by pk = o_orderkey % 16 (a key-derived,
    update-stable partition column); the update batch touches only keys
    ≡ 0 (mod 64/128), i.e. ONLY partition pk=0, so the merge reads one
    partition (static pruning) and dynamic-partition-overwrite rewrites
    one partition — the other 15 partitions' files are untouched on
    disk (asserted in tests/test_sources.py). The query returns the
    post-merge table state, which the oracle reproduces as a plain
    full-outer MERGE over all rows."""
    from ipydataclean_spark.sources import merge_into_parquet

    # session-unique scratch (appId-keyed): two concurrent sessions
    # (e.g. verify + a smoke run) must not race on the same target
    scratch = scratch_dir(spark, "c18b_merge")
    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus",
        (F.col("o_orderkey") % 16).alias("pk"),
    )
    orders.write.mode("overwrite").partitionBy("pk").parquet(scratch)
    updates = orders.where(F.col("o_orderkey") % 64 == 0).select(
        F.col("o_orderkey").alias("u_o_orderkey"),
        (F.col("o_totalprice") * F.lit(1.10)).alias("u_o_totalprice"),
        F.lit("P").alias("u_o_orderstatus"),
        F.col("pk"),
    ).unionByName(
        orders.where(F.col("o_orderkey") % 128 == 0).select(
            (F.col("o_orderkey") + 10000000).alias("u_o_orderkey"),
            F.col("o_totalprice").alias("u_o_totalprice"),
            F.lit("N").alias("u_o_orderstatus"),
            ((F.col("o_orderkey") + 10000000) % 16).alias("pk"),
        )
    )
    merge_into_parquet(spark, scratch, updates, key="o_orderkey", part="pk")
    return (
        spark.read.parquet(scratch)
        .select(
            "o_orderkey", "o_totalprice", "o_orderstatus",
            F.col("pk").cast("long").alias("pk"),
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# Recipe SQL export (to_sql): the generated SQL IS the oracle
# ---------------------------------------------------------------------------


from ipydataclean_spark.operators import dirty as _dirty  # noqa: E402


def _sql_export_recipe():
    from ipydataclean_spark.recipe import Recipe

    return (
        Recipe()
        .convert_numeric("quantity_str", out="qty2")
        .fill_aggregate("qty2", "mean")
        .clip("qty2", 5.0, 45.0)
        .one_hot("l_returnflag", ["A", "N", "R"])
    )


_RS_BODY, _RS_LAST = _sql_export_recipe().sql_ctes("lineitem_dirty")


@register(
    "recipe_sql_export",
    oracle=(
        f"WITH lineitem_dirty AS ({_dirty.lineitem_dirty_sql()})"
        f"{_RS_BODY} "
        "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
        f"{exact.dsum_sql('qty2')} AS sum_qty, "
        "CAST(SUM(l_returnflag__a) AS BIGINT) AS n_a, "
        "CAST(SUM(l_returnflag__r) AS BIGINT) AS n_r "
        f"FROM {_RS_LAST} GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("recipe", "C9", "C3", "C11", "C22"),
)
def recipe_sql_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recipe.to_sql round-trip under the driver's value-hash gate:
    the ORACLE for this query is literally the SQL that
    ``Recipe.sql_ctes`` generated for the same four-step session
    (parse → mean-fill → clip → one-hot), so the interop export is
    hash-verified against the Spark execution of the identical
    recipe — not eyeballed. ``to_code`` (PySpark export) is the
    property-tested sibling."""
    recipe = _sql_export_recipe()
    cleaned = recipe.apply(lineitem_dirty(spark, sf_dir))
    return (
        cleaned.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact.dsum("qty2").alias("sum_qty"),
            F.sum("l_returnflag__a").cast("long").alias("n_a"),
            F.sum("l_returnflag__r").cast("long").alias("n_r"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "autofix_pipeline",
    oracle=(
        f"WITH lineitem_dirty AS ({_dirty.lineitem_dirty_sql()}), "
        "s0 AS (SELECT * REPLACE (TRY_CAST(REPLACE(REPLACE(quantity_str, ' kg', ''), "
        "',', '') AS DOUBLE) AS quantity_str) FROM lineitem_dirty), "
        "s1 AS (SELECT * REPLACE (COALESCE(qty_parsed, (SELECT "
        "(CAST(SUM(CAST(qty_parsed AS DECIMAL(28,6))) AS DOUBLE) / COUNT(qty_parsed)) "
        "FROM s0)) AS qty_parsed) FROM s0), "
        "s2 AS (SELECT * REPLACE (COALESCE(quantity_str, (SELECT "
        "(CAST(SUM(CAST(quantity_str AS DECIMAL(28,6))) AS DOUBLE) / COUNT(quantity_str)) "
        "FROM s1)) AS quantity_str) FROM s1), "
        "qb AS (SELECT QUANTILE_CONT(price_out, 0.25) AS q1, "
        "QUANTILE_CONT(price_out, 0.75) AS q3 FROM s2), "
        "s3 AS (SELECT * REPLACE (GREATEST(LEAST(price_out, "
        "(SELECT q3 + 1.5 * (q3 - q1) FROM qb)), "
        "(SELECT q1 - 1.5 * (q3 - q1) FROM qb)) AS price_out) FROM s2) "
        "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n, "
        f"{exact.dsum_sql('quantity_str')} AS sum_qs, "
        f"{exact.dsum_sql('qty_parsed')} AS sum_qp, "
        f"{exact.dsum_sql('price_out')} AS sum_price "
        "FROM s3 GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("autofix", "C2", "C9", "C11", "D3", "recipe"),
)
def autofix_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The headless auto-clean session under the driver's value-hash
    gate: DataCleaner.autofix detects every problem on the dirty
    lineitem and applies each top-recommended fix in converter-first
    order (convert quantity_str → mean-fill qty_parsed and the
    converted quantity_str → IQR-clip price_out); the oracle replays
    the same pipeline in SQL with the clip bounds as QUANTILE_CONT
    scalar subqueries (exact_quantiles ≡ QUANTILE_CONT bit-for-bit —
    the p5 parity) and the same IEEE bound arithmetic. A hash match
    certifies detection ordering, fix selection, and every fix's
    numeric semantics at once."""
    from ipydataclean_spark.api import DataCleaner

    dc = DataCleaner(lineitem_dirty(spark, sf_dir))
    dc.autofix()
    return (
        dc.df.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact.dsum("quantity_str").alias("sum_qs"),
            exact.dsum("qty_parsed").alias("sum_qp"),
            exact.dsum("price_out").alias("sum_price"),
        )
        .orderBy("l_returnflag")
    )


_C34_VARIANTS = (
    "v AS (SELECT LOWER(TRIM(seg)) AS fp, seg, CAST(COUNT(*) AS BIGINT) AS n "
    "FROM segd GROUP BY 1, 2), "
    "canon AS (SELECT fp, seg AS canonical, n, "
    "ROW_NUMBER() OVER (PARTITION BY fp ORDER BY n DESC, seg) AS rn FROM v) "
)


@register(
    "c34_value_cluster",
    oracle=(
        f"WITH segd AS (SELECT {_dirty.SEG_DIRTY} AS seg FROM customer), "
        + _C34_VARIANTS
        + "SELECT v.fp, CAST(COUNT(*) AS BIGINT) AS n_variants, "
        "CAST(SUM(v.n) AS BIGINT) AS n_rows, "
        "MAX(c.canonical) AS canonical, "
        "STRING_AGG(v.seg, '|' ORDER BY v.seg) AS variants "
        "FROM v JOIN canon c ON v.fp = c.fp AND c.rn = 1 "
        "GROUP BY v.fp ORDER BY v.fp"
    ),
    tags=("C34", "C17", "cleaning", "facet"),
)
def c34_value_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C34: VALUE CLUSTERING over a dirty categorical column — the
    OpenRefine-style "cluster & edit" facet: key every raw value by a
    normalization fingerprint (lower+trim; swap in a token-sort or
    phonetic key for messier data, same plan), group the raw variants
    under each key, and propose the most frequent variant as the
    canonical (ties to the lexicographically first). The report a
    cleaning UI shows before a bulk standardization.

    Plan: one scan → (fingerprint, variant) counts (two partial-agg
    shuffles over a CARDINALITY-sized table — variants, not rows);
    the canonical pick is a window over the tiny variant table. At
    100 TB the variant table is still catalog-sized: this never
    touches row-count-proportional state after the first aggregate."""
    from ipydataclean_spark.operators.featprep import value_cluster_mapping

    segd = T(spark, sf_dir, "customer").select(F.expr(_dirty.SEG_DIRTY).alias("seg"))
    v, canon = value_cluster_mapping(segd, "seg")
    return (
        v.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.sum("n").cast("long").alias("n_rows"),
            F.array_join(F.sort_array(F.collect_set("raw")), "|").alias("variants"),
        )
        .join(canon, "fp")
        .select("fp", "n_variants", "n_rows", "canonical", "variants")
        .orderBy("fp")
    )


@register(
    "c35_standardize_values",
    oracle=(
        f"WITH segd AS (SELECT {_dirty.SEG_DIRTY} AS seg FROM customer), "
        + _C34_VARIANTS
        + "SELECT c.canonical AS segment, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM segd s JOIN canon c ON LOWER(TRIM(s.seg)) = c.fp AND c.rn = 1 "
        "GROUP BY 1 ORDER BY 1"
    ),
    tags=("C35", "C34", "C10", "cleaning", "facet"),
)
def c35_standardize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C35: APPLY the c34 clustering — bulk-standardize every raw
    variant to its cluster's canonical and return the repaired value
    distribution (which must collapse back to the clean segment
    cardinality — the oracle proves the repair, not just the report).
    The mapping table is variant-sized, so the apply step is a
    broadcast join onto the scan at any data size."""
    from ipydataclean_spark.operators.featprep import value_cluster_mapping

    segd = T(spark, sf_dir, "customer").select(F.expr(_dirty.SEG_DIRTY).alias("seg"))
    _, canon = value_cluster_mapping(segd, "seg")
    return (
        segd.join(
            F.broadcast(canon), F.lower(F.trim("seg")) == F.col("fp")
        )
        .groupBy(F.col("canonical").alias("segment"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("segment")
    )


# messy-URL synthesis (deterministic from the fixture — it ships no URL
# column, so the dirt rule is shared as SQL text with the oracle twin)
_C36_URL_SQL = (
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'https' END || '://' || "
    "CASE WHEN doc_id % 3 = 0 THEN upper(source) ELSE source END || "
    "'.Example.COM/docs/' || CAST(doc_id % 50 AS STRING) || "
    "CASE WHEN doc_id % 4 = 0 THEN '?utm_source=feed&id=' || lang "
    "ELSE '?id=' || lang END || "
    "CASE WHEN doc_id % 5 = 0 THEN '#sec2' ELSE '' END)"
)

_C36_ORACLE = (
    "WITH u AS (SELECT doc_id, " + _C36_URL_SQL + " AS url FROM documents), "
    "parts AS (SELECT doc_id, url, "
    "lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme, "
    "lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)) AS host, "
    "regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1) AS path, "
    "regexp_extract(url, '[?]([^#]*)', 1) AS qs FROM u), "
    "canon AS (SELECT doc_id, url, scheme || '://' || host || path || "
    "CASE WHEN kept <> '' THEN '?' || kept ELSE '' END AS canonical_url "
    "FROM (SELECT *, array_to_string(list_filter(string_split(qs, '&'), "
    "x -> NOT starts_with(x, 'utm_')), '&') AS kept FROM parts) f) "
    "SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_variants, "
    "MIN(doc_id) AS first_doc "
    "FROM canon GROUP BY canonical_url ORDER BY canonical_url"
)


@register(
    "c36_canonicalize_urls",
    oracle=_C36_ORACLE,
    tags=("C36", "C17", "L24", "cleaning", "dedup"),
)
def c36_canonicalize_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C36: URL canonicalization + dedup — the cleaning step every
    web-crawl pipeline runs before URL-level dedup (l24 parses; this
    REPAIRS): lowercase the scheme and host (case-insensitive per RFC
    3986), drop the fragment (never sent to the server), strip
    tracking parameters (utm_*) while PRESERVING meaningful ones, then
    roll up by canonical form — n_raw_variants counts how many messy
    spellings collapsed into each. Messy URLs are synthesized
    deterministically from the fixture (upper/lower case, utm noise,
    fragments, colliding paths), so the collapse itself is what the
    oracle value-hash checks.

    Plan: pure regexp extraction + array filter builtins, one
    canonical-keyed partial agg — map-only until the rollup, identical
    shape at crawl scale. Anchored ^-regexes only (the cross-engine
    regex discipline: no $, no \\s)."""
    u = T(spark, sf_dir, "documents").select("doc_id", F.expr(_C36_URL_SQL).alias("url"))
    parts = u.select(
        "doc_id",
        "url",
        F.lower(F.regexp_extract("url", r"^([A-Za-z]+)://", 1)).alias("scheme"),
        F.lower(F.regexp_extract("url", r"^[A-Za-z]+://([^/?#]+)", 1)).alias("host"),
        F.regexp_extract("url", r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1).alias("path"),
        F.regexp_extract("url", r"[?]([^#]*)", 1).alias("qs"),
    )
    kept = F.array_join(
        F.filter(
            F.split("qs", "&"),
            lambda x: ~x.startswith("utm_"),
        ),
        "&",
    )
    canon = parts.withColumn("kept", kept).select(
        "doc_id",
        "url",
        F.concat(
            F.col("scheme"), F.lit("://"), F.col("host"), F.col("path"),
            F.when(F.col("kept") != "", F.concat(F.lit("?"), F.col("kept"))).otherwise(F.lit("")),
        ).alias("canonical_url"),
    )
    return (
        canon.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("url").alias("n_raw_variants"),
            F.min("doc_id").alias("first_doc"),
        )
        .orderBy("canonical_url")
    )


_C37_ORACLE = with_lineitem_dirty(
    "SELECT * FROM ("
    "WITH s AS (SELECT l_returnflag, "
    "CAST(COUNT(qty_parsed) AS DOUBLE) AS n, "
    + exact.dsum_sql("CASE WHEN qty_parsed IS NOT NULL THEN l_extendedprice END")
    + " AS sx, "
    + exact.dsum_sql("qty_parsed")
    + " AS sy, "
    + exact.dsum_sql("qty_parsed * l_extendedprice")
    + " AS sxy, "
    + exact.dsum_sql(
        "CASE WHEN qty_parsed IS NOT NULL THEN l_extendedprice * l_extendedprice END"
    )
    + " AS sxx FROM lineitem_dirty GROUP BY l_returnflag), "
    "coef AS (SELECT l_returnflag, "
    "ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 8) AS b, "
    "ROUND((sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) / n, 8) AS a "
    "FROM s) "
    "SELECT li.l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_imputed, "
    + exact.dsum_sql("c.a + c.b * li.l_extendedprice")
    + " AS sum_imputed, MIN(c.b) AS slope, MIN(c.a) AS intercept "
    "FROM lineitem_dirty li JOIN coef c ON li.l_returnflag = c.l_returnflag "
    "WHERE li.qty_parsed IS NULL GROUP BY li.l_returnflag"
    ") ORDER BY l_returnflag"
)


@register(
    "c37_regression_impute",
    oracle=_C37_ORACLE,
    tags=("C37", "C2", "P26", "cleaning"),
)
def c37_regression_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C37: REGRESSION imputation — fill a column's missing values
    from a correlated predictor instead of a constant (the MICE-lite
    step between c2's mean fill and a learned imputer): per group, fit
    qty ~ extendedprice by OLS on the observed rows (p26's exact
    decimal power sums), then impute each missing qty as a + b·price.
    Coefficients are ROUNDED to 8 dp BEFORE imputing — the published
    coefficients ARE the model, so fills are reproducible from the
    report alone and the cross-engine FMA-contraction hazard on the
    a*b - c*d patterns never touches row values.

    Plan: one grouped power-sum pass over observed rows (partial-agg),
    a group-keyed broadcast of the coefficient table back onto the
    scan, map-side fill — the same two-phase scalar shape as c2/c3,
    generalized from a constant to a per-group linear model."""
    li = lineitem_dirty(spark, sf_dir)
    x, y = F.col("l_extendedprice"), F.col("qty_parsed")
    x_obs = F.when(y.isNotNull(), x)
    s = li.groupBy("l_returnflag").agg(
        F.count(y).cast("double").alias("n"),
        exact.dsum(x_obs).alias("sx"),
        exact.dsum(y).alias("sy"),
        exact.dsum(y * x).alias("sxy"),
        exact.dsum(x_obs * x_obs).alias("sxx"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx = F.col("sxy"), F.col("sxx")
    slope_raw = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    coef = s.select(
        "l_returnflag",
        F.round(slope_raw, 8).alias("b"),
        F.round((sy - sx * slope_raw) / n, 8).alias("a"),
    )
    return (
        li.where(y.isNull())
        .join(F.broadcast(coef), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_imputed"),
            exact.dsum(F.col("a") + F.col("b") * x).alias("sum_imputed"),
            F.min("b").alias("slope"),
            F.min("a").alias("intercept"),
        )
        .orderBy("l_returnflag")
    )


# localized-money dirt rule, shared as SQL text with the oracle twin:
# '$1,234,567' / '$12,345' / '$901', every 7th row bare digits
_C38_DIRTY = (
    "CASE WHEN l_orderkey % 7 = 0 THEN "
    "CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) AS STRING) "
    "WHEN FLOOR(l_extendedprice) >= 1000000 THEN "
    "'$' || CAST(CAST(FLOOR(l_extendedprice / 1000000.0) AS BIGINT) AS STRING) "
    "|| ',' || LPAD(CAST(CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) "
    "% 1000 AS STRING), 3, '0') "
    "|| ',' || LPAD(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) "
    "% 1000 AS STRING), 3, '0') "
    "WHEN FLOOR(l_extendedprice) >= 1000 THEN "
    "'$' || CAST(CAST(FLOOR(l_extendedprice / 1000.0) AS BIGINT) AS STRING) "
    "|| ',' || LPAD(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) "
    "% 1000 AS STRING), 3, '0') "
    "ELSE '$' || CAST(CAST(FLOOR(l_extendedprice) AS BIGINT) AS STRING) END"
)

_C38_ORACLE = (
    "WITH loc AS (SELECT l_returnflag, l_extendedprice, "
    + _C38_DIRTY
    + " AS money_str FROM lineitem), "
    "parsed AS (SELECT l_returnflag, l_extendedprice, "
    "TRY_CAST(regexp_replace(money_str, '[$,]', '', 'g') AS BIGINT) AS v "
    "FROM loc) "
    "SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n_rows, "
    "CAST(COUNT(v) AS BIGINT) AS n_parsed, "
    "CAST(SUM(v) AS BIGINT) AS total_parsed, "
    "CAST(COUNT_IF(v = CAST(FLOOR(l_extendedprice) AS BIGINT)) AS BIGINT) "
    "AS n_roundtrip_ok "
    "FROM parsed GROUP BY l_returnflag ORDER BY l_returnflag"
)


@register(
    "c38_parse_localized_numbers",
    oracle=_C38_ORACLE,
    tags=("C38", "C9", "cleaning"),
)
def c38_parse_localized_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C38: parse LOCALIZED numerics — currency symbols and thousands
    separators ('$1,234,567') that defeat c9's plain TRY_CAST: strip
    the grouping characters with one regexp, then cast. The roundtrip
    counter proves every synthesized value parses back to exactly
    floor(price) — the oracle value-checks the repair, not just the
    counts. A locale with '.' grouping and ',' decimal swaps the
    character class and adds a final-comma→dot replace: same plan.

    Plan: map-only (regexp_replace + cast in codegen) + one grouped
    partial agg. The dirt rule is shared SQL text, so both engines
    synthesize byte-identical inputs."""
    loc = T(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        F.expr(_C38_DIRTY).alias("money_str"),
    )
    v = F.expr("TRY_CAST(regexp_replace(money_str, '[$,]', '') AS BIGINT)")
    parsed = loc.select(
        "l_returnflag",
        "l_extendedprice",
        v.alias("v"),
    )
    ok = (
        F.col("v") == F.floor("l_extendedprice").cast("long")
    ).cast("long")
    return (
        parsed.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count("v").alias("n_parsed"),
            F.sum("v").cast("long").alias("total_parsed"),
            F.sum(ok).alias("n_roundtrip_ok"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# C39 — exponential smoothing (per-key EWMA via order-pinned folds)
# ---------------------------------------------------------------------------

_C39_ALPHA = 0.3

_C39_ORACLE = (
    "WITH seq AS (SELECT user_id, LIST(value ORDER BY ts, event_id) AS vals "
    "FROM events WHERE value IS NOT NULL GROUP BY user_id) "
    "SELECT user_id, CAST(LEN(vals) AS BIGINT) AS n_events, "
    "vals[-1] AS last_value, "
    f"list_reduce(vals, (acc, x) -> acc * {1 - _C39_ALPHA} + x * {_C39_ALPHA}) AS ewma, "
    f"(vals[-1] - list_reduce(vals, (acc, x) -> acc * {1 - _C39_ALPHA} + x * {_C39_ALPHA})) "
    "AS residual "
    "FROM seq ORDER BY user_id"
)


@register(
    "c39_exponential_smoothing",
    oracle=_C39_ORACLE,
    tags=("C39", "C21", "D9", "timeseries", "cleaning"),
)
def c39_exponential_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C39: per-user exponential smoothing (EWMA, α=0.3) over the
    event stream — the classic denoise/level estimate behind
    forecasting baselines and d9-style anomaly residuals (|last −
    ewma| is the smoothed surprise). The recurrence s_t = α·x_t +
    (1−α)·s_{t−1} is inherently SEQUENTIAL — no associative rewrite
    exists — so it is certified with the sequential-fold trick the
    vector kernels use: Spark folds the time-ordered value array with
    ``aggregate`` (seed = first element), DuckDB with ``list_reduce``
    (same seeding rule), and IEEE ops in the same order make the
    doubles bit-identical.

    Scale shape: ONE user-keyed shuffle collects each key's ordered
    values (array size = per-user event count — fine wherever a
    per-key series fits a row, the same boundedness contract as
    c5/c21's per-user paths); the fold is a codegen higher-order
    expression, no Python. Tie order is pinned (ts, event_id) in both
    engines so duplicate timestamps cannot reorder the fold."""
    return ewma_agg(T(spark, sf_dir, "events")).orderBy("user_id")

def ewma_agg(ev: DataFrame) -> DataFrame:
    """ST16: per-user exponential smoothing as a STREAM stage — the
    c39 computation verbatim (one definition, c39 registers it
    batch-side, st16 streams it): the time-ordered value collection is the query's
    only stateful operator (complete mode — the smoothed level is a
    running per-user total, recomputed as batches land), and the
    sequential fold runs as a post-aggregation projection, which
    structured streaming permits. Identical builder for the batch
    twin (the §2.8 contract)."""
    seq = (
        ev.where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "value"))),
                lambda s: s["value"],
            ).alias("vals")
        )
    )
    alpha = F.lit(_C39_ALPHA)
    rest = F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0)))
    ewma = F.aggregate(
        rest,
        F.element_at("vals", 1),
        lambda acc, x: acc * (F.lit(1.0) - alpha) + x * alpha,
    )
    return seq.select(
        "user_id",
        F.size("vals").cast("long").alias("n_events"),
        F.element_at("vals", -1).alias("last_value"),
        ewma.alias("ewma"),
        (F.element_at("vals", -1) - ewma).alias("residual"),
    )
