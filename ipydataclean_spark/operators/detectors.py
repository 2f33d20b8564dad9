"""Problem detectors — SURVEY.md §2.3 (D1-D6).

Each detector returns a problem set (row identity + payload) as a
DataFrame — the engine analogue of the reference's per-column problem
list [P]. All are filters/aggregates over profiling expressions: a
detector never materializes more than the problem rows, so at 100 TB
a detector scan is one pushdown-friendly pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.functions.text import norm_text_col, norm_text_sql
from ipydataclean_spark.operators.qhelp import (
    documents_dup,
    lineitem_dirty,
    with_documents_dup,
    with_lineitem_dirty,
)
from ipydataclean_spark.registry import register

# ---------------------------------------------------------------------------
# Reusable detector API
# ---------------------------------------------------------------------------


def detect_missing(df: DataFrame, col: str) -> DataFrame:
    """D1: rows with NULL in ``col`` (NaN already normalized on ingest)."""
    return df.where(F.col(col).isNull())


def detect_string_mismatch(df: DataFrame, col: str) -> DataFrame:
    """D2: non-null values that fail numeric parse — the reference's
    'string mismatch in a numeric column' problem [P]."""
    return df.where(
        F.col(col).isNotNull() & F.expr(f"TRY_CAST({col} AS DOUBLE)").isNull()
    )


def iqr_bounds(df: DataFrame, col: str, k: float = 1.5) -> tuple[float, float]:
    """D3: Tukey fences — exact quantiles via histogram refinement
    (functions/quantiles.py: 3 codegen scans, O(1) executor memory,
    vs Spark's buffering `percentile` agg)."""
    from ipydataclean_spark.functions.quantiles import exact_quantiles

    q1, q3 = exact_quantiles(df, col, [0.25, 0.75])
    iqr = q3 - q1
    return q1 - k * iqr, q3 + k * iqr


def detect_outliers_iqr(df: DataFrame, col: str, k: float = 1.5) -> DataFrame:
    lo, hi = iqr_bounds(df, col, k)
    return df.where((F.col(col) < F.lit(lo)) | (F.col(col) > F.lit(hi)))


# ---------------------------------------------------------------------------
# Registered queries
# ---------------------------------------------------------------------------


@register(
    "d1_missing_rows",
    oracle=with_lineitem_dirty(
        "SELECT l_orderkey, l_linenumber FROM lineitem_dirty "
        "WHERE quantity_str IS NULL ORDER BY l_orderkey, l_linenumber"
    ),
    tags=("D1",),
)
def d1_missing_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: missing-value problem rows (row identity projection only —
    column pruning keeps the scan 2-column at scale)."""
    return (
        detect_missing(lineitem_dirty(spark, sf_dir), "quantity_str")
        .select("l_orderkey", "l_linenumber")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "d2_string_mismatch",
    oracle=with_lineitem_dirty(
        "SELECT l_orderkey, l_linenumber, quantity_str FROM lineitem_dirty "
        "WHERE quantity_str IS NOT NULL AND TRY_CAST(quantity_str AS DOUBLE) IS NULL "
        "ORDER BY l_orderkey, l_linenumber"
    ),
    tags=("D2",),
)
def d2_string_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2: string-mismatch problem rows ('N/A', '23.0 kg', ...)."""
    return (
        detect_string_mismatch(lineitem_dirty(spark, sf_dir), "quantity_str")
        .select("l_orderkey", "l_linenumber", "quantity_str")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "d3_outliers_iqr",
    oracle=with_lineitem_dirty(
        ", bounds AS (SELECT QUANTILE_CONT(price_out, 0.25) AS q1, "
        "QUANTILE_CONT(price_out, 0.75) AS q3 FROM lineitem_dirty) "
        "SELECT l_orderkey, l_linenumber, price_out FROM lineitem_dirty, bounds "
        "WHERE price_out < q1 - 1.5 * (q3 - q1) OR price_out > q3 + 1.5 * (q3 - q1) "
        "ORDER BY l_orderkey, l_linenumber"
    ),
    tags=("D3",),
)
def d3_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3: Tukey-fence outliers (default 1.5·IQR contract, SURVEY §2.3)."""
    df = lineitem_dirty(spark, sf_dir)
    from ipydataclean_spark.functions.quantiles import exact_quantiles

    q1, q3 = exact_quantiles(df, "price_out", [0.25, 0.75])
    lo = q1 - 1.5 * (q3 - q1)
    hi = q3 + 1.5 * (q3 - q1)
    return (
        df.where((F.col("price_out") < F.lit(lo)) | (F.col("price_out") > F.lit(hi)))
        .select("l_orderkey", "l_linenumber", "price_out")
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "d3b_outliers_zscore",
    oracle=with_lineitem_dirty(
        f", stats AS (SELECT {exact.davg_sql('price_out')} AS m, "
        f"{exact.dstddev_sql('price_out')} AS s FROM lineitem_dirty) "
        "SELECT l_orderkey, l_linenumber, ((price_out - m) / s) AS zscore "
        "FROM lineitem_dirty, stats "
        "WHERE ABS((price_out - m) / s) > 3.0 ORDER BY l_orderkey, l_linenumber"
    ),
    tags=("D3",),
)
def d3b_outliers_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 z-score variant with exact (order-independent) mean/stddev."""
    df = lineitem_dirty(spark, sf_dir)
    m, s = df.agg(exact.davg("price_out"), exact.dstddev("price_out")).first()
    z = (F.col("price_out") - F.lit(m)) / F.lit(s)
    return (
        df.where(F.abs(z) > 3.0)
        .select("l_orderkey", "l_linenumber", z.alias("zscore"))
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "d4_duplicate_rows",
    oracle=with_documents_dup(
        f"SELECT MD5({norm_text_sql('text')}) AS dup_key, COUNT(*) AS n_copies, "
        "MIN(doc_id) AS keep_doc_id FROM documents_dup "
        f"GROUP BY MD5({norm_text_sql('text')}) HAVING COUNT(*) > 1 "
        "ORDER BY dup_key"
    ),
    tags=("D4",),
)
def d4_duplicate_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4: exact-duplicate groups after text normalization (hash-groupBy:
    the dedup shuffle key is the 128-bit digest, not the document body —
    at 100 TB the shuffle carries 16 bytes + ids per row)."""
    docs = documents_dup(spark, sf_dir)
    key = F.md5(norm_text_col("text"))
    return (
        docs.groupBy(key.alias("dup_key"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min("doc_id").alias("keep_doc_id"))
        .where(F.col("n_copies") > 1)
        .orderBy("dup_key")
    )


@register(
    "d6_castability_report",
    oracle=with_lineitem_dirty(
        "SELECT COUNT(quantity_str) AS n_nonnull, "
        "CAST(SUM(CASE WHEN TRY_CAST(quantity_str AS DOUBLE) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ok_double, "
        "CAST(SUM(CASE WHEN TRY_CAST(quantity_str AS DATE) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ok_date, "
        "CAST(SUM(CASE WHEN TRY_CAST(quantity_str AS BOOLEAN) IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS ok_boolean "
        "FROM lineitem_dirty WHERE quantity_str IS NOT NULL"
    ),
    tags=("D6", "P8"),
)
def d6_castability_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6: schema-drift report — % of values castable per candidate type
    (drives the reference's 'convert column' suggestions [P])."""
    df = lineitem_dirty(spark, sf_dir).where(F.col("quantity_str").isNotNull())
    aggs = [F.count("quantity_str").alias("n_nonnull")]
    for typ in ("double", "date", "boolean"):
        ok = F.expr(f"TRY_CAST(quantity_str AS {typ.upper()})").isNotNull().cast("long")
        aggs.append(F.sum(ok).alias(f"ok_{typ}"))
    return df.agg(*aggs)
