"""Scalar-function surface, part 2 — §2.7 families without clean DuckDB
twins (map functions, Spark-only string fns, approx aggregates).

Rows-only in the registry; exact semantics pinned by pytest
(tests/test_functions_extra.py) instead of the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register


@register("f_map_functions", oracle=None, tags=("F-map",))
def f_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map family: create_map / map_keys / map_values / element_at /
    map_concat / map_from_entries / explode over maps. Output flattened
    to sorted arrays (maps hash engine-specifically → rows-only)."""
    df = T(spark, sf_dir, "events").where(F.col("event_id") % 100 == 0)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    m2 = F.map_concat(m, F.create_map(F.lit("src"), F.lit("events")))
    entries = F.array_sort(F.map_entries(m2))
    # Driver contract: rows-only outputs must be SCALAR-typed — the
    # canonicalizer sorts/hashes with pandas, and array cells raise
    # "unhashable type: 'list'" (CORRECTNESS_r07). The sorted arrays
    # are therefore array_join'd to comma-strings (VERDICT r07 #1).
    return df.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m2)), ",").alias("keys_sorted"),
        F.element_at(m, F.lit("type")).alias("type_val"),
        F.array_join(F.transform(entries, lambda e: e.key), ",").alias("entry_keys"),
        F.array_join(F.transform(entries, lambda e: e.value), ",").alias("entry_values"),
        F.array_join(
            F.array_sort(F.map_keys(F.map_from_entries(entries))), ","
        ).alias("roundtrip_keys"),
        F.size(m2).alias("map_size"),
    ).orderBy("event_id")


@register("f_misc_string", oracle=None, tags=("F-string",))
def f_misc_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-only string fns (no DuckDB twin): initcap, soundex,
    format_string, overlay, repeat."""
    df = T(spark, sf_dir, "customer").where(F.col("c_custkey") % 100 == 0)
    return df.select(
        "c_custkey",
        F.initcap(F.lower("c_mktsegment")).alias("segment_title"),
        F.soundex("c_mktsegment").alias("segment_soundex"),
        F.format_string("cust-%05d [%s]", "c_custkey", "c_mktsegment").alias("formatted"),
        F.repeat(F.lit("ab"), 3).alias("repeated"),
        F.overlay(F.col("c_name"), F.lit("XXX"), 1, 3).alias("overlaid"),
    ).orderBy("c_custkey")


@register("p3b_approx_profile", oracle=None, tags=("P3", "P5", "approx"))
def p3b_approx_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB profiling path: HLL++ approx distinct + t-digest-style
    approx percentiles in ONE scan. Error-bound vs the exact twins is
    asserted in tests; rows-only in the registry (approx values are
    engine-specific by definition, SURVEY §2.2 P3/P5)."""
    df = T(spark, sf_dir, "lineitem")
    # One percentile sketch serves median + quartiles; the array output
    # is split into scalar columns because the driver's rows-only
    # canonicalizer cannot hash array cells (VERDICT r07 #1).
    agg = df.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_d_partkey"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_d_orderkey"),
        F.percentile_approx(
            "l_extendedprice", [0.25, 0.5, 0.75], 10000
        ).alias("_q"),
    )
    return agg.select(
        "approx_d_partkey",
        "approx_d_orderkey",
        F.element_at("_q", 2).alias("approx_med_price"),
        F.element_at("_q", 1).alias("approx_q25"),
        F.element_at("_q", 3).alias("approx_q75"),
    )


@register("f_hash_misc", oracle=None, tags=("F-hash",))
def f_hash_misc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash/ID family part 2 (engine-specific digests → rows-only):
    crc32, xxhash64, hash, monotonically_increasing_id, uuid.
    Uniqueness/determinism pinned in tests."""
    df = T(spark, sf_dir, "customer").where(F.col("c_custkey") % 100 == 0)
    return df.select(
        "c_custkey",
        F.crc32(F.col("c_name").cast("binary")).alias("name_crc32"),
        F.xxhash64("c_name").alias("name_xxh64"),
        F.hash("c_name", "c_mktsegment").alias("row_hash"),
        F.monotonically_increasing_id().alias("mono_id"),
        F.expr("uuid()").alias("row_uuid"),
    ).orderBy("c_custkey")


@register(
    "f_regexp",
    oracle=(
        "SELECT c_custkey, "
        "array_to_string(regexp_extract_all(c_name, '[0-9]+'), ',') AS all_digit_runs, "
        "regexp_matches(c_name, '0{3,}') AS has_zero_run, "
        "CAST(LEN(regexp_extract_all(c_name, '0')) AS INTEGER) AS n_zeros, "
        "regexp_extract(c_name, '([0-9]+)$', 1) AS trailing_digits, "
        "regexp_replace(c_name, '^Customer#0*', '', 'g') AS short_id "
        "FROM customer WHERE c_custkey % 100 = 0 ORDER BY c_custkey"
    ),
    tags=("F-regexp", "F"),
)
def f_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp family: extract-all (array of matches), rlike, match
    counting, anchored group extraction, and prefix stripping — the
    workhorses of string cleaning (C9/C17/D2 are built on these). All
    JVM-side codegen expressions; regexp_count maps to DuckDB's
    LEN(regexp_extract_all) twin."""
    df = T(spark, sf_dir, "customer").where(F.col("c_custkey") % 100 == 0)
    return df.select(
        "c_custkey",
        F.array_join(F.regexp_extract_all("c_name", F.lit("[0-9]+"), 0), ",").alias("all_digit_runs"),
        F.col("c_name").rlike("0{3,}").alias("has_zero_run"),
        F.regexp_count("c_name", F.lit("0")).cast("int").alias("n_zeros"),
        F.regexp_extract("c_name", "([0-9]+)$", 1).alias("trailing_digits"),
        F.regexp_replace("c_name", "^Customer#0*", "").alias("short_id"),
    ).orderBy("c_custkey")
