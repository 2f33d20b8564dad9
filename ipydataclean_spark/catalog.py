"""Fixture catalog: load driver-generated parquet tables, register views.

Tables (TESTDATA.md / FIXTURES.md): region nation customer supplier part
orders lineitem events documents embeddings. One parquet file per table
under ``{sf_dir}/{name}.parquet``.

Ingest policy (SURVEY.md §1.1.2): NaN is normalized to NULL so the
engine has a single missingness marker, matching the reference's
pandas-NaN semantics while keeping Spark's NULL algebra.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    FloatType,
    LongType,
    TimestampNTZType,
    TimestampType,
)

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Parquet scan (S1). Column pruning + predicate pushdown are free
    once downstream code uses select/filter — Catalyst pushes both into
    this scan (verify with .explain: PushedFilters / ReadSchema).

    events.parquet has stored ``ts`` as TIMESTAMP(NANOS) in some fixture
    generations (which Spark's vectorized reader rejects — read nanos as
    long and integer-divide, exactly DuckDB's truncation semantics) and
    as plain TIMESTAMP(MICROS) in others (arrives as TIMESTAMP_NTZ under
    Spark 4's NTZ inference). Dispatch on the observed type so either
    fixture vintage yields one canonical session-TZ TimestampType column.
    """
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(table_path(sf_dir, name))
        return normalize_events_ts(df)
    return spark.read.parquet(table_path(sf_dir, name))


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Canonicalize the events ``ts`` column to session-TZ TimestampType.

    LongType means the file was TIMESTAMP(NANOS) read via nanosAsLong;
    TIMESTAMP_NTZ means a micros file under NTZ inference (session TZ is
    UTC, so the cast preserves wall-clock values bit-for-bit).
    """
    ts_type = df.schema["ts"].dataType
    if isinstance(ts_type, LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(ts_type, TimestampNTZType):
        return df.withColumn("ts", F.col("ts").cast(TimestampType()))
    return df


def normalize_nan(df: DataFrame) -> DataFrame:
    """NaN -> NULL on every float/double column (engine ingest rule).

    The reference treats NaN as *the* missing marker [P]; Spark
    distinguishes NULL from NaN. One marker (NULL) keeps every
    downstream detector/cleaner single-pathed.
    """
    float_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, (DoubleType, FloatType))]
    if not float_cols:
        return df
    return df.withColumns(
        {c: F.when(F.isnan(F.col(c)), F.lit(None)).otherwise(F.col(c)) for c in float_cols}
    )


def load_catalog(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(
    spark: SparkSession,
    sf_dir: str | None = None,
    only: tuple[str, ...] | None = None,
) -> dict[str, DataFrame]:
    """Create one temp view per fixture table (the SQL entry point —
    SURVEY.md §3.2(2)). Returns the DataFrames as well.

    ``only`` restricts registration to the named tables — each view is
    a fresh read (file listing + footer), so a SQL-entry query that
    touches one table should not pay the 10-table setup cost on a cold
    session."""
    sf_dir = sf_dir or DEFAULT_SF_DIR
    if only is not None:
        dfs = {name: load_table(spark, sf_dir, name) for name in only}
        for name, df in dfs.items():
            df.createOrReplaceTempView(name)
        return dfs
    dfs = load_catalog(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
