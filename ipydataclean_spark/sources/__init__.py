"""Sources & sinks — SURVEY.md §2.1 (S1-S7).

S1 parquet scan lives in catalog.load_table; S6/S7 streaming source and
sink live in streaming/stream.py. Here: CSV/JSON readers (the
reference ingests via pandas.read_csv [P]) and the parquet sink with
scale-aware layout (partitioning + target file sizing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_csv(spark: SparkSession, path: str, header: bool = True, infer: bool = True) -> DataFrame:
    """S2: CSV ingest with schema inference (inference is a separate
    pass — at scale pass an explicit schema instead)."""
    return (
        spark.read.option("header", str(header).lower())
        .option("inferSchema", str(infer).lower())
        .csv(path)
    )


def read_json(spark: SparkSession, path: str) -> DataFrame:
    """S3: JSON-lines ingest."""
    return spark.read.json(path)


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S5: parquet sink. ``partition_by`` low-cardinality keys (date,
    lang) enables static + dynamic partition pruning for readers."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
