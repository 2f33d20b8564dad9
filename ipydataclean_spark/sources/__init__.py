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


def read_parquet_merged(spark: SparkSession, path: str) -> DataFrame:
    """S1b: parquet scan with schema merging — a dataset whose files
    were written under evolving schemas (columns added over time)
    reads as the union schema, older files yielding NULL for columns
    they predate. Merging reads every footer, so at 100 TB prefer a
    declared read schema; this is the discovery/backfill path."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def compact_parquet(
    spark: SparkSession, path: str, out_path: str, target_file_mb: int = 128
) -> int:
    """S5b: small-file compaction — rewrite a fragmented parquet
    dataset into ~``target_file_mb`` files. The small-files problem is
    THE silent killer of 100 TB scans (one task + one footer fetch per
    tiny file); streaming sinks and over-parallel writers create it
    constantly. Sizing comes from the dataset's actual bytes (driver
    sums file sizes — metadata only, no data read). Returns the number
    of output files."""
    import glob as _glob
    import os as _os

    total_bytes = sum(
        _os.path.getsize(f)
        for f in _glob.glob(_os.path.join(path, "**", "*.parquet"), recursive=True)
    )
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    # repartition(n) (round-robin) balances skewed input files; for a
    # sort-clustered layout compose with sketches.zorder_write instead.
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files
