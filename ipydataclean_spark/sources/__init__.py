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


def read_csv_tolerant(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> DataFrame:
    """S2b: corrupt-tolerant CSV ingest — PERMISSIVE mode with the
    raw offending line captured in ``_corrupt_record`` instead of
    failing the job (the 100 TB-crawl reality: a few malformed lines
    must not kill a 6-hour ingest). Split clean rows from the
    quarantine with ``split_quarantine`` (NOT a bare filter — Spark
    requires caching before the internal corrupt column can be
    queried alone). Requires an explicit schema (+ the
    _corrupt_record slot) — inference can't coexist with capture."""
    full = schema + ", _corrupt_record STRING"
    return (
        spark.read.schema(full)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )


def read_json_tolerant(spark: SparkSession, path: str, schema: str) -> DataFrame:
    """S3b: corrupt-tolerant JSON-lines ingest (same contract as
    read_csv_tolerant)."""
    full = schema + ", _corrupt_record STRING"
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )


def split_quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a tolerant read into (clean, quarantine). Spark refuses
    queries that reference ONLY the internal corrupt-record column of
    an uncached tolerant read ("cache the dataset first"), so this
    helper caches once and hands back both halves — use it instead of
    filtering `_corrupt_record` by hand. The caller unpersists when
    both halves are consumed (or lets it age out)."""
    from pyspark.sql import functions as F

    df = df.cache()
    clean = df.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.where(F.col("_corrupt_record").isNotNull())
    return clean, bad


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
    sums file sizes — metadata only, no data read). File sizes are
    resolved through the Hadoop FileSystem API, so any supported
    scheme (file://, hdfs://, s3a://) sizes correctly — os.path.getsize
    over a local glob would fail on remote stores. Returns the number
    of output files."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    total_bytes = 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        if st.getPath().getName().endswith(".parquet"):
            total_bytes += st.getLen()
    n_files = max(1, round(total_bytes / (target_file_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    # repartition(n) (round-robin) balances skewed input files; for a
    # sort-clustered layout compose with sketches.zorder_write instead.
    df.repartition(n_files).write.mode("overwrite").parquet(out_path)
    return n_files


def merge_into_parquet(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key: str,
    part: str,
) -> list:
    """S9/C18b: file-level MERGE (upsert) into a partitioned parquet
    dataset without a table format — the round-2 answer to the
    Delta/Iceberg gap (VERDICT r01 #5, container has no table-format
    libs).

    Semantics: ``MERGE INTO path USING updates ON key WHEN MATCHED
    UPDATE WHEN NOT MATCHED INSERT``, restricted at the FILE level to
    the partitions the updates actually touch:

      1. affected partitions = distinct ``part`` values in ``updates``
         (bounded driver pull — O(partitions), never O(rows));
      2. read ONLY those partitions of the target (static partition
         pruning — the scan never opens untouched files);
      3. full-outer merge on ``key`` (the c18 plan shape: one shuffle,
         or zero with a bucketed layout);
      4. dynamic-partition-overwrite write: Spark replaces exactly the
         partitions present in the merged output, leaving every other
         partition's files untouched on disk.

    REQUIREMENT: ``part`` must be stable under update (derive it from
    the immutable merge key, e.g. ``pmod(hash(key), n)``) — a merge
    that moves a row across partitions would leave the old copy behind.
    ``updates`` must carry columns ``u_<col>`` for every data column,
    plus ``part``. Returns the list of rewritten partition values."""
    from pyspark.sql import functions as F

    parts = sorted(r[0] for r in updates.select(part).distinct().collect())
    base = spark.read.parquet(path).where(F.col(part).isin(parts))
    u = updates
    data_cols = [c for c in base.columns if c != part]
    merged = base.join(u, u[f"u_{key}"] == base[key], "full_outer").select(
        *[F.coalesce(f"u_{c}", c).alias(c) for c in data_cols],
        F.coalesce(u[part], base[part]).alias(part),
    )
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(part).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return parts


def write_orc(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """S10: ORC sink — same layout rules as the parquet sink (ORC is
    the other columnar format a migrating warehouse hands you; Spark's
    native vectorized ORC reader gives it the same pushdown/pruning
    treatment as parquet)."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """S10: ORC scan. Predicate pushdown + column pruning reach the
    scan exactly as with parquet (assert PushedFilters in the plan)."""
    return spark.read.orc(path)


def read_text(spark: SparkSession, path: str, whole_file: bool = False) -> DataFrame:
    """S11: raw text ingest — one row per line (``value`` column), or
    one row per FILE with ``wholetext`` (the shape a document corpus
    lands in before chunking; pair with l13_chunk_udtf downstream).
    Line mode splits on newlines at block boundaries, so it
    parallelizes across and within large files."""
    return spark.read.text(path, wholetext=whole_file)
