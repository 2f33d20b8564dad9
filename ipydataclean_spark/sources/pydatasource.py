"""Custom Python DataSource (Spark 4.x datasource API) — S8.

A deterministic dirty-data generator registered as a first-class
`spark.read.format("dirtygen")` source: schema declaration, option
handling, and PARTITIONED reads (each InputPartition generates its own
id range, so the scan parallelizes like any file source — this is the
pattern for wrapping internal services/APIs as Spark sources at scale).

The DataSource classes are defined inside the registration factory so
cloudpickle serializes them BY VALUE — executors never need this
package importable (the engine's closure rule).

The generator rule is pure arithmetic on the row id, so the source has
a DuckDB oracle twin over generate_series — a custom source whose scan
is still hash-checkable end-to-end (s8_pyds_scan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.registry import register

# the dirt rule, shared (as SQL text) with the DuckDB oracle:
#   value: NULL every 97th id, ×1000 outlier every 101st, else id % 50
DIRT_RULE_SQL = (
    "CASE WHEN ({id} % 97) = 0 THEN NULL "
    "WHEN ({id} % 101) = 0 THEN 1000.0 * {id} "
    "ELSE CAST({id} % 50 AS DOUBLE) END"
)


def register_dirtygen(spark: SparkSession) -> None:
    """Register the ``dirtygen`` Python data source on this session —
    batch reads (partitioned) AND a micro-batch stream reader (offset =
    next unemitted id; ``chunk`` rows per batch), so the same generator
    rule feeds both engines' entry points."""
    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        InputPartition,
        SimpleDataSourceStreamReader,
    )

    def _gen_row(k: int):
        if k % 97 == 0:
            value = None
        elif k % 101 == 0:
            value = 1000.0 * k
        else:
            value = float(k % 50)
        return (k, value, f"g{k % 5}")

    class DirtyGenStreamReader(SimpleDataSourceStreamReader):
        def __init__(self, options):
            self.rows = int(options.get("rows", 1000))
            self.chunk = int(options.get("chunk", 250))

        def initialOffset(self):
            return {"next": 0}

        def read(self, start):
            lo = start["next"]
            hi = min(lo + self.chunk, self.rows)
            return iter([_gen_row(k) for k in range(lo, hi)]), {"next": hi}

        def readBetweenOffsets(self, start, end):
            return iter([_gen_row(k) for k in range(start["next"], end["next"])])

        def commit(self, end):
            pass

    class DirtyGenReader(DataSourceReader):
        def __init__(self, options):
            self.rows = int(options.get("rows", 1000))
            self.nparts = int(options.get("partitions", 8))

        def partitions(self):
            return [InputPartition(i) for i in range(self.nparts)]

        def read(self, partition):
            # contiguous id range per partition — a distributed scan,
            # not a driver-side generate-and-parallelize
            i = partition.value
            per = -(-self.rows // self.nparts)  # ceil
            for k in range(i * per, min((i + 1) * per, self.rows)):
                if k % 97 == 0:
                    value = None
                elif k % 101 == 0:
                    value = 1000.0 * k
                else:
                    value = float(k % 50)
                yield (k, value, f"g{k % 5}")

    class DirtyGenDataSource(DataSource):
        @classmethod
        def name(cls):
            return "dirtygen"

        def schema(self):
            return "id BIGINT, value DOUBLE, grp STRING"

        def reader(self, schema):
            return DirtyGenReader(self.options)

        def simpleStreamReader(self, schema):
            return DirtyGenStreamReader(self.options)

    spark.dataSource.register(DirtyGenDataSource)


@register(
    "s8_pyds_scan",
    oracle=(
        "SELECT CAST(g.generate_series AS BIGINT) AS id, "
        + DIRT_RULE_SQL.format(id="g.generate_series")
        + " AS value, 'g' || CAST(g.generate_series % 5 AS STRING) AS grp "
        "FROM generate_series(0, 1999) g ORDER BY id"
    ),
    tags=("S8",),
)
def s8_pyds_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8: scan through the custom Python data source (2000 rows, 8
    generator partitions). The oracle reproduces the same deterministic
    rule over generate_series, so even a from-scratch source stays
    value-hash-checked."""
    register_dirtygen(spark)
    df = (
        spark.read.format("dirtygen")
        .option("rows", "2000")
        .option("partitions", "8")
        .load()
    )
    return df.orderBy("id")


@register(
    "s8b_pyds_cleaned",
    oracle=(
        "WITH src AS (SELECT CAST(g.generate_series AS BIGINT) AS id, "
        + DIRT_RULE_SQL.format(id="g.generate_series")
        + " AS value, 'g' || CAST(g.generate_series % 5 AS STRING) AS grp "
        "FROM generate_series(0, 1999) g), "
        "m AS (SELECT QUANTILE_CONT(value, 0.5) AS med FROM src) "
        "SELECT grp, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(CAST(COALESCE(value, med) AS DECIMAL(28,6))) AS DOUBLE) AS total "
        "FROM src, m GROUP BY grp ORDER BY grp"
    ),
    tags=("S8", "C3"),
)
def s8b_pyds_cleaned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8b: the custom source composed with the cleaning engine —
    median-fill the generator's injected nulls (C3 two-phase), then a
    grouped rollup; proves a from-scratch source feeds the same
    operator pipeline as parquet."""
    from ipydataclean_spark.functions import exact
    from ipydataclean_spark.functions.quantiles import exact_median

    register_dirtygen(spark)
    src = (
        spark.read.format("dirtygen")
        .option("rows", "2000")
        .option("partitions", "8")
        .load()
    )
    med = exact_median(src, "value")
    filled = src.withColumn("value", F.coalesce(F.col("value"), F.lit(med)))
    return (
        filled.groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), exact.dsum("value").alias("total"))
        .orderBy("grp")
    )


_S9_ROLLUP_SQL = (
    "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(n_chars) AS BIGINT) AS total_chars, "
    "MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc "
    "FROM documents WHERE lang = 'en' GROUP BY source ORDER BY source"
)


@register(
    "s9_orc_roundtrip",
    oracle=_S9_ROLLUP_SQL,
    tags=("S9", "S5", "sources"),
)
def s9_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: ORC sink + source — documents written to ORC PARTITIONED BY
    lang, read back with a lang filter and rolled up. The oracle runs
    the same rollup on the original parquet, so the driver hash proves
    the ORC round-trip byte-lossless for every column it aggregates
    (ids, strings, counts) AND the partition column itself.

    Spark's ORC support is built-in (native vectorized reader); the
    lang predicate prunes to the one lang=en partition directory at
    the FILE LISTING level — same layout discipline as the parquet
    sink (S5). The write is an eager setup action at query-construction
    time (the tx*/l9j pattern); the returned rollup reads ONLY the orc
    files. DuckDB cannot read ORC, which is exactly why the twin runs
    on the parquet original: equality IS the round-trip proof."""
    from ipydataclean_spark.operators.qhelp import T, scratch_dir

    path = scratch_dir(spark, "s9_orc")
    T(spark, sf_dir, "documents").write.mode("overwrite").partitionBy(
        "lang"
    ).orc(path)
    back = spark.read.orc(path).where(F.col("lang") == "en")
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .orderBy("source")
    )


_S10_ORACLE = (
    # the oracle replays the CONSTRUCTION rule: every 13th doc's JSON
    # line was truncated (guaranteed malformed), the rest parse
    "WITH good AS (SELECT lang, n_chars FROM documents "
    "WHERE doc_id % 13 <> 0) "
    "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(n_chars) AS BIGINT) AS total_chars FROM good GROUP BY lang "
    "UNION ALL "
    "SELECT '__corrupt__' AS lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(0 AS BIGINT) AS total_chars FROM documents WHERE doc_id % 13 = 0 "
    "ORDER BY lang"
)


@register(
    "s10_json_corrupt_records",
    oracle=_S10_ORACLE,
    tags=("S10", "S3", "sources", "quality"),
)
def s10_json_corrupt_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10: JSONL ingestion with CORRUPT-RECORD handling — the
    robustness contract every real feed needs: malformed lines must
    neither kill the job (FAILFAST) nor vanish silently
    (DROPMALFORMED) but land in the _corrupt_record column for
    triage (PERMISSIVE). The fixture writes documents as JSON lines
    and TRUNCATES every 13th (always severing the closing brace),
    so the oracle knows exactly which rows must parse and which must
    surface as corrupt: the driver hash certifies the quarantine
    split, not just the happy path.

    Plan: the JSON scan itself carries the corrupt column (one pass,
    schema enforced — no inference job); good rows roll up per lang,
    corrupt rows count into one audit row. At scale PERMISSIVE is the
    only mode that keeps a 100 TB feed ingest running while preserving
    the evidence."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.operators.qhelp import T, scratch_dir

    path = scratch_dir(spark, "s10_jsonl")
    line = F.to_json(F.struct("doc_id", "lang", "n_chars"))
    (
        T(spark, sf_dir, "documents")
        .select(
            F.when(
                F.col("doc_id") % 13 == 0,
                F.substring(line, 1, F.length(line) - F.lit(5)),
            )
            .otherwise(line)
            .alias("value")
        )
        .write.mode("overwrite")
        .text(path)
    )
    raw = (
        spark.read.schema(
            "doc_id BIGINT, lang STRING, n_chars BIGINT, _bad STRING"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(path)
    )
    # Spark refuses queries whose ONLY referenced column is the
    # corrupt-record column (QUERY_ONLY_CORRUPT_RECORD_COLUMN);
    # cache() is the documented workaround — at scale the audit
    # naturally selects data columns alongside _bad in one pass anyway
    raw = raw.cache()
    good = (
        raw.where(F.col("_bad").isNull())
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )
    corrupt = raw.where(F.col("_bad").isNotNull()).agg(
        F.lit("__corrupt__").alias("lang"),
        F.count(F.lit(1)).alias("n_docs"),
        F.lit(0).cast("long").alias("total_chars"),
    )
    # Materialize the (tiny) rollup, then drop the cached scan so the
    # cached blocks don't accumulate for the session lifetime across a
    # full registry sweep (ADVICE r05) — same materialize-then-unpersist
    # pattern as llm_extra.cluster_pairs.
    out = good.unionByName(corrupt).orderBy("lang").localCheckpoint(eager=True)
    raw.unpersist()
    return out


_S11_ORACLE = (
    # batch 1 = docs without the later-added quality column; batch 2
    # carries it — the merged read must null-fill batch 1
    "WITH b1 AS (SELECT doc_id, lang, n_chars, NULL AS quality "
    "FROM documents WHERE doc_id % 2 = 0), "
    "b2 AS (SELECT doc_id, lang, n_chars, "
    "CAST(n_chars % 5 AS BIGINT) AS quality "
    "FROM documents WHERE doc_id % 2 = 1), "
    "u AS (SELECT * FROM b1 UNION ALL SELECT * FROM b2) "
    "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(COUNT(quality) AS BIGINT) AS n_with_quality, "
    "CAST(SUM(quality) AS BIGINT) AS total_quality "
    "FROM u GROUP BY lang ORDER BY lang"
)


@register(
    "s11_schema_evolution",
    oracle=_S11_ORACLE,
    tags=("S11", "S1", "S5", "sources"),
)
def s11_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S11: parquet SCHEMA EVOLUTION on read — a column added mid-feed
    (batch 2 gains ``quality``; batch 1 predates it) must surface as
    NULL for old files under ``mergeSchema``, never as a read error or
    a silently dropped column. This is the plain-parquet half of the
    evolution story (TxTable carries the transactional half): the
    oracle constructs the same two-batch union logically, so the
    driver hash certifies both the fill and the preserved values.

    Plan: two-file scan with footer-merge at planning time; the query
    itself is one grouped partial agg. At scale mergeSchema's footer
    sampling cost is why real feeds record the schema in a log
    (sources/txlog.py) — noted in the README limitations."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.operators.qhelp import T, scratch_dir

    path = scratch_dir(spark, "s11_evo")
    docs = T(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    docs.where(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(
        f"{path}/b1"
    )
    (
        docs.where(F.col("doc_id") % 2 == 1)
        .withColumn("quality", (F.col("n_chars") % 5).cast("long"))
        .write.mode("overwrite")
        .parquet(f"{path}/b2")
    )
    merged = spark.read.option("mergeSchema", "true").parquet(
        f"{path}/b1", f"{path}/b2"
    )
    return (
        merged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("quality").alias("n_with_quality"),
            F.sum("quality").cast("long").alias("total_quality"),
        )
        .orderBy("lang")
    )
