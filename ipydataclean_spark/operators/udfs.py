"""UDF / UDAF surface — SURVEY.md §2.10 (U1-U5).

Engine style rule: builtin expressions first (everything else in this
repo is JVM-side); these operators exist for kernels that genuinely
need Python. U1 is the documented slow path (row-at-a-time pickling);
U2/U4 are Arrow-batched; U3 is the per-group pandas pattern.

ALL worker-side functions are local closures — cloudpickle serializes
them by value, so executors never import this package (the driver may
run from any cwd; see multimodal.py for the incident this rule fixes).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StringType

from ipydataclean_spark.functions import exact
from ipydataclean_spark.operators.qhelp import T, lineitem_dirty, with_lineitem_dirty
from ipydataclean_spark.registry import register


@register(
    "u1_scalar_udf",
    oracle=(
        "SELECT c_custkey, UPPER(REVERSE(c_mktsegment)) AS rev_seg "
        "FROM customer WHERE c_custkey % 40 = 0 ORDER BY c_custkey"
    ),
    tags=("U1",),
)
def u1_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: row-at-a-time Python UDF — THE SLOW PATH (per-row pickling,
    no codegen). Exists for API completeness; everything it does here
    is expressible as builtins (which the oracle uses)."""

    @F.udf(returnType=StringType())
    def rev_upper(s: str) -> str:
        return s[::-1].upper() if s is not None else None

    df = T(spark, sf_dir, "customer").where(F.col("c_custkey") % 40 == 0)
    return df.select("c_custkey", rev_upper("c_mktsegment").alias("rev_seg")).orderBy("c_custkey")


@register(
    "u2_pandas_udf_zclamp",
    oracle=with_lineitem_dirty(
        f", stats AS (SELECT {exact.davg_sql('price_out')} AS m, "
        f"{exact.dstddev_sql('price_out')} AS s FROM lineitem_dirty) "
        "SELECT l_orderkey, l_linenumber, "
        "GREATEST(LEAST((price_out - m) / s, 3.0), -3.0) AS z_clamped "
        "FROM lineitem_dirty, stats WHERE l_orderkey % 30 = 0 "
        "ORDER BY l_orderkey, l_linenumber"
    ),
    tags=("U2",),
)
def u2_pandas_udf_zclamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: Arrow-batched vectorized scalar kernel (clamped z-score) —
    the pattern for numeric kernels exprs can't express; ~10-100×
    faster than U1 (whole numpy arrays per batch, no per-row boundary).
    Mean/std are two-phase scalars, broadcast as closure literals."""
    df = lineitem_dirty(spark, sf_dir)
    m, s = df.agg(exact.davg("price_out"), exact.dstddev("price_out")).first()

    @F.pandas_udf(DoubleType())
    def z_clamp(x: pd.Series) -> pd.Series:
        return ((x - m) / s).clip(-3.0, 3.0)

    return (
        df.where(F.col("l_orderkey") % 30 == 0)
        .select("l_orderkey", "l_linenumber", z_clamp("price_out").alias("z_clamped"))
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "u3_applyinpandas_groupfill",
    oracle=with_lineitem_dirty(
        ", filled AS (SELECT l_returnflag, "
        "COALESCE(qty_parsed, MEDIAN(qty_parsed) OVER (PARTITION BY l_returnflag)) AS q "
        "FROM lineitem_dirty) "
        "SELECT l_returnflag, COUNT(*) AS n, "
        f"{exact.dsum_sql('q')} AS sum_filled "
        "FROM filled GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("U3",),
)
def u3_applyinpandas_groupfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: grouped-map pandas — per-group cleaning (fill missing with
    the GROUP median, pandas semantics inside each group). One shuffle
    on the group key; each group must fit one executor's pandas frame —
    the documented constraint of this pattern at scale."""
    df = lineitem_dirty(spark, sf_dir).select("l_returnflag", "qty_parsed")

    def fill_group_median(pdf: pd.DataFrame) -> pd.DataFrame:
        med = pdf["qty_parsed"].median()  # sort-based: deterministic
        out = pdf.copy()
        out["qty_parsed"] = out["qty_parsed"].fillna(med)
        return out

    filled = df.groupBy("l_returnflag").applyInPandas(
        fill_group_median, schema="l_returnflag string, qty_parsed double"
    )
    return (
        filled.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), exact.dsum("qty_parsed").alias("sum_filled"))
        .orderBy("l_returnflag")
    )


@register(
    "u4_grouped_agg_mad",
    oracle=with_lineitem_dirty(
        "SELECT l_returnflag, MAD(qty_parsed) AS qty_mad "
        "FROM lineitem_dirty GROUP BY l_returnflag ORDER BY l_returnflag"
    ),
    tags=("U4",),
)
def u4_grouped_agg_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: grouped-agg pandas UDAF — exact median absolute deviation
    (the robust spread the reference's outlier rule is built on [P];
    not expressible as a single builtin aggregate)."""

    @F.pandas_udf(DoubleType())
    def mad(x: pd.Series) -> float:
        med = x.median()
        return (x - med).abs().median()

    df = lineitem_dirty(spark, sf_dir)
    return (
        df.groupBy("l_returnflag")
        .agg(mad("qty_parsed").alias("qty_mad"))
        .orderBy("l_returnflag")
    )


@register(
    "u7_pandas_iter_udf",
    oracle=(
        "SELECT doc_id, CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) "
        "AS n_tokens FROM documents ORDER BY doc_id"
    ),
    tags=("U7", "U2", "L10"),
)
def u7_pandas_iter_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U7: ITERATOR-form pandas UDF (Iterator[Series] -> Iterator[
    Series]) — the variant that amortizes expensive per-worker init
    (compiled regex here; a real tokenizer/model in production) across
    every Arrow batch of a partition instead of paying it per batch.
    The UDF is a local closure (executors never import this package)."""
    import re

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def n_tokens(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        pat = re.compile(r"[a-z0-9]+")  # init once per worker task
        for s in batches:
            yield s.map(lambda t: len(pat.findall(t.lower())) if t is not None else None)

    docs = T(spark, sf_dir, "documents")
    return docs.select("doc_id", n_tokens("text").alias("n_tokens")).orderBy("doc_id")


@register(
    "u8_map_in_arrow",
    oracle=(
        "SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes, "
        "CAST(length(text) AS BIGINT) AS n_codepoints "
        "FROM documents ORDER BY doc_id"
    ),
    tags=("U8", "U5"),
)
def u8_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U8: mapInArrow — the zero-copy batch boundary: the worker
    receives raw pyarrow RecordBatches (no pandas conversion at all)
    and answers with Arrow compute kernels. The right tier for
    byte-level work (hashing, binary feature extraction) where even
    the pandas bridge would cost a copy. Local closure."""

    def arrow_lengths(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column(batch.schema.get_field_index("text"))
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(batch.schema.get_field_index("doc_id")),
                    pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                ],
                names=["doc_id", "n_bytes", "n_codepoints"],
            )

    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(
        arrow_lengths, "doc_id LONG, n_bytes LONG, n_codepoints LONG"
    ).orderBy("doc_id")


@register(
    "u9_cogroup_asof",
    oracle=(
        "WITH probes AS (SELECT UNNEST(['2024-01-08 00:00:00', '2024-01-15 00:00:00', '2024-01-22 00:00:00']) AS p), "
        "probe_ts AS (SELECT CAST(p AS TIMESTAMP) AS probe_ts FROM probes), "
        "u AS (SELECT DISTINCT user_id FROM events) "
        "SELECT u.user_id, probe_ts, MAX(e.ts) AS last_ts, ARG_MAX(e.value, e.ts) AS last_value "
        "FROM u CROSS JOIN probe_ts "
        "LEFT JOIN events e ON e.user_id = u.user_id AND e.ts <= probe_ts "
        "GROUP BY u.user_id, probe_ts ORDER BY u.user_id, probe_ts"
    ),
    tags=("U9", "U5", "R9"),
)
def u9_cogroup_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U9: cogrouped applyInPandas — the missing cogroup corner of the
    UDF surface. Probes and events are cogrouped per user_id; each
    group pair runs pandas.merge_asof (backward), the pandas-native
    as-of kernel. Same semantics and oracle as r9_asof_join, which is
    the pure-JVM broadcast+argmax form — this variant is the template
    for per-key Python kernels that genuinely need BOTH sides of a
    keyed join in memory (model scoring against reference curves,
    per-entity calibration). Both sides shuffle once on user_id; group
    pairs stream through Arrow.

    NaN→NULL on the output value column mirrors the engine's ingest
    rule (catalog.normalize_nan): merge_asof emits NaN for probes with
    no preceding event, and the oracle's LEFT JOIN emits NULL.

    Round 13 (guide §4.1 "aggregate before you shuffle" applied to the
    GROUP grain): cogrouping per user_id invoked the Python kernel once
    per user — thousands of tiny Arrow⇄pandas group materializations
    dominated the 25 s sf0.1 wall. The cogroup key is now a
    deterministic user BUCKET (pmod(user_id, B)) and each group pair
    runs ONE ``merge_asof(..., by="user_id")`` — the pandas-native
    per-key as-of over the whole bucket, so the per-group overhead
    amortizes over ~B× more rows. Per-user results are identical:
    ``by=`` scopes the backward search to the user exactly as the
    per-user grouping did (and the fixture has no (user_id, ts) ties,
    so ordering within a bucket cannot matter — probed before the
    change). B scales with core count; bucket ids never reach the
    output, so the result is B-invariant."""
    ev = T(spark, sf_dir, "events").select("user_id", "ts", "value")
    probes = spark.createDataFrame(
        [("2024-01-08 00:00:00",), ("2024-01-15 00:00:00",), ("2024-01-22 00:00:00",)], ["p"]
    ).select(F.col("p").cast("timestamp").alias("probe_ts"))
    # separate scan for the probe grid: cogrouping two frames that share
    # one parent relation trips the ambiguous-self-join analyzer check
    users = T(spark, sf_dir, "events").select("user_id").distinct()
    grid = users.crossJoin(F.broadcast(probes))
    n_buckets = max(64, spark.sparkContext.defaultParallelism * 4)
    bucket = lambda c: F.pmod(F.col(c), F.lit(n_buckets))  # noqa: E731

    def asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        left = left.sort_values("probe_ts", kind="stable")
        right = right.sort_values("ts", kind="stable")
        out = pd.merge_asof(
            left, right[["user_id", "ts", "value"]],
            left_on="probe_ts", right_on="ts", by="user_id",
            direction="backward",
        )
        return out.rename(columns={"ts": "last_ts", "value": "last_value"})[
            ["user_id", "probe_ts", "last_ts", "last_value"]
        ]

    res = (
        grid.withColumn("__b", bucket("user_id"))
        .groupby("__b")
        .cogroup(ev.withColumn("__b", bucket("user_id")).groupby("__b"))
        .applyInPandas(
            asof,
            "user_id LONG, probe_ts TIMESTAMP, last_ts TIMESTAMP, last_value DOUBLE",
        )
    )
    v = F.col("last_value")
    return res.withColumn(
        "last_value", F.when(F.isnan(v), F.lit(None)).otherwise(v)
    ).orderBy("user_id", "probe_ts")


@register(
    "u10_arrow_udf",
    oracle=(
        "SELECT c_custkey, "
        "UPPER(REVERSE(c_mktsegment)) AS rev_seg, "
        "CAST(LENGTH(c_name) AS INTEGER) AS name_len "
        "FROM customer WHERE c_custkey % 40 = 0 ORDER BY c_custkey"
    ),
    tags=("U10", "U1"),
)
def u10_arrow_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U10: Arrow-optimized scalar Python UDF (useArrow=True) — same
    per-ROW Python semantics as u1 but the executor⇄Python transfer is
    Arrow-batched columnar instead of per-row pickling, the cheap
    migration step before a full pandas_udf rewrite (u2): flip a flag,
    keep the row function. Still not JVM-side — the oracle twin shows
    the builtin form Catalyst would codegen."""

    @F.udf(returnType=StringType(), useArrow=True)
    def rev_upper(s: str) -> str:
        return s[::-1].upper() if s is not None else None

    @F.udf(returnType="int", useArrow=True)
    def nlen(s: str) -> int:
        return len(s) if s is not None else None

    df = T(spark, sf_dir, "customer").where(F.col("c_custkey") % 40 == 0)
    return df.select(
        "c_custkey",
        rev_upper("c_mktsegment").alias("rev_seg"),
        nlen("c_name").alias("name_len"),
    ).orderBy("c_custkey")


@register(
    "u11_udtf_analyze",
    oracle=(
        "SELECT event_id, CAST(props->>'k' AS BIGINT) AS k, "
        "CAST(LENGTH(props) AS BIGINT) AS props_len "
        "FROM events WHERE event_id % 100 = 0 ORDER BY event_id"
    ),
    tags=("U11", "U5", "F-json"),
)
def u11_udtf_analyze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U11: POLYMORPHIC UDTF — the output schema is computed at plan
    time by the UDTF's static ``analyze()`` from a constant argument
    (the requested JSON keys), the Spark 4 table-function contract
    that lets one UDTF serve any key list with typed columns (the
    same mechanism backing SQL table functions with dynamic shapes).
    Here: extract integer keys from the props JSON payload plus a
    fixed metadata column; the oracle replays the extraction in SQL,
    so the analyze-time schema AND the row values are hash-checked."""
    import json as _json

    from pyspark.sql.functions import udtf
    from pyspark.sql.types import LongType, StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    @udtf
    class ExtractKeys:
        @staticmethod
        def analyze(ev_id: AnalyzeArgument, props: AnalyzeArgument,
                    keys: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType().add("event_id", LongType())
            for k in keys.value:
                schema = schema.add(k, LongType())
            schema = schema.add("props_len", LongType())
            return AnalyzeResult(schema=schema)

        def eval(self, ev_id, props, keys):  # noqa: ANN001
            try:
                d = _json.loads(props) if props is not None else {}
            except Exception:
                d = {}
            vals = tuple(
                int(d[k]) if isinstance(d.get(k), (int, float)) else None
                for k in keys
            )
            yield (ev_id, *vals, len(props) if props is not None else None)

    ev = T(spark, sf_dir, "events").where(F.col("event_id") % 100 == 0)
    return (
        ev.select("event_id", "props")
        .lateralJoin(
            ExtractKeys(
                F.col("event_id").outer(),
                F.col("props").outer(),
                F.lit(["k"]),
            )
        )
        .select(ev.event_id, F.col("k"), F.col("props_len"))
        .orderBy("event_id")
    )
