"""Scalar function surface — SURVEY.md §2.7.

One registered query per family (string / date-time / math /
conditional / array / json / hash), each exercising the builtin
functions the detectors/cleaners/queries depend on. Everything is
JVM-side whole-stage-codegen — no Python UDFs in any of these.

Cross-dialect notes (verified empirically):
  - DuckDB dayofweek() is 0=Sunday; Spark is 1=Sunday → oracle adds 1.
  - DuckDB date_trunc('month', ts) yields DATE → cast both sides.
  - libm-backed fns (exp/log) can differ by 1 ulp between JVM and C++
    → rounded to 8 decimals on both sides (a double never sits exactly
    on a half-boundary, so rounding is unambiguous).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register


@register(
    "f_string",
    oracle=(
        "SELECT c_custkey, LOWER(c_name) AS lower_name, UPPER(c_mktsegment) AS upper_seg, "
        "TRIM(CONCAT('  ', c_name, '  ')) AS trimmed, "
        "CAST(LENGTH(c_name) AS INTEGER) AS name_len, "
        "SUBSTR(c_name, 1, 8) AS name_prefix, "
        "CONCAT_WS('|', c_mktsegment, c_name) AS joined, "
        "LPAD(CAST(c_custkey AS STRING), 8, '0') AS padded_key, "
        "REPLACE(c_name, 'Customer', 'Cust') AS replaced, "
        "CAST(STRPOS(c_name, '#') AS INTEGER) AS hash_pos, "
        "REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS digits, "
        "CAST(LEVENSHTEIN(c_mktsegment, 'BUILDING') AS INTEGER) AS lev_build, "
        "TRANSLATE(c_mktsegment, 'AEIOU', 'aeiou') AS translated, "
        "REVERSE(c_mktsegment) AS reversed_seg, "
        "CASE WHEN c_name LIKE 'Customer%' THEN 1 ELSE 0 END AS starts_cust, "
        "CASE WHEN ENDS_WITH(c_name, '0') THEN 1 ELSE 0 END AS ends_zero, "
        "CASE WHEN CONTAINS(c_name, '42') THEN 1 ELSE 0 END AS has_42 "
        "FROM customer WHERE c_custkey % 10 = 0 ORDER BY c_custkey"
    ),
    tags=("F-string",),
)
def f_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (all builtin, codegen'd)."""
    df = T(spark, sf_dir, "customer").where(F.col("c_custkey") % 10 == 0)
    name, seg = F.col("c_name"), F.col("c_mktsegment")
    return df.select(
        "c_custkey",
        F.lower(name).alias("lower_name"),
        F.upper(seg).alias("upper_seg"),
        F.trim(F.concat(F.lit("  "), name, F.lit("  "))).alias("trimmed"),
        F.length(name).alias("name_len"),
        F.substring(name, 1, 8).alias("name_prefix"),
        F.concat_ws("|", seg, name).alias("joined"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded_key"),
        F.regexp_replace(name, "Customer", "Cust").alias("replaced"),
        F.instr(name, "#").alias("hash_pos"),
        F.regexp_extract(name, "([0-9]+)", 1).alias("digits"),
        F.levenshtein(seg, F.lit("BUILDING")).alias("lev_build"),
        F.translate(seg, "AEIOU", "aeiou").alias("translated"),
        F.reverse(seg).alias("reversed_seg"),
        name.like("Customer%").cast("int").alias("starts_cust"),
        name.endswith("0").cast("int").alias("ends_zero"),
        name.contains("42").cast("int").alias("has_42"),
    ).orderBy("c_custkey")


@register(
    "f_datetime",
    oracle=(
        "SELECT o_orderkey, "
        "CAST(YEAR(o_orderdate) AS INTEGER) AS yr, "
        "CAST(MONTH(o_orderdate) AS INTEGER) AS mo, "
        "CAST(DAYOFMONTH(o_orderdate) AS INTEGER) AS dom, "
        "CAST(DAYOFWEEK(o_orderdate) + 1 AS INTEGER) AS dow, "
        "CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start, "
        "CAST(o_orderdate AS DATE) + 30 AS due_date, "
        "CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002, "
        "LAST_DAY(CAST(o_orderdate AS DATE)) AS month_end, "
        "CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS epoch_s, "
        "CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3mo "
        "FROM orders WHERE o_orderkey % 20 = 0 ORDER BY o_orderkey"
    ),
    tags=("F-datetime",),
)
def f_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family."""
    df = T(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0)
    d = F.col("o_orderdate")
    return df.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.dayofweek(d).alias("dow"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.date_add(d.cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).alias("days_to_2002"),
        F.last_day(d.cast("date")).alias("month_end"),
        F.unix_timestamp(d).alias("epoch_s"),
        F.add_months(d, 3).cast("timestamp").alias("plus3mo"),
    ).orderBy("o_orderkey")


@register(
    "f_math",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "ABS(l_discount - 0.05) AS abs_dev, "
        "CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sign_dev, "
        "CAST(FLOOR(l_extendedprice / 1000) AS BIGINT) AS price_k_floor, "
        "CAST(CEIL(l_quantity / 10) AS BIGINT) AS qty_decile_ceil, "
        "SQRT(l_extendedprice) AS price_sqrt, "
        "l_quantity * l_quantity AS qty_sq, "
        "GREATEST(l_discount, l_tax) AS max_rate, "
        "LEAST(l_discount, l_tax) AS min_rate, "
        "ROUND(LOG10(l_extendedprice), 8) AS log10_price, "
        "ROUND(EXP(l_discount), 8) AS exp_disc, "
        "MOD(CAST(l_quantity AS BIGINT), 7) AS qty_mod7 "
        "FROM lineitem WHERE l_orderkey % 50 = 0 ORDER BY l_orderkey, l_linenumber"
    ),
    tags=("F-math",),
)
def f_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family (libm-backed fns rounded to 8 dp)."""
    df = T(spark, sf_dir, "lineitem").where(F.col("l_orderkey") % 50 == 0)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.abs(F.col("l_discount") - 0.05).alias("abs_dev"),
        F.signum(F.col("l_discount") - 0.05).alias("sign_dev"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_k_floor"),
        F.ceil(F.col("l_quantity") / 10).alias("qty_decile_ceil"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
        F.round(F.log10("l_extendedprice"), 8).alias("log10_price"),
        F.round(F.exp("l_discount"), 8).alias("exp_disc"),
        (F.col("l_quantity").cast("long") % 7).alias("qty_mod7"),
    ).orderBy("l_orderkey", "l_linenumber")


@register(
    "f_conditional",
    oracle=(
        "SELECT o_orderkey, "
        "CASE WHEN o_totalprice > 100000 THEN 'high' WHEN o_totalprice > 10000 THEN 'mid' ELSE 'low' END AS price_band, "
        "COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS status_or_open, "
        "IFNULL(NULLIF(o_orderpriority, o_orderpriority), 'same') AS always_same, "
        "CASE WHEN o_orderstatus = 'F' THEN o_totalprice END AS price_if_f "
        "FROM orders WHERE o_orderkey % 20 = 0 ORDER BY o_orderkey"
    ),
    tags=("F-conditional",),
)
def f_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/null-handling family (when/coalesce/nullif/ifnull)."""
    df = T(spark, sf_dir, "orders").where(F.col("o_orderkey") % 20 == 0)
    tp = F.col("o_totalprice")
    return df.select(
        "o_orderkey",
        F.when(tp > 100000, "high").when(tp > 10000, "mid").otherwise("low").alias("price_band"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias("status_or_open"),
        F.ifnull(F.nullif(F.col("o_orderpriority"), F.col("o_orderpriority")), F.lit("same")).alias("always_same"),
        F.when(F.col("o_orderstatus") == "F", tp).alias("price_if_f"),
    ).orderBy("o_orderkey")


@register(
    "f_array",
    oracle=(
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id % 9 = 0) "
        "SELECT doc_id, "
        "CAST(LEN(t) AS INTEGER) AS n_tokens, "
        "CAST(LEN(list_distinct(t)) AS INTEGER) AS n_distinct, "
        "CASE WHEN list_contains(t, 'spark') THEN 1 ELSE 0 END AS has_spark, "
        "array_to_string(list_sort(list_distinct(t))[1:3], '_') AS first3_sorted, "
        "array_to_string(t[1:5], '_') AS first5_joined, "
        "CAST(LEN(list_filter(t, x -> LENGTH(x) > 4)) AS INTEGER) AS n_long_tokens, "
        "CAST(list_sum(list_transform(t, x -> LENGTH(x))) AS BIGINT) AS total_chars, "
        "array_to_string(list_transform(range(1, 4), i -> i * 10), '_') AS tens "
        "FROM toks ORDER BY doc_id"
    ),
    tags=("F-array",),
)
def f_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function family: split/size/distinct/contains/slice/join/
    filter/transform/aggregate/sequence — all higher-order builtins.
    Array-valued results are array_join-ed to strings so the driver's
    pandas canonicalization can hash every output cell."""
    df = T(spark, sf_dir, "documents").where(F.col("doc_id") % 9 == 0)
    t = F.split(F.col("text"), " ")
    return df.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct"),
        F.array_contains(t, "spark").cast("int").alias("has_spark"),
        F.array_join(F.slice(F.array_sort(F.array_distinct(t)), 1, 3), "_").alias("first3_sorted"),
        F.array_join(F.slice(t, 1, 5), "_").alias("first5_joined"),
        F.size(F.filter(t, lambda x: F.length(x) > 4)).alias("n_long_tokens"),
        F.aggregate(
            F.transform(t, lambda x: F.length(x).cast("long")), F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("total_chars"),
        F.array_join(
            F.transform(F.sequence(F.lit(1), F.lit(3)), lambda i: (i * 10).cast("string")), "_"
        ).alias("tens"),
    ).orderBy("doc_id")


@register(
    "f_json",
    oracle=(
        "SELECT event_id, "
        "CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val, "
        "CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid "
        "FROM events WHERE event_id % 13 = 0 ORDER BY event_id"
    ),
    tags=("F-json", "S3"),
)
def f_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON family over events.props (S3 json-in-column ingestion):
    get_json_object + from_json schema projection."""
    df = T(spark, sf_dir, "events").where(F.col("event_id") % 13 == 0)
    parsed = F.from_json(F.col("props"), "k INT")
    return df.select(
        "event_id",
        F.get_json_object(F.col("props"), "$.k").cast("int").alias("k_val"),
        parsed.isNotNull().cast("int").alias("is_valid"),
    ).orderBy("event_id")


@register(
    "f_hash",
    oracle=(
        "SELECT c_custkey, MD5(c_name) AS name_md5, SHA256(c_name) AS name_sha256 "
        "FROM customer WHERE c_custkey % 25 = 0 ORDER BY c_custkey"
    ),
    tags=("F-hash",),
)
def f_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash family (md5 / sha2-256 — dedup keys, fingerprints)."""
    df = T(spark, sf_dir, "customer").where(F.col("c_custkey") % 25 == 0)
    return df.select(
        "c_custkey",
        F.md5("c_name").alias("name_md5"),
        F.sha2(F.col("c_name"), 256).alias("name_sha256"),
    ).orderBy("c_custkey")


@register(
    "s4_values_inline",
    oracle=(
        "SELECT CAST(id AS BIGINT) AS id, name, CAST(score AS DOUBLE) AS score "
        "FROM (VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5), (3, 'gamma', NULL)) "
        "AS t(id, name, score) ORDER BY id"
    ),
    tags=("S4",),
)
def s4_values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: in-memory rows (createDataFrame — the widget-preview path)."""
    from pyspark.sql.types import DoubleType, LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("name", StringType()),
            StructField("score", DoubleType()),
        ]
    )
    return spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", 2.5), (3, "gamma", None)], schema
    ).orderBy("id")


@register(
    "f_array2",
    oracle=(
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id % 11 = 0) "
        "SELECT doc_id, "
        "array_to_string(flatten([t[1:3], t[4:5]]), '_') AS flat_head, "
        "CAST(COALESCE(list_position(t, 'spark'), 0) AS BIGINT) AS spark_pos, "
        "array_to_string(list_filter(t, x -> x <> 'the'), '_') AS without_the, "
        "array_to_string(list_sort(list_distinct(t || ['zzz'])), '_') AS union_zzz, "
        "CASE WHEN len(list_filter(t, x -> LENGTH(x) > 6)) > 0 THEN 1 ELSE 0 END AS has_long, "
        "CASE WHEN len(list_filter(t, x -> LENGTH(x) >= 1)) = len(t) THEN 1 ELSE 0 END AS all_nonempty "
        "FROM toks ORDER BY doc_id"
    ),
    tags=("F-array",),
)
def f_array2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family 2: flatten, array_position, array_remove-style
    filter, union+sort, exists, forall. Array results flattened to
    joined strings for driver-harness hashability."""
    df = T(spark, sf_dir, "documents").where(F.col("doc_id") % 11 == 0)
    d = df.withColumn("t", F.split(F.col("text"), " "))
    t = F.col("t")
    return d.select(
        "doc_id",
        F.array_join(F.flatten(F.array(F.slice(t, 1, 3), F.slice(t, 4, 2))), "_").alias("flat_head"),
        F.array_position(t, "spark").alias("spark_pos"),
        F.array_join(F.filter(t, lambda x: x != "the"), "_").alias("without_the"),
        F.array_join(
            F.array_sort(F.array_distinct(F.concat(t, F.array(F.lit("zzz"))))), "_"
        ).alias("union_zzz"),
        F.exists(t, lambda x: F.length(x) > 6).cast("int").alias("has_long"),
        F.forall(t, lambda x: F.length(x) >= 1).cast("int").alias("all_nonempty"),
    ).orderBy("doc_id")


@register(
    "f_posexplode",
    oracle=(
        "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id % 83 = 0) "
        "SELECT doc_id, CAST(i - 1 AS INTEGER) AS pos, t[CAST(i AS INTEGER)] AS tok "
        "FROM toks, (SELECT UNNEST(range(1, 500)) AS i) WHERE i <= len(t) "
        "ORDER BY doc_id, pos"
    ),
    tags=("F-array",),
)
def f_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: token position index (ordinal-preserving explode)."""
    df = T(spark, sf_dir, "documents").where(F.col("doc_id") % 83 == 0)
    d = df.withColumn("t", F.split(F.col("text"), " "))
    return d.select("doc_id", F.posexplode("t").alias("pos", "tok")).orderBy("doc_id", "pos")


@register(
    "f_datetime2",
    oracle=(
        "SELECT o_orderkey, "
        "CAST(QUARTER(o_orderdate) AS INTEGER) AS qtr, "
        "CAST(WEEKOFYEAR(o_orderdate) AS INTEGER) AS iso_week, "
        "CAST(DAYOFYEAR(o_orderdate) AS INTEGER) AS doy, "
        "MAKE_DATE(CAST(YEAR(o_orderdate) AS INTEGER), CAST(MONTH(o_orderdate) AS INTEGER), 1) AS month_start_made, "
        "CAST(DATE_TRUNC('quarter', o_orderdate) AS DATE) AS quarter_start, "
        "CAST(CAST(o_orderdate AS DATE) - CAST(DATE_TRUNC('year', o_orderdate) AS DATE) AS INTEGER) AS days_into_year "
        "FROM orders WHERE o_orderkey % 40 = 0 ORDER BY o_orderkey"
    ),
    tags=("F-datetime",),
)
def f_datetime2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family 2: quarter, ISO week, day-of-year, make_date,
    quarter trunc, date arithmetic."""
    df = T(spark, sf_dir, "orders").where(F.col("o_orderkey") % 40 == 0)
    d = F.col("o_orderdate")
    return df.select(
        "o_orderkey",
        F.quarter(d).alias("qtr"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofyear(d).alias("doy"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("month_start_made"),
        F.date_trunc("quarter", d).cast("date").alias("quarter_start"),
        F.datediff(d.cast("date"), F.date_trunc("year", d).cast("date")).alias("days_into_year"),
    ).orderBy("o_orderkey")
