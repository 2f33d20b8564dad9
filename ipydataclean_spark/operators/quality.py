"""Data-quality extensions beyond the reference's three problem kinds.

The reference detects missing / string-mismatch / outlier problems
[P]; production cleaning at 100 TB needs the adjacent checks every
data-quality system (Deequ, GE) ships: multi-format date parsing,
unit standardization, MAD-robust outliers, constraint suites, and
distribution-drift detection between slices. Each op here is a pure
DataFrame fn with a DuckDB oracle twin, designed as one scan (or one
scan + a tiny scalar job) so the cost model holds at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.functions.quantiles import exact_quantiles
from ipydataclean_spark.operators.qhelp import T, lineitem_dirty, with_lineitem_dirty
from ipydataclean_spark.registry import register

# ---------------------------------------------------------------------------
# C19: multi-format date parsing
# ---------------------------------------------------------------------------

# Deterministic dirty date strings in the Spark∩DuckDB SQL dialect
# (dirty.py rules): ISO / dd/MM/yyyy / compact yyyyMMdd / junk.
_Y = "CAST(YEAR(o_orderdate) AS STRING)"
_M = "LPAD(CAST(MONTH(o_orderdate) AS STRING), 2, '0')"
_D = "LPAD(CAST(DAY(o_orderdate) AS STRING), 2, '0')"
DATE_STR = (
    "CASE WHEN o_orderkey % 37 = 0 THEN 'not a date' "
    f"WHEN o_orderkey % 3 = 0 THEN CONCAT({_D}, '/', {_M}, '/', {_Y}) "
    f"WHEN o_orderkey % 3 = 1 THEN CONCAT({_Y}, {_M}, {_D}) "
    f"ELSE CONCAT({_Y}, '-', {_M}, '-', {_D}) END"
)


@register(
    "c19_parse_dates_multi",
    oracle=(
        f"WITH d AS (SELECT o_orderkey, {DATE_STR} AS date_str FROM orders) "
        "SELECT o_orderkey, date_str, CAST(COALESCE("
        "try_strptime(date_str, '%Y-%m-%d'), "
        "try_strptime(date_str, '%d/%m/%Y'), "
        "try_strptime(date_str, '%Y%m%d')) AS DATE) AS parsed_date "
        "FROM d ORDER BY o_orderkey"
    ),
    tags=("C19", "C9"),
)
def c19_parse_dates_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C19: coerce a multi-format date-string column to DATE by trying
    an ordered list of formats; unparseable -> NULL (then the D1/C1
    missing pipeline applies). One scan; the format cascade is a
    COALESCE of try_to_timestamp exprs inside codegen — no UDF."""
    from ipydataclean_spark.operators.featprep import parse_dates

    d = T(spark, sf_dir, "orders").select(
        "o_orderkey", F.expr(DATE_STR).alias("date_str")
    )
    return (
        parse_dates(d, "date_str", ["yyyy-MM-dd", "dd/MM/yyyy", "yyyyMMdd"], "parsed_date")
        .select("o_orderkey", "date_str", "parsed_date")
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# C20: unit standardization
# ---------------------------------------------------------------------------

WEIGHT_STR = (
    "CASE WHEN l_orderkey % 4 = 0 THEN CONCAT(CAST(l_quantity AS STRING), ' kg') "
    "WHEN l_orderkey % 4 = 1 THEN CONCAT(CAST(l_quantity * 1000 AS STRING), ' g') "
    "WHEN l_orderkey % 4 = 2 THEN CONCAT(CAST(l_quantity AS STRING), 'kg') "
    "ELSE CAST(l_quantity AS STRING) END"
)


@register(
    "c20_standardize_units",
    oracle=(
        f"WITH w AS (SELECT l_orderkey, l_linenumber, {WEIGHT_STR} AS weight_str FROM lineitem) "
        "SELECT l_orderkey, l_linenumber, "
        "TRY_CAST(regexp_extract(weight_str, '^([0-9.]+)', 1) AS DOUBLE) * "
        "(CASE WHEN regexp_extract(weight_str, '([a-z]+)$', 1) = 'g' THEN 0.001 ELSE 1.0 END) "
        "AS weight_kg FROM w ORDER BY l_orderkey, l_linenumber"
    ),
    tags=("C20", "C9"),
)
def c20_standardize_units(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C20: normalize a value+unit string column ('23.0 kg', '500 g',
    '23.0kg') to one numeric unit. regexp_extract splits magnitude and
    unit; a CASE applies the conversion factor — all codegen exprs,
    identical no-match→'' semantics in both engines."""
    from ipydataclean_spark.operators.featprep import standardize_units

    w = T(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", F.expr(WEIGHT_STR).alias("weight_str")
    )
    return (
        standardize_units(w, "weight_str", {"g": 0.001, "kg": 1.0}, "weight_kg")
        .select("l_orderkey", "l_linenumber", "weight_kg")
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# D3c: MAD-robust outliers (modified z-score, Iglewicz–Hoaglin)
# ---------------------------------------------------------------------------


@register(
    "d3c_outliers_mad",
    oracle=with_lineitem_dirty(
        ", med AS (SELECT QUANTILE_CONT(price_out, 0.5) AS m FROM lineitem_dirty), "
        "mad AS (SELECT QUANTILE_CONT(ABS(price_out - m), 0.5) AS d FROM lineitem_dirty, med) "
        "SELECT l_orderkey, l_linenumber, price_out FROM lineitem_dirty, med, mad "
        "WHERE ABS(0.6745 * (price_out - m) / d) > 3.5 "
        "ORDER BY l_orderkey, l_linenumber"
    ),
    tags=("D3",),
)
def d3c_outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 MAD variant: modified z-score 0.6745·(x−med)/MAD > 3.5.
    Median and MAD via exact_quantiles (histogram refinement — codegen
    scans, O(1) executor memory); two tiny scalar jobs, then one
    pushdown-friendly filter scan."""
    df = lineitem_dirty(spark, sf_dir)
    (m,) = exact_quantiles(df, "price_out", [0.5])
    dev = df.withColumn("absdev", F.abs(F.col("price_out") - F.lit(m)))
    (d,) = exact_quantiles(dev, "absdev", [0.5])
    z = F.lit(0.6745) * (F.col("price_out") - F.lit(m)) / F.lit(d)
    return (
        df.where(F.abs(z) > 3.5)
        .select("l_orderkey", "l_linenumber", "price_out")
        .orderBy("l_orderkey", "l_linenumber")
    )


# ---------------------------------------------------------------------------
# P13: constraint suite (Deequ-style checks, ONE scan)
# ---------------------------------------------------------------------------


@register(
    "p13_constraint_suite",
    oracle=(
        "SELECT COUNT(*) AS n_rows, "
        "COUNT(o_totalprice) AS n_totalprice, "
        "COUNT(DISTINCT o_orderkey) AS n_distinct_orderkey, "
        "(COUNT(DISTINCT o_orderkey) = COUNT(*)) AS orderkey_unique, "
        "MIN(o_totalprice) AS min_totalprice, MAX(o_totalprice) AS max_totalprice, "
        "(MIN(o_totalprice) >= 0.0) AS totalprice_nonneg, "
        "CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END) AS BIGINT) AS n_status_valid, "
        "CAST(SUM(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS BIGINT) AS n_priority_wellformed "
        "FROM orders"
    ),
    tags=("P13", "P10"),
)
def p13_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P13: a Deequ-style constraint suite — completeness, uniqueness,
    range, set-membership, and format checks — computed in ONE
    aggregate over one scan (the 100 TB profiling rule, §4.3.1)."""
    o = T(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("o_totalprice").alias("n_totalprice"),
        F.countDistinct("o_orderkey").alias("n_distinct_orderkey"),
        (F.countDistinct("o_orderkey") == F.count(F.lit(1))).alias("orderkey_unique"),
        F.min("o_totalprice").alias("min_totalprice"),
        F.max("o_totalprice").alias("max_totalprice"),
        (F.min("o_totalprice") >= F.lit(0.0)).alias("totalprice_nonneg"),
        F.sum(F.col("o_orderstatus").isin("O", "F", "P").cast("long")).alias(
            "n_status_valid"
        ),
        F.sum(F.col("o_orderpriority").rlike("^[1-5]-").cast("long")).alias(
            "n_priority_wellformed"
        ),
    )


# ---------------------------------------------------------------------------
# D7: distribution drift between two slices (two-sample KS statistic)
# ---------------------------------------------------------------------------


_KS_BINS = 2048


@register(
    "d7_drift_ks",
    oracle=(
        "WITH s AS (SELECT o_totalprice AS x, "
        "CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS g FROM orders), "
        "bounds AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM s), "
        f"b AS (SELECT CAST(LEAST(FLOOR((x - lo) / ((hi - lo) / {_KS_BINS}.0)), {_KS_BINS - 1}) AS BIGINT) AS bucket, "
        "CAST(SUM(g) AS BIGINT) AS c1, CAST(SUM(1 - g) AS BIGINT) AS c2 FROM s, bounds GROUP BY 1), "
        "t AS (SELECT CAST(SUM(c1) AS DOUBLE) AS n1, CAST(SUM(c2) AS DOUBLE) AS n2 FROM b), "
        "cum AS (SELECT CAST(SUM(c1) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS f1, "
        "CAST(SUM(c2) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS f2 FROM b) "
        "SELECT MAX(ABS(f1 / n1 - f2 / n2)) AS ks_stat FROM cum, t"
    ),
    tags=("D7",),
)
def d7_drift_ks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7: two-sample Kolmogorov–Smirnov statistic between two slices
    of a column — drift detection for pipeline monitoring.

    Binned form (the default, per VERDICT r01 #2): x is bucketed into
    equi-width bins via the P7 two-phase pattern (scalar min/max, then
    one partial-agg shuffle to per-bin counts), and the CDF difference
    is evaluated at bin edges. The cumulative counts come from a
    broadcast triangular self-join over the <= _KS_BINS-row bin table
    (bb.bucket <= a.bucket), so there is NO global-order window
    anywhere in the plan — the old Window.orderBy(x) form funneled
    |distinct x| rows through one partition, which for a near-continuous
    column is the whole table. Binning bounds the KS error by the max
    bin mass (<= ~1/_KS_BINS for smooth data); the oracle bins
    identically so the comparison is exact."""
    o = T(spark, sf_dir, "orders")
    s = o.select(
        F.col("o_totalprice").alias("x"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(1)).otherwise(F.lit(0)).alias("g"),
    )
    lo, hi = s.agg(F.min("x"), F.max("x")).first()
    width = (hi - lo) / float(_KS_BINS)
    bucket = F.least(
        F.floor((F.col("x") - F.lit(lo)) / F.lit(width)), F.lit(_KS_BINS - 1)
    ).cast("long")
    b = s.groupBy(bucket.alias("bucket")).agg(
        F.sum("g").cast("long").alias("c1"),
        F.sum(F.lit(1) - F.col("g")).cast("long").alias("c2"),
    )
    n1, n2 = b.agg(
        F.sum("c1").cast("double"), F.sum("c2").cast("double")
    ).first()
    bb = b.select(
        F.col("bucket").alias("bb_bucket"),
        F.col("c1").alias("bb_c1"),
        F.col("c2").alias("bb_c2"),
    )
    cum = (
        b.join(F.broadcast(bb), F.col("bb_bucket") <= F.col("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum("bb_c1").cast("double").alias("f1"),
            F.sum("bb_c2").cast("double").alias("f2"),
        )
    )
    return cum.agg(
        F.max(F.abs(F.col("f1") / F.lit(n1) - F.col("f2") / F.lit(n2))).alias("ks_stat")
    )


# ---------------------------------------------------------------------------
# D8: pattern-validity profile over a dirty string column
# ---------------------------------------------------------------------------


@register(
    "d8_pattern_validity",
    oracle=with_lineitem_dirty(
        "SELECT CAST(SUM(CASE WHEN quantity_str IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null, "
        "CAST(SUM(CASE WHEN regexp_matches(quantity_str, '^[0-9]+(\\.[0-9]+)?$') THEN 1 ELSE 0 END) AS BIGINT) AS n_numeric, "
        "CAST(SUM(CASE WHEN regexp_matches(quantity_str, '^[0-9.]+ ?[a-z]+$') THEN 1 ELSE 0 END) AS BIGINT) AS n_with_unit, "
        "CAST(SUM(CASE WHEN quantity_str = 'N/A' THEN 1 ELSE 0 END) AS BIGINT) AS n_na_marker "
        "FROM lineitem_dirty"
    ),
    tags=("D8", "D2"),
)
def d8_pattern_validity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8: classify a dirty string column's values by shape (clean
    numeric / numeric+unit / NA marker / null) in one scan — the
    profile that drives which C9/C10/C20 fix to suggest."""
    df = lineitem_dirty(spark, sf_dir)
    q = F.col("quantity_str")
    return df.agg(
        F.sum(q.isNull().cast("long")).alias("n_null"),
        F.sum(q.rlike(r"^[0-9]+(\.[0-9]+)?$").cast("long")).alias("n_numeric"),
        F.sum(q.rlike(r"^[0-9.]+ ?[a-z]+$").cast("long")).alias("n_with_unit"),
        F.sum((q == "N/A").cast("long")).alias("n_na_marker"),
    )


# ---------------------------------------------------------------------------
# D9: rolling-window anomaly detection (per-key online z-score)
# ---------------------------------------------------------------------------

_ROLL = "ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING"


@register(
    "d9_rolling_anomaly",
    oracle=(
        "WITH w AS (SELECT event_id, user_id, value, "
        f"CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id {_ROLL}) AS DOUBLE) AS s, "
        f"CAST(SUM(CAST(value * value AS DECIMAL(28,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id {_ROLL}) AS DOUBLE) AS sq, "
        f"CAST(COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id {_ROLL}) AS DOUBLE) AS n "
        "FROM events), "
        "z AS (SELECT event_id, user_id, value, "
        "(value - s / n) / SQRT((sq - s * s / n) / (n - 1.0)) AS zscore, n, "
        "SQRT((sq - s * s / n) / (n - 1.0)) AS sd FROM w WHERE n >= 10) "
        "SELECT event_id, user_id, value, zscore FROM z "
        "WHERE sd > 0 AND ABS(zscore) > 2.5 ORDER BY event_id"
    ),
    tags=("D9", "D3", "W4"),
)
def d9_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9: per-user rolling z-score anomaly flagging — the value is
    compared against the PRECEDING 20 events only (no lookahead), the
    batch twin of an online detector (streaming form: ST6 stateful
    op). Rolling mean/std come from decimal-exact sum/sumsq window
    frames so both engines compute identical doubles; keyed windows,
    no global funnel."""
    ev = T(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-20, -1)
    )
    v = F.col("value")
    s = F.sum(v.cast("decimal(28,6)")).over(w).cast("double")
    sq = F.sum((v * v).cast("decimal(28,6)")).over(w).cast("double")
    n = F.count(v).over(w).cast("double")
    base = ev.select(
        "event_id", "user_id", "value", s.alias("s"), sq.alias("sq"), n.alias("n")
    ).where(F.col("n") >= 10)
    sd = F.sqrt((F.col("sq") - F.col("s") * F.col("s") / F.col("n")) / (F.col("n") - F.lit(1.0)))
    z = (F.col("value") - F.col("s") / F.col("n")) / sd
    return (
        base.select("event_id", "user_id", "value", z.alias("zscore"), sd.alias("sd"))
        .where((F.col("sd") > 0) & (F.abs(F.col("zscore")) > 2.5))
        .select("event_id", "user_id", "value", "zscore")
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# P16: referential-integrity audit (FK orphan counts)
# ---------------------------------------------------------------------------


@register(
    "p16_fk_integrity",
    oracle=(
        "SELECT "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM orders o WHERE NOT EXISTS "
        "(SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS orphan_orders, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l WHERE NOT EXISTS "
        "(SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)) AS orphan_lineitems, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM customer c WHERE NOT EXISTS "
        "(SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)) AS orphan_customers"
    ),
    tags=("P16", "R5"),
)
def p16_fk_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P16: referential-integrity audit — orphan counts per FK edge via
    left-anti joins (broadcast dims where small). The constraint-suite
    (p13) companion for multi-table catalogs; at 100 TB each check is
    one anti-join whose build side is the (smaller) referenced key
    set."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    li = T(spark, sf_dir, "lineitem")
    n = T(spark, sf_dir, "nation")
    orphan_orders = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_orders"))
    )
    orphan_lineitems = (
        li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_lineitems"))
    )
    orphan_customers = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey, "left_anti")
        .agg(F.count(F.lit(1)).alias("orphan_customers"))
    )
    return orphan_orders.crossJoin(orphan_lineitems).crossJoin(orphan_customers)


# ---------------------------------------------------------------------------
# P17: Benford first-digit profile
# ---------------------------------------------------------------------------

# expected Benford frequencies, precomputed ONCE in Python and injected
# as identical literals into both engines (log10 at query time would
# hit each engine's libm and can differ in the last ulp).
_BENFORD = {d: __import__("math").log10(1 + 1 / d) for d in range(1, 10)}
_BENFORD_CASE = (
    "CASE first_digit "
    + " ".join(f"WHEN '{d}' THEN {f!r}" for d, f in _BENFORD.items())
    + " END"
)


@register(
    "p17_benford_profile",
    oracle=(
        "WITH d AS (SELECT regexp_extract(CAST(o_totalprice AS STRING), '[1-9]') AS first_digit "
        "FROM orders WHERE o_totalprice > 0), "
        "c AS (SELECT first_digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY first_digit), "
        "t AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM c) "
        "SELECT first_digit, n, n / total AS observed, "
        f"CAST({_BENFORD_CASE} AS DOUBLE) AS expected, "
        f"n / total - CAST({_BENFORD_CASE} AS DOUBLE) AS deviation "
        "FROM c, t ORDER BY first_digit"
    ),
    tags=("P17", "P7"),
)
def p17_benford_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P17: Benford's-law first-significant-digit profile — the fraud /
    data-fabrication smoke test. The digit comes from the decimal
    string form (regexp, identical in both engines — no per-row log10,
    whose libm rounding differs across engines); expected frequencies
    are Python-precomputed literals. One scan + 9-row agg."""
    o = T(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    d = o.select(
        F.regexp_extract(F.col("o_totalprice").cast("string"), "[1-9]", 0).alias(
            "first_digit"
        )
    )
    c = d.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n"))
    total = float(c.agg(F.sum("n")).first()[0])
    expected = F.lit(None).cast("double")
    for digit, freq in reversed(_BENFORD.items()):
        expected = F.when(F.col("first_digit") == str(digit), F.lit(freq)).otherwise(
            expected
        )
    obs = F.col("n") / F.lit(total)
    return c.select(
        "first_digit",
        "n",
        obs.alias("observed"),
        expected.alias("expected"),
        (obs - expected).alias("deviation"),
    ).orderBy("first_digit")


# ---------------------------------------------------------------------------
# P19: missingness-pattern analysis (multi-column null co-occurrence)
# ---------------------------------------------------------------------------


@register(
    "p19_missingness_patterns",
    oracle=with_lineitem_dirty(
        "SELECT CONCAT(CASE WHEN quantity_str IS NULL THEN '1' ELSE '0' END, "
        "CASE WHEN qty_parsed IS NULL THEN '1' ELSE '0' END) AS pattern, "
        "CAST(COUNT(*) AS BIGINT) AS n_rows "
        "FROM lineitem_dirty GROUP BY pattern ORDER BY pattern"
    ),
    tags=("P19", "P2", "D1"),
)
def p19_missingness_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P19: missingness co-occurrence patterns (the md.pattern view):
    each row maps to its null-indicator bitstring across the audited
    columns; pattern counts reveal STRUCTURED missingness ('01' here =
    raw string present but unparseable — fix with C9/C10, not a fill).
    One scan, one tiny agg, any column count."""
    df = lineitem_dirty(spark, sf_dir)
    pattern = F.concat(
        *[
            F.when(F.col(c).isNull(), "1").otherwise("0")
            for c in ("quantity_str", "qty_parsed")
        ]
    )
    return (
        df.groupBy(pattern.alias("pattern"))
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .orderBy("pattern")
    )


# ---------------------------------------------------------------------------
# C26: rank (quantile) normalization
# ---------------------------------------------------------------------------


@register(
    "c26_rank_normalize",
    oracle=(
        "SELECT l_orderkey, l_linenumber, "
        "percent_rank() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS price_pct "
        "FROM lineitem ORDER BY l_orderkey, l_linenumber, price_pct"
    ),
    tags=("C26", "W1", "C24"),
)
def c26_rank_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C26: rank-normalize a column to [0, 1] within each group
    (percent_rank — ties share a rank, so it's deterministic). The
    distribution-free cousin of z-scoring (C24): heavy tails and
    outliers can't dominate. Keyed window; at scale an ungrouped
    version should go through the P7 histogram CDF instead of a
    global-order window."""
    li = T(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_returnflag").orderBy("l_extendedprice")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.percent_rank().over(w).alias("price_pct"),
    ).orderBy("l_orderkey", "l_linenumber", "price_pct")


# ---------------------------------------------------------------------------
# D10: snapshot diff — per-key change audit between two table versions
# ---------------------------------------------------------------------------


@register(
    "d10_snapshot_diff",
    oracle=(
        "WITH new_snap AS ("
        "SELECT o_orderkey, "
        "CASE WHEN o_orderkey % 23 = 0 THEN o_totalprice * 1.05 ELSE o_totalprice END AS o_totalprice, "
        "o_orderstatus FROM orders WHERE o_orderkey % 31 <> 0 "
        "UNION ALL "
        "SELECT o_orderkey + 20000000, o_totalprice, 'N' FROM orders WHERE o_orderkey % 37 = 0) "
        "SELECT CASE WHEN o.o_orderkey IS NULL THEN 'added' "
        "WHEN n.o_orderkey IS NULL THEN 'removed' "
        "WHEN o.o_totalprice <> n.o_totalprice OR o.o_orderstatus <> n.o_orderstatus THEN 'changed' "
        "ELSE 'same' END AS status, COUNT(*) AS n "
        "FROM orders o FULL JOIN new_snap n ON n.o_orderkey = o.o_orderkey "
        "GROUP BY 1 ORDER BY status"
    ),
    tags=("D10", "D7"),
)
def d10_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D10: per-key diff between two snapshots of a table — the audit a
    pipeline runs after every incremental load (what changed, what was
    added, what disappeared). One full-outer join on the key; the
    classification is plain column comparison, so at scale it is a
    single co-partitionable shuffle (zero with a bucketed layout) and
    the aggregate is map-side partial. The 'new' snapshot here is a
    deterministic CTE over orders (reprice %23, drop %31, insert %37
    shifted) so the oracle reproduces it exactly."""
    orders = T(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    new_snap = orders.where(F.col("o_orderkey") % 31 != 0).select(
        F.col("o_orderkey").alias("n_orderkey"),
        F.when(F.col("o_orderkey") % 23 == 0, F.col("o_totalprice") * F.lit(1.05))
        .otherwise(F.col("o_totalprice"))
        .alias("n_totalprice"),
        F.col("o_orderstatus").alias("n_orderstatus"),
    ).unionByName(
        orders.where(F.col("o_orderkey") % 37 == 0).select(
            (F.col("o_orderkey") + 20000000).alias("n_orderkey"),
            F.col("o_totalprice").alias("n_totalprice"),
            F.lit("N").alias("n_orderstatus"),
        )
    )
    joined = orders.join(
        new_snap, new_snap.n_orderkey == orders.o_orderkey, "full_outer"
    )
    status = (
        F.when(F.col("o_orderkey").isNull(), "added")
        .when(F.col("n_orderkey").isNull(), "removed")
        .when(
            (F.col("o_totalprice") != F.col("n_totalprice"))
            | (F.col("o_orderstatus") != F.col("n_orderstatus")),
            "changed",
        )
        .otherwise("same")
    )
    return (
        joined.groupBy(status.alias("status"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("status")
    )


@register(
    "d11_drift_psi",
    oracle=(
        "WITH s AS (SELECT o_totalprice AS x, "
        "CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END AS g FROM orders), "
        "bounds AS (SELECT MIN(x) AS lo, MAX(x) AS hi FROM s), "
        f"b AS (SELECT CAST(LEAST(FLOOR((x - lo) / ((hi - lo) / {_KS_BINS}.0)), {_KS_BINS - 1}) AS BIGINT) AS bucket, "
        "CAST(SUM(g) AS BIGINT) AS c1, CAST(SUM(1 - g) AS BIGINT) AS c2 FROM s, bounds GROUP BY 1), "
        "t AS (SELECT CAST(SUM(c1) AS DOUBLE) AS n1, CAST(SUM(c2) AS DOUBLE) AS n2 FROM b) "
        "SELECT ROUND(" + exact.rsum12_sql(
            f"((CAST(c1 AS DOUBLE) + 0.5) / (n1 + {_KS_BINS}.0 * 0.5) "
            f"- (CAST(c2 AS DOUBLE) + 0.5) / (n2 + {_KS_BINS}.0 * 0.5)) "
            f"* LN(((CAST(c1 AS DOUBLE) + 0.5) / (n1 + {_KS_BINS}.0 * 0.5)) "
            f"/ ((CAST(c2 AS DOUBLE) + 0.5) / (n2 + {_KS_BINS}.0 * 0.5)))"
        ) + ", 8) AS psi, "
        "CAST(COUNT(*) AS BIGINT) AS n_bins FROM b CROSS JOIN t"
    ),
    tags=("D11", "D7"),
)
def d11_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D11: Population Stability Index between two slices of a column —
    the binned drift score ML monitoring dashboards standardize on
    (PSI < 0.1 stable, > 0.2 action). Same two-phase shape as the
    binned KS (d7): scalar min/max pull, ONE partial-agg shuffle to
    per-bin counts, then the score is a single aggregate over the
    ≤ _KS_BINS-row bin table — no second fact scan, no global window.
    Laplace-smoothed (+0.5/bin) so empty bins never produce ±inf;
    LN is libm → each per-bin term is rounded to 12 dp and summed
    order-independently in DECIMAL(38,12) (exact.rsum12, the l18
    convention) so cross-engine summation order can't flip the final
    8 dp rounding at a boundary."""
    o = T(spark, sf_dir, "orders")
    s = o.select(
        F.col("o_totalprice").alias("x"),
        F.when(F.col("o_orderkey") % 2 == 0, F.lit(1)).otherwise(F.lit(0)).alias("g"),
    )
    lo, hi = s.agg(F.min("x"), F.max("x")).first()
    width = (hi - lo) / float(_KS_BINS)
    bucket = F.least(
        F.floor((F.col("x") - F.lit(lo)) / F.lit(width)), F.lit(_KS_BINS - 1)
    ).cast("long")
    b = s.groupBy(bucket.alias("bucket")).agg(
        F.sum("g").cast("long").alias("c1"),
        F.sum(F.lit(1) - F.col("g")).cast("long").alias("c2"),
    )
    # totals in-plan as window sums over the <=_KS_BINS-row bin table
    # (a .first() pull here would re-run the whole fact scan eagerly)
    w0 = Window.partitionBy()
    b = b.withColumn("n1", F.sum("c1").over(w0).cast("double")).withColumn(
        "n2", F.sum("c2").over(w0).cast("double")
    )
    smooth = float(_KS_BINS) * 0.5
    p1 = (F.col("c1").cast("double") + 0.5) / (F.col("n1") + F.lit(smooth))
    p2 = (F.col("c2").cast("double") + 0.5) / (F.col("n2") + F.lit(smooth))
    return b.agg(
        F.round(exact.rsum12((p1 - p2) * F.log(p1 / p2)), 8).alias("psi"),
        F.count(F.lit(1)).alias("n_bins"),
    )


@register(
    "c27_flatten_json",
    oracle=(
        "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k "
        "FROM events WHERE props IS NOT NULL AND event_id % 25 = 0 "
        "ORDER BY event_id"
    ),
    tags=("C27", "S3", "F"),
)
def c27_flatten_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C27: promote a semi-structured JSON column to typed columns —
    the cleaning move that turns a props blob into queryable schema.
    The schema is INFERRED from one sampled row (schema_of_json on an
    O(1) driver pull — at 100 TB, sample more rows offline and pin the
    schema; inference must never be a per-query full scan), then ONE
    from_json per row parses into a struct whose fields project out.
    The sample row is the MIN-event_id row (a TakeOrdered pull), not an
    arbitrary head(1): which row head() returns is partition-order
    dependent, so heterogeneous payloads would make the inferred
    schema — and oracle parity — nondeterministic across runs.
    Contrast with get_json_object chains: each chained call re-parses
    the string per field, N parses per row instead of one."""
    ev = T(spark, sf_dir, "events").where(
        F.col("props").isNotNull() & (F.col("event_id") % 25 == 0)
    )
    head = ev.orderBy("event_id").select("props").head(1)
    if not head:  # nothing to infer from: empty result, typed empty frame
        return ev.select("event_id", F.lit(None).cast("bigint").alias("k")).limit(0)
    schema = F.schema_of_json(F.lit(head[0][0]))
    parsed = ev.select("event_id", F.from_json("props", schema).alias("p"))
    return parsed.select("event_id", F.col("p.k").alias("k")).orderBy("event_id")


@register(
    "p22_cramers_v",
    oracle=(
        "WITH obs AS (SELECT o_orderstatus AS s, o_orderpriority AS p, "
        "CAST(COUNT(*) AS BIGINT) AS o FROM orders GROUP BY 1, 2), "
        "rt AS (SELECT s, CAST(SUM(o) AS BIGINT) AS rs FROM obs GROUP BY s), "
        "ct AS (SELECT p, CAST(SUM(o) AS BIGINT) AS cs FROM obs GROUP BY p), "
        "t AS (SELECT CAST(SUM(o) AS DOUBLE) AS n, "
        "CAST(COUNT(DISTINCT s) AS BIGINT) AS r, CAST(COUNT(DISTINCT p) AS BIGINT) AS c FROM obs) "
        "SELECT ROUND(" + exact.rsum12_sql(
            "(CAST(o AS DOUBLE) - CAST(rs * cs AS DOUBLE) / n) "
            "* (CAST(o AS DOUBLE) - CAST(rs * cs AS DOUBLE) / n) "
            "/ (CAST(rs * cs AS DOUBLE) / n)"
        ) + ", 8) AS chi2, "
        "ROUND(SQRT(" + exact.rsum12_sql(
            "(CAST(o AS DOUBLE) - CAST(rs * cs AS DOUBLE) / n) "
            "* (CAST(o AS DOUBLE) - CAST(rs * cs AS DOUBLE) / n) "
            "/ (CAST(rs * cs AS DOUBLE) / n)"
        ) + " / (MAX(n) * CAST(LEAST(MAX(r) - 1, MAX(c) - 1) AS DOUBLE))), 8) AS cramers_v, "
        "CAST(MAX(n) AS BIGINT) AS n_rows, MAX(r) AS n_status, MAX(c) AS n_priority "
        "FROM obs JOIN rt USING (s) JOIN ct USING (p) CROSS JOIN t"
    ),
    tags=("P22", "P18"),
)
def p22_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P22: Cramér's V association between two categorical columns —
    the categorical companion to the Pearson matrix (p18): χ² over the
    contingency table, normalized to [0,1]. ONE fact scan builds the
    ≤ r×c-cell contingency table; marginals and the grand total are
    window/group sums over that tiny table, never a second scan. χ²'s
    per-cell terms are rounded to 12 dp and summed order-independently
    in DECIMAL(38,12) (exact.rsum12) before the final 8 dp rounding;
    SQRT is correctly-rounded IEEE, identical across engines."""
    from pyspark.sql import Window

    obs = (
        T(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p"))
        .agg(F.count(F.lit(1)).alias("o"))
    )
    obs = (
        obs.withColumn("rs", F.sum("o").over(Window.partitionBy("s")))
        .withColumn("cs", F.sum("o").over(Window.partitionBy("p")))
        .withColumn("n", F.sum("o").over(Window.partitionBy()).cast("double"))
        .withColumn("r", F.size(F.collect_set("s").over(Window.partitionBy())))
        .withColumn("c", F.size(F.collect_set("p").over(Window.partitionBy())))
    )
    exp = (F.col("rs") * F.col("cs")).cast("double") / F.col("n")
    dev = F.col("o").cast("double") - exp
    term = dev * dev / exp
    return obs.agg(
        F.round(exact.rsum12(term), 8).alias("chi2"),
        F.round(
            F.sqrt(
                exact.rsum12(term)
                / (F.max("n") * F.least(F.max("r") - 1, F.max("c") - 1).cast("double"))
            ),
            8,
        ).alias("cramers_v"),
        F.max("n").cast("long").alias("n_rows"),
        F.max("r").cast("long").alias("n_status"),
        F.max("c").cast("long").alias("n_priority"),
    )


@register(
    "d12_volume_anomaly",
    oracle=(
        "WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1) "
        "SELECT d, n, prev_n, "
        "ROUND(CAST(n - prev_n AS DOUBLE) / CAST(prev_n AS DOUBLE), 8) AS rel_change "
        "FROM (SELECT d, n, LAG(n) OVER (ORDER BY d) AS prev_n FROM daily) "
        "WHERE prev_n IS NOT NULL "
        "AND ABS(CAST(n - prev_n AS DOUBLE) / CAST(prev_n AS DOUBLE)) >= 0.25 "
        "ORDER BY d"
    ),
    tags=("D12", "D7", "ST1"),
)
def d12_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D12: ingestion-volume anomaly — days whose event count moved
    ≥ 25% vs the previous day (the pipeline-monitoring alarm that
    catches upstream outages and double-loads before content checks
    run). ONE fact scan to daily counts (partial-agg shuffle), then
    lag + filter over the ~|days|-row table — the global-order window
    funnels DAYS through one partition, not events (bounded by
    calendar size, the same rationale as d7's bin table)."""
    daily = (
        T(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", F.col("ts")).alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    daily = daily.withColumn("prev_n", F.lag("n").over(Window.orderBy("d")))
    rel = (F.col("n") - F.col("prev_n")).cast("double") / F.col("prev_n").cast("double")
    return (
        daily.where(F.col("prev_n").isNotNull())
        .select("d", "n", "prev_n", F.round(rel, 8).alias("rel_change"))
        .where(F.abs(rel) >= 0.25)
        .orderBy("d")
    )


@register(
    "q30_daily_p95",
    oracle=(
        "SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
        "CAST(COUNT(value) AS BIGINT) AS n_values, "
        "QUANTILE_CONT(value, 0.95) AS p95_value, "
        "QUANTILE_CONT(value, 0.5) AS median_value "
        "FROM events WHERE value IS NOT NULL "
        "GROUP BY 1 ORDER BY day"
    ),
    tags=("Q30", "P5", "analytics"),
)
def q30_daily_p95(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q30: daily p95/median SLA rollup — the latency-dashboard query.
    Per-group exact percentiles via the sort-based percentile
    aggregate (group state bounded by the day's rows; both engines
    interpolate lower + (upper−lower)·frac, bit-identical — the p5b
    contract). Beyond ~10M rows/day the swap is the keyed
    histogram-refinement path (p5 machinery), same output schema."""
    ev = T(spark, sf_dir, "events").where(F.col("value").isNotNull())
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count("value").alias("n_values"),
            F.percentile("value", F.lit(0.95)).alias("p95_value"),
            F.percentile("value", F.lit(0.5)).alias("median_value"),
        )
        .orderBy("day")
    )


@register(
    "d14_seasonal_anomaly",
    oracle=(
        "WITH hourly AS (SELECT event_type, "
        "CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h, "
        "CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
        "base AS (SELECT event_type, h, n, "
        "COUNT(n) OVER w AS prior_weeks, "
        "CAST(SUM(n) OVER w AS DOUBLE) / COUNT(n) OVER w AS baseline "
        "FROM hourly WINDOW w AS (PARTITION BY event_type, dayofweek(h), "
        "hour(h) ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)) "
        "SELECT event_type, h, n, prior_weeks, ROUND(baseline, 8) AS baseline, "
        "ROUND(ABS(CAST(n AS DOUBLE) - baseline) / baseline, 8) AS deviation "
        "FROM base WHERE prior_weeks >= 2 "
        "AND ABS(CAST(n AS DOUBLE) - baseline) / baseline >= 0.5 "
        "ORDER BY event_type, h"
    ),
    tags=("D14", "D9", "D12", "quality"),
)
def d14_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D14: seasonality-aware volume anomaly — each (event_type, hour)
    bucket compared against the mean of the SAME hour-of-week in
    prior weeks (trailing frame, no lookahead): flags hours ≥ 50% off
    their seasonal baseline once ≥ 2 prior observations exist. The
    d12 day-over-day monitor misfires every weekend; this is the
    standard fix (seasonal slot baselining).

    Scale shape: the fact table collapses to the calendar-sized
    hourly rollup first; the seasonal window partitions by
    (type, day-of-week, hour-of-day) over that rollup — both engines
    map a calendar hour to the same slot, so the partition keys agree
    without the DOW-numbering convention ever reaching the output.
    Baseline = SUM/COUNT of integer counts: identical IEEE division
    on both engines, ROUND(8)-pinned."""
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (
        Window.partitionBy("event_type", F.dayofweek("h"), F.hour("h"))
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = hourly.select(
        "event_type", "h", "n",
        F.count("n").over(w).alias("prior_weeks"),
        (F.sum("n").over(w).cast("double") / F.count("n").over(w)).alias("baseline"),
    )
    dev = F.abs(F.col("n").cast("double") - F.col("baseline")) / F.col("baseline")
    return (
        base.where((F.col("prior_weeks") >= 2) & (dev >= 0.5))
        .select(
            "event_type", "h", "n", "prior_weeks",
            F.round("baseline", 8).alias("baseline"),
            F.round(dev, 8).alias("deviation"),
        )
        .orderBy("event_type", "h")
    )


@register(
    "d15_null_rate_drift",
    oracle=(
        "WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
        "CAST(COUNT(*) AS BIGINT) AS n_rows, "
        "ROUND(CAST(COUNT_IF(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END "
        "IS NULL) AS DOUBLE) / COUNT(*), 8) AS null_rate FROM events GROUP BY 1), "
        "base AS (SELECT day, n_rows, null_rate, "
        "COUNT(*) OVER w AS n_prior, "
        "ROUND(CAST(SUM(CAST(null_rate AS DECIMAL(28,8))) OVER w AS DOUBLE) "
        "/ COUNT(*) OVER w, 8) AS baseline "
        "FROM daily WINDOW w AS (ORDER BY day "
        "ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)) "
        "SELECT day, n_rows, null_rate, baseline, "
        "ROUND(null_rate - baseline, 8) AS rate_jump "
        "FROM base WHERE n_prior >= 3 AND null_rate - baseline >= 0.02 "
        "ORDER BY day"
    ),
    tags=("D15", "D12", "P2", "quality"),
)
def d15_null_rate_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D15: completeness drift monitor — each day's NULL RATE (on the
    value_gap-dirtied column) compared against its trailing-7-day
    mean; days jumping ≥ 2 points are flagged. Volume monitors (d12)
    miss this failure class entirely: an upstream schema slip that
    nulls a column changes no row counts. Plan: one scan collapses to
    the calendar-sized daily table; the trailing window runs over
    days. Baseline means go through DECIMAL so the flag threshold is
    partition-order independent."""
    from pyspark.sql import Window

    ev = T(spark, sf_dir, "events")
    gap = F.when(F.col("event_id") % 7 == 0, F.lit(None)).otherwise(F.col("value"))
    daily = (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                F.sum(gap.isNull().cast("long")).cast("double") / F.count(F.lit(1)), 8
            ).alias("null_rate"),
        )
    )
    w = Window.orderBy("day").rowsBetween(-7, -1)
    base = daily.select(
        "day", "n_rows", "null_rate",
        F.count(F.lit(1)).over(w).alias("n_prior"),
        F.round(
            F.sum(F.col("null_rate").cast("decimal(28,8)")).over(w).cast("double")
            / F.count(F.lit(1)).over(w),
            8,
        ).alias("baseline"),
    )
    jump = F.round(F.col("null_rate") - F.col("baseline"), 8)
    return (
        base.where((F.col("n_prior") >= 3) & (F.col("null_rate") - F.col("baseline") >= 0.02))
        .select("day", "n_rows", "null_rate", "baseline", jump.alias("rate_jump"))
        .orderBy("day")
    )


@register(
    "d16_cusum_changepoint",
    oracle=(
        "WITH daily AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, "
        + exact.davg_sql("value")
        + " AS m FROM events GROUP BY 1), "
        "mu AS (SELECT " + exact.davg_sql("m") + " AS mu FROM daily), "
        "c AS (SELECT day, m, mu, "
        "CAST(SUM(CAST(ROUND(m - mu - 0.05 * mu, 8) AS DECIMAL(38,12))) "
        "OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS csum "
        "FROM daily CROSS JOIN mu), "
        "s AS (SELECT day, m, mu, "
        "ROUND(csum - LEAST(MIN(csum) OVER (ORDER BY day ROWS UNBOUNDED "
        "PRECEDING), 0.0), 8) AS cusum FROM c) "
        "SELECT day, ROUND(m, 8) AS daily_mean, cusum, "
        "CAST(cusum > 0.2 * mu AS BOOLEAN) AS changepoint "
        "FROM s ORDER BY day"
    ),
    tags=("D16", "D7", "quality"),
)
def d16_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D16: CUSUM change-point detection (Page 1954) on the daily mean
    of events.value — the classic sequential drift detector that
    catches a SUSTAINED small shift long before a per-day threshold
    (d12) fires: the positive CUSUM accumulates each day's excess
    over mean+slack and flags once the accumulation crosses h.

    The textbook recursion s_t = max(0, s_{t-1} + d_t) is not a
    window aggregate — but its CLOSED FORM is: s_t = c_t − min(0,
    min_{j≤t} c_j) where c is the plain running sum of d. Two window
    passes (running sum, running min), no recursion, no UDF.

    Exactness: the daily means and the grand mean μ are decimal
    averages; each d_t is rounded to 8 dp before the DECIMAL running
    sum, so c_t is bit-identical on both engines and the final
    threshold comparison (h = 0.2·μ, slack = 0.05·μ) cannot flip.
    Scale shape: the fact table collapses to the day-grain rollup
    first; the ordered windows run over calendar-sized rows (one row
    per day — bounded by time, not data volume)."""
    ev = T(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(exact.davg("value").alias("m"))
    mu = daily.agg(exact.davg("m").alias("mu"))
    w_sum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = daily.crossJoin(F.broadcast(mu)).select(
        "day", "m", "mu",
        F.sum(
            F.round(F.col("m") - F.col("mu") - 0.05 * F.col("mu"), 8)
            .cast("decimal(38,12)")
        ).over(w_sum).cast("double").alias("csum"),
    )
    s = c.select(
        "day", "m", "mu",
        F.round(
            F.col("csum") - F.least(F.min("csum").over(w_sum), F.lit(0.0)), 8
        ).alias("cusum"),
    )
    return s.select(
        "day",
        F.round("m", 8).alias("daily_mean"),
        "cusum",
        (F.col("cusum") > 0.2 * F.col("mu")).alias("changepoint"),
    ).orderBy("day")


_D17_ORACLE = (
    "WITH d AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day "
    "FROM events), "
    "span AS (SELECT user_id, MIN(day) AS first_day, MAX(day) AS last_day "
    "FROM d GROUP BY user_id), "
    "grid AS (SELECT user_id, CAST(unnest(generate_series(first_day, last_day, "
    "INTERVAL 1 DAY)) AS DATE) AS day FROM span), "
    "obs AS (SELECT DISTINCT user_id, day FROM d) "
    "SELECT g.user_id, g.day AS missing_day "
    "FROM grid g LEFT JOIN obs o ON g.user_id = o.user_id AND g.day = o.day "
    "WHERE o.user_id IS NULL ORDER BY g.user_id, missing_day"
)


@register(
    "d17_completeness_calendar",
    oracle=_D17_ORACLE,
    tags=("D17", "D12", "P2", "quality"),
)
def d17_completeness_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D17: per-entity CALENDAR COMPLETENESS — for every user, the
    days inside their own active span [first event, last event] with
    NO data at all: the "silent gap" a null-rate profile (p2) never
    sees because the missing rows don't exist to be null. The standard
    feed-audit question ("which accounts have holes in their
    history?"), answered with the exact missing dates so the backfill
    job has its work list.

    Plan: one fact scan to (user, day) distincts + a per-user min/max
    span (both partial-agg shuffles on the user key); the expected
    grid is sequence()+explode over the SPAN TABLE (users x span-days
    — calendar-bounded, never event-count-bounded) and the gap is a
    user+day-keyed anti-join. Same shape at any scale: the explode
    runs on the per-user summary, not the fact table."""
    d = T(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    )
    span = d.groupBy("user_id").agg(
        F.min("day").alias("first_day"), F.max("day").alias("last_day")
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("first_day", "last_day")).alias("day"),
    )
    obs = d.distinct()
    return (
        grid.join(obs, ["user_id", "day"], "left_anti")
        .select("user_id", F.col("day").alias("missing_day"))
        .orderBy("user_id", "missing_day")
    )


_D18_ORACLE = (
    "WITH tv AS (SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, "
    "event_type, CAST(COUNT(*) AS BIGINT) AS n FROM events GROUP BY 1, 2), "
    "tl AS (SELECT d, event_type, n, "
    "COALESCE(LAG(n) OVER (PARTITION BY event_type ORDER BY d), 0) AS prev_n "
    "FROM tv), "
    "daily AS (SELECT d, CAST(SUM(n) AS BIGINT) AS n, "
    "CAST(SUM(prev_n) AS BIGINT) AS prev_n FROM tl GROUP BY d), "
    "flagged AS (SELECT d, n, prev_n FROM daily WHERE prev_n > 0 "
    "AND ABS(CAST(n - prev_n AS DOUBLE) / CAST(prev_n AS DOUBLE)) >= 0.06), "
    "attr AS (SELECT tl.d, tl.event_type, tl.n - tl.prev_n AS type_delta, "
    "ROW_NUMBER() OVER (PARTITION BY tl.d "
    "ORDER BY ABS(tl.n - tl.prev_n) DESC, tl.event_type) AS rn "
    "FROM tl JOIN flagged f ON tl.d = f.d) "
    "SELECT f.d, f.n, f.prev_n, "
    "ROUND(CAST(f.n - f.prev_n AS DOUBLE) / CAST(f.prev_n AS DOUBLE), 8) "
    "AS rel_change, a.event_type AS top_contributor, "
    "CAST(a.type_delta AS BIGINT) AS contributor_delta "
    "FROM flagged f JOIN attr a ON f.d = a.d AND a.rn = 1 ORDER BY f.d"
)


@register(
    "d18_anomaly_attribution",
    oracle=_D18_ORACLE,
    tags=("D18", "D12", "quality"),
)
def d18_anomaly_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D18: volume-anomaly ROOT-CAUSE attribution — for every flagged
    day (total count moved ≥ 6% day-over-day here; the fixture's
    synthetic volume is near-uniform, max move 11%, so d12's 25%
    production threshold would make this query vacuous — threshold is
    the alarm-sensitivity knob), name the
    event_type whose own delta contributed most (ties to the first
    type name). The answer to the on-call question d12 raises: "volume
    jumped — WHAT jumped?". A real deployment swaps event_type for any
    slicing dimension (source, region, customer tier) with the same
    plan.

    Plan: ONE fact scan to (day, type) counts; the per-type lag, the
    daily re-total, the flag filter, and the argmax all run over the
    days x types rollup (calendar-bounded — the d12 rationale). The
    day-over-day total here is the sum of per-type lags, identical to
    d12's total lag when every type is present on consecutive days
    (true of this fixture; the test recomputes attribution
    independently). The per-type LAG compares to that type's last
    PRESENT day — coalesce(...,0) zeroes only a type's first-ever day;
    a workload with vanishing slices should densify on the day x type
    grid first (d17's sequence pattern) so a disappearance reads as
    -n against the very next day."""
    tv = (
        T(spark, sf_dir, "events")
        .groupBy(
            F.date_trunc("day", F.col("ts")).alias("d"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("event_type").orderBy("d")
    tl = tv.withColumn(
        "prev_n", F.coalesce(F.lag("n").over(wt), F.lit(0))
    )
    daily = tl.groupBy("d").agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("prev_n").cast("long").alias("prev_n"),
    )
    rel = (F.col("n") - F.col("prev_n")).cast("double") / F.col("prev_n").cast(
        "double"
    )
    flagged = daily.where(
        (F.col("prev_n") > 0) & (F.abs(rel) >= 0.06)
    ).select("d", "n", "prev_n", F.round(rel, 8).alias("rel_change"))
    delta = (F.col("n") - F.col("prev_n")).cast("long")
    attr = (
        tl.join(flagged.select("d"), "d")
        .select("d", "event_type", delta.alias("type_delta"))
        .groupBy("d")
        .agg(
            # ORDER BY abs(delta) DESC, type ASC == min over the
            # struct (-abs(delta), type) — full lexical tie-break,
            # exactly the oracle's ROW_NUMBER ordering
            F.min_by(
                F.struct(
                    F.col("event_type").alias("t"), F.col("type_delta").alias("td")
                ),
                F.struct(
                    (-F.abs("type_delta")).alias("na"),
                    F.col("event_type").alias("ty"),
                ),
            ).alias("m")
        )
    )
    return (
        flagged.join(attr, "d")
        .select(
            "d", "n", "prev_n", "rel_change",
            F.col("m.t").alias("top_contributor"),
            F.col("m.td").alias("contributor_delta"),
        )
        .orderBy("d")
    )
