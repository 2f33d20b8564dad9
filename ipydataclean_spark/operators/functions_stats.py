"""Statistical aggregate surface, part 3 — exact moment statistics,
extra aggregates, and bitwise scalars.

`f_moment_stats` is the 100 TB-relevant piece: corr / covariance /
skewness / kurtosis computed from ONE pass of decimal power sums
(n, Σx, Σy, Σxy, Σx², Σy², Σx³, Σx⁴), then identical IEEE double
arithmetic on the partials in both engines. This is bit-exact AND
order-independent — the same result on any partition count — unlike
the builtin `F.corr`/`F.skewness` whose streaming double updates are
partitioning-dependent in the last bits (fine operationally; not
hash-comparable). The decimal partial sums are map-side-combinable,
so the whole profile is a single shuffle-light aggregate at scale.

Power-sum representability (fixtures, FIXTURES.md): l_quantity is
integer-valued ≤ 50 (x⁴ ≤ 6.25e6, exact in DECIMAL(28,6));
l_extendedprice has 2 fractional digits (y² has 4 ≤ 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register


@register(
    "f_moment_stats",
    oracle=(
        "WITH s AS (SELECT l_returnflag, CAST(COUNT(*) AS DOUBLE) AS n, "
        f"{exact.dsum_sql('l_quantity')} AS sx, "
        f"{exact.dsum_sql('l_extendedprice')} AS sy, "
        f"{exact.dsum_sql('l_quantity * l_extendedprice')} AS sxy, "
        f"{exact.dsum_sql('l_quantity * l_quantity')} AS sxx, "
        f"{exact.dsum_sql('l_extendedprice * l_extendedprice')} AS syy, "
        f"{exact.dsum_sql('l_quantity * l_quantity * l_quantity')} AS sxxx, "
        f"{exact.dsum_sql('l_quantity * l_quantity * l_quantity * l_quantity')} AS sxxxx "
        "FROM lineitem GROUP BY l_returnflag) "
        "SELECT l_returnflag, "
        "(sxy - sx * sy / n) / n AS covar_pop, "
        "(sxy - sx * sy / n) / (n - 1.0) AS covar_samp, "
        "ROUND((n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)), 12) AS corr_qty_price, "
        "(sxxx / n - 3.0 * (sx / n) * (sxx / n) + 2.0 * (sx / n) * (sx / n) * (sx / n)) "
        "/ (SQRT(sxx / n - (sx / n) * (sx / n)) * (sxx / n - (sx / n) * (sx / n))) AS skewness_pop, "
        "(sxxxx / n - 4.0 * (sx / n) * (sxxx / n) + 6.0 * (sx / n) * (sx / n) * (sxx / n) "
        "- 3.0 * (sx / n) * (sx / n) * (sx / n) * (sx / n)) "
        "/ ((sxx / n - (sx / n) * (sx / n)) * (sxx / n - (sx / n) * (sx / n))) - 3.0 AS kurtosis_pop "
        "FROM s ORDER BY l_returnflag"
    ),
    tags=("P4", "F-stats"),
)
def f_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact one-pass moment statistics: corr, covar_pop/samp (x=qty,
    y=price), skewness, kurtosis from decimal power sums. The final
    arithmetic mirrors the oracle SQL token-for-token so every IEEE op
    is identical."""
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            exact.dsum(x).alias("sx"),
            exact.dsum(y).alias("sy"),
            exact.dsum(x * y).alias("sxy"),
            exact.dsum(x * x).alias("sxx"),
            exact.dsum(y * y).alias("syy"),
            exact.dsum(x * x * x).alias("sxxx"),
            exact.dsum(x * x * x * x).alias("sxxxx"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    sxxx, sxxxx = F.col("sxxx"), F.col("sxxxx")
    m = sx / n  # same (sx / n) subtree the SQL repeats
    var_pop = sxx / n - m * m
    return s.select(
        "l_returnflag",
        ((sxy - sx * sy / n) / n).alias("covar_pop"),
        ((sxy - sx * sy / n) / (n - F.lit(1.0))).alias("covar_samp"),
        # corr is the one formula where DuckDB's compiled `a*b - c*d`
        # contracts to FMA (one ulp off the JVM's two-op form) — round
        # to 12 dp on both sides, far above the 1-ulp noise floor.
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            12,
        ).alias("corr_qty_price"),
        (
            (sxxx / n - F.lit(3.0) * m * (sxx / n) + F.lit(2.0) * m * m * m)
            / (F.sqrt(var_pop) * var_pop)
        ).alias("skewness_pop"),
        (
            (
                sxxxx / n
                - F.lit(4.0) * m * (sxxx / n)
                + F.lit(6.0) * m * m * (sxx / n)
                - F.lit(3.0) * m * m * m * m
            )
            / (var_pop * var_pop)
            - F.lit(3.0)
        ).alias("kurtosis_pop"),
    ).orderBy("l_returnflag")


@register(
    "f_agg_extra",
    oracle=(
        "SELECT o_orderpriority, "
        "MIN_BY(o_totalprice, o_orderkey) AS first_price, "
        "MAX_BY(o_totalprice, o_orderkey) AS last_price, "
        "BOOL_AND(o_totalprice > 0) AS all_positive, "
        "BOOL_OR(o_totalprice > 400000) AS any_huge, "
        "CAST(COUNT_IF(o_orderstatus = 'F') AS BIGINT) AS n_finished, "
        "BIT_AND(o_orderkey % 256) AS key_bit_and, "
        "BIT_OR(o_orderkey % 256) AS key_bit_or, "
        "BIT_XOR(o_orderkey % 256) AS key_bit_xor "
        "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
    ),
    tags=("R11", "F-agg"),
)
def f_agg_extra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extra aggregate family: min_by/max_by (argmin/argmax keyed by
    the unique o_orderkey, so tie-free deterministic), bool_and/or,
    count_if, and the bitwise aggregates."""
    df = T(spark, sf_dir, "orders")
    key = F.col("o_orderkey") % 256
    return (
        df.groupBy("o_orderpriority")
        .agg(
            F.min_by("o_totalprice", "o_orderkey").alias("first_price"),
            F.max_by("o_totalprice", "o_orderkey").alias("last_price"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_totalprice") > 400000).alias("any_huge"),
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
            F.bit_and(key).alias("key_bit_and"),
            F.bit_or(key).alias("key_bit_or"),
            F.bit_xor(key).alias("key_bit_xor"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "f_bitwise",
    oracle=(
        "SELECT o_orderkey, "
        "o_orderkey & 255 AS band, "
        "o_orderkey | 4096 AS bor, "
        "XOR(o_orderkey, 170) AS bxor, "
        "~o_orderkey AS bnot, "
        "o_orderkey << 3 AS shl, "
        "o_orderkey >> 2 AS shr, "
        "CAST(BIT_COUNT(o_orderkey) AS INTEGER) AS popcount "
        "FROM orders WHERE o_orderkey % 101 = 0 ORDER BY o_orderkey"
    ),
    tags=("F-bitwise",),
)
def f_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise scalar family (codegen'd JVM ops; DuckDB spells xor as
    XOR(a,b) since ^ is exponentiation there)."""
    df = T(spark, sf_dir, "orders").where(F.col("o_orderkey") % 101 == 0)
    k = F.col("o_orderkey")
    return df.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(4096)).alias("bor"),
        k.bitwiseXOR(F.lit(170)).alias("bxor"),
        F.bitwise_not(k).alias("bnot"),
        F.shiftleft(k, 3).alias("shl"),
        F.shiftright(k, 2).alias("shr"),
        F.bit_count(k).alias("popcount"),
    ).orderBy("o_orderkey")


_CM_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_CM_PAIRS = [
    (a, b) for i, a in enumerate(_CM_COLS) for b in _CM_COLS[i + 1 :]
]


def _cm_short(c: str) -> str:
    return c.removeprefix("l_")


@register(
    "p18_corr_matrix",
    oracle=(
        "WITH s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
        + ", ".join(
            f"{exact.dsum_sql(c)} AS s_{_cm_short(c)}, "
            f"{exact.dsum_sql(f'{c} * {c}')} AS ss_{_cm_short(c)}"
            for c in _CM_COLS
        )
        + ", "
        + ", ".join(
            f"{exact.dsum_sql(f'{a} * {b}')} AS sp_{_cm_short(a)}_{_cm_short(b)}"
            for a, b in _CM_PAIRS
        )
        + " FROM lineitem) SELECT "
        + ", ".join(
            f"ROUND((n * sp_{_cm_short(a)}_{_cm_short(b)} - s_{_cm_short(a)} * s_{_cm_short(b)}) / "
            f"(SQRT(n * ss_{_cm_short(a)} - s_{_cm_short(a)} * s_{_cm_short(a)}) * "
            f"SQRT(n * ss_{_cm_short(b)} - s_{_cm_short(b)} * s_{_cm_short(b)})), 12) "
            f"AS corr_{_cm_short(a)}_{_cm_short(b)}"
            for a, b in _CM_PAIRS
        )
        + " FROM s"
    ),
    tags=("P18", "P4"),
)
def p18_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P18: full pairwise correlation matrix of 4 numeric columns in
    ONE scan — 14 decimal power sums feed all 6 Pearson coefficients
    (order-independent, so bit-stable at any partition count; the
    builtin streaming corr is not). The agg count is O(k²) in columns
    but the scan count stays 1 — the 100 TB rule."""
    li = T(spark, sf_dir, "lineitem")
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for c in _CM_COLS:
        sh = _cm_short(c)
        aggs.append(exact.dsum(c).alias(f"s_{sh}"))
        aggs.append(exact.dsum(F.col(c) * F.col(c)).alias(f"ss_{sh}"))
    for a, b in _CM_PAIRS:
        aggs.append(
            exact.dsum(F.col(a) * F.col(b)).alias(f"sp_{_cm_short(a)}_{_cm_short(b)}")
        )
    s = li.agg(*aggs)
    outs = []
    n = F.col("n")
    for a, b in _CM_PAIRS:
        sa, sb = _cm_short(a), _cm_short(b)
        num = n * F.col(f"sp_{sa}_{sb}") - F.col(f"s_{sa}") * F.col(f"s_{sb}")
        den = F.sqrt(n * F.col(f"ss_{sa}") - F.col(f"s_{sa}") * F.col(f"s_{sa}")) * F.sqrt(
            n * F.col(f"ss_{sb}") - F.col(f"s_{sb}") * F.col(f"s_{sb}")
        )
        outs.append(F.round(num / den, 12).alias(f"corr_{sa}_{sb}"))
    return s.select(*outs)


@register(
    "p25_mutual_info",
    oracle=(
        "WITH cells AS (SELECT CAST(FLOOR(l_quantity / 10) AS BIGINT) AS qbin, "
        "l_returnflag AS flag, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM lineitem GROUP BY 1, 2), "
        "tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS t FROM cells), "
        "marg AS (SELECT c.qbin, c.flag, c.n, tot.t, "
        "SUM(c.n) OVER (PARTITION BY c.qbin) AS nx, "
        "SUM(c.n) OVER (PARTITION BY c.flag) AS ny "
        "FROM cells c CROSS JOIN tot) "
        "SELECT CAST(COUNT(*) AS BIGINT) AS n_cells, "
        "ROUND(" + exact.rsum12_sql(
            "(n / t) * LN((n * t) / (CAST(nx AS DOUBLE) * ny))"
        ) + ", 8) AS mutual_info_nats "
        "FROM marg"
    ),
    tags=("P25", "P18", "featprep"),
)
def p25_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P25: mutual information between a binned numeric feature
    (quantity deciles-of-10) and a categorical target (returnflag) —
    the model-free feature-relevance score that catches nonlinear
    association Pearson (p18) misses and complements Cramér's V
    (p22) with an information-theoretic scale.

    Exactness: each p(x,y)·ln(p(x,y)/(p(x)p(y))) term is rounded to
    12 dp then decimal-summed (exact.rsum12) — order-independent
    across engines. Plan: ONE fact scan feeds the contingency agg
    (map-side combinable, cells ≤ |bins|×|flags|); totals and
    marginals are windows over the CELL table (contingency-sized,
    not fact-sized); the MI fold is a 1-row agg."""
    cells = (
        T(spark, sf_dir, "lineitem")
        .groupBy(
            F.floor(F.col("l_quantity") / 10).cast("long").alias("qbin"),
            F.col("l_returnflag").alias("flag"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window

    t = F.sum("n").over(Window.partitionBy()).cast("double")
    nx = F.sum("n").over(Window.partitionBy("qbin"))
    ny = F.sum("n").over(Window.partitionBy("flag"))
    marg = cells.select(
        "n",
        t.alias("t"),
        nx.alias("nx"),
        ny.alias("ny"),
    )
    term = (F.col("n") / F.col("t")) * F.log(
        (F.col("n") * F.col("t")) / (F.col("nx").cast("double") * F.col("ny"))
    )
    return marg.agg(
        F.count(F.lit(1)).cast("long").alias("n_cells"),
        F.round(exact.rsum12(term), 8).alias("mutual_info_nats"),
    )


@register(
    "p26_group_regression",
    oracle=(
        "WITH s AS (SELECT l_returnflag, l_linestatus, "
        "CAST(COUNT(*) AS DOUBLE) AS n, "
        f"{exact.dsum_sql('l_quantity')} AS sx, "
        f"{exact.dsum_sql('l_extendedprice')} AS sy, "
        f"{exact.dsum_sql('l_quantity * l_extendedprice')} AS sxy, "
        f"{exact.dsum_sql('l_quantity * l_quantity')} AS sxx, "
        f"{exact.dsum_sql('l_extendedprice * l_extendedprice')} AS syy "
        "FROM lineitem GROUP BY l_returnflag, l_linestatus) "
        "SELECT l_returnflag, l_linestatus, CAST(n AS BIGINT) AS n_pairs, "
        "ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 8) AS slope, "
        "ROUND((sy - sx * ((n * sxy - sx * sy) / (n * sxx - sx * sx))) / n, 8) "
        "AS intercept, "
        "ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy)) "
        "/ ((n * sxx - sx * sx) * (n * syy - sy * sy)), 8) AS r2 "
        "FROM s ORDER BY l_returnflag, l_linestatus"
    ),
    tags=("P26", "F-stats", "R11"),
)
def p26_group_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P26: per-group OLS regression (the SQL regr_* family — slope,
    intercept, R² of price on quantity per (returnflag, linestatus))
    computed from ONE pass of exact decimal power sums instead of the
    builtin REGR_* aggregates, whose streaming float updates are
    order-dependent and engine-specific.

    Exactness: the five sums are decimal-exact; the finishing formulas
    combine them in IEEE doubles with the identical expression tree on
    both engines and ROUND(...,8) guards the FMA-contraction ulp on
    the `a*b - c*d` patterns (same guard as f_moment_stats corr).
    """
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = (
        T(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            exact.dsum(x).alias("sx"),
            exact.dsum(y).alias("sy"),
            exact.dsum(x * y).alias("sxy"),
            exact.dsum(x * x).alias("sxx"),
            exact.dsum(y * y).alias("syy"),
        )
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    num = n * sxy - sx * sy
    den_x = n * sxx - sx * sx
    slope = num / den_x
    return s.select(
        "l_returnflag",
        "l_linestatus",
        n.cast("long").alias("n_pairs"),
        F.round(slope, 8).alias("slope"),
        F.round((sy - sx * slope) / n, 8).alias("intercept"),
        F.round((num * num) / (den_x * (n * syy - sy * sy)), 8).alias("r2"),
    ).orderBy("l_returnflag", "l_linestatus")
