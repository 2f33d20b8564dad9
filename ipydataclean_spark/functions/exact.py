"""Order-independent ("exact") aggregate helpers.

Why: the driver's correctness gate hashes result values; a plain
``SUM(double)`` differs between Spark and DuckDB in the last few bits
because summation order differs across engines/partitionings. Routing
the sum through DECIMAL makes it exact and associative — the same
result regardless of partition count — so the hash matches AND the
query is deterministic on a 1000-executor cluster, not just local[32].

Fixture doubles carry ≤2 fractional digits (prices/discounts), so
DECIMAL(28,6) loses nothing; products of two 2-decimal values have ≤4
fractional digits.

Each helper has a Spark form (Column) and an ``_sql`` twin emitting the
equivalent DuckDB expression, so both sides compute identical values.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,6)"
DEC_SQL = "DECIMAL(28,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


#: Probe cache for the fastagg jar (jvm/Decimal128Sum.scala, built into
#: ipydataclean_spark/jars/ by tools/build_fastagg_jar.sh). Keyed on the
#: py4j gateway identity so a fresh JVM re-probes.
_D128_PROBE: dict = {"jvm_id": None, "ok": False}


def _dsum128(col: Column, precision: int, scale: int) -> Column | None:
    """Codegen'd exact decimal sum on an int128 (two-long) buffer, or
    ``None`` when the fastagg jar is not on this JVM's classpath (e.g.
    the driver's plain SparkSession) — callers then fall back to the
    built-in ``SUM(CAST(x AS DECIMAL(p,s)))``, which computes the
    IDENTICAL value: the jar's per-row conversion runs the same
    ``BigDecimal.valueOf(double).setScale(s, HALF_UP)`` + precision-check
    sequence as Spark's cast, and the int128 accumulation is exact
    (bit-identical results pinned by tests/test_fastagg.py's fuzz vs the
    built-in form under both ANSI modes).

    Why: Spark's sum over a >18-digit decimal pays a BigDecimal add, a
    CheckOverflow clone, and a binary UnsafeRow write per row — measured
    ~0.25 s per aggregate per 600k rows vs ~0.05 s for a long sum. The
    int128 DeclarativeAggregate stays in whole-stage codegen and cuts the
    q1-shaped 6-aggregate pass 1.54 → 0.75 s at sf0.1 (guide §2.3;
    OPTIMIZATION_r13.md "decimal exact-sum fast path")."""
    try:
        from pyspark.sql import SparkSession

        spark = SparkSession.getActiveSession()
        if spark is None:
            return None
        jvm = spark._jvm
        key = id(jvm)
        if _D128_PROBE["jvm_id"] != key:
            _D128_PROBE["jvm_id"] = key
            try:
                jvm.java.lang.Class.forName("ipydataclean.spark.fastagg.Decimal128Sum")
                _D128_PROBE["ok"] = True
            except Exception:
                _D128_PROBE["ok"] = False
        if not _D128_PROBE["ok"]:
            return None
        eu = jvm.org.apache.spark.sql.classic.ExpressionUtils
        agg = jvm.ipydataclean.spark.fastagg.Decimal128Sum(
            eu.expression(col._jc), precision, scale
        )
        from pyspark.sql.column import Column as _PyCol

        return _PyCol(eu.column(agg.toAggregateExpression()))
    except Exception:
        return None


def dsum(col: Column | str) -> Column:
    """Exact sum of a double column, returned as double."""
    c = _c(col)
    fast = _dsum128(c, 28, 6)
    if fast is not None:
        return fast.cast("double")
    return F.sum(c.cast(DEC)).cast("double")


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {DEC_SQL})) AS DOUBLE)"


def dsum_scaled(col: Column | str, precision: int, scale: int) -> Column:
    """Exact sum of a double column at an arbitrary decimal (p, s),
    returned as double — the parameterized twin of ``dsum`` for paths
    whose contract is a different scale (pagerank's decimal(28,18)
    rank sums). Fast path and fallback compute the identical value
    (same per-row conversion sequence, exact associative accumulation;
    the (28,18) twin is fuzz-pinned in tests/test_fastagg.py)."""
    c = _c(col)
    fast = _dsum128(c, precision, scale)
    if fast is not None:
        return fast.cast("double")
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def dsum_dec(col: Column | str) -> Column:
    """Exact sum kept AS decimal(38,6) — for partial-aggregate
    recombination (q1's lazy fill-mean fusion), where group partials
    must stay exact decimals until the driver-side or in-plan exact
    recombination casts the final value to double."""
    c = _c(col)
    fast = _dsum128(c, 28, 6)
    return fast if fast is not None else F.sum(c.cast(DEC))


DEC12 = "decimal(38,12)"
DEC12_SQL = "DECIMAL(38,12)"


def rsum12(col: Column | str) -> Column:
    """Order-independent sum of SMALL transcendental terms (log/division
    results): round each term to 12 dp first — making the double→decimal
    conversion unambiguous on both engines — then sum exactly in
    DECIMAL(38,12). For scores built from libm terms (PSI, χ²,
    entropy) where a raw double sum's last-ulp ordering difference
    could flip a subsequent ROUND(...,8) at a boundary."""
    c = F.round(_c(col), 12)
    fast = _dsum128(c, 38, 12)
    if fast is not None:
        return fast.cast("double")
    return F.sum(c.cast(DEC12)).cast("double")


def rsum12_sql(expr: str) -> str:
    return f"CAST(SUM(CAST(ROUND({expr}, 12) AS {DEC12_SQL})) AS DOUBLE)"


def davg(col: Column | str) -> Column:
    """Order-independent mean: exact decimal sum / count, both engines
    perform the identical final IEEE division."""
    c = _c(col)
    fast = _dsum128(c, 28, 6)
    s = fast.cast("double") if fast is not None else F.sum(c.cast(DEC)).cast("double")
    return (s / F.count(c)).alias("avg")


def davg_sql(expr: str) -> str:
    return f"(CAST(SUM(CAST({expr} AS {DEC_SQL})) AS DOUBLE) / COUNT({expr}))"


def isum(col: Column | str) -> Column:
    """Sum of an integer column as BIGINT (DuckDB sums ints to INT128;
    cast both sides to BIGINT for schema parity)."""
    return F.sum(_c(col)).cast("long")


def isum_sql(expr: str) -> str:
    return f"CAST(SUM({expr}) AS BIGINT)"


def imax(col: Column | str) -> Column:
    return F.max(_c(col))


def dstddev(col: Column | str) -> Column:
    """Order-independent sample stddev via exact decimal sums:
    sqrt((sumsq - sum^2/n) / (n-1)) evaluated in identical double ops.

    The square is computed in double (identical IEEE op both engines)
    then decimal-summed; double→decimal rounding is unambiguous (no
    double sits exactly on a 10^-6 half-boundary), so both engines sum
    identical decimals in any order."""
    c = _c(col)
    n = F.count(c).cast("double")
    fast_s = _dsum128(c, 28, 6)
    fast_sq = _dsum128(c * c, 28, 6)
    s = fast_s.cast("double") if fast_s is not None else F.sum(c.cast(DEC)).cast("double")
    sq = (
        fast_sq.cast("double")
        if fast_sq is not None
        else F.sum((c * c).cast(DEC)).cast("double")
    )
    return F.sqrt((sq - s * s / n) / (n - F.lit(1.0)))


def dstddev_sql(expr: str) -> str:
    return (
        f"SQRT((CAST(SUM(CAST(({expr}) * ({expr}) AS {DEC_SQL})) AS DOUBLE) - "
        f"{dsum_sql(expr)} * {dsum_sql(expr)} / CAST(COUNT({expr}) AS DOUBLE)) "
        f"/ (CAST(COUNT({expr}) AS DOUBLE) - 1.0))"
    )


def md5_prefix_int(key: Column | str) -> Column:
    """First 24 bits of md5(key) as BIGINT — the deterministic
    cross-engine sampling/bucketing probe (coin: (h + 0.5)/2^24)."""
    from pyspark.sql import functions as F

    return F.conv(
        F.substring(F.md5(_c(key).cast("string")), 1, 6), 16, 10
    ).cast("long")


def md5_prefix_int_sql(expr: str) -> str:
    """DuckDB twin of md5_prefix_int — ONE definition so a typo in a
    hand-copied coin expression can't silently de-certify a twin
    (round-6 review: the expression had been restated 7 times)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 6)) AS BIGINT)"


def md5_coin(key: Column | str, salt: str = "") -> Column:
    """Deterministic uniform coin in (0, 1): (md5_prefix_int + 0.5)/2^24.

    ``salt`` namespaces the coin so independent samplers over the same
    key column draw independent coins (an audit's sampled slice must
    not correlate with r22d's sample of the same table). The coin is
    reproducible across engines, retries, repartitioning, and
    incremental reruns — a row's fate never depends on task boundaries
    — and pushes down as an ordinary predicate.

    NULL contract: a NULL key draws a NULL coin, so `coin < fraction`
    is NULL and the row is FILTERED OUT — in BOTH engines. The salt is
    composed with NULL-propagating concat (NOT concat_ws, which skips
    NULLs and would give every NULL-key row the identical md5(salt)
    coin while the SQL twin drops them — review r08)."""
    from pyspark.sql import functions as F

    k = _c(key).cast("string")
    if salt:
        k = F.concat(F.lit(salt + ":"), k)
    return (md5_prefix_int(k) + F.lit(0.5)) / F.lit(float(1 << 24))


def md5_coin_sql(expr: str, salt: str = "") -> str:
    """DuckDB twin of md5_coin (same single-definition rule). The salt
    is interpolated into a SQL string literal, so it must be a plain
    identifier-like token — a quote or backslash would inject into the
    oracle string (advice r08; all call-site salts are internal
    constants, this assert keeps it that way)."""
    if salt and not re.fullmatch(r"[A-Za-z0-9_.:-]+", salt):
        raise ValueError(f"md5_coin_sql: unsafe salt {salt!r}")
    key = f"'{salt}:' || CAST({expr} AS VARCHAR)" if salt else f"CAST({expr} AS VARCHAR)"
    return f"(({md5_prefix_int_sql(key)}) + 0.5) / {float(1 << 24)}"
