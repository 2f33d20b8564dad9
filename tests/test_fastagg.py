"""Decimal128Sum (jvm/Decimal128Sum.scala): the codegen'd int128 exact
decimal sum behind functions/exact.py.

Contract under test: for every input, the fast aggregate's result is
BIT-IDENTICAL to the built-in ``SUM(CAST(x AS DECIMAL(p,s)))`` it
replaces — same value (compared as decimal strings, not doubles), same
result type, same null semantics (NaN/Inf/NULL skipped, all-invalid
group -> NULL), same ANSI overflow behavior — so the engine session
(jar on classpath) and the driver's plain session (fallback path)
compute identical query results on any data, not just the fixtures.
"""

from __future__ import annotations

import random
import struct

import pytest
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact


def _d128(col, precision=28, scale=6):
    c = exact._dsum128(col, precision, scale)
    if c is None:
        pytest.skip("fastagg jar not on this JVM's classpath")
    return c


def test_jar_available_in_engine_session(spark):
    """The engine session (session.py) must actually load the jar —
    otherwise every dsum consumer silently runs the slow path."""
    assert exact._dsum128(F.col("x"), 28, 6) is not None


def _adversarial_values():
    rng = random.Random(13)
    vals = []
    # uniform random finite bit patterns inside the decimal(28,6) domain
    for _ in range(4000):
        x = struct.unpack("<d", struct.pack("<Q", rng.getrandbits(64)))[0]
        if x != x or x in (float("inf"), float("-inf")) or abs(x) >= 1e22:
            continue
        vals.append(x)
    for _ in range(4000):
        vals.append(rng.uniform(-1e5, 1e5))  # price-like
        vals.append(rng.uniform(-1, 1) * 10 ** rng.randint(-10, 12))
        vals.append(rng.uniform(-9e21, 9e21))  # unscaled > 2^63: int128 carries
    # HALF_UP half-boundary adversaries at the 6th decimal
    for k in range(-500, 500):
        vals.append((k + 0.5) / 1e6)
    vals += [0.0, -0.0, 5e-7, -5e-7, 4.9e-324, 1e-7, 9.2e21, -9.2e21, 0.615, 0.15]
    return vals


def test_bit_identical_to_builtin_sum(spark):
    """Grouped fuzz vs the built-in decimal sum, compared as decimal
    strings (value AND scale), under both ANSI modes."""
    vals = _adversarial_values()
    df = spark.createDataFrame(
        [(i % 23, v) for i, v in enumerate(vals)], "k int, x double"
    ).repartition(8)
    prior = spark.conf.get("spark.sql.ansi.enabled")
    try:
        for ansi in ("true", "false"):
            spark.conf.set("spark.sql.ansi.enabled", ansi)
            rows = (
                df.groupBy("k")
                .agg(
                    _d128(F.col("x")).alias("fast"),
                    F.sum(F.col("x").cast("decimal(28,6)")).alias("ref"),
                )
                .collect()
            )
            assert len(rows) == 23
            for r in rows:
                assert str(r.fast) == str(r.ref), (ansi, r)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prior)


def test_scale12_twin_matches(spark):
    """rsum12's decimal(38,12) form."""
    vals = _adversarial_values()[:5000]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    r = df.agg(
        _d128(F.round("x", 12), 38, 12).alias("fast"),
        F.sum(F.round("x", 12).cast("decimal(38,12)")).alias("ref"),
    ).collect()[0]
    assert str(r.fast) == str(r.ref)


def test_scale18_twin_matches(spark):
    """dsum_scaled's decimal(28,18) form (pagerank's rank sums): fast
    vs built-in compared as decimal strings, plus the dsum_scaled
    wrapper itself vs its own fallback. Values bounded to the (28,18)
    domain (|x| < 10^10)."""
    rng = random.Random(29)
    vals = [rng.uniform(-1e5, 1e5) for _ in range(3000)]
    vals += [rng.uniform(-1, 1) * 10 ** rng.randint(-18, 9) for _ in range(3000)]
    vals += [(k + 0.5) / 1e18 for k in range(-200, 200)]
    df = spark.createDataFrame(
        [(i % 17, v) for i, v in enumerate(vals)], "k int, x double"
    ).repartition(8)
    rows = (
        df.groupBy("k")
        .agg(
            _d128(F.col("x"), 28, 18).alias("fast"),
            F.sum(F.col("x").cast("decimal(28,18)")).alias("ref"),
            exact.dsum_scaled("x", 28, 18).alias("wrapped"),
        )
        .collect()
    )
    assert len(rows) == 17
    for r in rows:
        assert str(r.fast) == str(r.ref), r
        assert r.wrapped == float(r.ref), r


def test_dsum_scaled_fallback_equal(spark, monkeypatch):
    df = spark.createDataFrame([(0.125,), (7.5,), (None,)], "x double")
    fast = df.agg(exact.dsum_scaled("x", 28, 18).alias("s")).collect()[0]
    monkeypatch.setattr(exact, "_dsum128", lambda *a, **k: None)
    slow = df.agg(exact.dsum_scaled("x", 28, 18).alias("s")).collect()[0]
    assert fast == slow


def test_null_nan_inf_semantics(spark):
    df = spark.createDataFrame(
        [(1, None), (1, float("nan")), (1, float("inf")), (1, float("-inf")), (2, 1.5)],
        "k int, x double",
    )
    rows = (
        df.groupBy("k")
        .agg(
            _d128(F.col("x")).alias("fast"),
            F.sum(F.col("x").cast("decimal(28,6)")).alias("ref"),
        )
        .orderBy("k")
        .collect()
    )
    # group 1 is all-invalid -> NULL in both forms; group 2 sums normally
    assert rows[0].fast is None and rows[0].ref is None
    assert str(rows[1].fast) == str(rows[1].ref) == "1.500000"


def test_ansi_overflow_parity_adversarial_magnitudes(spark):
    """|x| >= 10^22 cannot be represented as decimal(28,6): the built-in
    cast errors under ANSI and yields NULL (skipped row) otherwise; the
    fast path must do the same, not wrap."""
    df = spark.createDataFrame([(1e30,), (1.0,)], "x double")
    prior = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        with pytest.raises(Exception):
            df.agg(F.sum(F.col("x").cast("decimal(28,6)"))).collect()
        with pytest.raises(Exception):
            df.agg(_d128(F.col("x"))).collect()
        spark.conf.set("spark.sql.ansi.enabled", "false")
        r = df.agg(
            _d128(F.col("x")).alias("fast"),
            F.sum(F.col("x").cast("decimal(28,6)")).alias("ref"),
        ).collect()[0]
        # non-ANSI: the 1e30 row is skipped by both; 1.0 survives
        assert str(r.fast) == str(r.ref) == "1.000000"
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prior)


def test_group_total_beyond_input_precision(spark):
    """sum(decimal(28,6)) widens to decimal(38,6): group totals in
    (10^22, 10^32) are legal and must not error (regression test for the
    result-precision bound)."""
    df = spark.createDataFrame([(9e21,)] * 20, "x double")
    r = df.agg(
        _d128(F.col("x")).alias("fast"),
        F.sum(F.col("x").cast("decimal(28,6)")).alias("ref"),
    ).collect()[0]
    assert str(r.fast) == str(r.ref)
    assert r.fast == 20 * 9 * 10**21


def test_integral_child_exact(spark):
    """Integral inputs scale exactly (a 2^62 long would lose precision
    through a double detour)."""
    df = spark.createDataFrame(
        [(1, 2**62), (1, -(2**61)), (2, 123), (2, None)], "k int, i long"
    )
    rows = (
        df.groupBy("k")
        .agg(
            _d128(F.col("i")).alias("fast"),
            F.sum(F.col("i").cast("decimal(28,6)")).alias("ref"),
        )
        .orderBy("k")
        .collect()
    )
    for r in rows:
        assert str(r.fast) == str(r.ref)


def test_result_type_parity(spark):
    df = spark.createDataFrame([(1.0,)], "x double")
    fast_t = df.agg(_d128(F.col("x"))).schema[0].dataType
    ref_t = df.agg(F.sum(F.col("x").cast("decimal(28,6)"))).schema[0].dataType
    assert fast_t == ref_t  # DecimalType(38,6)


def test_dsum_fallback_when_probe_fails(spark, monkeypatch):
    """With the jar 'unavailable', dsum/davg/dstddev/rsum12 emit the
    built-in decimal form and still compute the same values — the
    driver's plain-session path."""
    df = spark.createDataFrame([(1.25,), (2.5,), (None,)], "x double")
    fast = df.agg(
        exact.dsum("x").alias("s"),
        exact.davg("x").alias("a"),
        exact.dstddev("x").alias("d"),
        exact.rsum12("x").alias("r"),
    ).collect()[0]
    monkeypatch.setattr(exact, "_dsum128", lambda *a, **k: None)
    slow = df.agg(
        exact.dsum("x").alias("s"),
        exact.davg("x").alias("a"),
        exact.dstddev("x").alias("d"),
        exact.rsum12("x").alias("r"),
    ).collect()[0]
    assert fast == slow
