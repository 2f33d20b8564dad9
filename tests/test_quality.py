"""Semantic checks for the data-quality extensions (operators/quality.py).
Oracle hash-parity is covered by tools/verify_local.py; these pin the
semantics the oracle can't see (flags, conversions, bounds)."""

from pyspark.sql import functions as F

from ipydataclean_spark.catalog import load_table
from ipydataclean_spark.registry import QUERIES, load_all

load_all()


def q(name, spark, sf_dir):
    return QUERIES[name]["fn"](spark, sf_dir)


def test_parse_dates_multi_roundtrip(spark, sf_dir):
    """Every non-junk format variant must parse back to o_orderdate;
    junk rows (orderkey % 37 == 0) must be NULL."""
    parsed = q("c19_parse_dates_multi", spark, sf_dir)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("expect")
    )
    j = parsed.join(orders, "o_orderkey")
    bad = j.where(
        (F.col("o_orderkey") % 37 == 0) & F.col("parsed_date").isNotNull()
    ).count()
    wrong = j.where(
        (F.col("o_orderkey") % 37 != 0) & (F.col("parsed_date") != F.col("expect"))
    ).count()
    missed = j.where(
        (F.col("o_orderkey") % 37 != 0) & F.col("parsed_date").isNull()
    ).count()
    assert bad == 0 and wrong == 0 and missed == 0


def test_standardize_units_recovers_quantity(spark, sf_dir):
    """All three unit spellings must normalize back to l_quantity kg.
    Compared in-row (the fixture's (orderkey, linenumber) is NOT a
    unique key, so a join compare would multiply rows)."""
    from ipydataclean_spark.operators.quality import WEIGHT_STR

    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "weight_str", F.expr(WEIGHT_STR)
    )
    num = F.regexp_extract("weight_str", r"^([0-9.]+)", 1).try_cast("double")
    unit = F.regexp_extract("weight_str", r"([a-z]+)$", 1)
    kg = num * F.when(unit == "g", F.lit(0.001)).otherwise(F.lit(1.0))
    j = li.withColumn("weight_kg", kg)
    off = j.where(F.abs(F.col("weight_kg") - F.col("l_quantity")) > 1e-9).count()
    assert off == 0
    assert j.where(F.col("weight_kg").isNull()).count() == 0
    # and the registered op emits one row per input row, none null
    w = q("c20_standardize_units", spark, sf_dir)
    assert w.count() == li.count()
    assert w.where(F.col("weight_kg").isNull()).count() == 0


def test_mad_outliers_subset_of_injected(spark, sf_dir):
    """MAD-robust detection must flag exactly the injected ×1000 rows
    (orderkey % 101 == 0) on this fixture — no false positives at
    threshold 3.5 given the price distribution."""
    out = q("d3c_outliers_mad", spark, sf_dir)
    assert out.where(F.col("l_orderkey") % 101 != 0).count() == 0
    assert out.count() > 0


def test_constraint_suite_flags(spark, sf_dir):
    row = q("p13_constraint_suite", spark, sf_dir).first()
    assert row.orderkey_unique is True
    assert row.totalprice_nonneg is True
    assert row.n_status_valid == row.n_rows
    assert row.n_priority_wellformed == row.n_rows
    assert row.n_distinct_orderkey == row.n_rows


def test_ks_stat_bounds_and_null_case(spark, sf_dir):
    """KS ∈ [0, 1]; an even/odd orderkey split of the same distribution
    must show SMALL drift (same generator both halves)."""
    ks = q("d7_drift_ks", spark, sf_dir).first().ks_stat
    assert 0.0 <= ks <= 1.0
    assert ks < 0.2, f"even/odd split of one distribution drifted: {ks}"


def test_pattern_validity_partition(spark, sf_dir):
    """Shape classes must cover the column: null + numeric + unit + NA
    == all rows (fixture dirt has no other shapes)."""
    row = q("d8_pattern_validity", spark, sf_dir).first()
    total = load_table(spark, sf_dir, "lineitem").count()
    assert row.n_null + row.n_numeric + row.n_with_unit + row.n_na_marker == total


def test_resample_grid_contiguous_and_mass_conserving(spark, sf_dir):
    """C21: per-user hourly grid has no gaps; bucket counts sum back to
    the filtered event count; ffill leaves no NULL after first bucket."""
    out = q("c21_resample_timeseries", spark, sf_dir).cache()
    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") % 15 == 0)
    assert out.agg(F.sum("n_events")).first()[0] == ev.count()
    # gapless: per user, (#grid rows - 1) hours between min and max
    spans = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        ((F.unix_timestamp(F.max("h")) - F.unix_timestamp(F.min("h"))) / 3600 + 1).alias(
            "expect_n"
        ),
    )
    assert spans.where(F.col("n") != F.col("expect_n")).count() == 0
    # after the first non-empty bucket, v_filled is never NULL
    w_ok = out.where(F.col("v_filled").isNull() & (F.col("n_events") > 0)).count()
    assert w_ok == 0
    out.unpersist()


def test_pii_redaction_removes_all_addresses(spark, sf_dir):
    out = q("l16_pii_redact", spark, sf_dir)
    leaked = out.where(F.col("redacted").rlike("[a-z0-9._]+@[a-z0-9.-]+")).count()
    assert leaked == 0
    n_flagged = out.where("had_email").count()
    assert n_flagged == out.where(F.col("doc_id") % 7 == 0).count()


def test_recipe_featprep_steps_roundtrip(spark, sf_dir):
    """New fluent steps (parse_dates / standardize_units / scale /
    one_hot / redact) compose in a Recipe and exec(to_code()) ≡ apply."""
    from ipydataclean_spark.operators.quality import WEIGHT_STR
    from ipydataclean_spark.recipe import Recipe

    df = load_table(spark, sf_dir, "lineitem").withColumn(
        "weight_str", F.expr(WEIGHT_STR)
    )
    recipe = (
        Recipe()
        .standardize_units("weight_str", {"g": 0.001, "kg": 1.0}, out="w_kg")
        .scale("w_kg", method="zscore", out="w_z")
        .scale("w_kg", method="minmax", out="w_mm")
        .one_hot("l_returnflag", ["A", "N", "R"])
    )
    direct = recipe.apply(df)
    got = direct.agg(
        F.sum("w_z"), F.sum("w_mm"), F.sum("l_returnflag__a")
    ).first()
    code = recipe.to_code("source_df")
    ns = {"source_df": df}
    exec(code, ns)  # noqa: S102 — round-trip contract
    via = ns["df"].agg(F.sum("w_z"), F.sum("w_mm"), F.sum("l_returnflag__a")).first()
    assert tuple(got) == tuple(via)
    # z-scored column is centered; minmax lands in [0, 1]
    stats = direct.agg(F.avg("w_z"), F.min("w_mm"), F.max("w_mm")).first()
    assert abs(stats[0]) < 1e-9
    assert stats[1] >= 0.0 and stats[2] <= 1.0


def test_one_hot_high_cardinality_fails_loud(spark, sf_dir):
    """Implicit value derivation on a high-cardinality column must
    raise (bounded collect), not OOM the driver / explode the schema
    (verdict r08 #5)."""
    import pytest as _pytest

    from ipydataclean_spark.operators.featprep import one_hot

    orders = load_table(spark, sf_dir, "orders")
    with _pytest.raises(ValueError, match="distinct values"):
        one_hot(orders, "o_orderkey", max_categories=50)
    # explicit values bypass the cap (the pipeline contract)
    out = one_hot(orders, "o_orderstatus", ["F", "O", "P"])
    assert {"o_orderstatus__f", "o_orderstatus__o", "o_orderstatus__p"} <= set(
        out.columns
    )


def test_md5_coin_sql_rejects_unsafe_salt():
    """A salt with a quote would inject into the oracle SQL string —
    must raise, not silently produce broken SQL (advice r08 #4)."""
    import pytest as _pytest

    from ipydataclean_spark.functions.exact import md5_coin_sql

    assert "'l2h:'" in md5_coin_sql("doc_id", salt="l2h")
    with _pytest.raises(ValueError, match="unsafe salt"):
        md5_coin_sql("doc_id", salt="x' || '")


def test_cusum_closed_form_flags_injected_shift(spark):
    """d16's closed form s_t = c_t - min(0, min c_j) must equal the
    textbook recursion s_t = max(0, s_{t-1} + d_t) exactly, and a
    sustained +20% level shift must raise the changepoint flag while
    the pre-shift half stays quiet."""
    from pyspark.sql import Window

    import ipydataclean_spark.functions.exact as exact

    # 40 "days": mean 100 for day<20, 120 after (sustained shift)
    rows = [(d, 100.0 + (20.0 if d >= 20 else 0.0) + (d % 3) - 1.0)
            for d in range(40)]
    daily = spark.createDataFrame(rows, "day int, m double")
    mu_val = sum(r[1] for r in rows) / len(rows)
    slack, h = 0.05 * mu_val, 0.2 * mu_val
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    c = daily.select(
        "day", "m",
        F.sum(F.round(F.col("m") - mu_val - slack, 8).cast("decimal(38,12)"))
        .over(w).cast("double").alias("csum"),
    )
    got = {
        r["day"]: (r["cusum"], r["flag"])
        for r in c.select(
            "day",
            F.round(F.col("csum") - F.least(F.min("csum").over(w), F.lit(0.0)), 8)
            .alias("cusum"),
            (F.col("csum") - F.least(F.min("csum").over(w), F.lit(0.0)) > h)
            .alias("flag"),
        ).collect()
    }
    # textbook recursion on the driver
    s, want = 0.0, {}
    for d, m in rows:
        s = max(0.0, s + round(m - mu_val - slack, 8))
        want[d] = s
    for d in range(40):
        assert abs(got[d][0] - want[d]) < 1e-6, d
    assert not any(got[d][1] for d in range(20)), "pre-shift must be quiet"
    assert any(got[d][1] for d in range(20, 40)), "shift must be caught"
