"""Property-style invariants for cleaning ops (SURVEY.md §5.2.4) and
pandas-parity spot checks (§5.2.5 — the 'same semantics as the
reference' check while /root/reference is empty).
"""

import pandas as pd
from pyspark.sql import functions as F

from ipydataclean_spark.operators.cleaning import (
    clip,
    dedup_exact,
    fill_aggregate,
    fill_value,
    interpolate_linear,
)
from ipydataclean_spark.operators.qhelp import events_dirty, lineitem_dirty


def test_fills_never_change_rowcount(spark, sf_dir):
    df = lineitem_dirty(spark, sf_dir)
    n = df.count()
    assert fill_value(df, "qty_parsed", 0.0).count() == n
    assert fill_aggregate(df, "qty_parsed", "mean").count() == n
    assert fill_aggregate(df, "qty_parsed", "median").count() == n
    assert fill_aggregate(df, "qty_parsed", "mode").count() == n


def test_fill_leaves_no_nulls(spark, sf_dir):
    df = lineitem_dirty(spark, sf_dir)
    filled = fill_aggregate(df, "qty_parsed", "mean")
    assert filled.where(F.col("qty_parsed").isNull()).count() == 0


def test_drop_never_increases_rowcount(spark, sf_dir):
    df = lineitem_dirty(spark, sf_dir)
    n = df.count()
    assert df.na.drop(subset=["qty_parsed"]).count() <= n


def test_clip_bounds(spark, sf_dir):
    df = lineitem_dirty(spark, sf_dir)
    lo, hi = 1000.0, 50000.0
    clipped = clip(df, "price_out", lo, hi)
    row = clipped.agg(F.min("price_out"), F.max("price_out")).first()
    assert row[0] >= lo and row[1] <= hi


def test_dedup_idempotent(spark, sf_dir):
    df = lineitem_dirty(spark, sf_dir).withColumn(
        "k", (F.col("l_orderkey") % 100).cast("long")
    )
    once = dedup_exact(df, ["k"], "l_orderkey")
    twice = dedup_exact(once, ["k"], "l_orderkey")
    assert once.count() == twice.count() == 100


def test_interpolate_matches_pandas(spark, sf_dir):
    """Parity with pandas Series.interpolate(method='linear') — the
    reference's own semantics [P] — on the events gap fixture."""
    sdf = interpolate_linear(events_dirty(spark, sf_dir), "value_gap", "row_id")
    got = (
        sdf.select("row_id", "value_gap").orderBy("row_id").toPandas().set_index("row_id")
    )
    src = (
        events_dirty(spark, sf_dir)
        .select("row_id", "value_gap")
        .orderBy("row_id")
        .toPandas()
        .set_index("row_id")
    )
    expect = src["value_gap"].interpolate(method="linear", limit_direction="forward")
    pd.testing.assert_series_equal(
        got["value_gap"], expect, check_exact=False, rtol=1e-12, check_names=False
    )


def test_recipe_to_code_roundtrip(spark, sf_dir):
    """exec(to_code()) reproduces recipe.apply (§5.2.4)."""
    from ipydataclean_spark.recipe import Recipe

    recipe = Recipe().convert_numeric("quantity_str", out="qty2").fill_value("qty2", 0.0)
    df = lineitem_dirty(spark, sf_dir)
    direct = recipe.apply(df).agg(F.sum("qty2")).first()[0]

    code = recipe.to_code("source_df")
    ns = {"source_df": df}
    exec(code, ns)  # noqa: S102 — round-trip contract test
    via_code = ns["df"].agg(F.sum("qty2")).first()[0]
    assert direct == via_code


def test_global_interpolate_guarded_above_cap(spark):
    """The single-partition global interpolate form refuses large
    inputs instead of silently funneling them through one task."""
    import pytest
    from pyspark.sql import functions as F

    from ipydataclean_spark.operators.cleaning import interpolate_linear

    df = spark.range(100).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 3 == 0, F.col("id").cast("double")).alias("v"),
    )
    with pytest.raises(ValueError, match="partition_by"):
        interpolate_linear(df, "v", "row_id", max_global_rows=10)
    # under the cap the small-data pandas-parity form still works
    out = interpolate_linear(df, "v", "row_id", max_global_rows=1000)
    assert out.where(F.col("v").isNull()).count() == 0


def test_c39_ewma_matches_python_recurrence(spark, sf_dir):
    """The order-pinned fold must equal the textbook sequential
    recurrence computed independently in Python over the same
    (ts, event_id)-ordered values, per user, to the last bit."""
    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = {r.user_id: r for r in QUERIES["c39_exponential_smoothing"]["fn"](spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events").where("value is not null").collect()
    series = {}
    for e in sorted(ev, key=lambda e: (e.user_id, e.ts, e.event_id)):
        series.setdefault(e.user_id, []).append(e.value)
    assert set(rows) == set(series)
    for uid, vals in series.items():
        s = vals[0]
        for x in vals[1:]:
            s = s * 0.7 + x * 0.3
        r = rows[uid]
        assert r.ewma == s, (uid, r.ewma, s)
        assert r.n_events == len(vals)
        assert r.last_value == vals[-1]
        assert r.residual == vals[-1] - s


def test_events_dirty_rowid_branches_identical(spark, sf_dir, monkeypatch):
    """events_dirty's distributed global-rank branch (taken past the
    size gate — the round-13 fix for the serial unpartitioned
    row_number window, flat ~51 s at sf10 on any core count) must
    assign the IDENTICAL row_id per event as the plain window branch,
    and the same schema."""
    from ipydataclean_spark.operators import qhelp

    small = qhelp.events_dirty(spark, sf_dir)
    monkeypatch.setattr(qhelp, "_EVENTS_GLOBAL_ROWID_MAX_BYTES", -1)
    big = qhelp.events_dirty(spark, sf_dir)
    assert small.schema == big.schema
    a = {r.event_id: r.row_id for r in small.select("event_id", "row_id").collect()}
    b = {r.event_id: r.row_id for r in big.select("event_id", "row_id").collect()}
    assert a == b
