"""Recipe.to_sql (DuckDB-dialect export) value-parity: every fluent
step's SQL twin must reproduce the Spark execution exactly. The
convert/fill-mean/clip/one-hot chain is driver-hash-verified via the
registered ``recipe_sql_export`` query; this covers the remaining
steps and branches."""

import math

import duckdb
import pytest
from pyspark.sql import Row

from ipydataclean_spark.recipe import Recipe, java_format_to_strptime


@pytest.fixture()
def messy(spark, tmp_path):
    rows = [
        Row(id=1, qty="1,200", w="12kg", d="2024-01-05", seg="A", v=10.0),
        Row(id=2, qty=None, w="3lb", d="01/07/2024", seg="B", v=None),
        Row(id=3, qty="7", w="250g", d="bogus", seg="A", v=30.0),
        Row(id=4, qty="7", w="2kg", d="2024-02-01", seg="C", v=20.0),
        Row(id=5, qty="N/A", w=None, d=None, seg="B", v=40.0),
        Row(id=6, qty="1,200", w="5kg", d="2024-03-09", seg="A", v=50.0),
    ]
    df = spark.createDataFrame(rows)
    path = str(tmp_path / "messy.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return df, path


def _duck(path, sql):
    con = duckdb.connect()
    try:
        con.sql(f"CREATE VIEW src AS SELECT * FROM '{path}/*.parquet'")
        rel = con.sql(sql)
        return rel.columns, rel.fetchall()
    finally:
        con.close()


def _compare(spark_df, duck_out, key="id"):
    got = {r[key]: r.asDict() for r in spark_df.collect()}
    cols, data = duck_out
    for tup in data:
        row = dict(zip(cols, tup))
        srow = got.pop(row[key])
        for c, v in row.items():
            sv = srow[c]
            if isinstance(v, float) and isinstance(sv, float):
                assert math.isclose(sv, v, rel_tol=0, abs_tol=1e-9), (row[key], c, sv, v)
            else:
                assert sv == v, (row[key], c, sv, v)
    assert not got, f"spark-only rows: {sorted(got)}"


@pytest.mark.parametrize("strategy", ["mean", "median", "mode"])
def test_fill_aggregate_twins(spark, messy, strategy):
    df, path = messy
    r = Recipe().fill_aggregate("v", strategy)
    _compare(r.apply(df), _duck(path, r.to_sql("src")))


@pytest.mark.parametrize("method", ["zscore", "minmax"])
def test_scale_twins(spark, messy, method):
    df, path = messy
    r = Recipe().scale("v", method, out="v_s")
    _compare(r.apply(df), _duck(path, r.to_sql("src")))


def test_scale_constant_column_branch(spark, tmp_path):
    df = spark.createDataFrame([Row(id=1, v=5.0), Row(id=2, v=5.0), Row(id=3, v=None)])
    path = str(tmp_path / "const.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    for method in ("zscore", "minmax"):
        r = Recipe().scale("v", method, out="v_s")
        _compare(r.apply(df), _duck(path, r.to_sql("src")))


def test_standardize_units_empty_conversions_sql(spark, messy):
    # headless-autofix identity map: zero conversions must still export
    # VALID SQL (factor literal 1.0, no zero-arm CASE) and match the
    # DataFrame path — ADVICE r04 medium
    df, path = messy
    r = Recipe().standardize_units("w", {}, out="w_n")
    sql = r.to_sql("src")
    assert "CASE" not in sql
    _compare(r.apply(df), _duck(path, sql))


def test_parse_dates_units_redact_chain(spark, messy):
    df, path = messy
    r = (
        Recipe()
        .parse_dates("d", ["yyyy-MM-dd", "MM/dd/yyyy"], out="d2")
        .standardize_units("w", {"kg": 1.0, "g": 0.001, "lb": 0.45359237}, out="w_kg")
        .redact("qty", {r"[0-9]": "#"}, out="q_red")
    )
    _compare(r.apply(df), _duck(path, r.to_sql("src")))


def test_fill_drop_dedup_chain(spark, messy):
    df, path = messy
    r = (
        Recipe()
        .fill_value("qty", "0")
        .drop_missing(["w"])
        .dedup(["qty"], "id")
    )
    _compare(r.apply(df), _duck(path, r.to_sql("src")))


def test_java_format_translation():
    assert java_format_to_strptime("yyyy-MM-dd") == "%Y-%m-%d"
    assert java_format_to_strptime("MM/dd/yyyy HH:mm:ss") == "%m/%d/%Y %H:%M:%S"


def test_to_sql_raises_on_step_without_twin(spark):
    r = Recipe().add("custom", lambda df: df, "df = df")
    with pytest.raises(ValueError, match="no SQL twin"):
        r.to_sql("src")


# ---------------------------------------------------------------------------
# Property: RANDOM recipe compositions stay value-identical to their
# generated SQL (per-step parity is pinned above; composition is the
# space where CTE chaining bugs would hide)
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_steps = st.lists(
    st.sampled_from(
        ["fill_value", "fill_mean", "fill_median", "clip", "drop_missing",
         "dedup", "scale_z", "scale_mm", "redact"]
    ),
    min_size=1,
    max_size=4,
)


@given(names=_steps)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_random_recipe_chain_matches_generated_sql(spark, tmp_path_factory, names):
    df = spark.createDataFrame(
        [
            (1, 10.0, "a1"),
            (2, None, "b2"),
            (3, 250.0, "c3"),
            (4, 10.0, None),
            (5, -40.0, "a1"),
        ],
        "id LONG, v DOUBLE, s STRING",
    )
    d = str(tmp_path_factory.mktemp("rchain"))
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/src")

    r = Recipe()
    for n in names:
        if n == "fill_value":
            r = r.fill_value("v", 7.5)
        elif n == "fill_mean":
            r = r.fill_aggregate("v", "mean")
        elif n == "fill_median":
            r = r.fill_aggregate("v", "median")
        elif n == "clip":
            r = r.clip("v", 0.0, 100.0)
        elif n == "drop_missing":
            r = r.drop_missing(["s"])
        elif n == "dedup":
            r = r.dedup(["s"], "id")
        elif n == "scale_z":
            r = r.scale("v", "zscore", out="vz")
        elif n == "scale_mm":
            r = r.scale("v", "minmax", out="vm")
        else:
            r = r.redact("s", {r"[0-9]": "#"}, out="sr")

    _compare(r.apply(df), _duck(f"{d}/src", r.to_sql("src")))
