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
