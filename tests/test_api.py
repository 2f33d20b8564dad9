"""DataCleaner facade: the reference's interactive loop, headless.
Scenario mirrors the reference demo [P]: profile → see problems →
fix string mismatch → fix missing → fix outliers → problems gone."""

from pyspark.sql import functions as F

from ipydataclean_spark.api import DataCleaner
from ipydataclean_spark.operators.qhelp import lineitem_dirty


def _problem_kinds(cleaner, cols):
    return {(c, k) for (c, k, _n) in cleaner.problems(cols)}


def test_interactive_cleaning_loop(spark, sf_dir):
    df = lineitem_dirty(spark, sf_dir).select(
        "l_orderkey", "l_linenumber", "quantity_str", "price_out"
    )
    cleaner = DataCleaner(df)

    kinds = _problem_kinds(cleaner, ["quantity_str", "price_out"])
    assert ("quantity_str", "missing") in kinds
    assert ("quantity_str", "string_mismatch") in kinds
    assert ("price_out", "outliers") in kinds

    n0 = df.count()
    cleaner.apply_fix("quantity_str", "string_mismatch", "convert_numeric")
    cleaner.apply_fix("quantity_str", "missing", "fill_median")
    cleaner.apply_fix("price_out", "outliers", "clip")

    assert cleaner.df.count() == n0  # no fix above drops rows
    assert cleaner.df.where(F.col("quantity_str").isNull()).count() == 0
    assert _problem_kinds(cleaner, ["quantity_str", "price_out"]) == set()
    assert [h["fix"] for h in cleaner.history] == ["convert_numeric", "fill_median", "clip"]


def test_drop_rows_fix(spark, sf_dir):
    df = lineitem_dirty(spark, sf_dir).select("l_orderkey", "quantity_str")
    cleaner = DataCleaner(df)
    n_null = df.where(F.col("quantity_str").isNull()).count()
    cleaner.apply_fix("quantity_str", "missing", "drop_rows")
    assert cleaner.df.count() == df.count() - n_null


def test_reset_restores_source(spark, sf_dir):
    df = lineitem_dirty(spark, sf_dir).select("l_orderkey", "quantity_str")
    cleaner = DataCleaner(df)
    cleaner.apply_fix("quantity_str", "missing", "fill_value", value="0")
    assert cleaner.reset().df is df and cleaner.history == []


def test_to_code_reflects_history(spark, sf_dir):
    df = lineitem_dirty(spark, sf_dir).select("l_orderkey", "quantity_str")
    cleaner = DataCleaner(df)
    cleaner.apply_fix("quantity_str", "string_mismatch", "convert_numeric")
    code = cleaner.to_code()
    assert "TRY_CAST" in code and code.startswith("from pyspark.sql import functions as F")
