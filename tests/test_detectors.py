"""Detector invariants (§5.2.4): detectors find exactly the injected
dirt; cleaning a column empties its detector."""

from pyspark.sql import functions as F

from ipydataclean_spark.operators.cleaning import fill_aggregate
from ipydataclean_spark.operators.detectors import (
    detect_missing,
    detect_outliers_iqr,
    detect_string_mismatch,
)
from ipydataclean_spark.operators.qhelp import lineitem_dirty


def test_missing_matches_injection_rule(spark, sf_dir):
    df = lineitem_dirty(spark, sf_dir)
    got = detect_missing(df, "quantity_str").count()
    expect = df.where(F.col("l_orderkey") % 97 == 0).count()
    assert got == expect


def test_mismatch_matches_injection_rule(spark, sf_dir):
    df = lineitem_dirty(spark, sf_dir)
    got = detect_string_mismatch(df, "quantity_str").count()
    k = F.col("l_orderkey")
    na = (k % 89 == 0) & (k % 97 != 0)
    kg = (k % 83 == 0) & (k % 97 != 0) & (k % 89 != 0)
    assert got == df.where(na | kg).count()


def test_detector_empty_after_fix(spark, sf_dir):
    """D1 is empty after C2 on the same column — the reference's
    problem-disappears-after-fix loop [P]."""
    df = lineitem_dirty(spark, sf_dir)
    fixed = fill_aggregate(df, "qty_parsed", "mean")
    assert detect_missing(fixed, "qty_parsed").count() == 0


def test_outlier_detector_catches_injected(spark, sf_dir):
    df = lineitem_dirty(spark, sf_dir)
    out = detect_outliers_iqr(df, "price_out")
    injected = df.where(F.col("l_orderkey") % 101 == 0).count()
    assert out.count() >= injected  # every ×1000 row is an outlier
    flagged = {(r.l_orderkey, r.l_linenumber) for r in out.select("l_orderkey", "l_linenumber").collect()}
    for r in df.where(F.col("l_orderkey") % 101 == 0).select("l_orderkey", "l_linenumber").collect():
        assert (r.l_orderkey, r.l_linenumber) in flagged
