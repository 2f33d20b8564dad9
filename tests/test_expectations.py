"""Expectation-suite semantics + the one-pass plan guarantee."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from ipydataclean_spark.operators.expectations import Suite, x1_expectations
from ipydataclean_spark.plans import plan_tree


def test_x1_single_scan_single_agg(spark, sf_dir):
    """However many checks the suite carries, the plan holds ONE
    parquet scan and one global aggregate pair (partial+final)."""
    df = x1_expectations(spark, sf_dir)
    tree = plan_tree(df)
    scans = [l for l in tree if "Scan parquet" in l or "Relation" in l]
    assert len(scans) == 1, "\n".join(tree)
    joins = [l for l in tree if "Join" in l]
    assert not joins, "\n".join(tree)


def test_x1_verdicts(spark, sf_dir):
    rows = {r.check_name: r for r in x1_expectations(spark, sf_dir).collect()}
    assert len(rows) == 9
    assert not rows["uniqueness_l_orderkey"].passed  # ~4 lines/order
    assert rows["bounds_l_discount"].passed
    assert rows["contained_l_returnflag"].passed
    assert rows["size"].passed
    for r in rows.values():
        assert r.metric is not None


def test_suite_semantics_on_known_data(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, v=10.0, s="a"),
            Row(k=2, v=None, s="b"),
            Row(k=2, v=30.0, s="zz"),
            Row(k=4, v=50.0, s=None),
        ]
    )
    suite = (
        Suite()
        .completeness("v", 0.8)        # 3/4 = 0.75 -> fail
        .uniqueness("k", 1.0)          # 3 distinct / 4 -> fail
        .bounds("v", 0.0, 100.0)       # all non-null in range -> pass
        .mean_between("v", 29.0, 31.0) # exact mean 30 -> pass
        .contained_in("s", ["a", "b"], 0.5)  # 2/4 -> pass
        .matches("s", "^[a-b]$", 0.6)  # 2/4 = 0.5 -> fail
        .size_between(4, 4)            # pass
    )
    got = {r.check_name: r for r in suite.evaluate(df).collect()}
    assert got["completeness_v"].metric == 0.75 and not got["completeness_v"].passed
    assert got["uniqueness_k"].metric == 0.75 and not got["uniqueness_k"].passed
    assert got["bounds_v"].passed
    assert got["mean_v"].metric == 30.0 and got["mean_v"].passed
    assert got["contained_s"].metric == 0.5 and got["contained_s"].passed
    assert got["matches_s"].metric == 0.5 and not got["matches_s"].passed
    assert got["size"].metric == 4.0 and got["size"].passed


def test_duplicate_check_name_rejected(spark):
    with pytest.raises(ValueError, match="duplicate"):
        Suite().completeness("v", 0.5).completeness("v", 0.9)


def test_cleaner_validate_gate(spark, sf_dir):
    """DataCleaner.validate: the post-clean accept gate — a fix
    session must flip a failing completeness check to green."""
    from ipydataclean_spark.api import DataCleaner
    from ipydataclean_spark.operators.qhelp import lineitem_dirty

    dc = DataCleaner(
        lineitem_dirty(spark, sf_dir).select("l_orderkey", "qty_parsed")
    )
    suite = Suite().completeness("qty_parsed", 1.0)
    failing = dc.validate(suite)
    assert [f["check"] for f in failing] == ["completeness_qty_parsed"]

    dc.apply_fix("qty_parsed", "missing", "fill_median")
    assert dc.validate(suite) == []


def test_unique_rows_and_freshness_checks(spark):
    from pyspark.sql import Row

    df = spark.createDataFrame(
        [
            Row(a=1, b="x", ts="2024-01-01 00:00:00"),
            Row(a=1, b="y", ts="2024-06-01 00:00:00"),
            Row(a=1, b="y", ts="2024-03-01 00:00:00"),
        ]
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # two fresh_after on the same column collide on check name
    import pytest as _pytest

    with _pytest.raises(ValueError, match="duplicate"):
        (
            Suite()
            .fresh_after("ts", "2024-05-01T00:00:00")
            .fresh_after("ts", "2025-01-01T00:00:00")
        )

    suite3 = (
        Suite()
        .unique_rows(["a"], 1.0)
        .unique_rows(["a", "b"], 0.6)
        .fresh_after("ts", "2024-05-01T00:00:00")
    )
    got = {r.check_name: r for r in suite3.evaluate(df).collect()}
    assert not got["unique_a"].passed and got["unique_a"].metric == pytest.approx(1 / 3, abs=1e-6)
    assert got["unique_a_b"].passed
    assert got["fresh_ts"].passed


def test_unique_rows_null_parity_with_sql_twin(spark, tmp_path):
    """Regression (review finding): Spark countDistinct excludes
    tuples containing NULL; the generated SQL twin must agree instead
    of counting ROW(NULL, x) as distinct."""
    import duckdb

    df = spark.createDataFrame(
        [(1, "x"), (None, "x"), (2, "y"), (None, "z")], "a INT, b STRING"
    )
    path = str(tmp_path / "t.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(path)
    suite = Suite().unique_rows(["a", "b"], 0.5)
    spark_row = suite.evaluate(df).first()
    con = duckdb.connect()
    try:
        con.sql(f"CREATE VIEW src AS SELECT * FROM '{path}/*.parquet'")
        duck_row = con.sql(suite.to_sql("src")).fetchone()
    finally:
        con.close()
    # 2 non-null-tuple distinct / 4 rows on BOTH engines
    assert spark_row.metric == 0.5 == duck_row[1]
    assert spark_row.passed and duck_row[2]


def test_commit_to_gated_by_suite(spark, sf_dir, tmp_path):
    """validate-then-commit: a failing expectation blocks the MERGE
    (table version unchanged); after the fix, the commit lands and
    the table holds the cleaned rows."""
    from ipydataclean_spark.api import DataCleaner
    from ipydataclean_spark.operators.qhelp import lineitem_dirty
    from ipydataclean_spark.sources.txlog import TxTable

    base = (
        lineitem_dirty(spark, sf_dir)
        .select("l_orderkey", "l_linenumber", "qty_parsed")
        .withColumn(
            "rid", F.col("l_orderkey") * 100 + F.col("l_linenumber")
        )
        .select("rid", "qty_parsed")
    )
    t = TxTable.create(spark, str(tmp_path / "t"), base)
    dc = DataCleaner(base)
    gate = Suite().completeness("qty_parsed", 1.0)

    with pytest.raises(ValueError, match="expectation gate failed"):
        dc.commit_to(t, key="rid", suite=gate)
    assert t.version() == 0, "failed gate must publish nothing"

    dc.apply_fix("qty_parsed", "missing", "fill_median")
    v = dc.commit_to(t, key="rid", suite=gate)
    assert v == 1
    assert t.read().where(F.col("qty_parsed").isNull()).count() == 0
    assert t.read().count() == base.count()


def test_split_partitions_rows_and_names_all_violations(spark):
    from ipydataclean_spark.operators.expectations import Suite

    df = spark.createDataFrame(
        [(1, 10.0, "A"), (2, None, "A"), (3, 500.0, "Z"), (4, None, "Z")],
        "id long, v double, flag string",
    )
    suite = (
        Suite()
        .completeness("v", 1.0)
        .bounds("v", 0.0, 100.0)
        .contained_in("flag", ["A", "B"], 1.0)
    )
    good, bad = suite.split(df)
    assert [r.id for r in good.orderBy("id").collect()] == [1]
    rows = {r.id: r.failed_checks for r in bad.collect()}
    assert rows[2] == "completeness_v"
    assert rows[3] == "bounds_v,contained_flag"
    assert rows[4] == "completeness_v,contained_flag"
    # split is lossless
    assert good.count() + bad.count() == df.count()


def test_split_requires_row_level_checks(spark):
    import pytest as _pytest

    from ipydataclean_spark.operators.expectations import Suite

    df = spark.range(3)
    with _pytest.raises(ValueError):
        Suite().size_between(0, 10).split(df)


def test_matches_decimal_equals_regex_on_adversarial_inputs(spark):
    """The regex-free matches_decimal predicate must agree with rlike
    on ^[0-9]+(\\.[0-9]+)?\\z for every shape of input, including
    NULL propagation, empty strings, and trailing line terminators
    (the reason the suite anchors with \\z, not $)."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    cases = [
        "123", "0", "1.5", "12.34", "0.0",
        "", ".", "..", ".5", "5.", "1..5", "1.2.3",
        "N/A", "12 kg", " 12", "12 ", "+1", "-1", "1e5", "0x1f",
        "١٢٣", "12.", ".12", "1.2a", "a1.2", "%", "_", "1_000",
        # line-terminator edges: Java's $ matches BEFORE a final
        # newline, \z does not — the suite anchors with \z so both
        # engines and the translate predicate agree these FAIL
        "123\n", "1.5\n", "1.5\r", "12\r\n", "\n", "1\n2",
        None,
    ]
    df = spark.createDataFrame([Row(i=i, s=s) for i, s in enumerate(cases)])
    rest = F.translate(F.col("s"), "0123456789", "")
    codegen = ((rest == "") & (F.length("s") >= 1)) | (
        (rest == ".") & ~F.col("s").startswith(".") & ~F.col("s").endswith(".")
    )
    out = df.select(
        "i", "s",
        F.col("s").rlike("^[0-9]+(\\.[0-9]+)?\\z").alias("re"),
        codegen.alias("cg"),
    ).collect()
    for r in out:
        assert r.re == r.cg, (r.s, r.re, r.cg)


def test_x3b_codegen_quarantine_row_equal_to_x3(spark, sf_dir):
    """x3b (regex-free conformity predicate) must route EXACTLY the
    rows x3 routes, with identical reason strings."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    a = [tuple(r) for r in QUERIES["x3_quarantine"]["fn"](spark, sf_dir).collect()]
    b = [tuple(r) for r in QUERIES["x3b_quarantine_codegen"]["fn"](spark, sf_dir).collect()]
    assert a == b
    assert a, "quarantine unexpectedly empty"
