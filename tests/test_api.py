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


def test_extended_string_problems_and_fixes(spark):
    """dates / units / pii problem kinds detect and their fixes apply."""
    from pyspark.sql import Row

    from ipydataclean_spark.api import DataCleaner

    rows = [
        Row(
            id=i,
            d=f"2024-0{1 + i % 9}-11" if i % 2 == 0 else f"1{i % 9}/03/2024",
            w=f"{10 + i}.5 kg" if i % 3 else f"{(10 + i) * 1000}.0 g",
            note=f"call me at u{i}@mail.com" if i % 4 == 0 else "nothing here",
            qty=float(i),
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    cleaner = DataCleaner(df)
    kinds = {(c, k) for c, k, _ in cleaner.problems()}
    assert ("d", "dates") in kinds
    assert ("w", "units") in kinds
    assert ("note", "pii") in kinds
    assert ("d", "string_mismatch") not in kinds  # dates win over numerics

    cleaner.apply_fix("d", "dates", "parse_dates")
    cleaner.apply_fix("w", "units", "standardize_units", conversions={"g": 0.001, "kg": 1.0})
    cleaner.apply_fix("note", "pii", "redact")
    got = cleaner.df
    assert dict(got.dtypes)["d"] == "date"
    from pyspark.sql import functions as F2

    assert got.where(F2.col("d").isNull()).count() == 0
    assert got.where(F2.col("w").isNull()).count() == 0
    # grams rows converted into the same magnitude range as kg rows
    assert got.agg(F2.max("w")).first()[0] < 100
    assert got.where(F2.col("note").contains("@")).count() == 0
    assert got.where(F2.col("note").contains("[EMAIL]")).count() == 10
    # history + code export still line up
    assert [h["fix"] for h in cleaner.history] == [
        "parse_dates", "standardize_units", "redact"
    ]
    assert "parse_dates" in cleaner.to_code()


def test_drop_rows_for_dates_and_units(spark):
    """ADVICE r01: FIXES_FOR_PROBLEM advertises drop_rows for dates and
    units — apply_fix must implement both (previously KeyError)."""
    from pyspark.sql import Row

    from ipydataclean_spark.api import DataCleaner, FIXES_FOR_PROBLEM

    assert "drop_rows" in FIXES_FOR_PROBLEM["dates"]
    assert "drop_rows" in FIXES_FOR_PROBLEM["units"]

    rows = [
        Row(
            id=i,
            d="2024-03-11" if i % 3 else "not a date",
            w="12.5 kg" if i % 4 else "garbage",
        )
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)

    c1 = DataCleaner(df).apply_fix("d", "dates", "drop_rows")
    out1 = c1.df
    assert out1.count() == df.where("d <> 'not a date'").count()

    c2 = DataCleaner(df).apply_fix("w", "units", "drop_rows")
    out2 = c2.df
    assert out2.count() == df.where("w <> 'garbage'").count()

    # null values are kept (missing is its own problem kind)
    df_null = df.withColumn(
        "d", F.when(F.col("id") % 5 == 0, None).otherwise(F.col("d"))
    )
    c3 = DataCleaner(df_null).apply_fix("d", "dates", "drop_rows")
    assert c3.df.where(F.col("d").isNull()).count() == df_null.where(F.col("d").isNull()).count()


# ---------------------------------------------------------------------------
# Fused problems(): O(1) jobs regardless of column count (VERDICT r02 #2)
# ---------------------------------------------------------------------------


def _jobs_for(spark, group, fn):
    """Spark jobs launched by fn, with AQE off so each logical scan is
    exactly one job (AQE splits shuffle queries into per-stage jobs,
    which would make the count runtime- not plan-determined)."""
    sc = spark.sparkContext
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setJobGroup("", "")
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_quantiles_multi_matches_single(spark, sf_dir):
    from ipydataclean_spark.functions.quantiles import exact_quantiles, exact_quantiles_multi

    df = lineitem_dirty(spark, sf_dir)
    multi = exact_quantiles_multi(
        df, {"price_out": [0.25, 0.5, 0.75], "l_quantity": [0.25, 0.75]}
    )
    assert multi["price_out"] == exact_quantiles(df, "price_out", [0.25, 0.5, 0.75])
    assert multi["l_quantity"] == exact_quantiles(df, "l_quantity", [0.25, 0.75])


def test_quantiles_pull_threshold_invariant(spark):
    """pull_threshold (raised 131072 -> 524288, r12 optimization) is a
    pure performance knob: thresholds an order of magnitude apart
    force different descent depths on an outlier-stretched column yet
    must produce bit-identical quantiles, equal to the sorted-array
    ground truth."""
    from ipydataclean_spark.functions.quantiles import exact_quantiles

    # the d3 shape scaled down: dense cluster + x1000 outliers so the
    # value-uniform histogram concentrates mass in a few buckets
    df = spark.range(20000).select(
        F.when(F.col("id") % 1000 == 0, F.col("id").cast("double") * 1000.0)
        .otherwise((F.col("id") % 97).cast("double") / 7.0)
        .alias("v")
    )
    qs = [0.25, 0.5, 0.75, 0.99]
    deep = exact_quantiles(df, "v", qs, n_buckets=16, pull_threshold=64, max_levels=12)
    shallow = exact_quantiles(df, "v", qs, n_buckets=16, pull_threshold=8192, max_levels=12)
    default = exact_quantiles(df, "v", qs)
    assert deep == shallow == default
    vals = sorted(r.v for r in df.collect())
    for q, got in zip(qs, deep):
        r = (len(vals) - 1) * q
        k0 = int(r)
        k1 = min(k0 + 1, len(vals) - 1)
        exp = vals[k0] + (vals[k1] - vals[k0]) * (r - k0)
        assert got == exp, (q, got, exp)


def test_quantiles_pull_budget_wide_frame(spark):
    """Round-13 (VERDICT r12 #5): the DEFAULT pull_threshold is now a
    total driver budget divided by the simultaneous rank count, so a
    50-column profile pulls a bounded number of values in the worst
    case — and the budget-scaled descent still produces bit-identical
    results vs explicit small/large thresholds."""
    from ipydataclean_spark.functions import quantiles as Q

    n_cols = 50
    df = spark.range(4000).select(
        *[
            F.when(F.col("id") % 500 == c, F.col("id").cast("double") * 1000.0)
            .otherwise(((F.col("id") + c * 13) % 89).cast("double") / 3.0)
            .alias(f"c{c}")
            for c in range(n_cols)
        ]
    )
    specs = {f"c{c}": [0.25, 0.75] for c in range(n_cols)}
    # 50 cols x up to 4 distinct ranks: the budgeted default must sit
    # between floor and cap and bound the worst-case pull
    n_ranks = 4 * n_cols
    eff = Q._effective_pull_threshold(None, n_ranks)
    assert Q._PER_RANK_FLOOR <= eff <= Q._PER_RANK_CAP
    assert eff * n_ranks <= max(
        Q.PULL_BUDGET_VALUES, n_ranks * Q._PER_RANK_FLOOR
    )
    # explicit callers are untouched
    assert Q._effective_pull_threshold(1234, n_ranks) == 1234
    # and at a genuinely wide rank count the budget binds below the cap
    assert Q._effective_pull_threshold(None, 500) == Q.PULL_BUDGET_VALUES // 500

    default = Q.exact_quantiles_multi(df, specs)
    small = Q.exact_quantiles_multi(df, specs, pull_threshold=64, max_levels=12)
    large = Q.exact_quantiles_multi(df, specs, pull_threshold=8192)
    assert default == small == large


def test_quantiles_multi_edge_columns(spark):
    from ipydataclean_spark.functions.quantiles import exact_quantiles_multi

    df = spark.range(100).select(
        (F.col("id") * 2).alias("even"),
        F.lit(7.0).alias("constant"),
        F.lit(None).cast("double").alias("empty"),
    )
    got = exact_quantiles_multi(df, {"even": [0.5], "constant": [0.25], "empty": [0.5]})
    assert got["even"] == [99.0]
    assert got["constant"] == [7.0]
    assert got["empty"] == [None]


def test_problems_job_count_independent_of_columns(spark, sf_dir):
    """problems() launches a column-count-independent number of jobs:
    profile scan + fused quantile pass + one global counter agg."""
    base = lineitem_dirty(spark, sf_dir)
    wide = base.select(
        "quantity_str",
        "price_out",
        *[F.col("l_quantity").alias(f"n{i}") for i in range(5)],
        *[F.col("l_extendedprice").alias(f"x{i}") for i in range(4)],
    )  # 10 numeric + 1 string = 11 columns
    narrow = base.select("quantity_str", "price_out")

    n_narrow = _jobs_for(spark, "probs-narrow", lambda: DataCleaner(narrow).problems())
    n_wide = _jobs_for(spark, "probs-wide", lambda: DataCleaner(wide).problems())
    assert n_wide == n_narrow, f"jobs grew with column count: {n_narrow} -> {n_wide}"
    # profile scan + fused histogram + fused bucket pull + global counter agg
    assert n_wide <= 4, f"problems() used {n_wide} jobs; budget is 4"


def test_suggest_maps_problems_to_fix_menu(spark, sf_dir):
    """suggest() = problems() + the per-kind fix menu; every listed fix
    name must be accepted by apply_fix's dispatch table."""
    import inspect

    from ipydataclean_spark.api import DataCleaner
    from ipydataclean_spark.operators.qhelp import lineitem_dirty

    dc = DataCleaner(lineitem_dirty(spark, sf_dir).select(
        "l_quantity", "quantity_str", "qty_parsed", "price_out"
    ))
    sugg = dc.suggest()
    assert sugg, "dirty fixture must surface problems"
    kinds = {s["problem"] for s in sugg}
    assert "missing" in kinds or "string_mismatch" in kinds
    src = inspect.getsource(DataCleaner.apply_fix)
    for s in sugg:
        assert s["fixes"], s
        for fix in s["fixes"]:
            assert f'"{fix}"' in src, f"fix {fix!r} not dispatchable"


def test_to_sql_export_of_fix_session(spark, sf_dir):
    """A fix session built through apply_fix exports to SQL that DuckDB
    parses and that reproduces the Spark result."""
    import duckdb

    from ipydataclean_spark.api import DataCleaner
    from ipydataclean_spark.operators.qhelp import lineitem_dirty

    base = lineitem_dirty(spark, sf_dir).select("l_orderkey", "quantity_str")
    dc = (
        DataCleaner(base)
        .apply_fix("quantity_str", "string_mismatch", "convert_numeric", out="q")
        .apply_fix("q", "missing", "fill_median")
    )
    sql = dc.to_sql("src")
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        base.coalesce(1).write.mode("overwrite").parquet(f"{d}/src")
        con = duckdb.connect()
        con.sql(f"CREATE VIEW src AS SELECT * FROM '{d}/src/*.parquet'")
        duck = dict(con.sql(
            f"SELECT l_orderkey, SUM(q) FROM ({sql}) GROUP BY 1"
        ).fetchall())
        con.close()
    got = {
        r[0]: r[1]
        for r in dc.df.groupBy("l_orderkey").agg(F.sum("q")).collect()
    }
    assert len(got) == len(duck)
    import math

    for k, v in duck.items():
        assert math.isclose(got[k], v, rel_tol=0, abs_tol=1e-9)


def test_quarantine_routes_rows_with_reasons(spark, sf_dir):
    from ipydataclean_spark.api import DataCleaner
    from ipydataclean_spark.operators.expectations import Suite
    from ipydataclean_spark.operators.qhelp import lineitem_dirty

    dc = DataCleaner(lineitem_dirty(spark, sf_dir))
    suite = Suite().completeness("qty_parsed", 1.0).bounds("l_discount", 0.0, 0.1)
    good, bad = dc.quarantine(suite)
    assert good.count() + bad.count() == dc.df.count()
    assert "failed_checks" in bad.columns
    reasons = {r.failed_checks for r in bad.select("failed_checks").distinct().collect()}
    assert any("completeness_qty_parsed" in r for r in reasons)
    # clean side has no nulls in the checked column
    assert good.where("qty_parsed IS NULL").count() == 0


def test_undo_reverts_last_fix(spark, sf_dir):
    from ipydataclean_spark.api import DataCleaner
    from ipydataclean_spark.operators.qhelp import lineitem_dirty

    base = lineitem_dirty(spark, sf_dir)
    one = DataCleaner(base).apply_fix("qty_parsed", "missing", "fill_value", value=0.0)
    want = one.df.agg({"qty_parsed": "sum"}).collect()[0][0]

    dc = (
        DataCleaner(base)
        .apply_fix("qty_parsed", "missing", "fill_value", value=0.0)
        .apply_fix("price_out", "outliers", "clip")
    )
    assert len(dc.history) == 2
    dc.undo()
    assert len(dc.history) == 1 and len(dc.recipe.steps) == 1
    assert dc.df.agg({"qty_parsed": "sum"}).collect()[0][0] == want
    # undo to empty, then error on over-undo
    dc.undo()
    assert dc.df.schema == base.schema
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dc.undo()


def test_autofix_clears_detected_problems(spark, sf_dir):
    from ipydataclean_spark.api import DataCleaner
    from ipydataclean_spark.operators.qhelp import lineitem_dirty

    dc = DataCleaner(lineitem_dirty(spark, sf_dir))
    before = dc.problems()
    assert before, "fixture should present problems"
    report = dc.autofix()
    assert {(r["column"], r["problem"]) for r in report} == {
        (c, k) for c, k, _ in before
    }
    # the default fixes resolve missing/outlier/mismatch problems on
    # the columns they targeted (re-detection on the cleaned frame)
    after = {(c, k) for c, k, _ in dc.problems()}
    fixed_kinds = {"missing", "outliers", "string_mismatch"}
    for c, k, _ in before:
        if k in fixed_kinds:
            assert (c, k) not in after, (c, k)
    # the session is fully recorded and exportable
    assert len(dc.history) == len(report)
    assert "def clean" in dc.to_code() or dc.to_code().strip()


def test_autofix_overrides_strategy(spark, sf_dir):
    from ipydataclean_spark.api import DataCleaner
    from ipydataclean_spark.operators.qhelp import lineitem_dirty

    dc = DataCleaner(lineitem_dirty(spark, sf_dir))
    n0 = dc.df.count()
    report = dc.autofix(overrides={"outliers": "drop_rows"})
    assert any(r["fix"] == "drop_rows" for r in report if r["problem"] == "outliers")
    assert dc.df.count() <= n0


def test_approx_bounds_knob_same_detection_set(spark, sf_dir):
    """The scale knob (exact_bounds=False) finds the same problem SET
    as the exact path on the fixture — counts may differ (approx
    quartiles), kinds and columns must not."""
    from ipydataclean_spark.api import DataCleaner
    from ipydataclean_spark.operators.qhelp import lineitem_dirty

    base = lineitem_dirty(spark, sf_dir)
    exact = {(c, k) for c, k, _ in DataCleaner(base).problems()}
    approx = {(c, k) for c, k, _ in DataCleaner(base, exact_bounds=False).problems()}
    assert exact == approx


def test_autofix_units_column_without_conversions(spark):
    """A units-dominated column must survive a headless autofix run
    with NO conversions override (ADVICE r03 #1: the first FIX_MENU
    entry for 'units' is standardize_units, which previously raised
    KeyError('conversions')). With no map the identity conversion
    applies: the magnitude is parsed and the suffix stripped."""
    from ipydataclean_spark.api import DataCleaner

    df = spark.createDataFrame(
        [(i, f"{i}.5 kg") for i in range(1, 41)] + [(41, None)],
        "id long, weight string",
    )
    dc = DataCleaner(df)
    probs = {(c, k) for c, k, _ in dc.problems()}
    assert ("weight", "units") in probs
    report = dc.autofix()  # must not raise
    assert any(
        r["problem"] == "units" and r["fix"] == "standardize_units"
        for r in report
    )
    got = {r.id: r.weight for r in dc.df.collect()}
    assert got[3] == 3.5 and got[40] == 40.5

    # an explicit conversions override still converts for real
    dc2 = DataCleaner(df)
    dc2.apply_fix("weight", "units", "standardize_units",
                  conversions={"kg": 1000.0})
    assert {r.weight for r in dc2.df.where("id = 2").collect()} == {2500.0}


def test_variants_problem_detected_and_standardized(spark):
    """The OpenRefine-facet loop end-to-end through the widget API:
    problems() flags a categorical column with casing/padding
    variants, apply_fix('standardize_values') collapses every variant
    to its cluster's most frequent raw form, NULLs pass through, and
    to_sql() exports a twin that reproduces the repair value-for-value
    in DuckDB."""
    import duckdb
    from pyspark.sql import Row

    from ipydataclean_spark.api import DataCleaner

    rows = (
        [Row(id=i, seg="BUILDING") for i in range(6)]
        + [Row(id=10 + i, seg="building") for i in range(2)]
        + [Row(id=20, seg="  BUILDING "), Row(id=21, seg=None),
           Row(id=22, seg="AUTO"), Row(id=23, seg="auto"), Row(id=24, seg="auto")]
    )
    df = spark.createDataFrame(rows)
    cleaner = DataCleaner(df)
    probs = {(c, k) for c, k, _ in cleaner.problems()}
    assert ("seg", "variants") in probs
    cleaner.apply_fix("seg", "variants", "standardize_values")
    got = {r.id: r.seg for r in cleaner.df.collect()}
    assert all(got[i] == "BUILDING" for i in list(range(6)) + [10, 11, 20])
    assert got[21] is None
    # 'auto' outnumbers 'AUTO' 2:1 — the frequent raw form wins
    assert got[22] == got[23] == got[24] == "auto"
    # SQL export parity
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/src")
        con = duckdb.connect()
        con.sql(f"CREATE VIEW src AS SELECT * FROM '{d}/src/*.parquet'")
        duck = {r[0]: r[1] for r in con.sql(
            f"SELECT id, seg FROM ({cleaner.to_sql('src')})"
        ).fetchall()}
        assert duck == got


def test_string_counters_row_weighted(spark):
    """The distinct-value weighted counter rewrite (optimization r12:
    counters evaluated once per DISTINCT value, multiplied by the
    value's row count) must still count ROWS. Every kind's n is
    pinned on a fixture where the triggering values REPEAT with
    different multiplicities — a rewrite bug that counted distinct
    values instead of rows fails every assertion here."""
    from pyspark.sql import Row

    nums = ["1.5"] * 4 + ["2"] * 2 + ["abc"] * 3 + ["x!"]       # 4 mismatch rows, "abc" repeated
    dates = ["2024-01-11"] * 8 + ["19/03/2024", None]            # 9 parse, 1 null
    units = ["9 kg"] * 6 + ["hello"] * 4                         # 6 unit rows
    pii = ["mail a@b.com"] * 2 + ["clean"] * 8                   # repeated pii value
    var = [" A "] * 3 + ["a"] * 4 + ["B"] * 3                    # 3 raw forms, 2 fingerprints
    moji = ["cafÃ©"] * 2 + ["plain"] * 8               # repeated mojibake value
    rows = [
        Row(id=i, num=nums[i], d=dates[i], w=units[i], p=pii[i],
            v=var[i], m=moji[i])
        for i in range(10)
    ]
    probs = {(c, k): n for c, k, n in DataCleaner(spark.createDataFrame(rows)).problems()}
    assert probs[("num", "string_mismatch")] == 4   # 3x"abc" + 1x"x!", row-weighted
    assert probs[("d", "dates")] == 9               # n = non-null rows for a date column
    assert probs[("d", "missing")] == 1
    assert probs[("w", "units")] == 10              # n = non-null rows for a unit column
    assert probs[("p", "pii")] == 2                 # the repeated pii value counts twice
    assert probs[("v", "variants")] == 1            # 3 raw forms - 2 fingerprints
    assert probs[("m", "mojibake")] == 2            # the repeated mojibake value counts twice
    assert ("num", "outliers") not in probs and ("id", "outliers") not in probs
