"""End-to-end migration walkthrough: the reference's interactive
cleaning session, re-run distributed — and then the parts the widget
never had: a SQL export of the whole session, an expectation-gated
ACID publish, and a training-data curation pass over the same engine.

Reference workflow [P] (facultyai/ipydataclean): load a pandas frame
into the widget -> inspect per-column profiles -> click through the
detected problems (missing values, strings in numeric columns,
outliers) -> export the session as pandas code. Every step below is
the distributed, headless equivalent; run it with

    python examples/migrate_from_ipydataclean.py [sf_dir]

(tested by tests/test_extras_r5b.py::test_migration_example_runs).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(spark, sf_dir: str, workdir: str) -> dict:
    """Returns the artifacts a migrating user would inspect; asserts
    along the way so the walkthrough IS a test."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.api import DataCleaner
    from ipydataclean_spark.operators.expectations import Suite
    from ipydataclean_spark.operators.qhelp import lineitem_dirty
    from ipydataclean_spark.sources.txlog import TxTable

    # 1. the widget's entry point: a DataFrame instead of a pandas frame
    df = lineitem_dirty(spark, sf_dir).select(
        "l_orderkey", "l_linenumber", "l_returnflag",
        "quantity_str", "price_out",
    )
    dc = DataCleaner(df)

    # 2. profile + problems: ONE scan each, any column count
    profile = dc.profile()
    problems = dc.problems()
    assert any(k == "string_mismatch" for _c, k, _n in problems)

    # 3. the reference's click-through, as API calls (or dc.autofix())
    dc.apply_fix("quantity_str", "string_mismatch", "convert_numeric")
    dc.apply_fix("quantity_str", "missing", "fill_median")
    dc.apply_fix("price_out", "outliers", "clip")
    assert dc.problems(["quantity_str", "price_out"]) == []

    # 4. session export — the reference emits pandas code; this engine
    # emits BOTH standalone PySpark and one DuckDB-dialect SQL query
    code = dc.to_code()
    sql = dc.to_sql("lineitem_dirty")
    assert "convert_numeric" in code and "SELECT" in sql

    # 5. beyond the widget: expectation-gated ACID publish
    table = TxTable.create(
        spark, f"{workdir}/clean_lineitem", dc.df.limit(0)
    )
    suite = (
        Suite()
        .completeness("quantity_str", 1.0)
        .bounds("quantity_str", 0, 60)
    )
    version = dc.commit_to(table, key="l_orderkey", suite=suite)
    assert table.read(version).count() == dc.df.count()

    # 6. the training-data side of the same engine: dedup + quality
    from ipydataclean_spark.operators.llm import l1_exact_dedup
    from ipydataclean_spark.operators.llm_quality import l37_dsir_weights

    dedup_survivors = l1_exact_dedup(spark, sf_dir).count()
    dsir = l37_dsir_weights(spark, sf_dir)
    assert dsir.where(F.col("dsir_score").isNull()).count() == 0

    return {
        "n_columns_profiled": len(profile),
        "n_problems_found": len(problems),
        "history": [h["fix"] for h in dc.history],
        "published_version": version,
        "sql_export_chars": len(sql),
        "dedup_survivors": dedup_survivors,
    }


if __name__ == "__main__":  # pragma: no cover - CLI convenience
    import tempfile

    from ipydataclean_spark.session import get_spark

    out = main(
        get_spark("migration-example"),
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001",
        tempfile.mkdtemp(prefix="migration_example_"),
    )
    print(out)
