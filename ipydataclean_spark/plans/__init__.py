"""Plan inspection helpers — the .explain() feedback loop, programmatic.

Used by tests/test_plans.py to pin the physical-plan properties that
matter at 100 TB: predicate pushdown into parquet, column pruning,
broadcast joins for dims, whole-stage codegen coverage, and no
row-at-a-time Python in hot paths.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """The text of df.explain('formatted')."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every parquet scan in the plan."""
    out = []
    for line in formatted_plan(df).splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line.removeprefix("PushedFilters:").strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries (column pruning evidence) per parquet scan."""
    return [
        line.strip().removeprefix("ReadSchema:").strip()
        for line in formatted_plan(df).splitlines()
        if line.strip().startswith("ReadSchema:")
    ]


def count_op(df: DataFrame, op: str) -> int:
    return formatted_plan(df).count(op)


def plan_tree(df: DataFrame) -> list[str]:
    """The tree section of the formatted plan (operators in tree order:
    a node's children are the lines after it, deeper-indented)."""
    lines = formatted_plan(df).splitlines()
    out = []
    started = False
    for line in lines:
        if line.startswith("== Physical Plan =="):
            started = True
            continue
        if started:
            if not line.strip():
                break
            out.append(line)
    return out


def n_parquet_scans(df: DataFrame) -> int:
    """Number of distinct parquet scan nodes (via Location lines)."""
    return sum(
        1 for line in formatted_plan(df).splitlines() if line.strip().startswith("Location:")
    )


def codegen_subtrees(df: DataFrame) -> int:
    """WholeStageCodegen subtree count (explain mode 'codegen')."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("codegen")
    text = buf.getvalue()
    # "Found N WholeStageCodegen subtrees."
    for line in text.splitlines():
        if "WholeStageCodegen subtrees" in line:
            return int(line.split()[1])
    return 0


def has_python_eval(df: DataFrame) -> bool:
    """True if the plan contains row-at-a-time Python (BatchEvalPython)
    — forbidden in this engine's hot paths; ArrowEvalPython (pandas
    UDFs) is the sanctioned Python boundary."""
    return "BatchEvalPython" in formatted_plan(df)
