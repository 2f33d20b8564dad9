"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``ipydataclean_spark.registry``: every implemented
operator from SURVEY.md §2 registers a query fn plus (where
SQL-expressible) a DuckDB oracle twin. See SURVEY.md §5.2 for the
test strategy and functions/exact.py for the float-exactness contract
that makes the value hashes match.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

if "/root/repo" not in sys.path:
    sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession

from ipydataclean_spark.registry import QUERIES, ordered_queries

#: Driver-facing view: queries without a prior-round driver-green row come
#: first, so the driver's bounded CORRECTNESS window verifies fresh queries
#: each round (VERDICT r01, next-round item #1).
_ORDERED = ordered_queries()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the TPC-H-Q1-style
    pricing summary over a dirtied lineitem after a cleaning recipe
    (string-mismatch fix C9 + fill-mean C2) — the engine's minimum
    end-to-end slice (SURVEY.md §7 M0)."""
    return QUERIES["q1_pricing_summary_cleaned"]["fn"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec["fn"] for name, spec in _ORDERED.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; ops without one get the driver's rows-only check."""
    return {name: spec["oracle"] for name, spec in _ORDERED.items() if spec["oracle"] is not None}
