"""Query registry: the single table the driver contract iterates.

Every implemented operator from SURVEY.md §2 registers here as
  name -> {fn: (spark, sf_dir) -> DataFrame, oracle: SQL str | None}

``oracle`` is the ANSI-SQL twin DuckDB runs on the same parquet views;
None means the op is not SQL-expressible (LSH, streaming, sampling) and
the driver records a rows-only check (SURVEY.md §5.2).

Exactness contract (critical for the driver's value-hash compare):
float aggregations route through DECIMAL so the result is
order-of-summation independent and therefore bit-identical between
Spark and DuckDB — see functions/exact.py.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, dict[str, Any]] = {}

_OPERATOR_MODULES = (
    "ipydataclean_spark.operators.profiling",
    "ipydataclean_spark.operators.detectors",
    "ipydataclean_spark.operators.cleaning",
    "ipydataclean_spark.operators.relational",
    "ipydataclean_spark.operators.tpch_extra",
    "ipydataclean_spark.operators.analytics",
    "ipydataclean_spark.operators.windows",
    "ipydataclean_spark.operators.functions_suite",
    "ipydataclean_spark.operators.functions_extra",
    "ipydataclean_spark.operators.functions_stats",
    "ipydataclean_spark.operators.quality",
    "ipydataclean_spark.operators.groupstats",
    "ipydataclean_spark.operators.featprep",
    "ipydataclean_spark.operators.graph",
    "ipydataclean_spark.operators.sketches",
    "ipydataclean_spark.operators.text_rank",
    "ipydataclean_spark.operators.udfs",
    "ipydataclean_spark.operators.llm",
    "ipydataclean_spark.operators.llm_extra",
    "ipydataclean_spark.operators.ivf",
    "ipydataclean_spark.operators.multimodal",
    "ipydataclean_spark.streaming.batch_twins",
    "ipydataclean_spark.sources.pydatasource",
)


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = {"fn": fn, "oracle": oracle, "tags": tags, "doc": (fn.__doc__ or "").strip()}
        return fn

    return deco


def load_all() -> dict[str, dict[str, Any]]:
    """Import every operator module (each registers its queries on import)."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return QUERIES
