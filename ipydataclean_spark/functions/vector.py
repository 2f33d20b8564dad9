"""Vector (embedding) helpers — pure builtin expressions, JVM-side.

Dot product / cosine over ``array<float>`` via ``zip_with`` +
``aggregate`` (a sequential left fold, so the summation order is
fixed and identical in Spark and DuckDB — no fp-order drift).
Elements are cast to double first (exact widening).

Scale note: these run inside whole-stage codegen; no Python boundary.
For 100 TB ANN, the LSH-bucketed variant (operators/llm.py) bounds the
candidate set; these exact kernels then score candidates only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential-fold dot product of two float/double array columns."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    sq = F.transform(_c(a), lambda x: x.cast("double") * x.cast("double"))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, x: acc + x))


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def dot_sql(a: str, b: str) -> str:
    """DuckDB twin: same sequential fold via list_transform + list_sum
    over an index range (DuckDB lists are 1-indexed)."""
    return (
        f"COALESCE(list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), 0.0)"
    )


def norm_sql(a: str) -> str:
    return (
        f"SQRT(COALESCE(list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))), 0.0))"
    )


def cosine_sim_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def sq_dist_sql(a: str, b: str) -> str:
    """DuckDB twin of operators/ivf._sq_dist: same sequential fold of
    (a_i - b_i)^2 (list_sum matches Spark's aggregate() left fold —
    the dot_sql parity evidence), so squared L2 distances are
    bit-identical doubles cross-engine."""
    return (
        f"COALESCE(list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
        f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)))), 0.0)"
    )

