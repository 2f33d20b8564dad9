"""Text normalization helpers (C17, L-ops) — builtin-function only.

Both a Spark Column form and a SQL twin so the DuckDB oracle computes
the identical normalization.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def norm_text_col(col: Column | str) -> Column:
    """lower + trim + collapse internal whitespace (C17)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.trim(F.regexp_replace(c, r"\s+", " ")))


def norm_text_sql(expr: str) -> str:
    return f"LOWER(TRIM(REGEXP_REPLACE({expr}, '\\s+', ' ', 'g')))"
