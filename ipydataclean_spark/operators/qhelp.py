"""Shared helpers for registered queries: fixture loading and the
DataFrame-API construction of the dirty fixtures (twin of dirty.py's
SQL CTEs — both build identical inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipydataclean_spark.catalog import load_table
from ipydataclean_spark.operators import dirty


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


#: Siblings untouched this long are treated as belonging to a dead
#: session and swept; younger ones may belong to a CONCURRENT session
#: (verify + smoke run), which is the reason scratch dirs are
#: appId-keyed at all. 24 h (round-5 review): reads don't bump mtime,
#: so a long-lived session holding a lazy DataFrame over its scratch
#: must not see a shorter-TTL sibling sweep delete it mid-run; no
#: session here lives a day, and the sweep only has to beat
#: unbounded accumulation, not be prompt.
_SCRATCH_STALE_SECS = 24 * 3600


def _warehouse_base():
    """Scratch root (repo-local spark-warehouse/) — a seam so the TTL
    sweep is testable against a throwaway directory."""
    import pathlib

    return pathlib.Path(__file__).resolve().parents[2] / "spark-warehouse"


def scratch_dir(spark: SparkSession, prefix: str) -> str:
    """Session-unique scratch path ``spark-warehouse/{prefix}_{appId}``.

    The appId changes every session, so the old per-site pattern
    (rmtree only the same-appId path) leaked one directory per run
    permanently (ADVICE r04). This helper additionally sweeps STALE
    same-prefix siblings — any ``{prefix}_*`` not owned by this session
    and untouched for ``_SCRATCH_STALE_SECS`` — before handing back a
    freshly-cleared current path. End-of-query deletion is NOT an
    option: most callers return a lazy DataFrame that still reads these
    files when the driver later collects it.
    """
    import shutil
    import time

    base = _warehouse_base()
    cur = base / f"{prefix}_{spark.sparkContext.applicationId}"
    if base.is_dir():
        cutoff = time.time() - _SCRATCH_STALE_SECS
        for sib in base.glob(f"{prefix}_*"):
            if sib == cur:
                continue
            try:
                if sib.stat().st_mtime < cutoff:
                    shutil.rmtree(sib, ignore_errors=True)
            except OSError:
                continue
    shutil.rmtree(cur, ignore_errors=True)
    return str(cur)


def lineitem_dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem + quantity_str/qty_parsed/price_out dirt columns."""
    return (
        T(spark, sf_dir, "lineitem")
        .withColumn("quantity_str", F.expr(dirty.QTY_STR))
        .withColumn("qty_parsed", F.expr(dirty.QTY_PARSED))
        .withColumn("price_out", F.expr(dirty.PRICE_OUT))
    )


def events_dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + value_gap + stable global row_id.

    The unpartitioned row_number window funnels through one partition —
    acceptable for the 10k-row events fixture and for any "ordered
    interpolation" semantics that are inherently sequential; the
    scale path is the per-user variant (c5 partitioned form).
    """
    w = Window.orderBy("ts", "event_id")
    return (
        T(spark, sf_dir, "events")
        .withColumn("value_gap", F.expr(dirty.VALUE_GAP))
        .withColumn("row_id", F.row_number().over(w))
    )


def documents_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ re-cased/padded copy of every 5th doc (known dups)."""
    docs = T(spark, sf_dir, "documents")
    dup = docs.filter("doc_id % 5 = 0").select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat(F.lit("  "), F.upper("text"), F.lit("  ")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    return docs.unionByName(dup)


def with_lineitem_dirty(sql: str) -> str:
    """Oracle helper: prefix a query with the lineitem_dirty CTE."""
    return f"WITH lineitem_dirty AS ({dirty.lineitem_dirty_sql()}) {sql}"


def with_events_dirty(sql: str) -> str:
    return f"WITH events_dirty AS ({dirty.events_dirty_sql()}) {sql}"


def with_documents_dup(sql: str) -> str:
    return f"WITH documents_dup AS ({dirty.DOCUMENTS_DUP_SQL}) {sql}"
