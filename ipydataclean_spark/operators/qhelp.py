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


#: events_dirty's global-row_id regime switch (round 13): above this
#: input size the unpartitioned row_number window — which funnels the
#: WHOLE table through one task (measured: c5b's noop wall was a FLAT
#: ~51 s at sf10 on 8 and 32 cores alike — the serial window, not the
#: interpolation) — swaps to the distributed exact-rank pattern
#: (functions/ranking.with_global_rank, bit-identical row_ids). Below
#: it the single window stays: at fixture sizes the distributed form's
#: fixed costs (range exchange + eager checkpoint + offsets join)
#: exceed the funnel it removes, and the sf0.1 bench plans stay
#: byte-identical to rounds 1-12.
_EVENTS_GLOBAL_ROWID_MAX_BYTES = 16 * 1024 * 1024


def _path_bytes(path: str) -> int:
    """Total bytes under a local fixture path (file or directory) — a
    plan-shape probe that costs no Spark job. Unknown/remote paths
    return -1 and the caller takes the scale-safe branch."""
    import os

    try:
        if os.path.isfile(path):
            return os.path.getsize(path)
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                total += os.path.getsize(os.path.join(root, f))
        return total if total > 0 else -1
    except OSError:
        return -1


def events_dirty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events + value_gap + stable global row_id.

    row_id = ROW_NUMBER() OVER (ORDER BY ts, event_id) — a TOTAL order
    (event_id unique). Small fixtures compute it with the plain
    unpartitioned window; past _EVENTS_GLOBAL_ROWID_MAX_BYTES the
    distributed three-step rank takes over (same values — the pattern's
    exactness contract, pinned by functions/ranking's tests and every
    events_dirty consumer's oracle)."""
    from ipydataclean_spark.catalog import table_path

    ev = T(spark, sf_dir, "events").withColumn("value_gap", F.expr(dirty.VALUE_GAP))
    nbytes = _path_bytes(table_path(sf_dir, "events"))
    if 0 <= nbytes <= _EVENTS_GLOBAL_ROWID_MAX_BYTES:
        w = Window.orderBy("ts", "event_id")
        return ev.withColumn("row_id", F.row_number().over(w))
    from ipydataclean_spark.functions.ranking import with_global_rank

    return (
        with_global_rank(ev, [F.col("ts"), F.col("event_id")], out="__row_id_l")
        .withColumn("row_id", F.col("__row_id_l").cast("int"))
        .drop("__row_id_l", "__n_total")
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
