"""Deterministic dirty-fixture expressions (FIXTURES.md 'Derived dirty
fixtures').

The driver tables are clean; detectors (D1-D6) and cleaners (C1-C17)
need dirt. Dirt is derived with pure SQL expressions keyed on stable
columns, written in the dialect intersection of Spark SQL and DuckDB,
so the Spark query and the DuckDB oracle construct *identical* dirty
inputs and the cleaning result stays hash-checkable end-to-end.

Dialect-intersection rules used here:
  - CAST(x AS STRING): both engines produce shortest-round-trip
    formatting for the 2-decimal fixture doubles.
  - REPLACE(s, a, b): replaces ALL occurrences in both engines
    (Spark's regexp_replace is replace-all but DuckDB's defaults to
    first-match, so plain REPLACE is used in shared expressions).
  - TRY_CAST: identical null-on-failure semantics in both.
"""

from __future__ import annotations

# lineitem.quantity_str — a mostly-numeric string column with missing
# values and string mismatches (exercises D1/D2, C1-C4, C9, C10).
QTY_STR = (
    "CASE WHEN l_orderkey % 97 = 0 THEN NULL "
    "WHEN l_orderkey % 89 = 0 THEN 'N/A' "
    "WHEN l_orderkey % 83 = 0 THEN CONCAT(CAST(l_quantity AS STRING), ' kg') "
    "ELSE CAST(l_quantity AS STRING) END"
)

# Parse quantity_str back to double: strip known unit suffix, try_cast;
# 'N/A' and NULL both become NULL (single missingness marker, §1.1).
QTY_PARSED = f"TRY_CAST(REPLACE({QTY_STR}, ' kg', '') AS DOUBLE)"

# lineitem.price_out — injected outliers ×1000 (exercises D3, C11, C12).
PRICE_OUT = "CASE WHEN l_orderkey % 101 = 0 THEN l_extendedprice * 1000 ELSE l_extendedprice END"

# events.value_gap — NULL gaps for interpolation (C5/C6) over a stable
# row order (row_id = row_number() OVER (ORDER BY ts, event_id)).
VALUE_GAP = "CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END"

# customer.seg_dirty — casing/padding variants of a categorical column
# (exercises C34/C35 value clustering, the OpenRefine-style facet
# cluster-and-standardize). Same dialect-intersection rules.
SEG_DIRTY = (
    "CASE WHEN c_custkey % 7 = 0 THEN LOWER(c_mktsegment) "
    "WHEN c_custkey % 11 = 0 THEN CONCAT('  ', c_mktsegment, ' ') "
    "WHEN c_custkey % 13 = 0 THEN CONCAT(LOWER(c_mktsegment), '  ') "
    "ELSE c_mktsegment END"
)

# documents_dup — documents plus a modulo-selected re-cased/padded copy
# (exercises D4/C16/C17/L1/L2). SELECT-able CTE body for both engines.
DOCUMENTS_DUP_SQL = (
    "SELECT doc_id, text, lang, source, n_chars FROM documents "
    "UNION ALL "
    "SELECT doc_id + 1000000 AS doc_id, "
    "CONCAT('  ', UPPER(text), '  ') AS text, lang, source, n_chars "
    "FROM documents WHERE doc_id % 5 = 0"
)


def lineitem_dirty_sql() -> str:
    """Shared CTE body: lineitem plus quantity_str / qty_parsed / price_out."""
    return (
        "SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity, "
        "l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate, "
        f"{QTY_STR} AS quantity_str, {QTY_PARSED} AS qty_parsed, {PRICE_OUT} AS price_out "
        "FROM lineitem"
    )


def events_dirty_sql() -> str:
    """Shared CTE body: events plus value_gap and a stable row_id."""
    return (
        "SELECT event_id, ts, user_id, event_type, value, props, "
        f"{VALUE_GAP} AS value_gap, "
        "ROW_NUMBER() OVER (ORDER BY ts, event_id) AS row_id "
        "FROM events"
    )
