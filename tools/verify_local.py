"""Local stand-in for the driver's correctness gate.

Runs every registered query on Spark at sf0.01 and its oracle SQL on
DuckDB over the same parquet files, then compares row count, sorted
column names, and values (exact first; falls back to reporting the
max abs diff so float drift is visible before the driver sees it).

Usage: python tools/verify_local.py [--sf-dir DIR] [name ...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb

from ipydataclean_spark.catalog import TABLES, table_path
from ipydataclean_spark.registry import QUERIES, load_all
from ipydataclean_spark.session import get_spark


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')")
    return con


_SPARK_CANON = {
    "bigint": "i64", "int": "i32", "smallint": "i16", "double": "f64", "float": "f32",
    "string": "str", "boolean": "bool", "date": "date", "timestamp": "ts", "timestamp_ntz": "ts",
}
_DUCK_CANON = {
    "BIGINT": "i64", "INTEGER": "i32", "SMALLINT": "i16", "HUGEINT": "i128", "TINYINT": "i8",
    "DOUBLE": "f64", "FLOAT": "f32", "VARCHAR": "str", "BOOLEAN": "bool", "DATE": "date",
    "TIMESTAMP": "ts", "TIMESTAMP_NS": "ts",
}


def canon_spark_type(dt) -> str:
    s = dt.simpleString()
    if s.startswith("array"):
        return "list"
    if s.startswith("decimal"):
        return "dec"
    return _SPARK_CANON.get(s, s)


def canon_duck_type(t) -> str:
    t = str(t)
    if t.endswith("[]"):
        return "list"
    if t.startswith("DECIMAL"):
        return "dec"
    return _DUCK_CANON.get(t, t)


def normalize(rows: list[tuple], cols: list[str]):
    """Sort columns by name, then rows; stringify for comparison."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))


def values_equal(a, b) -> tuple[bool, float]:
    """Exact compare; returns (equal, max_float_absdiff_seen)."""
    if len(a) != len(b):
        return False, math.inf
    max_diff = 0.0
    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False, math.inf
        for xa, xb in zip(ra, rb):
            if xa == xb:
                continue
            if isinstance(xa, float) and isinstance(xb, float):
                if math.isnan(xa) and math.isnan(xb):
                    continue
                d = abs(xa - xb)
                max_diff = max(max_diff, d)
                if d > 0:
                    return False, max_diff
            else:
                return False, math.inf
    return True, max_diff


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--plain",
        action="store_true",
        help="use a default SparkSession (driver simulation) instead of the tuned engine session",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    load_all()
    names = args.names or sorted(QUERIES)
    if args.plain:
        from pyspark.sql import SparkSession

        # pin UTC like session.py: the TIMESTAMP_NTZ->TIMESTAMP cast in
        # catalog.normalize_events_ts reads wall-clock in the session TZ,
        # so a non-UTC host would shift events timestamps vs DuckDB
        spark = (
            SparkSession.builder.master("local[8]")
            .appName("verify-plain")
            .config("spark.sql.session.timeZone", "UTC")
            .getOrCreate()
        )
    else:
        spark = get_spark("verify-local")
    con = duck_con(args.sf_dir)

    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        spec = QUERIES[name]
        t0 = time.time()
        try:
            sdf = spec["fn"](spark, args.sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            n_fail += 1
            continue
        if spec["oracle"] is None:
            # Replicate the driver's rows-only canonicalizer: it loads
            # the result into pandas and sort_values over every column
            # — array/map cells raise "unhashable type: 'list'" there
            # and the driver records a CRASH, not a rows row
            # (p3b/f_map, CORRECTNESS_r07). Catch that class locally.
            try:
                import pandas as pd

                pdf = pd.DataFrame(srows, columns=scols)
                if len(pdf):
                    pdf.sort_values(list(pdf.columns))
                    # the driver also HASHES rows; single-column frames
                    # sort comparison-based (list cells survive the
                    # sort) but still crash the hash — replicate both
                    pd.util.hash_pandas_object(pdf, index=False)
            except TypeError as e:
                print(f"FAIL {name}: rows-only output not canonicalizable: {e}")
                n_fail += 1
                continue
            print(f"rows-only {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            rel = con.sql(spec["oracle"])
            ocols = list(rel.columns)
            otypes = dict(zip(ocols, [canon_duck_type(t) for t in rel.types]))
            orows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sv = normalize(srows, scols)
        oc, ov = normalize(orows, ocols)
        if sc != oc:
            print(f"FAIL {name}: column mismatch spark={sc} duck={oc}")
            n_fail += 1
            continue
        stypes = {f.name: canon_spark_type(f.dataType) for f in sdf.schema.fields}
        type_diffs = {c: (stypes[c], otypes[c]) for c in stypes if stypes[c] != otypes.get(c)}
        if type_diffs:
            print(f"FAIL {name}: type mismatch {type_diffs}")
            n_fail += 1
            continue
        if len(sv) != len(ov):
            print(f"FAIL {name}: rowcount spark={len(sv)} duck={len(ov)}")
            n_fail += 1
            continue
        eq, max_diff = values_equal(sv, ov)
        if eq:
            print(f"PASS {name}: {len(sv)} rows ({time.time()-t0:.1f}s)")
            n_pass += 1
        else:
            print(f"FAIL {name}: value mismatch (max float diff {max_diff:.3e})")
            for i, (ra, rb) in enumerate(zip(sv, ov)):
                if ra != rb:
                    print(f"  first differing row {i}:\n    spark={ra}\n    duck ={rb}")
                    break
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only / {len(names)} total")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
