"""Audit registered queries for output columns the driver harness can't hash.

The driver canonicalizes Spark/oracle results with pandas sort_values +
factorize, which raises ``TypeError: unhashable type`` on list/dict cells.
Any ORACLE-BACKED query must therefore emit only scalar-typed columns.
Rows-only queries may keep complex types (the driver only counts rows).

Run: python tools/audit_output_types.py   (exit 1 if violations found)
"""

from __future__ import annotations

import sys

from pyspark.sql.types import ArrayType, MapType, StructType

sys.path.insert(0, ".")

from ipydataclean_spark.registry import load_all  # noqa: E402
from ipydataclean_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


def main() -> int:
    spark = get_spark()
    queries = load_all()
    bad: list[tuple[str, str, str]] = []
    complex_rows_only: list[tuple[str, str, str]] = []
    for name, spec in sorted(queries.items()):
        try:
            df = spec["fn"](spark, SF_DIR)
        except Exception as exc:  # noqa: BLE001
            print(f"BUILD-FAIL {name}: {exc}")
            bad.append((name, "<build>", str(exc)[:80]))
            continue
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                row = (name, field.name, field.dataType.simpleString())
                if spec["oracle"] is not None:
                    bad.append(row)
                else:
                    complex_rows_only.append(row)
    if complex_rows_only:
        print("rows-only queries with complex columns (allowed, driver counts rows):")
        for name, col, typ in complex_rows_only:
            print(f"  ok  {name}.{col}: {typ}")
    if bad:
        print("ORACLE-BACKED queries with unhashable complex columns (MUST FIX):")
        for name, col, typ in bad:
            print(f"  BAD {name}.{col}: {typ}")
        return 1
    print(f"audit clean: {len(queries)} queries, no oracle-backed complex outputs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
