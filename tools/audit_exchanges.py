"""Audit what each query's shuffles carry (optimization round 12).

For each named query, prints every Exchange node's input column list
with STRING/ARRAY/BINARY columns flagged — the guide §2.3 smell
("project before the exchange"): heavy payload columns crossing a
shuffle that only needs to route keys.

Run: python tools/audit_exchanges.py [name ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ipydataclean_spark.registry import QUERIES, load_all
from ipydataclean_spark.session import get_spark


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    names = sys.argv[1:]
    load_all()
    spark = get_spark("audit-exchanges")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    for name in names:
        try:
            df = QUERIES[name]["fn"](spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {e}")
            continue
        schema = {f.name.split("#")[0]: f.dataType.simpleString() for f in df.schema.fields}
        blocks = re.split(r"\n(?=\(\d+\))", plan)
        print(f"== {name}")
        for b in blocks:
            head = b.strip().splitlines()[0] if b.strip() else ""
            if "Exchange" not in head or "Reused" in head:
                continue
            m = re.search(r"Input \[\d+\]: \[(.*?)\]\n", b, re.S)
            cols = m.group(1).replace("\n", " ") if m else "?"
            # flag likely-heavy columns by name heuristics
            heavy = [
                c for c in re.findall(r"(\w+)#\d+", cols)
                if any(k in c.lower() for k in ("text", "body", "payload", "sig", "emb", "toks", "_t", "arr"))
            ]
            tag = f"  <-- HEAVY? {sorted(set(heavy))}" if heavy else ""
            print(f"  {head}: [{cols[:160]}]{tag}")


if __name__ == "__main__":
    main()
