"""One-run noop timing of EVERY registered query at a given SF dir.

The optimization-round checklist tool: a single warm-session pass
(one run per query, no medians — ranking material, not A/B evidence)
to (a) cover every operator with a measured number and (b) surface
the most expensive paths. Prints `name<TAB>sec` sorted by cost at the
end; failures print as FAIL lines but do not stop the sweep.

Usage: python tools/sweep_times.py [--sf-dir DIR] [--skip name ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ipydataclean_spark.registry import QUERIES, load_all
from ipydataclean_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--skip", nargs="*", default=[])
    args = ap.parse_args()
    load_all()
    spark = get_spark("sweep-times")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, float] = {}
    for name, spec in QUERIES.items():
        if name in args.skip:
            continue
        spark.sparkContext.setJobDescription(f"sweep {name}")
        t0 = time.perf_counter()
        try:
            spec["fn"](spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            results[name] = dt
            print(f"OK {name}\t{dt:.3f}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}", flush=True)
            traceback.print_exc()
    print("==== sorted by cost ====")
    for name, dt in sorted(results.items(), key=lambda kv: -kv[1]):
        print(f"{name}\t{dt:.3f}")


if __name__ == "__main__":
    main()
