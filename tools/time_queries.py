"""Ad-hoc per-query timing against the noop sink (guide §1.4).

Usage: python tools/time_queries.py [--sf-dir DIR] [--runs N] name ...

Protocol matches bench.py's noop metric: per query one warm-up run,
then median of N timed runs around write.format("noop"). Prints one
line per query: name, min, median, all samples. Job descriptions are
set so the Spark UI (when enabled) maps jobs to queries.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ipydataclean_spark.registry import QUERIES, load_all
from ipydataclean_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    load_all()
    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    for name in args.names:
        fn = QUERIES[name]["fn"]

        def run():
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()

        spark.sparkContext.setJobDescription(f"warmup {name}")
        t0 = time.perf_counter()
        run()
        warm = time.perf_counter() - t0
        samples = []
        for i in range(args.runs):
            spark.sparkContext.setJobDescription(f"timed {name} #{i}")
            t0 = time.perf_counter()
            run()
            samples.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: min={min(samples):.3f} med={statistics.median(samples):.3f} "
            f"warm={warm:.3f} samples={[round(s, 3) for s in samples]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
