"""A/B `spark.io.compression.codec` (lz4 default vs zstd) on the
shuffle-heaviest headline queries (VERDICT r12 #9: re-test whenever the
host changes — shuffle bytes are the 100 TB bottleneck the local bench
cannot always see).

Runs each query N times under each codec in SEPARATE SparkSessions
(the codec is a session-start config), interleaved lz4/zstd, same SF
dir. Prints per-query min/median per codec.

Usage: python tools/ab_codec.py [--sf-dir DIR] [--runs N] [name ...]
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "l2_minhash_lsh",
    "q5_nation_revenue",
    "q9_product_profit",
    "pipeline_corpus_curation",
    "c16_dedup_exact",
]


def run_session(codec: str, names: list[str], sf_dir: str, runs: int) -> dict[str, list[float]]:
    """One session per codec: time each query with warm-up + N runs."""
    from pyspark.sql import SparkSession

    from ipydataclean_spark.registry import QUERIES, load_all
    from ipydataclean_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
    os.environ["SPARK_GRAFT_IO_CODEC"] = codec
    spark = get_spark(f"ab-codec-{codec}")
    spark.sparkContext.setLogLevel("ERROR")
    got = spark.conf.get("spark.io.compression.codec")
    assert got == codec, (got, codec)
    load_all()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = QUERIES[name]["fn"]

        def go():
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

        go()  # warm-up
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            go()
            samples.append(time.perf_counter() - t0)
        out[name] = samples
        print(f"  [{codec}] {name}: min={min(samples):.3f} med={statistics.median(samples):.3f}", flush=True)
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="*", default=DEFAULT_QUERIES)
    args = ap.parse_args()
    names = args.names or DEFAULT_QUERIES
    # interleave codec sessions twice to bracket weather
    acc: dict[str, dict[str, list[float]]] = {"lz4": {}, "zstd": {}}
    for _ in range(2):
        for codec in ("lz4", "zstd"):
            res = run_session(codec, names, args.sf_dir, args.runs)
            for k, v in res.items():
                acc[codec].setdefault(k, []).extend(v)
    print("==== summary (all samples pooled) ====")
    for name in names:
        a, b = acc["lz4"][name], acc["zstd"][name]
        print(
            f"{name}: lz4 min={min(a):.3f} med={statistics.median(a):.3f} | "
            f"zstd min={min(b):.3f} med={statistics.median(b):.3f}"
        )


if __name__ == "__main__":
    main()
