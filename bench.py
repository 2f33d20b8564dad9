"""Benchmark harness (BASELINE.md protocol, SURVEY.md §6/M6).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Protocol (VERDICT r09 #1): one untimed FULL pass over every headline
query first — session warm-up (whole-stage codegen JIT, broadcast
machinery, shuffle service, file-listing caches) is paid once up
front instead of inflating whichever query happens to run first in
the timed loop (the round-9 l2 A/B measured that first-position
effect at ~1.5×: 2.387 s first-in-session vs 1.608 s late on an
identical plan). Then per query: one more warm-up run, then median
of 3 timed runs around the terminal action (count of the result,
schema untouched).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ipydataclean_spark.registry import QUERIES, load_all
from ipydataclean_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary_cleaned",  # flagship: clean + Q1 agg
    "p10_summary_bundle",          # single-scan whole-table profile
    "q5_nation_revenue",           # star join, broadcast dims
    "q3_top_orders",               # 3-table join + top-k
    "d3_outliers_iqr",             # two-phase outlier detect
    "c5b_interpolate_per_user",    # partitioned window interpolation
    "c16_dedup_exact",             # hash dedup, windowed survivor
    "l1_exact_dedup",              # digest dedup
    "l2_minhash_lsh",              # MinHash LSH near-dup
    "l3_knn_exact",                # brute-force cosine top-k
    "pipeline_corpus_curation",    # quality->dedup->budget composite
    "st1_tumbling_window",         # windowed agg (streaming twin)
    "st3_session_window",          # sessionization
    "w4_moving_avg",               # rolling window stats
    "l10_token_count",             # regex token counting
    # round-2 additions (VERDICT r01 #6): the heaviest plans in the repo,
    # previously invisible to the headline
    "q9_product_profit",           # 5-table join, per-nation/year profit
    "q21_sole_return_suppliers",   # semi/anti multi-join (TPC-H Q21 shape)
    "r25b_correlated_subquery_sql",  # Catalyst-decorrelated scalar subquery
]


def time_query(spark, fn, sf_dir: str, runs: int = 3) -> float:
    fn(spark, sf_dir).count()  # warm-up (JIT, broadcast, file listing)
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def time_query_noop(spark, fn, sf_dir: str, runs: int = 3) -> float:
    """Same protocol against the noop sink (guide §1.4): computes EVERY
    column of every row, so aggregate expressions the `.count()` action
    lets Catalyst prune (the round-12 q1 finding) are measured too.
    ADDITIVE metric (VERDICT r12 #3): the `.count()` numbers above stay
    untouched for round-over-round comparability."""

    def run():
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    run()  # warm-up
    samples = []
    for _ in range(runs):
        t0 = time.perf_counter()
        run()
        samples.append(time.perf_counter() - t0)
    return statistics.median(samples)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    load_all()
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    # Untimed full session warm-up pass (VERDICT r09 #1): every headline
    # query executes once before ANY timing starts, so first-position
    # JIT/broadcast/shuffle warm-up is amortized for the whole suite.
    for name in HEADLINE:
        QUERIES[name]["fn"](spark, sf_dir).count()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        timings[name] = round(time_query(spark, QUERIES[name]["fn"], sf_dir), 3)
    # Second, ADDITIVE metric (VERDICT r12 #3): the noop sink measures the
    # declared work even where count() prunes it. Reported in separate
    # fields so `value`/`queries` stay comparable with every prior round.
    noop_timings: dict[str, float] = {}
    for name in HEADLINE:
        noop_timings[name] = round(
            time_query_noop(spark, QUERIES[name]["fn"], sf_dir), 3
        )
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
                "queries_noop": noop_timings,
                "noop_total": round(sum(noop_timings.values()), 3),
            }
        )
    )


if __name__ == "__main__":
    main()
