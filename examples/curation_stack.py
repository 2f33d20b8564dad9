"""End-to-end corpus-curation walkthrough over the round-8 operator set.

Run:  python examples/curation_stack.py [sf_dir]

The decision sequence a training-data owner actually follows, each step
one registered operator (all hash-certified against DuckDB, see
tests/ and tools/verify_local.py):

  1. How much is duplicated, and at which similarity cutoff?
       l2j_dedup_threshold_sweep  — savings per candidate tau
  2. Which ingest feeds are redundant?
       l45_domain_dedup_report   — drops attributed by source
  3. Cut cross-doc boilerplate spans, then keep one doc per digest:
       pipeline_span_curation    — the composed dedup+span-cut report
  4. Is the kept corpus contaminated with eval benchmarks?
       l44_bloom_decontaminate   — map-side bloom probe + FP audit
  5. Did the embedding distribution drift while we were at it?
       d19_embedding_drift       — slice-mean cosine + max dim shift
"""

from __future__ import annotations

import sys

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ipydataclean_spark.registry import QUERIES, load_all
from ipydataclean_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("curation-stack-example")
    spark.sparkContext.setLogLevel("ERROR")
    load_all()

    print(f"\n== 1. dedup threshold sweep ({sf_dir}) ==")
    QUERIES["l2j_dedup_threshold_sweep"]["fn"](spark, sf_dir).show(truncate=False)

    print("== 2. savings by source (top 5 most redundant) ==")
    (
        QUERIES["l45_domain_dedup_report"]["fn"](spark, sf_dir)
        .orderBy("chars_dropped", ascending=False)
        .show(5, truncate=False)
    )

    print("== 3. dedup-then-span-cut pipeline report ==")
    QUERIES["pipeline_span_curation"]["fn"](spark, sf_dir).show(truncate=False)

    print("== 4. benchmark decontamination (bloom, flagged docs only) ==")
    (
        QUERIES["l44_bloom_decontaminate"]["fn"](spark, sf_dir)
        .where("flagged")
        .orderBy("n_bloom_hits", ascending=False)
        .show(5, truncate=False)
    )

    print("== 5. embedding drift between corpus slices ==")
    QUERIES["d19_embedding_drift"]["fn"](spark, sf_dir).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
