"""End-to-end EMBEDDING-side curation walkthrough (round-9
continuation family).

Run:  python examples/embedding_curation_stack.py [sf_dir]

Where the text stack curates on tokens (dedup, quality, perplexity),
this family curates on the vector column itself — each step one
registered operator, all hash-certified against DuckDB
(tools/verify_local.py), all scored through the bit-exact vectorized
kernel (functions/knn.topk_per_row_exact):

  1. Anything off-distribution in the embedding space?
       d23_embedding_outliers       — kNN-distance top-N report
  2. Near-identical vectors carrying DIFFERENT labels?
       d22_neardup_label_conflict   — the contradictory-duplicate audit
  3. And labels that disagree with their neighborhood?
       d21_knn_label_noise          — majority-vote label audit
  4. Balance the corpus on learned structure, not metadata:
       l60_cluster_balanced_sample  — equal md5 quota per k-means cell
  5. Split WITHOUT leaking near-dups across the boundary:
       l64_leakage_free_split       — components -> one coin per cluster
  6. All of it as one funnel:
       pipeline_embedding_curation  — per-label stage attrition
  7. New vectors land? Score the delta against the store only:
       inc7_incremental_embedding   — dup/novel vs persisted history
  8. Mine cross-lingual pairs from the same embedding table:
       l58_bitext_margin_mining     — ratio-margin forward matches
"""

from __future__ import annotations

import sys

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ipydataclean_spark.registry import QUERIES, load_all
from ipydataclean_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("embedding-curation-example")
    spark.sparkContext.setLogLevel("ERROR")
    load_all()

    print(f"\n== 1. embedding-space outliers ({sf_dir}) ==")
    QUERIES["d23_embedding_outliers"]["fn"](spark, sf_dir).show(6, truncate=False)

    print("== 2. near-dup pairs with conflicting labels ==")
    QUERIES["d22_neardup_label_conflict"]["fn"](spark, sf_dir).show(6, truncate=False)

    print("== 3. kNN label-noise audit (flagged first) ==")
    (
        QUERIES["d21_knn_label_noise"]["fn"](spark, sf_dir)
        .orderBy("n_agree", "vec_id")
        .show(6, truncate=False)
    )

    print("== 4. cluster-balanced sample (per-cell quota) ==")
    QUERIES["l60_cluster_balanced_sample"]["fn"](spark, sf_dir).show(6, truncate=False)

    print("== 5. leakage-free split (near-dup clusters stay together) ==")
    (
        QUERIES["l64_leakage_free_split"]["fn"](spark, sf_dir)
        .orderBy(F.desc("n_members"))
        .show(6, truncate=False)
    )

    print("== 6. the whole funnel, per label ==")
    QUERIES["pipeline_embedding_curation"]["fn"](spark, sf_dir).show(truncate=False)

    print("== 7. incremental: delta vs stored history ==")
    (
        QUERIES["inc7_incremental_embedding"]["fn"](spark, sf_dir)
        .orderBy(F.desc("best_cos"))
        .show(6, truncate=False)
    )

    print("== 8. mined bitext pairs (top margins) ==")
    QUERIES["l58_bitext_margin_mining"]["fn"](spark, sf_dir).show(6, truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
