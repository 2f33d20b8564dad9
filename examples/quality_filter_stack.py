"""End-to-end TRAINED-quality-tier walkthrough over the round-9 set.

Run:  python examples/quality_filter_stack.py [sf_dir]

The round-9 additions turn the heuristic quality surface (Gopher
rules, LM scores, DSIR) into a trained, measured, deployable tier —
each step one registered operator, all hash-certified against DuckDB
(tools/verify_local.py):

  1. Train + validate the classifier (fastText-style NB over hashed
     n-grams, clean docs vs degraded twins):
       l47_quality_classifier     — held-out scores/predictions
  2. What would the filter do to the corpus, per slice?
       l49_quality_score_distribution — keep rate by (source, lang)
  3. Combine with CCNet's perplexity policy:
       l52_perplexity_buckets     — head/middle/tail per language
  4. Run the whole funnel: dedup -> classifier -> tail drop:
       pipeline_quality_curation  — per-source stage attrition
  5. New batch lands? Score the delta only (model frozen):
       inc6_incremental_quality   — persisted weights + score store
  6. Or filter the ingest stream itself:
       st13_quality_filter        — per-row fold, complete-mode report
  7. And is retrieval over the kept corpus any good?
       l48_retrieval_eval         — recall@10 / MRR / nDCG per tier
"""

from __future__ import annotations

import sys

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ipydataclean_spark.registry import QUERIES, load_all
from ipydataclean_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("quality-filter-example")
    spark.sparkContext.setLogLevel("ERROR")
    load_all()

    print(f"\n== 1. trained classifier, held-out sample ({sf_dir}) ==")
    QUERIES["l47_quality_classifier"]["fn"](spark, sf_dir).show(6, truncate=False)

    print("== 2. keep-rate by slice (lowest keep rates first) ==")
    (
        QUERIES["l49_quality_score_distribution"]["fn"](spark, sf_dir)
        .orderBy("keep_rate")
        .show(5, truncate=False)
    )

    print("== 3. perplexity tertiles per language ==")
    QUERIES["l52_perplexity_buckets"]["fn"](spark, sf_dir).show(truncate=False)

    print("== 4. full curation funnel (per-source attrition) ==")
    QUERIES["pipeline_quality_curation"]["fn"](spark, sf_dir).show(8, truncate=False)

    print("== 5. incremental scoring report (frozen model) ==")
    QUERIES["inc6_incremental_quality"]["fn"](spark, sf_dir).show(truncate=False)

    print("== 6. streaming filter batch twin (per-lang keep report) ==")
    QUERIES["st13_quality_filter"]["fn"](spark, sf_dir).show(truncate=False)

    print("== 7. retrieval quality over the corpus ==")
    QUERIES["l48_retrieval_eval"]["fn"](spark, sf_dir).show(truncate=False)

    spark.stop()


if __name__ == "__main__":
    main()
