"""Semantic tests for operators/curation.py (C31 segment dedup, L26
contamination check) beyond the DuckDB hash parity the driver checks."""

from pyspark.sql import functions as F

from ipydataclean_spark.operators.curation import (
    SEGMENT_WORDS,
    contamination_check,
    segment_dedup,
)
from ipydataclean_spark.operators.qhelp import documents_dup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_segment_dedup_known_corpus(spark):
    a = " ".join(f"a{i}" for i in range(SEGMENT_WORDS))  # block A
    b = " ".join(f"b{i}" for i in range(SEGMENT_WORDS))  # block B
    c = " ".join(f"c{i}" for i in range(SEGMENT_WORDS))  # block C
    docs = _docs(
        spark,
        [
            (1, f"{a} {b}"),  # owns A and B
            (2, f"{b} {c}"),  # loses B, keeps C
            (3, f"{a} {b}"),  # exact dup of doc 1: fully stripped
        ],
    )
    out = {r["doc_id"]: r for r in segment_dedup(docs).collect()}
    assert out[1]["n_kept"] == 2 and out[1]["kept_text"] == f"{a} {b}"
    assert out[2]["n_kept"] == 1 and out[2]["kept_text"] == c
    assert out[3]["n_kept"] == 0 and out[3]["kept_text"] is None


def test_segment_dedup_first_occurrence_within_doc(spark):
    blk = " ".join(f"x{i}" for i in range(SEGMENT_WORDS))
    tail = " ".join(f"t{i}" for i in range(SEGMENT_WORDS))
    docs = _docs(spark, [(7, f"{blk} {blk} {tail}")])
    row = segment_dedup(docs).collect()[0]
    # repeated block inside one doc: first occurrence survives
    assert row["n_segments"] == 3 and row["n_kept"] == 2
    assert row["kept_text"] == f"{blk} {tail}"


def test_segment_dedup_strips_injected_dups(spark, sf_dir):
    out = segment_dedup(documents_dup(spark, sf_dir))
    dups = out.filter("doc_id >= 1000000")
    n_dups = dups.count()
    assert n_dups > 0
    # every injected re-cased copy normalizes to its original's segments
    assert dups.filter("n_kept = 0").count() == n_dups
    # originals always keep at least their own first-owned segments: mass
    # conservation — every segment is kept exactly once across the corpus
    agg = out.agg(
        F.sum("n_kept").alias("kept"),
    ).collect()[0]
    distinct_segs = (
        segment_dedup(documents_dup(spark, sf_dir))
        .agg(F.sum("n_segments"))
        .collect()[0][0]
    )
    assert agg["kept"] <= distinct_segs


def test_contamination_flags_exact_copy_and_ignores_disjoint(spark):
    bench = _docs(spark, [(100, " ".join(f"w{i}" for i in range(12)))])
    corpus = _docs(
        spark,
        [
            (1, " ".join(f"w{i}" for i in range(12))),  # exact copy
            (2, " ".join(f"z{i}" for i in range(12))),  # disjoint
        ],
    )
    rows = contamination_check(corpus, bench).collect()
    assert [r["doc_id"] for r in rows] == [1]
    assert rows[0]["contamination_frac"] == 1.0


def test_contamination_partial_overlap_fraction(spark):
    # corpus doc = 8 benchmark words then 8 novel words -> of its 9
    # distinct 8-grams exactly the first (pure-benchmark) one collides
    bench_words = [f"w{i}" for i in range(8)]
    novel = [f"n{i}" for i in range(8)]
    bench = _docs(spark, [(100, " ".join(bench_words))])
    corpus = _docs(spark, [(1, " ".join(bench_words + novel))])
    row = contamination_check(corpus, bench).collect()[0]
    assert row["n_grams"] == 9 and row["n_hit"] == 1
    assert abs(row["contamination_frac"] - 1 / 9) < 1e-8
