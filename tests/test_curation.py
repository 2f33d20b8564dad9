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


# ---------------------------------------------------------------------------
# l27 content-defined chunking
# ---------------------------------------------------------------------------


def test_cdc_chunks_partition_and_determinism():
    from ipydataclean_spark.operators.curation import cdc_chunks

    text = " ".join(f"word{i}" for i in range(200))
    chunks = cdc_chunks(text)
    assert "".join(chunks) == text  # lossless partition
    assert chunks == cdc_chunks(text)  # deterministic
    from ipydataclean_spark.operators.curation import CDC_MAX, CDC_MIN

    assert all(len(c.encode()) <= CDC_MAX for c in chunks)
    assert all(len(c.encode()) >= CDC_MIN for c in chunks[:-1])


def test_cdc_chunks_shift_resistance_vs_fixed_blocks():
    """Inserting a prefix must leave most CONTENT-DEFINED chunk
    identities intact, while fixed-size blocks all re-key — the whole
    point of CDC chunking for dedup storage."""
    from ipydataclean_spark.operators.curation import cdc_chunks

    text = " ".join(f"tok{i * 7 % 991}" for i in range(400))
    shifted = "INSERTED-PREFIX " + text
    a, b = set(cdc_chunks(text)), set(cdc_chunks(shifted))
    shared = len(a & b) / len(a)
    assert shared >= 0.7, f"CDC chunks not shift-resistant: {shared:.2f}"
    fixed_a = {text[i : i + 64] for i in range(0, len(text), 64)}
    fixed_b = {shifted[i : i + 64] for i in range(0, len(shifted), 64)}
    assert len(fixed_a & fixed_b) / len(fixed_a) < 0.1


def test_l27_detects_injected_dups(spark, sf_dir):
    from ipydataclean_spark.operators.curation import l27_cdc_chunk_dedup

    out = {r.doc_id: r for r in l27_cdc_chunk_dedup(spark, sf_dir).collect()}
    dups = [r for d, r in out.items() if d >= 1000000]
    assert dups
    # the re-cased/padded copies normalize to their originals' bytes,
    # so EVERY chunk of an injected copy is shared corpus-wide
    assert all(r.shared_ratio == 1.0 for r in dups)
    assert all(0.0 <= r.shared_ratio <= 1.0 for r in out.values())


def test_shuffle_shards_epochs_and_balance(spark, sf_dir):
    """shuffle_shards: every doc appears exactly once with a dense
    within-shard position; the permutation is reproducible for a given
    epoch, a different epoch yields a genuinely different order, and
    the hash spreads docs across all shards with bounded imbalance."""
    from ipydataclean_spark.operators.curation import shuffle_shards

    e0 = shuffle_shards(spark, sf_dir, n_shards=8, epoch=0).collect()
    e0_again = shuffle_shards(spark, sf_dir, n_shards=8, epoch=0).collect()
    e1 = shuffle_shards(spark, sf_dir, n_shards=8, epoch=1).collect()

    assert [tuple(r) for r in e0] == [tuple(r) for r in e0_again]
    docs0 = sorted(r.doc_id for r in e0)
    assert docs0 == sorted(r.doc_id for r in e1)  # same universe
    assert len(set(docs0)) == len(docs0)  # each doc exactly once
    # dense positions 1..n per shard
    by_shard = {}
    for r in e0:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) == set(range(8))
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) < 2 * min(sizes), sizes
    # epoch changes the permutation (shard assignment differs for
    # a substantial fraction of docs)
    s0 = {r.doc_id: r.shard for r in e0}
    s1 = {r.doc_id: r.shard for r in e1}
    moved = sum(1 for d in s0 if s0[d] != s1[d])
    assert moved > len(s0) // 2, f"only {moved}/{len(s0)} docs moved"


def test_sequence_pack_invariants(spark, sf_dir):
    """l34: offsets are in [0, 512); within a shard, consecutive docs'
    (pack_id*512 + offset) equals the previous doc's start + previous
    n_tok (pure concatenation, no gaps); pack_ids are non-decreasing."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["l34_sequence_pack"]["fn"](spark, sf_dir).collect()
    assert rows
    by_shard = {}
    for r in rows:
        assert 0 <= r.pack_offset < 512, r
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == set(range(8))
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: (r.pack_id, r.pack_offset, r.doc_id))
        start = 0
        for r in shard_rows:
            assert r.pack_id * 512 + r.pack_offset == start, r
            start += r.n_tok


def test_l44_bloom_superset_of_exact_and_nonvacuous(spark, sf_dir):
    """Bloom semantics: per doc, bloom hits are a SUPERSET of exact
    hits (a set member's k positions are all set by construction),
    flagged <=> any bloom hit, every exactly-contaminated doc is
    flagged, and the fixture actually exercises false positives
    (n_bloom_hits > n_exact_hits somewhere) — the gap the operator
    exists to expose. Cross-op consistency: n_exact_hits matches
    l26's exact-join n_hit for every contaminated doc."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["l44_bloom_decontaminate"]["fn"](spark, sf_dir).collect()
    assert rows
    fp_docs = 0
    for r in rows:
        assert r.n_bloom_hits >= r.n_exact_hits, r
        assert r.flagged == (r.n_bloom_hits > 0), r
        assert r.n_grams >= r.n_bloom_hits
        if r.n_bloom_hits > r.n_exact_hits:
            fp_docs += 1
    assert fp_docs > 0, "no bloom false positive on fixture: FP audit vacuous"
    l26 = {r.doc_id: r.n_hit for r in
           QUERIES["l26_contamination_check"]["fn"](spark, sf_dir).collect()}
    got = {r.doc_id: r.n_exact_hits for r in rows}
    for doc_id, n_hit in l26.items():
        assert got[doc_id] == n_hit, f"exact-hit mismatch vs l26 for {doc_id}"


def test_l44_bloom_only_matches_audit_bloom_columns(spark, sf_dir):
    """include_exact=False (the production path: no benchmark-gram
    broadcast) must agree with the audit form on every bloom-derived
    column — the knob drops columns, never changes the filter."""
    from ipydataclean_spark.operators.curation import l44_bloom_decontaminate

    audit = l44_bloom_decontaminate(spark, sf_dir).select(
        "doc_id", "n_grams", "n_bloom_hits", "flagged"
    )
    fast = l44_bloom_decontaminate(spark, sf_dir, include_exact=False)
    assert fast.columns == ["doc_id", "n_grams", "n_bloom_hits", "flagged"]
    assert audit.exceptAll(fast).count() == 0
    assert fast.exceptAll(audit).count() == 0


def test_inc5_incremental_state_matches_rebuild(spark, sf_dir):
    """The incremental bloom state (history parquet + delta append)
    must equal a from-scratch position build over hist ∪ delta — the
    mergeable-digest property the operator exists to demonstrate —
    and the delta must actually contribute novel positions (else the
    incremental path is vacuous). The report itself must flag docs."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.operators.curation import _bloom_pos
    from ipydataclean_spark.operators.incremental import (
        _INC5_DELTA_PRED,
        _INC5_HIST_PRED,
        inc5_incremental_bloom,
    )
    from ipydataclean_spark.operators.llm import shingles_col, tokens_col
    from ipydataclean_spark.operators.qhelp import documents_dup

    rows = inc5_incremental_bloom(spark, sf_dir).collect()
    assert rows and any(r.flagged for r in rows)
    for r in rows:
        assert 0 <= r.n_bloom_hits <= r.n_grams
        assert r.flagged == (r.n_bloom_hits > 0)

    # rebuild the position set in ONE shot and compare to the state.
    # NOTE: scratch_dir() CLEARS the path it hands back — derive the
    # session path from the same base helper instead of calling it.
    from ipydataclean_spark.operators.qhelp import _warehouse_base

    dd = documents_dup(spark, sf_dir)
    state_path = str(
        _warehouse_base() / f"inc5_bloom_state_{spark.sparkContext.applicationId}"
    )
    state = spark.read.parquet(state_path)

    def pos_set(pred):
        g = (
            dd.where(F.expr(pred))
            .withColumn("__toks", tokens_col("text"))
            .select(F.explode(shingles_col(F.col("__toks"), 8)).alias("g"))
            .distinct()
        )
        out = set()
        for j in range(3):
            out |= {r.p for r in g.select(_bloom_pos(F.col("g"), j).alias("p")).collect()}
        return out

    hist = pos_set(_INC5_HIST_PRED)
    full = hist | pos_set(_INC5_DELTA_PRED)
    stored = {r.p for r in state.collect()}
    assert stored == full, "incremental state drifted from the rebuild"
    assert full - hist, "delta contributed no novel positions: update vacuous"


def test_l57_matches_sequential_greedy_and_covers_both_branches(spark, sf_dir):
    """The closed-form (window cumsum + filtered max) allocation must
    reproduce the paper's sequential greedy loop exactly: ascending by
    size, each language takes min(cap*n, remaining/langs_left). Capped
    budgets are exact integers; uniform shares match to float noise of
    the greedy's running-remainder arithmetic. The fixture must
    exercise BOTH branches or the pivot machinery is vacuous."""
    from ipydataclean_spark.operators.curation import UNIMAX_EPOCH_CAP
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["l57_unimax_budgets"]["fn"](spark, sf_dir).collect()
    assert {r.capped for r in rows} == {0, 1}, "pivot vacuous on fixture"
    asc = sorted(rows, key=lambda r: (r.n_tokens, r.lang))
    total = sum(r.n_tokens for r in rows)
    rem = (3 * total) // 2
    for i, r in enumerate(asc):
        share = rem / (len(asc) - i)
        greedy = min(UNIMAX_EPOCH_CAP * r.n_tokens, share)
        assert abs(r.budget_tokens - greedy) <= 1e-9 * greedy, (r.lang, r.budget_tokens, greedy)
        assert abs(r.epochs - r.budget_tokens / r.n_tokens) < 1e-12
        if r.capped:
            assert r.budget_tokens == float(UNIMAX_EPOCH_CAP * r.n_tokens)
            assert r.epochs == float(UNIMAX_EPOCH_CAP)
        else:
            assert r.epochs < UNIMAX_EPOCH_CAP
        rem -= greedy
    assert abs(sum(r.budget_tokens for r in rows) - (3 * total) // 2) < 1e-6


def test_l68_materializes_l57_budgets_consistently(spark, sf_dir):
    """The plan must reconcile with l57 exactly: per language,
    n_full_copies = floor(epochs), capped languages get whole epochs
    and ZERO fractional draws, extra docs stay within the fractional
    expectation's support (0 <= n_extra <= n_docs, zero iff frac is
    zero), and total instances = n_docs*full + extra."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    plan = {r.lang: r for r in QUERIES["l68_unimax_materialize"]["fn"](spark, sf_dir).collect()}
    budgets = {r.lang: r for r in QUERIES["l57_unimax_budgets"]["fn"](spark, sf_dir).collect()}
    assert set(plan) == set(budgets)
    import math

    for lang, p in plan.items():
        b = budgets[lang]
        assert p.epochs == b.epochs
        assert p.n_full_copies == math.floor(b.epochs)
        frac = b.epochs - math.floor(b.epochs)
        assert 0 <= p.n_extra_docs <= p.n_docs
        if frac == 0.0:
            assert p.n_extra_docs == 0
        if b.capped:
            assert p.n_extra_docs == 0 and p.epochs == float(p.n_full_copies)
        assert p.total_doc_instances == p.n_docs * p.n_full_copies + p.n_extra_docs
    assert any(p.n_extra_docs > 0 for p in plan.values()), "fractional pass vacuous"
