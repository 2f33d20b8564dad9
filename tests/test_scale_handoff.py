"""Pins for the exact-kernel scale handoff (VERDICT r09 #5).

Three contracts:
1. The cap FAILS LOUD: a candidate side past EXACT_CAND_CAP raises
   in the single-pass kernel (never an executor OOM).
2. The blocked exact kernel is BIT-IDENTICAL to the single-pass
   kernel — same pairs, same cosines, same rn — in both threshold
   (k=None, min_cos) and top-k modes, payloads included.
3. The auto dispatcher picks the single pass below the cap and the
   blocked path above it, and the banded HIGH-τ path (l4b) produces
   the same keeper set as the exact kernel on the seeded twin slice.
"""

import pytest
from pyspark.sql import functions as F

from ipydataclean_spark.functions import knn
from ipydataclean_spark.operators import llm


def _side(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
    )


def test_cap_raises_loud(spark, sf_dir, monkeypatch):
    """Past the cap the kernel must raise with the handoff guidance,
    not collect an unbounded side (cap shrunk so the pin is cheap;
    the guard reads the module global at call time)."""
    monkeypatch.setattr(knn, "EXACT_CAND_CAP", 50)
    side = _side(spark, sf_dir)  # 200 rows at sf0.01 > 50
    with pytest.raises(ValueError, match="exceeds 50 rows"):
        knn.topk_per_row_exact(side, side, 3)


def _rows_key(df):
    return sorted(
        (r.part_id, r.cand_id, r.cos_sim, r.rn) for r in df.collect()
    )


def test_blocked_equals_single_pass_threshold_mode(spark, sf_dir):
    """τ-pair mode (k=None, min_cos, only_greater): blocked output ==
    single-pass output bit-for-bit, including cosines."""
    side = _side(spark, sf_dir)
    single = knn.topk_per_row_exact(
        side, side, None, min_cos=llm.SIM_TAU, only_greater=True
    )
    blocked = knn.topk_per_row_exact_blocked(
        side, side, None, min_cos=llm.SIM_TAU, only_greater=True,
        n_cand=10_000_000,  # force many blocks regardless of the cap
    )
    a, b = _rows_key(single), _rows_key(blocked)
    assert a, "fixture must produce tau pairs"
    assert a == b


def test_blocked_equals_single_pass_topk_mode(spark, sf_dir):
    """Top-k mode with payloads and self-exclusion: the global
    re-rank must reproduce the single-pass selection, rn included."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    side = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb"),
        F.col("label").cast("int").alias("label"),
    )
    kw = dict(exclude_self=True, part_payload=(("label", "int"),))
    single = knn.topk_per_row_exact(side, side.select("id", "emb"), 5, **kw)
    blocked = knn.topk_per_row_exact_blocked(
        side, side.select("id", "emb"), 5, n_cand=10_000_000, **kw
    )
    key = lambda df: sorted(  # noqa: E731
        (r.part_id, r.rn, r.cand_id, r.cos_sim, r.label) for r in df.collect()
    )
    a, b = key(single), key(blocked)
    assert a and a == b


def test_auto_dispatch(spark, sf_dir, monkeypatch):
    """Below the cap: one pass (plan has no union). Above: blocked
    (plan unions per-block kernel passes) — and the results agree."""
    side = _side(spark, sf_dir)
    below = knn.topk_per_row_exact_auto(
        side, side, None, min_cos=llm.SIM_TAU, only_greater=True
    )
    assert "Union" not in below._jdf.queryExecution().logical().toString()
    # shrink the cap to force blocking on the 200-row fixture; at this
    # tiny n the hash-blocking's relative size variance is ~2 sigma of
    # the 0.8 fill (at the real 131k cap it is ~80 sigma), so widen
    # the fill headroom for the pin
    monkeypatch.setattr(knn, "EXACT_CAND_CAP", 64)
    monkeypatch.setattr(knn, "_BLOCK_FILL", 0.4)
    above = knn.topk_per_row_exact_auto(
        side, side, None, min_cos=llm.SIM_TAU, only_greater=True
    )
    assert "Union" in above._jdf.queryExecution().logical().toString()
    assert _rows_key(below) == _rows_key(above)


def test_banded_high_tau_keeper_set_equals_exact(spark, sf_dir):
    """The HIGH-τ production path: l4b's banded pair join over the
    seeded twin slice (embeddings_dup, twins at cos ≥ 0.99, τ = 0.98)
    finds exactly the pairs the exact kernel finds — so the dedup
    KEEPER SET (survivors after dropping each pair's higher id) is
    identical. Recall margins are sized in embed_neardup_pairs_lsh's
    docstring (miss odds ~1e-8/twin); equality here is the designed
    outcome, not luck."""
    dup = llm.embeddings_dup(spark, sf_dir)
    side = dup.select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
    exact_pairs = {
        (r.part_id, r.cand_id)
        for r in knn.topk_per_row_exact(
            side, side, None, min_cos=llm.NEARDUP_TAU, only_greater=True
        ).collect()
    }
    banded_pairs = {
        (r.vec_a, r.vec_b)
        for r in llm.embed_neardup_pairs_lsh(dup, tau=llm.NEARDUP_TAU).collect()
    }
    assert exact_pairs, "seeded twins must produce pairs"
    assert banded_pairs == exact_pairs
    all_ids = {r.id for r in side.collect()}
    keepers_exact = all_ids - {b for _, b in exact_pairs}
    keepers_banded = all_ids - {b for _, b in banded_pairs}
    assert keepers_banded == keepers_exact
