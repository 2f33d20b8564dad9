"""Pins for the media fingerprint-store scale handoff (VERDICT r10 #1).

The contract mirrors tests/test_scale_handoff.py's for embeddings:
1. The banded persisted-store probe is BIT-IDENTICAL to the closure
   probe — same doc_ids, hashes, min_hammings (clamped), statuses.
2. media_probe_auto dispatches: closure under MEDIA_STORE_CAP, banded
   past it (proven by poisoning the closure path, not by comparing
   equal outputs).
3. st17's batch twin and inc8 run UNCHANGED past the cap (shrunk via
   monkeypatch) instead of raising.
4. The streaming auto runner drains the documents stream through the
   foreachBatch banded leg past the cap and still equals the batch
   twin's report.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from ipydataclean_spark.operators.media_codecs import (
    attach_patterned_payloads,
    image_dhash,
)
from ipydataclean_spark.streaming import stream as stream_mod


def _store_df(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") % 10 == 0)
        .select("doc_id")
    )
    return image_dhash(attach_patterned_payloads(docs))


def _delta(spark, sf_dir):
    from ipydataclean_spark.streaming.batch_twins import _ST17_DELTA

    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.expr(_ST17_DELTA))
        .select("doc_id")
    )


def _rows_key(df):
    return sorted(
        (r.doc_id, r.dhash, r.min_hamming, r.status) for r in df.collect()
    )


def test_banded_equals_closure_bit_identical(spark, sf_dir, tmp_path):
    """Contract 1: every column of every row agrees between the two
    probe strategies on the same store + delta (the clamp makes novel
    min_hamming = max_hamming + 1 in both)."""
    store_path = str(tmp_path / "store")
    _store_df(spark, sf_dir).write.parquet(store_path)
    store = spark.read.parquet(store_path)
    hashes = sorted({int(r.dhash) for r in store.collect()})
    delta = _delta(spark, sf_dir)

    closure = _rows_key(stream_mod.media_probe_rows(delta, hashes))
    banded = _rows_key(stream_mod.media_probe_banded(delta, store))
    assert closure, "fixture slice must produce probe rows"
    assert closure == banded
    statuses = {r[3] for r in closure}
    assert statuses == {"dup_of_history", "novel"}
    assert all(r[2] == 8 for r in closure if r[3] == "novel")
    assert all(0 <= r[2] <= 7 for r in closure if r[3] == "dup_of_history")


def test_auto_dispatches_banded_past_cap(spark, sf_dir, tmp_path, monkeypatch):
    """Contract 2: past the (shrunk) cap the auto path must not touch
    the closure kernel at all — poison it and the probe still runs."""
    store_path = str(tmp_path / "store")
    _store_df(spark, sf_dir).write.parquet(store_path)
    store = spark.read.parquet(store_path)
    delta = _delta(spark, sf_dir)
    baseline = _rows_key(stream_mod.media_probe_auto(spark, delta, store))

    def _poisoned(*a, **k):  # pragma: no cover - failure branch
        raise AssertionError("closure probe used past the cap")

    monkeypatch.setattr(stream_mod, "MEDIA_STORE_CAP", 4)
    monkeypatch.setattr(stream_mod, "media_probe_rows", _poisoned)
    got = _rows_key(stream_mod.media_probe_auto(spark, delta, store))
    assert got == baseline


def test_st17_twin_and_inc8_run_past_cap(spark, sf_dir, monkeypatch):
    """Contract 3: the registered queries themselves survive the cap
    cliff with unchanged output (the r10 fail-loud behavior is gone)."""
    from ipydataclean_spark.operators.incremental import inc8_incremental_media
    from ipydataclean_spark.streaming.batch_twins import st17_media_ingest

    cols17 = [
        "status", "n_images", "sum_min_hamming",
        "min_min_hamming", "max_min_hamming",
    ]
    before17 = [tuple(r) for r in st17_media_ingest(spark, sf_dir).select(*cols17).collect()]
    before8 = _rows_key(inc8_incremental_media(spark, sf_dir))

    monkeypatch.setattr(stream_mod, "MEDIA_STORE_CAP", 4)
    after17 = [tuple(r) for r in st17_media_ingest(spark, sf_dir).select(*cols17).collect()]
    after8 = _rows_key(inc8_incremental_media(spark, sf_dir))
    assert before17 and before17 == after17
    assert before8 and before8 == after8


def test_banded_plan_is_equi_join(spark, sf_dir, tmp_path):
    """Plan gate: the band join must be a real (band, key) equi-join —
    a CartesianProduct/BroadcastNestedLoop here is the quadratic
    failure the banding exists to prevent."""
    store_path = str(tmp_path / "store")
    _store_df(spark, sf_dir).write.parquet(store_path)
    plan = stream_mod.media_probe_banded(
        _delta(spark, sf_dir), spark.read.parquet(store_path)
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_streaming_banded_replay_equals_batch(spark, sf_dir, monkeypatch):
    """Contract 4: the foreachBatch banded leg drains the documents
    stream past the (shrunk) cap and the aggregated report equals the
    batch twin's."""
    from ipydataclean_spark.operators.qhelp import scratch_dir
    from ipydataclean_spark.streaming.batch_twins import (
        _ST17_DELTA,
        st17_media_ingest,
    )

    monkeypatch.setattr(stream_mod, "MEDIA_STORE_CAP", 4)
    batch = st17_media_ingest(spark, sf_dir)

    store_path = scratch_dir(spark, "t_handoff_store")
    _store_df(spark, sf_dir).write.mode("overwrite").parquet(store_path)
    rows_path = scratch_dir(spark, "t_handoff_rows")
    stream_docs = (
        stream_mod.documents_stream(spark, sf_dir)
        .where(_ST17_DELTA)
        .select("doc_id")
    )
    with tempfile.TemporaryDirectory() as ckpt:
        report = stream_mod.media_ingest_stream_auto(
            spark,
            stream_docs,
            store_path,
            checkpoint_dir=ckpt,
            rows_path=rows_path,
            query_name="t_handoff",
        )
    cols = [
        "status", "n_images", "sum_min_hamming",
        "min_min_hamming", "max_min_hamming",
    ]
    got = sorted(tuple(r) for r in report.select(*cols).collect())
    want = sorted(tuple(r) for r in batch.select(*cols).collect())
    assert got == want
    assert {r[0] for r in got} == {"dup_of_history", "novel"}
