"""Streaming replay-equality tests (SURVEY.md §2.8 contract): each
streaming op drained with availableNow must equal its batch twin."""

import tempfile

import pytest

from pyspark.sql import functions as F

from ipydataclean_spark.catalog import load_table
from ipydataclean_spark.streaming.stream import (
    events_stream,
    run_available_now,
    streaming_dedup,
    tumbling_counts,
)


def _sorted_rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_tumbling_replay_equals_batch(spark, sf_dir):
    batch = tumbling_counts(load_table(spark, sf_dir, "events"))
    stream = tumbling_counts(events_stream(spark, sf_dir))
    with tempfile.TemporaryDirectory() as ckpt:
        replay = run_available_now(stream, "t_tumbling", ckpt)
        cols = ["window_start", "event_type", "n_events", "total_value"]
        assert _sorted_rows(replay, cols) == _sorted_rows(batch, cols)


def test_streaming_dedup_replay(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    batch_n = streaming_dedup(ev).count()
    with tempfile.TemporaryDirectory() as ckpt:
        stream = streaming_dedup(events_stream(spark, sf_dir))
        q = (
            stream.writeStream.format("memory")
            .queryName("t_dedup")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.table("t_dedup").count() == batch_n


def test_rate_micro_batch_source(spark):
    """Rate source demo (STATUS round-2 queue): deterministic
    rows-per-batch generation, gapless values, fixed per-batch
    timestamp advance."""
    import time

    from ipydataclean_spark.streaming.stream import rate_micro_batch_stream

    rows_per_batch = 100
    stream = rate_micro_batch_stream(spark, rows_per_batch)
    q = (
        stream.writeStream.format("memory")
        .queryName("t_rate")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline and spark.table("t_rate").count() < 3 * rows_per_batch:
            time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.table("t_rate").select("timestamp", "value").collect()
    assert len(rows) >= 3 * rows_per_batch
    values = sorted(r.value for r in rows)
    # gapless 0..n-1 sequence, exactly one row per value
    assert values == list(range(len(values)))
    # batch k (values [k*rpb, (k+1)*rpb)) carries timestamp epoch + k seconds
    for r in rows:
        assert int(r.timestamp.timestamp() * 1000) == (r.value // rows_per_batch) * 1000



def test_rolling_anomaly_replay_equals_batch(spark, sf_dir):
    """ST6: the streaming rolling-anomaly detector drained with
    availableNow flags exactly the rows the batch twin (d9) flags,
    with matching z-scores."""
    import tempfile

    from ipydataclean_spark.registry import QUERIES, load_all
    from ipydataclean_spark.streaming.stream import events_stream, rolling_anomaly_stream

    load_all()
    batch = {
        (r.user_id, r.event_id): r.zscore
        for r in QUERIES["d9_rolling_anomaly"]["fn"](spark, sf_dir).collect()
    }
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            rolling_anomaly_stream(events_stream(spark, sf_dir))
            .writeStream.format("memory")
            .queryName("t_anom")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.user_id, r.event_id): r.zscore
            for r in spark.table("t_anom").collect()
        }
    assert got.keys() == batch.keys()
    for k in batch:
        assert abs(got[k] - batch[k]) < 1e-9, k


def test_sliding_replay_equals_batch(spark, sf_dir):
    """ST2: sliding windows drained with availableNow equal the batch
    twin (every event double-counted into its 2 overlapping windows)."""
    import tempfile as _tf

    from ipydataclean_spark.streaming.stream import sliding_counts

    ev = load_table(spark, sf_dir, "events")
    batch = sliding_counts(ev)
    # sanity: overlapping windows double-count vs row count
    total = batch.agg({"n_events": "sum"}).first()[0]
    assert total == 2 * ev.count()
    with _tf.TemporaryDirectory() as ckpt:
        replay = run_available_now(
            sliding_counts(events_stream(spark, sf_dir)), "t_sliding", ckpt
        )
        cols = ["window_start", "event_type", "n_events", "total_value"]
        assert _sorted_rows(replay, cols) == _sorted_rows(batch, cols)


def test_stream_merge_to_parquet_idempotent_upsert(spark, sf_dir, tmp_path):
    """ST9+C18b: drain the events stream through foreachBatch MERGE
    into a partitioned parquet target seeded with half the events. The
    final table must equal the full events set (evens updated in place,
    odds inserted), and re-running the same merge must change nothing
    (idempotent replay)."""
    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.operators.incremental import stream_merge_to_parquet
    from ipydataclean_spark.sources import merge_into_parquet
    from ipydataclean_spark.streaming.stream import events_stream

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    target = str(tmp_path / "target")
    seed = ev.where(F.col("event_id") % 2 == 0).withColumn(
        "pk", F.col("event_id") % 8
    )
    seed.write.mode("overwrite").partitionBy("pk").parquet(target)

    stream = events_stream(spark, sf_dir).select("event_id", "user_id", "value")
    q = stream_merge_to_parquet(
        stream, target, key="event_id",
        part_expr=F.col("event_id") % 8,
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    back = spark.read.parquet(target)
    n_total = ev.count()
    assert back.count() == n_total
    assert back.agg(F.sum("event_id")).first()[0] == ev.agg(F.sum("event_id")).first()[0]

    # idempotent replay: merging the full set again changes nothing
    updates = ev.select(
        F.col("event_id").alias("u_event_id"),
        F.col("user_id").alias("u_user_id"),
        F.col("value").alias("u_value"),
        (F.col("event_id") % 8).alias("pk"),
    )
    merge_into_parquet(spark, target, updates, key="event_id", part="pk")
    again = spark.read.parquet(target)
    assert again.count() == n_total
    a = again.agg(F.sum("event_id"), F.sum("user_id")).first()
    b = ev.agg(F.sum("event_id"), F.sum("user_id")).first()
    assert tuple(a) == tuple(b)


def test_stream_stream_left_outer_join_replay(spark, sf_dir):
    """ST8b: left-outer stream-stream join drained with availableNow.
    Inner matches must equal the batch twin exactly; null-padded rows
    may only appear for genuinely unmatched purchases (subset), and
    every unmatched purchase older than the final watermark horizon
    (30 min delay + 10 min join window, with slack for per-batch
    watermark granularity) must have emitted — the held-back tail is
    exactly the rows whose join window the watermark never closed."""
    import datetime
    import tempfile

    from ipydataclean_spark.streaming.stream import (
        events_stream,
        purchase_click_join_outer,
    )

    ev = load_table(spark, sf_dir, "events")
    b_rows = purchase_click_join_outer(ev).collect()
    b_inner = {(r.p_id, r.c_id) for r in b_rows if r.c_id is not None}
    b_null = {r.p_id for r in b_rows if r.c_id is None}
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            purchase_click_join_outer(events_stream(spark, sf_dir))
            .writeStream.format("memory")
            .queryName("t_ss_outer")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        s_rows = spark.table("t_ss_outer").collect()
    s_inner = {(r.p_id, r.c_id) for r in s_rows if r.c_id is not None}
    s_null = {r.p_id for r in s_rows if r.c_id is None}
    assert s_inner == b_inner
    assert s_null <= b_null
    # global watermark = min over both sides of (max event time - delay);
    # an outer row emits once the watermark passes its join window, so
    # assert coverage strictly below that, with one batch of slack.
    max_p = ev.where(F.col("event_type") == "purchase").agg(F.max("ts")).first()[0]
    max_c = ev.where(F.col("event_type") == "click").agg(F.max("ts")).first()[0]
    horizon = min(max_p, max_c) - datetime.timedelta(minutes=30 + 10 + 5)
    old_nulls = {r.p_id for r in b_rows if r.c_id is None and r.p_ts < horizon}
    assert old_nulls <= s_null, f"watermark-closed outer rows missing: {sorted(old_nulls - s_null)[:5]}"
    assert len(s_null) >= 0.9 * len(b_null)


def test_streaming_dedup_within_watermark_replay(spark, sf_dir):
    """ST5b: dropDuplicatesWithinWatermark drained over the fixture
    (whose duplicate event_ids arrive close together) yields the same
    distinct set as batch dedup — while bounding state to the
    watermark horizon, which plain dropDuplicates does not."""
    import tempfile

    from ipydataclean_spark.streaming.stream import (
        events_stream,
        streaming_dedup_within_watermark,
    )

    ev = load_table(spark, sf_dir, "events")
    want = {r.event_id for r in ev.select("event_id").distinct().collect()}
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            streaming_dedup_within_watermark(events_stream(spark, sf_dir))
            .writeStream.format("memory")
            .queryName("t_dedup_wm")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        got = [r.event_id for r in spark.table("t_dedup_wm").select("event_id").collect()]
    assert len(got) == len(set(got)), "emitted duplicate event_ids"
    assert set(got) == want


def test_cumulative_distinct_stream_matches_batch_w8(spark, sf_dir, tmp_path):
    """Replay equality: the streaming seen-set state op's FINAL
    per-user distinct-type count must equal the batch w8 form's last
    row per user (first-occurrence flag + running sum)."""
    from ipydataclean_spark.operators.windows import w8_cumulative_distinct
    from ipydataclean_spark.streaming.stream import (
        cumulative_distinct_stream,
        events_stream,
    )

    q = (
        cumulative_distinct_stream(events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName("t_cumdist")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update-mode memory sink holds one row per batch per user: the
    # final state per user is the MAX emission (counts only grow)
    final_stream = {
        r.user_id: r.n
        for r in spark.table("t_cumdist")
        .groupBy("user_id")
        .agg(F.max("n_distinct_types").alias("n"))
        .collect()
    }
    batch = w8_cumulative_distinct(spark, sf_dir)
    final_batch = {
        r.user_id: r.distinct_types_so_far
        for r in batch.orderBy("user_id", "event_id").collect()
    }  # dict keeps the LAST (max) row per user
    # w8 filters user_id % 25 == 0; compare on that subset
    assert final_batch, "batch w8 produced nothing"
    for uid, n in final_batch.items():
        assert final_stream.get(uid) == n, (uid, n, final_stream.get(uid))


def test_chained_rollup_replay_equals_batch(spark, sf_dir):
    """ST10: two chained stateful window aggs (hourly -> daily) drained
    with availableNow in APPEND mode (the only mode Spark permits for
    multiple stateful operators) equal the batch twin on every
    watermark-CLOSED daily window; open windows are withheld by design."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.streaming.stream import chained_rollup

    ev = load_table(spark, sf_dir, "events")
    max_ts = ev.agg(F.max("ts")).collect()[0][0]
    batch = chained_rollup(ev)
    stream = chained_rollup(events_stream(spark, sf_dir))
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_chained")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        replay = spark.table("t_chained")
        cols = ["day_start", "event_type", "n_active_hours", "n_events", "total_value"]
        closed = batch.where(
            F.col("day_start") + F.expr("INTERVAL 1 DAY")
            <= F.lit(max_ts) - F.expr("INTERVAL 1 HOUR")
        )
        got = _sorted_rows(replay, cols)
        assert got == _sorted_rows(closed, cols)
        assert len(got) > 0


def test_abandoned_cart_timers_replay(spark, sf_dir, tmp_path):
    """ST6b: event-time timers — day-split files drained one per
    micro-batch so the watermark advances between batches and timers
    actually fire. Every abandonment decidable before the last
    watermark must be emitted; nothing outside the batch twin's answer
    may ever be emitted."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.streaming.batch_twins import st11_abandoned_carts
    from ipydataclean_spark.streaming.stream import abandoned_cart_stream

    ev = load_table(spark, sf_dir, "events")
    # one file per day, lexicographically time-ordered
    src_dir = tmp_path / "days"
    days = [r[0] for r in ev.select(F.to_date("ts").alias("d")).distinct().orderBy("d").collect()]
    for i, d in enumerate(days):
        (
            ev.where(F.to_date("ts") == F.lit(d))
            .coalesce(1)
            .write.parquet(str(src_dir / f"day_{i:03d}"))
        )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir) + "/day_*")
    )
    out = abandoned_cart_stream(stream)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            out.writeStream.format("memory")
            .queryName("t_abandon")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        got = {
            (r.user_id, r.abandoned_click_us)
            for r in spark.table("t_abandon").collect()
        }
    twin = {
        (r.user_id, int(r.abandoned_click_ts.timestamp() * 1_000_000))
        for r in st11_abandoned_carts(spark, sf_dir).collect()
    }
    # soundness: the stream may never invent an abandonment
    assert got <= twin, f"spurious emissions: {sorted(got - twin)[:5]}"
    # completeness up to the second-to-last day's watermark: any click
    # whose gap window closed before that horizon must have fired
    second_last_max = ev.where(
        F.to_date("ts") <= F.lit(days[-2])
    ).agg(F.max("ts")).collect()[0][0]
    horizon_us = int(second_last_max.timestamp() * 1_000_000) - 3600 * 1_000_000
    must_have = {
        (u, ts) for (u, ts) in twin if ts + 30 * 60 * 1_000_000 < horizon_us
    }
    assert must_have <= got, f"missed firings: {sorted(must_have - got)[:5]}"
    assert len(got) > 0


def test_full_outer_stream_join_replay(spark, sf_dir):
    """ST8c: full-outer stream-stream join replay — matched pairs and
    both outer directions; outer rows whose windows the final
    watermark never closed are the ONLY permitted difference from the
    batch twin, in the held-back direction only."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.streaming.stream import (
        purchase_click_join_full_outer,
    )

    ev = load_table(spark, sf_dir, "events")
    batch = purchase_click_join_full_outer(ev).collect()
    stream = purchase_click_join_full_outer(events_stream(spark, sf_dir))
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_fullouter")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(240)
        got = {(r.p_id, r.c_id) for r in spark.table("t_fullouter").collect()}
    want = {(r.p_id, r.c_id) for r in batch}
    matched_want = {t for t in want if t[0] is not None and t[1] is not None}
    # all matched pairs must replay exactly
    assert matched_want <= got, f"missing matched: {sorted(matched_want - got)[:5]}"
    # nothing outside the batch answer may ever emit
    assert got <= want, f"spurious: {sorted(got - want)[:5]}"
    # both outer directions produced at least some closed-window rows
    assert any(t[1] is None for t in got), "no outer purchases emitted"
    assert any(t[0] is None for t in got), "no outer clicks emitted"


def test_st12_evolving_state_hits_all_regimes(spark, sf_dir):
    """ST12's value is the state MUTATION between micro-batches; the
    oracle certifies values, this pins that the interesting regimes
    all actually occur on the fixture: docs deduped against seeded
    history, against a PRIOR batch's novel doc (the evolving-state
    case st1-st11 can't produce), within one batch, and novel — and
    that every dup's canonical resolves to a doc that was genuinely
    ingested earlier in (batch, doc_id) order."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["st12_dedup_ingest"]["fn"](spark, sf_dir).collect()
    by_status = {}
    for r in rows:
        by_status.setdefault(r.status, []).append(r)
    assert set(by_status) == {
        "novel", "dup_of_history", "dup_of_prior_batch", "dup_in_batch"
    }, {k: len(v) for k, v in by_status.items()}
    order = {r.doc_id: ((r.doc_id % 7) % 3, r.doc_id) for r in rows}
    for r in rows:
        mine = (r.doc_id % 7) % 3
        if r.status == "dup_of_history":
            assert r.canonical_id < 400
        elif r.status == "dup_of_prior_batch":
            assert order[r.canonical_id][0] < mine
        elif r.status == "dup_in_batch":
            assert order[r.canonical_id][0] == mine
            assert r.canonical_id < r.doc_id
        else:
            assert r.canonical_id == r.doc_id


def test_st12_replay_idempotent(spark, sf_dir, tmp_path):
    """foreachBatch is at-least-once: re-ingesting the SAME micro-batch
    (the restart-from-checkpoint replay of a partially-committed
    trigger) must converge to identical state and output — no
    duplicate rows, no dup_of_prior_batch reclassification from the
    batch's own earlier state writes (round-5 second-session review)."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.streaming.stream import ingest_dedup_batch

    state = tmp_path / "state"
    out = tmp_path / "out"
    seed = spark.createDataFrame(
        [("h1", 10, -1)], "dg STRING, canonical_id BIGINT, src_batch INT"
    )
    seed.write.mode("overwrite").partitionBy("src_batch").parquet(str(state))

    batch = spark.createDataFrame(
        # h1 = history dup; n1 twice = in-batch dup; n2 novel
        [(100, 0, "h1"), (101, 0, "n1"), (102, 0, "n1"), (103, 0, "n2")],
        "doc_id BIGINT, b INT, dg STRING",
    )
    hw = ingest_dedup_batch(batch, str(state), str(out), -1)
    first_out = sorted(
        tuple(r)
        for r in spark.read.parquet(str(out))
        .select("doc_id", "status", "canonical_id")
        .collect()
    )
    first_state = sorted(
        tuple(r)
        for r in spark.read.parquet(str(state))
        .select("dg", "canonical_id", "src_batch")
        .collect()
    )
    assert hw == 0
    assert ("h1", 10, -1) in first_state and ("n1", 101, 0) in first_state

    # the replay: same batch again, fresh high-water (a restarted query
    # begins with no in-process mark)
    ingest_dedup_batch(batch, str(state), str(out), -1)
    replay_out = sorted(
        tuple(r)
        for r in spark.read.parquet(str(out))
        .select("doc_id", "status", "canonical_id")
        .collect()
    )
    replay_state = sorted(
        tuple(r)
        for r in spark.read.parquet(str(state))
        .select("dg", "canonical_id", "src_batch")
        .collect()
    )
    assert replay_out == first_out
    assert replay_state == first_state
    # and the classifications themselves are right
    by_id = {r[0]: r[1] for r in replay_out}
    assert by_id == {
        100: "dup_of_history",
        101: "novel",
        102: "dup_in_batch",
        103: "novel",
    }


def test_st13_quality_filter_replay_equals_batch(spark, sf_dir):
    """ST13: the trained quality filter drained over the documents
    stream (complete mode — the per-lang report is the query's only
    stateful operator) must equal the batch twin exactly, model
    weights and all."""
    from ipydataclean_spark.operators.llm_quality import l47_weights
    from ipydataclean_spark.streaming.stream import (
        documents_stream,
        quality_filter_agg,
    )

    _, w = l47_weights(spark, sf_dir)
    wlist = [r.w for r in w.orderBy("f").collect()]
    batch = quality_filter_agg(load_table(spark, sf_dir, "documents"), wlist)
    stream = quality_filter_agg(documents_stream(spark, sf_dir), wlist)
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_st13")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        cols = ["lang", "n_docs", "n_kept", "mean_score"]
        assert _sorted_rows(spark.table("t_st13"), cols) == _sorted_rows(batch, cols)


def test_st14_bloom_decontaminate_replay_equals_batch(spark, sf_dir):
    """ST14: the bloom probe drained over the documents stream
    (stream-static bitset broadcast, complete-mode per-source report)
    must equal the batch twin exactly — bitset, false positives and
    all. Non-vacuity: the injected verbatim-bench overlap must flag
    something."""
    from ipydataclean_spark.operators.curation import (
        ST14_BENCH_PRED,
        bloom_bits_df,
        bloom_decontaminate_agg,
        st14_bench_positions,
    )
    from ipydataclean_spark.streaming.stream import documents_stream

    bits = bloom_bits_df(spark, st14_bench_positions(spark, sf_dir))
    batch = bloom_decontaminate_agg(
        load_table(spark, sf_dir, "documents").where(f"NOT ({ST14_BENCH_PRED})"),
        bits,
    )
    stream = bloom_decontaminate_agg(
        documents_stream(spark, sf_dir).where(f"NOT ({ST14_BENCH_PRED})"), bits
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_st14")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        cols = ["source", "n_docs", "n_flagged", "n_grams", "n_bloom_hits"]
        got = _sorted_rows(spark.table("t_st14"), cols)
        assert got == _sorted_rows(batch, cols)
        assert sum(r[4] for r in got) > 0, "bloom probe vacuous: nothing flagged"


def test_st15_embedding_ingest_replay_equals_batch(spark, sf_dir):
    """ST15: the store probe drained over the embeddings stream
    (per-row kernel top-1, complete-mode per-status report) must equal
    the batch twin exactly. Non-vacuity: both statuses present."""
    from ipydataclean_spark.operators.incremental import _INC7_DELTA, _INC7_HIST
    from ipydataclean_spark.streaming.stream import (
        embedding_ingest_agg,
        embeddings_stream,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    store = emb.where(_INC7_HIST)
    batch = embedding_ingest_agg(emb.where(_INC7_DELTA), store)
    stream = embedding_ingest_agg(
        embeddings_stream(spark, sf_dir).where(_INC7_DELTA), store
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_st15")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        cols = ["status", "n_vectors", "sum_best_cos"]
        got = _sorted_rows(spark.table("t_st15"), cols)
        assert got == _sorted_rows(batch, cols)
        assert len(got) == 2, got


def test_st16_streaming_ewma_replay_equals_batch(spark, sf_dir):
    """ST16: the per-user EWMA table drained over the events stream
    (complete mode) must equal the batch twin exactly — fold order,
    tie order, and all."""
    from ipydataclean_spark.operators.cleaning import ewma_agg
    from ipydataclean_spark.streaming.stream import events_stream

    batch = ewma_agg(load_table(spark, sf_dir, "events"))
    stream = ewma_agg(events_stream(spark, sf_dir))
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_st16")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        cols = ["user_id", "n_events", "last_value", "ewma", "residual"]
        got = _sorted_rows(spark.table("t_st16"), cols)
        assert got == _sorted_rows(batch, cols)
        assert len(got) > 10


def test_st17_media_ingest_replay_equals_batch(spark, sf_dir):
    """ST17: the media fingerprint probe drained over the documents
    stream (per-row kernel store distance, complete-mode per-status
    report) must equal the batch twin exactly. Non-vacuity: both
    statuses present, and the dup row's hamming range is [0, 7]."""
    from ipydataclean_spark.streaming.batch_twins import (
        _ST17_DELTA,
        st17_media_ingest,
    )
    from ipydataclean_spark.streaming.stream import (
        documents_stream,
        media_ingest_agg,
        media_store_hashes,
    )

    store = media_store_hashes(spark, sf_dir)
    batch = st17_media_ingest(spark, sf_dir)
    stream = media_ingest_agg(
        documents_stream(spark, sf_dir).where(_ST17_DELTA).select("doc_id"),
        store,
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_st17")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        cols = [
            "status", "n_images", "sum_min_hamming",
            "min_min_hamming", "max_min_hamming",
        ]
        got = _sorted_rows(spark.table("t_st17"), cols)
        assert got == _sorted_rows(batch, cols)
        by_status = {r[0]: r for r in got}
        assert set(by_status) == {"dup_of_history", "novel"}
        assert by_status["dup_of_history"][4] <= 7
        assert by_status["novel"][3] > 7


def test_inc8_incremental_media_classifies_history_as_dup(spark, sf_dir):
    """INC8: every replayed history image (doc_id % 10 == 0 — its
    fingerprint IS in the stored state) classifies dup at hamming 0;
    the disjoint novel slice classifies novel unless its pattern
    happens to collide (deterministic fixture, so pin the counts
    against a direct recompute)."""
    from ipydataclean_spark.operators.incremental import inc8_incremental_media

    rows = inc8_incremental_media(spark, sf_dir).collect()
    assert rows
    hist = [r for r in rows if r.doc_id % 10 == 0]
    assert hist and all(
        r.min_hamming == 0 and r.status == "dup_of_history" for r in hist
    )
    novel = [r for r in rows if r.status == "novel"]
    assert novel and all(r.doc_id % 10 == 6 for r in novel)


def test_media_store_cap_fails_loud(spark, sf_dir, monkeypatch):
    """The closure-resident store must refuse to grow unbounded: past
    MEDIA_STORE_CAP the build raises with the banded-join guidance
    (the EXACT_CAND_CAP convention), never an executor-memory
    surprise."""
    from ipydataclean_spark.streaming import stream as stream_mod

    monkeypatch.setattr(stream_mod, "MEDIA_STORE_CAP", 3)
    with pytest.raises(ValueError, match="banded"):
        stream_mod.media_store_hashes(spark, sf_dir)


def test_st18_encoding_qa_replay_equals_batch(spark, sf_dir):
    """ST18: the encoding-QA report drained over the documents stream
    (stateless decorate/corrupt/detect projections, ONE complete-mode
    per-language aggregation) must equal the batch twin exactly.
    Non-vacuity: some language shows repaired mojibake."""
    from ipydataclean_spark.operators.encoding_qa import encoding_report
    from ipydataclean_spark.streaming.batch_twins import st18_encoding_qa
    from ipydataclean_spark.streaming.stream import documents_stream

    batch = st18_encoding_qa(spark, sf_dir)
    stream = encoding_report(
        documents_stream(spark, sf_dir)
        .where("(doc_id % 9 = 2) AND text IS NOT NULL")
        .select("doc_id", "lang", "text")
    )
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stream.writeStream.format("memory")
            .queryName("t_st18")
            .outputMode("complete")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        cols = ["lang", "n_docs", "n_mojibake", "chars_repaired"]
        got = _sorted_rows(spark.table("t_st18"), cols)
        assert got == _sorted_rows(batch, cols)
        assert sum(r[2] for r in got) > 0
        assert sum(r[3] for r in got) > 0
