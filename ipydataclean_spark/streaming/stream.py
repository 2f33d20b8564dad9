"""Structured Streaming forms of the batch twins — SURVEY.md §2.8.

``events_stream`` replays the static events parquet as an unbounded
source (file source + availableNow trigger in tests); the transform
builders are shared with batch_twins so stream and batch literally run
the same expressions (the §2.8 contract). Watermarks bound state for
the stateful ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark import catalog
from ipydataclean_spark.functions import exact


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6: unbounded events source (file source over the fixture dir).

    The stream reader needs an explicit schema; take it from a batch
    footer read (one cheap metadata job) so either fixture vintage —
    TIMESTAMP(NANOS) read as long nanos, or TIMESTAMP(MICROS) read as
    NTZ — streams with the same canonical ``ts`` rule as the batch
    catalog loader (catalog.normalize_events_ts)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return catalog.normalize_events_ts(_table_stream(spark, sf_dir, "events"))


def _table_stream(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """ONE schema-from-footer + pathGlobFilter stream-reader builder
    for every fixture table (review r09c: three verbatim copies had
    grown; events layers its ts normalization on top of this)."""
    schema = spark.read.parquet(catalog.table_path(sf_dir, name)).schema
    return (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", f"{name}.parquet")
        .load(sf_dir)
    )


def tumbling_counts(ev: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """ST1/ST4: watermarked 10-minute tumbling aggregate (append-safe)."""
    src = ev.withWatermark("ts", watermark) if ev.isStreaming else ev
    return (
        src.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), exact.dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def session_agg(ev: DataFrame, gap: str = "4 hours", watermark: str = "1 hour") -> DataFrame:
    """ST3: native session_window form (streaming state-store backed)."""
    src = ev.withWatermark("ts", watermark) if ev.isStreaming else ev
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), exact.dsum("value").alias("session_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )


def streaming_dedup(ev: DataFrame) -> DataFrame:
    """ST5: drop duplicate event_ids within the watermark horizon."""
    src = ev.withWatermark("ts", "1 hour") if ev.isStreaming else ev
    return src.dropDuplicates(["event_id"])


def streaming_dedup_within_watermark(ev: DataFrame) -> DataFrame:
    """ST5b: dropDuplicatesWithinWatermark — unlike plain
    dropDuplicates (state grows with distinct keys forever), state for
    a key is EVICTED once the watermark passes its first-seen event
    time + delay, so duplicates are only suppressed within the horizon
    and state is bounded. That eviction bound is the production
    contract for at-least-once sources whose retries cluster in time —
    the 100 TB answer to unbounded dedup state. Batch fallback is
    plain dropDuplicates (the horizon is a streaming concept)."""
    if not ev.isStreaming:
        return ev.dropDuplicates(["event_id"])
    return ev.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])


def purchase_click_join(ev: DataFrame) -> DataFrame:
    """ST8: stream-stream join — clicks within 10 minutes before each
    purchase, per user. Both sides watermarked; the time-bound condition
    lets the state store evict rows past the horizon. The same function
    body serves as the batch twin (no watermark on static input)."""
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    if ev.isStreaming:
        purchases = purchases.withWatermark("p_ts", "30 minutes")
        clicks = clicks.withWatermark("c_ts", "30 minutes")
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
        "inner",
    ).select("p_id", "c_id", "p_user")


def purchase_click_join_outer(ev: DataFrame) -> DataFrame:
    """ST8b: stream-stream LEFT OUTER join — every purchase, with its
    preceding-10-minute clicks or a NULL pad. The outer (null) row for
    a purchase can only emit once the watermark has closed its join
    window — the state store must know no matching click can still
    arrive — so unmatched purchases inside the final watermark horizon
    of a drained stream are held back forever. The replay test asserts
    exactly that boundary instead of pretending replay equals batch."""
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    if ev.isStreaming:
        purchases = purchases.withWatermark("p_ts", "30 minutes")
        clicks = clicks.withWatermark("c_ts", "30 minutes")
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
        "left_outer",
    ).select("p_id", "c_id", "p_user", "p_ts")


def stateful_user_totals(ev: DataFrame) -> DataFrame:
    """ST6: arbitrary stateful op — per-user running totals via
    applyInPandasWithState (state store backed; emits the running
    (n, total) per user on every batch).

    The update fn is a local closure (pickle-by-value — executors never
    import this package)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id LONG, n_events LONG, total_value DOUBLE",
        stateStructType="n LONG, total DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_available_now(stream_df: DataFrame, query_name: str, checkpoint_dir: str) -> DataFrame:
    """ST9: drain the whole source with trigger(availableNow=True) into
    a memory sink; returns the materialized result table. This is the
    replay-equality harness the batch twins are checked against."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete" if stream_df.isStreaming else "append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    spark = stream_df.sparkSession
    return spark.table(query_name)


def rate_micro_batch_stream(spark: SparkSession, rows_per_batch: int = 100) -> DataFrame:
    """S6 rate-source variant: the deterministic `rate-micro-batch`
    source — exactly rows_per_batch rows per trigger, value column is
    a gapless 0..n sequence, timestamps advance a fixed 1000 ms per
    batch from epoch 0. The synthetic-load twin of the file-replay
    source (used for throughput smoke tests where no fixture file is
    wanted)."""
    return (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .option("numPartitions", 2)
        .option("startTimestamp", 0)
        .option("advanceMillisPerBatch", 1000)
        .load()
    )


def stateful_user_totals_tws(ev: DataFrame) -> DataFrame:
    """ST6 on the Spark 4.x transformWithStateInPandas API: the same
    per-user running (n, total) as stateful_user_totals, expressed as a
    StatefulProcessor with an explicit ValueState handle — the
    forward-looking form (RocksDB-backed state store, per-state-var
    schemas, timer support) that replaces applyInPandasWithState.

    Defined as a LOCAL class for pickle-by-value (same rule as the
    other kernels: executors never import this package).

    Environment note: the TWS state-server protocol needs
    google.protobuf, absent in this container — the replay test gates
    on that import; applyInPandasWithState above is the tested ST6
    path here. Also set
    spark.sql.streaming.stateStore.providerClass=...RocksDBStateStoreProvider
    (transformWithState requires the RocksDB provider)."""
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    state_schema = StructType(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].fillna(0.0).sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return ev.groupBy("user_id").transformWithStateInPandas(
        RunningTotals(),
        outputStructType="user_id LONG, n_events LONG, total_value DOUBLE",
        outputMode="Update",
        timeMode="None",
    )


def rolling_anomaly_stream(
    ev: DataFrame, window_n: int = 20, min_n: int = 10, z_thresh: float = 2.5
) -> DataFrame:
    """ST6: streaming twin of d9_rolling_anomaly — per-user online
    z-score against the trailing ``window_n`` values, kept as a
    ring-buffer in the state store (ARRAY<DOUBLE> state, bounded at
    ``window_n`` elements per user — O(keys·window) total state, safe
    for an unbounded stream). Emits only flagged events (append mode).

    The update fn is a local closure (pickle-by-value — executors never
    import this package). Batch rows are processed in (ts, event_id)
    order so replay over time-ordered micro-batches reproduces the
    batch twin's window semantics exactly. Null values occupy a frame
    slot in the batch twin's ROWS BETWEEN frame (COUNT(value) just
    skips them), so the ring buffer keeps a NaN placeholder for them —
    dropping nulls entirely would let the streaming window reach
    further back than the batch one (ADVICE r01)."""
    import math

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        vals = list(state.get[0]) if state.exists else []
        out_id, out_val, out_z = [], [], []
        batch = pd.concat(list(pdfs))
        if len(batch):
            batch = batch.sort_values(["ts", "event_id"])
            for eid, v in zip(batch["event_id"], batch["value"]):
                is_null = v is None or (isinstance(v, float) and math.isnan(v))
                if not is_null:
                    live = [x for x in vals if not math.isnan(x)]
                    n = len(live)
                    if n >= min_n:
                        s = sum(live)
                        sq = sum(x * x for x in live)
                        var = (sq - s * s / n) / (n - 1)
                        sd = math.sqrt(var) if var > 0 else 0.0
                        if sd > 0:
                            z = (float(v) - s / n) / sd
                            if abs(z) > z_thresh:
                                out_id.append(int(eid))
                                out_val.append(float(v))
                                out_z.append(float(z))
                # nulls take a frame slot (as NaN) to mirror the
                # batch twin's row-based frame
                vals.append(float("nan") if is_null else float(v))
                if len(vals) > window_n:
                    vals.pop(0)
        state.update((vals,))
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(out_id),
                "event_id": out_id,
                "value": out_val,
                "zscore": out_z,
            }
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id LONG, event_id LONG, value DOUBLE, zscore DOUBLE",
        stateStructType="vals ARRAY<DOUBLE>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sliding_counts(ev: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """ST2: watermarked sliding-window aggregate (10-minute windows
    every 5 minutes — each event lands in 2 windows). Same shape in
    batch and streaming; the replay test drains with availableNow in
    complete mode and must equal the batch run."""
    src = ev.withWatermark("ts", watermark) if ev.isStreaming else ev
    return (
        src.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), exact.dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def cumulative_distinct_stream(ev: DataFrame) -> DataFrame:
    """ST6 twin of the batch w8_cumulative_distinct: per-user count of
    DISTINCT event types seen so far, maintained as arbitrary state
    (the running-distinct ask neither engine's windows support —
    batch solves it with the first-occurrence trick, streaming keeps
    the seen-set in the state store and emits the current cardinality
    per batch).

    State is the sorted list of seen types — bounded by the type
    alphabet, NOT the event count, so state size is O(users × types)
    at any scale; a high-cardinality dimension would swap the exact
    set for an HLL sketch register with the same update shape."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        (seen_csv,) = state.get if state.exists else ("",)
        seen = set(seen_csv.split("\x1f")) - {""}
        for pdf in pdfs:
            seen |= set(pdf["event_type"].dropna())
        state.update(("\x1f".join(sorted(seen)),))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_distinct_types": [len(seen)]}
        )

    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id LONG, n_distinct_types LONG",
        stateStructType="seen STRING",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def chained_rollup(ev: DataFrame) -> DataFrame:
    """ST10: CHAINED windowed aggregation — hourly tumbling counts
    rolled up into daily totals inside ONE query, two stateful
    operators back to back (Spark 3.4+ multiple-stateful-operator
    support: the second groupBy keys on ``window_time`` of the first
    window, which carries the event-time column + watermark through).
    The production shape for tiered rollups: the wide raw stream is
    reduced hour-by-hour in state, and the daily tier aggregates
    hour-sized partials — state and shuffle for tier 2 scale with
    HOURS, not events.

    Exactness: hourly partials go through decimal sums and the daily
    re-sum is decimal again, so (daily total) == (direct daily sum)
    bit-for-bit — order-independence is what makes the tiered result
    equal the batch twin's single-pass answer.
    """
    src = ev.withWatermark("ts", "1 hour") if ev.isStreaming else ev
    hourly = (
        src.groupBy(F.window("ts", "1 hour").alias("h"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact.dsum("value").alias("hour_value"),
        )
    )
    return (
        hourly.groupBy(
            F.window(F.window_time("h"), "1 day").alias("d"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_active_hours"),
            F.sum("n_events").alias("n_events"),
            exact.dsum("hour_value").alias("total_value"),
        )
        .select(
            F.col("d.start").alias("day_start"),
            "event_type",
            "n_active_hours",
            "n_events",
            "total_value",
        )
    )


def abandoned_cart_stream(ev: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """ST6b: EVENT-TIME TIMERS — detect abandoned carts: a 'click' with
    no follow-up click/purchase by the same user within ``gap_minutes``
    is emitted once the watermark passes click+gap, via
    applyInPandasWithState + GroupStateTimeout.EventTimeTimeout. This
    is the pattern state stores exist for: the OUTPUT row is triggered
    by the ABSENCE of data, which no windowed aggregate can express.

    Semantics (shared with the batch twin st11_abandoned_carts): among
    a user's click/purchase events in event-time order, a click is
    abandoned iff the next click-or-purchase is > gap later or never
    comes. A follow-up click within the gap supersedes (cart updated,
    old click not abandoned); a purchase within the gap completes it.

    State: ONE pending click timestamp per user (O(users) state, no
    buffers); the timer re-arms to pending+gap on every update and the
    group emits either in-batch (when a later event already decides
    the outcome) or from the timeout callback (when only the advancing
    watermark does)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000

    def update(key, pdfs, state):
        out = []
        if state.hasTimedOut:
            (pending_us,) = state.get
            state.remove()
            if pending_us is not None:
                out.append(pending_us)
            yield pd.DataFrame(
                {"user_id": [key[0]] * len(out),
                 "abandoned_click_us": pd.Series(out, dtype="int64")}
            )
            return
        pending = state.get[0] if state.exists else None
        batch = pd.concat(list(pdfs))
        batch = batch[batch["event_type"].isin(["click", "purchase"])]
        if len(batch):
            batch = batch.sort_values(["ts", "event_id"])
            for r in batch.itertuples():
                ts_us = int(r.ts.value // 1000)  # pandas ns -> epoch micros
                if pending is not None and ts_us - pending > gap_us:
                    out.append(pending)  # decided in-stream: abandoned
                    pending = None
                if r.event_type == "click":
                    pending = ts_us
                else:  # purchase within gap completes the pending cart
                    pending = None
        if pending is not None:
            deadline_ms = (pending + gap_us) // 1000
            if deadline_ms <= state.getCurrentWatermarkMs():
                # the gap window already closed behind the watermark
                # (late-arriving click): decidable NOW — a timer in the
                # past is illegal, so emit in-batch instead
                out.append(pending)
                if state.exists:
                    state.remove()
            else:
                state.update((pending,))
                # fire when the watermark passes pending+gap (ms)
                state.setTimeoutTimestamp(deadline_ms)
        elif state.exists:
            state.remove()
        yield pd.DataFrame(
            {"user_id": [key[0]] * len(out),
             "abandoned_click_us": pd.Series(out, dtype="int64")}
        )

    src = ev.withWatermark("ts", "1 hour") if ev.isStreaming else ev
    return src.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id LONG, abandoned_click_us LONG",
        stateStructType="pending LONG",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def purchase_click_join_full_outer(ev: DataFrame) -> DataFrame:
    """ST8c: stream-stream FULL OUTER join — purchases matched to
    preceding-10-minute clicks, PLUS null-padded rows for unmatched
    purchases AND unmatched clicks. Both outer directions are
    watermark-gated: an unmatched row on either side emits only when
    the watermark proves its join window closed (the strongest
    stream-stream join mode Spark supports; state on both sides is
    evicted at the same horizon). Output key columns are coalesced so
    every row names its user regardless of which side survived."""
    purchases = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"),
        F.col("event_id").alias("p_id"),
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_id"),
    )
    if ev.isStreaming:
        purchases = purchases.withWatermark("p_ts", "30 minutes")
        clicks = clicks.withWatermark("c_ts", "30 minutes")
    return purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("c_ts") < F.col("p_ts"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 10 MINUTES")),
        "full_outer",
    ).select(
        "p_id", "c_id",
        F.coalesce("p_user", "c_user").alias("user_id"),
        "p_ts", "c_ts",
    )


def dedup_ingest_stream(
    stream_df: DataFrame, state_path: str, out_path: str, checkpoint_dir: str
):
    """ST12: continuous dedup-vs-history ingest with EVOLVING state —
    the streaming form of inc2/inc4: each micro-batch of
    (doc_id, b, dg) rows is classified against the digest state table
    (``dup_of_history`` / ``dup_of_prior_batch`` / ``dup_in_batch`` /
    ``novel`` + the canonical id), classifications append to
    ``out_path``, and novel firsts append to the state — so a doc
    ingested in batch k IS history for batch k+1. The state mutation
    between batches is what none of the stateless st* twins exercise.

    ``b`` is the logical batch key carried IN the data: the kernel
    processes each distinct b in ascending order as a sub-batch with a
    state round-trip between them, so the result is robust to the
    source COALESCING consecutive files into one trigger. It is NOT
    robust to out-of-ORDER delivery across triggers (classification is
    inherently arrival-order semantics — if b=1 arrives in a trigger
    before b=0, b=0's doc would be classified against b=1's state);
    the kernel therefore tracks a high-water mark and FAILS LOUDLY on
    a b below it rather than silently inverting canonicals
    (round-5 review finding). With in-order delivery the run is
    exactly reproducible by a batch engine — the registered oracle
    replays it as one FIRST_VALUE window over (b, doc_id).

    REPLAY-SAFE under foreachBatch's at-least-once contract (round-5
    second-session review): both sinks are partitioned on the batch
    key and each sub-batch dynamically OVERWRITES its own partition,
    and the state read sees only strictly-older batches — so a
    replayed, partially-committed micro-batch converges to the same
    files and the same classifications instead of appending
    duplicates or reclassifying its own docs as dup_of_prior_batch
    (pinned by tests/test_streaming.py's double-ingest replay test;
    the per-batch kernel is ``ingest_dedup_batch``).

    Scale shape: state lookups are digest-keyed equi-joins (bucket the
    state table by digest at 100 TB and probes co-locate, the inc2
    argument); per batch the state is READ once per sub-batch and only
    novel digests are written. All kernel logic is JVM DataFrame ops —
    foreachBatch runs on the driver, no Python worker closures."""
    high_water = [-1]

    def ingest(batch: DataFrame, _epoch: int) -> None:
        high_water[0] = ingest_dedup_batch(
            batch, state_path, out_path, high_water[0]
        )

    return (
        stream_df.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def ingest_dedup_batch(
    batch: DataFrame, state_path: str, out_path: str, high_water: int = -1
) -> int:
    """One micro-batch of the ST12 kernel (factored out so the replay
    test can invoke it twice on the same batch and assert idempotent
    output). Returns the new high-water mark."""
    spark = batch.sparkSession
    bs = sorted(r.b for r in batch.select("b").distinct().collect())
    if bs and bs[0] < high_water:
        raise RuntimeError(
            f"dedup_ingest_stream: batch key {bs[0]} arrived after "
            f"{high_water} was already processed — out-of-order "
            "delivery would invert prior-batch canonicals"
        )
    for bv in bs:
        sub = batch.where(F.col("b") == bv).select("doc_id", "b", "dg")
        state = (
            spark.read.parquet(state_path)
            # ONLY strictly-older batches are history: on an
            # at-least-once REPLAY of a partially-committed batch,
            # rows this same batch wrote earlier (src_batch == bv)
            # must not reclassify its docs as dup_of_prior_batch
            # (round-5 second-session review)
            .where(F.col("src_batch") < F.lit(bv))
            .groupBy("dg")
            .agg(F.min(F.struct("src_batch", "canonical_id")).alias("s"))
            .select(
                "dg",
                F.col("s.src_batch").alias("src_batch"),
                F.col("s.canonical_id").alias("state_canonical"),
            )
        )
        firsts = sub.groupBy("dg").agg(F.min("doc_id").alias("first_id"))
        cls = (
            sub.join(state, "dg", "left")
            .join(firsts, "dg")
            .select(
                "doc_id", "b", "dg", "first_id",
                F.when(F.col("src_batch") == -1, F.lit("dup_of_history"))
                .when(F.col("src_batch").isNotNull(), F.lit("dup_of_prior_batch"))
                .when(F.col("first_id") < F.col("doc_id"), F.lit("dup_in_batch"))
                .otherwise(F.lit("novel"))
                .alias("status"),
                F.coalesce(
                    F.col("state_canonical"),
                    F.when(F.col("first_id") < F.col("doc_id"), F.col("first_id")),
                    F.col("doc_id"),
                ).alias("canonical_id"),
            )
        )
        # idempotent writes: both sinks are PARTITIONED on the batch
        # key and the sub-batch OVERWRITES its own partition
        # (dynamic partitionOverwriteMode), so an at-least-once
        # replay of a partially-committed micro-batch converges to
        # the same files instead of appending duplicates
        (
            cls.select("doc_id", "status", "canonical_id", "b")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("b")
            .parquet(out_path)
        )
        (
            cls.where(F.col("status") == "novel")
            .select(
                "dg",
                F.col("doc_id").alias("canonical_id"),
                F.lit(bv).cast("int").alias("src_batch"),
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("src_batch")
            .parquet(state_path)
        )
        high_water = bv
    return high_water


def documents_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 for the documents table: unbounded file source over the
    fixture dir (schema from one batch footer read, the events_stream
    rule)."""
    return _table_stream(spark, sf_dir, "documents")


#: media fingerprint store cap — the probe store rides the kernel
#: closure (the st15 convention); past this, persist it as a table
#: and band-join instead (the l9f pair stage)
MEDIA_STORE_CAP = 1 << 16


def media_store_hashes(spark, sf_dir: str) -> list[int]:
    """The persisted media fingerprint store: dHashes of the HISTORY
    image slice (doc_id % 10 == 0, twins included — identical hashes
    collapse naturally), collected once (bounded pull, cap-asserted)
    and sorted for determinism. Shared by st17's stream probe and
    inc8's literal-state classify so one store definition carries all
    execution modes."""
    from ipydataclean_spark.operators.media_codecs import (
        attach_patterned_payloads,
        image_dhash,
    )
    from ipydataclean_spark.operators.qhelp import T

    docs = T(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    rows = (
        image_dhash(attach_patterned_payloads(docs))
        .limit(MEDIA_STORE_CAP + 1)
        .collect()
    )
    if len(rows) > MEDIA_STORE_CAP:
        raise ValueError(
            f"media store exceeds {MEDIA_STORE_CAP} fingerprints; persist "
            "it and use the banded pair join (l9f) instead of the closure probe"
        )
    return sorted({int(r.dhash) for r in rows})


def media_probe_rows(
    delta_docs: DataFrame, store_hashes: list[int], *, max_hamming: int = 7
) -> DataFrame:
    """(doc_id) -> (doc_id, dhash, min_hamming, status): build the
    fixture payload, decode, dHash, and compute the MINIMUM hamming
    distance against the store INSIDE the kernel (vectorized XOR +
    unpackbits popcount over the closure-resident store — the st15
    per-row-top-1 pattern, which keeps the downstream report the
    query's ONLY stateful operator and therefore stream-legal).
    status = dup_of_history iff min_hamming <= max_hamming (the l9f
    reach). min_hamming is CLAMPED at max_hamming + 1 — distances
    past the dup threshold carry no routing information, and the
    clamp is what makes this closure strategy and the banded store
    strategy (``media_probe_banded``) emit BIT-IDENTICAL rows, so
    ``media_probe_auto`` can dispatch on store size without changing
    any output (the topk_per_row_exact_auto contract). Stateless
    Arrow map; undecodable payloads dropped."""
    from ipydataclean_spark.operators.media_codecs import (
        attach_patterned_payloads,
        decode_bmp,
        dhash64,
    )

    media = attach_patterned_payloads(delta_docs)
    store = list(store_hashes)
    _decode, _dh = decode_bmp, dhash64  # closure-bound (by-value module)

    def kernel(batches):
        import numpy as np
        import pandas as pd

        hu = np.array(store, dtype=np.int64).view(np.uint64)
        for pdf in batches:
            ids, hashes, mins, status = [], [], [], []
            for r in pdf.itertuples():
                try:
                    px = _decode(bytes(r.payload))
                except Exception:
                    continue
                hv = _dh(px)
                signed = hv - (1 << 64) if hv >= (1 << 63) else hv
                if len(hu):
                    x = np.bitwise_xor(hu, np.uint64(hv))
                    pop = (
                        np.unpackbits(x.view(np.uint8).reshape(len(hu), 8), axis=1)
                        .sum(axis=1)
                        .min()
                    )
                    mh = min(int(pop), max_hamming + 1)
                else:
                    mh = max_hamming + 1
                ids.append(r.doc_id)
                hashes.append(signed)
                mins.append(mh)
                status.append(
                    "dup_of_history" if mh <= max_hamming else "novel"
                )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "dhash": pd.Series(hashes, dtype="int64"),
                    "min_hamming": pd.Series(mins, dtype="int32"),
                    "status": pd.Series(status, dtype=object),
                }
            )

    return media.mapInPandas(
        kernel,
        schema="doc_id BIGINT, dhash BIGINT, min_hamming INT, status STRING",
    )


def media_probe_banded(
    delta_docs: DataFrame, store_df: DataFrame, *, max_hamming: int = 7
) -> DataFrame:
    """The SCALE strategy of the media probe: same contract as
    ``media_probe_rows`` — (doc_id) -> (doc_id, dhash, min_hamming,
    status), bit-identical rows — but the store is a persisted TABLE
    (any size), never a driver collect. Shape: fingerprint the delta
    (stateless Arrow map), band DISTINCT delta hashes and DISTINCT
    store hashes 8x8 bits (``band8`` — pigeonhole-complete for
    hamming <= max_hamming <= 7), equi-join on (band, key), exact
    ``bit_count`` filter, min per delta hash, then join back to the
    per-doc grain. Because every store hash within hamming <=
    max_hamming of a probe IS a band candidate, the matched minimum
    equals the true minimum for every dup row; novel rows emit the
    clamped sentinel max_hamming + 1 exactly as the closure kernel
    does. Shuffles are bounded by DISTINCT hashes per side (popular
    images collapse first, the l9f rule)."""
    if max_hamming > 7:
        raise ValueError("band8 is pigeonhole-complete only for max_hamming <= 7")
    from ipydataclean_spark.operators.media_codecs import (
        attach_patterned_payloads,
        band8,
        image_dhash,
    )

    delta_hashes = image_dhash(attach_patterned_payloads(delta_docs))
    probe_bands = band8(delta_hashes.select("dhash").distinct(), "dhash")
    store_bands = band8(
        store_df.select(F.col("dhash").alias("__sh")).distinct(), "__sh"
    )
    matched = (
        probe_bands.join(store_bands, ["band", "key"])
        .select(
            "dhash",
            F.bit_count(F.col("dhash").bitwiseXOR(F.col("__sh"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .groupBy("dhash")
        .agg(F.min("hamming").alias("__mh"))
    )
    return delta_hashes.join(matched, "dhash", "left").select(
        "doc_id",
        "dhash",
        F.coalesce(F.col("__mh"), F.lit(max_hamming + 1))
        .cast("int")
        .alias("min_hamming"),
        F.when(F.col("__mh").isNotNull(), F.lit("dup_of_history"))
        .otherwise(F.lit("novel"))
        .alias("status"),
    )


def store_hashes_under_cap(store_df: DataFrame) -> list[int] | None:
    """THE dispatch probe (one definition — round-11 self-review #6):
    one bounded job (distinct, then limit cap+1 — the cap is on
    DISTINCT hashes, so a re-crawl store with duplicate fingerprints
    but few distinct values stays on the cheap closure path, ADVICE
    r11 #4); returns the sorted distinct hashes when the store fits
    MEDIA_STORE_CAP, None when it doesn't. The distinct is a shuffle,
    but a bounded one — partial aggregation caps each map task's
    output at cap+1 rows. Reads the module attr at call time so tests
    can shrink the cap."""
    cap = MEDIA_STORE_CAP
    head = store_df.select("dhash").distinct().limit(cap + 1).collect()
    if len(head) <= cap:
        return sorted({int(r.dhash) for r in head})
    return None


def media_probe_auto(
    spark, delta_docs: DataFrame, store_df: DataFrame, *, max_hamming: int = 7
) -> DataFrame:
    """Dispatch the media probe on store size (the
    topk_per_row_exact_auto precedent — VERDICT r10 #1): a store
    within MEDIA_STORE_CAP rides the kernel closure
    (``media_probe_rows``, one bounded collect); past the cap the
    persisted table feeds the banded join (``media_probe_banded``) —
    no driver collect, no hard stop. The two strategies emit
    bit-identical rows (clamped min_hamming), pinned in
    tests/test_media_handoff.py with a monkeypatched cap."""
    hashes = store_hashes_under_cap(store_df)
    if hashes is not None:
        return media_probe_rows(delta_docs, hashes, max_hamming=max_hamming)
    return media_probe_banded(delta_docs, store_df, max_hamming=max_hamming)


def media_report(rows: DataFrame) -> DataFrame:
    """The per-status ingest report over media probe rows —
    all-integer columns, order-independent, so batch, replay, and
    both probe strategies agree exactly."""
    return rows.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_images"),
        F.sum("min_hamming").cast("long").alias("sum_min_hamming"),
        F.min("min_hamming").alias("min_min_hamming"),
        F.max("min_hamming").alias("max_min_hamming"),
    )


def media_ingest_agg(delta_docs: DataFrame, store_hashes: list[int]) -> DataFrame:
    """ST17: the media dedup probe as a STREAM stage — per-image
    fingerprint + store distance inside the kernel, then ONE stateful
    aggregation: the per-status ingest report (all-integer columns,
    order-independent, so batch and replay agree exactly). Complete
    output mode: a running ingest-composition total. Identical
    builder for the batch twin (the §2.8 contract)."""
    return media_report(media_probe_rows(delta_docs, store_hashes))


def run_media_ingest_banded(
    spark,
    stream_docs: DataFrame,
    store_path: str,
    rows_path: str,
    checkpoint_dir: str,
) -> DataFrame:
    """ST17 past MEDIA_STORE_CAP: drain the documents stream through
    the BANDED probe via foreachBatch — inside foreachBatch each
    micro-batch is a batch plan, so the banded join's two shuffles
    (band join + per-hash min) are legal where the single-stateful-op
    stream plan could not chain them. Probe rows land PARTITIONED on
    the batch id with dynamic partition overwrite (the st12
    idempotence rule: an at-least-once replay of a partially
    committed batch converges to the same files), and the returned
    report aggregates the sink — equal to the batch twin's report
    because the probe rows themselves are bit-identical per doc.
    The store stays a parquet TABLE end-to-end: executors stream it
    through the join; the driver never holds a fingerprint."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        rows = media_probe_banded(
            batch_df, batch_df.sparkSession.read.parquet(store_path)
        )
        (
            rows.withColumn("b", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("b")
            .parquet(rows_path)
        )

    q = (
        stream_docs.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    # NO timeout: availableNow terminates on its own, and returning
    # early would aggregate a durable sink mid-commit — a silently
    # partial report (round-11 self-review #5)
    q.awaitTermination()
    return media_report(spark.read.parquet(rows_path).drop("b"))


def media_ingest_stream_auto(
    spark,
    stream_docs: DataFrame,
    store_path: str,
    *,
    checkpoint_dir: str,
    rows_path: str,
    query_name: str = "t_media_auto",
) -> DataFrame:
    """The STREAMING auto dispatch (st17's scale handoff): store
    within the cap -> the closure-probe stream plan (one stateful
    agg, complete-mode memory sink); past the cap -> the foreachBatch
    banded runner. Both return the drained per-status report, equal
    to the batch twin's in either mode. Dispatch shares
    ``store_hashes_under_cap`` with ``media_probe_auto`` so the batch
    and streaming legs can never disagree at the same store size."""
    hashes = store_hashes_under_cap(spark.read.parquet(store_path))
    if hashes is not None:
        agg = media_ingest_agg(stream_docs, hashes)
        return run_available_now(agg, query_name, checkpoint_dir)
    return run_media_ingest_banded(
        spark, stream_docs, store_path, rows_path, checkpoint_dir
    )


def quality_filter_agg(docs: DataFrame, wlist: list) -> DataFrame:
    """ST13: the trained quality filter as a STREAMING stage. The
    model ships as a DENSE 1024-double literal array (index = feature
    bucket — the deployed form of l47's weight table: a model is plan
    metadata, not data), so each document is scored by a PER-ROW fold:
    tokenize → unigram+bigram features → bucket hash → DECIMAL
    accumulate of round-12 weights → round-8 score. No join, no
    per-doc aggregation — which is what makes the per-language keep
    report the query's ONLY stateful operator (structured streaming
    forbids chained aggregations; the naive score-agg-then-report-agg
    form is not runnable on a stream). Complete output mode: the
    report is a running corpus-composition total, not a time window.
    Identical builder for the batch twin (the §2.8 contract).

    Precondition: text must be non-NULL (the d19 documentation rule —
    a NULL text scores NULL here and still counts in n_docs, while
    the SQL twin's unnest drops the doc entirely; not reachable on
    the fixture, where the empty STRING is safe in both engines)."""
    from ipydataclean_spark.operators.llm_quality import (
        L47_V,
        clean_feature_array,
    )

    if len(wlist) != L47_V:
        raise ValueError(f"quality_filter_agg: model must be dense over {L47_V} buckets")
    # ONE array Literal, not 1024 Literal children — a CreateArray
    # node this wide is the measured l3b janino codegen cliff
    # (bloom_bits_df documents the same rule; review r09)
    warr = F.lit([float(w) for w in wlist])
    idx = F.transform(
        clean_feature_array(F.col("__toks")),
        lambda x: exact.md5_prefix_int(F.concat(F.lit("l47f:"), x))
        % F.lit(L47_V),
    )
    # DECIMAL(28,12) accumulator: Spark's decimal-addition rule keeps
    # scale 12 at precision <= 38 only when the operands' integral
    # part is narrow enough (38,12 + 38,12 silently drops to scale 11
    # and truncates the 12th digit); weights are |w| < 10 and docs
    # have < 10^3 features, so (28,12) arithmetic is exact and the
    # recast per step is lossless
    dec = "decimal(28,12)"
    # raw double out of the exact decimal fold — a final ROUND(...,8)
    # is the l49 boundary class: an exact 12-dp sum can sit on a true
    # 8-dp half where the engines' ROUND disagree (review r09)
    score = F.aggregate(
        idx,
        F.lit(0).cast(dec),
        lambda acc, i: (
            acc + F.element_at(warr, (i + 1).cast("int")).cast(dec)
        ).cast(dec),
    ).cast("double")
    from ipydataclean_spark.operators.llm import tokens_col

    scored = docs.withColumn("__toks", tokens_col("text")).select(
        "lang", score.alias("score")
    )
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("score") > 0).alias("n_kept"),
        (exact.rsum12("score") / F.count(F.lit(1)).cast("double")).alias(
            "mean_score"
        ),
    )


def embeddings_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 for the embeddings table (schema from one batch footer read,
    the events_stream rule)."""
    return _table_stream(spark, sf_dir, "embeddings")


def embedding_ingest_agg(delta: DataFrame, store: DataFrame) -> DataFrame:
    """ST15: incremental embedding classification as a STREAM stage —
    each arriving vector's best match against the PERSISTED store
    (stream-side mapInPandas kernel; the store rides the closure, the
    inc7 state), then ONE stateful aggregation: the per-status ingest
    report. The kernel's top-1 is computed per row INSIDE the batch
    (local numpy, not a Spark aggregation), which is what keeps the
    report the query's only stateful operator — the inc7 form
    (groupBy per vector, then report) would be an illegal chained
    aggregation on a stream (the st13 lesson). Complete output mode:
    the report is a running ingest-composition total.

    Identical builder for the batch twin (the §2.8 contract); decimal
    best-cos sums make the report order-independent and hash-exact."""
    from ipydataclean_spark.functions.knn import topk_per_row_exact
    from ipydataclean_spark.operators.llm import SIM_TAU

    best = topk_per_row_exact(
        delta.select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb")),
        store.select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb")),
        1,
    )
    status = (
        F.when(F.col("cos_sim") >= SIM_TAU, F.lit("dup_of_history"))
        .otherwise(F.lit("novel"))
        .alias("status")
    )
    return (
        best.select(status, "cos_sim")
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.sum(F.round("cos_sim", 12).cast(exact.DEC12))
            .cast("double")
            .alias("sum_best_cos"),
        )
    )
