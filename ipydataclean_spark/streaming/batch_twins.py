"""Streaming operators, batch twins — SURVEY.md §2.8 contract.

Every streaming op has a batch-mode twin (same transformation over the
static events table); the twin is what the DuckDB oracle checks, and
streaming mode is verified by ``availableNow`` replay equality against
the twin (tests/test_streaming.py, via streaming/stream.py).

Window-start arithmetic is epoch-based (floor to the window stride) so
Spark's ``F.window`` semantics are reproduced exactly in ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register

_TUMBLE_ORACLE_BUCKET = "CAST(to_timestamp(FLOOR(EPOCH(ts) / 600) * 600) AS TIMESTAMP)"


@register(
    "st1_tumbling_window",
    oracle=(
        f"SELECT {_TUMBLE_ORACLE_BUCKET} AS window_start, event_type, "
        "COUNT(*) AS n_events, "
        f"{exact.dsum_sql('value')} AS total_value "
        "FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"
    ),
    tags=("ST1",),
)
def st1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1: 10-minute tumbling window aggregate. Streaming form swaps
    the source for readStream + withWatermark — identical expression."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), exact.dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
        .orderBy("window_start", "event_type")
    )


@register(
    "st2_sliding_window",
    oracle=(
        "WITH starts AS (SELECT event_id, value, "
        "UNNEST([FLOOR(EPOCH(ts) / 300) * 300, FLOOR(EPOCH(ts) / 300) * 300 - 300]) AS s "
        "FROM events) "
        "SELECT CAST(to_timestamp(s) AS TIMESTAMP) AS window_start, "
        "COUNT(*) AS n_events, "
        f"{exact.dsum_sql('value')} AS total_value "
        "FROM starts GROUP BY s ORDER BY window_start"
    ),
    tags=("ST2",),
)
def st2_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST2: 10-minute window sliding every 5 minutes (each event lands
    in 2 windows — F.window handles the expansion)."""
    ev = T(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), exact.dsum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


_GAP_S = 4 * 3600  # 4-hour session gap


@register(
    "st3_session_window",
    oracle=(
        "WITH marked AS (SELECT user_id, ts, value, "
        "CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL "
        f"OR EPOCH(ts) - EPOCH(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)) > {_GAP_S} "
        "THEN 1 ELSE 0 END AS new_session FROM events), "
        "sessions AS (SELECT user_id, ts, value, "
        "CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id FROM marked) "
        "SELECT user_id, session_id, COUNT(*) AS n_events, "
        "MIN(ts) AS session_start, MAX(ts) AS session_end, "
        f"{exact.dsum_sql('value')} AS session_value "
        "FROM sessions GROUP BY user_id, session_id ORDER BY user_id, session_id"
    ),
    tags=("ST3",),
)
def st3_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST3 batch twin: gap-based sessionization (lag + running sum —
    shuffles once on user_id). Streaming form uses F.session_window;
    replay equality is asserted in tests."""
    ev = T(spark, sf_dir, "events")
    wo = Window.partitionBy("user_id").orderBy("ts")
    prev_ts = F.lag("ts").over(wo)
    new_session = (
        prev_ts.isNull() | (F.unix_timestamp("ts") - F.unix_timestamp(prev_ts) > _GAP_S)
    ).cast("long")
    run = Window.partitionBy("user_id").orderBy("ts").rowsBetween(Window.unboundedPreceding, 0)
    return (
        ev.withColumn("session_id", F.sum(new_session).over(run))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            exact.dsum("value").alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "st5_dedup_twin",
    oracle=(
        "SELECT COUNT(*) AS n_raw, CAST(COUNT(DISTINCT event_id) AS BIGINT) AS n_deduped "
        "FROM (SELECT event_id FROM events UNION ALL SELECT event_id FROM events WHERE event_id % 11 = 0)"
    ),
    tags=("ST5",),
)
def st5_dedup_twin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 batch twin of streaming dropDuplicates: re-inject every 11th
    event as a duplicate, dedup on event_id."""
    ev = T(spark, sf_dir, "events").select("event_id")
    dup = ev.where(F.col("event_id") % 11 == 0)
    both = ev.unionByName(dup)
    return both.agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.countDistinct("event_id").alias("n_deduped"),
    )


@register(
    "st7_stream_static_join",
    oracle=(
        "WITH dim AS (SELECT * FROM (VALUES ('click', 1.0), ('view', 0.5), ('purchase', 10.0), "
        "('signup', 5.0), ('error', 0.0)) AS t(event_type, weight)) "
        "SELECT e.event_type, COUNT(*) AS n, "
        f"{exact.dsum_sql('e.value * d.weight')} AS weighted_value "
        "FROM events e JOIN dim d ON e.event_type = d.event_type "
        "GROUP BY e.event_type ORDER BY e.event_type"
    ),
    tags=("ST7",),
)
def st7_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7 batch twin: events ⋈ broadcast static dim (identical plan in
    streaming mode — stream-static joins need no watermark)."""
    ev = T(spark, sf_dir, "events")
    dim = spark.createDataFrame(
        [("click", 1.0), ("view", 0.5), ("purchase", 10.0), ("signup", 5.0), ("error", 0.0)],
        ["event_type", "weight"],
    )
    return (
        ev.join(F.broadcast(dim), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            exact.dsum(F.col("value") * F.col("weight")).alias("weighted_value"),
        )
        .orderBy("event_type")
    )


@register(
    "st8_purchase_click_join",
    oracle=(
        "SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id AS p_user "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "JOIN (SELECT * FROM events WHERE event_type = 'click') c "
        "ON c.user_id = p.user_id AND c.ts < p.ts "
        "AND c.ts >= p.ts - INTERVAL 10 MINUTE "
        "ORDER BY p_id, c_id"
    ),
    tags=("ST8",),
)
def st8_purchase_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST8 batch twin: clicks within 10 minutes before each purchase,
    per user — the SAME function body as the streaming stream-stream
    join (stream.purchase_click_join; watermarks apply only on
    streaming input). Driver-hashable surface for the join logic the
    availableNow replay test pins in streaming mode; one user_id-keyed
    shuffle join with the time-range predicate evaluated on the
    co-located pairs."""
    from ipydataclean_spark.streaming.stream import purchase_click_join

    return purchase_click_join(T(spark, sf_dir, "events")).orderBy("p_id", "c_id")


@register(
    "st8b_purchase_click_outer",
    oracle=(
        "SELECT p.event_id AS p_id, c.event_id AS c_id, p.user_id AS p_user, p.ts AS p_ts "
        "FROM (SELECT * FROM events WHERE event_type = 'purchase') p "
        "LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c "
        "ON c.user_id = p.user_id AND c.ts < p.ts "
        "AND c.ts >= p.ts - INTERVAL 10 MINUTE "
        "ORDER BY p_id, c_id"
    ),
    tags=("ST8",),
)
def st8b_purchase_click_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST8b batch twin: LEFT OUTER purchase⋈click — every purchase with
    its preceding clicks or a NULL pad (stream.purchase_click_join_outer
    body; watermark-closed outer emission is the streaming-only part,
    pinned by the replay test)."""
    from ipydataclean_spark.streaming.stream import purchase_click_join_outer

    return purchase_click_join_outer(T(spark, sf_dir, "events")).orderBy("p_id", "c_id")


@register(
    "st10_chained_rollup",
    oracle=(
        "WITH hourly AS (SELECT "
        "CAST(to_timestamp(FLOOR(EPOCH(ts) / 3600) * 3600) AS TIMESTAMP) AS h, "
        "event_type, COUNT(*) AS n_events, "
        f"{exact.dsum_sql('value')} AS hour_value "
        "FROM events GROUP BY 1, 2) "
        "SELECT CAST(to_timestamp(FLOOR(EPOCH(h) / 86400) * 86400) AS TIMESTAMP) "
        "AS day_start, event_type, COUNT(*) AS n_active_hours, "
        "CAST(SUM(n_events) AS BIGINT) AS n_events, "
        f"{exact.dsum_sql('hour_value')} AS total_value "
        "FROM hourly GROUP BY 1, 2 ORDER BY day_start, event_type"
    ),
    tags=("ST10", "ST1"),
)
def st10_chained_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST10 batch twin: hourly→daily two-tier rollup (identical
    expression to streaming/stream.chained_rollup, which runs the same
    plan as two chained stateful operators via window_time; replay
    equality pinned in tests/test_streaming.py). Decimal partials make
    the tiered daily totals equal a direct daily aggregation exactly."""
    from ipydataclean_spark.streaming.stream import chained_rollup

    return chained_rollup(T(spark, sf_dir, "events")).orderBy(
        "day_start", "event_type"
    )


@register(
    "st11_abandoned_carts",
    oracle=(
        "WITH cp AS (SELECT user_id, ts, event_id, event_type FROM events "
        "WHERE event_type IN ('click', 'purchase')), "
        "nxt AS (SELECT user_id, ts, event_id, event_type, "
        "LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts "
        "FROM cp) "
        "SELECT user_id, ts AS abandoned_click_ts, event_id AS click_id "
        "FROM nxt WHERE event_type = 'click' "
        "AND (next_ts IS NULL OR next_ts > ts + INTERVAL 30 MINUTE) "
        "ORDER BY user_id, abandoned_click_ts"
    ),
    tags=("ST11", "ST6", "W2"),
)
def st11_abandoned_carts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST11 batch twin of streaming/stream.abandoned_cart_stream: a
    click is an abandoned cart iff the user's next click-or-purchase
    is > 30 minutes later or never comes (a later click supersedes, a
    purchase completes). Batch form: one LEAD over the user-keyed
    click/purchase subset. The streaming form decides the same rows
    with O(users) state + event-time timers; replay equality pinned in
    tests/test_streaming.py."""
    ev = T(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        "user_id", "ts", "event_id", "event_type",
        F.lead("ts").over(w).alias("next_ts"),
    )
    return (
        nxt.where(
            (F.col("event_type") == "click")
            & (
                F.col("next_ts").isNull()
                | (F.col("next_ts") > F.col("ts") + F.expr("INTERVAL 30 MINUTE"))
            )
        )
        .select(
            "user_id",
            F.col("ts").alias("abandoned_click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .orderBy("user_id", "abandoned_click_ts")
    )


from ipydataclean_spark.functions.text import norm_text_sql
from ipydataclean_spark.operators.qhelp import with_documents_dup

_ST12_ORACLE = with_documents_dup(
    ", dd AS (SELECT doc_id, SHA256(" + norm_text_sql("text")
    + ") AS dg FROM documents_dup WHERE text IS NOT NULL), "
        "hist AS (SELECT dg, MIN(doc_id) AS hid FROM dd "
        "WHERE doc_id < 400 GROUP BY dg), "
        "delta AS (SELECT doc_id, dg, CAST((doc_id % 7) % 3 AS INT) AS b "
        "FROM dd WHERE doc_id >= 400), "
        "w AS (SELECT doc_id, dg, b, "
        "FIRST_VALUE(doc_id) OVER (PARTITION BY dg ORDER BY b, doc_id) AS first_id, "
        "FIRST_VALUE(b) OVER (PARTITION BY dg ORDER BY b, doc_id) AS first_b "
        "FROM delta) "
        "SELECT w.doc_id, "
        "CASE WHEN h.hid IS NOT NULL THEN 'dup_of_history' "
        "WHEN w.first_b < w.b THEN 'dup_of_prior_batch' "
        "WHEN w.first_id < w.doc_id THEN 'dup_in_batch' "
        "ELSE 'novel' END AS status, "
        "CASE WHEN h.hid IS NOT NULL THEN h.hid "
        "WHEN w.first_b < w.b OR w.first_id < w.doc_id THEN w.first_id "
        "ELSE w.doc_id END AS canonical_id "
        "FROM w LEFT JOIN hist h ON w.dg = h.dg ORDER BY w.doc_id"
)


@register(
    "st12_dedup_ingest",
    oracle=_ST12_ORACLE,
    tags=("ST12", "INC2", "L1", "streaming"),
)
def st12_dedup_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST12: streaming dedup ingest with EVOLVING state, executed for
    real — documents arrive as three logical batches (b = doc_id mod
    7 mod 3: a spread that lands some copies in the SAME batch as
    their original and some in LATER ones, so every dedup regime
    occurs; one parquet file each, maxFilesPerTrigger=1), each micro-batch
    is classified against the digest state and novel docs JOIN the
    state for later batches (streaming/stream.py dedup_ingest_stream).
    The oracle replays the whole evolving-state run as ONE window over
    (b, doc_id) — a driver hash match certifies that incremental
    state evolution computes exactly the batch answer, the §2.8
    replay-equality contract extended to a STATE-MUTATING pipeline
    (st1-st11 are all stateless reductions of a static input).

    dup_of_history → canonical is the historical min-id holder;
    dup_of_prior_batch → the novel doc from the earlier batch;
    dup_in_batch → the batch's min id; novel otherwise."""
    import pathlib

    from ipydataclean_spark.functions.text import norm_text_col
    from ipydataclean_spark.operators.qhelp import documents_dup, scratch_dir
    from ipydataclean_spark.streaming.stream import dedup_ingest_stream

    root = pathlib.Path(scratch_dir(spark, "st12"))
    in_dir, state_dir = root / "in", root / "state"
    out_dir, ckpt = root / "out", root / "ckpt"
    in_dir.mkdir(parents=True, exist_ok=True)

    dd = (
        documents_dup(spark, sf_dir)
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.sha2(norm_text_col("text"), 256).alias("dg"),
            ((F.col("doc_id") % 7) % 3).cast("int").alias("b"),
        )
    )
    # seed state = history digests (canonical = min doc_id, src_batch -1)
    (
        dd.where(F.col("doc_id") < 400)
        .groupBy("dg")
        .agg(F.min("doc_id").alias("canonical_id"))
        .select("dg", "canonical_id", F.lit(-1).cast("int").alias("src_batch"))
        .write.mode("overwrite")
        .partitionBy("src_batch")
        .parquet(str(state_dir))
    )
    # one source file per logical batch, mtimes ascending so the file
    # source lists them oldest-first (the kernel is order-independent
    # anyway — the b column drives sub-batch order)
    import os
    import shutil as _sh

    delta = dd.where(F.col("doc_id") >= 400)
    for bv in (0, 1, 2):
        tmp = root / f"tmp_b{bv}"
        delta.where(F.col("b") == bv).coalesce(1).write.mode("overwrite").parquet(str(tmp))
        part = next(p for p in tmp.iterdir() if p.name.endswith(".parquet"))
        dst = in_dir / f"b{bv}.parquet"
        _sh.move(str(part), str(dst))
        _sh.rmtree(tmp, ignore_errors=True)
        os.utime(dst, (1_000_000 + bv, 1_000_000 + bv))

    stream = (
        spark.readStream.schema("doc_id BIGINT, dg STRING, b INT")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(in_dir))
    )
    q = dedup_ingest_stream(stream, str(state_dir), str(out_dir), str(ckpt))
    finished = q.awaitTermination(180)
    if not finished:
        # fail loudly rather than hash-compare a half-written output
        # (round-5 review finding); stop() so the writer can't keep
        # appending into scratch during later queries
        q.stop()
        raise RuntimeError("st12: stream did not drain within 180 s")
    return (
        spark.read.parquet(str(out_dir))
        .select("doc_id", "status", "canonical_id")
        .orderBy("doc_id")
    )


def _st13_oracle() -> str:
    from ipydataclean_spark.operators.llm_quality import (
        _L47_CTES,
        _l47_clean_feat_sql,
    )

    return (
        "WITH " + _L47_CTES + ", "
        + _l47_clean_feat_sql("documents", "s")
        + ", scored AS (SELECT sfeats.doc_id, ("
        + exact.rsum12_sql("w")
        + ") AS score FROM sfeats JOIN w ON sfeats.f = w.f "
        "GROUP BY sfeats.doc_id) "
        "SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(COUNT_IF(score > 0) AS BIGINT) AS n_kept, "
        "(" + exact.rsum12_sql("score") + " / CAST(COUNT(*) AS DOUBLE)) "
        "AS mean_score "
        "FROM scored JOIN documents d ON d.doc_id = scored.doc_id "
        "GROUP BY d.lang ORDER BY d.lang"
    )


@register(
    "st13_quality_filter",
    oracle=_st13_oracle(),
    tags=("ST13", "ST7", "L47", "streaming", "quality"),
)
def st13_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST13 batch twin: the trained quality filter as a stream stage —
    per-row fold scoring against the l47 model shipped as a dense
    1024-double literal array, one per-language keep aggregation (the
    query's only stateful operator; chained per-doc-then-per-lang aggs
    would be illegal on a stream). The builder
    (stream.quality_filter_agg) is shared verbatim with the streaming
    form; tests/test_streaming.py replays the documents stream with
    availableNow + complete mode and asserts equality with this twin.

    The oracle certifies the whole chain — training, per-row decimal
    fold (associative-exact, so fold order vs the oracle's grouped
    DECIMAL sum cannot diverge), keep policy, per-lang report."""
    from ipydataclean_spark.operators.llm_quality import l47_weights
    from ipydataclean_spark.streaming.stream import quality_filter_agg

    _, w = l47_weights(spark, sf_dir)
    wlist = [r.w for r in w.orderBy("f").collect()]
    docs = T(spark, sf_dir, "documents")
    return quality_filter_agg(docs, wlist).orderBy("lang")


def _st14_oracle() -> str:
    from ipydataclean_spark.operators.curation import (
        _BLOOM_K,
        ST14_BENCH_PRED,
        _bloom_pos_sql,
    )
    from ipydataclean_spark.operators.llm import shingles_sql

    pos_cols = ", ".join(
        f"{_bloom_pos_sql('g', j)} AS p{j}" for j in range(_BLOOM_K)
    )
    set_union = " UNION ".join(
        f"SELECT DISTINCT {_bloom_pos_sql('g', j)} AS p FROM bench"
        for j in range(_BLOOM_K)
    )
    joins = " ".join(
        f"LEFT JOIN setpos s{j} ON s{j}.p = pos.p{j}" for j in range(_BLOOM_K)
    )
    hit = " AND ".join(f"s{j}.p IS NOT NULL" for j in range(_BLOOM_K))
    return (
        "WITH bench AS MATERIALIZED (SELECT DISTINCT unnest("
        + shingles_sql("text", n=8)
        + f") AS g FROM documents WHERE {ST14_BENCH_PRED}), "
        f"setpos AS MATERIALIZED ({set_union}), "
        "corp AS (SELECT doc_id, unnest("
        + shingles_sql("text", n=8)
        + f") AS g FROM documents WHERE NOT ({ST14_BENCH_PRED})), "
        f"pos AS (SELECT doc_id, g, {pos_cols} FROM corp), "
        f"hits AS (SELECT pos.doc_id, ({hit}) AS bloom_hit FROM pos {joins}), "
        "hagg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS ng, "
        "CAST(COUNT_IF(bloom_hit) AS BIGINT) AS nh FROM hits GROUP BY doc_id) "
        # LEFT JOIN keeps gram-less docs (< 8 tokens) in n_docs, the
        # builder's per-row semantics (empty gram array, zero hits)
        "SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(COUNT_IF(COALESCE(nh, 0) > 0) AS BIGINT) AS n_flagged, "
        "CAST(SUM(COALESCE(ng, 0)) AS BIGINT) AS n_grams, "
        "CAST(SUM(COALESCE(nh, 0)) AS BIGINT) AS n_bloom_hits "
        "FROM documents d LEFT JOIN hagg ON hagg.doc_id = d.doc_id "
        # qualify the shared pred's doc_id against the join ambiguity
        f"WHERE NOT (d.{ST14_BENCH_PRED}) "
        "GROUP BY d.source ORDER BY d.source"
    )


@register(
    "st14_bloom_decontaminate",
    oracle=_st14_oracle(),
    tags=("ST14", "L44", "INC5", "streaming", "scale"),
)
def st14_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST14 batch twin: benchmark decontamination ON THE INGEST STREAM
    — the static benchmark suite folds into the 8 KB bloom bitset
    batch-side once; the (streamed) corpus probes it via a one-row
    stream-static broadcast and per-row array expressions, and the
    per-source contamination report is the only stateful operator.
    Closes the decontamination triple: l44 (batch), inc5 (incremental
    bitset maintenance), st14 (streaming probe) — one bitset
    semantics, certified in each execution mode (the oracle replays
    the position-join form, false positives and all, grouped by
    source). tests/test_streaming.py replays the documents stream
    with availableNow + complete mode and asserts equality."""
    from ipydataclean_spark.operators.curation import (
        ST14_BENCH_PRED,
        bloom_bits_df,
        bloom_decontaminate_agg,
        st14_bench_positions,
    )

    bits = bloom_bits_df(spark, st14_bench_positions(spark, sf_dir))
    corpus = T(spark, sf_dir, "documents").where(f"NOT ({ST14_BENCH_PRED})")
    return bloom_decontaminate_agg(corpus, bits).orderBy("source")


def _st15_oracle() -> str:
    from ipydataclean_spark.operators.incremental import inc7_pair_ctes
    from ipydataclean_spark.operators.llm import SIM_TAU

    return (
        inc7_pair_ctes()
        + ", b AS (SELECT vec_id, cos_sim, "
        f"CASE WHEN cos_sim >= {SIM_TAU} THEN 'dup_of_history' "
        "ELSE 'novel' END AS status FROM p WHERE rn = 1) "
        "SELECT status, CAST(COUNT(*) AS BIGINT) AS n_vectors, "
        "CAST(SUM(CAST(ROUND(cos_sim, 12) AS DECIMAL(38,12))) AS DOUBLE) "
        "AS sum_best_cos "
        "FROM b GROUP BY status ORDER BY status"
    )


@register(
    "st15_embedding_ingest",
    oracle=_st15_oracle(),
    tags=("ST15", "INC7", "D23", "L4", "embeddings", "streaming"),
)
def st15_embedding_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST15 batch twin: incremental embedding classification ON THE
    INGEST STREAM — each arriving vector scored against the persisted
    history store via the kernel (per-row local top-1, stream-legal),
    rolled into the per-status ingest report. Closes the embedding
    family's execution-mode triple the way st14 closed
    decontamination's: d22/d23/l64 (batch), inc7 (incremental, stored
    state), st15 (streaming probe) — one store semantics, certified
    in each mode. tests/test_streaming.py replays the embeddings
    stream with availableNow + complete mode and asserts equality."""
    from ipydataclean_spark.operators.incremental import _INC7_DELTA, _INC7_HIST
    from ipydataclean_spark.streaming.stream import embedding_ingest_agg

    emb = T(spark, sf_dir, "embeddings")
    store = emb.where(F.expr(_INC7_HIST))
    delta = emb.where(F.expr(_INC7_DELTA))
    return embedding_ingest_agg(delta, store).orderBy("status")


from ipydataclean_spark.operators.cleaning import _C39_ORACLE  # noqa: E402


@register(
    "st16_streaming_ewma",
    # c39's oracle REUSED (one fold definition; cleaning registers
    # before batch_twins in _OPERATOR_MODULES, so the import is safe)
    oracle=_C39_ORACLE,
    tags=("ST16", "C39", "D9", "streaming", "timeseries"),
)
def st16_streaming_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST16 batch twin: per-user exponential smoothing ON THE EVENT
    STREAM — the c39 level/residual table maintained as a running
    complete-mode aggregate (the ordered value collection is the
    query's only stateful operator; the sequential fold is a
    post-aggregation projection, stream-legal). The streaming form of
    the d9 anomaly residual: |last − ewma| per user, live.
    tests/test_streaming.py replays the events stream with
    availableNow + complete mode and asserts equality."""
    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.operators.cleaning import ewma_agg

    return ewma_agg(load_table(spark, sf_dir, "events")).orderBy("user_id")


#: the st17/inc8 delta slice: the full history slice (known dups —
#: every history image re-arrives, the re-crawl condition) plus a
#: disjoint novel slice
_ST17_DELTA = "(doc_id % 10 = 0) OR (doc_id % 10 = 6)"


@register(
    "st17_media_ingest",
    oracle=None,  # payload bytes are invisible to SQL; replay + pins
    tags=("ST17", "L9", "L2", "multimodal", "dedup", "streaming"),
)
def st17_media_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST17 batch twin: media dedup ON THE INGEST STREAM — each
    arriving image fingerprinted (decode + dHash) and distanced
    against the persisted fingerprint store inside the kernel (the
    st15 per-row pattern, which keeps the per-status report the
    query's only stateful operator), rolled into the running ingest
    report. Closes the MEDIA family's execution-mode triple the way
    st15 closed embeddings': l9f/l9p (batch pairs), inc8
    (incremental, stored state), st17 (streaming probe) — one store
    definition (the doc_id % 10 == 0 fingerprint slice), certified
    consistent in each mode. The delta replays the full history slice
    (every re-crawled image must classify dup at hamming 0) plus a
    disjoint novel slice. The probe dispatches on store size
    (stream.media_probe_auto, VERDICT r10 #1): within MEDIA_STORE_CAP
    the store rides the kernel closure; past it the persisted
    fingerprint table feeds the banded join — bit-identical rows
    either way, so this twin runs at ANY store size instead of
    raising. Rows-only by design (SQL cannot see pixels);
    tests/test_streaming.py replays the documents stream with
    availableNow + complete mode and asserts equality with this twin,
    and pins both statuses present; tests/test_media_handoff.py pins
    the cross-strategy equality."""
    from ipydataclean_spark.operators.media_codecs import (
        attach_patterned_payloads,
        image_dhash,
    )
    from ipydataclean_spark.operators.qhelp import scratch_dir
    from ipydataclean_spark.streaming.stream import (
        media_probe_auto,
        media_report,
    )

    docs = T(spark, sf_dir, "documents")
    store_path = scratch_dir(spark, "st17_store")
    image_dhash(
        attach_patterned_payloads(docs.where(F.col("doc_id") % 10 == 0))
    ).write.mode("overwrite").parquet(store_path)
    delta = docs.where(F.expr(_ST17_DELTA))
    rows = media_probe_auto(
        spark, delta.select("doc_id"), spark.read.parquet(store_path)
    )
    return media_report(rows).orderBy("status")


from ipydataclean_spark.operators.encoding_qa import _L72_CTE  # noqa: E402

_ST18_ORACLE = (
    # the SAME d-CTE as the l72 oracle (one definition in
    # encoding_qa.py): decoration + the three-way corruption coin
    # (0 = latin1, 1 = sloppy-cp1252, 2 = clean), aggregated
    _L72_CTE
    + "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(CASE WHEN coin3 < 2 AND doc_id % 2 = 0 THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_mojibake, "
    "CAST(SUM(CASE WHEN coin3 = 1 AND doc_id % 2 = 0 THEN 1 ELSE 0 END) "
    "AS BIGINT) AS n_cp1252, "
    # a mojibake text's length is the original's BYTE length under
    # EITHER single-byte read, so the repair removes strlen(dec) -
    # length(dec) chars; kept docs (including ASCII 'corruptions',
    # which are identity) remove 0
    "CAST(SUM(CASE WHEN coin3 < 2 AND doc_id % 2 = 0 "
    "THEN strlen(dec) - length(dec) ELSE 0 END) AS BIGINT) AS chars_repaired "
    "FROM d GROUP BY lang ORDER BY lang"
)


@register(
    "st18_encoding_qa",
    oracle=_ST18_ORACLE,
    tags=("ST18", "L72", "L7", "quality", "streaming"),
)
def st18_encoding_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST18 batch twin: encoding QA ON THE INGEST STREAM — every
    arriving document decorated/corrupted (the l72 fixture stage,
    now rotating latin1 AND sloppy-cp1252 damage) and
    mojibake-detected STATELESSLY (pure JVM projections), rolled into
    ONE per-language running report (the query's only stateful
    operator — the st13 rule). Completes l72's execution-mode pair:
    a crawl feed gets live per-language encoding-damage telemetry
    with the same certified detector the batch pass uses; n_cp1252
    crosses the detector flag with the fixture's cp1252 coin, so the
    hash certifies the new variant is caught per language. Full
    closed-form oracle (the l72 CTE, aggregated); the streaming
    replay (availableNow + complete mode) is asserted equal in
    tests/test_streaming.py."""
    from ipydataclean_spark.operators.encoding_qa import encoding_report

    docs = (
        T(spark, sf_dir, "documents")
        .where((F.col("doc_id") % 9 == 2) & F.col("text").isNotNull())
        .select("doc_id", "lang", "text")
    )
    return encoding_report(docs).orderBy("lang")
