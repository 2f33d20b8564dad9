"""Incremental maintenance patterns — recurring stats without rescans.

At 100 TB the profiling/aggregation cost model flips: the expensive
thing is not the aggregate but the SCAN. Recurring statistics must be
maintained from a small stored state table plus the day's delta, never
by re-reading the history. The public pattern (summary/aggregate
tables, Spark partial aggregation, Delta-style incremental rollups):

  1. store PARTIAL aggregates keyed by an append-aligned dimension
     (e.g. month) — counts and DECIMAL sums, both associative;
  2. each load computes the delta's partials (one scan of the delta
     only) and appends/overwrites the affected state partitions;
  3. any query over the state table re-aggregates partials — exact,
     because count/decimal-sum are mergeable (the same property Spark's
     map-side partial aggregation relies on inside one job).

``inc1_incremental_stats`` exercises the full loop (seed state, delta
partials, merged final equals the direct aggregate — oracle-checked);
``stream_merge_to_parquet`` wires the same idea to Structured Streaming
via foreachBatch + sources.merge_into_parquet (replay-tested in
tests/test_streaming.py).
"""

from __future__ import annotations

import pathlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.operators.qhelp import T, scratch_dir
from ipydataclean_spark.registry import register

_CUTOFF = "1997-01-01"


def _month_partials(df: DataFrame) -> DataFrame:
    """Mergeable per-(month, status) partials: BIGINT count + DECIMAL
    sum. The sum stays DECIMAL in the state table — casting to double
    before storage would make re-aggregation order-dependent."""
    return df.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        "o_orderstatus",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast(exact.DEC)).alias("s"),
    )


@register(
    "inc1_incremental_stats",
    oracle=(
        "SELECT o_orderstatus, COUNT(*) AS n_orders, "
        f"{exact.dsum_sql('o_totalprice')} AS total_price "
        "FROM orders GROUP BY 1 ORDER BY o_orderstatus"
    ),
    tags=("INC1", "P1", "R11"),
)
def inc1_incremental_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INC1: incremental statistics maintenance. Seeds a stored state
    table of per-month partial aggregates from the 'history' (orders
    before the cutoff), computes partials for the 'new load' (orders
    from the cutoff on) by scanning ONLY the delta, merges, and answers
    the global per-status stats from partials alone. The oracle is the
    direct aggregate over all of orders — equality proves the partials
    are lossless. State is month-keyed, so a real deployment overwrites
    only the delta's month partitions (the c18b dynamic-overwrite
    path)."""
    orders = T(spark, sf_dir, "orders").select(
        "o_orderdate", "o_orderstatus", "o_totalprice"
    )
    scratch = scratch_dir(spark, "inc1_state")
    history = orders.where(F.col("o_orderdate") < _CUTOFF)
    delta = orders.where(F.col("o_orderdate") >= _CUTOFF)
    _month_partials(history).write.mode("overwrite").parquet(scratch)
    state = spark.read.parquet(scratch)
    merged = state.unionByName(_month_partials(delta))
    return (
        merged.groupBy("o_orderstatus")
        .agg(
            F.sum("n").cast("long").alias("n_orders"),
            F.sum("s").cast("double").alias("total_price"),
        )
        .orderBy("o_orderstatus")
    )


def stream_merge_to_parquet(
    stream_df: DataFrame,
    path: str,
    key: str,
    part_expr,
    checkpoint_dir: str,
):
    """ST9/C18b composed: continuous incremental load — each micro-batch
    is MERGEd into a partitioned parquet target at the file level
    (partition-pruned read, dynamic-partition-overwrite write).
    ``part_expr`` derives the update-stable partition column from the
    batch (must be a function of ``key``). Returns the started query;
    caller awaits termination.

    foreachBatch gives exactly-once per epoch on the batch id, and
    merge-by-key makes replays idempotent — re-merging a batch the sink
    already has changes nothing, which is exactly the property a
    restart-safe 100 TB ingest needs."""
    def do_merge(batch: DataFrame, _epoch: int) -> None:
        from ipydataclean_spark.sources import merge_into_parquet

        spark = batch.sparkSession
        updates = batch.select(
            *[F.col(c).alias(f"u_{c}") for c in batch.columns],
            part_expr.alias("pk"),
        )
        merge_into_parquet(spark, path, updates, key=key, part="pk")

    return (
        stream_df.writeStream.foreachBatch(do_merge)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


@register(
    "inc2_incremental_dedup",
    oracle=(
        "WITH documents_dup AS (SELECT * FROM documents UNION ALL "
        "SELECT doc_id + 1000000 AS doc_id, '  ' || UPPER(text) || '  ' AS text, "
        "lang, source, n_chars FROM documents WHERE doc_id % 5 = 0), "
        "digests AS (SELECT doc_id, "
        "SHA256(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g')))) AS dg "
        "FROM documents_dup), "
        "hist AS (SELECT dg, MIN(doc_id) AS hist_id FROM digests "
        "WHERE doc_id < 400 GROUP BY dg), "
        "delta AS (SELECT doc_id, dg FROM digests WHERE doc_id >= 400), "
        "batch_min AS (SELECT dg, MIN(doc_id) AS first_id FROM delta GROUP BY dg) "
        "SELECT d.doc_id, "
        "CASE WHEN h.hist_id IS NOT NULL THEN 'dup_of_history' "
        "WHEN b.first_id < d.doc_id THEN 'dup_in_batch' "
        "ELSE 'novel' END AS status, "
        "CASE WHEN h.hist_id IS NOT NULL THEN h.hist_id "
        "WHEN b.first_id < d.doc_id THEN b.first_id "
        "ELSE d.doc_id END AS canonical_id "
        "FROM delta d LEFT JOIN hist h ON d.dg = h.dg "
        "JOIN batch_min b ON d.dg = b.dg "
        "ORDER BY d.doc_id"
    ),
    tags=("INC2", "L1", "C16"),
)
def inc2_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INC2: incremental exact dedup — the daily-ingest form of L1: the
    history is represented ONLY by its digest table (one 32-byte hash +
    canonical id per historical doc, the mergeable dedup state), and
    the day's delta is classified against it without ever rescanning
    historical text: novel / dup_of_history (with the historical
    canonical) / dup_in_batch (with the batch-first canonical).

    Plan: one delta scan computes digests; history lookup is a
    digest-keyed join against the state table (bucket the state table
    by digest at scale and the join co-locates); in-batch firsts are a
    map-side-combinable min per digest. History text is NEVER read —
    the scan-cost property that makes daily dedup affordable at 100 TB.
    The new state table is state ∪ novel digests (same shape),
    maintained exactly like inc1's partial-aggregate state."""
    from ipydataclean_spark.functions.text import norm_text_col
    from ipydataclean_spark.operators.qhelp import documents_dup

    dd = documents_dup(spark, sf_dir).withColumn(
        "dg", F.sha2(norm_text_col("text"), 256)
    )
    hist = (
        dd.where(F.col("doc_id") < 400)
        .groupBy("dg")
        .agg(F.min("doc_id").alias("hist_id"))
    )
    delta = dd.where(F.col("doc_id") >= 400).select("doc_id", "dg")
    batch_min = delta.groupBy("dg").agg(F.min("doc_id").alias("first_id"))
    status = (
        F.when(F.col("hist_id").isNotNull(), F.lit("dup_of_history"))
        .when(F.col("first_id") < F.col("doc_id"), F.lit("dup_in_batch"))
        .otherwise(F.lit("novel"))
    )
    canonical = (
        F.when(F.col("hist_id").isNotNull(), F.col("hist_id"))
        .when(F.col("first_id") < F.col("doc_id"), F.col("first_id"))
        .otherwise(F.col("doc_id"))
    )
    return (
        delta.join(hist, "dg", "left")
        .join(batch_min, "dg")
        .select("doc_id", status.alias("status"), canonical.alias("canonical_id"))
        .orderBy("doc_id")
    )


def maintain_sum_view(
    spark: SparkSession,
    source_root: str,
    view,
    group_col: str,
    val_col: str,
    key_col: str,
    checkpoint_dir: str,
):
    """INC3: EXACT incremental view maintenance from the change feed —
    a per-group running sum kept consistent with its source TxTable by
    consuming the ``txcdc`` stream instead of rescanning snapshots:
    inserts/update-postimages ADD, deletes/update-preimages SUBTRACT
    (both the group COUNT and the value sum — the count distinguishes
    an emptied group from one summing to zero), and because the
    per-batch delta is a DECIMAL sum (associative, order-independent),
    (view rows with n > 0 after N windows) == (direct aggregate of the
    Nth snapshot) EXACTLY — the classic delta-rule IVM (Blakeley et
    al.) on the lakehouse change feed. View schema:
    (group, n BIGINT, total DECIMAL).

    Scale shape: each micro-batch groups ONLY its window's change rows
    (file-bounded by the commits), joins the view's CURRENT rows for
    the touched groups, and MERGEs the adjusted groups back — work per
    window is O(changes + touched groups), never O(source) or O(view).
    Drain with availableNow on a schedule for a cheap near-real-time
    rollup table. Returns the StreamingQuery."""
    from ipydataclean_spark.sources.txlog import register_txcdc

    register_txcdc(spark)
    stream = (
        spark.readStream.format("txcdc")
        .option("path", source_root)
        .option("key", key_col)
        .option("startingVersion", 0)
        .load()
    )

    def apply(batch: DataFrame, _epoch: int) -> None:
        sign = (
            F.when(F.col("change_type").isin("insert", "update_postimage"), F.lit(1))
            .when(F.col("change_type").isin("delete", "update_preimage"), F.lit(-1))
        )
        delta = (
            batch.select(
                F.col(group_col),
                sign.alias("__s"),
                (sign * F.col(val_col)).cast("decimal(28,6)").alias("__d"),
            )
            .groupBy(group_col)
            .agg(
                F.sum("__s").cast("long").alias("__dn"),
                F.sum("__d").alias("__delta"),
            )
        )
        if not delta.head(1):
            return
        cur = view.read().join(delta.select(group_col), group_col, "left_semi")
        zero = F.lit(0).cast("decimal(28,6)")
        merged = (
            cur.join(delta, group_col, "full_outer")
            .select(
                group_col,
                (
                    F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0))
                ).cast("long").alias("n"),
                (
                    F.coalesce(F.col("total"), zero)
                    + F.coalesce(F.col("__delta"), zero)
                ).cast("decimal(28,6)").alias("total"),
            )
        )
        # groups whose membership reached zero keep an n=0 tombstone
        # row; the view read contract is .where("n > 0") (MERGE has no
        # row-delete — the tombstone is compacted away on rebuild)
        view.merge(merged, key=group_col)

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


@register(
    "inc3_incremental_join",
    oracle=(
        # the oracle computes the SAME delta a different way: full
        # join result MINUS the old-state join result — if the
        # incremental three-way union below is algebraically right,
        # the row sets (and hashes) agree
        "WITH o_old AS (SELECT * FROM orders WHERE o_orderdate < DATE '1997-01-01'), "
        "o_new AS (SELECT * FROM orders WHERE o_orderdate >= DATE '1997-01-01'), "
        "c_old AS (SELECT * FROM customer WHERE c_custkey % 10 <> 0), "
        "full_j AS (SELECT c_nationkey, o_totalprice FROM orders "
        "JOIN customer ON o_custkey = c_custkey), "
        "old_j AS (SELECT c_nationkey, o_totalprice FROM o_old "
        "JOIN c_old ON o_custkey = c_custkey), "
        # sums stay in DECIMAL through the subtraction; ONE cast to
        # DOUBLE on the exact difference, matching the Spark side's
        # decimal-sum-then-cast-once discipline (ADVICE r04: two
        # per-side casts can differ in the last ulp from
        # double(exact difference) and flip ROUND at a half-cent)
        "delta AS (SELECT c_nationkey, "
        "CAST(COUNT(*) AS BIGINT) AS n, "
        f"SUM(CAST(o_totalprice AS {exact.DEC_SQL})) AS s "
        "FROM full_j GROUP BY c_nationkey), "
        "prior AS (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n, "
        f"SUM(CAST(o_totalprice AS {exact.DEC_SQL})) AS s "
        "FROM old_j GROUP BY c_nationkey) "
        "SELECT delta.c_nationkey AS nationkey, "
        "CAST(delta.n - COALESCE(prior.n, 0) AS BIGINT) AS n_delta_rows, "
        f"ROUND(CAST(delta.s - COALESCE(prior.s, CAST(0 AS {exact.DEC_SQL})) AS DOUBLE), 2) AS delta_revenue "
        "FROM delta LEFT JOIN prior ON delta.c_nationkey = prior.c_nationkey "
        "WHERE delta.n - COALESCE(prior.n, 0) <> 0 "
        "ORDER BY nationkey"
    ),
    tags=("INC3", "R4", "incremental"),
)
def inc3_incremental_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INC3: incremental JOIN-view maintenance — the delta of a
    materialized join view J = O ⋈ C under simultaneous appends to
    both sides, computed WITHOUT re-joining the old state:

        ΔJ = ΔO ⋈ C_old  ∪  O_old ⋈ ΔC  ∪  ΔO ⋈ ΔC

    (the standard delta-rule of incremental view maintenance; each
    term scans one delta plus one base side, and at 100 TB the two
    base-side probes are key-pruned reads of the stored view's
    partitions, never full history scans). Here ΔO = orders from
    1997 on, ΔC = every custkey ≡ 0 (mod 10) — deterministic stand-ins
    for a day's appends. The result is ΔJ rolled up per nation.

    The ORACLE computes the identical delta the EXPENSIVE way —
    (O∪ΔO) ⋈ (C∪ΔC) minus O_old ⋈ C_old — so a hash match proves the
    three-way union IS the join delta, not just that both sides ran
    the same plan."""
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    o_old = o.where(F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
    o_new = o.where(F.col("o_orderdate") >= F.lit("1997-01-01").cast("date"))
    c_old = c.where(F.col("c_custkey") % 10 != 0)
    c_new = c.where(F.col("c_custkey") % 10 == 0)

    cols = [F.col("c_nationkey"), F.col("o_totalprice")]
    d1 = o_new.join(c_old, o_new.o_custkey == c_old.c_custkey).select(*cols)
    d2 = o_old.join(c_new, o_old.o_custkey == c_new.c_custkey).select(*cols)
    d3 = o_new.join(c_new, o_new.o_custkey == c_new.c_custkey).select(*cols)
    delta = d1.unionByName(d2).unionByName(d3)
    return (
        delta.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_delta_rows"),
            F.round(exact.dsum("o_totalprice"), 2).alias("delta_revenue"),
        )
        .orderBy("nationkey")
    )


@register("inc4_incremental_minhash", oracle=None, tags=("INC4", "L2", "D5", "incremental"))
def inc4_incremental_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INC4: incremental NEAR-dup dedup — the daily-ingest form of L2,
    completing the incremental family: inc2 classifies a delta against
    an exact-digest history; inc4 classifies it against the history's
    stored MinHash-LSH index, so near-copies of historical docs (not
    just byte-identical ones) are caught WITHOUT rescanning historical
    text. Output per delta doc: ``near_dup_of_history`` with the
    best-matching historical canonical (highest estimated Jaccard,
    ties to the lowest doc_id) or ``novel``.

    State = the history's (doc_id, band_id, band_hash, sig) table —
    exactly what a production run persists after each load (new novel
    docs' bands append to it, same shape). Here it is materialized to
    parquet and re-read so "history text is never rescanned" is
    literal, not notional: the classify plan's lineage starts at the
    stored index. Plan: one delta-text scan builds delta signatures
    (minhash_signatures: one explode + one groupBy); the probe is a
    band-keyed equi-join delta-bands ⋈ index — at 100 TB bucket the
    stored index by (band_id, band_hash) and the probe co-locates;
    per-bucket fanout is bounded the same way l2 bounds it (exact-dup
    collapse first via inc2, hot buckets far below cap on this
    fixture). Agreement estimate = fraction of equal signature slots
    (zip_with, codegen) — no token data moves through the join, only
    16-long sigs.

    Rows-only by design (MinHash is not SQL-expressible); golden
    tests pin: every injected copy of a HISTORY doc classifies as
    near_dup_of_history with its original as the match at est 1.0
    (normalization makes copies token-identical), and no delta doc
    maps to a history doc above threshold that exact Jaccard refutes
    (tests/test_llm_extra.py)."""
    from ipydataclean_spark.operators.llm import (
        _MINHASH_K,
        banded_signatures,
        minhash_signatures,
        sig_agreement,
    )
    from ipydataclean_spark.operators.qhelp import documents_dup, scratch_dir

    tau = 0.5
    dd = documents_dup(spark, sf_dir)
    hist_docs = dd.where(F.col("doc_id") < 400)
    delta_docs = dd.where(F.col("doc_id") >= 400)

    def banded(docs: DataFrame) -> DataFrame:
        # the SAME band layout l2's LSH uses (shared helper) — an index
        # this writes is probeable by any l2-family consumer and
        # vice versa
        return banded_signatures(minhash_signatures(docs))

    # persist + re-read the history index: the classify plan below must
    # not contain the history text scan in its lineage
    state_path = scratch_dir(spark, "inc4_lsh_state")
    banded(hist_docs).write.mode("overwrite").parquet(state_path)
    index = spark.read.parquet(state_path)

    probe = banded(delta_docs)
    est = sig_agreement("sig", "h_sig").cast("double") / F.lit(float(_MINHASH_K))
    cands = (
        probe.join(
            index.select(
                F.col("doc_id").alias("h_doc"),
                F.col("sig").alias("h_sig"),
                "band_id", "band_hash",
            ),
            ["band_id", "band_hash"],
        )
        .select("doc_id", "h_doc", est.alias("est"))
        .where(F.col("est") >= tau)
        .distinct()
    )
    best = cands.groupBy("doc_id").agg(
        F.max(F.struct(F.col("est"), (-F.col("h_doc")).alias("neg"))).alias("b")
    )
    matched = best.select(
        "doc_id",
        F.lit("near_dup_of_history").alias("status"),
        (-F.col("b.neg")).alias("matched_id"),
        F.round(F.col("b.est"), 4).alias("best_est"),
    )
    return (
        delta_docs.select("doc_id")
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("status", F.lit("novel")).alias("status"),
            "matched_id",
            "best_est",
        )
        .orderBy("doc_id")
    )


def _inc4b_side_sql(name: str, pred: str) -> str:
    from ipydataclean_spark.operators.llm import md5_minhash_chain_sql

    # ONE copy of the mins/sig/banded chain (round-6 review #5) — the
    # same builder l2f/c30b certify, suffixed per side
    return (
        f"{name} AS (SELECT doc_id, text FROM documents_dup WHERE {pred}), "
        + md5_minhash_chain_sql(name, f"_{name}")
    )


def _inc4b_oracle() -> str:
    from ipydataclean_spark.operators import dirty

    return (
        "WITH documents_dup AS (" + dirty.DOCUMENTS_DUP_SQL + "), "
        + _inc4b_side_sql("hist", "doc_id < 400")
        + ", "
        + _inc4b_side_sql("delta", "doc_id >= 400")
        + ", cand AS (SELECT DISTINCT d.doc_id, h.doc_id AS h_doc "
        "FROM banded_delta d JOIN banded_hist h "
        "ON h.b = d.b AND h.bh = d.bh), "
        "agree AS (SELECT c.doc_id, c.h_doc, "
        "CAST(SUM(CASE WHEN md.mh = mh2.mh THEN 1 ELSE 0 END) AS BIGINT) "
        "AS n_agree "
        "FROM cand c JOIN mins_delta md ON md.doc_id = c.doc_id "
        "JOIN mins_hist mh2 ON mh2.doc_id = c.h_doc AND mh2.seed = md.seed "
        "GROUP BY 1, 2), "
        "best AS (SELECT doc_id, h_doc, n_agree FROM ("
        "SELECT doc_id, h_doc, n_agree, ROW_NUMBER() OVER ("
        "PARTITION BY doc_id ORDER BY n_agree DESC, h_doc) AS rn "
        "FROM agree WHERE n_agree >= 8) x WHERE rn = 1) "
        "SELECT dd.doc_id, "
        "CASE WHEN b.doc_id IS NULL THEN 'novel' "
        "ELSE 'near_dup_of_history' END AS status, "
        "b.h_doc AS matched_id, ROUND(b.n_agree / 16.0, 4) AS best_est "
        "FROM delta dd LEFT JOIN best b ON b.doc_id = dd.doc_id "
        "ORDER BY dd.doc_id"
    )


@register(
    "inc4b_incremental_minhash_md5",
    oracle=_inc4b_oracle(),
    tags=("INC4", "L2", "D5", "incremental"),
)
def inc4b_incremental_minhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INC4 ORACLE-CERTIFIED: inc4's incremental near-dup classify
    (delta docs probed against the HISTORY's stored MinHash-LSH index,
    history text never rescanned) with the md5 signature scheme
    (llm.md5_minhash_banded — l2f's certified chain) so DuckDB
    replays the whole thing: signatures, band index, probe join,
    agreement >= 8/16, best-match tie-breaks (highest agreement, then
    lowest historical doc_id), and the novel/near-dup LEFT JOIN. The
    stored-state discipline is kept literal — the history index is
    written to parquet and re-read, so the classify plan's lineage
    starts at the stored index, not the history text (the oracle
    computes the same values directly; equality IS the proof that the
    persisted index carries full fidelity). inc4 stays on xxhash64
    (rows-only by design)."""
    from ipydataclean_spark.operators.llm import md5_minhash_banded
    from ipydataclean_spark.operators.qhelp import documents_dup  # noqa: I001

    dd = documents_dup(spark, sf_dir)
    hist = dd.where(F.col("doc_id") < 400)
    delta = dd.where(F.col("doc_id") >= 400)

    state_path = scratch_dir(spark, "inc4b_lsh_state")
    md5_minhash_banded(hist).write.mode("overwrite").parquet(state_path)
    index = spark.read.parquet(state_path)

    from ipydataclean_spark.operators.llm import (
        md5_band_keys,
        md5_minhash_sigs,
        sig_agreement,
    )

    # SLIM probe (round-6 review #7): band keys only through the join
    # and pair dedup; signatures rejoin after. The stored index is read
    # twice with column pruning — (doc_id, b, bh) for the probe,
    # (doc_id, sg) deduped for the agreement pass.
    probe_sigs = md5_minhash_sigs(delta)
    probe_bands = md5_band_keys(probe_sigs)
    index_bands = index.select(F.col("doc_id").alias("h_doc"), "b", "bh")
    index_sigs = index.select(
        F.col("doc_id").alias("h_doc"), F.col("sg").alias("h_sg")
    ).dropDuplicates(["h_doc"])
    cand = (
        probe_bands.join(index_bands, ["b", "bh"])
        .select("doc_id", "h_doc")
        .distinct()
        .join(probe_sigs, "doc_id")
        .join(index_sigs, "h_doc")
    )
    n_agree = sig_agreement("sg", "h_sg").cast("long")
    scored = cand.withColumn("n_agree", n_agree).where(F.col("n_agree") >= 8)
    best = scored.groupBy("doc_id").agg(
        F.max(
            F.struct(F.col("n_agree"), (-F.col("h_doc")).alias("neg"))
        ).alias("b")
    )
    matched = best.select(
        "doc_id",
        F.lit("near_dup_of_history").alias("status"),
        (-F.col("b.neg")).alias("matched_id"),
        F.round(F.col("b.n_agree") / F.lit(16.0), 4).alias("best_est"),
    )
    return (
        delta.select("doc_id")
        .join(matched, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("status", F.lit("novel")).alias("status"),
            "matched_id",
            "best_est",
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# INC5 — incremental decontamination state (the bloom filter as a
# mergeable digest: L44's scale path meets the inc-family discipline)
# ---------------------------------------------------------------------------

_INC5_HIST_PRED = "doc_id % 5 = 0 AND doc_id < 250"
_INC5_DELTA_PRED = "doc_id % 5 = 0 AND doc_id >= 250 AND doc_id < 1000000"
_INC5_CORPUS_PRED = "NOT (doc_id % 5 = 0) AND doc_id % 7 = 0 AND doc_id < 1000000"


def _inc5_oracle() -> str:
    from ipydataclean_spark.operators import dirty
    from ipydataclean_spark.operators.curation import _bloom_pos_sql
    from ipydataclean_spark.operators.llm import shingles_sql

    set_union = " UNION ".join(
        f"SELECT DISTINCT {_bloom_pos_sql('g', j)} AS p FROM bench"
        for j in range(3)
    )
    pos_cols = ", ".join(f"{_bloom_pos_sql('g', j)} AS p{j}" for j in range(3))
    joins = " ".join(f"LEFT JOIN setpos s{j} ON s{j}.p = pos.p{j}" for j in range(3))
    hit = " AND ".join(f"s{j}.p IS NOT NULL" for j in range(3))
    return (
        "WITH documents_dup AS (" + dirty.DOCUMENTS_DUP_SQL + "), "
        "bench AS MATERIALIZED (SELECT DISTINCT unnest("
        + shingles_sql("text", n=8)
        + ") AS g FROM documents_dup "
        f"WHERE ({_INC5_HIST_PRED}) OR ({_INC5_DELTA_PRED})), "
        f"setpos AS MATERIALIZED ({set_union}), "
        "corp AS (SELECT doc_id, unnest("
        + shingles_sql("text", n=8)
        + f") AS g FROM documents_dup WHERE {_INC5_CORPUS_PRED}), "
        f"pos AS (SELECT doc_id, g, {pos_cols} FROM corp), "
        f"hits AS (SELECT pos.doc_id, ({hit}) AS bloom_hit FROM pos {joins}) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, "
        "CAST(COUNT_IF(bloom_hit) AS BIGINT) AS n_bloom_hits, "
        "COUNT_IF(bloom_hit) > 0 AS flagged "
        "FROM hits GROUP BY doc_id ORDER BY doc_id"
    )


@register(
    "inc5_incremental_bloom",
    oracle=_inc5_oracle(),
    tags=("INC5", "L44", "L26", "incremental", "scale"),
)
def inc5_incremental_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INC5: the decontamination bloom filter maintained INCREMENTALLY —
    a bloom bitset is a mergeable digest (set positions OR), so when a
    new benchmark suite lands, the update is: gram the DELTA only, keep
    the positions not already stored, APPEND them to the state table —
    the historical benchmarks are never regrammed (the inc-family
    scan-cost rule, applied to L44's filter). The corpus probe then
    reads the merged state (bounded: ≤ 2^16 position rows regardless
    of benchmark count).

    Stored-state discipline kept literal (the inc4b proof style): the
    history positions are written to parquet, the delta's new
    positions are appended, and the probe's lineage starts at the
    stored table — while the oracle computes the SAME report from
    hist ∪ delta benchmark text directly. Hash equality IS the proof
    that the persisted+appended state carries full fidelity (including
    bloom false positives, which the position-join oracle replays
    exactly)."""
    from ipydataclean_spark.operators.curation import (
        _bloom_pos,
        bloom_bits_df,
        bloom_hit_col,
    )
    from ipydataclean_spark.operators.llm import shingles_col, tokens_col
    from ipydataclean_spark.operators.qhelp import documents_dup

    dd = documents_dup(spark, sf_dir)

    def grams(pred: str) -> DataFrame:
        # checkpointed: the frame feeds three per-salt position
        # projections — without it the tokenize/shingle/distinct
        # subtree runs once per union branch (the l44 bench_grams
        # lesson, review r08)
        return (
            dd.where(F.expr(pred))
            .withColumn("__toks", tokens_col("text"))
            .select(F.explode(shingles_col(F.col("__toks"), 8)).alias("g"))
            .distinct()
            .localCheckpoint(eager=True)
        )

    def positions(g: DataFrame) -> DataFrame:
        out = None
        for j in range(3):
            p = g.select(_bloom_pos(F.col("g"), j).alias("p"))
            out = p if out is None else out.unionByName(p)
        return out.distinct()

    # seed state from history, then merge ONLY the delta's novel
    # positions (anti-join against the stored table — the delta is the
    # only text grammed in the update step)
    state_path = scratch_dir(spark, "inc5_bloom_state")
    positions(grams(_INC5_HIST_PRED)).write.mode("overwrite").parquet(state_path)
    stored = spark.read.parquet(state_path)
    new_pos = positions(grams(_INC5_DELTA_PRED)).join(stored, "p", "left_anti")
    # collect the novel positions (bounded: the bloom has 2^16 bit
    # positions total) and append from a driver-built frame — never
    # append to a path while a job in flight reads that same path;
    # spark.read snapshots the file listing eagerly today, but a lazy
    # or refreshed file index would make the writer see its own
    # output (advice r08)
    novel = [(int(r.p),) for r in new_pos.collect()]
    if novel:
        spark.createDataFrame(novel, schema="p BIGINT").write.mode(
            "append"
        ).parquet(state_path)

    # probe against the MERGED state (bounded two-phase: ≤ 2^16 ints);
    # bitset packing + bit tests single-sourced in curation.py
    merged = [r.p for r in spark.read.parquet(state_path).distinct().collect()]
    bits_df = bloom_bits_df(spark, merged)

    corp = (
        dd.where(F.expr(_INC5_CORPUS_PRED))
        .withColumn("__toks", tokens_col("text"))
        .select("doc_id", F.explode(shingles_col(F.col("__toks"), 8)).alias("g"))
    )
    probe = corp.crossJoin(F.broadcast(bits_df))
    return (
        probe.withColumn("bloom_hit", bloom_hit_col(F.col("g")))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(F.col("bloom_hit")).alias("n_bloom_hits"),
            (F.count_if(F.col("bloom_hit")) > 0).alias("flagged"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# INC7 — incremental embedding curation: score the delta against the store
# ---------------------------------------------------------------------------

_INC7_HIST = "vec_id % 4 < 3"
_INC7_DELTA = "vec_id % 4 = 3"
_INC7_K = 5

def inc7_pair_ctes() -> str:
    """The v/q/e/p CTE prefix — delta-vs-history cosine pairs with
    per-delta ranks — shared VERBATIM by inc7's oracle and st15's
    streaming twin, so the two certifications cannot de-sync (review
    r09c: they are one store semantics, so they get one SQL builder)."""
    from ipydataclean_spark.functions.vector import dot_sql, norm_sql

    cos = f"({dot_sql('q.embedding', 'e.embedding')} / (q.nrm * e.nrm))"
    return (
        f"WITH v AS (SELECT vec_id, embedding, label, {norm_sql('embedding')} AS nrm "
        "FROM embeddings), "
        f"q AS (SELECT * FROM v WHERE {_INC7_DELTA}), "
        f"e AS (SELECT * FROM v WHERE {_INC7_HIST}), "
        "p AS (SELECT q.vec_id, q.label, e.vec_id AS hist_id, "
        + cos + " AS cos_sim, "
        "ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
        + cos + " DESC, e.vec_id) AS rn FROM q CROSS JOIN e)"
    )


def _inc7_oracle() -> str:
    from ipydataclean_spark.operators.llm import SIM_TAU

    return (
        inc7_pair_ctes()
        + ", m AS (SELECT vec_id, label, "
        "CAST(SUM(CASE WHEN rn <= " + str(_INC7_K) + " THEN "
        "CAST(ROUND(cos_sim, 12) AS DECIMAL(38,12)) END) AS DOUBLE) "
        f"/ {_INC7_K} AS knn_mean_cos, "
        "MAX(CASE WHEN rn = 1 THEN hist_id END) AS best_hist_id, "
        "MAX(CASE WHEN rn = 1 THEN cos_sim END) AS best_cos "
        "FROM p GROUP BY vec_id, label) "
        "SELECT vec_id, label, knn_mean_cos, best_hist_id, best_cos, "
        f"CASE WHEN best_cos >= {SIM_TAU} THEN 'dup_of_history' "
        "ELSE 'novel' END AS status "
        "FROM m ORDER BY vec_id"
    )


@register(
    "inc7_incremental_embedding",
    oracle=_inc7_oracle(),
    tags=("INC7", "INC4", "D23", "L4", "embeddings", "incremental"),
)
def inc7_incremental_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INC7: incremental EMBEDDING curation — the daily-ingest form of
    the round-9 embedding family, completing what inc2/inc4 do for
    text: classify a delta batch of vectors against the STORED history
    without rescoring history-vs-history. Per delta vector: kNN-mean
    cosine against the store (the d23 outlier score, computed vs
    history only), the best historical match, and a dup/novel status
    at the l4 threshold — the report an ingest run uses to route new
    vectors (drop dups, flag isolates, append novels to the store).

    State is LITERAL (the inc4 convention): the history slice is
    persisted to parquet and the classify plan's lineage starts at the
    stored table — float32 embeddings round-trip parquet exactly, so
    the oracle (which reads the original fixture slices) stays
    hash-identical. Scoring is one kernel pass: delta spread across
    cores, store riding the closure up to the asserted cap; at 100 TB
    the store side is the IVF cell layout (l3c) probed per delta
    vector, and history text/vectors never rejoin the job.

    Exactness: kernel fold order + ROUND12-decimal mean + MAX-of-one
    (the rn=1 row) — every value bit-identical cross-engine."""
    from ipydataclean_spark.functions.knn import topk_per_row_exact
    from ipydataclean_spark.operators.llm import SIM_TAU

    emb = T(spark, sf_dir, "embeddings")
    store_path = scratch_dir(spark, "inc7_store")
    emb.where(F.expr(_INC7_HIST)).write.mode("overwrite").parquet(store_path)
    store = spark.read.parquet(store_path).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb")
    )
    delta = emb.where(F.expr(_INC7_DELTA)).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("emb"),
        F.col("label"),
    )
    top = topk_per_row_exact(
        delta, store, _INC7_K, part_payload=(("label", "int"),)
    )
    mean_cos = (
        F.sum(F.round("cos_sim", 12).cast(exact.DEC12)).cast("double") / _INC7_K
    )
    best = F.max(F.when(F.col("rn") == 1, F.struct("cos_sim", "cand_id")))
    m = top.groupBy(F.col("part_id").alias("vec_id"), F.col("label")).agg(
        mean_cos.alias("knn_mean_cos"), best.alias("b")
    )
    return (
        m.select(
            "vec_id",
            "label",
            "knn_mean_cos",
            F.col("b.cand_id").alias("best_hist_id"),
            F.col("b.cos_sim").alias("best_cos"),
            F.when(F.col("b.cos_sim") >= SIM_TAU, F.lit("dup_of_history"))
            .otherwise(F.lit("novel"))
            .alias("status"),
        )
        .orderBy("vec_id")
    )


@register(
    "inc8_incremental_media",
    oracle=None,  # payload bytes are invisible to SQL; pins in pytest
    tags=("INC8", "L9", "L2", "multimodal", "dedup", "incremental"),
)
def inc8_incremental_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INC8: incremental MEDIA dedup — the daily-ingest form of the
    l9f/l9p image dedup, completing the media family's triple with
    st17 (streaming) the way inc7 completed embeddings'. State is
    LITERAL (the inc4/inc7 convention): the history fingerprint table
    is persisted to parquet and the classify plan's lineage starts at
    the STORED table, so history images are never re-decoded. Each
    delta image gets its min store hamming and a dup/novel status at
    the l9f reach (<= 7); the per-image report is what an ingest run
    uses to route media (drop re-crawls, append novel fingerprints).

    Scale: the probe dispatches on store size (media_probe_auto, the
    topk_per_row_exact_auto precedent — VERDICT r10 #1): the store
    rides the probe kernel's closure up to MEDIA_STORE_CAP; past that
    the persisted table feeds the banded hamming join
    (shuffle-bounded by DISTINCT hashes per side), emitting
    bit-identical rows — so a re-crawl history of any size classifies
    instead of raising. Rows-only by design; semantics pinned in
    tests/test_streaming.py (every replayed history image classifies
    dup at hamming 0; the novel slice classifies novel; batch twin,
    incremental state, and streaming replay agree) and
    tests/test_media_handoff.py (cross-strategy equality under a
    shrunk cap)."""
    from ipydataclean_spark.operators.media_codecs import (
        attach_patterned_payloads,
        image_dhash,
    )
    from ipydataclean_spark.streaming.batch_twins import _ST17_DELTA
    from ipydataclean_spark.streaming.stream import media_probe_auto

    docs = T(spark, sf_dir, "documents")
    store_path = scratch_dir(spark, "inc8_store")
    image_dhash(
        attach_patterned_payloads(docs.where(F.col("doc_id") % 10 == 0))
    ).write.mode("overwrite").parquet(store_path)
    delta = docs.where(F.expr(_ST17_DELTA)).select("doc_id")
    return media_probe_auto(
        spark, delta, spark.read.parquet(store_path)
    ).orderBy("doc_id")
