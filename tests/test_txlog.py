"""ACID semantics of the commit-log parquet table (sources/txlog.py):
snapshot isolation, optimistic concurrency, time travel, file-level
merge pruning, vacuum."""

import json
import os

import pytest
from pyspark.sql import functions as F

from ipydataclean_spark.sources.txlog import ConflictError, TxTable


@pytest.fixture()
def base_df(spark):
    return spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )


def test_create_read_append_overwrite(spark, base_df, tmp_path):
    t = TxTable.create(spark, str(tmp_path / "t"), base_df)
    assert t.version() == 0
    assert t.read().count() == 100

    t.append(spark.range(100, 120).select(F.col("id").alias("k"), F.lit(0).alias("v")))
    assert t.version() == 1
    assert t.read().count() == 120

    t.overwrite(base_df.limit(5))
    assert t.version() == 2
    assert t.read().count() == 5
    ops = [c["op"] for c in t.history()]
    assert ops == ["create", "append", "overwrite"]


def test_time_travel_and_snapshot_isolation(spark, base_df, tmp_path):
    t = TxTable.create(spark, str(tmp_path / "t"), base_df)
    # resolve a reader BEFORE the overwrite commits
    old_reader = t.read()
    t.overwrite(base_df.where(F.col("k") < 10))
    # the pre-commit reader still sees version 0's rows (immutable files)
    assert old_reader.count() == 100
    # explicit time travel agrees
    assert t.read(version=0).count() == 100
    assert t.read().count() == 10


def test_commit_race_append_rebases_merge_conflicts(spark, base_df, tmp_path):
    t = TxTable.create(spark, str(tmp_path / "t"), base_df)
    # steal version 1: simulate a concurrent writer publishing first
    # (an append that removes nothing)
    os.makedirs(t.root + "/_txlog", exist_ok=True)
    with open(os.path.join(t.root, "_txlog", f"{1:08d}.json"), "w") as f:
        json.dump(
            {"version": 1, "op": "append", "add": [], "remove": [],
             "read_version": 0, "ts": 0.0},
            f,
        )
    # append loses the race for v1, rebases to v2 (no files conflict)
    v = t.append(base_df.limit(1))
    assert v == 2

    # now steal v3 with a commit that REMOVES the files an in-flight
    # merge (already snapshotted at v2) is rewriting -> write-write
    # conflict even with retries. Drive the commit phase directly so
    # the interleaving is deterministic: the merge resolved its
    # snapshot BEFORE the stolen commit landed.
    live_rel = [os.path.relpath(p, t.root) for p in t.live_files()]
    with open(os.path.join(t.root, "_txlog", f"{3:08d}.json"), "w") as f:
        json.dump(
            {"version": 3, "op": "overwrite", "add": [], "remove": live_rel,
             "read_version": 2, "ts": 0.0},
            f,
        )
    with pytest.raises(ConflictError):
        t._publish("merge", add=[], remove=[live_rel[0]],
                   read_version=2, max_retries=2)


def test_merge_upserts_and_prunes_files(spark, tmp_path):
    # 4 range-clustered files -> tight footer min/max on k
    df = (
        spark.range(0, 400)
        .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
    )
    t = TxTable.create(spark, str(tmp_path / "t"), df)
    files_v0 = set(t.live_files())
    assert len(files_v0) == 4

    # update batch confined to k in [0, 50] -> intersects exactly 1 file
    upd = spark.range(0, 51).select(
        F.col("id").alias("k"), F.lit(-1).alias("v")
    )
    t.merge(upd, key="k")
    files_v1 = set(t.live_files())
    carried = files_v0 & files_v1
    assert len(files_v0 - files_v1) == 1, "exactly one file rewritten"
    assert len(carried) == 3, "untouched files carry over by reference"

    got = {r.k: r.v for r in t.read().collect()}
    assert len(got) == 400
    assert all(got[k] == -1 for k in range(0, 51))
    assert all(got[k] == 2 * k for k in range(51, 400))


def test_merge_empty_batch_is_noop(spark, base_df, tmp_path):
    t = TxTable.create(spark, str(tmp_path / "t"), base_df)
    v = t.merge(base_df.where(F.lit(False)), key="k")
    assert v == 0 and t.version() == 0


def test_vacuum_drops_old_versions_only(spark, base_df, tmp_path):
    t = TxTable.create(spark, str(tmp_path / "t"), base_df)
    t.overwrite(base_df.limit(7))
    deleted = t.vacuum(retain_versions=1, min_age_seconds=0)
    assert deleted, "v0 files should be deleted"
    assert t.read().count() == 7  # current snapshot intact
    with pytest.raises(Exception):
        t.read(version=0).count()  # time travel past vacuum horizon fails


def test_stream_merge_to_txtable_exactly_once(spark, sf_dir, tmp_path):
    """ST9 on the ACID path: drain the events stream into a TxTable
    seeded with half the events; the final snapshot equals the full
    set. Then REPLAY the whole stream with a FRESH checkpoint (the
    lost-checkpoint disaster case): every batch re-fires, but the
    (source_name, batch_id) ledger in the commit log skips them all —
    version count and table state must not change."""
    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.sources.txlog import TxTable, stream_merge_to_txtable
    from ipydataclean_spark.streaming.stream import events_stream

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    t = TxTable.create(
        spark,
        str(tmp_path / "t"),
        ev.where(F.col("event_id") % 2 == 0)
        .repartitionByRange(4, "event_id")
        .sortWithinPartitions("event_id"),
    )

    stream = events_stream(spark, sf_dir).select("event_id", "user_id", "value")
    q = stream_merge_to_txtable(
        stream, t, key="event_id", checkpoint_dir=str(tmp_path / "ckpt1")
    )
    q.awaitTermination(120)

    n_total = ev.count()
    assert t.read().count() == n_total
    assert (
        t.read().agg(F.sum("event_id")).first()[0]
        == ev.agg(F.sum("event_id")).first()[0]
    )
    v_after = t.version()
    assert any("batch_id" in c for c in t.history())

    # full replay with a fresh checkpoint: all batches re-fire, ledger
    # skips every one
    q2 = stream_merge_to_txtable(
        events_stream(spark, sf_dir).select("event_id", "user_id", "value"),
        t, key="event_id", checkpoint_dir=str(tmp_path / "ckpt2"),
    )
    q2.awaitTermination(120)
    assert t.version() == v_after
    assert t.read().count() == n_total


# ---------------------------------------------------------------------------
# Model-based property: random op sequences vs an in-memory dict model
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_kv = st.dictionaries(st.integers(0, 40), st.integers(-5, 5), min_size=1, max_size=8)
_op = st.one_of(
    st.tuples(st.just("append"), _kv),
    st.tuples(st.just("overwrite"), _kv),
    st.tuples(st.just("merge"), _kv),
)


@given(init=_kv, ops=st.lists(_op, min_size=1, max_size=4))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_txtable_matches_dict_model(spark, tmp_path_factory, init, ops):
    """Fold a random create/append/overwrite/merge sequence into both
    a TxTable and a plain dict model (merge/overwrite are keyed;
    append is multiset). Final snapshot and every historical version
    must match the model's trajectory; version ids are contiguous."""
    import collections

    def mk(d):
        return spark.createDataFrame(
            [(k, v) for k, v in sorted(d.items())], "k long, v long"
        )

    root = str(tmp_path_factory.mktemp("txprop") / "t")
    t = TxTable.create(spark, root, mk(init))
    # model: multiset of (k, v) rows
    model = collections.Counter(init.items())
    trajectory = [collections.Counter(model)]

    for name, d in ops:
        if name == "append":
            t.append(mk(d))
            model.update(d.items())
        elif name == "overwrite":
            t.overwrite(mk(d))
            model = collections.Counter(d.items())
        else:  # merge: upsert by key over the current state
            t.merge(mk(d), key="k")
            kept = collections.Counter(
                {(k, v): n for (k, v), n in model.items() if k not in d}
            )
            kept.update(d.items())
            model = kept
        trajectory.append(collections.Counter(model))

    assert t.version() == len(ops)
    for v, expect in enumerate(trajectory):
        got = collections.Counter(
            (r.k, r.v) for r in t.read(version=v).collect()
        )
        assert got == expect, f"version {v}"


def test_log_stats_data_skipping(spark, tmp_path):
    """Per-file min/max ride in the commit log; read_where prunes
    files from LOG METADATA alone and returns exactly the filtered
    rows."""
    df = (
        spark.range(0, 400)
        .select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
    )
    t = TxTable.create(spark, str(tmp_path / "t"), df)
    stats = t.file_stats()
    assert len(stats) == 4 and all("k" in s for s in stats.values())

    pruned = t.prune_files("k", 120, 180)
    assert len(pruned) < len(t.live_files()), "no files were skipped"
    got = sorted(r.k for r in t.read_where("k", 120, 180).collect())
    assert got == list(range(120, 181))


def test_merge_prunes_from_log_stats_without_footers(spark, tmp_path, monkeypatch):
    """After create, merge must not open any parquet footer — pruning
    comes from the log. (Footer reads would also break on object
    stores where the driver lacks posix access.)"""
    import ipydataclean_spark.sources.txlog as txmod

    df = (
        spark.range(0, 200)
        .select(F.col("id").alias("k"), F.lit(1).alias("v"))
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
    )
    t = TxTable.create(spark, str(tmp_path / "t"), df)

    calls = []
    real = txmod._footer_stats

    def counting(path):
        calls.append(path)
        return real(path)

    pre_merge_files = set(t.live_files())
    monkeypatch.setattr(txmod, "_footer_stats", counting)
    t.merge(
        spark.range(0, 10).select(F.col("id").alias("k"), F.lit(-1).alias("v")),
        key="k",
    )
    # _footer_stats runs only on the NEWLY STAGED files (to record
    # their stats), never on pre-existing data files
    assert calls, "stats were not recorded for staged files"
    assert not (set(calls) & pre_merge_files), "footers read on existing files"


def test_compact_folds_small_files_and_keeps_data(spark, tmp_path):
    t = TxTable.create(
        spark, str(tmp_path / "t"),
        spark.range(0, 50).select(F.col("id").alias("k"), F.lit(0).alias("v")),
    )
    for i in range(3):  # streaming-style small appends
        t.append(
            spark.range(50 + i * 10, 60 + i * 10).select(
                F.col("id").alias("k"), F.lit(i + 1).alias("v")
            )
        )
    before = t.read().groupBy().agg(F.count(F.lit(1)), F.sum("k")).first()
    n_before = len(t.live_files())
    t.compact(n_files=2, cluster_by="k")
    assert len(t.live_files()) == 2 < n_before
    after = t.read().groupBy().agg(F.count(F.lit(1)), F.sum("k")).first()
    assert tuple(before) == tuple(after)
    # clustered layout -> tight disjoint k-ranges in the log stats
    ranges = sorted(tuple(s["k"]) for s in t.file_stats().values())
    assert ranges[0][1] < ranges[1][0]


def test_schema_evolution_read(spark, tmp_path):
    t = TxTable.create(
        spark, str(tmp_path / "t"),
        spark.range(0, 5).select(F.col("id").alias("k")),
    )
    t.append(
        spark.range(5, 8).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    )
    evolved = t.read(merge_schema=True)
    assert set(evolved.columns) == {"k", "tag"}
    assert evolved.where(F.col("tag").isNull()).count() == 5
    assert evolved.count() == 8


def test_compact_does_not_erase_interleaved_append(spark, base_df, tmp_path, monkeypatch):
    """Regression (review finding): compact() pins snapshot and commit
    base to the same version, so an append landing DURING the rewrite
    makes compact lose the version race — rebase keeps the appended
    file live (rows survive); it is never silently erased."""
    t = TxTable.create(spark, str(tmp_path / "t"), base_df)
    writer = TxTable(spark, t.root)
    orig_stage = TxTable._stage
    fired = {"done": False}

    def stage_with_interleave(self, df):
        out = orig_stage(self, df)
        if self is t and not fired["done"]:
            fired["done"] = True
            # concurrent writer commits while compact has staged but
            # not yet published
            writer.append(
                spark.range(1000, 1010).select(
                    F.col("id").alias("k"), F.lit(-7).cast("long").alias("v")
                )
            )
        return out

    monkeypatch.setattr(TxTable, "_stage", stage_with_interleave)
    t.compact(n_files=2, cluster_by="k", max_retries=1)
    got = {r.k for r in t.read().collect()}
    assert set(range(100)) <= got
    assert set(range(1000, 1010)) <= got, "interleaved append was erased"


def test_compact_zorder_two_columns(spark, tmp_path):
    """Two-column compact clusters by Morton z-value: per-file log
    stats become selective on BOTH dimensions, so read_where prunes
    on either column."""
    df = spark.range(0, 4096).select(
        (F.col("id") % 64).alias("a"), (F.col("id") / 64).cast("long").alias("b"),
        F.col("id").alias("payload"),
    )
    t = TxTable.create(spark, str(tmp_path / "t"), df.coalesce(1))
    t.compact(n_files=8, cluster_by=["a", "b"])
    n = len(t.live_files())
    pruned_a = t.prune_files("a", 0, 7)
    pruned_b = t.prune_files("b", 0, 7)
    assert len(pruned_a) < n and len(pruned_b) < n, (
        f"z-order must prune on both dims: a={len(pruned_a)}/{n} b={len(pruned_b)}/{n}"
    )
    got = t.read_where("a", 0, 7).count()
    assert got == 4096 // 8  # 8 of 64 'a' values, uniform


def test_cdc_insert_update_delete(spark, tmp_path):
    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    t = TxTable.create(
        spark, str(tmp_path / "t"),
        df.repartitionByRange(4, "k").sortWithinPartitions("k"),
    )
    # v1: merge = update k 0..4, insert k 100..102
    ups = spark.createDataFrame(
        [(k, k * 10 + 1) for k in range(5)] + [(k, 0) for k in (100, 101, 102)],
        "k long, v long",
    )
    v1 = t.merge(ups, key="k")
    ch = {(r["change_type"], r["k"]): r["v"] for r in t.read_changes("k", 0, v1).collect()}
    assert {(c, k) for c, k in ch if c == "insert"} == {("insert", 100), ("insert", 101), ("insert", 102)}
    assert sum(1 for c, _ in ch if c == "update_preimage") == 5
    assert ch[("update_preimage", 3)] == 30 and ch[("update_postimage", 3)] == 31
    # rows merge copied but did not modify must NOT appear
    assert not any(k in (10, 20, 39) for _, k in ch)

    # v2: overwrite with a subset -> CDC sees deletes for dropped keys
    v2 = t.overwrite(t.read().where("k < 3"))
    ch2 = [(r["change_type"], r["k"]) for r in t.read_changes("k", v1, v2).collect()]
    assert all(c == "delete" for c, _ in ch2)
    assert len(ch2) == t.read(version=v1).count() - 3


def test_cdc_across_compaction_is_empty(spark, tmp_path):
    df = spark.range(0, 30).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    t = TxTable.create(spark, str(tmp_path / "t"), df.repartition(6))
    v1 = t.compact(n_files=2, cluster_by="k")
    assert t.read_changes("k", 0, v1).count() == 0


def test_cdc_multi_version_window_composes(spark, tmp_path):
    df = spark.range(0, 20).select(
        F.col("id").alias("k"), F.lit(0).cast("long").alias("v")
    )
    t = TxTable.create(
        spark, str(tmp_path / "t"),
        df.repartitionByRange(2, "k").sortWithinPartitions("k"),
    )
    t.merge(spark.createDataFrame([(5, 1)], "k long, v long"), key="k")
    v2 = t.merge(spark.createDataFrame([(5, 2), (30, 0)], "k long, v long"), key="k")
    # window v0 -> v2: k=5 nets to ONE update pair (0 -> 2), k=30 an insert
    ch = {(r["change_type"], r["k"]): r["v"] for r in t.read_changes("k", 0, v2).collect()}
    assert ch == {
        ("update_preimage", 5): 0,
        ("update_postimage", 5): 2,
        ("insert", 30): 0,
    }


def test_cdc_rejects_bad_window(spark, tmp_path):
    df = spark.range(0, 5).select(F.col("id").alias("k"))
    t = TxTable.create(spark, str(tmp_path / "t"), df)
    with pytest.raises(ValueError):
        t.read_changes("k", 0, 0)


def test_bloom_index_prunes_and_inherits(spark, tmp_path):
    df = spark.range(0, 400).select(
        F.col("id").alias("k"),
        F.concat(F.lit("name-"), F.col("id")).alias("name"),
    )
    t = TxTable.create(
        spark, str(tmp_path / "t"),
        df.repartitionByRange(8, "k").sortWithinPartitions("k"),
        bloom_cols=("name",),
    )
    # point lookup on the non-clustered column prunes to ~1 file
    pruned = t.prune_files_eq("name", "name-123")
    assert 1 <= len(pruned) < len(t.live_files())
    got = t.read_where_eq("name", "name-123").collect()
    assert [(r.k, r.name) for r in got] == [(123, "name-123")]
    # absent value: bloom proves absence in (almost) every file
    assert len(t.prune_files_eq("name", "no-such-name")) <= 2
    assert t.read_where_eq("name", "no-such-name").count() == 0

    # a REOPENED handle inherits bloom_cols from commit 0 and keeps
    # indexing files written by later commits
    t2 = TxTable(spark, str(tmp_path / "t"))
    assert t2.bloom_cols == ("name",)
    t2.merge(
        spark.createDataFrame([(1000, "name-1000")], "k long, name string"),
        key="k",
    )
    pruned2 = t2.prune_files_eq("name", "name-1000")
    assert len(pruned2) < len(t2.live_files())
    assert t2.read_where_eq("name", "name-1000").count() == 1


def test_bloom_absent_column_conservative(spark, tmp_path):
    # no bloom recorded -> every file conservatively kept, result right
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    t = TxTable.create(spark, str(tmp_path / "t"), df.repartition(4))
    assert len(t.prune_files_eq("k", 7)) == len(t.live_files())
    assert t.read_where_eq("k", 7).count() == 1


def test_merge_schema_evolution(spark, tmp_path):
    df = spark.range(0, 40).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    t = TxTable.create(
        spark, str(tmp_path / "t"),
        df.repartitionByRange(4, "k").sortWithinPartitions("k"),
    )
    # batch adds a NEW column (and still carries the full old schema)
    ups = spark.createDataFrame(
        [(2, 99, "gold"), (100, 0, "new")], "k long, v long, tier string"
    )
    t.merge(ups, key="k", evolve_schema=True)
    got = {r.k: (r.v, r.tier) for r in t.read(merge_schema=True).collect()}
    assert got[2] == (99, "gold") and got[100] == (0, "new")
    assert got[39] == (390, None)  # untouched rows surface NULL tier
    assert len(got) == 41

    # without the flag, a schema mismatch fails loudly instead of
    # silently dropping the column
    import pytest as _pytest

    with _pytest.raises(Exception):
        t.merge(
            spark.createDataFrame([(3, 1, "x", 9)],
                                  "k long, v long, tier string, extra long"),
            key="k",
        )


def test_txcdc_stream_replays_and_resumes(spark, tmp_path):
    """Streaming CDC source: offsets are table versions; availableNow
    drains the change feed, later commits + further drains from the
    SAME checkpoint emit only their windows (exactly-once)."""
    from ipydataclean_spark.sources.txlog import register_txcdc

    df = spark.range(0, 30).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    root = str(tmp_path / "t")
    t = TxTable.create(
        spark, root, df.repartitionByRange(3, "k").sortWithinPartitions("k")
    )
    register_txcdc(spark)
    ckpt = str(tmp_path / "ckpt")

    out_dir = str(tmp_path / "out")

    def drain(expect_version):
        # parquet sink: the one that supports checkpoint RESUME (the
        # memory sink refuses recovery); each drain appends its window
        stream = (
            spark.readStream.format("txcdc")
            .option("path", root)
            .option("key", "k")
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        all_rows = spark.read.parquet(out_dir).collect()
        return [r for r in all_rows if r.version == expect_version]

    # window -1 -> 0: the create replayed as inserts
    rows = drain(0)
    assert len(rows) == 30
    assert all(r.change_type == "insert" and r.version == 0 for r in rows)
    assert {r.k: r.v for r in rows}[7] == 70

    # window 0 -> 1: one merge = update pre/post + one insert,
    # unchanged rows of the rewritten file do NOT reappear
    t.merge(
        spark.createDataFrame([(5, -1), (100, 0)], "k long, v long"), key="k"
    )
    rows2 = drain(1)
    by = {(r.change_type, r.k): (r.version, r.v) for r in rows2}
    assert by[("insert", 100)] == (1, 0)
    assert by[("update_preimage", 5)] == (1, 50)
    assert by[("update_postimage", 5)] == (1, -1)
    assert len(rows2) == 3

    # window 1 -> 2: overwrite-to-subset = deletes only
    t2 = TxTable(spark, root)
    t2.overwrite(t2.read().where("k < 3"))
    rows3 = drain(2)
    assert rows3 and all(r.change_type == "delete" for r in rows3)
    assert all(r.version == 2 for r in rows3)
    assert len(rows3) == 31 - 3  # 31 live keys, 3 survive

    # nothing new: a fourth drain appends nothing
    n_before = spark.read.parquet(out_dir).count()
    assert drain(3) == []
    assert spark.read.parquet(out_dir).count() == n_before


def test_incremental_view_maintenance_from_cdc(spark, tmp_path):
    """INC3: the CDC-maintained per-group sum equals the direct
    aggregate of every source snapshot it has consumed — through
    merge updates, inserts, AND deletes — without ever rescanning
    the source."""
    from ipydataclean_spark.operators.incremental import maintain_sum_view

    src_root = str(tmp_path / "src")
    view_root = str(tmp_path / "view")
    df = spark.range(0, 60).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("grp"),
        (F.col("id") * 1.5).cast("double").alias("v"),
    )
    src = TxTable.create(
        spark, src_root, df.repartitionByRange(3, "k").sortWithinPartitions("k")
    )
    # view seeded from the v0 snapshot (CDC windows start AFTER v0)
    seed = src.read().groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v").cast("decimal(28,6)")).alias("total"),
    )
    view = TxTable.create(spark, view_root, seed)

    def check():
        got = {
            r.grp: (r.n, r.total)
            for r in view.read().where("n > 0").collect()
        }
        want = {
            r.grp: (r.n, r.total)
            for r in src.read()
            .groupBy("grp")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.col("v").cast("decimal(28,6)")).alias("total"),
            )
            .collect()
        }
        assert got == want, (got, want)

    ckpt = str(tmp_path / "ckpt")
    # window 1: merge = updates + inserts
    src.merge(
        spark.createDataFrame(
            [(5, "1", 100.0), (200, "0", 7.25)], "k long, grp string, v double"
        ),
        key="k",
    )
    q = maintain_sum_view(spark, src_root, view, "grp", "v", "k", ckpt)
    q.awaitTermination(120)
    check()

    # window 2: deletes (overwrite to a subset)
    src.overwrite(src.read().where("k % 2 = 0"))
    q = maintain_sum_view(spark, src_root, view, "grp", "v", "k", ckpt)
    q.awaitTermination(120)
    check()


_kv_ops = st.lists(
    st.one_of(
        st.tuples(st.just("overwrite"), _kv),
        st.tuples(st.just("merge"), _kv),
    ),
    min_size=1,
    max_size=4,
)


@given(init=_kv, ops=_kv_ops)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_cdc_matches_model_diffs(spark, tmp_path_factory, init, ops):
    """Property: for EVERY consecutive version pair of a random
    merge/overwrite sequence (key-unique states, the CDC contract),
    read_changes reproduces exactly the dict-model diff — inserts,
    deletes, and update pre/post images."""

    def mk(d):
        return spark.createDataFrame(
            [(k, v) for k, v in sorted(d.items())], "k long, v long"
        )

    root = str(tmp_path_factory.mktemp("cdcprop") / "t")
    t = TxTable.create(spark, root, mk(init))
    states = [dict(init)]
    for name, d in ops:
        if name == "overwrite":
            t.overwrite(mk(d))
            states.append(dict(d))
        else:
            t.merge(mk(d), key="k")
            nxt = dict(states[-1])
            nxt.update(d)
            states.append(nxt)

    for v in range(len(states) - 1):
        old, new = states[v], states[v + 1]
        want = set()
        for k in new:
            if k not in old:
                want.add(("insert", k, new[k]))
            elif old[k] != new[k]:
                want.add(("update_preimage", k, old[k]))
                want.add(("update_postimage", k, new[k]))
        for k in old:
            if k not in new:
                want.add(("delete", k, old[k]))
        got = {
            (r.change_type, r.k, r.v)
            for r in t.read_changes("k", v, v + 1).collect()
        }
        assert got == want, f"window {v}->{v + 1}"


def test_bloom_index_non_string_types(spark, tmp_path):
    """xxhash64 is type-sensitive: the probe literal must be cast to
    the column's STORED type or int/float bloom columns prune every
    file and point lookups silently return empty (ADVICE r03 #2)."""
    df = spark.range(0, 300).select(
        F.col("id").alias("k"),
        F.col("id").cast("int").alias("code"),
        (F.col("id") * 0.5).cast("float").alias("score"),
    )
    t = TxTable.create(
        spark, str(tmp_path / "t"),
        df.repartitionByRange(6, "k").sortWithinPartitions("k"),
        bloom_cols=("code", "score"),
    )
    # int column: probe with a Python int (would lit as LONG uncast)
    assert 1 <= len(t.prune_files_eq("code", 123)) < len(t.live_files())
    got = t.read_where_eq("code", 123).collect()
    assert [(r.k, r.code) for r in got] == [(123, 123)]
    assert t.read_where_eq("code", 9999).count() == 0
    # float column: probe with a Python float (would lit as DOUBLE)
    assert 1 <= len(t.prune_files_eq("score", 61.0)) < len(t.live_files())
    assert [r.k for r in t.read_where_eq("score", 61.0).collect()] == [122]


def test_restore_rolls_back_as_new_commit(spark, tmp_path):
    """RESTORE semantics: the rollback is a NEW commit (history intact,
    time travel into the bad interval still works), data files come
    back by reference, and stats-based pruning still functions on the
    restored snapshot."""
    df0 = spark.range(0, 100).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
    t = TxTable.create(
        spark, str(tmp_path / "t"),
        df0.repartitionByRange(4, "k").sortWithinPartitions("k"),
    )
    v0 = t.version()
    t.append(spark.createDataFrame([(1000, -1)], "k long, v long"))
    t.overwrite(spark.range(0, 5).select(F.col("id").alias("k"), F.lit(0).cast("long").alias("v")))
    bad_v = t.version()
    assert t.read().count() == 5

    v_restored = t.restore(v0)
    assert v_restored == bad_v + 1                      # new commit, not rewrite
    got = sorted(r.k for r in t.read().collect())
    assert got == list(range(100))                      # back to v0 content
    assert t.read(version=bad_v).count() == 5           # bad interval auditable
    assert t.history()[-1]["op"] == "restore"
    assert t.history()[-1]["restored_version"] == v0
    # stats survived the by-reference re-add: pruning still selective
    pruned = t.prune_files("k", 10, 12)
    assert 1 <= len(pruned) < len(t.live_files())
    # restore to a vacuumed-away version fails clearly
    t.overwrite(spark.range(0, 3).select(F.col("id").alias("k"), F.lit(9).cast("long").alias("v")))
    t.vacuum(retain_versions=1, min_age_seconds=0)
    with pytest.raises(ValueError):
        t.restore(bad_v)
