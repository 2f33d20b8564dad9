"""Source/sink round-trips (S2/S3/S5) + stateful streaming (ST6)."""

import tempfile

from pyspark.sql import functions as F

from ipydataclean_spark.catalog import load_table
from ipydataclean_spark.sources import read_csv, read_json, write_parquet


def test_csv_roundtrip(spark, sf_dir):
    """S2: write customers as CSV, re-ingest with inference — the
    reference's pandas.read_csv entry path [P]."""
    cust = load_table(spark, sf_dir, "customer")
    with tempfile.TemporaryDirectory() as d:
        cust.write.mode("overwrite").option("header", "true").csv(f"{d}/c")
        back = read_csv(spark, f"{d}/c")
        assert back.count() == cust.count()
        assert set(back.columns) == set(cust.columns)
        a = cust.agg(F.sum("c_custkey")).first()[0]
        b = back.agg(F.sum("c_custkey")).first()[0]
        assert a == b


def test_json_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory() as d:
        docs.write.mode("overwrite").json(f"{d}/j")
        back = read_json(spark, f"{d}/j")
        assert back.count() == docs.count()


def test_parquet_sink_partitioned(spark, sf_dir):
    """S5: partitioned sink enables partition pruning for readers."""
    docs = load_table(spark, sf_dir, "documents")
    with tempfile.TemporaryDirectory() as d:
        write_parquet(docs, f"{d}/p", partition_by=["lang"])
        back = spark.read.parquet(f"{d}/p")
        one = back.where(F.col("lang") == "en")
        assert one.count() == docs.where(F.col("lang") == "en").count()
        # partition pruning: the filtered scan lists only lang=en files
        from ipydataclean_spark.plans import formatted_plan

        assert "PartitionFilters" in formatted_plan(one)


def test_stateful_user_totals_replay(spark, sf_dir):
    """ST6: applyInPandasWithState drained with availableNow — final
    per-user state equals the batch aggregate."""
    from ipydataclean_spark.streaming.stream import events_stream, stateful_user_totals

    ev = load_table(spark, sf_dir, "events")
    expect = {
        r.user_id: (r.n, round(r.total, 6))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stateful_user_totals(events_stream(spark, sf_dir))
            .writeStream.format("memory")
            .queryName("t_state")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # last emitted row per user is the final state
        rows = spark.table("t_state").groupBy("user_id").agg(
            F.max("n_events").alias("n"), F.max("total_value").alias("total")
        ).collect()
        got = {r.user_id: (r.n, round(r.total, 6)) for r in rows}
    assert got.keys() == expect.keys()
    for u in expect:
        assert got[u][0] == expect[u][0]
        assert abs(got[u][1] - expect[u][1]) < 1e-6


def test_stateful_user_totals_tws_replay(spark, sf_dir):
    """transformWithStateInPandas twin: drained with availableNow it
    must equal the batch per-user aggregate (same contract as the
    applyInPandasWithState form).

    Requires google.protobuf (the TWS state-server protocol): absent
    in this container, so the test gates on the import and the
    applyInPandasWithState twin (test_stateful_user_totals_replay)
    carries the ST6 contract."""
    import tempfile

    import pytest

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        pytest.skip("google.protobuf unavailable: transformWithState needs its state-server proto")

    from pyspark.sql import functions as F

    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.streaming.stream import events_stream, stateful_user_totals_tws

    batch = {
        (r.user_id, r.n_events, round(r.total_value, 6))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.coalesce("value", F.lit(0.0))).alias("total_value"),
        )
        .collect()
    }
    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            stateful_user_totals_tws(events_stream(spark, sf_dir))
            .writeStream.format("memory")
            .queryName("t_tws")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # update mode: keep the LAST emitted row per user
        out = spark.table("t_tws").groupBy("user_id").agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
        got = {(r.user_id, r.n_events, round(r.total_value, 6)) for r in out.collect()}
    assert got == batch


def test_schema_evolution_merged_read(spark, sf_dir, tmp_path):
    """S1b: files written under old (no n_chars) and new (+quality)
    schemas read as the union schema; old rows NULL out new columns."""
    from ipydataclean_spark.sources import read_parquet_merged

    docs = load_table(spark, sf_dir, "documents")
    old = docs.select("doc_id", "text", "lang")
    new = docs.select("doc_id", "text", "lang", (F.col("n_chars") / 100.0).alias("quality"))
    old.write.parquet(f"{tmp_path}/ds/batch=0")
    new.write.parquet(f"{tmp_path}/ds/batch=1")
    merged = read_parquet_merged(spark, f"{tmp_path}/ds")
    assert "quality" in merged.columns
    assert merged.count() == 2 * docs.count()
    assert merged.where(F.col("quality").isNull()).count() == docs.count()


def test_compact_parquet_reduces_files(spark, sf_dir, tmp_path):
    """S5b: a 64-file fragmented dataset compacts to the computed
    target count with identical contents."""
    import glob

    from ipydataclean_spark.sources import compact_parquet

    li = load_table(spark, sf_dir, "lineitem")
    li.repartition(64).write.parquet(f"{tmp_path}/frag")
    n_in = len(glob.glob(f"{tmp_path}/frag/*.parquet"))
    assert n_in >= 32
    n_out = compact_parquet(spark, f"{tmp_path}/frag", f"{tmp_path}/compact", target_file_mb=128)
    n_files = len(glob.glob(f"{tmp_path}/compact/*.parquet"))
    assert n_files == n_out
    assert n_files <= 2
    a = spark.read.parquet(f"{tmp_path}/compact")
    assert a.count() == li.count()
    assert a.agg(F.sum(F.col("l_quantity").cast("decimal(28,6)"))).first()[0] == \
        li.agg(F.sum(F.col("l_quantity").cast("decimal(28,6)"))).first()[0]


def test_pyds_partitioned_scan(spark):
    """S8: the custom Python data source scans with one task per
    declared InputPartition (a distributed read, not a driver loop),
    and its dirt rule lands where declared."""
    from ipydataclean_spark.sources.pydatasource import register_dirtygen

    register_dirtygen(spark)
    df = spark.read.format("dirtygen").option("rows", "2000").option("partitions", "8").load()
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 2000
    assert df.where(F.col("value").isNull()).count() == len(range(0, 2000, 97))
    assert df.where(F.col("value") > 10000).count() > 0


def test_pyds_stream_replay_equals_batch(spark):
    """S8c: the custom source's micro-batch stream reader, drained with
    availableNow over 8 chunks, yields exactly the batch scan."""
    from ipydataclean_spark.sources.pydatasource import register_dirtygen

    register_dirtygen(spark)
    batch = sorted(
        tuple(r)
        for r in spark.read.format("dirtygen")
        .option("rows", "2000").option("partitions", "4").load().collect()
    )
    import time

    with tempfile.TemporaryDirectory() as ckpt:
        q = (
            spark.readStream.format("dirtygen")
            .option("rows", "2000").option("chunk", "250").load()
            .writeStream.format("memory").queryName("t_pyds")
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        # the generator is exhausted once the offset reaches `rows`;
        # each micro-batch advances it by `chunk` (8 batches total)
        deadline = time.time() + 120
        while time.time() < deadline and spark.table("t_pyds").count() < 2000:
            time.sleep(0.5)
        q.stop()
        got = sorted(tuple(r) for r in spark.table("t_pyds").collect())
    assert got == batch


def test_merge_into_parquet_rewrites_only_touched_partitions(spark, sf_dir):
    """C18b: file-level MERGE leaves untouched partitions' files
    byte-identical on disk and merges content correctly in the
    touched one (VERDICT r01 #5)."""
    import os

    from ipydataclean_spark.sources import merge_into_parquet

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus",
        (F.col("o_orderkey") % 16).alias("pk"),
    )
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/t"
        orders.write.mode("overwrite").partitionBy("pk").parquet(path)

        def listing(pk):
            pdir = os.path.join(path, f"pk={pk}")
            return {
                f: os.path.getmtime(os.path.join(pdir, f))
                for f in os.listdir(pdir)
                if f.endswith(".parquet")
            }

        before = {pk: listing(pk) for pk in range(16)}
        updates = orders.where(F.col("o_orderkey") % 64 == 0).select(
            F.col("o_orderkey").alias("u_o_orderkey"),
            (F.col("o_totalprice") * 2).alias("u_o_totalprice"),
            F.lit("P").alias("u_o_orderstatus"),
            F.col("pk"),
        )
        touched = merge_into_parquet(spark, path, updates, key="o_orderkey", part="pk")
        assert touched == [0]
        after = {pk: listing(pk) for pk in range(16)}
        for pk in range(1, 16):
            assert after[pk] == before[pk], f"partition {pk} was rewritten"
        assert after[0] != before[0]
        back = spark.read.parquet(path)
        n_upd = updates.count()
        assert back.count() == orders.count()  # pure updates, no inserts
        doubled = back.where(F.col("o_orderstatus") == "P").count()
        # every %64 key now carries status P (plus any pre-existing P rows
        # outside pk=0 are untouched -> none, fixture statuses are F/O/P)
        assert (
            back.where((F.col("o_orderkey") % 64 == 0) & (F.col("o_orderstatus") == "P")).count()
            == n_upd
        )
        assert doubled >= n_upd


def test_orc_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """S10: ORC round-trips exactly (decimal-sum compare) and a
    filtered read pushes the predicate into the ORC scan."""
    from ipydataclean_spark.plans import formatted_plan
    from ipydataclean_spark.sources import read_orc, write_orc

    li = load_table(spark, sf_dir, "lineitem")
    write_orc(li, f"{tmp_path}/orc")
    back = read_orc(spark, f"{tmp_path}/orc")
    assert back.count() == li.count()
    assert back.agg(F.sum(F.col("l_quantity").cast("decimal(28,6)"))).first()[0] == \
        li.agg(F.sum(F.col("l_quantity").cast("decimal(28,6)"))).first()[0]
    filtered = back.where(F.col("l_orderkey") == 1).select("l_orderkey", "l_quantity")
    plan = formatted_plan(filtered)
    assert "PushedFilters: [" in plan and "l_orderkey" in plan.split("PushedFilters")[1][:120]


def test_text_source_line_and_wholefile(spark, tmp_path):
    """S11: line mode yields one row per line; wholetext one per file."""
    from ipydataclean_spark.sources import read_text

    p = tmp_path / "corpus"
    p.mkdir()
    (p / "a.txt").write_text("alpha\nbeta\ngamma\n")
    (p / "b.txt").write_text("delta\nepsilon\n")
    lines = read_text(spark, str(p))
    assert lines.columns == ["value"]
    assert lines.count() == 5
    assert {r.value for r in lines.collect()} == {"alpha", "beta", "gamma", "delta", "epsilon"}
    whole = read_text(spark, str(p), whole_file=True)
    assert whole.count() == 2
    assert {r.value.count("\n") for r in whole.collect()} == {2, 3}


def test_tolerant_csv_quarantines_corrupt_rows(spark, tmp_path):
    """S2b: malformed lines land in _corrupt_record (verbatim) instead
    of failing the read; clean rows parse fully typed."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.sources import read_csv_tolerant, split_quarantine

    p = tmp_path / "in.csv"
    p.write_text(
        "k,v\n"
        "1,10.5\n"
        "2,not_a_number\n"
        "3,30.0\n"
    )
    clean, bad = split_quarantine(read_csv_tolerant(spark, str(p), "k INT, v DOUBLE"))
    assert clean.count() == 2
    assert "_corrupt_record" not in clean.columns
    assert {r.k for r in clean.collect()} == {1, 3}
    quarantined = [r._corrupt_record for r in bad.collect()]
    assert quarantined == ["2,not_a_number"]


def test_tolerant_json_quarantines_corrupt_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from ipydataclean_spark.sources import read_json_tolerant, split_quarantine

    p = tmp_path / "in.jsonl"
    p.write_text(
        '{"k": 1, "v": 10.5}\n'
        "this is not json\n"
        '{"k": 3, "v": 30.0}\n'
    )
    clean, bad = split_quarantine(read_json_tolerant(spark, str(p), "k INT, v DOUBLE"))
    assert clean.count() == 2
    rows = bad.collect()
    assert len(rows) == 1 and rows[0]._corrupt_record == "this is not json"
