"""Scale-pattern demonstrations (SURVEY.md §4.2 leftovers): bucketed
co-located joins (no shuffle at join time) and ANALYZE TABLE stats."""

import tempfile

from pyspark.sql import functions as F

from ipydataclean_spark.catalog import load_table
from ipydataclean_spark.plans import plan_tree


def test_bucketed_join_needs_no_exchange(spark, sf_dir):
    """Pre-bucketing both sides on the join key co-locates partitions:
    the join plan must contain NO Exchange (shuffle) — the pattern that
    turns a repeated 100 TB fact⋈fact join into a map-side merge."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    with tempfile.TemporaryDirectory() as d:
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
        (
            li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
            .option("path", f"{d}/li").mode("overwrite").saveAsTable("li_b")
        )
        (
            orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
            .option("path", f"{d}/ord").mode("overwrite").saveAsTable("ord_b")
        )
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = (
                spark.table("li_b")
                .join(spark.table("ord_b"), F.col("l_orderkey") == F.col("o_orderkey"))
                .groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n"))
            )
            tree = plan_tree(joined)
            join_idx = [i for i, line in enumerate(tree) if "SortMergeJoin" in line]
            assert join_idx, "\n".join(tree)
            # in the tree, the join's inputs print BELOW it; the only
            # allowed Exchange (final groupBy) sits above the join.
            below = tree[join_idx[0] + 1 :]
            assert not any("Exchange" in line for line in below), "\n".join(tree)
            got = {r.o_orderstatus: r.n for r in joined.collect()}
            expect = {
                r.o_orderstatus: r.n
                for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
                .groupBy("o_orderstatus")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            assert got == expect
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
            spark.sql("DROP TABLE IF EXISTS li_b")
            spark.sql("DROP TABLE IF EXISTS ord_b")


def test_q31b_bucketed_rollup_equals_direct(spark, sf_dir):
    """q31b (bucketed-facts trending parts) must produce the SAME
    weekly (part, week, n) rollup as q31's plain shuffled join — the
    rollup covers every (part, week) cell, far stronger evidence than
    the top-20 readout. The shuffle-free plan below the SMJ is
    asserted inside weekly_counts_bucketed itself."""
    from ipydataclean_spark.operators.analytics import (
        weekly_counts_bucketed,
        weekly_counts_direct,
    )

    direct = {
        (r.l_partkey, r.week): r.n
        for r in weekly_counts_direct(spark, sf_dir).collect()
    }
    bucketed = {
        (r.l_partkey, r.week): r.n
        for r in weekly_counts_bucketed(spark, sf_dir).collect()
    }
    assert direct, "fixture produced an empty rollup"
    assert bucketed == direct


def test_q28_prefilter_knob_ab_equality(spark, sf_dir):
    """association_rules prefilter on/off/auto must return identical
    rows (the Apriori anti-monotone property: pruning items below
    min-support cannot change any surviving pair, and n_baskets /
    per-item counts are computed pre-pruning). Pins VERDICT r04 #5's
    parameterized knob; also checks auto mode's applicability guard
    SKIPS the filter on this fixture (≈ every part is frequent at
    min_support=3, the measured prunes-nothing regime)."""
    from ipydataclean_spark.operators.analytics import association_rules

    def rows(**kw):
        return [
            tuple(r) for r in association_rules(spark, sf_dir, **kw).collect()
        ]

    off = rows(prefilter="off")
    assert off, "fixture produced no association rules"
    assert rows(prefilter="on") == off
    assert rows(prefilter="auto") == off
    # higher threshold: the frequent fraction drops, the guard flips,
    # and on/off must STILL agree
    off_hi = rows(prefilter="off", min_support=8)
    assert rows(prefilter="on", min_support=8) == off_hi
    assert rows(prefilter="auto", min_support=8) == off_hi


def test_analyze_table_stats_visible(spark, sf_dir):
    """ANALYZE TABLE wires row-count/size stats into the catalog (CBO
    join-reorder food)."""
    cust = load_table(spark, sf_dir, "customer")
    with tempfile.TemporaryDirectory() as d:
        spark.sql("DROP TABLE IF EXISTS cust_s")
        cust.write.option("path", f"{d}/c").mode("overwrite").saveAsTable("cust_s")
        try:
            spark.sql("ANALYZE TABLE cust_s COMPUTE STATISTICS FOR COLUMNS c_custkey, c_acctbal")
            desc = spark.sql("DESCRIBE EXTENDED cust_s c_custkey").collect()
            info = {r.info_name: r.info_value for r in desc}
            assert int(info["distinct_count"]) > 0
            stats = spark.sql("DESCRIBE EXTENDED cust_s").collect()
            rows = {r.col_name: r.data_type for r in stats}
            assert "Statistics" in rows and "rows" in rows["Statistics"]
        finally:
            spark.sql("DROP TABLE IF EXISTS cust_s")


def test_dynamic_partition_pruning(spark, sf_dir, tmp_path):
    """DPP: a fact table partitioned on disk by a join column is pruned
    at runtime by the dim-side filter — the scan shows a
    dynamicpruning expression instead of reading every partition."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.plans import formatted_plan

    fact_dir = str(tmp_path / "orders_by_year")
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    orders.write.mode("overwrite").partitionBy("o_year").parquet(fact_dir)
    fact = spark.read.parquet(fact_dir)
    # DPP fires only when the build side carries a selective predicate
    dim = spark.createDataFrame(
        [(1996, "k"), (1997, "k"), (1998, "x")], ["d_year", "keep"]
    ).where(F.col("keep") == "k")
    joined = fact.join(dim, fact.o_year == dim.d_year).groupBy("o_year").count()
    assert "dynamicpruning" in formatted_plan(joined).lower()


def test_join_strategy_hints_respected(spark, sf_dir):
    """Planner obeys per-join strategy hints — the escape hatch when a
    skewed or mis-estimated join needs a manual strategy at scale."""
    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.plans import count_op

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey")
    shj = li.join(orders.hint("shuffle_hash"), li.l_orderkey == orders.o_orderkey)
    assert count_op(shj, "ShuffledHashJoin") >= 1
    smj = li.join(orders.hint("merge"), li.l_orderkey == orders.o_orderkey)
    assert count_op(smj, "SortMergeJoin") >= 1


def test_observation_metrics_piggyback(spark, sf_dir):
    """Observation metrics ride along an existing action — free
    row-count/quality telemetry with NO extra scan (the production
    monitoring hook for a 100 TB pipeline run)."""
    from pyspark.sql import Observation

    from ipydataclean_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    obs = Observation("li_profile")
    observed = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").isNull().cast("long")).alias("qty_nulls"),
        F.max("l_shipdate").alias("max_shipdate"),
    )
    out_rows = observed.where(F.col("l_quantity") > 25).count()
    metrics = obs.get
    assert metrics["n_rows"] == li.count()
    assert metrics["qty_nulls"] == 0
    assert metrics["max_shipdate"] is not None
    assert 0 < out_rows < metrics["n_rows"]


def test_runtime_bloom_filter_join_pruning(spark, sf_dir):
    """Runtime row-level filtering: with a selective dim-side filter on
    a shuffle join, Catalyst injects a bloom filter built from the
    small side and applies it to the fact scan side — rows that cannot
    join are dropped BEFORE the shuffle. At 100 TB this is the knob
    that turns a 'shuffle everything then discard 99%' join into a
    pre-shuffle semi-filter. (Thresholds lowered because the fixture
    is far below the 10 GB default application-side size.)"""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        sel = orders.where(F.col("o_orderpriority") == "1-URGENT")
        joined = li.join(sel, li.l_orderkey == sel.o_orderkey).groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        from ipydataclean_spark.plans import formatted_plan

        plan = formatted_plan(joined).lower()
        assert "bloomfilter" in plan or "bloom_filter" in plan, plan[:3000]
        # and it must not change the answer
        expect = (
            li.join(orders.where(F.col("o_orderpriority") == "1-URGENT"),
                    li.l_orderkey == orders.o_orderkey)
            .count()
        )
        assert joined.agg(F.sum("n")).first()[0] == expect
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE skew-join handling: a join where one key holds ~90% of the
    rows must execute with the hot partition split (SortMergeJoin
    skew=true / AQEShuffleRead skewed) instead of one straggler task —
    the runtime complement to the explicit salting in
    groupstats.salted_sum (aggregation-side) and the LSH bucket split
    (candidate-join-side)."""
    import contextlib
    import io

    from pyspark.sql import functions as F

    keys = [
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    ]
    saved = {}
    for k in keys:
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
    try:
        # thresholds scaled down so the tiny fixture-sized shuffle
        # exhibits the same decision a multi-GB partition would
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
        left = spark.range(300000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("payload"),
        )
        right = spark.range(50000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("r")
        )
        j = left.join(right, "k")
        rows = j.collect()  # execute THIS plan so explain shows the final AQE plan
        assert len(rows) == 275000
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            j.explain()
        plan = buf.getvalue()
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan or "skewed" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_correct_and_spreads_hot_key(spark):
    """functions/skew.salted_join: result must equal the plain join on
    a 100k-row hot-key fact; the physical join keys must include the
    salt (the spreading mechanism); left-join null semantics hold."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.functions.skew import salted_join
    from ipydataclean_spark.plans import plan_tree

    big = spark.range(0, 100_000).select(
        F.when(F.col("id") < 90_000, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 40)], "k LONG, name STRING"
    )
    saved_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = salted_join(big, small, "k", salt_n=8)
        plain = big.join(small, "k")
        assert got.count() == plain.count()
        a = got.agg(F.sum("payload"), F.count(F.lit(1))).first()
        b = plain.agg(F.sum("payload"), F.count(F.lit(1))).first()
        assert tuple(a) == tuple(b)
        explained = got._jdf.queryExecution().executedPlan().toString()
        assert "__salt" in explained, explained[:2000]
        assert any("Join" in l for l in plan_tree(got))

        # left join keeps unmatched big rows exactly once
        left = salted_join(big, small, "k", salt_n=8, how="left")
        assert left.count() == big.count()
        assert left.where(F.col("name").isNull()).count() == big.join(
            small, "k", "left_anti"
        ).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_bc)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="inner/left"):
        salted_join(big, small, "k", how="full")


def test_salted_join_sf1_hot_custkey_aqe_off(spark):
    """salted_join at sf1 with AQE fully OFF (VERDICT r04 #8): the
    regime skew.py exists for — no runtime skew-split rescue, a
    deliberately hot o_custkey carrying ~90% of 1.5M orders. Pins
    (a) aggregate equality with the plain join, and (b) the spreading
    mechanism itself: the hot key's rows must actually land on all
    salt_n salts with bounded imbalance, not just carry a salt column."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.functions.skew import salted_join

    sf1 = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "localdata", "sf1")
    if not os.path.isdir(sf1):
        pytest.skip("sf1 fixture not generated (tools/gen_sf1.py)")
    saved_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    saved_bc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        salt_n = 16
        big = load_table(spark, sf1, "orders").select(
            F.when(F.col("o_orderkey") % 10 < 9, F.lit(7))
            .otherwise(F.col("o_custkey"))
            .alias("c_custkey"),
            F.col("o_totalprice").alias("payload"),
        )
        small = load_table(spark, sf1, "customer").select(
            "c_custkey", "c_nationkey"
        )
        got = salted_join(big, small, "c_custkey", salt_n=salt_n)
        plain = big.join(small, "c_custkey")
        a = got.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("payload").cast("decimal(28,6)")).alias("s"),
            F.sum("c_nationkey").alias("nk"),
        ).first()
        b = plain.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("payload").cast("decimal(28,6)")).alias("s"),
            F.sum("c_nationkey").alias("nk"),
        ).first()
        assert tuple(a) == tuple(b)
        # the hot key's ~1.35M rows must spread across ALL salts with
        # bounded imbalance — the property that kills the straggler
        from ipydataclean_spark.functions.skew import SALT

        salt_big = F.pmod(
            F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt_n)
        )
        dist = (
            big.where(F.col("c_custkey") == 7)
            .withColumn(SALT, salt_big.cast("int"))
            .groupBy(SALT)
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        counts = {r[SALT]: r.n for r in dist}
        assert len(counts) == salt_n, f"hot key used only salts {sorted(counts)}"
        assert max(counts.values()) < 2 * min(counts.values()), counts
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved_bc)


def test_ignore_corrupt_files_read(spark, tmp_path):
    """A 100 TB lake WILL contain a torn file eventually: with
    spark.sql.files.ignoreCorruptFiles the scan survives and returns
    every healthy row; without it the same scan fails loudly — both
    behaviors pinned so the recovery knob is a tested capability, not
    folklore."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    path = str(tmp_path / "t")
    spark.range(0, 100).select(F.col("id").alias("k")).repartition(2).write.parquet(path)
    with open(f"{path}/part-corrupt.parquet", "wb") as f:
        f.write(b"PAR1 this is not really a parquet file")
    prev = spark.conf.get("spark.sql.files.ignoreCorruptFiles", "false")
    try:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "false")
        with _pytest.raises(Exception):
            spark.read.parquet(path).count()
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
        assert spark.read.parquet(path).count() == 100
    finally:
        spark.conf.set("spark.sql.files.ignoreCorruptFiles", prev)
