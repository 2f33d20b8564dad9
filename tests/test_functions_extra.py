"""Semantic pins for the rows-only function families + approx error
bounds + skew-salting and foreachBatch patterns."""

import tempfile

from pyspark.sql import functions as F

from ipydataclean_spark.registry import QUERIES, load_all

load_all()


def test_map_functions_semantics(spark, sf_dir):
    rows = QUERIES["f_map_functions"]["fn"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.keys_sorted == "src,type,user"
        assert r.entry_keys == "src,type,user"
        assert r.map_size == 3
        assert r.roundtrip_keys == "src,type,user"
        assert r.type_val in ("click", "view", "purchase", "signup", "error")


def test_misc_string_semantics(spark, sf_dir):
    rows = {r.c_custkey: r for r in QUERIES["f_misc_string"]["fn"](spark, sf_dir).collect()}
    r = rows[100]
    assert r.segment_title == r.segment_title.title()
    assert len(r.segment_soundex) == 4 and r.segment_soundex[0].isalpha()
    assert r.formatted.startswith("cust-00100 [")
    assert r.repeated == "ababab"
    assert r.overlaid.startswith("XXX")


def test_approx_profile_error_bounds(spark, sf_dir):
    """Approx distinct within 3×rsd of exact; approx median within 1%
    of exact (10k accuracy on 60k rows)."""
    approx = QUERIES["p3b_approx_profile"]["fn"](spark, sf_dir).first()
    from ipydataclean_spark.catalog import load_table

    li = load_table(spark, sf_dir, "lineitem")
    exact = li.agg(
        F.countDistinct("l_partkey"), F.countDistinct("l_orderkey"),
        F.expr("percentile(l_extendedprice, 0.5)"),
    ).first()
    assert abs(approx.approx_d_partkey - exact[0]) / exact[0] <= 0.06
    assert abs(approx.approx_d_orderkey - exact[1]) / exact[1] <= 0.06
    assert abs(approx.approx_med_price - exact[2]) / exact[2] <= 0.01
    assert approx.approx_q25 < approx.approx_med_price < approx.approx_q75


def test_salted_skew_join_equals_plain(spark, sf_dir):
    """Salting pattern: explode the hot key into N salted sub-keys on
    the build side, randomize salt on the probe side — result equality
    with the plain join (the manual fallback when AQE skew-split isn't
    enough)."""
    from ipydataclean_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    # make a skewed probe: all 'click' events share hot key 0
    probe = ev.select(
        F.when(F.col("event_type") == "click", 0).otherwise(F.col("user_id")).alias("k"),
        "value",
    )
    dim = spark.range(60).select(F.col("id").alias("k"), (F.col("id") * 2).alias("w"))
    plain = probe.join(dim, "k").agg(F.count("*").alias("n"), F.sum("w").alias("s")).first()

    n_salt = 8
    salted_probe = probe.withColumn("salt", (F.xxhash64("value") % n_salt + n_salt) % n_salt)
    salted_dim = dim.withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    salted = (
        salted_probe.join(salted_dim, ["k", "salt"])
        .agg(F.count("*").alias("n"), F.sum("w").alias("s"))
        .first()
    )
    assert (salted.n, salted.s) == (plain.n, plain.s)


def test_foreachbatch_sink(spark, sf_dir):
    """ST9 foreachBatch: custom per-microbatch sink logic (the escape
    hatch for sinks Structured Streaming lacks natively)."""
    from ipydataclean_spark.streaming.stream import events_stream

    with tempfile.TemporaryDirectory() as d:
        out_dir = f"{d}/out"

        def write_batch(batch_df, batch_id):
            (
                batch_df.groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"))
                .withColumn("batch_id", F.lit(batch_id))
                .write.mode("append")
                .parquet(out_dir)
            )

        q = (
            events_stream(spark, sf_dir)
            .writeStream.foreachBatch(write_batch)
            .option("checkpointLocation", f"{d}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.read.parquet(out_dir).agg(F.sum("n")).first()[0]
        from ipydataclean_spark.catalog import load_table

        assert got == load_table(spark, sf_dir, "events").count()


def test_hash_misc_determinism_and_uniqueness(spark, sf_dir):
    q = QUERIES["f_hash_misc"]["fn"]
    a = q(spark, sf_dir).collect()
    b = q(spark, sf_dir).collect()
    # content hashes are deterministic across runs
    assert [(r.c_custkey, r.name_crc32, r.name_xxh64, r.row_hash) for r in a] == [
        (r.c_custkey, r.name_crc32, r.name_xxh64, r.row_hash) for r in b
    ]
    # generated ids are unique within a run (uniqueness, not stability)
    assert len({r.mono_id for r in a}) == len(a)
    assert len({r.row_uuid for r in a}) == len(a)


def test_group_regression_exact_line(spark):
    # y = 3x + 2 exactly -> slope 3, intercept 2, r2 = 1
    import ipydataclean_spark.operators.functions_stats  # noqa: F401
    from ipydataclean_spark.functions import exact

    df = spark.createDataFrame(
        [(float(x), 3.0 * x + 2.0) for x in range(1, 8)], "x double, y double"
    )
    x, y = F.col("x"), F.col("y")
    s = df.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        exact.dsum(x).alias("sx"),
        exact.dsum(y).alias("sy"),
        exact.dsum(x * y).alias("sxy"),
        exact.dsum(x * x).alias("sxx"),
        exact.dsum(y * y).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    num = n * F.col("sxy") - sx * sy
    den = n * F.col("sxx") - sx * sx
    row = s.select(
        F.round(num / den, 8).alias("slope"),
        F.round((sy - sx * (num / den)) / n, 8).alias("intercept"),
        F.round((num * num) / (den * (n * F.col("syy") - sy * sy)), 8).alias("r2"),
    ).collect()[0]
    assert row["slope"] == 3.0 and row["intercept"] == 2.0 and row["r2"] == 1.0


def test_weighted_median_known_weights(spark, sf_dir):
    # values 10(w1), 20(w1), 30(w5): half the total weight (3.5) is
    # reached inside the 30 block -> weighted median 30
    from ipydataclean_spark.operators.groupstats import p27_weighted_median  # noqa: F401
    from pyspark.sql import Window

    df = spark.createDataFrame(
        [("g", 10.0, 1.0), ("g", 20.0, 1.0), ("g", 30.0, 5.0)],
        "grp string, price double, qty double",
    )
    pw = df.groupBy("grp", "price").agg(
        F.sum(F.col("qty").cast("decimal(28,6)")).alias("w")
    )
    wc = Window.partitionBy("grp").orderBy("price")
    wt = Window.partitionBy("grp")
    c = pw.select(
        "grp", "price",
        F.sum("w").over(wc).alias("cw"), F.sum("w").over(wt).alias("tw"),
    )
    row = (
        c.groupBy("grp")
        .agg(F.min(F.when(F.lit(2) * F.col("cw") >= F.col("tw"), F.col("price"))).alias("m"))
        .collect()[0]
    )
    assert row["m"] == 30.0
    # and the registered fixture query returns one row per returnflag
    out = p27_weighted_median(spark, sf_dir).collect()
    assert len(out) == 3 and all(r["weighted_median_price"] is not None for r in out)


# ---------------------------------------------------------------------------
# functions/ranking.py — distributed global rank/ntile equivalence
# ---------------------------------------------------------------------------


def test_global_rank_matches_window_row_number(spark):
    """The distributed rank (range partition + offsets) must be
    BIT-identical to row_number() over a global window, including a
    running decimal sum — on data with duplicates in the sort key and
    a non-trivial partition count."""
    from pyspark.sql import Window

    from ipydataclean_spark.functions.ranking import with_global_rank

    df = spark.range(0, 5000).select(
        F.col("id").alias("k"),
        (F.col("id") % 97).alias("v"),          # heavy ties in sort key
        (F.col("id") % 7).cast("double").alias("x"),
    ).repartition(13)
    order = [F.desc("v"), F.asc("k")]
    got = with_global_rank(
        df, order, out="rnk",
        running_sums={"cum": F.col("x").cast("decimal(28,6)")},
    ).select("k", "rnk", F.col("cum").cast("double").alias("cum"))

    w = Window.orderBy(*order)
    want = df.select(
        "k",
        F.row_number().over(w).alias("rnk"),
        F.sum(F.col("x").cast("decimal(28,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("double")
        .alias("cum"),
    )
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


def test_global_ntile_matches_window_ntile(spark):
    """NTILE(k) from the exact rank formula == engine NTILE for sizes
    that exercise both uneven tiles (n % k != 0) and n < k."""
    from pyspark.sql import Window

    from ipydataclean_spark.functions.ranking import with_global_ntile

    for n, k in ((1003, 7), (40, 40), (5, 8), (64, 8)):
        df = spark.range(0, n).select(
            F.col("id").alias("key"), (F.col("id") * 37 % 101).alias("m")
        )
        order = [F.desc("m"), F.asc("key")]
        got = with_global_ntile(df, order, k, "t").select("key", "t")
        want = df.select(
            "key", F.ntile(k).over(Window.orderBy(*order)).cast("int").alias("t")
        )
        diff = got.join(want.withColumnRenamed("t", "t2"), "key").where(
            F.col("t") != F.col("t2")
        )
        assert diff.count() == 0, (n, k)
