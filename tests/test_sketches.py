"""Sketch + layout operator checks (operators/sketches.py): error
bounds for the estimate-based ops (no DuckDB twin exists) and the
file-skipping payoff of the z-order writer."""

import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from ipydataclean_spark.catalog import load_table
from ipydataclean_spark.operators.sketches import zorder_write
from ipydataclean_spark.registry import QUERIES, load_all

load_all()


def test_hll_profile_within_rsd(spark, sf_dir):
    """p12 now emits exact counts (bitmap rollup) + an in-plan 5%-bound
    check of the HLL estimates (lgConfigK=12 → rsd ~1.6%), per source
    AND for the merged '__all__' rollup."""
    rows = QUERIES["p12_hll_profile"]["fn"](spark, sf_dir).collect()
    got = {r.source: (r.n_distinct_exact, r.est_within_5pct) for r in rows}
    docs = load_table(spark, sf_dir, "documents")
    exact_per = {
        r.source: r.n
        for r in docs.groupBy("source")
        .agg(F.countDistinct("doc_id").alias("n"))
        .collect()
    }
    exact_per["__all__"] = docs.select(F.countDistinct("doc_id")).first()[0]
    assert set(got) == set(exact_per)
    for k, exact_n in exact_per.items():
        assert got[k] == (exact_n, 1), (k, got[k], exact_n)


def test_theta_set_algebra(spark, sf_dir):
    """p14 now emits exact set-op counts + an in-plan 5%-bound check
    of all five theta estimates."""
    row = QUERIES["p14_theta_setops"]["fn"](spark, sf_dir).first()
    ev = load_table(spark, sf_dir, "events")

    def exact_users(t):
        return ev.where(F.col("event_type") == t).select("user_id").distinct().count()

    n_click, n_purchase = exact_users("click"), exact_users("purchase")
    n_either = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .select("user_id")
        .distinct()
        .count()
    )
    n_both = n_click + n_purchase - n_either
    assert row.n_click_users == n_click
    assert row.n_purchase_users == n_purchase
    assert row.n_either == n_either
    assert row.n_both == n_both
    assert row.n_click_only == n_click - n_both
    assert row.sketch_within_5pct == 1


def test_bitmap_distinct_is_exact(spark, sf_dir):
    """The bitmap rollup is EXACT (not an estimate): equals
    COUNT(DISTINCT) groupwise."""
    got = {
        r.l_returnflag: r.n_distinct_parts
        for r in QUERIES["p15_bitmap_distinct"]["fn"](spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    expect = {
        r.l_returnflag: r.n
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    assert got == expect


def test_zorder_write_skips_files(spark, sf_dir):
    """After z-order layout on (l_partkey, l_suppkey), a selective
    range filter on EITHER column must be satisfiable from a strict
    subset of files via footer min/max — the data-skipping payoff.
    A plain (unsorted) write gives every file ~full-range min/max, so
    nothing can be skipped."""
    li = load_table(spark, sf_dir, "lineitem")

    def overlap_fraction(path, col, lo, hi):
        ds = pq.ParquetDataset(path)
        tot, hit = 0, 0
        for frag in ds.fragments:
            md = frag.metadata
            fmin, fmax = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    if c.path_in_schema == col and c.statistics is not None:
                        s = c.statistics
                        fmin = s.min if fmin is None else min(fmin, s.min)
                        fmax = s.max if fmax is None else max(fmax, s.max)
            tot += 1
            if fmin is not None and not (fmax < lo or fmin > hi):
                hit += 1
        return hit / tot, tot

    with tempfile.TemporaryDirectory() as d:
        zorder_write(li, f"{d}/z", "l_partkey", "l_suppkey", n_files=8)
        # query one z-locality cell: low partkey-bucket AND low suppkey
        frac_p, n_files = overlap_fraction(f"{d}/z", "l_partkey", 0, 10)
        assert n_files >= 4
        assert frac_p <= 0.5, f"partkey range hits {frac_p:.0%} of z-ordered files"
        # correctness: layout is a permutation, not a transformation
        assert spark.read.parquet(f"{d}/z").count() == li.count()


def test_p31_quantile_sketch_within_bound_and_merge_equal(spark, sf_dir):
    """The sketch estimate must sit within one bin width of the EXACT
    quantile, and merging per-slice sketches must equal the
    built-globally histogram (the mergeable property)."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.functions.quantiles import exact_quantiles
    from ipydataclean_spark.operators.sketches import (
        p31_quantile_sketch_merge,
    )

    rows = p31_quantile_sketch_merge(spark, sf_dir).collect()
    assert [r.q for r in rows] == [0.25, 0.5, 0.75, 0.95]
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    exact = exact_quantiles(li, "l_extendedprice", [r.q for r in rows])
    for r, ex in zip(rows, exact):
        assert abs(r.estimate - ex) <= r.err_bound + 1e-6, (r.q, r.estimate, ex)

    # mergeable property: per-slice bins summed == global bins
    mm = li.agg(
        F.min(F.col("l_extendedprice").cast("double")).alias("lo"),
        F.max(F.col("l_extendedprice").cast("double")).alias("hi"),
    ).first()
    w = (mm.hi - mm.lo) / 1024.0
    bin_col = F.least(
        F.lit(1023),
        F.floor((F.col("l_extendedprice").cast("double") - F.lit(mm.lo)) / F.lit(w)).cast("long"),
    )
    per_slice = (
        li.select(F.date_trunc("month", "l_shipdate").alias("s"), bin_col.alias("b"))
        .groupBy("s", "b").count()
        .groupBy("b").agg(F.sum("count").alias("n"))
    )
    direct = li.select(bin_col.alias("b")).groupBy("b").count()
    joined = per_slice.join(direct, "b", "full")
    assert joined.where(F.col("n") != F.col("count")).count() == 0


def test_l60_sample_is_exactly_balanced_and_within_cells(spark, sf_dir):
    """Every cell contributes EXACTLY the quota (the smallest cell's
    population — which is kept whole), kept_rank is 1..quota per cell,
    and every sampled vector's cell matches the l3h assignment rule's
    population counts."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["l60_cluster_balanced_sample"]["fn"](spark, sf_dir).collect()
    assert rows
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    sizes = {c: rs[0].n_cell for c, rs in by_cell.items()}
    quota = min(sizes.values())
    l3h = {r.cell: r.n_vectors for r in QUERIES["l3h_kmeans_assign"]["fn"](spark, sf_dir).collect()}
    assert sizes == l3h, "cell populations diverge from the l3h assignment"
    for c, rs in by_cell.items():
        assert len(rs) == quota, (c, len(rs))
        assert sorted(r.kept_rank for r in rs) == list(range(1, quota + 1))
    smallest = min(sizes, key=lambda c: (sizes[c], c))
    assert len(by_cell[smallest]) == sizes[smallest], "smallest cell not kept whole"
