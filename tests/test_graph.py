"""PageRank identity checks (operators/graph.py) — the rows-only op's
semantics are pinned here since no SQL twin exists."""

import pytest
from pyspark.sql import functions as F

from ipydataclean_spark.operators.graph import pagerank
from ipydataclean_spark.registry import QUERIES, load_all

load_all()


def test_pagerank_known_graph(spark):
    """Star graph: hub b receives from a,c,d; ranks must match the
    hand-derived fixed point and conserve total mass."""
    edges = spark.createDataFrame(
        [(1, 2), (3, 2), (4, 2), (2, 1)], ["src", "dst"]
    )
    r = {row.node: row.rank for row in pagerank(edges, 0.85, iterations=40).collect()}
    total = sum(r.values())
    assert total == pytest.approx(4.0, rel=1e-6)  # mass conservation
    # hub dominates; spokes 3,4 (no in-edges beyond teleport) are equal and lowest
    assert r[2] > r[1] > r[3]
    assert r[3] == pytest.approx(r[4], rel=1e-12)
    # closed-form check: spokes get pure teleport = 0.15
    assert r[3] == pytest.approx(0.15, rel=1e-9)


def test_pagerank_dangling_mass_conserved(spark):
    """2 -> nothing (dangling): total rank must still equal n_nodes."""
    edges = spark.createDataFrame([(1, 2)], ["src", "dst"])
    r = pagerank(edges, 0.85, iterations=30)
    total = r.agg(F.sum("rank")).first()[0]
    assert total == pytest.approx(2.0, rel=1e-6)


def test_pagerank_fixture_query(spark, sf_dir):
    out = QUERIES["g1_pagerank"]["fn"](spark, sf_dir)
    rows = out.collect()
    assert len(rows) == 25
    assert all(rows[i].rank >= rows[i + 1].rank for i in range(len(rows) - 1))


def test_degree_oriented_triangles_equal_id_oriented(spark, sf_dir):
    """g2b (forward-algorithm orientation) must enumerate EXACTLY the
    triangle set of g2 (id orientation) — same graph, different
    generation order."""
    from ipydataclean_spark.operators.graph import (
        g2_triangle_count,
        g2b_triangles_degree_oriented,
    )

    a = {tuple(r) for r in g2_triangle_count(spark, sf_dir).collect()}
    b = {tuple(r) for r in g2b_triangles_degree_oriented(spark, sf_dir).collect()}
    assert a == b and a, f"id-oriented {len(a)} vs degree-oriented {len(b)}"


def test_er1_golden_records_semantics(spark):
    """er1: every input record belongs to exactly one cluster (member
    counts sum to the subset size), each canonical is a member of its
    own cluster with the maximal account balance, and multi-member
    clusters exist (the pipeline actually merges records here —
    at the driver's oracle scale sf0.01; the sf0.001 %50 subset has
    only 3 customers and no matches)."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.registry import QUERIES, load_all

    sf_dir = "/root/testdata/sf0.01"
    load_all()
    rows = QUERIES["er1_entity_resolution"]["fn"](spark, sf_dir).collect()
    assert rows
    sub = {
        r.c_custkey: r.c_acctbal
        for r in load_table(spark, sf_dir, "customer")
        .where(F.col("c_custkey") % 50 == 0)
        .select("c_custkey", "c_acctbal")
        .collect()
    }
    assert sum(r.n_members for r in rows) == len(sub)
    assert any(r.n_members > 1 for r in rows)
    for r in rows:
        assert r.canonical_key in sub
        assert r.canonical_acctbal == sub[r.canonical_key]
        assert r.cluster_id <= r.canonical_key  # cluster id = min member
