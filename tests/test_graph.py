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
