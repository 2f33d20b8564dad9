"""Iterative graph algorithm over DataFrames — PageRank on the
customer↔supplier trade graph.

Why it's here: SURVEY.md §5.2 carves out "iterative algorithms" as
the non-SQL-expressible class (the driver's weaker rows-only check);
llm_extra.cluster_pairs already iterates connected components
(large-star/small-star) for dedup clustering. PageRank is the canonical second shape: a
fixed-point loop where each step is a join + aggregate, i.e. exactly
what Spark's DAG scheduler pipelines. Everything stays declarative —
the loop composes lazy plans and localCheckpoints per iteration to
cut lineage (at 100 TB the per-iteration shuffle is rank-table-sized,
not fact-table-sized: edges are derived once and cached).

Determinism: rank sums route through DECIMAL (functions/exact.py
rationale) so results are independent of partitioning — bit-stable
across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register

DEC = "decimal(28,18)"


def pagerank(
    edges: DataFrame, damping: float = 0.85, iterations: int = 10
) -> DataFrame:
    """PageRank with uniform teleport over a directed edge list
    (src BIGINT, dst BIGINT). Returns (node, rank). Dangling mass is
    redistributed uniformly each step so total rank stays = n_nodes.

    Round-13 restructure (guide §1.2 "the distributed algorithm";
    values bit-identical — decimal sums are order-independent and the
    restructured dangling term sums exactly the same row set):

    * the dangling-node SET is iteration-invariant — it is now a flag
      computed once on the cached node table, and the per-iteration
      dangling mass is a filter+agg over the node-sized rank table.
      Previously the term re-derived ``out_deg`` from the RAW edge
      lineage (the full upstream join/distinct!) inside a left_anti
      join EVERY iteration — measured as most of g1's 25 s at sf0.1.
    * per-edge contributions sum through the int128 decimal fast path
      (functions/exact.dsum_scaled) when the fastagg jar is present —
      the per-row BigDecimal add + CheckOverflow + UnsafeRow write was
      the remaining per-iteration CPU. Fallback computes the identical
      value on the built-in path.
    """
    from ipydataclean_spark.functions.exact import dsum_scaled

    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .cache()
    )
    n_nodes = nodes.count()
    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    # out-degree is consulted every iteration: attach once, cache.
    e = edges.join(out_deg, "src").select("src", "dst", "out_deg").cache()
    e.count()
    # dangling flag: node has no out-edges. Node-sized, cached — the
    # per-iteration dangling-mass term never touches edges again.
    nd = (
        nodes.join(
            out_deg.select(F.col("src").alias("node"), F.lit(1).alias("__has_out")),
            "node",
            "left",
        )
        .select("node", F.col("__has_out").isNull().cast("int").alias("__dang"))
        .cache()
    )
    nd.count()
    ranks = nd.withColumn("rank", F.lit(1.0))
    # rank table = one row per node. Below ~10M nodes broadcast it so
    # the per-iteration join is map-side over the CACHED edge table
    # (zero edge shuffle per iteration); above that, Spark's planner
    # shuffles both sides — the standard Pregel-style regime.
    bcast = n_nodes < 10_000_000
    for _ in range(iterations):
        ranks_j = (
            F.broadcast(ranks.select("node", "rank")) if bcast
            else ranks.select("node", "rank")
        )
        contribs = (
            e.join(ranks_j, e.src == ranks_j.node)
            .select(
                F.col("dst").alias("node"),
                (F.col("rank") / F.col("out_deg")).alias("contrib"),
            )
            .groupBy("node")
            .agg(dsum_scaled("contrib", 28, 18).alias("in_sum"))
        )
        # dangling mass, re-spread uniformly: a filter+1-row agg over
        # the node-sized rank table (the __dang flag), broadcast cross
        # join — still INSIDE the plan (no per-iteration driver
        # round-trip), so the fixed point executes as one pipelined
        # job chain.
        dang = (
            ranks.where(F.col("__dang") == 1)
            .agg(
                (
                    F.coalesce(dsum_scaled("rank", 28, 18), F.lit(0.0))
                    / F.lit(float(n_nodes))
                ).alias("dang_share")
            )
        )
        ranks = (
            nd.join(F.broadcast(contribs) if bcast else contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "__dang",
                (
                    F.lit(1.0 - damping)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_sum"), F.lit(0.0)) + F.col("dang_share"))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    ranks = ranks.select("node", "rank")
    # Checkpoint retention is bounded BY DESIGN at ``iterations``
    # rank-table-sized block sets: this loop composes lazily (no
    # action per round — the fixpoint runs as one pipelined job
    # chain), so prior rounds' blocks cannot be freed mid-loop the
    # way the action-per-round cluster_pairs loop frees them; rank
    # tables are node-sized, not edge-sized, so the bounded copies
    # are the cheap side of that trade.
    return ranks


@register("g1_pagerank", oracle=None, tags=("G1",))
def g1_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1: PageRank over the bipartite customer→supplier graph derived
    from lineitem⋈orders (edge = customer bought from supplier;
    supplier nodes NEGATED to disjoin the id spaces at ANY scale
    factor — keys are >= 1, so -l_suppkey can never collide with
    o_custkey, unlike a fixed offset, which some SF always outgrows:
    review r07 on the 1e6->1e9 bump). Top 25 by rank. Rows-only:
    iterative fixed point has no SQL twin; the known-graph identity
    is pinned in tests/test_graph.py."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (-F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    # make it a two-way flow so customers also receive rank
    edges = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank(edges, damping=0.85, iterations=10)
    return ranks.orderBy(F.desc("rank"), "node").limit(25)


_G1B_SCALE = 1_000_000_000  # rank unit = 1e-9 (fits BIGINT at any tested SF)
_G1B_ITERS = 10

_G1B_EDGES_SQL = (
    "SELECT DISTINCT o_custkey AS src, -l_suppkey AS dst "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
    "UNION ALL "
    "SELECT DISTINCT -l_suppkey AS src, o_custkey AS dst "
    "FROM lineitem JOIN orders ON l_orderkey = o_orderkey"
)


def _g1b_oracle() -> str:
    s = _G1B_SCALE
    parts = [
        f"WITH e AS MATERIALIZED ({_G1B_EDGES_SQL}), "
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS node FROM e "
        "UNION SELECT DISTINCT dst FROM e), "
        "nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes), "
        "deg AS MATERIALIZED (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS d "
        "FROM e GROUP BY 1), "
        f"r0 AS MATERIALIZED (SELECT node, CAST({s} AS BIGINT) AS r FROM nodes)"
    ]
    for k in range(1, _G1B_ITERS + 1):
        p = k - 1
        parts.append(
            f", c{k} AS MATERIALIZED (SELECT e.dst AS node, "
            f"CAST(SUM(r.r // d.d) AS BIGINT) AS in_sum "
            f"FROM e JOIN r{p} r ON r.node = e.src "
            "JOIN deg d ON d.node = e.src GROUP BY 1)"
            f", dg{k} AS (SELECT CAST(COALESCE((SELECT SUM(r.r) "
            f"FROM r{p} r LEFT JOIN deg d ON d.node = r.node "
            "WHERE d.node IS NULL), 0) // (SELECT n FROM nn) AS BIGINT) AS dang)"
            f", r{k} AS MATERIALIZED (SELECT n.node, CAST({15 * s // 100} + "
            "(85 * (COALESCE(c.in_sum, 0) + dg.dang)) // 100 AS BIGINT) AS r "
            f"FROM nodes n LEFT JOIN c{k} c ON c.node = n.node "
            f"CROSS JOIN dg{k} dg)"
        )
    parts.append(
        f" SELECT node, r AS rank_e9 FROM r{_G1B_ITERS} "
        "ORDER BY r DESC, node LIMIT 25"
    )
    return "".join(parts)


@register("g1b_pagerank_fixedpoint", oracle=_g1b_oracle(), tags=("G1",))
def g1b_pagerank_fixedpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G1 ORACLE-CERTIFIED PageRank: the same graph and damping as g1
    but in FIXED-POINT INTEGER arithmetic (rank unit 1e-9, integral
    `div`, the 0.85 damping as `(85 * x) div 100` — safe in BIGINT at
    the 1e-9 unit, see the headroom note below) so every iteration is
    EXACT and order-independent in both engines — no float summation
    order to drift. The DuckDB twin UNROLLS the 10 iterations as a generated
    CTE chain (r0..r10): iterative fixpoints are certifiable once the
    per-step arithmetic is integer, which is the certification trick
    this query exists to pin (g1 stays the production form: decimal-
    summed float ranks, rows-only + known-graph identity test).
    Overflow headroom: total mass = n_nodes x 1e9 ~ 1.6e14 at sf1,
    x85 well under 2^63; a 100 TB graph would re-derive the unit or
    use g1's decimal path. Dangling-mass term kept (exercised by the
    synthetic test in tests/test_extras_r6.py, not by this doubled
    bipartite graph where every node has out-edges)."""
    li = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    o = T(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    fwd = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.col("o_custkey").alias("src"),
            (-F.col("l_suppkey")).alias("dst"),
        )
        .distinct()
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    ranks = pagerank_fixedpoint(edges, iterations=_G1B_ITERS)
    return (
        ranks.select("node", F.col("r").alias("rank_e9"))
        .orderBy(F.desc("rank_e9"), "node")
        .limit(25)
    )


def pagerank_fixedpoint(edges: DataFrame, iterations: int = 10) -> DataFrame:
    """(node, r): exact integer PageRank (see g1b docstring). Shapes
    match pagerank(): per-iteration work is rank-table-sized joins;
    lineage cut per round via lazy localCheckpoint.

    Round-13 restructure, mirroring pagerank() (results identical —
    integer sums over identical row sets): out-degree is attached to
    the edge table ONCE (it was a groupBy re-run from the checkpointed
    edges inside BOTH the contribution join and the dangling anti-join
    every iteration — 2 extra edge-table passes per round), and the
    dangling-node set is an iteration-invariant flag on the node table
    instead of a per-round left_anti join."""
    edges = edges.localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("d"))
    e = (
        edges.join(deg, "src")
        .select("src", "dst", "d")
        .localCheckpoint(eager=False)
    )
    nd = (
        nodes.join(
            deg.select(F.col("src").alias("node"), F.lit(1).alias("__has_out")),
            "node",
            "left",
        )
        .select("node", F.col("__has_out").isNull().cast("int").alias("__dang"))
        .localCheckpoint(eager=False)
    )
    nn = nodes.agg(F.count(F.lit(1)).cast("long").alias("n"))
    # ONE setup action (the count also materializes the node
    # checkpoint): below ~10M nodes the rank table broadcasts, so each
    # iteration's contribution join is map-side over the checkpointed
    # edge table — without the hint the planner's unknown-size estimate
    # for the checkpointed rank table picked a sort-merge join that
    # re-shuffled the EDGE table every round (measured 34-50 s vs 19 s
    # for the float twin at sf1). Same regime switch as pagerank().
    n_nodes = nodes.count()
    bcast = n_nodes < 10_000_000
    ranks = nd.select("node", "__dang", F.lit(_G1B_SCALE).cast("long").alias("r"))
    base = F.lit(15 * _G1B_SCALE // 100).cast("long")
    for _ in range(iterations):
        ranks_j = ranks.select(F.col("node").alias("src"), "r")
        contribs = (
            e.join(F.broadcast(ranks_j) if bcast else ranks_j, "src")
            .select(F.col("dst").alias("node"), F.expr("r div d").alias("contrib"))
            .groupBy("node")
            .agg(F.sum("contrib").cast("long").alias("in_sum"))
        )
        dang = (
            ranks.where(F.col("__dang") == 1)
            .agg(F.coalesce(F.sum("r"), F.lit(0)).cast("long").alias("dm"))
            .crossJoin(F.broadcast(nn))
            .select(F.expr("dm div n").cast("long").alias("dang"))
        )
        ranks = (
            nd.join(F.broadcast(contribs) if bcast else contribs, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node",
                "__dang",
                (
                    base
                    + F.expr("(85 * (COALESCE(in_sum, 0) + dang)) div 100")
                ).cast("long").alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks.select("node", "r")


@register(
    "g2_triangle_count",
    oracle=(
        "WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
        "e AS (SELECT a.l_partkey AS x, b.l_partkey AS y "
        "FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey "
        "GROUP BY 1, 2 HAVING COUNT(*) >= 2) "
        "SELECT e1.x AS part_a, e1.y AS part_b, e2.y AS part_c "
        "FROM e e1 JOIN e e2 ON e1.y = e2.x "
        "JOIN e e3 ON e1.x = e3.x AND e2.y = e3.y "
        "ORDER BY part_a, part_b, part_c"
    ),
    tags=("G2", "analytics"),
)
def g2_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2: triangle enumeration on the part co-occurrence graph
    (edges = part pairs bought together in ≥ 2 orders) — the
    clustering-coefficient / community primitive, and the canonical
    non-iterative graph query (vs g1's fixed-point PageRank).

    The REGISTERED plan is the degree-oriented forward algorithm
    (shared with g2b; VERDICT r03 #5 promoted it after the id-ordered
    edge-iterator variant went 13.3× at a 10× scale-up — id-ordering
    can leave a low-id hub with out-degree ≈ its full degree, while
    (degree, id)-ordering bounds wedge fanout by O(√m) on power-law
    graphs). The oracle stays the simpler id-ordered 3-way join SQL:
    both forms enumerate the identical triangle set."""
    return _triangles_degree_oriented(spark, sf_dir)


@register(
    "g2b_triangles_degree_oriented",
    oracle=(
        "WITH items AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem), "
        "e AS (SELECT a.l_partkey AS x, b.l_partkey AS y "
        "FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey "
        "AND a.l_partkey < b.l_partkey "
        "GROUP BY 1, 2 HAVING COUNT(*) >= 2), "
        "deg AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS d FROM "
        "(SELECT x AS v FROM e UNION ALL SELECT y AS v FROM e) GROUP BY v), "
        "o AS (SELECT CASE WHEN (dx.d, e.x) < (dy.d, e.y) THEN e.x ELSE e.y END AS u, "
        "CASE WHEN (dx.d, e.x) < (dy.d, e.y) THEN e.y ELSE e.x END AS v "
        "FROM e JOIN deg dx ON dx.v = e.x JOIN deg dy ON dy.v = e.y), "
        "wedge AS (SELECT o1.u, o1.v AS b, o2.v AS c FROM o o1 JOIN o o2 "
        "ON o1.u = o2.u AND o1.v < o2.v), "
        "tri AS (SELECT w.u, w.b, w.c FROM wedge w JOIN o ON "
        "((o.u = w.b AND o.v = w.c) OR (o.u = w.c AND o.v = w.b))) "
        "SELECT LEAST(u, b, c) AS part_a, "
        "u + b + c - LEAST(u, b, c) - GREATEST(u, b, c) AS part_b, "
        "GREATEST(u, b, c) AS part_c FROM tri "
        "ORDER BY part_a, part_b, part_c"
    ),
    tags=("G2", "analytics"),
)
def g2b_triangles_degree_oriented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G2b: the SCALE form of triangle enumeration — edges oriented
    from the (degree, id)-SMALLER endpoint to the larger one before
    the wedge join (public method: Schank-Wagner / Latapy
    forward-algorithm). Every triangle is generated exactly once, at
    its (deg,id)-minimal vertex, and wedge fanout is bounded by
    out-degree ≤ O(√m) instead of a hub's full degree — the property
    that makes triangle counting feasible on power-law graphs at
    100 TB (g2's id-ordering can leave a low-id hub with out-degree ≈
    its full degree; degree-ordering cannot). Same triangle set as
    g2, canonicalized back to part_a < part_b < part_c.

    Plan: degree table (one groupBy over the edge list), broadcast-
    joined orientation (degree table is vertex-sized), wedge self-join
    keyed on the source vertex, closing-edge semi-probe keyed on the
    wedge endpoints — every join on a single part key."""
    return _triangles_degree_oriented(spark, sf_dir)


def _triangles_degree_oriented(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared body of g2/g2b — see g2b's docstring for the method."""
    items = T(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()
    a = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("x"))
    b = items.select(F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("y"))
    e = (
        a.join(b, "ok")
        .where(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
        .select("x", "y")
    )
    deg = (
        e.select(F.col("x").alias("v"))
        .unionByName(e.select(F.col("y").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    dx = deg.select(F.col("v").alias("x"), F.col("d").alias("dx"))
    dy = deg.select(F.col("v").alias("y"), F.col("d").alias("dy"))
    x_first = (F.col("dx") < F.col("dy")) | (
        (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y"))
    )
    o = (
        e.join(F.broadcast(dx), "x")
        .join(F.broadcast(dy), "y")
        .select(
            F.when(x_first, F.col("x")).otherwise(F.col("y")).alias("u"),
            F.when(x_first, F.col("y")).otherwise(F.col("x")).alias("v"),
        )
    )
    o1 = o.select("u", F.col("v").alias("b"))
    o2 = o.select("u", F.col("v").alias("c"))
    wedge = o1.join(o2, "u").where(F.col("b") < F.col("c"))
    closing = o.select(F.col("u").alias("b"), F.col("v").alias("c")).unionByName(
        o.select(F.col("u").alias("c"), F.col("v").alias("b"))
    )
    tri = wedge.join(closing, ["b", "c"], "leftsemi")
    lo = F.least("u", "b", "c")
    hi = F.greatest("u", "b", "c")
    return (
        tri.select(
            lo.alias("part_a"),
            (F.col("u") + F.col("b") + F.col("c") - lo - hi).alias("part_b"),
            hi.alias("part_c"),
        )
        .orderBy("part_a", "part_b", "part_c")
    )
