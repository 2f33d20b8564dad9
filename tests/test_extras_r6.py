"""Round-6 regression tests: the r8b sparse-week edge (VERDICT r05 #2)
and the l36 uncapped-K scale gate (VERDICT r05 #3). Oracle parity is
covered by tools/verify_local.py + the driver; these pin the semantics
the sf0.01 fixture cannot reach."""

import datetime
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

SF1_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "localdata", "sf1"
)


def test_r8b_keeps_zero_match_orders_in_nonempty_buckets(spark, tmp_path):
    """An order whose week bucket(s) DO contain lineitems but none
    inside [o_orderdate, o_orderdate+7) must still aggregate to n=0 —
    the old post-join filter dropped it entirely, diverging from the
    naive-join oracle on sparse data (latent on the dense fixture,
    where every 1995 week has shipments)."""
    from ipydataclean_spark.operators.relational import r8b_range_join_bucketed

    d = datetime.date
    orders = spark.createDataFrame(
        [
            # both of its buckets hold lineitems, but every candidate
            # fails the exact range -> must count 0, not vanish
            Row(o_orderkey=1, o_orderdate=d(1995, 1, 2)),
            # one real match
            Row(o_orderkey=2, o_orderdate=d(1995, 2, 1)),
            # buckets entirely empty -> counts 0 through the left join
            Row(o_orderkey=3, o_orderdate=d(1995, 3, 1)),
        ]
    )
    lineitem = spark.createDataFrame(
        [
            Row(l_orderkey=10, l_shipdate=d(1994, 12, 30)),  # wk of order 1, before it
            Row(l_orderkey=11, l_shipdate=d(1995, 1, 10)),   # wk of order 1 + 6d, after range
            Row(l_orderkey=12, l_shipdate=d(1995, 2, 3)),    # in order 2's range
        ]
    )
    orders.write.parquet(str(tmp_path / "orders.parquet"))
    lineitem.write.parquet(str(tmp_path / "lineitem.parquet"))

    rows = r8b_range_join_bucketed(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.y == 1995
    assert r.n_orders == 3, (
        "zero-match order in a non-empty bucket was dropped (n_orders="
        f"{r.n_orders})"
    )
    assert r.total_pairs == 1
    assert float(r.avg_per_order) == pytest.approx(round(1 / 3, 8))


def test_l36_sf1_cells_uncapped_and_bounded(spark):
    """The SemDeDup cell layout at 10x data (VERDICT r05 #3): K must
    track the corpus (NOT clamp at 64) while |cell| stays bounded —
    the pair join is sum-over-cells |cell|^2, so these two facts
    together are what keep it ~linear at scale."""
    if not os.path.isdir(SF1_DIR):
        pytest.skip("sf1 fixture not generated (tools/gen_sf1.py)")
    from ipydataclean_spark.operators.ivf import semdedup_assign

    sizes = (
        semdedup_assign(spark, SF1_DIR)
        .groupBy("cell")
        .count()
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.max("count").alias("max_cell"),
            F.sum("count").alias("n_vectors"),
        )
        .first()
    )
    # 24000 dup-corpus vectors / 75 = 320 target cells; the old clamp
    # would leave 64 cells of ~375 mean
    assert sizes.n_cells > 64, f"K clamped: only {sizes.n_cells} cells"
    assert sizes.n_vectors / sizes.n_cells <= 80  # mean |cell| ~75 by construction
    # seed cells are uneven but must stay O(100), not grow with n
    # (measured max 480 at sf1)
    assert sizes.max_cell <= 600, f"cell overflow: {sizes.max_cell}"


def test_salted_sum_sf1_hot_key_aqe_off(spark):
    """Aggregation-side skew at sf1 with AQE fully OFF (VERDICT r05
    #6, carried from r4 #8): salted_sum on a deliberately hot key
    (~90% of 6M lineitems collapsed onto one group) must equal the
    direct groupBy exactly — AQE skew handling covers joins only, so
    this two-stage spread is the mechanism that survives an
    aggregation hot key at 100 TB. The join side is pinned by
    test_scale_patterns.test_salted_join_sf1_hot_custkey_aqe_off."""
    if not os.path.isdir(SF1_DIR):
        pytest.skip("sf1 fixture not generated (tools/gen_sf1.py)")
    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.operators.groupstats import salted_sum

    saved_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        li = load_table(spark, SF1_DIR, "lineitem").select(
            F.when(F.col("l_orderkey") % 10 < 9, F.lit(7))
            .otherwise(F.col("l_suppkey"))
            .alias("k"),
            "l_extendedprice",
        )
        got = {
            r.k: r.total
            for r in salted_sum(
                li, "k", F.col("l_extendedprice"), "total", salt_n=16
            ).collect()
        }
        want = {
            r.k: r.total
            for r in li.groupBy("k")
            .agg(
                F.sum(F.col("l_extendedprice").cast("decimal(28,6)"))
                .cast("double")
                .alias("total")
            )
            .collect()
        }
        assert got == want  # decimal partials -> bit-identical doubles
        assert len(got) > 1000  # hot key PLUS a real long tail
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", saved_aqe)


def test_scratch_sweep_prunes_stale_sibling(spark, tmp_path, monkeypatch):
    """qhelp.scratch_dir's 24 h TTL sweep (VERDICT r05 #7): a
    back-dated same-prefix sibling from a dead session is pruned, a
    fresh sibling (possible concurrent session) survives, an
    unrelated-prefix stale dir is untouched, and the current appId
    path comes back cleared."""
    import time

    from ipydataclean_spark.operators import qhelp

    base = tmp_path / "spark-warehouse"
    base.mkdir()
    monkeypatch.setattr(qhelp, "_warehouse_base", lambda: base)

    stale = base / "demo_dead-session"
    fresh = base / "demo_concurrent-session"
    other = base / "other_dead-session"
    cur = base / f"demo_{spark.sparkContext.applicationId}"
    for d in (stale, fresh, other, cur):
        d.mkdir()
        (d / "part-0").write_text("x")
    old = time.time() - qhelp._SCRATCH_STALE_SECS - 60
    for d in (stale, other):
        os.utime(d, (old, old))

    got = qhelp.scratch_dir(spark, "demo")

    assert got == str(cur)
    assert not stale.exists(), "back-dated same-prefix sibling not swept"
    assert fresh.exists(), "young sibling must survive (concurrent session)"
    assert other.exists(), "sweep must stay within its own prefix"
    assert not cur.exists(), "current path must come back cleared"


def _recall_vs_exact(spark, sf_dir, name):
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    exact_sets, got_sets = {}, {}
    for r in QUERIES["l3_knn_exact"]["fn"](spark, sf_dir).collect():
        exact_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    for r in QUERIES[name]["fn"](spark, sf_dir).collect():
        got_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    return [
        len(exact_sets[q] & got_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]


def test_l3i_seeded_ivf_recall(spark, sf_dir):
    """The hash-certified seeded-IVF twin must be NON-VACUOUS: its
    oracle proves Spark==DuckDB, this proves the pipeline finds real
    neighbors (seeded cells, nprobe=4/16, measured 0.84 mean)."""
    recalls = _recall_vs_exact(spark, sf_dir, "l3i_knn_ivf_seeded")
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_l3j_seeded_pq_recall(spark, sf_dir):
    """Non-vacuity for the hash-certified seeded-PQ twin (untrained
    codebooks are lossier than l3e's trained ones, but the rerank-100
    exact pass restores most of the top-5)."""
    recalls = _recall_vs_exact(spark, sf_dir, "l3j_knn_pq_seeded")
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_l3k_md5_lsh_recall(spark, sf_dir):
    """Non-vacuity for the hash-certified md5-plane LSH twin (12
    bands x 4 bits — same operating point as l3b's 0.96 mean)."""
    recalls = _recall_vs_exact(spark, sf_dir, "l3k_knn_lsh_md5")
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_l2f_md5_minhash_agrees_with_exact_jaccard(spark, sf_dir):
    """Non-vacuity for the hash-certified md5 MinHash-LSH twin: every
    high-Jaccard pair (l2b exact >= 0.6) must surface among l2f's
    candidates (16-slot signatures at est >= 0.5 recover pairs well
    above the band threshold), and l2f's estimates on those pairs
    must be high."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    exact = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["l2b_jaccard_pairs"]["fn"](spark, sf_dir).collect()
    }
    got = {
        (r.doc_a, r.doc_b): r.est_jaccard
        for r in QUERIES["l2f_minhash_lsh_md5"]["fn"](spark, sf_dir).collect()
    }
    assert exact, "fixture lost its injected near-dup pairs"
    missed = exact - set(got)
    assert len(missed) <= max(1, len(exact) // 10), (
        f"md5 MinHash-LSH missed {len(missed)}/{len(exact)} true pairs"
    )
    hits = [got[p] for p in exact & set(got)]
    assert sum(hits) / len(hits) >= 0.7, "estimates on true pairs too low"


def test_g1b_fixedpoint_dangling_mass(spark):
    """pagerank_fixedpoint's dangling-mass term on a synthetic graph
    (node 3 has NO out-edges — the case the registered bipartite
    fixture never exercises), checked against a pure-Python replay of
    the identical integer recurrence."""
    from pyspark.sql import Row

    from ipydataclean_spark.operators.graph import (
        _G1B_SCALE,
        pagerank_fixedpoint,
    )

    edges = [(1, 2), (2, 3), (1, 3)]
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    got = {r.node: r.r for r in pagerank_fixedpoint(df, iterations=10).collect()}

    nodes = [1, 2, 3]
    deg = {1: 2, 2: 1}
    r = {n: _G1B_SCALE for n in nodes}
    base = 15 * _G1B_SCALE // 100
    for _ in range(10):
        in_sum = {n: 0 for n in nodes}
        for a, b in edges:
            in_sum[b] += r[a] // deg[a]
        dang = sum(r[n] for n in nodes if n not in deg) // len(nodes)
        r = {n: base + (85 * (in_sum[n] + dang)) // 100 for n in nodes}
    assert got == r, (got, r)
    # node 3 (sink + dangling) must have accumulated the most rank
    assert max(r, key=r.get) == 3


def test_c30b_certified_keep_best_prefers_base_doc(spark, sf_dir):
    """The hash-certified keep-best twin must satisfy the same golden
    property as c30: dup-cluster survivors are always base docs (the
    un-padded copies), singletons keep themselves."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["c30b_dedup_keep_best_md5"]["fn"](spark, sf_dir).collect()
    dup_clusters = [r for r in rows if r.cluster_size >= 2]
    assert dup_clusters, "fixture should produce dup clusters"
    for r in dup_clusters:
        assert r.survivor_id < 1000000, (r.cluster_id, r.survivor_id)
    for r in [r for r in rows if r.cluster_size == 1][:50]:
        assert r.survivor_id == r.cluster_id


def test_l4e_md5_lsh_no_false_positives_full_twin_recall(spark, sf_dir):
    """l4e (the certified md5-plane sibling of l4b): no false
    positives (exact-cosine verified), and every injected twin pair
    recovered at tau=0.98 (12-bit bands x 16 miss P ~ 3e-8)."""
    from ipydataclean_spark.functions.vector import cosine_sim
    from ipydataclean_spark.operators.llm import NEARDUP_TAU, embeddings_dup
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    dup = embeddings_dup(spark, sf_dir)
    a = dup.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = dup.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    exact = {
        (r.vec_a, r.vec_b)
        for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine_sim("ea", "eb").alias("cos"))
        .where(F.col("cos") >= NEARDUP_TAU)
        .collect()
    }
    got = {
        (r.vec_a, r.vec_b)
        for r in QUERIES["l4e_embed_neardup_lsh_md5"]["fn"](spark, sf_dir).collect()
    }
    injected = {(v, w) for (v, w) in exact if w == v + 1000000}
    assert injected, "twin injection should create near-dup pairs"
    assert got <= exact, f"false positives: {sorted(got - exact)[:5]}"
    assert injected <= got, f"missed twins: {sorted(injected - got)[:5]}"


def test_l2g_md5_simhash_finds_injected_dups(spark, sf_dir):
    """l2g non-vacuity: every injected dup pair (base doc d % 5 == 0
    twinned as d + 1000000 with identical NORMALIZED text, hence an
    identical shingle set and sketch) must surface at hamming 0."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = QUERIES["l2g_simhash_md5"]["fn"](spark, sf_dir).collect()
    got = {(r.doc_a, r.doc_b): r.hamming for r in rows}
    injected = [(a, b) for (a, b) in got if b == a + 1000000]
    assert injected, "no injected pairs surfaced"
    assert all(got[p] == 0 for p in injected), "twin sketches must be identical"


def test_r22d_hash_sample_fraction_and_determinism(spark, sf_dir):
    """r22d: the md5-coin sample hits ~10% (binomial tolerance) and is
    EXACTLY reproducible — two plans, identical row sets (the property
    RNG sampling cannot give across retries/repartitioning)."""
    from ipydataclean_spark.catalog import load_table
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    total = load_table(spark, sf_dir, "lineitem").count()
    s1 = QUERIES["r22d_hash_sample"]["fn"](spark, sf_dir)
    n = s1.count()
    assert abs(n / total - 0.1) < 0.01, (n, total)
    s2 = QUERIES["r22d_hash_sample"]["fn"](spark, sf_dir)
    assert s1.exceptAll(s2).count() == 0 and s2.exceptAll(s1).count() == 0


def test_inc4b_certified_classifies_history_copies(spark, sf_dir):
    """inc4b golden (mirrors inc4's): every delta doc that is an
    injected copy of a HISTORY doc classifies near_dup_of_history
    against SOME history doc at est 1.0 — the match may be an earlier
    template-identical doc rather than the literal base (ties break
    to the LOWEST history doc_id by spec), so matched_id == base is
    deliberately NOT asserted; Jaccard verification of est-1.0
    matches lives in inc4's golden and applies identically here."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = {r.doc_id: r for r in QUERIES["inc4b_incremental_minhash_md5"]["fn"](spark, sf_dir).collect()}
    copies = [d for d in rows if d >= 1000000 and (d - 1000000) < 400 and (d - 1000000) % 5 == 0]
    assert copies, "fixture should inject copies of history docs"
    for d in copies:
        r = rows[d]
        assert r.status == "near_dup_of_history", (d, r)
        assert r.matched_id is not None and r.matched_id < 400, (d, r)
        assert float(r.best_est) == 1.0, (d, r)
    assert {r.status for r in rows.values()} <= {"near_dup_of_history", "novel"}


def test_l12b_identical_normalized_texts_share_fingerprints(spark, sf_dir):
    """l12b golden (mirrors l12's): an injected twin differs from its
    base only by padding/case, so the NORMALIZED text — and therefore
    the fingerprint summary — is identical."""
    from ipydataclean_spark.registry import QUERIES, load_all

    load_all()
    rows = {r.doc_id: r for r in QUERIES["l12b_fingerprints_md5"]["fn"](spark, sf_dir).collect()}
    twins = [d for d in rows if d >= 1000000 and (d - 1000000) in rows]
    assert twins, "fixture should contain injected twins"
    for d in twins:
        base = rows[d - 1000000]
        assert (rows[d].n_fingerprints, rows[d].min_fp) == (
            base.n_fingerprints,
            base.min_fp,
        ), d


def test_cluster_pairs_raises_on_nonconvergence(spark):
    """cluster_pairs must FAIL LOUDLY when a component's min-id
    eccentricity exceeds max_iter (round-6 review finding): a silent
    partial labeling would split one component into several clusters
    and diverge from the exact closure oracles. A 12-node path graph
    needs 11 propagation rounds; max_iter=3 must raise, a sufficient
    budget must converge to ONE cluster labeled 0. (Pinned to
    method="propagate" — the round-7 star variant converges the same
    chain in O(log n) rounds, tested separately.)"""
    from pyspark.sql import Row

    from ipydataclean_spark.operators.llm_extra import cluster_pairs

    n = 12
    ids = spark.createDataFrame([Row(id=i) for i in range(n)])
    chain = spark.createDataFrame([Row(a=i, b=i + 1) for i in range(n - 1)])
    with pytest.raises(RuntimeError, match="did not converge"):
        cluster_pairs(ids, chain, max_iter=3, method="propagate")
    labels = cluster_pairs(ids, chain, max_iter=n + 1, method="propagate").collect()
    assert {r.cluster_id for r in labels} == {0}


def test_cluster_pairs_star_matches_propagation(spark):
    """The large-star/small-star variant (round 7, the 100 TB scale
    path) must label EXACTLY like min-label propagation — two
    independent mechanisms, one answer — on adversarial shapes: a deep
    chain (worst case for propagation), a star, a clique, two merged
    components, isolated nodes, and reversed/duplicated/self-loop
    edges. Also pins the O(log n) round budget: a 64-node chain must
    converge within 10 alternation rounds (propagation needs 63)."""
    from pyspark.sql import Row

    from ipydataclean_spark.operators.llm_extra import cluster_pairs

    edges = (
        [(i, i + 1) for i in range(20)]              # chain 0..20
        + [(100, j) for j in (101, 102, 103, 104)]   # star
        + [(a, b) for a in range(200, 204) for b in range(a + 1, 204)]  # clique
        + [(300, 301), (302, 303), (301, 302)]       # merged pair
        + [(401, 400), (400, 401), (402, 402)]       # reversed + dup + self-loop
    )
    node_ids = sorted({x for e in edges for x in e} | {500, 501})  # isolates
    ids = spark.createDataFrame([Row(id=i) for i in node_ids])
    pairs = spark.createDataFrame([Row(a=a, b=b) for a, b in edges])
    star = {r.id: r.cluster_id for r in cluster_pairs(ids, pairs, max_iter=15).collect()}
    prop = {
        r.id: r.cluster_id
        for r in cluster_pairs(ids, pairs, max_iter=25, method="propagate").collect()
    }
    assert star == prop
    assert star[20] == 0 and star[104] == 100 and star[303] == 300
    assert star[402] == 402 and star[500] == 500
    assert len(star) == len(node_ids)  # exactly one label row per id

    n = 64
    ids64 = spark.createDataFrame([Row(id=i) for i in range(n)])
    chain = spark.createDataFrame([Row(a=i, b=i + 1) for i in range(n - 1)])
    labels = cluster_pairs(ids64, chain, max_iter=10).collect()
    assert {r.cluster_id for r in labels} == {0} and len(labels) == n


def test_cluster_pairs_star_hub_graph(spark):
    """Skew shape: one hub node with 5k leaves plus a chain hanging off
    a leaf — the high-degree neighborhood a power-law dup graph
    produces. The star method must label the whole thing as one
    component in very few alternation rounds (the hub IS nearly a star
    already), with exactly one label row per node. Also pins that the
    hub being the component min routes every leaf to it directly."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.operators.llm_extra import cluster_pairs

    n_leaves = 5000
    hub_edges = spark.range(1, n_leaves + 1).select(
        F.lit(0).alias("a"), F.col("id").alias("b")
    )
    # chain 5000 -> 5010 hanging off the last leaf
    chain = spark.range(n_leaves, n_leaves + 10).select(
        F.col("id").alias("a"), (F.col("id") + 1).alias("b")
    )
    pairs = hub_edges.unionByName(chain)
    ids = spark.range(n_leaves + 11).select(F.col("id"))
    labels = cluster_pairs(ids, pairs, max_iter=8)
    agg = labels.agg(
        F.countDistinct("cluster_id").alias("k"),
        F.count(F.lit(1)).alias("n"),
        F.max("cluster_id").alias("mx"),
    ).collect()[0]
    assert (agg.k, agg.n, agg.mx) == (1, n_leaves + 11, 0)


def test_cluster_pairs_drops_foreign_node_edges_both_methods(spark):
    """Contract pin (review r07 #3): edges mentioning ids OUTSIDE the
    ``ids`` frame are dropped by BOTH methods — a foreign node must
    not bridge two member components (propagate never could, since it
    only labels ids; star now semi-joins edges to ids first). ids
    {5,7}, pairs {(5,3),(3,7)} with 3 foreign: both methods return
    two singleton clusters."""
    from pyspark.sql import Row

    from ipydataclean_spark.operators.llm_extra import cluster_pairs

    ids = spark.createDataFrame([Row(id=5), Row(id=7)])
    pairs = spark.createDataFrame([Row(a=5, b=3), Row(a=3, b=7)])
    for method in ("star", "propagate"):
        got = {
            r.id: r.cluster_id
            for r in cluster_pairs(ids, pairs, max_iter=5, method=method).collect()
        }
        assert got == {5: 5, 7: 7}, (method, got)


def test_cluster_pairs_random_graphs_vs_union_find(spark):
    """Property check with a THIRD independent mechanism: 24 seeded
    random graphs (Erdos-Renyi-ish, 6-20 nodes, varying density,
    self-loops/dups/reversals injected) packed into one disjoint
    union via node-id offsets — ONE star call and ONE propagate call
    each labeled against a driver-side union-find ground truth. Any
    divergence in component structure OR min-id labeling fails with
    the offending graph's seed."""
    import random

    from pyspark.sql import Row

    from ipydataclean_spark.operators.llm_extra import cluster_pairs

    rng = random.Random(0)
    all_ids, all_edges, parent = [], [], {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    for g in range(24):
        base = g * 1000
        n = rng.randint(6, 20)
        nodes = [base + i for i in range(n)]
        all_ids.extend(nodes)
        for v in nodes:
            parent[v] = v
        density = rng.choice((0.05, 0.15, 0.4))
        for i in range(n):
            for j in range(i + 1, n):
                if rng.random() < density:
                    a, b = nodes[i], nodes[j]
                    if rng.random() < 0.3:
                        a, b = b, a  # reversed orientation
                    all_edges.append((a, b))
                    if rng.random() < 0.1:
                        all_edges.append((a, b))  # duplicate
                    union(nodes[i], nodes[j])
        if rng.random() < 0.5:
            all_edges.append((nodes[0], nodes[0]))  # self-loop

    # path-compress everything so truth[v] = min id of its component
    truth = {}
    for v in all_ids:
        r = find(v)
        comp_min = min(x for x in all_ids if find(x) == r)
        truth[v] = comp_min

    ids = spark.createDataFrame([Row(id=i) for i in all_ids])
    pairs = spark.createDataFrame([Row(a=a, b=b) for a, b in all_edges])
    for method in ("star", "propagate"):
        got = {
            r.id: r.cluster_id
            for r in cluster_pairs(ids, pairs, max_iter=30, method=method).collect()
        }
        assert got == truth, (
            method,
            {k: (got[k], truth[k]) for k in got if got[k] != truth[k]},
        )


def test_free_local_checkpoint_releases_blocks(spark):
    """The bounded-retention fix must actually release storage: a
    localCheckpoint'ed table appears in the JVM's RDD storage info;
    after _free_local_checkpoint it must be gone (its block count
    drops to zero). Guards the private-API path — if a Spark upgrade
    breaks it, this fails instead of the leak silently returning."""
    from pyspark.sql import functions as F

    from ipydataclean_spark.operators.llm_extra import _free_local_checkpoint

    def persisted_rdd_ids():
        infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
        return {i.id() for i in infos if i.numCachedPartitions() > 0}

    before = persisted_rdd_ids()
    df = spark.range(10_000).select(F.col("id")).localCheckpoint(eager=True)
    assert df.count() == 10_000
    after_ckpt = persisted_rdd_ids()
    new_ids = after_ckpt - before
    assert new_ids, "localCheckpoint left no storage trace to test against"
    _free_local_checkpoint(df)
    after_free = persisted_rdd_ids()
    assert not (new_ids & after_free), (
        "checkpoint blocks survived _free_local_checkpoint "
        f"(leaked ids: {new_ids & after_free})"
    )
