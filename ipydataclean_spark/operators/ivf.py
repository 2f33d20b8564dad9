"""IVF (inverted-file) approximate nearest neighbor — L3 scale path #2.

Classic IVF: k-means-lite partitions vectors into K cells; a query
probes only the ``nprobe`` nearest cells and exact-scores candidates.
Beside the hyperplane LSH (llm.l3b), this is the other standard ANN
shape for 100 TB embedding stores: the index build is a handful of
joins/aggregations, the cell assignment is the partition key for the
stored table, and probing is a broadcast join on cell ids.

Fully deterministic (seed centroids = lowest vec_ids; Lloyd updates
use exact decimal averages), pure DataFrame ops — no MLlib, no RNG.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.functions.vector import (
    cosine_sim,
    cosine_sim_sql,
    dot_sql,
    norm_sql,
    sq_dist_sql,
)
from ipydataclean_spark.functions.vector import dot as vdot
from ipydataclean_spark.functions.vector import norm as vnorm
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register


def _sq_dist(a, b) -> F.Column:
    d = F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double")))
    return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)


def assign_cells(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, embedding, cell): nearest centroid per vector — a
    broadcast crossJoin + min_by; K is small so this is one narrow map."""
    scored = vectors.crossJoin(F.broadcast(centroids)).select(
        "vec_id",
        "embedding",
        F.col("cid"),
        _sq_dist(F.col("embedding"), F.col("centroid")).alias("d2"),
    )
    return scored.groupBy("vec_id").agg(
        F.first("embedding").alias("embedding"),
        F.min_by("cid", "d2").alias("cell"),
    )


def build_ivf(vectors: DataFrame, k: int = 16, iters: int = 2) -> tuple[DataFrame, DataFrame]:
    """Lloyd iterations with deterministic seeds (lowest vec_ids).
    Centroid update averages element-wise via posexplode + groupBy —
    two shuffles per iteration, independent of dimension."""
    cents = vectors.orderBy("vec_id").limit(k).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("centroid")
    )
    for _ in range(iters):
        assigned = assign_cells(vectors, cents)
        cents = (
            assigned.select("cell", F.posexplode("embedding").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("m"))
            .groupBy("cell")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s.m.cast("float")
                ).alias("centroid")
            )
            .select(F.col("cell").alias("cid"), "centroid")
        )
    return assign_cells(vectors, cents), cents


def ivf_knn(
    vectors: DataFrame, queries: DataFrame, k_neighbors: int = 5, n_cells: int = 16, nprobe: int = 4
) -> DataFrame:
    """Probe the nprobe nearest cells per query; exact cosine re-rank
    within candidates. At scale ``assigned`` is the stored, cell-
    partitioned table — only probed cells are scanned (partition
    pruning on the cell key)."""
    assigned, cents = build_ivf(vectors, k=n_cells)
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    probe_rank = Window.partitionBy("query_id").orderBy("qd2", "cid")
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "q_emb", "cid", _sq_dist(F.col("q_emb"), F.col("centroid")).alias("qd2"))
        .withColumn("pr", F.row_number().over(probe_rank))
        .where(F.col("pr") <= nprobe)
        .select("query_id", "q_emb", F.col("cid").alias("cell"))
    )
    cand = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cosine_sim("q_emb", "embedding").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k_neighbors)
        .select("query_id", "neighbor_id", "cos_sim")
    )


@register("l3c_knn_ivf", oracle=None, tags=("L3", "IVF"))
def l3c_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 IVF variant: deterministic k-means-lite cells, nprobe=4 of 16,
    exact re-rank. Rows-only; recall vs l3_knn_exact asserted in
    tests/test_llm_extra.py."""
    emb = T(spark, sf_dir, "embeddings")
    return ivf_knn(emb, emb.where(F.col("vec_id") < 5)).orderBy(
        "query_id", F.desc("cos_sim"), "neighbor_id"
    )


_L3I_ORACLE = (
    "WITH cents AS (SELECT vec_id AS cid, embedding AS c FROM embeddings "
    "WHERE vec_id < 16), "
    "asg AS (SELECT vec_id, embedding, cell FROM ("
    "SELECT e.vec_id, e.embedding, c.cid AS cell, "
    "ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY "
    f"{cosine_sim_sql('e.embedding', 'c.c')} DESC, c.cid) AS rn "
    "FROM embeddings e CROSS JOIN cents c) s WHERE rn = 1), "
    "probes AS (SELECT query_id, q_emb, cell FROM ("
    "SELECT q.vec_id AS query_id, q.embedding AS q_emb, c.cid AS cell, "
    "ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
    f"{cosine_sim_sql('q.embedding', 'c.c')} DESC, c.cid) AS pr "
    "FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 5) s "
    "WHERE pr <= 4), "
    "cand AS (SELECT p.query_id, a.vec_id AS neighbor_id, "
    f"{cosine_sim_sql('p.q_emb', 'a.embedding')} AS cos_sim "
    "FROM probes p JOIN asg a ON a.cell = p.cell "
    "WHERE a.vec_id <> p.query_id) "
    "SELECT query_id, neighbor_id, cos_sim FROM ("
    "SELECT query_id, neighbor_id, cos_sim, "
    "ROW_NUMBER() OVER (PARTITION BY query_id "
    "ORDER BY cos_sim DESC, neighbor_id) AS rn FROM cand) s "
    "WHERE rn <= 5 ORDER BY query_id, cos_sim DESC, neighbor_id"
)


@register("l3i_knn_ivf_seeded", oracle=_L3I_ORACLE, tags=("L3", "IVF"))
def l3i_knn_ivf_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 ORACLE-CERTIFIED IVF: seeded cells (no Lloyd training) +
    nprobe=4 probing + exact re-rank, every stage replayed by DuckDB —
    upgrading the IVF probe PIPELINE from rows-only to hash-certified.
    l3c (the registered production form) keeps its 2-iteration
    k-means-lite cells, whose centroid updates are order-dependent
    float averages with no cross-engine twin — that TRAINING step is
    why l3c is rows-only by design; the probe semantics (assign →
    probe nprobe nearest cells → exact-cosine re-rank top-k with the
    same tie-breaks) are identical here and certified. Assignment and
    probe ranking use max-cosine to the seed (the proven l36
    cross-engine form: sequential-fold dot/norm, bit-identical
    doubles) rather than l3c's squared L2 — equivalent ranking for
    the near-unit-norm fixture embeddings and the form with a proven
    twin. At scale the shape is l3c's: cells = partition key of the
    stored table, probes = broadcast join, only probed cells
    scanned."""
    emb = T(spark, sf_dir, "embeddings")
    return seeded_ivf_topk(emb, nprobe=4).orderBy(
        "query_id", F.desc("cos_sim"), "neighbor_id"
    )


def seeded_ivf_stages(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(asg, pranked): the nprobe-INDEPENDENT stages of the certified
    seeded-IVF pipeline — the corpus-wide cell assignment and the
    per-query ranked probe list — computed once. l3m sweeps five
    nprobe settings; without this split each sweep point rebuilt the
    full-corpus assignment crossJoin from scratch (review r07 second
    pass #2). Callers that loop should localCheckpoint the returned
    frames; a single-shot caller (l3i) uses them as lazy plans."""
    cents = emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("c_emb")
    )
    asg = (
        emb.crossJoin(F.broadcast(cents))
        .select(
            "vec_id",
            "embedding",
            "cid",
            (vdot("embedding", "c_emb") / (vnorm("embedding") * vnorm("c_emb"))).alias("sim"),
        )
        .groupBy("vec_id")
        .agg(
            F.first("embedding").alias("embedding"),
            F.max_by("cid", F.struct(F.col("sim"), (-F.col("cid")).alias("nc"))).alias("cell"),
        )
    )
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    probe_rank = Window.partitionBy("query_id").orderBy(F.desc("qsim"), F.asc("cid"))
    pranked = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "q_emb",
            "cid",
            (vdot("q_emb", "c_emb") / (vnorm("q_emb") * vnorm("c_emb"))).alias("qsim"),
        )
        .withColumn("pr", F.row_number().over(probe_rank))
        .select("query_id", "q_emb", F.col("cid").alias("cell"), "pr")
    )
    return asg, pranked


def seeded_ivf_topk(
    emb: DataFrame | None = None,
    nprobe: int = 4,
    k: int = 5,
    stages: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """The certified seeded-IVF probe pipeline (the l3i body),
    parameterized by nprobe: seed cells = vec_id < 16, queries =
    vec_id < 5, assignment/probe ranking by max-cosine to the seed,
    exact-cosine re-rank of the probed cells' members to top-k.
    Shared by l3i (nprobe=4) and the l3m nprobe-sweep audit, which
    passes precomputed ``stages`` so the sweep filters one assignment
    instead of rebuilding it per setting. EXACTLY one of ``emb`` /
    ``stages`` must be given — passing both would silently answer
    from ``stages``' corpus while the call site reads as operating on
    ``emb`` (review r07 third pass #5)."""
    if (emb is None) == (stages is None):
        raise ValueError("pass exactly one of emb or stages")
    asg, pranked = stages if stages is not None else seeded_ivf_stages(emb)
    probes = pranked.where(F.col("pr") <= nprobe).select("query_id", "q_emb", "cell")
    cand = (
        asg.join(F.broadcast(probes), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_sim("q_emb", "embedding").alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


_L3M_NPROBES = (1, 2, 4, 8, 16)


def _l3m_oracle() -> str:
    shared = (
        "WITH cents AS (SELECT vec_id AS cid, embedding AS c FROM embeddings "
        "WHERE vec_id < 16), "
        "asg AS (SELECT vec_id, embedding, cell FROM ("
        "SELECT e.vec_id, e.embedding, c.cid AS cell, "
        "ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY "
        f"{cosine_sim_sql('e.embedding', 'c.c')} DESC, c.cid) AS rn "
        "FROM embeddings e CROSS JOIN cents c) s WHERE rn = 1), "
        "pranked AS (SELECT q.vec_id AS query_id, q.embedding AS q_emb, "
        "c.cid AS cell, ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
        f"{cosine_sim_sql('q.embedding', 'c.c')} DESC, c.cid) AS pr "
        "FROM embeddings q CROSS JOIN cents c WHERE q.vec_id < 5), "
        "exact AS (SELECT query_id, neighbor_id FROM ("
        "SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
        "ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
        f"{cosine_sim_sql('q.embedding', 'e.embedding')} DESC, e.vec_id) AS rn "
        "FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id "
        "WHERE q.vec_id < 5) s WHERE rn <= 5)"
    )
    tops = ", ".join(
        f"top{p} AS (SELECT query_id, neighbor_id FROM ("
        "SELECT p2.query_id, a.vec_id AS neighbor_id, "
        "ROW_NUMBER() OVER (PARTITION BY p2.query_id ORDER BY "
        f"{cosine_sim_sql('p2.q_emb', 'a.embedding')} DESC, a.vec_id) AS rn "
        f"FROM pranked p2 JOIN asg a ON a.cell = p2.cell AND p2.pr <= {p} "
        "WHERE a.vec_id <> p2.query_id) s WHERE rn <= 5)"
        for p in _L3M_NPROBES
    )
    metrics = " UNION ALL ".join(
        f"SELECT {p} AS nprobe, "
        "(SELECT COUNT(*) FROM exact) AS n_exact, "
        f"(SELECT COUNT(*) FROM top{p}) AS n_returned, "
        f"(SELECT COUNT(*) FROM exact t JOIN top{p} c "
        "ON t.query_id = c.query_id AND t.neighbor_id = c.neighbor_id) AS n_hits"
        for p in _L3M_NPROBES
    )
    return (
        f"{shared}, {tops}, m AS ({metrics}) "
        "SELECT nprobe, n_exact, n_returned, n_hits, "
        "ROUND(CASE WHEN n_exact > 0 THEN CAST(n_hits AS DOUBLE) / n_exact "
        "END, 8) AS recall FROM m ORDER BY nprobe"
    )


@register("l3m_ivf_recall_audit", oracle=_l3m_oracle(), tags=("L3", "IVF"))
def l3m_ivf_recall_audit(
    spark: SparkSession, sf_dir: str, query_fraction: float = 1.0
) -> DataFrame:
    """L3 quality audit — the ANN recall-vs-nprobe tuning table: the
    certified seeded-IVF pipeline (l3i's exact body via
    seeded_ivf_topk) swept at nprobe 1/2/4/8/16 against the
    brute-force exact top-5 (the l3_knn_exact semantics), recall@5
    per setting — 16 probes every cell, so that row must equal exact.
    This is the table an ANN deployment reads to pick nprobe: recall
    is what cell pruning loses, and the probed-cell fraction
    (nprobe/16) is proportional to what scanning costs. Non-vacuous
    on the fixture (recall climbs with nprobe; pinned in
    tests/test_llm.py). Divisions are single BIGINT/BIGINT -> double
    (IEEE-identical cross-engine), zero-guarded.

    Scale shape: the expensive side is the brute-force exact top-k —
    |queries| x |corpus| — so at 100 TB the audit runs on a sampled
    QUERY slice. ``query_fraction`` IS that slice (VERDICT r07 #5): a
    deterministic md5-coin sample ('l3m'-salted, the r22d rule)
    applied to the query set before both the exact cross-join and the
    probe sweep, bounding the audit cost linearly in the fraction.
    query_fraction=1.0 (the registered/oracle default) is
    bit-identical to the unsampled audit."""
    emb = T(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    qkeep = None
    if query_fraction < 1.0:
        from ipydataclean_spark.functions.exact import md5_coin

        qkeep = md5_coin("query_id", salt="l3m") < F.lit(query_fraction)
        q = q.where(qkeep)
    e = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("e_emb"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    # materialized once: ``exact`` (the brute-force cross-join) feeds
    # two subtrees per sweep point (its count agg and the hits join),
    # and each ``top`` feeds two — without checkpoints the expensive
    # plans re-execute per reference (the cluster_pairs edges lesson;
    # review r07 #6). Tiny tables (25 rows), so the blocks are free.
    exact = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_sim("q_emb", "e_emb").alias("cos_sim"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    asg, pranked = seeded_ivf_stages(emb)
    if qkeep is not None:
        # the probe sweep must answer the SAME sampled query set the
        # exact side was computed for (same coin, same salt)
        pranked = pranked.where(qkeep)
    stages = (
        asg.localCheckpoint(eager=True),
        pranked.localCheckpoint(eager=True),
    )
    rows = []
    for p in _L3M_NPROBES:
        top = (
            seeded_ivf_topk(nprobe=p, stages=stages)
            .select("query_id", "neighbor_id")
            .localCheckpoint(eager=True)
        )
        hits = exact.join(top, ["query_id", "neighbor_id"])
        rows.append(
            exact.agg(F.count(F.lit(1)).alias("n_exact"))
            .crossJoin(top.agg(F.count(F.lit(1)).alias("n_returned")))
            .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
            .select(
                F.lit(p).cast("int").alias("nprobe"),
                "n_exact",
                "n_returned",
                "n_hits",
            )
        )
    # the stage checkpoints are dead once every per-nprobe top
    # checkpoint materialized (top's lineage is truncated); exact/top
    # stay live — the returned lazy plans read their blocks
    from ipydataclean_spark.operators.llm_extra import _free_local_checkpoint

    _free_local_checkpoint(stages[0])
    _free_local_checkpoint(stages[1])
    m = rows[0]
    for extra in rows[1:]:
        m = m.unionByName(extra)
    rec = F.when(
        F.col("n_exact") > 0, F.col("n_hits").cast("double") / F.col("n_exact")
    )
    return m.select(
        "nprobe", "n_exact", "n_returned", "n_hits", F.round(rec, 8).alias("recall")
    ).orderBy("nprobe")


# ---------------------------------------------------------------------------
# PQ (product quantization) — L3 scale path #3: compressed-domain ANN
# ---------------------------------------------------------------------------


def _subvectors(vectors: DataFrame, m: int, dim: int) -> DataFrame:
    """(vec_id, sub_id, subvec): the embedding sliced into m chunks."""
    sub = dim // m
    return vectors.select(
        "vec_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(j).alias("sub_id"),
                    F.slice("embedding", j * sub + 1, sub).alias("subvec"),
                )
                for j in range(m)
            ])
        ).alias("s"),
    ).select("vec_id", F.col("s.sub_id").alias("sub_id"), F.col("s.subvec").alias("subvec"))


def build_pq(
    vectors: DataFrame, m: int = 4, dim: int = 64, k: int = 16, iters: int = 2
) -> tuple[DataFrame, DataFrame]:
    """Product-quantization codebooks + codes (public method: Jégou et
    al., 'Product Quantization for Nearest Neighbor Search', PAMI'11).

    Each of the m subspaces gets its own k-entry codebook from the same
    deterministic k-means-lite used by IVF, run KEYED on sub_id so all
    m codebooks train in the SAME two shuffles per iteration — not m
    separate jobs. A vector's code is m small ints (m bytes at k≤256):
    a 64-dim float vector compresses 64×4B → m B, which is what makes
    billion-scale in-memory ANN feasible.

    Returns (codes (vec_id, sub_id, code), codebooks (sub_id, cid,
    centroid))."""
    sv = _subvectors(vectors, m, dim)
    seed_w = Window.partitionBy("sub_id").orderBy("vec_id")
    cents = (
        sv.withColumn("rn", F.row_number().over(seed_w))
        .where(F.col("rn") <= k)
        .select("sub_id", (F.col("rn") - 1).alias("cid"), F.col("subvec").alias("centroid"))
    )
    assigned = None
    for _ in range(iters):
        scored = sv.join(F.broadcast(cents), "sub_id").select(
            "vec_id", "sub_id", "subvec", "cid",
            _sq_dist(F.col("subvec"), F.col("centroid")).alias("d2"),
        )
        assigned = scored.groupBy("vec_id", "sub_id").agg(
            F.first("subvec").alias("subvec"),
            F.min_by("cid", "d2").alias("code"),
        )
        cents = (
            assigned.select("sub_id", "code", F.posexplode("subvec").alias("pos", "val"))
            .groupBy("sub_id", "code", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("c"))
            .groupBy("sub_id", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s.c.cast("float"),
                ).alias("centroid")
            )
            .select("sub_id", F.col("code").alias("cid"), "centroid")
        )
    return assigned.select("vec_id", "sub_id", "code"), cents


def pq_knn(
    vectors: DataFrame,
    queries: DataFrame,
    k_neighbors: int = 5,
    m: int = 4,
    dim: int = 64,
    k: int = 16,
    rerank: int = 100,
) -> DataFrame:
    """ADC (asymmetric distance computation) top-k: per query, build an
    m×k distance table against the codebooks (tiny, broadcast), score
    every stored vector as the SUM of m table lookups on its code —
    never touching the raw stored vectors — then exact-cosine re-rank
    only the ``rerank`` best candidates. At 100 TB the codes table
    (m bytes/vector) is the only thing scanned per query; raw
    embeddings are fetched for the rerank-sized candidate set alone."""
    codes, cents = build_pq(vectors, m=m, dim=dim, k=k)
    qsv = _subvectors(
        queries.select(F.col("vec_id").alias("vec_id"), "embedding"), m, dim
    ).select(
        F.col("vec_id").alias("query_id"), "sub_id", F.col("subvec").alias("q_subvec")
    )
    dtab = qsv.join(F.broadcast(cents), "sub_id").select(
        "query_id", "sub_id", F.col("cid").alias("code"),
        _sq_dist(F.col("q_subvec"), F.col("centroid")).alias("d2"),
    )
    approx = (
        codes.join(F.broadcast(dtab), ["sub_id", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").alias("ad2"))
        .where(F.col("vec_id") != F.col("query_id"))
    )
    w = Window.partitionBy("query_id").orderBy("ad2", "vec_id")
    cand = (
        approx.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= rerank)
        .select("query_id", "vec_id")
    )
    v = vectors.select(F.col("vec_id"), F.col("embedding"))
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    scored = (
        cand.join(v, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_sim("q_emb", "embedding").alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k_neighbors)
        .select("query_id", "neighbor_id", "cos_sim")
    )


@register("l3e_knn_pq", oracle=None, tags=("L3", "PQ"))
def l3e_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 PQ variant: 4×16-dim codebooks (k=16), ADC scoring over the
    m-byte codes, exact re-rank of the top 100 (measured mean recall
    0.96 vs exact on the fixture; rerank is the recall/cost knob and
    shrinks to a tiny corpus fraction at scale). Rows-only; recall vs
    l3_knn_exact asserted in tests/test_llm_extra.py."""
    emb = T(spark, sf_dir, "embeddings")
    return pq_knn(emb, emb.where(F.col("vec_id") < 5)).orderBy(
        "query_id", F.desc("cos_sim"), "neighbor_id"
    )


def _l3j_sub_sql(tbl: str) -> str:
    return (
        f"(SELECT vec_id, sub_id, list_slice(embedding, sub_id * 16 + 1, "
        f"sub_id * 16 + 16) AS subvec FROM {tbl} "
        "CROSS JOIN (SELECT UNNEST(range(4)) AS sub_id))"
    )


_L3J_ORACLE = (
    f"WITH sv AS {_l3j_sub_sql('embeddings')}, "
    "cents AS (SELECT sub_id, vec_id AS cid, subvec AS centroid FROM sv "
    "WHERE vec_id < 16), "
    "codes AS (SELECT vec_id, sub_id, cid AS code FROM ("
    "SELECT s.vec_id, s.sub_id, c.cid, "
    "ROW_NUMBER() OVER (PARTITION BY s.vec_id, s.sub_id ORDER BY "
    f"{sq_dist_sql('s.subvec', 'c.centroid')}, c.cid) AS rn "
    "FROM sv s JOIN cents c ON c.sub_id = s.sub_id) x WHERE rn = 1), "
    "dtab AS (SELECT q.vec_id AS query_id, q.sub_id, c.cid AS code, "
    f"{sq_dist_sql('q.subvec', 'c.centroid')} AS d2q "
    "FROM sv q JOIN cents c ON c.sub_id = q.sub_id WHERE q.vec_id < 5), "
    "approx AS (SELECT d.query_id, k.vec_id, "
    "SUM(CASE WHEN k.sub_id = 0 THEN d.d2q END) AS d0, "
    "SUM(CASE WHEN k.sub_id = 1 THEN d.d2q END) AS d1, "
    "SUM(CASE WHEN k.sub_id = 2 THEN d.d2q END) AS d2, "
    "SUM(CASE WHEN k.sub_id = 3 THEN d.d2q END) AS d3 "
    "FROM codes k JOIN dtab d ON d.sub_id = k.sub_id AND d.code = k.code "
    "WHERE k.vec_id <> d.query_id GROUP BY 1, 2), "
    "cand AS (SELECT query_id, vec_id FROM ("
    "SELECT query_id, vec_id, ROW_NUMBER() OVER (PARTITION BY query_id "
    "ORDER BY (((d0 + d1) + d2) + d3), vec_id) AS rn FROM approx) x "
    "WHERE rn <= 100), "
    "scored AS (SELECT c.query_id, e.vec_id AS neighbor_id, "
    f"{cosine_sim_sql('q.embedding', 'e.embedding')} AS cos_sim "
    "FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id "
    "JOIN embeddings q ON q.vec_id = c.query_id) "
    "SELECT query_id, neighbor_id, cos_sim FROM ("
    "SELECT query_id, neighbor_id, cos_sim, "
    "ROW_NUMBER() OVER (PARTITION BY query_id "
    "ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored) x "
    "WHERE rn <= 5 ORDER BY query_id, cos_sim DESC, neighbor_id"
)


@register("l3j_knn_pq_seeded", oracle=_L3J_ORACLE, tags=("L3", "PQ"))
def l3j_knn_pq_seeded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 ORACLE-CERTIFIED PQ: seeded codebooks (first 16 vectors'
    subvectors, no training) + ADC scoring + exact re-rank, every
    stage replayed by DuckDB — certifying the PQ probe PIPELINE
    (slicing, code assignment, the per-query distance table, the
    sum-of-lookups approximate ranking, rerank semantics and
    tie-breaks) that l3e runs with TRAINED codebooks. As with
    l3c/l3i, the k-means training is the only non-twinnable stage
    (order-dependent float averages), so l3e stays rows-only and this
    twin carries the hash certificate. ADC sums are kept
    order-deterministic cross-engine by pivoting the m=4 per-subspace
    lookups into fixed columns and adding LEFT-TO-RIGHT — a bare
    SUM() over doubles would reintroduce partial-agg order drift.
    Squared distances use functions/vector.sq_dist_sql (the same
    sequential fold as the Spark kernel — bit-identical doubles)."""
    m, dim, n_seed, rerank, k_neighbors = 4, 64, 16, 100, 5
    emb = T(spark, sf_dir, "embeddings")
    sv = _subvectors(emb, m, dim)
    cents = sv.where(F.col("vec_id") < n_seed).select(
        "sub_id", F.col("vec_id").alias("cid"), F.col("subvec").alias("centroid")
    )
    scored = sv.join(F.broadcast(cents), "sub_id").select(
        "vec_id",
        "sub_id",
        "cid",
        _sq_dist(F.col("subvec"), F.col("centroid")).alias("d2"),
    )
    codes = scored.groupBy("vec_id", "sub_id").agg(
        F.min_by("cid", F.struct("d2", "cid")).alias("code")
    )
    qsv = sv.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "sub_id", F.col("subvec").alias("q_subvec")
    )
    dtab = qsv.join(F.broadcast(cents), "sub_id").select(
        "query_id",
        "sub_id",
        F.col("cid").alias("code"),
        _sq_dist(F.col("q_subvec"), F.col("centroid")).alias("d2q"),
    )
    per = (
        codes.join(F.broadcast(dtab), ["sub_id", "code"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(
            *[
                F.sum(F.when(F.col("sub_id") == j, F.col("d2q"))).alias(f"d{j}")
                for j in range(m)
            ]
        )
    )
    ad2 = ((F.col("d0") + F.col("d1")) + F.col("d2")) + F.col("d3")
    w = Window.partitionBy("query_id").orderBy(ad2.asc(), F.asc("vec_id"))
    cand = (
        per.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= rerank)
        .select("query_id", "vec_id")
    )
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    rer = (
        cand.join(emb, "vec_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_sim("q_emb", "embedding").alias("cos_sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        rer.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k_neighbors)
        .select("query_id", "neighbor_id", "cos_sim")
        .orderBy("query_id", F.desc("cos_sim"), "neighbor_id")
    )


# ---------------------------------------------------------------------------
# IVF index persistence — the stored-table ANN path
# ---------------------------------------------------------------------------


def ivf_write(vectors: DataFrame, path: str, n_cells: int = 16,
              meta_cols: tuple[str, ...] = ()) -> None:
    """Materialize an IVF index on disk: vectors cell-partitioned
    (``{path}/cells/cell=N/``) plus the tiny centroid table. This is
    the 100 TB layout the in-memory l3c form models: once written,
    every probe query scans ONLY its probed cells' files — partition
    pruning does the candidate bounding that the bucketed join does
    in-memory. Rebuild cadence is an offline choice (centroids drift
    slowly; cells re-shard on rewrite)."""
    assigned, cents = build_ivf(vectors, k=n_cells)
    if meta_cols:
        # metadata rides in the index files so probe-time predicates
        # (tenant/label/category filters) push into the SAME scan
        assigned = assigned.join(vectors.select("vec_id", *meta_cols), "vec_id")
    assigned.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/cells")
    cents.write.mode("overwrite").parquet(f"{path}/centroids")


def ivf_append(spark: SparkSession, path: str, new_vectors: DataFrame) -> None:
    """Incremental index maintenance — the op a 100 TB pipeline runs
    daily: assign NEW vectors to the EXISTING centroids (broadcast
    crossJoin + min_by, one narrow map — no Lloyd re-run, no touch of
    stored rows) and append them to their cell partitions. Existing
    cell files are untouched (append mode only adds files); probe
    queries see old+new rows immediately through the same partition
    pruning. Centroids drift as the corpus grows — watch
    :func:`ivf_drift` and rebuild (ivf_write) when the assignment
    quality decays past the rebuild threshold. ``meta_cols`` recorded
    at write time ride along automatically (assign_cells output is
    joined back to the batch on vec_id, same as ivf_write)."""
    cents = spark.read.parquet(f"{path}/centroids")
    assigned = assign_cells(new_vectors, cents)
    stored_cols = [
        f.name for f in spark.read.parquet(f"{path}/cells").schema.fields
    ]
    extra = [c for c in stored_cols if c not in ("vec_id", "embedding", "cell")]
    if extra:
        assigned = assigned.join(
            new_vectors.select("vec_id", *extra), "vec_id"
        )
    assigned.write.mode("append").partitionBy("cell").parquet(f"{path}/cells")


def ivf_drift(spark: SparkSession, path: str) -> DataFrame:
    """Index-health metric: per cell, member count and mean squared
    distance to the cell centroid, plus the '__all__' rollup row.
    Rising mean_d2 (vs the post-build baseline) means appended vectors
    no longer fit the trained cells — the rebuild trigger. ONE scan of
    the cells table joined to the broadcast centroid table; per-vector
    d2 terms are rounded then decimal-summed (exact.rsum12) so the
    metric is partition-order independent (same number on local[32]
    and a 1000-executor cluster)."""
    from ipydataclean_spark.functions import exact

    cents = spark.read.parquet(f"{path}/centroids")
    members = spark.read.parquet(f"{path}/cells")
    scored = members.join(
        F.broadcast(cents), members["cell"] == cents["cid"]
    ).select("cell", _sq_dist(F.col("embedding"), F.col("centroid")).alias("d2"))
    per_cell = scored.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(exact.rsum12("d2") / F.count(F.lit(1)), 8).alias("mean_d2"),
    )
    overall = scored.agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(exact.rsum12("d2") / F.count(F.lit(1)), 8).alias("mean_d2"),
    ).select(F.lit(-1).alias("cell"), "n_members", "mean_d2")
    return per_cell.select(F.col("cell").cast("int").alias("cell"), "n_members", "mean_d2").unionByName(
        overall
    ).orderBy("cell")


def ivf_knn_stored(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    k_neighbors: int = 5,
    nprobe: int = 4,
    where: F.Column | None = None,
) -> DataFrame:
    """kNN over a persisted IVF index. The probed-cell set is computed
    against the broadcast-small centroid table and collected (bounded:
    ≤ min(queries × nprobe, n_cells) values — index metadata, never
    row-scaled), then applied as a STATIC partition filter so the scan
    lists only probed cells' files (assert PartitionFilters in the
    plan). Exact cosine re-ranks within candidates.

    ``where`` is a metadata predicate over columns stored in the index
    (ivf_write meta_cols) — FILTERED vector search: the predicate is
    applied on the cells read, so it reaches the parquet scan as a
    pushed data filter alongside the partition filter (pre-filtering;
    post-filtering a top-k silently under-returns). Selective filters
    thin each probed cell's candidates — raise nprobe to buy recall
    back, the standard filtered-ANN tradeoff."""
    cents = spark.read.parquet(f"{path}/centroids")
    q = queries.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"))
    probe_rank = Window.partitionBy("query_id").orderBy("qd2", "cid")
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select("query_id", "q_emb", "cid", _sq_dist(F.col("q_emb"), F.col("centroid")).alias("qd2"))
        .withColumn("pr", F.row_number().over(probe_rank))
        .where(F.col("pr") <= nprobe)
        .select("query_id", "q_emb", F.col("cid").alias("cell"))
    )
    # probes feed BOTH the partition-filter collect and the broadcast
    # join; localCheckpoint materializes the tiny table once instead of
    # re-running the centroid read + scoring subtree per consumer.
    probes = probes.localCheckpoint()
    probed_cells = sorted({r.cell for r in probes.select("cell").distinct().collect()})
    assigned = spark.read.parquet(f"{path}/cells").where(F.col("cell").isin(probed_cells))
    if where is not None:
        assigned = assigned.where(where)
    cand = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_sim("q_emb", "embedding").alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k_neighbors)
        .select("query_id", "neighbor_id", "cos_sim")
    )


@register(
    "l3h_kmeans_assign",
    oracle=(
        "WITH cent AS (SELECT vec_id AS cell, embedding AS c_emb "
        "FROM embeddings WHERE vec_id < 8), "
        "scored AS (SELECT e.vec_id, cent.cell, "
        f"{cosine_sim_sql('e.embedding', 'cent.c_emb')} AS sim, "
        "ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY "
        f"{cosine_sim_sql('e.embedding', 'cent.c_emb')} DESC, cent.cell) AS rn "
        "FROM embeddings e CROSS JOIN cent) "
        "SELECT CAST(cell AS BIGINT) AS cell, "
        "CAST(COUNT(*) AS BIGINT) AS n_vectors, "
        "ROUND(" + exact.rsum12_sql("sim") + " / COUNT(*), 8) AS avg_sim "
        "FROM scored WHERE rn = 1 GROUP BY cell ORDER BY cell"
    ),
    tags=("L3", "clustering"),
)
def l3h_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3h: the k-means ASSIGNMENT step with a value-hash oracle —
    every embedding routed to its most-cosine-similar centroid (seed
    centroids = the 8 lowest vec_ids, the same deterministic seeding
    build_ivf uses), read out as per-cell population and mean
    similarity. The Lloyd TRAINING loop (build_ivf) is iterative and
    rows-only by the SURVEY §5.2 contract; this pins the exact
    arithmetic of the step the loop repeats — broadcast centroids,
    sequential-fold cosine in codegen (functions/vector.py keeps both
    engines' summation order identical), max_by argmax with a cell-id
    tie-break. At scale: the scored join is map-only (K centroids
    broadcast), the rollup is one K-row aggregate."""
    emb = T(spark, sf_dir, "embeddings")
    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb")
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "cell",
        cosine_sim("embedding", "c_emb").alias("sim"),
    )
    best = scored.groupBy("vec_id").agg(
        F.max_by(
            F.struct("cell", "sim"), F.struct(F.col("sim"), -F.col("cell"))
        ).alias("b")
    )
    return (
        best.select(F.col("b.cell").alias("cell"), F.col("b.sim").alias("sim"))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(exact.rsum12("sim") / F.count(F.lit(1)), 8).alias("avg_sim"),
        )
        .orderBy("cell")
    )


# ---------------------------------------------------------------------------
# L60 — cluster-balanced sampling (per-cell md5-ranked quota)
# ---------------------------------------------------------------------------

#: the l3h seed-centroid assignment, shared verbatim by the l60 oracle
_L60_ASSIGN_CTES = (
    "cent AS (SELECT vec_id AS cell, embedding AS c_emb "
    "FROM embeddings WHERE vec_id < 8), "
    "scored AS (SELECT e.vec_id, cent.cell, "
    "ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY "
    f"{cosine_sim_sql('e.embedding', 'cent.c_emb')} DESC, cent.cell) AS rn "
    "FROM embeddings e CROSS JOIN cent), "
    "assign AS (SELECT vec_id, CAST(cell AS BIGINT) AS cell "
    "FROM scored WHERE rn = 1)"
)

def seed_assign_cells(
    df: DataFrame,
    cent: DataFrame,
    id_col: str,
    emb_col: str,
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """The l3h seed-centroid COSINE argmax as a shared builder (named
    apart from the module's Lloyd-loop ``assign_cells``, which assigns
    by squared L2 against trained centroids): route every
    row of ``df`` to its most-cosine-similar centroid (broadcast
    ``cent``: (cell, c_emb)), ties to the lowest cell. ONE definition
    so l60 and the embedding-curation pipeline cannot fork the
    certified assignment arithmetic (review r09c)."""
    return (
        df.crossJoin(F.broadcast(cent))
        .select(id_col, *keep, "cell", cosine_sim(emb_col, "c_emb").alias("sim"))
        .groupBy(id_col, *keep)
        .agg(
            F.max_by(F.col("cell"), F.struct(F.col("sim"), -F.col("cell")))
            .cast("long")
            .alias("cell")
        )
    )


def quota_sample(asg: DataFrame, id_col: str, salt: str) -> DataFrame:
    """Per-cell md5-ranked quota draw over an assignment table
    (quota = the smallest cell): adds (n_cell, kept_rank) and keeps
    rank <= quota. The coin is the ONE shared md5 definition, salted
    per caller so independent draws stay independent."""
    sizes = asg.groupBy("cell").agg(F.count(F.lit(1)).alias("n_cell"))
    quota = sizes.agg(F.min("n_cell").alias("q"))
    coin = exact.md5_prefix_int(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    w = Window.partitionBy("cell").orderBy(coin, F.col(id_col))
    return (
        asg.join(sizes, "cell")
        .withColumn("kept_rank", F.row_number().over(w).cast("long"))
        .crossJoin(F.broadcast(quota))
        .where(F.col("kept_rank") <= F.col("q"))
    )


_L60_ORACLE = (
    "WITH " + _L60_ASSIGN_CTES + ", "
    "sizes AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_cell "
    "FROM assign GROUP BY cell), "
    "quota AS (SELECT MIN(n_cell) AS q FROM sizes), "
    "ranked AS (SELECT a.vec_id, a.cell, s.n_cell, "
    "CAST(ROW_NUMBER() OVER (PARTITION BY a.cell ORDER BY "
    + exact.md5_prefix_int_sql("'l60:' || CAST(a.vec_id AS VARCHAR)")
    + ", a.vec_id) AS BIGINT) AS kept_rank "
    "FROM assign a JOIN sizes s ON s.cell = a.cell) "
    "SELECT cell, vec_id, n_cell, kept_rank "
    "FROM ranked CROSS JOIN quota WHERE kept_rank <= q "
    "ORDER BY cell, vec_id"
)


@register(
    "l60_cluster_balanced_sample",
    oracle=_L60_ORACLE,
    tags=("L60", "L3", "L31", "sampling", "clustering"),
)
def l60_cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L60: cluster-balanced sampling — an equal md5-ranked quota from
    every k-means cell (quota = the smallest cell, so the draw is the
    largest exactly-balanced subset). The semantic-diversity sampler
    of the DataComp/SemDeDup recipes: where l31/l57 balance on
    METADATA (source, language), this balances on LEARNED structure,
    down-weighting over-represented semantic regions (the web's
    boilerplate clusters) without touching rare ones.

    Exactness: assignment reuses l3h's certified argmax arithmetic
    (broadcast seed centroids, sequential-fold cosine, cell-id
    tie-break); the per-cell draw ranks by md5_prefix_int — the ONE
    shared coin definition — so the sample is deterministic,
    hash-certified, and reproducible across cluster re-runs (the
    l39/r22d convention).

    Scale shape: map-only assignment (K centroids broadcast) + one
    cell-keyed window; the quota scalar is a K-row aggregate riding a
    broadcast. Cells are the IVF partition layout, so at 100 TB this
    runs as one pass over the stored cell-partitioned table
    (ivf_write) with no extra shuffle."""
    emb = T(spark, sf_dir, "embeddings")
    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb")
    )
    assign = seed_assign_cells(emb, cent, "vec_id", "embedding")
    return (
        quota_sample(assign, "vec_id", "l60:")
        .select("cell", "vec_id", "n_cell", "kept_rank")
        .orderBy("cell", "vec_id")
    )


# ---------------------------------------------------------------------------
# L36 — SemDeDup: cluster-then-dedup semantic deduplication
# ---------------------------------------------------------------------------

_L36_DUP_CTE = (
    # embeddings_dup's twin rule (llm.py) reconstructed in SQL: +0.1 on
    # coordinate vec_id % 64 (1-indexed lambda, hence i - 1), ids +1e6
    "dup AS (SELECT vec_id, embedding FROM embeddings UNION ALL "
    "SELECT vec_id + 1000000 AS vec_id, "
    "list_transform(embedding, (x, i) -> CAST(CAST(x AS DOUBLE) + "
    "CASE WHEN i - 1 = vec_id % 64 THEN 0.1 ELSE 0.0 END AS FLOAT)) "
    "AS embedding FROM embeddings WHERE vec_id % 5 = 0)"
)

_L36_ORACLE = (
    "WITH " + _L36_DUP_CTE + ", "
    # K grows with the corpus UNCAPPED (cells stay ~75 bounded — the
    # pair join is sum-over-cells |cell|^2, so any FIXED K would
    # re-quadratize at scale); assignment is TWO-LEVEL (coarse k1 =
    # ceil(sqrt(k)) seeds, then fine within the coarse group) so the
    # per-vector assignment work is ~2*sqrt(K), not K.
    # per-vector norms computed ONCE (dupn/cent/coarse), reused by both
    # the assignment and the pair stage: cos = dot/(na*nb) — the
    # identical doubles the inline cosine form yields
    "dupn AS (SELECT vec_id, embedding, "
    f"{norm_sql('embedding')} AS nd FROM dup), "
    "kc AS (SELECT GREATEST(8, CAST(FLOOR(COUNT(*) / 75.0) AS BIGINT)) AS k, "
    "CAST(CEIL(SQRT(GREATEST(8, FLOOR(COUNT(*) / 75.0)))) AS BIGINT) AS k1 "
    "FROM dup), "
    "cent AS (SELECT vec_id AS cell, embedding AS c_emb, "
    f"{norm_sql('embedding')} AS ncn "
    "FROM embeddings CROSS JOIN kc WHERE vec_id < kc.k), "
    "coarse AS (SELECT vec_id AS gcell, embedding AS g_emb, "
    f"{norm_sql('embedding')} AS gn "
    "FROM embeddings CROSS JOIN kc WHERE vec_id < kc.k1), "
    # each fine centroid belongs to its nearest coarse seed
    "centg AS (SELECT cell, c_emb, ncn, gcell FROM ("
    "SELECT c.cell, c.c_emb, c.ncn, g.gcell, "
    "ROW_NUMBER() OVER (PARTITION BY c.cell ORDER BY "
    f"({dot_sql('c.c_emb', 'g.g_emb')} / (c.ncn * g.gn)) "
    "DESC, g.gcell) AS rn FROM cent c CROSS JOIN coarse g) s WHERE rn = 1), "
    # vector -> nearest coarse seed (n x k1)
    "vg AS (SELECT vec_id, gcell FROM ("
    "SELECT d.vec_id, g.gcell, "
    "ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY "
    f"({dot_sql('d.embedding', 'g.g_emb')} / (d.nd * g.gn)) "
    "DESC, g.gcell) AS rn FROM dupn d CROSS JOIN coarse g) s WHERE rn = 1), "
    # vector -> nearest fine centroid WITHIN its coarse group
    "asg AS (SELECT vec_id, embedding, nd, cell FROM ("
    "SELECT d.vec_id, d.embedding, d.nd, c.cell, "
    "ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY "
    f"({dot_sql('d.embedding', 'c.c_emb')} / (d.nd * c.ncn)) "
    "DESC, c.cell) AS rn "
    "FROM dupn d JOIN vg ON d.vec_id = vg.vec_id "
    "JOIN centg c ON c.gcell = vg.gcell) s WHERE rn = 1), "
    "pairs AS (SELECT * FROM (SELECT a.cell, a.vec_id AS ka, b.vec_id AS kb, "
    f"({dot_sql('a.embedding', 'b.embedding')} / (a.nd * b.nd)) AS cs "
    "FROM asg a JOIN asg b ON a.cell = b.cell AND a.vec_id < b.vec_id) p "
    "WHERE cs >= 0.98) "
    "SELECT kb AS vec_id, cell, ka AS keeper_id, ROUND(cs, 8) AS cos_sim "
    "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY kb ORDER BY cs DESC, ka) "
    "AS rn FROM pairs) t WHERE rn = 1 ORDER BY vec_id"
)


def semdedup_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The l36 cluster-assignment stage, exposed for the scale gate:
    (vec_id, embedding, nrm, cell) with K = floor(n/75) uncapped and
    two-level coarse->fine seeding (see l36_semdedup docstring).
    tests/test_extras_r6.py pins |cell| bounded at sf1."""
    from ipydataclean_spark.operators.llm import embeddings_dup

    vecs = embeddings_dup(spark, sf_dir).select("vec_id", "embedding")
    # per-vector norms computed ONCE, reused by the assignment AND the
    # pair stage (cos = dot/(na*nb): the identical doubles the inline
    # cosine form yields, at a third of the per-pair fold work)
    vecs = vecs.withColumn("nd", vnorm("embedding"))
    # adaptive K (= floor(n/75), floored at 8, UNCAPPED) keeps |cell|
    # ~75 bounded as the corpus grows; k1 = ceil(sqrt(K)) coarse seeds
    # keep the assignment sub-quadratic — computed DECLARATIVELY
    # (1-row agg broadcast into the seed filters), no eager count
    kdf = vecs.agg(
        F.greatest(F.lit(8), F.floor(F.count(F.lit(1)) / F.lit(75.0)))
        .cast("long")
        .alias("k")
    ).withColumn("k1", F.ceil(F.sqrt(F.col("k"))).cast("long"))
    emb = T(spark, sf_dir, "embeddings")
    cent = (
        emb.crossJoin(F.broadcast(kdf))
        .where(F.col("vec_id") < F.col("k"))
        .select(F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb"))
        .withColumn("ncn", vnorm("c_emb"))
    )
    coarse = (
        emb.crossJoin(F.broadcast(kdf))
        .where(F.col("vec_id") < F.col("k1"))
        .select(F.col("vec_id").alias("gcell"), F.col("embedding").alias("g_emb"))
        .withColumn("gn", vnorm("g_emb"))
    )
    # each fine centroid belongs to its nearest coarse seed (K x k1,
    # tiny — both sides broadcastable)
    centg = (
        cent.crossJoin(F.broadcast(coarse))
        .select(
            "cell", "c_emb", "ncn", "gcell",
            (vdot("c_emb", "g_emb") / (F.col("ncn") * F.col("gn"))).alias("gs"),
        )
        .groupBy("cell")
        .agg(
            F.first("c_emb").alias("c_emb"),
            F.first("ncn").alias("ncn"),
            F.max_by("gcell", F.struct(F.col("gs"), (-F.col("gcell")).alias("ng"))).alias("gcell"),
        )
    )
    # scored rows are SLIM (vec_id, gcell/cell, sim): carrying the
    # 64-float embedding through the fanout would multiply the argmax
    # shuffle's bytes by the fanout (measured 26.9 -> 50.5 s at sf1);
    # the winning key joins back to the vector table instead
    g_scored = vecs.crossJoin(F.broadcast(coarse)).select(
        "vec_id",
        "gcell",
        (vdot("embedding", "g_emb") / (F.col("nd") * F.col("gn"))).alias("sim"),
    )
    gbest = g_scored.groupBy("vec_id").agg(
        F.max_by("gcell", F.struct(F.col("sim"), (-F.col("gcell")).alias("ng"))).alias("gcell"),
    )
    # fine scoring touches ONLY the coarse group's centroids (~sqrt(K)
    # of them) — broadcast hash join on the group id, fanout |group|
    fine_scored = (
        vecs.join(gbest, "vec_id")
        .join(F.broadcast(centg), "gcell")
        .select(
            "vec_id",
            "cell",
            (vdot("embedding", "c_emb") / (F.col("nd") * F.col("ncn"))).alias("sim"),
        )
    )
    best = fine_scored.groupBy("vec_id").agg(
        F.max_by("cell", F.struct(F.col("sim"), (-F.col("cell")).alias("nc"))).alias("cell"),
    )
    asg = vecs.join(best, "vec_id").select(
        "vec_id", "embedding", F.col("nd").alias("nrm"), "cell"
    )
    return asg


@register(
    "l36_semdedup",
    oracle=_L36_ORACLE,
    tags=("L36", "L4", "L2", "dedup", "clustering"),
)
def l36_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L36: SemDeDup — semantic deduplication by CLUSTER-then-dedup
    (Abbas et al. 2023, public method): assign every embedding to its
    nearest centroid, compute pairwise cosine ONLY WITHIN each cell,
    and drop any vector with a higher-id twin above tau = 0.98
    (llm.NEARDUP_TAU), reported with its keeper and similarity. The
    within-cell restriction is the whole trick: the pair join is
    sum-over-cells of |cell|^2 instead of corpus^2 — and K GROWS with
    the corpus UNCAPPED (floor(n/75), floored at 8) so |cell| stays
    ~75 bounded and the pair volume stays ~linear at ANY corpus size
    (VERDICT r05 #3: the old [8, 64] clamp re-quadratized the pair
    join past ~5k vectors). The assignment is kept sub-quadratic by a
    TWO-LEVEL coarse quantizer (the standard IVF/IMI trick): k1 =
    ceil(sqrt(K)) coarse seeds partition the K fine centroids into
    groups; each vector scores the k1 coarse seeds, then only the
    fine centroids of its coarse group — ~2*sqrt(K) cosines per
    vector instead of K, so total assignment work is O(n*sqrt(n)),
    and at sf1 (K=320, k1=18, ~36 cosines/row) it is CHEAPER than
    the old capped K=64 brute force. Cell id = partition key; each
    cell's pair block is independent — the embedding-dedup shape that
    survives 100 TB. Per-vector norms are computed once and carried
    into both stages (cos = dot/(na*nb), bit-identical to the inline
    form — measured 6.6 -> 2.9 s sf0.1 together with keeping the
    assignment fanout SLIM: scored rows are (vec_id, cell/gcell, sim)
    only, the winning cell joins back to the vector table; carrying
    the 64-float array through the n x K fanout doubled sf1 wall
    time. An unrolled getItem dot (flat 64-term codegen tree)
    measured 3x SLOWER than the zip_with/aggregate fold — negative
    result, see BENCH.md).

    Inputs are llm.embeddings_dup (base fixture max off-diagonal
    cosine is 0.51 — no true near-dups to find) and the deterministic
    seed centroids l3h/build_ivf use (lowest base vec_ids), so the
    assignment, the pair set, and the keeper choice are all exactly
    reproducible in SQL: the oracle reconstructs the twin injection
    with an indexed list lambda and must match keeper ids AND
    ROUND(cos, 8) values. A twin whose cell differs from its base's
    would be missed IDENTICALLY by both engines (the documented
    SemDeDup recall tradeoff; the recall test pins it non-vacuous)."""
    from ipydataclean_spark.operators.llm import NEARDUP_TAU

    asg = semdedup_assign(spark, sf_dir)
    a = asg.select(
        "cell", F.col("vec_id").alias("ka"), F.col("embedding").alias("ea"),
        F.col("nrm").alias("na"),
    )
    b = asg.select(
        "cell", F.col("vec_id").alias("kb"), F.col("embedding").alias("eb"),
        F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("ka") < F.col("kb"))
        .select(
            "cell", "ka", "kb",
            (vdot("ea", "eb") / (F.col("na") * F.col("nb"))).alias("cs"),
        )
        .where(F.col("cs") >= F.lit(NEARDUP_TAU))
    )
    keep = F.max_by(
        F.struct(F.col("ka").alias("keeper_id"), F.col("cs").alias("cs")),
        F.struct(F.col("cs"), (-F.col("ka")).alias("nk")),
    )
    return (
        pairs.groupBy("kb", "cell")
        .agg(keep.alias("k"))
        .select(
            F.col("kb").alias("vec_id"),
            "cell",
            F.col("k.keeper_id").alias("keeper_id"),
            F.round(F.col("k.cs"), 8).alias("cos_sim"),
        )
        .orderBy("vec_id")
    )


_L41_ORACLE = (
    "WITH " + _L36_DUP_CTE + ", "
    "bench AS (SELECT vec_id AS bench_id, embedding AS b_emb "
    "FROM embeddings WHERE vec_id < 25), "
    "scored AS (SELECT d.vec_id, bench.bench_id, "
    f"{cosine_sim_sql('d.embedding', 'bench.b_emb')} AS cs "
    "FROM dup d CROSS JOIN bench WHERE d.vec_id >= 25), "
    "best AS (SELECT vec_id, bench_id, cs, "
    "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cs DESC, bench_id) AS rn "
    "FROM scored) "
    "SELECT vec_id, bench_id AS matched_benchmark, ROUND(cs, 8) AS cos_sim "
    "FROM best WHERE rn = 1 AND cs >= 0.98 ORDER BY vec_id"
)


@register(
    "l41_embed_decontaminate",
    oracle=_L41_ORACLE,
    tags=("L41", "L26", "L4", "dedup", "curation"),
)
def l41_embed_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L41: EMBEDDING-level benchmark decontamination — the semantic
    sibling of l26's n-gram check: flag every corpus vector whose
    cosine to ANY benchmark vector reaches tau = 0.98, with the
    matched benchmark id and similarity (paraphrased or re-formatted
    contamination that shares no 8-gram still lands next to its
    source in embedding space — the reason modern decontamination
    runs both checks). Benchmark = the 25 lowest base vec_ids;
    corpus = llm.embeddings_dup minus the benchmark itself, so the
    injected twins of benchmark members are the known contamination
    the fixture plants.

    Plan: the benchmark table BROADCASTS (benchmarks are tiny relative
    to any training corpus) and scoring is MAP-ONLY over the corpus —
    one pass, no shuffle except the per-vector argmax partial agg; at
    100 TB this pipelines with the quality-filter scan. For benchmark
    sets too big to broadcast, l4b's banded hyperplane LSH is the
    same check sub-quadratically."""
    from ipydataclean_spark.operators.llm import NEARDUP_TAU, embeddings_dup

    corpus = (
        embeddings_dup(spark, sf_dir)
        .where(F.col("vec_id") >= 25)
        .select("vec_id", "embedding")
    )
    bench = (
        T(spark, sf_dir, "embeddings")
        .where(F.col("vec_id") < 25)
        .select(F.col("vec_id").alias("bench_id"), F.col("embedding").alias("b_emb"))
    )
    scored = corpus.crossJoin(F.broadcast(bench)).select(
        "vec_id", "bench_id", cosine_sim("embedding", "b_emb").alias("cs")
    )
    best = scored.groupBy("vec_id").agg(
        F.max_by(
            F.struct(F.col("bench_id"), F.col("cs")),
            F.struct(F.col("cs"), (-F.col("bench_id")).alias("nb")),
        ).alias("m")
    )
    return (
        best.select(
            "vec_id",
            F.col("m.bench_id").alias("matched_benchmark"),
            F.col("m.cs").alias("cs"),
        )
        .where(F.col("cs") >= F.lit(NEARDUP_TAU))
        .select("vec_id", "matched_benchmark", F.round("cs", 8).alias("cos_sim"))
        .orderBy("vec_id")
    )
