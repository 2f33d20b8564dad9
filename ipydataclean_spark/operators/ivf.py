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

from ipydataclean_spark.functions.vector import cosine_sim
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
