"""Similarity-search strategy facade — SURVEY §7(6a), recipe-level.

The engine carries four kNN physical strategies with one logical
contract ((query_id, neighbor_id, cos_sim) top-k):

  exact  — brute-force broadcast kernel (llm.knn_exact shape): O(n·q),
           unbeatable under ~10^5 stored vectors where the scan is one
           task wave anyway, and the correctness oracle for the rest;
  lsh    — hyperplane-LSH banding (llm.l3b shape): sub-quadratic
           candidate generation, recall tuned by bands;
  ivf    — k-means cells + nprobe probing (ivf.ivf_knn): the stored-
           table shape — cells are partition keys, probing is partition
           pruning;
  pq     — product-quantized ADC (ivf.pq_knn): compressed-domain
           scoring for when even the raw vectors are too big to scan.

``choose_strategy`` encodes the dispatch rule the SURVEY deferred to a
Catalyst rewrite: it needs only a row-count ESTIMATE (catalog stats or
a cached count — never a fresh O(n) job at plan time). ``knn`` applies
it. A Catalyst `extraOptimizations` rule would pattern-match the
crossJoin+rank plan instead; the facade keeps the same decision in
plain Python where it is testable and explainable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ipydataclean_spark.functions.vector import cosine_sim

#: below this, brute force wins (one task wave, zero index build cost)
EXACT_LIMIT = 100_000
#: above this, raw-vector scans dominate: go compressed-domain
PQ_LIMIT = 50_000_000


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cos_sim")
    )


def knn_exact(vectors: DataFrame, queries: DataFrame, k_neighbors: int = 5) -> DataFrame:
    """Brute-force cosine top-k, query side broadcast (the l3 shape)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    e = vectors.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("e_emb")
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_sim("q_emb", "e_emb").alias("cos_sim"))
    )
    return _topk(scored, k_neighbors)


#: plane-constant cache: (dim, n_planes) -> list[float] (session-independent
#: values — pure xxhash64 of the plane×coordinate index)
_PLANE_CACHE: dict[tuple[int, int], list[float]] = {}


def _plane_constants(spark, dim: int, n_planes: int) -> list[float]:
    """The xxhash64-derived projection constants, pulled ONCE per
    (dim, n_planes) via a single-row Spark job (bounded metadata pull —
    dim × n_planes doubles, never row-scaled). Derivation is identical
    to the original in-plan expression, so signatures are reproducible
    across sessions, clusters, and retries."""
    key = (dim, n_planes)
    if dim * n_planes == 0:
        # sequence(0, -1) would yield [0, -1], not an empty list —
        # keep the degenerate layout's contract of zero planes
        return []
    if key not in _PLANE_CACHE:
        # ONE transform expression, not dim*n_planes separate exprs:
        # the 768-column array literal form spent ~8.6 s in codegen
        # compilation for this single-row job (measured round 7;
        # transform form 0.44 s, bit-identical values — sequence
        # elements hash exactly like the int literals did)
        row = spark.range(1).select(
            F.transform(
                F.sequence(F.lit(0), F.lit(dim * n_planes - 1)),
                lambda i: F.xxhash64(i).cast("double") / F.lit(float(2**63)),
            ).alias("p")
        ).first()
        _PLANE_CACHE[key] = list(row.p)
    return _PLANE_CACHE[key]


def hyperplane_bands(
    df: DataFrame,
    dim: int = 64,
    n_bands: int = 12,
    band_bits: int = 4,
) -> DataFrame:
    """(vec_id, embedding, band_id, band_val) sign-sketch banding.

    Projections are derived from xxhash64 of the plane/coordinate index
    — deterministic across sessions and cluster re-runs, no RNG state
    to ship. The n_bands×band_bits sign dots are ONE Arrow-batched
    numpy matmul per partition (a deliberate pandas-UDF exception to
    the builtins-first rule: as an in-plan expression tree the
    96-plane × 64-dim fold chain exceeds codegen limits and fell back
    to interpreted eval — measured 49 s for 19k rows at sf0.1 vs
    sub-second vectorized). Explode then fans each vector to its
    n_bands (band, bucket) rows. Shared by the kNN probe path
    (knn_lsh) and the near-dup pair self-join (llm.l4b)."""
    from pyspark.sql import SparkSession

    spark = df.sparkSession if hasattr(df, "sparkSession") else SparkSession.getActiveSession()
    n_planes = n_bands * band_bits
    flat = _plane_constants(spark, dim, n_planes)

    @F.pandas_udf("array<bigint>")
    def band_vals(emb: pd.Series) -> pd.Series:
        import numpy as np

        planes = np.array(flat, dtype=np.float64).reshape(n_planes, dim)
        if len(emb) == 0:  # zero-row Arrow batch: shape-(0,) array would
            return pd.Series([], dtype=object)  # break the matmul below
        mat = np.array(emb.tolist(), dtype=np.float64).reshape(len(emb), dim)
        bits = (mat @ planes.T) > 0  # (n, n_planes)
        weights = (1 << np.arange(band_bits, dtype=np.int64))
        vals = bits.reshape(len(mat), n_bands, band_bits).astype(np.int64) @ weights
        return pd.Series(list(vals))

    # NULL or wrong-dimension embeddings would make the batch matrix
    # ragged and crash the matmul; drop them up front (the old in-plan
    # expression form null-propagated to the same no-candidates effect).
    clean = df.where(F.col("embedding").isNotNull() & (F.size("embedding") == dim))
    return (
        clean.select("vec_id", "embedding", band_vals("embedding").alias("bv"))
        .select("vec_id", "embedding", F.posexplode("bv").alias("band_id", "band_val"))
    )


def knn_lsh(
    vectors: DataFrame,
    queries: DataFrame,
    k_neighbors: int = 5,
    dim: int = 64,
    n_bands: int = 12,
    band_bits: int = 4,
) -> DataFrame:
    """Hyperplane-LSH candidates (multi-band OR), exact re-rank — the
    l3b shape with deterministic hash-derived planes."""

    def banded(df: DataFrame) -> DataFrame:
        return hyperplane_bands(df, dim=dim, n_bands=n_bands, band_bits=band_bits)

    bq = banded(queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"), "band_id", "band_val"
    )
    cand = (
        banded(vectors).join(F.broadcast(bq), ["band_id", "band_val"])
        .where(F.col("vec_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "vec_id"])
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine_sim("q_emb", "embedding").alias("cos_sim"),
        )
    )
    return _topk(cand, k_neighbors)


def choose_strategy(n_vectors: int, stored_table: bool = False) -> str:
    """Pick the kNN physical strategy for an estimated corpus size.

    ``stored_table=True`` means the vectors live in a table that will
    be queried repeatedly — index build cost amortizes, and IVF's
    cell-partitioned layout (partition pruning per probe) beats LSH's
    per-query banding."""
    if n_vectors <= EXACT_LIMIT:
        return "exact"
    if n_vectors > PQ_LIMIT:
        return "pq"
    return "ivf" if stored_table else "lsh"


def knn(
    vectors: DataFrame,
    queries: DataFrame,
    k_neighbors: int = 5,
    strategy: str = "auto",
    n_vectors: int | None = None,
    stored_table: bool = False,
) -> DataFrame:
    """Top-k cosine neighbors under the chosen (or auto) strategy.

    ``n_vectors`` is the planning estimate for auto mode; falls back to
    a count only if absent (fine interactively, pass it in pipelines).
    """
    if strategy == "auto":
        if n_vectors is None:
            n_vectors = vectors.count()
        strategy = choose_strategy(n_vectors, stored_table)
    if strategy == "exact":
        return knn_exact(vectors, queries, k_neighbors)
    if strategy == "lsh":
        return knn_lsh(vectors, queries, k_neighbors)
    if strategy == "ivf":
        from ipydataclean_spark.operators.ivf import ivf_knn

        return ivf_knn(vectors, queries, k_neighbors)
    if strategy == "pq":
        from ipydataclean_spark.operators.ivf import pq_knn

        return pq_knn(vectors, queries, k_neighbors)
    raise ValueError(f"unknown kNN strategy: {strategy!r}")
