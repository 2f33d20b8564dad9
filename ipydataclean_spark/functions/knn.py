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


#: hard cap on the collected candidate side of the vectorized exact
#: kernel — 2^17 rows x 64 dims x 8 B ≈ 67 MB per worker. Past this,
#: brute force against a broadcast side is the wrong physical strategy
#: anyway (use ivf/lsh candidates); failing loud here beats an executor
#: OOM at scale (the one_hot max_categories convention).
EXACT_CAND_CAP = 1 << 17

#: screen slack for the matmul pre-pass: a BLAS dot of <=4096 float64
#: terms differs from the sequential fold by < gamma_n * sum|a_i*c_i|
#: ~ 1e-12 relative worst-case at dim 64-4096; 1e-6 is six orders of
#: safety while keeping the screened superset within a whisker of the
#: true survivor set (cosines land nowhere near 1e-6 of a threshold
#: in any real corpus — and if one did, the EXACT recompute still
#: decides it correctly; the margin only risks missing a pair if the
#: BLAS error exceeded it, hence the 10^6 safety factor).
SCREEN_MARGIN = 1e-6


def topk_per_row_exact(
    part: DataFrame,
    cand: DataFrame,
    k: int | None,
    *,
    exclude_self: bool = False,
    min_cos: float | None = None,
    only_greater: bool = False,
    part_payload: tuple[tuple[str, str], ...] = (),
    cand_payload: tuple[tuple[str, str], ...] = (),
) -> DataFrame:
    """Per-row exact cosine top-k against a BOUNDED candidate set —
    the certified-exact sibling of ``hyperplane_bands``' matmul
    exception. The in-plan ``aggregate(zip_with(...))`` fold is outside
    whole-stage codegen (interpreted per element: measured 334 s for a
    40M-pair audit at sf1); this kernel keeps the numbers bit-identical
    while scoring at BLAS speed: a matmul SCREEN picks a
    margin-guaranteed superset of survivors (SCREEN_MARGIN), and the
    certified ascending-dimension fold recomputes only those pairs —
    so every EMITTED cosine still equals the sequential fold to the
    last ulp (round 10; the full-matrix fold was dim memory-bound
    passes over the pair matrix — 35 s vs 0.3 s per chunk at the sf10
    block size).

    Bit-exactness contract (what keeps oracles hash-green on top of
    this kernel): dot products accumulate a_i*b_i in ascending
    dimension order — ``acc += A[:, i] ⊗ B[:, i]`` per dimension —
    and norms square-accumulate in the same order, so every
    cosine equals the sequential left fold of functions/vector.py
    (and dot_sql's list_sum) to the last ulp: IEEE adds/muls in the
    same order are deterministic regardless of vectorization.

    part: (id BIGINT, emb ARRAY<FLOAT>) + declared payload columns —
    stays distributed; each row's top-k is complete locally (no merge
    pass), since every candidate rides the closure.
    cand: same shape — COLLECTED (bounded by EXACT_CAND_CAP, asserted).
    Ties break (cos DESC, cand id ASC), matching the window-rank
    convention everywhere else. ``exclude_self`` drops id==id pairs
    (self-neighbor) before ranking.

    ``k=None`` emits every surviving candidate (use with ``min_cos``,
    the threshold-pair mode: l4-shaped similarity joins where the
    output is bounded by the match set, not by a k). ``min_cos``
    drops pairs below the threshold BEFORE ranking; ``only_greater``
    keeps only cand id > part id (the self-join dedup convention,
    a.vec_id < b.vec_id).

    Returns part payloads + (part_id, cand_id, cand payloads,
    cos_sim DOUBLE, rn INT 1..k).
    """
    import numpy as np

    cand_cols = [c for c, _ in cand_payload]
    # limit(cap+1) bounds DRIVER memory BEFORE the pull — collecting
    # first and counting after would OOM on exactly the oversized side
    # this guard exists to reject (review: fail loud BEFORE the harm)
    cand_rows = cand.select("id", "emb", *cand_cols).limit(EXACT_CAND_CAP + 1).collect()
    if len(cand_rows) > EXACT_CAND_CAP:
        raise ValueError(
            f"topk_per_row_exact: candidate side exceeds {EXACT_CAND_CAP} rows; "
            "use the lsh/ivf candidate paths instead"
        )
    c_ids = np.array([r.id for r in cand_rows], dtype=np.int64)
    c_mat = np.array([list(r.emb) for r in cand_rows], dtype=np.float64)
    m, dim = (c_mat.shape if c_mat.size else (0, 0))
    c_norm = np.zeros(m, dtype=np.float64)
    for i in range(dim):  # sequential square-accumulate = norm() fold
        c_norm += c_mat[:, i] * c_mat[:, i]
    c_norm = np.sqrt(c_norm)
    # NaN cosines (zero-norm or NaN embeddings) would silently DIVERGE
    # from the certified engines: DuckDB/Spark sort NaN greatest, the
    # kernel's lexsort+isnan-break would drop them. No fixture or sane
    # corpus has them; reject loudly instead of de-certifying quietly.
    if m and not (np.isfinite(c_norm).all() and (c_norm > 0.0).all()):
        raise ValueError(
            "topk_per_row_exact: candidate side has zero-norm or non-finite "
            "embeddings — cosine is undefined (NaN) and the kernel's NaN "
            "exclusion would diverge from the oracle's NaN-greatest ordering"
        )
    c_pay = {c: np.array([r[c] for r in cand_rows]) for c in cand_cols}

    part_cols = [c for c, _ in part_payload]
    out_schema = ", ".join(
        [f"{c} {t}" for c, t in part_payload]
        + ["part_id bigint", "cand_id bigint"]
        + [f"{c} {t}" for c, t in cand_payload]
        + ["cos_sim double", "rn int"]
    )

    def _kernel(batches):
        import numpy as np  # worker-side; closure stays self-contained

        # chunk the Arrow batch so the (rows x m) score block stays
        # ~160 MB: a 10k-row batch against a 20k-vector candidate side
        # would otherwise allocate 1.6 GB x3 temporaries PER TASK and
        # swap-thrash concurrent tasks once the part side is spread
        # across all cores
        chunk = max(1, int(2e7 // max(m, 1)))
        # SCREEN machinery (round 10): one BLAS matmul scores every
        # pair to within ~1e-13 (64-term fp dot); SCREEN_MARGIN then
        # keeps a guaranteed SUPERSET of the true survivors, and the
        # certified ascending-dimension fold recomputes ONLY the kept
        # pairs — emitted cosines stay bit-identical to the pre-screen
        # kernel while the full-matrix work runs at matmul speed
        # (measured at the sf10 block size, 190 x 105k: the fold took
        # 35 s/chunk). Both sides are PRE-normalized so the matmul
        # yields screen cosines directly, and the big (rows x m)
        # buffers are allocated ONCE and reused across chunks —
        # per-chunk 160 MB temporaries measured 10 s EACH under this
        # host's huge-page compaction (div 10.2 s, partition-copy
        # 9.7 s vs 0.4 s for the matmul itself).
        c_hat_t = np.ascontiguousarray((c_mat / c_norm[:, None]).T) if m else None
        scr_buf = None
        kth_buf = None
        for whole in batches:
            for lo in range(0, len(whole), chunk):
                pdf = whole.iloc[lo : lo + chunk]
                n = len(pdf)
                if n == 0 or m == 0:
                    continue
                p_ids = pdf["id"].to_numpy(dtype=np.int64)
                # stack the per-row embedding arrays directly (float32
                # -> float64 widening is exact; identical values to the
                # old per-row list() conversion, measured ~6x faster)
                a = np.array(pdf["emb"].tolist(), dtype=np.float64)
                a_norm = np.zeros(n, dtype=np.float64)
                for i in range(dim):  # sequential square-accumulate fold
                    a_norm += a[:, i] * a[:, i]
                if not (np.isfinite(a_norm).all() and (a_norm > 0.0).all()):
                    raise ValueError(
                        "topk_per_row_exact: part side has zero-norm or "
                        "non-finite embeddings — cosine undefined (NaN)"
                    )
                if scr_buf is None or n > scr_buf.shape[0]:
                    scr_buf = np.empty((n, m))
                    # the partition scratch is only needed in k-mode;
                    # threshold-mode tasks skip its 160 MB entirely
                    kth_buf = np.empty_like(scr_buf) if k is not None else None
                scr = np.matmul(a / np.sqrt(a_norm)[:, None], c_hat_t, out=scr_buf[:n])
                if exclude_self:
                    scr[p_ids[:, None] == c_ids[None, :]] = -np.inf
                if only_greater:
                    scr[c_ids[None, :] <= p_ids[:, None]] = -np.inf
                if min_cos is not None:
                    scr[scr < min_cos - SCREEN_MARGIN] = -np.inf
                if k is not None and k <= m:
                    # per-row k-th largest screen value (in-place
                    # partition on the reused buffer); keep everything
                    # within 2*margin of it so exact ties survive
                    tmp = kth_buf[:n]
                    tmp[:] = scr
                    tmp.partition(m - k, axis=1)
                    kth = tmp[:, m - k]
                    # scr > -inf: a -inf threshold (row with < k
                    # survivors) must not resurrect masked pairs
                    keep_mask = (
                        scr >= (kth[:, None] - 2.0 * SCREEN_MARGIN)
                    ) & (scr > -np.inf)
                else:
                    keep_mask = scr > -np.inf
                rows_idx, cols_idx = np.nonzero(keep_mask)
                if len(rows_idx) == 0:
                    continue
                # EXACT recompute on the kept pairs: same per-pair
                # ascending-dimension op order as the original fold —
                # blocking over PAIRS never reorders a single pair's sum
                ap = a[rows_idx]
                cp = c_mat[cols_idx]
                acc = np.zeros(len(rows_idx), dtype=np.float64)
                for i in range(dim):
                    acc += ap[:, i] * cp[:, i]
                cos_kept = acc / (
                    np.sqrt(a_norm)[rows_idx] * c_norm[cols_idx]
                )
                if min_cos is not None:
                    ok = cos_kept >= min_cos  # the EXACT threshold
                    rows_idx, cols_idx, cos_kept = (
                        rows_idx[ok], cols_idx[ok], cos_kept[ok],
                    )
                if len(rows_idx) == 0:
                    continue
                kept_cids = c_ids[cols_idx]
                order = np.lexsort((kept_cids, -cos_kept, rows_idx))
                # per-row rank in the (row, -cos, cand_id) order, fully
                # vectorized (round 13, guide §4.2 — the old per-pair
                # Python loop with per-element .iloc payload gathers was
                # the kernel's emit bottleneck in threshold mode). Same
                # selection (first k per row in `order`), same rn
                # values, same output row order as the loop it replaces.
                rs = rows_idx[order]
                n_out = len(rs)
                first = np.empty(n_out, dtype=bool)
                first[0] = True
                first[1:] = rs[1:] != rs[:-1]
                grp_start = np.maximum.accumulate(
                    np.where(first, np.arange(n_out), 0)
                )
                rn_all = np.arange(n_out) - grp_start + 1
                if k is not None:
                    keep = rn_all <= k
                    sel, rn_sel = order[keep], rn_all[keep]
                else:
                    sel, rn_sel = order, rn_all
                r_sel = rows_idx[sel]
                out = {}
                for c in part_cols:
                    out[c] = pdf[c].to_numpy()[r_sel]
                out["part_id"] = p_ids[r_sel]
                out["cand_id"] = kept_cids[sel]
                for c in cand_cols:
                    out[c] = c_pay[c][cols_idx[sel]]
                out["cos_sim"] = cos_kept[sel]
                out["rn"] = rn_sel
                res = pd.DataFrame(out)
                for col, dt in np_types.items():
                    res[col] = res[col].astype(dt)
                yield res

    np_map = {"bigint": "int64", "int": "int32", "double": "float64"}
    np_types = {
        c: np_map[t]
        for c, t in (
            list(part_payload)
            + [("part_id", "bigint"), ("cand_id", "bigint")]
            + list(cand_payload)
            + [("cos_sim", "double"), ("rn", "int")]
        )
        if t in np_map
    }
    # a small part side arrives as 1-2 parquet splits — without a
    # spread the whole score job runs on one core (measured: d22's
    # 400M-pair audit never finished a 580 s budget single-task).
    # Round-robin repartition is result-neutral: every row's top-k is
    # computed independently against the full candidate closure.
    spread = part.sparkSession.sparkContext.defaultParallelism
    return (
        part.select("id", "emb", *part_cols)
        .repartition(spread)
        .mapInPandas(_kernel, out_schema)
    )


def cosine_score_pairs(
    pairs: DataFrame, emb_a: str = "emb_a", emb_b: str = "emb_b",
    out: str = "cos_sim",
) -> DataFrame:
    """Exact cosine over PAIR ROWS, vectorized (round 13, guide §4.2):
    replaces the in-plan ``cosine_sim(emb_a, emb_b)`` on candidate-
    verify stages, whose ``aggregate(zip_with(...))`` folds evaluate
    interpreted per element (measured 10.9 s for l4e's 1.78M-pair
    verify at sf1). Per pair the kernel accumulates dot and both
    squared norms in ascending-dimension order and divides as
    ``dot / (sqrt(na) * sqrt(nb))`` — the IDENTICAL IEEE op sequence
    as functions/vector.cosine_sim's sequential folds, so scores are
    bit-identical and dot_sql-certified oracles stay hash-green.

    Input: any passthrough columns plus the two array<float/double>
    embedding columns. Output: the passthrough columns (same order)
    plus ``out`` DOUBLE. Project the pair table to just what the
    verify needs before calling (the embeddings are dropped on the
    way out)."""
    keep = [f for f in pairs.schema.fields if f.name not in (emb_a, emb_b)]
    names = [f.name for f in keep]
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in keep] + [f"{out} double"]
    )

    def _score(batches):
        import numpy as np

        for pdf in batches:
            if len(pdf) == 0:
                continue
            a = np.array(pdf[emb_a].tolist(), dtype=np.float64)
            b = np.array(pdf[emb_b].tolist(), dtype=np.float64)
            d = np.zeros(len(a))
            na = np.zeros(len(a))
            nb = np.zeros(len(a))
            for i in range(a.shape[1]):  # ascending-dimension folds
                d += a[:, i] * b[:, i]
                na += a[:, i] * a[:, i]
                nb += b[:, i] * b[:, i]
            res = pdf[names].copy()
            res[out] = d / (np.sqrt(na) * np.sqrt(nb))
            yield res

    return pairs.mapInPandas(_score, schema)


#: blocked-mode fill target: blocks are cut at 80% of the cap so the
#: hash-blocking's size variance can never trip the per-block assert
_BLOCK_FILL = 0.8


def topk_per_row_exact_blocked(
    part: DataFrame,
    cand: DataFrame,
    k: int | None,
    *,
    n_cand: int | None = None,
    exclude_self: bool = False,
    min_cos: float | None = None,
    only_greater: bool = False,
    part_payload: tuple[tuple[str, str], ...] = (),
    cand_payload: tuple[tuple[str, str], ...] = (),
) -> DataFrame:
    """The EXACT kernel past ``EXACT_CAND_CAP`` (VERDICT r09 #5): the
    candidate side is hash-blocked into ≤0.8·cap slices
    (deterministic ``pmod(xxhash64(id))``), the kernel runs once per
    block, and a global window re-rank (cos DESC, cand_id ASC — the
    kernel's own tie order) restores exact top-k. Per-pair cosines
    are block-independent (same ascending-dimension fold), so blocked
    results are BIT-IDENTICAL to a hypothetical single-pass run: the
    low-τ exact operators (τ=0.45 pair joins, kNN-mean outlier
    scores) keep their certified semantics at any corpus size instead
    of silently switching to an approximate engine. LSH banding
    cannot serve them — at τ=0.45 no band is selective (the l4b
    docstring's economics); banding is the HIGH-τ dedup path.

    Cost is O(|part|·|cand|) by nature (that is what an exact low-τ
    all-pairs join means) — distributed over all cores with per-task
    memory bounded by one block. At 100 TB, low-τ exploratory joins
    are bounded-scale by contract (their OUTPUT is near-quadratic);
    the production dedup regime is high-τ banding (l4b).
    """
    import math
    from functools import reduce

    if n_cand is None:
        n_cand = cand.count()
    n_blocks = max(1, math.ceil(n_cand / (EXACT_CAND_CAP * _BLOCK_FILL)))
    kw = dict(
        exclude_self=exclude_self, min_cos=min_cos, only_greater=only_greater,
        part_payload=part_payload, cand_payload=cand_payload,
    )
    if n_blocks == 1:
        return topk_per_row_exact(part, cand, k, **kw)
    block = F.pmod(F.xxhash64(F.col("id")), F.lit(n_blocks))
    pieces = [
        topk_per_row_exact(part, cand.where(block == i), k, **kw)
        for i in range(n_blocks)
    ]
    u = reduce(DataFrame.unionByName, pieces)
    # global exact re-rank: each block's top-k is a superset filter,
    # so ranking the union on the kernel's own keys reproduces the
    # single-pass selection and rn numbering exactly
    w = Window.partitionBy("part_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    u = u.withColumn("rn", F.row_number().over(w))
    return u.where(F.col("rn") <= k) if k is not None else u


def topk_per_row_exact_auto(
    part: DataFrame,
    cand: DataFrame,
    k: int | None,
    *,
    n_cand: int | None = None,
    **kw,
) -> DataFrame:
    """The kernel handoff, made executable (VERDICT r09 #5): single
    kernel pass below ``EXACT_CAND_CAP``, blocked exact beyond —
    same numbers either way (tests pin bit-equality). ``n_cand`` is
    the planning estimate; counted once when absent (cheap narrow
    scan; pass it in pipelines that already know)."""
    if n_cand is None:
        n_cand = cand.count()
    if n_cand <= EXACT_CAND_CAP:
        return topk_per_row_exact(part, cand, k, **kw)
    return topk_per_row_exact_blocked(part, cand, k, n_cand=n_cand, **kw)


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
