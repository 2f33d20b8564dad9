"""LLM-data-pipeline operators — SURVEY.md §2.9 (L1-L10).

Training-data-pipeline primitives over ``documents`` / ``embeddings``:
exact + near dedup (MinHash-LSH, SimHash, n-gram Jaccard), embedding
similarity search/join, text stats, slice metrics, quality filtering,
keyword search, token counting.

Scale shapes:
  - exact dedup shuffles a 16-byte digest, not document bodies;
  - MinHash signatures are built in ONE explode+groupBy pass (16 min
    aggs), then banded so the candidate join touches only bucket
    collisions — the standard sub-quadratic LSH path for 100 TB;
  - exact cosine kernels are sequential folds (zip_with+aggregate) in
    whole-stage codegen; the brute-force forms broadcast the small
    query side, and the LSH variants bound candidates at scale.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.functions.text import norm_text_col, norm_text_sql
from ipydataclean_spark.functions.vector import (
    cosine_sim,
    cosine_sim_sql,
    dot,
    dot_sql,
    norm,
    norm_sql,
)
from ipydataclean_spark.operators.qhelp import T, documents_dup, with_documents_dup
from ipydataclean_spark.registry import register

STOPWORDS = ("the", "a", "of")
SIM_TAU = 0.45  # pairwise cosine threshold (fixture max offdiag ≈ 0.513)


# ---------------------------------------------------------------------------
# Shared text helpers
# ---------------------------------------------------------------------------


def tokens_col(text_col: str = "text") -> F.Column:
    return F.split(norm_text_col(text_col), " ")


def shingles_col(tokens: F.Column, n: int = 3) -> F.Column:
    """Word n-gram shingles (distinct) from a token-array column.

    IMPORTANT: pass a MATERIALIZED column (withColumn'd attribute), not
    the split(...) expression itself — element_at references inside the
    lambda would otherwise re-evaluate the whole normalize+split per
    shingle element (measured 4× slowdown at sf0.1).

    Short-doc guard: ``sequence(1, size-(n-1))`` DESCENDS through 0
    when the doc has < n tokens (Spark generates [1, 0, ...] with
    step -1) and ``element_at(t, 0)`` then raises
    INVALID_INDEX_OF_ZERO — a doc with one or two words would kill
    the whole corpus job. Such docs get an EMPTY shingle set
    instead."""
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    parts = lambda i: reduce(  # noqa: E731
        lambda acc, k: acc + [F.lit(" "), F.element_at(tokens, i + k)],
        range(1, n),
        [F.element_at(tokens, i)],
    )
    grams = F.array_distinct(F.transform(idx, lambda i: F.concat(*parts(i))))
    return F.when(F.size(tokens) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def exploded_shingles(docs: DataFrame, alias: str = "shingle") -> DataFrame:
    """(doc_id, shingle) rows — tokens materialized once per row."""
    return (
        docs.withColumn("__toks", tokens_col("text"))
        .select("doc_id", F.explode(shingles_col(F.col("__toks"))).alias(alias))
    )


def shingles_sql(text_expr: str, n: int = 3) -> str:
    norm = norm_text_sql(text_expr)
    gram = " || ' ' || ".join(f"t[i + {k}]" for k in range(n)).replace("t[i + 0]", "t[i]")
    return (
        f"list_distinct(list_transform(range(1, len(string_split({norm}, ' ')) - {n - 2}), "
        f"i -> {gram}))".replace("t[", f"string_split({norm}, ' ')[")
    )


# ---------------------------------------------------------------------------
# L1 — exact dedup
# ---------------------------------------------------------------------------


def with_dedup_rank(docs: DataFrame) -> DataFrame:
    """docs + ``rn``: rank within each sha256(normalized-text) digest
    group, min doc_id first — THE exact-dedup survivor rule (rn == 1
    keeps one doc per digest). ONE definition shared by l1, the corpus
    pipeline, and the span-cut pipeline (review r08: the block had
    been restated four times; a future change to the keep-which-doc
    policy must happen in exactly one place). The shuffle key is the
    32-byte digest."""
    key = F.sha2(norm_text_col("text"), 256)
    w = Window.partitionBy(key).orderBy("doc_id")
    return docs.withColumn("rn", F.row_number().over(w))


@register(
    "l1_exact_dedup",
    oracle=with_documents_dup(
        ", keyed AS (SELECT doc_id, lang, "
        f"ROW_NUMBER() OVER (PARTITION BY SHA256({norm_text_sql('text')}) ORDER BY doc_id) AS rn "
        "FROM documents_dup) "
        "SELECT lang, COUNT(*) AS n_docs, "
        "CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors "
        "FROM keyed GROUP BY lang ORDER BY lang"
    ),
    tags=("L1",),
)
def l1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1: normalize → sha256 → keep min doc_id per digest; per-lang
    survivor counts."""
    docs = documents_dup(spark, sf_dir)
    return (
        with_dedup_rank(docs)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("rn") == 1).cast("long")).alias("n_survivors"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# L2 — near-dup dedup (MinHash-LSH, exact Jaccard oracle, SimHash)
# ---------------------------------------------------------------------------

_MINHASH_K = 16
_BAND_ROWS = 4  # 4 bands × 4 rows


def sig_agreement(a: str, b: str, k: int = _MINHASH_K) -> Column:
    """Number of agreeing signature slots between two fixed-``k``
    signature arrays, as a codegen'd sum of per-index equalities.

    Replaces ``size(filter(zip_with(a, b, ==), identity))`` on the
    candidate-pair hot paths (optimization round 12, guide §4.1):
    Spark evaluates higher-order-function lambdas interpreted PER
    ELEMENT, so the old form paid 2k interpreted lambda calls per
    candidate pair — billions of pairs at 100 TB (the same mechanism
    functions/knn.py measured at 334 s for a 40M-pair fold). Counts
    are identical: signature arrays are always length k with non-null
    elements (min aggregates over non-empty shingle sets), so
    per-index equality never yields NULL. No measurable local delta
    (the sf0.1 fixture yields ~1.4k candidate pairs); rows proven
    identical on l2 before shipping."""
    terms = [(F.col(a)[i] == F.col(b)[i]).cast("int") for i in range(k)]
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, mh_0..mh_15): ONE explode + ONE groupBy with 16 min
    aggs — a single shuffle regardless of K.

    Hash cost (VERDICT r03 #4): each 3-token shingle hashes its token
    ELEMENTS directly (multi-arg xxhash64 — no concat string is ever
    built), distinct-by-hash replaces distinct-by-string, and the 16
    per-seed values re-hash that single 8-byte long (seeded double
    hashing, the standard trick). The old form built every shingle
    string and hashed it K times — ~40% of the whole LSH wall at
    sf0.1.

    Optimization round 12 NEGATIVE RESULT (recorded, lever retracted):
    replacing explode+groupBy with a map-only per-seed higher-order
    ``aggregate`` fold (zero shuffles) measured SLOWER — noop-timed
    0.66 s vs 0.50 s at sf0.1 — because Spark evaluates higher-order
    lambdas interpreted per element while the explode+agg path is
    whole-stage-codegen'd; the saved exchange (O(docs × 17 longs)) is
    far cheaper than the lost codegen. See OPTIMIZATION_r12.md."""
    n = 3
    # short-doc guard (same hazard shingles_col documents): < n tokens
    # would make sequence() descend through index 0 and element_at(t,0)
    # raise — such docs are dropped here (no shingles -> no signature,
    # so they never reach the LSH; exact dedup l1 still covers them)
    toks = docs.withColumn("__toks", tokens_col("text")).where(
        F.size("__toks") >= n
    )
    t = F.col("__toks")
    idx = F.sequence(F.lit(1), F.size(t) - (n - 1))
    hashed = F.array_distinct(
        F.transform(idx, lambda i: F.xxhash64(*[F.element_at(t, i + k) for k in range(n)]))
    )
    sh = toks.select("doc_id", F.explode(hashed).alias("__h"))
    aggs = [
        F.min(F.xxhash64(F.lit(seed), F.col("__h"))).alias(f"mh_{seed}")
        for seed in range(_MINHASH_K)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def banded_signatures(sigs: DataFrame) -> DataFrame:
    """(doc_id, sig, band_id, band_hash) — the ONE band layout
    (_MINHASH_K // _BAND_ROWS bands of _BAND_ROWS sig slots, band hash
    over the raw longs, no string concat) shared by lsh_candidate_pairs
    and the inc4 stored index, so an index written by one is always
    probeable by the other (round-5 review: a second hand-rolled copy
    would silently stop matching if K or the band split changed)."""
    sig_arr = F.array(*[F.col(f"mh_{i}") for i in range(_MINHASH_K)])
    bands = F.transform(
        F.sequence(F.lit(0), F.lit(_MINHASH_K // _BAND_ROWS - 1)),
        lambda b: F.struct(
            b.alias("band_id"),
            F.xxhash64(*[
                F.element_at(sig_arr, b * _BAND_ROWS + k + 1)
                for k in range(_BAND_ROWS)
            ]).alias("band_hash"),
        ),
    )
    return (
        sigs.withColumn("sig", sig_arr)
        .withColumn("band", F.explode(bands))
        .select("doc_id", "sig", F.col("band.band_id").alias("band_id"), F.col("band.band_hash").alias("band_hash"))
    )


def lsh_candidate_pairs(sigs: DataFrame, cap: int | None = 1024) -> DataFrame:
    """Banded LSH candidate generation with hot-bucket splitting
    (VERDICT r01 #7). Returns (doc_a, doc_b, sig_a, sig_b) candidate
    pairs from band-bucket collisions.

    Skew hazard: a band bucket of m docs yields m² join pairs in ONE
    task — a boilerplate/template cluster (or an uninformative band)
    turns a 100 TB run into a straggler. Mitigation, in-plan:

      * bucket histogram = a key-only aggregate filtered to buckets
        > cap — by definition a tiny (usually empty) relation that is
        BROADCAST back onto the banded rows, so the big side is never
        shuffled for detection; ``sigs`` is localCheckpoint'd first so
        the multi-branch plan re-reads a materialized O(docs)×17-value
        table instead of recomputing the shingle→minhash pipeline;
      * buckets ≤ ``cap`` join exactly as before (grp = -2);
      * oversized buckets are sub-split into ⌈n/cap⌉ groups by a
        DETERMINISTIC doc_id-derived salt (grp = pmod(xxhash64(id), g)):
        pairs are emitted within each ≤~cap-sized group, so per-key
        join input AND output are bounded (m·cap pairs, linear in m,
        instead of m²);
      * each group's min-doc_id member is re-emitted into a hub bucket
        (grp = -1) so the groups stay CONNECTED: cluster-level recall
        (what dedup consumes via cluster_pairs) is preserved — every
        member reaches the hub's component. Pair-level recall inside an
        oversized bucket degrades to hub connectivity; that is the
        documented trade — an m²-pair clique was never going to be
        verified pairwise at scale anyway. Exact-dup mega-clusters
        should be removed by L1 before LSH.

    ``cap=None`` disables the histogram entirely (round-1 plan)."""
    if cap is not None:
        # LAZY checkpoint, materialized BY the histogram probe below
        # (VERDICT r03 #4): the old eager form paid a dedicated
        # materialization job plus the probe; marking the checkpoint
        # lazy makes the probe's own pass persist sigs as a side
        # effect — one job where there were two — and the main query
        # then re-reads the materialized table
        sigs = sigs.localCheckpoint(eager=False)
    banded = banded_signatures(sigs)
    hot_sizes = None
    if cap is not None:
        hot_sizes = (
            banded.groupBy("band_id", "band_hash")
            .agg(F.count(F.lit(1)).alias("__n"))
            .where(F.col("__n") > cap)
        )
        # runtime-adaptive: the histogram is one cheap job over the
        # checkpointed sigs; with no oversized bucket (the common case)
        # the plan stays the simple single-join one
        if hot_sizes.limit(1).count() == 0:
            hot_sizes = None
    if hot_sizes is None:
        keyed = banded.withColumn("grp", F.lit(-2).cast("long"))
    else:
        sized = banded.join(
            F.broadcast(hot_sizes), ["band_id", "band_hash"], "left"
        )
        cold = sized.where(F.col("__n").isNull()).withColumn(
            "grp", F.lit(-2).cast("long")
        )
        n_groups = F.ceil(F.col("__n") / F.lit(cap)).cast("long")
        hot = sized.where(F.col("__n").isNotNull()).withColumn(
            "grp", F.pmod(F.xxhash64("doc_id"), n_groups)
        )
        wg = Window.partitionBy("band_id", "band_hash", "grp")
        hub = (
            hot.withColumn("__hub", F.min("doc_id").over(wg))
            .where(F.col("doc_id") == F.col("__hub"))
            .drop("__hub")
            .withColumn("grp", F.lit(-1).cast("long"))
        )
        cols = ["doc_id", "band_id", "band_hash", "grp"]
        keyed = (
            cold.select(cols)
            .unionByName(hot.select(cols))
            .unionByName(hub.select(cols))
        )
    # Optimization round 12 (guide §2.3 — project before the exchange,
    # the md5_band_keys slim-fanout lesson applied to the production
    # layout): the band join and the pair-dedup previously carried BOTH
    # 16-long signature arrays through every candidate row — ~34 longs
    # per row shuffled and hash-compared where 2 ids suffice. The join
    # now runs on (doc_id, band_id, band_hash, grp) only, the distinct
    # dedups bare (doc_a, doc_b) id pairs, and the signatures rejoin
    # AFTER dedup from the (already checkpointed) signature table —
    # output schema and rows identical (sig is functionally dependent
    # on doc_id), pinned by the l2 goldens.
    a = keyed.select(F.col("doc_id").alias("doc_a"), "band_id", "band_hash", "grp")
    b = keyed.select(F.col("doc_id").alias("doc_b"), "band_id", "band_hash", "grp")
    pair_ids = (
        a.join(b, ["band_id", "band_hash", "grp"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sig_arr = F.array(*[F.col(f"mh_{i}") for i in range(_MINHASH_K)])
    sig_tbl = sigs.select("doc_id", sig_arr.alias("sig"))
    return (
        pair_ids.join(
            sig_tbl.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a")), "doc_a"
        )
        .join(
            sig_tbl.select(F.col("doc_id").alias("doc_b"), F.col("sig").alias("sig_b")), "doc_b"
        )
        .select("doc_a", "doc_b", "sig_a", "sig_b")
    )


@register("l2_minhash_lsh", oracle=None, tags=("L2", "D5"))
def l2_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2: MinHash-LSH near-dup candidate pairs (rows-only; deterministic
    xxhash64 seeds). Bands of 4 rows → bucket join → estimated Jaccard
    (signature agreement) ≥ 0.5. Golden-tested against exact Jaccard
    (l2b) in tests/test_llm.py. Candidate generation runs through
    lsh_candidate_pairs, which sub-splits oversized band buckets so a
    template cluster can't produce a quadratic straggler task (the
    fixture's buckets are far below the cap, so output here is
    identical to the uncapped plan)."""
    sigs = minhash_signatures(documents_dup(spark, sf_dir))
    pairs = lsh_candidate_pairs(sigs)
    est = sig_agreement("sig_a", "sig_b") / F.lit(float(_MINHASH_K))
    return (
        pairs.withColumn("est_jaccard", est)
        .where(F.col("est_jaccard") >= 0.5)
        .select("doc_a", "doc_b", "est_jaccard")
        .orderBy("doc_a", "doc_b")
    )


@register(
    "l2b_jaccard_pairs",
    oracle=with_documents_dup(
        f", sh AS (SELECT doc_id, UNNEST({shingles_sql('text')}) AS s FROM documents_dup), "
        "sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id), "
        "common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common "
        "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY a.doc_id, b.doc_id) "
        "SELECT doc_a, doc_b, "
        "(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)) AS jaccard "
        "FROM common JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b "
        "WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.6 "
        "ORDER BY doc_a, doc_b"
    ),
    tags=("L2",),
)
def l2b_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 exact twin: word-3-gram Jaccard ≥ 0.6 via shingle self-join
    (the verification pass LSH candidates feed into at scale)."""
    return exact_jaccard_pairs(documents_dup(spark, sf_dir))


def exact_jaccard_pairs(docs: DataFrame, threshold: float = 0.6) -> DataFrame:
    """(doc_a, doc_b, jaccard): exact word-3-gram Jaccard ≥ threshold
    over an arbitrary docs frame — the l2b body, extracted so the l2h
    recall audit can compute ground truth on a SAMPLED doc slice (the
    exact side is a shingle self-join, quadratic-ish in |docs|; the
    sampling must happen BEFORE it, not on its output)."""
    sh = exploded_shingles(docs, "s")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "s")
    b = sh.select(F.col("doc_id").alias("doc_b"), "s")
    common = (
        a.join(b, "s")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("n_common").cast("double") / (F.col("na") + F.col("nb") - F.col("n_common"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


_L2F_K = 16  # signature length; 4 bands x 4 rows, matching l2's layout


def md5_minhash_sigs(docs: DataFrame) -> DataFrame:
    """(doc_id, sg array<string>[16]): md5 MinHash signatures — the
    cross-engine-certifiable twin of minhash_signatures (DuckDB twin =
    md5_minhash_chain_sql's sh/mins/sig CTEs)."""
    sh = exploded_shingles(docs, "s")
    mins = sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat_ws(":", F.lit(str(seed)), F.col("s")))
            ).alias(f"mh_{seed}")
            for seed in range(_L2F_K)
        ]
    )
    sig_arr = F.array(*[F.col(f"mh_{i}") for i in range(_L2F_K)])
    return mins.select("doc_id", sig_arr.alias("sg"))


def md5_band_keys(
    sigs: DataFrame, n_bands: int = 4, rows_per_band: int = 4
) -> DataFrame:
    """(doc_id, b, bh): SLIM band keys from md5 signatures — the
    join fanout carries no signature arrays (the l36 slim-fanout
    lesson; round-6 review #7): candidate joins run on these 3
    columns, and signatures rejoin AFTER pair dedup. The default 4x4
    is the production layout; the l2h audit sweeps other layouts
    through the SAME generator so the band-key format is
    single-sourced (review r07 second pass #3; its SQL twin is
    band_key_sql)."""
    if n_bands < 1 or rows_per_band < 1 or n_bands * rows_per_band > _L2F_K:
        # out-of-range slots would NULL out in Spark (concat_ws skips
        # NULLs -> every doc gets bh = md5('') and the band join goes
        # quadratic) while the SQL twin NULL-propagates to no matches
        # — fail loudly instead of diverging per engine (review #1)
        raise ValueError(
            f"band layout {n_bands}x{rows_per_band} does not fit the "
            f"{_L2F_K}-slot signature"
        )
    r = rows_per_band
    return sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("b"),
                        F.md5(
                            F.concat_ws(
                                "|",
                                *[F.col("sg")[r * b + i] for i in range(r)],
                            )
                        ).alias("bh"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bd"),
    ).select("doc_id", F.col("bd.b").alias("b"), F.col("bd.bh").alias("bh"))


def band_key_sql(rows_per_band: int) -> str:
    """DuckDB band-key expression over a ``sg`` signature list (the
    twin of md5_band_keys' per-band concat): '|'-joined run of
    ``rows_per_band`` consecutive minima starting at band index b.
    ONE definition serves the production 4x4 chain
    (md5_minhash_chain_sql) and the l2h layout sweep."""
    return " || '|' || ".join(
        f"sg[{rows_per_band}*b + {i + 1}]" for i in range(rows_per_band)
    )


def md5_minhash_banded(docs: DataFrame) -> DataFrame:
    """(doc_id, sg, b, bh): signatures + band keys in one table — the
    STORAGE layout an LSH index persists (inc4b); joins should use
    the slim md5_band_keys projection instead."""
    sigs = md5_minhash_sigs(docs)
    return (
        md5_band_keys(sigs)
        .join(sigs, "doc_id")
        .select("doc_id", "sg", "b", "bh")
    )


def md5_minhash_chain_sql(src: str, sfx: str = "") -> str:
    """DuckDB twin of md5_minhash_sigs + md5_band_keys over table
    ``src``: the sh{sfx}/mins{sfx}/sig{sfx}/banded{sfx} CTE chain —
    ONE definition shared by l2f, c30b (via L2F_CTES) and inc4b
    (round-6 review #5: two hand-maintained copies)."""
    return (
        f"sh{sfx} AS (SELECT doc_id, UNNEST({shingles_sql('text')}) AS s "
        f"FROM {src}), "
        f"mins{sfx} AS (SELECT doc_id, seed, "
        "MIN(md5(CAST(seed AS VARCHAR) || ':' || s)) AS mh "
        f"FROM sh{sfx} CROSS JOIN (SELECT UNNEST(range(16)) AS seed) "
        "GROUP BY doc_id, seed), "
        f"sig{sfx} AS (SELECT doc_id, LIST(mh ORDER BY seed) AS sg "
        f"FROM mins{sfx} GROUP BY doc_id), "
        f"banded{sfx} AS (SELECT doc_id, b, md5({band_key_sql(4)}) AS bh "
        f"FROM sig{sfx} CROSS JOIN (SELECT UNNEST(range(4)) AS b))"
    )

#: The md5 MinHash-LSH CTE chain (through ``est(doc_a, doc_b,
#: n_agree)``), shared by l2f and the keep-best dedup twin c30b.
L2F_CTES = (
    ", " + md5_minhash_chain_sql("documents_dup") + ", "
    "cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM banded a JOIN banded b ON a.b = b.b AND a.bh = b.bh "
    "AND a.doc_id < b.doc_id), "
    "est AS (SELECT c.doc_a, c.doc_b, "
    "CAST(SUM(CASE WHEN ma.mh = mb.mh THEN 1 ELSE 0 END) AS BIGINT) AS n_agree "
    "FROM cand c JOIN mins ma ON ma.doc_id = c.doc_a "
    "JOIN mins mb ON mb.doc_id = c.doc_b AND mb.seed = ma.seed "
    "GROUP BY c.doc_a, c.doc_b)"
)

_L2F_ORACLE = with_documents_dup(
    L2F_CTES
    + " SELECT doc_a, doc_b, ROUND(n_agree / 16.0, 8) AS est_jaccard "
    "FROM est WHERE n_agree >= 8 ORDER BY doc_a, doc_b"
)


@register("l2f_minhash_lsh_md5", oracle=_L2F_ORACLE, tags=("L2", "D5"))
def l2f_minhash_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 ORACLE-CERTIFIED MinHash-LSH: the same algorithm as l2
    (16-slot signature, 4x4 banding, bucket join, agreement >= 8/16)
    with md5 as the hash family so DuckDB can replay every stage —
    upgrading the flagship near-dup path from rows-only to
    hash-certified against an independent engine. l2 itself stays on
    multi-arg xxhash64 (JVM-side, no per-shingle string ever built —
    the production hash; xxhash64 has no DuckDB equivalent, which is
    WHY l2 is rows-only by design). This twin certifies the PIPELINE
    — shingling, per-seed min, banding, candidate semantics, the
    estimated-Jaccard filter — not the hash function choice: per-seed
    minima are lexicographic minima over md5 hex strings (both
    engines lowercase hex under binary collation), the band key is
    md5 over '|'-joined row minima, and the >= 0.5 threshold is the
    integer comparison n_agree >= 8 so no float enters the
    predicate. Cost note: this form builds shingle STRINGS and runs
    16 md5s per shingle — certification economics, not production
    economics (l2's seeded double-hashing of one 8-byte long is ~40%
    cheaper; BENCH.md r3). Candidate generation is SLIM: band keys
    only through the self-join and pair dedup, signatures rejoined
    after — the l36 fanout lesson applied (round-6 review #7)."""
    sigs = md5_minhash_sigs(documents_dup(spark, sf_dir))
    bands = md5_band_keys(sigs)  # slim: no sig arrays through the join
    a = bands.select(F.col("doc_id").alias("doc_a"), "b", "bh")
    b = bands.select(F.col("doc_id").alias("doc_b"), "b", "bh")
    cand = (
        a.join(b, ["b", "bh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .join(sigs.select(F.col("doc_id").alias("doc_a"), F.col("sg").alias("sa")), "doc_a")
        .join(sigs.select(F.col("doc_id").alias("doc_b"), F.col("sg").alias("sb")), "doc_b")
    )
    n_agree = sig_agreement("sa", "sb")
    return (
        cand.withColumn("n_agree", n_agree)
        .where(F.col("n_agree") >= 8)
        .select(
            "doc_a",
            "doc_b",
            F.round(F.col("n_agree") / F.lit(16.0), 8).alias("est_jaccard"),
        )
        .orderBy("doc_a", "doc_b")
    )


#: The band layouts the l2h audit compares: (n_bands, rows_per_band)
#: partitions of the 16-slot signature. (4, 4) is the production
#: layout (catches J >= ~0.5); (2, 8) is the strict one (a band of 8
#: rows agrees with prob J^8, so even J ~ 0.9 pairs get missed —
#: the knob a deployment turns when candidate volume must shrink).
_L2H_LAYOUTS = ((4, 4), (2, 8))


def _l2h_layout_sql(nb: int, r: int) -> str:
    """banded{nb}x{r} CTE over the shared ``sig`` list, keyed by the
    single-sourced band_key_sql generator."""
    return (
        f"banded{nb}x{r} AS (SELECT doc_id, b, md5({band_key_sql(r)}) AS bh "
        f"FROM sig CROSS JOIN (SELECT UNNEST(range({nb})) AS b))"
    )


def _l2h_metrics_sql(nb: int, r: int) -> str:
    return (
        f"SELECT {nb} AS n_bands, {r} AS rows_per_band, "
        "(SELECT COUNT(*) FROM truth) AS n_truth, "
        f"(SELECT COUNT(*) FROM cand{nb}x{r}) AS n_candidates, "
        f"(SELECT COUNT(*) FROM truth t JOIN cand{nb}x{r} c "
        "ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b) AS n_hits"
    )


_L2H_ORACLE = with_documents_dup(
    ", "
    + md5_minhash_chain_sql("documents_dup")
    # truth: exact word-3-gram Jaccard >= 0.6 (the l2b chain), reusing
    # the SAME sh CTE the md5-MinHash chain already built
    + ", sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id), "
    "truth AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b "
    "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id "
    "JOIN sizes sa ON sa.doc_id = a.doc_id "
    "JOIN sizes sb ON sb.doc_id = b.doc_id "
    "GROUP BY a.doc_id, b.doc_id, sa.n_sh, sb.n_sh "
    "HAVING CAST(COUNT(*) AS DOUBLE) / (sa.n_sh + sb.n_sh - COUNT(*)) >= 0.6), "
    + ", ".join(_l2h_layout_sql(nb, r) for nb, r in _L2H_LAYOUTS)
    + ", "
    + ", ".join(
        f"cand{nb}x{r} AS (SELECT DISTINCT a.doc_id AS doc_a, "
        f"v.doc_id AS doc_b FROM banded{nb}x{r} a JOIN banded{nb}x{r} v "
        "ON v.b = a.b AND v.bh = a.bh AND a.doc_id < v.doc_id)"
        for nb, r in _L2H_LAYOUTS
    )
    + ", m AS ("
    + " UNION ALL ".join(_l2h_metrics_sql(nb, r) for nb, r in _L2H_LAYOUTS)
    + ") SELECT n_bands, rows_per_band, n_truth, n_candidates, n_hits, "
    "ROUND(CASE WHEN n_truth > 0 THEN CAST(n_hits AS DOUBLE) / n_truth END, 8) "
    "AS recall, "
    "ROUND(CASE WHEN n_candidates > 0 THEN CAST(n_hits AS DOUBLE) / n_candidates "
    "END, 8) AS precision FROM m ORDER BY n_bands DESC"
)


@register("l2h_lsh_recall_audit", oracle=_L2H_ORACLE, tags=("L2", "D5"))
def l2h_lsh_recall_audit(
    spark: SparkSession, sf_dir: str, fraction: float = 1.0
) -> DataFrame:
    """L2 quality audit — the LSH S-curve tuning table: recall AND
    precision of the raw band-join candidate stage against exact
    word-3-gram Jaccard >= 0.6 ground truth (the l2b chain), for two
    band layouts cut from the SAME 16 md5 minima: the production 4x4
    (catches J >= ~0.5; measured recall 1.0 on the fixture) and the
    strict 2x8 (a band of 8 agrees with prob J^8, so J ~ 0.9 pairs
    get missed — measured recall < 1, the non-vacuous row). This is
    the table a dedup deployment reads before picking a layout: the
    recall column is what banding loses, n_candidates is what
    verification costs.

    Scale shape: the AUDIT, not the pipeline, is the expensive side —
    exact truth is a shingle self-join, quadratic-ish in |docs|, so at
    100 TB this runs on a sampled slice while LSH is the production
    path. ``fraction`` IS that slice (VERDICT r07 #5): a deterministic
    md5-coin doc sample ('l2h'-salted, the r22d rule — reproducible
    across engines/retries/repartitioning) applied BEFORE the shingle
    self-join, bounding the exact side by fraction² and the banding by
    fraction. Recall/precision are then measured on the sampled
    subpopulation (both pair endpoints in-sample) — the standard audit
    estimator. fraction=1.0 (the registered/oracle default) is
    bit-identical to the unsampled audit. Divisions are single
    BIGINT/BIGINT -> double (IEEE-identical cross-engine),
    zero-guarded."""
    docs = documents_dup(spark, sf_dir)
    if fraction < 1.0:
        from ipydataclean_spark.functions.exact import md5_coin

        docs = docs.where(md5_coin("doc_id", salt="l2h") < F.lit(fraction))
    # materialized once: ``truth`` (the shingle self-join — the
    # expensive side by this docstring's own accounting) feeds an agg
    # plus a hits join PER layout, and ``sigs`` feeds every layout's
    # banding — checkpoints stop those plans re-executing per
    # reference (review r07 #6).
    # Optimization round 12 (guide §2.6 — overlap independent jobs):
    # the sigs and truth materializations are independent, as are the
    # two per-layout candidate materializations — sequentially, each
    # left most cores idle. A driver thread pool submits the
    # independent eager jobs together; outputs unchanged (pool.map
    # preserves layout order, lineages are thread-private).
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        f_sigs = pool.submit(
            lambda: md5_minhash_sigs(docs).localCheckpoint(eager=True)
        )
        f_truth = pool.submit(
            lambda: exact_jaccard_pairs(docs)
            .select("doc_a", "doc_b")
            .localCheckpoint(eager=True)
        )
        sigs, truth = f_sigs.result(), f_truth.result()

    def layout_row(layout: tuple[int, int]) -> DataFrame:
        nb, r = layout
        # the SAME generator that builds the production 4x4 keys —
        # the audit measures the real banding, not a reimplementation
        bands = md5_band_keys(sigs, n_bands=nb, rows_per_band=r)
        a = bands.select(F.col("doc_id").alias("doc_a"), "b", "bh")
        v = bands.select(F.col("doc_id").alias("doc_b"), "b", "bh")
        cand = (
            a.join(v, ["b", "bh"])
            .where(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
            .localCheckpoint(eager=True)
        )
        hits = truth.join(cand, ["doc_a", "doc_b"])
        return (
            truth.agg(F.count(F.lit(1)).alias("n_truth"))
            .crossJoin(cand.agg(F.count(F.lit(1)).alias("n_candidates")))
            .crossJoin(hits.agg(F.count(F.lit(1)).alias("n_hits")))
            .select(
                F.lit(nb).cast("int").alias("n_bands"),
                F.lit(r).cast("int").alias("rows_per_band"),
                "n_truth",
                "n_candidates",
                "n_hits",
            )
        )

    with ThreadPoolExecutor(max_workers=len(_L2H_LAYOUTS)) as pool:
        rows = list(pool.map(layout_row, _L2H_LAYOUTS))
    # sigs is dead once every layout's cand checkpoint materialized
    # (cand's lineage is truncated); truth/cand stay live — the
    # returned lazy plans read their blocks
    from ipydataclean_spark.operators.llm_extra import _free_local_checkpoint

    _free_local_checkpoint(sigs)
    m = rows[0]
    for extra in rows[1:]:
        m = m.unionByName(extra)
    rec = F.when(
        F.col("n_truth") > 0, F.col("n_hits").cast("double") / F.col("n_truth")
    )
    prec = F.when(
        F.col("n_candidates") > 0,
        F.col("n_hits").cast("double") / F.col("n_candidates"),
    )
    return m.select(
        "n_bands",
        "rows_per_band",
        "n_truth",
        "n_candidates",
        "n_hits",
        F.round(rec, 8).alias("recall"),
        F.round(prec, 8).alias("precision"),
    ).orderBy(F.desc("n_bands"))


_L2G_BITS, _L2G_BANDS = 48, 6  # 6 bands x 8 bits; pigeonhole: hamming<=5

_L2G_ORACLE = with_documents_dup(
    f", sh AS (SELECT doc_id, UNNEST({shingles_sql('text')}) AS s FROM documents_dup), "
    "hv AS (SELECT doc_id, CAST(('0x' || substr(md5(s), 1, 12)) AS BIGINT) AS h "
    "FROM sh), "
    "bits AS (SELECT doc_id, b, CASE WHEN (h // CAST(POWER(2, b) AS BIGINT)) "
    "% 2 = 1 THEN 1 ELSE -1 END AS contrib "
    f"FROM hv CROSS JOIN (SELECT UNNEST(range({_L2G_BITS})) AS b)), "
    "sk AS (SELECT doc_id, b, CASE WHEN SUM(contrib) >= 0 THEN 1 ELSE 0 END AS sbit "
    "FROM bits GROUP BY 1, 2), "
    "bands AS (SELECT doc_id, CAST(b // 8 AS BIGINT) AS band, "
    "CAST(SUM(sbit * CAST(POWER(2, 7 - (b % 8)) AS BIGINT)) AS BIGINT) AS key "
    "FROM sk GROUP BY 1, 2), "
    "cand AS (SELECT DISTINCT a.doc_id AS doc_a, v.doc_id AS doc_b "
    "FROM bands a JOIN bands v ON v.band = a.band AND v.key = a.key "
    "AND a.doc_id < v.doc_id), "
    "ham AS (SELECT c.doc_a, c.doc_b, "
    "CAST(SUM(CASE WHEN sa.sbit <> sb.sbit THEN 1 ELSE 0 END) AS BIGINT) AS hamming "
    "FROM cand c JOIN sk sa ON sa.doc_id = c.doc_a "
    "JOIN sk sb ON sb.doc_id = c.doc_b AND sb.b = sa.b "
    "GROUP BY 1, 2) "
    "SELECT doc_a, doc_b, hamming FROM ham WHERE hamming <= 5 "
    "ORDER BY doc_a, doc_b"
)


@register("l2g_simhash_md5", oracle=_L2G_ORACLE, tags=("L2",))
def l2g_simhash_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 ORACLE-CERTIFIED SimHash: 48-bit sketches from the md5
    48-bit prefix of each shingle, 6 bands x 8 bits, pigeonhole-exact
    candidates for hamming <= 5, every stage replayed by DuckDB —
    the certificate for the SimHash FAMILY that l2c runs on xxhash64
    (rows-only by design). The whole pipeline is INTEGER arithmetic
    (bit extraction via h div 2^b mod 2 — POWER(2, b) exact in a
    double through b = 47 — majority vote and band keys as integer
    sums), so there is no float order to drift. Shape matches l2c at
    scale: per-(doc, bit) contributions are a slim keyed fanout, the
    sketch is one grouped sum, candidates come from the banded
    self-join, and the hamming verify touches candidates only."""
    docs = documents_dup(spark, sf_dir)
    sh = exploded_shingles(docs, "s")
    hv = sh.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.col("s")), 1, 12), 16, 10)
        .cast("long")
        .alias("h"),
    )
    # 48 conditional sums in ONE grouped agg (the minhash_signatures
    # shape) — the earlier 48x per-(doc, shingle) bit EXPLODE was
    # certification-twin-simple but timed out at sf1 (>100M fanout
    # rows); this form is one shuffle regardless of bit count. The
    # DuckDB oracle keeps the exploded bits CTE (sf0.01-sized) — the
    # hash equality across the two mechanisms is part of the proof.
    aggs = [
        F.sum(
            F.when(F.expr(f"(h div {2 ** b}) % 2 = 1"), F.lit(1)).otherwise(
                F.lit(-1)
            )
        ).alias(f"c_{b}")
        for b in range(_L2G_BITS)
    ]
    votes = hv.groupBy("doc_id").agg(*aggs)
    sbit = [
        F.when(F.col(f"c_{b}") >= 0, F.lit(1)).otherwise(F.lit(0))
        for b in range(_L2G_BITS)
    ]
    # packed 48-bit sketch (BIGINT) + 6x8-bit band keys, all integer
    sketch = sum(
        (sbit[b] * F.lit(1 << b).cast("long") for b in range(_L2G_BITS)),
        F.lit(0).cast("long"),
    )
    band_structs = [
        F.struct(
            F.lit(band).cast("long").alias("band"),
            sum(
                (sbit[band * 8 + j] * F.lit(1 << (7 - j)) for j in range(8)),
                F.lit(0),
            ).cast("long").alias("key"),
        )
        for band in range(_L2G_BANDS)
    ]
    sk = votes.select(
        "doc_id", sketch.alias("sketch"), F.explode(F.array(*band_structs)).alias("bd")
    ).select("doc_id", "sketch", F.col("bd.band").alias("band"), F.col("bd.key").alias("key"))
    a = sk.select(F.col("doc_id").alias("doc_a"), "band", "key")
    v = sk.select(F.col("doc_id").alias("doc_b"), "band", "key")
    sketches = sk.select("doc_id", "sketch").dropDuplicates(["doc_id"])
    return (
        a.join(v, ["band", "key"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .join(sketches.select(F.col("doc_id").alias("doc_a"), F.col("sketch").alias("ska")), "doc_a")
        .join(sketches.select(F.col("doc_id").alias("doc_b"), F.col("sketch").alias("skb")), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("ska").bitwiseXOR(F.col("skb"))).cast("long").alias("hamming"),
        )
        .where(F.col("hamming") <= 5)
        .orderBy("doc_a", "doc_b")
    )


@register("l2c_simhash", oracle=None, tags=("L2",))
def l2c_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 SimHash variant: 64-bit simhash per doc; near-dup pairs =
    hamming distance ≤ 7 found via 8×8-bit band buckets. Pigeonhole
    guarantee: a pair with ≤ 7 differing bits cannot differ in all 8
    bands, so every qualifying pair shares ≥ 1 band bucket — candidate
    generation is EXACT for the emitted threshold (VERDICT r01 #4
    reconciled docstring/bands/filter; previously 4×16-bit bands only
    guaranteed hamming ≤ 3 while filtering at ≤ 6).

    Bit sums are built in one explode+groupBy with 64 literal-shift
    aggregates (rows-only: bit algebra not portable to the oracle).
    Features are word-3-gram shingles (token sets are near-identical
    across this corpus's small vocabulary; shingle sets discriminate)."""
    docs = documents_dup(spark, sf_dir)
    toks = exploded_shingles(docs, "tok")
    h = F.xxhash64("tok")
    bit_aggs = [
        F.sum(
            F.when(F.shiftrightunsigned(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b{b}")
        for b in range(64)
    ]
    sums = toks.groupBy("doc_id").agg(*bit_aggs)
    sim = reduce(
        lambda acc, b: acc.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long") * (1 << b) if b < 63 else F.lit(-(1 << 63)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
        ),
        range(64),
        F.lit(0).cast("long"),
    )
    sh = sums.select("doc_id", sim.alias("simhash"))
    banded = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band_id"),
                    F.shiftrightunsigned(F.col("simhash"), 8 * i).bitwiseAND(F.lit(0xFF)).alias("band_val"),
                )
                for i in range(8)
            ])
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_id", "band.band_val")
    a = banded.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "band_id", "band_val")
    b = banded.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"), "band_id", "band_val")
    pairs = (
        a.join(b, ["band_id", "band_val"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sh_a", "sh_b")
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.withColumn("hamming", hamming)
        .where(F.col("hamming") <= 7)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# L3/L4 — embedding similarity
# ---------------------------------------------------------------------------


@register(
    "l3_knn_exact",
    oracle=(
        "SELECT query_id, neighbor_id, cos_sim FROM ("
        "SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, "
        f"{cosine_sim_sql('q.embedding', 'e.embedding')} AS cos_sim, "
        "ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
        f"{cosine_sim_sql('q.embedding', 'e.embedding')} DESC, e.vec_id) AS rn "
        "FROM embeddings q CROSS JOIN embeddings e "
        "WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id) "
        "WHERE rn <= 5 ORDER BY query_id, cos_sim DESC, neighbor_id"
    ),
    tags=("L3",),
)
def l3_knn_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3: brute-force cosine top-k (query side broadcast; the exact
    baseline the LSH variant l3b is judged against)."""
    emb = T(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    e = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("e_emb"))
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", cosine_sim("q_emb", "e_emb").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cos_sim")
        .orderBy("query_id", F.desc("cos_sim"), "neighbor_id")
    )


@register("l3b_knn_lsh", oracle=None, tags=("L3",))
def l3b_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 scale path: random-hyperplane LSH — independent sign-sketch
    bands; a vector is a candidate if it collides with the query in ANY
    band (multi-band OR amplification), then exact cosine re-ranks
    candidates. Deterministic projections from xxhash64 (no RNG —
    reproducible across cluster re-runs). Kernel in functions/knn.py
    (shared with the strategy facade).

    Band tuning (round 2): the fixture's true top-5 neighbors sit at
    cosine ≈ 0.3, where a 6-bit band collides with P ≈ 0.05 — the
    round-1 4×6-bit config measured only 0.16 top-5 recall (the old
    test checked candidate non-emptiness, not recall). 12 bands × 4
    bits measures 0.96 mean / 0.8 min recall, now pinned by test.
    ``band_bits`` is the selectivity knob (2^bits buckets/band): grow
    it with corpus size, add bands to buy recall back."""
    emb = T(spark, sf_dir, "embeddings")
    from ipydataclean_spark.functions.knn import knn_lsh

    return knn_lsh(
        emb, emb.where(F.col("vec_id") < 5), n_bands=12, band_bits=4
    ).orderBy("query_id", F.desc("cos_sim"), "neighbor_id")


_L3K_BANDS, _L3K_BITS, _L3K_DIM = 12, 4, 64


def _md5_plane(p: int, dim: int) -> list[float]:
    """Plane p's md5-derived components, computed driver-side with
    hashlib (hashlib.md5 == Spark F.md5 == DuckDB md5 on the same
    string, so these literals match the oracle's in-SQL derivation
    bit-for-bit): u = (first-24-bits(md5(f'{p}:{i}')) + 0.5)/2^24 - 0.5.
    Every step is IEEE-exact (24-bit int + 0.5 exact in double, the
    divisor a power of two), so the doubles are identical whether
    derived here, in a Spark md5 expression, or in DuckDB SQL."""
    import hashlib

    return [
        (int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[:6], 16) + 0.5)
        / 16777216.0
        - 0.5
        for i in range(dim)
    ]


def _l3k_plane(p: int) -> list[float]:
    return _md5_plane(p, _L3K_DIM)


def md5_sign_bands(df, n_bands: int, n_bits: int, dim: int):
    """(id, b, key) hyperplane-LSH band table over ``df(id, emb)`` via a
    vectorized sign-sketch kernel (round 13, guide §4.2): the in-plan
    ``aggregate(zip_with(...))`` dot folds are interpreted PER ELEMENT
    (n_planes · dim lambda evals per vector — l3k measured 7.4 s and
    l4e 4.6 s at sf0.1 on exactly this), while the kernel accumulates
    every (vector, plane) dot in ascending-dimension order with numpy —
    the SAME IEEE op sequence per pair as the sequential fold, so sign
    bits are bit-identical and the md5-certified oracles stay
    hash-green. Band keys are integer bit-sums (exact). Output rows:
    one per (vector, band)."""
    import numpy as np

    n_planes = n_bands * n_bits
    planes = np.array(
        [_md5_plane(p, dim) for p in range(n_planes)], dtype=np.float64
    )
    weights = (1 << np.arange(n_bits - 1, -1, -1, dtype=np.int64))

    def sketch(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf["id"].to_numpy(dtype=np.int64)
            a = np.array(pdf["emb"].tolist(), dtype=np.float64)
            acc = np.zeros((len(a), n_planes))
            for i in range(dim):  # ascending-dimension fold, per pair
                acc += np.outer(a[:, i], planes[:, i])
            s = (acc >= 0.0).astype(np.int64)
            keys = s.reshape(len(a), n_bands, n_bits) @ weights
            yield pd.DataFrame(
                {
                    "id": np.repeat(ids, n_bands),
                    "b": np.tile(np.arange(n_bands, dtype=np.int64), len(a)),
                    "key": keys.reshape(-1),
                }
            )

    return df.mapInPandas(sketch, "id long, b long, key long")


def md5_planes_sql(n_planes: int, dim: int) -> str:
    """DuckDB twin of _l3k_plane for all n_planes at once: the derived
    (p, plane) table with u = (md5-24-bit-prefix + 0.5)/2^24 - 0.5 —
    ONE definition shared by l3k and l4e (round-6 review #4: the
    u-derivation had three hand-kept copies; the Python copy in
    _l3k_plane remains, pinned to this by the l3k/l4e certificates)."""
    u = (
        "("
        + exact.md5_prefix_int_sql("CAST(p AS VARCHAR) || ':' || CAST(i AS VARCHAR)")
        + " + 0.5) / 16777216.0 - 0.5"
    )
    return (
        "(SELECT p, LIST(u ORDER BY i) AS plane FROM ("
        f"SELECT p, i, {u} AS u "
        f"FROM (SELECT UNNEST(range({n_planes})) AS p) "
        f"CROSS JOIN (SELECT UNNEST(range({dim})) AS i)) x GROUP BY p)"
    )


_L3K_PLANES_SQL = md5_planes_sql(_L3K_BANDS * _L3K_BITS, _L3K_DIM)

_L3K_ORACLE = (
    f"WITH planes AS {_L3K_PLANES_SQL}, "
    # sign bit per (vector, plane): the same sequential-fold dot as the
    # Spark literal-plane kernel
    "sb AS (SELECT e.vec_id, pl.p, CASE WHEN "
    f"{dot_sql('e.embedding', 'pl.plane')} >= 0 THEN 1 ELSE 0 END AS s "
    "FROM embeddings e CROSS JOIN planes pl), "
    # 4-bit band keys: integer sums, no float order hazard
    f"bands AS (SELECT vec_id, CAST(p // {_L3K_BITS} AS BIGINT) AS b, "
    f"CAST(SUM(s * (1 << (3 - (p % {_L3K_BITS})))) AS BIGINT) AS key "
    "FROM sb GROUP BY 1, 2), "
    "cand AS (SELECT DISTINCT q.vec_id AS query_id, v.vec_id AS neighbor_id "
    "FROM bands q JOIN bands v ON v.b = q.b AND v.key = q.key "
    "AND v.vec_id <> q.vec_id WHERE q.vec_id < 5), "
    "scored AS (SELECT c.query_id, c.neighbor_id, "
    f"{cosine_sim_sql('qe.embedding', 've.embedding')} AS cos_sim "
    "FROM cand c JOIN embeddings qe ON qe.vec_id = c.query_id "
    "JOIN embeddings ve ON ve.vec_id = c.neighbor_id) "
    "SELECT query_id, neighbor_id, cos_sim FROM ("
    "SELECT query_id, neighbor_id, cos_sim, "
    "ROW_NUMBER() OVER (PARTITION BY query_id "
    "ORDER BY cos_sim DESC, neighbor_id) AS rn FROM scored) x "
    "WHERE rn <= 5 ORDER BY query_id, cos_sim DESC, neighbor_id"
)


@register("l3k_knn_lsh_md5", oracle=_L3K_ORACLE, tags=("L3",))
def l3k_knn_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3 ORACLE-CERTIFIED hyperplane LSH: the l3b pipeline (sign
    sketches, 12 bands x 4 bits, any-band collision, exact re-rank)
    with md5-derived projection constants so DuckDB can replay every
    stage — the hash certificate for the remaining rows-only ANN
    family (l2f/l3i/l3j cover MinHash-LSH/IVF/PQ). l3b itself stays
    on xxhash64 planes (JVM-side, no DuckDB twin — why it is
    rows-only by design). The planes are CONSTANTS: computed once
    driver-side with hashlib (identical md5, see _md5_plane); the
    sign sketch runs in the vectorized md5_sign_bands kernel (round
    13 — the 48 inline interpreted dot folds were 7.4 s at sf0.1;
    the kernel's ascending-dimension accumulation is the same IEEE
    op order, so every sign bit matches), one map-only pass over the
    scan materialized once (lazy checkpoint) because both the query
    side and the probe side read it — the shape that holds at
    100 TB; the oracle derives the same doubles in SQL. Band keys
    are INTEGER bit-sums, immune to float order."""
    emb = T(spark, sf_dir, "embeddings")
    bands = md5_sign_bands(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb")),
        _L3K_BANDS, _L3K_BITS, _L3K_DIM,
    ).select(F.col("id").alias("vec_id"), "b", "key").localCheckpoint(eager=False)
    qb = bands.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "b", "key"
    )
    cand = (
        bands.join(F.broadcast(qb), ["b", "key"])
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    scored = (
        cand.join(emb.select(F.col("vec_id").alias("neighbor_id"), "embedding"), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select("query_id", "neighbor_id", cosine_sim("q_emb", "embedding").alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "cos_sim")
        .orderBy("query_id", F.desc("cos_sim"), "neighbor_id")
    )


@register(
    "l4_sim_join_exact",
    oracle=(
        f"WITH v AS (SELECT vec_id, embedding, {norm_sql('embedding')} AS nrm FROM embeddings) "
        "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
        f"({dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm)) AS cos_sim "
        "FROM v a JOIN v b ON a.vec_id < b.vec_id "
        f"WHERE ({dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm)) >= {SIM_TAU} "
        "ORDER BY vec_a, vec_b"
    ),
    tags=("L4",),
)
def l4_sim_join_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4: all-pairs cosine ≥ τ (exact baseline; LSH bounds the pair
    space at scale — l2/l3b machinery).

    Round 13 (guide §4.2): routed through the vectorized exact kernel
    in threshold mode (the d22/d24/l64 path) instead of the in-plan
    O(n²) join + per-element interpreted cosine fold — the sweep
    measured this query as the registry's single most expensive sf0.1
    row (~25 s; the fold evaluates 2·dim interpreted lambda calls per
    pair). The kernel's matmul screen + ascending-dimension exact
    recompute emits the IDENTICAL pair set with bit-identical cosines
    (same per-vector norm fold, same per-pair dot fold, same ≥ τ
    exact threshold — the contract topk_per_row_exact certifies and
    the unchanged DuckDB oracle re-proves). only_greater is the
    a < b self-join dedup convention; blocked handoff beyond the
    candidate cap keeps it executable at any corpus size."""
    from ipydataclean_spark.functions.knn import topk_per_row_exact_auto

    emb = T(spark, sf_dir, "embeddings")
    side = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
    return (
        topk_per_row_exact_auto(side, side, None, min_cos=SIM_TAU, only_greater=True)
        .select(
            F.col("part_id").alias("vec_a"),
            F.col("cand_id").alias("vec_b"),
            "cos_sim",
        )
        .orderBy("vec_a", "vec_b")
    )


@register(
    "l4c_embed_dedup",
    oracle=(
        "WITH dropped AS (SELECT DISTINCT b.vec_id AS v "
        "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id "
        f"WHERE {cosine_sim_sql('a.embedding', 'b.embedding')} >= {SIM_TAU}) "
        "SELECT e.vec_id, e.label FROM embeddings e "
        "WHERE e.vec_id NOT IN (SELECT v FROM dropped) ORDER BY e.vec_id"
    ),
    tags=("L4", "dedup"),
)
def l4c_embed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup dedup: greedy-by-id survivors — drop any
    vector with cosine ≥ τ to a lower-id vector (anti-join on the
    similarity pair set)."""
    emb = T(spark, sf_dir, "embeddings")
    pairs = l4_sim_join_exact(spark, sf_dir).select(F.col("vec_b").alias("vec_id"))
    return (
        emb.join(pairs, "vec_id", "left_anti")
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


_D19_ORACLE = (
    "WITH s AS (SELECT (vec_id % 2 = 0) AS is_a, "
    "unnest(embedding) AS v, generate_subscripts(embedding, 1) AS pos "
    "FROM embeddings), "
    "agg AS (SELECT is_a, pos, " + exact.dsum_sql("ROUND(v, 6)") + " AS msum, "
    "CAST(COUNT(*) AS BIGINT) AS n FROM s GROUP BY is_a, pos), "
    "va AS (SELECT LIST(msum / n ORDER BY pos) AS a, MAX(n) AS n_a "
    "FROM agg WHERE is_a), "
    "vb AS (SELECT LIST(msum / n ORDER BY pos) AS b, MAX(n) AS n_b "
    "FROM agg WHERE NOT is_a), "
    "m AS (SELECT n_a, n_b, a, b, "
    "list_transform(range(1, len(a) + 1), i -> ABS(a[i] - b[i])) AS shift "
    "FROM va CROSS JOIN vb) "
    "SELECT n_a, n_b, "
    "ROUND(" + cosine_sim_sql("a", "b") + ", 8) AS cos_mean_sim, "
    "ROUND(list_max(shift), 8) AS max_dim_shift, "
    "CAST(list_position(shift, list_max(shift)) AS INTEGER) AS max_shift_dim "
    "FROM m"
)


@register("d19_embedding_drift", oracle=_D19_ORACLE, tags=("D7", "L4", "drift"))
def d19_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D19: EMBEDDING-SPACE drift — the detector a curation pipeline
    points at two corpus slices (yesterday vs today, source A vs B;
    the fixture slices on vec_id parity) to catch a shifted embedding
    distribution before it poisons dedup thresholds or ANN recall:
    cosine between the slice MEAN vectors, plus the largest per-
    dimension mean shift and which dimension moved (the triage
    pointer). Extends the drift family (D7 KS / d11 PSI / d15 null-
    rate / l38 token-KL) to the embedding modality.

    Exactness discipline: per-dimension means are DECIMAL sums
    (order-of-summation independent, functions/exact.py) divided once
    by the slice count; the mean vectors re-enter array form via a
    sorted 64-element collect (aggregate-sized, the documented tiny-
    intermediate exception) and the cosine is the sequential fold
    from functions/vector.py — every float op identical cross-engine,
    so the drift numbers themselves are driver-hash certified.

    At 100 TB: one posexplode + one (slice, dim)-keyed partial agg —
    64·|slices| rows out of the shuffle regardless of corpus size; no
    per-pair work anywhere.

    Precondition: BOTH slices must be non-empty (advice r08 — on an
    empty slice Spark's collect_list folds cosine over an empty array
    while DuckDB's LIST() yields NULL, so the engines would disagree
    instead of failing together). Not reachable on the parity-slice
    fixture; a caller pointing this at arbitrary slices should filter
    or assert slice counts first."""
    emb = T(spark, sf_dir, "embeddings")
    s = emb.select(
        (F.col("vec_id") % 2 == 0).alias("is_a"),
        F.posexplode("embedding").alias("pos0", "v"),
    ).select("is_a", (F.col("pos0") + 1).alias("pos"), "v")
    # round-then-dsum (the established float rule): raw embedding
    # doubles don't cast to DECIMAL(28,6) identically across engines
    # (half-up vs half-even at the 1e-6 quantization boundary — the
    # first cut hash-mismatched by 3e-8); rounding FIRST makes the
    # decimal cast exact, and 1e-6 input quantization is far below any
    # drift signal this detector reads.
    agg = s.groupBy("is_a", "pos").agg(
        exact.dsum(F.round("v", 6)).alias("msum"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    vec = F.transform(
        F.array_sort(F.collect_list(F.struct("pos", F.col("msum"), F.col("n")))),
        lambda x: x.msum / x.n.cast("double"),
    )
    va = agg.where(F.col("is_a")).agg(
        vec.alias("a"), F.max("n").alias("n_a")
    )
    vb = agg.where(~F.col("is_a")).agg(
        vec.alias("b"), F.max("n").alias("n_b")
    )
    shift = F.zip_with("a", "b", lambda x, y: F.abs(x - y))
    m = va.crossJoin(vb).withColumn("shift", shift)
    return m.select(
        "n_a",
        "n_b",
        F.round(cosine_sim("a", "b"), 8).alias("cos_mean_sim"),
        F.round(F.array_max("shift"), 8).alias("max_dim_shift"),
        F.array_position("shift", F.array_max("shift")).cast("int").alias("max_shift_dim"),
    )


NEARDUP_TAU = 0.98  # production near-dup threshold (true twins ≥ 0.99)


def embeddings_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings ∪ perturbed twin of every 5th vector (known near-dups
    at cosine ≥ 0.99): +0.1 on coordinate (vec_id mod 64) of a unit
    vector. The embedding analogue of qhelp.documents_dup — the raw
    fixture's max off-diagonal cosine is ≈ 0.51, so it contains no
    true near-dups to find."""
    emb = T(spark, sf_dir, "embeddings")
    twin = emb.filter("vec_id % 5 = 0").select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: (
                x.cast("double")
                + F.when(i == F.pmod(F.col("vec_id"), F.lit(64)), F.lit(0.1)).otherwise(
                    F.lit(0.0)
                )
            ).cast("float"),
        ).alias("embedding"),
        "label",
    )
    return emb.unionByName(twin)


def embed_neardup_pairs_lsh(
    vectors: DataFrame, tau: float, n_bands: int = 16, band_bits: int = 12
) -> DataFrame:
    """Sub-quadratic cosine-pair join: hyperplane-band self-join →
    candidate dedup → exact cosine ≥ τ verify. Candidate volume is
    bounded by same-bucket collisions (≈ n²/2^band_bits per band for
    near-orthogonal corpora) — band_bits is the selectivity knob that
    must GROW with corpus size; n_bands buys recall back.

    Recall math (per-plane sign-flip P = θ/π): an injected twin at
    cos ≈ 0.995 flips with P ≈ 0.032, so a 12-bit band collides with
    P ≈ 0.968^12 ≈ 0.68 and 16 bands miss with P ≈ 0.32^16 ≈ 1e-8;
    a boundary pair at exactly cos = 0.98 (flip ≈ 0.064) misses with
    P ≈ 0.55^16 ≈ 7e-5 — margins sized so a regenerated fixture with
    hundreds of twins still recalls them all with overwhelming odds
    (8 bands left ~1e-4/pair on twins, too thin across fixture
    regenerations).

    Round 13 (guide §2.3 + §4.2, the l2 slim-fanout pattern): the band
    self-join previously carried BOTH full embeddings through the
    exchange and the pair dedup; now only ids ride the band join, the
    embeddings rejoin after the dedup, and the exact-cosine verify runs
    in the vectorized pair kernel (bit-identical scores — see
    cosine_score_pairs). Pair set and scores unchanged (dedup is keyed
    on the id pair either way; embeddings are functionally determined
    by the ids)."""
    from ipydataclean_spark.functions.knn import cosine_score_pairs, hyperplane_bands

    sigs = hyperplane_bands(vectors, n_bands=n_bands, band_bits=band_bits)
    a = sigs.select(F.col("vec_id").alias("vec_a"), "band_id", "band_val")
    b = sigs.select(F.col("vec_id").alias("vec_b"), "band_id", "band_val")
    cand = (
        a.join(b, ["band_id", "band_val"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .dropDuplicates(["vec_a", "vec_b"])
        .select("vec_a", "vec_b")
    )
    ea = vectors.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = vectors.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    return cosine_score_pairs(
        cand.join(ea, "vec_a").join(eb, "vec_b")
        .select("vec_a", "vec_b", "emb_a", "emb_b")
    ).where(F.col("cos_sim") >= tau)


@register("l4b_embed_neardup_lsh", oracle=None, tags=("L4", "L2", "dedup"))
def l4b_embed_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 scale path: embedding near-dup pairs via hyperplane-LSH
    banding — the sub-quadratic form of l4_sim_join_exact, run at the
    production regime: τ = 0.98 over embeddings_dup (injected twins at
    cosine ≥ 0.99). LSH economics demand a high τ — at the fixture's
    exploratory τ = 0.45 (pairs barely above background) no banding is
    selective and exact l4 is the right tool; near-dup DEDUP is a
    high-τ problem, which is what this path serves at 100 TB.

    Rows-only by design (deterministic hash-derived planes, no RNG);
    recall + no-false-positives pinned by
    tests/test_llm.py::test_embed_neardup_lsh_recall."""
    return embed_neardup_pairs_lsh(
        embeddings_dup(spark, sf_dir), tau=NEARDUP_TAU
    ).orderBy("vec_a", "vec_b")


_L4E_NB, _L4E_BITS, _L4E_DIM = 16, 12, 64  # l4b's operating point

_L4E_PLANES_SQL = md5_planes_sql(_L4E_NB * _L4E_BITS, _L4E_DIM)


def _l4e_oracle() -> str:
    from ipydataclean_spark.operators.ivf import _L36_DUP_CTE

    return (
        "WITH " + _L36_DUP_CTE + ", "
        f"planes AS MATERIALIZED {_L4E_PLANES_SQL}, "
        "sb AS (SELECT d.vec_id, pl.p, CASE WHEN "
        f"{dot_sql('d.embedding', 'pl.plane')} >= 0 THEN 1 ELSE 0 END AS s "
        "FROM dup d CROSS JOIN planes pl), "
        f"bands AS (SELECT vec_id, CAST(p // {_L4E_BITS} AS BIGINT) AS b, "
        "CAST(SUM(s * CAST(POWER(2, "
        f"{_L4E_BITS - 1} - (p % {_L4E_BITS})) AS BIGINT)) AS BIGINT) AS key "
        "FROM sb GROUP BY 1, 2), "
        "cand AS (SELECT DISTINCT a.vec_id AS vec_a, v.vec_id AS vec_b "
        "FROM bands a JOIN bands v ON v.b = a.b AND v.key = a.key "
        "AND a.vec_id < v.vec_id), "
        "scored AS (SELECT c.vec_a, c.vec_b, "
        f"{cosine_sim_sql('ea.embedding', 'eb.embedding')} AS cos_sim "
        "FROM cand c JOIN dup ea ON ea.vec_id = c.vec_a "
        "JOIN dup eb ON eb.vec_id = c.vec_b) "
        "SELECT vec_a, vec_b, cos_sim FROM scored "
        f"WHERE cos_sim >= {NEARDUP_TAU} ORDER BY vec_a, vec_b"
    )


@register("l4e_embed_neardup_lsh_md5", oracle=_l4e_oracle(), tags=("L4", "L2", "dedup"))
def l4e_embed_neardup_lsh_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L4 ORACLE-CERTIFIED hyperplane-LSH near-dup join: l4b's exact
    operating point (16 bands x 12 bits, tau = 0.98 over
    embeddings_dup) with md5-derived planes so DuckDB replays every
    stage — band self-join candidates, exact-cosine verify, the lot.
    l4b stays on xxhash64 planes (rows-only by design). The 192
    planes are md5-derived constants (the identical
    u = (md5-24-bit-prefix + 0.5)/2^24 - 0.5 doubles the oracle's
    derived-plane CTE computes — _md5_plane's IEEE-exactness note);
    the sign sketch runs in the vectorized md5_sign_bands kernel
    (round 13 — the previous in-plan form exploded a 192-row-per-
    vector (vec_id, p, sign) fanout through a crossJoin and a grouped
    integer sum, paying an interpreted 64-element fold per (vector,
    plane) row plus two exchanges; the kernel's ascending-dimension
    accumulation is the same IEEE op order per pair, so every sign
    bit matches and the certificate holds). Band keys are integer
    bit-sums; the band table is map-only over the scan, checkpointed
    once for its two join sides."""
    emb = embeddings_dup(spark, sf_dir)
    bands = md5_sign_bands(
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb")),
        _L4E_NB, _L4E_BITS, _L4E_DIM,
    ).select(F.col("id").alias("vec_id"), "b", "key").localCheckpoint(eager=False)
    a = bands.select(F.col("vec_id").alias("vec_a"), "b", "key")
    v = bands.select(F.col("vec_id").alias("vec_b"), "b", "key")
    cand = (
        a.join(v, ["b", "key"])
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    from ipydataclean_spark.functions.knn import cosine_score_pairs

    ea = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("emb_a"))
    eb = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("emb_b"))
    return (
        cosine_score_pairs(
            cand.join(ea, "vec_a").join(eb, "vec_b")
            .select("vec_a", "vec_b", "emb_a", "emb_b")
        )
        .where(F.col("cos_sim") >= NEARDUP_TAU)
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# L5-L10 — text stats / slices / quality / search / tokens
# ---------------------------------------------------------------------------


@register(
    "l5_text_stats",
    oracle=(
        "WITH toks AS (SELECT doc_id, n_chars, "
        f"string_split({norm_text_sql('text')}, ' ') AS t FROM documents) "
        "SELECT doc_id, n_chars, "
        "CAST(LEN(t) AS INTEGER) AS n_tokens, "
        "(CAST(list_sum(list_transform(t, x -> LENGTH(x))) AS DOUBLE) / LEN(t)) AS avg_token_len, "
        f"(CAST(LEN(list_filter(t, x -> list_contains({list(STOPWORDS)!r}, x))) AS DOUBLE) / LEN(t)) AS stopword_ratio "
        "FROM toks WHERE doc_id % 4 = 0 ORDER BY doc_id"
        .replace("['the', 'a', 'of']", "['the', 'a', 'of']")
    ),
    tags=("L5",),
)
def l5_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L5: per-doc text statistics (length, tokens, avg token length,
    stopword ratio) — all array builtins, zero Python."""
    df = T(spark, sf_dir, "documents").where(F.col("doc_id") % 4 == 0)
    t = tokens_col("text")
    stop = F.array(*[F.lit(s) for s in STOPWORDS])
    total_len = F.aggregate(
        F.transform(t, lambda x: F.length(x).cast("long")), F.lit(0).cast("long"), lambda a, x: a + x
    )
    return df.select(
        "doc_id",
        "n_chars",
        F.size(t).alias("n_tokens"),
        (total_len.cast("double") / F.size(t)).alias("avg_token_len"),
        (F.size(F.filter(t, lambda x: F.array_contains(stop, x))).cast("double") / F.size(t)).alias(
            "stopword_ratio"
        ),
    ).orderBy("doc_id")


@register(
    "l6_slice_metrics",
    oracle=(
        "SELECT lang, source, COUNT(*) AS n_docs, "
        "CAST(SUM(n_chars) AS BIGINT) AS total_chars, "
        "MEDIAN(n_chars) AS med_chars, "
        "MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars "
        "FROM documents GROUP BY lang, source ORDER BY lang, source"
    ),
    tags=("L6",),
)
def l6_slice_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L6: per-(lang, source) slice metrics for corpus balancing."""
    return (
        T(spark, sf_dir, "documents")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            exact.isum("n_chars").alias("total_chars"),
            F.expr("percentile(n_chars, 0.5)").alias("med_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .orderBy("lang", "source")
    )


@register(
    "l7_quality_filter",
    oracle=(
        "WITH toks AS (SELECT doc_id, n_chars, "
        f"string_split({norm_text_sql('text')}, ' ') AS t FROM documents) "
        "SELECT doc_id, "
        "CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END AS len_ok, "
        "CASE WHEN LEN(t) >= 20 THEN 1 ELSE 0 END AS tokens_ok, "
        "CASE WHEN CAST(LEN(list_distinct(t)) AS DOUBLE) / LEN(t) >= 0.25 THEN 1 ELSE 0 END AS diversity_ok, "
        "CASE WHEN CAST(list_sum(list_transform(t, x -> LENGTH(x))) AS DOUBLE) / LEN(t) BETWEEN 2.0 AND 10.0 THEN 1 ELSE 0 END AS wordlen_ok, "
        "CASE WHEN n_chars >= 100 AND LEN(t) >= 20 "
        "AND CAST(LEN(list_distinct(t)) AS DOUBLE) / LEN(t) >= 0.25 "
        "AND CAST(list_sum(list_transform(t, x -> LENGTH(x))) AS DOUBLE) / LEN(t) BETWEEN 2.0 AND 10.0 "
        "THEN 1 ELSE 0 END AS keep "
        "FROM toks ORDER BY doc_id"
    ),
    tags=("L7",),
)
def l7_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L7: Gopher/C4-style heuristic quality rules (public heuristics):
    min length, min tokens, lexical diversity, mean word length."""
    df = T(spark, sf_dir, "documents")
    t = tokens_col("text")
    n_tok = F.size(t)
    diversity = F.size(F.array_distinct(t)).cast("double") / n_tok
    mean_wl = (
        F.aggregate(F.transform(t, lambda x: F.length(x).cast("long")), F.lit(0).cast("long"), lambda a, x: a + x)
        .cast("double")
        / n_tok
    )
    len_ok = (F.col("n_chars") >= 100).cast("int")
    tokens_ok = (n_tok >= 20).cast("int")
    diversity_ok = (diversity >= 0.25).cast("int")
    wordlen_ok = ((mean_wl >= 2.0) & (mean_wl <= 10.0)).cast("int")
    return df.select(
        "doc_id",
        len_ok.alias("len_ok"),
        tokens_ok.alias("tokens_ok"),
        diversity_ok.alias("diversity_ok"),
        wordlen_ok.alias("wordlen_ok"),
        (len_ok.cast("boolean") & tokens_ok.cast("boolean") & diversity_ok.cast("boolean") & wordlen_ok.cast("boolean"))
        .cast("int")
        .alias("keep"),
    ).orderBy("doc_id")


@register(
    "l8_keyword_search",
    oracle=(
        "WITH toks AS (SELECT doc_id, "
        f"string_split({norm_text_sql('text')}, ' ') AS t FROM documents) "
        "SELECT doc_id, "
        "CAST(LEN(list_filter(t, x -> x = 'spark')) AS INTEGER) AS tf_spark, "
        "CAST(LEN(list_filter(t, x -> x = 'join')) AS INTEGER) AS tf_join, "
        "CAST(LEN(list_filter(t, x -> x = 'spark')) + LEN(list_filter(t, x -> x = 'join')) AS INTEGER) AS score "
        "FROM toks WHERE list_contains(t, 'spark') AND list_contains(t, 'join') "
        "ORDER BY score DESC, doc_id LIMIT 20"
    ),
    tags=("L8",),
)
def l8_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L8: boolean keyword search ranked by naive term frequency."""
    df = T(spark, sf_dir, "documents")
    t = tokens_col("text")
    tf = lambda term: F.size(F.filter(t, lambda x: x == term))  # noqa: E731
    return (
        df.select(
            "doc_id",
            tf("spark").alias("tf_spark"),
            tf("join").alias("tf_join"),
            (tf("spark") + tf("join")).alias("score"),
            t.alias("__t"),
        )
        .where(F.array_contains("__t", "spark") & F.array_contains("__t", "join"))
        .drop("__t")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )


@register(
    "l10_token_count",
    oracle=(
        "SELECT lang, COUNT(*) AS n_docs, "
        "CAST(SUM(LEN(regexp_extract_all(LOWER(text), '[a-z0-9]+'))) AS BIGINT) AS total_tokens, "
        "(CAST(SUM(LEN(regexp_extract_all(LOWER(text), '[a-z0-9]+'))) AS DOUBLE) / COUNT(*)) AS avg_tokens_per_doc "
        "FROM documents GROUP BY lang ORDER BY lang"
    ),
    tags=("L10",),
)
def l10_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10: regex token counting for training-budget estimates (BPE-less
    proxy; the real-tokenizer path is a pandas_udf slot)."""
    df = T(spark, sf_dir, "documents")
    n_tok = F.regexp_count(F.lower(F.col("text")), F.lit("[a-z0-9]+")).cast("long")
    return (
        df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_tok).alias("total_tokens"),
            (F.sum(n_tok).cast("double") / F.count(F.lit(1))).alias("avg_tokens_per_doc"),
        )
        .orderBy("lang")
    )


@register(
    "l4d_label_centroids",
    oracle=(
        "SELECT label, CAST(gs.i AS INTEGER) AS pos, "
        "(CAST(SUM(CAST(FLOOR(embedding[gs.i] * 16777216.0) AS BIGINT)) AS DOUBLE) "
        "/ COUNT(*)) / 16777216.0 AS centroid_val "
        "FROM embeddings CROSS JOIN generate_series(1, 64) AS gs(i) "
        "GROUP BY label, gs.i ORDER BY label, pos"
    ),
    tags=("L4", "L3", "embeddings"),
)
def l4d_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid embedding (the class-prototype op a training
    pipeline runs before nearest-centroid dedup/classification; also
    the oracle-checked twin of the Lloyd update inside ivf.build_ivf).

    posexplode → groupBy(label, pos) → exact fixed-point mean: values
    scale by 2^24 (an exact power-of-two multiply), floor to integers,
    sum as BIGINT — order-independent and bit-identical across engines
    (float→decimal casts are NOT: Spark rounds the shortest-string
    repr, DuckDB the exact binary expansion). ONE shuffle
    keyed (label, pos) — dim fans the data out 64×, but partial
    (map-side) aggregation collapses each partition to ≤ labels×64
    rows before it, so the shuffle payload is tiny at any scale.
    Long (label, pos, val) form: hash-comparable and directly
    array_agg-able back to vectors when needed."""
    return (
        T(spark, sf_dir, "embeddings")
        .select("label", F.posexplode("embedding").alias("pos0", "val"))
        .select("label", (F.col("pos0") + 1).alias("pos"), F.col("val").cast("double").alias("v"))
        .groupBy("label", "pos")
        .agg(
            (
                F.sum(F.floor(F.col("v") * F.lit(16777216.0))).cast("double")
                / F.count(F.lit(1))
                / F.lit(16777216.0)
            ).alias("centroid_val")
        )
        .orderBy("label", "pos")
    )


@register(
    "l3g_knn_filtered",
    oracle=(
        "SELECT query_id, neighbor_id, label, cos_sim FROM ("
        "SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, e.label, "
        f"{cosine_sim_sql('q.embedding', 'e.embedding')} AS cos_sim, "
        "ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
        f"{cosine_sim_sql('q.embedding', 'e.embedding')} DESC, e.vec_id) AS rn "
        "FROM embeddings q CROSS JOIN embeddings e "
        "WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id AND e.label = q.label) "
        "WHERE rn <= 5 ORDER BY query_id, cos_sim DESC, neighbor_id"
    ),
    tags=("L3", "similarity-search"),
)
def l3g_knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3g: FILTERED vector search — top-k restricted to corpus rows
    satisfying a metadata predicate (here: same label as the query),
    the retrieval-with-tenant/category-filter every production vector
    store needs. Exact form: the filter is applied INSIDE the scored
    join (pre-filtering), so selectivity reduces scored pairs
    one-for-one — unlike post-filtering a top-k, which silently
    returns < k. On the IVF path the same predicate pushes into the
    cell-partitioned parquet scan as a partition/row-group filter
    (ivf.ivf_knn_stored's read path)."""
    emb = T(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    e = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("e_emb"),
        "label",
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .where(
            (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("label") == F.col("q_label"))
        )
        .select(
            "query_id", "neighbor_id", "label",
            cosine_sim("q_emb", "e_emb").alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("query_id", "neighbor_id", "label", "cos_sim")
        .orderBy("query_id", F.desc("cos_sim"), "neighbor_id")
    )
