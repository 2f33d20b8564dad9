"""LLM-pipeline extensions: dedup clustering, language-ID,
document fingerprinting, chunking (SURVEY.md §2.9 round-2 queue).

All DataFrame-native; worker-side Python (the UDTF) is a local class,
pickled by value.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.functions.text import norm_text_col, norm_text_sql
from ipydataclean_spark.operators import llm
from ipydataclean_spark.operators.llm import exploded_shingles, tokens_col
from ipydataclean_spark.operators.qhelp import T, documents_dup, with_documents_dup
from ipydataclean_spark.registry import register

# ---------------------------------------------------------------------------
# Connected-components clustering over near-dup pairs (L2 cluster step)
# ---------------------------------------------------------------------------


def _free_local_checkpoint(df: DataFrame) -> None:
    """Eagerly release a localCheckpoint'ed DataFrame's storage blocks.

    ``localCheckpoint`` has no public release API (unlike
    persist/unpersist), so a checkpointed table's blocks live until the
    JVM's ContextCleaner garbage-collects the underlying RDD — which a
    long-lived session driving many iterative rounds may never do
    promptly (ADVICE r06: up to ``max_iter`` materialized label tables
    accumulating in executor storage). The iterative operators here
    only ever need the LATEST round's table, so the previous round's
    blocks are dead the moment the new checkpoint materializes — free
    them through the LogicalRDD handle. The freed DataFrame is
    UNUSABLE afterwards (checkpointing truncated its lineage), so this
    must only be called on tables nothing references anymore.
    Best-effort — but NOT silent: the path goes through private
    internals, so a Spark upgrade (or Spark Connect) could turn every
    call into a no-op and quietly reinstate the unbounded-retention
    leak this exists to fix; the first failure warns once so the
    regression is visible (review r07 second pass #4). Actual block
    release is asserted in tests/test_extras_r6.py.
    """
    global _FREE_CHECKPOINT_WARNED
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception as exc:  # pragma: no cover - environment-specific
        if not _FREE_CHECKPOINT_WARNED:
            _FREE_CHECKPOINT_WARNED = True
            warnings.warn(
                "checkpoint-block release unavailable in this Spark "
                f"environment ({exc!r}); iterative operators will retain "
                "up to max_iter materialized tables per call",
                RuntimeWarning,
                stacklevel=2,
            )


_FREE_CHECKPOINT_WARNED = False


def cluster_pairs(
    ids: DataFrame, pairs: DataFrame, max_iter: int = 10, method: str = "star"
) -> DataFrame:
    """Connected components over undirected edges — the L2 cluster step.

    ids: (id BIGINT); pairs: (a, b) undirected edges.
    Returns (id, cluster_id) where cluster_id = min id in the component.
    Contract: only ids are labeled, and edges mentioning a node NOT in
    ``ids`` are DROPPED (a foreign node never bridges two members) —
    both methods enforce this identically (review r07 #3).

    ``method="star"`` (default, the scale path): the alternating
    large-star/small-star algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond", ACM SoCC'14 — public). Each
    round shuffles only the EDGE table, which contracts toward a star
    forest (every node pointing at its component min), and converges in
    O(log n) rounds independent of component diameter — unlike label
    propagation there is no per-round full-label-table x full-edge-table
    join, which was the named 100 TB scale gap (VERDICT r06 #2).

    ``method="propagate"``: the previous min-label-propagation fixpoint
    (one join+groupBy per round, O(min-id eccentricity) rounds). Kept as
    an independent mechanism for equality cross-checks in tests.

    Both methods break early on convergence, checkpoint per round with
    bounded retention (the previous round's blocks are freed as soon as
    the new round materializes), and RAISE if still unconverged at
    max_iter.
    """
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
    if method == "star":
        return _cluster_pairs_star(ids, pairs, max_iter)
    if method != "propagate":
        raise ValueError(f"unknown method: {method!r} (star | propagate)")
    # Materialize edges ONCE (round-6 review follow-up): without this,
    # every propagation round re-executes the whole upstream candidate
    # pipeline (pairs' lineage — the full LSH build for c30/c30b) —
    # measured 117 s -> materialized-edges form at sf1 for c30b.
    edges = (
        pairs.select(F.col("a"), F.col("b"))
        .unionByName(pairs.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .unionByName(ids.select(F.col("id").alias("a"), F.col("id").alias("b")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # Per-round EAGER localCheckpoint, not persist (round-6 review):
    # ``labels`` is referenced TWICE per iteration (propagation source
    # + merge base), so without lineage cuts the logical plan doubles
    # every round — 2^k nodes, measured JVM heap OOM at ~11 rounds on
    # a 13-node test chain. Checkpointing replaces the plan with the
    # materialized table each round, so depth stays O(1) at any
    # max_iter; the label table is component-count-sized, tiny.
    labels = ids.select("id", F.col("id").alias("cluster_id")).localCheckpoint(
        eager=True
    )
    for _ in range(max_iter):
        # candidate label for a = min over neighbors b of label(b)
        prop = (
            edges.join(labels.withColumnRenamed("id", "b"), "b")
            .groupBy("a")
            .agg(F.min("cluster_id").alias("new_label"))
            .withColumnRenamed("a", "id")
        )
        new_labels = (
            labels.join(prop, "id", "left")
            .select("id", F.least("cluster_id", F.coalesce("new_label", "cluster_id")).alias("cluster_id"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("cluster_id", "nc")
            .join(labels, "id")
            .where(F.col("nc") != F.col("cluster_id"))
            .count()
        )
        # the old round's checkpoint blocks are dead now that the new
        # round is materialized and the change count is computed —
        # free them instead of letting up to max_iter copies pile up
        # in executor storage for the session (ADVICE r06)
        _free_local_checkpoint(labels)
        labels = new_labels
        if changed == 0:
            break
    else:
        # FAIL LOUDLY on non-convergence (round-6 review): a silently
        # partial labeling splits one component into several clusters —
        # wrong dedup survivors, and a guaranteed hash mismatch against
        # the exact recursive-CTE closure oracles (er1/c30b). Never
        # reachable on star/clique-shaped dup clusters (diameter <= 2);
        # a 12+-doc sliding chain would reach it at max_iter=10.
        raise RuntimeError(
            f"cluster_pairs did not converge in {max_iter} iterations "
            f"({changed} labels still changing); raise max_iter — the "
            "component min-id eccentricity exceeds the round budget"
        )
    return labels


def _cluster_pairs_star(ids: DataFrame, pairs: DataFrame, max_iter: int) -> DataFrame:
    """Alternating large-star/small-star connected components.

    State is a DIRECTED edge set (u, v) with u > v, distinct; one round:

    * large-star: for every node u, attach each strictly-LARGER
      neighbor to m = min(N(u) + {u}) — emit (v, m) for v in N(u),
      v > u, over the symmetrized neighborhood.
    * small-star: for every node u (now all neighbors < u), attach
      every smaller neighbor AND u itself to m = min(N(u)) — emit
      (v, m) for v in N(u) + {u}, v != m.

    Both operations preserve connectivity and monotonically shrink a
    potential (sum of node-pair heights), so the alternation reaches a
    fixed point — a star forest whose centers are the component minima
    — in O(log n) rounds (Kiveris et al., SoCC'14). A fixed point is
    detected by edge-set equality between rounds (both sides distinct:
    equal counts + empty subtract). Per-round cost: two groupBy/join
    shuffles over the contracting edge table; no corpus-wide label
    table is ever joined, so skewed/deep components no longer dominate
    — the label-propagation variant's 100 TB weakness.
    """
    # normalize: drop self-loops, restrict both endpoints to ``ids``
    # (the propagate method only ever labels ids, so edges through
    # foreign nodes silently drop there — star must match that
    # contract or the two mechanisms diverge on ids-filtered callers;
    # review r07 #3), orient u > v, dedup; checkpoint so the upstream
    # candidate pipeline (the full LSH build for c30/l2d) executes
    # ONCE, not once per round. The checkpoint is LAZY and the count
    # that follows materializes it — one job instead of two (round-13
    # optimization; same for the per-round checkpoints below).
    ids_a = ids.select(F.col("id").alias("__ia"))
    ids_b = ids.select(F.col("id").alias("__ib"))
    cur = (
        pairs.where(F.col("a") != F.col("b"))
        .join(ids_a, F.col("a") == F.col("__ia"), "left_semi")
        .join(ids_b, F.col("b") == F.col("__ib"), "left_semi")
        .select(
            F.greatest(F.col("a"), F.col("b")).alias("u"),
            F.least(F.col("a"), F.col("b")).alias("v"),
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    cur_count = cur.count()
    converged = cur_count == 0  # no edges: every id is its own star
    # Round-13 rewrite of the per-round plan (guide §2.4 "window
    # functions partitioned by the same key as a preceding aggregation
    # do not need a second shuffle"): each star's per-node minimum is a
    # WINDOW over the edge table instead of a groupBy + join back, so a
    # round shuffles the contracting edge table twice (once per star,
    # by its grouping node) and the (u,v) distinct once, instead of the
    # old agg-exchange + join + per-star distinct + TWO eager
    # checkpoints. The emitted edge SETS are identical per round (same
    # per-node minima over the same neighborhoods, same filters, same
    # final distinct), so the fixpoint, round count and labels are
    # unchanged — pinned by the star-vs-propagate equality tests and
    # the er1/c30b recursive-closure oracles. At scale this also
    # strictly dominates the old shape once the per-node min table
    # outgrows the broadcast threshold (the join side would shuffle +
    # sort the same bytes the window sorts, PLUS the agg exchange).
    w_u = Window.partitionBy("u")
    w_uo = Window.partitionBy("u").orderBy("v")
    for _ in range(max_iter):
        if converged:
            break
        # large-star over the symmetrized neighborhood: attach
        # m = min(N(u) + {u}) per row, emit (v, m) for the larger
        # neighbors. Duplicate emitted pairs are fine — the small-star
        # min is dup-insensitive and the round's final distinct
        # canonicalizes the set.
        nbr = cur.unionByName(
            cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        large = (
            nbr.select(
                "u", "v", F.least(F.min("v").over(w_u), F.col("u")).alias("m")
            )
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
        )
        # small-star: ``large`` is directed u > v (m <= u < v for every
        # emitted edge), so N(u) here is exactly the smaller neighbors.
        # One ordered window computes the per-u min AND marks one row
        # per u (rn = 1); the explode emits (v, m) per row plus (u, m)
        # once per u — the old union of two subtrees re-executed the
        # whole round's plan twice.
        pair = lambda x, y: F.struct(x.alias("x"), y.alias("y"))  # noqa: E731
        t = large.select(
            "u", "v",
            F.min("v").over(w_u).alias("m"),
            F.row_number().over(w_uo).alias("rn"),
        )
        small = (
            t.select(
                F.explode(
                    F.when(
                        F.col("rn") == 1,
                        F.array(
                            pair(F.col("v"), F.col("m")),
                            pair(F.col("u"), F.col("m")),
                        ),
                    ).otherwise(F.array(pair(F.col("v"), F.col("m"))))
                ).alias("e")
            )
            .select(F.col("e.x").alias("u"), F.col("e.y").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        new_count = small.count()  # materializes the checkpoint too
        converged = new_count == cur_count and small.subtract(cur).isEmpty()
        # previous round's blocks are dead once the equality check ran
        _free_local_checkpoint(cur)
        cur, cur_count = small, new_count
    if not converged:
        raise RuntimeError(
            f"cluster_pairs(star) did not converge in {max_iter} "
            "alternation rounds; raise max_iter — components need "
            "O(log n) rounds, so this indicates pathological input size"
        )
    # fixed point = star forest: every non-root appears exactly once as
    # u with v = its component min; roots and singletons label themselves
    return ids.join(
        cur.select(F.col("u").alias("id"), F.col("v").alias("__root")), "id", "left"
    ).select("id", F.coalesce("__root", F.col("id")).alias("cluster_id"))


@register("l2d_dedup_clusters", oracle=None, tags=("L2", "dedup"))
def l2d_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 cluster step: MinHash candidate pairs → connected components →
    one survivor (min doc_id) per cluster. Rows-only (iterative); the
    golden expectation (every injected dup clusters with its base doc)
    is asserted in tests/test_llm_extra.py."""
    from ipydataclean_spark.operators.llm import l2_minhash_lsh

    docs = documents_dup(spark, sf_dir)
    pairs = l2_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    labels = cluster_pairs(docs.select(F.col("doc_id").alias("id")), pairs, max_iter=30)
    return (
        labels.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("cluster_size"))
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# Language-ID (character n-gram profile heuristic)
# ---------------------------------------------------------------------------


def language_id(train: DataFrame, test: DataFrame, n: int = 2, top_profile: int = 200) -> DataFrame:
    """N-gram-profile language ID (Cavnar-Trenkle-style, public method):
    per-language top-k character-n-gram frequency profile from ``train``
    (text, lang); score ``test`` (doc_id, text) docs by summed profile
    weight; predict argmax language.

    Shapes: profile build is explode+groupBy (2 shuffles, tiny result,
    broadcast to the scorer); scoring is explode + broadcast join +
    groupBy doc — no per-row Python."""
    def grams(df: DataFrame, keep: list[str]) -> DataFrame:
        norm = F.lower(F.trim(F.col("text")))
        withn = df.withColumn("__s", norm)
        g = F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(F.col("__s")) - (n - 1), F.lit(0))),
            lambda i: F.col("__s").substr(i, F.lit(n)),
        )
        return withn.select(*keep, F.explode(g).alias("gram"))

    from pyspark.sql import Window

    lang_counts = grams(train, ["lang"]).groupBy("lang", "gram").agg(F.count(F.lit(1)).alias("cnt"))
    w = F.row_number().over(Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("gram")))
    profile = (
        lang_counts.withColumn("rank", w)
        .where(F.col("rank") <= top_profile)
        .select("lang", "gram", (F.lit(top_profile + 1) - F.col("rank")).cast("double").alias("weight"))
    )
    scored = (
        grams(test, ["doc_id"])
        .join(F.broadcast(profile), "gram")
        .groupBy("doc_id", "lang")
        .agg(F.sum("weight").alias("score"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(F.max_by("lang", F.struct(F.col("score"), F.col("lang"))).alias("predicted_lang"))
    )


_L11B_GRAM_SQL = (
    "CASE WHEN LENGTH({t}) >= 2 THEN list_transform("
    "range(1, LENGTH({t})), i -> substr({t}, i, 2)) "
    "ELSE [] END"
)

_L11B_ORACLE = (
    "WITH tr AS (SELECT LOWER(TRIM(text)) AS t, lang FROM documents "
    "WHERE doc_id % 2 = 0), "
    "te AS (SELECT doc_id, LOWER(TRIM(text)) AS t FROM documents "
    "WHERE doc_id % 2 = 1), "
    f"trg AS (SELECT lang, UNNEST({_L11B_GRAM_SQL.format(t='t')}) AS gram FROM tr), "
    "cnts AS (SELECT lang, gram, COUNT(*) AS cnt FROM trg GROUP BY 1, 2), "
    "prof AS (SELECT lang, gram, CAST(201 - rnk AS BIGINT) AS weight FROM ("
    "SELECT lang, gram, ROW_NUMBER() OVER (PARTITION BY lang "
    "ORDER BY cnt DESC, gram) AS rnk FROM cnts) x WHERE rnk <= 200), "
    f"teg AS (SELECT doc_id, UNNEST({_L11B_GRAM_SQL.format(t='t')}) AS gram FROM te), "
    "sc AS (SELECT g.doc_id, p.lang, CAST(SUM(p.weight) AS BIGINT) AS score "
    "FROM teg g JOIN prof p ON p.gram = g.gram GROUP BY 1, 2) "
    "SELECT doc_id, lang AS predicted_lang FROM ("
    "SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY doc_id "
    "ORDER BY score DESC, lang DESC) AS rn FROM sc) x "
    "WHERE rn = 1 ORDER BY doc_id"
)


@register("l11b_language_id_certified", oracle=_L11B_ORACLE, tags=("L11", "text-analysis"))
def l11b_language_id_certified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L11 ORACLE-CERTIFIED language ID: the Cavnar-Trenkle pipeline
    (char-bigram profiles from even doc_ids, top-200 by count with
    gram tie-break, rank weights, argmax score on odd doc_ids) with
    every stage replayed by DuckDB. Certifiable because the scoring
    is INTEGER throughout — rank weights are 1..200 and the per-doc
    score is an exact integer sum, so no float order exists to drift
    (l11 was rows-only for a semantic reason — the fixture shares one
    vocabulary across langs, so accuracy is asserted on a controlled
    corpus in tests — not an arithmetic one; this twin adds the
    missing cross-engine proof of the MECHANICS). Gram extraction is
    guarded for len < 2 in BOTH engines (Spark's sequence() would
    descend through 0 on short docs — the shingles_col hazard).
    Same scale shape as l11: profile build = explode + groupBy into a
    tiny broadcast table; scoring = explode + broadcast join +
    grouped sum."""
    docs = T(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))

    def grams(df: DataFrame, keep: list) -> DataFrame:
        withn = df.withColumn("__s", norm)
        seq = F.transform(
            F.sequence(F.lit(1), F.length("__s") - 1),
            lambda i: F.col("__s").substr(i, F.lit(2)),
        )
        g = F.when(F.length("__s") >= 2, seq).otherwise(
            F.array().cast("array<string>")
        )
        return withn.select(*keep, F.explode(g).alias("gram"))

    from pyspark.sql import Window

    train = docs.where(F.col("doc_id") % 2 == 0).select("text", "lang")
    test = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    cnts = grams(train, ["lang"]).groupBy("lang", "gram").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    rnk = F.row_number().over(
        Window.partitionBy("lang").orderBy(F.desc("cnt"), F.asc("gram"))
    )
    prof = (
        cnts.withColumn("rnk", rnk)
        .where(F.col("rnk") <= 200)
        .select(
            "lang", "gram", (F.lit(201) - F.col("rnk")).cast("long").alias("weight")
        )
    )
    sc = (
        grams(test, ["doc_id"])
        .join(F.broadcast(prof), "gram")
        .groupBy("doc_id", "lang")
        .agg(F.sum("weight").cast("long").alias("score"))
    )
    return (
        sc.groupBy("doc_id")
        .agg(
            F.max_by("lang", F.struct("score", "lang")).alias("predicted_lang")
        )
        .orderBy("doc_id")
    )


@register("l11_language_id", oracle=None, tags=("L11", "text-analysis"))
def l11_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L11: n-gram language-ID over documents (train on even doc_ids,
    predict odd). Rows-only: the fixture corpus shares one vocabulary
    across langs, so discriminative accuracy is asserted instead on a
    controlled multilingual corpus in tests/test_llm_extra.py."""
    docs = T(spark, sf_dir, "documents")
    train = docs.where(F.col("doc_id") % 2 == 0).select("text", "lang")
    test = docs.where(F.col("doc_id") % 2 == 1).select("doc_id", "text")
    return language_id(train, test).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Document fingerprinting (winnowing rolling-hash)
# ---------------------------------------------------------------------------


def fingerprints(docs: DataFrame, k: int = 8, window: int = 4) -> DataFrame:
    """Winnowing fingerprints (Schleimer et al., public algorithm):
    hash all char k-grams of the normalized text, slide a window of
    ``window`` consecutive hashes, keep each window's min, distinct.

    Pure array expressions (transform over sequence + xxhash64 +
    array_min over slice) — codegen end to end."""
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    d = docs.withColumn("__s", norm)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("__s") - (k - 1), F.lit(1))),
        lambda i: F.xxhash64(F.col("__s").substr(i, F.lit(k))),
    )
    d = d.withColumn("__h", grams)
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("__h") - (window - 1), F.lit(1))),
        lambda i: F.array_min(F.slice("__h", i, window)),
    )
    return d.select("doc_id", F.array_distinct(mins).alias("fp"))


@register("l12_fingerprints", oracle=None, tags=("L12", "text-analysis"))
def l12_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L12: per-doc winnowing fingerprint summary (rows-only: xxhash64
    has no DuckDB twin). Golden property — identical normalized texts
    share identical fingerprint sets — tested in tests."""
    docs = documents_dup(spark, sf_dir)
    fp = fingerprints(docs)
    return fp.select(
        "doc_id",
        F.size("fp").alias("n_fingerprints"),
        F.array_min("fp").alias("min_fp"),
    ).orderBy("doc_id")


_L12B_ORACLE = with_documents_dup(
    f", s AS (SELECT doc_id, {norm_text_sql('text')} AS t FROM documents_dup), "
    "h AS (SELECT doc_id, list_transform("
    "range(1, GREATEST(LENGTH(t) - 7, 1) + 1), "
    "i -> " + exact.md5_prefix_int_sql("substr(t, i, 8)") + ") AS hs "
    "FROM s), "
    "m AS (SELECT doc_id, list_distinct(list_transform("
    "range(1, GREATEST(len(hs) - 3, 1) + 1), "
    "i -> list_min(list_slice(hs, i, i + 3)))) AS fp FROM h) "
    "SELECT doc_id, CAST(len(fp) AS INTEGER) AS n_fingerprints, "
    "list_min(fp) AS min_fp FROM m ORDER BY doc_id"
)


@register("l12b_fingerprints_md5", oracle=_L12B_ORACLE, tags=("L12", "text-analysis"))
def l12b_fingerprints_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L12 ORACLE-CERTIFIED winnowing: the l12 pipeline (char 8-gram
    rolling hashes, window-4 minima, distinct fingerprint set) with
    the md5 24-bit prefix as the gram hash so DuckDB replays every
    stage — hash-certifying the WINNOWING semantics (gram windows,
    min selection, set summary) that l12 runs on xxhash64 (JVM-only,
    why it is rows-only by design). Same map-only all-array shape:
    one codegen projection per doc, no explode, no shuffle before the
    final sort."""
    k, window = 8, 4
    docs = documents_dup(spark, sf_dir)
    d = docs.withColumn("__s", norm_text_col("text"))
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("__s") - (k - 1), F.lit(1))),
        lambda i: F.conv(
            F.substring(F.md5(F.col("__s").substr(i, F.lit(k))), 1, 6), 16, 10
        ).cast("long"),
    )
    d = d.withColumn("__h", grams)
    mins = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size("__h") - (window - 1), F.lit(1))),
        lambda i: F.array_min(F.slice("__h", i, window)),
    )
    return (
        d.select("doc_id", F.array_distinct(mins).alias("fp"))
        .select(
            "doc_id",
            F.size("fp").cast("int").alias("n_fingerprints"),
            F.array_min("fp").alias("min_fp"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Token chunking (UDTF — U5)
# ---------------------------------------------------------------------------

_CHUNK = 32


@register(
    "l13_chunk_udtf",
    oracle=with_documents_dup(
        ", toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents_dup WHERE doc_id % 50 = 0) "
        "SELECT doc_id, CAST(c AS INTEGER) AS chunk_id, "
        f"array_to_string(t[(c * {_CHUNK} + 1):(c * {_CHUNK} + {_CHUNK})], ' ') AS chunk "
        f"FROM toks, (SELECT UNNEST(range(0, 64)) AS c) "
        f"WHERE c * {_CHUNK} < len(t) ORDER BY doc_id, chunk_id"
    ),
    tags=("L13", "U5"),
)
def l13_chunk_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L13/U5: training-pipeline document chunking as a Python UDTF —
    each doc expands to fixed-token-budget chunks. The UDTF class is
    local (pickled by value); the oracle replays the chunking in SQL,
    so the UDTF row-expansion contract is hash-checked."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_id int, chunk string")
    class Chunker:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            toks = text.split(" ")
            for i in range(0, len(toks), _CHUNK):
                yield doc_id, i // _CHUNK, " ".join(toks[i : i + _CHUNK])

    docs = documents_dup(spark, sf_dir).where(F.col("doc_id") % 50 == 0)
    return (
        docs.select("doc_id", "text")
        .lateralJoin(Chunker(F.col("doc_id").outer(), F.col("text").outer()))
        .select(docs.doc_id, F.col("chunk_id"), F.col("chunk"))
        .orderBy("doc_id", "chunk_id")
    )


# ---------------------------------------------------------------------------
# End-to-end corpus curation (composite pipeline)
# ---------------------------------------------------------------------------

_CURATION_ORACLE = (
    "WITH documents_dup AS (SELECT doc_id, text, lang, source, n_chars FROM documents "
    "UNION ALL SELECT doc_id + 1000000, CONCAT('  ', UPPER(text), '  '), lang, source, n_chars "
    "FROM documents WHERE doc_id % 5 = 0), "
    "toks AS (SELECT *, string_split(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g'))), ' ') AS t "
    "FROM documents_dup), "
    "quality AS (SELECT * FROM toks WHERE n_chars >= 100 AND len(t) >= 20 "
    "AND CAST(len(list_distinct(t)) AS DOUBLE) / len(t) >= 0.25), "
    "deduped AS (SELECT *, ROW_NUMBER() OVER ("
    "PARTITION BY SHA256(LOWER(TRIM(REGEXP_REPLACE(text, '\\s+', ' ', 'g')))) ORDER BY doc_id) AS rn "
    "FROM quality) "
    "SELECT lang, COUNT(*) AS n_docs, "
    "CAST(SUM(len(t)) AS BIGINT) AS total_tokens, "
    "CAST(SUM(n_chars) AS BIGINT) AS total_chars "
    "FROM deduped WHERE rn = 1 GROUP BY lang ORDER BY lang"
)


@register("pipeline_corpus_curation", oracle=_CURATION_ORACLE, tags=("L1", "L7", "L10", "pipeline"))
def pipeline_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus curation, composed from the engine's
    own operators: quality filter (L7 rules) → exact dedup (L1, digest
    survivor) → per-language token budget (L10). One fused lazy plan:
    the filter pushes below the dedup window, the dedup shuffles on the
    32-byte digest, the budget agg is partial+final.

    This is the pipeline a reference user runs daily at corpus scale —
    each stage is the same function they can use à la carte."""
    from ipydataclean_spark.functions.text import norm_text_col
    from ipydataclean_spark.operators.llm import with_dedup_rank

    docs = documents_dup(spark, sf_dir)
    t = F.split(norm_text_col("text"), " ")
    staged = docs.withColumn("t", t).where(
        (F.col("n_chars") >= 100)
        & (F.size("t") >= 20)
        & (F.size(F.array_distinct("t")).cast("double") / F.size("t") >= 0.25)
    )
    # Optimization round 12 (guide §2.3 — project before the exchange):
    # the dedup window shuffles by the 32-byte digest, and the budget
    # agg above it only ever reads size(t) — but referencing the array
    # column above the window forced the FULL token array through the
    # exchange (plan-verified: `t` in the Exchange input). Reducing it
    # to a pre-shuffle n_toks scalar drops the exchange payload to
    # (doc_id, lang, n_chars, n_toks, digest); text itself was already
    # pruned below the window by Catalyst. sum(n_toks) == sum(size(t))
    # row-for-row, so the oracle is unchanged (re-proven hash-green).
    slim = staged.select("doc_id", "text", "lang", "n_chars", F.size("t").alias("n_toks"))
    deduped = with_dedup_rank(slim).where(F.col("rn") == 1)
    return (
        deduped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("long").alias("total_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("lang")
    )


def countmin_sketch(
    occurrences: DataFrame, token_col: str = "tok", depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch build: one row per token OCCURRENCE in, a
    (seed, bucket, count) cell table out — at most depth×width rows
    regardless of corpus size. Cells are plain partial-aggregable
    counts, so the build is a single map-side-combined shuffle and
    sketches from different corpus shards merge by adding cell counts
    (the property that matters at 100 TB: fixed memory, one pass,
    associative merge). Hashing is xxhash64(seed, token) — JVM-side,
    deterministic across runs and partitionings."""
    seeds = F.array(*[F.lit(i) for i in range(depth)])
    return (
        occurrences.select(F.col(token_col).alias("tok"), F.explode(seeds).alias("seed"))
        .select("seed", F.pmod(F.xxhash64("seed", "tok"), F.lit(width)).alias("bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cell_count"))
    )


def countmin_estimate(
    sketch: DataFrame, candidates: DataFrame, token_col: str = "tok", depth: int = 4, width: int = 1024
) -> DataFrame:
    """Point-query the sketch for each candidate token: hash with the
    same seeds, broadcast-join the (≤depth×width row) sketch, take the
    per-token MIN over the depth cells — the classic CMS upper-bound
    estimate (estimate ≥ true count, overshoot ≤ e·N/width w.h.p.)."""
    seeds = F.array(*[F.lit(i) for i in range(depth)])
    probes = candidates.select(F.col(token_col).alias("tok"), F.explode(seeds).alias("seed")).select(
        "tok", "seed", F.pmod(F.xxhash64("seed", "tok"), F.lit(width)).alias("bucket")
    )
    return (
        probes.join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("tok")
        .agg(F.min("cell_count").alias("cms_estimate"))
    )


@register(
    "l14_countmin_heavy_hitters",
    oracle=(
        "WITH toks AS (SELECT unnest(string_split("
        + norm_text_sql("text")
        + ", ' ')) AS tok FROM documents), "
        "f AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_count "
        "FROM toks WHERE tok <> '' GROUP BY tok) "
        "SELECT tok, exact_count, 1 AS cms_within_bound FROM f "
        "ORDER BY exact_count DESC, tok LIMIT 15"
    ),
    tags=("L14", "sketch", "text-analysis"),
)
def l14_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L14: heavy hitters with a count-min sketch. Exact top-15 tokens
    (the small ground truth) joined with their CMS estimates.

    Driver-checkable promotion (was rows-only): the CMS estimate is
    engine-specific, so the output instead carries the exact counts
    plus ``cms_within_bound`` = (exact ≤ cms ≤ exact + 2·N/width) as
    0/1, verified in-plan (N = total occurrences, a 1-row agg over
    the freq table broadcast back — VERDICT r03 #6: the old
    ``Window.partitionBy()`` form funneled the whole vocabulary
    through one WindowExec partition; the agg reuses freq's exchange,
    so still no extra corpus scan). The oracle computes the exact
    top-15 and expects 1; a sketch regression turns the driver row
    red. The tighter e·N/width bound stays pinned in
    tests/test_llm_extra.py."""
    width = 1024
    occ = (
        T(spark, sf_dir, "documents")
        .select(F.explode(tokens_col("text")).alias("tok"))
        .where(F.length("tok") > 0)
    )
    freq = occ.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_count"))
    tot = freq.agg(F.sum("exact_count").cast("double").alias("total"))
    exact_top = (
        freq.crossJoin(F.broadcast(tot))
        .orderBy(F.desc("exact_count"), F.asc("tok"))
        .limit(15)
    )
    sketch = countmin_sketch(occ, width=width)
    est = countmin_estimate(sketch, exact_top.select("tok"), width=width)
    bound_ok = (
        (F.col("cms_estimate") >= F.col("exact_count"))
        & (
            F.col("cms_estimate").cast("double")
            <= F.col("exact_count").cast("double") + 2.0 * F.col("total") / F.lit(float(width))
        )
    ).cast("int")
    return (
        exact_top.join(est, "tok")
        .select("tok", "exact_count", bound_ok.alias("cms_within_bound"))
        .orderBy(F.desc("exact_count"), F.asc("tok"))
    )


@register(
    "l15_boilerplate_ratio",
    oracle=(
        "WITH ds AS (SELECT doc_id, unnest("
        + llm.shingles_sql("text")
        + ") AS sh FROM documents), "
        "freq AS (SELECT sh, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd "
        "FROM ds GROUP BY sh) "
        "SELECT ds.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles, "
        "CAST(COUNT_IF(freq.nd >= 5) AS BIGINT) AS n_common, "
        "ROUND(CAST(COUNT_IF(freq.nd >= 5) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 8) "
        "AS boilerplate_ratio "
        "FROM ds JOIN freq ON ds.sh = freq.sh "
        "GROUP BY ds.doc_id HAVING COUNT_IF(freq.nd >= 5) > 0 "
        "ORDER BY boilerplate_ratio DESC, ds.doc_id LIMIT 50"
    ),
    tags=("L15", "L5", "L7"),
)
def l15_boilerplate_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L15: cross-document repetition score — the fraction of a doc's
    distinct 3-shingles that recur in ≥ 5 documents (the C4/Gopher-
    style boilerplate signal: headers, licenses, and template text
    score high and get filtered or deduped before training).

    Plan: ONE explode pass builds (doc_id, shingle) [distinct per doc
    by construction — shingles_col array_distincts]; shingle document-
    frequencies are a partial-agg shuffle keyed shingle; the join back
    is shingle-keyed on both sides so it reuses that clustering; the
    per-doc ratio is a second small shuffle keyed doc_id. No UDFs, no
    driver pulls — every stage is map-side combinable."""
    ds = exploded_shingles(T(spark, sf_dir, "documents"), alias="sh")
    freq = ds.groupBy("sh").agg(F.countDistinct("doc_id").alias("nd"))
    common = F.sum((F.col("nd") >= 5).cast("long"))
    return (
        ds.join(freq, "sh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            common.alias("n_common"),
            F.round(
                common.cast("double") / F.count(F.lit(1)).cast("double"), 8
            ).alias("boilerplate_ratio"),
        )
        .where(F.col("n_common") > 0)
        .orderBy(F.desc("boilerplate_ratio"), "doc_id")
        .limit(50)
    )


#: The l18 oracle, module-level so the l52 perplexity-bucket twin can
#: embed the SAME per-doc LM-score SQL as a subquery (one definition,
#: the _L35_ORACLE rule).
_L18_ORACLE = (
    "WITH toks AS (SELECT doc_id, t FROM (SELECT doc_id, "
    "unnest(string_split_regex(lower(text), '[^a-z]+')) AS t FROM documents) u "
    "WHERE t <> ''), "
    "freq AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY t), "
    "tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM freq), "
    "lp AS (SELECT t, ROUND(LN(CAST(cnt AS DOUBLE) / total), 4) AS lp "
    "FROM freq CROSS JOIN tot) "
    "SELECT toks.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
    "ROUND(" + exact.dsum_sql("lp") + " / CAST(COUNT(*) AS DOUBLE), 8) AS avg_logprob "
    "FROM toks JOIN lp ON toks.t = lp.t "
    "GROUP BY toks.doc_id ORDER BY toks.doc_id"
)


@register(
    "l18_unigram_logprob",
    oracle=_L18_ORACLE,
    tags=("L18", "L7"),
)
def l18_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L18: unigram language-model score — mean log-probability of a
    doc's tokens under the corpus unigram distribution (the CCNet-
    style LM-quality signal: gibberish and boilerplate-heavy docs
    score low and get filtered or down-weighted before training; a
    real pipeline swaps in an n-gram/KenLM table, same plan shape).

    Exactness: LN is libm, so per-token logprobs are rounded to 4 dp
    FIRST, summed decimal-exact (order-independent), then the per-doc
    mean rounds to 8 dp — cross-engine double summation order never
    touches the result. Plan: one explode pass, vocabulary-keyed freq
    agg joined back on the token key, doc-keyed final agg — all
    partial-aggregable, the corpus scan happens twice (freq + score)
    which an offline pipeline amortizes by persisting freq."""
    docs = T(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("t")
    ).where(F.col("t") != "")
    freq = toks.groupBy("t").agg(F.count(F.lit(1)).alias("cnt"))
    # corpus total: 1-row agg over the freq table broadcast back
    # (VERDICT r03 #6 — the Window.partitionBy() form funneled the
    # vocabulary through one partition; this agg reuses freq's
    # exchange, and an eager .first() pull would lose the shared plan)
    tot = freq.agg(F.sum("cnt").cast("double").alias("total"))
    lp = freq.crossJoin(F.broadcast(tot)).select(
        "t", F.round(F.log(F.col("cnt").cast("double") / F.col("total")), 4).alias("lp")
    )
    return (
        toks.join(lp, "t")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                exact.dsum("lp") / F.count(F.lit(1)).cast("double"), 8
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register("c30_dedup_keep_best", oracle=None, tags=("L2", "C16", "dedup"))
def c30_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C30: near-dup dedup keeping the BEST copy, not the first —
    the corpus-curation end move: MinHash-LSH pairs → connected
    components (cluster_pairs) → one survivor per cluster by quality
    (here: least raw length — the un-padded, un-shouting copy; a real
    pipeline plugs in l7's quality score), doc_id as the deterministic
    tie-break. Survivor choice is max_by over a struct — ONE shuffle
    keyed cluster_id on the labels table (cluster-table-sized, not
    corpus-sized). Rows-only (iterative clustering upstream); the
    golden expectation — every injected dup cluster keeps exactly its
    base doc — is pinned in tests/test_llm_extra.py."""
    from ipydataclean_spark.operators.llm import l2_minhash_lsh

    docs = documents_dup(spark, sf_dir)
    pairs = l2_minhash_lsh(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    labels = cluster_pairs(docs.select(F.col("doc_id").alias("id")), pairs, max_iter=30)
    quality = docs.select(
        F.col("doc_id").alias("id"), F.length("text").alias("raw_len")
    )
    # prefer the shortest raw text (normalized dups differ only by
    # padding/case), then lowest doc_id; negate for max_by semantics
    pref = F.struct(
        (-F.col("raw_len")).alias("neg_len"), (-F.col("id")).alias("neg_id")
    )
    return (
        labels.join(quality, "id")
        .groupBy("cluster_id")
        .agg(
            F.max_by("id", pref).alias("survivor_id"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .orderBy("cluster_id")
    )


_C30B_ORACLE = None  # built lazily below (needs llm.L2F_CTES + dirty SQL)


def _c30b_oracle() -> str:
    from ipydataclean_spark.operators import dirty

    return (
        "WITH RECURSIVE documents_dup AS (" + dirty.DOCUMENTS_DUP_SQL + ")"
        + llm.L2F_CTES
        + ", cp AS (SELECT doc_a, doc_b FROM est WHERE n_agree >= 8), "
        "edges AS (SELECT doc_a AS a, doc_b AS b FROM cp "
        "UNION SELECT doc_b, doc_a FROM cp), "
        # transitive closure: cluster = min reachable id (exact fixpoint,
        # the er1 oracle mechanism)
        "r(a, b) AS (SELECT doc_id, doc_id FROM documents_dup "
        "UNION SELECT r.a, e.b FROM r JOIN edges e ON r.b = e.a), "
        "lbl AS (SELECT a AS id, MIN(b) AS cluster_id FROM r GROUP BY a), "
        "q AS (SELECT doc_id AS id, LENGTH(text) AS raw_len FROM documents_dup), "
        "ranked AS (SELECT l.cluster_id, q.id, "
        "ROW_NUMBER() OVER (PARTITION BY l.cluster_id "
        "ORDER BY q.raw_len, q.id) AS rn, "
        "COUNT(*) OVER (PARTITION BY l.cluster_id) AS csize "
        "FROM lbl l JOIN q ON q.id = l.id) "
        "SELECT cluster_id, id AS survivor_id, CAST(csize AS BIGINT) AS cluster_size "
        "FROM ranked WHERE rn = 1 ORDER BY cluster_id"
    )


@register(
    "c30b_dedup_keep_best_md5",
    oracle=_c30b_oracle(),
    tags=("L2", "C16", "dedup"),
)
def c30b_dedup_keep_best_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C30 ORACLE-CERTIFIED: the keep-best near-dup dedup END MOVE
    with every stage replayed by DuckDB — md5 MinHash-LSH candidates
    (llm.l2f pipeline), connected components (Spark: min-label
    propagation; oracle: recursive-CTE transitive closure — the er1
    two-mechanism fixpoint proof), survivor = least raw length then
    lowest doc_id. c30 (the registered production form) keeps
    xxhash64 candidates and stays rows-only+golden; this twin hash-
    certifies the CLUSTER-THEN-CHOOSE semantics end to end, including
    singleton clusters (every doc gets a component and the survivor
    rule degenerates to identity)."""
    from ipydataclean_spark.operators.llm import l2f_minhash_lsh_md5

    docs = documents_dup(spark, sf_dir)
    pairs = l2f_minhash_lsh_md5(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    labels = cluster_pairs(docs.select(F.col("doc_id").alias("id")), pairs, max_iter=30)
    quality = docs.select(
        F.col("doc_id").alias("id"), F.length("text").alias("raw_len")
    )
    pref = F.struct(
        (-F.col("raw_len")).alias("neg_len"), (-F.col("id")).alias("neg_id")
    )
    return (
        labels.join(quality, "id")
        .groupBy("cluster_id")
        .agg(
            F.max_by("id", pref).alias("survivor_id"),
            F.count(F.lit(1)).alias("cluster_size"),
        )
        .orderBy("cluster_id")
    )


def _l2i_oracle() -> str:
    from ipydataclean_spark.operators import dirty

    return (
        "WITH RECURSIVE documents_dup AS (" + dirty.DOCUMENTS_DUP_SQL + ")"
        + llm.L2F_CTES
        + ", cp AS (SELECT doc_a, doc_b FROM est WHERE n_agree >= 8), "
        "edges AS (SELECT doc_a AS a, doc_b AS b FROM cp "
        "UNION SELECT doc_b, doc_a FROM cp), "
        "r(a, b) AS (SELECT doc_id, doc_id FROM documents_dup "
        "UNION SELECT r.a, e.b FROM r JOIN edges e ON r.b = e.a), "
        "lbl AS (SELECT a AS id, MIN(b) AS cluster_id FROM r GROUP BY a), "
        "q AS (SELECT doc_id AS id, LENGTH(text) AS raw_len FROM documents_dup), "
        "per_cluster AS (SELECT l.cluster_id, "
        "CAST(COUNT(*) AS BIGINT) AS csize, "
        "CAST(SUM(q.raw_len) AS BIGINT) AS chars_total, "
        "CAST(MIN(q.raw_len) AS BIGINT) AS survivor_chars "
        "FROM lbl l JOIN q ON q.id = l.id GROUP BY l.cluster_id) "
        "SELECT csize AS cluster_size, "
        "CAST(COUNT(*) AS BIGINT) AS n_clusters, "
        "CAST(SUM(csize) AS BIGINT) AS n_docs, "
        "CAST(SUM(chars_total) AS BIGINT) AS chars_total, "
        "CAST(SUM(chars_total - survivor_chars) AS BIGINT) AS chars_dropped "
        "FROM per_cluster GROUP BY csize ORDER BY csize"
    )


@register("l2i_dedup_savings", oracle=_l2i_oracle(), tags=("L2", "dedup"))
def l2i_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup SAVINGS REPORT — the readout a deployment inspects before
    committing to keep-one-per-cluster: per cluster size, how many
    clusters/docs exist and how many characters the keep-best rule
    (least raw length survives, the c30b semantics) would drop.
    Pure integer arithmetic (LENGTH sums), so the whole report is
    hash-certified against the recursive-CTE-closure oracle — same
    two-mechanism fixpoint proof as c30b/er1, aggregated one level
    further. Registered AFTER the round-7 window filled (extras tier):
    ROUND-8 window material by design, like the round-6 twins were
    for round 7."""
    from ipydataclean_spark.operators.llm import l2f_minhash_lsh_md5

    docs = documents_dup(spark, sf_dir)
    pairs = l2f_minhash_lsh_md5(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    labels = cluster_pairs(docs.select(F.col("doc_id").alias("id")), pairs, max_iter=30)
    q = docs.select(F.col("doc_id").alias("id"), F.length("text").alias("raw_len"))
    per_cluster = (
        labels.join(q, "id")
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).alias("csize"),
            F.sum("raw_len").alias("chars_total"),
            F.min("raw_len").alias("survivor_chars"),
        )
    )
    return (
        per_cluster.groupBy(F.col("csize").alias("cluster_size"))
        .agg(
            F.count(F.lit(1)).alias("n_clusters"),
            F.sum("csize").alias("n_docs"),
            F.sum("chars_total").alias("chars_total"),
            F.sum(F.col("chars_total") - F.col("survivor_chars")).alias(
                "chars_dropped"
            ),
        )
        .orderBy("cluster_size")
    )


#: Sweep points sit in the fixture's ACTUAL pair-similarity regime
#: (verified candidates all land in [0.85, 1.0] — the injected dups
#: are near-exact after normalization; a 0.5–0.8 sweep returned four
#: identical rows, the vacuity the l2h lesson warns about). 0.8 keeps
#: everything (the "all candidates" floor), 0.99 keeps only the
#: near-verbatim copies.
_L2J_TAUS = (0.8, 0.9, 0.97, 0.99)


def banded_verified_pairs(docs):
    """(doc_a, doc_b, jac) — the PRODUCTION md5-banded candidate stage
    followed by the exact word-3-gram Jaccard verify, un-thresholded;
    materialized once (consumers filter and iterate over it). ONE
    Spark definition to match the shared _SIZES_COMMON_VER_CTES SQL
    segment (review r09: l54 had copy-pasted l2j's 30-line pipeline —
    a drift between the sweep and the cluster audit would silently
    de-certify the audit against the exact pipeline it judges)."""
    sigs = llm.md5_minhash_sigs(docs)
    bands = llm.md5_band_keys(sigs)
    a = bands.select(F.col("doc_id").alias("doc_a"), "b", "bh")
    b = bands.select(F.col("doc_id").alias("doc_b"), "b", "bh")
    cand = (
        a.join(b, ["b", "bh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    sh = exploded_shingles(docs, "s")
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    sha = sh.select(F.col("doc_id").alias("doc_a"), "s")
    shb = sh.select(F.col("doc_id").alias("doc_b"), "s")
    common = (
        cand.join(sha, "doc_a")
        .join(shb, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb"))
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jac"))
        .localCheckpoint(eager=True)
    )


#: Shared banded-candidate -> exact-verify SQL segment (sizes/common/
#: ver over L2F_CTES' cand+sh) — module level so the l54 cluster-
#: quality twin embeds the SAME verified-pair table as the l2j sweep
#: (one definition, the _L35_ORACLE rule).
_SIZES_COMMON_VER_CTES = (
    ", sizes AS MATERIALIZED (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh "
    "FROM sh GROUP BY doc_id), "
    "common AS MATERIALIZED (SELECT c.doc_a, c.doc_b, "
    "CAST(COUNT(*) AS BIGINT) AS n_common "
    "FROM cand c JOIN sh a ON a.doc_id = c.doc_a "
    "JOIN sh b ON b.doc_id = c.doc_b AND b.s = a.s "
    "GROUP BY c.doc_a, c.doc_b), "
    "ver AS MATERIALIZED (SELECT doc_a, doc_b, "
    "CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jac "
    "FROM common JOIN sizes sa ON sa.doc_id = doc_a "
    "JOIN sizes sb ON sb.doc_id = doc_b)"
)


def _l2j_oracle() -> str:
    from ipydataclean_spark.operators import dirty

    # one verified-candidate table, then a recursive transitive closure
    # PER threshold (DuckDB runs multiple recursive CTEs in one WITH
    # RECURSIVE); shared CTEs are MATERIALIZED per the iterative-chain
    # rule or the per-tau closures re-expand them
    per_tau = []
    for tau in _L2J_TAUS:
        t = str(tau).replace(".", "")
        per_tau.append(
            f"e{t} AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM ver "
            f"WHERE jac >= {tau} UNION SELECT doc_b, doc_a FROM ver WHERE jac >= {tau}), "
            f"r{t}(a, b) AS (SELECT doc_id, doc_id FROM documents_dup "
            f"UNION SELECT r{t}.a, e.b FROM r{t} JOIN e{t} e ON r{t}.b = e.a), "
            f"l{t} AS (SELECT a AS id, MIN(b) AS cluster_id FROM r{t} GROUP BY a), "
            f"pc{t} AS (SELECT l.cluster_id, COUNT(*) AS csize, "
            "SUM(q.raw_len) AS chars_total, MIN(q.raw_len) AS survivor_chars "
            f"FROM l{t} l JOIN q ON q.id = l.id GROUP BY l.cluster_id "
            "HAVING COUNT(*) >= 2), "
            f"rep{t} AS (SELECT CAST({tau} AS DOUBLE) AS threshold, "
            f"(SELECT CAST(COUNT(*) AS BIGINT) FROM ver WHERE jac >= {tau}) AS n_pairs, "
            "CAST(COALESCE(COUNT(*), 0) AS BIGINT) AS n_dup_clusters, "
            "CAST(COALESCE(SUM(csize), 0) AS BIGINT) AS n_dup_docs, "
            "CAST(COALESCE(SUM(csize), 0) - COALESCE(COUNT(*), 0) AS BIGINT) AS n_docs_dropped, "
            "CAST(COALESCE(SUM(chars_total - survivor_chars), 0) AS BIGINT) AS chars_dropped "
            f"FROM pc{t})"
        )
    reports = " UNION ALL ".join(f"SELECT * FROM rep{str(t).replace('.', '')}" for t in _L2J_TAUS)
    return (
        "WITH RECURSIVE documents_dup AS (" + dirty.DOCUMENTS_DUP_SQL + ")"
        + llm.L2F_CTES
        + _SIZES_COMMON_VER_CTES
        + ", q AS MATERIALIZED (SELECT doc_id AS id, LENGTH(text) AS raw_len "
        "FROM documents_dup), "
        + ", ".join(per_tau)
        + f" SELECT * FROM ({reports}) ORDER BY threshold"
    )


@register("l2j_dedup_threshold_sweep", oracle=_l2j_oracle(), tags=("L2", "dedup"))
def l2j_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup THRESHOLD SWEEP — the cost/savings projection a deployment
    reads before picking its near-dup Jaccard cutoff τ (VERDICT r07 #6,
    extending l2i's fixed-pipeline savings report to a tuning table):
    for each τ in _L2J_TAUS ({0.8, 0.9, 0.97, 0.99} — chosen inside
    the fixture's actual pair-similarity regime, see that constant),
    verified-pair count, dup cluster/doc counts, docs a keep-one rule
    would drop, and characters the keep-shortest rule would drop.

    Pipeline shape is the PRODUCTION one, not the audit one: md5
    MinHash 4x4 band candidates (the l2f generator), then exact-Jaccard
    verification computed ONLY for candidate pairs — the shingle join
    is keyed by (candidate pair, shingle), so verification cost is
    |candidates| x shingles-per-doc, never the all-pairs self-join the
    l2h audit pays for ground truth. One verified table feeds all four
    sweep points (checkpointed — four cluster_pairs runs re-read it);
    per τ the connected components run on the filtered edge subset
    (large-star/small-star, O(log n) rounds). All report columns are
    integers except τ itself; jaccard is one BIGINT/BIGINT double
    division compared to a literal — IEEE-identical cross-engine, so
    the whole sweep is hash-certified against DuckDB's recursive-CTE
    closures (the er1/c30b two-mechanism fixpoint proof, once per τ).

    At 100 TB: candidates are banded (linear), verification is
    per-candidate (bounded by the LSH hot-bucket cap), and the sweep
    amortizes signature + verification across every τ — re-running the
    pipeline per candidate threshold would pay the dominant cost four
    times to vary only the cheap final filter."""
    docs = documents_dup(spark, sf_dir)
    # one verified table feeds four sweep points and each point's
    # cluster_pairs iterates over it — banded_verified_pairs
    # materializes it once (shared with l54, review r09)
    ver = banded_verified_pairs(docs)
    ids = docs.select(F.col("doc_id").alias("id"))
    q = docs.select(
        F.col("doc_id").alias("id"), F.length("text").alias("raw_len")
    ).localCheckpoint(eager=True)

    def sweep_point(tau: float) -> DataFrame:
        edges = ver.where(F.col("jac") >= tau).select(
            F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
        )
        labels = cluster_pairs(ids, edges, max_iter=30)
        dup_clusters = (
            labels.join(q, "id")
            .groupBy("cluster_id")
            .agg(
                F.count(F.lit(1)).alias("csize"),
                F.sum("raw_len").alias("chars_total"),
                F.min("raw_len").alias("survivor_chars"),
            )
            .where(F.col("csize") >= 2)
        )
        rep = dup_clusters.agg(
            F.coalesce(F.count(F.lit(1)), F.lit(0)).cast("long").alias("n_dup_clusters"),
            F.coalesce(F.sum("csize"), F.lit(0)).cast("long").alias("n_dup_docs"),
            (F.coalesce(F.sum("csize"), F.lit(0)) - F.coalesce(F.count(F.lit(1)), F.lit(0)))
            .cast("long")
            .alias("n_docs_dropped"),
            F.coalesce(F.sum(F.col("chars_total") - F.col("survivor_chars")), F.lit(0))
            .cast("long")
            .alias("chars_dropped"),
        )
        n_pairs = edges.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
        return n_pairs.crossJoin(rep).select(
            F.lit(float(tau)).alias("threshold"),
            "n_pairs",
            "n_dup_clusters",
            "n_dup_docs",
            "n_docs_dropped",
            "chars_dropped",
        )

    # Optimization round 12 (guide §2.6 — overlap independent jobs):
    # the four τ fixpoints are independent (each clusters its own
    # filtered edge subset of the shared checkpointed `ver` table) and
    # each one's iterative jobs are far too small to fill the cluster,
    # so running them sequentially left most cores idle during every
    # convergence round. A small driver thread pool submits all four
    # concurrently; Spark's FIFO scheduler back-fills the idle
    # capacity. Outputs are unchanged (pool.map preserves τ order and
    # each point's lineage is thread-private; `ver`/`ids`/`q` are
    # immutable checkpointed inputs). Measured warm median 6.8 s →
    # 3.3 s at sf0.01 (2.1×); oracle still hash-green.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(_L2J_TAUS)) as pool:
        rows = list(pool.map(sweep_point, _L2J_TAUS))
    out = rows[0]
    for extra in rows[1:]:
        out = out.unionByName(extra)
    return out.orderBy("threshold")


def _l45_oracle() -> str:
    from ipydataclean_spark.operators import dirty

    return (
        "WITH RECURSIVE documents_dup AS (" + dirty.DOCUMENTS_DUP_SQL + ")"
        + llm.L2F_CTES
        + ", cp AS (SELECT doc_a, doc_b FROM est WHERE n_agree >= 8), "
        "edges AS (SELECT doc_a AS a, doc_b AS b FROM cp "
        "UNION SELECT doc_b, doc_a FROM cp), "
        "r(a, b) AS (SELECT doc_id, doc_id FROM documents_dup "
        "UNION SELECT r.a, e.b FROM r JOIN edges e ON r.b = e.a), "
        "lbl AS (SELECT a AS id, MIN(b) AS cluster_id FROM r GROUP BY a), "
        "q AS (SELECT doc_id AS id, source, LENGTH(text) AS raw_len "
        "FROM documents_dup), "
        "ranked AS (SELECT l.cluster_id, q.id, q.source, q.raw_len, "
        "ROW_NUMBER() OVER (PARTITION BY l.cluster_id "
        "ORDER BY q.raw_len, q.id) AS rn "
        "FROM lbl l JOIN q ON q.id = l.id) "
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(COUNT_IF(rn > 1) AS BIGINT) AS n_docs_dropped, "
        "CAST(SUM(raw_len) AS BIGINT) AS chars_total, "
        "CAST(SUM(CASE WHEN rn > 1 THEN raw_len ELSE 0 END) AS BIGINT) "
        "AS chars_dropped "
        "FROM ranked GROUP BY source ORDER BY source"
    )


@register("l45_domain_dedup_report", oracle=_l45_oracle(), tags=("L2", "dedup", "L20"))
def l45_domain_dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup savings SLICED BY SOURCE — the "which feeds are redundant"
    readout a corpus owner reads before renegotiating an ingest (l2i
    aggregates by cluster size; this attributes the SAME certified
    pipeline's drops to their origin): per source, docs, docs the
    keep-best rule would drop, chars total/dropped. Attribution rule:
    every non-survivor doc charges ITS OWN source (clusters can span
    sources; the survivor — least raw length, then lowest id, the c30
    rule — keeps its chars wherever it lives).

    Same certified stages as l2i/c30b: md5 MinHash-LSH candidates,
    star-method connected components (oracle: recursive-CTE closure),
    per-cluster ranking. Integer-only output, hash-certified.

    At 100 TB this is a free side-product of the dedup run: the
    cluster labels and survivor ranks already exist; the report adds
    ONE groupBy(source) — never run dedup twice to get per-domain
    numbers."""
    from pyspark.sql import Window

    from ipydataclean_spark.operators.llm import l2f_minhash_lsh_md5

    docs = documents_dup(spark, sf_dir)
    pairs = l2f_minhash_lsh_md5(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    )
    labels = cluster_pairs(docs.select(F.col("doc_id").alias("id")), pairs, max_iter=30)
    q = docs.select(
        F.col("doc_id").alias("id"), "source", F.length("text").alias("raw_len")
    )
    w = Window.partitionBy("cluster_id").orderBy("raw_len", "id")
    ranked = labels.join(q, "id").withColumn("rn", F.row_number().over(w))
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("rn") > 1).alias("n_docs_dropped"),
            F.sum("raw_len").cast("long").alias("chars_total"),
            F.sum(F.when(F.col("rn") > 1, F.col("raw_len")).otherwise(F.lit(0)))
            .cast("long")
            .alias("chars_dropped"),
        )
        .orderBy("source")
    )


_WINNOW_K = 3   # k-gram length (words)
_WINNOW_W = 4   # winnowing window (k-grams per window)


def gram3_hash_table(
    spark: SparkSession, sf_dir: str, min_grams: int = 1, full: bool = False
) -> DataFrame:
    """(doc_id, gs) — 60-bit BIGINT hashes of every 3-word gram over
    documents_dup, shared by l28 (winnowing) and l29 (repeated-gram
    fraction). Default slice = the dup-bearing fifth + injected copies
    (l28's pair search gains no signal from the rest and skips 5× of
    the hash work); ``full=True`` grams the whole corpus (l29 needs
    the non-dup docs or every fraction degenerates to 1.0). Hash = md5
    of the gram truncated to 15 hex chars, parsed identically in both
    engines (Spark ``conv(hex,16,10)``, DuckDB ``'0x'||hex`` cast), so
    downstream tables are value-hash verifiable.

    Carries the two HARD materialization barriers (localCheckpoint)
    after the token split and after the gram hashes. Why they are
    load-bearing: a lambda body references its input array ONCE
    syntactically, so CollapseProject happily inlines the producing
    expression — but the runtime then re-evaluates it PER ELEMENT.
    Without barrier 1 the normalize+split regex pipeline runs once per
    gram; without barrier 2 the whole gram-hash transform runs once per
    consumer window (O(len·w) hashes for winnowing). A repartition is
    NOT enough — Catalyst moves projections across exchanges,
    re-merging them (measured: 95-150 s at sf1 with exchange barriers,
    113 s with none; ~10 s end-to-end with the two checkpoints). Both
    tables are small (token arrays / long arrays for the dup slice)."""
    d = documents_dup(spark, sf_dir)
    if not full:
        d = d.where((F.col("doc_id") % 5 == 0) | (F.col("doc_id") >= 1000000))
    return gram3_over(d, min_grams=min_grams)


def gram3_over(
    docs: DataFrame, min_grams: int = 1, pre_tokenized: bool = False
) -> DataFrame:
    """gram3_hash_table's body over an arbitrary frame — extracted so
    the span-cut pipeline can gram dedup SURVIVORS. By default expects
    (doc_id, text) and normalizes+splits it; ``pre_tokenized=True``
    declares the caller already carries the NORMALIZED token array as
    ``wds`` (split once, share the frame — review r08; explicit flag,
    not column sniffing: a stale/foreign wds column must not silently
    skip normalization). In the pre-tokenized branch the caller is
    expected to have materialized the frame, so barrier 1 (which
    guards the per-gram re-evaluation of an UNmaterialized split
    expression) is skipped — no second copy of the token arrays. Same
    hash, same barrier-2 checkpoint (see gram3_hash_table's docstring
    for why it is load-bearing)."""
    if pre_tokenized:
        if "wds" not in docs.columns:
            raise ValueError("pre_tokenized=True requires a 'wds' column")
        d = docs.select("doc_id", "wds").where(F.size("wds") >= 3)
    else:
        d = (
            docs.select("doc_id", F.split(norm_text_col("text"), " ").alias("wds"))
            .where(F.size("wds") >= 3)
            .localCheckpoint(eager=True)
        )
    wd = F.col("wds")
    gs = F.transform(
        F.sequence(F.lit(1), F.size("wds") - 2),
        lambda i: F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        " ",
                        F.element_at(wd, i),
                        F.element_at(wd, i + 1),
                        F.element_at(wd, i + 2),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long"),
    )
    return (
        d.select("doc_id", gs.alias("gs"))
        .where(F.size("gs") >= min_grams)
        .localCheckpoint(eager=True)
    )


@register(
    "l28_winnowing_pairs",
    oracle=with_documents_dup(
        ", d AS (SELECT doc_id, " + norm_text_sql("text") + " AS t "
        "FROM documents_dup WHERE doc_id % 5 = 0 OR doc_id >= 1000000), "
        "tk AS (SELECT doc_id, string_split(t, ' ') AS w FROM d), "
        "g AS (SELECT doc_id, list_transform(range(1, len(w) - 1), "
        "i -> CAST(('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), "
        "1, 15)) AS BIGINT)) AS gs FROM tk WHERE len(w) >= 3), "
        "fp AS (SELECT DISTINCT doc_id, unnest(list_distinct("
        "list_transform(range(1, len(gs) - 2), j -> list_min(gs[j:j+3])))) AS f "
        "FROM g WHERE len(gs) >= 4), "
        "freq AS (SELECT f FROM fp GROUP BY f "
        "HAVING COUNT(*) >= 2 AND COUNT(*) <= 10) "
        "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
        "CAST(COUNT(*) AS BIGINT) AS n_shared "
        "FROM fp a JOIN freq USING (f) JOIN fp b USING (f) "
        "WHERE a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id HAVING COUNT(*) >= 3 "
        "ORDER BY n_shared DESC, doc_a, doc_b LIMIT 50"
    ),
    tags=("L2", "L28", "dedup", "text-analysis"),
)
def l28_winnowing_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L28: near-dup candidates via WINNOWING (Schleimer/Wilkerson/
    Aiken, SIGMOD'03 — the MOSS local fingerprinting algorithm) at
    WORD granularity: every window of w=4 consecutive 3-word-gram
    hashes contributes its minimum, so any shared verbatim run of
    ≥ k+w-1 = 6 words is GUARANTEED to share a fingerprint (a
    locality guarantee MinHash doesn't give), while only ~2/(w+1) of
    positions are kept. The third dedup modality next to MinHash-LSH
    (set overlap) and SimHash (vector distance) — winnowing catches
    verbatim EXCERPTS (quotes, licence blocks, copypasta) that
    whole-doc signatures dilute. Upgrades ``l12_fingerprints``
    (per-doc summary, rows-only char-level form) to a fully
    DuckDB-hash-verified CROSS-DOC pair detector. Word grams (one
    hash per word position) instead of char grams (one per CHAR
    position) cut the hash count ~6× — the char form measured 150 s
    at sf1 where this is ~25 s; at 100 TB swap the md5 for a rolling
    Rabin hash (the md5 is the cross-engine-oracle price, the plan is
    hash-agnostic).

    Hash = md5 of the 3-word gram, truncated to 60 bits and parsed to
    BIGINT in BOTH engines (identical integer — Spark
    ``conv(hex,16,10)``, DuckDB ``'0x'||hex`` cast), so the
    fingerprint table — not just row counts — is value-hash-verified
    and the arrays hold longs, not hex strings. Plan shape: one map
    pass builds per-doc fingerprints (array ops in codegen, no
    Python), explode+distinct keys the (doc, fp) table by
    fingerprint, a frequency filter (2..10) drops both singletons and
    boilerplate mega-buckets — the same hot-key bound LSH uses — and
    the pair join is keyed on the fingerprint with per-key fanout
    capped by that filter."""
    w = _WINNOW_W
    g = gram3_hash_table(spark, sf_dir, min_grams=w)
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("gs") - (w - 1)),
            lambda j: F.array_min(F.slice(F.col("gs"), j, w)),
        )
    )
    # fp feeds three consumers (frequency filter + both join sides),
    # but its lineage now starts at the checkpointed gram table, so
    # each branch re-runs only the cheap winnow+explode — no third
    # checkpoint needed.
    fp = g.select("doc_id", F.explode(fps).alias("f")).distinct()
    freq = (
        fp.groupBy("f").agg(F.count(F.lit(1)).alias("__df"))
        .where((F.col("__df") >= 2) & (F.col("__df") <= 10))
        .select("f")
    )
    a = fp.join(freq, "f").select("f", F.col("doc_id").alias("doc_a"))
    b = fp.select("f", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, "f")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= 3)
        .orderBy(F.desc("n_shared"), "doc_a", "doc_b")
        .limit(50)
    )


_L29_NEAR_DUP_FRAC = 0.95


@register(
    "l29_repeated_gram_fraction",
    oracle=with_documents_dup(
        ", d AS (SELECT doc_id, " + norm_text_sql("text") + " AS t "
        "FROM documents_dup), "
        "tk AS (SELECT doc_id, string_split(t, ' ') AS w FROM d), "
        "g AS (SELECT doc_id, list_transform(range(1, len(w) - 1), "
        "i -> CAST(('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), "
        "1, 15)) AS BIGINT)) AS gs FROM tk WHERE len(w) >= 3), "
        "fp AS (SELECT DISTINCT doc_id, unnest(gs) AS f FROM g), "
        "df AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS ndocs FROM fp GROUP BY f), "
        "per_doc AS (SELECT fp.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, "
        "CAST(COUNT_IF(df.ndocs >= 2) AS BIGINT) AS n_shared "
        "FROM fp JOIN df USING (f) GROUP BY fp.doc_id) "
        "SELECT doc_id, n_grams, n_shared, "
        "ROUND(CAST(n_shared AS DOUBLE) / CAST(n_grams AS DOUBLE), 8) AS shared_frac, "
        "CAST(n_shared AS DOUBLE) / CAST(n_grams AS DOUBLE) >= 0.95 AS is_near_dup "
        "FROM per_doc ORDER BY doc_id"
    ),
    tags=("L2", "L29", "dedup", "text-analysis"),
)
def l29_repeated_gram_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L29: doc-level SPAN-duplication readout — for every doc, the
    fraction of its distinct 3-word grams that also occur in at least
    one OTHER document, plus a ≥95% near-dup flag (3-word grams repeat
    across template-generated text, so the copy-discriminating
    threshold sits high; with the 50-token spans of the original
    recipe the threshold drops to the usual 0.5-0.8 — gram length and
    threshold move together). This is the document-granular readout of substring-level
    training-data dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better", ACL'22: cross-doc repeated spans —
    boilerplate, licences, templated pages — harm LMs even when
    whole-doc signatures look unique): where l28/winnowing emits the
    PAIRS sharing runs, l29 scores each DOC by how much of it is
    repeated anywhere, the quantity a curation pipeline thresholds on.

    Plan: the shared gram3_hash_table map pass (checkpoint-barriered,
    see that helper) feeds explode→distinct for the (doc, gram) table;
    gram document-frequency is one partial-agg'd groupBy; the per-doc
    rollup joins fp⋈df keyed on the gram — every shuffle is keyed on
    the gram or the doc id, no all-pairs stage exists at ANY scale
    (unlike pair-emitting dedup, the output is linear in docs). At
    100 TB the df table is the only wide intermediate; grams above the
    boilerplate mega-bucket bound can be dropped before the join-back
    exactly as l28 and LSH bound their hot keys (kept here: df feeds
    the fraction, so the filter lives in the consumer's threshold).

    Hash = the shared 60-bit md5 gram hash, bit-identical across
    engines, so fractions — not just counts — are driver-hash pinned.
    Runs over the FULL corpus (full=True), unlike l28's dup-bearing
    slice: the score only discriminates when undup'd docs are in the
    gram universe."""
    g = gram3_hash_table(spark, sf_dir, full=True)
    fp = g.select("doc_id", F.explode("gs").alias("f")).distinct()
    df_tab = fp.groupBy("f").agg(F.count(F.lit(1)).alias("ndocs"))
    per_doc = (
        fp.join(df_tab, "f")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(F.col("ndocs") >= 2).alias("n_shared"),
        )
    )
    frac = F.col("n_shared").cast("double") / F.col("n_grams").cast("double")
    return (
        per_doc.select(
            "doc_id", "n_grams", "n_shared",
            F.round(frac, 8).alias("shared_frac"),
            (frac >= _L29_NEAR_DUP_FRAC).alias("is_near_dup"),
        )
        .orderBy("doc_id")
    )


@register(
    "l43_substring_dup_spans",
    oracle=with_documents_dup(
        ", d AS (SELECT doc_id, " + norm_text_sql("text") + " AS t "
        "FROM documents_dup), "
        "tk AS (SELECT doc_id, string_split(t, ' ') AS w FROM d), "
        "g AS (SELECT doc_id, list_transform(range(1, len(w) - 1), "
        "i -> CAST(('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), "
        "1, 15)) AS BIGINT)) AS gs FROM tk WHERE len(w) >= 3), "
        "p AS (SELECT doc_id, unnest(gs) AS f, generate_subscripts(gs, 1) AS pos "
        "FROM g), "
        "shared AS (SELECT f FROM (SELECT DISTINCT doc_id, f FROM p) "
        "GROUP BY f HAVING COUNT(*) >= 2), "
        "dup AS (SELECT p.doc_id, p.pos FROM p JOIN shared USING (f)), "
        "brk AS (SELECT doc_id, pos, CASE WHEN pos - "
        "LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 3 "
        "THEN 0 ELSE 1 END AS b FROM dup), "
        "isl AS (SELECT doc_id, pos, SUM(b) OVER (PARTITION BY doc_id "
        "ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island FROM brk), "
        "spans AS (SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 2 AS e "
        "FROM isl GROUP BY doc_id, island), "
        "per_doc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans, "
        "CAST(SUM(e - s + 1) AS BIGINT) AS dup_words, "
        "CAST(MAX(e - s + 1) AS BIGINT) AS longest_span FROM spans GROUP BY doc_id), "
        "tot AS (SELECT doc_id, CAST(len(gs) + 2 AS BIGINT) AS n_words FROM g) "
        "SELECT per_doc.doc_id, n_spans, dup_words, longest_span, n_words, "
        "ROUND(CAST(dup_words AS DOUBLE) / CAST(n_words AS DOUBLE), 8) AS dup_frac "
        "FROM per_doc JOIN tot USING (doc_id) ORDER BY per_doc.doc_id"
    ),
    tags=("L2", "L43", "dedup", "text-analysis"),
)
def l43_substring_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L43: substring-level dedup SPAN EXTRACTION — the removal
    operator the l29 readout motivates (Lee et al., 'Deduplicating
    Training Data Makes Language Models Better', ACL'22: cross-doc
    repeated substrings should be CUT, not used to drop whole docs).
    For every doc, the maximal word spans covered by 3-word grams that
    also occur in at least one OTHER document: span count, duplicated
    word total, longest span, and the duplicated fraction — exactly
    the table a span-cutting pass consumes (a doc with dup_frac 1.0 is
    a verbatim copy; a doc with one 6-word span has a quoted license
    line).

    Span merge is the gap-islands pattern (w11) at word granularity:
    a duplicated gram at position p covers words [p, p+2], so two
    duplicated positions belong to one span iff they are <= 3 apart
    (touching or overlapping coverage); islands come from the
    LAG-break + running-sum window, spans from MIN/MAX per island.
    Plan shape at 100 TB: the shared gram-hash map pass feeds a
    doc-frequency agg keyed on the gram (boilerplate mega-buckets can
    be capped exactly as l28 bounds hot keys), the join-back is keyed
    on the gram, and every window is PARTITIONED BY doc — no global
    window, no pair table, output linear in docs. All span arithmetic
    is integer; dup_frac is one BIGINT/BIGINT division
    (IEEE-identical cross-engine), so the whole span table is
    hash-certified against DuckDB."""
    g = gram3_hash_table(spark, sf_dir, full=True)
    per_doc = dup_spans_over(g)
    tot = g.select("doc_id", (F.size("gs") + 2).cast("long").alias("n_words"))
    frac = F.col("dup_words").cast("double") / F.col("n_words").cast("double")
    return (
        per_doc.join(tot, "doc_id")
        .select(
            "doc_id", "n_spans", "dup_words", "longest_span", "n_words",
            F.round(frac, 8).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


def dup_spans_over(g: DataFrame) -> DataFrame:
    """(doc_id, n_spans, dup_words, longest_span) over a (doc_id, gs)
    gram-hash table — the l43 body, extracted so the span-cut curation
    pipeline can run the SAME span extraction over dedup SURVIVORS
    instead of the raw fixture (cutting spans before whole-doc dedup
    would empty BOTH copies of a verbatim pair; the pipeline orders
    dedup first)."""
    from pyspark.sql import Window

    p = g.select(
        "doc_id", F.posexplode("gs").alias("pos0", "f")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "f")
    shared = (
        p.select("doc_id", "f")
        .distinct()
        .groupBy("f")
        .agg(F.count(F.lit(1)).alias("ndocs"))
        .where(F.col("ndocs") >= 2)
        .select("f")
    )
    dup = p.join(shared, "f").select("doc_id", "pos")
    w = Window.partitionBy("doc_id").orderBy("pos")
    brk = F.when(F.col("pos") - F.lag("pos").over(w) <= 3, F.lit(0)).otherwise(F.lit(1))
    isl = dup.withColumn("b", brk).withColumn(
        "island", F.sum("b").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    spans = isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("s"), (F.max("pos") + 2).alias("e")
    )
    span_len = F.col("e") - F.col("s") + 1
    return spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum(span_len).cast("long").alias("dup_words"),
        F.max(span_len).cast("long").alias("longest_span"),
    )


_SPAN_DROP_FRAC = 0.95  #: survivors still ≥95% duplicated get dropped whole


def _pipeline_span_oracle() -> str:
    return with_documents_dup(
        ", keyed AS (SELECT doc_id, text, ROW_NUMBER() OVER "
        f"(PARTITION BY SHA256({norm_text_sql('text')}) ORDER BY doc_id) AS rn "
        "FROM documents_dup), "
        "surv AS MATERIALIZED (SELECT doc_id, text FROM keyed WHERE rn = 1), "
        "d AS (SELECT doc_id, " + norm_text_sql("text") + " AS t FROM surv), "
        "tk AS MATERIALIZED (SELECT doc_id, string_split(t, ' ') AS w FROM d), "
        "g AS MATERIALIZED (SELECT doc_id, list_transform(range(1, len(w) - 1), "
        "i -> CAST(('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), "
        "1, 15)) AS BIGINT)) AS gs FROM tk WHERE len(w) >= 3), "
        "p AS (SELECT doc_id, unnest(gs) AS f, generate_subscripts(gs, 1) AS pos "
        "FROM g), "
        "shared AS (SELECT f FROM (SELECT DISTINCT doc_id, f FROM p) "
        "GROUP BY f HAVING COUNT(*) >= 2), "
        "dup AS (SELECT p.doc_id, p.pos FROM p JOIN shared USING (f)), "
        "brk AS (SELECT doc_id, pos, CASE WHEN pos - "
        "LAG(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 3 "
        "THEN 0 ELSE 1 END AS b FROM dup), "
        "isl AS (SELECT doc_id, pos, SUM(b) OVER (PARTITION BY doc_id "
        "ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island FROM brk), "
        "spans AS (SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 2 AS e "
        "FROM isl GROUP BY doc_id, island), "
        "per_doc AS (SELECT doc_id, CAST(SUM(e - s + 1) AS BIGINT) AS dup_words "
        "FROM spans GROUP BY doc_id), "
        "per AS (SELECT tk.doc_id, CAST(len(tk.w) AS BIGINT) AS n_words, "
        "COALESCE(per_doc.dup_words, 0) AS dup_words "
        "FROM tk LEFT JOIN per_doc USING (doc_id)), "
        "cls AS (SELECT *, CASE WHEN n_words > 0 THEN "
        f"CAST(dup_words AS DOUBLE) / n_words >= {_SPAN_DROP_FRAC} "
        "ELSE FALSE END AS dropped FROM per) "
        "SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM documents_dup) AS n_docs_in, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM documents_dup) "
        "- (SELECT CAST(COUNT(*) AS BIGINT) FROM surv) AS n_exact_dropped, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM surv) AS n_survivors, "
        "CAST(COUNT_IF(dropped) AS BIGINT) AS n_span_dropped, "
        "CAST(COUNT_IF(NOT dropped) AS BIGINT) AS n_kept, "
        "CAST(SUM(CASE WHEN NOT dropped THEN n_words ELSE 0 END) AS BIGINT) "
        "AS kept_words_total, "
        "CAST(SUM(CASE WHEN NOT dropped THEN dup_words ELSE 0 END) AS BIGINT) "
        "AS words_cut, "
        "CAST(SUM(CASE WHEN NOT dropped THEN n_words - dup_words ELSE 0 END) "
        "AS BIGINT) AS words_retained FROM cls"
    )


@register(
    "pipeline_span_curation",
    oracle=_pipeline_span_oracle(),
    tags=("pipeline", "L1", "L43", "dedup"),
)
def pipeline_span_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END substring-curation pipeline (composes the round-8
    span extractor with L1): (1) exact whole-doc dedup — sha256 over
    normalized text, keep min doc_id (the l1 rule) — then (2) the l43
    span extraction over the SURVIVORS only, then (3) the cut policy:
    survivors still ≥95% span-duplicated are dropped whole, the rest
    keep n_words - dup_words. One integer report row a curation run
    logs: docs in/dropped/kept and words total/cut/retained.

    Stage ORDER is the correctness point (and why dup_spans_over was
    extracted): span-cutting FIRST would see each verbatim pair as
    mutual 100% spans and empty BOTH copies; dedup-first keeps one,
    and the span pass then only sees genuine cross-doc boilerplate.
    The whole report is integer arithmetic after one guarded division,
    hash-certified against the DuckDB twin that replays every stage
    (SHA256 digest partitioning included).

    At 100 TB: stage 1 shuffles on the 32-byte digest, stage 2 is the
    l43 gram-keyed shape over the (smaller) survivor set, stage 3 is a
    map — no stage is all-pairs."""
    from ipydataclean_spark.operators.llm import with_dedup_rank

    docs = documents_dup(spark, sf_dir)
    surv = with_dedup_rank(docs).where(F.col("rn") == 1).select("doc_id", "text")
    # normalize+split ONCE (review r08: tk and the gram pass each
    # re-ran the regex normalization); the checkpointed wds frame
    # feeds both the word totals and gram3_over
    swds = surv.select(
        "doc_id", F.split(norm_text_col("text"), " ").alias("wds")
    ).localCheckpoint(eager=True)
    tk = swds.select("doc_id", F.size("wds").cast("long").alias("n_words"))
    per_doc = dup_spans_over(gram3_over(swds, pre_tokenized=True)).select(
        "doc_id", "dup_words"
    )
    per = tk.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "n_words",
        F.coalesce(F.col("dup_words"), F.lit(0)).cast("long").alias("dup_words"),
    )
    dropped = F.when(
        F.col("n_words") > 0,
        F.col("dup_words").cast("double") / F.col("n_words") >= _SPAN_DROP_FRAC,
    ).otherwise(F.lit(False))
    cls = per.withColumn("dropped", dropped)
    n_in = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs_in"))
    # count from the checkpointed frame: surv itself is lazy and a
    # count over it would re-run the digest-window dedup
    n_surv = swds.agg(F.count(F.lit(1)).cast("long").alias("n_survivors"))
    keep_words = F.when(~F.col("dropped"), F.col("n_words")).otherwise(F.lit(0))
    keep_cut = F.when(~F.col("dropped"), F.col("dup_words")).otherwise(F.lit(0))
    rep = cls.agg(
        F.count_if(F.col("dropped")).alias("n_span_dropped"),
        F.count_if(~F.col("dropped")).alias("n_kept"),
        F.sum(keep_words).cast("long").alias("kept_words_total"),
        F.sum(keep_cut).cast("long").alias("words_cut"),
        F.sum(keep_words - keep_cut).cast("long").alias("words_retained"),
    )
    return n_in.crossJoin(n_surv).crossJoin(rep).select(
        "n_docs_in",
        (F.col("n_docs_in") - F.col("n_survivors")).alias("n_exact_dropped"),
        "n_survivors",
        "n_span_dropped",
        "n_kept",
        "kept_words_total",
        "words_cut",
        "words_retained",
    )


@register(
    "l32_bigram_logprob",
    oracle=(
        "WITH toks AS (SELECT doc_id, pos, t FROM (SELECT doc_id, "
        "generate_subscripts(string_split_regex(lower(text), '[^a-z]+'), 1) AS pos, "
        "unnest(string_split_regex(lower(text), '[^a-z]+')) AS t "
        "FROM documents) u WHERE t <> ''), "
        "bg AS (SELECT a.doc_id, a.t AS t1, b.t AS t2 FROM toks a "
        "JOIN toks b ON a.doc_id = b.doc_id AND b.pos = "
        "(SELECT MIN(c.pos) FROM toks c WHERE c.doc_id = a.doc_id AND c.pos > a.pos)), "
        "uni AS (SELECT t1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY t1), "
        "bfreq AS (SELECT t1, t2, CAST(COUNT(*) AS BIGINT) AS c12 FROM bg GROUP BY t1, t2), "
        "v AS (SELECT CAST(COUNT(DISTINCT t) AS DOUBLE) AS vsz FROM toks), "
        "lp AS (SELECT bfreq.t1, bfreq.t2, "
        "ROUND(LN((CAST(c12 AS DOUBLE) + 0.1) / (CAST(c1 AS DOUBLE) + 0.1 * vsz)), 4) AS lp "
        "FROM bfreq JOIN uni ON bfreq.t1 = uni.t1 CROSS JOIN v) "
        "SELECT bg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams, "
        "ROUND(" + exact.dsum_sql("lp") + " / CAST(COUNT(*) AS DOUBLE), 8) AS avg_logprob "
        "FROM bg JOIN lp ON bg.t1 = lp.t1 AND bg.t2 = lp.t2 "
        "GROUP BY bg.doc_id ORDER BY bg.doc_id"
    ),
    tags=("L18", "L32", "text-analysis"),
)
def l32_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L32: BIGRAM language-model score with add-k smoothing (k=0.1)
    — one Markov order above l18's unigram signal: p(t₂|t₁) =
    (c₁₂+k)/(c₁+k·V). Catches locally-scrambled text (real words,
    impossible transitions) that a unigram LM scores as fluent — the
    next quality rung the CCNet-style filter ladder climbs before a
    full KenLM table.

    Exactness: per-bigram logprobs round to 4 dp before the decimal
    per-doc sum (the l18 rule), so libm/summation-order differences
    never reach the 8-dp output. Plan: tokens explode once; bigrams
    come from ONE doc-keyed lead window (the oracle spells the same
    adjacency as a correlated min — DuckDB's lag over the unnest
    ordering is not guaranteed stable, the subquery is); the bigram
    and unigram frequency tables shuffle on their token keys (both
    vocab-bounded); V is a 1-row agg broadcast; the score join is
    keyed (t1, t2). All partial-aggregable, no Python."""
    from pyspark.sql import Window

    docs = T(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), "[^a-z]+")).alias("pos", "t"),
    ).where(F.col("t") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (
        toks.select(
            "doc_id", F.col("t").alias("t1"), F.lead("t").over(w).alias("t2")
        )
        .where(F.col("t2").isNotNull())
    )
    uni = bg.groupBy("t1").agg(F.count(F.lit(1)).alias("c1"))
    bfreq = bg.groupBy("t1", "t2").agg(F.count(F.lit(1)).alias("c12"))
    v = toks.agg(F.countDistinct("t").cast("double").alias("vsz"))
    lp = (
        bfreq.join(uni, "t1")
        .crossJoin(F.broadcast(v))
        .select(
            "t1", "t2",
            F.round(
                F.log(
                    (F.col("c12").cast("double") + 0.1)
                    / (F.col("c1").cast("double") + 0.1 * F.col("vsz"))
                ),
                4,
            ).alias("lp"),
        )
    )
    return (
        bg.join(lp, ["t1", "t2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                exact.dsum("lp") / F.count(F.lit(1)).cast("double"), 8
            ).alias("avg_logprob"),
        )
        .orderBy("doc_id")
    )


@register(
    "l43b_exact_dup_spans",
    oracle=None,
    tags=("L43", "audit", "exact"),
)
def l43b_exact_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L43b: l43's EXACT sibling (verdict r08 #4) — the same
    substring-dup span table computed by the Lee-et-al mechanism
    itself (sorted-suffix prefix grouping, 'Deduplicating Training
    Data...', ACL'22) instead of gram-island windows: every word
    suffix is grouped by its leading token, each group's suffixes are
    sorted and bucketed by their 3-token prefix, a suffix qualifies
    iff its prefix bucket spans >= 2 documents, and qualifying
    coverage intervals [pos, pos+2] are unioned per doc by a
    vectorized interval merge. Both passes are applyInPandas kernels
    with LOCAL closures (the worker-pickling rule), cogrouped on hash
    buckets of their key (round 13 — see the in-body note).

    This is the AUDIT tier: per-group pandas kernels are bounded by
    leading-token bucket sizes (stop-word buckets grow with the
    corpus), so it runs at audit SFs to pin the production gram-island
    path — tests assert FULL-FRAME equality with l43 on the golden
    hand corpus and on the sf0.001 fixture. The scale path remains
    l43 (shared gram-hash agg + doc-partitioned windows, output
    linear in docs). Rows-only by design: an oracle would replay
    l43's SQL, defeating the independence that makes the audit
    meaningful. (Review r09 trimmed the first cut's dead work: the
    kernel's mergesort had no effect on the order-independent
    nunique mask, and the 8-token suffix strings were only ever read
    3 tokens deep — the qualifying test needs exactly the suffix's
    3-token prefix, i.e. the length-3 case of Lee-et-al lcp >= L.)"""
    import pandas as pd

    d = documents_dup(spark, sf_dir)
    toks = (
        d.select("doc_id", F.split(norm_text_col("text"), " ").alias("wds"))
        .where(F.size("wds") >= 3)
        .localCheckpoint(eager=True)
    )
    # suffix table, carried at the 3-token prefix (the qualifying
    # test reads exactly lcp >= 3; longer carry is dead shuffle bytes)
    sfx = toks.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.size("wds") - 2),
                lambda i: F.array_join(F.slice("wds", i, 3), " "),
            )
        ).alias("pos0", "sfx"),
    ).select(
        "doc_id",
        (F.col("pos0") + 1).alias("pos"),
        "sfx",
        F.substring_index("sfx", " ", 1).alias("lead_tok"),
    )

    # Round 13: both kernels now cogroup on deterministic HASH BUCKETS
    # of their key instead of the raw key — the per-group Arrow⇄pandas
    # materialization overhead (one Python call per leading token /
    # per doc — thousands of tiny groups) dominated the 12.5 s sf0.1
    # wall. Grouping is result-neutral: mark_group's nunique mask is
    # keyed on the full 3-token prefix (sfx determines lead_tok, so a
    # bucket of several lead groups computes the identical mask), and
    # the interval merge is keyed on doc_id inside the bucket. Bucket
    # ids never reach the output. Pinned by the full-frame l43-equality
    # tests.
    n_buckets = max(64, spark.sparkContext.defaultParallelism * 4)

    def mark_group(pdf: pd.DataFrame) -> pd.DataFrame:
        # keep suffixes whose 3-token-prefix bucket spans >= 2 docs
        # (order-independent nunique mask — no sort needed, review r09)
        ndocs = pdf.groupby("sfx")["doc_id"].transform("nunique")
        return pdf.loc[ndocs >= 2, ["doc_id", "pos"]]

    covered = (
        sfx.withColumn("__b", F.pmod(F.xxhash64("lead_tok"), F.lit(n_buckets)))
        .groupBy("__b")
        .applyInPandas(mark_group, schema="doc_id long, pos long")
    )

    def merge_docs(pdf: pd.DataFrame) -> pd.DataFrame:
        # vectorized interval union over every doc in the bucket.
        # Positions ascend within a doc after the sort, and every
        # interval is [p, p+2], so ends are monotone within a doc and
        # a new span starts exactly when p jumps by > 3 (the scalar
        # loop's `s <= prev_end + 1` merge test) — same spans, same
        # aggregates as the per-doc loop this replaces.
        import numpy as np

        pdf = pdf.sort_values(["doc_id", "pos"], kind="stable")
        doc = pdf["doc_id"].to_numpy(dtype=np.int64)
        p = pdf["pos"].to_numpy(dtype=np.int64)
        brk = np.empty(len(p), dtype=bool)
        brk[0] = True
        brk[1:] = (doc[1:] != doc[:-1]) | (p[1:] > p[:-1] + 3)
        starts = p[brk]
        span_last = np.r_[np.flatnonzero(brk)[1:] - 1, len(p) - 1]
        lens = p[span_last] + 2 - starts + 1
        return (
            pd.DataFrame({"doc_id": doc[brk], "len": lens})
            .groupby("doc_id", sort=False)
            .agg(
                n_spans=("len", "size"),
                dup_words=("len", "sum"),
                longest_span=("len", "max"),
            )
            .reset_index()
        )

    per_doc = (
        covered.withColumn("__b", F.pmod(F.col("doc_id"), F.lit(n_buckets)))
        .groupBy("__b")
        .applyInPandas(
            merge_docs,
            schema="doc_id long, n_spans long, dup_words long, longest_span long",
        )
    )
    tot = toks.select("doc_id", F.size("wds").cast("long").alias("n_words"))
    frac = F.col("dup_words").cast("double") / F.col("n_words").cast("double")
    return (
        per_doc.join(tot, "doc_id")
        .select(
            "doc_id", "n_spans", "dup_words", "longest_span", "n_words",
            F.round(frac, 8).alias("dup_frac"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# L53 — containment pairs: the asymmetric dedup measure Jaccard misses
# ---------------------------------------------------------------------------

_L53_TAU = 0.9  #: containment threshold (near-subset)

#: Excerpt fixture: every doc_id % 7 == 3 also appears as a HALF-doc
#: excerpt (first ceil(n/2) normalized tokens) under doc_id + 4000000
#: — a true doc-in-doc duplicate: containment(excerpt -> source) = 1.0
#: while Jaccard ≈ 0.5 sits below every whole-doc dedup threshold.
_L53_EXC_SQL = (
    "SELECT doc_id, text FROM documents UNION ALL "
    "SELECT doc_id + 4000000 AS doc_id, "
    "array_to_string(t[1:((len(t) + 1) // 2)], ' ') AS text "
    "FROM (SELECT doc_id, string_split("
    + norm_text_sql("text")
    + ", ' ') AS t FROM documents WHERE doc_id % 7 = 3)"
)

_L53_ORACLE = (
    "WITH documents_exc AS (" + _L53_EXC_SQL + "), "
    "sh AS (SELECT doc_id, UNNEST("
    + llm.shingles_sql("text")
    + ") AS s FROM documents_exc), "
    "sizes AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY doc_id), "
    "common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, "
    "CAST(COUNT(*) AS BIGINT) AS n_common "
    "FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id "
    "GROUP BY a.doc_id, b.doc_id) "
    "SELECT doc_a, doc_b, n_common, sa.n_sh AS na, sb.n_sh AS nb, "
    "(CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)) AS jaccard, "
    "(CAST(n_common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh)) AS containment "
    "FROM common JOIN sizes sa ON sa.doc_id = doc_a "
    "JOIN sizes sb ON sb.doc_id = doc_b "
    f"WHERE CAST(n_common AS DOUBLE) / LEAST(sa.n_sh, sb.n_sh) >= {_L53_TAU} "
    "ORDER BY doc_a, doc_b"
)


def documents_exc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ half-doc excerpt of every doc_id % 7 == 3 (known
    doc-in-doc containment dups at doc_id + 4000000)."""
    docs = T(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens_col("text")
    exc = (
        docs.where(F.col("doc_id") % 7 == 3)
        .withColumn("__toks", toks)
        .select(
            (F.col("doc_id") + 4000000).alias("doc_id"),
            F.array_join(
                F.slice(
                    "__toks",
                    F.lit(1),
                    ((F.size("__toks") + F.lit(1)) / F.lit(2)).cast("int"),
                ),
                " ",
            ).alias("text"),
        )
    )
    return docs.unionByName(exc)


@register(
    "l53_containment_pairs",
    oracle=_L53_ORACLE,
    tags=("L53", "L2", "dedup", "containment"),
)
def l53_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L53: CONTAINMENT dedup pairs — Broder's asymmetric resemblance
    c(A,B) = |A∩B| / min(|A|,|B|) over word-3-gram shingle sets, the
    measure that catches doc-IN-doc duplication (excerpts, quoted
    articles, concatenated shards) which symmetric Jaccard structurally
    misses: a half-doc excerpt scores containment 1.0 but Jaccard
    ≈ 0.5, below every whole-doc threshold (both visible side by side
    in the output — the fixture injects half-doc excerpts at
    doc_id + 4000000 for every doc_id % 7 == 3).

    Exactness: n_common/na/nb are integers; jaccard and containment
    are single BIGINT-derived IEEE divisions (raw doubles, the davg
    convention).

    At 100 TB this is, like l2b, the VERIFY stage: candidates come
    from banded LSH (an excerpt shares the source's minhashes at rate
    ≈ |A|/|B| ≈ 0.5 — band at the low τ and verify containment
    exactly), so the shingle self-join here runs over the fixture /
    a sampled audit slice, never the raw corpus."""
    docs = documents_exc(spark, sf_dir)
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
    cont = F.col("n_common").cast("double") / F.least("na", "nb")
    jac = F.col("n_common").cast("double") / (
        F.col("na") + F.col("nb") - F.col("n_common")
    )
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a", "doc_b", "n_common", "na", "nb",
            jac.alias("jaccard"), cont.alias("containment"),
        )
        .where(F.col("containment") >= _L53_TAU)
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# L52 — CCNet perplexity buckets: head / middle / tail per language
# ---------------------------------------------------------------------------

_L52_ORACLE = (
    "WITH scores AS (" + _L18_ORACLE + "), "
    "lb AS (SELECT s.doc_id, s.n_tokens, s.avg_logprob, d.lang, "
    "CAST(NTILE(3) OVER (PARTITION BY d.lang "
    "ORDER BY s.avg_logprob DESC, s.doc_id) AS BIGINT) AS bucket "
    "FROM scores s JOIN documents d ON d.doc_id = s.doc_id) "
    "SELECT lang, bucket, "
    "CASE bucket WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS tier, "
    "CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(n_tokens) AS BIGINT) AS n_tokens, "
    "(" + exact.rsum12_sql("avg_logprob") + " / CAST(COUNT(*) AS DOUBLE)) "
    "AS mean_logprob, "
    "MIN(avg_logprob) AS min_logprob, MAX(avg_logprob) AS max_logprob, "
    "CAST(bucket <= 2 AS BOOLEAN) AS keep "
    "FROM lb GROUP BY lang, bucket ORDER BY lang, bucket"
)


@register(
    "l52_perplexity_buckets",
    oracle=_L52_ORACLE,
    tags=("L52", "L18", "L7", "quality", "sampling"),
)
def l52_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L52: CCNet's perplexity bucketing (Wenzek et al. 2020, public
    method) — per LANGUAGE, rank documents by LM score and cut into
    head / middle / tail tertiles; CCNet trains on head+middle and
    drops (or down-samples) the tail. The LM score is l18's certified
    per-doc mean unigram log-probability (higher = lower perplexity;
    _L18_ORACLE embedded, one definition); the report shows, per
    (lang, tier): doc and token counts, mean/min/max score, and the
    keep decision — the table that turns an LM-score COLUMN into an
    actual FILTER policy.

    Determinism: NTILE(3) over the total order (avg_logprob DESC,
    doc_id) is SQL-standard remainder-to-leading-buckets in both
    engines; scores are l18's round-8 outputs; the tier mean is
    rsum12 / count emitted as the raw double (the l49 boundary
    lesson).

    At 100 TB: the ranking is per-language (CCNet itself sorts per
    language shard); a production run replaces the exact NTILE with
    two approx-quantile thresholds per language (one pass, no sort) —
    the exact tertile here is the certified audit form, same
    truth-vs-production split as l2b/l48."""
    from pyspark.sql import Window

    scores = l18_unigram_logprob(spark, sf_dir)
    docs = T(spark, sf_dir, "documents").select("doc_id", "lang")
    w = Window.partitionBy("lang").orderBy(F.desc("avg_logprob"), "doc_id")
    lb = scores.join(docs, "doc_id").withColumn(
        "bucket", F.ntile(3).over(w).cast("long")
    )
    return (
        lb.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("n_tokens"),
            (
                exact.rsum12("avg_logprob") / F.count(F.lit(1)).cast("double")
            ).alias("mean_logprob"),
            F.min("avg_logprob").alias("min_logprob"),
            F.max("avg_logprob").alias("max_logprob"),
        )
        .select(
            "lang",
            "bucket",
            F.when(F.col("bucket") == 1, "head")
            .when(F.col("bucket") == 2, "middle")
            .otherwise("tail")
            .alias("tier"),
            "n_docs",
            "n_tokens",
            "mean_logprob",
            "min_logprob",
            "max_logprob",
            (F.col("bucket") <= 2).alias("keep"),
        )
        .orderBy("lang", "bucket")
    )


# ---------------------------------------------------------------------------
# L54 — dedup CLUSTER QUALITY: cohesion audit of the near-dup clustering
# ---------------------------------------------------------------------------

_L54_TAU = 0.9  #: cluster-formation threshold (inside the fixture regime)


def _l54_oracle() -> str:
    from ipydataclean_spark.operators import dirty

    return (
        "WITH RECURSIVE documents_dup AS (" + dirty.DOCUMENTS_DUP_SQL + ")"
        + llm.L2F_CTES
        + _SIZES_COMMON_VER_CTES
        + f", e AS MATERIALIZED (SELECT doc_a AS a, doc_b AS b FROM ver "
        f"WHERE jac >= {_L54_TAU} "
        f"UNION SELECT doc_b, doc_a FROM ver WHERE jac >= {_L54_TAU}), "
        "r(a, b) AS (SELECT doc_id, doc_id FROM documents_dup "
        "UNION SELECT r.a, e.b FROM r JOIN e ON r.b = e.a), "
        "l AS (SELECT a AS id, MIN(b) AS cluster_id FROM r GROUP BY a), "
        f"ed AS (SELECT la.cluster_id, ROUND(v.jac, 6) AS j FROM ver v "
        f"JOIN l la ON la.id = v.doc_a WHERE v.jac >= {_L54_TAU}), "
        "cs AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS size "
        "FROM l GROUP BY cluster_id HAVING COUNT(*) >= 2) "
        "SELECT cs.cluster_id, cs.size, CAST(COUNT(j) AS BIGINT) AS n_edges, "
        "CAST(cs.size * (cs.size - 1) // 2 AS BIGINT) AS possible_pairs, "
        "(CAST(COUNT(j) AS BIGINT) / CAST(cs.size * (cs.size - 1) // 2 AS BIGINT)) "
        "AS edge_density, "
        "MIN(j) AS min_jac, "
        "(" + exact.rsum12_sql("j") + " / CAST(COUNT(j) AS DOUBLE)) AS mean_jac "
        "FROM cs JOIN ed ON ed.cluster_id = cs.cluster_id "
        "GROUP BY cs.cluster_id, cs.size ORDER BY cs.cluster_id"
    )


@register(
    "l54_dedup_cluster_quality",
    oracle=_l54_oracle(),
    tags=("L54", "L2", "dedup", "audit"),
)
def l54_dedup_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L54: cohesion audit of the near-dup CLUSTERING — per dup
    cluster (size >= 2) at τ = 0.9: member count, verified-edge count
    vs possible pairs (edge_density: 1.0 = clique, low = CHAIN — the
    transitive-closure overmerge signal: a~b~c merged although a and c
    are not alike), and the min/mean verified Jaccard among members.
    This is the table that tells a deployment whether connected-
    components clustering is overmerging before it deletes documents
    (the l2h/l3m/l48 audit discipline, pointed at the clustering step
    itself).

    Pipeline: the PRODUCTION md5-certified path — md5 MinHash bands →
    candidate pairs → exact verify (the shared _SIZES_COMMON_VER_CTES
    segment, one definition with l2j) → connected components
    (cluster_pairs / the recursive-closure twin). Edges count once per
    unordered pair (doc_a < doc_b rows); jac is quantized to 6 dp
    before the DECIMAL mean (round-then-sum; identical-input ROUND at
    6 dp is boundary-safe where a raw-division 12-dp re-round is not);
    density is one BIGINT/BIGINT division; means emit raw doubles.

    At 100 TB: everything up to clustering is the certified l2f/l2j
    shape (banded, sub-quadratic); the audit aggregations key on
    cluster_id over the EDGE table — cluster-table-sized, not
    corpus-sized."""
    docs = documents_dup(spark, sf_dir)
    ver = banded_verified_pairs(docs).where(F.col("jac") >= _L54_TAU)
    ids = docs.select(F.col("doc_id").alias("id"))
    labels = cluster_pairs(
        ids, ver.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")),
        max_iter=30,
    )
    cs = (
        labels.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("size"))
        .where(F.col("size") >= 2)
    )
    ed = ver.join(
        labels.select(F.col("id").alias("doc_a"), "cluster_id"), "doc_a"
    ).select("cluster_id", F.round("jac", 6).alias("j"))
    possible = F.expr("size * (size - 1) DIV 2")
    return (
        cs.join(ed, "cluster_id")
        .groupBy("cluster_id", "size")
        .agg(
            F.count("j").alias("n_edges"),
            F.min("j").alias("min_jac"),
            (exact.rsum12("j") / F.count("j").cast("double")).alias("mean_jac"),
        )
        .select(
            "cluster_id",
            "size",
            "n_edges",
            possible.alias("possible_pairs"),
            (F.col("n_edges") / possible).alias("edge_density"),
            "min_jac",
            "mean_jac",
        )
        .orderBy("cluster_id")
    )


# ---------------------------------------------------------------------------
# L58 — bitext mining via the ratio-margin criterion (cross-lingual pairs)
# ---------------------------------------------------------------------------

#: Neighborhood size for the margin denominators (the paper uses k=4;
#: 3 keeps every language slice at sf0.001 deep enough).
_L58_K = 3

_L58_SRC_LANG = "en"
_L58_TGT_LANG = "de"

#: Ratio-margin bitext mining (Artetxe & Schwenk, ACL 2019; the
#: CCMatrix/LASER mining rule): score(x,y) = cos(x,y) divided by the
#: mean of the two directions' k-NN cosines — a hubness correction
#: that absolute-threshold cosine mining lacks. Forward matches
#: (best y per x) with a mutual-NN flag; the consumer thresholds on
#: margin.
from ipydataclean_spark.functions.vector import dot_sql, norm_sql  # noqa: E402

_L58_MEAN_SQL = (
    "CAST(SUM(CASE WHEN {rk} <= " + str(_L58_K) + " THEN "
    "CAST(ROUND(cos_sim, 12) AS DECIMAL(38,12)) END) "
    "OVER (PARTITION BY {key}) AS DOUBLE) / " + str(_L58_K)
)

_L58_ORACLE = (
    "WITH emb_lang AS (SELECT e.vec_id AS id, e.embedding AS emb, d.lang, "
    f"{norm_sql('e.embedding')} AS nrm "
    "FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id), "
    "pairs AS (SELECT s.id AS src_id, t.id AS tgt_id, "
    f"({dot_sql('s.emb', 't.emb')} / (s.nrm * t.nrm)) AS cos_sim "
    f"FROM (SELECT * FROM emb_lang WHERE lang = '{_L58_SRC_LANG}') s "
    f"CROSS JOIN (SELECT * FROM emb_lang WHERE lang = '{_L58_TGT_LANG}') t), "
    "ranked AS (SELECT *, "
    "ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY cos_sim DESC, tgt_id) AS rs, "
    "ROW_NUMBER() OVER (PARTITION BY tgt_id ORDER BY cos_sim DESC, src_id) AS rt "
    "FROM pairs), "
    "means AS (SELECT *, "
    + _L58_MEAN_SQL.format(rk="rs", key="src_id") + " AS avg_src, "
    + _L58_MEAN_SQL.format(rk="rt", key="tgt_id") + " AS avg_tgt "
    "FROM ranked) "
    "SELECT src_id, tgt_id, cos_sim, "
    "(cos_sim / ((avg_src + avg_tgt) / 2.0)) AS margin, "
    "CAST(rt = 1 AS INTEGER) AS mutual "
    "FROM means WHERE rs = 1 "
    "ORDER BY (cos_sim / ((avg_src + avg_tgt) / 2.0)) DESC, src_id"
)


@register(
    "l58_bitext_margin_mining",
    oracle=_L58_ORACLE,
    tags=("L58", "L3", "L4", "embeddings", "bitext"),
)
def l58_bitext_margin_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L58: cross-lingual bitext mining with the ratio-margin criterion
    (Artetxe & Schwenk ACL'19 — the LASER/CCMatrix rule): each en doc's
    best de candidate, scored cos/((kNN̄_src + kNN̄_tgt)/2) so hub
    vectors with uniformly high cosine don't flood the mined set;
    ``mutual`` marks the pairs where the match is each other's rank 1.

    Exactness: cosines come from the vectorized exact kernel
    (functions/knn.topk_per_row_exact), which accumulates the dot and
    norm folds in ascending-dimension order — bit-identical to the
    in-plan sequential fold and to the oracle's list_sum; the two k-NN
    means sum ROUND(cos,12) in DECIMAL(38,12) (order-independent),
    then ONE IEEE division each; margin is arithmetic over those —
    every double bit-identical cross-engine, so the margin-ordered
    output hashes. (The first cut ran the same numbers as in-plan
    fold + four 22.6M-row window exchanges: 380 s at sf1; the kernel
    form scores each side locally and shuffles only k·|side| rows.)

    Scale shape: each direction is ONE map-side kernel pass (the
    smaller side rides the closure, capped and asserted) + a
    groupBy over k rows/vector. At 100 TB the candidate sides exceed
    the cap and swap to banded sign-LSH / IVF candidate generation
    (functions/knn.py, the l3b/l3c kernels); the margin arithmetic
    and mutual join run UNCHANGED over candidates — bounded by
    k·|candidates|, never |src|·|tgt|."""
    from ipydataclean_spark.functions.knn import topk_per_row_exact

    emb = T(spark, sf_dir, "embeddings")
    docs = T(spark, sf_dir, "documents").select("doc_id", "lang")
    emb_lang = emb.join(docs, emb.vec_id == docs.doc_id).select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb"), "lang"
    )
    src = emb_lang.where(F.col("lang") == _L58_SRC_LANG).select("id", "emb")
    tgt = emb_lang.where(F.col("lang") == _L58_TGT_LANG).select("id", "emb")

    dec = F.round("cos_sim", 12).cast(exact.DEC12)
    best = F.min(F.struct("rn", "cand_id", "cos_sim")).alias("b")

    fwd = (
        topk_per_row_exact(src, tgt, _L58_K)
        .groupBy("part_id")
        .agg(best, (F.sum(dec).cast("double") / _L58_K).alias("avg_src"))
        .select(
            F.col("part_id").alias("src_id"),
            F.col("b.cand_id").alias("tgt_id"),
            F.col("b.cos_sim").alias("cos_sim"),
            "avg_src",
        )
    )
    bwd = (
        topk_per_row_exact(tgt, src, _L58_K)
        .groupBy("part_id")
        .agg(best, (F.sum(dec).cast("double") / _L58_K).alias("avg_tgt"))
        .select(
            F.col("part_id").alias("tgt_id"),
            F.col("b.cand_id").alias("best_src"),
            "avg_tgt",
        )
    )
    margin = F.col("cos_sim") / ((F.col("avg_src") + F.col("avg_tgt")) / F.lit(2.0))
    return (
        fwd.join(bwd, "tgt_id")
        .select(
            "src_id",
            "tgt_id",
            "cos_sim",
            margin.alias("margin"),
            (F.col("best_src") == F.col("src_id")).cast("int").alias("mutual"),
        )
        .orderBy(F.desc("margin"), "src_id")
    )


# ---------------------------------------------------------------------------
# D21 — kNN label-noise detector over the embeddings table
# ---------------------------------------------------------------------------

_D21_K = 5

#: Deterministic 10% audit slice — the detector's query set. The
#: l3-family convention (vec_id predicates) keeps both engines on the
#: same slice with zero sampling machinery.
_D21_QUERY_PRED = "vec_id % 10 = 0"

_D21_ORACLE = (
    f"WITH v AS (SELECT vec_id, embedding, label, {norm_sql('embedding')} AS nrm "
    "FROM embeddings), "
    "q AS (SELECT vec_id AS query_id, embedding AS q_emb, label AS own_label, "
    f"nrm AS qn FROM v WHERE {_D21_QUERY_PRED}), "
    "p AS (SELECT q.query_id, q.own_label, e.vec_id AS neighbor_id, "
    "e.label AS n_label, "
    "ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY "
    f"({dot_sql('q.q_emb', 'e.embedding')} / (q.qn * e.nrm)) DESC, e.vec_id) AS rn "
    "FROM q CROSS JOIN v e WHERE e.vec_id <> q.query_id), "
    f"top AS (SELECT * FROM p WHERE rn <= {_D21_K}), "
    "grp AS (SELECT query_id, own_label, n_label, CAST(COUNT(*) AS BIGINT) AS c "
    "FROM top GROUP BY query_id, own_label, n_label), "
    "sel AS (SELECT *, "
    "ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY c DESC, n_label) AS rn2, "
    "CAST(SUM(CASE WHEN n_label = own_label THEN c ELSE 0 END) "
    "OVER (PARTITION BY query_id) AS BIGINT) AS n_agree FROM grp) "
    "SELECT query_id AS vec_id, own_label AS label, "
    "n_label AS majority_label, n_agree, "
    "CAST(n_label <> own_label AS INTEGER) AS flagged "
    "FROM sel WHERE rn2 = 1 ORDER BY vec_id"
)


@register(
    "d21_knn_label_noise",
    oracle=_D21_ORACLE,
    tags=("D21", "L3", "embeddings", "quality"),
)
def d21_knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D21: label-noise detection by k-NN label agreement — for each
    audited vector, the majority label among its 5 nearest neighbors
    (cosine) and how many of them agree with its own label; a mismatch
    flags a likely annotation error (the model-free core of Confident
    Learning / deep-kNN label auditing: a point whose neighborhood
    votes against its label is either noise or an outlier worth
    routing to review before it trains a classifier).

    Exactness: the top-k comes from the vectorized exact kernel
    (functions/knn.topk_per_row_exact — ascending-dimension fold, so
    cosines are bit-identical to the oracle's list_sum) with (cos
    DESC, neighbor_id) tie-breaks; everything after rank is BIGINT
    counting and INT flags — no float aggregation at all, so the
    table hashes cross-engine. Majority ties break (count DESC,
    label ASC) in both engines. (The in-plan fold + 40M-row rank
    window first cut measured 334 s at sf1; the kernel scores each
    audited vector locally and shuffles only k rows per query.)

    Scale shape: the audit slice (a deterministic 10% — ``vec_id %
    10 = 0``) stays distributed; the corpus rides the kernel closure
    up to the asserted cap, past which the neighbor side swaps to
    IVF-pruned candidates (operators/ivf.py, the l3c path) and the
    vote windows run unchanged — the post-rank shuffles carry only
    (query, label, count) rows bounded by k·|audit slice|."""
    from pyspark.sql import Window

    from ipydataclean_spark.functions.knn import topk_per_row_exact

    emb = T(spark, sf_dir, "embeddings")
    q = emb.where(F.expr(_D21_QUERY_PRED)).select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("emb"),
        F.col("label").alias("own_label"),
    )
    e = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("emb"),
        F.col("label").alias("n_label"),
    )
    top = topk_per_row_exact(
        q,
        e,
        _D21_K,
        exclude_self=True,
        part_payload=(("own_label", "int"),),
        cand_payload=(("n_label", "int"),),
    ).select(F.col("part_id").alias("query_id"), "own_label", "n_label")
    grp = top.groupBy("query_id", "own_label", "n_label").agg(
        F.count(F.lit(1)).alias("c")
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("n_label"))
    wa = Window.partitionBy("query_id")
    sel = grp.select(
        "*",
        F.row_number().over(wv).alias("rn2"),
        F.sum(F.when(F.col("n_label") == F.col("own_label"), F.col("c")).otherwise(0))
        .over(wa)
        .cast("long")
        .alias("n_agree"),
    )
    return (
        sel.where(F.col("rn2") == 1)
        .select(
            F.col("query_id").alias("vec_id"),
            F.col("own_label").alias("label"),
            F.col("n_label").alias("majority_label"),
            "n_agree",
            (F.col("n_label") != F.col("own_label")).cast("int").alias("flagged"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# D22 — contradictory near-duplicates (same content, different label)
# ---------------------------------------------------------------------------

_D22_ORACLE = (
    f"WITH v AS (SELECT vec_id, embedding, label, {norm_sql('embedding')} AS nrm "
    "FROM embeddings) "
    "SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, "
    f"({dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm)) AS cos_sim, "
    "a.label AS label_a, b.label AS label_b, "
    "CAST(a.label <> b.label AS INTEGER) AS conflict "
    "FROM v a JOIN v b ON a.vec_id < b.vec_id "
    f"WHERE ({dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm)) >= {llm.SIM_TAU} "
    "ORDER BY vec_a, vec_b"
)


@register(
    "d22_neardup_label_conflict",
    oracle=_D22_ORACLE,
    tags=("D22", "L4", "D5", "embeddings", "quality"),
)
def d22_neardup_label_conflict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D22: contradictory duplicates — near-identical vectors (cosine
    >= the l4 threshold) carrying DIFFERENT labels. The dedup x
    label-quality interaction every labeled-corpus audit runs: a
    near-dup pair with conflicting labels is either annotation noise
    (route to d21-style review) or a label-leak across a train/test
    split; a pair with AGREEING labels is safe to collapse to one
    survivor plus a weight.

    Exactness: pair cosines come from the vectorized exact kernel in
    threshold mode (min_cos + only_greater — the a.vec_id < b.vec_id
    self-join dedup convention); the kernel's ascending-dimension fold
    keeps every double bit-identical to the oracle's list_sum, and
    everything else is INT flags.

    Scale shape: one map-side kernel pass (corpus rides the closure up
    to the asserted cap); output is bounded by the MATCH set, never
    the pair space. At 100 TB the pair generation swaps to the banded
    projection LSH (l4b) and the label-conflict projection runs
    unchanged over candidates."""
    from ipydataclean_spark.functions.knn import topk_per_row_exact

    emb = T(spark, sf_dir, "embeddings")
    side = emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").alias("emb"),
        F.col("label"),
    )
    pairs = topk_per_row_exact(
        side.select("id", "emb", F.col("label").alias("label_a")),
        side.select("id", "emb", F.col("label").alias("label_b")),
        None,
        min_cos=llm.SIM_TAU,
        only_greater=True,
        part_payload=(("label_a", "int"),),
        cand_payload=(("label_b", "int"),),
    )
    return pairs.select(
        F.col("part_id").alias("vec_a"),
        F.col("cand_id").alias("vec_b"),
        "cos_sim",
        "label_a",
        "label_b",
        (F.col("label_a") != F.col("label_b")).cast("int").alias("conflict"),
    ).orderBy("vec_a", "vec_b")


# ---------------------------------------------------------------------------
# D23 — embedding-space outliers (kNN-distance score)
# ---------------------------------------------------------------------------

_D23_K = 5
_D23_TOPN = 50

def knn_mean_table(
    side: DataFrame, k: int, part_payload: tuple[tuple[str, str], ...] = ()
) -> DataFrame:
    """(part_id [, payloads], knn_mean_cos): mean ROUND12-decimal
    cosine to the k nearest neighbors (self excluded) over a
    (id, emb [, payload]) frame — the d23 score, shared with the
    embedding-curation pipeline so one definition carries the
    certified arithmetic (review r09c). Auto-dispatches to the
    blocked exact kernel past EXACT_CAND_CAP (round 10): per-block
    top-k union + global re-rank is exactly the single-pass top-k,
    so the score stays certified at any corpus size."""
    from ipydataclean_spark.functions.knn import topk_per_row_exact_auto

    top = topk_per_row_exact_auto(
        side, side.select("id", "emb"), k,
        exclude_self=True, part_payload=part_payload,
    )
    mean_cos = F.sum(F.round("cos_sim", 12).cast(exact.DEC12)).cast("double") / k
    keys = ["part_id"] + [c for c, _ in part_payload]
    return top.groupBy(*keys).agg(mean_cos.alias("knn_mean_cos"))


_D23_ORACLE = (
    f"WITH v AS (SELECT vec_id, embedding, label, {norm_sql('embedding')} AS nrm "
    "FROM embeddings), "
    "p AS (SELECT q.vec_id, q.label, "
    f"({dot_sql('q.embedding', 'e.embedding')} / (q.nrm * e.nrm)) AS cos_sim, "
    "ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
    f"({dot_sql('q.embedding', 'e.embedding')} / (q.nrm * e.nrm)) DESC, e.vec_id) AS rn "
    "FROM v q CROSS JOIN v e WHERE e.vec_id <> q.vec_id), "
    "m AS (SELECT vec_id, label, "
    "CAST(SUM(CAST(ROUND(cos_sim, 12) AS DECIMAL(38,12))) AS DOUBLE) "
    f"/ {_D23_K} AS knn_mean_cos "
    f"FROM p WHERE rn <= {_D23_K} GROUP BY vec_id, label) "
    "SELECT vec_id, label, knn_mean_cos, "
    "(1.0 - knn_mean_cos) AS outlier_score "
    "FROM m ORDER BY (1.0 - knn_mean_cos) DESC, vec_id "
    f"LIMIT {_D23_TOPN}"
)


@register(
    "d23_embedding_outliers",
    oracle=_D23_ORACLE,
    tags=("D23", "D3", "L3", "embeddings", "quality"),
)
def d23_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D23: embedding-space outlier detection — 1 minus the mean cosine
    to the 5 nearest neighbors, top-N ranked (the kNN-distance score of
    classic outlier detection, the model-free cousin of LOF): a vector
    far from everything is a decode error, an off-distribution sample,
    or a novelty worth routing to review — the embedding-native
    complement of the value-space d3 family.

    Exactness: cosines from the vectorized exact kernel (bit-identical
    fold order); the k-NN mean sums ROUND(cos,12) in DECIMAL(38,12)
    then ONE IEEE division; the score is 1.0 minus that — every double
    identical cross-engine, so the top-N order and hash match.

    Scale shape: one kernel pass (corpus in the closure up to the
    asserted cap, part side spread across cores) emitting k rows per
    vector; the mean is a vec-keyed agg over 5·n rows and the top-N a
    single bounded sort. At 100 TB the neighbor side swaps to IVF
    candidates (l3c) and the score math runs unchanged."""
    emb = T(spark, sf_dir, "embeddings")
    side = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb"), "label"
    )
    return (
        knn_mean_table(side, _D23_K, part_payload=(("label", "int"),))
        .select(F.col("part_id").alias("vec_id"), "label", "knn_mean_cos")
        .select(
            "vec_id",
            "label",
            "knn_mean_cos",
            (F.lit(1.0) - F.col("knn_mean_cos")).alias("outlier_score"),
        )
        .orderBy(F.desc("outlier_score"), "vec_id")
        .limit(_D23_TOPN)
    )


# ---------------------------------------------------------------------------
# L64 — leakage-free train/test split (cluster-aware hash split)
# ---------------------------------------------------------------------------

_L64_TEST_FRAC = 0.2
_L64_THRESHOLD = int(_L64_TEST_FRAC * (1 << 24))

def tau_pair_labels(spark: SparkSession, sf_dir: str):
    """(pairs(a,b), labels(id, cluster_id)) over the embeddings
    cosine-τ graph — the Spark half of _L64_LABEL_CTES, shared by l64
    and d24 so the audit always certifies the exact split l64 ships
    (review r09c: the SQL side was single-sourced; the Spark side must
    be too). The kernel handoff is EXECUTABLE (round 10, VERDICT r09
    #5): a single kernel pass below EXACT_CAND_CAP, the blocked exact
    kernel beyond — bit-identical either way, so both consumers keep
    certified semantics at any corpus size (τ=0.45 is below LSH
    selectivity; see topk_per_row_exact_blocked's docstring)."""
    from ipydataclean_spark.functions.knn import topk_per_row_exact_auto

    emb = T(spark, sf_dir, "embeddings")
    side = emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("emb"))
    pairs = (
        topk_per_row_exact_auto(side, side, None, min_cos=llm.SIM_TAU, only_greater=True)
        .select(F.col("part_id").alias("a"), F.col("cand_id").alias("b"))
        # eager checkpoint: the kernel pass is the expensive stage and
        # BOTH consumers (the clustering rounds and d24's audit join)
        # would otherwise re-run it from scratch
        .localCheckpoint(eager=True)
    )
    return pairs, cluster_pairs(side.select("id"), pairs)


#: shared by l64's oracle and d24's (review-style single-sourcing):
#: τ-pairs over embeddings + recursive-closure cluster labels
_L64_LABEL_CTES = (
    "WITH RECURSIVE "
    f"v AS (SELECT vec_id, embedding, {norm_sql('embedding')} AS nrm "
    "FROM embeddings), "
    "pairs AS (SELECT a.vec_id AS ka, b.vec_id AS kb "
    "FROM v a JOIN v b ON a.vec_id < b.vec_id "
    f"WHERE ({dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm)) "
    f">= {llm.SIM_TAU}), "
    "edges AS (SELECT ka AS a, kb AS b FROM pairs "
    "UNION SELECT kb, ka FROM pairs), "
    "r(a, b) AS (SELECT vec_id, vec_id FROM v "
    "UNION SELECT r.a, e.b FROM r JOIN edges e ON r.b = e.a), "
    "lbl AS (SELECT a AS vec_id, MIN(b) AS cluster_id FROM r GROUP BY a)"
)

_L64_ORACLE = (
    _L64_LABEL_CTES + ", "
    "sized AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members "
    "FROM lbl GROUP BY cluster_id) "
    "SELECT l.vec_id, l.cluster_id, s.n_members, "
    "CASE WHEN "
    + exact.md5_prefix_int_sql("'l64:' || CAST(l.cluster_id AS VARCHAR)")
    + f" < {_L64_THRESHOLD} THEN 'test' ELSE 'train' END AS split "
    "FROM lbl l JOIN sized s ON s.cluster_id = l.cluster_id "
    "ORDER BY l.vec_id"
)


@register(
    "l64_leakage_free_split",
    oracle=_L64_ORACLE,
    tags=("L64", "L2", "L4", "C25", "sampling", "dedup"),
)
def l64_leakage_free_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L64: leakage-free train/test split — hash-split by NEAR-DUP
    CLUSTER, not by document: every vector joins the component of its
    cosine-τ neighbors first, then the whole cluster lands on one side
    of an md5 coin on the cluster id. The published "dedup before you
    split" rule (GPT-3 App. C / Lee et al. ACL'22): a doc-level hash
    split (c25) puts near-identical members on both sides and inflates
    eval scores; by construction this split has ZERO τ-pairs crossing
    the boundary (pinned in pytest, alongside the naive split's
    nonzero crossing count on the same fixture).

    Correctness proof of the iterative stage (the er1 pattern): Spark
    clusters with alternating large-star/small-star over the kernel's
    τ-pairs, while the oracle computes a RECURSIVE-CTE transitive
    closure — two different fixpoint mechanisms whose value hash must
    agree, and the coin is the ONE shared md5 definition.

    Scale shape: pair generation is the kernel pass (swap to l4b
    banding past the cap); star rounds shuffle only the contracting
    edge table (O(log n) rounds); the split is a map-side expression
    on the label table."""
    pairs, lbl = tau_pair_labels(spark, sf_dir)
    sized = lbl.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_members"))
    coin = exact.md5_prefix_int(
        F.concat(F.lit("l64:"), F.col("cluster_id").cast("string"))
    )
    return (
        lbl.join(sized, "cluster_id")
        .select(
            F.col("id").alias("vec_id"),
            "cluster_id",
            "n_members",
            F.when(coin < _L64_THRESHOLD, F.lit("test"))
            .otherwise(F.lit("train"))
            .alias("split"),
        )
        .orderBy("vec_id")
    )


# ---------------------------------------------------------------------------
# PIPELINE — embedding-side curation: outliers → dedup → balance → split
# ---------------------------------------------------------------------------

_PEC_K = 5
_PEC_OUT_DIV = 100.0  #: drop the top ceil(n/100) outliers (1%)
#: same 20% test fraction as l64 — one derivation, not a re-typed copy
_PEC_TEST_THRESHOLD = _L64_THRESHOLD

def _pec_oracle() -> str:
    cos_qe = f"({dot_sql('q.embedding', 'e.embedding')} / (q.nrm * e.nrm))"
    cos_ab = f"({dot_sql('a.embedding', 'b.embedding')} / (a.nrm * b.nrm))"
    cos_sc = f"({dot_sql('s.embedding', 'cent.c_emb')} / (s.nrm * cent.cnrm))"
    return (
        f"WITH v AS (SELECT vec_id, embedding, label, {norm_sql('embedding')} AS nrm "
        "FROM embeddings), "
        "p AS (SELECT q.vec_id, " + cos_qe + " AS cos_sim, "
        "ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY "
        + cos_qe + " DESC, e.vec_id) AS rn "
        "FROM v q CROSS JOIN v e WHERE e.vec_id <> q.vec_id), "
        "m AS (SELECT vec_id, "
        "CAST(SUM(CAST(ROUND(cos_sim, 12) AS DECIMAL(38,12))) AS DOUBLE) "
        f"/ {_PEC_K} AS knn_mean_cos FROM p WHERE rn <= {_PEC_K} GROUP BY vec_id), "
        "cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v), "
        "orank AS (SELECT vec_id, "
        "ROW_NUMBER() OVER (ORDER BY knn_mean_cos ASC, vec_id) AS r FROM m), "
        "surv1 AS (SELECT v.* FROM v JOIN orank o ON o.vec_id = v.vec_id "
        f"CROSS JOIN cnt WHERE o.r > CAST(CEIL(n / {_PEC_OUT_DIV}) AS BIGINT)), "
        "dup AS (SELECT DISTINCT b.vec_id AS kb FROM surv1 a JOIN surv1 b "
        f"ON a.vec_id < b.vec_id WHERE {cos_ab} >= {llm.SIM_TAU}), "
        "surv2 AS (SELECT * FROM surv1 "
        "WHERE vec_id NOT IN (SELECT kb FROM dup)), "
        "cent AS (SELECT vec_id AS cell, embedding AS c_emb, "
        f"{norm_sql('embedding')} AS cnrm FROM embeddings WHERE vec_id < 8), "
        "scored AS (SELECT s.vec_id, s.label, cent.cell, "
        "ROW_NUMBER() OVER (PARTITION BY s.vec_id ORDER BY "
        + cos_sc + " DESC, cent.cell) AS crn "
        "FROM surv2 s CROSS JOIN cent), "
        "asg AS (SELECT vec_id, label, CAST(cell AS BIGINT) AS cell "
        "FROM scored WHERE crn = 1), "
        "sizes AS (SELECT cell, CAST(COUNT(*) AS BIGINT) AS n_cell "
        "FROM asg GROUP BY cell), "
        "quota AS (SELECT MIN(n_cell) AS q FROM sizes), "
        "sampled AS (SELECT vec_id, label FROM (SELECT a.*, "
        "ROW_NUMBER() OVER (PARTITION BY cell ORDER BY "
        + exact.md5_prefix_int_sql("'pec:' || CAST(a.vec_id AS VARCHAR)")
        + ", a.vec_id) AS kr FROM asg a) CROSS JOIN quota WHERE kr <= q), "
        "sp AS (SELECT vec_id, label, CASE WHEN "
        + exact.md5_prefix_int_sql("'pec:s:' || CAST(vec_id AS VARCHAR)")
        + f" < {_PEC_TEST_THRESHOLD} THEN 'test' ELSE 'train' END AS split "
        "FROM sampled), "
        "raw AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_raw FROM v GROUP BY label), "
        "s1 AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_after_outlier FROM surv1 GROUP BY label), "
        "s2 AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_after_dedup FROM surv2 GROUP BY label), "
        "s3 AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_sampled, "
        "CAST(COUNT_IF(split = 'train') AS BIGINT) AS n_train, "
        "CAST(COUNT_IF(split = 'test') AS BIGINT) AS n_test FROM sp GROUP BY label) "
        "SELECT raw.label, n_raw, "
        "COALESCE(n_after_outlier, 0) AS n_after_outlier, "
        "COALESCE(n_after_dedup, 0) AS n_after_dedup, "
        "COALESCE(n_sampled, 0) AS n_sampled, "
        "COALESCE(n_train, 0) AS n_train, COALESCE(n_test, 0) AS n_test "
        "FROM raw LEFT JOIN s1 ON s1.label = raw.label "
        "LEFT JOIN s2 ON s2.label = raw.label "
        "LEFT JOIN s3 ON s3.label = raw.label "
        "ORDER BY raw.label"
    )


@register(
    "pipeline_embedding_curation",
    oracle=_pec_oracle(),
    tags=("D23", "L4", "L60", "L64", "pipeline", "embeddings"),
)
def pipeline_embedding_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-side curation COMPOSITE — the four round-9 embedding
    operators in deployment order, hash-checked end to end: drop the
    top-1% kNN-distance outliers (d23's score, rank cut so the stage
    is non-vacuous at every SF) → cosine-τ near-dup dedup keeping the
    lowest id (l4c's rule) → cluster-balanced sample (l60's per-cell
    md5 quota over the seed-centroid assignment) → hash split
    (singleton clusters post-dedup, so the per-vector coin IS the
    leakage-free l64 split). Readout: the per-label stage-attrition
    funnel (raw → outlier cut → dedup → sampled → train/test), the
    table a labeled-corpus release publishes.

    Every stage reuses the certified operator's own arithmetic: the
    vectorized exact kernel for both pair passes, ROUND12-decimal kNN
    means, the l3h argmax, and the ONE shared md5 coin ('pec' salts).

    At 100 TB: the global outlier rank becomes an approx-quantile
    threshold (the l52 note); both kernel passes auto-dispatch to the
    blocked exact kernel past EXACT_CAND_CAP (round 10 — rehearsed
    end-to-end at sf10/200k vectors, BENCH.md), keeping certified
    semantics instead of switching engines; everything else is
    map-side or bounded by cells/labels."""
    from ipydataclean_spark.functions.knn import topk_per_row_exact_auto
    from ipydataclean_spark.operators.ivf import quota_sample, seed_assign_cells
    from pyspark.sql import Window

    emb = T(spark, sf_dir, "embeddings")
    side = emb.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("emb"), "label"
    )

    # stage 1: outlier rank cut (d23's score via the shared builder)
    means = knn_mean_table(side.select("id", "emb"), _PEC_K)
    cnt = means.agg(F.count(F.lit(1)).cast("long").alias("n"))
    orank = means.withColumn(
        "r", F.row_number().over(Window.orderBy(F.asc("knn_mean_cos"), F.asc("part_id")))
    )
    surv1 = (
        side.join(orank, side.id == orank.part_id)
        .crossJoin(F.broadcast(cnt))
        .where(F.col("r") > F.ceil(F.col("n") / F.lit(_PEC_OUT_DIV)).cast("long"))
        .select("id", "emb", "label")
        .localCheckpoint(eager=True)
    )

    # stage 2: cosine-τ dedup, keep lowest id (the l4c rule)
    dup = (
        topk_per_row_exact_auto(
            surv1.select("id", "emb"), surv1.select("id", "emb"), None,
            min_cos=llm.SIM_TAU, only_greater=True,
        )
        .select(F.col("cand_id").alias("id"))
        .distinct()
    )
    surv2 = surv1.join(dup, "id", "left_anti").localCheckpoint(eager=True)

    # stage 3: balanced sample via the shared l60 builders
    cent = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_emb")
    )
    asg = seed_assign_cells(surv2, cent, "id", "emb", keep=("label",))
    sampled = quota_sample(asg, "id", "pec:").select("id", "label")

    # stage 4: hash split (post-dedup clusters are singletons)
    sp_coin = exact.md5_prefix_int(F.concat(F.lit("pec:s:"), F.col("id").cast("string")))
    sp = sampled.withColumn(
        "split",
        F.when(sp_coin < _PEC_TEST_THRESHOLD, F.lit("test")).otherwise(F.lit("train")),
    )

    raw = side.groupBy("label").agg(F.count(F.lit(1)).alias("n_raw"))
    s1 = surv1.groupBy("label").agg(F.count(F.lit(1)).alias("n_after_outlier"))
    s2 = surv2.groupBy("label").agg(F.count(F.lit(1)).alias("n_after_dedup"))
    s3 = sp.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.count_if(F.col("split") == "train").alias("n_train"),
        F.count_if(F.col("split") == "test").alias("n_test"),
    )
    return (
        raw.join(s1, "label", "left")
        .join(s2, "label", "left")
        .join(s3, "label", "left")
        .na.fill({"n_after_outlier": 0, "n_after_dedup": 0, "n_sampled": 0,
                  "n_train": 0, "n_test": 0})
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# D24 — split-leakage audit (naive doc coin vs l64's cluster coin)
# ---------------------------------------------------------------------------

_D24_ORACLE = (
    _L64_LABEL_CTES + ", "
    "asg AS (SELECT l.vec_id, "
    "CAST(("
    + exact.md5_prefix_int_sql("'l64:' || CAST(l.vec_id AS VARCHAR)")
    + f" < {_L64_THRESHOLD}) AS INTEGER) AS naive_test, "
    "CAST(("
    + exact.md5_prefix_int_sql("'l64:' || CAST(l.cluster_id AS VARCHAR)")
    + f" < {_L64_THRESHOLD}) AS INTEGER) AS cluster_test FROM lbl l), "
    "audit AS (SELECT p.ka, p.kb, "
    "a.naive_test AS na, b.naive_test AS nb, "
    "a.cluster_test AS ca, b.cluster_test AS cb "
    "FROM pairs p JOIN asg a ON a.vec_id = p.ka "
    "JOIN asg b ON b.vec_id = p.kb) "
    "SELECT method, n_pairs, n_crossing, "
    "(CAST(n_crossing AS DOUBLE) / n_pairs) AS crossing_frac FROM ("
    "SELECT 'cluster_hash' AS method, CAST(COUNT(*) AS BIGINT) AS n_pairs, "
    "CAST(COUNT_IF(ca <> cb) AS BIGINT) AS n_crossing FROM audit "
    "UNION ALL "
    "SELECT 'doc_hash' AS method, CAST(COUNT(*) AS BIGINT) AS n_pairs, "
    "CAST(COUNT_IF(na <> nb) AS BIGINT) AS n_crossing FROM audit"
    ") ORDER BY method"
)


@register(
    "d24_split_leakage",
    oracle=_D24_ORACLE,
    tags=("D24", "L64", "L4", "embeddings", "quality"),
)
def d24_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D24: split-leakage audit — for the SAME cosine-τ near-dup pair
    set, how many pairs straddle the train/test boundary under (a) the
    naive per-document hash split (c25's shape) and (b) l64's
    cluster-aware split. One certified two-row table that states the
    leakage problem AND its fix with numbers: doc_hash crosses pairs
    (inflating every eval the split feeds), cluster_hash crosses ZERO
    by construction. Run it before trusting any held-out metric on a
    corpus that was not dedup-split (the GPT-3 App. C lesson, audited
    rather than assumed).

    Reuses l64's machinery end to end: the kernel τ-pairs, the star
    components, the one shared md5 coin with l64's own salt/threshold
    — so the audit certifies the exact split l64 ships.

    Scale shape: pair generation as in l64 (kernel below the cap,
    banding beyond); the audit itself is two broadcast-sized hash
    joins from the pair table to the label table and ONE aggregation."""
    pairs, lbl = tau_pair_labels(spark, sf_dir)
    pairs = pairs.select(F.col("a").alias("ka"), F.col("b").alias("kb"))
    naive = exact.md5_prefix_int(F.concat(F.lit("l64:"), F.col("id").cast("string")))
    clus = exact.md5_prefix_int(F.concat(F.lit("l64:"), F.col("cluster_id").cast("string")))
    asg = lbl.select(
        F.col("id").alias("vec_id"),
        (naive < _L64_THRESHOLD).cast("int").alias("naive_test"),
        (clus < _L64_THRESHOLD).cast("int").alias("cluster_test"),
    )
    a = asg.select(
        F.col("vec_id").alias("ka"),
        F.col("naive_test").alias("na"),
        F.col("cluster_test").alias("ca"),
    )
    b = asg.select(
        F.col("vec_id").alias("kb"),
        F.col("naive_test").alias("nb"),
        F.col("cluster_test").alias("cb"),
    )
    # ONE aggregation over the audit lineage (the kernel pair pass is
    # the expensive stage — a per-method agg would run it twice), then
    # a two-row unpivot, mirroring the oracle's single-audit shape
    totals = pairs.join(a, "ka").join(b, "kb").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.count_if(F.col("ca") != F.col("cb")).alias("cross_cluster"),
        F.count_if(F.col("na") != F.col("nb")).alias("cross_doc"),
    )
    return (
        totals.select(
            F.expr(
                "stack(2, 'cluster_hash', cross_cluster, 'doc_hash', cross_doc) "
                "AS (method, n_crossing)"
            ),
            "n_pairs",
        )
        .select(
            "method",
            "n_pairs",
            "n_crossing",
            (F.col("n_crossing").cast("double") / F.col("n_pairs")).alias(
                "crossing_frac"
            ),
        )
        .orderBy("method")
    )
