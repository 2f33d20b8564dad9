"""Ranked text retrieval + semi-structured (VARIANT) ops.

l8_keyword_search (llm.py) is boolean match + naive tf; real corpus
curation ranks. l8b implements BM25-style ranking with a *rational*
idf — (N − df + 0.5)/(df + 0.5), no log — so every per-term score is
a chain of identical IEEE ops in Spark and DuckDB and the result is
hash-checkable (log/libm results differ in the last ulp between
engines; a rational idf preserves the same ordering for ranking).

f_variant exercises Spark 4.x VARIANT: parse once into the binary
semi-structured encoding, then typed path extraction — the scale
replacement for repeated get_json_object string re-parsing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.functions.vector import cosine_sim_sql
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register

QUERY_TERMS = ("model", "data", "learning")

_TOKEN_SPLIT = "[^a-z]+"


@register(
    "l8b_bm25_search",
    oracle=(
        "WITH toks AS (SELECT doc_id, t FROM (SELECT doc_id, "
        f"unnest(string_split_regex(lower(text), '{_TOKEN_SPLIT}')) AS t FROM documents) u WHERE t <> ''), "
        "n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents), "
        "tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM toks "
        f"WHERE t IN ('{QUERY_TERMS[0]}', '{QUERY_TERMS[1]}', '{QUERY_TERMS[2]}') GROUP BY doc_id, t), "
        "df AS (SELECT t, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY t) "
        "SELECT tf.doc_id, "
        + exact.dsum_sql("tf * (n_docs - df + 0.5) / (df + 0.5)")
        + " AS score FROM tf JOIN df ON tf.t = df.t CROSS JOIN n "
        "GROUP BY tf.doc_id, n_docs ORDER BY score DESC, tf.doc_id LIMIT 20"
    ),
    tags=("L8",),
)
def l8b_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L8b: BM25-style ranked retrieval with rational idf. Plan shape:
    tokenize→explode only matching terms survive the IN filter (pushed
    below the explode's projection), tf is a partial-agg shuffle keyed
    (doc_id, term), df is a tiny 3-row aggregate BROADCAST back onto
    tf — no fact-side re-shuffle — and the final per-doc sum is
    decimal-exact (order-independent). Scoring lives in bm25_scores,
    shared with l35's lexical leg (round-5 review: one scoring body,
    not two)."""
    return bm25_scores(spark, sf_dir, limit=20)


def bm25_scores(spark: SparkSession, sf_dir: str, limit: int) -> DataFrame:
    """(doc_id, score) — the l8b BM25-style ranking over QUERY_TERMS,
    cut to ``limit``; the single implementation behind l8b and l35."""
    docs = T(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), _TOKEN_SPLIT)).alias("t"),
        )
        .where(F.col("t").isin(*QUERY_TERMS))
    )
    n_docs = float(docs.select(F.countDistinct("doc_id")).first()[0])
    tf = toks.groupBy("doc_id", "t").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("t").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    scored = tf.join(F.broadcast(dfreq), "t")
    term_score = F.col("tf") * (F.lit(n_docs) - F.col("df") + 0.5) / (
        F.col("df") + 0.5
    )
    return (
        scored.groupBy("doc_id")
        .agg(exact.dsum(term_score).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(limit)
    )


@register(
    "f_variant",
    oracle=(
        "SELECT event_id, CAST(json_extract(props, '$.k') AS BIGINT) AS k_val, "
        "(json_extract(props, '$.missing') IS NULL) AS missing_is_null "
        "FROM events WHERE event_id % 50 = 0 ORDER BY event_id"
    ),
    tags=("F", "S3"),
)
def f_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT path: parse_json once → binary variant, then typed
    variant_get extraction. At 100 TB this beats get_json_object
    chains (each of which re-parses the JSON string per call); the
    variant encoding is parsed once per row and pushdown-prunable."""
    ev = T(spark, sf_dir, "events").where(F.col("event_id") % 50 == 0)
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "bigint").alias("k_val"),
        F.variant_get(v, "$.missing", "string").isNull().alias("missing_is_null"),
    ).orderBy("event_id")


@register(
    "l17_bigram_topk",
    oracle=(
        "WITH toks AS (SELECT doc_id, "
        f"list_filter(string_split_regex(lower(text), '{_TOKEN_SPLIT}'), x -> x <> '') AS t "
        "FROM documents), "
        "bg AS (SELECT doc_id, unnest(list_transform("
        "list_zip(t[1:len(t)-1], t[2:]), x -> x[1] || ' ' || x[2])) AS bigram "
        "FROM toks WHERE len(t) >= 2) "
        "SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs "
        "FROM bg GROUP BY bigram ORDER BY n DESC, bigram LIMIT 25"
    ),
    tags=("L17", "L5"),
)
def l17_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L17: corpus bigram frequencies (language-model-ish n-gram
    stats). Bigrams are built ARRAY-side with zip_with over two slices
    of the token array — one codegen projection, then a single
    explode+groupBy shuffle keyed by bigram. The same shape extends to
    any n by sliding the slice windows."""
    docs = T(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.filter(
            F.split(F.lower("text"), _TOKEN_SPLIT), lambda x: x != ""
        ).alias("t"),
    ).where(F.size("t") >= 2)
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("bigram"),
    )
    return (
        bigrams.groupBy("bigram")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.desc("n"), "bigram")
        .limit(25)
    )


@register(
    "l8c_tfidf_search",
    oracle=(
        "WITH toks AS (SELECT doc_id, t FROM (SELECT doc_id, "
        f"unnest(string_split_regex(lower(text), '{_TOKEN_SPLIT}')) AS t FROM documents) u WHERE t <> ''), "
        "dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS doc_len FROM toks GROUP BY doc_id), "
        "n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents), "
        "tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM toks "
        f"WHERE t IN ('{QUERY_TERMS[0]}', '{QUERY_TERMS[1]}', '{QUERY_TERMS[2]}') GROUP BY doc_id, t), "
        "df AS (SELECT t, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY t) "
        "SELECT tf.doc_id, "
        + exact.dsum_sql(
            "(CAST(tf AS DOUBLE) / CAST(doc_len AS DOUBLE)) * ((n_docs + 1.0) / (df + 1.0))"
        )
        + " AS score FROM tf JOIN df ON tf.t = df.t "
        "JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN n "
        "GROUP BY tf.doc_id ORDER BY score DESC, tf.doc_id LIMIT 20"
    ),
    tags=("L8",),
)
def l8c_tfidf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L8c: classic TF-IDF ranking (length-normalized tf × rational
    idf (N+1)/(df+1) — no log, same hash-checkability rationale as
    l8b's BM25). Plan: the term-filtered explode feeds tf keyed
    (doc_id, term); doc lengths are a second partial agg over the SAME
    exploded tokens (Catalyst reuses the projection, both are map-side
    combinable); df is a ≤|terms|-row aggregate BROADCAST onto tf, and
    doc_len joins on the already-(doc_id)-clustered tf side. Per-term
    products are two IEEE doubles in a fixed order, summed decimal-
    exact — bit-identical between engines."""
    docs = T(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id",
            F.explode(F.split(F.lower("text"), _TOKEN_SPLIT)).alias("t"),
        )
        .where(F.col("t") != "")
    )
    doc_len = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("doc_len"))
    n_docs = float(docs.select(F.countDistinct("doc_id")).first()[0])
    tf = (
        toks.where(F.col("t").isin(*QUERY_TERMS))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(F.countDistinct("doc_id").cast("double").alias("df"))
    term_score = (
        F.col("tf").cast("double") / F.col("doc_len").cast("double")
    ) * ((F.lit(n_docs) + F.lit(1.0)) / (F.col("df") + F.lit(1.0)))
    return (
        tf.join(F.broadcast(dfreq), "t")
        .join(doc_len, "doc_id")
        .groupBy("doc_id")
        .agg(exact.dsum(term_score).alias("score"))
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
    )


#: The l35 oracle, module-level so the l42 rerank twin can embed the
#: SAME fused-candidate SQL as a subquery (one definition, like the
#: md5 chain constants — a hand-copied drift would silently de-certify
#: the rerank).
_L35_ORACLE = (
        # lexical leg: the l8b BM25-style ranking, cut to top 50
        "WITH toks AS (SELECT doc_id, t FROM (SELECT doc_id, "
        f"unnest(string_split_regex(lower(text), '{_TOKEN_SPLIT}')) AS t "
        "FROM documents) u WHERE t <> ''), "
        "n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents), "
        "tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM toks "
        f"WHERE t IN ('{QUERY_TERMS[0]}', '{QUERY_TERMS[1]}', '{QUERY_TERMS[2]}') "
        "GROUP BY doc_id, t), "
        "df AS (SELECT t, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY t), "
        "bm AS (SELECT tf.doc_id, "
        + exact.dsum_sql("tf * (n_docs - df + 0.5) / (df + 0.5)")
        + " AS score FROM tf JOIN df ON tf.t = df.t CROSS JOIN n "
        "GROUP BY tf.doc_id, n_docs ORDER BY score DESC, tf.doc_id LIMIT 50), "
        "bmr AS (SELECT doc_id, CAST(ROW_NUMBER() OVER "
        "(ORDER BY score DESC, doc_id) AS BIGINT) AS rank_t FROM bm), "
        # semantic leg: exact cosine vs the vec_id-0 query embedding
        "q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0), "
        "cs AS (SELECT e.vec_id AS doc_id, "
        + cosine_sim_sql("q.q_emb", "e.embedding")
        + " AS cos_sim FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0 "
        "ORDER BY cos_sim DESC, e.vec_id LIMIT 50), "
        "csr AS (SELECT doc_id, CAST(ROW_NUMBER() OVER "
        "(ORDER BY cos_sim DESC, doc_id) AS BIGINT) AS rank_v FROM cs) "
        # reciprocal-rank fusion, k = 60
        "SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id, b.rank_t, c.rank_v, "
        "ROUND(COALESCE(1.0 / (60 + b.rank_t), 0.0) "
        "+ COALESCE(1.0 / (60 + c.rank_v), 0.0), 8) AS rrf "
        "FROM bmr b FULL OUTER JOIN csr c ON b.doc_id = c.doc_id "
        "ORDER BY rrf DESC, doc_id LIMIT 20"
)


@register(
    "l35_hybrid_rrf",
    oracle=_L35_ORACLE,
    tags=("L35", "L8", "L3", "retrieval"),
)
def l35_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L35: HYBRID retrieval — reciprocal-rank fusion (Cormack et al.,
    SIGIR'09: score = Σ 1/(k + rank), k = 60) of the lexical BM25
    ranking (l8b's plan over QUERY_TERMS) and the semantic exact-cosine
    ranking against the vec_id-0 query embedding (l3's plan, 1:1
    doc_id↔vec_id on this fixture). The standard RAG retrieval stack:
    each leg ranks independently and the fusion needs only the two
    top-50 RANK tables — at 100 TB the legs are the indexed paths
    (inverted-index tf shuffle; IVF/LSH candidates re-ranked exact)
    and the fusion cost is |k1| + |k2| rows regardless of corpus size.

    Exactness: ranks are integers, so the fused score is two IEEE
    divisions and one addition evaluated identically on both engines;
    the ROW_NUMBER windows run over ≤50-row leg outputs (global
    windows over top-k tables — the documented tiny-intermediate
    exception). Full-outer fusion keeps docs found by only one leg."""
    from pyspark.sql import Window

    from ipydataclean_spark.functions.vector import cosine_sim

    bm = bm25_scores(spark, sf_dir, limit=50)
    bmr = bm.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "doc_id"))
        .cast("long")
        .alias("rank_t"),
    )
    emb = T(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    cs = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_sim("q_emb", "embedding").alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "doc_id")
        .limit(50)
    )
    csr = cs.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("cos_sim"), "doc_id"))
        .cast("long")
        .alias("rank_v"),
    )
    b, c = bmr.alias("b"), csr.alias("c")
    fused = b.join(c, F.col("b.doc_id") == F.col("c.doc_id"), "full_outer").select(
        F.coalesce(F.col("b.doc_id"), F.col("c.doc_id")).alias("doc_id"),
        F.col("b.rank_t").alias("rank_t"),
        F.col("c.rank_v").alias("rank_v"),
        F.round(
            F.coalesce(1.0 / (F.lit(60) + F.col("b.rank_t")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(60) + F.col("c.rank_v")), F.lit(0.0)),
            8,
        ).alias("rrf"),
    )
    return fused.orderBy(F.desc("rrf"), "doc_id").limit(20)


_L46_ORACLE = (
    # lexical top-20 (the l8b CTEs, cut to 20) and semantic top-20
    "WITH toks AS (SELECT doc_id, t FROM (SELECT doc_id, "
    f"unnest(string_split_regex(lower(text), '{_TOKEN_SPLIT}')) AS t FROM documents) u WHERE t <> ''), "
    "n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents), "
    "tf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM toks "
    f"WHERE t IN ('{QUERY_TERMS[0]}', '{QUERY_TERMS[1]}', '{QUERY_TERMS[2]}') GROUP BY doc_id, t), "
    "df AS (SELECT t, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM tf GROUP BY t), "
    "bm AS (SELECT tf.doc_id, "
    + exact.dsum_sql("tf * (n_docs - df + 0.5) / (df + 0.5)")
    + " AS score FROM tf JOIN df ON tf.t = df.t CROSS JOIN n "
    "GROUP BY tf.doc_id, n_docs ORDER BY score DESC, tf.doc_id LIMIT 20), "
    "bmr AS (SELECT doc_id, score, CAST(ROW_NUMBER() OVER "
    "(ORDER BY score DESC, doc_id) AS BIGINT) AS rank_t FROM bm), "
    "q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0), "
    "sem AS (SELECT vec_id AS doc_id FROM (SELECT e.vec_id, "
    "ROW_NUMBER() OVER (ORDER BY "
    + cosine_sim_sql("q.q_emb", "e.embedding")
    + " DESC, e.vec_id) AS rn FROM embeddings e CROSS JOIN q "
    "WHERE e.vec_id <> 0) s WHERE rn <= 20) "
    "SELECT b.doc_id, b.rank_t, ROUND(b.score, 8) AS bm25_score, "
    "ROUND(" + cosine_sim_sql("q.q_emb", "e.embedding") + ", 8) AS cos_sim "
    "FROM bmr b JOIN embeddings e ON e.vec_id = b.doc_id CROSS JOIN q "
    "WHERE b.doc_id NOT IN (SELECT doc_id FROM sem) "
    "ORDER BY b.rank_t"
)


@register("l46_hard_negatives", oracle=_L46_ORACLE, tags=("L46", "L8", "L3", "retrieval"))
def l46_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L46: HARD-NEGATIVE MINING for contrastive retrieval training —
    the public DPR recipe (Karpukhin et al., EMNLP'20): the best
    negatives for a query are documents the LEXICAL ranker loves but
    the SEMANTIC space keeps distant. Emits the BM25 top-20 docs that
    are NOT in the exact-cosine top-20 of the same query, with both
    scores (lexical rank + cosine), ready to join into a training-pair
    table. Composes the two certified legs the l35 fusion already
    uses — this is the third consumer of the retrieval stack (search,
    fuse+rerank, and now training-data mining).

    At 100 TB: both legs are the indexed paths (inverted-index tf
    shuffle; ANN candidates re-ranked exact), the anti-membership
    check is over two top-k tables (constant size), and the cosine
    re-score joins embeddings for ≤ 20 docs. Scores: BM25 uses the
    rational idf + decimal sum (hash-exact); cosine is the sequential
    fold — both round-8."""
    from pyspark.sql import Window

    from ipydataclean_spark.functions.vector import cosine_sim

    bm = bm25_scores(spark, sf_dir, limit=20)
    bmr = bm.select(
        "doc_id",
        "score",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "doc_id"))
        .cast("long")
        .alias("rank_t"),
    )
    emb = T(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    sem = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_sim("q_emb", "embedding").alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "doc_id")
        .limit(20)
        .select("doc_id")
    )
    negatives = bmr.join(sem, "doc_id", "left_anti")
    return (
        negatives.join(
            emb.select(F.col("vec_id").alias("doc_id"), "embedding"), "doc_id"
        )
        .crossJoin(F.broadcast(q))
        .select(
            "doc_id",
            "rank_t",
            F.round("score", 8).alias("bm25_score"),
            F.round(cosine_sim("q_emb", "embedding"), 8).alias("cos_sim"),
        )
        .orderBy("rank_t")
    )


_L42_WINDOW = 8   #: term-interaction proximity window (token positions)

#: The rerank stage's EXPANDED query. The sparse first-stage terms
#: (QUERY_TERMS) barely exist in the fixture vocabulary — only 'data'
#: matches, so scoring interactions over them is vacuous (every
#: candidate: coverage 1, inter_pairs 0, rerank = identity). A rerank
#: tier routinely sees a richer query than the sparse leg (the
#: cross-encoder reads the full query text; expansion happens between
#: tiers), so l42 scores over in-vocabulary expansion terms — on the
#: fixture candidates these spread coverage 1..3 and inter_pairs 2..33.
_L42_TERMS = ("data", "join", "hash")

_L42_TERMS_IN = "('" + "', '".join(_L42_TERMS) + "')"

_L42_ORACLE = (
    "WITH cand AS (SELECT doc_id, rrf FROM (" + _L35_ORACLE + ")), "
    "qtoks AS (SELECT doc_id, pos, t FROM (SELECT doc_id, "
    f"generate_subscripts(string_split_regex(lower(text), '{_TOKEN_SPLIT}'), 1) AS pos, "
    f"unnest(string_split_regex(lower(text), '{_TOKEN_SPLIT}')) AS t "
    "FROM documents WHERE doc_id IN (SELECT doc_id FROM cand)) u "
    f"WHERE t IN {_L42_TERMS_IN}), "
    "inter AS (SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM qtoks a "
    "JOIN qtoks b ON a.doc_id = b.doc_id AND a.t < b.t "
    f"AND ABS(a.pos - b.pos) <= {_L42_WINDOW} GROUP BY a.doc_id), "
    "cov AS (SELECT doc_id, CAST(COUNT(DISTINCT t) AS BIGINT) AS c "
    "FROM qtoks GROUP BY doc_id) "
    "SELECT cand.doc_id, "
    "CAST(COALESCE(cov.c, 0) AS BIGINT) AS coverage, "
    "CAST(COALESCE(inter.n, 0) AS BIGINT) AS inter_pairs, "
    "CAST(COALESCE(cov.c, 0) * 10000 + COALESCE(inter.n, 0) AS BIGINT) AS ce_score, "
    "rrf FROM cand LEFT JOIN cov ON cov.doc_id = cand.doc_id "
    "LEFT JOIN inter ON inter.doc_id = cand.doc_id "
    "ORDER BY ce_score DESC, rrf DESC, cand.doc_id LIMIT 10"
)


@register("l42_rerank_interaction", oracle=_L42_ORACLE, tags=("L42", "L35", "retrieval"))
def l42_rerank_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L42: the RERANK stage of the retrieval stack (VERDICT r07 #6) —
    the l35 RRF top-20 candidates rescored by a JOINT (query, doc)
    interaction model and cut to a final top-10. In production this
    slot holds a cross-encoder; its defining property — the score is a
    function of the PAIR that does not decompose into per-doc values —
    is modeled here by a deterministic proximity-interaction scorer:
    ce_score = 10000 * coverage + inter_pairs, where coverage counts
    distinct EXPANDED-query terms (_L42_TERMS — the rerank tier sees a
    richer query than the sparse leg, see that constant) present in
    the doc and inter_pairs counts co-occurrences of two DIFFERENT
    terms within 8 token positions (positions in the raw split space,
    empty slots included — both engines index the same split array).
    A model swap replaces ONE map stage; the plumbing — candidate cut,
    per-pair scoring, stable final cut — is what this operator pins.

    Plan shape at 100 TB (the whole point of a rerank tier): the
    expensive per-pair scoring touches ONLY the top-20 candidate docs
    — the positional token table is built after a broadcast semi-join
    on the candidate ids, so rerank cost is |candidates| x doc_len
    regardless of corpus size, while the legs stay on their indexed
    paths. The interaction self-join is per-doc (keyed on doc_id over
    ≤ 20 docs x |query| positions). Scores are integers; the only
    float is the carried-through l35 rrf (already round-8 certified)."""
    cand = l35_hybrid_rrf(spark, sf_dir).select("doc_id", "rrf")
    docs = T(spark, sf_dir, "documents").join(
        F.broadcast(cand.select("doc_id")), "doc_id", "left_semi"
    )
    toks = (
        docs.select(
            "doc_id",
            F.posexplode(F.split(F.lower("text"), _TOKEN_SPLIT)).alias("pos0", "t"),
        )
        .where(F.col("t").isin(*_L42_TERMS))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "t")
    )
    a = toks.select("doc_id", F.col("pos").alias("pa"), F.col("t").alias("ta"))
    b = toks.select("doc_id", F.col("pos").alias("pb"), F.col("t").alias("tb"))
    inter = (
        a.join(b, "doc_id")
        .where(
            (F.col("ta") < F.col("tb"))
            & (F.abs(F.col("pa") - F.col("pb")) <= _L42_WINDOW)
        )
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    cov = toks.groupBy("doc_id").agg(F.countDistinct("t").alias("c"))
    coverage = F.coalesce(F.col("c"), F.lit(0)).cast("long")
    inter_pairs = F.coalesce(F.col("n"), F.lit(0)).cast("long")
    return (
        cand.join(cov, "doc_id", "left")
        .join(inter, "doc_id", "left")
        .select(
            "doc_id",
            coverage.alias("coverage"),
            inter_pairs.alias("inter_pairs"),
            (coverage * 10000 + inter_pairs).cast("long").alias("ce_score"),
            "rrf",
        )
        .orderBy(F.desc("ce_score"), F.desc("rrf"), "doc_id")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# L48 — retrieval-quality evaluation: recall@k / MRR / nDCG over the stack
# ---------------------------------------------------------------------------

_L48_K = 10       #: metric cutoff (recall@10, nDCG@10)
_L48_GOLD = 20    #: gold-set size (dual-criteria exact top-20)

#: Gold standard: EXACT dual-criteria relevance. A doc is relevant if
#: it ranks well under BOTH brute-force signals the production legs
#: each approximate from one side — the full-corpus BM25 rank plus the
#: full-corpus exact-cosine rank (rank-sum aggregation, the classic
#: rank-fusion ground-truth construction). doc_id 0 is the query
#: itself (vec_id 0 is the query embedding) and is excluded from the
#: gold domain.
_L48_GOLD_SQL = (
    "gtoks AS (SELECT doc_id, t FROM (SELECT doc_id, "
    f"unnest(string_split_regex(lower(text), '{_TOKEN_SPLIT}')) AS t "
    "FROM documents) u WHERE t <> ''), "
    "gn AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n_docs FROM documents), "
    "gtf AS (SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf FROM gtoks "
    f"WHERE t IN ('{QUERY_TERMS[0]}', '{QUERY_TERMS[1]}', '{QUERY_TERMS[2]}') "
    "GROUP BY doc_id, t), "
    "gdf AS (SELECT t, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df FROM gtf GROUP BY t), "
    "gbm AS (SELECT gtf.doc_id, "
    + exact.dsum_sql("tf * (n_docs - df + 0.5) / (df + 0.5)")
    + " AS bms FROM gtf JOIN gdf ON gtf.t = gdf.t CROSS JOIN gn "
    "GROUP BY gtf.doc_id), "
    "galld AS (SELECT d.doc_id, COALESCE(gbm.bms, 0.0) AS bms FROM documents d "
    "LEFT JOIN gbm ON gbm.doc_id = d.doc_id WHERE d.doc_id <> 0), "
    "gq AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id = 0), "
    "gcs AS (SELECT e.vec_id AS doc_id, "
    + cosine_sim_sql("gq.q_emb", "e.embedding")
    + " AS cos FROM embeddings e CROSS JOIN gq WHERE e.vec_id <> 0), "
    "gr AS (SELECT galld.doc_id, "
    "CAST(ROW_NUMBER() OVER (ORDER BY bms DESC, galld.doc_id) AS BIGINT) AS rl, "
    "CAST(ROW_NUMBER() OVER (ORDER BY cos DESC, galld.doc_id) AS BIGINT) AS rs "
    "FROM galld JOIN gcs ON gcs.doc_id = galld.doc_id), "
    "gold AS MATERIALIZED (SELECT doc_id FROM gr "
    f"ORDER BY rl + rs, doc_id LIMIT {_L48_GOLD})"
)

_L48_ORACLE = (
    "WITH " + _L48_GOLD_SQL + ", "
    # the three production runs, each a (system, doc_id, rank) table
    # doc_id 0 is the query itself — excluded from EVERY run
    # symmetrically (self-retrieval is not a hit and must not occupy
    # a rank slot in one leg but not another — review r09)
    "lex AS (SELECT doc_id, score FROM (SELECT gtf.doc_id, "
    + exact.dsum_sql("tf * (n_docs - df + 0.5) / (df + 0.5)")
    + " AS score FROM gtf JOIN gdf ON gtf.t = gdf.t CROSS JOIN gn "
    "WHERE gtf.doc_id <> 0 "
    f"GROUP BY gtf.doc_id ORDER BY score DESC, gtf.doc_id LIMIT {_L48_GOLD})), "
    "sem AS (SELECT doc_id, cos FROM gcs "
    f"ORDER BY cos DESC, doc_id LIMIT {_L48_GOLD}), "
    "fus AS (SELECT doc_id, rrf FROM (" + _L35_ORACLE + ") WHERE doc_id <> 0), "
    "runs AS (SELECT 'lexical' AS system, doc_id, CAST(ROW_NUMBER() OVER "
    "(ORDER BY score DESC, doc_id) AS BIGINT) AS rank FROM lex "
    "UNION ALL SELECT 'semantic', doc_id, CAST(ROW_NUMBER() OVER "
    "(ORDER BY cos DESC, doc_id) AS BIGINT) FROM sem "
    "UNION ALL SELECT 'rrf', doc_id, CAST(ROW_NUMBER() OVER "
    "(ORDER BY rrf DESC, doc_id) AS BIGINT) FROM fus), "
    "ngold AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_gold FROM gold), "
    "idcg AS (SELECT "
    + exact.rsum12_sql("1.0 / LOG2(i + 1)")
    + f" AS idcg FROM range(1, {_L48_K} + 1) t(i)), "
    "joined AS (SELECT system, rank, (gold.doc_id IS NOT NULL) AS hit "
    "FROM runs LEFT JOIN gold ON runs.doc_id = gold.doc_id) "
    "SELECT system, n_gold, "
    "CAST(COUNT_IF(hit) AS BIGINT) AS hits_at_20, "
    f"ROUND(CAST(COUNT_IF(hit AND rank <= {_L48_K}) AS BIGINT) / n_gold, 8) "
    "AS recall_at_10, "
    "ROUND(COALESCE(1.0 / MIN(CASE WHEN hit THEN rank END), 0.0), 8) AS mrr, "
    "ROUND(COALESCE("
    + exact.rsum12_sql(f"CASE WHEN hit AND rank <= {_L48_K} THEN 1.0 / LOG2(rank + 1) END")
    + ", 0.0) / idcg, 8) AS ndcg_at_10 "
    "FROM joined CROSS JOIN ngold CROSS JOIN idcg "
    "GROUP BY system, n_gold, idcg ORDER BY system"
)


@register(
    "l48_retrieval_eval",
    oracle=_L48_ORACLE,
    tags=("L48", "L35", "L8", "L3", "retrieval", "eval"),
)
def l48_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L48: retrieval-QUALITY metrics (verdict r08 #3) — recall@10,
    MRR, and nDCG@10 for each tier of the certified retrieval stack
    (l8b lexical, the l35 semantic leg, l35 RRF fusion), measured
    against an EXACT dual-criteria gold set: the full-corpus top-20 by
    rank-sum of brute-force BM25 rank + brute-force cosine rank (each
    production leg approximates exactly one of the two signals, so the
    gold rewards what fusion is for; at driver scale (sf <= 0.01) RRF
    >= each single leg on every metric — pinned in pytest). The
    l2h/l3m discipline applied to retrieval: the stack stops being
    "has operators" and becomes "has measured quality".

    Scale regime (measured, BENCH.md): at sf1 (50k docs) every tier's
    metrics collapse toward zero — the fixed top-50 leg cuts are depth-
    starved relative to the corpus, so dual-criteria gold docs sit
    below both cuts. That is the measurement working, not failing: the
    operator quantifies exactly the candidate-depth/corpus-size ratio
    a production retrieval stack must budget, and the rrf-dominance
    pin is asserted only in the regime where the cuts cover the
    corpus (the driver's correctness SF).

    Exactness: ranks are integers; recall and MRR are single IEEE
    divisions of integers; DCG terms 1/log2(rank+1) are libm → rounded
    to 12 dp and decimal-summed (rsum12), and the IDCG denominator is
    computed from a range(1, k+1) table under the SAME discipline in
    both engines — never a pasted float literal.

    At 100 TB: the three runs are top-k tables (corpus-size
    independent); the gold legs are the AUDIT tier — two full-corpus
    exact rankings (global sort each), run at eval time on a sampled
    or held-out query set, never in the serving path — the same
    truth-vs-production split as l2h (LSH recall) and l3m (IVF
    recall)."""
    from pyspark.sql import Window

    from ipydataclean_spark.functions.vector import cosine_sim

    docs = T(spark, sf_dir, "documents")
    emb = T(spark, sf_dir, "embeddings")

    # ---- exact full-corpus legs (shared by gold; lex run reuses) ----
    toks = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), _TOKEN_SPLIT)).alias("t"),
    ).where(F.col("t") != "")
    n_docs = docs.select(F.countDistinct("doc_id")).first()[0]
    tf = (
        toks.where(F.col("t").isin(*QUERY_TERMS))
        .groupBy("doc_id", "t")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("t").agg(
        F.countDistinct("doc_id").cast("double").alias("df")
    )
    # association must match the oracle's `tf * (N - df + 0.5) / (df
    # + 0.5)` = (tf * (N - df + 0.5)) / (df + 0.5) — the other
    # grouping differs in the last ulp for ~1/4 of inputs and can
    # flip the per-term DECIMAL rounding at scale (review r09; same
    # form as bm25_scores)
    term = (
        F.col("tf").cast("double")
        * (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
    ) / (F.col("df") + F.lit(0.5))
    bm = (
        tf.join(F.broadcast(dfreq), "t")
        .groupBy("doc_id")
        .agg(exact.dsum(term).alias("bms"))
    ).localCheckpoint(eager=True)

    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("q_emb"))
    cs = (
        emb.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            cosine_sim("q_emb", "embedding").alias("cos"),
        )
    ).localCheckpoint(eager=True)

    # ---- gold: rank-sum of the two exact rankings over doc_id <> 0 --
    alld = (
        docs.where(F.col("doc_id") != 0)
        .select("doc_id")
        .join(bm, "doc_id", "left")
        .na.fill({"bms": 0.0})
    )
    r = alld.join(cs, "doc_id").select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bms"), "doc_id"))
        .cast("long")
        .alias("rl"),
        F.row_number()
        .over(Window.orderBy(F.desc("cos"), "doc_id"))
        .cast("long")
        .alias("rs"),
    )
    gold = (
        r.orderBy(F.col("rl") + F.col("rs"), "doc_id")
        .limit(_L48_GOLD)
        .select("doc_id")
        .localCheckpoint(eager=True)
    )

    # ---- production runs: (system, doc_id, rank) ----
    def ranked(df: DataFrame, order, system: str) -> DataFrame:
        return df.select(
            F.lit(system).alias("system"),
            "doc_id",
            F.row_number().over(Window.orderBy(*order)).cast("long").alias("rank"),
        )

    # self-retrieval excluded from every run symmetrically (review r09)
    lex = (
        bm.where(F.col("doc_id") != 0)
        .orderBy(F.desc("bms"), "doc_id")
        .limit(_L48_GOLD)
    )
    sem = cs.orderBy(F.desc("cos"), "doc_id").limit(_L48_GOLD)
    fus = (
        l35_hybrid_rrf(spark, sf_dir)
        .where(F.col("doc_id") != 0)
        .select("doc_id", "rrf")
    )
    runs = (
        ranked(lex, (F.desc("bms"), "doc_id"), "lexical")
        .unionByName(ranked(sem, (F.desc("cos"), "doc_id"), "semantic"))
        .unionByName(ranked(fus, (F.desc("rrf"), "doc_id"), "rrf"))
    )

    ngold = gold.agg(F.count(F.lit(1)).cast("long").alias("n_gold"))
    idcg = spark.range(1, _L48_K + 1).agg(
        exact.rsum12(1.0 / F.log2(F.col("id") + 1)).alias("idcg")
    )
    joined = runs.join(
        F.broadcast(gold.withColumn("hit", F.lit(True))), "doc_id", "left"
    ).na.fill({"hit": False})
    dcg_term = F.when(
        F.col("hit") & (F.col("rank") <= _L48_K),
        1.0 / F.log2(F.col("rank") + 1),
    )
    return (
        joined.crossJoin(F.broadcast(ngold))
        .crossJoin(F.broadcast(idcg))
        .groupBy("system", "n_gold", "idcg")
        .agg(
            F.count_if(F.col("hit")).alias("hits_at_20"),
            F.round(
                F.count_if(F.col("hit") & (F.col("rank") <= _L48_K))
                / F.col("n_gold"),
                8,
            ).alias("recall_at_10"),
            F.round(
                F.coalesce(
                    1.0 / F.min(F.when(F.col("hit"), F.col("rank"))), F.lit(0.0)
                ),
                8,
            ).alias("mrr"),
            F.round(
                F.coalesce(exact.rsum12(dcg_term), F.lit(0.0)) / F.col("idcg"), 8
            ).alias("ndcg_at_10"),
        )
        .select(
            "system", "n_gold", "hits_at_20", "recall_at_10", "mrr", "ndcg_at_10"
        )
        .orderBy("system")
    )


# ---------------------------------------------------------------------------
# L65 — RAKE keyword extraction (degree/frequency phrase scoring)
# ---------------------------------------------------------------------------

from ipydataclean_spark.operators.llm_quality import STOPWORDS as _L65_STOPS  # noqa: E402

#: RAKE's stopword delimiter set = the engine's fixture stopwords
#: (llm_quality.STOPWORDS, imported — not re-typed — so the delimiter
#: contract cannot drift; review r09c).
_L65_TOPN = 30
#: standard RAKE candidate cap — stopword-free runs longer than this
#: are discarded entirely (they are run-on segments, not collocations;
#: the sf1 salted fixture, where 'the' becomes 'thex0', produced
#: 28-word "phrases" without it)
_L65_MAX_PLEN = 4

_L65_STOP_SQL = "w IN ('" + "', '".join(_L65_STOPS) + "')"


def _l65_oracle() -> str:
    from ipydataclean_spark.functions.text import norm_text_sql

    return (
        "WITH tok AS (SELECT doc_id, "
        "UNNEST(string_split(" + norm_text_sql("text") + ", ' ')) AS w, "
        "generate_subscripts(string_split(" + norm_text_sql("text") + ", ' '), 1) AS pos "
        "FROM documents), "
        f"marked AS (SELECT doc_id, w, pos, CAST({_L65_STOP_SQL} AS INTEGER) AS is_stop "
        "FROM tok), "
        "seg AS (SELECT doc_id, w, pos, "
        "SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos "
        "ROWS UNBOUNDED PRECEDING) AS phrase_id "
        "FROM marked), "
        "member AS (SELECT doc_id, w, pos, phrase_id, "
        "CAST(COUNT(*) OVER (PARTITION BY doc_id, phrase_id) AS BIGINT) AS plen "
        f"FROM seg WHERE NOT ({_L65_STOP_SQL})), "
        f"cand AS (SELECT * FROM member WHERE plen <= {_L65_MAX_PLEN}), "
        "wstat AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq, "
        "CAST(SUM(plen) AS BIGINT) AS deg FROM cand GROUP BY w), "
        "wscore AS (SELECT w, (CAST(deg AS DOUBLE) / freq) AS ws FROM wstat), "
        "ph AS (SELECT m.doc_id, m.phrase_id, "
        "string_agg(m.w, ' ' ORDER BY m.pos) AS phrase, "
        + exact.rsum12_sql("s.ws") + " AS pscore "
        "FROM cand m JOIN wscore s ON s.w = m.w "
        "GROUP BY m.doc_id, m.phrase_id) "
        "SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences, "
        "MAX(pscore) AS score "
        "FROM ph GROUP BY phrase "
        f"ORDER BY MAX(pscore) DESC, phrase LIMIT {_L65_TOPN}"
    )


@register(
    "l65_rake_keywords",
    oracle=_l65_oracle(),
    tags=("L65", "L8", "L17", "text-analysis"),
)
def l65_rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L65: RAKE keyword extraction (Rose et al. 2010) — candidate
    phrases are maximal stopword-free token runs; each word scores
    degree/frequency (degree = Σ length of the phrases it appears in,
    rewarding words that travel in long collocations); a phrase scores
    the sum of its words' scores. The corpus-level top-N is the
    keyword table a search/tagging pipeline seeds from — the unsupervised
    complement of l8c's TF-IDF (which needs a query) and l17's raw
    bigram counts (which have no notion of phrase).

    Phrase segmentation is GAPS-AND-ISLANDS over exploded tokens (a
    running stopword count is the phrase id) rather than regex
    splitting — the same arithmetic in both engines, immune to
    Java-vs-RE2 boundary divergences (the x1 anchor lesson). Score
    doubles: ONE division per word, then ROUND12-decimal sums per
    phrase; identical phrases score identical decimals, so the final
    MAX is exact.

    Candidates cap at _L65_MAX_PLEN words (the standard RAKE rule):
    longer stopword-free runs are run-on segments, not collocations,
    and without the cap they dominate the score by length alone.

    Scale shape: one explode pass; the phrase window and member count
    are doc-keyed; word stats are one word-keyed agg (broadcast-sized
    result joins back); the top-N is a bounded sort over distinct
    phrases."""
    from pyspark.sql import Window

    from ipydataclean_spark.operators.llm import tokens_col

    docs = T(spark, sf_dir, "documents").withColumn("__toks", tokens_col("text"))
    tok = docs.select(
        "doc_id", F.posexplode("__toks").alias("pos0", "w")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    is_stop = F.col("w").isin(*_L65_STOPS)
    wseg = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, 0
    )
    seg = tok.withColumn("phrase_id", F.sum(is_stop.cast("int")).over(wseg))
    member = (
        seg.where(~is_stop)
        .withColumn(
            "plen",
            F.count(F.lit(1)).over(Window.partitionBy("doc_id", "phrase_id")).cast("long"),
        )
        .where(F.col("plen") <= _L65_MAX_PLEN)
    )
    wscore = (
        member.groupBy("w")
        .agg(
            F.count(F.lit(1)).alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
        .select("w", (F.col("deg").cast("double") / F.col("freq")).alias("ws"))
    )
    ph = (
        member.join(wscore, "w")
        .groupBy("doc_id", "phrase_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s["w"],
                ),
                " ",
            ).alias("phrase"),
            exact.rsum12("ws").alias("pscore"),
        )
    )
    return (
        ph.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.max("pscore").alias("score"),
        )
        .orderBy(F.desc("score"), "phrase")
        .limit(_L65_TOPN)
    )
