"""Training-corpus quality rules and budget sampling (SURVEY.md §2.9
round-3 queue): Gopher-style per-document quality signals, repetition
scoring, and per-domain token budgeting — the filters a 100 TB text
pipeline runs between ingest and dedup.

Method provenance (public): the signal set follows the published
quality heuristics of Gopher (Rae et al. 2021, §A1.1), C4 (Raffel et
al. 2020, §2.2) and CCNet — word counts, mean word length, stop-word
presence, repetition fractions, per-source budgets. The fixture's
documents are single-line synthetic word streams, so the line-based
variants (bullet/ellipsis line fractions) are represented by their
word-level counterparts; the line rules drop in as extra array_filter
terms on ``split(text, '\\n')`` with identical plan shape.

Scale notes: l19 is MAP-ONLY (per-row array expressions, zero
shuffles before the final sort) — on 100 TB it is a pure scan-side
filter that pipelines with whatever runs next. l21 uses the
explode+groupBy shape (two key-partitioned shuffles, both map-side
combinable) because per-array frequency counting via nested
higher-order functions is O(words x distinct) per row — fine for
short docs, quadratic for long ones; the shuffle form is linear. l20
is one window over (source)-partitioned data — a single shuffle keyed
by the budget dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.functions.text import norm_text_col, norm_text_sql
from ipydataclean_spark.operators.llm import tokens_col
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register

# Gopher-adapted thresholds, documented so the keep flag is auditable.
# (Gopher uses 50..100k words / mean len 3..10 / stop-word presence on
# web pages; the fixture's synthetic docs are 20..80 words, so the word
# floor is scaled to keep the flag non-degenerate at fixture scale.)
MIN_WORDS = 30
MAX_WORDS = 100_000
MIN_MEAN_WL = 3.0
MAX_MEAN_WL = 10.0
STOPWORDS = ("the", "a")

_STOP_SQL = "(x = 'the' OR x = 'a')"


@register(
    "l19_gopher_quality",
    oracle=(
        "WITH d AS (SELECT doc_id, source, "
        + norm_text_sql("text")
        + " AS nt FROM documents), "
        "s AS (SELECT doc_id, source, "
        "CAST(len(string_split(nt, ' ')) AS BIGINT) AS n_words, "
        "ROUND(CAST(len(nt) - (len(string_split(nt, ' ')) - 1) AS DOUBLE) "
        " / CAST(len(string_split(nt, ' ')) AS DOUBLE), 8) AS mean_word_len, "
        "ROUND(CAST(len(list_filter(string_split(nt, ' '), x -> "
        + _STOP_SQL
        + ")) AS DOUBLE) / CAST(len(string_split(nt, ' ')) AS DOUBLE), 8) AS stop_frac, "
        "ROUND(CAST(len(list_distinct(string_split(nt, ' '))) AS DOUBLE) "
        " / CAST(len(string_split(nt, ' ')) AS DOUBLE), 8) AS distinct_frac "
        "FROM d) "
        "SELECT doc_id, source, n_words, mean_word_len, stop_frac, distinct_frac, "
        f"CAST(n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS} "
        f"AND mean_word_len >= {MIN_MEAN_WL} AND mean_word_len <= {MAX_MEAN_WL} "
        "AND stop_frac > 0.0 AS BOOLEAN) AS keep "
        "FROM s ORDER BY doc_id"
    ),
    tags=("L19", "L7", "quality"),
)
def l19_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L19: Gopher-rule document quality signals — word count, mean
    word length, stop-word fraction, distinct-word fraction, and the
    resulting keep/reject flag (published Gopher §A1.1 heuristics,
    word-level adaptation for the single-line fixture).

    Plan: MAP-ONLY. Every signal is an array expression over the
    normalized token split (mean word length exploits the
    single-space collapse: len(text) = sum(word lens) + (n-1), so the
    SQL twin reads it off the normalized string while the Spark side
    folds the token array — identical values); the only
    exchange in the plan is the output sort. On 100 TB this runs as a
    scan-side filter fused into whole-stage codegen."""
    docs = T(spark, sf_dir, "documents").withColumn("__toks", tokens_col("text"))
    toks = F.col("__toks")
    n = F.size(toks).cast("long")
    wl_sum = F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x))
    mean_wl = F.round(wl_sum.cast("double") / n.cast("double"), 8)
    stop_n = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    stop_frac = F.round(stop_n.cast("double") / n.cast("double"), 8)
    distinct_frac = F.round(
        F.size(F.array_distinct(toks)).cast("double") / n.cast("double"), 8
    )
    out = docs.select(
        "doc_id",
        "source",
        n.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        stop_frac.alias("stop_frac"),
        distinct_frac.alias("distinct_frac"),
    ).withColumn(
        "keep",
        (F.col("n_words") >= MIN_WORDS)
        & (F.col("n_words") <= MAX_WORDS)
        & (F.col("mean_word_len") >= MIN_MEAN_WL)
        & (F.col("mean_word_len") <= MAX_MEAN_WL)
        & (F.col("stop_frac") > 0.0),
    )
    return out.orderBy("doc_id")


@register(
    "l21_top_bigram_frac",
    oracle=(
        "WITH toks AS (SELECT doc_id, string_split("
        + norm_text_sql("text")
        + ", ' ') AS t FROM documents), "
        "bg AS (SELECT doc_id, unnest(list_transform(range(1, len(t)), "
        "i -> t[i] || ' ' || t[i + 1])) AS b FROM toks WHERE len(t) >= 2), "
        "cnt AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c "
        "FROM bg GROUP BY doc_id, b) "
        "SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams, "
        "MAX(c) AS top_count, "
        "ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 8) AS top_frac "
        "FROM cnt GROUP BY doc_id ORDER BY top_frac DESC, doc_id"
    ),
    tags=("L21", "L7", "quality"),
)
def l21_top_bigram_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L21: repetition score — the fraction of a document's word
    bigrams occupied by its single most frequent bigram (the Gopher
    "top-2-gram character fraction" signal, word-level form);
    template/spam text scores high and is filtered before training.

    Plan: bigrams are built map-side from the materialized token
    array (sequence+transform, no self-join), then ONE explode feeds
    a (doc_id, bigram)-keyed count and a doc_id-keyed rollup — two
    map-side-combinable shuffles, linear in corpus size. The
    all-in-array alternative (filter-count per distinct element) is
    O(words x distinct) per row and loses on long documents."""
    docs = T(spark, sf_dir, "documents").withColumn("__toks", tokens_col("text"))
    toks = F.col("__toks")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.concat(F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)),
    )
    bg = (
        docs.where(F.size(toks) >= 2)
        .select("doc_id", F.explode(bigrams).alias("b"))
    )
    cnt = bg.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    return (
        cnt.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_bigrams"),
            F.max("c").alias("top_count"),
            F.round(
                F.max("c").cast("double") / F.sum("c").cast("double"), 8
            ).alias("top_frac"),
        )
        .orderBy(F.desc("top_frac"), "doc_id")
    )


#: Per-source word budget for l20 (chosen so roughly half of each
#: fixture source's docs survive — keeps the query non-degenerate).
SOURCE_BUDGET_WORDS = 700


@register(
    "l20_domain_budget",
    oracle=(
        "WITH d AS (SELECT doc_id, source, "
        "CAST(len(string_split("
        + norm_text_sql("text")
        + ", ' ')) AS BIGINT) AS n_words FROM documents), "
        "r AS (SELECT doc_id, source, n_words, "
        "CAST(SUM(n_words) OVER (PARTITION BY source "
        "ORDER BY n_words DESC, doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_words "
        "FROM d) "
        f"SELECT source, doc_id, n_words, cum_words FROM r WHERE cum_words <= {SOURCE_BUDGET_WORDS} "
        "ORDER BY source, cum_words"
    ),
    tags=("L20", "sampling", "quality"),
)
def l20_domain_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L20: per-domain budget sampling — cap each source at a fixed
    word budget, keeping its longest documents first (the CCNet/
    Gopher-style mixture-balancing step that stops one over-crawled
    domain from dominating the training mixture).

    Deterministic: the greedy order is (n_words DESC, doc_id), so the
    kept set is unique. Plan: ONE shuffle keyed source (the window
    partition); the running sum is a single WindowExec per partition —
    at 100 TB the source key has far more groups than executors, so
    the window parallelizes on the budget dimension; a skewed mega-
    domain is bounded by its own budget cutoff (rows past the budget
    still sort within the group — mitigate with a pre-filter on
    rank when a single domain exceeds executor memory)."""
    d = (
        T(spark, sf_dir, "documents")
        .withColumn("__toks", tokens_col("text"))
        .select(
            "doc_id", "source", F.size("__toks").cast("long").alias("n_words")
        )
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_words"), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("cum_words", F.sum("n_words").over(w).cast("long"))
        .where(F.col("cum_words") <= SOURCE_BUDGET_WORDS)
        .select("source", "doc_id", "n_words", "cum_words")
        .orderBy("source", "cum_words")
    )


@register(
    "l23_char_entropy",
    oracle=(
        "WITH ch AS (SELECT doc_id, unnest(string_split_regex("
        + norm_text_sql("text")
        + ", '')) AS c FROM documents), "
        "ch2 AS (SELECT doc_id, c FROM ch WHERE c <> ''), "
        "cnt AS (SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM ch2 GROUP BY doc_id, c), "
        "tot AS (SELECT doc_id, CAST(SUM(n) AS DOUBLE) AS t FROM cnt GROUP BY doc_id) "
        "SELECT cnt.doc_id, CAST(tot.t AS BIGINT) AS n_chars, "
        "CAST(COUNT(*) AS BIGINT) AS n_distinct, "
        "ROUND(" + exact.rsum12_sql("-(cnt.n / tot.t) * LN(cnt.n / tot.t)") + ", 8) "
        "AS entropy_nats "
        "FROM cnt JOIN tot ON cnt.doc_id = tot.doc_id "
        "GROUP BY cnt.doc_id, tot.t ORDER BY entropy_nats, cnt.doc_id"
    ),
    tags=("L23", "L7", "quality"),
)
def l23_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L23: per-document character entropy (nats) — the CCNet-class
    gibberish signal: natural text sits in a narrow entropy band,
    while base64 blobs / key-mash / single-char spam fall far outside
    it and get filtered before training.

    Exactness: each -p·ln p term is rounded to 12 dp then summed in
    DECIMAL(38,12) (exact.rsum12), so the per-doc entropy is
    independent of summation order on both engines. Plan: one explode
    feeds a (doc_id, char)-keyed count (map-side combinable; the char
    alphabet bounds group width), per-doc totals ride the same
    aggregate tree, and the entropy fold is a doc_id-keyed agg —
    linear, two shuffles, no UDFs."""
    docs = T(spark, sf_dir, "documents").withColumn(
        "__nt", norm_text_col("text")
    )
    ch = (
        docs.select("doc_id", F.explode(F.split("__nt", "")).alias("c"))
        .where(F.col("c") != "")
    )
    cnt = ch.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("n"))
    tot = cnt.groupBy("doc_id").agg(F.sum("n").cast("double").alias("t"))
    p = F.col("n") / F.col("t")
    return (
        cnt.join(tot, "doc_id")
        .groupBy("doc_id", "t")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
            F.round(exact.rsum12(-p * F.log(p)), 8).alias("entropy_nats"),
        )
        .select(
            "doc_id",
            F.col("t").cast("long").alias("n_chars"),
            "n_distinct",
            "entropy_nats",
        )
        .orderBy("entropy_nats", "doc_id")
    )


#: Driver-side vocabulary guard for BPE training (the two-phase scalar
#: rule: the pull is vocab-sized, never corpus-sized; above the cap,
#: train on the TOP max_vocab words by frequency — standard practice,
#: rare-tail words still tokenize via the learned merges).
BPE_MAX_VOCAB = 100_000
BPE_N_MERGES = 200


@register("l10b_bpe_token_count", oracle=None, tags=("L10", "L7", "U2"))
def l10b_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10b: REAL byte-pair-encoding token counts (functions/bpe.py,
    Sennrich-style training + GPT-2 merge loop, no tokenizer lib) —
    upgrades l10's regex proxy to learned-subword counts.

    Scale shape: (1) one explode+groupBy builds the word-frequency
    table; (2) the driver trains merges over the TOP-``BPE_MAX_VOCAB``
    vocabulary (ONLY the training pull is capped — bounded driver
    memory, deterministic tie-breaks); (3) a pandas UDF tokenizes
    every DISTINCT word, distributed — rare-tail words outside the
    training cap still tokenize through the learned merges, so
    Python cost is |distinct words|, not |corpus|; (4) the
    (word → n_subtokens) mapping broadcast-joins back to the exploded
    corpus, so the per-occurrence hot path is a JVM hash lookup (at
    web-scale vocabularies, drop the broadcast hint and the join
    shuffles on the word key instead). Rows-only (the training loop
    is not SQL-expressible); semantics pinned in
    tests/test_llm_quality.py against an independent recompute."""
    from pyspark.sql.functions import pandas_udf

    from ipydataclean_spark.functions.bpe import apply_bpe, train_bpe

    docs = T(spark, sf_dir, "documents").withColumn("__toks", tokens_col("text"))
    words = docs.select("doc_id", F.explode("__toks").alias("w"))
    wc = (
        words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(BPE_MAX_VOCAB)
    )
    vocab_counts = {r.w: r.c for r in wc.collect()}
    merges = train_bpe(vocab_counts, BPE_N_MERGES)
    ranks = {m: i for i, m in enumerate(merges)}

    # lambda form: the module's `from __future__ import annotations`
    # stringifies hints, which pandas_udf's hint parser can't resolve
    n_subtokens = pandas_udf(
        lambda w: w.map(lambda x: len(apply_bpe(x, ranks))).astype("int32"),
        "int",
    )
    # apply over ALL distinct words (distributed, not a driver pull):
    # only TRAINING is capped at BPE_MAX_VOCAB — rare-tail words still
    # tokenize through the learned merges instead of being miscounted
    mapping = (
        words.select("w").distinct().select("w", n_subtokens("w").alias("n_sub"))
    )
    return (
        words.join(F.broadcast(mapping), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.coalesce("n_sub", F.lit(1))).cast("long").alias("n_bpe_tokens"),
        )
        .orderBy("doc_id")
    )


#: A published-STYLE merge table (the huggingface/GPT-2 merges.txt
#: convention: rank = position) over the byte-level remapped alphabet
#: (``Ġ`` = leading space). A CONSTANT stands in for the user's real
#: published artifact so the query is deterministic; the code path is
#: identical to loading merges.txt via ``bpe.load_merges`` (pinned in
#: tests/test_bpe_published.py: a file round-trip of THIS table parses
#: to THESE ranks).
L10C_MERGES: tuple[tuple[str, str], ...] = (
    ("Ġ", "t"), ("h", "e"), ("i", "n"), ("e", "r"), ("Ġ", "a"),
    ("o", "n"), ("r", "e"), ("Ġt", "he"), ("e", "n"), ("a", "t"),
    ("o", "r"), ("e", "s"), ("Ġ", "s"), ("Ġ", "w"), ("a", "n"),
    ("Ġ", "o"), ("Ġ", "c"), ("i", "t"), ("o", "u"), ("Ġa", "n"),
    ("a", "l"), ("Ġan", "d"), ("in", "g"), ("e", "d"),
)


@register("l10c_published_token_count", oracle=None, tags=("L10", "L7", "U2"))
def l10c_published_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L10c: token counts under a PUBLISHED merge table with full
    byte-level pre-tokenization (VERDICT r09 #6) — the missing half of
    the published-vocab contract. l10b trains its own merges and
    counts word-level subtokens; THIS query consumes a fixed
    merges-file-style table exactly as a user holding a published
    merges.txt would: GPT-2 pretokenize (contractions / letter /
    number / other runs with the optional leading space), utf-8 ->
    byte-level unicode remap, then the published greedy-rank merge
    loop per pretoken (functions/bpe.py: pretokenize /
    encode_published).

    Scale shape mirrors l10b: pretokenization is one Arrow-batched
    pandas UDF pass (O(corpus chars), map-only); the BPE merge loop
    runs only over DISTINCT pretokens (Zipfian, so |distinct| <<
    |corpus|), and the (pretoken -> n_subtokens) mapping broadcast-
    joins back so the per-occurrence hot path is a JVM hash lookup.
    Rows-only (the merge loop is not SQL-expressible); semantics
    pinned in tests/test_bpe_published.py against an independent
    pure-Python recompute and hand-computed vectors."""
    from pyspark.sql.functions import pandas_udf

    from ipydataclean_spark.functions.bpe import (
        count_published_tokens,
        pretokenize,
    )

    ranks = {m: i for i, m in enumerate(L10C_MERGES)}

    pre_udf = pandas_udf(
        lambda s: s.map(lambda x: pretokenize(x) if isinstance(x, str) else []),
        "array<string>",
    )
    # per-pretoken subtoken count: a pretoken is already one
    # pretokenization unit, so counting IT directly equals the
    # full-pipeline count restricted to that unit
    n_sub = pandas_udf(
        lambda p: p.map(lambda x: count_published_tokens(x, ranks)).astype(
            "int32"
        ),
        "int",
    )
    docs = T(spark, sf_dir, "documents")
    pres = docs.select("doc_id", F.explode(pre_udf("text")).alias("p"))
    mapping = pres.select("p").distinct().select("p", n_sub("p").alias("n_sub"))
    return (
        pres.join(F.broadcast(mapping), "p", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pretokens"),
            F.sum("n_sub").cast("long").alias("n_published_tokens"),
        )
        .orderBy("doc_id")
    )


@register(
    "l24_url_domains",
    oracle=(
        "WITH u AS (SELECT doc_id, "
        "'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR) "
        "|| '?lang=' || lang AS url, lang FROM documents), "
        "p AS (SELECT doc_id, "
        "regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host, "
        "regexp_extract(url, '^[a-z]+://[^/?#]+(/[^?#]*)', 1) AS path, "
        "regexp_extract(url, 'lang=([a-z]+)', 1) AS lang_param, lang FROM u) "
        "SELECT host, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(COUNT(DISTINCT lang_param) AS BIGINT) AS n_langs, "
        "CAST(COUNT_IF(lang_param = lang) AS BIGINT) AS n_param_ok, "
        "MIN(path) AS first_path "
        "FROM p GROUP BY host ORDER BY host"
    ),
    tags=("L24", "L5", "quality"),
)
def l24_url_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L24: URL parsing + per-domain rollup — the host/path/query
    decomposition every web-corpus pipeline runs before domain
    filtering, budget sampling (l20 keys on exactly this host), and
    robots/blocklist joins. URLs are synthesized deterministically
    from the fixture (it ships no URL column), so the parse itself is
    what the oracle checks.

    Plan: pure regexp builtins (whole-stage codegen; Spark's
    parse_url would also work JVM-side but has no DuckDB twin — the
    anchored regexes ARE the cross-engine-portable form), one
    host-keyed partial agg."""
    u = T(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
        ).alias("url"),
    )
    p = u.select(
        "doc_id",
        "lang",
        F.regexp_extract("url", r"^[a-z]+://([^/?#]+)", 1).alias("host"),
        F.regexp_extract("url", r"^[a-z]+://[^/?#]+(/[^?#]*)", 1).alias("path"),
        F.regexp_extract("url", r"lang=([a-z]+)", 1).alias("lang_param"),
    )
    return (
        p.groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.countDistinct("lang_param").alias("n_langs"),
            F.sum((F.col("lang_param") == F.col("lang")).cast("long")).alias("n_param_ok"),
            F.min("path").alias("first_path"),
        )
        .orderBy("host")
    )


_L38_ORACLE = (
    "WITH toks AS (SELECT source, t FROM (SELECT source, "
    "unnest(string_split_regex(lower(text), '[^a-z]+')) AS t FROM documents) u "
    "WHERE t <> ''), "
    "fst AS (SELECT source, t, CAST(COUNT(*) AS BIGINT) AS n_st "
    "FROM toks GROUP BY 1, 2), "
    "ft AS (SELECT t, CAST(SUM(n_st) AS BIGINT) AS n_t FROM fst GROUP BY t), "
    "stot AS (SELECT source, CAST(SUM(n_st) AS BIGINT) AS n_s "
    "FROM fst GROUP BY source), "
    "g AS (SELECT CAST(COUNT(*) AS BIGINT) AS v, "
    "CAST(SUM(n_t) AS BIGINT) AS n FROM ft), "
    "grid AS (SELECT s.source, s.n_s, f.t, f.n_t, g.v, g.n "
    "FROM ft f CROSS JOIN stot s CROSS JOIN g), "
    "terms AS (SELECT grid.source, grid.n_s, "
    "(CAST(COALESCE(x.n_st, 0) AS DOUBLE) + 0.5) "
    "/ (CAST(grid.n_s AS DOUBLE) + 0.5 * CAST(grid.v AS DOUBLE)) AS p, "
    "(CAST(grid.n_t - COALESCE(x.n_st, 0) AS DOUBLE) + 0.5) "
    "/ (CAST(grid.n - grid.n_s AS DOUBLE) + 0.5 * CAST(grid.v AS DOUBLE)) AS q "
    "FROM grid LEFT JOIN fst x ON grid.source = x.source AND grid.t = x.t) "
    "SELECT source, MIN(n_s) AS n_tokens, "
    "ROUND(" + exact.rsum12_sql("p * LN(p / q)") + ", 8) AS kl_vs_rest "
    "FROM terms GROUP BY source ORDER BY source"
)


@register(
    "l38_token_kl_drift",
    oracle=_L38_ORACLE,
    tags=("L38", "L5", "D11", "quality", "drift"),
)
def l38_token_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L38: per-source token-distribution drift — KL(source ‖ rest of
    corpus) over the unigram distribution with add-½ smoothing on the
    SHARED global vocabulary (so both distributions have full support
    and the divergence is finite). This is the corpus-mix monitor a
    training pipeline runs per ingest slice: a source whose token
    distribution diverges from the pool (template spam, wrong
    language, boilerplate) shows a high KL and gets inspected before
    it skews the mix — the distributional upgrade of d11's binned PSI.

    Plan: ONE explode pass → (source, token) partial agg; the token
    marginal, per-source totals, and the (V, N) scalar all derive from
    that table (no second corpus scan). The scoring grid is
    vocab × n_sources — VOCAB-bounded, not corpus-bounded: at 100 TB
    the corpus scan dominates and the grid join (keyed on the token)
    stays partial-aggregable; sources is a broadcast dim.

    Exactness: p and q are ratios of integer counts built with
    identical IEEE expression trees; the libm LN terms round to 12 dp
    before the exact DECIMAL sum (exact.rsum12 — the PSI/entropy
    idiom), then one ROUND(8)."""
    docs = T(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("t")
    ).where(F.col("t") != "")
    fst = toks.groupBy("source", "t").agg(F.count(F.lit(1)).alias("n_st"))
    ft = fst.groupBy("t").agg(F.sum("n_st").cast("long").alias("n_t"))
    stot = fst.groupBy("source").agg(F.sum("n_st").cast("long").alias("n_s"))
    g = ft.agg(
        F.count(F.lit(1)).cast("long").alias("v"),
        F.sum("n_t").cast("long").alias("n"),
    )
    grid = ft.crossJoin(F.broadcast(stot)).crossJoin(F.broadcast(g))
    joined = grid.join(fst, ["source", "t"], "left")
    n_st = F.coalesce(F.col("n_st"), F.lit(0)).cast("double")
    dv = F.col("v").cast("double")
    p = (n_st + F.lit(0.5)) / (F.col("n_s").cast("double") + F.lit(0.5) * dv)
    q = ((F.col("n_t").cast("double") - n_st) + F.lit(0.5)) / (
        (F.col("n").cast("double") - F.col("n_s").cast("double")) + F.lit(0.5) * dv
    )
    return (
        joined.select("source", "n_s", (p * F.log(p / q)).alias("term"))
        .groupBy("source")
        .agg(
            F.min("n_s").alias("n_tokens"),
            F.round(exact.rsum12("term"), 8).alias("kl_vs_rest"),
        )
        .orderBy("source")
    )


_L37_BUCKET_SQL = "CAST(('0x' || substr(md5({t}), 1, 6)) AS BIGINT) % 256"

_L37_SCORES_CTE = (
    "WITH toks AS (SELECT doc_id, lang, "
    + _L37_BUCKET_SQL.format(t="t")
    + " AS b FROM (SELECT doc_id, lang, "
    "unnest(string_split_regex(lower(text), '[^a-z]+')) AS t "
    "FROM documents) u WHERE t <> ''), "
    "fr AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n_r FROM toks GROUP BY b), "
    "ftg AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS n_t FROM toks "
    "WHERE lang = 'en' GROUP BY b), "
    "tot AS (SELECT CAST(SUM(n_r) AS DOUBLE) AS nr, "
    "(SELECT CAST(SUM(n_t) AS DOUBLE) FROM ftg) AS nt FROM fr), "
    "lr AS (SELECT fr.b, ROUND(LN("
    "((CAST(COALESCE(ftg.n_t, 0) AS DOUBLE) + 0.5) / (tot.nt + 128.0)) / "
    "((CAST(fr.n_r AS DOUBLE) + 0.5) / (tot.nr + 128.0))), 4) AS lr "
    "FROM fr LEFT JOIN ftg ON fr.b = ftg.b CROSS JOIN tot), "
    "scores AS (SELECT toks.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens, "
    + exact.dsum_sql("lr.lr")
    + " AS dsir_score FROM toks JOIN lr ON toks.b = lr.b "
    "GROUP BY toks.doc_id)"
)

_L37_ORACLE = (
    _L37_SCORES_CTE + " SELECT doc_id, n_tokens, dsir_score "
    "FROM scores ORDER BY doc_id"
)


@register(
    "l37_dsir_weights",
    oracle=_L37_ORACLE,
    tags=("L37", "L7", "L18", "quality", "sampling"),
)
def l37_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L37: DSIR importance weights — Data Selection via Importance
    Resampling (Xie et al. 2023, public method): score every raw
    document by the log-likelihood ratio of its HASHED n-gram features
    under a target-domain model vs the raw-corpus model; resampling
    raw data proportional to exp(score) yields a corpus distributed
    like the target. Target here = the lang='en' slice; features =
    unigrams hashed into 256 buckets (md5 24-bit prefix mod 256 — the
    cross-engine-deterministic curation.md5_prefix_int rule), add-½
    smoothing on both models.

    Plan: one explode pass feeds the raw and target bucket tables
    (the target agg is a filtered re-aggregation, amortized at scale
    by persisting the bucket counts — the l18 note); the scoring join
    is keyed on a 256-row broadcast table, so scoring is MAP-ONLY over
    the corpus — the shape that lets DSIR sweep 100 TB in one pass.

    Exactness: bucket log-ratios are libm LN rounded to 4 dp FIRST
    (bounded O(1) magnitudes — the l18 idiom), per-doc sums are exact
    decimal; every ratio is built from integer counts with identical
    IEEE trees."""
    return dsir_scores(spark, sf_dir).orderBy("doc_id")


def dsir_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, dsir_score) — l37's scoring pipeline,
    unordered; shared by l37 (readout) and l39 (resampling)."""
    from ipydataclean_spark.operators.curation import md5_prefix_int

    docs = T(spark, sf_dir, "documents")
    toks = (
        docs.select(
            "doc_id", "lang",
            F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("t"),
        )
        .where(F.col("t") != "")
        .select(
            "doc_id", "lang",
            F.pmod(md5_prefix_int(F.col("t")), F.lit(256)).alias("b"),
        )
    )
    fr = toks.groupBy("b").agg(F.count(F.lit(1)).alias("n_r"))
    ftg = (
        toks.where(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n_t"))
    )
    tot = fr.agg(F.sum("n_r").cast("double").alias("nr")).crossJoin(
        ftg.agg(F.sum("n_t").cast("double").alias("nt"))
    )
    pt = (F.coalesce(F.col("n_t"), F.lit(0)).cast("double") + F.lit(0.5)) / (
        F.col("nt") + F.lit(128.0)
    )
    pr = (F.col("n_r").cast("double") + F.lit(0.5)) / (F.col("nr") + F.lit(128.0))
    lr = (
        fr.join(ftg, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select("b", F.round(F.log(pt / pr), 4).alias("lr"))
    )
    return (
        toks.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            exact.dsum("lr").alias("dsir_score"),
        )
    )


_L39_U_SQL = (
    "((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT) "
    "+ 0.5) / 16777216.0)"
)

_L39_ORACLE = (
    _L37_SCORES_CTE + ", keyed AS (SELECT doc_id, n_tokens, dsir_score, "
    "dsir_score + ROUND(-LN(-LN(" + _L39_U_SQL + ")), 4) AS gk "
    "FROM scores) "
    "SELECT doc_id, n_tokens, dsir_score, ROUND(gk, 8) AS gumbel_key "
    "FROM keyed ORDER BY gk DESC, doc_id LIMIT 100"
)


@register(
    "l39_gumbel_resample",
    oracle=_L39_ORACLE,
    tags=("L39", "L37", "R22", "sampling"),
)
def l39_gumbel_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L39: DSIR's RESAMPLING step — weighted sampling WITHOUT
    replacement proportional to exp(dsir_score) via the Gumbel-top-k
    trick (public method: Efraimidis & Spirakis 2006 / Gumbel-max):
    key_i = score_i + Gumbel(u_i), take the top-k keys. The uniform
    u_i is NOT rand() but the md5 24-bit prefix of doc_id mapped to
    (0,1) — deterministic on every engine, run, and cluster size, so
    a resampled training corpus is exactly reproducible AND the draw
    itself is value-hash-checkable (the same discipline as l31/c25's
    md5-threshold sampling, upgraded from Bernoulli to weighted
    without-replacement).

    Plan: l37's map-only scoring pass + one TakeOrderedAndProject
    (top-k needs no global sort). Exactness: the Gumbel noise
    -LN(-LN(u)) is libm, rounded to 4 dp before the single IEEE add
    to the (exact) score; ordering uses the raw key, output rounds
    to 8."""
    from ipydataclean_spark.operators.curation import md5_prefix_int

    scores = dsir_scores(spark, sf_dir)
    u = (md5_prefix_int(F.col("doc_id")) + F.lit(0.5)) / F.lit(16777216.0)
    keyed = scores.withColumn(
        "gk", F.col("dsir_score") + F.round(-F.log(-F.log(u)), 4)
    )
    return (
        keyed.orderBy(F.desc("gk"), "doc_id")
        .limit(100)
        .select(
            "doc_id", "n_tokens", "dsir_score",
            F.round("gk", 8).alias("gumbel_key"),
        )
    )


# ---------------------------------------------------------------------------
# L47 — trained quality classifier (fastText-style linear model over hashed
# n-gram features; the CCNet / GPT-3 quality-filter tier)
# ---------------------------------------------------------------------------

#: hashed feature space (unigram + bigram features share the buckets,
#: the fastText hashing-trick layout)
L47_V = 1024
#: degraded-twin corruption rate (fraction of token positions replaced
#: by gibberish vocab) and gibberish vocab size
L47_NOISE = 0.3
L47_NGIB = 16

_L47_COIN = "doc_id || ':' || pos"

def _l47_train_sql(src: str = "documents", train_pred: str = "doc_id % 2 = 0") -> str:
    """CTE text: fixture -> degraded-twin features -> trained weights
    over corpus table/CTE ``src``, training on rows matching
    ``train_pred`` — the parameterized trainer so inc6's hist-only
    model embeds the SAME SQL (one definition, the _L35_ORACLE
    rule)."""
    return (
        "ex AS MATERIALIZED (SELECT doc_id, "
        "CAST(generate_subscripts(t, 1) AS BIGINT) AS pos, unnest(t) AS tok "
        "FROM (SELECT doc_id, string_split("
        + norm_text_sql("text")
        + f", ' ') AS t FROM {src})), "
        "noisy AS (SELECT doc_id, pos, CASE WHEN ("
        + exact.md5_coin_sql(_L47_COIN, salt="l47n")
        + f") < {L47_NOISE} THEN 'gib' || CAST(("
        + exact.md5_prefix_int_sql(f"'l47g:' || {_L47_COIN}")
        + f") % {L47_NGIB} AS VARCHAR) ELSE tok END AS tok FROM ex), "
        "stream AS (SELECT doc_id, pos, 'clean' AS variant, tok FROM ex "
        "UNION ALL SELECT doc_id, pos, 'noisy' AS variant, tok FROM noisy), "
        "pairs AS (SELECT doc_id, variant, tok, LEAD(tok) OVER "
        "(PARTITION BY doc_id, variant ORDER BY pos) AS nxt FROM stream), "
        "rawf AS (SELECT doc_id, variant, unnest(CASE WHEN nxt IS NULL "
        "THEN ['u:' || tok] ELSE ['u:' || tok, 'b:' || tok || ' ' || nxt] END"
        ") AS feat FROM pairs), "
        "feats AS MATERIALIZED (SELECT doc_id, variant, "
        "CAST(CASE WHEN variant = 'clean' THEN 1 ELSE 0 END AS INTEGER) AS label, ("
        + exact.md5_prefix_int_sql("'l47f:' || feat")
        + f") % {L47_V} AS f FROM rawf), "
        "cnt AS (SELECT f, CAST(COUNT_IF(label = 1) AS BIGINT) AS c1, "
        "CAST(COUNT_IF(label = 0) AS BIGINT) AS c0 "
        f"FROM feats WHERE {train_pred} GROUP BY f), "
        "tot AS (SELECT CAST(COUNT_IF(label = 1) AS BIGINT) AS t1, "
        "CAST(COUNT_IF(label = 0) AS BIGINT) AS t0 "
        f"FROM feats WHERE {train_pred}), "
        f"dom AS (SELECT range AS f FROM range(0, {L47_V})), "
        "w AS MATERIALIZED (SELECT dom.f, "
        "ROUND(LN(2 * COALESCE(c1, 0) + 1) - LN(2 * t1 + "
        f"{L47_V}) - LN(2 * COALESCE(c0, 0) + 1) + LN(2 * t0 + {L47_V}), 12) "
        "AS w FROM dom LEFT JOIN cnt ON dom.f = cnt.f CROSS JOIN tot)"
    )


#: Shared CTE prefix (fixture -> features -> trained weights) — module
#: level so l49's distribution report embeds the SAME training SQL
#: (one definition, the _L35_ORACLE rule).
_L47_CTES = _l47_train_sql()

_L47_ORACLE = (
    "WITH " + _L47_CTES + ", "
    "scored AS (SELECT feats.doc_id, feats.variant, feats.label, "
    "CAST(COUNT(*) AS BIGINT) AS n_feats, "
    + exact.rsum12_sql("w")
    + " AS s FROM feats JOIN w ON feats.f = w.f "
    "WHERE feats.doc_id % 2 = 1 GROUP BY 1, 2, 3) "
    "SELECT doc_id, variant, label, n_feats, s AS score, "
    "CAST(CASE WHEN s > 0 THEN 1 ELSE 0 END AS INTEGER) AS predicted "
    "FROM scored ORDER BY doc_id, variant"
)


def l47_weights(spark: SparkSession, sf_dir: str):
    """The trained L47 weight table (f, w) — exactly ``L47_V`` rows.

    Training is a pure aggregation: Naive-Bayes log-count-ratio
    weights (the NB feature weighting of Wang & Manning 2012, the
    public fastText/CCNet-recipe linear tier) over hashed unigram +
    bigram features, add-1/2 smoothing folded into integer form
    ((c + 0.5) / (T + 0.5 V) = (2c + 1) / (2T + V) — every LN argument
    is an exact integer, cross-engine). Separated out so the scoring
    path and tests can reuse the identical trained model."""
    docs = T(spark, sf_dir, "documents")
    return l47_train(docs, F.col("doc_id") % 2 == 0)


def l47_train(docs: DataFrame, train_pred):
    """(feats, weights) over an arbitrary (doc_id, text) corpus,
    training on rows where ``train_pred`` holds — the Spark twin of
    _l47_train_sql (inc6 trains on the HISTORY slice only and keeps
    the model fixed when deltas arrive)."""
    spark = docs.sparkSession
    feats = _l47_features(docs).localCheckpoint(eager=True)
    train = feats.where(train_pred)
    cnt = train.groupBy("f").agg(
        F.count_if(F.col("label") == 1).alias("c1"),
        F.count_if(F.col("label") == 0).alias("c0"),
    )
    tot = train.agg(
        F.count_if(F.col("label") == 1).alias("t1"),
        F.count_if(F.col("label") == 0).alias("t0"),
    )
    dom = spark.range(0, L47_V).select(F.col("id").alias("f"))
    w = (
        dom.join(cnt, "f", "left")
        .na.fill({"c1": 0, "c0": 0})
        .crossJoin(F.broadcast(tot))
        .select(
            "f",
            F.round(
                F.log(2 * F.col("c1") + 1)
                - F.log(2 * F.col("t1") + L47_V)
                - F.log(2 * F.col("c0") + 1)
                + F.log(2 * F.col("t0") + L47_V),
                12,
            ).alias("w"),
        )
    )
    return feats, w


def _l47_features(docs: DataFrame) -> DataFrame:
    """(doc_id, variant, label, f) hashed-feature occurrences for the
    clean corpus and its deterministically degraded twin, over an
    arbitrary (doc_id, text) frame.

    The degraded twin replaces ``L47_NOISE`` of token positions with a
    16-word gibberish vocabulary, chosen by the md5 coin over
    (doc_id, pos) — reproducible across engines/retries/partitioning,
    the documents_dup fixture discipline. Both variants come out of
    ONE posexplode via an explode-of-two-structs (no second scan)."""
    ex = (
        docs.withColumn("__toks", tokens_col("text"))
        .select("doc_id", F.posexplode("__toks").alias("pos0", "tok"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    )
    key = F.concat(
        F.col("doc_id").cast("string"), F.lit(":"), F.col("pos").cast("string")
    )
    gib = F.concat(
        F.lit("gib"),
        (exact.md5_prefix_int(F.concat(F.lit("l47g:"), key)) % L47_NGIB).cast(
            "string"
        ),
    )
    noisy_tok = F.when(
        exact.md5_coin(key, salt="l47n") < F.lit(L47_NOISE), gib
    ).otherwise(F.col("tok"))
    stream = ex.select(
        "doc_id",
        "pos",
        F.explode(
            F.array(
                F.struct(
                    F.lit("clean").alias("variant"), F.col("tok").alias("tok")
                ),
                F.struct(F.lit("noisy").alias("variant"), noisy_tok.alias("tok")),
            )
        ).alias("s"),
    ).select("doc_id", "pos", "s.variant", "s.tok")
    w_ord = Window.partitionBy("doc_id", "variant").orderBy("pos")
    pairs = stream.withColumn("nxt", F.lead("tok").over(w_ord))
    rawf = pairs.select(
        "doc_id",
        "variant",
        F.explode(
            F.when(
                F.col("nxt").isNull(),
                F.array(F.concat(F.lit("u:"), F.col("tok"))),
            ).otherwise(
                F.array(
                    F.concat(F.lit("u:"), F.col("tok")),
                    F.concat(
                        F.lit("b:"), F.col("tok"), F.lit(" "), F.col("nxt")
                    ),
                )
            )
        ).alias("feat"),
    )
    return rawf.select(
        "doc_id",
        "variant",
        F.when(F.col("variant") == "clean", 1)
        .otherwise(0)
        .cast("int")
        .alias("label"),
        (
            exact.md5_prefix_int(F.concat(F.lit("l47f:"), F.col("feat"))) % L47_V
        ).alias("f"),
    )


@register(
    "l47_quality_classifier",
    oracle=_L47_ORACLE,
    tags=("L47", "L7", "L37", "quality", "classifier"),
)
def l47_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L47: the TRAINED quality-filter tier (verdict r08 #1) — the
    fastText-style linear classifier of the public CCNet / GPT-3
    curation recipes, end-to-end in-Spark and hash-certified: features
    are unigrams + word bigrams hashed into L47_V buckets (hashing
    trick, md5 24-bit prefix — the cross-engine rule), weights are
    Naive-Bayes log-count-ratios (Wang & Manning 2012) with add-1/2
    smoothing in integer form, trained on the even-doc_id split of
    clean docs (label 1) vs their deterministically degraded twins
    (label 0, L47_NOISE gibberish-token injection — shuffled-order
    negatives would be vacuous on this fixture: its text is already
    near-random word salad, measured obs≈expected bigram rates).
    Output: per held-out (odd doc_id) document the score, class
    prediction, and true label — the driver hash certifies TRAINING
    (the weights feed every score) and SCORING in one table.

    Exactness: every LN argument is an exact integer; each weight
    rounds to 12 dp; per-doc sums are DECIMAL (rsum12), order-
    independent, and emitted as RAW doubles — a final ROUND(...,8)
    would sit exactly on the 8-dp half whenever the exact 12-dp sum
    ends in ...5000, where the engines' ROUND disagree (review r09,
    the l49 boundary class).

    At 100 TB: training is one explode + a 1024-key partial agg
    (map-side combine; the feature space, not the corpus, bounds the
    shuffle); scoring joins a 1024-row BROADCAST weight table —
    map-only over the corpus, the shape that lets the filter run as a
    scan-side stage of the ingest pipeline. The bigram window is
    doc_id-partitioned (the same key every per-doc text op shuffles
    on). Only the 2-row totals frame and nothing else crosses to the
    driver."""
    feats, w = l47_weights(spark, sf_dir)
    test = feats.where(F.col("doc_id") % 2 == 1)
    scored = test.join(F.broadcast(w), "f").groupBy(
        "doc_id", "variant", "label"
    ).agg(
        F.count(F.lit(1)).alias("n_feats"),
        exact.rsum12("w").alias("s"),
    )
    return scored.select(
        "doc_id",
        "variant",
        "label",
        "n_feats",
        F.col("s").alias("score"),
        (F.col("s") > 0).cast("int").alias("predicted"),
    ).orderBy("doc_id", "variant")


_L49_ORACLE = (
    "WITH " + _L47_CTES + ", "
    # deployment scoring: every CLEAN doc (train + held-out — the
    # report describes the real corpus; degraded twins were training
    # negatives only)
    "scoredall AS (SELECT feats.doc_id, ("
    + exact.rsum12_sql("w")
    + ") AS score FROM feats JOIN w ON feats.f = w.f "
    "WHERE feats.variant = 'clean' GROUP BY feats.doc_id) "
    "SELECT d.source, d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "(("
    + exact.rsum12_sql("score")
    + ") / CAST(COUNT(*) AS DOUBLE)) AS mean_score, "
    "MIN(score) AS min_score, MAX(score) AS max_score, "
    "(CAST(COUNT_IF(score > 0) AS BIGINT) / CAST(COUNT(*) AS BIGINT)) "
    "AS keep_rate "
    "FROM scoredall JOIN documents d ON d.doc_id = scoredall.doc_id "
    "GROUP BY d.source, d.lang ORDER BY d.source, d.lang"
)


@register(
    "l49_quality_score_distribution",
    oracle=_L49_ORACLE,
    tags=("L49", "L47", "L6", "quality", "report"),
)
def l49_quality_score_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L49: the DEPLOYMENT report for the trained quality filter —
    per (source, lang) slice: doc count, mean/min/max classifier
    score, and the keep rate at the decision threshold (score > 0).
    This is the table a curation run publishes before committing a
    filter: which sources/languages the classifier would gut, and by
    how much (the l6/l45 slice-metrics discipline applied to l47's
    scores). Scores every CLEAN doc — train and held-out alike — since
    the report describes corpus composition, not model validation.

    Exactness: per-doc scores are the l47 pipeline's raw doubles;
    the slice mean is a 12-dp DECIMAL sum (rsum12 — an 8-dp value
    re-rounds to 12 dp exactly, unlike the 6-dp davg cast, which
    half-up/half-even diverges — the d19 lesson) divided once and
    emitted as the RAW double (the davg convention): a final
    ROUND(...,8) flipped on an exact .5 boundary (sum of two 8-dp
    scores / 2 lands on a 9-dp half — the engines' ROUND disagree on
    boundary doubles even given identical input); keep_rate is one
    BIGINT/BIGINT division, same raw-double rule.

    At 100 TB: identical shape to l47 scoring (broadcast 1024-row
    weights, map-only) plus one (source, lang)-keyed partial agg —
    slice count, not corpus size, bounds the output."""
    feats, w = l47_weights(spark, sf_dir)
    scored = (
        feats.where(F.col("variant") == "clean")
        .join(F.broadcast(w), "f")
        .groupBy("doc_id")
        .agg(exact.rsum12("w").alias("score"))
    )
    docs = T(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    return (
        scored.join(docs, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            (
                exact.rsum12("score") / F.count(F.lit(1)).cast("double")
            ).alias("mean_score"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
            (
                F.count_if(F.col("score") > 0) / F.count(F.lit(1))
            ).alias("keep_rate"),
        )
        .orderBy("source", "lang")
    )


def _l47_clean_feat_sql(src: str, p: str) -> str:
    """CTE text: hashed CLEAN-text features (doc_id, f) over corpus
    table/CTE ``src``, CTE names prefixed ``p`` — the scoring-side
    feature extraction the curation composite applies to dedup
    survivors. Same tokenization, gram construction, and md5 bucket
    hash as the training CTEs (_L47_CTES); a drift here would silently
    score in a different feature space."""
    return (
        f"{p}ex AS MATERIALIZED (SELECT doc_id, "
        "CAST(generate_subscripts(t, 1) AS BIGINT) AS pos, unnest(t) AS tok "
        "FROM (SELECT doc_id, string_split("
        + norm_text_sql("text")
        + f", ' ') AS t FROM {src})), "
        f"{p}pairs AS (SELECT doc_id, tok, LEAD(tok) OVER "
        f"(PARTITION BY doc_id ORDER BY pos) AS nxt FROM {p}ex), "
        f"{p}rawf AS (SELECT doc_id, unnest(CASE WHEN nxt IS NULL "
        "THEN ['u:' || tok] ELSE ['u:' || tok, 'b:' || tok || ' ' || nxt] END"
        f") AS feat FROM {p}pairs), "
        f"{p}feats AS MATERIALIZED (SELECT doc_id, ("
        + exact.md5_prefix_int_sql("'l47f:' || feat")
        + f") % {L47_V} AS f FROM {p}rawf)"
    )


def clean_feature_array(toks) -> "F.Column":
    """Feature-string array (unigrams + word bigrams, 'u:'/'b:'
    tagged) from a MATERIALIZED token-array column — THE single
    definition of the l47 scoring feature space (shared by
    l47_clean_features and the st13 streaming fold; a private copy
    drifting would silently score against a model trained in a
    different space — review r09)."""
    unis = F.transform(toks, lambda t: F.concat(F.lit("u:"), t))
    bis = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat(
                F.lit("b:"),
                F.element_at(toks, i),
                F.lit(" "),
                F.element_at(toks, i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(unis, bis)


def l47_clean_features(docs: DataFrame) -> DataFrame:
    """(doc_id, f) hashed clean-text feature occurrences over an
    arbitrary (doc_id, text) frame — the Spark twin of
    _l47_clean_feat_sql, used to score corpora other than the training
    fixture (the curation composite scores dedup survivors; the st13
    streaming filter scores micro-batches).

    MAP-SIDE: unigrams and bigrams come out of per-row array
    transforms over the materialized token array (the l21 bigram
    pattern, clean_feature_array) — no window, no shuffle before the
    explode, so scoring pipelines as a scan-side stage AND the builder
    is legal on a streaming DataFrame (window functions are not). The
    SQL twin keeps its LEAD form; the feature multiset is identical."""
    rawf = (
        docs.withColumn("__toks", tokens_col("text"))
        .select(
            "doc_id",
            F.explode(clean_feature_array(F.col("__toks"))).alias("feat"),
        )
    )
    return rawf.select(
        "doc_id",
        (
            exact.md5_prefix_int(F.concat(F.lit("l47f:"), F.col("feat"))) % L47_V
        ).alias("f"),
    )


# ---------------------------------------------------------------------------
# pipeline_quality_curation — dedup -> trained filter -> perplexity cut
# ---------------------------------------------------------------------------


def _pipeline_quality_oracle() -> str:
    from ipydataclean_spark.operators import dirty
    from ipydataclean_spark.operators.llm_extra import _L18_ORACLE

    return (
        "WITH documents_dup AS (" + dirty.DOCUMENTS_DUP_SQL + "), "
        + _L47_CTES
        + ", keyed AS (SELECT doc_id, text, lang, source, "
        "ROW_NUMBER() OVER (PARTITION BY SHA256("
        + norm_text_sql("text")
        + ") ORDER BY doc_id) AS rn FROM documents_dup), "
        "surv AS MATERIALIZED (SELECT doc_id, text, lang, source "
        "FROM keyed WHERE rn = 1), "
        + _l47_clean_feat_sql("surv", "s")
        + ", scored AS (SELECT sfeats.doc_id, ("
        + exact.rsum12_sql("w")
        + ") AS score FROM sfeats JOIN w ON sfeats.f = w.f "
        "GROUP BY sfeats.doc_id), "
        "lmsc AS MATERIALIZED (SELECT * FROM (" + _L18_ORACLE + ")), "
        "kept AS (SELECT surv.doc_id, surv.lang, surv.source, "
        "lmsc.n_tokens, lmsc.avg_logprob FROM surv "
        "JOIN scored ON scored.doc_id = surv.doc_id "
        "JOIN lmsc ON lmsc.doc_id = surv.doc_id WHERE scored.score > 0), "
        "ranked AS (SELECT *, NTILE(3) OVER (PARTITION BY lang "
        "ORDER BY avg_logprob DESC, doc_id) AS b FROM kept), "
        "fin AS (SELECT * FROM ranked WHERE b <= 2), "
        "raw AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_raw "
        "FROM documents_dup GROUP BY source), "
        "d1 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_after_dedup "
        "FROM surv GROUP BY source), "
        "d2 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_after_quality "
        "FROM kept GROUP BY source), "
        "d3 AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_final, "
        "CAST(SUM(n_tokens) AS BIGINT) AS tokens_final FROM fin GROUP BY source) "
        "SELECT raw.source, n_raw, "
        "COALESCE(n_after_dedup, 0) AS n_after_dedup, "
        "COALESCE(n_after_quality, 0) AS n_after_quality, "
        "COALESCE(n_final, 0) AS n_final, "
        "COALESCE(tokens_final, 0) AS tokens_final "
        "FROM raw LEFT JOIN d1 ON d1.source = raw.source "
        "LEFT JOIN d2 ON d2.source = raw.source "
        "LEFT JOIN d3 ON d3.source = raw.source ORDER BY raw.source"
    )


@register(
    "pipeline_quality_curation",
    oracle=_pipeline_quality_oracle(),
    tags=("L47", "L52", "L1", "pipeline", "curation"),
)
def pipeline_quality_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation COMPOSITE with the trained tier in the loop — the
    published pipeline order (exact dedup FIRST so the classifier and
    LM never score text twice, then the trained quality filter, then
    CCNet's perplexity tail drop): documents_dup → sha256 survivor
    rule (with_dedup_rank, the l1 definition) → l47 NB-classifier
    scores over survivor text with weights TRAINED ON THE MODEL
    FIXTURE (broadcast 1024-row table; score > 0 keeps) → per-lang
    perplexity tertiles over the keepers (l18 scores, l52's NTILE
    policy, tail dropped) → per-source funnel report: raw, after
    dedup, after quality, after perplexity, surviving token total —
    the stage-attrition table a 100 TB run publishes per ingest batch.

    Every stage is the certified operator's own machinery (one
    definition each: with_dedup_rank, l47_weights +
    l47_clean_features, l18's score, l52's tertile rule) and the
    whole funnel is hash-checked end to end.

    At 100 TB: dedup is the digest shuffle; classifier scoring is
    map-only behind a broadcast; the LM join is token-keyed; the
    NTILE is per-language (production swaps in approx thresholds,
    the l52 note); the report aggregation keys on source."""
    from ipydataclean_spark.operators.llm import with_dedup_rank
    from ipydataclean_spark.operators.llm_extra import l18_unigram_logprob
    from ipydataclean_spark.operators.qhelp import documents_dup

    docs = documents_dup(spark, sf_dir)
    surv = (
        with_dedup_rank(docs)
        .where(F.col("rn") == 1)
        .select("doc_id", "text", "lang", "source")
        .localCheckpoint(eager=True)
    )
    _, w = l47_weights(spark, sf_dir)
    scored = (
        l47_clean_features(surv.select("doc_id", "text"))
        .join(F.broadcast(w), "f")
        .groupBy("doc_id")
        .agg(exact.rsum12("w").alias("score"))
    )
    lm = l18_unigram_logprob(spark, sf_dir)
    kept = (
        surv.join(scored, "doc_id")
        .where(F.col("score") > 0)
        .join(lm, "doc_id")
        .select("doc_id", "lang", "source", "n_tokens", "avg_logprob")
        .localCheckpoint(eager=True)
    )
    wnd = Window.partitionBy("lang").orderBy(F.desc("avg_logprob"), "doc_id")
    fin = kept.withColumn("b", F.ntile(3).over(wnd)).where(F.col("b") <= 2)
    raw = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_raw"))
    d1 = surv.groupBy("source").agg(F.count(F.lit(1)).alias("n_after_dedup"))
    d2 = kept.groupBy("source").agg(F.count(F.lit(1)).alias("n_after_quality"))
    d3 = fin.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_final"),
        F.sum("n_tokens").cast("long").alias("tokens_final"),
    )
    out = (
        raw.join(d1, "source", "left")
        .join(d2, "source", "left")
        .join(d3, "source", "left")
        .na.fill({"n_after_dedup": 0, "n_after_quality": 0, "n_final": 0,
                  "tokens_final": 0})
    )
    return out.orderBy("source")


# ---------------------------------------------------------------------------
# INC6 — incremental quality scoring: fixed model, score the delta only
# ---------------------------------------------------------------------------

_INC6_HIST = "doc_id % 4 < 3"
_INC6_DELTA = "doc_id % 4 = 3"


def _inc6_oracle() -> str:
    return (
        "WITH "
        + _l47_train_sql(
            src=f"(SELECT * FROM documents WHERE {_INC6_HIST}) h",
            train_pred="TRUE",
        )
        + ", "
        + _l47_clean_feat_sql("documents", "s")
        + ", scored AS (SELECT sfeats.doc_id, ("
        + exact.rsum12_sql("w")
        + ") AS score FROM sfeats JOIN w ON sfeats.f = w.f "
        "GROUP BY sfeats.doc_id) "
        "SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(COUNT_IF(score > 0) AS BIGINT) AS n_kept, "
        "(" + exact.rsum12_sql("score") + " / CAST(COUNT(*) AS DOUBLE)) "
        "AS mean_score, "
        "MIN(score) AS min_score, MAX(score) AS max_score "
        "FROM scored JOIN documents d ON d.doc_id = scored.doc_id "
        "GROUP BY d.lang ORDER BY d.lang"
    )


@register(
    "inc6_incremental_quality",
    oracle=_inc6_oracle(),
    tags=("INC6", "L47", "incremental", "scale"),
)
def inc6_incremental_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INC6: the quality filter run INCREMENTALLY — the model is a
    1024-row weight table trained ONCE on the history slice and then
    FROZEN; when a delta batch lands, only the delta is tokenized and
    scored (broadcast stored weights, map-only) and its per-doc scores
    are APPENDED to the persisted score store — history text is never
    re-read (the inc-family scan-cost rule applied to l47). The
    corpus-wide quality report then reads the merged store.

    Stored-state discipline kept literal (the inc4b/inc5 proof style):
    weights go to parquet, the scorer reads them BACK from disk, hist
    scores are written, delta scores appended (the append job's
    lineage reads the WEIGHTS path and the delta — never the store it
    writes to, the advice-r08 inc5 rule), and the report's lineage
    starts at the stored table — while the oracle recomputes the SAME
    report from raw text in one shot. Hash equality proves the
    persisted model + appended scores carry full fidelity.

    At 100 TB: per delta batch the cost is |delta| tokenization + a
    broadcast join — corpus-size independent; the report is a
    lang-keyed agg over the compact score store."""
    from ipydataclean_spark.operators.qhelp import scratch_dir

    docs = T(spark, sf_dir, "documents")
    hist = docs.where(F.expr(_INC6_HIST))
    delta = docs.where(F.expr(_INC6_DELTA))

    _, w = l47_train(hist, F.lit(True))
    wpath = scratch_dir(spark, "inc6_weights")
    w.write.mode("overwrite").parquet(wpath)
    stored_w = spark.read.parquet(wpath)

    def score(d: DataFrame) -> DataFrame:
        return (
            l47_clean_features(d.select("doc_id", "text"))
            .join(F.broadcast(stored_w), "f")
            .groupBy("doc_id")
            .agg(exact.rsum12("w").alias("score"))
        )

    spath = scratch_dir(spark, "inc6_scores")
    score(hist).write.mode("overwrite").parquet(spath)
    score(delta).write.mode("append").parquet(spath)

    merged = spark.read.parquet(spath)
    return (
        merged.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("score") > 0).alias("n_kept"),
            (
                exact.rsum12("score") / F.count(F.lit(1)).cast("double")
            ).alias("mean_score"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
        .orderBy("lang")
    )


_L55_ORACLE = (
    "WITH heldout AS (SELECT * FROM (" + _L47_ORACLE + ")), "
    "ranked AS (SELECT label, predicted, "
    "CAST(ROW_NUMBER() OVER (ORDER BY score, label, doc_id, variant) "
    "AS BIGINT) AS r FROM heldout) "
    "SELECT CAST(COUNT_IF(label = 1) AS BIGINT) AS n_pos, "
    "CAST(COUNT_IF(label = 0) AS BIGINT) AS n_neg, "
    "(CAST(SUM(CASE WHEN label = 1 THEN r ELSE 0 END) "
    "- COUNT_IF(label = 1) * (COUNT_IF(label = 1) + 1) // 2 AS BIGINT) "
    "/ CAST(COUNT_IF(label = 1) * COUNT_IF(label = 0) AS BIGINT)) AS auc, "
    "(CAST(COUNT_IF(label = predicted) AS BIGINT) "
    "/ CAST(COUNT(*) AS BIGINT)) AS accuracy "
    "FROM ranked"
)


@register(
    "l55_classifier_auc",
    oracle=_L55_ORACLE,
    tags=("L55", "L47", "quality", "eval"),
)
def l55_classifier_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L55: the quality classifier's ROC AUC on the held-out split —
    the Mann-Whitney rank-sum form (public identity:
    AUC = (Σ ranks of positives − n⁺(n⁺+1)/2) / (n⁺ n⁻)), computed
    over l47's certified held-out score table. Completes the trained
    tier's evaluation story the way l48 did for retrieval: train
    (l47) → deployment report (l49) → threshold-free quality (l55).

    Exactness: ranks come from ROW_NUMBER over the deterministic
    total order (score, label, doc_id, variant) — every quantity in
    the AUC is an exact BIGINT and the result is ONE IEEE division
    (same for accuracy). Tie note: cross-class score ties would make
    row_number-AUC ordering-dependent in general; the deterministic
    tie-break keeps both engines identical regardless, and the
    fixture has no cross-class ties (scores separate by construction).

    At 100 TB: one global rank over the held-out table — the eval
    set, not the corpus, pays the sort (and a production run samples
    its held-out set anyway)."""
    from pyspark.sql import Window

    heldout = l47_quality_classifier(spark, sf_dir)
    w = Window.orderBy("score", "label", "doc_id", "variant")
    ranked = heldout.select(
        "label", "predicted", F.row_number().over(w).cast("long").alias("r")
    )
    n_pos = F.count_if(F.col("label") == 1)
    n_neg = F.count_if(F.col("label") == 0)
    pos_ranksum = F.sum(F.when(F.col("label") == 1, F.col("r")).otherwise(0))
    return ranked.agg(
        n_pos.alias("n_pos"),
        n_neg.alias("n_neg"),
        (
            (pos_ranksum - (n_pos * (n_pos + 1) / 2).cast("long")).cast("long")
            / (n_pos * n_neg).cast("long")
        ).alias("auc"),
        (
            F.count_if(F.col("label") == F.col("predicted"))
            / F.count(F.lit(1))
        ).alias("accuracy"),
    )


# ---------------------------------------------------------------------------
# L56 — tokenizer fertility report (bytes/token, tokens/word per language)
# ---------------------------------------------------------------------------

#: Tokenizer-fertility report: the per-language compression table every
#: multilingual-pretraining recipe publishes (XLM-R app. A, mT5 §3.1 —
#: "fertility" = subword tokens per whitespace word; bytes/token is the
#: byte-level variant ByT5/MegaByte report). Here the certified
#: tokenizer is the regex proxy l10 established ([a-z0-9]+ runs); the
#: from-scratch BPE (l10b) slots into the same report via
#: functions/bpe.py when fertility under a LEARNED vocab is wanted
#: (rows-only there, same shape).
_L56_ORACLE = (
    "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(SUM(LEN(string_split(text, ' '))) AS BIGINT) AS total_words, "
    "CAST(SUM(LEN(regexp_extract_all(LOWER(text), '[a-z0-9]+'))) AS BIGINT) AS total_tokens, "
    "CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes, "
    "(CAST(SUM(LEN(regexp_extract_all(LOWER(text), '[a-z0-9]+'))) AS DOUBLE) "
    "/ SUM(LEN(string_split(text, ' ')))) AS tokens_per_word, "
    "(CAST(SUM(octet_length(encode(text))) AS DOUBLE) "
    "/ SUM(LEN(regexp_extract_all(LOWER(text), '[a-z0-9]+')))) AS bytes_per_token "
    "FROM documents GROUP BY lang ORDER BY lang"
)


@register(
    "l56_token_fertility",
    oracle=_L56_ORACLE,
    tags=("L56", "L10", "text-analysis", "tokenizer"),
)
def l56_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L56: per-language tokenizer fertility — tokens/word and
    bytes/token, the table a multilingual budget plan is costed from
    (a language whose fertility is 2x pays 2x sequence length for the
    same text; byte budgets convert storage TB to token budgets).

    Exactness: every aggregate is a BIGINT sum of per-row BIGINTs
    (counts and octet lengths); the two ratios are ONE IEEE division
    each, so the doubles are bit-identical cross-engine.

    Scale shape: MAP-ONLY per-row arithmetic (regexp_count /
    size(split) / octet_length, all codegen) into one lang-keyed
    partial agg — the same single-shuffle scan-side shape as l10;
    on 100 TB it pipelines with ingest and the shuffle carries only
    (lang, 3 longs) partials."""
    df = T(spark, sf_dir, "documents")
    n_tok = F.regexp_count(F.lower(F.col("text")), F.lit("[a-z0-9]+")).cast("long")
    n_words = F.size(F.split(F.col("text"), " ", -1)).cast("long")
    n_bytes = F.octet_length(F.col("text")).cast("long")
    return (
        df.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_words).alias("total_words"),
            F.sum(n_tok).alias("total_tokens"),
            F.sum(n_bytes).alias("total_bytes"),
            (F.sum(n_tok).cast("double") / F.sum(n_words)).alias("tokens_per_word"),
            (F.sum(n_bytes).cast("double") / F.sum(n_tok)).alias("bytes_per_token"),
        )
        .orderBy("lang")
    )


#: Merge-budget ladder for the fertility sweep. BPE training is
#: greedily prefix-consistent — the first N merges of one 200-merge
#: training ARE the N-merge tokenizer — so ONE training run prices
#: every budget (budget 0 = character tokenizer).
L59_BUDGETS = (0, 25, 50, 200)


@register("l59_bpe_fertility", oracle=None, tags=("L59", "L56", "L10", "tokenizer"))
def l59_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L59: tokenizer fertility vs vocabulary size, per language — the
    real metric l56 proxies with regex tokens: learned-subword tokens
    per word at each merge budget (the published XLM-R/mT5-style
    comparison sweeps vocab size exactly this way; budget 0 is the
    character-tokenizer ceiling, the full budget the trained floor —
    on this fixture 200 merges re-merge the whole synthetic
    vocabulary, so the SWEEP is the non-vacuous readout, not any
    single point). Rows-only: BPE training is iterative (the l10b
    contract); semantics pinned in pytest (fertility non-increasing
    in budget per language; budget-0 equals chars+terminal per word
    exactly).

    Scale shape: l10b's recipe — capped driver-side training, ONE
    distributed pandas pass over DISTINCT words pricing all budgets
    at once (prefix-filtered rank dicts), broadcast map-back, one
    lang-keyed rollup per budget over the same exploded frame."""
    from pyspark.sql.functions import pandas_udf

    from ipydataclean_spark.functions.bpe import apply_bpe, train_bpe

    docs = T(spark, sf_dir, "documents").withColumn("__toks", tokens_col("text"))
    words = docs.select("doc_id", "lang", F.explode("__toks").alias("w"))
    wc = (
        words.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(BPE_MAX_VOCAB)
    )
    vocab_counts = {r.w: r.c for r in wc.collect()}
    merges = train_bpe(vocab_counts, max(L59_BUDGETS))
    rank_ladder = {
        b: {m: i for i, m in enumerate(merges) if i < b} for b in L59_BUDGETS
    }

    mapping = words.select("w").distinct()
    for b in L59_BUDGETS:
        ranks_b = rank_ladder[b]
        n_sub_b = pandas_udf(
            lambda w, _r=ranks_b: w.map(lambda x: len(apply_bpe(x, _r))).astype(
                "int32"
            ),
            "int",
        )
        mapping = mapping.withColumn(f"n_sub_{b}", n_sub_b("w"))

    joined = words.join(F.broadcast(mapping), "w", "left")
    # ONE lang-keyed agg computes every budget's sum, then stack()
    # unpivots to (n_merges, lang) rows — a per-budget union of aggs
    # would rescan the explode+join lineage once per budget (review)
    agg = joined.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("total_words"),
        *[
            F.sum(F.coalesce(f"n_sub_{b}", F.lit(1))).cast("long").alias(f"t_{b}")
            for b in L59_BUDGETS
        ],
    )
    stack = "stack({n}, {args}) AS (n_merges, total_bpe_tokens)".format(
        n=len(L59_BUDGETS),
        args=", ".join(f"CAST({b} AS BIGINT), t_{b}" for b in L59_BUDGETS),
    )
    return (
        agg.select("lang", "total_words", F.expr(stack))
        .select(
            "n_merges",
            "lang",
            "total_words",
            "total_bpe_tokens",
            (F.col("total_bpe_tokens").cast("double") / F.col("total_words")).alias(
                "bpe_tokens_per_word"
            ),
        )
        .orderBy("n_merges", "lang")
    )


_L66_BINS = 10

_L66_ORACLE = (
    "WITH heldout AS (SELECT * FROM (" + _L47_ORACLE + ")), "
    f"binned AS (SELECT label, score, NTILE({_L66_BINS}) "
    "OVER (ORDER BY score, label, doc_id, variant) AS bin FROM heldout) "
    "SELECT CAST(bin AS BIGINT) AS bin, "
    "CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "CAST(COUNT_IF(label = 1) AS BIGINT) AS n_pos, "
    "(CAST(COUNT_IF(label = 1) AS DOUBLE) / COUNT(*)) AS frac_pos, "
    + exact.rsum12_sql("score") + " / COUNT(*) AS mean_score, "
    "MIN(score) AS min_score, MAX(score) AS max_score "
    "FROM binned GROUP BY bin ORDER BY bin"
)


@register(
    "l66_classifier_calibration",
    oracle=_L66_ORACLE,
    tags=("L66", "L55", "L47", "quality", "eval"),
)
def l66_classifier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L66: the quality classifier's RELIABILITY TABLE — held-out
    scores cut into 10 rank deciles, each reporting its positive
    fraction against its score range (the tabular form of a
    calibration/reliability diagram): l55's AUC says the model RANKS
    well; this says where along the score axis the decision threshold
    actually separates — the table a deployment reads to pick a keep
    threshold at a target precision, and the drift check a retrained
    model is compared against.

    Exactness: the decile cut is NTILE over the same deterministic
    total order l55 ranks by (score, label, doc_id, variant); counts
    are BIGINT; frac_pos is ONE IEEE division and mean_score a
    ROUND12-decimal sum then one division — hash-exact cross-engine.

    At 100 TB: the eval set, not the corpus, pays the sort (the l55
    note); production swaps NTILE for approx-quantile bin edges when
    the held-out set itself is huge."""

    heldout = l47_quality_classifier(spark, sf_dir)
    w = Window.orderBy("score", "label", "doc_id", "variant")
    binned = heldout.select(
        "label", "score", F.ntile(_L66_BINS).over(w).alias("bin")
    )
    return (
        binned.groupBy(F.col("bin").cast("long").alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("label") == 1).alias("n_pos"),
            (F.count_if(F.col("label") == 1).cast("double") / F.count(F.lit(1))).alias(
                "frac_pos"
            ),
            (exact.rsum12("score") / F.count(F.lit(1))).alias("mean_score"),
            F.min("score").alias("min_score"),
            F.max("score").alias("max_score"),
        )
        .orderBy("bin")
    )
