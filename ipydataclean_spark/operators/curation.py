"""Corpus-curation continuation ops: C4-style segment-level dedup with
text reassembly (C31) and benchmark decontamination (L26) — the two
classic LLM-training-corpus passes not yet covered by the L1/L2 doc-level
dedup family (SURVEY.md §2.9 extensions; driver brief "Deduplication" /
"Text analysis" first-class ops).

Both are pure-builtin DataFrame plans with hand-written DuckDB oracle
twins over the same `documents_dup` fixture CTE the rest of the L-suite
uses (qhelp.documents_dup / dirty.DOCUMENTS_DUP_SQL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.functions.text import norm_text_col, norm_text_sql
from ipydataclean_spark.operators.llm import shingles_col, shingles_sql, tokens_col
from ipydataclean_spark.operators.qhelp import T, documents_dup, with_documents_dup
from ipydataclean_spark.registry import register

#: Disjoint word-block size for segment-level dedup. 8 words is small
#: enough to catch partial duplication inside otherwise-distinct docs and
#: large enough that natural 8-word repeats are rare.
SEGMENT_WORDS = 8


def segments_col(tokens: F.Column, k: int = SEGMENT_WORDS) -> F.Column:
    """Disjoint k-word segments of a token-array column, in order.

    ``transform(sequence(0, ceil(n/k)-1), i -> array_join(slice(...)))``
    — all builtin higher-order functions, evaluated in codegen; the tail
    segment is simply shorter (slice clamps), matching the DuckDB twin's
    ``w[a:b]`` clamped slice.
    """
    n_seg = F.ceil(F.size(tokens) / F.lit(float(k))).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(tokens, i * k + 1, k), " "),
    )


def segments_sql(text_expr: str, k: int = SEGMENT_WORDS) -> str:
    norm = norm_text_sql(text_expr)
    w = f"string_split({norm}, ' ')"
    return (
        f"list_transform(range(0, CAST(CEIL(len({w})/{k}.0) AS INT)), "
        f"i -> array_to_string({w}[i*{k}+1:i*{k}+{k}], ' '))"
    )


def segment_dedup(docs: DataFrame, k: int = SEGMENT_WORDS) -> DataFrame:
    """C31: cross-document SEGMENT-level exact dedup (the C4 move, at
    k-word-block granularity since the fixture text is single-line):
    every duplicated segment is kept only at its first occurrence —
    ordered by (doc_id, position) — and removed everywhere else, then
    each doc's surviving segments are reassembled in order.

    Scale shape: ONE explode pass builds (doc_id, pos, seg); the keep
    decision is ``min(struct(doc_id, pos))`` per segment — a map-side
    combinable aggregate, NOT a window over segment partitions, so a
    boilerplate segment occurring in 10^7 docs costs one combiner cell
    per task instead of a single-task sort (hot-segment skew-safe). The
    join back is segment-keyed on both sides and reuses that
    clustering; reassembly is one doc_id-keyed shuffle.
    """
    segs = (
        docs.withColumn("__toks", tokens_col("text"))
        .select(
            "doc_id",
            F.posexplode(segments_col(F.col("__toks"), k)).alias("pos0", "seg"),
        )
        .select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "seg")
    )
    owner = segs.groupBy("seg").agg(
        F.min(F.struct("doc_id", "pos")).alias("owner")
    )
    kept = (F.col("doc_id") == F.col("owner.doc_id")) & (
        F.col("pos") == F.col("owner.pos")
    )
    return (
        segs.join(owner, "seg")
        .withColumn("__kept", kept)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(F.col("__kept").cast("long")).alias("n_kept"),
            F.nullif(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(
                                F.when(F.col("__kept"), F.struct("pos", "seg"))
                            )
                        ),
                        lambda s: s["seg"],
                    ),
                    " ",
                ),
                F.lit(""),
            ).alias("kept_text"),
        )
    )


@register(
    "c31_segment_dedup",
    oracle=with_documents_dup(
        ", base AS (SELECT doc_id, "
        + segments_sql("text")
        + " AS segs FROM documents_dup), "
        "seg AS (SELECT doc_id, CAST(generate_subscripts(segs, 1) AS BIGINT) AS pos, "
        "unnest(segs) AS seg FROM base), "
        "ranked AS (SELECT doc_id, pos, seg, "
        "ROW_NUMBER() OVER (PARTITION BY seg ORDER BY doc_id, pos) AS rn FROM seg) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments, "
        "CAST(COUNT_IF(rn = 1) AS BIGINT) AS n_kept, "
        "NULLIF(string_agg(CASE WHEN rn = 1 THEN seg END, ' ' ORDER BY pos), '') "
        "AS kept_text "
        "FROM ranked GROUP BY doc_id ORDER BY doc_id"
    ),
    tags=("C31", "L2", "dedup", "text-analysis"),
)
def c31_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C31 on the dup-injected corpus: the 100 re-cased/padded copies
    normalize to identical segments and are fully stripped (kept_text
    NULL), while partially-overlapping docs lose only the shared blocks.

    Oracle note: the DuckDB twin expresses the same first-occurrence
    rule as ROW_NUMBER() = 1 over (doc_id, pos) order — equivalent to
    the Spark side's min(struct) owner aggregate, which is the form that
    survives hot-segment skew at scale (see segment_dedup).
    """
    return segment_dedup(documents_dup(spark, sf_dir)).orderBy("doc_id")


def contamination_check(
    corpus: DataFrame, benchmark: DataFrame, n: int = 8
) -> DataFrame:
    """L26: benchmark decontamination — for each corpus doc, the number
    and fraction of its distinct word n-grams that also occur in a
    benchmark set (the GPT-3/PaLM-style n-gram-collision test used to
    drop evaluation contamination from training corpora).

    Scale shape: the benchmark side is DISTINCT n-grams of a small
    evaluation suite — explicitly broadcast, so the corpus-side explode
    streams map-side against a hash set with no shuffle of corpus
    grams; the per-doc rollup is the only shuffle (doc_id-keyed).
    """
    bench = (
        benchmark.withColumn("__toks", tokens_col("text"))
        .select(F.explode(shingles_col(F.col("__toks"), n)).alias("g"))
        .distinct()
    )
    corp = (
        corpus.withColumn("__toks", tokens_col("text"))
        .select("doc_id", F.explode(shingles_col(F.col("__toks"), n)).alias("g"))
    )
    return (
        corp.join(F.broadcast(bench.withColumn("__hit", F.lit(1))), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count("__hit").alias("n_hit"),
        )
        .where(F.col("n_hit") > 0)
        .select(
            "doc_id",
            "n_grams",
            "n_hit",
            F.round(
                F.col("n_hit").cast("double") / F.col("n_grams").cast("double"), 8
            ).alias("contamination_frac"),
        )
    )


@register(
    "l26_contamination_check",
    oracle=with_documents_dup(
        ", bench AS (SELECT DISTINCT unnest("
        + shingles_sql("text", n=8)
        + ") AS g FROM documents_dup WHERE doc_id % 5 = 0 AND doc_id < 1000000), "
        "corp AS (SELECT doc_id, unnest("
        + shingles_sql("text", n=8)
        + ") AS g FROM documents_dup "
        "WHERE NOT (doc_id % 5 = 0 AND doc_id < 1000000)) "
        "SELECT corp.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, "
        "CAST(COUNT_IF(bench.g IS NOT NULL) AS BIGINT) AS n_hit, "
        "ROUND(CAST(COUNT_IF(bench.g IS NOT NULL) AS DOUBLE) / "
        "CAST(COUNT(*) AS DOUBLE), 8) AS contamination_frac "
        "FROM corp LEFT JOIN bench ON corp.g = bench.g "
        "GROUP BY corp.doc_id HAVING COUNT_IF(bench.g IS NOT NULL) > 0 "
        "ORDER BY corp.doc_id"
    ),
    tags=("L26", "L2", "text-analysis"),
)
def l26_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L26 over the dup-injected corpus: benchmark = every 5th original
    doc; corpus = the rest (including the injected re-cased copies of
    the benchmark docs, which surface at contamination_frac ≈ 1.0 —
    plus the fixture's natural near-dups at ≥ 0.8).

    shingles_col n=8 arrays are list_distinct on both sides, so n_grams
    counts DISTINCT per-doc grams — identical denominators.
    """
    dd = documents_dup(spark, sf_dir)
    is_bench = (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 1000000)
    return contamination_check(dd.filter(~is_bench), dd.filter(is_bench)).orderBy(
        "doc_id"
    )


# ---------------------------------------------------------------------------
# L44 — broadcast-bloom decontamination (the no-shuffle scale path)
# ---------------------------------------------------------------------------

_BLOOM_M = 1 << 16   #: bloom bits (1024 BIGINT words)
_BLOOM_K = 3         #: hash functions (salted md5 prefixes)


def _bloom_pos(g, j: int):
    """Bloom position j for gram column ``g``: 24-bit md5 prefix of the
    'b{j}:'-salted gram, mod _BLOOM_M — built on the single-sourced
    md5_prefix_int pair (the one-definition coin rule; grams are never
    NULL here, so NULL-propagating concat is moot but consistent)."""
    from ipydataclean_spark.functions.exact import md5_prefix_int

    return md5_prefix_int(F.concat(F.lit(f"b{j}:"), g)) % _BLOOM_M


def _bloom_pos_sql(expr: str, j: int) -> str:
    from ipydataclean_spark.functions.exact import md5_prefix_int_sql

    salted = f"'b{j}:' || ({expr})"
    return f"({md5_prefix_int_sql(salted)} % {_BLOOM_M})"


def bloom_bits_df(spark: SparkSession, positions: list[int]) -> DataFrame:
    """Pack set positions into the 1024-word bitset and return it as a
    ONE-ROW frame (broadcast as a column, never as 1024 literal
    expressions — the l3b janino cliff). ONE definition of the word
    packing + two's-complement wrap, shared by l44 and inc5 (review
    r08 third pass: the block had been restated)."""
    words = [0] * (_BLOOM_M // 64)
    for p in positions:
        words[p // 64] |= 1 << (p % 64)
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    return spark.createDataFrame([(words,)], "bits array<bigint>")


def bloom_hit_col(g) -> F.Column:
    """All-k-positions-set test for gram column ``g`` against the
    broadcast ``bits`` column — the single definition of the probe's
    bit arithmetic (element_at word, bit_get)."""
    tests = []
    for j in range(_BLOOM_K):
        p = _bloom_pos(g, j)
        word = F.element_at("bits", (p / 64).cast("int") + 1)
        tests.append(F.bit_get(word, (p % 64).cast("int")) == 1)
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return out


_L44_BENCH_PRED = "doc_id % 5 = 0 AND doc_id < 1000000"


def _l44_oracle() -> str:
    pos_cols = ", ".join(f"{_bloom_pos_sql('g', j)} AS p{j}" for j in range(_BLOOM_K))
    set_union = " UNION ".join(
        f"SELECT DISTINCT {_bloom_pos_sql('g', j)} AS p FROM bench"
        for j in range(_BLOOM_K)
    )
    joins = " ".join(
        f"LEFT JOIN setpos s{j} ON s{j}.p = pos.p{j}" for j in range(_BLOOM_K)
    )
    hit = " AND ".join(f"s{j}.p IS NOT NULL" for j in range(_BLOOM_K))
    return with_documents_dup(
        ", bench AS MATERIALIZED (SELECT DISTINCT unnest("
        + shingles_sql("text", n=8)
        + f") AS g FROM documents_dup WHERE {_L44_BENCH_PRED}), "
        f"setpos AS MATERIALIZED ({set_union}), "
        "exact AS MATERIALIZED (SELECT g FROM bench), "
        "corp AS (SELECT doc_id, unnest("
        + shingles_sql("text", n=8)
        + ") AS g FROM documents_dup "
        f"WHERE NOT ({_L44_BENCH_PRED})), "
        f"pos AS (SELECT doc_id, g, {pos_cols} FROM corp), "
        f"hits AS (SELECT pos.doc_id, ({hit}) AS bloom_hit, "
        "exact.g IS NOT NULL AS exact_hit "
        f"FROM pos {joins} LEFT JOIN exact ON exact.g = pos.g) "
        "SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams, "
        "CAST(COUNT_IF(exact_hit) AS BIGINT) AS n_exact_hits, "
        "CAST(COUNT_IF(bloom_hit) AS BIGINT) AS n_bloom_hits, "
        "COUNT_IF(bloom_hit) > 0 AS flagged "
        "FROM hits GROUP BY doc_id ORDER BY doc_id"
    )


@register("l44_bloom_decontaminate", oracle=_l44_oracle(), tags=("L26", "L44", "scale"))
def l44_bloom_decontaminate(
    spark: SparkSession, sf_dir: str, include_exact: bool = True
) -> DataFrame:
    """L44: benchmark decontamination via a BROADCAST BLOOM BITSET —
    the no-shuffle scale path next to l26's exact gram join. l26
    broadcasts the distinct benchmark 8-gram STRINGS (fine while they
    fit); at 100 TB of corpus against a large eval suite the
    Spark-first shape is: fold the benchmark grams into a fixed
    2^16-bit bloom filter (k=3 salted md5 positions — one bounded agg
    over the SMALL side), ship 8 KB to every task, and probe each
    corpus gram MAP-SIDE with three bit tests — the corpus never
    shuffles and the broadcast payload is constant in benchmark size.

    Output keeps the exact join alongside (n_exact_hits vs
    n_bloom_hits), so the operator doubles as its own false-positive
    audit: bloom hits superset exact hits by construction, and the gap
    IS the FP rate a deployment sizes m/k against. Flagged docs are
    bloom-flagged (the production decision: a bloom-flagged doc is
    dropped or exact-checked downstream).

    Exactness: the oracle replays the BITSET semantics (a gram is a
    bloom hit iff all k salted positions are set by ANY benchmark
    gram) as three position joins — false positives and all — so the
    driver hash certifies the filter's actual behavior, not an
    idealized one. Bit arithmetic is integer-only.

    Build phase is a bounded two-phase pattern: distinct set positions
    (≤ 2^16 ints) collect to the driver, pack into 1024 BIGINT words,
    and re-enter the plan as a one-row broadcast COLUMN — never as
    1024 literal expressions (the l3b janino codegen cliff).

    ``include_exact=False`` drops the exact-join audit columns
    (n_exact_hits) and with them the benchmark-gram-string broadcast —
    the knob for the production path, where that broadcast grows with
    the benchmark suite while the bloom payload stays 8 KB. At fixture
    scales the audit is nearly free (sf1: 5.4 s either way once the
    token column is materialized — see the __toks note below); the
    knob matters when the BENCHMARK side is large. The registered/
    oracle form keeps the audit (the FP readout is the point)."""
    dd = documents_dup(spark, sf_dir)
    is_bench = F.expr(_L44_BENCH_PRED)
    # __toks MUST be a materialized column before shingles_col sees it:
    # inlining tokens_col into the shingle transform re-evaluates the
    # token split PER SHINGLE via CollapseProject (the gram3_hash_table
    # trap — measured 320 s vs 9 s for the sf1 corpus gram explode)
    # materialized once: bench_grams feeds the positions collect AND
    # (include_exact) the exact-join broadcast — without the
    # checkpoint the benchmark tokenize/shingle/distinct subtree
    # executes twice (review r08)
    bench_grams = (
        dd.where(is_bench)
        .withColumn("__toks", tokens_col("text"))
        .select(F.explode(shingles_col(F.col("__toks"), 8)).alias("g"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    pos_union = None
    for j in range(_BLOOM_K):
        p = bench_grams.select(_bloom_pos(F.col("g"), j).alias("p"))
        pos_union = p if pos_union is None else pos_union.unionByName(p)
    # bounded: at most _BLOOM_M distinct positions (8 KB of bits)
    positions = [r.p for r in pos_union.distinct().collect()]
    bits_df = bloom_bits_df(spark, positions)

    corp = (
        dd.where(~is_bench)
        .withColumn("__toks", tokens_col("text"))
        .select("doc_id", F.explode(shingles_col(F.col("__toks"), 8)).alias("g"))
    )
    probe = corp.crossJoin(F.broadcast(bits_df))
    flagged_probe = probe.withColumn("bloom_hit", bloom_hit_col(F.col("g")))
    if not include_exact:
        return (
            flagged_probe.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_grams"),
                F.count_if(F.col("bloom_hit")).alias("n_bloom_hits"),
                (F.count_if(F.col("bloom_hit")) > 0).alias("flagged"),
            )
            .orderBy("doc_id")
        )
    exact = bench_grams.withColumn("__exact", F.lit(1))
    return (
        flagged_probe.join(F.broadcast(exact), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.count_if(F.col("__exact").isNotNull()).alias("n_exact_hits"),
            F.count_if(F.col("bloom_hit")).alias("n_bloom_hits"),
            (F.count_if(F.col("bloom_hit")) > 0).alias("flagged"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# L27 — content-defined chunking (shift-resistant dedup units)
# ---------------------------------------------------------------------------

CDC_WINDOW = 16      #: rolling-hash window (bytes)
CDC_MASK = 0x3F      #: boundary when (h & mask) == 0 -> ~64-byte avg chunks
CDC_MIN, CDC_MAX = 32, 256


def cdc_chunks(text: str, window: int = CDC_WINDOW, mask: int = CDC_MASK,
               lo: int = CDC_MIN, hi: int = CDC_MAX) -> list[str]:
    """Split text at CONTENT-DEFINED boundaries: a polynomial rolling
    hash over the trailing ``window`` bytes declares a cut wherever
    (hash & mask) == 0, clamped to [lo, hi] chunk sizes (the
    Rabin/FastCDC scheme backing dedup storage systems). Because
    boundaries depend only on local content, inserting or deleting a
    prefix shifts NO downstream boundary — unlike fixed-size blocks,
    where one inserted byte re-keys every later block. Pure-python
    per-doc kernel (runs inside an Arrow-batched map; O(len) per doc,
    no state across docs)."""
    data = text.encode("utf-8")
    n = len(data)
    if n == 0:
        return []
    B, M = 257, (1 << 61) - 1  # polynomial base / Mersenne modulus
    pw = pow(B, window - 1, M)
    out, start, h = [], 0, 0
    for i, byte in enumerate(data):
        h = (h * B + byte) % M
        if i - start + 1 > window:
            h = (h - data[i - window] * pw * B) % M
        size = i - start + 1
        if (size >= lo and (h & mask) == 0) or size >= hi:
            out.append(data[start : i + 1].decode("utf-8", "surrogateescape"))
            start, h = i + 1, 0
    if start < n:
        out.append(data[start:].decode("utf-8", "surrogateescape"))
    return out


def chunked_docs(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, chunk_hash, chunk_len): one Arrow-batched
    narrow map; chunk identity = sha256 of the chunk text."""
    from collections.abc import Iterator as _It

    def kernel(batches: "_It[pd.DataFrame]") -> "_It[pd.DataFrame]":
        import hashlib

        import pandas as _pd

        for pdf in batches:
            rows = {"doc_id": [], "chunk_idx": [], "chunk_hash": [], "chunk_len": []}
            for r in pdf.itertuples():
                for i, c in enumerate(cdc_chunks(r.text or "")):
                    rows["doc_id"].append(r.doc_id)
                    rows["chunk_idx"].append(i)
                    rows["chunk_hash"].append(
                        hashlib.sha256(c.encode("utf-8", "surrogateescape")).hexdigest()[:16]
                    )
                    rows["chunk_len"].append(len(c))
            yield _pd.DataFrame(rows)

    import pandas as pd  # noqa: F401  (kernel closure)

    return docs.select("doc_id", "text").mapInPandas(
        kernel,
        schema="doc_id BIGINT, chunk_idx INT, chunk_hash STRING, chunk_len INT",
    )


@register(
    "l27_cdc_chunk_dedup",
    oracle=None,  # the rolling-hash boundary rule is not SQL-expressible
    tags=("L27", "L2", "dedup", "text-analysis"),
)
def l27_cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L27: chunk-level dedup over content-defined boundaries — docs
    normalized (C17) then split into ~64-byte shift-resistant chunks,
    chunk hashes deduplicated corpus-wide, per-doc dedup ratio reported (the
    storage-dedup view of the corpus: a near-copy with an inserted
    prefix still shares almost all its chunks, which FIXED blocks
    would all miss — invariance pinned in tests/test_curation.py).
    Plan: narrow chunking map → one chunk_hash-keyed partial-agg
    shuffle → doc_id rollup. Rows-only by design."""
    from pyspark.sql import Window  # noqa: F401

    from ipydataclean_spark.functions.text import norm_text_col

    ch = chunked_docs(
        documents_dup(spark, sf_dir).select(
            "doc_id", norm_text_col("text").alias("text")
        )
    )
    freq = ch.groupBy("chunk_hash").agg(F.count(F.lit(1)).alias("n_copies"))
    return (
        ch.join(freq, "chunk_hash")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum((F.col("n_copies") > 1).cast("long")).alias("n_shared"),
            F.round(
                F.sum((F.col("n_copies") > 1).cast("long")).cast("double")
                / F.count(F.lit(1)),
                8,
            ).alias("shared_ratio"),
        )
        .orderBy("doc_id")
    )


# The l27 chunking kernel references this module's cdc_chunks from a
# worker-side closure — register the module for cloudpickle BY-VALUE
# pickling so executors never need ipydataclean_spark importable
# (same rule as media_codecs / functions.bpe).
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])


def temperature_thresholds(counts: "DataFrame", budget: float) -> "DataFrame":
    """(source, n) -> (source, n, th): per-source integer keep-thresholds
    for a τ=0.5 temperature mix — weights √n/Σ√n of ``budget`` docs,
    converted to ⌊rate·16^6⌋ so the md5-prefix probe is an integer
    comparison on both engines (shared by l31 and pipeline_lm_dataset;
    √ because IEEE mandates correct rounding for sqrt, not pow)."""
    wt = counts.select(
        "source", "n",
        F.round(F.sqrt(F.col("n").cast("double")), 8)
        .cast("decimal(28,8)").alias("w"),
    )
    tot = wt.agg(F.sum("w").cast("double").alias("tw"))
    return wt.crossJoin(F.broadcast(tot)).select(
        "source", "n",
        F.floor(
            F.least(
                F.lit(1.0),
                (F.lit(float(budget)) * F.col("w").cast("double") / F.col("tw"))
                / F.col("n").cast("double"),
            )
            * F.lit(16777216.0)
        ).cast("long").alias("th"),
    )


# canonical home: functions/exact.py (the Spark-form + _sql-twin module);
# re-exported here because every curation-era call site imports from
# this module
from ipydataclean_spark.functions.exact import (  # noqa: E402,F401
    md5_prefix_int,
    md5_prefix_int_sql,
)



@register(
    "l31_source_temperature_mix",
    oracle=(
        "WITH cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n "
        "FROM documents GROUP BY source), "
        "wt AS (SELECT source, n, CAST(ROUND(SQRT(CAST(n AS DOUBLE)), 8) "
        "AS DECIMAL(28,8)) AS w FROM cnt), "
        "tot AS (SELECT CAST(SUM(w) AS DOUBLE) AS tw FROM wt), "
        "thr AS (SELECT source, n, "
        "CAST(FLOOR(LEAST(1.0, (300.0 * CAST(w AS DOUBLE) / tw) "
        "/ CAST(n AS DOUBLE)) * 16777216.0) AS BIGINT) AS t "
        "FROM wt CROSS JOIN tot), "
        "tagged AS (SELECT d.source, "
        "CAST(('0x' || substr(md5(CAST(d.doc_id AS STRING)), 1, 6)) AS BIGINT) "
        "AS h, thr.t, thr.n FROM documents d JOIN thr ON d.source = thr.source) "
        "SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs, "
        "CAST(COUNT_IF(h < t) AS BIGINT) AS n_sampled "
        "FROM tagged GROUP BY source ORDER BY source"
    ),
    tags=("L31", "C32", "sampling", "curation"),
)
def l31_source_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L31: temperature-based SOURCE REBALANCING — the training-mix
    step that upsamples rare sources and downsamples dominant ones
    (the τ-weighting used by multilingual/multi-source LM data
    recipes, e.g. w_s ∝ n_s^τ): with τ = 0.5, each source's share of
    the 300-doc target budget is √n_s / Σ√n, converted to a per-source
    keep-rate and applied as a DETERMINISTIC md5 threshold on doc_id
    (the c32 technique — reproducible at any cluster size, new docs
    never reshuffle old picks).

    Cross-engine exactness: √ is correctly-rounded per IEEE 754 (libm
    pow would NOT be — the reason τ is expressed as SQRT, not
    POWER(n, 0.5)); the weights are rounded to 8 dp and summed in
    DECIMAL so the normalizing total is order-independent; the
    keep-rate becomes an INTEGER threshold (⌊rate·16^6⌋) compared
    against the hex-parsed md5 prefix — both engines do the identical
    integer comparison, no float boundary can flip a row. Plan: one
    count agg (tiny, broadcast back), one map-only tag pass, one
    rollup — no shuffle of the corpus beyond the count."""
    docs = T(spark, sf_dir, "documents")
    cnt = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    thr = temperature_thresholds(cnt, budget=300.0)
    tagged = docs.join(F.broadcast(thr), "source").select(
        "source", md5_prefix_int(F.col("doc_id")).alias("h"), "th", "n"
    )
    return (
        tagged.groupBy("source")
        .agg(
            F.max("n").alias("n_docs"),
            F.count_if(F.col("h") < F.col("th")).alias("n_sampled"),
        )
        .orderBy("source")
    )


_PIPE_SH8 = shingles_sql("t", n=8)


@register(
    "pipeline_lm_dataset",
    oracle=with_documents_dup(
        ", base AS (SELECT doc_id, source, " + norm_text_sql("text")
        + " AS t FROM documents_dup), "
        "q AS (SELECT doc_id, source, t, string_split(t, ' ') AS tk FROM base "
        "WHERE LENGTH(t) >= 100 AND LEN(string_split(t, ' ')) >= 20), "
        "dd AS (SELECT doc_id, source, t, tk FROM ("
        "SELECT q.*, ROW_NUMBER() OVER (PARTITION BY md5(t) ORDER BY doc_id) "
        "AS rn FROM q) WHERE rn = 1), "
        "bench AS (SELECT DISTINCT unnest(" + _PIPE_SH8 + ") AS g "
        "FROM (SELECT " + norm_text_sql("text") + " AS t FROM documents_dup "
        "WHERE doc_id % 5 = 0 AND doc_id < 1000000)), "
        "hits AS (SELECT DISTINCT doc_id FROM "
        "(SELECT doc_id, unnest(" + _PIPE_SH8 + ") AS g FROM dd) cg "
        "JOIN bench USING (g)), "
        "clean AS (SELECT * FROM dd WHERE doc_id NOT IN (SELECT doc_id FROM hits)), "
        "cnt AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM clean GROUP BY source), "
        "wt AS (SELECT source, n, CAST(ROUND(SQRT(CAST(n AS DOUBLE)), 8) "
        "AS DECIMAL(28,8)) AS w FROM cnt), "
        "tot AS (SELECT CAST(SUM(w) AS DOUBLE) AS tw FROM wt), "
        "thr AS (SELECT source, CAST(FLOOR(LEAST(1.0, (200.0 * CAST(w AS DOUBLE) "
        "/ tw) / CAST(n AS DOUBLE)) * 16777216.0) AS BIGINT) AS th "
        "FROM wt CROSS JOIN tot), "
        "mixed AS (SELECT clean.* FROM clean JOIN thr ON clean.source = thr.source "
        "WHERE CAST(('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 6)) AS BIGINT) "
        "< thr.th) "
        "SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, "
        "CAST(SUM(LEN(tk)) AS BIGINT) AS n_tokens, "
        "ROUND(CAST(SUM(LEN(tk)) AS DOUBLE) / COUNT(*), 8) AS avg_tokens "
        "FROM mixed GROUP BY source ORDER BY source"
    ),
    tags=("L1", "L7", "L26", "L31", "pipeline", "curation"),
)
def pipeline_lm_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END training-data pipeline as ONE composed lazy plan —
    the sequence a real LM data build runs, each stage an operator
    this repo verifies individually, here hash-verified THROUGH the
    composition:

        quality gate (≥100 chars, ≥20 tokens)
      → exact dedup (keep min doc_id per normalized-text md5)
      → benchmark decontamination (drop docs sharing any 8-gram with
        the held-out benchmark slice — the l26 anti-join)
      → temperature source mixing (τ=0.5 budget of 200 docs, the l31
        deterministic md5-threshold sample)
      → per-source dataset card (docs, token counts).

    Scale shape by stage: the gates are map-only; dedup shuffles a
    16-byte digest key; the decontamination bench side is DISTINCT
    benchmark grams broadcast to the corpus explode (no corpus-gram
    shuffle), the hit-list anti-join is doc_id-keyed; mixing needs
    one source-count agg broadcast back as integer thresholds; the
    card is a final tiny rollup. Catalyst fuses the map stages — the
    corpus text is scanned once."""
    from pyspark.sql import Window

    dd_all = documents_dup(spark, sf_dir)
    base = dd_all.select(
        "doc_id", "source", norm_text_col("text").alias("t")
    )
    q = base.withColumn("tk", F.split("t", " ")).where(
        (F.length("t") >= 100) & (F.size("tk") >= 20)
    )
    # Optimization round 12 (guide §2.3): only size(tk) is ever read
    # above the dedup window — pre-reduce the token array to a scalar
    # so the window exchange carries (doc_id, source, t, n_tk) instead
    # of the full array (t itself must survive: the decontamination
    # gram explode runs on dedup survivors).
    slim = q.select("doc_id", "source", "t", F.size("tk").alias("n_tk"))
    w = Window.partitionBy(F.md5("t")).orderBy("doc_id")
    dd = slim.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1).drop("rn")

    bench = dd_all.where(
        (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 1000000)
    ).select("doc_id", "text")
    # contamination_check returns exactly the docs with >=1 shared
    # gram (HAVING hits > 0) — the drop list
    hits = contamination_check(
        dd.select("doc_id", F.col("t").alias("text")), bench
    ).select("doc_id")
    # Optimization round 12 (guide §3.3 — materialize an intermediate
    # to truncate the plan): `clean` feeds TWO consumers (the
    # source-count threshold leg and the final mixed card), and each
    # leg's separate column pruning made Catalyst plan the whole
    # quality→dedup→decontamination subtree per leg with no exchange
    # reuse — the corpus was scanned and dedup-shuffled three times
    # (plan-verified: three copies of the window subtree). Projected
    # down to (doc_id, source, n_tk) — text is not needed past the
    # decontamination join — the materialization computes that tiny
    # table once; both legs re-read it.
    #
    # Round 13 (VERDICT r12 #1 "what's wrong"): persist instead of the
    # r12 lazy localCheckpoint. localCheckpoint TRUNCATES lineage and
    # stores blocks executor-local/unreplicated, so on a real cluster
    # losing one executor mid-query kills the whole query (no recompute
    # path). persist keeps the lineage — a lost cache block is
    # recomputed from the subtree — while still deduplicating the two
    # consumer legs through the cache (both legs reference this exact
    # analyzed plan, so CacheManager replaces the subtree in each).
    # A/B at sf0.1 (min-of-5, same session): localCheckpoint 2.25 s,
    # persist 1.99 s, scratch-parquet round-trip 2.06 s — persist is
    # the fastest variant, and of the two cluster-safe ones (persist,
    # scratch parquet) the only lazy one.
    from pyspark.storagelevel import StorageLevel

    clean = (
        dd.join(hits, "doc_id", "left_anti")
        .select("doc_id", "source", "n_tk")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    cnt = clean.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    thr = temperature_thresholds(cnt, budget=200.0).drop("n")
    mixed = clean.join(F.broadcast(thr), "source").where(
        md5_prefix_int(F.col("doc_id")) < F.col("th")
    )
    return (
        mixed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col("n_tk").cast("long")).alias("n_tokens"),
            F.round(
                F.sum(F.col("n_tk").cast("long")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                8,
            ).alias("avg_tokens"),
        )
        .orderBy("source")
    )


@register(
    "l33_shuffle_shards",
    oracle=(
        "WITH h AS (SELECT doc_id, "
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 15)) "
        "AS BIGINT) AS hv FROM documents) "
        "SELECT doc_id, CAST(hv % 8 AS INT) AS shard, "
        "CAST(ROW_NUMBER() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) "
        "AS BIGINT) AS pos "
        "FROM h ORDER BY shard, pos"
    ),
    tags=("L33", "curation", "training-prep"),
)
def l33_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L33: deterministic global training shuffle — assign every doc a
    (shard, position) from a seeded pseudo-random permutation, the
    materialized equivalent of a training dataloader's epoch shuffle.
    Hash-based (md5 of doc_id + epoch salt, 60-bit BIGINT identical in
    both engines), so the permutation is REPRODUCIBLE from the key
    alone: any worker can recompute its shard without coordination,
    re-runs are byte-stable, and a different epoch salt yields an
    independent permutation (``shuffle_shards(..., epoch=n)``).

    Plan: one map pass computes the hash; the only shuffle is the
    shard partition itself; within-shard order is a shard-partitioned
    window (8-way parallel here). At 100 TB this is exactly the
    layout-producing write — ``partitionBy(shard)`` +
    ``sortWithinPartitions(hv)`` — and a shard that outgrows one task
    swaps the window for the distributed-rank pattern
    (functions/ranking.py) the rfm/pareto queries already use; the
    hash assignment itself never needs more than map-side work."""
    return shuffle_shards(spark, sf_dir, n_shards=8, epoch=0)


def shuffle_shards(
    spark: SparkSession, sf_dir: str, n_shards: int = 8, epoch: int = 0
) -> DataFrame:
    from pyspark.sql import Window

    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(f":{epoch}"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    h = T(spark, sf_dir, "documents").select("doc_id", hv.alias("hv"))
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    return (
        h.select(
            "doc_id",
            F.pmod(F.col("hv"), F.lit(n_shards)).cast("int").alias("shard"),
            "hv",
        )
        .select(
            "doc_id", "shard",
            F.row_number().over(w).cast("long").alias("pos"),
        )
        .orderBy("shard", "pos")
    )


@register(
    "l34_sequence_pack",
    oracle=(
        "WITH h AS (SELECT doc_id, "
        "CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':0'), 1, 15)) "
        "AS BIGINT) AS hv, "
        "CAST(len(string_split_regex(TRIM(text), '[ \\t\\n\\x0B\\f\\r]+')) AS BIGINT) AS n_tok "
        "FROM documents WHERE text IS NOT NULL AND TRIM(text) <> ''), "
        "sh AS (SELECT doc_id, hv, n_tok, CAST(hv % 8 AS INT) AS shard FROM h), "
        "cum AS (SELECT doc_id, shard, n_tok, "
        "SUM(n_tok) OVER (PARTITION BY shard ORDER BY hv, doc_id "
        "ROWS UNBOUNDED PRECEDING) AS cum_tok FROM sh) "
        "SELECT doc_id, shard, n_tok, "
        "CAST(FLOOR((cum_tok - n_tok) / 512) AS BIGINT) AS pack_id, "
        "CAST(cum_tok - n_tok - FLOOR((cum_tok - n_tok) / 512) * 512 AS BIGINT) "
        "AS pack_offset "
        "FROM cum ORDER BY shard, pack_id, pack_offset, doc_id"
    ),
    tags=("L34", "curation", "training-prep"),
)
def l34_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L34: SEQUENCE PACKING manifest — assign every document a
    (shard, pack, offset) under pure concatenation into fixed
    512-token training sequences, the layout step between tokenization
    and batching in an LM data pipeline. Pack assignment = the pack
    containing the doc's FIRST token: pack_id = floor(tokens_before /
    512) where tokens_before is the running token sum over the shard's
    deterministic hash order (docs may straddle a boundary — the
    reader splits or pads; the manifest pins where each doc starts).

    Plan: one map pass computes token counts and the l33 epoch hash;
    the shard partition is the only shuffle; the running sum is a
    shard-partitioned cumulative window (8-way parallel here — at
    100 TB shards are thousands and each is one task's sort, or the
    distributed-rank pattern replaces the window per functions/
    ranking.py). Token count = whitespace tokens (l10's base form) —
    swap in the BPE count (l10b) without changing the plan.

    Fully SQL-expressible: the oracle replays hash, shard, running
    sum, and offsets verbatim — the md5 60-bit hash is bit-identical
    on both engines, so the entire manifest is driver-hash pinned."""
    from pyspark.sql import Window

    seq_len = 512
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":0"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    # explicit class, not \s (Java's \s includes VT, RE2's doesn't) —
    # and \x0B, not \v: in a Java class \v is the VERTICAL-WHITESPACE
    # CLASS (adds U+0085/U+2028/U+2029) while RE2's \v is the single VT
    # char; \x0B is the one spelling both engines read identically
    # (round-5 second-session review)
    n_tok = F.size(F.split(F.trim("text"), "[ \\t\\n\\x0B\\f\\r]+")).cast("long")
    h = (
        T(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull() & (F.trim("text") != ""))
        .select("doc_id", hv.alias("hv"), n_tok.alias("n_tok"))
    )
    sh = h.select(
        "doc_id", "hv", "n_tok", F.pmod("hv", F.lit(8)).cast("int").alias("shard")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("hv", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = sh.select(
        "doc_id", "shard", "n_tok", F.sum("n_tok").over(w).alias("cum_tok")
    )
    before = F.col("cum_tok") - F.col("n_tok")
    return (
        cum.select(
            "doc_id", "shard", "n_tok",
            F.floor(before / seq_len).cast("long").alias("pack_id"),
            (before - F.floor(before / seq_len) * seq_len)
            .cast("long")
            .alias("pack_offset"),
        )
        .orderBy("shard", "pack_id", "pack_offset", "doc_id")
    )


#: ST14 benchmark slice over the RAW documents table (the static side
#: a stream decontaminates against; doc_id-deterministic so stream and
#: batch agree on the corpus/bench split)
ST14_BENCH_PRED = "doc_id % 5 = 0"


def bloom_decontaminate_agg(docs: DataFrame, bits_df: DataFrame) -> DataFrame:
    """ST14 builder: the l44 bloom probe as a STREAMING stage — the
    8 KB bitset rides a one-row stream-static broadcast join, each
    document's distinct 8-grams are probed by PER-ROW array
    expressions (size/filter over the materialized gram array — no
    explode, no per-gram shuffle), and the per-source contamination
    report is the query's only stateful operator (complete mode).
    Identical builder for the batch twin (the §2.8 contract).

    With l44 (batch) and inc5 (incremental bloom maintenance) this
    closes the decontamination triple: the SAME bitset semantics in
    all three execution modes."""
    from ipydataclean_spark.operators.llm import shingles_col, tokens_col

    corp = (
        docs.withColumn("__toks", tokens_col("text"))
        .withColumn("__grams", shingles_col(F.col("__toks"), 8))
    )
    probed = corp.crossJoin(F.broadcast(bits_df))
    nh = F.size(F.filter(F.col("__grams"), lambda g: bloom_hit_col(g)))
    perdoc = probed.select(
        "source",
        F.size("__grams").alias("ng"),
        nh.alias("nh"),
    )
    return perdoc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("nh") > 0).alias("n_flagged"),
        F.sum("ng").cast("long").alias("n_grams"),
        F.sum("nh").cast("long").alias("n_bloom_hits"),
    )


def st14_bench_positions(spark: SparkSession, sf_dir: str) -> list[int]:
    """Distinct bloom positions of the static benchmark slice
    (bounded: <= 2^16 ints) — computed batch-side once; the stream
    only ever sees the packed bitset."""
    from ipydataclean_spark.operators.llm import shingles_col, tokens_col
    from ipydataclean_spark.operators.qhelp import T

    bench = (
        T(spark, sf_dir, "documents")
        .where(F.expr(ST14_BENCH_PRED))
        .withColumn("__toks", tokens_col("text"))
        .select(F.explode(shingles_col(F.col("__toks"), 8)).alias("g"))
        .distinct()
    )
    pos = None
    for j in range(_BLOOM_K):
        p = bench.select(_bloom_pos(F.col("g"), j).alias("p"))
        pos = p if pos is None else pos.unionByName(p)
    return [r.p for r in pos.distinct().collect()]


# ---------------------------------------------------------------------------
# L57 — UniMax language sampling budgets (closed-form water-filling)
# ---------------------------------------------------------------------------

#: Epoch cap: no language is repeated more than this many times
#: (UniMax, Chung et al. ICLR 2023 — "N epochs max" is THE knob that
#: replaces temperature sampling's over-repetition of tail languages).
UNIMAX_EPOCH_CAP = 2

#: UniMax's greedy allocation has a closed form once languages are
#: sorted ascending by size: some prefix k* is CAPPED at N·n_i tokens,
#: and every language after k* receives the identical uniform share of
#: the remaining budget. k* is the largest k with
#: N·n_k·(L−k+1) <= B − N·S_{k−1} (all-BIGINT; S = capped-prefix token
#: sum) — if k is infeasible then so is k+1 (n ascending), so the
#: feasible set is a prefix and ONE window cumsum + ONE filtered max
#: replace the paper's sequential loop.
_L57_ORACLE = (
    "WITH cnt AS (SELECT lang, CAST(SUM(LEN(regexp_extract_all(LOWER(text), "
    "'[a-z0-9]+'))) AS BIGINT) AS n FROM documents GROUP BY lang), "
    "tot AS (SELECT (3 * CAST(SUM(n) AS BIGINT)) // 2 AS b, "
    "CAST(COUNT(*) AS BIGINT) AS l FROM cnt), "
    "ordered AS (SELECT lang, n, "
    "CAST(ROW_NUMBER() OVER (ORDER BY n, lang) AS BIGINT) AS idx, "
    "CAST(SUM(n) OVER (ORDER BY n, lang ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum "
    "FROM cnt), "
    f"feas AS (SELECT ordered.*, tot.*, (({UNIMAX_EPOCH_CAP} * n * (l - idx + 1)) "
    f"<= (b - {UNIMAX_EPOCH_CAP} * (cum - n))) AS ok FROM ordered CROSS JOIN tot), "
    "piv AS (SELECT COALESCE(MAX(idx) FILTER (WHERE ok), 0) AS kstar, "
    "COALESCE(MAX(cum) FILTER (WHERE ok), 0) AS s FROM feas) "
    "SELECT lang, n AS n_tokens, "
    "CAST(idx <= kstar AS INTEGER) AS capped, "
    f"CASE WHEN idx <= kstar THEN CAST({UNIMAX_EPOCH_CAP} * n AS DOUBLE) "
    f"ELSE CAST(b - {UNIMAX_EPOCH_CAP} * s AS DOUBLE) / (l - kstar) END AS budget_tokens, "
    f"(CASE WHEN idx <= kstar THEN CAST({UNIMAX_EPOCH_CAP} * n AS DOUBLE) "
    f"ELSE CAST(b - {UNIMAX_EPOCH_CAP} * s AS DOUBLE) / (l - kstar) END) / n AS epochs "
    "FROM feas CROSS JOIN piv ORDER BY lang"
)


@register(
    "l57_unimax_budgets",
    oracle=_L57_ORACLE,
    tags=("L57", "L31", "sampling", "curation"),
)
def l57_unimax_budgets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L57: UniMax language sampling budgets — the fairer successor to
    l31's temperature mix: give every language up to ``UNIMAX_EPOCH_CAP``
    epochs of its own tokens, then split what remains of the total
    budget UNIFORMLY among the languages big enough to absorb it
    (Chung et al., ICLR 2023). Budget here = 1.5x the corpus's
    total regex tokens — oversubscribed relative to one epoch, so tail
    languages hit the 2-epoch cap while head languages are downsampled
    (both allocation branches exercised on the fixture).

    Exactness: counts, cumsums, the pivot test, and k* are all BIGINT
    (the feasibility inequality is cross-multiplied so no division
    happens before the pivot is fixed); the only doubles are the final
    uniform share and epochs — ONE IEEE division each, identical
    cross-engine. Correctness of the closed form vs the paper's
    sequential greedy loop is property-pinned in pytest.

    Scale shape: one lang-keyed partial agg over the corpus (the only
    data-sized shuffle), then a #languages-row window — bounded by the
    language inventory (thousands at most), NOT the corpus. The same
    plan serves per-domain or per-source budgets by swapping the key."""
    from pyspark.sql import Window

    cap = F.lit(UNIMAX_EPOCH_CAP).cast("long")
    n_tok = F.regexp_count(F.lower(F.col("text")), F.lit("[a-z0-9]+")).cast("long")
    cnt = T(spark, sf_dir, "documents").groupBy("lang").agg(F.sum(n_tok).alias("n"))
    tot = cnt.agg(
        F.expr("(3 * CAST(sum(n) AS BIGINT)) DIV 2").alias("b"),
        F.count(F.lit(1)).cast("long").alias("l"),
    )
    w = Window.orderBy("n", "lang")
    ordered = cnt.select(
        "lang",
        "n",
        F.row_number().over(w).cast("long").alias("idx"),
        F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("long").alias("cum"),
    )
    feas = ordered.crossJoin(F.broadcast(tot)).withColumn(
        "ok",
        (cap * F.col("n") * (F.col("l") - F.col("idx") + 1))
        <= (F.col("b") - cap * (F.col("cum") - F.col("n"))),
    )
    pivot = feas.agg(
        F.coalesce(F.max(F.when(F.col("ok"), F.col("idx"))), F.lit(0).cast("long")).alias("kstar"),
        F.coalesce(F.max(F.when(F.col("ok"), F.col("cum"))), F.lit(0).cast("long")).alias("s"),
    )
    is_capped = F.col("idx") <= F.col("kstar")
    budget = F.when(is_capped, (cap * F.col("n")).cast("double")).otherwise(
        (F.col("b") - cap * F.col("s")).cast("double") / (F.col("l") - F.col("kstar"))
    )
    return (
        feas.crossJoin(F.broadcast(pivot))
        .select(
            "lang",
            F.col("n").alias("n_tokens"),
            is_capped.cast("int").alias("capped"),
            budget.alias("budget_tokens"),
            (budget / F.col("n")).alias("epochs"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# L68 — UniMax materialization plan (budgets → executable sampling)
# ---------------------------------------------------------------------------

_L68_ORACLE = (
    "WITH budgets AS (SELECT * FROM (" + _L57_ORACLE + ")), "
    "th AS (SELECT lang, epochs, "
    "CAST(FLOOR(epochs) AS BIGINT) AS n_full_copies, "
    "CAST(FLOOR((epochs - FLOOR(epochs)) * 16777216.0) AS BIGINT) AS t "
    "FROM budgets), "
    "tagged AS (SELECT d.lang, th.epochs, th.n_full_copies, th.t, "
    + md5_prefix_int_sql("'l68:' || CAST(d.doc_id AS VARCHAR)")
    + " AS h FROM documents d JOIN th ON d.lang = th.lang) "
    "SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs, "
    "MAX(epochs) AS epochs, MAX(n_full_copies) AS n_full_copies, "
    "CAST(COUNT_IF(h < t) AS BIGINT) AS n_extra_docs, "
    "CAST(COUNT(*) * MAX(n_full_copies) + COUNT_IF(h < t) AS BIGINT) "
    "AS total_doc_instances "
    "FROM tagged GROUP BY lang ORDER BY lang"
)


@register(
    "l68_unimax_materialize",
    oracle=_L68_ORACLE,
    tags=("L68", "L57", "L31", "sampling", "curation"),
)
def l68_unimax_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L68: the UniMax budgets MATERIALIZED — l57 says how many epochs
    each language gets; this turns that into an executable per-document
    plan: ``floor(epochs)`` full passes over every doc plus ONE
    md5-coin draw for the fractional epoch (a doc is either in the
    extra pass or not, decided by its hash — deterministic,
    reproducible, no RNG state), reported per language with the final
    instance count a dataloader manifest is built from. Completes the
    budget→plan loop the way l31 operationalizes temperature sampling
    and l39 operationalizes DSIR weights.

    Exactness: epochs are l57's certified doubles; the fractional-pass
    threshold is FLOOR((epochs − floor) · 2^24) — one multiply and
    floor of identical doubles — compared against the ONE shared md5
    coin; everything aggregated is BIGINT.

    Scale shape: l57's lang-keyed agg, then a broadcast of the
    #languages-row threshold table against the corpus scan and one
    lang-keyed rollup — map-side except two bounded shuffles."""
    budgets = l57_unimax_budgets(spark, sf_dir).select(
        "lang",
        "epochs",
        F.floor("epochs").cast("long").alias("n_full_copies"),
        F.floor((F.col("epochs") - F.floor("epochs")) * F.lit(16777216.0))
        .cast("long")
        .alias("t"),
    )
    coin = md5_prefix_int(F.concat(F.lit("l68:"), F.col("doc_id").cast("string")))
    tagged = (
        T(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .join(F.broadcast(budgets), "lang")
        .select("lang", "epochs", "n_full_copies", "t", coin.alias("h"))
    )
    return (
        tagged.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("epochs").alias("epochs"),
            F.max("n_full_copies").alias("n_full_copies"),
            F.count_if(F.col("h") < F.col("t")).alias("n_extra_docs"),
            (
                F.count(F.lit(1)) * F.max("n_full_copies")
                + F.count_if(F.col("h") < F.col("t"))
            )
            .cast("long")
            .alias("total_doc_instances"),
        )
        .orderBy("lang")
    )
