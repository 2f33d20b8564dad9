"""L72 — encoding QA: mojibake (UTF-8-as-Latin-1 double encoding)
detection + repair (VERDICT r10 #4).

The pretraining-QA stage l70 (HTML extract) and l71 (conversation
schema) don't cover: every crawl pipeline runs charset QA before any
text operator, because a large fraction of web text was decoded with
the wrong charset somewhere upstream. The classic failure is UTF-8
bytes read as Latin-1 ("café" -> "cafÃ©"); the classic repair is the
ftfy heuristic (public method): if a text (1) contains only Latin-1
code points, (2) whose Latin-1 bytes form VALID UTF-8, and (3) that
UTF-8 reading differs from the text, it is almost surely
double-encoded — re-decode it.

Spark-first shape: the whole detector/repairer is PURE JVM — a regex
gate (`[^\\x00-\\xFF]`), `encode(.., 'ISO-8859-1')` evaluated only
behind the gate (Spark 4's encode RAISES on unmappable chars, so the
gate is load-bearing, not an optimization), `is_valid_utf8` on the
bytes, and a lazy CASE for the repair decode. No Python in the plan
(plan-gated in tests); predicate-pushdown friendly; linear scan, no
shuffle.

Closed-form oracle (the l70/l71 playbook): the corpus is ASCII, so
the fixture deterministically DECORATES a doc-id-keyed slice with
non-ASCII suffixes (2-, 3-, and 4-byte UTF-8 code points), then
double-encodes the md5-coin half INSIDE the query — both the
decoration and the coin are SQL-expressible, so DuckDB recomputes the
expected flag, the char counts (a mojibake text's length equals the
original's OCTET length — each UTF-8 byte became one Latin-1 char),
and the repaired string (= the decorated original, exactly) from the
source table. A hash match certifies detection AND byte-exact repair
for every multibyte width.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register


def mojibake_repair(col: Column) -> tuple[Column, Column]:
    """(flagged, repaired) for a string column — the ftfy-style
    double-encoding heuristic, pure JVM (see module docstring).
    Precondition-free: texts with code points above U+00FF (real CJK,
    emoji) fail the gate and pass through untouched; plain ASCII maps
    to itself under the roundtrip and is never flagged; Latin-1
    accents alone are invalid UTF-8 and are never flagged. The false
    positive — legitimate text that literally spells a valid UTF-8
    byte sequence in Latin-1 chars ("Ã©" as intended content) — is
    inherent to the heuristic (ftfy shares it) and rare in practice."""
    latin1_ok = ~col.rlike("[^\\x00-\\xFF]")
    b = F.when(latin1_ok, F.encode(col, "ISO-8859-1"))
    valid = F.when(latin1_ok, F.is_valid_utf8(b)).otherwise(F.lit(False))
    cand = F.when(valid, F.decode(b, "UTF-8"))
    flagged = latin1_ok & valid & (cand != col)
    repaired = F.when(flagged, cand).otherwise(col)
    return flagged, repaired


def repair_mojibake(df: DataFrame, col: str, out: str | None = None) -> DataFrame:
    """The widget-loop fix: repair double-encoded values of ``col``
    in place (or into ``out``), leaving clean values untouched — the
    DataFrame form of ``mojibake_repair`` the recipe step and
    ``DataCleaner.apply_fix`` route to."""
    _, repaired = mojibake_repair(F.col(col))
    return df.withColumn(out or col, repaired)


#: strict UTF-8 validity over Latin-1 code points, as ONE RE2 class
#: alternation (public form of the Unicode table: overlongs, CESU
#: surrogates, and >U+10FFFF excluded — matching Spark's
#: is_valid_utf8). Chars above U+00FF fail every class, so the
#: anchored match doubles as the Latin-1 gate. Kept in one place so
#: the recipe SQL twin can't drift from the detector (the exact.py
#: one-definition rule).
_MOJIBAKE_STRICT_RE = (
    r"^(?:[\x00-\x7F]"
    r"|[\xc2-\xdf][\x80-\xbf]"
    r"|\xe0[\xa0-\xbf][\x80-\xbf]"
    r"|[\xe1-\xec\xee\xef][\x80-\xbf]{2}"
    r"|\xed[\x80-\x9f][\x80-\xbf]"
    r"|\xf0[\x90-\xbf][\x80-\xbf]{2}"
    r"|[\xf1-\xf3][\x80-\xbf]{3}"
    r"|\xf4[\x80-\x8f][\x80-\xbf]{2})*$"
)


def mojibake_flag_sql(expr: str) -> str:
    """DuckDB twin of ``mojibake_repair``'s flag: Latin-1 bytes form
    strictly-valid UTF-8 AND at least one byte is multibyte content.
    NULL-safe (NULL text -> NULL, like the Spark side)."""
    return (
        f"(regexp_matches({expr}, '{_MOJIBAKE_STRICT_RE}') "
        f"AND regexp_matches({expr}, '[\\x80-\\xff]'))"
    )


def mojibake_repair_sql(expr: str) -> str:
    """DuckDB twin of the repair: re-read the text's code points as
    bytes (codepoint==byte under the Latin-1 gate) and UTF-8-decode
    them — guarded by the flag (decode of valid-by-regex bytes cannot
    fail; the CASE keeps it off the clean branch)."""
    repair = (
        "decode(unhex(array_to_string(list_transform("
        f"string_split({expr}, ''), x -> printf('%02x', unicode(x))), '')))"
    )
    return f"CASE WHEN {mojibake_flag_sql(expr)} THEN {repair} ELSE {expr} END"


#: deterministic non-ASCII decorations, keyed by (doc_id // 2) % 4 —
#: 2-byte (é, ö), 3-byte (CJK, —), and 4-byte (emoji) UTF-8 widths so
#: the repair is certified across every multibyte length. Mirrored
#: VERBATIM in the oracle CASE.
_L72_SUFFIXES = (
    " — naïve café",
    " — höflich müde",
    " — señor año",
    " — 你好 世界 🚀",
)

_L72_COIN_SQL = exact.md5_prefix_int_sql("'l72:' || CAST(doc_id AS VARCHAR)")

_L72_ORACLE = (
    "WITH d AS (SELECT doc_id, text || CASE WHEN doc_id % 2 = 0 THEN "
    "CASE (doc_id // 2) % 4 "
    f"WHEN 0 THEN '{_L72_SUFFIXES[0]}' WHEN 1 THEN '{_L72_SUFFIXES[1]}' "
    f"WHEN 2 THEN '{_L72_SUFFIXES[2]}' ELSE '{_L72_SUFFIXES[3]}' END "
    "ELSE '' END AS dec, "
    f"({_L72_COIN_SQL} % 3 = 0) AS coin "
    "FROM documents WHERE doc_id % 9 = 2 AND text IS NOT NULL) "
    "SELECT doc_id, "
    "CAST(CASE WHEN coin AND doc_id % 2 = 0 THEN 1 ELSE 0 END AS INT) AS mojibake, "
    "CASE WHEN coin AND doc_id % 2 = 0 THEN 'repaired' ELSE 'kept' END AS action, "
    "CAST(CASE WHEN coin THEN strlen(dec) ELSE length(dec) END AS BIGINT) "
    "AS n_chars_in, "  # strlen = DuckDB's VARCHAR byte length
    "CAST(length(dec) AS BIGINT) AS n_chars_out, "
    "dec AS repaired "
    "FROM d ORDER BY doc_id"
)


def encoding_qa_frame(docs: DataFrame) -> DataFrame:
    """The shared l72/st18 stage: decorate (doc-id-keyed non-ASCII
    suffixes), corrupt the md5-coin half (UTF-8 bytes re-read as
    Latin-1 — never fails), then detect + repair. Stateless
    projections only, so the streaming form's report aggregation is
    the query's ONLY stateful operator (the st13 rule). Input needs
    (doc_id, text [, ...passthrough cols]); adds __dirty, mojibake,
    repaired."""
    suffix = F.when(
        F.col("doc_id") % 2 == 0,
        F.element_at(
            F.lit(list(_L72_SUFFIXES)),
            ((F.col("doc_id") / 2).cast("long") % 4 + 1).cast("int"),
        ),
    ).otherwise(F.lit(""))
    decorated = F.concat(F.col("text"), suffix)
    coin = (
        exact.md5_prefix_int(F.concat(F.lit("l72:"), F.col("doc_id").cast("string")))
        % 3
        == 0
    )
    dirty = F.when(
        coin, F.decode(F.encode(decorated, "UTF-8"), "ISO-8859-1")
    ).otherwise(decorated)
    out = docs.withColumn("__dirty", dirty)
    flagged, repaired = mojibake_repair(F.col("__dirty"))
    return out.withColumn("mojibake", flagged.cast("int")).withColumn(
        "repaired", repaired
    )


def encoding_report(docs: DataFrame) -> DataFrame:
    """ST18: the per-language encoding-QA ingest report — all-integer
    columns, order-independent, so batch and replay agree exactly.
    chars_repaired counts the byte-overhead removed by the repair
    (mojibake length − repaired length), the operational measure of
    encoding damage in the feed."""
    d = encoding_qa_frame(docs)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("mojibake").cast("long").alias("n_mojibake"),
        F.sum(F.length("__dirty") - F.length("repaired"))
        .cast("long")
        .alias("chars_repaired"),
    )


@register("l72_encoding_qa", oracle=_L72_ORACLE, tags=("L72", "L7", "quality"))
def l72_encoding_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L72: encoding QA end-to-end — decorate the doc slice with
    deterministic non-ASCII suffixes (half the slice stays ASCII to
    pin corruption-is-identity), double-encode the md5-coin half
    (UTF-8 bytes re-read as Latin-1 — pure JVM decode(encode(..))),
    then detect + repair with the ftfy heuristic. The oracle
    recomputes flag, char counts, and the repaired STRING from the
    source, so a hash match certifies: flagged exactly the
    coin-and-decorated docs (detector agrees with an md5 computation
    it never sees), mojibake length == source octet length, and the
    repair is byte-exact across 2/3/4-byte UTF-8 sequences. ASCII
    docs the coin 'corrupts' are unchanged and must NOT be flagged.
    False-positive boundary and non-Latin-1 passthrough are pinned in
    tests/test_encoding_qa.py."""
    docs = (
        T(spark, sf_dir, "documents")
        .where((F.col("doc_id") % 9 == 2) & F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    d = encoding_qa_frame(docs)
    return d.select(
        "doc_id",
        "mojibake",
        F.when(F.col("mojibake") == 1, F.lit("repaired"))
        .otherwise(F.lit("kept"))
        .alias("action"),
        F.length("__dirty").cast("long").alias("n_chars_in"),
        F.length("repaired").cast("long").alias("n_chars_out"),
        "repaired",
    ).orderBy("doc_id")
