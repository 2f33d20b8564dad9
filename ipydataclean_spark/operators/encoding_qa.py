"""L72 — encoding QA: mojibake (UTF-8 double encoding) detection +
repair for BOTH dominant charsets: Latin-1 (VERDICT r10 #4) and
Windows-1252 (VERDICT r11 #1).

The pretraining-QA stage l70 (HTML extract) and l71 (conversation
schema) don't cover: every crawl pipeline runs charset QA before any
text operator, because a large fraction of web text was decoded with
the wrong charset somewhere upstream. The classic failure is UTF-8
bytes read as Latin-1 ("café" -> "cafÃ©") or — far more common in the
wild — as Windows-1252 ("it's" -> "itâ€™s": cp1252 maps C1-range
bytes 0x80–0x9F to 27 PRINTABLE code points, most ABOVE U+00FF, like
€ U+20AC and ™ U+2122). The classic repair is the ftfy heuristic
(public method): if a text (1) contains only chars a single-byte
read could have produced, (2) whose byte reading forms VALID UTF-8,
and (3) that UTF-8 reading differs from the text, it is almost surely
double-encoded — re-decode it. The cp1252 char->byte inverse is
ftfy's "sloppy-cp1252" table: the 27 printable remappings, plus
code-point-identity for everything <= U+00FF (the 5 bytes cp1252
leaves undefined — 0x81 0x8D 0x8F 0x90 0x9D — read as the C1
controls themselves, which identity already covers). One translate
of those 27 chars reduces the cp1252 case to the Latin-1 case, so a
single detector handles both.

Spark-first shape: the whole detector/repairer is PURE JVM — one
`translate` (sloppy-cp1252 inverse), a regex gate (Latin-1 range OR
the 27 printables), `encode(.., 'ISO-8859-1')` evaluated only behind
the gate (Spark 4's encode RAISES on unmappable chars, so the gate
is load-bearing, not an optimization — and its charset allowlist has
no windows-1252, which is WHY the cp1252 leg is a translate, not a
decode), `is_valid_utf8` on the bytes, and a lazy CASE for the
repair decode. No Python in the plan (plan-gated in tests);
predicate-pushdown friendly; linear scan, no shuffle.

Closed-form oracle (the l70/l71 playbook): the corpus is ASCII, so
the fixture deterministically DECORATES a doc-id-keyed slice with
non-ASCII suffixes (2-, 3-, and 4-byte UTF-8 code points), then
double-encodes an md5-coin third through the Latin-1 read and
another third through the sloppy-cp1252 read INSIDE the query — the
decoration, the coin, and both corruptions are SQL-expressible, so
DuckDB recomputes the expected flag, the char counts (a mojibake
text's length equals the original's OCTET length — each UTF-8 byte
became exactly one char under either single-byte read), and the
repaired string (= the decorated original, exactly) from the source
table. A hash match certifies detection AND byte-exact repair for
every multibyte width under both charset variants.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register


#: the 27 byte positions in 0x80–0x9F that Windows-1252 maps to
#: printable code points (CP1252.TXT, public Unicode mapping table),
#: and those code points, index-aligned — THE one definition the
#: detector, both SQL twins, and the fixture corruption all share
#: (the exact.py one-definition rule). The 5 positions cp1252 leaves
#: undefined (0x81 0x8D 0x8F 0x90 0x9D) need no entry: the sloppy
#: read takes them to the C1 controls, which code-point-identity
#: already inverts.
_CP1252_BYTES = bytes(
    b for b in range(0x80, 0xA0) if b not in (0x81, 0x8D, 0x8F, 0x90, 0x9D)
)
_CP1252_C1 = "".join(chr(b) for b in _CP1252_BYTES)
_CP1252_PRINTABLE = bytes(_CP1252_BYTES).decode("cp1252")
assert len(_CP1252_PRINTABLE) == 27 and min(_CP1252_PRINTABLE) > "\xff"


def mojibake_repair(col: Column) -> tuple[Column, Column]:
    """(flagged, repaired) for a string column — the ftfy-style
    double-encoding heuristic over BOTH single-byte reads, pure JVM
    (see module docstring): translate the 27 cp1252 printables back
    to their C1 chars (identity on everything else that can pass the
    gate), then run the Latin-1 pipeline on the translated text — a
    pure-Latin-1 mojibake contains none of the 27, so translate is
    identity there and the old behavior is preserved exactly.
    Precondition-free: texts with other code points above U+00FF
    (real CJK, emoji) fail the gate and pass through untouched; plain
    ASCII maps to itself under the roundtrip and is never flagged;
    Latin-1 accents alone are invalid UTF-8 and are never flagged; a
    lone € is a bare continuation byte and is never flagged. The
    false positive — legitimate text that literally spells a valid
    UTF-8 byte sequence in mojibake chars ("Ã©" as intended content)
    — is inherent to the heuristic (ftfy shares it) and rare in
    practice."""
    t = F.translate(col, _CP1252_PRINTABLE, _CP1252_C1)
    gate = ~col.rlike(f"[^\\x00-\\xFF{_CP1252_PRINTABLE}]")
    b = F.when(gate, F.encode(t, "ISO-8859-1"))
    valid = F.when(gate, F.is_valid_utf8(b)).otherwise(F.lit(False))
    cand = F.when(valid, F.decode(b, "UTF-8"))
    flagged = gate & valid & (cand != col)
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
#: is_valid_utf8). Applied to the TRANSLATED text (sloppy-cp1252
#: inverse first): chars above U+00FF fail every class, so the
#: anchored match doubles as the gate — the 27 printables have
#: already been mapped into C1 range, and anything else above U+00FF
#: is a legitimate-Unicode rejection. Kept in one place so the
#: recipe SQL twin can't drift from the detector (the exact.py
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


def _translated_sql(expr: str) -> str:
    """The sloppy-cp1252 inverse as DuckDB SQL — translate the 27
    printables to their C1 chars (both literals embedded verbatim;
    DuckDB translate is code-point-wise, like Spark's)."""
    return f"translate({expr}, '{_CP1252_PRINTABLE}', '{_CP1252_C1}')"


def mojibake_flag_sql(expr: str) -> str:
    """DuckDB twin of ``mojibake_repair``'s flag: the sloppy-cp1252
    inverse of the text consists of code points <= U+00FF whose bytes
    form strictly-valid UTF-8 AND at least one byte is multibyte
    content. NULL-safe (NULL text -> NULL, like the Spark side)."""
    t = _translated_sql(expr)
    return (
        f"(regexp_matches({t}, '{_MOJIBAKE_STRICT_RE}') "
        f"AND regexp_matches({t}, '[\\x80-\\xff]'))"
    )


def mojibake_repair_sql(expr: str) -> str:
    """DuckDB twin of the repair: sloppy-cp1252-inverse the text,
    re-read its code points as bytes (codepoint==byte after the
    translate, under the gate) and UTF-8-decode them — guarded by the
    flag (decode of valid-by-regex bytes cannot fail; the CASE keeps
    it off the clean branch)."""
    repair = (
        "decode(unhex(array_to_string(list_transform("
        f"string_split({_translated_sql(expr)}, ''), "
        "x -> printf('%02x', unicode(x))), '')))"
    )
    return f"CASE WHEN {mojibake_flag_sql(expr)} THEN {repair} ELSE {expr} END"


#: deterministic non-ASCII decorations, keyed by (doc_id // 2) % 4 —
#: 2-byte (é, ö), 3-byte (CJK, — and the curly quotes, whose ” is
#: E2 80 9D: byte 0x9D is one of the five UNDEFINED cp1252 positions,
#: so the driver hash exercises the sloppy-C1 identity leg), and
#: 4-byte (emoji) UTF-8 widths so the repair is certified across
#: every multibyte length under both charset reads. Mirrored VERBATIM
#: in the oracle CASE.
_L72_SUFFIXES = (
    " — naïve café",
    " — höflich müde",
    " — señor año",
    " — 你好 世界 🚀 “ok”",
)

_L72_COIN_SQL = exact.md5_prefix_int_sql("'l72:' || CAST(doc_id AS VARCHAR)")

#: the shared d-CTE: decoration + the three-way corruption coin
#: (0 = UTF-8-read-as-Latin-1, 1 = UTF-8-read-as-sloppy-cp1252,
#: 2 = clean). Under EITHER single-byte read every byte becomes
#: exactly one char, so char-vs-byte length arithmetic is identical
#: for both corrupt variants.
_L72_CTE = (
    "WITH d AS (SELECT doc_id, lang, text || CASE WHEN doc_id % 2 = 0 THEN "
    "CASE (doc_id // 2) % 4 "
    f"WHEN 0 THEN '{_L72_SUFFIXES[0]}' WHEN 1 THEN '{_L72_SUFFIXES[1]}' "
    f"WHEN 2 THEN '{_L72_SUFFIXES[2]}' ELSE '{_L72_SUFFIXES[3]}' END "
    "ELSE '' END AS dec, "
    f"({_L72_COIN_SQL} % 3) AS coin3 "
    "FROM documents WHERE doc_id % 9 = 2 AND text IS NOT NULL) "
)

_L72_ORACLE = (
    _L72_CTE
    + "SELECT doc_id, "
    "CASE coin3 WHEN 0 THEN 'latin1' WHEN 1 THEN 'cp1252' ELSE 'clean' END "
    "AS variant, "
    "CAST(CASE WHEN coin3 < 2 AND doc_id % 2 = 0 THEN 1 ELSE 0 END AS INT) "
    "AS mojibake, "
    "CASE WHEN coin3 < 2 AND doc_id % 2 = 0 THEN 'repaired' ELSE 'kept' END "
    "AS action, "
    "CAST(CASE WHEN coin3 < 2 THEN strlen(dec) ELSE length(dec) END AS BIGINT) "
    "AS n_chars_in, "  # strlen = DuckDB's VARCHAR byte length
    "CAST(length(dec) AS BIGINT) AS n_chars_out, "
    "dec AS repaired "
    "FROM d ORDER BY doc_id"
)


def encoding_qa_frame(docs: DataFrame) -> DataFrame:
    """The shared l72/st18 stage: decorate (doc-id-keyed non-ASCII
    suffixes), corrupt one md5-coin third through the Latin-1 read
    and another through the sloppy-cp1252 read (= the Latin-1 read
    with the 27 C1 chars translated to the cp1252 printables — Spark
    4's decode allowlist has no windows-1252, and the translate IS
    the public sloppy-cp1252 table; never fails), then detect +
    repair. Stateless projections only, so the streaming form's
    report aggregation is the query's ONLY stateful operator (the
    st13 rule). Input needs (doc_id, text [, ...passthrough cols]);
    adds __variant, __dirty, mojibake, repaired."""
    suffix = F.when(
        F.col("doc_id") % 2 == 0,
        F.element_at(
            F.lit(list(_L72_SUFFIXES)),
            ((F.col("doc_id") / 2).cast("long") % 4 + 1).cast("int"),
        ),
    ).otherwise(F.lit(""))
    decorated = F.concat(F.col("text"), suffix)
    coin3 = exact.md5_prefix_int(
        F.concat(F.lit("l72:"), F.col("doc_id").cast("string"))
    ) % 3
    as_latin1 = F.decode(F.encode(decorated, "UTF-8"), "ISO-8859-1")
    as_cp1252 = F.translate(as_latin1, _CP1252_C1, _CP1252_PRINTABLE)
    dirty = (
        F.when(coin3 == 0, as_latin1)
        .when(coin3 == 1, as_cp1252)
        .otherwise(decorated)
    )
    variant = (
        F.when(coin3 == 0, F.lit("latin1"))
        .when(coin3 == 1, F.lit("cp1252"))
        .otherwise(F.lit("clean"))
    )
    out = docs.withColumn("__variant", variant).withColumn("__dirty", dirty)
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
        # detector flag CROSSED with the fixture's cp1252 coin: the
        # oracle recomputes this from the md5 the detector never
        # sees, so the hash certifies the cp1252 docs specifically
        # were caught (not just the net count)
        F.sum(
            F.col("mojibake") * (F.col("__variant") == "cp1252").cast("int")
        )
        .cast("long")
        .alias("n_cp1252"),
        F.sum(F.length("__dirty") - F.length("repaired"))
        .cast("long")
        .alias("chars_repaired"),
    )


@register("l72_encoding_qa", oracle=_L72_ORACLE, tags=("L72", "L7", "quality"))
def l72_encoding_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L72: encoding QA end-to-end — decorate the doc slice with
    deterministic non-ASCII suffixes (half the slice stays ASCII to
    pin corruption-is-identity), double-encode one md5-coin third
    through the Latin-1 read and another through the sloppy-cp1252
    read (VERDICT r11 #1 — the dominant real-world mojibake, "â€™"
    with chars ABOVE U+00FF, which the old Latin-1 gate passed
    through silently), then detect + repair with the ftfy heuristic.
    The oracle recomputes variant, flag, char counts, and the
    repaired STRING from the source, so a hash match certifies:
    flagged exactly the corrupted-and-decorated docs of BOTH variants
    (detector agrees with an md5 computation it never sees), mojibake
    length == source octet length under either single-byte read, and
    the repair is byte-exact across 2/3/4-byte UTF-8 sequences
    including the undefined-cp1252 0x9D byte (the ” suffix). ASCII
    docs the coins 'corrupt' are unchanged and must NOT be flagged.
    False-positive boundary, €/™/’-class hand vectors, and
    non-repairable passthrough are pinned in
    tests/test_encoding_qa.py."""
    docs = (
        T(spark, sf_dir, "documents")
        .where((F.col("doc_id") % 9 == 2) & F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    d = encoding_qa_frame(docs)
    return d.select(
        "doc_id",
        F.col("__variant").alias("variant"),
        "mojibake",
        F.when(F.col("mojibake") == 1, F.lit("repaired"))
        .otherwise(F.lit("kept"))
        .alias("action"),
        F.length("__dirty").cast("long").alias("n_chars_in"),
        F.length("repaired").cast("long").alias("n_chars_out"),
        "repaired",
    ).orderBy("doc_id")
