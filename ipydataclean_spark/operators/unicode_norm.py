"""L75 — Unicode normalization QA (NFC): the canonicalization member
of the text-QA family (l70 HTML, l71 conversations, l72 charset
damage, l73 PDF, l74 WARC — and now canonical-equivalence damage).

Why a training pipeline needs it: the SAME visible text can arrive
as composed ("é" U+00E9) or decomposed ("e" + U+0301) code point
sequences — canonically equivalent, byte-different. Every exact-dedup
(L1), MinHash shingle (L2), and token count (L10) sees them as
DIFFERENT documents unless the corpus is normalized first, so NFC
normalization runs ahead of dedup in real pipelines (Unicode
Standard Annex #15, public spec).

Spark-first shape: Spark SQL has no normalization builtin, so the
kernel is an Arrow-batched ``mapInPandas`` over ``unicodedata``
(stdlib; the same honest-kernel pattern as l73's parser) — map-only,
no shuffle, linear in chars. DuckDB HAS ``nfc_normalize`` (utf8proc),
which gives this operator what l72 has: a FULL closed-form oracle —
the fixture decorates an md5-coin slice with DECOMPOSED suffixes
in-query, and DuckDB recomputes flag, char counts, and the normalized
string from the source table, so one hash certifies detection and
byte-exact normalization (Python unicodedata and DuckDB utf8proc
agree on these stable sequences; pinned by the driver hash itself).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ipydataclean_spark.functions import exact
from ipydataclean_spark.operators.qhelp import T
from ipydataclean_spark.registry import register


def unicode_normalize(df: DataFrame, col: str, form: str = "NFC",
                      out: str | None = None) -> DataFrame:
    """Normalize a string column to ``form`` (NFC/NFD/NFKC/NFKD) via
    an Arrow-batched kernel — the standalone operator form (run it
    before L1/L2 dedup so canonically-equivalent docs collapse).
    NULL-safe; non-string input raises at analysis time."""
    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")
    tgt = out or col
    cols = [f.name for f in df.schema.fields]
    if tgt not in cols:
        df = df.withColumn(tgt, F.col(col))
        cols.append(tgt)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import unicodedata as _ud

        for pdf in batches:
            pdf[tgt] = [
                _ud.normalize(form, v) if isinstance(v, str) else v
                for v in pdf[col]
            ]
            yield pdf

    return df.mapInPandas(kernel, schema=df.schema)


#: decomposed decorations, keyed by (doc_id // 2) % 3 — combining
#: acute/ring/diaeresis/tilde sequences plus the U+212B ANGSTROM SIGN
#: singleton (NFC maps it to U+00C5 with NO length change, so the
#: oracle certifies both the shrinking and the same-length
#: normalization paths). All sequences are stability-policy stable,
#: so Python unicodedata and DuckDB utf8proc agree regardless of
#: Unicode version skew. Mirrored VERBATIM in the oracle CASE.
_L75_SUFFIXES = (
    # escape sequences, not literal chars, so the DECOMPOSED forms
    # cannot be silently composed by an editor or a copy-paste
    " cafe\u0301 de\u0301ja\u0300",       # e/a + combining acute/grave
    " A\u030angstro\u0308m \u212b",       # A+ring, o+diaeresis, ANGSTROM SIGN
    " man\u0303ana o\u0308ko\u0308",      # n+tilde, o+diaeresis
)

_L75_COIN_SQL = exact.md5_prefix_int_sql("'l75:' || CAST(doc_id AS VARCHAR)")

_L75_ORACLE = (
    "WITH d AS (SELECT doc_id, text || CASE WHEN "
    f"({_L75_COIN_SQL} % 2 = 0) THEN "
    "CASE (doc_id // 2) % 3 "
    f"WHEN 0 THEN '{_L75_SUFFIXES[0]}' WHEN 1 THEN '{_L75_SUFFIXES[1]}' "
    f"ELSE '{_L75_SUFFIXES[2]}' END "
    "ELSE '' END AS dec "
    "FROM documents WHERE doc_id % 13 = 5 AND text IS NOT NULL), "
    "n AS (SELECT doc_id, dec, nfc_normalize(dec) AS nrm FROM d) "
    "SELECT doc_id, "
    "CAST(CASE WHEN dec = nrm THEN 1 ELSE 0 END AS INT) AS is_nfc, "
    "CASE WHEN dec = nrm THEN 'kept' ELSE 'normalized' END AS action, "
    "CAST(length(dec) AS BIGINT) AS n_chars_in, "
    "CAST(length(nrm) AS BIGINT) AS n_chars_out, "
    "nrm AS normalized "
    "FROM n ORDER BY doc_id"
)


@register("l75_unicode_nfc_qa", oracle=_L75_ORACLE, tags=("L75", "L7", "quality"))
def l75_unicode_nfc_qa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L75: Unicode NFC QA end-to-end — decorate the md5-coin half of
    the doc slice with DECOMPOSED suffixes (combining marks + the
    U+212B singleton; the un-decorated half stays ASCII = already
    NFC), then detect non-NFC text and normalize it. The oracle
    recomputes flag, char counts, and the normalized STRING via
    DuckDB's nfc_normalize from the source table, so a hash match
    certifies that Python unicodedata's NFC and utf8proc's NFC agree
    byte-for-byte on the corpus: composition (fewer chars), the
    singleton remap (same chars, different bytes), and ASCII
    idempotence. Hand vectors (NFD/NFKC boundaries, Hangul, ligature
    NON-folding under NFC) are pinned in tests/test_unicode_norm.py."""
    suffix = F.when(
        exact.md5_prefix_int(
            F.concat(F.lit("l75:"), F.col("doc_id").cast("string"))
        )
        % 2
        == 0,
        F.element_at(
            F.lit(list(_L75_SUFFIXES)),
            ((F.col("doc_id") / 2).cast("long") % 3 + 1).cast("int"),
        ),
    ).otherwise(F.lit(""))
    docs = (
        T(spark, sf_dir, "documents")
        .where((F.col("doc_id") % 13 == 5) & F.col("text").isNotNull())
        .select("doc_id", F.concat(F.col("text"), suffix).alias("dec"))
    )
    out = unicode_normalize(docs, "dec", "NFC", out="normalized")
    return out.select(
        "doc_id",
        (F.col("dec") == F.col("normalized")).cast("int").alias("is_nfc"),
        F.when(F.col("dec") == F.col("normalized"), F.lit("kept"))
        .otherwise(F.lit("normalized"))
        .alias("action"),
        F.length("dec").cast("long").alias("n_chars_in"),
        F.length("normalized").cast("long").alias("n_chars_out"),
        "normalized",
    ).orderBy("doc_id")


# Worker-side kernels reference this module's functions; register for
# by-value pickling (the standing plain-session contract). stdlib only.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
