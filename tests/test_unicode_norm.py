"""Pins for L75 Unicode NFC normalization QA (operators/unicode_norm.py).

The driver oracle hash-certifies the query end-to-end (Python
unicodedata vs DuckDB utf8proc, byte-for-byte); these pin the form
boundaries the fixture never exercises (NFD round-trips, NFKC
compatibility folds that NFC must NOT apply, Hangul composition) and
the operator form's contracts (NULL passthrough, in-place vs out
column, bad form name).
"""

import unicodedata

import pytest
from pyspark.sql import functions as F

from ipydataclean_spark.operators.unicode_norm import (
    _L75_SUFFIXES,
    l75_unicode_nfc_qa,
    unicode_normalize,
)


def _norm(spark, texts, form="NFC"):
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    return [r.o for r in unicode_normalize(df, "t", form, out="o").collect()]


def test_hand_vectors_nfc(spark):
    """Composition, the U+212B singleton, combining-mark reordering
    under canonical ordering, and ASCII idempotence."""
    cases = [
        ("café", "café"),
        ("Å", "Å"),               # A + ring -> Å
        ("Å", "Å"),                # ANGSTROM SIGN singleton
        ("plain ascii", "plain ascii"),
        ("é already composed", "é already composed"),
        # Hangul jamo compose to a syllable
        ("가", "가"),
        # canonical REORDERING: acute (ccc 230) typed before
        # cedilla (ccc 202) - NFC sorts by combining class, then
        # composes c+cedilla+acute into U+1E09
        ("c\u0301\u0327", "\u1e09"),
    ]
    got = _norm(spark, [c[0] for c in cases])
    for (src, want), out in zip(cases, got):
        assert out == unicodedata.normalize("NFC", src) == want, (src, out)


def test_nfc_does_not_fold_compatibility(spark):
    """NFC must NOT apply NFKC folds: ligature fi, fullwidth A, and
    superscript 2 stay; NFKC (operator form) folds them."""
    keep = ["ﬁsh", "ＡBC", "x²"]
    assert _norm(spark, keep) == keep
    nfkc = _norm(spark, keep, form="NFKC")
    assert nfkc == ["fish", "ABC", "x2"]


def test_operator_contracts(spark):
    df = spark.createDataFrame([("café",), (None,)], "t string")
    # in-place
    rows = unicode_normalize(df, "t").collect()
    assert rows[0].t == "café" and rows[1].t is None
    # NFD round-trip
    back = _norm(spark, ["café"], form="NFD")
    assert back == ["café"]
    with pytest.raises(ValueError, match="normalization form"):
        unicode_normalize(df, "t", "NFX")


def test_l75_query_nonvacuous_and_consistent(spark, sf_dir):
    rows = l75_unicode_nfc_qa(spark, sf_dir).collect()
    assert rows
    assert {r.action for r in rows} == {"kept", "normalized"}
    for r in rows:
        assert (r.action == "normalized") == (r.is_nfc == 0)
        if r.is_nfc:
            assert r.n_chars_in == r.n_chars_out
        else:
            # every decomposed suffix shrinks under composition
            assert r.n_chars_in > r.n_chars_out
            assert unicodedata.normalize("NFC", r.normalized) == r.normalized
    # all three suffix shapes occur among normalized rows
    shapes = {(r.doc_id // 2) % 3 for r in rows if not r.is_nfc}
    assert shapes == {0, 1, 2}
