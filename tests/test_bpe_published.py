"""Pins for byte-level pre-tokenization + the published-merges
pipeline (functions/bpe.py, VERDICT r09 #6) and the l10c query.

The key certification: ``pretokenize_scan`` (the from-scratch
dependency-free scanner) is EQUIVALENT to the published GPT-2 split
pattern — pinned against the ``regex`` engine on hand-picked edge
vectors AND a hypothesis property. Token counts are pinned against
hand-computed merge walks and an independent recompute."""

import pytest

from ipydataclean_spark.functions.bpe import (
    GPT2_SPLIT_PATTERN,
    bytes_to_unicode,
    count_published_tokens,
    decode_published,
    encode_published,
    load_merges,
    pretokenize,
    pretokenize_scan,
)

regex = pytest.importorskip("regex")
_PAT = regex.compile(GPT2_SPLIT_PATTERN)


def test_bytes_to_unicode_known_anchors():
    """Public facts about the GPT-2 byte alphabet: a 256-way
    bijection; printable bytes map to themselves; space is Ġ (U+0120),
    newline Ċ (U+010A), byte 0 is Ā (U+0100), DEL is ġ (U+0121),
    soft-hyphen 0xAD is Ń (U+0143) — the 68 remapped bytes in
    first-seen order starting at 256."""
    b2u = bytes_to_unicode()
    assert len(b2u) == 256 and len(set(b2u.values())) == 256
    assert b2u[ord("!")] == "!" and b2u[ord("A")] == "A" and b2u[0xFF] == "ÿ"
    assert b2u[32] == chr(0x120)
    assert b2u[10] == chr(0x10A)
    assert b2u[0] == chr(0x100)
    assert b2u[127] == chr(0x121)
    assert b2u[0xAD] == chr(0x143)


_EDGE_VECTORS = [
    "Hello, world! I'm here.",
    "  leading",
    "trailing ",
    "a\n\nb",
    "a\n\n",
    "x  =  42",
    "héllo wörld",
    "日本語のテスト123",
    "emoji 👍 test",
    "tab\there",
    "crlf\r\nend",
    "don't can't we'll I'd you've she's it're",
    "...!!!???",
    "a1b2c3",
    "½¾",
    "MixedCASE Words",
    "",
    " ",
    "   ",
    "Ωmega ΣUM",
    "under_score-dash",
    "o'clock",
    chr(0x1C) + "sep",
    "'s's't",
]


@pytest.mark.parametrize("text", _EDGE_VECTORS)
def test_scanner_equals_published_pattern(text):
    assert pretokenize_scan(text) == _PAT.findall(text)


#: A classification-stable multilingual alphabet for the equivalence
#: property. The scanner classifies via the stdlib ``unicodedata``
#: (Unicode 14 in Python 3.11) while the ``regex`` engine bundles a
#: NEWER Unicode database — codepoints assigned between the two
#: versions (e.g. U+18D80, unassigned->letter) legitimately diverge,
#: which is database skew, not an algorithm difference (found by an
#: unrestricted run of this property). Every character below has had
#: a stable category for a decade-plus, so the property certifies the
#: ALGORITHM: contractions, optional-space runs, and the
#: ``\\s+(?!\\S)`` backtracking rule.
_STABLE_ALPHABET = (
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " \t\n\r\f\v\x85\xa0  　"
    "'.,!?-_()[]#@$%&*+=/\\|~`^<>\""
    "äöüßéèñçØåΩλДфйשمあ漢字한½¾²"
    "👍🎉"
    "\x1c\x1d\x00\x7f"
)


def test_scanner_equals_published_pattern_property():
    """Hypothesis property: the scanner and the published pattern
    agree on arbitrary text over the stable alphabet (the strongest
    equivalence pin for the split ALGORITHM; see _STABLE_ALPHABET on
    why unassigned-codepoint skew is excluded)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=500, deadline=None)
    @given(st.text(alphabet=_STABLE_ALPHABET, max_size=60))
    def prop(t):
        assert pretokenize_scan(t) == _PAT.findall(t)

    prop()


def test_pretokenize_known_splits():
    assert pretokenize("Hello, world! I'm here.") == [
        "Hello", ",", " world", "!", " I", "'m", " here", ".",
    ]
    assert pretokenize("x  =  42") == ["x", " ", " =", " ", " 42"]
    assert pretokenize("a\n\nb") == ["a", "\n", "\n", "b"]
    assert pretokenize("a\n\n") == ["a", "\n\n"]


def test_hand_computed_merge_walk():
    """'the the' under ranks {Ġ t:0, h e:1, Ġt he:2}: bare 'the'
    merges only h+e (2 tokens); ' the' walks rank 0 then 1 then 2
    down to the single token 'Ġthe' — 3 tokens total."""
    ranks = {("Ġ", "t"): 0, ("h", "e"): 1, ("Ġt", "he"): 2}
    toks = encode_published("the the", ranks)
    assert toks == ["t", "he", "Ġthe"]
    assert count_published_tokens("the the", ranks) == 3


def test_roundtrip_lossless():
    """Byte-level alphabet means ANY text round-trips exactly —
    including emoji, CRLF, and control characters."""
    ranks = {("Ġ", "t"): 0, ("h", "e"): 1}
    for t in _EDGE_VECTORS:
        assert decode_published(encode_published(t, ranks)) == t


def test_merges_file_roundtrip_matches_constant(tmp_path):
    """The l10c constant table written as a merges.txt and parsed by
    load_merges yields identical ranks — the constant IS the
    published-artifact code path."""
    from ipydataclean_spark.operators.llm_quality import L10C_MERGES

    p = tmp_path / "merges.txt"
    p.write_text(
        "#version: 0.2\n"
        + "\n".join(f"{a} {b}" for a, b in L10C_MERGES)
        + "\n",
        encoding="utf-8",
    )
    ranks = load_merges(str(p))
    assert ranks == {m: i for i, m in enumerate(L10C_MERGES)}


def test_l10c_query_matches_recompute(spark, sf_dir):
    """The Spark query's per-doc counts equal an independent
    pure-Python recompute of the full published pipeline."""
    from ipydataclean_spark.operators.llm_quality import (
        L10C_MERGES,
        l10c_published_token_count,
    )

    ranks = {m: i for i, m in enumerate(L10C_MERGES)}
    got = {r.doc_id: r for r in l10c_published_token_count(spark, sf_dir).collect()}
    assert got, "query output must not be empty"

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    checked = 0
    for d in docs:
        if d.text is None or d.text == "":
            continue
        pres = pretokenize(d.text)
        want_n = len(pres)
        want_tok = sum(count_published_tokens(p, ranks) for p in pres)
        row = got[d.doc_id]
        assert row.n_pretokens == want_n, d.doc_id
        assert row.n_published_tokens == want_tok, d.doc_id
        checked += 1
    assert checked > 0
