"""From-scratch byte-pair encoding (public algorithm: Sennrich et al.
2016 for training, the GPT-2 greedy-rank merge loop for application)
— closes the README "token counting is a regex proxy" limitation
without any tokenizer library.

Scale design: BPE never touches the corpus row-by-row. Training folds
over the WORD-FREQUENCY table (vocabulary-sized, collected to the
driver — the same bounded pull as every two-phase scalar in this
repo, with a ``max_vocab`` guard); application tokenizes each
DISTINCT word once on the vocabulary table (Python on |vocab| rows,
not |corpus|), producing a (word → n_subtokens) mapping that joins
back to the exploded corpus as a broadcast — so the per-token hot
path is a JVM hash-join lookup, not Python.

Determinism: pair selection breaks ties lexicographically, so the
merge list — and every downstream count — is bit-stable across runs,
partitionings, and cluster sizes.
"""

from __future__ import annotations

from collections import Counter

END = "</w>"


def train_bpe(word_counts: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Learn ``n_merges`` merges from a word-frequency dict. Each word
    is a symbol sequence (chars + terminal </w>); each step merges the
    most frequent adjacent pair (count desc, pair lexicographic asc —
    the deterministic tie-break)."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (END,): c for w, c in word_counts.items() if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break  # nothing recurs; further merges are memorization
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i < len(sym) - 1 and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def apply_bpe(
    word: str,
    ranks: dict[tuple[str, str], int],
    *,
    end_marker: str | None = END,
) -> list[str]:
    """Tokenize one word with a learned merge table: repeatedly apply
    the LOWEST-rank applicable merge (the GPT-2 loop).

    ``end_marker=None`` skips the terminal symbol — the convention of
    GPT-family published merge tables, which operate on bare symbol
    sequences (their end-of-word handling lives in the pre-tokenizer,
    not the merge table). The default ``</w>`` matches ``train_bpe``."""
    sym = list(word) + ([end_marker] if end_marker is not None else [])
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def load_merges(path: str) -> dict[tuple[str, str], int]:
    """Parse a PUBLISHED merges file (the huggingface/GPT-2
    ``merges.txt`` convention: one merge per line, two space-separated
    symbols, rank = line order; ``#``-prefixed header lines and blanks
    skipped) into the ranks dict ``apply_bpe`` consumes.

    This closes the README "published-vocab tokenizer parity"
    limitation for users who HAVE the vocabulary artifact: token
    counts from ``apply_bpe(word, load_merges(p), end_marker=None)``
    follow the published merge order exactly. (Byte-level
    pre-tokenization — GPT-2's bytes→unicode remap and regex split —
    is the caller's contract, as it is for every consumer of a
    merges.txt.) Malformed lines — including duplicated merge pairs,
    where first-wins-and-compact vs HF's last-line-index readings
    diverge on every later rank — raise rather than silently shifting
    or reinterpreting ranks.

    Header handling matches the published convention: only the FIRST
    NON-BLANK line is header-eligible, and only when it starts with
    ``#version`` (BOM-stripped — see utf-8-sig below). Later lines
    beginning with ``#`` are real merges — GPT-2-family tables merge
    ``#``-prefixed symbols (that is how ``##`` becomes a token), so
    a skip-all-comments rule would silently drop them. Trailing CR
    (a CRLF-saved file) is stripped, not folded into the right
    symbol."""
    ranks: dict[tuple[str, str], int] = {}
    # utf-8-sig: a BOM-prefixed file (Windows re-save) must not turn
    # the '#version' header into an accepted rank-0 merge that shifts
    # every later rank (review r07 second pass #1); the header check
    # keys on the first NON-BLANK line for the same reason.
    seen_content = False
    with open(path, encoding="utf-8-sig") as fh:
        for lineno, raw in enumerate(fh, 1):
            line = raw.rstrip("\r\n")
            if not line.strip():
                continue
            if not seen_content and line.startswith("#version"):
                seen_content = True
                continue
            seen_content = True
            parts = line.split(" ")
            if len(parts) != 2 or not parts[0] or not parts[1]:
                raise ValueError(
                    f"{path}:{lineno}: expected 'left right', got {line!r}"
                )
            pair = (parts[0], parts[1])
            # A duplicated merge pair is a malformed table: HF's
            # dict(zip(merges, range(len(merges)))) would silently keep
            # the LAST line's index (no rank compaction), while a
            # first-wins-and-compact rule shifts every later rank —
            # two plausible readings that diverge on every subsequent
            # merge. Consistent with the malformed-line rule above,
            # fail loud instead of picking one (ADVICE r07).
            if pair in ranks:
                raise ValueError(
                    f"{path}:{lineno}: duplicate merge pair {pair!r} "
                    f"(first at rank {ranks[pair]})"
                )
            ranks[pair] = len(ranks)
    return ranks


# ---------------------------------------------------------------------------
# Byte-level pre-tokenization (VERDICT r09 #6) — the GPT-2 convention
# (public: Radford et al. 2019 and the published MIT-licensed
# encoder; both the byte<->unicode remap and the split pattern are
# documented public algorithms, re-implemented here from the spec).
# With these, a user holding a PUBLISHED merges.txt gets end-to-end
# token counts from raw text: pretokenize -> utf-8 bytes -> unicode
# remap -> apply_bpe(end_marker=None) per pretoken.
# ---------------------------------------------------------------------------

#: The published GPT-2 split pattern (regex-module syntax). The
#: from-scratch scanner below implements it without the third-party
#: ``regex`` dependency; tests/test_bpe_published.py certifies
#: equivalence against this pattern when ``regex`` is importable.
GPT2_SPLIT_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"
    r"|\s+(?!\S)|\s+"
)

_CONTRACTIONS = ("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")


def bytes_to_unicode() -> dict[int, str]:
    """The GPT-2 byte->unicode bijection: the 188 'printable' bytes
    (``!``–``~``, ``¡``–``¬``, ``®``–``ÿ``) map to themselves; the
    other 68 (controls, space, DEL, 0xAD) map to 256+n in first-seen
    order, so every byte becomes a VISIBLE character and merge tables
    stay whitespace-free (space = ``Ġ`` = U+0120, newline = ``Ċ``).
    Generated from the published algorithm, not transcribed."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("¡"), ord("¬") + 1))
        + list(range(ord("®"), ord("ÿ") + 1))
    )
    cs = list(bs)
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


_B2U = bytes_to_unicode()
_U2B = {u: b for b, u in _B2U.items()}


def _cat0(ch: str) -> str:
    import unicodedata

    return unicodedata.category(ch)[0]


def _is_ws(ch: str) -> bool:
    """Regex-``\\s`` semantics = the Unicode White_Space property.
    Python's ``str.isspace`` additionally accepts the four ASCII
    information separators (U+001C–U+001F, category Cc), which the
    published pattern treats as ORDINARY characters — found by the
    hypothesis equivalence property, pinned in
    tests/test_bpe_published.py."""
    return ch.isspace() and ch not in "\x1c\x1d\x1e\x1f"


#: Lazily-resolved fast path: the third-party ``regex`` module (a
#: public PyPI package, present in this container as a transitive
#: dependency) compiles the published pattern directly. Resolved at
#: first call — on the WORKER when the closure ships by value — so
#: nothing unpicklable sits at module level and environments without
#: ``regex`` silently use the scanner (equivalence is test-certified,
#: including a hypothesis property).
_GPT2_RE_UNSET = object()
_GPT2_RE = _GPT2_RE_UNSET


def pretokenize(text: str) -> list[str]:
    """Split ``text`` exactly as the published GPT-2 pattern does.
    Uses the ``regex`` C engine when importable; otherwise the
    from-scratch scanner (``pretokenize_scan``)."""
    global _GPT2_RE
    if _GPT2_RE is _GPT2_RE_UNSET:
        try:
            import regex as _regex

            _GPT2_RE = _regex.compile(GPT2_SPLIT_PATTERN)
        except ImportError:
            _GPT2_RE = None
    if _GPT2_RE is not None:
        return _GPT2_RE.findall(text)
    return pretokenize_scan(text)


def pretokenize_scan(text: str) -> list[str]:
    """From-scratch implementation of the published GPT-2 split
    (contractions; optional-single-space + letter/number/other runs;
    whitespace runs that donate their last character to the following
    token), as a scanner over Unicode categories — \\p{L} = category
    L*, \\p{N} = category N*, \\s = ``str.isspace`` — with the
    ``\\s+(?!\\S)`` backtracking rule made explicit: a whitespace run
    followed by non-whitespace yields all but its last character
    (which re-enters as the next token's optional leading space); a
    terminal run is taken whole."""
    out: list[str] = []
    i, n = 0, len(text)
    while i < n:
        hit = next(
            (c for c in _CONTRACTIONS if text.startswith(c, i)), None
        )
        if hit is not None:
            out.append(hit)
            i += len(hit)
            continue
        j = i + 1 if text[i] == " " and i + 1 < n else i
        ch = text[j] if j < n else ""
        if ch and not _is_ws(ch):
            cat = _cat0(ch)
            if cat in ("L", "N"):
                k = j
                while k < n and not _is_ws(text[k]) and _cat0(text[k]) == cat:
                    k += 1
            else:
                k = j
                while (
                    k < n
                    and not _is_ws(text[k])
                    and _cat0(text[k]) not in ("L", "N")
                ):
                    k += 1
            if k > j:
                out.append(text[i:k])
                i = k
                continue
        # whitespace run (text[i] is \s here: the optional-space
        # branches above consumed every non-space start)
        e = i
        while e < n and _is_ws(text[e]):
            e += 1
        if e == n:
            out.append(text[i:e])  # terminal run: lookahead vacuous
            i = e
        elif e - i > 1:
            out.append(text[i : e - 1])  # donate last ws char forward
            i = e - 1
        else:
            out.append(text[i:e])  # single ws char before non-space
            i = e
    return out


def encode_published(text: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Full published-tokenizer pipeline: GPT-2 pretokenize, utf-8
    encode, byte->unicode remap, then ``apply_bpe`` with the published
    merge ranks (``load_merges`` output) per pretoken. Returns tokens
    in the remapped alphabet (space = ``Ġ``...), exactly the strings a
    published merges.txt operates over."""
    out: list[str] = []
    for pre in pretokenize(text):
        mapped = "".join(_B2U[b] for b in pre.encode("utf-8"))
        out.extend(apply_bpe(mapped, ranks, end_marker=None))
    return out


def count_published_tokens(text: str, ranks: dict[tuple[str, str], int]) -> int:
    """Token count under a published merge table (the quantity the
    L10 fertility/budget operators consume)."""
    return len(encode_published(text, ranks))


def decode_published(tokens: list[str]) -> str:
    """Inverse of ``encode_published``: unicode->byte remap and utf-8
    decode — the round-trip property the tests pin (lossless for any
    input text, the point of the byte-level alphabet)."""
    data = bytes(_U2B[ch] for tok in tokens for ch in tok)
    return data.decode("utf-8")


# Worker-side closures (the l10b pandas UDF) reference this module's
# functions; registering the module for cloudpickle BY-VALUE pickling
# makes those closures self-contained — executors never need
# ipydataclean_spark importable (the driver runs from an arbitrary
# cwd with only sys.path pointing here; Python workers inherit
# neither). Pure-stdlib module, so the by-value payload is tiny.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
