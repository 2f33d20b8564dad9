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


# Worker-side closures (the l10b pandas UDF) reference this module's
# functions; registering the module for cloudpickle BY-VALUE pickling
# makes those closures self-contained — executors never need
# ipydataclean_spark importable (the driver runs from an arbitrary
# cwd with only sys.path pointing here; Python workers inherit
# neither). Pure-stdlib module, so the by-value payload is tiny.
import sys as _sys

from pyspark import cloudpickle as _cloudpickle

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
