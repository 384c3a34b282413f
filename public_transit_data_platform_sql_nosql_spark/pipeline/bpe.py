"""Deterministic in-repo BPE subword tokenizer.

A training pipeline buys context windows in MODEL tokens, not whitespace
words — chunk budgets (curation.chunk_tokens), pack budgets
(curation.pack_sequences) and vocabulary counts all change meaning under
a subword vocabulary.  This module ships a fixed merge table as data and
applies it two ways that agree exactly:

- ``bpe_tokens``  — a pure Column expression (JVM-side, no UDF): the
  merge table rides along as an array literal and ONE nested
  ``aggregate`` fold applies it per word piece, so tokenization stays
  inside whole-stage codegen and scales like any other projection.
- ``bpe_encode``  — the literal Python mirror, used by the pytest
  differential and for driver-side inspection.

Semantics (deterministic, engine-independent, documented here as THE
contract): lowercase the text, pre-tokenize with ``text.BPE_REGEX``
(letter runs / digit runs / single punctuation — the byte-level-BPE
pre-split shape), split each piece into characters, then apply each
merge of ``MERGES`` IN TABLE ORDER with one greedy left-to-right pass
(fold: merge when the accumulator's last symbol is the merge's left part
and the incoming symbol its right part).  Compound merges appear after
the merges that build their parts — validated at import.

Whitespace tokenization (core.tokens) remains the oracle-parity default
everywhere; BPE is opt-in via the ``tokenizer=`` parameter on
``chunk_tokens`` / ``vocabulary`` (core.tokens_for).  The merge table is
small (trained offline, shipped as data — the same shape as shipping a
``merges.txt``); swapping in a real model's table is editing this tuple.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Pre-tokenizer shared with text.quality_scores (defined there first).
BPE_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# Fixed merge table: common English digraphs first, compounds after the
# merges that produce their parts.  Order IS priority (applied
# first-to-last, one pass each).
MERGES: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"),                 # th, the
    ("i", "n"), ("in", "g"),                 # in, ing
    ("e", "r"), ("a", "n"), ("r", "e"),
    ("o", "n"), ("a", "t"), ("e", "n"),
    ("o", "r"), ("e", "s"), ("s", "t"),
    ("a", "r"), ("o", "u"), ("l", "e"),
    ("i", "s"), ("i", "t"), ("a", "l"),
    ("e", "d"), ("c", "h"), ("r", "o"),
    ("s", "h"), ("l", "o"), ("w", "i"),
    ("n", "o"), ("m", "a"), ("s", "e"),
    ("d", "e"), ("c", "o"), ("u", "e"),
    ("l", "i"), ("r", "a"), ("t", "a"),
    ("d", "a"), ("da", "ta"),                # da, data
    ("b", "a"), ("ba", "t"), ("bat", "ch"),  # batch
    ("s", "p"), ("sp", "ar"), ("spar", "k"), # spark
    ("w", "in"), ("win", "d"), ("wind", "o"), ("windo", "w"),  # window
    ("q", "u"), ("qu", "er"), ("quer", "y"), # query
    ("a", "b"), ("t", "ab"),                 # ab, tab(le)
    ("f", "i"), ("fi", "l"), ("fil", "t"),   # filt(er)
    ("0", "0"), ("1", "0"),                  # digit pairs
)


def _validate_merges() -> None:
    """Every merge side must be a single character or a token formed by
    an EARLIER merge — otherwise the merge can never fire and the table
    is silently dead weight (or worse, documents an order that the fold
    semantics don't implement)."""
    formed: set[str] = set()
    for i, (a, b) in enumerate(MERGES):
        for side in (a, b):
            if len(side) > 1 and side not in formed:
                raise ValueError(
                    f"MERGES[{i}] = ({a!r}, {b!r}): side {side!r} is "
                    f"multi-char but no earlier merge forms it")
        formed.add(a + b)


_validate_merges()


def _merge_table() -> Column:
    return F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"),
                 F.lit(a + b).alias("ab"))
        for a, b in MERGES
    ])


def _apply_merges(symbols: Column) -> Column:
    """Fold the merge table over a symbol array: outer aggregate walks
    MERGES in order, inner aggregate is the greedy left-to-right pass
    for one merge.  Both engines of the differential (this and
    bpe_encode) implement this exact fold."""
    return F.aggregate(
        _merge_table(),
        symbols,
        lambda acc, m: F.aggregate(
            acc,
            F.array().cast("array<string>"),
            lambda out, x: F.when(
                (F.size(out) > 0)
                & (F.element_at(out, -1) == m["a"]) & (x == m["b"]),
                F.concat(
                    F.slice(out, 1, F.size(out) - 1), F.array(m["ab"])),
            ).otherwise(F.concat(out, F.array(x))),
        ),
    )


def bpe_tokens(text: Column) -> Column:
    """array<string> of BPE subword tokens for ``text`` — pure Column
    expression; empty/blank text yields an empty array (regexp on the
    empty string extracts nothing)."""
    pieces = F.regexp_extract_all(F.lower(text), F.lit(BPE_REGEX), 0)
    return F.flatten(
        F.transform(pieces, lambda p: _apply_merges(F.split(p, ""))))


def bpe_encode(text: str) -> list[str]:
    """Python mirror of ``bpe_tokens`` (same pre-split, same fold)."""
    import re

    out: list[str] = []
    for piece in re.findall(BPE_REGEX, text.lower()):
        syms = list(piece)
        for a, b in MERGES:
            merged: list[str] = []
            for x in syms:
                if merged and merged[-1] == a and x == b:
                    merged[-1] = a + b
                else:
                    merged.append(x)
            syms = merged
        out.extend(syms)
    return out
