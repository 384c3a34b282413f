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


def _merge_table(merges) -> Column:
    return F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b"),
                 F.lit(a + b).alias("ab"))
        for a, b in merges
    ])


def _apply_merges(symbols: Column, merges) -> Column:
    """Fold the merge table over a symbol array: outer aggregate walks
    the merges in order, inner aggregate is the greedy left-to-right
    pass for one merge.  Both engines of the differential (this and
    bpe_encode) implement this exact fold."""
    return F.aggregate(
        _merge_table(merges),
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


def bpe_tokens(text: Column, merges=None) -> Column:
    """array<string> of BPE subword tokens for ``text`` — pure Column
    expression; empty/blank text yields an empty array (regexp on the
    empty string extracts nothing).  ``merges`` defaults to the shipped
    table; pass a learned one (``learn_merges`` collected to tuples) to
    tokenize with it."""
    pieces = F.regexp_extract_all(F.lower(text), F.lit(BPE_REGEX), 0)
    return F.flatten(
        F.transform(
            pieces,
            lambda p: _apply_merges(F.split(p, ""),
                                    MERGES if merges is None else merges)))


def bpe_encode(text: str, merges=None) -> list[str]:
    """Python mirror of ``bpe_tokens`` (same pre-split, same fold)."""
    import re

    out: list[str] = []
    for piece in re.findall(BPE_REGEX, text.lower()):
        syms = list(piece)
        for a, b in (MERGES if merges is None else merges):
            merged: list[str] = []
            for x in syms:
                if merged and merged[-1] == a and x == b:
                    merged[-1] = a + b
                else:
                    merged.append(x)
            syms = merged
        out.extend(syms)
    return out


def learn_merges(docs, n_merges: int = 16):
    """Learn a BPE merge table FROM the corpus — the tokenizer-training
    step upstream of everything ``tokenizer="bpe"`` consumes.  Returns a
    DataFrame ``(rank, left, right, merged, pair_count)`` with one row
    per learned merge in priority order; feed
    ``[(r.left, r.right) ...]`` to ``bpe_tokens``/``bpe_encode``.

    Algorithm (classic BPE training, re-shaped for the engine): ONE
    corpus pass builds the piece-frequency table (regexp pre-split +
    map-side-combined groupBy — the same trick real trainers use:
    iterate over the WORD-FREQUENCY dict, never the corpus), then each
    round counts adjacent symbol pairs weighted by piece frequency,
    collects the single argmax row (count DESC, pair ASC — total order,
    so the learned table is engine-deterministic), and rewrites the
    symbol arrays with that one merge.

    Scale: per-round cost is |distinct pieces| (vocabulary-sized, NOT
    corpus-sized); the corpus is scanned exactly once.  Each round is
    one shuffle + a ONE-ROW collect (the argmax is the round's output —
    inherently a driver decision, same bounded-collect class as the
    k-row centroid reads).  ``localCheckpoint`` truncates the
    per-round expression growth exactly as ``embedding_kmeans_iterate``
    does.  Real 50k-merge trainings run this on a corpus SAMPLE —
    sample upstream (curation.split) rather than scaling rounds here.
    """
    spark = docs.sparkSession
    pieces = (
        docs.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit(BPE_REGEX), 0)
            ).alias("piece"))
        .groupBy("piece")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.split("piece", "").alias("syms"), "n")
        .localCheckpoint(eager=True)
    )
    learned: list[tuple] = []
    for rank in range(n_merges):
        pair_counts = (
            pieces.select(
                F.explode(
                    F.when(
                        F.size("syms") >= 2,
                        F.transform(
                            F.sequence(F.lit(1), F.size("syms") - 1),
                            lambda i: F.struct(
                                F.element_at(F.col("syms"), i).alias("a"),
                                F.element_at(F.col("syms"), i + 1)
                                .alias("b")),
                        ),
                    ).otherwise(
                        F.array().cast(
                            "array<struct<a:string,b:string>>"))
                ).alias("p"),
                "n",
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("n").cast("long").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
            .collect()
        )
        if not pair_counts:
            break
        best = pair_counts[0]
        a, b, cnt = best["a"], best["b"], int(best["cnt"])
        learned.append((rank, a, b, a + b, cnt))
        nxt = pieces.select(
            _apply_merges(F.col("syms"), [(a, b)]).alias("syms"), "n"
        ).localCheckpoint(eager=True)
        pieces.unpersist()
        pieces = nxt
    pieces.unpersist()
    return spark.createDataFrame(
        learned,
        "rank long, left string, right string, merged string, "
        "pair_count long")


def learn_merges_py(texts: list[str], n_merges: int = 16) -> list[tuple]:
    """Python mirror of ``learn_merges`` (same pre-split, weighting,
    tiebreak, and single-merge rewrite) for the differential tests."""
    import re
    from collections import Counter

    vocab: Counter = Counter()
    for t in texts:
        for piece in re.findall(BPE_REGEX, t.lower()):
            vocab[piece] += 1
    syms = {p: list(p) for p in vocab}
    out: list[tuple] = []
    for rank in range(n_merges):
        pc: Counter = Counter()
        for p, n in vocab.items():
            s = syms[p]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((rank, a, b, a + b, cnt))
        for p in syms:
            merged: list[str] = []
            for x in syms[p]:
                if merged and merged[-1] == a and x == b:
                    merged[-1] = a + b
                else:
                    merged.append(x)
            syms[p] = merged
    return out
