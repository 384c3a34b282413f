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
- ``bpe_tokens_scaled`` — the Arrow ``mapInPandas`` path for LARGE
  learned tables (the expression literal stops being viable around a
  few hundred merges): the table travels as data, each batch memoizes
  unique pieces, and a table-validity check picks the fast min-rank
  encoder only when it provably equals the in-order fold.

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


def _table_is_sequential_safe(merges) -> bool:
    """True when min-rank-first application provably equals the in-order
    one-pass-per-merge fold for this table: a pass over merge r can only
    become incomplete if occurrences of its pair appear AFTER round r,
    which requires one of its sides to be (re)formed by a LATER merge
    (two merge paths producing the same token string).  Learned and
    hand-curated tables never do this; the check makes the fast path's
    use of the equivalence explicit instead of assumed."""
    last_form: dict[str, int] = {}
    for i, (a, b) in enumerate(merges):
        last_form[a + b] = i
    for i, (a, b) in enumerate(merges):
        for side in (a, b):
            if len(side) > 1 and last_form.get(side, -1) > i:
                return False
    return True


def bpe_tokens_scaled(df, merges, text_col: str = "text",
                      out_col: str = "bpe_toks"):
    """``bpe_tokens`` for LARGE merge tables: appends ``out_col``
    (array<string> of subword tokens) to ``df`` via one Arrow-batched
    ``mapInPandas`` projection.

    ``bpe_tokens`` inlines the merge table into the Column expression —
    ideal up to a few hundred merges (JVM-side, whole-stage codegen),
    but a 50k-merge production table would explode the generated code.
    Here the table travels AS DATA in the task closure (one copy per
    executor, the broadcast-variable cost class), and each Arrow batch
    is encoded in Python with two exactness-preserving speedups:

    - per-batch memoization of unique pieces (Zipf: a handful of
      frequent words dominate every batch);
    - min-rank-first merging per piece (the standard encoder loop:
      O(active pairs) per piece instead of O(|table|) passes), which
      equals the documented in-order fold whenever
      ``_table_is_sequential_safe`` — checked at call time, with the
      literal fold as the fallback so semantics NEVER drift from
      ``bpe_encode`` (the pytest differential pins both paths).

    NULL text yields NULL (matching ``bpe_tokens``, where the regexp on
    a NULL column propagates); blank text yields an empty array.
    """
    import re

    from pyspark.sql.types import (
        ArrayType,
        StringType,
        StructField,
        StructType,
    )

    merges = tuple((str(a), str(b)) for a, b in merges)
    ranks = {pair: i for i, pair in enumerate(merges)}
    fast = _table_is_sequential_safe(merges)
    # a fresh StructType: StructType.add MUTATES the instance, and
    # df.schema hands back the live object — appending to it makes the
    # DataFrame's own column list lie about its plan
    schema = StructType(
        list(df.schema.fields)
        + [StructField(out_col, ArrayType(StringType()))])

    def _encode_batches(batches):
        pat = re.compile(BPE_REGEX)
        cache: dict[str, list[str]] = {}

        def one_pass(syms: list[str], a: str, b: str,
                     ab: str) -> list[str]:
            merged: list[str] = []
            for x in syms:
                if merged and merged[-1] == a and x == b:
                    merged[-1] = ab
                else:
                    merged.append(x)
            return merged

        def enc_piece(piece: str) -> list[str]:
            got = cache.get(piece)
            if got is not None:
                return got
            syms = list(piece)
            if fast:
                while len(syms) > 1:
                    r = min((ranks.get(p, len(merges))
                             for p in zip(syms, syms[1:])),
                            default=len(merges))
                    if r >= len(merges):
                        break
                    a, b = merges[r]
                    syms = one_pass(syms, a, b, a + b)
            else:
                for a, b in merges:
                    if len(syms) < 2:
                        break
                    syms = one_pass(syms, a, b, a + b)
            cache[piece] = syms
            return syms

        def enc_text(t):
            if t is None:
                return None
            out: list[str] = []
            for piece in pat.findall(str(t).lower()):
                out.extend(enc_piece(piece))
            return out

        for pdf in batches:
            pdf[out_col] = [enc_text(t) for t in pdf[text_col]]
            yield pdf

    return df.mapInPandas(_encode_batches, schema)


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


def _greedy_batch(rows, batch: int):
    """Greedy compatible-merge selection from a round's top-K candidate
    pairs (already in (cnt DESC, a, b) total order): take up to
    ``batch`` pairs whose symbols {a, b, ab} are pairwise DISJOINT from
    every symbol of the already-taken set.  Disjointness makes the
    taken merges non-interacting — applying one cannot create or
    destroy occurrences of another — so their round counts stay exact
    and the application order inside the batch is irrelevant.  Shared
    by the Spark trainer and the Python mirror so the differential
    pins the same selection."""
    taken: list[tuple] = []
    used: set[str] = set()
    for a, b, cnt in rows:
        if len(taken) >= batch:
            break
        if {a, b, a + b} & used:
            continue
        taken.append((a, b, int(cnt)))
        used |= {a, b, a + b}
    return taken


def learn_merges(docs, n_merges: int = 16, batch: int = 1,
                 stats: dict | None = None):
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
    one shuffle + a bounded collect (the argmax is the round's output —
    inherently a driver decision, same bounded-collect class as the
    k-row centroid reads).  ``localCheckpoint`` truncates the
    per-round expression growth exactly as ``embedding_kmeans_iterate``
    does.

    ``batch > 1`` cuts the driver-round count ~batch-fold for large
    targets: each round collects the top ``4 * batch`` candidate pairs
    and greedily keeps up to ``batch`` mutually symbol-disjoint ones
    (see ``_greedy_batch`` — disjointness keeps their counts exact and
    their application order immaterial), then rewrites the vocabulary
    with the whole batch in ONE job.  This is a DOCUMENTED variant of
    classic BPE, not an implementation detail: the classic trainer
    would re-rank after every single merge (e.g. prefer the fresh
    (th, e) over an untouched (h, e)), while the batched one commits
    ``batch`` decisions per ranking — the standard throughput trade of
    parallel BPE trainers.  ``batch=1`` is bit-identical to the classic
    sequential trainer (and is what the driver oracle mirrors);
    ``learn_merges_py`` mirrors every batch size for the differential.
    Real 50k-merge trainings also sample the corpus upstream
    (curation.split) rather than scaling rounds here.

    ``stats``, if given, is filled with ``{"rounds": n}`` — the number
    of driver round-trips actually executed (tests assert the ~N-fold
    cut).
    """
    if batch < 1:
        raise ValueError(f"batch must be >= 1, got {batch!r}")
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
    rounds = 0
    while len(learned) < n_merges:
        rounds += 1
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
            .limit(4 * batch)
            .collect()
        )
        if not pair_counts:
            break
        taken = _greedy_batch(
            [(r["a"], r["b"], r["cnt"]) for r in pair_counts],
            min(batch, n_merges - len(learned)))
        for a, b, cnt in taken:
            learned.append((len(learned), a, b, a + b, cnt))
        nxt = pieces.select(
            _apply_merges(F.col("syms"),
                          [(a, b) for a, b, _ in taken]).alias("syms"),
            "n",
        ).localCheckpoint(eager=True)
        pieces.unpersist()
        pieces = nxt
    pieces.unpersist()
    if stats is not None:
        stats["rounds"] = rounds
    return spark.createDataFrame(
        learned,
        "rank long, left string, right string, merged string, "
        "pair_count long")


def learn_merges_py(texts: list[str], n_merges: int = 16,
                    batch: int = 1) -> list[tuple]:
    """Python mirror of ``learn_merges`` (same pre-split, weighting,
    tiebreak, top-``4*batch`` candidate window, greedy disjoint batch
    selection, and in-order batch rewrite) for the differential tests."""
    import re
    from collections import Counter

    vocab: Counter = Counter()
    for t in texts:
        for piece in re.findall(BPE_REGEX, t.lower()):
            vocab[piece] += 1
    syms = {p: list(p) for p in vocab}
    out: list[tuple] = []
    while len(out) < n_merges:
        pc: Counter = Counter()
        for p, n in vocab.items():
            s = syms[p]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        ranked = sorted(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        taken = _greedy_batch(
            [(a, b, cnt) for (a, b), cnt in ranked[:4 * batch]],
            min(batch, n_merges - len(out)))
        for a, b, cnt in taken:
            out.append((len(out), a, b, a + b, cnt))
        for p in syms:
            s = syms[p]
            for a, b, _ in taken:
                merged: list[str] = []
                for x in s:
                    if merged and merged[-1] == a and x == b:
                        merged[-1] = a + b
                    else:
                        merged.append(x)
                s = merged
            syms[p] = s
    return out
