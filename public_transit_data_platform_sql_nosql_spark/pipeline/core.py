"""Shared primitives for the training-data pipeline operators.

Everything here is expressed with Spark built-in / higher-order Column
functions (JVM-side, no Python UDFs) and has a 1:1 DuckDB list-function
mirror used by the differential oracles (pipeline/oracles.py):

  ================  =========================  ==========================
  concept           Spark                      DuckDB
  ================  =========================  ==========================
  tokens            split(s, '\\s+')           string_split_regex(s,'\\s+')
  char codes        transform+ascii            list_transform+unicode
  left fold         aggregate(arr, 0L, f)      list_reduce(list_prepend(0,
                                               arr), f)
  shingles          transform(sequence(...))   list_transform(range(...))
  ================  =========================  ==========================

All hashes are pure integer arithmetic mod P = 1_000_000_007 with
coefficients small enough that no intermediate exceeds int64 (Spark 4 runs
ANSI mode: overflow would *throw*, not wrap).  At 100 TB you would swap the
char-fold for ``xxhash64`` (one JVM intrinsic per token); the arithmetic
hash exists so two independent engines can verify identical outputs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

P = 1_000_000_007

# deterministic minhash coefficients: h_j(s) = ((2j+3)*s + 5j+7) % P
NUM_MINHASHES = 16
LSH_BANDS = 4
LSH_ROWS = NUM_MINHASHES // LSH_BANDS

SIMHASH_BITS = 32
SIMHASH_CHUNKS = 4  # 8-bit chunks for candidate banding

# ngram-Jaccard skew/size guards, mirrored 1:1 by the DuckDB oracle so both
# shapes implement the same contract at any scale (see pipeline/dedup.py
# ngram_jaccard_pairs for the recall trade each one makes)
NGRAM_MAX_DF = 1000        # prune shingles hotter than this from candidates
NGRAM_MAX_SET = 10_000     # per-doc shingle-set cap (bottom-k by hash value)

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")


def tokens(text: Column) -> Column:
    """Lower-cased whitespace tokens; empty/blank text -> empty array."""
    t = F.lower(F.trim(text))
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, r"\s+")
    )


def tokens_for(text: Column, tokenizer: str = "whitespace") -> Column:
    """Pluggable tokenizer selector for the operators whose budgets are
    measured in tokens (chunk_tokens, pack budgets via its counts,
    vocabulary): ``whitespace`` is the oracle-parity default (DuckDB
    mirrors it 1:1); ``bpe`` switches to the deterministic subword
    tokenizer (pipeline/bpe.py) so budgets mean MODEL tokens — verified
    by a Python-mirror differential instead of a SQL oracle."""
    if tokenizer == "whitespace":
        return tokens(text)
    if tokenizer == "bpe":
        from .bpe import bpe_tokens

        return bpe_tokens(text)
    raise ValueError(
        f"unknown tokenizer {tokenizer!r} (expected 'whitespace' or 'bpe')")


def char_fold_hash(s: Column) -> Column:
    """Polynomial rolling hash of a string: fold (acc*31 + code) % P."""
    return F.aggregate(
        F.split(s, ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c)) % P,
    )


def token_hashes(toks: Column) -> Column:
    """array<long> of per-token polynomial hashes."""
    return F.transform(toks, lambda t: char_fold_hash(t))


def md5_hash64(s: Column) -> Column:
    """String -> long in [0, P): top 60 bits of md5, reduced mod P.

    Unlike the char-fold this runs entirely in codegen'd JVM expressions
    (md5/substring/conv), ~10x faster per row, and DuckDB computes the
    identical value via CAST('0x' || substr(md5(s),1,15) AS BIGINT) % P.
    The mod-P reduction keeps every downstream (a*s + b) % P in int64
    under ANSI mode."""
    return (
        F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long") % P
    )


def bounded_rank(df, order_cols: list[Column], rank_col: str,
                 start: int = 1):
    """Row-number a provably BOUNDED DataFrame (a TakeOrdered top-k
    pool, a k-row seed list) by ``order_cols`` ascending — without a
    partition-less ``Window``, whose single-partition WindowExec WARN
    would fire on every run and bury real plan regressions.

    Shape: ONE global aggregate collects the input into a sorted array
    (legal only because the caller's input is bounded by construction —
    never use on an unbounded table), then ``posexplode`` hands back
    every original column plus ``rank_col`` = position + ``start``.
    Ties on ``order_cols`` fall through to the remaining columns via
    struct comparison; pass a unique key as the last order column to
    make the rank total.  DESC orderings: negate the column (use an
    exact integer key — see hybrid_search's micro-quantized cosine).
    """
    ordered = F.struct(
        *[c.alias(f"_o{i}") for i, c in enumerate(order_cols)],
        F.struct(*[F.col(c) for c in df.columns]).alias("_row"))
    return (
        df.agg(F.array_sort(F.collect_list(ordered)).alias("_a"))
        .select(F.posexplode("_a").alias("_pos", "_s"))
        .select((F.col("_pos") + F.lit(int(start))).cast("long")
                .alias(rank_col),
                F.col("_s._row.*"))
    )


def dot(a: Column, b: Column) -> Column:
    """Left-fold double dot product — the fold order matches DuckDB's
    ``list_reduce`` so cross-engine sums are bit-identical."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / F.sqrt(dot(a, a)) / F.sqrt(dot(b, b))
