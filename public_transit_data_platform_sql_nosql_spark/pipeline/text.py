"""Text-analysis operators over the ``documents`` table: token counting,
quality scoring, language ID, and document fingerprinting.

All four are single-pass, shuffle-free per-document projections (narrow
transformations): at 100 TB they scale linearly with input splits and
never repartition.  Everything is built-in Column expressions — no Python
UDFs — so the whole stage stays inside WholeStageCodegen/JVM.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .core import STOPWORDS, char_fold_hash, token_hashes, tokens

# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
# the shape of a byte-level BPE split (without the merges table).
BPE_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

# tiny per-language marker lexicons for the n-gram/stopword language ID
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "is", "to"),
    "fr": ("le", "la", "les", "et", "une", "est"),
    "es": ("el", "los", "una", "y", "que", "es"),
    "de": ("der", "die", "das", "und", "ist", "ein"),
}


def token_counts(docs: DataFrame) -> DataFrame:
    """Whitespace token count + BPE-ish piece count + char count."""
    toks = tokens(F.col("text"))
    pieces = F.regexp_extract_all(F.lower(F.col("text")),
                                  F.lit(BPE_REGEX), 0)
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(pieces).cast("long").alias("n_bpe_pieces"),
        F.length("text").cast("long").alias("n_chars"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / punctuation / stopword heuristics -> quality in [0, 1].

    The score blends four signals a pretraining filter would use:
    enough tokens, low punctuation density, a natural stopword rate,
    and plausible mean word length.
    """
    toks = tokens(F.col("text"))
    n_tok = F.size(toks).cast("long")
    n_chars = F.length("text").cast("long")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS)))
    n_punct = F.length(
        F.regexp_replace(F.lower(F.col("text")), r"[a-z0-9\s]", "")
    )
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1)).cast("double")
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1)).cast("double")
    mean_word_len = n_chars / F.greatest(n_tok, F.lit(1)).cast("double")
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.3
        + (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
        + F.when((stop_ratio >= 0.03) & (stop_ratio <= 0.6),
                 F.lit(1.0)).otherwise(F.lit(0.5)) * 0.2
        + F.least(mean_word_len / F.lit(8.0), F.lit(1.0)) * 0.2
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(mean_word_len, 6).alias("mean_word_len"),
        F.round(score, 6).alias("quality_score"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Marker-lexicon language ID: hits per language, argmax with a
    deterministic (score, lang)-max tiebreak; zero hits -> 'und'."""
    toks = tokens(F.col("text"))
    scored = F.array(
        *[
            F.struct(
                F.size(F.filter(toks, lambda t: t.isin(*marks)))
                .cast("long").alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, marks in LANG_MARKERS.items()
        ]
    )
    best = F.array_max(scored)
    return docs.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.when(best["score"] > 0, best["lang"]).otherwise("und")
        .alias("predicted_lang"),
        best["score"].alias("marker_hits"),
    )


def fingerprints(docs: DataFrame) -> DataFrame:
    """Rolling-hash document fingerprint + cheap content signature
    (min token hash) for fast prefilter joins."""
    toks = tokens(F.col("text"))
    return docs.select(
        "doc_id",
        char_fold_hash(F.col("text")).alias("fingerprint"),
        F.array_min(token_hashes(toks)).alias("min_token_hash"),
        F.size(toks).cast("long").alias("n_tokens"),
    )
