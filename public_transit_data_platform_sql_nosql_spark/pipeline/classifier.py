"""Learned quality / domain classifier over the ``documents`` table —
the fastText-style linear bag-of-words filter corpus builds run beside
the heuristic ``quality_scores`` and the bigram-LM ``lm_transition_scores``
(CCNet-style: train a cheap linear model on labeled seed docs, score the
whole corpus, keep what scores above threshold).

The model is a Naive-Bayes log-odds linear classifier made LOG-FREE so
the driver's DuckDB oracle hash-compares every row exactly (same
discipline as the BM25 idf and the LM transition mass): each token's
weight is the difference of its add-one-smoothed per-class likelihoods,
quantized to integer micros BEFORE any summation,

    weight_micro(w) = (c_pos(w)+1) * 1_000_000 DIV (T_pos + V)
                    - (c_neg(w)+1) * 1_000_000 DIV (T_neg + V)

(c_k = occurrences of w in class k, T_k = total class-k tokens, V =
distinct training vocabulary), and a document's score is the integer
mean weight over its tokens (unseen tokens weigh 0 but stay in the
denominator, so vocab coverage dilutes confidence exactly like the real
NB posterior would).  Positive mean -> class 1.

Int64 headroom: c*1e6 stays in int64 up to ~9.2e12 occurrences of one
token per class — beyond that (a ~100T-token corpus where 'the' alone
overflows) promote the two products to decimal(38,0); the DIV chain is
unchanged.

Scale shape: training is explode -> ONE map-side-combined groupBy(token)
(vocabulary-sized output) + a 1-row totals broadcast; scoring is
explode -> ONE hash left-join against the vocabulary-sized weight table
(AQE skew-split absorbs Zipf-hot tokens) -> ONE map-side-combined
groupBy(doc_id).  No all-pairs shape, no UDF, no collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .core import tokens

MICRO = 1_000_000


def token_class_weights(labeled: DataFrame) -> DataFrame:
    """Train: ``(doc_id, text, label in {0,1})`` -> per-token weight table
    ``(token, c_pos, c_neg, weight_micro)``.

    The weight table is vocabulary-sized (the broadcastable model
    artifact); persist it once and reuse across scoring runs.
    """
    tok = labeled.select(
        F.col("label").cast("long").alias("label"),
        F.explode(tokens(F.col("text"))).alias("token"),
    )
    counts = tok.groupBy("token").agg(
        F.sum(F.when(F.col("label") == 1, 1).otherwise(0)).cast("long")
        .alias("c_pos"),
        F.sum(F.when(F.col("label") == 0, 1).otherwise(0)).cast("long")
        .alias("c_neg"),
    )
    totals = counts.agg(
        F.sum("c_pos").cast("long").alias("t_pos"),
        F.sum("c_neg").cast("long").alias("t_neg"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    return (
        counts.join(F.broadcast(totals))
        .select(
            "token", "c_pos", "c_neg",
            F.expr(f"(c_pos + 1) * {MICRO} DIV (t_pos + v) - "
                   f"(c_neg + 1) * {MICRO} DIV (t_neg + v)")
            .cast("long").alias("weight_micro"),
        )
    )


def classifier_scores(docs: DataFrame, labeled: DataFrame) -> DataFrame:
    """Train on ``labeled`` and score EVERY doc in ``docs``: returns
    ``(doc_id, n_tokens, n_vocab_hits, clf_score_micro, predicted)``.

    Empty docs carry 0 tokens and a NULL score/prediction (no evidence —
    never a fake 0, same contract as lm_transition_scores).
    """
    weights = token_class_weights(labeled).select("token", "weight_micro")
    dtok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    agg = (
        dtok.join(weights, "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.count("weight_micro").cast("long").alias("n_vocab_hits"),
            F.expr("sum(coalesce(weight_micro, 0)) DIV count(1)")
            .cast("long").alias("clf_score_micro"),
        )
    )
    return (
        docs.select("doc_id").join(agg, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long")
            .alias("n_tokens"),
            F.coalesce("n_vocab_hits", F.lit(0)).cast("long")
            .alias("n_vocab_hits"),
            "clf_score_micro",
            F.when(F.col("clf_score_micro") > 0, F.lit(1))
            .when(F.col("clf_score_micro").isNotNull(), F.lit(0))
            .cast("long").alias("predicted"),
        )
    )
