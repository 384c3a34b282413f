"""pipeline/classifier.py — log-free NB linear classifier.  Cross-engine
exactness is pinned by the driver differential (the registered
pipeline_quality_classifier entry); here we pin the hand-checkable
weight math, the empty-doc NULL contract, and the thing the hash oracle
cannot express: that the learned model actually separates the classes
it was trained on.
"""

from __future__ import annotations

import __spark_entry__ as entrymod
from public_transit_data_platform_sql_nosql_spark.pipeline.classifier import (
    MICRO,
    classifier_scores,
    token_class_weights,
)
from tests.conftest import SF_DIR


def _labeled(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_weights_hand_checked(spark):
    # class 1: "good good fine", class 0: "bad bad fine"
    lab = _labeled(spark, [(1, "good good fine", 1), (2, "bad bad fine", 0)])
    w = {r["token"]: r.asDict()
         for r in token_class_weights(lab).collect()}
    # T_pos = 3, T_neg = 3, V = 3
    assert w["good"]["c_pos"] == 2 and w["good"]["c_neg"] == 0
    assert w["good"]["weight_micro"] == 3 * MICRO // 6 - 1 * MICRO // 6
    assert w["bad"]["weight_micro"] == 1 * MICRO // 6 - 3 * MICRO // 6
    assert w["fine"]["weight_micro"] == 2 * MICRO // 6 - 2 * MICRO // 6


def test_scores_and_null_contracts(spark):
    lab = _labeled(spark, [(1, "good good fine", 1), (2, "bad bad fine", 0)])
    docs = spark.createDataFrame(
        [(10, "good stuff"), (11, "bad stuff"), (12, ""), (13, "zzz qqq")],
        "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in classifier_scores(docs, lab).collect()}
    assert out[10]["predicted"] == 1 and out[11]["predicted"] == 0
    # unseen token dilutes but keeps the sign: n_vocab_hits counts it out
    assert out[10]["n_vocab_hits"] == 1 and out[10]["n_tokens"] == 2
    # empty doc: zero tokens, NULL score AND NULL prediction — no evidence
    assert out[12]["n_tokens"] == 0
    assert out[12]["clf_score_micro"] is None
    assert out[12]["predicted"] is None
    # fully-out-of-vocab doc: score is exactly 0, predicted 0 (not NULL)
    assert out[13]["n_vocab_hits"] == 0
    assert out[13]["clf_score_micro"] == 0 and out[13]["predicted"] == 0


def test_model_separates_learnable_classes_on_holdout(spark):
    """The semantic property no hash oracle pins: on data where the
    classes ARE separable (two overlapping vocabularies with distinct
    class-conditional token rates), the model trained on half the docs
    must be near-perfect on the unseen half.  (The registered driver
    entry trains on the synthetic corpus's lang column, which is
    independent of its synthetic text — that entry pins cross-engine
    exactness, THIS test pins learning.)"""
    import random

    rng = random.Random(42)
    pos_vocab = ["clean", "prose", "clear", "useful", "shared"]
    neg_vocab = ["spam", "junk", "noise", "click", "shared"]
    rows = []
    for i in range(200):
        label = i % 2
        vocab = pos_vocab if label else neg_vocab
        text = " ".join(rng.choice(vocab) for _ in range(30))
        rows.append((i, text, label))
    train = _labeled(spark, [r for r in rows if r[0] % 4 != 0])
    holdout = [r for r in rows if r[0] % 4 == 0]
    docs = spark.createDataFrame([(i, t) for i, t, _ in holdout],
                                 "doc_id long, text string")
    pred = {r["doc_id"]: r["predicted"]
            for r in classifier_scores(docs, train).collect()}
    truth = {i: lab for i, _, lab in holdout}
    acc = sum(pred[i] == truth[i] for i in pred) / len(pred)
    assert acc >= 0.95, acc


def test_driver_entry_scores_every_doc(spark):
    """The registered entry must score EVERY corpus doc (train and val),
    with NULL only for empty docs — drops here would silently shrink the
    curated corpus downstream."""
    rows = entrymod.queries()["pipeline_quality_classifier"](
        spark, SF_DIR).collect()
    assert len(rows) > 0
    assert {r["split"] for r in rows} == {"train", "val"}
    for r in rows:
        if r["n_tokens"] == 0:
            assert r["clf_score_micro"] is None and r["predicted"] is None
        else:
            assert r["clf_score_micro"] is not None
            assert r["predicted"] in (0, 1)
