"""Plan-shape guardrails for the dedup cluster operators: candidate
generation and group assembly must stay join-based (no cartesian
products), and the keep-one anti-join must plan as a hash join."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from public_transit_data_platform_sql_nosql_spark.pipeline import dedup
from public_transit_data_platform_sql_nosql_spark.plans import (
    executed_plan,
    plan_summary,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return E._aug(spark, SF_DIR)


def test_minhash_pairs_no_cartesian(docs):
    s = plan_summary(dedup.minhash_lsh_pairs(docs))
    assert s["cartesian_products"] == 0


def test_keep_canonical_plans_hash_anti_join(spark, docs):
    labels = spark.createDataFrame(
        [("d1", "d1"), ("d2", "d1")], "doc_id string, canonical_id string")
    df = dedup.keep_canonical(docs, labels)
    plan = executed_plan(df)
    assert "LeftAnti" in plan, plan
    s = plan_summary(df)
    assert s["cartesian_products"] == 0


def test_cluster_rounds_no_cartesian(spark):
    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "doc_a string, doc_b string")
    s = plan_summary(dedup.dedup_clusters(pairs))
    assert s["cartesian_products"] == 0


def test_cluster_max_iters_exhaustion_raises(spark):
    """A 5-node chain needs >1 round; a 1-round cap must raise, never
    silently return half-merged labels."""
    chain = spark.createDataFrame(
        [(f"d{i}", f"d{i+1}") for i in range(5)],
        "doc_a string, doc_b string")
    with pytest.raises(RuntimeError, match="still converging"):
        dedup.dedup_clusters(chain, max_iters=1)


def test_ngram_df_cap_bounds_skewed_candidates(spark):
    """One shingle shared by every doc must not produce n**2 candidate
    pairs once its document frequency exceeds the cap."""
    n_docs = 40
    docs = spark.createDataFrame(
        [(i, f"x y z u{i} v{i} w{i}") for i in range(n_docs)],
        "doc_id long, text string")
    sh = dedup.shingle_table(docs)
    uncapped = dedup.ngram_candidates(sh, max_df=n_docs).count()
    capped = dedup.ngram_candidates(sh, max_df=5).count()
    assert uncapped == n_docs * (n_docs - 1) // 2   # the skew bomb
    assert capped == 0                              # hot shingle pruned


def _py_shingle_hashes(text: str) -> set[int]:
    """Python mirror of shingle_table's md5 hash (tests the Spark shape
    against independent arithmetic, like the DuckDB oracle does)."""
    import hashlib

    P = 1_000_000_007
    toks = text.lower().strip().split()
    if len(toks) >= 3:
        grams = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
    else:
        grams = [" ".join(toks)]
    return {int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % P
            for g in grams}


def test_ngram_set_cap_scores_bottom_k(spark):
    """A doc with more distinct shingles than max_set_size is scored on
    its bottom-k (smallest-hash) sketch — bounded per-row array, score
    matches the same sketch computed independently in Python."""
    base = " ".join(f"tok{i}" for i in range(60))
    variant = " ".join(f"tok{i}" if i % 10 else f"alt{i}"
                       for i in range(60))
    docs = spark.createDataFrame(
        [(1, base), (2, variant)], "doc_id long, text string")
    k = 20
    rows = dedup.ngram_jaccard_pairs(
        docs, threshold=0.0, max_set_size=k).collect()
    assert len(rows) == 1
    sa = set(sorted(_py_shingle_hashes(base))[:k])
    sb = set(sorted(_py_shingle_hashes(variant))[:k])
    inter = len(sa & sb)
    expected = round(inter / (len(sa) + len(sb) - inter), 6)
    assert rows[0]["n_common"] == inter
    assert abs(rows[0]["jaccard"] - expected) < 1e-9


def test_ngram_scoring_uses_full_sets(spark):
    """The df cap prunes candidate GENERATION only — a surviving pair's
    jaccard must still count the hot shingles it shares."""
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g"), (3, "a b c x y z")],
        "doc_id long, text string")
    # "a b c" has df=3; cap at 2 prunes it from the index, but docs 1/2
    # still collide on "b c d"/"c d e" and their jaccard counts all
    # 3 shared shingles (of 4 distinct each => 3/(4+4-3))
    rows = {(r["doc_a"], r["doc_b"]): r
            for r in dedup.ngram_jaccard_pairs(
                docs, threshold=0.3, max_df=2).collect()}
    assert (1, 2) in rows
    assert rows[(1, 2)]["n_common"] == 3
    assert abs(rows[(1, 2)]["jaccard"] - 3 / 5) < 1e-6


def test_embedding_hot_label_sub_blocked(spark):
    """One hot label (every vector in the same coarse cluster) must NOT
    produce all n**2/2 candidate pairs: the banded sign-buckets split the
    block, while an exact-duplicate pair (same bucket in every band) is
    always a candidate."""
    import math

    n, dim = 24, 64
    rows = [
        (i, 0, [float(((i * 31 + d * 7) % 13) - 6) for d in range(dim)])
        for i in range(n)
    ]
    # exact duplicate of vec 0 -> identical buckets in every band
    rows.append((n, 0, rows[0][2]))
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>")
    # threshold=-1 keeps every candidate: measures the blocking itself
    cand = dedup.embedding_near_dup(emb, threshold=-1.0).count()
    all_pairs = (n + 1) * n // 2
    assert cand < all_pairs, (cand, all_pairs)
    dups = dedup.embedding_near_dup(emb, threshold=0.98).collect()
    assert any({r["vec_a"], r["vec_b"]} == {0, n} for r in dups)
    s = plan_summary(dedup.embedding_near_dup(emb))
    assert s["cartesian_products"] == 0


def test_cluster_chain_converges_logarithmically(spark):
    """Pointer jumping: a 64-node chain (worst-case diameter) must
    converge in O(log N) rounds — 8 observed, 10 allowed for slack —
    where plain neighbor-min propagation would need 63."""
    n = 64
    chain = spark.createDataFrame(
        [(f"d{i:03d}", f"d{i+1:03d}") for i in range(n - 1)],
        "doc_a string, doc_b string")
    rows = dedup.dedup_clusters(chain, max_iters=10).collect()
    assert len(rows) == n
    assert all(r["canonical_id"] == "d000" for r in rows)


def test_decontaminate_drops_eval_overlaps(spark):
    """A train doc that copies an eval doc's text must be reported and
    dropped; a disjoint doc survives.  The overlap join is hash-based
    (no cartesian)."""
    train = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog"),
         (2, "completely unrelated words nothing shared here at all")],
        "doc_id long, text string")
    ev = spark.createDataFrame(
        [(100, "quick brown fox jumps over the lazy")],
        "doc_id long, text string")
    report = dedup.decontaminate_report(train, ev, min_common=3)
    assert [r["doc_id"] for r in report.collect()] == [1]
    clean = dedup.drop_contaminated(train, report)
    assert [r["doc_id"] for r in clean.collect()] == [2]
    assert plan_summary(report)["cartesian_products"] == 0


def test_ngram_union_bottom_k_estimator(spark):
    """The opt-in unbiased union-bottom-k estimator matches the same
    computation done independently in Python, and equals exact Jaccard
    when docs fit under the cap."""
    base = " ".join(f"tok{i}" for i in range(60))
    variant = " ".join(f"tok{i}" if i % 10 else f"alt{i}"
                       for i in range(60))
    docs = spark.createDataFrame(
        [(1, base), (2, variant)], "doc_id long, text string")
    k = 20
    rows = dedup.ngram_jaccard_pairs(
        docs, threshold=0.0, max_set_size=k,
        sketch_estimator="union").collect()
    assert len(rows) == 1
    sa = set(sorted(_py_shingle_hashes(base))[:k])
    sb = set(sorted(_py_shingle_hashes(variant))[:k])
    uk = sorted(sa | sb)[:k]
    in_both = sum(1 for h in uk if h in sa and h in sb)
    assert rows[0]["n_common"] == in_both
    assert abs(rows[0]["jaccard"] - round(in_both / len(uk), 6)) < 1e-9
    # under the cap both estimators are the exact Jaccard
    small = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e g")],
        "doc_id long, text string")
    r_pair = dedup.ngram_jaccard_pairs(small, threshold=0.0).collect()[0]
    r_union = dedup.ngram_jaccard_pairs(
        small, threshold=0.0, sketch_estimator="union").collect()[0]
    assert r_pair["jaccard"] == r_union["jaccard"]
