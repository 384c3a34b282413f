"""Universal plan lint: EVERY registered driver query must compile to a
physical plan free of unbounded CartesianProduct / BroadcastNestedLoopJoin
operators — the two shapes that turn a 100-TB input into a cluster-killer.

Targeted plan tests (test_plans.py, test_plans_dedup.py) assert positive
properties (broadcasts, pruning, pushdown) on the flagship queries; this
sweep is the negative guard across the WHOLE surface, so a regression in
any operator composition is caught the moment it enters ``queries()``.

A BroadcastNestedLoopJoin is tolerated ONLY for provably bounded sides
(1-row scalar-subquery broadcasts); each allowance is listed with its
justification and asserted to stay 1-row-broadcast-shaped.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from public_transit_data_platform_sql_nosql_spark.plans.inspect import (
    executed_plan,
)
from tests.conftest import SF_DIR

QUERY_NAMES = sorted(entrymod.queries().keys())

# query name -> why a BroadcastNestedLoopJoin there is scale-safe.
# Every entry must be a broadcast of a 1-row (or otherwise O(1)-bounded)
# aggregate: the nested loop then degenerates to a constant-attach pass.
BOUNDED_BNLJ: dict[str, str] = {
    # brute-force ANN: the documented exact baseline — the broadcast side
    # is the bounded query set (similarity.py brute_force_topk docstring);
    # the scale path is ann_lsh/ivf/knn_join, all BNLJ-free.
    "ann_bruteforce_topk": "broadcast side = bounded query set",
    # SQ8: 1-row quantizer-stats broadcast to the scan + the same
    # bounded query-set broadcast as the brute-force baseline
    "ann_sq8_topk": "broadcast sides = 1-row stats + bounded query set",
    # PQ: k-row centroid broadcasts inside the per-subspace kmeans
    # chains (as embedding_kmeans) + the bounded query-set broadcast
    "ann_pq_topk": "broadcast sides = k-row codebooks + bounded queries",
    # IVF x PQ composes the two shapes above: the coarse chain's k-row
    # centroid broadcasts (embedding_kmeans) + the per-subspace
    # codebook chains (ann_pq) + the (queries x nprobe)-row probe
    # table broadcast; every nested-loop side is O(k) or O(queries)
    "ann_ivf_pq_topk": "broadcast sides = k-row centroids/codebooks "
                       "+ bounded probe table",
    # BQ: the bounded query set rides broadcast with a != condition
    # (the brute-force shape); the stream side scans 8-byte halves
    "ann_bq_topk": "broadcast side = bounded query set",
    # nearest-centroid assignment: vectors x broadcast(k centroids),
    # k is a compile-time constant (64) — the loop degenerates to a
    # k-wide constant attach per vector.
    "ann_ivf_topk": "broadcast side = k-row centroid table",
    "embedding_kmeans": "broadcast side = k-row centroid table",
    "semantic_dedup": "broadcast side = k-row centroid table",
    # corpus scalars (N, avgdl): 1-row aggregate broadcast — the classic
    # scalar-subquery plan shape (text.py search_bm25 docstring).
    "text_search_bm25": "broadcast side = 1-row corpus stats",
    # hybrid fusion composes bm25 (1-row stats) + a 1-row dense query
    # vector broadcast; both nested-loop sides are single rows
    "text_hybrid_search": "broadcast sides = 1-row stats + 1-row query",
    "text_tfidf_keywords": "broadcast side = 1-row corpus count",
    # vocabulary-size scalar (V in the add-V smoothing denominator):
    # 1-row aggregate broadcast (text.py lm_transition_scores docstring)
    "text_lm_score": "broadcast side = 1-row vocab count",
    # class totals (T_pos, T_neg, V): 1-row aggregate broadcast attached
    # to the vocab-sized weight table (classifier.py docstring)
    "pipeline_quality_classifier": "broadcast side = 1-row class totals",
    # per-domain share-of-corpus: 1-row total-count broadcast attached
    # to the domain-sized stats table (web.py domain_stats docstring)
    "web_domain_stats": "broadcast side = 1-row corpus total",
    # overlap screen: the two per-side estimate rows are 1-row sketch
    # aggregates attached to the 1-row union-sketch aggregate
    "profile_overlap_kmv": "broadcast sides = 1-row sketch estimates",
    # epoch balancing: rate table = per-source counts x broadcast(1-row
    # max-source-count aggregate) (mixing.py epoch_balance `nmax`) — the
    # same scalar-subquery shape as text_lm_score's vocab count.
    "pipeline_epoch_balance": "broadcast side = 1-row max-source-count",
}


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_no_unbounded_join_shapes(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan, (
        f"{name}: CartesianProduct in physical plan"
    )
    if "BroadcastNestedLoopJoin" in plan:
        assert name in BOUNDED_BNLJ, (
            f"{name}: BroadcastNestedLoopJoin with no bounded-side "
            f"justification in BOUNDED_BNLJ"
        )
