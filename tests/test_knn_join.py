"""knn_join_lsh: batch kNN join semantics — self-neighbor exclusion,
multi-probe recall of a planted near-duplicate, ranking parity with the
brute-force path on the candidates it surfaces, and plan shape."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (
    knn_join_lsh,
)
from public_transit_data_platform_sql_nosql_spark.plans import plan_summary
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb_aug(spark):
    return E._emb_aug(spark, SF_DIR)


def test_planted_near_dups_found(spark, emb_aug):
    """emb_aug plants a ~0.999-cosine copy of every 5th vector at
    vec_id + 1_000_000; querying the originals must surface the copy as
    the TOP neighbor (sign-buckets of near-identical vectors match)."""
    queries = emb_aug.filter("vec_id % 5 = 0 AND vec_id < 1000000")
    out = knn_join_lsh(queries, emb_aug, k=3).collect()
    top1 = {r.query_id: r.neighbor_id for r in out if r.rank == 1}
    planted = [q for q in top1 if q % 5 == 0]
    assert planted, "fixture must produce queries"
    hits = sum(1 for q in planted if top1[q] == q + 1_000_000)
    # multi-probe LSH: allow a small miss rate, demand >= 90% recall@1
    assert hits >= 0.9 * len(planted), (hits, len(planted))


def test_no_self_matches_and_rank_contract(spark, emb_aug):
    out = knn_join_lsh(emb_aug.filter("vec_id < 40"), emb_aug,
                       k=4).collect()
    assert all(r.query_id != r.neighbor_id for r in out)
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.rank, r.cos_sim))
    for q, rows in by_q.items():
        rows.sort()
        ranks = [x[0] for x in rows]
        assert ranks == list(range(1, len(ranks) + 1)), (q, ranks)
        sims = [x[1] for x in rows]
        assert sims == sorted(sims, reverse=True), (q, sims)


def test_plan_no_cartesian_and_validation(spark, emb_aug):
    df = knn_join_lsh(emb_aug.filter("vec_id < 10"), emb_aug, k=2)
    assert plan_summary(df)["cartesian_products"] == 0
    with pytest.raises(ValueError):
        knn_join_lsh(emb_aug, emb_aug, k=0)


def test_ann_recall_metric(spark):
    """ann_recall vs hand-computed per-query recall on lsh vs brute
    force; a query missing from the approx side still reports 0."""
    from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (  # noqa: E501
        ann_recall,
        brute_force_topk,
        lsh_topk,
    )
    from public_transit_data_platform_sql_nosql_spark.sources.tpch_adapter import (  # noqa: E501
        register_tpch,
    )
    from tests.conftest import SF_DIR

    emb = register_tpch(spark, SF_DIR, ("embeddings",))["embeddings"]
    exact = brute_force_topk(emb, num_queries=8, k=10)
    approx = lsh_topk(emb, num_queries=8, k=10)
    got = {r["query_id"]: (r["n_exact"], r["n_hit"], r["recall_permille"])
           for r in ann_recall(approx, exact).collect()}

    ex = {}
    for r in exact.collect():
        ex.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ap = {}
    for r in approx.collect():
        ap.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(got) == set(ex)
    for q, nbrs in ex.items():
        hit = len(nbrs & ap.get(q, set()))
        assert got[q] == (len(nbrs), hit, hit * 1000 // len(nbrs)), q

    # drop one query from the approx side entirely -> 0 recall, present
    pruned = approx.filter("query_id != 0")
    g0 = {r["query_id"]: r["n_hit"]
          for r in ann_recall(pruned, exact).collect()}
    assert g0[0] == 0
