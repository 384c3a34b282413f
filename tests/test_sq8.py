"""pipeline/similarity.py sq8_topk — scalar-quantized ANN: recall vs
the exact baseline, rank contract, constant-dimension robustness, and
partitioning invariance.  Driver parity at sf0.001/0.01 pins the exact
values against the DuckDB mirror."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (
    brute_force_topk,
    sq8_topk,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return E._emb(spark, SF_DIR)


def test_recall_vs_exact_baseline(spark, emb):
    """8-bit reconstruction barely moves cosine ranks: demand >= 90%
    of the exact top-10 recovered per query (the 4x shortlist absorbs
    quantization rank noise)."""
    exact = brute_force_topk(emb, k=10).collect()
    approx = sq8_topk(emb, k=10).collect()
    want: dict = {}
    for r in exact:
        want.setdefault(r.query_id, set()).add(r.neighbor_id)
    got: dict = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(got) == set(want)
    for qid in want:
        recall = len(want[qid] & got[qid]) / len(want[qid])
        assert recall >= 0.9, (qid, recall)


def test_rank_contract_and_no_self(spark, emb):
    out = sq8_topk(emb, num_queries=4, k=5).collect()
    assert all(r.query_id != r.neighbor_id for r in out)
    by_q: dict = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append((r.rank, r.cos_sim))
    for qid, rows in by_q.items():
        rows.sort()
        assert [r for r, _ in rows] == list(range(1, len(rows) + 1))
        sims = [s for _, s in rows]
        assert sims == sorted(sims, reverse=True), qid


def test_constant_dimension_is_harmless(spark):
    """A zero-spread dimension hits the mx==mn NULL guard: codes
    collapse to the reconstruction midpoint and ranking still works."""
    from pyspark.sql import functions as F

    df = spark.range(30).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda d: F.when(d == 1, F.lit(7.0)).otherwise(
                F.cos(d.cast("double") * (F.col("id") + 1))),
        ).cast("array<float>").alias("embedding"),
    )
    out = sq8_topk(df, num_queries=2, k=3, dim=8)
    assert out.count() == 6


def test_partitioning_invariance(spark, emb):
    a = sorted(map(tuple, sq8_topk(emb, num_queries=2, k=5).collect()))
    b = sorted(map(tuple, sq8_topk(emb.repartition(7),
                                   num_queries=2, k=5).collect()))
    assert a == b
