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
