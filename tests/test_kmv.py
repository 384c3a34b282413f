"""pipeline/profile.py kmv_distinct — the oracle-able cardinality
sketch: exactness under k, error bound over k, null handling, and the
TakeOrderedAndProject plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from public_transit_data_platform_sql_nosql_spark.pipeline.profile import (
    KMV_K,
    kmv_distinct,
)


def test_exact_when_under_k(spark):
    df = spark.range(40).select(
        F.col("id"),
        (F.col("id") % 7).alias("m7"),
        F.lit(None).cast("string").alias("void"),
    )
    got = {r["column"]: r for r in
           kmv_distinct(df, ["id", "m7", "void"]).collect()}
    # 40 and 7 distinct values: both under k=64 -> exact
    assert got["id"]["est_distinct"] == 40
    assert got["id"]["n_sketch"] == 40
    assert got["m7"]["est_distinct"] == 7
    # all-NULL column: empty sketch, estimate 0
    assert got["void"]["n_sketch"] == 0
    assert got["void"]["kth_hash"] is None
    assert got["void"]["est_distinct"] == 0


def test_error_bound_over_k(spark):
    """KMV stderr ~ 1/sqrt(k-2) ~= 13% at k=64; assert a 3-sigma band
    on cardinalities 100x past the sketch size.  Duplicates must not
    bias the estimate (hash-distinct before the k-minimum)."""
    df = spark.range(200_000).select(
        (F.col("id") % 6400).alias("c6400"),
        (F.col("id") % 40_000).alias("c40000"),
    )
    got = {r["column"]: r["est_distinct"]
           for r in kmv_distinct(df, ["c6400", "c40000"]).collect()}
    for col, truth in (("c6400", 6400), ("c40000", 40_000)):
        assert abs(got[col] - truth) / truth < 0.40, (col, got[col])


def test_estimate_is_deterministic_and_insensitive_to_partitioning(spark):
    df = spark.range(10_000).select((F.col("id") % 3000).alias("v"))
    a = kmv_distinct(df, ["v"]).head()
    b = kmv_distinct(df.repartition(13), ["v"]).head()
    assert a["est_distinct"] == b["est_distinct"]
    assert a["kth_hash"] == b["kth_hash"]
    assert a["n_sketch"] == KMV_K


def test_plan_uses_bounded_topk(spark):
    from public_transit_data_platform_sql_nosql_spark.plans import (
        executed_plan,
    )

    df = spark.range(1000).select(F.col("id").alias("v"))
    plan = executed_plan(kmv_distinct(df, ["v"]))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan
