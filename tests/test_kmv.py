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


def test_kmv_overlap_estimates_and_exact_regime(spark):
    """Overlap screen semantics: on an under-k pair the sketches ARE
    the full hash sets, so jaccard/intersection/union are EXACT; on an
    over-k pair the estimates stay within the KMV error envelope of the
    true planted overlap."""
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.pipeline.profile import (
        KMV_K,
        kmv_overlap,
    )

    # exact regime: 30 + 30 values, 10 shared -> union 50, jacc 1/5
    a = spark.range(30).select(
        F.concat(F.lit("v"), F.col("id")).alias("v"))
    b = spark.range(20, 50).select(
        F.concat(F.lit("v"), F.col("id")).alias("v"))
    row = kmv_overlap(a, b, "v").head()
    assert row["n_union_sketch"] == 50 < KMV_K
    assert row["est_union"] == 50
    assert row["match_k"] == 10 == row["est_intersection"]
    assert row["est_jaccard_permille"] == 10 * 1000 // 50
    assert row["est_distinct_a"] == 30 and row["est_distinct_b"] == 30

    # sketch regime: 3000 + 3000 with 1000 shared (union 5000)
    a = spark.range(3000).select(
        F.concat(F.lit("x"), F.col("id")).alias("v"))
    b = spark.range(2000, 5000).select(
        F.concat(F.lit("x"), F.col("id")).alias("v"))
    row = kmv_overlap(a, b, "v").head()
    assert row["n_union_sketch"] == KMV_K
    # ~13% stderr at k=64; allow 4 sigma on each estimate
    assert abs(row["est_union"] - 5000) < 5000 * 0.52
    assert abs(row["est_intersection"] - 1000) < 1000 * 1.0 + 200
    assert 0 < row["est_jaccard_permille"] < 1000


def test_kmv_overlap_disjoint_and_identical(spark):
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.pipeline.profile import (
        kmv_overlap,
    )

    a = spark.range(2000).select(
        F.concat(F.lit("a"), F.col("id")).alias("v"))
    b = spark.range(2000).select(
        F.concat(F.lit("b"), F.col("id")).alias("v"))
    row = kmv_overlap(a, b, "v").head()
    assert row["match_k"] == 0
    assert row["est_intersection"] == 0 == row["est_jaccard_permille"]

    row = kmv_overlap(a, a, "v").head()
    assert row["est_jaccard_permille"] == 1000
    assert row["est_intersection"] == row["est_union"]
