"""jobs/stats_index.py — file-level min/max data skipping.

The contract under test: (1) the pruned scan is ROW-EQUIVALENT to the
full filtered scan in every state (fresh, stale, empty-result), (2) a
clustered layout actually skips most files, (3) staleness (append after
stats) disables skipping rather than dropping rows.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from public_transit_data_platform_sql_nosql_spark.jobs.stats_index import (
    skipping_plan,
    skipping_scan,
    write_file_stats,
)


def _write_clustered(spark, path, n=4000, files=16):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 7 % 100).alias("v"),
        F.when(F.col("id") % 5 == 0, None)
        .otherwise(F.col("id") % 50).alias("maybe"),
    )
    (df.repartitionByRange(files, "k").sortWithinPartitions("k")
     .write.mode("overwrite").parquet(path))
    return df


def test_skips_most_files_and_matches_full_scan(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_clustered(spark, path)
    n_files = write_file_stats(spark, path, ["k", "v"])
    assert n_files == 16
    bounds = {"k": (100, 180)}
    plan = skipping_plan(spark, path, bounds)
    assert not plan["stale"]
    # 81 contiguous keys out of 4000 across 16 range-partitioned files:
    # at most 2 files can contain them
    assert plan["total"] == 16 and plan["skipped"] >= 14
    got = sorted(r["k"] for r in skipping_scan(spark, path, bounds)
                 .collect())
    want = sorted(r["k"] for r in spark.read.parquet(path)
                  .filter(F.col("k").between(100, 180)).collect())
    assert got == want and len(want) == 81


def test_unclustered_column_skips_nothing_but_stays_correct(spark,
                                                            tmp_path):
    path = str(tmp_path / "t")
    _write_clustered(spark, path)
    write_file_stats(spark, path, ["k", "v"])
    # v cycles 0..99 in every file: no file is skippable — the manifest
    # must say so honestly, and results must still match
    plan = skipping_plan(spark, path, {"v": (10, 12)})
    assert plan["skipped"] == 0 and not plan["stale"]
    got = skipping_scan(spark, path, {"v": (10, 12)}).count()
    want = spark.read.parquet(path).filter(
        F.col("v").between(10, 12)).count()
    assert got == want > 0


def test_null_semantics(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_clustered(spark, path)
    write_file_stats(spark, path, ["k", "maybe"])
    # BETWEEN never matches NULL rows — both paths must agree exactly
    bounds = {"maybe": (0, 49)}
    got = skipping_scan(spark, path, bounds).count()
    want = spark.read.parquet(path).filter(
        F.col("maybe").between(0, 49)).count()
    assert got == want == 3200  # 4/5 of 4000 rows are non-null


def test_out_of_range_bounds_prune_everything(spark, tmp_path):
    path = str(tmp_path / "t")
    _write_clustered(spark, path)
    write_file_stats(spark, path, ["k"])
    plan = skipping_plan(spark, path, {"k": (10_000, 20_000)})
    assert plan["skipped"] == 16 and plan["files"] == []
    df = skipping_scan(spark, path, {"k": (10_000, 20_000)})
    assert df.count() == 0
    assert set(df.columns) == {"k", "v", "maybe"}  # schema survives


def test_hive_partitioned_sink_skips_and_matches(spark, tmp_path):
    """The regression the advice flagged: a partitionBy() sink used to
    list zero top-level files -> 'stale' with files=[] -> limit(0)
    dropped EVERY row. Relative-path keying + recursive listing must
    (a) never drop rows, (b) actually skip files, (c) keep the
    partition column readable on the pruned scan."""
    path = str(tmp_path / "p")
    df = spark.range(4000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).cast("string").alias("svc"),
    )
    (df.repartitionByRange(8, "k").sortWithinPartitions("k")
     .write.mode("overwrite").partitionBy("svc").parquet(path))
    n_files = write_file_stats(spark, path, ["k"])
    assert n_files >= 8
    bounds = {"k": (100, 180)}
    plan = skipping_plan(spark, path, bounds)
    assert not plan["stale"] and plan["skipped"] > 0
    # manifest keys are partition-relative paths, not colliding basenames
    assert all("svc=" in f and "/" in f for f in plan["files"])
    got = sorted((r["k"], r["svc"]) for r in
                 skipping_scan(spark, path, bounds).collect())
    want = sorted((r["k"], r["svc"]) for r in
                  spark.read.parquet(path)
                  .filter(F.col("k").between(100, 180)).collect())
    assert got == want and len(want) == 81


def test_hive_partitioned_empty_result_keeps_schema(spark, tmp_path):
    path = str(tmp_path / "p")
    spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 2).cast("string").alias("svc"),
    ).write.mode("overwrite").partitionBy("svc").parquet(path)
    write_file_stats(spark, path, ["k"])
    df = skipping_scan(spark, path, {"k": (5_000, 6_000)})
    assert df.count() == 0
    assert set(df.columns) == {"k", "svc"}


def test_stale_manifest_disables_skipping_never_drops_rows(spark,
                                                           tmp_path):
    path = str(tmp_path / "t")
    _write_clustered(spark, path)
    write_file_stats(spark, path, ["k"])
    # append rows in the queried range WITHOUT refreshing the manifest
    spark.range(10_000, 10_050).select(
        F.col("id").alias("k"), F.lit(0).alias("v"),
        F.lit(None).cast("long").alias("maybe"),
    ).coalesce(1).write.mode("append").parquet(path)
    bounds = {"k": (10_000, 10_049)}
    plan = skipping_plan(spark, path, bounds)
    assert plan["stale"] and plan["skipped"] == 0
    assert skipping_scan(spark, path, bounds).count() == 50
    # refreshing the manifest restores skipping
    write_file_stats(spark, path, ["k"])
    plan2 = skipping_plan(spark, path, bounds)
    assert not plan2["stale"] and plan2["skipped"] >= 16


# SLOW TIER (pytest.ini): stored-index/tune/streaming/CLI e2e --
# excluded from the driver's default gate; run with -m slow after
# touching this family (see the verify skill).
import pytest  # noqa: E402

pytestmark = pytest.mark.slow
