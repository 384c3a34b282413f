"""Small-file compaction: an appended-to parquet sink collapses to the
target file count with identical rows, survives repeat (idempotent
no-op), and composes with the streaming incremental sink."""

from __future__ import annotations

from pyspark.sql import functions as F

from public_transit_data_platform_sql_nosql_spark.jobs.compact import (
    compact_parquet_dir,
    parquet_dir_stats,
)


def _fragmented_sink(spark, path: str, appends: int = 3,
                     files_per_append: int = 16) -> int:
    df = spark.range(2000).select(
        F.col("id"), (F.col("id") % 7).alias("k"))
    for _ in range(appends):
        df.repartition(files_per_append).write.mode("append").parquet(path)
    return 2000 * appends


def test_compact_collapses_files_and_keeps_rows(spark, tmp_path):
    sink = str(tmp_path / "sink")
    n_rows = _fragmented_sink(spark, sink)
    files_before, total_bytes = parquet_dir_stats(spark, sink)
    assert files_before == 48
    checksum = spark.read.parquet(sink).agg(
        F.sum("id"), F.count(F.lit(1))).collect()[0]

    stats = compact_parquet_dir(spark, sink, target_file_bytes=total_bytes)
    assert stats["compacted"] is True
    assert stats["files_before"] == 48
    assert stats["files_after"] == 1

    after = spark.read.parquet(sink)
    assert after.count() == n_rows
    assert after.agg(F.sum("id"), F.count(F.lit(1))).collect()[0] == checksum

    # second pass is a no-op: already at (or under) the target count
    again = compact_parquet_dir(spark, sink, target_file_bytes=total_bytes)
    assert again["compacted"] is False
    assert again["files_after"] == 1


def test_compact_respects_target_size(spark, tmp_path):
    import math

    sink = str(tmp_path / "sink")
    _fragmented_sink(spark, sink)
    _, total_bytes = parquet_dir_stats(spark, sink)
    target = max(1, total_bytes // 4)
    stats = compact_parquet_dir(spark, sink, target_file_bytes=target)
    assert stats["compacted"] is True
    assert stats["files_after"] == math.ceil(total_bytes / target)


def test_compact_streaming_sink(spark, tmp_path):
    """The motivating composition: the streaming incremental sink's
    per-batch files compact without losing a row."""
    from public_transit_data_platform_sql_nosql_spark.streaming.jobs import (
        incremental_refresh,
        read_events_stream,
    )
    from tests.conftest import SF_DIR

    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    q = incremental_refresh(
        read_events_stream(spark, SF_DIR),
        lambda df: df.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")),
        sink, chk,
    )
    q.awaitTermination()
    before = spark.read.parquet(sink).agg(F.sum("n")).collect()[0][0]
    compact_parquet_dir(spark, sink, target_file_bytes=1 << 30, min_files=1)
    files_after, _ = parquet_dir_stats(spark, sink)
    assert files_after == 1
    assert spark.read.parquet(sink).agg(F.sum("n")).collect()[0][0] == before


def test_compact_preserves_partitioned_layout(spark, tmp_path):
    """Compacting the bucketed doc store must keep the stop_bucket=NN/
    directory layout (and therefore point_read's partition pruning),
    not flatten it into plain files."""
    from public_transit_data_platform_sql_nosql_spark.jobs.compact import (
        partition_columns,
    )
    from public_transit_data_platform_sql_nosql_spark.plans.inspect import (
        executed_plan,
    )

    sink = str(tmp_path / "store")
    df = spark.range(500).select(
        F.col("id").cast("string").alias("stop_id"),
        (F.col("id") % 13).cast("int").alias("stop_bucket"),
        (F.col("id") * 7).alias("payload"))
    # fragment: several appends, many files per bucket
    for _ in range(3):
        df.repartition(8).write.mode("append") \
            .partitionBy("stop_bucket").parquet(sink)
    assert partition_columns(spark, sink) == ["stop_bucket"]
    before = spark.read.parquet(sink).count()

    stats = compact_parquet_dir(spark, sink, target_file_bytes=1 << 30,
                                min_files=1)
    assert stats["compacted"] is True
    assert partition_columns(spark, sink) == ["stop_bucket"]
    assert stats["files_after"] == 13  # one per bucket directory

    store = spark.read.parquet(sink)
    assert store.count() == before
    plan = executed_plan(store.filter(F.col("stop_bucket") == 3))
    assert "PartitionFilters" in plan and "stop_bucket" in plan

    # idempotence holds for the partitioned layout too: already at one
    # file per directory -> no rewrite
    again = compact_parquet_dir(spark, sink, target_file_bytes=1 << 30,
                                min_files=1)
    assert again["compacted"] is False
    assert again["files_after"] == 13


def test_compact_splits_hot_partitions(spark, tmp_path):
    """A partition directory holding more than target_file_bytes gets
    salt-split into several files instead of one giant file."""
    sink = str(tmp_path / "store")
    df = spark.range(20_000).select(
        F.col("id"),
        F.when(F.col("id") % 100 == 0, F.lit(1)).otherwise(F.lit(0))
        .cast("int").alias("part"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"))
    for _ in range(2):
        df.repartition(16).write.mode("append") \
            .partitionBy("part").parquet(sink)
    _, total = parquet_dir_stats(spark, sink)
    # target sized so each of the 2 dirs' share needs ~4 files
    stats = compact_parquet_dir(spark, sink,
                                target_file_bytes=max(1, total // 8),
                                min_files=1)
    assert stats["compacted"] is True
    per_dir: dict[str, int] = {}
    import os

    for root, _dirs, files in os.walk(sink):
        n = sum(1 for f in files
                if f.endswith(".parquet") and not f.startswith((".", "_")))
        if n:
            per_dir[os.path.basename(root)] = n
    # the hot partition (part=0 holds ~99% of rows) got multiple files
    assert per_dir["part=0"] > 1, per_dir
    assert spark.read.parquet(sink).count() == 40_000


def test_compact_recovers_stranded_old_dir(spark, tmp_path):
    """ADVICE r4: a crash between the two swap renames leaves the sink
    path missing and the data stranded in ._compact_old.  The next run
    must restore it before proceeding instead of throwing from
    listFiles — and then compact normally."""
    import os
    import shutil

    sink = str(tmp_path / "store")
    _fragmented_sink(spark, sink, appends=3)
    want = spark.read.parquet(sink).count()
    # simulate the mid-swap crash: first rename done, second never ran
    shutil.move(sink, sink + "._compact_old")
    assert not os.path.exists(sink)
    stats = compact_parquet_dir(spark, sink, target_file_bytes=1 << 30,
                                min_files=1)
    assert stats["compacted"] is True
    assert not os.path.exists(sink + "._compact_old")
    assert spark.read.parquet(sink).count() == want


def test_compact_preserves_stringy_partition_values(spark, tmp_path):
    """ADVICE r4: partition values that LOOK numeric (part=00) must not
    be re-inferred and rewritten with mutated directory names — the
    rewrite read disables partitionColumnTypeInference."""
    import os

    sink = str(tmp_path / "store")
    df = spark.range(500).select(
        F.col("id"),
        F.format_string("%02d", (F.col("id") % 3).cast("int")).alias("part"))
    for _ in range(3):
        df.repartition(4).write.mode("append") \
            .partitionBy("part").parquet(sink)
    before = {d for d in os.listdir(sink) if d.startswith("part=")}
    assert before == {"part=00", "part=01", "part=02"}
    stats = compact_parquet_dir(spark, sink, target_file_bytes=1 << 30,
                                min_files=1)
    assert stats["compacted"] is True
    after = {d for d in os.listdir(sink) if d.startswith("part=")}
    assert after == before, after
    # conf restored for the rest of the session
    assert spark.conf.get(
        "spark.sql.sources.partitionColumnTypeInference.enabled") == "true"
    assert spark.read.parquet(sink).count() == 1500


# SLOW TIER (pytest.ini): stored-index/tune/streaming/CLI e2e --
# excluded from the driver's default gate; run with -m slow after
# touching this family (see the verify skill).
import pytest  # noqa: E402

pytestmark = pytest.mark.slow
