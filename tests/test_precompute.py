"""Precompute job: materialized result tables must agree with the live
queries they cache (the reference's CSV-vs-SQL dual-path invariant,
`Reporting/Poster_Report.md:73`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from public_transit_data_platform_sql_nosql_spark.jobs.precompute import (
    materialize_all,
    precomputed_available,
    read_precomputed,
)
from public_transit_data_platform_sql_nosql_spark.queries.q1_busiest_stops import (
    q1_busiest_stops,
)
from public_transit_data_platform_sql_nosql_spark.sources.tpch_adapter import (
    register_gtfs_views,
)
from tests.conftest import SF_DIR


def test_fastpath_matches_live(spark, tmp_path):
    v = register_gtfs_views(spark, SF_DIR)
    out = str(tmp_path / "results")
    materialize_all(v, out)
    assert precomputed_available(out, "q1_busiest_stops")
    assert not precomputed_available(out, "nope")

    fast = (
        read_precomputed(spark, out, "q1_busiest_stops", service_id="1")
        .orderBy(F.desc("total_trip_events"), "stop_id")
        .limit(20)
        .select("stop_id", "total_trip_events", "num_unique_routes")
    )
    live = q1_busiest_stops(
        v["stop_times"], v["trips"], v["stops"], service_id="1", limit=20
    ).select("stop_id", "total_trip_events", "num_unique_routes")
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, live.collect())
    )


def test_fastpath_reads_prune_partitions(spark, tmp_path):
    """The fast path filters on the svc partition key, so the scan must
    carry a PartitionFilter (directory pruning) — one mode's files read,
    not all four."""
    from public_transit_data_platform_sql_nosql_spark.plans import (
        executed_plan,
    )

    v = register_gtfs_views(spark, SF_DIR)
    out = str(tmp_path / "results")
    materialize_all(v, out)
    df = read_precomputed(spark, out, "q4_hourly_frequency", "1")
    plan = executed_plan(df)
    assert "PartitionFilters" in plan and "svc" in plan
    # and the pruned read returns exactly the one mode
    assert {r["service_id"] for r in
            df.select("service_id").distinct().collect()} == {"1"}


def test_available_rejects_stale_unpartitioned_layout(tmp_path):
    """A result dir written by the OLD unpartitioned layout (no svc=*
    subdirs) must fail the probe so the app falls back to the live path
    instead of erroring on the missing partition column at read time."""
    stale = tmp_path / "results" / "q1_busiest_stops"
    stale.mkdir(parents=True)
    (stale / "part-00000.parquet").write_bytes(b"")
    assert not precomputed_available(str(tmp_path / "results"),
                                     "q1_busiest_stops")


def test_q3_table_recomputed_week_rows(spark, tmp_path):
    """Q3 whole-week rows are RE-COMPUTED over the deduped pair set (a
    distinct count can't be summed across services): a stop's week count
    must never exceed the sum of its per-service counts, and must hit the
    live whole-week query exactly."""
    from public_transit_data_platform_sql_nosql_spark.queries.q3_transfer_points import (
        q3_transfer_points,
    )

    v = register_gtfs_views(spark, SF_DIR)
    out = str(tmp_path / "results")
    materialize_all(v, out)
    fast = (
        read_precomputed(spark, out, "q3_transfer_points", service_id=None)
        .select("stop_id", "num_unique_routes")
    )
    live = q3_transfer_points(
        v["stop_times"], v["trips"], v["stops"], service_id=None,
        limit="all",
    ).select("stop_id", "num_unique_routes")
    assert sorted(map(tuple, fast.collect())) == sorted(
        map(tuple, live.collect())
    )


def test_week_sentinel_rows_cover_all_modes(spark, tmp_path):
    v = register_gtfs_views(spark, SF_DIR)
    out = str(tmp_path / "results")
    materialize_all(v, out)
    df = spark.read.parquet(f"{out}/q2_duration_speed")
    sids = {r.service_id for r in df.select("service_id").distinct().collect()}
    assert sids == {"1", "2", "3", "4"}
    # synthesized weekly rows carry NULL stddev (generate_csv.py:101-105)
    weekly = df.filter(F.col("service_id") == "4")
    assert weekly.filter(F.col("duration_stddev_min").isNotNull()).count() == 0
    assert weekly.count() > 0
