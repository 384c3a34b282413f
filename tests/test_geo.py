"""Grid-bucketed geo operators: semantics vs a brute-force quadratic
reference on a small fixture, plan shape (equi-join on cells, never a
cartesian), and the driver-parity differential (tests/test_driver_parity
covers the DuckDB side; these pin the operator library directly)."""

from __future__ import annotations

import pytest

from public_transit_data_platform_sql_nosql_spark.plans import plan_summary
from public_transit_data_platform_sql_nosql_spark.queries.geo import (
    LON_SCALE,
    stop_pairs_within,
    stops_nearby,
)


def stops_df(rows):
    from pyspark.sql import SparkSession

    s = SparkSession.getActiveSession()
    return s.createDataFrame(
        rows, "stop_id string, stop_name string, stop_lat double, "
              "stop_lon double")


def brute_pairs(rows, eps):
    out = set()
    for i in range(len(rows)):
        for j in range(len(rows)):
            a, b = rows[i], rows[j]
            if int(a[0]) >= int(b[0]):
                continue
            dlat = a[2] - b[2]
            dlon = (a[3] - b[3]) * LON_SCALE
            if dlat * dlat + dlon * dlon <= eps * eps:
                out.add((a[0], b[0]))
    return out


ROWS = [
    ("1", "A", 43.100, -79.100),
    ("2", "B", 43.104, -79.103),
    ("3", "C", 43.097, -79.097),
    ("4", "D", 43.1199, -79.100),
    ("5", "E", 43.900, -79.900),
    ("6", "F", 43.500, -79.500),
    ("7", "G", 43.500, -79.500),
]


def test_pairs_match_bruteforce(spark):
    df = stop_pairs_within(stops_df(ROWS), eps=0.02)
    got = {(r.stop_id_a, r.stop_id_b) for r in df.collect()}
    assert got == brute_pairs(ROWS, 0.02)


def test_pairs_cross_cell_boundary_found(spark):
    # stop 4 sits in the lat-cell above stops 1-3; the 3x3 neighborhood
    # join must still surface its close pairs
    got = {(r.stop_id_a, r.stop_id_b)
           for r in stop_pairs_within(stops_df(ROWS), eps=0.02).collect()}
    assert ("1", "4") in got


def test_pairs_zero_distance_and_no_self_pairs(spark):
    df = stop_pairs_within(stops_df(ROWS), eps=0.02)
    rows = {(r.stop_id_a, r.stop_id_b): r.dist2_deg for r in df.collect()}
    assert rows[("6", "7")] == 0.0
    assert all(a != b for a, b in rows)


def test_pairs_plan_no_cartesian(spark):
    s = plan_summary(stop_pairs_within(stops_df(ROWS), eps=0.02))
    assert s["cartesian_products"] == 0


def test_pairs_rejects_bad_eps(spark):
    with pytest.raises(ValueError):
        stop_pairs_within(stops_df(ROWS), eps=0.0)


def test_nearby_orders_and_bounds(spark):
    df = stops_nearby(stops_df(ROWS), 43.1, -79.1, radius=0.02)
    rows = df.collect()
    ids = [r.stop_id for r in rows]
    assert ids[0] == "1"  # exact hit, distance 0
    assert set(ids) == {"1", "2", "3", "4"}
    d = [r.dist2_deg for r in rows]
    assert d == sorted(d)


def test_nearby_limit_and_validation(spark):
    assert stops_nearby(stops_df(ROWS), 43.1, -79.1, radius=0.02,
                        limit=2).count() == 2
    with pytest.raises(ValueError):
        stops_nearby(stops_df(ROWS), 43.1, -79.1, radius=-1.0)


def test_transfer_walk_candidates(spark):
    from public_transit_data_platform_sql_nosql_spark.queries.geo import (
        transfer_walk_candidates,
    )

    # stops 1,2 close + share route R1 -> excluded; stops 1,3 close with
    # disjoint routes -> candidate; 5 is far from everything
    stops = stops_df(ROWS)
    stop_times = spark.createDataFrame(
        [("t1", "1", 1), ("t1", "2", 2),   # route R1 serves 1 and 2
         ("t2", "3", 1),                   # route R2 serves 3
         ("t3", "5", 1)],
        "trip_id string, stop_id string, stop_sequence int")
    trips = spark.createDataFrame(
        [("t1", "R1"), ("t2", "R2"), ("t3", "R3")],
        "trip_id string, route_id string")
    rows = transfer_walk_candidates(stops, stop_times, trips,
                                    eps=0.02).collect()
    got = {(r.stop_id_a, r.stop_id_b): r for r in rows}
    close = brute_pairs(ROWS, 0.02)
    # every close pair appears exactly once, graded
    assert set(got) == close
    # 1-2 share route R1 -> connected, not a walk candidate
    assert got[("1", "2")].n_shared_routes == 1
    assert not got[("1", "2")].is_walk_candidate
    # 1-3 on disjoint routes -> walk candidate with count 0
    assert got[("1", "3")].n_shared_routes == 0
    assert got[("1", "3")].is_walk_candidate
    # stops with no routes at all grade as 0 (candidate)
    assert got[("6", "7")].n_shared_routes == 0


# --- cell-partitioned serving layout --------------------------------------


def test_cell_layout_roundtrip_parity(spark, tmp_path):
    """stops_nearby_indexed over the written layout returns the same
    rows, columns and order as the in-memory stops_nearby at equal
    parameters — for the layout-native radius AND a different one."""
    from public_transit_data_platform_sql_nosql_spark.queries.geo import (
        stops_nearby,
        stops_nearby_indexed,
        write_stops_cell_layout,
    )

    stops = stops_df(ROWS)
    path = str(tmp_path / "stops_cells")
    write_stops_cell_layout(stops, path, eps=0.02)
    for lat, lon, radius in [(43.1, -79.1, 0.02), (43.1, -79.1, 0.05),
                             (43.5, -79.5, 0.011), (10.0, 10.0, 0.02)]:
        want = [
            (r["stop_id"], r["stop_lat"], r["stop_lon"], r["dist2_deg"])
            for r in stops_nearby(stops, lat, lon, radius).collect()]
        got = [
            (r["stop_id"], r["stop_lat"], r["stop_lon"], r["dist2_deg"])
            for r in stops_nearby_indexed(
                spark, path, lat, lon, radius).collect()]
        assert got == want, (lat, lon, radius)


def test_cell_layout_plan_prunes_partitions(spark, tmp_path):
    """The indexed lookup's scan carries PartitionFilters on the cell
    columns — the layout prunes BEFORE any distance math (the same
    assert test_kmeans makes for the IVF layout)."""
    from public_transit_data_platform_sql_nosql_spark.plans import (
        executed_plan,
    )
    from public_transit_data_platform_sql_nosql_spark.queries.geo import (
        stops_nearby_indexed,
        write_stops_cell_layout,
    )

    write_stops_cell_layout(stops_df(ROWS), str(tmp_path / "sc"), eps=0.02)
    df = stops_nearby_indexed(spark, str(tmp_path / "sc"), 43.1, -79.1)
    plan = executed_plan(df)
    assert "PartitionFilters" in plan, plan
    assert "cx" in plan.split("PartitionFilters")[1][:300], plan


def test_cell_layout_rejects_bad_eps(spark, tmp_path):
    from public_transit_data_platform_sql_nosql_spark.queries.geo import (
        stops_nearby_indexed,
        write_stops_cell_layout,
    )

    with pytest.raises(ValueError, match="eps must be positive"):
        write_stops_cell_layout(stops_df(ROWS), str(tmp_path / "x"), eps=0)
    write_stops_cell_layout(stops_df(ROWS), str(tmp_path / "y"), eps=0.02)
    with pytest.raises(ValueError, match="radius must be positive"):
        stops_nearby_indexed(spark, str(tmp_path / "y"), 43.0, -79.0,
                             radius=-1)
