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
