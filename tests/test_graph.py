"""Transit-graph reachability: chain-graph level semantics, transfer
budget enforcement, islands, and plan-shape guards."""

from __future__ import annotations

import pytest

from public_transit_data_platform_sql_nosql_spark.queries.graph import (
    reachable_stops,
    stop_route_edges,
)


def _net(spark):
    """R1:{A,B}  R2:{B,C}  R3:{C,D}  R4:{E,F} (disconnected island)."""
    st = spark.createDataFrame(
        [("t1", "A", 1), ("t1", "B", 2),
         ("t2", "B", 1), ("t2", "C", 2),
         ("t3", "C", 1), ("t3", "D", 2),
         ("t4", "E", 1), ("t4", "F", 2)],
        "trip_id string, stop_id string, stop_sequence int")
    tr = spark.createDataFrame(
        [("t1", "R1"), ("t2", "R2"), ("t3", "R3"), ("t4", "R4")],
        "trip_id string, route_id string")
    return st, tr


def _reach(spark, origin, max_transfers):
    st, tr = _net(spark)
    return {
        r["stop_id"]: r["n_rides"]
        for r in reachable_stops(st, tr, origin,
                                 max_transfers=max_transfers).collect()
    }


def test_chain_levels_and_min_rides(spark):
    got = _reach(spark, "A", 2)
    # D needs 3 rides (2 transfers); the island never appears
    assert got == {"A": 0, "B": 1, "C": 2, "D": 3}


def test_transfer_budget_cuts_the_chain(spark):
    assert _reach(spark, "A", 1) == {"A": 0, "B": 1, "C": 2}
    assert _reach(spark, "A", 0) == {"A": 0, "B": 1}


def test_min_over_multiple_paths(spark):
    """B reaches A (1 ride via R1) and C (1 ride via R2): both level-1
    even though C is also reachable in 3 rides the long way."""
    assert _reach(spark, "B", 2) == {"A": 1, "B": 0, "C": 1, "D": 2}


def test_island_origin_and_unserved_origin(spark):
    assert _reach(spark, "E", 2) == {"E": 0, "F": 1}
    # an origin serving no route yields only itself
    assert _reach(spark, "Z", 2) == {"Z": 0}


def test_rejects_negative_budget(spark):
    st, tr = _net(spark)
    with pytest.raises(ValueError, match="max_transfers"):
        reachable_stops(st, tr, "A", max_transfers=-1)


def test_edge_table_is_distinct(spark):
    st, tr = _net(spark)
    # duplicate stop visits collapse into one edge
    st2 = st.unionByName(st)
    assert stop_route_edges(st2, tr).count() == 8


def test_plan_no_cartesian(spark):
    from public_transit_data_platform_sql_nosql_spark.plans import (
        plan_summary,
    )

    st, tr = _net(spark)
    s = plan_summary(reachable_stops(st, tr, "A"))
    assert s["cartesian_products"] == 0
    assert s["broadcast_nested_loop_joins"] == 0
