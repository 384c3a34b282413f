"""Transit-graph reachability: chain-graph level semantics, transfer
budget enforcement, islands, and plan-shape guards."""

from __future__ import annotations

import pytest

from public_transit_data_platform_sql_nosql_spark.queries.graph import (
    reachable_stops,
    stop_route_edges,
)


def _net(spark):
    """R1:{1,2}  R2:{2,3}  R3:{3,4}  R4:{5,6} (disconnected island).

    Numeric stop ids: the geo layer (stop_pairs_within) orders pairs by
    CAST(stop_id AS BIGINT), the documented contract of the stops table.
    """
    st = spark.createDataFrame(
        [("t1", "1", 1), ("t1", "2", 2),
         ("t2", "2", 1), ("t2", "3", 2),
         ("t3", "3", 1), ("t3", "4", 2),
         ("t4", "5", 1), ("t4", "6", 2)],
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
    got = _reach(spark, "1", 2)
    # stop 4 needs 3 rides (2 transfers); the island never appears
    assert got == {"1": 0, "2": 1, "3": 2, "4": 3}


def test_transfer_budget_cuts_the_chain(spark):
    assert _reach(spark, "1", 1) == {"1": 0, "2": 1, "3": 2}
    assert _reach(spark, "1", 0) == {"1": 0, "2": 1}


def test_min_over_multiple_paths(spark):
    """Stop 2 reaches 1 (one ride via R1) and 3 (one ride via R2): both
    level-1 even though 3 is also reachable the long way."""
    assert _reach(spark, "2", 2) == {"1": 1, "2": 0, "3": 1, "4": 2}


@pytest.mark.slow  # SLOW TIER: see pytest.ini
def test_island_origin_and_unserved_origin(spark):
    assert _reach(spark, "5", 2) == {"5": 0, "6": 1}
    # an origin serving no route yields only itself
    assert _reach(spark, "9", 2) == {"9": 0}


def test_rejects_negative_budget(spark):
    st, tr = _net(spark)
    with pytest.raises(ValueError, match="max_transfers"):
        reachable_stops(st, tr, "1", max_transfers=-1)


def test_edge_table_is_distinct(spark):
    st, tr = _net(spark)
    # duplicate stop visits collapse into one edge
    st2 = st.unionByName(st)
    assert stop_route_edges(st2, tr).count() == 8


def test_plan_no_cartesian(spark):
    """Join-shape guard on the LAZY builder (the public function
    materializes its result, so its returned plan is an RDD scan)."""
    from public_transit_data_platform_sql_nosql_spark.plans import (
        plan_summary,
    )
    from public_transit_data_platform_sql_nosql_spark.queries.graph import (
        _reachable_plan,
    )

    st, tr = _net(spark)
    sr = stop_route_edges(st, tr)
    s = plan_summary(_reachable_plan(spark, sr, "1", 2))
    assert s["cartesian_products"] == 0
    assert s["broadcast_nested_loop_joins"] == 0


# --- walk-aware (multimodal) ----------------------------------------------


def _stops(spark):
    """Stops 4 and 5 sit ~0.01 deg apart (walkable at eps=0.02) — the only
    bridge between the R1-R2-R3 chain and the R4 island.  Everything
    else is far apart."""
    return spark.createDataFrame(
        [("1", "1", 43.10, -79.10), ("2", "2", 43.50, -79.50),
         ("3", "3", 43.90, -79.90), ("4", "4", 44.30, -78.70),
         ("5", "5", 44.31, -78.70), ("6", "6", 44.70, -78.30)],
        "stop_id string, stop_name string, stop_lat double, "
        "stop_lon double")


def _mm_reach(spark, origin, max_transfers):
    from public_transit_data_platform_sql_nosql_spark.queries.graph import (
        reachable_stops_multimodal,
    )

    st, tr = _net(spark)
    return {
        r["stop_id"]: r["n_rides"]
        for r in reachable_stops_multimodal(
            st, tr, _stops(spark), origin,
            max_transfers=max_transfers).collect()
    }


@pytest.mark.slow  # SLOW TIER: see pytest.ini
def test_walk_bridge_connects_the_island(spark):
    """Pure-ride BFS never reaches the island from stop 1; one walk
    hop 4->5 does:
    ride to stop 4 (3 rides), walk to 5 free, so 6 needs a 4th ride — out of
    budget at max_transfers=2, in at 3."""
    assert _reach(spark, "1", 2) == {"1": 0, "2": 1, "3": 2, "4": 3}
    got = _mm_reach(spark, "1", 2)
    assert got == {"1": 0, "2": 1, "3": 2, "4": 3, "5": 3}
    got3 = _mm_reach(spark, "1", 3)
    assert got3 == {"1": 0, "2": 1, "3": 2, "4": 3, "5": 3, "6": 4}


def test_walk_before_first_ride(spark):
    """Starting at island stop 5: walk to 4 first (0 rides), then ride
    the chain backwards."""
    got = _mm_reach(spark, "5", 2)
    assert got == {"5": 0, "6": 1, "4": 0, "3": 1, "2": 2, "1": 3}


def test_single_walk_hop_does_not_chain(spark):
    """A lone origin with a walkable neighbor but no routes: exactly
    one hop, not pedestrian closure."""
    from public_transit_data_platform_sql_nosql_spark.queries.graph import (
        reachable_stops_multimodal,
    )

    st, tr = _net(spark)
    stops = spark.createDataFrame(
        [("7", "7", 10.0, 10.0), ("8", "8", 10.01, 10.0),
         ("9", "9", 10.025, 10.0)],
        "stop_id string, stop_name string, stop_lat double, "
        "stop_lon double")
    got = {r["stop_id"]: r["n_rides"]
           for r in reachable_stops_multimodal(
               st, tr, stops, "7", max_transfers=2).collect()}
    # 7-8 walkable, 8-9* walkable, 7-9* not: one hop reaches 8 only,
    # and with no routes there the BFS never rides further
    assert got == {"7": 0, "8": 0}


def test_pagerank_hand_checked_one_iteration(spark):
    """One iteration on the chain net, computed by hand: degrees
    s1=1 s2=2 s3=2 s4=1 s5=1 s6=1; R1=R2=R3=R4 deg 2.  Every stop
    starts at 1_000_000 micro.

    route in-mass: R1 = m(s1)+m(s2) = 1_000_000 + 500_000; R2 =
    m(s2)+m(s3) = 1_000_000; R3 = 1_500_000; R4 = 2_000_000.
    r_rank = 150_000 + 85*r_in DIV 100.
    stop in-mass = sum over its routes of r_rank DIV 2.
    """
    from public_transit_data_platform_sql_nosql_spark.queries.graph import (
        stop_pagerank,
    )

    st, tr = _net(spark)
    got = {r["stop_id"]: r["rank_micro"]
           for r in stop_pagerank(st, tr, n_iter=1).collect()}
    rr = {R: 150_000 + 85 * m // 100
          for R, m in {"R1": 1_500_000, "R2": 1_000_000,
                       "R3": 1_500_000, "R4": 2_000_000}.items()}
    want = {
        "1": 150_000 + 85 * (rr["R1"] // 2) // 100,
        "2": 150_000 + 85 * (rr["R1"] // 2 + rr["R2"] // 2) // 100,
        "3": 150_000 + 85 * (rr["R2"] // 2 + rr["R3"] // 2) // 100,
        "4": 150_000 + 85 * (rr["R3"] // 2) // 100,
        "5": 150_000 + 85 * (rr["R4"] // 2) // 100,
        "6": 150_000 + 85 * (rr["R4"] // 2) // 100,
    }
    assert got == want
    # the hub property: the two-route stops outrank the one-route stops
    assert min(got["2"], got["3"]) > max(got["1"], got["4"])


def test_pagerank_plan_is_join_only(spark):
    """Join-shape guard on the LAZY builder (the public function
    materializes its result, so its returned plan is an RDD scan)."""
    from public_transit_data_platform_sql_nosql_spark.plans import (
        executed_plan,
    )
    from public_transit_data_platform_sql_nosql_spark.queries.graph import (
        _pagerank_plan,
    )

    st, tr = _net(spark)
    plan = executed_plan(_pagerank_plan(stop_route_edges(st, tr), 3))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --- cache lifecycle & deep-k variants -------------------------------------


def _cache_manager_empty(spark) -> bool:
    return bool(
        spark._jsparkSession.sharedState().cacheManager().isEmpty())


@pytest.mark.slow  # SLOW TIER: see pytest.ini
def test_operators_release_their_caches(spark):
    """Every graph operator persists its edge table internally; none of
    those persists may outlive the call (the r7 leak): after each
    operator returns, the session cache manager is empty again (the
    materialized result lives in checkpoint storage, not the cache
    manager), and the result is still collectable."""
    from public_transit_data_platform_sql_nosql_spark.queries.graph import (
        reachable_stops_deep,
        reachable_stops_multimodal,
        stop_pagerank,
        stop_pagerank_deep,
    )

    st, tr = _net(spark)
    spark.catalog.clearCache()
    assert _cache_manager_empty(spark)
    for res in (
        reachable_stops(st, tr, "1"),
        reachable_stops_multimodal(st, tr, _stops(spark), "1"),
        stop_pagerank(st, tr, n_iter=2),
        reachable_stops_deep(st, tr, "1", max_transfers=3),
        stop_pagerank_deep(st, tr, n_iter=2),
    ):
        assert _cache_manager_empty(spark)
        assert res.count() > 0


@pytest.mark.slow  # SLOW TIER: see pytest.ini
def test_deep_reachable_matches_unrolled(spark):
    from public_transit_data_platform_sql_nosql_spark.queries.graph import (
        reachable_stops_deep,
    )

    st, tr = _net(spark)
    for origin, k in (("1", 0), ("1", 1), ("1", 2), ("2", 3), ("9", 2)):
        deep = {r["stop_id"]: r["n_rides"]
                for r in reachable_stops_deep(
                    st, tr, origin, max_transfers=k).collect()}
        assert deep == _reach(spark, origin, k), (origin, k)


def test_deep_pagerank_bit_identical_to_unrolled(spark):
    from public_transit_data_platform_sql_nosql_spark.queries.graph import (
        stop_pagerank,
        stop_pagerank_deep,
    )

    st, tr = _net(spark)
    for n in (1, 3):
        deep = {r["stop_id"]: r["rank_micro"]
                for r in stop_pagerank_deep(st, tr, n_iter=n).collect()}
        unrolled = {r["stop_id"]: r["rank_micro"]
                    for r in stop_pagerank(st, tr, n_iter=n).collect()}
        assert deep == unrolled, n


def test_deep_walk_plan_depth_is_bounded(spark):
    """A max_transfers=8 deep walk must complete AND return a plan
    whose size is independent of the budget: per-level checkpointing
    leaves no join chain in the final plan (the unrolled form would
    carry ~2 joins per level), and saturation short-circuits the empty
    tail levels."""
    from public_transit_data_platform_sql_nosql_spark.plans import (
        executed_plan,
    )
    from public_transit_data_platform_sql_nosql_spark.queries.graph import (
        reachable_stops_deep,
        stop_pagerank_deep,
    )

    st, tr = _net(spark)
    deep = reachable_stops_deep(st, tr, "1", max_transfers=8)
    assert {r["stop_id"]: r["n_rides"] for r in deep.collect()} == {
        "1": 0, "2": 1, "3": 2, "4": 3}
    plan = executed_plan(deep)
    assert "Join" not in plan and "ExistingRDD" in plan
    pr = stop_pagerank_deep(st, tr, n_iter=8)
    assert pr.count() == 6
    assert "Join" not in executed_plan(pr)
