"""Sketch operators: approximate results can't be hash-checked against an
oracle, so the test bounds relative error against the exact operator."""

from __future__ import annotations

from public_transit_data_platform_sql_nosql_spark.queries.events import (
    daily_active_users,
    daily_active_users_approx,
)
from public_transit_data_platform_sql_nosql_spark.sources.tpch_adapter import (
    register_tpch,
)
from tests.conftest import SF_DIR


def test_approx_dau_within_error_bound(spark):
    events = register_tpch(spark, SF_DIR, ("events",))["events"]
    exact = {r["day_idx"]: r["n_users"]
             for r in daily_active_users(events).collect()}
    approx = {r["day_idx"]: r["n_users_approx"]
              for r in daily_active_users_approx(events, rsd=0.02).collect()}
    assert set(approx) == set(exact)
    for day, n in exact.items():
        # rsd=0.02 is a one-sigma bound; allow 5 sigma
        assert abs(approx[day] - n) <= max(5, 0.10 * n), (
            f"day {day}: approx {approx[day]} vs exact {n}")
    # n_events is exact in both
    ev_exact = {r["day_idx"]: r["n_events"]
                for r in daily_active_users(events).collect()}
    ev_approx = {r["day_idx"]: r["n_events"]
                 for r in daily_active_users_approx(events).collect()}
    assert ev_exact == ev_approx


def test_heavy_hitters_match_naive_exact(spark):
    """Sketch-candidates + verification pass must equal the naive full
    groupBy plan exactly (freqItems has no false negatives and the
    verify pass removes the false positives)."""
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.queries.events import (
        heavy_hitter_users,
    )
    from public_transit_data_platform_sql_nosql_spark.sources.tpch_adapter import (
        register_tpch,
    )
    from tests.conftest import SF_DIR

    import math

    events = register_tpch(spark, SF_DIR, ("events",))["events"]
    share = 0.002
    got = [(r["user_id"], r["n_events"])
           for r in heavy_hitter_users(events, share).collect()]
    total = events.count()
    threshold = math.ceil(total * share)
    want = [(r["user_id"], r["n"]) for r in
            events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= threshold)
            .orderBy(F.desc("n"), F.asc("user_id")).collect()]
    assert got == want and len(got) > 0


def test_route_duration_quantiles_bounded_error(spark):
    """percentile_approx per route must land within the sketch's rank
    guarantee of the exact percentile (checked in rank space: the
    approx value's true rank is within 1% of the target rank)."""
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.queries.common import (
        trip_stats,
    )
    from public_transit_data_platform_sql_nosql_spark.queries.q2_duration_speed import (
        route_duration_quantiles,
    )
    from public_transit_data_platform_sql_nosql_spark.sources.tpch_adapter import (
        register_gtfs_views,
    )
    from tests.conftest import SF_DIR

    gtfs = register_gtfs_views(spark, SF_DIR)
    got = route_duration_quantiles(
        gtfs["stop_times"], gtfs["trips"], gtfs["routes"]).collect()
    assert len(got) > 0
    durations: dict[str, list[int]] = {}
    for r in trip_stats(gtfs["stop_times"], gtfs["trips"]).collect():
        durations.setdefault(r["route_id"], []).append(
            r["trip_duration_seconds"])
    for row in got:
        ds = sorted(durations[row["route_id"]])
        assert row["n_trips"] == len(ds)
        for p in (50, 90, 99):
            v = row[f"p{p}_duration_secs"]
            assert v in ds  # percentile_approx returns a real sample
            lo = sum(1 for d in ds if d < v)
            hi = sum(1 for d in ds if d <= v)
            target = p / 100 * len(ds)
            slack = max(1.0, 0.01 * len(ds))
            assert lo - slack <= target <= hi + slack, (
                row["route_id"], p, v, lo, hi, target)


def test_q1_approx_route_counts_bounded(spark):
    """The HLL route-count variant ranks identically to exact Q1 (the
    ranking key stays exact) and its route counts sit within the sketch
    error of the exact distinct counts."""
    from public_transit_data_platform_sql_nosql_spark.queries.q1_busiest_stops import (
        q1_busiest_stops,
        q1_busiest_stops_approx,
    )
    from public_transit_data_platform_sql_nosql_spark.sources.tpch_adapter import (
        register_gtfs_views,
    )
    from tests.conftest import SF_DIR

    gtfs = register_gtfs_views(spark, SF_DIR)
    args = (gtfs["stop_times"], gtfs["trips"], gtfs["stops"], None, 50)
    exact = q1_busiest_stops(*args).collect()
    approx = q1_busiest_stops_approx(*args).collect()
    assert [r["stop_id"] for r in approx] == [r["stop_id"] for r in exact]
    assert all(a["total_trip_events"] == e["total_trip_events"]
               for a, e in zip(approx, exact))
    for a, e in zip(approx, exact):
        err = abs(a["num_unique_routes_approx"] - e["num_unique_routes"])
        assert err <= max(1, 0.1 * e["num_unique_routes"]), (
            a["stop_id"], a["num_unique_routes_approx"],
            e["num_unique_routes"])


def test_funnel_report_fixture(spark):
    """Hand-computed 2-transition funnel: dedup of same-instant
    positions, tolerance cutoff, shared-downstream dedup."""
    from public_transit_data_platform_sql_nosql_spark.queries.events import (
        funnel_report,
    )

    rows = [
        # user 1: view@10 -> click@20 -> purchase@25  (full conversion)
        (1, 10, "view"), (1, 20, "click"), (1, 25, "purchase"),
        # user 2: TWO views match the SAME click@40 -> one position
        (2, 30, "view"), (2, 35, "view"), (2, 40, "click"),
        # user 3: view@50, click@200 beyond tolerance(100) -> no convert
        (3, 50, "view"), (3, 200, "click"),
        # user 4: click with no prior view enters nothing
        (4, 60, "click"),
    ]
    ev = spark.createDataFrame(
        [(u, t, k) for u, t, k in rows],
        "user_id long, ts long, event_type string")
    out = {r.step_idx: r for r in
           funnel_report(ev, ("view", "click", "purchase"),
                         within_ns=100).collect()}
    # positions: u1@10, u2@30, u2@35, u3@50 -> 4 reached
    assert out[0].n_reached == 4
    # u1 converts; u2's two views both convert (2 positions); u3 no
    assert out[0].n_converted == 3
    assert out[0].conversion_permille == 750
    # step 2 enters DISTINCT reached ts: u1@20, u2@40 -> 2
    assert out[1].n_reached == 2
    assert out[1].n_converted == 1  # only u1 purchases
    assert out[1].conversion_permille == 500


def test_funnel_validation(spark):
    from public_transit_data_platform_sql_nosql_spark.queries.events import (
        funnel_report,
    )

    ev = spark.createDataFrame([(1, 1, "view")],
                               "user_id long, ts long, event_type string")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        funnel_report(ev, ("view",))
    with _pytest.raises(ValueError):
        funnel_report(ev, ("view", "click"), within_ns=0)


def test_funnel_plan_is_join_free(spark):
    """The funnel's matching path is the as-of union+window — the whole
    2-transition plan must contain ZERO join operators."""
    from public_transit_data_platform_sql_nosql_spark.plans import (
        executed_plan,
    )
    from public_transit_data_platform_sql_nosql_spark.queries.events import (
        funnel_report,
    )

    ev = spark.createDataFrame(
        [(1, 10, "view"), (1, 20, "click"), (1, 25, "purchase")],
        "user_id long, ts long, event_type string")
    p = executed_plan(funnel_report(ev))
    for node in ("SortMergeJoin", "BroadcastHashJoin",
                 "BroadcastNestedLoopJoin", "CartesianProduct",
                 "ShuffledHashJoin"):
        assert p.count(node) == 0, (node, p)
