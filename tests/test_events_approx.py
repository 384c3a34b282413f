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

    events = register_tpch(spark, SF_DIR, ("events",))["events"]
    share = 0.002
    got = [(r["user_id"], r["n_events"])
           for r in heavy_hitter_users(events, share).collect()]
    total = events.count()
    threshold = -(-total * share // 1)
    want = [(r["user_id"], r["n"]) for r in
            events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") >= threshold)
            .orderBy(F.desc("n"), F.asc("user_id")).collect()]
    assert got == want and len(got) > 0
