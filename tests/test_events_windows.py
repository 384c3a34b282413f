"""queries/events.py user_activity_stats — the lag/lead/rolling/rank
window-function family.  Semantics are pinned by the driver differential
(tests/test_driver_parity.py + the DuckDB oracle); here we pin the two
things the oracle can't see: the hand-checkable frame math on a tiny
fixture, and the ONE-exchange plan shape that makes the operator scale
(every window must reuse the single user_id hash partitioning).
"""

from __future__ import annotations

from public_transit_data_platform_sql_nosql_spark.plans import (
    executed_plan,
)
from public_transit_data_platform_sql_nosql_spark.queries.events import (
    user_activity_stats,
)

NS = 1_000_000_000
DAY = 86_400


def _fixture(spark):
    # user 1: three events on one day, 10s then 3600s apart; user 2: two
    # events straddling a day boundary
    rows = [
        (1, 1, 100 * NS, 2.00),
        (2, 1, 110 * NS, 1.00),
        (3, 1, 3710 * NS, 4.00),
        (4, 2, (DAY - 5) * NS, 1.50),
        (5, 2, (DAY + 5) * NS, 0.50),
    ]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts long, value double")


def test_window_family_hand_checked(spark):
    out = {r["event_id"]: r.asDict()
           for r in user_activity_stats(_fixture(spark)).collect()}
    assert len(out) == 5
    # user 1 timeline: gaps 10s and 3600s, running 200/300/700 cents
    assert out[1]["prev_gap_sec"] is None
    assert out[2]["prev_gap_sec"] == 10
    assert out[3]["prev_gap_sec"] == 3600
    assert out[1]["next_gap_sec"] == 10
    assert out[3]["next_gap_sec"] is None
    assert [out[i]["running_cents"] for i in (1, 2, 3)] == [200, 300, 700]
    # trailing-3 integer means: 200, (200+100) div 2, (200+100+400) div 3
    assert [out[i]["mov3_cents"] for i in (1, 2, 3)] == [200, 150, 233]
    # rank within (user, day) by cents desc: event 3 (400c) beats 1 (200c)
    assert out[3]["day_rank"] == 1 and out[1]["day_rank"] == 2
    assert out[2]["day_rank"] == 3
    # user 2 straddles midnight: each event alone in its day
    assert out[4]["day"] == 0 and out[5]["day"] == 1
    assert out[4]["day_rank"] == 1 and out[5]["day_rank"] == 1
    # day boundary resets nothing in the user-timeline frames
    assert out[5]["prev_gap_sec"] == 10
    assert out[5]["running_cents"] == 200


def test_single_exchange_serves_all_windows(spark):
    plan = executed_plan(user_activity_stats(_fixture(spark)))
    # HashPartitioning(user_id) satisfies ClusteredDistribution(user_id,
    # day), so the rank-in-day window must add only a Sort — a second
    # Exchange here is the 100-TB regression this test exists to catch
    assert plan.count("Exchange") == 1, plan
