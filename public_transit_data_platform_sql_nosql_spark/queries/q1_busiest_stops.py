"""Q1 -- busiest stops (reference `/root/reference/SQL/sql_utils.py:73-105`,
static SQL `SQL/Q1_busiest_stop.sql`).

Pipeline: stop_times |><| trips (trip_id) |><| stops (stop_id)
          -> optional service filter -> groupBy stop attrs
          -> COUNT(*) total_trip_events, COUNT(DISTINCT route_id)
          -> ORDER BY total_trip_events DESC LIMIT n.

Scale notes: stop_times is the fact table; trips and stops are dimensions
and are broadcast so the only shuffle is the final aggregation on stop_id.
COUNT(DISTINCT) is exact (golden-matched output -- SURVEY.md A2 forbids
approx_count_distinct).  Ordering adds a stop_id tiebreak so top-k is
deterministic across engines (MySQL's was arbitrary under ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.params import apply_limit, apply_service_filter


def q1_busiest_stops(
    stop_times: DataFrame,
    trips: DataFrame,
    stops: DataFrame,
    service_id: object = None,
    limit: object = 20,
) -> DataFrame:
    t = apply_service_filter(
        trips.select("trip_id", "route_id", "service_id"), service_id
    )
    agg = (
        stop_times.select("trip_id", "stop_id")
        .join(F.broadcast(t), "trip_id")
        .join(
            F.broadcast(
                stops.select("stop_id", "stop_code", "stop_name",
                             "stop_lat", "stop_lon")
            ),
            "stop_id",
        )
        .groupBy("stop_id", "stop_code", "stop_name", "stop_lat", "stop_lon")
        .agg(
            F.count(F.lit(1)).alias("total_trip_events"),
            F.countDistinct("route_id").alias("num_unique_routes"),
        )
        .orderBy(F.desc("total_trip_events"), F.asc("stop_id"))
    )
    return apply_limit(agg, limit)
