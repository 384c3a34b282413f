"""Shared building blocks for the analytics queries.

- ``hourly_frequency``: the reference's ``vw_hourly_frequency`` view
  (`/root/reference/SQL/sql_utils.py:57-70`, `SQL/Q4 Create View.sql:4-14`):
  trips-per-hour per (route_id, service_id, hour_of_day), where hour_of_day
  spans 0..28+ (GTFS overnight).  Semantic quirk preserved on purpose
  (SURVEY.md A9): a trip with departures in several hours counts once per
  hour, so day-level sums over-count multi-hour trips exactly like the
  reference.
- ``trip_stats``: the per-trip MIN/MAX CTE behind Q2
  (`/root/reference/SQL/sql_utils.py:148-160`) with its HAVING > 60s
  data-quality filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.gtfs_time import hour_of_day
from ..operators.hints import broadcast_if_small


def hourly_frequency(stop_times: DataFrame, trips: DataFrame) -> DataFrame:
    """(route_id, service_id, hour_of_day, trips_per_hour).

    Shape (opt guide §2.3 "aggregate before you shuffle"): the fact table
    is collapsed to DISTINCT (trip_id, hour_of_day) BEFORE the trips
    join, so the join and the (route, service, hour) aggregation run
    over ~|trips|·hours rows instead of every stop_time, and the one
    full-fact shuffle carries two narrow columns.  Equivalent to joining
    first and taking COUNT(DISTINCT trip_id) per group because trip_id
    is the trips table's primary key (GTFS trips.txt): each distinct
    (trip, hour) pair maps to exactly one (route, service) row.
    """
    trip_hours = (
        stop_times.select("trip_id", "departure_secs")
        .filter(F.col("departure_secs").isNotNull())
        .select("trip_id", hour_of_day("departure_secs").alias("hour_of_day"))
        .distinct()
    )
    return (
        trip_hours.join(broadcast_if_small(
            trips.select("trip_id", "route_id", "service_id")),
              "trip_id")
        .groupBy("route_id", "service_id", "hour_of_day")
        .agg(F.count("trip_id").alias("trips_per_hour"))
    )


def trip_stats(stop_times: DataFrame, trips: DataFrame,
               min_duration_secs: int = 60) -> DataFrame:
    """Per-trip duration (max arrival - min departure, seconds) and distance
    (max - min shape_dist_traveled), keyed by (trip_id, route_id,
    service_id); degenerate trips dropped by HAVING duration > 60
    (`/root/reference/SQL/sql_utils.py:159`)."""
    # Aggregate the fact table per trip_id FIRST, then attach
    # (route_id, service_id) to the per-trip rows (opt guide §2.3 /
    # §1.2 step 1): min/max are join-order-independent here because the
    # inner join only drops or keeps a trip's rows wholesale (trip_id is
    # the join key), so aggregating first computes identical stats while
    # the shuffle carries one key and the join runs at trip granularity
    # (|trips| rows) instead of fact granularity — at scale, where trips
    # exceeds the broadcast threshold, that turns a full-fact-table
    # sort-merge join into a per-trip one.
    per_trip = (
        stop_times.select("trip_id", "arrival_secs", "departure_secs",
                          "shape_dist_traveled")
        .groupBy("trip_id")
        .agg(
            (F.max("arrival_secs") - F.min("departure_secs"))
            .alias("trip_duration_seconds"),
            (F.max("shape_dist_traveled") - F.min("shape_dist_traveled"))
            .alias("trip_distance"),
        )
        .filter(F.col("trip_duration_seconds") > min_duration_secs)
    )
    return (
        per_trip.join(broadcast_if_small(
            trips.select("trip_id", "route_id", "service_id")),
              "trip_id")
        .select("trip_id", "route_id", "service_id",
                "trip_duration_seconds", "trip_distance")
    )
