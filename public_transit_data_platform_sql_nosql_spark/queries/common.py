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
    """(route_id, service_id, hour_of_day, trips_per_hour)."""
    return (
        stop_times.select("trip_id", "departure_secs")
        .filter(F.col("departure_secs").isNotNull())
        .join(broadcast_if_small(
            trips.select("trip_id", "route_id", "service_id")),
              "trip_id")
        .withColumn("hour_of_day", hour_of_day("departure_secs"))
        .groupBy("route_id", "service_id", "hour_of_day")
        .agg(F.countDistinct("trip_id").alias("trips_per_hour"))
    )


def trip_stats(stop_times: DataFrame, trips: DataFrame,
               min_duration_secs: int = 60) -> DataFrame:
    """Per-trip duration (max arrival - min departure, seconds) and distance
    (max - min shape_dist_traveled), keyed by (trip_id, route_id,
    service_id); degenerate trips dropped by HAVING duration > 60
    (`/root/reference/SQL/sql_utils.py:159`)."""
    return (
        stop_times.select("trip_id", "arrival_secs", "departure_secs",
                          "shape_dist_traveled")
        .join(broadcast_if_small(
            trips.select("trip_id", "route_id", "service_id")),
              "trip_id")
        .groupBy("trip_id", "route_id", "service_id")
        .agg(
            (F.max("arrival_secs") - F.min("departure_secs"))
            .alias("trip_duration_seconds"),
            (F.max("shape_dist_traveled") - F.min("shape_dist_traveled"))
            .alias("trip_distance"),
        )
        .filter(F.col("trip_duration_seconds") > min_duration_secs)
    )
