"""Stop-centric denormalization -- the reference's MySQL->MongoDB ETL
(`/root/reference/Mongo/denormalization.py:49-138`) as ONE Spark job.

The reference paginates a 4-way join in 100k-row chunks and upserts with
``$push`` because a stop's rows can straddle chunks; at 20+ minutes for
4.3M rows.  In Spark the whole transform is a single shuffle:

    stop_times |><| trips |><| routes |><| stops
      -> groupBy(stop_id) -> collect_list(struct(...)) -> array_sort

Output schema matches the Mongo document (model/schemas.py STOP_TIMETABLE):
one row per stop, GeoJSON-style location struct, ``upcoming_services``
sorted by (departure_time, trip_id) -- the reference guaranteed order via a
global ``ORDER BY stop_id, departure_time`` (`denormalization.py:60`); we
sort within each group instead, which scales (no global sort) and is
deterministic (trip_id tiebreak).

Scale notes: the only wide exchange is the groupBy on stop_id (high
cardinality, well-distributed).  trips/routes/stops are broadcast.  At
100 TB you'd additionally ``repartition(stop_id)`` before a partitioned
write so downstream point lookups prune partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def denormalize_stop_timetables(
    stop_times: DataFrame,
    trips: DataFrame,
    stops: DataFrame,
    routes: DataFrame,
) -> DataFrame:
    joined = (
        stop_times.select("trip_id", "stop_id", "departure_time")
        .join(F.broadcast(trips.select("trip_id", "route_id", "service_id",
                                       "trip_headsign")), "trip_id")
        .join(F.broadcast(routes.select("route_id", "route_short_name",
                                        "route_long_name")), "route_id")
    )
    # sort key (departure_time, trip_id) leads; fields reordered after sort
    # to the reference's document layout (denormalization.py:90-98).
    sortable = F.struct(
        F.col("departure_time"), F.col("trip_id"), F.col("route_id"),
        F.col("route_short_name"), F.col("route_long_name"),
        F.col("service_id"), F.col("trip_headsign"),
    )
    per_stop = joined.groupBy("stop_id").agg(
        F.array_sort(F.collect_list(sortable)).alias("_sorted")
    )
    services = F.transform(
        F.col("_sorted"),
        lambda x: F.struct(
            x["route_id"].alias("route_id"),
            x["route_short_name"].alias("route_short_name"),
            x["route_long_name"].alias("route_long_name"),
            x["trip_id"].alias("trip_id"),
            x["service_id"].alias("service_id"),
            x["trip_headsign"].alias("trip_headsign"),
            x["departure_time"].alias("departure_time"),
        ),
    )
    return (
        per_stop.join(
            F.broadcast(stops.select("stop_id", "stop_name", "stop_code",
                                     "stop_lat", "stop_lon")),
            "stop_id",
        )
        .select(
            "stop_id",
            "stop_name",
            "stop_code",
            F.struct(
                F.lit("Point").alias("type"),
                F.array(F.col("stop_lon"), F.col("stop_lat"))
                .alias("coordinates"),
            ).alias("location"),
            services.alias("upcoming_services"),
        )
    )


def write_stop_timetables(df: DataFrame, path: str) -> None:
    """Replaces the reference's delete_many + bulk_write upsert loop
    (`denormalization.py:68,129-135`) with an idempotent overwrite."""
    df.write.mode("overwrite").parquet(path)
