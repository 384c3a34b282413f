"""Timetable lookup operations over the denormalized stop table -- the
reference's Mongo query service (`/root/reference/Mongo/app.py:47-244`).

The reference does ``find_one`` by stop_id then filters/groups/sorts the
``upcoming_services`` array in Python.  Here the same operations are Spark
array expressions / explode pipelines over the denormalized DataFrame, so
they work both interactively (cached table, partition-pruned point lookup)
and as set-oriented batch over ALL stops at once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.params import PUBLIC_SERVICE_IDS

NOT_IN_SERVICE = "NOT IN SERVICE"


def get_stops(stops_or_denorm: DataFrame) -> DataFrame:
    """S9: id/code/name projection sorted by name
    (`Mongo/app.py:56-59`)."""
    return (
        stops_or_denorm.select("stop_id", "stop_name", "stop_code")
        .orderBy("stop_name", "stop_id")
    )


def _public_service(x: Column) -> Column:
    """P7: public services only (`Mongo/app.py:131-135`)."""
    return x["service_id"].isin(*PUBLIC_SERVICE_IDS)


def _valid_headsign(x: Column) -> Column:
    """P8: drop NULL / 'NOT IN SERVICE' headsigns
    (`Mongo/app.py:139-143`)."""
    return x["trip_headsign"].isNotNull() & (
        x["trip_headsign"] != NOT_IN_SERVICE
    )


def _exploded(denorm: DataFrame, stop_id: str | None,
              filtered: bool = True,
              valid_headsign: bool = True) -> DataFrame:
    """Explode ``upcoming_services``; ``filtered`` applies P7 and (by
    default) P8 (used by routes-for-stop and arrivals; get_timetable
    shows all services, `Mongo/app.py:87-102`).  ``valid_headsign=False``
    keeps the public-service filter but skips the NOT-IN-SERVICE/null
    headsign exclusion — the reference's flat arrivals drill-down
    (`Mongo/app.py:185-204`) matches the requested headsign directly and
    never applies P8."""
    if stop_id is None:
        df = denorm
    else:
        # point_read prunes to one stop_bucket partition when the denorm
        # came from a bucketed doc store (jobs/denormalize.py) — plain
        # frames fall back to the pushed stop_id filter
        from ..jobs.denormalize import point_read

        df = point_read(denorm, stop_id)
    svc = F.col("upcoming_services")
    if filtered:
        if valid_headsign:
            svc = F.filter(
                svc, lambda x: _public_service(x) & _valid_headsign(x)
            )
        else:
            svc = F.filter(svc, _public_service)
    return df.select(
        "stop_id", F.explode(svc).alias("s")
    ).select(
        "stop_id",
        F.col("s.route_id").alias("route_id"),
        F.col("s.route_short_name").alias("route_short_name"),
        F.col("s.route_long_name").alias("route_long_name"),
        F.col("s.trip_id").alias("trip_id"),
        F.col("s.service_id").alias("service_id"),
        F.col("s.trip_headsign").alias("trip_headsign"),
        F.col("s.departure_time").alias("departure_time"),
    )


def get_routes_for_stop(denorm: DataFrame, stop_id: str,
                        service_id: str | None = None) -> DataFrame:
    """A18/O11: distinct (route_short_name, trip_headsign) pairs at a stop,
    optionally narrowed to one public service (`Mongo/app.py:116-149`)."""
    df = _exploded(denorm, stop_id)
    if service_id is not None:
        df = df.filter(F.col("service_id") == service_id)
    return (
        df.select("route_short_name", "trip_headsign")
        .distinct()
        .orderBy("route_short_name", "trip_headsign")
    )


def get_arrivals_flat(
    denorm: DataFrame,
    stop_id: str,
    route_short_name: str | None = None,
    trip_headsign: str | None = None,
    service_id: str | None = None,
) -> DataFrame:
    """P9/P10: flat arrivals mode — the sorted list of non-empty departure
    times at a stop, optionally narrowed to a (route_short_name,
    trip_headsign, service_id) selection (`Mongo/app.py:185-204`, the
    route+headsign drill-down that returns ``{"times": [...], "count"}``).

    The public-service filter (P7) always applies, matching the
    reference's ``allowed_services`` check.  The valid-headsign exclusion
    (P8) applies ONLY when no explicit ``trip_headsign`` is requested:
    the reference's flat branch (`Mongo/app.py:185-204`) matches the
    requested headsign by direct equality with no NOT-IN-SERVICE/null
    exclusion, so a drill-down into trip_headsign='NOT IN SERVICE'
    returns its times there — and here.  The reference's
    ``simplify_time`` display unwrap is an API-edge concern
    (api/shapes.py), not part of the set semantics.

    Null departure_times are KEPT, as the literal 'NaT', exactly like
    ``get_timetable``: the reference ETL stringifies pandas NaT into the
    stored doc (`Mongo/denormalization.py:97`), and the string 'NaT' is
    truthy, so it survives the reference's ``[t for t in times if t]``
    and is counted ('NaT' also sorts after every HH:MM:SS string in both
    engines).  Only genuinely empty strings are dropped — the one falsy
    value the reference's filter can see.
    """
    df = _exploded(
        denorm, stop_id, valid_headsign=(trip_headsign is None)
    ).withColumn(
        "departure_time", F.coalesce(F.col("departure_time"), F.lit("NaT"))
    ).filter(F.col("departure_time") != "")
    for col, val in (
        ("route_short_name", route_short_name),
        ("trip_headsign", trip_headsign),
        ("service_id", service_id),
    ):
        if val is not None:
            df = df.filter(F.col(col) == val)
    return df.select("departure_time").orderBy("departure_time")


def get_arrivals_grouped(
    denorm: DataFrame,
    stop_id: str,
    route_short_name: str | None = None,
    trip_headsign: str | None = None,
    service_id: str | None = None,
) -> DataFrame:
    """A19: arrivals at a stop grouped by (route_id, headsign) with the
    sorted time list and per-group count (`Mongo/app.py:206-244`).

    Null departure_times are kept as 'NaT' in the time lists and counts,
    matching the reference's truthy stringified-NaT behavior — see
    ``get_arrivals_flat``."""
    df = _exploded(denorm, stop_id).withColumn(
        "departure_time", F.coalesce(F.col("departure_time"), F.lit("NaT"))
    ).filter(F.col("departure_time") != "")
    for col, val in (
        ("route_short_name", route_short_name),
        ("trip_headsign", trip_headsign),
        ("service_id", service_id),
    ):
        if val is not None:
            df = df.filter(F.col(col) == val)
    return (
        df.groupBy("route_id", "route_short_name", "trip_headsign")
        .agg(
            F.sort_array(F.collect_list("departure_time")).alias("times"),
            F.count(F.lit(1)).alias("count"),
        )
        .orderBy("route_short_name", "trip_headsign")
    )


def get_timetable(denorm: DataFrame, stop_id: str) -> DataFrame:
    """A17/O9: route_long_name -> headsign -> sorted wrapped times
    (`Mongo/app.py:66-113`).  Times are clock-face wrapped like the
    reference's Timedelta round-trip (hour 25 -> 01).

    Null departure_times are KEPT and rendered as the literal 'NaT':
    the reference's ETL stores ``str(row['departure_time'])``
    (`Mongo/denormalization.py:97`), so a SQL NULL time reaches Mongo as
    the string 'NaT' (pandas NaT stringified) and shows up in the
    timetable; dropping the row here would silently diverge.  Null
    route_long_name / trip_headsign group keys pass through unchanged —
    the reference's ``service.get(key, default)`` defaults are dead code
    (the ETL writes every key on every service dict, so ``.get`` never
    falls back to 'Unknown Route'/'Unknown Direction').  The HTTP edge
    maps a None key to the literal "null" (api/http.py — Flask's sorted
    jsonify cannot mix None and str keys; the reference app would 500
    there)."""
    from ..functions.gtfs_time import time_to_secs, wrap_display_time

    df = _exploded(denorm, stop_id, filtered=False)
    wrapped = F.coalesce(
        wrap_display_time(time_to_secs(F.col("departure_time"))),
        F.lit("NaT"),
    )
    return (
        df.withColumn("display_time", wrapped)
        .groupBy("route_long_name", "trip_headsign")
        .agg(
            F.sort_array(F.collect_list("display_time")).alias("times"),
        )
        .orderBy("route_long_name", "trip_headsign")
    )
