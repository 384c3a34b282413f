"""Authoritative Spark schemas for the five GTFS core tables.

Mirrors the reference DDL (`/root/reference/SQL/transit schema.sql:16-95`),
with two deliberate deviations (SURVEY.md SS1.2, SS1.4):

- MySQL ``FLOAT`` lat/lon -> ``DoubleType`` (outputs are rounded at the API
  edge anyway, and Double round-trips Python floats exactly).
- MySQL ``TIME`` (which holds GTFS overnight values like ``25:30:00``) has no
  Spark equivalent; we carry each time as a raw ``"HH:MM:SS"`` string PLUS a
  derived nullable ``IntegerType`` seconds-since-midnight column
  (``arrival_secs`` / ``departure_secs``).  ``floor(secs/3600)`` then
  reproduces MySQL ``HOUR()`` including hours >= 24
  (`/root/reference/SQL/Q4 Create View.sql:2`).
"""

from __future__ import annotations

from pyspark.sql import types as T


def _f(name: str, dtype: T.DataType, nullable: bool = True) -> T.StructField:
    return T.StructField(name, dtype, nullable)


S = T.StringType()
I = T.IntegerType()
D = T.DoubleType()

# transit schema.sql:16-28
CALENDAR = T.StructType([
    _f("service_id", S, False),
    _f("monday", I), _f("tuesday", I), _f("wednesday", I), _f("thursday", I),
    _f("friday", I), _f("saturday", I), _f("sunday", I),
    _f("start_date", T.DateType()),
    _f("end_date", T.DateType()),
])

# transit schema.sql:33-42
ROUTES = T.StructType([
    _f("route_id", S, False),
    _f("agency_id", S),
    _f("route_short_name", S),
    _f("route_long_name", S),
    _f("route_desc", S),
    _f("route_type", I),
    _f("route_color", S),
])

# transit schema.sql:47-61
TRIPS = T.StructType([
    _f("trip_id", S, False),
    _f("route_id", S, False),
    _f("service_id", S, False),
    _f("trip_headsign", S),
    _f("direction_id", I),
    _f("shape_id", S),
    _f("wheelchair_accessible", I),
    _f("bikes_allowed", I),
])

# transit schema.sql:66-76
STOPS = T.StructType([
    _f("stop_id", S, False),
    _f("stop_code", S),
    _f("stop_name", S, False),
    _f("stop_desc", S),
    _f("stop_lat", D, False),
    _f("stop_lon", D, False),
    _f("zone_id", S),
    _f("wheelchair_boarding", I),
])

# transit schema.sql:81-95 -- raw GTFS text columns; arrival_secs /
# departure_secs are derived at ingest (sources/ingest.py).
STOP_TIMES_RAW = T.StructType([
    _f("trip_id", S, False),
    _f("arrival_time", S),
    _f("departure_time", S),
    _f("stop_id", S, False),
    _f("stop_sequence", I, False),
    _f("stop_headsign", S),
    _f("pickup_type", I),
    _f("drop_off_type", I),
    _f("shape_dist_traveled", D),
])

STOP_TIMES = T.StructType(
    STOP_TIMES_RAW.fields
    + [_f("arrival_secs", I), _f("departure_secs", I)]
)

GTFS_TABLES = {
    "calendar": CALENDAR,
    "routes": ROUTES,
    "trips": TRIPS,
    "stops": STOPS,
    "stop_times": STOP_TIMES_RAW,
}

# Denormalized stop-centric timetable document
# (`Mongo/denormalization.py:109-127`): one row per stop, a GeoJSON-shaped
# location struct, and an array of service structs sorted by departure time.
SERVICE_STRUCT = T.StructType([
    _f("route_id", S),
    _f("route_short_name", S),
    _f("route_long_name", S),
    _f("trip_id", S),
    _f("service_id", S),
    _f("trip_headsign", S),
    _f("departure_time", S),
])

STOP_TIMETABLE = T.StructType([
    _f("stop_id", S, False),
    _f("stop_name", S),
    _f("stop_code", S),
    _f("location", T.StructType([
        _f("type", S),
        _f("coordinates", T.ArrayType(D)),
    ])),
    _f("upcoming_services", T.ArrayType(SERVICE_STRUCT)),
])
