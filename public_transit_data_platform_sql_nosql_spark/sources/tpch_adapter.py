"""Deterministic GTFS-shaped views over the driver's TPC-H-ish testdata.

The engine's semantics are GTFS (SURVEY.md SS1), but the correctness harness
runs on the synthetic TPC-H-ish parquet tables (TESTDATA.md).  This module
derives the five GTFS tables from those tables with *pure integer
arithmetic* so that Spark SQL and the DuckDB oracle compute bit-identical
inputs, and the real engine queries (queries/, jobs/) can be differentially
tested end-to-end against ANSI-SQL oracles.

Mapping (one definition, rendered to both dialects from the same template;
the only dialect substitution is format_string vs printf):

  part      -> stops       (stop per part; lat/lon from rational arithmetic;
                            stop_code NULL every 10th -- FIXTURES.md nullability)
  nation    -> routes      (25 routes; route_long_name collides on purpose:
                            'ROUTE-<nationkey%13>' exercises the Q2
                            group-by-long-name trap, SURVEY.md SS7.3)
  orders    -> trips       (service_id '1'|'2'|'3' = 1+o_orderkey%3;
                            headsign NULL / 'NOT IN SERVICE' injections)
  lineitem  -> stop_times  (times 0..28:59:59 -- GTFS >24h hours exercised;
                            NULL times every 53rd row)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TPCH_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

GTFS_VIEWS = ("gtfs_stops", "gtfs_routes", "gtfs_trips", "gtfs_stop_times")

# {fmt} -> 'format_string' (Spark) / 'printf' (DuckDB).  Everything else is
# shared ANSI SQL evaluated identically by both engines (floor-division is
# spelled floor(x / N) to avoid DuckDB's round-on-cast semantics).
_STOPS_SQL = """
SELECT
  CAST(p_partkey AS STRING)                       AS stop_id,
  CASE WHEN p_partkey % 10 = 0 THEN NULL
       ELSE 'SC' || CAST(p_partkey AS STRING) END AS stop_code,
  p_name                                          AS stop_name,
  CAST(43.0 AS DOUBLE) + (p_partkey % 97) / CAST(97.0 AS DOUBLE)  AS stop_lat,
  CAST(-79.0 AS DOUBLE) - (p_partkey % 89) / CAST(89.0 AS DOUBLE) AS stop_lon
FROM part
"""

_ROUTES_SQL = """
SELECT
  CAST(n_nationkey AS STRING)                        AS route_id,
  CASE WHEN n_nationkey % 7 = 0 THEN NULL
       ELSE n_name END                               AS route_short_name,
  'ROUTE-' || CAST(n_nationkey % 13 AS STRING)       AS route_long_name,
  CAST(n_regionkey AS INT)                           AS route_type
FROM nation
"""

_TRIPS_SQL = """
SELECT
  CAST(o_orderkey AS STRING)                AS trip_id,
  CAST(o_custkey % 25 AS STRING)            AS route_id,
  CAST(1 + o_orderkey % 3 AS STRING)        AS service_id,
  CASE WHEN o_orderkey % 37 = 0 THEN NULL
       WHEN o_orderkey % 41 = 0 THEN 'NOT IN SERVICE'
       ELSE o_orderpriority END             AS trip_headsign,
  CAST(o_orderkey % 2 AS INT)               AS direction_id
FROM orders
"""

# departure_secs in [0, 104400) => hours 0..28 (GTFS overnight range).
# arrival <= departure; single-line orders yield duration <= 0 (exercises
# the HAVING > 60 data-quality filter, SURVEY.md P5).
_STOP_TIMES_SQL = """
SELECT
  trip_id, stop_id, stop_sequence,
  arrival_secs, departure_secs,
  CASE WHEN arrival_secs IS NULL THEN NULL ELSE
    {fmt}('%02d:%02d:%02d',
      CAST(floor(arrival_secs / 3600) AS INT),
      CAST(floor((arrival_secs % 3600) / 60) AS INT),
      CAST(arrival_secs % 60 AS INT)) END    AS arrival_time,
  CASE WHEN departure_secs IS NULL THEN NULL ELSE
    {fmt}('%02d:%02d:%02d',
      CAST(floor(departure_secs / 3600) AS INT),
      CAST(floor((departure_secs % 3600) / 60) AS INT),
      CAST(departure_secs % 60 AS INT)) END  AS departure_time,
  shape_dist_traveled
FROM (
  SELECT
    CAST(l_orderkey AS STRING)    AS trip_id,
    CAST(l_partkey AS STRING)     AS stop_id,
    CAST(l_linenumber AS INT)     AS stop_sequence,
    CASE WHEN (l_orderkey + l_linenumber) % 53 = 0 THEN NULL
         ELSE CAST(greatest(
                (l_orderkey * 131 + l_linenumber * 977) % 104400
                  - (l_suppkey % 120), 0) AS INT) END AS arrival_secs,
    CASE WHEN (l_orderkey + l_linenumber) % 53 = 0 THEN NULL
         ELSE CAST((l_orderkey * 131 + l_linenumber * 977) % 104400 AS INT)
         END                      AS departure_secs,
    CASE WHEN l_orderkey % 29 = 0 THEN NULL
         ELSE l_quantity * l_linenumber / CAST(10.0 AS DOUBLE)
         END                      AS shape_dist_traveled
  FROM lineitem
) raw
"""

_TEMPLATES = {
    "gtfs_stops": _STOPS_SQL,
    "gtfs_routes": _ROUTES_SQL,
    "gtfs_trips": _TRIPS_SQL,
    "gtfs_stop_times": _STOP_TIMES_SQL,
}


def register_tpch(
    spark: SparkSession, sf_dir: str,
    tables: tuple[str, ...] = TPCH_TABLES,
) -> dict[str, DataFrame]:
    """Register raw testdata parquet tables as temp views.

    NOTE: ``events.parquet`` carries TIMESTAMP(NANOS) which Spark 4 rejects
    unless ``spark.sql.legacy.parquet.nanosAsLong`` is set.  That conf is
    runtime-settable, and the correctness harness builds its *own*
    SparkSession (so session.py's session-factory config never applies) —
    set it here, unconditionally, so the reads work under any session.

    SESSION-GLOBAL SIDE EFFECT (deliberate): the conf stays set on the
    caller's session, so ANY later parquet read of a TIMESTAMP(NANOS)
    column in the same session decodes it as long.  It cannot be scoped
    per-read (there is no DataFrameReader option for it), and it cannot
    be save/restored around this call because Spark reads are lazy — the
    scan that needs it may execute long after this function returns.
    Callers who need nanos-as-timestamp elsewhere must unset it
    themselves between reads.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    out = {}
    for name in tables:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if name == "events":
            df = normalize_events_ts(df)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize ``events.ts`` to the engine's internal convention —
    BIGINT epoch NANOSECONDS — whatever physical type the parquet carries.

    The driver regenerates the testdata between rounds and has shipped
    ``ts`` both as TIMESTAMP(NANOS) (which ``nanosAsLong`` decodes to long
    nanos already) and as timestamp[us] (which Spark 4 reads as
    TIMESTAMP_NTZ).  Downstream operators (queries/events.py,
    streaming/jobs.py) and their DuckDB oracles (`epoch_ns(ts)`) all
    assume epoch nanos, so convert here, once, at the read boundary.

    The TIMESTAMP_NTZ branch is deliberately session-timezone-free: an
    NTZ value is a wall clock with no zone, and ``cast(ntz AS timestamp)``
    would interpret it in the session zone — a different session zone
    would silently shift every window/day bucket vs the DuckDB oracle
    (whose ``epoch_ns`` treats the naive value as UTC).  Pure field
    arithmetic (datediff + extract) pins the same treat-as-UTC semantics
    regardless of ``spark.sql.session.timeZone``.
    """
    dt = df.schema["ts"].dataType
    if isinstance(dt, T.LongType):
        return df
    if isinstance(dt, T.TimestampType):
        return df.withColumn("ts", F.unix_micros("ts") * F.lit(1000))
    if isinstance(dt, T.TimestampNTZType):
        epoch_us = (
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
            .cast("long") * F.lit(86_400_000_000)
            + F.expr("extract(HOUR FROM ts)").cast("long")
            * F.lit(3_600_000_000)
            + F.expr("extract(MINUTE FROM ts)").cast("long")
            * F.lit(60_000_000)
            + F.expr("CAST(extract(SECOND FROM ts) * 1000000 AS BIGINT)")
        )
        return df.withColumn("ts", epoch_us * F.lit(1000))
    raise TypeError(f"events.ts: unsupported parquet type {dt}")


def register_gtfs_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register GTFS-shaped temp views derived from the testdata; returns
    {stops, routes, trips, stop_times} DataFrames for the engine queries."""
    register_tpch(spark, sf_dir, ("part", "nation", "orders", "lineitem"))
    out = {}
    for view, template in _TEMPLATES.items():
        df = spark.sql(template.format(fmt="format_string"))
        df.createOrReplaceTempView(view)
        out[view.removeprefix("gtfs_")] = df
    return out


def duckdb_ctes() -> str:
    """The same four tables as a DuckDB ``WITH`` prefix (the driver
    pre-registers the raw parquet tables as views with their bare names)."""
    parts = [
        f"{view.removeprefix('gtfs_')} AS ({template.format(fmt='printf')})"
        for view, template in _TEMPLATES.items()
    ]
    return "WITH " + ",\n".join(parts)
