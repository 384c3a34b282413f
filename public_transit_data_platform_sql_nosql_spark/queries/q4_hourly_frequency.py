"""Q4 -- hourly service frequency (reference
`/root/reference/SQL/sql_utils.py:311-422`, `SQL/Q4 service frequency.sql`).

Built on the shared hourly-frequency view (queries/common.py).  Pieces:

- ``top_routes_daily``: rank routes by total daily trips (A10 + O4).
- ``detail_rows``: per-(route, service, hour) rows restricted to the ranked
  routes -- the reference's hand-rolled membership-set semi join (J5,
  `sql_utils.py:339,372`) expressed as a real ``left_semi`` join.
- ``whole_week_hourly``: per-(route, hour) sums across services '1'-'3'
  (A14, `generate_csv.py:119-124`).
- ``totals_by_service``: pivot to per-service day totals plus the
  fixed-divisor /3.0 weekly average (A15, `sql_utils.py:386-401` -- divides
  by 3 even when a service is absent; quirk preserved).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.params import apply_limit, apply_service_filter


def route_daily_totals(
    hourly: DataFrame,
    routes: DataFrame,
    service_id: object = None,
) -> DataFrame:
    """SUM(trips_per_hour) per route_long_name (+ short name), optionally
    filtered to one service (`sql_utils.py:320-335`)."""
    h = apply_service_filter(hourly, service_id)
    return (
        h.join(F.broadcast(routes.select("route_id", "route_short_name",
                                         "route_long_name")), "route_id")
        .groupBy("route_long_name", "route_short_name")
        .agg(F.sum("trips_per_hour").alias("total_daily_trips"))
    )


def top_routes_daily(
    hourly: DataFrame,
    routes: DataFrame,
    service_id: object = None,
    limit: object = 20,
) -> DataFrame:
    # tiebreak on coalesce(short,'') -- engine-neutral NULL ordering, so the
    # top-k row selection is deterministic across Spark and SQL oracles
    ranked = route_daily_totals(hourly, routes, service_id).orderBy(
        F.desc("total_daily_trips"), F.asc("route_long_name"),
        F.asc(F.coalesce(F.col("route_short_name"), F.lit(""))),
    )
    return apply_limit(ranked, limit)


def detail_rows(
    hourly: DataFrame,
    routes: DataFrame,
    service_id: object = None,
    limit: object = 20,
) -> DataFrame:
    """Per-(route, service, hour) rows for the ranked routes only --
    J5 semi join + O6 ordering (`sql_utils.py:337-352`)."""
    top = top_routes_daily(hourly, routes, service_id, limit).select(
        F.col("route_long_name").alias("t_long"),
        F.col("route_short_name").alias("t_short"),
    )
    h = apply_service_filter(hourly, service_id)
    joined = h.join(
        F.broadcast(routes.select("route_id", "route_short_name",
                                  "route_long_name")), "route_id")
    # null-safe semi join: the reference's Python tuple-membership set treats
    # None == None as a match (`sql_utils.py:339,372`)
    return (
        joined.join(
            F.broadcast(top),
            (joined.route_long_name == top.t_long)
            & joined.route_short_name.eqNullSafe(top.t_short),
            "left_semi",
        )
        .groupBy("route_long_name", "route_short_name", "service_id",
                 "hour_of_day")
        .agg(F.sum("trips_per_hour").alias("trips_per_hour"))
        .orderBy("route_long_name", "route_short_name", "service_id",
                 "hour_of_day")
    )


def whole_week_hourly(hourly: DataFrame, routes: DataFrame) -> DataFrame:
    """Hour profile summed across services (A14)."""
    return (
        hourly.join(F.broadcast(routes.select("route_id", "route_short_name",
                                              "route_long_name")), "route_id")
        .groupBy("route_long_name", "route_short_name", "hour_of_day")
        .agg(F.sum("trips_per_hour").alias("trips_per_hour"))
    )


def totals_by_service(hourly: DataFrame, routes: DataFrame) -> DataFrame:
    """Per-route day totals for services '1','2','3' + average_daily_trips =
    (t1+t2+t3)/3.0 with the reference's fixed divisor (A15)."""
    pivoted = (
        hourly.join(F.broadcast(routes.select("route_id", "route_short_name",
                                              "route_long_name")), "route_id")
        .groupBy("route_long_name", "route_short_name")
        .pivot("service_id", ["1", "2", "3"])
        .sum("trips_per_hour")
    )
    t1 = F.coalesce(F.col("1"), F.lit(0)).alias("weekday_trips")
    t2 = F.coalesce(F.col("2"), F.lit(0)).alias("saturday_trips")
    t3 = F.coalesce(F.col("3"), F.lit(0)).alias("sunday_trips")
    return pivoted.select(
        "route_long_name", "route_short_name", t1, t2, t3
    ).withColumn(
        "average_daily_trips",
        (F.col("weekday_trips") + F.col("saturday_trips")
         + F.col("sunday_trips")) / 3.0,
    )


def hourly_profile(
    hourly: DataFrame,
    routes: DataFrame,
    service_id: object = None,
) -> DataFrame:
    """Ordered hourly-frequency profile string per (route_long_name,
    service_id) plus the day total — the static-SQL GROUP_CONCAT form (A11,
    reference `/root/reference/SQL/Q4 service frequency.sql:19-30`):
    ``GROUP_CONCAT(CONCAT(hour,':',cnt) ORDER BY hour SEPARATOR ' | ')``.

    Sort-before-concat: ``array_sort(collect_list(struct(hour, trips)))``.
    Sorting the struct on BOTH fields makes the concat total — same-named
    routes contribute multiple route_ids, so one (long_name, hour) can
    repeat and hour alone would not be a deterministic order.  Equal
    structs render equal strings, so the result is engine-stable.

    Scale: collect_list holds <=29 hour slots x few same-named routes per
    group — bounded, no skew; partial aggregation applies; routes (dim)
    is broadcast.
    """
    h = apply_service_filter(hourly, service_id)
    prof = F.concat_ws(
        " | ",
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("hour_of_day", "trips_per_hour"))
            ),
            lambda x: F.concat_ws(
                ":",
                x["hour_of_day"].cast("string"),
                x["trips_per_hour"].cast("string"),
            ),
        ),
    )
    return (
        h.join(F.broadcast(routes.select("route_id", "route_long_name")),
               "route_id")
        .groupBy("route_long_name", "service_id")
        .agg(
            prof.alias("hourly_frequency_profile"),
            F.sum("trips_per_hour").alias("total_daily_trips"),
        )
    )
