"""Q3 -- transfer points (reference `/root/reference/SQL/sql_utils.py:108-145`,
static SQL `SQL/Q3 transfer points.sql`).

A transfer point is a stop served by >= 2 distinct routes.  Pipeline:
stop_times |><| trips -> optional service filter -> DISTINCT (stop_id,
route_id) -> |><| stops -> COUNT per stop -> HAVING >= 2 -> top-k.

The early DISTINCT (reference: "to avoid query timeout",
`Poster_Report.md:205-207`) is kept: it collapses the fact table to at most
|stops| x |routes| pairs before the per-stop count, which is exactly the
cardinality-reduction you want at 100 TB too.  Catalyst executes it as a
partial-then-final hash aggregate, so the shuffle carries deduped pairs only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.hints import broadcast_if_small
from ..operators.params import apply_limit, apply_service_filter


def q3_transfer_points(
    stop_times: DataFrame,
    trips: DataFrame,
    stops: DataFrame,
    service_id: object = None,
    limit: object = 20,
    min_routes: int = 2,
) -> DataFrame:
    t = apply_service_filter(
        trips.select("trip_id", "route_id", "service_id"), service_id
    )
    pairs = (
        stop_times.select("trip_id", "stop_id")
        .join(broadcast_if_small(t), "trip_id")
        .select("stop_id", "route_id")
        .distinct()
    )
    # Count per stop_id over the deduped pairs FIRST, then attach stop
    # attributes to the (already HAVING-filtered) per-stop counts (opt
    # guide §2.3): the attributes are functionally dependent on stop_id
    # (GTFS stops.txt primary key), so the count shuffle carries one
    # narrow key instead of five mixed-type group columns, and the
    # broadcast dim join touches |transfer stops| rows, not every pair.
    agg = (
        pairs.groupBy("stop_id")
        .agg(F.count("route_id").alias("num_unique_routes"))
        .filter(F.col("num_unique_routes") >= min_routes)
        .join(
            F.broadcast(stops.select("stop_id", "stop_code", "stop_name",
                                     "stop_lat", "stop_lon")),
            "stop_id",
        )
        .select("stop_id", "stop_code", "stop_name", "stop_lat", "stop_lon",
                "num_unique_routes")
        .orderBy(F.desc("num_unique_routes"), F.asc("stop_id"))
    )
    return apply_limit(agg, limit)
