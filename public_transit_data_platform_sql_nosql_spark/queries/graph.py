"""Transit-graph reachability (extension surface).

The reference renders stops and routes but never answers "what can I
reach from here?" — the first question of a journey planner.  This
module adds minimum-ride BFS over the stop-route bipartite graph
(`/root/reference/SQL/transit schema.sql:62-76` defines the underlying
stops/trips/stop_times relations), built the way a distributed engine
does graph expansion: per-level hash equi-joins over the edge table,
never an adjacency broadcast or a driver-side frontier.

Semantics: a RIDE boards one route; ``n_rides(stop)`` is the minimum
number of rides to reach ``stop`` (0 for the origin, 1 for every stop
sharing a route with it, ...).  Transfers = rides - 1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stop_route_edges(stop_times: DataFrame, trips: DataFrame) -> DataFrame:
    """Distinct (stop_id, route_id) bipartite edge table — the transit
    graph every expansion below walks.  Dimension-sized (stops x
    routes-per-stop), not fact-sized."""
    return (
        stop_times.join(trips.select("trip_id", "route_id"), "trip_id")
        .select("stop_id", "route_id")
        .distinct()
    )


def reachable_stops(stop_times: DataFrame, trips: DataFrame,
                    origin_stop_id: str,
                    max_transfers: int = 2) -> DataFrame:
    """All stops reachable from ``origin_stop_id`` within
    ``max_transfers`` transfers, with the minimum ride count:
    ``(stop_id, n_rides)``, ``n_rides = 0`` for the origin itself.

    Each BFS level is two hash equi-joins against the persisted edge
    table (stops -> routes they serve -> stops on those routes), with a
    left-anti prune against everything already reached so the frontier
    only carries NEW stops — the same frontier discipline as
    ``dedup_clusters``'s label propagation.  ``max_transfers`` is a
    compile-time constant (levels unroll into ONE static plan — no
    driver round-trips); for deep-k graph walks, re-persist the frontier
    per round instead (the dedup_clusters/localCheckpoint pattern).

    The edge table feeds every level (2 joins per level), so it is
    persisted here — it is dimension-sized by construction, and without
    the persist each level re-runs the stop_times x trips join.
    An origin serving no route yields just the origin row.
    """
    if max_transfers < 0:
        raise ValueError(
            f"max_transfers must be >= 0, got {max_transfers!r}")
    spark = stop_times.sparkSession
    sr = stop_route_edges(stop_times, trips).persist()
    origin = spark.createDataFrame(
        [(str(origin_stop_id), 0)], "stop_id string, n_rides int")
    levels = [origin]
    reached = origin.select("stop_id")
    frontier = reached
    for k in range(1, max_transfers + 2):  # rides = transfers + 1
        routes_k = (
            sr.join(frontier, "stop_id").select("route_id").distinct())
        stops_k = (
            sr.join(routes_k, "route_id").select("stop_id").distinct()
            .join(reached, "stop_id", "left_anti")
        )
        levels.append(stops_k.withColumn("n_rides", F.lit(k)))
        reached = reached.unionByName(stops_k)
        frontier = stops_k
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    # the anti-join prune already guarantees one row per stop; the min
    # aggregate keeps the operator's contract independent of pruning
    return (
        out.groupBy("stop_id")
        .agg(F.min("n_rides").cast("long").alias("n_rides"))
    )


def walk_edges(stops: DataFrame, eps: float = 0.02) -> DataFrame:
    """Symmetric walkable edges from the grid-blocked radius self-join
    (queries/geo.py stop_pairs_within): ``(stop_id, walk_id)`` in BOTH
    directions — the pedestrian layer of a multimodal graph."""
    from .geo import stop_pairs_within

    pairs = stop_pairs_within(stops, eps)
    fwd = pairs.select(F.col("stop_id_a").alias("stop_id"),
                       F.col("stop_id_b").alias("walk_id"))
    rev = pairs.select(F.col("stop_id_b").alias("stop_id"),
                       F.col("stop_id_a").alias("walk_id"))
    return fwd.unionByName(rev)


def reachable_stops_multimodal(stop_times: DataFrame, trips: DataFrame,
                               stops: DataFrame, origin_stop_id: str,
                               max_transfers: int = 2,
                               eps: float = 0.02) -> DataFrame:
    """Walk-aware reachability: like :func:`reachable_stops`, but with
    at most ONE walk hop (<= ``eps`` latitude-equivalent degrees,
    queries/geo.py metric) allowed before the first ride, between
    consecutive rides, and after the last — the standard multimodal
    ride/walk alternation, bounded so the walk layer cannot chain into
    unbounded pedestrian closure.  ``n_rides`` still counts rides only;
    walking is free.

    Each level is the ride expansion of :func:`reachable_stops` plus
    one hash join against the symmetric walk-edge table (persisted —
    it feeds every level); the frontier anti-join prune and the final
    ``min`` keep the same contract.  The oracle mirrors the unrolled
    levels with the same grid-blocked walk CTE the geo family uses.
    """
    if max_transfers < 0:
        raise ValueError(
            f"max_transfers must be >= 0, got {max_transfers!r}")
    spark = stop_times.sparkSession
    sr = stop_route_edges(stop_times, trips).persist()
    walk = walk_edges(stops, eps).persist()

    def _walk_expand(s: DataFrame) -> DataFrame:
        stepped = s.join(walk, "stop_id").select(
            F.col("walk_id").alias("stop_id"))
        return s.unionByName(stepped).distinct()

    origin = spark.createDataFrame(
        [(str(origin_stop_id),)], "stop_id string")
    at = _walk_expand(origin)  # where you can BE with 0 rides
    levels = [at.withColumn("n_rides", F.lit(0))]
    reached = at
    for k in range(1, max_transfers + 2):
        routes_k = sr.join(at, "stop_id").select("route_id").distinct()
        rode = sr.join(routes_k, "route_id").select("stop_id").distinct()
        at = _walk_expand(rode)
        fresh = at.join(reached, "stop_id", "left_anti")
        levels.append(fresh.withColumn("n_rides", F.lit(k)))
        reached = reached.unionByName(fresh)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return (
        out.groupBy("stop_id")
        .agg(F.min("n_rides").cast("long").alias("n_rides"))
    )


def stop_pagerank(stop_times: DataFrame, trips: DataFrame,
                  n_iter: int = 3) -> DataFrame:
    """Hub scoring of stops: PageRank-style mass iteration run directly
    on the BIPARTITE stop-route graph — ``(stop_id, rank_micro)``,
    higher = better-connected hub (the "which stations matter most"
    complement of Q1's raw departure counts and Q3's transfer heuristic).

    Mass alternates stop -> routes-it-serves -> stops-on-those-routes.
    Running on the bipartite edges (never projecting to a stop-stop
    graph) keeps per-iteration work ∝ |edges|: a 1000-stop trunk route
    contributes 1000 edge rows, not 1000² projected pairs — the
    difference between linear and quadratic at metro scale.

    Determinism (the driver hash-compares every row): integer micro
    masses, uniform teleport

        out_mass(v)  = rank_micro(v) DIV degree(v)
        rank_micro'  = 150_000 + (85 * sum(in_mass)) DIV 100

    — both engines truncate integer division toward zero, so the chain
    is bit-identical; no doubles, no convergence threshold (``n_iter``
    is a compile-time constant; the levels unroll into ONE static plan,
    2 hash joins + 2 map-side-combined groupBys per iteration over the
    persisted dimension-sized edge table).  For deep iteration counts,
    re-persist ranks per round (the dedup_clusters localCheckpoint
    pattern) instead of unrolling.
    """
    edges = stop_route_edges(stop_times, trips).persist()
    sdeg = edges.groupBy("stop_id").agg(
        F.count(F.lit(1)).cast("long").alias("s_deg"))
    rdeg = edges.groupBy("route_id").agg(
        F.count(F.lit(1)).cast("long").alias("r_deg"))
    s_rank = sdeg.select(
        "stop_id", F.lit(1_000_000).cast("long").alias("s_rank"))
    for _ in range(n_iter):
        r_in = (
            edges.join(s_rank, "stop_id").join(sdeg, "stop_id")
            .select("route_id", F.expr("s_rank DIV s_deg").alias("m"))
            .groupBy("route_id")
            .agg(F.sum("m").cast("long").alias("r_in"))
        )
        r_rank = rdeg.join(r_in, "route_id", "left").select(
            "route_id",
            F.expr("150000 + (85 * coalesce(r_in, 0)) DIV 100")
            .cast("long").alias("r_rank"))
        s_in = (
            edges.join(r_rank, "route_id").join(rdeg, "route_id")
            .select("stop_id", F.expr("r_rank DIV r_deg").alias("m"))
            .groupBy("stop_id")
            .agg(F.sum("m").cast("long").alias("s_in"))
        )
        s_rank = sdeg.join(s_in, "stop_id", "left").select(
            "stop_id",
            F.expr("150000 + (85 * coalesce(s_in, 0)) DIV 100")
            .cast("long").alias("s_rank"))
    return s_rank.select("stop_id", F.col("s_rank").alias("rank_micro"))
