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

Two execution shapes per walk, one semantics:

- the UNROLLED form (``reachable_stops``, ``stop_pagerank``) compiles
  the whole k-level expansion into ONE static Catalyst plan — right
  for small compile-time k (no driver round-trips, cross-level
  optimization);
- the DEEP form (``reachable_stops_deep``, ``stop_pagerank_deep``)
  runs a driver loop with a per-level eager ``localCheckpoint`` — the
  dedup_clusters lineage-truncation pattern — so plan size stays O(1)
  per level at any depth, and an exhausted frontier short-circuits the
  remaining levels.  Parity between the two forms is pytest-asserted.

Cache lifecycle: every operator persists its dimension-sized edge
table (each unrolled level reads it twice; without the persist each
level would re-run the fact-sized stop_times x trips join — measured:
no ReusedExchange appears in the unpersisted plan).  To keep that
cache from outliving the call in a long-lived session, operators
MATERIALIZE their result (eager ``localCheckpoint``: executor-storage
backed, lineage truncated) and then ``unpersist()`` everything they
cached — after return, the session's cache manager holds nothing of
the operator's (asserted by tests/test_graph.py).  Join-shape plan
tests target the lazy ``_*_plan`` builders, which is also the escape
hatch for callers who want to own the lifecycle themselves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


def _finalize(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize ``result`` (eager localCheckpoint — computed once,
    lineage truncated onto executor storage) and release every
    DataFrame the operator persisted.  The checkpoint means the
    returned result never re-reads the internal caches, so the
    unpersist is safe-by-construction, not a race with the caller's
    first action."""
    out = result.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out


def _check_budget(max_transfers: int) -> None:
    if max_transfers < 0:
        raise ValueError(
            f"max_transfers must be >= 0, got {max_transfers!r}")


def _reachable_plan(spark: SparkSession, sr: DataFrame,
                    origin_stop_id: str, max_transfers: int) -> DataFrame:
    """The lazy unrolled BFS plan over a (caller-persisted) edge table.

    Each BFS level is two hash equi-joins against the edge table
    (stops -> routes they serve -> stops on those routes), with a
    left-anti prune against everything already reached so the frontier
    only carries NEW stops.  ``max_transfers`` is a compile-time
    constant: levels unroll into ONE static plan, no driver
    round-trips.  An origin serving no route yields just the origin
    row.
    """
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


def reachable_stops(stop_times: DataFrame, trips: DataFrame,
                    origin_stop_id: str,
                    max_transfers: int = 2) -> DataFrame:
    """All stops reachable from ``origin_stop_id`` within
    ``max_transfers`` transfers, with the minimum ride count:
    ``(stop_id, n_rides)``, ``n_rides = 0`` for the origin itself.

    Unrolled static plan (see :func:`_reachable_plan`); the result is
    materialized and the edge-table cache released before returning
    (module docstring).  For deep budgets use
    :func:`reachable_stops_deep` — same semantics, O(1) plan per level.
    """
    _check_budget(max_transfers)
    spark = stop_times.sparkSession
    sr = stop_route_edges(stop_times, trips).persist()
    return _finalize(
        _reachable_plan(spark, sr, origin_stop_id, max_transfers), sr)


def reachable_stops_deep(stop_times: DataFrame, trips: DataFrame,
                         origin_stop_id: str,
                         max_transfers: int = 8) -> DataFrame:
    """:func:`reachable_stops` for DEEP ride budgets: a driver loop
    with a per-level eager ``localCheckpoint`` of the frontier and the
    reached set, so the plan each level executes is O(1)-sized (two
    hash joins over the cached edge table + two RDD scans) no matter
    how large ``max_transfers`` is — the dedup_clusters
    lineage-truncation pattern the unrolled form's docstring points at.

    The checkpoint materializes each level anyway, so the loop also
    SHORT-CIRCUITS on an exhausted frontier (``len(head(1)) == 0``):
    on a connected transit graph reachability saturates after a few
    rides, and the deep walk stops there instead of executing empty
    levels — something the static unrolled plan cannot do.  Exact
    parity with the unrolled form at equal budgets is pytest-asserted.
    """
    _check_budget(max_transfers)
    spark = stop_times.sparkSession
    sr = stop_route_edges(stop_times, trips).persist()
    origin = spark.createDataFrame(
        [(str(origin_stop_id), 0)], "stop_id string, n_rides int")
    result = origin.localCheckpoint(eager=True)
    reached = result.select("stop_id")
    frontier = reached
    for k in range(1, max_transfers + 2):
        routes_k = (
            sr.join(frontier, "stop_id").select("route_id").distinct())
        stops_k = (
            sr.join(routes_k, "route_id").select("stop_id").distinct()
            .join(reached, "stop_id", "left_anti")
        )
        frontier = stops_k.localCheckpoint(eager=True)
        if not frontier.head(1):
            break
        result = result.unionByName(
            frontier.withColumn("n_rides", F.lit(k))
        ).localCheckpoint(eager=True)
        reached = result.select("stop_id")
    sr.unpersist()
    # one row per stop by construction (anti-join prune); keep the min
    # aggregate so the contract matches the unrolled form exactly
    return (
        result.groupBy("stop_id")
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


def _multimodal_plan(spark: SparkSession, sr: DataFrame, walk: DataFrame,
                     origin_stop_id: str, max_transfers: int) -> DataFrame:
    """Lazy unrolled walk-aware BFS over caller-persisted ride and walk
    edge tables: each level is the ride expansion plus one hash join
    against the symmetric walk edges (at most ONE walk hop before the
    first ride, between consecutive rides, and after the last — the
    standard multimodal ride/walk alternation, bounded so the walk
    layer cannot chain into unbounded pedestrian closure).  ``n_rides``
    counts rides only; walking is free."""

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


def reachable_stops_multimodal(stop_times: DataFrame, trips: DataFrame,
                               stops: DataFrame, origin_stop_id: str,
                               max_transfers: int = 2,
                               eps: float = 0.02) -> DataFrame:
    """Walk-aware reachability: like :func:`reachable_stops`, but with
    at most one walk hop (<= ``eps`` latitude-equivalent degrees,
    queries/geo.py metric) allowed around each ride (see
    :func:`_multimodal_plan`).  The oracle mirrors the unrolled levels
    with the same grid-blocked walk CTE the geo family uses.  Both
    edge tables feed every level, so both are persisted for the
    operator's lifetime and released after materialization.
    """
    _check_budget(max_transfers)
    spark = stop_times.sparkSession
    sr = stop_route_edges(stop_times, trips).persist()
    walk = walk_edges(stops, eps).persist()
    return _finalize(
        _multimodal_plan(spark, sr, walk, origin_stop_id, max_transfers),
        sr, walk)


def _pagerank_round(edges: DataFrame, sdeg: DataFrame, rdeg: DataFrame,
                    s_rank: DataFrame) -> DataFrame:
    """One stop -> routes -> stops mass iteration (2 hash joins + 2
    map-side-combined groupBys over the edge table)."""
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
    return sdeg.join(s_in, "stop_id", "left").select(
        "stop_id",
        F.expr("150000 + (85 * coalesce(s_in, 0)) DIV 100")
        .cast("long").alias("s_rank"))


def _pagerank_plan(edges: DataFrame, n_iter: int,
                   sdeg: DataFrame | None = None,
                   rdeg: DataFrame | None = None) -> DataFrame:
    """Lazy unrolled mass iteration over a caller-persisted edge table
    (callers that loop pass pre-persisted degree tables — each
    iteration reads both twice)."""
    if sdeg is None:
        sdeg = edges.groupBy("stop_id").agg(
            F.count(F.lit(1)).cast("long").alias("s_deg"))
    if rdeg is None:
        rdeg = edges.groupBy("route_id").agg(
            F.count(F.lit(1)).cast("long").alias("r_deg"))
    s_rank = sdeg.select(
        "stop_id", F.lit(1_000_000).cast("long").alias("s_rank"))
    for _ in range(n_iter):
        s_rank = _pagerank_round(edges, sdeg, rdeg, s_rank)
    return s_rank.select("stop_id", F.col("s_rank").alias("rank_micro"))


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
    is a compile-time constant; the levels unroll into ONE static plan
    over the persisted dimension-sized edge table, then the result is
    materialized and the cache released).  For deep iteration counts
    use :func:`stop_pagerank_deep` — same chain, O(1) plan per round.
    """
    edges = stop_route_edges(stop_times, trips).persist()
    # the degree tables feed every unrolled iteration twice (the mass
    # join and the rank rebuild); leaving them lazy re-shuffles the edge
    # table ~4x per iteration (measured 24 s -> 4.7 s at sf0.1)
    sdeg = edges.groupBy("stop_id").agg(
        F.count(F.lit(1)).cast("long").alias("s_deg")).persist()
    rdeg = edges.groupBy("route_id").agg(
        F.count(F.lit(1)).cast("long").alias("r_deg")).persist()
    return _finalize(
        _pagerank_plan(edges, n_iter, sdeg, rdeg), edges, sdeg, rdeg)


def stop_pagerank_deep(stop_times: DataFrame, trips: DataFrame,
                       n_iter: int = 10) -> DataFrame:
    """:func:`stop_pagerank` for deep iteration counts: a driver loop
    that eagerly ``localCheckpoint``s the rank table every round, so
    each round executes the same O(1)-sized plan (2 joins + 2
    aggregations) instead of an ``n_iter``-times-unrolled chain —
    Catalyst analysis time stays flat and lineage never grows.  The
    integer-micro chain is IDENTICAL to the unrolled form round for
    round (pytest asserts bit-equality at equal ``n_iter``); the
    degree tables are persisted for the loop and released on return.
    """
    edges = stop_route_edges(stop_times, trips).persist()
    sdeg = edges.groupBy("stop_id").agg(
        F.count(F.lit(1)).cast("long").alias("s_deg")).persist()
    rdeg = edges.groupBy("route_id").agg(
        F.count(F.lit(1)).cast("long").alias("r_deg")).persist()
    s_rank = sdeg.select(
        "stop_id", F.lit(1_000_000).cast("long").alias("s_rank"))
    for _ in range(n_iter):
        s_rank = _pagerank_round(
            edges, sdeg, rdeg, s_rank).localCheckpoint(eager=True)
    out = s_rank.select("stop_id", F.col("s_rank").alias("rank_micro"))
    return _finalize(out, edges, sdeg, rdeg)
