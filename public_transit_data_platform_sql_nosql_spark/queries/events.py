"""Event-stream analytics over the ``events`` table (batch forms).

Input contract: ``ts`` is BIGINT epoch NANOSECONDS after
``sources/tpch_adapter.normalize_events_ts`` — whatever physical type the
parquet carries (the driver has shipped both TIMESTAMP(NANOS) and
timestamp[us] across rounds; normalization happens once, at the read
boundary).  All window math here is integer nanosecond arithmetic —
exact, timezone-free, and bit-identical to the DuckDB oracle's
``epoch_ns``.

Money-like doubles are aggregated as integer cents
(``sum(round(value*100))``): double summation order differs between
engines/partitionings, integer sums do not — the same discipline you'd
use for a 100 TB ledger.

The streaming twins of these operators live in streaming/jobs.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NS = 1_000_000_000

_CENTS = "cast(round(value * 100) AS bigint)"


def windowed_counts(events: DataFrame,
                    window_secs: int = 300) -> DataFrame:
    """Tumbling-window counts per event_type: n_events, distinct users,
    exact integer cents sum, min/max cents."""
    win = (F.expr(f"ts div {NS}") / window_secs).cast("long") * window_secs
    return (
        events.select(
            "event_type", "user_id",
            win.alias("window_start_sec"),
            F.expr(_CENTS).alias("cents"),
        )
        .groupBy("event_type", "window_start_sec")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum("cents").alias("sum_cents"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"),
        )
    )


def sessionize(events: DataFrame, gap_secs: int = 1800) -> DataFrame:
    """Gap-based sessionization per user (30-min default): a new session
    starts when the gap from the previous event exceeds ``gap_secs``.

    lag -> boundary flag -> running sum = session index, then one row per
    session.  Scale note: both windows partition by ``user_id``, so the
    whole operator is ONE shuffle on user_id; no global ordering exists
    anywhere (per-user ordering only).
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    boundary = (
        F.when(
            F.col("ts") - F.lag("ts").over(w) > gap_secs * NS, 1
        ).otherwise(0)
    )
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sessions = events.select(
        "user_id", "ts", "event_id",
        F.expr(_CENTS).alias("cents"),
    ).withColumn("session_idx", F.sum(boundary).over(wcum))
    return (
        sessions.groupBy("user_id", "session_idx")
        .agg(
            # microseconds: DuckDB truncates TIMESTAMP_NS parquet to us,
            # so us is the finest cross-engine-stable grain
            F.expr("min(ts) div 1000").alias("session_start_us"),
            F.expr("max(ts) div 1000").alias("session_end_us"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("sum_cents"),
        )
    )


def json_kv_stats(events: DataFrame) -> DataFrame:
    """JSON extraction from the ``props`` column: per event_type stats of
    the ``$.k`` field (get_json_object stays JVM-side)."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("k").alias("n_distinct_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def daily_active_users(events: DataFrame) -> DataFrame:
    """DAU: day index since epoch -> distinct users + event count."""
    day = F.expr("ts div 86400000000000")
    return (
        events.select(day.alias("day_idx"), "user_id")
        .groupBy("day_idx")
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def daily_active_users_approx(events: DataFrame,
                              rsd: float = 0.02) -> DataFrame:
    """Sketch-based DAU: ``approx_count_distinct`` (HyperLogLog++) instead
    of exact COUNT(DISTINCT).

    The scale path: exact distinct-count shuffles every (day, user) pair;
    the HLL sketch is a fixed-size per-partition accumulator merged on one
    row per day — at 100 TB the difference between a terabyte-scale
    shuffle and kilobytes.  Approximate by construction, so it is NOT
    oracle-hash-checked; tests bound its relative error against the exact
    operator instead (tests/test_events_approx.py).
    """
    day = F.expr("ts div 86400000000000")
    return (
        events.select(day.alias("day_idx"), "user_id")
        .groupBy("day_idx")
        .agg(
            F.approx_count_distinct("user_id", rsd).alias("n_users_approx"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def heavy_hitter_users(events: DataFrame,
                       min_share: float = 0.001) -> DataFrame:
    """EXACT heavy hitters with sketch-bounded memory: users contributing
    at least ``min_share`` of all events.

    Two passes, the classic scalable shape:
    1. candidate generation with ``freqItems`` (Karp et al. streaming
       frequent-items — per-partition bounded counters merged once; may
       contain false positives, never false negatives);
    2. one exact count over ONLY the candidate set (broadcast ``isin``
       filter), so the verification groupBy touches a bounded key set.

    At 100 TB the naive exact plan shuffles every (user_id) pair-count;
    this shuffles only events whose user survived the sketch — for a
    0.1% threshold that is <= 2000 distinct keys by construction.
    Approximate machinery but exact output, so tests compare it to the
    naive plan directly (tests/test_events_approx.py).

    No-false-negative guarantee: ``freqItems`` only promises items with
    frequency STRICTLY greater than ``support * n``, so the sketch runs
    at support = ``min_share / 2`` — every user with count >=
    ceil(min_share * n) then has count > (min_share/2) * n and must
    appear among the candidates.  Spark caps support at >= 1e-4, so
    ``min_share`` below 2e-4 cannot keep the guarantee and raises.
    """
    import math

    if min_share < 2e-4:
        raise ValueError(
            "min_share < 2e-4 cannot guarantee exactness: freqItems "
            "support is floored at 1e-4 and the sketch must run at "
            "min_share / 2 to avoid boundary false negatives")
    total = events.count()
    threshold = math.ceil(total * min_share)
    cands = events.select("user_id").freqItems(
        ["user_id"], min_share / 2).collect()[0][0]
    # NULL is a real group in the naive plan but `isin` drops it — keep
    # null user_ids explicitly so the two plans agree
    keep = F.col("user_id").isin(list(cands))
    if any(c is None for c in cands):
        keep = keep | F.col("user_id").isNull()
    return (
        events.filter(keep)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") >= threshold)
        .orderBy(F.desc("n_events"), F.asc("user_id"))
    )


def top_users_by_value(events: DataFrame, k: int = 3) -> DataFrame:
    """Per event_type: top-k users by total cents (row_number window,
    deterministic (sum desc, user_id) tiebreak)."""
    totals = (
        events.select("event_type", "user_id",
                      F.expr(_CENTS).alias("cents"))
        .groupBy("event_type", "user_id")
        .agg(F.sum("cents").alias("sum_cents"))
    )
    w = Window.partitionBy("event_type").orderBy(
        F.desc("sum_cents"), F.asc("user_id"))
    return (
        totals.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("event_type", "rank", "user_id", "sum_cents")
    )


def funnel_report(events: DataFrame,
                  steps: tuple[str, ...] = ("view", "click", "purchase"),
                  within_ns: int = 3_600_000_000_000) -> DataFrame:
    """Sequential conversion funnel: for each transition step[i] ->
    step[i+1], how many positions reached step[i] and how many found a
    step[i+1] event at-or-after them (same user) within ``within_ns``.

    Returns one row per transition: (step_idx, step_from, step_to,
    n_reached, n_converted, conversion_permille) — the rate as integer
    permille (``n*1000 DIV reached``), so the output is hash-exact.

    Each transition is the repo's own as-of join (operators/asof.py,
    direction="forward", tolerance) — union + ONE window per step, no
    join in the matching path, shuffled on ``user_id``.  Funnel stages
    count DISTINCT (user, reached-ts) positions: both sides of every
    transition are deduped, so two step-i events matching the SAME
    step-(i+1) event advance one position, not two (and the nearest
    match is unambiguous — the as-of contract wants a unique right side
    per (key, ts)).  A k-step funnel is k-1 windows over the same
    shuffle key; at 100 TB pass ``bucket_width`` through if one user
    dominates the stream (see asof_join's hot-key hatch).
    """
    if len(steps) < 2:
        raise ValueError("funnel needs at least two steps")
    if within_ns <= 0:
        raise ValueError(f"within_ns must be positive, got {within_ns!r}")
    from ..operators.asof import asof_join

    def positions(step: str) -> DataFrame:
        return (
            events.filter(F.col("event_type") == step)
            .select("user_id", "ts").distinct()
        )

    cur = positions(steps[0])
    rows = []
    for i in range(len(steps) - 1):
        nxt = positions(steps[i + 1])
        m = asof_join(cur, nxt, on="ts", by="user_id",
                      direction="forward", tolerance=within_ns)
        rows.append(
            m.agg(
                F.count(F.lit(1)).cast("long").alias("n_reached"),
                F.count("ts_asof").cast("long").alias("n_converted"),
            ).select(
                F.lit(i).cast("long").alias("step_idx"),
                F.lit(steps[i]).alias("step_from"),
                F.lit(steps[i + 1]).alias("step_to"),
                "n_reached", "n_converted",
                # integer DIV on both engines (Spark `div`, DuckDB `//`)
                # — float division + cast would round in DuckDB but
                # truncate in Spark
                F.expr("n_converted * 1000 div greatest(n_reached, 1)")
                .cast("long").alias("conversion_permille"),
            )
        )
        cur = (
            m.filter(F.col("ts_asof").isNotNull())
            .select("user_id", F.col("ts_asof").alias("ts"))
            .distinct()
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def type_daily_rollup(events: DataFrame) -> DataFrame:
    """Multi-dimensional OLAP rollup: event counts + cent totals at
    (event_type, day), (event_type) and grand-total grain in ONE pass —
    Spark's ``rollup`` plans a single Expand + aggregation, not three
    scans (the shape a reporting layer wants at 100 TB: every grain
    map-side combined in the same shuffle).

    ``grain`` is the standard SQL GROUPING bitmask (0 = leaf row,
    1 = per-type subtotal, 3 = grand total) so consumers — and the
    DuckDB oracle — can tell a subtotal's NULL from a genuine NULL key.
    """
    day = F.expr("ts div 86400000000000")
    return (
        events.select("event_type", day.alias("day_idx"),
                      F.expr(_CENTS).alias("cents"))
        .rollup("event_type", "day_idx")
        .agg(
            F.grouping_id().cast("long").alias("grain"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .select("event_type", "day_idx", "grain", "n_events", "sum_cents")
    )


def type_daily_cube(events: DataFrame) -> DataFrame:
    """CUBE twin of ``type_daily_rollup``: all four grains — (type, day),
    (type), (day), () — in one Expand+aggregate pass.  The extra
    day-only grain (grain bitmask 2) is what rollup cannot produce; same
    GROUPING/int-cents discipline.
    """
    day = F.expr("ts div 86400000000000")
    return (
        events.select("event_type", day.alias("day_idx"),
                      F.expr(_CENTS).alias("cents"))
        .cube("event_type", "day_idx")
        .agg(
            F.grouping_id().cast("long").alias("grain"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .select("event_type", "day_idx", "grain", "n_events", "sum_cents")
    )


def interval_overlap_report(events: DataFrame) -> DataFrame:
    """Which users' daily activity window overlapped which event type's
    daily activity window — the interval-vs-interval join shape
    (sessions x outages, visits x campaigns) exercised end-to-end on the
    events stream via :func:`operators.asof.interval_join`.

    Both sides derive from one grouped pass over events (user x day and
    type x day activity spans, half-open us intervals); the join itself
    is the bucket-exploded equi-join — day-long spans cover MANY shared
    buckets, so this entry's driver hash also pins the claim-once
    (ownership-bucket) dedup: a duplicate pair would break rows+hash.

    Scale: |user-days| + |type-days| exploded rows, never the product;
    everything integer (us grain — the finest cross-engine-stable grain,
    see sessionize).
    """
    from ..operators.asof import interval_join

    us = F.expr("ts div 1000")
    day = F.expr("(ts div 1000000000) div 86400")
    user_iv = (
        events.select("user_id", us.alias("us"), day.alias("day"))
        .groupBy("user_id", "day")
        .agg(F.min("us").alias("user_start_us"),
             (F.max("us") + 1).alias("user_end_us"))
    )
    type_iv = (
        events.select("event_type", us.alias("us"), day.alias("day"))
        .groupBy("event_type", "day")
        .agg(F.min("us").alias("type_start_us"),
             (F.max("us") + 1).alias("type_end_us"))
    )
    # bucket_width = one day in us: both sides' intervals are DAY-BOUNDED
    # by construction (grouped on the same ``day`` the join keys on), so
    # a day-wide bucket gives an explosion factor of exactly 1 — each
    # interval covers its own day's bucket and nothing else.  This also
    # skips interval_join's auto-sizing pass (two approx_percentile
    # driver jobs that each re-ran the grouped-events subtree — opt
    # guide §2 bin-width audit / §5 driver work in the query path).
    # Any width yields identical rows (the exact overlap predicate +
    # claim-once filter run post-join); the width only moves cost.
    return interval_join(
        user_iv, type_iv,
        "user_start_us", "user_end_us", "type_start_us", "type_end_us",
        by="day", bucket_width=86_400_000_000,
    ).select("user_id", "day", "event_type",
             "user_start_us", "user_end_us",
             "type_start_us", "type_end_us")


def user_activity_stats(events: DataFrame) -> DataFrame:
    """Per-event window-function analytics over the user's own timeline —
    the lag/lead/rolling family (reference has no window functions at
    all, SURVEY.md §2.5; this is the idiomatic-Spark breadth row):

    - ``prev_gap_sec`` / ``next_gap_sec``: whole seconds since/until the
      user's adjacent event (``lag``/``lead``; NULL at the edges),
    - ``running_cents``: the user's lifetime running spend,
    - ``mov3_cents``: integer mean over the trailing 3-row frame
      (``sum DIV count`` so partial frames at the start stay exact),
    - ``day_rank``: the event's rank within (user, epoch-day) by cents
      descending, event_id as the total tiebreak.

    Scale shape: every frame partitions by ``user_id`` — ONE hash
    exchange on user_id serves all four user-timeline windows, and the
    (user_id, day) rank window reuses it (HashPartitioning(user_id)
    satisfies ClusteredDistribution(user_id, day); only a sort is
    added).  No global window exists anywhere.  All arithmetic is
    integer nanoseconds / cents, so rows hash-compare exactly against
    the DuckDB oracle.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wmov = w.rowsBetween(-2, Window.currentRow)
    wday = Window.partitionBy("user_id", "day").orderBy(
        F.desc("cents"), F.asc("event_id"))
    base = events.select(
        "event_id", "user_id", "ts",
        F.expr("(ts div 1000000000) div 86400").alias("day"),
        F.expr(_CENTS).alias("cents"),
    )
    staged = base.select(
        "event_id", "user_id", "day", "cents",
        F.expr("(ts - lag(ts) OVER (PARTITION BY user_id "
               "ORDER BY ts, event_id)) div 1000000000")
        .cast("long").alias("prev_gap_sec"),
        F.expr("(lead(ts) OVER (PARTITION BY user_id "
               "ORDER BY ts, event_id) - ts) div 1000000000")
        .cast("long").alias("next_gap_sec"),
        F.sum("cents").over(wcum).cast("long").alias("running_cents"),
        F.sum("cents").over(wmov).alias("msum"),
        F.count(F.lit(1)).over(wmov).alias("mcnt"),
        F.row_number().over(wday).cast("long").alias("day_rank"),
    )
    return staged.select(
        "event_id", "user_id", "day", "cents", "prev_gap_sec",
        "next_gap_sec", "running_cents",
        F.expr("msum div mcnt").cast("long").alias("mov3_cents"),
        "day_rank",
    )
