"""As-of joins and range (interval) joins — two join shapes Spark's
optimizer has no native operator for, built as compositions of existing
DataFrame ops (the brief's preferred route: composition over UDFs).

Neither the reference nor vanilla Spark SQL expresses these directly; a
naive translation is a non-equi join, which Catalyst plans as
BroadcastNestedLoopJoin / CartesianProduct — O(|L|·|R|) and the classic
100 TB query killer.  Both operators here stay strictly equi-join /
window shaped:

- :func:`asof_join` — "for every left row, the latest right row at or
  before it (per key)" — is ONE union + ONE window over (key, time):
  right rows interleave into the left timeline and a running
  ``last(value, ignorenulls=True)`` carries the most recent right values
  forward.  One shuffle, linear work, no join at all.  For a hot key,
  ``bucket_width`` re-partitions the window by (key, time-bucket) and
  chains buckets through a tiny per-bucket carry table — same answer,
  n-buckets-way parallelism.
- :func:`range_join` — "points against intervals" — buckets time into
  fixed-width bins, explodes each interval over the bins it covers, and
  equi-joins points to intervals on (key, bin), post-filtering to the
  exact range.  Work is |points| + |intervals|·(interval/bucket_width)
  + true matches — never the cross product.

Both operate on integer time domains (this repo's epoch-nanos
convention, sources/tpch_adapter.normalize_events_ts); any ordered
NON-NEGATIVE integer works (epoch seconds, versions, sequence numbers).
Bucketing uses integer ``DIV``, which truncates toward zero — negative
time values would bucket incorrectly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BKT = "_asof_bkt"
_CARRY = "_asof_carry_"


def _as_list(x: str | Sequence[str]) -> list[str]:
    return [x] if isinstance(x, str) else list(x)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: str | Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    suffix: str = "_asof",
    bucket_width: int | None = None,
) -> DataFrame:
    """Left as-of join: every ``left`` row gains the ``value_cols`` of
    the nearest ``right`` row per ``by`` key — at-or-before ``on``
    (``direction="backward"``, the trades-to-quotes default) or at-or-
    after (``"forward"``).  Unmatched left rows keep nulls, like a left
    outer join.  Matched right columns come back as ``<col><suffix>``,
    plus ``<on><suffix>`` = the matched right timestamp.

    ``tolerance`` (same units as ``on``) nulls matches farther than the
    bound — ``|on_left - on_right| <= tolerance`` — without dropping the
    left row.

    Right rows with a null ``on`` are dropped up front: a null timestamp
    can never satisfy the as-of inequality (pandas ``merge_asof`` /
    DuckDB ``ASOF JOIN`` parity); left rows with a null ``on`` are kept
    and never match.

    Scale notes: implemented as a union + ONE window (running
    ``last/first ignorenulls`` over (by, on)) — a single shuffle on the
    ``by`` key, linear per partition, never a join.  Rows with equal
    ``on`` on opposite sides match inclusively (right sorts first going
    backward, last going forward).  RIGHT rows should be unique per
    (by, on): among right duplicates at the exact same instant the
    winner is tie-ambiguous — pre-aggregate (as the driver's
    events_asof_join entry does) when the source can collide.

    HOT-KEY ESCAPE HATCH: with the default ``bucket_width=None`` a
    single hot ``by`` key serializes into one partition's sort.  Pass
    ``bucket_width`` (same units as ``on``) to partition the window by
    (by, ``on DIV bucket_width``) instead — the hot key's timeline
    spreads over its time buckets, one task each.  Cross-bucket carry
    (a left row early in a bucket whose match lives in an earlier
    bucket) goes through a per-(key, bucket) summary table — one
    aggregated row per non-empty bucket, so its own window is over
    #buckets rows, not the data — joined back and coalesced in.  Same
    answer as the flat path (differential-tested), two extra small
    exchanges.  Null ``by`` keys group together (window semantics) on
    both paths; the carry join is null-safe to preserve that.

    Cited parity target: pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    semantics (tests differential against DuckDB).
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, "
                         f"got {direction!r}")
    if bucket_width is not None and int(bucket_width) <= 0:
        raise ValueError(
            f"bucket_width must be a positive integer, got {bucket_width!r}")
    by = _as_list(by)
    if direction == "nearest":
        # pandas merge_asof parity: closest match on either side,
        # backward ("prior") wins exact-distance ties.  Composed from
        # the two directed passes — forward runs over the backward
        # output, then a per-column closest-wins coalesce; costs two
        # windows instead of one, same shuffle key.
        if value_cols is None:
            value_cols = [c for c in right.columns
                          if c not in set(by) | {on}]
        vout = {v: v + suffix for v in value_cols}
        r_on_out = on + suffix
        clash = (set(vout.values()) | {r_on_out}) & set(left.columns)
        if clash:
            raise ValueError(
                f"left columns {sorted(clash)} collide with as-of output "
                f"names; pass a different suffix")
        b = asof_join(left, right, on=on, by=by, value_cols=value_cols,
                      direction="backward", tolerance=tolerance,
                      suffix="__asof_bwd", bucket_width=bucket_width)
        f = asof_join(b, right, on=on, by=by, value_cols=value_cols,
                      direction="forward", tolerance=tolerance,
                      suffix="__asof_fwd", bucket_width=bucket_width)
        ts_b = F.col(on + "__asof_bwd")
        ts_f = F.col(on + "__asof_fwd")
        prefer_b = ts_b.isNotNull() & (
            ts_f.isNull()
            | ((F.col(on) - ts_b) <= (ts_f - F.col(on))))
        return f.select(
            *left.columns,
            *[F.when(prefer_b, F.col(v + "__asof_bwd"))
              .otherwise(F.col(v + "__asof_fwd")).alias(vout[v])
              for v in value_cols],
            F.when(prefer_b, ts_b).otherwise(ts_f).alias(r_on_out),
        )
    key_set = set(by) | {on}
    for c in key_set:
        if c not in right.columns:
            raise ValueError(f"right side lacks join column {c!r}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in key_set]
    vout = {v: v + suffix for v in value_cols}
    r_on_out = on + suffix
    lcols = left.columns
    clash = (set(vout.values()) | {r_on_out, "_side", _BKT}) & set(lcols)
    if clash:
        raise ValueError(
            f"left columns {sorted(clash)} collide with as-of output "
            f"names; pass a different suffix")

    # A null right timestamp never satisfies the inequality — drop such
    # rows before they can leak value columns into the running fill.
    right = right.filter(F.col(on).isNotNull())

    l_part = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(vout[v])
          for v in value_cols],
        F.lit(None).cast(left.schema[on].dataType).alias(r_on_out),
    )
    r_part = right.select(
        *[
            F.col(c) if c in key_set
            else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        *[F.col(v).alias(vout[v]) for v in value_cols],
        F.col(on).alias(r_on_out),
    )
    u = l_part.unionByName(r_part)

    fill_cols = [vout[v] for v in value_cols] + [r_on_out]
    backward = direction == "backward"

    if bucket_width is None:
        out = _windowed_fill(u, lcols, on, list(by), fill_cols, backward)
    else:
        out = _bucketed_fill(u, r_part, lcols, on, by, fill_cols,
                             backward, int(bucket_width))

    if tolerance is not None:
        delta = (F.col(on) - F.col(r_on_out) if backward
                 else F.col(r_on_out) - F.col(on))
        keep = F.col(r_on_out).isNotNull() & (delta <= F.lit(tolerance))
        out = out.select(
            *lcols,
            *[F.when(keep, F.col(c)).alias(c) for c in fill_cols],
        )
    return out


def _windowed_fill(u: DataFrame, keep: Sequence[str], on: str,
                   part_keys: Sequence[str],
                   fill_cols: Sequence[str], backward: bool) -> DataFrame:
    """The core running-fill: one window over ``part_keys`` ordered by
    (``on``, ``_side``), carrying the last/first non-null of each fill
    column onto every left row.  ``keep`` = pass-through columns (the
    bucketed path keeps its bucket key for the downstream carry join)."""
    if backward:
        # right (_side=0) before left at equal ts -> inclusive <=
        w = (Window.partitionBy(*part_keys)
             .orderBy(F.col(on).asc_nulls_first(), F.col("_side").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        filled = [F.last(c, ignorenulls=True).over(w).alias(c)
                  for c in fill_cols]
    else:
        # left before right at equal ts -> inclusive >=
        w = (Window.partitionBy(*part_keys)
             .orderBy(F.col(on).asc_nulls_last(), F.col("_side").desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        filled = [F.first(c, ignorenulls=True).over(w).alias(c)
                  for c in fill_cols]
    return (u.select(*keep, "_side", *filled)
            .filter(F.col("_side") == 1).drop("_side"))


def _bucketed_fill(u: DataFrame, r_part: DataFrame, lcols: Sequence[str],
                   on: str, by: Sequence[str], fill_cols: Sequence[str],
                   backward: bool, width: int) -> DataFrame:
    """Skew-spreading variant: window per (by, time-bucket), chaining
    buckets through a per-bucket carry summary.

    Per column the flat path carries the last (first, going forward)
    NON-NULL value independently; the summary aggregate reproduces that
    with ``max_by(col, CASE WHEN col IS NOT NULL THEN on END)`` per
    bucket, and the cross-bucket window composes it — so
    coalesce(in-bucket fill, carry-in) equals the flat answer column by
    column (differential-tested in tests/test_asof.py)."""
    bkt = F.expr(f"`{on}` DIV {width}")
    ub = u.withColumn(_BKT, bkt)

    # In-bucket running fill: partitions are (key x bucket) — the hot
    # key's rows spread over its buckets.
    in_bucket = _windowed_fill(ub, [*lcols, _BKT], on, [*by, _BKT],
                               fill_cols, backward)

    # Per-(key, bucket) summary of the RIGHT side: one aggregated row
    # per non-empty bucket (map-side partial agg, no window).
    pick = F.max_by if backward else F.min_by
    summary = (
        r_part.withColumn(_BKT, bkt)
        .groupBy(*by, _BKT)
        .agg(*[
            pick(F.col(c),
                 F.when(F.col(c).isNotNull(), F.col(on))).alias(c)
            for c in fill_cols
        ])
    )

    # Carry-in per bucket actually present in the data: the running
    # last/first summary over STRICTLY earlier/later buckets.  This
    # table has one row per distinct (key, bucket) — tiny relative to
    # the data — so its single-partition-per-key window is cheap even
    # for the hot key.
    allb = ub.select(*by, _BKT).distinct()
    carry_src = allb.join(summary, [*by, _BKT], "left")
    if backward:
        wc = (Window.partitionBy(*by)
              .orderBy(F.col(_BKT).asc_nulls_first())
              .rowsBetween(Window.unboundedPreceding, -1))
        carried = [F.last(c, ignorenulls=True).over(wc).alias(_CARRY + c)
                   for c in fill_cols]
    else:
        wc = (Window.partitionBy(*by)
              .orderBy(F.col(_BKT).asc_nulls_last())
              .rowsBetween(1, Window.unboundedFollowing))
        carried = [F.first(c, ignorenulls=True).over(wc).alias(_CARRY + c)
                   for c in fill_cols]
    carry = carry_src.select(
        *[F.col(c).alias(_CARRY + c) for c in (*by, _BKT)], *carried)

    # Null-safe join keeps null-key / null-ts groups behaving exactly
    # like the flat window (nulls group together).  AQE broadcasts the
    # small carry side.
    cond = None
    for c in (*by, _BKT):
        t = F.col(c).eqNullSafe(F.col(_CARRY + c))
        cond = t if cond is None else (cond & t)
    return (
        in_bucket.join(carry, cond, "left")
        .select(
            *lcols,
            *[F.coalesce(F.col(c), F.col(_CARRY + c)).alias(c)
              for c in fill_cols],
        )
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_on: str,
    start_col: str,
    end_col: str,
    by: str | Sequence[str] = (),
    bucket_width: int | None = None,
) -> DataFrame:
    """Inner join of point rows to every interval row containing them:
    ``start <= point < end`` (half-open), optionally also matching on
    ``by`` key columns (same names on both sides).  Output carries all
    columns of both inputs (disambiguate/rename upstream).

    Scale notes: Catalyst plans a raw range predicate as a nested-loop
    join.  Here each interval EXPLODES over the fixed-width time buckets
    it covers and points equi-join on (by, bucket) — a plain shuffled
    hash join — then the exact predicate filters within the bucket.
    Each point lives in exactly one bucket, so no dedup pass is needed.
    Cost is |points| + |intervals| * (len/width + 1) exploded rows +
    matches.  Degenerate (``end <= start``) intervals are dropped, which
    also keeps the bucket sequence well-formed.  NON-NEGATIVE integer
    time domain (epoch nanos here): bucketing uses integer ``DIV`` —
    double-precision division would corrupt epoch-nanos values above
    2^53.

    ``bucket_width=None`` (default) AUTO-SIZES the width to the median
    interval length — one cheap ``approx_percentile`` aggregate over the
    intervals side (the smaller side by construction).  At the median,
    a typical interval explodes over ~2 buckets, bounding the blow-up
    factor near 2 regardless of the time unit in play; pass an explicit
    width only to tune the points-per-bucket / explosion trade.  An
    explicit width must be a positive integer (``ValueError`` otherwise
    — 0 would die at execution time as an opaque sequence error and a
    negative width silently yields wrong bucket ranges).
    """
    by = _as_list(by)
    if "_bucket" in points.columns or "_bucket" in intervals.columns:
        raise ValueError("inputs must not carry a _bucket column")
    overlap = (set(points.columns) - set(by)) & (
        set(intervals.columns) - set(by))
    if overlap:
        raise ValueError(
            f"non-key columns {sorted(overlap)} exist on both sides; "
            "rename before range_join (output carries all columns)")
    if bucket_width is not None and int(bucket_width) <= 0:
        raise ValueError(
            f"bucket_width must be a positive integer, got {bucket_width!r}")
    live = intervals.filter(F.col(end_col) > F.col(start_col))
    if bucket_width is None:
        med = live.select(
            F.percentile_approx(
                F.col(end_col) - F.col(start_col), F.lit(0.5)
            ).alias("w")
        ).first()["w"]
        # No valid intervals -> the join is empty whatever the width.
        wlit = max(int(med), 1) if med is not None else 1
    else:
        wlit = int(bucket_width)
    pb = points.withColumn(
        "_bucket", F.expr(f"`{point_on}` DIV {wlit}"))
    ib = live.withColumn(
        "_bucket",
        F.explode(F.sequence(
            F.expr(f"`{start_col}` DIV {wlit}"),
            F.expr(f"(`{end_col}` - 1) DIV {wlit}"))),
    )
    return (
        pb.join(ib, [*by, "_bucket"])
        .filter((F.col(point_on) >= F.col(start_col))
                & (F.col(point_on) < F.col(end_col)))
        .drop("_bucket")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    by: str | Sequence[str] = (),
    bucket_width: int | None = None,
) -> DataFrame:
    """Inner join of interval rows to every OVERLAPPING interval row:
    ``left_start < right_end AND right_start < left_end`` (half-open on
    both sides), optionally also matching on ``by`` key columns (same
    names on both sides).  Output carries all columns of both inputs
    (disambiguate/rename upstream).  The interval-vs-interval sibling of
    :func:`range_join` (sessions x outages, visits x campaigns, reads x
    compactions ...).

    Scale notes: the raw overlap predicate is a non-equi join (nested
    loop under Catalyst).  Here BOTH sides explode over the fixed-width
    time buckets they cover and equi-join on (by, bucket).  A pair
    overlapping across several shared buckets would duplicate, so each
    pair is claimed by exactly ONE bucket — the one containing
    ``greatest(left_start, right_start)``: the later start lies inside
    both intervals whenever they overlap, so that bucket is always among
    the shared ones, and a post-join filter keeps the pair only there
    (no distinct / dedup shuffle).  Cost is
    sum(|side| * (len/width + 1)) exploded rows + bucket collisions —
    never the cross product.  Degenerate (``end <= start``) rows are
    dropped on both sides.

    ``bucket_width=None`` auto-sizes to the LARGER side-median interval
    length (one ``approx_percentile`` over each side), bounding the
    median explosion factor near 2 on both sides.  Integer ``DIV``
    bucketing — same non-negative-integer time domain as range_join.
    """
    by = _as_list(by)
    for df, side in ((left, "left"), (right, "right")):
        if "_bucket" in df.columns:
            raise ValueError(f"{side} input must not carry _bucket")
    overlap = (set(left.columns) - set(by)) & (set(right.columns) - set(by))
    if overlap:
        raise ValueError(
            f"non-key columns {sorted(overlap)} exist on both sides; "
            "rename before interval_join (output carries all columns)")
    if bucket_width is not None and int(bucket_width) <= 0:
        raise ValueError(
            f"bucket_width must be a positive integer, got {bucket_width!r}")
    l_live = left.filter(F.col(left_end) > F.col(left_start))
    r_live = right.filter(F.col(right_end) > F.col(right_start))
    if bucket_width is None:
        meds = [
            df.select(F.percentile_approx(
                F.col(e) - F.col(s), F.lit(0.5)).alias("w")).first()["w"]
            for df, s, e in ((l_live, left_start, left_end),
                             (r_live, right_start, right_end))
        ]
        meds = [m for m in meds if m is not None]
        wlit = max([int(m) for m in meds] + [1])
    else:
        wlit = int(bucket_width)

    def _explode(df: DataFrame, s: str, e: str) -> DataFrame:
        return df.withColumn(
            "_bucket",
            F.explode(F.sequence(
                F.expr(f"`{s}` DIV {wlit}"),
                F.expr(f"(`{e}` - 1) DIV {wlit}"))),
        )

    lb = _explode(l_live, left_start, left_end)
    rb = _explode(r_live, right_start, right_end)
    owner = F.greatest(F.col(left_start), F.col(right_start))
    return (
        lb.join(rb, [*by, "_bucket"])
        .filter((F.col(left_start) < F.col(right_end))
                & (F.col(right_start) < F.col(left_end))
                & (F.col("_bucket") * F.lit(wlit)
                   == owner - (owner % F.lit(wlit)))
        )
        .drop("_bucket")
    )
