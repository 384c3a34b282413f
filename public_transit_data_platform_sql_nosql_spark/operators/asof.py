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
  forward.  One shuffle, linear work, no join at all.
- :func:`range_join` — "points against intervals" — buckets time into
  fixed-width bins, explodes each interval over the bins it covers, and
  equi-joins points to intervals on (key, bin), post-filtering to the
  exact range.  Work is |points| + |intervals|·(interval/bucket_width)
  + true matches — never the cross product.

Both operate on integer time domains (this repo's epoch-nanos
convention, sources/tpch_adapter.normalize_events_ts); any ordered
integer works (epoch seconds, versions, sequence numbers).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


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

    Scale notes: implemented as a union + ONE window (running
    ``last/first ignorenulls`` over (by, on)) — a single shuffle on the
    ``by`` key, linear per partition, never a join.  Rows with equal
    ``on`` on opposite sides match inclusively (right sorts first going
    backward, last going forward).  RIGHT rows should be unique per
    (by, on): among right duplicates at the exact same instant the
    winner is tie-ambiguous — pre-aggregate (as the driver's
    events_asof_join entry does) when the source can collide.  A single
    hot ``by`` key serializes into one partition's sort — the usual
    salt-by-time-range trick applies if a key dominates.

    Cited parity target: pandas ``merge_asof`` / DuckDB ``ASOF JOIN``
    semantics (tests differential against DuckDB).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got "
                         f"{direction!r}")
    by = _as_list(by)
    key_set = set(by) | {on}
    for c in key_set:
        if c not in right.columns:
            raise ValueError(f"right side lacks join column {c!r}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in key_set]
    vout = {v: v + suffix for v in value_cols}
    r_on_out = on + suffix
    lcols = left.columns
    clash = (set(vout.values()) | {r_on_out, "_side"}) & set(lcols)
    if clash:
        raise ValueError(
            f"left columns {sorted(clash)} collide with as-of output "
            f"names; pass a different suffix")

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
    if direction == "backward":
        # right (_side=0) before left at equal ts -> inclusive <=
        w = (Window.partitionBy(*by)
             .orderBy(F.col(on).asc_nulls_first(), F.col("_side").asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        filled = [F.last(c, ignorenulls=True).over(w).alias(c)
                  for c in fill_cols]
    else:
        # left before right at equal ts -> inclusive >=
        w = (Window.partitionBy(*by)
             .orderBy(F.col(on).asc_nulls_last(), F.col("_side").desc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        filled = [F.first(c, ignorenulls=True).over(w).alias(c)
                  for c in fill_cols]

    out = (u.select(*lcols, "_side", *filled)
           .filter(F.col("_side") == 1).drop("_side"))
    if tolerance is not None:
        delta = (F.col(on) - F.col(r_on_out) if direction == "backward"
                 else F.col(r_on_out) - F.col(on))
        keep = F.col(r_on_out).isNotNull() & (delta <= F.lit(tolerance))
        out = out.select(
            *lcols,
            *[F.when(keep, F.col(c)).alias(c) for c in fill_cols],
        )
    return out


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_on: str,
    start_col: str,
    end_col: str,
    by: str | Sequence[str] = (),
    bucket_width: int = 3_600_000_000_000,
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
    Choose ``bucket_width`` on the order of the typical interval length:
    cost is |points| + |intervals| * (len/width + 1) exploded rows +
    matches.  Degenerate (``end <= start``) intervals are dropped, which
    also keeps the bucket sequence well-formed.  NON-NEGATIVE integer
    time domain (epoch nanos here; the default width is one hour in
    nanos): bucketing uses integer ``DIV`` — double-precision division
    would corrupt epoch-nanos values above 2^53.
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
    wlit = int(bucket_width)
    pb = points.withColumn(
        "_bucket", F.expr(f"`{point_on}` DIV {wlit}"))
    ib = (
        intervals.filter(F.col(end_col) > F.col(start_col))
        .withColumn(
            "_bucket",
            F.explode(F.sequence(
                F.expr(f"`{start_col}` DIV {wlit}"),
                F.expr(f"(`{end_col}` - 1) DIV {wlit}"))),
        )
    )
    return (
        pb.join(ib, [*by, "_bucket"])
        .filter((F.col(point_on) >= F.col(start_col))
                & (F.col(point_on) < F.col(end_col)))
        .drop("_bucket")
    )
