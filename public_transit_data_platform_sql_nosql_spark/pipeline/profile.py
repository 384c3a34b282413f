"""One-pass table profiling: per-column row/null/distinct counts and
min/max — the stats pass a 100 TB pipeline runs before planning a
backfill (partition sizing, skew discovery, quality monitoring).

``table_profile`` is EXACT (count-distinct per column) and DuckDB
oracle-checked; ``approx_profile`` swaps the distinct counts for HLL++
sketches (``approx_count_distinct``) — the scale path, where the exact
variant's per-column distinct aggregation would shuffle every value and
the sketch keeps the whole profile a single map-side-combinable pass of
fixed memory.  Both profile every requested column in ONE aggregation
over ONE scan (the per-column stats are parallel aggregate expressions,
then the single result row unpivots via ``stack``), so profiling never
multiplies reads of the table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _profile(df: DataFrame, columns: list[str] | None,
             distinct_expr) -> DataFrame:
    cols = columns if columns is not None else df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            distinct_expr(c).alias(f"{c}__distinct"),
            F.min(F.col(c).cast("string")).alias(f"{c}__min"),
            F.max(F.col(c).cast("string")).alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', `{c}__rows`, `{c}__nulls`, `{c}__distinct`, "
        f"`{c}__min`, `{c}__max`" for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )


def table_profile(df: DataFrame,
                  columns: list[str] | None = None) -> DataFrame:
    """Exact profile: one row per column —
    ``(column, n_rows, n_nulls, n_distinct, min_value, max_value)``
    (min/max as strings so heterogeneous columns share one schema;
    string ordering is binary UTF-8 in both Spark and DuckDB, so the
    oracle matches byte-for-byte).  ``count(DISTINCT)`` per column is
    exact but shuffles; prefer ``approx_profile`` at scale.
    """
    return _profile(
        df, columns,
        lambda c: F.count_distinct(F.col(c)).cast("long"))


def approx_profile(df: DataFrame,
                   columns: list[str] | None = None,
                   rsd: float = 0.05) -> DataFrame:
    """Sketch profile: same shape as ``table_profile`` with
    ``n_distinct`` from HLL++ at relative standard deviation ``rsd`` —
    fixed memory per column, single pass, no distinct shuffle."""
    return _profile(
        df, columns,
        lambda c: F.approx_count_distinct(F.col(c), rsd).cast("long"))
