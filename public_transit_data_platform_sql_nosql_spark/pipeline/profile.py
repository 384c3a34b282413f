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


def join_key_profile(left: DataFrame, right: DataFrame,
                     keys: list[str] | str,
                     top_n: int = 20) -> DataFrame:
    """Pre-flight profile of an equi-join: per-key row counts on each
    side and the pair count that key would emit — run BEFORE a 100-TB
    join to catch skewed keys and output explosions while they are still
    a cheap aggregate, not a hung stage.  Returns the ``top_n`` keys by
    ``pair_rows`` (ties broken by key ASC so the limit boundary is
    total-ordered): the hot keys are exactly the ones to route through
    operators/skew.salted_join or to pre-aggregate away.

    Scale shape: one map-side-combinable groupBy per side — each count
    table is |distinct keys| rows, never the data — then ONE hash
    full-outer join of the two count tables (null-safe on the keys, so
    null join keys profile like any other value even though an inner
    equi-join would drop them — the profile must SHOW them) and a
    TakeOrdered top-n.  Exact, not a sketch: the count tables are
    already the small side of the problem.
    """
    if isinstance(keys, str):
        keys = [keys]
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("left_rows"))
    rc = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("right_rows"))
    cond = [lc[k].eqNullSafe(rc[k]) for k in keys]
    joined = lc.join(rc, cond, "full_outer").select(
        *[F.coalesce(lc[k], rc[k]).alias(k) for k in keys],
        F.coalesce("left_rows", F.lit(0)).alias("left_rows"),
        F.coalesce("right_rows", F.lit(0)).alias("right_rows"),
    ).withColumn(
        "pair_rows", F.col("left_rows") * F.col("right_rows"))
    return joined.orderBy(
        F.desc("pair_rows"),
        *[F.asc(F.coalesce(F.col(k).cast("string"), F.lit(""))) for k in
          keys],
    ).limit(top_n)


def join_key_profile_summary(left: DataFrame, right: DataFrame,
                             keys: list[str] | str) -> DataFrame:
    """One-row companion to :func:`join_key_profile`: the estimated
    inner-join output size (``sum(l*r)`` — exact for an equi-join), the
    number of matching keys, and the hottest single key's share of the
    output in permille (integer, cross-engine exact).  A share near
    1000 means one key dominates the join — salt it."""
    if isinstance(keys, str):
        keys = [keys]
    lc = left.groupBy(*keys).agg(F.count(F.lit(1)).alias("l"))
    rc = right.groupBy(*keys).agg(F.count(F.lit(1)).alias("r"))
    pairs = lc.join(rc, keys).select(
        (F.col("l") * F.col("r")).alias("p"))
    return pairs.agg(
        F.coalesce(F.sum("p"), F.lit(0)).cast("long")
        .alias("est_output_rows"),
        F.count(F.lit(1)).alias("n_matching_keys"),
        F.coalesce(
            F.expr("max(p) * 1000 div greatest(sum(p), 1)"), F.lit(0)
        ).cast("long").alias("hottest_key_permille"),
    )
