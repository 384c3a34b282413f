"""Size-gated broadcast hints.

``routes`` (~hundreds of rows) and ``stops`` (~10k) are true bounded
dimensions: they are safe to force-broadcast at any scale the feed can
reach, so query code hints them unconditionally with ``F.broadcast``.

``trips`` is NOT bounded: it grows with the fact table (~1:33 row ratio
vs stop_times — reference ``Poster_Report.md:12-15``).  At the
reference's validated scale a trips broadcast is ~10 MB and clearly
right; at 100x it is a multi-GB build on the driver, resident on every
executor — an OOM.  So the trips side of every fact join goes through
:func:`broadcast_if_small`, which hints ONLY when Catalyst's own
plan-time size estimate is under a threshold and otherwise leaves the
join strategy to Catalyst + AQE (which will pick a shuffle join, and can
still convert back to broadcast at runtime if the actual post-filter
size turns out small).

The gate is plan-time (`optimizedPlan().stats()`) — no job is run to
decide.  The threshold is read from the session conf
``spark.graft.broadcastDimThreshold`` (bytes) when set, else
:data:`DEFAULT_THRESHOLD_BYTES`; tests use the conf to exercise the
fallback regime without materializing gigabytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# 64 MiB: comfortably inside a normal executor/driver memory budget,
# ~6x Spark's default autoBroadcastJoinThreshold — "I know this
# dimension is join-profitable even if stats are conservative", while
# still refusing the multi-GB regime the 100x feed produces.
DEFAULT_THRESHOLD_BYTES = 64 * 1024 * 1024

THRESHOLD_CONF_KEY = "spark.graft.broadcastDimThreshold"


def estimated_plan_bytes(df: DataFrame) -> int | None:
    """Catalyst's plan-time size estimate for ``df``, in bytes.

    Derived from file sizes for scans (after column pruning / partition
    pruning) and propagated through projections and filters; exact for
    local relations.  Returns None when the estimate is unavailable
    (e.g. Spark Connect, where the JVM plan is not reachable) — callers
    must treat None as "unknown, do not force anything".
    """
    try:
        jstats = df._jdf.queryExecution().optimizedPlan().stats()
        return int(str(jstats.sizeInBytes()))
    except Exception:
        return None


def broadcast_if_small(df: DataFrame,
                       threshold_bytes: int | None = None) -> DataFrame:
    """Hint ``df`` for broadcast only if its estimated size is under the
    threshold; otherwise return it unhinted so Catalyst/AQE choose the
    join strategy from real sizes.  Unknown size == unhinted."""
    if threshold_bytes is None:
        threshold_bytes = DEFAULT_THRESHOLD_BYTES
        try:
            conf = df.sparkSession.conf.get(THRESHOLD_CONF_KEY, None)
            if conf is not None:
                threshold_bytes = int(conf)
        except Exception:
            pass
    size = estimated_plan_bytes(df)
    if size is not None and size <= threshold_bytes:
        return F.broadcast(df)
    return df
