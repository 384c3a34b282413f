"""Z-order (Morton) clustered writes — multi-column data skipping for
parquet sinks.

Parquet scans prune files and row groups by min/max statistics; those
stats only help when the layout CLUSTERS similar values together.  A
sort by (a, b) gives perfect skipping on ``a`` and almost none on ``b``;
interleaving the BITS of both keys (the Morton / Z-order curve) gives
every interleaved column locality, so point/range filters on ANY of the
z-columns touch a small fraction of files — the same technique behind
Delta/Iceberg ``OPTIMIZE ZORDER BY``, built here from plain Column
expressions.

Shape: one cheap bounds aggregate (min/max per z-column, a single job),
then a range repartition + in-partition sort on the interleaved key and
a plain parquet write.  Everything is integer arithmetic, JVM-side; no
UDFs; the z-key is dropped before writing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# bits per column in the interleaved key; k columns use k*BITS key bits
DEFAULT_BITS = 10


def _quantize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) by linear min/max scaling —
    pure double arithmetic + floor, monotone, ties harmless (the z-key
    orders the LAYOUT; query results never touch it)."""
    span = F.when(hi > lo, (hi - lo).cast("double")).otherwise(F.lit(1.0))
    frac = (col.cast("double") - lo.cast("double")) / span
    q = F.floor(frac * F.lit(float((1 << bits) - 1)))
    return F.greatest(F.lit(0).cast("long"),
                      F.least(q.cast("long"),
                              F.lit((1 << bits) - 1).cast("long")))


def zorder_key(quantized: list[Column], bits: int = DEFAULT_BITS) -> Column:
    """Interleave the low ``bits`` bits of each quantized column:
    output bit (b*k + i) = bit b of column i."""
    k = len(quantized)
    z = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1).cast("long"))
            z = z + F.shiftleft(bit, b * k + i)
    return z


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   bits: int = DEFAULT_BITS,
                   target_files: int = 32) -> dict:
    """Write ``df`` to parquet clustered on the Z-order curve of
    ``cols`` (numeric).  Returns the bounds used, for the caller's log.

    ``repartitionByRange`` on the z-key splits the curve into
    ``target_files`` contiguous segments (one output file each, balanced
    by Spark's range sampler); ``sortWithinPartitions`` tightens each
    file's per-column min/max so row-group stats prune too.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    if bits * len(cols) > 62:
        raise ValueError(f"bits * len(cols) must fit a long, got "
                         f"{bits} * {len(cols)}")
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).first()
    qs = [
        _quantize(F.col(c),
                  F.lit(bounds[f"_lo_{c}"]), F.lit(bounds[f"_hi_{c}"]),
                  bits)
        for c in cols
    ]
    (
        df.withColumn("_zkey", zorder_key(qs, bits))
        .repartitionByRange(target_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite").parquet(path)
    )
    return {"cols": list(cols), "bits": bits,
            "bounds": {c: (bounds[f"_lo_{c}"], bounds[f"_hi_{c}"])
                       for c in cols}}
