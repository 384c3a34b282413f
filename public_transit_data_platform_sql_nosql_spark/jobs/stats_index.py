"""File-level min/max data skipping for parquet sinks — the Delta/
Iceberg stats-manifest pattern next to jobs/layout.py's Z-order writes.

Z-order (and any clustered write) makes per-file value ranges TIGHT;
Spark still *opens* every file and prunes row groups from parquet
footers.  At 100 TB the footer reads alone are millions of S3 GETs per
query.  The fix every lakehouse format ships is a table-level stats
manifest: one small table of ``(file, min, max)`` per skipping column,
consulted BEFORE the scan so non-matching files never appear in the
read plan at all.

Here the manifest is a parquet sidecar under ``<path>/_file_stats``
(underscore-prefixed: Spark's default pathfilter ignores it on normal
reads of ``<path>``), built by ONE distributed pass grouped on
``input_file_name()`` — the same cost class as the write that produced
the files, paid once.  ``skipping_scan`` reads the manifest (tiny,
driver-side), keeps the files whose ``[min, max]`` intersects the
requested bounds, and hands Spark ONLY those paths plus the residual
row filter.

Skipping soundness: a range predicate ``col BETWEEN lo AND hi`` matches
no NULL row, so a file is skippable iff ``max < lo OR min > hi`` or the
file has no non-null value at all (min/max NULL) — exactly the test
``can_match`` below implements with null-safe logic.

Staleness is fail-safe by construction the same way Delta's is not
(Delta has a log; a bare sidecar does not): ``skipping_scan`` compares
the manifest's file list against the directory's CURRENT data files and
REFUSES to skip (falls back to a full filtered scan) when they differ —
an appended or compacted file can therefore never be silently dropped
from results; it can only cost the optimization until
``write_file_stats`` is re-run (compact.py and upsert.py rewrite whole
directories, so the mismatch check catches those too).
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATS_DIR = "_file_stats"


def _norm(name_col):
    """input_file_name() returns a URI (file:///...); the manifest keys
    on the basename, which is stable across URI scheme differences."""
    return F.element_at(F.split(name_col, "/"), -1)


def write_file_stats(spark: SparkSession, path: str,
                     cols: list[str]) -> int:
    """Build/replace the stats manifest for the parquet files under
    ``path``: one row per (file, column) with min/max/null counts.
    Returns the number of files profiled.

    ONE distributed scan projecting only ``cols`` (+ the virtual file
    name); the aggregate output is |files| x |cols| rows — driver-tiny.
    """
    df = spark.read.parquet(path)
    aggs = []
    for c in cols:
        aggs += [
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
            F.count(c).cast("long").alias(f"{c}__nnotnull"),
            F.count(F.lit(1)).cast("long").alias(f"{c}__nrows"),
        ]
    per_file = (
        df.select(*cols, _norm(F.input_file_name()).alias("file"))
        .groupBy("file")
        .agg(*aggs)
    )
    stacked = per_file.select(
        "file",
        F.explode(F.array(*[
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
                F.col(f"{c}__nnotnull").alias("n_notnull"),
                F.col(f"{c}__nrows").alias("n_rows"),
            ) for c in cols
        ])).alias("s"),
    ).select("file", "s.*")
    stats_path = posixpath.join(path, STATS_DIR)
    stacked.coalesce(1).write.mode("overwrite").parquet(stats_path)
    return stacked.select("file").distinct().count()


def _data_files(spark: SparkSession, path: str) -> set[str]:
    sc = spark.sparkContext
    jvm = sc._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    out = set()
    for st in fs.listStatus(hpath):
        n = st.getPath().getName()
        if st.isFile() and n.endswith(".parquet") and not n.startswith(
                ("_", ".")):
            out.add(n)
    return out


def skipping_plan(spark: SparkSession, path: str,
                  bounds: dict[str, tuple]) -> dict:
    """Decide which files a ``AND_c col BETWEEN lo AND hi`` scan must
    read.  Returns ``{"files": [...], "total": n, "skipped": n,
    "stale": bool}``; ``stale`` means the manifest doesn't match the
    directory's current data files and NO skipping may be applied.
    """
    current = _data_files(spark, path)
    stats_path = posixpath.join(path, STATS_DIR)
    try:
        stats = spark.read.parquet(stats_path).collect()
    except Exception:
        return {"files": sorted(current), "total": len(current),
                "skipped": 0, "stale": True}
    known = {r["file"] for r in stats}
    if known != current:
        return {"files": sorted(current), "total": len(current),
                "skipped": 0, "stale": True}
    cannot = set()
    for r in stats:
        if r["column"] not in bounds:
            continue
        lo, hi = bounds[r["column"]]
        if r["n_notnull"] == 0:
            cannot.add(r["file"])          # only NULLs: BETWEEN matches none
        elif r["max_val"] < lo or r["min_val"] > hi:
            cannot.add(r["file"])
    keep = sorted(current - cannot)
    return {"files": keep, "total": len(current),
            "skipped": len(current) - len(keep), "stale": False}


def skipping_scan(spark: SparkSession, path: str,
                  bounds: dict[str, tuple]) -> DataFrame:
    """Read ``path`` with file-level skipping for the conjunctive range
    predicate ``bounds`` (col -> (lo, hi)), then apply the predicate as
    a residual row filter (parquet row-group pruning still applies
    inside the kept files).  Row-equivalent to the full filtered scan —
    asserted by the round-trip tests at any staleness state.
    """
    plan = skipping_plan(spark, path, bounds)
    if plan["files"]:
        df = spark.read.parquet(
            *[posixpath.join(path, f) for f in plan["files"]])
    else:
        # nothing can match; keep the schema by reading the (possibly
        # empty) full set then filtering all rows out
        df = spark.read.parquet(path).limit(0)
    cond = F.lit(True)
    for c, (lo, hi) in bounds.items():
        cond = cond & F.col(c).between(F.lit(lo), F.lit(hi))
    return df.filter(cond)
