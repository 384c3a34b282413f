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
the files, paid once.  ``skipping_scan`` prunes the manifest with a
Spark ``where`` (the min/max comparisons never leave the cluster; only
the surviving file names — needed to build the read paths — reach the
driver), keeps the files whose ``[min, max]`` intersects the requested
bounds, and hands Spark ONLY those paths plus the residual row filter.

Files are keyed by their path RELATIVE to the dataset root, so
hive-partitioned sinks (``partitionBy`` output, e.g.
write_training_shards') work: the recursive directory listing and the
``input_file_name()``-derived manifest key agree on
``svc=weekday/part-0000….parquet``-style names, and ``part-*``
basenames in different partition directories never collide.  Kept
files are read with ``basePath`` set to the root so partition columns
are still derived from the directory names.

Skipping soundness: a range predicate ``col BETWEEN lo AND hi`` matches
no NULL row, so a file is skippable iff ``max < lo OR min > hi`` or the
file has no non-null value at all (min/max NULL) — exactly the test
the ``skippable`` flag below implements with null-safe logic.

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
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STATS_DIR = "_file_stats"

# URI scheme (+ optional authority slashes) prefix: ``file:///x`` /
# ``file:/x`` / ``hdfs://nn/x`` all normalize to a plain ``/x…`` path
# so manifest keys are stable across URI-rendering differences between
# ``input_file_name()`` and the Hadoop FileSystem listing.
_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*:/+"


def _strip_scheme(s: str) -> str:
    return re.sub(_SCHEME_RE, "/", s)


def _qualified_root(spark: SparkSession, path: str):
    sc = spark.sparkContext
    jvm = sc._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(sc._jsc.hadoopConfiguration())
    return fs, fs.makeQualified(hpath)


def _rel_file_expr(root_uri: str):
    """``input_file_name()`` → path relative to the dataset root.
    Scheme-stripped on both sides; falls back to the full path if the
    prefix unexpectedly doesn't match (then the staleness check
    refuses to skip rather than mis-keying)."""
    prefix = _strip_scheme(root_uri).rstrip("/") + "/"
    noscheme = F.regexp_replace(F.input_file_name(), _SCHEME_RE, "/")
    return F.when(
        noscheme.startswith(F.lit(prefix)),
        F.substring(noscheme, len(prefix) + 1, 2_000_000),
    ).otherwise(noscheme)


def write_file_stats(spark: SparkSession, path: str,
                     cols: list[str]) -> int:
    """Build/replace the stats manifest for the parquet files under
    ``path`` (recursing into partition directories): one row per
    (file, column) with min/max/null counts.  Returns the number of
    files profiled.

    ONE distributed scan of the data projecting only ``cols`` (+ the
    virtual file name); the aggregate output is |files| x |cols| rows —
    driver-tiny.  The returned count is read back from the just-written
    manifest (KB-scale), not by re-aggregating the data.
    """
    _, qroot = _qualified_root(spark, path)
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
        df.select(*cols, _rel_file_expr(qroot.toString()).alias("file"))
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
    return (spark.read.parquet(stats_path)
            .select("file").distinct().count())


def _data_files(spark: SparkSession, path: str) -> set[str]:
    """Relative paths of every data file under ``path``, recursing into
    partition subdirectories.  Hidden path segments (underscore / dot
    prefixed — the stats sidecar itself, _SUCCESS, checkpoints) are
    excluded the same way Spark's default path filter excludes them."""
    fs, qroot = _qualified_root(spark, path)
    root = _strip_scheme(qroot.toString()).rstrip("/")
    out: set[str] = set()
    it = fs.listFiles(qroot, True)
    while it.hasNext():
        p = _strip_scheme(it.next().getPath().toString())
        if not p.startswith(root + "/"):
            continue
        rel = p[len(root) + 1:]
        segs = rel.split("/")
        if any(s.startswith(("_", ".")) for s in segs):
            continue
        if segs[-1].endswith(".parquet"):
            out.add(rel)
    return out


def skipping_plan(spark: SparkSession, path: str,
                  bounds: dict[str, tuple]) -> dict:
    """Decide which files a ``AND_c col BETWEEN lo AND hi`` scan must
    read.  Returns ``{"files": [...], "total": n, "skipped": n,
    "stale": bool}``; ``stale`` means the manifest doesn't match the
    directory's current data files and NO skipping may be applied.

    The min/max intersection test runs as a Spark aggregate over the
    manifest; the driver only ever collects file NAMES (the full list
    for the staleness equality check — the same information the
    directory listing already produced — and the surviving subset via
    a Spark ``where``), never per-column stats.
    """
    current = _data_files(spark, path)
    stats_path = posixpath.join(path, STATS_DIR)
    try:
        stats = spark.read.parquet(stats_path)
    except Exception:
        return {"files": sorted(current), "total": len(current),
                "skipped": 0, "stale": True}
    # a file is skippable iff ANY bounded column proves it empty for
    # the predicate: all-NULL (BETWEEN matches no NULL row) or a
    # disjoint [min, max] range.
    skippable = F.lit(False)
    for c, (lo, hi) in bounds.items():
        skippable = skippable | (
            (F.col("column") == c)
            & ((F.col("n_notnull") == 0)
               | (F.col("max_val") < F.lit(float(lo)))
               | (F.col("min_val") > F.lit(float(hi))))
        )
    per_file = (
        stats.groupBy("file")
        .agg(F.max(skippable.cast("int")).alias("skippable"))
        .persist()
    )
    try:
        known = {r["file"] for r in per_file.select("file").collect()}
        if known != current:
            return {"files": sorted(current), "total": len(current),
                    "skipped": 0, "stale": True}
        keep = sorted(
            r["file"] for r in per_file.where(F.col("skippable") == 0)
            .select("file").collect()
        )
    finally:
        per_file.unpersist()
    return {"files": keep, "total": len(current),
            "skipped": len(current) - len(keep), "stale": False}


def skipping_scan(spark: SparkSession, path: str,
                  bounds: dict[str, tuple]) -> DataFrame:
    """Read ``path`` with file-level skipping for the conjunctive range
    predicate ``bounds`` (col -> (lo, hi)), then apply the predicate as
    a residual row filter (parquet row-group pruning still applies
    inside the kept files).  Row-equivalent to the full filtered scan —
    asserted by the round-trip tests at any staleness state, flat or
    hive-partitioned layout.
    """
    plan = skipping_plan(spark, path, bounds)
    if plan["files"]:
        # basePath keeps partition-directory columns derivable when the
        # kept files live under key=value subdirectories
        df = (spark.read.option("basePath", path)
              .parquet(*[posixpath.join(path, f) for f in plan["files"]]))
    else:
        # nothing can match; keep the schema by reading the (possibly
        # empty) full set then filtering all rows out
        df = spark.read.parquet(path).limit(0)
    cond = F.lit(True)
    for c, (lo, hi) in bounds.items():
        cond = cond & F.col(c).between(F.lit(lo), F.lit(hi))
    return df.filter(cond)
