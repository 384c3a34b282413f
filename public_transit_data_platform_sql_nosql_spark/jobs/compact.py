"""Small-file compaction for append-mode parquet sinks.

The streaming jobs (streaming/jobs.py incremental_refresh) and any
micro-batched loader append one file set per trigger; after days of
5-minute batches a sink holds tens of thousands of KB-sized files, and at
100 TB the scan's task-scheduling and footer-reading overhead dwarfs the
I/O (the same failure mode table formats solve with OPTIMIZE).  The
reference never hits this because MySQL/Mongo own their storage
(`/root/reference/Mongo/denormalization.py` upserts in place); a
parquet-backed engine has to own it explicitly.

``compact_parquet_dir`` rewrites a directory into ~``target_file_bytes``
files:

  read -> repartition(ceil(bytes / target)) -> write tmp -> swap -> rm old

The swap uses the Hadoop FileSystem API through the JVM gateway, so the
same code RUNS on local disk, HDFS, or any Hadoop-compatible store — NOT
python os.rename, which only exists on the driver's local FS.  The
crash-safety claim is scoped to stores with ATOMIC directory rename
(posix, HDFS): there each swap step either happens or doesn't, and a
crash between the two renames is repaired on the next run (the sink is
restored from ``._compact_old`` before anything else).  On S3A-class
object stores rename is a non-atomic copy+delete — a crash mid-"rename"
can leave a partially-copied tree that this module cannot distinguish
from a complete one; run compaction there under a table format (Iceberg/
Delta OPTIMIZE) or accept the window.  The swap window is two renames;
concurrent READERS that already planned their scan keep working on the
old file handles (posix) or fail-and-retry, but concurrent WRITERS must
be paused — same contract as every table-format-less compaction.
"""

from __future__ import annotations

import math

from pyspark.sql import SparkSession


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath, jvm


def parquet_dir_stats(spark: SparkSession, path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for the parquet files under ``path``."""
    fs, hpath, jvm = _fs(spark, path)
    n, total = 0, 0
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith((".", "_")):
            n += 1
            total += st.getLen()
    return n, total


def partition_columns(spark: SparkSession, path: str) -> list[str]:
    """Hive-style partition columns of ``path``, detected from the first
    ``col=value`` directory chain (empty list for a flat layout)."""
    fs, hpath, jvm = _fs(spark, path)
    cols: list[str] = []
    current = hpath
    while True:
        sub = [st.getPath() for st in fs.listStatus(current)
               if st.isDirectory() and "=" in st.getPath().getName()
               and not st.getPath().getName().startswith((".", "_"))]
        if not sub:
            return cols
        cols.append(sub[0].getName().split("=", 1)[0])
        current = sub[0]


def leaf_partition_dir_count(spark: SparkSession, path: str) -> int:
    """Number of leaf directories holding data files under ``path``
    (1 for a flat layout)."""
    fs, hpath, jvm = _fs(spark, path)
    dirs = set()
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if name.endswith(".parquet") and not name.startswith((".", "_")):
            dirs.add(st.getPath().getParent().toString())
    return max(1, len(dirs))


def compact_parquet_dir(spark: SparkSession, path: str,
                        target_file_bytes: int = 128 * 1024 * 1024,
                        min_files: int = 2) -> dict:
    """Rewrite ``path`` into ~``target_file_bytes`` parquet files.
    No-op (returns ``{"compacted": False, ...}``) when the directory
    already holds fewer than ``min_files`` data files or is already at
    (or under) its target file count — rewriting would churn bytes for
    nothing.

    Hive-partitioned layouts (e.g. the bucketed doc store's
    ``stop_bucket=NN/`` directories) are preserved: the rewrite
    re-shuffles on the detected partition columns and writes with
    ``partitionBy``, so partition pruning keeps working after compaction
    instead of silently degrading to a flat scan.  The file-count target
    is per-layout: a flat dir gets ``ceil(total/target)`` files; a
    partitioned dir gets ``ceil(per_dir_share/target)`` files PER leaf
    directory (hash-salted within the partition key so a hot partition's
    rows split across tasks).  The per-dir share assumes roughly even
    partitions — a skewed hot directory still gets only its salt-split
    file count, bounded but larger files than the target.

    Returns a stats dict so schedulers can log/alert on it.
    """
    fs, hpath, jvm = _fs(spark, path)
    old = jvm.org.apache.hadoop.fs.Path(path + "._compact_old")
    # crash recovery: a previous run that died between its two renames
    # left the sink missing and the data stranded in ._compact_old —
    # restore it FIRST (before stats, which would throw on the missing
    # sink, and before stale-leftover cleanup, which would delete the
    # only surviving copy)
    if not fs.exists(hpath) and fs.exists(old):
        if not fs.rename(old, hpath):
            raise IOError(
                f"compact: recovery rename {old} -> {path} failed")

    files_before, total_bytes = parquet_dir_stats(spark, path)
    pcols = partition_columns(spark, path)
    n_dirs = leaf_partition_dir_count(spark, path) if pcols else 1
    files_per_dir = max(1, math.ceil(total_bytes / n_dirs
                                     / target_file_bytes))
    n_target = n_dirs * files_per_dir
    if files_before < min_files or files_before <= n_target:
        return {"compacted": False, "files_before": files_before,
                "files_after": files_before, "bytes": total_bytes}

    tmp = jvm.org.apache.hadoop.fs.Path(path + "._compact_tmp")
    # stale leftovers from a crashed previous run (the sink exists, so
    # an ._compact_old here is a superseded copy, not the only one)
    for p in (tmp, old):
        if fs.exists(p):
            fs.delete(p, True)

    # partition values round-trip through directory NAMES: with type
    # inference on, a string-typed value that looks numeric (part=00,
    # dates) would be re-inferred and rewritten with a mutated directory
    # name and changed column type.  Compaction must never rewrite
    # values, so inference is off for the rewrite read — partition
    # columns come back as strings, directory names are preserved
    # byte-for-byte, and downstream readers re-infer exactly as before.
    inference_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    saved_inference = spark.conf.get(inference_key)
    spark.conf.set(inference_key, "false")
    try:
        df = spark.read.parquet(path)
        if pcols:
            from pyspark.sql import functions as F

            # deterministic salt splits each partition directory's rows
            # across `files_per_dir` tasks; partitionBy still routes
            # every row to its directory, so a dir gets at most
            # files_per_dir files
            salt = F.pmod(
                F.xxhash64(F.struct(*[F.col(c) for c in df.columns])),
                F.lit(files_per_dir))
            writer = (df.withColumn("_salt", salt)
                      .repartition(n_target, *pcols, "_salt")
                      .drop("_salt")
                      .write.mode("overwrite").partitionBy(*pcols))
        else:
            writer = df.repartition(n_target).write.mode("overwrite")
        writer.parquet(tmp.toString())
    finally:
        spark.conf.set(inference_key, saved_inference)

    if not fs.rename(hpath, old):
        raise IOError(f"compact: rename {path} -> {old} failed")
    if not fs.rename(tmp, hpath):
        # roll back so the sink never disappears
        fs.rename(old, hpath)
        raise IOError(f"compact: rename {tmp} -> {path} failed (rolled back)")
    fs.delete(old, True)

    files_after, _ = parquet_dir_stats(spark, path)
    return {"compacted": True, "files_before": files_before,
            "files_after": files_after, "bytes": total_bytes}
