"""Incremental MERGE (upsert) into parquet sinks.

The reference's only write path is a destructive full reload
(`/root/reference/Mongo/denormalization.py` drops and rebuilds the doc
store; SURVEY.md S10).  A daily GTFS feed update touches a tiny fraction
of rows — at 100 TB a full rewrite per feed drop is absurd, so this
module adds the incremental twin: copy-on-write MERGE with the rewrite
scope bounded by the data actually touched.

``upsert_parquet_dir(spark, path, updates, key_cols)``:

  new keys are appended, matching keys are replaced, everything else is
  rewritten only when its storage partition is touched:

- **flat layout**: survivors = store LEFT ANTI updates on key;
  write survivors ∪ updates to tmp; two-rename swap (same
  crash-recovery contract as jobs/compact.py — see that module's
  docstring for the atomic-rename scoping).
- **hive-partitioned layout** (``partition_col=``): only the partition
  directories present in ``updates`` are read (partition pruning does
  the bounding — the anti-join never sees untouched partitions), and
  only those directories are swapped.  An upsert touching 3 of 10 000
  partitions reads and rewrites 3.

Updates must be key-unique (the merge would otherwise be ambiguous);
violations raise before anything is written.  Concurrent writers must be
paused during the swap, same as compaction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .compact import _fs

_OLD_SUFFIX = "._upsert_old"
_TMP_SUFFIX = "._upsert_tmp"


def _check_key_unique(updates: DataFrame, key_cols: list[str]) -> None:
    dup = (
        updates.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"upsert: updates are not unique on {key_cols}: "
            f"{tuple(dup[0][c] for c in key_cols)} appears {dup[0]['n']}x")


def _recover(fs, jvm, path: str) -> bool:
    """Restore ``path`` from a stranded ``._upsert_old`` left by a crash
    between the two swap renames.  Returns True if a recovery happened."""
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    old = jvm.org.apache.hadoop.fs.Path(path + _OLD_SUFFIX)
    if not fs.exists(hpath) and fs.exists(old):
        if not fs.rename(old, hpath):
            raise IOError(f"upsert: recovery rename {old} -> {path} failed")
        return True
    return False


def _swap(fs, jvm, target: str, tmp: str) -> None:
    """Two-rename swap of ``target`` with ``tmp`` (``target`` may not
    exist yet — then this is a plain move)."""
    htarget = jvm.org.apache.hadoop.fs.Path(target)
    htmp = jvm.org.apache.hadoop.fs.Path(tmp)
    old = jvm.org.apache.hadoop.fs.Path(target + _OLD_SUFFIX)
    if fs.exists(old):
        fs.delete(old, True)
    had_target = fs.exists(htarget)
    if had_target and not fs.rename(htarget, old):
        raise IOError(f"upsert: rename {target} -> {old} failed")
    if not fs.rename(htmp, htarget):
        if had_target:
            fs.rename(old, htarget)  # roll back; sink never disappears
        raise IOError(f"upsert: rename {tmp} -> {target} failed (rolled back)")
    if had_target:
        fs.delete(old, True)


def upsert_parquet_dir(spark: SparkSession, path: str, updates: DataFrame,
                       key_cols: list[str],
                       partition_col: str | None = None) -> dict:
    """MERGE ``updates`` into the parquet directory ``path`` on
    ``key_cols``: matching keys replaced, new keys appended, all other
    rows untouched.  Returns a stats dict.

    With ``partition_col`` (a column of ``updates`` that is also the
    sink's hive partition column), the read AND the rewrite are scoped
    to the partition values present in ``updates`` — the scale path.
    The column must functionally determine the row's partition (a key
    whose partition value CHANGES between versions would leave the old
    copy stranded in the untouched partition; merge on a stable
    partition column such as ingest date or bucket).
    """
    _check_key_unique(updates, key_cols)
    fs, hpath, jvm = _fs(spark, path)

    if partition_col is None:
        _recover(fs, jvm, path)
        if not fs.exists(hpath):
            updates.write.mode("overwrite").parquet(path)
            n = updates.count()
            return {"created": True, "rows_upserted": n, "partitions": None}
        store = spark.read.parquet(path)
        survivors = store.join(
            updates.select(*key_cols).distinct(), key_cols, "left_anti")
        merged = survivors.unionByName(updates)
        tmp = path + _TMP_SUFFIX
        htmp = jvm.org.apache.hadoop.fs.Path(tmp)
        if fs.exists(htmp):
            fs.delete(htmp, True)
        merged.write.mode("overwrite").parquet(tmp)
        _swap(fs, jvm, path, tmp)
        return {"created": False, "rows_upserted": updates.count(),
                "partitions": None}

    # --- partition-scoped path ---------------------------------------
    # touched partition values: a bounded collect (one row per touched
    # partition, not per updated row)
    touched = sorted(
        r[0] for r in updates.select(partition_col).distinct().collect())
    if not touched:
        return {"created": False, "rows_upserted": 0, "partitions": []}

    sink_exists = fs.exists(hpath)
    for v in touched:
        _recover(fs, jvm, f"{path}/{partition_col}={v}")

    tmp = path + _TMP_SUFFIX
    htmp = jvm.org.apache.hadoop.fs.Path(tmp)
    if fs.exists(htmp):
        fs.delete(htmp, True)

    if sink_exists:
        # partition-pruned read: the IN-filter on the partition column
        # prunes directories at plan time — untouched partitions are
        # never opened
        store = spark.read.parquet(path).filter(
            F.col(partition_col).isin(*touched))
        survivors = store.join(
            updates.select(*key_cols).distinct(), key_cols, "left_anti")
        merged = survivors.unionByName(
            updates.select(*store.columns))
    else:
        merged = updates
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)

    n_up = updates.count()
    fs.mkdirs(hpath)
    swapped = []
    for v in touched:
        part_dir = f"{partition_col}={v}"
        src = f"{tmp}/{part_dir}"
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(src)):
            continue  # updates had the value but wrote no rows (empty df)
        _swap(fs, jvm, f"{path}/{part_dir}", src)
        swapped.append(v)
    fs.delete(htmp, True)
    return {"created": not sink_exists, "rows_upserted": n_up,
            "partitions": swapped}
