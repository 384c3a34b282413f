"""Versioned parquet store: manifest-based snapshots with time travel.

The copy-on-write mutations in jobs/upsert.py keep a sink CORRECT under
crashes, but each mutation replaces history — a training-data pipeline
also needs to answer "exactly which corpus trained run N?" and to diff /
reproduce past snapshots (the audit trail the corpus_diff operator
compares, and the reproducibility contract an eval pins).  This module
adds the minimal lakehouse log over plain parquet:

- data files are immutable, written once under ``<path>/data/v<N>/``;
- every commit writes manifest ``<path>/_versions/v<N>.json`` listing
  the EXACT data directories the snapshot reads (a snapshot may reuse
  earlier versions' directories — append commits reference old + new);
- readers resolve a manifest and read only its directories, so
  ``read_version(path, 3)`` is bit-stable forever (until vacuumed);
- ``vacuum`` deletes data directories no retained manifest references.

Commit protocol (crash-safe without a lock service, single-writer):
data dirs are written FIRST, the manifest LAST via copy-then-rename —
a crash before the manifest rename leaves an orphan data dir that the
next ``vacuum`` collects; a torn manifest can never be observed because
the rename is atomic on a posix/HDFS filesystem.  Multi-writer commits
need a coordination layer (the same caveat Delta/Iceberg solve with a
log store); this module is the single-pipeline-owner shape.

Scale: manifests hold directory paths, not per-file lists — O(commits)
metadata; reads plan as ordinary multi-path parquet scans with full
pushdown/pruning; nothing here touches data volume except vacuum's
deletes.
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from .compact import _fs

_VDIR = "_versions"


def _manifest_path(path: str, version: int) -> str:
    return f"{path}/{_VDIR}/v{version:06d}.json"


def list_versions(spark: SparkSession, path: str) -> list[int]:
    """Committed versions, ascending; [] for a missing/empty store."""
    fs, _, jvm = _fs(spark, f"{path}/{_VDIR}")
    vdir = jvm.org.apache.hadoop.fs.Path(f"{path}/{_VDIR}")
    if not fs.exists(vdir):
        return []
    out = []
    for st in fs.listStatus(vdir):
        name = st.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_manifest(spark: SparkSession, path: str, version: int) -> dict:
    """Manifest = one tiny JSON line; read it with a one-file text scan
    (filesystem-agnostic — py4j cannot fill a Python buffer from a JVM
    InputStream by reference, so no direct FSDataInputStream reads)."""
    fs, _, jvm = _fs(spark, path)
    mp = jvm.org.apache.hadoop.fs.Path(_manifest_path(path, version))
    if not fs.exists(mp):
        raise FileNotFoundError(
            f"versioned store {path}: no version {version} "
            f"(have {list_versions(spark, path)})")
    rows = spark.read.text(_manifest_path(path, version)).collect()
    return json.loads("".join(r["value"] for r in rows))


def _write_manifest(spark: SparkSession, path: str, version: int,
                    manifest: dict) -> None:
    """Write the manifest via tmp + atomic rename — the commit point.

    Every commit is stamped with a ``build_nonce`` (random uuid): driver
    caches key on it to detect delete-and-rebuild at the same path.  A
    (mtime, len) file fingerprint collides when the rebuild lands a
    same-length manifest within the filesystem's mtime granularity
    (coarse-mtime filesystems make that a real window); a per-commit
    nonce cannot collide regardless of timestamps."""
    manifest = dict(manifest)
    manifest.setdefault("build_nonce", uuid.uuid4().hex)
    fs, _, jvm = _fs(spark, path)
    final = jvm.org.apache.hadoop.fs.Path(_manifest_path(path, version))
    if fs.exists(final):
        raise FileExistsError(
            f"versioned store {path}: version {version} already exists "
            f"(concurrent writer? this store is single-writer)")
    tmp = jvm.org.apache.hadoop.fs.Path(
        _manifest_path(path, version) + ".tmp")
    out = fs.create(tmp, True)
    try:
        out.write(json.dumps(manifest, sort_keys=True).encode("utf-8"))
    finally:
        out.close()
    if not fs.rename(tmp, final):
        raise IOError(f"versioned store {path}: manifest commit rename "
                      f"failed for v{version}")


def commit_version(df: DataFrame, path: str,
                   mode: str = "overwrite") -> dict:
    """Commit ``df`` as the next version.  ``mode='overwrite'``: the new
    snapshot is exactly ``df``.  ``mode='append'``: the new snapshot is
    the previous version plus ``df`` — the new manifest references the
    prior snapshot's directories PLUS one new directory, so an append
    commit writes only the appended rows.  Returns
    ``{"version", "dirs", "mode"}``."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    spark = df.sparkSession
    versions = list_versions(spark, path)
    version = (versions[-1] + 1) if versions else 0
    new_dir = f"{path}/data/v{version:06d}"
    # version = newest committed + 1, so this dir can pre-exist ONLY as
    # a crashed commit's orphan (its manifest never landed; the store is
    # single-writer).  Reclaim it — otherwise a replayed foreachBatch
    # micro-batch wedges forever on the mode('error') write below.
    fs, _, jvm = _fs(spark, path)
    orphan = jvm.org.apache.hadoop.fs.Path(new_dir)
    if fs.exists(orphan):
        fs.delete(orphan, True)
    df.write.mode("error").parquet(new_dir)
    dirs = [f"data/v{version:06d}"]
    if mode == "append" and versions:
        prev = _read_manifest(spark, path, versions[-1])
        dirs = prev["dirs"] + dirs
    _write_manifest(spark, path, version,
                    {"version": version, "dirs": dirs, "mode": mode})
    return {"version": version, "dirs": dirs, "mode": mode}


def read_version(spark: SparkSession, path: str,
                 version: int | None = None) -> DataFrame:
    """The snapshot at ``version`` (default: latest) — a plain parquet
    scan over the manifest's directories, so pushdown/pruning work as
    on any parquet read."""
    versions = list_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"versioned store {path}: no commits")
    v = versions[-1] if version is None else version
    m = _read_manifest(spark, path, v)
    return spark.read.parquet(*[f"{path}/{d}" for d in m["dirs"]])


def vacuum(spark: SparkSession, path: str, keep_last: int = 2) -> dict:
    """Retire history: keep the last ``keep_last`` manifests, delete
    every data directory none of them references (including orphans
    from crashed commits).  Returns ``{"kept_versions",
    "deleted_dirs"}``."""
    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last!r}")
    fs, _, jvm = _fs(spark, path)
    versions = list_versions(spark, path)
    keep = versions[-keep_last:]
    referenced = set()
    for v in keep:
        referenced.update(_read_manifest(spark, path, v)["dirs"])
    deleted = []
    data_root = jvm.org.apache.hadoop.fs.Path(f"{path}/data")
    if fs.exists(data_root):
        for st in fs.listStatus(data_root):
            rel = f"data/{st.getPath().getName()}"
            if rel not in referenced:
                fs.delete(st.getPath(), True)
                deleted.append(rel)
    for v in versions:
        if v not in keep:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(_manifest_path(path, v)),
                True)
    return {"kept_versions": keep, "deleted_dirs": sorted(deleted)}


def snapshot_diff(spark: SparkSession, path: str,
                  old_version: int, new_version: int | None = None,
                  summary: bool = False) -> DataFrame:
    """Audit two snapshots of a versioned DOCUMENT store against each
    other: ``pipeline/incremental.corpus_diff`` (added / removed /
    changed / unchanged by content hash) over ``read_version`` of each —
    the promotion gate a corpus build runs before vacuuming the old
    snapshot away.  ``summary=True`` returns the one-row-per-status
    counts instead of per-doc rows.  Requires ``doc_id``/``text``
    columns (the documents contract)."""
    from ..pipeline.incremental import corpus_diff, corpus_diff_summary

    old = read_version(spark, path, old_version)
    new = read_version(spark, path, new_version)
    fn = corpus_diff_summary if summary else corpus_diff
    return fn(old.select("doc_id", "text"), new.select("doc_id", "text"))
