"""Incremental MERGE into parquet sinks: replace-on-key semantics,
partition-scoped rewrites that leave untouched partitions' files alone,
crash recovery from a stranded swap, and key-uniqueness enforcement."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from public_transit_data_platform_sql_nosql_spark.jobs.upsert import (
    upsert_parquet_dir,
)


def _rows(spark, path):
    return {(r["k"], r["v"]) for r in spark.read.parquet(path).collect()}


def _mkdf(spark, pairs):
    return spark.createDataFrame(
        [(int(k), str(v)) for k, v in pairs], "k long, v string")


def test_upsert_flat_merge(spark, tmp_path):
    sink = str(tmp_path / "sink")
    st = upsert_parquet_dir(
        spark, sink, _mkdf(spark, [(1, "a"), (2, "b"), (3, "c")]), ["k"])
    assert st["created"] is True
    st = upsert_parquet_dir(
        spark, sink, _mkdf(spark, [(2, "B"), (4, "d")]), ["k"])
    assert st["created"] is False and st["rows_upserted"] == 2
    assert _rows(spark, sink) == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}
    # idempotent: re-applying the same batch changes nothing
    upsert_parquet_dir(spark, sink, _mkdf(spark, [(2, "B"), (4, "d")]), ["k"])
    assert _rows(spark, sink) == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}


def test_upsert_rejects_duplicate_update_keys(spark, tmp_path):
    sink = str(tmp_path / "sink")
    with pytest.raises(ValueError, match="not unique"):
        upsert_parquet_dir(
            spark, sink, _mkdf(spark, [(1, "a"), (1, "b")]), ["k"])


def test_upsert_partition_scoped_rewrite(spark, tmp_path):
    """Only the partition directories named in the updates are rewritten;
    untouched partitions keep their exact files (same names, same
    mtimes)."""
    sink = str(tmp_path / "sink")
    base = spark.createDataFrame(
        [(i, f"v{i}", i % 4) for i in range(100)], "k long, v string, p long")
    upsert_parquet_dir(spark, sink, base, ["k"], partition_col="p")
    assert len(os.listdir(sink)) >= 4

    untouched = sorted(os.listdir(os.path.join(sink, "p=3")))
    mtimes = {f: os.path.getmtime(os.path.join(sink, "p=3", f))
              for f in untouched}

    ups = spark.createDataFrame(
        [(0, "NEW", 0), (200, "ins", 1)], "k long, v string, p long")
    st = upsert_parquet_dir(spark, sink, ups, ["k"], partition_col="p")
    assert sorted(st["partitions"]) == [0, 1]

    after = spark.read.parquet(sink)
    got = {(r["k"], r["v"], r["p"]) for r in after.collect()}
    expect = {(i, f"v{i}", i % 4) for i in range(100) if i != 0}
    expect |= {(0, "NEW", 0), (200, "ins", 1)}
    assert got == expect

    # p=3 files byte-identical (never read, never rewritten)
    assert sorted(os.listdir(os.path.join(sink, "p=3"))) == untouched
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(sink, "p=3", f)) == m


def test_upsert_creates_partitioned_sink(spark, tmp_path):
    sink = str(tmp_path / "sink")
    ups = spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1)], "k long, v string, p long")
    st = upsert_parquet_dir(spark, sink, ups, ["k"], partition_col="p")
    assert st["created"] is True and sorted(st["partitions"]) == [0, 1]
    assert spark.read.parquet(sink).count() == 2


def test_upsert_crash_recovery(spark, tmp_path):
    """A sink directory stranded at ._upsert_old (crash between the two
    swap renames) is restored before the next merge runs."""
    sink = str(tmp_path / "sink")
    upsert_parquet_dir(
        spark, sink, _mkdf(spark, [(1, "a"), (2, "b")]), ["k"])
    # simulate the crash window: sink renamed away, tmp never moved in
    os.rename(sink, sink + "._upsert_old")
    st = upsert_parquet_dir(spark, sink, _mkdf(spark, [(3, "c")]), ["k"])
    assert st["created"] is False
    assert _rows(spark, sink) == {(1, "a"), (2, "b"), (3, "c")}


def test_stream_upsert_merges_batches(spark, tmp_path):
    """foreachBatch MERGE sink: two source files streamed as separate
    micro-batches merge into the sink with replace-on-key semantics
    (batches carry overlapping keys; the later batch's rows win)."""
    from public_transit_data_platform_sql_nosql_spark.streaming.jobs import (
        stream_upsert,
    )

    src = tmp_path / "src"
    _mkdf(spark, [(1, "a"), (2, "b")]).coalesce(1).write.parquet(
        str(src / "batch0"))
    _mkdf(spark, [(2, "B"), (3, "c")]).coalesce(1).write.parquet(
        str(src / "batch1"))

    stream = (
        spark.readStream.schema("k long, v string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    q = stream_upsert(stream, sink, chk, ["k"])
    q.awaitTermination()
    # 3 distinct keys survive; key 2 holds exactly one of its two values
    # (merge semantics, not append — which value depends on file order)
    rows = dict(_rows(spark, sink))
    assert set(rows) == {1, 2, 3}
    assert rows[1] == "a" and rows[3] == "c" and rows[2] in {"b", "B"}
    assert spark.read.parquet(sink).count() == 3


def _mkpart(spark, triples):
    return spark.createDataFrame(
        [(int(k), str(v), int(p)) for k, v, p in triples],
        "k long, v string, p long")


def _prows(spark, path):
    return {(r["k"], r["v"], r["p"])
            for r in spark.read.parquet(path).collect()}


def test_delete_keys_flat(spark, tmp_path):
    from public_transit_data_platform_sql_nosql_spark.jobs.upsert import (
        delete_keys_parquet_dir,
    )
    sink = str(tmp_path / "sink")
    _mkdf(spark, [(1, "a"), (2, "b"), (3, "c")]).write.parquet(sink)
    keys = spark.createDataFrame([(2,), (9,)], "k long")
    st = delete_keys_parquet_dir(spark, sink, keys, ["k"])
    assert st["rows_deleted"] == 1
    assert _rows(spark, sink) == {(1, "a"), (3, "c")}
    # no matches -> no rewrite, same contents
    st = delete_keys_parquet_dir(spark, sink, keys, ["k"])
    assert st["rows_deleted"] == 0
    assert _rows(spark, sink) == {(1, "a"), (3, "c")}
    # missing sink is a no-op
    st = delete_keys_parquet_dir(
        spark, str(tmp_path / "nope"), keys, ["k"])
    assert st["rows_deleted"] == 0


def test_delete_keys_partition_scoped(spark, tmp_path):
    from public_transit_data_platform_sql_nosql_spark.jobs.upsert import (
        delete_keys_parquet_dir,
    )
    sink = str(tmp_path / "sink")
    _mkpart(spark, [(1, "a", 0), (2, "b", 0), (3, "c", 1), (4, "d", 2),
                    (5, "e", 2)]).write.partitionBy("p").parquet(sink)
    before = {f: os.path.getmtime(os.path.join(sink, "p=1", f))
              for f in os.listdir(os.path.join(sink, "p=1"))
              if f.endswith(".parquet")}
    keys = spark.createDataFrame([(2, 0), (4, 2), (5, 2)], "k long, p long")
    st = delete_keys_parquet_dir(spark, sink, keys, ["k"],
                                 partition_col="p")
    assert st["rows_deleted"] == 3
    assert sorted(st["partitions"]) == [0, 2]
    assert _prows(spark, sink) == {(1, "a", 0), (3, "c", 1)}
    # untouched partition p=1 kept its exact files
    after = {f: os.path.getmtime(os.path.join(sink, "p=1", f))
             for f in os.listdir(os.path.join(sink, "p=1"))
             if f.endswith(".parquet")}
    assert after == before
    # fully-deleted partition directory is gone, not stale
    assert not os.path.exists(os.path.join(sink, "p=2"))


def test_delete_where_retention_sweep(spark, tmp_path):
    from public_transit_data_platform_sql_nosql_spark.jobs.upsert import (
        delete_where_parquet_dir,
    )
    sink = str(tmp_path / "sink")
    _mkpart(spark, [(1, "old", 0), (2, "old", 0), (3, "new", 1),
                    (4, "old", 1), (5, "new", 2)]
            ).write.partitionBy("p").parquet(sink)
    st = delete_where_parquet_dir(spark, sink, "v = 'old'",
                                  partition_col="p")
    assert st["rows_deleted"] == 3
    assert sorted(st["partitions"]) == [0, 1]
    assert _prows(spark, sink) == {(3, "new", 1), (5, "new", 2)}
    assert not os.path.exists(os.path.join(sink, "p=0"))
    # flat variant
    sink2 = str(tmp_path / "sink2")
    _mkdf(spark, [(1, "x"), (2, "y")]).write.parquet(sink2)
    st = delete_where_parquet_dir(spark, sink2, "v = 'x'")
    assert st["rows_deleted"] == 1
    assert _rows(spark, sink2) == {(2, "y")}


def test_delete_where_recovers_stranded_partition(spark, tmp_path):
    """A partition renamed out by a crashed swap is recovered BEFORE the
    discovery scan, so its rows are still found and deleted."""
    from public_transit_data_platform_sql_nosql_spark.jobs.upsert import (
        delete_where_parquet_dir,
    )
    sink = str(tmp_path / "sink")
    _mkpart(spark, [(1, "old", 0), (2, "new", 1)]
            ).write.partitionBy("p").parquet(sink)
    # simulate crash between the two swap renames on p=0
    os.rename(os.path.join(sink, "p=0"),
              os.path.join(sink, "p=0._upsert_old"))
    st = delete_where_parquet_dir(spark, sink, "v = 'old'",
                                  partition_col="p")
    assert st["rows_deleted"] == 1
    assert _prows(spark, sink) == {(2, "new", 1)}


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    """Rows where the predicate is NULL are neither counted nor deleted
    (three-valued logic: only TRUE deletes)."""
    from public_transit_data_platform_sql_nosql_spark.jobs.upsert import (
        delete_where_parquet_dir,
    )
    sink = str(tmp_path / "sink")
    spark.createDataFrame([(1, None), (2, "old"), (3, "new")],
                          "k long, v string").write.parquet(sink)
    st = delete_where_parquet_dir(spark, sink, "v = 'old'")
    assert st["rows_deleted"] == 1
    assert _rows(spark, sink) == {(1, None), (3, "new")}


def test_delete_keys_scoped_to_stated_partition(spark, tmp_path):
    """A key deletes ONLY inside its stated partition — the same key's
    rows in other touched partitions survive."""
    from public_transit_data_platform_sql_nosql_spark.jobs.upsert import (
        delete_keys_parquet_dir,
    )
    sink = str(tmp_path / "sink")
    _mkpart(spark, [(1, "a", 0), (1, "b", 1), (2, "c", 1)]
            ).write.partitionBy("p").parquet(sink)
    keys = spark.createDataFrame([(1, 0), (2, 1)], "k long, p long")
    st = delete_keys_parquet_dir(spark, sink, keys, ["k"],
                                 partition_col="p")
    assert st["rows_deleted"] == 2
    # k=1 in p=1 was NOT in the key list's stated partitions -> kept
    assert _prows(spark, sink) == {(1, "b", 1)}


def test_partitioned_ops_reject_unsafe_partition_values(spark, tmp_path):
    """NULL / hive-escaped partition values raise eagerly instead of
    silently stranding rows in the swap loop."""
    from public_transit_data_platform_sql_nosql_spark.jobs.upsert import (
        delete_where_parquet_dir,
        upsert_parquet_dir,
    )
    sink = str(tmp_path / "sink")
    ok = spark.createDataFrame([(1, "a", "d1")], "k long, v string, p string")
    upsert_parquet_dir(spark, sink, ok, ["k"], partition_col="p")

    bad_null = spark.createDataFrame([(2, "b", None)],
                                     "k long, v string, p string")
    with pytest.raises(ValueError, match="unsupported p value"):
        upsert_parquet_dir(spark, sink, bad_null, ["k"], partition_col="p")
    bad_esc = spark.createDataFrame([(3, "c", "x=y/z")],
                                    "k long, v string, p string")
    with pytest.raises(ValueError, match="unsupported p value"):
        upsert_parquet_dir(spark, sink, bad_esc, ["k"], partition_col="p")
    # discovered values are validated too
    spark.createDataFrame([(9, "q", "a b")], "k long, v string, p string") \
        .write.mode("overwrite").partitionBy("p").parquet(
            str(tmp_path / "sink2"))
    with pytest.raises(ValueError, match="unsupported p value"):
        delete_where_parquet_dir(spark, str(tmp_path / "sink2"),
                                 "v = 'q'", partition_col="p")


def test_partitioned_ops_reject_reserved_suffix_values(spark, tmp_path):
    """Partition values ending in the reserved swap suffixes raise: a
    live 'p=x._upsert_old' directory would be indistinguishable from a
    stranded swap of 'p=x' and deleted by the recovery sweep."""
    from public_transit_data_platform_sql_nosql_spark.jobs.upsert import (
        upsert_parquet_dir,
    )
    sink = str(tmp_path / "sink")
    bad = spark.createDataFrame([(1, "a", "x._upsert_old")],
                                "k long, v string, p string")
    with pytest.raises(ValueError, match="reserved swap suffix"):
        upsert_parquet_dir(spark, sink, bad, ["k"], partition_col="p")
    bad2 = spark.createDataFrame([(1, "a", "x._upsert_tmp")],
                                 "k long, v string, p string")
    with pytest.raises(ValueError, match="reserved swap suffix"):
        upsert_parquet_dir(spark, sink, bad2, ["k"], partition_col="p")


def test_untouched_partition_strand_recovered_by_keyed_ops(spark, tmp_path):
    """A stranded swap in an UNTOUCHED partition is recovered by
    delete_keys / upsert before their partition-scoped read: without the
    global sweep the strand widens the partition column to string during
    discovery and hides its rows until that partition is next touched."""
    from public_transit_data_platform_sql_nosql_spark.jobs.upsert import (
        delete_keys_parquet_dir,
        upsert_parquet_dir,
    )
    sink = str(tmp_path / "sink")
    _mkpart(spark, [(1, "a", 0), (2, "b", 1), (3, "c", 2)]
            ).write.partitionBy("p").parquet(sink)
    # crash artifact on p=2; the op below only touches p=0
    os.rename(os.path.join(sink, "p=2"),
              os.path.join(sink, "p=2._upsert_old"))
    keys = spark.createDataFrame([(1, 0)], "k long, p long")
    st = delete_keys_parquet_dir(spark, sink, keys, ["k"],
                                 partition_col="p")
    assert st["rows_deleted"] == 1
    # p=2 recovered: its rows visible again, partition col still long
    assert _prows(spark, sink) == {(2, "b", 1), (3, "c", 2)}
    assert not os.path.exists(os.path.join(sink, "p=2._upsert_old"))

    # same for upsert: strand p=1, touch p=2
    os.rename(os.path.join(sink, "p=1"),
              os.path.join(sink, "p=1._upsert_old"))
    upsert_parquet_dir(spark, sink, _mkpart(spark, [(3, "C", 2)]),
                       ["k"], partition_col="p")
    assert _prows(spark, sink) == {(2, "b", 1), (3, "C", 2)}
    assert not os.path.exists(os.path.join(sink, "p=1._upsert_old"))

    # completed-swap-but-unfinished-cleanup artifact (live dir AND .old
    # both present) in an untouched partition: the sweep finishes the
    # cleanup instead of resurrecting the stale copy
    _mkpart(spark, [(9, "stale", 1)]).write.partitionBy("p").parquet(
        str(tmp_path / "stale"))
    os.rename(os.path.join(str(tmp_path / "stale"), "p=1"),
              os.path.join(sink, "p=1._upsert_old"))
    st = delete_keys_parquet_dir(
        spark, sink, spark.createDataFrame([(3, 2)], "k long, p long"),
        ["k"], partition_col="p")
    assert st["rows_deleted"] == 1
    assert _prows(spark, sink) == {(2, "b", 1)}
    assert not os.path.exists(os.path.join(sink, "p=1._upsert_old"))


def test_flat_sink_survives_full_deletion(spark, tmp_path):
    """Deleting EVERY row leaves a sink that later upserts and deletes
    still accept (the empty directory must read as a missing sink, not
    crash with UNABLE_TO_INFER_SCHEMA)."""
    from public_transit_data_platform_sql_nosql_spark.jobs.upsert import (
        delete_where_parquet_dir,
    )
    sink = str(tmp_path / "sink")
    _mkdf(spark, [(1, "a"), (2, "b")]).write.parquet(sink)
    st = delete_where_parquet_dir(spark, sink, "k >= 0")
    assert st["rows_deleted"] == 2
    # further mutations on the emptied sink work
    st = delete_where_parquet_dir(spark, sink, "k >= 0")
    assert st["rows_deleted"] == 0
    upsert_parquet_dir(spark, sink, _mkdf(spark, [(3, "c")]), ["k"])
    assert _rows(spark, sink) == {(3, "c")}


# SLOW TIER (pytest.ini): stored-index/tune/streaming/CLI e2e --
# excluded from the driver's default gate; run with -m slow after
# touching this family (see the verify skill).
pytestmark = pytest.mark.slow
