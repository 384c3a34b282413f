"""Incremental MinHash dedup index: build -> batch dedup -> append loop,
keep-first semantics, bucket-pruned stored reads, and index growth."""

from __future__ import annotations

import pytest

from public_transit_data_platform_sql_nosql_spark.pipeline.incremental import (
    incremental_dedup,
    write_signature_index,
)
from public_transit_data_platform_sql_nosql_spark.plans import executed_plan


BASE = [
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "spark shuffles partition data across the cluster every stage"),
    (3, "completely different content about transit schedules and stops"),
]


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture()
def index(spark, tmp_path):
    path = str(tmp_path / "minhash_index")
    write_signature_index(docs_df(spark, BASE), path)
    return path


def test_near_dup_of_indexed_doc_dropped(spark, index):
    batch = [
        # near-dup of doc 1 (marker suffix, same shingle mass)
        (10, BASE[0][1] + " marker"),
        # novel
        (11, "unrelated brand new text with its own vocabulary entirely"),
    ]
    r = incremental_dedup(spark, index, docs_df(spark, batch), append=False)
    assert r["n_new"] == 2
    assert r["n_dup_vs_index"] == 1
    assert r["n_dup_in_batch"] == 0
    assert {x.doc_id for x in r["kept"].collect()} == {11}


def test_in_batch_keep_first(spark, index):
    t = "some fresh sentence that no indexed document resembles at all"
    batch = [(20, t), (21, t + " suffix"), (22, "another novel thing here")]
    r = incremental_dedup(spark, index, docs_df(spark, batch), append=False)
    # 21 defers to 20 (smaller doc_id); 20 and 22 survive
    assert r["n_dup_in_batch"] == 1
    assert {x.doc_id for x in r["kept"].collect()} == {20, 22}


def test_append_makes_next_batch_see_survivors(spark, index):
    t = "brand new corpus material for the appended generation test"
    r1 = incremental_dedup(spark, index, docs_df(spark, [(30, t)]))
    assert r1["n_kept"] == 1
    # the SAME text again in a later batch must now hit the index
    r2 = incremental_dedup(spark, index, docs_df(spark, [(40, t)]),
                           append=False)
    assert r2["n_dup_vs_index"] == 1 and r2["n_kept"] == 0


def test_dropped_docs_not_appended(spark, index):
    r = incremental_dedup(
        spark, index, docs_df(spark, [(50, BASE[0][1] + " marker")]))
    assert r["n_kept"] == 0
    # re-running the same batch: doc still drops against the ORIGINAL,
    # and the index did not grow a rejected signature
    minh = spark.read.parquet(f"{index}/_minhashes")
    assert minh.filter("doc_id = 50").count() == 0


def test_stored_read_is_bucket_pruned(spark, index):
    # single-doc batch -> at most 4 (band, bucket) dirs of the stored
    # sigs can be read; the partition filter must appear in the scan
    batch = docs_df(spark, [(60, "tiny probe batch for plan check")])
    from public_transit_data_platform_sql_nosql_spark.pipeline.incremental import (  # noqa: E501
        _banded,
        minhash_signatures,
    )

    touched = (_banded(minhash_signatures(batch))
               .select("band", "bucket").distinct().collect())
    import pyspark.sql.functions as F

    bands = sorted({r["band"] for r in touched})
    buckets = sorted({r["bucket"] for r in touched})
    stored = (
        spark.read.parquet(f"{index}/sigs")
        .filter(F.col("band").isin(bands) & F.col("bucket").isin(buckets))
    )
    plan = executed_plan(stored)
    assert "PartitionFilters: [" in plan
    assert "bucket" in plan.split("PartitionFilters")[1][:200]


def test_threshold_validation(spark, index):
    with pytest.raises(ValueError):
        incremental_dedup(spark, index, docs_df(spark, [(70, "x")]),
                          threshold=0.0)


def test_stream_incremental_dedup_loop(spark, tmp_path, index):
    """Streaming sink: batch 2's near-dup of a batch-1 SURVIVOR must be
    suppressed (proving survivors' signatures became visible), dups vs
    the pre-built index suppressed, sink = union of survivors."""
    import time

    from public_transit_data_platform_sql_nosql_spark.streaming.jobs import (
        stream_incremental_dedup,
    )

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ck = str(tmp_path / "ck")
    b1 = [(100, "totally novel streaming text number one for the test"),
          (101, BASE[0][1] + " marker")]          # near-dup of indexed 1
    b2 = [(200, b1[0][1] + " suffix"),            # near-dup of survivor 100
          (201, "another novel streaming document with fresh words")]
    docs_df(spark, b1).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    docs_df(spark, b2).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream
        .schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = stream_incremental_dedup(stream, index, sink, ck)
    q.awaitTermination(120)
    kept = {r.doc_id for r in spark.read.parquet(sink).collect()}
    assert kept == {100, 201}


def test_missing_index_raises_clear_error(spark, tmp_path):
    with pytest.raises(ValueError, match="no signature index"):
        incremental_dedup(spark, str(tmp_path / "nope"),
                          docs_df(spark, [(1, "x")]))


def test_corpus_diff_statuses(spark):
    from public_transit_data_platform_sql_nosql_spark.pipeline.incremental import (  # noqa: E501
        corpus_diff,
        corpus_diff_summary,
    )

    old = docs_df(spark, [(1, "a"), (2, "b"), (3, "c")])
    new = docs_df(spark, [(1, "a"), (2, "B2"), (4, "d")])
    got = {r.doc_id: r.status for r in corpus_diff(old, new).collect()}
    assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
    summary = {r.status: r.n_docs
               for r in corpus_diff_summary(old, new).collect()}
    assert summary == {"unchanged": 1, "changed": 1, "removed": 1,
                       "added": 1}


def test_index_compaction_preserves_dedup(spark, tmp_path, index):
    """The append loop accrues one file per batch per touched bucket;
    jobs/compact must rewrite the partitioned sigs store (preserving
    the band/bucket hive layout) without changing dedup decisions."""
    from public_transit_data_platform_sql_nosql_spark.jobs.compact import (
        compact_parquet_dir,
    )

    for i, txt in enumerate([
        "first appended batch with its own fresh words",
        "second appended batch saying different things",
        "third appended batch about another topic entirely",
    ]):
        r = incremental_dedup(spark, index, docs_df(spark, [(300 + i, txt)]))
        assert r["n_kept"] == 1
    # _minhashes is flat: 1 build file + 3 appended -> a real rewrite
    mstats = compact_parquet_dir(spark, f"{index}/_minhashes",
                                 target_file_bytes=128 * 1024 * 1024)
    assert mstats["compacted"] is True
    assert mstats["files_after"] < mstats["files_before"]
    # sigs is hive-partitioned; single-doc batches often land in fresh
    # one-file dirs, so this may correctly no-op — run it either way and
    # assert the layout + decisions survive
    compact_parquet_dir(spark, f"{index}/sigs",
                        target_file_bytes=128 * 1024 * 1024)
    # layout preserved: hive dirs still prune
    import pyspark.sql.functions as F

    sigs = spark.read.parquet(f"{index}/sigs")
    assert {"band", "bucket"} <= set(sigs.columns)
    # dedup still works against the compacted index: repeats drop, and
    # the appended batches are still visible
    r = incremental_dedup(
        spark, index,
        docs_df(spark, [(400, "first appended batch with its own fresh "
                              "words")]),
        append=False)
    assert r["n_dup_vs_index"] == 1
    base_dup = incremental_dedup(
        spark, index, docs_df(spark, [(401, BASE[0][1] + " marker")]),
        append=False)
    assert base_dup["n_dup_vs_index"] == 1


def test_corpus_diff_null_text_is_presence_not_hash(spark):
    """A doc PRESENT in both snapshots with NULL text on one side is
    'changed' (presence decided by doc_id, not md5 nullness); NULL on
    both sides is 'unchanged'."""
    from public_transit_data_platform_sql_nosql_spark.pipeline.incremental import (  # noqa: E501
        corpus_diff,
    )

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "x"), (4, "gone")],
        "doc_id long, text string")
    new = spark.createDataFrame(
        [(1, "now-set"), (2, None), (3, "x"), (5, "fresh")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["status"]
           for r in corpus_diff(old, new).collect()}
    assert got == {1: "changed", 2: "unchanged", 3: "unchanged",
                   4: "removed", 5: "added"}


# SLOW TIER (pytest.ini): stored-index/tune/streaming/CLI e2e --
# excluded from the driver's default gate; run with -m slow after
# touching this family (see the verify skill).
pytestmark = pytest.mark.slow
