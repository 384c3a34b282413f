"""Round-11 vector-index hardening: per-query adaptive probe widening
on the BATCH filtered path, replay-idempotent streaming serving and
maintenance (exactly-once foreachBatch), orphan-dir crash recovery,
flat-layout compaction, the maintainer's compact hint, and the
train_fraction / nprobe argument guards the r10 ADVICE flagged."""

from __future__ import annotations

import shutil

import pytest

import __spark_entry__ as E
from public_transit_data_platform_sql_nosql_spark.jobs.versioned import (
    commit_version,
    list_versions,
    read_version,
)
from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (
    _index_manifest,
    _train_sample,
    compact_index,
    ivf_sq8_index_topk,
    ivf_sq8_index_topk_batch,
    ivf_sq8_index_upsert,
    pq_index_topk,
    pq_index_upsert,
    read_index_codes,
    sq8_index_topk,
    sq8_index_upsert,
    write_ivf_sq8_index,
    write_pq_index,
    write_sq8_index,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return E._emb(spark, SF_DIR)


def _qvec(emb, vid):
    return [float(x)
            for x in emb.filter(f"vec_id = {vid}").head()["embedding"]]


def test_train_fraction_range_validated_first(spark, emb):
    """A typo like 25 (meant 0.25) or 1.5 must raise, not silently
    train on the full corpus — the range check runs BEFORE the
    full-corpus fast path."""
    for bad in (25, 1.5, 0.0, -0.25):
        with pytest.raises(ValueError, match="train_fraction"):
            _train_sample(emb, bad)
    assert _train_sample(emb, 1.0) is emb          # fast path intact
    n = emb.count()
    assert 0 < _train_sample(emb, 0.5).count() < n


def test_filtered_widening_terminates_nprobe_zero(spark, emb, tmp_path):
    """nprobe <= 0 with allowed= must terminate (the doubling step is
    floored at +1), on both IVF layouts — and still fill k."""
    from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (  # noqa: E501
        ivf_index_topk,
        write_ivf_index,
    )

    allowed = emb.filter("vec_id % 3 = 0").select("vec_id")
    qvec = _qvec(emb, 1)

    path = str(tmp_path / "ivfsq8")
    write_ivf_sq8_index(emb, path)
    got = ivf_sq8_index_topk(spark, path, qvec, emb, k=5, nprobe=0,
                             allowed=allowed).collect()
    assert len(got) == 5
    assert all(r["neighbor_id"] % 3 == 0 for r in got)

    legacy = str(tmp_path / "ivf")
    write_ivf_index(emb.select("vec_id", "embedding"), legacy)
    got2 = ivf_index_topk(spark, legacy, qvec, k=5, nprobe=0,
                          allowed=allowed).collect()
    assert len(got2) == 5


def test_batch_filtered_widening_matches_single_query(spark, emb,
                                                      tmp_path):
    """The batch twin of the r10 starvation test: every allowed vector
    lives OUTSIDE the default probed clusters, so a fixed nprobe=1
    would starve the whole batch — per-query widening fills k for
    every query and reproduces the single-query path's rows exactly
    (identical widening sequence → identical candidate sets)."""
    path = str(tmp_path / "ivfsq8")
    write_ivf_sq8_index(emb, path)
    queries = emb.filter("vec_id < 3").select(
        emb.vec_id.alias("query_id"), "embedding")

    # clusters the UNFILTERED nprobe=1 probe would pick, per query
    codes = read_index_codes(spark, path)
    probed_set = set()
    for qid in range(3):
        ids = {r["neighbor_id"] for r in ivf_sq8_index_topk(
            spark, path, _qvec(emb, qid), emb, k=10, nprobe=1).collect()}
        probed_set |= {r["cluster_id"] for r in codes.filter(
            codes.vec_id.isin(*[int(i) for i in ids]))
            .select("cluster_id").distinct().collect()}
    allowed = (codes.filter(
        ~codes.cluster_id.isin(*[int(c) for c in probed_set]))
        .select("vec_id"))
    assert allowed.count() >= 5

    got = {}
    for r in ivf_sq8_index_topk_batch(spark, path, queries, emb, k=5,
                                      nprobe=1,
                                      allowed=allowed).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cos_sim"]))
    assert set(got) == {0, 1, 2}
    allowed_ids = {r["vec_id"] for r in allowed.collect()}
    for qid in range(3):
        assert len(got[qid]) == 5
        assert all(n in allowed_ids for _, n, _ in got[qid])
        single = sorted(
            (r["rank"], r["neighbor_id"], r["cos_sim"])
            for r in ivf_sq8_index_topk(
                spark, path, _qvec(emb, qid), emb, k=5, nprobe=1,
                allowed=allowed).collect())
        assert sorted(got[qid]) == single, qid


def _write_query_file(emb, lo, hi, dest):
    (emb.filter(f"vec_id >= {lo} AND vec_id < {hi}")
     .select(emb.vec_id.alias("query_id"), "embedding")
     .coalesce(1).write.parquet(dest))


def _query_stream(spark, src):
    return (spark.readStream
            .schema("query_id long, embedding array<float>")
            .option("maxFilesPerTrigger", "1")
            .parquet(f"{src}/*.parquet"))


def test_stream_vector_search_replay_idempotent(spark, emb, tmp_path):
    """The exactly-once guard: a replayed micro-batch (fresh checkpoint
    over the same source → batch_id 0 re-delivered) is skipped — the
    results store gains no version and no duplicate rows."""
    from public_transit_data_platform_sql_nosql_spark.streaming.jobs import (  # noqa: E501
        stream_vector_search,
    )

    idx = str(tmp_path / "idx")
    write_ivf_sq8_index(emb, idx)
    src = str(tmp_path / "src")
    _write_query_file(emb, 0, 2, f"{src}/a.parquet")
    results = str(tmp_path / "results")

    chk1 = str(tmp_path / "chk1")
    stream_vector_search(_query_stream(spark, src), idx, emb, results,
                         chk1, k=5, nprobe=2).awaitTermination()
    v0 = list_versions(spark, results)
    rows0 = sorted(map(tuple, read_version(spark, results).collect()))
    assert v0 and rows0

    # simulate the crash-after-commit replay: same source, batch_id 0
    # again (a wiped checkpoint restarts batch numbering)
    chk2 = str(tmp_path / "chk2")
    stream_vector_search(_query_stream(spark, src), idx, emb, results,
                         chk2, k=5, nprobe=2).awaitTermination()
    assert list_versions(spark, results) == v0
    assert sorted(map(tuple,
                      read_version(spark, results).collect())) == rows0


def test_stream_upsert_replay_idempotent(spark, emb, tmp_path):
    """Replay of an already-recorded maintenance batch is skipped: the
    decisions store keeps ONE row and the index gains no version."""
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.streaming.jobs import (  # noqa: E501
        stream_vector_index_upsert,
    )

    idx = str(tmp_path / "idx")
    write_ivf_sq8_index(emb.filter("vec_id >= 10")
                        .select("vec_id", "embedding"), idx)
    src = str(tmp_path / "src")
    (emb.filter("vec_id < 4")
     .select((F.col("vec_id") + 50_000).alias("vec_id"), "embedding")
     .coalesce(1).write.parquet(f"{src}/a.parquet"))

    def _stream():
        return (spark.readStream
                .schema("vec_id long, embedding array<float>")
                .parquet(f"{src}/*.parquet"))

    stream_vector_index_upsert(
        _stream(), idx, str(tmp_path / "chk1")).awaitTermination()
    iv = list_versions(spark, idx)
    dec0 = read_version(spark, f"{idx}/_state/decisions").collect()
    assert [d["decision"] for d in dec0] == ["appended"]
    n0 = read_index_codes(spark, idx).count()

    stream_vector_index_upsert(
        _stream(), idx, str(tmp_path / "chk2")).awaitTermination()
    assert list_versions(spark, idx) == iv
    assert read_index_codes(spark, idx).count() == n0
    dec1 = read_version(spark, f"{idx}/_state/decisions").collect()
    assert [d["decision"] for d in dec1] == ["appended"]


def test_commit_version_reclaims_orphan_dir(spark, tmp_path):
    """A crash between the data write and the manifest rename leaves an
    orphan data/v<N> dir; the next commit at that version reclaims it
    instead of wedging on the mode('error') write."""
    store = str(tmp_path / "store")
    commit_version(spark.range(3).toDF("n"), store)
    # orphan from a crashed second commit (manifest never landed)
    spark.range(100, 103).toDF("n").write.parquet(
        f"{store}/data/v000001")
    assert list_versions(spark, store) == [0]

    commit_version(spark.range(10, 13).toDF("n"), store, mode="append")
    assert list_versions(spark, store) == [0, 1]
    got = sorted(r["n"] for r in read_version(spark, store).collect())
    assert got == [0, 1, 2, 10, 11, 12]    # orphan rows are GONE


def test_index_upsert_reclaims_orphan_dir(spark, emb, tmp_path):
    """Same crash protocol for the index writers: an orphan data/v<N>
    from a torn upsert is reclaimed by the replayed upsert."""
    from pyspark.sql import functions as F

    path = str(tmp_path / "sq8")
    base = emb.filter("vec_id >= 10").select("vec_id", "embedding")
    write_sq8_index(base, path)
    # torn previous upsert: codes landed, manifest did not
    spark.range(5).select(
        F.col("id").alias("vec_id"),
        F.lit(b"junk").alias("codes")).write.parquet(
        f"{path}/data/v000001/codes")

    batch = emb.filter("vec_id < 3").select(
        (F.col("vec_id") + 70_000).alias("vec_id"), "embedding")
    st = sq8_index_upsert(spark, path, batch)
    assert st["decision"] == "appended" and st["n_new"] == 3
    codes = read_index_codes(spark, path)
    assert codes.count() == base.count() + 3
    assert codes.filter("vec_id >= 70000").count() == 3
    assert codes.filter("vec_id < 10").count() == 0   # no junk rows


def _fragment(spark, emb, path, upsert, n_batches=2):
    from pyspark.sql import functions as F

    for i in range(n_batches):
        batch = emb.filter(f"vec_id >= {10 + 3 * i} "
                           f"AND vec_id < {13 + 3 * i}").select(
            (F.col("vec_id") + 50_000 + i * 1000).alias("vec_id"),
            "embedding")
        assert upsert(spark, path, batch)["decision"] == "appended"


def test_compact_flat_sq8(spark, emb, tmp_path):
    """compact_index's flat branch (the r10 untested else-arm): an
    append-fragmented sq8 index folds to ONE dir with identical
    content, stays servable, and a single-dir manifest is a noop."""
    base = emb.filter("vec_id >= 10").select("vec_id", "embedding")
    path = str(tmp_path / "sq8")
    write_sq8_index(base, path)
    _fragment(spark, emb, path, sq8_index_upsert)
    m0 = _index_manifest(spark, path)
    assert m0["kind"] == "sq8" and len(m0["codes"]) == 3
    before = sorted(map(tuple, read_index_codes(spark, path)
                        .select("vec_id", "codes").collect()))

    st = compact_index(spark, path)
    assert st["decision"] == "compacted" and st["dirs_before"] == 3
    m1 = _index_manifest(spark, path)
    assert m1["kind"] == "sq8" and len(m1["codes"]) == 1
    assert m1["quantizer"] == m0["quantizer"]
    after = sorted(map(tuple, read_index_codes(spark, path)
                       .select("vec_id", "codes").collect()))
    assert after == before
    assert compact_index(spark, path)["decision"] == "noop"

    from pyspark.sql import functions as F

    qvec = _qvec(emb, 10)
    b0 = emb.filter("vec_id >= 10 AND vec_id < 13").select(
        (F.col("vec_id") + 50_000).alias("vec_id"), "embedding")
    b1 = emb.filter("vec_id >= 13 AND vec_id < 16").select(
        (F.col("vec_id") + 51_000).alias("vec_id"), "embedding")
    vectors = base.unionByName(b0).unionByName(b1)
    top = sorted(sq8_index_topk(spark, path, qvec, vectors,
                                k=3).collect(), key=lambda r: r["rank"])
    assert top[0]["cos_sim"] == 1.0


def test_compact_flat_pq(spark, emb, tmp_path):
    base = emb.filter("vec_id >= 10").select("vec_id", "embedding")
    path = str(tmp_path / "pq")
    write_pq_index(base, path)
    _fragment(spark, emb, path, pq_index_upsert)
    m0 = _index_manifest(spark, path)
    assert m0["kind"] == "pq" and len(m0["codes"]) == 3
    before = sorted(map(tuple, read_index_codes(spark, path)
                        .select("vec_id", "codes").collect()))

    st = compact_index(spark, path)
    assert st["decision"] == "compacted" and st["dirs_before"] == 3
    m1 = _index_manifest(spark, path)
    assert m1["kind"] == "pq" and len(m1["codes"]) == 1
    assert m1["codebooks"] == m0["codebooks"]
    after = sorted(map(tuple, read_index_codes(spark, path)
                       .select("vec_id", "codes").collect()))
    assert after == before
    assert compact_index(spark, path)["decision"] == "noop"
    # still serves
    got = pq_index_topk(spark, path, _qvec(emb, 10), base, k=3)
    assert got.count() == 3


def test_stream_vector_search_picks_up_maintenance(spark, emb,
                                                   tmp_path):
    """The per-batch manifest re-resolution claim, interleaved: batch 1
    serves against the initial snapshot; an ivf_sq8 upsert AND a
    compaction land; batch 2 (same checkpoint — the next micro-batch
    boundary) serves the upserted vectors from the compacted
    manifest."""
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.streaming.jobs import (  # noqa: E501
        stream_vector_search,
    )

    idx = str(tmp_path / "idx")
    base = emb.select("vec_id", "embedding")
    write_ivf_sq8_index(base, idx)
    src = str(tmp_path / "src")
    _write_query_file(emb, 0, 2, f"{src}/a.parquet")
    results = str(tmp_path / "results")
    chk = str(tmp_path / "chk")

    stream_vector_search(_query_stream(spark, src), idx, emb, results,
                         chk, k=3, nprobe=2).awaitTermination()
    served0 = {r["query_id"]
               for r in read_version(spark, results).collect()}
    assert served0 == {0, 1}

    # maintenance between micro-batch boundaries: upsert + compact
    batch = emb.filter("vec_id < 4").select(
        (F.col("vec_id") + 50_000).alias("vec_id"), "embedding")
    assert ivf_sq8_index_upsert(spark, idx, batch)["decision"] \
        == "appended"
    assert compact_index(spark, idx)["decision"] == "compacted"
    vectors = base.unionByName(batch)

    # batch 2: queries whose exact twins exist ONLY in the upsert
    (batch.limit(2)
     .select(F.col("vec_id").alias("query_id"), "embedding")
     .coalesce(1).write.parquet(f"{src}/b.parquet"))
    stream_vector_search(_query_stream(spark, src), idx, vectors,
                         results, chk, k=3, nprobe=2).awaitTermination()

    rows = read_version(spark, results).collect()
    new_served = {r["query_id"] for r in rows} - served0
    assert len(new_served) == 2 and all(q >= 50_000 for q in new_served)
    for qid in new_served:
        top = sorted((r for r in rows if r["query_id"] == qid),
                     key=lambda r: r["rank"])
        # the upserted twin is served at cos 1.0 (rank 1 or tied with
        # its original — both at 1.0)
        assert top[0]["cos_sim"] == 1.0
        assert qid in {t["neighbor_id"] for t in top if
                       t["cos_sim"] == 1.0}


def test_stream_upsert_emits_compact_hint(spark, emb, tmp_path):
    """Once the post-upsert manifest crosses the dir threshold, the
    maintainer appends a `compact` decision row carrying the dir count
    — the ops signal that closes the fragmentation loop."""
    from pyspark.sql import functions as F

    idx = str(tmp_path / "idx")
    write_ivf_sq8_index(emb.filter("vec_id >= 10")
                        .select("vec_id", "embedding"), idx)
    src = str(tmp_path / "src")
    (emb.filter("vec_id < 3")
     .select((F.col("vec_id") + 50_000).alias("vec_id"), "embedding")
     .coalesce(1).write.parquet(f"{src}/a.parquet"))

    from public_transit_data_platform_sql_nosql_spark.streaming.jobs import (  # noqa: E501
        stream_vector_index_upsert,
    )

    stream = (spark.readStream
              .schema("vec_id long, embedding array<float>")
              .parquet(f"{src}/*.parquet"))
    stream_vector_index_upsert(stream, idx, str(tmp_path / "chk"),
                               compact_hint_dirs=2).awaitTermination()
    dec = sorted(read_version(spark, f"{idx}/_state/decisions")
                 .collect(), key=lambda r: r["decision"])
    assert [d["decision"] for d in dec] == ["appended", "compact"]
    hint = dec[1]
    assert hint["n_new"] == 2          # the manifest's codes-dir count
    # acting on the hint compacts back to one dir
    assert compact_index(spark, idx)["decision"] == "compacted"
    assert len(_index_manifest(spark, idx)["codes"]) == 1


def test_checkpoint_resume_skips_served_batches(spark, emb, tmp_path):
    """Sanity: resuming with the SAME checkpoint re-serves nothing
    (source offsets) — together with the replay guard, the results
    store holds exactly one copy of every batch under any crash
    topology."""
    from public_transit_data_platform_sql_nosql_spark.streaming.jobs import (  # noqa: E501
        stream_vector_search,
    )

    idx = str(tmp_path / "idx")
    write_ivf_sq8_index(emb, idx)
    src = str(tmp_path / "src")
    _write_query_file(emb, 0, 2, f"{src}/a.parquet")
    results = str(tmp_path / "results")
    chk = str(tmp_path / "chk")
    stream_vector_search(_query_stream(spark, src), idx, emb, results,
                         chk, k=3).awaitTermination()
    v0 = list_versions(spark, results)
    stream_vector_search(_query_stream(spark, src), idx, emb, results,
                         chk, k=3).awaitTermination()
    assert list_versions(spark, results) == v0


def test_wiped_results_store_reserves(spark, emb, tmp_path):
    """The guard keys on the RESULTS store, not wall-clock state: if
    the store is wiped but the checkpoint survives, nothing re-serves
    (offsets); if both are wiped, the batch re-serves cleanly."""
    from public_transit_data_platform_sql_nosql_spark.streaming.jobs import (  # noqa: E501
        stream_vector_search,
    )

    idx = str(tmp_path / "idx")
    write_ivf_sq8_index(emb, idx)
    src = str(tmp_path / "src")
    _write_query_file(emb, 0, 2, f"{src}/a.parquet")
    results = str(tmp_path / "results")
    stream_vector_search(_query_stream(spark, src), idx, emb, results,
                         str(tmp_path / "chk1"), k=3).awaitTermination()
    rows0 = sorted(map(tuple, read_version(spark, results).collect()))
    shutil.rmtree(results)
    stream_vector_search(_query_stream(spark, src), idx, emb, results,
                         str(tmp_path / "chk2"), k=3).awaitTermination()
    assert sorted(map(tuple,
                      read_version(spark, results).collect())) == rows0


def test_cli_vector_pipeline_end_to_end(spark, tmp_path, capsys):
    """The one-command serving demo: JSONL in (with a corrupt line and
    an exact duplicate) -> quarantine + dedup + hash embeddings +
    ivf_sq8 index + batch ANN results on disk; every query's rank-1
    neighbor is itself at cos 1.0."""
    import json as _json

    from public_transit_data_platform_sql_nosql_spark.__main__ import (
        main,
    )

    src = tmp_path / "in.jsonl"
    lines = [
        _json.dumps({"doc_id": i, "text": t, "lang": "en",
                     "source": "s0", "n_chars": len(t)})
        for i, t in enumerate(
            ["spark batch window merge", "filter scan join order",
             "vector table stream hash", "group agg sort key value",
             "filter scan join order",          # exact dup of doc 1
             "broadcast shuffle skew plan"])
    ]
    lines.insert(3, "{not json at all")          # quarantined
    src.write_text("\n".join(lines) + "\n")

    wd = str(tmp_path / "wd")
    # --nprobe 8 probes every cluster: at 5 docs each k-means cluster
    # holds ~1 vector, so the default nprobe=2 would (correctly) serve
    # fewer than k
    assert main(["vector-pipeline", "--docs", str(src),
                 "--workdir", wd, "--k", "3", "--n-queries", "2",
                 "--nprobe", "8"]) == 0
    st = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["n_quarantined"] == 1
    assert st["n_docs"] == 5                     # 6 clean - 1 exact dup
    assert st["n_queries"] == 2 and st["n_results"] == 6

    docs = spark.read.parquet(f"{wd}/docs")
    assert docs.count() == 5
    assert docs.filter("doc_id = 4").count() == 0    # the dup dropped
    res = spark.read.parquet(f"{wd}/results").collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == {0, 1}
    for qid, rows in by_q.items():
        top = min(rows, key=lambda r: r["rank"])
        assert top["neighbor_id"] == qid and top["cos_sim"] == 1.0


def test_stream_upsert_auto_compact(spark, emb, tmp_path):
    """auto_compact=True: the maintainer acts on its own hint inside
    the micro-batch — the manifest folds back to one codes dir, a
    `compacted` decision row is recorded, and content survives."""
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.streaming.jobs import (  # noqa: E501
        stream_vector_index_upsert,
    )

    idx = str(tmp_path / "idx")
    base = emb.filter("vec_id >= 10").select("vec_id", "embedding")
    write_ivf_sq8_index(base, idx)
    src = str(tmp_path / "src")
    (emb.filter("vec_id < 3")
     .select((F.col("vec_id") + 50_000).alias("vec_id"), "embedding")
     .coalesce(1).write.parquet(f"{src}/a.parquet"))

    stream = (spark.readStream
              .schema("vec_id long, embedding array<float>")
              .parquet(f"{src}/*.parquet"))
    stream_vector_index_upsert(stream, idx, str(tmp_path / "chk"),
                               compact_hint_dirs=2,
                               auto_compact=True).awaitTermination()

    m = _index_manifest(spark, idx)
    assert m["kind"] == "ivf_sq8" and len(m["codes"]) == 1
    dec = sorted(read_version(spark, f"{idx}/_state/decisions")
                 .collect(), key=lambda r: r["decision"])
    assert [d["decision"] for d in dec] == ["appended", "compacted"]
    codes = read_index_codes(spark, idx)
    assert codes.count() == base.count() + 3
    assert codes.filter("vec_id >= 50000").count() == 3


def test_hash_embeddings_properties(spark):
    """The corpus->vector bridge: unit norm (or exact zero), bit-level
    determinism, fixed dim, and a SHUFFLE-FREE plan (one codegen'd
    projection — no Exchange anywhere)."""
    import math

    from public_transit_data_platform_sql_nosql_spark.pipeline.text import (
        hash_embeddings,
    )
    from public_transit_data_platform_sql_nosql_spark.plans import (
        executed_plan,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    e = hash_embeddings(docs, dim=32)
    plan = executed_plan(e)
    assert "Exchange" not in plan            # narrow projection only

    rows = e.collect()
    assert all(len(r["embedding"]) == 32 for r in rows)
    for r in rows[:50]:
        n = math.sqrt(sum(x * x for x in r["embedding"]))
        assert n == 0.0 or abs(n - 1.0) < 1e-6
    # determinism: a second evaluation is bit-identical
    again = {r["vec_id"]: list(r["embedding"])
             for r in hash_embeddings(docs, dim=32).collect()}
    assert all(list(r["embedding"]) == again[r["vec_id"]] for r in rows)


def test_cli_vector_pipeline_tune_step(spark, tmp_path, capsys):
    """--target-recall closes the loop inside the one-command demo:
    the build is followed by tune_index, the committed default_nprobe
    serves the results pass (no explicit --nprobe), and the status
    line carries the tune decision."""
    import json as _json

    from public_transit_data_platform_sql_nosql_spark.__main__ import (
        main,
    )
    from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (  # noqa: E501
        _index_manifest,
    )

    src = tmp_path / "in.jsonl"
    src.write_text("\n".join(
        _json.dumps({"doc_id": i, "text": t, "lang": "en",
                     "source": "s0", "n_chars": len(t)})
        for i, t in enumerate(
            ["spark batch window merge", "filter scan join order",
             "vector table stream hash", "group agg sort key value",
             "broadcast shuffle skew plan"])) + "\n")

    wd = str(tmp_path / "wd")
    # target 1 permille is met at the smallest measured depth, so the
    # tune outcome is deterministic: nprobe=1 commits (or noop if 1
    # were already the default — it is not; DEFAULT_NPROBE is 2)
    assert main(["vector-pipeline", "--docs", str(src),
                 "--workdir", wd, "--k", "2", "--n-queries", "1",
                 "--target-recall", "1"]) == 0
    st = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["tune"]["decision"] == "tuned"
    assert st["tune"]["nprobe"] == 1
    assert "curve" not in st["tune"]            # status line stays slim
    assert _index_manifest(spark, f"{wd}/index")["default_nprobe"] == 1
    assert st["n_results"] >= 1


# SLOW TIER (pytest.ini): stored-index/tune/streaming/CLI e2e --
# excluded from the driver's default gate; run with -m slow after
# touching this family (see the verify skill).
pytestmark = pytest.mark.slow
