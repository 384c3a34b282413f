"""Round-10 vector-index hardening: kind-true upserts (the ivf_sq8
corruption hole), manifest-resolved dim, filtered ANN on the composed
layout with adaptive probe widening, vacuum retention floor, and the
maintain_pq_index primary-store contract."""

from __future__ import annotations

import json

import pytest

import __spark_entry__ as E
from public_transit_data_platform_sql_nosql_spark.jobs.versioned import (
    list_versions,
)
from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (
    _index_manifest,
    ivf_sq8_index_topk,
    ivf_sq8_index_upsert,
    pq_index_upsert,
    read_index_codes,
    sq8_index_topk,
    sq8_index_upsert,
    vacuum_index,
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


def test_ivf_sq8_upsert_appends_partitioned_and_serves(spark, emb,
                                                       tmp_path):
    """The kind-true ivf_sq8 upsert: an all-new batch is assigned
    against the STORED centroids and appended as a cluster-partitioned
    codes dir; the manifest keeps kind/centroids/quantizer; probed
    reads still partition-prune; the upserted vectors are served."""
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.plans import (
        executed_plan,
    )

    base = emb.filter("vec_id >= 10").select("vec_id", "embedding")
    path = str(tmp_path / "ivfsq8")
    write_ivf_sq8_index(base, path)
    n0 = read_index_codes(spark, path).count()

    batch = emb.filter("vec_id >= 10 AND vec_id < 18").select(
        (F.col("vec_id") + 50_000).alias("vec_id"), "embedding")
    st = ivf_sq8_index_upsert(spark, path, batch)
    assert st["decision"] == "appended" and st["n_new"] == 8
    assert st["n_replaced"] == 0 and st["drifted_dims"] == []

    m = _index_manifest(spark, path)
    assert m["kind"] == "ivf_sq8"
    assert "centroids" in m and "quantizer" in m
    assert len(m["codes"]) == 2            # original dir + appended dir

    codes = read_index_codes(spark, path)
    assert codes.count() == n0 + 8
    # the appended dir is cluster-partitioned: every row has cluster_id
    assert "cluster_id" in codes.columns
    assert codes.filter("cluster_id IS NULL").count() == 0

    # probed serving still partition-prunes across BOTH referenced dirs
    qvec = _qvec(emb, 10)
    plan = executed_plan(
        ivf_sq8_index_topk(spark, path, qvec, emb, k=3, nprobe=1))
    assert "PartitionFilters" in plan

    # the upserted copy of vec 10 is served at cos_sim 1.0
    vectors = base.unionByName(batch)
    top = sorted(
        ivf_sq8_index_topk(spark, path, qvec, vectors, k=3).collect(),
        key=lambda r: r["rank"])
    assert {top[0]["neighbor_id"], top[1]["neighbor_id"]} \
        == {10, 50_010}
    assert top[0]["cos_sim"] == top[1]["cos_sim"] == 1.0


def test_ivf_sq8_upsert_replace_and_drift(spark, emb, tmp_path):
    """Re-submitted vec_ids are keyed-replaced into ONE fresh
    partitioned dir; a drifted batch writes nothing and the previous
    version stays fully readable."""
    from pyspark.sql import functions as F

    base = emb.filter("vec_id >= 10").select("vec_id", "embedding")
    path = str(tmp_path / "ivfsq8")
    write_ivf_sq8_index(base, path)
    n0 = read_index_codes(spark, path).count()

    # vec 20 re-submitted carrying vec 21's embedding
    batch = emb.filter("vec_id = 21").select(
        F.lit(20).cast("long").alias("vec_id"), "embedding")
    st = ivf_sq8_index_upsert(spark, path, batch)
    assert st["decision"] == "replaced" and st["n_replaced"] == 1
    m = _index_manifest(spark, path)
    assert m["kind"] == "ivf_sq8" and len(m["codes"]) == 1
    codes = read_index_codes(spark, path)
    assert codes.count() == n0
    assert codes.filter("vec_id = 20").count() == 1

    # replacement is servable: vec 20 answers for vec 21's vector
    vectors = base.filter("vec_id != 20").unionByName(batch)
    qvec = _qvec(emb, 21)
    top = sorted(
        ivf_sq8_index_topk(spark, path, qvec, vectors, k=2).collect(),
        key=lambda r: r["rank"])
    assert 20 in {t["neighbor_id"] for t in top}

    # 100x-scaled batch: rebuild decision, nothing written
    wild = emb.filter("vec_id < 2").select(
        (F.col("vec_id") + 90_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(100.0))
        .alias("embedding"))
    v_before = list_versions(spark, path)
    st2 = ivf_sq8_index_upsert(spark, path, wild)
    assert st2["decision"] == "rebuild" and st2["drifted_dims"]
    assert list_versions(spark, path) == v_before


def test_upsert_kind_guards_refuse_foreign_layouts(spark, emb,
                                                   tmp_path):
    """Every maintainer refuses a foreign kind with NOTHING written —
    the r9 hole where sq8_index_upsert silently committed a kind-"sq8"
    manifest (dropping centroids) over an ivf_sq8 index is closed."""
    from pyspark.sql import functions as F

    base = emb.filter("vec_id >= 10").select("vec_id", "embedding")
    ivf = str(tmp_path / "ivfsq8")
    write_ivf_sq8_index(base, ivf)
    flat = str(tmp_path / "sq8")
    write_sq8_index(base, flat)

    batch = emb.filter("vec_id < 3").select(
        (F.col("vec_id") + 70_000).alias("vec_id"), "embedding")

    st = sq8_index_upsert(spark, ivf, batch)
    assert st == {"decision": "wrong_kind", "kind": "ivf_sq8",
                  "expected": "sq8"}
    m = _index_manifest(spark, ivf)
    assert m["kind"] == "ivf_sq8" and "centroids" in m
    assert len(list_versions(spark, ivf)) == 1   # nothing committed

    assert pq_index_upsert(spark, ivf, batch)["decision"] \
        == "wrong_kind"
    assert ivf_sq8_index_upsert(spark, flat, batch)["decision"] \
        == "wrong_kind"
    assert pq_index_upsert(spark, flat, batch)["decision"] \
        == "wrong_kind"
    assert len(list_versions(spark, flat)) == 1


def test_cli_upsert_dispatches_ivf_sq8(spark, emb, tmp_path, capsys):
    """The CLI ops loop is kind-true end to end: upsert into an
    ivf_sq8 index routes to the partition-aware maintainer, keeps the
    manifest kind, and the upserted vector serves through the CLI
    query path."""
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.__main__ import (
        main,
    )

    emb_path = str(tmp_path / "emb")
    emb.select("vec_id", "embedding").write.parquet(emb_path)
    idx = str(tmp_path / "ivf")
    assert main(["vector-index", "build", "--path", idx,
                 "--emb", emb_path, "--ivf"]) == 0
    capsys.readouterr()

    batch_path = str(tmp_path / "batch")
    (emb.limit(4)
     .select((F.col("vec_id") + 10_000).alias("vec_id"), "embedding")
     .write.parquet(batch_path))
    assert main(["vector-index", "upsert", "--path", idx,
                 "--batch", batch_path]) == 0
    up = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert up["kind"] == "ivf_sq8"
    assert up["decision"] == "appended" and up["n_new"] == 4

    m = _index_manifest(spark, idx)
    assert m["kind"] == "ivf_sq8" and "centroids" in m

    assert main(["vector-index", "query", "--path", idx,
                 "--emb", emb_path, "--vec-id", "0", "--k", "3"]) == 0
    q = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert q["kind"] == "ivf_sq8" and len(q["topk"]) == 3


def test_streaming_upsert_dispatches_ivf_sq8(spark, emb, tmp_path):
    """The streaming maintainer routes an ivf_sq8 index to the
    kind-true upsert: the manifest keeps kind + centroids, the batch
    lands cluster-partitioned, and the decision row is recorded."""
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.jobs.versioned import (  # noqa: E501
        read_version,
    )
    from public_transit_data_platform_sql_nosql_spark.streaming.jobs import (  # noqa: E501
        stream_vector_index_upsert,
    )

    base = emb.filter("vec_id >= 10").select("vec_id", "embedding")
    idx = str(tmp_path / "idx")
    write_ivf_sq8_index(base, idx)
    n0 = read_index_codes(spark, idx).count()

    src = str(tmp_path / "src")
    (emb.filter("vec_id >= 10 AND vec_id < 15")
     .select((F.col("vec_id") + 50_000).alias("vec_id"), "embedding")
     .coalesce(1).write.parquet(f"{src}/a.parquet"))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>")
        .parquet(f"{src}/*.parquet")
    )
    q = stream_vector_index_upsert(stream, idx, str(tmp_path / "chk"))
    q.awaitTermination()

    m = _index_manifest(spark, idx)
    assert m["kind"] == "ivf_sq8" and "centroids" in m
    codes = read_index_codes(spark, idx)
    assert codes.count() == n0 + 5
    assert codes.filter("vec_id >= 50000 AND cluster_id IS NULL") \
        .count() == 0
    decisions = read_version(spark, f"{idx}/_state/decisions").collect()
    assert [d["decision"] for d in decisions] == ["appended"]


def test_ivf_sq8_filtered_search(spark, emb, tmp_path):
    """Filtered ANN on the composed layout: every served neighbor
    satisfies the allow-list, a restrictive filter still fills k, and
    the filtered exact-best is served at rank 1."""
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.pipeline.core import (  # noqa: E501
        cosine,
    )

    path = str(tmp_path / "ivfsq8")
    write_ivf_sq8_index(emb, path)
    allowed = emb.filter("vec_id % 3 = 0").select("vec_id")
    qvec = _qvec(emb, 1)   # vec 1 itself is NOT allowed

    got = ivf_sq8_index_topk(spark, path, qvec, emb, k=5,
                             allowed=allowed).collect()
    assert len(got) == 5
    assert all(r["neighbor_id"] % 3 == 0 for r in got)

    qcol = F.array(*[F.lit(float(x)) for x in qvec])
    best = (emb.join(allowed, "vec_id", "left_semi")
            .select("vec_id",
                    F.round(cosine(F.col("embedding"), qcol), 6)
                    .alias("c"))
            .orderBy(F.desc("c"), F.asc("vec_id")).head())
    assert sorted(got, key=lambda r: r["rank"])[0]["neighbor_id"] \
        == best["vec_id"]


def test_ivf_sq8_filtered_search_widens_probes(spark, emb, tmp_path):
    """The layout-specific starvation case: when every allowed vector
    lives OUTSIDE the default probed clusters, the probe set widens
    until the shortlist can fill k — a fixed nprobe=1 would return
    nothing."""
    path = str(tmp_path / "ivfsq8")
    write_ivf_sq8_index(emb, path)
    qvec = _qvec(emb, 0)

    # which cluster does the default probe pick for this query?
    top_unfiltered = ivf_sq8_index_topk(
        spark, path, qvec, emb, k=10, nprobe=1).collect()
    probed_ids = {r["neighbor_id"] for r in top_unfiltered}
    codes = read_index_codes(spark, path)
    probed_cluster = (codes.filter(
        codes.vec_id.isin(*[int(i) for i in probed_ids]))
        .select("cluster_id").distinct().collect())
    probed_set = {r["cluster_id"] for r in probed_cluster}

    # allow ONLY vectors from other clusters
    allowed = (codes.filter(
        ~codes.cluster_id.isin(*[int(c) for c in probed_set]))
        .select("vec_id"))
    n_allowed = allowed.count()
    assert n_allowed >= 5   # the fixture has >1 cluster

    got = ivf_sq8_index_topk(spark, path, qvec, emb, k=5, nprobe=1,
                             allowed=allowed).collect()
    assert len(got) == 5
    allowed_ids = {r["vec_id"] for r in allowed.collect()}
    assert all(r["neighbor_id"] in allowed_ids for r in got)


def test_dim_resolved_from_manifest(spark, emb, tmp_path):
    """An index built at a non-default dim serves correctly with NO
    dim argument (the manifest is authoritative); a contradicting
    caller dim raises instead of silently nulling the scores."""
    path = str(tmp_path / "sq8_32")
    write_sq8_index(emb, path, dim=32)
    qvec = _qvec(emb, 0)[:32]
    vecs32 = emb.selectExpr("vec_id",
                            "slice(embedding, 1, 32) AS embedding")

    top = sorted(sq8_index_topk(spark, path, qvec, vecs32, k=3)
                 .collect(), key=lambda r: r["rank"])
    assert top[0]["neighbor_id"] == 0 and top[0]["cos_sim"] == 1.0

    with pytest.raises(ValueError, match="dim=32"):
        sq8_index_topk(spark, path, qvec, vecs32, k=3, dim=64)
    with pytest.raises(ValueError, match="dim=32"):
        sq8_index_upsert(spark, path, vecs32.limit(1), dim=64)


def test_vacuum_keep_last_floor(spark, emb, tmp_path):
    """vacuum_index(keep_last=0) would delete every data dir AND every
    manifest — it must refuse instead of destroying the index."""
    path = str(tmp_path / "sq8")
    write_sq8_index(emb, path)
    with pytest.raises(ValueError, match="keep_last"):
        vacuum_index(spark, path, keep_last=0)
    assert list_versions(spark, path) == [0]   # untouched


def _index_recall_permille(spark, emb, serve, k=10, n_queries=4):
    """MIN sampled recall (permille) of a serving callable vs brute
    force over the corpus."""
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.pipeline.core import (  # noqa: E501
        cosine,
    )
    from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (  # noqa: E501
        ann_recall,
    )

    approx = exact = None
    for qid in range(n_queries):
        qvec = _qvec(emb, qid)
        a = serve(qvec).select(
            F.lit(qid).cast("long").alias("query_id"),
            F.col("neighbor_id"))
        qcol = F.array(*[F.lit(float(x)) for x in qvec])
        e = (emb.select(
                "vec_id",
                F.round(cosine(F.col("embedding"), qcol), 6)
                .alias("c"))
             .orderBy(F.desc("c"), F.asc("vec_id")).limit(k)
             .select(F.lit(qid).cast("long").alias("query_id"),
                     F.col("vec_id").alias("neighbor_id")))
        approx = a if approx is None else approx.unionByName(a)
        exact = e if exact is None else exact.unionByName(e)
    row = (ann_recall(approx, exact)
           .agg(F.min("recall_permille").alias("r")).collect()[0])
    return int(row["r"])


def test_sampled_training_preserves_recall(spark, emb, tmp_path):
    """train_fraction decouples centroid/codebook training cost from
    corpus size: at 0.25 the sampled-trained IVF-SQ8 and PQ indexes
    stay within a few recall points of their full-corpus twins (the
    distribution, not the row count, is what the chains learn), and
    every vector is still encoded/assigned."""
    full = str(tmp_path / "full")
    samp = str(tmp_path / "samp")
    write_ivf_sq8_index(emb, full)
    write_ivf_sq8_index(emb, samp, train_fraction=0.25)
    n = emb.count()
    assert read_index_codes(spark, samp).count() == n  # all encoded

    r_full = _index_recall_permille(
        spark, emb,
        lambda q: ivf_sq8_index_topk(spark, full, q, emb, k=10,
                                     nprobe=2))
    r_samp = _index_recall_permille(
        spark, emb,
        lambda q: ivf_sq8_index_topk(spark, samp, q, emb, k=10,
                                     nprobe=2))
    assert r_samp >= r_full - 200, (r_samp, r_full)

    from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (  # noqa: E501
        pq_index_topk,
    )

    pq_full = str(tmp_path / "pq_full")
    pq_samp = str(tmp_path / "pq_samp")
    write_pq_index(emb, pq_full)
    write_pq_index(emb, pq_samp, train_fraction=0.25)
    assert read_index_codes(spark, pq_samp).count() == n
    p_full = _index_recall_permille(
        spark, emb,
        lambda q: pq_index_topk(spark, pq_full, q, emb, k=10))
    p_samp = _index_recall_permille(
        spark, emb,
        lambda q: pq_index_topk(spark, pq_samp, q, emb, k=10))
    assert p_samp >= p_full - 200, (p_samp, p_full)

    with pytest.raises(ValueError, match="train_fraction"):
        write_ivf_sq8_index(emb, str(tmp_path / "bad"),
                            train_fraction=0.0)


def test_maintain_pq_requires_postmerge_store(spark, emb, tmp_path):
    """maintain_pq_index refuses a pre-merge primary store: the probe
    and any rebuild read `vectors` as ground truth, so a store missing
    the batch would skew recall and drop the batch from a rebuild."""
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (  # noqa: E501
        maintain_pq_index,
    )

    base = emb.filter("vec_id >= 10").select("vec_id", "embedding")
    path = str(tmp_path / "pq")
    write_pq_index(base, path)
    batch = emb.filter("vec_id < 4").select(
        (F.col("vec_id") + 60_000).alias("vec_id"), "embedding")
    with pytest.raises(ValueError, match="POST-merge"):
        maintain_pq_index(spark, path, batch, base)   # pre-merge store
    assert len(list_versions(spark, path)) == 1       # nothing written
    # the merged store satisfies the contract
    st = maintain_pq_index(spark, path, batch,
                           base.unionByName(batch))
    assert st["decision"] in ("ok", "rebuild")


def test_maintain_ivf_sq8_closed_loop(spark, emb, tmp_path):
    """The flagship layout's maintenance ladder: an in-distribution
    batch lands and recall clears the floor (ok / bump_nprobe); a
    drifted batch routes to rebuild — centroids AND quantizer retrain
    over the primary store as a new committed version and the batch is
    then servable; the primary-store contract raises on a pre-merge
    store."""
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (  # noqa: E501
        maintain_ivf_sq8_index,
    )

    base = emb.filter("vec_id >= 10").select("vec_id", "embedding")
    path = str(tmp_path / "ivfsq8")
    write_ivf_sq8_index(base, path)

    batch = emb.filter("vec_id >= 10 AND vec_id < 14").select(
        (F.col("vec_id") + 50_000).alias("vec_id"), "embedding")
    with pytest.raises(ValueError, match="POST-merge"):
        maintain_ivf_sq8_index(spark, path, batch, base)

    merged = base.unionByName(batch)
    st = maintain_ivf_sq8_index(spark, path, batch, merged, k=5,
                                recall_floor_permille=400)
    assert st["decision"] in ("ok", "bump_nprobe")
    assert st["recall_permille"] >= 400 or \
        st.get("recall_after_bump_permille", 0) >= 400

    # drifted batch: upsert refuses, the loop rebuilds BOTH artifacts
    wild = emb.filter("vec_id < 3").select(
        (F.col("vec_id") + 90_000).alias("vec_id"),
        F.transform("embedding", lambda x: x * F.lit(100.0))
        .alias("embedding"))
    merged2 = merged.unionByName(wild)
    v_before = len(list_versions(spark, path))
    st2 = maintain_ivf_sq8_index(spark, path, wild, merged2, k=5,
                                 recall_floor_permille=400)
    assert st2["decision"] == "rebuild" and st2["drifted_dims"]
    assert "recall_after_rebuild_permille" in st2
    assert len(list_versions(spark, path)) == v_before + 1
    m = _index_manifest(spark, path)
    assert m["kind"] == "ivf_sq8"
    # the rebuilt index serves the drifted vector
    qvec = [float(x) for x in
            wild.filter("vec_id = 90000").head()["embedding"]]
    top = sorted(ivf_sq8_index_topk(spark, path, qvec, merged2,
                                    k=2).collect(),
                 key=lambda r: r["rank"])
    assert top[0]["neighbor_id"] == 90_000


def test_cli_maintain_dispatches_ivf_sq8(spark, emb, tmp_path, capsys):
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.__main__ import (
        main,
    )

    base = emb.filter("vec_id >= 10").select("vec_id", "embedding")
    emb_path = str(tmp_path / "emb")
    base.write.parquet(emb_path)
    idx = str(tmp_path / "ivf")
    assert main(["vector-index", "build", "--path", idx,
                 "--emb", emb_path, "--ivf"]) == 0
    capsys.readouterr()

    batch_path = str(tmp_path / "batch")
    (base.limit(3)
     .select((F.col("vec_id") + 50_000).alias("vec_id"), "embedding")
     .write.parquet(batch_path))
    merged_path = str(tmp_path / "merged")
    base.unionByName(spark.read.parquet(batch_path)) \
        .write.parquet(merged_path)
    rc = main(["vector-index", "maintain", "--path", idx,
               "--batch", batch_path, "--emb", merged_path,
               "--k", "5", "--recall-floor", "400"])
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["kind"] == "ivf_sq8"
    assert (rc == 0) == (st["decision"] in ("ok", "bump_nprobe"))
    assert st["decision"] in ("ok", "bump_nprobe")


def test_legacy_ivf_filtered_search(spark, emb, tmp_path):
    """allowed= on the classic full-precision IVF layout: same
    semi-join + adaptive-widening contract as the composed layout, so
    the whole serving API takes metadata filters uniformly."""
    from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (  # noqa: E501
        ivf_index_topk,
        write_ivf_index,
    )

    path = str(tmp_path / "ivf")
    write_ivf_index(emb.select("vec_id", "embedding"), path)
    allowed = emb.filter("vec_id % 3 = 0").select("vec_id")
    qvec = _qvec(emb, 1)      # vec 1 itself is NOT allowed

    got = ivf_index_topk(spark, path, qvec, k=5, nprobe=1,
                         allowed=allowed).collect()
    assert len(got) == 5
    assert all(r["vec_id"] % 3 == 0 for r in got)


def test_compact_index_folds_appended_dirs(spark, emb, tmp_path,
                                           capsys):
    """Append-fragmented indexes fold back to ONE codes dir with
    identical content; ivf_sq8 keeps its cluster partitioning (and the
    serving plan keeps pruning); vacuum then collects the old dirs."""
    from pyspark.sql import functions as F

    from public_transit_data_platform_sql_nosql_spark.__main__ import (
        main,
    )
    from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (  # noqa: E501
        compact_index,
    )
    from public_transit_data_platform_sql_nosql_spark.plans import (
        executed_plan,
    )

    base = emb.filter("vec_id >= 10").select("vec_id", "embedding")
    path = str(tmp_path / "ivfsq8")
    write_ivf_sq8_index(base, path)
    for lo in (0, 3):   # two appended batches -> three dirs
        batch = emb.filter(f"vec_id >= {lo + 10} AND vec_id < {lo + 13}") \
            .select((F.col("vec_id") + 50_000 + lo * 1000).alias("vec_id"),
                    "embedding")
        assert ivf_sq8_index_upsert(spark, path, batch)["decision"] \
            == "appended"
    m0 = _index_manifest(spark, path)
    assert len(m0["codes"]) == 3
    before = sorted(map(tuple, read_index_codes(spark, path)
                        .select("vec_id", "cluster_id", "codes")
                        .collect()))

    st = compact_index(spark, path)
    assert st == {"decision": "compacted", "dirs_before": 3,
                  "version": st["version"]}
    m1 = _index_manifest(spark, path)
    assert m1["kind"] == "ivf_sq8" and len(m1["codes"]) == 1
    assert m1["centroids"] == m0["centroids"]
    after = sorted(map(tuple, read_index_codes(spark, path)
                       .select("vec_id", "cluster_id", "codes")
                       .collect()))
    assert after == before
    qvec = _qvec(emb, 10)
    plan = executed_plan(
        ivf_sq8_index_topk(spark, path, qvec, emb, k=3, nprobe=1))
    assert "PartitionFilters" in plan

    # idempotent: a single-dir manifest is a noop
    assert compact_index(spark, path)["decision"] == "noop"

    # CLI wiring + vacuum collects the superseded dirs
    assert main(["vector-index", "compact", "--path", path]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["decision"] == "noop"
    assert main(["vector-index", "vacuum", "--path", path,
                 "--keep-last", "1"]) == 0
    vac = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert vac["removed_dirs"]            # the folded-away append dirs
    assert sorted(map(tuple, read_index_codes(spark, path)
                      .select("vec_id", "cluster_id", "codes")
                      .collect())) == before


def test_batch_serving_matches_single_query_path(spark, emb, tmp_path):
    """ivf_sq8_index_topk_batch is ONE distributed plan whose per-query
    results equal the single-query serving path's, the codes scan still
    partition-prunes, and allowed= restricts every query's candidates."""
    from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (  # noqa: E501
        ivf_sq8_index_topk_batch,
    )
    from public_transit_data_platform_sql_nosql_spark.plans import (
        executed_plan,
    )

    path = str(tmp_path / "ivfsq8")
    write_ivf_sq8_index(emb, path)
    queries = emb.filter("vec_id < 4").select(
        emb.vec_id.alias("query_id"), "embedding")

    batch = ivf_sq8_index_topk_batch(spark, path, queries, emb, k=5,
                                     nprobe=2)
    got = {}
    for r in batch.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cos_sim"]))
    assert set(got) == {0, 1, 2, 3}
    for qid in range(4):
        single = sorted(
            (r["rank"], r["neighbor_id"], r["cos_sim"])
            for r in ivf_sq8_index_topk(
                spark, path, _qvec(emb, qid), emb, k=5,
                nprobe=2).collect())
        assert sorted(got[qid]) == single, qid

    plan = executed_plan(
        ivf_sq8_index_topk_batch(spark, path, queries, emb, k=5,
                                 nprobe=1))
    assert "PartitionFilters" in plan

    allowed = emb.filter("vec_id % 3 = 0").select("vec_id")
    filt = ivf_sq8_index_topk_batch(spark, path, queries, emb, k=5,
                                    nprobe=4, allowed=allowed).collect()
    assert filt and all(r["neighbor_id"] % 3 == 0 for r in filt)


def test_flat_batch_paths_match_single_query(spark, emb, tmp_path):
    """sq8/pq batch retrieval: per-query results equal the
    single-query serving paths (one scan, per-query windows)."""
    from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (  # noqa: E501
        pq_index_topk,
        pq_index_topk_batch,
        sq8_index_topk_batch,
        write_pq_index,
    )

    queries = emb.filter("vec_id < 3").select(
        emb.vec_id.alias("query_id"), "embedding")

    sq8 = str(tmp_path / "sq8")
    write_sq8_index(emb, sq8)
    got = {}
    for r in sq8_index_topk_batch(spark, sq8, queries, emb,
                                  k=5).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cos_sim"]))
    for qid in range(3):
        single = sorted(
            (r["rank"], r["neighbor_id"], r["cos_sim"])
            for r in sq8_index_topk(spark, sq8, _qvec(emb, qid), emb,
                                    k=5).collect())
        assert sorted(got[qid]) == single, qid

    pq = str(tmp_path / "pq")
    write_pq_index(emb, pq)
    gotp = {}
    for r in pq_index_topk_batch(spark, pq, queries, emb,
                                 k=5).collect():
        gotp.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cos_sim"]))
    for qid in range(3):
        single = sorted(
            (r["rank"], r["neighbor_id"], r["cos_sim"])
            for r in pq_index_topk(spark, pq, _qvec(emb, qid), emb,
                                   k=5).collect())
        assert sorted(gotp[qid]) == single, qid


def test_stream_vector_search_serves_batches(spark, emb, tmp_path):
    """The retrieval twin of the upsert stream: micro-batches of query
    vectors run through the index's batch serving path against the
    newest committed snapshot; ranked results publish atomically per
    batch and equal the single-query path."""
    from pyspark.sql import functions as F  # noqa: F401

    from public_transit_data_platform_sql_nosql_spark.jobs.versioned import (  # noqa: E501
        read_version,
    )
    from public_transit_data_platform_sql_nosql_spark.streaming.jobs import (  # noqa: E501
        stream_vector_search,
    )

    idx = str(tmp_path / "ivfsq8")
    write_ivf_sq8_index(emb, idx)
    src = str(tmp_path / "src")
    (emb.filter("vec_id < 2")
     .select(emb.vec_id.alias("query_id"), "embedding")
     .coalesce(1).write.parquet(f"{src}/a.parquet"))
    (emb.filter("vec_id >= 2 AND vec_id < 4")
     .select(emb.vec_id.alias("query_id"), "embedding")
     .coalesce(1).write.parquet(f"{src}/b.parquet"))

    stream = (
        spark.readStream
        .schema("query_id long, embedding array<float>")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*.parquet")
    )
    results = str(tmp_path / "results")
    q = stream_vector_search(stream, idx, emb, results,
                             str(tmp_path / "chk"), k=5, nprobe=2)
    q.awaitTermination()

    rows = read_version(spark, results).collect()
    served = {}
    for r in rows:
        served.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["cos_sim"]))
    assert set(served) == {0, 1, 2, 3}
    for qid in range(4):
        single = sorted(
            (r["rank"], r["neighbor_id"], r["cos_sim"])
            for r in ivf_sq8_index_topk(
                spark, idx, _qvec(emb, qid), emb, k=5,
                nprobe=2).collect())
        assert sorted(served[qid]) == single, qid
    # per-batch atomic publication: two micro-batches, two batch ids
    assert len({r["batch_id"] for r in rows}) == 2


def test_cli_query_batch(spark, emb, tmp_path, capsys):
    from public_transit_data_platform_sql_nosql_spark.__main__ import (
        main,
    )

    emb_path = str(tmp_path / "emb")
    emb.select("vec_id", "embedding").write.parquet(emb_path)
    idx = str(tmp_path / "pq")
    assert main(["vector-index", "build", "--path", idx,
                 "--emb", emb_path, "--pq"]) == 0
    capsys.readouterr()
    qpath = str(tmp_path / "queries")
    (emb.filter("vec_id < 3")
     .select(emb.vec_id.alias("query_id"), "embedding")
     .write.parquet(qpath))
    out = str(tmp_path / "results")
    assert main(["vector-index", "query-batch", "--path", idx,
                 "--emb", emb_path, "--queries", qpath,
                 "--out", out, "--k", "5"]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["kind"] == "pq" and st["n_queries"] == 3
    assert st["n_results"] == 15
    res = spark.read.parquet(out)
    assert res.count() == 15
    assert set(res.columns) == {"query_id", "rank", "neighbor_id",
                                "cos_sim"}


# SLOW TIER (pytest.ini): stored-index/tune/streaming/CLI e2e --
# excluded from the driver's default gate; run with -m slow after
# touching this family (see the verify skill).
pytestmark = pytest.mark.slow
