"""Round-12 surface: corpus-derived IVF geometry (k ~ sqrt(N)),
attrs/``where=`` on the FLAT layouts (sq8/pq/bq — completing the
pushdown matrix), attrs self-carry through every maintainer's rebuild
rung, ``tune_index`` committing through ``_persist_nprobe`` (a pick
equal to the constant fallback still pins), ``rebalance_index``'s
degenerate-split refusal, batched hybrid retrieval, and the streaming
maintainer's ``auto_rebalance`` rung."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from public_transit_data_platform_sql_nosql_spark.pipeline import (
    similarity as sim,
)
from public_transit_data_platform_sql_nosql_spark.pipeline import (
    text as ptext,
)
from tests.conftest import SF_DIR
from tests.test_rebalance import _skewed_corpus


@pytest.fixture(scope="module")
def emb(spark):
    return E._emb(spark, SF_DIR)


# ---------------------------------------------------------------------------
# corpus-derived IVF cluster count


def test_default_ivf_k_scales_with_corpus(spark):
    assert sim._default_ivf_k(
        spark.range(40).selectExpr("id as vec_id")) == sim.KMEANS_K
    assert sim._default_ivf_k(
        spark.range(10_000).selectExpr("id as vec_id")) == 100
    # sqrt(500) = 22.36 -> 22 (the sf0.001 embeddings corpus)
    assert sim._default_ivf_k(
        spark.range(500).selectExpr("id as vec_id")) == 22


def test_ivf_writer_derives_k_and_explicit_k_wins(spark, emb, tmp_path):
    derived = str(tmp_path / "derived")
    sim.write_ivf_sq8_index(emb, derived)              # k=None
    m = sim._index_manifest(spark, derived)
    n_cents = spark.read.parquet(f"{derived}/{m['centroids']}").count()
    assert n_cents == sim._default_ivf_k(emb) == 22

    pinned = str(tmp_path / "pinned")
    sim.write_ivf_sq8_index(emb, pinned, k=4)
    m2 = sim._index_manifest(spark, pinned)
    assert spark.read.parquet(
        f"{pinned}/{m2['centroids']}").count() == 4

    # serving stays correct under the derived geometry: full-depth
    # probing reproduces exact brute force
    qv = [float(x) for x in emb.filter("vec_id = 7")
          .head()["embedding"]]
    got = sim.ivf_sq8_index_topk(spark, derived, qv, emb, k=5,
                                 nprobe=n_cents).collect()
    qcol = F.array(*[F.lit(float(x)) for x in qv])
    exact = (emb.select("vec_id",
                        F.round(sim.cosine(F.col("embedding"), qcol), 6)
                        .alias("cos_sim"))
             .orderBy(F.desc("cos_sim"), F.asc("vec_id"))
             .limit(5).collect())
    assert [int(r["neighbor_id"]) for r in got] == \
        [int(r["vec_id"]) for r in exact]


# ---------------------------------------------------------------------------
# flat-layout attrs / where= pushdown (completing the matrix)


def _flat_fixture(spark, kind, tmp_path):
    dim = 8 if kind in ("sq8", "pq") else 64
    corpus = _skewed_corpus(spark, dim=dim).localCheckpoint(eager=True)
    attrs = corpus.select(
        "vec_id",
        F.when(F.element_at("embedding", 1) > 0.5, "a")
        .otherwise("b").alias("lang"))
    path = str(tmp_path / kind)
    if kind == "sq8":
        sim.write_sq8_index(corpus, path, dim=dim, attrs=attrs)
        serve, batch_serve, upsert = (sim.sq8_index_topk,
                                      sim.sq8_index_topk_batch,
                                      sim.sq8_index_upsert)
    elif kind == "pq":
        sim.write_pq_index(corpus, path, dim=dim, attrs=attrs)
        serve, batch_serve, upsert = (sim.pq_index_topk,
                                      sim.pq_index_topk_batch,
                                      sim.pq_index_upsert)
    else:
        sim.write_bq_index(corpus, path, dim=dim, attrs=attrs)
        serve, batch_serve, upsert = (sim.bq_index_topk,
                                      sim.bq_index_topk_batch,
                                      sim.bq_index_upsert)
    return corpus, attrs, path, dim, serve, batch_serve, upsert


@pytest.mark.parametrize("kind", ["sq8", "pq", "bq"])
def test_flat_where_pushdown(spark, tmp_path, kind):
    """The pushdown contract on the flat layouts: manifest records the
    attr columns, where= == allowed-form results (no widening needed —
    a flat scan sees everything), upserts carry attrs (batch-column
    shape), bare batches against an attrs index are refused."""
    corpus, attrs, path, dim, serve, batch_serve, upsert = \
        _flat_fixture(spark, kind, tmp_path)
    assert sim._index_manifest(spark, path)["attrs"] == ["lang"]

    qv = [1.0, 0.015] + [0.0] * (dim - 2)
    by_where = serve(spark, path, qv, corpus, k=3,
                     where="lang = 'b'").collect()
    by_allowed = serve(spark, path, qv, corpus, k=3,
                       allowed=attrs.filter("lang = 'b'")
                       .select("vec_id")).collect()
    assert len(by_where) == 3
    assert [tuple(r) for r in by_where] == \
        [tuple(r) for r in by_allowed]
    cold = {int(r["vec_id"]) for r in attrs.filter("lang = 'b'")
            .collect()}
    assert all(int(r["neighbor_id"]) in cold for r in by_where)

    # batch path parity with the single path under the same filter
    queries = corpus.limit(3).selectExpr("vec_id as query_id",
                                         "embedding")
    got = batch_serve(spark, path, queries, corpus, k=3,
                      where="lang = 'b'").collect()
    by_q: dict[int, list] = {}
    for r in got:
        by_q.setdefault(int(r["query_id"]), []).append(
            (int(r["rank"]), int(r["neighbor_id"]), r["cos_sim"]))
    for q in queries.collect():
        single = serve(spark, path,
                       [float(x) for x in q["embedding"]],
                       corpus, k=3, where="lang = 'b'").collect()
        assert sorted(by_q[int(q["query_id"])]) == sorted(
            (int(r["rank"]), int(r["neighbor_id"]), r["cos_sim"])
            for r in single)

    # upsert with attrs as batch columns; where= then serves the row
    batch = spark.createDataFrame(
        [(970001, qv, "b")],
        "vec_id long, embedding array<double>, lang string")
    st = upsert(spark, path, batch)
    assert st["decision"] == "appended"
    m = sim._index_manifest(spark, path)
    assert m["attrs"] == ["lang"]
    assert sim._manifest_codes(spark, path, m) \
        .filter("lang = 'b'").count() == 5      # 4 cold + the upsert

    bare = spark.createDataFrame(
        [(970002, qv)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="missing"):
        upsert(spark, path, bare)


def test_flat_where_reaches_scan_as_pushed_filter(spark, tmp_path):
    from public_transit_data_platform_sql_nosql_spark.plans import (
        executed_plan,
    )

    corpus, attrs, path, dim, serve, _, _ = _flat_fixture(
        spark, "sq8", tmp_path)
    qv = [1.0, 0.015] + [0.0] * (dim - 2)
    prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = executed_plan(serve(spark, path, qv, corpus, k=3,
                                   where="lang = 'b'"))
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    codes_scans = [
        ln for ln in plan.split("\n")
        if "FileScan parquet" in ln and "/codes" in ln]
    assert codes_scans
    assert any("EqualTo(lang,b)" in ln.split("PushedFilters:")[-1]
               for ln in codes_scans if "PushedFilters:" in ln), plan


def test_flat_pq_maintain_rebuild_preserves_attrs(spark, tmp_path):
    """maintain_pq_index's rebuild rung self-carries stored attrs (the
    _attrs_self_carry contract on the flat codebook layout)."""
    corpus, attrs, path, dim, serve, _, _ = _flat_fixture(
        spark, "pq", tmp_path)
    batch = spark.createDataFrame(
        [(970001, [0.5] * dim, "b")],
        "vec_id long, embedding array<double>, lang string")
    vectors = corpus.unionByName(batch.select("vec_id", "embedding"))
    # floor 1001 is unreachable -> the ladder lands on rebuild
    st = sim.maintain_pq_index(spark, path, batch, vectors, k=3,
                               recall_floor_permille=1001)
    assert st["decision"] == "rebuild"
    m = sim._index_manifest(spark, path)
    assert m["attrs"] == ["lang"]
    codes = sim._manifest_codes(spark, path, m)
    assert codes.filter("lang IS NULL").count() == 0
    assert codes.filter("vec_id = 970001").head()["lang"] == "b"


@pytest.mark.parametrize("kind", ["ivf_pq", "ivf_bq"])
def test_ivf_maintain_rebuild_preserves_attrs(spark, tmp_path, kind):
    """The r11 ADVICE defect: maintain_ivf_pq/ivf_bq's rebuild rung
    rebuilt WITHOUT attrs, silently stripping filterability.  Now all
    maintainers share _attrs_self_carry."""
    dim = 8 if kind == "ivf_pq" else 64
    corpus = _skewed_corpus(spark, dim=dim).localCheckpoint(eager=True)
    attrs = corpus.select(
        "vec_id",
        F.when(F.element_at("embedding", 1) > 0.5, "a")
        .otherwise("b").alias("lang"))
    path = str(tmp_path / kind)
    if kind == "ivf_pq":
        sim.write_ivf_pq_index(corpus, path, k=2, dim=dim, attrs=attrs)
        maintain = sim.maintain_ivf_pq_index
    else:
        sim.write_ivf_bq_index(corpus, path, k=2, dim=dim, attrs=attrs)
        maintain = sim.maintain_ivf_bq_index
    batch = spark.createDataFrame(
        [(970001, [0.5] * dim, "b")],
        "vec_id long, embedding array<double>, lang string")
    vectors = corpus.unionByName(batch.select("vec_id", "embedding"))
    # unreachable floor + max_nprobe=1 (bump cannot raise) -> rebuild
    st = maintain(spark, path, batch, vectors, k=3,
                  recall_floor_permille=1001, max_nprobe=1)
    assert st["decision"] == "rebuild"
    m = sim._index_manifest(spark, path)
    assert m["attrs"] == ["lang"]
    codes = sim._manifest_codes(spark, path, m)
    assert codes.filter("lang IS NULL").count() == 0
    assert codes.filter("vec_id = 970001").head()["lang"] == "b"
    # the rebuilt index still serves where= (the defect's symptom was
    # AnalysisException here)
    serve = (sim.ivf_pq_index_topk if kind == "ivf_pq"
             else sim.ivf_bq_index_topk)
    got = serve(spark, path, [1.0, 0.015] + [0.0] * (dim - 2),
                vectors, k=3, nprobe=2, where="lang = 'b'").collect()
    assert len(got) == 3


# ---------------------------------------------------------------------------
# tune_index pins the measured point even when it equals the fallback


def test_tune_pins_pick_equal_to_default(spark, tmp_path):
    corpus = _skewed_corpus(spark).localCheckpoint(eager=True)
    path = str(tmp_path / "tune")
    sim.write_ivf_sq8_index(corpus, path, k=2, dim=8)
    # nprobes=(2,) makes the measured pick exactly DEFAULT_NPROBE on an
    # UNTUNED manifest — the r11 defect declared 'noop' and wrote
    # nothing, leaving the operating point riding the constant
    ix0 = sim.index_stats(spark, path)
    assert ix0["tuned"] is False and ix0["default_nprobe"] == 2
    st = sim.tune_index(spark, path, corpus, target_recall_permille=1,
                        nprobes=(2,))
    assert st["decision"] == "tuned" and st["nprobe"] == 2
    assert sim._index_manifest(spark, path)["default_nprobe"] == 2
    ix1 = sim.index_stats(spark, path)
    assert ix1["tuned"] is True and ix1["default_nprobe"] == 2
    # now EXPLICITLY pinned and equal -> noop, no version bump
    v = sim._index_manifest(spark, path)["version"]
    st2 = sim.tune_index(spark, path, corpus,
                         target_recall_permille=1, nprobes=(2,))
    assert st2["decision"] == "noop"
    assert sim._index_manifest(spark, path)["version"] == v


# ---------------------------------------------------------------------------
# rebalance_index: degenerate hot list refuses as data


def _degenerate_corpus(spark):
    """The _skewed_corpus shape, but the hot group is ONE repeated
    embedding — 2-means over it collapses to a single sub-cluster."""
    from tests.test_rebalance import _h, _mk_emb

    ids = sorted(range(200),
                 key=lambda i: (_h(f"{sim.KMEANS_SALT}{i}"), i))
    seed_hot, seed_cold = ids[0], ids[1]
    rest = [i for i in range(200) if i not in (seed_hot, seed_cold)]
    hot_ids = [seed_hot] + rest[:39]
    cold_ids = [seed_cold] + rest[39:42]
    rows = [(i, [1.0, 0.0] + [0.0] * 6) for i in hot_ids]
    rows += [(i, [0.001 * j, 1.0] + [0.0] * 6)
             for j, i in enumerate(cold_ids)]
    return _mk_emb(spark, rows)


def test_rebalance_unsplittable_commits_nothing(spark, tmp_path):
    corpus = _degenerate_corpus(spark).localCheckpoint(eager=True)
    path = str(tmp_path / "degen")
    sim.write_ivf_sq8_index(corpus, path, k=2, dim=8)
    v0 = sim._index_manifest(spark, path)["version"]
    st = sim.rebalance_index(spark, path, corpus,
                             max_imbalance_permille=1500)
    assert st["decision"] == "unsplittable"
    assert st["n_sub_clusters"] == 1
    assert "new_cluster_ids" not in st
    m = sim._index_manifest(spark, path)
    assert m["version"] == v0                   # nothing committed
    assert "excluded_clusters" not in m


# ---------------------------------------------------------------------------
# batched hybrid retrieval


@pytest.mark.parametrize("kind", ["ivf_sq8", "bq"])
def test_hybrid_batch_matches_single(spark, emb, tmp_path, kind):
    docs = E._aug(spark, SF_DIR)
    path = str(tmp_path / kind)
    if kind == "ivf_sq8":
        sim.write_ivf_sq8_index(emb, path)
    else:
        sim.write_bq_index(emb, path)
    queries = spark.createDataFrame(
        [(1, ["spark", "window"],
          [float(x) for x in emb.filter("vec_id = 1")
           .head()["embedding"]]),
         (2, ["merge", "data", "merge"],      # dup term: set semantics
          [float(x) for x in emb.filter("vec_id = 2")
           .head()["embedding"]])],
        "query_id long, terms array<string>, embedding array<double>")
    batch = ptext.hybrid_index_search_batch(
        spark, docs, path, emb, queries, k=7, pool=20).collect()
    by_q: dict[int, set] = {}
    for r in batch:
        by_q.setdefault(int(r["query_id"]), set()).add(
            (int(r["doc_id"]),
             None if r["bm25_rank"] is None else int(r["bm25_rank"]),
             None if r["dense_rank"] is None else int(r["dense_rank"]),
             int(r["rrf_micro"])))
    for qid, terms in ((1, ["spark", "window"]), (2, ["merge", "data"])):
        qv = [float(x) for x in
              emb.filter(f"vec_id = {qid}").head()["embedding"]]
        single = ptext.hybrid_index_search(
            spark, docs, path, emb, terms, qv, k=7, pool=20).collect()
        assert by_q[qid] == {
            (int(r["doc_id"]),
             None if r["bm25_rank"] is None else int(r["bm25_rank"]),
             None if r["dense_rank"] is None else int(r["dense_rank"]),
             int(r["rrf_micro"]))
            for r in single}


def test_hybrid_batch_allowed_and_empty_terms(spark, emb, tmp_path):
    docs = E._aug(spark, SF_DIR)
    path = str(tmp_path / "allowed")
    sim.write_bq_index(emb, path)
    allowed = emb.filter("vec_id % 2 = 0").select("vec_id")
    queries = spark.createDataFrame(
        [(1, ["spark", "window"],
          [float(x) for x in emb.filter("vec_id = 1")
           .head()["embedding"]])],
        "query_id long, terms array<string>, embedding array<double>")
    got = ptext.hybrid_index_search_batch(
        spark, docs, path, emb, queries, k=5, pool=20,
        allowed=allowed).collect()
    assert got and all(int(r["doc_id"]) % 2 == 0 for r in got)
    single = ptext.hybrid_index_search(
        spark, docs, path, emb, ["spark", "window"],
        [float(x) for x in emb.filter("vec_id = 1")
         .head()["embedding"]], k=5, pool=20, allowed=allowed).collect()
    assert {int(r["doc_id"]) for r in got} == \
        {int(r["doc_id"]) for r in single}

    bad = spark.createDataFrame(
        [(9, [], [0.0] * 64)],
        "query_id long, terms array<string>, embedding array<double>")
    with pytest.raises(ValueError, match="empty terms"):
        ptext.hybrid_index_search_batch(
            spark, docs, path, emb, bad)


def test_cli_hybrid_search(spark, emb, tmp_path, capsys):
    import json as _json

    from public_transit_data_platform_sql_nosql_spark.__main__ import (
        main,
    )

    docs_p = str(tmp_path / "docs")
    E._aug(spark, SF_DIR).write.parquet(docs_p)
    emb_p = str(tmp_path / "emb")
    emb.write.parquet(emb_p)
    idx = str(tmp_path / "idx")
    sim.write_ivf_sq8_index(emb, idx)
    q_p = str(tmp_path / "queries")
    spark.createDataFrame(
        [(1, ["spark", "window"],
          [float(x) for x in emb.filter("vec_id = 1")
           .head()["embedding"]])],
        "query_id long, terms array<string>, embedding array<double>"
    ).write.parquet(q_p)
    out = str(tmp_path / "res")
    assert main(["hybrid-search", "--docs", docs_p, "--emb", emb_p,
                 "--path", idx, "--queries", q_p, "--out", out,
                 "--k", "5"]) == 0
    st = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["kind"] == "ivf_sq8" and st["n_queries"] == 1
    assert spark.read.parquet(out).count() == st["n_results"] == 5


# ---------------------------------------------------------------------------
# CLI --where refusal on attr-less indexes


def test_cli_where_refused_without_attrs(spark, emb, tmp_path, capsys):
    import json as _json

    from public_transit_data_platform_sql_nosql_spark.__main__ import (
        main,
    )

    emb_p = str(tmp_path / "emb")
    emb.write.parquet(emb_p)
    idx = str(tmp_path / "idx")
    sim.write_sq8_index(emb, idx)               # flat, NO attrs
    rc = main(["vector-index", "query", "--path", idx, "--emb", emb_p,
               "--vec-id", "1", "--where", "tenant = 'a'"])
    st = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and "no attribute columns" in st["error"]


# ---------------------------------------------------------------------------
# streaming auto_rebalance


def test_stream_auto_rebalance_acts_on_skew(spark, tmp_path):
    from public_transit_data_platform_sql_nosql_spark.jobs.versioned import (  # noqa: E501
        read_version,
    )
    from public_transit_data_platform_sql_nosql_spark.streaming.jobs import (  # noqa: E501
        stream_vector_index_upsert,
    )

    corpus = _skewed_corpus(spark).localCheckpoint(eager=True)
    idx = str(tmp_path / "idx")
    sim.write_ivf_sq8_index(corpus, idx, k=2, dim=8)   # 40/4 skew
    batch = spark.createDataFrame(
        [(970001, [1.0, 0.02] + [0.0] * 6)],
        "vec_id long, embedding array<double>")
    src = str(tmp_path / "src")
    batch.coalesce(1).write.parquet(f"{src}/a.parquet")
    vec_p = str(tmp_path / "vectors")
    corpus.unionByName(batch).write.parquet(vec_p)

    stream = (spark.readStream
              .schema("vec_id long, embedding array<double>")
              .parquet(f"{src}/*.parquet"))
    stream_vector_index_upsert(
        stream, idx, str(tmp_path / "chk"),
        rebalance_hint_permille=1500, auto_rebalance=True,
        vectors_path=vec_p).awaitTermination()

    dec = read_version(spark, f"{idx}/_state/decisions").collect()
    by_kind = {r["decision"] for r in dec}
    assert "rebalanced" in by_kind              # the maintainer ACTED
    assert "rebalance" not in by_kind           # no hint-only rows
    # skew actually repaired: post-split imbalance under the threshold
    m = sim._index_manifest(spark, idx)
    sizes = [int(r["n"]) for r in
             sim._manifest_codes(spark, idx, m)
             .groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n"))
             .collect()]
    assert 1000 * max(sizes) / (sum(sizes) / len(sizes)) <= 1500
    # serving survives the splits: a cold-group query finds cold rows
    vectors = spark.read.parquet(vec_p)
    got = sim.ivf_sq8_index_topk(spark, idx, [0.001, 1.0] + [0.0] * 6,
                                 vectors, k=3, nprobe=2).collect()
    assert len(got) == 3
    cold = {int(r["vec_id"]) for r in corpus.collect()
            if r["embedding"][1] == 1.0}
    assert all(int(r["neighbor_id"]) in cold for r in got)


def test_upsert_extra_partitions_drop_moved_keys(spark, tmp_path):
    """A key whose partition value changed between versions: naming its
    previous partition via extra_partition_values drops the stale copy
    — and a partition EMPTIED by the move is deleted, not left
    stranded.  (ivf_index_upsert's moved-key shape: the stored rows'
    write-time assignment is one centroid-update step staler than the
    stored centroids, so re-submitted vectors can legitimately
    re-assign; with the derived k ~ sqrt(N) geometry this happens in
    practice on the sf corpora.)"""
    from public_transit_data_platform_sql_nosql_spark.jobs.upsert import (
        upsert_parquet_dir,
    )

    path = str(tmp_path / "store")
    spark.createDataFrame(
        [(1, "a", 0), (2, "b", 1)], "k long, v string, p int") \
        .write.partitionBy("p").parquet(path)
    st = upsert_parquet_dir(
        spark, path,
        spark.createDataFrame([(1, "a2", 1)], "k long, v string, p int"),
        ["k"], partition_col="p", extra_partition_values=[0])
    assert sorted(st["partitions"]) == [0, 1]
    after = spark.read.parquet(path)
    assert after.count() == 2                       # no stale twin
    assert {(r["k"], r["v"], r["p"]) for r in after.collect()} == \
        {(1, "a2", 1), (2, "b", 1)}
    import os
    assert not os.path.exists(f"{path}/p=0")        # emptied -> deleted


def test_ivf_index_upsert_handles_moved_keys(spark, emb, tmp_path):
    """End-to-end over the real layout at the derived geometry: after a
    full-corpus re-submit, every vec_id appears EXACTLY once even when
    assignments moved relative to the write."""
    path = str(tmp_path / "ivf")
    sim.write_ivf_index(emb.select("vec_id", "embedding"), path)
    n0 = spark.read.parquet(path).count()
    st = sim.ivf_index_upsert(
        spark, path, emb.select("vec_id", "embedding"))
    assert st["rows_upserted"] == n0
    after = spark.read.parquet(path)
    assert after.count() == n0
    assert after.select("vec_id").distinct().count() == n0


def test_stream_auto_rebalance_requires_inputs(spark, tmp_path):
    from public_transit_data_platform_sql_nosql_spark.streaming.jobs import (  # noqa: E501
        stream_vector_index_upsert,
    )

    stream = (spark.readStream
              .schema("vec_id long, embedding array<double>")
              .parquet(str(tmp_path / "nope") + "/*.parquet"))
    with pytest.raises(ValueError, match="vectors_path"):
        stream_vector_index_upsert(
            stream, str(tmp_path / "idx"), str(tmp_path / "chk"),
            auto_rebalance=True)


# SLOW TIER (pytest.ini): stored-index/tune/streaming/CLI e2e --
# excluded from the driver's default gate; run with -m slow after
# touching this family (see the verify skill).
pytestmark = pytest.mark.slow
