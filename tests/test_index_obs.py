"""Index observability (round 11): index_stats (layout health +
fragmentation + cluster balance as data) and index_recall_curve
(recall-vs-nprobe sweep) — the measurements an operator reads to
decide compact/vacuum/bump-nprobe/rebuild instead of guessing."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (
    bq_index_upsert,
    index_recall_curve,
    index_stats,
    write_bq_index,
    write_ivf_sq8_index,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return E._emb(spark, SF_DIR)


def test_stats_flat_and_fragmentation(spark, emb, tmp_path):
    path = str(tmp_path / "bq")
    write_bq_index(emb, path)
    st = index_stats(spark, path)
    assert st["kind"] == "bq" and st["dim"] == 64
    assert st["n_vectors"] == emb.count()
    assert st["n_codes_dirs"] == 1
    assert st["code_bytes_per_vector"] == 8
    assert "n_clusters" not in st
    qv = [float(x) for x in emb.filter("vec_id = 3")
          .head()["embedding"]]
    bq_index_upsert(spark, path, spark.createDataFrame(
        [(980000, qv)], "vec_id long, embedding array<double>"))
    st2 = index_stats(spark, path)
    assert st2["n_codes_dirs"] == 2            # the compaction signal
    assert st2["n_vectors"] == emb.count() + 1


def test_stats_cluster_balance(spark, emb, tmp_path):
    path = str(tmp_path / "ivfsq8")
    write_ivf_sq8_index(emb, path)
    st = index_stats(spark, path)
    assert st["kind"] == "ivf_sq8"
    assert st["code_bytes_per_vector"] == 64
    assert st["n_clusters"] >= 2
    assert st["cluster_size_min"] >= 1
    assert st["cluster_size_max"] >= st["cluster_size_min"]
    # imbalance is max/mean: >= 1000 permille by construction
    assert st["cluster_imbalance_permille"] >= 1000


def test_recall_curve_monotone_in_nprobe(spark, emb, tmp_path):
    path = str(tmp_path / "ivfsq8")
    write_ivf_sq8_index(emb, path)
    vectors = emb.select("vec_id", "embedding")
    curve = index_recall_curve(spark, path, vectors, num_queries=2,
                               k=5, nprobes=(1, 8))
    assert [r["nprobe"] for r in curve] == [1, 8]
    # probing everything cannot recall less than probing one cluster
    assert curve[1]["min_recall_permille"] >= \
        curve[0]["min_recall_permille"]
    # full probe + exact rerank over a self-included query: perfect
    assert curve[1]["min_recall_permille"] == 1000
    for r in curve:
        assert r["mean_recall_permille"] >= r["min_recall_permille"]


def test_recall_curve_flat_kind_single_point(spark, emb, tmp_path):
    path = str(tmp_path / "bq")
    write_bq_index(emb, path)
    vectors = emb.select("vec_id", "embedding")
    curve = index_recall_curve(spark, path, vectors, num_queries=2,
                               k=5)
    assert len(curve) == 1 and curve[0]["nprobe"] is None
    assert curve[0]["min_recall_permille"] > 0


def test_cli_stats_and_recall_curve(spark, emb, tmp_path, capsys):
    from public_transit_data_platform_sql_nosql_spark.__main__ import main

    emb_path = str(tmp_path / "emb")
    emb.select("vec_id", "embedding").write.parquet(emb_path)
    path = str(tmp_path / "idx")
    assert main(["vector-index", "build", "--path", path,
                 "--emb", emb_path, "--ivf"]) == 0
    capsys.readouterr()
    assert main(["vector-index", "stats", "--path", path]) == 0
    st = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["kind"] == "ivf_sq8" and st["n_vectors"] == emb.count()
    assert main(["vector-index", "recall-curve", "--path", path,
                 "--emb", emb_path, "--k", "5"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert [r["nprobe"] for r in out["curve"]] == [1, 2, 4, 8]
