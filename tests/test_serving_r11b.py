"""Round-11 serving polish: the vector-pipeline CLI's --kind switch
(end-to-end JSONL -> any index layout -> batch results) and FILTERED
streaming serving (allowed_path re-resolved per micro-batch)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from public_transit_data_platform_sql_nosql_spark.jobs.versioned import (
    read_version,
)
from public_transit_data_platform_sql_nosql_spark.pipeline.similarity import (
    _index_manifest,
    ivf_sq8_index_topk,
    write_ivf_sq8_index,
)
from public_transit_data_platform_sql_nosql_spark.streaming.jobs import (
    stream_vector_search,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return E._emb(spark, SF_DIR)


def _write_jsonl(path, n=40):
    with open(path, "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "doc_id": i, "text": f"transit doc {i} alpha beta "
                                     f"{'gamma ' * (i % 5)}",
                "lang": "en", "source": "t", "n_chars": 20}) + "\n")


@pytest.mark.parametrize("kind", ["bq", "ivf_pq"])
def test_vector_pipeline_kind_switch(spark, tmp_path, capsys, kind):
    from public_transit_data_platform_sql_nosql_spark.__main__ import main

    docs = str(tmp_path / "docs.jsonl")
    _write_jsonl(docs)
    wd = str(tmp_path / f"wd_{kind}")
    assert main(["vector-pipeline", "--docs", docs, "--workdir", wd,
                 "--kind", kind, "--k", "3", "--n-queries", "2"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["index_kind"] == kind
    assert out["n_results"] == 6          # 2 queries x k=3
    assert _index_manifest(spark, f"{wd}/index")["kind"] == kind
    res = spark.read.parquet(f"{wd}/results")
    assert res.columns == ["query_id", "rank", "neighbor_id",
                           "cos_sim"]
    # the self-query serves itself at rank 1
    top = res.filter("rank = 1").collect()
    assert all(r["query_id"] == r["neighbor_id"] and
               r["cos_sim"] == 1.0 for r in top)


def test_stream_vector_search_filtered(spark, emb, tmp_path):
    """allowed_path restricts every served batch to the allow-list —
    and matches the batch-path answer under the same filter (the
    widening contract, through the streaming edge)."""
    path = str(tmp_path / "idx")
    write_ivf_sq8_index(emb, path)
    allow_ids = [r["vec_id"] for r in
                 emb.orderBy(F.desc("vec_id")).limit(6).collect()]
    allowed_path = str(tmp_path / "allowed")
    emb.filter(F.col("vec_id").isin(allow_ids)).select("vec_id") \
        .write.parquet(allowed_path)
    qsrc = str(tmp_path / "qsrc")
    emb.filter(F.col("vec_id").isin([3, 7])).select(
        F.col("vec_id").alias("query_id"), "embedding") \
        .write.parquet(qsrc)
    results = str(tmp_path / "results")
    q = stream_vector_search(
        spark.readStream.schema("query_id long, embedding "
                                "array<double>").parquet(qsrc),
        path, emb, results, str(tmp_path / "ck"), k=5, nprobe=1,
        allowed_path=allowed_path)
    q.awaitTermination(120)
    served = read_version(spark, results)
    rows = served.collect()
    assert len(rows) == 10                 # both queries fill k=5
    assert {r["neighbor_id"] for r in rows} <= set(allow_ids)
    allowed = emb.filter(F.col("vec_id").isin(allow_ids)) \
        .select("vec_id")
    single = [(r["rank"], r["neighbor_id"]) for r in
              ivf_sq8_index_topk(
                  spark, path,
                  [float(x) for x in emb.filter("vec_id = 3")
                   .head()["embedding"]],
                  emb, k=5, nprobe=1, allowed=allowed).collect()]
    got = [(r["rank"], r["neighbor_id"]) for r in
           served.filter(F.col("query_id") == 3)
           .orderBy("rank").collect()]
    assert got == single


# SLOW TIER (pytest.ini): stored-index/tune/streaming/CLI e2e --
# excluded from the driver's default gate; run with -m slow after
# touching this family (see the verify skill).
pytestmark = pytest.mark.slow
