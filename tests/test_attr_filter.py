"""Attribute-pushdown filtered ANN on the flagship layout (round 11b):
``write_ivf_sq8_index(attrs=...)`` stores filterable scalar columns
WITH the codes, and ``where=`` on the serving paths pushes the
predicate to the codes scan (PushedFilters) instead of semi-joining an
id list — the multi-tenant / corpus-facet serving shape.  Same
adaptive probe widening as ``allowed=``, counts running under the
pushed predicate; upserts must carry the same attribute columns."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
from public_transit_data_platform_sql_nosql_spark.pipeline import (
    similarity as sim,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return E._emb(spark, SF_DIR)


def _attrs(emb):
    # deterministic facet: lang cycles en/fr/de by vec_id
    return emb.select(
        "vec_id",
        F.element_at(F.array(F.lit("en"), F.lit("fr"), F.lit("de")),
                     (F.col("vec_id") % 3 + 1).cast("int"))
        .alias("lang"))


@pytest.fixture(scope="module")
def attr_index(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("attr") / "ivfsq8")
    sim.write_ivf_sq8_index(emb, path, attrs=_attrs(emb))
    return path


def test_where_equals_allowed_form(spark, emb, attr_index):
    """The pushdown form returns exactly what the id-list form returns
    for the equivalent filter — same rows, same ranks."""
    qv = [float(x) for x in emb.filter("vec_id = 7")
          .head()["embedding"]]
    by_where = sim.ivf_sq8_index_topk(
        spark, attr_index, qv, emb, k=5, nprobe=2,
        where="lang = 'en'").collect()
    allowed = _attrs(emb).filter("lang = 'en'").select("vec_id")
    by_allowed = sim.ivf_sq8_index_topk(
        spark, attr_index, qv, emb, k=5, nprobe=2,
        allowed=allowed).collect()
    assert [tuple(r) for r in by_where] == \
        [tuple(r) for r in by_allowed]
    # and every served neighbor satisfies the predicate
    assert all(int(r["neighbor_id"]) % 3 == 0 for r in by_where)


def test_where_reaches_scan_as_pushed_filter(spark, emb, attr_index):
    """The plan claim: the predicate lands on the CODES scan as a
    parquet PushedFilters entry — no join in the candidate stage."""
    from public_transit_data_platform_sql_nosql_spark.plans import (
        executed_plan,
    )

    qv = [float(x) for x in emb.filter("vec_id = 7")
          .head()["embedding"]]
    prev = spark.conf.get("spark.sql.maxMetadataStringLength")
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    try:
        plan = executed_plan(sim.ivf_sq8_index_topk(
            spark, attr_index, qv, emb, k=5, nprobe=2,
            where="lang = 'en'"))
    finally:
        spark.conf.set("spark.sql.maxMetadataStringLength", prev)
    codes_scans = [
        ln for ln in plan.split("\n")
        if "FileScan parquet" in ln and "/codes" in ln]
    assert codes_scans
    assert any("EqualTo(lang,en)" in ln.split("PushedFilters:")[-1]
               for ln in codes_scans if "PushedFilters:" in ln), plan


def test_where_widens_probes(spark, tmp_path):
    """A facet stored only OUTSIDE the query's best cluster widens the
    probe set instead of starving the shortlist (the allowed= contract,
    pushdown form)."""
    from tests.test_rebalance import _skewed_corpus

    corpus = _skewed_corpus(spark)
    # hot group (axis 0) carries lang 'a'; cold group (axis 1) 'b'
    attrs = corpus.select(
        "vec_id",
        F.when(F.element_at("embedding", 1) > 0.5, "a")
        .otherwise("b").alias("lang"))
    path = str(tmp_path / "widen")
    sim.write_ivf_sq8_index(corpus, path, k=2, dim=8, attrs=attrs)
    qv = [1.0, 0.015] + [0.0] * 6          # firmly in the hot cluster
    got = sim.ivf_sq8_index_topk(spark, path, qv, corpus, k=3,
                                 nprobe=1, where="lang = 'b'").collect()
    assert len(got) == 3                    # widened past cluster 1
    cold = {int(r["vec_id"]) for r in attrs.filter("lang = 'b'")
            .collect()}
    assert all(int(r["neighbor_id"]) in cold for r in got)


def test_batch_where_matches_single(spark, emb, attr_index):
    queries = emb.filter("vec_id % 41 = 0").selectExpr(
        "vec_id as query_id", "embedding")
    batch = sim.ivf_sq8_index_topk_batch(
        spark, attr_index, queries, emb, k=4, nprobe=2,
        where="lang = 'fr'").collect()
    rows_by_q = {}
    for r in batch:
        rows_by_q.setdefault(int(r["query_id"]), []).append(
            (int(r["rank"]), int(r["neighbor_id"]), r["cos_sim"]))
    for q in queries.collect():
        single = sim.ivf_sq8_index_topk(
            spark, attr_index, [float(x) for x in q["embedding"]],
            emb, k=4, nprobe=2, where="lang = 'fr'").collect()
        assert sorted(rows_by_q[int(q["query_id"])]) == sorted(
            (int(r["rank"]), int(r["neighbor_id"]), r["cos_sim"])
            for r in single)


def test_upsert_carries_attrs_and_contract(spark, emb, tmp_path):
    path = str(tmp_path / "up")
    sim.write_ivf_sq8_index(emb, path, attrs=_attrs(emb))
    assert sim._index_manifest(spark, path)["attrs"] == ["lang"]

    qv = [float(x) for x in emb.filter("vec_id = 3")
          .head()["embedding"]]
    # attrs as columns ON the batch (the streaming-feed shape)
    batch = spark.createDataFrame(
        [(970001, qv, "en")],
        "vec_id long, embedding array<double>, lang string")
    st = sim.ivf_sq8_index_upsert(spark, path, batch)
    assert st["decision"] == "appended"
    merged = emb.select("vec_id", "embedding").unionByName(
        batch.select("vec_id", "embedding"))
    got = sim.ivf_sq8_index_topk(spark, path, qv, merged,
                                 k=3, nprobe=8, where="lang = 'en'")
    assert 970001 in {int(r["neighbor_id"]) for r in got.collect()}

    # keyed replace keeps every survivor's attrs queryable
    st2 = sim.ivf_sq8_index_upsert(spark, path, batch)
    assert st2["decision"] == "replaced"
    n_en = sim._manifest_codes(
        spark, path, sim._index_manifest(spark, path)) \
        .filter("lang = 'en'").count()
    assert n_en == _attrs(emb).filter("lang = 'en'").count() + 1

    # a bare batch is refused — NULL attrs would silently vanish from
    # every where= filter
    bare = spark.createDataFrame(
        [(970002, qv)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="missing"):
        sim.ivf_sq8_index_upsert(spark, path, bare)

    # and attrs against an attr-less index are refused too
    plain = str(tmp_path / "plain")
    sim.write_ivf_sq8_index(emb, plain)
    with pytest.raises(ValueError, match="no attribute columns"):
        sim.ivf_sq8_index_upsert(
            spark, plain, bare, attrs=_attrs(emb))


def test_attrs_survive_compact_and_rebalance(spark, tmp_path):
    from tests.test_rebalance import _skewed_corpus

    corpus = _skewed_corpus(spark)
    attrs = corpus.select(
        "vec_id", (F.col("vec_id") % 2 == 0).cast("string")
        .alias("even"))
    path = str(tmp_path / "cycle")
    sim.write_ivf_sq8_index(corpus, path, k=2, dim=8, attrs=attrs)
    n_even = attrs.filter("even = 'true'").count()

    st = sim.rebalance_index(spark, path, corpus,
                             max_imbalance_permille=1500)
    assert st["decision"] == "split"
    m = sim._index_manifest(spark, path)
    assert m["attrs"] == ["even"]           # {**m} rewrite carries it
    assert sim._manifest_codes(spark, path, m) \
        .filter("even = 'true'").count() == n_even

    cp = sim.compact_index(spark, path)
    assert cp["decision"] == "compacted"
    m2 = sim._index_manifest(spark, path)
    assert m2["attrs"] == ["even"]
    assert sim._manifest_codes(spark, path, m2) \
        .filter("even = 'true'").count() == n_even


def test_maintain_rebuild_preserves_attrs(spark, tmp_path):
    """The retrain rung never strips filterability: a drift-forced
    rebuild self-carries the stored attribute columns, with the
    refused batch's attrs taken from the batch itself (they never
    reached the codes)."""
    base = spark.createDataFrame(
        [(i, [1.0, 0.001 * i] + [0.0] * 6, "en") for i in range(12)]
        + [(100 + i, [0.001 * i, 1.0] + [0.0] * 6, "fr")
           for i in range(12)],
        "vec_id long, embedding array<double>, lang string")
    path = str(tmp_path / "rebuild")
    sim.write_ivf_sq8_index(base.select("vec_id", "embedding"), path,
                            k=2, dim=8,
                            attrs=base.select("vec_id", "lang"))
    wild = spark.createDataFrame(
        [(900 + i, [100.0 + i, 50.0] + [0.0] * 6, "de")
         for i in range(3)],
        "vec_id long, embedding array<double>, lang string")
    vectors = base.select("vec_id", "embedding").unionByName(
        wild.select("vec_id", "embedding"))
    st = sim.maintain_ivf_sq8_index(spark, path, wild, vectors, k=5)
    assert st["decision"] == "rebuild"
    m = sim._index_manifest(spark, path)
    assert m["attrs"] == ["lang"]
    codes = sim._manifest_codes(spark, path, m)
    assert codes.count() == 27
    assert codes.filter("lang IS NULL").count() == 0
    assert codes.filter("lang = 'de'").count() == 3   # from the batch


@pytest.mark.parametrize("kind", ["ivf_pq", "ivf_bq"])
def test_where_pushdown_other_ivf_kinds(spark, tmp_path, kind):
    """The pushdown contract is uniform across the cluster-partitioned
    layouts: where == allowed-form results, upsert carries attrs
    (batch-column shape), bare batches refused."""
    from tests.test_rebalance import _skewed_corpus

    dim = 8 if kind == "ivf_pq" else 64
    corpus = _skewed_corpus(spark, dim=dim).localCheckpoint(eager=True)
    attrs = corpus.select(
        "vec_id",
        F.when(F.element_at("embedding", 1) > 0.5, "a")
        .otherwise("b").alias("lang"))
    path = str(tmp_path / kind)
    if kind == "ivf_pq":
        sim.write_ivf_pq_index(corpus, path, k=2, dim=dim, attrs=attrs)
        serve, upsert = sim.ivf_pq_index_topk, sim.ivf_pq_index_upsert
    else:
        sim.write_ivf_bq_index(corpus, path, k=2, dim=dim, attrs=attrs)
        serve, upsert = sim.ivf_bq_index_topk, sim.ivf_bq_index_upsert
    assert sim._index_manifest(spark, path)["attrs"] == ["lang"]

    qv = [1.0, 0.015] + [0.0] * (dim - 2)
    by_where = serve(spark, path, qv, corpus, k=3, nprobe=1,
                     where="lang = 'b'").collect()
    by_allowed = serve(spark, path, qv, corpus, k=3, nprobe=1,
                       allowed=attrs.filter("lang = 'b'")
                       .select("vec_id")).collect()
    assert len(by_where) == 3               # widened past the hot cluster
    assert [tuple(r) for r in by_where] == \
        [tuple(r) for r in by_allowed]

    batch = spark.createDataFrame(
        [(970001, qv, "b")],
        "vec_id long, embedding array<double>, lang string")
    st = upsert(spark, path, batch)
    assert st["decision"] == "appended"
    m = sim._index_manifest(spark, path)
    assert m["attrs"] == ["lang"]
    assert sim._manifest_codes(spark, path, m) \
        .filter("lang = 'b'").count() == 5  # 4 cold + the upsert

    bare = spark.createDataFrame(
        [(970002, qv)], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="missing"):
        upsert(spark, path, bare)


# SLOW TIER (pytest.ini): stored-index/tune/streaming/CLI e2e --
# excluded from the driver's default gate; run with -m slow after
# touching this family (see the verify skill).
pytestmark = pytest.mark.slow
