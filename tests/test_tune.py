"""tune_index (round 11b): the closed tuning loop — measured recall
curve -> smallest nprobe meeting the target -> manifest-committed
``default_nprobe`` -> every ``nprobe=None`` serving call probes at it
(single, batch, streaming, CLI all share `_resolve_nprobe`).  Also the
maintainers' bump rung, which now PERSISTS its new setting through the
same commit shape instead of returning it as advice."""

from __future__ import annotations

import pytest

import __spark_entry__ as E
from public_transit_data_platform_sql_nosql_spark.jobs.versioned import (
    list_versions,
)
from public_transit_data_platform_sql_nosql_spark.pipeline import (
    similarity as sim,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return E._emb(spark, SF_DIR)


def _mk_emb(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>")


def test_tune_commits_default_nprobe_serving_resolves(spark, emb,
                                                      tmp_path):
    """tune at a reachable target commits default_nprobe as a
    manifest-only version bump, and nprobe=None serving (single AND
    batch) then returns exactly what the explicit setting returns."""
    path = str(tmp_path / "ivfsq8")
    sim.write_ivf_sq8_index(emb, path)
    v0 = list_versions(spark, path)[-1]
    st = sim.tune_index(spark, path, emb, target_recall_permille=100,
                        nprobes=(1, 2))
    assert st["decision"] == "tuned"        # untuned default is 2;
    assert st["nprobe"] == 1                # target 100 is met at 1
    assert st["previous_nprobe"] == 2
    assert [r["nprobe"] for r in st["curve"]] == [1, 2]
    m = sim._index_manifest(spark, path)
    assert m["default_nprobe"] == 1
    assert m["version"] == st["version"] > v0
    # manifest-only commit: same codes/centroids/quantizer refs
    assert m["codes"] and m["centroids"] and m["quantizer"]

    qv = [float(x) for x in emb.filter("vec_id = 7").head()["embedding"]]
    got = sim.ivf_sq8_index_topk(spark, path, qv, emb, k=5).collect()
    want = sim.ivf_sq8_index_topk(spark, path, qv, emb, k=5,
                                  nprobe=1).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]

    queries = emb.filter("vec_id % 37 = 0").selectExpr(
        "vec_id as query_id", "embedding")
    gb = sim.ivf_sq8_index_topk_batch(spark, path, queries, emb, k=5)
    wb = sim.ivf_sq8_index_topk_batch(spark, path, queries, emb, k=5,
                                      nprobe=1)
    assert sorted(map(tuple, gb.collect())) == \
        sorted(map(tuple, wb.collect()))

    # re-tuning at the same target is a noop: no new version
    st2 = sim.tune_index(spark, path, emb, target_recall_permille=100,
                         nprobes=(1, 2))
    assert st2["decision"] == "noop" and st2["nprobe"] == 1
    assert list_versions(spark, path)[-1] == st["version"]


def test_tune_flat_kind_commits_rerank_depth(spark, emb, tmp_path):
    """r13: the flat kinds are no longer 'nothing to tune' — their one
    quality knob is the exact-rerank depth, and tune_index sweeps it
    and commits default_rerank_mult exactly like the IVF nprobe
    commit (a pick equal to the constant fallback still pins)."""
    path = str(tmp_path / "bq")
    sim.write_bq_index(emb, path)
    v0 = list_versions(spark, path)[-1]
    st = sim.tune_index(spark, path, emb)
    assert st["decision"] == "tuned" and st["kind"] == "bq"
    assert "nprobe" not in st
    rm = st["rerank_mult"]
    m = sim._index_manifest(spark, path)
    assert m["default_rerank_mult"] == rm
    assert list_versions(spark, path)[-1] == st["version"] != v0
    # curve rows carry the rerank grid, nprobe stays None
    assert all(r["nprobe"] is None and "rerank_mult" in r
               for r in st["curve"])
    # re-tune at the same target: explicitly pinned and equal -> noop
    st2 = sim.tune_index(spark, path, emb)
    assert st2["decision"] == "noop" and st2["rerank_mult"] == rm
    assert list_versions(spark, path)[-1] == st["version"]


def test_tune_target_unreachable_writes_nothing(spark, emb, tmp_path,
                                                monkeypatch):
    """No measured depth meets the target -> decision as data, NO
    manifest write (serving deeper than measured would be a guess)."""
    path = str(tmp_path / "ivfsq8_unreach")
    sim.write_ivf_sq8_index(emb, path)
    v0 = list_versions(spark, path)[-1]
    monkeypatch.setattr(sim, "index_recall_curve", lambda *a, **k: [
        {"nprobe": 1, "min_recall_permille": 400,
         "mean_recall_permille": 600},
        {"nprobe": 2, "min_recall_permille": 700,
         "mean_recall_permille": 800},
    ])
    # rerank_mults=() pins the second rung OFF: this test isolates the
    # nprobe rung's refusal (the rerank rung would really measure the
    # index and reach the target on its corpus-covering ladder)
    st = sim.tune_index(spark, path, emb, target_recall_permille=900,
                        nprobes=(1, 2), rerank_mults=())
    assert st["decision"] == "target_unreachable"
    assert "nprobe" not in st
    assert list_versions(spark, path)[-1] == v0
    assert "default_nprobe" not in sim._index_manifest(spark, path)


def test_tune_validates_target_range(spark, emb, tmp_path):
    path = str(tmp_path / "ivfsq8_range")
    sim.write_ivf_sq8_index(emb, path)
    with pytest.raises(ValueError, match="target_recall_permille"):
        sim.tune_index(spark, path, emb, target_recall_permille=0)
    with pytest.raises(ValueError, match="target_recall_permille"):
        sim.tune_index(spark, path, emb, target_recall_permille=1500)


def test_upsert_carries_tuned_nprobe_forward(spark, emb, tmp_path):
    """An appended upsert after tune keeps serving at the tuned point
    (the manifest rewrite carries default_nprobe; only a rebuild —
    new centroids — resets it)."""
    path = str(tmp_path / "ivfsq8_carry")
    sim.write_ivf_sq8_index(emb, path)
    st = sim.tune_index(spark, path, emb, target_recall_permille=100,
                        nprobes=(1,))
    assert st["decision"] == "tuned" and st["nprobe"] == 1
    qv = [float(x) for x in emb.filter("vec_id = 3")
          .head()["embedding"]]
    up = sim.ivf_sq8_index_upsert(spark, path, _mk_emb(
        spark, [(990000, qv)]))
    assert up["decision"] == "appended"
    assert sim._index_manifest(spark, path)["default_nprobe"] == 1
    # compaction preserves it too ({**m} rewrite)
    cp = sim.compact_index(spark, path)
    assert cp["decision"] == "compacted"
    assert sim._index_manifest(spark, path)["default_nprobe"] == 1


def _two_group_base(spark):
    rows = []
    for i in range(20):
        rows.append((i, [1.0, 0.001 * i] + [0.0] * 6))
        rows.append((100 + i, [0.001 * i, 1.0] + [0.0] * 6))
    return _mk_emb(spark, rows)


def _straddle_batch_in_range(spark, n=16):
    """The test_kmeans straddle pattern kept INSIDE the stored
    quantizer's per-dim ranges (tilt down, pad dims stay 0.0) so the
    SQ8 drift screen doesn't flip the upsert to rebuild before the
    bump rung gets measured."""
    rows = []
    for i in range(n):
        v = [1.0, 1.0] + [0.0] * 6
        v[i % 2] -= 0.05
        rows.append((1000 + i, v))
    return _mk_emb(spark, rows)


def test_maintain_bump_persists_to_manifest(spark, tmp_path):
    """The bump rung commits its new setting: after decision
    'bump_nprobe', nprobe=None serving probes at the bumped depth with
    no caller threading (the loop the r10 maintainers left open)."""
    path = str(tmp_path / "ivfsq8_bump")
    base = _two_group_base(spark)
    sim.write_ivf_sq8_index(base, path, k=2, dim=8)
    batch = _straddle_batch_in_range(spark)
    vectors = base.unionByName(batch)
    st = sim.maintain_ivf_sq8_index(spark, path, batch, vectors,
                                    k=10, nprobe=1, sample_queries=4,
                                    recall_floor_permille=900)
    assert st["decision"] == "bump_nprobe"
    assert st["nprobe"] == 2
    m = sim._index_manifest(spark, path)
    assert m["default_nprobe"] == 2
    assert m["version"] == st["nprobe_version"]
    # and a later maintain at the SAME (now-default) depth reads the
    # manifest: nprobe=None resolves to the persisted 2
    st2 = sim.maintain_ivf_sq8_index(spark, path, batch, vectors,
                                     k=10, sample_queries=4,
                                     recall_floor_permille=900)
    assert st2["nprobe"] >= 2
    assert st2["decision"] == "ok"


# SLOW TIER (pytest.ini): stored-index/tune/streaming/CLI e2e --
# excluded from the driver's default gate; run with -m slow after
# touching this family (see the verify skill).
pytestmark = pytest.mark.slow
