"""Round-13 surface: ADC (asymmetric-distance) PQ serving — per-query
lookup tables make candidate scoring ksub-independent — and everything
it unlocks: the ``PQ_INDEX_KSUB=256`` stored-layout default, the PQ
maintainers' rebuild-at-HIGHER-RESOLUTION rung (the wire from
``tune_index``'s ``target_unreachable``), manifest-fingerprinted driver
caches (a delete-and-rebuild at the same path can no longer serve
stale centroids/codebooks), IVF-only operating-point reporting in
``index_stats``, and attrs ``where=`` pushdown on BOTH hybrid
retrieval arms (library + CLI)."""

from __future__ import annotations

import shutil

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


@pytest.fixture(scope="module")
def emb(spark):
    return E._emb(spark, SF_DIR).persist()


def _qvec(emb, vid):
    return [float(x)
            for x in emb.filter(f"vec_id = {vid}").head()["embedding"]]


def _min_recall(spark, emb, path, k=10, nq=6):
    approx = exact = None
    qs = [(int(r["vec_id"]), [float(x) for x in r["embedding"]])
          for r in emb.orderBy("vec_id").limit(nq).collect()]
    for qid, qv in qs:
        a = sim.pq_index_topk(spark, path, qv, emb, k=k).select(
            F.lit(qid).cast("long").alias("query_id"),
            F.col("neighbor_id"))
        qcol = F.array(*[F.lit(float(x)) for x in qv])
        e = (emb.select("vec_id",
                        F.round(sim.cosine(F.col("embedding"), qcol), 6)
                        .alias("cos_sim"))
             .orderBy(F.desc("cos_sim"), F.asc("vec_id")).limit(k)
             .select(F.lit(qid).cast("long").alias("query_id"),
                     F.col("vec_id").alias("neighbor_id")))
        approx = a if approx is None else approx.unionByName(a)
        exact = e if exact is None else exact.unionByName(e)
    row = (sim.ann_recall(approx, exact)
           .agg(F.min("recall_permille").alias("mn")).collect()[0])
    return int(row["mn"])


# ---------------------------------------------------------------------------
# ADC scoring: the decomposed lookup score IS the reconstruction cosine


def test_adc_score_equals_reconstruction_cosine(spark, emb, tmp_path):
    """``_pq_adc_score``'s two-lookup fold must equal the retired
    literal-walk hat's score — cosine(q, concat of the candidate's m
    codewords) — computed independently here with numpy from the
    stored codebooks and codes."""
    import numpy as np

    path = str(tmp_path / "adc")
    sim.write_pq_index(emb, path)
    m_an = sim._index_manifest(spark, path)
    m, dim, kk = int(m_an["m"]), int(m_an["dim"]), int(m_an["k"])
    sub = dim // m
    qv = _qvec(emb, 3)
    adc = sim._pq_adc_frame(spark, path, m_an, [(0, qv)]) \
        .drop("query_id")
    below = sim._pq_adc_candidates(
        spark, path, m_an,
        sim.read_index_codes(spark, path).select("vec_id", "codes"))
    scored = {
        int(r["vec_id"]): r["s"]
        for r in below
        .join(F.broadcast(adc))
        .select("vec_id",
                sim._pq_adc_score(m).alias("s")).collect()
    }
    books = np.zeros((m, kk, sub))
    for r in spark.read.parquet(
            f"{path}/{m_an['codebooks']}").collect():
        books[int(r["subspace"]), int(r["code"])] = [
            float(x) for x in r["centroid"]]
    q = np.asarray(qv)
    qn = float(np.sqrt(q @ q))
    for r in sim.read_index_codes(spark, path).select(
            "vec_id", "codes").collect():
        hat = np.concatenate([books[j, c]
                              for j, c in enumerate(r["codes"])])
        hn = float(np.sqrt(hat @ hat))
        want = (float(hat @ q) / qn / hn) if hn else None
        got = scored[int(r["vec_id"])]
        if want is None:
            assert got is None      # zero-norm hat scores NULL
        else:
            assert got == pytest.approx(want, abs=1e-9)


def test_pq_default_ksub_is_256_and_recall_lifts(spark, emb, tmp_path):
    """The stored-layout default trains at PQ_INDEX_KSUB=256 (codes
    already occupy the byte — the resolution is storage-free and, with
    ADC, serve-time-free) and measurably outranks the old ksub=16
    in-flight resolution on the same corpus: min sampled recall@10 was
    700 permille at ksub=16 and is exact (1000) at 256 here."""
    p16 = str(tmp_path / "k16")
    p256 = str(tmp_path / "k256")
    sim.write_pq_index(emb, p16, k=16)
    sim.write_pq_index(emb, p256)                  # the default
    assert sim._index_manifest(spark, p256)["k"] == \
        sim.PQ_INDEX_KSUB == 256
    r16 = _min_recall(spark, emb, p16)
    r256 = _min_recall(spark, emb, p256)
    assert r256 >= 950 and r256 > r16


def test_pq_batch_matches_single_at_default_ksub(spark, emb, tmp_path):
    path = str(tmp_path / "pqb")
    sim.write_pq_index(emb, path)
    ids = [3, 7, 11]
    queries = spark.createDataFrame(
        [(i, _qvec(emb, i)) for i in ids],
        "query_id long, embedding array<double>")
    batch = sim.pq_index_topk_batch(
        spark, path, queries, emb, k=5).collect()
    by_q: dict[int, list] = {}
    for r in sorted(batch, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(int(r["query_id"]), []).append(
            (int(r["rank"]), int(r["neighbor_id"]),
             float(r["cos_sim"])))
    for i in ids:
        single = [(int(r["rank"]), int(r["neighbor_id"]),
                   float(r["cos_sim"]))
                  for r in sim.pq_index_topk(
                      spark, path, _qvec(emb, i), emb, k=5).collect()]
        assert by_q[i] == single


def test_ivf_pq_batch_matches_single_at_default_ksub(spark, emb,
                                                     tmp_path):
    path = str(tmp_path / "ivfpqb")
    sim.write_ivf_pq_index(emb, path)
    ids = [3, 7, 11]
    queries = spark.createDataFrame(
        [(i, _qvec(emb, i)) for i in ids],
        "query_id long, embedding array<double>")
    batch = sim.ivf_pq_index_topk_batch(
        spark, path, queries, emb, k=5, nprobe=3).collect()
    by_q: dict[int, list] = {}
    for r in sorted(batch, key=lambda r: (r["query_id"], r["rank"])):
        by_q.setdefault(int(r["query_id"]), []).append(
            (int(r["rank"]), int(r["neighbor_id"]),
             float(r["cos_sim"])))
    for i in ids:
        single = [(int(r["rank"]), int(r["neighbor_id"]),
                   float(r["cos_sim"]))
                  for r in sim.ivf_pq_index_topk(
                      spark, path, _qvec(emb, i), emb, k=5,
                      nprobe=3).collect()]
        assert by_q[i] == single


# ---------------------------------------------------------------------------
# the rebuild-at-higher-resolution rung


def test_maintain_pq_escalates_ksub(spark, emb, tmp_path):
    """A recall floor the stored low-resolution codebooks cannot reach
    triggers the rebuild rung, which retrains at PQ_INDEX_KSUB — and
    records the escalation as data (``ksub`` / ``ksub_escalated``)."""
    path = str(tmp_path / "esc")
    sim.write_pq_index(emb, path, k=2)             # 1-bit codes
    batch = emb.orderBy("vec_id").limit(3)
    out = sim.maintain_pq_index(spark, path, batch, emb,
                                recall_floor_permille=950)
    assert out["decision"] == "rebuild"
    assert out["ksub_escalated"] is True
    assert out["ksub"] == sim.PQ_INDEX_KSUB
    man = sim._index_manifest(spark, path)
    assert int(man["k"]) == sim.PQ_INDEX_KSUB
    assert out["recall_after_rebuild_permille"] > out["recall_permille"]
    assert out["recall_after_rebuild_permille"] >= 950


def test_maintain_pq_keeps_resolution_at_or_above_default(spark, emb,
                                                          tmp_path):
    """An index already at the default resolution rebuilds WITHOUT
    escalation (ksub_escalated False, same ksub) — the rung raises
    resolution, never lowers or churns it."""
    path = str(tmp_path / "keep")
    sim.write_pq_index(emb, path)                  # already 256
    batch = emb.orderBy("vec_id").limit(3)
    out = sim.maintain_pq_index(spark, path, batch, emb,
                                recall_floor_permille=1001)
    assert out["decision"] == "rebuild"
    assert out["ksub"] == sim.PQ_INDEX_KSUB
    assert out["ksub_escalated"] is False


def test_maintain_ivf_pq_escalates_ksub(spark, emb, tmp_path):
    """Same rung on the composed layout: bump_nprobe cannot recover a
    code-resolution floor (probing deeper re-ranks the same coarse
    codes), so the ladder falls through to the escalating rebuild."""
    path = str(tmp_path / "ivfesc")
    sim.write_ivf_pq_index(emb, path, ksub=2)
    man0 = sim._index_manifest(spark, path)
    n_cents = spark.read.parquet(
        f"{path}/{man0['centroids']}").count()
    batch = emb.orderBy("vec_id").limit(3)
    # probe at FULL depth so the floor isolates code resolution: the
    # bump rung is already maxed (bumped == nprobe == n_clusters), so
    # only the escalating rebuild can recover — and after it, the same
    # full-depth probe must clear the floor (a default-nprobe probe
    # would stay probe-limited and prove nothing about ksub)
    out = sim.maintain_ivf_pq_index(spark, path, batch, emb,
                                    nprobe=n_cents,
                                    recall_floor_permille=950)
    assert out["decision"] == "rebuild"
    assert out["ksub_escalated"] is True
    man = sim._index_manifest(spark, path)
    assert int(man["k"]) == sim.PQ_INDEX_KSUB
    assert out["recall_after_rebuild_permille"] >= 950


# ---------------------------------------------------------------------------
# manifest-fingerprinted driver caches


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def _corpora(spark, dim=8):
    """Corpus A clusters on axes 0/1; corpus B on axes 2/3 — A's
    centroids rank the WRONG clusters for B's queries, so a stale
    cache is visible in the results, not just in timing."""
    a = _mk(spark, [(i, [1.0 + 0.001 * i, 0.0] + [0.0] * (dim - 2))
                    for i in range(10)] +
            [(10 + i, [0.0, 1.0 + 0.001 * i] + [0.0] * (dim - 2))
             for i in range(10)])
    b = _mk(spark, [(i, [0.0, 0.0, 1.0 + 0.001 * i, 0.0]
                     + [0.0] * (dim - 4)) for i in range(10)] +
            [(10 + i, [0.0, 0.0, 0.0, 1.0 + 0.001 * i]
              + [0.0] * (dim - 4)) for i in range(10)])
    return a, b


def test_centroid_cache_survives_same_path_rebuild(spark, tmp_path):
    """Delete-and-rebuild at the same path restarts versions at 0 —
    (path, version) alone would serve corpus A's cached centroids
    against corpus B's codes.  The manifest-file fingerprint in the
    cache key makes the hot-cache serve equal the cold one."""
    dim = 8
    a, b = _corpora(spark, dim)
    path = str(tmp_path / "same")
    sim.write_ivf_sq8_index(a, path, k=2, dim=dim)
    sim.ivf_sq8_index_topk(spark, path, [1.0] + [0.0] * (dim - 1),
                           a, k=3, nprobe=1).collect()  # cache hot
    v_a = int(sim._index_manifest(spark, path)["version"])
    shutil.rmtree(path)
    sim.write_ivf_sq8_index(b, path, k=2, dim=dim)
    assert int(sim._index_manifest(spark, path)["version"]) == v_a
    qb = [0.0, 0.0, 0.0, 1.0] + [0.0] * (dim - 4)
    hot = [int(r["neighbor_id"]) for r in sim.ivf_sq8_index_topk(
        spark, path, qb, b, k=3, nprobe=1).collect()]
    sim._CENTS_CACHE.clear()
    cold = [int(r["neighbor_id"]) for r in sim.ivf_sq8_index_topk(
        spark, path, qb, b, k=3, nprobe=1).collect()]
    assert hot == cold == [10, 11, 12]


def test_pq_books_cache_survives_same_path_rebuild(spark, tmp_path):
    dim = 8
    a, b = _corpora(spark, dim)
    path = str(tmp_path / "samepq")
    sim.write_pq_index(a, path, dim=dim)
    sim.pq_index_topk(spark, path, [1.0] + [0.0] * (dim - 1), a,
                      k=3).collect()               # books cache hot
    shutil.rmtree(path)
    sim.write_pq_index(b, path, dim=dim)
    qb = [0.0, 0.0, 0.0, 1.0] + [0.0] * (dim - 4)
    hot = [int(r["neighbor_id"]) for r in sim.pq_index_topk(
        spark, path, qb, b, k=3).collect()]
    sim._PQ_BOOKS_CACHE.clear()
    cold = [int(r["neighbor_id"]) for r in sim.pq_index_topk(
        spark, path, qb, b, k=3).collect()]
    assert hot == cold == [10, 11, 12]


# ---------------------------------------------------------------------------
# index_stats reports the operating point for IVF kinds ONLY


def test_index_stats_operating_point_ivf_only(spark, emb, tmp_path):
    flat = str(tmp_path / "flat")
    sim.write_sq8_index(emb, flat)
    st = sim.index_stats(spark, flat)
    assert "default_nprobe" not in st and "tuned" not in st
    # ... but the RERANK operating point is every kind's knob
    assert st["default_rerank_mult"] == sim.SQ_RERANK_MULT
    assert st["rerank_tuned"] is False

    ivf = str(tmp_path / "ivf")
    sim.write_ivf_sq8_index(emb, ivf, k=4)
    st2 = sim.index_stats(spark, ivf)
    assert st2["default_nprobe"] == sim.DEFAULT_NPROBE
    assert st2["tuned"] is False
    assert st2["default_rerank_mult"] == sim.SQ_RERANK_MULT
    assert st2["rerank_tuned"] is False


# ---------------------------------------------------------------------------
# tunable rerank depth — the flat kinds' operating point


def _hamming_blind_bucket(spark, n=24, dim=64, base=0):
    """One sign-bucket whose WITHIN-bucket ranking Hamming cannot see:
    every vector is [1, a_j, 0...] with a_j > 0 (identical sign bits),
    the low ids carry a_j far from vec 0's and the TOP ids carry a_j
    closest to it — so a shallow Hamming shortlist (tie-broken by
    vec_id ASC) picks the low-id decoys and only a deeper exact rerank
    recovers vec 0's true neighbors."""
    rows = [(base + 0, [1.0, 0.9] + [0.0] * (dim - 2))]
    for j in range(1, n - 4):
        rows.append((base + j,
                     [1.0, 0.1 + 0.0001 * j] + [0.0] * (dim - 2)))
    for i, a in enumerate((0.89, 0.88, 0.87, 0.86)):
        rows.append((base + n - 4 + i,
                     [1.0, a] + [0.0] * (dim - 2)))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


def test_tune_bq_rerank_depth_changes_served_results(spark, tmp_path):
    """End to end on a corpus where Hamming ties within the bucket:
    the untuned (shallow) serve returns the low-id decoys, tune_index
    measures the rerank curve and commits the smallest depth meeting
    the target, and the SAME serving call (rerank_mult=None) then
    returns the true neighbors — the operating point changed serving
    without any caller threading a number through."""
    corpus = _hamming_blind_bucket(spark).localCheckpoint(eager=True)
    path = str(tmp_path / "bq")
    sim.write_bq_index(corpus, path)
    # true top-5 for vec 0: itself + the four a~0.86-0.89 high ids
    truth = {0, 20, 21, 22, 23}
    shallow = {int(r["neighbor_id"]) for r in sim.bq_index_topk(
        spark, path, [1.0, 0.9] + [0.0] * 62, corpus, k=5,
        rerank_mult=1).collect()}
    assert shallow == {0, 1, 2, 3, 4}       # Hamming-tie decoys
    st = sim.tune_index(spark, path, corpus, k=5,
                        rerank_mults=(1, 2, 4, 8))
    assert st["decision"] == "tuned"
    assert st["rerank_mult"] == 8           # 5*8 covers the 24 rows
    served = {int(r["neighbor_id"]) for r in sim.bq_index_topk(
        spark, path, [1.0, 0.9] + [0.0] * 62, corpus,
        k=5).collect()}                     # rerank_mult=None resolves
    assert served == truth
    # the curve recorded WHY: min recall climbs with depth
    mins = [r["min_recall_permille"] for r in st["curve"]]
    assert mins[0] < 950 <= mins[-1]


def test_tune_ivf_second_rung_commits_both_knobs(spark, tmp_path):
    """An IVF index whose probe sweep cannot reach the target (codes
    cannot rank within the probed cluster) falls through to the rerank
    rung: ceiling-check at full probe, nested probe sweep at the first
    depth that clears, ONE manifest bump carrying both knobs."""
    from pyspark.sql import functions as _F

    # bucket A: 120 Hamming-blind rows (ids 0-119); bucket B: 24 far
    # rows on other axes (ids 200+) so k=2 clustering separates them
    a = _hamming_blind_bucket(spark, n=120)
    b = _hamming_blind_bucket(spark, n=24, base=200).select(
        "vec_id",
        _F.expr("transform(sequence(1, 64), i -> CASE WHEN i = 3 THEN "
                "element_at(embedding, 1) WHEN i = 4 THEN "
                "element_at(embedding, 2) ELSE 0.0D END)")
        .alias("embedding"))
    corpus = a.unionByName(b).localCheckpoint(eager=True)
    path = str(tmp_path / "ivfbq")
    sim.write_ivf_bq_index(corpus, path, k=2)
    st = sim.tune_index(spark, path, corpus, k=5,
                        rerank_mults=(16, 32))
    assert st["decision"] == "tuned"
    assert st["rerank_mult"] == 32          # 5*16=80 misses ids 116+
    assert st["nprobe"] >= 1
    assert st["rerank_curve"], "second rung must record its points"
    m = sim._index_manifest(spark, path)
    assert m["default_rerank_mult"] == 32
    assert m["default_nprobe"] == st["nprobe"]
    # the committed pair serves the true neighbors with no overrides
    served = {int(r["neighbor_id"]) for r in sim.ivf_bq_index_topk(
        spark, path, [1.0, 0.9] + [0.0] * 62, corpus, k=5).collect()}
    assert served == {0, 116, 117, 118, 119}


def test_maintain_ivf_bq_bump_rerank_rung(spark, tmp_path):
    """The IVF x BQ maintainer's BQ-specific recovery: probing is
    maxed and a rebuild could only refresh centroids (signs never
    retrain), so the ladder doubles the exact-rerank depth and commits
    it as default_rerank_mult — decision as data, serving picks it up
    with no caller threading."""
    from pyspark.sql import functions as _F

    a = _hamming_blind_bucket(spark, n=120)
    b = _hamming_blind_bucket(spark, n=24, base=200).select(
        "vec_id",
        _F.expr("transform(sequence(1, 64), i -> CASE WHEN i = 3 THEN "
                "element_at(embedding, 1) WHEN i = 4 THEN "
                "element_at(embedding, 2) ELSE 0.0D END)")
        .alias("embedding"))
    corpus = a.unionByName(b).localCheckpoint(eager=True)
    path = str(tmp_path / "ivfbq")
    sim.write_ivf_bq_index(corpus, path, k=2)
    batch = corpus.orderBy("vec_id").limit(3)
    out = sim.maintain_ivf_bq_index(spark, path, batch, corpus,
                                    recall_floor_permille=950)
    # nprobe starts at the full 2-cluster depth's cap=2 fallback, so
    # the bump rung has no headroom; the rerank rung recovers: 8 -> 16
    # covers the 124-row corpus at k=10
    assert out["decision"] == "bump_rerank"
    assert out["rerank_mult"] == 2 * sim.BQ_RERANK_MULT
    assert out["recall_after_rerank_permille"] >= 950
    assert out["recall_permille"] < 950
    m = sim._index_manifest(spark, path)
    assert m["default_rerank_mult"] == 2 * sim.BQ_RERANK_MULT
    assert m["version"] == out["rerank_version"]
    # serve at the maintainer's k: the committed depth (10*16 = 160)
    # covers the 124-row corpus, so the true neighbors surface (at
    # k=5 the same depth would shortlist only 80 rows — the rung
    # commits a depth measured FOR the probe's k, as tune does)
    served = {int(r["neighbor_id"]) for r in sim.ivf_bq_index_topk(
        spark, path, [1.0, 0.9] + [0.0] * 62, corpus, k=10).collect()}
    assert {0, 116, 117, 118, 119}.issubset(served)


# ---------------------------------------------------------------------------
# hybrid where= — attrs pushdown on BOTH arms


@pytest.fixture(scope="module")
def hybrid_fixture(spark, emb, tmp_path_factory):
    docs = E._aug(spark, SF_DIR)
    attrs = emb.select(
        "vec_id",
        F.when(F.col("vec_id") % 2 == 0, "a").otherwise("b")
        .alias("lang"))
    path = str(tmp_path_factory.mktemp("hyw") / "idx")
    sim.write_sq8_index(emb, path, attrs=attrs)
    queries = spark.createDataFrame(
        [(1, ["spark", "window"], _qvec(emb, 1)),
         (2, ["merge", "data"], _qvec(emb, 2))],
        "query_id long, terms array<string>, embedding array<double>")
    return docs, path, queries


def test_hybrid_batch_where_filters_both_arms(spark, emb,
                                              hybrid_fixture):
    docs, path, queries = hybrid_fixture
    got = ptext.hybrid_index_search_batch(
        spark, docs, path, emb, queries, k=5, pool=20,
        where="lang = 'a'").collect()
    assert got and all(int(r["doc_id"]) % 2 == 0 for r in got)
    # where= is the pushdown form of the equivalent allowed= id-list
    allowed = emb.filter("vec_id % 2 = 0").select("vec_id")
    via_allowed = ptext.hybrid_index_search_batch(
        spark, docs, path, emb, queries, k=5, pool=20,
        allowed=allowed).collect()
    key = lambda rows: {  # noqa: E731
        (int(r["query_id"]), int(r["doc_id"]), int(r["rrf_micro"]))
        for r in rows}
    assert key(got) == key(via_allowed)


def test_hybrid_single_where_matches_batch(spark, emb, hybrid_fixture):
    docs, path, queries = hybrid_fixture
    single = ptext.hybrid_index_search(
        spark, docs, path, emb, ["spark", "window"], _qvec(emb, 1),
        k=5, pool=20, where="lang = 'a'").collect()
    batch = [r for r in ptext.hybrid_index_search_batch(
        spark, docs, path, emb, queries, k=5, pool=20,
        where="lang = 'a'").collect() if int(r["query_id"]) == 1]
    assert {(int(r["doc_id"]), int(r["rrf_micro"])) for r in single} \
        == {(int(r["doc_id"]), int(r["rrf_micro"])) for r in batch}


def test_hybrid_where_refused_without_attrs(spark, emb, tmp_path):
    docs = E._aug(spark, SF_DIR)
    path = str(tmp_path / "noattrs")
    sim.write_sq8_index(emb, path)                 # attr-less
    queries = spark.createDataFrame(
        [(1, ["spark"], _qvec(emb, 1))],
        "query_id long, terms array<string>, embedding array<double>")
    with pytest.raises(ValueError, match="no attribute columns"):
        ptext.hybrid_index_search_batch(
            spark, docs, path, emb, queries, where="lang = 'a'")


def test_cli_tune_rerank_grid(spark, tmp_path, capsys):
    """CLI tune on a flat kind commits default_rerank_mult from a
    caller-pinned --rerank-mults grid; stats reports the committed
    rerank operating point."""
    import json as _json

    from public_transit_data_platform_sql_nosql_spark.__main__ import (
        main,
    )

    corpus = _hamming_blind_bucket(spark).localCheckpoint(eager=True)
    emb_p = str(tmp_path / "emb")
    corpus.write.parquet(emb_p)
    idx = str(tmp_path / "idx")
    sim.write_bq_index(corpus, idx)
    rc = main(["vector-index", "tune", "--path", idx, "--emb", emb_p,
               "--k", "5", "--rerank-mults", "1,2,4,8"])
    st = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0 and st["decision"] == "tuned"
    assert st["rerank_mult"] == 8
    assert main(["vector-index", "stats", "--path", idx]) == 0
    ix = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ix["default_rerank_mult"] == 8 and ix["rerank_tuned"] is True


def test_cli_hybrid_where(spark, emb, tmp_path, capsys):
    import json as _json

    from public_transit_data_platform_sql_nosql_spark.__main__ import (
        main,
    )

    docs_p = str(tmp_path / "docs")
    E._aug(spark, SF_DIR).write.parquet(docs_p)
    emb_p = str(tmp_path / "emb")
    emb.write.parquet(emb_p)
    attrs = emb.select(
        "vec_id",
        F.when(F.col("vec_id") % 2 == 0, "a").otherwise("b")
        .alias("lang"))
    idx = str(tmp_path / "idx")
    sim.write_sq8_index(emb, idx, attrs=attrs)
    q_p = str(tmp_path / "queries")
    spark.createDataFrame(
        [(1, ["spark", "window"], _qvec(emb, 1))],
        "query_id long, terms array<string>, embedding array<double>"
    ).write.parquet(q_p)
    out = str(tmp_path / "res")
    assert main(["hybrid-search", "--docs", docs_p, "--emb", emb_p,
                 "--path", idx, "--queries", q_p, "--out", out,
                 "--k", "5", "--where", "lang = 'a'"]) == 0
    st = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert st["n_results"] == 5
    rows = spark.read.parquet(out).collect()
    assert rows and all(int(r["doc_id"]) % 2 == 0 for r in rows)

    # attr-less index: refused with rc=2, not silently unfiltered
    bare = str(tmp_path / "bare")
    sim.write_sq8_index(emb, bare)
    rc = main(["hybrid-search", "--docs", docs_p, "--emb", emb_p,
               "--path", bare, "--queries", q_p, "--out", out,
               "--where", "lang = 'a'"])
    st2 = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 2 and "no attribute columns" in st2["error"]


# SLOW TIER (pytest.ini): stored-index/tune/streaming/CLI e2e --
# excluded from the driver's default gate; run with -m slow after
# touching this family (see the verify skill).
pytestmark = pytest.mark.slow
