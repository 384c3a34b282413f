"""Mixing/sharding operators: exact Python-mirror hashes, sqrt-flattening
distribution, shard numbering contract, one-pass composite parity, and
the plan shapes that make them scale (rates broadcast, single window
shuffle, no corpus-global sort)."""

from __future__ import annotations

import hashlib
import math

import pytest

import __spark_entry__ as E
from public_transit_data_platform_sql_nosql_spark.pipeline import (
    curation as cur,
)
from public_transit_data_platform_sql_nosql_spark.pipeline import (
    mixing as mix,
)
from public_transit_data_platform_sql_nosql_spark.pipeline.core import P
from public_transit_data_platform_sql_nosql_spark.plans import plan_summary
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    return E._aug(spark, SF_DIR)


def _h(s: str) -> int:
    """Python mirror of pipeline/core.py md5_hash64."""
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % P


def test_source_mix_matches_python_mirror(docs):
    """Every mix_kept flag reproduces the integer acceptance test
    computed independently in Python from raw md5 — bit-exact, no
    engine arithmetic in the loop."""
    raw = [(r["doc_id"], r["source"]) for r in
           docs.select("doc_id", "source").collect()]
    n_src: dict[str, int] = {}
    for _, s in raw:
        n_src[s] = n_src.get(s, 0) + 1
    n_min = min(n_src.values())
    M = mix.MIX_RES
    expect = {
        d: (_h(f"{mix.MIX_SALT}{d}") % M) ** 2 * n_src[s] < M * M * n_min
        for d, s in raw
    }
    got = {r["doc_id"]: r["mix_kept"]
           for r in mix.source_mix(docs).collect()}
    assert got == expect


def test_source_mix_flattens_to_sqrt(docs):
    """Post-mix counts track sqrt(n_src * n_min) within binomial spread,
    and the smallest source is kept whole."""
    rows = mix.source_mix(docs).collect()
    n_src: dict[str, int] = {}
    kept: dict[str, int] = {}
    for r in rows:
        n_src[r["source"]] = n_src.get(r["source"], 0) + 1
        kept[r["source"]] = kept.get(r["source"], 0) + bool(r["mix_kept"])
    n_min = min(n_src.values())
    smallest = min(n_src, key=n_src.get)
    assert kept[smallest] == n_src[smallest]
    for s, n in n_src.items():
        target = math.sqrt(n * n_min)
        # 4-sigma binomial tolerance around the target
        tol = 4 * math.sqrt(target) + 2
        assert abs(kept[s] - target) <= tol, (s, kept[s], target)


def test_shard_assign_contract(docs):
    n_shards = 8
    rows = mix.shard_assign(docs, n_shards=n_shards).collect()
    n = len(rows)
    by_shard: dict[int, list] = {}
    for r in rows:
        assert r["order_idx"] == r["shard_pos"] * n_shards + r["shard_idx"]
        by_shard.setdefault(r["shard_idx"], []).append(r["shard_pos"])
    # every shard's positions are dense from 0
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss)))
    # order_idx is globally unique and shards are balanced within
    # 6 sigma of n/n_shards
    assert len({r["order_idx"] for r in rows}) == n
    exp = n / n_shards
    for shard, poss in by_shard.items():
        assert abs(len(poss) - exp) <= 6 * math.sqrt(exp) + 2


def test_shard_assign_matches_python_mirror(docs):
    n_shards = 4
    ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
    hashes = {d: _h(f"{mix.SHARD_SALT}{d}") for d in ids}
    expect: dict[int, tuple[int, int]] = {}
    for shard in range(n_shards):
        members = sorted((hashes[d], d) for d in ids
                         if hashes[d] % n_shards == shard)
        for pos, (_, d) in enumerate(members):
            expect[d] = (shard, pos)
    got = {r["doc_id"]: (r["shard_idx"], r["shard_pos"])
           for r in mix.shard_assign(docs, n_shards=n_shards).collect()}
    assert got == expect


def test_shard_assign_rejects_bad_n_shards(docs):
    with pytest.raises(ValueError):
        mix.shard_assign(docs, n_shards=0)


def test_curation_assignments_matches_pieces(docs):
    """The one-pass composite agrees column-for-column with the three
    standalone operators it fuses."""
    split = {r["doc_id"]: (r["bucket"], r["split"])
             for r in cur.split_assign(docs).collect()}
    mixed = {r["doc_id"]: (r["n_src"], r["mix_kept"])
             for r in mix.source_mix(docs).collect()}
    shards = {r["doc_id"]: (r["shard_idx"], r["shard_pos"], r["order_idx"])
              for r in mix.shard_assign(docs).collect()}
    comp = mix.curation_assignments(docs).collect()
    assert len(comp) == len(split)
    for r in comp:
        d = r["doc_id"]
        assert (r["bucket"], r["split"]) == split[d]
        assert (r["n_src"], r["mix_kept"]) == mixed[d]
        assert (r["shard_idx"], r["shard_pos"], r["order_idx"]) == shards[d]


def test_mixing_plan_shapes(docs):
    """Rates join must broadcast (never sort-merge on the corpus), and
    the composite's only corpus-wide shuffle is the shard window."""
    s = plan_summary(mix.source_mix(docs))
    assert s["broadcast_hash_joins"] >= 1
    assert s["sort_merge_joins"] == 0
    c = plan_summary(mix.curation_assignments(docs))
    assert c["broadcast_hash_joins"] >= 1
    assert c["sort_merge_joins"] == 0
    assert c["cartesian_products"] == 0
    assert c["broadcast_nested_loop_joins"] == 0


def test_write_training_shards_layout(spark, docs, tmp_path):
    """One directory per shard, one data file each, rows in shard_pos
    order inside every file, nothing lost."""
    import os

    from public_transit_data_platform_sql_nosql_spark.pipeline.mixing import (
        write_training_shards,
    )

    out = str(tmp_path / "shards")
    n_shards = 4
    write_training_shards(docs, out, n_shards=n_shards)
    dirs = sorted(d for d in os.listdir(out) if d.startswith("shard_idx="))
    assert len(dirs) == n_shards
    total = 0
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(out, d))
                 if f.endswith(".parquet")]
        assert len(files) == 1
        part = spark.read.parquet(os.path.join(out, d))
        poss = [r["shard_pos"] for r in part.select("shard_pos").collect()]
        # parquet preserves write order within the file
        assert poss == sorted(poss) == list(range(len(poss)))
        total += len(poss)
    assert total == docs.count()
    # round-trip read reproduces the assignment exactly
    back = spark.read.parquet(out).select("doc_id", "shard_idx", "shard_pos")
    expect = mix.shard_assign(docs, n_shards=n_shards)
    assert back.exceptAll(
        expect.select("doc_id", "shard_idx", "shard_pos")).count() == 0


def test_epoch_balance_matches_python_mirror(docs):
    """Copy counts recomputed independently in Python from raw md5 and
    the per-source counts — bit-exact, and the balance property: every
    source's post-mix count equals its own integer-arithmetic target."""
    from collections import Counter

    from public_transit_data_platform_sql_nosql_spark.pipeline.mixing import (
        EPOCH_CAP_PM,
        epoch_balance,
    )

    rows = docs.select("doc_id", "source").collect()
    n_src = Counter(r["source"] for r in rows)
    n_max = max(n_src.values())
    want = Counter()
    for r in rows:
        e_pm = min(n_max * 1000 // n_src[r["source"]], EPOCH_CAP_PM)
        n = e_pm // 1000 + (
            1 if _h(f"epoch-v1{r['doc_id']}") % 1000 < e_pm % 1000 else 0)
        want[(r["doc_id"], r["source"])] = n
    got = Counter()
    out = epoch_balance(docs).collect()
    for r in out:
        got[(r["doc_id"], r["source"])] += 1
    assert got == Counter({k: v for k, v in want.items() if v > 0})
    # copy_idx is a clean 0..n-1 numbering per doc
    seen = {}
    for r in out:
        seen.setdefault(r["doc_id"], []).append(r["copy_idx"])
    for d, idxs in seen.items():
        assert sorted(idxs) == list(range(len(idxs))), d
    # the largest source is never upsampled; every other source's
    # post-mix total lands within 1 copy/doc of its integer target
    total = Counter()
    for (d, s), n in got.items():
        total[s] += n
    assert total[max(n_src, key=n_src.get)] == n_max


def test_epoch_repeat_zero_rate_drops_and_absent_source_drops(spark):
    from public_transit_data_platform_sql_nosql_spark.pipeline.mixing import (
        epoch_repeat,
    )

    d = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c")],
        "doc_id long, source string")
    rates = spark.createDataFrame(
        [("a", 2000), ("b", 0)], "source string, epochs_pm long")
    out = epoch_repeat(d, rates).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r["copy_idx"])
    # a: exactly 2 copies each; b: rate 0 -> dropped; c: absent -> dropped
    assert by_doc == {1: [0, 1], 2: [0, 1]}
