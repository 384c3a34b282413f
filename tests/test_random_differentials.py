"""Seeded randomized differentials for the operator family: asof_join
vs a brute-force Python mirror, salted_join vs the plain join, and the
upsert sink vs a dict replay.  Deterministic seeds (no hypothesis here —
each case costs a Spark job, so the budget is a handful of seeded draws
with wide structural variety, not thousands of tiny ones)."""

from __future__ import annotations

import numpy as np
import pytest

from public_transit_data_platform_sql_nosql_spark.jobs.upsert import (
    upsert_parquet_dir,
)
from public_transit_data_platform_sql_nosql_spark.operators.asof import (
    asof_join,
)
from public_transit_data_platform_sql_nosql_spark.operators.skew import (
    salted_join,
)


def _random_asof_frames(rng, n_left=120, n_right=60, n_keys=5):
    """Right side unique per (key, ts) — the operator's documented
    determinism contract; left side free to collide."""
    keys = [f"k{i}" for i in range(n_keys)]
    right_pairs = set()
    while len(right_pairs) < n_right:
        right_pairs.add((keys[rng.integers(0, n_keys)],
                         int(rng.integers(0, 500))))
    right = [(k, t, int(rng.integers(0, 1000))) for k, t in right_pairs]
    # left keys include one never present on the right
    lkeys = keys + ["k_missing"]
    left = [(lkeys[rng.integers(0, len(lkeys))], int(rng.integers(0, 500)),
             int(i)) for i in range(n_left)]
    return left, right


def _mirror_asof(left, right, direction, tolerance):
    by_key: dict[str, list] = {}
    for k, t, v in right:
        by_key.setdefault(k, []).append((t, v))
    out = []
    for k, t, lid in left:
        if direction == "nearest":
            cands = list(by_key.get(k, []))
        else:
            cands = [
                (rt, rv) for rt, rv in by_key.get(k, [])
                if (rt <= t if direction == "backward" else rt >= t)
            ]
        if tolerance is not None:
            cands = [c for c in cands if abs(c[0] - t) <= tolerance]
        if cands:
            if direction == "backward":
                rt, rv = max(cands)
            elif direction == "forward":
                rt, rv = min(cands)
            else:
                # nearest; backward ("prior") wins exact-distance ties
                rt, rv = min(cands,
                             key=lambda c: (abs(c[0] - t), c[0] > t))
            out.append((k, t, lid, rt, rv))
        else:
            out.append((k, t, lid, None, None))
    return sorted(out, key=repr)


@pytest.mark.parametrize("seed,direction,tolerance,bucket_width", [
    (1, "backward", None, None),
    (2, "forward", None, None),
    (3, "backward", 25, None),
    (4, "forward", 10, 64),
    (5, "backward", None, 32),
    (6, "nearest", None, None),
    (7, "nearest", 25, None),
    (8, "nearest", None, 64),
])
def test_asof_join_matches_mirror(spark, seed, direction, tolerance,
                                  bucket_width):
    rng = np.random.default_rng(seed)
    left, right = _random_asof_frames(rng)
    ldf = spark.createDataFrame(left, "key string, ts long, lid long")
    rdf = spark.createDataFrame(right, "key string, ts long, val long")
    got = sorted(
        ((r["key"], r["ts"], r["lid"], r["ts_asof"], r["val_asof"])
         for r in asof_join(ldf, rdf, on="ts", by="key",
                            direction=direction, tolerance=tolerance,
                            bucket_width=bucket_width).collect()),
        key=repr)
    assert got == _mirror_asof(left, right, direction, tolerance)


@pytest.mark.parametrize("seed,how,n_salt", [
    (11, "inner", 3), (12, "left", 5), (13, "inner", 8),
])
def test_salted_join_matches_plain_random(spark, seed, how, n_salt):
    rng = np.random.default_rng(seed)
    # skewed big side: 60% of rows share one key; small side has some
    # keys absent from big and vice versa
    big = [(int(rng.integers(0, 4)) if rng.random() < 0.6 else
            int(rng.integers(0, 20)), int(i)) for i in range(300)]
    small = [(int(k), f"v{k}") for k in rng.choice(25, size=12,
                                                   replace=False)]
    bdf = spark.createDataFrame(big, "k long, payload long")
    sdf = spark.createDataFrame(small, "k long, tag string")
    got = sorted(map(tuple, salted_join(
        bdf, sdf, on="k", how=how, n_salt=n_salt).collect()), key=repr)
    want = sorted(map(tuple, bdf.join(sdf, "k", how).collect()), key=repr)
    assert got == want


@pytest.mark.parametrize("seed", [21, 22])
def test_upsert_matches_dict_replay(spark, tmp_path, seed):
    rng = np.random.default_rng(seed)
    sink = str(tmp_path / "sink")
    mirror: dict[int, str] = {}
    for b in range(4):
        ks = rng.choice(30, size=8, replace=False)
        batch = [(int(k), f"b{b}v{k}") for k in ks]
        upsert_parquet_dir(
            spark, sink,
            spark.createDataFrame(batch, "k long, v string"), ["k"])
        mirror.update(dict(batch))
    got = {r["k"]: r["v"] for r in spark.read.parquet(sink).collect()}
    assert got == mirror
