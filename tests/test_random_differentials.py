"""Seeded randomized differentials for the operator family: asof_join
vs a brute-force Python mirror, salted_join vs the plain join, and the
upsert sink vs a dict replay.  Deterministic seeds (no hypothesis here —
each case costs a Spark job, so the budget is a handful of seeded draws
with wide structural variety, not thousands of tiny ones)."""

from __future__ import annotations

import os

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


@pytest.mark.parametrize("seed", [11, 47])
def test_mutation_loop_matches_dict_replay(spark, tmp_path, seed):
    """Interleaved upsert / delete-by-key / delete-where mutations on a
    partitioned sink replayed against a plain dict: the store equals the
    model after every step, partitions included."""
    from public_transit_data_platform_sql_nosql_spark.jobs.upsert import (
        delete_keys_parquet_dir,
        delete_where_parquet_dir,
        upsert_parquet_dir,
    )

    rng = np.random.default_rng(seed)
    sink = str(tmp_path / "sink")
    # model: key -> (value, partition); partition = key % 3 (stable)
    mirror: dict[int, tuple[str, int]] = {}

    def _df(rows):
        return spark.createDataFrame(
            [(k, v, p) for k, (v, p) in rows.items()],
            "k long, v string, p long")

    for step in range(6):
        op = rng.integers(0, 3)
        ks = [int(k) for k in rng.choice(24, size=6, replace=False)]
        if op == 0 or not mirror:
            batch = {k: (f"s{step}v{k}", k % 3) for k in ks}
            upsert_parquet_dir(spark, sink, _df(batch), ["k"],
                               partition_col="p")
            mirror.update(batch)
        elif op == 1:
            victims = {k: mirror[k] for k in ks if k in mirror}
            if victims:
                keys_df = spark.createDataFrame(
                    [(k, p) for k, (_, p) in victims.items()],
                    "k long, p long")
                st = delete_keys_parquet_dir(spark, sink, keys_df, ["k"],
                                             partition_col="p")
                assert st["rows_deleted"] == len(victims)
                for k in victims:
                    del mirror[k]
        else:
            cutoff = int(rng.integers(0, 24))
            st = delete_where_parquet_dir(spark, sink, f"k < {cutoff}",
                                          partition_col="p")
            doomed = [k for k in mirror if k < cutoff]
            assert st["rows_deleted"] == len(doomed)
            for k in doomed:
                del mirror[k]
        if mirror:
            got = {r["k"]: (r["v"], r["p"])
                   for r in spark.read.parquet(sink).collect()}
        else:
            # fully-emptied sink: parquet can't infer a schema from zero
            # data files, so read with the declared schema and assert the
            # store is ACTUALLY empty (a delete that reported the right
            # count but left rows behind must fail here, not be skipped)
            got = {r["k"]: (r["v"], r["p"])
                   for r in spark.read.schema("k long, v string, p long")
                   .parquet(sink).collect()}
        assert got == mirror, f"step {step} (op {op})"


# ---------------------------------------------------------------------------
# geo grid self-join vs quadratic brute force


def _brute_geo(rows, eps, lon_scale):
    out = {}
    for i in range(len(rows)):
        for j in range(len(rows)):
            a, b = rows[i], rows[j]
            if int(a[0]) >= int(b[0]):
                continue
            dlat = a[1] - b[1]
            dlon = (a[2] - b[2]) * lon_scale
            d2 = dlat * dlat + dlon * dlon
            if d2 <= eps * eps:
                out[(a[0], b[0])] = d2
    return out


@pytest.mark.parametrize("seed,eps", [(7, 0.02), (23, 0.013), (91, 0.05)])
def test_geo_pairs_random_vs_bruteforce(spark, seed, eps):
    """Random point clouds (clustered + uniform mix, boundary-heavy
    because coordinates are multiples of eps/4) vs the O(n^2) mirror."""
    from public_transit_data_platform_sql_nosql_spark.queries.geo import (
        LON_SCALE,
        stop_pairs_within,
    )

    rng = np.random.default_rng(seed)
    rows = []
    for i in range(80):
        if i % 3 == 0:  # clustered around a hot cell
            lat = 43.5 + float(rng.integers(-4, 5)) * (eps / 4)
            lon = -79.5 + float(rng.integers(-4, 5)) * (eps / 4)
        else:
            lat = 43.0 + float(rng.random())
            lon = -80.0 + float(rng.random())
        rows.append((str(i), lat, lon))
    df = spark.createDataFrame(
        [(i, f"s{i}", la, lo) for i, la, lo in rows],
        "stop_id string, stop_name string, stop_lat double, "
        "stop_lon double")
    got = {(r.stop_id_a, r.stop_id_b): r.dist2_deg
           for r in stop_pairs_within(df, eps=eps).collect()}
    want = _brute_geo(rows, eps, LON_SCALE)
    assert got == want


# ---------------------------------------------------------------------------
# funnel vs a per-user Python replay


def _mirror_funnel(rows, steps, within):
    by_step = {s: set() for s in steps}
    for u, t, k in rows:
        if k in by_step:
            by_step[k].add((u, t))
    cur = by_step[steps[0]]
    out = []
    for i in range(len(steps) - 1):
        nxt_all = sorted(by_step[steps[i + 1]])
        conv = {}
        for u, t in cur:
            cands = [(nu, nt) for nu, nt in nxt_all
                     if nu == u and t <= nt <= t + within]
            if cands:
                conv[(u, t)] = min(nt for _, nt in cands)
        out.append((i, len(cur), len(conv),
                    len(conv) * 1000 // max(len(cur), 1)))
        cur = {(u, mt) for (u, _), mt in conv.items()}
    return out


@pytest.mark.parametrize("seed,within", [(3, 40), (17, 5), (51, 1000)])
def test_funnel_random_vs_mirror(spark, seed, within):
    from public_transit_data_platform_sql_nosql_spark.queries.events import (
        funnel_report,
    )

    rng = np.random.default_rng(seed)
    kinds = ["view", "click", "purchase", "noise"]
    rows = [(int(rng.integers(0, 8)), int(rng.integers(0, 300)),
             kinds[rng.integers(0, len(kinds))]) for _ in range(400)]
    ev = spark.createDataFrame(
        rows, "user_id long, ts long, event_type string")
    got = [(r.step_idx, r.n_reached, r.n_converted, r.conversion_permille)
           for r in funnel_report(
               ev, ("view", "click", "purchase"),
               within_ns=within).orderBy("step_idx").collect()]
    assert got == _mirror_funnel(set(rows), ("view", "click", "purchase"),
                                 within)
