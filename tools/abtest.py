"""Interleaved drift triage for bench regressions (the r5->r6 method,
made reusable).

When BENCH_r{N} moves vs BENCH_r{N-1} on queries whose code did NOT
change, the question is machine-state variance vs a real interaction
(e.g. a new bench entry perturbing a neighbor through JVM/codegen
state).  This harness answers it in ONE session: after the bench's own
double warmup, the named queries run ROUND-ROBIN for --reps rounds with
a cache clear before every execution — interleaving means any box-level
drift during the run hits all queries equally, so a query that
reproduces its old number while its neighbors reproduce their new ones
is a real per-query effect, not drift.

It then prints each query's samples/median/spread next to every
committed BENCH_r*.json value, so the attribution ("today's solo medians
reproduce rN, not rN-1 -> box state" or the reverse) is read straight
off the table.

Usage:  python tools/abtest.py [--reps 6] [--sf-dir /root/testdata/sf0.1]
                               name [name ...]
"""
from __future__ import annotations

import argparse
import glob
import json
import re
import statistics
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from public_transit_data_platform_sql_nosql_spark.session import get_spark  # noqa: E402


def bench_history(repo: str = ".") -> dict[int, dict[str, float]]:
    out: dict[int, dict[str, float]] = {}
    for f in glob.glob(f"{repo}/BENCH_r*.json"):
        m = re.search(r"_r(\d+)\.json$", f)
        if not m:
            continue
        with open(f, encoding="utf-8") as fh:
            data = json.load(fh)
        q = (data.get("parsed") or {}).get("queries")
        if q:
            out[int(m.group(1))] = q
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark(app_name="abtest", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for n in args.names:
        if n not in qs:
            print(f"unknown query {n!r}")
            return 2

    # bench-identical double warmup per query (codegen C2 ramp)
    for n in args.names:
        for _ in range(2):
            spark.catalog.clearCache()
            qs[n](spark, args.sf_dir).count()

    samples: dict[str, list[float]] = {n: [] for n in args.names}
    for r in range(args.reps):
        for n in args.names:                      # interleaved rounds
            spark.catalog.clearCache()
            t0 = time.monotonic()
            qs[n](spark, args.sf_dir).count()
            samples[n].append(time.monotonic() - t0)
        print(f"# round {r + 1}/{args.reps} done", file=sys.stderr)

    hist = bench_history()
    rounds = sorted(hist)
    hdr = f"{'query':30s} {'median':>7s} {'min':>6s} {'max':>6s}  " \
        + " ".join(f"r{r:<5d}" for r in rounds)
    print(hdr)
    for n in args.names:
        s = samples[n]
        med = statistics.median(s)
        refs = " ".join(
            f"{hist[r].get(n, float('nan')):6.2f}" if n in hist[r]
            else "     -" for r in rounds)
        print(f"{n:30s} {med:7.3f} {min(s):6.2f} {max(s):6.2f}  {refs}")
    print(json.dumps({n: [round(x, 3) for x in s]
                      for n, s in samples.items()}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
