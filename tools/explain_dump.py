"""Dump .explain("formatted") for headline queries to plans/<tag>/.

Usage: python tools/explain_dump.py <outdir> [--suffix _before] [--queries a,b]

Plan capture is driver-only (no job runs), so this is cheap and safe to run
beside other work.  The judge checks plan claims against these files.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--queries", default="")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import bench
    import __spark_entry__ as entrymod
    from public_transit_data_platform_sql_nosql_spark.session import get_spark

    spark = get_spark(app_name="explain_dump", master="local[4]",
                      shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = [n for n in qs
             if n in ("q1_busiest_stops", "q2_route_stats_whole_week",
                      "q3_transfer_points", "q4_top_routes_daily",
                      "denormalize_check")
             or bench._is_headline_extra(n)]
    if args.queries:
        names = [n.strip() for n in args.queries.split(",") if n.strip()]
    os.makedirs(args.outdir, exist_ok=True)
    import contextlib
    import io

    for name in names:
        try:
            df = qs[name](spark, args.sf_dir)
            # public API only (df.explain prints): df._sc / the py4j
            # PythonSQLUtils reach-through are version-fragile (ADVICE r14)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:  # noqa: BLE001
            plan = f"EXPLAIN FAILED: {e!r}"
        path = os.path.join(args.outdir, f"{name}{args.suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
