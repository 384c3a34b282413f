"""Run the full driver-parity differential (every ``queries()`` entry vs
its DuckDB oracle) at an arbitrary scale factor — a local mirror of the
driver's sf0.01 CORRECTNESS gate, since tests/test_driver_parity.py pins
sf0.001.

Usage:  python tools/parity_sf.py [sf_dir] [name_filter ...]

Exits non-zero if any entry mismatches; prints one line per entry.
"""
from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from tests.conftest import (  # noqa: E402
    TPCH_TABLES, canonical_rows, spark_rows,
)
from public_transit_data_platform_sql_nosql_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="parity", master="local[32]",
                      shuffle_partitions=32)
    con = duckdb.connect()
    for t in TPCH_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, q in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            scols, srows = spark_rows(q(spark, sf_dir))
            if name not in oracles:
                print(f"ok   {name}: rows-only ({len(srows)} rows, "
                      f"{time.monotonic() - t0:.1f}s)")
                continue
            cur = con.execute(oracles[name])
            dcols = [d[0] for d in cur.description]
            dcols, drows = canonical_rows(dcols, cur.fetchall())
        except Exception as e:  # noqa: BLE001 — report and continue
            failures.append(name)
            print(f"FAIL {name}: error {e!r}")
            continue
        if scols != dcols:
            failures.append(name)
            print(f"FAIL {name}: columns {scols} vs {dcols}")
        elif len(srows) != len(drows):
            failures.append(name)
            print(f"FAIL {name}: rows {len(srows)} vs {len(drows)}")
        else:
            bad = next((i for i, (a, b) in enumerate(zip(srows, drows))
                        if a != b), None)
            if bad is not None:
                failures.append(name)
                print(f"FAIL {name}: row {bad} differs:\n  spark="
                      f"{srows[bad]}\n  duck ={drows[bad]}")
            else:
                print(f"ok   {name}: {len(srows)} rows match "
                      f"({time.monotonic() - t0:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures
                                           else ""))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
