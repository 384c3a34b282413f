"""Scale-factor timing sweep: run driver queries at sf0.001/0.01/0.1
and fit the wall-time scaling exponent (slope of log t vs log sf).

Usage:  python tools/scaling.py [name ...]     (default: the r7/r8
heavyweights the review asked evidence for)

Environment knobs (defaults match the build container):
  SPARK_GRAFT_TESTDATA  root holding sf{0.001,0.01,0.1}/ fixture dirs
                        (default /root/testdata)
  SPARK_GRAFT_CPUS      local[N] core count (default 32)
  SPARK_GRAFT_SFS       comma-separated scale factors (default
                        0.001,0.01,0.1 — each must exist under the root)

At these sizes wall time = fixed Spark job-launch overhead + data term,
so a perfectly linear operator shows an exponent well BELOW 1 (the
fixed term flattens the left end); an exponent near or above 1 at THIS
scale is the red flag (the data term already dominates and grows at
least linearly).  Results go in the README scaling table.
"""
from __future__ import annotations

import math
import os
import statistics
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as entrymod  # noqa: E402
from public_transit_data_platform_sql_nosql_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "dedup_repeated_spans",
    "pipeline_quality_classifier",
    "transit_stop_rank",
    "transit_reachable_deep",
    "transit_stop_rank_deep",
]
TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SFS = [float(x) for x in
       os.environ.get("SPARK_GRAFT_SFS", "0.001,0.01,0.1").split(",")]


def main() -> int:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="scaling", master=f"local[{CPUS}]",
                      shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    print(f"{'query':34s} " + " ".join(f"sf{sf:<6}" for sf in SFS)
          + " exponent")
    for name in names:
        fn = qs[name]
        med = []
        for sf in SFS:
            d = f"{TESTDATA}/sf{sf}"
            spark.catalog.clearCache()
            fn(spark, d).count()          # warm (JIT/codegen/footers)
            samples = []
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.monotonic()
                fn(spark, d).count()
                samples.append(time.monotonic() - t0)
            med.append(statistics.median(samples))
        # least-squares slope of log t vs log sf
        xs = [math.log10(sf) for sf in SFS]
        ys = [math.log10(t) for t in med]
        mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
        slope = (sum((x - mx) * (y - my) for x, y in zip(xs, ys))
                 / sum((x - mx) ** 2 for x in xs))
        print(f"{name:34s} "
              + " ".join(f"{t:7.2f}s" for t in med)
              + f"  {slope:5.2f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
