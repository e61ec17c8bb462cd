"""Split rulebook_full wall time into driver BUILD vs cluster EXECUTE.

    python tools/time_rulebook_split.py [--n 3] [--sf .../sf0.1]

BUILD   = python construction of the DataFrame + forcing Catalyst
          analysis/optimization/physical planning via
          ``df._jdf.queryExecution().executedPlan()`` — all driver-side,
          zero jobs (modulo AQE, which re-plans during execution).
EXECUTE = the subsequent noop-sink write of the already-planned frame.

The r7 verdict flags rulebook_full's residual 20.8 s as "JVM analysis of
the 10-sheet union — a per-query constant, not a scale term"; this
harness measures whether that claim holds and how much a plan-shape
change (per-sheet view / persisted union input) could recover.
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from nci_seronet_proc_data_validator_spark import get_spark
    from nci_seronet_proc_data_validator_spark.driver_queries import QUERIES

    spark = get_spark("time_rulebook_split", cpus=args.cpus)
    q = QUERIES["rulebook_full"][0]

    # warmup (codegen + JIT + parquet footer caches)
    q(spark, args.sf).write.format("noop").mode("overwrite").save()

    builds, plans, execs = [], [], []
    for _ in range(args.n):
        spark.catalog.clearCache()
        t0 = time.time()
        df = q(spark, args.sf)           # python-side construction
        t1 = time.time()
        df._jdf.queryExecution().executedPlan()  # analyze+optimize+plan
        t2 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t3 = time.time()
        builds.append(t1 - t0)
        plans.append(t2 - t1)
        execs.append(t3 - t2)
        print(json.dumps({"construct": round(t1 - t0, 2),
                          "plan": round(t2 - t1, 2),
                          "execute": round(t3 - t2, 2),
                          "total": round(t3 - t0, 2)}), flush=True)
    print(json.dumps({
        "median_construct": round(statistics.median(builds), 2),
        "median_plan": round(statistics.median(plans), 2),
        "median_execute": round(statistics.median(execs), 2),
        "median_total": round(statistics.median(
            [b + p + e for b, p, e in zip(builds, plans, execs)]), 2)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
