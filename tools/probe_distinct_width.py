"""Calibrate the exact-vs-approx DISTINCT crossover by Expand WIDTH.

SCALING_r09 measured the crossover by ROWS (global ~26-distinct-group
profile: approx wins 1.5x at sf1, loses at sf10). This probe holds rows
fixed and sweeps the number of distinct-aggregate groups W in ONE global
aggregate — exact pays an Expand of (W+1) rows per input row, approx pays
W HLL register updates per row — to locate the width where approx starts
winning on a global (shuffle-free) aggregate.

Usage: python tools/probe_distinct_width.py [sf_dir] [widths...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from nci_seronet_proc_data_validator_spark import get_spark  # noqa: E402
from nci_seronet_proc_data_validator_spark.sources.readers import (  # noqa: E402
    read_table)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    widths = [int(w) for w in sys.argv[2:]] or [8, 16, 32, 64, 128]
    spark = get_spark("probe_distinct_width", cpus=32)
    li = read_table(spark, sf_dir, "lineitem")
    # W derived string columns with distinct NDV profiles (mod classes of
    # orderkey x a column mix) — all computed in the scan, so the probe
    # times the AGGREGATE strategy, not the derivation
    base = li.selectExpr(
        *[f"CAST(l_orderkey % {997 + 13 * i} AS STRING) AS c{i}"
          for i in range(max(widths))])
    n = base.count()
    print(f"rows={n} dir={sf_dir}")
    for w in widths:
        cols = [f"c{i}" for i in range(w)]
        for arm, tpl in (("exact", "count(DISTINCT {c})"),
                         ("approx", "approx_count_distinct({c}, 0.05)")):
            aggs = ", ".join(tpl.format(c=c) + f" AS m{i}"
                             for i, c in enumerate(cols))
            best = None
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.time()
                df = base.selectExpr(cols) \
                    .selectExpr(f"struct({aggs}) AS m").selectExpr("m.*")
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            print(f"W={w:4d} {arm:6s} best={best:7.2f}s")


if __name__ == "__main__":
    main()
