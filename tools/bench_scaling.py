"""Measure how the heavy queries scale with data size.

    python tools/bench_scaling.py [--dirs d1 d2 ...] [--queries q1 ...]
        [--n 2] [--cpus 32]

Runs each query (default: the six most expensive suite queries) at each
scale dir (default: sf0.01, sf0.1, and the locally generated
``.scale/sf1`` — build it first with ``tools/gen_scale.py``), best-of-n
with cold cache per sample, full execution through the noop sink.

Prints one JSON line per (dir, query) and a final summary with the
per-decade scaling exponent  alpha = log(t_hi / t_lo) / log(rows_hi /
rows_lo)  between the two largest dirs: alpha ≈ 1 is linear in rows,
alpha < 1 means fixed per-query overhead still dominates, alpha > 1 is
super-linear and needs a plan explanation.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY = ["rulebook_full", "dedup_clusters", "substr_dup_pairs", "pq_ann",
         "data_profile", "graph_metrics"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dirs", nargs="*",
                    default=["/root/testdata/sf0.01", "/root/testdata/sf0.1",
                             os.path.join(os.path.dirname(
                                 os.path.dirname(os.path.abspath(__file__))),
                                 ".scale", "sf1")])
    ap.add_argument("--queries", nargs="*", default=HEAVY)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    from bench import BENCH_QUERIES  # noqa: E402  (repo root on path)

    from nci_seronet_proc_data_validator_spark import get_spark

    spark = get_spark("bench_scaling", cpus=args.cpus)

    # warm codegen/JIT on the smallest scale so cold-compile cost is not
    # attributed to the first (dir, query) cell
    warm = "/root/testdata/sf0.001"
    for q in args.queries:
        try:
            BENCH_QUERIES[q](spark, warm).write.format("noop") \
                .mode("overwrite").save()
        except Exception as e:  # pragma: no cover - warmup best-effort
            print(f"warmup {q}: {e}", file=sys.stderr)

    results: dict[str, dict[str, float]] = {}
    rows: dict[str, int] = {}
    for d in args.dirs:
        rows[d] = (spark.read.parquet(os.path.join(d, "lineitem.parquet"))
                   .count())
        for q in args.queries:
            samples = []
            for _ in range(args.n):
                spark.catalog.clearCache()
                t0 = time.time()
                BENCH_QUERIES[q](spark, d).write.format("noop") \
                    .mode("overwrite").save()
                samples.append(time.time() - t0)
            best = round(min(samples), 3)
            results.setdefault(q, {})[d] = best
            print(json.dumps({"dir": d, "query": q, "best": best,
                              "samples": [round(s, 3) for s in samples]}),
                  flush=True)

    if len(args.dirs) < 2 or rows[args.dirs[-1]] == rows[args.dirs[-2]]:
        # nothing to fit an exponent against — still emit the raw cells
        print(json.dumps({"metric": "scaling", "rows": {
            os.path.basename(d): rows[d] for d in args.dirs},
            "queries": {q: {"t": {os.path.basename(d): results[q][d]
                                  for d in args.dirs}}
                        for q in args.queries},
            "note": "alpha omitted: need two dirs with distinct sizes"}))
        return 0
    lo, hi = args.dirs[-2], args.dirs[-1]
    decade = math.log(rows[hi] / rows[lo])
    summary = {}
    for q in args.queries:
        t_lo, t_hi = results[q][lo], results[q][hi]
        summary[q] = {
            "t": {os.path.basename(d): results[q][d] for d in args.dirs},
            "ratio_last_decade": round(t_hi / t_lo, 2),
            "alpha": round(math.log(t_hi / t_lo) / decade, 2),
        }
    print(json.dumps({"metric": "scaling", "rows": {
        os.path.basename(d): rows[d] for d in args.dirs},
        "queries": summary}, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
