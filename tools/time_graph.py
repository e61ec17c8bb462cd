"""Per-arm timing for q_graph_metrics (verdict r7 drift item).

    python tools/time_graph.py [--n 5] [--sf /root/testdata/sf0.1]

The suite query unions three arms (pagerank / knn_degree / triangles)
over shared inputs; a drift in the union total can hide in any of them.
This harness times each arm in isolation (its own job, own noop sink,
cold cache per sample) plus the full union, n samples each, and prints
one JSON line per arm with best/median so BENCH_NOTES can carry per-arm
numbers instead of "probably variance".
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
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from nci_seronet_proc_data_validator_spark import get_spark
    from nci_seronet_proc_data_validator_spark.driver_queries import (
        QUERIES, _KNN_K, read_table)
    from nci_seronet_proc_data_validator_spark.operators.graph import (
        knn_graph, pagerank, triangle_counts)

    spark = get_spark("time_graph", cpus=args.cpus)

    def edges_bipartite():
        orders = read_table(spark, args.sf, "orders").select(
            "o_orderkey", "o_custkey")
        li = read_table(spark, args.sf, "lineitem").select(
            "l_orderkey", "l_suppkey")
        return (li.join(orders, li.l_orderkey == orders.o_orderkey)
                .select((F.col("o_custkey") * 2).alias("src"),
                        (F.col("l_suppkey") * 2 + 1).alias("dst"))
                .distinct())

    def cooccur_pairs():
        li = read_table(spark, args.sf, "lineitem").select(
            "l_orderkey", "l_suppkey")
        el = li.distinct()
        return (el.alias("x")
                .join(el.alias("y"),
                      (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
                      & (F.col("x.l_suppkey") < F.col("y.l_suppkey")))
                .groupBy(F.col("x.l_suppkey").alias("a"),
                         F.col("y.l_suppkey").alias("b"))
                .agg(F.count(F.lit(1)).alias("w")))

    def arm_pagerank():
        return pagerank(edges_bipartite(), iters=3)

    def arm_knn():
        return knn_graph(cooccur_pairs(), k=_KNN_K)

    def arm_triangles():
        # includes the knn build, same as the suite query's chain
        return triangle_counts(knn_graph(cooccur_pairs(),
                                         k=_KNN_K).localCheckpoint())

    def full_union():
        return QUERIES["graph_metrics"][0](spark, args.sf)

    arms = {"pagerank": arm_pagerank, "knn": arm_knn,
            "triangles": arm_triangles, "full_union": full_union}

    # warmup: one pass of each arm so codegen/JIT cost is not in sample 0
    for fn in arms.values():
        fn().write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    for name, fn in arms.items():
        samples = []
        for _ in range(args.n):
            spark.catalog.clearCache()
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            samples.append(time.time() - t0)
        print(json.dumps({
            "arm": name, "best": round(min(samples), 3),
            "median": round(statistics.median(samples), 3),
            "samples": [round(s, 3) for s in samples]}), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
