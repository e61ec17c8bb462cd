"""Interval (range-containment) join + distributed k-means.

Correctness on toy data where the answer is hand-checkable, plus the
plan-shape guards that make these operators scale: the interval join
must compile to an equi-join on (key, bin) — never a broadcast nested
loop — and every k-means iteration must broadcast the centroid table.
"""

from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.operators.interval import (
    interval_join,
)
from nci_seronet_proc_data_validator_spark.operators.kmeans import (
    kmeans_fit,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_interval_join_toy(spark):
    intervals = spark.createDataFrame(
        [("i1", "u1", 100, 200), ("i2", "u1", 150, 260), ("i3", "u2", 0, 50)],
        "interval_id string, user_id string, lo long, hi long")
    points = spark.createDataFrame(
        [("u1", 100), ("u1", 200), ("u1", 250), ("u1", 261), ("u2", 50),
         ("u2", 51), ("u3", 10)],
        "user_id string, tsu long")
    got = {(r["interval_id"], r["tsu"])
           for r in interval_join(intervals, points, "user_id",
                                  bin_width=1000).collect()}
    # closed bounds; i2 excludes 261; u3 matches nothing
    assert got == {("i1", 100), ("i1", 200), ("i2", 200), ("i2", 250),
                   ("i3", 50)}


def test_interval_join_no_duplicate_pairs_across_bins(spark):
    """An interval spanning a bin boundary still yields each contained
    point exactly once (a point lives in exactly one bin)."""
    intervals = spark.createDataFrame(
        [("i1", "u1", 900, 1100)],
        "interval_id string, user_id string, lo long, hi long")
    points = spark.createDataFrame(
        [("u1", 950), ("u1", 1050)], "user_id string, tsu long")
    rows = interval_join(intervals, points, "user_id",
                         bin_width=1000).collect()
    assert sorted(r["tsu"] for r in rows) == [950, 1050]


def test_interval_join_is_equi_join(spark):
    """The bin trick must surface as a hash/sort-merge equi-join —
    BNLJ/cartesian means the binning regressed and 100 TB dies."""
    intervals = spark.range(0, 100).select(
        F.col("id").alias("interval_id"),
        (F.col("id") % 10).cast("string").alias("user_id"),
        (F.col("id") * 100).alias("lo"), (F.col("id") * 100 + 500).alias("hi"))
    points = spark.range(0, 1000).select(
        (F.col("id") % 10).cast("string").alias("user_id"),
        (F.col("id") * 17 % 10000).alias("tsu"))
    plan = _plan(interval_join(intervals, points, "user_id", bin_width=1000))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_kmeans_separates_obvious_clusters(spark):
    """Two far-apart blobs, k=2: every vector lands with its blob and the
    centroids are the exact integer-quantized blob means."""
    rows = [(i, [0.0 + 0.001 * i, 0.0]) for i in range(4)] + \
           [(i, [10.0, 10.0 + 0.001 * i]) for i in range(4, 8)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    out = kmeans_fit(emb, k=2, iters=2).collect()
    by_c = {}
    for r in out:
        by_c.setdefault(r["centroid_id"], {})[r["pos"]] = (
            r["cq"], r["n_assigned"])
    assert set(by_c) == {0, 1}
    assert all(v[1] == 4 for comps in by_c.values() for v in comps.values())
    # blob A mean x = (0+1+2+3)*0.001/4 = 0.0015 → 1500 micro-units
    a = min(by_c.values(), key=lambda c: c[0][0])
    b = max(by_c.values(), key=lambda c: c[0][0])
    assert a[0][0] == 1500 and a[1][0] == 0
    # blob B mean y = (10.004+…+10.007)/4 = 10.0055 → 10 005 500
    assert b[0][0] == 10_000_000 and b[1][0] == 10_005_500


def test_kmeans_empty_cluster_drops_but_keeps_cids(spark):
    """k=3 with identical init vectors: every point ties to all three
    centroids and goes to the lowest cid, so clusters 1 and 2 empty out
    after round one — and the DuckDB oracle agrees row for row."""
    import duckdb
    import pandas as pd

    from nci_seronet_proc_data_validator_spark.operators.kmeans import (
        kmeans_oracle_sql)
    rows = [(i, [0.0, 0.0]) for i in range(3)] + \
           [(i, [10.0, 10.0]) for i in range(3, 6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = kmeans_fit(emb, k=3, iters=2).orderBy("centroid_id", "pos")
    got = [tuple(r) for r in out.collect()]
    assert {r[0] for r in got} == {0}          # only cluster 0 survives
    assert all(r[3] == 6 for r in got)         # all six docs in it
    con = duckdb.connect()
    con.register("embeddings", pd.DataFrame(
        {"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]}))
    want = [tuple(r) for r in
            con.execute(kmeans_oracle_sql(k=3, iters=2)).fetchall()]
    assert got == want


def test_kmeans_assignment_is_map_only(spark):
    """The model rides the plan as a literal: no join, no window, no
    shuffle of vector data — the only exchange is the k·dim-row
    (cluster, dim) aggregation."""
    emb = spark.range(0, 64).select(
        F.col("id").alias("vec_id"),
        F.array(F.col("id").cast("double"),
                (F.col("id") * 2).cast("double")).alias("embedding"))
    plan = _plan(kmeans_fit(emb, k=4, iters=1))
    for op in ("Join", "CartesianProduct", "Window", "BatchEvalPython"):
        assert op not in plan, op
