"""Scale-path features: bucketed co-located joins and approximate
aggregates."""

import pytest
from pyspark.sql import functions as F


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Bucketing both sides on the join key removes the exchange — the
    co-location strategy for repeated large joins at 100 TB (SURVEY §2.3
    scale note)."""
    # warehouse.dir is a static conf — tables land in ./spark-warehouse
    # (gitignored). The in-memory catalog forgets tables across sessions
    # while their directories persist, so clear BOTH.
    import shutil
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("b_orders", "b_lineitem"):
        shutil.rmtree(f"{wh}/{t}", ignore_errors=True)
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    (orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (li.withColumnRenamed("l_orderkey", "o_orderkey")
     .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))

    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        # disable broadcast so the plan must either shuffle or exploit the
        # bucket layout — this isolates what bucketing buys
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_lineitem").join(spark.table("b_orders"),
                                                "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan      # co-located: no shuffle at all
        assert joined.count() > 0

        # the same join over plain parquet DOES shuffle
        plain = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_approx_aggregates_within_tolerance(spark):
    """approx_count_distinct / percentile_approx — the sketch-based path
    for 100 TB cardinalities; asserted against exact values at test scale."""
    orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    row = orders.agg(
        F.countDistinct("o_custkey").alias("exact"),
        F.approx_count_distinct("o_custkey", 0.02).alias("approx"),
        F.expr("percentile_approx(o_totalprice, 0.5, 10000)").alias("p50a"),
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.05
    assert abs(row["p50a"] - row["p50"]) / row["p50"] < 0.02
