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


def test_cross_dedup_corpus_index_bucketed_probe(spark, tmp_path):
    """The cross-corpus dedup scale story end to end: the corpus band
    table persists ONCE as a bucketed index on the probe key, and the
    new-batch probe join then shuffles only the (small) batch side — the
    corpus side reads its buckets with no Exchange."""
    import shutil
    from pyspark.sql import functions as F
    from nci_seronet_proc_data_validator_spark.operators.dedup import (
        lsh_band_table, minhash_signature, shingle_hashes, shingles, tokens)
    spark.sql("DROP TABLE IF EXISTS corpus_band_index")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{wh}/corpus_band_index", ignore_errors=True)

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sig = docs.select(
        "doc_id",
        minhash_signature(
            shingle_hashes(shingles(tokens("text"), 3))).alias("sig"))
    corpus = lsh_band_table(sig.filter("doc_id % 10 <> 0"), "doc_id", "sig")
    (corpus.write.bucketBy(8, "band_hash").sortBy("band_hash")
     .mode("overwrite").saveAsTable("corpus_band_index"))

    new_bands = lsh_band_table(sig.filter("doc_id % 10 = 0"), "doc_id",
                               "sig").withColumnRenamed("doc_id", "new_id")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # single join key by construction: the band id is hashed INTO
        # band_hash (lsh_band_table), so the probe keys exactly match the
        # bucket spec
        idx = spark.table("corpus_band_index").drop("band_id")
        probe = (new_bands.repartition(8, "band_hash")
                 .join(idx, "band_hash"))
        plan = probe._jdf.queryExecution().executedPlan().toString()
        # exactly one Exchange (the batch side); the bucketed corpus scan
        # has none
        assert plan.count("Exchange") == 1
        assert "FileScan" in plan and "SelectedBucketsCount" in plan
        assert probe.count() >= 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
