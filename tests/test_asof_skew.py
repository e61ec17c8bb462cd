"""As-of join semantics and skew utilities."""

from pyspark.sql import functions as F


def test_asof_join_semantics(spark):
    from nci_seronet_proc_data_validator_spark.operators.asof import asof_join
    quotes = spark.createDataFrame(
        [("A", 1, 10.0), ("A", 5, 11.0), ("B", 3, 20.0)],
        "sym string, t long, px double")
    trades = spark.createDataFrame(
        [("A", 0, "t0"), ("A", 1, "t1"), ("A", 4, "t2"), ("A", 7, "t3"),
         ("B", 2, "t4"), ("B", 9, "t5"), ("C", 1, "t6")],
        "sym string, t long, trade string")
    out = {r["trade"]: r["px"] for r in
           asof_join(trades, quotes, "sym", "t", ["px"]).collect()}
    assert out["t0"] is None          # before any quote
    assert out["t1"] == 10.0          # quote at the same instant visible
    assert out["t2"] == 10.0          # latest at-or-before t=4
    assert out["t3"] == 11.0
    assert out["t4"] is None          # B's quote arrives at t=3
    assert out["t5"] == 20.0
    assert out["t6"] is None          # key with no right rows at all


def test_salted_count_equivalence(spark):
    from nci_seronet_proc_data_validator_spark.operators.skew import (
        salted_count)
    # one hot key dominating
    df = spark.range(0, 10000).select(
        F.when(F.col("id") % 100 == 0, F.col("id")).otherwise(0).alias("k"))
    plain = {r["k"]: r["count"] for r in
             df.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"] for r in salted_count(df, "k").collect()}
    assert plain == salted


def test_salted_broadcast_join_equivalence(spark):
    from nci_seronet_proc_data_validator_spark.operators.skew import (
        salted_broadcast_join)
    big = spark.range(0, 5000).select((F.col("id") % 3).alias("k"),
                                      F.col("id").alias("v"))
    small = spark.createDataFrame([(0, "a"), (1, "b"), (2, "c"), (3, "d")],
                                  "k long, tag string")
    plain = big.join(small, "k").groupBy("tag").count()
    salted = salted_broadcast_join(big, small, "k").groupBy("tag").count()
    assert {tuple(r) for r in plain.collect()} == \
        {tuple(r) for r in salted.collect()}
