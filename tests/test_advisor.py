"""Scale-hazard advisor (plans/advisor.py): invocation rules (fixed k over
unbounded input) and plan rules (cartesian, nested-loop, global window)."""

import warnings

import pytest

from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.plans.advisor import (
    PAIR_BUDGET, ScaleHazardWarning, advise_plan, warn_fixed_k)


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")


FOUR = [(0, [1.0, 0.0]), (1, [1.0, 0.01]), (2, [0.0, 1.0]), (3, [0.0, 0.9])]


def test_fixed_k_unbounded_warns():
    with pytest.warns(ScaleHazardWarning, match=r"O\(N\^2/7\)"):
        msg = warn_fixed_k("semdedup", 7, None)
    assert msg and "k=None" in msg


def test_fixed_k_with_declared_bound_is_clean_within_budget():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert warn_fixed_k("semdedup", 8, 100_000) is None


def test_fixed_k_declared_bound_over_budget_warns():
    n = 10_000_000     # 1e14/8 pairs >> budget
    with pytest.warns(ScaleHazardWarning, match="candidate pairs"):
        msg = warn_fixed_k("semdedup", 8, n)
    assert msg and f"max_rows={n}" in msg
    assert n * n // 8 > PAIR_BUDGET


def test_auto_k_never_warns():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        assert warn_fixed_k("semdedup", None, None) is None


def test_semdedup_invocation_trips_and_declares(spark):
    """The judge-specified trigger: semdedup with k=<literal> and no row
    bound warns; declaring max_rows or using k=None silences it."""
    from nci_seronet_proc_data_validator_spark.operators.semdedup import (
        semdedup)
    emb = _emb(spark, FOUR)
    with pytest.warns(ScaleHazardWarning, match="semdedup: fixed k=3"):
        semdedup(emb, k=3, iters=1)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        semdedup(emb, k=3, iters=1, max_rows=1000)
        semdedup(emb, k=None, iters=1)


def test_kmeans_direct_invocation_trips_once(spark):
    from nci_seronet_proc_data_validator_spark.operators.kmeans import (
        kmeans_assignments)
    from nci_seronet_proc_data_validator_spark.operators.semdedup import (
        semdedup)
    emb = _emb(spark, FOUR)
    with pytest.warns(ScaleHazardWarning, match="kmeans_assignments"):
        kmeans_assignments(emb, k=2, iters=1)
    # via semdedup the rule runs ONCE (semdedup's own, not kmeans's too)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        semdedup(emb, k=2, iters=1)
    hazards = [w for w in rec if issubclass(w.category, ScaleHazardWarning)]
    assert len(hazards) == 1 and "semdedup" in str(hazards[0].message)


def test_advise_plan_cartesian(spark):
    a = spark.range(3)
    b = spark.range(4).withColumnRenamed("id", "jd")
    hazards = advise_plan(a.crossJoin(b), warn=False)
    assert any(h.startswith(("cartesian-product", "nested-loop-join"))
               for h in hazards)


def test_advise_plan_global_window_vs_partitioned(spark):
    from pyspark.sql import Window
    df = spark.range(10).withColumn("g", F.col("id") % 2)
    bad = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("id")))
    hazards = advise_plan(bad, warn=False)
    assert any(h.startswith("global-ordered-window") for h in hazards)
    good = df.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("id")))
    assert advise_plan(good, warn=False) == []


def test_advise_plan_clean_join(spark):
    a = spark.range(100).withColumn("k", F.col("id") % 10)
    b = spark.range(10).withColumnRenamed("id", "k")
    assert advise_plan(a.join(F.broadcast(b), "k"), warn=False) == []
