"""Property-based spot checks (SURVEY.md §5.4): for randomized value pools
(numbers, dates, '', 'N/A', garbage), every row the engine flags violates
the rule per a Python-side reference implementation, and every clean row
passes.

One Spark round-trip per property (hypothesis generates the pool, a single
DataFrame evaluates it) to keep runtime sane.
"""

import datetime

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from nci_seronet_proc_data_validator_spark.functions.checks import (
    check_if_number,
    check_in_list,
)
from nci_seronet_proc_data_validator_spark.operators.typing import with_typed_shadows
from nci_seronet_proc_data_validator_spark.plans.rules import (
    ColumnRules,
    compile_sheet_findings,
)

VALUES = st.one_of(
    st.just(""), st.just("N/A"),
    st.integers(-500, 500).map(str),
    st.floats(-1000, 1000, allow_nan=False).map(lambda f: f"{f:.3f}"),
    st.sampled_from(["abc", "12_34", "2020-01-15", "99x", "0.5.1", "-"]),
)


def _eval(spark, values, rules):
    df = spark.createDataFrame(
        [Row(row_index=i + 2, v=v) for i, v in enumerate(values)])
    df = with_typed_shadows(df, columns=["v"])
    out = compile_sheet_findings(df, "s.csv", rules)
    return {r["Row_Index"] for r in out.collect()}


def _ref_is_number(v: str) -> bool:
    if "_" in v:
        return False
    try:
        float(v)
        return True
    except ValueError:
        return False


@settings(max_examples=12, deadline=None)
@given(st.lists(VALUES, min_size=1, max_size=30))
def test_number_range_property(spark, values):
    flagged = _eval(spark, values,
                    [ColumnRules("v", check_if_number("v", 0, 100, True,
                                                      "float"))])
    for i, v in enumerate(values):
        should_flag = (
            v not in ("", "N/A")
            and (not _ref_is_number(v)
                 or float(v) < 0 or float(v) > 100))
        assert ((i + 2) in flagged) == should_flag, (v, should_flag)


@settings(max_examples=12, deadline=None)
@given(st.lists(VALUES, min_size=1, max_size=30))
def test_in_list_property(spark, values):
    vocab = ["abc", "N/A"]
    flagged = _eval(spark, values,
                    [ColumnRules("v", check_in_list("v", vocab))])
    for i, v in enumerate(values):
        should_flag = v != "" and v not in vocab
        assert ((i + 2) in flagged) == should_flag, (v, should_flag)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 5000),
                       st.integers(0, 2000)),
             min_size=1, max_size=20),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 5000)),
             min_size=1, max_size=40),
    st.sampled_from([500, 1000, 2100]),
)
def test_interval_join_property(spark, ivs, pts, bin_width):
    """interval_join == brute force for arbitrary keys/bounds/bin widths,
    as long as bin_width >= the widest interval (the caller invariant)."""
    from nci_seronet_proc_data_validator_spark.operators.interval import (
        interval_join)
    widest = max(w for _, _, w in ivs)
    if bin_width < widest:
        bin_width = widest
    intervals = spark.createDataFrame(
        [Row(interval_id=i, user_id=f"u{k}", lo=lo, hi=lo + w)
         for i, (k, lo, w) in enumerate(ivs)])
    points = spark.createDataFrame(
        [Row(user_id=f"u{k}", tsu=t) for k, t in pts])
    got = {(r["interval_id"], r["user_id"], r["tsu"])
           for r in interval_join(intervals, points, "user_id",
                                  bin_width=bin_width).collect()}
    want = {(i, f"u{k}", t)
            for i, (k, lo, w) in enumerate(ivs)
            for k2, t in pts if k2 == k and lo <= t <= lo + w}
    assert got == want
