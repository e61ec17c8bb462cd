"""Profiler tier (operators/profiler.py): every type class — including
the DATE and TIMESTAMP_NTZ columns whose BIGINT casts used to raise
AnalysisException — plus the profile → suggest_constraints → verify
round-trip, fk violations, drift, and the approx-distinct at-scale arm.

Generalizes the reference's hand-coded per-column rulebook
(`/root/reference/Validation_Rules.py`) into the schema-driven tier run
first at ingest; see the data_profile driver query for the oracle-checked
form.
"""

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nci_seronet_proc_data_validator_spark.operators.profiler import (
    between,
    fk_violations,
    in_set,
    matches,
    non_negative,
    not_null,
    profile_drift,
    profile_table,
    profile_table_approx,
    suggest_constraints,
    unique,
    verify_constraints,
)


@pytest.fixture(scope="module")
def typed_df(spark):
    rows = [
        Row(i=1, d=1.25, s="aa", ts=datetime.datetime(2020, 1, 1, 12, 0, 5),
            dt=datetime.date(2020, 1, 1), arr=[1]),
        Row(i=2, d=-0.5, s="bbb", ts=datetime.datetime(2021, 6, 2, 0, 0, 0),
            dt=datetime.date(2021, 6, 2), arr=[2, 3]),
        Row(i=3, d=None, s=None, ts=None, dt=None, arr=None),
        Row(i=4, d=2.75, s="aa", ts=datetime.datetime(2020, 1, 1, 12, 0, 5),
            dt=datetime.date(2020, 1, 1), arr=[]),
    ]
    return spark.createDataFrame(rows)


def _as_map(df):
    return {(r["col_name"], r["metric"]): r["value"] for r in df.collect()}


def test_profile_every_type_class(typed_df):
    m = _as_map(profile_table(typed_df))
    # integral
    assert m[("i", "nonnull")] == 4 and m[("i", "nulls")] == 0
    assert m[("i", "min")] == 1 and m[("i", "max")] == 4
    assert m[("i", "sum")] == 10 and m[("i", "distinct")] == 4
    # floating: floor-quantized centi-units
    assert m[("d", "min_c100")] == -50 and m[("d", "max_c100")] == 275
    assert m[("d", "sum_c100")] == 125 + -50 + 275
    assert m[("d", "nulls")] == 1
    # string: lengths
    assert m[("s", "min_len")] == 2 and m[("s", "max_len")] == 3
    assert m[("s", "sum_len")] == 7 and m[("s", "distinct")] == 2
    # timestamp: truncated epoch seconds (was an invalid BIGINT cast on
    # the TIMESTAMP_NTZ columns parquet scans produce)
    epoch = int(datetime.datetime(2020, 1, 1, 12, 0, 5,
                                  tzinfo=datetime.timezone.utc).timestamp())
    assert m[("ts", "min_epoch")] == epoch
    # date: epoch days via its own metric class (the round-4/5 crash:
    # DATE routed into the timestamp class's CAST(c AS BIGINT))
    assert m[("dt", "min_days")] == (datetime.date(2020, 1, 1)
                                     - datetime.date(1970, 1, 1)).days
    assert m[("dt", "max_days")] == (datetime.date(2021, 6, 2)
                                     - datetime.date(1970, 1, 1)).days
    # 'other' (array) columns get the common metrics only
    assert m[("arr", "nonnull")] == 3
    assert ("arr", "min") not in m and ("arr", "min_len") not in m


def test_profile_timestamp_ntz_and_date_from_parquet(spark, sf_dir):
    """The real-world trigger: parquet timestamps surface as
    TIMESTAMP_NTZ; a derived DATE column exercises the date class."""
    orders = (spark.read.parquet(f"{sf_dir}/orders.parquet")
              .withColumn("o_orderdate_d", F.to_date("o_orderdate")))
    assert dict(orders.dtypes)["o_orderdate"] == "timestamp_ntz"
    m = _as_map(profile_table(
        orders, ["o_orderdate", "o_orderdate_d"]))
    assert m[("o_orderdate", "min_epoch")] > 0
    assert m[("o_orderdate_d", "min_days")] == \
        m[("o_orderdate", "min_epoch")] // 86400


def test_verify_constraints_single_pass(typed_df):
    cons = [not_null("i"), unique("i"), not_null("s"),
            in_set("s", ["aa", "bbb"]), in_set("s", ["aa"]),
            non_negative("d"), between("i", "1", "3"),
            matches("s", "^a")]
    m = _as_map(verify_constraints(typed_df, cons))
    assert m[("i", "not_null")] == 0 and m[("i", "unique")] == 0
    assert m[("s", "not_null")] == 1       # one NULL s
    # violation counts: NULLs never violate in_set/matches
    assert m[("s", "in_set")] in (0, 1)    # two in_set entries share a key
    assert m[("d", "non_negative")] == 1   # -0.5
    assert m[("i", "between")] == 1        # i=4
    assert m[("s", "matches")] == 1        # 'bbb'


def test_profile_suggest_verify_roundtrip(typed_df):
    import duckdb

    prof = profile_table(typed_df).collect()
    cons = suggest_constraints(prof)
    names = {(k.col_name, k.name) for k in cons}
    # i was complete and all-distinct -> not_null + unique + between
    assert ("i", "not_null") in names and ("i", "unique") in names
    assert ("i", "between") in names
    # every ordered type class gets an envelope constraint
    assert ("d", "between") in names                       # floating c100
    assert ("dt", "between") in names                      # DATE literals
    assert ("CAST(ts AS TIMESTAMP)", "between") in names   # TIMESTAMP
    assert ("length(s)", "between") in names               # string length
    # every suggested constraint must verify clean on the data it was
    # suggested from (the Deequ contract)...
    violations = _as_map(verify_constraints(typed_df, cons))
    assert all(v == 0 for v in violations.values()), violations
    # ...on BOTH engines (the suggested SQL is engine-portable)
    from nci_seronet_proc_data_validator_spark.operators.profiler import (
        verify_oracle_sql)
    con = duckdb.connect()
    con.register("t", typed_df.drop("arr").toPandas())
    duck_cons = [k for k in cons if k.col_name != "arr"]
    for r in con.execute(verify_oracle_sql("t", duck_cons)).fetchall():
        assert r[2] == 0, r


def test_fk_violations_planted(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    clean = fk_violations(li, "l_orderkey", orders, "o_orderkey").collect()
    assert clean[0]["value"] == 0  # TPC-H referential integrity holds
    holed = orders.filter(F.col("o_orderkey") % 7 != 0)
    planted = fk_violations(li, "l_orderkey", holed, "o_orderkey").collect()
    expect = li.filter(F.col("l_orderkey") % 7 == 0).count()
    assert planted[0]["value"] == expect > 0


def test_profile_drift_statuses(typed_df):
    old = profile_table(typed_df.drop("dt"))
    new = profile_table(typed_df.filter(F.col("i") % 2 == 0))
    drift = {(r["col_name"], r["metric"]): r["status"]
             for r in profile_drift(old, new).collect()}
    assert drift[("dt", "min_days")] == "added"
    assert drift[("i", "nonnull")] == "changed"     # 4 -> 2
    assert drift[("i", "max")] == "unchanged"       # 4 both sides


def test_profile_table_approx_bounds(spark, sf_dir):
    """The no-Expand at-scale arm: every non-distinct metric bit-equal to
    the exact form; distinct_approx within HLL++ error of exact."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact = _as_map(profile_table(orders))
    approx = _as_map(profile_table_approx(orders, rsd=0.05))
    for (c, m), v in approx.items():
        if m == "distinct_approx":
            ex = exact[(c, "distinct")]
            assert abs(v - ex) <= max(3, 0.2 * ex), (c, v, ex)
        else:
            assert v == exact[(c, m)], (c, m)


def test_approx_profile_plan_has_no_expand(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    exact_plan = profile_table(orders)._jdf.queryExecution() \
        .executedPlan().toString()
    approx_plan = profile_table_approx(orders)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Expand" in exact_plan        # the exact-distinct scale caveat
    assert "Expand" not in approx_plan   # gone in the HLL++ arm


def test_observe_profile_batch_and_stream(spark, sf_dir, tmp_path):
    """observe_profile rides the materializing job (no extra scan):
    batch metrics via Observation match profile_table_approx; the SAME
    call on a readStream frame surfaces them per micro-batch in
    StreamingQueryProgress.observedMetrics."""
    from pyspark.sql import Observation
    from nci_seronet_proc_data_validator_spark.operators.profiler import (
        observe_profile)

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .select("o_orderkey", "o_orderstatus")
    want = {f"{c}__{m}": v
            for (c, m), v in _as_map(profile_table_approx(orders)).items()}

    obs = Observation("profile")
    observe_profile(orders, obs).write.format("noop") \
        .mode("overwrite").save()
    assert obs.get == want

    orders.write.parquet(str(tmp_path / "src"), mode="overwrite")
    stream = (spark.readStream
              .schema("o_orderkey long, o_orderstatus string")
              .parquet(str(tmp_path / "src")))
    q = (observe_profile(stream, "profile_s")
         .writeStream.format("noop")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {}
    for p in q.recentProgress:
        om = p["observedMetrics"].get("profile_s") if p["observedMetrics"] \
            else None
        if om and om["o_orderkey__nonnull"]:
            got = om
    # single micro-batch saw the whole table -> same metrics as batch
    assert {k: got[k] for k in want} == want


def test_fused_quality_pass_matches_composition(typed_df):
    """fused_quality_pass (one aggregation pass) is row-identical to the
    profile_table + verify_constraints + profile_drift composition, and
    its plan carries exactly one aggregate source."""
    from nci_seronet_proc_data_validator_spark.operators.profiler import (
        fused_quality_pass)
    cons = [not_null("i"), non_negative("d")]
    fused = fused_quality_pass(typed_df, cons, slice_sql="i % 2 = 0",
                               drift_added=("arr",))
    got = {(r["arm"], r["col_name"], r["metric"]): r["value"]
           for r in fused.collect()}

    prof = _as_map(profile_table(typed_df))
    for (c, m), v in prof.items():
        assert got[("profile", c, m)] == v
    ver = _as_map(verify_constraints(typed_df, cons))
    for (c, m), v in ver.items():
        assert got[("verify", c, m)] == v
    drift = {(r["col_name"], r["metric"]): (r["status"], r["delta"],
                                            r["old_value"], r["new_value"])
             for r in profile_drift(
                 profile_table(typed_df.drop("arr")),
                 profile_table(typed_df.filter(F.col("i") % 2 == 0))
             ).collect()}
    for (c, m), (status, delta, old, new) in drift.items():
        want = delta if delta is not None else (
            new if new is not None else old)
        assert got[("drift", c, f"{m}/{status}")] == want, (c, m)

    # the fusion claim, r13 form: the pass reads ONE source with no
    # Union (the composition costs three separate sources + a drift
    # join). Since the r13 split-aggregate optimization
    # (profiler._struct_agg), exact-DISTINCT aggregates are planned as
    # their own aggregate over the same source — so the source appears
    # (at most) twice: once under the algebraic aggregate (no Expand)
    # and once under the distinct-only aggregate, and the only Join is
    # the single-row cross join stitching the two 1-row results. (Take
    # the final AQE plan section only.)
    plan = fused._jdf.queryExecution().executedPlan().toString() \
        .split("== Initial Plan ==")[0]
    assert 1 <= plan.count("Scan ") <= 2
    assert "Union" not in plan
    if plan.count("Scan ") == 2:      # split form: 1-row × 1-row stitch
        assert plan.count("Join") == plan.count("BroadcastNestedLoopJoin")
        # the algebraic side must NOT pay the distinct Expand: exactly
        # one Expand (under the distinct-only aggregate)
        assert plan.count("Expand") == 1
    else:
        assert "Join" not in plan


def test_fused_quality_pass_approx_distinct_no_expand(spark, sf_dir):
    """The production switch: approx_distinct=True removes every
    DISTINCT aggregate (no Expand), keeps all other metrics bit-equal to
    the exact fused pass, and bounds distinct_approx by HLL++ error."""
    from nci_seronet_proc_data_validator_spark.operators.profiler import (
        fused_quality_pass)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cons = [not_null("o_orderkey")]
    exact = {(r["arm"], r["col_name"], r["metric"]): r["value"]
             for r in fused_quality_pass(
                 orders, cons, slice_sql="o_orderkey % 2 = 0").collect()}
    approx_df = fused_quality_pass(orders, cons,
                                   slice_sql="o_orderkey % 2 = 0",
                                   approx_distinct=True)
    plan = approx_df._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan
    for (arm, c, m), v in {(r["arm"], r["col_name"], r["metric"]):
                           r["value"] for r in approx_df.collect()}.items():
        if "distinct_approx" in m:
            base = m.replace("distinct_approx", "distinct")
            if arm == "drift":
                continue    # drift deltas of approx counts aren't comparable
            ex = exact[(arm, c, base)]
            assert abs(v - ex) <= max(3, 0.2 * ex), (arm, c, m)
        else:
            assert v == exact[(arm, c, m)], (arm, c, m)


def test_incremental_profile_merges_to_full(spark, sf_dir):
    """profile_partials per batch + merge_profiles == the one-shot
    profile: algebraic metrics bit-equal; the merged HLL distinct
    estimate sits within HLL error of true distinct (union of sketches
    carries the same error guarantee as a single-pass sketch, though not
    bit-identical — sparse→dense state transitions depend on order)."""
    from nci_seronet_proc_data_validator_spark.operators.profiler import (
        merge_profiles, profile_partials)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet") \
        .withColumn("batch", F.col("o_orderkey") % 3)
    partials = profile_partials(orders, "batch",
                                columns=["o_orderkey", "o_totalprice",
                                         "o_orderstatus"])
    assert partials.count() == 3
    merged = {(r["col_name"], r["metric"]): r["value"]
              for r in merge_profiles(partials, "batch").collect()}
    full = _as_map(profile_table(
        orders, ["o_orderkey", "o_totalprice", "o_orderstatus"]))
    for (c, m), v in full.items():
        if m == "distinct":
            est = merged[(c, "distinct_hll")]
            assert abs(est - v) <= max(3, 0.05 * v), (c, est, v)
        else:
            assert merged[(c, m)] == v, (c, m)


def test_detect_anomalies_bands_and_degenerates(spark):
    """mean±k·σ band over metric history: a stable metric flags on a 40%
    swing, normal jitter passes, zero-variance history flags ANY change,
    an unseen metric flags, and a short history uses min/max equality."""
    from nci_seronet_proc_data_validator_spark.operators.profiler import (
        detect_anomalies)

    def prof(rows):
        return spark.createDataFrame(
            rows, "col_name string, metric string, value long")

    history = prof(
        # jittery but stable row count across 4 snapshots
        [("t", "nonnull", v) for v in (100, 104, 96, 100)]
        # zero-variance metric
        + [("t", "max", 7) for _ in range(4)]
        # short history (2 obs < min_history)
        + [("t", "min", v) for v in (1, 1)])
    current = prof([
        ("t", "nonnull", 101),    # inside band
        ("t", "max", 8),          # zero-variance history: any change flags
        ("t", "min", 1),          # short history, equal to min/max band
        ("t", "sum", 500),        # never seen -> anomaly
    ])
    got = {(r["col_name"], r["metric"]): r["is_anomaly"]
           for r in detect_anomalies(history, current, k=3).collect()}
    assert got[("t", "nonnull")] is False
    assert got[("t", "max")] is True
    assert got[("t", "min")] is False
    assert got[("t", "sum")] is True

    # the 40% drop cases flags
    bad = prof([("t", "nonnull", 60)])
    flag = detect_anomalies(history, bad, k=3).collect()[0]
    assert flag["is_anomaly"] is True
    assert flag["band_lo"] <= 10000 <= flag["band_hi"]   # 100 in centi


def test_decide_approx_distinct_regimes():
    """Pin the measured decision rule (verdict-r9 ask 3) on both regimes:
    grouped always sketches; global stays exact up to the width budget
    (sf10 A/B: exact faster at ~26 groups scan-bound) and switches to
    approx beyond it (width probe: exact superlinear by W=32)."""
    from nci_seronet_proc_data_validator_spark.operators.profiler import (
        APPROX_DISTINCT_WIDTH_BUDGET, decide_approx_distinct)
    # global / narrow: exact (the sf10-measured regime, ~26 groups)
    assert decide_approx_distinct(26, grouped=False) is False
    assert decide_approx_distinct(APPROX_DISTINCT_WIDTH_BUDGET,
                                  grouped=False) is False
    # global / wide: approx (probe: 8.6x at W=32+, 15x at W=64)
    assert decide_approx_distinct(APPROX_DISTINCT_WIDTH_BUDGET + 1,
                                  grouped=False) is True
    assert decide_approx_distinct(64, grouped=False) is True
    # grouped: always approx, at any width
    assert decide_approx_distinct(2, grouped=True) is True


def test_fused_quality_pass_auto_picks_by_width(spark, sf_dir):
    """approx_distinct='auto' applies decide_approx_distinct to the
    pass's own distinct-group width (slice twin doubles it): orders'
    ~10-column profile stays exact (Expand present, oracle-comparable);
    a wide frame flips to distinct_approx (no Expand)."""
    from nci_seronet_proc_data_validator_spark.operators.profiler import (
        fused_quality_pass)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    narrow = fused_quality_pass(orders, [], approx_distinct="auto")
    nplan = narrow._jdf.queryExecution().executedPlan().toString()
    nmetrics = {r["metric"] for r in narrow.collect()}
    assert "distinct" in nmetrics and "distinct_approx" not in nmetrics
    assert "Expand" in nplan
    # 40 string columns -> 40 distinct groups > budget -> approx
    wide = orders.selectExpr(
        *[f"CAST(o_orderkey % {3 + i} AS STRING) AS w{i}"
          for i in range(40)])
    auto = fused_quality_pass(wide, [], approx_distinct="auto")
    aplan = auto._jdf.queryExecution().executedPlan().toString()
    ametrics = {r["metric"] for r in auto.collect()}
    assert "distinct_approx" in ametrics and "distinct" not in ametrics
    assert "Expand" not in aplan
    # slice twin counts toward the width: 17 columns x 2 twins = 34 > 32
    mid = orders.selectExpr(
        *[f"CAST(o_orderkey % {3 + i} AS STRING) AS w{i}"
          for i in range(17)])
    sliced = fused_quality_pass(mid, [], slice_sql="w0 = '1'",
                                approx_distinct="auto")
    smetrics = {r["metric"] for r in sliced.collect()}
    assert "distinct_approx" in smetrics


def test_fused_auto_counts_constraint_distincts(spark, sf_dir):
    """Review fix: unique() constraints contribute exact DISTINCT groups
    to the Expand in BOTH arms, so 'auto' must count them toward the
    width budget: one profiled column + 40 unique() constraints is a
    wide pass and flips to approx for the profile metric."""
    from nci_seronet_proc_data_validator_spark.operators.profiler import (
        fused_quality_pass, unique)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    wide_cons = [unique("o_orderkey") for _ in range(40)]
    auto = fused_quality_pass(orders, wide_cons, columns=["o_orderkey"],
                              approx_distinct="auto")
    metrics = {r["metric"] for r in auto.collect()}
    assert "distinct_approx" in metrics and "distinct" not in metrics


def test_fused_auto_ignores_approx_spelled_constraints(spark, sf_dir):
    """r11 (ADVICE): 'auto' counts only exact-DISTINCT syntax toward the
    Expand width — a constraint spelled approx_count_distinct adds no
    Expand group and must not flip the decision. 40 approx-spelled
    constraints + 1 profiled column stays narrow → exact distinct."""
    from nci_seronet_proc_data_validator_spark.operators.profiler import (
        Constraint, fused_quality_pass)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    approx_cons = [
        Constraint("adx", "o_orderkey",
                   "approx_count_distinct(o_orderkey) - "
                   "approx_count_distinct(o_orderkey)",
                   "0")
        for _ in range(40)]
    auto = fused_quality_pass(orders, approx_cons, columns=["o_orderkey"],
                              approx_distinct="auto")
    metrics = {r["metric"] for r in auto.collect()}
    assert "distinct" in metrics and "distinct_approx" not in metrics


def test_struct_agg_split_matches_single_aggregate(spark):
    """The r13 split-DISTINCT planning (_struct_agg: algebraic and exact-
    DISTINCT aggregates as two 1-row aggregates stitched by cross join)
    must be value- and schema-identical to the single mixed aggregate it
    replaced — including on an EMPTY input, where both sides still emit
    their one global-aggregate row."""
    from pyspark.sql import functions as F

    from nci_seronet_proc_data_validator_spark.operators.profiler import (
        _struct_agg)

    items = ["count(*) AS n", "count(DISTINCT a) AS d_a",
             "sum(a) AS s_a", "count(DISTINCT b) AS d_b",
             "max(b) AS mx_b"]
    single = lambda df: (df.agg(F.expr(f"struct({', '.join(items)})")
                                .alias("_m")).select("_m.*"))
    data = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (None, None)],
        "a int, b string")
    for df in (data, data.limit(0)):
        got, want = _struct_agg(df, items), single(df)
        # the split emits algebraic columns first, then distinct ones —
        # callers reference metrics BY NAME (m{i} aliases), so pin the
        # name set and the per-name values, not positional order
        assert sorted(got.columns) == sorted(want.columns)
        [g], [w] = got.collect(), want.collect()
        assert g.asDict() == w.asDict()
