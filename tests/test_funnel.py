"""Sequential funnel: strict-order conversion semantics vs a hand
fixture, DuckDB parity, and the monotone-counts law."""

import duckdb
import pandas as pd

from nci_seronet_proc_data_validator_spark.operators.funnel import (
    funnel_counts,
    funnel_oracle_sql,
)

EV = [
    # user 1 converts fully in order
    (1, "2024-01-01 10:00:00", "view"),
    (1, "2024-01-01 10:01:00", "click"),
    (1, "2024-01-01 10:02:00", "purchase"),
    # user 2: clicked BEFORE viewing -> click doesn't count; no purchase
    (2, "2024-01-01 09:00:00", "click"),
    (2, "2024-01-01 09:30:00", "view"),
    # user 3: view then click; purchase BEFORE click -> stops at click
    (3, "2024-01-01 08:00:00", "view"),
    (3, "2024-01-01 08:10:00", "purchase"),
    (3, "2024-01-01 08:20:00", "click"),
    # user 4: purchase only -> never enters the funnel
    (4, "2024-01-01 07:00:00", "purchase"),
    # user 2 clicks again after viewing -> now converts step 2
    (2, "2024-01-01 09:45:00", "click"),
]
STEPS = ["view", "click", "purchase"]


def _df(spark):
    return spark.createDataFrame(
        [(u, t, e) for u, t, e in EV],
        "user_id long, ts_s string, event_type string").selectExpr(
        "user_id", "CAST(ts_s AS TIMESTAMP) AS ts", "event_type")


def test_funnel_strict_order_semantics(spark):
    got = {r["step"]: (r["step_name"], r["n_users"])
           for r in funnel_counts(_df(spark), STEPS).collect()}
    # viewers: 1,2,3; valid clicks after view: 1,2,3; purchases after
    # a valid click: only user 1
    assert got == {1: ("view", 3), 2: ("click", 3), 3: ("purchase", 1)}


def test_funnel_matches_duckdb_and_is_monotone(spark):
    got = sorted((r["step"], r["step_name"], r["n_users"])
                 for r in funnel_counts(_df(spark), STEPS).collect())
    con = duckdb.connect()
    pdf = pd.DataFrame(EV, columns=["user_id", "ts", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    con.register("events", pdf)
    want = sorted(con.execute(funnel_oracle_sql(STEPS)).fetchall())
    assert got == want
    counts = [n for _, _, n in got]
    assert counts == sorted(counts, reverse=True)   # funnels shrink


def test_funnel_pushes_step_filter_to_scan(spark, tmp_path, sf_dir):
    """Each step's event-type predicate must reach the parquet scan
    (PushedFilters), so a 100 TB event log reads only the funnel's
    event types per stage."""
    import os
    ev = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    lvl1 = funnel_levels_first(ev)
    plan = lvl1._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(event_type,view)" in plan


def funnel_levels_first(ev):
    from nci_seronet_proc_data_validator_spark.operators.funnel import (
        funnel_levels)
    return funnel_levels(ev, ["view", "click"])[0]


def test_funnel_lags_matches_duckdb_and_fixture(spark):
    from nci_seronet_proc_data_validator_spark.operators.funnel import (
        funnel_lags, funnel_lags_oracle_sql)
    got = sorted((r["step"], r["step_name"], r["n_users"],
                  r["median_lag_us"])
                 for r in funnel_lags(_df(spark), STEPS).collect())
    con = duckdb.connect()
    pdf = pd.DataFrame(EV, columns=["user_id", "ts", "event_type"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    con.register("events", pdf)
    want = sorted(con.execute(funnel_lags_oracle_sql(STEPS)).fetchall())
    assert got == want
    by_step = {s: (n, m) for s, _, n, m in got}
    # click lags: u1 60s, u2 15min, u3 20min -> median 15min; purchase:
    # only u1, 60s after its click
    assert by_step[2] == (3, 15 * 60 * 1_000_000.0)
    assert by_step[3] == (1, 60 * 1_000_000.0)


def test_streaming_funnel_matches_batch(spark, tmp_path):
    """The stateful streaming funnel, fed time-ordered micro-batches,
    converges to the batch funnel's per-step conversion counts."""
    from pyspark.sql import functions as F

    from nci_seronet_proc_data_validator_spark.streaming.stateful import (
        track_funnel)
    ev = _df(spark).select(
        "user_id", F.unix_micros("ts").alias("ts_us"), "event_type")
    # two time-ordered files -> time-ordered micro-batches
    cut = "2024-01-01 09:00:00"
    src = str(tmp_path / "ev")
    ev.filter(f"ts_us < unix_micros(TIMESTAMP '{cut}')") \
        .coalesce(1).write.parquet(src)
    ev.filter(f"ts_us >= unix_micros(TIMESTAMP '{cut}')") \
        .coalesce(1).write.mode("append").parquet(src)
    # maxFilesPerTrigger=1: each file is its own micro-batch, so the
    # cross-batch state path (state.exists) is genuinely exercised
    stream = (spark.readStream.schema(
        "user_id long, ts_us long, event_type string")
        .option("maxFilesPerTrigger", 1).parquet(src))
    q = (track_funnel(stream, STEPS)
         .writeStream.outputMode("append").format("memory")
         .queryName("funnel_out").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM funnel_out").collect()
    final = {}
    for r in rows:
        final[r["user_id"]] = max(final.get(r["user_id"], 0),
                                  r["reached_step"])
    got = {k: sum(1 for v in final.values() if v >= k)
           for k in (1, 2, 3)}
    want = {r["step"]: r["n_users"]
            for r in funnel_counts(_df(spark), STEPS).collect()}
    assert got == want
