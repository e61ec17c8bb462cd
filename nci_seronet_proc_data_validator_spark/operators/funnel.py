"""Sequential funnel analysis over an event stream — the conversion
query every product-analytics engine ships (step k counts users whose
FIRST step-k event strictly follows their first qualifying step-(k-1)
event; out-of-order events don't convert).

Spark shape at 100 TB: one filtered scan per step (the event-type
predicate pushes to the scan) joined to the shrinking per-user frontier
— every join and aggregation keys on ``user_id``, so with the event log
bucketed/partitioned by user the whole funnel is co-located, and the
frontier frame (≤ distinct converting users) only ever shrinks.
Timestamp comparisons are exact micros; counts are integers — both
engines agree exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_levels(events: DataFrame, steps: list[str],
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  ts_col: str = "ts") -> list[DataFrame]:
    """Per step the user frontier ``(user, t)``: t = first event of this
    step strictly after the user's step-(k-1) frontier time."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    cur = (events.filter(F.col(type_col) == steps[0])
           .groupBy(F.col(user_col).alias("user"))
           .agg(F.min(ts_col).alias("t")))
    levels = [cur]
    for st in steps[1:]:
        nxt = (events.filter(F.col(type_col) == st)
               .select(F.col(user_col).alias("user"),
                       F.col(ts_col).alias("_ts"))
               .join(cur, "user")
               .filter(F.col("_ts") > F.col("t"))
               .groupBy("user")
               .agg(F.min("_ts").alias("t")))
        levels.append(nxt)
        cur = nxt
    return levels


def funnel_counts(events: DataFrame, steps: list[str],
                  user_col: str = "user_id",
                  type_col: str = "event_type",
                  ts_col: str = "ts") -> DataFrame:
    """``(step, step_name, n_users)`` — one row per funnel step."""
    parts = []
    for k, (st, lvl) in enumerate(zip(steps,
                                      funnel_levels(events, steps,
                                                    user_col, type_col,
                                                    ts_col)), start=1):
        parts.append(lvl.groupBy().agg(
            F.lit(k).alias("step"),
            F.lit(st).alias("step_name"),
            F.count(F.lit(1)).cast("long").alias("n_users")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def funnel_oracle_sql(steps: list[str], table: str = "events",
                      user_col: str = "user_id",
                      type_col: str = "event_type",
                      ts_col: str = "ts") -> str:
    """DuckDB twin of ``funnel_counts``."""
    ctes = [f"""f1 AS (
  SELECT {user_col} AS u, min({ts_col}) AS t
  FROM {table} WHERE {type_col} = '{steps[0]}' GROUP BY 1)"""]
    for k, st in enumerate(steps[1:], start=2):
        ctes.append(f"""f{k} AS (
  SELECT e.{user_col} AS u, min(e.{ts_col}) AS t
  FROM {table} e JOIN f{k - 1} p ON p.u = e.{user_col}
  WHERE e.{type_col} = '{st}' AND e.{ts_col} > p.t
  GROUP BY 1)""")
    sel = "\nUNION ALL\n".join(
        f"SELECT {k} AS step, '{st}' AS step_name, "
        f"CAST(count(*) AS BIGINT) AS n_users FROM f{k}"
        for k, st in enumerate(steps, start=1))
    return "WITH " + ",\n".join(ctes) + "\n" + sel


def funnel_lags(events: DataFrame, steps: list[str],
                user_col: str = "user_id",
                type_col: str = "event_type",
                ts_col: str = "ts") -> DataFrame:
    """Time-to-convert per step: ``(step, step_name, n_users,
    median_lag_us)`` for steps 2..K — the median over converting users
    of (step-k frontier time − step-(k−1) frontier time), in exact
    micros. Same user-keyed join shape as the counts; the median is one
    tiny per-step aggregation over the (already shrunk) frontier."""
    if len(steps) < 2:
        raise ValueError("funnel lags need at least 2 steps")
    levels = funnel_levels(events, steps, user_col, type_col, ts_col)
    parts = []
    for k in range(1, len(levels)):
        prev = levels[k - 1].select("user", F.col("t").alias("_t0"))
        lag = (levels[k].join(prev, "user")
               .select((F.unix_micros("t")
                        - F.unix_micros("_t0")).alias("lag_us")))
        parts.append(lag.groupBy().agg(
            F.lit(k + 1).alias("step"),
            F.lit(steps[k]).alias("step_name"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.expr("percentile(lag_us, 0.5)"), 6)
            .alias("median_lag_us")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def funnel_lags_oracle_sql(steps: list[str], table: str = "events",
                           user_col: str = "user_id",
                           type_col: str = "event_type",
                           ts_col: str = "ts") -> str:
    """DuckDB twin of ``funnel_lags`` (continuous median, rounded 6 —
    the length_percentiles parity contract)."""
    if len(steps) < 2:
        raise ValueError("funnel lags need at least 2 steps")
    base = funnel_oracle_sql(steps, table, user_col, type_col, ts_col)
    # reuse the f1..fK frontier CTE chain; swap the count union for lags
    with_part = base.split("SELECT 1 AS step")[0].rstrip().rstrip("\n")
    sels = []
    for k in range(2, len(steps) + 1):
        sels.append(
            f"SELECT {k} AS step, '{steps[k - 1]}' AS step_name,\n"
            f"       CAST(count(*) AS BIGINT) AS n_users,\n"
            f"       round(quantile_cont(epoch_us(c.t) - epoch_us(p.t),"
            f" 0.5), 6) AS median_lag_us\n"
            f"FROM f{k} c JOIN f{k - 1} p ON p.u = c.u")
    return with_part + "\n" + "\nUNION ALL\n".join(sels)
