"""As-of (temporal) join — an operator Spark lacks natively.

Composition strategy (preferred over Pandas-UDF per the guide's order):
union the two sides tagged by origin, sort within (key, time), and carry
the most recent right-side row forward with a window ``last_value``
(ignore-nulls). One shuffle on (key), linear scan within partitions —
the same shape a native as-of join would plan, and it scales: no
per-key collect, no driver loops, skew on hot keys handled by AQE.

Semantics: for each left row, the latest right row with
``right.time <= left.time`` and equal key (ties: the right row itself).
Matches DuckDB's ``ASOF JOIN`` (the oracle) and pandas ``merge_asof``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, time_col: str,
              value_cols: list[str]) -> DataFrame:
    """Left as-of join: every left row + the latest right values at-or-
    before its time. Left columns are preserved; ``value_cols`` come from
    the right side (null when no right row precedes)."""
    lcols = left.columns
    # The whole right payload travels as ONE struct so a single
    # last(ignorenulls) carries a consistent row (per-column carry could mix
    # rows when right values contain nulls).
    r_struct = F.struct(*[F.col(c).alias(c) for c in value_cols])
    r = (right.select(key, time_col, r_struct.alias("_r"))
         .withColumn("_side", F.lit(0)))
    l = left.withColumn("_side", F.lit(1)) \
            .withColumn("_r", F.lit(None).cast(
                r.schema["_r"].dataType))
    for c in lcols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(left.schema[c].dataType))
    unioned = l.select(*lcols, "_side", "_r") \
        .unionByName(r.select(*lcols, "_side", "_r"))

    # right rows (side 0) sort before left rows at the same timestamp, so a
    # simultaneous right row is visible to the left row ("<=" semantics).
    # Multiple right rows at the exact same (key, time) are resolved
    # arbitrarily — supply a pre-deduped right side for full determinism.
    w = (Window.partitionBy(key).orderBy(time_col, "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = unioned.withColumn("_rf", F.last("_r", ignorenulls=True).over(w))
    return (filled.filter(F.col("_side") == 1)
            .select(*lcols, *[F.col(f"_rf.{c}").alias(c)
                              for c in value_cols]))
