"""Skew-mitigation utilities: salting for hot keys.

AQE's skew-join splitting (enabled in ``session.py``) handles most skew at
runtime; these helpers cover the cases AQE can't — skewed GROUP BY keys and
joins where one key dominates so heavily that even split partitions choke.

Pattern: two-phase aggregation. Phase 1 aggregates on (key, salt) — the hot
key's rows spread over ``n_salts`` partitions and combine map-side; phase 2
merges the per-salt partials. Total shuffle volume drops from O(rows of hot
key) to O(n_salts) for the hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salts: int = 16,
              salt_col: str = "_salt") -> DataFrame:
    """Uniform random-ish salt derived from a cheap deterministic hash of
    the whole row id space (monotonic id % n) — deterministic per run,
    uniform enough to spread a hot key."""
    return df.withColumn(
        salt_col, (F.monotonically_increasing_id() % n_salts).cast("int"))


def salted_count(df: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-phase count: groupBy(key, salt) → groupBy(key). Equivalent to
    ``df.groupBy(key).count()`` but the hot key never lands on one task."""
    salted = with_salt(df, n_salts)
    partial = salted.groupBy(key, "_salt").agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key).agg(F.sum("_c").alias("count"))


def salted_broadcast_join(big: DataFrame, small: DataFrame, key: str,
                          n_salts: int = 16) -> DataFrame:
    """Skewed big-side join: replicate the small side once per salt and
    join on (key, salt) so the hot key's rows hit ``n_salts`` tasks.
    Only needed when the small side is too large for a plain broadcast
    AND the big side is skewed; otherwise prefer ``F.broadcast``/AQE."""
    salted_big = with_salt(big, n_salts)
    exploded_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return salted_big.join(exploded_small, [key, "_salt"]).drop("_salt")
