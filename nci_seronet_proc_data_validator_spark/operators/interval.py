"""Interval (range-containment) join — an operator the reference lacks
and vanilla Spark only executes as a broadcast-nested-loop / cartesian
theta-join: match points ``ts ∈ [lo, hi]`` per key.

Design notes (100 TB posture):

- A naive ``a.key = b.key AND b.ts BETWEEN a.lo AND a.hi`` join has no
  equi-condition on the range part; Spark falls back to BNLJ (or a
  per-key cartesian product under skewed keys). The scale-correct shape
  is **time binning**: explode each interval to the fixed-width bins it
  covers, bin each point once, and equi-join on ``(key, bin)`` — a plain
  hash/sort-merge shuffle join — then post-filter exact containment.
  With bin width ≥ max interval width each interval covers ≤ 2 bins, so
  the build side inflates ≤ 2× while the probe side stays 1×.
- Each (interval, point) pair is produced **at most once** (a point has
  exactly one bin), so no distinct pass is needed.
- All arithmetic is integer micros (the engine-wide timestamp contract;
  see ``q_sessionize``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(intervals: DataFrame, points: DataFrame, key: str,
                  lo_col: str = "lo", hi_col: str = "hi",
                  ts_col: str = "tsu",
                  bin_width: int = 1_800_000_000) -> DataFrame:
    """Join ``points`` (one row per event, ``ts_col`` integer micros) to
    every interval of ``intervals`` (``[lo_col, hi_col]`` micros, closed)
    sharing ``key`` that contains them. ``bin_width`` must be ≥ the widest
    interval for the ≤2-bins guarantee (asserted per row is a scan cost
    we skip; the caller owns the invariant).

    Returns intervals' columns + points' columns (key deduplicated).
    """
    iv = intervals.withColumn(
        "__bin", F.explode(F.sequence(
            F.floor(F.col(lo_col) / F.lit(bin_width)),
            F.floor(F.col(hi_col) / F.lit(bin_width)))))
    pt = points.withColumn(
        "__bin", F.floor(F.col(ts_col) / F.lit(bin_width)))
    return (iv.join(pt, [key, "__bin"])
            .filter(F.col(ts_col).between(F.col(lo_col), F.col(hi_col)))
            .drop("__bin"))
