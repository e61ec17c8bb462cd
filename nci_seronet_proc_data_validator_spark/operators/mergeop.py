"""MERGE INTO (upsert) semantics as a composed DataFrame operator.

The reference's jobs-table upsert is row-at-a-time probe/UPDATE/INSERT
over JDBC (``nci-seronet-data-validator.py`` job-status writes; see
``sinks/reports.upsert_job_status`` for that path). A data-scale engine
additionally needs the *set-oriented* form — applying a batch of changes
(CDC feed, corrected labels, re-scored quality tiers) to a large
snapshot: ANSI ``MERGE``'s WHEN MATCHED UPDATE / WHEN MATCHED DELETE /
WHEN NOT MATCHED INSERT, producing the next snapshot.

Design notes (100 TB posture):

- One full-outer join on the merge key is the entire data motion — a
  single sort-merge shuffle of target + source (the delete pass is a
  left-anti join on the same key, so it shares the partitioning).
  Neither side is assumed small (no broadcast hint); repeated merges
  against the same snapshot should bucket both sides by the key so the
  joins are exchange-free.
- Row fate is a map-only projection after the join: matched → source
  values (UPDATE), source-only → insert, target-only → carry unchanged.
- ANSI MERGE semantics for a unique-key source: each target row is hit
  at most once. Duplicate source keys are the caller's contract (ANSI
  raises a cardinality violation; we don't pre-aggregate on their
  behalf). CDC-style deletes arrive as a key set — a delete for an
  absent key is a no-op, matching WHEN MATCHED DELETE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, key: str,
                 deletes: DataFrame | None = None) -> DataFrame:
    """Next snapshot of ``target`` after applying ``source`` (upserts)
    and ``deletes`` (a one-column key set):

    - key in ``deletes`` and in target → row removed;
    - key in both target and source → source's non-key columns replace
      target's (WHEN MATCHED UPDATE SET *);
    - key only in source → row inserted (WHEN NOT MATCHED INSERT *);
    - key only in target → row kept.

    ``target`` and ``source`` must share a schema; returns that schema
    (column order of ``target``).
    """
    if set(source.columns) != set(target.columns):
        raise ValueError(f"schema mismatch: {source.columns} vs "
                         f"{target.columns}")
    cols = [c for c in target.columns if c != key]
    if deletes is not None:
        target = target.join(deletes.select(key), key, "left_anti")
    t = target.select(key, F.lit(True).alias("__in_t"),
                      *[F.col(c).alias(f"__t_{c}") for c in cols])
    s = source.select(key, F.lit(True).alias("__in_s"),
                      *[F.col(c).alias(f"__s_{c}") for c in cols])
    take_source = F.col("__in_s").isNotNull()
    return (t.join(s, key, "full_outer")
            .select(key, *[F.when(take_source, F.col(f"__s_{c}"))
                           .otherwise(F.col(f"__t_{c}")).alias(c)
                           for c in cols]))


def merge_upsert_oracle_sql(target_sql: str, source_sql: str, key: str,
                            cols: list[str],
                            deletes_sql: str | None = None) -> str:
    """DuckDB twin: the same anti-join + full-outer-join formulation
    (portable ANSI SQL rather than DuckDB's MERGE statement, so the
    oracle text IS the documented semantics). ``cols`` = non-key
    columns, in output order."""
    sel = ", ".join(
        f"CASE WHEN s.{key} IS NOT NULL THEN s.{c} ELSE t.{c} END AS {c}"
        for c in cols)
    # NOT EXISTS, not NOT IN: one NULL delete key would make NOT IN
    # UNKNOWN for every row and silently empty the target, where the
    # operator's left_anti join (NULL matches nothing) keeps them all
    tgt = (f"SELECT * FROM ({target_sql}) t0 WHERE NOT EXISTS "
           f"(SELECT 1 FROM ({deletes_sql}) d0 WHERE d0.{key} = t0.{key})"
           if deletes_sql else target_sql)
    return f"""
SELECT COALESCE(t.{key}, s.{key}) AS {key}, {sel}
FROM ({tgt}) t FULL OUTER JOIN ({source_sql}) s ON t.{key} = s.{key}
"""
