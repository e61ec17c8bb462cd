"""Streaming CDC apply: a change stream merged into a versioned parquet
snapshot via ``foreachBatch`` + ``operators/mergeop.merge_upsert``.

This is the streaming face of the ANSI MERGE operator — the pattern a
lakehouse table format (Delta/Iceberg/Hudi) wraps in a transaction log,
reduced to its Spark core: each micro-batch is one set-oriented merge
(full-outer join on the key) producing the next immutable snapshot
version, with a driver-side pointer file naming the current version.
Readers always open a complete, already-committed version; a crash
mid-batch leaves the pointer (and therefore every reader) on the last
good snapshot, and the stream's checkpoint replays the batch —
at-least-once apply with idempotent effect, because re-merging the same
changes into the same base version yields the same next snapshot.

Scale notes: the merge itself is ``merge_upsert``'s single sort-merge
shuffle; snapshot versions should be written bucketed by the merge key
(``bucketBy``) so successive merges co-locate and skip the exchange on
the target side. The pointer file is metadata-scale driver I/O, same as
every artifact writer here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_VERSION"


def _version_file(base: str) -> str:
    return os.path.join(base, _POINTER)


def current_version(base: str) -> int:
    """Committed snapshot version (0 = only the initial seed exists)."""
    try:
        with open(_version_file(base)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return 0


def snapshot_path(base: str, version: int | None = None) -> str:
    v = current_version(base) if version is None else version
    return os.path.join(base, f"v{v}")


def init_snapshot(target: DataFrame, base: str) -> str:
    """Seed version 0. Returns the snapshot path."""
    path = snapshot_path(base, 0)
    target.write.mode("overwrite").parquet(path)
    os.makedirs(base, exist_ok=True)
    with open(_version_file(base), "w") as f:
        f.write("0")
    return path


def apply_cdc_batch(batch: DataFrame, base: str, key: str,
                    op_col: str = "op", delete_op: str = "delete") -> int:
    """Merge one change batch (rows carry ``op_col``: ``delete_op`` rows
    are key deletes, everything else upserts) into the current snapshot;
    commit the next version and return its number. Empty batches commit
    nothing (version unchanged)."""
    from nci_seronet_proc_data_validator_spark.operators.mergeop import (
        merge_upsert)
    if batch.isEmpty():
        return current_version(base)
    spark = batch.sparkSession
    v = current_version(base)
    target = spark.read.parquet(snapshot_path(base, v))
    ups = batch.filter(F.col(op_col) != delete_op).drop(op_col)
    dels = batch.filter(F.col(op_col) == delete_op).select(key)
    nxt = merge_upsert(target, ups, key, deletes=dels)
    nxt.write.mode("overwrite").parquet(snapshot_path(base, v + 1))
    # write-then-pointer-swap: the version file is the commit point
    with open(_version_file(base), "w") as f:
        f.write(str(v + 1))
    return v + 1


def apply_cdc_stream(changes: DataFrame, base: str, key: str,
                     checkpoint: str, op_col: str = "op",
                     delete_op: str = "delete"):
    """Attach the CDC merge to a streaming change feed. Each micro-batch
    commits one snapshot version. Returns the started StreamingQuery
    (caller picks the trigger semantics by how it built ``changes`` —
    pair with ``maxFilesPerTrigger=1`` on a file source to force
    batch-per-file replay in tests)."""
    def _apply(df: DataFrame, _batch_id: int) -> None:
        apply_cdc_batch(df, base, key, op_col=op_col, delete_op=delete_op)

    return (changes.writeStream
            .foreachBatch(_apply)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
