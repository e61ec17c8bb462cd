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
shuffle; pass ``buckets=N`` (with the merge key) to write every snapshot
version ``bucketBy(N, key)`` so successive merges read a target already
hash-partitioned on the key and skip the exchange on the target side —
each merge then shuffles ONLY the (small) change batch. Spark carries
bucket metadata through the catalog, not bare parquet paths, so bucketed
versions live as tables ``cdc_<base>_v{n}`` in the session warehouse
(the lakehouse-format analogy holds: the table format owns the file
layout; the pointer file is still the commit point). The pointer file is
metadata-scale driver I/O, same as every artifact writer here.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_VERSION"


def _version_file(base: str) -> str:
    return os.path.join(base, _POINTER)


def snapshot_table(base: str, version: int) -> str:
    """Catalog table name of a bucketed snapshot version."""
    slug = re.sub(r"[^A-Za-z0-9_]", "_",
                  os.path.basename(os.path.abspath(base))).lower()
    return f"cdc_{slug}_v{version}"


def _write_snapshot(df: DataFrame, base: str, version: int,
                    buckets: int | None, key: str) -> None:
    if buckets:
        (df.write.mode("overwrite").format("parquet")
         .bucketBy(buckets, key).sortBy(key)
         .saveAsTable(snapshot_table(base, version)))
    else:
        df.write.mode("overwrite").parquet(snapshot_path(base, version))


def read_snapshot(spark: SparkSession, base: str,
                  version: int | None = None,
                  buckets: int | None = None) -> DataFrame:
    """Open a committed snapshot — the bucketed (catalog) or plain
    (path) form, matching how it was written."""
    v = current_version(base) if version is None else version
    if buckets:
        return spark.table(snapshot_table(base, v))
    return spark.read.parquet(snapshot_path(base, v))


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


def init_snapshot(target: DataFrame, base: str, key: str | None = None,
                  buckets: int | None = None) -> str:
    """Seed version 0. ``buckets`` (with ``key``) writes it bucketed by
    the merge key. Returns the snapshot path (or table name)."""
    if buckets and not key:
        raise ValueError("bucketed snapshots need the merge key")
    _write_snapshot(target, base, 0, buckets, key or "")
    os.makedirs(base, exist_ok=True)
    with open(_version_file(base), "w") as f:
        f.write("0")
    return snapshot_table(base, 0) if buckets else snapshot_path(base, 0)


def apply_cdc_batch(batch: DataFrame, base: str, key: str,
                    op_col: str = "op", delete_op: str = "delete",
                    buckets: int | None = None) -> int:
    """Merge one change batch (rows carry ``op_col``: ``delete_op`` rows
    are key deletes, everything else upserts) into the current snapshot;
    commit the next version and return its number. Empty batches commit
    nothing (version unchanged). With ``buckets``, the target snapshot is
    read from its bucketed table — already hash-partitioned on the key,
    so the merge joins add NO exchange on the target side (pinned by
    tests/test_streaming_cdc.py::test_bucketed_merge_skips_target_exchange)
    — and the next version is written bucketed the same way."""
    from nci_seronet_proc_data_validator_spark.operators.mergeop import (
        merge_upsert)
    if batch.isEmpty():
        return current_version(base)
    spark = batch.sparkSession
    v = current_version(base)
    target = read_snapshot(spark, base, v, buckets=buckets)
    ups = batch.filter(F.col(op_col) != delete_op).drop(op_col)
    dels = batch.filter(F.col(op_col) == delete_op).select(key)
    nxt = merge_upsert(target, ups, key, deletes=dels)
    _write_snapshot(nxt, base, v + 1, buckets, key)
    # write-then-pointer-swap: the version file is the commit point
    with open(_version_file(base), "w") as f:
        f.write(str(v + 1))
    return v + 1


def apply_cdc_stream(changes: DataFrame, base: str, key: str,
                     checkpoint: str, op_col: str = "op",
                     delete_op: str = "delete",
                     buckets: int | None = None):
    """Attach the CDC merge to a streaming change feed. Each micro-batch
    commits one snapshot version. Returns the started StreamingQuery
    (caller picks the trigger semantics by how it built ``changes`` —
    pair with ``maxFilesPerTrigger=1`` on a file source to force
    batch-per-file replay in tests)."""
    def _apply(df: DataFrame, _batch_id: int) -> None:
        apply_cdc_batch(df, base, key, op_col=op_col, delete_op=delete_op,
                        buckets=buckets)

    return (changes.writeStream
            .foreachBatch(_apply)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start())
