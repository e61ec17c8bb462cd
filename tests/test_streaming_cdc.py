"""Streaming CDC apply: change files merged batch-by-batch into a
versioned parquet snapshot (streaming/cdc.py = foreachBatch +
operators/mergeop.merge_upsert)."""

import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from nci_seronet_proc_data_validator_spark.streaming.cdc import (
    apply_cdc_batch,
    apply_cdc_stream,
    current_version,
    init_snapshot,
    snapshot_path,
)

_SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("s", T.StringType()),
    T.StructField("v", T.LongType()),
    T.StructField("op", T.StringType()),
])


def _snap(spark, base):
    return {(r.k, r.s, r.v)
            for r in spark.read.parquet(snapshot_path(base)).collect()}


def test_apply_cdc_batch_versions_and_merges(spark, tmp_path):
    base = str(tmp_path / "tbl")
    init_snapshot(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, s string, v long"), base)
    assert current_version(base) == 0

    b1 = spark.createDataFrame(
        [(2, "B", 200, "upsert"), (9, "z", 900, "upsert"),
         (3, None, None, "delete")], _SCHEMA)
    assert apply_cdc_batch(b1, base, "k") == 1
    assert _snap(spark, base) == {(1, "a", 10), (2, "B", 200),
                                  (9, "z", 900)}

    # empty batch: no new version committed
    empty = spark.createDataFrame([], _SCHEMA)
    assert apply_cdc_batch(empty, base, "k") == 1
    assert current_version(base) == 1


def test_apply_cdc_stream_replays_file_per_batch(spark, tmp_path):
    base = str(tmp_path / "tbl")
    changes_dir = tmp_path / "changes"
    changes_dir.mkdir()
    init_snapshot(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k long, s string, v long"), base)

    # two change files -> two micro-batches (maxFilesPerTrigger=1);
    # the second updates a key the first inserted, so the final state
    # proves ordered, batch-at-a-time application, not a single union
    rows1 = [{"k": 5, "s": "e", "v": 50, "op": "upsert"},
             {"k": 1, "s": None, "v": None, "op": "delete"}]
    rows2 = [{"k": 5, "s": "E", "v": 55, "op": "upsert"},
             {"k": 2, "s": "B", "v": 22, "op": "upsert"}]
    for i, rows in enumerate([rows1, rows2]):
        with open(changes_dir / f"c{i}.json", "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows))

    changes = (spark.readStream.schema(_SCHEMA)
               .option("maxFilesPerTrigger", "1")
               .json(str(changes_dir)))
    q = apply_cdc_stream(changes, base, "k",
                         checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assert current_version(base) == 2
    assert _snap(spark, base) == {(2, "B", 22), (5, "E", 55)}
    # every intermediate version is still a complete readable snapshot
    assert {(r.k, r.s, r.v) for r in
            spark.read.parquet(snapshot_path(base, 1)).collect()} \
        == {(2, "b", 20), (5, "e", 50)}


def test_bucketed_cdc_round_trip(spark, tmp_path):
    """Bucketed snapshot versions (buckets=N): same merge semantics,
    snapshots live as bucketed catalog tables."""
    from nci_seronet_proc_data_validator_spark.streaming.cdc import (
        read_snapshot, snapshot_table)
    base = str(tmp_path / "btbl")
    init_snapshot(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, s string, v long"), base, key="k", buckets=4)
    b1 = spark.createDataFrame(
        [(2, "B", 200, "upsert"), (9, "z", 900, "upsert"),
         (3, None, None, "delete")], _SCHEMA)
    try:
        assert apply_cdc_batch(b1, base, "k", buckets=4) == 1
        got = {(r.k, r.s, r.v)
               for r in read_snapshot(spark, base, buckets=4).collect()}
        assert got == {(1, "a", 10), (2, "B", 200), (9, "z", 900)}
    finally:
        for v in (0, 1):
            spark.sql(f"DROP TABLE IF EXISTS {snapshot_table(base, v)}")


def test_bucketed_merge_skips_target_exchange(spark, tmp_path):
    """The cdc.py docstring's scale promise, pinned: merging against a
    bucketBy(key) snapshot adds NO exchange on the target side — only
    the change batch shuffles. The unbucketed plan shuffles both sides."""
    from nci_seronet_proc_data_validator_spark.operators.mergeop import (
        merge_upsert)
    from nci_seronet_proc_data_validator_spark.streaming.cdc import (
        read_snapshot, snapshot_table)
    base = str(tmp_path / "ptbl")
    seed = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v"))
    init_snapshot(seed, base, key="k", buckets=8)          # bucketed
    plain_base = str(tmp_path / "utbl")
    init_snapshot(seed, plain_base)                        # plain parquet
    src = spark.range(0, 50).select(
        F.col("id").alias("k"), F.lit(0).alias("v"))
    dels = spark.range(990, 995).select(F.col("id").alias("k"))
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force sort-merge joins so exchange counting is deterministic
        # (a broadcast target would hide the exchange difference)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bucketed = merge_upsert(read_snapshot(spark, base, buckets=8),
                                src, "k", deletes=dels)
        plain = merge_upsert(read_snapshot(spark, plain_base),
                             src, "k", deletes=dels)
        p_b = bucketed._jdf.queryExecution().executedPlan().toString()
        p_u = plain._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in p_b
        # plain: 3 exchanges (target + dels + source); bucketed: the
        # target side reads pre-partitioned, only the change feed moves
        assert p_u.count("Exchange") == 3
        assert p_b.count("Exchange") == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql(f"DROP TABLE IF EXISTS {snapshot_table(base, 0)}")


def test_cdc_replay_is_content_idempotent(spark, tmp_path):
    """At-least-once apply contract (cdc.py module docstring): the two
    crash/replay windows differ in which base version the replayed batch
    re-merges into, and BOTH must converge to the same snapshot content.

    - crash AFTER the snapshot write, BEFORE the pointer swap: the
      pointer still names v, so the replay re-merges into v and
      OVERWRITES the half-committed v+1 — same content, same version.
    - crash AFTER the pointer swap, BEFORE the stream checkpoint commit:
      the replay re-merges the same batch into v+1 — upserts rewrite the
      same values, deletes delete already-absent keys, so v+2's content
      equals v+1's (only the version number advances)."""
    base = str(tmp_path / "tbl")
    init_snapshot(spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)],
        "k long, s string, v long"), base)
    b1 = spark.createDataFrame(
        [(2, "B", 200, "upsert"), (9, "z", 900, "upsert"),
         (3, None, None, "delete")], _SCHEMA)
    want = {(1, "a", 10), (2, "B", 200), (9, "z", 900)}

    assert apply_cdc_batch(b1, base, "k") == 1
    assert _snap(spark, base) == want

    # window 2: pointer already at v+1, batch replays on top of it
    assert apply_cdc_batch(b1, base, "k") == 2
    assert _snap(spark, base) == want

    # window 1: pointer rolled back to v (simulated), half-written v+1
    # on disk; the replay overwrites it and re-commits
    with open(os.path.join(base, "_VERSION"), "w") as f:
        f.write("0")
    assert apply_cdc_batch(b1, base, "k") == 1
    assert _snap(spark, base) == want
