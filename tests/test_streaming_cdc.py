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
