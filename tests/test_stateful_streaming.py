"""applyInPandasWithState session tracking across micro-batches."""

import os

from pyspark.sql import functions as F


def test_stateful_session_tracking(spark, tmp_path):
    from nci_seronet_proc_data_validator_spark.streaming.stateful import (
        track_sessions)

    src = str(tmp_path / "src")
    os.makedirs(src)

    def land(name, rows):
        (spark.createDataFrame(rows, "user_id long, epoch long")
         .coalesce(1).write.mode("append").parquet(src))

    # batch 1: user 1 two close events; user 2 one event
    land("b1", [(1, 1000), (1, 1100), (2, 5000)])

    stream = spark.readStream.schema("user_id long, epoch long").parquet(src)
    out = track_sessions(stream, gap_seconds=600)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("sessions_out").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {r["user_id"]: r for r in
           spark.sql("SELECT * FROM sessions_out").collect()}
    assert got[1]["n_events"] == 2 and got[1]["session_count"] == 0
    assert got[1]["last_seen"] == 1100 and got[1]["closed"] is False
    assert got[2]["n_events"] == 1

    # batch 2 (new query over same checkpoint-less memory sink): a far-away
    # event rolls user 1 into a new session — state carries within the run
    land("b2", [(1, 9000)])
    q2 = (track_sessions(
            spark.readStream.schema("user_id long, epoch long").parquet(src),
            gap_seconds=600)
          .writeStream.outputMode("append").format("memory")
          .queryName("sessions_out2").trigger(availableNow=True).start())
    q2.awaitTermination(120)
    got2 = {r["user_id"]: r for r in
            spark.sql("SELECT * FROM sessions_out2").collect()}
    # both batches replayed in one run: 1000/1100 then 9000 → rolled over
    assert got2[1]["session_count"] == 1
    assert got2[1]["n_events"] == 1
