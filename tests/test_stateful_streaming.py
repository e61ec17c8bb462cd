"""applyInPandasWithState session tracking across micro-batches.

Harness note: the tracker registers processing-time timeouts, and a
stateful query with pending timeouts keeps scheduling micro-batches
forever — even under trigger(availableNow). So these tests never wait for
self-termination: they poll the memory sink for the expected rows, then
``stop()`` the query (leaving it running would also burn CPU for the rest
of the suite).
"""

import os
import time

import pandas as pd


def _wait_rows(spark, table: str, n: int, timeout: float = 60.0):
    deadline = time.time() + timeout
    while time.time() < deadline:
        rows = spark.sql(f"SELECT * FROM {table}").collect()
        if len(rows) >= n:
            return rows
        time.sleep(0.3)
    raise AssertionError(f"{table}: wanted {n} rows, got {len(rows)}")


def test_stateful_session_tracking(spark, tmp_path):
    from nci_seronet_proc_data_validator_spark.streaming.stateful import (
        track_sessions)

    src = str(tmp_path / "src")
    os.makedirs(src)

    def land(rows):
        (spark.createDataFrame(rows, "user_id long, epoch long")
         .coalesce(1).write.mode("append").parquet(src))

    # batch 1: user 1 two close events; user 2 one event
    land([(1, 1000), (1, 1100), (2, 5000)])

    stream = spark.readStream.schema("user_id long, epoch long").parquet(src)
    out = track_sessions(stream, gap_seconds=600)
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("sessions_out").trigger(availableNow=True).start())
    try:
        got = {r["user_id"]: r for r in
               _wait_rows(spark, "sessions_out", 2)}
    finally:
        q.stop()
    assert got[1]["n_events"] == 2 and got[1]["session_count"] == 0
    assert got[1]["last_seen"] == 1100 and got[1]["closed"] is False
    assert got[2]["n_events"] == 1

    # second run over the same source after another file lands: the fresh
    # query replays everything in one batch — the far-away event rolls
    # user 1 into a new session (state carries within the run)
    land([(1, 9000)])
    q2 = (track_sessions(
            spark.readStream.schema("user_id long, epoch long").parquet(src),
            gap_seconds=600)
          .writeStream.outputMode("append").format("memory")
          .queryName("sessions_out2").trigger(availableNow=True).start())
    try:
        got2 = {r["user_id"]: r for r in
                _wait_rows(spark, "sessions_out2", 2)}
    finally:
        q2.stop()
    assert got2[1]["session_count"] == 1
    assert got2[1]["n_events"] == 1


class _FakeState:
    """Minimal GroupState stand-in for driving the tracker directly."""

    def __init__(self, value=None, timed_out=False):
        self._value = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_ms = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v

    def remove(self):
        self.removed = True
        self._value = None

    def setTimeoutDuration(self, ms):
        self.timeout_ms = ms


def test_session_tracker_timeout_closure():
    """The hasTimedOut branch (idle-key flush) — driven directly because a
    real processing-time timeout would need wall-clock minutes."""
    from nci_seronet_proc_data_validator_spark.streaming.stateful import (
        session_tracker)

    fn = session_tracker(gap_seconds=600)
    state = _FakeState(value=(2, 7, 12345), timed_out=True)
    [out] = list(fn((42,), iter([]), state))
    assert state.removed
    row = out.iloc[0]
    assert (row["user_id"], row["session_count"], row["n_events"],
            row["last_seen"], row["closed"]) == (42, 2, 7, 12345, True)


def test_session_tracker_rollover_math():
    """Gap rollover across batch boundaries, state carried in."""
    from nci_seronet_proc_data_validator_spark.streaming.stateful import (
        session_tracker)

    fn = session_tracker(gap_seconds=600)
    state = _FakeState(value=(0, 2, 1100))
    batches = iter([pd.DataFrame({"epoch": [9000, 9100]})])
    [out] = list(fn((1,), batches, state))
    row = out.iloc[0]
    assert (row["session_count"], row["n_events"], row["last_seen"],
            row["closed"]) == (1, 2, 9100, False)
    assert state.get == (1, 2, 9100)
    assert state.timeout_ms == 600 * 1000


def test_stateful_session_state_recovers_from_checkpoint(spark, tmp_path):
    """Checkpointed state-store recovery for the custom stateful operator:
    run 1 processes batch 1 under a checkpoint; the RESTARTED query (same
    checkpoint) sees ONLY the new file, so its output proves whether the
    state store came back — with user 1's (count=0, n=2, last_seen=1100)
    recovered, the far-away event rolls session_count to 1 with n_events
    1; a fresh/lost state would report session_count 0."""
    from nci_seronet_proc_data_validator_spark.streaming.stateful import (
        track_sessions)

    src, cp, out = (str(tmp_path / d) for d in ("src", "cp", "out"))
    os.makedirs(src)

    def land(rows):
        (spark.createDataFrame(rows, "user_id long, epoch long")
         .coalesce(1).write.mode("append").parquet(src))

    def run(want_rows):
        # parquet sink: the memory sink is not fault-tolerant and refuses
        # checkpoint recovery — a file sink is the recoverable form
        q = (track_sessions(
                spark.readStream.schema("user_id long, epoch long")
                .parquet(src), gap_seconds=600)
             .writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", cp)
             .trigger(availableNow=True).start())
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                try:
                    rows = spark.read.parquet(out).collect()
                except Exception:
                    rows = []
                if len(rows) >= want_rows:
                    return rows
                time.sleep(0.3)
            raise AssertionError(f"wanted {want_rows}, got {len(rows)}")
        finally:
            q.stop()

    land([(1, 1000), (1, 1100), (2, 5000)])
    got1 = {r["user_id"]: r for r in run(2)}
    assert got1[1]["session_count"] == 0 and got1[1]["n_events"] == 2

    # restart from the SAME checkpoint: only the new file is processed
    land([(1, 9000)])
    rows2 = [r for r in run(3) if r["last_seen"] == 9000]
    assert len(rows2) == 1           # user 2 untouched in this batch
    got2 = rows2[0]
    assert got2["session_count"] == 1        # recovered state rolled over
    assert got2["n_events"] == 1


def test_funnel_state_recovers_from_checkpoint(spark, tmp_path):
    """Funnel-frontier state recovery: run 1 advances user 1 to step 1
    (view); the restarted query (same checkpoint, only the new file)
    advances to step 2 ONLY if the recovered frontier is honored — a
    replayed 'view' at an older timestamp must not advance, and a 'buy'
    later than the recovered frontier must. Lost state would re-report
    reached_step 1 (or advance on the stale event)."""
    from nci_seronet_proc_data_validator_spark.streaming.stateful import (
        track_funnel)

    src, cp, out = (str(tmp_path / d) for d in ("src", "cp", "out"))
    os.makedirs(src)

    def land(rows):
        (spark.createDataFrame(rows,
                               "user_id long, ts_us long, event_type string")
         .coalesce(1).write.mode("append").parquet(src))

    def run(want_rows):
        q = (track_funnel(
                spark.readStream
                .schema("user_id long, ts_us long, event_type string")
                .parquet(src), steps=["view", "buy"])
             .writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", cp)
             .trigger(availableNow=True).start())
        try:
            deadline = time.time() + 60
            while time.time() < deadline:
                try:
                    rows = spark.read.parquet(out).collect()
                except Exception:
                    rows = []
                if len(rows) >= want_rows:
                    return rows
                time.sleep(0.3)
            raise AssertionError(f"wanted {want_rows}, got {len(rows)}")
        finally:
            q.stop()

    land([(1, 1000, "view")])
    r1 = run(1)
    assert (r1[0]["reached_step"], r1[0]["frontier_us"]) == (1, 1000)

    # stale 'view' (ts 500 < frontier) must NOT reset/advance;
    # 'buy' at 2000 > frontier advances to step 2
    land([(1, 500, "view"), (1, 2000, "buy")])
    r2 = sorted(run(2), key=lambda r: r["frontier_us"])
    final = r2[-1]
    assert (final["reached_step"], final["frontier_us"]) == (2, 2000)
    assert len(r2) == 2              # exactly one new row this run
