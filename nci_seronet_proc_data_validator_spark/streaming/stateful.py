"""Custom stateful streaming operator: per-user running session tracking
via ``applyInPandasWithState``.

The reference has no stateful streaming at all (§2.8); this is the
engine-native extension point for operators Spark's built-ins can't
express — here, a per-key running aggregate that survives across
micro-batches with timeout-based session closure.

State model per user_id: (session_count, current_session_events,
last_event_epoch). An incoming batch extends the current session or rolls
it over when the gap exceeds ``gap_seconds``; a processing-time timeout
flushes idle users. Emits one row per (user, closed-or-updated session).

Scale: state lives in the state store partitioned by key — memory is
bounded by active keys, not event volume; timeouts garbage-collect idle
keys.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

OUTPUT_SCHEMA = ("user_id long, session_count long, n_events long, "
                 "last_seen long, closed boolean")
STATE_SCHEMA = "session_count long, n_events long, last_seen long"


def session_tracker(gap_seconds: int = 1800):
    """Returns the (key, batches, state) → rows function for
    ``applyInPandasWithState``."""

    def fn(key: Tuple[Any, ...], batches: Iterator[pd.DataFrame],
           state) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            sc, ne, ls = state.get
            state.remove()
            yield pd.DataFrame([{"user_id": user_id, "session_count": sc,
                                 "n_events": ne, "last_seen": ls,
                                 "closed": True}])
            return

        sc, ne, ls = state.get if state.exists else (0, 0, None)
        # Collect the WHOLE micro-batch before sorting: a group larger
        # than one Arrow chunk arrives as several pdfs in source order,
        # and per-pdf sorting would apply cross-chunk stragglers out of
        # time order (silent session miscounts at scale).
        epochs = [int(t) for pdf in batches for t in pdf["epoch"]]
        for ts in sorted(epochs):
            if ls is not None and ts - ls > gap_seconds:
                sc, ne = sc + 1, 0
            ne += 1
            ls = ts
        if ls is None:
            return
        state.update((sc, ne, ls))
        state.setTimeoutDuration(gap_seconds * 1000)
        yield pd.DataFrame([{"user_id": user_id, "session_count": sc,
                             "n_events": ne, "last_seen": ls,
                             "closed": False}])

    return fn


def track_sessions(events_stream, gap_seconds: int = 1800):
    """Wire the tracker onto a stream with (user_id, epoch long) columns."""
    return (events_stream
            .groupBy("user_id")
            .applyInPandasWithState(
                session_tracker(gap_seconds),
                outputStructType=OUTPUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="append",
                timeoutConf="ProcessingTimeTimeout"))


# ------------------------------------------------------------ funnel
FUNNEL_OUTPUT_SCHEMA = ("user_id long, reached_step long, "
                        "frontier_us long")
FUNNEL_STATE_SCHEMA = "reached_step long, frontier_us long"


def funnel_tracker(steps: list):
    """Streaming twin of ``operators/funnel``: a per-user conversion
    state machine ``(reached_step, frontier_us)``. Events are applied in
    ascending event-time; an event advances the user iff it is the NEXT
    step's type and strictly later than the current frontier — exactly
    the batch operator's min-qualifying-time recursion, provided events
    arrive time-ordered across micro-batches (pair with a watermark +
    in-order source; late stragglers would need retraction, which
    funnels — like all monotone frontiers — cannot express in append
    mode). Emits one row per user per batch in which the user advanced.
    """

    def fn(key, batches, state):
        (user_id,) = key
        if state.hasTimedOut:          # funnels never time out; guard
            return
        reached, frontier = state.get if state.exists else (0, -1)
        before = reached
        evs = []
        for pdf in batches:
            evs.extend(zip((int(t) for t in pdf["ts_us"]),
                           (str(e) for e in pdf["event_type"])))
        for ts, et in sorted(evs):
            if reached < len(steps) and et == steps[reached] \
                    and ts > frontier:
                reached += 1
                frontier = ts
        if reached != before:
            state.update((reached, frontier))
            yield pd.DataFrame([{"user_id": user_id,
                                 "reached_step": reached,
                                 "frontier_us": frontier}])

    return fn


def track_funnel(events_stream, steps: list):
    """Wire the funnel tracker onto a stream with
    (user_id, ts_us long, event_type) columns."""
    return (events_stream
            .groupBy("user_id")
            .applyInPandasWithState(
                funnel_tracker(steps),
                outputStructType=FUNNEL_OUTPUT_SCHEMA,
                stateStructType=FUNNEL_STATE_SCHEMA,
                outputMode="append",
                timeoutConf="NoTimeout"))
