"""Custom stateful streaming operator via applyInPandasWithState.

sessionize_stream: per-user session tracking with arbitrary state —
the streaming form of the batch `sessionize` query (olap.py). Each user
keeps (session_id, last_ts, n_events) across micro-batches; a gap over
`gap_s` seconds starts a new session, and an idle user's state is
dropped by the processing-time timeout (bounded state — the 100 TB
requirement: state size tracks ACTIVE users, not all users ever seen).

Spark's built-in session_window covers windowed aggregation; this
operator exists for the semantics session_window can't express —
monotone per-user session COUNTERS carried across sessions (the output
labels each event with its user-local session ordinal, exactly like the
batch query, so stream and batch results are comparable row-for-row).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "event_id long, user_id long, session_id long"
STATE_SCHEMA = "session_id long, last_us long"


def _sessionize_fn(gap_s: int, idle_timeout_ms: int | None):
    gap_us = gap_s * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState):
        import numpy as np

        if state.hasTimedOut:
            state.remove()
            return
        (user_id,) = key
        sess, last = state.get if state.exists else (0, None)
        pdf = pd.concat(list(pdfs), ignore_index=True).sort_values(["ts", "event_id"])
        if len(pdf):
            us = pdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64)
            prev = np.empty_like(us)
            prev[0] = last if last is not None else np.iinfo(np.int64).min
            prev[1:] = us[:-1]
            # numpy whole-batch pass, no per-event Python (UDF hot path)
            sess_ids = sess + np.cumsum((us - prev > gap_us) | (prev == np.iinfo(np.int64).min))
            sess, last = int(sess_ids[-1]), int(us[-1])
            yield pd.DataFrame(
                {
                    "event_id": pdf["event_id"].to_numpy(),
                    "user_id": np.full(len(us), int(user_id), dtype=np.int64),
                    "session_id": sess_ids,
                }
            )
        state.update((sess, last))
        if idle_timeout_ms:
            state.setTimeoutDuration(idle_timeout_ms)

    return fn


def sessionize_stream(events, gap_s: int = 1800, idle_timeout_min: int | None = None):
    """events: streaming DataFrame with (event_id, user_id, ts).
    Returns the per-event session ordinals as an update stream.

    idle_timeout_min bounds state on a production stream (idle users are
    evicted). Leave None for finite replays/tests: a processing-time
    timeout makes the engine schedule timer-check micro-batches forever,
    so `processAllAvailable()` would never return."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if idle_timeout_min
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy("user_id").applyInPandasWithState(
        _sessionize_fn(gap_s, idle_timeout_min * 60_000 if idle_timeout_min else None),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=timeout,
    )
