"""Custom stateful streaming operator: per-user session aggregation.

``applyInPandasWithState`` keeps (last_ts, session_count) per user across
micro-batches and emits finalized session counts — the streaming twin of
``functions.events.sessionize`` and the engine's demonstration of
arbitrary stateful processing (the reference has no streaming at all;
SURVEY.md §2F).

State semantics: a new session starts when an event arrives more than
``gap_s`` after the user's previous event (within or across batches).
Events inside one micro-batch are sorted by (ts, event_id) before folding,
so results are deterministic for a given file/batch split.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_S = 1800

STATE_SCHEMA = "last_ts double, sessions long"
OUTPUT_SCHEMA = "user_id long, sessions long, events long"


def _update(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last_ts, sessions = state.get
    else:
        last_ts, sessions = None, 0
    n_events = 0
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        for t in pdf["ts"]:
            ts = t.timestamp()
            if last_ts is None or ts - last_ts > SESSION_GAP_S:
                sessions += 1
            last_ts = ts
        n_events += len(pdf)
    state.update((last_ts, sessions))
    yield pd.DataFrame(
        {"user_id": [user_id], "sessions": [sessions], "events": [n_events]}
    )


def stateful_sessionize(stream: DataFrame) -> DataFrame:
    """events stream → running (user_id, sessions, events) via group state."""
    return (
        stream.select("user_id", "ts", "event_id")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
