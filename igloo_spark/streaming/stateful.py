"""Custom stateful streaming operator: event-time sessionization with
``applyInPandasWithState``.

The reference has no streaming at all (igloo-io/igloo
``crates/cdc/src/lib.rs:9`` is an empty TODO); this is the Spark-native
custom-stateful-operator pattern the engine exposes for pipelines the
built-in windowed aggregations can't express: per-key sessions whose
boundaries depend on the *data* (inactivity gap), not the clock.

Semantics: events for a key belong to one session while consecutive
event-time gaps stay ≤ ``gap_seconds``. A session is emitted when a
later event closes it (gap exceeded). The open session per key lives in
the state store and survives micro-batch boundaries — a session
spanning many batches is emitted once, complete.

Scale posture: state is hash-partitioned by key across executors;
per-key state is O(1) (three scalars), so the state store stays tiny
even at billions of keys. Batch-side cost is one Arrow transfer per
key-group per micro-batch. For production late-data tolerance, feed
this from a watermarked source and raise ``gap_seconds`` above the
watermark delay.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def sessionize_stream(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
) -> DataFrame:
    """Streaming sessionization: emits CLOSED sessions
    ``(key, session_start, session_end, n_events)``.

    The per-key open session is kept in the Spark state store
    (``applyInPandasWithState``), so sessions that span micro-batches
    are stitched together exactly once.
    """
    out_schema = StructType(
        [
            StructField(key_col, LongType()),
            StructField("session_start", TimestampType()),
            StructField("session_end", TimestampType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_us", LongType()),
            StructField("end_us", LongType()),
            StructField("n", LongType()),
        ]
    )
    gap_us = gap_seconds * 1_000_000

    def fn(key: tuple, pdfs, state: GroupState):
        (k,) = key
        ts_us = []
        for pdf in pdfs:
            col = pd.to_datetime(pdf[ts_col])
            ts_us.extend(int(v.value // 1_000) for v in col)  # ns → µs
        ts_us.sort()
        if state.exists:
            start, end, n = state.get
        else:
            start = end = None
            n = 0
        closed: list[tuple] = []
        for t in ts_us:
            if start is None:
                start, end, n = t, t, 1
            elif t - end > gap_us:
                closed.append((k, start, end, n))
                start, end, n = t, t, 1
            else:
                end, n = t, n + 1
        if start is not None:
            state.update((start, end, n))
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                    "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
        )
    )
