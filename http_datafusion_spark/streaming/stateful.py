"""Custom stateful streaming operator — ``applyInPandasWithState``.

A per-user running profile that survives across micro-batches: event
count, cumulative value, and max inter-event gap, with state stored in
the streaming state store (per-key, partitioned by user_id — state
scales with key cardinality, not event volume).

This is the (b)-tier extension point from the build brief: semantics
Spark's built-in operators can't express (arbitrary per-key mutable
state across batches) implemented with the documented stateful-UDF
API rather than a low-level custom operator.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_gap_sec bigint, last_ts_sec bigint"
)
STATE_SCHEMA = "n bigint, total double, max_gap bigint, last_ts bigint"


def _update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, total, max_gap, last_ts = state.get
    else:
        n, total, max_gap, last_ts = 0, 0.0, 0, None
    for pdf in pdfs:
        pdf = pdf.sort_values("ts")
        secs = (pdf["ts"].astype("int64") // 1_000_000_000).tolist()
        for s in secs:
            if last_ts is not None:
                max_gap = max(max_gap, s - last_ts)
            last_ts = s
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total, max_gap, int(last_ts)))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "max_gap_sec": [max_gap],
            "last_ts_sec": [int(last_ts)],
        }
    )


def user_profile_stream(events_stream: DataFrame) -> DataFrame:
    """Attach the stateful per-user profile operator to an events stream."""
    return (
        events_stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
