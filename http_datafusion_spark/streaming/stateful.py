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


SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start_sec bigint, session_end_sec bigint, "
    "n_events bigint, closed boolean"
)
SESSION_STATE_SCHEMA = "start_sec bigint, end_sec bigint, n bigint"
SESSION_GAP_SEC = 1800


def _session_update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    """Timeout-driven sessionization: state holds the OPEN session per
    user; an event-time timeout (watermark passing last_event + gap)
    CLOSES it and emits the final row — the pattern built-in
    session_window can't customize (e.g. per-row side effects, custom
    merge rules). State is one row per key: O(active users)."""
    (user_id,) = key
    if state.hasTimedOut:
        start, end, n = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start_sec": [start],
                "session_end_sec": [end],
                "n_events": [n],
                "closed": [True],
            }
        )
        return
    start, end, n = state.get if state.exists else (None, None, 0)
    for pdf in pdfs:
        secs = sorted(pdf["ts"].astype("int64") // 1_000_000_000)
        for s in secs:
            s = int(s)
            if start is None:
                start, end, n = s, s, 1
            elif s - end >= SESSION_GAP_SEC:
                # gap within a batch: emit the closed session inline
                yield pd.DataFrame(
                    {
                        "user_id": [user_id],
                        "session_start_sec": [start],
                        "session_end_sec": [end],
                        "n_events": [n],
                        "closed": [True],
                    }
                )
                start, end, n = s, s, 1
            else:
                end, n = s, n + 1
    state.update((int(start), int(end), int(n)))
    # Close via event-time timeout once the watermark passes end + gap.
    state.setTimeoutTimestamp((int(end) + SESSION_GAP_SEC) * 1000)


def session_close_stream(events_stream: DataFrame) -> DataFrame:
    """Sessionize with explicit state timeouts (EventTimeTimeout)."""
    return (
        events_stream.select("user_id", "ts")
        .withWatermark("ts", "10 minutes")
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_update,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# Streaming CDC upsert: latest-wins state per key across micro-batches —
# the streaming twin of plans/events.py::cdc_upsert_compaction. State is
# one (ts, event_id, type, value) tuple per user: bounded by key
# cardinality, never stream length.
CDC_OUTPUT_SCHEMA = (
    "user_id bigint, last_event_id bigint, ts_usec bigint, last_type string, last_value double"
)
CDC_STATE_SCHEMA = "event_id bigint, ts_usec bigint, etype string, value double"


def _cdc_update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        best_id, best_ts, best_type, best_val = state.get
    else:
        best_id, best_ts, best_type, best_val = None, None, None, None
    for pdf in pdfs:
        ts_us = (pdf["ts"].astype("int64") // 1_000).tolist()  # ns -> µs, exact
        for eid, t, et, v in zip(pdf["event_id"].tolist(), ts_us, pdf["event_type"], pdf["value"]):
            if best_ts is None or (t, eid) > (best_ts, best_id):
                best_id, best_ts, best_type, best_val = int(eid), int(t), str(et), float(v)
    state.update((best_id, best_ts, best_type, best_val))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "last_event_id": [best_id],
            "ts_usec": [best_ts],
            "last_type": [best_type],
            "last_value": [best_val],
        }
    )


def cdc_upsert_stream(events_stream: DataFrame) -> DataFrame:
    """Latest-wins upsert state machine over a change stream."""
    return (
        events_stream.select("user_id", "event_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _cdc_update,
            outputStructType=CDC_OUTPUT_SCHEMA,
            stateStructType=CDC_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# Streaming debounce: the stateful twin of operators/timeseries.py::
# events_debounce. State per (user, event_type) is (last_event_sec,
# n_events, n_kept) — one tuple per key, bounded by key cardinality.
# Requires an event-time-ordered replay (streaming/queries.py::
# staged_timeordered_dir): the keep decision depends on the previous
# event in TIME, so an out-of-order replay would change it (the batch
# twin's lag() has the same dependence — the property is inherent to
# debouncing, not an artifact).
DEBOUNCE_OUTPUT_SCHEMA = "user_id bigint, event_type string, n_events bigint, n_kept bigint"
DEBOUNCE_STATE_SCHEMA = "last_sec bigint, n bigint, kept bigint"
DEBOUNCE_GAP_SEC = 300  # same constant as the batch twin


def _debounce_update(key, pdfs, state: GroupState):
    user_id, etype = key
    last, n, kept = state.get if state.exists else (None, 0, 0)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        secs = (pdf["ts"].astype("int64") // 1_000_000_000).tolist()  # floor == unix_timestamp
        for s in secs:
            s = int(s)
            n += 1
            if last is None or s - last >= DEBOUNCE_GAP_SEC:
                kept += 1
            last = s  # gap measures from the previous EVENT, kept or not
    state.update((int(last), int(n), int(kept)))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "event_type": [etype],
            "n_events": [n],
            "n_kept": [kept],
        }
    )


def debounce_stream(events_stream: DataFrame) -> DataFrame:
    """Attach the stateful debounce operator to an events stream."""
    return (
        events_stream.select("user_id", "event_type", "event_id", "ts")
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _debounce_update,
            outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
            stateStructType=DEBOUNCE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# Streaming temporal (as-of) join: the Flink "temporal table join" shape.
# Orders and events ride ONE time-ordered stream with a side marker;
# state per customer key is the latest order seen (by (t, orderkey) —
# deterministic under any within-batch arrival order); each event row
# emits enriched with that state. == the batch asof_join_latest_order.
ASOF_OUTPUT_SCHEMA = (
    "event_id bigint, custkey bigint, asof_orderkey bigint, asof_price double"
)
ASOF_STATE_SCHEMA = "t bigint, okey bigint, price double"


def _asof_update(key, pdfs, state: GroupState):
    (custkey,) = key
    t, okey, price = state.get if state.exists else (None, None, None)
    out_ids, out_keys, out_prices = [], [], []
    for pdf in pdfs:
        # orders (side 0) before events (side 1) at the same timestamp —
        # the <= semantics of the backward as-of; orderkey ascending so
        # the max orderkey wins ties on t (the batch twin's tiebreak)
        pdf = pdf.sort_values(["t_sec", "side", "id"])
        for ts, side, rid, val in zip(
            pdf["t_sec"].tolist(), pdf["side"].tolist(), pdf["id"].tolist(), pdf["val"].tolist()
        ):
            if side == 0:  # order: fold into latest-order state
                if t is None or (int(ts), int(rid)) > (t, okey):
                    t, okey, price = int(ts), int(rid), float(val)
            else:  # event: emit enriched with current state
                out_ids.append(int(rid))
                out_keys.append(okey)
                out_prices.append(price)
    if t is not None:
        state.update((t, okey, price))
    yield pd.DataFrame(
        {
            "event_id": out_ids,
            "custkey": [int(custkey)] * len(out_ids),
            "asof_orderkey": out_keys,
            "asof_price": out_prices,
        }
    )


def temporal_join_stream(union_stream: DataFrame) -> DataFrame:
    """Attach the temporal-join state machine to a (custkey, t_sec,
    side, id, val) union stream. Requires event-time-ordered replay
    across batches (staged_union_timeordered_dir); within a batch the
    UDF sorts, across batches the staging guarantees order."""
    return union_stream.groupBy("custkey").applyInPandasWithState(
        _asof_update,
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
