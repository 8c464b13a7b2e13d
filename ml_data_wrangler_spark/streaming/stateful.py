"""Custom stateful streaming operator via ``applyInPandasWithState``
(north-star extension — the escape hatch for semantics the built-in
windowed aggregations can't express).

Implemented operator: per-user running activity profile — event count,
value sum, distinct event-type count, and first/last event time —
maintained incrementally across micro-batches with explicit state and
an event-time timeout that finalizes idle users.

Scale design: state is keyed by user_id and lives in the state store
(RocksDB in production); each micro-batch touches only keys present in
the batch; the timeout bounds state growth the way a watermark bounds
window state.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, "
    "n_types int, first_ts timestamp, last_ts timestamp, final boolean"
)
STATE_SCHEMA = (
    "n_events bigint, total_value double, types array<string>, "
    "first_us bigint, last_us bigint"
)


def _profile_fn(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        n, total, types, first_us, last_us = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "total_value": [total],
                "n_types": [len(types)],
                "first_ts": [pd.Timestamp(first_us, unit="us")],
                "last_ts": [pd.Timestamp(last_us, unit="us")],
                "final": [True],
            }
        )
        return

    n, total, types, first_us, last_us = (
        state.get if state.exists else (0, 0.0, [], None, None)
    )
    types = set(types)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
        types |= set(pdf["event_type"])
        # normalize to microseconds explicitly: under pandas 2.x Arrow
        # may deliver datetime64[us] (not [ns]), where a blind
        # `astype(int64) // 1000` would silently yield milliseconds
        ts = pdf["ts"]
        if str(ts.dtype) != "datetime64[us]":
            ts = ts.astype("datetime64[us]")
        ts_us = ts.astype("int64")
        lo, hi = int(ts_us.min()), int(ts_us.max())
        first_us = lo if first_us is None else min(first_us, lo)
        last_us = hi if last_us is None else max(last_us, hi)
    state.update((n, total, sorted(types), first_us, last_us))
    # finalize a user after 1h (event-time) of inactivity
    state.setTimeoutTimestamp(last_us // 1000 + 3600 * 1000)
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "n_types": [len(types)],
            "first_ts": [pd.Timestamp(first_us, unit="us")],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
            "final": [False],
        }
    )


def user_activity_profile(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful per-user profile over a stream with event-time timeout.

    ``events`` must be a streaming DataFrame with (user_id, ts,
    event_type, value). Emits one row per touched user per micro-batch
    (final=false) and one closing row when the user times out
    (final=true).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _profile_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
