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


DEBOUNCE_OUTPUT_SCHEMA = (
    "event_id bigint, user_id bigint, event_type string, ts timestamp"
)
DEBOUNCE_STATE_SCHEMA = "last_us bigint"


def _debounce_fn_factory(gap_us: int):
    def fn(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id, event_type) = key
        (last_us,) = state.get if state.exists else (None,)
        for pdf in batches:
            pdf = pdf.sort_values(["ts", "event_id"])
            ts = pdf["ts"]
            if str(ts.dtype) != "datetime64[us]":
                ts = ts.astype("datetime64[us]")
            ts_us = ts.astype("int64").to_numpy()
            keep = []
            for t_us in ts_us:
                keep.append(last_us is None or t_us - last_us >= gap_us)
                last_us = int(t_us)  # lag semantics: predecessor is the
                # previous event, kept or not
            out = pdf[pd.Series(keep, index=pdf.index)]
            if len(out):
                yield pd.DataFrame(
                    {
                        "event_id": out["event_id"].astype("int64"),
                        "user_id": out["user_id"].astype("int64"),
                        "event_type": out["event_type"],
                        "ts": out["ts"],
                    }
                )
        if last_us is not None:
            state.update((last_us,))

    return fn


def debounce_stream(events: DataFrame, gap_seconds: int = 600) -> DataFrame:
    """Streaming event debounce — the stateful dual of the batch
    lag-based debounce (plans/events_queries.qe20): suppress an event
    when the same (user, type) fired less than ``gap_seconds``
    earlier, comparing each event to its immediate PREDECESSOR (kept
    or not).

    Unlike windowed aggregations or outer joins, every row's verdict
    depends only on its predecessor, so rows emit in the SAME
    micro-batch they arrive in — no end-of-stream state flush is
    needed, which is what makes this exactly equal to the batch dual
    on a bounded source. State per (user, type) is ONE bigint (the
    last-seen event time): constant-size state per key, the smallest
    possible stateful-operator footprint at 100 TB/day.

    Exactness caveat (documented, inherent to streaming): batches must
    arrive in event-time order per key for lag semantics to hold
    across batch boundaries (true for the bounded single-file source
    the gate runs; a production deployment adds a watermark-delayed
    reorder buffer upstream).
    """
    return events.groupBy("user_id", "event_type").applyInPandasWithState(
        _debounce_fn_factory(gap_seconds * 1_000_000),
        outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
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
