"""Custom per-key streaming state via applyInPandasWithState ([EXT]).

The engine's CDC fold deliberately keeps state in the *sink* (foreachBatch
+ versioned merge — the reference's own design, state-in-ES, es.go:47-144).
This module is the other tool: executor-resident per-key state for
operators that need it *inside* the stream (running counters, per-entity
rate trackers), with Arrow-batched pandas per group.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor, StatefulProcessorHandle)
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType)

RUNNING_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("n_events", LongType(), False),
    StructField("sum_value", DoubleType(), True),
])

_STATE_SCHEMA = StructType([
    StructField("n", LongType(), False),
    StructField("s", DoubleType(), False),
])


def _update(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [s]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained as executor state across
    micro-batches. Emits the updated totals for every user seen in each
    batch (output mode: update)."""
    return (
        events.groupBy("user_id")
              .applyInPandasWithState(
                  _update, RUNNING_SCHEMA, _STATE_SCHEMA,
                  "update", GroupStateTimeout.NoTimeout)
    )


class _RunningTotalsProcessor(StatefulProcessor):
    """transformWithState twin of ``running_user_totals`` — Spark 4's
    successor API: typed state handles (ValueState here; ListState/
    MapState/timers available), RocksDB-backed, no GroupState pickling."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(self, key, rows, timer_values) -> Iterator[pd.DataFrame]:
        n, s = self._totals.get() if self._totals.exists() else (0, 0.0)
        for pdf in rows:
            n += len(pdf)
            s += float(pdf["value"].sum())
        self._totals.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]})

    def close(self) -> None:
        pass


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """``running_user_totals`` on the transformWithState API. Requires
    the RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass) — the caller's
    session config, not ours, since state-store choice is deployment
    policy — and the ``protobuf`` package (the API's state-server
    protocol), a standard Spark-cluster dependency."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_RunningTotalsProcessor(),
        outputStructType=RUNNING_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


SESSION_SCHEMA = StructType([
    StructField("user_id", LongType(), False),
    StructField("session_start_us", LongType(), False),
    StructField("session_end_us", LongType(), False),
    StructField("n_events", LongType(), False),
])

_SESSION_STATE_SCHEMA = StructType([
    StructField("start_us", LongType(), False),
    StructField("end_us", LongType(), False),
    StructField("n", LongType(), False),
])

_GAP_US_DEFAULT = 30 * 60 * 1_000_000


def _session_update_factory(gap_us: int):
    def _update(key, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        closed: list[tuple[int, int, int]] = []

        if state.hasTimedOut:
            # Watermark passed the idle deadline: close the open session.
            if state.exists:
                closed.append(tuple(state.get))
                state.remove()
            # A timed-out invocation receives no rows.
            for s, e, n in closed:
                yield pd.DataFrame({"user_id": [key[0]],
                                    "session_start_us": [s],
                                    "session_end_us": [e],
                                    "n_events": [n]})
            return

        cur = tuple(state.get) if state.exists else None
        ts_all = sorted(int(t) for pdf in pdfs for t in pdf["ts_us"])
        for t in ts_all:
            if cur is None:
                cur = (t, t, 1)
            elif t - cur[1] <= gap_us:
                cur = (cur[0], max(cur[1], t), cur[2] + 1)
            else:
                closed.append(cur)
                cur = (t, t, 1)
        if cur is not None:
            state.update(cur)
            # Close the session once the event-time watermark passes
            # last-event + gap.
            state.setTimeoutTimestamp((cur[1] + gap_us) // 1000)
        for s, e, n in closed:
            yield pd.DataFrame({"user_id": [key[0]],
                                "session_start_us": [s],
                                "session_end_us": [e],
                                "n_events": [n]})

    return _update


def user_sessions_with_timeout(events: DataFrame, ts_col: str = "ts",
                               watermark: str = "10 minutes",
                               gap_us: int = _GAP_US_DEFAULT) -> DataFrame:
    """Custom stateful sessionizer with event-time timers ([EXT]):
    per-user sessions close either when a later event arrives past the
    gap, or — the part ``session_window`` can't express per key — when
    the WATERMARK passes last-event + gap with no further events, via
    GroupStateTimeout.EventTimeTimeout. State per key is one (start,
    end, count) triple, so executor memory is O(active users), the
    bound that matters on an unbounded stream.

    Input needs ``ts_col`` (timestamp) and ``user_id``; emits closed
    sessions only (append semantics), timestamps as epoch micros.
    """
    from pyspark.sql import functions as F

    with_wm = (events.withWatermark(ts_col, watermark)
               .select("user_id",
                       (F.col(ts_col).cast("double") * 1_000_000)
                       .cast("long").alias("ts_us"), F.col(ts_col)))
    return (with_wm.groupBy("user_id")
            .applyInPandasWithState(
                _session_update_factory(gap_us),
                SESSION_SCHEMA, _SESSION_STATE_SCHEMA,
                "append", GroupStateTimeout.EventTimeTimeout))
