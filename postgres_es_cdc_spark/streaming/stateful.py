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
