"""Custom stateful streaming operator via applyInPandasWithState:
running per-key cursor tracking (the reference's per-stream state
document, generalized to per-key state at executor scale).

``running_max_cursor`` maintains, per key, the maximum cursor value
and total record count seen across micro-batches — the building
block for per-entity incremental sync (e.g. per-tenant high-water
marks), which the reference can only do with one global cursor per
stream (protocol.go:15).

State is partitioned by key across executors; each group's state is
a single small tuple — O(distinct keys) total, watermark-free
because the state never grows per row.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_total", LongType()),
        StructField("max_ts", TimestampType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_total", LongType()),
        StructField("max_ts_us", LongType()),
        StructField("total_value", DoubleType()),
    ]
)


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, max_us, total = state.get if state.exists else (0, 0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        if len(pdf):
            batch_max = pdf["ts"].max()
            max_us = max(max_us, int(batch_max.value // 1000))
            total += float(pdf["value"].sum())
    state.update((n, max_us, total))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_total": [n],
            "max_ts": [pd.Timestamp(max_us * 1000)],
            "total_value": [total],
        }
    )


def running_max_cursor(events: DataFrame) -> DataFrame:
    """events(user_id, ts, value, ...) -> running per-user totals +
    cursor high-water mark, updated each micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
