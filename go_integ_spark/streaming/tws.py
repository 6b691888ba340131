"""transformWithState operator (Spark 4 stateful processing API).

The modern replacement for applyInPandasWithState: typed state
variables (ValueState/ListState/MapState), timers, and TTL live on a
StatefulProcessor object. Here: a per-user running profile (event
count, purchase count, cursor high-water mark) — the same per-key
cursor generalization as streaming/stateful.py, expressed with the
new API so both stateful surfaces are covered.

State is one small tuple per user, hash-partitioned across executors;
no watermark needed because state never grows per row.

Runtime requirements (import-gated in streaming/queries.py):
- RocksDB state store provider
  (``spark.sql.streaming.stateStore.providerClass``);
- the ``protobuf`` package — the TWS state server speaks protobuf to
  the Python worker; absent in this container, so the gate query
  registers only where it is installed (tests skip accordingly).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

TWS_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_purchases", LongType()),
        StructField("max_ts_us", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("n_purchases", LongType()),
        StructField("max_ts_us", LongType()),
    ]
)


class UserProfileProcessor(StatefulProcessor):
    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("profile", _STATE_SCHEMA)

    def handleInputRows(
        self, key, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        n, p, hi = self._state.get() if self._state.exists() else (0, 0, 0)
        for pdf in rows:
            n += len(pdf)
            p += int((pdf["event_type"] == "purchase").sum())
            if len(pdf):
                hi = max(hi, int(pdf["ts"].max().value // 1000))
        self._state.update((n, p, hi))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "n_purchases": [p],
                "max_ts_us": [hi],
            }
        )

    def close(self) -> None:
        pass


def user_profiles(events: DataFrame) -> DataFrame:
    """events(user_id, event_type, ts, ...) -> running per-user
    profile, one update row per key per micro-batch."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserProfileProcessor(),
        outputStructType=TWS_OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
