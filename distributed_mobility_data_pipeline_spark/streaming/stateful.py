"""Custom stateful streaming operator (SURVEY.md §2.10 note: beyond the
reference's batch surface; the `applyInPandasWithState` path).

Running per-key totals across micro-batches: state = (count, sum) per
event_type, updated from Arrow-batched pandas groups, emitting one
updated row per key per batch. This is the operator shape for anything
Spark's built-in windowed aggs can't express (custom session logic,
decaying counters, online sketches).

State is bounded by key cardinality; at 100 TB the state store is
RocksDB on executors (`spark.sql.streaming.stateStore.providerClass`),
not driver memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "event_type string, total_events long, total_value double"
STATE_SCHEMA = "count long, sum double"


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    count, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        count += len(pdf)
        total += float(pdf["value"].fillna(0.0).sum())
    state.update((count, total))
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "total_events": [count],
            "total_value": [round(total, 6)],
        }
    )


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Streaming running totals per event_type via custom state."""
    return (
        events.withWatermark("ts", "1 hour")
        .groupBy("event_type")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
