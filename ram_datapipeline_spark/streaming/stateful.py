"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's only state is its progress accounting (remaining-squares
counters, ram-analysis/app/index.js:24,425-426). This module provides the
general-purpose version for event streams: per-key running aggregates that
survive across micro-batches with explicit, bounded state — the Structured
Streaming analog of a keyed counter service.

State discipline at scale: one fixed-width row per user (count, sum, last
seen) — state size is O(active keys), independent of stream length;
``GroupStateTimeout.NoTimeout`` here because the fixture is bounded, a
production deployment sets ProcessingTimeTimeout to evict idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("total", DoubleType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold each micro-batch into (count, sum) state; emit the running
    totals for the key once per batch."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming DataFrame in → per-user running (count, sum(value)) out,
    one update row per user per micro-batch (update output mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
