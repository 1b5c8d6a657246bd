"""Custom stateful streaming operator on Spark 4's ``transformWithState``
API (``transformWithStateInPandas``) — the successor to
``applyInPandasWithState`` (see ``stateful.py``; both are kept so the
engine exercises the old AND new custom-state surfaces).

What the new API adds at scale, and why a 100 TB deployment wants it:
typed named state variables (value/list/map) instead of one opaque
tuple, per-state TTL (``ttlDurationMs`` — state eviction without
hand-rolled timeout plumbing), timers, and initial-state bootstrap.
State discipline is unchanged: one fixed-width value row per user, size
O(active keys), independent of stream length.

The processor below is the exact semantic twin of
``stateful.running_user_totals`` — the equivalence of the two APIs on the
same bounded stream is asserted in tests/test_streaming.py. Runtime
caveat: transformWithState's state server speaks protobuf; environments
without ``google.protobuf`` (this container) can import and plan this
operator but the streaming query fails at start — the test is gated
accordingly, and ``running_user_totals`` (v1 API) is the tested
deployment path here.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from ram_datapipeline_spark.streaming.stateful import OUTPUT_SCHEMA


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running (count, sum(value)) with a typed ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "n long, total double")

    def handleInputRows(
        self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        if self._totals.exists():
            n, total = self._totals.get()
        else:
            n, total = 0, 0.0
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    def close(self) -> None:
        pass


def running_user_totals_v2(events: DataFrame) -> DataFrame:
    """Streaming DataFrame in → per-user running (count, sum(value)) out —
    identical semantics to ``running_user_totals``, expressed on the
    transformWithState API (update mode, no time semantics needed for a
    bounded fixture; production sets timeMode + TTL for eviction)."""
    return events.groupBy("user_id").transformWithStateInPandas(
        RunningTotalsProcessor(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
