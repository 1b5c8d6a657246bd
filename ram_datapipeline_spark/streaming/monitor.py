"""Streaming CUSUM drift monitor — the stateful incremental twin of
``operators/timeseries.py::cusum_drift`` (which unrolls the textbook
recursion to window prefix aggregates for batch).

Here the recursion runs DIRECTLY, one fixed-width state row per key:

    S+ = max(0, S+ + (x - target) - slack)
    S- = max(0, S- - (x - target) - slack)

folded over each micro-batch in deterministic (ts, tiebreak) order via
``applyInPandasWithState``. Integer cents in, integer state, integer
out — the emitted rows are BIT-IDENTICAL to the batch operator's when
events arrive in timestamp order (equivalence asserted in
tests/test_streaming.py), which is the monitoring deployment's contract
(one in-order source per key; out-of-order sources go through the batch
operator after a watermark sort).

State discipline at scale: two BIGINTs per key, O(active keys),
independent of stream length; the fixture is bounded so NoTimeout —
production sets ProcessingTimeTimeout to evict idle keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

CUSUM_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("cents", LongType()),
        StructField("s_plus", LongType()),
        StructField("s_minus", LongType()),
        StructField("drift_up", BooleanType()),
        StructField("drift_down", BooleanType()),
    ]
)

CUSUM_STATE_SCHEMA = StructType(
    [
        StructField("s_plus", LongType()),
        StructField("s_minus", LongType()),
    ]
)


def _make_update(target_cents: int, slack_cents: int, h_cents: int):
    def _update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        sp, sm = state.get if state.exists else (0, 0)
        # a group's micro-batch arrives as SEVERAL Arrow chunks whose
        # relative order is shuffle-dependent — concatenate and sort the
        # WHOLE micro-batch before folding, or the recursion runs chunks
        # out of event-time order above maxRecordsPerBatch (review find)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True).sort_values(
                ["ts", "event_id"], kind="mergesort"
            )
            cents = pdf["cents"].to_numpy()
            n = len(cents)
            sps = [0] * n
            sms = [0] * n
            for i in range(n):
                d = int(cents[i]) - target_cents
                sp = max(0, sp + d - slack_cents)
                sm = max(0, sm - d - slack_cents)
                sps[i] = sp
                sms[i] = sm
            out = pd.DataFrame(
                {
                    "event_type": key[0],
                    "event_id": pdf["event_id"].to_numpy(),
                    "ts": pdf["ts"].to_numpy(),
                    "cents": cents,
                    "s_plus": sps,
                    "s_minus": sms,
                }
            )
            out["drift_up"] = out["s_plus"] > h_cents
            out["drift_down"] = out["s_minus"] > h_cents
            yield out
        state.update((sp, sm))

    return _update


def cusum_alerts_stream(
    events: DataFrame,
    target_cents: int,
    slack_cents: int,
    h_cents: int,
) -> DataFrame:
    """Streaming events in (event_type, event_id, ts, value) →
    per-row CUSUM monitor rows out, exactly the batch ``cusum_drift``
    columns. Python cost is the per-key recursion only — the stream is
    Arrow-batched and the fold is per-micro-batch-row, the honest price
    of a genuinely sequential statistic in a streaming context (batch
    callers get the window-unrolled JVM version).

    NULL-valued events are dropped at intake (ADVICE r10): they carry
    no signal and cannot move the statistic — the batch twin's windowed
    sums skip them too, so every emitted row stays bit-identical to
    ``cusum_drift`` restricted to non-NULL values. Without the filter,
    Arrow delivers NULL cents to the pandas fold as NaN and
    ``int(cents[i])`` would kill the streaming query."""
    prepped = events.where(F.col("value").isNotNull()).select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    return prepped.groupBy("event_type").applyInPandasWithState(
        _make_update(target_cents, slack_cents, h_cents),
        outputStructType=CUSUM_OUTPUT_SCHEMA,
        stateStructType=CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
