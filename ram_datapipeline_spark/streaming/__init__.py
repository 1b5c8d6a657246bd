"""Streaming layer.

The reference is strictly batch (SURVEY §2.8); its stream-shaped surfaces
are the IPC progress events and the append-only operation log
(`ram-analysis/app/utils/operation.js:201-230`). Parity lives in
``oplog.OperationLog``. Beyond parity, the ``events`` fixture gets real
Structured-Streaming-ready transformations: every function here takes a
DataFrame and works identically on ``spark.read`` (batch, oracle-checked)
and ``spark.readStream`` (incremental) inputs — Spark's unified API is the
design point, batch correctness certifies the streaming plan.
"""

from ram_datapipeline_spark.streaming.events import (  # noqa: F401
    dedup_events,
    enrich_with_dim,
    interval_join_attribution,
    interval_outer_attribution,
    read_events_stream,
    session_window_agg,
    sessionize,
    tumbling_window_agg,
    idempotent_batch_writer,
    write_stream_idempotent,
    write_stream_to_parquet,
)
from ram_datapipeline_spark.streaming.dedup_stream import (  # noqa: F401
    incremental_dedup_stream,
)
from ram_datapipeline_spark.streaming.oplog import OperationLog  # noqa: F401
from ram_datapipeline_spark.streaming.stateful import (  # noqa: F401
    running_user_totals,
)
from ram_datapipeline_spark.streaming.stateful_v2 import (  # noqa: F401
    running_user_totals_v2,
)
