"""Event-stream transformations (batch/stream unified).

Watermark notes (the streaming-only concern): ``tumbling_window_agg`` and
``session_window_agg`` accept a watermark delay; on a batch DataFrame
``withWatermark`` is a no-op, so the SAME function is both the oracle-checked
batch query and the incremental streaming query. State size at scale is
bounded by (watermark horizon × active keys), not history — the windows
close and evict.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def read_events_stream(
    spark: SparkSession, events_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Parquet-directory event stream (file-arrival semantics — the local
    stand-in for Kafka): new files landing in ``events_dir`` become
    micro-batches. Schema is taken from a batch read; nano timestamps get
    the same µs conversion as the catalog."""
    batch = spark.read.parquet(events_dir)
    raw = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_dir)
    )
    if dict(raw.dtypes).get("ts") == "bigint":
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return raw


def tumbling_window_agg(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts + value sum per event type:
    (window_start, window_end, event_type, n_events, total_value)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.window("ts", duration), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def write_stream_to_parquet(
    agg: DataFrame, out_path: str, checkpoint: str, query_name: str = "sink"
):
    """foreachBatch parquet sink for aggregated streams: each micro-batch
    OVERWRITES the result snapshot (complete-mode semantics on files) —
    the production pattern for serving a continuously-updated aggregate
    from object storage. Returns the StreamingQuery."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(out_path)

    return (
        agg.writeStream.foreachBatch(_write)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization, batch form (lag + cumulative flag sum):
    (user_id, session_id, n_events, session_start, session_end).

    Session ids are 1-based per user in time order — deterministic with the
    (ts, event_id) tie-break. The streaming form of the same semantics is
    ``session_window_agg`` (Spark's native session windows); equivalence is
    asserted in tests."""
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = float(gap_minutes * 60)
    prev = F.lag("ts").over(order)
    # microsecond-exact gap test: epoch seconds as double (µs fraction is
    # exactly representable below 2^53) — truncating to whole seconds would
    # mis-split sessions whose gap straddles the boundary
    diff = F.col("ts").cast("double") - prev.cast("double")
    is_new = F.when(prev.isNull() | (diff > gap_s), 1).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sessions = events.withColumn("_new", is_new).withColumn(
        "session_id", F.sum("_new").over(run).cast("long")
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


def session_window_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Native session windows (streaming-capable stateful operator):
    (user_id, session_start, session_end, n_events). Windows merge while
    events arrive within ``gap`` — the incremental equivalent of
    ``sessionize``; state per (user, open session), evicted past the
    watermark."""
    src = events.withWatermark("ts", watermark) if watermark else events
    return (
        src.groupBy(F.session_window("ts", gap), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
