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
    dtype = dict(raw.dtypes).get("ts")
    if dtype == "bigint":
        raw = raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif dtype == "timestamp_ntz":
        # µs-precision fixture vintages read as TIMESTAMP_NTZ; event-time
        # watermarks are defined only on TIMESTAMP — normalize like the
        # batch catalog (UTC session ⇒ same instant, same wall clock)
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_window_agg(
    events: DataFrame,
    duration: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts + value sum per event type:
    (window_start, window_end, event_type, n_events, total_value)."""
    src = events.withWatermark("ts", watermark) if watermark else events
    # integer-cents sum: value carries 2 decimals, so the cross-row sum is
    # BIGINT — exact under any shuffle/merge order (a raw double sum is
    # order-dependent at the ULP level and can flake an exact-hash gate)
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    return (
        src.groupBy(F.window("ts", duration), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.sum(cents).cast("double") / 100.0).alias("total_value"),
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


def interval_join_attribution(
    views: DataFrame,
    clicks: DataFrame,
    horizon_minutes: int = 10,
    watermark: str | None = None,
) -> DataFrame:
    """Click attribution via a time-interval join: each click matched to
    the same user's views in the preceding ``horizon_minutes``.

    Batch/stream unified: on two ``readStream`` inputs this is Spark's
    stream-stream inner join — the time-bound condition is what lets the
    engine evict state (a view older than the horizon + watermark can
    never match a future click, so its state is dropped). On batch inputs
    the watermark is a no-op and the SAME function is the oracle-checked
    query.

    Gap seconds are µs-exact: epoch doubles below 2^53 — identical
    arithmetic in every engine."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    if watermark:
        v = v.withWatermark("view_ts", watermark)
        c = c.withWatermark("click_ts", watermark)
    horizon = f"INTERVAL {int(horizon_minutes)} MINUTES"
    joined = v.join(
        c,
        F.expr(
            f"v_user = c_user AND click_ts > view_ts "
            f"AND click_ts <= view_ts + {horizon}"
        ),
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
        (
            F.col("click_ts").cast("timestamp").cast("double")
            - F.col("view_ts").cast("timestamp").cast("double")
        ).alias("gap_s"),
    )


def dedup_events(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    watermark: str | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """At-least-once → exactly-once: drop replayed events by key.

    Streaming input: ``dropDuplicatesWithinWatermark`` — state holds one
    entry per key only within the watermark horizon, so memory is bounded
    by (horizon × arrival rate), not by history. Batch input: plain
    ``dropDuplicates`` (replays are whole-row copies, so which copy
    survives is immaterial)."""
    if events.isStreaming:
        if watermark is None:
            raise ValueError("streaming dedup requires a watermark horizon")
        return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return events.dropDuplicates(list(key_cols))


def enrich_with_dim(
    events: DataFrame,
    dim: DataFrame,
    on_left: str = "user_id",
    on_right: str = "c_custkey",
    attr: str = "c_mktsegment",
    duration: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Stream-static enrichment + windowed rollup: join each event to a
    dimension attribute and count per (window, attribute).

    The missing streaming-join flavor next to the stream-stream interval
    join: the static side is planned per micro-batch (so dimension
    updates between batches are picked up) and **broadcast** — the stream
    side never shuffles for the join; the only stateful operator is the
    windowed count. Unmatched events keep ``'unknown'`` rather than
    silently dropping (left join). Aggregates are count/max —
    selection-exact, no cross-row float sums.
    """
    src = events.withWatermark("ts", watermark) if watermark else events
    d = dim.select(F.col(on_right).alias(on_left), F.col(attr).alias("segment"))
    joined = src.join(F.broadcast(d), on_left, "left").withColumn(
        "segment", F.coalesce("segment", F.lit("unknown"))
    )
    return (
        joined.groupBy(F.window("ts", duration), "segment")
        .agg(F.count("*").alias("n_events"), F.max("value").alias("max_value"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "segment",
            "n_events",
            "max_value",
        )
    )


def interval_outer_attribution(
    views: DataFrame,
    clicks: DataFrame,
    horizon_minutes: int = 10,
    watermark: str | None = None,
) -> DataFrame:
    """LEFT OUTER interval join: every view, with its in-horizon clicks
    or a null-padded row if none came — the "which impressions never
    converted" shape ``interval_join_attribution`` cannot express.

    On two ``readStream`` inputs this is Spark's watermarked
    stream-stream outer join, and the interesting part is WHEN the null
    row appears: only once the watermark passes ``view_ts + horizon``
    can the engine prove no future click will match, so unmatched views
    are emitted at state EVICTION (a no-data micro-batch after the last
    file flushes the final watermark's evictions). Outer stream-stream
    joins without a watermark are rejected by Spark itself — the state
    would be unbounded. On batch inputs the same function is a plain
    left join, which is the oracle-checked twin.

    Gap seconds are µs-exact epoch-double subtraction, null when
    unmatched."""
    v = views.select(
        F.col("event_id").alias("view_id"),
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
    )
    c = clicks.select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
    )
    if watermark:
        v = v.withWatermark("view_ts", watermark)
        c = c.withWatermark("click_ts", watermark)
    horizon = f"INTERVAL {int(horizon_minutes)} MINUTES"
    joined = v.join(
        c,
        F.expr(
            f"v_user = c_user AND click_ts > view_ts "
            f"AND click_ts <= view_ts + {horizon}"
        ),
        "leftOuter",
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_id",
        "click_id",
        "view_ts",
        "click_ts",
        (
            F.col("click_ts").cast("timestamp").cast("double")
            - F.col("view_ts").cast("timestamp").cast("double")
        ).alias("gap_s"),
    )


def idempotent_batch_writer(out_path: str):
    """The foreachBatch body for exactly-once file output WITHOUT a
    transaction log: each micro-batch lands in its own
    ``batch_id=<id>`` partition directory with overwrite mode, so a
    batch RE-DELIVERED after a failure between the data write and the
    checkpoint commit (Structured Streaming's at-least-once replay
    window) overwrites its own directory instead of double-appending.
    Downstream readers see each batch exactly once; the batch_id
    partition column doubles as a processing audit trail."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{out_path}/batch_id={batch_id}"
        )

    return _write


def write_stream_idempotent(
    df: DataFrame, out_path: str, checkpoint: str, query_name: str = "idemsink"
):
    """Append-mode streaming sink with exactly-once file semantics via
    :func:`idempotent_batch_writer` — the no-lakehouse answer to
    duplicate micro-batches (the complete-mode twin is
    ``write_stream_to_parquet``). Returns the StreamingQuery."""
    return (
        df.writeStream.foreachBatch(idempotent_batch_writer(out_path))
        .outputMode("append")
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
