"""Event-stream query family: batch forms of the streaming transformations,
fully oracle-backed. The identical functions run unchanged on
``readStream`` inputs (tests/test_streaming.py proves batch/stream result
equivalence); the DuckDB oracle certifies the windowing arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ram_datapipeline_spark.catalog import load_tables
from ram_datapipeline_spark.registry import query
from ram_datapipeline_spark.streaming import (
    dedup_events,
    interval_join_attribution,
    sessionize,
    tumbling_window_agg,
)


@query(
    "st_window_counts",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
           event_type,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    survey="streaming: tumbling-window aggregation (events surface, §2.8)",
    tags=("streaming",),
)
def q_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event type. Watermarked identically in
    the streaming path; epoch-aligned buckets match time_bucket."""
    t = load_tables(spark, sf_dir)
    return tumbling_window_agg(t["events"], "1 hour")


@query(
    "st_event_props_decode",
    oracle="""
    SELECT event_id, user_id,
           CAST(props->>'k' AS BIGINT) AS k,
           event_type
    FROM events
    WHERE CAST(props->>'k' AS BIGINT) >= 50
    """,
    survey="F6 JSON decode on the event stream (index.js:315 analog)",
    tags=("streaming",),
)
def q_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON payload extraction + predicate on the decoded value — the
    settings-decode pattern (S3/F6) applied to the event surface; the
    filter happens post-parse but pre-shuffle (no shuffle at all here)."""
    from pyspark.sql import functions as F

    t = load_tables(spark, sf_dir)
    e = t["events"]
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        e.select("event_id", "user_id", k.alias("k"), "event_type")
        .filter(F.col("k") >= 50)
    )


@query(
    "st_sessionize",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    s AS (
      SELECT user_id, ts, event_id,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS BIGINT)
               AS session_id
      FROM x
    )
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM s GROUP BY user_id, session_id
    """,
    survey="streaming: gap-based sessionization (stateful-op batch twin, §2.8)",
    tags=("streaming",),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user; `session_window_agg` is the
    incremental twin (equivalence asserted in tests)."""
    t = load_tables(spark, sf_dir)
    return sessionize(t["events"], gap_minutes=30)


@query(
    "st_click_attribution",
    oracle="""
    SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
           v.ts AS view_ts, c.ts AS click_ts,
           epoch(c.ts) - epoch(v.ts) AS gap_s
    FROM events v
    JOIN events c
      ON c.user_id = v.user_id
     AND c.ts > v.ts
     AND c.ts <= v.ts + INTERVAL 10 MINUTE
    WHERE v.event_type = 'view' AND c.event_type = 'click'
    """,
    survey="streaming: stream-stream interval join (click attribution, §2.8)",
    tags=("streaming",),
)
def q_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clicks attributed to same-user views in the preceding 10 minutes.
    The identical function on two readStream inputs is a watermarked
    stream-stream join (state evicted past horizon + watermark);
    equivalence is proven in tests/test_streaming.py."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    from pyspark.sql import functions as F

    return interval_join_attribution(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
        horizon_minutes=10,
    )


@query(
    "st_dedup_replay",
    oracle="""
    SELECT * FROM events
    """,
    survey="streaming: exactly-once via keyed dedup (dropDuplicatesWithinWatermark twin, §2.8)",
    tags=("streaming",),
)
def q_dedup_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An at-least-once replay (the events table unioned with itself)
    deduplicated back to exactly-once on event_id. Replayed rows are
    whole-row copies, so the survivor set is exactly the original table;
    the streaming path (dropDuplicatesWithinWatermark, bounded state) is
    proven equivalent in tests/test_streaming.py."""
    t = load_tables(spark, sf_dir)
    ev = t["events"]
    return dedup_events(ev.unionAll(ev))


@query(
    "st_enrich_static",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', e.ts) AS window_start,
           time_bucket(INTERVAL '1 hour', e.ts) + INTERVAL '1 hour' AS window_end,
           coalesce(c.c_mktsegment, 'unknown') AS segment,
           count(*) AS n_events,
           max(e.value) AS max_value
    FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY 1, 2, 3
    """,
    survey="streaming: stream-static broadcast enrichment + windowed rollup (§2.8)",
    tags=("streaming",),
)
def q_enrich_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events enriched with the customer market segment (static dim,
    broadcast — the stream side never shuffles for the join), counted per
    1-hour window × segment. Streaming twin equivalence in
    tests/test_streaming.py; aggregates are count/max (selection-exact,
    no cross-row float sums)."""
    from ram_datapipeline_spark.streaming import enrich_with_dim

    t = load_tables(spark, sf_dir)
    return enrich_with_dim(t["events"], t["customer"])


@query(
    "st_late_data_drop",
    oracle="""
    SELECT event_id, user_id, ts,
           ts < coalesce(
                  max(ts) OVER (ORDER BY event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING),
                  TIMESTAMP '1900-01-01 00:00:00')
                - INTERVAL 1 HOUR AS is_late
    FROM events
    """,
    survey=(
        "watermark late-data drop rule as a batch twin: event late iff "
        "older than (max event time at any earlier arrival) - delay "
        "(beyond-reference streaming surface)"
    ),
    tags=("streaming",),
)
def q_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming's `withWatermark(ts, '1 hour')` drop verdict
    for every event, computed in batch: the watermark is a GLOBAL running
    max over arrival order (event_id), decomposed scalably as per-range
    running maxima + a metadata-sized prefix-max over range maxima (the
    naive global window is a single-partition sort). The oracle replays
    the naive global window — same values, which is the point of the
    decomposition."""
    from ram_datapipeline_spark.operators.temporal import late_data_drop

    t = load_tables(spark, sf_dir)
    return late_data_drop(t["events"], delay="1 hour")


@query(
    "st_view_click_outer",
    oracle="""
    SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
           v.ts AS view_ts, c.ts AS click_ts,
           epoch(c.ts) - epoch(v.ts) AS gap_s
    FROM (SELECT * FROM events WHERE event_type = 'view') v
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = v.user_id
     AND c.ts > v.ts
     AND c.ts <= v.ts + INTERVAL 10 MINUTE
    """,
    survey=(
        "streaming: watermarked stream-stream LEFT OUTER interval join "
        "— unmatched views null-padded at state eviction (§2.8, "
        "beyond-reference streaming surface)"
    ),
    tags=("streaming",),
)
def q_view_click_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every view with its in-horizon clicks OR a null row if none —
    the non-conversion report. The identical function on two readStream
    inputs is Spark's watermarked stream-stream outer join; unmatched
    views surface only once the watermark proves no future click can
    match (eviction-time emission, asserted against this batch twin in
    tests/test_streaming.py)."""
    from pyspark.sql import functions as F

    from ram_datapipeline_spark.streaming import interval_outer_attribution

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    return interval_outer_attribution(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "click"),
        horizon_minutes=10,
    )
