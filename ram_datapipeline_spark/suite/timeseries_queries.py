"""Time-series / changelog query family (beyond-reference): fixed-step
resampling with gap fill + last-observation-carried-forward, and CDC
changelog materialization (lakehouse MERGE semantics).

Exactness: bucket values are selected by deterministic (ts, event_id)
ordering — never float-summed across rows — so both queries are
bit-exact against DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ram_datapipeline_spark.catalog import load_tables
from ram_datapipeline_spark.operators.temporal import cdc_apply
from ram_datapipeline_spark.operators.timeseries import resample_gapfill_locf
from ram_datapipeline_spark.registry import query


@query(
    "ts_gapfill_locf",
    oracle="""
    WITH b AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket, ts, value, event_id
      FROM events
    ),
    rn AS (
      SELECT *, row_number() OVER (
        PARTITION BY user_id, bucket ORDER BY ts DESC, event_id DESC) AS rn
      FROM b
    ),
    agg AS (
      SELECT user_id, bucket, count(*) AS n_events,
             max(CASE WHEN rn = 1 THEN value END) AS last_v
      FROM rn GROUP BY user_id, bucket
    ),
    bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM b),
    spine AS (
      SELECT u.user_id, g.bucket
      FROM (SELECT DISTINCT user_id FROM b) u, bounds,
           LATERAL (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket) g
    )
    SELECT s.user_id, s.bucket,
           coalesce(a.n_events, 0) AS n_events,
           last_value(a.last_v IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
    FROM spine s LEFT JOIN agg a ON s.user_id = a.user_id AND s.bucket = a.bucket
    """,
    survey="time-series resample: gap fill + LOCF (beyond ref §2.3)",
    tags=("timeseries",),
)
def q_ts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly per-user grid over the full observed range: event counts
    (0 in gaps) and the last observed value carried forward. The spine is
    keys × sequence(), the carry is one per-key ordered window — no
    event-sized cross join anywhere (operators/timeseries.py)."""
    t = load_tables(spark, sf_dir)
    return resample_gapfill_locf(t["events"])


@query(
    "ts_cdc_apply",
    oracle="""
    WITH ch AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS op
      FROM events
    ),
    rn AS (
      SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM ch
    )
    SELECT user_id, ts, value, op FROM rn WHERE rn = 1 AND op <> 'delete'
    """,
    survey="CDC changelog -> snapshot (MERGE / upsert-compaction, beyond ref)",
    tags=("timeseries",),
)
def q_ts_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialize the event stream as a keyed snapshot: newest change
    per user wins, a winning 'error' acts as a delete marker and removes
    the key. One window shuffle — same plan class as latest-per-key (W1)
    with delete semantics on top (operators/temporal.py::cdc_apply)."""
    t = load_tables(spark, sf_dir)
    changes = t["events"].select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    )
    out = cdc_apply(
        changes, key_col="user_id", ts_col="ts", op_col="op",
        tiebreak_col="event_id",
    )
    return out.select("user_id", "ts", "value", "op")


@query(
    "ts_moving_avg",
    oracle="""
    WITH b AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket, count(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, bucket, n_events,
           CAST(sum(n_events) OVER w AS DOUBLE)
             / CAST(count(*) OVER w AS DOUBLE) AS ma3
    FROM b
    WINDOW w AS (PARTITION BY user_id ORDER BY bucket
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    survey="3-bucket moving average over the hourly series (ROWS frame, integer-exact)",
    tags=("timeseries",),
)
def q_ts_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-hour moving average of per-user event counts: the
    frame sums are BIGINT (order-safe), one division at the end. One
    (user, bucket) aggregate + one per-user frame window — both shuffles
    on the same key, co-partitioned."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    b = (
        t["events"]
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count("*").alias("n_events"))
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(-2, W.currentRow)
    )
    return b.select(
        "user_id",
        "bucket",
        "n_events",
        (
            F.sum("n_events").over(w).cast("double")
            / F.count("*").over(w).cast("double")
        ).alias("ma3"),
    )


@query(
    "ts_scd2_intervals",
    oracle="""
    WITH ch AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
    ),
    runs AS (
      SELECT user_id, event_type, ts, event_id FROM ch
      WHERE prev IS NULL OR prev <> event_type
    )
    SELECT user_id, event_type AS value, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             IS NULL AS is_current
    FROM runs
    """,
    survey=(
        "SCD type-2 dimension-history build from a change stream "
        "(beyond-reference temporal surface)"
    ),
    tags=("timeseries",),
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collapse each user's event-type stream into validity intervals —
    one row per run of equal consecutive values, (ts, event_id) ordering
    for deterministic same-timestamp sequences. The SCD2 table a
    warehouse MERGE maintains, derived in one pass (two windows over one
    Exchange)."""
    from ram_datapipeline_spark.operators.temporal import scd2_intervals

    t = load_tables(spark, sf_dir)
    return scd2_intervals(t["events"])


@query(
    "ts_ohlc_bars",
    oracle="""
    WITH r AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket, value,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts, event_id) AS rn_f,
             row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
                                ORDER BY ts DESC, event_id DESC) AS rn_l
      FROM events
    )
    SELECT event_type, bucket,
           min(CASE WHEN rn_f = 1 THEN value END) AS open,
           max(value) AS high,
           min(value) AS low,
           min(CASE WHEN rn_l = 1 THEN value END) AS close,
           count(*) AS n_ticks
    FROM r GROUP BY event_type, bucket
    """,
    survey=(
        "OHLC downsampling bars — series compaction with deterministic "
        "open/close under same-timestamp ticks (beyond-reference "
        "timeseries surface)"
    ),
    tags=("timeseries",),
)
def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type: open/close via struct-min/max
    over (ts, event_id, value) — one aggregate with map-side combine,
    deterministic ties (min_by/max_by would not be). The oracle replays
    first/last via dual row_number windows."""
    from ram_datapipeline_spark.operators.timeseries import ohlc_bars

    t = load_tables(spark, sf_dir)
    return ohlc_bars(t["events"])


@query(
    "ts_ewma_smooth",
    oracle="""
    WITH b AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket, count(*) AS n_events
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, count(*) AS n_points,
           list_reduce(
             list_transform(array_agg(n_events ORDER BY bucket),
                            x -> CAST(x AS DOUBLE)),
             (a, x) -> 0.5 * a + 0.5 * x) AS ewma
    FROM b GROUP BY user_id
    """,
    survey=(
        "EWMA smoothing as an ordered left fold (α = ½, exact-binary): "
        "the alerting signal of a metrics pipeline, bit-reproducible "
        "across engines because the fold order is pinned"
    ),
    tags=("timeseries",),
)
def q_ts_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final EWMA level of each user's hourly event-count series
    (operators/timeseries.py::ewma_smooth): one hash aggregate, series
    sorted in-row, folded sₜ = ½sₜ₋₁ + ½xₜ — every double the same
    correctly-rounded sequence DuckDB's ``list_reduce`` replays."""
    from ram_datapipeline_spark.operators.timeseries import ewma_smooth

    t = load_tables(spark, sf_dir)
    b = (
        t["events"]
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count("*").alias("n_events"))
    )
    return ewma_smooth(b, ["user_id"], "bucket", "n_events")


@query(
    "ts_time_weighted_avg",
    oracle="""
    WITH stepped AS (
      SELECT event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
             lead(epoch_us(ts)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
             ) - epoch_us(ts) AS dt_us
      FROM events
    )
    SELECT event_type, count(*) AS n_intervals,
           CAST(sum(dt_us) AS BIGINT) AS total_us,
           CAST(sum(cents * dt_us) AS DOUBLE) / 100.0
             / CAST(sum(dt_us) AS DOUBLE) AS twap
    FROM stepped WHERE dt_us IS NOT NULL
    GROUP BY event_type
    """,
    survey=(
        "time-weighted average (TWAP) — irregular-series aggregation "
        "with bigint µs×cents arithmetic, shuffle-order-proof "
        "(beyond-reference timeseries surface)"
    ),
    tags=("timeseries",),
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWAP of event value per type: each event's value held until the
    type's next event. Integer µs holding times × integer cents keep
    the weighted sum associative (operators/timeseries.py) — the
    estimator an order book or sensor rollup needs, exact under any
    partitioning."""
    from ram_datapipeline_spark.operators.timeseries import time_weighted_avg

    t = load_tables(spark, sf_dir)
    return time_weighted_avg(
        t["events"], ["event_type"], ts_col="ts", val_col="value",
        tiebreak_col="event_id",
    )


@query(
    "ts_anomaly_zscore",
    oracle="""
    WITH base AS (
      SELECT event_type, event_id, ts,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events
    ), stats AS (
      SELECT event_type, event_id, ts, cents,
             CAST(count(*) OVER w AS BIGINT) AS win_n,
             CAST(sum(cents) OVER w AS BIGINT) AS s,
             CAST(sum(cents * cents) OVER w AS BIGINT) AS q
      FROM base
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, event_id, ts, cents, win_n,
           CAST(abs(win_n * cents - s) AS BIGINT) AS dev_num,
           CAST(9 * (win_n * q - s * s) AS BIGINT) AS bound_sq
    FROM stats
    WHERE win_n >= 8
      AND (win_n * cents - s) * (win_n * cents - s)
          > 9 * (win_n * q - s * s)
    """,
    survey=(
        "rolling z-score anomaly flags, integer-exact: trailing-24-row "
        "window sum/sum-of-squares in BIGINT, (n*x - S)^2 > 9*(n*Q - "
        "S^2) — the n^2 denominators cancel, no sqrt, no float "
        "accumulation (north star — streaming-adjacent monitoring)"
    ),
    tags=("timeseries",),
)
def q_ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events more than 3 sigma from their type's trailing 24-event
    window (operators/timeseries.py::rolling_zscore_anomalies): one
    key-partitioned ROWS-framed window pass over integer cents —
    exact cross-multiplied variance test, frame excludes the current
    row (no self-masking), (ts, event_id) total order."""
    from ram_datapipeline_spark.operators.timeseries import (
        rolling_zscore_anomalies,
    )

    t = load_tables(spark, sf_dir)
    return rolling_zscore_anomalies(
        t["events"],
        ["event_type"],
        "ts",
        "event_id",
        F.floor(F.col("value") * 100.0 + 0.5),
        lookback=24,
        min_n=8,
        k_sigma=3,
    )


@query(
    "ts_resample_interp",
    oracle="""
    WITH dedup AS (
      SELECT event_type AS k, epoch_us(ts) AS t,
             arg_max(CAST(floor(value * 100.0 + 0.5) AS BIGINT),
                     event_id) AS c
      FROM events GROUP BY event_type, epoch_us(ts)
    ),
    bounds AS (
      SELECT k, ((min(t) + 3599999999) // 3600000000) * 3600000000 AS lo,
             max(t) AS hi
      FROM dedup GROUP BY k
    ),
    grid AS (
      SELECT k, unnest(generate_series(lo, hi, 3600000000)) AS g
      FROM bounds
    ),
    p AS (
      SELECT grid.k, grid.g, max(d.t) AS prev_t,
             arg_max(d.c, d.t) AS prev_c
      FROM grid JOIN dedup d ON d.k = grid.k AND d.t <= grid.g
      GROUP BY grid.k, grid.g
    ),
    n AS (
      SELECT grid.k, grid.g, min(d.t) AS next_t,
             arg_min(d.c, d.t) AS next_c
      FROM grid JOIN dedup d ON d.k = grid.k AND d.t >= grid.g
      GROUP BY grid.k, grid.g
    ),
    r AS (
      SELECT p.k, p.g, p.prev_t, n.next_t,
             CASE WHEN n.next_t = p.prev_t THEN p.prev_c
                  ELSE p.prev_c * (n.next_t - p.g)
                       + n.next_c * (p.g - p.prev_t) END AS interp_num,
             CASE WHEN n.next_t = p.prev_t THEN CAST(1 AS BIGINT)
                  ELSE n.next_t - p.prev_t END AS interp_den
      FROM p JOIN n ON p.k = n.k AND p.g = n.g
    )
    SELECT k AS event_type, make_timestamp(g) AS grid_ts,
           prev_t AS prev_t_us, next_t AS next_t_us,
           interp_num, interp_den,
           CAST(interp_num AS DOUBLE) / CAST(interp_den AS DOUBLE)
             / 100.0 AS interp_value
    FROM r
    """,
    survey=(
        "linear-interpolation resampling onto a fixed grid, exact "
        "rational output (num/den BIGINT pair — no float in the "
        "operator) — timeseries regularization, beyond ref"
    ),
    tags=("timeseries",),
)
def q_ts_resample_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly linear interpolation per event type
    (operators/timeseries.py::resample_interpolate): anchors+grid
    union through ONE key exchange and two ordered window passes; the
    oracle brackets each grid point with range-join aggregates — an
    independent algorithm for the same rationals."""
    from ram_datapipeline_spark.operators.timeseries import (
        resample_interpolate,
    )

    t = load_tables(spark, sf_dir)
    return resample_interpolate(
        t["events"], key_col="event_type", ts_col="ts", val_col="value",
        id_col="event_id", step_us=3_600_000_000,
    )


@query(
    "w8_running_distinct",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN row_number() OVER (
                    PARTITION BY user_id, event_type
                    ORDER BY ts, event_id) = 1
                  THEN 1 ELSE 0 END AS first_seen
      FROM events
    )
    SELECT user_id, event_id, ts,
           CAST(sum(first_seen) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING)
                AS BIGINT) AS n_types_seen
    FROM flagged
    """,
    survey=(
        "running distinct count per key (cumulative behavior-adoption "
        "curve: first-occurrence flag + running sum — the streaming-"
        "unfriendly COUNT(DISTINCT) OVER, made exact) — beyond ref"
    ),
    tags=("timeseries",),
)
def q_w8_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many distinct event types each user has exhibited up to each
    event: a (user, type)-keyed first-occurrence window then a
    user-keyed running sum — two key-partitioned exchanges, no
    distinct-state blowup (the naive set-union window carries a set
    per row)."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = t["events"].select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1)
        .otherwise(0)
        .alias("first_seen"),
    )
    return flagged.select(
        "user_id",
        "event_id",
        "ts",
        F.sum("first_seen").over(w_run).cast("long").alias("n_types_seen"),
    )


@query(
    "ts_cusum_drift",
    oracle="""
    WITH base AS (
      SELECT event_type, event_id, ts,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events
    ),
    pre AS (
      SELECT *,
             CAST(sum(cents - 5000 - 500) OVER w AS BIGINT) AS pu,
             CAST(sum(5000 - cents - 500) OVER w AS BIGINT) AS pd
      FROM base
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    ),
    st AS (
      SELECT *,
             CAST(min(least(pu, 0)) OVER w AS BIGINT) AS mu,
             CAST(min(least(pd, 0)) OVER w AS BIGINT) AS md
      FROM pre
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_type, event_id, ts, cents,
           pu - mu AS s_plus, pd - md AS s_minus,
           pu - mu > 5000 AS drift_up, pd - md > 5000 AS drift_down
    FROM st
    """,
    survey=(
        "two-sided CUSUM drift detection, integer-exact: the max(0, "
        "S+d) reset recursion unrolled to prefix-sum minus running "
        "prefix-min — sequential-looking change detection as two "
        "running aggregates over one window pass (beyond ref)"
    ),
    tags=("timeseries",),
)
def q_ts_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM monitoring of event values per type against a 50.00
    target (slack 5.00, decision threshold 50.00)
    (operators/timeseries.py::cusum_drift): one key exchange, cumsum +
    running-min over the same total order, all BIGINT cents."""
    from ram_datapipeline_spark.operators.timeseries import cusum_drift

    t = load_tables(spark, sf_dir)
    return cusum_drift(
        t["events"],
        ["event_type"],
        "ts",
        "event_id",
        F.floor(F.col("value") * 100.0 + 0.5),
        target_cents=5000,
        slack_cents=500,
        h_cents=5000,
    )


@query(
    "ts_seasonal_means",
    oracle="""
    WITH per AS (
      SELECT event_type,
             CAST(hour(ts) AS BIGINT) AS bucket,
             CAST(count(*) AS BIGINT) AS n_p,
             CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS sum_p
      FROM events GROUP BY event_type, hour(ts)
    ),
    tot AS (
      SELECT event_type,
             CAST(sum(n_p) AS BIGINT) AS n,
             CAST(sum(sum_p) AS BIGINT) AS s
      FROM per GROUP BY event_type
    )
    SELECT p.event_type, p.bucket, p.n_p, p.sum_p,
           CAST(p.sum_p * t.n - t.s * p.n_p AS BIGINT) AS idx_num,
           CAST(p.n_p * t.n AS BIGINT) AS idx_den,
           CAST(p.sum_p * t.n - t.s * p.n_p AS DOUBLE)
             / CAST(p.n_p * t.n AS DOUBLE) / 100.0 AS seasonal_idx
    FROM per p JOIN tot t USING (event_type)
    """,
    survey=(
        "seasonal-means profile (hour-of-day index, the means half of "
        "classical seasonal decomposition): exact-rational bucket-mean "
        "minus overall-mean per key — deseasonalization input for "
        "trend/anomaly passes (beyond-ref timeseries family)"
    ),
    tags=("timeseries",),
)
def q_ts_seasonal_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal index per event type
    (operators/timeseries.py::seasonal_means): one map-side-combined
    (key, hour) aggregate, a key-grain roll-up broadcast back, the
    index as the exact BIGINT pair sum_p·N − S·n_p over n_p·N — both
    engines replay the same integers; the one double is a single
    division pair."""
    from ram_datapipeline_spark.operators.timeseries import seasonal_means

    t = load_tables(spark, sf_dir)
    return seasonal_means(t["events"])


@query(
    "ts_acf_lags",
    oracle="""
    WITH base AS (
      SELECT event_type, ts, event_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x
      FROM events WHERE value IS NOT NULL
    ),
    led AS (
      SELECT event_type, x,
             lead(x, 1) OVER w AS y1,
             lead(x, 2) OVER w AS y2,
             lead(x, 3) OVER w AS y3
      FROM base
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    st AS (
      SELECT event_type, CAST(1 AS BIGINT) AS lag_k, x, y1 AS y FROM led
      UNION ALL
      SELECT event_type, CAST(2 AS BIGINT), x, y2 FROM led
      UNION ALL
      SELECT event_type, CAST(3 AS BIGINT), x, y3 FROM led
    ),
    agg AS (
      SELECT event_type, lag_k,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM st WHERE y IS NOT NULL
      GROUP BY event_type, lag_k
    )
    SELECT event_type, lag_k, n_pairs,
           CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
           CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vxn,
           CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vyn,
           CASE WHEN CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
                  OR CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) = 0
                THEN NULL
                ELSE (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           END AS acf
    FROM agg
    """,
    survey=(
        "lagged autocorrelation (lags 1-3) per key: BIGINT sufficient "
        "statistics in one ordered window pass + map-side-combined "
        "(key, lag) aggregate; the correlation is a pinned-order IEEE "
        "expression over exactly-converted int64s (beyond-ref "
        "timeseries family — the seasonality/persistence screen)"
    ),
    tags=("timeseries",),
)
def q_ts_acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1..3 autocorrelation of event values per event type
    (operators/timeseries.py::acf_lags): one key-partitioned ordered
    window computes all three leads in the same sort, lags stack
    map-side, five BIGINT sums collapse to the (key, lag) grain."""
    from ram_datapipeline_spark.operators.timeseries import acf_lags

    t = load_tables(spark, sf_dir)
    return acf_lags(
        t["events"],
        ["event_type"],
        "ts",
        "event_id",
        F.floor(F.col("value") * 100.0 + 0.5),
        max_lag=3,
    )


@query(
    "ts_theil_sen",
    oracle="""
    WITH per AS (
      SELECT event_type,
             CAST(hour(ts) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS s
      FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL
      GROUP BY event_type, hour(ts)
    ),
    pairs AS (
      SELECT a.event_type,
             CAST(b.s * a.n - a.s * b.n AS BIGINT) AS num,
             CAST(a.n * b.n * (b.h - a.h) AS BIGINT) AS den
      FROM per a JOIN per b
        ON a.event_type = b.event_type AND b.h > a.h
    ),
    q AS (
      SELECT event_type, num, den,
             CAST(num AS DOUBLE) / CAST(den AS DOUBLE) AS q,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE),
                                         num, den) AS rn,
             count(*) OVER (PARTITION BY event_type) AS c
      FROM pairs
    ),
    picked AS (
      SELECT * FROM q
      WHERE rn * 2 = (c + 1) - ((c + 1) % 2)
         OR rn * 2 = (c + 2) - ((c + 2) % 2)
    )
    SELECT event_type,
           CAST(max(c) AS BIGINT) AS n_pairs,
           CAST(min_by(num, rn) AS BIGINT) AS num_lo,
           CAST(min_by(den, rn) AS BIGINT) AS den_lo,
           CAST(max_by(num, rn) AS BIGINT) AS num_hi,
           CAST(max_by(den, rn) AS BIGINT) AS den_hi,
           (min(q) + max(q)) / 2.0 AS slope_cents_per_period
    FROM picked GROUP BY event_type
    """,
    survey=(
        "Theil-Sen robust trend (median of pairwise slopes) per key "
        "over the hour-of-day profile: exact BIGINT slope fractions "
        "ordered by their correctly-rounded quotient with a (num, den) "
        "tie-break; events touched once, all pair work on the "
        "quantized keys x 24-bucket grain (beyond-ref timeseries "
        "family — the outlier-proof trend estimator)"
    ),
    tags=("timeseries",),
)
def q_ts_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen hourly trend slope per event type
    (operators/timeseries.py::theil_sen_trend): one event-sized
    aggregate to (key, hour), <=276 pairwise slope fractions per key,
    engine-stable median pick."""
    from ram_datapipeline_spark.operators.timeseries import theil_sen_trend

    t = load_tables(spark, sf_dir)
    return theil_sen_trend(t["events"], ["event_type"], "ts", "value")


@query(
    "ts_rolling_slope",
    oracle="""
    WITH base AS (
      SELECT event_type, ts, event_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y
      FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, event_id, y,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id) AS BIGINT) AS i
      FROM base
    ),
    framed AS (
      SELECT event_type, event_id,
             CAST(count(*) OVER w AS BIGINT) AS n_win,
             CAST(sum(i) OVER w AS BIGINT) AS si,
             CAST(sum(y) OVER w AS BIGINT) AS sy,
             CAST(sum(i * i) OVER w AS BIGINT) AS sii,
             CAST(sum(i * y) OVER w AS BIGINT) AS siy
      FROM ranked
      WINDOW w AS (PARTITION BY event_type ORDER BY i
                   ROWS BETWEEN 15 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, event_id, n_win,
           CAST(n_win * siy - si * sy AS BIGINT) AS num,
           CAST(n_win * sii - si * si AS BIGINT) AS den,
           CASE WHEN n_win < 2 THEN NULL
                ELSE CAST(n_win * siy - si * sy AS DOUBLE)
                     / CAST(n_win * sii - si * si AS DOUBLE)
           END AS slope
    FROM framed
    """,
    survey=(
        "rolling OLS trend slope over the trailing 16 points per key: "
        "BIGINT windowed sufficient sums on the global row index "
        "(slope is translation-invariant, so windowed sums CAN see the "
        "regressor), exact integer num/den, one IEEE division — the "
        "per-event local-trend feature (beyond-ref timeseries)"
    ),
    tags=("timeseries",),
)
def q_ts_rolling_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-16-row OLS slope of event cents per event type
    (operators/timeseries.py::rolling_slope): one key exchange, the
    rank window and all four framed sums share its sort."""
    from ram_datapipeline_spark.operators.timeseries import rolling_slope

    t = load_tables(spark, sf_dir)
    return rolling_slope(
        t["events"], ["event_type"], "ts", "event_id",
        F.floor(F.col("value") * 100.0 + 0.5),
    )


@query(
    "ts_holt_linear",
    oracle="""
    WITH b AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket, count(*) AS n_events
      FROM events GROUP BY 1, 2
    ),
    folded AS (
      SELECT user_id, count(*) AS n_points,
             list_reduce(
               list_transform(array_agg(n_events ORDER BY bucket),
                              x -> [CAST(x AS DOUBLE), CAST(0.0 AS DOUBLE)]),
               (acc, e) -> [
                 0.25 * e[1] + 0.75 * (acc[1] + acc[2]),
                 0.5 * ((0.25 * e[1] + 0.75 * (acc[1] + acc[2])) - acc[1])
                   + 0.5 * acc[2]
               ]) AS st
      FROM b GROUP BY user_id
    )
    SELECT user_id, n_points, st[1] AS level, st[2] AS trend,
           st[1] + st[2] AS forecast_1
    FROM folded
    """,
    survey=(
        "Holt linear-trend double exponential smoothing (α=¼, β=½, "
        "exact-binary): level + trend + 1-step forecast per key as one "
        "pinned-IEEE ordered fold — the drift-aware upgrade of the EWMA "
        "alerting signal"
    ),
    tags=("timeseries",),
)
def q_ts_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt level/trend/forecast of each user's hourly event-count
    series (operators/timeseries.py::holt_linear_smooth): one hash
    aggregate, series sorted in-row, 2-state array-accumulator fold —
    the same correctly-rounded double sequence DuckDB's list_reduce
    replays (list accumulator, not struct: DuckDB aliases struct
    accumulators mid-lambda)."""
    from ram_datapipeline_spark.operators.timeseries import (
        holt_linear_smooth,
    )

    t = load_tables(spark, sf_dir)
    b = (
        t["events"]
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket"))
        .agg(F.count("*").alias("n_events"))
    )
    return holt_linear_smooth(b, ["user_id"], "bucket", "n_events")
