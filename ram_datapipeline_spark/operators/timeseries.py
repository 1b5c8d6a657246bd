"""Time-series regularization operators (beyond-reference).

The reference is batch-geospatial and has no time-series surface
(SURVEY §2.3); an events/metrics pipeline needs resampling. Provided:

- ``resample_gapfill_locf`` — bucket an event stream to a fixed step,
  densify every key over the full observed range (gap fill), and carry
  the last observed value forward (LOCF) across empty buckets.

Exactness rules: bucket values are *selected*, never float-summed across
rows (the last event per bucket is picked by a deterministic
``(ts, id)`` ordering), so every emitted double is a value that exists
in the input — bit-reproducible under any shuffle order and
DuckDB-oracle-checkable.

Scale shape: one window + one aggregate over the events (both on the
``(key, bucket)`` grain, map-side combined), a key×buckets spine built
by exploding a per-key ``sequence()`` (never a driver loop; bounded by
keys × range/step, the *output* size), one left join back, and one
per-key ordered window for the carry-forward. No cross join of
event-sized inputs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_gapfill_locf(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    step: str = "hour",
) -> DataFrame:
    """Regularize ``events`` onto a fixed ``step`` grid per key.

    Emits ``(key_col, bucket, n_events, locf_value)`` for EVERY
    (key, bucket) in [min bucket, max bucket] of the whole input:

    - ``n_events``   — events of that key in that bucket (0 when gap);
    - ``locf_value`` — value of the key's newest event at or before the
      bucket's end, ties on ``ts`` broken by ``id_col`` descending; NULL
      until the key's first event (no forward leakage).
    """
    b = events.select(
        F.col(key_col),
        F.date_trunc(step, F.col(ts_col)).alias("bucket"),
        F.col(ts_col),
        F.col(val_col),
        F.col(id_col),
    )
    # max_by over the (ts, id) struct = "newest event's value" as a plain
    # map-side-combinable aggregate — one corpus exchange total, vs the
    # row_number-window formulation's extra full sort + shuffle
    per_bucket = b.groupBy(key_col, "bucket").agg(
        F.count("*").alias("n_events"),
        F.expr(f"max_by({val_col}, struct({ts_col}, {id_col}))").alias("last_v"),
    )
    bounds = b.agg(
        F.min("bucket").alias("lo"), F.max("bucket").alias("hi")
    )
    keys = b.select(key_col).distinct()
    spine = (
        keys.join(F.broadcast(bounds))
        .select(
            key_col,
            F.explode(
                F.expr(f"sequence(lo, hi, interval 1 {step})")
            ).alias("bucket"),
        )
    )
    locf_w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(per_bucket, [key_col, "bucket"], "left")
        .select(
            key_col,
            "bucket",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("last_v", ignorenulls=True).over(locf_w).alias("locf_value"),
        )
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    bucket: str = "hour",
) -> DataFrame:
    """Downsample a value stream to OHLC bars: per (key, time bucket) the
    opening value (first by (ts, tiebreak)), high, low, closing value
    (last), and tick count — the canonical series-compaction shape
    (candles, sensor rollups, metric downsampling).

    Open/close are struct-min/max over (ts, tiebreak, value): a pure
    aggregate with map-side combine and a DETERMINISTIC winner under
    same-timestamp ticks (the min_by/max_by builtins tie-break
    arbitrarily — unusable under an exact oracle). One shuffle on
    (key, bucket); high/low/count ride the same aggregate.
    """
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket")
    first_s = F.min(F.struct(ts_col, tiebreak_col, value_col))
    last_s = F.max(F.struct(ts_col, tiebreak_col, value_col))
    return (
        df.groupBy(F.col(key_col), b)
        .agg(
            first_s.alias("_f"),
            last_s.alias("_l"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.count("*").alias("n_ticks"),
        )
        .select(
            key_col,
            "bucket",
            F.col(f"_f.{value_col}").alias("open"),
            "high",
            "low",
            F.col(f"_l.{value_col}").alias("close"),
            "n_ticks",
        )
    )


def ewma_smooth(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    val_col: str,
    alpha_num: int = 1,
    alpha_den: int = 2,
) -> DataFrame:
    """Exponentially-weighted moving average per key as an ORDERED left
    fold: s₁ = x₁, sₜ = (1−α)·sₜ₋₁ + α·xₜ, with α = alpha_num/alpha_den
    restricted to exact binary fractions (default ½) so every step is two
    correctly-rounded multiplies and one add — the same IEEE sequence any
    engine replays when folding in the same order (the smoothing analog
    of the engine-wide "strict left fold" rule for dot products).

    Emits ``(key_cols…, n_points, ewma)`` — the final smoothed level per
    key (the signal a metrics pipeline alerts on).

    Scale shape: one hash aggregate; each key's series is gathered with
    ``collect_list(struct(order, val))``, sorted IN the row
    (``array_sort`` — no window, no second shuffle), and folded by
    ``F.aggregate``. Per-key series length is the only memory bound —
    the right shape when keys are plentiful and series are bounded
    (resample first if a key's raw series is unbounded)."""
    if alpha_den & (alpha_den - 1) or not (0 < alpha_num < alpha_den):
        raise ValueError(
            "ewma_smooth: alpha must be a proper exact-binary fraction "
            f"(got {alpha_num}/{alpha_den})"
        )
    a = alpha_num / alpha_den
    # NULL values are excluded up front (collect_list drops null inputs,
    # and the when() nulls the struct for null-v rows): an all-NULL key
    # then yields an EMPTY series — guarded below — instead of a fold
    # over nulls, and n_points counts the same rows the fold consumes.
    series = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col(val_col).isNotNull(),
                    F.struct(F.col(order_col).alias("o"),
                             F.col(val_col).alias("v")),
                )
            )
        ),
        lambda s: s["v"].cast("double"),
    )
    fold = F.aggregate(
        # greatest(…, 0): slice() throws on negative length when the
        # series is empty; F.get is null-safe where element_at throws
        F.slice(series, 2, F.greatest(F.size(series) - 1, F.lit(0))),
        F.get(series, 0),
        lambda acc, x: F.lit(1.0 - a) * acc + F.lit(a) * x,
    )
    return df.groupBy(*key_cols).agg(
        F.count(val_col).alias("n_points"),
        fold.alias("ewma"),
    )


def time_weighted_avg(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str = "ts",
    val_col: str = "value",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Time-weighted average per key (TWAP): each observation holds its
    value until the NEXT observation, so it contributes value × holding
    time; the last observation holds nothing and contributes zero.

    Pinned arithmetic so any engine replays it bit-for-bit: holding
    times are integer MICROSECONDS (``unix_micros`` deltas — bigints),
    values are integer cents, the weighted sum is a bigint Σ cents·µs
    (associative — shuffle order can't perturb it), and only the final
    ``sum/100/total`` happens in IEEE doubles. A float Σ value·dt would
    depend on add order and never hash-match across engines.

    One window (lead over the key's time order) + one groupBy — the
    window and the agg share the same hash partitioning, so Catalyst
    plans a single exchange. Ties on ``ts_col`` are broken by
    ``tiebreak_col`` (required for determinism when timestamps can
    repeat).

    Returns ``(key_cols..., n_intervals, total_us, twap)``; keys with
    fewer than two observations have no holding interval and are
    absent from the result (a TWAP of one point is undefined).
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(*key_cols).orderBy(*order)
    dt = F.lead(F.unix_micros(F.col(ts_col))).over(w) - F.unix_micros(
        F.col(ts_col)
    )
    cents = F.floor(F.col(val_col) * 100.0 + 0.5).cast("long")
    stepped = df.select(
        *key_cols,
        dt.alias("_dt_us"),
        (cents * dt).alias("_w_cents_us"),
    ).where(F.col("_dt_us").isNotNull())
    return stepped.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("_dt_us").alias("total_us"),
        (
            F.sum("_w_cents_us").cast("double")
            / 100.0
            / F.sum("_dt_us").cast("double")
        ).alias("twap"),
    )


def rolling_zscore_anomalies(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    cents: F.Column,
    lookback: int = 24,
    min_n: int = 8,
    k_sigma: int = 3,
) -> DataFrame:
    """Rolling z-score anomaly detection, INTEGER-EXACT — flag events
    whose value deviates more than ``k_sigma`` standard deviations
    from the trailing ``lookback``-row window, with zero float
    accumulation: over integer cents, ``(x - mean)^2 > k^2 * var``
    cross-multiplies to

        (n*x - S)^2 > k^2 * (n*Q - S^2)

    where S/Q are the window's exact BIGINT sum and sum-of-squares —
    the n^2 denominators cancel algebraically, so no division, no
    sqrt, no drift, and the DuckDB oracle replays the same longs.

    Scale shape: ONE window pass, partitioned by the key (never
    single-partition), ROWS-framed to the trailing ``lookback`` rows
    EXCLUDING current (no self-masking); state per partition is the
    frame, O(lookback). The order is total — (ts, tiebreak) — so the
    frame content is engine- and shuffle-order-independent.

    Output: flagged rows only — key_cols + (tiebreak, ts, cents,
    win_n, dev_num = |n*x - S|, bound_sq = k^2*(n*Q - S^2)).
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(-lookback, -1)
    )
    base = df.select(
        *key_cols, tiebreak_col, ts_col, cents.cast("long").alias("cents")
    )
    stats = base.select(
        *key_cols,
        tiebreak_col,
        ts_col,
        "cents",
        F.count(F.lit(1)).over(w).cast("long").alias("win_n"),
        F.sum("cents").over(w).alias("_s"),
        F.sum(F.col("cents") * F.col("cents")).over(w).alias("_q"),
    )
    k2 = k_sigma * k_sigma
    return (
        stats.where(F.col("win_n") >= min_n)
        .withColumn("_lhs", F.expr("win_n * cents - _s"))
        .withColumn(
            "bound_sq", F.expr(f"{k2} * (win_n * _q - _s * _s)")
        )
        .where(F.expr("_lhs * _lhs > bound_sq"))
        .select(
            *key_cols,
            tiebreak_col,
            ts_col,
            "cents",
            "win_n",
            F.abs(F.col("_lhs")).alias("dev_num"),
            "bound_sq",
        )
    )


def sessionize_batch(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    type_col: str | None = None,
) -> DataFrame:
    """Batch gap-sessionization via Spark's native ``session_window``
    aggregate (the batch twin of ``streaming/events.py``'s stateful
    sessionizer): consecutive events of a key belong to one session
    while each inter-event gap is strictly under ``gap``; a gap of
    exactly ``gap`` or more starts a new session (session windows
    ``[t, t+gap)`` merge only when they overlap).

    Spark-first: ``session_window`` is evaluated inside the aggregate
    itself — ONE exchange on the key, merge happens in the aggregation
    buffer, no row_number/lag window pass and no second shuffle (the
    lag+cumsum formulation needs a windowed sort AND a re-aggregation;
    this is the operator Spark grew so you don't build that). The
    DuckDB oracle replays the lag/cumsum formulation — an independent
    algorithm for the same partition of the event stream.

    Output grain: one row per (key, session): session_start/end are
    the observed extremes (exact timestamps, selected not computed),
    ``n_events``, optional ``n_types`` distinct-count, and the exact
    BIGINT microsecond duration.
    """
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
    ]
    if type_col is not None:
        aggs.append(F.countDistinct(type_col).alias("n_types"))
    return (
        events.groupBy(
            F.col(key_col), F.session_window(F.col(ts_col), gap)
        )
        .agg(*aggs)
        .select(
            key_col,
            "session_start",
            "session_end",
            "n_events",
            *(["n_types"] if type_col is not None else []),
            (
                F.unix_micros("session_end") - F.unix_micros("session_start")
            ).alias("duration_us"),
        )
    )


def resample_interpolate(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    id_col: str = "event_id",
    step_us: int = 3_600_000_000,
) -> DataFrame:
    """Linear-interpolation resampling onto a fixed ``step_us`` grid per
    key — the lossy-but-regular twin of ``resample_gapfill_locf`` (LOCF
    holds the last value; interpolation draws the line between the
    bracketing observations, what metric rollups and training-curve
    alignment want).

    EXACT RATIONAL OUTPUT: the interpolated value at grid point g with
    bracketing events (t1, c1), (t2, c2) (cents, BIGINT) is emitted as
    the integer pair

        interp_num = c1*(t2-g) + c2*(g-t1),   interp_den = t2-t1

    (value = num/den cents) — no float math anywhere in the operator, so
    the DuckDB oracle matches bit-for-bit; a convenience double is
    derived by one CAST+division, identical in both engines (IEEE
    correctly-rounded single operation). Ties (two events of a key on
    the same microsecond) are resolved BEFORE bracketing by a
    deterministic max-``id_col`` pick, so prev/next are well-defined
    under any shuffle order.

    Scale shape: one (key, t) pre-aggregation, a per-key grid built by
    ``sequence()`` (output-sized, never a driver loop), then ONE
    exchange on the key feeding two ordered window passes (forward fill
    for the previous observation, backward fill for the next — the
    second pass re-sorts but does NOT re-shuffle, partitioning is
    preserved). The union of anchors+grid is what flows through — never
    a range join of events × grid. Grid points outside a key's observed
    span are not emitted (no extrapolation).
    """
    from pyspark.sql import Window

    cents = F.floor(F.col(val_col) * 100.0 + 0.5).cast("long")
    dedup = (
        events.select(
            F.col(key_col).alias("k"),
            F.unix_micros(F.col(ts_col)).alias("t"),
            cents.alias("c"),
            F.col(id_col).alias("i"),
        )
        .groupBy("k", "t")
        .agg(F.expr("max_by(c, i)").alias("c"))
    )
    step = F.lit(step_us).cast("long")
    bounds = dedup.groupBy("k").agg(
        (-F.floor(-F.min("t") / step) * step).cast("long").alias("lo"),
        F.max("t").alias("hi"),
    )
    # A key whose observed span contains no grid point (single off-grid
    # event, or a span that sits entirely inside one step interval) has
    # lo > hi; sequence(lo, hi, step) would throw on such boundaries, so
    # filter those keys out first — they emit nothing, matching the
    # no-extrapolation contract, instead of failing the whole query.
    grid = bounds.where(F.col("lo") <= F.col("hi")).select(
        "k", F.explode(F.expr(f"sequence(lo, hi, {step_us})")).alias("t")
    )
    stacked = dedup.select(
        "k", "t", "c", F.lit(0).alias("is_grid")
    ).unionByName(
        grid.select("k", "t", F.lit(None).cast("long").alias("c"),
                    F.lit(1).alias("is_grid"))
    )
    # Anchors sort before a same-microsecond grid point in BOTH passes
    # (is_grid ascending under t asc and t desc alike), so an exact hit
    # brackets itself: prev_t = next_t = g -> den 0 -> emitted as c/1.
    fwd = Window.partitionBy("k").orderBy("t", "is_grid").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bwd = Window.partitionBy("k").orderBy(
        F.desc("t"), F.asc("is_grid")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    anchored = stacked.select(
        "k",
        "t",
        "is_grid",
        F.last("c", ignorenulls=True).over(fwd).alias("prev_c"),
        F.last(
            F.when(F.col("is_grid") == 0, F.col("t")), ignorenulls=True
        ).over(fwd).alias("prev_t"),
        F.last("c", ignorenulls=True).over(bwd).alias("next_c"),
        F.last(
            F.when(F.col("is_grid") == 0, F.col("t")), ignorenulls=True
        ).over(bwd).alias("next_t"),
    )
    num = F.col("prev_c") * (F.col("next_t") - F.col("t")) + F.col(
        "next_c"
    ) * (F.col("t") - F.col("prev_t"))
    exact_hit = F.col("next_t") == F.col("prev_t")
    return (
        anchored.where(
            (F.col("is_grid") == 1)
            & F.col("prev_t").isNotNull()
            & F.col("next_t").isNotNull()
        )
        .select(
            F.col("k").alias(key_col),
            F.timestamp_micros(F.col("t")).alias("grid_ts"),
            F.col("prev_t").alias("prev_t_us"),
            F.col("next_t").alias("next_t_us"),
            F.when(exact_hit, F.col("prev_c")).otherwise(num)
            .cast("long").alias("interp_num"),
            F.when(exact_hit, F.lit(1).cast("long"))
            .otherwise((F.col("next_t") - F.col("prev_t")).cast("long"))
            .alias("interp_den"),
        )
        .withColumn(
            "interp_value",
            F.col("interp_num").cast("double")
            / F.col("interp_den").cast("double")
            / F.lit(100.0),
        )
    )


def cusum_drift(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    cents: F.Column,
    target_cents: int,
    slack_cents: int,
    h_cents: int,
) -> DataFrame:
    """Two-sided CUSUM drift detection, INTEGER-EXACT and
    window-expressible: the textbook recursions

        S+_i = max(0, S+_{i-1} + (x_i - target) - slack)
        S-_i = max(0, S-_{i-1} - (x_i - target) - slack)

    look sequential, but each unrolls to a prefix-sum identity —
    with P_i = Σ_{j<=i} (d_j - slack),

        S+_i = P_i - min(0, min_{j<=i} P_j)

    (the reset simply re-bases the sum at the running minimum) — so
    both sides are two running aggregates over ONE key-partitioned
    ordered window pass: cumulative sum + cumulative min, all BIGINT,
    replayed exactly by the SQL oracle. Flags rows where either side
    exceeds the decision threshold ``h_cents``.

    Emits every row with (cents, s_plus, s_minus, drift_up, drift_down)
    — the monitoring table; filter on the flags downstream.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*key_cols)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(
        *key_cols, tiebreak_col, ts_col, cents.cast("long").alias("cents")
    )
    d_up = F.col("cents") - F.lit(target_cents) - F.lit(slack_cents)
    d_dn = F.lit(target_cents) - F.col("cents") - F.lit(slack_cents)
    staged = base.select(
        *key_cols,
        tiebreak_col,
        ts_col,
        "cents",
        F.sum(d_up).over(w).alias("_pu"),
        F.sum(d_dn).over(w).alias("_pd"),
    ).select(
        *key_cols,
        tiebreak_col,
        ts_col,
        "cents",
        "_pu",
        "_pd",
        F.min(F.least(F.col("_pu"), F.lit(0))).over(w).alias("_mu"),
        F.min(F.least(F.col("_pd"), F.lit(0))).over(w).alias("_md"),
    )
    return staged.select(
        *key_cols,
        tiebreak_col,
        ts_col,
        "cents",
        (F.col("_pu") - F.col("_mu")).alias("s_plus"),
        (F.col("_pd") - F.col("_md")).alias("s_minus"),
        (F.col("_pu") - F.col("_mu") > h_cents).alias("drift_up"),
        (F.col("_pd") - F.col("_md") > h_cents).alias("drift_down"),
    )


def seasonal_means(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    val_col: str = "value",
    period_expr: str = "hour",
) -> DataFrame:
    """Seasonal-means profile (the means half of classical seasonal
    decomposition): per (key, period bucket — default hour-of-day), the
    bucket's observation count and cent sum plus the seasonal INDEX,
    the bucket mean minus the key's overall mean, emitted as the exact
    BIGINT rational

        idx_num = sum_p * N  -  S * n_p,      idx_den = n_p * N

    (cents; idx = num/den) — no float accumulates, so any engine
    replays it bit-for-bit. A positive index marks the key's hot hours;
    subtracting it deseasonalizes the series (the input to trend/
    anomaly passes that would otherwise flag every rush hour).

    Scale shape: ONE map-side-combined aggregate to the
    (key, bucket) grain, one key-grain roll-up of that result (already
    tiny), broadcast back — the events table is touched once; nothing
    after the first aggregate exceeds keys × period cardinality.
    """
    cents = F.floor(F.col(val_col) * 100.0 + 0.5).cast("long")
    per = events.groupBy(
        F.col(key_col),
        F.expr(f"{period_expr}({ts_col})").cast("long").alias("bucket"),
    ).agg(
        F.count(F.lit(1)).alias("n_p"),
        F.sum(cents).alias("sum_p"),
    )
    tot = per.groupBy(key_col).agg(
        F.sum("n_p").alias("_n"),
        F.sum("sum_p").alias("_s"),
    )
    return (
        per.join(F.broadcast(tot), key_col)
        .select(
            key_col,
            "bucket",
            "n_p",
            "sum_p",
            (F.col("sum_p") * F.col("_n") - F.col("_s") * F.col("n_p"))
            .cast("long")
            .alias("idx_num"),
            (F.col("n_p") * F.col("_n")).cast("long").alias("idx_den"),
        )
        .withColumn(
            "seasonal_idx",
            F.col("idx_num").cast("double")
            / F.col("idx_den").cast("double")
            / F.lit(100.0),
        )
    )


def acf_lags(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    cents: F.Column,
    max_lag: int = 3,
) -> DataFrame:
    """Lagged autocorrelation per key at lags 1..``max_lag`` — the
    Pearson correlation of the pairs (x_t, x_{t+k}) in deterministic
    ``(ts, tiebreak)`` order, the standard seasonality/persistence
    screen that decides a series' resampling step and anomaly window.

    Exactness: all five sufficient statistics (Σx, Σy, Σx², Σy², Σxy)
    are BIGINT sums over scaled-integer values — no float accumulates,
    so any shuffle order and any engine reproduce them bit-for-bit
    (int64-safe while Σx² < 2^63, i.e. ~10^8 rows/key at cents ~ 10^5).
    The derived moments leave integer space through a PINNED double
    chain — covn = n·Σxy − Σx·Σy etc. with every factor an exact int64
    and every conversion/multiply/subtract correctly rounded — so the
    emitted doubles (covn, vxn, vyn, acf) are engine-identical at ANY
    scale and never overflow (the 64× probe threw ARITHMETIC_OVERFLOW
    under ANSI mode when these were BIGINT products). NULL acf when
    either variance is zero (constant run).

    Scale shape: ONE key-partitioned ordered window pass computes every
    lead in the same sort (one exchange of the events), the lag
    stacking is a map-side projection, and the aggregate collapses to
    the (key, lag) grain with map-side combine — nothing after the
    window exceeds keys × max_lag rows.
    """
    if not 1 <= max_lag <= 16:
        raise ValueError("acf_lags: max_lag must be in 1..16")
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    # NULL values are removed from the series BEFORE lagging (a NULL x
    # would be counted in n_pairs but skipped by the sums — review find;
    # the lag adjacency is therefore over the non-null subsequence)
    base = df.select(
        *key_cols,
        F.col(ts_col),
        F.col(tiebreak_col),
        cents.cast("long").alias("_x"),
    ).where(F.col("_x").isNotNull())
    leads = base.select(
        *key_cols,
        F.col("_x"),
        *[
            F.lead("_x", k).over(w).alias(f"_y{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    stack_args = ", ".join(f"{k}L, _y{k}" for k in range(1, max_lag + 1))
    stacked = leads.select(
        *key_cols,
        F.col("_x"),
        F.expr(f"stack({max_lag}, {stack_args}) AS (lag_k, _y)"),
    ).where(F.col("_y").isNotNull())
    agg = stacked.groupBy(*key_cols, "lag_k").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("_x").cast("long").alias("_sx"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).cast("long").alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).cast("long").alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).cast("long").alias("_sxy"),
    )
    # the n·Σ products leave integer space HERE (they overflow int64
    # around 10^6 rows/key with cents ~ 10^5 — the 64x probe proved it
    # under ANSI mode): each factor is an EXACT int64, and int64→double
    # conversion, multiplication and subtraction are all correctly
    # rounded, so the pinned double chain is engine-identical at any
    # scale while never throwing
    def _nd(a: str, b: str, c: str, d: str) -> F.Column:
        return F.col(a).cast("double") * F.col(b).cast("double") - F.col(
            c
        ).cast("double") * F.col(d).cast("double")

    covn = _nd("n_pairs", "_sxy", "_sx", "_sy")
    vxn = _nd("n_pairs", "_sxx", "_sx", "_sx")
    vyn = _nd("n_pairs", "_syy", "_sy", "_sy")
    return agg.select(
        *key_cols,
        "lag_k",
        "n_pairs",
        covn.alias("covn"),
        vxn.alias("vxn"),
        vyn.alias("vyn"),
    ).withColumn(
        "acf",
        F.when(
            (F.col("vxn") == 0) | (F.col("vyn") == 0), F.lit(None)
        ).otherwise(F.col("covn") / F.sqrt(F.col("vxn") * F.col("vyn"))),
    )


def theil_sen_trend(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    val_col: str,
    period_expr: str = "hour",
) -> DataFrame:
    """Theil–Sen robust trend per key over the period profile (default
    hour-of-day): the MEDIAN of all pairwise slopes between period
    bucket means — the estimator that survives 29% outliers where an
    OLS slope is dragged by one bad bucket (Theil 1950 / Sen 1968,
    public-domain statistics).

    Exactness: bucket means stay exact rationals (cent sum, count); the
    pairwise slope between buckets (h1, s1/n1) and (h2, s2/n2) is the
    exact BIGINT fraction

        num = s2·n1 − s1·n2,    den = n1·n2·(h2 − h1)

    and slopes are ORDERED by their correctly-rounded double quotient
    with (num, den) as the total-order tie-break, so the median pick is
    engine- and shuffle-order-independent. The returned slope is the
    pinned IEEE average of the two middle quotients (equal indices when
    the pair count is odd).

    Scale shape: events collapse to the (key, bucket) grain in ONE
    map-side-combined aggregate (the only event-sized pass); the
    pairwise self-join, ordering window and median pick all run on the
    quantized keys × period grain (≤ 24 buckets per key for hours —
    ≤ 276 pairs per key regardless of input size).

    NULL handling (ADVICE r10): rows with NULL value or NULL timestamp
    are excluded BEFORE the bucket aggregate, so a bucket's ``n`` and
    ``s`` always cover the same rows — without the filter ``count(*)``
    would include NULL-valued rows that ``sum`` skips, biasing the
    bucket mean. Keys whose filtered profile has fewer than two period
    buckets are DROPPED by construction (the ``h2 > h1`` self-join
    yields no pairs): a single bucket defines no slope, and emitting a
    NULL-slope row for it would cost a left join back against the key
    spine for a row every consumer filters out anyway.
    """
    cents = F.floor(F.col(val_col) * 100.0 + 0.5).cast("long")
    df = df.where(F.col(val_col).isNotNull() & F.col(ts_col).isNotNull())
    per = df.groupBy(
        *key_cols,
        F.expr(f"{period_expr}({ts_col})").cast("long").alias("_h"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum(cents).cast("long").alias("_s"),
    )
    a = per.select(
        *key_cols,
        F.col("_h").alias("_h1"),
        F.col("_n").alias("_n1"),
        F.col("_s").alias("_s1"),
    )
    b = per.select(
        *key_cols,
        F.col("_h").alias("_h2"),
        F.col("_n").alias("_n2"),
        F.col("_s").alias("_s2"),
    )
    pairs = a.join(b, key_cols).where(F.col("_h2") > F.col("_h1"))
    slopes = pairs.select(
        *key_cols,
        (F.col("_s2") * F.col("_n1") - F.col("_s1") * F.col("_n2"))
        .cast("long")
        .alias("num"),
        (F.col("_n1") * F.col("_n2") * (F.col("_h2") - F.col("_h1")))
        .cast("long")
        .alias("den"),
    ).withColumn("q", F.col("num").cast("double") / F.col("den").cast("double"))
    w_ord = Window.partitionBy(*key_cols).orderBy("q", "num", "den")
    w_all = Window.partitionBy(*key_cols)
    ranked = slopes.select(
        *key_cols,
        "num",
        "den",
        "q",
        F.row_number().over(w_ord).alias("_rn"),
        F.count(F.lit(1)).over(w_all).alias("_c"),
    )
    lo = (F.col("_c") + 1) - ((F.col("_c") + 1) % 2)  # 2*floor((c+1)/2)
    picked = ranked.where(
        (F.col("_rn") * 2 == lo) | (F.col("_rn") * 2 == (F.col("_c") + 2) - ((F.col("_c") + 2) % 2))
    )
    return (
        picked.groupBy(*key_cols)
        .agg(
            F.max("_c").cast("long").alias("n_pairs"),
            F.min("q").alias("_qlo"),
            F.max("q").alias("_qhi"),
            F.min_by(F.col("num"), F.col("_rn")).alias("num_lo"),
            F.min_by(F.col("den"), F.col("_rn")).alias("den_lo"),
            F.max_by(F.col("num"), F.col("_rn")).alias("num_hi"),
            F.max_by(F.col("den"), F.col("_rn")).alias("den_hi"),
        )
        .withColumn(
            "slope_cents_per_period",
            (F.col("_qlo") + F.col("_qhi")) / F.lit(2.0),
        )
        .drop("_qlo", "_qhi")
    )


def rolling_slope(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
    cents: "F.Column",
    window_rows: int = 16,
) -> DataFrame:
    """Rolling OLS trend slope over the trailing ``window_rows`` points
    per key — the local-trend feature a monitoring pipeline attaches to
    every event (vs ``theil_sen_trend``'s one global robust slope).

    INTEGER-EXACT via translation invariance: an OLS slope is invariant
    to shifting x, so the regressor is the key's global row index i
    (row_number over the (ts, tiebreak) total order) instead of a
    window-relative position — which windowed sums cannot see. All four
    sufficient sums (Σi, Σy, Σi², Σiy) are BIGINT window aggregates
    over the trailing frame, and

        num = n·Σiy − Σi·Σy,    den = n·Σi² − (Σi)²

    are exact BIGINTs (den > 0 whenever n ≥ 2 since the i are
    distinct); the emitted slope is one IEEE division. int64 bound:
    n·Σi² ≈ k²·i² keeps every intermediate under 2^63 for per-key
    series up to ~6·10⁸ rows at k = 16 — the documented limit (a
    longer series wants the same DECIMAL(38,0) swap spearman_corr
    made). Rows with fewer than two points in frame (the first row)
    emit NULL slope.

    Scale shape: ONE hash exchange on the key; the row_number window
    and the four framed sums share its sort. NULL value/ts rows are
    excluded before ranking so i is dense over ranked rows.
    """
    base = df.select(
        *key_cols,
        F.col(ts_col),
        F.col(tiebreak_col),
        cents.cast("long").alias("_y"),
    ).where(F.col("_y").isNotNull() & F.col(ts_col).isNotNull())
    w_ord = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    ranked = base.withColumn("_i", F.row_number().over(w_ord).cast("long"))
    w_frame = w_ord.rowsBetween(-(window_rows - 1), Window.currentRow)
    staged = ranked.select(
        *key_cols,
        F.col(tiebreak_col),
        "_i",
        "_y",
        F.count(F.lit(1)).over(w_frame).cast("long").alias("n_win"),
        F.sum("_i").over(w_frame).cast("long").alias("_si"),
        F.sum("_y").over(w_frame).cast("long").alias("_sy"),
        F.sum(F.col("_i") * F.col("_i")).over(w_frame).cast("long").alias("_sii"),
        F.sum(F.col("_i") * F.col("_y")).over(w_frame).cast("long").alias("_siy"),
    )
    num = (F.col("n_win") * F.col("_siy") - F.col("_si") * F.col("_sy")).cast(
        "long"
    )
    den = (F.col("n_win") * F.col("_sii") - F.col("_si") * F.col("_si")).cast(
        "long"
    )
    return staged.select(
        *key_cols,
        F.col(tiebreak_col),
        F.col("n_win"),
        num.alias("num"),
        den.alias("den"),
        F.when(F.col("n_win") < 2, F.lit(None))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("slope"),
    )


def holt_linear_smooth(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    val_col: str,
    alpha_num: int = 1,
    alpha_den: int = 4,
    beta_num: int = 1,
    beta_den: int = 2,
) -> DataFrame:
    """Holt's linear-trend double exponential smoothing per key (Holt
    1957) — the forecasting step up from :func:`ewma_smooth` when the
    series has drift an EWMA lags behind:

        s₁ = x₁, b₁ = 0
        sₜ = α·xₜ + (1−α)(sₜ₋₁ + bₜ₋₁)
        bₜ = β(sₜ − sₜ₋₁) + (1−β)bₜ₋₁

    α and β restricted to exact binary fractions (defaults ¼, ½), so
    every step is a fixed sequence of correctly-rounded IEEE doubles —
    the fold replays bit-identically in any engine. Emits
    ``(key_cols…, n_points, level, trend, forecast_1)`` with
    forecast_1 = level + trend (the 1-step-ahead forecast a metrics
    pipeline alerts against).

    The fold state is a 2-element DOUBLE ARRAY, not a struct: DuckDB
    1.0's ``list_reduce`` aliases the accumulator struct field-by-field
    during ``struct_pack`` evaluation (the trend expression saw the
    ALREADY-UPDATED level — measured, off by the aliased term), while a
    ``list_value`` accumulator evaluates both elements against the old
    state; the engine mirrors the array form so both sides pin the same
    sequence.

    Scale shape: identical to ``ewma_smooth`` — one hash aggregate,
    series gathered + sorted in-row, folded by ``F.aggregate``; per-key
    series length is the only memory bound.
    """
    for num, den, nm in (
        (alpha_num, alpha_den, "alpha"),
        (beta_num, beta_den, "beta"),
    ):
        if den & (den - 1) or not (0 < num < den):
            raise ValueError(
                f"holt_linear_smooth: {nm} must be a proper exact-binary "
                f"fraction (got {num}/{den})"
            )
    a = alpha_num / alpha_den
    bt = beta_num / beta_den
    series = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col(val_col).isNotNull(),
                    F.struct(F.col(order_col).alias("o"),
                             F.col(val_col).alias("v")),
                )
            )
        ),
        lambda s: s["v"].cast("double"),
    )

    def step(acc, x):
        snew = F.lit(a) * x + F.lit(1.0 - a) * (
            F.get(acc, 0) + F.get(acc, 1)
        )
        bnew = F.lit(bt) * (snew - F.get(acc, 0)) + F.lit(1.0 - bt) * F.get(
            acc, 1
        )
        return F.array(snew, bnew)

    st = F.aggregate(
        F.slice(series, 2, F.greatest(F.size(series) - 1, F.lit(0))),
        F.array(F.get(series, 0), F.lit(0.0)),
        step,
    )
    return df.groupBy(*key_cols).agg(
        F.count(val_col).alias("n_points"),
        F.get(st, 0).alias("level"),
        F.get(st, 1).alias("trend"),
        (F.get(st, 0) + F.get(st, 1)).alias("forecast_1"),
    )
