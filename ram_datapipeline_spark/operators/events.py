"""Event/user analytics operators (beyond-reference north star).

The product-analytics battery a training-data platform runs over its
telemetry events table: cohort retention, engagement stickiness,
conversion attribution. Everything is DataFrame-declarative, exact
integer arithmetic end to end (epoch-anchored 7-day / 1-day buckets via
BIGINT division — no calendar functions, whose week-start and DST rules
differ between engines), so every report replays bit-for-bit in ANSI
SQL.

Scale shapes are uniform: events collapse to a (user, bucket) or
(user, conversion) grain in one map-side-combined aggregate or one
user-keyed window; everything after runs on that grain. No operator
here ever sorts or windows the raw event stream globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

US_PER_DAY = 86_400_000_000
US_PER_WEEK = 7 * US_PER_DAY


def retention_cohorts(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Classic cohort retention matrix: users grouped by their FIRST
    active week (epoch-anchored 7-day buckets — integer µs division,
    identical in every engine), counted in each later week they return.

    Output: (cohort_week, offset_weeks, n_users) — cohort_week is the
    epoch week index of first activity, offset_weeks ≥ 0, n_users the
    DISTINCT returning users. Row (c, 0, n) is the cohort's size.

    Scale shape: one user-grain min aggregate (map-side combined), one
    user-keyed join back (both sides hash-partitioned on the user —
    co-located), one distinct on the (cohort, offset, user) grain, one
    count. The matrix is weeks² rows; the user grain is the largest
    thing any exchange carries. NULL timestamps are excluded (they
    place a user in no week).
    """
    # NULL timestamps place a user in no week; NULL users would fall
    # out of the inner join back anyway — filter both explicitly so the
    # drop is a contract, not a join artifact (r11 self-review).
    ev = (
        events.where(
            F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("_u"),
            (F.unix_micros(F.col(ts_col)) / F.lit(US_PER_WEEK))
            .cast("long")
            .alias("_w"),
        )
    )
    first = ev.groupBy("_u").agg(F.min("_w").alias("cohort_week"))
    return (
        ev.join(first, "_u")
        .select(
            "cohort_week",
            (F.col("_w") - F.col("cohort_week")).alias("offset_weeks"),
            "_u",
        )
        .distinct()
        .groupBy("cohort_week", "offset_weeks")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def stickiness_ratio(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly engagement stickiness (the DAU/WAU product metric):
    per epoch week, the weekly-active user count, the sum of the seven
    daily-active counts, and their ratio in exact ppm
    (``sum_dau · 1e6 DIV (7 · wau)`` — BIGINT division, so the report
    is engine-identical; a ratio of 1e6 means every weekly-active user
    was active all seven days).

    Scale shape: events collapse to the distinct (user, day) grain in
    one aggregate; the day grain rolls up to weeks; the distinct
    (user, week) grain feeds WAU. Two modest exchanges, both on
    user-bucket grains, never the raw stream.
    """
    # NULL users are excluded EXPLICITLY (r11 self-review): a NULL user
    # would count in the row-count sum_dau but fall out of the
    # count-DISTINCT wau in both engines — an inconsistent ratio, and
    # the kind of engine-default divergence the NULL-guard ADVICE
    # family exists to prevent.
    ud = (
        events.where(
            F.col(ts_col).isNotNull() & F.col(user_col).isNotNull()
        )
        .select(
            F.col(user_col).alias("_u"),
            (F.unix_micros(F.col(ts_col)) / F.lit(US_PER_DAY))
            .cast("long")
            .alias("_d"),
        )
        .distinct()
    )
    ud = ud.withColumn("week", (F.col("_d") / F.lit(7)).cast("long"))
    # one aggregate carries both counts (count + count-distinct expand
    # share the single pass over the (user, day) grain — two separate
    # groupBys re-derived that grain per metric, r11 plan audit)
    return ud.groupBy("week").agg(
        F.countDistinct("_u").cast("long").alias("wau"),
        F.count(F.lit(1)).cast("long").alias("sum_dau"),
    ).select(
        "week",
        "wau",
        "sum_dau",
        F.expr("sum_dau * 1000000 DIV (7 * wau)").alias("stickiness_ppm"),
    )


def touch_attribution(
    events: DataFrame,
    conversion_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    channel_col: str = "event_type",
) -> DataFrame:
    """First-touch / last-touch conversion attribution: every
    ``conversion_type`` event credits (a) the channel of the user's
    FIRST non-conversion event STRICTLY BEFORE the conversion and
    (b) the LAST non-conversion channel strictly before it. Output per
    channel: (channel, first_touch, last_touch) conversion counts.

    Conversions with no prior non-conversion event (including a user
    whose first touch comes only AFTER the conversion) attribute to
    the channel ``'(none)'`` under both models — emitted, not dropped,
    so the two columns both sum to the total conversion count.

    Scale shape: ONE user-keyed ordered window pass computes both
    carries — ``first(channel) IGNORE NULLS`` and ``last(channel)
    IGNORE NULLS`` over the SAME strict-past frame (one exchange, one
    sort; the strict frame is equivalent to a full-past frame here
    because the current row's channel expression is NULL on conversion
    rows anyway), then one count on the channel grain. The
    (ts, tiebreak) total order makes both carries deterministic under
    shuffle.
    """
    w_past = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, tiebreak_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ch = F.when(
        F.col(channel_col) != F.lit(conversion_type), F.col(channel_col)
    )
    staged = events.where(F.col(ts_col).isNotNull()).select(
        F.col(user_col),
        F.col(ts_col),
        F.col(tiebreak_col),
        F.col(channel_col),
        F.first(ch, ignorenulls=True).over(w_past).alias("_ft"),
        F.last(ch, ignorenulls=True).over(w_past).alias("_lt"),
    )
    conv = staged.where(F.col(channel_col) == F.lit(conversion_type)).select(
        F.coalesce(F.col("_ft"), F.lit("(none)")).alias("_ftc"),
        F.coalesce(F.col("_lt"), F.lit("(none)")).alias("_ltc"),
    )
    # unpivot the two models into one (model, channel) stream so BOTH
    # counts ride a single pass over the window output — two separate
    # groupBys re-executed the user-keyed window per model (r11 plan
    # audit); now there is exactly one window pass and one channel
    # exchange, full-join-free.
    long = conv.select(
        F.explode(
            F.array(
                F.struct(F.lit("f").alias("_m"), F.col("_ftc").alias("ch")),
                F.struct(F.lit("l").alias("_m"), F.col("_ltc").alias("ch")),
            )
        ).alias("_p")
    ).select(F.col("_p._m").alias("_m"), F.col("_p.ch").alias("channel"))
    return long.groupBy("channel").agg(
        F.sum(F.when(F.col("_m") == "f", 1).otherwise(0))
        .cast("long")
        .alias("first_touch"),
        F.sum(F.when(F.col("_m") == "l", 1).otherwise(0))
        .cast("long")
        .alias("last_touch"),
    )
