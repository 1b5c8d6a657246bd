"""Temporal join operators (beyond-reference).

The reference has no time-series joins (SURVEY §2.3 "not present"); a
training-data/events pipeline needs them. The as-of join is implemented as
a union + running-last window — one shuffle on (key, time), no range
explosion: a Spark-native restatement of the sort-merge as-of algorithm
(DuckDB/kdb ASOF JOIN, pandas merge_asof).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dedupe_right_per_ts(
    right: DataFrame, on: str, ts_col: str, tiebreak_col: str | None
) -> DataFrame:
    """Reduce the right side to ONE row per (key, ts), picking the row
    with the greatest ``tiebreak_col`` — the deterministic intra-ts
    winner every as-of direction needs when the right side can carry
    duplicate timestamps (without it, the carry window's tie among
    equal-ts right rows resolves to whichever sorted last under shuffle
    order, breaking bit-reproducibility). One extra window pass on the
    same (key, ts) sort the join itself needs. No-op when
    ``tiebreak_col`` is None (caller asserts unique (key, ts)).

    Determinism (ADVICE r9): if two right rows share (key, ts,
    tiebreak) but differ in payload, a tiebreak-only sort would quietly
    reintroduce shuffle-order dependence — so the window's order is
    extended with every remaining ORDERABLE payload column (descending;
    maps and other unorderable types are skipped, and if duplicates
    differ ONLY in an unorderable column the winner is still
    arbitrary — the one case no sort can fix). ``tiebreak_col`` being
    unique per (key, ts) — true for ``event_id`` everywhere in the
    suite — short-circuits all of this at zero cost."""
    if tiebreak_col is None:
        return right
    from pyspark.sql.types import AtomicType

    secondary = [
        F.desc(f.name)
        for f in right.schema.fields
        if f.name not in (on, ts_col, tiebreak_col)
        and isinstance(f.dataType, AtomicType)
    ]
    w = Window.partitionBy(on, ts_col).orderBy(
        F.desc(tiebreak_col), *secondary
    )
    return (
        right.withColumn("_ts_rn", F.row_number().over(w))
        .filter(F.col("_ts_rn") == 1)
        .drop("_ts_rn")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_us: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """For every left row, attach the newest right row with
    ``right.ts <= left.ts`` and the same ``on`` key (backward as-of join).

    Shape: tag both inputs, union, then per key in time order carry the
    last-seen right payload forward (``last(..., ignorenulls)`` over an
    unbounded-preceding window). Ties (equal ts) resolve to the right row —
    matching ``ts <= ts`` inclusive semantics. One shuffle, linear state,
    no per-row range scan — survives arbitrarily large inputs because the
    window never looks back more than the running partition.

    ``tolerance_us``: pandas ``merge_asof(tolerance=)`` semantics — a
    match further than this many microseconds behind the left row is
    rejected (the payload comes back null), applied as a pure projection
    after the carry, so the plan shape is unchanged.

    DETERMINISM PRECONDITION: the right side must have at most one row
    per (``on``, ``ts_col``) — otherwise which equal-ts payload the carry
    picks depends on shuffle order. Pass ``tiebreak_col`` to have the
    operator enforce it (greatest tiebreak wins, one deterministic
    window pass); leave it None only when the caller guarantees
    uniqueness.
    """
    right = _dedupe_right_per_ts(right, on, ts_col, tiebreak_col)
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, ts_col)
    ]
    payload = F.struct(
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
        *[F.col(c) for c in right_cols],
    )
    l_tag = left.withColumn("_payload", F.lit(None).cast(
        right.select(payload.alias("p")).schema["p"].dataType
    )).withColumn("_side", F.lit(1))
    r_tag = right.select(
        F.col(on),
        F.col(ts_col),
        payload.alias("_payload"),
        F.lit(0).alias("_side"),
    )
    # align schemas: right rows carry nulls for left-only columns
    for c in left.columns:
        if c not in (on, ts_col):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r_tag = r_tag.select(*[c for c in l_tag.columns])

    u = l_tag.unionByName(r_tag)
    # right rows sort before left rows at equal ts (_side 0 < 1) → inclusive
    w = (
        Window.partitionBy(on)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).drop("_payload", "_side")
    if tolerance_us is not None:
        gap = F.unix_micros(F.col(ts_col)) - F.unix_micros(
            F.col(f"_match.{ts_col}{suffix}")
        )
        out = out.withColumn(
            "_match", F.when(gap <= int(tolerance_us), F.col("_match"))
        )
    flat = [F.col(c) for c in left.columns] + [
        F.col(f"_match.{f}").alias(f)
        for f in [f"{ts_col}{suffix}", *right_cols]
    ]
    return out.select(*flat)


def cdc_apply(
    changes: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    op_col: str = "op",
    tiebreak_col: str | None = None,
    delete_op: str = "delete",
) -> DataFrame:
    """Materialize a changelog into its final snapshot (lakehouse MERGE /
    CDC-apply semantics): per key, the newest change wins; a winning
    ``delete_op`` removes the key from the snapshot entirely.

    Ordering is ``(ts_col, tiebreak_col)`` descending — the tiebreak makes
    the winner deterministic when a key changes twice in one timestamp
    (required for an exact oracle and for exactly-once replays).

    Shape: one window shuffle on the key — the standard distributed
    upsert-compaction. At 100 TB this is the same plan as latest-per-key
    (W1); deletes cost nothing extra because they are filtered AFTER the
    per-key reduction (a delete row still wins its key, then drops).
    """
    order = [F.desc(ts_col)] + ([F.desc(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    return (
        changes.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .drop("_rn")
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type-2 build: collapse a change stream
    into validity intervals per key — (key, value, valid_from, valid_to,
    is_current), one row per RUN of equal consecutive values (the
    dimension-history table a warehouse MERGE maintains incrementally;
    here derived in one pass from the raw event log).

    Ordering is (ts, tiebreak) so same-timestamp changes have a
    deterministic sequence (oracle requirement). Consecutive duplicates
    extend the current interval instead of opening a new one; NULL
    attribute values form their own runs (null-safe comparison), so a
    NULL period is never silently attributed to the preceding value.

    Shape: two windows over the SAME (key, order) partitioning — Catalyst
    plans one Exchange + one sort for both; nothing global, nothing on
    the driver.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    # null-safe change detection: lag() yields NULL both for "no previous
    # row" and "previous value was NULL", so a plain != would drop
    # transitions INTO a NULL value (the row filters to NULL) and a plain
    # eqNullSafe would drop a key's FIRST row when its value is NULL —
    # row_number disambiguates the two cases
    changes = (
        df.withColumn("_prev", F.lag(attr_col).over(w))
        .withColumn("_rn", F.row_number().over(w))
        .filter(
            (F.col("_rn") == 1)
            | ~F.col("_prev").eqNullSafe(F.col(attr_col))
        )
    )
    w2 = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    return (
        changes.withColumn("valid_to", F.lead(ts_col).over(w2))
        .select(
            F.col(key_col),
            F.col(attr_col).alias("value"),
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def late_data_drop(
    events: DataFrame,
    delay: str = "1 hour",
    arrival_col: str = "event_id",
    ts_col: str = "ts",
    range_size: int = 1024,
    carry_cols: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Batch twin of Structured Streaming's watermark drop rule: an event
    is LATE iff its event time is older than (max event time seen at any
    earlier ARRIVAL) − delay — exactly what `withWatermark(ts, delay)`
    discards. Emits every event with its verdict: (event_id, user_id, ts,
    is_late).

    The watermark is a GLOBAL running max over arrival order; a naive
    window over one global ordering is a single-partition sort. Scalable
    two-phase shape instead: per-range running max (distributed windows
    over ``arrival div range_size``) + a metadata-sized prefix-max over
    the per-range maxima (#ranges rows) broadcast back — the standard
    distributed prefix-aggregate decomposition. First-arrival events
    (no predecessor) are never late, via an epoch floor instead of
    null-propagating max.
    """
    epoch = F.lit("1900-01-01 00:00:00").cast("timestamp")
    rng = events.withColumn(
        "_rng", F.expr(f"{arrival_col} div {range_size}")
    )
    w_local = (
        Window.partitionBy("_rng")
        .orderBy(arrival_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = rng.withColumn(
        "_local_max", F.max(ts_col).over(w_local)
    )
    per_range = rng.groupBy("_rng").agg(F.max(ts_col).alias("_rng_max"))
    w_prefix = (
        Window.orderBy("_rng").rowsBetween(Window.unboundedPreceding, -1)
    )
    prefixes = per_range.withColumn(
        "_prefix_max", F.max("_rng_max").over(w_prefix)
    ).select("_rng", "_prefix_max")
    seen_max = F.greatest(
        F.coalesce(F.col("_local_max"), epoch),
        F.coalesce(F.col("_prefix_max"), epoch),
    )
    out = local.join(F.broadcast(prefixes), "_rng").withColumn(
        "is_late",
        F.col(ts_col) < seen_max - F.expr(f"INTERVAL {delay}"),
    )
    return out.select(arrival_col, *carry_cols, ts_col, "is_late")


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    key_col: str,
    bucket_seconds: int = 1800,
) -> DataFrame:
    """Interval × interval overlap join (strict overlap: ``a.s < b.e AND
    b.s < a.e``) — the temporal join a naive formulation turns into a
    per-key cross join. Both sides carry (id, key, s, e timestamps).

    Scale shape: time is tiled into ``bucket_seconds`` buckets; every
    interval registers in each bucket it touches (a bounded explode —
    ⌈len/bucket⌉+1 rows), the join runs as a plain EQUI-join on
    (key, bucket) with the overlap predicate as a post-filter, and
    double-matched pairs (overlap spanning a bucket border) collapse
    with one distinct. Candidate count is bucket-local — the standard
    interval-bucketing discipline; pick ``bucket_seconds`` ≈ the typical
    interval length (correctness never depends on it).

    Returns (key, a_id, b_id, overlap_s:int, total seconds of overlap).
    """
    bw = bucket_seconds * 1_000_000  # micros

    def prep(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col("id").alias(f"{side}_id"),
            F.col(key_col),
            F.unix_micros("s").alias(f"{side}_s"),
            F.unix_micros("e").alias(f"{side}_e"),
        ).withColumn(
            "bucket",
            F.explode(
                F.sequence(
                    F.expr(f"{side}_s div {bw}"), F.expr(f"{side}_e div {bw}")
                )
            ),
        )

    pa = prep(a, "a")
    pb = prep(b, "b")
    overlap = (F.col("b_s") < F.col("a_e")) & (F.col("a_s") < F.col("b_e"))
    pairs = (
        pa.join(pb, [key_col, "bucket"])
        .where(overlap)
        .select(
            key_col,
            "a_id",
            "b_id",
            F.expr(
                "(least(a_e, b_e) - greatest(a_s, b_s)) div 1000000"
            ).alias("overlap_s"),
        )
        .distinct()
    )
    return pairs


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_us: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """For every left row, attach the EARLIEST right row with
    ``right.ts >= left.ts`` and the same ``on`` key — the forward as-of
    join (time-to-next-event / conversion-lag lookups; the backward
    variant is ``asof_join``).

    Same shape as the backward join with the scan reversed: union both
    sides, order ``(ts DESC, side)`` per key (right rows first at equal
    ts → inclusive >=), carry the last-seen right payload — which,
    scanning backward in time, is the nearest FUTURE right row. One
    shuffle, linear state, no range explosion.

    ``tolerance_us``: reject matches further than this many microseconds
    AHEAD of the left row (null payload) — pandas
    ``merge_asof(tolerance=)``. ``tiebreak_col`` / determinism
    precondition: same as ``asof_join`` — at most one right row per
    (``on``, ``ts_col``), enforced (greatest tiebreak wins) when
    ``tiebreak_col`` is given.
    """
    right = _dedupe_right_per_ts(right, on, ts_col, tiebreak_col)
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, ts_col)
    ]
    payload = F.struct(
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
        *[F.col(c) for c in right_cols],
    )
    l_tag = left.withColumn("_payload", F.lit(None).cast(
        right.select(payload.alias("p")).schema["p"].dataType
    )).withColumn("_side", F.lit(1))
    r_tag = right.select(
        F.col(on),
        F.col(ts_col),
        payload.alias("_payload"),
        F.lit(0).alias("_side"),
    )
    for c in left.columns:
        if c not in (on, ts_col):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r_tag = r_tag.select(*[c for c in l_tag.columns])

    u = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(on)
        .orderBy(F.desc(ts_col), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "_match", F.last("_payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("_side") == 1).drop("_payload", "_side")
    if tolerance_us is not None:
        gap = F.unix_micros(
            F.col(f"_match.{ts_col}{suffix}")
        ) - F.unix_micros(F.col(ts_col))
        out = out.withColumn(
            "_match", F.when(gap <= int(tolerance_us), F.col("_match"))
        )
    flat = [F.col(c) for c in left.columns] + [
        F.col(f"_match.{f}").alias(f)
        for f in [f"{ts_col}{suffix}", *right_cols]
    ]
    return out.select(*flat)


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance_us: int | None = None,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """For every left row, the right row NEAREST in time (either
    direction), same key — pandas ``merge_asof(direction='nearest')``
    semantics, ties (equidistant before/after) resolved to the EARLIER
    right row (deterministic, and what 'state at that moment' usually
    wants).

    Built as the backward and forward scans over the SAME union input —
    both window passes ride one key exchange (the second pass re-sorts,
    partitioning is preserved), then a projection picks the nearer
    match per row. No range join, linear state.

    ``tolerance_us``: each direction's candidate is disqualified when
    its |gap| exceeds the bound BEFORE the nearer-pick, so a
    beyond-tolerance backward match cannot shadow an in-tolerance
    forward one. ``tiebreak_col`` / determinism precondition: same as
    ``asof_join`` — at most one right row per (``on``, ``ts_col``),
    enforced (greatest tiebreak wins) when ``tiebreak_col`` is given.
    """
    right = _dedupe_right_per_ts(right, on, ts_col, tiebreak_col)
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, ts_col)
    ]
    payload = F.struct(
        F.col(ts_col).alias(f"{ts_col}{suffix}"),
        *[F.col(c) for c in right_cols],
    )
    l_tag = left.withColumn("_payload", F.lit(None).cast(
        right.select(payload.alias("p")).schema["p"].dataType
    )).withColumn("_side", F.lit(1))
    r_tag = right.select(
        F.col(on),
        F.col(ts_col),
        payload.alias("_payload"),
        F.lit(0).alias("_side"),
    )
    for c in left.columns:
        if c not in (on, ts_col):
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r_tag = r_tag.select(*[c for c in l_tag.columns])

    u = l_tag.unionByName(r_tag)
    wb = (
        Window.partitionBy(on)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(on)
        .orderBy(F.desc(ts_col), F.asc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn(
        "_back", F.last("_payload", ignorenulls=True).over(wb)
    ).withColumn(
        "_fwd", F.last("_payload", ignorenulls=True).over(wf)
    )
    t_us = F.unix_micros(F.col(ts_col))
    back_d = t_us - F.unix_micros(F.col(f"_back.{ts_col}{suffix}"))
    fwd_d = F.unix_micros(F.col(f"_fwd.{ts_col}{suffix}")) - t_us
    if tolerance_us is not None:
        carried = carried.withColumn(
            "_back", F.when(back_d <= int(tolerance_us), F.col("_back"))
        ).withColumn(
            "_fwd", F.when(fwd_d <= int(tolerance_us), F.col("_fwd"))
        )
    nearer = (
        F.when(F.col("_back").isNull(), F.col("_fwd"))
        .when(F.col("_fwd").isNull(), F.col("_back"))
        # tie -> earlier (backward) match
        .when(back_d <= fwd_d, F.col("_back"))
        .otherwise(F.col("_fwd"))
    )
    out = (
        carried.filter(F.col("_side") == 1)
        .withColumn("_match", nearer)
        .drop("_payload", "_side", "_back", "_fwd")
    )
    flat = [F.col(c) for c in left.columns] + [
        F.col(f"_match.{f}").alias(f)
        for f in [f"{ts_col}{suffix}", *right_cols]
    ]
    return out.select(*flat)
