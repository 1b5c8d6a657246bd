"""Behavior tests for the time-series/changelog operators: gap fill +
LOCF semantics and CDC delete-marker semantics on hand-built inputs
(oracle parity at fixture scale is covered by test_oracle_parity)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from ram_datapipeline_spark.operators.temporal import cdc_apply
from ram_datapipeline_spark.operators.timeseries import resample_gapfill_locf


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_gapfill_locf_semantics(spark):
    events = spark.createDataFrame(
        [
            (1, _ts(0, 10), 10.0, 100),
            (1, _ts(0, 20), 11.0, 101),  # same bucket, newer → bucket value
            (1, _ts(3, 0), 12.0, 102),   # 2-hour gap before this
            (2, _ts(2, 30), 99.0, 103),  # second key starts late
        ],
        "user_id long, ts timestamp, value double, event_id long",
    )
    out = resample_gapfill_locf(events).orderBy("user_id", "bucket").collect()
    # global range is hours 0..3 → 4 buckets per key, both keys densified
    assert len(out) == 8
    u1 = [r for r in out if r.user_id == 1]
    assert [r.n_events for r in u1] == [2, 0, 0, 1]
    # bucket 0 keeps the NEWEST event's value; gaps carry it forward
    assert [r.locf_value for r in u1] == [11.0, 11.0, 11.0, 12.0]
    u2 = [r for r in out if r.user_id == 2]
    # no forward leakage: NULL until the key's first event
    assert [r.locf_value for r in u2] == [None, None, 99.0, 99.0]
    assert [r.n_events for r in u2] == [0, 0, 1, 0]


def test_cdc_apply_delete_wins_and_reinsert(spark):
    changes = spark.createDataFrame(
        [
            (1, _ts(0), 1, "upsert", 10.0),
            (1, _ts(1), 2, "delete", None),   # newest for key 1 → key gone
            (2, _ts(0), 3, "delete", None),
            (2, _ts(1), 4, "upsert", 20.0),   # re-insert after delete → kept
            (3, _ts(5), 5, "upsert", 30.0),
            (3, _ts(5), 6, "delete", None),   # same ts: event_id breaks tie
        ],
        "user_id long, ts timestamp, event_id long, op string, value double",
    )
    out = cdc_apply(
        changes, key_col="user_id", ts_col="ts", op_col="op",
        tiebreak_col="event_id",
    )
    rows = {r.user_id: r for r in out.collect()}
    assert 1 not in rows
    assert rows[2].value == 20.0
    assert 3 not in rows  # higher event_id delete wins the tie


def test_cdc_apply_plan_is_single_window_shuffle(spark):
    changes = spark.range(100).select(
        (F.col("id") % 10).alias("k"),
        F.timestamp_seconds(F.col("id")).alias("ts"),
        F.col("id").alias("event_id"),
        F.lit("upsert").alias("op"),
    )
    plan = cdc_apply(
        changes, key_col="k", ts_col="ts", op_col="op", tiebreak_col="event_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_intervals_runs_and_tiebreak(spark):
    """Consecutive equal values merge into one interval; same-timestamp
    changes order by event_id; last interval is open/current."""
    from ram_datapipeline_spark.operators.temporal import scd2_intervals

    rows = [
        # user 1: a, a (merge), b, then same-ts flip ordered by event_id
        (1, "a", _ts(1), 10),
        (1, "a", _ts(2), 11),
        (1, "b", _ts(3), 12),
        (1, "c", _ts(4), 13),
        (1, "d", _ts(4), 14),  # same ts as 13 → ordered after by event_id
        # user 2: single value
        (2, "x", _ts(5), 20),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    got = {
        (r["user_id"], r["value"]): (
            r["valid_from"], r["valid_to"], r["is_current"]
        )
        for r in scd2_intervals(df).collect()
    }
    assert got[(1, "a")] == (_ts(1), _ts(3), False)
    assert got[(1, "b")] == (_ts(3), _ts(4), False)
    assert got[(1, "c")] == (_ts(4), _ts(4), False)
    assert got[(1, "d")] == (_ts(4), None, True)
    assert got[(2, "x")] == (_ts(5), None, True)
    assert len(got) == 5


def test_late_data_drop_matches_naive_global_window(spark):
    """The two-phase range decomposition must equal the naive global
    cumulative max — including events that are late only because of a
    maximum seen in an EARLIER range."""
    from ram_datapipeline_spark.operators.temporal import late_data_drop

    rows = []
    # arrival 0..9 in range 0 (range_size=8 splits at 8): a spike at
    # arrival 3 (ts 10:00) makes later small-ts events late, including
    # arrivals 8, 9 which sit in range 1 and need the prefix max.
    seq = [
        (0, _ts(1)), (1, _ts(2)), (2, _ts(2, 30)), (3, _ts(10)),
        (4, _ts(3)), (5, _ts(9, 30)), (6, _ts(9)), (7, _ts(8, 59)),
        (8, _ts(8, 30)), (9, _ts(9, 1)),
    ]
    rows = [(eid, 1, ts) for eid, ts in seq]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r["event_id"]: r["is_late"]
        for r in late_data_drop(df, delay="1 hour", range_size=8).collect()
    }
    # naive reference
    seen = None
    want = {}
    for eid, ts in seq:
        want[eid] = seen is not None and ts < seen - dt.timedelta(hours=1)
        seen = ts if seen is None else max(seen, ts)
    assert got == want
    assert want[3] is False and want[4] is True and want[8] is True
    assert want[9] is False  # 9:01 ≥ 10:00 − 1h → on time


def test_interval_overlap_bucketing_complete(spark):
    """Bucketized overlap join equals the naive per-key cross-join filter,
    including pairs whose overlap spans a bucket border and intervals
    longer than one bucket."""
    from ram_datapipeline_spark.operators.temporal import interval_overlap_join

    A = [
        (1, 7, _ts(1, 0), _ts(1, 40)),    # spans 30-min buckets
        (2, 7, _ts(2, 50), _ts(3, 5)),    # crosses a border
        (3, 8, _ts(1, 0), _ts(5, 0)),     # 4-hour interval >> bucket
    ]
    B = [
        (10, 7, _ts(1, 35), _ts(1, 50)),  # overlaps a1 by 5 min
        (11, 7, _ts(3, 0), _ts(3, 10)),   # overlaps a2 by 5 min
        (12, 7, _ts(4, 0), _ts(4, 1)),    # no same-key interval there
        (13, 8, _ts(4, 59), _ts(6, 0)),   # overlaps a3 by 1 min
        (14, 9, _ts(1, 0), _ts(2, 0)),    # key with no A intervals
    ]
    a = spark.createDataFrame(A, "id long, k long, s timestamp, e timestamp")
    b = spark.createDataFrame(B, "id long, k long, s timestamp, e timestamp")
    got = {
        (r["a_id"], r["b_id"]): r["overlap_s"]
        for r in interval_overlap_join(a, b, "k", bucket_seconds=1800).collect()
    }
    assert got == {(1, 10): 300, (2, 11): 300, (3, 13): 60}


def test_scd2_null_values_form_their_own_runs(spark):
    """Transitions into and out of NULL values must open/close intervals
    (null-safe comparison), including a key whose FIRST value is NULL."""
    from ram_datapipeline_spark.operators.temporal import scd2_intervals

    rows = [
        (1, "a", _ts(1), 1),
        (1, None, _ts(2), 2),
        (1, None, _ts(3), 3),   # merges into the NULL run
        (1, "b", _ts(4), 4),
        (2, None, _ts(5), 5),   # first value NULL
        (2, "x", _ts(6), 6),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long"
    )
    got = {
        (r["user_id"], r["value"]): (r["valid_from"], r["valid_to"])
        for r in scd2_intervals(df).collect()
    }
    assert got[(1, "a")] == (_ts(1), _ts(2))
    assert got[(1, None)] == (_ts(2), _ts(4))
    assert got[(1, "b")] == (_ts(4), None)
    assert got[(2, None)] == (_ts(5), _ts(6))
    assert got[(2, "x")] == (_ts(6), None)
    assert len(got) == 5


def test_ewma_smooth_null_values_and_empty_series(spark):
    """NULL values are excluded from the fold AND from n_points (so the
    two agree on mixed-null keys), and an all-NULL key yields a row with
    n_points=0 / ewma NULL instead of a negative-length slice error."""
    from ram_datapipeline_spark.operators.timeseries import ewma_smooth

    df = spark.createDataFrame(
        [
            ("a", 1, 4.0), ("a", 2, None), ("a", 3, 8.0),
            ("b", 1, None), ("b", 2, None),
            ("c", 5, 2.0),
        ],
        "k string, o long, v double",
    )
    got = {
        r["k"]: (r["n_points"], r["ewma"])
        for r in ewma_smooth(df, ["k"], "o", "v").collect()
    }
    # a: fold over [4.0, 8.0] -> 0.5*4 + 0.5*8 = 6.0 (null dropped)
    assert got["a"] == (2, 6.0)
    # b: all-null -> empty series, no crash, null ewma
    assert got["b"] == (0, None)
    # c: single point -> the point itself
    assert got["c"] == (1, 2.0)


def test_time_weighted_avg_hand_case_and_single_point_key(spark):
    """Hand-checked TWAP: value 10.00 held 3 s then 20.00 held 1 s →
    (10·3 + 20·1)/4 = 12.50; the final observation holds nothing; a
    single-observation key has no interval and is absent; equal
    timestamps are ordered by the tiebreak column."""
    from ram_datapipeline_spark.operators.timeseries import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(s):
        return t0 + dt.timedelta(seconds=s)

    rows = [
        ("a", at(0), 10.00, 1),
        ("a", at(3), 20.00, 2),
        ("a", at(4), 99.00, 3),     # last point: holds nothing
        ("b", at(0), 7.00, 4),      # single point -> absent
        ("c", at(0), 1.00, 5),      # tie on ts: event 5 then 6 (1 µs? no —
        ("c", at(0), 3.00, 6),      # zero-length hold contributes 0)
        ("c", at(2), 5.00, 7),
    ]
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, value double, event_id long"
    )
    got = {
        r["k"]: r
        for r in time_weighted_avg(
            df, ["k"], ts_col="ts", val_col="value", tiebreak_col="event_id"
        ).collect()
    }
    assert set(got) == {"a", "c"}
    assert got["a"]["n_intervals"] == 2
    assert got["a"]["total_us"] == 4_000_000
    assert got["a"]["twap"] == 12.50
    # c: row5 holds 0 s (tie), row6 holds 2 s at 3.00 -> twap = 3.00
    assert got["c"]["n_intervals"] == 2
    assert got["c"]["total_us"] == 2_000_000
    assert got["c"]["twap"] == 3.00


def test_rolling_zscore_anomalies_exact_rule(spark):
    """Constant window -> zero variance -> strict > never flags the
    same value but flags any deviation; warmup rows below min_n are
    never emitted."""
    import datetime as dt

    from pyspark.sql import functions as F

    from ram_datapipeline_spark.operators.timeseries import (
        rolling_zscore_anomalies,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        ("k", i, t0 + dt.timedelta(minutes=i), 5.0) for i in range(10)
    ] + [
        ("k", 10, t0 + dt.timedelta(minutes=10), 5.0),   # equal: no flag
        ("k", 11, t0 + dt.timedelta(minutes=11), 6.0),   # deviates: flag
    ]
    df = spark.createDataFrame(
        rows, "key string, event_id long, ts timestamp, value double"
    )
    out = rolling_zscore_anomalies(
        df,
        ["key"],
        "ts",
        "event_id",
        F.floor(F.col("value") * 100.0 + 0.5),
        lookback=4,
        min_n=3,
        k_sigma=3,
    ).collect()
    ids = sorted(r["event_id"] for r in out)
    assert ids == [11]
    (r,) = [r for r in out if r["event_id"] == 11]
    assert r["win_n"] == 4 and r["bound_sq"] == 0 and r["dev_num"] > 0


def test_sessionize_batch_gap_boundary_and_merge(spark):
    from ram_datapipeline_spark.operators.timeseries import sessionize_batch

    events = spark.createDataFrame(
        [
            # user 1: three events 10 min apart -> ONE session
            (1, _ts(0, 0), "a", 1),
            (1, _ts(0, 10), "b", 2),
            (1, _ts(0, 20), "a", 3),
            # exactly 30 min after the last -> session_window treats the
            # gap as a CLOSED interval, so a boundary-exact gap still
            # MERGES (the oracle's split condition is strictly-greater;
            # this pins that semantics choice)
            (1, _ts(0, 50), "c", 4),
            # 30 min + 1 us after -> strictly over the gap -> NEW session
            (1, dt.datetime(2024, 1, 1, 1, 20, 0, 1), "d", 5),
            # user 2: single event
            (2, _ts(5, 0), "a", 6),
        ],
        "user_id long, ts timestamp, event_type string, event_id long",
    )
    out = sessionize_batch(
        events, key_col="user_id", gap="30 minutes", type_col="event_type"
    ).orderBy("user_id", "session_start").collect()
    assert len(out) == 3
    s1, s2, s3 = out
    assert (s1.n_events, s1.n_types) == (4, 3)
    assert s1.duration_us == 50 * 60 * 1_000_000
    assert (s2.n_events, s2.session_start) == (
        1, dt.datetime(2024, 1, 1, 1, 20, 0, 1),
    )
    assert (s3.user_id, s3.n_events, s3.duration_us) == (2, 1, 0)


def test_resample_interpolate_exact_rationals(spark):
    from ram_datapipeline_spark.operators.timeseries import (
        resample_interpolate,
    )

    events = spark.createDataFrame(
        [
            # key "x": events at 00:30 (v=1.00) and 02:30 (v=3.00)
            ("x", dt.datetime(2024, 1, 1, 0, 30), 1.0, 1),
            ("x", dt.datetime(2024, 1, 1, 2, 30), 3.0, 2),
            # key "y": one event exactly on the grid (01:00), plus a
            # same-microsecond duplicate -> max event_id wins the dedup
            ("y", dt.datetime(2024, 1, 1, 1, 0), 5.0, 3),
            ("y", dt.datetime(2024, 1, 1, 1, 0), 7.0, 4),
            ("y", dt.datetime(2024, 1, 1, 3, 0), 9.0, 5),
        ],
        "event_type string, ts timestamp, value double, event_id long",
    )
    out = {
        (r.event_type, r.grid_ts): r
        for r in resample_interpolate(events).collect()
    }
    # x grid points: 01:00 and 02:00 (inside (00:30, 02:30))
    g1 = out[("x", dt.datetime(2024, 1, 1, 1, 0))]
    # num = 100*(t2-g) + 300*(g-t1); t2-g = 90min, g-t1 = 30min (us)
    assert g1.interp_den == 120 * 60 * 1_000_000
    assert g1.interp_num == (100 * 90 + 300 * 30) * 60 * 1_000_000
    assert g1.interp_value == 1.5
    g2 = out[("x", dt.datetime(2024, 1, 1, 2, 0))]
    assert g2.interp_value == 2.5
    # y at 01:00: exact hit -> dedup picked event_id 4 (7.00) -> c/1
    y1 = out[("y", dt.datetime(2024, 1, 1, 1, 0))]
    assert (y1.interp_num, y1.interp_den) == (700, 1)
    assert y1.interp_value == 7.0
    # no extrapolation: nothing before a key's first or after its last
    assert ("x", dt.datetime(2024, 1, 1, 0, 0)) not in out
    assert ("x", dt.datetime(2024, 1, 1, 3, 0)) not in out


def test_cusum_drift_matches_sequential_recursion(spark):
    from ram_datapipeline_spark.operators.timeseries import cusum_drift

    vals = [50, 52, 70, 71, 69, 50, 30, 31, 29, 50]
    rows = [("k", _ts(0, i), float(v), i) for i, v in enumerate(vals)]
    df = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    out = {
        r.event_id: r
        for r in cusum_drift(
            df, ["event_type"], "ts", "event_id",
            F.floor(F.col("value") * 100.0 + 0.5),
            target_cents=5000, slack_cents=500, h_cents=2500,
        ).collect()
    }
    # replay the textbook recursion in python
    sp = sm = 0
    for i, v in enumerate(vals):
        c = v * 100
        sp = max(0, sp + (c - 5000) - 500)
        sm = max(0, sm + (5000 - c) - 500)
        assert (out[i].s_plus, out[i].s_minus) == (sp, sm), i
        assert out[i].drift_up == (sp > 2500)
        assert out[i].drift_down == (sm > 2500)
    # the up-drift run (70,71,69) must flag; CUSUM decays by the slack,
    # so the flag clears two low observations later, not instantly
    assert out[3].drift_up and out[5].drift_up and not out[6].drift_up
    assert out[8].drift_down


def test_resample_interpolate_narrow_span_keys_emit_nothing(spark):
    """ADVICE r8: a key whose observed span contains NO grid point
    (single off-grid event, or both events inside one step interval)
    must emit zero rows — not throw 'Illegal sequence boundaries' from
    sequence(lo, hi) with lo > hi and fail the whole query."""
    from ram_datapipeline_spark.operators.timeseries import (
        resample_interpolate,
    )

    events = spark.createDataFrame(
        [
            # "solo": one event off the hourly grid -> lo > hi
            ("solo", dt.datetime(2024, 1, 1, 0, 30), 1.0, 1),
            # "narrow": two events inside one step interval, no grid pt
            ("narrow", dt.datetime(2024, 1, 1, 2, 10), 2.0, 2),
            ("narrow", dt.datetime(2024, 1, 1, 2, 40), 4.0, 3),
            # "ok": a normal key proving the rest still flows
            ("ok", dt.datetime(2024, 1, 1, 0, 30), 1.0, 4),
            ("ok", dt.datetime(2024, 1, 1, 1, 30), 3.0, 5),
        ],
        "event_type string, ts timestamp, value double, event_id long",
    )
    rows = resample_interpolate(events).collect()
    keys = {r.event_type for r in rows}
    assert keys == {"ok"}
    ok = {r.grid_ts: r.interp_value for r in rows}
    assert ok == {dt.datetime(2024, 1, 1, 1, 0): 2.0}


def test_seasonal_means_hot_cold_hours(spark):
    """Known 2-hour pattern: values at hour 0 run 1.00, hour 12 run
    3.00 -> overall mean 2.00, indexes exactly -1.00 and +1.00; the
    rational pair carries the exact integers."""
    from ram_datapipeline_spark.operators.timeseries import seasonal_means

    rows = []
    for d in range(1, 6):
        rows.append(("m", dt.datetime(2024, 1, d, 0, 30), 1.0, d * 2))
        rows.append(("m", dt.datetime(2024, 1, d, 12, 30), 3.0, d * 2 + 1))
    events = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    out = {r.bucket: r for r in seasonal_means(events).collect()}
    assert set(out) == {0, 12}
    h0, h12 = out[0], out[12]
    assert (h0.n_p, h0.sum_p) == (5, 500)
    # idx_num = 500*10 - 2000*5 = -5000 ; den = 5*10 = 50 -> -100 cents
    assert (h0.idx_num, h0.idx_den) == (-5000, 50)
    assert h0.seasonal_idx == -1.0
    assert (h12.idx_num, h12.idx_den) == (5000, 50)
    assert h12.seasonal_idx == 1.0


def test_acf_lags_alternating_and_constant(spark):
    """Alternating 1.00/3.00 series: lag-1 pairs are perfectly
    anti-correlated (acf exactly -1.0 with a balanced pair count),
    lag-2 pairs perfectly correlated (+1.0); a constant series has
    zero variance -> acf NULL with vxn = 0."""
    from ram_datapipeline_spark.operators.timeseries import acf_lags

    rows = []
    for i in range(9):  # length 9 -> 8 balanced lag-1 pairs
        rows.append(("alt", dt.datetime(2024, 1, 1, 0, i), 1.0 if i % 2 == 0 else 3.0, i))
    for i in range(6):
        rows.append(("const", dt.datetime(2024, 1, 1, 0, i), 2.0, 100 + i))
    events = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    out = {
        (r.event_type, r.lag_k): r
        for r in acf_lags(
            events, ["event_type"], "ts", "event_id",
            F.floor(F.col("value") * 100.0 + 0.5), max_lag=2,
        ).collect()
    }
    a1 = out[("alt", 1)]
    assert a1.n_pairs == 8
    # covn = 8*240000 - 1600*1600 ; vxn = vyn = 8*400000 - 1600^2
    assert (a1.covn, a1.vxn, a1.vyn) == (-640_000, 640_000, 640_000)
    assert a1.acf == -1.0
    a2 = out[("alt", 2)]
    assert a2.acf == 1.0
    c1 = out[("const", 1)]
    assert c1.vxn == 0 and c1.acf is None


def test_theil_sen_outlier_resistance(spark):
    """Linear 10-cents/hour trend across six hourly buckets with one
    wrecked bucket: 10 of 15 pairwise slopes are exactly 10, so the
    median ignores the outlier entirely (an OLS slope would not); a
    single-bucket key emits nothing (no pairs)."""
    from ram_datapipeline_spark.operators.timeseries import theil_sen_trend

    rows = []
    for h in range(6):
        v = 100.0 if h == 3 else (1.00 + 0.10 * h)  # cents: 10000 outlier at h=3
        rows.append(("t", dt.datetime(2024, 1, 1, h, 30), v, h))
    rows.append(("solo", dt.datetime(2024, 1, 1, 5, 0), 1.0, 99))
    events = spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double, event_id long"
    )
    out = {r.event_type: r for r in theil_sen_trend(events, ["event_type"], "ts", "value").collect()}
    assert set(out) == {"t"}
    t = out["t"]
    assert t.n_pairs == 15
    assert t.slope_cents_per_period == 10.0
    # the two middle fractions both reduce to 10 cents/hour
    assert t.num_lo * t.den_hi == t.num_hi * t.den_lo
    assert t.num_lo == 10 * t.den_lo


def test_interval_merge_islands(spark):
    """Three events 30s apart chain into one island (60s windows
    overlap end-to-end); a fourth event 2 minutes later starts its
    own; a second user's single event is its own island."""
    from ram_datapipeline_spark import queries as Q

    import tempfile

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 1, "a", 1.0, "{}"),
        (2, base + dt.timedelta(seconds=30), 1, "a", 1.0, "{}"),
        (3, base + dt.timedelta(seconds=60), 1, "a", 1.0, "{}"),
        (4, base + dt.timedelta(seconds=300), 1, "a", 1.0, "{}"),
        (5, base, 2, "a", 1.0, "{}"),
    ]
    events = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        events.write.parquet(d + "/events.parquet")
        for t in ["region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"]:
            spark.range(0).write.parquet(d + f"/{t}.parquet")
        got = sorted(
            Q.REGISTRY["ts_interval_merge"].builder(spark, d).collect(),
            key=lambda r: (r.user_id, r.island),
        )
    assert [(r.user_id, r.n_intervals) for r in got] == [(1, 3), (1, 1), (2, 1)]
    first = got[0]
    assert first.end_us - first.start_us == 120_000_000  # 0s..60s+60s


def test_holt_linear_exact_hand_case(spark):
    """The 2-state fold replayed by hand (α=¼, β=½ on 10,12,14,13):
    every intermediate is an exact binary double, so equality is exact —
    plus the n=1 (zero-trend init) and NULL-value exclusion edges."""
    from ram_datapipeline_spark.operators.timeseries import (
        holt_linear_smooth,
    )

    rows = [
        ("k", 1, 10.0), ("k", 2, 12.0), ("k", 3, 14.0), ("k", 4, 13.0),
        ("one", 1, 7.0),
        ("n", 1, 5.0), ("n", 2, None), ("n", 3, 9.0),
    ]
    df = spark.createDataFrame(rows, "key string, t int, v double")
    got = {
        r.key: r
        for r in holt_linear_smooth(df, ["key"], "t", "v").collect()
    }
    k = got["k"]
    assert (k.n_points, k.level, k.trend) == (4, 12.4140625, 0.75390625)
    assert k.forecast_1 == 12.4140625 + 0.75390625
    assert (got["one"].n_points, got["one"].level, got["one"].trend) == (
        1, 7.0, 0.0,
    )
    n = got["n"]  # NULL dropped: series is (5, 9)
    assert n.n_points == 2
    assert n.level == 0.25 * 9.0 + 0.75 * 5.0 and n.trend == 0.5 * (n.level - 5.0)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="exact-binary"):
        holt_linear_smooth(df, ["key"], "t", "v", alpha_num=1, alpha_den=3)
