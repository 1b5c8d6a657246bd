"""Behavior tests for the round-11 event/user analytics operators
(operators/events.py) and the r11 statistics/vector additions —
hand-built corpora with known answers, complementing the driver's
oracle gates."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _ts(day: int, hour: int = 0) -> dt.datetime:
    return dt.datetime(2024, 1, day, hour, 0, 0)


def test_retention_cohorts_hand_matrix(spark):
    from ram_datapipeline_spark.operators.events import retention_cohorts

    # user 1: weeks w0 and w0+1; user 2: w0 only; user 3: w0+1 only.
    # epoch-anchored weeks — derive expected indices from the operator's
    # own constant so the assertion is about STRUCTURE, not a magic int.
    rows = [
        (1, _ts(1)), (1, _ts(2)), (1, _ts(10)),
        (2, _ts(1)),
        (3, _ts(10)), (3, None),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {
        (r.cohort_week, r.offset_weeks): r.n_users
        for r in retention_cohorts(ev).collect()
    }
    w0 = min(c for c, _ in out)
    # cohort w0 has users 1+2; one of them (user 1) returns next week
    assert out[(w0, 0)] == 2
    assert out[(w0, 1)] == 1
    # user 3's own cohort starts the later week
    later = [k for k in out if k[0] != w0]
    assert len(later) == 1 and out[later[0]] == 1 and later[0][1] == 0


def test_stickiness_ratio_exact_ppm(spark):
    from ram_datapipeline_spark.operators.events import stickiness_ratio

    # one epoch week: user 1 active 7 distinct days (multiple events on
    # day 1 collapse), user 2 active 1 day -> sum_dau=8, wau=2,
    # ppm = 8e6 DIV 14 = 571428
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base + dt.timedelta(days=d)) for d in range(7)]
    rows += [(1, base), (2, base)]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = stickiness_ratio(ev).collect()
    # the 7-day span may straddle two epoch weeks; totals still hold
    assert sum(r.sum_dau for r in out) == 8
    if len(out) == 1:
        r = out[0]
        assert r.wau == 2 and r.stickiness_ppm == 8 * 1_000_000 // 14


def test_touch_attribution_first_last_and_none(spark):
    from ram_datapipeline_spark.operators.events import touch_attribution

    rows = [
        # user 1: view -> click -> purchase  (first=view, last=click)
        (1, _ts(1, 1), 1, "view"),
        (1, _ts(1, 2), 2, "click"),
        (1, _ts(1, 3), 3, "purchase"),
        # user 2: purchase with no prior events -> (none)/(none)
        (2, _ts(1, 1), 4, "purchase"),
        # user 2 again after a view: first=view, last=view
        (2, _ts(1, 2), 5, "view"),
        (2, _ts(1, 3), 6, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {r.channel: r for r in touch_attribution(ev, "purchase").collect()}
    assert out["view"].first_touch == 2   # u1 conv + u2 second conv
    assert out["view"].last_touch == 1    # u2 second conv
    assert out["click"].last_touch == 1   # u1 conv
    assert out["click"].first_touch == 0
    assert out["(none)"].first_touch == 1 and out["(none)"].last_touch == 1
    # both models credit every conversion exactly once
    assert sum(r.first_touch for r in out.values()) == 3
    assert sum(r.last_touch for r in out.values()) == 3


def test_kendall_tau_perfect_and_reversed(spark):
    from ram_datapipeline_spark.operators.quality import kendall_tau_buckets

    rows = []
    for h, v in [(0, 1.0), (1, 2.0), (2, 3.0)]:
        rows.append(("up", dt.datetime(2024, 1, 1, h), v))
        rows.append(("down", dt.datetime(2024, 1, 1, h), 10.0 - v))
        rows.append(("flat", dt.datetime(2024, 1, 1, h), 5.0))
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = {
        r.event_type: r
        for r in kendall_tau_buckets(
            ev, ["event_type"], "ts", "value"
        ).collect()
    }
    assert out["up"].tau_b == 1.0 and out["up"].concordant == 3
    assert out["down"].tau_b == -1.0 and out["down"].discordant == 3
    assert out["flat"].tau_b is None and out["flat"].ties_y == 3


def test_rolling_slope_exact_line(spark):
    from ram_datapipeline_spark.operators.timeseries import rolling_slope

    # y = 3i exactly: every window's slope is 300 cents (values 3.0i)
    rows = [
        ("k", dt.datetime(2024, 1, 1, 0, i), i, 3.0 * (i + 1))
        for i in range(10)
    ]
    ev = spark.createDataFrame(
        rows, "event_type string, ts timestamp, event_id long, value double"
    )
    out = rolling_slope(
        ev, ["event_type"], "ts", "event_id",
        F.floor(F.col("value") * 100.0 + 0.5), window_rows=4,
    ).collect()
    assert len(out) == 10
    first = min(out, key=lambda r: r.event_id)
    assert first.n_win == 1 and first.slope is None
    for r in out:
        if r.n_win >= 2:
            assert r.slope == 300.0, r


def test_binary_hamming_topk_identical_and_opposite(spark):
    from ram_datapipeline_spark.operators.vectors import binary_hamming_topk

    plus = [1.0] * 64
    minus = [-1.0] * 64
    half = [1.0] * 32 + [-1.0] * 32
    df = spark.createDataFrame(
        [(1, plus), (2, plus), (3, minus), (4, half)],
        "vec_id long, embedding array<float>",
    )
    out = {
        (r.query_id, r.rk): r
        for r in binary_hamming_topk(
            df.where(F.col("vec_id") == 1), df, k=3
        ).collect()
    }
    assert out[(1, 1)].neighbor_id == 2 and out[(1, 1)].hamming == 0
    assert out[(1, 2)].neighbor_id == 4 and out[(1, 2)].hamming == 32
    assert out[(1, 3)].neighbor_id == 3 and out[(1, 3)].hamming == 64


def test_matryoshka_energy_front_loaded(spark):
    from ram_datapipeline_spark.operators.vectors import (
        matryoshka_energy_profile,
    )

    # vector A: all energy in the first 8 dims; B: uniform energy;
    # a zero vector must be excluded
    a = [2.0] * 8 + [0.0] * 56
    b = [1.0] * 64
    z = [0.0] * 64
    df = spark.createDataFrame(
        [(1, a), (2, b), (3, z)], "vec_id long, embedding array<float>"
    )
    out = {r.dim: r for r in matryoshka_energy_profile(df).collect()}
    assert all(r.n_vecs == 2 for r in out.values())
    # A holds 100% at dim 8 (1e6 ppm); B holds 8/64 = 125000 ppm
    assert out[8].sum_energy_ppm == 1_000_000 + 125_000
    assert out[64].sum_energy_ppm == 2_000_000
    assert out[8].avg_energy_ppm == (1_000_000 + 125_000) // 2


def test_chi2_terms_separating_token_wins(spark):
    from ram_datapipeline_spark.operators.text_ops import chi2_term_selection

    # 'alpha' appears only in positive docs, 'noise' in all
    rows = [(i, "alpha noise", "en") for i in range(10)]
    rows += [(10 + i, "beta noise", "fr") for i in range(10)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = chi2_term_selection(
        docs, F.col("lang") == "en", min_df=5, k=3
    ).collect()
    assert out[0].term in ("alpha", "beta")  # perfect separators tie
    assert out[0].chi2 == 20.0  # N·det²/... = full association = N
    assert {r.term for r in out} == {"alpha", "beta", "noise"}
    noise = [r for r in out if r.term == "noise"][0]
    assert noise.chi2 == 0.0 or abs(noise.chi2) < 1e-12


def test_stickiness_and_cohorts_exclude_null_users(spark):
    """r11 self-review: a NULL user must not inflate sum_dau while
    falling out of the count-DISTINCT wau (engines agree NULL is no
    user), and cohorts drop NULL users by contract, not join accident."""
    from ram_datapipeline_spark.operators.events import (
        retention_cohorts,
        stickiness_ratio,
    )

    base = dt.datetime(2024, 1, 1)
    rows = [(1, base), (None, base), (None, base + dt.timedelta(days=1))]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    st = stickiness_ratio(ev).collect()
    assert sum(r.sum_dau for r in st) == 1
    assert all(r.wau == 1 for r in st)
    rc = retention_cohorts(ev).collect()
    assert len(rc) == 1 and rc[0].n_users == 1


def test_binary_sign_pack_short_and_null_vectors(spark):
    """r11 self-review: vectors shorter than the packed dim (or NULL
    components) hash as 0-bits — ANSI element_at would throw where
    DuckDB yields NULL."""
    from ram_datapipeline_spark.operators.vectors import binary_hamming_topk

    full = [1.0] * 64
    short = [1.0] * 8          # 56 missing components -> 0 bits
    df = spark.createDataFrame(
        [(1, full), (2, short), (3, full)],
        "vec_id long, embedding array<float>",
    )
    out = {
        r.neighbor_id: r
        for r in binary_hamming_topk(
            df.where(F.col("vec_id") == 1), df, k=2
        ).collect()
    }
    assert out[3].hamming == 0
    assert out[2].hamming == 56  # only the 8 present bits match
