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
