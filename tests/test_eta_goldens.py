"""Hand-computed mini-goldens for the ETA kernel (SURVEY §5: analytic
goldens for non-SQL-checkable paths — here they double-check the
oracle-backed path with numbers derivable by hand)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from ram_datapipeline_spark.operators import eta as E
from ram_datapipeline_spark.operators.eta import nearest_poi_eta_routed


def _mk(spark, origins, pois):
    o = spark.createDataFrame(origins, "origin_id long, lon double, lat double")
    p = spark.createDataFrame(pois, "poi_id long, poi_type string, lon double, lat double")
    return o, p


def test_eta_golden_exact_values(spark):
    """3-4-5 triangle: origin at (0,0), hospital at (3,4)° → 5° = 555 km
    @120 km/h = 16650 s; bank at (0,1)° → 111 km = 3330 s."""
    o, p = _mk(
        spark,
        [(1, 0.0, 0.0)],
        [(10, "hospital", 3.0, 4.0), (20, "bank", 0.0, 1.0)],
    )
    out = {r["poi_type"]: r["eta_s"] for r in E.nearest_poi_eta(o, p).collect()}
    assert out["hospital"] == 5.0 * 111.0 / 120.0 * 3600.0  # 16650.0
    assert out["bank"] == 1.0 * 111.0 / 120.0 * 3600.0  # 3330.0


def test_eta_min_reduce_picks_nearest(spark):
    """Two hospitals; the closer one wins; null-free min semantics."""
    o, p = _mk(
        spark,
        [(1, 0.0, 0.0)],
        [(10, "hospital", 0.0, 2.0), (11, "hospital", 0.0, 0.5)],
    )
    rows = E.nearest_poi_eta(o, p).collect()
    assert len(rows) == 1
    assert rows[0]["eta_s"] == 0.5 * 111.0 / 120.0 * 3600.0


def test_eta_unreachable_cutoff_yields_null(spark):
    """maxTime semantics (tasks.js:276-279): beyond the cutoff every
    candidate is nulled and min returns null — never 0, never dropped."""
    o, p = _mk(spark, [(1, 0.0, 0.0)], [(10, "hospital", 3.0, 4.0)])
    rows = E.nearest_poi_eta(o, p, unreachable_over_s=1000.0).collect()
    assert len(rows) == 1 and rows[0]["eta_s"] is None


def test_walk_penalty_formula(spark):
    """eta_total = eta + snap_km / 4 km/h (tasks.js:136-151): snap to the
    bank at 1° = 111 km → 27.75 h walk penalty = 99900 s."""
    o, p = _mk(spark, [(1, 0.0, 0.0)], [(20, "bank", 0.0, 1.0)])
    eta = E.nearest_poi_eta(o, p)
    snap = E.nearest_snap_distance(o, p)
    out = E.eta_with_walk_penalty(eta, snap).collect()[0]
    assert out["snap_km"] == 111.0
    assert out["eta_total_s"] == 3330.0 + 111.0 / 4.0 * 3600.0


def test_grid_snap_equals_exact_within_cell(spark):
    """Grid-pruned snap equals the exact broadcast snap whenever the
    nearest vertex is within one cell (cell chosen ≥ the data's spread)."""
    origins = [(i, float(i % 7), float(i % 5)) for i in range(1, 40)]
    verts = [(100 + i, "v", float(i % 6) + 0.25, float(i % 4) + 0.25) for i in range(12)]
    o, v = _mk(spark, origins, verts)
    exact = E.nearest_snap_distance(o, v).withColumnRenamed("snap_km", "exact_km")
    grid = E.nearest_snap_distance_grid(o, v, cell_deg=20.0)
    j = grid.join(exact, "origin_id", "full")
    assert j.filter(F.col("snap_km") != F.col("exact_km")).count() == 0
    assert j.filter(F.col("snap_km").isNull()).count() == 0


def test_routed_kernel_equals_jvm_path(spark):
    """The mapInPandas kernel and the JVM expression produce identical
    durations on the same candidate sets (numpy sqrt ≡ JVM sqrt, IEEE)."""
    origins = [(i, float(i % 7), float(i % 5)) for i in range(1, 40)]
    pois = [(100 + i, "hospital", float(i % 6) + 0.5, float(i % 4) + 0.5) for i in range(10)]
    o, p = _mk(spark, origins, pois)
    routed = nearest_poi_eta_routed(o, p, cell_deg=20.0)  # one neighborhood
    exact = E.nearest_poi_eta(o, p).select(
        "origin_id", "poi_type", F.col("eta_s").alias("eta_exact")
    )
    j = routed.join(exact, ["origin_id", "poi_type"], "full")
    assert j.filter(F.col("eta_s") != F.col("eta_exact")).count() == 0
    assert j.filter(F.col("eta_s").isNull() | F.col("eta_exact").isNull()).count() == 0


def test_accessibility_index_hand_case(spark):
    """Conditional-sum semantics: thresholds inclusive, NULL eta counts
    in the total but no bucket, zero-pop group yields 0.0 shares."""
    from ram_datapipeline_spark.operators.eta import accessibility_index
    from pyspark.sql import functions as F

    rows = [
        # admin, type, eta_i, pop_i
        (1, "bank", 1800, 10),   # exactly at threshold -> inside
        (1, "bank", 1801, 20),   # just outside 30m, inside 60m
        (1, "bank", 9000, 30),   # outside all
        (1, "bank", None, 40),   # unreachable: total only
        (2, "bank", 100, 0),     # zero population
    ]
    df = spark.createDataFrame(
        rows, "admin_id int, poi_type string, eta_i long, pop_i long"
    )
    out = {
        (r["admin_id"], r["poi_type"]): r
        for r in accessibility_index(df).collect()
    }
    a = out[(1, "bank")]
    assert a["pop_total"] == 100
    assert a["pop_within_1800"] == 10
    assert a["pop_within_3600"] == 30
    assert a["pop_within_7200"] == 30
    assert a["share_3600"] == 30 / 100
    b = out[(2, "bank")]
    assert b["pop_total"] == 0 and b["share_1800"] == 0.0
