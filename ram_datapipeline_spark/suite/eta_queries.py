"""ETA / routing query family (SURVEY §2 J4, J5, A1, F2-F4; §7 phase 1).

The reference's essence: per-origin travel time to the nearest POI of each
type (ram-analysis/app/calculate-eta/tasks.js), as declarative Spark plans
over the RAM-domain views.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ram_datapipeline_spark import ram_domain
from ram_datapipeline_spark.catalog import load_tables
from ram_datapipeline_spark.operators import eta as eta_ops
from ram_datapipeline_spark.registry import query

# ---------------------------------------------------------------------------
# Flagship — the reference's essence in one DAG (SURVEY §7 phase 1):
# nearest-facility ETA per origin and POI type.
# ---------------------------------------------------------------------------

@query(
    "eta_nearest_poi",
    oracle=f"""
    WITH o AS ({ram_domain.ORIGINS_SQL}), p AS ({ram_domain.POIS_SQL})
    SELECT o.origin_id, o.admin_id, p.poi_type,
           min(sqrt((o.lon - p.lon) * (o.lon - p.lon)
                    + (o.lat - p.lat) * (o.lat - p.lat))
               * 111.0 / 120.0 * 3600.0) AS eta_s
    FROM o CROSS JOIN p
    GROUP BY o.origin_id, o.admin_id, p.poi_type
    """,
    survey="J4,A1,F2,F3 (tasks.js:246-283,276-279)",
    tags=("flagship", "eta"),
)
def q_eta_nearest_poi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per origin (customer), ETA in seconds to the nearest POI (supplier)
    of each type — the reference's core query (duration matrix + min-reduce,
    tasks.js:246-283) under the straight-line cost backend."""
    t = load_tables(spark, sf_dir)
    o = ram_domain.origins(t["customer"])
    p = ram_domain.pois(t["supplier"])
    return eta_ops.nearest_poi_eta(o, p, origin_keys=["origin_id", "admin_id"])


@query(
    "eta_routed_kernel_grid",
    oracle=f"""
    WITH o AS ({ram_domain.ORIGINS_SQL}), p AS ({ram_domain.POIS_SQL}),
    oc AS (SELECT *, CAST(floor(lon / 4.0) AS BIGINT) AS cx,
                     CAST(floor(lat / 4.0) AS BIGINT) AS cy FROM o),
    pc AS (SELECT *, CAST(floor(lon / 4.0) AS BIGINT) AS cx,
                     CAST(floor(lat / 4.0) AS BIGINT) AS cy FROM p)
    SELECT oc.origin_id, pc.poi_type,
           min(sqrt((oc.lon - pc.lon) * (oc.lon - pc.lon)
                    + (oc.lat - pc.lat) * (oc.lat - pc.lat))
               * 111.0 / 120.0 * 3600.0) AS eta_s
    FROM oc JOIN pc
      ON pc.cx BETWEEN oc.cx - 1 AND oc.cx + 1
     AND pc.cy BETWEEN oc.cy - 1 AND oc.cy + 1
    GROUP BY oc.origin_id, pc.poi_type
    """,
    survey="U1/J4 routing kernel: mapInPandas per grid cell (tasks.js:246-283)",
    tags=("eta", "pandas-udf"),
)
def q_eta_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's batched-kernel execution shape: candidates from the
    3×3 grid neighborhood (4° cells), durations computed by a vectorized
    Python kernel per Arrow batch (osrm.table stand-in), min-reduced. The
    oracle replays the same neighborhood join + planar cost in SQL —
    proving the Python-kernel path bit-exact."""
    t = load_tables(spark, sf_dir)
    o = ram_domain.origins(t["customer"])
    p = ram_domain.pois(t["supplier"])
    return eta_ops.nearest_poi_eta_routed(o, p, cell_deg=4.0)


@query(
    "eta_with_walk_penalty",
    oracle=f"""
    WITH o AS ({ram_domain.ORIGINS_SQL}), p AS ({ram_domain.POIS_SQL}),
    eta AS (
      SELECT o.origin_id, p.poi_type,
             min(sqrt((o.lon - p.lon) * (o.lon - p.lon)
                      + (o.lat - p.lat) * (o.lat - p.lat))
                 * 111.0 / 120.0 * 3600.0) AS eta_s
      FROM o CROSS JOIN p GROUP BY o.origin_id, p.poi_type
    ),
    oc AS (SELECT *, CAST(floor(lon / 4.0) AS BIGINT) AS cx,
                     CAST(floor(lat / 4.0) AS BIGINT) AS cy FROM o),
    pc AS (SELECT *, CAST(floor(lon / 4.0) AS BIGINT) AS cx,
                     CAST(floor(lat / 4.0) AS BIGINT) AS cy FROM p),
    snap AS (
      SELECT oc.origin_id,
             min(sqrt((oc.lon - pc.lon) * (oc.lon - pc.lon)
                      + (oc.lat - pc.lat) * (oc.lat - pc.lat)) * 111.0) AS snap_km
      FROM oc JOIN pc
        ON pc.cx BETWEEN oc.cx - 1 AND oc.cx + 1
       AND pc.cy BETWEEN oc.cy - 1 AND oc.cy + 1
      GROUP BY oc.origin_id
    )
    SELECT eta.origin_id, eta.poi_type, eta.eta_s, snap.snap_km,
           eta.eta_s + snap.snap_km / 4.0 * 3600.0 AS eta_total_s
    FROM eta LEFT JOIN snap ON eta.origin_id = snap.origin_id
    """,
    survey="J5,F4 (tasks.js:136-151,181-213; WALKSPEED=4 at :141)",
    tags=("eta",),
)
def q_eta_with_walk_penalty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final ETA formula: matrix min + walking penalty from the origin to
    its nearest network point (suppliers double as snap targets here).

    The snap term uses the grid-pruned join (``nearest_snap_distance_grid``,
    3×3 neighborhood of 4° cells — the scale path for planet-sized vertex
    sets); the oracle replays the identical neighborhood join. Origins whose
    neighborhood holds no vertex get NULL snap_km / eta_total_s (unsnapped),
    in both engine and oracle (LEFT JOIN)."""
    t = load_tables(spark, sf_dir)
    o = ram_domain.origins(t["customer"])
    p = ram_domain.pois(t["supplier"])
    e = eta_ops.nearest_poi_eta(o, p)
    snap = eta_ops.nearest_snap_distance_grid(o, p, cell_deg=4.0)
    out = eta_ops.eta_with_walk_penalty(e, snap)
    return out.select("origin_id", "poi_type", "eta_s", "snap_km", "eta_total_s")


