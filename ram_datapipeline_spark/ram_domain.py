"""RAM-domain views derived from the fixture star schema.

Role mapping (FIXTURES.md): ``customer`` ≈ origins (villages,
reference projects_origins — ram-analysis/app/index.js:221-262),
``supplier`` ≈ POIs (per-type GeoJSON files — index.js:282-294),
``nation``/``region`` ≈ admin-area grouping (projects_aa —
index.js:308-339).

Coordinates are synthesized deterministically from integer keys via modular
arithmetic (see functions.geo) because the fixtures carry none; every
expression is IEEE-exact and reproducible in ANSI SQL, which is what lets
the spatial/routing plans be oracle-checked bit-for-bit.

The matching oracle-SQL fragments live next to each builder so the two can
never drift apart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ram_datapipeline_spark.functions import geo

# Key multipliers: distinct per entity so origins/POIs don't coincide.
ORIGIN_LON_MULT, ORIGIN_LAT_MULT = 37, 53
POI_LON_MULT, POI_LAT_MULT = 41, 59

POI_TYPE_CASE = (
    "CASE s_suppkey % 3 WHEN 0 THEN 'hospital' WHEN 1 THEN 'school' ELSE 'bank' END"
)

# --- oracle-SQL fragments (DuckDB/ANSI), mirrored by the builders below ---

ORIGINS_SQL = (
    "SELECT c_custkey AS origin_id, c_nationkey AS admin_id, "
    "CAST((c_custkey * 37) % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon, "
    "CAST((c_custkey * 53) % 1700 AS DOUBLE) / 10.0 - 85.0 AS lat "
    "FROM customer"
)

POIS_SQL = (
    "SELECT s_suppkey AS poi_id, "
    f"{POI_TYPE_CASE} AS poi_type, "
    "CAST((s_suppkey * 41) % 3600 AS DOUBLE) / 10.0 - 180.0 AS lon, "
    "CAST((s_suppkey * 59) % 1700 AS DOUBLE) / 10.0 - 85.0 AS lat "
    "FROM supplier"
)

# Admin areas: one axis-aligned rectangle per nation, tiling lon into 25
# half-open slabs of 14.4° and the full lat range — exact edges.
ADMIN_AREAS_SQL = (
    "SELECT n_nationkey AS aa_id, n_name AS name, "
    "CAST(n_nationkey AS DOUBLE) * 14.4 - 180.0 AS xmin, -85.0 AS ymin, "
    "CAST(n_nationkey + 1 AS DOUBLE) * 14.4 - 180.0 AS xmax, 85.0 AS ymax "
    "FROM nation"
)


def origins(customer: DataFrame) -> DataFrame:
    """Origins view: (origin_id, admin_id, lon, lat)."""
    return customer.select(
        F.col("c_custkey").alias("origin_id"),
        F.col("c_nationkey").alias("admin_id"),
        geo.synth_lon(F.col("c_custkey"), ORIGIN_LON_MULT).alias("lon"),
        geo.synth_lat(F.col("c_custkey"), ORIGIN_LAT_MULT).alias("lat"),
    )


def pois(supplier: DataFrame) -> DataFrame:
    """POIs view: (poi_id, poi_type, lon, lat)."""
    return supplier.select(
        F.col("s_suppkey").alias("poi_id"),
        F.expr(POI_TYPE_CASE).alias("poi_type"),
        geo.synth_lon(F.col("s_suppkey"), POI_LON_MULT).alias("lon"),
        geo.synth_lat(F.col("s_suppkey"), POI_LAT_MULT).alias("lat"),
    )


def admin_areas(nation: DataFrame) -> DataFrame:
    """Admin-area rectangles: (aa_id, name, xmin, ymin, xmax, ymax)."""
    return nation.select(
        F.col("n_nationkey").alias("aa_id"),
        F.col("n_name").alias("name"),
        (F.col("n_nationkey").cast("double") * 14.4 - 180.0).alias("xmin"),
        F.lit(-85.0).alias("ymin"),
        ((F.col("n_nationkey") + 1).cast("double") * 14.4 - 180.0).alias("xmax"),
        F.lit(85.0).alias("ymax"),
    )
