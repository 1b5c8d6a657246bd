"""Geometry / distance expression kit (reference: turf.js kernels, SURVEY F11-F18).

The reference's spatial substrate is turf.js (bbox, buffer, within, centroid,
squareGrid — ram-analysis/app/calculate-eta/utils.js:28-58,
calculate-eta/index.js:61-62, tasks.js:64-70) plus OSRM's native routing
kernel (tasks.js:246-283). Here the same capabilities are pure Column
expressions — codegen'd JVM arithmetic, no UDFs — over a flat
``(lon, lat)`` / GeoJSON-ish representation.

Determinism note: every function in this module restricts itself to IEEE-754
exact or correctly-rounded operations (+,-,*,/,sqrt,floor,min/max,comparison)
except the explicitly-named haversine kernel (sin/cos/asin are libm-dependent
and may differ in the last ulp across engines). Oracle-checked plans use the
exact kit; the haversine backend exists for realistic benchmarking.

Synthetic coordinates: the fixture tables carry no lon/lat, so RAM-domain
plans derive deterministic WGS84-range coordinates from integer keys via
modular arithmetic — exact in both Spark and any ANSI-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Degrees→km scale used by the exact (equirectangular-ish) cost backend.
KM_PER_DEGREE = 111.0
# Reference tuning constants (ram-analysis/app/index.js:79-80, tasks.js:141).
MAX_SPEED_KMH = 120.0
MAX_TIME_S = 1800.0
WALK_SPEED_KMH = 4.0
GRID_SIZE_KM = 30.0
GRID_SIZE_DEG = GRID_SIZE_KM / KM_PER_DEGREE  # ~0.27 degrees


def synth_lon(key: Column, mult: int = 37) -> Column:
    """Deterministic longitude in [-180, 180) from an integer key.

    ``((key*mult) % 3600)/10 - 180`` — modular integer arithmetic, exact and
    reproducible in any SQL engine.
    """
    return (key * mult % 3600).cast("double") / 10.0 - 180.0


def synth_lat(key: Column, mult: int = 53) -> Column:
    """Deterministic latitude in [-85, 85) from an integer key."""
    return (key * mult % 1700).cast("double") / 10.0 - 85.0


def sq_dist_deg(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Squared planar distance in degrees² (exact: two mults, one add)."""
    dx = lon1 - lon2
    dy = lat1 - lat2
    return dx * dx + dy * dy


def dist_deg(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Planar distance in degrees (sqrt is correctly rounded → deterministic)."""
    return F.sqrt(sq_dist_deg(lon1, lat1, lon2, lat2))


def dist_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Planar distance in km under the fixed degrees→km scale."""
    return dist_deg(lon1, lat1, lon2, lat2) * KM_PER_DEGREE


def eta_seconds(
    lon1: Column,
    lat1: Column,
    lon2: Column,
    lat2: Column,
    speed_kmh: float = MAX_SPEED_KMH,
) -> Column:
    """Travel time in seconds at ``speed_kmh`` — the default cost backend.

    Analog of one osrm.table cell (tasks.js:268-279) under a straight-line
    cost model. Expression order is fixed (* then / then *) so any oracle
    writing the same order reproduces it bit-for-bit.
    """
    return dist_deg(lon1, lat1, lon2, lat2) * KM_PER_DEGREE / speed_kmh * 3600.0


def walk_penalty_seconds(snap_dist_km: Column, walk_kmh: float = WALK_SPEED_KMH) -> Column:
    """Walking time from an origin to its snapped road point.

    Reference formula: eta = table_eta + nearest_m * (1 / (walk_kmh*1000/3600))
    (tasks.js:136-151, WALKSPEED=4 at :141).
    """
    return snap_dist_km / walk_kmh * 3600.0


def haversine_km(lon1: Column, lat1: Column, lon2: Column, lat2: Column) -> Column:
    """Great-circle distance in km. Realistic cost backend for benchmarks;
    NOT used in oracle-checked plans (libm-dependent)."""
    r = 6371.0
    rlon1, rlat1 = F.radians(lon1), F.radians(lat1)
    rlon2, rlat2 = F.radians(lon2), F.radians(lat2)
    dlon = rlon2 - rlon1
    dlat = rlat2 - rlat1
    a = (
        F.sin(dlat / 2.0) * F.sin(dlat / 2.0)
        + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon / 2.0) * F.sin(dlon / 2.0)
    )
    return 2.0 * r * F.asin(F.sqrt(a))


def grid_cell_x(lon: Column, cell_deg: float = GRID_SIZE_DEG) -> Column:
    """Grid-cell x index (reference: 30 km squareGrid, calculate-eta/index.js:62)."""
    return F.floor(lon / cell_deg).cast("long")


def grid_cell_y(lat: Column, cell_deg: float = GRID_SIZE_DEG) -> Column:
    return F.floor(lat / cell_deg).cast("long")


def grid_cell_id(lon: Column, lat: Column, cell_deg: float = GRID_SIZE_DEG) -> Column:
    """Single packed cell id usable as a shuffle/partition key."""
    return grid_cell_x(lon, cell_deg) * 100000 + grid_cell_y(lat, cell_deg)


def point_in_rect(
    lon: Column, lat: Column, xmin: Column, ymin: Column, xmax: Column, ymax: Column
) -> Column:
    """Point-in-polygon (SURVEY J2/F15) for axis-aligned polygons.

    Closed on min edges, open on max — matches half-open tiling so every
    point lands in exactly one rectangle of a partition grid. General
    polygons are handled by the ray-casting pandas UDF in
    ``operators.spatial`` (reference: turf within, utils.js:28-31).
    """
    return (lon >= xmin) & (lon < xmax) & (lat >= ymin) & (lat < ymax)


def bbox_agg() -> list[Column]:
    """Aggregate expressions for a bounding box (SURVEY F11: turf bbox)."""
    return [
        F.min("lon").alias("xmin"),
        F.min("lat").alias("ymin"),
        F.max("lon").alias("xmax"),
        F.max("lat").alias("ymax"),
    ]
