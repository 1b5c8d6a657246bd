"""Query registry — the engine's public query surface.

One entry per operator/capability from SURVEY.md §2 (plus the
beyond-reference training-data operators). Each entry pairs

- a **builder**: ``(SparkSession, sf_dir) -> DataFrame`` composing the
  engine's operators into a plan, and
- an **oracle**: the equivalent ANSI SQL (DuckDB dialect) over the same
  parquet tables, or ``None`` for plans whose semantics are not cleanly
  SQL-expressible (those get rows-only checks).

Determinism contract: every oracle-backed query restricts itself to
IEEE-exact / correctly-rounded arithmetic and carries explicit tie-breaks on
any LIMIT/rank boundary, so Spark and DuckDB agree bit-for-bit. Column names
are aliased identically on both sides (the driver hashes values under sorted
column names).

``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views over this
registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ram_datapipeline_spark import ram_domain
from ram_datapipeline_spark.catalog import load_tables
from ram_datapipeline_spark.functions import geo
from ram_datapipeline_spark.operators import eta as eta_ops

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    builder: Builder
    oracle: str | None
    survey: str = ""  # SURVEY §2 operator ids this query exercises
    doc: str = ""
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None, survey: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a builder under ``name``."""

    def wrap(fn: Builder) -> Builder:
        REGISTRY[name] = QuerySpec(
            builder=fn, oracle=oracle, survey=survey, doc=fn.__doc__ or "", tags=tags
        )
        return fn

    return wrap


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
    snap AS (
      SELECT o.origin_id,
             min(sqrt((o.lon - p.lon) * (o.lon - p.lon)
                      + (o.lat - p.lat) * (o.lat - p.lat)) * 111.0) AS snap_km
      FROM o CROSS JOIN p GROUP BY o.origin_id
    )
    SELECT eta.origin_id, eta.poi_type, eta.eta_s, snap.snap_km,
           eta.eta_s + snap.snap_km / 4.0 * 3600.0 AS eta_total_s
    FROM eta JOIN snap ON eta.origin_id = snap.origin_id
    """,
    survey="J5,F4 (tasks.js:136-151,181-213; WALKSPEED=4 at :141)",
    tags=("eta",),
)
def q_eta_with_walk_penalty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final ETA formula: matrix min + walking penalty from the origin to
    its nearest network point (suppliers double as snap targets here)."""
    t = load_tables(spark, sf_dir)
    o = ram_domain.origins(t["customer"])
    p = ram_domain.pois(t["supplier"])
    e = eta_ops.nearest_poi_eta(o, p)
    snap = eta_ops.nearest_snap_distance(o, p)
    out = eta_ops.eta_with_walk_penalty(e, snap)
    return out.select("origin_id", "poi_type", "eta_s", "snap_km", "eta_total_s")


def get(name: str) -> QuerySpec:
    return REGISTRY[name]


def builders() -> dict[str, Builder]:
    return {k: v.builder for k, v in REGISTRY.items()}


def oracles() -> dict[str, str]:
    return {k: v.oracle for k, v in REGISTRY.items() if v.oracle is not None}
