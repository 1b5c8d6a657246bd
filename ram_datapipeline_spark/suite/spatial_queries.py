"""Spatial query family (SURVEY §2.3 J2/J3/J7, §2.7 F11-F18).

Admin areas are the RAM-domain rectangles (one half-open lon slab per
nation — ram_domain.ADMIN_AREAS_SQL); origins/POIs carry synthetic modular
coordinates. All predicates are exact IEEE arithmetic, so even the
pandas-UDF ray-casting path is checked against a full SQL oracle.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ram_datapipeline_spark import ram_domain
from ram_datapipeline_spark.catalog import load_tables
from ram_datapipeline_spark.operators import spatial as S
from ram_datapipeline_spark.registry import query
from ram_datapipeline_spark.session import local_rows_df

# buffer: the reference's initial search radius = maxTime/3600*maxSpeed km
# (utils.js:47-49 with maxTime=1800 s, maxSpeed=120 km/h → 60 km).
BUFFER_DEG_SQL = "1800.0 / 3600.0 * 120.0 / 111.0"
CELL_DEG = 3.6  # grid cell for J7 (admin slabs are 14.4° wide)


@query(
    "j2_point_in_admin",
    oracle=f"""
    WITH o AS ({ram_domain.ORIGINS_SQL}), a AS ({ram_domain.ADMIN_AREAS_SQL})
    SELECT o.origin_id, a.aa_id, a.name
    FROM o JOIN a ON o.lon >= a.xmin AND o.lon < a.xmax
                 AND o.lat >= a.ymin AND o.lat < a.ymax
    """,
    survey="J2,F15 (utils.js:28-31; tasks.js:43)",
)
def q_j2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon join: origins assigned to their admin area
    (the reference's `within(origins, area)`), exact rectangle path —
    broadcast join, no point-side shuffle."""
    t = load_tables(spark, sf_dir)
    o = ram_domain.origins(t["customer"])
    a = ram_domain.admin_areas(t["nation"])
    return S.points_in_rect_areas(o, a).select("origin_id", "aa_id", "name")


@query(
    "j2_point_in_geojson",
    oracle=f"""
    WITH o AS ({ram_domain.ORIGINS_SQL}), a AS ({ram_domain.ADMIN_AREAS_SQL})
    SELECT o.origin_id, a.aa_id
    FROM o JOIN a ON o.lon >= a.xmin AND o.lon < a.xmax
                 AND o.lat >= a.ymin AND o.lat < a.ymax
    """,
    survey="J2,U3 (turf within via vectorized ray casting)",
    tags=("pandas-udf",),
)
def q_j2_geojson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same semantics as j2_point_in_admin but through the general GeoJSON
    kernel (bbox prefilter + Arrow-batched ray casting) — the path
    non-rectangular polygons take. Checked against the identical oracle.

    Both paths implement the SAME half-open rule [xmin,xmax) × [ymin,ymax)
    — the even-odd kernel's crossing test is half-open by construction
    (operators/spatial.py::_ring_contains), so agreement holds even for
    points exactly on slab edges (tests/test_spatial_edges.py), not just
    for this fixture's interior points.
    """
    t = load_tables(spark, sf_dir)
    o = ram_domain.origins(t["customer"])
    rects = ram_domain.admin_areas(t["nation"]).collect()
    areas = local_rows_df(spark, 
        [
            (
                r["aa_id"],
                json.dumps(
                    {
                        "type": "Polygon",
                        "coordinates": [[
                            [r["xmin"], r["ymin"]],
                            [r["xmax"], r["ymin"]],
                            [r["xmax"], r["ymax"]],
                            [r["xmin"], r["ymax"]],
                            [r["xmin"], r["ymin"]],
                        ]],
                    }
                ),
            )
            for r in rects
        ],
        "aa_id long, geometry string",
    )
    out = S.points_in_geojson_areas(o, areas)
    return out.select("origin_id", F.col("aa_id").cast("int").alias("aa_id"))


@query(
    "j3_buffer_semi_join",
    oracle=f"""
    WITH p AS ({ram_domain.POIS_SQL}), a AS ({ram_domain.ADMIN_AREAS_SQL})
    SELECT a.aa_id, p.poi_id, p.poi_type
    FROM p JOIN a ON p.lon >= a.xmin - ({BUFFER_DEG_SQL})
                 AND p.lon <  a.xmax + ({BUFFER_DEG_SQL})
                 AND p.lat >= a.ymin - ({BUFFER_DEG_SQL})
                 AND p.lat <  a.ymax + ({BUFFER_DEG_SQL})
    """,
    survey="J3,F14 (utils.js:47-58; tasks.js:73-87)",
)
def q_j3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buffered candidate pruning: POIs within the travel-time buffer
    (1800 s @ 120 km/h → 60 km) of each admin area."""
    t = load_tables(spark, sf_dir)
    p = ram_domain.pois(t["supplier"])
    a = ram_domain.admin_areas(t["nation"])
    buffer_deg = F.lit(1800.0) / 3600.0 * 120.0 / 111.0
    return S.buffer_semi_join(p, a, buffer_deg).select("aa_id", "poi_id", "poi_type")


@query(
    "j3_knn_candidates",
    oracle=f"""
    WITH o AS ({ram_domain.ORIGINS_SQL}), p AS ({ram_domain.POIS_SQL}),
    pairs AS (
      SELECT o.origin_id, p.poi_id, p.poi_type,
             sqrt((o.lon - p.lon) * (o.lon - p.lon)
                  + (o.lat - p.lat) * (o.lat - p.lat)) AS dist_deg
      FROM o CROSS JOIN p
    )
    SELECT origin_id, poi_id, poi_type, dist_deg, rk FROM (
      SELECT *, row_number() OVER (PARTITION BY origin_id
                                   ORDER BY dist_deg, poi_id) AS rk
      FROM pairs
    ) WHERE rk <= 4
    """,
    survey="J3 adaptive loop → bounded KNN (tasks.js:71-87; SURVEY §7 hard-1)",
)
def q_j3_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The adaptive buffer-enlargement loop replaced by rank-over-distance:
    exactly min(4, total) nearest candidates per origin, no iteration."""
    t = load_tables(spark, sf_dir)
    o = ram_domain.origins(t["customer"])
    p = ram_domain.pois(t["supplier"])
    out = S.knn_candidates(o, p, k=4, per_type=False)
    return out.select("origin_id", "poi_id", "poi_type", "dist_deg", "rk")


@query(
    "j7_square_grid_clip",
    oracle=f"""
    WITH a AS ({ram_domain.ADMIN_AREAS_SQL})
    SELECT aa_id, cx.cell_x, cy.cell_y,
           greatest(CAST(cx.cell_x AS DOUBLE) * {CELL_DEG}, xmin) AS clip_xmin,
           greatest(CAST(cy.cell_y AS DOUBLE) * {CELL_DEG}, ymin) AS clip_ymin,
           least(CAST(cx.cell_x AS DOUBLE) * {CELL_DEG} + {CELL_DEG}, xmax) AS clip_xmax,
           least(CAST(cy.cell_y AS DOUBLE) * {CELL_DEG} + {CELL_DEG}, ymax) AS clip_ymax
    FROM a,
      LATERAL (SELECT unnest(generate_series(CAST(floor(xmin / {CELL_DEG}) AS BIGINT),
                                             CAST(floor(xmax / {CELL_DEG}) AS BIGINT))) AS cell_x) cx,
      LATERAL (SELECT unnest(generate_series(CAST(floor(ymin / {CELL_DEG}) AS BIGINT),
                                             CAST(floor(ymax / {CELL_DEG}) AS BIGINT))) AS cell_y) cy
    WHERE greatest(CAST(cx.cell_x AS DOUBLE) * {CELL_DEG}, xmin)
          < least(CAST(cx.cell_x AS DOUBLE) * {CELL_DEG} + {CELL_DEG}, xmax)
      AND greatest(CAST(cy.cell_y AS DOUBLE) * {CELL_DEG}, ymin)
          < least(CAST(cy.cell_y AS DOUBLE) * {CELL_DEG} + {CELL_DEG}, ymax)
    """,
    survey="J7,F12,F13 (calculate-eta/index.js:61-70)",
)
def q_j7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Square grid over each admin area's bbox, clipped to the area —
    the reference's 30 km squareGrid + intersect, with empty cells pruned
    (tasks.js:35-40). Cell count is data-independent: the grid generator
    explodes `sequence`s, so executors materialize cells in parallel."""
    t = load_tables(spark, sf_dir)
    a = ram_domain.admin_areas(t["nation"])
    g = S.square_grid(a, CELL_DEG)
    return g.select(
        "aa_id", "cell_x", "cell_y", "clip_xmin", "clip_ymin", "clip_xmax", "clip_ymax"
    )


@query(
    "f11_bbox_per_admin",
    oracle=f"""
    WITH o AS ({ram_domain.ORIGINS_SQL})
    SELECT admin_id, min(lon) AS xmin, min(lat) AS ymin,
           max(lon) AS xmax, max(lat) AS ymax, count(*) AS n
    FROM o GROUP BY admin_id
    """,
    survey="F11 (turf bbox, calculate-eta/index.js:61)",
)
def q_f11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounding box per admin group (exact min/max aggregate)."""
    t = load_tables(spark, sf_dir)
    o = ram_domain.origins(t["customer"])
    return o.groupBy("admin_id").agg(
        F.min("lon").alias("xmin"),
        F.min("lat").alias("ymin"),
        F.max("lon").alias("xmax"),
        F.max("lat").alias("ymax"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "f16_centroid_per_admin",
    oracle="""
    SELECT c_nationkey AS admin_id,
           CAST(sum((c_custkey * 37) % 3600) AS DOUBLE) / count(*) / 10.0 - 180.0 AS c_lon,
           CAST(sum((c_custkey * 53) % 1700) AS DOUBLE) / count(*) / 10.0 - 85.0 AS c_lat
    FROM customer GROUP BY c_nationkey
    """,
    survey="F16 (turf centerOfMass, tasks.js:65-70)",
)
def q_f16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centroid per admin group. Averaging doubles is order-dependent, so
    the mean is computed on the exact integer tenth-degrees and converted
    once — bit-reproducible in any engine."""
    t = load_tables(spark, sf_dir)
    c = t["customer"]
    return c.groupBy(F.col("c_nationkey").alias("admin_id")).agg(
        (
            F.sum(F.col("c_custkey") * 37 % 3600).cast("double")
            / F.count(F.lit(1)) / 10.0 - 180.0
        ).alias("c_lon"),
        (
            F.sum(F.col("c_custkey") * 53 % 1700).cast("double")
            / F.count(F.lit(1)) / 10.0 - 85.0
        ).alias("c_lat"),
    )


@query(
    "f17_geometry_type_inference",
    oracle=f"""
    WITH a AS ({ram_domain.ADMIN_AREAS_SQL}),
    g AS (
      SELECT aa_id,
             CASE WHEN aa_id % 2 = 0
                  THEN '[[[' || CAST(aa_id AS VARCHAR) || ',0],[' || CAST(aa_id + 1 AS VARCHAR) || ',1]]]'
                  ELSE '[[[[' || CAST(aa_id AS VARCHAR) || ',0],[' || CAST(aa_id + 1 AS VARCHAR) || ',1]]]]'
             END AS coords
      FROM a
    )
    SELECT aa_id, coords,
           CASE WHEN coords LIKE '[[[[%' THEN 'MultiPolygon'
                WHEN coords LIKE '[[[%' THEN 'Polygon'
                ELSE 'error' END AS geom_type
    FROM g
    """,
    survey="F17 (index.js:296-306: nesting depth 3→Polygon, 4→MultiPolygon)",
)
def q_f17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometry-type inference from coordinate nesting depth, computed as a
    column expression over serialized coordinates (depth ≅ bracket run)."""
    t = load_tables(spark, sf_dir)
    a = ram_domain.admin_areas(t["nation"])
    aa = F.col("aa_id").cast("string")
    aa1 = (F.col("aa_id") + 1).cast("string")
    poly = F.concat(F.lit("[[["), aa, F.lit(",0],["), aa1, F.lit(",1]]]"))
    multi = F.concat(F.lit("[[[["), aa, F.lit(",0],["), aa1, F.lit(",1]]]]"))
    g = a.select(
        "aa_id", F.when(F.col("aa_id") % 2 == 0, poly).otherwise(multi).alias("coords")
    )
    return g.withColumn(
        "geom_type",
        F.when(F.col("coords").startswith("[[[["), "MultiPolygon")
        .when(F.col("coords").startswith("[[["), "Polygon")
        .otherwise("error"),
    )


_ADAPTIVE_KS = ", ".join(f"({k}, {float(2**k)})" for k in range(9))


@query(
    "j3_adaptive_buffer",
    oracle=f"""
    WITH p AS ({ram_domain.POIS_SQL}), a AS ({ram_domain.ADMIN_AREAS_SQL}),
    ks AS (SELECT * FROM (VALUES {_ADAPTIVE_KS}) t(k, mult)),
    counts AS (
      SELECT a.aa_id, ks.k, ({BUFFER_DEG_SQL}) * ks.mult AS buffer_deg,
             count(*) AS n_candidates
      FROM a CROSS JOIN ks JOIN p
        ON p.lon >= a.xmin - (({BUFFER_DEG_SQL}) * ks.mult)
       AND p.lon <  a.xmax + (({BUFFER_DEG_SQL}) * ks.mult)
       AND p.lat >= a.ymin - (({BUFFER_DEG_SQL}) * ks.mult)
       AND p.lat <  a.ymax + (({BUFFER_DEG_SQL}) * ks.mult)
      GROUP BY a.aa_id, ks.k, ks.mult
      HAVING count(*) >= 4
    ),
    best AS (
      SELECT aa_id, k, buffer_deg, n_candidates FROM (
        SELECT *, row_number() OVER (PARTITION BY aa_id ORDER BY k) AS rk
        FROM counts
      ) WHERE rk = 1
    )
    SELECT a.aa_id, best.k, best.buffer_deg, best.n_candidates
    FROM a LEFT JOIN best ON a.aa_id = best.aa_id
    """,
    survey="J3 adaptive buffer enlargement, declarative one-pass (tasks.js:73-87)",
)
def q_j3_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's enlarge-until-minPoi loop as ONE declarative pass:
    every buffer doubling evaluated simultaneously (areas × k broadcast
    side), smallest sufficient k picked per area — loop-identical results
    (VERDICT r1 missing #5), one POI scan instead of one per retry."""
    t = load_tables(spark, sf_dir)
    p = ram_domain.pois(t["supplier"])
    a = ram_domain.admin_areas(t["nation"])
    base = 1800.0 / 3600.0 * 120.0 / 111.0
    return S.adaptive_buffer_candidates(p, a, base, min_poi=4, max_doublings=8)


@query(
    "f_polygon_shoelace",
    oracle=f"""
    WITH h AS ({ram_domain.HUBS_SQL}),
    verts AS (
      SELECT hub_id, i.i AS i,
             lon + ((hub_id * 7 + i.i * 13) % 9) - 4 AS x,
             lat + ((hub_id * 11 + i.i * 17) % 9) - 4 AS y
      FROM h, (SELECT unnest(generate_series(1, 6)) AS i) i
    ),
    segs AS (
      SELECT a.hub_id, a.i,
             (a.x * b.y - b.x * a.y) AS cross_i,
             (a.x + b.x) * (a.x * b.y - b.x * a.y) AS sx_i,
             (a.y + b.y) * (a.x * b.y - b.x * a.y) AS sy_i
      FROM verts a JOIN verts b
        ON b.hub_id = a.hub_id AND b.i = a.i % 6 + 1
    ),
    folds AS (
      SELECT hub_id,
             list_reduce(list(cross_i ORDER BY i), (p, q) -> p + q) AS s,
             list_reduce(list(sx_i ORDER BY i), (p, q) -> p + q) AS sx,
             list_reduce(list(sy_i ORDER BY i), (p, q) -> p + q) AS sy
      FROM segs GROUP BY hub_id
    )
    SELECT hub_id AS aa_id, s / 2.0 AS area,
           CASE WHEN s <> 0.0 THEN sx / (3.0 * s) END AS cx,
           CASE WHEN s <> 0.0 THEN sy / (3.0 * s) END AS cy
    FROM folds
    """,
    survey="U3 turf.area/turf.centroid on general polygon rings (F16's geometry-ring sibling)",
    tags=("spatial",),
)
def q_polygon_shoelace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shoelace area + centroid per synthesized hexagonal admin polygon.
    The ring is built as a REAL GeoJSON coordinates array (to_json →
    from_json round trip — the path real GeoJSON geometries take into
    the engine), then folded once with exclusively IEEE-exact ops; the
    oracle replays the identical vertex derivation and fold order
    (operators/spatial.py::polygon_shoelace)."""
    t = load_tables(spark, sf_dir)
    h = ram_domain.hubs(t["nation"])
    vert = (
        "transform(sequence(1, 7), i -> array("
        "lon + double((hub_id * 7 + (if(i = 7, 1, i)) * 13) % 9) - 4, "
        "lat + double((hub_id * 11 + (if(i = 7, 1, i)) * 17) % 9) - 4))"
    )
    ring = h.select(
        F.col("hub_id").alias("aa_id"),
        F.to_json(F.expr(vert)).alias("geo_json"),
    )
    parsed = ring.select(
        "aa_id",
        F.from_json("geo_json", "array<array<double>>").alias("coords"),
    )
    out = parsed.select("aa_id", S.polygon_shoelace("coords").alias("g"))
    return out.select(
        "aa_id",
        F.col("g.area").alias("area"),
        F.col("g.cx").alias("cx"),
        F.col("g.cy").alias("cy"),
    )
