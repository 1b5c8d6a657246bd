"""OSM XML source + OSM→GeoJSON conversion (SURVEY S7/S8, ram-vt parity).

Reference: `.osm` XML is consumed by `osrm-extract` (`scripts/osm2osrm.sh:32`)
and converted to GeoJSON by shelling out to `osmtogeojson`
(`ram-vt/app/index.js:121-131`) — whole-file, single-process. Here the OSM
document is a distributed scan via Spark 4's built-in XML data source
(rowTag=node / rowTag=way), and the GeoJSON conversion is a join + JSON
construction — a DAG, not a subprocess, so it scales with input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# OSM XML attribute columns arrive prefixed with "_" (XML-source convention).
# The coalesce makes the fold null-safe: under the explicit schemas below a
# tagless element parses as a NULL tag array (inference used to drop the
# column or type it struct), and the empty map — not NULL — is the
# documented output for "no tags".
_TAGS_AS_MAP = (
    "map_from_entries(transform(filter(coalesce(_tags, array()),"
    " t -> t._k is not null), t -> struct(t._k as k, t._v as v)))"
)

# Explicit read schemas (guide §6: schema inference is a full extra pass
# over the input — at planet scale a second scan of the whole XML dump;
# measured ~2 inference jobs per routing query at sf0.1). The tag field is
# always declared as the array form; _with_tag_map handles the legacy
# struct/absent variants for callers that pass their own inferred frames.
_NODE_SCHEMA = (
    "_id long, _lon double, _lat double, "
    "tag array<struct<_k: string, _v: string>>"
)
_WAY_SCHEMA = (
    "_id long, nd array<struct<_ref: long>>, "
    "tag array<struct<_k: string, _v: string>>"
)


def _with_tag_map(df: DataFrame) -> DataFrame:
    """Normalize the XML source's `tag` field (absent / struct / array of
    structs depending on occurrence count) into a map<string,string>."""
    if "tag" not in df.columns:
        return df.withColumn(
            "tags", F.expr("cast(map() as map<string,string>)")
        )
    dtype = dict(df.dtypes)["tag"]
    arr = F.col("tag") if dtype.startswith("array") else F.array(F.col("tag"))
    return df.withColumn("_tags", arr).withColumn(
        "tags", F.expr(_TAGS_AS_MAP)
    ).drop("_tags")


def read_osm_nodes(spark: SparkSession, path: str) -> DataFrame:
    """`.osm` → (node_id, lon, lat, tags map)."""
    raw = (
        spark.read.format("xml")
        .option("rowTag", "node")
        .schema(_NODE_SCHEMA)
        .load(path)
    )
    return _with_tag_map(raw).select(
        F.col("_id").cast("long").alias("node_id"),
        F.col("_lon").cast("double").alias("lon"),
        F.col("_lat").cast("double").alias("lat"),
        "tags",
    )


def read_osm_ways(spark: SparkSession, path: str) -> DataFrame:
    """`.osm` → (way_id, node_refs array<long>, tags map).

    Node refs keep document order (`nd` element order) — positional
    semantics the reference relies on implicitly; here the array IS the
    order, no index alignment across datasets (SURVEY §7 hard point 2).
    """
    raw = (
        spark.read.format("xml")
        .option("rowTag", "way")
        .schema(_WAY_SCHEMA)
        .load(path)
    )
    df = _with_tag_map(raw)
    refs = F.expr("transform(nd, x -> cast(x._ref as long))")
    return df.select(
        F.col("_id").cast("long").alias("way_id"),
        refs.alias("node_refs"),
        "tags",
    )


def osm_ways_to_geojson(nodes: DataFrame, ways: DataFrame) -> DataFrame:
    """OSM ways → GeoJSON LineString features (ram-vt `road-network` path,
    `ram-vt/app/index.js:72-91`): explode way→refs with position, join node
    coordinates, re-assemble in ref order, emit one Feature JSON per way.

    The posexplode/sort_by-position/collect pattern keeps coordinate order
    deterministic under shuffles. The node join broadcasts only when nodes
    are small; planet-scale runs shuffle on node_id — one join, no driver.
    """
    w = ways.select(
        "way_id",
        F.to_json("tags").alias("props_json"),
        F.posexplode("node_refs").alias("pos", "node_id"),
    )
    j = w.join(nodes.select("node_id", "lon", "lat"), "node_id")
    coords = (
        j.groupBy("way_id", "props_json")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "lon", "lat"))
            ).alias("pts")
        )
        .withColumn(
            "coordinates",
            F.expr("transform(pts, p -> array(p.lon, p.lat))"),
        )
    )
    feature = F.to_json(
        F.struct(
            F.lit("Feature").alias("type"),
            F.struct(
                F.lit("LineString").alias("type"),
                F.col("coordinates"),
            ).alias("geometry"),
            F.from_json(
                "props_json", "map<string,string>"
            ).alias("properties"),
        )
    )
    return coords.select(
        "way_id", feature.alias("feature_json")
    )


# ---------------------------------------------------------------------------
# OSM → routing edge list (the osrm-extract analog, SURVEY U4 input side)
# ---------------------------------------------------------------------------

# Free-flow speeds per highway class, the speed-profile role of
# osrm's car.lua (referenced by scripts/osm2osrm.sh:32-33). Values are
# engine configuration, not OSM data.
HIGHWAY_SPEED_KMH: dict[str, float] = {
    "motorway": 120.0,
    "trunk": 90.0,
    "primary": 80.0,
    "secondary": 60.0,
    "tertiary": 50.0,
    "residential": 30.0,
}
DEFAULT_SPEED_KMH = 40.0


def osm_ways_to_road_edges(
    nodes: DataFrame,
    ways: DataFrame,
    speeds: dict[str, float] | None = None,
    default_speed_kmh: float = DEFAULT_SPEED_KMH,
    km_per_deg: float = 111.0,
    honor_oneway: bool = True,
) -> DataFrame:
    """OSM ways → directed routing edge list (src, dst, w seconds): the
    in-engine analog of ``osrm-extract`` (scripts/osm2osrm.sh:32 — which
    compiles `.osm` into a weighted node graph offline; here it is one
    declarative DAG over the distributed XML scan).

    Each way contributes one edge per CONSECUTIVE ``nd``-ref pair — in
    both directions by default, but with ``honor_oneway`` (on, matching
    osrm's car profile) a ``oneway=yes|1|true`` tag keeps only the
    forward direction, ``oneway=-1`` only the reverse, and
    ``junction=roundabout`` implies forward-only when ``oneway`` is
    absent (the OSM convention osrm-extract applies). Edges are weighted
    by planar drive seconds at the highway-class speed:

        w = sqrt(dx² + dy²) · km_per_deg / speed_kmh · 3600

    — IEEE-exact operation order (matches functions.geo.eta_seconds), so a
    SQL oracle deriving the same pairs reproduces every weight
    bit-for-bit. No haversine: libm transcendentals differ across engines
    and would break oracle determinism; at routing-graph scale the planar
    metric under a fixed deg→km factor is the engine-wide convention.

    Scale shape: posexplode + ONE window (lead over pos within way_id — a
    single shuffle on way_id, partitions bounded by way length) + ONE
    equi-join on node_id for coordinates (shuffles at planet scale,
    broadcasts when nodes are small — Catalyst/AQE decide). No
    collect, no per-way driver work.
    """
    spd = dict(HIGHWAY_SPEED_KMH if speeds is None else speeds)
    speed_col = F.lit(default_speed_kmh)
    for k, v in sorted(spd.items()):
        speed_col = F.when(
            F.col("tags").getItem("highway") == k, F.lit(v)
        ).otherwise(speed_col)

    # +1 forward-only, -1 reverse-only, 0 bidirectional. Explicit
    # ``oneway`` wins; ``junction=roundabout`` implies forward-only.
    if honor_oneway:
        ow = F.col("tags").getItem("oneway")
        dir_col = (
            F.when(ow.isin("yes", "1", "true"), F.lit(1))
            .when(ow == "-1", F.lit(-1))
            .when(
                ow.isNull()
                & (F.col("tags").getItem("junction") == "roundabout"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
        )
    else:
        dir_col = F.lit(0)

    refs = ways.select(
        "way_id",
        speed_col.alias("speed_kmh"),
        dir_col.alias("oneway_dir"),
        F.posexplode("node_refs").alias("pos", "node_id"),
    )
    pts = refs.join(nodes.select("node_id", "lon", "lat"), "node_id")
    nxt = Window.partitionBy("way_id").orderBy("pos")
    # A ref whose node is absent from ``nodes`` (clipped extract) vanishes
    # in the inner join above; requiring lead(pos) == pos + 1 breaks the
    # segment chain at the gap instead of bridging the missing node with a
    # phantom straight-line edge — osrm-extract drops such segments too.
    seg = pts.select(
        "way_id",
        "speed_kmh",
        "oneway_dir",
        F.col("pos"),
        F.col("node_id").alias("src"),
        F.col("lon").alias("src_lon"),
        F.col("lat").alias("src_lat"),
        F.lead("pos").over(nxt).alias("nxt_pos"),
        F.lead("node_id").over(nxt).alias("dst"),
        F.lead("lon").over(nxt).alias("dst_lon"),
        F.lead("lat").over(nxt).alias("dst_lat"),
    ).where(
        F.col("dst").isNotNull() & (F.col("nxt_pos") == F.col("pos") + 1)
    )
    w = (
        F.sqrt(
            (F.col("src_lon") - F.col("dst_lon"))
            * (F.col("src_lon") - F.col("dst_lon"))
            + (F.col("src_lat") - F.col("dst_lat"))
            * (F.col("src_lat") - F.col("dst_lat"))
        )
        * km_per_deg
        / F.col("speed_kmh")
        * 3600.0
    )
    fwd = seg.where(F.col("oneway_dir") >= 0).select(
        "src", "dst", w.alias("w")
    )
    rev = seg.where(F.col("oneway_dir") <= 0).select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), w.alias("w")
    )
    return fwd.unionAll(rev)
