"""OSM XML source + OSM→GeoJSON conversion (SURVEY S7/S8, ram-vt parity).

Reference: `.osm` XML is consumed by `osrm-extract` (`scripts/osm2osrm.sh:32`)
and converted to GeoJSON by shelling out to `osmtogeojson`
(`ram-vt/app/index.js:121-131`) — whole-file, single-process. Here the OSM
document is a distributed scan via Spark 4's built-in XML data source
(rowTag=node / rowTag=way), and the GeoJSON conversion is a join + JSON
construction — a DAG, not a subprocess, so it scales with input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# OSM XML attribute columns arrive prefixed with "_" (XML-source convention).
_TAGS_AS_MAP = (
    "map_from_entries(transform(filter(_tags, t -> t._k is not null),"
    " t -> struct(t._k as k, t._v as v)))"
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
    raw = spark.read.format("xml").option("rowTag", "node").load(path)
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
    raw = spark.read.format("xml").option("rowTag", "way").load(path)
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
