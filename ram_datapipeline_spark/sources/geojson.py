"""GeoJSON source (SURVEY S5).

Reference: `getJSONFileContents` reads a whole FeatureCollection into driver
memory and iterates features (`ram-analysis/app/s3/utils.js:31-49`, consumed
at `app/index.js:289-293`). Spark-first shape: `spark.read.json` with
`multiLine` parses the document on executors, `explode(features)` fans the
collection out to one row per feature, and geometry stays a JSON string
(lon/lat projected out for Points) so nothing ever collects to the driver.

At 100 TB the same reader handles newline-delimited GeoJSON (GeoJSONSeq,
one feature per line — the scalable wire format our GeoJSON sink emits) by
dropping `multiLine`: Spark then splits files across tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_geojson_features(
    spark: SparkSession, path: str, multiline: bool = True
) -> DataFrame:
    """FeatureCollection file(s) → one row per feature:
    (feature_type, geometry_type, geometry_json, properties_json).

    Geometry coordinates are kept as raw JSON (nesting depth varies by
    geometry type — the reference infers Polygon vs MultiPolygon from array
    depth at `app/index.js:296-306`; here the type tag is authoritative and
    the coordinates stay opaque until a consumer parses them).
    """
    raw = (
        spark.read.option("multiLine", str(multiline).lower())
        .json(path)
        .select(F.explode("features").alias("f"))
    )
    return raw.select(
        F.col("f.type").alias("feature_type"),
        F.col("f.geometry.type").alias("geometry_type"),
        F.to_json(F.col("f.geometry")).alias("geometry_json"),
        F.to_json(F.col("f.properties")).alias("properties_json"),
    )


def read_geojson_points(
    spark: SparkSession, path: str, multiline: bool = True
) -> DataFrame:
    """Point FeatureCollection → (lon, lat, properties_json).

    The shape the reference builds for origins/POIs (`app/index.js:248-262`,
    `289-293`): Point features with dynamic property bags. Coordinates are
    projected out of the geometry; properties stay a JSON string for the
    consumer to `from_json` with whatever schema the dataset carries
    (dynamic-schema hard point, SURVEY §7.4).
    """
    raw = (
        spark.read.option("multiLine", str(multiline).lower())
        .json(path)
        .select(F.explode("features").alias("f"))
    )
    return raw.filter(F.col("f.geometry.type") == "Point").select(
        F.col("f.geometry.coordinates")[0].cast("double").alias("lon"),
        F.col("f.geometry.coordinates")[1].cast("double").alias("lat"),
        F.to_json(F.col("f.properties")).alias("properties_json"),
    )
