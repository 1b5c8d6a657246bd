"""Source connectors (SURVEY §2.1 S5-S8).

The reference pulls GeoJSON from S3 (`ram-analysis/app/s3/utils.js:31-49`)
and OSM XML via `osmtogeojson` shell-outs (`ram-vt/app/index.js:121-131`).
Here both are first-class Spark reads: `spark.read.json` (multiline) for
GeoJSON and Spark 4's built-in XML data source for `.osm` — executors read
straight from the object store, no driver-side download step (S6 collapses
into the scan itself).
"""

from ram_datapipeline_spark.sources.geojson import (  # noqa: F401
    read_geojson_features,
    read_geojson_points,
)
from ram_datapipeline_spark.sources.osm import (  # noqa: F401
    osm_ways_to_geojson,
    osm_ways_to_road_edges,
    read_osm_nodes,
    read_osm_ways,
)
