"""ram_datapipeline_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of WorldBank-Transport/ram-datapipeline.

The reference (at /root/reference) is a Node.js batch pipeline that computes,
for every origin point inside each admin area, the travel time to the nearest
POI of each type over a road network (ram-analysis/app/index.js:36-191), plus
a format-conversion pipeline (ram-vt). This package re-expresses every one of
its data operators (SURVEY.md §2) as idiomatic Spark DataFrame plans —
declarative, Catalyst-optimized, partition-aware — and extends the surface
with large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns).

Layout:
- ``session``    SparkSession factory tuned for the target (AQE, Arrow, UTC).
- ``catalog``    table registry over the synthetic parquet fixtures.
- ``functions``  scalar/column expression kits (geo, text, json).
- ``operators``  composed DataFrame operators (eta, dedup, similarity, ...).
- ``sources``    readers/writers incl. GeoJSON.
- ``plans``      end-to-end pipeline compositions (the §3.1 DAG analog).
- ``streaming``  operation log + progress listener + streaming variants.
- ``multimodal`` binary-column plumbing with stubbed codecs.
"""

__version__ = "0.1.0"

from ram_datapipeline_spark.session import get_spark  # noqa: F401
from ram_datapipeline_spark.catalog import load_tables, TABLE_NAMES  # noqa: F401
