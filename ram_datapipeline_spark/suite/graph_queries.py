"""Graph analytics over relationship graphs derived from the fixtures
(beyond-reference: the co-occurrence / similarity graphs a training-data
pipeline builds get mined for structure — triangle counts are the standard
clustering-coefficient / community-density primitive).

The routing-closure graph machinery lives in ``operators/graph.py``; this
module registers the oracle-gated analytic queries built on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ram_datapipeline_spark.catalog import load_tables
from ram_datapipeline_spark.operators.graph import triangle_counts
from ram_datapipeline_spark.registry import query


@query(
    "graph_triangle_count",
    oracle="""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
    ),
    edges AS (
      SELECT DISTINCT a.pk AS cu, b.pk AS cv
      FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
    ),
    deg AS (
      SELECT node, count(*) AS d
      FROM (SELECT cu AS node FROM edges UNION ALL SELECT cv AS node FROM edges)
      GROUP BY node
    ),
    oriented AS (
      SELECT CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.cu < e.cv)
                  THEN e.cu ELSE e.cv END AS src,
             CASE WHEN du.d < dv.d OR (du.d = dv.d AND e.cu < e.cv)
                  THEN e.cv ELSE e.cu END AS dst
      FROM edges e
      JOIN deg du ON e.cu = du.node
      JOIN deg dv ON e.cv = dv.node
    ),
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM oriented e1
      JOIN oriented e2 ON e1.dst = e2.src
      JOIN oriented e3 ON e3.src = e1.src AND e3.dst = e2.dst
    ),
    corners AS (
      SELECT a AS node FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri
    )
    SELECT node AS part_key, count(*) AS n_triangles
    FROM corners GROUP BY node
    """,
    survey="graph analytics: per-node triangle counts on the co-order part graph (beyond ref)",
    tags=("graph",),
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts that co-occur in an order form an undirected edge; triangles
    are triples of parts pairwise co-ordered. Degree-ordered orientation
    (``operators/graph.py::triangle_counts``) keeps the wedge join
    sub-quadratic — the oracle replays the identical (deg, id) orientation
    so both engines enumerate exactly the same triangle set."""
    t = load_tables(spark, sf_dir)
    items = t["lineitem"].select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("pk")
    ).distinct()
    a = items.select("ok", F.col("pk").alias("pa"))
    b = items.select("ok", F.col("pk").alias("pb"))
    edges = (
        a.join(b, "ok")
        .where(F.col("pa") < F.col("pb"))
        .select(F.col("pa").alias("u"), F.col("pb").alias("v"))
    )
    return triangle_counts(edges).select(
        F.col("node").alias("part_key"), "n_triangles"
    )
