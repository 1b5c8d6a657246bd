"""The catalog registers every table as a temp view, so the engine's SQL
surface (spark.sql) is a first-class API: the same query text an analyst
would run against the reference's Postgres works here — checked against
the DataFrame-API result and the DuckDB oracle contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from ram_datapipeline_spark.catalog import TABLE_NAMES, load_tables
from tests.conftest import SF_DIR, assert_frames_match


def test_all_tables_visible_in_sql(spark):
    load_tables(spark, SF_DIR)
    for name in TABLE_NAMES:
        assert spark.sql(f"SELECT * FROM {name} LIMIT 1").columns


def test_sql_equals_dataframe_api(spark, duck):
    """One composite query (join + agg + having) written three ways —
    spark.sql, DataFrame API, DuckDB — all agree exactly."""
    load_tables(spark, SF_DIR)
    sql = """
        SELECT c_nationkey AS nation_key,
               count(*) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
        HAVING count(*) > 5
    """
    via_sql = spark.sql(sql).toPandas()
    t = load_tables(spark, SF_DIR)
    via_df = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("c_nationkey").alias("nation_key"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(
                    F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
                ).cast("double")
                / 100.0
            ).alias("total"),
        )
        .filter(F.col("n_orders") > 5)
        .toPandas()
    )
    via_duck = duck.execute(sql).df()
    assert_frames_match(via_sql, via_df, name="sql_vs_df")
    assert_frames_match(via_sql, via_duck, name="sql_vs_duck")


def test_views_recover_after_foreign_sf_dir(spark, tmp_path):
    """Regression (r10 full-suite failure): a builder pointed at a
    foreign sf_dir replaces the session temp views; a subsequent
    load_tables(SF_DIR) cache hit must RE-REGISTER the canonical views
    or every spark.sql() builder afterwards reads the foreign tables."""
    from pyspark.sql import functions as F

    from ram_datapipeline_spark import queries as Q
    from ram_datapipeline_spark.catalog import TABLE_NAMES, load_tables
    from tests.conftest import SF_DIR

    d = tmp_path / "foreign"
    d.mkdir()
    for t in TABLE_NAMES:
        spark.range(0).write.parquet(str(d / f"{t}.parquet"))
    load_tables(spark, str(d))  # poisons the views
    # canonical reload must restore them (cache hit path)
    load_tables(spark, SF_DIR)
    out = Q.REGISTRY["q7_nation_volume"].builder(spark, SF_DIR)
    assert "supp_nation" in out.columns
    assert out.count() >= 0  # executes against the real lineitem schema
