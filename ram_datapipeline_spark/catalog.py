"""Table registry over the synthetic parquet fixtures.

The reference acquires inputs per-job from Postgres + S3
(ram-analysis/app/index.js:200-231, 282-294, 308-339); here the same role is
played by a parquet catalog: one ``spark.read.parquet`` per table, registered
as temp views so both the DataFrame and SQL APIs see the same relations.
Parquet scans give Catalyst predicate pushdown + column pruning for free —
the reference hand-codes both as SQL select-lists/WHERE clauses (SURVEY §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# TIMESTAMP(NANOS) parquet columns, read as long nanos under
# spark.sql.legacy.parquet.nanosAsLong and converted here to microsecond
# timestamps (`div 1000` truncation — byte-identical to DuckDB's ns→µs read).
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}

# Columns that must surface as TIMESTAMP (not TIMESTAMP_NTZ) because they
# feed event-time operators — watermarks, session windows, epoch arithmetic
# — which Spark defines only on TIMESTAMP. Restricted to the event-time
# column: casting a scan column blocks parquet predicate pushdown, so the
# date columns (o_orderdate, l_shipdate) stay native NTZ where pushdown
# carries the q1/q6-style range filters into the scan.
_EVENT_TIME_COLS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
}


# DataFrames are immutable plans — cache the loaded catalog per
# (session, sf_dir) so 60+ query builders don't re-read parquet footers
_CACHE: dict[tuple[int, str, bool], dict[str, DataFrame]] = {}


def load_tables(
    spark: SparkSession,
    sf_dir: str = DEFAULT_SF_DIR,
    register: bool = True,
) -> dict[str, DataFrame]:
    """Load every fixture table from ``sf_dir`` and (optionally) register
    each as a temp view under its bare name."""
    key = (id(spark), sf_dir, register)
    cached = _CACHE.get(key)
    if cached is not None:
        if register:
            # Re-register on EVERY hit: a builder pointed at another
            # sf_dir (tests replay fixtures through temp dirs) replaces
            # the session's temp views, and a cache hit that skipped
            # re-registration would leave spark.sql() builders reading
            # the foreign tables (caught by the full-suite run in r10 —
            # 17 SQL-surface queries failed after a temp-fixture test).
            for name, df in cached.items():
                df.createOrReplaceTempView(name)
        return dict(cached)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # timestamps in the fixtures are naive instants; all date formatting /
    # extraction must interpret them as UTC regardless of whose
    # SparkSession runs the query (the driver builds its own) — otherwise
    # date_format/date_trunc shift against the DuckDB oracle
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    tables: dict[str, DataFrame] = {}
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = spark.read.parquet(path)
        for col in _NANO_TS_COLS.get(name, ()):
            if dict(df.dtypes).get(col) == "bigint":
                df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
        for col in _EVENT_TIME_COLS.get(name, ()):
            if dict(df.dtypes).get(col) == "timestamp_ntz":
                # µs-precision fixture vintages surface as TIMESTAMP_NTZ under
                # Spark 4's parquet inference; UTC session ⇒ the cast keeps
                # the same instant and wall clock, DuckDB oracles unchanged
                df = df.withColumn(col, F.col(col).cast("timestamp"))
        tables[name] = df
        if register:
            df.createOrReplaceTempView(name)
    _CACHE[key] = dict(tables)
    return tables
