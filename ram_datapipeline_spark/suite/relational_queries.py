"""Relational query family — scans, filters, joins, aggregations, windows,
set ops, scalar functions (SURVEY §2.1-2.7).

Each query re-expresses one reference operator over the fixture star schema
(role mapping per FIXTURES.md) and carries a bit-exact DuckDB oracle.
Money aggregates use the fixed-point cents pattern
(``operators.relational.exact_money_sum``) so double summation order can't
produce cross-engine drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ram_datapipeline_spark.catalog import load_tables
from ram_datapipeline_spark.operators import relational as R
from ram_datapipeline_spark.registry import query

# ---------------------------------------------------------------------------
# §2.1 scans / sources
# ---------------------------------------------------------------------------

@query(
    "s1_config_scan_filter",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_type IN ('ECONOMY', 'PROMO') AND p_size < 30
    """,
    survey="S1,P1,P2 (index.js:200-219)",
)
def q_s1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selective config-table scan: projection + IN-list + range predicate,
    all pushed into the parquet scan by Catalyst (the reference issues the
    WHERE to Postgres — index.js:204-212)."""
    t = load_tables(spark, sf_dir)
    return (
        t["part"]
        .filter(F.col("p_type").isin("ECONOMY", "PROMO") & (F.col("p_size") < 30))
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
    )


@query(
    "s2_origins_scan",
    oracle="""
    SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
    FROM customer WHERE c_acctbal > 0.0
    """,
    survey="S2,P1 (index.js:222-231)",
)
def q_s2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projected origins scan (the reference's 5-column select)."""
    t = load_tables(spark, sf_dir)
    return t["customer"].filter(F.col("c_acctbal") > 0.0).select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )


@query(
    "s3_settings_json_decode",
    oracle="""
    SELECT event_id, user_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events WHERE event_type = 'signup'
    """,
    survey="S3,F6 (index.js:309-315)",
)
def q_s3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Settings scan + JSON decode (the reference JSON.parses a settings
    value — index.js:315); here `props` is the JSON payload column."""
    t = load_tables(spark, sf_dir)
    return (
        t["events"]
        .filter(F.col("event_type") == "signup")
        .select(
            "event_id",
            "user_id",
            F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        )
    )


@query(
    "s4_admin_scan_inlist",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation
    WHERE n_nationkey IN (1, 3, 5, 7, 11) AND n_regionkey <> 2
    """,
    survey="S4,P2,P3 (index.js:317-320)",
)
def q_s4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Admin-area scan with selected-id IN-list (scenarios_settings filter)."""
    t = load_tables(spark, sf_dir)
    return t["nation"].filter(
        F.col("n_nationkey").isin(1, 3, 5, 7, 11) & (F.col("n_regionkey") != 2)
    )


# ---------------------------------------------------------------------------
# §2.2 predicates
# ---------------------------------------------------------------------------

@query(
    "p3_negated_predicate",
    oracle="""
    SELECT o_orderpriority, count(*) AS n FROM orders
    WHERE o_orderstatus <> 'F' GROUP BY o_orderpriority
    """,
    survey="P3,A6 (operation.js:87-99)",
)
def q_p3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Negated predicate (the running-operation uniqueness check's
    andWhereNot) + count."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderstatus") != "F")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "p4_first_row",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 1
    """,
    survey="P4,W2 (index.js:206, operation.js:249-255)",
)
def q_p4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-row fetch after sort, unique tie-break (`.first()` analog)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(1)
    )


@query(
    "p6_nullsafe_round",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_discount = 0.0 THEN NULL
                ELSE CAST(floor(l_extendedprice + 0.5) AS BIGINT) END AS price_rounded
    FROM lineitem
    """,
    survey="P6,F1 (index.js:111-114)",
)
def q_p6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving rounding (the reference rounds ETA seconds only when
    reachable — `o.poi[k] === null ? null : Math.round(...)`). Half-up via
    floor(x+0.5): exact and engine-portable."""
    t = load_tables(spark, sf_dir)
    rounded = F.floor(F.col("l_extendedprice") + 0.5).cast("long")
    return t["lineitem"].select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_discount") == 0.0, F.lit(None).cast("long"))
        .otherwise(rounded)
        .alias("price_rounded"),
    )


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------

@query(
    "j1_inner_equijoin",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
    survey="J1 (index.js:230)",
)
def q_j1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join chain (origins ⋈ indicators analog); both dims
    broadcast by Catalyst."""
    t = load_tables(spark, sf_dir)
    return (
        t["customer"]
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(t["region"]), F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


@query(
    "j6_positional_explode",
    oracle="""
    SELECT doc_id, u.i - 1 AS pos, arr[u.i] AS token
    FROM (SELECT doc_id, string_split(text, ' ') AS arr
          FROM documents WHERE doc_id < 50) d,
         LATERAL (SELECT unnest(generate_series(1, len(arr))) AS i) u
    """,
    survey="J6 (tasks.js:143-151)",
)
def q_j6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional alignment done right: the reference zips parallel arrays
    by index (durations row ↔ origin idx); here position is materialized as
    an explicit key via posexplode, deterministic under shuffles."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .filter(F.col("doc_id") < 50)
        .select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token"))
    )


@query(
    "semi_anti_join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000.0)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'P')
    """,
    survey="beyond-ref join types (SURVEY §2.3 note)",
)
def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi + anti join — join types the reference lacks, free in Spark."""
    t = load_tables(spark, sf_dir)
    big = t["orders"].filter(F.col("o_totalprice") > 400000.0)
    pending = t["orders"].filter(F.col("o_orderstatus") == "P")
    return (
        t["customer"]
        .join(big, F.col("c_custkey") == big["o_custkey"], "left_semi")
        .join(pending, F.col("c_custkey") == pending["o_custkey"], "left_anti")
        .select("c_custkey", "c_name")
    )


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

@query(
    "a2_pivot_eav",
    oracle="""
    SELECT user_id,
      CAST(sum(CASE WHEN event_type = 'click'    THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END) AS DOUBLE) / 100.0 AS click,
      CAST(sum(CASE WHEN event_type = 'error'    THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END) AS DOUBLE) / 100.0 AS error,
      CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END) AS DOUBLE) / 100.0 AS purchase,
      CAST(sum(CASE WHEN event_type = 'signup'   THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END) AS DOUBLE) / 100.0 AS signup,
      CAST(sum(CASE WHEN event_type = 'view'     THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT) END) AS DOUBLE) / 100.0 AS view
    FROM events GROUP BY user_id
    """,
    survey="A2 (index.js:233-246)",
)
def q_a2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic EAV pivot (indicator keys → columns at runtime,
    `hold[o.key] = o.value`). Explicit pivot values skip the extra
    distinct-scan job; sums are fixed-point for portability."""
    t = load_tables(spark, sf_dir)
    df = t["events"].select("user_id", "event_type", R.cents(F.col("value")).alias("_c"))
    p = R.pivot_eav(df, ["user_id"], "event_type", F.sum("_c"), _EVENT_TYPES)
    return p.select(
        "user_id", *[(F.col(e).cast("double") / 100.0).alias(e) for e in _EVENT_TYPES]
    )


@query(
    "a3_unpivot_stack",
    oracle="""
    SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS value
    FROM lineitem
    UNION ALL
    SELECT l_orderkey, l_linenumber, 'extendedprice' AS measure, l_extendedprice AS value
    FROM lineitem
    """,
    survey="A3 (index.js:111-118)",
)
def q_a3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (per-origin poi map → rows for results_poi) via stack —
    values pass through untouched so the check is exact."""
    t = load_tables(spark, sf_dir)
    return R.unpivot(
        t["lineitem"],
        ["l_orderkey", "l_linenumber"],
        {"quantity": "l_quantity", "extendedprice": "l_extendedprice"},
    )


@query(
    "a4_group_nested",
    oracle="""
    SELECT o_custkey,
           string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_orderkey) AS items,
           count(*) AS n
    FROM orders GROUP BY o_custkey
    """,
    survey="A4 (index.js:550-558)",
)
def q_a4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-to-nested (per-admin-area result lists for the JSON sink),
    serialized sorted so collect order can't leak nondeterminism."""
    t = load_tables(spark, sf_dir)
    return R.grouped_collect_sorted(t["orders"], ["o_custkey"], "o_orderkey")


@query(
    "a5_union_all",
    oracle="""
    SELECT o_orderstatus, count(*) AS n FROM (
      SELECT o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_orderstatus FROM orders WHERE o_orderpriority = '2-HIGH'
    ) u GROUP BY o_orderstatus
    """,
    survey="A5 (calculate-eta/index.js:79, index.js:567-576)",
)
def q_a5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all flatten (square results → admin-area results)."""
    t = load_tables(spark, sf_dir)
    a = t["orders"].filter(F.col("o_orderpriority") == "1-URGENT").select("o_orderstatus")
    b = t["orders"].filter(F.col("o_orderpriority") == "2-HIGH").select("o_orderstatus")
    return a.unionByName(b).groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


@query(
    "a6_grouped_count",
    oracle="""
    SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    survey="A6 (calculate-eta/index.js:63)",
)
def q_a6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Counts + distinct counts per group."""
    t = load_tables(spark, sf_dir)
    return t["events"].groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("user_id").alias("n_users")
    )


# ---------------------------------------------------------------------------
# §2.5 windows / sorts / top-k
# ---------------------------------------------------------------------------

@query(
    "w1_latest_per_key",
    oracle="""
    SELECT user_id, event_id, event_type, value FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    survey="W1 (operation.js:45-59)",
)
def q_w1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest row per key (newest operation per project/scenario), with a
    unique tie-break column for determinism."""
    t = load_tables(spark, sf_dir)
    out = R.latest_per_key(t["events"], ["user_id"], ["ts", "event_id"])
    return out.select("user_id", "event_id", "event_type", "value")


@query(
    "w2_sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
    """,
    survey="W2 (operation.js:249-255)",
)
def q_w2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sort + limit (fetchLastOperationLog analog, K=10).
    Spark executes this as TakeOrderedAndProject — no full sort."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


@query(
    "w3_topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey DESC) AS rk
      FROM orders
    ) WHERE rk <= 3
    """,
    survey="W1-W3 generalization (SURVEY §2.5 note)",
)
def q_w3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group — the ranking window the reference lacks but the
    engine exposes natively."""
    t = load_tables(spark, sf_dir)
    return R.topk_per_group(
        t["orders"].select("o_custkey", "o_orderkey", "o_totalprice"),
        ["o_custkey"],
        ["o_totalprice", "o_orderkey"],
        3,
    )


# ---------------------------------------------------------------------------
# §2.7 scalar functions
# ---------------------------------------------------------------------------

@query(
    "f_scalar_kit",
    oracle="""
    SELECT p_partkey,
           printf('p%ds%d', p_partkey, p_size) AS path_name,
           concat(p_brand, ':', p_type) AS brand_type,
           least(p_size, 25) AS size_capped,
           greatest(p_size, 5) AS size_floored,
           CAST(floor(p_retailprice + 0.5) AS BIGINT) AS price_rounded
    FROM part
    """,
    survey="F1,F2,F8 (index.js:17,491-492; tasks.js:279)",
)
def q_fscalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar kit: string templating (file-path style `p<proj>s<sc>`),
    least/greatest (the Infinity-sentinel min analog), rounding."""
    t = load_tables(spark, sf_dir)
    return t["part"].select(
        "p_partkey",
        F.format_string("p%ds%d", F.col("p_partkey"), F.col("p_size")).alias("path_name"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.least(F.col("p_size"), F.lit(25)).alias("size_capped"),
        F.greatest(F.col("p_size"), F.lit(5)).alias("size_floored"),
        F.floor(F.col("p_retailprice") + 0.5).cast("long").alias("price_rounded"),
    )


@query(
    "f7_date_parts",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(year FROM o_orderdate) AS INTEGER) AS yr,
           CAST(EXTRACT(month FROM o_orderdate) AS INTEGER) AS mo,
           strftime(o_orderdate, '%Y-%m-%d') AS day_str
    FROM orders WHERE o_orderkey < 1000
    """,
    survey="F7 (index.js:491,499-500)",
)
def q_f7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp parts + formatting (created_at / res_gen_at handling)."""
    t = load_tables(spark, sf_dir)
    return (
        t["orders"]
        .filter(F.col("o_orderkey") < 1000)
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("day_str"),
        )
    )


# ---------------------------------------------------------------------------
# Composite analytics (TPC-H-shaped; exercise multi-join + agg at scale)
# ---------------------------------------------------------------------------

@query(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
           CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
           CAST(sum(CAST(floor((l_extendedprice * (1.0 - l_discount)) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_disc_price,
           CAST(sum(CAST(floor(((l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax)) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_charge,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey="A1-A6 composite; TPC-H Q1 shape",
)
def q_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: the canonical wide-aggregate scan. Fixed-point sums
    keep it bit-reproducible; Catalyst pushes the date filter to parquet."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    charge = disc_price * (1.0 + F.col("l_tax"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
        R.exact_money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
        R.exact_money_sum(disc_price).alias("sum_disc_price"),
        R.exact_money_sum(charge).alias("sum_charge"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q3_revenue_topk",
    oracle="""
    SELECT l.l_orderkey,
           CAST(sum(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount)) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, strftime(o.o_orderdate, '%Y-%m-%d')
    ORDER BY revenue DESC, l_orderkey LIMIT 10
    """,
    survey="J1+A1+W2 composite; TPC-H Q3 shape",
)
def q_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority shape: 3-way join, grouped revenue, top-K with
    unique tie-break."""
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        t["customer"]
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(t["orders"], F.col("c_custkey") == F.col("o_custkey"))
        .join(t["lineitem"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"))
        .agg(R.exact_money_sum(rev).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .select("l_orderkey", "revenue", "orderdate")
        .limit(10)
    )


@query(
    "q5_region_revenue",
    oracle="""
    SELECT n.n_name AS nation,
           CAST(sum(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount)) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
    survey="J1 chain + A1; TPC-H Q5 shape",
)
def q_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join revenue rollup: fact table joined through three broadcast
    dims with the region filter applied before the join (Catalyst pushes
    it through)."""
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    return (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(t["region"].filter(F.col("r_name") == "ASIA")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(R.exact_money_sum(rev).alias("revenue"))
    )
