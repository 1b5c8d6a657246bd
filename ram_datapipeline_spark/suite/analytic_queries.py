"""Analytic surface the reference lacks but Spark exposes natively
(SURVEY §2.4/§2.6 "not present ... available for free"): grouping sets,
set operations, distinct/approximate aggregates, and the as-of temporal
join. Everything oracle-backed except the HLL sketch (approximate by
definition; its accuracy contract is asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ram_datapipeline_spark.catalog import load_tables
from ram_datapipeline_spark.session import local_rows_df
from ram_datapipeline_spark.operators import relational as R
from ram_datapipeline_spark.operators.temporal import asof_join
from ram_datapipeline_spark.registry import query


@query(
    "agg_rollup_revenue",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           CAST(sum(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount)) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
           count(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    survey="grouping sets: rollup (§2.4 'not present', exposed natively)",
    tags=("analytic",),
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Region → nation → grand-total rollup; exact cent arithmetic so
    subtotal rows hash-match."""
    t = load_tables(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1.0 - F.col("l_discount"))
    j = (
        t["lineitem"]
        .join(t["supplier"], F.col("l_suppkey") == F.col("s_suppkey"))
        .join(t["nation"], F.col("s_nationkey") == F.col("n_nationkey"))
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        j.rollup(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            R.exact_money_sum(rev).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "agg_cube_orders",
    oracle="""
    SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS total
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY CUBE (c.c_mktsegment, o.o_orderpriority)
    """,
    survey="grouping sets: cube (§2.4 'not present', exposed natively)",
    tags=("analytic",),
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    j = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    return j.cube(
        F.col("c_mktsegment").alias("segment"),
        F.col("o_orderpriority").alias("priority"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        R.exact_money_sum(F.col("o_totalprice")).alias("total"),
    )


@query(
    "set_intersect_except",
    oracle="""
    WITH y96 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                   AND o_orderdate < TIMESTAMP '1997-01-01'),
         y97 AS (SELECT DISTINCT o_custkey FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                   AND o_orderdate < TIMESTAMP '1998-01-01')
    SELECT o_custkey, 'both' AS bucket FROM (SELECT * FROM y96 INTERSECT SELECT * FROM y97)
    UNION ALL
    SELECT o_custkey, 'only_96' AS bucket FROM (SELECT * FROM y96 EXCEPT SELECT * FROM y97)
    """,
    survey="set ops: intersect + except (§2.6 'not present', exposed natively)",
    tags=("analytic",),
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers ordering in both 1996 and 1997 vs only-1996 — intersect
    and except as first-class ops."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]

    def year(y: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= f"{y}-01-01")
                & (F.col("o_orderdate") < f"{y + 1}-01-01")
            )
            .select("o_custkey")
            .distinct()
        )

    y96, y97 = year(1996), year(1997)
    both = y96.intersect(y97).withColumn("bucket", F.lit("both"))
    only96 = y96.exceptAll(y97).withColumn("bucket", F.lit("only_96"))
    return both.unionByName(only96)


@query(
    "agg_distinct_count",
    oracle="""
    SELECT n.n_name AS nation,
           count(DISTINCT c.c_mktsegment) AS n_segments,
           count(DISTINCT o.o_orderpriority) AS n_priorities,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    survey="distinct aggregation (§2.4 'not present', exposed natively)",
    tags=("analytic",),
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    j = (
        t["orders"]
        .join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return j.groupBy(F.col("n_name").alias("nation")).agg(
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct of customers per nation — the shuffle carries
    one HLL sketch per group instead of the distinct key set; the 100 TB
    path when exact cardinality isn't required.

    Deliberately NOT registered as a driver query (de-registered round 4,
    VERDICT r3 item #3): an HLL estimate cannot be replayed bit-exact in
    DuckDB, so it sat as a permanent ``no_oracle`` red row. The sketch
    class is oracle-gated through ``agg_kmv_distinct`` (deterministic KMV,
    full DuckDB replay); this HLL path stays as engine API with its 5%
    accuracy band asserted in tests/test_analytic.py."""
    t = load_tables(spark, sf_dir)
    j = t["orders"].join(t["customer"], F.col("o_custkey") == F.col("c_custkey"))
    return j.groupBy(F.col("c_nationkey").alias("nation_key")).agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


_SCALAR_SUBQ_SQL = """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE 2 * CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
            * (SELECT count(*) FROM orders)
          > 3 * (SELECT sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                 FROM orders)
"""


@query(
    "p7_scalar_subquery",
    oracle=_SCALAR_SUBQ_SQL,
    survey="scalar subquery predicate (relational surface beyond reference)",
    tags=("analytic",),
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above 1.5× the global average price — scalar subqueries
    evaluated once and broadcast by Catalyst. The comparison is done in
    integer cents cross-multiplied by the row count, so the 'average'
    threshold never exists as a float and the predicate is bit-exact in
    any engine."""
    load_tables(spark, sf_dir)
    return spark.sql(_SCALAR_SUBQ_SQL)


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation, count(*) AS n_cust
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY GROUPING SETS ((r.r_name), (n.n_name), ())
    """,
    survey="explicit grouping sets (§2.4 'not present', exposed natively)",
    tags=("analytic",),
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric grouping sets (region-only, nation-only, grand total) —
    the shape rollup/cube can't express; exercised through the SQL API."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT r.r_name AS region, n.n_name AS nation, count(*) AS n_cust
        FROM customer c
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY GROUPING SETS ((r.r_name), (n.n_name), ())
        """
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           quantile_cont(l_extendedprice, 0.5) AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey="exact percentiles (§2.4 'not present', exposed natively)",
    tags=("analytic",),
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — Spark's `percentile`
    and DuckDB's `quantile_cont` share the linear-interpolation definition
    (lo + (hi-lo)*frac), so even float results hash-match."""
    t = load_tables(spark, sf_dir)
    return t["lineitem"].groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
    )


@query(
    "w4_moving_window_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
             AS moving_total,
           count(*) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS frame_n
    FROM orders
    """,
    survey="window frames: rolling sum over ROWS frame (§2.5 'not present', exposed natively)",
    tags=("analytic",),
)
def q_moving_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row rolling order total per customer — integer-cent accumulation
    inside the frame so the float result is order-independent and
    hash-stable."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-2, 0)
    )
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("long")
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        (F.sum(cents).over(w).cast("double") / 100.0).alias("moving_total"),
        F.count(F.lit(1)).over(w).alias("frame_n"),
    )


@query(
    "j_asof_click_view",
    oracle="""
    SELECT l.event_id, l.user_id, l.ts, l.value,
           r.ts AS ts_right, r.event_id AS view_event_id, r.value AS view_value
    FROM (SELECT * FROM events WHERE event_type = 'click') l
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') r
      ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    survey="as-of join (temporal; §2.3 'not present', custom operator)",
    tags=("analytic",),
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click joined to the user's most recent prior (or simultaneous)
    view — the union + running-last formulation vs DuckDB's native ASOF."""
    t = load_tables(spark, sf_dir)
    e = t["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_event_id"),
        F.col("value").alias("view_value"),
    )
    return asof_join(
        clicks, views, on="user_id", ts_col="ts",
        right_cols=["view_event_id", "view_value"],
    )


@query(
    "ev_user_funnel",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS first_click_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.signup_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS first_purchase_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.first_click_ts
      GROUP BY e.user_id
    )
    SELECT s.user_id, s.signup_ts, c.first_click_ts, p.first_purchase_ts
    FROM s LEFT JOIN c ON s.user_id = c.user_id
            LEFT JOIN p ON s.user_id = p.user_id
    """,
    survey="ordered event funnel (signup → click → purchase) — event analytics",
    tags=("events",),
)
def q_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered funnel: first signup, first click AFTER it, first
    purchase AFTER that. Three min-aggregates chained by key-local joins —
    every shuffle is on user_id, so at scale the three stages co-partition
    and the event table streams through once per stage; timestamps are
    selected, never summed (exact)."""
    t = load_tables(spark, sf_dir)
    e = t["events"]
    s = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click_ts"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("first_click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_ts"))
    )
    return s.join(c, "user_id", "left").join(p, "user_id", "left")


@query(
    "ev_cohort_retention",
    oracle="""
    WITH f AS (
      SELECT user_id, date_trunc('week', min(ts)) AS cohort
      FROM events GROUP BY user_id
    ),
    a AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    )
    SELECT f.cohort,
           CAST((epoch(a.wk) - epoch(f.cohort)) / 604800 AS BIGINT) AS week_offset,
           count(DISTINCT a.user_id) AS n_users
    FROM a JOIN f ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    survey="weekly cohort retention matrix — event analytics",
    tags=("events",),
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users bucketed by first-activity week (cohort) × activity-week
    offset. Week arithmetic is integer epoch seconds / 604800 — exact;
    the distinct-user count shuffles (cohort, offset, user) once after a
    map-side distinct."""
    t = load_tables(spark, sf_dir)
    e = t["events"]
    f = e.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort"))
    a = e.select("user_id", F.date_trunc("week", "ts").alias("wk")).distinct()
    j = a.join(f, "user_id").select(
        "cohort",
        ((F.col("wk").cast("long") - F.col("cohort").cast("long")) / 604800)
        .cast("long")
        .alias("week_offset"),
        "user_id",
    )
    return j.groupBy("cohort", "week_offset").agg(
        F.countDistinct("user_id").alias("n_users")
    )


@query(
    "ev_cumulative_users",
    oracle="""
    WITH active AS (
      SELECT date_trunc('day', ts) AS day, count(DISTINCT user_id) AS active_users
      FROM events GROUP BY 1
    ),
    first_seen AS (
      SELECT user_id, min(date_trunc('day', ts)) AS day
      FROM events GROUP BY user_id
    ),
    per_day AS (
      SELECT day, count(*) AS new_users FROM first_seen GROUP BY day
    )
    SELECT a.day, a.active_users,
           CAST(coalesce(p.new_users, 0) AS BIGINT) AS new_users,
           CAST(sum(coalesce(p.new_users, 0)) OVER (
             ORDER BY a.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS cum_users
    FROM active a LEFT JOIN per_day p ON a.day = p.day
    """,
    survey="event analytics: daily new / cumulative distinct users (beyond ref)",
    tags=("analytic",),
)
def q_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audience-growth curve: per day, distinct active users, first-time
    users, and the running distinct-user total. The cumulative window runs
    AFTER the reducing aggregations, over one row per calendar day — its
    unpartitioned sort is over #days rows no matter how many events exist,
    so the plan has no data-sized single-partition stage."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    e = t["events"]
    active = (
        e.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day")
    )
    per_day = first_seen.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    joined = active.join(per_day, "day", "left").select(
        "day",
        "active_users",
        F.coalesce("new_users", F.lit(0)).alias("new_users"),
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "day",
        "active_users",
        "new_users",
        F.sum("new_users").over(w).alias("cum_users"),
    )


@query(
    "ev_rolling_active",
    oracle="""
    WITH per_ud AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ),
    spine AS (SELECT DISTINCT day FROM per_ud),
    contrib AS (
      SELECT p.user_id, p.day + (o.off * INTERVAL 1 DAY) AS day
      FROM per_ud p
      CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6)) o(off)
    )
    SELECT s.day,
           (SELECT count(DISTINCT p.user_id) FROM per_ud p WHERE p.day = s.day)
             AS active_1d,
           count(DISTINCT c.user_id) AS active_7d
    FROM spine s JOIN contrib c ON c.day = s.day
    GROUP BY s.day
    """,
    survey="event analytics: trailing-7-day rolling distinct users (beyond ref)",
    tags=("analytic",),
)
def q_rolling_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily and trailing-7-day distinct active users (DAU/WAU). A
    distinct count over a sliding window has no window-function form;
    the naive range join (events × day spine, BETWEEN predicate) is a
    nested loop over fact-sized data. The scale shape used here: reduce
    to distinct (user, day) FIRST, then each row contributes to exactly
    the 7 target days it can affect via a bounded sequence explode, and
    one distinct aggregate per target day finishes — fact data crosses
    the wire once, the explode is a fixed ×7 on the already-reduced
    (user, day) set, and no nested-loop join exists in the plan."""
    t = load_tables(spark, sf_dir)
    per_ud = (
        t["events"]
        .select("user_id", F.date_trunc("day", "ts").alias("day"))
        .distinct()
    )
    spine = per_ud.select("day").distinct()
    contrib = per_ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        F.col("day").alias("src_day"),
    ).select(
        "user_id",
        F.expr("src_day + make_dt_interval(off)").alias("day"),
    )
    daily = per_ud.groupBy("day").agg(
        F.countDistinct("user_id").alias("active_1d")
    )
    rolling = (
        contrib.join(spine, "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_7d"))
    )
    return daily.join(rolling, "day").select("day", "active_1d", "active_7d")


# 52-bit md5-derived uniform draw, DuckDB-side (13 hex digits folded to a
# BIGINT < 2^52 — exactly representable in double, division exact).
def _kmv_u_sql(col: str) -> str:
    return (
        "list_reduce(list_transform(generate_series(1, 13), "
        "i -> CAST(strpos('0123456789abcdef', "
        f"substr(md5(CAST({col} AS VARCHAR)), i, 1)) - 1 AS BIGINT)), "
        "(a, b) -> a * 16 + b) / 4503599627370496.0"
    )


_KMV_U_SQL = _kmv_u_sql("user_id")


@query(
    "agg_kmv_distinct",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT event_type, {_KMV_U_SQL} AS u FROM events
    ),
    counts AS (
      SELECT event_type, count(*) AS n_exact FROM d GROUP BY event_type
    ),
    kth AS (
      SELECT event_type, u AS kth_u FROM (
        SELECT event_type, u,
               row_number() OVER (PARTITION BY event_type ORDER BY u) AS rn
        FROM d
      ) WHERE rn = 64
    )
    SELECT c.event_type, c.n_exact, k2.kth_u,
           CASE WHEN k2.kth_u IS NOT NULL THEN 63 / k2.kth_u
                ELSE CAST(c.n_exact AS DOUBLE) END AS estimate
    FROM counts c LEFT JOIN kth k2 USING (event_type)
    """,
    survey=(
        "deterministic KMV distinct-count sketch — the oracle-checkable "
        "companion to HLL's rows-only agg_approx_distinct (north star)"
    ),
    tags=("analytic", "sketch"),
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via the k-minimum-values sketch
    (k=64). Because the randomness IS the md5 order, the estimate is a
    pure function of the value set — DuckDB replays it bit-for-bit,
    which no HLL can offer (operators/sketches.py)."""
    from ram_datapipeline_spark.operators.sketches import kmv_distinct_estimate

    t = load_tables(spark, sf_dir)
    return kmv_distinct_estimate(
        t["events"], group_cols=["event_type"], value_col="user_id", k=64
    )


@query(
    "agg_heavy_hitters",
    oracle="""
    WITH t AS (
      SELECT CAST(floor(10000 / (event_id % 10000 + 1)) AS BIGINT)
             AS zipf_key
      FROM events
    )
    SELECT zipf_key, count(*) AS cnt,
           (SELECT count(*) FROM t) AS n_total
    FROM t GROUP BY zipf_key
    HAVING count(*) * 50 > (SELECT count(*) FROM t)
    """,
    survey=(
        "exact heavy hitters via two-pass Misra-Gries (mergeable "
        "bounded summaries -> broadcast candidates -> exact recount) — "
        "the frequent-items scale pattern (operators/sketches.py)"
    ),
    tags=("analytic", "sketch"),
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keys taking > 1/50 of the event stream, found the 100 TB way:
    per-partition Misra-Gries summaries bounded at 50 entries (the key
    domain never shuffles), candidate union broadcast back as a
    semi-join prune, then an exact recount + threshold filter. The key
    is a Zipf transform of event_id (floor(10000/(id%10000+1)) — ~200
    distinct values, counts ~ 1/v²) so the summaries genuinely compress
    and a handful of keys dominate; the oracle is the plain
    groupBy/HAVING the two-pass output must equal exactly."""
    from ram_datapipeline_spark.operators.sketches import (
        misra_gries_heavy_hitters,
    )

    t = load_tables(spark, sf_dir)
    ev = t["events"].select(
        F.expr(
            "CAST(floor(10000 / (event_id % 10000 + 1)) AS BIGINT)"
        ).alias("zipf_key")
    )
    return misra_gries_heavy_hitters(
        ev, "zipf_key", k=50, count_col="cnt", total_col="n_total"
    )


@query(
    "agg_quantile_sketch",
    oracle="""
    WITH s AS (
      SELECT o_orderpriority AS priority,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
             row_number() OVER (
               PARTITION BY o_orderpriority
               ORDER BY md5(CAST(o_orderkey AS VARCHAR)), o_orderkey
             ) AS rn
      FROM orders
    ),
    g AS (
      SELECT priority, count(*) AS n_sample,
             list(cents ORDER BY cents) AS vals
      FROM s WHERE rn <= 64 GROUP BY priority
    )
    SELECT priority, n_sample,
           vals[CAST(ceil(0.5 * n_sample) AS INT)] AS p50,
           vals[CAST(ceil(0.9 * n_sample) AS INT)] AS p90
    FROM g
    """,
    survey=(
        "deterministic mergeable quantile sketch (hash-defined sample, "
        "KMV idea applied to quantiles) — the oracle-checkable cousin of "
        "t-digest/KLL (scale path)"
    ),
    tags=("analytic", "sketch"),
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90 of order price cents per priority from the 64-smallest-
    md5 sample per group: the hash order IS the randomness, so the
    sample — and therefore every estimate — is bit-reproducible in any
    engine, and shard sketches merge exactly (k smallest of a union).
    Accuracy band vs exact quantiles asserted in tests/test_analytic.py."""
    from ram_datapipeline_spark.operators.sketches import (
        hash_quantile_sketch,
    )

    t = load_tables(spark, sf_dir)
    orders = t["orders"].select(
        F.col("o_orderpriority").alias("priority"),
        F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)").alias(
            "cents"
        ),
        "o_orderkey",
    )
    return hash_quantile_sketch(
        orders, "priority", "cents", "o_orderkey", k=64
    )


_CMS_BUCKET = (
    "list_reduce(list_transform(generate_series(1, 8), "
    "j -> CAST(strpos('0123456789abcdef', "
    "substr(md5(CAST({row} AS VARCHAR) || '|' || CAST({key} AS VARCHAR)), "
    "j, 1)) - 1 AS BIGINT)), (a, b) -> a * 16 + b) % 256"
)


@query(
    "agg_count_min_sketch",
    oracle=f"""
    WITH cells AS (
      SELECT r, bucket, count(*) AS cnt FROM (
        SELECT s.i AS r, {_CMS_BUCKET.format(row='s.i', key='o_custkey')} AS bucket
        FROM orders, (SELECT unnest(generate_series(0, 3)) AS i) s
      ) GROUP BY r, bucket
    ),
    probes AS (
      SELECT c_custkey AS key FROM customer WHERE c_custkey % 97 = 0
    ),
    pc AS (
      SELECT p.key, s.i AS r,
             {_CMS_BUCKET.format(row='s.i', key='p.key')} AS bucket
      FROM probes p, (SELECT unnest(generate_series(0, 3)) AS i) s
    )
    SELECT pc.key, CAST(min(coalesce(cells.cnt, 0)) AS BIGINT) AS est
    FROM pc LEFT JOIN cells USING (r, bucket)
    GROUP BY pc.key
    """,
    survey=(
        "Count-Min sketch point-frequency estimates (Cormode & "
        "Muthukrishnan '05): bounded depth×width cell table, md5-derived "
        "buckets, min-over-rows probe — the mergeable-summary companion "
        "to Misra-Gries/KMV/quantile in the sketch family (north star)"
    ),
    tags=("sketch",),
)
def q_agg_count_min_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per customer estimated through a 4×256 Count-Min
    sketch, probed at every 97th customer key (including customers with
    no orders — their estimate is whatever their buckets collided into,
    possibly 0). The corpus collapses map-side into the ≤1024-cell
    table before the only exchange; probes broadcast-join it
    (operators/sketches.py::count_min_sketch). md5 bucket hashing makes
    the sketch a pure function of the multiset — the oracle replays
    every cell and every min."""
    from ram_datapipeline_spark.operators.sketches import count_min_sketch

    t = load_tables(spark, sf_dir)
    keys = t["orders"].select(F.col("o_custkey").alias("key"))
    probes = (
        t["customer"]
        .where(F.col("c_custkey") % 97 == 0)
        .select(F.col("c_custkey").alias("key"))
    )
    return count_min_sketch(keys, "key", probes, depth=4, width=256)


@query(
    "agg_kmv_merge_rollup",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT r.r_name AS region, {_kmv_u_sql("c.c_custkey")} AS u
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    ),
    ranked AS (
      SELECT region, u,
             row_number() OVER (PARTITION BY region ORDER BY u) AS rn
      FROM d
    ),
    agg AS (
      SELECT region, count(*) AS n_minima,
             max(CASE WHEN rn = 64 THEN u END) AS kth
      FROM ranked WHERE rn <= 64 GROUP BY region
    )
    SELECT region, n_minima,
           CASE WHEN n_minima >= 64 THEN 63.0 / kth
                ELSE CAST(n_minima AS DOUBLE) END AS estimate
    FROM agg
    """,
    survey=(
        "mergeable sketch TABLES: per-nation KMV sketches rolled up to "
        "region by sketch-merge, bit-identical to a direct region build "
        "— the store-per-shard-merge-later scale pattern (north star)"
    ),
    tags=("analytic", "sketch"),
)
def q_kmv_merge_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct customers per region, computed the way a 100 TB
    pipeline would: materialize a KMV sketch table at the FINE key
    (nation — k doubles per row), then roll it up to region by merging
    sketches, never revisiting the raw corpus. The oracle computes the
    region sketch DIRECTLY from the rows — equality is the merge
    theorem (any u among the parent's k minima is among its child's k
    minima), which is precisely the property that makes per-day /
    per-shard sketch tables safe to store and merge later.

    Plan: one distinct exchange at nation grain; the nation→region map
    is broadcast; the merge re-ranks a sketch-sized table (25×≤64
    doubles) — kilobytes regardless of corpus size."""
    from ram_datapipeline_spark.operators.sketches import (
        kmv_merge_sketches,
        kmv_sketch_estimate,
        kmv_sketch_table,
    )

    t = load_tables(spark, sf_dir)
    nation_sketch = kmv_sketch_table(
        t["customer"], group_cols=["c_nationkey"], value_col="c_custkey", k=64
    )
    nation_region = (
        t["nation"]
        .join(t["region"], F.col("n_regionkey") == F.col("r_regionkey"))
        .select(
            F.col("n_nationkey").alias("c_nationkey"),
            F.col("r_name").alias("region"),
        )
    )
    merged = kmv_merge_sketches(
        nation_sketch.join(F.broadcast(nation_region), "c_nationkey"),
        group_cols=["region"],
        k=64,
    )
    return kmv_sketch_estimate(merged, k=64).select(
        "region",
        F.size("minima").cast("long").alias("n_minima"),
        "estimate",
    )


@query(
    "agg_incremental_maintain",
    oracle="""
    SELECT o_orderpriority AS priority,
           count(*) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 AS total,
           min(o_orderdate) AS first_date,
           max(o_orderdate) AS last_date,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS DOUBLE) / 100.0 / count(*) AS avg_price
    FROM orders GROUP BY o_orderpriority
    """,
    survey=(
        "incremental aggregate maintenance: delta-only scan + partial-"
        "state merge == full recompute, bit for bit (north star — the "
        "standing-rollup absorption pattern)"
    ),
    tags=("analytic", "incremental"),
)
def q_incremental_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order stats per priority maintained INCREMENTALLY: the 'stored'
    base state aggregates history (< 1996-01-01), the delta aggregates
    only the new partition (≥ 1996-01-01), and the result is their
    partial-state merge — never a rescan of base rows. The oracle is
    the full recompute; equality is the decomposability algebra
    (operators/incremental.py). Both scans carry a pushed-down date
    predicate; the merge unions two 5-row state tables.

    Cents are summed as bigints (associative), so base+delta ordering
    cannot perturb the total; avg is derived at read time from the
    (sum, count) state — an avg column would not merge."""
    from ram_datapipeline_spark.operators.incremental import (
        finalize,
        merge_partials,
        partial_aggregate,
    )

    t = load_tables(spark, sf_dir)
    keys = ["o_orderpriority"]
    specs = {
        "n_orders": ("count",),
        "cents": ("sum_cents", "o_totalprice"),
        "first_date": ("min", "o_orderdate"),
        "last_date": ("max", "o_orderdate"),
    }
    split = "1996-01-01"
    base = partial_aggregate(
        t["orders"].where(F.col("o_orderdate") < split), keys, specs
    )
    delta = partial_aggregate(
        t["orders"].where(F.col("o_orderdate") >= split), keys, specs
    )
    merged = merge_partials(base, delta, keys, specs)
    return finalize(
        merged,
        {
            "total": F.col("cents").cast("double") / 100.0,
            "avg_price": F.col("cents").cast("double") / 100.0
            / F.col("n_orders"),
        },
    ).select(
        F.col("o_orderpriority").alias("priority"),
        "n_orders", "total", "first_date", "last_date", "avg_price",
    )


@query(
    "agg_kmv_set_algebra",
    oracle=f"""
    WITH d AS (
      SELECT DISTINCT o_orderpriority AS g,
             {_kmv_u_sql("o_custkey")} AS u
      FROM orders
    ),
    ranked AS (
      SELECT g, u, row_number() OVER (PARTITION BY g ORDER BY u) AS rn
      FROM d
    ),
    sk AS (SELECT g, u, rn FROM ranked WHERE rn <= 128),
    meta AS (
      SELECT g, count(*) AS n,
             max(CASE WHEN rn = 128 THEN u END) AS kth
      FROM sk GROUP BY g
    ),
    pairs AS (
      SELECT a.g AS group_a, b.g AS group_b,
             least(CASE WHEN a.n >= 128 THEN a.kth ELSE 1.0 END,
                   CASE WHEN b.n >= 128 THEN b.kth ELSE 1.0 END) AS theta
      FROM meta a JOIN meta b ON a.g < b.g
    ),
    common AS (
      SELECT p.group_a, p.group_b, count(*) AS c
      FROM pairs p
      JOIN sk sa ON sa.g = p.group_a
      JOIN sk sb ON sb.g = p.group_b AND sb.u = sa.u
      WHERE sa.u < p.theta
      GROUP BY p.group_a, p.group_b
    )
    SELECT p.group_a, p.group_b, p.theta,
           coalesce(c.c, 0) AS n_common,
           CAST(coalesce(c.c, 0) AS DOUBLE) / p.theta AS est_shared
    FROM pairs p
    LEFT JOIN common c
      ON c.group_a = p.group_a AND c.group_b = p.group_b
    """,
    survey=(
        "sketch set algebra: pairwise intersection estimates from "
        "STORED KMV sketches alone (theta-sketch pattern) — audience-"
        "overlap questions answered without re-scanning the corpus "
        "(north star)"
    ),
    tags=("analytic", "sketch"),
)
def q_kmv_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers do each pair of order priorities share?
    Answered entirely from the per-priority KMV sketch table (k=128):
    θ-truncated sketch intersection / θ. The corpus is scanned ONCE to
    build 5 sketch rows; all 10 pair estimates are array arithmetic on
    those rows. DuckDB replays the identical hash order, θ choice and
    strict-below-θ count (operators/sketches.py)."""
    from ram_datapipeline_spark.operators.sketches import (
        kmv_pairwise_intersection,
        kmv_sketch_table,
    )

    t = load_tables(spark, sf_dir)
    sk = kmv_sketch_table(
        t["orders"], group_cols=["o_orderpriority"], value_col="o_custkey",
        k=128,
    ).withColumnRenamed("o_orderpriority", "g")
    return kmv_pairwise_intersection(sk, "g", k=128).select(
        "group_a", "group_b", "theta", "n_common", "est_shared"
    )


@query(
    "w7_time_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
             OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS hour_cents,
           count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
                          RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
             AS hour_n
    FROM events
    """,
    survey="window frames 2: time-RANGE frame (rolling 1-hour per-user "
           "totals — value-based bounds, not row counts; §2.5 beyond ref)",
    tags=("analytic",),
)
def q_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling ONE-HOUR sum and count of event value per user: a RANGE
    frame over integer epoch-µs (3 600 000 000 preceding) — unlike the
    ROWS frame (w4), the frame width follows the DATA's timestamps, so
    ties and bursts are handled identically in any engine (peers always
    in-frame). Integer-cent accumulation keeps the sum exact; one
    user-key exchange, frame evaluation is a per-partition scan."""
    from pyspark.sql.window import Window

    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3_600_000_000, 0)
    )
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("long")
    return t["events"].select(
        "event_id",
        "user_id",
        F.sum(cents).over(w).alias("hour_cents"),
        F.count(F.lit(1)).over(w).alias("hour_n"),
    )


@query(
    "agg_histogram",
    oracle="""
    WITH base AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS c
      FROM lineitem
    ), rng AS (
      SELECT flag, min(c) AS lo, max(c) AS hi FROM base GROUP BY flag
    ), binned AS (
      SELECT b.flag,
             least(9, ((b.c - r.lo) * 10) // (r.hi - r.lo + 1)) AS bin,
             r.lo, r.hi
      FROM base b JOIN rng r ON r.flag = b.flag
    )
    SELECT flag, CAST(bin AS BIGINT) AS bin,
           CAST(min(lo) + (bin * (min(hi) - min(lo) + 1)) // 10
                AS BIGINT) AS bin_lo,
           CAST(count(*) AS BIGINT) AS cnt
    FROM binned GROUP BY flag, bin
    """,
    survey=(
        "per-group equi-width histogram over integer cents: BIGINT bin "
        "arithmetic (no float edges), grouped min/max broadcast back, "
        "one (group, bin) count — the distribution-shape half of "
        "table profiling (north star)"
    ),
    tags=("aggregate", "profile"),
)
def q_agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-bin equi-width histogram of lineitem price cents per return
    flag (operators/quality.py::equiwidth_histogram): bin edges are
    exact integers — ((c - lo) * bins) div (hi - lo + 1) — so every
    engine agrees on boundary rows; two map-side-combined aggregates
    and one broadcast join, no window, no sort."""
    from ram_datapipeline_spark.operators.quality import equiwidth_histogram

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(
        F.col("l_returnflag").alias("flag"), "l_extendedprice"
    )
    return equiwidth_histogram(
        li,
        F.floor(F.col("l_extendedprice") * 100.0 + 0.5),
        ["flag"],
        bins=10,
        value_name="bin_lo",
    )


@query(
    "agg_robust_outliers",
    oracle="""
    WITH base AS (
      SELECT source, CAST(n_chars AS BIGINT) AS v FROM documents
    ), ranked AS (
      SELECT source, v,
             row_number() OVER (PARTITION BY source ORDER BY v) AS rn,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS cnt
      FROM base
    ), med AS (
      SELECT source,
             CAST(sum(CASE WHEN rn = (cnt + 1) // 2 THEN v ELSE 0 END)
                + sum(CASE WHEN rn = (cnt + 2) // 2 THEN v ELSE 0 END)
                AS BIGINT) AS med2
      FROM ranked GROUP BY source
    ), dev AS (
      SELECT b.source, b.v, abs(2 * b.v - m.med2) AS d, m.med2
      FROM base b JOIN med m ON m.source = b.source
    ), dranked AS (
      SELECT source, d,
             row_number() OVER (PARTITION BY source ORDER BY d) AS rn,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS cnt
      FROM dev
    ), mad AS (
      SELECT source,
             CAST(sum(CASE WHEN rn = (cnt + 1) // 2 THEN d ELSE 0 END)
                + sum(CASE WHEN rn = (cnt + 2) // 2 THEN d ELSE 0 END)
                AS BIGINT) AS mad2
      FROM dranked GROUP BY source
    )
    SELECT d.source,
           CAST(count(*) AS BIGINT) AS n,
           CAST(max(d.med2) AS BIGINT) AS med2,
           CAST(max(md.mad2) AS BIGINT) AS mad2,
           CAST(sum(CASE WHEN 2 * d.d > 3 * md.mad2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d JOIN mad md ON md.source = d.source
    GROUP BY d.source
    """,
    survey=(
        "median/MAD robust outlier stats per group, integer-exact: "
        "medians as 2x middle-order-statistic sums, MAD as the med2 of "
        "|2x - med2|, flags by cross-multiplication — no floats, no "
        "percentile interpolation drift (north star — quality gating)"
    ),
    tags=("aggregate", "profile"),
)
def q_agg_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source robust outlier profile of document lengths
    (operators/quality.py::robust_outlier_stats): |x - median| >
    3 * MAD evaluated entirely in BIGINT via the 2x/4x scaled order
    statistics. Group-partitioned rank windows (never a global
    window), group-sized broadcast joins back."""
    from ram_datapipeline_spark.operators.quality import robust_outlier_stats

    t = load_tables(spark, sf_dir)
    return robust_outlier_stats(
        t["documents"], F.col("n_chars"), ["source"], k_num=3, k_den=1
    )


@query(
    "ev_sessionize_batch",
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev_ts
      FROM events
    ),
    flagged AS (
      SELECT *, CASE WHEN prev_ts IS NULL
                       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
                     THEN 1 ELSE 0 END AS new_s
      FROM o
    ),
    numbered AS (
      SELECT *, sum(new_s) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sess_no
      FROM flagged
    )
    SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
           count(*) AS n_events,
           count(DISTINCT event_type) AS n_types,
           epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
    FROM numbered GROUP BY user_id, sess_no
    """,
    survey=(
        "batch gap-sessionization via Spark's native session_window "
        "aggregate (one exchange, merge inside the aggregation buffer) "
        "— event analytics, beyond ref"
    ),
    tags=("events",),
)
def q_ev_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-minute-gap sessions per user
    (operators/timeseries.py::sessionize_batch): ``session_window``
    merges in the aggregate itself — no lag/cumsum window pass, no
    second shuffle. The oracle IS the lag/cumsum formulation (a gap of
    EXACTLY 30 min still merges — session_window closes the gap
    interval, so the split condition is strictly-greater; pinned by
    tests/test_timeseries.py)."""
    from ram_datapipeline_spark.operators.timeseries import sessionize_batch

    t = load_tables(spark, sf_dir)
    return sessionize_batch(
        t["events"], key_col="user_id", ts_col="ts", gap="30 minutes",
        type_col="event_type",
    )


@query(
    "agg_weighted_median",
    oracle="""
    WITH per_v AS (
      SELECT l_returnflag,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS v,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS wv
      FROM lineitem
      GROUP BY l_returnflag, CAST(floor(l_extendedprice * 100.0 + 0.5)
                                  AS BIGINT)
    ),
    staged AS (
      SELECT l_returnflag, v,
             sum(wv) OVER (PARTITION BY l_returnflag ORDER BY v
                           ROWS UNBOUNDED PRECEDING) AS cumw,
             sum(wv) OVER (PARTITION BY l_returnflag) AS w_total
      FROM per_v
    )
    SELECT l_returnflag, CAST(min(w_total) AS BIGINT) AS w_total,
           min(v) AS w_median
    FROM staged WHERE 2 * cumw >= w_total
    GROUP BY l_returnflag
    """,
    survey=(
        "weighted median per group, integer-exact (cumulative-weight "
        "cross-multiplication, no interpolation) — robust analytics, "
        "beyond ref"
    ),
    tags=("analytic",),
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median price cents per return flag
    (operators/quality.py::weighted_median): (group, value)-grain
    pre-aggregate, ONE group-keyed cumulative window carrying the
    total, 2*cumw >= W test — the interpolation-free definition that
    hash-matches."""
    from ram_datapipeline_spark.operators.quality import weighted_median

    t = load_tables(spark, sf_dir)
    return weighted_median(
        t["lineitem"],
        ["l_returnflag"],
        value=F.floor(F.col("l_extendedprice") * 100.0 + 0.5),
        weight=F.col("l_quantity"),
    )


@query(
    "agg_corr_components",
    oracle="""
    SELECT l_returnflag, count(*) AS n,
           CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
           CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sy,
           CAST(sum(CAST(l_quantity AS BIGINT)
               * CAST(l_quantity AS BIGINT)) AS BIGINT) AS sxx,
           CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)
               * CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS syy,
           CAST(sum(CAST(l_quantity AS BIGINT)
               * CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT) AS sxy
    FROM lineitem GROUP BY l_returnflag
    """,
    survey=(
        "exact Pearson-correlation sufficient statistics per group "
        "(mergeable integer partials; corr() itself float-drifts) — "
        "beyond ref"
    ),
    tags=("analytic",),
)
def q_corr_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact (n, sx, sy, sxx, syy, sxy) for quantity-vs-price per
    return flag (operators/quality.py::corr_components): one map-side
    combined aggregate; whole dollars keep syy under BIGINT at probe
    scales (contract in the docstring)."""
    from ram_datapipeline_spark.operators.quality import corr_components

    t = load_tables(spark, sf_dir)
    return corr_components(
        t["lineitem"],
        ["l_returnflag"],
        x=F.col("l_quantity"),
        y=F.floor(F.col("l_extendedprice")),
    )


@query(
    "ev_type_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
    survey=(
        "event-type transition matrix (user-journey bigram counts) — "
        "event analytics, beyond ref"
    ),
    tags=("events",),
)
def q_ev_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive event-type bigrams per user: one user-keyed lag
    window ((ts, event_id) total order) + one count aggregate — the
    journey/Markov-chain input matrix."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = t["events"].select(
        "user_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    return (
        seq.where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@query(
    "ev_rfm_scores",
    oracle="""
    WITH per_key AS (
      SELECT user_id,
             CAST(max(epoch_us(ts)) AS BIGINT) AS _r,
             count(*) AS _f,
             CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS _m
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id
    ),
    long AS (
      SELECT user_id, 'R' AS metric, _r AS v FROM per_key
      UNION ALL SELECT user_id, 'F', _f FROM per_key
      UNION ALL SELECT user_id, 'M', _m FROM per_key
    ),
    counts AS (
      SELECT metric, v, count(*) AS c FROM long GROUP BY metric, v
    ),
    staged AS (
      SELECT metric, v,
             sum(c) OVER (PARTITION BY metric ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY metric) AS n
      FROM counts
    ),
    cuts AS (
      SELECT metric, min(v) AS t FROM staged
      WHERE 5 * cum >= 1 * n GROUP BY metric
      UNION ALL SELECT metric, min(v) FROM staged
      WHERE 5 * cum >= 2 * n GROUP BY metric
      UNION ALL SELECT metric, min(v) FROM staged
      WHERE 5 * cum >= 3 * n GROUP BY metric
      UNION ALL SELECT metric, min(v) FROM staged
      WHERE 5 * cum >= 4 * n GROUP BY metric
    ),
    scored AS (
      SELECT l.user_id, l.metric,
             CAST(1 + count(*) FILTER (WHERE l.v > c.t) AS BIGINT)
               AS score
      FROM long l JOIN cuts c ON l.metric = c.metric
      GROUP BY l.user_id, l.metric
    )
    SELECT user_id,
           max(CASE WHEN metric = 'R' THEN score END) AS r_score,
           max(CASE WHEN metric = 'F' THEN score END) AS f_score,
           max(CASE WHEN metric = 'M' THEN score END) AS m_score,
           max(CASE WHEN metric = 'R' THEN score END) * 100
             + max(CASE WHEN metric = 'F' THEN score END) * 10
             + max(CASE WHEN metric = 'M' THEN score END) AS rfm
    FROM scored GROUP BY user_id
    """,
    survey=(
        "RFM customer segmentation via exact order-statistic quantile "
        "buckets (scale-safe ntile: distinct-value-grain cutoffs, no "
        "global sort; ties score equally) — event analytics, beyond ref"
    ),
    tags=("events",),
)
def q_ev_rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quintile R/F/M scores over purchase events
    (operators/quality.py::rfm_scores on ::quantile_buckets): one
    key-grain aggregate, metrics unpivoted long, cutoffs as the
    smallest value with 5*cum >= j*n on the (metric, value) count
    grain, broadcast back as a 4-element array per metric."""
    from ram_datapipeline_spark.operators.quality import rfm_scores

    t = load_tables(spark, sf_dir)
    return rfm_scores(
        t["events"],
        key_col="user_id",
        event_filter=F.col("event_type") == "purchase",
        k=5,
    ).select(
        "user_id",
        F.col("r_score").cast("long").alias("r_score"),
        F.col("f_score").cast("long").alias("f_score"),
        F.col("m_score").cast("long").alias("m_score"),
        F.col("rfm").cast("long").alias("rfm"),
    )


@query(
    "agg_mode_exact",
    oracle="""
    WITH counts AS (
      SELECT n.n_name AS nation, c.c_mktsegment AS seg,
             count(*) AS cnt
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, c.c_mktsegment
    ),
    ranked AS (
      SELECT *, row_number() OVER (PARTITION BY nation
                                   ORDER BY cnt DESC, seg) AS rn
      FROM counts
    )
    SELECT nation, seg AS mode_segment, cnt AS mode_count
    FROM ranked WHERE rn = 1
    """,
    survey=(
        "exact per-group mode with deterministic tie-break (max count, "
        "then smallest value) — beyond ref"
    ),
    tags=("analytic",),
)
def q_agg_mode_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common market segment per nation: count to the (group,
    value) grain, then a group-bounded rank window (partition size =
    the group's distinct values, never the corpus) with the total
    (cnt DESC, value ASC) order both engines replay."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    counts = (
        t["customer"]
        .join(
            t["nation"], F.col("c_nationkey") == F.col("n_nationkey")
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.col("c_mktsegment").alias("seg"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("nation").orderBy(F.desc("cnt"), F.asc("seg"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "nation",
            F.col("seg").alias("mode_segment"),
            F.col("cnt").alias("mode_count"),
        )
    )


@query(
    "j_asof_forward",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, event_id AS view_id
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, ts,
             arg_max(CAST(floor(value * 100.0 + 0.5) AS BIGINT),
                     event_id) AS purchase_cents,
             max(event_id) AS purchase_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ),
    nxt AS (
      SELECT v.user_id, v.ts, v.view_id, min(p.ts) AS ts_right
      FROM v JOIN p ON p.user_id = v.user_id AND p.ts >= v.ts
      GROUP BY v.user_id, v.ts, v.view_id
    )
    SELECT v.user_id, v.ts, v.view_id, nxt.ts_right,
           p.purchase_cents, p.purchase_id
    FROM v
    LEFT JOIN nxt ON v.user_id = nxt.user_id AND v.ts = nxt.ts
                  AND v.view_id = nxt.view_id
    LEFT JOIN p ON p.user_id = nxt.user_id AND p.ts = nxt.ts_right
    """,
    survey=(
        "FORWARD as-of join (earliest right row at-or-after each left "
        "row — time-to-conversion lookups): union + reversed-scan "
        "running-last window, one shuffle, no range explosion "
        "(backward variant = j_asof_click_view)"
    ),
    tags=("analytic",),
)
def q_j_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each view's NEXT purchase by the same user (>= inclusive)
    (operators/temporal.py::asof_join_forward). Purchases are
    pre-deduplicated per (user, microsecond) by max event_id so the
    carried payload is deterministic; the oracle is the independent
    range-join-aggregate formulation."""
    from ram_datapipeline_spark.operators.temporal import asof_join_forward

    t = load_tables(spark, sf_dir)
    e = t["events"]
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.expr(
                "max_by(CAST(floor(value * 100.0 + 0.5) AS BIGINT),"
                " event_id)"
            ).alias("purchase_cents"),
            F.max("event_id").alias("purchase_id"),
        )
    )
    return asof_join_forward(
        views, purchases, on="user_id",
        right_cols=["purchase_cents", "purchase_id"],
    )


@query(
    "j_asof_nearest",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, event_id AS view_id
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, ts,
             arg_max(CAST(floor(value * 100.0 + 0.5) AS BIGINT),
                     event_id) AS purchase_cents,
             max(event_id) AS purchase_id
      FROM events WHERE event_type = 'purchase'
      GROUP BY user_id, ts
    ),
    best AS (
      SELECT user_id, ts, view_id, p_ts AS ts_right FROM (
        SELECT v.user_id, v.ts, v.view_id, p.ts AS p_ts,
               row_number() OVER (
                 PARTITION BY v.user_id, v.ts, v.view_id
                 ORDER BY abs(epoch_us(p.ts) - epoch_us(v.ts)), p.ts
               ) AS rn
        FROM v JOIN p ON p.user_id = v.user_id
      ) WHERE rn = 1
    )
    SELECT v.user_id, v.ts, v.view_id, best.ts_right,
           p.purchase_cents, p.purchase_id
    FROM v
    LEFT JOIN best ON v.user_id = best.user_id AND v.ts = best.ts
                   AND v.view_id = best.view_id
    LEFT JOIN p ON p.user_id = best.user_id AND p.ts = best.ts_right
    """,
    survey=(
        "NEAREST as-of join (either direction, tie to the earlier "
        "right row — pandas merge_asof direction='nearest'): both "
        "scans over one union + one key exchange"
    ),
    tags=("analytic",),
)
def q_j_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each view's nearest purchase in time, before or after
    (operators/temporal.py::asof_join_nearest). The oracle is the
    independent argmin-over-|Δt| range formulation; equidistant ties
    pick the earlier purchase in both."""
    from ram_datapipeline_spark.operators.temporal import asof_join_nearest

    t = load_tables(spark, sf_dir)
    e = t["events"]
    views = e.where(F.col("event_type") == "view").select(
        "user_id", "ts", F.col("event_id").alias("view_id")
    )
    purchases = (
        e.where(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(
            F.expr(
                "max_by(CAST(floor(value * 100.0 + 0.5) AS BIGINT),"
                " event_id)"
            ).alias("purchase_cents"),
            F.max("event_id").alias("purchase_id"),
        )
    )
    return asof_join_nearest(
        views, purchases, on="user_id",
        right_cols=["purchase_cents", "purchase_id"],
    )


@query(
    "agg_hhi_concentration",
    oracle="""
    WITH per AS (
      SELECT n.n_name AS nation, c.c_mktsegment AS seg,
             count(*) AS cnt
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, c.c_mktsegment
    )
    SELECT nation,
           count(*) AS n_segments,
           CAST(sum(cnt) AS BIGINT) AS total,
           CAST(sum(cnt * cnt) AS BIGINT) AS sum_sq,
           CAST(CAST(sum(cnt * cnt) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(cnt) AS BIGINT) * CAST(sum(cnt) AS BIGINT)
                    AS DOUBLE) AS hhi
    FROM per GROUP BY nation
    """,
    survey=(
        "Herfindahl–Hirschman concentration index per group, exact "
        "integer numerator/denominator (Σc² / (Σc)² — share squares "
        "never materialize as floats) — distribution analytics, "
        "beyond ref"
    ),
    tags=("analytic",),
)
def q_agg_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-segment concentration per nation: two map-side-combined
    aggregates (value grain then group grain); the HHI double is one
    IEEE division of exact BIGINTs."""
    t = load_tables(spark, sf_dir)
    per = (
        t["customer"]
        .join(t["nation"], F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return per.groupBy("nation").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("cnt").cast("long").alias("total"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("sum_sq"),
    ).select(
        "*",
        (
            F.col("sum_sq").cast("double")
            / (F.col("total") * F.col("total")).cast("double")
        ).alias("hhi"),
    )


@query(
    "ev_inter_event_stats",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(lag(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT user_id, count(*) AS n_gaps,
           CAST(min(gap_us) AS BIGINT) AS min_gap_us,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us,
           CAST(sum(gap_us) AS BIGINT) AS sum_gap_us,
           CAST(CAST(sum(gap_us) AS BIGINT) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS mean_gap_us
    FROM gaps WHERE gap_us IS NOT NULL
    GROUP BY user_id
    """,
    survey=(
        "inter-event gap statistics per key (activity-cadence profile: "
        "exact µs min/max/sum, one-division mean) — event analytics, "
        "beyond ref"
    ),
    tags=("events",),
)
def q_ev_inter_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-arrival profile: one user-keyed lag window, one
    aggregate on the same key — exact BIGINT microsecond arithmetic."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = t["events"].select(
        "user_id",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    )
    return (
        gaps.where(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.min("gap_us").cast("long").alias("min_gap_us"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
            F.sum("gap_us").cast("long").alias("sum_gap_us"),
        )
        .select(
            "*",
            (
                F.col("sum_gap_us").cast("double")
                / F.col("n_gaps").cast("double")
            ).alias("mean_gap_us"),
        )
    )


@query(
    "j_asof_tolerance",
    oracle="""
    WITH v AS (
      SELECT user_id, ts,
             max(event_id) AS view_event_id,
             arg_max(value, event_id) AS view_value
      FROM events WHERE event_type = 'view'
      GROUP BY user_id, ts
    ),
    j AS (
      SELECT l.event_id, l.user_id, l.ts,
             r.ts AS m_ts, r.view_event_id AS m_id, r.view_value AS m_val
      FROM (SELECT event_id, user_id, ts FROM events
            WHERE event_type = 'click') l
      ASOF LEFT JOIN v r
        ON l.user_id = r.user_id AND l.ts >= r.ts
    )
    SELECT event_id, user_id, ts,
           CASE WHEN epoch_us(ts) - epoch_us(m_ts) <= 3600000000
                THEN m_ts END AS ts_right,
           CASE WHEN epoch_us(ts) - epoch_us(m_ts) <= 3600000000
                THEN m_id END AS view_event_id,
           CASE WHEN epoch_us(ts) - epoch_us(m_ts) <= 3600000000
                THEN m_val END AS view_value
    FROM j
    """,
    survey=(
        "bounded as-of join (merge_asof tolerance semantics): newest "
        "prior right row REJECTED when further than the max gap, with "
        "a deterministic intra-timestamp tiebreak on the right side — "
        "temporal §2.3 family (VERDICT r8 #5)"
    ),
    tags=("analytic",),
)
def q_j_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each click's most recent prior view by the same user, but only
    if it happened within the last hour — stale context is worse than
    none for attribution. Exercises BOTH round-9 knobs of
    operators/temporal.py::asof_join: tolerance_us (a pure projection
    after the carry — plan shape unchanged, one key exchange) and
    tiebreak_col (greatest view_event_id wins among equal-microsecond
    views, so the payload is engine-reproducible). The oracle is
    DuckDB's native ASOF JOIN with the same gap filter."""
    from ram_datapipeline_spark.operators.temporal import asof_join

    t = load_tables(spark, sf_dir)
    e = t["events"]
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "user_id",
        "ts",
        F.col("event_id").alias("view_event_id"),
        F.col("value").alias("view_value"),
    )
    return asof_join(
        clicks,
        views,
        on="user_id",
        ts_col="ts",
        right_cols=["view_event_id", "view_value"],
        tolerance_us=3_600_000_000,
        tiebreak_col="view_event_id",
    )


@query(
    "j_event_state_asof",
    oracle="""
    WITH ch AS (
      SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events WHERE event_type <> 'purchase'
    ),
    runs AS (
      SELECT user_id, event_type, ts, event_id FROM ch
      WHERE prev IS NULL OR prev <> event_type
    ),
    scd AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM runs
    ),
    iv AS (
      SELECT * FROM scd
      WHERE valid_to IS NULL OR valid_from < valid_to
    ),
    p AS (
      SELECT event_id, user_id, ts,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, p.cents,
           iv.valid_from AS ts_right, iv.state, iv.valid_to
    FROM p LEFT JOIN iv
      ON iv.user_id = p.user_id
     AND iv.valid_from <= p.ts
     AND (p.ts < iv.valid_to OR iv.valid_to IS NULL)
    """,
    survey=(
        "event-to-dimension-state lookup ('state at event time'): "
        "purchases joined to the SCD2 interval valid at their "
        "timestamp — implemented as a backward AS-OF join to interval "
        "starts (one key exchange) instead of a range join; oracle IS "
        "the interval range join (beyond-ref temporal §2.3 family)"
    ),
    tags=("analytic",),
)
def q_j_event_state_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each purchase joined to the user's activity state (the SCD2
    event-type run derived from their NON-purchase stream) valid at
    purchase time. Because SCD2 intervals are contiguous per key,
    'the interval containing t' == 'the latest interval STARTING at or
    before t' — so the lookup is asof_join on interval starts (union +
    one running-last key window, operators/temporal.py) rather than a
    range join, the shape that survives 100 TB. Zero-length runs
    (two state changes in one microsecond) are dropped first, making
    (user, valid_from) unique — the as-of determinism precondition —
    exactly as the oracle's range predicate skips empty intervals."""
    from ram_datapipeline_spark.operators.temporal import (
        asof_join,
        scd2_intervals,
    )

    t = load_tables(spark, sf_dir)
    e = t["events"]
    dim = scd2_intervals(e.where(F.col("event_type") != "purchase"))
    iv = dim.where(
        F.col("valid_to").isNull() | (F.col("valid_from") < F.col("valid_to"))
    ).select(
        "user_id",
        F.col("valid_from").alias("ts"),
        F.col("value").alias("state"),
        "valid_to",
    )
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.floor(F.col("value") * 100.0 + 0.5).cast("long").alias("cents"),
    )
    return asof_join(
        purchases, iv, on="user_id", ts_col="ts",
        right_cols=["state", "valid_to"],
    )


@query(
    "w9_pareto_front",
    oracle="""
    WITH per AS (
      SELECT p_partkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sold,
             CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)
               AS price_cents
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_partkey, p_retailprice
    )
    SELECT p.p_partkey, p.qty_sold, p.price_cents
    FROM per p
    WHERE NOT EXISTS (
      SELECT 1 FROM per q
      WHERE q.qty_sold >= p.qty_sold
        AND q.price_cents >= p.price_cents
        AND (q.qty_sold > p.qty_sold OR q.price_cents > p.price_cents)
    )
    """,
    survey=(
        "2-D skyline / Pareto front (preference query, Börzsönyi "
        "ICDE'01): non-dominated rows under two maximized criteria — "
        "x-grain reduce + range-exchange prefix-max fold, NEVER the "
        "O(n²) dominance self-join; oracle IS the NOT EXISTS "
        "definition (beyond-ref window/analytic family)"
    ),
    tags=("analytic",),
)
def q_w9_pareto_front(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts on the volume × price Pareto front — sells at least as
    much AND costs at least as much as every rival, one strictly more
    (popularity and price anti-correlate, so the front is a real
    frontier, not a single corner point).
    operators/relational.py::pareto_front_2d — one per-part aggregate,
    one x-grain prefix-max fold (layout.global_prefix_max: range
    exchange + Arrow pass, no single-partition window), one join back.
    The oracle replays the quadratic NOT EXISTS definition — an
    independent algorithm."""
    from ram_datapipeline_spark.operators.relational import pareto_front_2d

    t = load_tables(spark, sf_dir)
    per = (
        t["lineitem"]
        .join(t["part"], F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_partkey", "p_retailprice")
        .agg(
            F.sum(F.col("l_quantity").cast("long"))
            .cast("long")
            .alias("qty_sold"),
        )
        .select(
            "p_partkey",
            "qty_sold",
            F.floor(F.col("p_retailprice") * 100.0 + 0.5)
            .cast("long")
            .alias("price_cents"),
        )
    )
    return pareto_front_2d(per, "qty_sold", "price_cents")


@query(
    "agg_ks_drift",
    oracle="""
    WITH pc AS (
      SELECT event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS cg
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, floor(value * 100.0 + 0.5)
    ),
    gc AS (SELECT v, CAST(sum(cg) AS BIGINT) AS call FROM pc GROUP BY v),
    sizes AS (SELECT event_type, CAST(sum(cg) AS BIGINT) AS n_g
              FROM pc GROUP BY event_type),
    total AS (SELECT CAST(sum(n_g) AS BIGINT) AS tot FROM sizes),
    grid AS (
      SELECT s.event_type, g.v, g.call, s.n_g, t.tot,
             COALESCE(p.cg, 0) AS cg
      FROM sizes s CROSS JOIN gc g CROSS JOIN total t
      LEFT JOIN pc p ON p.event_type = s.event_type AND p.v = g.v
    ),
    stepped AS (
      SELECT event_type, n_g, tot,
             CAST(abs(sum(cg) OVER w * (tot - n_g)
                      - (sum(call) OVER w - sum(cg) OVER w) * n_g)
                  AS BIGINT) AS d
      FROM grid
      WINDOW w AS (PARTITION BY event_type ORDER BY v
                   ROWS UNBOUNDED PRECEDING)
    )
    SELECT event_type,
           CAST(max(n_g) AS BIGINT) AS n_g,
           CAST(max(tot) - max(n_g) AS BIGINT) AS n_rest,
           CAST(max(d) AS BIGINT) AS ks_num,
           CAST(max(n_g) * (max(tot) - max(n_g)) AS BIGINT) AS ks_den,
           CASE WHEN max(n_g) * (max(tot) - max(n_g)) = 0 THEN NULL
                ELSE CAST(max(d) AS DOUBLE)
                     / CAST(max(n_g) * (max(tot) - max(n_g)) AS DOUBLE)
           END AS ks_d
    FROM stepped GROUP BY event_type
    """,
    survey=(
        "exact two-sample Kolmogorov-Smirnov drift, one-vs-rest per "
        "group: integer cross-multiplied ECDF gap maximized over the "
        "quantized value grid; the table is scanned once, all KS work "
        "runs on the groups x distinct-values grain (beyond-ref "
        "distribution-drift screen for corpus/source monitoring)"
    ),
    tags=("analytic",),
)
def q_agg_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KS distance of each event type's value distribution vs the rest
    (operators/quality.py::ks_one_vs_rest): one map-side-combined
    (group, value) count, densified group x value grid, per-group
    ordered cum window, BIGINT sup-gap + one division."""
    from ram_datapipeline_spark.operators.quality import ks_one_vs_rest

    t = load_tables(spark, sf_dir)
    return ks_one_vs_rest(
        t["events"], "event_type", F.floor(F.col("value") * 100.0 + 0.5)
    )


@query(
    "agg_mann_whitney",
    oracle="""
    WITH pc AS (
      SELECT event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v,
             CAST(count(*) AS BIGINT) AS cg
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type, floor(value * 100.0 + 0.5)
    ),
    gc AS (SELECT v, CAST(sum(cg) AS BIGINT) AS call FROM pc GROUP BY v),
    sizes AS (SELECT event_type, CAST(sum(cg) AS BIGINT) AS n_g
              FROM pc GROUP BY event_type),
    total AS (SELECT CAST(sum(n_g) AS BIGINT) AS tot FROM sizes),
    grid AS (
      SELECT s.event_type, g.v, g.call, COALESCE(p.cg, 0) AS cg
      FROM sizes s CROSS JOIN gc g
      LEFT JOIN pc p ON p.event_type = s.event_type AND p.v = g.v
    ),
    stepped AS (
      SELECT event_type,
             cg * (2 * (sum(call) OVER w - call) + call + 1) AS r2c
      FROM grid
      WINDOW w AS (PARTITION BY event_type ORDER BY v
                   ROWS UNBOUNDED PRECEDING)
    ),
    r AS (
      SELECT event_type, CAST(sum(r2c) AS BIGINT) AS r2
      FROM stepped GROUP BY event_type
    )
    SELECT r.event_type, s.n_g,
           CAST(t.tot - s.n_g AS BIGINT) AS n_rest,
           CAST(r.r2 - s.n_g * (s.n_g + 1) AS BIGINT) AS u2,
           CAST(2 * s.n_g * (t.tot - s.n_g) AS BIGINT) AS u2_den,
           CASE WHEN 2 * s.n_g * (t.tot - s.n_g) = 0 THEN NULL
                ELSE CAST(r.r2 - s.n_g * (s.n_g + 1) AS DOUBLE)
                     / CAST(2 * s.n_g * (t.tot - s.n_g) AS DOUBLE)
           END AS auc
    FROM r JOIN sizes s USING (event_type) CROSS JOIN total t
    """,
    survey=(
        "exact Mann-Whitney U / rank-sum drift, one-vs-rest per group "
        "with midrank tie handling as pure BIGINT arithmetic (2R, 2U); "
        "AUC effect size in one division — the rank-based companion of "
        "the KS screen, same one-scan + quantized-grid substrate "
        "(beyond-ref distribution-drift family)"
    ),
    tags=("analytic",),
)
def q_agg_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney AUC of each event type's values vs the rest
    (operators/quality.py::mann_whitney_one_vs_rest): one
    map-side-combined (group, value) count behind a checkpoint
    barrier; midrank sums on the groups x quantized-values grid."""
    from ram_datapipeline_spark.operators.quality import (
        mann_whitney_one_vs_rest,
    )

    t = load_tables(spark, sf_dir)
    return mann_whitney_one_vs_rest(
        t["events"], "event_type", F.floor(F.col("value") * 100.0 + 0.5)
    )


@query(
    "ev_funnel_latency",
    oracle="""
    WITH s AS (
      SELECT user_id, min(ts) AS signup_ts
      FROM events WHERE event_type = 'signup' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, min(e.ts) AS click_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'click' AND e.ts > s.signup_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, min(e.ts) AS purchase_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
      GROUP BY e.user_id
    ),
    lats AS (
      SELECT 'signup_to_click' AS stage, s.user_id,
             CAST(epoch_us(c.click_ts) - epoch_us(s.signup_ts) AS BIGINT) AS lat_us
      FROM s JOIN c ON s.user_id = c.user_id
      UNION ALL
      SELECT 'click_to_purchase', c.user_id,
             CAST(epoch_us(p.purchase_ts) - epoch_us(c.click_ts) AS BIGINT)
      FROM c JOIN p ON c.user_id = p.user_id
    ),
    entered AS (
      SELECT 'signup_to_click' AS stage, CAST(count(*) AS BIGINT) AS n_entered FROM s
      UNION ALL
      SELECT 'click_to_purchase', CAST(count(*) AS BIGINT) FROM c
    ),
    ranked AS (
      SELECT stage, lat_us,
             row_number() OVER (PARTITION BY stage ORDER BY lat_us, user_id) AS rn,
             count(*) OVER (PARTITION BY stage) AS cnt
      FROM lats
    ),
    agg AS (
      SELECT stage,
             CAST(max(cnt) AS BIGINT) AS n_converted,
             CAST(min(lat_us) AS BIGINT) AS min_us,
             CAST(max(lat_us) AS BIGINT) AS max_us,
             CAST(sum(lat_us) AS BIGINT) AS sum_us,
             CAST(min_by(lat_us, rn) FILTER (
               WHERE rn * 2 = (cnt + 1) - ((cnt + 1) % 2)
                  OR rn * 2 = (cnt + 2) - ((cnt + 2) % 2)) AS BIGINT) AS med_lo,
             CAST(max_by(lat_us, rn) FILTER (
               WHERE rn * 2 = (cnt + 1) - ((cnt + 1) % 2)
                  OR rn * 2 = (cnt + 2) - ((cnt + 2) % 2)) AS BIGINT) AS med_hi
      FROM ranked GROUP BY stage
    )
    SELECT e.stage, e.n_entered,
           COALESCE(a.n_converted, 0) AS n_converted,
           a.min_us, a.max_us, a.sum_us,
           CAST(a.med_lo + a.med_hi AS BIGINT) AS med2_us,
           CAST(a.med_lo + a.med_hi AS DOUBLE) / 2.0 AS median_us,
           CAST(a.sum_us AS DOUBLE) / CAST(a.n_converted AS DOUBLE) AS mean_us
    FROM entered e LEFT JOIN agg a ON a.stage = e.stage
    """,
    survey=(
        "funnel conversion-latency rollup (signup->click, "
        "click->purchase): per stage the entered/converted counts and "
        "EXACT min/max/mean/median of the conversion lag in "
        "microseconds — the median is SELECTED (two middle values by "
        "deterministic rank), never float-interpolated; all shuffles "
        "key on user_id or the 2-row stage grain (event analytics)"
    ),
    tags=("events",),
)
def q_ev_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency statistics per funnel stage: three chained
    min-aggregates (all user_id-keyed, co-partitioning at scale), a
    2-stage latency union, one stage-partitioned rank window for the
    exact median pick, one final stage-grain aggregate."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    e = t["events"]
    s = (
        e.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    c = (
        e.join(s, "user_id")
        .where((F.col("event_type") == "click") & (F.col("ts") > F.col("signup_ts")))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        e.join(c, "user_id")
        .where(
            (F.col("event_type") == "purchase") & (F.col("ts") > F.col("click_ts"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    lat1 = s.join(c, "user_id").select(
        F.lit("signup_to_click").alias("stage"),
        "user_id",
        (F.unix_micros("click_ts") - F.unix_micros("signup_ts"))
        .cast("long")
        .alias("lat_us"),
    )
    lat2 = c.join(p, "user_id").select(
        F.lit("click_to_purchase").alias("stage"),
        "user_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("click_ts"))
        .cast("long")
        .alias("lat_us"),
    )
    lats = lat1.unionByName(lat2)
    entered = (
        s.agg(F.count(F.lit(1)).cast("long").alias("n_entered"))
        .select(F.lit("signup_to_click").alias("stage"), "n_entered")
        .unionByName(
            c.agg(F.count(F.lit(1)).cast("long").alias("n_entered")).select(
                F.lit("click_to_purchase").alias("stage"), "n_entered"
            )
        )
    )
    wo = Window.partitionBy("stage").orderBy("lat_us", "user_id")
    wc = Window.partitionBy("stage")
    ranked = lats.select(
        "stage",
        "lat_us",
        F.row_number().over(wo).alias("_rn"),
        F.count(F.lit(1)).over(wc).alias("_cnt"),
    )
    mid = (F.col("_rn") * 2 == (F.col("_cnt") + 1) - ((F.col("_cnt") + 1) % 2)) | (
        F.col("_rn") * 2 == (F.col("_cnt") + 2) - ((F.col("_cnt") + 2) % 2)
    )
    agg = ranked.groupBy("stage").agg(
        F.max("_cnt").cast("long").alias("n_converted"),
        F.min("lat_us").cast("long").alias("min_us"),
        F.max("lat_us").cast("long").alias("max_us"),
        F.sum("lat_us").cast("long").alias("sum_us"),
        F.min_by(F.when(mid, F.col("lat_us")), F.when(mid, F.col("_rn")))
        .cast("long")
        .alias("_med_lo"),
        F.max_by(F.when(mid, F.col("lat_us")), F.when(mid, F.col("_rn")))
        .cast("long")
        .alias("_med_hi"),
    )
    # a stage with ZERO conversions must still appear in the report
    # (n_converted = 0, NULL latency stats) — an inner join silently
    # dropped it (review find); entered is the 2-row spine
    return entered.join(agg, "stage", "left").select(
        "stage",
        "n_entered",
        F.coalesce("n_converted", F.lit(0).cast("long")).alias("n_converted"),
        "min_us",
        "max_us",
        "sum_us",
        (F.col("_med_lo") + F.col("_med_hi")).cast("long").alias("med2_us"),
        ((F.col("_med_lo") + F.col("_med_hi")).cast("double") / F.lit(2.0)).alias(
            "median_us"
        ),
        (F.col("sum_us").cast("double") / F.col("n_converted").cast("double")).alias(
            "mean_us"
        ),
    )


@query(
    "agg_cramers_v",
    oracle="""
    WITH pc AS (
      SELECT event_type AS r_key,
             CAST(hour(ts) AS BIGINT) AS c_key,
             CAST(count(*) AS BIGINT) AS o
      FROM events
      WHERE event_type IS NOT NULL AND ts IS NOT NULL
      GROUP BY event_type, hour(ts)
    ),
    rt AS (SELECT r_key, CAST(sum(o) AS BIGINT) AS r FROM pc GROUP BY r_key),
    ct AS (SELECT c_key, CAST(sum(o) AS BIGINT) AS c FROM pc GROUP BY c_key),
    tot AS (
      SELECT (SELECT CAST(sum(o) AS BIGINT) FROM pc) AS n,
             (SELECT CAST(count(*) AS BIGINT) FROM rt) AS r_levels,
             (SELECT CAST(count(*) AS BIGINT) FROM ct) AS c_levels
    ),
    dense AS (
      SELECT rt.r_key, ct.c_key, rt.r, ct.c, COALESCE(pc.o, 0) AS o
      FROM rt CROSS JOIN ct
      LEFT JOIN pc ON pc.r_key = rt.r_key AND pc.c_key = ct.c_key
    ),
    cells AS (
      SELECT t.n, t.r_levels, t.c_levels,
             CAST(floor(
               (CAST(o AS DOUBLE) * CAST(t.n AS DOUBLE)
                - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
               * (CAST(o AS DOUBLE) * CAST(t.n AS DOUBLE)
                  - CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
               / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
             ) AS BIGINT) AS q
      FROM dense CROSS JOIN tot t
    )
    SELECT n, r_levels, c_levels,
           CAST(sum(q) AS BIGINT) AS chi2_fp,
           CAST(sum(q) AS DOUBLE) / CAST(n AS DOUBLE) AS chi2,
           CASE WHEN least(r_levels - 1, c_levels - 1) <= 0 THEN NULL
                ELSE sqrt((CAST(sum(q) AS DOUBLE) / CAST(n AS DOUBLE))
                          / CAST(n * least(r_levels - 1, c_levels - 1)
                                 AS DOUBLE))
           END AS cramers_v
    FROM cells GROUP BY n, r_levels, c_levels
    """,
    survey=(
        "categorical association (chi-square / Cramer's V) between "
        "event type and hour-of-day: per-cell (O*N - r*c)^2 DIV (r*c) "
        "fixed-point contributions over the DENSIFIED levels x levels "
        "grid, BIGINT-summed, one division + one sqrt — the "
        "contingency independence screen (beyond-ref drift family)"
    ),
    tags=("analytic",),
)
def q_agg_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square / Cramér's V of event_type × hour(ts)
    (operators/quality.py::cramers_v_assoc): one (row, col) count
    behind a checkpoint barrier, broadcast marginals, quantized grid."""
    from ram_datapipeline_spark.operators.quality import cramers_v_assoc

    t = load_tables(spark, sf_dir)
    return cramers_v_assoc(
        t["events"],
        F.col("event_type"),
        F.expr("hour(ts)").cast("long"),
    )


@query(
    "agg_spearman_corr",
    oracle="""
    WITH base AS (
      SELECT event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS x,
             CAST(hour(ts) AS BIGINT) AS y
      FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL
    ),
    ranked AS (
      SELECT event_type,
             CAST(2 * rank() OVER (PARTITION BY event_type ORDER BY x)
                  + count(*) OVER (PARTITION BY event_type, x) - 1
                  AS BIGINT) AS rx,
             CAST(2 * rank() OVER (PARTITION BY event_type ORDER BY y)
                  + count(*) OVER (PARTITION BY event_type, y) - 1
                  AS BIGINT) AS ry
      FROM base
    ),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             sum(rx) AS sx,
             sum(ry) AS sy,
             sum(rx * rx) AS sxx,
             sum(ry * ry) AS syy,
             sum(rx * ry) AS sxy
      FROM ranked GROUP BY event_type
    )
    SELECT event_type, n,
           CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS covn,
           CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS vxn,
           CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
             - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS vyn,
           CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                       - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) = 0
                  OR CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) = 0
                THEN NULL
                ELSE (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                            * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                               - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
           END AS rho
    FROM agg
    """,
    survey=(
        "exact Spearman rank correlation per key (value vs hour-of-day "
        "per event type): midranks as pure BIGINT 2r + c - 1, five "
        "integer sufficient statistics, rho as the pinned IEEE chain — "
        "the monotone-association screen; ONE key exchange (all four "
        "windows and the aggregate share the partitioning) "
        "(beyond-ref drift/association family)"
    ),
    tags=("analytic",),
)
def q_agg_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rho of value vs hour(ts) per event type
    (operators/quality.py::spearman_corr)."""
    from ram_datapipeline_spark.operators.quality import spearman_corr

    t = load_tables(spark, sf_dir)
    return spearman_corr(
        t["events"],
        ["event_type"],
        F.floor(F.col("value") * 100.0 + 0.5),
        F.expr("hour(ts)"),
    )


@query(
    "agg_gini_value",
    oracle="""
    WITH base AS (
      SELECT event_type, event_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
      FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT event_type, v,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY v, event_id) AS BIGINT) AS i,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM base
    ),
    agg AS (
      SELECT event_type,
             CAST(max(n) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS sum_cents,
             CAST(sum((2 * i - n - 1) * v) AS BIGINT) AS gini_num
      FROM ranked GROUP BY event_type
    )
    SELECT event_type, n, sum_cents, gini_num,
           CAST(n * sum_cents AS BIGINT) AS gini_den,
           CASE WHEN n * sum_cents = 0 THEN NULL
                ELSE CAST(gini_num AS DOUBLE)
                     / CAST(n * sum_cents AS DOUBLE) END AS gini
    FROM agg
    """,
    survey=(
        "exact Gini inequality coefficient per key (Lorenz-area "
        "statistic over cent values): BIGINT numerator "
        "sum((2i - n - 1) * x) over the (value, id) rank order, one "
        "division — value-inequality companion to the HHI "
        "count-concentration screen; ONE key exchange (beyond-ref)"
    ),
    tags=("analytic",),
)
def q_agg_gini_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini of event values per event type
    (operators/quality.py::gini_coefficient)."""
    from ram_datapipeline_spark.operators.quality import gini_coefficient

    t = load_tables(spark, sf_dir)
    return gini_coefficient(
        t["events"],
        ["event_type"],
        F.floor(F.col("value") * 100.0 + 0.5),
        "event_id",
    )


@query(
    "ev_power_users_pareto",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS ucents
      FROM events WHERE value IS NOT NULL GROUP BY user_id
    ),
    ranked AS (
      SELECT user_id, ucents,
             CAST(row_number() OVER (ORDER BY ucents DESC, user_id)
                  AS BIGINT) AS rk,
             CAST(sum(ucents) OVER (ORDER BY ucents DESC, user_id
                                    ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS cum
      FROM per_user
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ucents) AS BIGINT) AS total
      FROM per_user
    ),
    pcts AS (SELECT unnest([1, 10, 50]) AS pct)
    SELECT p.pct,
           CAST(greatest(1, n * p.pct // 100) AS BIGINT) AS k_users,
           r.cum AS top_cents,
           t.total AS total_cents,
           CAST(r.cum AS DOUBLE) / CAST(t.total AS DOUBLE) AS share
    FROM pcts p CROSS JOIN tot t
    JOIN ranked r ON r.rk = greatest(1, t.n * p.pct // 100)
    """,
    survey=(
        "power-user concentration curve: exact value share of the top "
        "1/10/50% users — user-grain roll-up, then GLOBAL rank and "
        "cumulative cents via the range-exchange prefix-sum primitive "
        "(layout.global_prefix_sum twice: weight=1 for rank, "
        "weight=cents for the Lorenz cum) — never a single-partition "
        "window over the user grain (event analytics, beyond-ref)"
    ),
    tags=("events",),
)
def q_ev_power_users_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k% user value shares
    (layout.global_prefix_sum over the user grain): two range
    exchanges (rank + cum), broadcast totals, 3-row output."""
    from ram_datapipeline_spark.operators.layout import global_prefix_sum

    t = load_tables(spark, sf_dir)
    # NULL-value guard (ADVICE r10): an all-NULL-value user would carry
    # ucents NULL into the rank ordering, where Spark (NULLS LAST on
    # DESC) and DuckDB (NULLS FIRST on DESC) disagree — filter so the
    # user grain only holds rows both engines order identically
    per_user = (
        t["events"]
        .where(F.col("value").isNotNull())
        .groupBy("user_id")
        .agg(
            F.sum(F.floor(F.col("value") * 100.0 + 0.5))
            .cast("long")
            .alias("ucents")
        )
    )
    order = [F.col("ucents").desc(), F.col("user_id")]
    cum = global_prefix_sum(per_user, order, "ucents", 8, out_col="_cum0")
    ones = cum.withColumn("_one", F.lit(1).cast("long"))
    ranked = global_prefix_sum(
        ones, [F.col("ucents").desc(), F.col("user_id")], "_one",
        8, out_col="_rk0",
    ).select(
        "user_id",
        "ucents",
        (F.col("_cum0") + F.col("ucents")).cast("long").alias("_cum"),
        (F.col("_rk0") + F.lit(1)).cast("long").alias("_rk"),
    )
    tot = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("ucents").cast("long").alias("_total"),
    )
    pcts = local_rows_df(ranked.sparkSession, [(1,), (10,), (50,)], "pct int")
    dims = F.broadcast(pcts.crossJoin(tot)).withColumn(
        "k_users",
        F.greatest(F.lit(1).cast("long"), F.expr("_n * pct DIV 100")).cast(
            "long"
        ),
    )
    return (
        ranked.join(dims, ranked["_rk"] == dims["k_users"])
        .select(
            "pct",
            "k_users",
            F.col("_cum").alias("top_cents"),
            F.col("_total").alias("total_cents"),
            (F.col("_cum").cast("double") / F.col("_total").cast("double")).alias(
                "share"
            ),
        )
    )


@query(
    "ts_interval_merge",
    oracle="""
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s,
             epoch_us(ts) + 60000000 AS e
      FROM events
      WHERE ts IS NOT NULL
    ),
    flagged AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN s > max(e) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             THEN 1 ELSE 0 END AS new_island
      FROM iv
    ),
    isl AS (
      SELECT user_id, s, e,
             CAST(sum(new_island) OVER (
               PARTITION BY user_id ORDER BY s, event_id
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island
      FROM flagged
    )
    SELECT user_id, island,
           CAST(min(s) AS BIGINT) AS start_us,
           CAST(max(e) AS BIGINT) AS end_us,
           CAST(count(*) AS BIGINT) AS n_intervals
    FROM isl GROUP BY user_id, island
    """,
    survey=(
        "interval union / merge per key (gaps-and-islands flatten): "
        "overlapping [ts, ts+60s) event windows coalesced via the "
        "exclusive running-max-of-end flag + running island counter — "
        "two ordered window passes and the aggregate on ONE key "
        "exchange, all integer microseconds (beyond-ref temporal)"
    ),
    tags=("timeseries",),
)
def q_ts_interval_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Coalesce each user's overlapping 60-second event windows into
    maximal islands — one user_id exchange; the first-row NULL running
    max starts a new island by definition."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    # NULL-ts guard (ADVICE r10): the island windows order by s, and
    # Spark (NULLS FIRST) and DuckDB (NULLS LAST) disagree on where a
    # NULL sorts — filter rather than rely on fixture cleanliness
    iv = t["events"].where(F.col("ts").isNotNull()).select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("s"),
        (F.unix_micros("ts") + F.lit(60_000_000)).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = iv.select(
        "user_id",
        "event_id",
        "s",
        "e",
        F.when(F.col("s") > F.max("e").over(w_prev), 1)
        .otherwise(0)
        .alias("_new"),
    )
    # island counter MUST use the same (s, event_id) total order as the
    # flag window — ordering by (s, e) left equal-timestamp rows in a
    # shuffle-dependent order relative to their own flag (review find)
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = flagged.select(
        "user_id",
        "s",
        "e",
        F.sum("_new").over(w_run).cast("long").alias("island"),
    )
    return isl.groupBy("user_id", "island").agg(
        F.min("s").cast("long").alias("start_us"),
        F.max("e").cast("long").alias("end_us"),
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
    )


@query(
    "agg_benford_digits",
    oracle="""
    WITH exp_fp AS (
      SELECT * FROM (VALUES
        (1, 301029996), (2, 176091259), (3, 124938737),
        (4, 96910013), (5, 79181246), (6, 66946790),
        (7, 57991947), (8, 51152522), (9, 45757491)
      ) AS t(digit, exp_fp)
    ),
    digits AS (
      SELECT event_type,
             CAST(substring(CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS BIGINT) AS digit
      FROM events
      WHERE CAST(floor(value * 100.0 + 0.5) AS BIGINT) > 0
    ),
    pc AS (
      SELECT event_type, digit, CAST(count(*) AS BIGINT) AS obs
      FROM digits GROUP BY event_type, digit
    ),
    sizes AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS n
              FROM pc GROUP BY event_type),
    dense AS (
      SELECT s.event_type, s.n, e.exp_fp, COALESCE(p.obs, 0) AS obs
      FROM sizes s CROSS JOIN exp_fp e
      LEFT JOIN pc p ON p.event_type = s.event_type AND p.digit = e.digit
    )
    SELECT event_type,
           CAST(max(n) AS BIGINT) AS n,
           CAST(max(abs(obs * 1000000000 - n * exp_fp)) AS BIGINT)
             AS mad_num,
           CAST(max(abs(obs * 1000000000 - n * exp_fp)) AS DOUBLE)
             / (CAST(max(n) AS DOUBLE) * 1e9) AS mad
    FROM dense GROUP BY event_type
    """,
    survey=(
        "Benford first-digit conformity screen per group: observed "
        "digit counts vs 1e-9 FIXED-POINT Benford constants (identical "
        "integer literals in both engines — no log10 anywhere), "
        "sup-norm deviation as a BIGINT max; the fabricated-data "
        "detector of the data-quality gate (beyond-ref drift family)"
    ),
    tags=("analytic",),
)
def q_agg_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford deviation of event values per event type
    (operators/quality.py::benford_deviation)."""
    from ram_datapipeline_spark.operators.quality import benford_deviation

    t = load_tables(spark, sf_dir)
    return benford_deviation(
        t["events"], "event_type", F.floor(F.col("value") * 100.0 + 0.5)
    )


@query(
    "agg_anova_f",
    oracle="""
    WITH per AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS s_g,
             CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                      * CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS sxx_g,
             CAST(floor(CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                             AS DOUBLE)
                        * CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                               AS DOUBLE)
                        / CAST(count(*) AS DOUBLE)) AS BIGINT) AS t_g
      FROM events WHERE value IS NOT NULL GROUP BY event_type
    ),
    folded AS (
      SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(n_g) AS BIGINT) AS n,
             CAST(sum(s_g) AS BIGINT) AS stot,
             CAST(sum(sxx_g) AS BIGINT) AS sxxtot,
             CAST(sum(t_g) AS BIGINT) AS ssb_raw
      FROM per
    ),
    o AS (
      SELECT k, n,
             CAST(greatest(0, ssb_raw
                              - CAST(floor(CAST(stot AS DOUBLE)
                                           * CAST(stot AS DOUBLE)
                                           / CAST(n AS DOUBLE)) AS BIGINT))
                  AS BIGINT) AS ssb,
             CAST(sxxtot - ssb_raw AS BIGINT) AS ssw
      FROM folded
    )
    SELECT k, n, ssb, ssw,
           CASE WHEN k < 2 OR n <= k OR ssw <= 0 THEN NULL
                ELSE (CAST(ssb AS DOUBLE) / CAST(k - 1 AS DOUBLE))
                     / (CAST(ssw AS DOUBLE) / CAST(n - k AS DOUBLE))
           END AS f_stat
    FROM o
    """,
    survey=(
        "one-way ANOVA F across all groups: BIGINT per-group "
        "sufficient statistics, S^2/n floored through the pinned "
        "double chain then BIGINT-summed (no float accumulation "
        "order), one final ratio — the parametric mean-shift screen "
        "completing KS / Mann-Whitney (beyond-ref drift family)"
    ),
    tags=("analytic",),
)
def q_agg_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F of event values across event types
    (operators/quality.py::anova_f_oneway): one map-side-combined
    group aggregate, then a k-row fold."""
    from ram_datapipeline_spark.operators.quality import anova_f_oneway

    t = load_tables(spark, sf_dir)
    return anova_f_oneway(
        t["events"], "event_type", F.floor(F.col("value") * 100.0 + 0.5)
    )


@query(
    "ev_retention_cohorts",
    oracle="""
    WITH ev AS (
      SELECT user_id,
             epoch_us(ts) // 604800000000 AS w
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    first AS (
      SELECT user_id, min(w) AS cohort_week FROM ev GROUP BY user_id
    ),
    cells AS (
      SELECT DISTINCT f.cohort_week, e.w - f.cohort_week AS offset_weeks,
             e.user_id
      FROM ev e JOIN first f USING (user_id)
    )
    SELECT cohort_week, offset_weeks,
           CAST(count(*) AS BIGINT) AS n_users
    FROM cells GROUP BY cohort_week, offset_weeks
    """,
    survey=(
        "cohort retention matrix: users bucketed by first-active epoch "
        "week, distinct returners counted per later week — epoch-"
        "anchored integer 7-day buckets, no calendar functions (event "
        "analytics, beyond ref)"
    ),
    tags=("events",),
)
def q_ev_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts (operators/events.py::retention_cohorts):
    one user-grain min aggregate, one co-located user join back, one
    distinct on the (cohort, offset, user) grain, one count."""
    from ram_datapipeline_spark.operators.events import retention_cohorts

    t = load_tables(spark, sf_dir)
    return retention_cohorts(t["events"])


@query(
    "ev_stickiness_ratio",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id,
             epoch_us(ts) // 86400000000 AS d
      FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
    ),
    udw AS (SELECT user_id, d, d // 7 AS week FROM ud),
    dau AS (
      SELECT week, CAST(count(*) AS BIGINT) AS sum_dau
      FROM udw GROUP BY week
    ),
    wau AS (
      SELECT week, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM udw GROUP BY week
    )
    SELECT d.week, w.wau, d.sum_dau,
           CAST(d.sum_dau * 1000000 // (7 * w.wau) AS BIGINT)
             AS stickiness_ppm
    FROM dau d JOIN wau w USING (week)
    """,
    survey=(
        "DAU/WAU stickiness per week in exact integer ppm (the "
        "engagement-intensity product metric) — distinct (user, day) "
        "grain, integer epoch buckets (event analytics, beyond ref)"
    ),
    tags=("events",),
)
def q_ev_stickiness_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly DAU/WAU stickiness (operators/events.py::stickiness_ratio):
    events collapse to the distinct (user, day) grain once; day and
    week roll-ups ride that grain."""
    from ram_datapipeline_spark.operators.events import stickiness_ratio

    t = load_tables(spark, sf_dir)
    return stickiness_ratio(t["events"])


@query(
    "ev_attribution_touch",
    oracle="""
    WITH staged AS (
      SELECT event_type,
             first_value(CASE WHEN event_type <> 'purchase'
                              THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS ft,
             last_value(CASE WHEN event_type <> 'purchase'
                             THEN event_type END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS lt
      FROM events WHERE ts IS NOT NULL
    ),
    conv AS (
      SELECT coalesce(ft, '(none)') AS ftc, coalesce(lt, '(none)') AS ltc
      FROM staged WHERE event_type = 'purchase'
    ),
    ft AS (
      SELECT ftc AS channel, CAST(count(*) AS BIGINT) AS first_touch
      FROM conv GROUP BY ftc
    ),
    lt AS (
      SELECT ltc AS channel, CAST(count(*) AS BIGINT) AS last_touch
      FROM conv GROUP BY ltc
    )
    SELECT coalesce(ft.channel, lt.channel) AS channel,
           CAST(coalesce(first_touch, 0) AS BIGINT) AS first_touch,
           CAST(coalesce(last_touch, 0) AS BIGINT) AS last_touch
    FROM ft FULL JOIN lt ON ft.channel = lt.channel
    """,
    survey=(
        "first-touch / last-touch conversion attribution per channel: "
        "one user-keyed ordered window computes both IGNORE NULLS "
        "carries over the strict-past frame, then channel-grain counts "
        "(event analytics, beyond ref)"
    ),
    tags=("events",),
)
def q_ev_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribute purchase conversions to the user's first and last
    prior non-purchase event type
    (operators/events.py::touch_attribution): one user exchange, two
    window carries on the same sort, channel-grain counts."""
    from ram_datapipeline_spark.operators.events import touch_attribution

    t = load_tables(spark, sf_dir)
    return touch_attribution(t["events"], "purchase")


@query(
    "agg_kendall_tau",
    oracle="""
    WITH per AS (
      SELECT event_type,
             CAST(hour(ts) AS BIGINT) AS h,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS s
      FROM events
      WHERE value IS NOT NULL AND ts IS NOT NULL
      GROUP BY event_type, hour(ts)
    ),
    pairs AS (
      SELECT a.event_type,
             CASE WHEN b.s * a.n > a.s * b.n THEN 1 ELSE 0 END AS c,
             CASE WHEN b.s * a.n < a.s * b.n THEN 1 ELSE 0 END AS d,
             CASE WHEN b.s * a.n = a.s * b.n THEN 1 ELSE 0 END AS t
      FROM per a JOIN per b
        ON a.event_type = b.event_type AND b.h > a.h
    ),
    nb AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_buckets
      FROM per GROUP BY event_type
    ),
    agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(c) AS BIGINT) AS concordant,
             CAST(sum(d) AS BIGINT) AS discordant,
             CAST(sum(t) AS BIGINT) AS ties_y
      FROM pairs GROUP BY event_type
    )
    SELECT agg.event_type, nb.n_buckets, agg.n_pairs,
           agg.concordant, agg.discordant, agg.ties_y,
           CASE WHEN agg.n_pairs = agg.ties_y THEN NULL
                ELSE CAST(agg.concordant - agg.discordant AS DOUBLE)
                     / sqrt(CAST(agg.n_pairs AS DOUBLE)
                            * CAST(agg.n_pairs - agg.ties_y AS DOUBLE))
           END AS tau_b
    FROM agg JOIN nb USING (event_type)
    """,
    survey=(
        "Kendall tau-b concordance per key between hour-of-day and the "
        "bucket's exact mean (BIGINT cross-multiplied rational "
        "comparison, no division until the final pinned IEEE chain) — "
        "completes the monotone-association family; all pair work on "
        "the quantized bucket grain (beyond-ref drift family)"
    ),
    tags=("analytic",),
)
def q_agg_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b of hourly mean value per event type
    (operators/quality.py::kendall_tau_buckets): one event-sized
    bucket aggregate, <=276 concordance pairs per key."""
    from ram_datapipeline_spark.operators.quality import kendall_tau_buckets

    t = load_tables(spark, sf_dir)
    return kendall_tau_buckets(t["events"], ["event_type"], "ts", "value")
