"""Extended relational surface — the join types, window functions, and
scalar families SURVEY §2.3/§2.5/§2.7 lists as "not present in the
reference, free in Spark", exercised as first-class oracle-backed queries
so a reference user migrating real workloads has them proven, not just
available.

Exactness discipline matches the rest of the suite: integer-cent money,
day-granular date arithmetic, strict-left-fold array reductions, unique
tie-breaks on every rank/limit boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ram_datapipeline_spark.catalog import load_tables
from ram_datapipeline_spark.operators import relational as R
from ram_datapipeline_spark.registry import query
from ram_datapipeline_spark.session import local_rows_df

# ---------------------------------------------------------------------------
# Outer joins (SURVEY §2.3 note: standard join types exposed natively)
# ---------------------------------------------------------------------------

@query(
    "q13_outer_join_custdist",
    oracle="""
    SELECT c_count, count(*) AS custdist FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) GROUP BY c_count
    """,
    survey="outer join + conditional join predicate (TPC-H Q13 shape)",
    tags=("extended",),
)
def q_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-order-count distribution: LEFT OUTER JOIN with an extra
    join-side predicate (customers with zero matching orders survive with
    count 0), then a second aggregation over the counts."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        t["customer"]
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "j_full_outer_reconcile",
    oracle="""
    WITH y96 AS (SELECT o_custkey, count(*) AS n96 FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                   AND o_orderdate < TIMESTAMP '1997-01-01' GROUP BY o_custkey),
         y97 AS (SELECT o_custkey, count(*) AS n97 FROM orders
                 WHERE o_orderdate >= TIMESTAMP '1997-01-01'
                   AND o_orderdate < TIMESTAMP '1998-01-01' GROUP BY o_custkey)
    SELECT COALESCE(y96.o_custkey, y97.o_custkey) AS custkey,
           COALESCE(n96, 0) AS n96, COALESCE(n97, 0) AS n97,
           COALESCE(n97, 0) - COALESCE(n96, 0) AS delta
    FROM y96 FULL OUTER JOIN y97 ON y96.o_custkey = y97.o_custkey
    """,
    survey="full outer join + coalesce reconciliation (§2.3 'not present')",
    tags=("extended",),
)
def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year order-count reconciliation: FULL OUTER JOIN keeps
    customers active in either year; coalesce fills the gaps."""
    t = load_tables(spark, sf_dir)

    def year_counts(y: int, alias: str) -> DataFrame:
        return (
            t["orders"]
            .filter(
                (F.col("o_orderdate") >= f"{y}-01-01")
                & (F.col("o_orderdate") < f"{y + 1}-01-01")
            )
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias(alias))
        )

    a = year_counts(1996, "n96").withColumnRenamed("o_custkey", "k96")
    b = year_counts(1997, "n97").withColumnRenamed("o_custkey", "k97")
    n96 = F.coalesce(F.col("n96"), F.lit(0))
    n97 = F.coalesce(F.col("n97"), F.lit(0))
    return (
        a.join(b, F.col("k96") == F.col("k97"), "full_outer")
        .select(
            F.coalesce(F.col("k96"), F.col("k97")).alias("custkey"),
            n96.alias("n96"),
            n97.alias("n97"),
            (n97 - n96).alias("delta"),
        )
    )


@query(
    "q4_exists_correlated",
    oracle="""
    SELECT o_orderpriority, count(*) AS n FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    survey="correlated EXISTS via conditioned semi join (TPC-H Q4 shape)",
    tags=("extended",),
)
def q_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS with a non-equi component (line shipped after the
    order date) — a semi join carrying both the equi key and the range
    predicate; Catalyst keeps the date filter pushed to the orders scan."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].filter(
        (F.col("o_orderdate") >= "1996-07-01") & (F.col("o_orderdate") < "1996-10-01")
    )
    l = t["lineitem"].select("l_orderkey", "l_shipdate")
    cond = (F.col("l_orderkey") == F.col("o_orderkey")) & (
        F.col("l_shipdate") > F.col("o_orderdate")
    )
    return (
        o.join(l, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "q18_having_join_back",
    oracle="""
    WITH big AS (
      SELECT l_orderkey,
             CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS BIGINT)) > 150
    )
    SELECT o.o_orderkey, o.o_custkey, b.sum_qty,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate
    FROM orders o JOIN big b ON o.o_orderkey = b.l_orderkey
    """,
    survey="HAVING + join-back to the fact (TPC-H Q18 shape)",
    tags=("extended",),
)
def q_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume orders: aggregate-then-filter (HAVING) joined back to
    the order header. The aggregate side shrinks before the join, so at
    scale the join input is the filtered group list, not the fact table."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        t["orders"]
        .join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            "o_orderkey",
            "o_custkey",
            "sum_qty",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


# ---------------------------------------------------------------------------
# Pushdown aggregate (TPC-H Q6 shape)
# ---------------------------------------------------------------------------

@query(
    "q6_pushdown_revenue",
    oracle="""
    SELECT
      CAST(sum(CAST(floor((l_extendedprice * l_discount) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
      count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24.0
    """,
    survey="filter-heavy scan aggregate; every predicate parquet-pushed (TPC-H Q6 shape)",
    tags=("extended",),
)
def q_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting-revenue-change scan: four conjunctive predicates, all
    pushable to the parquet reader (PushedFilters), then one global
    fixed-point sum — the canonical scan-efficiency probe."""
    t = load_tables(spark, sf_dir)
    l = t["lineitem"].filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24.0)
    )
    return l.agg(
        R.exact_money_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


# ---------------------------------------------------------------------------
# Analytic windows: lag/lead, ntile/rank family (§2.5 'not present')
# ---------------------------------------------------------------------------

@query(
    "w5_lag_lead_gaps",
    oracle="""
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     CAST(lag(o_orderdate) OVER w AS DATE),
                     CAST(o_orderdate AS DATE)) AS days_since_prev,
           lead(o_orderkey) OVER w AS next_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    survey="lag/lead windows (§2.5 'not present', exposed natively)",
    tags=("extended",),
)
def q_w5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days between consecutive orders per customer (lag) and the next
    order key (lead) — day-granular integer arithmetic, unique tie-break
    inside each partition."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev_date = F.lag(F.col("o_orderdate")).over(w)
    return t["orders"].select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.to_date("o_orderdate"), F.to_date(prev_date)).alias(
            "days_since_prev"
        ),
        F.lead("o_orderkey").over(w).alias("next_orderkey"),
    )


@query(
    "w6_rank_family",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           ntile(4) OVER w AS quartile,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           percent_rank() OVER w AS prk
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice DESC, o_orderkey)
    """,
    survey="ranking windows: ntile/rank/dense_rank/percent_rank (§2.5 'not present')",
    tags=("extended",),
)
def q_w6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking family per priority class. percent_rank is
    (rank-1)/(n-1) in both engines — a single IEEE division, bit-exact;
    the unique (price, key) order pins every tie."""
    t = load_tables(spark, sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return t["orders"].select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).alias("quartile"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prk"),
    )


# ---------------------------------------------------------------------------
# Higher-order array functions over the embedding column
# ---------------------------------------------------------------------------

@query(
    "hof_array_kit",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                       (a, b) -> a + b) AS total,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           CAST(embedding[1] AS DOUBLE) AS first_dim
    FROM embeddings
    """,
    survey="higher-order array functions: transform/filter/aggregate (scale path for array<float> columns)",
    tags=("extended",),
)
def q_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform / filter / aggregate over array<float> — all JVM-side
    (whole-stage codegen), no UDF. The fold is strict-left on
    double-widened elements, matching DuckDB's list_reduce element order
    exactly (first element absorbed into the 0-init fold)."""
    t = load_tables(spark, sf_dir)
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return t["embeddings"].select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.aggregate(emb, F.lit(0.0), lambda acc, x: acc + x).alias("total"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("n_pos"),
        F.element_at("embedding", 1).cast("double").alias("first_dim"),
    )


# ---------------------------------------------------------------------------
# Date arithmetic (§2.7: 'no date arithmetic in the reference')
# ---------------------------------------------------------------------------

@query(
    "f_date_arithmetic",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber,
           date_diff('day', CAST(o.o_orderdate AS DATE),
                            CAST(l.l_shipdate AS DATE)) AS ship_delay_days,
           strftime(CAST(o.o_orderdate AS DATE) + INTERVAL 90 DAY, '%Y-%m-%d')
             AS deadline,
           CASE WHEN date_diff('day', CAST(o.o_orderdate AS DATE),
                               CAST(l.l_shipdate AS DATE)) > 90
                THEN 'late' ELSE 'on_time' END AS verdict
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_orderkey < 500
    """,
    survey="date arithmetic: datediff / date_add / conditional (§2.7 beyond-ref)",
    tags=("extended",),
)
def q_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-delay arithmetic: day difference, +90-day deadline, and a
    late/on-time verdict — integer day math only, no fractional-month
    ambiguity."""
    t = load_tables(spark, sf_dir)
    delay = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        t["lineitem"]
        .filter(F.col("l_orderkey") < 500)
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_linenumber",
            delay.alias("ship_delay_days"),
            F.date_format(F.date_add(F.to_date("o_orderdate"), 90), "yyyy-MM-dd").alias(
                "deadline"
            ),
            F.when(delay > 90, "late").otherwise("on_time").alias("verdict"),
        )
    )


# ---------------------------------------------------------------------------
# String function kit (§2.7 F8 generalization)
# ---------------------------------------------------------------------------

@query(
    "f_string_kit",
    oracle="""
    SELECT p_partkey,
           upper(p_brand) AS brand_up,
           lower(p_type) AS type_lo,
           substring(p_name, 1, 8) AS name8,
           replace(p_type, ' ', '_') AS type_us,
           lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_pad,
           length(p_name) AS name_len,
           reverse(p_brand) AS brand_rev,
           strpos(p_type, 'O') AS o_pos,
           levenshtein(p_brand, 'Brand#33') AS lev_to_b33
    FROM part
    """,
    survey="string kit: case/substr/replace/pad/reverse/instr/levenshtein (§2.7 beyond-ref)",
    tags=("extended",),
)
def q_string_kit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The string-manipulation surface a pipeline user expects — all
    JVM-side built-ins; levenshtein is the classic DP edit distance in
    both engines."""
    t = load_tables(spark, sf_dir)
    return t["part"].select(
        "p_partkey",
        F.upper("p_brand").alias("brand_up"),
        F.lower("p_type").alias("type_lo"),
        F.substring("p_name", 1, 8).alias("name8"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_us"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_pad"),
        F.length("p_name").alias("name_len"),
        F.reverse("p_brand").alias("brand_rev"),
        F.instr(F.col("p_type"), "O").alias("o_pos"),
        F.levenshtein(F.col("p_brand"), F.lit("Brand#33")).alias("lev_to_b33"),
    )


# --- TPC-H shapes exercising optimizer paths not covered above -------------
# Shared ANSI strings: Spark executes the SAME SQL over the catalog temp
# views that DuckDB runs as the oracle — any divergence is an engine
# difference, not a translation artifact. Money stays in integer cents
# (floor(x*100+0.5)) so every aggregate is order-independent.

_Q2_MIN_COST_SQL = """
    SELECT p.p_partkey, p.p_brand, l.l_suppkey,
           CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT) AS price_cents
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 5
      AND CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT) =
          (SELECT min(CAST(floor(l2.l_extendedprice * 100.0 + 0.5) AS BIGINT))
           FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
"""


@query(
    "q2_correlated_min",
    oracle=_Q2_MIN_COST_SQL,
    survey="correlated scalar subquery with aggregate (TPC-H Q2 shape)",
    tags=("relational",),
)
def q_q2_correlated_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest supply line per small part — a correlated MIN subquery
    that Catalyst decorrelates into an aggregate + join (no per-row
    re-execution); integer-cents equality keeps ties exact."""
    load_tables(spark, sf_dir)
    return spark.sql(_Q2_MIN_COST_SQL)


_Q14_PROMO_SQL = """
    SELECT CAST(sum(CASE WHEN p.p_type LIKE 'PROMO%'
                         THEN CAST(floor((l.l_extendedprice * (1.0 - l.l_discount)) * 100.0 + 0.5) AS BIGINT)
                         ELSE 0 END) AS DOUBLE) * 100.0
           / CAST(sum(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount)) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
           AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1995-10-01 00:00:00'
"""


@query(
    "q14_promo_revenue",
    oracle=_Q14_PROMO_SQL,
    survey="conditional-aggregate ratio (TPC-H Q14 shape)",
    tags=("relational",),
)
def q_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share for one month: CASE-gated cents sums, one
    final float division — numerator/denominator never exist as floats."""
    load_tables(spark, sf_dir)
    return spark.sql(_Q14_PROMO_SQL)


_Q16_SUPPLIER_CNT_SQL = """
    SELECT p.p_brand, p.p_size, count(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM part p JOIN lineitem l ON l.l_partkey = p.p_partkey
    WHERE p.p_size IN (1, 4, 9, 16, 25)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_size
"""


@query(
    "q16_supplier_cnt",
    oracle=_Q16_SUPPLIER_CNT_SQL,
    survey="NOT IN anti-join + distinct aggregate (TPC-H Q16 shape)",
    tags=("relational",),
)
def q_q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier counts per (brand, size), excluding a NOT IN
    subquery set (null-aware anti-join in Catalyst)."""
    load_tables(spark, sf_dir)
    return spark.sql(_Q16_SUPPLIER_CNT_SQL)


_Q19_OR_ANDS_SQL = """
    SELECT COALESCE(CAST(sum(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount)) * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0, 0.0) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND l.l_quantity BETWEEN 1.0 AND 11.0 AND p.p_size BETWEEN 1 AND 5)
       OR (p.p_brand = 'Brand#23' AND l.l_quantity BETWEEN 10.0 AND 20.0 AND p.p_size BETWEEN 1 AND 10)
       OR (p.p_brand = 'Brand#34' AND l.l_quantity BETWEEN 20.0 AND 30.0 AND p.p_size BETWEEN 1 AND 15)
"""


@query(
    "q19_or_of_ands",
    oracle=_Q19_OR_ANDS_SQL,
    survey="disjunctive predicate pushdown (TPC-H Q19 shape)",
    tags=("relational",),
)
def q_q19_or_of_ands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs revenue: Catalyst extracts the common p_brand/p_size
    conjuncts for pushdown while keeping the disjunction exact."""
    load_tables(spark, sf_dir)
    return spark.sql(_Q19_OR_ANDS_SQL)


_Q22_DORMANT_SQL = """
    SELECT c.c_nationkey, count(*) AS numcust,
           CAST(sum(CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS acctbal_cents
    FROM customer c
    WHERE c.c_acctbal > 0.0
      AND CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT)
          * (SELECT count(*) FROM customer c2 WHERE c2.c_acctbal > 0.0)
          > (SELECT sum(CAST(floor(c2.c_acctbal * 100.0 + 0.5) AS BIGINT))
             FROM customer c2 WHERE c2.c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderstatus = 'F')
    GROUP BY c.c_nationkey
"""


@query(
    "q22_dormant_customers",
    oracle=_Q22_DORMANT_SQL,
    survey="NOT EXISTS anti-join + scalar-subquery threshold (TPC-H Q22 shape)",
    tags=("relational",),
)
def q_q22_dormant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no finished orders, per
    nation: NOT EXISTS → anti-join, the average threshold cross-multiplied
    in integer cents (the float 'average' never exists)."""
    load_tables(spark, sf_dir)
    return spark.sql(_Q22_DORMANT_SQL)


# --- remaining TPC-H shapes (completing all 22) -----------------------------
# The fixture has no partsupp / l_shipmode / l_commitdate columns, so Q9,
# Q11, Q12, Q20, Q21 are *shape-preserving adaptations*: same plan skeleton
# (join graph, subquery kind, aggregate structure), fixture-available
# columns. Money and quantities stay in exact integers until one final
# division, so every aggregate is order-independent.

_CENTS = "CAST(floor((l.l_extendedprice * (1.0 - l.l_discount)) * 100.0 + 0.5) AS BIGINT)"

_Q7_VOLUME_SQL = f"""
    SELECT supp_nation, cust_nation, l_year, CAST(sum(cents) AS BIGINT) AS revenue_cents
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS l_year, {_CENTS} AS cents
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
"""


@query(
    "q7_nation_volume",
    oracle=_Q7_VOLUME_SQL,
    survey="6-table join + year rollup (TPC-H Q7 shape)",
    tags=("relational",),
)
def q_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral shipping volume between two nations by ship year: a
    6-table join where every dimension broadcasts and only the fact
    aggregate shuffles."""
    load_tables(spark, sf_dir)
    return spark.sql(_Q7_VOLUME_SQL)


_Q8_SHARE_SQL = f"""
    SELECT o_year,
           CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END) AS DOUBLE)
           / CAST(sum(cents) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year, n1.n_name AS supp_nation,
             {_CENTS} AS cents
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n2.n_regionkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
"""


@query(
    "q8_market_share",
    oracle=_Q8_SHARE_SQL,
    survey="8-table join + conditional-share ratio (TPC-H Q8 shape)",
    tags=("relational",),
)
def q_q8_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One nation's market share inside a region per year — the numerator
    is a CASE-gated cents sum over the same rows as the denominator, so
    one aggregate produces both."""
    load_tables(spark, sf_dir)
    return spark.sql(_Q8_SHARE_SQL)


_Q9_PROFIT_SQL = """
    SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(sum(CAST(floor((l.l_extendedprice * (1.0 - l.l_discount)) * 100.0 + 0.5) AS BIGINT)
               - CAST(floor(p.p_retailprice * 100.0 + 0.5) AS BIGINT) * CAST(l.l_quantity AS BIGINT)) AS BIGINT)
             AS profit_cents
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, CAST(year(o.o_orderdate) AS INT)
"""


@query(
    "q9_profit_by_nation",
    oracle=_Q9_PROFIT_SQL,
    survey="profit rollup, revenue minus cost (TPC-H Q9 shape; cost = retailprice*qty, fixture has no partsupp)",
    tags=("relational",),
)
def q_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per (nation, year): revenue cents minus integer cost cents
    inside one sum — the subtraction happens per row in exact integers."""
    load_tables(spark, sf_dir)
    return spark.sql(_Q9_PROFIT_SQL)


_Q10_RETURNS_SQL = f"""
    SELECT c.c_custkey, c.c_name, n.n_name, CAST(sum({_CENTS}) AS BIGINT) AS revenue_cents
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue_cents DESC, c.c_custkey ASC
    LIMIT 20
"""


@query(
    "q10_returned_items",
    oracle=_Q10_RETURNS_SQL,
    survey="returned-item revenue top-k (TPC-H Q10 shape)",
    tags=("relational",),
)
def q_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top 20 customers by returned-item revenue in one quarter; the
    LIMIT boundary is totally ordered (cents DESC, custkey ASC) so the
    cut is deterministic."""
    load_tables(spark, sf_dir)
    return spark.sql(_Q10_RETURNS_SQL)


_Q11_VALUE_SQL = f"""
    WITH val AS (
      SELECT s.s_nationkey, l.l_partkey, CAST(sum({_CENTS}) AS BIGINT) AS value_cents
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_nationkey, l.l_partkey
    )
    SELECT s_nationkey, l_partkey, value_cents
    FROM val
    WHERE value_cents * 10000 > (SELECT CAST(sum(value_cents) AS BIGINT) FROM val)
"""


@query(
    "q11_important_value",
    oracle=_Q11_VALUE_SQL,
    survey="HAVING vs corpus-total scalar subquery (TPC-H Q11 shape; lineitem value, fixture has no partsupp)",
    tags=("relational",),
)
def q_q11_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(nation, part) groups holding more than 1/10000 of total value:
    the grouped aggregate is reused by the scalar-subquery total — integer
    cross-multiply, the fraction never becomes a float."""
    load_tables(spark, sf_dir)
    return spark.sql(_Q11_VALUE_SQL)


_Q12_PRIORITY_SQL = """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
"""


@query(
    "q12_priority_split",
    oracle=_Q12_PRIORITY_SQL,
    survey="priority-class conditional counts (TPC-H Q12 shape; linestatus for the absent shipmode)",
    tags=("relational",),
)
def q_q12_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High/low-priority line counts per line status for one ship year —
    two CASE sums over a single fact pass."""
    load_tables(spark, sf_dir)
    return spark.sql(_Q12_PRIORITY_SQL)


_Q15_TOP_SUPP_SQL = f"""
    WITH rev AS (
      SELECT l.l_suppkey, CAST(sum({_CENTS}) AS BIGINT) AS total_cents
      FROM lineitem l
      WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l.l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_cents
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total_cents = (SELECT max(total_cents) FROM rev)
"""


@query(
    "q15_top_supplier",
    oracle=_Q15_TOP_SUPP_SQL,
    survey="grouped view reused against its own max (TPC-H Q15 shape)",
    tags=("relational",),
)
def q_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) with the maximum quarterly revenue: the grouped
    revenue CTE feeds both the join and the scalar max — integer cents
    make the max boundary exact (ties all returned)."""
    load_tables(spark, sf_dir)
    return spark.sql(_Q15_TOP_SUPP_SQL)


_Q17_SMALL_QTY_SQL = """
    WITH pq AS (
      SELECT l_partkey, count(*) AS cnt, sum(CAST(l_quantity AS BIGINT)) AS sum_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE)
           / 700.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN pq     ON pq.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND CAST(l.l_quantity AS BIGINT) * 5 * pq.cnt < sum_qty
"""


@query(
    "q17_small_quantity",
    oracle=_Q17_SMALL_QTY_SQL,
    survey="per-key average threshold, cross-multiplied exact (TPC-H Q17 shape)",
    tags=("relational",),
)
def q_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from below-one-fifth-of-average-quantity lines:
    ``qty < 0.2·avg(qty)`` cross-multiplied to ``5·qty·cnt < sum_qty`` so
    the comparison is pure integers (the average never exists as a
    float)."""
    load_tables(spark, sf_dir)
    return spark.sql(_Q17_SMALL_QTY_SQL)


_Q20_PART_SUPP_SQL = """
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_suppkey IN (
      SELECT l.l_suppkey
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'PROMO'
      GROUP BY l.l_suppkey, l.l_partkey
      HAVING sum(CAST(l.l_quantity AS BIGINT)) > 100
    )
"""


@query(
    "q20_bulk_suppliers",
    oracle=_Q20_PART_SUPP_SQL,
    survey="IN over grouped-HAVING subquery (TPC-H Q20 shape; quantity threshold for the absent partsupp availqty)",
    tags=("relational",),
)
def q_q20_bulk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who moved >100 units of any PROMO part: the IN subquery
    aggregates before the semi-join, so the probe side is (supplier, part)
    groups, not raw lineitem."""
    load_tables(spark, sf_dir)
    return spark.sql(_Q20_PART_SUPP_SQL)


_Q21_WAITING_SQL = """
    SELECT s.s_name, count(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
"""


@query(
    "q21_waiting_supplier",
    oracle=_Q21_WAITING_SQL,
    survey="EXISTS + NOT EXISTS self-joins (TPC-H Q21 shape; late = shipped >60 days after order, fixture has no commit/receipt dates)",
    tags=("relational",),
)
def q_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who were the sole late shipper on finished multi-supplier
    orders: one semi- and one anti-join against the same fact, both
    correlated on the order key."""
    load_tables(spark, sf_dir)
    return spark.sql(_Q21_WAITING_SQL)


@query(
    "j_band_price",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('budget', 0.0, 500.0),
             ('mid', 500.0, 2000.0),
             ('premium', 2000.0, 100000.0)
    )
    SELECT b.band, count(*) AS n_items,
           min(l.l_extendedprice) AS min_price,
           max(l.l_extendedprice) AS max_price
    FROM lineitem l JOIN bands b
      ON l.l_extendedprice >= b.lo AND l.l_extendedprice < b.hi
    GROUP BY b.band
    """,
    survey="range-band join (non-equi BETWEEN against a broadcast band dim)",
    tags=("join",),
)
def q_band_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi join: every lineitem lands in its [lo, hi) price band.
    The band dim is rows-sized → broadcast nested-loop (the right plan:
    the fact never shuffles for the join; with a large band table the
    rewrite is a range-bucketed equi-join). Aggregates are count/min/max —
    selection-exact."""
    t = load_tables(spark, sf_dir)
    bands = local_rows_df(spark, 
        [("budget", 0.0, 500.0), ("mid", 500.0, 2000.0),
         ("premium", 2000.0, 100000.0)],
        "band string, lo double, hi double",
    )
    li = t["lineitem"]
    return (
        li.join(
            F.broadcast(bands),
            (li["l_extendedprice"] >= bands["lo"])
            & (li["l_extendedprice"] < bands["hi"]),
        )
        .groupBy("band")
        .agg(
            F.count("*").alias("n_items"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
    )


@query(
    "j_salted_skew_join",
    oracle="""
    SELECT p.p_brand AS brand,
           CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    survey=(
        "skew-resistant salted equi-join in the hard signal: result-"
        "identical to the plain join (operators/skew.py discipline)"
    ),
    tags=("join", "skew"),
)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brand revenue through ``salted_join``: the big side scatters each
    row across 8 salt sub-keys, the small side replicates once per salt,
    the join runs on (key, salt) — the discipline for hot keys AQE can't
    split. The oracle is the PLAIN join: salting must be invisible in the
    result, which is exactly what the gate proves. (Salt values come from
    monotonically_increasing_id — nondeterministic row→salt placement,
    deterministic result.)"""
    from ram_datapipeline_spark.operators.skew import salted_join

    t = load_tables(spark, sf_dir)
    big = t["lineitem"].select(
        F.col("l_partkey").alias("partkey"),
        F.expr(
            "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"
        ).alias("cents"),
    )
    small = t["part"].select(
        F.col("p_partkey").alias("partkey"), "p_brand"
    )
    j = salted_join(big, small, on=["partkey"], n_salts=8)
    return j.groupBy(F.col("p_brand").alias("brand")).agg(
        F.sum("cents").alias("revenue_cents"),
        F.count("*").alias("n_items"),
    )


@query(
    "j_bloom_prefilter",
    oracle="""
    SELECT l.l_returnflag, l.l_linestatus,
           count(*) AS n_items,
           CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority = '1-URGENT'
    GROUP BY l.l_returnflag, l.l_linestatus
    """,
    survey=(
        "Bloom-prefiltered equi-join in the hard signal: probe side "
        "pruned by a fixed 32 KiB key-membership bitmap before the "
        "join, result-identical to the plain join (operators/skew.py)"
    ),
    tags=("join", "skew"),
)
def q_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Urgent-order line items through ``bloom_prefilter_join``: the
    build side (urgent orders) distills to a 2^18-bit Bloom bitmap
    (xxhash64 × 2, bit_or-aggregated, fixed 4096-word collect), the
    probe side (lineitem — the 100 TB fact in production) drops
    definite non-matches BEFORE the join shuffle, and the join removes
    the Bloom's false positives. The oracle is the PLAIN join: the
    prefilter must be invisible in the result — exactly what the gate
    proves."""
    from ram_datapipeline_spark.operators.skew import bloom_prefilter_join

    t = load_tables(spark, sf_dir)
    urgent = (
        t["orders"]
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("orderkey"))
    )
    li = t["lineitem"].select(
        F.col("l_orderkey").alias("orderkey"),
        "l_returnflag",
        "l_linestatus",
        F.expr(
            "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"
        ).alias("cents"),
    )
    j = bloom_prefilter_join(li, urgent, on="orderkey")
    return j.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("n_items"),
        F.sum("cents").alias("revenue_cents"),
    )


@query(
    "j_interval_overlap",
    oracle="""
    WITH a AS (
      SELECT event_id AS a_id, user_id,
             epoch_us(ts) AS a_s,
             epoch_us(ts + INTERVAL 30 MINUTE) AS a_e
      FROM events WHERE event_type = 'view'
    ),
    b AS (
      SELECT event_id AS b_id, user_id,
             epoch_us(ts) AS b_s,
             epoch_us(ts + INTERVAL 5 MINUTE) AS b_e
      FROM events WHERE event_type = 'click'
    )
    SELECT a.user_id, a.a_id, b.b_id,
           (least(a_e, b_e) - greatest(a_s, b_s)) // 1000000 AS overlap_s
    FROM a JOIN b ON a.user_id = b.user_id
                 AND a.a_s < b.b_e AND b.b_s < a.a_e
    """,
    survey=(
        "interval × interval overlap join via time bucketing — the "
        "equi-join restatement of a range join (beyond-reference "
        "temporal surface)"
    ),
    tags=("join", "timeseries"),
)
def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping (view-window × click-window) pairs per user: views
    open a 30-minute interval, clicks a 5-minute one; strict overlap.
    The engine tiles time into 30-minute buckets and joins on (user,
    bucket) — a plain equi-join with bounded fan-out — where the naive
    formulation is a per-user cross join; the oracle IS that naive
    join, proving the bucketing complete (border-spanning pairs dedup
    to one row)."""
    from ram_datapipeline_spark.operators.temporal import (
        interval_overlap_join,
    )

    t = load_tables(spark, sf_dir)
    ev = t["events"]
    a = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("id"),
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTE")).alias("e"),
    )
    b = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("id"),
        "user_id",
        F.col("ts").alias("s"),
        (F.col("ts") + F.expr("INTERVAL 5 MINUTE")).alias("e"),
    )
    return interval_overlap_join(a, b, "user_id", bucket_seconds=1800)
