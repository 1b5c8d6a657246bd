"""Scale-discipline tests: salted joins are result-identical; bucketed
joins eliminate both exchanges from the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from ram_datapipeline_spark.catalog import load_tables
from ram_datapipeline_spark.operators.skew import salted_join, write_bucketed
from tests.conftest import SF_DIR


def test_salted_join_matches_plain(spark):
    t = load_tables(spark, SF_DIR)
    big = t["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    small = t["customer"].select("o_custkey", "c_name") if False else (
        t["customer"].select(F.col("c_custkey").alias("o_custkey"), "c_name")
    )
    plain = big.join(small, ["o_custkey"]).groupBy().agg(
        F.count("*").alias("n"), F.sum("o_totalprice").alias("s")
    ).collect()[0]
    salted = salted_join(big, small, ["o_custkey"], n_salts=8).groupBy().agg(
        F.count("*").alias("n"), F.sum("o_totalprice").alias("s")
    ).collect()[0]
    assert plain["n"] == salted["n"]
    assert abs(plain["s"] - salted["s"]) < 1e-6 * abs(plain["s"])


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    t = load_tables(spark, SF_DIR)
    write_bucketed(
        t["orders"].select("o_orderkey", "o_custkey", "o_totalprice"),
        "b_orders", str(tmp_path / "b_orders"), ["o_custkey"], 8,
    )
    write_bucketed(
        t["customer"].select("c_custkey", "c_name"),
        "b_customer", str(tmp_path / "b_customer"), ["c_custkey"], 8,
    )
    j = spark.table("b_orders").join(
        spark.table("b_customer"),
        F.col("o_custkey") == F.col("c_custkey"),
    )
    # force a sort-merge join so the exchange question is real (a broadcast
    # join would trivially have no shuffle)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and the result is right
        assert j.count() == spark.table("b_orders").count()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bloom_prefilter_join_matches_plain_and_prunes(spark):
    from ram_datapipeline_spark.operators.skew import (
        bloom_prefilter_join,
        build_bloom_bitmap,
    )

    t = load_tables(spark, SF_DIR)
    urgent = (
        t["orders"]
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("orderkey"))
    )
    li = t["lineitem"].select(
        F.col("l_orderkey").alias("orderkey"), "l_extendedprice"
    )
    plain = sorted(
        (r["orderkey"], round(r["l_extendedprice"], 2))
        for r in li.join(urgent, "orderkey").collect()
    )
    bloomed = sorted(
        (r["orderkey"], round(r["l_extendedprice"], 2))
        for r in bloom_prefilter_join(li, urgent, on="orderkey").collect()
    )
    assert bloomed == plain

    # the prefilter must actually prune: rows surviving the Bloom check
    # alone (before the join removes false positives) are far fewer than
    # the probe, and at least the true-match count
    bitmap = build_bloom_bitmap(urgent, "orderkey")
    probe = li.withColumn("_bloom", F.lit(bitmap))
    for i in range(2):
        probe = probe.withColumn(
            f"_p{i}",
            F.pmod(F.xxhash64(F.col("orderkey"), F.lit(i)), F.lit(1 << 18)),
        )
    survivors = probe.where(
        F.expr(
            "(element_at(_bloom, CAST(_p0 DIV 64 AS INT) + 1)"
            " & shiftleft(CAST(1 AS BIGINT), CAST(pmod(_p0, 64) AS INT))) != 0"
        )
        & F.expr(
            "(element_at(_bloom, CAST(_p1 DIV 64 AS INT) + 1)"
            " & shiftleft(CAST(1 AS BIGINT), CAST(pmod(_p1, 64) AS INT))) != 0"
        )
    ).count()
    n_probe = li.count()
    assert len(plain) <= survivors < n_probe * 0.6, (
        len(plain),
        survivors,
        n_probe,
    )


def test_bloom_prefilter_rejects_outer():
    import pytest as _pytest

    from ram_datapipeline_spark.operators.skew import bloom_prefilter_join

    for how in ("left", "left_outer", "right", "full"):
        with _pytest.raises(ValueError):
            bloom_prefilter_join(None, None, "k", how=how)


def test_salted_join_rejects_right_and_full():
    """ADVICE r1: replicated small-side rows would surface once per salt
    for unmatched right/full-outer output — reject instead of silently
    duplicating."""
    import pytest as _pytest

    from ram_datapipeline_spark.operators.skew import salted_join

    for how in ("right", "right_outer", "full", "outer", "full_outer"):
        with _pytest.raises(ValueError):
            salted_join(None, None, ["k"], how=how)


def test_bloom_prefilter_mixed_integral_key_types(spark):
    """xxhash64 hashes the physical type — int32(7) != int64(7) — so
    mixed integral keys must be coerced to one hash type, not silently
    dropped (review finding: previously returned false negatives)."""
    from ram_datapipeline_spark.operators.skew import bloom_prefilter_join

    p = spark.createDataFrame([(i, i * 10) for i in range(10)], "k int, v int")
    b = spark.createDataFrame([(3,), (5,)], "k long")
    got = sorted(r["k"] for r in bloom_prefilter_join(p, b, on="k").collect())
    assert got == [3, 5]

    # non-coercible mismatch refuses instead of silently mis-hashing
    import pytest as _pytest

    s = spark.createDataFrame([("3",)], "k string")
    with _pytest.raises(ValueError):
        bloom_prefilter_join(p, s, on="k")


def test_bloom_prefilter_rejects_scratch_column_collision(spark):
    import pytest as _pytest

    from ram_datapipeline_spark.operators.skew import bloom_prefilter_join

    p = spark.createDataFrame([(1, 2)], "k long, _bloom long")
    b = spark.createDataFrame([(1,)], "k long")
    with _pytest.raises(ValueError):
        bloom_prefilter_join(p, b, on="k")
