"""Z-order layout: key correctness vs a Python bit-interleave
reference, the physical clustering guarantee (sorted, non-overlapping
partition z-ranges), and the locality bound the gated query's zone-map
view rests on."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ram_datapipeline_spark.operators.layout import (
    cluster_by_zorder,
    morton_key,
    morton_key_sql,
)


def _morton_ref(vals: tuple[int, ...], bits: int) -> int:
    z = 0
    d = len(vals)
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * d + j)
    return z


def test_morton_key_matches_python_reference_2d_and_3d(spark):
    rows = [(x, y, (x * 7 + y) % 32) for x in range(0, 64, 7) for y in range(0, 64, 5)]
    df = spark.createDataFrame(rows, "x long, y long, w long")
    got2 = df.select(
        "x", "y", morton_key([F.col("x"), F.col("y")], bits=6).alias("z")
    ).collect()
    for r in got2:
        assert r["z"] == _morton_ref((r["x"], r["y"]), 6), (r["x"], r["y"])
    got3 = df.select(
        "x", "y", "w",
        morton_key([F.col("x"), F.col("y"), F.col("w")], bits=5).alias("z"),
    ).collect()
    for r in got3:
        assert r["z"] == _morton_ref((r["x"], r["y"], r["w"]), 5)


def test_morton_key_sql_is_the_same_function(spark):
    """The oracle-side SQL text replays the key bit-exactly (evaluated
    here by Spark's own SQL engine; DuckDB parity is the gated query)."""
    df = spark.createDataFrame(
        [(x, 1023 - x) for x in range(0, 1024, 37)], "x long, y long"
    )
    df.createOrReplaceTempView("morton_probe")
    sql = morton_key_sql(["x", "y"], bits=10)
    got = spark.sql(f"SELECT x, y, {sql} AS z FROM morton_probe").collect()
    for r in got:
        assert r["z"] == _morton_ref((r["x"], r["y"]), 10)


def test_morton_key_rejects_bad_shapes(spark):
    with pytest.raises(ValueError, match="at least 2"):
        morton_key([F.col("x")], bits=8)
    with pytest.raises(ValueError, match="BIGINT"):
        morton_key([F.col("x"), F.col("y"), F.col("w")], bits=21)


def test_cluster_by_zorder_partitions_are_sorted_disjoint_ranges(spark):
    """The write-layout contract: after cluster_by_zorder every
    partition covers a z-range disjoint from and ordered against the
    others (this is what makes per-file min/max stats prunable), and
    rows inside each partition are z-sorted."""
    n = 4096
    df = spark.range(n).select(
        (F.col("id") * 2654435761 % 1024).alias("x"),
        (F.col("id") * 40503 % 1024).alias("y"),
    )
    clustered = cluster_by_zorder(
        df, morton_key([F.col("x"), F.col("y")], bits=10), n_partitions=8
    )
    plan = clustered._jdf.queryExecution().executedPlan().toString().lower()
    assert "rangepartitioning" in plan
    ranges = (
        clustered.withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .agg(F.min("z").alias("lo"), F.max("z").alias("hi"),
             F.count(F.lit(1)).alias("cnt"))
        .orderBy("pid")
        .collect()
    )
    assert sum(r["cnt"] for r in ranges) == n
    nonempty = [r for r in ranges if r["cnt"] > 0]
    assert len(nonempty) >= 4  # the sampled ranges actually spread
    for a, b in zip(nonempty, nonempty[1:]):
        assert a["hi"] <= b["lo"], (a, b)
    # within-partition sort: per-partition rows arrive z-ascending
    def _check_sorted(it):
        prev = None
        for row in it:
            if prev is not None and row.z < prev:
                yield row
            prev = row.z

    assert clustered.rdd.mapPartitions(_check_sorted).isEmpty()


def test_zorder_bucket_locality_bound(spark):
    """Top-6-bit z-buckets confine both originals to 128-wide windows —
    the zone-map tightness the gated query's docstring claims."""
    df = spark.range(20000).select(
        (F.col("id") % 1024).alias("x"),
        ((F.col("id") * 31 + 7) % 1024).alias("y"),
    )
    keyed = df.withColumn("z", morton_key([F.col("x"), F.col("y")], bits=10))
    spans = (
        keyed.groupBy(F.shiftright("z", 14).alias("bucket"))
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .collect()
    )
    assert spans and all(r["dx"] <= 127 and r["dy"] <= 127 for r in spans)


def test_zorder_buckets_for_box_cover_exactly(spark):
    """Property: for any rectangle, the prune list contains EVERY
    bucket that any in-box point maps to (completeness — a missing
    bucket would silently drop rows), and only buckets whose block
    rectangle overlaps the box (tightness)."""
    import itertools

    from ram_datapipeline_spark.operators.layout import zorder_buckets_for_box

    bits, bucket_bits = 10, 6
    shift = 2 * bits - bucket_bits
    boxes = [
        (0, 1023, 0, 1023),       # everything -> all 64 buckets
        (100, 300, 200, 330),     # the gated query's rectangle
        (0, 0, 0, 0),             # single point
        (127, 128, 255, 256),     # straddles block borders in both dims
        (512, 600, 0, 40),
    ]
    for x0, x1, y0, y1 in boxes:
        got = set(zorder_buckets_for_box(x0, x1, y0, y1, bits, bucket_bits))
        xs = set(range(x0, x1 + 1, 7)) | {x0, x1}
        ys = set(range(y0, y1 + 1, 11)) | {y0, y1}
        touched = {
            _morton_ref((x, y), bits) >> shift
            for x, y in itertools.product(xs, ys)
        }
        assert touched <= got, (x0, x1, y0, y1)
        blocks = ((x1 >> 7) - (x0 >> 7) + 1) * ((y1 >> 7) - (y0 >> 7) + 1)
        assert len(got) == blocks
    assert len(zorder_buckets_for_box(0, 1023, 0, 1023, 10, 6)) == 64
    with pytest.raises(ValueError, match="even"):
        zorder_buckets_for_box(0, 1, 0, 1, 10, 5)


def test_compaction_bins_sequential_fill_semantics(spark):
    """Hand case: parts 100,100,100,50,200 at target 250 fill bins by
    RUNNING size before each part — 0:(100+100)=200<250 then the third
    100 starts at 200 (bin 0 — floor(200/250)=0), the 50 at 300 → bin
    1, the 200 at 350 → bin 1. Oversized parts advance later bins but
    are never split."""
    from ram_datapipeline_spark.operators.layout import compaction_bins

    rows = [(1, 100), (2, 100), (3, 100), (4, 50), (5, 200), (6, 900),
            (7, 10)]
    df = spark.createDataFrame(rows, "pid long, bytes long")
    got = {
        r["pid"]: r["bin"]
        for r in compaction_bins(df, "pid", "bytes", 250).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 2, 7: 5}
    import pytest as _pytest

    with _pytest.raises(ValueError, match="positive"):
        compaction_bins(df, "pid", "bytes", 0)


def test_global_row_index_matches_total_order(spark):
    """Every row gets its exact position in the (v DESC, id) total order,
    across partitions and ties — same integers as the single-window form
    the operator exists to avoid."""
    from ram_datapipeline_spark.operators.layout import global_row_index

    rows = [(i, (i * 37) % 50) for i in range(500)]  # heavy ties on v
    df = spark.createDataFrame(rows, "id long, v long")
    out = global_row_index(
        df, [F.col("v").desc(), F.col("id")], n_partitions=8
    ).collect()
    expect = {
        r_id: idx
        for idx, (r_id, _) in enumerate(
            sorted(rows, key=lambda r: (-r[1], r[0]))
        )
    }
    got = {r["id"]: r["global_idx"] for r in out}
    assert got == expect
    assert len(out) == 500


def test_global_row_index_plan_has_no_global_window(spark):
    """The physical plan must contain a range exchange and NO Window at
    all — the whole point is that nothing funnels through one task."""
    from ram_datapipeline_spark.operators.layout import global_row_index

    from ram_datapipeline_spark.operators.layout import LAYOUT_PLANS

    df = spark.range(200).withColumn("v", F.col("id") % 9)
    out = global_row_index(df, [F.col("v"), F.col("id")], n_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    # the layout stage is eagerly local-checkpointed (ADVICE r9 leak +
    # recompute-consistency fix); its range exchange is recorded
    assert "rangepartitioning" in LAYOUT_PLANS["global_row_index"].lower()


def test_global_row_index_single_partition_and_empty(spark):
    from ram_datapipeline_spark.operators.layout import global_row_index

    one = spark.createDataFrame([(7, 1)], "id long, v long")
    got = global_row_index(one, [F.col("id")], n_partitions=4).collect()
    assert [(r["id"], r["global_idx"]) for r in got] == [(7, 0)]
    empty = one.filter(F.col("id") < 0)
    assert global_row_index(empty, [F.col("id")], n_partitions=4).count() == 0


def test_global_row_index_null_order_keys_first(spark):
    """NULLs in the order column sort first (Spark ASC default) and get
    the lowest indexes — same contract as the single-window oracle."""
    from ram_datapipeline_spark.operators.layout import global_row_index

    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 1), (4, None)], "id long, v long"
    )
    got = {
        r["id"]: r["global_idx"]
        for r in global_row_index(
            df, [F.col("v"), F.col("id")], n_partitions=3
        ).collect()
    }
    assert got == {2: 0, 4: 1, 3: 2, 1: 3}


def test_global_prefix_sum_matches_window_form(spark):
    """Exclusive weighted prefix sums across partitions equal the
    single-window form, with ties on the order value broken by id and
    NULL weights counting as 0."""
    from ram_datapipeline_spark.operators.layout import global_prefix_sum

    rows = [
        (i, (i * 37) % 50, None if i % 11 == 0 else (i * 13) % 97)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "id long, v long, w long")
    out = global_prefix_sum(
        df, [F.col("v"), F.col("id")], "w", n_partitions=8,
        out_col="off",
    ).collect()
    expect = {}
    run = 0
    for r_id, _v, w in sorted(rows, key=lambda r: (r[1], r[0])):
        expect[r_id] = run
        run += w or 0
    got = {r["id"]: r["off"] for r in out}
    assert got == expect
    assert len(out) == 400


def test_global_prefix_sum_plan_has_no_global_window(spark):
    from ram_datapipeline_spark.operators.layout import global_prefix_sum

    from ram_datapipeline_spark.operators.layout import LAYOUT_PLANS

    df = spark.range(100).withColumn("w", F.col("id") % 7)
    out = global_prefix_sum(df, [F.col("id")], "w", n_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan
    assert "rangepartitioning" in LAYOUT_PLANS["global_prefix_sum"].lower()


def test_systematic_sample_exact_multiplicities(spark):
    """Weights 10,10,10,10 with k=4 -> step=10: each row's interval
    (10i, 10i+10] contains exactly one probe; a heavy row swallows
    multiple probes; zero/null weights are never selected."""
    from pyspark.sql import functions as F

    from ram_datapipeline_spark.operators.layout import systematic_sample

    df = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (4, 10)], "id long, w long"
    )
    out = {
        r["id"]: r["n_picks"]
        for r in systematic_sample(
            df, [F.col("id")], "w", k=4, n_partitions=2
        ).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 1}

    heavy = spark.createDataFrame(
        [(1, 1), (2, 30), (3, 1), (4, None), (5, 8)],
        "id long, w long",
    )
    # total=40, k=4 -> step=10; intervals: (0,1],(1,31],(31,32],(32,32],(32,40]
    got = {
        r["id"]: r["n_picks"]
        for r in systematic_sample(
            heavy, [F.col("id")], "w", k=4, n_partitions=2
        ).collect()
    }
    assert got == {2: 3, 5: 1}  # probes 10,20,30 in (1,31]; 40 in (32,40]
