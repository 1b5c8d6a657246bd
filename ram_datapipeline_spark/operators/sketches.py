"""Deterministic cardinality sketches (beyond-reference north star).

``approx_count_distinct`` (HLL) is fast but engine-specific — its
estimate can't be replayed by another engine, so it gets only a
rows-only check (the registry's single oracle-less query). KMV
(k-minimum-values) fixes that: because the "randomness" is the md5 hash
order, the sketch is a PURE FUNCTION of the value set — any engine
replaying the same hash arithmetic produces the same k minima and the
same estimate, bit for bit. The trade: one shuffle of the distinct
(group, value-hash) pairs instead of HLL's fixed-size buffers; the
sketch itself stays k values per group.

Estimator: map each distinct value to u = first-52-bits(md5)/2^52 — an
exactly-representable double in [0, 1). With U_k the k-th smallest u,
the classic KMV estimate of the distinct count is (k-1)/U_k; groups with
fewer than k distinct values report their exact count (and the estimate
equals it). 52 bits because a double holds 52 mantissa bits — the
division is exact, no rounding ambiguity across engines.

Mergeability (the property sketches exist for): the union sketch of two
shards is the k smallest of the concatenated minima — tested in
tests/test_analytic.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TWO_52 = float(1 << 52)


def kmv_uniform(value: Column) -> Column:
    """md5-derived uniform draw in [0,1): first 13 hex digits (52 bits)
    over 2^52 — exact in IEEE double."""
    return (
        F.conv(F.substring(F.md5(value.cast("string")), 1, 13), 16, 10)
        .cast("double")
        / F.lit(TWO_52)
    )


def kmv_distinct_estimate(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Per-group KMV distinct-count estimate:
    (group_cols..., n_exact, kth_u, estimate).

    Plan shape: ONE distinct aggregate over (group, u) — map-side
    combined, the only corpus-sized exchange — then a per-group window
    rank bounded by the group's distinct count to pick U_k, and a
    group-sized join. ``n_exact`` is carried for the under-k fallback
    (and doubles as the test's ground truth); a production sketch at
    100 TB drops it and keeps only the k minima per group.
    """
    u = kmv_uniform(F.col(value_col))
    distinct = df.select(*group_cols, u.alias("u")).distinct()
    counts = distinct.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_exact")
    )
    w = Window.partitionBy(*group_cols).orderBy("u")
    kth = (
        distinct.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == k)
        .select(*group_cols, F.col("u").alias("kth_u"))
    )
    est = F.when(
        F.col("kth_u").isNotNull(), (k - 1) / F.col("kth_u")
    ).otherwise(F.col("n_exact").cast("double"))
    return (
        counts.join(kth, group_cols, "left")
        .withColumn("estimate", est)
        .select(*group_cols, "n_exact", "kth_u", "estimate")
    )


def hash_quantile_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    key_col: str,
    k: int = 64,
    quantiles: tuple[float, ...] = (0.5, 0.9),
) -> DataFrame:
    """Deterministic mergeable quantile sketch (the KMV idea applied to
    quantiles): per group, the sketch is the ``k`` rows with smallest
    ``md5(key)`` — a uniform, hash-defined sample — and quantile q is
    order statistic ``ceil(q · n_s)`` of the sample's sorted values.

    Why this over t-digest/KLL: the hash order IS the randomness, so two
    engines (and any shard split) agree on the exact sample — fully
    oracle-checkable, and mergeable by construction (the k smallest
    hashes of a union are a subset of the shards' k smallest — asserted
    in tests). Accuracy is the standard sample-quantile bound (~1/√k).

    Plan: one window shuffle on the group (WindowGroupLimit prunes to k
    per group map-side), then a group-local sort of k values — never a
    global sort, never a full-group sort.
    """
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(key_col).cast("string")), F.col(key_col)
    )
    sample = (
        df.select(group_col, value_col, key_col)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
    )
    agg = sample.groupBy(group_col).agg(
        F.count("*").alias("n_sample"),
        F.array_sort(F.collect_list(value_col)).alias("_vals"),
    )
    cols = [F.col(group_col), F.col("n_sample")]
    for q in quantiles:
        idx = F.expr(f"CAST(ceil({q} * n_sample) AS INT)")
        cols.append(
            F.element_at("_vals", idx).alias(f"p{int(q * 100)}")
        )
    return agg.select(*cols)
