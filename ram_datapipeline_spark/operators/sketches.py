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
from pyspark.sql import types as T

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


def misra_gries_heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int,
    count_col: str = "cnt",
    total_col: str = "n_total",
) -> DataFrame:
    """Exact heavy hitters (keys with non-null frequency · k > n) via the
    two-pass Misra-Gries pattern — the way a 100 TB engine answers
    "which keys dominate?" WITHOUT a full groupBy over the raw key
    domain.

    Pass 1 — candidate generation: each partition streams its Arrow
    batches through a MERGEABLE Misra-Gries summary (Agarwal et al.,
    "Mergeable Summaries", PODS'12: combine counts, then subtract the
    (k+1)-th largest and drop non-positive), holding ≤ k entries no
    matter how many distinct keys flow past. Pigeonhole gives the
    guarantee: a key with global count > n/(k+1) must exceed its
    partition's decrement budget n_p/(k+1) somewhere, so the union of
    partition summaries is a SUPERSET of every key with count·k > n.

    Pass 2 — exact recount: the candidate union (≤ k per partition —
    broadcast-sized) semi-join-prunes the input, and only the surviving
    rows are counted exactly. The final filter count·k > n makes the
    OUTPUT exact — identical to the plain groupBy/HAVING formulation the
    oracle runs — while the shuffle only ever carries candidate keys.

    Nulls are ignored (both the summaries and ``total_col`` count
    non-null keys only). ``total_col`` is carried in the output so the
    threshold the filter applied is visible to the caller.

    Exactly TWO corpus scans: pass 1 also emits each partition's
    non-null row count as a null-key sentinel row, so n (the threshold
    denominator) comes from the persisted candidate summaries, not a
    third scan of the input.
    """
    key_field = T.StructField(key_col, df.schema[key_col].dataType, True)

    def mg_partitions(batches):
        import pandas as pd

        summary: dict = {}
        n_part = 0
        for pdf in batches:
            vals = pdf[key_col].dropna()
            n_part += int(len(vals))
            for key, c in vals.value_counts().items():
                summary[key] = summary.get(key, 0) + int(c)
            if len(summary) > k:
                # mergeable compress: subtract the (k+1)-th largest
                # count from everything, keep the strictly-positive
                m = sorted(summary.values(), reverse=True)[k]
                summary = {key: c - m for key, c in summary.items() if c > m}
        yield pd.DataFrame(
            {
                key_col: list(summary.keys()) + [None],
                "_pn": [0] * len(summary) + [n_part],
            }
        )

    # ≤ k+1 rows per partition; read twice below, input scanned once.
    # localCheckpoint (not persist): CacheManager entries from persist()
    # are never GC-cleaned, so repeated calls in a long session would
    # leak cache — checkpointed RDD blocks are context-cleaned when the
    # DataFrame is dropped (same reasoning as similarity.cosine_topk_ivfpq)
    summaries = df.select(key_col).mapInPandas(
        mg_partitions,
        schema=T.StructType([key_field, T.StructField("_pn", T.LongType())]),
    ).localCheckpoint()
    candidates = (
        summaries.where(F.col(key_col).isNotNull()).select(key_col).distinct()
    )
    total = summaries.select(
        F.coalesce(F.sum("_pn"), F.lit(0)).alias(total_col)
    )
    filtered = df.join(F.broadcast(candidates), key_col, "leftsemi")
    counts = filtered.groupBy(key_col).agg(F.count(F.lit(1)).alias(count_col))
    return (
        counts.join(F.broadcast(total))
        .where(F.col(count_col) * k > F.col(total_col))
        .select(key_col, count_col, total_col)
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


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    probes: DataFrame,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Deterministic Count-Min sketch (Cormode & Muthukrishnan '05) —
    the point-frequency companion to the Misra-Gries heavy-hitter pass:
    estimate the count of any probe key WITHOUT a groupBy over the raw
    key domain, with the classic one-sided guarantee
    ``exact ≤ est ≤ exact + εn`` (ε = e/width, w.p. 1 − e^-depth).

    Hashing is md5-derived (row-salted first-8-hex-digits fold mod
    ``width``) — like the KMV sketch, the hash order IS the randomness,
    so the whole structure is a pure function of the multiset and any
    engine replays it bit-for-bit (DuckDB oracle in the suite).

    Plan shape: ONE corpus scan exploding each row into ``depth``
    (row, bucket) cells; the groupBy domain is ``depth × width``
    (bounded, corpus-size-independent — map-side partials collapse the
    corpus before the exchange, exactly the mergeable-summary property
    sketches exist for). Probe keys hash to their cells and broadcast-
    join the table; the estimate is the min over ``depth`` cells.

    Output: (key, est) per probe key. Mergeability = additivity of the
    cell table (asserted in tests).

    Non-null-key contract (round-7 ADVICE): NULL keys are dropped from
    BOTH the corpus and the probes up front — ``md5(NULL)`` is NULL, so
    corpus NULLs would pool in (r, NULL) cells that a NULL probe's
    equi-join can never reach, silently breaking the one-sided
    ``exact ≤ est`` guarantee for that key. Dropping on both sides
    keeps the contract honest: a NULL probe simply yields no row
    (count your NULLs with a plain filter, not a sketch).
    """
    df = df.where(F.col(key_col).isNotNull())
    probes = probes.where(F.col(key_col).isNotNull())

    def bucket(col: Column, row: int) -> Column:
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{row}|"), col.cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % width
        )

    cells = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("r"),
                            bucket(F.col(key_col), i).alias("b"),
                        )
                        for i in range(depth)
                    ]
                )
            ).alias("c")
        )
        .groupBy("c.r", "c.b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probe_cells = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        bucket(F.col(key_col), i).alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, F.col("c.r").alias("r"), F.col("c.b").alias("b"))
    # the cell table is ≤ depth×width rows BY CONSTRUCTION — broadcast
    # it, so probe estimation is a map-side join however many probes
    # come; LEFT join because an empty bucket IS the estimate 0 (a key
    # the corpus never saw must report 0, not vanish)
    return (
        probe_cells.join(F.broadcast(cells), ["r", "b"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )


def kmv_sketch_table(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Materialize a KMV sketch PER GROUP as a table row:
    ``(group_cols..., minima: array<double>)`` — the group's k smallest
    distinct u-values, ascending.

    This is the form a 100 TB pipeline stores: a per-shard /
    per-partition sketch table is ~k doubles per group (vs the raw
    corpus), and because KMV minima are a pure function of the value
    SET, sketch tables built independently per day / per shard merge
    losslessly later (``kmv_merge_sketches``) — no re-scan of history.

    Plan shape: ONE distinct aggregate over (group, u) — the only
    corpus-sized exchange — then a bounded per-group window keeps rank
    ≤ k and a group-sized sort_array(collect_list) packs the row. The
    window never buffers more than the group's distinct count and the
    collect_list is capped at k BY CONSTRUCTION.
    """
    u = kmv_uniform(F.col(value_col))
    distinct = df.select(*group_cols, u.alias("u")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("u")
    return (
        distinct.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("u")).alias("minima"))
    )


def kmv_merge_sketches(
    sketches: DataFrame,
    group_cols: list[str],
    k: int = 64,
    minima_col: str = "minima",
) -> DataFrame:
    """Merge KMV sketch rows upward: regroup by ``group_cols`` (a
    coarser key than the sketches were built at, e.g. nation→region
    after a parent join) and keep the k smallest DISTINCT u across the
    children's minima.

    Exactness of the merge (why rollup loses nothing): any u among the
    parent's k smallest distinct values is necessarily among its own
    child's k smallest — so the k smallest of the concatenated child
    minima EQUAL the k smallest the parent would have computed from
    raw data. The merged sketch is bit-identical to a direct build,
    which is what makes per-shard sketch tables safe to store.

    The input is sketch-sized (groups × ≤k doubles), so the explode +
    re-rank below shuffles kilobytes however large the corpus was.
    """
    exploded = sketches.select(
        *group_cols, F.explode(F.col(minima_col)).alias("u")
    ).distinct()
    w = Window.partitionBy(*group_cols).orderBy("u")
    return (
        exploded.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("u")).alias("minima"))
    )


def kmv_sketch_estimate(
    sketches: DataFrame, k: int = 64, minima_col: str = "minima"
) -> DataFrame:
    """Estimate column from a sketch table row: (k-1)/U_k when the
    sketch is full (≥ k minima — the group had ≥ k distinct values),
    else the sketch length itself (an under-k sketch holds EVERY
    distinct u, so the count is exact). IEEE division only — replayable
    bit-for-bit by any engine."""
    n = F.size(F.col(minima_col))
    kth = F.col(minima_col).getItem(k - 1)
    return sketches.withColumn(
        "estimate",
        F.when(n >= k, F.lit(float(k - 1)) / kth).otherwise(
            n.cast("double")
        ),
    )


def kmv_pairwise_intersection(
    sketches: DataFrame,
    group_col: str,
    k: int = 64,
    minima_col: str = "minima",
) -> DataFrame:
    """Set ALGEBRA on stored sketches (theta-sketch style): estimate
    ``|A ∩ B|`` for every unordered group pair from their KMV rows
    alone — no return to the raw corpus.

    Estimator: with θ = min(θ_A, θ_B) (each side's k-th minimum, or
    1.0 for an under-k sketch), every distinct value hashing below θ
    is visible in BOTH sketches if shared, so
    ``est = |{u ∈ S_A ∩ S_B : u < θ}| / θ``. When both sides are
    under-k the sketches hold every distinct hash, θ = 1, and the
    estimate is the EXACT intersection count. Ties at θ are excluded
    by the strict ``<`` (pinned so any engine replays it).

    The input is the sketch table (groups × ≤k doubles); the pair join
    below is a deliberate |groups|² nested loop over that tiny table —
    the corpus was paid for once, at sketch-build time.
    """
    # pin the sketch table ONCE: the pair join references it twice, and
    # without this the corpus-sized build lineage runs twice (plan-
    # audited — two full scans). The checkpoint is sketch-sized.
    sketches = sketches.localCheckpoint(eager=False)
    kth_or_one = F.when(
        F.size(F.col(minima_col)) >= k,
        F.col(minima_col).getItem(k - 1),
    ).otherwise(F.lit(1.0))
    a = sketches.select(
        F.col(group_col).alias("group_a"),
        F.col(minima_col).alias("_ma"),
        kth_or_one.alias("_ka"),
    )
    b = sketches.select(
        F.col(group_col).alias("group_b"),
        F.col(minima_col).alias("_mb"),
        kth_or_one.alias("_kb"),
    )
    theta = F.least(F.col("_ka"), F.col("_kb"))
    below = F.filter(
        F.array_intersect(F.col("_ma"), F.col("_mb")), lambda x: x < theta
    )
    return (
        a.join(b, F.col("group_a") < F.col("group_b"))
        .select(
            "group_a",
            "group_b",
            theta.alias("theta"),
            F.size(below).cast("long").alias("n_common"),
            (F.size(below).cast("double") / theta).alias("est_shared"),
        )
    )
