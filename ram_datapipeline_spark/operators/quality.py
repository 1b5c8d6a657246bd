"""Declarative data-quality checks (beyond-reference north star) — the
validation gate a production pipeline runs before consuming a table,
in the style of Deequ/Great Expectations, re-expressed as ONE Spark
aggregation pass.

Check types:

- ``completeness(col)``     — non-null fraction
- ``uniqueness(col)``       — distinct fraction (1.0 = key candidate)
- ``min_bound(col, lo)``    — fraction of rows with col ≥ lo
- ``max_bound(col, hi)``    — fraction of rows with col ≤ hi
- ``referential(col, other, other_col)`` — fraction of rows whose key
  exists in ``other`` (an LEFT SEMI count, the FK-orphan detector)

Scale shape: every row-level check compiles to a conditional aggregate
in a SINGLE groupBy().agg() over the table — one scan, map-side
partials, a one-row result unpivoted to (check, metric) rows. Each
referential check adds one semi-join aggregate over the key column
only (count, not rows, crosses the exchange). Uniqueness is an exact
count-distinct — at 100 TB swap in the KMV sketch
(operators/sketches.py) if the exactness isn't worth the distinct
aggregate's expand; the check surface stays identical.

Metrics are ratios of exact BIGINT counts (one IEEE double division),
so the whole report is oracle-exact.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ram_datapipeline_spark.session import local_rows_df


@dataclass(frozen=True)
class Check:
    name: str
    kind: str  # completeness | uniqueness | min_bound | max_bound | referential
    col: str
    threshold: float = 1.0
    bound: float | None = None
    other: DataFrame | None = None
    other_col: str | None = None


def completeness(col: str, threshold: float = 1.0) -> Check:
    return Check(f"completeness_{col}", "completeness", col, threshold)


def uniqueness(col: str, threshold: float = 1.0) -> Check:
    return Check(f"uniqueness_{col}", "uniqueness", col, threshold)


def min_bound(col: str, lo: float, threshold: float = 1.0) -> Check:
    return Check(f"min_bound_{col}", "min_bound", col, threshold, bound=lo)


def max_bound(col: str, hi: float, threshold: float = 1.0) -> Check:
    return Check(f"max_bound_{col}", "max_bound", col, threshold, bound=hi)


def referential(
    col: str, other: DataFrame, other_col: str, threshold: float = 1.0
) -> Check:
    return Check(
        f"referential_{col}", "referential", col, threshold,
        other=other, other_col=other_col,
    )


def _row_metric(c: Check, n: Column) -> Column:
    col = F.col(c.col)
    if c.kind == "completeness":
        hits = F.count(col)
    elif c.kind == "uniqueness":
        hits = F.countDistinct(col)
    elif c.kind == "min_bound":
        hits = F.count(F.when(col >= F.lit(c.bound), 1))
    elif c.kind == "max_bound":
        hits = F.count(F.when(col <= F.lit(c.bound), 1))
    else:  # pragma: no cover - constructors prevent this
        raise ValueError(f"unknown row-level check kind {c.kind!r}")
    return hits.cast("double") / n


def dq_checks(
    df: DataFrame,
    checks: list[Check],
    sketched_uniqueness: bool = False,
    kmv_k: int = 256,
) -> DataFrame:
    """Run the check suite; returns one row per check:
    (check_name, metric, threshold, passed), deterministic.

    All row-level checks share ONE aggregation over ``df``; each
    referential check adds one semi-join count job over its key column.

    ``sketched_uniqueness=True`` routes uniqueness checks through the
    deterministic KMV estimator (operators/sketches.kmv_uniform) instead
    of the exact count-distinct — the 100 TB swap the module docstring
    promises, with the check surface unchanged. Each sketched check is
    one ``distinct → TakeOrdered(k)`` job over the hashed column (k rows
    to the driver side of the plan, no count-distinct expand); the
    estimate is the classic (k−1)/U_k with the exact under-k fallback,
    and — because the randomness IS the md5 hash order — it is a pure
    function of the value set, replayable by any engine. Standard error
    ≈ 1/√k (tests assert exact vs sketched agreement within the bound).
    """
    if not checks:
        raise ValueError(
            "dq_checks: empty check list — pass at least one Check "
            "(completeness/uniqueness/min_bound/max_bound/referential)"
        )
    sketch_checks: list[Check] = []
    if sketched_uniqueness:
        sketch_checks = [c for c in checks if c.kind == "uniqueness"]
    row_checks = [
        c for c in checks
        if c.kind != "referential" and c not in sketch_checks
    ]
    ref_checks = [c for c in checks if c.kind == "referential"]

    parts: list[DataFrame] = []
    if row_checks:
        n = F.count(F.lit(1))
        agg = df.agg(
            *[_row_metric(c, n).alias(c.name) for c in row_checks]
        )
        stack = ", ".join(f"'{c.name}', {c.name}" for c in row_checks)
        parts.append(
            agg.select(
                F.expr(
                    f"stack({len(row_checks)}, {stack}) AS (check_name, metric)"
                )
            ).join(
                local_rows_df(
                    df.sparkSession,
                    [(c.name, c.threshold) for c in row_checks],
                    "check_name string, threshold double",
                ),
                "check_name",
            )
        )
    for c in sketch_checks:
        from ram_datapipeline_spark.operators.sketches import kmv_uniform

        # k smallest distinct hash draws: distinct → global sort+limit
        # compiles to TakeOrderedAndProject over map-side-combined
        # partials — k rows cross the final exchange, never the expand
        # a count-distinct pays. NULLs are excluded (count-distinct
        # semantics).
        u = kmv_uniform(F.col(c.col))
        mins = (
            df.select(u.alias("_u"))
            .where(F.col("_u").isNotNull())
            .distinct()
            .orderBy("_u")
            .limit(kmv_k)
        )
        sk = mins.agg(
            F.count(F.lit(1)).alias("_n_min"),
            F.max("_u").alias("_kth_u"),
        )
        total = df.select(F.count(F.lit(1)).alias("_n"))
        est = F.when(
            F.col("_n_min") < kmv_k, F.col("_n_min").cast("double")
        ).otherwise((kmv_k - 1) / F.col("_kth_u"))
        parts.append(
            sk.crossJoin(total).select(
                F.lit(c.name).alias("check_name"),
                (est / F.col("_n")).alias("metric"),
                F.lit(c.threshold).alias("threshold"),
            )
        )
    for c in ref_checks:
        keys = c.other.select(F.col(c.other_col).alias(c.col)).distinct()
        total = df.select(F.count(F.lit(1)).alias("_n"))
        matched = (
            df.join(F.broadcast(keys), c.col, "leftsemi")
            .select(F.count(F.lit(1)).alias("_m"))
        )
        parts.append(
            matched.crossJoin(total).select(
                F.lit(c.name).alias("check_name"),
                (F.col("_m").cast("double") / F.col("_n")).alias("metric"),
                F.lit(c.threshold).alias("threshold"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "check_name", "metric", "threshold",
        (F.col("metric") >= F.col("threshold")).alias("passed"),
    )


def winsorize_caps(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_num: int = 5,
    hi_num: int = 95,
    den: int = 100,
) -> DataFrame:
    """Per-group winsorization caps from EXACT order statistics — the
    outlier-capping pass feature pipelines run before normalization,
    with no interpolation and no libm: the lo/hi caps are the values at
    ranks ``ceil(p·n)`` (integer ceiling division on exact counts), so
    every output is a value already present in the data and the whole
    report is oracle-replayable.

    Output: (group, n, lo_cap, hi_cap, n_below, n_above) where
    n_below/n_above count rows strictly outside the caps (the rows a
    ``clamp`` would touch).

    Scale shape: ONE corpus exchange (the per-group sort window);
    the rank→cap reduction is per-group-tiny, rejoins as a broadcast,
    and the final count agg reuses the window's hash partitioning —
    nothing corpus-sized moves twice. NULL values are excluded (they
    are a completeness problem, not an outlier problem).
    """
    if not (0 < lo_num < hi_num <= den):
        raise ValueError(
            f"winsorize_caps: need 0 < lo < hi <= den, got "
            f"{lo_num}/{hi_num}/{den}"
        )
    w = Window.partitionBy(group_col).orderBy(value_col)
    nw = Window.partitionBy(group_col)
    ranked = (
        df.select(group_col, value_col)
        .where(F.col(value_col).isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(nw))
    )
    k_lo = (F.lit(lo_num) * F.col("_n") + (den - 1)) / den
    k_hi = (F.lit(hi_num) * F.col("_n") + (den - 1)) / den
    ranked = ranked.withColumn(
        "_k_lo", F.floor(k_lo).cast("long")
    ).withColumn("_k_hi", F.floor(k_hi).cast("long"))
    caps = ranked.groupBy(group_col).agg(
        F.max("_n").alias("n"),
        F.max(
            F.when(F.col("_rn") == F.col("_k_lo"), F.col(value_col))
        ).alias("lo_cap"),
        F.max(
            F.when(F.col("_rn") == F.col("_k_hi"), F.col(value_col))
        ).alias("hi_cap"),
    )
    return (
        ranked.join(F.broadcast(caps), group_col)
        .groupBy(group_col)
        .agg(
            F.max("n").alias("n"),
            F.max("lo_cap").alias("lo_cap"),
            F.max("hi_cap").alias("hi_cap"),
            F.count(
                F.when(F.col(value_col) < F.col("lo_cap"), 1)
            ).alias("n_below"),
            F.count(
                F.when(F.col(value_col) > F.col("hi_cap"), 1)
            ).alias("n_above"),
        )
        .select(group_col, "n", "lo_cap", "hi_cap", "n_below", "n_above")
    )


def plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for ``df`` (optimized-plan
    ``stats().sizeInBytes`` — file-source byte sums after partition
    pruning), read from plan METADATA: no job runs. ``None`` when the
    estimate is unavailable (e.g. a plan node that defaults to
    spark.sql.defaultSizeInBytes == Long.MaxValue, which is no
    estimate at all)."""
    try:
        raw = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        # py4j maps scala.math.BigInt to int when it fits; larger values
        # come back as a JavaObject with toString
        size = raw if isinstance(raw, int) else int(raw.toString())
    except Exception:  # noqa: BLE001 — py4j internals; treat as unknown
        return None
    return None if size >= (1 << 62) else size


def barriered_raw_draws(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col, md5-uniform-draw) pairs for the DISTINCT values of each
    named column, hashing only the survivors of a map-side-collapsing
    raw-value distinct — the ``profile_table`` scan-B / redo subtree.

    The ``repartition`` between the raw distinct and the md5 projection
    is LOAD-BEARING, not a tuning knob: without a physical barrier,
    Catalyst pushes the md5 projection below the distinct and collapses
    the two aggregates into one — per-row md5 over the whole corpus,
    exactly the plan this subtree exists to avoid (r11 discovery: the
    r9/r10 "distinct-raw-first" fallback was silently running that
    collapsed plan — ~7s/column at the 64× probe vs ~0.5s with the
    barrier). The extra exchange is survivor-sized (the raw distinct's
    output), never corpus-sized. tests/test_analytic.py pins the plan
    shape so a future Catalyst rule can't silently re-collapse it.

    Cast-to-string before the distinct is draw-preserving:
    ``kmv_uniform`` hashes ``CAST(v AS STRING)`` and Spark's
    value→string casts are injective on a column's values.
    """
    from ram_datapipeline_spark.operators.sketches import kmv_uniform

    raw = F.array(*[
        F.struct(F.lit(c).alias("_c"), F.col(c).cast("string").alias("_v"))
        for c in cols
    ])
    vals = (
        df.select(F.explode(raw).alias("_p"))
        .select(F.col("_p._c").alias("_c"), F.col("_p._v").alias("_v"))
        .where(F.col("_v").isNotNull())
        .distinct()
        # physical barrier — survivor-sized exchange
        .repartition(F.col("_c"), F.col("_v"))
    )
    return vals.select("_c", kmv_uniform(F.col("_v")).alias("_u"))


def profile_table(
    df: DataFrame,
    numeric_as: dict[str, Column] | None = None,
    distinct_mode: str = "auto",
    kmv_k: int = 256,
    auto_threshold_bytes: int = 1 << 30,
) -> DataFrame:
    """ANALYZE-style column profile in ONE scan: for every column,
    ``(col_name, n_rows, n_nulls, n_distinct, min_num, max_num)``.

    All per-column statistics fold into a single aggregation (the
    count-distincts expand map-side and combine partially before the
    one exchange — the same single-pass shape as ``dq_checks``), then a
    ``stack`` unpivots the 1-row result into one row per column —
    driver never loops over columns at runtime. ``numeric_as`` maps a
    column to the numeric Column used for min/max (e.g. timestamps as
    µs); unmapped non-numeric columns report null bounds.

    At 100 TB the exact count-distinct expansion is the costly part
    (the measured 8×-probe ratio is 4.09× versus ~1.5× for the other
    single-agg profiles) — ``distinct_mode="kmv"`` replaces it with a
    per-column KMV bottom-k estimator. Columns with fewer than
    ``kmv_k`` distinct values stay EXACT by construction (the sketch
    saw them all). In kmv mode ``n_distinct`` is a double estimate;
    nulls/min/max stay single-pass exact either way.

    The kmv branch (rebuilt in r11 — VERDICT r10 #1) runs a FIXED
    number of jobs and corpus scans regardless of column count:

    - One stats job: count/nulls/min/max for every column, plus an
      HLL cardinality ROUTER for non-integer columns only (a
      plan-routing signal, never emitted — every route below produces
      bit-identical estimates, so an approximate router keeps the
      profile exact).
    - One bottom-k job with at most TWO corpus scans, each exploding
      rows into (col, draw) pairs so ALL columns share the scan: ints
      (plus router-certified high-card non-ints) ride a per-row draw
      with the deterministic threshold prefilter ``64·k/n_rows``; the
      remaining non-ints ride a distinct-raw-first subtree that hashes
      only surviving distinct values. One distinct exchange + one
      per-column row_number window pick every column's k minima at
      once (collect bounded by k × n_cols).
    - At most one batched redo job for over-filtered columns (< k
      surviving draws): the unfiltered bottom-k, whose distinct
      collapses map-side because under-k-survivors implies
      low cardinality.

    Draws: INTEGER columns use a Weyl/LCG map — pure BIGINT arithmetic
    ``((v % 2³¹ + 2³¹) % 2³¹ · 1103515245 + 12345) % 2³¹ / 2³¹`` —
    exact and identical in any engine, ~10× cheaper than md5 (r8
    finding: hashing, not the exchange, dominates); everything else
    uses ``sketches.kmv_uniform`` (md5 — the only portable string
    hash). The threshold-filtered result is IDENTICAL to the
    unfiltered computation's (≥ k survivors ⟹ the k smallest distinct
    draws all sit below the threshold), so a replay needn't model the
    threshold at all.

    ``distinct_mode="auto"`` (the default since round 8 — VERDICT r7
    #2: the exact expand read 26.9× at the 64× probe) picks per CALL
    from plan metadata: Catalyst's optimized-plan size estimate
    (``plan_size_bytes`` — zero jobs) above ``auto_threshold_bytes``
    (default 1 GiB) selects kmv, at-or-below selects exact; an
    unavailable estimate selects kmv, because the only table that can
    hurt is a big one. The decision is a pure function of the input's
    plan metadata, so a given table profiles the same way every run.
    """
    numeric_as = numeric_as or {}
    if distinct_mode == "auto":
        size = plan_size_bytes(df)
        distinct_mode = (
            "exact" if size is not None and size <= auto_threshold_bytes
            else "kmv"
        )
    if distinct_mode not in ("exact", "kmv"):
        raise ValueError(
            f"profile_table: distinct_mode must be 'exact', 'kmv' or "
            f"'auto', got {distinct_mode!r}"
        )
    exact = distinct_mode == "exact"
    num_types = ("int", "bigint", "smallint", "tinyint", "double", "float")
    int_types = ("int", "bigint", "smallint", "tinyint")
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in df.columns:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"_nulls_{c}"))
        if exact:
            aggs.append(F.countDistinct(c).alias(f"_nd_{c}"))
        elif dtypes[c] not in int_types:
            # plan-routing signal only (never emitted): HLL cardinality
            # decides whether a NON-integer column takes the per-row-md5
            # certification path or the distinct-raw-first path — every
            # route produces bit-identical estimates, so an approximate
            # ROUTER keeps the profile exact. Integer columns carry no
            # HLL at all (r11): their arithmetic draw is cheap enough
            # to always ride the threshold-filtered path, with the
            # batched unfiltered redo as the low-cardinality safety
            # net — the r11 probe showed the router HLLs were ~45% of
            # the stats job, most spent deciding what ints get free.
            aggs.append(F.approx_count_distinct(c).alias(f"_acd_{c}"))
        if c in numeric_as:
            num = numeric_as[c]
        elif dtypes[c] in num_types:
            num = F.col(c).cast("double")
        else:
            num = F.lit(None).cast("double")
        aggs.append(F.min(num).alias(f"_min_{c}"))
        aggs.append(F.max(num).alias(f"_max_{c}"))
    one = df.agg(*aggs)
    nd = (lambda c: f"_nd_{c}") if exact else (lambda c: "CAST(NULL AS DOUBLE)")
    stack_args = ", ".join(
        f"'{c}', _nulls_{c}, {nd(c)}, _min_{c}, _max_{c}"
        for c in df.columns
    )
    base = one.select(
        F.expr(
            f"stack({len(df.columns)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_num, max_num)"
        ),
        F.col("_n").alias("n_rows"),
    ).select("col_name", "n_rows", "n_nulls", "n_distinct",
             "min_num", "max_num")
    if exact:
        return base

    from ram_datapipeline_spark.operators.sketches import kmv_uniform

    # ONE collected row serves three roles the old path paid two extra
    # jobs for: n_rows (was a separate count), the final stats rows
    # (driver-assembled at the bottom — profile outputs are
    # column-count-sized by nature), and the non-integer HLL router.
    stats_row = one.first()
    n_rows = int(stats_row["_n"])
    thr = min(1.0, (64.0 * kmv_k) / max(n_rows, 1))
    use_filter = thr < 1.0

    def _weyl_u(c: str):
        # Weyl/LCG arithmetic draw — exact BIGINT ops, no overflow:
        # max intermediate (2³¹−1)·1103515245 + 12345 < 2⁶³
        return (
            F.expr(
                f"((CAST(`{c}` AS BIGINT) % 2147483648 + 2147483648) "
                f"% 2147483648 * 1103515245 + 12345) % 2147483648"
            ).cast("double")
            / F.lit(float(1 << 31))
        )

    # UNPIVOTED two-scan bottom-k (VERDICT r10 #1 — the third shape this
    # stage has worn, and the one that stops scanning the corpus once
    # per column). r8's batch unioned C per-column ``scan → filter →
    # distinct → TakeOrdered(k)`` subtrees into one job, which still
    # executed C corpus scans inside that job; r9's balanced union fixed
    # only the plan DEPTH. Now every column's draws ride one of exactly
    # TWO corpus scans: each row explodes into (col, draw) pairs, one
    # distinct exchange runs over the survivor-sized pair stream, and
    # one per-column row_number window picks the k minima for ALL
    # columns at once. The surviving draw SET per column is identical to
    # the per-column computation's (threshold certification argument
    # unchanged: ≥ k distinct draws below thr ⟹ those are the k
    # smallest distinct draws overall), so every estimate stays
    # bit-for-bit replayable by an UNfiltered oracle. Plain explode +
    # post-explode Filter on purpose: a higher-order ``filter`` over the
    # pair array is interpreted, not codegen — measured 7× slower than
    # exploding the NULL-draw pairs and dropping them one node up.
    #
    # Column routing (r11 — measured at the 64× probe):
    #   - scan A (per-row draws): ALL integer columns (the Weyl/LCG
    #     draw is pure BIGINT arithmetic — cheap enough to always
    #     threshold-filter, no router needed; a low-cardinality column
    #     simply comes back under-k and joins the batched unfiltered
    #     redo, whose distinct collapses map-side) + the non-integer
    #     columns the HLL router certifies as high-cardinality (md5 per
    #     row is ~10× arithmetic hashing, but the threshold filter
    #     keeps the exchange survivor-sized — the only viable shape
    #     when the column's distinct set is corpus-sized).
    #   - scan B (distinct-raw-first): non-integer columns the router
    #     routes AWAY from certification (cardinality < n/32): raw
    #     values collapse map-side FIRST and only survivors get hashed.
    #     The ``repartition`` between the raw distinct and the md5
    #     projection is LOAD-BEARING: without a physical barrier,
    #     Catalyst pushes the md5 projection below the distinct and
    #     collapses the two aggregates into one — the per-row-md5 plan
    #     this path exists to avoid (and, r11 discovery, the plan it
    #     was silently running since r9: ~7s/column at the 64× probe
    #     vs ~0.5s with the barrier forcing survivor-only hashing).
    #     Cast-to-string before the distinct is draw-preserving:
    #     kmv_uniform hashes CAST(v AS STRING) and Spark's
    #     value→string casts are injective on a column's values.
    # Both scans union into ONE job; the collect is bounded by
    # k × n_cols rows (k=256 × 200 cols = 51,200 tiny rows).
    cert_set = {
        c
        for c in df.columns
        if dtypes[c] not in int_types
        and use_filter
        and int(stats_row[f"_acd_{c}"]) * 32 >= max(n_rows, 1)
    }
    scan_a_cols = [
        c for c in df.columns if dtypes[c] in int_types or c in cert_set
    ]
    scan_b_cols = [c for c in df.columns if c not in scan_a_cols]

    def _draw(c: str) -> Column:
        if dtypes[c] in int_types:
            return _weyl_u(c)
        return kmv_uniform(F.col(c))

    def _pair(c: str) -> Column:
        d = _draw(c)
        if use_filter:
            d = F.when(d < F.lit(thr), d)
        return F.struct(F.lit(c).alias("_c"), d.alias("_u"))

    def _explode_draws(cols: list[str], filtered: bool) -> DataFrame:
        mk = _pair if filtered else (
            lambda c: F.struct(F.lit(c).alias("_c"), _draw(c).alias("_u"))
        )
        pairs = F.array(*[mk(c) for c in cols])
        return (
            df.select(F.explode(pairs).alias("_p"))
            .select(F.col("_p._c").alias("_c"), F.col("_p._u").alias("_u"))
            .where(F.col("_u").isNotNull())
        )

    def _distinct_raw_first(cols: list[str]) -> DataFrame:
        return barriered_raw_draws(df, cols)

    def _bottom_k(parts: list[DataFrame]) -> dict[str, list[float]]:
        stream = parts[0]
        for p in parts[1:]:
            stream = stream.unionByName(p)
        wk = Window.partitionBy("_c").orderBy("_u")
        picked = (
            stream.distinct()
            .withColumn("_rn", F.row_number().over(wk))
            .where(F.col("_rn") <= kmv_k)
        )
        out: dict[str, list[float]] = {}
        for row in picked.collect():
            out.setdefault(row._c, []).append(row._u)
        return out

    parts: list[DataFrame] = []
    if scan_a_cols:
        parts.append(_explode_draws(scan_a_cols, filtered=use_filter))
    if scan_b_cols:
        parts.append(_distinct_raw_first(scan_b_cols))
    survivors = _bottom_k(parts) if parts else {}

    # Per-column estimate from the collected minima (IEEE-identical to
    # the old per-column aggregates: same draws, same (k−1)/U_k double
    # division). A FILTERED column with < k survivors was over-filtered
    # (its cardinality sits below the threshold's ~n/64·k certification
    # floor) — those columns take ONE batched unfiltered redo job:
    # integer redos ride a map-side-collapsing Weyl explode, non-integer
    # redos the same barriered distinct-raw-first subtree as scan B.
    # Redo draws are the unfiltered bottom-k, so estimates land exactly
    # where an unfiltered run would have put them.
    ests: dict[str, float] = {}
    redo: list[str] = []
    for c in df.columns:
        us = survivors.get(c, [])
        if len(us) >= kmv_k:
            ests[c] = (kmv_k - 1) / max(us)
        elif c in scan_a_cols and use_filter:
            redo.append(c)
        else:
            ests[c] = float(len(us))
    if redo:
        r_parts: list[DataFrame] = []
        r_ints = [c for c in redo if dtypes[c] in int_types]
        r_other = [c for c in redo if dtypes[c] not in int_types]
        if r_ints:
            r_parts.append(_explode_draws(r_ints, filtered=False))
        if r_other:
            r_parts.append(_distinct_raw_first(r_other))
        redo_us = _bottom_k(r_parts)
        for c in redo:
            us = redo_us.get(c, [])
            ests[c] = (
                (kmv_k - 1) / max(us) if len(us) >= kmv_k else float(len(us))
            )

    return local_rows_df(
        df.sparkSession,
        [
            (
                c,
                n_rows,
                int(stats_row[f"_nulls_{c}"]),
                ests[c],
                stats_row[f"_min_{c}"],
                stats_row[f"_max_{c}"],
            )
            for c in df.columns
        ],
        "col_name string, n_rows bigint, n_nulls bigint, "
        "n_distinct double, min_num double, max_num double",
    )


def equiwidth_histogram(
    df: DataFrame,
    value: Column,
    group_cols: list[str],
    bins: int = 10,
    value_name: str = "bin_lo",
) -> DataFrame:
    """Per-group equi-width histogram over an INTEGER measure — the
    distribution half of :func:`profile_table` (which summarizes;
    this shapes). All arithmetic is BIGINT on non-negative spans, so
    the bin assignment ``((x - lo) * bins) div (hi - lo + 1)`` replays
    bit-exact in any engine — no float bin edges, no boundary drift.

    Scale shape: one grouped min/max aggregate (map-side combined,
    group-cardinality-sized result) broadcast-joined back, then one
    grouped count on (group, bin) — two small shuffles, no window, no
    sort. Degenerate groups (hi == lo) land everything in bin 0.

    Output: group_cols + (bin, ``value_name`` = inclusive lower edge,
    cnt), <= bins rows per group.
    """
    if bins <= 0:
        raise ValueError("equiwidth_histogram: bins must be positive")
    v = value.cast("long").alias("_v")
    base = df.select(*group_cols, v)
    rng = base.groupBy(*group_cols).agg(
        F.min("_v").alias("_lo"), F.max("_v").alias("_hi")
    )
    binned = base.join(F.broadcast(rng), group_cols).withColumn(
        "bin",
        F.expr(f"least({bins} - 1, ((_v - _lo) * {bins}) div (_hi - _lo + 1))"),
    )
    return (
        binned.groupBy(*group_cols, "bin")
        .agg(
            F.first("_lo").alias("_lo"),
            F.first("_hi").alias("_hi"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            *group_cols,
            F.col("bin").cast("long").alias("bin"),
            F.expr(f"_lo + (bin * (_hi - _lo + 1)) div {bins}").alias(
                value_name
            ),
            F.col("cnt"),
        )
    )


def robust_outlier_stats(
    df: DataFrame,
    value: Column,
    group_cols: list[str],
    k_num: int = 3,
    k_den: int = 1,
) -> DataFrame:
    """Median/MAD robust outlier detection per group, INTEGER-EXACT:
    flags ``|x - median| > (k_num/k_den) * MAD`` without ever forming
    a float — medians are carried as ``2x`` sums of the two middle
    order statistics (``med2``; equal middles when n is odd), absolute
    deviations as ``dev = |2x - med2|`` (= 2|x - median|), the MAD as
    ``mad2`` (the med2 of dev, = 4*MAD), and the flag as the
    cross-multiplied ``2 * k_den * dev > k_num * mad2``.

    Scale shape: two rounds of (group-partitioned rank window → two
    middle rows → group-sized aggregate broadcast back) — windows are
    always partitioned by the group key (never single-partition), the
    per-group stats tables are group-cardinality-sized broadcasts, and
    the final count is one map-side-combined aggregate.

    Output per group: (group_cols..., n, med2, mad2, n_outliers).
    """
    from pyspark.sql import Window

    v = value.cast("long").alias("_v")
    base = df.select(*group_cols, v)
    w = Window.partitionBy(*group_cols).orderBy("_v")
    wc = Window.partitionBy(*group_cols)
    ranked = base.select(
        *group_cols,
        "_v",
        F.row_number().over(w).alias("_rn"),
        F.count(F.lit(1)).over(wc).alias("_cnt"),
    )
    mids = "(_cnt + 1) div 2", "(_cnt + 2) div 2"
    med = ranked.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"CASE WHEN _rn = {mids[0]} THEN _v ELSE 0 END")
            + F.expr(f"CASE WHEN _rn = {mids[1]} THEN _v ELSE 0 END")
        ).alias("med2"),
    )
    dev = base.join(F.broadcast(med), group_cols).withColumn(
        "_dev", F.abs(2 * F.col("_v") - F.col("med2"))
    )
    wd = Window.partitionBy(*group_cols).orderBy("_dev")
    dranked = dev.select(
        *group_cols,
        "_dev",
        F.row_number().over(wd).alias("_rn"),
        F.count(F.lit(1)).over(wc).alias("_cnt"),
    )
    mad = dranked.groupBy(*group_cols).agg(
        F.sum(
            F.expr(f"CASE WHEN _rn = {mids[0]} THEN _dev ELSE 0 END")
            + F.expr(f"CASE WHEN _rn = {mids[1]} THEN _dev ELSE 0 END")
        ).alias("mad2")
    )
    flagged = dev.join(F.broadcast(mad), group_cols).withColumn(
        "_out",
        (2 * k_den * F.col("_dev") > k_num * F.col("mad2")).cast("long"),
    )
    return (
        flagged.groupBy(*group_cols)
        .agg(
            F.max("med2").alias("med2"),
            F.max("mad2").alias("mad2"),
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_out").alias("n_outliers"),
        )
        .select(*group_cols, "n", "med2", "mad2", "n_outliers")
    )


def weighted_median(
    df: DataFrame,
    group_cols: list[str],
    value: Column,
    weight: Column,
) -> DataFrame:
    """Lower weighted median per group, INTEGER-EXACT: the smallest
    value v whose cumulative weight reaches half the group total —
    ``2 * cumw(<=v) >= W`` by cross-multiplication, so no W/2 division
    and no interpolation (the percentile-interpolation drift that keeps
    float quantiles out of the hard signal doesn't exist here).

    Scale shape: ONE exchange — pre-aggregate to the (group, value)
    grain (map-side combined; the window then sorts distinct values,
    not rows), one group-keyed cumulative-sum window that also carries
    the group total (same spec, unbounded frame), one filter + min
    aggregate reusing the same partitioning. Never SinglePartition.

    Emits (group_cols..., w_total, w_median).
    """
    from pyspark.sql import Window

    per_v = df.groupBy(
        *group_cols, value.cast("long").alias("v")
    ).agg(F.sum(weight.cast("long")).alias("wv"))
    cum_w = (
        Window.partitionBy(*group_cols)
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy(*group_cols)
    staged = per_v.select(
        *group_cols,
        "v",
        F.sum("wv").over(cum_w).alias("cumw"),
        F.sum("wv").over(tot_w).alias("w_total"),
    )
    return (
        staged.where(2 * F.col("cumw") >= F.col("w_total"))
        .groupBy(*group_cols)
        .agg(
            F.first("w_total").alias("w_total"),
            F.min("v").alias("w_median"),
        )
    )


def corr_components(
    df: DataFrame,
    group_cols: list[str],
    x: Column,
    y: Column,
) -> DataFrame:
    """Exact integer sufficient statistics for per-group Pearson
    correlation: (n, sx, sy, sxx, syy, sxy) as BIGINTs — the mergeable
    partial state (same philosophy as operators/incremental.py: emit
    the exact components, let the caller take the one float ratio).
    ``corr()`` itself float-accumulates in shuffle order and can't
    hash-match across engines; these sums are associative integers.

    Caller contract: x and y must be integer-valued expressions scaled
    so that sum(x*x) etc. fit BIGINT at the target data size (e.g.
    whole dollars, not cents, for 1e8-row groups).

    ONE map-side-combined aggregate — nothing else moves.
    """
    xl = x.cast("long")
    yl = y.cast("long")
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xl).alias("sx"),
        F.sum(yl).alias("sy"),
        F.sum(xl * xl).alias("sxx"),
        F.sum(yl * yl).alias("syy"),
        F.sum(xl * yl).alias("sxy"),
    )


def quantile_buckets(
    df: DataFrame,
    value: Column,
    k: int,
    metric_col: str | None = None,
    out_col: str = "bucket",
) -> DataFrame:
    """Scale-safe ntile: assign every row its k-quantile bucket (1..k)
    WITHOUT the global single-partition sort ``ntile()`` needs.

    Cutoff t_j (j = 1..k-1) is the lower j/k order statistic — the
    smallest value whose cumulative count satisfies ``k*cum >= j*n``
    (integer cross-multiplication, no division) — computed on the
    (metric, value)-grain count table, so the only window sorts
    DISTINCT values per metric, never rows. The bucket is
    ``1 + #cutoffs strictly below the value`` via a broadcast join of
    the (k-1) × metrics cutoff table. Ties share a bucket (every equal
    value gets the same score — the property ntile lacks), so bucket
    POPULATIONS are approximately n/k, exactly n/k when values are
    distinct.

    ``metric_col``: optional column partitioning independent metrics
    (unpivoted long format — one call buckets many metrics at once).
    Input column layout is preserved; ``out_col`` is appended.

    All k-1 cutoffs come from ONE conditional aggregate over one scan
    of the staged cumulative table (``min(v) FILTER (k*cum >= j*n)``
    per j) — not k-1 separately filtered aggregations unioned together,
    which would re-evaluate the counts+window subtree per cutoff.
    ``k == 1`` degenerates cleanly to every row in bucket 1; ``k < 1``
    raises.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"quantile_buckets needs k >= 1, got {k}")
    if k == 1:
        return df.withColumn(out_col, F.lit(1))

    m = (
        F.col(metric_col)
        if metric_col is not None
        else F.lit("_all").alias("_m")
    )
    base = df.withColumn("_v", value.cast("long")).withColumn(
        "_m", m.cast("string")
    )
    counts = base.groupBy("_m", "_v").agg(F.count(F.lit(1)).alias("_c"))
    cum_w = (
        Window.partitionBy("_m")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.partitionBy("_m")
    staged = counts.select(
        "_m",
        "_v",
        F.sum("_c").over(cum_w).alias("_cum"),
        F.sum("_c").over(tot_w).alias("_n"),
    )
    # Every cutoff exists (at the final row cum == n, and k*n >= j*n for
    # all j < k), so no null enters the array. The broadcast side is the
    # (k-1) × metrics cutoff table folded to ONE array row per metric —
    # never a value-grain table.
    cut_arrays = staged.groupBy("_m").agg(
        F.array_sort(
            F.array(
                *[
                    F.min(
                        F.when(
                            k * F.col("_cum") >= j * F.col("_n"),
                            F.col("_v"),
                        )
                    )
                    for j in range(1, k)
                ]
            )
        ).alias("_ts")
    )
    return (
        base.join(F.broadcast(cut_arrays), "_m")
        .withColumn(
            out_col,
            F.lit(1)
            + F.size(F.filter("_ts", lambda t: F.col("_v") > t)),
        )
        .drop("_ts", "_v", "_m")
    )


def rfm_scores(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    val_col: str = "value",
    event_filter: Column | None = None,
    k: int = 5,
) -> DataFrame:
    """RFM (recency / frequency / monetary) quantile scoring — the
    classic customer-value segmentation, built scale-safe: the three
    per-key metrics unpivot to a (key, metric, value) long table and
    ONE ``quantile_buckets`` call scores all three against exact
    order-statistic cutoffs (no global ntile window; cutoffs broadcast
    as a (k-1)-element array per metric).

    INTEGER-EXACT: recency is the max event microsecond timestamp
    (later = better), frequency the exact count, monetary the exact
    cent sum; equal metric values always score equally (ntile splits
    ties arbitrarily across buckets — not engine-reproducible).

    Emits (key, r_score, f_score, m_score, rfm) with rfm = 100r+10f+m.
    """
    src = events if event_filter is None else events.where(event_filter)
    per_key = src.groupBy(key_col).agg(
        F.max(F.unix_micros(F.col(ts_col))).alias("_r"),
        F.count(F.lit(1)).alias("_f"),
        F.sum(F.floor(F.col(val_col) * 100.0 + 0.5)).cast("long").alias("_m"),
    )
    long = per_key.selectExpr(
        key_col,
        "stack(3, 'R', _r, 'F', _f, 'M', _m) AS (metric, v)",
    )
    scored = quantile_buckets(
        long, F.col("v"), k, metric_col="metric", out_col="score"
    )
    return (
        scored.groupBy(key_col)
        .pivot("metric", ["R", "F", "M"])
        .agg(F.first("score"))
        .select(
            key_col,
            F.col("R").alias("r_score"),
            F.col("F").alias("f_score"),
            F.col("M").alias("m_score"),
            (F.col("R") * 100 + F.col("F") * 10 + F.col("M")).alias("rfm"),
        )
    )


def _one_vs_rest_grid(
    df: DataFrame, group_col: str, cents: Column
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Shared substrate of the one-vs-rest drift screens (KS sup-gap,
    Mann-Whitney rank sum): NULL-valued rows dropped (they carry no
    value and a non-null-safe grid join would silently lose their mass
    from the cumulative sums while the sizes still counted them —
    review find), ONE map-side-combined (group, value) count behind an
    eager checkpoint barrier (per-use column pruning would otherwise
    plan one input scan per derivation), group sizes/total as broadcast
    dims, and the groups × quantized-values densified grid with
    zero-filled group counts. Returns (dense, gc, sizes, total); dense
    carries (group, _v, _call, _cg)."""
    vv = cents.cast("long")
    pc = (
        df.where(vv.isNotNull())
        .groupBy(F.col(group_col), vv.alias("_v"))
        .agg(F.count(F.lit(1)).cast("long").alias("_cg"))
    )
    # quantized-grain barrier: one input scan feeds every derivation
    pc = pc.localCheckpoint(eager=True)
    gc = pc.groupBy("_v").agg(F.sum("_cg").cast("long").alias("_call"))
    sizes = pc.groupBy(group_col).agg(
        F.sum("_cg").cast("long").alias("n_g")
    )
    total = sizes.agg(F.sum("n_g").cast("long").alias("_tot"))
    # sizes IS the group dim (one row per group) — broadcast it into the
    # densification instead of a separate distinct (review find); gc is
    # the quantized value grid, so the product is grid-sized
    dense = (
        gc.crossJoin(F.broadcast(sizes))
        .join(pc, [group_col, "_v"], "left")
        .withColumn("_cg", F.coalesce(F.col("_cg"), F.lit(0).cast("long")))
    )
    return dense, gc, sizes, total


def ks_one_vs_rest(
    df: DataFrame,
    group_col: str,
    cents: Column,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov distance of every group's
    value distribution against the REST of the table — the
    distribution-drift screen a corpus/metrics pipeline runs when one
    source, shard, or snapshot may have silently changed its value mix
    (the two-sample KS statistic is the classic nonparametric test;
    Massey 1951, public-domain statistics).

    D_g = max_x |F_g(x) − F_rest(x)| is computed WITHOUT floats: with
    group counts c_g(x), global counts c(x), group size n_g and total
    N, the supremum is the BIGINT maximum of

        |cum_g(x)·(N − n_g) − (cum(x) − cum_g(x))·n_g|

    over the value grid, with denominator n_g·(N − n_g) — one IEEE
    division at the end. Int64-exact while n_g·N < 2^63 (holds to
    ~3·10^9 rows); the emitted (ks_num, ks_den) pair stays exact
    regardless.

    Scale shape: the table is touched ONCE by a map-side-combined
    (group, value) count; everything downstream — the global value
    grid, the group×grid densification, the per-group ordered cum
    window and the max — runs on the quantized groups × distinct-values
    grain (values are scaled integers, so the grid is
    quantization-bounded, not row-bounded). The (group, value) counts
    are eagerly local-checkpointed (same discipline as the layout
    operators) because FOUR derivations consume them — without the
    barrier, per-use column pruning plans four separate input scans.
    Group sizes and the total ride broadcast joins; no global window,
    no event-sized shuffle after the first aggregate.
    """
    dense, _, _, total = _one_vs_rest_grid(df, group_col, cents)
    dense = dense.crossJoin(F.broadcast(total))
    w = (
        Window.partitionBy(group_col)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = dense.select(
        group_col,
        "n_g",
        "_tot",
        F.abs(
            F.sum("_cg").over(w) * (F.col("_tot") - F.col("n_g"))
            - (F.sum("_call").over(w) - F.sum("_cg").over(w)) * F.col("n_g")
        )
        .cast("long")
        .alias("_d"),
    )
    return (
        stepped.groupBy(group_col)
        .agg(
            F.max("n_g").cast("long").alias("n_g"),
            (F.max("_tot") - F.max("n_g")).cast("long").alias("n_rest"),
            F.max("_d").cast("long").alias("ks_num"),
            (F.max("n_g") * (F.max("_tot") - F.max("n_g")))
            .cast("long")
            .alias("ks_den"),
        )
        .withColumn(
            "ks_d",
            F.when(F.col("ks_den") == 0, F.lit(None)).otherwise(
                F.col("ks_num").cast("double") / F.col("ks_den").cast("double")
            ),
        )
    )


def mann_whitney_one_vs_rest(
    df: DataFrame,
    group_col: str,
    cents: Column,
) -> DataFrame:
    """Exact Mann–Whitney U / rank-sum drift of every group against the
    rest of the table — the rank-based companion of ``ks_one_vs_rest``
    (KS is sensitive to the worst single ECDF gap; U measures the whole
    stochastic ordering, emitted as the AUC effect size
    P(group value > rest value) + ½·P(tie); Mann & Whitney 1947,
    public-domain statistics).

    INTEGER-EXACT tie handling: ranks are midranks over the combined
    sample. A value v occupying ranks (cum_before+1 .. cum_before+c)
    has midrank cum_before + (c+1)/2, so TWICE the group's rank sum is
    the BIGINT

        2·R_g = Σ_v c_g(v) · (2·cum_before(v) + c(v) + 1)

    and twice the U statistic is 2U = 2R_g − n_g·(n_g+1), an exact
    BIGINT in [0, 2·n_g·n_rest]; auc = 2U / (2·n_g·n_rest) is the one
    IEEE division. No float ranks, no transcendental.

    Scale shape: identical substrate to ``ks_one_vs_rest`` — ONE
    map-side-combined (group, value) count behind an eager checkpoint
    barrier, then a groups × quantized-values densified grid whose
    per-group ordered window supplies the global cumulative counts
    (no single-partition window anywhere); sizes and the total ride
    broadcasts.
    """
    dense, _, sizes, total = _one_vs_rest_grid(df, group_col, cents)
    dense = dense.drop("n_g")
    w = (
        Window.partitionBy(group_col)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    stepped = dense.select(
        group_col,
        "_cg",
        "_call",
        (F.sum("_call").over(w) - F.col("_call")).alias("_before"),
    ).select(
        group_col,
        (
            F.col("_cg")
            * (F.lit(2) * F.col("_before") + F.col("_call") + F.lit(1))
        ).alias("_r2c"),
    )
    return (
        stepped.groupBy(group_col)
        .agg(F.sum("_r2c").cast("long").alias("_r2"))
        .join(F.broadcast(sizes), group_col)
        .crossJoin(F.broadcast(total))
        .select(
            group_col,
            "n_g",
            (F.col("_tot") - F.col("n_g")).cast("long").alias("n_rest"),
            (F.col("_r2") - F.col("n_g") * (F.col("n_g") + 1))
            .cast("long")
            .alias("u2"),
            (F.lit(2) * F.col("n_g") * (F.col("_tot") - F.col("n_g")))
            .cast("long")
            .alias("u2_den"),
        )
        .withColumn(
            "auc",
            F.when(F.col("u2_den") == 0, F.lit(None)).otherwise(
                F.col("u2").cast("double") / F.col("u2_den").cast("double")
            ),
        )
    )


def cramers_v_assoc(
    df: DataFrame,
    row_col: Column,
    col_col: Column,
    row_name: str = "r_key",
    col_name: str = "c_key",
) -> DataFrame:
    """Categorical association (chi-square / Cramér's V) between two
    discrete columns — the contingency screen that decides whether two
    corpus facets (source × language, event type × hour) are
    independent or entangled (Cramér 1946, public-domain statistics).

    DETERMINISTIC FIXED-POINT: the classic per-cell term (O−E)²/E
    expands to (O·N − r·c)²/(N·r·c); each cell contributes the BIGINT

        q_cell = FLOOR((O·N − r·c)² / (r·c))

    where the difference, square and division run through a pinned
    correctly-rounded double chain (every factor an exact int64, so
    the chain is engine-identical at any scale and never overflows —
    the BIGINT product form threw ARITHMETIC_OVERFLOW at the 64×
    probe). Cells are summed exactly over the DENSIFIED grid (empty
    cells contribute their exact expectation term) and divided by N
    once: chi2 = Σq/N. Cramér's V is the pinned IEEE chain
    sqrt(chi2/(N·min(R−1, C−1))).

    Determinism vs exactness (ADVICE r10): what the oracle gate proves
    is ENGINE-IDENTICAL determinism — DuckDB replays the identical IEEE
    chain, so every emitted value matches bit-for-bit at any N. The
    stronger claim that the floored q_cell equals the exact integer
    value additionally needs its inputs inside 2^53: O·N and (O·N−r·c)²
    are exact while they fit (q_cell ≤ N·chi²-share keeps the RESULT
    small, but sparse marginals can push the intermediates past 2^53 —
    e.g. r=c=1, O=1 gives (N−1)², exceeding 2^53 once N ≳ 9.5·10⁷,
    and the O·N product itself rounds above 2^53). Past that bound the
    statistic is still deterministic and well-conditioned, just not
    provably the floor of the exact rational.

    Scale shape: ONE map-side-combined (row, col) count behind an eager
    checkpoint barrier (three derivations consume it); marginals ride
    broadcasts; the densified grid is levels × levels — quantized,
    never row-sized. Emits a single row:
    (n, r_levels, c_levels, chi2_fp, chi2, cramers_v).
    """
    pc = (
        df.where(row_col.isNotNull() & col_col.isNotNull())
        .groupBy(row_col.alias(row_name), col_col.alias(col_name))
        .agg(F.count(F.lit(1)).cast("long").alias("_o"))
    )
    pc = pc.localCheckpoint(eager=True)
    rt = pc.groupBy(row_name).agg(F.sum("_o").cast("long").alias("_r"))
    ct = pc.groupBy(col_name).agg(F.sum("_o").cast("long").alias("_c"))
    grid = rt.crossJoin(F.broadcast(ct))
    dense = (
        grid.join(pc, [row_name, col_name], "left")
        .withColumn("_o", F.coalesce(F.col("_o"), F.lit(0).cast("long")))
    )
    tot = pc.agg(F.sum("_o").cast("long").alias("_n")).crossJoin(
        rt.agg(F.count(F.lit(1)).cast("long").alias("r_levels"))
    ).crossJoin(ct.agg(F.count(F.lit(1)).cast("long").alias("c_levels")))
    cells = dense.crossJoin(F.broadcast(tot)).select(
        "_n",
        "r_levels",
        "c_levels",
        # a = O·N − r·c and its square leave integer space through a
        # pinned correctly-rounded double chain (the BIGINT product
        # overflows around N ~ 10^6 with concentrated cells — the 64x
        # probe regime); engine-identical at any N, and exactly the
        # floored rational while the intermediates fit 2^53 (see
        # docstring — sparse marginals can exceed that above N ~ 9e7)
        F.expr(
            "CAST(FLOOR("
            "  (CAST(_o AS DOUBLE) * CAST(_n AS DOUBLE)"
            "   - CAST(_r AS DOUBLE) * CAST(_c AS DOUBLE))"
            "  * (CAST(_o AS DOUBLE) * CAST(_n AS DOUBLE)"
            "     - CAST(_r AS DOUBLE) * CAST(_c AS DOUBLE))"
            "  / (CAST(_r AS DOUBLE) * CAST(_c AS DOUBLE))"
            ") AS BIGINT)"
        ).alias("_q"),
    )
    out = cells.groupBy("_n", "r_levels", "c_levels").agg(
        F.sum("_q").cast("long").alias("chi2_fp")
    )
    k = F.least(F.col("r_levels") - 1, F.col("c_levels") - 1)
    chi2 = F.col("chi2_fp").cast("double") / F.col("_n").cast("double")
    return out.select(
        F.col("_n").alias("n"),
        "r_levels",
        "c_levels",
        "chi2_fp",
        chi2.alias("chi2"),
        F.when(k <= 0, F.lit(None)).otherwise(
            F.sqrt(chi2 / (F.col("_n") * k).cast("double"))
        ).alias("cramers_v"),
    )


def spearman_corr(
    df: DataFrame,
    key_cols: list[str],
    x: Column,
    y: Column,
) -> DataFrame:
    """Exact Spearman rank correlation per key — Pearson over midranks,
    the monotone-association screen that survives any monotone
    transform and heavy ties (Spearman 1904, public-domain statistics;
    complements ``corr_components``' Pearson on raw values).

    INTEGER-EXACT midranks: with min-rank r and tie count c for a
    value, TWICE the midrank is the BIGINT 2r + c − 1, so all five
    sufficient statistics (Σrx, Σry, Σrx², Σry², Σrx·ry over doubled
    midranks) are exact integer sums; doubling cancels in the
    correlation. The five sums accumulate in DECIMAL(38,0) (r11 — the
    256× probe caught the int64 version overflowing: Σr² grows as
    4n³/3, past 2^63 above ~1.3M rows/key; decimal is exact to 10^38,
    i.e. ~3·10^12 rows/key, and the SQL oracle's HUGEINT accumulators
    are the same exact integer). Per-element products r² ≤ 4n² stay
    int64-exact below ~1.5·10^9 rows/key — the one remaining documented
    bound. The derived moments covn/vxn/vyn leave integer space through
    the same pinned correctly-rounded double chain as ``acf_lags`` —
    both engines round the identical exact integer to the identical
    double, at any scale.

    Scale shape: ONE hash exchange on the key — both rank windows and
    both tie-count windows reuse the same partitioning (Spark re-sorts
    within partitions, never re-shuffles), and the final aggregate
    collapses on the same key map-side. NULL x/y rows are dropped
    first (rank semantics need totals over ranked rows only).
    """
    base = df.select(
        *key_cols, x.cast("long").alias("_x"), y.cast("long").alias("_y")
    ).where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    wx = Window.partitionBy(*key_cols).orderBy("_x")
    wy = Window.partitionBy(*key_cols).orderBy("_y")
    cx = Window.partitionBy(*key_cols, "_x")
    cy = Window.partitionBy(*key_cols, "_y")
    ranked = base.select(
        *key_cols,
        (
            F.lit(2) * F.rank().over(wx) + F.count(F.lit(1)).over(cx) - F.lit(1)
        )
        .cast("long")
        .alias("_rx"),
        (
            F.lit(2) * F.rank().over(wy) + F.count(F.lit(1)).over(cy) - F.lit(1)
        )
        .cast("long")
        .alias("_ry"),
    )
    dec = "decimal(38,0)"
    agg = ranked.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("_rx").cast(dec)).alias("_sx"),
        F.sum(F.col("_ry").cast(dec)).alias("_sy"),
        F.sum((F.col("_rx") * F.col("_rx")).cast(dec)).alias("_sxx"),
        F.sum((F.col("_ry") * F.col("_ry")).cast(dec)).alias("_syy"),
        F.sum((F.col("_rx") * F.col("_ry")).cast(dec)).alias("_sxy"),
    )
    # the n·Σ products leave integer space through the same pinned
    # correctly-rounded double chain as acf_lags — overflow-proof at
    # any key size, engine-identical (each factor is an exact int64)
    def _nd(a: str, b: str, c: str, d: str) -> Column:
        return F.col(a).cast("double") * F.col(b).cast("double") - F.col(
            c
        ).cast("double") * F.col(d).cast("double")

    covn = _nd("n", "_sxy", "_sx", "_sy")
    vxn = _nd("n", "_sxx", "_sx", "_sx")
    vyn = _nd("n", "_syy", "_sy", "_sy")
    return agg.select(
        *key_cols,
        "n",
        covn.alias("covn"),
        vxn.alias("vxn"),
        vyn.alias("vyn"),
    ).withColumn(
        "rho",
        F.when(
            (F.col("vxn") == 0) | (F.col("vyn") == 0), F.lit(None)
        ).otherwise(F.col("covn") / F.sqrt(F.col("vxn") * F.col("vyn"))),
    )


def gini_coefficient(
    df: DataFrame,
    key_cols: list[str],
    cents: Column,
    tiebreak_col: str,
) -> DataFrame:
    """Exact Gini inequality coefficient per key over non-negative
    scaled-integer values (the classic Lorenz-area statistic):

        G = Σ_i (2i − n − 1)·x_(i) / (n·Σx),  x sorted ascending.

    INTEGER-EXACT: the numerator and denominator are BIGINT
    (ties are order-invariant — within a tied block x is constant, so
    the coefficient sum over the block is fixed regardless of
    permutation; the (value, tiebreak) ordering just pins the rank
    function). One IEEE division at the end; NULL when Σx = 0.

    Scale shape: ONE hash exchange on the key — the rank window and
    the final aggregate share the partitioning. Complements the HHI
    count-concentration screen with value inequality.
    """
    w = Window.partitionBy(*key_cols).orderBy("_v", tiebreak_col)
    wc = Window.partitionBy(*key_cols)
    base = df.select(
        *key_cols, cents.cast("long").alias("_v"), F.col(tiebreak_col)
    ).where(F.col("_v").isNotNull())
    ranked = base.select(
        *key_cols,
        "_v",
        F.row_number().over(w).cast("long").alias("_i"),
        F.count(F.lit(1)).over(wc).cast("long").alias("_n"),
    )
    agg = ranked.groupBy(*key_cols).agg(
        F.max("_n").cast("long").alias("n"),
        F.sum("_v").cast("long").alias("sum_cents"),
        F.sum((F.lit(2) * F.col("_i") - F.col("_n") - F.lit(1)) * F.col("_v"))
        .cast("long")
        .alias("gini_num"),
    )
    return agg.select(
        *key_cols,
        "n",
        "sum_cents",
        "gini_num",
        (F.col("n") * F.col("sum_cents")).cast("long").alias("gini_den"),
    ).withColumn(
        "gini",
        F.when(F.col("gini_den") == 0, F.lit(None)).otherwise(
            F.col("gini_num").cast("double") / F.col("gini_den").cast("double")
        ),
    )


# Benford first-digit probabilities log10(1 + 1/d), d = 1..9, in 1e-9
# fixed point — the SAME integer literals are embedded in the SQL oracle,
# so no engine evaluates a logarithm anywhere.
BENFORD_FP: tuple[int, ...] = (
    301029996, 176091259, 124938737, 96910013, 79181246,
    66946790, 57991947, 51152522, 45757491,
)


def benford_deviation(
    df: DataFrame,
    group_col: str,
    cents: Column,
) -> DataFrame:
    """Benford first-digit conformity screen per group (Newcomb 1881 /
    Benford 1938, public-domain statistics) — the classic
    fabricated-or-synthetic-data detector a data-quality gate runs on
    financial-style value columns.

    INTEGER-EXACT: first digits come from the decimal string of the
    positive scaled value; expected probabilities are 1e-9 FIXED-POINT
    CONSTANTS (no engine evaluates log10 — the literals above appear
    verbatim in both plans). The deviation is the BIGINT maximum of
    |obs_d·10⁹ − n·exp_fp_d| over the nine digits — the sup-norm
    distance between observed and Benford distributions in n·10⁻⁹
    grains — with one IEEE division for the reported ``mad``.

    Scale shape: ONE map-side-combined (group, digit) count, eagerly
    local-checkpointed (two derivations consume it — the KS-substrate
    discipline); the deviation fold runs on the groups × 9 grain
    joined to a 9-row broadcast constant table. Zero-valued rows are
    excluded (no first digit), matching Benford's domain.
    """
    spark = df.sparkSession
    exp = local_rows_df(
        spark,
        [(d + 1, fp) for d, fp in enumerate(BENFORD_FP)],
        "digit long, exp_fp long",
    )
    v = cents.cast("long")
    digits = df.select(
        F.col(group_col),
        F.substring(v.cast("string"), 1, 1).cast("long").alias("digit"),
    ).where(v > 0)
    pc = digits.groupBy(group_col, "digit").agg(
        F.count(F.lit(1)).cast("long").alias("obs")
    )
    # groups x 9 grain barrier: one input scan feeds both derivations
    pc = pc.localCheckpoint(eager=True)
    sizes = pc.groupBy(group_col).agg(F.sum("obs").cast("long").alias("n"))
    dense = (
        sizes.crossJoin(F.broadcast(exp))
        .join(pc, [group_col, "digit"], "left")
        .withColumn("obs", F.coalesce(F.col("obs"), F.lit(0).cast("long")))
    )
    dev = dense.select(
        group_col,
        "n",
        F.abs(
            F.col("obs") * F.lit(1_000_000_000).cast("long")
            - F.col("n") * F.col("exp_fp")
        )
        .cast("long")
        .alias("_d"),
    )
    return (
        dev.groupBy(group_col)
        .agg(
            F.max("n").cast("long").alias("n"),
            F.max("_d").cast("long").alias("mad_num"),
        )
        .withColumn(
            "mad",
            F.col("mad_num").cast("double")
            / (F.col("n").cast("double") * F.lit(1e9)),
        )
    )


def anova_f_oneway(
    df: DataFrame,
    group_col: str,
    cents: Column,
) -> DataFrame:
    """One-way ANOVA F statistic across ALL groups (Fisher, public-
    domain statistics) — the parametric mean-shift screen completing
    the drift family (KS: worst ECDF gap; Mann–Whitney: stochastic
    ordering; F: between-group vs within-group variance). Emits ONE
    row: (k, n, ssb, ssw, f_stat).

    DETERMINISTIC: per-group sufficient statistics (n_g, S_g, Sxx_g)
    are exact BIGINTs; the between/within sums of squares leave
    integer space per group through the pinned correctly-rounded
    chain S_g²/n_g FLOORED to BIGINT (deterministic in any engine;
    < 2^63 since S_g²/n_g ≤ n_g·max²), then BIGINT-summed across
    groups — no order-dependent float accumulation. F is the final
    pinned double ratio; NULL when k < 2 or n ≤ k or SSW = 0.

    Scale shape: one map-side-combined group aggregate (the only
    row-scale pass), then a k-row fold.
    """
    v = cents.cast("long")
    per = (
        df.where(v.isNotNull())
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(v).cast("long").alias("_s"),
            F.sum(v * v).cast("long").alias("_sxx"),
        )
    )
    term = F.floor(
        F.col("_s").cast("double")
        * F.col("_s").cast("double")
        / F.col("_n").cast("double")
    ).cast("long")
    folded = per.select(
        F.col("_n"), F.col("_s"), F.col("_sxx"), term.alias("_t")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("_n").cast("long").alias("n"),
        F.sum("_s").cast("long").alias("_stot"),
        F.sum("_sxx").cast("long").alias("_sxxtot"),
        F.sum("_t").cast("long").alias("_ssb_raw"),
    )
    grand = F.floor(
        F.col("_stot").cast("double")
        * F.col("_stot").cast("double")
        / F.col("n").cast("double")
    ).cast("long")
    # clamp: the per-group floors can undershoot the floored grand term
    # by up to k grains, which would emit an out-of-domain negative F
    out = folded.select(
        "k",
        "n",
        F.greatest(
            F.lit(0).cast("long"), (F.col("_ssb_raw") - grand).cast("long")
        ).alias("ssb"),
        (F.col("_sxxtot") - F.col("_ssb_raw")).cast("long").alias("ssw"),
    )
    return out.withColumn(
        "f_stat",
        F.when(
            (F.col("k") < 2) | (F.col("n") <= F.col("k")) | (F.col("ssw") <= 0),
            F.lit(None),
        ).otherwise(
            (F.col("ssb").cast("double") / (F.col("k") - 1).cast("double"))
            / (F.col("ssw").cast("double") / (F.col("n") - F.col("k")).cast("double"))
        ),
    )


def kendall_tau_buckets(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    val_col: str,
    period_expr: str = "hour",
) -> DataFrame:
    """Kendall rank correlation (tau-b) per key between the period
    bucket and the bucket's exact mean value — the concordance screen
    completing the monotone-association family (Spearman = rank
    Pearson; Kendall = pairwise concordance; Kendall 1938,
    public-domain statistics). Like ``theil_sen_trend``, the events
    collapse to the (key, bucket) grain first, so ALL pair work is
    bounded by buckets² per key (≤ 276 pairs for hours) at any input
    size.

    INTEGER-EXACT concordance: bucket means stay exact rationals
    (cent sum s, count n); the (h1 < h2) pair is concordant iff
    s2·n1 > s1·n2 (BIGINT cross-multiply — exact while |s|·n < 2^63,
    the same documented bound as theil_sen's slope fractions),
    discordant iff <, a y-tie iff equal; the period is never tied
    (h2 > h1 by construction). tau_b = (C − D)/√(n0·(n0 − T)) with
    n0 the pair count and T the y-ties — one pinned IEEE chain, NULL
    when every pair ties.

    NULL value/ts rows are excluded BEFORE the bucket aggregate
    (n and s must cover the same rows — the theil_sen ADVICE fix,
    applied here from birth). Keys with < 2 buckets drop (no pairs).

    Output: (key_cols…, n_buckets, n_pairs, concordant, discordant,
    ties_y, tau_b).
    """
    cents = F.floor(F.col(val_col) * 100.0 + 0.5).cast("long")
    per = (
        df.where(F.col(val_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(
            *key_cols,
            F.expr(f"{period_expr}({ts_col})").cast("long").alias("_h"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.sum(cents).cast("long").alias("_s"),
        )
    )
    # eager checkpoint barrier: THREE consumers derive from the bucket
    # grain (both self-join sides + the bucket count) and without it
    # Catalyst re-runs the event-sized aggregate under each (r11 plan
    # audit). `per` is keys × ≤24 rows — a metadata-sized job.
    per = per.localCheckpoint(eager=True)
    a = per.select(
        *key_cols,
        F.col("_h").alias("_h1"),
        F.col("_n").alias("_n1"),
        F.col("_s").alias("_s1"),
    )
    b = per.select(
        *key_cols,
        F.col("_h").alias("_h2"),
        F.col("_n").alias("_n2"),
        F.col("_s").alias("_s2"),
    )
    lhs = F.col("_s2") * F.col("_n1")
    rhs = F.col("_s1") * F.col("_n2")
    pairs = (
        a.join(b, key_cols)
        .where(F.col("_h2") > F.col("_h1"))
        .select(
            *key_cols,
            F.when(lhs > rhs, 1).otherwise(0).cast("long").alias("_c"),
            F.when(lhs < rhs, 1).otherwise(0).cast("long").alias("_d"),
            F.when(lhs == rhs, 1).otherwise(0).cast("long").alias("_t"),
        )
    )
    nb = per.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets")
    )
    agg = pairs.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum("_c").cast("long").alias("concordant"),
        F.sum("_d").cast("long").alias("discordant"),
        F.sum("_t").cast("long").alias("ties_y"),
    )
    return (
        agg.join(nb, key_cols)
        .select(
            *key_cols,
            "n_buckets",
            "n_pairs",
            "concordant",
            "discordant",
            "ties_y",
            F.when(F.col("n_pairs") == F.col("ties_y"), F.lit(None))
            .otherwise(
                (F.col("concordant") - F.col("discordant")).cast("double")
                / F.sqrt(
                    F.col("n_pairs").cast("double")
                    * (F.col("n_pairs") - F.col("ties_y")).cast("double")
                )
            )
            .alias("tau_b"),
        )
    )


def k_anonymity_audit(
    df: DataFrame,
    qi_cols: list[str],
    k: int = 5,
    sensitive_col: str | None = None,
) -> DataFrame:
    """k-anonymity / quasi-identifier re-identification audit — the
    privacy screen a corpus release runs next to ``pii_scrub`` (VERDICT
    r11 #5): every combination of the quasi-identifier columns
    ``qi_cols`` forms an equivalence class; a class with fewer than
    ``k`` rows re-identifies its members (Sweeney, IJUFKS 2002). With a
    ``sensitive_col``, each class also carries its l-diversity — the
    count of distinct sensitive values (Machanavajjhala et al., ICDE
    2006): a class can be k-anonymous yet leak the attribute when all
    k rows share one sensitive value.

    Output: one row per equivalence class —
    (*qi_cols, class_size, l_diversity, at_risk) plus the global
    (n_classes, n_classes_at_risk, rows_at_risk) riding every row via a
    broadcast single-row aggregate (the drift-report pattern), so the
    report serves per-class drill-down AND the release gate in one
    result. All counts are exact BIGINTs — trivially engine-identical.

    NULL is a QI value like any other (SQL GROUP BY semantics): an
    attacker sees "field absent" as a signature too. l_diversity counts
    non-NULL sensitive values only (count_distinct semantics in both
    engines), so an all-NULL class scores 0.

    Scale shape: ONE corpus-wide aggregate on the QI grain (map-side
    partial combine; with a sensitive column the count_distinct expands
    to the (QI, sensitive) grain first — still one exchange under AQE);
    everything after runs on the class grain. No window, no join back
    to the corpus.
    """
    aggs = [F.count(F.lit(1)).cast("long").alias("class_size")]
    if sensitive_col is not None:
        aggs.append(
            F.count_distinct(F.col(sensitive_col))
            .cast("long")
            .alias("l_diversity")
        )
    per = (
        df.groupBy(*[F.col(c) for c in qi_cols])
        .agg(*aggs)
        .withColumn("at_risk", F.col("class_size") < F.lit(int(k)))
    )
    # eager barrier on the class grain (the drift-report pattern): two
    # consumers derive from `per`; without it Catalyst re-executes the
    # corpus-wide QI aggregate under each
    per = per.localCheckpoint(eager=True)
    tot = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.coalesce(
            F.sum(F.when(F.col("at_risk"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_classes_at_risk"),
        F.coalesce(
            F.sum(F.when(F.col("at_risk"), F.col("class_size")).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("rows_at_risk"),
    )
    return per.crossJoin(F.broadcast(tot))


def randomized_response_counts(
    df: DataFrame,
    group_cols: list[str],
    sensitive: Column,
    id_col: str,
    keep_num: int = 3,
    keep_den: int = 4,
) -> DataFrame:
    """Local differential privacy for per-group boolean rates — Warner's
    randomized response (JASA 1965), the mechanism LDP telemetry
    pipelines (RAPPOR-family) build on: each row reports its sensitive
    bit TRUTHFULLY with probability p = keep_num/keep_den and FLIPPED
    otherwise (ε = ln(p/(1−p)); the default 3/4 gives ε = ln 3), so no
    individual row's report reveals its true bit beyond ε.

    The "coin" is the deterministic md5-uniform draw on ``id_col``
    (``corpus.hash_uniform`` — the repo's reproducible-sampling
    primitive): truthful iff u32 mod keep_den < keep_num. Deterministic
    ≠ private in production — a release would draw real randomness per
    report; the md5 coin stands in so the WHOLE mechanism, debiasing
    included, is bit-replayable in ANSI SQL and driver-gated. The
    estimator is the exact integer debias of the observed count:

        t̂ · (2·num − den) = n_reported_true·den − (den−num)·n
        → emitted as one exact BIGINT named est_true_x{2·num−den}
        (for p=3/4: 4·n_reported_true − n, which is 2·t̂)

    so no float division ever happens; consumers divide by the scale
    the column name pins. Output per group: (*group_cols, n,
    n_reported_true, est_true_x2_scaled, true_count) — true_count rides
    along for calibration tests (a real release would drop it).

    Scale shape: the report bit is a zero-shuffle codegen map on the
    scan; ONE group aggregate (map-side combined) produces every
    column; nothing touches row grain afterwards.
    """
    from ram_datapipeline_spark.operators.corpus import hash_uniform

    # ADVICE r12: p must sit strictly in (1/2, 1) — p = 1 reports
    # truthfully (ε = ∞, no privacy), p = 1/2 zeroes the estimator scale
    # (ε = 0, no signal), and p < 1/2 silently names a negative-scale
    # column. Mirror holt_linear_smooth's loud parameter guard.
    if not (keep_den > keep_num > keep_den / 2):
        raise ValueError(
            "randomized_response_counts: need keep_den > keep_num > "
            f"keep_den/2 (1/2 < p < 1), got p = {keep_num}/{keep_den}"
        )
    u = hash_uniform(F.col(id_col))
    truthful = (u % F.lit(keep_den)) < F.lit(keep_num)
    s = sensitive.cast("boolean")
    reported = F.when(truthful, s).otherwise(~s)
    scale = 2 * keep_num - keep_den
    est_col = f"est_true_x{scale}"
    return (
        df.select(
            *[F.col(c) for c in group_cols],
            s.alias("_s"),
            reported.alias("_r"),
        )
        .groupBy(*[F.col(c) for c in group_cols])
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.when(F.col("_r"), 1).otherwise(0))
            .cast("long")
            .alias("n_reported_true"),
            F.sum(F.when(F.col("_s"), 1).otherwise(0))
            .cast("long")
            .alias("true_count"),
        )
        .withColumn(
            est_col,
            (
                F.col("n_reported_true") * F.lit(keep_den)
                - F.col("n") * F.lit(keep_den - keep_num)
            ).cast("long"),
        )
    )
