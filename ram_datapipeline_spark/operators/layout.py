"""Data-layout operators: multi-dimensional clustering (Z-order).

Reading 100 TB is dominated by how much of it you can SKIP. Min/max
zone maps (parquet row-group stats, Delta/Iceberg file stats) prune a
scan only if rows near each other in FILE ORDER are near each other in
the FILTER columns — one sort column gives that for one dimension and
destroys it for the rest. The Z-order (Morton) curve interleaves the
bits of several dimensions into one sort key, so rows close in z are
close in EVERY interleaved dimension at once, and a 2-D range predicate
touches O(perimeter) files instead of O(all).

Spark-first: the key is pure integer bit arithmetic (whole-stage
codegen, no UDF), the layout is ``repartitionByRange(z)`` (Spark's
sampled range partitioner balances output files even on skewed keys) +
``sortWithinPartitions`` — exactly the write path before a
``write.parquet``. Bit-interleaving is exact in any engine, so the key
itself is DuckDB-replayable; the clustering guarantee (sorted,
non-overlapping partition z-ranges) is asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Physical plan of each two-pass operator's layout stage (range exchange +
# local sort), recorded at build time. The layout is eagerly
# local-checkpointed (see _range_layout), so the final query plan shows a
# `Scan ExistingRDD` where the exchange ran — the plan guards in
# tests/test_plan_properties.py read the recorded layout plan here to keep
# asserting the range-partitioned shape.
LAYOUT_PLANS: dict[str, str] = {}


def _range_layout(
    df: DataFrame, order_exprs: list[Column], n_partitions: int, op: str
) -> DataFrame:
    """The shared pass-0 of the two-pass global-order operators: range
    exchange (sampled split points) + local sort + pinned partition id,
    materialized with an EAGER ``localCheckpoint``.

    Checkpointing (not ``persist``) is load-bearing twice over (ADVICE
    r9): (a) lifetime — checkpoint blocks are owned by the RDD and freed
    by the ContextCleaner when the result plan is garbage-collected, so
    repeated calls in a long session no longer accumulate cached
    partitions forever (the old ``persist`` had no unpersist point: the
    returned frame is lazy and the safe moment is unknowable); (b)
    correctness — the range sampler reseeds per execution, so a cache
    eviction between the driver collect (pass 1) and the Arrow fold
    (pass 2) could silently re-split the data under a stale pid→base
    map. Checkpoint blocks are immutable: both passes provably see the
    same layout.
    """
    part = (
        df.repartitionByRange(n_partitions, *order_exprs)
        .sortWithinPartitions(*order_exprs)
        .withColumn("_pid", F.spark_partition_id())
    )
    LAYOUT_PLANS[op] = part._jdf.queryExecution().executedPlan().toString()
    return part.localCheckpoint(eager=True)


def morton_key(cols: list[Column], bits: int) -> Column:
    """Interleave the low ``bits`` bits of each (non-negative integer)
    column into one BIGINT Z-value. With d columns, bit i of column j
    lands at position ``i*d + j`` — the sum form (each term a distinct
    bit, so addition == OR) keeps the whole expression in codegen
    arithmetic. d*bits must fit a signed 64-bit int (≤ 62).
    Caller contract: values ≥ 0 and < 2**bits (mask with % or
    ``F.pmod`` first); violating it silently aliases cells.
    """
    d = len(cols)
    if d < 2:
        raise ValueError("morton_key: need at least 2 columns")
    if d * bits > 62:
        raise ValueError(f"morton_key: {d}×{bits} bits exceed a BIGINT")
    terms = []
    for j, c in enumerate(cols):
        x = c.cast("long")
        for i in range(bits):
            terms.append(
                F.shiftright(x, i).bitwiseAND(F.lit(1))
                * F.lit(1 << (i * d + j))
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def morton_key_sql(cols: list[str], bits: int) -> str:
    """The SAME interleave as ANSI/DuckDB SQL text — generated
    term-for-term so oracle queries replay the key bit-exactly."""
    d = len(cols)
    terms = [
        f"((({c} >> {i}) & 1) * {1 << (i * d + j)})"
        for j, c in enumerate(cols)
        for i in range(bits)
    ]
    return "(" + " + ".join(terms) + ")"


def cluster_by_zorder(
    df: DataFrame, z: Column, n_partitions: int, z_col: str = "z"
) -> DataFrame:
    """Materialize the write layout: attach the z key, range-partition
    on it (sampled split points — balanced output files under skew) and
    sort within each partition. The result is what ``.write.parquet``
    should consume: every output file covers one compact z-range, so
    per-file min/max stats on the ORIGINAL dimensions are tight and a
    2-D predicate prunes most files. No global sort — range exchange +
    local sort only."""
    return (
        df.withColumn(z_col, z)
        .repartitionByRange(n_partitions, F.col(z_col))
        .sortWithinPartitions(z_col)
    )


def zorder_buckets_for_box(
    x0: int, x1: int, y0: int, y1: int, bits: int, bucket_bits: int
) -> list[int]:
    """The read-side companion to the Z-order layout: the exact set of
    top-``bucket_bits`` z-buckets a 2-D rectangle ``[x0..x1]×[y0..y1]``
    (inclusive) can touch. A bucket is the interleave of each
    dimension's top ``bucket_bits/2`` bits, so the rectangle maps to
    the cross product of the block ranges it overlaps — O(blocks)
    driver arithmetic, no data touched. This is what turns a 2-D
    predicate into a directory/file prune list over a z-laid-out
    table."""
    if bucket_bits % 2 != 0:
        raise ValueError("zorder_buckets_for_box: bucket_bits must be even")
    half = bucket_bits // 2
    shift = bits - half
    out = []
    for xb in range(x0 >> shift, (x1 >> shift) + 1):
        for yb in range(y0 >> shift, (y1 >> shift) + 1):
            z = 0
            for i in range(half):
                z |= ((xb >> i) & 1) << (2 * i)
                z |= ((yb >> i) & 1) << (2 * i + 1)
            out.append(z)
    return sorted(out)


def global_row_index(
    df: DataFrame,
    order_exprs: list[Column],
    n_partitions: int,
    idx_col: str = "global_idx",
) -> DataFrame:
    """Total-order row numbering WITHOUT a global single-partition
    window — the classic two-pass pattern (``zipWithIndex`` re-expressed
    over DataFrames):

    1. ``repartitionByRange`` on the order expressions (sampled split
       points — one range exchange) + ``sortWithinPartitions`` → rows
       are globally ordered ACROSS partitions and locally ordered
       WITHIN each; the layout is eagerly local-checkpointed
       (:func:`_range_layout`) so both passes below provably see the
       same immutable partitions, and the blocks are freed with the
       result plan instead of outliving it.
    2. Pass 1: per-partition row counts — a map-side count whose result
       is ``n_partitions`` rows, collected and prefix-summed on the
       driver (bounded by construction: one long per partition).
    3. Pass 2: one Arrow ``mapInPandas`` over the same partitions adds
       ``offset[pid] + local_position`` — no second data shuffle.

    A bare ``row_number() OVER (ORDER BY …)`` funnels 100 TB through ONE
    task; this does one range exchange + a metadata collect, and every
    partition numbers itself in parallel. Caller contract: the order
    expressions must form a total order (include a unique tiebreak
    column) or the assignment between equal rows is partition-dependent.

    The oracle replays it as the single global window — same integers,
    opposite physical plan.
    """
    part = _range_layout(df, order_exprs, n_partitions, "global_row_index")
    # Bounded driver collect: exactly one (pid, count) row per partition.
    counts = {
        r["_pid"]: r["cnt"]
        for r in part.groupBy("_pid").agg(F.count("*").alias("cnt")).collect()
    }
    offsets: dict[int, int] = {}
    running = 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]

    # Fresh StructType — DataFrame.schema is cached on the handle and
    # StructType.add mutates in place, which would corrupt ``part``'s
    # resolved schema.
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(part.schema.fields) + [StructField(idx_col, LongType())]
    )

    def _number(batches):
        local = None
        base = 0
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{idx_col: pdf.index.astype("int64")})
                continue
            if local is None:
                base = offsets.get(int(pdf["_pid"].iloc[0]), 0)
                local = 0
            pdf = pdf.copy()
            pdf[idx_col] = range(base + local, base + local + len(pdf))
            local += len(pdf)
            yield pdf

    return part.mapInPandas(_number, schema=out_schema).drop("_pid")


def global_prefix_sum(
    df: DataFrame,
    order_exprs: list[Column],
    weight_col: str,
    n_partitions: int,
    out_col: str = "offset",
) -> DataFrame:
    """EXCLUSIVE prefix sum of ``weight_col`` over the global
    ``order_exprs`` order without a single-partition window — the
    weighted generalization of :func:`global_row_index` (same two-pass
    shape: one range exchange, a one-long-per-partition driver collect
    of per-partition weight SUMS, then each partition accumulates
    itself from its broadcast base in one Arrow pass).

    This is the primitive behind GLOBAL sequence packing: with
    ``weight_col`` = token counts, ``out_col`` is every document's
    first-token offset in the corpus-wide concatenated stream, and
    ``offset div budget`` is its training-sequence id — no shard key
    needed (``corpus.sequence_packing`` packs within shards precisely
    to avoid the global window; this removes that constraint). A bare
    ``sum() OVER (ORDER BY …)`` funnels 100 TB through ONE task.

    Exactness contract: integer weights (the sums are exact longs;
    NULL weights count as 0). Caller contract: ``order_exprs`` must be
    a total order (unique tiebreak), or the split between equal rows
    is partition-dependent.
    """
    part = _range_layout(df, order_exprs, n_partitions, "global_prefix_sum")
    # Bounded driver collect: one (pid, sum) long per partition.
    sums = {
        r["_pid"]: int(r["s"] or 0)
        for r in part.groupBy("_pid")
        .agg(F.sum(F.col(weight_col).cast("long")).alias("s"))
        .collect()
    }
    offsets: dict[int, int] = {}
    running = 0
    for pid in sorted(sums):
        offsets[pid] = running
        running += sums[pid]

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(part.schema.fields) + [StructField(out_col, LongType())]
    )

    def _accumulate(batches):
        base = None
        run = 0
        for pdf in batches:
            if len(pdf) == 0:
                yield pdf.assign(**{out_col: pdf.index.astype("int64")})
                continue
            if base is None:
                base = offsets.get(int(pdf["_pid"].iloc[0]), 0)
            pdf = pdf.copy()
            wv = pdf[weight_col].fillna(0).astype("int64")
            cs = wv.cumsum()
            pdf[out_col] = base + run + cs - wv  # exclusive of self
            run += int(wv.sum())
            yield pdf

    return part.mapInPandas(_accumulate, schema=out_schema).drop("_pid")


def compaction_bins(
    parts: DataFrame,
    order_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Small-files compaction plan: assign ordered parts (files,
    hour-partitions, …) to sequential output bins of ~``target_bytes``
    each — ``bin = floor(running_size_before / target)``, the
    sequential fill every compaction job runs. Adds a ``bin`` column.

    Deterministic by construction (the order column pins the fill
    order), so two engines produce the identical plan. The input is
    METADATA — one row per file/partition, ~10⁶ rows for a 100 TB
    table — which is why the single global-order window here is fine:
    it's the table of contents, not the data. Never point this at the
    corpus itself.
    """
    if target_bytes <= 0:
        raise ValueError("compaction_bins: target_bytes must be positive")
    w = (
        Window.orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return parts.withColumn(
        "bin", F.floor(before / F.lit(target_bytes)).cast("long")
    )


def systematic_sample(
    df: DataFrame,
    order_exprs: list[Column],
    weight_col: str,
    k: int,
    n_partitions: int,
    offset_col: str = "offset",
    picks_col: str = "n_picks",
) -> DataFrame:
    """Weight-proportional SYSTEMATIC sampling — the deterministic,
    integer-exact alternative to Efraimidis–Spirtes key sampling
    (whose ``u^(1/w)`` needs libm and a RNG): lay every row's weight
    end-to-end on the global line via :func:`global_prefix_sum`, then
    select the rows whose interval ``(offset, offset + w]`` contains a
    multiple of ``step = total div k``. Selection probability is
    exactly proportional to weight (a row of weight ``w`` owns ``w``
    points of the line and is hit by ``~w/step`` of the ``k`` evenly
    spaced probes); heavy rows can be hit multiple times —
    ``picks_col`` carries the exact multiplicity, so downstream
    token-budget mixtures can honor it.

    Engine-portable by construction: all arithmetic is BIGINT and
    every quantity is non-negative, so Spark's truncating ``div`` and
    DuckDB's flooring ``//`` agree. The only non-map stages are the
    prefix sum's range exchange and a broadcast 1-row total.

    Output: input columns + ``offset_col`` (exclusive prefix sum) +
    ``picks_col`` >= 1, filtered to selected rows (~k of them).
    """
    if k <= 0:
        raise ValueError("systematic_sample: k must be positive")
    pref = global_prefix_sum(
        df, order_exprs, weight_col, n_partitions, out_col=offset_col
    )
    total = df.agg(
        F.sum(F.col(weight_col).cast("long")).alias("_total")
    ).select(
        F.greatest(F.expr(f"_total div {k}"), F.lit(1).cast("long")).alias(
            "_step"
        )
    )
    out = (
        pref.crossJoin(F.broadcast(total))
        .withColumn(
            picks_col,
            F.expr(
                f"(({offset_col} + CAST(coalesce({weight_col}, 0) AS BIGINT))"
                f" div _step) - ({offset_col} div _step)"
            ),
        )
        .where(F.col(picks_col) >= 1)
        .drop("_step")
    )
    return out


def global_prefix_max(
    df: DataFrame,
    order_exprs: list[Column],
    value_col: str,
    n_partitions: int,
    out_col: str = "prefix_max",
) -> DataFrame:
    """EXCLUSIVE prefix MAX of ``value_col`` over the global
    ``order_exprs`` order without a single-partition window — the max
    sibling of :func:`global_prefix_sum` (same two-pass shape: one
    range exchange, a one-long-per-partition driver collect of
    per-partition maxima prefix-combined on the driver, then each
    partition folds itself from its broadcast base in one Arrow pass).
    The first row in the global order gets NULL (no predecessor).

    This is the primitive behind the 2-D skyline: ordered by x DESC
    with ``value_col`` = y, a row's prefix max is the best y among all
    strictly-better-x rows — ``y > prefix_max`` IS the Pareto test. A
    bare ``max() OVER (ORDER BY …)`` funnels everything through ONE
    task; this scales with partitions.

    Exactness contract: integer values (exact longs; NULLs must be
    filtered by the caller). Caller contract: ``order_exprs`` must
    totally order rows ACROSS distinct values of the ordering key (ties
    within one key land in one partition run and see the same prefix,
    which is what grain-reduced callers want).
    """
    import pandas as pd

    part = _range_layout(df, order_exprs, n_partitions, "global_prefix_max")
    # Bounded driver collect: one (pid, max) long per partition.
    maxes = {
        r["_pid"]: r["m"]
        for r in part.groupBy("_pid")
        .agg(F.max(F.col(value_col).cast("long")).alias("m"))
        .collect()
    }
    prefix: dict[int, int | None] = {}
    running: int | None = None
    for pid in sorted(maxes):
        prefix[pid] = running
        m = maxes[pid]
        if m is not None:
            running = m if running is None else max(running, m)

    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(part.schema.fields) + [StructField(out_col, LongType())]
    )

    def _fold(batches):
        carry: int | None = None
        first = True
        for pdf in batches:
            if len(pdf) == 0:
                pdf = pdf.copy()
                pdf[out_col] = pd.array([], dtype="Int64")
                yield pdf
                continue
            if first:
                carry = prefix.get(int(pdf["_pid"].iloc[0]))
                first = False
            vv = pdf[value_col].astype("int64")
            # Nullable Int64 end-to-end (ADVICE r9): a float64 shift
            # placeholder would round |v| > 2^53 and quietly break the
            # documented exact-longs contract; <NA> marks the first row.
            within = vv.cummax().astype("Int64").shift(1)
            if carry is not None:
                keep = (within >= carry).fillna(False)
                within = within.where(keep, carry)
            pdf = pdf.copy()
            pdf[out_col] = within.astype("Int64")
            m = int(vv.max())
            carry = m if carry is None else max(carry, m)
            yield pdf

    return part.mapInPandas(_fold, schema=out_schema).drop("_pid")
