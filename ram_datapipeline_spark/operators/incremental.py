"""Incremental aggregate maintenance (beyond-reference north star).

The 100 TB pattern: a standing rollup (daily revenue by key, say) must
absorb a new partition of rows WITHOUT rescanning history. The algebra
that allows it is decomposability: count, sum, min and max are all
mergeable from PARTIAL states — ``count = Σ counts``, ``sum = Σ sums``,
``min = min(mins)``, ``max = max(maxs)`` — and every average or ratio
is derived at read time from stored sum/count pairs (never stored
itself, since averages don't merge). So the stored state is a partial-
aggregate table keyed by the group columns, and maintenance is:
aggregate ONLY the delta rows, then merge two group-sized tables.

At scale the merge input is two aggregate tables (group-cardinality
sized — typically millions of times smaller than the fact table), so
the merge shuffles kilobytes; the only corpus-sized work is the scan of
the new partition, which arrives pre-pruned by its partition predicate.

Exactness: sums are carried in integer cents (``floor(x*100+0.5)``
bigints — associative, order-independent), so base+delta merges
bit-match a full recompute in any engine; float sums would not (their
rounding depends on add order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# spec kinds -> (state builder, state merger). The state of an 'avg'
# IS a (sum_cents, count) pair; 'avg' itself is derived in finalize.
_KINDS = ("count", "sum_cents", "min", "max")


def _cents(col: Column) -> Column:
    return F.floor(col * F.lit(100.0) + F.lit(0.5)).cast("long")


def partial_aggregate(
    df: DataFrame, keys: list[str], specs: dict[str, tuple]
) -> DataFrame:
    """Aggregate ``df`` into the mergeable partial state.

    ``specs`` maps output column -> ('count',) | ('sum_cents', col) |
    ('min', col) | ('max', col). The result is one row per key with
    exactly those state columns — the table a pipeline stores.
    """
    aggs = []
    for out, spec in specs.items():
        kind = spec[0]
        if kind == "count":
            aggs.append(F.count(F.lit(1)).alias(out))
        elif kind == "sum_cents":
            aggs.append(F.sum(_cents(F.col(spec[1]))).alias(out))
        elif kind == "min":
            aggs.append(F.min(spec[1]).alias(out))
        elif kind == "max":
            aggs.append(F.max(spec[1]).alias(out))
        else:
            raise ValueError(f"partial_aggregate: unknown kind {kind!r}")
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(
    base: DataFrame, delta: DataFrame, keys: list[str], specs: dict[str, tuple]
) -> DataFrame:
    """Merge two partial-state tables into one — the maintenance step.

    Union + one groupBy over GROUP-SIZED inputs: counts and cent-sums
    re-sum, mins re-min, maxes re-max. Keys present in only one side
    pass through unchanged (a brand-new group in the delta needs no
    base row; union-groupBy gives that for free, where a join would
    need null-handling per column).
    """
    merged = base.unionByName(delta)
    aggs = []
    for out, spec in specs.items():
        kind = spec[0]
        if kind in ("count", "sum_cents"):
            aggs.append(F.sum(out).alias(out))
        elif kind == "min":
            aggs.append(F.min(out).alias(out))
        elif kind == "max":
            aggs.append(F.max(out).alias(out))
        else:
            raise ValueError(f"merge_partials: unknown kind {kind!r}")
    return merged.groupBy(*keys).agg(*aggs)


def finalize(df: DataFrame, derived: dict[str, Column]) -> DataFrame:
    """Attach read-time derived columns (money doubles from cent
    states, averages from sum/count pairs). Kept separate so the STORED
    table stays purely mergeable state."""
    out = df
    for name, col in derived.items():
        out = out.withColumn(name, col)
    return out
