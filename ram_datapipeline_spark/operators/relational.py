"""Relational operator compositions (SURVEY §2.2-2.6).

The reference implements these as knex/SQL calls plus imperative JS row
munging; here each is a reusable DataFrame combinator. Notable semantics:

- ``pivot_eav``: the dynamic indicator pivot (ram-analysis/app/index.js:
  233-246 — `hold[o.key] = o.value`): EAV rows become per-key columns at
  runtime. Spark's ``groupBy().pivot()`` is the native analog; pass explicit
  key values when known to skip the extra distinct-collect job.
- ``unpivot``: the inverse (index.js:111-118 — per-origin poi map exploded
  into `results_poi` rows) via ``stack``.
- ``latest_per_key``: newest-row-per-group (operation.js:45-59) as a
  window + row_number, with an explicit total tie-break so results are
  deterministic under shuffles.
- ``exact_money_sum``: SUM over doubles is order-dependent in the last ulp;
  for bit-reproducible aggregates we sum fixed-point cents (exact integer
  arithmetic) and divide once at the end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def cents(col: Column) -> Column:
    """Fixed-point representation: round-half-up to integer cents (exact)."""
    return F.floor(col * 100.0 + 0.5).cast("long")


def exact_money_sum(col: Column) -> Column:
    """Order-independent SUM for 2-decimal money doubles."""
    return F.sum(cents(col)).cast("double") / 100.0


def pivot_eav(
    df: DataFrame,
    group_keys: list[str],
    key_col: str,
    value_agg: Column,
    key_values: list[str] | None = None,
) -> DataFrame:
    """EAV → wide pivot (SURVEY A2). ``value_agg`` is the aggregate applied
    per (group, key) cell."""
    g = df.groupBy(*group_keys)
    p = g.pivot(key_col, key_values) if key_values is not None else g.pivot(key_col)
    return p.agg(value_agg)


def unpivot(
    df: DataFrame,
    id_cols: list[str],
    measures: dict[str, str],
    key_name: str = "measure",
    value_name: str = "value",
) -> DataFrame:
    """Wide → long (SURVEY A3) via ``stack`` — one output row per measure."""
    pairs = ", ".join(f"'{label}', {col}" for label, col in measures.items())
    stack_expr = f"stack({len(measures)}, {pairs}) AS ({key_name}, {value_name})"
    return df.selectExpr(*id_cols, stack_expr)


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    order_desc: list[str],
) -> DataFrame:
    """Newest row per key (SURVEY W1). ``order_desc`` must end in a unique
    column so the result is deterministic (SURVEY §7 hard-point 2)."""
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_desc])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def topk_per_group(
    df: DataFrame,
    keys: list[str],
    order_desc: list[str],
    k: int,
    rank_name: str = "rk",
) -> DataFrame:
    """Top-K per group with explicit tie-break, rank retained."""
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_desc])
    return df.withColumn(rank_name, F.row_number().over(w)).filter(
        F.col(rank_name) <= k
    )


def grouped_collect_sorted(
    df: DataFrame,
    keys: list[str],
    collect_col: str,
    out_name: str = "items",
) -> DataFrame:
    """Group-to-nested (SURVEY A4, index.js:550-558) in a deterministic,
    engine-portable form: the collected list is sorted and serialized to a
    comma-joined string (collect_list order under shuffles is otherwise
    nondeterministic)."""
    return df.groupBy(*keys).agg(
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list(F.col(collect_col))),
                lambda x: x.cast("string"),
            ),
        ).alias(out_name),
        F.count(F.lit(1)).alias("n"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
    include_unchanged: bool = False,
) -> DataFrame:
    """Table-version diff (incremental-pipeline staple): classify every
    key as added / removed / changed / unchanged between two snapshots.

    Emits the key columns, ``status``, and ``old_<c>`` / ``new_<c>`` for
    each compared column. Comparison is null-safe (``<=>``); by default
    unchanged rows are filtered out — at 100 TB the diff output is
    change-sized, not table-sized, and the filter happens before any
    downstream consumer. One co-partitioned full outer join on the key
    (both sides shuffle once on the same key — bucketing both snapshots
    on the key makes it exchange-free)."""
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in key_cols],
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in key_cols],
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
    )
    cond = [o[f"_ok_{k}"] == n[f"_nk_{k}"] for k in key_cols]
    j = o.join(n, cond, "full_outer")
    any_diff = F.lit(False)
    for c in compare_cols:
        any_diff = any_diff | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    status = (
        F.when(F.col(f"_ok_{key_cols[0]}").isNull(), F.lit("added"))
        .when(F.col(f"_nk_{key_cols[0]}").isNull(), F.lit("removed"))
        .when(any_diff, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *[
            F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
            for k in key_cols
        ],
        status.alias("status"),
        *[F.col(f"old_{c}") for c in compare_cols],
        *[F.col(f"new_{c}") for c in compare_cols],
    )
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out


def pareto_front_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    n_partitions: int = 8,
) -> DataFrame:
    """2-D skyline (Pareto front, both criteria maximized): keep every
    row no other row dominates, where q dominates p iff q.x ≥ p.x and
    q.y ≥ p.y with at least one strict — the preference-query classic
    (Börzsönyi et al., ICDE'01) behind multi-criteria data selection
    (quality × recency document picks, spend × frequency customer
    tiers).

    Scale shape — NOT the naive O(n²) self-join: reduce to the x grain
    (one map-side-combined aggregate: gy = max y per distinct x), take
    the EXCLUSIVE prefix max of gy over x DESC via the range-exchange
    two-pass fold (``layout.global_prefix_max`` — no single-partition
    window), and a group survives iff ``gy > prefix_max`` (anything
    with a strictly-better x already reaches ≥ gy ⟹ dominated; ties
    at the same x lose to the group max unless they ARE it). Front
    rows join back on x with ``y == gy``. Total: one agg exchange, one
    range exchange + Arrow fold on the x-GRAIN table, one equi-join.

    Exactness: x and y must be integer-valued (cast to long); rows
    with NULL in either are dropped (dominance is undefined on NULL).
    Equal (x, y) duplicates are all kept — neither strictly dominates
    the other. The oracle replays the NOT EXISTS definition — an
    independent algorithm.
    """
    from ram_datapipeline_spark.operators.layout import global_prefix_max

    base = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    g = base.groupBy(F.col(x_col).cast("long").alias(x_col)).agg(
        F.max(F.col(y_col).cast("long")).alias("_gy")
    )
    pm = global_prefix_max(
        g, [F.col(x_col).desc()], "_gy", n_partitions, out_col="_pm"
    )
    front_x = pm.where(
        F.col("_pm").isNull() | (F.col("_gy") > F.col("_pm"))
    ).select(x_col, "_gy")
    return (
        base.withColumn(x_col, F.col(x_col).cast("long"))
        .withColumn(y_col, F.col(y_col).cast("long"))
        .join(front_x, x_col)
        .where(F.col(y_col) == F.col("_gy"))
        .drop("_gy")
    )
