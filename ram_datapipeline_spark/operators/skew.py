"""Skew and co-location utilities (100 TB join discipline).

Three tools the brief-level scale plan needs beyond AQE's automatic skew
splitting (`spark.sql.adaptive.skewJoin.enabled`, on in session.py):

- **salting** for shuffle joins whose hot keys AQE cannot split (e.g. the
  build side of an aggregation, or pre-3.2 style full shuffles): spread
  each big-side row across ``n_salts`` sub-keys, replicate the small side
  once per salt, join on (key, salt). Results are identical to the plain
  join; the hot key's rows land on n_salts tasks instead of one.
- **bucketed writes** for repeated co-located joins: both sides
  pre-hash-partitioned and sorted on the join key at write time; a
  bucket-aware join then reads matching buckets pairwise with NO exchange
  on either side — the amortized answer when a key is joined every run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salt_big_side(df: DataFrame, n_salts: int, salt_col: str = "_salt") -> DataFrame:
    """Deterministic row-spread salt: derived from a row id, NOT the join
    key (same-key rows must scatter) and NOT rand() (reproducibility)."""
    return df.withColumn(
        salt_col, F.pmod(F.monotonically_increasing_id(), F.lit(n_salts)).cast("int")
    )


def replicate_small_side(
    df: DataFrame, n_salts: int, salt_col: str = "_salt"
) -> DataFrame:
    """Explode the small side once per salt value (n_salts× rows — only
    acceptable because this side is small)."""
    return df.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn(salt_col, F.col(salt_col).cast("int"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join, result-identical to ``big.join(small, on,
    how)`` for ``inner`` and ``left`` joins: join keys become (on...,
    salt). Use when one key dominates the distribution and the join must
    shuffle (small side too big to broadcast).

    Right/full joins are rejected: the small side is replicated once per
    salt, so its unmatched rows would surface ``n_salts`` times (ADVICE
    r1). Salting with outer-preserved small side needs a post-join dedup
    that this helper deliberately does not hide."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(
            f"salted_join supports how in ('inner', 'left', 'left_outer'); got {how!r}:"
            " replicated small-side rows would duplicate unmatched"
            " right/full-outer output"
        )
    b = salt_big_side(big, n_salts)
    s = replicate_small_side(small, n_salts)
    return b.join(s, [*on, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
) -> None:
    """Persist hash-bucketed + sorted by the join key at an explicit path.
    Subsequent equi-joins between tables bucketed the same way execute
    with zero Exchange on both sides (verified in tests by plan
    inspection)."""
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*bucket_cols)
        .option("path", path)
        .saveAsTable(table)
    )
