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


BLOOM_M_BITS = 1 << 18  # 256 Kbit = 4096 int64 words = 32 KiB bitmap


def build_bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    n_hashes: int = 2,
    hash_type: str | None = None,
) -> list[int]:
    """Distributed Bloom-filter build: every key sets ``n_hashes`` bit
    positions (xxhash64 salted by hash index, pmod to the bitmap), the
    positions aggregate to int64 words via bit_or, and the DRIVER
    collects at most ``m_bits / 64`` (word, bits) rows — a FIXED-size
    transfer (32 KiB at the default) regardless of build-side
    cardinality. All integer arithmetic; fully deterministic.

    ``hash_type``: cast keys to this type before hashing. xxhash64
    hashes the PHYSICAL representation — int32 and int64 of the same
    value hash differently — so probe and build MUST hash one agreed
    type (bloom_prefilter_join resolves it)."""
    if m_bits % 64:
        raise ValueError(f"m_bits must be a multiple of 64; got {m_bits}")
    n_words = m_bits // 64
    key = F.col(key_col)
    if hash_type is not None:
        key = key.cast(hash_type)
    positions = [
        F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m_bits))
        for i in range(n_hashes)
    ]
    words = (
        keys.select(F.explode(F.array(*positions)).alias("p"))
        .select(
            F.expr("p DIV 64").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT))"
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("word"))
        .collect()  # bounded: ≤ n_words rows by construction
    )
    bitmap = [0] * n_words
    for r in words:
        bitmap[r["w"]] = r["word"]
    return bitmap


def bloom_prefilter_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    m_bits: int = BLOOM_M_BITS,
    n_hashes: int = 2,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with an explicit Bloom prune of the probe side —
    result-identical to ``probe.join(build, on, how)`` because a Bloom
    filter has false POSITIVES only (survivors the join then drops),
    never false negatives.

    This is the scale pattern for a build side that is too big to
    broadcast as ROWS but whose key MEMBERSHIP fits a fixed 32 KiB
    bitmap: the probe side (the 100 TB fact) is pruned before the
    shuffle, so the exchange carries only probable matches. Spark's AQE
    injects a runtime Bloom in some plans
    (``spark.sql.optimizer.runtime.bloomFilter.enabled``); this operator
    is the explicit form for when the optimizer doesn't — cross-job
    reuse, persisted filters, or non-SQL probe pipelines.

    Only ``inner`` and ``left_semi`` joins are supported: any
    probe-preserving join would lose unmatched probe rows to the
    prefilter."""
    if how not in ("inner", "leftsemi", "left_semi", "semi"):
        raise ValueError(
            f"bloom_prefilter_join supports inner/semi joins; got {how!r}:"
            " the Bloom prune drops probe rows that an outer join must keep"
        )
    # xxhash64 hashes the PHYSICAL type — int32(7) and int64(7) hash
    # differently even though the plain join would coerce and match
    # them. Resolve ONE hash type both sides cast to, or refuse.
    int_types = ("tinyint", "smallint", "int", "bigint")
    probe_t, build_t = dict(probe.dtypes)[on], dict(build.dtypes)[on]
    if probe_t == build_t:
        hash_type = probe_t
    elif probe_t in int_types and build_t in int_types:
        hash_type = "bigint"
    else:
        raise ValueError(
            f"bloom_prefilter_join key dtypes differ ({probe_t!r} vs"
            f" {build_t!r}) and are not both integral: xxhash64 would"
            " hash them differently and silently drop matches — cast"
            " one side first"
        )
    tmp_cols = ["_bloom", *(f"_p{i}" for i in range(n_hashes))]
    clash = [c for c in tmp_cols if c in probe.columns]
    if clash:
        raise ValueError(
            f"bloom_prefilter_join needs scratch columns {clash} but the"
            " probe already has them — rename before calling (the plain"
            " join would have preserved them; silently clobbering is"
            " worse than refusing)"
        )
    # no distinct() on the build keys: bit_or is idempotent, so duplicate
    # keys set the same bits — skipping the dedup saves an exchange
    bitmap = build_bloom_bitmap(
        build.select(on), on, m_bits, n_hashes, hash_type=hash_type
    )
    out = probe.withColumn("_bloom", F.lit(bitmap))
    cond = F.lit(True)
    for i in range(n_hashes):
        out = out.withColumn(
            f"_p{i}",
            F.pmod(
                F.xxhash64(F.col(on).cast(hash_type), F.lit(i)),
                F.lit(m_bits),
            ),
        )
        cond = cond & F.expr(
            f"(element_at(_bloom, CAST(_p{i} DIV 64 AS INT) + 1)"
            f" & shiftleft(CAST(1 AS BIGINT), CAST(pmod(_p{i}, 64) AS INT)))"
            " != 0"
        )
    pruned = out.where(cond).drop(*tmp_cols)
    return pruned.join(build, on, how)


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
