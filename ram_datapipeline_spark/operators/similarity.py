"""Similarity search over embedding columns (beyond-reference).

Brute-force cosine is the exactness baseline: pairwise dot products via
``zip_with`` + ``aggregate`` (a strict left fold — deterministic summation
order, so results are engine-reproducible bit-for-bit). The scale path is
LSH bucketing (random-hyperplane signs) which turns top-k into bucket-local
joins.

At 100 TB the brute-force path is only for small query sets (queries side
broadcast, one pass over the corpus, per-partition top-k via window);
the LSH path bounds work per query by bucket size. Norms are precomputed
once per side, never inside the pair loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ram_datapipeline_spark.session import ensure_parallelism


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    """Strict left-fold dot product: 0.0 + x1 + x2 + ... (exact order)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Precompute the double-cast vector + its L2 norm once per row."""
    e = _to_double(F.col(vec_col))
    return df.withColumn("_e", e).withColumn("_nrm", _norm(F.col("_e")))


def cosine_pairs(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.4,
) -> DataFrame:
    """All pairs with cosine ≥ threshold: (vec_a, vec_b, cos). Exact
    brute force — quadratic; the correctness baseline for ANN variants."""
    v = with_norm(ensure_parallelism(df), vec_col).select(F.col(id_col), "_e", "_nrm")
    a = v.select(F.col(id_col).alias("vec_a"), F.col("_e").alias("_ea"), F.col("_nrm").alias("_na"))
    b = v.select(F.col(id_col).alias("vec_b"), F.col("_e").alias("_eb"), F.col("_nrm").alias("_nb"))
    cos = _dot(F.col("_ea"), F.col("_eb")) / (F.col("_na") * F.col("_nb"))
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b", "cos")
    )


def cosine_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query vector: (query_id, neighbor_id, cos,
    rk). Queries are broadcast (small side); ranking tie-breaks on
    neighbor id for determinism."""
    q = with_norm(queries, vec_col).select(
        F.col(id_col).alias("query_id"), F.col("_e").alias("_eq"), F.col("_nrm").alias("_nq")
    )
    c = with_norm(ensure_parallelism(corpus), vec_col).select(
        F.col(id_col).alias("neighbor_id"), F.col("_e").alias("_ec"), F.col("_nrm").alias("_nc")
    )
    cos = _dot(F.col("_eq"), F.col("_ec")) / (F.col("_nq") * F.col("_nc"))
    pairs = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cos)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def assign_ivf_cells(
    vectors: DataFrame, seeds: DataFrame, n_probe: int = 1,
    id_col: str = "vec_id",
) -> DataFrame:
    """Assign each (already norm-annotated) vector to its ``n_probe``
    nearest seed cells by cosine: (id, cell, cell_rk). Seeds are broadcast
    (n_cells is small by construction); ties break on seed id."""
    s = seeds.select(
        F.col(id_col).alias("cell"),
        F.col("_e").alias("_es"),
        F.col("_nrm").alias("_ns"),
    )
    cos = _dot(F.col("_e"), F.col("_es")) / (F.col("_nrm") * F.col("_ns"))
    w = Window.partitionBy(id_col).orderBy(F.desc("_cell_cos"), F.asc("cell"))
    return (
        vectors.crossJoin(F.broadcast(s))
        .withColumn("_cell_cos", cos)
        .withColumn("cell_rk", F.row_number().over(w))
        .filter(F.col("cell_rk") <= n_probe)
        .drop("_es", "_ns", "_cell_cos")
    )


def cosine_topk_ivf(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_cells: int = 8, n_probe: int = 2,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) partitioning: corpus
    vectors live in their single nearest cell, queries probe their
    ``n_probe`` nearest cells, exact cosine ranks within the probed cells.

    Seeds are the first ``n_cells`` corpus vectors by id — deterministic
    (no RNG, no trained centroids), so the whole index is reproducible in
    ANSI SQL. At scale the corpus assignment is one broadcast pass +
    shuffle on cell; per-query cost is the probed cells' sizes. Recall
    rises with n_probe — the standard IVF dial."""
    c = with_norm(ensure_parallelism(corpus), vec_col)
    q = with_norm(queries, vec_col)
    seeds = c.filter(F.col(id_col) < n_cells)
    c_cells = assign_ivf_cells(c, seeds, 1, id_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_e").alias("_ec"),
        F.col("_nrm").alias("_nc"),
        "cell",
    )
    q_cells = assign_ivf_cells(q, seeds, n_probe, id_col).select(
        F.col(id_col).alias("query_id"),
        F.col("_e").alias("_eq"),
        F.col("_nrm").alias("_nq"),
        "cell",
    )
    cos = _dot(F.col("_eq"), F.col("_ec")) / (F.col("_nq") * F.col("_nc"))
    pairs = (
        c_cells.join(F.broadcast(q_cells), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cos)
        # a corpus vector can appear via several probed cells of one query
        .select("query_id", "neighbor_id", "cos")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def lsh_bucket_signature(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane LSH signature: sign pattern of ``n_planes`` fixed
    pseudo-random hyperplanes. Plane weights are deterministic ±1 derived
    from (plane, dim-index) parity of md5 — no RNG, reproducible anywhere."""
    bits = []
    for p in range(n_planes):
        # deterministic ±1 weight per (plane, index): parity of a cheap mix
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda x, i: F.when(((i * 2654435761 + p * 40503) % 2) == 0, x).otherwise(-x),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, "1").otherwise("0"))
    return F.concat(*bits)


def cosine_topk_lsh(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding", n_planes: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket,
    then exact cosine rank within the bucket. The scale path: the join is
    bucket-local (equi-join on the signature), so per-query work is bucket
    size, not corpus size. Recall is tunable via n_planes / multi-probe."""
    q = with_norm(queries, vec_col)
    c = with_norm(ensure_parallelism(corpus), vec_col)
    q = q.withColumn("_sig", lsh_bucket_signature(F.col("_e"), n_planes)).select(
        F.col(id_col).alias("query_id"), F.col("_e").alias("_eq"),
        F.col("_nrm").alias("_nq"), "_sig",
    )
    c = c.withColumn("_sig", lsh_bucket_signature(F.col("_e"), n_planes)).select(
        F.col(id_col).alias("neighbor_id"), F.col("_e").alias("_ec"),
        F.col("_nrm").alias("_nc"), "_sig",
    )
    cos = _dot(F.col("_eq"), F.col("_ec")) / (F.col("_nq") * F.col("_nc"))
    pairs = (
        c.join(F.broadcast(q), "_sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cos)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )
