"""Recall contracts for the approximate ANN paths (referenced from the
suite docstrings) and exactness spot-checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from ram_datapipeline_spark.catalog import load_tables
from ram_datapipeline_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_lsh,
)
from tests.conftest import SF_DIR


def _pairs(df):
    return {(r["query_id"], r["neighbor_id"]) for r in df.collect()}


def test_lsh_recall_vs_exact(spark):
    """LSH(8 planes) top-5 recall ≥ 0.3 vs the exact top-5 — a single
    bucket probe is the cheapest configuration; recall must still be far
    above chance (5/2000 ≈ 0.0025 per slot)."""
    e = load_tables(spark, SF_DIR)["embeddings"]
    q = e.filter(F.col("vec_id") < 20)
    exact = _pairs(cosine_topk(q, e, k=5))
    approx = _pairs(cosine_topk_lsh(q, e, k=5))
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"LSH recall {recall:.2f} too low"


def test_lsh_candidates_subset_of_exact_ranking(spark):
    """Every LSH result is a true neighbor with its exact cosine: scores
    returned by the approximate path must equal the exact pairwise cosine
    (the approximation prunes candidates, never perturbs scores)."""
    e = load_tables(spark, SF_DIR)["embeddings"]
    q = e.filter(F.col("vec_id") < 5)
    approx = cosine_topk_lsh(q, e, k=3).withColumnRenamed("cos", "cos_a")
    exact_all = cosine_topk(q, e, k=10_000).withColumnRenamed("cos", "cos_e")
    j = approx.join(exact_all, ["query_id", "neighbor_id"])
    assert j.count() == approx.count()  # every approx pair exists exactly
    assert j.filter(F.col("cos_a") != F.col("cos_e")).count() == 0


def test_ann_bucket_sizes_bounded(spark):
    """VERDICT r1 #4: index parameters must scale with the corpus and keep
    buckets balanced — max bucket/cell size < 4× the mean on the fixture
    (the round-1 fixed constants let buckets grow linearly with n)."""
    import statistics

    from ram_datapipeline_spark.operators.similarity import (
        assign_ivf_cells,
        lsh_bucket_signature,
        scaled_cell_count,
        scaled_plane_count,
        stratified_seed_ids,
        with_norm,
    )

    e = load_tables(spark, SF_DIR)["embeddings"]
    n = e.count()

    n_planes = scaled_plane_count(n)
    assert 2**n_planes >= n / 64  # bucket target tracks corpus size
    sig = lsh_bucket_signature(F.col("_e"), n_planes)
    lsh_sizes = [
        r["count"]
        for r in with_norm(e).select(sig.alias("s")).groupBy("s").count().collect()
    ]
    assert max(lsh_sizes) < 4 * statistics.mean(lsh_sizes), lsh_sizes

    n_cells = scaled_cell_count(n)
    assert n_cells * n_cells >= n  # ⌈√n⌉ cells
    c = with_norm(e)
    seeds = c.join(F.broadcast(stratified_seed_ids(e, n_cells)), "vec_id").select(
        "vec_id", "_e", "_nrm"
    )
    ivf_sizes = [
        r["count"]
        for r in assign_ivf_cells(c, seeds, 1).groupBy("cell").count().collect()
    ]
    assert len(ivf_sizes) == n_cells  # every cell non-empty on the fixture
    assert max(ivf_sizes) < 4 * statistics.mean(ivf_sizes), ivf_sizes


def test_cosine_pairs_scale_fence(spark):
    """The brute-force baseline refuses oversized corpora unless the
    fence is explicitly lifted."""
    import pytest as _pytest

    from ram_datapipeline_spark.operators.similarity import cosine_pairs

    big = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.lit(1.0), F.lit(0.0)).alias("embedding"),
    )
    with _pytest.raises(ValueError, match="O\\(n²\\)|max_rows"):
        cosine_pairs(big, max_rows=10)
    # lifted fence still works
    out = cosine_pairs(big.limit(5), max_rows=None, threshold=0.9)
    assert out.count() == 10  # all 5C2 identical unit vectors
