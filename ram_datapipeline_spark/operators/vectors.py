"""Embedding-column vector operators (beyond-reference, BASELINE.json
north star): L2 normalization, scalar int8 quantization, and per-label
centroids — the storage/serving side of an embedding pipeline (ANN search
lives in operators/similarity.py).

Exactness rules: per-vector folds are strict left folds (deterministic
order), sqrt / + / − / × / ÷ are correctly-rounded IEEE ops identical in
every engine, and everything cross-row is integer (quantized) arithmetic —
so all three operators are bit-reproducible and DuckDB-oracle-checkable.

Scale shapes: normalization and quantization are zero-shuffle maps
(whole-stage codegen, arrays never leave the JVM row). Centroids shuffle
once on (label, component) with map-side partial aggregation; the result
is (labels × dim) rows — model-sized, not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def l2_norm(vec: Column) -> Column:
    """sqrt of a strict left-fold sum of squares (element order is the
    array order — deterministic)."""
    d = _to_double(vec)
    return F.sqrt(
        F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def normalize(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "unit"
) -> DataFrame:
    """Unit-normalize vectors; zero vectors map to NULL (not NaN spray).

    Pure projection — no shuffle, no Python; downstream cosine becomes a
    plain dot product."""
    nrm = l2_norm(F.col(vec_col))
    unit = F.when(
        nrm > 0.0,
        F.transform(_to_double(F.col(vec_col)), lambda x: x / nrm),
    )
    return df.withColumn("nrm", nrm).withColumn(out_col, unit)


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q"
) -> DataFrame:
    """Per-vector scalar quantization to [0, 255]:
    ``floor((x − min) * 255 / (max − min))``, top value clamped to 255.

    Emits the codes plus the (scale_min, scale_max) needed to dequantize.
    Constant vectors (max == min) quantize to all-zeros. 4× smaller than
    float32 at ~1% recall cost for cosine — the standard serving trade.
    Zero shuffles; exact integer output (the float division is identical
    IEEE in every engine, floor removes the representation question)."""
    d = _to_double(F.col(vec_col))
    mn = F.array_min(d)
    mx = F.array_max(d)
    code = F.when(
        mx > mn,
        F.transform(
            d,
            lambda x: F.least(
                F.floor((x - mn) * F.lit(255.0) / (mx - mn)).cast("long"),
                F.lit(255).cast("long"),
            ),
        ),
    ).otherwise(F.transform(d, lambda _: F.lit(0).cast("long")))
    return (
        df.withColumn("scale_min", mn)
        .withColumn("scale_max", mx)
        .withColumn(out_col, code)
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label component-wise centroid over int8-quantized codes:
    (label, pos, sum_q, n, mean_q).

    Quantizing FIRST makes the cross-row sum integer-exact (float sums
    are order-dependent under a shuffle; bigint sums are not) — the
    pattern for any exact distributed mean over embeddings. One shuffle
    on (label, pos) with map-side combine; output is labels × dim rows."""
    q = quantize_int8(df, vec_col=vec_col)
    exploded = q.select(
        F.col(label_col).alias("label"), F.posexplode("q").alias("pos", "code")
    )
    return exploded.groupBy("label", "pos").agg(
        F.sum("code").alias("sum_q"),
        F.count("*").alias("n"),
        (F.sum("code").cast("double") / F.count("*").cast("double")).alias("mean_q"),
    )
