"""The multimodal ingest job as ONE composable DataFrame DAG — the media
counterpart to ``corpus_pipeline.run_corpus_pipeline``.

Stages (each independently oracle-checked in the suite; this module adds
only the end-to-end composition):

1. catalog        — synthesize the (payload, typed-meta) media catalog
2. modality split — images/audio routed by the pruned ``kind`` column
                    (metadata filter, payload pages untouched at the scan)
3. real codecs    — images: PNG encode → nearest-neighbor thumbnail →
                    decode stats (three Arrow stages, thumbnail-sized
                    bytes only after stage one) plus a baseline JPEG
                    encode → decode leg; audio: RIFF/WAVE encode →
                    REAL parse → exact integer PCM stats
4. features       — byte-level payload embedding (long format, strided
                    fold — the encoder stand-in)
5. near-dedup     — embedding-cosine survivors over the feature vectors
6. sinks          — hive-partitioned parquet by modality + an
                    OperationLog lifecycle row per stage

Scale shape: one documents scan feeds everything; the modality split is
a column predicate (no shuffle); every codec boundary is an Arrow batch;
the only exchanges are the embedding spread (round-robin on a small
input) and the dedup pair join — both owned by the individual operators.
The payload never reaches the driver.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ram_datapipeline_spark.catalog import load_tables
from ram_datapipeline_spark.multimodal import (
    decode_jpeg_stats,
    decode_png_stats,
    encode_flat_jpeg_media,
    decode_wav_stats,
    encode_gray8_png_media,
    encode_pcm8_wav,
    payload_embedding,
    resize_png_images,
    synthesize_media,
)
from ram_datapipeline_spark.operators.similarity import cosine_pairs
from ram_datapipeline_spark.session import ensure_parallelism
from ram_datapipeline_spark.sinks import write_partitioned
from ram_datapipeline_spark.streaming import OperationLog


def media_features(documents: DataFrame, dim: int = 16) -> DataFrame:
    """Catalog + per-payload feature vector: (media_id, kind, embedding).

    The embedding is the byte-level encoder stand-in; at 100 TB the same
    shape holds with a real encoder behind the fold (the payload column
    and the Arrow boundary are unchanged)."""
    media = ensure_parallelism(synthesize_media(documents))
    emb = payload_embedding(media.select("media_id", "payload"), dim=dim)
    return media.select("media_id", "kind").join(emb, "media_id")


def media_near_dedup(
    features: DataFrame, threshold: float = 0.999
) -> DataFrame:
    """Embedding-cosine near-dup survivors over the feature vectors:
    drop any media whose embedding has cosine ≥ threshold against a
    lower-id row (the greedy survivor policy of
    ``dedup_embedding_cosine``). The candidate pass here is the fenced
    pairwise kernel — swap in the LSH/IVF bucketing for corpus-scale
    media lakes."""
    vecs = features.select(
        F.col("media_id").alias("vec_id"),
        F.col("embedding").cast("array<float>").alias("embedding"),
    )
    pairs = cosine_pairs(vecs, threshold=threshold)
    return features.join(
        pairs.select(F.col("vec_b").alias("media_id")).distinct(),
        "media_id",
        "left_anti",
    )


def run_media_pipeline(
    spark: SparkSession, sf_dir: str, out_dir: str, dim: int = 16
) -> dict:
    """Execute the full media ingest: real codec round trips per
    modality, features, near-dedup, partitioned sinks, operation log.
    Returns the per-stage row counts (metadata-sized)."""
    log = OperationLog(spark, os.path.join(out_dir, "oplog"))
    op = log.start("media-pipeline", project_id=1, scenario_id=1)

    t = load_tables(spark, sf_dir)
    docs = t["documents"]

    # real codec paths (image + audio twins)
    png = encode_gray8_png_media(ensure_parallelism(docs), width=16)
    thumbs = resize_png_images(png, out_w=8, out_h=8)
    img_stats = decode_png_stats(thumbs)
    wav = encode_pcm8_wav(ensure_parallelism(docs))
    wav_stats = decode_wav_stats(wav)
    jpg_stats = decode_jpeg_stats(
        encode_flat_jpeg_media(ensure_parallelism(docs))
    )

    feats = media_features(docs, dim=dim)
    kept = media_near_dedup(feats)

    write_partitioned(
        kept.select("media_id", "kind", "embedding"),
        os.path.join(out_dir, "media_features"),
        partition_cols=["kind"],
    )
    img_stats.write.mode("overwrite").parquet(
        os.path.join(out_dir, "image_stats")
    )
    wav_stats.write.mode("overwrite").parquet(
        os.path.join(out_dir, "audio_stats")
    )
    jpg_stats.write.mode("overwrite").parquet(
        os.path.join(out_dir, "jpeg_stats")
    )

    counts = {
        "catalog": docs.count(),
        "image_stats": img_stats.count(),
        "audio_stats": wav_stats.count(),
        "jpeg_stats": jpg_stats.count(),
        "features": feats.count(),
        "kept_after_dedup": kept.count(),
    }
    log.log(op, "write", {"counts": str(counts)})
    log.finish(op)
    return counts
