"""Multimodal plumbing tests: binary columns survive Arrow round-trips,
metadata prunes without payload access, frame sampling never copies bytes."""

from __future__ import annotations

from pyspark.sql import functions as F

from ram_datapipeline_spark.catalog import load_tables
from ram_datapipeline_spark.multimodal import (
    decode_image_stats,
    resize_images,
    sample_frames,
    synthesize_media,
)
from tests.conftest import SF_DIR


def test_media_schema(spark):
    m = synthesize_media(load_tables(spark, SF_DIR)["documents"])
    dtypes = dict(m.dtypes)
    assert dtypes["payload"] == "binary"
    assert dtypes["kind"] == "string"
    assert dtypes["meta"].startswith("struct<width:int,height:int")


def test_payload_bytes_survive_arrow(spark):
    """The binary payload crosses the Arrow/mapInPandas boundary intact:
    Python-side byte stats equal JVM-side expressions on the same column."""
    docs = load_tables(spark, SF_DIR)["documents"]
    m = synthesize_media(docs)
    got = decode_image_stats(m)
    jvm = (
        m.filter(F.col("kind") == "image")
        .select(
            "media_id",
            F.length("payload").cast("long").alias("n_bytes_jvm"),
        )
    )
    diff = got.join(jvm, "media_id").filter(
        F.col("n_bytes") != F.col("n_bytes_jvm")
    )
    assert got.count() == jvm.count() > 0
    assert diff.count() == 0


def test_metadata_only_scan_prunes_payload(spark):
    """Filtering/projecting metadata must not read payload bytes: the
    optimized plan's ReadSchema excludes the payload column."""
    docs = load_tables(spark, SF_DIR)["documents"]
    m = synthesize_media(docs)
    q = m.filter(F.col("meta.width") > 256).select("media_id", "meta.width")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in plan


def test_resize_images_plumbing(spark):
    """Resize: dimensions clamped to max_side, payload bytes shrink
    proportionally (stub), schema stable, binary survives the round trip."""
    m = synthesize_media(load_tables(spark, SF_DIR)["documents"])
    out = resize_images(m, max_side=128)
    assert dict(out.dtypes)["payload"] == "binary"
    rows = out.collect()
    assert len(rows) == m.filter(F.col("kind") == "image").count() > 0
    assert all(r["width"] <= 128 and r["width"] == r["height"] for r in rows)
    assert all(len(r["payload"]) >= 1 for r in rows)
    # already-small images pass through byte-identical
    small_ids = {
        r["media_id"]
        for r in m.filter(
            (F.col("kind") == "image") & (F.col("meta.width") <= 128)
        ).collect()
    }
    orig = {
        r["media_id"]: bytes(r["payload"])
        for r in m.filter(F.col("kind") == "image").collect()
    }
    for r in rows:
        if r["media_id"] in small_ids:
            assert bytes(r["payload"]) == orig[r["media_id"]]


def test_frame_sample_counts(spark):
    """ceil(n_frames / stride) rows per video; no payload column in the
    output at all."""
    m = synthesize_media(load_tables(spark, SF_DIR)["documents"])
    out = sample_frames(m, stride=24)
    assert "payload" not in out.columns
    per = out.groupBy("media_id").count()
    expect = m.filter(F.col("kind") == "video").select(
        "media_id",
        F.ceil(F.col("meta.n_frames") / F.lit(24.0)).alias("expect"),
    )
    bad = per.join(expect, "media_id").filter(F.col("count") != F.col("expect"))
    assert bad.count() == 0
