"""End-to-end corpus-assembly pipeline: the 6-stage DAG writes a
split-partitioned corpus, funnel accounting, and operation-log rows, and
each stage's effect is observable in the output."""

from __future__ import annotations

from pyspark.sql import functions as F

from ram_datapipeline_spark.catalog import load_tables
from ram_datapipeline_spark.plans.corpus_pipeline import (
    assemble_corpus,
    run_corpus_pipeline,
)
from ram_datapipeline_spark.streaming import OperationLog
from tests.conftest import SF_DIR


def test_corpus_pipeline_end_to_end(spark, tmp_path):
    out = str(tmp_path / "corpus_out")
    counts = run_corpus_pipeline(spark, SF_DIR, out)

    docs = load_tables(spark, SF_DIR)["documents"]
    corpus = spark.read.parquet(f"{out}/corpus")

    # gates actually filtered: survivors < input, all constraints hold
    assert 0 < corpus.count() < docs.count()
    assert corpus.filter(~F.col("lang").isin("en", "de", "fr")).count() == 0
    assert corpus.filter(F.col("source") == "src0").count() == 0
    assert set(counts) <= {"train", "val", "test"}
    assert counts["train"] > counts.get("val", 0)
    assert sum(counts.values()) == corpus.count()

    # split is the hive partition column
    import os

    assert sorted(d for d in os.listdir(f"{out}/corpus") if d.startswith("split=")) == [
        f"split={s}" for s in sorted(counts)
    ]

    # packing coordinates are per-shard consistent: offsets strictly
    # increase with doc_id inside a shard
    rows = corpus.select("source", "doc_id", "tok_offset", "n_tokens").collect()
    by_shard: dict = {}
    for r in rows:
        by_shard.setdefault(r.source, []).append(r)
    for shard_rows in by_shard.values():
        shard_rows.sort(key=lambda r: r.doc_id)
        off = 0
        for r in shard_rows:
            assert r.tok_offset == off
            off += r.n_tokens

    # funnel table exists with the funnel algebra intact
    funnel = spark.read.parquet(f"{out}/funnel").orderBy("stage_idx").collect()
    assert funnel[0].n_in == docs.count()
    assert funnel[1].n_in == funnel[0].n_out

    # operation log: started + finished
    ol = OperationLog(spark, f"{out}/oplog")
    status = ol.current_status().collect()
    assert len(status) == 1 and status[0].status == "complete"


def test_assemble_corpus_exact_dedup_drops_clones(spark):
    docs = load_tables(spark, SF_DIR)["documents"]
    # clone every doc under new ids: exact dedup must drop all clones
    n = docs.count()
    clones = docs.withColumn("doc_id", F.col("doc_id") + 1_000_000)
    doubled = docs.unionByName(clones)
    base = assemble_corpus(docs)
    out = assemble_corpus(doubled)
    assert out.count() == base.count()
    assert out.filter(F.col("doc_id") >= 1_000_000).count() == 0


def test_media_pipeline_end_to_end(spark, tmp_path):
    from ram_datapipeline_spark.plans import run_media_pipeline

    out = str(tmp_path / "media_out")
    counts = run_media_pipeline(spark, "/root/testdata/sf0.001", out)
    assert counts["catalog"] > 0
    # every document produced one image-stat and one audio-stat row
    assert counts["image_stats"] == counts["catalog"]
    assert counts["audio_stats"] == counts["catalog"]
    assert counts["jpeg_stats"] == counts["catalog"]
    assert 0 < counts["kept_after_dedup"] <= counts["features"]

    # partitioned layout by modality exists and reads back
    feats = spark.read.parquet(f"{out}/media_features")
    assert set(feats.columns) == {"media_id", "kind", "embedding"}
    assert feats.count() == counts["kept_after_dedup"]

    # all image stats decoded successfully (8x8 thumbnails, gray8)
    st = spark.read.parquet(f"{out}/image_stats")
    bad = st.filter("width is null or width != 8 or height != 8").count()
    assert bad == 0

    # all flat JPEGs decoded exactly (16x16, gray, DC-only lossless)
    jt = spark.read.parquet(f"{out}/jpeg_stats")
    bad = jt.filter(
        "width is null or width != 16 or pixel_sum != pixel_max * 256"
    ).count()
    assert bad == 0


def test_token_budget_select_prefix_semantics(spark):
    """Hand-checkable budget fill: hash-ordered prefix whose running
    total stays within the domain budget; later docs excluded once the
    budget is crossed; unknown domains dropped; empty budgets raise."""
    import hashlib

    import pytest
    from pyspark.sql import functions as F

    from ram_datapipeline_spark.operators.corpus import token_budget_select

    rows = [(i, "a", 10) for i in range(10)] + [(100, "zzz", 1)]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")
    out = token_budget_select(df, {"a": 35}).collect()
    got = {r["doc_id"]: r["cum_tokens"] for r in out}
    # expected: first 3 docs in md5(doc_id) order (10+10+10=30 <= 35;
    # the 4th would hit 40 > 35)
    order = sorted(range(10), key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    expect = {order[0]: 10, order[1]: 20, order[2]: 30}
    assert got == expect, (got, expect, order)
    assert all(r["source"] == "a" for r in out)  # 'zzz' dropped
    with pytest.raises(ValueError, match="empty budget"):
        token_budget_select(df, {})
