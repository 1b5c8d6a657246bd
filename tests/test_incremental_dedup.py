"""Incremental cross-snapshot dedup (VERDICT r9 #7): a new batch is
deduped against a persisted, bucketed corpus band index without
re-minhashing the corpus; the result must be IDENTICAL to running
full-corpus LSH from scratch and restricting to the batch."""

from __future__ import annotations

from pyspark.sql import functions as F

from ram_datapipeline_spark.operators.dedup import (
    incremental_lsh_dedup,
    minhash_band_index,
    minhash_lsh_pairs,
    write_minhash_index,
)

# ids 1-3 corpus, 11-15 batch, 100 corpus (LARGER than every batch id —
# proves corpus partners qualify regardless of id order)
_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "pack my box with five dozen liquor jugs"),
    (3, "how vexingly quick daft zebras jump today"),
    (100, "sphinx of black quartz judge my vow now"),
    (11, "the quick brown fox jumps over the lazy dog"),   # dup of corpus 1
    (12, "a completely unique batch document about spark"),
    (13, "a completely unique batch document about spark"),  # dup of batch 12
    (14, "sphinx of black quartz judge my vow now"),       # dup of corpus 100
    (15, "short"),                                          # < 3 tokens: no shingles
]
def _batch_pred():
    return F.col("doc_id").between(11, 15)


def _setup(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    corpus = docs.where(~_batch_pred())
    batch = docs.where(_batch_pred())
    write_minhash_index(
        minhash_band_index(corpus), "tmp_inc_dedup_idx", n_buckets=4
    )
    return docs, batch, spark.table("tmp_inc_dedup_idx")


def test_incremental_matches_full_corpus_lsh(spark):
    docs, batch, idx = _setup(spark)
    got = {
        r.doc_id: (r.is_dup, r.dup_of)
        for r in incremental_lsh_dedup(batch, idx).collect()
    }
    # full-corpus replay: LSH pairs over corpus ∪ batch, restricted to
    # batch docs with corpus partners (any) or earlier batch partners
    pairs = minhash_lsh_pairs(docs).collect()
    batch_ids = {d for d, _ in _DOCS if 11 <= d <= 15}
    partners: dict[int, list[int]] = {}
    for p in pairs:
        for new, other in ((p.doc_a, p.doc_b), (p.doc_b, p.doc_a)):
            if new in batch_ids and (
                other not in batch_ids or other < new
            ):
                partners.setdefault(new, []).append(other)
    want = {
        d: (d in partners, min(partners[d]) if d in partners else None)
        for d in batch_ids
    }
    assert got == want
    # and the hand-known verdicts hold
    assert got[11] == (True, 1)
    assert got[13] == (True, 12)
    assert got[14] == (True, 100)
    assert got[12][0] is False and got[15][0] is False


def test_incremental_bucketed_smj_no_corpus_rehash(spark):
    """With broadcast off, the probe join is a sort-merge join that
    exploits the index's bucketed layout (Bucketed: true on the corpus
    scan — the corpus side never exchanges), and the plan computes no
    md5 at probe time (batch hashing ran once into the checkpoint)."""
    _, batch, idx = _setup(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        out = incremental_lsh_dedup(batch, idx, broadcast_batch=False)
        plan = out._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    assert "md5" not in plan
    assert "CartesianProduct" not in plan


def test_incremental_empty_corpus_and_empty_batch(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    corpus = docs.where(~_batch_pred())
    batch = docs.where(_batch_pred())
    # empty corpus: only intra-batch dups remain
    write_minhash_index(
        minhash_band_index(corpus.limit(0)), "tmp_inc_dedup_idx0", n_buckets=4
    )
    got = {
        r.doc_id: (r.is_dup, r.dup_of)
        for r in incremental_lsh_dedup(
            batch, spark.table("tmp_inc_dedup_idx0")
        ).collect()
    }
    assert got[13] == (True, 12)
    assert all(not got[d][0] for d in (11, 12, 14, 15))
    # empty batch: empty result frame with the right schema
    write_minhash_index(
        minhash_band_index(corpus), "tmp_inc_dedup_idx1", n_buckets=4
    )
    empty = incremental_lsh_dedup(
        batch.limit(0), spark.table("tmp_inc_dedup_idx1")
    )
    assert empty.count() == 0
    assert empty.columns == ["doc_id", "is_dup", "dup_of"]


def test_incremental_components_bridge_merges_corpus_clusters(spark):
    """The hard case: a single batch document collides with TWO standing
    corpus clusters — incremental maintenance must merge them (and
    relabel the losing cluster's members) exactly as a full recompute
    over corpus ∪ batch does."""
    from ram_datapipeline_spark.operators.dedup import (
        connected_components,
        incremental_components,
        incremental_lsh_candidates,
        write_labels_table,
    )

    a_txt = (
        "apple banana cherry date elderberry fig grape honeydew imbe "
        "jackfruit kiwi lemon"
    )
    b_txt = (
        "mango nectarine orange papaya quince raspberry strawberry "
        "tangerine ugli vanilla walnut ximenia"
    )
    docs = spark.createDataFrame(
        [(1, a_txt), (2, a_txt), (3, b_txt), (4, b_txt),
         (11, a_txt + " " + b_txt), (12, "zeppelin yacht xylophone")],
        "doc_id long, text string",
    )
    corpus = docs.where(F.col("doc_id") <= 4)
    batch = docs.where(F.col("doc_id") >= 11)
    write_minhash_index(
        minhash_band_index(corpus), "tmp_inc_cc_idx", n_buckets=4
    )
    write_labels_table(
        connected_components(minhash_lsh_pairs(corpus), corpus),
        "tmp_inc_cc_lab",
    )
    edges = incremental_lsh_candidates(batch, spark.table("tmp_inc_cc_idx"))
    got = {
        r.doc_id: r.component
        for r in incremental_components(
            spark.table("tmp_inc_cc_lab"), batch.select("doc_id"), edges
        ).collect()
    }
    want = {
        r.doc_id: r.component
        for r in connected_components(
            minhash_lsh_pairs(docs), docs
        ).collect()
    }
    assert got == want
    # the bridge really merged the two corpus clusters
    assert want[3] == 1 and want[4] == 1 and want[11] == 1
    # the isolated batch doc stays its own component
    assert got[12] == 12
