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


def test_mixture_epochs_integer_identities(spark):
    from pyspark.sql import functions as F

    from ram_datapipeline_spark.operators.corpus import mixture_epochs

    docs = spark.createDataFrame(
        [
            (1, "a b c", "small"),    # 3 tokens
            (2, "a b c d e", "big"),  # 5 tokens
            (3, "x y z w q", "big"),  # 5 tokens
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r.domain: r
        for r in mixture_epochs(
            docs,
            weight=F.when(F.col("source") == "small", 3).otherwise(1),
            budget_tokens=100,
        ).collect()
    }
    # sum_w = 4 -> small gets 75 tokens over 3 available -> 25 epochs
    s = out["small"]
    assert (s.avail_tokens, s.w, s.alloc_tokens) == (3, 3, 75)
    assert (s.epochs, s.last_epoch_tokens) == (25, 3)
    # big gets 25 over 10 -> 3 epochs, 5 tokens in the last pass
    b = out["big"]
    assert (b.avail_tokens, b.alloc_tokens) == (10, 25)
    assert (b.epochs, b.last_epoch_tokens) == (3, 5)
    # identities: (epochs-1)*avail < alloc <= epochs*avail
    for r in out.values():
        assert (r.epochs - 1) * r.avail_tokens < r.alloc_tokens
        assert r.alloc_tokens <= r.epochs * r.avail_tokens
        assert r.last_epoch_tokens == (
            r.alloc_tokens - (r.epochs - 1) * r.avail_tokens
        )


def test_interleave_sources_proportional_permutation(spark):
    from ram_datapipeline_spark.operators.corpus import interleave_sources

    # 6 docs of A vs 2 of B -> B's docs land near positions 1/2 and 1/1
    # of the schedule; every prefix of the order is a fair share
    docs = spark.createDataFrame(
        [(i, "A") for i in range(6)] + [(100 + i, "B") for i in range(2)],
        "doc_id long, source string",
    )
    rows = (
        interleave_sources(docs, n_partitions=3)
        .orderBy("train_pos")
        .collect()
    )
    # a permutation: every position exactly once
    assert [r.train_pos for r in rows] == list(range(8))
    order = [r.domain for r in rows]
    # proportional: first half of the schedule has half of EACH source
    assert order.count("A") == 6 and order.count("B") == 2
    assert order[:4].count("A") == 3 and order[:4].count("B") == 1
    # within a source, document order is preserved
    a_ids = [r.doc_id for r in rows if r.domain == "A"]
    assert a_ids == sorted(a_ids)


def test_length_buckets_edges_batches_waste(spark):
    from ram_datapipeline_spark.operators.corpus import length_buckets

    def doc(i, n):
        return (i, " ".join(["w"] * n))

    # bucket 1 = [16,32): 3 docs with batch_size=2 -> batches of 2+1,
    # longest first; bucket edges are strict upper bounds
    docs = spark.createDataFrame(
        [doc(1, 20), doc(2, 31), doc(3, 16), doc(4, 15), doc(5, 200)],
        "doc_id long, text string",
    )
    out = {
        (r.bucket, r.batch_id): r
        for r in length_buckets(docs, batch_size=2).collect()
    }
    b0 = out[(0, 0)]          # the 15-token doc: below the first edge
    assert (b0.n_docs, b0.max_len, b0.padding_waste) == (1, 15, 0)
    b1a = out[(1, 0)]         # 31 and 20 -> waste = 2*31 - 51
    assert (b1a.n_docs, b1a.max_len, b1a.sum_len) == (2, 31, 51)
    assert b1a.padding_waste == 11
    b1b = out[(1, 1)]         # the 16-token doc alone
    assert (b1b.n_docs, b1b.max_len, b1b.padding_waste) == (1, 16, 0)
    assert out[(4, 0)].max_len == 200   # >= last edge -> overflow bucket
    assert len(out) == 4


def test_mixture_epochs_zero_allocation_plans_zero_passes(spark):
    """ADVICE r8: a domain whose weighted share floors to zero tokens
    must plan epochs=0 and last_epoch_tokens=0 — not the contradictory
    (epochs=0, last_epoch_tokens=avail) the raw ceiling-division
    identities produce."""
    from pyspark.sql import functions as F

    from ram_datapipeline_spark.operators.corpus import mixture_epochs

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j", "big"),   # 10 tokens, w=1000
            (2, "x y z", "tiny"),                 # 3 tokens, w=1
        ],
        "doc_id long, text string, source string",
    )
    out = {
        r.domain: r
        for r in mixture_epochs(
            docs,
            weight=F.when(F.col("source") == "big", 1000).otherwise(1),
            budget_tokens=500,   # tiny: 500*1//1001 = 0
        ).collect()
    }
    t = out["tiny"]
    assert (t.alloc_tokens, t.epochs, t.last_epoch_tokens) == (0, 0, 0)
    b = out["big"]
    assert b.alloc_tokens == 499 and b.epochs == 50
    assert b.last_epoch_tokens == 499 - 49 * 10


def test_corpus_pipeline_normalized_quality_shifts_thresholds(spark, tmp_path):
    """VERDICT r8 #6: run_corpus_pipeline(normalize_quality=True) gates
    on per-source score QUANTILES, not raw scores — every source keeps
    (approximately) the same top fraction, so the surviving raw-score
    floor must differ across sources with different distributions,
    and the funnel must account for the quantile stage."""
    from ram_datapipeline_spark.operators.quality import quantile_buckets
    from ram_datapipeline_spark.operators.text_ops import quality_score_scaled

    out = str(tmp_path / "corpus_norm")
    counts = run_corpus_pipeline(
        spark, SF_DIR, out, normalize_quality=True,
        quality_k=10, min_quality_bucket=4,
    )
    assert counts and sum(counts.values()) > 0

    # funnel carries the quantile stage with real drops
    funnel = {
        r.stage: r for r in spark.read.parquet(f"{out}/funnel").collect()
    }
    assert "quality_quantile" in funnel
    q = funnel["quality_quantile"]
    assert q.n_out < q.n_in and q.n_dropped == q.n_in - q.n_out

    # per-source raw floors shift: the minimum SURVIVING raw score is
    # source-dependent (the whole point of normalization), while the
    # kept fraction stays within tie-slack of (k - bucket + 1)/k
    docs = load_tables(spark, SF_DIR)["documents"].withColumn(
        "q_score", quality_score_scaled(F.col("text"))
    )
    scored = quantile_buckets(
        docs, F.col("q_score"), 10, metric_col="source", out_col="b"
    )
    per_src = (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("b") >= 4, 1).otherwise(0)).alias("kept"),
            F.min(F.when(F.col("b") >= 4, F.col("q_score"))).alias("floor"),
        )
        .collect()
    )
    floors = {r.floor for r in per_src}
    assert len(floors) > 1, floors  # thresholds actually shifted
    for r in per_src:
        frac = r.kept / r.n
        # 7 of 10 deciles nominally kept; a value tied WITH a cutoff
        # takes the lower bucket (cutoffs strictly below count), so
        # small sources drift a few rows either side of 0.7
        assert 0.6 <= frac <= 0.8, (r.source, frac)


def test_k_anonymity_audit_hand_case(spark):
    """Hand-checkable k-anonymity/l-diversity: class sizes, the below-k
    flag, NULL-as-a-QI-value, l-diversity ignoring NULL sensitive
    values, and the global risk totals riding every row."""
    from ram_datapipeline_spark.operators.quality import k_anonymity_audit

    rows = [
        # (zip, age_band, diagnosis)
        ("02139", "20-29", "flu"),
        ("02139", "20-29", "flu"),
        ("02139", "20-29", "cold"),      # class of 3 -> at risk (k=5)
        ("94110", "30-39", "flu"),
        ("94110", "30-39", "cold"),
        ("94110", "30-39", "asthma"),
        ("94110", "30-39", "flu"),
        ("94110", "30-39", "cold"),      # class of 5 -> safe, l=3
        (None,    "30-39", None),
        (None,    "30-39", "flu"),       # NULL zip is its own class of 2
    ]
    df = spark.createDataFrame(rows, "zip string, age string, dx string")
    out = k_anonymity_audit(df, ["zip", "age"], k=5, sensitive_col="dx")
    got = {(r.zip, r.age): r for r in out.collect()}
    assert len(got) == 3
    a = got[("02139", "20-29")]
    assert (a.class_size, a.l_diversity, a.at_risk) == (3, 2, True)
    b = got[("94110", "30-39")]
    assert (b.class_size, b.l_diversity, b.at_risk) == (5, 3, False)
    c = got[(None, "30-39")]
    assert (c.class_size, c.l_diversity, c.at_risk) == (2, 1, True)
    for r in got.values():
        assert (r.n_classes, r.n_classes_at_risk, r.rows_at_risk) == (3, 2, 5)
    # without a sensitive column the report drops l_diversity only
    slim = k_anonymity_audit(df, ["zip", "age"], k=2)
    assert "l_diversity" not in slim.columns
    assert {r.at_risk for r in slim.collect()} == {False}


def test_randomized_response_exact_mechanism_and_calibration(spark):
    """The md5 coin, the flip rule, and the integer debias replayed by
    hand; then calibration on the real events fixture (est/2 within
    sampling noise of the true count)."""
    import hashlib

    from ram_datapipeline_spark.operators.quality import (
        randomized_response_counts,
    )

    rows = [(i, "g", i % 2 == 0) for i in range(1, 41)]
    df = spark.createDataFrame(rows, "id long, grp string, s boolean")
    out = randomized_response_counts(
        df, ["grp"], F.col("s"), "id"
    ).collect()[0]

    def u32(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

    exp_rep = sum(
        1
        for i, _, s in rows
        if (s if u32(i) % 4 < 3 else not s)
    )
    exp_true = sum(1 for *_, s in rows if s)
    assert out.n == 40
    assert out.n_reported_true == exp_rep
    assert out.true_count == exp_true
    assert out.est_true_x2 == 4 * exp_rep - 40

    ev = load_tables(spark, SF_DIR)["events"]
    rep = randomized_response_counts(
        ev, ["event_type"], F.col("value") > F.lit(50.0), "event_id"
    ).collect()
    for r in rep:
        est = r.est_true_x2 / 2.0
        # ~2000 rows/group: sd(t_hat) = 2*sqrt(n*p*(1-p)) ~ 39; 5 sd
        assert abs(est - r.true_count) < 200, (r.event_type, est, r.true_count)


def test_randomized_response_rejects_degenerate_p(spark):
    """ADVICE r12: p outside (1/2, 1) must raise — p=1 gives no privacy,
    p=1/2 a zero-scale estimator, p<1/2 a negative-scale column name."""
    import pytest as _pytest

    from ram_datapipeline_spark.operators.quality import (
        randomized_response_counts,
    )

    df = spark.createDataFrame([(1, "g", True)], "id long, grp string, s boolean")
    for num, den in ((4, 4), (2, 4), (1, 4), (5, 4)):
        with _pytest.raises(ValueError, match="keep_den"):
            randomized_response_counts(
                df, ["grp"], F.col("s"), "id", keep_num=num, keep_den=den
            )
    # the open interval's endpoints work fine one step in
    randomized_response_counts(
        df, ["grp"], F.col("s"), "id", keep_num=3, keep_den=4
    ).collect()


def test_dataset_card_empty_corpus_defined(spark):
    """ADVICE r12: ppm metrics must be 0 (not NULL) on an empty corpus
    — integer DIV by zero yields NULL in Spark without the CASE guard."""
    from ram_datapipeline_spark.operators.corpus import dataset_card

    df = spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string"
    )
    got = {r.metric: r.value for r in dataset_card(df).collect()}
    assert got["n_docs"] == 0.0
    assert got["short_doc_ppm"] == 0.0


def test_dataset_card_hand_case(spark):
    """Card metrics replayed by hand: dup counting, short-doc ppm,
    exact token percentiles, NULL-lang bucketing."""
    from ram_datapipeline_spark.operators.corpus import dataset_card

    rows = [
        (1, "a b c", "en", "s1"),
        (2, "a b c", "en", "s1"),          # exact dup of doc 1
        (3, "w x y z " + "t " * 18, "fr", "s2"),  # 22 tokens
        (4, "short", None, "s2"),           # 1 token, NULL lang
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    got = {r.metric: r.value for r in dataset_card(df, short_doc_tokens=4).collect()}
    assert got["n_docs"] == 4.0 and got["n_sources"] == 2.0
    assert got["exact_dup_docs"] == 1.0
    # docs with < 4 tokens: docs 1, 2 (3 tokens) and 4 (1 token) -> 3/4
    assert got["short_doc_ppm"] == 750000.0
    # token counts: [3, 3, 23, 1] (trailing space -> final empty token)
    toks = sorted([3, 3, 23, 1])
    assert got["tokens_p50"] == 3.0
    assert got["lang_en_ppm"] == 500000.0
    assert got["lang_(null)_ppm"] == 250000.0
    assert got["total_tokens"] == float(sum(toks))
