"""Corpus-assembly query family (beyond-reference, BASELINE.json north
star): the operations that turn a filtered document pool into a training
corpus — test-set decontamination, deterministic domain mixing, sequence
packing, and characteristic-term extraction.

All four carry full DuckDB oracles: hashing is md5 hex, sampling is an
integer threshold on a 32-bit hash prefix, packing is window integer
arithmetic, TF-IDF is integer division — bit-exact in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ram_datapipeline_spark.catalog import load_tables
from ram_datapipeline_spark.operators import corpus as C
from ram_datapipeline_spark.registry import query

# DuckDB equivalent of hash_uniform(): fold the first 8 md5 hex digits to a
# 32-bit integer (DuckDB has no conv(); strpos-over-hex is exact).
_U32_SQL = (
    "list_reduce(list_transform(generate_series(1, 8), "
    "i -> CAST(strpos('0123456789abcdef', "
    "substr(md5(CAST(doc_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)), "
    "(a, b) -> a * 16 + b)"
)


@query(
    "pipe_decontaminate",
    oracle="""
    WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS arr FROM documents),
    sh AS (
      SELECT DISTINCT doc_id, source,
             md5(arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] || ' ' || arr[i+3]) AS g
      FROM tok, LATERAL (SELECT unnest(generate_series(1, len(arr) - 3)) AS i) u
    ),
    bench AS (SELECT DISTINCT g FROM sh WHERE source = 'src0')
    SELECT s.doc_id, s.source, count(*) AS hit_grams
    FROM sh s JOIN bench b ON s.g = b.g
    WHERE s.source <> 'src0'
    GROUP BY s.doc_id, s.source
    """,
    survey="test-set decontamination via n-gram overlap (north star)",
    tags=("pipeline",),
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs sharing any word 4-gram with the src0 'benchmark'
    shard: corpus-wide shingle explode, benchmark gram set broadcast, one
    aggregate back to documents. n=4 on the ~30-word synthetic vocabulary
    reproduces the selectivity of the 13-grams real pipelines use."""
    t = load_tables(spark, sf_dir)
    return C.decontaminate(t["documents"], benchmark_source="src0", n=4)


@query(
    "pipe_stratified_sample",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source, {_U32_SQL} AS u32 FROM documents
    )
    SELECT doc_id, source, u32 FROM h
    WHERE u32 < CAST(floor(
        (CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0 THEN 0.7 ELSE 0.2 END)
        * 4294967296.0) AS BIGINT)
    """,
    survey="deterministic stratified sampling / domain mixing (north star)",
    tags=("pipeline",),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain mixing: even-numbered sources kept at 70%, odd at 20%, via
    an integer threshold on md5(doc_id)'s 32-bit prefix. Pure pushed-down
    filter — zero shuffles, reproducible across runs and engines."""
    t = load_tables(spark, sf_dir)
    rates = {f"src{i}": (0.7 if i % 2 == 0 else 0.2) for i in range(20)}
    return C.stratified_sample(
        t["documents"].select("doc_id", "source"),
        key_col="doc_id",
        strata_col="source",
        rates=rates,
    ).select("doc_id", "source", "u32")


@query(
    "pipe_sequence_packing",
    oracle="""
    WITH t AS (
      SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(coalesce(sum(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS tok_offset
      FROM t
    )
    SELECT doc_id, source, n_tokens, tok_offset,
           tok_offset // 512 AS bin_first,
           (tok_offset + greatest(n_tokens, 1) - 1) // 512 AS bin_last,
           tok_offset % 512 AS offset_in_bin
    FROM c
    """,
    survey="sequence packing: concat-and-chunk token binning (north star)",
    tags=("pipeline",),
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each document's slice of 512-token training sequences, packed
    end-to-end per source shard. Window is partitioned by shard — no
    global sort; one shuffle total."""
    t = load_tables(spark, sf_dir)
    return C.sequence_packing(t["documents"], budget=512)


@query(
    "pipe_tfidf_topk",
    oracle="""
    WITH w AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM w GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df, tf.tf * 1000000 // dfreq.df AS score
      FROM tf JOIN dfreq USING (term)
    ),
    ranked AS (
      SELECT *, row_number() OVER (
        PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rnk
      FROM scored
    )
    SELECT doc_id, term, tf, df, score, rnk FROM ranked WHERE rnk <= 3
    """,
    survey="TF-IDF characteristic terms, integer-exact (north star)",
    tags=("pipeline",),
)
def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document: integer tf*1e6 div df
    score (monotone in tf·idf for a fixed corpus), document-frequency
    table broadcast, ties broken on the term string."""
    t = load_tables(spark, sf_dir)
    return C.tfidf_topk(t["documents"], k=3)


# --- vector/embedding storage ops -------------------------------------------

from ram_datapipeline_spark.operators import vectors as V  # noqa: E402


@query(
    "vec_normalize",
    oracle="""
    WITH d AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    n AS (
      SELECT vec_id, e,
             sqrt(list_reduce(list_transform(e, x -> x * x), (a, b) -> a + b)) AS nrm
      FROM d
    )
    SELECT vec_id, CAST(i - 1 AS INT) AS pos, nrm,
           CASE WHEN nrm > 0.0 THEN e[i] / nrm END AS unit_val
    FROM n, LATERAL (SELECT unnest(generate_series(1, len(e))) AS i) u
    """,
    survey="embedding L2 normalization, zero-shuffle map (north star)",
    tags=("pipeline",),
)
def q_vec_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit vectors + norms in long format (vec_id, pos, nrm, unit_val):
    strict left-fold sum of squares, so the fold order (and therefore
    every bit of the double) matches any engine's left fold. Long format
    because the driver canonicalizer sorts raw columns and cannot hash
    array cells (CORRECTNESS_r03 TypeError); the array-returning
    ``V.normalize`` stays the operator API for callers."""
    t = load_tables(spark, sf_dir)
    return V.normalize_long(t["embeddings"])


@query(
    "vec_quantize_int8",
    oracle="""
    WITH d AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    s AS (SELECT vec_id, e, list_min(e) AS mn, list_max(e) AS mx FROM d)
    SELECT vec_id, CAST(i - 1 AS INT) AS pos, mn AS scale_min, mx AS scale_max,
           CASE WHEN mx > mn
                THEN least(CAST(floor((e[i] - mn) * 255.0 / (mx - mn)) AS BIGINT),
                           CAST(255 AS BIGINT))
                ELSE CAST(0 AS BIGINT)
           END AS q
    FROM s, LATERAL (SELECT unnest(generate_series(1, len(e))) AS i) u
    """,
    survey="embedding scalar int8 quantization (north star)",
    tags=("pipeline",),
)
def q_vec_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-component [0,255] codes + dequantization scales in long format
    (vec_id, pos, scale_min, scale_max, q). The float divide is the same
    correctly-rounded IEEE op everywhere; floor makes the output
    integer-exact. Long format for the driver canonicalizer (array cells
    are unhashable there); ``V.quantize_int8`` keeps the array API."""
    t = load_tables(spark, sf_dir)
    return V.quantize_int8_long(t["embeddings"])


@query(
    "vec_label_centroids",
    oracle="""
    WITH d AS (
      SELECT label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    s AS (SELECT label, e, list_min(e) AS mn, list_max(e) AS mx FROM d),
    q AS (
      SELECT label,
             CASE WHEN mx > mn
                  THEN list_transform(e, x -> least(
                         CAST(floor((x - mn) * 255.0 / (mx - mn)) AS BIGINT),
                         CAST(255 AS BIGINT)))
                  ELSE list_transform(e, x -> CAST(0 AS BIGINT))
             END AS codes
      FROM s
    ),
    x AS (
      SELECT label, i - 1 AS pos, codes[i] AS code
      FROM q, LATERAL (SELECT unnest(generate_series(1, len(codes))) AS i) u
    )
    SELECT label, CAST(pos AS INT) AS pos,
           CAST(sum(code) AS BIGINT) AS sum_q,
           count(*) AS n,
           CAST(sum(code) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_q
    FROM x
    GROUP BY label, pos
    """,
    survey="per-label centroids over quantized codes — exact distributed mean (north star)",
    tags=("pipeline",),
)
def q_vec_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-wise label centroids computed on integer codes: the
    cross-row sum is exact under any shuffle order (the float-sum
    nondeterminism trap), one (label, pos) aggregate with map-side
    combine."""
    t = load_tables(spark, sf_dir)
    return V.label_centroids(t["embeddings"])


@query(
    "pipe_segment_dedup",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    tot AS (SELECT doc_id, (len(words) + 3) // 4 AS n_segments, words FROM w),
    segs AS (
      SELECT doc_id, i AS seg_idx,
             array_to_string(list_slice(words, i*4 + 1, i*4 + 4), ' ') AS seg
      FROM tot, LATERAL (SELECT unnest(generate_series(0, n_segments - 1)) AS i) u
    ),
    kept AS (
      SELECT doc_id, seg_idx, seg,
             row_number() OVER (PARTITION BY md5(seg) ORDER BY doc_id, seg_idx) AS rn
      FROM segs
    ),
    agg AS (
      SELECT doc_id, count(*) AS kept_segments,
             string_agg(seg, ' ' ORDER BY seg_idx) AS text_dedup
      FROM kept WHERE rn = 1 GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_segments,
           coalesce(a.kept_segments, 0) AS kept_segments,
           coalesce(a.text_dedup, '') AS text_dedup
    FROM tot t LEFT JOIN agg a USING (doc_id)
    """,
    survey="segment-level exact dedup + document rebuild (C4 line-dedup analog)",
    tags=("pipeline",),
)
def q_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide first-occurrence dedup of 4-word segments, documents
    rebuilt from survivors. 4-word spans on the ~30-word synthetic
    vocabulary collide at the rate real pipelines see for duplicated
    lines; one md5-keyed shuffle, one rebuild shuffle
    (operators/corpus.py::segment_dedup)."""
    t = load_tables(spark, sf_dir)
    return C.segment_dedup(t["documents"], seg_words=4)


@query(
    "vec_kmeans_q8",
    oracle="""
    WITH d AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    g AS (SELECT min(list_min(e)) AS gmn, max(list_max(e)) AS gmx FROM d),
    c AS (
      SELECT vec_id,
             CASE WHEN gmx > gmn
                  THEN list_transform(e, x -> least(
                         CAST(floor((x - gmn) * 255.0 / (gmx - gmn)) AS BIGINT),
                         CAST(255 AS BIGINT)))
                  ELSE list_transform(e, x -> CAST(0 AS BIGINT))
             END AS codes
      FROM d, g
    ),
    seeds AS (
      SELECT codes AS cent0,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
      FROM c
      QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 4
    ),
    d1 AS (
      SELECT v.vec_id, v.codes, s.cid,
             list_reduce(list_transform(generate_series(1, len(v.codes)),
               i -> (v.codes[i] - s.cent0[i]) * (v.codes[i] - s.cent0[i])),
               (x, y) -> x + y) AS dist
      FROM c v, seeds s
    ),
    a1 AS (
      SELECT vec_id, codes, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
      FROM d1
    ),
    m AS (
      SELECT cid, i - 1 AS pos,
             CAST(sum(codes[i]) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean
      FROM a1, LATERAL (SELECT unnest(generate_series(1, len(codes))) AS i) u
      WHERE rn = 1
      GROUP BY cid, i
    ),
    cent2 AS (SELECT cid, list(mean ORDER BY pos) AS cent FROM m GROUP BY cid),
    d2 AS (
      SELECT v.vec_id, t.cid,
             list_reduce(list_transform(generate_series(1, len(v.codes)),
               i -> (CAST(v.codes[i] AS DOUBLE) - t.cent[i])
                    * (CAST(v.codes[i] AS DOUBLE) - t.cent[i])),
               (x, y) -> x + y) AS dist2
      FROM c v, cent2 t
    ),
    a2 AS (
      SELECT vec_id, cid, dist2,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
      FROM d2
    )
    SELECT vec_id, cid AS cluster, dist2 AS dist FROM a2 WHERE rn = 1
    """,
    survey="distributed k-means (2 Lloyd rounds) over global int8 codes — exact clustering (north star)",
    tags=("pipeline",),
)
def q_vec_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k=4 two-round Lloyd over globally-quantized codes: hash-stratified
    seeds, broadcast centroids both rounds, integer round-1 distances,
    exact-mean round-2 centroids, left-fold round-2 distances — every bit
    reproducible under shuffle (operators/vectors.py::kmeans_q8)."""
    t = load_tables(spark, sf_dir)
    return V.kmeans_q8(t["embeddings"], k=4)


@query(
    "pipe_chunk_overlap",
    oracle="""
    WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
    t AS (
      SELECT doc_id, words,
             (greatest(len(words) - 2, 1) + 5) // 6 AS n_chunks
      FROM w
    ),
    ch AS (
      SELECT doc_id, n_chunks, i AS chunk_idx,
             list_slice(words, i*6 + 1, i*6 + 8) AS chunk
      FROM t, LATERAL (SELECT unnest(generate_series(0, n_chunks - 1)) AS i) u
    )
    SELECT doc_id, chunk_idx, n_chunks,
           array_to_string(chunk, ' ') AS chunk_text,
           CAST(len(chunk) AS INT) AS chunk_words_n
    FROM ch
    """,
    survey="document chunking with overlap (RAG / context-window prep)",
    tags=("pipeline",),
)
def q_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-word chunks, 2-word overlap (stride 6): pure projection +
    bounded explode — zero shuffles; boundaries are integer arithmetic
    (operators/corpus.py::chunk_with_overlap)."""
    t = load_tables(spark, sf_dir)
    return C.chunk_with_overlap(t["documents"], chunk_words=8, overlap_words=2)


@query(
    "pipe_quality_funnel",
    oracle="""
    WITH c AS (
      SELECT count(*) AS n,
        CAST(sum(CASE WHEN n_chars >= 100 THEN 1 ELSE 0 END) AS BIGINT) AS s0,
        CAST(sum(CASE WHEN n_chars >= 100 AND lang IN ('en','de','fr') THEN 1 ELSE 0 END) AS BIGINT) AS s1,
        CAST(sum(CASE WHEN n_chars >= 100 AND lang IN ('en','de','fr')
                       AND len(string_split(text, ' ')) >= 30 THEN 1 ELSE 0 END) AS BIGINT) AS s2
      FROM documents
    )
    SELECT 0 AS stage_idx, 'min_length' AS stage, n AS n_in, s0 AS n_out, n - s0 AS n_dropped FROM c
    UNION ALL
    SELECT 1, 'lang_allowed', s0, s1, s0 - s1 FROM c
    UNION ALL
    SELECT 2, 'min_tokens', s1, s2, s1 - s2 FROM c
    """,
    survey="staged quality-filter funnel accounting (single-pass conditional sums)",
    tags=("pipeline",),
)
def q_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage survivor counts for a 3-stage document filter, computed
    in ONE scan (conditional sums over conjunction prefixes — no
    per-stage jobs, no driver loop; operators/corpus.py::quality_funnel)."""
    from pyspark.sql import functions as SF

    t = load_tables(spark, sf_dir)
    d = t["documents"]
    return C.quality_funnel(
        d,
        [
            ("min_length", SF.col("n_chars") >= 100),
            ("lang_allowed", SF.col("lang").isin("en", "de", "fr")),
            ("min_tokens", SF.size(SF.split(SF.col("text"), " ")) >= 30),
        ],
    )


@query(
    "pipe_snapshot_diff",
    oracle="""
    WITH oldv AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 10 <> 3
    ),
    newv AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 5 THEN o_totalprice * 2
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 10 <> 7
    ),
    j AS (
      SELECT coalesce(o.o_orderkey, n.o_orderkey) AS o_orderkey,
             o.o_totalprice AS old_o_totalprice,
             n.o_totalprice AS new_o_totalprice,
             CASE WHEN o.o_orderkey IS NULL THEN 'added'
                  WHEN n.o_orderkey IS NULL THEN 'removed'
                  WHEN o.o_totalprice IS DISTINCT FROM n.o_totalprice THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM oldv o FULL OUTER JOIN newv n ON o.o_orderkey = n.o_orderkey
    )
    SELECT * FROM j WHERE status <> 'unchanged'
    """,
    survey="snapshot diff: added/removed/changed between table versions (incremental pipelines)",
    tags=("pipeline",),
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two deterministic derivations of orders (drop keys ≡3 mod 10 from
    'old', drop ≡7 and double prices ≡5 in 'new') diffed by key: null-safe
    compare, change-sized output, one co-partitioned full outer join
    (operators/relational.py::snapshot_diff)."""
    from pyspark.sql import functions as SF

    from ram_datapipeline_spark.operators.relational import snapshot_diff

    t = load_tables(spark, sf_dir)
    o = t["orders"]
    oldv = o.filter(SF.col("o_orderkey") % 10 != 3).select("o_orderkey", "o_totalprice")
    newv = o.filter(SF.col("o_orderkey") % 10 != 7).select(
        "o_orderkey",
        SF.when(
            SF.col("o_orderkey") % 10 == 5, SF.col("o_totalprice") * 2
        ).otherwise(SF.col("o_totalprice")).alias("o_totalprice"),
    )
    return snapshot_diff(
        oldv, newv, key_cols=["o_orderkey"], compare_cols=["o_totalprice"]
    )


@query(
    "pipe_split_assign",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source, {_U32_SQL} AS u32 FROM documents
    ),
    s AS (
      SELECT source,
             CASE WHEN u32 < CAST(floor(0.1 * 4294967296.0) AS BIGINT) THEN 'test'
                  WHEN u32 < CAST(floor(0.2 * 4294967296.0) AS BIGINT) THEN 'val'
                  ELSE 'train' END AS split
      FROM h
    )
    SELECT source, split, count(*) AS n_docs
    FROM s GROUP BY source, split
    """,
    survey="deterministic train/val/test split (hash thresholds, growth-stable)",
    tags=("pipeline",),
)
def q_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10/10/80 test/val/train split via md5-u32 thresholds — zero
    shuffles for the assignment itself (pure pushed-down projection);
    adding documents never reassigns an existing key. Emits per
    (source, split) counts (operators/corpus.py::split_assign)."""
    t = load_tables(spark, sf_dir)
    out = C.split_assign(
        t["documents"].select("doc_id", "source"),
        key_col="doc_id", val_frac=0.1, test_frac=0.1,
    )
    return out.groupBy("source", "split").agg(F.count("*").alias("n_docs"))


@query(
    "pipe_incremental_dedup",
    oracle="""
    WITH corpus AS (
      SELECT md5(text) AS h FROM documents WHERE source <> 'src1'
    ),
    batch AS (
      SELECT doc_id, md5(text) AS h,
             row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      FROM documents WHERE source = 'src1'
    )
    SELECT b.doc_id, b.h
    FROM batch b
    WHERE b.rn = 1
      AND NOT EXISTS (SELECT 1 FROM corpus c WHERE c.h = b.h)
    """,
    survey="incremental-batch dedup vs existing corpus (anti-join on content hash)",
    tags=("pipeline",),
)
def q_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingesting a new shard (src1) into an existing corpus: drop batch
    docs whose content hash already exists in the corpus (anti-join on
    md5 — at scale the 'seen' side is a hash-only table, a fraction of
    corpus bytes) and self-dedup the batch (first doc_id wins). The
    incremental form of dedup_exact: only the NEW batch is scanned +
    shuffled; the corpus contributes a hash list."""
    t = load_tables(spark, sf_dir)
    d = t["documents"]
    from pyspark.sql import Window as W

    corpus_hashes = (
        d.filter(F.col("source") != "src1").select(F.md5("text").alias("h"))
    )
    batch = d.filter(F.col("source") == "src1").select(
        "doc_id", F.md5("text").alias("h")
    )
    first = W.partitionBy("h").orderBy("doc_id")
    batch1 = (
        batch.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return batch1.join(corpus_hashes, "h", "left_anti").select("doc_id", "h")


@query(
    "pipe_reservoir_topk",
    oracle="""
    WITH r AS (
      SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h,
             row_number() OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents
    )
    SELECT doc_id, source, rn AS sample_rank FROM r WHERE rn <= 5
    """,
    survey="deterministic without-replacement sample: k smallest hashes per stratum",
    tags=("pipeline",),
)
def q_reservoir_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k uniform sample per source WITHOUT replacement: keep the
    k docs with the smallest md5(doc_id) per stratum — the deterministic
    equivalent of a distributed reservoir (rank by hash = random order,
    but reproducible and engine-portable). One window shuffle on the
    stratum; WindowGroupLimit prunes rank > k map-side, so the exchange
    carries ~k rows per stratum per task, not the corpus."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    w = W.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        t["documents"]
        .select("doc_id", "source")
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= 5)
    )


@query(
    "pipe_domain_quota",
    oracle="""
    SELECT doc_id, source, n_chars, domain_rank
    FROM (
      SELECT doc_id, source, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS domain_rank
      FROM documents
    )
    WHERE domain_rank <= 40
    """,
    survey="corpus curation: per-domain document caps / source balancing (north star)",
    tags=("pipeline",),
)
def q_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap every source's contribution at 40 documents, keeping the
    longest (ties by doc_id) — one domain-key shuffle + bounded per-domain
    window, no global sort (operators/corpus.py::domain_quota)."""
    t = load_tables(spark, sf_dir)
    return C.domain_quota(
        t["documents"], quota=40, domain_col="source",
        order_col="n_chars", id_col="doc_id",
    ).select("doc_id", "source", "n_chars", "domain_rank")


@query(
    "vec_pq_codes",
    oracle="""
    WITH d AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    g AS (SELECT min(list_min(e)) AS gmn, max(list_max(e)) AS gmx FROM d),
    c AS (
      SELECT vec_id,
             CASE WHEN gmx > gmn
                  THEN list_transform(e, x -> least(
                         CAST(floor((x - gmn) * 255.0 / (gmx - gmn)) AS BIGINT),
                         CAST(255 AS BIGINT)))
                  ELSE list_transform(e, x -> CAST(0 AS BIGINT))
             END AS codes
      FROM d, g
    ),
    seeds AS (
      SELECT codes AS cent,
             row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cid
      FROM c
      QUALIFY row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) <= 16
    ),
    sub AS (
      SELECT v.vec_id, j.j AS subspace, s.cid,
             list_reduce(list_transform(generate_series(1, len(v.codes) // 4),
               i -> (v.codes[j.j * (len(v.codes) // 4) + i]
                     - s.cent[j.j * (len(v.codes) // 4) + i])
                  * (v.codes[j.j * (len(v.codes) // 4) + i]
                     - s.cent[j.j * (len(v.codes) // 4) + i])),
               (x, y) -> x + y) AS dist
      FROM c v, seeds s, (SELECT unnest(generate_series(0, 3)) AS j) j
    )
    SELECT vec_id, CAST(subspace AS INT) AS subspace, CAST(cid AS INT) AS code, dist
    FROM (
      SELECT vec_id, subspace, cid, dist,
             row_number() OVER (PARTITION BY vec_id, subspace
                                ORDER BY dist, cid) AS rn
      FROM sub
    )
    WHERE rn = 1
    """,
    survey="product quantization codes (IVF-PQ building block) over global q8 — exact (north star)",
    tags=("pipeline",),
)
def q_vec_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-encode the embedding corpus: m=4 subspaces × k=16 hash-seeded
    centroids over corpus-global int8 codes; broadcast codebook,
    zero-shuffle argmin assignment (operators/vectors.py::pq_codes)."""
    t = load_tables(spark, sf_dir)
    out = V.pq_codes(t["embeddings"], m=4, k=16)
    return out.select(
        "vec_id",
        F.col("subspace").cast("int").alias("subspace"),
        F.col("code").cast("int").alias("code"),
        "dist",
    )


@query(
    "pipe_temperature_weights",
    oracle="""
    WITH c AS (
      SELECT source AS domain, count(*) AS n_docs
      FROM documents GROUP BY source
    ),
    w AS (
      SELECT domain, n_docs, sqrt(CAST(n_docs AS DOUBLE)) AS weight FROM c
    ),
    t AS (
      SELECT list_reduce(
               [CAST(0.0 AS DOUBLE)]
                 || list_transform(array_agg(weight ORDER BY domain),
                                   x -> x),
               (a, b) -> a + b) AS total
      FROM w
    )
    SELECT w.domain, w.n_docs, w.weight, w.weight / t.total AS share
    FROM w, t
    """,
    survey=(
        "corpus curation: temperature-based domain-mixing weights "
        "(n^alpha up-sampling of small domains, pinned-order normalize) "
        "(north star)"
    ),
    tags=("pipeline",),
)
def q_pipe_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source sampling shares at temperature α=½ — the mixture table
    a pretraining data loader consumes. sqrt-composed weights and a
    pinned-order share denominator keep every double bit-exact
    (operators/corpus.py::temperature_weights)."""
    from ram_datapipeline_spark.operators.corpus import temperature_weights

    t = load_tables(spark, sf_dir)
    return temperature_weights(t["documents"], domain_col="source")


def _bpe_oracle_sql(n_merges: int = 6) -> str:
    """DuckDB replay of bpe_learn as chained materialized CTE rounds
    (the _crp_grid_oracle_sql recipe applied to tokenizer training).
    The greedy left-to-right non-overlapping merge is replayed on a
    space-separated symbol string: double every separator, substring-
    replace ' lhs  rhs ' -> ' merged ' (left-to-right non-overlapping is
    exactly replace()'s semantics once separators can't be shared), then
    collapse the doubles. Verified equivalent to the engine's array fold
    by the cross-engine hash and tests/test_corpus.py's independent
    pure-Python trainer."""
    parts = [
        """
    WITH w0 AS MATERIALIZED (
      SELECT w, count(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w
    ),
    v0 AS MATERIALIZED (
      SELECT array_to_string(string_split(w, ''), ' ') || ' </w>' AS s, freq
      FROM w0
    )"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"v{i - 1}"
        parts.append(
            f""",
    p{i} AS MATERIALIZED (
      SELECT sy[j] AS lhs, sy[j + 1] AS rhs,
             CAST(sum(freq) AS BIGINT) AS pair_count
      FROM (SELECT string_split(s, ' ') AS sy, freq FROM {prev}),
           unnest(generate_series(1, len(sy) - 1)) AS t(j)
      GROUP BY 1, 2
    ),
    b{i} AS MATERIALIZED (
      SELECT lhs, rhs, lhs || rhs AS merged, pair_count
      FROM p{i} ORDER BY pair_count DESC, lhs, rhs LIMIT 1
    ),
    v{i} AS MATERIALIZED (
      SELECT trim(replace(replace(replace(
               '  ' || replace(s, ' ', '  ') || '  ',
               ' ' || (SELECT lhs FROM b{i}) || '  ' ||
                 (SELECT rhs FROM b{i}) || ' ',
               ' ' || (SELECT merged FROM b{i}) || ' '),
             '  ', ' '), '  ', ' ')) AS s, freq
      FROM {prev}
    )"""
        )
    selects = "\n    UNION ALL ".join(
        f"SELECT {i} AS step, lhs, rhs, merged, pair_count FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return "".join(parts) + "\n    " + selects


def _bpe_segment_oracle_sql(n_merges: int = 6) -> str:
    """DuckDB replay of learn→segment END TO END: the sequential-oracle
    CTE chain (v/b rounds) learns the merge table, then every document's
    words replay the same ``n_merges`` greedy merges via the
    doubled-separator replace trick, and the output is the per-document
    token accounting (n_words, n_tokens) a tokenized-corpus manifest
    carries. LEFT JOIN from documents so zero-word docs keep a row."""
    prefix = _bpe_oracle_sql(n_merges)
    # reuse the learn chain's WITH body; strip its final SELECT..UNION
    cte_body = prefix[: prefix.rindex("\n    SELECT 1 AS step")]
    parts = [
        cte_body,
        """,
    dw AS MATERIALIZED (
      SELECT doc_id, w FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w
        FROM documents)
      WHERE w <> ''
    ),
    sw0 AS MATERIALIZED (
      SELECT doc_id,
             array_to_string(string_split(w, ''), ' ') || ' </w>' AS s
      FROM dw
    )""",
    ]
    for i in range(1, n_merges + 1):
        parts.append(
            f""",
    sw{i} AS MATERIALIZED (
      SELECT doc_id, trim(replace(replace(replace(
               '  ' || replace(s, ' ', '  ') || '  ',
               ' ' || (SELECT lhs FROM b{i}) || '  ' ||
                 (SELECT rhs FROM b{i}) || ' ',
               ' ' || (SELECT merged FROM b{i}) || ' '),
             '  ', ' '), '  ', ' ')) AS s
      FROM sw{i - 1}
    )"""
        )
    parts.append(
        f"""
    SELECT d.doc_id,
           CAST(coalesce(a.n_words, 0) AS BIGINT) AS n_words,
           CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens
    FROM documents d LEFT JOIN (
      SELECT doc_id, count(*) AS n_words,
             sum(len(string_split(s, ' '))) AS n_tokens
      FROM sw{n_merges} GROUP BY doc_id) a USING (doc_id)
    """
    )
    return "".join(parts)


def _bpe_batched_oracle_sql(n_merges: int = 64, window: int = 192) -> str:
    """DuckDB replay of bpe_learn(mode="batched") — the parallel-BPE
    scale path. Per round: pair counts → ranked window → a RECURSIVE
    rank-by-rank scan admitting each pair iff its {lhs, rhs, merged}
    symbols are disjoint from every already-admitted pair's (exactly
    the engine's greedy admission), cap at the merges still needed
    (cumulative count carried in a chained c-CTE), then apply the whole
    batch with ONE ``list_reduce`` over the doubled-separator string
    (the sequential oracle's replace trick; non-interacting merges
    commute, so the fold order is immaterial — it still matches the
    engine's rank order exactly). ``n_merges`` chained rounds are
    generated — an upper bound, since every round admits at least the
    top-ranked pair; completed rounds admit nothing and copy the
    vocabulary through."""
    parts = [
        """
    WITH RECURSIVE w0 AS MATERIALIZED (
      SELECT w, count(*) AS freq FROM (
        SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      WHERE w <> '' GROUP BY w
    ),
    c0 AS (SELECT 0 AS cnt),
    v0 AS MATERIALIZED (
      SELECT array_to_string(string_split(w, ''), ' ') || ' </w>' AS s, freq
      FROM w0
    )"""
    ]
    for i in range(1, n_merges + 1):
        prev = f"v{i - 1}"
        parts.append(
            f""",
    p{i} AS MATERIALIZED (
      SELECT sy[j] AS lhs, sy[j + 1] AS rhs,
             CAST(sum(freq) AS BIGINT) AS pair_count
      FROM (SELECT string_split(s, ' ') AS sy, freq FROM {prev}),
           unnest(generate_series(1, len(sy) - 1)) AS t(j)
      GROUP BY 1, 2
    ),
    w{i} AS MATERIALIZED (
      SELECT lhs, rhs, lhs || rhs AS merged, pair_count,
             row_number() OVER (ORDER BY pair_count DESC, lhs, rhs) AS rnk
      FROM p{i} ORDER BY pair_count DESC, lhs, rhs LIMIT {window}
    ),
    s{i} AS (
      SELECT 0 AS rnk, CAST([] AS VARCHAR[]) AS used,
             CAST(NULL AS VARCHAR) AS lhs, CAST(NULL AS VARCHAR) AS rhs,
             CAST(NULL AS VARCHAR) AS merged, CAST(NULL AS BIGINT) AS pair_count
      UNION ALL
      SELECT w.rnk,
             CASE WHEN list_contains(s.used, w.lhs)
                    OR list_contains(s.used, w.rhs)
                    OR list_contains(s.used, w.merged)
                  THEN s.used
                  ELSE list_concat(s.used, [w.lhs, w.rhs, w.merged]) END,
             CASE WHEN list_contains(s.used, w.lhs)
                    OR list_contains(s.used, w.rhs)
                    OR list_contains(s.used, w.merged)
                  THEN NULL ELSE w.lhs END,
             CASE WHEN list_contains(s.used, w.lhs)
                    OR list_contains(s.used, w.rhs)
                    OR list_contains(s.used, w.merged)
                  THEN NULL ELSE w.rhs END,
             CASE WHEN list_contains(s.used, w.lhs)
                    OR list_contains(s.used, w.rhs)
                    OR list_contains(s.used, w.merged)
                  THEN NULL ELSE w.merged END,
             w.pair_count
      FROM s{i} s JOIN w{i} w ON w.rnk = s.rnk + 1
    ),
    b{i} AS MATERIALIZED (
      SELECT lhs, rhs, merged, pair_count,
             row_number() OVER (ORDER BY rnk) AS adn
      FROM s{i} WHERE lhs IS NOT NULL
      QUALIFY adn <= {n_merges} - (SELECT cnt FROM c{i - 1})
    ),
    c{i} AS MATERIALIZED (
      SELECT (SELECT cnt FROM c{i - 1})
             + (SELECT count(*) FROM b{i}) AS cnt
    ),
    v{i} AS MATERIALIZED (
      SELECT trim(replace(replace(
               list_reduce(
                 list_prepend('  ' || replace(s, ' ', '  ') || '  ',
                   coalesce((SELECT list(lhs || chr(1) || rhs || chr(1)
                                         || merged ORDER BY adn)
                             FROM b{i}),
                            CAST([] AS VARCHAR[]))),
                 (acc, x) -> replace(acc,
                   ' ' || string_split(x, chr(1))[1] || '  '
                       || string_split(x, chr(1))[2] || ' ',
                   ' ' || string_split(x, chr(1))[3] || ' ')),
             '  ', ' '), '  ', ' ')) AS s, freq
      FROM {prev}
    )"""
        )
    selects = "\n    UNION ALL ".join(
        f"SELECT CAST((SELECT cnt FROM c{i - 1}) + adn AS INT) AS step, "
        f"lhs, rhs, merged, pair_count FROM b{i}"
        for i in range(1, n_merges + 1)
    )
    return "".join(parts) + "\n    " + selects


@query(
    "pipe_bpe_merges",
    oracle=_bpe_oracle_sql(6),
    survey=(
        "corpus curation: BPE tokenizer-vocabulary learning (Sennrich "
        "ACL'16, vocab+frequency formulation — ONE corpus pass, then "
        "vocabulary-sized merge rounds) (north star)"
    ),
    tags=("pipeline",),
)
def q_pipe_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 6 BPE merges learned from the documents corpus: the merge
    table (step, lhs, rhs, merged, pair_count) a subword tokenizer
    ships. Corpus touched once (word count); every round's pair count,
    deterministic argmax (count DESC, lhs, rhs), and greedy left-to-
    right rewrite happen on the vocabulary-with-frequency table
    (operators/corpus.py::bpe_learn)."""
    t = load_tables(spark, sf_dir)
    return C.bpe_learn(t["documents"], n_merges=6)


@query(
    "pipe_bpe_merges_batched",
    oracle=_bpe_batched_oracle_sql(64, 192),
    survey=(
        "corpus curation: BATCHED BPE vocabulary learning (VERDICT r5 "
        "#3 — parallel-BPE admission of pairwise-non-interacting merges "
        "per round, 64 merges in a handful of Spark rounds; oracle "
        "replays the recursive admission scan + commuting batch "
        "rewrite) (north star)"
    ),
    tags=("pipeline",),
)
def q_pipe_bpe_merges_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64 BPE merges learned in batched mode: each round admits the
    top-ranked pairwise-non-interacting merges (greedy scan, symbols
    disjoint from every already-admitted pair) and rewrites the
    vocabulary ONCE with the whole commuting batch — the tokenizer-
    training scale path (operators/corpus.py::bpe_learn). The DuckDB
    oracle replays pair ranking, the recursive admission scan, the
    cumulative cap, and the batch rewrite, round for round."""
    t = load_tables(spark, sf_dir)
    return C.bpe_learn(t["documents"], n_merges=64, mode="batched")


@query(
    "pipe_bpe_segment_tokens",
    oracle=_bpe_segment_oracle_sql(6),
    survey=(
        "corpus curation: BPE learn → segment END TO END — the learned "
        "merge table applied back to the corpus, per-document token "
        "accounting (the tokenized-corpus manifest) (north star)"
    ),
    tags=("pipeline",),
)
def q_pipe_bpe_segment_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn 6 merges, segment every document with them (constant-depth
    literal-array fold, zero shuffles), and report (doc_id, n_words,
    n_tokens) — the manifest row a tokenized corpus ships. Gates the
    learn→segment ROUND TRIP in the hard signal: the oracle re-learns
    the merges with the chained-CTE replay and re-segments every word
    with the doubled-separator replace, so a single hash covers trainer
    AND tokenizer."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"]
    merges = [
        (r["lhs"], r["rhs"])
        for r in C.bpe_learn(docs, n_merges=6).orderBy("step").collect()
    ]
    seg = C.bpe_segment(docs, merges)
    return seg.select(
        "doc_id",
        F.size(F.expr("filter(split(text, ' '), w -> w <> '')"))
        .cast("long")
        .alias("n_words"),
        F.size("bpe_tokens").cast("long").alias("n_tokens"),
    )


@query(
    "pipe_dq_checks",
    oracle="""
    WITH n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM orders),
    rows_out AS (
      SELECT 'completeness_o_custkey' AS check_name,
             CAST(count(o_custkey) AS DOUBLE) / (SELECT n FROM n) AS metric,
             CAST(1.0 AS DOUBLE) AS threshold
      FROM orders
      UNION ALL
      SELECT 'uniqueness_o_orderkey',
             CAST(count(DISTINCT o_orderkey) AS DOUBLE) / (SELECT n FROM n),
             CAST(1.0 AS DOUBLE)
      FROM orders
      UNION ALL
      SELECT 'uniqueness_o_custkey',
             CAST(count(DISTINCT o_custkey) AS DOUBLE) / (SELECT n FROM n),
             CAST(1.0 AS DOUBLE)
      FROM orders
      UNION ALL
      SELECT 'min_bound_o_totalprice',
             CAST(count(CASE WHEN o_totalprice >= 0.0 THEN 1 END) AS DOUBLE)
               / (SELECT n FROM n),
             CAST(1.0 AS DOUBLE)
      FROM orders
      UNION ALL
      SELECT 'referential_o_custkey',
             CAST((SELECT count(*) FROM orders o
                   WHERE o.o_custkey IN (SELECT c_custkey FROM customer))
                  AS DOUBLE) / (SELECT n FROM n),
             CAST(1.0 AS DOUBLE)
    )
    SELECT check_name, metric, threshold, metric >= threshold AS passed
    FROM rows_out
    """,
    survey=(
        "declarative data-quality check suite (Deequ-style: "
        "completeness / uniqueness / bounds / referential integrity, "
        "ONE aggregation pass + per-FK semi-join counts) (north star)"
    ),
    tags=("pipeline",),
)
def q_pipe_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Validation report over orders: key completeness and uniqueness,
    price lower bound, and the orders→customer foreign key — one row
    per check with (metric, threshold, passed). uniqueness_o_custkey
    deliberately carries threshold 1.0 and FAILS (customers repeat):
    the report shape must surface red checks, not only green ones
    (operators/quality.py::dq_checks)."""
    from ram_datapipeline_spark.operators.quality import (
        completeness,
        dq_checks,
        min_bound,
        referential,
        uniqueness,
    )

    t = load_tables(spark, sf_dir)
    return dq_checks(
        t["orders"],
        [
            completeness("o_custkey"),
            uniqueness("o_orderkey"),
            uniqueness("o_custkey"),
            min_bound("o_totalprice", 0.0),
            referential("o_custkey", t["customer"], "c_custkey"),
        ],
    )


@query(
    "pipe_winsorize_caps",
    oracle="""
    WITH r AS (
      SELECT l_returnflag AS grp, l_extendedprice AS v,
             row_number() OVER (PARTITION BY l_returnflag
                                ORDER BY l_extendedprice) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem WHERE l_extendedprice IS NOT NULL
    ),
    k AS (
      SELECT *, (5 * n + 99) // 100 AS k_lo, (95 * n + 99) // 100 AS k_hi
      FROM r
    ),
    caps AS (
      SELECT grp, max(n) AS n,
             max(CASE WHEN rn = k_lo THEN v END) AS lo_cap,
             max(CASE WHEN rn = k_hi THEN v END) AS hi_cap
      FROM k GROUP BY grp
    )
    SELECT k.grp, CAST(max(caps.n) AS BIGINT) AS n,
           max(caps.lo_cap) AS lo_cap, max(caps.hi_cap) AS hi_cap,
           CAST(count(CASE WHEN k.v < caps.lo_cap THEN 1 END) AS BIGINT)
             AS n_below,
           CAST(count(CASE WHEN k.v > caps.hi_cap THEN 1 END) AS BIGINT)
             AS n_above
    FROM k JOIN caps ON k.grp = caps.grp
    GROUP BY k.grp
    """,
    survey=(
        "per-group winsorization caps from EXACT order statistics "
        "(ceil(p·n) ranks, no interpolation, no libm) — the outlier-"
        "capping pass of a feature pipeline (north star)"
    ),
    tags=("pipeline", "quality"),
)
def q_pipe_winsorize_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5/P95 winsorization caps for extended price per return flag:
    exact rank-based caps (ONE corpus exchange — the per-group sort
    window; the cap reduction is group-sized and rejoins broadcast),
    plus how many rows a clamp would touch on each side
    (operators/quality.py::winsorize_caps)."""
    from ram_datapipeline_spark.operators.quality import winsorize_caps

    t = load_tables(spark, sf_dir)
    li = t["lineitem"].select(
        F.col("l_returnflag").alias("grp"),
        F.col("l_extendedprice").alias("v"),
    )
    return winsorize_caps(li, "grp", "v", 5, 95, 100)


@query(
    "pipe_token_budget_select",
    oracle="""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, n_tokens,
             CAST(sum(n_tokens) OVER (
               PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM t
    )
    SELECT doc_id, source, n_tokens, cum_tokens FROM c
    WHERE cum_tokens <= 800 + 400 * (CAST(substr(source, 4) AS INT) % 5)
    """,
    survey=(
        "corpus curation: mixture realization under per-domain TOKEN "
        "budgets — hash-ordered prefix selection with an integer "
        "running total (the step that turns temperature_weights shares "
        "into an actual corpus) (north star)"
    ),
    tags=("pipeline",),
)
def q_pipe_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill each source's token budget (800 + 400·(src#%5)) with the
    md5-hash-ordered prefix of its documents — deterministic, unbiased,
    engine-replayable; the kept set never changes when the corpus grows
    (hash order is stable). One per-domain window exchange
    (operators/corpus.py::token_budget_select)."""
    t = load_tables(spark, sf_dir)
    docs = t["documents"].select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    budgets = {f"src{i}": 800 + 400 * (i % 5) for i in range(20)}
    return C.token_budget_select(docs, budgets)


def _zorder_oracle() -> str:
    from ram_datapipeline_spark.operators.layout import morton_key_sql

    z = morton_key_sql(["x", "y"], bits=10)
    return f"""
    WITH pts AS (
      SELECT event_id % 1024 AS x, user_id % 1024 AS y FROM events
    ),
    keyed AS (SELECT x, y, {z} AS z FROM pts)
    SELECT z >> 14 AS bucket, count(*) AS n,
           min(z) AS min_z, max(z) AS max_z,
           min(x) AS min_x, max(x) AS max_x,
           min(y) AS min_y, max(y) AS max_y
    FROM keyed GROUP BY 1
    """


@query(
    "pipe_zorder_layout",
    oracle=_zorder_oracle(),
    survey=(
        "Z-order (Morton) multi-dimensional clustering: bit-interleaved "
        "sort key + range layout, the scan-pruning write path (north "
        "star — data layout at 100 TB)"
    ),
    tags=("pipeline", "layout"),
)
def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events keyed on a 2-D Morton curve (x = event_id mod 1024,
    y = user_id mod 1024, 10 bits each) and summarized per top-6-bit
    z-bucket — the zone-map view a writer would persist. The locality
    the layout exists for is VISIBLE in the result: every bucket's
    (min_x..max_x) and (min_y..max_y) each span ≤ 128, i.e. a 2-D range
    predicate on the originals touches only the buckets its rectangle
    overlaps. The key is pure codegen integer arithmetic (no UDF), and
    the physical write path (repartitionByRange + sortWithinPartitions,
    cluster_by_zorder) is asserted on plan shape + partition-range
    disjointness in tests/test_layout.py."""
    from ram_datapipeline_spark.operators.layout import morton_key

    t = load_tables(spark, sf_dir)
    pts = t["events"].select(
        (F.col("event_id") % 1024).alias("x"),
        (F.col("user_id") % 1024).alias("y"),
    )
    keyed = pts.withColumn(
        "z", morton_key([F.col("x"), F.col("y")], bits=10)
    )
    return keyed.groupBy(
        F.shiftright(F.col("z"), 14).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("z").alias("min_z"), F.max("z").alias("max_z"),
        F.min("x").alias("min_x"), F.max("x").alias("max_x"),
        F.min("y").alias("min_y"), F.max("y").alias("max_y"),
    )


def _profile_oracle() -> str:
    cols = {
        "o_orderkey": "CAST(o_orderkey AS DOUBLE)",
        "o_custkey": "CAST(o_custkey AS DOUBLE)",
        "o_orderstatus": "CAST(NULL AS DOUBLE)",
        "o_totalprice": "o_totalprice",
        "o_orderdate": "CAST(epoch_us(o_orderdate) AS DOUBLE)",
        "o_orderpriority": "CAST(NULL AS DOUBLE)",
    }
    parts = [
        f"""SELECT '{c}' AS col_name, count(*) AS n_rows,
                   count(*) - count({c}) AS n_nulls,
                   count(DISTINCT {c}) AS n_distinct,
                   min({e}) AS min_num, max({e}) AS max_num
            FROM orders"""
        for c, e in cols.items()
    ]
    return " UNION ALL ".join(parts)


@query(
    "pipe_profile_table",
    oracle=_profile_oracle(),
    survey=(
        "single-scan table profiling (ANALYZE analog): per-column "
        "null/distinct/bounds report folded into ONE aggregation "
        "(north star — the first pass any 100 TB ingest runs)"
    ),
    tags=("pipeline", "quality"),
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of orders — null counts, exact distinct counts,
    numeric/temporal bounds — in one scan and one exchange
    (operators/quality.py::profile_table); timestamps surface as µs
    doubles so bounds stay engine-exact. The oracle recomputes each
    column independently; equality pins the fold."""
    from ram_datapipeline_spark.operators.quality import profile_table

    t = load_tables(spark, sf_dir)
    o = t["orders"]
    return profile_table(
        o, distinct_mode="exact", numeric_as={
            # fixture vintage surfaces o_orderdate as TIMESTAMP_NTZ;
            # under the catalog's pinned UTC session the cast keeps the
            # wall clock, so unix_micros is the DuckDB epoch_us
            "o_orderdate": F.unix_micros(
                F.col("o_orderdate").cast("timestamp")
            ).cast("double")
        }
    )


def _kmv_u_int_sql(col: str) -> str:
    """The integer-column Weyl/LCG draw profile_table's kmv mode uses —
    pure BIGINT arithmetic, bit-identical in any engine."""
    return (
        f"((CAST({col} AS BIGINT) % 2147483648 + 2147483648) "
        f"% 2147483648 * 1103515245 + 12345) % 2147483648 "
        "/ 2147483648.0"
    )


def _profile_kmv_oracle(k: int = 64) -> str:
    from ram_datapipeline_spark.suite.analytic_queries import _kmv_u_sql

    # (numeric min/max expr, u-draw expr) per column: integer columns
    # take the arithmetic LCG draw, string columns the md5 draw — the
    # same per-type split the engine makes. The replay is UNfiltered:
    # the engine's threshold prefilter is certified to change nothing.
    cols = {
        "o_orderkey": ("CAST(o_orderkey AS DOUBLE)", _kmv_u_int_sql("o_orderkey")),
        "o_custkey": ("CAST(o_custkey AS DOUBLE)", _kmv_u_int_sql("o_custkey")),
        "o_orderstatus": ("CAST(NULL AS DOUBLE)", _kmv_u_sql("o_orderstatus")),
        "o_orderpriority": (
            "CAST(NULL AS DOUBLE)", _kmv_u_sql("o_orderpriority")
        ),
        "o_orderdate_us": (
            "CAST(o_orderdate_us AS DOUBLE)", _kmv_u_int_sql("o_orderdate_us")
        ),
    }
    parts = [
        f"""SELECT '{c}' AS col_name, count(*) AS n_rows,
                   count(*) - count({c}) AS n_nulls,
                   (SELECT CASE WHEN count(*) < {k}
                                THEN CAST(count(*) AS DOUBLE)
                                ELSE {k - 1} / max(u) END
                    FROM (SELECT u FROM (
                            SELECT DISTINCT {u_sql} AS u
                            FROM o2 WHERE {c} IS NOT NULL)
                          ORDER BY u LIMIT {k})) AS n_distinct,
                   min({e}) AS min_num, max({e}) AS max_num
            FROM o2"""
        for c, (e, u_sql) in cols.items()
    ]
    body = " UNION ALL ".join(parts)
    return f"""
    WITH o2 AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
             epoch_us(o_orderdate) AS o_orderdate_us
      FROM orders
    )
    {body}
    """


@query(
    "pipe_profile_table_kmv",
    oracle=_profile_kmv_oracle(64),
    survey=(
        "KMV-sketched table profile — the at-scale default profile_table "
        "path (VERDICT r7 #2: the exact count-distinct expand read 26.9x "
        "at the 64x probe; the sketch branch carries k rows per column "
        "across its final exchange instead)"
    ),
    tags=("pipeline", "quality", "sketch"),
)
def q_profile_table_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile of orders with ``distinct_mode="kmv"`` (k=64) —
    the branch ``distinct_mode="auto"`` selects above the 1 GiB plan
    size threshold. KMV's randomness IS the md5 hash order, so DuckDB
    replays every per-column estimate bit-for-bit: high-cardinality
    columns (orderkey/custkey) exercise the (k-1)/kth_u branch,
    low-cardinality ones (orderstatus/orderpriority) stay exact by
    construction. Columns are pre-cast to int/string so the hash input
    string is engine-identical (double formatting is the one cast with
    cross-engine drift risk)."""
    from ram_datapipeline_spark.operators.quality import profile_table

    t = load_tables(spark, sf_dir)
    o2 = t["orders"].select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority",
        F.unix_micros(F.col("o_orderdate").cast("timestamp"))
        .alias("o_orderdate_us"),
    )
    return profile_table(o2, distinct_mode="kmv", kmv_k=64)


@query(
    "pipe_compaction_plan",
    oracle="""
    WITH parts AS (
      SELECT date_trunc('hour', ts) AS part_hour,
             CAST(sum(length(props) + 64) AS BIGINT) AS part_bytes
      FROM events GROUP BY 1
    ),
    planned AS (
      SELECT part_hour, part_bytes,
             CAST(floor(coalesce(
               sum(part_bytes) OVER (ORDER BY part_hour
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING),
               0) / 262144.0) AS BIGINT) AS bin
      FROM parts
    )
    SELECT bin, count(*) AS n_parts,
           CAST(sum(part_bytes) AS BIGINT) AS total_bytes,
           min(part_hour) AS first_hour, max(part_hour) AS last_hour
    FROM planned GROUP BY bin
    """,
    survey=(
        "small-files compaction planner: metadata-sized sequential "
        "bin fill toward a target output size (north star — the "
        "ingest-side layout chore every 100 TB table runs nightly)"
    ),
    tags=("pipeline", "layout"),
)
def q_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-hour event 'files' (size = Σ props length + fixed row
    overhead) packed into ~256 KiB output bins by the sequential fill
    (operators/layout.py::compaction_bins). The plan is a pure function
    of the parts table, so DuckDB replays it row-for-row; the window
    runs on the metadata table (one row per hour), never the corpus."""
    from ram_datapipeline_spark.operators.layout import compaction_bins

    t = load_tables(spark, sf_dir)
    parts = (
        t["events"]
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("part_hour"))
        .agg(
            F.sum(F.length("props") + F.lit(64)).cast("bigint")
            .alias("part_bytes")
        )
    )
    planned = compaction_bins(
        parts, order_col="part_hour", size_col="part_bytes",
        target_bytes=262144,
    )
    return planned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("part_bytes").cast("bigint").alias("total_bytes"),
        F.min("part_hour").alias("first_hour"),
        F.max("part_hour").alias("last_hour"),
    )


@query(
    "pipe_global_index",
    oracle="""
    SELECT doc_id, n_chars,
           row_number() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS global_idx
    FROM documents
    """,
    survey="distributed total-order row numbering: range exchange + offset "
           "broadcast, no single-partition window (north star)",
    tags=("pipeline", "layout"),
)
def q_pipe_global_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document its exact position in the corpus-wide
    (n_chars DESC, doc_id) order WITHOUT funneling the corpus through
    one task: range-partition on the key, count per partition (a
    metadata collect — one long per partition), then each partition
    numbers itself from its broadcast offset in one Arrow pass
    (operators/layout.py::global_row_index). The oracle IS the
    single-window form — same integers, the plan this operator exists
    to avoid at 100 TB."""
    from ram_datapipeline_spark.operators.layout import global_row_index

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "n_chars")
    return global_row_index(
        docs,
        [F.col("n_chars").desc(), F.col("doc_id")],
        n_partitions=16,
    )


@query(
    "pipe_global_offsets",
    oracle="""
    WITH o AS (
      SELECT doc_id, n_chars,
             CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS tok_offset
      FROM documents
    )
    SELECT doc_id, n_chars, tok_offset,
           tok_offset // 4096 AS seq_id
    FROM o
    """,
    survey="distributed global prefix sum: every document's first-token "
           "offset in the corpus-wide concatenated stream + its "
           "4096-budget training-sequence id, with NO shard key and NO "
           "single-partition window (north star — global sequence "
           "packing addressing)",
    tags=("pipeline", "layout"),
)
def q_pipe_global_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global token offsets by exclusive prefix sum of n_chars in
    doc_id order (operators/layout.py::global_prefix_sum — range
    exchange, one-long-per-partition collect of partition weight sums,
    Arrow accumulation from broadcast bases; the weighted twin of
    pipe_global_index). Unlike pipe_sequence_packing's per-shard
    window, this addresses the WHOLE corpus stream. The oracle IS the
    single-window form — same longs, the plan this operator exists to
    avoid at 100 TB."""
    from ram_datapipeline_spark.operators.layout import global_prefix_sum

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "n_chars")
    out = global_prefix_sum(
        docs, [F.col("doc_id")], "n_chars", n_partitions=16,
        out_col="tok_offset",
    )
    return out.withColumn("seq_id", F.expr("tok_offset div 4096"))


def _rp_oracle(out_dims: int = 4) -> str:
    cols = ",\n           ".join(
        "list_reduce(list_transform(generate_series(1, len(embedding)), "
        "i -> CAST(embedding[i] AS DOUBLE) * "
        f"(CASE WHEN strpos('01234567', substr(md5('{j}_' || "
        "CAST(i - 1 AS VARCHAR)), 1, 1)) > 0 THEN 1.0 ELSE -1.0 END)), "
        f"(a, b) -> a + b) AS p{j}"
        for j in range(out_dims)
    )
    return f"SELECT vec_id, {cols} FROM embeddings"


@query(
    "vec_random_projection",
    oracle=_rp_oracle(4),
    survey="Johnson-Lindenstrauss sign-matrix projection: the coarse "
           "dimensionality-reduction filter ahead of exact ANN (north star)",
    tags=("pipeline", "vectors"),
)
def q_vec_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding to 4 hash-seeded Rademacher coordinates
    (operators/vectors.py::random_projection) — a zero-shuffle codegen
    map; the oracle replays each coordinate as the identical
    generate_series left fold."""
    from ram_datapipeline_spark.operators.vectors import random_projection

    t = load_tables(spark, sf_dir)
    return random_projection(
        t["embeddings"].select("vec_id", "embedding"), out_dims=4
    ).drop("embedding")


@query(
    "pipe_systematic_sample",
    oracle="""
    WITH o AS (
      SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(coalesce(sum(n_chars) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS tok_offset
      FROM documents
    ), t AS (
      SELECT greatest(CAST(sum(n_chars) AS BIGINT) // 32,
                      CAST(1 AS BIGINT)) AS step
      FROM documents
    )
    SELECT doc_id, n_chars, tok_offset,
           CAST(((tok_offset + n_chars) // step)
                - (tok_offset // step) AS BIGINT) AS n_picks
    FROM o, t
    WHERE ((tok_offset + n_chars) // step) - (tok_offset // step) >= 1
    """,
    survey=(
        "weight-proportional systematic sampling on the global weight "
        "line: deterministic, integer-exact alternative to "
        "Efraimidis-Spirtes key sampling — k evenly spaced probes over "
        "the corpus-wide prefix sum, no RNG, no libm, exact "
        "multiplicities (north star — corpus subsetting)"
    ),
    tags=("pipeline", "layout"),
)
def q_pipe_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~32-document weight-proportional sample of the corpus by token
    mass (operators/layout.py::systematic_sample over
    global_prefix_sum): every document owns an interval of the global
    weight line; the ones hit by a multiple of step = total div 32 are
    selected with their exact hit multiplicity. One range exchange +
    a broadcast 1-row total — the oracle replays the line as the
    single global window this operator avoids."""
    from ram_datapipeline_spark.operators.layout import systematic_sample

    t = load_tables(spark, sf_dir)
    docs = t["documents"].select("doc_id", "n_chars")
    return systematic_sample(
        docs, [F.col("doc_id")], "n_chars", k=32, n_partitions=16,
        offset_col="tok_offset",
    )


@query(
    "pipe_corpus_shuffle",
    oracle="""
    SELECT doc_id,
           CAST(row_number() OVER (
             ORDER BY md5('r8:' || CAST(doc_id AS VARCHAR)), doc_id
           ) - 1 AS BIGINT) AS shuffle_pos
    FROM documents
    """,
    survey=(
        "deterministic corpus shuffle: md5-keyed global permutation for "
        "training order — reproducible across runs/engines, assigned by "
        "the distributed two-pass row index, never a single-partition "
        "window (north star — epoch shuffling at 100 TB)"
    ),
    tags=("pipeline", "layout"),
)
def q_pipe_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-order assignment: each document's position in the
    md5('r8:' || doc_id) permutation — the salt re-keys the shuffle per
    epoch without touching data. Order comes from
    layout.global_row_index (one range exchange + one-long-per-
    partition collect); the oracle's single global row_number() is the
    plan this avoids. Hash order is uniform, so range partitions are
    balanced by construction — no skew, no RNG state."""
    from ram_datapipeline_spark.operators.layout import global_row_index

    t = load_tables(spark, sf_dir)
    keyed = t["documents"].select(
        "doc_id",
        F.md5(F.concat(F.lit("r8:"), F.col("doc_id").cast("string"))).alias(
            "_k"
        ),
    )
    return global_row_index(
        keyed, [F.col("_k"), F.col("doc_id")], n_partitions=16,
        idx_col="shuffle_pos",
    ).select("doc_id", "shuffle_pos")


@query(
    "pipe_quantile_normalize",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS n_chars,
             CAST(row_number() OVER (
               PARTITION BY source ORDER BY n_chars, doc_id
             ) AS BIGINT) AS rnk,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS cnt
      FROM documents
    )
    SELECT doc_id, source, n_chars,
           CAST(CASE WHEN cnt > 1
                THEN ((rnk - 1) * 1000000) // (cnt - 1)
                ELSE 0 END AS BIGINT) AS pct_scaled
    FROM ranked
    """,
    survey=(
        "per-source quantile (percentile-rank) normalization of a "
        "quality score: rank-based calibration so thresholds mean the "
        "same thing in every domain — integer-exact scaled ranks, no "
        "interpolation (north star — cross-domain quality gating)"
    ),
    tags=("pipeline", "quality"),
)
def q_pipe_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile rank of document length WITHIN its source, scaled to
    [0, 1e6]: (rank-1)*1e6 div (cnt-1), ties broken by doc_id so the
    assignment is total-ordered and engine-stable. One source-
    partitioned window pass (never single-partition); downstream
    mixture selection can then threshold at the same percentile in
    every domain regardless of its raw length distribution."""
    from pyspark.sql import Window as W

    t = load_tables(spark, sf_dir)
    w = W.partitionBy("source").orderBy("n_chars", "doc_id")
    wc = W.partitionBy("source")
    ranked = t["documents"].select(
        "doc_id",
        "source",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.row_number().over(w).cast("long").alias("_rnk"),
        F.count(F.lit(1)).over(wc).cast("long").alias("_cnt"),
    )
    return ranked.select(
        "doc_id",
        "source",
        "n_chars",
        F.expr(
            "CAST(CASE WHEN _cnt > 1 THEN ((_rnk - 1) * 1000000)"
            " div (_cnt - 1) ELSE CAST(0 AS BIGINT) END AS BIGINT)"
        ).alias("pct_scaled"),
    )


@query(
    "pipe_mixture_epochs",
    oracle="""
    WITH per AS (
      SELECT source AS domain,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT)
               AS avail_tokens,
             CAST(CAST(substr(source, 4) AS INT) % 3 + 1 AS BIGINT) AS w
      FROM documents
      GROUP BY source
    ),
    tot AS (SELECT CAST(sum(w) AS BIGINT) AS sum_w FROM per),
    alloc AS (
      SELECT domain, avail_tokens, w,
             (2000000 * w) // sum_w AS alloc_tokens
      FROM per, tot
    )
    SELECT domain, avail_tokens, w, alloc_tokens,
           CASE WHEN alloc_tokens <= 0 THEN CAST(0 AS BIGINT)
                ELSE (alloc_tokens + avail_tokens - 1) // avail_tokens
           END AS epochs,
           CASE WHEN alloc_tokens <= 0 THEN CAST(0 AS BIGINT)
                ELSE alloc_tokens
                     - ((alloc_tokens + avail_tokens - 1)
                        // avail_tokens - 1) * avail_tokens
           END AS last_epoch_tokens
    FROM alloc
    """,
    survey=(
        "training-mixture epoch planner: integer token budget split by "
        "domain weight, repetition (epochs) + final-pass remainder — "
        "LLM-pipeline, beyond ref"
    ),
    tags=("pipeline",),
)
def q_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many passes over each source a 2M-token budget requires
    under per-source integer weights
    (operators/corpus.py::mixture_epochs): ONE corpus aggregate to the
    domain grain, a 1-row broadcast total, BIGINT DIV throughout —
    the oracle replays the same integers."""
    t = load_tables(spark, sf_dir)
    return C.mixture_epochs(
        t["documents"],
        weight=F.expr("CAST(substring(source, 4, 10) AS INT) % 3 + 1"),
        budget_tokens=2_000_000,
        domain_col="source",
        text_col="text",
    )


@query(
    "pipe_interleave_sources",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source AS domain,
             CAST(row_number() OVER (PARTITION BY source
                                     ORDER BY doc_id) AS BIGINT) AS r,
             CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_d
      FROM documents
    ),
    keyed AS (
      SELECT doc_id, domain, r,
             (r * CAST(1000000000000 AS BIGINT)) // n_d AS vkey
      FROM ranked
    )
    SELECT doc_id, domain, r, vkey,
           CAST(row_number() OVER (ORDER BY vkey, domain, r) - 1
                AS BIGINT) AS train_pos
    FROM keyed
    """,
    survey=(
        "proportional source interleave (stride-scheduling virtual "
        "time) + distributed global position — LLM training-order "
        "primitive, beyond ref"
    ),
    tags=("pipeline",),
)
def q_interleave_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic proportional interleave of the corpus's sources
    (operators/corpus.py::interleave_sources): BIGINT virtual-time keys
    r*scale DIV n_d, global position via global_row_index (range
    exchange + per-partition offsets — no single-partition window; the
    oracle replays it as the one global window)."""
    t = load_tables(spark, sf_dir)
    return C.interleave_sources(
        t["documents"], domain_col="source", id_col="doc_id",
        n_partitions=8,
    )


@query(
    "pipe_length_buckets",
    oracle="""
    WITH sized AS (
      SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
             CAST(CASE WHEN len(string_split(text, ' ')) < 16 THEN 0
                       WHEN len(string_split(text, ' ')) < 32 THEN 1
                       WHEN len(string_split(text, ' ')) < 64 THEN 2
                       WHEN len(string_split(text, ' ')) < 128 THEN 3
                       ELSE 4 END AS BIGINT) AS bucket
      FROM documents
    ),
    batched AS (
      SELECT *, (row_number() OVER (PARTITION BY bucket
                                    ORDER BY n_tokens DESC, doc_id)
                 - 1) // 32 AS batch_id
      FROM sized
    )
    SELECT bucket, CAST(batch_id AS BIGINT) AS batch_id,
           count(*) AS n_docs, max(n_tokens) AS max_len,
           CAST(sum(n_tokens) AS BIGINT) AS sum_len,
           CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT)
             AS padding_waste
    FROM batched GROUP BY bucket, batch_id
    """,
    survey=(
        "length-bucketed batch packing (dynamic-padding batches, "
        "padding-waste accounting) — LLM dataloader prep, beyond ref"
    ),
    tags=("pipeline",),
)
def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cut each token-length bucket into 32-doc batches, longest first
    (operators/corpus.py::length_buckets): CASE-chain bucket edges (no
    libm), one bucket-keyed rank window, per-batch padding waste in
    exact integers."""
    t = load_tables(spark, sf_dir)
    return C.length_buckets(
        t["documents"], batch_size=32, id_col="doc_id", text_col="text",
    )


@query(
    "pipe_tokenizer_fertility",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS n_chars,
           CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_ws,
           CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+')))
                AS BIGINT) AS n_re,
           CAST(CAST(sum(length(text)) AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                    AS DOUBLE) AS chars_per_ws_token,
           CAST(CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+')))
                     AS BIGINT) AS DOUBLE)
             / CAST(CAST(sum(len(string_split(text, ' '))) AS BIGINT)
                    AS DOUBLE) AS fertility
    FROM documents GROUP BY source
    """,
    survey=(
        "tokenizer fertility report per source (chars/token, "
        "subword-per-word ratio — the tokenizer-efficiency metric "
        "multilingual corpus work tracks) — LLM pipeline, beyond ref"
    ),
    tags=("pipeline",),
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source tokenizer efficiency: exact BIGINT char/token sums in
    ONE map-side-combined aggregate; the two ratios are single IEEE
    divisions of exact integers (identical in both engines)."""
    from ram_datapipeline_spark.operators.text_ops import (
        regex_token_count,
        word_count,
    )

    t = load_tables(spark, sf_dir)
    d = t["documents"]
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
        F.sum(word_count(F.col("text"))).cast("long").alias("n_ws"),
        F.sum(regex_token_count(F.col("text"))).cast("long").alias("n_re"),
    )
    return agg.select(
        "*",
        (
            F.col("n_chars").cast("double") / F.col("n_ws").cast("double")
        ).alias("chars_per_ws_token"),
        (
            F.col("n_re").cast("double") / F.col("n_ws").cast("double")
        ).alias("fertility"),
    )


@query(
    "pipe_dup_rate_by_source",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT md5(text)) AS n_unique,
           count(*) - count(DISTINCT md5(text)) AS n_dup_docs,
           CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS dup_rate
    FROM documents GROUP BY source
    """,
    survey=(
        "per-source exact duplication-rate report (corpus-health "
        "metric: docs minus distinct content hashes) — LLM pipeline, "
        "beyond ref"
    ),
    tags=("pipeline",),
)
def q_dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much of each source is exact-duplicate content: one
    aggregate with an md5 distinct-count (at 100 TB swap the distinct
    for the KMV sketch as in profile_table — surface unchanged)."""
    t = load_tables(spark, sf_dir)
    return (
        t["documents"]
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.md5("text")).alias("n_unique"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            (F.col("n_docs") - F.col("n_unique")).alias("n_dup_docs"),
            (
                (F.col("n_docs") - F.col("n_unique")).cast("double")
                / F.col("n_docs").cast("double")
            ).alias("dup_rate"),
        )
    )


@query(
    "pipe_corpus_quality_gate",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source,
             (CAST(len(list_filter(string_split(text, ' '),
                                   t -> t IN ('the', 'a', 'of')))
                   AS BIGINT) * 1000)
               // CAST(len(string_split(text, ' ')) AS BIGINT)
             + (CASE WHEN len(string_split(text, ' '))
                          BETWEEN 20 AND 1000
                     THEN 500 ELSE 0 END) AS q_score
      FROM documents
    ),
    counts AS (
      SELECT source, q_score AS v, count(*) AS c
      FROM scored GROUP BY source, q_score
    ),
    staged AS (
      SELECT source, v,
             sum(c) OVER (PARTITION BY source ORDER BY v) AS cum,
             sum(c) OVER (PARTITION BY source) AS n
      FROM counts
    ),
    cuts AS (
      SELECT source, j, min(v) AS t
      FROM staged CROSS JOIN (SELECT unnest(range(1, 10)) AS j) js
      WHERE 10 * cum >= j * n
      GROUP BY source, j
    ),
    bucketed AS (
      SELECT s.doc_id, s.source, s.q_score,
             1 + (SELECT count(*) FROM cuts c
                  WHERE c.source = s.source AND s.q_score > c.t) AS bucket
      FROM scored s
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN bucket >= 4 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_kept,
           CAST(min(CASE WHEN bucket >= 4 THEN q_score END)
                AS BIGINT) AS kept_score_floor
    FROM bucketed
    GROUP BY source
    """,
    survey=(
        "per-source quantile-normalized quality gate (the corpus "
        "pipeline's normalize_quality path): integer quality score -> "
        "exact per-source decile cutoffs -> keep top deciles; the "
        "surviving raw-score floor SHIFTS per source — LLM pipeline, "
        "beyond ref (VERDICT r8 #6)"
    ),
    tags=("pipeline", "quality"),
)
def q_corpus_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The normalized quality gate assemble_corpus(normalize_quality=
    True) applies, reported at the source grain: every source keeps the
    same top-decile FRACTION while its surviving raw-score floor
    (kept_score_floor) tracks its own score distribution — the
    cross-domain calibration a raw threshold can't give. Plan: one
    score projection, quantile_buckets' one conditional-aggregate
    cutoff pass broadcast back, one final aggregate — no corpus-sized
    exchange beyond the (source, score)-grain count table
    (operators/quality.py::quantile_buckets,
    operators/text_ops.py::quality_score_scaled,
    plans/corpus_pipeline.py::assemble_corpus)."""
    from ram_datapipeline_spark.operators.quality import quantile_buckets
    from ram_datapipeline_spark.operators.text_ops import (
        quality_score_scaled,
    )

    t = load_tables(spark, sf_dir)
    docs = t["documents"].withColumn(
        "q_score", quality_score_scaled(F.col("text"))
    )
    scored = quantile_buckets(
        docs, F.col("q_score"), 10, metric_col="source", out_col="q_bucket"
    )
    return scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("q_bucket") >= 4, 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.min(F.when(F.col("q_bucket") >= 4, F.col("q_score")))
        .alias("kept_score_floor"),
    )


@query(
    "pipe_gopher_rules",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> w <> '')) AS BIGINT) AS n_words,
             CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_word_chars,
             CAST(len(list_filter(string_split(text, ' '),
                                  w -> regexp_matches(w, '[a-zA-Z]')))
                  AS BIGINT) AS n_alpha_words,
             CAST((CASE WHEN list_contains(string_split(text, ' '), 'the') THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(string_split(text, ' '), 'be') THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(string_split(text, ' '), 'to') THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(string_split(text, ' '), 'of') THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(string_split(text, ' '), 'and') THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(string_split(text, ' '), 'that') THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(string_split(text, ' '), 'have') THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(string_split(text, ' '), 'with') THEN 1 ELSE 0 END)
                + (CASE WHEN list_contains(string_split(text, ' '), 'a') THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_stop_hits,
             CAST(length(text) - length(replace(text, '#', ''))
                  + (length(text) - length(replace(text, '...', ''))) // 3
                  AS BIGINT) AS n_symbols
      FROM documents
    ),
    rules AS (
      SELECT doc_id, n_words, n_word_chars, n_alpha_words, n_stop_hits,
             n_symbols,
             (n_words >= 50 AND n_words <= 100000) AS rule_word_count,
             (n_word_chars >= 3 * n_words
              AND n_word_chars <= 10 * n_words) AS rule_mean_word_len,
             (10 * n_alpha_words >= 8 * n_words) AS rule_alpha_ratio,
             (n_stop_hits >= 2) AS rule_stopwords,
             (10 * n_symbols <= n_words) AS rule_symbol_ratio
      FROM base
    )
    SELECT *,
           (rule_word_count AND rule_mean_word_len AND rule_alpha_ratio
            AND rule_stopwords AND rule_symbol_ratio) AS pass_gopher
    FROM rules
    """,
    survey=(
        "Gopher quality-rule battery (Rae et al. 2021 A1.1) per "
        "document: word-count bounds, mean-word-length 3..10, "
        "symbol-to-word <= 0.1, >= 80% alphabetic words, >= 2 stopword "
        "anchors — all integer cross-multiplied, emitted with per-rule "
        "evidence; a pure zero-exchange codegen projection "
        "(beyond-ref corpus-quality family)"
    ),
    tags=("pipeline",),
)
def q_pipe_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher rule breakdown
    (operators/text_ops.py::gopher_rules): one scan, zero exchanges —
    every rule an integer comparison fused into a single projection."""
    from ram_datapipeline_spark.operators.text_ops import gopher_rules

    t = load_tables(spark, sf_dir)
    return gopher_rules(t["documents"])


_VEC_E_CTE = """
v AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings)
"""


def _sign_word_sql(lo: int, hi: int) -> str:
    """Base-2 left fold of sign bits e[lo..hi] — the same
    ``acc·2 + bit`` chain binary_sign_pack builds in Spark."""
    return (
        f"list_reduce(list_transform(generate_series({lo}, {hi}), "
        "i -> CASE WHEN e[i] >= 0 THEN CAST(1 AS BIGINT) "
        "ELSE CAST(0 AS BIGINT) END), (a, b) -> a * 2 + b)"
    )


@query(
    "vec_binary_hamming_topk",
    oracle=f"""
    WITH {_VEC_E_CTE},
    packed AS (
      SELECT vec_id,
             {_sign_word_sql(1, 32)} AS lo,
             {_sign_word_sql(33, 64)} AS hi
      FROM v
    )
    SELECT query_id, neighbor_id, hamming, rk FROM (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             CAST(bit_count(xor(q.lo, c.lo))
                  + bit_count(xor(q.hi, c.hi)) AS BIGINT) AS hamming,
             CAST(row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY bit_count(xor(q.lo, c.lo))
                        + bit_count(xor(q.hi, c.hi)), c.vec_id)
               AS BIGINT) AS rk
      FROM packed q JOIN packed c ON q.vec_id <> c.vec_id
      WHERE q.vec_id < 20
    ) WHERE rk <= 5
    """,
    survey=(
        "1-bit binary embedding search: sign bits packed 64x into two "
        "BIGINT words (base-2 integer fold), exact XOR+popcount "
        "Hamming shortlist — the memory-bandwidth-bound first stage of "
        "binary ANN serving (north star — LLM retrieval, beyond ref)"
    ),
    tags=("similarity", "vectors"),
)
def q_vec_binary_hamming_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming top-5 under sign-bit quantization
    (operators/vectors.py::binary_hamming_topk): packing is a
    zero-shuffle codegen map, queries broadcast, per-row distance is
    two XOR+popcount words — at 100 TB the packed words persist at
    ingest (16 bytes/vector) and the scan never touches the floats."""
    from ram_datapipeline_spark.operators.vectors import binary_hamming_topk

    t = load_tables(spark, sf_dir)
    e = t["embeddings"]
    return binary_hamming_topk(e.where(F.col("vec_id") < 20), e, k=5)


@query(
    "vec_matryoshka_energy",
    oracle=f"""
    WITH {_VEC_E_CTE},
    fullnrm AS (
      SELECT vec_id, e,
             list_reduce(list_transform(e, x -> x * x),
                         (a, b) -> a + b) AS fe
      FROM v
    ),
    ppm AS (
      SELECT vec_id, fe,
             CAST(floor(1000000.0 * list_reduce(
               list_transform(e[1:8], x -> x * x), (a, b) -> a + b) / fe)
               AS BIGINT) AS p8,
             CAST(floor(1000000.0 * list_reduce(
               list_transform(e[1:16], x -> x * x), (a, b) -> a + b) / fe)
               AS BIGINT) AS p16,
             CAST(floor(1000000.0 * list_reduce(
               list_transform(e[1:32], x -> x * x), (a, b) -> a + b) / fe)
               AS BIGINT) AS p32,
             CAST(floor(1000000.0 * list_reduce(
               list_transform(e[1:64], x -> x * x), (a, b) -> a + b) / fe)
               AS BIGINT) AS p64
      FROM fullnrm WHERE fe > 0.0
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(p8) AS BIGINT) AS s8,
             CAST(sum(p16) AS BIGINT) AS s16,
             CAST(sum(p32) AS BIGINT) AS s32,
             CAST(sum(p64) AS BIGINT) AS s64
      FROM ppm
    ),
    long AS (
      SELECT CAST(8 AS BIGINT) AS dim, n AS n_vecs, s8 AS sum_energy_ppm
        FROM agg
      UNION ALL SELECT 16, n, s16 FROM agg
      UNION ALL SELECT 32, n, s32 FROM agg
      UNION ALL SELECT 64, n, s64 FROM agg
    )
    SELECT dim, n_vecs, sum_energy_ppm,
           CAST(sum_energy_ppm // n_vecs AS BIGINT) AS avg_energy_ppm
    FROM long
    """,
    survey=(
        "Matryoshka prefix-energy profile: per candidate truncation "
        "dim, the exact-ppm share of squared L2 mass the prefix holds "
        "(per-row pinned IEEE ratio, BIGINT cross-row mean — no float "
        "accumulation) — the dimension-truncation eval for MRL-style "
        "embedding serving (north star — LLM retrieval, beyond ref)"
    ),
    tags=("vectors",),
)
def q_vec_matryoshka_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Energy retention at prefix dims 8/16/32/64 over the embeddings
    table (operators/vectors.py::matryoshka_energy_profile): one
    zero-shuffle map + one map-side-combined global aggregate."""
    from ram_datapipeline_spark.operators.vectors import (
        matryoshka_energy_profile,
    )

    t = load_tables(spark, sf_dir)
    return matryoshka_energy_profile(t["embeddings"])


@query(
    "pipe_k_anonymity",
    oracle="""
    WITH per AS (
      SELECT c_nationkey, c_mktsegment,
             CAST(count(*) AS BIGINT) AS class_size,
             CAST(count(DISTINCT c_acctbal) AS BIGINT) AS l_diversity
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ),
    flg AS (SELECT *, class_size < 5 AS at_risk FROM per),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_classes,
             CAST(coalesce(sum(CASE WHEN at_risk THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_classes_at_risk,
             CAST(coalesce(sum(CASE WHEN at_risk THEN class_size ELSE 0 END),
                           0) AS BIGINT) AS rows_at_risk
      FROM flg
    )
    SELECT c_nationkey, c_mktsegment, class_size, l_diversity, at_risk,
           n_classes, n_classes_at_risk, rows_at_risk
    FROM flg, tot
    """,
    survey=(
        "k-anonymity / quasi-identifier re-identification audit with "
        "per-class l-diversity — the privacy release gate next to "
        "text_pii_scrub; one corpus aggregate on the QI grain, all "
        "exact integers (north star; VERDICT r11 #5)"
    ),
    tags=("pipeline",),
)
def q_pipe_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Release-gate privacy audit over customer with quasi-identifiers
    (c_nationkey, c_mktsegment) and sensitive attribute c_acctbal
    (operators/quality.py::k_anonymity_audit): every QI equivalence
    class with its size, l-diversity, and below-k flag, plus the global
    class/row risk totals riding every row."""
    from ram_datapipeline_spark.operators.quality import k_anonymity_audit

    t = load_tables(spark, sf_dir)
    return k_anonymity_audit(
        t["customer"],
        ["c_nationkey", "c_mktsegment"],
        k=5,
        sensitive_col="c_acctbal",
    )


_EV_U32_SQL = (
    "list_reduce(list_transform(generate_series(1, 8), "
    "i -> CAST(strpos('0123456789abcdef', "
    "substr(md5(CAST(event_id AS VARCHAR)), i, 1)) - 1 AS BIGINT)), "
    "(a, b) -> a * 16 + b)"
)


@query(
    "pipe_dp_randomized_response",
    oracle=f"""
    WITH base AS (
      SELECT event_type,
             value > 50.0 AS s,
             CASE WHEN {_EV_U32_SQL} % 4 < 3
                  THEN value > 50.0 ELSE NOT (value > 50.0) END AS r
      FROM events
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN r THEN 1 ELSE 0 END) AS BIGINT)
             AS n_reported_true,
           CAST(sum(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS true_count,
           CAST(sum(CASE WHEN r THEN 1 ELSE 0 END) * 4
                - count(*) AS BIGINT) AS est_true_x2
    FROM base GROUP BY event_type
    """,
    survey=(
        "local differential privacy: Warner randomized response per "
        "event row (ε = ln 3 via the md5 coin), exact integer debiased "
        "group estimates — the LDP telemetry mechanism next to the "
        "k-anonymity release audit; zero-shuffle report map + ONE "
        "group aggregate (north star)"
    ),
    tags=("pipeline",),
)
def q_pipe_dp_randomized_response(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε = ln 3 randomized response over events (sensitive bit:
    value > 50), grouped by event_type
    (operators/quality.py::randomized_response_counts): each row
    reports truthfully iff md5-u32(event_id) mod 4 < 3; the group
    estimate 4·n_reported_true − n = 2·t̂ debiases exactly in BIGINT.
    true_count rides along so tests can check estimator calibration —
    a real release would drop it."""
    from ram_datapipeline_spark.operators.quality import (
        randomized_response_counts,
    )

    t = load_tables(spark, sf_dir)
    return randomized_response_counts(
        t["events"],
        ["event_type"],
        F.col("value") > F.lit(50.0),
        "event_id",
    )


@query(
    "pipe_dataset_card",
    oracle="""
    WITH base AS (
      SELECT doc_id, length(text) AS chars,
             len(string_split(text, ' ')) AS tokens,
             md5(text) AS h,
             coalesce(CAST(lang AS VARCHAR), '(null)') AS lang2, source
      FROM documents
    ),
    g AS (
      SELECT CAST(count(*) AS BIGINT) AS n_docs,
             CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
             CAST(sum(chars) AS BIGINT) AS total_chars,
             CAST(sum(tokens) AS BIGINT) AS total_tokens,
             CAST(count(*) - count(DISTINCT h) AS BIGINT) AS exact_dup_docs,
             CAST(sum(CASE WHEN tokens < 20 THEN 1 ELSE 0 END) AS BIGINT)
               AS short,
             quantile_cont(tokens, 0.5) AS p50,
             quantile_cont(tokens, 0.9) AS p90
      FROM base
    )
    SELECT 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM g
    UNION ALL SELECT 'n_sources', CAST(n_sources AS DOUBLE) FROM g
    UNION ALL SELECT 'total_chars', CAST(total_chars AS DOUBLE) FROM g
    UNION ALL SELECT 'total_tokens', CAST(total_tokens AS DOUBLE) FROM g
    UNION ALL SELECT 'exact_dup_docs', CAST(exact_dup_docs AS DOUBLE) FROM g
    UNION ALL SELECT 'short_doc_ppm',
                     CAST(CASE WHEN n_docs = 0 THEN 0
                               ELSE short * 1000000 // n_docs END
                          AS DOUBLE) FROM g
    UNION ALL SELECT 'tokens_p50', CAST(p50 AS DOUBLE) FROM g
    UNION ALL SELECT 'tokens_p90', CAST(p90 AS DOUBLE) FROM g
    UNION ALL
    SELECT concat('lang_', lang2, '_ppm'),
           CAST(CASE WHEN n_docs = 0 THEN 0
                     ELSE cnt * 1000000 // n_docs END AS DOUBLE)
    FROM (SELECT lang2, count(*) AS cnt FROM base GROUP BY lang2), g
    """,
    survey=(
        "release dataset card (Datasheets for Datasets, Gebru et al. "
        "CACM'21): corpus size, token volume, exact-dup rate, short-doc "
        "rate, token percentiles, full language mix — one global "
        "aggregate + one language-grain aggregate, long-format output "
        "(north star)"
    ),
    tags=("pipeline",),
)
def q_pipe_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The summary sheet a corpus release ships with
    (operators/corpus.py::dataset_card over documents): counts, token
    volume and percentiles, exact-duplicate and short-doc rates, and
    per-language ppm shares as (metric, value) rows."""
    from ram_datapipeline_spark.operators.corpus import dataset_card

    t = load_tables(spark, sf_dir)
    return dataset_card(t["documents"])
