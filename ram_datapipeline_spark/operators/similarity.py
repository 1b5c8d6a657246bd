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

from ram_datapipeline_spark.session import ensure_parallelism, local_rows_df


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
    max_rows: int | None = 100_000,
) -> DataFrame:
    """All pairs with cosine ≥ threshold: (vec_a, vec_b, cos). Exact
    brute force — quadratic BY CONSTRUCTION; it exists as the correctness
    baseline the ANN variants (LSH/IVF) are recall-tested against, not as
    a production path.

    ``max_rows`` is the scale fence: the cross join is refused above it
    (count is one cheap job) unless explicitly lifted with
    ``max_rows=None`` — a silent O(n²) on a grown corpus is the failure
    mode this guards against; use ``cosine_topk_lsh`` / ``cosine_topk_ivf``
    there."""
    if max_rows is not None:
        n = df.count()
        if n > max_rows:
            raise ValueError(
                f"cosine_pairs is O(n²) brute force: corpus has {n} rows >"
                f" max_rows={max_rows}. Use the LSH/IVF ANN operators at"
                " this scale, or pass max_rows=None to force."
            )
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


def scaled_cell_count(n: int) -> int:
    """IVF cell count for an ``n``-vector corpus: ⌈√n⌉ (the standard
    balance point — probe cost and cell size both ~√n)."""
    import math

    return max(1, math.ceil(math.sqrt(n)))


def scaled_super_count(n_cells: int) -> int:
    """Supercell count for the two-level coarse quantizer: ⌈√n_cells⌉
    (= n^¼ of the corpus), the balance point where rep-scoring work and
    within-supercell work match (~n^¼ each per vector)."""
    import math

    return max(1, math.ceil(math.sqrt(n_cells)))


# Flat-vs-two-level crossover for the PERSISTED index build (r13 —
# VERDICT r12 #3, the sparse_tfidf_pairs measure-don't-guess pattern):
# below ~10⁴ corpus vectors (⌈√n⌉ ≈ 100 cells) the two-level build's
# fixed costs (rep broadcasts, seed-super fold, drift barrier) dominate
# the per-vector savings — measured 2.4→4.7 s at sf0.1 (1,846 vectors)
# for a rule that only pays off at 64×+ (2.8×) and 256× (6.6×). With
# n_super = n_cells the hierarchical rule DEGENERATES EXACTLY to flat
# nearest-seed (every seed is its own supercell representative: it
# routes to itself at cos 1, and colinear-duplicate seeds collapse onto
# the same asc-id rep on both levels exactly as the flat asc-id
# tie-break does), so one parametric rule covers both regimes and the
# SQL oracles replay the same CASE on the same seed count.
FLAT_MAX_CELLS = 128


def adaptive_super_count(n_cells: int) -> int:
    """``n_super`` for an ``n_cells``-seed index: ``n_cells`` (flat
    rule, degenerate hierarchy) at or below :data:`FLAT_MAX_CELLS`,
    else ⌈√n_cells⌉ (two-level)."""
    return n_cells if n_cells <= FLAT_MAX_CELLS else scaled_super_count(n_cells)


def scaled_plane_count(n: int, target_bucket: int = 64) -> int:
    """LSH plane count targeting ~``target_bucket`` vectors per bucket:
    ⌈log2(n / target_bucket)⌉, floored at 4. Buckets stay thin as the
    corpus grows instead of saturating at a fixed 2^planes."""
    import math

    return max(4, math.ceil(math.log2(max(2.0, n / target_bucket))))


def stratified_seed_ids(corpus: DataFrame, n_cells: int, id_col: str = "vec_id") -> DataFrame:
    """The ``n_cells`` ids with smallest md5(id) — a deterministic,
    hash-stratified sample spread uniformly over the corpus (the round-1
    'first 8 ids' seeds clustered whatever rows were written first).
    Distributed TakeOrdered — no full sort, no driver collect."""
    return (
        corpus.select(F.col(id_col))
        .orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(n_cells)
    )


def assign_ivf_cells(
    vectors: DataFrame, seeds: DataFrame, n_probe: int = 1,
    id_col: str = "vec_id", keep_cos: bool = False,
) -> DataFrame:
    """Assign each (already norm-annotated) vector to its ``n_probe``
    nearest seed cells by cosine: (id, cell, cell_rk). Seeds are broadcast
    (n_cells is small by construction); ties break on seed id.
    ``keep_cos=True`` retains the assignment cosine as ``cell_cos``
    (the incremental-maintenance path wants it for drift monitoring)."""
    s = seeds.select(
        F.col(id_col).alias("cell"),
        F.col("_e").alias("_es"),
        F.col("_nrm").alias("_ns"),
    )
    cos = _dot(F.col("_e"), F.col("_es")) / (F.col("_nrm") * F.col("_ns"))
    w = Window.partitionBy(id_col).orderBy(F.desc("_cell_cos"), F.asc("cell"))
    out = (
        vectors.crossJoin(F.broadcast(s))
        .withColumn("_cell_cos", cos)
        .withColumn("cell_rk", F.row_number().over(w))
        .filter(F.col("cell_rk") <= n_probe)
        .drop("_es", "_ns")
    )
    if keep_cos:
        return out.withColumnRenamed("_cell_cos", "cell_cos")
    return out.drop("_cell_cos")


def cosine_topk_ivf(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_cells: int | None = None, n_probe: int | None = None,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) partitioning: corpus
    vectors live in their single nearest cell, queries probe their
    ``n_probe`` nearest cells, exact cosine ranks within the probed cells.

    Seeds are the ``n_cells`` corpus vectors with smallest md5(id) —
    deterministic and hash-stratified (no RNG, no trained centroids), so
    the whole index is reproducible in ANSI SQL. ``n_cells`` defaults to
    ⌈√n⌉ of the corpus (one count job at build time), keeping cell size
    ~√n instead of n/8 — the round-1 fixed 8 cells degraded to quadratic
    within-cell work as the corpus grew. At scale the corpus assignment is
    one broadcast pass + shuffle on cell; per-query cost is the probed
    cells' sizes. Recall rises with n_probe — the standard IVF dial —
    which defaults to ⌈√n_cells⌉ so the probed fraction shrinks as
    1/√n_cells while absolute probe breadth still grows."""
    import math

    c = with_norm(ensure_parallelism(corpus), vec_col)
    q = with_norm(queries, vec_col)
    if n_cells is None:
        n_cells = scaled_cell_count(corpus.count())
    if n_probe is None:
        n_probe = math.ceil(math.sqrt(n_cells))
    seeds = c.join(F.broadcast(stratified_seed_ids(corpus, n_cells, id_col)), id_col)
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


def lsh_plane_weights(n_planes: int, dim: int) -> list[list[float]]:
    """Deterministic ±1 hyperplane weights: w[p][i] = +1 iff the first hex
    digit of md5(f"{p}:{i}") has its high bit set. Independent
    pseudo-random planes, reproducible in any engine that has md5 (the
    round-1 parity mix ``(i*odd + p*odd) % 2`` collapsed every plane to
    one of TWO distinct hyperplanes — ≤4 effective buckets)."""
    import hashlib

    return [
        [
            1.0 if int(hashlib.md5(f"{p}:{i}".encode()).hexdigest()[0], 16) >= 8 else -1.0
            for i in range(dim)
        ]
        for p in range(n_planes)
    ]


def lsh_bucket_signature(vec: Column, n_planes: int = 8, dim: int = 64) -> Column:
    """Random-hyperplane LSH signature: sign pattern of ``n_planes`` fixed
    md5-derived ±1 hyperplanes (see ``lsh_plane_weights``). Strict
    left-fold projection — bit-reproducible across engines."""
    weights = lsh_plane_weights(n_planes, dim)
    bits = []
    for p in range(n_planes):
        w_arr = F.array(*[F.lit(w) for w in weights[p]])
        proj = F.aggregate(
            F.zip_with(vec, w_arr, lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bits.append(F.when(proj >= 0, "1").otherwise("0"))
    return F.concat(*bits)


def _probe_signatures(sig: Column, n_planes: int) -> Column:
    """Multi-probe set: the signature itself plus every Hamming-1
    neighbor (one bit flipped) — n_planes + 1 probes per query."""
    probes = [sig]
    for j in range(n_planes):
        flipped = F.when(F.substring(sig, j + 1, 1) == "1", "0").otherwise("1")
        probes.append(
            F.concat(F.substring(sig, 1, j), flipped, F.substring(sig, j + 2, n_planes - j - 1))
        )
    return F.array(*probes)


def cosine_topk_lsh(
    queries: DataFrame, corpus: DataFrame, k: int = 5,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int | None = None, dim: int = 64, multi_probe: bool = True,
) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket
    (plus its Hamming-1 probe buckets when ``multi_probe``), then exact
    cosine rank within the candidates. The join is bucket-local (equi-join
    on the signature), so per-query work is bucket size × probes, not
    corpus size. ``n_planes`` defaults to ⌈log2(n/64)⌉ — bucket count
    grows with the corpus (the round-1 fixed 8 planes capped at 256
    buckets, so buckets grew linearly with n). Recall is tunable via
    multi-probe breadth and the 64-vector bucket target."""
    if n_planes is None:
        n_planes = scaled_plane_count(corpus.count())
    q = with_norm(queries, vec_col)
    c = with_norm(ensure_parallelism(corpus), vec_col)
    sig = lsh_bucket_signature(F.col("_e"), n_planes, dim)
    if multi_probe:
        q_sig = F.explode(_probe_signatures(sig, n_planes)).alias("_sig")
    else:
        q_sig = sig.alias("_sig")
    q = q.select(
        F.col(id_col).alias("query_id"), F.col("_e").alias("_eq"),
        F.col("_nrm").alias("_nq"), q_sig,
    )
    c = c.select(
        F.col(id_col).alias("neighbor_id"), F.col("_e").alias("_ec"),
        F.col("_nrm").alias("_nc"), sig.alias("_sig"),
    )
    cos = _dot(F.col("_eq"), F.col("_ec")) / (F.col("_nq") * F.col("_nc"))
    pairs = (
        c.join(F.broadcast(q), "_sig")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos", cos)
        # a corpus vector can match several probes of one query
        .select("query_id", "neighbor_id", "cos")
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


# Dense-block fences (ADVICE r12): the broadcast pivoted-vector table is
# ~8 B per (doc, term) cell and the cross join folds n_terms multiplies
# per pair — bound BOTH, not just the two axes, or a 50k-doc × 4k-term
# corpus slips through as a ~1.6 GB broadcast with 1.25B × 4k-fold pairs.
# 2e7 cells ≈ 160 MB broadcast; 2e10 fold-ops ≈ the measured sf0.1 dense
# regime (25M pairs × 31 terms ≈ 8e8 ≈ 34 s) × ~25.
DENSE_MAX_CELLS = 20_000_000
DENSE_MAX_FOLD_OPS = 20_000_000_000
def _dense_pairs_numpy(
    dv: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Dense-block pair kernel as one vectorized numpy pass (guide §4.2:
    hand whole batches to native vectorized libraries): the pivoted
    integer vectors — already bounded by the dense fences to ≤
    ``DENSE_MAX_CELLS`` cells — are collected once and broadcast as an
    int64 matrix; a ``spark.range`` over slice indices drives one
    ``mapInPandas`` task per row-slice of that same broadcast matrix
    (exact int64 matmul — the same BIGINT products and order-free sums
    as the SQL fold) and emits the surviving pairs. The pivot executes
    exactly once (the collect); nothing else reads it.

    Float semantics replay Spark's expression exactly: cos =
    double(dot) / (nrm_a * nrm_b) — one IEEE multiply then one IEEE
    divide per pair, with the norms computed ONCE in the JVM (the same
    ``sqrt(cast(Σw² as double))`` values flow to both sides), so the
    output is bit-identical to the join formulation. Why not pure SQL:
    Catalyst pushes the cos>=threshold expression into the
    BroadcastNestedLoopJoin condition where the per-pair dot is evaluated
    outside whole-stage codegen (r13 measurement: 117 s unrolled /
    31 s higher-order fold / ~3 s this kernel at sf0.1).

    Driver exposure is the SAME block the JVM formulation broadcasts
    (F.broadcast of the pivoted side), just carried as numpy arrays.
    """
    import numpy as np
    import pandas as pd

    rows = dv.collect()  # fenced: n_docs*n_terms <= DENSE_MAX_CELLS
    # The probe side is driven from the ALREADY-collected matrix (r14,
    # VERDICT r13 #4): re-using dv as the mapInPandas input re-executed
    # the full pivot lineage a second time per query. A spark.range over
    # slice indices (one partition per slice — no shuffle at all, where
    # the r13 version paid a repartition exchange) hands each task its
    # row range of the broadcast matrix; the pivot is computed exactly
    # once, by the collect. Slice count spreads the (n_docs × n_docs ×
    # n_terms) matmul by WORK, not bytes (guide §2.5): ~64 docs per
    # slice, capped at the session's parallelism.
    n_slices = max(
        1,
        min(
            dv.sparkSession.sparkContext.defaultParallelism,
            (len(rows) + 63) // 64,
        ),
    )
    step = (len(rows) + n_slices - 1) // n_slices if rows else 1
    ids_all = [r[0] for r in rows]
    id_is_str = any(isinstance(x, str) for x in ids_all)
    ids_b = np.array(ids_all, dtype=object if id_is_str else np.int64)
    mat = (
        np.array([list(r[1]) for r in rows], dtype=np.int64)
        if rows
        else np.zeros((0, 0), dtype=np.int64)
    )
    nrm_b = np.array([r[2] for r in rows], dtype=np.float64)
    spark = dv.sparkSession
    bc = spark.sparkContext.broadcast((ids_b, mat, nrm_b))
    id_type = dv.schema[id_col].dataType.simpleString()
    out_schema = f"doc_a {id_type}, doc_b {id_type}, dot long, cos double"

    def gen(batches):
        b_ids, b_mat, b_nrm = bc.value
        bt = b_mat.T
        for pdf in batches:
            for s in pdf["id"].tolist():
                lo, hi = s * step, min((s + 1) * step, len(b_ids))
                if lo >= hi:
                    continue
                a_ids = b_ids[lo:hi]
                a_mat = b_mat[lo:hi]
                a_nrm = b_nrm[lo:hi]
                dots = a_mat @ bt  # m×n, exact int64
                denom = a_nrm[:, None] * b_nrm[None, :]
                cos = dots.astype(np.float64) / denom
                mask = (a_ids[:, None] < b_ids[None, :]) & (cos >= threshold)
                ai, bj = np.nonzero(mask)
                if len(ai) == 0:
                    continue
                yield pd.DataFrame(
                    {
                        "doc_a": a_ids[ai],
                        "doc_b": b_ids[bj],
                        "dot": dots[ai, bj],
                        "cos": cos[ai, bj],
                    }
                )

    return spark.range(0, n_slices, 1, n_slices).mapInPandas(gen, out_schema)


def tfidf_prefix_index(
    w: DataFrame, id_col: str, threshold: float
) -> DataFrame:
    """Threshold-aware prefix postings for the AllPairs candidate join
    (see :func:`sparse_tfidf_pairs`): from the integer posting relation
    ``(id, term, w)``, drop each document's lightest postings while Σw²
    of the dropped set stays strictly under ``(t/2)²·‖d‖²`` — a pair
    with every shared term inside one of the two drop sets has
    ``dot < t·‖a‖·‖b‖`` by Cauchy–Schwarz on the two halves, so
    candidates generated from the surviving (id, term) rows are a
    guaranteed superset of all qualifying pairs. The comparison runs in
    double with a conservative 1e-9 margin (drops LESS, never more —
    output never depends on the margin)."""
    run_w = (
        Window.partitionBy(id_col)
        .orderBy(F.asc("w"), F.asc("term"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ann = w.withColumn("_wsq", F.col("w") * F.col("w"))
    ann = ann.withColumn(
        "_run_sq", F.sum("_wsq").over(run_w)
    ).withColumn(
        "_norm_sq", F.sum("_wsq").over(Window.partitionBy(id_col))
    )
    bound = threshold * threshold / 4.0 * (1.0 - 1e-9)
    return ann.filter(
        ~(
            F.col("_run_sq").cast("double")
            < F.lit(bound) * F.col("_norm_sq").cast("double")
        )
    ).select(id_col, "term")


def tfidf_postings(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The integer tf-idf posting substrate shared by
    :func:`sparse_tfidf_pairs` and the prefix-filter scale probe:
    returns ``(tf, dfreq, w)`` — the checkpointed (id, term, tf) grain,
    the (term, df) document frequencies, and the weighted postings
    (id, term, w) with ``w = tf · 1e6 div df``."""
    words = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    # one eager barrier: tf feeds dfreq, w, the strategy stats, and (on
    # the posting path) both join sides + norms — without it the
    # explode+aggregate chain re-executes under every consumer
    tf = (
        words.groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = tf.join(F.broadcast(dfreq), "term").select(
        F.col(id_col),
        "term",
        F.expr("tf * 1000000 div df").alias("w"),
    )
    return tf, dfreq, w


def sparse_tfidf_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
    dense_max_docs: int = 50_000,
    dense_max_terms: int = 4_096,
    prefix_filter: bool = True,
) -> DataFrame:
    """Document-pair cosine similarity over SPARSE integer tf-idf vectors
    — the inverted-index counterpart to the dense-embedding operators:
    pairs are generated only for documents sharing ≥1 term (posting-list
    self-join), never all-pairs.

    Exactness: weights are integer (``tf · 1e6 div df``), so every dot
    product is a BIGINT sum (order-safe under shuffle AND identical
    under either physical strategy below); each norm is one sqrt of an
    integer; cosine is one division of exact doubles — fully
    oracle-checkable.

    ADAPTIVE physical strategy (r12 — measure, don't guess): the
    posting-list join is the right shape for realistic Zipf
    vocabularies, but it DEGENERATES when the vocabulary is tiny —
    every posting list is the whole corpus and the join shuffles
    Σ_t df_t² rows (measured 182 s at sf0.1: 31 terms × 5,000 docs →
    ~380M joined rows for 6,038 output pairs). Catalyst cannot see
    this from static cardinalities, so the operator measures it: when
    ``Σ df² > 4·n²`` (≥4 shuffled rows per candidate PAIR) and the
    corpus fits the dense fences, it switches to an exact dense-block
    path — each doc's weights pivoted onto the metadata-sized sorted
    vocabulary array, one broadcast self-join, the dot an in-row
    integer fold, ZERO pair shuffle (the threshold filter runs inside
    the join stage). Same integers, same output, same oracle. The
    dense path additionally requires ``threshold > 0`` (ADVICE r12:
    at threshold ≤ 0 the cross join would emit no-shared-term pairs
    with dot = 0 that the posting join structurally cannot produce —
    the strategies must stay output-identical) and bounded
    ``n_docs·n_terms`` broadcast cells / ``n_docs²·n_terms`` fold work
    (ADVICE r12: the two axis fences alone admitted a ~1.6 GB
    broadcast and 1.25B-pair cross join); beyond any fence the
    quadratic block is refused and the posting join stands.

    Scale shape (posting path): one explode + two vocabulary-keyed
    aggregates (map-side combined), document norms broadcast-joined
    back, and the pair space bounded by posting-list co-occurrence —
    the classic sparse-similarity join. Hot terms (stopwords) are the
    skew risk: AQE splits them. With ``threshold > 0`` the candidate
    join runs on PREFIX-FILTERED postings (r13 — VERDICT r12 #6, the
    AllPairs bound of Bayardo, Ma & Srikant, WWW'07, adapted to the
    symmetric self-join): each document drops its lightest postings
    while their cumulative squared weight stays under ``(t/2)²`` of
    the document's squared norm — a missed pair would need every
    shared term inside one of the two drop sets, and Cauchy–Schwarz
    on the two halves bounds its dot below ``t·‖a‖·‖b‖`` — then the
    surviving candidates are verified EXACTLY against the full
    posting lists, so the output is identical and the filter is
    engine-internal (nothing for the oracle to replay). Stopword
    postings are precisely the light ones, so the worst skew keys
    drop out of candidate generation entirely."""
    tf, dfreq, w = tfidf_postings(df, id_col, text_col)
    stats = dfreq.agg(
        F.sum(F.col("df") * F.col("df")).alias("sum_df2"),
        F.count(F.lit(1)).alias("n_terms"),
    ).collect()[0]
    n_docs = tf.select(id_col).distinct().count()
    if (
        stats["sum_df2"] is not None
        and stats["sum_df2"] > 4 * n_docs * n_docs
        and threshold > 0
        and n_docs <= dense_max_docs
        and stats["n_terms"] <= dense_max_terms
        and n_docs * stats["n_terms"] <= DENSE_MAX_CELLS
        and n_docs * n_docs * stats["n_terms"] <= DENSE_MAX_FOLD_OPS
    ):
        vocab = dfreq.orderBy("term").agg(
            F.collect_list("term").alias("_vocab")
        )
        dv = (
            w.groupBy(id_col)
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("term", "w"))
                ).alias("_m"),
                F.sum(F.col("w") * F.col("w")).alias("_sq"),
            )
            .crossJoin(F.broadcast(vocab))
            .select(
                F.col(id_col),
                F.transform(
                    F.col("_vocab"),
                    lambda t: F.coalesce(
                        F.element_at(F.col("_m"), t),
                        F.lit(0).cast("long"),
                    ),
                ).alias("_v"),
                F.sqrt(F.col("_sq").cast("double")).alias("_nrm"),
            )
        )
        try:
            import numpy as np  # noqa: F401
            import pandas as pd  # noqa: F401

            return _dense_pairs_numpy(dv, id_col, threshold)
        except ImportError:
            pass
        # JVM fallback (numpy/pandas unavailable): broadcast self-join with
        # the higher-order fold. NOTE r13 measurement: an unrolled
        # per-index sum looks codegen-friendly but the optimizer pushes
        # the whole cos>=threshold expression into the
        # BroadcastNestedLoopJoin CONDITION, where it is evaluated per
        # candidate pair OUTSIDE whole-stage codegen — measured 117 s vs
        # 31 s for this fold at sf0.1 (plans/r13 audit), so the fold stays.
        da = dv.select(
            F.col(id_col).alias("doc_a"),
            F.col("_v").alias("_va"),
            F.col("_nrm").alias("_na"),
        )
        db = dv.select(
            F.col(id_col).alias("doc_b"),
            F.col("_v").alias("_vb"),
            F.col("_nrm").alias("_nb"),
        )
        dot = F.aggregate(
            F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        return (
            da.crossJoin(F.broadcast(db))
            .filter(F.col("doc_a") < F.col("doc_b"))
            .withColumn("dot", dot)
            .withColumn(
                "cos",
                F.col("dot").cast("double") / (F.col("_na") * F.col("_nb")),
            )
            .filter(F.col("cos") >= threshold)
            .select("doc_a", "doc_b", "dot", "cos")
        )
    norms = w.groupBy(id_col).agg(
        F.sqrt(F.sum(F.col("w") * F.col("w")).cast("double")).alias("nrm")
    )
    a = w.select(F.col(id_col).alias("doc_a"), "term", F.col("w").alias("_wa"))
    b = w.select(F.col(id_col).alias("doc_b"), "term", F.col("w").alias("_wb"))
    if threshold > 0 and prefix_filter:
        idx = tfidf_prefix_index(w, id_col, threshold)
        cand = (
            idx.select(F.col(id_col).alias("doc_a"), "term")
            .join(idx.select(F.col(id_col).alias("doc_b"), "term"), "term")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
            .distinct()
        )
        dots = (
            cand.join(a, "doc_a")
            .join(b, ["doc_b", "term"])
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.col("_wa") * F.col("_wb")).alias("dot"))
        )
    else:
        dots = (
            a.join(b, "term")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.sum(F.col("_wa") * F.col("_wb")).alias("dot"))
        )
    na = norms.select(F.col(id_col).alias("doc_a"), F.col("nrm").alias("_na"))
    nb = norms.select(F.col(id_col).alias("doc_b"), F.col("nrm").alias("_nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .withColumn(
            "cos", F.col("dot").cast("double") / (F.col("_na") * F.col("_nb"))
        )
        .filter(F.col("cos") >= threshold)
        .select("doc_a", "doc_b", "dot", "cos")
    )


def cosine_topk_ivfpq(
    queries: DataFrame, corpus: DataFrame, k: int = 5, m: int = 4,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_cells: int | None = None, n_probe: int | None = None,
    rerank: int | None = None,
) -> DataFrame:
    """IVF-PQ: the full billion-scale ANN index shape — IVF cells prune
    the corpus, PQ codes replace full vectors in the distance kernel.
    Candidates come from the query's probed cells (as ``cosine_topk_ivf``);
    each candidate is scored by SYMMETRIC PQ distance: the sum over the
    ``m`` subspaces of the squared int distance between the query's own
    global-q8 sub-codes and the candidate's assigned sub-centroid
    (``vectors.pq_codes`` codebook: the 16 hash-stratified seed rows).
    All-integer scores → bit-exact oracle; ranking ties break on
    neighbor id. Returns (query_id, neighbor_id, adc_dist, rk), rk ≤ k.

    Scale shape: the codebook is (16 × dim) — broadcast; candidate
    scoring joins the PQ code table (m small ints per corpus vector, the
    index's compressed payload) instead of the raw vectors — at a
    billion vectors the scan drops from 256 B/vec of floats to
    ~``m`` bytes/vec, which is the reason IVF-PQ exists. One shuffle on
    cell for candidates, one aggregate per (query, neighbor).

    ``rerank``: exact re-ranking depth — the standard IVF-PQ deployment
    shape (coarse ADC shortlist → exact distances on the survivors). A
    16-codeword codebook resolves CLUSTERS, not within-cluster order, so
    raw ADC recall@k collapses on clusterable corpora (measured ~0.05
    here — and a Lloyd-refined codebook does NOT fix it; the code budget
    is the limit). With ``rerank=R`` the per-query ADC top-R shortlist
    (R ≫ k, still tiny) joins back to the raw vectors ONCE — |queries|·R
    rows, never the corpus — and the final top-k orders by exact cosine
    (ties on neighbor id). tests/test_similarity.py holds the recall
    floor this buys. Output schema is unchanged: ``adc_dist`` then
    carries the exact-cosine rank ordering in ``rk`` while staying the
    shortlist's ADC score (both are reported so drift in either layer is
    observable)."""
    from ram_datapipeline_spark.operators.vectors import (
        pq_codes,
        quantize_global_q8,
    )

    n = corpus.count()
    if n_cells is None:
        n_cells = scaled_cell_count(n)
    if n_probe is None:
        import math

        n_probe = math.ceil(math.sqrt(n_cells))
    c = with_norm(ensure_parallelism(corpus), vec_col)
    q = with_norm(queries, vec_col)
    seeds = c.join(
        F.broadcast(stratified_seed_ids(corpus, n_cells, id_col)), id_col
    )
    c_cells = assign_ivf_cells(c, seeds, 1, id_col).select(
        F.col(id_col).alias("neighbor_id"), "cell"
    )
    q_cells = assign_ivf_cells(q, seeds, n_probe, id_col).select(
        F.col(id_col).alias("query_id"), "cell"
    )
    cand = (
        c_cells.join(F.broadcast(q_cells), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )

    # PQ payload: (neighbor_id, subspace, code) + the broadcast codebook.
    # One shared global-q8 pass feeds all three consumers (PQ encoding,
    # query codes, codebook seeds) instead of three corpus scans.
    # localCheckpoint (not persist): materialized once for the three
    # consumers below, and freed by the ContextCleaner when the returned
    # frame is garbage — persist() would leak a cached frame per call
    c8 = quantize_global_q8(corpus, vec_col=vec_col).select(
        id_col, "codes"
    ).localCheckpoint()
    codes = pq_codes(
        corpus, m=m, id_col=id_col, vec_col=vec_col, codes_df=c8
    ).select(F.col(id_col).alias("neighbor_id"), "subspace", "code")
    # query codes come from the corpus-side table: queries MUST be drawn
    # from the corpus (their PQ comparison is only meaningful under the
    # corpus quantization scale) — fail loudly instead of silently
    # returning no neighbors for unknown query ids
    n_unknown = queries.select(id_col).join(
        c8.select(id_col), id_col, "left_anti"
    ).count()
    if n_unknown:
        raise ValueError(
            f"cosine_topk_ivfpq: {n_unknown} query ids absent from the "
            "corpus — out-of-corpus queries need corpus-scale "
            "quantization first (quantize_global_q8 bounds)"
        )
    qq = c8.select(
        F.col(id_col).alias("query_id"), F.col("codes").alias("_qcodes")
    )
    seed_rows = (
        c8.select(
            F.md5(F.col(id_col).cast("string")).alias("h"),
            F.col(id_col),
            "codes",
        )
        .orderBy("h", id_col)
        .limit(16)
        .collect()
    )
    dim = len(seed_rows[0]["codes"])
    sub = dim // m
    cb = [
        (s, cid, [int(v) for v in r["codes"][s * sub : (s + 1) * sub]])
        for cid, r in enumerate(seed_rows)
        for s in range(m)
    ]
    cb_df = local_rows_df(
        corpus.sparkSession, cb, "subspace int, code int, cent array<bigint>"
    )
    d2 = F.aggregate(
        F.zip_with(
            F.slice(F.col("_qcodes"), F.col("subspace") * sub + 1, sub),
            F.col("cent"),
            lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        cand.join(codes, "neighbor_id")
        .join(F.broadcast(cb_df), ["subspace", "code"])
        .join(qq, "query_id")
        .withColumn("_d2", d2)
        .groupBy("query_id", "neighbor_id")
        .agg(F.sum("_d2").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    ranked = scored.withColumn("rk", F.row_number().over(w))
    if rerank is None:
        return ranked.filter(F.col("rk") <= k).select(
            "query_id", "neighbor_id", "adc_dist", "rk"
        )
    # exact re-rank of the ADC shortlist: (|queries| × rerank) rows join
    # the raw vectors — corpus-sized nothing; the shortlist is the only
    # thing that moves
    short = ranked.filter(F.col("rk") <= int(rerank)).select(
        "query_id", "neighbor_id", "adc_dist"
    )
    nv = c.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("_e").alias("_nv"),
        F.col("_nrm").alias("_nn"),
    )
    qv = q.select(
        F.col(id_col).alias("query_id"),
        F.col("_e").alias("_qv"),
        F.col("_nrm").alias("_qn"),
    )
    cos = (_dot(F.col("_qv"), F.col("_nv")) / (F.col("_qn") * F.col("_nn")))
    exact = (
        short.join(nv, "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .withColumn("_cos", cos)
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.desc("_cos"), F.asc("neighbor_id")
    )
    return (
        exact.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rk")
    )


def mmr_rerank(
    queries: DataFrame, corpus: DataFrame, k: int = 5, shortlist: int = 25,
    lam_num: int = 1, lam_den: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Maximal-Marginal-Relevance diversity re-ranking (Carbonell &
    Goldstein '98) — the deployment stage after exact retrieval when the
    top-k must not be k near-duplicates: greedily pick
    ``argmax  λ·rel(d) − (1−λ)·max_{s∈selected} sim(d, s)``
    with ties on the smaller id, ``k`` times, over the exact top-
    ``shortlist`` candidates per query.

    Exactness contract: λ is restricted to exact binary fractions (so
    λ and 1−λ are both exact doubles), and BOTH score inputs — the
    relevance cosines and the candidate-pairwise cosines — are computed
    JVM-side with the engine-wide strict-left-fold dot product. The
    greedy itself is only comparisons, exact-λ products, and one
    subtraction per score, all correctly rounded — so a SQL engine
    unrolling the same k selection steps reproduces every pick
    bit-for-bit (the suite oracle does).

    Scale shape: the shortlist is |queries|·R rows, the pairwise-sim
    table |queries|·R² — both query-bounded, never corpus-sized; the
    greedy runs per query in ONE cogrouped Arrow kernel over those
    bounded groups. Output: (query_id, neighbor_id, rel, mmr_rank).
    """
    if lam_den & (lam_den - 1) or not (0 < lam_num <= lam_den):
        raise ValueError(
            "mmr_rerank: lambda must be an exact binary fraction in "
            f"(0, 1] (got {lam_num}/{lam_den})"
        )
    lam = lam_num / lam_den
    short = cosine_topk(
        queries, corpus, k=shortlist, id_col=id_col, vec_col=vec_col
    )
    rels = short.select(
        "query_id", "neighbor_id", F.col("cos").alias("rel")
    ).localCheckpoint()  # consumed by pairs AND the kernel; shortlist-sized
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("_nid"), "_e", "_nrm"
    )
    a = rels.select("query_id", F.col("neighbor_id").alias("a"))
    # fresh attribute ids for the self-join side (toDF re-aliases the
    # whole projection, which plain select() does not)
    b = rels.toDF("_qb", "b", "_relb").select("_qb", "b")
    pairs = (
        a.join(b, F.col("query_id") == F.col("_qb"))
        .drop("_qb")
        .where(F.col("a") < F.col("b"))
        .join(
            c.withColumnsRenamed(
                {"_nid": "a", "_e": "_ea", "_nrm": "_na"}
            ),
            "a",
        )
        .join(
            c.withColumnsRenamed(
                {"_nid": "b", "_e": "_eb", "_nrm": "_nb"}
            ),
            "b",
        )
        .select(
            "query_id", "a", "b",
            (
                _dot(F.col("_ea"), F.col("_eb"))
                / (F.col("_na") * F.col("_nb"))
            ).alias("sim"),
        )
        # fresh attribute ids: pairs derives from rels, and cogrouping
        # two plans that share attributes trips the self-join checker
        .toDF("query_id", "a", "b", "sim")
    )

    def greedy(rel_pdf, pair_pdf):
        import pandas as pd

        if len(rel_pdf) == 0:
            return pd.DataFrame(
                {"query_id": [], "neighbor_id": [], "rel": [],
                 "mmr_rank": []}
            )
        qid = int(rel_pdf["query_id"].iloc[0])
        rel = dict(zip(rel_pdf["neighbor_id"], rel_pdf["rel"]))
        sim: dict = {}
        for pa, pb, s in zip(pair_pdf["a"], pair_pdf["b"], pair_pdf["sim"]):
            sim[(pa, pb)] = s
            sim[(pb, pa)] = s
        cand = sorted(rel)
        selected: list = []
        out = {"query_id": [], "neighbor_id": [], "rel": [], "mmr_rank": []}
        while cand and len(selected) < k:
            best_id, best_score = None, None
            for d in cand:  # ascending ids: first strict max = smallest id
                ms = max((sim[(d, s)] for s in selected), default=0.0)
                score = lam * rel[d] - (1.0 - lam) * ms
                if best_score is None or score > best_score:
                    best_id, best_score = d, score
            selected.append(best_id)
            cand.remove(best_id)
            out["query_id"].append(qid)
            out["neighbor_id"].append(best_id)
            out["rel"].append(rel[best_id])
            out["mmr_rank"].append(len(selected))
        return pd.DataFrame(out)

    return (
        rels.groupby("query_id")
        .cogroup(pairs.groupby("query_id"))
        .applyInPandas(
            greedy,
            schema="query_id long, neighbor_id long, rel double, mmr_rank int",
        )
    )


def hard_negatives(
    corpus: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for every vector,
    the ``k`` most-similar vectors carrying a DIFFERENT label — the
    near-the-margin negatives that make a metric-learning batch
    informative (easy random negatives teach nothing).

    Same fenced brute-force shape as ``cosine_topk`` (the query side
    broadcasts; at corpus scale swap the candidate generation for the
    IVF/LSH paths and keep the label-inequality filter + rank) — the
    label filter is applied BEFORE the rank window, so k survivors per
    query are guaranteed hard negatives, not top-k-then-filter leftovers.

    Emits (query_id, label, neg_id, neg_label, cos, rk).
    """
    q = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("label"),
        F.col("_e").alias("_eq"),
        F.col("_nrm").alias("_nq"),
    )
    # the probe side must spread over the cluster BEFORE the fan-out —
    # a one-file parquet scan would grind the whole cross join on one
    # core (same fix as cosine_topk)
    c = with_norm(ensure_parallelism(corpus), vec_col).select(
        F.col(id_col).alias("neg_id"),
        F.col(label_col).alias("neg_label"),
        F.col("_e").alias("_ec"),
        F.col("_nrm").alias("_nc"),
    )
    cos = _dot(F.col("_eq"), F.col("_ec")) / (F.col("_nq") * F.col("_nc"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos"), F.asc("neg_id")
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("label") != F.col("neg_label"))
        .withColumn("cos", cos)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "label", "neg_id", "neg_label", "cos", "rk")
    )


# ---------------------------------------------------------------------------
# Incremental IVF index maintenance (round 11 — VERDICT r10 #4)
#
# The similarity sibling of the incremental dedup index
# (operators/dedup.py::write_minhash_index): the other refresh-time cost
# a 100 TB embedding store pays is re-deriving its ANN index when a new
# vector batch lands. With the deterministic hash-stratified IVF here,
# "the index" is (a) a metadata-sized SEEDS table and (b) the standing
# per-vector cell assignments — so maintaining it for a new batch is ONE
# broadcast pass over the batch against the seeds, zero archive re-scan,
# zero re-clustering. A per-cell occupancy drift report (exact integer
# ppm shares) decides when the grown corpus has outgrown the seed set
# and a re-train (new ⌈√n⌉ seed draw) is due.
# ---------------------------------------------------------------------------


def _fold_argmax(e: Column, nrm: Column, arr: Column) -> Column:
    """Deterministic argmax-cosine over an array column of
    (id, vector, norm) structs, as ONE codegen expression: a strict
    left fold keeping the best (cos, id) pair. The array is sorted asc
    by id (struct ordering, id first), so strict ``>`` improvement ==
    window ``ORDER BY cos DESC, id ASC`` — the tie-break every other
    deterministic argmax in this module uses. Returns the
    (c=cos, s=id) struct. The array rides in as a COLUMN from a 1-row
    (or per-key) broadcast join, never as a literal — a literal array
    of vectors blows the expression past whole-stage codegen's method
    limit and drops the fold to interpreted eval (measured 1.7× WORSE
    than the flat window at 64× before this shape)."""

    def step(acc: Column, it: Column) -> Column:
        cos = _dot(e, it["v"]) / (nrm * it["nm"])
        return F.when(
            cos > acc["c"], F.struct(cos.alias("c"), it["r"].alias("s"))
        ).otherwise(acc)

    init = F.struct(
        F.lit(float("-inf")).alias("c"),
        F.element_at(arr, 1)["r"].alias("s"),
    )
    return F.aggregate(arr, init, step)


def _rep_set(seeds: DataFrame, n_super: int) -> DataFrame:
    """The ``n_super`` seeds with smallest md5(cell) — the supercell
    representatives, re-derived deterministically from the seeds table
    alone (no extra persisted artifact). (cell, _e, _nrm)."""
    return (
        seeds.orderBy(F.md5(F.col("cell").cast("string")))
        .limit(n_super)
        .select("cell", "_e", "_nrm")
    )


def _rep_array(seeds: DataFrame, n_super: int) -> DataFrame:
    """The rep set as ONE row holding sorted (id, vector, norm) structs
    — metadata-sized (n^¼ of the corpus), broadcast to every task."""
    return _rep_set(seeds, n_super).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("cell").alias("r"),
                    F.col("_e").alias("v"),
                    F.col("_nrm").alias("nm"),
                )
            )
        ).alias("_reps")
    )


def seeds_with_super(seeds: DataFrame, n_super: int) -> DataFrame:
    """Every seed routed to its supercell by the fold rule:
    (cell, _e, _nrm, _super). Metadata-sized."""
    return (
        seeds.crossJoin(F.broadcast(_rep_array(seeds, n_super)))
        .withColumn(
            "_super",
            _fold_argmax(F.col("_e"), F.col("_nrm"), F.col("_reps"))["s"],
        )
        .drop("_reps")
    )


def two_level_assign_cells(
    vectors: DataFrame,
    seeds: DataFrame,
    id_col: str = "vec_id",
    keep_cos: bool = False,
    n_super: int | None = None,
    extra_cols: tuple[str, ...] = (),
    n_seeds: int | None = None,
) -> DataFrame:
    """Two-level coarse quantization (VERDICT r11 #2 — the ANN sibling
    of CRP routing; FAISS's IMI / two-level coarse quantizer shape):
    route each vector to its nearest REP (⌈√n_cells⌉ = n^¼ seeds with
    smallest md5(cell), scored in one fold over the broadcast rep
    array), then take the max-cos SEED within that rep's supercell
    (broadcast join on the supercell key brings in that supercell's
    seed array; a second fold picks the cell). Per-vector work drops
    from n_cells ≈ √n comparisons to ~2·n^¼ — and the whole assignment
    is a ZERO-EXCHANGE map over the vector scan: two broadcast joins
    (a 1-row rep array, an n_super-row cell-array table), two folds,
    no window, no groupBy, no n×n_cells sort (the flat rule shuffled
    and sorted n·√n rows through a window).

    The two-level route IS the index's assignment rule — applied
    identically by the full build, the incremental batch path, and the
    SQL oracles, so incremental == rebuild stays bit-for-bit. It is
    NOT a shortcut for the flat nearest-seed rule: an exact
    triangle-inequality prune was measured on this corpus first
    (isotropic embeddings, within-label mean cos ≈ 0.005) and pruned
    nothing — every supercell's radius ≈ the space's diameter, work
    ratio 1.04× of flat. Hierarchical-as-the-rule is the standard
    resolution (it is what IMI indexes do), and every consumer replays
    the same deterministic rule.

    Since r13 (VERDICT r12 #3) the default ``n_super`` is ADAPTIVE:
    ``n_cells`` itself at or below :data:`FLAT_MAX_CELLS` — which makes
    the rule the exact flat nearest-seed assignment and takes a
    single-fold fast path (ONE broadcast seed array, one fold, none of
    the rep/supercell machinery whose fixed costs dominated small
    corpora) — and ⌈√n_cells⌉ above it. Both the full build and the
    incremental path derive the choice from the PERSISTED seed count
    (ADVICE r12: deriving it from the *requested* n_cells diverged from
    the incremental path when n_cells exceeded the corpus), so
    incremental == rebuild stays bit-for-bit in either regime.

    ``vectors`` must be norm-annotated (``with_norm``); ``seeds`` is
    (cell, _e, _nrm). Ties break asc on cell/rep id everywhere.
    """
    if n_super is None:
        if n_seeds is None:
            n_seeds = seeds.count()
        n_super = adaptive_super_count(n_seeds)
    if n_seeds is not None and n_super >= n_seeds:
        # degenerate hierarchy == flat nearest-seed: one broadcast seed
        # array, one fold — zero exchanges, none of the two-level fixed
        # costs (identical output to the general path with every seed
        # its own rep; the SQL oracles replay the same degenerate CASE)
        seed_arr = seeds.agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("cell").alias("r"),
                        F.col("_e").alias("v"),
                        F.col("_nrm").alias("nm"),
                    )
                )
            ).alias("_cells")
        )
        v1 = vectors.crossJoin(F.broadcast(seed_arr))
        best = _fold_argmax(F.col("_e"), F.col("_nrm"), F.col("_cells"))
        out = [F.col(id_col), best["s"].alias("cell")]
        if keep_cos:
            out.append(best["c"].alias("cell_cos"))
        out.extend(F.col(c) for c in extra_cols)
        return v1.select(*out)
    reps_arr = _rep_array(seeds, n_super)
    # every seed routes through the same rule; group each supercell's
    # seeds into one sorted array row (n_super rows total)
    cells_by_super = (
        seeds_with_super(seeds, n_super)
        .groupBy("_super")
        .agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("cell").alias("r"),
                        F.col("_e").alias("v"),
                        F.col("_nrm").alias("nm"),
                    )
                )
            ).alias("_cells")
        )
    )
    v2 = (
        vectors.crossJoin(F.broadcast(reps_arr))
        .withColumn(
            "_super",
            _fold_argmax(F.col("_e"), F.col("_nrm"), F.col("_reps"))["s"],
        )
        .drop("_reps")
        .join(F.broadcast(cells_by_super), "_super")
    )
    best = _fold_argmax(F.col("_e"), F.col("_nrm"), F.col("_cells"))
    out = [F.col(id_col), best["s"].alias("cell")]
    if keep_cos:
        out.append(best["c"].alias("cell_cos"))
    out.extend(F.col(c) for c in extra_cols)
    return v2.select(*out)


def write_ivf_index(
    corpus: DataFrame,
    table: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    n_buckets: int = 16,
) -> int:
    """Persist the standing IVF index for ``corpus`` as three tables:

    - ``{table}_seeds``  (cell, embedding): the ⌈√n⌉ hash-stratified
      seed vectors — metadata-sized, broadcast by every consumer.
    - ``{table}``        (id, cell): the per-vector assignments,
      BUCKETED on cell (+ sorted within buckets) so a cell-local read
      (search, compaction, re-balance) scans pre-partitioned with zero
      exchange — the only time this table shuffles is this write.
    - ``{table}_stats``  (cell, n_standing): per-cell occupancy,
      cell-count-sized — the drift baseline, so monitoring a new batch
      never touches the assignment table at all.

    Returns the seed count. At 100 TB the assignment table is
    ~16 bytes/vector (a few TB for a trillion vectors) and everything
    downstream of this write treats the ARCHIVE vectors as immutable —
    exactly the property :func:`incremental_ivf_assign` exploits.

    The assignment rule is :func:`two_level_assign_cells` with the r13
    ADAPTIVE n_super (VERDICT r12 #3): at or below
    :data:`FLAT_MAX_CELLS` seeds the rule is the exact flat
    nearest-seed assignment via the single-fold fast path (the
    two-level fixed costs were the round-12 regression at small SF);
    above it, the hierarchical route (r12 — VERDICT r11 #2) whose
    ~2·n^¼ comparisons per vector replace the flat rule's O(n·√n)
    scan (measured 2.8× at 64× / 6.6× at 256×). ``n_super`` derives
    from the PERSISTED seed count (ADVICE r12), the same derivation
    :func:`incremental_ivf_assign` replays, so incremental == rebuild
    holds in either regime and across the crossover. The persisted
    FORMAT is unchanged (seeds / cell-bucketed assignments / stats).

    Citation: IVF after Sivic & Zisserman's inverted-file retrieval
    (ICCV 2003) / FAISS's IVF + IMI family — re-expressed with
    deterministic md5-stratified seeds and reps so the whole index is
    ANSI-SQL-replayable.
    """
    from ram_datapipeline_spark.operators.dedup import _drop_stale_table

    spark = corpus.sparkSession
    if n_cells is None:
        n_cells = scaled_cell_count(corpus.count())
    c = with_norm(ensure_parallelism(corpus), vec_col)
    seeds_src = c.join(
        F.broadcast(stratified_seed_ids(corpus, n_cells, id_col)), id_col
    )
    _drop_stale_table(spark, f"{table}_seeds")
    (
        seeds_src.select(F.col(id_col).alias("cell"), F.col(vec_col))
        .write.mode("overwrite").format("parquet")
        .saveAsTable(f"{table}_seeds")
    )
    # assignment reads the PERSISTED seeds back (metadata-sized scan)
    # instead of re-deriving the corpus-join subtree a second time
    seeds = with_norm(spark.table(f"{table}_seeds"), vec_col)
    # n_super derives from the PERSISTED seed count, not the requested
    # n_cells (ADVICE r12: stratified_seed_ids returns fewer seeds when
    # n_cells exceeds the corpus, and incremental_ivf_assign re-derives
    # n_super from the persisted table — the two must share one rule or
    # the incremental == rebuild invariant silently breaks). The count
    # is a metadata-sized scan of the just-written seeds parquet.
    n_seeds = spark.table(f"{table}_seeds").count()
    assigned = two_level_assign_cells(
        c, seeds, id_col,
        n_super=adaptive_super_count(n_seeds), n_seeds=n_seeds,
    ).select(id_col, "cell")
    _drop_stale_table(spark, table)
    (
        assigned.write.mode("overwrite").format("parquet")
        .bucketBy(n_buckets, "cell").sortBy("cell")
        .saveAsTable(table)
    )
    _drop_stale_table(spark, f"{table}_stats")
    (
        spark.table(table)
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n_standing"))
        .write.mode("overwrite").format("parquet")
        .saveAsTable(f"{table}_stats")
    )
    return n_seeds


def incremental_ivf_assign(
    batch: DataFrame,
    seeds: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign a NEW vector batch to the EXISTING seed set: one broadcast
    of the metadata-sized seeds table, one codegen pass over the batch —
    (id, cell, cos). The standing archive is NEVER in this plan
    (no assignment-table scan, no corpus-vector scan, no k-means
    re-fit; tests/test_similarity.py pins the plan) — the refresh
    cost is O(batch), not O(archive), the defining property of
    incremental index maintenance.

    The assignment rule is IDENTICAL to the full build's
    (:func:`two_level_assign_cells` — the rep set and the adaptive
    n_super are re-derived deterministically from the seeds table
    alone: both sides count the PERSISTED seeds and apply the same
    :data:`FLAT_MAX_CELLS` crossover, ADVICE r12), so unioning these
    rows into the standing table yields bit-for-bit the table a
    from-scratch rebuild over corpus ∪ batch would produce — as long
    as the seed set is unchanged, which is exactly what the drift
    report monitors.
    """
    b = with_norm(ensure_parallelism(batch), vec_col)
    s = with_norm(seeds, vec_col)
    return two_level_assign_cells(b, s, id_col, keep_cos=True).select(
        id_col, "cell", F.col("cell_cos").alias("cos")
    )


def ivf_drift_report(
    new_assign: DataFrame,
    stats: DataFrame,
    retrain_tv_ppm: int = 200_000,
) -> DataFrame:
    """Per-cell occupancy drift of a newly assigned batch against the
    standing index, INTEGER-EXACT: each side's cell share is the exact
    BIGINT ppm ``n · 1e6 DIV N``, the drift is the total-variation
    style sum ``tv_ppm2 = Σ_cells |ppm_standing − ppm_batch|`` (= 2·TV
    in ppm, up to DIV truncation — deterministic in any engine at any
    scale, no float summation order in sight), and ``retrain`` fires
    when tv_ppm2 exceeds ``2 · retrain_tv_ppm`` (default: 20% total
    variation — the point where enough mass sits in the wrong cells
    that probe recall degrades and a new ⌈√n⌉ seed draw is due).

    Output: one row per cell seen on EITHER side
    (cell, n_standing, n_batch, ppm_standing, ppm_batch, tv_ppm2,
    retrain) — batch-absent cells carry n_batch = 0 and standing-empty
    cells carry n_standing = 0 (a FULL outer join: batch mass landing
    in a cell the standing index never populated is precisely the
    drift this report exists to catch — ADVICE r11 flagged the old
    left join silently dropping it from both the rows and _nb_tot) —
    and the global pair rides every row via a broadcast single-row
    aggregate, so the report is self-contained for per-cell AND
    whole-index consumers.

    Scale shape: the batch collapses to its cell grain in one map-side
    aggregate; everything after runs on the cell grain (≤ ⌈√n⌉ rows).
    The standing side reads the persisted ``{table}_stats`` — never the
    assignment table, never the archive vectors.
    """
    b = new_assign.groupBy("cell").agg(
        F.count(F.lit(1)).cast("long").alias("n_batch")
    )
    per = (
        stats.join(b, "cell", "full_outer")
        .withColumn(
            "n_standing",
            F.coalesce(F.col("n_standing"), F.lit(0).cast("long")),
        )
        .withColumn(
            "n_batch", F.coalesce(F.col("n_batch"), F.lit(0).cast("long"))
        )
    )
    # eager checkpoint barrier (the cramers_v_assoc pattern): three
    # consumers derive from `per` (the per-cell rows, the totals, the
    # TV sum) and without a barrier Catalyst re-executes the whole
    # batch-assignment subtree under each — the r11 plan audit showed
    # the assignment running 3x. `per` is cell-count-sized (≤ ⌈√n⌉
    # rows), so the checkpoint is a metadata-sized job.
    per = per.localCheckpoint(eager=True)
    tot = per.agg(
        F.sum("n_standing").cast("long").alias("_ns_tot"),
        F.sum("n_batch").cast("long").alias("_nb_tot"),
    )
    shared = per.crossJoin(F.broadcast(tot)).select(
        "cell",
        "n_standing",
        "n_batch",
        F.expr(
            "CASE WHEN _ns_tot = 0 THEN CAST(0 AS BIGINT) "
            "ELSE n_standing * 1000000 DIV _ns_tot END"
        ).alias("ppm_standing"),
        F.expr(
            "CASE WHEN _nb_tot = 0 THEN CAST(0 AS BIGINT) "
            "ELSE n_batch * 1000000 DIV _nb_tot END"
        ).alias("ppm_batch"),
    )
    tv = shared.agg(
        F.sum(F.abs(F.col("ppm_standing") - F.col("ppm_batch")))
        .cast("long")
        .alias("tv_ppm2")
    )
    return shared.crossJoin(F.broadcast(tv)).select(
        "cell",
        "n_standing",
        "n_batch",
        "ppm_standing",
        "ppm_batch",
        "tv_ppm2",
        (F.col("tv_ppm2") > F.lit(2 * retrain_tv_ppm)).alias("retrain"),
    )


def maxsim_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    doc_col: str = "doc_id",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int | None = None,
    s_probe: int | None = None,
) -> DataFrame:
    """Multi-vector late-interaction retrieval — ColBERT-style maxsim
    (Khattab & Zaharia, SIGIR 2020; VERDICT r11 #4): documents carry
    SETS of vectors in long format (doc, vec_id, embedding), and
    score(q, d) = Σ over q's vectors of max over d's vectors of
    similarity. The retrieval shape modern curation/training pipelines
    use when one pooled vector per document loses too much.

    Built on the proven substrate, never all-pairs:

    - **IVF-cell prefilter**: corpus vectors take their two-level cell
      (:func:`two_level_assign_cells` — zero-exchange map); each QUERY
      vector probes ALL cells of its ``s_probe`` nearest SUPERCELLS
      (the query side is bounded by contract and broadcast
      everywhere). Probing must follow the same hierarchy the corpus
      was routed by: flat-ranked probe cells measured recall 0.47 on
      the clustered fixture because the flat ranking and the two-level
      placement disagree near supercell boundaries; hierarchical
      probing holds ≥0.73 there. Candidate (query-vector, doc-vector)
      pairs come only from matching cells.
    - **Integer scoring**: the shortlist is scored by exact BIGINT dot
      products over corpus-global int8 codes
      (``vectors.quantize_global_q8`` — one global scale, so code dots
      are comparable across rows), folded JVM-side; a query-vector ×
      doc pair with no candidate in any probed cell contributes 0,
      the standard approximate-maxsim semantics.
    - **maxsim reduction**: max per (query doc, query vector, doc),
      then sum per (query doc, doc) — two map-side-combined aggregates
      on shrinking grains; top-``k`` docs per query doc by
      (score DESC, doc ASC).

    Queries must be drawn from the corpus (their codes come from the
    corpus-scale quantization) — unknown ids fail loudly, exactly like
    ``cosine_topk_ivfpq``.

    Output: (q_doc, d_doc, maxsim, rk), rk ≤ k. Self-doc pairs are
    excluded. All ranking arithmetic is integer — bit-exact in any
    engine; the float routing is the same deterministic rule the IVF
    oracles replay.

    Scale shape: no corpus-wide shuffle before the candidate join (the
    cell assignment is a map; the query side rides broadcasts); the
    candidate set — |query vecs| × probed-cell occupancy — is the only
    relation that shuffles (once, onto the corpus code table's id key),
    and every aggregate after runs on candidate or doc grain.
    """
    import math

    from ram_datapipeline_spark.operators.vectors import quantize_global_q8

    n = corpus.count()
    if n_cells is None:
        n_cells = scaled_cell_count(n)
    # the INLINE maxsim index keeps the always-hierarchical rule (not
    # the r13 adaptive flat switch the persisted write_ivf_index family
    # uses): the supercell layer here IS the probe structure — each
    # query vector probes whole supercells — and there is no standing
    # index whose small-corpus fixed costs need amortizing (one-shot
    # build, no seed read-back, no drift barrier)
    n_super = scaled_super_count(n_cells)
    if s_probe is None:
        s_probe = math.ceil(math.sqrt(n_super))
    c = with_norm(ensure_parallelism(corpus), vec_col)
    q = with_norm(queries, vec_col)
    # eager checkpoint on the metadata-sized seed set: six consumers
    # derive from it (rep array, seed-super map, both routing passes,
    # the query-probe reps and cell map) and each would otherwise
    # re-execute the corpus scan + seed join underneath — measured 15
    # corpus scans in the executed plan without the barrier, 3 with
    # (write_ivf_index gets the same effect from its persisted seeds
    # table; this is the inline-build equivalent)
    seeds = (
        c.join(
            F.broadcast(stratified_seed_ids(corpus, n_cells, id_col)),
            id_col,
        )
        .select(F.col(id_col).alias("cell"), "_e", "_nrm")
        .localCheckpoint(eager=True)
    )
    c_cells = two_level_assign_cells(
        c, seeds, id_col, n_super=n_super, extra_cols=(doc_col,)
    ).select(
        F.col(id_col).alias("_dv"), F.col(doc_col).alias("d_doc"), "cell"
    )
    # hierarchical query probing: top s_probe supercells per query
    # vector (window over the bounded query × n^¼ reps relation), then
    # EVERY cell of those supercells via the metadata-sized seed map
    reps = _rep_set(seeds, n_super).select(
        F.col("cell").alias("_rep"),
        F.col("_e").alias("_er"),
        F.col("_nrm").alias("_nr"),
    )
    rcos = _dot(F.col("_e"), F.col("_er")) / (F.col("_nrm") * F.col("_nr"))
    wq = Window.partitionBy(id_col).orderBy(F.desc("_rcos"), F.asc("_rep"))
    q_super = (
        q.crossJoin(F.broadcast(reps))
        .withColumn("_rcos", rcos)
        .withColumn("_srk", F.row_number().over(wq))
        .filter(F.col("_srk") <= s_probe)
        .select(
            F.col(id_col).alias("_qv"),
            F.col(doc_col).alias("q_doc"),
            F.col("_rep").alias("_super"),
        )
    )
    q_cells = q_super.join(
        F.broadcast(
            seeds_with_super(seeds, n_super).select("cell", "_super")
        ),
        "_super",
    ).select("_qv", "q_doc", "cell")
    cand = (
        c_cells.join(F.broadcast(q_cells), "cell")
        .filter(F.col("d_doc") != F.col("q_doc"))
        # a doc vector reachable via several probed cells of one query
        # vector must score once
        .select("q_doc", "_qv", "d_doc", "_dv")
        .distinct()
    )

    c8 = quantize_global_q8(corpus, vec_col=vec_col).select(
        id_col, "codes"
    ).localCheckpoint()
    n_unknown = queries.select(id_col).join(
        c8.select(id_col), id_col, "left_anti"
    ).count()
    if n_unknown:
        raise ValueError(
            f"maxsim_topk: {n_unknown} query ids absent from the corpus — "
            "out-of-corpus queries need corpus-scale quantization first "
            "(quantize_global_q8 bounds)"
        )
    qa = c8.join(
        queries.select(id_col), id_col, "left_semi"
    ).select(F.col(id_col).alias("_qv"), F.col("codes").alias("_qc"))
    ca = c8.select(F.col(id_col).alias("_dv"), F.col("codes").alias("_dc"))
    # CENTERED integer dot: (q-128)·(d-128), the signed-int8 symmetric
    # form — the raw [0,255] codes are min-shifted all-positive, and
    # their dot is dominated by the shift bias (measured: cluster
    # structure lost on the seeded fixture); centering removes the bias
    # while every step stays exact BIGINT
    idot = F.aggregate(
        F.zip_with(
            F.col("_qc"),
            F.col("_dc"),
            lambda x, y: (x - F.lit(128)) * (y - F.lit(128)),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        cand.join(F.broadcast(qa), "_qv")
        .join(ca, "_dv")
        .withColumn("_dot", idot)
        .groupBy("q_doc", "_qv", "d_doc")
        .agg(F.max("_dot").alias("_best"))
    )
    agg = scored.groupBy("q_doc", "d_doc").agg(
        F.sum("_best").cast("long").alias("maxsim")
    )
    w = Window.partitionBy("q_doc").orderBy(F.desc("maxsim"), F.asc("d_doc"))
    return (
        agg.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select("q_doc", "d_doc", "maxsim", "rk")
    )


def ivf_retrain_plan(
    drift: DataFrame, overload_factor: int = 4
) -> DataFrame:
    """Retrain/split planner closing the incremental-ANN loop
    (build → incremental assign → drift monitor → THIS): given the
    per-cell drift report (:func:`ivf_drift_report` output), decide
    what index maintenance the grown corpus needs — entirely from
    cell-grain metadata, never touching the archive vectors or the
    assignment table.

    Per cell: ``n_total = n_standing + n_batch``; a cell is
    ``overloaded`` when its occupancy exceeds ``overload_factor``× the
    post-retrain mean (``n_total · new_n_cells > factor · N`` — exact
    BIGINT cross-multiplication, the bucket-balance criterion the ANN
    tests hold), and ``split_into = ⌈n_total · new_n_cells / N⌉`` is
    its target shard count. Globals riding every row:
    ``new_n_cells = ⌈√N⌉`` (the seed count a from-scratch retrain would
    draw), ``n_overloaded``, ``est_moved_rows`` (rows a split-only
    maintenance pass would rewrite — the cost comparison against a full
    retrain's N), and ``retrain_full`` (the drift trigger, carried
    through): fire a full re-seed when occupancy DRIFT says the seed
    set no longer matches the distribution; otherwise split the
    overloaded cells in place and leave the rest of the archive
    untouched.

    All integer except ⌈√N⌉ (one correctly-rounded sqrt, both engines
    identical). Scale shape: input is already cell grain (≤ ⌈√n⌉
    rows); one eager barrier, one 1-row broadcast — metadata-sized end
    to end.
    """
    base = drift.select(
        "cell",
        (F.col("n_standing") + F.col("n_batch")).alias("n_total"),
        "retrain",
    ).localCheckpoint(eager=True)
    tot = base.agg(
        F.sum("n_total").cast("long").alias("_N"),
        F.max(F.col("retrain")).alias("retrain_full"),
    ).select(
        "_N",
        F.ceil(F.sqrt(F.col("_N").cast("double")))
        .cast("long")
        .alias("new_n_cells"),
        "retrain_full",
    )
    per = base.crossJoin(F.broadcast(tot)).select(
        "cell",
        "n_total",
        (
            F.col("n_total") * F.col("new_n_cells")
            > F.lit(int(overload_factor)) * F.col("_N")
        ).alias("overloaded"),
        F.expr(
            "(n_total * new_n_cells + _N - 1) DIV _N"
        ).alias("split_into"),
        "new_n_cells",
        "retrain_full",
        "_N",
    )
    glob = per.agg(
        F.coalesce(
            F.sum(F.when(F.col("overloaded"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_overloaded"),
        F.coalesce(
            F.sum(
                F.when(F.col("overloaded"), F.col("n_total")).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("est_moved_rows"),
    )
    return per.crossJoin(F.broadcast(glob)).select(
        "cell",
        "n_total",
        "overloaded",
        "split_into",
        "new_n_cells",
        "n_overloaded",
        "est_moved_rows",
        "retrain_full",
    )
