#!/usr/bin/env python
"""Scaling probe: replicate the sf0.1 fact tables K× (keys offset so join
cardinalities scale linearly), run headline queries at both scales, and
report the wall-clock ratio. Near-K× input with ≪K× wall-clock (local)
and ~linear task counts is the evidence that the plans scale by
partitioning, not by luck.

Usage: python scripts/scale_probe.py [K]   (default 16)
Writes scaled parquet under /tmp/spark_graft_scale_sf<K>/ and prints one
JSON line with both timings per query.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ram_datapipeline_spark import queries as Q  # noqa: E402
from ram_datapipeline_spark.catalog import TABLE_NAMES  # noqa: E402
from ram_datapipeline_spark.session import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"
PROBES = ["q1_pricing_summary", "q3_revenue_topk", "eta_nearest_poi",
          "w3_topk_per_group", "dedup_exact", "pipe_segment_dedup",
          "vec_kmeans_q8", "ts_gapfill_locf",
          # round-3 additions: the changed/new plans with scale risk
          "mm_payload_embedding", "j2_point_in_geojson", "eta_routed_osm",
          "graph_label_propagation", "pipe_domain_quota", "vec_pq_codes",
          # round-4 additions: CRP routing (fixed-size network, scaled
          # origins/POIs), semantic dedup (scaled corpus → more LSH
          # planes), IVF-PQ, interval bucketing, watermark drop
          "eta_routed_osm_large", "dedup_semantic", "sim_cosine_topk_ivfpq",
          "j_interval_overlap", "st_late_data_drop",
          # round-5 additions: two-level CRP (fixed network, scaled
          # entities), rerank ANN, partitioned-layout round trip, EWMA fold
          "eta_routed_osm_xlarge", "sim_ivfpq_rerank",
          "k_partitioned_prune", "ts_ewma_smooth",
          # round-5 late additions: candidate-bounded frequent items,
          # Bloom-pruned join, substring-span dedup, BPE vocab rounds
          "agg_heavy_hitters", "j_bloom_prefilter",
          "dedup_repeated_spans", "pipe_bpe_merges",
          # round-6 additions: three-level CRP (fixed network, scaled
          # entities), batched BPE, mixed-format image dedup, CMS cell
          # table, MMR (query-bounded), BPE segment projection
          "eta_routed_osm_planet", "pipe_bpe_merges_batched",
          "mm_image_ahash_dedup", "agg_count_min_sketch",
          "sim_mmr_rerank", "pipe_bpe_segment_tokens",
          # round-7 additions: ranked retrieval (posting lists scale
          # with the corpus, weights stay query-sized)
          "text_keyword_rank_any",
          # round-7 additions: sketch rollup (merge input stays
          # sketch-sized as the corpus grows), delta maintenance (both
          # partials scale, merge stays group-sized), Morton layout
          # (pure map + one agg), outer interval join (events² risk
          # bounded by the user_id equi-key)
          "agg_kmv_merge_rollup", "agg_incremental_maintain",
          "pipe_zorder_layout", "st_view_click_outer",
          # round-7 additions: sketch set algebra (pair join stays
          # sketch-sized), TWAP (window+agg share one exchange),
          # profiling (count-distinct expand is the scale cost)
          "agg_kmv_set_algebra", "ts_time_weighted_avg",
          "pipe_profile_table",
          # round-7 addition: layout roundtrip (write cost scales, the
          # pruned read opens the same 6 directories at any corpus size)
          "k_zorder_prune_roundtrip",
          # round-7 addition: compaction plan (corpus scan shrinks to a
          # per-hour metadata table before the single global window)
          "pipe_compaction_plan",
          # round-7 late additions: global index (range exchange + Arrow
          # pass both linear; driver traffic = one long per partition),
          # canonical pick (window bounded by dup-cluster size), ORC
          # round-trip (columnar write+read, embarrassingly parallel)
          "pipe_global_index", "dedup_canonical_pick", "k_orc_roundtrip",
          # round-7 late addition: JL projection (zero-shuffle codegen map)
          "vec_random_projection",
          # round-7 late addition: accessibility indicator (one extra
          # conditional-sum agg after the nearest-POI reduce)
          "eta_accessibility_index",
          # round-7 late addition: time-RANGE window frame (one user-key
          # exchange; frame evaluation is a per-partition ordered scan)
          "w7_time_range_frame",
          # round-7 late addition: prefix-filtered exact Jaccard (the
          # candidate exchange carries only rare-shingle postings)
          "dedup_prefix_filter_pairs",
          # round-8 additions: KMV profile (the scale default — each
          # column's final exchange carries k rows, not the exact
          # expand), global prefix sum (range exchange + Arrow pass,
          # both linear), novelty (two map-side-combined gram/doc
          # aggregates), zero-config planet routing (fixed network,
          # scaled origins/POIs — derivation cost is cell-graph-bound)
          "pipe_profile_table_kmv", "pipe_global_offsets",
          "text_ngram_novelty", "eta_routed_osm_planet_auto",
          # round-8 additions: BM25 (posting lists scale, weights stay
          # query-sized), lexical diversity (map-only), SNM dedup
          # (candidates = window x N, linear by construction),
          # systematic sample (range exchange + broadcast total),
          # histogram/outliers (group-bounded windows + broadcasts),
          # rolling z-score (one key-partitioned window), corpus
          # shuffle + quantile normalize (range exchange / group windows)
          "text_bm25_rank", "text_lexical_diversity",
          "dedup_sorted_neighborhood", "pipe_systematic_sample",
          "agg_histogram", "agg_robust_outliers", "ts_anomaly_zscore",
          "pipe_corpus_shuffle", "pipe_quantile_normalize",
          # round-8 late additions: native session_window (one key
          # exchange, merge in the aggregation buffer), rational
          # interpolation (anchors+grid through one key exchange),
          # mixture planner (one corpus agg + broadcast total),
          # proportional interleave (rank window + range exchange),
          # bounded k-hop reach (frontier equi-joins; candidate set =
          # the output being built)
          "ev_sessionize_batch", "ts_resample_interp",
          "pipe_mixture_epochs", "pipe_interleave_sources",
          "graph_khop_reach",
          # round-8 late additions: weighted median (window input is the
          # distinct-value grain, not rows), corr components (one
          # map-side-combined agg), length buckets (bucket-keyed rank
          # window), type transitions (one user-keyed lag window)
          "agg_weighted_median", "agg_corr_components",
          "pipe_length_buckets", "ev_type_transitions",
          # round-8 late additions: RFM (cutoffs broadcast as 4-element
          # arrays per metric, windows on the distinct-value grain),
          # exact mode (group-bounded rank window), fertility (one
          # agg), running distinct (two key-partitioned windows)
          "ev_rfm_scores", "agg_mode_exact",
          "pipe_tokenizer_fertility", "w8_running_distinct",
          # round-8 late additions: CUSUM (one window pass), forward
          # as-of (union + one key window). sim_hard_negatives is NOT
          # probed: it is the fenced brute-force baseline (quadratic by
          # definition, like the un-probed sim_cosine_topk/pairs) — the
          # scale path swaps its candidate stage for IVF/LSH
          "ts_cusum_drift", "j_asof_forward",
          # round-8 late additions: nearest as-of (one exchange, two
          # window passes), LSH blocking audit (bucket/posting-bounded
          # sides reduced to one count row)
          "j_asof_nearest", "dedup_minhash_eval",
          # round-8 late addition: RAKE (per-document by definition —
          # every exchange keys on the doc id)
          "text_rake_keyphrases",
          # round-8 final additions: HHI (two map-side aggs), gap
          # stats (one key window+agg), dup rate (one agg; KMV is the
          # documented at-scale distinct swap)
          "agg_hhi_concentration", "ev_inter_event_stats",
          "pipe_dup_rate_by_source",
          # round-9 additions: bounded as-of (tolerance is a pure
          # projection after the same one-exchange carry; the tiebreak
          # adds one (key, ts)-keyed window on the right side), and the
          # normalized quality gate (score projection + the
          # single-conditional-aggregate cutoff pass broadcast back)
          "j_asof_tolerance", "pipe_corpus_quality_gate",
          # round-9 additions: RRF (fusion plan is top-n-bounded; only
          # the two retrieval stages touch the corpus), state-at-event
          # as-of (SCD2 build + one as-of key exchange, no range join)
          "text_rrf_fusion", "j_event_state_asof",
          # round-9 late addition: skyline (x-grain reduce, prefix-max
          # fold on the distinct-x table, equi-join back — the x-grain
          # table is what the exchanges carry, never row pairs)
          "w9_pareto_front",
          # round-9 late addition: seasonal means (one map-side
          # (key, hour) aggregate + tiny roll-up broadcast back)
          "ts_seasonal_means",
          # round-10 additions: incremental dedup (corpus side scales
          # but only as a bucketed (id, bkey) scan — batch hashing and
          # the survivor-sized verdict are the moving parts), and
          # incremental components (standing labels scale only through
          # the broadcast-patch join; propagation runs on the
          # batch-scale mini graph)
          "dedup_incremental_batch", "dedup_incremental_components",
          # round-10 addition: B-cubed eval (cluster-grain cells are
          # what the final exchanges carry; CC is the probed substrate)
          "dedup_bcubed_eval",
          # round-10 late additions: KS drift (one event-sized count,
          # then groups x quantized-values grain), ACF (one ordered
          # window exchange, (key, lag)-grain agg rides it), Theil-Sen
          # (one (key, hour) agg; pair work bounded at 276/key), Gopher
          # rules (zero-exchange codegen projection)
          "agg_ks_drift", "ts_acf_lags", "ts_theil_sen",
          "pipe_gopher_rules",
          # round-10 late additions: Mann-Whitney (same substrate as
          # KS), funnel latency (user-keyed chain + 2-row stage grain),
          # Cramer's V (one count + levels-grain grid), RA index
          # (degree-oriented triangle machinery, explode = #triangles)
          "agg_mann_whitney", "ev_funnel_latency",
          "agg_cramers_v", "graph_resource_allocation",
          # round-10 late additions: Spearman (one key exchange, four
          # windows share it), scene cut (one Arrow pass, lag in-kernel)
          "agg_spearman_corr", "mm_scene_cut",
          # round-10 late additions: Gini (one key exchange), Pareto
          # shares (two range exchanges on the user grain), interval
          # merge (two windows + agg on one key exchange)
          "agg_gini_value", "ev_power_users_pareto",
          "ts_interval_merge",
          # round-10 late addition: VAD (zero-shuffle kernel + one
          # media-keyed island exchange)
          "mm_audio_vad",
          # round-10 late additions: Benford (one (group, digit) count
          # + 9-row broadcast), ANOVA F (one group agg + k-row fold)
          "agg_benford_digits", "agg_anova_f",
          # round-11 additions: incremental IVF maintenance (index build
          # scales with the corpus; the batch probe is one broadcast
          # pass over the batch side only) and its drift monitor (cell
          # grain after one map-side batch aggregate)
          "sim_incremental_ivf", "sim_ivf_drift",
          # round-11 late additions: event analytics (user/bucket-grain
          # aggregates after one corpus pass), rolling slope + Kendall
          # (one key exchange / bucket-grain pairs), chi2 terms (one
          # (doc, term)-grain distinct), binary Hamming (zero-shuffle
          # pack + broadcast probe), matryoshka (map + one global agg)
          "ev_retention_cohorts", "ev_stickiness_ratio",
          "ev_attribution_touch", "ts_rolling_slope", "agg_kendall_tau",
          "text_chi2_terms", "vec_binary_hamming_topk",
          "vec_matryoshka_energy",
          # round-12 additions: late-interaction maxsim (corpus routed
          # by the zero-exchange two-level rule, bounded query side,
          # candidate-grain aggregates) and the k-anonymity audit (one
          # QI-grain aggregate + class-grain totals)
          "sim_maxsim_topk", "pipe_k_anonymity",
          "pipe_dp_randomized_response",
          # holt: one hash aggregate, series bounded per user
          "ts_holt_linear",
          # retrain planner: cell-grain metadata end to end
          "sim_ivf_retrain_plan",
          # dataset card: one global + one lang-grain aggregate
          "pipe_dataset_card",
          # round-13 additions (VERDICT r12 #7): the two unprobed ~10s
          # graph entries — triangle/common-neighbor machinery whose
          # explode grain is the triangle count, the family the
          # resource-allocation probe covers only partially — plus the
          # repacked SimHash pair kernel (bucket-local join, integer
          # word Hamming)
          "graph_common_neighbors", "graph_clustering_coeff",
          "dedup_simhash_pairs"]

# key spans comfortably above sf0.1 maxima
C_SPAN, O_SPAN, L_SPAN = 10_000_000, 100_000_000, 100_000_000
U_SPAN, E_SPAN = 100_000, 1_000_000_000


def build_scaled(spark, k: int, out_dir: str) -> None:
    # SPARK_GRAFT_PROBE_REUSE=1 skips the rebuild when a complete scaled
    # copy already exists (the generator is deterministic, so same-K
    # output is identical run to run) — the 256x build costs more than
    # the probes themselves. Completeness is keyed on a _SUCCESS
    # sentinel written AFTER the full build (ADVICE r11: per-table path
    # existence treated an interrupted build — all directories present,
    # some partial — as complete and probed truncated data).
    sentinel = f"{out_dir}/_SUCCESS_K{k}"
    if os.environ.get("SPARK_GRAFT_PROBE_REUSE") == "1" and os.path.exists(
        sentinel
    ):
        return
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir)
    rep = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("_i")

    def scale(name: str, keys: dict[str, int]):
        df = spark.read.parquet(f"{BASE}/{name}.parquet").select("*", rep)
        for col, span in keys.items():
            df = df.withColumn(
                col,
                F.col(col) + F.col("_i").cast("long") * F.lit(span).cast("long"),
            )
        df.drop("_i").write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")

    scale("customer", {"c_custkey": C_SPAN})
    scale("orders", {"o_orderkey": O_SPAN, "o_custkey": C_SPAN})
    scale("lineitem", {"l_orderkey": O_SPAN})
    scale("documents", {"doc_id": C_SPAN})
    scale("embeddings", {"vec_id": C_SPAN})
    scale("events", {"event_id": E_SPAN, "user_id": U_SPAN})
    for name in TABLE_NAMES:
        dst = f"{out_dir}/{name}.parquet"
        if not os.path.exists(dst):
            # unscaled dimensions: copy through (small)
            src = f"{BASE}/{name}.parquet"
            shutil.copy(src, dst)
    with open(sentinel, "w") as fh:
        fh.write(str(k))


def run(spark, name: str, sf_dir: str) -> float:
    # Builder INSIDE the timed region (same methodology as bench.py):
    # several operators do real cluster work while constructing the
    # result — bounded driver collects in bpe_learn's merge rounds and
    # the Bloom bitmap build, the CRP overlay compile — and a write-only
    # timer would miss exactly the part whose scaling is in question.
    t0 = time.perf_counter()
    df = Q.REGISTRY[name].builder(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    out_dir = f"/tmp/spark_graft_scale_sf{k}"
    spark = get_spark(app_name="scale-probe")
    build_scaled(spark, k, out_dir)

    # Optional probe subset (comma-separated names) — deep-scale runs
    # (K=64) restrict to the cheap-but-scale-critical probes; the full
    # list at 64x would spend most of its wall on the known-linear
    # heavies (BPE, image decode) re-proving their 8x ratios.
    only = {
        s for s in os.environ.get("SPARK_GRAFT_PROBE_ONLY", "").split(",") if s
    }
    probes = [n for n in PROBES if not only or n in only]

    results = {}
    for name in probes:
        run(spark, name, BASE)  # warm
        base_t = run(spark, name, BASE)
        big_t = run(spark, name, out_dir)
        results[name] = {
            "sf0.1_s": base_t,
            f"x{k}_s": big_t,
            "wall_ratio": round(big_t / base_t, 2),
        }
    print(json.dumps({"k": k, "probes": results}))


if __name__ == "__main__":
    main()
