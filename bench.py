#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "sf": 0.1, "n_queries": N, "load": {...},
     "anchor_prev": {"commit": ..., "value": ...}}

Emission contract (round-9 fix for the r6 AND r8 ``parsed: null``): the
driver tail-captures only the LAST 2,000 bytes of stdout (measured from
BENCH_r08.json), and any line that grows with the suite eventually
outgrows it — r6 (4.7 KB) and r8 (2,422 B) both lost the round's
headline this way. Per-query timings therefore never appear on stdout:
the full-detail record (per-query + anchor per-query timings) is written
to ``artifacts/BENCH_local_detail.json``, and stdout gets ONE ~230-byte
line with a FIXED field set that cannot grow with the headline suite.

Each query is forced end-to-end with a noop-format write (full plan
execution, no driver-side collect — the same shape a cluster job has).
Per-query time excludes session startup; a warmup pass primes the JVM,
parquet footers, and whole-stage codegen before the timed run.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ram_datapipeline_spark import queries as Q  # noqa: E402
from ram_datapipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The previous round's final code state. Every bench run re-measures it
# on the SAME box in the same session (a detached git worktree running
# that commit's own bench.py) and reports it as "anchor_prev", so
# cross-round comparisons have a machine-drift control (VERDICT r5 #4:
# the recorded r4 number was 16% faster than r4 code achieves on a
# later day's box). Update this hash each round.
ANCHOR_COMMIT = "28d79da6951acd8ccd6873f43053c92e73393179"  # round-13 final

# One representative per operator family (SURVEY §2 + north-star ops);
# scale-sensitive choices on purpose: big-table aggs, multi-joins, window,
# pivot, spatial join, ETA kernel, dedup, text featurization, ANN.
HEADLINE = [
    "q1_pricing_summary",    # 600k-row scan + groupBy agg (A1/A6 family)
    "q3_revenue_topk",       # customer⋈orders⋈lineitem + top-k (J1/W2)
    "q5_region_revenue",     # 5-way join + agg (J1)
    "a2_pivot_eav",          # EAV pivot (A2)
    "w3_topk_per_group",     # window rank per group (W1)
    "agg_rollup_revenue",    # grouping sets over 4-way join
    "j2_point_in_admin",     # spatial point-in-polygon join (J2)
    "eta_nearest_poi",       # flagship: duration matrix + min-reduce (J4/A1)
    "eta_routed_kernel_grid",  # mapInPandas routing kernel, grid-pruned (U1)
    "eta_routed_graph",      # graph-routed ETA: hub closure + kernel (U1/U4)
    "eta_routed_osm",        # .osm scan → edge extraction → closure (S7/U4)
    "j2_point_in_geojson",   # general-polygon PIP, vectorized ray cast (J2)
    "mm_payload_embedding",  # single-pass byte-fold embedding (north star)
    "j_asof_click_view",     # as-of temporal join over events
    "st_sessionize",         # gap sessionization (stateful twin)
    "dedup_exact",           # content-hash dedup (north star)
    "dedup_minhash_lsh",     # MinHash+LSH candidate pairs (north star)
    "text_quality_score",    # text featurization (north star)
    "sim_cosine_topk",       # exact ANN top-k (north star)
    "sim_cosine_topk_lsh",   # LSH-bucketed ANN (north star)
    "sim_cosine_topk_ivf",   # IVF-partitioned ANN (north star)
    "mm_decode_image_stats",  # multimodal decode through Arrow (north star)
    "dedup_connected_components",  # iterative min-label propagation (north star)
    "pipe_segment_dedup",    # segment-level dedup + doc rebuild (north star)
    "vec_kmeans_q8",         # two-round distributed k-means (north star)
    "ts_gapfill_locf",       # time-series spine + LOCF windows
    "graph_triangle_count",  # degree-oriented wedge join, shuffle-heavy
    # round-4 additions (bench set is add-only so cross-round deltas stay
    # interpretable; the 27 rows above are the frozen comparison basis)
    "eta_routed_osm_large",  # partitioned CRP routing, 10,816-node network
    "k2_csv_roundtrip",      # sink write + re-read through real file I/O
    "dedup_semantic",        # embedding-space dedup, bucket-local pairs
    "sim_cosine_topk_ivfpq",  # IVF-PQ ANN over compressed codes
    # round-5 additions
    "ram_full_job",          # §3.1: the reference's entire job end-to-end —
                             # the heaviest single entry, keeps the full
                             # pipeline's regression surface benched
    "eta_routed_osm_xlarge",  # two-level CRP hierarchy, 16,384-node network
    "mm_image_ahash_dedup",  # image near-dup: real PNG decode → aHash → LSH
    "agg_heavy_hitters",     # two-pass Misra-Gries frequent items
    "j_bloom_prefilter",     # Bloom-pruned probe side before the join
    "pipe_bpe_merges",       # BPE vocab learning, 6 merge rounds
    "dedup_repeated_spans",  # cross-doc repeated-substring spans
    "pipe_dq_checks",        # Deequ-style data-quality report
    # round-6 additions
    "sim_ivfpq_rerank",      # IVF-PQ + exact rerank: the OTHER rerank
                             # setting, so both cost points stay benched
                             # (VERDICT r5 #5)
    "pipe_bpe_merges_batched",  # batched BPE, 64 merges in few rounds
    "eta_routed_osm_planet",  # three-level CRP hierarchy (VERDICT r5 #7)
    "sim_mmr_rerank",        # MMR diversity re-rank (cogrouped kernel)
    "agg_count_min_sketch",  # CMS cell table + broadcast probe join
    "pipe_bpe_segment_tokens",  # learn→segment round trip
    "text_keyword_search",   # posting-list intersection search
    "pipe_winsorize_caps",   # exact order-statistic outlier caps
    # round-7 additions
    "pipe_token_budget_select",  # token-budget mixture selection (r6-born)
    "text_keyword_rank_any",  # disjunctive tf-idf ranked retrieval
    "agg_kmv_merge_rollup",  # mergeable KMV sketch tables, nation→region
    "agg_incremental_maintain",  # partial-state merge == full recompute
    "pipe_zorder_layout",    # Morton key + z-bucket zone-map view
    "st_view_click_outer",   # stream-stream LEFT OUTER interval join twin
    "agg_kmv_set_algebra",   # theta-style sketch intersection estimates
    "ts_time_weighted_avg",  # TWAP, bigint µs×cents arithmetic
    "pipe_profile_table",    # single-scan ANALYZE profile
    "k_zorder_prune_roundtrip",  # curve-bucketed write -> pruned 2-D read
    "pipe_compaction_plan",  # metadata-sized sequential bin fill
    # round-7 late additions
    "pipe_global_index",     # total-order row index, no global window
    "dedup_canonical_pick",  # quality-argmax survivor per dup cluster
    "k_orc_roundtrip",       # columnar ORC sink write + re-read
    "vec_random_projection",  # JL sign-matrix projection (codegen map)
    "eta_accessibility_index",  # population-weighted share within T
    "w7_time_range_frame",   # rolling 1-hour RANGE frame per user
    "dedup_prefix_filter_pairs",  # PPJoin-style exact Jaccard join
    # round-8 additions
    "eta_routed_osm_planet_auto",  # zero-config derived hierarchy (HEM)
    "pipe_profile_table_kmv",  # KMV-sketched ANALYZE profile
    "text_ngram_novelty",      # corpus-wide first-occurrence novelty
    "pipe_global_offsets",     # distributed weighted prefix sum
    "text_bm25_rank",          # BM25 retrieval, rational idf
    "dedup_sorted_neighborhood",  # SNM sort-based blocking
    "pipe_systematic_sample",  # weight-proportional systematic sample
    "ts_anomaly_zscore",       # integer-exact rolling z-score flags
    "ev_sessionize_batch",     # native session_window gap sessions
    "ts_resample_interp",      # exact-rational grid interpolation
    "pipe_interleave_sources", # proportional training-order interleave
    "graph_khop_reach",        # bounded BFS frontier joins (1996-Q1)
    "agg_weighted_median",     # integer-exact weighted median
    "pipe_length_buckets",     # dynamic-padding batch packing
    "ev_rfm_scores",           # order-statistic RFM quintiles
    "w8_running_distinct",     # cumulative distinct per key
    "ts_cusum_drift",          # CUSUM drift via prefix-min identity
    "j_asof_forward",          # forward as-of join (time to conversion)
    "dedup_minhash_eval",      # LSH candidate precision/recall audit
    "text_rake_keyphrases",    # RAKE keyphrases, fixed-point scores
    # round-9 additions
    "j_asof_tolerance",        # bounded as-of + intra-ts tiebreak
    "pipe_corpus_quality_gate",  # per-source decile quality gate
    "text_rrf_fusion",         # hybrid-retrieval rank fusion
    "j_event_state_asof",      # SCD2 state-at-event-time as-of lookup
    "w9_pareto_front",         # 2-D skyline via prefix-max fold
    "ts_seasonal_means",       # hour-of-day seasonal profile (r9-born;
                               # VERDICT r9 #3 — was the one 90th query
                               # missing from the headline set)
    # round-10 additions
    "dedup_incremental_batch",  # batch-vs-persisted-index dedup (r9 #7)
    "dedup_incremental_components",  # cross-snapshot cluster maintenance
    "dedup_bcubed_eval",        # B-cubed clustering quality audit
    # round-10 late additions
    "agg_ks_drift",             # one-vs-rest KS distribution drift
    "ts_acf_lags",              # lag-1..3 autocorrelation screen
    "ts_theil_sen",             # robust hourly trend (median of slopes)
    "pipe_gopher_rules",        # Gopher quality-rule battery
    "agg_mann_whitney",         # rank-sum/AUC drift (KS companion)
    "ev_funnel_latency",        # exact conversion-lag rollup
    "agg_cramers_v",            # chi-square / Cramer's V association
    "graph_resource_allocation",  # RA link prediction (fixed-point 1/deg)
    "agg_spearman_corr",        # exact midrank Spearman per key
    "mm_scene_cut",             # video shot-boundary detection
    "agg_gini_value",           # exact Gini value-inequality per key
    "ev_power_users_pareto",    # top-k% user value shares (range-exchange)
    "ts_interval_merge",        # gaps-and-islands interval union
    "mm_audio_vad",             # voice-activity segments (energy islands)
    "agg_benford_digits",       # Benford first-digit conformity screen
    "agg_anova_f",              # one-way ANOVA F mean-shift screen
    # round-11 additions
    "sim_incremental_ivf",      # batch-vs-standing-seeds ANN maintenance
    "sim_ivf_drift",            # per-cell occupancy drift + retrain trigger
    "ev_retention_cohorts",     # first-active-week cohort matrix
    "ev_stickiness_ratio",      # weekly DAU/WAU in exact ppm
    "ev_attribution_touch",     # first/last-touch conversion attribution
    "ts_rolling_slope",         # trailing-16-row OLS slope per event
    "agg_kendall_tau",          # concordance on the bucket grain
    "text_chi2_terms",          # supervised chi-square term selection
    "vec_binary_hamming_topk",  # 1-bit sign-pack XOR+popcount shortlist
    "vec_matryoshka_energy",    # prefix-energy truncation profile
    # round-12 additions
    "sim_maxsim_topk",          # multi-vector late-interaction retrieval
    "pipe_k_anonymity",         # QI equivalence-class privacy audit
    "pipe_dp_randomized_response",  # LDP randomized-response estimates
    "ts_holt_linear",           # drift-aware double exponential smoothing
    "sim_ivf_retrain_plan",     # ANN maintenance planner on the cell grain
    "pipe_dataset_card",        # release summary sheet in one job
]


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def silence_bench_logs(spark) -> None:
    """Drop the bench session's log level to ERROR (VERDICT r9 #1).

    The headline suite's documented bounded global windows (prefix-fold
    metadata tables, top-n fusion tails) each emit a ``WARN WindowExec:
    No Partition Defined`` line per execution; at 91 queries x warmup+timed
    that is hundreds of lines, and the driver's tail capture holds only the
    LAST 2,000 bytes of output. The r6 and r8 bench records were both lost
    (``parsed: null``) to tail pollution; r9's tail was >90% WindowExec
    spam and survived only by print order. ERROR at the root silences every
    WARN source at once — the bench session has no use for warnings (every
    flagged window is contract-bounded and documented at its call site).
    """
    spark.sparkContext.setLogLevel("ERROR")


def main() -> None:
    sf = None
    base = os.path.basename(SF_DIR.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            pass

    # Load context (VERDICT r7 #4): the r7 driver capture disagreed in
    # sign with three idle-box runs because of concurrent background
    # load. Record the 1-min load average at start and end so the next
    # adjudication is mechanical, and warn loudly when the box is busy.
    load_start = round(os.getloadavg()[0], 2)
    if load_start > 4:
        print(
            f"WARNING: 1-min loadavg {load_start} at bench start — timings "
            "will be inflated by background load; prefer an idle box",
            file=sys.stderr,
        )

    spark = get_spark(app_name="ram-datapipeline-bench")
    silence_bench_logs(spark)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        # Steady-state methodology: one untimed warmup execution primes
        # JVM JIT, whole-stage codegen, and parquet footers — one-time
        # costs a long-lived cluster job never re-pays. clearCache()
        # between warmup and the timed run drops every persisted
        # intermediate, so the timed run re-does ALL data work (builder
        # included — iterative operators do real cluster work while
        # constructing the result) with only the code-level warmup kept.
        _run(Q.REGISTRY[name].builder(spark, SF_DIR))
        spark.catalog.clearCache()
        # Collect the PREVIOUS queries' garbage outside the timed region:
        # a 38-entry suite accumulates heap debt in one JVM, and without
        # this hint late entries pay earlier entries' GC (measured ~+20%
        # on the heavies; a cluster job in its own JVM never pays this).
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df = Q.REGISTRY[name].builder(spark, SF_DIR)
        _run(df)
        timings[name] = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    rec = {
        "metric": "headline_suite_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "load": {"start": load_start, "end": round(os.getloadavg()[0], 2)},
    }
    # Stop the JVM BEFORE emitting the contract line: log4j appenders are
    # asynchronous, and a warning flushed after the metric line would put
    # it above the driver's 2,000-byte tail window (VERDICT r9 #1 — the
    # r9 tail was >90% WindowExec warnings and the line survived only
    # because nothing happened to log after it). With the JVM gone,
    # nothing CAN print after the line.
    if os.environ.get("SPARK_GRAFT_ANCHOR", "1") != "0":
        spark.stop()  # free the JVM before the anchor's own session
        rec["anchor_prev"] = _anchor_prev()
        rec["anchor_degraded"] = anchor_degraded(
            rec["load"], rec["anchor_prev"].get("load")
        )
    else:
        spark.stop()

    # Full-detail record (anchor per-query timings included) goes to a
    # file; stdout gets one COMPACT final line the driver's tail capture
    # can always hold (VERDICT r6 next-round #1). Default target is the
    # UNCOMMITTED artifacts/BENCH_local_latest.json (VERDICT r10 #3: the
    # driver's per-round bench run used to overwrite the builder's
    # committed BENCH_local_detail.json, leaving the working tree dirty
    # and two conflicting common-set readings); only an explicit
    # SPARK_GRAFT_BENCH_RECORD=1 run — the builder's final idle-box
    # record — writes the committed detail file.
    try:
        art = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
        os.makedirs(art, exist_ok=True)
        name = (
            "BENCH_local_detail.json"
            if os.environ.get("SPARK_GRAFT_BENCH_RECORD") == "1"
            else "BENCH_local_latest.json"
        )
        with open(os.path.join(art, name), "w") as fh:
            json.dump(rec, fh, indent=1)
    except OSError:
        pass  # detail record is best-effort; the stdout line is the contract
    print(compact_line(rec))


def anchor_degraded(cand_load: dict | None, anchor_load: dict | None) -> bool:
    """True when the anchor phase ran on a measurably busier box than the
    candidate phase (VERDICT r11 #7): the anchor's worst 1-min loadavg
    exceeds TWICE the candidate's (floored at 1.0 so idle-vs-idle noise
    never flags). A degraded anchor inflates the anchor total and
    flatters the candidate ratio — r11's rep 3 (453s anchor) had to be
    discarded by prose; this makes the discard machine-readable."""
    try:
        a = max(float(anchor_load["start"]), float(anchor_load["end"]))
        c = max(float(cand_load["start"]), float(cand_load["end"]))
    except (TypeError, KeyError, ValueError):
        return False
    return a > 2.0 * max(c, 1.0)


def compact_line(rec: dict) -> str:
    """The one stdout line. VERDICT r8 #1: the driver's tail capture
    demonstrably holds only 2,000 bytes (the r8 line at 2,422 bytes lost
    its head — ``parsed: null`` recurred despite the r7 guard, which was
    sized against an assumed 4,000-byte cap). Per-query timings are now
    DROPPED from stdout entirely — they are persisted in
    ``artifacts/BENCH_local_detail.json`` (and the round record
    ``artifacts/BENCH_local_r{N}.json``) — and the line carries only the
    fixed-width fields ``{metric, value, unit, sf, n_queries, load,
    anchor_prev{commit,value|error}}``. That is ~230 bytes at worst-case
    widths: the line can no longer grow with the suite, so the failure
    mode is structurally gone, not re-guarded."""
    compact = {
        "metric": rec["metric"],
        "value": rec["value"],
        "unit": rec["unit"],
        "sf": rec["sf"],
        "n_queries": len(rec["queries"]),
        "load": rec["load"],
    }
    anchor = rec.get("anchor_prev")
    if isinstance(anchor, dict):
        compact["anchor_prev"] = {
            k: anchor[k] for k in ("commit", "value", "error") if k in anchor
        }
    if "anchor_degraded" in rec:
        compact["anchor_degraded"] = rec["anchor_degraded"]
    return json.dumps(compact, separators=(",", ":"))


def _anchor_prev() -> dict:
    """Same-box control measurement (VERDICT r5 #4): check out
    ``ANCHOR_COMMIT`` (the previous round's final code) into a detached
    worktree, run ITS bench.py against the same SF_DIR in a subprocess,
    and return its headline record — measured minutes apart on the same
    machine, so the cross-round delta is code, not machine drift. Any
    failure degrades to an error note, never a bench failure."""
    import shutil
    import subprocess
    import tempfile

    repo = os.path.dirname(os.path.abspath(__file__))
    wt = tempfile.mkdtemp(prefix="bench_anchor_")
    try:
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, ANCHOR_COMMIT],
            cwd=repo, check=True, capture_output=True, timeout=120,
        )
        env = dict(os.environ)
        env["SPARK_GRAFT_ANCHOR"] = "0"  # the anchor never recurses
        env["SPARK_GRAFT_SF_DIR"] = SF_DIR
        out = subprocess.run(
            [sys.executable, "bench.py"],
            cwd=wt, env=env, capture_output=True, text=True, timeout=1800,
        )
        line = [
            ln for ln in out.stdout.strip().splitlines()
            if ln.startswith("{")
        ][-1]
        prev = json.loads(line)
        # Since r9 the compact stdout line carries no per-query timings;
        # the anchor's own detail artifact has them (needed for the
        # common-set round-over-round comparison).
        queries = prev.get("queries")
        if queries is None:
            # r11+ anchors write BENCH_local_latest.json (uncommitted
            # run-scoped record); pre-r11 anchors wrote the committed
            # detail file — check both, newest convention first.
            for detail in ("BENCH_local_latest.json", "BENCH_local_detail.json"):
                try:
                    with open(os.path.join(wt, "artifacts", detail)) as fh:
                        queries = json.load(fh).get("queries")
                except (OSError, ValueError):
                    queries = None
                if queries is not None:
                    # only a file that actually HAS timings ends the
                    # search (ADVICE r11: breaking on the first file
                    # that merely parses skipped the next fallback)
                    break
        return {
            "commit": ANCHOR_COMMIT[:12],
            "value": prev.get("value"),
            "queries": queries,
            # the anchor phase's own box load (VERDICT r11 #7): rep 3's
            # 453s anchor ran on a degraded box and had to be
            # prose-adjudicated; recording load here lets main() flag it
            "load": prev.get("load"),
        }
    except Exception as e:  # noqa: BLE001 — anchor is best-effort
        return {"commit": ANCHOR_COMMIT[:12], "error": str(e)[:300]}
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=repo, capture_output=True,
        )
        shutil.rmtree(wt, ignore_errors=True)


if __name__ == "__main__":
    main()
