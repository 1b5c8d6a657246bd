"""Public API facade — the one-import surface of the engine.

A user of the reference interacts with it through env-var-configured jobs
(SURVEY §3): the analysis run, its sinks, and the conversion pipeline.
This module is that surface re-expressed as composable functions; every
name is independently oracle-gated through the suite.

    from ram_datapipeline_spark import api

    spark = api.get_spark()
    tables = api.load_tables(spark, "/data/sf0.1")
    eta = api.nearest_poi_eta(origins, pois)          # the core query
    api.run_ram_pipeline(spark, sf_dir, out_dir)      # the whole job
"""

from __future__ import annotations

# session / catalog
from ram_datapipeline_spark.analysis import plan_stats, plan_text  # noqa: F401
from ram_datapipeline_spark.catalog import load_tables  # noqa: F401
from ram_datapipeline_spark.session import ensure_parallelism, get_spark  # noqa: F401

# the reference's analytics core (SURVEY §2.3-2.4, §3.1)
from ram_datapipeline_spark.operators.eta import (  # noqa: F401
    accessibility_index,
    duration_matrix,
    eta_with_walk_penalty,
    min_duration,
    nearest_poi_eta,
    nearest_poi_eta_grid,
    nearest_poi_eta_routed,
    nearest_snap_distance,
    nearest_snap_distance_grid,
    routed_duration_matrix,
)
from ram_datapipeline_spark.operators.relational import (  # noqa: F401
    snapshot_diff,
    exact_money_sum,
    latest_per_key,
    pivot_eav,
    topk_per_group,
    unpivot,
)
from ram_datapipeline_spark.operators.spatial import (  # noqa: F401
    buffer_semi_join,
    knn_candidates,
    points_in_geojson_areas,
    points_in_rect_areas,
    square_grid,
    world_buffer_guard,
)
from ram_datapipeline_spark.operators.temporal import (  # noqa: F401
    asof_join,
    asof_join_forward,
    asof_join_nearest,
    cdc_apply,
    scd2_intervals,
)
from ram_datapipeline_spark.operators.skew import (  # noqa: F401
    bloom_prefilter_join,
    build_bloom_bitmap,
    salted_join,
    write_bucketed,
)
from ram_datapipeline_spark.operators.sketches import (  # noqa: F401
    count_min_sketch,
    hash_quantile_sketch,
    kmv_distinct_estimate,
    kmv_merge_sketches,
    kmv_sketch_estimate,
    kmv_sketch_table,
    misra_gries_heavy_hitters,
)
from ram_datapipeline_spark.operators.incremental import (  # noqa: F401
    finalize,
    merge_partials,
    partial_aggregate,
)
from ram_datapipeline_spark.operators.layout import (  # noqa: F401
    cluster_by_zorder,
    compaction_bins,
    global_row_index,
    morton_key,
    morton_key_sql,
)
from ram_datapipeline_spark.operators.quality import (  # noqa: F401
    completeness,
    dq_checks,
    max_bound,
    min_bound,
    profile_table,
    quantile_buckets,
    referential,
    rfm_scores,
    uniqueness,
    winsorize_caps,
)

# training-data pipeline (north star)
from ram_datapipeline_spark.operators.dedup import (  # noqa: F401
    canonical_pick,
    fuzzy_pairs,
    connected_components,
    exact_duplicates,
    minhash_lsh_pairs,
    near_dedup_survivors,
    ngram_jaccard_pairs,
    prefix_filter_pairs,
    repeated_spans,
    simhash,
    simhash_pairs,
)
from ram_datapipeline_spark.operators.similarity import (  # noqa: F401
    cosine_pairs,
    cosine_topk,
    cosine_topk_ivf,
    cosine_topk_ivfpq,
    cosine_topk_lsh,
    mmr_rerank,
)
from ram_datapipeline_spark.operators.text_ops import (  # noqa: F401
    bm25_rank,
    fingerprint,
    keyword_search_all,
    keyword_search_ranked,
    lang_id,
    pii_scrub,
    quality_features,
    quality_score_scaled,
    rolling_hash,
    rrf_fuse,
    shingles,
)
from ram_datapipeline_spark.multimodal.media import (  # noqa: F401
    downsample_wav_media,
    image_ahash_bands,
)
from ram_datapipeline_spark.multimodal.jpeg import (  # noqa: F401
    encode_blockflat_jpeg_media,
)
from ram_datapipeline_spark.multimodal import (  # noqa: F401
    audio_frame_energy,
    decode_image_stats,
    decode_jpeg_stats,
    decode_png_stats,
    decode_wav_stats,
    encode_gray8_png_media,
    encode_pcm8_wav,
    payload_embedding,
    payload_embedding_long,
    resize_images,
    resize_png_images,
    sample_frames,
    synthesize_media,
)

# sources / sinks (SURVEY §2.1)
from ram_datapipeline_spark.sources import (  # noqa: F401
    osm_ways_to_geojson,
    osm_ways_to_road_edges,
    read_geojson_features,
    read_geojson_points,
    read_osm_nodes,
    read_osm_ways,
)
from ram_datapipeline_spark.sinks import (  # noqa: F401
    append_metadata_event,
    flatten_poi_map,
    geojson_feature_collection,
    grouped_json,
    latest_metadata,
    write_csv,
    write_geojson_seq,
    write_orc,
    write_json_grouped,
    write_partitioned,
    write_results_normalized,
)

# streaming / operations (SURVEY §2.8, §3.2)
from ram_datapipeline_spark.streaming import (  # noqa: F401
    OperationLog,
    interval_join_attribution,
    interval_outer_attribution,
    read_events_stream,
    running_user_totals,
    session_window_agg,
    sessionize,
    tumbling_window_agg,
    write_stream_idempotent,
    write_stream_to_parquet,
)

# the full job (SURVEY §3.1)
from ram_datapipeline_spark.operators.corpus import (  # noqa: F401
    bpe_learn,
    bpe_segment,
    chunk_with_overlap,
    decontaminate,
    domain_quota,
    hash_sample,
    quality_funnel,
    segment_dedup,
    sequence_packing,
    split_assign,
    stratified_sample,
    temperature_weights,
    tfidf_topk,
    token_budget_select,
)
from ram_datapipeline_spark.operators.vectors import (  # noqa: F401
    kmeans_q8,
    l2_norm,
    pq_codes,
    label_centroids,
    normalize,
    quantize_global_q8,
    quantize_int8,
    random_projection,
)
from ram_datapipeline_spark.operators.graph import (  # noqa: F401
    common_neighbor_counts,
    hub_closure_rows,
    kcore_peel,
    label_propagation,
    make_hub_routing_kernel,
    min_plus_closure,
    pagerank_int,
    triangle_counts,
)
from ram_datapipeline_spark.operators.routing import (  # noqa: F401
    build_crp_index,
    derive_parent_map,
    closure_rows_gated,
    crp_many_to_many,
    multi_level_many_to_many,
    partitioned_many_to_many,
    route_many_to_many,
    two_level_many_to_many,
)
from ram_datapipeline_spark.operators.timeseries import (  # noqa: F401
    ewma_smooth,
    ohlc_bars,
    resample_gapfill_locf,
)
from ram_datapipeline_spark.plans import (  # noqa: F401
    assemble_corpus,
    run_corpus_pipeline,
    run_ram_pipeline,
)
