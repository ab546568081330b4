"""The declared query inventory (SURVEY.md §2 Part B).

Importing this package registers every query with
``project_map_reduce_spark.registry``. One module per inventory family.

The external correctness driver hash-checks the FIRST 50 registrations
per round, so registration order is an explicit, versioned decision:
``_DRIVER_WINDOW`` below lists exactly which 50 queries occupy the
window this round (never-driver-checked queries first, then this
round's new/changed queries, then families whose last green signal
predates the Spark 4.1 environment change). Everything else was
driver-green in round 2 and unchanged since; it keeps pytest + local
parity coverage at positions 51+.
"""

from project_map_reduce_spark import registry
from project_map_reduce_spark.plans import (  # noqa: F401
    windows,
    udfs,
    text_analysis,
    streaming_shaped,
    agg_extra,
    joins,
    scalars,
    dedup,
    similarity,
    aggregates,
    scans,
    filters,
    sort_topk,
    setops,
    sampling,
    olap_extra,
    pipeline_guard,
    event_analytics,
    sql_surface,
    packing,
    multimodal_shaped,
    warehouse,
    graph,
)

_DRIVER_WINDOW = [
    # -- round-6 rotation (VERDICT r5 item 1): first, the five round-5
    #    queries that landed after the round-5 window froze and have
    #    never carried a driver-authoritative hash.
    "q_stream_dedup_watermark",
    "q_join_interval_stream",
    "q_quality_classifier",
    "q_embedding_quantize",
    "q_dedup_substring",
    # -- new this round (VERDICT r5 items 7 and 4, plus the
    #    stream-static enrichment join): in the window from birth.
    "q_dedup_substring_removal",
    "q_quality_classifier_trained",
    "q_stream_enrich",
    # -- also new this round: the warehouse/graph/audio additions
    #    (SCD2 rebuild, bloom-pruned join, PageRank, WAV round-trip).
    "q_scd2_merge",
    "q_join_bloom",
    "q_pagerank",
    "q_audio_features",
    "q_stream_sessions",
    "q_timeseries_fill",
    "q_cdc_apply",
    "q_events_attribution",
    "q_hll_rollup",
    "q_mv_incremental",
    "q_partition_prune",
    "q_profile_columns",
    "q_doc_chunks",
    "q_not_in",
    # -- then 28 of the 49 queries whose last driver signal is round-4
    #    vintage (each judge-re-verified via tools/parity.py in r5).
    #    The twenty-one left out — q_string_funcs, q_date_funcs,
    #    q_math_funcs, q_datediff, q_array_ops, q_map_ops,
    #    q_window_lag_lead, q_window_rank, q_window_moving,
    #    q_window_range, q_split_train_val, q_udaf_weighted_mean,
    #    q_agg_rollup, q_join_theta (pure deterministic scalar/
    #    collection/window/hash/grouping-set/inequality functions,
    #    lowest drift risk — q_agg_cube stays in-window covering the
    #    same Expand machinery) plus q_dedup_incremental,
    #    q_not_exists, q_pipeline_e2e, q_multimodal_dims,
    #    q_join_bucketed, q_sample_temperature, q_join_salted
    #    (displaced by this round's fourteen new queries, which have
    #    NO driver signal yet) — rotate in round 7. Everything
    #    displaced was driver-green in CORRECTNESS_r04/r05,
    #    judge-re-verified in r5, and keeps pytest + local-parity
    #    coverage at positions 51+.
    "q_join_inner",
    "q_join_multi",
    "q_join_left_outer",
    "q_join_full_outer",
    "q_join_semi",
    "q_join_anti",
    "q_join_broadcast",
    "q_join_asof",
    "q_pricing_summary",
    "q_agg_distinct",
    "q_agg_cube",
    "q_agg_grouping_sets",
    "q_dedup_exact",
    "q_dedup_fuzzy",
    "q_similarity_topk",
    "q_text_stats",
    "q_text_tfidf",
    "q_pandas_udf_scalar",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash",
    "q_dedup_embedding",
    "q_similarity_ann",
    "q_lang_id",
    "q_text_quality",
    "q_doc_fingerprint",
    "q_dedup_clusters",
    "q_window_distribution",
    "q_pack_sequences",
]

if len(_DRIVER_WINDOW) != 50:  # explicit: `assert` vanishes under -O
    raise RuntimeError(
        f"_DRIVER_WINDOW must hold exactly 50 queries, has {len(_DRIVER_WINDOW)}"
    )
registry.reorder(_DRIVER_WINDOW)
