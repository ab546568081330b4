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
    # -- round-7 rotation (VERDICT r6 item 1): the twenty-one queries
    #    whose last driver hash is round-4 vintage — the oldest signal
    #    in the inventory — rotate in first. Staleness bookkeeping now
    #    lives in plans/driver_log.py (machine-checked by
    #    tests/test_plan_audit.py rather than comment-tracked).
    "q_tokenize_bpe",  # NEW this round (r7): trained BPE tokenizer
    "q_stream_mv_refresh",  # NEW (r7): exactly-once streaming MV refresh
    "q_cluster_prune",  # NEW (r7): range-clustered layout / row-group skipping
    "q_compact_small_files",  # NEW (r7): small-file compaction, driver-proven
    "q_schema_evolution",  # NEW (r7): mergeSchema evolved-column read
    "q_string_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_datediff",
    "q_array_ops",
    "q_map_ops",
    "q_window_lag_lead",
    "q_window_rank",
    "q_window_moving",
    "q_window_range",
    "q_split_train_val",
    "q_udaf_weighted_mean",
    "q_agg_rollup",
    "q_join_theta",
    "q_dedup_incremental",
    "q_not_exists",
    "q_pipeline_e2e",
    "q_multimodal_dims",
    "q_join_bucketed",
    "q_sample_temperature",
    "q_join_salted",
    # -- then 24 of the 50 round-5-vintage queries, drift-prone plan
    #    machinery first (streaming, Arrow/UDF, iterative, sampling,
    #    guard pipeline, OLAP stats, SQL surface). The 26 round-5
    #    queries left out (simple scan/filter/setop/topk scalar plans:
    #    q_case_when, q_filter_predicate, q_grouped_count,
    #    q_job_pipeline, q_join_range, q_json_extract,
    #    q_length_deciles, q_minmax_by, q_pivot_status, q_scalar_subquery,
    #    q_scan_count, q_scan_project,
    #    q_set_except, q_set_intersect, q_set_union_all,
    #    q_set_union_distinct, q_sort_multi, q_source_quota,
    #    q_string_agg, q_time_rollup, q_token_count, q_topk_global, q_topk_per_group,
    #    q_unpivot, q_value_histogram, q_zscore_outliers) are exactly
    #    two rounds old this round and rotate in round 8 — see
    #    plans/driver_log.py.
    "q_events_tumbling",
    "q_events_sliding",
    "q_events_session",
    "q_stream_dedup",
    "q_stream_totals",
    "q_watermark_late",
    "q_grouped_map",
    "q_udf_python",
    "q_udtf_sentences",
    "q_kmeans",
    "q_dedup_embedding_ivf",
    "q_sample_stratified",
    "q_salted_agg",
    "q_events_retention",
    "q_events_funnel",
    "q_decontaminate",
    "q_pii_mask",
    "q_repetition",
    "q_doc_logprob",
    "q_dedup_lines",
    "q_percentiles",
    "q_corr_stats",
    "q_approx_quantile_check",
    "q_approx_count_distinct",
]

if len(_DRIVER_WINDOW) != 50:  # explicit: `assert` vanishes under -O
    raise RuntimeError(
        f"_DRIVER_WINDOW must hold exactly 50 queries, has {len(_DRIVER_WINDOW)}"
    )
registry.reorder(_DRIVER_WINDOW)
