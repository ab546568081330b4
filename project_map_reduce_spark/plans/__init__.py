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
    # -- round-8 rotation (VERDICT r7 item 1 — the last scheduled debt
    #    rotation): the 26 round-5-cohort queries hit the ledger's
    #    two-round staleness ceiling this round and rotate in first
    #    (plans/driver_log.py::_R5_COHORT, machine-derived from the
    #    CORRECTNESS artifacts by tests/test_plan_audit.py).
    "q_case_when",
    "q_filter_predicate",
    "q_grouped_count",
    "q_job_pipeline",
    "q_join_range",
    "q_json_extract",
    "q_length_deciles",
    "q_minmax_by",
    "q_pivot_status",
    "q_scalar_subquery",
    "q_scan_count",
    "q_scan_project",
    "q_set_except",
    "q_set_intersect",
    "q_set_union_all",
    "q_set_union_distinct",
    "q_sort_multi",
    "q_source_quota",
    "q_string_agg",
    "q_time_rollup",
    "q_token_count",
    "q_topk_global",
    "q_topk_per_group",
    "q_unpivot",
    "q_value_histogram",
    "q_zscore_outliers",
    # -- NEW this round (r8):
    "q_zorder_prune",  # NEW (r8): Morton multi-column clustering + skipping
    "q_profile_approx",  # NEW (r8): HLL-sketch profiler (Q119's 100 TB flip)
    "q_typo_join",  # NEW (r8): lossless deletion-neighborhood fuzzy join
    "q_kll_rollup",  # NEW (r8): mergeable KLL quantile cube
    "q_heavy_hitters",  # NEW (r8): frequent-items sketch top-k
    # -- changed this round: the three lake-maintenance oracles moved
    #    from round(sum(double),6) to the exact-decimal SUM6 template
    #    (ADVICE r7) — a changed oracle needs a fresh driver hash.
    "q_cluster_prune",
    "q_compact_small_files",
    "q_schema_evolution",
    # -- then 16 of the 50 round-6-cohort queries (the oldest remaining
    #    signal), drift-prone plan machinery first: the real streaming
    #    jobs, iterative/warehouse state machines, and the queries this
    #    round's work touches (pagerank partition tuning, profiler HLL
    #    flip). The 34 round-6 queries left out are exactly two rounds
    #    old next round and rotate in round 9 — steady state.
    "q_stream_sessions",
    "q_stream_enrich",
    "q_stream_dedup_watermark",
    "q_join_interval_stream",
    "q_pagerank",
    "q_mv_incremental",
    "q_scd2_merge",
    "q_cdc_apply",
    "q_join_bloom",
    "q_partition_prune",
    "q_timeseries_fill",
    "q_hll_rollup",
    "q_profile_columns",
    "q_embedding_quantize",
    "q_quality_classifier_trained",
    "q_dedup_substring_removal",
]

if len(_DRIVER_WINDOW) != 50:  # explicit: `assert` vanishes under -O
    raise RuntimeError(
        f"_DRIVER_WINDOW must hold exactly 50 queries, has {len(_DRIVER_WINDOW)}"
    )
registry.reorder(_DRIVER_WINDOW)
