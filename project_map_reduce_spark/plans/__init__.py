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
    # -- round-11 rotation (VERDICT r10 item 1): the 16 round-10
    #    OVERFLOW queries seat first — they have NO driver artifact at
    #    all yet (declared in plans/driver_log.py::_R10_NEW_DEFERRED;
    #    jv10-parity- and pytest-green since round 10) and receive
    #    their first authoritative DuckDB-oracle signal this round.
    "q_file_provenance",
    "q_stream_outer_join",
    "q_udtf_table_arg",
    "q_dynamic_overwrite",
    "q_union_by_name",
    "q_listagg",
    "q_sql_ergonomics",
    "q_try_arith",
    "q_jdbc_roundtrip",
    "q_rate_source",
    "q_pyds_sink",
    "q_agg_pushdown",
    "q_pyds_stream_sink",
    "q_cogroup_asof",
    "q_sql_udf",
    "q_transpose",
    # -- then 34 slots from the round-8 cohort (the oldest remaining
    #    signal; ceiling = staleness_ceiling(len(registry)) rounds —
    #    renegotiated in r11, see plans/driver_log.py docstring).
    #    R12 OBLIGATION: every r8-cohort query outside THIS window
    #    must seat in r12 — that is the 16 never-windowed entries
    #    PLUS all tail entries displaced by r11-new queries below
    #    (35 total at round-11 close; see the displaced list in the
    #    next comment block) — leaving at most 15 slots for r12-new
    #    before the deferred-list mechanism kicks in.
    #    Drift-prone plan machinery first:
    #    real streaming jobs, merge/sink machinery, iterative model
    #    fits, mergeable sketches. New round-11 queries displace
    #    entries from the TAIL of this block as they land (new
    #    queries are in-window from birth; the displaced r8 queries
    #    rotate in next round at the ceiling).
    "q_stream_dedup_watermark",
    "q_stream_enrich",
    "q_stream_sessions",
    "q_join_interval_stream",
    "q_scd2_merge",
    "q_cdc_apply",
    "q_mv_incremental",
    "q_compact_small_files",
    "q_schema_evolution",
    "q_zorder_prune",
    "q_cluster_prune",
    "q_partition_prune",
    "q_pagerank",
    "q_quality_classifier_trained",
    "q_typo_join",
    # -- NEW this round (r11) — displaced the nineteen r8-tail entries
    #    (q_embedding_quantize, q_hll_rollup, q_kll_rollup,
    #    q_heavy_hitters, q_profile_approx, q_join_bloom, q_join_range,
    #    q_dedup_substring_removal,
    #    q_job_pipeline, q_timeseries_fill, q_time_rollup, q_scalar_subquery,
    #    q_source_quota, q_profile_columns, q_pivot_status,
    #    q_token_count, q_length_deciles, q_value_histogram,
    #    q_zscore_outliers), which seat in r12:
    "q_map_in_arrow",  # NEW (r11): Arrow-native mapInArrow batch lane
    "q_apply_in_arrow",  # NEW (r11): Arrow-native grouped-map lane
    "q_cogroup_in_arrow",  # NEW (r11): Arrow-native cogrouped lane
    "q_lateral_join_df",  # NEW (r11): DataFrame.lateralJoin decorrelation
    "q_subquery_df",  # NEW (r11): exists()/scalar() subquery expressions
    "q_regr_stats",  # NEW (r11): ANSI linear-regression aggregates
    "q_bitmap_distinct",  # NEW (r11): exact-distinct bitmap rollup
    "q_agg_modern",  # NEW (r11): count_if/bool/median/percentile_disc/mode
    "q_variant_explode",  # NEW (r11): VARIANT destructuring TVF
    "q_join_null_safe",  # NEW (r11): <=> null-safe equi-join semantics
    "q_topk_sketch_rollup",  # NEW (r11): mergeable top-k sketch-state rollup
    "q_explode_outer",  # NEW (r11): outer generator null-preservation
    "q_groupingsets_df",  # NEW (r11): DataFrame.groupingSets API
    "q_hof_lambda",  # NEW (r11): lambda HOF battery vs list_* twins
    "q_jl_projection",  # NEW (r11): deterministic JL random projection
    "q_stream_to_table",  # NEW (r11): managed-table streaming sink
    "q_setops_all",  # NEW (r11): INTERSECT ALL / EXCEPT ALL multisets
    "q_limit_offset",  # NEW (r11): LIMIT/OFFSET pagination semantics
    "q_array_functions",  # NEW (r11): array-algebra battery
]

if len(_DRIVER_WINDOW) != 50:  # explicit: `assert` vanishes under -O
    raise RuntimeError(
        f"_DRIVER_WINDOW must hold exactly 50 queries, has {len(_DRIVER_WINDOW)}"
    )
registry.reorder(_DRIVER_WINDOW)
