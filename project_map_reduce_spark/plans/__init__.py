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
    # -- round-10 rotation (VERDICT r9 item 1): the 37 round-7-cohort
    #    queries hit the ledger's two-round staleness ceiling this round
    #    and rotate in first (plans/driver_log.py::_R7_COHORT,
    #    machine-derived from the CORRECTNESS artifacts by
    #    tests/test_plan_audit.py).
    "q_agg_rollup",
    "q_approx_count_distinct",
    "q_approx_quantile_check",
    "q_array_ops",
    "q_corr_stats",
    "q_date_funcs",
    "q_datediff",
    "q_decontaminate",
    "q_dedup_lines",
    "q_doc_logprob",
    "q_events_funnel",
    "q_events_retention",
    "q_events_session",
    "q_events_sliding",
    "q_events_tumbling",
    "q_join_bucketed",
    "q_join_theta",
    "q_map_ops",
    "q_math_funcs",
    "q_multimodal_dims",
    "q_not_exists",
    "q_percentiles",
    "q_pii_mask",
    "q_pipeline_e2e",
    "q_repetition",
    "q_salted_agg",
    "q_sample_stratified",
    "q_sample_temperature",
    "q_split_train_val",
    "q_string_funcs",
    "q_udaf_weighted_mean",
    "q_udf_python",
    "q_udtf_sentences",
    "q_window_lag_lead",
    "q_window_moving",
    "q_window_range",
    "q_window_rank",
    # -- then 13 flexible slots from the round-8 cohort (the oldest
    #    remaining signal; they reach the ceiling in r11 otherwise),
    #    drift-prone plan machinery first: real streaming jobs,
    #    iterative model fits, merge machinery, mergeable sketches.
    #    New round-10 queries displace entries from the TAIL of this
    #    block as they land (new queries are in-window from birth; the
    #    displaced r8 queries rotate in next round at the ceiling).
    # -- NEW this round (r10):
    "q_variant_json",  # NEW (r10): VARIANT semi-structured path (parse_json/variant_get)
    "q_pyds_source",  # NEW (r10): Python DataSource API custom batch source
    "q_state_reader_audit",  # NEW (r10): statestore reader vs sink reconciliation
    "q_pyds_stream",  # NEW (r10): Python DataSource API stream source
    "q_variant_storage",  # NEW (r10): VARIANT parquet storage round-trip
    "q_lateral_topk",  # NEW (r10): correlated LATERAL decorrelation
    "q_source_xml",  # NEW (r10): native XML source round-trip
    "q_observe_metrics",  # NEW (r10): Observation in-flight metrics
    "q_udtf_analyze",  # NEW (r10): polymorphic UDTF analyze() schema
    "q_corrupt_quarantine",  # NEW (r10): PERMISSIVE/DROPMALFORMED/FAILFAST quarantine
    "q_stream_chained_agg",  # NEW (r10): chained stateful operators (SPARK-40925)
    "q_collated_group",  # NEW (r10): UTF8_LCASE collation grouping
    "q_sql_script",  # NEW (r10): SQL scripting WHILE/DECLARE + parameterized SQL
]

if len(_DRIVER_WINDOW) != 50:  # explicit: `assert` vanishes under -O
    raise RuntimeError(
        f"_DRIVER_WINDOW must hold exactly 50 queries, has {len(_DRIVER_WINDOW)}"
    )
registry.reorder(_DRIVER_WINDOW)
