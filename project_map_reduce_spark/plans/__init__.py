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
)

_DRIVER_WINDOW = [
    # -- round-4 rotation (VERDICT r3 item 1): the 39 queries whose last
    #    authoritative driver signal is round-2 vintage — every one was
    #    green then and is unchanged, but the environment moved to
    #    Spark 4.1 between rounds; give each a current-env driver hash.
    "q_join_inner",
    "q_join_multi",
    "q_join_left_outer",
    "q_join_full_outer",
    "q_join_semi",
    "q_join_anti",
    "q_join_broadcast",
    "q_join_theta",
    "q_agg_distinct",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_grouping_sets",
    "q_window_rank",
    "q_window_lag_lead",
    "q_window_moving",
    "q_window_range",
    "q_window_distribution",
    "q_string_funcs",
    "q_date_funcs",
    "q_math_funcs",
    "q_array_ops",
    "q_map_ops",
    "q_datediff",
    "q_dedup_exact",
    "q_dedup_fuzzy",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash",
    "q_dedup_embedding",
    "q_dedup_clusters",
    "q_similarity_topk",
    "q_similarity_ann",
    "q_text_stats",
    "q_text_tfidf",
    "q_lang_id",
    "q_text_quality",
    "q_doc_fingerprint",
    "q_split_train_val",
    "q_pandas_udf_scalar",
    "q_udaf_weighted_mean",
    # -- round-4 new queries: streaming end-to-end, salted join,
    #    incremental dedup, NOT EXISTS decorrelation, composed pipeline,
    #    multimodal render-decode, bucketed co-located join, temperature
    #    source mixing
    "q_stream_totals",
    "q_join_salted",
    "q_dedup_incremental",
    "q_not_exists",
    "q_pipeline_e2e",
    "q_multimodal_dims",
    "q_join_bucketed",
    "q_sample_temperature",
    # -- changed this round: pinned window null ordering (ADVICE r3)
    #    and the sum6 compact-decimal rework (q_pricing_summary and
    #    q_join_asof are its only consumers not already listed above)
    "q_pack_sequences",
    "q_pricing_summary",
    "q_join_asof",
]

if len(_DRIVER_WINDOW) != 50:  # explicit: `assert` vanishes under -O
    raise RuntimeError(
        f"_DRIVER_WINDOW must hold exactly 50 queries, has {len(_DRIVER_WINDOW)}"
    )
registry.reorder(_DRIVER_WINDOW)
