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
    # -- round-12 rotation (VERDICT r11 item 1): ALL 35 remaining
    #    r8-cohort queries seat — they are the entire staleness
    #    obligation under the renegotiated ceiling (ceiling(185)=3;
    #    their r8 signal would breach 12-3=9 if left outside). Sketch
    #    rollups and join/prune machinery first, scalar surface after.
    "q_case_when",
    "q_dedup_substring_removal",
    "q_embedding_quantize",
    "q_filter_predicate",
    "q_grouped_count",
    "q_heavy_hitters",
    "q_hll_rollup",
    "q_job_pipeline",
    "q_join_bloom",
    "q_join_range",
    "q_json_extract",
    "q_kll_rollup",
    "q_length_deciles",
    "q_minmax_by",
    "q_pivot_status",
    "q_profile_approx",
    "q_profile_columns",
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
    "q_timeseries_fill",
    "q_token_count",
    "q_topk_global",
    "q_topk_per_group",
    "q_unpivot",
    "q_value_histogram",
    "q_zscore_outliers",
    # -- then 15 slots of drift-prone round-9-cohort machinery (real
    #    streaming jobs, iterative model fits, Arrow-crossing lanes,
    #    IVF/ANN model queries) pre-paying the r13 obligation. NEW
    #    round-12 queries displace entries from the TAIL of this
    #    block as they land (new queries are in-window from birth;
    #    displaced r9 queries rotate in next round, still inside the
    #    ceiling: 9 >= 13-3-1+1... i.e. r9 signal hits the ceiling
    #    exactly at r13, so r13's window must seat whatever r9
    #    entries remain outside after this round).
    "q_stream_state_sessions",
    "q_stream_totals",
    "q_stream_dedup",
    "q_stream_mv_refresh",
    "q_watermark_late",
    "q_kmeans",
    # -- NEW this round (r12) — each displaces one r9-tail entry
    #    (displaced so far: q_source_roundtrip, q_audio_features,
    #    q_pandas_udf_scalar, q_grouped_map, q_dedup_fuzzy, q_semdedup,
    #    q_similarity_ann, q_dedup_embedding_ivf, q_tokenize_bpe),
    #    which rotate in r13 (the whole r9 cohort seats then anyway):
    "q_keyset_page",  # NEW (r12): keyset continuation twin of Q184
    "q_ann_pq",  # NEW (r12): IVF-PQ ADC search, the vector-ladder capstone
    "q_ann_lsh",  # NEW (r12): random-hyperplane LSH, the data-independent index
    "q_skyline",  # NEW (r12): Pareto-frontier sweep, local-prune/global-merge
    "q_weighted_sample",  # NEW (r12): A-ES weighted reservoir, hash-derived keys
    "q_bm25",  # NEW (r12): BM25 ranked retrieval, zero-shuffle scoring pass
    "q_pmi_bigrams",  # NEW (r12): PMI collocation mining
    "q_markov_transitions",  # NEW (r12): clickstream transition matrix
    "q_anomaly_mad",  # NEW (r12): robust median/MAD outlier screen
]

if len(_DRIVER_WINDOW) != 50:  # explicit: `assert` vanishes under -O
    raise RuntimeError(
        f"_DRIVER_WINDOW must hold exactly 50 queries, has {len(_DRIVER_WINDOW)}"
    )
registry.reorder(_DRIVER_WINDOW)
