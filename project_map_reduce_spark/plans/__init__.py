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
    # -- round-9 rotation (VERDICT r8 item 1): the 34 round-6-cohort
    #    queries hit the ledger's two-round staleness ceiling this round
    #    and rotate in first (plans/driver_log.py::_R6_COHORT,
    #    machine-derived from the CORRECTNESS artifacts by
    #    tests/test_plan_audit.py).
    "q_agg_cube",
    "q_agg_distinct",
    "q_agg_grouping_sets",
    "q_audio_features",
    "q_dedup_clusters",
    "q_dedup_embedding",
    "q_dedup_exact",
    "q_dedup_fuzzy",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash",
    "q_dedup_substring",
    "q_doc_chunks",
    "q_doc_fingerprint",
    "q_events_attribution",
    "q_join_anti",
    "q_join_asof",
    "q_join_broadcast",
    "q_join_full_outer",
    "q_join_inner",
    "q_join_left_outer",
    "q_join_multi",
    "q_join_semi",
    "q_lang_id",
    "q_not_in",
    "q_pack_sequences",
    "q_pandas_udf_scalar",
    "q_pricing_summary",
    "q_quality_classifier",
    "q_similarity_ann",
    "q_similarity_topk",
    "q_text_quality",
    "q_text_stats",
    "q_text_tfidf",
    "q_window_distribution",
    # -- then 16 flexible slots from the round-7 cohort (the oldest
    #    remaining signal; they reach the ceiling in r10 otherwise),
    #    drift-prone plan machinery first: the real streaming jobs,
    #    iterative model-fit plans, and the Arrow-crossing surfaces.
    #    New round-9 queries displace entries from the TAIL of this
    #    block as they land (new queries are in-window from birth; the
    #    displaced r7 queries rotate in next round at the ceiling).
    "q_stream_totals",
    "q_stream_dedup",
    "q_stream_mv_refresh",
    "q_watermark_late",
    "q_dedup_embedding_ivf",
    "q_dedup_incremental",
    "q_kmeans",
    "q_tokenize_bpe",
    "q_grouped_map",
    "q_join_salted",
    # -- NEW this round (r9):
    "q_source_roundtrip",  # NEW (r9): text/CSV/JSON source round-trip
    "q_bloom_prune",  # NEW (r9): parquet row-group bloom-filter skipping
    "q_stream_state_sessions",  # NEW (r9): transformWithStateInPandas
    "q_semdedup",  # NEW (r9): SemDeDup removal ledger
    "q_dpp_prune",  # NEW (r9): dynamic partition pruning
    "q_hierarchy_rollup",  # NEW (r9): native WITH RECURSIVE rollup
]

if len(_DRIVER_WINDOW) != 50:  # explicit: `assert` vanishes under -O
    raise RuntimeError(
        f"_DRIVER_WINDOW must hold exactly 50 queries, has {len(_DRIVER_WINDOW)}"
    )
registry.reorder(_DRIVER_WINDOW)
