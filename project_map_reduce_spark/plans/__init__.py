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
    # -- round-13 rotation (VERDICT r12 item 2): the ENTIRE remaining
    #    44-query r9 cohort seats — its signal hits the renegotiated
    #    ceiling this round (staleness_ceiling(194) = 3; 13 - 3 = 10 > 9).
    #    Drift-prone machinery (streaming, model fits, Arrow lanes,
    #    dedup/ANN index builds) first, scalar surface after.
    "q_agg_cube",
    "q_agg_distinct",
    "q_agg_grouping_sets",
    "q_audio_features",
    "q_bloom_prune",
    "q_dedup_clusters",
    "q_dedup_embedding",
    "q_dedup_embedding_ivf",
    "q_dedup_exact",
    "q_dedup_fuzzy",
    "q_dedup_incremental",
    "q_dedup_ngram_jaccard",
    "q_dedup_simhash",
    "q_dedup_substring",
    "q_doc_chunks",
    "q_doc_fingerprint",
    "q_dpp_prune",
    "q_events_attribution",
    "q_grouped_map",
    "q_hierarchy_rollup",
    "q_join_anti",
    "q_join_asof",
    "q_join_broadcast",
    "q_join_full_outer",
    "q_join_inner",
    "q_join_left_outer",
    "q_join_multi",
    "q_join_salted",
    "q_join_semi",
    "q_lang_id",
    "q_not_in",
    "q_pack_sequences",
    "q_pandas_udf_scalar",
    "q_pricing_summary",
    "q_quality_classifier",
    "q_semdedup",
    "q_similarity_ann",
    "q_similarity_topk",
    "q_source_roundtrip",
    "q_text_quality",
    "q_text_stats",
    "q_text_tfidf",
    "q_tokenize_bpe",
    "q_window_distribution",
    # -- then 6 slots of drift-prone round-10-cohort machinery (real
    #    streaming jobs, python-datasource legs, malformed-row
    #    quarantine, XML source) pre-paying the r14 obligation. NEW
    #    round-13 queries displace entries from the TAIL of this block
    #    as they land (new queries are in-window from birth; displaced
    #    r10 entries rotate in r14, still inside the ceiling: the r10
    #    signal reaches it only at r14, whose window must seat whatever
    #    r10 entries remain outside after this round).
    # -- NEW this round (r13) — each displaces one r10-prefill tail
    #    entry (displaced: q_source_xml, q_corrupt_quarantine,
    #    q_events_session, q_state_reader_audit, q_pyds_stream,
    #    q_stream_chained_agg), which rotate in r14 (the r10 cohort
    #    seats then anyway):
    "q_dedup_fuzzy_ledger",  # NEW (r13): MinHash pairs -> components -> keep/remove ledger
    "q_ann_pq_residual",  # NEW (r13): IVF-PQ on cell residuals (FAISS by_residual form)
    "q_gap_islands",  # NEW (r13): per-user gaps-and-islands activity runs
    "q_text_entropy",  # NEW (r13): char-distribution entropy quality screen
    "q_rfm_segments",  # NEW (r13): recency/frequency/monetary customer segments
    "q_ohlc_bars",  # NEW (r13): hourly OHLC bars via struct-min/max single agg
]

if len(_DRIVER_WINDOW) != 50:  # explicit: `assert` vanishes under -O
    raise RuntimeError(
        f"_DRIVER_WINDOW must hold exactly 50 queries, has {len(_DRIVER_WINDOW)}"
    )
registry.reorder(_DRIVER_WINDOW)
