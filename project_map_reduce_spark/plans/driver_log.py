"""Driver-window telemetry: which round last hash-verified each query.

The external correctness driver hash-checks only the FIRST 50 registered
queries per round (``plans/__init__.py::_DRIVER_WINDOW``), so every
query's driver-authoritative signal ages one round for each round it
spends outside the window. ``DRIVER_ROUNDS`` records, per query, the
most recent round whose ``CORRECTNESS_r{N}.json`` carried a full
rows+schema+hash match for it. It is the machine-checkable form of the
rotation debt that rounds 5-6 tracked in comments (VERDICT r6 item 8).

Maintenance contract (enforced by ``tests/test_plan_audit.py``):

* ``CURRENT_ROUND`` is bumped at the start of each round, when the
  window is rotated.
* Every query in the current ``_DRIVER_WINDOW`` will receive a
  ``CURRENT_ROUND`` signal when this round's driver run lands; queries
  OUTSIDE the window must already hold a signal no older than
  ``CURRENT_ROUND - 2`` — i.e. after this round's rotation no query's
  evidence is ever more than two rounds stale.
* Queries new this round carry ``CURRENT_ROUND`` (they are in the
  window from birth and have no earlier signal by definition).
* Since round 8 the ledger can no longer drift from the evidence:
  ``derive_driver_rounds`` recomputes every value straight from the
  on-disk ``CORRECTNESS_r*.json`` artifacts and the plan-audit test
  asserts ``DRIVER_ROUNDS`` equals the derivation (VERDICT r7 item 8;
  new-this-round queries are the only entries allowed to have no
  artifact yet).
* LOCKSTEP RULE (ADVICE r8): committing a new ``CORRECTNESS_r{N}.json``
  artifact and rotating this ledger MUST happen in the same commit —
  the artifact advances the derivation, so a stale ledger fails CI the
  moment the artifact lands. Round N's first commit therefore bumps
  ``CURRENT_ROUND``, regenerates the cohorts below with
  ``derive_driver_rounds``, and rotates ``_DRIVER_WINDOW`` together.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

CURRENT_ROUND = 10

# Queries whose last driver hash predates this round's window, by cohort
# (cohort = the round whose CORRECTNESS artifact last full-matched them;
# regenerate with ``derive_driver_rounds`` — the test does).
_R7_COHORT = [
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
]

_R8_COHORT = [
    "q_case_when",
    "q_cdc_apply",
    "q_cluster_prune",
    "q_compact_small_files",
    "q_dedup_substring_removal",
    "q_embedding_quantize",
    "q_filter_predicate",
    "q_grouped_count",
    "q_heavy_hitters",
    "q_hll_rollup",
    "q_job_pipeline",
    "q_join_bloom",
    "q_join_interval_stream",
    "q_join_range",
    "q_json_extract",
    "q_kll_rollup",
    "q_length_deciles",
    "q_minmax_by",
    "q_mv_incremental",
    "q_pagerank",
    "q_partition_prune",
    "q_pivot_status",
    "q_profile_approx",
    "q_profile_columns",
    "q_quality_classifier_trained",
    "q_scalar_subquery",
    "q_scan_count",
    "q_scan_project",
    "q_scd2_merge",
    "q_schema_evolution",
    "q_set_except",
    "q_set_intersect",
    "q_set_union_all",
    "q_set_union_distinct",
    "q_sort_multi",
    "q_source_quota",
    "q_stream_dedup_watermark",
    "q_stream_enrich",
    "q_stream_sessions",
    "q_string_agg",
    "q_time_rollup",
    "q_timeseries_fill",
    "q_token_count",
    "q_topk_global",
    "q_topk_per_group",
    "q_typo_join",
    "q_unpivot",
    "q_value_histogram",
    "q_zorder_prune",
    "q_zscore_outliers",
]

_R9_COHORT = [
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
    "q_kmeans",
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
    "q_stream_dedup",
    "q_stream_mv_refresh",
    "q_stream_state_sessions",
    "q_stream_totals",
    "q_text_quality",
    "q_text_stats",
    "q_text_tfidf",
    "q_tokenize_bpe",
    "q_watermark_late",
    "q_window_distribution",
]

# Queries introduced in round 10 (in the window from birth; their first
# driver signal will be CURRENT_ROUND — no artifact carries them yet).
_R10_NEW: list[str] = [
    "q_variant_json",
    "q_pyds_source",
    "q_state_reader_audit",
    "q_pyds_stream",
    "q_variant_storage",
    "q_lateral_topk",
    "q_source_xml",
    "q_observe_metrics",
    "q_udtf_analyze",
    "q_corrupt_quarantine",
    "q_stream_chained_agg",
    "q_collated_group",
    "q_sql_script",
]

# Round-10 OVERFLOW: the window must hold all 37 r7-cohort queries this
# round (the two-round staleness ceiling), leaving exactly 13 slots for
# new queries — _R10_NEW fills them. Queries below were born after the
# window filled; they are jv-parity- and pytest-verified this round and
# MUST open round 11's window (their first driver signal is deferred
# one round — the ledger records the deferral explicitly rather than
# silently aging a cohort query past its ceiling).
_R10_NEW_DEFERRED: list[str] = [
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
]

DRIVER_ROUNDS: dict[str, int] = {
    **{q: 7 for q in _R7_COHORT},
    **{q: 8 for q in _R8_COHORT},
    **{q: 9 for q in _R9_COHORT},
    **{q: CURRENT_ROUND for q in _R10_NEW},
    # Deferred queries' first driver signal lands in round N+1; the
    # N+1 value keeps the staleness math honest (they hold no signal
    # at all yet — the audit test pairs this with artifact absence).
    **{q: CURRENT_ROUND + 1 for q in _R10_NEW_DEFERRED},
}


def derive_driver_rounds(repo_root: str | Path) -> dict[str, int]:
    """Recompute the ledger straight from the driver's own artifacts:
    for each query, the highest N such that ``CORRECTNESS_r{N}.json``
    records a full rows+schema+hash match. Queries that never
    full-matched (only possible for new-this-round entries) are absent
    from the result — the test pairs that absence with membership in
    the current new-query list."""
    derived: dict[str, int] = {}
    for p in sorted(Path(repo_root).glob("CORRECTNESS_r*.json")):
        m = re.search(r"_r(\d+)\.json$", p.name)
        if m is None:
            continue
        rnd = int(m.group(1))
        for q, v in json.loads(p.read_text()).items():
            if (
                isinstance(v, dict)
                and v.get("rows_match")
                and v.get("schema_match")
                and v.get("hash_match")
            ):
                derived[q] = max(derived.get(q, 0), rnd)
    return derived
