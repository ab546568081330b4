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
* STALENESS CEILING (renegotiated in round 11, VERDICT r10 item 2):
  the original "no signal older than two rounds" bound requires
  inventory <= 3x50 = 150 queries; the inventory passed 150 in round
  10, so the bound is now the ARITHMETIC one — with N registered
  queries and a 50-slot window the rotation cycle is ceil(N/50)
  rounds, so after this round's rotation no query outside the window
  may carry a signal older than ``ceil(N/50) - 1`` rounds (N=166..200
  -> 3 rounds; the old bound falls out as the special case N<=150).
  The plan-audit test computes the bound from the live registry size,
  so growing the inventory automatically widens the ceiling honestly
  instead of silently breaking the contract.
* ROTATION PRIORITY: queries whose signal reaches the ceiling next
  round rotate in first; within a cohort, drift-prone plan machinery
  (real streaming jobs, iterative model fits, merge/sink machinery,
  Arrow-crossing lanes) takes the slots before drift-stable scalar
  surface (set ops, simple scans/filters), which carries pytest +
  local-parity coverage in the interim.
* Queries new this round carry ``CURRENT_ROUND`` (they are in the
  window from birth and have no earlier signal by definition).
  OVERFLOW queries — born after the window filled — are declared in a
  ``_R{N}_NEW_DEFERRED`` list, carry ``CURRENT_ROUND + 1``, and MUST
  open the next round's window (round 10 deferred 16; all 16 seated in
  the round-11 window).
* Since round 8 the ledger can no longer drift from the evidence:
  ``derive_driver_rounds`` recomputes every value straight from the
  on-disk ``CORRECTNESS_r*.json`` artifacts and the plan-audit test
  asserts ``DRIVER_ROUNDS`` equals the derivation (VERDICT r7 item 8;
  new-this-round and deferred queries are the only entries allowed to
  have no artifact yet).
* LOCKSTEP RULE (ADVICE r8): committing a new ``CORRECTNESS_r{N}.json``
  artifact and rotating this ledger MUST happen in the same commit —
  the artifact advances the derivation, so a stale ledger fails CI the
  moment the artifact lands. Round N's first commit therefore bumps
  ``CURRENT_ROUND``, regenerates the cohorts below with
  ``derive_driver_rounds``, and rotates ``_DRIVER_WINDOW`` together.
* ERA-AWARE DRIFT (VERDICT r12 item 1, the structural fix): the driver
  drops ``CORRECTNESS_r{CURRENT_ROUND}.json`` into the tree AFTER the
  builder's final commit, so at judge time every in-window query
  freshly re-verified this round derives to ``CURRENT_ROUND`` while
  this ledger still carries its pre-rotation cohort. That state is
  the EXPECTED post-driver artifact lag, not drift — the plan-audit
  test now classifies it as "pending rotation" (in-window AND derived
  == CURRENT_ROUND AND ledger older) and asserts the drift set is
  empty only outside that class. The next round's rotation commit
  folds the pending entries into their new cohort, so the guard is
  green both at the builder's final commit and immediately after the
  driver's artifact drop.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

CURRENT_ROUND = 13

# Queries whose last driver hash predates this round's window, by cohort
# (cohort = the round whose CORRECTNESS artifact last full-matched them;
# regenerate with ``derive_driver_rounds`` — the test does).
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
]

_R10_COHORT = [
    "q_agg_rollup",
    "q_approx_count_distinct",
    "q_approx_quantile_check",
    "q_array_ops",
    "q_collated_group",
    "q_corr_stats",
    "q_corrupt_quarantine",
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
    "q_lateral_topk",
    "q_map_ops",
    "q_math_funcs",
    "q_multimodal_dims",
    "q_not_exists",
    "q_observe_metrics",
    "q_percentiles",
    "q_pii_mask",
    "q_pipeline_e2e",
    "q_pyds_source",
    "q_pyds_stream",
    "q_repetition",
    "q_salted_agg",
    "q_sample_stratified",
    "q_sample_temperature",
    "q_source_xml",
    "q_split_train_val",
    "q_sql_script",
    "q_state_reader_audit",
    "q_stream_chained_agg",
    "q_string_funcs",
    "q_udaf_weighted_mean",
    "q_udf_python",
    "q_udtf_analyze",
    "q_udtf_sentences",
    "q_variant_json",
    "q_variant_storage",
    "q_window_lag_lead",
    "q_window_moving",
    "q_window_range",
    "q_window_rank",
]

_R11_COHORT = [
    "q_agg_modern",
    "q_agg_pushdown",
    "q_apply_in_arrow",
    "q_array_functions",
    "q_bitmap_distinct",
    "q_cdc_apply",
    "q_cluster_prune",
    "q_cogroup_asof",
    "q_cogroup_in_arrow",
    "q_compact_small_files",
    "q_dynamic_overwrite",
    "q_explode_outer",
    "q_file_provenance",
    "q_groupingsets_df",
    "q_hof_lambda",
    "q_jdbc_roundtrip",
    "q_jl_projection",
    "q_join_interval_stream",
    "q_join_null_safe",
    "q_lateral_join_df",
    "q_limit_offset",
    "q_listagg",
    "q_map_in_arrow",
    "q_mv_incremental",
    "q_pagerank",
    "q_partition_prune",
    "q_pyds_sink",
    "q_pyds_stream_sink",
    "q_quality_classifier_trained",
    "q_rate_source",
    "q_regr_stats",
    "q_scd2_merge",
    "q_schema_evolution",
    "q_setops_all",
    "q_sql_ergonomics",
    "q_sql_udf",
    "q_stream_dedup_watermark",
    "q_stream_enrich",
    "q_stream_outer_join",
    "q_stream_sessions",
    "q_stream_to_table",
    "q_subquery_df",
    "q_topk_sketch_rollup",
    "q_transpose",
    "q_try_arith",
    "q_typo_join",
    "q_udtf_table_arg",
    "q_union_by_name",
    "q_variant_explode",
    "q_zorder_prune",
]

_R12_COHORT = [
    "q_ann_lsh",
    "q_ann_pq",
    "q_anomaly_mad",
    "q_bm25",
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
    "q_keyset_page",
    "q_kll_rollup",
    "q_kmeans",
    "q_length_deciles",
    "q_markov_transitions",
    "q_minmax_by",
    "q_pivot_status",
    "q_pmi_bigrams",
    "q_profile_approx",
    "q_profile_columns",
    "q_scalar_subquery",
    "q_scan_count",
    "q_scan_project",
    "q_set_except",
    "q_set_intersect",
    "q_set_union_all",
    "q_set_union_distinct",
    "q_skyline",
    "q_sort_multi",
    "q_source_quota",
    "q_stream_dedup",
    "q_stream_mv_refresh",
    "q_stream_state_sessions",
    "q_stream_totals",
    "q_string_agg",
    "q_time_rollup",
    "q_timeseries_fill",
    "q_token_count",
    "q_topk_global",
    "q_topk_per_group",
    "q_unpivot",
    "q_value_histogram",
    "q_watermark_late",
    "q_weighted_sample",
    "q_zscore_outliers",
]
# Round 12 introduced no overflow (all 9 r12-new queries fit in the
# window; they now sit in _R12_COHORT with a green r12 artifact), so
# nothing is deferred INTO round 13's window beyond the staleness
# obligation above.
_R12_NEW_DEFERRED: list[str] = []

# Queries introduced in round 13 (in the window from birth; their first
# driver signal will be CURRENT_ROUND — no artifact carries them yet).
# The r13 window has exactly 50 - 44 = 6 free slots after seating the
# entire remaining r9 cohort (its signal hits the ceiling this round:
# staleness_ceiling(194) = 3 and 13 - 3 = 10 > 9), so at most 6 new
# queries may seat here; overflow goes to _R13_NEW_DEFERRED.
_R13_NEW: list[str] = [
    "q_dedup_fuzzy_ledger",
    "q_ann_pq_residual",
    "q_gap_islands",
    "q_text_entropy",
    "q_rfm_segments",
    "q_ohlc_bars",
]

# Round-13 OVERFLOW (born after the window filled; carry
# CURRENT_ROUND + 1 and MUST open the round-14 window).
_R13_NEW_DEFERRED: list[str] = [
    "q_interval_overlap",
    "q_gini_spend",
    "q_benford",
    "q_autocorr_daily",
    "q_ngram_coverage",
    "q_zipf_slope",
    "q_ks_lengths",
    "q_cusum_drift",
    "q_freq_itemsets",
    "q_aging_buckets",
    "q_rolling_anomaly",
    "q_seasonality_dow",
    "q_window_funnel",
    "q_audience_overlap",
    "q_wilson_ci",
    "q_degree_distribution",
    "q_triangle_count",
    "q_survival_km",
]

DRIVER_ROUNDS: dict[str, int] = {
    **{q: 9 for q in _R9_COHORT},
    **{q: 10 for q in _R10_COHORT},
    **{q: 11 for q in _R11_COHORT},
    **{q: 12 for q in _R12_COHORT},
    **{q: CURRENT_ROUND for q in _R13_NEW},
    **{q: CURRENT_ROUND + 1 for q in _R13_NEW_DEFERRED},
}


def staleness_ceiling(n_queries: int, window: int = 50) -> int:
    """The tightest satisfiable staleness bound for an ``n_queries``
    inventory over a ``window``-slot driver check: the rotation cycle
    visits every query once per ``ceil(n/window)`` rounds, so the
    oldest in-contract signal is ``ceil(n/window) - 1`` rounds stale
    (minimum 2 — the original contract — so the bound never tightens
    retroactively below what rounds 1-10 promised)."""
    return max(2, -(-n_queries // window) - 1)


def ledger_drift(
    ledger: dict[str, int],
    derived: dict[str, int],
    window: set[str],
    never_ok: set[str],
    current_round: int,
) -> dict[str, tuple[int, int | None]]:
    """Classify ledger-vs-evidence disagreements, era-aware (VERDICT
    r12 item 1). Returns the REAL drift entries as
    ``{query: (ledger_round, derived_round_or_None)}``; two states are
    expected and excluded:

    * a new/deferred query (``never_ok``) with no artifact yet;
    * PENDING ROTATION — an in-window query deriving to exactly
      ``current_round`` while the ledger carries an older round (or
      the query is new this round): the driver drops
      ``CORRECTNESS_r{current_round}.json`` after the builder's final
      commit, so this is the normal judge-time state, folded into the
      cohorts by the NEXT round's rotation commit.
    """
    drift: dict[str, tuple[int, int | None]] = {}
    for q, r in ledger.items():
        d = derived.get(q)
        if d == r:
            continue
        if q in never_ok and d is None:
            continue
        if q in window and d == current_round and (r < current_round or q in never_ok):
            continue
        drift[q] = (r, d)
    return drift


def derive_driver_rounds(repo_root: str | Path) -> dict[str, int]:
    """Recompute the ledger straight from the driver's own artifacts:
    for each query, the highest N such that ``CORRECTNESS_r{N}.json``
    records a full rows+schema+hash match. Queries that never
    full-matched (only possible for new-this-round or deferred
    entries) are absent from the result — the test pairs that absence
    with membership in the current new/deferred lists."""
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
