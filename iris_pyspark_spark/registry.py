"""Query registry — the single source of truth for the engine's surface.

Every operator from SURVEY.md §2 lands here as a named query:
    fn(spark, sf_dir) -> DataFrame          (the Spark-first implementation)
    oracle: str | None                       (equivalent DuckDB ANSI SQL)

`__spark_entry__.py` re-exports this registry to the driver; the in-repo
pytest suite (tests/test_correctness.py) runs the same Spark-vs-DuckDB
comparison the driver's t2 gate runs, so mismatches are caught pre-commit.

Determinism rules every query follows (SURVEY.md §5.2):
  * alias every computed column identically in Spark and oracle SQL;
  * no nondeterministic functions in checked output;
  * LIMIT only after a total order (explicit tie-break keys);
  * float outputs either bit-deterministic (sums at matching operation
    order, integer-scaled money math) or rounded identically on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


class EnvironmentGated(RuntimeError):
    """Raised at EXECUTION time by a query whose runtime dependency is
    absent in this environment (e.g. transformWithStateInPandas needs
    google.protobuf). Queries are always REGISTERED — registry size and
    iteration order must never depend on the environment — and gate
    here instead; the test suite skips on this exception."""


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None → driver does rows-only check
    tags: tuple[str, ...] = ()
    headline: bool = False  # included in bench.py's headline set


REGISTRY: dict[str, Query] = {}

#: Modules whose import registers queries (side-effectful @register calls).
_QUERY_MODULES = (
    "flagship",
    "sql_entry",
    "sources_sinks",
    "filters",
    "joins",
    "aggregates",
    "windows",
    "setops",
    "scalar_funcs",
    "udfs",
    "events_windows",
    "product_analytics",
    "streaming_parity",
    "scale_patterns",
    "llm_text",
    "llm_text_stats",
    "llm_text_eval",
    "llm_dedup",
    "llm_similarity",
    "curation_ops",
    "multimodal",
    "ml_pipeline",
    "graph_analytics",
    "stats_timeseries",
    "stats_inference",
    "stats_experiments",
    "stats_quality",
    "governance_ops",
)


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    headline: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add fn to the registry under `name`."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, headline=headline)
        return fn

    return deco


#: Explicit iteration-order prefix for the registry. The external driver's
#: correctness sweep evaluates a bounded prefix of the registry (observed:
#: exactly the first 50 entries), so the prefix must span EVERY SURVEY §2
#: row — tests/test_registry_order.py pins that invariant.
#:
#: Round-11 rotation: rounds 1-10 driver-proved 472 distinct queries; this
#: round's 50 slots again go EXCLUSIVELY to queries with no successful
#: driver row, per VERDICT r10 task 3: first the UNION of the 34 §2 rows
#: whose never-checked pool is down to exactly 2 members, taking BOTH
#: members of each pair so those pools convert together (37 distinct
#: queries — e.g. u_iter_quantile_sketch+a_hll_exact_bands empty A4,
#: u_udtf_rollup_expand+a_rollup_map_mode empty A5, j_star_semi_anti_census
#: +st_sliding_star_gate empty J4/J6, j_asof_csv_rates+j_asof_ordered_spine
#: empty J8, m_asset_embedding_knn+n_knn_holdout_eval empty N4,
#: o_weekday_cohort_except+o_segment_symdiff_prune empty P7/O4, the
#: st_* sliding/session gates empty T1/T2/T3/T5/T6, the u_pandas/u_iter
#: eighth-wave providers empty U1/U3/U4/U5/P1/S2/S6); then one
#: rows-only-by-design slot (n_minhash_jaccard_calibration, VERDICT r10
#: task 7 — keeps the self-validation pattern under driver exercise);
#: then greedy multi-tag row-coverage fills; then a drain of the largest
#: unproven pools (A1 98, F3 38, N5 32, A2 31). Tag coverage of all 66
#: rows is preserved (pinned in tests/test_registry_order.py).
_PRIORITY = (
    # ---- round-11 sweep prefix: 50 never-driver-checked slots ----
    "u_iter_quantile_sketch",
    "a_hll_exact_bands",
    "u_udtf_rollup_expand",
    "a_rollup_map_mode",
    "a_map_collect_entries",
    "u_pandas_json_risk",
    "s_json_lines_roundtrip",
    "a_ipf_raking",
    "e_ipw_adjustment",
    "j_star_semi_anti_census",
    "st_sliding_star_gate",
    "s_constraint_audit_all_tables",
    "j_asof_csv_rates",
    "j_asof_ordered_spine",
    "m_manifest_dedup_audit",
    "n_udtf_prefix_contamination",
    "m_asset_embedding_knn",
    "n_knn_holdout_eval",
    "t_m4_downsample",
    "o_weekday_cohort_except",
    "o_segment_symdiff_prune",
    "u_pandas_udaf_mad_band",
    "s_json_nested_audit",
    "sql_execute_immediate",
    "sql_q88_time_bands",
    "u_iter_csv_extremes",
    "s_parquet_storage_report",
    "s_incremental_agg_maintenance",
    "s_two_level_partition_prune",
    "t_tumbling_window",
    "st_sliding_append_eviction",
    "st_session_static_gate",
    "st_session_dedup_quiet",
    "u_grouped_map_gap_sessions",
    "st_apply_state_day_census",
    "t_event_order_skew",
    "u_udaf_winsorized_share",
    "n_minhash_jaccard_calibration",
    "n_tfidf_doc_similarity",
    "e_snaive_forecast_backtest",
    "s_rendezvous_sharding",
    "n_encoding_audit",
    "a_cooks_distance_outliers",
    "s_provenance_manifest",
    "e_linear_attribution",
    "e_markov_next_event_eval",
    "m_av_sync_drift",
    "e_decay_engagement_score",
    "t_fiscal_445_calendar",
    "t_pinball_loss_eval",
    # ---- slots past the 50-entry sweep budget: every remaining
    # never-driver-checked query, registration order, so a larger
    # sweep still lands on new proof first ----
    "s_analyze_table_stats",
    "a_exact_quantiles",
    "a_percentile_cont_disc",
    "w_moving_avg",
    "w_distribution_funcs",
    "w_range_interval_frame",
    "w_first_last_nth",
    "f_string_funcs",
    "f_hash_funcs",
    "f_hash_spark_native",
    "f_date_advanced",
    "f_bitwise_funcs",
    "f_higher_order_funcs",
    "f_regex_funcs",
    "f_interval_arithmetic",
    "f_timezone_functions",
    "f_rounding_mode_audit",
    "t_drift_psi_weekly",
    "t_peak_detection",
    "e_spike_root_cause_drilldown",
    "e_dau_mau_stickiness",
    "e_growth_accounting",
    "e_bounce_rate",
    "e_shapley_attribution",
    "e_funnel_exclusion_steps",
    "e_nps_score_ci",
    "e_gains_lift_table",
    "st_transform_with_state",
    "s_observe_qc_metrics",
    "s_profile_table",
    "j_bloom_runtime_filter",
    "s_benford_qc",
    "n_bigram_lm_score",
    "n_dataset_card",
    "n_lang_quality_bands",
    "n_bpe_pair_counts",
    "n_rouge_ngram_overlap",
    "n_sentence_stats",
    "n_code_detection_score",
    "n_blocklist_filter",
    "n_stemming_normalize",
    "n_watermark_detection",
    "n_autocomplete_prefix_topk",
    "n_feature_scaling_params",
    "n_calibration_ece",
    "n_chat_alternation_audit",
    "n_langid_confusion_matrix",
    "n_preference_cycle_audit",
    "n_filter_ablation_matrix",
    "n_search_diversity_cap",
    "n_slice_eval_metrics",
    "n_truncation_loss_sweep",
    "n_codeswitch_audit",
    "n_hashing_collision_sweep",
    "n_chao1_good_turing",
    "n_postings_compression_estimate",
    "n_moe_load_balance_proxy",
    "n_simhash",
    "n_minhash_lsh_mllib",
    "n_lsh_parameter_sensitivity",
    "n_lsh_br_planner",
    "n_embedding_drift_psi",
    "n_embedding_isotropy",
    "n_curriculum_phases",
    "n_group_kfold",
    "m_payload_integrity_audit",
    "m_magic_bytes_sniff",
    "g_pagerank_parts",
    "g_bfs_hops",
    "g_harmonic_centrality",
    "g_modularity_brand_partition",
    "g_degree_distribution",
    "g_clustering_coefficient",
    "g_community_conductance",
    "g_rich_club_coefficient",
    "g_avg_neighbor_degree_curve",
    "g_square_count",
    "t_weekly_spectral_power",
    "t_durbin_watson_residuals",
    "t_littles_law_check",
    "t_record_days_check",
    "t_newey_west_se",
    "t_erlang_c_staffing",
    "t_variance_ratio_test",
    "a_gini_concentration",
    "w_rolling_median",
    "a_hill_tail_exponent",
    "a_wilson_ci",
    "a_ols_two_feature",
    "a_oneway_anova_f",
    "a_mutual_information_2d",
    "a_empirical_bayes_shrinkage",
    "a_cvar_expected_shortfall",
    "a_hodges_lehmann_estimator",
    "a_negbin_moments_fit",
    "a_theil_decomposition",
    "a_jackknife_gini_se",
    "e_cohort_ltv_triangle",
    "e_diff_in_diff",
    "e_repurchase_rate_30d",
    "e_kpi_driver_decomposition",
    "e_cuped_adjustment",
    "e_retention_curve_fit",
    "e_propensity_rank_matching",
    "e_ratio_delta_method_ci",
    "e_direct_standardization",
    "e_price_volume_mix",
    "e_bh_fdr_correction",
    "e_wasserstein_spend_shift",
    "e_chain_ladder_ltv",
    "e_segment_migration_matrix",
    "e_price_elasticity",
    "e_attribution_window_sweep",
    "e_weibull_survival_fit",
    "e_abc_xyz_matrix",
    "a_cohens_kappa",
    "e_sprt_sequential_test",
    "a_simpsons_paradox_detector",
    "a_intraclass_correlation",
    "a_cronbach_alpha",
    "a_mcnemar_test",
    "a_dorfman_group_testing",
    "e_mde_runtime_curve",
    "a_k_anonymity_audit",
    "n_dp_noisy_counts",
    "s_crypto_shredding",
    # ---- ninth restock wave (round 11, never-checked) ----
    "a_rollup_label_share",
    "a_cube_priority_mode",
    "u_udaf_p90_census",
    "u_udaf_kmv_distinct",
    "u_udtf_hll_buckets",
    "u_pandas_json_gate",
    "u_pandas_band_filter",
    "j_star_prune_broadcast",
    "j_broadcast_semi_gate",
    "j_asof_spine_except",
    "j_asof_sink_rates",
    "u_iter_csv_digest",
    "s_json_struct_lines",
    "s_topk_parquet_report",
    "m_fingerprint_anti_audit",
    "m_patch_knn_rank",
    "n_dedup_knn_pipeline",
    "n_fold_split_eval",
    "st_tumbling_late_census",
    "st_sliding_static_semi",
    "st_session_static_anti",
    "st_tumbling_sliding_union",
    "st_type_session_dedup",
    "st_state_type_census",
    "st_state_value_extremes",
)


def load_all() -> dict[str, Query]:
    """Import all query modules (idempotent) and return the registry,
    iteration-ordered as _PRIORITY first, then registration order."""
    for mod in _QUERY_MODULES:
        importlib.import_module(f"iris_pyspark_spark.queries.{mod}")
    missing = [n for n in _PRIORITY if n not in REGISTRY]
    if missing:
        raise ValueError(f"_PRIORITY names not in registry: {missing}")
    ordered = {n: REGISTRY[n] for n in _PRIORITY}
    ordered.update((n, q) for n, q in REGISTRY.items() if n not in ordered)
    return ordered
