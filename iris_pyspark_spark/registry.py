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
#: Round-8 rotation: rounds 1-7 driver-proved 322 distinct queries; this
#: round's 50 slots again go EXCLUSIVELY to queries with no successful
#: driver row, per VERDICT r07 tasks 2/7: first the 11 rows that had
#: exactly ONE unproven query left (J6/N6/T7/P1/J4+O4/J8/S2+S5/S3+P3+F6/
#: S6+J2+A5/A6+A9/F5, plus T2/T3/T6 via the st_/t_ fills) so no row's
#: pool empties unproven, the five U-row last providers, the rewritten
#: ANN tail (binary-hash/MRL/PQ-rerank/url-canonical/hubness/uncertainty
#: — ADVICE r07: the F.expr rewrite needs driver hash proof), multi-tag
#: row-coverage fills, then a drain of the four largest unproven pools
#: (A1 172, F3 72, F2 51, N5 50). Tag coverage of all 66 rows is
#: preserved (pinned below).
_PRIORITY = (
    # ---- round-8 sweep prefix: 50 never-driver-checked slots ----
    "sql_q9_product_profit",
    "a_argmax_struct",
    "st_pipeline_ingest_append",
    "m_patch_grid_plan",
    "j_semi_except_suppliers",
    "j_asof_monthly_benchmark",
    "s_csv_partitioned_sink",
    "s_jsonl_props_scan",
    "s_tier_dim_rollup",
    "a_having_status_domains",
    "f_from_json_map_profile",
    "t_sliding_share_4h",
    "t_session_duration_buckets",
    "st_static_enrich_window",
    "u_pandas_scalar_band",
    "u_udaf_trimmed_mean",
    "u_udtf_running_balance",
    "u_iter_partial_stats",
    "u_cogrouped_apply_in_arrow",
    "n_binary_hash_retrieval",
    "n_mrl_prefix_rerank",
    "n_pq_rerank_refine",
    "n_url_canonical_dedup",
    "n_hubness_skew",
    "n_uncertainty_sampling",
    "a_quantile_histogram_sketch",
    "j_entity_resolution_blocked",
    "j_fuzzy_name_trigram",
    "sql_q16_notin_suppliers",
    "n_dedup_stage_funnel",
    "sql_group_by_all",
    "n_cooccurrence_pmi",
    "j_drill_across_facts",
    "sql_q6_forecast_revenue",
    "f_explode_outer",
    "s_small_file_compaction",
    "w_rank_dense_ntile",
    "w_mom_change",
    "sql_recursive_ancestor_rollup",
    "j_hierarchy_closure_table",
    "j_point_in_polygon",
    "a_histogram_width_bucket",
    "f_penny_allocation",
    "w_scd2_ranges",
    "f_date_funcs",
    "n_token_count",
    "n_langid",
    "n_quality_score",
    "n_char_entropy",
    "a_mode_median",
    # ---- slots past the 50-entry sweep budget: every remaining
    # never-driver-checked query, registration order, so a larger
    # sweep still lands on new proof first ----
    "st_transform_with_state",
    "sql_pipe_syntax",
    "sql_session_variables",
    "sql_identifier_clause",
    "sql_scripting_threshold_search",
    "sql_execute_immediate",
    "sql_q15_top_supplier",
    "sql_q88_time_bands",
    "j_spatial_grid_nn",
    "j_interval_overlap_join",
    "j_join_size_estimate",
    "j_backlog_aging_snapshots",
    "j_bitemporal_reconstruction",
    "s_catalog_ddl_sql",
    "s_analyze_table_stats",
    "s_provenance_manifest",
    "s_merge_idempotency",
    "s_parquet_storage_report",
    "s_vacuum_orphan_files",
    "a_exact_quantiles",
    "a_percentile_cont_disc",
    "a_regression_aggs",
    "a_bitmap_distinct",
    "a_decimal128_exact",
    "a_log2_histogram",
    "a_pythagorean_means",
    "a_relational_division_otif",
    "a_semantic_layer_metrics",
    "a_distinct_estimator_comparison",
    "w_moving_avg",
    "w_distribution_funcs",
    "w_range_interval_frame",
    "w_first_last_nth",
    "o_union_all",
    "f_string_funcs",
    "f_hash_funcs",
    "f_hash_spark_native",
    "f_date_advanced",
    "f_bitwise_funcs",
    "f_higher_order_funcs",
    "f_regex_funcs",
    "f_interval_arithmetic",
    "f_business_days_diff",
    "f_timezone_functions",
    "f_snowflake_id_codec",
    "f_rounding_mode_audit",
    "f_hex_bin_assign",
    "t_tumbling_window",
    "t_rollup_from_materialized",
    "e_decay_engagement_score",
    "t_lttb_downsample",
    "t_seasonality_dow_profile",
    "t_event_order_skew",
    "t_max_drawdown",
    "e_snaive_forecast_backtest",
    "t_fiscal_445_calendar",
    "t_m4_downsample",
    "t_pinball_loss_eval",
    "t_drift_psi_weekly",
    "t_peak_detection",
    "t_rolling_origin_backtest",
    "e_spike_root_cause_drilldown",
    "e_linear_attribution",
    "e_dau_mau_stickiness",
    "e_growth_accounting",
    "e_bounce_rate",
    "e_shapley_attribution",
    "e_funnel_exclusion_steps",
    "e_markov_next_event_eval",
    "e_nps_score_ci",
    "e_gains_lift_table",
    "s_observe_qc_metrics",
    "s_profile_table",
    "j_bloom_runtime_filter",
    "s_benford_qc",
    "s_rendezvous_sharding",
    "n_bigram_lm_score",
    "n_dataset_card",
    "n_lang_quality_bands",
    "n_countmin_sketch",
    "n_bpe_pair_counts",
    "n_rouge_ngram_overlap",
    "n_sentence_stats",
    "n_span_corruption_stats",
    "n_code_detection_score",
    "n_blocklist_filter",
    "n_encoding_audit",
    "n_stemming_normalize",
    "n_watermark_detection",
    "n_tfidf_doc_similarity",
    "n_seq_length_histogram",
    "n_autocomplete_prefix_topk",
    "n_heaps_law_fit",
    "n_feature_scaling_params",
    "n_calibration_ece",
    "n_chat_alternation_audit",
    "n_langid_confusion_matrix",
    "n_preference_cycle_audit",
    "n_filter_ablation_matrix",
    "n_search_diversity_cap",
    "n_slice_eval_metrics",
    "n_zipf_law_fit",
    "n_self_bleu_diversity",
    "n_truncation_loss_sweep",
    "n_codeswitch_audit",
    "n_hashing_collision_sweep",
    "n_chao1_good_turing",
    "n_postings_compression_estimate",
    "n_moe_load_balance_proxy",
    "n_bigram_entropy_rate",
    "n_bpe_merge_simulation",
    "n_simhash",
    "n_minhash_lsh_mllib",
    "n_edit_distance_pairs",
    "n_repeated_ngram_spans",
    "n_dedup_survivorship_policy",
    "n_bloom_incremental_dedup",
    "n_lsh_parameter_sensitivity",
    "n_minhash_jaccard_calibration",
    "n_lsh_br_planner",
    "n_embedding_quantize",
    "n_class_balanced_downsample",
    "n_embedding_drift_psi",
    "n_mrr_retrieval_eval",
    "n_embedding_isotropy",
    "s_incremental_agg_maintenance",
    "n_temperature_sampling_weights",
    "n_curriculum_phases",
    "n_group_kfold",
    "s_merge_on_read_deletes",
    "n_dpo_preference_pairs",
    "m_av_sync_drift",
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
    "w_rolling_regression_slope",
    "t_weekly_spectral_power",
    "t_durbin_watson_residuals",
    "t_cross_correlation_lags",
    "t_hurst_exponent",
    "t_segmented_regression",
    "t_littles_law_check",
    "t_burstiness_fano",
    "t_record_days_check",
    "t_interarrival_burstiness",
    "t_permutation_entropy",
    "t_newey_west_se",
    "t_erlang_c_staffing",
    "t_forecast_prediction_intervals",
    "t_variance_ratio_test",
    "a_gini_concentration",
    "w_rolling_median",
    "a_target_encoding_loo",
    "a_hill_tail_exponent",
    "a_wilson_ci",
    "a_ols_two_feature",
    "a_oneway_anova_f",
    "a_mutual_information_2d",
    "a_empirical_bayes_shrinkage",
    "a_cvar_expected_shortfall",
    "a_spearman_rank_corr",
    "a_kruskal_wallis_dow",
    "a_cooks_distance_outliers",
    "a_hodges_lehmann_estimator",
    "a_negbin_moments_fit",
    "a_ipf_raking",
    "a_theil_decomposition",
    "a_jackknife_gini_se",
    "e_cohort_ltv_triangle",
    "e_diff_in_diff",
    "e_repurchase_rate_30d",
    "e_kpi_driver_decomposition",
    "e_cuped_adjustment",
    "e_ipw_adjustment",
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
    "s_snapshot_diff_cdf",
    "n_pps_systematic_sample",
    "n_dp_noisy_counts",
    "s_constraint_audit_all_tables",
    "s_crypto_shredding",
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
