"""Determinism under parallelism — THE distributed-correctness property:
a query's result must not depend on how the input happens to be split.
Each sampled operator runs on a 1-partition and a 7-partition copy of
the same data; canonicalized results must be identical. Catches
accidental dependence on row order, partition-local state, or
nondeterministic tie-breaks that the single-layout oracle check can't
see."""

from __future__ import annotations

import pytest

from iris_pyspark_spark.catalog import load_table
from iris_pyspark_spark.testing import canonical_rows

# The heaviest battery in the suite (every sampled operator runs twice
# per test, and the shuffle-width batteries re-execute whole query
# families): excluded from the default run via the `slow` marker to keep
# `pytest tests/` under 10 minutes. The pre-snapshot gate runs
# `pytest -m slow` explicitly — split coverage, not lost coverage.
pytestmark = pytest.mark.slow

LAYOUTS = (1, 7)


def _invariant(make_df):
    results = [canonical_rows(make_df(n).toPandas()) for n in LAYOUTS]
    assert results[0] == results[1], "result depends on input partitioning"
    assert len(results[0]) > 0


def test_sessionize_partition_invariant(spark, sf_dir):
    from iris_pyspark_spark.operators.sessionize import sessionize

    e = load_table(spark, sf_dir, "events")
    _invariant(
        lambda n: sessionize(
            e.repartition(n), key="user_id", ts="ts",
            gap_seconds=1800, tie_break="event_id",
        ).select("user_id", "event_id", "session_id")
    )


def test_minhash_partition_invariant(spark, sf_dir):
    from iris_pyspark_spark.operators.dedup import minhash_signatures

    d = load_table(spark, sf_dir, "documents")
    _invariant(
        lambda n: minhash_signatures(d.repartition(n), "doc_id", "text", 3, 16)
    )


def test_cosine_topk_partition_invariant(spark, sf_dir):
    from iris_pyspark_spark.operators.similarity import cosine_topk_blockwise

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    pdf = e.toPandas()
    _invariant(
        lambda n: cosine_topk_blockwise(
            e.repartition(n), pdf,
            c_id="vec_id", c_vec="embedding", k=3, dim=64,
            out_query_col="q_id",
        )
    )


def test_salted_agg_partition_invariant(spark, sf_dir):
    from pyspark.sql import functions as F

    from iris_pyspark_spark.operators.skew import salted_agg
    from iris_pyspark_spark.queries.joins import cents

    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    _invariant(
        lambda n: salted_agg(
            e.repartition(n),
            key="user_id",
            aggs={"n": F.lit(1).cast("long"), "cents": cents(F.col("value"))},
            salt_src="event_id",
            n_salts=5,
        )
    )


def test_simhash_pairs_partition_invariant(spark, sf_dir):
    from pyspark.sql import functions as F

    from iris_pyspark_spark.operators.dedup import simhash_near_pairs, simhash64
    from iris_pyspark_spark.queries.llm_dedup import _near_dup_corpus

    corpus = _near_dup_corpus(spark, sf_dir)
    sigs = corpus.select(
        "doc_id", simhash64("split(lower(text), ' ')").alias("simhash")
    )
    _invariant(
        lambda n: simhash_near_pairs(
            sigs.repartition(n), "doc_id", "simhash", max_hamming=8
        )
    )


def test_global_ids_partition_invariant(spark, sf_dir):
    from iris_pyspark_spark.operators.ids import global_ids

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    _invariant(
        lambda n: global_ids(d.repartition(n), "source", ["doc_id"]).select(
            "doc_id", "global_id"
        )
    )


def test_pq_codes_partition_invariant(spark, sf_dir):
    from iris_pyspark_spark.operators.similarity import pq_codes
    from iris_pyspark_spark.queries.llm_similarity import _pq_codebook

    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cb = _pq_codebook(e)
    _invariant(
        lambda n: pq_codes(
            e.repartition(n), cb, c_id="vec_id", c_vec="embedding"
        ).select("vec_id", "sub", "code")
    )


def test_jaccard_pairs_partition_invariant(spark, sf_dir):
    from iris_pyspark_spark.operators.dedup import jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    _invariant(
        lambda n: jaccard_pairs(
            d.repartition(n), "doc_id", "text", block_col="source",
            min_jaccard=0.3,
        ).select("id_a", "id_b", "n_shared")
    )


def test_countmin_cells_partition_invariant(spark, sf_dir):
    """CMS cells are plain exact counts per (row, bucket) — any layout
    dependence would mean the bucket hash or the explode is unstable."""
    from pyspark.sql import functions as F

    d = 4
    w = 1024
    docs = load_table(spark, sf_dir, "documents").limit(200)

    def cells(n):
        toks = (
            docs.repartition(n)
            .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("term"))
            .filter(F.length("term") > 0)
        )
        coords = F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    F.pmod(F.xxhash64("term", F.lit(r)), F.lit(w)).alias("bucket"),
                )
                for r in range(d)
            ]
        )
        return (
            toks.select(F.explode(coords).alias("c"))
            .groupBy(F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
            .agg(F.count(F.lit(1)).alias("cell"))
        )

    _invariant(cells)


def test_round4_stats_shuffle_width_invariant(spark, sf_dir):
    """The round-4 statistics batch claims every float is derived from
    exact-integer sufficient statistics, so results must be identical
    under different shuffle widths (different partition counts reorder
    every partial-aggregation combine). Run each query at 2 and 32
    shuffle partitions and require canonically identical output — this
    would catch a stray float accumulation (e.g. a double SUM before
    the micro-unit rounding) that the single-layout oracle compare can
    miss when DuckDB happens to sum in the same order."""
    from iris_pyspark_spark.registry import load_all

    reg = load_all()
    names = (
        "a_market_basket_lift", "t_acf_lags", "e_welch_ttest",
        "g_degree_assortativity", "w_cusum_changepoint",
        "a_chi_square_independence", "a_gini_concentration",
        "e_survival_km_curve", "t_ewma_smoothing",
        "n_naive_bayes_langid", "e_pareto_8020", "n_cooccurrence_pmi",
        "a_quantile_histogram_sketch", "n_mrl_prefix_rerank",
        "n_ndcg_retrieval_eval", "t_vwap_weekly", "g_clustering_coefficient",
    )
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in names:
            outs = []
            for width in ("2", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", width)
                pdf = reg[name].fn(spark, sf_dir).toPandas()
                outs.append(canonical_rows(pdf))
            assert outs[0] == outs[1], (
                f"{name}: result depends on shuffle width"
            )
            assert len(outs[0]) > 0, name
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)


def test_round4_fifth_continuation_shuffle_width_invariant(spark, sf_dir):
    """Same exact-sufficient-statistics contract for the fifth
    continuation batch: identical canonical output at 2 and 32 shuffle
    partitions. Notable members: Mann-Whitney's doubled-rank sums (any
    float rank averaging would break), the KMV sketches (bottom-k sets
    must not depend on layout), mutual information (per-cell micro-nat
    rounding BEFORE the sum), and the mapInPandas frame-signature
    extractors (per-row arithmetic, so partitioning must be invisible)."""
    from iris_pyspark_spark.registry import load_all

    reg = load_all()
    names = (
        "e_mann_whitney_u", "t_theil_sen_trend", "a_kmv_distinct_sketch",
        "j_entity_resolution_blocked", "e_shapley_attribution",
        "n_group_kfold", "n_feature_scaling_params", "n_mrr_retrieval_eval",
        "a_ols_two_feature", "a_cohens_kappa", "e_ratio_delta_method_ci",
        "f_snowflake_id_codec", "m_scene_cut_detection", "a_oneway_anova_f",
        "a_kmv_set_intersection", "a_mutual_information_2d",
        "t_durbin_watson_residuals", "m_vad_segments",
        "t_spc_xmr_chart", "e_sprt_sequential_test", "sql_q88_time_bands",
        "f_luhn_checksum", "g_community_conductance",
        "n_colbert_maxsim_rerank", "t_fiscal_445_calendar",
        "s_merkle_tree_root", "t_m4_downsample", "n_binary_hash_retrieval",
        "n_calibration_ece", "n_chat_alternation_audit",
        "n_langid_confusion_matrix", "t_pinball_loss_eval",
        "n_preference_cycle_audit", "e_funnel_exclusion_steps",
        "a_distinct_estimator_comparison",
        "e_markov_next_event_eval", "s_constraint_audit_all_tables",
        "t_drift_psi_weekly", "t_peak_detection",
        "a_empirical_bayes_shrinkage", "t_rolling_origin_backtest",
        "a_simpsons_paradox_detector",
        "e_nps_score_ci", "e_direct_standardization", "n_dedup_stage_funnel",
        "e_price_volume_mix", "a_cvar_expected_shortfall",
        "f_penny_allocation", "j_bitemporal_reconstruction",
        "n_filter_ablation_matrix", "e_gains_lift_table",
        "n_embedding_isotropy", "e_spike_root_cause_drilldown",
        "n_minhash_jaccard_calibration", "a_intraclass_correlation",
        "n_search_diversity_cap", "t_mann_kendall_test",
        "e_quantile_treatment_effects", "n_slice_eval_metrics",
    )
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in names:
            outs = []
            for width in ("2", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", width)
                pdf = reg[name].fn(spark, sf_dir).toPandas()
                outs.append(canonical_rows(pdf))
            assert outs[0] == outs[1], (
                f"{name}: result depends on shuffle width"
            )
            assert len(outs[0]) > 0, name
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)


def test_round4_seventh_continuation_shuffle_width_invariant(spark, sf_dir):
    """Same exact-sufficient-statistics contract for the seventh
    continuation batch: identical canonical output at 2 and 32 shuffle
    partitions. Notable members: the doubled-rank family (Spearman,
    Kruskal-Wallis) whose tie-corrected ranks must stay integer; the
    nano-nat KL leaves of the JSD pair table (a float sum before the
    leaf rounding would drift with combine order); the Hurst blocks
    (n·Z_k scaling); and the winnowing selection, whose rightmost-min
    window key must be layout-independent."""
    from iris_pyspark_spark.registry import load_all

    reg = load_all()
    names = (
        "n_zipf_law_fit", "n_js_divergence_sources", "e_bh_fdr_correction",
        "a_spearman_rank_corr", "e_wasserstein_spend_shift",
        "n_self_bleu_diversity", "a_kruskal_wallis_dow",
        "t_cross_correlation_lags", "t_hurst_exponent",
        "n_winnowing_fingerprints", "t_segmented_regression",
        "a_cooks_distance_outliers", "sql_recursive_ancestor_rollup",
        "n_embedding_cluster_jsd", "e_chain_ladder_ltv",
        "t_littles_law_check", "m_perceptual_hash_dedup",
        "a_hodges_lehmann_estimator", "e_segment_migration_matrix",
        "t_burstiness_fano", "e_price_elasticity",
        "t_record_days_check", "a_negbin_moments_fit",
        "t_interarrival_burstiness", "e_attribution_window_sweep",
        "f_rounding_mode_audit", "n_hubness_skew",
        "n_truncation_loss_sweep", "g_rich_club_coefficient",
        "u_udaf_gini_crosscheck", "f_map_aggregation_pipeline",
        "s_json_nested_scan", "o_except_all_intersect_all",
        "t_session_window_funnel", "t_sliding_window_wow",
        "n_codeswitch_audit", "j_fuzzy_name_trigram", "a_ipf_raking",
        "e_weibull_survival_fit", "t_permutation_entropy",
        "n_hashing_collision_sweep", "n_chao1_good_turing",
        "a_fleiss_kappa", "n_postings_compression_estimate",
        "j_hierarchy_closure_table", "n_moe_load_balance_proxy",
        "a_cronbach_alpha", "n_bigram_entropy_rate",
        "t_newey_west_se", "a_theil_decomposition", "a_mcnemar_test",
        "a_dorfman_group_testing", "g_avg_neighbor_degree_curve",
        "e_abc_xyz_matrix", "t_erlang_c_staffing",
        "n_bpe_merge_simulation", "n_lsh_br_planner",
        "t_forecast_prediction_intervals", "t_variance_ratio_test",
        "e_mde_runtime_curve", "a_jackknife_gini_se",
    )
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in names:
            outs = []
            for width in ("2", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", width)
                pdf = reg[name].fn(spark, sf_dir).toPandas()
                outs.append(canonical_rows(pdf))
            assert outs[0] == outs[1], (
                f"{name}: result depends on shuffle width"
            )
            assert len(outs[0]) > 0, name
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)


def test_round5_shuffle_width_invariant(spark, sf_dir):
    """Round-5 additions: identical canonical output at 2 and 32
    shuffle partitions. Notable members: the permutation test (per-perm
    md5 rank windows must not depend on layout), Bradley-Terry (nano-
    BIGINT leaf rounding before the MM denominator sum), the ray-cast
    parity rollup (pure integers), hex cube-rounding (closed-form
    doubles, one expression tree), and content-defined chunking
    (exact-integer window hashes)."""
    from iris_pyspark_spark.registry import load_all

    reg = load_all()
    names = (
        "e_permutation_test_exact", "e_bradley_terry_strength",
        "j_point_in_polygon", "f_hex_bin_assign",
        "m_content_defined_chunking", "n_dpo_preference_pairs",
        "s_vacuum_orphan_files", "s_corrupt_record_audit",
        "g_square_count",
        # round-5 scale fixes: SNM ranks tie-break on (prefix, doc_id);
        # the top-5 shortlist tie-breaks on (jaccard desc, id_b)
        "n_edit_distance_pairs", "n_ngram_jaccard",
    )
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in names:
            outs = []
            for width in ("2", "32"):
                spark.conf.set("spark.sql.shuffle.partitions", width)
                pdf = reg[name].fn(spark, sf_dir).toPandas()
                outs.append(canonical_rows(pdf))
            assert outs[0] == outs[1], (
                f"{name}: result depends on shuffle width"
            )
            assert len(outs[0]) > 0, name
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)
