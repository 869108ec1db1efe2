"""Measure the scaling CURVE instead of asserting it (round-2 VERDICT #5):
run the most expensive catalog entries at two scale points and record the
wall-time ratio against the data ratio. Sub-linear ratio = fixed cost
dominates; ~linear = healthy; super-linear = a data-dependent join
(Σ postings², pair blowup) — flagged.

Usage: python tools/bench_scaling.py [small_dir big_dir data_ratio]
Writes SCALING_LOCAL.json next to the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ENTRIES = [
    # top-10 of BENCH_LOCAL round 2 + the data-dependent pair joins
    "recursive_calendar_spine",
    "recursive_graph_reachability",
    "doc_similarity_tf_cosine",
    "pagerank_supplier_graph",
    "star_fact_summary",
    "dedup_minhash_lsh",
    "minhash_estimate_error",
    "profile_table_onepass",
    "ann_recall_eval",
    "dedup_minhash_portable",
    "ann_lsh_multiprobe_exact",
    "ann_cosine_topk",
    "simhash_hamming_pairs",
    "dedup_exact_jaccard",
    "jaccard_prefix_filter_pairs",
    "dedup_exact_documents",
    "q01_pricing_summary",
    "q09_product_profit",
    # round-3 continuation entries with non-trivial shapes
    "interval_islands_merge",
    "timeseries_linear_interpolation",
    "scd2_point_in_time_join",
    "attribution_linear_credit",
    "fifo_unit_range_matching",
    "time_weighted_average",
    "journey_path_signatures",
    "correlation_matrix_onepass",
    "gini_concentration_by_segment",
    "audience_overlap_matrix",
    # round-3 sketch/pruning + quantized-ANN wave
    "bloom_filter_prune_join",
    "kmv_distinct_sketch",
    "theta_sketch_intersection",
    "pq_adc_topk",
    "jl_projection_recall",
    "decontamination_bloom_prefilter",
    # round-3 sampling / spatial / linkage / SCD2 wave
    "weighted_sample_race",
    "spatial_grid_join",
    "rendezvous_shard_rebalance",
    "stratified_sample_exact",
    "scd2_build_from_changes",
    "record_linkage_fs_scoring",
    "dp_bounded_contribution_agg",
    "join_size_sketch_estimate",
    "seasonal_naive_forecast_eval",
    "sssp_weighted_frontier",
    "knn_label_eval",
    "decayed_topk_trending",
    "diversity_simpson_by_source",
    # round-3 analytics/ML-eval waves (monitoring, graph rounds, causal,
    # bootstrap, rules, fusion)
    "cusum_changepoint_screen",
    "rank_sum_auc_by_event_type",
    "label_propagation_communities",
    "kcore_decomposition",
    "one_rule_classifier_eval",
    "dataset_mix_temperature",
    "naive_bayes_lang_eval",
    "nelson_aalen_hazard",
    "apriori_frequent_triples",
    "hits_hub_authority",
    "calibration_reliability_bins",
    "gini_gain_feature_ranking",
    "ks_test_two_sample",
    "association_rules_from_triples",
    "poisson_bootstrap_ci",
    "delta_encoding_compression_audit",
    "difference_in_differences",
    "stratified_ate_adjustment",
    "mann_kendall_theil_sen",
    "cramers_v2_matrix",
    "kanonymity_risk_audit",
    "reciprocal_rank_fusion",
    "shapley_channel_attribution",
    "two_proportion_ab_test",
    "neyman_allocation_plan",
    "partitioner_balance_audit",
    "influence_cascade_rounds",
    "cumulative_gains_deciles",
    "retrieval_precision_at_k",
    "grid_density_clusters",
    "revenue_bridge_decomposition",
    "markov_absorption_3step",
    "rfm_segmentation",
    "readability_proxy_scores",
    "itemitem_collaborative_topk",
    "cohort_ltv_curves",
    "slo_burn_rate_alerts",
    "abc_pareto_classification",
    "skipgram_pair_counts",
    "ab_sample_size_plan",
    "permutation_test_diff_means",
    # current-session classical-algorithms wave (323 -> 350)
    "kendall_tau_by_year",
    "spearman_rho_by_year",
    "pettitt_changepoint_daily",
    "ndcg_graded_retrieval",
    "data_vault_model_build",
    "cohens_kappa_agreement",
    "randomized_response_estimate",
    "pinball_loss_quantile_eval",
    "fdr_bh_screen",
    "heaps_vocab_growth_curve",
    "zipf_rank_frequency_audit",
    "qini_uplift_deciles",
    "geohash_prefix_rollup",
    "adaboost_two_round_stumps",
    "feature_hashing_collision_audit",
    "huffman_code_audit",
    "consistent_hash_ring_rebalance",
    "croston_intermittent_forecast",
    "simpson_paradox_audit",
    "bipartiteness_check_rounds",
    "knapsack_greedy_selection",
    "markov_removal_attribution",
    "dirichlet_lm_retrieval",
    "eoq_order_quantity",
    "clustering_coefficient_global",
    "discounted_ltv_npv",
    "gini_tree_depth2",
    "viterbi_hmm_decoding",
    "wilcoxon_signed_rank",
    "pcy_pair_pruning",
    "flajolet_martin_distinct",
    "stable_matching_assortative",
    "modularity_score_partition",
    "bom_explosion_recursive",
    "ransac_line_consensus",
    "hbos_anomaly_scores",
    "misra_gries_heavy_hitters",
    "count_sketch_signed",
    "elo_rating_two_teams",
    "logrank_test_groups",
    "kcenter_greedy_seeding",
    "resource_allocation_link_prediction",
    "neighborhood_function_bitmask",
    "copeland_condorcet_ranking",
    "percolation_threshold_scan",
    "kendall_w_concordance",
    "cronbach_alpha_reliability",
    "yule_k_characteristic",
    "lz78_phrase_complexity",
    "classical_decomposition_additive",
    "pacf_durbin_levinson",
    "block_maxima_return_levels",
    "davies_bouldin_medoid_index",
    "good_turing_missing_mass",
    "chao1_vocabulary_estimate",
    "lincoln_petersen_population",
    "mmr_diversified_rerank",
    "power_iteration_top_eigen",
    "diag_mahalanobis_outliers",
    "littles_law_audit",
    "kingman_queue_estimate",
    "erlang_b_blocking",
    "kaplan_meier_product_limit",
    "herfindahl_concentration_index",
    "sinkhorn_ipf_balancing",
    # round-4 wave (every new entry, per the keep-scaling-honest rule)
    "cramer_von_mises_integer",
    "kruskal_wallis_by_priority",
    "cochran_q_test",
    "jonckheere_terpstra_trend",
    "tail_dependence_empirical",
    "ipw_ate_estimate",
    "regression_discontinuity_cutoff",
    "iv_wald_estimate",
    "sharpe_ratio_monthly_revenue",
    "bollinger_breakout_days",
    "hampel_filter_outliers",
    "sax_symbolic_motifs",
    "ams_f2_moment_sketch",
    "kneser_ney_bigram_model",
    "inclusion_dependency_audit",
    "roc_curve_points",
    "cost_threshold_optimization",
    "hoover_index_by_region",
    "quintile_share_ratio",
    "total_variation_drift",
    "chebyshev_bound_audit",
    "friedman_test_weeks",
    "pages_l_trend_test",
    "runs_test_median",
    "turning_points_randomness",
    "durbin_watson_daily",
    "critical_path_longest",
    "zonemap_pruning_audit",
    "merge_into_emulation",
    "vocab_coverage_curve",
    "erlang_c_wait_probability",
    "ldiversity_audit",
    "lorenz_curve_deciles",
    "mase_forecast_eval",
    "confusion_matrix_metrics",
    "fixed_effects_within_estimator",
    "local_clustering_topk",
    "ktruss_edge_peel",
    "holm_bonferroni_screen",
    "language_profile_similarity",
    "bpe_compression_ratio",
    "bigram_model_coverage",
    "dedup_cluster_census",
    "pr_curve_points",
    "cohens_d_effect_size",
    "odds_ratio_by_nation",
    # round-5: the trigram-explode entry whose materialization was dropped
    # (re-derive per consumer; checkpoint only the bounded model aggregate)
    "charlm_freq_score",
    # round-5 new entries
    "ljung_box_portmanteau",
    "theil_u2_seasonal",
    "binseg_changepoint_daily",
    "lift_gain_deciles",
    "map_at_k_retrieval",
    "brier_score_decomposition",
    "levene_brown_forsythe",
    "holt_linear_smoothing",
    "fk_orphan_audit",
    "ivm_incremental_agg",
    "scan_structural_similarity",
    "silhouette_medoid_eval",
    "dbscan_grid_core_points",
    "historical_var_cvar",
    "permutation_test_mean_diff",
    "sprt_sequential_ab",
    "mood_median_test",
    "isotonic_regression_minimax",
    "western_electric_rules",
    "coordinated_join_sample",
    "dtw_alignment_distance",
    "token_cooccurrence_lift",
    "personalized_pagerank_restart",
    "small_file_compaction_plan",
    "position_delete_read",
    "benjamini_yekutieli_screen",
    "secretary_optimal_stopping",
    "inventory_policy_simulation",
    "lindley_queue_backlog",
    "business_days_sla_audit",
    "topsis_l1_ranking",
    "haar_wavelet_energy",
    "matrix_profile_motif",
    "vshape_pattern_detect",
    "join_size_histogram_estimate",
    "wasserstein1_binned_drift",
    "cochran_armitage_trend",
    "price_index_fisher",
    "shift_share_decomposition",
    "rolling_beta_window",
    "rich_club_coefficient",
    "anderson_darling_two_sample",
    "goodman_kruskal_gamma",
    "quantile_treatment_effect",
    # round-5 wave 11
    "welch_t_test",
    "anova_oneway_f",
    "mantel_haenszel_pooled_or",
    "james_stein_shrinkage",
    "kde_triangular_grid",
    "dft_weekly_power",
    # round-5 wave 12
    "holt_winters_additive",
    "chain_ladder_reserve",
    "min_variance_two_asset",
    "johnsons_rule_schedule",
    "sorted_neighborhood_blocking",
    # round-5 wave 13
    "wagner_whitin_lotsizing",
    "critical_path_slack",
    "jarque_bera_normality",
    "ttl_cache_hit_simulation",
    # round-5 wave 14
    "yule_walker_ar2",
    "pollaczek_khinchine_wait",
    "rmst_survival_area",
    "storey_pi0_estimate",
    "binpacking_ffd_bound",
    # round-5 wave 15
    "graph_diameter_bitmask",
    "boruvka_mst_rounds",
    # round-5 wave 16
    "ols_two_predictor_nation",
    "hodges_lehmann_shift",
    "theta_method_forecast",
    "kalman_local_level",
    # round-5 wave 17
    "conformal_interval_coverage",
    "beta_binomial_shrinkage",
    "katz_centrality_rounds",
    "mediation_product_paths",
    # round-5 wave 18
    "successive_halving_arms",
    "rake_keyphrase_scores",
    "voptimal_histogram_dp",
    # round-5 wave 19
    "dickey_fuller_unit_root",
    "ansari_bradley_scale_test",
    "arc_price_elasticity",
    # round-5 wave 20
    "cross_validation_kfold",
    "xbar_r_control_chart",
    "weighted_interval_scheduling",
    # round-6 wave 21 (every new entry, per the keep-scaling-honest rule)
    "dhondt_seat_apportionment",
    "p_chart_attribute_control",
    "quality_classifier_logreg_apply",
    "bartlett_variance_homogeneity",
    "taylors_law_powerfit",
    "pot_gpd_moment_fit",
    "weibull_median_ranks_fit",
    "schulze_beatpath_ranking",
    "synthetic_control_distance_weights",
    "rescaled_range_hurst",
    "lcs_event_type_sequences",
    "textrank_keyword_scores",
    "betweenness_sampled_sources",
    "greedy_maximal_matching_rounds",
    # round-6 wave 22
    "apsp_min_plus_doubling",
    "inequality_indices_panel",
    "permutation_entropy_ordinal",
    "sample_entropy_daily",
    "lagged_mutual_information",
    "poisson_two_rate_test",
    "ses_alpha_grid_eval",
    # round-6 wave 23
    "jensen_shannon_drift",
    "youden_j_threshold",
    "hill_tail_index",
    "markov_entropy_rate",
    "gini_mean_difference",
    "median_polish_two_way",
    # round-6 wave 24
    "chow_test_structural_break",
    "granger_causality_onelag",
    "breusch_pagan_heteroscedasticity",
    "bartels_rank_von_neumann",
    # round-7 wave 25 (every new entry) + the tiered-rank conversions
    # whose plans changed materially this round
    "siegel_tukey_scale_test",
    "latency_percentiles_exact",
    "trimmed_winsorized_means",
    "mad_robust_scale",
    "bowley_kelly_quantile_skew",
    "qq_decile_two_sample",
    "ansari_bradley_scale_test",
    "anderson_darling_two_sample",
    "sorted_neighborhood_blocking",
    "kingman_queue_estimate",
    "goodman_kruskal_gamma",
    "sprt_sequential_ab",
    "kruskal_wallis_by_priority",
    "histogram_equidepth",
    "position_delete_read",
    "quintile_share_ratio",
    "lorenz_curve_deciles",
    "pareto_frontier_customers",
    # round-7 wave 26
    "cliffs_delta_effect_size",
    "brunner_munzel_test",
    "dixon_q_extreme_gap",
    "tukey_fences_outliers",
    # round-8 wave 27 (salted skew + adaptive bands) + every entry whose
    # plan changed under the broadcast/window audit conversions
    "salted_hot_key_join",
    "salted_skew_aggregate",
    "global_median_adaptive_bands",
    "abc_pareto_classification",
    "nelson_aalen_hazard",
    "rfm_segmentation",
    "part_demand_intermittency",
    "cohort_retention",
    "basket_pair_affinity",
    "degree_assortativity",
    "apsp_min_plus_doubling",
    "schulze_beatpath_ranking",
    "q18_large_volume_customers",
    "q08_market_share",
]


def timed(q, spark, sf_dir: str, reps: int = 2) -> float:
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        q.spark(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist(False)
    return best


def main() -> None:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    big = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scale/sf0.5"
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0

    from nyc_taxi_data_pipeline_spark.plans.queries import REGISTRY
    from nyc_taxi_data_pipeline_spark.session import get_spark

    extra = {}
    if os.path.isdir("/dev/shm"):
        extra["spark.local.dir"] = "/dev/shm/spark-scaling"
    spark = get_spark(app_name="scaling", extra_conf=extra)
    spark.range(1).count()

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SCALING_LOCAL.json",
    )
    # incremental + resumable: reload prior results, write after each entry
    out: dict[str, dict] = {}
    if os.path.isfile(path):
        try:
            with open(path) as f:
                prior = json.load(f)
            if prior.get("small") == small and prior.get("big") == big:
                out = prior.get("entries", {})
        except (OSError, ValueError):
            pass
    for name in ENTRIES:
        if name in out and "error" not in out[name]:
            continue
        q = REGISTRY[name]
        try:
            t_small = timed(q, spark, small)
            t_big = timed(q, spark, big)
            r = t_big / t_small if t_small > 0 else float("nan")
            out[name] = {
                "sec_small": round(t_small, 2),
                "sec_big": round(t_big, 2),
                "time_ratio": round(r, 2),
                "data_ratio": ratio,
                "verdict": (
                    "superlinear" if r > ratio * 1.3
                    else "linear" if r > 0.6 * ratio
                    else "sublinear"
                ),
            }
        except Exception as e:  # noqa: BLE001
            out[name] = {"error": f"{type(e).__name__}: {e}"[:200]}
        print(name, out[name], file=sys.stderr, flush=True)
        with open(path, "w") as f:
            json.dump({"small": small, "big": big, "data_ratio": ratio,
                       "entries": out}, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
