"""Partitioning-invariance gate: the engine's float-parity discipline
(NOTES.md — DECIMAL partial sums, integer fixed-point iteration,
md5-threshold sampling) claims results are BIT-IDENTICAL under any
input split / shuffle partitioning. The DuckDB oracle only ever checks
one partitioning, so this suite re-executes the float- and
order-sensitive queries under adversarial settings — tiny
maxPartitionBytes (many scan splits → different partial-aggregation
order) and a different shuffle partition count — and requires exact
value equality including every double bit (repr comparison).

A query that silently summed doubles in partition order would pass the
oracle and fail here.
"""

import math

import pytest

from data_streaming_udacity_p2_evaluate_human_balance_with_spark_streaming_spark.plans.queries import (
    REGISTRY,
)

#: sf0.01, not SF_SMOKE: the adversarial split size must actually split
#: the inputs (events.parquet is 221 KB here vs 27 KB at sf0.001, so
#: 32 KB maxPartitionBytes yields ~7 scan splits instead of 1).
SF_DET = "/root/testdata/sf0.01"

#: queries whose outputs carry doubles/decimals produced by aggregation,
#: iteration, or windowed arithmetic — the ones partition order could
#: plausibly perturb.
SENSITIVE = [
    "regr_value_vs_time",
    "anomaly_zscore_events",
    "stats_aggregates",
    "winsorize_value_per_type",
    "quality_logit_frozen",
    "table_content_digest",
    "weighted_median_doc_length",
    "sensor_gap_interpolation",
    "bot_regularity_timing",
    "hll_distinct_portable",
    "semdedup_cluster_cap",
    "pagerank_parts_copurchase",
    # float-ORDERING sensitive: top-k / threshold picks where a
    # nondeterministic tie-break would flip rows between partitionings
    "tfidf_top_terms",
    "ann_cosine_topk",
    "dedup_embedding_cosine",
    "embedding_random_projection",
    "quantile_bins_sketch",
    "mixture_temperature_resample",
    # order-sensitive rebuilds: position-ordered reassembly + float-bin
    # classification must not depend on partitioning either
    "boilerplate_strip_rewrite",
    "quality_calibration_bins",
    "classifier_auc_exact",
    "bigram_lift_collocations",
    "association_rules_copurchase",
    "ab_test_cuped",
    "anomaly_mad_events",
    "source_token_tv_divergence",
    "vocab_coverage_topk",
    "funnel_latency_percentiles",
    "dau_wau_stickiness",
    "revenue_gini_concentration",
    "ltv_cohort_curves",
    "top_event_paths_3step",
    "seasonal_naive_backtest",
    "abc_pareto_parts",
    "chi_square_independence",
    "ks_two_sample_sources",
    "benford_first_digit",
    "link_prediction_scores",
    "rfm_segments",
    "mom_revenue_growth",
    "kaplan_meier_retention",
    "markov_stationary_events",
    "readability_forcast",
    "zipf_slope_by_source",
    "cube_event_profile",
    "seasonality_autocorr",
    "anova_value_by_type",
    "unpivot_event_matrix",
    "loo_target_encoding",
    "embedding_centroid_shift",
    "pca_top_component",
    "last_touch_attribution",
    "two_proportion_ztest",
    "bigram_lm_perplexity",
    "transition_entropy_mi",
    "decision_stump_split",
    "label_centroid_similarity",
    "cusum_changepoint",
    "seasonal_strength_eta",
    "bitmap_intersect_users",
    "peak_concurrency",
    "growth_accounting_dau",
    "degree_powerlaw_mle",
    "skyline_pareto_docs",
    "overdispersion_index",
    "time_weighted_avg_value",
    "bellman_ford_cheapest_path",
    "share_of_parent_revenue",
    "mannwhitney_u_click_view",
    "spearman_value_vs_time",
    "ewma_user_value",
    "kendall_tau_daily_volume",
    "mv_incremental_maintenance",
    "gdpr_erasure_cascade",
    "apportion_sample_budget",
    "quantile_normalize_by_source",
    "classifier_logloss_brier",
    "json_schema_inference",
    "kfold_assignment_balanced",
    "embedding_diversity_by_label",
    "active_coverage_time",
    "weighted_sample_wor",
    "digest_bucket_drilldown",
    "holt_linear_daily_volume",
    "kmeans_assign_step",
    "rrf_fusion_topk",
    "debounce_rate_limit",
    "conformal_interval_daily",
    "watermark_lateness_profile",
    "theil_sen_daily_trend",
    "scd2_interval_build",
    "fk_orphan_report",
    "stump_cv_accuracy",
    "nearest_centroid_accuracy",
    "bm25_topk",
    "time_decay_attribution",
    "negative_sampling_copurchase",
    "threshold_breach_episodes",
    "diff_in_diff_value",
    "encoding_advisor",
    "relational_division_users",
    "cart_abandonment_rate",
    "hll_sliding_7day_users",
    "woe_encoding_bins",
    "paired_sign_test_improvement",
    # r8 wave
    "welch_ttest_click_view",
    "kruskal_wallis_value_by_type",
    "trimmed_mean_value_by_type",
    "mood_median_test",
    "gopher_quality_rules",
    "context_fit_report",
    "shingle_containment_pairs",
    "dirichlet_lm_topk",
    "js_source_divergence",
    "grubbs_outlier_by_type",
    "runs_test_daily_volume",
    "ljung_box_daily_volume",
    "cochran_armitage_trend",
    "duplicate_payment_pairs",
    "lexical_density_by_source",
    "kl_surprise_docs",
    "rank_biased_overlap_topk",
    "rbo_bm25_vs_lm",
    # r9 wave
    "chi_square_gof_uniform",
    "mann_kendall_trend_daily",
    "eb_shrunk_purchase_rate",
    "jackknife_purchase_view_ratio",
    "capture_recapture_users",
    "good_turing_unseen_mass",
    "shapley_channel_attribution",
    "fellegi_sunter_linkage",
    "entity_resolution_clusters",
    "heaps_law_vocab_growth",
    "markov_removal_attribution",
]


def _norm(v):
    """Canonicalize to STRINGS so row tuples always sort (a NULLable
    double column yields float/None mixes that Python can't compare)."""
    if v is None:
        return "\0NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, list):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(_norm(r[c]) for c in cols) for r in df.collect())


#: r13 verify-window fix: the slowest invariance re-executions (each
#: runs its query TWICE under adversarial splits — these 13 cost 151 s
#: of the suite's 41 min). Invariance is the depth axis; each query's
#: value contract stays in the default set via test_oracle_parity, and
#: the full suite (-m "slow or not slow") still runs all of these.
_SLOW_INVARIANCE = {
    "pca_top_component",
    "classifier_logloss_brier",
    "quantile_normalize_by_source",
    "negative_sampling_copurchase",
    "diff_in_diff_value",
    "encoding_advisor",
    "json_schema_inference",
    "markov_stationary_events",
    "pagerank_parts_copurchase",
    "dau_wau_stickiness",
    "entity_resolution_clusters",
    "active_coverage_time",
    "link_prediction_scores",
}


@pytest.mark.parametrize(
    "name",
    [
        pytest.param(n, marks=pytest.mark.slow) if n in _SLOW_INVARIANCE else n
        for n in SENSITIVE
    ],
)
def test_partitioning_invariance(spark, name):
    confs = {
        "spark.sql.files.maxPartitionBytes": "32768",  # many scan splits
        "spark.sql.shuffle.partitions": "5",
        # AQE coalescing/skew-splitting is another partitioning axis the
        # results must be invariant to
        "spark.sql.adaptive.enabled": "false",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    fn = REGISTRY[name][0]
    baseline = _rows(fn(spark, SF_DET))
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        spark.catalog.clearCache()
        adversarial = _rows(fn(spark, SF_DET))
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
        spark.catalog.clearCache()
    assert adversarial == baseline
