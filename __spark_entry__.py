"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``weather_stream_processor_spark``; this module is
a thin adapter over its query registry (one entry per operator from
SURVEY.md §2, each a (PySpark builder, DuckDB oracle SQL) pair).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from weather_stream_processor_spark.registry import all_queries  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Tumbling 1-hour window SUM of `value` by `event_type` over `events` —
    the reference's core semantics (weather_processor.py:139-141) with the
    implicit hourly bucketing made an explicit window (SURVEY §2.5 St5).
    """
    spec = all_queries()["hourly_value_by_type"]
    return spec.builder(spark, SMOKE_SF_DIR)


# Sampling priority: the driver's per-round correctness gate checks a
# ~50-query sample that tracks iteration order, so each round front-loads
# registered-but-never-driver-sampled queries to drain the unsampled set.
# Rotated for round 6 (r5 verdict tasks 1+2): every name with a green
# driver row in any CORRECTNESS_r0{1..5}.json is REMOVED from the window;
# what remains is exactly the 177 oracle-backed queries with no green
# driver record, computed from those files against the registry.
# Slots 1-8 lead with the repairs: the two r5 driver failures
# (array_set_operations -- union_head stringified; embedding_covariance_
# spectrum -- integer-lifted permutation-invariant moments), the stale trio
# whose only driver record predates its oracle or a since-fixed bug
# (doc_fingerprints r01 hash-fail since fixed; minhash_lsh_near_dup and
# simhash_buckets sampled r01/r02 as no_oracle), and the Fellegi-Sunter
# linkage trio added post-sample in r5. Slots 9-50 continue the r5 window's
# backlog in its original drain order; everything behind pre-stages rounds
# 7-9 so the drain continues without another edit. Rows-only queries
# (sketches, whitening audit, BPE, zlib) are excluded from the
# hash-priority window by construction. All 177 are oracle-backed and
# green under the full local parity sweep (tools/oracle_check.py, now
# driver-strict: exact float equality + non-scalar column rejection);
# rotation converts "pass (local)" rows into driver-verified rows.
# Queries not listed keep registry (module import) order, i.e. the 189
# already-verified names trail the window.
_SAMPLE_PRIORITY: tuple[str, ...] = (
    "array_set_operations", "embedding_covariance_spectrum", "doc_fingerprints",
    "minhash_lsh_near_dup", "simhash_buckets", "fellegi_sunter_linkage",
    "linkage_agreement_patterns", "fellegi_sunter_em_step", "streaming_cusum_monitor",
    "streaming_windowed_topk_users", "streaming_stream_stream_semi_join", "streaming_blocklist_decontam",
    "weighted_median_price_by_brand", "revenue_share_of_parent", "revenue_seasonality_index",
    "brand_association_rules", "label_propagation_communities", "top_event_paths",
    "attribution_last_touch", "dau_mau_stickiness", "customer_order_gap_churn_risk",
    "weekday_hour_heatmap", "degree_assortativity", "kcore_decomposition",
    "bfs_shortest_paths", "kaplan_meier_retention", "markov_absorption_conversion",
    "markov_removal_attribution", "ks_drift_two_sample", "train_test_time_split_audit",
    "shuffle_partition_advisor", "rake_keyphrases", "oov_rate_by_source",
    "token_burstiness", "source_quality_league", "tfidf_cosine_doc_pairs",
    "quality_screen_agreement", "time_spine_gap_fill", "forward_fill_hourly",
    "weekly_retention", "funnel_signup_view_purchase", "event_transition_matrix",
    "rolling_zscore_anomalies", "funnel_conversion", "ohlc_bars_15min",
    "interval_merge_coverage", "delta_event_compression", "seasonal_trend_decompose",
    "ewma_truncated_smoothing", "linear_interpolate_hourly", "acf_daily_value",
    "cusum_level_shift", "theilsen_trend_by_user", "seasonal_naive_backtest",
    "time_weighted_average_daily", "interarrival_profile", "funnel_time_to_convert",
    "sax_daily_symbols", "sax_motif_counts", "event_pattern_regex",
    "top3_orders_per_customer", "rank_orders_by_status", "lag_lead_order_gaps",
    "running_sum_by_user", "moving_avg_by_user", "orders_global_rank",
    "ntile_order_quartiles", "global_topk_orders", "window_distribution_functions",
    "global_sorted_supplier_ledger", "percentile_bucketing", "time_range_window_sum",
    "batch_sessionization", "revenue_contribution_pareto", "session_depth_stats",
    "peak_concurrent_sessions", "revenue_gini_coefficient", "lorenz_curve_deciles",
    "customer_tier_migration", "bloom_filter_decontam", "hard_negative_mining",
    "kcenter_coreset", "heavy_hitters_exact", "length_bucketed_batches",
    "stratified_kfold_assignment", "ngram_diversity_curve", "memorization_risk_scores",
    "quality_score_quantile_norm", "hits_brand_authority", "lang_source_chi_square",
    "referential_integrity_audit", "functional_dependency_audit", "dedup_cascade_report",
    "cv_fold_leakage_audit", "phrase_match_positions", "k_anonymity_audit",
    "conformal_interval_coverage", "streaming_abandoned_views_anti", "group_aware_fold_assignment",
    "knn_label_noise_scores", "jl_projection_distortion", "roc_auc_exact",
    "calibration_bins_ece", "ndcg_retrieval_eval", "ab_conversion_lift",
    "l_diversity_audit", "rag_chunk_manifest", "multi_pattern_match",
    "column_encoding_advisor", "lof_outlier_scores", "nelson_aalen_hazard",
    "adamic_adar_link_prediction", "t_closeness_audit", "target_encoding_kfold",
    "woe_iv_binning", "incremental_rollup_merge", "simplified_silhouette",
    "textrank_keyphrases", "unigram_sampling_table", "mmr_diversified_rerank",
    "rocchio_query_expansion", "wasserstein_drift_1d", "minmax_pruning_audit",
    "streaming_error_then_purchase", "shapley_channel_attribution", "heaps_law_fit",
    "release_audit_report", "broadcast_join_advisor", "jaro_winkler_linkage_topk",
    "countmin_sketch_rollup", "poisson_bootstrap_ci", "extreme_value_tail_fit",
    "competing_risks_incidence", "binary_quant_recall", "information_gain_features",
    "haversine_nearest_station", "geo_block_pair_join", "mann_whitney_u_test",
    "deterministic_corpus_shuffle", "spearman_rank_correlation", "kendall_tau_b",
    "horvitz_thompson_total", "good_turing_vocab_coverage", "query_likelihood_dirichlet",
    "variant_props_pipeline", "xml_wire_roundtrip", "point_in_time_features",
    "future_window_labels", "max_drawdown_daily", "longest_updays_streak",
    "pinball_loss_backtest", "mann_kendall_trend", "cuped_variance_reduction",
    "brier_score_decomposition", "bh_fdr_correction", "join_order_advisor",
    "qini_curve_deciles", "diff_in_diff_estimator", "ratio_metric_delta_method",
    "sample_ratio_mismatch_check", "tost_equivalence_test", "ab_power_mde",
    "bayesian_ab_probability", "cohens_kappa_agreement", "majority_vote_labels",
    "pass_at_k_estimator", "mrr_first_relevant", "average_precision_exact",
    "isotonic_calibration_bins", "clustering_external_metrics", "fleiss_kappa_agreement",
    "dawid_skene_correction", "cumulative_gains_deciles", "eval_scorecard_report",
    "experiment_readout_report", "drift_panel_report", "capture_recapture_dup_estimate",
)


def _ordered_specs():
    specs = all_queries()
    order = [n for n in _SAMPLE_PRIORITY if n in specs]
    order += [n for n in specs if n not in _SAMPLE_PRIORITY]
    return [(n, specs[n]) for n in order]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.builder for name, spec in _ordered_specs()}


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for each SQL-expressible query (others: rows-only check)."""
    return {name: spec.oracle for name, spec in _ordered_specs() if spec.oracle is not None}
