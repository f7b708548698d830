"""Consolidated differential check for the queue operators (ALL registered
as of round 6 — this tool remains the file-level/factory-oracle sweep)
(tranches 8-31 in test_queue7.py + the round-5b queue in
test_incremental.py): run every queue op against its oracle at a given
scale factor in one session.

Usage:
    python tools/queue_parity.py [--sf /root/testdata/sf0.01]

This is the queue twin of tools/parity.py (which covers the 182
REGISTERED ops). The pytest gates run the same pairs at sf0.001; this
tool exists for the larger-SF sweeps the round logs in PLANS.md and for
pre-registration checks during the round-6/7 window rotations.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def queue_pairs():
    """(name, fn, oracle_sql_or_None) for every queue op. Oracle factories
    that need the sf_dir/spark are resolved lazily by the caller."""
    from aced_etl_pod_spark.operators import advanced_ops as adv
    from aced_etl_pod_spark.operators import corpus_ops as cor
    from aced_etl_pod_spark.operators import extra_ops as ext
    from aced_etl_pod_spark.operators import geo_ops as geo
    from aced_etl_pod_spark.operators import governance_ops as gov
    from aced_etl_pod_spark.operators import incremental_ops as inc
    from aced_etl_pod_spark.operators import llm_pipeline as llm
    from aced_etl_pod_spark.operators import sampling as smp
    from aced_etl_pod_spark.operators import similarity as sim
    from aced_etl_pod_spark.operators import streaming_ops as so
    from aced_etl_pod_spark.operators import table_format as tf
    from aced_etl_pod_spark.operators import text as txt
    from aced_etl_pod_spark.operators import udfs

    pairs = [
        # round-5b queue (test_incremental.py)
        (inc.mv_incremental_refresh, inc.MV_INCREMENTAL_REFRESH_ORACLE),
        (inc.agg_cascading_rollup, inc.AGG_CASCADING_ROLLUP_ORACLE),
        (inc.win_ewma, inc.WIN_EWMA_ORACLE),
        (inc.dedup_semantic_cluster, inc.DEDUP_SEMANTIC_CLUSTER_ORACLE),
        (tf.txnlog_zorder_cluster, tf.TXNLOG_ZORDER_ORACLE),
        (inc.win_time_weighted_avg, inc.WIN_TWAP_ORACLE),
        (inc.embedding_covariance_topk, inc.EMBEDDING_COVARIANCE_TOPK_ORACLE),
        (inc.sample_importance_weighted, inc.SAMPLE_IMPORTANCE_WEIGHTED_ORACLE),
        (tf.txnlog_equality_deletes, tf.TXNLOG_EQUALITY_DELETES_ORACLE),
        (tf.txnlog_bloom_index_lookup, tf.TXNLOG_BLOOM_LOOKUP_ORACLE),
        (inc.mv_incremental_join_view, inc.MV_JOIN_VIEW_ORACLE),
        (inc.agg_histogram_quantile_merge, inc.AGG_HISTOGRAM_QUANTILE_ORACLE),
        (tf.txnlog_merge_upsert, tf.TXNLOG_MERGE_UPSERT_ORACLE),
        (adv.graph_label_propagation, adv.GRAPH_LABEL_PROPAGATION_ORACLE),
        (txt.dedup_ngram_containment, txt.DEDUP_NGRAM_CONTAINMENT_ORACLE),
        (inc.win_anomaly_zscore, inc.WIN_ANOMALY_ZSCORE_ORACLE),
        (ext.join_scd2_temporal, ext.JOIN_SCD2_TEMPORAL_ORACLE),
        (cor.sink_csv_roundtrip, cor.SINK_CSV_ROUNDTRIP_ORACLE),
        (cor.join_asof_nearest, cor.JOIN_ASOF_NEAREST_ORACLE),
        (so.stream_sliding_topk, so.STREAM_SLIDING_TOPK_ORACLE),
        (inc.embedding_pca_whiten, None),
        (tf.stream_txnlog_merge_upsert, None),
        # tranches 8-31 (test_queue7.py)
        (geo.join_geo_gridded_radius, geo.JOIN_GEO_GRIDDED_RADIUS_ORACLE),
        (geo.agg_geo_grid_density, geo.AGG_GEO_GRID_DENSITY_ORACLE),
        (geo.join_geo_point_in_polygon, geo.JOIN_GEO_POINT_IN_POLYGON_ORACLE),
        (geo.join_geo_nearest_broadcast, geo.JOIN_GEO_NEAREST_BROADCAST_ORACLE),
        (gov.dq_k_anonymity, gov.DQ_K_ANONYMITY_ORACLE),
        (gov.fn_pseudonymize_consistent, gov.FN_PSEUDONYMIZE_CONSISTENT_ORACLE),
        (gov.fn_ip_cidr_classify, gov.FN_IP_CIDR_CLASSIFY_ORACLE),
        (gov.dq_freshness_slo, gov.DQ_FRESHNESS_SLO_ORACLE),
        (gov.dq_schema_contract, gov.DQ_SCHEMA_CONTRACT_ORACLE),
        (gov.dq_k_anonymity_generalize, gov.DQ_K_ANONYMITY_GENERALIZE_ORACLE),
        (adv.graph_bfs_khop, adv.GRAPH_BFS_KHOP_ORACLE),
        (adv.hierarchy_unroll_paths, adv.HIERARCHY_UNROLL_PATHS_ORACLE),
        (adv.graph_shortest_path_weighted, adv.GRAPH_SHORTEST_PATH_WEIGHTED_ORACLE),
        (ext.win_event_sequence_regex, ext.WIN_EVENT_SEQUENCE_REGEX_ORACLE),
        (ext.ts_interpolate_linear, ext.TS_INTERPOLATE_LINEAR_ORACLE),
        (ext.join_interval_overlap, ext.JOIN_INTERVAL_OVERLAP_ORACLE),
        (ext.agg_weighted_percentile, ext.AGG_WEIGHTED_PERCENTILE_ORACLE),
        (ext.win_drawdown_runmax, ext.WIN_DRAWDOWN_RUNMAX_ORACLE),
        (ext.stat_chi_square_independence, ext.STAT_CHI_SQUARE_ORACLE),
        (ext.agg_frequent_pairs_market_basket, ext.AGG_FREQUENT_PAIRS_ORACLE),
        (ext.win_streak_longest_current, ext.WIN_STREAK_LONGEST_CURRENT_ORACLE),
        (ext.agg_attribution_last_touch, ext.AGG_ATTRIBUTION_LAST_TOUCH_ORACLE),
        (ext.ts_seasonal_decompose, ext.TS_SEASONAL_DECOMPOSE_ORACLE),
        (ext.win_outlier_mad, ext.WIN_OUTLIER_MAD_ORACLE),
        (ext.win_percent_rank_cume, ext.WIN_PERCENT_RANK_CUME_ORACLE),
        (ext.scan_date_dim_generate, ext.SCAN_DATE_DIM_GENERATE_ORACLE),
        (ext.fn_surrogate_key_md5, ext.FN_SURROGATE_KEY_MD5_ORACLE),
        (ext.win_rolling_regression_slope, ext.WIN_ROLLING_REGRESSION_SLOPE_ORACLE),
        (ext.agg_conversion_lag_percentiles, ext.AGG_CONVERSION_LAG_ORACLE),
        (ext.win_period_over_period, ext.WIN_PERIOD_OVER_PERIOD_ORACLE),
        (ext.agg_gini_coefficient, ext.AGG_GINI_COEFFICIENT_ORACLE),
        (ext.agg_entropy_categorical, ext.AGG_ENTROPY_CATEGORICAL_ORACLE),
        (ext.agg_markov_transition_matrix, ext.AGG_MARKOV_TRANSITION_ORACLE),
        (ext.fn_ab_test_proportions, ext.FN_AB_TEST_PROPORTIONS_ORACLE),
        (ext.agg_benford_digit_test, ext.AGG_BENFORD_DIGIT_TEST_ORACLE),
        (ext.win_cusum_changepoint, ext.WIN_CUSUM_CHANGEPOINT_ORACLE),
        (ext.win_survival_kaplan_meier, ext.WIN_SURVIVAL_KM_ORACLE),
        (txt.text_readability_score, txt.TEXT_READABILITY_SCORE_ORACLE),
        (txt.text_search_boolean, txt.TEXT_SEARCH_BOOLEAN_ORACLE),
        (txt.dedup_exact_substring_spans, txt.DEDUP_EXACT_SUBSTRING_SPANS_ORACLE),
        (txt.text_vocab_growth_heaps, txt.TEXT_VOCAB_GROWTH_HEAPS_ORACLE),
        (txt.text_zipf_rank_frequency, txt.TEXT_ZIPF_RANK_FREQUENCY_ORACLE),
        (txt.dedup_incremental_minhash, txt.DEDUP_INCREMENTAL_MINHASH_ORACLE),
        (cor.feature_one_hot_encode, cor.FEATURE_ONE_HOT_ORACLE),
        (cor.feature_standard_scale, cor.FEATURE_STANDARD_SCALE_ORACLE),
        (cor.agg_hll_portable, cor.AGG_HLL_PORTABLE_ORACLE),
        (cor.agg_hll_sliding_distinct, cor.AGG_HLL_SLIDING_DISTINCT_ORACLE),
        (cor.agg_kmv_set_intersection, cor.AGG_KMV_SET_INTERSECTION_ORACLE),
        (cor.scan_fixed_width, "FACTORY:scan_fixed_width_oracle"),
        (cor.scan_multiline_json, "FACTORY:scan_multiline_json_oracle"),
        (cor.scan_file_provenance, "FACTORY_SPARK:scan_file_provenance_oracle"),
        (tf.txnlog_overwrite_partition, tf.TXNLOG_OVERWRITE_PARTITION_ORACLE),
        (tf.txnlog_branch_merge, tf.TXNLOG_BRANCH_MERGE_ORACLE),
        (tf.plan_result_cache, tf.PLAN_RESULT_CACHE_ORACLE),
        (tf.txnlog_cdc_replay_reconstruct, tf.TXNLOG_CDC_REPLAY_ORACLE),
        (tf.txnlog_check_constraints, tf.TXNLOG_CHECK_CONSTRAINTS_ORACLE),
        (smp.sample_reservoir_per_group, smp.SAMPLE_RESERVOIR_PER_GROUP_ORACLE),
        (smp.agg_sample_estimate_ci, smp.AGG_SAMPLE_ESTIMATE_CI_ORACLE),
        (udfs.udtf_table_argument, udfs.UDTF_TABLE_ARGUMENT_ORACLE),
        (so.stream_anomaly_window_zscore, so.STREAM_ANOMALY_WINDOW_ZSCORE_ORACLE),
        (so.stream_checked_ingest_dlq, so.STREAM_CHECKED_INGEST_DLQ_ORACLE),
        (llm.seq_pack_bins_ffd, llm.SEQ_PACK_BINS_FFD_ORACLE),
        (llm.text_bpe_train_merges, llm.TEXT_BPE_TRAIN_MERGES_ORACLE),
        (llm.tokenizer_apply_bpe, llm.TOKENIZER_APPLY_BPE_ORACLE),
        (llm.pipeline_rag_context_pack, llm.PIPELINE_RAG_CONTEXT_PACK_ORACLE),
        (sim.sim_mmr_diversified_topk, sim.SIM_MMR_DIVERSIFIED_TOPK_ORACLE),
        (sim.sim_ann_lsh_multiprobe_topk, sim.SIM_ANN_LSH_MULTIPROBE_TOPK_ORACLE),
        (sim.multimodal_audio_features, sim.MULTIMODAL_AUDIO_FEATURES_ORACLE),
        # tranche 36
        (llm.text_ngram_lm_score, llm.TEXT_NGRAM_LM_SCORE_ORACLE),
        (ext.stat_ks_two_sample, ext.STAT_KS_TWO_SAMPLE_ORACLE),
        # tranche 37
        (ext.ts_autocorrelation, ext.TS_AUTOCORRELATION_ORACLE),
        (ext.stat_mann_whitney_u, ext.STAT_MANN_WHITNEY_U_ORACLE),
        # tranche 38
        (adv.graph_jaccard_link_prediction,
         adv.GRAPH_JACCARD_LINK_PREDICTION_ORACLE),
        (gov.dp_noisy_count_laplace, gov.DP_NOISY_COUNT_LAPLACE_ORACLE),
        # tranche 39
        (ext.join_fuzzy_phonetic_blocked,
         ext.JOIN_FUZZY_PHONETIC_BLOCKED_ORACLE),
        (ext.agg_event_path_topk, ext.AGG_EVENT_PATH_TOPK_ORACLE),
        # tranche 40
        (ext.stat_t_test_welch, ext.STAT_T_TEST_WELCH_ORACLE),
        (ext.ts_forecast_snaive_backtest, ext.TS_FORECAST_SNAIVE_ORACLE),
        # tranche 41
        (ext.ts_holt_winters, ext.TS_HOLT_WINTERS_ORACLE),
        (ext.ts_seasonal_residual_anomaly,
         ext.TS_SEASONAL_RESIDUAL_ANOMALY_ORACLE),
        # tranche 42
        (adv.sql_recursive_cte_native, adv.SQL_RECURSIVE_CTE_NATIVE_ORACLE),
        (adv.scan_json_variant, adv.SCAN_JSON_VARIANT_ORACLE),
        # tranche 43
        (ext.stat_bootstrap_poisson_ci, ext.STAT_BOOTSTRAP_POISSON_CI_ORACLE),
        (ext.ts_cross_correlation, ext.TS_CROSS_CORRELATION_ORACLE),
        # tranche 44
        (udfs.udf_scalar_arrow, udfs.UDF_SCALAR_ARROW_ORACLE),
        (udfs.scan_python_datasource, udfs.SCAN_PYTHON_DATASOURCE_ORACLE),
        # tranche 45
        (so.stream_python_datasource, so.STREAM_PYTHON_DATASOURCE_ORACLE),
        (llm.seq_sft_chat_render, llm.SEQ_SFT_CHAT_RENDER_ORACLE),
        # tranche 46
        (ext.join_point_in_time_features,
         ext.JOIN_POINT_IN_TIME_FEATURES_ORACLE),
        (adv.graph_cc_large_star_small_star, adv.GRAPH_CC_STAR_ORACLE),
        # tranche 47
        (txt.text_line_dedup_c4, txt.TEXT_LINE_DEDUP_C4_ORACLE),
        (txt.fn_unicode_normalize_nfc, txt.FN_UNICODE_NFC_ORACLE),
        # tranche 48
        (cor.pipeline_mixture_rebalance,
         cor.PIPELINE_MIXTURE_REBALANCE_ORACLE),
        (cor.agg_moments_mergeable_chan,
         cor.AGG_MOMENTS_MERGEABLE_CHAN_ORACLE),
        # tranche 49
        (so.stream_checkpoint_restart, so.STREAM_CHECKPOINT_RESTART_ORACLE),
        # tranche 50
        (llm.seq_dpo_preference_pairs, llm.SEQ_DPO_PREFERENCE_PAIRS_ORACLE),
        # tranche 51
        (txt.dedup_ppjoin_prefix_filter,
         txt.DEDUP_PPJOIN_PREFIX_FILTER_ORACLE),
        (sim.dedup_image_phash, None),
        # tranche 52
        (cor.sql_parameterized_query, cor.SQL_PARAMETERIZED_QUERY_ORACLE),
        (cor.pipeline_pretrain_corpus_e2e, cor.PIPELINE_PRETRAIN_E2E_ORACLE),
        # tranche 53
        (ext.agg_ohlc_bars, ext.AGG_OHLC_BARS_ORACLE),
        (ext.dq_cross_table_reconciliation,
         ext.DQ_CROSS_TABLE_RECONCILIATION_ORACLE),
        # tranche 54
        (adv.graph_modularity_score, adv.GRAPH_MODULARITY_SCORE_ORACLE),
        (ext.agg_rfm_segmentation, ext.AGG_RFM_SEGMENTATION_ORACLE),
        # tranche 55
        (ext.agg_abc_pareto_analysis, ext.AGG_ABC_PARETO_ORACLE),
        (ext.stat_power_sample_size, ext.STAT_POWER_SAMPLE_SIZE_ORACLE),
        # tranche 56
        (cor.feature_target_encoding_loo,
         cor.FEATURE_TARGET_ENCODING_LOO_ORACLE),
        (cor.feature_woe_information_value, cor.FEATURE_WOE_IV_ORACLE),
        # tranche 57
        (txt.dedup_winnowing_fingerprints,
         txt.DEDUP_WINNOWING_FINGERPRINTS_ORACLE),
        (adv.graph_assortativity, adv.GRAPH_ASSORTATIVITY_ORACLE),
        # tranche 58
        (ext.stat_fdr_benjamini_hochberg, ext.STAT_FDR_BH_ORACLE),
        (ext.win_vwap_bars, ext.WIN_VWAP_BARS_ORACLE),
        # tranche 59
        (ext.agg_causal_diff_in_diff, ext.AGG_CAUSAL_DIFF_IN_DIFF_ORACLE),
        (ext.agg_cuped_variance_reduction, ext.AGG_CUPED_ORACLE),
        # tranche 60
        (adv.graph_kcore_membership, adv.GRAPH_KCORE_MEMBERSHIP_ORACLE),
        (ext.ts_kalman_filter_1d, ext.TS_KALMAN_FILTER_1D_ORACLE),
    ]
    return pairs


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from aced_etl_pod_spark.operators import corpus_ops as cor
    from aced_etl_pod_spark.oracle import compare, duck_con
    from aced_etl_pod_spark.session import get_spark

    spark = get_spark("queue_parity", shuffle_partitions=32)
    con = duck_con(args.sf)
    ok = rows_only = failed = 0
    for fn, oracle in queue_pairs():
        t0 = time.time()
        try:
            sdf = fn(spark, args.sf).toPandas()
            if oracle is None:
                rows_only += 1
                print(f"rows {fn.__name__}: {len(sdf)} rows "
                      f"[{time.time() - t0:.1f}s]")
                continue
            if isinstance(oracle, str) and oracle.startswith("FACTORY_SPARK:"):
                oracle = getattr(cor, oracle.split(":", 1)[1])(spark, args.sf)
            elif isinstance(oracle, str) and oracle.startswith("FACTORY:"):
                oracle = getattr(cor, oracle.split(":", 1)[1])(args.sf)
            errs = compare(sdf, con.execute(oracle).fetchdf())
            if errs:
                failed += 1
                print(f"FAIL {fn.__name__}: {errs[:3]}")
            else:
                ok += 1
                print(f"ok   {fn.__name__}: {len(sdf)} rows "
                      f"[{time.time() - t0:.1f}s]")
        except Exception as exc:  # noqa: BLE001
            failed += 1
            print(f"ERR  {fn.__name__}: {str(exc)[:160]}")
    total = ok + rows_only + failed
    print(f"\n{ok} ok, {rows_only} rows-only, {failed} failed / {total} queue ops")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
