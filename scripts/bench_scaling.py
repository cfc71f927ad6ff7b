"""Measure how headline queries scale with data size: wall time at
sf0.001 / sf0.01 / sf0.1 (100x span) and the observed scaling exponent
alpha where t ~ SF^alpha over the top decade (0.01 -> 0.1, where engine
time dominates fixed overhead). alpha <= ~1 is the linear-or-better
posture every operator here targets; materially super-linear queries are
flagged. Writes SCALING.md. Run from repo root:

    python scripts/bench_scaling.py
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hw_kafka_flink_health_spark.queries import QUERIES  # noqa: E402
from hw_kafka_flink_health_spark.session import get_spark  # noqa: E402

SFS = [0.001, 0.01, 0.1]
PROBES = [
    # scan/agg + joins
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q18_large_orders",
    # windows / sessions
    "hr_alerts_tumbling",
    "sessionize_events",
    "max_concurrent_sessions",
    # dedup / text
    "dedup_exact",
    "dedup_ngram_jaccard",
    "text_tfidf_top_terms",
    "pipeline_pretrain_corpus",
    # vectors
    "embedding_cosine_topk",
    "embedding_cosine_topk_arrow",
    # graph / iterative
    "dedup_clusters",
    "graph_bfs_distance",
    # sketches
    "approx_topk_cms",
    "quantile_sketch_log",
    # round-4 additions: retrieval, spatial, anti-entropy, CEP, analytics
    "text_bm25_topk",
    "geo_grid_radius_join",
    "merkle_block_diff",
    "cep_followed_by",
    "attribution_linear_touch",
    "regr_theil_sen_user",
    # round-4/5 additions (VERDICT r4 item 3): drift monitors, backlog
    # report, CEP quantifier, SCD2/funnel windows, lakehouse time travel,
    # real-codec multimodal decode, FP-Growth itemsets
    "orders_priority_mix_tvd",
    "orders_backlog_aging",
    "cep_error_burst",
    "scd2_user_state",
    "funnel_conversion",
    "versioned_time_travel",
    "multimodal_decode_features",
    "basket_frequent_itemsets",
    # round-5 additions: lakehouse DML (z-order 2-D pruning, compaction,
    # deletion vectors, MERGE), UDTF lateral, md5-tier fingerprints
    "versioned_zorder_prune",
    "versioned_optimize_compact",
    "versioned_delete_vectors",
    "versioned_merge_upsert",
    "text_sentences_udtf",
    "doc_winnowing_fingerprint",
    # round-6 additions (VERDICT r5 item 6): deterministic minhash LSH,
    # incremental change feed, CHECK/OCC/schema-evolution commit paths,
    # raw-RGB multimodal resize
    "dedup_minhash_lsh",
    "versioned_incremental_delta",
    "versioned_check_reject",
    "versioned_occ_retry",
    "versioned_schema_evolution",
    "multimodal_raw_rgb_resize",
    # round-6 pack b: deterministic ANN tiers, stats layer, OHLC bars,
    # cross-doc dup-span screen, nearest as-of
    "embedding_ann_srp",
    "embedding_ann_ivf_det",
    "stats_chi_square_independence",
    "stats_kaplan_meier_reorder",
    "timeseries_ohlc_vwap",
    "text_cross_doc_dup_spans",
    "join_asof_nearest",
    "dedup_ngram_containment",
    "privacy_t_closeness",
    "events_cusum_changepoint",
    "text_source_token_tvd",
    "basket_rules_lift",
    # round-6 pack c: inference tests (rank reductions + moment tests),
    # recursive CTEs, RANGE-frame windows, drawdown
    "stats_mannwhitney_u",
    "stats_ks_two_sample",
    "stats_spearman_rho",
    "stats_anova_f",
    "recursive_month_spine_revenue",
    "recursive_part_hierarchy_rollup",
    "window_range_interval_frame",
    "orders_drawdown_daily",
    "geo_knn_suppliers",
    "gini_by_segment",
    "eval_auc_roc",
    "eval_pr_curve",
    "drift_psi_events",
    "stats_cuped_adjusted_diff",
    "mlprep_target_encoding_kfold",
    "events_prefixspan_patterns",
    # round-6 pack d: resampling inference (md5-draw replicates), Holt
    # recursion (depth-bound: alpha ~ 0 expected), F-S linkage, cohort
    # conversion latency
    "stats_poisson_bootstrap_ci",
    "stats_permutation_diff_test",
    "recursive_holt_linear_trend",
    "linkage_fellegi_sunter",
    "funnel_time_to_convert",
    "attribution_shapley",
    "stats_did_estimator",
    "stats_msprt_always_valid",
    "versioned_restore",
    "eval_qini_uplift",
    "text_rake_keywords",
    "approx_jaccard_kmv",
    "cohort_ltv_triangle",
    "stats_power_sample_size",
    "orders_business_day_latency",
    "inventory_fifo_cogs",
    "eval_conformal_coverage",
    "text_readability_flesch",
    "timeseries_acf_lags",
    "timeseries_sax_words",
    "recursive_holt_winters_daily",
    "eval_isotonic_calibration",
    "experiment_srm_check",
    "stats_nelson_aalen",
    "mlprep_quantile_normalize",
    "text_pmi_collocations",
    "embedding_silhouette_points",
    "regr_multiple_ols",
    "graph_degree_assortativity",
    "timeseries_ma_decomposition",
    "join_relational_division",
    "text_hapax_ratio",
    "eval_decile_lift",
    "mlprep_temperature_mixture",
    "embedding_kmeans_step",
    "stats_beta_binomial_shrinkage",
    "stats_user_burstiness",
    "events_interval_union_length",
    "eval_cohens_kappa",
    "eval_brier_score",
    "stats_runs_test",
    "stats_friedman_test",
    "growth_accounting_weekly",
    "dedup_source_overlap_matrix",
    "orders_bullwhip_ratio",
    "embedding_power_iteration",
    "mlprep_dedup_aware_split",
    "skyline_suppliers_2d",
    "events_boxplot_tukey",
    "rfm_segment_migration",
    "events_process_conformance",
    "revenue_yoy_same_month",
    "stats_two_proportion_ztest",
    "orders_interpurchase_percentiles",
    "versioned_tag_read",
    "privacy_generalization_ladder",
    "cohort_net_revenue_retention",
    "stats_hill_tail_index",
    "events_error_mtbf",
    "orders_seasonality_index",
    # round-7 pack: bounded-round k-core peel, Brown-Forsythe variance
    # homogeneity, G2 corpus keyness, bucketed co-located join
    "graph_kcore",
    "stats_levene_test",
    "text_keyness_g2",
    "join_bucketed_colocated",
    # round-7 pack b: reciprocal best-match pairs, trend-in-proportions
    "embedding_mutual_nn",
    "stats_cochran_armitage",
    "timeseries_dtw_band",
    "graph_adamic_adar",
    "privacy_dp_noisy_counts",
    "funnel_time_bounded",
    "geo_dbscan_cells",
    "format_orc_roundtrip",
    # round-8 pack: jackknife / heaps / zipf / phrase / levenshtein /
    # markov stationary / price-volume-mix
    "stats_jackknife_ratio",
    "text_heaps_vocab_growth",
    "text_zipf_slope",
    "text_phrase_proximity",
    "dedup_levenshtein_blocked",
    "events_markov_stationary",
    "revenue_pvm_waterfall",
    "embedding_mmr_select",
    "revenue_share_of_parent",
    "eval_ndcg_at_k",
    "policy_ips_offline_eval",
    "versioned_branch_merge",
    "stats_logrank_test",
    "eval_expected_calibration_error",
    "regr_rolling_slope",
    "forecast_mase_seasonal",
    # round-9 pack
    "versioned_changefeed",
    "experiment_bh_fdr",
    "timeseries_croston",
    "graph_hits_bipartite",
    "multimodal_audio_vad",
    "geo_geohash_rollup",
    "stats_kruskal_wallis",
    "eval_mrr_map",
    "versioned_branch_rebase",
    # round-10 packs
    "fx_asof_revenue",
    "finance_sharpe_rolling",
    "ledger_trial_balance",
    "graph_label_propagation",
    "graph_jaccard_neighbors",
    "eval_krippendorff_alpha",
    "text_collation_group",
    "stats_grubbs_test",
    "mlprep_curriculum_phases",
    "eval_clipped_ngram_precision",
    "rolling_median_revenue",
    "multimodal_aspect_buckets",
    "embedding_cosine_topk_auto",
    "graph_harmonic_centrality",
    "eval_cost_optimal_threshold",
    "text_kwic_concordance",
    "spc_imr_revenue",
    "supplier_otif",
    # round-10 additions
    "embedding_semdedup_det",
    "eval_pinball_loss",
    "timeseries_bollinger_breach",
    "mlprep_global_doc_ids",
    "graph_personalized_pagerank",
    "multimodal_image_phash",
    "finance_var_historical",
    "audit_order_total_reconciliation",
    "supplier_single_source_risk",
    "inventory_abc_xyz_matrix",
    # round-11 additions
    "retrieval_mmr_rerank",
    "embedding_matryoshka_recall",
    "embedding_knn_label_eval",
    "multimodal_image_tiles",
    # round-12 additions
    "quantile_exact_disc_totalprice",
]


def main() -> None:
    spark = get_spark(
        app_name="bench_scaling",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    times: dict[str, dict[float, float]] = {q: {} for q in PROBES}
    for sf in SFS:
        sf_dir = f"/root/testdata/sf{sf}"
        # warm footers + page cache at this SF
        for t in ("lineitem", "orders", "events", "documents", "embeddings"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").count()
        for q in PROBES:
            t0 = time.perf_counter()
            QUERIES[q](spark, sf_dir).write.format("noop").mode("overwrite").save()
            times[q][sf] = time.perf_counter() - t0

    lines = [
        "# SCALING — measured wall time vs scale factor "
        "(generated by scripts/bench_scaling.py)",
        "",
        "100x data span on local[32]; alpha = log10(t(0.1)/t(0.01)) is the",
        "observed scaling exponent over the top decade (fixed per-query",
        "overhead — plan build, job launch — dominates below it). alpha <= ~1",
        "means linear-or-better in data size; the flag column marks alpha > 1.2.",
        "",
        "| query | t(0.001) s | t(0.01) s | t(0.1) s | alpha (0.01->0.1) | flag |",
        "|---|---|---|---|---|---|",
    ]
    for q in PROBES:
        t1, t2, t3 = (times[q][sf] for sf in SFS)
        alpha = math.log10(t3 / t2) if t2 > 0 else float("nan")
        flag = "SUPER-LINEAR" if alpha > 1.2 else ""
        lines.append(
            f"| {q} | {t1:.2f} | {t2:.2f} | {t3:.2f} | {alpha:.2f} | {flag} |"
        )
    lines += [
        "",
        "Cache semantics (r12): probes run in ONE session per sweep, so",
        "`dedup_clusters` / `pipeline_pretrain_corpus` measure the",
        "steady-state cost after `dedup_ngram_jaccard` populated the",
        "session-keyed pairs cache at that SF (the same warm-session",
        "semantics bench.py reports); `dedup_ngram_jaccard` itself carries",
        "the full pipeline build per SF.",
        "",
        "Beyond-sf0.1 behavior is probed separately by",
        "`scripts/probe_sf02_basket.py` (run it and record the result in",
        "PLANS.md — a one-off measurement does not belong in this",
        "regenerated table).",
    ]
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"
    )
    # preserve the synthesized-sf1 probe block (r13: a separate one-off
    # measurement maintained by scripts/probe_sf1_graph_recursive.py —
    # regen of this table must not drop the third-decade evidence)
    sf1_block = ""
    mark_begin = "<!-- SF1-PROBE:BEGIN (scripts/probe_sf1_graph_recursive.py) -->"
    mark_end = "<!-- SF1-PROBE:END -->"
    try:
        prev = open(out).read()
        if mark_begin in prev and mark_end in prev:
            sf1_block = (
                "\n"
                + mark_begin
                + prev.split(mark_begin)[1].split(mark_end)[0]
                + mark_end
                + "\n"
            )
    except OSError:
        pass
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n" + sf1_block)
    print(f"wrote SCALING.md ({len(PROBES)} probes x {len(SFS)} SFs)")
    spark.stop()


if __name__ == "__main__":
    main()
