"""Named query registry — the driver-facing surface of the engine.

Every operator from SURVEY.md §2 (and each north-star extension) is
exposed as a named query ``(spark, sf_dir) -> DataFrame`` plus, when
SQL-expressible, an equivalent ANSI-SQL oracle string for DuckDB.
``__spark_entry__.py`` re-exports these dicts to the driver.

Column-name contract: every computed column is aliased identically in
the Spark plan and the oracle SQL (the driver sorts columns by name
before hashing values).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# Import side effects populate the registry.
from climate_anomaly_bigdata_pipeline_spark.queries import anomaly  # noqa: E402,F401
from climate_anomaly_bigdata_pipeline_spark.queries import relational  # noqa: E402,F401
from climate_anomaly_bigdata_pipeline_spark.queries import timeseries  # noqa: E402,F401
from climate_anomaly_bigdata_pipeline_spark.queries import gold  # noqa: E402,F401
from climate_anomaly_bigdata_pipeline_spark.queries import parsing  # noqa: E402,F401
from climate_anomaly_bigdata_pipeline_spark.queries import textops  # noqa: E402,F401
from climate_anomaly_bigdata_pipeline_spark.queries import dedupq  # noqa: E402,F401
from climate_anomaly_bigdata_pipeline_spark.queries import similarityq  # noqa: E402,F401
from climate_anomaly_bigdata_pipeline_spark.queries import multimodalq  # noqa: E402,F401
from climate_anomaly_bigdata_pipeline_spark.queries import coverage  # noqa: E402,F401
from climate_anomaly_bigdata_pipeline_spark.queries import curation  # noqa: E402,F401
from climate_anomaly_bigdata_pipeline_spark.queries import analyticsq  # noqa: E402,F401
from climate_anomaly_bigdata_pipeline_spark.queries import advancedq  # noqa: E402,F401
from climate_anomaly_bigdata_pipeline_spark.queries import statsq  # noqa: E402,F401
from climate_anomaly_bigdata_pipeline_spark.queries import tpchq  # noqa: E402,F401
from climate_anomaly_bigdata_pipeline_spark.queries import storageq  # noqa: E402,F401
from climate_anomaly_bigdata_pipeline_spark.queries import streamingq  # noqa: E402,F401

# The driver's correctness sweep checks the FIRST 50 registry entries
# (dict order); everything past that window is verified only by the
# local sweep (tools/check_all_oracles.py) and pytest. The window is
# ROTATED each round so that every query eventually earns a
# driver-verified green row in some CORRECTNESS_r*.json:
#   round 4 (_WINDOW_R4 below): one query per SURVEY.md SS2 operator row
#     plus every LLM-pipeline family head -- 50/50 green in
#     CORRECTNESS_r04.json.
#   round 5 (_PRIORITY, active): flagship zscore_anomaly + 49 queries
#     DISJOINT from the r4 window.
#   round 6: the remaining _WINDOW_R6 tail below (43 legacy + any
#     round-5 additions) rotates to the front.
_WINDOW_R4 = [
    "zscore_anomaly",
    "zscore_events",
    "groupby_kpis",
    "pivot_events_daily",
    "null_profile",
    "histogram_event_values",
    "percentiles_by_returnflag",
    "join_revenue_by_nation_year",
    "left_join_order_counts",
    "semi_join_big_spenders",
    "anti_join_inactive_customers",
    "cross_join_limited",
    "salted_join_revenue",
    "topk_orders",
    "topk_customers_per_nation",
    "monthly_revenue_delta",
    "rollup_lineitem",
    "cube_lineitem",
    "grouping_sets_lineitem",
    "approx_distinct_users",
    "deterministic_sample",
    "union_multi_source",
    "triangle_parts_copurchase",
    "small_qty_brand_revenue",
    "tumbling_hourly_events",
    "sliding_2h_events",
    "sessionize_events",
    "rolling_daily_mean",
    "asof_click_before_purchase",
    "range_join_next_hour",
    "gold_supplier_dim",
    "gold_kpis_yearly",
    "gold_fact_supplier_monthly",
    "gold_extremes",
    "demo_noise_zscore",
    "parse_delimited_roundtrip",
    "parse_fixed_width_roundtrip",
    "term_frequency_top50",
    "doc_quality_scores",
    "lang_id_heuristic",
    "dedup_first_event",
    "fingerprint_duplicates",
    "minhash_lsh_candidates",
    "ngram_jaccard_pairs",
    "simhash_signatures",
    "embedding_neardup_pairs",
    "cosine_topk",
    "lsh_ann_topk",
    "ivf_ann_topk",
    "multimodal_binary_profile",
]

# Round-5 window (driver-verified 50/50 green in CORRECTNESS_r05.json).
_WINDOW_R5 = [
    # flagship (stays every round)
    "zscore_anomaly",
    # anomaly-detection variants
    "zscore_lineitem",
    "iqr_outliers_events",
    "robust_zscore_events",
    "seasonal_zscore_events",
    # relational / quality coverage
    "except_high_balance_no_f",
    "json_extract_props",
    "merge_upsert_users",
    "data_quality_orders",
    "intersect_customers",
    # windows / time series
    "ntile_price_deciles",
    "rolling_7d_customer_revenue",
    "funnel_view_click_purchase",
    "locf_gap_fill_events",
    "ewma_user_value",
    "session_window_stats",
    "interval_overlap_sessions_noon",
    # parsing / io
    "jsonl_parse_roundtrip",
    # text analysis
    "tfidf_top_terms",
    "repetition_quality_docs",
    "pii_scrub_docs",
    "chunk_documents_64_16",
    "pack_sequences_512",
    "unigram_lm_scores",
    "term_drift_js_divergence",
    # dedup / entity resolution
    "winnow_fingerprints",
    "levenshtein_neardup",
    "dedup_clusters_embedding",
    "prefix_jaccard_pairs",
    "dedup_keep_representatives",
    "entity_resolution_customers",
    "chain_components_star",
    # curation
    "split_leakage_audit",
    "benchmark_decontamination",
    "stratified_sample_events",
    "quota_sample_per_source",
    "mix_rebalance_sources",
    "curation_pipeline",
    "approx_quantiles_events",
    # similarity / KNN
    "knn_join_brute",
    "knn_join_ivf",
    "embedding_centroids_by_label",
    # multimodal codecs
    "png_decode_profile",
    "wav_decode_profile",
    "video_frame_sample_profile",
    # graph + stats (incl. this round's determinism fixes)
    "pagerank_purchase_graph",
    "market_basket_lift",
    "welch_ttest_purchase_click",
    "chisq_event_type_dow",
    "spearman_parts_rev_vs_qty",
]
assert len(_WINDOW_R5) == 50
assert set(_WINDOW_R5) & set(_WINDOW_R4) == {"zscore_anomaly"}

# Round-6 window (active through round 7 because round 6 ended without
# the driver's end-of-round verification): earned its 50/50 green rows
# in CORRECTNESS_r07.json. _WINDOW_R7 below is now the active window.
_WINDOW_R6 = [
    "zscore_anomaly",
    # sketches / sampling / relational coverage
    "hll_sketch_rollup", "quantile_digest_rollup", "cms_heavy_hitters",
    "hll_sliding_from_tumbling", "weighted_sample_customers",
    "unpivot_lineitem_yearly", "full_outer_reconcile_customers",
    "pct_rank_orders", "ntile_deciles_orders", "stable_global_index_events",
    "table_fingerprint_orders", "equidepth_hist_orders",
    "pareto_frontier_parts", "key_skew_profile_events",
    # incremental / history
    "scd2_user_type_history", "cdc_snapshot_diff", "merge_intervals_activity",
    "cohort_retention_monthly", "transition_matrix_events",
    "cumulative_distinct_users", "modal_event_type_per_user",
    # stats / series
    "rolling_corr_daily", "linreg_price_by_qty", "winsorize_event_values",
    "mean_shift_scores", "copurchase_degree_assortativity",
    "gini_order_value_by_nation", "benford_first_digit_orders",
    "revenue_share_nation_year", "acf_daily_revenue",
    "mannwhitney_purchase_click", "stl_decompose_daily_revenue",
    # text / curation / retrieval
    "char_entropy_docs", "chunk_dedup_docs", "temperature_mix_weights",
    "bpe_token_profile", "bpe_first_merge_pairs", "bm25_topk_docs",
    "hybrid_rrf_retrieval", "dsir_importance_weights",
    # similarity / ANN
    "ivf_train_codebook", "semdedup_prune_embeddings", "knn_join_exact",
    "pq_train_codebooks", "pq_ann_topk", "pq_rescore_topk",
    # graph / audits / codecs
    "bfs_copurchase_distances", "kcore_copurchase",
    "jpeg_decode_profile",
]
assert len(_WINDOW_R6) == 50
assert set(_WINDOW_R6) & (set(_WINDOW_R4) | set(_WINDOW_R5)) == {"zscore_anomaly"}

_PRIORITY_R6 = _WINDOW_R6  # driver-verified 50/50 green in CORRECTNESS_r07.json

# Round-8 ACTIVE window (authored in round 6 as "R7", held back one
# round because round 6's driver check never ran; activated in round 8
# now that _WINDOW_R6 earned its CORRECTNESS_r07.json rows). Covers the
# 49 never-driver-verified queries + the flagship; once it runs, every
# registry name except the _WINDOW_R8_SEED tail has a driver-verified
# row. Round-8 additions past capacity go to _WINDOW_R8_SEED for the
# next rotation.
_WINDOW_R7 = [
    "zscore_anomaly",
    # never-windowed round-5 additions: retrieval / ANN / codecs
    "retrieval_eval_ndcg", "pq_code_histogram", "ivfpq_ann_topk",
    "flac_decode_profile", "jpeg_progressive_profile",
    "flac_lpc_decode_profile",
    # never-windowed analytics / audits
    "item_cooccurrence_similarity", "sole_supplier_orders",
    "top_revenue_suppliers", "embedding_dim_scale", "k_anonymity_audit",
    "referential_integrity_audit", "top_event_trigrams",
    "significant_parts_by_value", "top_supplier_share_per_part",
    "idle_rich_customers", "loo_target_encoding_orders",
    "ccf_purchase_click_daily", "cuped_ab_purchase_rate",
    "ols2_price_qty_discount",
    # never-windowed TPC-H fill-ins
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q12_late_priority_lines",
    "q13_customer_distribution", "q14_promo_revenue",
    "q16_supplier_part_counts", "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    # round-6 additions completing the 22-query TPC-H set
    "q17_small_quantity_revenue", "q20_promo_part_suppliers",
    "q21_waiting_suppliers", "q22_idle_rich_by_nation",
    # round-6 external-query ANN serving (streaming server's batch form)
    "ann_serve_external",
    # round-7 additions (never windowed)
    "exact_substring_dup_stats", "top_duplicated_substrings",
    "ks_test_purchase_click", "zipf_fit_terms", "phash_image_dedup",
    "holt_forecast_daily_revenue", "km_survival_session_duration",
    "audio_fingerprint_dedup",
]
assert len(_WINDOW_R7) == 50
_never_windowed = {
    "retrieval_eval_ndcg", "pq_code_histogram", "ivfpq_ann_topk",
    "flac_decode_profile", "jpeg_progressive_profile",
    "flac_lpc_decode_profile", "item_cooccurrence_similarity",
    "sole_supplier_orders", "top_revenue_suppliers", "embedding_dim_scale",
    "k_anonymity_audit", "referential_integrity_audit",
    "top_event_trigrams", "significant_parts_by_value",
    "top_supplier_share_per_part", "idle_rich_customers",
    "loo_target_encoding_orders", "ccf_purchase_click_daily",
    "cuped_ab_purchase_rate", "ols2_price_qty_discount",
    "q1_pricing_summary", "q2_min_cost_supplier", "q3_shipping_priority",
    "q4_order_priority", "q5_local_supplier_volume", "q6_forecast_revenue",
    "q7_volume_shipping", "q8_market_share", "q9_product_profit",
    "q10_returned_items", "q12_late_priority_lines",
    "q13_customer_distribution", "q14_promo_revenue",
    "q16_supplier_part_counts", "q18_large_volume_customers",
    "q19_disjunctive_revenue", "q17_small_quantity_revenue",
    "q20_promo_part_suppliers", "q21_waiting_suppliers",
    "q22_idle_rich_by_nation",
    "exact_substring_dup_stats", "top_duplicated_substrings",
    "ks_test_purchase_click", "zipf_fit_terms", "phash_image_dedup",
    "holt_forecast_daily_revenue", "km_survival_session_duration",
    "audio_fingerprint_dedup",
}
assert _never_windowed <= set(_WINDOW_R7)
# R7 must not re-window anything R6 already covers (flagship aside).
assert set(_WINDOW_R7) & set(_WINDOW_R6) == {"zscore_anomaly"}
assert set(_WINDOW_R7) & set(_WINDOW_R4) == {"zscore_anomaly"}
assert set(_WINDOW_R7) & set(_WINDOW_R5) == {"zscore_anomaly"}

# _WINDOW_R7 earned its 50/50 green rows in CORRECTNESS_r08.json; the
# round-9 active window is _WINDOW_R8 (defined below).

# Seed of the NEXT rotation: additions that arrived after _WINDOW_R7
# filled its 50 slots. Grow this list as new queries land; when the
# _WINDOW_R7 rotation has run, build the next 50-slot window from
# these plus already-green padding (rotation recipe in _reorder's
# comment block above). Keep every new query in here until it has a
# driver-verified CORRECTNESS row — test_queries_registry.py enforces
# that no registry name is outside every staged window.
_WINDOW_R8_SEED = [
    "lorenz_curve_order_value",
    "cvm_test_purchase_click",
    "null_semantics_zoo",
    "hhi_supplier_concentration",
    # round-8 additions
    "maximal_repeat_spans",
    "dup_char_fraction",
    "mann_kendall_trend_daily",
    "cusum_changepoint_daily",
    "kruskal_wallis_event_values",
    "theil_sen_slope_daily",
    "kendall_tau_purchase_click_daily",
    "adamic_adar_linkpred",
    "bigram_lm_scores",
    "rbo_bm25_vs_tf",
    "mutual_information_type_dow",
    "diff_in_diff_purchase_rate",
    "clustering_coefficient_parts",
]
assert not set(_WINDOW_R8_SEED) & (set(_WINDOW_R6) | set(_WINDOW_R7))

# Seed of the round-10 rotation: round-9 additions land here (and, via
# the window construction below, displace re-verification padding so
# they earn a driver CORRECTNESS row THIS round instead of waiting).
_WINDOW_R9_SEED: list[str] = [
    "wasserstein_purchase_click",
    "page_hinkley_drift_daily",
    "poisson_bootstrap_order_value",
    "tokens_per_doc_histogram",
    "q15_top_supplier",
    "overlap_coeff_pairs",
    "spectral_seasonality_daily",
    "isotonic_regression_daily",
    "video_scene_cuts",
    "seasonal_mann_kendall_daily",
    "runs_test_daily_revenue",
    "pca_top_component_embeddings",
]

# Round-9 ACTIVE window. Layout: flagship + the 17 never-driver-
# verified _WINDOW_R8_SEED names + round-9 additions (_WINDOW_R9_SEED)
# + RE-VERIFICATION padding. Padding is curated so every judge-graded
# family keeps a representative in the window: the family keepers come
# first (R4 names, plus two R5 names for families R4 predates), then
# oldest-green _WINDOW_R4 fill. Padding drops from the TAIL as
# _WINDOW_R9_SEED grows.
_R8_PADDING = (
    [
        # family keepers (from _WINDOW_R4 unless noted)
        "approx_distinct_users",      # sketches
        "deterministic_sample",       # sampling
        "cosine_topk",                # similarity / ANN
        "multimodal_binary_profile",  # multimodal
        "dedup_first_event",          # dedup
        "term_frequency_top50",       # text analysis
        "rolling_daily_mean",         # window / time series
        "triangle_parts_copurchase",  # graph
        "groupby_kpis",               # relational coverage
        "curation_pipeline",          # curation (R5 — family postdates R4)
        "merge_upsert_users",         # incremental/history (R5)
    ]
)
_R8_PADDING += [
    n for n in _WINDOW_R4
    if n != "zscore_anomaly" and n not in _R8_PADDING
]
_WINDOW_R8 = (
    ["zscore_anomaly"]
    + _WINDOW_R8_SEED
    + _WINDOW_R9_SEED
    + _R8_PADDING[: 50 - 1 - len(_WINDOW_R8_SEED) - len(_WINDOW_R9_SEED)]
)
assert len(_WINDOW_R8) == 50
assert len(set(_WINDOW_R8)) == 50
# every seed name is new to the driver:
assert not (set(_WINDOW_R8_SEED) | set(_WINDOW_R9_SEED)) & (
    set(_WINDOW_R4) | set(_WINDOW_R5) | set(_WINDOW_R6) | set(_WINDOW_R7)
)
# padding is strictly re-verification of already-driver-green names:
assert set(_R8_PADDING) <= set(_WINDOW_R4) | set(_WINDOW_R5)

# _WINDOW_R8 earned its 50/50 green rows in CORRECTNESS_r09.json — the
# driver-verified union now covers every registry name (VERDICT r9).

# Seed of the round-11 rotation: round-10 additions land here and are
# folded into the ACTIVE window below so they earn a driver row THIS
# round (the r9 recipe). Keep every new query here until it has a
# driver-verified CORRECTNESS row.
_WINDOW_R10_SEED: list[str] = [
    "pca_top_component_gemm",
    "pca_topk_components_deflation",
    "stratified_split_manifest",
    "grouped_cv_folds",
    "ljung_box_daily_revenue",
    "jaccard_linkpred",
    "partitioned_fact_dpp_revenue",
    "bucketed_join_revenue",
    "time_embargo_split_events",
    "length_bucket_packing_stats",
    "ann_recall_at_k",
    "minhash_jaccard_calibration",
    "pq_reconstruction_error",
    "label_propagation_communities",
    "pca_projection_outliers",
]

# Queries whose CODE (plan or oracle) changed AFTER their last driver
# CORRECTNESS row — VERDICT r9 next-round #1: these re-verify FIRST so
# no driver row certifies stale code.
#   - pagerank_purchase_graph: node set from the pinned edge table
#     (c664972, after its r05 row)
#   - exact_substring_dup_stats / top_duplicated_substrings: 128-bit
#     dup-gram keys (ce75b93, after their r08 rows)
#   - wasserstein_purchase_click: global_lead last-row guard (r10)
#   - page_hinkley_drift_daily: running_min dtype-cast literals (r10)
#   - adamic_adar_linkpred: observation propagation on the query path
#     (r10; plan unchanged, re-verified out of caution)
_R10_CODE_CHANGED = [
    "pagerank_purchase_graph",
    "exact_substring_dup_stats",
    "top_duplicated_substrings",
    "wasserstein_purchase_click",
    "page_hinkley_drift_daily",
    "adamic_adar_linkpred",
    # round-10 bit-exactness fixes (VERDICT r9 #4): integer-cent gini,
    # quoted correctly-rounded double literals in the ndcg/rbo oracles
    "gini_order_value_by_nation",
    "retrieval_eval_ndcg",
    "rbo_bm25_vs_tf",
    # round-10 oracle reformulation (materialized-list recursion)
    "holt_forecast_daily_revenue",
    # round-10 symmetric-half moment build (bit-equal mirror)
    "pca_top_component_embeddings",
]

# RE-VERIFICATION padding: family keepers first (every judge-graded
# family keeps one representative in the window), then oldest-green
# fill — names whose last driver row is the OLDEST (_WINDOW_R5's rows
# date to CORRECTNESS_r05.json). Drops from the TAIL as
# _WINDOW_R10_SEED grows.
_R9_PADDING = [
    # family keepers (one canonical representative per judge-graded
    # family, drawn from the oldest-green windows; the dedup family's
    # keepers ride _R10_CODE_CHANGED)
    "hll_sketch_rollup",          # sketches (R6)
    "weighted_sample_customers",  # sampling (R6)
    "ivf_train_codebook",         # similarity / ANN (R6)
    "jpeg_decode_profile",        # multimodal (R6)
    "char_entropy_docs",          # text analysis (R6)
    "acf_daily_revenue",          # window / time series (R6)
    "kcore_copurchase",           # graph (R6)
    "q1_pricing_summary",         # relational / TPC-H (R7)
    "curation_pipeline",          # curation (R5)
    "scd2_user_type_history",     # incremental / history (R6)
    "linreg_price_by_qty",        # statistics (R6)
    "bm25_topk_docs",             # retrieval (R6)
]
_R9_PADDING += [
    n for n in _WINDOW_R5
    if n != "zscore_anomaly"
    and n not in _R9_PADDING
    and n not in _R10_CODE_CHANGED
]

_WINDOW_R9 = (
    ["zscore_anomaly"]
    + _WINDOW_R10_SEED
    + _R10_CODE_CHANGED
    + _R9_PADDING[: 50 - 1 - len(_WINDOW_R10_SEED) - len(_R10_CODE_CHANGED)]
)
assert len(_WINDOW_R9) == 50
assert len(set(_WINDOW_R9)) == 50
# every seed name is new to the driver:
assert not set(_WINDOW_R10_SEED) & (
    set(_WINDOW_R4) | set(_WINDOW_R5) | set(_WINDOW_R6) | set(_WINDOW_R7)
    | set(_WINDOW_R8)
)
# padding is strictly re-verification of already-driver-green names
# (every non-seed name is green somewhere in the r4-r9 union):
assert set(_R9_PADDING) <= (
    set(_WINDOW_R5) | set(_WINDOW_R6) | set(_WINDOW_R7)
)

# ---- round-11 rotation ------------------------------------------------------

# Seed of the round-12 rotation: round-11 additions earn a driver row
# THIS round (the standing recipe).
_WINDOW_R11_SEED: list[str] = [
    "lpa_modularity",            # graph quality contract (modularity)
    "greedy_pair_packing_stats",  # 2-packing waste measurement
    "embedding_whitening_audit",  # anisotropy / whitening contract
    "ivf_cell_balance",          # quantizer-health / retrain gate
    "psi_event_value_drift",     # train/serve drift gate (PSI)
    "ivf_recall_vs_nprobe",      # probe/recall tuning curve
    "stl_residual_anomalies",    # seasonal-adjusted anomaly detector
    "dedup_impact_report",       # what dedup saves, per source
    "pit_prior_regime_purchases",  # point-in-time join vs SCD-2 history
    "zorder_clustering_report",   # z-order zone-map skipping audit
    "encoding_efficiency_report",  # columnar encoding statistics
    "embedding_uniformity_report",  # Wang-Isola pairwise geometry
    "epoch_plan_token_budget",    # token-budget mixing plan
    "conformal_interval_coverage",  # distribution-free UQ contract
    "ivf_silhouette_quality",     # quantizer geometric quality
    "dedup_threshold_sweep",      # near-dup threshold tuning curve
    "cross_split_semantic_leakage",  # near-dup train->eval contamination
    "anomaly_ensemble_votes",     # 2-of-3 detector ensemble
    "seasonal_naive_backtest",    # forecast-baseline MAE/MAPE backtest
    "edge_support_profile",       # k-truss support histogram
    "dirichlet_lm_topk_docs",     # query-likelihood LM retrieval
    "hll_rsd_sweep",              # sketch accuracy/memory tuning curve
]

# Queries whose CODE (plan or oracle) changed in round 11 — re-verify
# FIRST so no driver row certifies stale code:
#   - minhash_jaccard_calibration: per-band md5 candidate sampling
#   - the 7 IVF-family queries: n_centroids ~ sqrt(N) (dynamic ncent
#     CTE in the oracles; GEMM-candidate cell assignment in the plans)
#   - the 3 GEMM-PCA queries: pid-ordered deterministic moment fold
#   - kcore_copurchase (k=2) / significant_parts_by_value (1.5x-mean
#     threshold): per-sf-meaningful parameters
#   - the 2 storage-layout queries: dynamic bucket count + validated
#     layout markers
_R11_CODE_CHANGED = [
    "minhash_jaccard_calibration",
    "ann_recall_at_k",
    "ivf_train_codebook",
    "knn_join_ivf",
    "ivf_ann_topk",
    "semdedup_prune_embeddings",
    "ivfpq_ann_topk",
    "ann_serve_external",
    "pca_top_component_gemm",
    "pca_topk_components_deflation",
    "pca_projection_outliers",
    "kcore_copurchase",
    "significant_parts_by_value",
    "partitioned_fact_dpp_revenue",
    "bucketed_join_revenue",
    # round-11 second session: triangles_per_node refactored onto the
    # extracted oriented_triangles core (operators/graph.py) — its two
    # consumers re-verify on the refactored code
    "triangle_parts_copurchase",
    "clustering_coefficient_parts",
]

# RE-VERIFICATION padding: family keepers first (one representative
# per judge-graded family not already covered by seed/changed — the
# stalest member of each), then the registry names whose LAST driver
# row is the oldest (CORRECTNESS_r04.json vintage, none newer),
# alphabetical within that vintage — drops from the tail as
# seed/changed grow.
_R10_PADDING = [
    "cms_heavy_hitters",  # sketches keeper (last driver row r7)
    "full_outer_reconcile_customers",  # relational_coverage keeper (r7)
    "cdc_snapshot_diff",  # incremental_history keeper (r7)
    "rolling_corr_daily",  # window_ts keeper (r7)
    "benford_first_digit_orders",  # stats keeper (r7)
    "bpe_first_merge_pairs",  # text_analysis keeper (r7)
    "dsir_importance_weights",  # curation keeper (r7)
    "hybrid_rrf_retrieval",  # retrieval keeper (r7)
    "flac_decode_profile",  # multimodal keeper (r8)
    "asof_click_before_purchase",
    "cross_join_limited",
    "cube_lineitem",
    "demo_noise_zscore",
    "doc_quality_scores",
    "embedding_neardup_pairs",
    "fingerprint_duplicates",
    "gold_extremes",
    "gold_fact_supplier_monthly",
    "gold_kpis_yearly",
    "gold_supplier_dim",
    "grouping_sets_lineitem",
    "lang_id_heuristic",
    "lsh_ann_topk",
    "minhash_lsh_candidates",
    "monthly_revenue_delta",
    "ngram_jaccard_pairs",
    "parse_delimited_roundtrip",
    "parse_fixed_width_roundtrip",
    "range_join_next_hour",
    "rollup_lineitem",
    "salted_join_revenue",
    "sessionize_events",
    "simhash_signatures",
    "sliding_2h_events",
    "small_qty_brand_revenue",
    "topk_customers_per_nation",
    "topk_orders",
    "tumbling_hourly_events",
    "union_multi_source",
    "approx_quantiles_events",
]

_WINDOW_R10 = (
    ["zscore_anomaly"]
    + _WINDOW_R11_SEED
    + _R11_CODE_CHANGED
    + _R10_PADDING[: 50 - 1 - len(_WINDOW_R11_SEED) - len(_R11_CODE_CHANGED)]
)
assert len(_WINDOW_R10) == 50
assert len(set(_WINDOW_R10)) == 50
# every seed name is new to the driver:
assert not set(_WINDOW_R11_SEED) & (
    set(_WINDOW_R4) | set(_WINDOW_R5) | set(_WINDOW_R6) | set(_WINDOW_R7)
    | set(_WINDOW_R8) | set(_WINDOW_R9)
)

# _WINDOW_R10 earned its rows in CORRECTNESS_r11.json (49/50 green;
# embedding_whitening_audit's red row was a rounding-boundary flake —
# VERDICT r11 — fixed this round via the bit-parity fixed-point moment
# path, and it re-verifies in _R12_CODE_CHANGED below).

# ---- round-12 rotation ------------------------------------------------------

# Seed of the round-13 rotation: round-12 additions earn a driver row
# THIS round (the standing recipe). Grown as queries land.
_WINDOW_R12_SEED: list[str] = [
    "ktruss_decomposition_parts",  # graph family's third quality contract
    "retrieval_scorer_shootout",  # BM25 vs Dirichlet vs RRF eval contract
    "dsir_epoch_rebalance",  # DSIR selection -> epoch plan, end-to-end
    "matrix_profile_discords_daily",  # subsequence-level anomaly (discords)
    "bloom_semijoin_reduction",  # runtime-filter mechanics, exact numbers
    "shuffle_skew_report",  # the salting-decision gate
    "approx_percentile_accuracy_sweep",  # quantile-sketch tuning curve
    "textrank_keywords",  # weighted-PageRank keyword extraction
    "ivf_assignment_drift_psi",  # quantizer drift gate (PSI over cells)
    "watermark_late_audit",  # late-data pricing for withWatermark
    "kmv_set_operations",  # deterministic distinct sketch w/ set algebra
]

# Queries whose CODE (plan or oracle) changed in round 12 — re-verify
# FIRST so no driver row certifies stale code:
#   - embedding_whitening_audit: bit-parity fixed-point moments + the
#     pinned pure-Python power iteration (VERDICT r11 #1 — the one red
#     row in CORRECTNESS_r11)
#   - ivf_recall_vs_nprobe: cell assignment shared across the three
#     nprobe settings (VERDICT r11 #4)
#   - knn_join_ivf / ivf_ann_topk / ann_serve_external: ivf_knn_join's
#     assignment block extracted into ivf_assignment (same plan, the
#     shared-assignment refactor — re-verified out of caution)
#   - hll_rsd_sweep: certificate widened to 5 sigma and renamed
#     within_5rsd (ADVICE r11)
#   - cross_split_semantic_leakage: scale-safe copy-id offset
#     (ADVICE r11)
#   - dirichlet_lm_topk_docs: token stream localCheckpointed once
#     (ADVICE r11)
_R12_CODE_CHANGED = [
    "embedding_whitening_audit",
    "ivf_recall_vs_nprobe",
    "knn_join_ivf",
    "ivf_ann_topk",
    "ann_serve_external",
    "hll_rsd_sweep",
    "cross_split_semantic_leakage",
    "dirichlet_lm_topk_docs",
]

# RE-VERIFICATION padding: family keepers first (one representative
# per judge-graded family not already covered by flagship/seed/changed
# — the STALEST green member of each, computed from the committed
# CORRECTNESS_r*.json union), then the registry names whose LAST
# driver row is the oldest (r04 vintage, then r05), alphabetical
# within a vintage. Drops from the tail as seed/changed grow.
_R11_PADDING = [
    "quantile_digest_rollup",  # sketches keeper (last row r07)
    "pct_rank_orders",  # relational_coverage keeper (r07)
    "equidepth_hist_orders",  # sampling keeper (r07)
    "cohort_retention_monthly",  # incremental_history keeper (r07)
    "stl_decompose_daily_revenue",  # window_ts keeper (r07)
    "mannwhitney_purchase_click",  # stats keeper (r07)
    "bpe_token_profile",  # text_analysis keeper (r07)
    "chunk_dedup_docs",  # dedup keeper (r07)
    "temperature_mix_weights",  # curation keeper (r07)
    "bm25_topk_docs",  # retrieval keeper (r10)
    "flac_lpc_decode_profile",  # multimodal keeper (r08)
    "bfs_copurchase_distances",  # graph keeper (r07)
]
_R11_PADDING += [
    n
    for n in _R10_PADDING[10:]
    if n not in _R12_CODE_CHANGED and n not in _R11_PADDING
]
_R11_PADDING += [  # r05-vintage fill past the _R10_PADDING tail
    "benchmark_decontamination",
    "chain_components_star",
    "chisq_event_type_dow",
    "chunk_documents_64_16",
    "dedup_clusters_embedding",
    "dedup_keep_representatives",
    "embedding_centroids_by_label",
    "entity_resolution_customers",
    "ewma_user_value",
    "funnel_view_click_purchase",
    "interval_overlap_sessions_noon",
    "jsonl_parse_roundtrip",
]

_WINDOW_R11 = (
    ["zscore_anomaly"]
    + _WINDOW_R12_SEED
    + _R12_CODE_CHANGED
    + _R11_PADDING[: 50 - 1 - len(_WINDOW_R12_SEED) - len(_R12_CODE_CHANGED)]
)
assert len(_WINDOW_R11) == 50
assert len(set(_WINDOW_R11)) == 50
# every seed name is new to the driver:
assert not set(_WINDOW_R12_SEED) & (
    set(_WINDOW_R4) | set(_WINDOW_R5) | set(_WINDOW_R6) | set(_WINDOW_R7)
    | set(_WINDOW_R8) | set(_WINDOW_R9) | set(_WINDOW_R10)
)

# _WINDOW_R11 earned its rows in CORRECTNESS_r12.json (49/50 green;
# embedding_whitening_audit was the lone hash-red and its contract is
# REWRITTEN this round — certificate form — so it leads
# _R13_CODE_CHANGED below).

# Round-13 seed: the Structured Streaming surface enters the driver
# contract (queries/streamingq.py — bounded-drain memory-sink
# harness over real readStream graphs).
_WINDOW_R13_SEED: list[str] = [
    "streaming_dedup_first_event",
    "streaming_tumbling_hourly",
    "streaming_sliding_2h",
    "streaming_user_totals_cents",
    "streaming_nation_revenue",
    "streaming_click_purchase_interval_join",
    "streaming_incremental_gold_totals",
    "streaming_approx_users_by_type",
]

# Code changed in round 13 → driver re-verification required:
#   - embedding_whitening_audit: contract rewritten to integer-digest
#     + tolerance certificates (VERDICT r12 #1; red in r11+r12).
#   - kmv_set_operations: sketches now dedupe hash values before the
#     bottom-k on both engines (ADVICE r12).
_R13_CODE_CHANGED = [
    "embedding_whitening_audit",
    "kmv_set_operations",
]

# RE-VERIFICATION padding: family keepers first (one representative
# per judge-graded family not already covered by flagship/seed/changed
# — the standing convention since r9, so no family's driver row goes
# stale unobserved), then the registry names whose latest green driver
# row is the OLDEST (r04 vintage first, then r05), alphabetical within
# a vintage — computed from the committed CORRECTNESS_r*.json union
# (whose cross-round invariant is: every registry name keeps at least
# one green row, refreshed stalest-first).
_R12_PADDING = [
    # family keepers
    "approx_distinct_users",      # sketches
    "groupby_kpis",               # relational coverage
    "deterministic_sample",       # sampling
    "merge_upsert_users",         # incremental / history
    "rolling_daily_mean",         # window / time series
    "mann_kendall_trend_daily",   # stats
    "term_frequency_top50",       # text analysis
    "dedup_first_event",          # dedup
    "curation_pipeline",          # curation
    "bm25_topk_docs",             # retrieval
    "cosine_topk",                # similarity / ANN
    "multimodal_binary_profile",  # multimodal
    "triangle_parts_copurchase",  # graph
    # r04 vintage
    "range_join_next_hour",
    "rollup_lineitem",
    "salted_join_revenue",
    "sessionize_events",
    "simhash_signatures",
    "sliding_2h_events",
    "small_qty_brand_revenue",
    "topk_customers_per_nation",
    "topk_orders",
    "tumbling_hourly_events",
    "union_multi_source",
    # r05 vintage
    "approx_quantiles_events",
    "benchmark_decontamination",
    "chain_components_star",
    "chisq_event_type_dow",
    "chunk_documents_64_16",
    "dedup_clusters_embedding",
    "dedup_keep_representatives",
    "embedding_centroids_by_label",
    "entity_resolution_customers",
    "ewma_user_value",
    "funnel_view_click_purchase",
    "interval_overlap_sessions_noon",
    "jsonl_parse_roundtrip",
    "knn_join_brute",
    "levenshtein_neardup",
    "locf_gap_fill_events",
    "market_basket_lift",
    "mix_rebalance_sources",
    "pack_sequences_512",
    "pii_scrub_docs",
    "png_decode_profile",
    "prefix_jaccard_pairs",
    "quota_sample_per_source",
    "repetition_quality_docs",
    "session_window_stats",
    "spearman_parts_rev_vs_qty",
    "split_leakage_audit",
    "stratified_sample_events",
    "term_drift_js_divergence",
    "tfidf_top_terms",
    "unigram_lm_scores",
]
# (the padding list is truncated to the remaining slots below; names
# past the cut stay at their current vintage for round 14)

_WINDOW_R12 = (
    ["zscore_anomaly"]
    + _WINDOW_R13_SEED
    + _R13_CODE_CHANGED
    + _R12_PADDING[: 50 - 1 - len(_WINDOW_R13_SEED) - len(_R13_CODE_CHANGED)]
)
assert len(_WINDOW_R12) == 50
assert len(set(_WINDOW_R12)) == 50
# every seed name is new to the driver:
assert not set(_WINDOW_R13_SEED) & (
    set(_WINDOW_R4) | set(_WINDOW_R5) | set(_WINDOW_R6) | set(_WINDOW_R7)
    | set(_WINDOW_R8) | set(_WINDOW_R9) | set(_WINDOW_R10)
    | set(_WINDOW_R11)
)

_WINDOW_R12  # noqa: B018 — kept (with its asserts) as the r13 record

# Code changed in rounds 13+14 → driver re-verification required
# (VERDICT r13 item 1: the optimizer-touched queries were frozen out
# of the r13 window; every one of them must earn a driver row now).
# No new queries this round — optimization only — so there is no
# _WINDOW_R14_SEED; the whole non-flagship window is re-verification.
_R14_CODE_CHANGED = [
    # r13 batch 2/3 — PQ/IVF serving-path literal construction
    # (operators/similarity.py; r14 additionally fixed the
    # _cand_cell_structs twin and added empty/non-finite guards):
    "pq_ann_topk",
    "pq_code_histogram",
    "pq_rescore_topk",
    "pq_reconstruction_error",
    "ivfpq_ann_topk",
    "ivf_train_codebook",
    "knn_join_ivf",
    "ivf_ann_topk",
    "ann_serve_external",
    "ivf_recall_vs_nprobe",
    "ann_recall_at_k",
    # r13 batch 1 — statsq surgery + stable_global_index/running_totals
    # input pin (operators/relational.py), including every inheritor;
    # r14 added the hex_t sortedness assert (poisson) and pin_input
    # call-site opt-outs (spearman, isotonic):
    "poisson_bootstrap_order_value",
    "spectral_seasonality_daily",
    "theil_sen_slope_daily",
    "cusum_changepoint_daily",
    "ks_test_purchase_click",
    "cvm_test_purchase_click",
    "wasserstein_purchase_click",
    "lorenz_curve_order_value",
    "kruskal_wallis_event_values",
    "page_hinkley_drift_daily",
    "isotonic_regression_daily",
    "runs_test_daily_revenue",
    "conformal_interval_coverage",
    "spearman_parts_rev_vs_qty",
    # r13 — other
    "market_basket_lift",
    "ewma_user_value",
    # sgi inheritors outside statsq (r14 pin_input call-site changes
    # in coverage.py; curation/textops inherit the r13 operator pin):
    "stable_global_index_events",
    "ntile_deciles_orders",
    "time_embargo_split_events",
    "zipf_fit_terms",
    # r14 — star-CC surgery (operators/dedup.py: driver-local endgame
    # + single pair-subtree evaluation):
    "dedup_clusters_embedding",
    "dedup_keep_representatives",
    "entity_resolution_customers",
    "chain_components_star",
    # r14 — bucketed-layout builder split out for the cold bench row:
    "bucketed_join_revenue",
    # r14 — VERDICT items 6/8/9 targets (verify-skew, regression
    # triage, one-off re-measure):
    "prefix_jaccard_pairs",
    "dedup_threshold_sweep",
    "cross_split_semantic_leakage",
    "funnel_view_click_purchase",
]
assert len(set(_R14_CODE_CHANGED)) == len(_R14_CODE_CHANGED)

# Padding: the standing convention — family keepers FIRST (the
# stalest green member of every judge-graded family that has no
# representative among flagship + _R14_CODE_CHANGED, vintages from the
# committed CORRECTNESS_r*.json union), then the overall-stalest
# remaining names (r05 vintage, alphabetical). The code-changed set
# covers anomaly/stats/similarity/text/dedup/window_ts/curation/
# relational-coverage/storage by membership, so six keepers remain.
_R14_PADDING = [
    "copurchase_degree_assortativity",  # graph keeper (last row r07)
    "embedding_dim_scale",              # sketches keeper (r08)
    "idle_rich_customers",              # incremental/history keeper (r08)
    "jpeg_progressive_profile",         # multimodal keeper (r08)
    "rbo_bm25_vs_tf",                   # retrieval keeper (r10)
    "weighted_sample_customers",        # sampling keeper (r10)
    "locf_gap_fill_events",             # stalest vintage fill (r05)
    "mix_rebalance_sources",            # stalest vintage fill (r05)
    "pack_sequences_512",               # stalest vintage fill (r05)
]

_WINDOW_R13 = (
    ["zscore_anomaly"]
    + _R14_CODE_CHANGED
    + _R14_PADDING[: 50 - 1 - len(_R14_CODE_CHANGED)]
)
assert len(_WINDOW_R13) == 50
assert len(set(_WINDOW_R13)) == 50

_PRIORITY = _WINDOW_R13  # ACTIVE for round 14's driver correctness check


def _reorder() -> None:
    missing = [n for n in _PRIORITY if n not in QUERIES]
    assert not missing, f"priority names not registered: {missing}"
    for registry in (QUERIES, ORACLE):
        snapshot = dict(registry)
        registry.clear()
        for n in _PRIORITY:
            if n in snapshot:
                registry[n] = snapshot.pop(n)
        registry.update(snapshot)


_reorder()
