"""Query registry: the single table the driver contract iterates.

Every implemented operator from SURVEY.md §2 registers here as
  name -> {fn: (spark, sf_dir) -> DataFrame, oracle: SQL str | None}

``oracle`` is the ANSI-SQL twin DuckDB runs on the same parquet views;
None means the op is not SQL-expressible (LSH, streaming, sampling) and
the driver records a rows-only check (SURVEY.md §5.2).

Exactness contract (critical for the driver's value-hash compare):
float aggregations route through DECIMAL so the result is
order-of-summation independent and therefore bit-identical between
Spark and DuckDB — see functions/exact.py.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, dict[str, Any]] = {}

_OPERATOR_MODULES = (
    "ipydataclean_spark.operators.profiling",
    "ipydataclean_spark.operators.detectors",
    "ipydataclean_spark.operators.cleaning",
    "ipydataclean_spark.operators.relational",
    "ipydataclean_spark.operators.tpch_extra",
    "ipydataclean_spark.operators.analytics",
    "ipydataclean_spark.operators.windows",
    "ipydataclean_spark.operators.functions_suite",
    "ipydataclean_spark.operators.functions_extra",
    "ipydataclean_spark.operators.functions_stats",
    "ipydataclean_spark.operators.quality",
    "ipydataclean_spark.operators.expectations",
    "ipydataclean_spark.operators.groupstats",
    "ipydataclean_spark.operators.featprep",
    "ipydataclean_spark.operators.graph",
    "ipydataclean_spark.operators.sketches",
    "ipydataclean_spark.operators.text_rank",
    "ipydataclean_spark.operators.udfs",
    "ipydataclean_spark.operators.llm",
    "ipydataclean_spark.operators.llm_extra",
    "ipydataclean_spark.operators.llm_quality",
    "ipydataclean_spark.operators.curation",
    "ipydataclean_spark.operators.ivf",
    "ipydataclean_spark.operators.incremental",
    "ipydataclean_spark.operators.multimodal",
    "ipydataclean_spark.operators.media_codecs",
    "ipydataclean_spark.operators.media_jpeg",
    "ipydataclean_spark.operators.media_flac",
    "ipydataclean_spark.operators.html_extract",
    "ipydataclean_spark.operators.instruct_qa",
    "ipydataclean_spark.operators.encoding_qa",
    "ipydataclean_spark.operators.pdf_extract",
    "ipydataclean_spark.operators.warc_extract",
    "ipydataclean_spark.operators.unicode_norm",
    "ipydataclean_spark.operators.url_canonical",
    "ipydataclean_spark.operators.robots_filter",
    "ipydataclean_spark.streaming.batch_twins",
    "ipydataclean_spark.sources.pydatasource",
    "ipydataclean_spark.sources.txlog",
)


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a query under ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = {"fn": fn, "oracle": oracle, "tags": tags, "doc": (fn.__doc__ or "").strip()}
        return fn

    return deco


def load_all() -> dict[str, dict[str, Any]]:
    """Import every operator module (each registers its queries on import)."""
    for mod in _OPERATOR_MODULES:
        importlib.import_module(mod)
    return QUERIES


#: Queries already driver-verified green (rows+schema+hash) in a prior round's
#: CORRECTNESS_r*.json. The driver's per-round correctness window covers the
#: first ~50 entries of ``queries()`` in order, so ``ordered_queries`` floats
#: not-yet-driver-checked queries to the front each round (VERDICT r01 #1).
#: Append each new round's green names here once its CORRECTNESS file lands.
DRIVER_GREEN_PRIOR_ROUNDS: frozenset[str] = frozenset({
    # CORRECTNESS_r01.json — 50/50 green
    "p1_table_counts", "p2_null_profile", "p3_distinct_counts",
    "p4_numeric_profile", "p5_quantiles", "p6_mode", "p7_histogram",
    "p8_castability", "p9_topk_values", "p10_summary_bundle",
    "p11_column_entropy", "d1_missing_rows", "d2_string_mismatch",
    "d3b_outliers_zscore", "d4_duplicate_rows",
    "d6_castability_report", "c1_fill_value", "c2_fill_mean",
    "c4_fill_mode", "c5_interpolate_linear",
    "c5b_interpolate_per_user", "c6_ffill_bfill", "c7_dropna",
    "c9_convert_string_numeric", "c10_replace_value",
    "c13_cast_column",
    "c14_15_rename_drop", "c16_dedup_exact",
    "c17_normalize_text", "c18_merge_upsert", "q1_pricing_summary_cleaned",
    "q6_revenue_band",
    # q3_top_orders / q5_nation_revenue were r1-green but their joins
    # were restructured in round 7 (forced customer broadcast dropped,
    # VERDICT r06 #1) — re-queued per the rotation-exclusion rule
    "r2_filter_predicates", "r4_left_join_counts", "r5_semi_anti",
    "r7_cross_join", "r8_range_join", "r9_asof_join",
    "r10_interval_self_join", "r11_groupby_agg", "r12_rollup",
    "r12b_cube_sql",
    # CORRECTNESS_r02.json — 49/50 green (r14_collect_set stays fresh:
    # its output was re-flattened to strings for round 3)
    "p20_skew_profile", "c18b_merge_files", "r25b_correlated_subquery_sql",
    "r13_conditional_agg", "r15_sort_nulls", "r16_limit_offset",
    "r18_topk_per_group", "r19_union", "r20_intersect_except",
    "r21_distinct", "r23_pivot", "r24_unpivot", "r25_scalar_subquery",
    "q4_priority_count", "q7_volume_shipping",
    "q15_top_supplier", "q1b_pricing_summary_single_scan",
    "r9b_asof_join_forward", "r12c_grouping_sets_sql", "r26_lateral_topk_sql",
    # q2/q8/q9/q10/q11/q14/q16/q17/q18/q19/q20/q21 were r2-green but
    # their customer/part/supplier joins lost the forced broadcast
    # hint in round 7 (VERDICT r06 #1) — re-queued per the
    # rotation-exclusion rule until a driver window re-proves them
    "q12_priority_by_status",
    "q13_order_count_distribution",
    "q22_dormant_customers",
    "q23_part_cooccurrence", "q_funnel_conversion", "q_cohort_retention",
    # l2e_fuzzy_match_join was r2-green but refactored in round 5
    # (pair step shared with er1) — re-queued per the rotation rule
    "t1_time_rollup_sql", "w1_ranking", "w2_analytic",
    "w3_frames", "w4_moving_avg", "w5_rolling_median", "w7_distribution_ranks",
    "f_string", "f_datetime", "f_math",
    # CORRECTNESS_r03.json — 50/50 green
    "p28_histogram_2d", "p30_functional_dependencies",
    "c21_resample_timeseries", "c22_one_hot",
    "c24_feature_scaling", "l16_pii_redact", "c29_target_encode",
    "recipe_sql_export", "r14_collect_set",
    # autofix_pipeline was r3-green but problems() gained the variants
    # detector in round 5 (fixture output unchanged, implementation
    # changed) — re-queued per the rotation rule
    "r9c_asof_join_tolerance",
    # q_rfm_segments / q_pareto_revenue / q29_session_conversion were
    # r3-green but REWRITTEN in round 4 (distributed ranking pattern;
    # total-order window frame) — their green rows certify the OLD
    # plans, so they stay OUT of this set until a driver window
    # re-proves the new implementations (code-review r04 finding)
    "q24_ship_latency", "q25_repeat_purchase", "q26_stickiness",
    # q27_yoy_growth was r3-green but its customer join lost the
    # forced broadcast in round 7 (VERDICT r06 #1) — re-queued
    # q28_association_rules / q31_trending_parts were r3-green but
    # REWRITTEN in round 5 (q28: parameterized prefilter knob; q31:
    # shared-rollup refactor for the q31b bucketed variant) — per the
    # standing rotation-exclusion rule they stay OUT of this set until
    # a driver window re-proves the new implementations
    "q32_event_transitions", "q33_cohort_ltv",
    "w8_cumulative_distinct", "w9_value_streaks", "w10_last_touch_attribution",
    "f_conditional", "f_array", "f_json", "f_hash", "s4_values_inline",
    "f_array2", "f_posexplode", "f_datetime2", "f_regexp", "f_moment_stats",
    "f_agg_extra", "f_bitwise", "p18_corr_matrix", "p25_mutual_info",
    "p26_group_regression", "c19_parse_dates_multi", "c20_standardize_units",
    "p13_constraint_suite", "d7_drift_ks",
    "d8_pattern_validity", "d9_rolling_anomaly",
    # p16_fk_integrity was r3-green but its customer anti-join lost
    # the forced broadcast in round 7 (VERDICT r06 #1) — re-queued
    "p17_benford_profile",
    # CORRECTNESS_r04.json — 50/50 green (includes the round-4 rewrites
    # q_rfm_segments / q_pareto_revenue / q29_session_conversion, whose
    # NEW implementations these rows certify — VERDICT r04 #4)
    "r27_recursive_cte_sql", "r28_null_safe_join",
    "q_rfm_segments", "q_pareto_revenue", "q29_session_conversion",
    "q_revenue_deciles", "q34_rolling_corr", "p19_missingness_patterns",
    "c26_rank_normalize", "d10_snapshot_diff", "d11_drift_psi",
    "c27_flatten_json", "p22_cramers_v", "d12_volume_anomaly",
    "q30_daily_p95", "d14_seasonal_anomaly", "d15_null_rate_drift",
    "d16_cusum_changepoint", "x2_expectations_orders",
    # x1_expectations / x3_quarantine were r4-green but their regex
    # anchor changed in round 5 ($ -> \z, the Java-vs-RE2 final-newline
    # divergence) — re-queued per the rotation-exclusion rule
    "p5b_group_quantiles", "r14b_listagg",
    "w6_validity_intervals", "c25_hash_split", "r11b_salted_agg",
    "p27_weighted_median", "c32_stratified_sample", "g2_triangle_count",
    "g2b_triangles_degree_oriented", "p15_bitmap_distinct",
    "p12_hll_profile", "p14_theta_setops", "z1_zorder_values",
    # l8b_bm25_search was r4-green but refactored in round 5 (scoring
    # body shared with l35) — re-queued per the rotation-exclusion rule
    "f_variant", "l17_bigram_topk", "l8c_tfidf_search",
    "u1_scalar_udf", "u2_pandas_udf_zclamp", "u3_applyinpandas_groupfill",
    "u4_grouped_agg_mad", "u7_pandas_iter_udf", "u8_map_in_arrow",
    "u9_cogroup_asof", "u10_arrow_udf", "u11_udtf_analyze",
    # l1_exact_dedup was r4-green but its digest-rank block was
    # extracted into with_dedup_rank in round 8 — re-queued per the
    # rotation rule (same for pipeline_corpus_curation below)
    # l2b_jaccard_pairs was r4-green but its body was extracted into
    # the shared exact_jaccard_pairs helper in round 8 (the l2h
    # sampling knob needs truth over a sampled doc slice) — re-queued
    # per the rotation-exclusion rule (plan-identical, but the rule is
    # the rule)
    # CORRECTNESS_r05.json — 50/50 clean (42 oracle green, 8 rows-only
    # by-design). The round-4-ordered §2.8/§2.9 core window.
    "l3_knn_exact", "l3g_knn_filtered", "l3h_kmeans_assign",
    "l4_sim_join_exact", "l4c_embed_dedup", "l4d_label_centroids",
    "l5_text_stats", "l6_slice_metrics", "l7_quality_filter",
    "l8_keyword_search", "l10_token_count",
    "l9_multimodal_features", "l9j_binaryfile_ingest", "l9d_real_decode",
    "l9e_audio_frames", "l9g_real_png_decode", "l9h_mulaw_audio",
    "l9i_gif_decode",
    "st1_tumbling_window", "st2_sliding_window", "st3_session_window",
    "st5_dedup_twin", "st7_stream_static_join", "st8_purchase_click_join",
    "st8b_purchase_click_outer", "st10_chained_rollup", "st11_abandoned_carts",
    "st12_dedup_ingest",
    "tx1_acid_upsert", "tx2_skipping_read", "tx3_cdc_read",
    "tx4_bloom_lookup", "tx5_restore_read", "tx6_describe_history",
    "inc1_incremental_stats", "inc2_incremental_dedup", "inc3_incremental_join",
    "s8_pyds_scan",
    # pipeline_lm_dataset was r5-green but restructured in the
    # round-12 optimization pass (slim dedup-exchange payload + the
    # clean-table checkpoint that stops the three-leg recompute) —
    # re-queued per the rotation-exclusion rule
    "pipeline_media_curation",
    # l2_minhash_lsh was r5-checked (rows-only) but its candidate
    # generator changed in the round-12 optimization pass
    # (lsh_candidate_pairs: slim band-join fanout + post-dedup
    # signature rejoin; rows identical, golden-pinned) — re-queued per
    # the rotation-exclusion rule
    "l2c_simhash",
    # l2d_dedup_clusters was r5-checked (rows-only) but cluster_pairs
    # switched to the large-star/small-star default in round 7 —
    # re-queued per the rotation-exclusion rule
    "l3b_knn_lsh", "l3c_knn_ivf", "l3e_knn_pq", "l4b_embed_neardup_lsh",
    "l9b_media_resize",
    # CORRECTNESS_r06.json — 50/50 green. er1_entity_resolution was
    # r6-green but consumes cluster_pairs, whose default switched to
    # the star method in round 7 AFTER its green row — re-queued.
    "q28_association_rules", "q31_trending_parts", "x1_expectations",
    "x3_quarantine", "l8b_bm25_search", "l2e_fuzzy_match_join",
    # autofix_pipeline (r6-green, r10 re-proved) left this set in
    # round 11: problems()/_string_problem_exprs gained the mojibake
    # counter + classification and autofix gained the repair ordering
    # (changed bodies in its call chain) — re-queued per the rule
    "w11_gap_islands", "w12_merge_intervals",
    "s9_orc_roundtrip", "s10_json_corrupt_records", "s11_schema_evolution",
    "r8b_range_join_bucketed", "c34_value_cluster", "c35_standardize_values",
    "c36_canonicalize_urls", "c37_regression_impute",
    "c38_parse_localized_numbers", "d17_completeness_calendar",
    "d18_anomaly_attribution", "x5_k_anonymity",
    "p31_quantile_sketch_merge", "p33_joinability",
    "l36_semdedup", "l37_dsir_weights", "l38_token_kl_drift",
    "l39_gumbel_resample", "l41_embed_decontaminate",
    "er2_blocking_metrics", "q28b_apriori_prefilter",
    "q31b_trending_parts_bucketed", "l13_chunk_udtf",
    "l14_countmin_heavy_hitters", "l15_boilerplate_ratio",
    # l18_unigram_logprob was r6-green but its oracle string was moved
    # to a module constant in round 9 (l52 embeds it) — byte-identical,
    # but changed-after-green => re-queued per the standing rule
    "l19_gopher_quality", "l20_domain_budget",
    "l21_top_bigram_frac", "l23_char_entropy", "l24_url_domains",
    "l26_contamination_check",
    # l28/l29 were r6-green but their shared gram pass was extracted
    # into gram3_over in round 8 (the span-cut pipeline needs grams
    # over dedup survivors) — re-queued per the rotation rule
    # (plan-identical delegation, but the rule is the rule)
    "l31_source_temperature_mix",
    "l32_bigram_logprob", "l33_shuffle_shards", "l34_sequence_pack",
    # l35_hybrid_rrf was r6-green but its oracle string was moved to a
    # module constant in round 8 (byte-identical — verified by the r08
    # judge — but changed-after-green ⇒ re-queue per the standing rule,
    # VERDICT r08 "what's wrong" #3)
    "c31_segment_dedup",
    # CORRECTNESS_r07.json — 48/50 green (33 oracle rows+schema+hash,
    # 15 rows-only with rows recorded). The two absentees —
    # p3b_approx_profile / f_map_functions — CRASHED the driver's
    # rows-only canonicalizer (array-typed columns, pandas
    # "unhashable type: 'list'") and therefore have NO green row:
    # they stay fresh, flattened to scalar columns for round 8.
    "x3b_quarantine_codegen", "r8c_range_join_sparse",
    "l2g_simhash_md5",
    "l3i_knn_ivf_seeded", "l3j_knn_pq_seeded", "l3k_knn_lsh_md5",
    "l4e_embed_neardup_lsh_md5", "l11b_language_id_certified",
    "l12b_fingerprints_md5", "c30b_dedup_keep_best_md5",
    "g1b_pagerank_fixedpoint", "r22d_hash_sample",
    # l2h/l3m were r7-green but gained the deterministic sampling
    # fraction parameter in round 8 (VERDICT r07 #5) — re-queued per
    # the rotation-exclusion rule until a window re-proves them
    "er1_entity_resolution",
    "q3_top_orders", "q5_nation_revenue", "q10_returned_items",
    "q2_min_cost_supplier", "q8_market_share", "q9_product_profit",
    "q11_important_parts", "q14_promo_revenue", "q16_supplier_count",
    "q17_small_quantity_revenue", "q18_large_volume_customers",
    "q19_disjunctive_revenue", "q20_part_share_suppliers",
    # q21_sole_return_suppliers was r7-green but REWRITTEN in the
    # round-12 optimization pass (three-scan semi/anti self-joins →
    # one-scan pair-grain agg + order window, oracle unchanged and
    # locally hash-green) — re-queued per the rotation-exclusion rule
    "p16_fk_integrity", "q27_yoy_growth",
    # r07 rows-only tier (rows recorded, err=no_oracle by design)
    "g1_pagerank", "l2d_dedup_clusters",
    "l9c_frame_sample",
    # l9f_image_dhash_pairs (r7 rows-only green) left this set in
    # round 11: dhash_neardup_pairs' banding expression is extracted
    # into the shared band8 helper the new banded media probe reuses
    # (changed shared body ⇒ re-queue; same for l9k below)
    # l10b_bpe_token_count re-queued in round 10: functions/bpe.py
    # changed (see the r09 rows-only tier note below)
    "l11_language_id", "l12_fingerprints", "c30_dedup_keep_best",
    "l27_cdc_chunk_dedup", "r22b_stratified_sample",
    "r22c_weighted_sample", "r22_sample", "f_misc_string", "f_hash_misc",
    # CORRECTNESS_r08.json — 50/50 clean (47 oracle rows+schema+hash,
    # 3 rows-only by design with rows recorded). The 20 fresh names;
    # the other 30 window slots were prior-green re-proofs (p1..c8),
    # already members above.
    "l2i_dedup_savings",
    # l2h/l3m stayed IN this set for round 9: the md5_coin_sql
    # hardening (advice r08 #4) does not touch them — their registered
    # defaults (fraction=1.0) never execute md5_coin, the Spark-side
    # md5_coin is unchanged, and their oracle strings contain no coin
    # expression (verified by call-chain audit, review r09).
    # l2h_lsh_recall_audit left in the round-12 optimization pass: its
    # independent eager legs now overlap via a driver thread pool
    # (rows identical, oracle hash-green locally) — re-queued per the
    # rotation-exclusion rule
    "l3m_ivf_recall_audit",
    "l2b_jaccard_pairs",
    # l2j_dedup_threshold_sweep was r8-green but its oracle composition
    # was refactored in round 9 (_SIZES_COMMON_VER_CTES extraction —
    # byte-identical output, verified, but the rule is the rule)
    "l43_substring_dup_spans", "l44_bloom_decontaminate",
    "l42_rerank_interaction", "pipeline_span_curation",
    "l28_winnowing_pairs", "l29_repeated_gram_fraction",
    "l1_exact_dedup",
    # pipeline_corpus_curation was r8-green but its dedup-exchange
    # projection was slimmed in the round-12 optimization pass —
    # re-queued per the rotation-exclusion rule
    "l45_domain_dedup_report", "d19_embedding_drift",
    # inc5_incremental_bloom was r8-green but its state append was
    # reworked in round 9 (driver-side novel-position append, advice
    # r08 #1) — re-queued per the rotation rule
    "l46_hard_negatives",
    # r08 rows-only tier (rows recorded, err=no_oracle by design)
    "p3b_approx_profile", "f_map_functions",
    # l9k_audio_fp_pairs (r8 rows-only green) re-queued in round 11
    # with l9f: shared banding body extracted (see the l9f note)
    # CORRECTNESS_r09.json — 50/50 clean (46 oracle rows+schema+hash,
    # 4 rows-only by design with rows recorded). The 33 fresh oracle
    # names below; the window's other 13 oracle slots were prior-green
    # re-proofs (p1..p28), already members above.
    "l35_hybrid_rrf", "l47_quality_classifier", "l48_retrieval_eval",
    "l49_quality_score_distribution", "l53_containment_pairs",
    "l52_perplexity_buckets", "l54_dedup_cluster_quality",
    "pipeline_quality_curation", "inc6_incremental_quality",
    "st13_quality_filter", "l55_classifier_auc",
    "st14_bloom_decontaminate", "l56_token_fertility",
    "l57_unimax_budgets",
    "l60_cluster_balanced_sample", "x6_l_diversity",
    # EVERY topk_per_row_exact consumer (l58, d21, d22, d23, l64, d24,
    # pipeline_embedding_curation, inc7, st15 — call-chain-verified)
    # was r9-green but the kernel body gained the matmul-screen +
    # exact-fold-rerank in round 10 (bit-identical outputs, re-proven
    # against every oracle locally, but changed-body ⇒ the rotation
    # rule applies); d23/l64/d24/pipeline additionally switched their
    # call sites to topk_per_row_exact_auto (the executable
    # blocked-exact handoff, VERDICT r09 #5) — all re-queued in
    # CORE_FRESH_FIRST
    "c39_exponential_smoothing",
    "l65_rake_keywords", "st16_streaming_ewma",
    "l66_classifier_calibration",
    "l68_unimax_materialize", "l18_unigram_logprob",
    # l2j_dedup_threshold_sweep was r9-green but its four τ fixpoints
    # now run through a driver thread pool (round-12 optimization
    # pass; rows identical, oracle hash-green locally) — re-queued per
    # the rotation-exclusion rule
    "inc5_incremental_bloom",
    # r09 rows-only tier (rows recorded, err=no_oracle by design;
    # semantics pinned by codec goldens / full-frame equality / sweep
    # pins per the VERDICT r09 coverage table)
    "l9l_video_frame_dhash", "l43b_exact_dup_spans",
    # l59_bpe_fertility was r9-green but functions/bpe.py (in its
    # call chain) gained the byte-level pre-tokenization block in
    # round 10 — re-queued per the rotation rule, along with
    # l10b_bpe_token_count (r7 rows-only green, same module)
    # l9m_avi_frame_dhash was r9-green but its AVI codec chain changed
    # in round 10 (encode_avi refactored through the shared _avi_wrap,
    # decode_avi gained the MJPG branch) — re-queued per the
    # rotation-exclusion rule until a driver window re-proves it
    # CORRECTNESS_r10.json — 50/50 clean (42 oracle rows+schema+hash,
    # 8 rows-only by design with rows recorded). The r10-fresh names
    # below; the window's other 29 oracle slots were prior-green
    # re-proofs (p1..c7), already members above. HELD OUT of this
    # append (round 11 touches their call chains, so their r10 rows
    # certify superseded bodies — re-queued in CORE_FRESH_FIRST /
    # ROWS_ONLY_FIRST): l9n_real_jpeg_decode + l9o_mjpeg_frame_dhash
    # (functions/jpeg.py gains progressive/multi-scan decode + the
    # ADVICE r10 marker-loop fixes), l9q_real_flac_decode
    # (media_flac.py gains stereo/24-bit decorrelation),
    # l70_html_extract (ADVICE r10 whitespace-class alignment),
    # st17_media_ingest + inc8_incremental_media (the media-store
    # scale handoff, VERDICT r10 #1), l9f_image_dhash_pairs +
    # l9k_audio_fp_pairs (the banding expression they share is
    # extracted into a helper the new banded probe reuses).
    "l71_conversation_qa", "d23_embedding_outliers",
    "l64_leakage_free_split", "d24_split_leakage",
    "pipeline_embedding_curation", "l58_bitext_margin_mining",
    "d21_knn_label_noise", "d22_neardup_label_conflict",
    "inc7_incremental_embedding", "st15_embedding_ingest",
    # r10 rows-only tier (rows recorded, err=no_oracle by design;
    # semantics pinned by codec goldens / recompute pins per the
    # VERDICT r10 coverage table). l9p_image_phash_pairs is NOT here:
    # it avoids functions/jpeg.py but DOES consume
    # dhash_neardup_pairs, whose banding body moved into band8 this
    # round — re-queued with l9f/l9k (round-11 self-review #1; an
    # earlier draft exempted it on the jpeg.py rationale alone).
    "l10c_published_token_count",
    "l9m_avi_frame_dhash", "l10b_bpe_token_count", "l59_bpe_fertility",
    # CORRECTNESS_r11.json — 50/50 clean (44 oracle rows+schema+hash,
    # 6 rows-only by design with rows recorded). The r11-fresh oracle
    # names below; the window's other 36 oracle slots were prior-green
    # re-proofs, already members above. HELD OUT of this append
    # (round 12 touches their call chains, so their r11 rows certify
    # superseded bodies — re-queued in CORE_FRESH_FIRST /
    # ROWS_ONLY_FIRST): l72_encoding_qa + st18_encoding_qa +
    # autofix_pipeline (mojibake_repair gains the sloppy-cp1252 gate,
    # VERDICT r11 #1 — the widget counter consumes the detector body),
    # l73_pdf_extract (ADVICE r11 /Length-regex + endstream-EOL fixes
    # and the ObjStm work, VERDICT r11 #3), l74_warc_extract (ADVICE
    # r11 WARC-Date + the chunked/gzip HTTP envelope, VERDICT r11 #2),
    # st17_media_ingest + inc8_incremental_media (store_hashes_under_cap
    # gains distinct-before-limit, ADVICE r11 #4).
    "l9n_real_jpeg_decode", "l9q_real_flac_decode", "l70_html_extract",
    # r11 rows-only tier (rows recorded, err=no_oracle by design;
    # semantics pinned by codec goldens / banding pins per the
    # VERDICT r11 coverage table)
    "l9o_mjpeg_frame_dhash", "l9f_image_dhash_pairs",
    "l9k_audio_fp_pairs", "l9p_image_phash_pairs",
    # CORRECTNESS_r12.json — 45/50 clean (the 5 non-pass rows are all
    # rows-only err=no_oracle by design: inc4/inc8/l2/l9r/st17, rows
    # recorded). The r12-fresh + r12-requeued oracle names below.
    # HELD OUT of this append (round 13 touches their call chains —
    # the dsum/davg/dstddev/rsum12 int128 fast path and the quantile
    # pull-budget default — so their r12 rows certify superseded
    # bodies; re-queued in CORE_FRESH_FIRST): autofix_pipeline,
    # d3_outliers_iqr, d3c_outliers_mad, c3_fill_median,
    # c8_drop_by_predicate, c11_clip_outliers, c12_outlier_to_null,
    # c23_binning, c33_robust_scale, s8b_pyds_cleaned, recipe_pipeline.
    # (q21 and pipeline_corpus_curation were runtime-traced NOT to
    # consume the dsum family — they stay green. pipeline_lm_dataset
    # is nevertheless re-queued: its materialization changed in r13,
    # and the holdout subtraction below removes it again.)
    "l72_encoding_qa", "st18_encoding_qa", "l73_pdf_extract",
    "l74_warc_extract", "l75_unicode_nfc_qa", "l76_url_canonical_dedup",
    "l77_robots_filter", "pipeline_crawl_frontend",
    "q21_sole_return_suppliers", "pipeline_corpus_curation",
    "pipeline_lm_dataset",
    "l2j_dedup_threshold_sweep", "l2h_lsh_recall_audit",
    "l2f_minhash_lsh_md5", "inc4b_incremental_minhash_md5",
    # r12 rows-only tier (rows recorded, err=no_oracle by design)
    "st17_media_ingest", "inc8_incremental_media",
    "l9r_image_phash128_pairs", "l2_minhash_lsh", "inc4_incremental_minhash",
})

#: Round-13 window priority (OPTIMIZATION round 2). Every name below
#: has a changed BODY in its call chain this round and therefore leaves
#: the prior-green holdout per the rotation rule:
#:   - the dsum/davg/dstddev/rsum12 int128 fast path
#:     (functions/exact.py + jvm/Decimal128Sum.scala) — consumers
#:     enumerated by RUNTIME TRACING (every registered query built with
#:     instrumented exact.* wrappers at sf0.001; 84 hits, zero misses
#:     possible through indirect wrappers by construction),
#:   - the quantile-engine pull-budget default
#:     (functions/quantiles.py _effective_pull_threshold) — the r12
#:     engine-consumer set again (d3/d3c/c23/c33 are engine-only
#:     consumers, the c*/s8b/recipe names are in the traced 84 too),
#:   - problems()'s pool shutdown hardening (api.py) — autofix_pipeline,
#:   - the pass-4 restructures: cluster_pairs' window-based star
#:     rounds, pagerank's once-computed dangling set + dsum_scaled fast
#:     path, the exact kernel's vectorized emit, and l4's kernel
#:     routing — consumers re-traced at sf0.001 with instrumented
#:     wrappers (21 hits; the oracle-backed ones lead the window below,
#:     rows-only ones in ROWS_ONLY_FIRST).
#: The driver window covers ~50: headline + pass-4 restructures +
#: engine consumers lead; the long tail keeps local full-sweep evidence
#: (348 pass / 0 fail on final code) plus prior rows.
CORE_FRESH_FIRST: tuple[str, ...] = (
    # headline bench queries first (changed plans: decimal128_sum)
    "q1_pricing_summary_cleaned",
    "p10_summary_bundle",
    "q5_nation_revenue",
    "q3_top_orders",
    "q9_product_profit",
    "st1_tumbling_window",
    "st2_sliding_window",
    "st3_session_window",
    # re-queued: the clean-table materialization switched from the
    # lineage-truncating lazy localCheckpoint to a recompute-safe
    # persist (VERDICT r12 residual-issue #1; result proven identical)
    "pipeline_lm_dataset",
    # re-queued: the FLAC codec's CRC/Rice/prediction loops vectorized
    # (VERDICT r12 #6) — encode and decode byte/sample-identical over a
    # 520-case A/B vs the old implementation, oracle hash-green
    "l9q_real_flac_decode",
    # pass-4 restructured call chains (traced consumers, oracle-backed):
    # the star-rounds window rewrite, pagerank restructure, kernel emit
    # vectorization, l4 kernel routing — all re-proven hash-green
    # locally on final code
    "g1b_pagerank_fixedpoint",
    "l4_sim_join_exact",
    "l4c_embed_dedup",
    "er1_entity_resolution",
    "d24_split_leakage",
    "l64_leakage_free_split",
    "d21_knn_label_noise",
    "d22_neardup_label_conflict",
    "d23_embedding_outliers",
    "l58_bitext_margin_mining",
    "inc7_incremental_embedding",
    "st15_embedding_ingest",
    "pipeline_embedding_curation",
    "c30b_dedup_keep_best_md5",
    "l2i_dedup_savings",
    "l2j_dedup_threshold_sweep",
    "l45_domain_dedup_report",
    "l54_dedup_cluster_quality",
    # pass-5 restructured bodies: u9's bucketed cogroup kernel, the
    # l3k/l4e vectorized sign-sketch — all re-proven hash-green locally
    "u9_cogroup_asof",
    "l3k_knn_lsh_md5",
    "l4e_embed_neardup_lsh_md5",
    # pass-7: events_dirty's size-gated distributed row_id (the serial
    # global window at scale); the driver-SF plans are unchanged (small
    # branch), but the body changed — re-queued per the rotation rule,
    # and the forced-big-branch oracle compare passed locally
    "c5_interpolate_linear",
    "c5b_interpolate_per_user",
    "c6_ffill_bfill",
    # exact-quantile engine consumers (pull-budget default derivation)
    "d3_outliers_iqr",
    "d3c_outliers_mad",
    "c23_binning",
    "c33_robust_scale",
    "autofix_pipeline",
    "recipe_pipeline",
    "s8b_pyds_cleaned",
    "c3_fill_median",
    "c8_drop_by_predicate",
    "c11_clip_outliers",
    "c12_outlier_to_null",
    # remaining dsum/davg/dstddev/rsum12 consumers (traced)
    "p4_numeric_profile",
    "d3b_outliers_zscore",
    "c1_fill_value",
    "c2_fill_mean",
    "c4_fill_mode",
    "c7_dropna",
    "c21_resample_timeseries",
    "c24_feature_scaling",
    "c37_regression_impute",
    "d11_drift_psi",
    "d16_cusum_changepoint",
    "d19_embedding_drift",
    "f_moment_stats",
    "inc3_incremental_join",
    "inc6_incremental_quality",
    "l18_unigram_logprob",
    "l23_char_entropy",
    "l32_bigram_logprob",
    "l35_hybrid_rrf",
    "l37_dsir_weights",
    "l38_token_kl_drift",
    "l39_gumbel_resample",
    "l3h_kmeans_assign",
    "l42_rerank_interaction",
    "l46_hard_negatives",
    "l47_quality_classifier",
    "l48_retrieval_eval",
    "l49_quality_score_distribution",
    "l52_perplexity_buckets",
    "l55_classifier_auc",
    "l65_rake_keywords",
    "l66_classifier_calibration",
    "l8b_bm25_search",
    "l8c_tfidf_search",
    "p18_corr_matrix",
    "p22_cramers_v",
    "p25_mutual_info",
    "p26_group_regression",
    "pipeline_quality_curation",
    "q2_min_cost_supplier",
    "q6_revenue_band",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_revenue",
    "q20_part_share_suppliers",
    "q22_dormant_customers",
    "q27_yoy_growth",
    "q33_cohort_ltv",
    "q_pareto_revenue",
    "q_revenue_deciles",
    "q_rfm_segments",
    "r4_left_join_counts",
    "r8_range_join",
    "r11_groupby_agg",
    "r13_conditional_agg",
    "r25_scalar_subquery",
    "recipe_sql_export",
    "st7_stream_static_join",
    "st10_chained_rollup",
    "st13_quality_filter",
    "u2_pandas_udf_zclamp",
    "u3_applyinpandas_groupfill",
    "x1_expectations",
)

#: Rows-only priority: the pass-4 traced rows-only consumers (identity/
#: golden tests pin their semantics; the driver's rows check re-proves
#: row counts when the window reaches them).
ROWS_ONLY_FIRST: tuple[str, ...] = (
    "g1_pagerank",
    "l2d_dedup_clusters",
    "c30_dedup_keep_best",
    # pass-5: bucketed + vectorized span kernels (full-frame l43
    # equality tests pin the semantics)
    "l43b_exact_dup_spans",
    # pass-6: slim band-join fanout + vectorized pair-cosine verify
    # (recall/no-false-positive tests pin the pair set)
    "l4b_embed_neardup_lsh",
)

#: Round-13 holdout (the rotation-exclusion rule, applied in one place
#: instead of 88 scattered deletions): every CORE_FRESH_FIRST name has a
#: changed body in its call chain THIS round, so any prior-round green
#: row certifies a superseded body — they leave the proven set until a
#: driver window re-proves them.
DRIVER_GREEN_PRIOR_ROUNDS = DRIVER_GREEN_PRIOR_ROUNDS - frozenset(
    CORE_FRESH_FIRST + ROWS_ONLY_FIRST
)



def ordered_queries() -> dict[str, dict[str, Any]]:
    """Registry reordered for the driver's bounded correctness window.

    Order: (1) §2-core oracle-backed queries with no prior driver-green
    row, in ``CORE_FRESH_FIRST`` order — these have starved for four
    rounds behind module registration order; (2) rows-only queries not
    yet checked, flagship scale paths first (``ROWS_ONLY_FIRST``);
    (3) remaining fresh oracle-backed queries (late extras);
    (4) queries already proven in a prior round's CORRECTNESS file.
    Within each tier, any unlisted names keep registration order
    (deterministic).
    """
    load_all()
    fresh_oracle: dict[str, dict[str, Any]] = {}
    fresh_rows_only: dict[str, dict[str, Any]] = {}
    proven: dict[str, dict[str, Any]] = {}
    for name, spec in QUERIES.items():
        if name in DRIVER_GREEN_PRIOR_ROUNDS:
            proven[name] = spec
        elif spec["oracle"] is not None:
            fresh_oracle[name] = spec
        else:
            fresh_rows_only[name] = spec

    def prioritized(tier: dict[str, dict[str, Any]], order: tuple[str, ...]) -> dict[str, dict[str, Any]]:
        head = {n: tier[n] for n in order if n in tier}
        tail = {n: s for n, s in tier.items() if n not in head}
        return {**head, **tail}

    core = {n: fresh_oracle[n] for n in CORE_FRESH_FIRST if n in fresh_oracle}
    extras = {n: s for n, s in fresh_oracle.items() if n not in core}
    return {**core, **prioritized(fresh_rows_only, ROWS_ONLY_FIRST), **extras, **proven}
