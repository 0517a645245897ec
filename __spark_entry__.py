"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The real implementation lives in the
``map_reduce_framework_using_python_spark`` package; this module just
adapts the plan registry (plans/core.py) to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from map_reduce_framework_using_python_spark.plans import REGISTRY

#: Last driver-green round per oracle query (CORRECTNESS_r01–r05.json:
#: the latest round whose row was rows+schema+hash green).  The driver
#: hash-checks only the first 50 oracle-bearing queries in ``queries()``
#: order; after round 5 all 203 then-registered oracle queries have been
#: green at least once (208 as of round 6 — the five round-6 additions
#: ns_ccnet_buckets_scaled, ns_paragraph_dedup, ns_paragraph_dedup_apply,
#: ns_ccnet_sample, and ns_epoch_plan are the not-yet-driver-verified
#: oracles and lead the window) — so the window is a REGRESSION BACKSTOP
#: that cycles the
#: STALEST greens first: never-verified (new or reworked this round)
#: queries lead, then ascending last-verified round, oldest first.
#: Maintain by bumping a query's round here when a new CORRECTNESS file
#: lands, and REMOVING a query (→ unverified tier) whenever its output
#: surface changes (e.g. q_window_ntile's round-3 rewrite, or round 5's
#: ns_semdedup_pairs cosine-quantization change). Round-7 removals
#: (plans or oracles changed by the review fixes — values verified
#: unchanged locally, but the driver should re-earn the green):
#: ns_dsir_weights, ns_dsir_resample, ns_corpus_drift, st_dsir_gate
#: (phantom-''-token filter both sides), q_scd2_point_in_time
#: (scd2 multi-update chaining), ns_pii_redact (optional phone
#: country code, oracle generated from the same constant),
#: ns_bigram_rarity (safe bigram helper — the old form crashed on
#: 1-token docs), q_event_session_native (oracle tiebreak),
#: ns_chunk_documents / ns_weighted_sample (empty-doc guards),
#: q_spearman (double rho products), ns_pps_sample (stride guard).
#: Round-7 core-SQL review removals (same rule): q_agg_stats
#: (exact-moment stddev), q_having (decimal HAVING boundary),
#: q_grouping_sets (template-bound DataFrame, no temp view),
#: q_math_funcs (price_ln at 2 dp), q_scalar_subquery (exact avg),
#: q_window_ntile (half_up pct/cume), q05/q03/q10 (customer
#: broadcast hint removed — plan changed, values identical).
#: Round-7 TPC-H review removals: q11_important_stock (exact
#: threshold decimal), q20_part_promotion (rollup from the finer
#: aggregate — one lineitem scan), q21_sole_supplier (the EXISTS
#: half is now genuinely constraining — output changed).
#: Round-7 functions/similarity review removal: ns_token_count_bpe
#: (oracle gained the empty-word CASE guard — values identical).
#: Round-7 dedup-lane review removals: ns_ngram_jaccard_pairs,
#: ns_source_overlap (word_shingles now backtick-quotes its column),
#: ns_paragraph_dedup_apply (clean-text rewrite shared with the
#: incremental apply) — values verified identical at sf0.01.
#: Round-7 ANN review removals: ns_ann_probe_batch (probe table now
#: persisted before the static-bucket collect), ns_ivf_probe_batch
#: (static centroid partition filter) — values identical at sf0.01.
#: Round-7 pipeline review removals: q_session_dynamic_gap (oracle
#: session boundary now strictly ts > prev_end, matching Spark's
#: session_window merge rule — latent divergence), ns_span_dedup
#: (single-scan window-flag form; values identical at sf0.01).
#: Round-7 funnel/extras/quality review removals (values identical at
#: both SFs): q_time_weighted_avg (decimal multiply, no int64
#: overflow), q_try_arithmetic (try_cast matches TRY_CAST), q_window_pct
#: (grouped bucketed-rank form), q_equidepth_histogram (bucket width 5),
#: q_funnel/q_funnel_latency (shared oracle CTE), q_join_asof/_forward/
#: _nearest (shared asof_match composition), q_data_quality
#: (expectations builders).
#: Round-7 shared-operators review removals (values identical at
#: sf0.01): ns_bigram_lm_score(+_broadcast)/ns_repetition_signals
#: (word_bigrams n=0 guard), ns_pagerank_events (zero-weight edges
#: dropped before the division); ns_pii_redact/ns_bigram_rarity/
#: q_scd2_point_in_time were already in the unverified tier.
#: Round-7 pipeline-lane-2 review removals (values identical at both
#: SFs): ns_seeded_shuffle (shuffle_rank stays BIGINT — int cast
#: overflowed past 2^31 docs), ns_dup_clusters/ns_dedup_keep_best
#: (shared _dup_pair_graph + oracle fragment), ns_semdedup_pairs
#: (shared persisted pairing block — one scan, not two);
#: ns_corpus_drift (empty-token filter) was already unverified.
#: Round-7 remaining-query-files review removals (values identical at
#: both SFs): mr_wordcount_pipe (mapper tokenizes single-space + the
#: comma-reserved-delimiter exclusion, oracle twin filter),
#: st_mrtext_stream (scratch reclaimed at exit), q05 bucketed/smj
#: twins (customer hint removed, the r7 rule), q_python_udtf (empty
#: text emits ('',1) like both engines' split), q_dpp_partitioned
#: (shared dir-safe source fingerprint).
_LAST_VERIFIED: dict[str, int] = {
    # round 1 (CORRECTNESS_r01.json) — stalest tier, re-check first
    **dict.fromkeys((
        "ns_dedup_exact", "q03_global_topn", "q17_small_quantity",
        "q18_large_orders", "q_cube", "q_date_funcs", "q_event_dedup",
        "q_event_sessionize",
        "q_event_window_sliding", "q_event_window_tumbling", "q_except",
        "q_intersect", "q_join_anti", "q_join_broadcast", "q_join_full", "q_join_inner", "q_join_left",
        "q_join_range", "q_join_semi", "q_join_theta", "q_json_extract",
        "q_pivot", "q_rollup", "q_string_funcs", "q_topk_per_group", "q_union",
        "q_window_first_last", "q_window_lag_lead", "q_window_range_frame",
        "q_window_rank", "q_window_running",
    ), 1),
    # round 2 (CORRECTNESS_r02.json)
    **dict.fromkeys((
        "ns_cosine_topk", "ns_embedding_near_pairs",
        "ns_embedding_norms", "ns_fingerprint", "ns_lang_stats",
        "ns_language_id", "ns_quality_scores",
        "ns_token_stats", "ns_wordcount", "q02_min_cost_supplier",
        "q04_priority_exists", "q07_nation_volume", "q14_promo_share",
        "q15_top_supplier", "q19_disjunctive", "q22_idle_customers", "q_array_ops", "q_binary_funcs", "q_bool_agg",
        "q_collect_sorted", "q_cross_join", "q_date_spine", "q_except_all",
        "q_explode_outer", "q_explode_udtf", "q_from_json",
        "q_intersect_all", "q_map_funcs", "q_percentile", "q_regexp_funcs", "q_udaf_weighted_avg", "q_udf_scalar_pandas",
        "q_udtf_grouped_map", "q_union_byname", "q_unpivot",
        "q_variant_extract", "q_window_nth", "st_session_window", "st_sliding_window", "st_stateful_totals",
        "st_stream_join", "st_stream_static_enrich", "st_tumbling_window",
    ), 2),
    # round 3 (CORRECTNESS_r03.json)
    **dict.fromkeys((
        "ns_bm25_topk", "ns_kmeans_sizes",
        "ns_phrase_search",
        "q08_market_share",
        "q09_product_profit", "q13_customer_distribution", "q16_parts_supplier_count",
        "q_argmax_struct",
        "q_attribution_last_touch", "q_bfs_distance", "q_corr_stats",
        "q_fuzzy_match",
        "q_incremental_agg", "q_join_range_bigbig", "q_kcore",
        "q_mode_by_group", "q_null_handling",
        "q_ohlc_bars", "q_predicates_misc", "q_profile_stats",
        "q_regression_stats", "q_rolling_ewma", "q_skew_salted", "q_sql_group_by_all",
        "q_sql_pipe_syntax", "q_sql_udf", "q_triangle_count", "q_wau_rolling",
        "q_window_count_distinct", "st_stream_join_left",
    ), 3),
    # round 4 (CORRECTNESS_r04.json) — freshest tier, re-check last.
    # Dropped to re-earn green after round-5 output/plan changes:
    # ns_semdedup_pairs (cosine moved to the half_up 1e-6 grid),
    # ns_bigram_lm_score (broadcast → shuffle-hash model join; values
    # identical but the plan is new), ns_token_count_bpe (real
    # merge-table BPE replaced the regex approximation — values
    # changed).
    **dict.fromkeys((
        "ns_corpus_build", "ns_corpus_report",
        "ns_decontaminate", "ns_event_transitions", "ns_fuzzy_match", "ns_hash_sample",
        "ns_int8_quantize", "ns_mixture_upsample",
        "ns_quality_filter", "ns_sequence_packing",
        "ns_shingle_containment", "ns_source_gini", "ns_stratified_sample",
        "ns_text_normalize", "ns_tfidf",
        "ns_train_val_test", "ns_word_cooccurrence",
        "q00_scan_count", "q01_pricing_summary", "q02_filter_project",
        "q06_forecast_revenue",
        "q12_priority_by_returnflag", "q18_large_orders_bucketed",
        "q_case_expr", "q_count_distinct", "q_distinct",
        "q_distinct_subset", "q_gap_fill", "q_retention",
        "q_sql_lateral_topk", "q_sql_recursive_months", "q_value_histogram",
    ), 4),
    # round 5 (CORRECTNESS_r05.json) — the 50-query window: every row
    # green. Later blocks overwrite earlier ones, so re-verified r1
    # queries (the join lane, set ops, windows) move to tier 5 here.
    # Round-6 note: ns_ccnet_buckets_scaled (new this round, replacing
    # the rows-only percentile_approx twin with a full oracle) is
    # deliberately ABSENT → unverified tier, so the r6 window leads
    # with it.
    **dict.fromkeys((
        "q_from_xml", "q_xml_roundtrip",
        "ns_hash_embed", "ns_token_entropy",
        "ns_temperature_mixture",
        "q_sql_star_except",
        "q_sql_lateral_alias", "q_sql_parameterized", "q_sql_collation",
        "q_sql_listagg", "q_cube", "q_rollup",
        "q_pivot", "q03_global_topn", "q_union",
        "q_intersect", "q_except", "q_string_funcs", "q_date_funcs",
        "q17_small_quantity",
        "q_join_inner", "q_join_broadcast", "q_join_left", "q_join_full",
        "q_join_semi", "q_join_anti", "q_join_range", "q_join_theta",
        "q18_large_orders", "q_window_rank",
        "q_window_lag_lead",
    ), 5),
    # round 6 (CORRECTNESS_r06.json) — all 50 rows green: the five
    # round-6 additions plus the stalest r1/r2 cohort re-verified.
    **dict.fromkeys((
        "ns_cosine_topk", "ns_dedup_exact", "ns_embedding_near_pairs",
        "ns_embedding_norms", "ns_epoch_plan", "ns_fingerprint",
        "ns_lang_stats", "ns_language_id", "ns_paragraph_dedup", "ns_quality_scores", "ns_token_stats", "ns_wordcount",
        "q04_priority_exists", "q14_promo_share", "q19_disjunctive",
        "q_binary_funcs", "q_date_spine", "q_event_dedup",
        "q_event_sessionize",
        "q_event_window_sliding", "q_event_window_tumbling", "q_except_all",
        "q_explode_udtf", "q_from_json", "q_intersect_all", "q_json_extract",
        "q_map_funcs", "q_percentile", "q_topk_per_group",
        "q_udaf_weighted_avg", "q_udf_scalar_pandas", "q_udtf_grouped_map",
        "q_union_byname", "q_unpivot", "q_variant_extract",
        "q_window_first_last", "q_window_range_frame", "q_window_running",
        "st_session_window", "st_sliding_window", "st_stateful_totals",
        "st_stream_join", "st_stream_static_enrich", "st_tumbling_window",
    ), 6),
    # round 7 (CORRECTNESS_r07.json) — all 50 rows green: exactly the
    # queries whose plan/oracle/output changed during the r7 review
    # program. The 10 round-7 additions past this window
    # (ns_epoch_realize, ns_epoch_shards, ns_paragraph_dedup_apply,
    # ns_paragraph_screen, ns_paragraph_screen_apply, ns_pps_sample,
    # ns_span_dedup, q_data_quality, q_dpp_partitioned, q_spearman)
    # stay ABSENT → unverified tier, leading the round-8 window.
    **dict.fromkeys((
        "mr_wordcount_pipe", "ns_ann_probe_batch", "ns_bigram_rarity",
        "ns_chunk_documents", "ns_corpus_drift", "ns_dedup_keep_best",
        "ns_dsir_resample", "ns_dsir_weights", "ns_dup_clusters",
        "ns_ivf_probe_batch", "ns_ngram_jaccard_pairs",
        "ns_pagerank_events", "ns_pii_redact", "ns_repetition_signals",
        "ns_seeded_shuffle", "ns_semdedup_pairs", "ns_source_overlap",
        "ns_token_count_bpe", "ns_weighted_sample",
        "q03_shipping_priority", "q05_local_supplier",
        "q05_local_supplier_bucketed", "q05_local_supplier_smj",
        "q10_returned_items", "q11_important_stock", "q20_part_promotion",
        "q21_sole_supplier", "q_agg_stats", "q_equidepth_histogram",
        "q_event_session_native", "q_funnel", "q_funnel_latency",
        "q_grouping_sets", "q_having", "q_join_asof",
        "q_join_asof_forward", "q_join_asof_nearest", "q_math_funcs",
        "q_python_udtf", "q_scalar_subquery", "q_scd2_point_in_time",
        "q_session_dynamic_gap", "q_time_weighted_avg", "q_try_arithmetic",
        "q_window_ntile", "q_window_pct",
    ), 7),
    # st_mrtext_stream: red in r11 (driver-session resolution race) and
    # hardened in r12 (with_resolution_retry) → deliberately ABSENT, so
    # it leads the r12 window as unverified per the standing rule.
    # round 8 (CORRECTNESS_r08.json) — all 50 rows green: the 11
    # never-verified queries (the r7 additions plus ns_training_capstone,
    # registered mid-window) and the stalest r2/r3 cohort re-verified.
    # No r9 output/oracle changes yet; drop any query whose surface
    # changes this round back to the unverified tier per the standing
    # rule.
    **dict.fromkeys((
        "ns_bm25_topk", "ns_epoch_realize", "ns_epoch_shards",
        "ns_kmeans_sizes", "ns_paragraph_dedup_apply",
        "ns_paragraph_screen", "ns_paragraph_screen_apply",
        "ns_phrase_search", "ns_pps_sample", "ns_span_dedup",
        "q02_min_cost_supplier",
        "q07_nation_volume", "q08_market_share", "q09_product_profit",
        "q13_customer_distribution", "q15_top_supplier",
        "q16_parts_supplier_count", "q22_idle_customers",
        "q_argmax_struct", "q_array_ops",
        "q_attribution_last_touch", "q_bfs_distance", "q_bool_agg",
        "q_collect_sorted", "q_corr_stats", "q_cross_join",
        "q_data_quality", "q_dpp_partitioned", "q_explode_outer",
        "q_incremental_agg", "q_join_range_bigbig", "q_kcore",
        "q_mode_by_group", "q_null_handling",
        "q_predicates_misc", "q_regexp_funcs", "q_regression_stats",
        "q_skew_salted", "q_sql_group_by_all",
        "q_sql_pipe_syntax", "q_sql_udf", "q_triangle_count",
        "q_wau_rolling", "q_window_count_distinct", "q_window_nth",
        "st_stream_join_left",
    ), 8),
    # round 9 (CORRECTNESS_r09.json) — all 50 rows green: the 7
    # never-verified r9 additions (the decontamination matrix, the
    # paragraph trim, ties top-k, the stream-join closers) plus the
    # stalest r3/r4 cohort re-verified. Queries whose output surface
    # changes in r10 drop back to the unverified tier per the rule.
    **dict.fromkeys((
        "ns_corpus_build", "ns_corpus_report", "ns_decontaminate",
        "ns_doc_decontaminate", "ns_event_transitions", "ns_fuzzy_match",
        "ns_hash_sample", "ns_int8_quantize", "ns_mixture_upsample",
        "ns_paragraph_trim", "ns_quality_filter",
        "ns_semantic_decontaminate", "ns_sequence_packing",
        "ns_shingle_containment", "ns_source_gini", "ns_stratified_sample",
        "ns_text_normalize", "ns_tfidf", "ns_train_val_test",
        "ns_word_cooccurrence", "q00_scan_count", "q01_pricing_summary",
        "q02_filter_project", "q03_global_topn", "q06_forecast_revenue",
        "q12_priority_by_returnflag", "q18_large_orders_bucketed",
        "q_case_expr", "q_count_distinct", "q_cube", "q_distinct",
        "q_distinct_subset", "q_except", "q_fuzzy_match", "q_gap_fill",
        "q_intersect", "q_ohlc_bars", "q_pivot", "q_profile_stats",
        "q_retention", "q_rolling_ewma", "q_rollup", "q_sql_lateral_topk",
        "q_sql_recursive_months", "q_topk_with_ties", "q_union",
        "q_value_histogram", "st_semantic_decontaminate",
        "st_stream_join_full", "st_stream_join_semi",
    ), 9),
    # round 10 (CORRECTNESS_r10.json) — all 50 rows green: the five
    # never-verified r10 additions (the span lane + ns_bpe_encode) plus
    # the stalest r5/r6 cohort re-verified. Queries whose output surface
    # changes in r11 drop back to the unverified tier per the rule.
    **dict.fromkeys((
        "ns_bpe_encode", "ns_cosine_topk",
        "ns_dedup_exact", "ns_embedding_norms", "ns_exact_substring_apply",
        "ns_exact_substring_spans", "ns_fingerprint", "ns_hash_embed",
        "ns_lang_stats", "ns_language_id", "ns_quality_scores",
        "ns_span_screen", "ns_span_screen_apply", "ns_temperature_mixture",
        "ns_token_entropy", "ns_token_stats", "ns_wordcount",
        "q17_small_quantity", "q18_large_orders", "q_date_funcs",
        "q_event_dedup", "q_event_sessionize", "q_event_window_sliding",
        "q_event_window_tumbling", "q_explode_udtf", "q_from_xml",
        "q_join_anti", "q_join_broadcast", "q_join_full", "q_join_inner",
        "q_join_left", "q_join_range", "q_join_semi", "q_join_theta",
        "q_json_extract", "q_sql_collation", "q_sql_lateral_alias",
        "q_sql_listagg", "q_sql_parameterized", "q_sql_star_except",
        "q_string_funcs", "q_topk_per_group", "q_variant_extract",
        "q_window_first_last", "q_window_lag_lead", "q_window_range_frame",
        "q_window_rank", "q_window_running", "q_xml_roundtrip",
    ), 10),
    # round 11 (CORRECTNESS_r11.json) — 49 of 50 rows green (the one
    # red, st_mrtext_stream, was the session-clone resolution race —
    # hardened in r12 and dropped to the unverified tier above): the
    # six r11 additions plus the stalest r7 cohort re-verified.
    **dict.fromkeys((
        "mr_wordcount_pipe", "ns_ann_delete_probe",
        "ns_embedding_near_pairs", "ns_epoch_plan",
        "ns_ivfpq_filtered_lloyd", "ns_ivfpq_probe_lloyd",
        "ns_ngram_jaccard_pairs", "ns_paragraph_dedup",
        "ns_paragraph_retract_screen", "ns_source_overlap",
        "ns_weighted_sample", "q03_shipping_priority",
        "q04_priority_exists", "q05_local_supplier", "q10_returned_items",
        "q14_promo_share", "q19_disjunctive", "q_agg_stats",
        "q_binary_funcs", "q_date_spine", "q_event_session_native",
        "q_except_all", "q_from_json", "q_grouping_sets", "q_having",
        "q_intersect_all", "q_join_asof", "q_map_funcs", "q_math_funcs",
        "q_pandas_api_agg", "q_percentile", "q_scalar_subquery",
        "q_udaf_weighted_avg", "q_udf_scalar_pandas", "q_udtf_grouped_map",
        "q_union_byname", "q_unpivot", "q_window_ntile",
        "st_paragraph_retract", "st_session_window", "st_sliding_window",
        "st_stateful_totals", "st_stream_join", "st_stream_static_enrich",
        "st_tumbling_window",
    ), 11),
    # round 12 (CORRECTNESS_r12.json) — 50 of 50 rows green: the r12
    # additions (Spark 4 surface wave, streaming sink/state-source,
    # hybrid RRF, corpus snapshot diff, shuffle-hash join) plus the
    # re-earned st_mrtext_stream and the stalest tier-7 cohort.
    **dict.fromkeys((
        "ns_ann_probe_batch", "ns_bigram_rarity", "ns_chunk_documents",
        "ns_corpus_drift", "ns_corpus_snapshot_diff", "ns_dedup_keep_best",
        "ns_dsir_resample", "ns_dsir_weights", "ns_dup_clusters",
        "ns_hybrid_rrf", "ns_ivf_probe_batch", "ns_pagerank_events",
        "ns_pii_redact", "ns_repetition_signals", "ns_seeded_shuffle",
        "ns_semdedup_pairs", "ns_token_count_bpe", "q05_local_supplier_bucketed",
        "q05_local_supplier_smj", "q07_nation_volume", "q11_important_stock",
        "q20_part_promotion", "q21_sole_supplier", "q_equidepth_histogram",
        "q_funnel", "q_funnel_latency", "q_join_asof_forward",
        "q_join_asof_nearest", "q_join_shuffle_hash", "q_lateral_join_api",
        "q_map_higher_order", "q_observe_metrics", "q_pandas_api_cumsum",
        "q_python_udtf", "q_scd2_point_in_time", "q_session_dynamic_gap",
        "q_sql_exec_immediate", "q_sql_scripting", "q_sql_variables",
        "q_time_weighted_avg", "q_transpose", "q_try_arithmetic",
        "q_udtf_polymorphic", "q_udtf_table_arg", "q_window_pct",
        "st_mrtext_sink", "st_mrtext_stream",
        "st_state_read", "st_stream_join_left",
    ), 12),
    # round 15 note (optimization round 2): the r14-verdict item-4
    # queries — the six whose lanes gained the r14 persists
    # (ns_bigram_lm_score + _broadcast, ns_ccnet_buckets + _scaled,
    # ns_ccnet_sample, ns_training_capstone, st_dsir_gate) — were
    # REMOVED from their tiers below so they lead the r15 window: they
    # changed in r14 but rotated out of the r14 driver window before
    # the change landed. ns_semantic_decontaminate_kmeans_lloyd is
    # likewise ABSENT from tier 14 (its routing/scoring tail moved to
    # the r15 Arrow kernel — bit-identical output, verified, but the
    # plan is new, so the driver should re-earn the green per the
    # standing rule). Same rule for the r15 stats-lane restructure:
    # q_spearman / q_mad_outliers / q_assoc_rules (histogram-rank
    # forms — outputs verified bit-identical at all three SFs, plans
    # new) were removed from their tiers.
    # round 13 (CORRECTNESS_r13.json) — 50 of 50 rows green: the two
    # r13 promotions (ns_lsh_topk_indexed, ns_ivf_topk_indexed) plus
    # the stalest tier-7/8 cohort re-verified. Queries whose output
    # surface changes in r14 drop back to the unverified tier per the
    # standing rule.
    **dict.fromkeys((
        "ns_bm25_topk", "ns_epoch_realize", "ns_epoch_shards",
        "ns_ivf_topk_indexed", "ns_kmeans_sizes", "ns_lsh_topk_indexed",
        "ns_paragraph_dedup_apply", "ns_paragraph_screen",
        "ns_paragraph_screen_apply", "ns_phrase_search", "ns_pps_sample",
        "ns_span_dedup", "q02_min_cost_supplier",
        "q08_market_share", "q09_product_profit",
        "q13_customer_distribution", "q15_top_supplier",
        "q16_parts_supplier_count", "q22_idle_customers",
        "q_argmax_struct", "q_array_ops",
        "q_attribution_last_touch", "q_bfs_distance", "q_bool_agg",
        "q_collect_sorted", "q_corr_stats", "q_cross_join",
        "q_data_quality", "q_dpp_partitioned", "q_explode_outer",
        "q_incremental_agg", "q_join_range_bigbig", "q_kcore",
        "q_mode_by_group", "q_null_handling",
        "q_predicates_misc", "q_regexp_funcs", "q_regression_stats",
        "q_skew_salted", "q_sql_group_by_all",
        "q_sql_pipe_syntax", "q_sql_udf", "q_triangle_count",
        "q_wau_rolling", "q_window_count_distinct", "q_window_nth",
    ), 13),
    # round 14 (CORRECTNESS_r14.json) — 50 of 50 rows green: the six
    # never-driver-verified partial-build-round promotions plus the
    # stalest r9 cohort. ns_semantic_decontaminate_kmeans_lloyd was
    # green in this window but is deliberately ABSENT (r15 Arrow-kernel
    # plan rework — see the round-15 note above).
    **dict.fromkeys((
        "ns_corpus_build", "ns_corpus_report", "ns_decontaminate",
        "ns_doc_decontaminate", "ns_event_transitions", "ns_fuzzy_match",
        "ns_hash_sample", "ns_int8_quantize", "ns_minhash_lsh_pairs_md5",
        "ns_mixture_upsample", "ns_pq_topk_lloyd", "ns_quality_filter",
        "ns_semantic_decontaminate", "ns_semdedup_sdc_hier_lloyd",
        "ns_semdedup_sdc_hier_lloyd_reps", "ns_sequence_packing",
        "ns_shingle_containment", "ns_source_gini", "ns_stratified_sample",
        "ns_text_normalize", "ns_tfidf", "ns_train_val_test",
        "ns_word_cooccurrence", "q00_scan_count", "q01_pricing_summary",
        "q02_filter_project", "q03_global_topn", "q06_forecast_revenue",
        "q12_priority_by_returnflag", "q18_large_orders_bucketed",
        "q_case_expr", "q_count_distinct", "q_cube", "q_distinct",
        "q_distinct_subset", "q_except", "q_gap_fill", "q_intersect",
        "q_pivot", "q_retention", "q_rollup", "q_sql_lateral_topk",
        "q_sql_recursive_months", "q_topk_with_ties", "q_union",
        "q_value_histogram", "st_semantic_decontaminate",
        "st_stream_join_full", "st_stream_join_semi",
    ), 14),
}


def _rotated() -> list[str]:
    """Registry names in driver-window order, stalest first.

    Tiers (stable registration order within each):
    1. oracle-bearing, no current driver green row — new this round or
       output-changed since last green (the hard signal)
    2. oracle-bearing, verified — ascending last-green round, so the
       50-query window re-checks the longest-unchecked greens first
       (regression backstop that sweeps the whole surface over rounds)
    3. rows-only queries (no oracle) — window doesn't apply to them
    """
    unverified = [n for n, q in REGISTRY.items()
                  if q.oracle is not None and n not in _LAST_VERIFIED]
    verified = sorted(
        (n for n, q in REGISTRY.items()
         if q.oracle is not None and n in _LAST_VERIFIED),
        key=lambda n: _LAST_VERIFIED[n],
    )
    rows_only = [n for n, q in REGISTRY.items() if q.oracle is None]
    return unverified + verified + rows_only


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    return REGISTRY["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: REGISTRY[name].fn for name in _rotated()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return {name: q.oracle for name, q in REGISTRY.items() if q.oracle is not None}
