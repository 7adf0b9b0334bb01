"""Registry-derived gate membership (VERDICT r7 item 6).

The standing gates (sf0.1 strict sweep, vanilla-JVM driver parity,
AQE-off invariance, partition-width invariance) used to be hand-listed:
a new registration could silently skip all of them. These meta-tests
derive the required membership FROM the registry, so:

- a query that has never held a driver-green row cannot exist without a
  vanilla-JVM pre-flight slot (the r4 seam lesson: local green, driver
  red);
- every registered query must be explicitly triaged into the sf0.1
  strict sweep or the exempt list below — "forgot to think about
  10× scale behavior" is now a test failure, not a silent skip;
- no gate list can carry a stale name after a rename.

The AQE-off and partition-invariance gates stay deliberately SAMPLED
(one representative per hot plan family) — exhaustive membership there
would triple suite time for no marginal signal — so for those we only
pin that the samples exist.
"""

from __future__ import annotations

from bc_proj3_spark.registry import _SHOWCASE_FIRST, _VERIFIED_ROUND, all_queries


def _registry_names() -> set[str]:
    return set(all_queries())


def test_rotation_map_and_staging_are_live_names():
    reg = _registry_names()
    assert set(_VERIFIED_ROUND) <= reg, sorted(set(_VERIFIED_ROUND) - reg)
    assert set(_SHOWCASE_FIRST) <= reg, sorted(set(_SHOWCASE_FIRST) - reg)


def test_never_driver_verified_queries_are_preflighted():
    """Every query without a driver-green row must be replayed by the
    vanilla-JVM parity gate before it can enter a driver prefix."""
    from tests.test_driver_parity import PARITY_QUERIES, STRICT_VALUE_QUERIES

    reg = _registry_names()
    preflight = set(PARITY_QUERIES) | set(STRICT_VALUE_QUERIES)
    assert preflight <= reg, sorted(preflight - reg)
    never = reg - set(_VERIFIED_ROUND)
    missing = sorted(never - preflight)
    assert not missing, (
        f"never-driver-verified queries missing a vanilla-JVM pre-flight "
        f"slot (add to test_driver_parity.STRICT_VALUE_QUERIES): {missing}"
    )


def test_sampled_invariance_gates_name_live_queries():
    from tests.test_partition_invariance import INVARIANCE_QUERIES
    from tests.test_round7_ops import AQE_OFF_QUERIES

    reg = _registry_names()
    assert set(AQE_OFF_QUERIES) <= reg, sorted(set(AQE_OFF_QUERIES) - reg)
    assert set(INVARIANCE_QUERIES) <= reg, sorted(
        set(INVARIANCE_QUERIES) - reg
    )


#: Queries exempt from the sf0.1 strict sweep, with the triage reason
#: per family. Exempt means: no iterative fixpoint, no accumulating
#: recursion, and no double arithmetic whose rounding lattice a 10×
#: corpus could push onto a .5 seam — the op is a single-pass
#: projection/aggregate/join whose exactness argument is
#: scale-independent (exact ints, exact decimals, or ROUND applied to
#: a single terminal IEEE division). Everything else belongs in
#: tests/test_sf01_strict.py::SF01_QUERIES.
SF01_EXEMPT: frozenset[str] = frozenset(
    # TPC-H q1-q22 + sql1-sql7: decimal-exact scan/join/agg plans; the
    # only doubles are terminal ROUND-wrapped divisions
    [f"q{i}_" + s for i, s in [
        (1, "pricing_summary"), (2, "min_cost_supplier"),
        (3, "shipping_priority"), (4, "order_priority"),
        (5, "local_supplier_volume"), (6, "forecast_revenue"),
        (7, "volume_shipping"), (8, "market_share"), (9, "product_profit"),
        (10, "returned_items"), (11, "important_part_value"),
        (12, "shipping_delay"), (13, "customer_distribution"),
        (14, "promo_revenue"), (15, "top_supplier"),
        (16, "supplier_diversity"), (17, "small_quantity_revenue"),
        (18, "large_volume_customer"), (19, "disjunctive_revenue"),
        (20, "dominant_share_shippers"), (21, "sole_spoiler_suppliers"),
        (22, "global_sales_opportunity"),
    ]]
    + [
        "sql1_priority_revenue", "sql2_top_order_per_customer",
        "sql3_exists_decorrelation", "sql4_lateral_topk",
        "sql5_recursive_spine", "sql6_null_aware_notin",
        "sql7_scalar_subqueries",
        # aggregates/windows on exact ints/decimals (terminal ROUND only)
        "a1_pivot_event_matrix", "a2_value_percentiles",
        "a3_ordered_collections", "a4_multi_distinct", "a5_unpivot_melt",
        "a6_histogram_quantiles", "a7_trimmed_mean", "a8_correlation",
        "a9_vector_hof", "a10_map_roundtrip", "a12_mode_per_group",
        "a13_weighted_median", "a14_mad_outliers",
        "a15_distribution_moments", "a17_winsorized_mean",
        "r1_rollup_subtotals", "r2_cube_crosstab", "r3_grouping_sets",
        "w1_top_orders_per_customer", "w2_spend_deciles",
        "w3_trailing_hour_range", "w4_purchase_streaks",
        "w5_runner_up_order", "w6_topk_with_ties",
        "u1_account_ledger_union", "u2_set_operations", "u3_bag_set_ops",
        "h1_hierarchy_shares", "o5_value_outliers", "o6_pareto_frontier",
        "o7_grid_density", "mb1_copurchase_pairs", "ret1_cohort_retention",
        "rfm1_customer_segments", "imp1_median_impute",
        "gdpr1_erasure_footprint", "gen1_range_source",
        # event analytics: exact-int counts over windows; asof/funnel
        # joins; ROUND-terminal rates
        "e1_hourly_rollup", "e2_sessionization", "e3_asof_attribution",
        "e4_user_value_trend", "e4b_trend_arrow", "e5_daily_retention",
        "e6_json_props", "e7_funnel", "e8_session_overlap",
        "e9_rolling_active_users", "e10_conversion_latency",
        "e11_transition_matrix", "e12_rolling_anomaly",
        "e13_constrained_funnel", "e14_variant_props",
        "e15_threshold_crossings", "e16_bot_regularity",
        "e17_linear_attribution", "e18_session_paths",
        "e21_peak_concurrency", "e22_missing_hours", "e25_did_uplift",
        # dedup/similarity: hash identities and exact band keys; the
        # iterative/calibration members (d11, s5/s6 updates, semantic
        # funnels) are IN the sf0.1 sweep
        "d1_exact_dedup_groups", "d2_dedup_survivors", "d3_jaccard_pairs",
        "d4_minhash_lsh_pairs", "d5_simhash_signatures", "d6_dedup_corpus",
        "d7_decontaminate", "d8_incremental_dedup", "d9_dedup_report",
        "d10_containment_pairs", "d12_semdedup",
        "d13_hamming_neardup_pairs", "d14_span_coverage",
        "d15_ngram_decontaminate", "d16_cross_split_leakage",
        "s1_knn_bruteforce", "s2_ann_lsh", "s3_cosine_neardup_pairs",
        "s4_ivf_probe", "s6_kmeans_update",
        "er2_canonical_assignment", "er3_canonical_roots",
        "cc1_dedup_components", "cc5_cluster_sizes", "tc1_triangle_census",
        "g1_gram_matrix", "g2_centroid_shift", "g10_clustering_coefficient",
        # sketches: exact integer register/bit states; estimates are
        # terminal single divisions
        "sk1_countmin_sketch", "sk2_cms_estimate", "sk3_hll_registers",
        "sk4_hll_estimate", "sk5_bloom_bits", "sk6_bloom_membership",
        "sk7_bottomk_quantile", "sk8_hll_shard_merge", "sk9_ams_f2",
        "sk10_kmv_intersection", "sk13_countsketch",
        "bmp1_bitmap_intersect", "bmp2_bitmap_distinct_rollup",
        "bf1_bloom_semijoin", "sj1_salted_user_join",
        # CDC / incremental: exact key joins + window versioning
        "cdc1_snapshot_diff", "cdc2_scd2_history", "cdc3_apply_changes",
        "cdc4_incremental_agg", "cdc5_pointintime_join",
        # streaming drains: held to exact equality with batch oracles
        "st1_stream_window_counts", "st2_stateful_user_totals",
        "st3_stream_session_windows", "st4_stream_dedup",
        "st5_stream_stream_join", "st6_stream_append_windows",
        "st7_stream_static_join", "st8_stream_apply_changes",
        "st9_stream_hll_registers", "st10_stream_sliding_windows",
        "st11_stream_countsketch", "st12_stream_decontaminate",
        "st13_stream_admission_ledger",
        # text stats: exact token counts; log-lattice members (t10,
        # t16, t21, t25, t27, t28...) are IN the sweep
        "t1_language_id", "t2_quality_score", "t3_token_histogram",
        "t4_doc_fingerprint", "t5_token_count", "t6_ngram_language_id",
        "t7_rolling_fingerprint", "t8_repetition",
        "t9_top_token_fraction", "t10_unigram_logprob",
        "t11_pmi_collocations", "t12_bpe_merge_pairs",
        "t13_langid_confusion", "t14_tfidf_topterms",
        "t15_skipgram_pairs", "t16_bigram_logprob", "t17_pii_scrub",
        "t18_token_entropy", "t19_oov_rate", "t20_shingle_novelty",
        "t21_zipf_slope", "t22_readability", "t24_lexical_diversity",
        "t26_ngram_coverage", "bm1_bm25_topk", "hs1_hybrid_rrf",
        "mi1_mutual_information",
        # sampling/splits/packing: pure hash expressions, zero RNG
        "sp1_split_assign", "sp2_stratified_sample", "sp3_corpus_mix_quota",
        "sp4_sequence_packing", "sp5_temperature_mix",
        "sp6_weighted_sample", "sp7_rendezvous_assign", "sp8_kfold_assign",
        "sp9_leakage_safe_split", "sp11_epoch_shuffle",
        "sp13_mix_rebalance", "sp14_epoch_upsample",
        "sp15_length_bucketing",
        # quality/profiling/labeling: exact counts + terminal rates
        "dq1_expectations", "dq2_referential_integrity",
        "dq3_benford_digits", "dq4_event_freshness", "dq5_k_anonymity",
        "dq6_psi_drift", "dq7_order_reconciliation", "dq8_l_diversity",
        "dq9_t_closeness", "dq10_quality_gates",
        "prof1_table_stats", "prof2_functional_deps",
        "prof3_corpus_datasheet", "lab1_weak_labels",
        "lab2_lf_diagnostics", "lab3_annotator_agreement",
        "f1_quality_filter", "fe1_feature_vector", "fe3_target_encoding",
        "fe4_feature_hashing", "dp1_dp_counts", "dp2_dp_mean",
        "stat1_chi2_cells", "stat2_welch_ttest",
        "cal1_reliability_bins",
        # multimodal / chunking / pipelines: byte-exact identities
        "m1_media_metadata", "m2_decode_features", "m3_frame_sample",
        "m4_media_dedup", "m5_token_budget", "m6_multimodal_packing",
        "ch1_chunk_documents", "ch2_duplicate_chunks",
        "ch3_content_defined_chunks", "pipe1_corpus_build",
        "pipe2_ingest_manifest", "pipe3_recipe_attrition",
        # ev1/sp16: exact-integer counts + one division by a
        # compile-time constant — nothing accumulates with scale
        "ev1_pass_at_k", "sp16_pack_efficiency",
        # time-series on exact ints/decimals (the moment-product and
        # fixpoint members ts5-ts7/ts9/ts10/ts2 are IN the sweep)
        "ts1_gap_fill", "ts3_ohlc_bars", "ts4_twap", "ts8_dispersion",
        # reference-pipeline parity queries: string/date projections
        "sv1_scholar_date_derivation", "sv2_arxiv_id_parse",
        "sv3_struct_audit", "d1_surrogate_key", "d2_token_stats",
        "d3_term_scoring",
        # round-13: exact-integer counts + one terminal division by a
        # literal budget / exact-int total — nothing accumulates with
        # scale (sp16/ev1 class); st14 is a streaming drain held to an
        # exact-integer batch oracle
        "sp17_token_budget_mix", "m7_modality_balance",
        "st14_stream_token_budget",
    ]
)


def test_every_query_is_triaged_for_the_sf01_gate():
    """New registrations must be explicitly placed: either in the
    sf0.1 strict sweep (iterative / accumulating / double-heavy) or in
    SF01_EXEMPT above with a family reason. No third bucket."""
    from tests.test_sf01_strict import SF01_QUERIES

    reg = _registry_names()
    members = set(SF01_QUERIES)
    both = sorted(members & SF01_EXEMPT)
    assert not both, f"queries both swept and exempt: {both}"
    untriaged = sorted(reg - members - SF01_EXEMPT)
    assert not untriaged, (
        f"queries not triaged for the sf0.1 gate (add to "
        f"SF01_QUERIES or SF01_EXEMPT with a reason): {untriaged}"
    )
    stale = sorted((members | SF01_EXEMPT) - reg)
    assert not stale, f"stale names in sf0.1 triage: {stale}"
