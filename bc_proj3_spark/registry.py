"""Query registry: the engine's public query surface.

Every implemented operator/query from SURVEY.md §2 registers here as a
:class:`QuerySpec` — a Spark DataFrame builder plus (when the semantics
are SQL-expressible) the equivalent DuckDB oracle SQL. ``__spark_entry__``
exposes this registry to the correctness driver.

Conventions that make the driver's order-insensitive value-hash compare
work (see functions/numeric.py for the full rationale):

- every computed/aggregate column is aliased to the SAME name in the
  Spark builder and the oracle SQL;
- double aggregates accumulate in exact decimal, cast back to double;
- top-k queries use a total order (unique-key tiebreaker) so both
  engines select the same rows.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None  # DuckDB SQL over the pre-registered table views
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[Builder], Builder]:
    """Decorator: add a query builder to the registry."""

    def wrap(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, builder=fn, oracle=oracle, doc=doc or fn.__doc__ or "")
        return fn

    return wrap


#: Modules whose import side-effect is query registration. Kept as dotted
#: strings (not a star import) so one missing/broken optional module can
#: never take down the whole registry again (round-1 failure mode).
_REGISTERING_MODULES = (
    "bc_proj3_spark.plans.tpch",
    "bc_proj3_spark.plans.events",
    "bc_proj3_spark.plans.docpipeline",
    "bc_proj3_spark.plans.silverops",
    "bc_proj3_spark.plans.aggfuncs",
    "bc_proj3_spark.plans.sqlapi",
    "bc_proj3_spark.operators.textstats",
    "bc_proj3_spark.operators.ranking",
    "bc_proj3_spark.operators.sampling",
    "bc_proj3_spark.operators.sketch",
    "bc_proj3_spark.operators.dedup",
    "bc_proj3_spark.operators.linkage",
    "bc_proj3_spark.operators.chunking",
    "bc_proj3_spark.operators.graph",
    "bc_proj3_spark.operators.cdc",
    "bc_proj3_spark.operators.corpus",
    "bc_proj3_spark.operators.similarity",
    "bc_proj3_spark.operators.skew",
    "bc_proj3_spark.operators.linalg",
    "bc_proj3_spark.operators.quality",
    "bc_proj3_spark.operators.profile",
    "bc_proj3_spark.operators.multimodal",
    "bc_proj3_spark.operators.mltrain",
    "bc_proj3_spark.operators.llmeval",
    "bc_proj3_spark.streaming.incremental",
)


#: Latest driver round whose CORRECTNESS_r{N}.json carries a green
#: hash-verified row for each query. External verifiers check a bounded
#: prefix of the registry (~50 queries/round), so :func:`all_queries`
#: orders stalest-evidence-first: queries verified longest ago (or
#: never — round 0) rotate into the next round's prefix, keeping every
#: row at most ~2 rounds old. Update this map from CORRECTNESS_r{N}.json
#: each round; queries absent from the map sort first (round 0).
_VERIFIED_ROUND: dict[str, int] = {
    # Minted from CORRECTNESS_r01..r10 by tools/rotation.py (round 11 /
    # second optimization round). r10 was 50/50 green and rotation.py
    # reports 0 RED and 0 never-verified, so every registered query
    # carries a driver-verified row. Queries whose PLANS this round
    # rewrote (dedup funnel, map-side band pairs, single-tokenize
    # t-family, s3 single-scan, the local_rows_df result frames, st8's
    # per-batch trim) are pinned at -1 — the tc1 precedent — so they
    # re-enter the driver prefix ahead of the r4-era stalest block and
    # their r10 evidence (builder-side for pi1/pi2/e24/bt1/hs2, see
    # r10 VERDICT item 7) is re-earned driver-side immediately.
    # plan rewritten this round (r11) -> re-verify first
    "d4_minhash_lsh_pairs": -1,
    "d6_dedup_corpus": -1,
    "d8_incremental_dedup": -1,
    "d9_dedup_report": -1,
    "d11_minhash_calibration": -1,
    "d13_hamming_neardup_pairs": -1,
    "t11_pmi_collocations": -1,
    "t14_tfidf_topterms": -1,
    "t15_skipgram_pairs": -1,
    "s3_cosine_neardup_pairs": -1,
    "pi1_power_iteration": -1,
    "pi2_spectral_gap": -1,
    "e24_markov_stationary": -1,
    "bt1_bradley_terry": -1,
    "hs2_mmr_rerank": -1,
    "s12_centroid_dendrogram": -1,
    "sp13_mix_rebalance": -1,
    "sp14_epoch_upsample": -1,
    "g6_kcore": -1,
    "g11_label_propagation": -1,
    "t27_bpe_learn": -1,
    "st8_stream_apply_changes": -1,
    # round 4 (CORRECTNESS_r04.json)
    "cc1_dedup_components": 4,
    "cdc1_snapshot_diff": 4,
    "cdc2_scd2_history": 4,
    "cdc3_apply_changes": 4,
    "e1_hourly_rollup": 4,
    "e3_asof_attribution": 4,
    "e5_daily_retention": 4,
    "e6_json_props": 4,
    "q11_important_part_value": 4,
    "q12_shipping_delay": 4,
    "q15_top_supplier": 4,
    "q16_supplier_diversity": 4,
    "q17_small_quantity_revenue": 4,
    "q19_disjunctive_revenue": 4,
    "q20_dominant_share_shippers": 4,
    "q21_sole_spoiler_suppliers": 4,
    "q2_min_cost_supplier": 4,
    "q8_market_share": 4,
    "r1_rollup_subtotals": 4,
    "sk1_countmin_sketch": 4,
    "sk2_cms_estimate": 4,
    "sk3_hll_registers": 4,
    "sk4_hll_estimate": 4,
    "sp1_split_assign": 4,
    "sp2_stratified_sample": 4,
    "sp3_corpus_mix_quota": 4,
    "sp4_sequence_packing": 4,
    "t6_ngram_language_id": 4,
    "t8_repetition": 4,
    "t9_top_token_fraction": 4,
    "u2_set_operations": 4,
    # round 5 (CORRECTNESS_r05.json)
    "a10_map_roundtrip": 5,
    "a9_vector_hof": 5,
    "bmp1_bitmap_intersect": 5,
    "cc5_cluster_sizes": 5,
    "cdc5_pointintime_join": 5,
    "d10_containment_pairs": 5,
    "dq4_event_freshness": 5,
    "dq5_k_anonymity": 5,
    "dq7_order_reconciliation": 5,
    "e14_variant_props": 5,
    "e15_threshold_crossings": 5,
    "e16_bot_regularity": 5,
    "e17_linear_attribution": 5,
    "e2_sessionization": 5,
    "e4_user_value_trend": 5,
    "e4b_trend_arrow": 5,
    "e8_session_overlap": 5,
    "g1_gram_matrix": 5,
    "h1_hierarchy_shares": 5,
    "hs1_hybrid_rrf": 5,
    "mb1_copurchase_pairs": 5,
    "o7_grid_density": 5,
    "pipe1_corpus_build": 5,
    "sk7_bottomk_quantile": 5,
    "sk8_hll_shard_merge": 5,
    "sk9_ams_f2": 5,
    "sp7_rendezvous_assign": 5,
    "sql4_lateral_topk": 5,
    "sql5_recursive_spine": 5,
    "sql6_null_aware_notin": 5,
    "sql7_scalar_subqueries": 5,
    "st1_stream_window_counts": 5,
    "st3_stream_session_windows": 5,
    "st9_stream_hll_registers": 5,
    "t17_pii_scrub": 5,
    "t21_zipf_slope": 5,
    "ts3_ohlc_bars": 5,
    "w4_purchase_streaks": 5,
    "w5_runner_up_order": 5,
    "w6_topk_with_ties": 5,
    # round 6 (CORRECTNESS_r06.json)
    "a12_mode_per_group": 6,
    "a13_weighted_median": 6,
    "a15_distribution_moments": 6,
    "a5_unpivot_melt": 6,
    "a6_histogram_quantiles": 6,
    "a7_trimmed_mean": 6,
    "a8_correlation": 6,
    "cc3_pagerank": 6,
    "d12_semdedup": 6,
    "dq1_expectations": 6,
    "dq6_psi_drift": 6,
    "e10_conversion_latency": 6,
    "e11_transition_matrix": 6,
    "e12_rolling_anomaly": 6,
    "e13_constrained_funnel": 6,
    "e18_session_paths": 6,
    "e19_cusum_changepoint": 6,
    "e9_rolling_active_users": 6,
    "fe3_target_encoding": 6,
    "gen1_range_source": 6,
    "lab2_lf_diagnostics": 6,
    "m5_token_budget": 6,
    "prof2_functional_deps": 6,
    "prof3_corpus_datasheet": 6,
    "r2_cube_crosstab": 6,
    "r3_grouping_sets": 6,
    "ret1_cohort_retention": 6,
    "rfm1_customer_segments": 6,
    "s6_kmeans_update": 6,
    "sk10_kmv_intersection": 6,
    "sp8_kfold_assign": 6,
    "sp9_leakage_safe_split": 6,
    "sql2_top_order_per_customer": 6,
    "sql3_exists_decorrelation": 6,
    "st10_stream_sliding_windows": 6,
    "stat1_chi2_cells": 6,
    "stat2_welch_ttest": 6,
    "t12_bpe_merge_pairs": 6,
    "t18_token_entropy": 6,
    "t19_oov_rate": 6,
    "t20_shingle_novelty": 6,
    "ts1_gap_fill": 6,
    "ts2_ewma": 6,
    "ts4_twap": 6,
    "u3_bag_set_ops": 6,
    "w2_spend_deciles": 6,
    "w3_trailing_hour_range": 6,
    # round 7 (CORRECTNESS_r07.json)
    "bf1_bloom_semijoin": 7,
    "bm1_bm25_topk": 7,
    "bmp2_bitmap_distinct_rollup": 7,
    "cal1_reliability_bins": 7,
    "cc2_star_components": 7,
    "cc4_bfs_distance": 7,
    "cdc4_incremental_agg": 7,
    "ch1_chunk_documents": 7,
    "ch2_duplicate_chunks": 7,
    "cur1_curriculum_schedule": 7,
    "dq2_referential_integrity": 7,
    "dq3_benford_digits": 7,
    "er1_fuzzy_name_pairs": 7,
    "er2_canonical_assignment": 7,
    "er3_canonical_roots": 7,
    "f1_quality_filter": 7,
    "fe1_feature_vector": 7,
    "fe2_train_scaled": 7,
    "g2_centroid_shift": 7,
    "gdpr1_erasure_footprint": 7,
    "imp1_median_impute": 7,
    "lab1_weak_labels": 7,
    "m4_media_dedup": 7,
    "mi1_mutual_information": 7,
    "o5_value_outliers": 7,
    "o6_pareto_frontier": 7,
    "prof1_table_stats": 7,
    "s5_kmeans_assign": 7,
    "sj1_salted_user_join": 7,
    "sk5_bloom_bits": 7,
    "sk6_bloom_membership": 7,
    "sp11_epoch_shuffle": 7,
    "sp5_temperature_mix": 7,
    "sp6_weighted_sample": 7,
    "st4_stream_dedup": 7,
    "st5_stream_stream_join": 7,
    "st6_stream_append_windows": 7,
    "st7_stream_static_join": 7,
    "t10_unigram_logprob": 7,
    "t13_langid_confusion": 7,
    "t16_bigram_logprob": 7,
    "t22_readability": 7,
    # round 8 (CORRECTNESS_r08.json)
    "a14_mad_outliers": 8,
    "a16_gini_concentration": 8,
    "a17_winsorized_mean": 8,
    "a18_theil_decomposition": 8,
    "cal2_isotonic_calibration": 8,
    "dp1_dp_counts": 8,
    "dp2_dp_mean": 8,
    "dq9_t_closeness": 8,
    "e23_kaplan_meier": 8,
    "e25_did_uplift": 8,
    "e26_ipw_uplift": 8,
    "fe5_woe_encoding": 8,
    "g10_clustering_coefficient": 8,
    "g12_modularity": 8,
    "g13_hits_authorities": 8,
    "g5_effective_rank": 8,
    "g7_jl_distortion": 8,
    "hs3_ndcg_eval": 8,
    "hs4_map_eval": 8,
    "lab3_annotator_agreement": 8,
    "ml1_perceptron_train": 8,
    "ml2_naive_bayes_confusion": 8,
    "ml3_decision_stump": 8,
    "o8_mahalanobis_outliers": 8,
    "s10_pq_codes": 8,
    "s11_kcenter_coreset": 8,
    "s8_hard_negatives": 8,
    "s9_ann_recall": 8,
    "st11_stream_countsketch": 8,
    "st12_stream_decontaminate": 8,
    "stat3_ks_test": 8,
    "stat4_bootstrap_ci": 8,
    "stat5_mann_whitney": 8,
    "stat6_permutation_test": 8,
    "stat7_bh_fdr": 8,
    "t28_textrank_keywords": 8,
    "ts10_theil_sen": 8,
    "ts5_seasonal_decompose": 8,
    "ts6_autocorrelation": 8,
    "ts7_trend_slope": 8,
    "ts8_dispersion": 8,
    "ts9_cross_correlation": 8,
    # round 9 (CORRECTNESS_r09.json)
    "cal3_expected_calibration_error": 9,
    "ch3_content_defined_chunks": 9,
    "d14_span_coverage": 9,
    "d15_ngram_decontaminate": 9,
    "d16_cross_split_leakage": 9,
    "d1_exact_dedup_groups": 9,
    "dq10_quality_gates": 9,
    "dq8_l_diversity": 9,
    "e21_peak_concurrency": 9,
    "e22_missing_hours": 9,
    "e27_sequential_sprt": 9,
    "e7_funnel": 9,
    "ev1_pass_at_k": 9,
    "ev2_bleu_corpus": 9,
    "ev3_chargram_fscore": 9,
    "ev4_brier_score": 9,
    "ev5_token_f1": 9,
    "fe4_feature_hashing": 9,
    "g3_degree_assortativity": 9,
    "g4_rich_club": 9,
    "g9_adamic_adar": 9,
    "hs5_mrr_eval": 9,
    "lab4_dawid_skene": 9,
    "m6_multimodal_packing": 9,
    "pipe2_ingest_manifest": 9,
    "pipe3_recipe_attrition": 9,
    "rag1_context_budget": 9,
    "s13_dim_ablation_recall": 9,
    "s14_pq_adc_recall": 9,
    "s15_ivf_recall_curve": 9,
    "s7_semantic_decontaminate": 9,
    "sk13_countsketch": 9,
    "sp12_dsir_select": 9,
    "sp15_length_bucketing": 9,
    "sp16_pack_efficiency": 9,
    "st13_stream_admission_ledger": 9,
    "t1_language_id": 9,
    "t23_tokenizer_fertility": 9,
    "t24_lexical_diversity": 9,
    "t25_heaps_law": 9,
    "t26_ngram_coverage": 9,
    "t29_perplexity_buckets": 9,
    "t2_quality_score": 9,
    "t30_bpe_encode": 9,
    "t3_token_histogram": 9,
    "t4_doc_fingerprint": 9,
    "t5_token_count": 9,
    "t7_rolling_fingerprint": 9,
    # round 10 (CORRECTNESS_r10.json)
    "a19_hhi_concentration": 10,
    "a1_pivot_event_matrix": 10,
    "a2_value_percentiles": 10,
    "a3_ordered_collections": 10,
    "a4_multi_distinct": 10,
    "d1_surrogate_key": 10,
    "d2_dedup_survivors": 10,
    "d2_token_stats": 10,
    "d3_jaccard_pairs": 10,
    "d3_term_scoring": 10,
    "d5_simhash_signatures": 10,
    "d7_decontaminate": 10,
    "e28_cuped_adjusted_ate": 10,
    "e29_sample_size_mde": 10,
    "m1_media_metadata": 10,
    "m2_decode_features": 10,
    "m3_frame_sample": 10,
    "m7_modality_balance": 10,
    "mf1_als_user_factors": 10,
    "prof4_column_entropy": 10,
    "q10_returned_items": 10,
    "q13_customer_distribution": 10,
    "q14_promo_revenue": 10,
    "q18_large_volume_customer": 10,
    "q1_pricing_summary": 10,
    "q22_global_sales_opportunity": 10,
    "q3_shipping_priority": 10,
    "q4_order_priority": 10,
    "q5_local_supplier_volume": 10,
    "q6_forecast_revenue": 10,
    "q7_volume_shipping": 10,
    "q9_product_profit": 10,
    "s1_knn_bruteforce": 10,
    "s2_ann_lsh": 10,
    "s4_ivf_probe": 10,
    "sp17_token_budget_mix": 10,
    "sql1_priority_revenue": 10,
    "st14_stream_token_budget": 10,
    "st2_stateful_user_totals": 10,
    "sv1_scholar_date_derivation": 10,
    "sv2_arxiv_id_parse": 10,
    "sv3_struct_audit": 10,
    "t31_term_burstiness": 10,
    "t32_source_kl_drift": 10,
    "tc1_triangle_census": 10,
    "u1_account_ledger_union": 10,
    "w1_top_orders_per_customer": 10,
}



#: Tie-break within the never-verified (round-0) block. After the r9
#: rotation (CORRECTNESS_r09: 50/50 green, pasted above) EVERY
#: registered query carries a driver-verified round, so this list is
#: empty: new registrations enter at round 0 and sort to the prefix
#: head in plain registration order until their first driver row.
_SHOWCASE_FIRST: tuple[str, ...] = ()
_SHOWCASE_RANK = {n: i for i, n in enumerate(_SHOWCASE_FIRST)}


def _ordered(reg: dict[str, QuerySpec]) -> dict[str, QuerySpec]:
    """Stalest verification evidence first; within the round-0 block
    the showcase list leads, then registration order (stable: dicts
    preserve insertion order)."""
    names = sorted(
        reg,
        key=lambda n: (
            _VERIFIED_ROUND.get(n, 0),
            _SHOWCASE_RANK.get(n, len(_SHOWCASE_FIRST)),
        ),
    )
    return {n: reg[n] for n in names}


def all_queries(strict: bool = False) -> dict[str, QuerySpec]:
    """Import all registering modules, then return the registry.

    Imports are deferred so ``import bc_proj3_spark`` stays cheap. A
    module that fails to import is skipped (and remembered in
    :data:`import_errors`) unless ``strict=True`` — the driver should
    always see every query that *does* work. The returned dict is
    ordered by verification priority (see :data:`_PRIORITY`).
    """
    import importlib

    for mod in _REGISTERING_MODULES:
        try:
            importlib.import_module(mod)
        except Exception as exc:  # pragma: no cover - defensive
            if strict:
                raise
            import_errors[mod] = repr(exc)
    return _ordered(_REGISTRY)


#: Populated by :func:`all_queries` for modules that failed to import.
import_errors: dict[str, str] = {}
