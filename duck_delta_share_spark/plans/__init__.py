"""Query inventory (SURVEY.md §2): every operator the engine supports is
registered here as a (Spark callable, DuckDB oracle SQL) pair consumed by
``__spark_entry__.py``. Import side effects populate the registry."""

from duck_delta_share_spark.plans.registry import QUERIES, QueryDef, query

# Register all query modules (import side effects fill QUERIES).
# Registration ORDER is part of the driver contract: per-round correctness
# checks cover the first 50 registry entries, so the differentiating
# surfaces (LLM pipeline ops, UDF/UDTF, the Delta Sharing DataSource scan,
# streaming twins' batch anchors) register FIRST; the TPC-H sweep — fully
# hash-verified in round 1 — registers last. All queries stay registered.
from duck_delta_share_spark.plans import llm_ops  # noqa: E402,F401
from duck_delta_share_spark.plans import timeseries_queries  # noqa: E402,F401
from duck_delta_share_spark.plans import udf_surface  # noqa: E402,F401
from duck_delta_share_spark.plans import datasource_queries  # noqa: E402,F401
from duck_delta_share_spark.plans import functions_sweep  # noqa: E402,F401
from duck_delta_share_spark.plans import relational  # noqa: E402,F401
from duck_delta_share_spark.plans import tpch  # noqa: E402,F401
from duck_delta_share_spark.plans import tpch_extended  # noqa: E402,F401
from duck_delta_share_spark.plans import tpch_complete  # noqa: E402,F401

# Round-6 window rotation (VERDICT r5 #1 — the FINAL evidence-debt
# retirement): the driver's per-round correctness check covers the FIRST
# 50 entries. Lead with the two queries whose operators changed in r6
# (heavy_hitter_terms single-job candidate pass, semantic_dedup cluster
# cap), then ALL 27 queries whose only driver evidence is r1 (join_asof
# first — the sole events-toucher, and its operator got NULL-ts/tie
# fixes in r5 the driver never hashed — then windows, the join family,
# aggregates, set ops, subqueries, sort/topk, array/math, q21/q22), then
# hll_mergeable_distinct (rows-only, last driver rows-evidence r2), then
# 20 r3-evidenced entries prioritizing operators that received r5 fixes
# (simhash pigeonhole blocking, WAV decode, sessionize min/max, asof
# tolerance, components self-loop, packing boundary bake, salted spread,
# perplexity eager-capture). After this round no query's driver evidence
# predates r3. Everything stays registered; only the order changes.
_R6_WINDOW = [
    # round-6 NEW queries first (never driver-evidenced)
    "bag_fingerprint_dedup",
    "ngram_novelty_score",
    "oov_rate_topk_vocab",
    "retention_cohorts",
    "phrase_match_positional",
    # round-6 session-2 additions (never driver-evidenced); the three
    # first-50 slots they take came from the r3-fill tail entries with
    # no r5/r6 operator changes (tfidf_top_terms, inverted_index_
    # postings, sequence_packing_partitioned — the last keeps its
    # boundary-bake coverage through its sequence_packing twin)
    "event_type_transitions",
    "pmi_bigram_scores",
    "embedding_winsorized_stats",
    # r6s2 batch 2 (slots from the two rows-only r3-fill entries —
    # simhash_neardup / minhash_lsh_neardup — whose HASH-checked md5
    # twins remain below; the driver only rows-checks rows-only entries,
    # so the twins carry the r5-fix evidence)
    "interarrival_histogram",
    "cross_source_leakage",
    # r6s2 batch 3 (slot from join_asof_tolerance: its operator is
    # exercised in-window by join_asof AND by this very query's asof
    # composition; the tolerance arg keeps its r3 evidence + unit tests)
    "pit_segment_attribution",
    # r6-changed operators re-evidence next
    "heavy_hitter_terms",
    "semantic_dedup",
    # the 27 r1-only queries (VERDICT r5 Missing #1)
    "join_asof",
    "window_frames",
    "window_ranking",
    "window_analytic",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "join_full_outer",
    "join_theta_band",
    "agg_cube",
    "agg_rollup",
    "agg_grouping_sets",
    "agg_distinct",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "scalar_subquery",
    "correlated_in_subquery",
    "sort_limit",
    "topk_per_group",
    "filter_projection",
    "filter_in_between_null",
    "explode_unnest",
    "array_functions",
    "math_functions",
    "q21_waiting_suppliers",
    "q22_dormant_customers",
    # last rows-evidence r2 (rows-only by necessity: binary HLL states)
    "hll_mergeable_distinct",
    # r3-evidenced entries whose operators received r5 fixes
    "simhash_md5_pairs",
    "multimodal_wav_strict",
    "sessionization",
    "dedup_components",
    "neardup_canonical_keep",
    "ngram_jaccard_neardup",
    "sequence_packing",
    "salted_agg_events",
    "unigram_perplexity_score",
    # --- end of slot 50 (the 5 new r6 queries took the last five r3-fill
    # slots: pipeline_training_prep / per_group_deterministic_sample /
    # text_quality_score / pii_redaction / repetition_signals keep their
    # r3 evidence); freshest-first tail below keeps the registry order
    # deterministic
    "sequence_packing_partitioned",
    "inverted_index_postings",
    "tfidf_top_terms",
    "simhash_neardup",
    "minhash_lsh_neardup",
    "join_asof_tolerance",
    "pipeline_training_prep",
    "per_group_deterministic_sample",
    "text_quality_score",
    "pii_redaction",
    "repetition_signals",
    "delta_column_defaults",
    "kmeans_lloyd_round",
    "bm25_topk",
    "delta_rename_drop_scan",
    "twap_hourly",
    "dataset_split_assign",
    "similarity_ann_pq",
    "delta_restore",
    "exists_subquery",
    "join_null_safe",
    "events_hopping_agg",
    "text_normalize",
    "weighted_quality_sample",
    "zorder_write_scan",
    "interval_join_events",
    "resample_gapfill_hourly",
    "udtf_token_chunks",
    "udf_pandas_scalar",
    "udf_python_scalar",
    "udaf_grouped_pandas",
    "minhash_md5_lsh_pairs",
    "delta_share_scan",
    "delta_log_scan",
    "delta_merge_upsert",
    "incremental_rollup_cdf",
    "sql_text_interface",
    "string_functions",
    "date_functions",
    "json_functions",
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume",
    "q8_market_share",
    "q9_product_type_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_priority_classes",
    "q13_count_distribution",
    "q14_promo_effect",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q17_small_quantity",
    "q18_large_orders",
    "q19_disjunctive_predicates",
    "q20_promotion_suppliers",
    "substring_dedup_spans",
    "delta_schema_evolution",
    "delta_txn_idempotent_append",
    "similarity_ann_opq",
    "bitwise_functions",
    "try_arithmetic",
    "lateral_topk",
    "higher_order_array",
    "delta_check_constraint",
    "delta_generated_columns",
    "quality_features",
    "ewma_hourly",
    "window_rolling_median",
    "delta_nested_mapping_scan",
    "delta_nested_mapping_delete",
    "delta_identity_append",
    "delta_row_tracking_scan",
    "recursive_cte_hierarchy",
    "recursive_cte_calendar",
    "similarity_range_search",
    "gopher_quality_rules",
    "scd2_dimension_cdf",
    "dsir_importance_weights",
    "countmin_sketch_estimates",
    "set_ops_all",
    "ols_per_group",
    "funnel_stages",
    "pretrain_pipeline_e2e",
    "delta_convert_clone_scan",
    "delta_update_where",
    "cdc_replication_e2e",
    "delta_partition_delete",
    "listagg_ordered",
    "histogram_width_bucket",
    "zipf_term_slope",
    "salted_join_lineitem",
    "domain_mix_resample",
    "simhash_signatures",
    "delta_share_dv_rest_scan",
    "delta_column_mapping_merge",
    "multimodal_png_strict",
    "similarity_topk_int8",
    "benchmark_contamination",
    "char_entropy_quality",
    "bigram_backoff_score",
    "delta_share_cdf_scan",
    "window_distribution",
    "map_functions",
]


def _rotate_window(first: list[str]) -> None:
    # fail LOUD on a typo / renamed query: silently dropping an unknown
    # name would shift every later entry up one slot and push the last
    # intended member out of the driver's checked-first-50 window —
    # exactly the silent evidence loss the rotation exists to prevent
    unknown = [n for n in first if n not in QUERIES]
    if unknown:
        raise ValueError(f"window rotation names unknown queries: {unknown}")
    dupes = [n for n in set(first) if first.count(n) > 1]
    if dupes:
        raise ValueError(f"window rotation repeats queries: {dupes}")
    lead = list(first)
    rest = [n for n in QUERIES if n not in set(lead)]
    snapshot = dict(QUERIES)
    QUERIES.clear()
    QUERIES.update({n: snapshot[n] for n in lead + rest})


_rotate_window(_R6_WINDOW)

__all__ = ["QUERIES", "QueryDef", "query"]
