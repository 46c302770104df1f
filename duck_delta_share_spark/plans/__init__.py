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

# Round-4 window rotation (VERDICT r3 #10): the driver's per-round
# correctness check covers the FIRST 50 entries. Lead with this round's
# fixed/new queries (the simhash oracle cast, DV-over-REST,
# column-mapping MERGE, the now-oracle-gated PNG strict), then the
# r1-window relational/function/TPC-H entries that have not been
# re-evidenced since the r3 fixture regeneration changed events.parquet
# timestamps (events-touching ones like json_functions first). Everything
# stays registered; only the order changes.
_R4_WINDOW = [
    "substring_dedup_spans",
    "delta_schema_evolution",
    "delta_txn_idempotent_append",
    "similarity_ann_opq",
    "bitwise_functions",
    "try_arithmetic",
    "lateral_topk",
    "higher_order_array",
    "delta_check_constraint",
    "bpe_train_merges",
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
    "similarity_ann_ivfpq",
    "domain_mix_resample",
    "simhash_signatures",
    "delta_share_dv_rest_scan",
    "delta_column_mapping_merge",
    "multimodal_png_strict",
    # r4 additions (first driver evidence this round)
    "similarity_topk_int8",
    "benchmark_contamination",
    "char_entropy_quality",
    "bigram_backoff_score",
    "delta_share_cdf_scan",
    "window_distribution",
    "map_functions",
    "dataset_split_assign",
    "similarity_ann_pq",
    "delta_restore",
    "exists_subquery",
    "join_null_safe",
    "events_hopping_agg",
    "text_normalize",
    "weighted_quality_sample",
    "zorder_write_scan",
    # r1-window entries, events-touching first
    "json_functions",
    "string_functions",
    "date_functions",
    "math_functions",
    "array_functions",
    "explode_unnest",
    "filter_projection",
    "filter_in_between_null",
    "sort_limit",
    "topk_per_group",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "join_full_outer",
    "join_theta_band",
    "join_asof",
    "agg_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "window_ranking",
    "window_analytic",
    "window_frames",
    "set_union_distinct",
    "set_intersect",
    "set_except",
    "scalar_subquery",
    "correlated_in_subquery",
    # full TPC-H sweep re-evidence (r1-checked); the tail past entry 50
    # rolls into the r5 window
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
    "q21_waiting_suppliers",
    "q22_dormant_customers",
]


def _rotate_window(first: list[str]) -> None:
    lead = [n for n in first if n in QUERIES]
    rest = [n for n in QUERIES if n not in set(lead)]
    snapshot = dict(QUERIES)
    QUERIES.clear()
    QUERIES.update({n: snapshot[n] for n in lead + rest})


_rotate_window(_R4_WINDOW)

__all__ = ["QUERIES", "QueryDef", "query"]
