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

# Round-5 window rotation (VERDICT r4 #1): the driver's per-round
# correctness check covers the FIRST 50 entries. Lead with this round's
# new query (column DEFAULTs), then the NINE oracled queries that never
# made any round's window (r4 slots 51-59), then every r2-evidenced
# entry (the delta/udf/events block whose driver evidence predates the
# r3 events.parquet regeneration), json_functions (r1, events-touching),
# the full TPC-H sweep (r1 evidence only), and three more r1 entries to
# fill slot 50. The remaining r1-evidenced relational entries rotate in
# next round. Everything stays registered; only the order changes.
_R5_WINDOW = [
    "delta_column_defaults",
    "semantic_dedup",
    "kmeans_lloyd_round",
    "bm25_topk",
    "delta_rename_drop_scan",
    "twap_hourly",
    # never driver-evidenced oracled queries (r4 slots 51-59)
    "dataset_split_assign",
    "similarity_ann_pq",
    "delta_restore",
    "exists_subquery",
    "join_null_safe",
    "events_hopping_agg",
    "text_normalize",
    "weighted_quality_sample",
    "zorder_write_scan",
    # r2-evidenced entries (stale: pre-r3 fixture regeneration)
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
    # r1-evidenced, events-touching first (join_asof/window_frames roll to
    # the r6 rotation — their operator families hold r3/r4 twin evidence)
    "json_functions",
    # full TPC-H sweep re-evidence (r1-checked only)
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
    # --- end of slot 50 (q21/q22 roll to the r6 rotation with the other
    # r1-evidenced entries); r4-green entries follow, freshest first
    "q21_waiting_suppliers",
    "q22_dormant_customers",
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


_rotate_window(_R5_WINDOW)

__all__ = ["QUERIES", "QueryDef", "query"]
