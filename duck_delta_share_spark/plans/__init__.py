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

# Round-9 window rotation: the driver's per-round correctness check
# covers the FIRST 50 entries. r8 retired the r4 operator/write-path
# debt (50/50 green). r9 leads with (a) queries whose ORACLES are new
# or changed this round (the pca/approx-distinct rows-only upgrades,
# the sessionization microsecond-gap alignment, the bm25 plan
# adjudication), (b) the nine remaining r4-evidenced entries (SURVEY
# §2B scalar/array/set rows), then (c) the oldest r5 block: the 20
# r5-evidenced TPC-H queries, the UDF/UDTF surface, the two flagship
# scans, json_functions (this round's fuzz-seed target), and the
# oldest Delta write-path entries. New r9 queries insert at the TOP
# as they land, trimming the r5 tail one-for-one (the trimmed entries
# lead the r10 fill). Everything stays registered; only order changes.
_R9_WINDOW = [
    # r9 NEW queries (never driver-evidenced)
    "agg_quantiles_mergeable",
    "key_skew_profile",
    "table_profile",
    "numeric_corr_matrix",
    "mad_outlier_profile",
    "minhash_recall_audit",
    "doclen_log2_histogram",
    "split_leakage_audit",
    # oracles NEW or changed this round
    "pca_project_embeddings",
    "agg_approx_distinct",
    "hll_mergeable_distinct",
    "sessionization",
    "bm25_topk",
    # oldest driver evidence (r4): §2B scalar/array/set rows
    "bitwise_functions",
    "try_arithmetic",
    "map_functions",
    "higher_order_array",
    "set_ops_all",
    "histogram_width_bucket",
    "listagg_ordered",
    "recursive_cte_calendar",
    "window_distribution",
    # r5 evidence: the TPC-H sweep (q21/q22 re-evidenced r6)
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
    # (q20_promotion_suppliers trimmed for split_leakage_audit — it
    # leads the r10 fill with the other trimmed entries)
    # r5 evidence: UDF/UDTF surface + flagship scans + fuzz target
    "udf_python_scalar",
    "udf_pandas_scalar",
    "udaf_grouped_pandas",
    "udtf_token_chunks",
    "delta_log_scan",
    "delta_share_scan",
    "json_functions",
    # r5 evidence: oldest Delta write-path / operator entries
    # (incremental_rollup_cdf and sql_text_interface were judge-verified
    # or low-risk r5 wrappers — they yield their slots to the two
    # NEVER-driver-evidenced rows-only entries below)
    # (similarity_ann_pq, zorder_write_scan, delta_column_defaults,
    # delta_rename_drop_scan and delta_restore trimmed for the five r9
    # profiling/QA/audit/planning queries above — they lead the r10 fill)
    # rows-only by necessity, never driver-evidenced even at row level
    "bpe_train_merges",
    "similarity_ann_ivfpq",
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


_rotate_window(_R9_WINDOW)

__all__ = ["QUERIES", "QueryDef", "query"]
