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

# Round-8 window rotation: the driver's per-round correctness check
# covers the FIRST 50 entries. r7 retired the r3 evidence debt; r8
# leads with (a) the three late-r7 registrations the driver has NEVER
# hashed, (b) the seven queries whose plans/oracles changed in the r7
# fuzz fixes AFTER their last driver evidence, (c) the three
# similarity queries whose oracles gained the explicit zero-norm
# predicate THIS round (r7 ADVICE), then fills with the oldest
# (r4-evidenced) oracled entries. New r8 queries insert at the TOP of
# the r8-new block as they land, trimming the r4 tail one-for-one.
# Everything stays registered; only the order changes.
_R8_WINDOW = [
    # r8 NEW queries (never driver-evidenced)
    "boilerplate_chunk_dedup",
    "source_overlap_matrix",
    "split_kl_divergence",
    "ohlc_bars_hourly",
    "user_burstiness_profile",
    # late-r7 registrations, never driver-evidenced
    "hard_negative_mining",
    "dedup_cluster_histogram",
    "conversion_lag_stats",
    # plans/oracles changed in the r7 fuzz fixes post-evidence
    "twap_hourly",
    "quality_features",
    "kmeans_lloyd_round",
    "delta_merge_upsert",
    "delta_column_mapping_merge",
    "pretrain_pipeline_e2e",
    "gopher_quality_rules",
    # oracles gained the explicit zero-norm predicate this round
    "similarity_topk_exact",
    "similarity_ann_ivf",
    "embedding_neardup_blocked",
    # gap-boundary semantics aligned to native session_window (r8 fuzz)
    "sessionization",
    # oldest driver evidence (r4) — operator/write-path entries first
    "benchmark_contamination",
    "bigram_backoff_score",
    "cdc_replication_e2e",
    "char_entropy_quality",
    "countmin_sketch_estimates",
    "delta_check_constraint",
    "delta_convert_clone_scan",
    "delta_generated_columns",
    "delta_identity_append",
    "delta_nested_mapping_delete",
    "delta_nested_mapping_scan",
    "delta_partition_delete",
    "delta_row_tracking_scan",
    "delta_update_where",
    "domain_mix_resample",
    "dsir_importance_weights",
    "ewma_hourly",
    "funnel_stages",
    "lateral_topk",
    "multimodal_png_strict",
    "ols_per_group",
    "recursive_cte_hierarchy",
    "salted_join_lineitem",
    "scd2_dimension_cdf",
    "simhash_signatures",
    "similarity_ann_opq",
    "similarity_range_search",
    "similarity_topk_int8",
    "substring_dedup_spans",
    "window_rolling_median",
    "zipf_term_slope",
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


_rotate_window(_R8_WINDOW)

__all__ = ["QUERIES", "QueryDef", "query"]
