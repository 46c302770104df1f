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

# Round-7 window rotation: the driver's per-round correctness check
# covers the FIRST 50 entries. The r6 rotation retired the r1/r2
# evidence debt; r7 retires the R3 debt. Lead with the six r7 NEW
# queries (never driver-evidenced), then vocab_coverage_curve (added
# r6s2 OUTSIDE the first-50 — the only never-evidenced oracle), then
# the two r4-evidenced write-path queries whose commit path changed
# THIS round (the _atomic_commit checkpoint-race guard fix), then ALL
# 38 queries whose latest driver evidence is r3, then three r4
# REST-path entries whose transport got the r6 failure-injection fixes.
# After this round no oracled query's driver evidence predates r4.
# Everything stays registered; only the order changes.
_R7_WINDOW = [
    # round-7 NEW queries (never driver-evidenced)
    "edit_distance_neardup",
    "skipgram_cooccurrence",
    "source_term_lift",
    "token_budget_selection",
    "event_debounce_dedup",
    "event_volume_anomaly",
    # r6s2 addition that missed the r6 first-50 (never driver-evidenced)
    "vocab_coverage_curve",
    # r4-evidenced write-path queries; _atomic_commit changed this round
    "delta_txn_idempotent_append",
    "delta_schema_evolution",
    # the complete r3-evidence block (38 entries) — retired this round
    "agg_approx_distinct",
    "agg_percentiles",
    "bloom_semi_join_orders",
    "conditional_functions",
    "dedup_exact_groups",
    "dedup_exact_rows",
    "delta_column_mapping_scan",
    "delta_delete_dv",
    "doc_fingerprint_rolling",
    "embedding_neardup_blocked",
    "embedding_quantize_int8",
    "embedding_variance_by_dim",
    "events_windowed_agg",
    "interval_join_attribution",
    "inverted_index_postings",
    "join_asof_tolerance",
    "minhash_lsh_neardup",
    "multimodal_binary_meta",
    "multimodal_features",
    "pca_project_embeddings",
    "per_group_deterministic_sample",
    "pii_redaction",
    "pipeline_training_prep",
    "pivot_event_types",
    "repetition_signals",
    "sequence_packing_partitioned",
    "simhash_neardup",
    "similarity_ann_ivf",
    "similarity_ann_lsh",
    "similarity_topk_exact",
    "stats_moments",
    "stratified_sample",
    "text_lang_distribution",
    "text_langid_heuristic",
    "text_quality_score",
    "text_token_stats",
    "tfidf_top_terms",
    "unpivot_part_measures",
    # r4-evidenced REST-path entries (transport hardened in r6)
    "delta_share_dv_rest_scan",
    "delta_share_cdf_scan",
    "delta_column_mapping_merge",
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


_rotate_window(_R7_WINDOW)

__all__ = ["QUERIES", "QueryDef", "query"]
