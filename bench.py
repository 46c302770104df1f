#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full computation, no
driver-side result materialization cost), after a warmup that triggers JVM
+ codegen warm paths.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

# Headline set: scan-agg, multi-join, window, dedup, similarity — the shapes
# that dominate both the reference's workload and the §2C pipeline.
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "topk_per_group",
    "window_frames",
    "join_asof",
    "agg_distinct",
    "dedup_exact_rows",
    "minhash_lsh_neardup",
    "similarity_topk_exact",
    "similarity_ann_lsh",
    "text_token_stats",
    # round-2 headline ops (baseline entries recorded r3 — see
    # BENCH_BASELINE.json "added_r3"): timeseries, sketches, delta write path,
    # hash-family dedup.
    "resample_gapfill_hourly",
    "interval_join_events",
    "heavy_hitter_terms",
    "delta_merge_upsert",
    "minhash_md5_lsh_pairs",
    # round-3 operators, baseline-tracked from r4 (BENCH_BASELINE.json
    # "added_r4"): merge-on-read DELETE via deletion vectors, bloom
    # semi-join pre-filter.
    "delta_delete_dv",
    "bloom_semi_join_orders",
    # round-4 operators: quantized ANN scan, eval-set contamination,
    # char-distribution quality.
    "similarity_topk_int8",
    "benchmark_contamination",
    "char_entropy_quality",
    # round-4 final wave: exact-substring duplication profile (the
    # heaviest new shape — O(total chars) rows through two shuffles).
    "substring_dedup_spans",
    # round-4 sixth wave: EWMA recursive fold, quality-classifier
    # featurization, IVFADC with rerank.
    "ewma_hourly",
    "quality_features",
    "similarity_ann_ivfpq",
    # round-4 seventh wave: shuffle-free threshold ANN, Gopher rule
    # filter, SCD2 CDF fold over two merge waves.
    "similarity_range_search",
    "gopher_quality_rules",
    "scd2_dimension_cdf",
    # round-4 eighth wave: hashed n-gram importance resampling, ordered
    # funnel fold.
    "dsir_importance_weights",
    "funnel_stages",
    # round-5: the wave-9 capstone paths, baseline-tracked from r5
    # (BENCH_BASELINE.json "added_r5") so future rounds catch regressions
    # on the composed pipeline, the CDC replication consumer, and the
    # copy-on-write UPDATE.
    "pretrain_pipeline_e2e",
    "cdc_replication_e2e",
    "delta_update_where",
    # round-5 new operators: SemDeDup semantic deduplication (zero-shuffle
    # centroid assignment + block-scored within-cluster pruning), BM25
    # retrieval, one k-means Lloyd round, hourly TWAP.
    "semantic_dedup",
    "bm25_topk",
    "kmeans_lloyd_round",
    "twap_hourly",
    # round-6: the headline set was LLM/Delta-heavy — add the classic
    # shuffle-join stressors (VERDICT r5 #6): q21 (double-correlated
    # exists/not-exists over lineitem self-joins) and the outer/semi/
    # anti/theta join family. Baselines recorded as added_r6.
    "q21_waiting_suppliers",
    "join_left_outer",
    "join_semi",
    "join_anti",
    "join_full_outer",
    "join_theta_band",
    # round-6 new operators: bag-of-words fingerprint dedup (one window
    # shuffle) and corpus n-gram novelty (the heavier carried-stats
    # shape whose first cut hid a 16x interpreted-HOF regression — keep
    # it perf-tracked so a relapse is visible).
    "bag_fingerprint_dedup",
    "ngram_novelty_score",
    # round-6 session 2: Markov transition matrix (window + tiny-key
    # agg), PMI phrase mining (two corpus passes through interpreted
    # shingles — the shape most likely to regress if the HOF discipline
    # slips), winsorized embedding stats (exact-percentile two-pass).
    # Baselines recorded as added_r6s2.
    "event_type_transitions",
    "pmi_bigram_scores",
    "embedding_winsorized_stats",
    # round-7 new operators: blocked-Levenshtein near-dup (the within-
    # block quadratic kernel to watch), skip-gram co-occurrence (three
    # shifted zip_with folds + vocab^2-bounded agg), per-source term
    # lift (marginals folded from one count frame), token-budget
    # selection (per-source running-sum window), event debounce +
    # daily-volume anomaly (window + tiny-key aggs). Baselines recorded
    # as added_r7.
    "edit_distance_neardup",
    "skipgram_cooccurrence",
    "source_term_lift",
    "token_budget_selection",
    "event_debounce_dedup",
    "event_volume_anomaly",
    # round-8 new operators: chunk-level boilerplate dedup (chunk-keyed
    # window + ordered reassembly), cross-source chunk-overlap audit,
    # per-lang split KL (integer-pinned log sums), OHLC bars (two
    # row_numbers sharing one exchange), user burstiness profile
    # (exact decimal inter-arrival moment agg). Baselines recorded as
    # added_r8.
    "boilerplate_chunk_dedup",
    "source_overlap_matrix",
    "split_kl_divergence",
    "ohlc_bars_hourly",
    "user_burstiness_profile",
    # round-9 new operators: mergeable approximate quantiles (KLL-style
    # percentile_approx + exact-twin rank certificate), key-skew profile
    # (HHI/entropy concentration diagnostics, one hash agg). Baselines
    # recorded as added_r9.
    "agg_quantiles_mergeable",
    "key_skew_profile",
    # round-9 second wave: per-column dataset profile (union-of-pruned-
    # scans exact distincts + one stats pass), the exact-moment Pearson
    # correlation matrix (one hash agg + 1-row fold), and the robust
    # median/MAD outlier profile (two percentile windows + final agg on
    # one shared exchange). Baselines recorded as added_r9 from a
    # CLEAN full-bench run (the box must be otherwise idle — a bench
    # concurrent with a pytest session showed corr at 1.98x of a
    # baseline the next clean run put at 1.17x).
    "table_profile",
    "numeric_corr_matrix",
    "mad_outlier_profile",
    # round-9 third wave: minhash banding recall audit (composes the two
    # oracled dedup pipelines through one full-outer pair join — the
    # heaviest new r9 shape, worth perf-tracking).
    "minhash_recall_audit",
    # round-9 fourth wave: context-length planning histogram (exact
    # integer log2 buckets via binary-string length, bounded-domain
    # cumulative window).
    "doclen_log2_histogram",
    "split_leakage_audit",
    # round-10: incremental cross-snapshot dedup (the daily-ingest shape:
    # within-shard dedup + fp-store anti-join + two transactional Delta
    # appends — commit I/O included, like the other e2e write-path
    # entries) and the stratified-sampling audit (sampleBy + two tiny
    # aggs + broadcast join). Baselines recorded as added_r10 from a
    # clean full-bench run.
    "incremental_dedup_new_shard",
    "stratified_sample",
    # round-10 second wave: incremental NEAR-dup vs the band-bucket store
    # (store build + Delta I/O + the shard-vs-store banded join — the
    # heaviest new r10 shape, worth perf-tracking like minhash_recall).
    "incremental_neardup_new_shard",
    # round-10 third wave: temporal corpus-novelty trend (fp-keyed window
    # + shard-keyed agg — the crawl-dedup budgeting report) and the
    # persisted-IVF lifecycle (train + partitioned index write + pruned
    # probe — Delta I/O included).
    "crawl_novelty_by_shard",
    "similarity_ann_ivf_persisted",
    # round-11: the two-table transactional near-dup commit (pairs +
    # band store, Delta I/O + replay check included) and incremental
    # dedup across a full store-maintenance cycle (OPTIMIZE + checkpoint
    # + vacuum between ingests) — the heaviest new r11 shapes. Baselines
    # recorded as added_r11 from a clean full-bench run.
    "incremental_neardup_pipeline",
    "incremental_dedup_maintained",
    # round-11 second wave: per-dim scalar quantizer scan, the MRL
    # truncation audit (two-granularity brute-force pass), and the
    # dirty-n-gram decontamination rewrite (broadcast probe + full-text
    # array-side rebuild).
    "similarity_ann_sq8",
    "matryoshka_truncation_audit",
    "decontaminate_rewrite",
]


def _force(df) -> None:
    """Materialize the full result without collecting it to the driver."""
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(Path(sf_dir).name.removeprefix("sf") or 0.1)
    except ValueError:
        sf = None  # non-"sf<N>" directory name: still bench, just untagged

    from duck_delta_share_spark.plans import QUERIES
    from duck_delta_share_spark.session import get_spark

    spark = get_spark(app_name="bench")

    # Warmup: one UNTIMED full pass over the headline set (r3 showed a
    # 98.9% inter-run spread driven entirely by the cold first run — JVM
    # JIT, codegen compilation, shuffle service, parquet footer caches),
    # plus a trivial pandas UDF to spawn the Python worker pool
    # (long-lived in any real deployment; its cold start is not a query
    # cost). Timed runs then measure steady-state throughput.
    import pandas as pd  # noqa: F401 — pandas_udf type-hint resolution
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    warm = F.pandas_udf(lambda x: x, LongType())
    spark.range(32).select(warm("id")).count()
    for name in HEADLINE:
        _force(QUERIES[name].spark_fn(spark, sf_dir))

    # Machine variance on this box is ±30% (CLAUDE.md): run the whole set
    # N times and report per-query MEDIANS, so one noisy run can't read as
    # a regression. Spread (max/min of the per-run totals) is included so
    # the reader can see how noisy the box was.
    # CACHE SEMANTICS (known, deliberate): a few queries persist
    # intermediates (minhash signatures, the packing projection) that the
    # warmup pass materializes, so the timed runs measure the WARM-cache
    # steady state for those stages — a regression inside a cached stage
    # is invisible to this bench. Every recorded baseline was measured
    # under the identical discipline, so per-query ratios stay
    # apples-to-apples; switching to cold-cache timing (clearCache
    # between runs) requires re-recording BENCH_BASELINE.json in the
    # same change.
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    per_run: list[dict[str, float]] = []
    for _ in range(runs):
        timings: dict[str, float] = {}
        for name in HEADLINE:
            qd = QUERIES[name]
            t0 = time.perf_counter()
            _force(qd.spark_fn(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        per_run.append(timings)

    import statistics

    median_q = {
        name: round(statistics.median(r[name] for r in per_run), 3)
        for name in HEADLINE
    }
    run_totals = [round(sum(r.values()), 3) for r in per_run]
    total = round(sum(median_q.values()), 3)
    # CONTRACT: the stdout line must stay SHORT enough to survive a
    # tail-style capture (r11's was truncated mid-line and the round lost
    # its prev-vs-now geomean — VERDICT r12 item 2). Only the driver
    # contract fields go to stdout; every diagnostic (per-run totals,
    # spread, baseline ratios) goes to .bench_detail.json + stderr.
    out = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": median_q,
        "sf": sf,
    }
    detail = {
        **out,
        "runs": runs,
        "run_totals": run_totals,
        "spread_pct": round(
            100.0 * (max(run_totals) - min(run_totals)) / min(run_totals), 1
        ),
    }
    # Per-query regression guardrail: ratios vs the committed round-1
    # snapshot (BENCH_BASELINE.json), so a single regressed query is
    # visible even when the total stays flat. Machine variance is ±30% —
    # rerun before believing a delta.
    baseline_path = Path(__file__).resolve().parent / "BENCH_BASELINE.json"
    if baseline_path.exists():
        base = json.loads(baseline_path.read_text()).get("queries", {})
        detail["vs_baseline"] = {
            name: round(t / base[name], 2)
            for name, t in median_q.items()
            if base.get(name)
        }
    detail_path = Path(__file__).resolve().parent / ".bench_detail.json"
    detail_path.write_text(json.dumps(detail, indent=1))
    print(
        json.dumps(
            {k: detail[k] for k in ("runs", "run_totals", "spread_pct")}
        ),
        file=sys.stderr,
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
