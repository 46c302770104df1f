"""Physical-plan assertions: the scale claims in docstrings must be visible
in `.explain` — pushdown reaches the scan, dims broadcast, zero-shuffle
operators really have no exchange. These tests pin the plans so a future
refactor that silently regresses the physical shape fails CI, not the
100 TB run."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.operators.dedup import minhash_signatures
from duck_delta_share_spark.plans import QUERIES
from tests.conftest import SF_DIR


def _plan(df) -> str:
    spark = df.sparkSession
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_q1_scan_pruned_and_pushed(spark):
    df = QUERIES["q1_pricing_summary"].spark_fn(spark, SF_DIR)
    plan = _plan(df)
    m = re.search(r"PushedFilters: \[([^\]]*)\]", plan)
    assert m and "l_shipdate" in m.group(1), "shipdate filter not pushed to parquet"
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "no ReadSchema in plan"
    cols = m.group(1)
    assert "l_comment" not in cols and "l_orderkey" not in cols, (
        "column pruning failed: scan reads unused columns"
    )


def test_q5_dimensions_broadcast(spark):
    plan = _plan(QUERIES["q5_local_supplier_volume"].spark_fn(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3, (
        "supplier/nation/region should broadcast-join"
    )
    assert "CartesianProduct" not in plan


def test_minhash_signatures_zero_extra_shuffle(spark):
    d = load_table(spark, SF_DIR, "documents")
    plan = _plan(minhash_signatures(d, num_hashes=8, shingle_n=3))
    # exactly one exchange: the explicit spread repartition; the signature
    # computation itself is a narrow map (the operator's core claim)
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges == 1, n_exchanges


def test_filter_reaches_parquet_scan(spark):
    l = load_table(spark, SF_DIR, "lineitem")
    df = l.filter(F.col("l_quantity") < 10).select("l_orderkey", "l_quantity")
    plan = _plan(df)
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1][:200]
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and "l_extendedprice" not in m.group(1), "projection not pruned"


def test_interval_join_not_cartesian(spark):
    plan = _plan(QUERIES["interval_join_attribution"].spark_fn(spark, SF_DIR))
    assert "CartesianProduct" not in plan, "interval join degenerated to cartesian"


def test_pack_sequences_no_single_partition_window(spark):
    """The global-order packing must never funnel the table through one
    task: both passes window within range partitions (VERDICT r1 #1)."""
    for name in ("sequence_packing", "sequence_packing_partitioned"):
        plan = _plan(QUERIES[name].spark_fn(spark, SF_DIR))
        assert "Exchange SinglePartition" not in plan, f"{name}: single-task window"
        assert "Window" in plan


def test_pack_sequences_two_pass_matches_naive_global(spark):
    """Two-pass distributed prefix sum == the naive single-window global
    running sum, bit for bit (the correctness claim of the rewrite)."""
    from pyspark.sql import Window

    from duck_delta_share_spark.operators.sessionize import pack_sequences

    d = load_table(spark, SF_DIR, "documents")
    got = {
        r["doc_id"]: (r["n_tokens"], r["bin_id"], r["bin_offset"])
        for r in pack_sequences(d, capacity_tokens=256, num_range_partitions=7).collect()
    }
    from duck_delta_share_spark.functions.text import token_count

    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = (
        d.select("doc_id", token_count("text").alias("n_tokens"))
        .withColumn("e", F.sum("n_tokens").over(w))
        .collect()
    )
    assert len(naive) == len(got) > 0
    for r in naive:
        n, b, off = got[r["doc_id"]]
        assert n == r["n_tokens"]
        assert off == r["e"] - r["n_tokens"]
        assert b == (r["e"] - r["n_tokens"]) // 256


def test_pii_redaction_stays_codegen(spark):
    """PII redaction must be pure JVM expressions: no Python eval nodes,
    no exchange — a narrow map over the scan."""
    plan = _plan(QUERIES["pii_redaction"].spark_fn(spark, SF_DIR))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan, "PII redaction should not shuffle"


def test_repetition_signals_scan_pruned(spark):
    plan = _plan(QUERIES["repetition_signals"].spark_fn(spark, SF_DIR))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m and "text" in m.group(1)
    assert "lang" not in m.group(1) and "source" not in m.group(1), (
        "repetition signals must scan only doc_id+text"
    )


def test_lsh_cap_partitions_only_on_the_join_key(spark):
    """The bucket cap's window partitions on the SAME (band, bucket) key
    the pair self-join shuffles on — so every exchange the cap introduces
    is one the join's EnsureRequirements would demand anyway (AQE reuses
    identical exchanges at runtime). No new partitioning keys, no
    broadcast barrier beyond what the uncapped plan already has."""
    from duck_delta_share_spark.operators.dedup import lsh_candidate_pairs

    def hash_keys(plan: str) -> set[str]:
        return {
            re.sub(r"#\d+L?", "", m)  # strip expr ids
            for m in re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
        }

    d = load_table(spark, SF_DIR, "documents")
    sigs = minhash_signatures(d, num_hashes=8, shingle_n=3)
    capped = _plan(lsh_candidate_pairs(sigs, num_hashes=8, bands=4))
    uncapped = _plan(
        lsh_candidate_pairs(sigs, num_hashes=8, bands=4, max_bucket_size=None)
    )
    extra_keys = hash_keys(capped) - hash_keys(uncapped)
    for k in extra_keys:
        assert "band" in k and "bucket" in k, (
            f"cap introduced a foreign partitioning key: {k}"
        )
    n_bcast_capped = capped.count("BroadcastExchange")
    n_bcast_uncapped = uncapped.count("BroadcastExchange")
    assert n_bcast_capped <= n_bcast_uncapped, "cap added a broadcast barrier"


def test_block_neardup_single_shuffle(spark):
    """The per-block matmul scorer shuffles each vector exactly once
    (groupBy block) and scores inside FlatMapGroupsInPandas — pair rows
    never appear pre-threshold."""
    from duck_delta_share_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    e = load_table(spark, SF_DIR, "embeddings")
    plan = _plan(embedding_near_dup_pairs(e, block_col="label", threshold=0.4))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 1
    assert "FlatMapGroupsInPandas" in plan
    assert "Join" not in plan, "block scorer must not materialize pair joins"


def test_ivf_queries_broadcast(spark):
    from duck_delta_share_spark.operators.similarity import ivf_topk

    e = load_table(spark, SF_DIR, "embeddings")
    plan = _plan(ivf_topk(e, e.filter("vec_id < 5"), dim=64, n_centroids=8, n_probe=2))
    assert "BroadcastHashJoin" in plan, "probe side should broadcast"
    assert "CartesianProduct" not in plan


def test_resample_gapfill_windows_are_partitioned(spark):
    """Gap fill must never use a partition-less (single-task) window, and
    the rollup's partial aggregation must be map-side (HashAggregate
    before the exchange)."""
    plan = _plan(QUERIES["resample_gapfill_hourly"].spark_fn(spark, SF_DIR))
    assert "Exchange SinglePartition" not in plan, "global window in gap fill"
    assert "Window" in plan and "HashAggregate" in plan


def test_interval_join_events_is_hash_join(spark):
    plan = _plan(QUERIES["interval_join_events"].spark_fn(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan or "HashJoin" in plan


def test_embedding_variance_partials_map_side(spark):
    """posexplode + groupBy(dim) must partial-aggregate before its one
    exchange — 64 groups shuffle partials, never exploded rows."""
    plan = _plan(QUERIES["embedding_variance_by_dim"].spark_fn(spark, SF_DIR))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 2, plan  # agg shuffle + final orderBy range
    assert "HashAggregate" in plan


def test_quantize_is_pure_projection(spark):
    """int8 quantization is a narrow map: no exchange, no aggregate except
    the orderBy the query adds for stable output."""
    from duck_delta_share_spark.catalog import load_table as lt
    from duck_delta_share_spark.operators.embeddings import int8_scale, quantize_int8

    e = lt(spark, SF_DIR, "embeddings")
    scale = int8_scale("embedding")
    df = e.select("vec_id", quantize_int8("embedding", scale).alias("q"))
    plan = _plan(df)
    assert "Exchange" not in plan, "quantization should be shuffle-free"


def test_heavy_hitter_candidate_pass_zero_shuffle(spark):
    """Misra-Gries pass 1 is a narrow mapInPandas over the token stream —
    no exchange before the python worker."""
    from duck_delta_share_spark.catalog import load_table as lt
    from duck_delta_share_spark.functions.text import tokenize
    from duck_delta_share_spark.operators.sketches import misra_gries_candidates

    d = lt(spark, SF_DIR, "documents")
    toks = d.select(F.explode(tokenize("text")).alias("term"))
    plan = _plan(misra_gries_candidates(toks, "term", 64))
    assert "Exchange" not in plan, "candidate pass must not shuffle"


def test_neardup_canonical_single_extra_shuffle(spark):
    """The canonical-keep layer adds one window over the component id on
    top of the components plan — no cartesian/global-window regressions."""
    plan = _plan(QUERIES["neardup_canonical_keep"].spark_fn(spark, SF_DIR))
    assert "Exchange SinglePartition" not in plan
    assert "CartesianProduct" not in plan


def test_benchmark_containment_broadcasts_bench_side(spark):
    """The eval set is bounded — its shingle set must BROADCAST into the
    marker join (single corpus pass); a shuffled join would move the
    whole corpus, and a second aggregation of the shingle lineage would
    evaluate it twice."""
    df = QUERIES["benchmark_contamination"].spark_fn(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    # ONE corpus-side shuffle (the per-doc rollup) — the old sizes/overlap
    # split had two aggregations over the same exploded lineage
    assert plan.count("Exchange hashpartitioning") <= 2, plan[:2000]


def test_int8_topk_single_broadcast_no_shuffle_scoring(spark):
    """Scoring joins the broadcast query set against the base — the only
    exchange should be the window's per-query partition, never a
    base-vs-base shuffle, and no nested-loop join."""
    df = QUERIES["similarity_topk_int8"].spark_fn(spark, SF_DIR)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # candidate scoring itself must not shuffle the base side twice
    assert plan.count("Exchange hashpartitioning") <= 2, plan[:2000]


def test_char_entropy_two_aggregations_only(spark):
    """(doc,char) count then per-doc rollup: exactly two hash-partitioned
    exchanges (plus the final presentation sort), no joins at all."""
    df = QUERIES["char_entropy_quality"].spark_fn(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("Exchange hashpartitioning") <= 2, plan[:2000]
    assert "Join" not in plan


def test_range_search_zero_shuffle(spark):
    """int8_range_search's core claim: broadcast queries + narrow filter —
    no DATA-DEPENDENT exchange (top-k needs a ranking-window hash
    shuffle; the threshold pass must not key anything). The registered
    query adds one presentation orderBy; the OPERATOR itself must show
    no hash/range partitioning. Since r12 a single ROUND-ROBIN spread of
    the prepped base is permitted: `_spread_small` fires only when the
    scan arrives in fewer partitions than cores (the local one-file
    case, where the per-pair scoring would otherwise run serially on one
    core) and is a no-op at scale — it carries no key, so the zero-
    data-shuffle claim stands."""
    from duck_delta_share_spark.operators.similarity import int8_range_search

    e = load_table(spark, SF_DIR, "embeddings")
    plan = _plan(
        int8_range_search(e, e.filter(F.col("vec_id") < 25), min_score_e6=300_000)
    )
    assert "hashpartitioning" not in plan, plan[:2000]
    assert "rangepartitioning" not in plan, plan[:2000]
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    n_rr = plan.count("RoundRobinPartitioning")
    assert n_exchanges == n_rr <= 1, f"unexpected shuffle: {plan[:2000]}"
    assert "BroadcastExchange" in plan  # the query set ships to executors


def test_dsir_one_pass_no_join(spark):
    """r12 one-pass DSIR: the tokenize→shingle→explode→md5 stream is
    consumed ONCE — per-(doc,bucket) partial agg, bucket ratios via a
    window over `bucket` (≤4096-row partitions), per-doc rollup. The old
    shape evaluated the stream three times and joined the ratio table
    back; the pin: no join of any kind, exactly one Generate, and the
    only exchanges are the two aggs + the bucket window + the output
    ordering."""
    plan = _plan(QUERIES["dsir_importance_weights"].spark_fn(spark, SF_DIR))
    assert "Join" not in plan, plan[:2000]
    assert len(re.findall(r"\(\d+\) Generate", plan)) == 1, plan[:2000]
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 4, f"dsir shuffled {n_exchanges}x"


def test_gopher_rules_narrow_map(spark):
    """The Gopher featurization is a pure narrow map over the scan: the
    only exchange is the output ordering's range shuffle."""
    plan = _plan(QUERIES["gopher_quality_rules"].spark_fn(spark, SF_DIR))
    n_exchanges = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n_exchanges <= 1, f"gopher rules shuffled {n_exchanges}x"


def test_centroid_assignment_zero_shuffle(spark):
    """assign_nearest_centroid (both engines): the assignment pass itself
    contains NO exchange — the per-row argmax happens map-side with the
    centroids in the expression tree / task closure."""
    from duck_delta_share_spark.operators.dedup import assign_nearest_centroid

    e = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    for engine in ("literal", "arrow"):
        plan = _plan(assign_nearest_centroid(e, k=8, engine=engine))
        assert "Exchange" not in plan, f"{engine}: assignment shuffled"


def test_bm25_no_per_doc_length_join(spark):
    """bm25_topk: dl rides the exploded term stream (first() per group) —
    there must be NO doc_id-keyed join over the whole corpus, only the
    broadcast idf join (|query| rows) and scalar cross-broadcasts."""
    plan = _plan(QUERIES["bm25_topk"].spark_fn(spark, SF_DIR))
    assert "SortMergeJoin" not in plan
    # every hash join builds a broadcast side; none joins on doc_id
    for m in re.findall(r"BroadcastHashJoin \[([^\]]*)\]", plan):
        assert "doc_id" not in m, f"per-doc join crept back: {m}"
    assert "CartesianProduct" not in plan


def test_zipf_top200_is_take_ordered_not_global_window(spark):
    """Ranking must TakeOrdered the vocabulary-sized term table down to
    200 rows BEFORE any no-partition window — a global window over the
    raw term table funnels the whole vocabulary through one task."""
    df = QUERIES["zipf_term_slope"].spark_fn(spark, SF_DIR)
    plan = _plan(df)
    assert "TakeOrderedAndProject" in plan, plan[:2000]


def test_funnel_no_per_user_array_materialization(spark):
    """The funnel fold must run as constant-state running-min windows —
    collect_list would materialize a hot user's whole event history in
    one aggregation row."""
    df = QUERIES["funnel_stages"].spark_fn(spark, SF_DIR)
    plan = _plan(df)
    assert "collect_list" not in plan and "sort_array" not in plan, plan[:2000]


def test_per_group_sample_two_level_topk(spark):
    """lang has ~5 values: the sample must pre-prune per (lang, input
    partition) so no single window task sees the whole corpus."""
    df = QUERIES["per_group_deterministic_sample"].spark_fn(spark, SF_DIR)
    plan = _plan(df)
    assert "SPARK_PARTITION_ID" in plan.upper() or "__pid" in plan, plan[:2000]
