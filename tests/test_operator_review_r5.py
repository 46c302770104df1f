"""Regression tests for the round-5 operators/ self-review findings:
self-loop-only nodes in star connected components, NaN cosine ordering
for zero-norm vectors, timezone-dependent EWMA bucketing, NULL-sum
incremental rollup identity, occurrence-counting stopword fraction,
non-bigint ids through PQ encode, empty-Arrow-batch guards, and the
persisted-frame leaks (pack_sequences global path, heavy_hitter_terms,
iterative localCheckpoints)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# components: self-loop-only nodes must survive the star algorithm
# ---------------------------------------------------------------------------


def test_star_keeps_self_loop_only_nodes(spark):
    from duck_delta_share_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (5, 5)], "id_a long, id_b long"
    )
    for algo in ("star", "hashmin"):
        got = {
            (r["node"], r["component"])
            for r in connected_components(edges, algorithm=algo).collect()
        }
        assert got == {(1, 1), (2, 1), (5, 5)}, algo


def test_star_all_self_loops(spark):
    from duck_delta_share_spark.operators.components import connected_components

    edges = spark.createDataFrame([(7, 7), (9, 9)], "id_a long, id_b long")
    got = {
        (r["node"], r["component"])
        for r in connected_components(edges, algorithm="star").collect()
    }
    assert got == {(7, 7), (9, 9)}


# ---------------------------------------------------------------------------
# similarity: zero-norm vectors must never rank (NaN sorts above reals)
# ---------------------------------------------------------------------------


def _vec_frame(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame({"vec_id": [r[0] for r in rows], "embedding": [r[1] for r in rows]})
    )


def test_brute_force_topk_skips_zero_vectors(spark):
    from duck_delta_share_spark.operators.similarity import brute_force_topk

    base = _vec_frame(
        spark,
        [(1, [1.0, 0.0]), (2, [0.9, 0.1]), (3, [0.0, 0.0]), (4, [0.0, 1.0])],
    )
    queries = _vec_frame(spark, [(100, [1.0, 0.0])])
    got = brute_force_topk(base, queries, k=2).collect()
    ids = [r["vec_id"] for r in sorted(got, key=lambda r: r["rk"])]
    assert ids == [1, 2]  # the zero vector (id 3) must not be rk=1
    assert all(r["cosine"] == r["cosine"] for r in got)  # no NaN


def test_near_dup_pairs_expr_scorer_zero_vector(spark):
    from duck_delta_share_spark.operators.similarity import embedding_near_dup_pairs

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "vec_id": [1, 2, 3],
                "blk": [0, 0, 0],
                "embedding": [[1.0, 0.0], [1.0, 0.01], [0.0, 0.0]],
            }
        )
    )
    for scorer in ("expr", "arrow", "block"):
        pairs = {
            (r["id_a"], r["id_b"])
            for r in embedding_near_dup_pairs(
                df, "blk", threshold=0.9, scorer=scorer
            ).collect()
        }
        # Spark treats NaN > threshold as TRUE — the zero vector (id 3)
        # must not pair with the whole block
        assert pairs == {(1, 2)}, scorer


# ---------------------------------------------------------------------------
# ewma: NTZ bucketing must be independent of the session timezone
# ---------------------------------------------------------------------------


def test_ewma_buckets_timezone_independent(spark):
    from duck_delta_share_spark.operators.timeseries import ewma

    df = spark.createDataFrame(
        [
            ("a", "2024-01-01 00:10:00", 1.0),
            ("a", "2024-01-01 00:50:00", 3.0),
            ("a", "2024-01-01 01:20:00", 10.0),
        ],
        "k string, ts_s string, value double",
    ).select("k", F.col("ts_s").cast("timestamp_ntz").alias("ts"), "value")

    def run():
        rows = ewma(df, "ts", ["k"], "value", alpha=0.5).orderBy("bucket").collect()
        return [(str(r["bucket"]), round(r["ewma"], 9)) for r in rows]

    prev_tz = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        utc = run()
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")  # +5:30
        ist = run()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev_tz)

    assert utc == ist
    # buckets must land on NTZ hour boundaries, not :30 wall-clock
    assert [b for b, _ in utc] == ["2024-01-01 00:00:00", "2024-01-01 01:00:00"]
    # s0 = 0·0.5 + 0.5·mean(1,3) = 1.0; s1 = 1.0·0.5 + 0.5·10 = 5.5
    assert [e for _, e in utc] == [1.0, 5.5]


# ---------------------------------------------------------------------------
# incremental rollup: all-NULL keys keep SUM = NULL (recompute identity)
# ---------------------------------------------------------------------------


def test_rollup_all_null_key_matches_recompute(spark):
    from duck_delta_share_spark.operators.incremental import (
        apply_changes_to_rollup,
        rollup_from_scratch,
    )

    table = spark.createDataFrame(
        [("x", None), ("x", None), ("x", None), ("y", 2.0)],
        "k string, v double",
    )
    prev = rollup_from_scratch(table.limit(0), ["k"], {"total": "v"})
    changes = table.withColumn("_change_type", F.lit("insert"))
    inc = {
        r["k"]: (r["n"], r["total"])
        for r in apply_changes_to_rollup(prev, changes, ["k"], {"total": "v"}).collect()
    }
    scratch = {
        r["k"]: (r["n"], r["total"])
        for r in rollup_from_scratch(table, ["k"], {"total": "v"}).collect()
    }
    assert inc == scratch
    assert inc["x"][1] is None  # SUM of all-NULL is NULL, not 0


# ---------------------------------------------------------------------------
# quality features: stopword fraction counts OCCURRENCES, not types
# ---------------------------------------------------------------------------


def test_stopword_frac_counts_occurrences(spark):
    from duck_delta_share_spark.operators.quality_model import text_features

    df = spark.createDataFrame([("the the the the cat",)], "text string")
    row = text_features(df).collect()[0]
    assert row["f_stopword_frac"] == pytest.approx(0.8)


# ---------------------------------------------------------------------------
# pq_topk: non-bigint ids must survive the Arrow encode stage
# ---------------------------------------------------------------------------


def test_pq_topk_string_ids(spark):
    from duck_delta_share_spark.operators.similarity import (
        lossless_pq_codebooks,
        pq_topk,
    )

    rows = [
        ("a", [1.0, 0.0, 0.0, 0.0]),
        ("b", [0.9, 0.1, 0.0, 0.0]),
        ("c", [0.0, 0.0, 1.0, 0.0]),
    ]
    base = _vec_frame(spark, rows)
    queries = _vec_frame(spark, [("q1", [1.0, 0.0, 0.0, 0.0])])
    got = pq_topk(
        base,
        queries,
        dim=4,
        m=2,
        k=2,
        codebooks=lossless_pq_codebooks(base, 4, m=2),
    ).collect()
    ids = [r["vec_id"] for r in sorted(got, key=lambda r: r["rk"])]
    assert ids == ["a", "b"]


# ---------------------------------------------------------------------------
# empty-Arrow-batch guards: zero-row frames through the numpy UDF paths
# ---------------------------------------------------------------------------


def test_pca_project_empty_frame(spark):
    from duck_delta_share_spark.operators.embeddings import pca_project

    empty = _vec_frame(spark, [(1, [1.0, 2.0])]).limit(0)
    out = pca_project(
        empty, "embedding", k=1, components=[[1.0], [0.0]], mean=[0.0, 0.0]
    )
    assert out.count() == 0


def test_lsh_bucket_topk_empty_base(spark):
    from duck_delta_share_spark.operators.similarity import lsh_bucket_topk

    base = _vec_frame(spark, [(1, [1.0, 0.0])]).limit(0)
    queries = _vec_frame(spark, [(100, [1.0, 0.0])])
    assert lsh_bucket_topk(base, queries, dim=2, k=2).count() == 0


# ---------------------------------------------------------------------------
# storage leaks: operators must not leave persisted/checkpointed blocks
# ---------------------------------------------------------------------------


def _cached_rdd_ids(spark) -> set:
    """Ids of currently-cached RDDs. Tests compare SET DIFFERENCES, never
    absolute counts: the driver may GC other tests' leaked cache entries
    at any py4j round-trip, so `count == before + 1` flakes with suite
    composition (seen r6s2) while 'the ids WE introduced are present /
    gone' cannot."""
    return {
        i.id() for i in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }


def test_heavy_hitters_releases_cache(spark):
    from duck_delta_share_spark.operators.sketches import heavy_hitter_terms

    df = spark.createDataFrame(
        [("the quick brown fox",), ("the lazy dog the",)], "text string"
    )
    before = _cached_rdd_ids(spark)
    got = heavy_hitter_terms(df, threshold=1 / 4)
    got.collect()
    assert _cached_rdd_ids(spark) - before == set()


def test_pack_sequences_global_deterministic_and_releasable(spark):
    from duck_delta_share_spark.operators.sessionize import pack_sequences

    docs = spark.createDataFrame(
        [(f"d{i:03d}", "w " * (i % 7 + 1)) for i in range(50)],
        "doc_id string, text string",
    )
    before = _cached_rdd_ids(spark)
    out = pack_sequences(docs, capacity_tokens=8, num_range_partitions=4)
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple, out.collect()))  # recompute must agree (literal boundaries)
    assert a == b
    # only the narrow (id, n_tokens) projection is cached — evaluating the
    # upstream lineage once — and the handle releases it deterministically
    introduced = _cached_rdd_ids(spark) - before
    assert len(introduced) == 1
    out._pack_sequences_cache.unpersist(blocking=True)
    assert _cached_rdd_ids(spark) & introduced == set()
    # output unaffected by the release (boundaries are plan literals)
    assert sorted(map(tuple, out.collect())) == a
    # bit-identity with the single-range ground truth
    truth = sorted(
        map(tuple, pack_sequences(docs, capacity_tokens=8, num_range_partitions=1).collect())
    )
    assert a == truth


def test_bpe_train_releases_checkpoints(spark):
    from duck_delta_share_spark.operators.bpe import train_bpe_merges

    df = spark.createDataFrame(
        [("low lower lowest newest widest",)] * 4, "text string"
    )
    before = _cached_rdd_ids(spark)
    merges = train_bpe_merges(df, n_merges=5)
    assert merges  # learned something
    assert _cached_rdd_ids(spark) - before == set()


def test_connected_components_release_checkpoints(spark):
    from duck_delta_share_spark.operators.components import connected_components

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "id_a long, id_b long"
    )
    before = _cached_rdd_ids(spark)
    for algo in ("star", "hashmin"):
        # gate off so the star LOOP actually runs — the happy-path
        # release invariant under test lives in the loop (r13)
        out = connected_components(edges, algorithm=algo, driver_gate_edges=0)
        got = {r["component"] for r in out.collect()}
        assert got == {0}
    # the FINAL round's checkpoint backs the returned plan and is only
    # reclaimable by GC once the frame drops — allow at most one per algo
    assert len(_cached_rdd_ids(spark) - before) <= 2
