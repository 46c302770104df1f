"""IVFPQ (FAISS IVFADC): recall on clustered data, probe dial, rerank
refine, determinism."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.operators.similarity import (
    brute_force_topk,
    ivfpq_topk,
)
from tests.conftest import SF_DIR


def _clustered(spark, n=400, dim=16, n_clusters=8, seed=3):
    rng = np.random.RandomState(seed)
    centers = rng.randn(n_clusters, dim) * 3
    # noise 1.5: neighbor score GAPS must exceed ADC resolution for raw
    # recall to mean anything; tighter clusters are the rerank test below
    X = centers[rng.randint(n_clusters, size=n)] + rng.randn(n, dim) * 1.5
    return spark.createDataFrame(
        [(i, X[i].tolist()) for i in range(n)],
        "vec_id bigint, embedding array<double>",
    )


def _recall(approx, exact):
    a = {(r.query_id, r.vec_id) for r in approx.collect()}
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    return len(a & e) / len(e)


def test_ivfpq_recall_on_clustered_data(spark):
    base = _clustered(spark)
    q = base.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(base, q, k=5)
    got = ivfpq_topk(base, q, dim=16, k=5, n_centroids=8, n_probe=3, m=4, k_codes=32)
    assert _recall(got, exact) >= 0.4  # raw ADC, partial probes


def test_ivfpq_rerank_improves(spark):
    base = _clustered(spark)
    q = base.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(base, q, k=5)
    raw = ivfpq_topk(base, q, dim=16, k=5, n_centroids=8, n_probe=8, m=4, k_codes=32)
    refined = ivfpq_topk(
        base, q, dim=16, k=5, n_centroids=8, n_probe=8, m=4, k_codes=32,
        rerank_factor=8,
    )
    assert _recall(refined, exact) >= _recall(raw, exact)
    assert _recall(refined, exact) >= 0.9  # full probe + rerank ≈ exact


def test_ivfpq_probe_dial_monotone(spark):
    base = _clustered(spark)
    q = base.filter(F.col("vec_id") < 8)
    exact = brute_force_topk(base, q, k=5)
    r1 = _recall(ivfpq_topk(base, q, dim=16, k=5, n_centroids=8, n_probe=1, m=4), exact)
    r8 = _recall(ivfpq_topk(base, q, dim=16, k=5, n_centroids=8, n_probe=8, m=4), exact)
    assert r8 >= r1


def test_ivfpq_deterministic_on_fixture(spark):
    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivfpq_topk(e, q, dim=64, k=5, n_centroids=8, n_probe=2).collect()))
    b = sorted(map(tuple, ivfpq_topk(e, q, dim=64, k=5, n_centroids=8, n_probe=2).collect()))
    assert a == b and len(a) == 25


def test_ivfpq_lossless_equals_int8_exact_scan(spark):
    """The exact-dials composition (n_probe = n_centroids + lossless
    int8-lattice codebooks) must reproduce int8_topk BIT-FOR-BIT — the
    composition proof behind the similarity_ann_ivfpq_lossless oracle
    (VERDICT r11 item 3). Clustered corpus so the IVF lists are
    non-trivial, plus a zero vector (no cosine — both sides must drop
    it) and duplicate vectors (tie-break determinism)."""
    from duck_delta_share_spark.operators.similarity import (
        int8_topk,
        ivfpq_lossless_topk,
    )

    df = _clustered(spark, n=120, dim=16, n_clusters=5, seed=11)
    rows = df.collect()
    dup = [(1000, rows[3].embedding), (1001, rows[3].embedding)]
    zero = [(1002, [0.0] * 16)]
    df = df.unionByName(
        spark.createDataFrame(
            dup + zero, "vec_id bigint, embedding array<double>"
        )
    )
    queries = df.filter(F.col("vec_id").isin([0, 1, 2, 1000, 1002]))
    got = sorted(
        map(
            tuple,
            ivfpq_lossless_topk(
                df, queries, dim=16, k=4, n_centroids=6, m=4
            ).collect(),
        )
    )
    want = sorted(map(tuple, int8_topk(df, queries, k=4).collect()))
    assert got == want
    # the zero vector produced no query group and is in no result
    assert all(q != 1002 and v != 1002 for q, v, _, _ in got)


def test_ivfpq_lossless_on_fixture_matches_int8(spark):
    """Same proof on the real embeddings fixture (64-dim, the registered
    query's geometry)."""
    from duck_delta_share_spark.operators.similarity import (
        int8_topk,
        ivfpq_lossless_topk,
    )

    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter(F.col("vec_id") < 10)
    got = sorted(
        map(
            tuple,
            ivfpq_lossless_topk(e, q, dim=64, k=5, n_centroids=16, m=8).collect(),
        )
    )
    want = sorted(map(tuple, int8_topk(e, q, k=5).collect()))
    assert got == want
