"""Distributed PCA + int8 quantization: partials/combine-tree correctness
vs in-memory numpy, sign-pinned determinism, quantization error bounds."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.operators.embeddings import (
    dequantize_int8,
    int8_scale,
    moments,
    pca_project,
    principal_components,
    quantize_int8,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_DIR, "embeddings").cache()


def _local_matrix(emb):
    return np.stack([np.asarray(r.embedding, dtype=np.float64) for r in emb.collect()])


def test_moments_match_numpy(emb):
    mat = _local_matrix(emb)
    n, mean, cov = moments(emb, "embedding")
    assert n == mat.shape[0]
    assert np.allclose(mean, mat.mean(axis=0), atol=1e-12)
    assert np.allclose(cov, np.cov(mat, rowvar=False), atol=1e-10)


def test_moments_survive_many_partitions_via_combine_tree(emb):
    mat = _local_matrix(emb)
    many = emb.repartition(97)
    n, mean, cov = moments(many, "embedding", combine_width=8)
    assert n == mat.shape[0]
    assert np.allclose(cov, np.cov(mat, rowvar=False), atol=1e-10)


def test_principal_components_properties(emb):
    comps, ratio, mean = principal_components(emb, "embedding", k=8)
    assert comps.shape == (64, 8)
    # orthonormal columns
    assert np.allclose(comps.T @ comps, np.eye(8), atol=1e-10)
    # explained variance sorted descending, each in (0, 1]
    assert all(ratio[i] >= ratio[i + 1] for i in range(len(ratio) - 1))
    assert 0 < ratio.sum() <= 1 + 1e-12
    # sign pinning: the largest-|entry| coordinate of each component is +
    for j in range(comps.shape[1]):
        i = int(np.argmax(np.abs(comps[:, j])))
        assert comps[i, j] > 0


def test_projection_variance_ordering_and_determinism(emb):
    out1 = pca_project(emb, "embedding", k=4).select("vec_id", "pca").collect()
    out2 = pca_project(emb, "embedding", k=4).select("vec_id", "pca").collect()
    a = {r.vec_id: tuple(r.pca) for r in out1}
    b = {r.vec_id: tuple(r.pca) for r in out2}
    assert a == b  # same covariance input -> identical projections

    proj = np.stack([np.asarray(r.pca) for r in out1])
    var = proj.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-12 for i in range(len(var) - 1))
    # projections are centered
    assert np.allclose(proj.mean(axis=0), 0, atol=1e-9)


def test_quantize_roundtrip_error_bounded(emb, spark):
    scale = int8_scale("embedding")
    df = emb.select(
        "embedding",
        scale.alias("scale"),
        dequantize_int8(quantize_int8("embedding", scale), scale).alias("deq"),
    )
    err = df.select(
        F.array_max(
            F.zip_with(
                "embedding", "deq", lambda x, y: F.abs(x.cast("double") - y)
            )
        ).alias("max_err"),
        F.col("scale"),
    )
    bad = err.filter(F.col("max_err") > F.col("scale") / 2 + 1e-15).count()
    assert bad == 0


def test_quantize_zero_vector(spark):
    df = spark.createDataFrame([([0.0] * 4,)], "embedding array<float>")
    scale = int8_scale("embedding")
    row = df.select(quantize_int8("embedding", scale).alias("q")).first()
    assert row.q == [0, 0, 0, 0]


def test_semantic_dedup_mechanics(spark):
    """semantic_dedup (SemDeDup): hand-built corpus with two obvious
    semantic clusters — near-identical vectors collapse to the lowest id,
    orthogonal vectors survive, centroid assignment is deterministic."""
    import math

    from duck_delta_share_spark.operators.dedup import semantic_dedup

    def unit(*xs):
        n = math.sqrt(sum(x * x for x in xs))
        return [x / n for x in xs]

    rows = [
        # cluster around e1: ids 0 (centroid), 2, 3 near-dups of each other
        (0, unit(1.0, 0.0, 0.05, 0.0)),
        (2, unit(1.0, 0.01, 0.0, 0.0)),
        (3, unit(0.99, 0.0, 0.01, 0.0)),
        # cluster around e2: ids 1 (centroid), 4 near-dup, 5 far
        (1, unit(0.0, 1.0, 0.0, 0.05)),
        (4, unit(0.01, 1.0, 0.0, 0.0)),
        (5, unit(0.3, -0.7, 0.6, 0.0)),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r.vec_id: (r.cluster_id, r.kept)
        for r in semantic_dedup(df, k=2, threshold=0.9).collect()
    }
    # centroids are ids 0 and 1 (lowest ids); e1-ish vectors go to 0
    assert out[0] == (0, 1) and out[2] == (0, 0) and out[3] == (0, 0)
    assert out[1] == (1, 1) and out[4] == (1, 0)
    assert out[5][1] == 1  # far vector survives regardless of its cluster
    # idempotence of the keep rule: re-running on the survivors drops none
    kept_ids = [i for i, (_, k) in out.items() if k == 1]
    df2 = df.where(F.col("vec_id").isin(kept_ids))
    out2 = semantic_dedup(df2, k=2, threshold=0.9).collect()
    assert all(r.kept == 1 for r in out2)


def test_semantic_dedup_oversized_cluster_fails_loud(spark):
    """An adversarial all-near-identical corpus collapses into ONE cluster;
    the default posture must fail loudly inside the task instead of
    silently attempting quadratic work (VERDICT r5 #4)."""
    from duck_delta_share_spark.operators.dedup import semantic_dedup

    rows = [
        (i, [1.0, 1e-6 * i, 0.0, 0.0]) for i in range(64)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    with pytest.raises(Exception, match="max_cluster_size"):
        semantic_dedup(df, k=4, threshold=0.9, max_cluster_size=16).collect()


def test_semantic_dedup_oversize_shard_bounds_groups(spark):
    """oversize='shard' splits the degenerate cluster into hash shards:
    every group stays bounded, the lowest id in each shard survives, and
    near-identical vectors still dedup within their shard."""
    from duck_delta_share_spark.operators.dedup import semantic_dedup

    n, cap = 64, 16
    rows = [(i, [1.0, 1e-6 * i, 0.0, 0.0]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(
        df, k=1, threshold=0.9, max_cluster_size=cap, oversize="shard"
    ).collect()
    assert len(out) == n  # every vector classified exactly once
    kept = sorted(r.vec_id for r in out if r.kept == 1)
    # k=1 -> ONE cluster of 64 -> ceil(64/16) = 4 hash shards -> exactly
    # one survivor per non-empty shard
    assert 1 <= len(kept) <= 4
    assert 0 < len([r for r in out if r.kept == 0])
    # normal-sized corpora are untouched by shard mode (shard 0 for all)
    small = spark.createDataFrame(rows[:8], "vec_id long, embedding array<double>")
    a = sorted((r.vec_id, r.kept) for r in semantic_dedup(
        small, k=1, threshold=0.9, max_cluster_size=cap, oversize="shard"
    ).collect())
    b = sorted((r.vec_id, r.kept) for r in semantic_dedup(
        small, k=1, threshold=0.9, max_cluster_size=cap
    ).collect())
    assert a == b


def test_semantic_dedup_row_blocked_matmul_matches_unblocked(spark, monkeypatch):
    """The row-blocked similarity pass must agree with the keep rule
    computed directly. Lowering _SEMDEDUP_ROW_BLOCK to 7 on a 40-vector
    corpus forces MULTIPLE blocks per cluster (including a ragged final
    block), exercising the ids[s:e] offset indexing and kept[s:e]
    assignment — not just the degenerate block >= n path."""
    import numpy as np

    import duck_delta_share_spark.operators.dedup as dd_mod
    from duck_delta_share_spark.operators.dedup import semantic_dedup

    monkeypatch.setattr(dd_mod, "_SEMDEDUP_ROW_BLOCK", 7)
    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 6)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    tau = 0.55
    out = {
        r.vec_id: (r.cluster_id, r.kept)
        for r in semantic_dedup(df, k=3, threshold=tau).collect()
    }
    # brute-force reference for the keep rule within each cluster
    by_cluster = {}
    for i, (cid, _) in out.items():
        by_cluster.setdefault(cid, []).append(i)
    norms = np.sqrt((vecs * vecs).sum(axis=1))
    for cid, ids in by_cluster.items():
        for i in ids:
            expect = 1
            for j in ids:
                if j < i:
                    cos = vecs[i] @ vecs[j] / (norms[i] * norms[j])
                    if cos > tau:
                        expect = 0
            assert out[i][1] == expect, (cid, i)


def test_kmeans_lloyd_update_composes_iteratively(spark):
    """kmeans_lloyd_update: one round computes exact per-cluster means,
    and the O(k*d) driver feedback loop composes — two rounds on a
    well-separated corpus converge to the true cluster centers."""
    import math

    from duck_delta_share_spark.operators.embeddings import kmeans_lloyd_update

    def unit(*xs):
        n = math.sqrt(sum(x * x for x in xs))
        return [x / n for x in xs]

    # two tight direction-clusters; ids 0 and 1 are the (poor) seeds
    rows = [
        (0, unit(1.0, 0.2, 0.0)),
        (1, unit(0.2, 1.0, 0.0)),
        (2, unit(1.0, 0.0, 0.1)),
        (3, unit(0.9, 0.1, 0.0)),
        (4, unit(0.0, 1.0, 0.1)),
        (5, unit(0.1, 0.9, 0.0)),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def run_round(cents_df):
        out = kmeans_lloyd_update(df, k=2, centroids=cents_df).collect()
        sizes = {}
        means: dict[int, list] = {}
        for r in sorted(out, key=lambda r: (r.cluster_id, r.dim)):
            means.setdefault(r.cluster_id, []).append(r.mean_val)
            sizes[r.cluster_id] = r.n_members
        return means, sizes

    means, sizes = run_round(None)
    assert sorted(sizes.values()) == [3, 3]
    # exact mean check for the e1-ish cluster (ids 0, 2, 3)
    expect = [sum(rows[i][1][d] for i in (0, 2, 3)) / 3 for d in range(3)]
    got = means[0]
    assert all(abs(g - e) < 1e-6 for g, e in zip(got, expect))

    # feed the means back as round-2 centroids (the driver loop)
    cents = spark.createDataFrame(
        [(cid, v) for cid, v in means.items()],
        "vec_id long, embedding array<double>",
    )
    means2, sizes2 = run_round(cents)
    assert sorted(sizes2.values()) == [3, 3]  # assignment is stable now
    assert all(
        abs(a - b) < 1e-9 for a, b in zip(means2[0], means[0])
    )  # converged: second update is a fixed point


def test_semantic_dedup_keep_rule_property(spark):
    """Property (hypothesis): on random small corpora, semantic_dedup's
    kept set equals the brute-force rule — dropped iff a LOWER-id vector
    in the same (argmax-cosine, lowest-cid-tie) cluster has cosine >
    threshold."""
    import math
    import random

    from duck_delta_share_spark.operators.dedup import semantic_dedup

    rng = random.Random(20260814)
    for trial in range(3):
        n, d, k, tau = 24, 6, 4, 0.8
        vecs = []
        for i in range(n):
            base = [rng.gauss(0, 1) for _ in range(d)]
            if i % 3 == 0 and i > 0:
                # perturbed copy of an earlier vector — guarantees near-dups
                src = vecs[rng.randrange(0, i)][1]
                base = [x + rng.gauss(0, 0.05) for x in src]
            nrm = math.sqrt(sum(x * x for x in base)) or 1.0
            vecs.append((i, [x / nrm for x in base]))
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        got = {
            r.vec_id: (r.cluster_id, r.kept)
            for r in semantic_dedup(df, k=k, threshold=tau).collect()
        }

        def cos(a, b):
            return sum(x * y for x, y in zip(a, b))

        cents = vecs[:k]
        assign = {}
        for i, v in vecs:
            scored = sorted(
                ((cos(v, cv), -cid) for cid, cv in cents), reverse=True
            )
            assign[i] = -scored[0][1]
        by_vec = dict(vecs)
        for i, v in vecs:
            dropped = any(
                j < i and assign[j] == assign[i] and cos(by_vec[j], v) > tau
                for j, _ in vecs
            )
            assert got[i] == (assign[i], 0 if dropped else 1), (
                f"trial {trial} vec {i}: got {got[i]}, want "
                f"({assign[i]}, {0 if dropped else 1})"
            )
