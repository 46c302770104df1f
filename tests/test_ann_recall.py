"""ANN recall validation: multi-table sign-LSH recall must track the
(k,L)-LSH theory — recall = 1-(1-p^k)^L with p = 1-θ/π — on the synthetic
embeddings (median top-5 cosine ≈ 0.37 → p ≈ 0.62; k=4, L=8 → ≈ 0.72).
The assertion bound (0.5) sits >3σ below the theoretical mean over the 50
query-neighbor pairs, so failure means the implementation broke, not bad
luck."""

from __future__ import annotations

from duck_delta_share_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_ann_recall_tracks_lsh_theory(spark):
    """Float-Gaussian production path (lsh_bucket_topk) — driven directly
    since r11, when the registry entry switched to the oracled
    integer-lattice twin."""
    import pyspark.sql.functions as F

    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.operators.similarity import lsh_bucket_topk

    exact = {
        (r.query_id, r.vec_id)
        for r in QUERIES["similarity_topk_exact"].spark_fn(spark, SF_DIR).collect()
    }
    e = load_table(spark, SF_DIR, "embeddings")
    ann = {
        (r.query_id, r.vec_id)
        for r in lsh_bucket_topk(
            e, e.filter(F.col("vec_id") < 10), dim=64, k=5
        ).collect()
    }
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.5, f"recall@5 {recall:.2f} below LSH-theory envelope"


def test_lattice_ann_recall_tracks_lsh_theory(spark):
    """The md5-integer-lattice twin (the oracled registry entry) must sit
    in the same (k,L) recall envelope: lattice directions are uniform on
    the integer grid, and the sign-collision probability is the same
    monotone function of pair angle (measured 0.70 at sf0.001 / 0.76 at
    sf0.1 vs the float path's 0.68)."""
    exact = {
        (r.query_id, r.vec_id)
        for r in QUERIES["similarity_topk_exact"].spark_fn(spark, SF_DIR).collect()
    }
    ann = {
        (r.query_id, r.vec_id)
        for r in QUERIES["similarity_ann_lsh"].spark_fn(spark, SF_DIR).collect()
    }
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.5, f"lattice recall@5 {recall:.2f} below envelope"


def test_ann_clustered_preset_high_recall(spark):
    """The 'clustered' preset (k=6, L=8) must reach ~0.9 recall on data
    with tight clusters (neighbor cosine ~0.8 → p ≈ 0.8; theory 0.90).
    Bound 0.75 is >3σ below the mean over 20 query-neighbor sets."""
    import numpy as np

    from duck_delta_share_spark.operators.similarity import lsh_bucket_topk

    rng = np.random.default_rng(7)
    dim, n_clusters, per = 16, 20, 10
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    base = []
    for c in range(n_clusters):
        pts = centers[c] + 0.35 * rng.normal(size=(per, dim))
        base.extend(
            (c * per + i, (pts[i] / np.linalg.norm(pts[i])).tolist())
            for i in range(per)
        )
    queries = [
        (10_000 + c, (centers[c] / np.linalg.norm(centers[c])).tolist())
        for c in range(n_clusters)
    ]
    bdf = spark.createDataFrame(base, ["vec_id", "embedding"])
    qdf = spark.createDataFrame(queries, ["vec_id", "embedding"])

    B = np.array([v for _, v in base])
    exact = set()
    for qid, qv in queries:
        top = np.argsort(-(B @ np.array(qv)))[:5]
        exact.update((qid, base[i][0]) for i in top)

    ann = {
        (r.query_id, r.vec_id)
        for r in lsh_bucket_topk(
            bdf, qdf, dim=dim, k=5, preset="clustered"
        ).collect()
    }
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.75, f"clustered-preset recall@5 {recall:.2f}"


def test_block_scorer_matches_pair_join_scorer(spark):
    """The applyInPandas per-block matmul (100 TB shape: one shuffle row
    per vector, no pair-row materialization) must produce the same pair
    set and cosines as the older pair-join scorer."""
    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.operators.similarity import embedding_near_dup_pairs

    e = load_table(spark, SF_DIR, "embeddings")
    block = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup_pairs(
            e, block_col="label", threshold=0.4, scorer="block"
        ).collect()
    }
    joined = {
        (r.id_a, r.id_b): r.cosine
        for r in embedding_near_dup_pairs(
            e, block_col="label", threshold=0.4, scorer="arrow"
        ).collect()
    }
    assert block.keys() == joined.keys() and len(block) > 0
    for k in block:
        assert abs(block[k] - joined[k]) < 1e-12


def test_ivf_recall_on_clustered_data(spark):
    """IVF is the data-ADAPTIVE ANN path: on clustered data (the realistic
    embedding-space shape) centroids land on the clusters and multi-probe
    recall should beat the data-oblivious LSH preset. n_probe=4 of 20
    centroids scans ~20% of the corpus; bound 0.85 is conservative for
    structure this clean."""
    import numpy as np

    from duck_delta_share_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(11)
    dim, n_clusters, per = 16, 20, 10
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    base = []
    for c in range(n_clusters):
        pts = centers[c] + 0.35 * rng.normal(size=(per, dim))
        base.extend(
            (c * per + i, (pts[i] / np.linalg.norm(pts[i])).tolist())
            for i in range(per)
        )
    queries = [
        (10_000 + c, (centers[c] / np.linalg.norm(centers[c])).tolist())
        for c in range(n_clusters)
    ]
    bdf = spark.createDataFrame(base, ["vec_id", "embedding"])
    qdf = spark.createDataFrame(queries, ["vec_id", "embedding"])

    B = np.array([v for _, v in base])
    exact = set()
    for qid, qv in queries:
        top = np.argsort(-(B @ np.array(qv)))[:5]
        exact.update((qid, base[i][0]) for i in top)

    ann = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(
            bdf, qdf, dim=dim, k=5, n_centroids=n_clusters, n_probe=4
        ).collect()
    }
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.85, f"IVF recall@5 {recall:.2f} on clustered data"


def test_ivf_determinism_and_probe_dial(spark):
    """Same seed → identical results; n_probe = n_centroids → exact scan
    (recall 1.0 vs brute force)."""
    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    e = load_table(spark, SF_DIR, "embeddings")
    q = e.filter("vec_id < 5")
    r1 = {(r.query_id, r.vec_id) for r in ivf_topk(e, q, dim=64, n_centroids=16, n_probe=4).collect()}
    r2 = {(r.query_id, r.vec_id) for r in ivf_topk(e, q, dim=64, n_centroids=16, n_probe=4).collect()}
    assert r1 == r2 and len(r1) > 0
    full = {
        (r.query_id, r.vec_id)
        for r in ivf_topk(e, q, dim=64, n_centroids=16, n_probe=16).collect()
    }
    exact = {(r.query_id, r.vec_id) for r in brute_force_topk(e, q, k=5, exact=False).collect()}
    assert full == exact, "n_probe=n_centroids must equal the exact scan"
