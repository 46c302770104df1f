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
    exact = {
        (r.query_id, r.vec_id)
        for r in QUERIES["similarity_topk_exact"].spark_fn(spark, SF_DIR).collect()
    }
    ann = {
        (r.query_id, r.vec_id)
        for r in QUERIES["similarity_ann_lsh"].spark_fn(spark, SF_DIR).collect()
    }
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.5, f"recall@5 {recall:.2f} below LSH-theory envelope"
