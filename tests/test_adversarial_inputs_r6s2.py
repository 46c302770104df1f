"""Adversarial-input lens (r6 session 2): degenerate inputs — empty
frames, NULL/empty/zero-norm vectors, ragged dimensions — must either
produce correct results or fail with an error naming the actual
problem, never a deep numpy shape error or a VOID-typed lambda."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _emb(spark, rows):
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")


def test_assign_nearest_centroid_empty_input_is_loud(spark):
    from duck_delta_share_spark.operators.dedup import assign_nearest_centroid

    with pytest.raises(ValueError, match="no centroid rows"):
        assign_nearest_centroid(_emb(spark, []), k=3).count()


def test_kmeans_and_semantic_dedup_empty_input_are_loud(spark):
    from duck_delta_share_spark.operators.dedup import semantic_dedup
    from duck_delta_share_spark.operators.embeddings import kmeans_lloyd_update

    with pytest.raises(ValueError, match="no centroid rows"):
        kmeans_lloyd_update(_emb(spark, []), k=3).count()
    with pytest.raises(ValueError, match="no centroid rows"):
        semantic_dedup(_emb(spark, []), k=3, threshold=0.5).count()


def test_near_dup_pairs_skips_null_empty_zero_vectors(spark):
    from duck_delta_share_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    df = _emb(
        spark,
        [
            (1, None),
            (2, []),
            (3, [0.0, 0.0]),
            (4, [1.0, 0.0]),
            (5, [1.0, 0.0]),
        ],
    ).withColumn("label", F.lit(0))
    for scorer in ("block", "arrow", "expr"):
        got = {
            (r.id_a, r.id_b)
            for r in embedding_near_dup_pairs(
                df, block_col="label", threshold=0.9, scorer=scorer
            ).collect()
        }
        assert got == {(4, 5)}, f"scorer={scorer}: {got}"


def test_near_dup_pairs_ragged_dims_fail_with_named_error(spark):
    from duck_delta_share_spark.operators.similarity import (
        embedding_near_dup_pairs,
    )

    df = _emb(spark, [(1, [1.0]), (2, [1.0, 0.0])]).withColumn(
        "label", F.lit(0)
    )
    with pytest.raises(Exception, match="ragged embedding dimensions"):
        embedding_near_dup_pairs(
            df, block_col="label", threshold=0.5, scorer="block"
        ).collect()


def test_kmeans_k_above_n_still_works(spark):
    from duck_delta_share_spark.operators.embeddings import kmeans_lloyd_update

    out = kmeans_lloyd_update(_emb(spark, [(1, [1.0, 0.0])]), k=5)
    assert out.count() == 2  # one cluster x two dims
