"""Learned quality classifier: the fixture corpus has no natural quality
split (every `lang` shares one vocabulary), so the classic use-case is
reproduced directly — separate clean documents from corrupted twins
(space-stripped / padding-spammed / char-substituted), trained on half
the corpus and evaluated held-out."""

from __future__ import annotations

from pyspark.sql import functions as F

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.operators.quality_model import (
    FEATURE_COLS,
    score_quality,
    text_features,
    train_quality_classifier,
)
from tests.conftest import SF_DIR


def _corpus(spark):
    """originals (label 1) + deterministically corrupted twins (label 0):
    three realistic garbage modes keyed off doc_id."""
    d = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    clean = d.withColumn("label", F.lit(1.0))
    corrupted = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.when(
            F.col("doc_id") % 3 == 0, F.regexp_replace("text", " ", "")
        )
        .when(
            F.col("doc_id") % 3 == 1,
            F.concat(F.col("text"), F.lit(" zz" * 60)),
        )
        .otherwise(F.translate("text", "aeiou", "qqqqq"))
        .alias("text"),
        F.lit(0.0).alias("label"),
    )
    return clean.unionByName(corrupted)


def test_features_deterministic_and_bounded(spark):
    d = _corpus(spark).limit(50)
    a = text_features(d).select("doc_id", *FEATURE_COLS).collect()
    b = text_features(d).select("doc_id", *FEATURE_COLS).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    for r in a:
        assert 0.0 <= r.f_stopword_frac <= 1.0
        assert 0.0 <= r.f_digit_frac <= 1.0
        assert 0.0 <= r.f_distinct_ratio <= 1.0


def test_heldout_accuracy(spark):
    d = _corpus(spark)
    train = d.where("doc_id % 2 = 0")
    test = d.where("doc_id % 2 = 1")
    model = train_quality_classifier(train, "label")
    scored = score_quality(model, test)
    acc = scored.select(
        F.avg(
            ((F.col("quality_prob") > 0.5).cast("double") == F.col("label"))
            .cast("double")
        ).alias("acc")
    ).collect()[0].acc
    assert acc > 0.9, acc


def test_score_schema_and_separation(spark):
    d = _corpus(spark)
    model = train_quality_classifier(d.where("doc_id % 2 = 0"), "label")
    out = score_quality(model, d.where("doc_id % 2 = 1"))
    assert "quality_prob" in out.columns
    vals = [r.quality_prob for r in out.select("quality_prob").collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)
    by = {
        r.label: r.p
        for r in out.groupBy("label").agg(F.avg("quality_prob").alias("p")).collect()
    }
    assert by[1.0] > by[0.0] + 0.3
