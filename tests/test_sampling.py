"""Stratified sampling: seeded determinism + per-stratum proportions
within binomial tolerance."""

from __future__ import annotations

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.plans import QUERIES
from tests.conftest import SF_DIR


def test_stratified_sample_deterministic_and_proportional(spark):
    fn = QUERIES["stratified_sample"].spark_fn
    a = {r.doc_id for r in fn(spark, SF_DIR).collect()}
    b = {r.doc_id for r in fn(spark, SF_DIR).collect()}
    assert a == b, "same seed must give the same sample"

    totals = {
        r.lang: r.n
        for r in load_table(spark, SF_DIR, "documents").groupBy("lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    got = {
        r.lang: r.n
        for r in fn(spark, SF_DIR).groupBy("lang").count()
        .withColumnRenamed("count", "n").collect()
    }
    # en downsampled to ~30%: allow 4 sigma of binomial noise
    n, p = totals["en"], 0.3
    sigma = (n * p * (1 - p)) ** 0.5
    assert abs(got.get("en", 0) - n * p) <= 4 * sigma
    for lang in ("de", "fr", "es", "zh"):
        assert got.get(lang, 0) == totals[lang], f"{lang} must be kept fully"
