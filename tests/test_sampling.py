"""Stratified sampling: seeded determinism + per-stratum proportions
within binomial tolerance.

r10: the registry query is now the AUDIT shape (exact n_in twin +
frac_e6 literal + 6-sigma within_binomial_bound boolean the oracle
asserts TRUE — the r9 sketch exact-twin pattern), so the row-level
checks here run df.sampleBy directly with the query's parameters.
"""

from __future__ import annotations

from duck_delta_share_spark.catalog import load_table
from duck_delta_share_spark.plans import QUERIES
from tests.conftest import SF_DIR

FRACTIONS = {"en": 0.3, "de": 1.0, "fr": 1.0, "es": 1.0, "zh": 1.0}


def test_stratified_draw_deterministic_and_proportional(spark):
    d = load_table(spark, SF_DIR, "documents")
    a = {r.doc_id for r in d.sampleBy("lang", FRACTIONS, seed=42).collect()}
    b = {r.doc_id for r in d.sampleBy("lang", FRACTIONS, seed=42).collect()}
    assert a == b, "same seed must give the same sample"

    totals = {
        r.lang: r.n
        for r in d.groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    got = {
        r.lang: r.n
        for r in d.sampleBy("lang", FRACTIONS, seed=42)
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    # en downsampled to ~30%: allow 4 sigma of binomial noise
    n, p = totals["en"], 0.3
    sigma = (n * p * (1 - p)) ** 0.5
    assert abs(got.get("en", 0) - n * p) <= 4 * sigma
    for lang in ("de", "fr", "es", "zh"):
        assert got.get(lang, 0) == totals[lang], f"{lang} must be kept fully"


def test_stratified_sample_audit_matches_raw_draw(spark):
    """The audit query's n_in and bound boolean must agree with an
    independent recomputation of the same seeded draw."""
    out = {r.lang: r for r in QUERIES["stratified_sample"].spark_fn(
        spark, SF_DIR
    ).collect()}
    d = load_table(spark, SF_DIR, "documents")
    totals = {
        r.lang: r.n
        for r in d.groupBy("lang").count().withColumnRenamed("count", "n").collect()
    }
    drawn = {
        r.lang: r.n
        for r in d.sampleBy("lang", FRACTIONS, seed=42)
        .groupBy("lang")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    assert set(out) == set(FRACTIONS) & set(totals)
    for lang, row in out.items():
        p = FRACTIONS[lang]
        assert row.n_in == totals[lang]
        assert row.frac_e6 == int(round(p * 1e6))
        assert row.within_binomial_bound is True
        mean = totals[lang] * p
        sigma = (totals[lang] * p * (1 - p)) ** 0.5
        assert abs(drawn.get(lang, 0) - mean) <= 6 * sigma + 1
