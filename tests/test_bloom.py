"""Bloom semi-join: exactness (bloom is a pre-filter, never an answer),
pruning effectiveness, superset property of the probe, null-key
semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from duck_delta_share_spark.operators.bloom import (
    bloom_might_contain,
    bloom_semi_join,
    build_bloom_bitset,
)


def test_bloom_semi_join_is_exact(spark):
    large = spark.range(0, 20_000).selectExpr("id % 997 as k", "id as payload")
    small = spark.range(0, 40).selectExpr("id * 13 as k")
    got = sorted(
        (r.k, r.payload) for r in bloom_semi_join(large, small, "k").collect()
    )
    want = sorted(
        (r.k, r.payload)
        for r in large.join(small, "k", "left_semi").collect()
    )
    assert got == want and len(got) > 0


def test_probe_is_superset_and_prunes(spark):
    large = spark.range(0, 50_000).selectExpr("id % 9973 as k")
    small = spark.range(0, 25).selectExpr("id * 311 as k")
    bits = build_bloom_bitset(small, "k")
    survivors = bloom_might_contain(large, "k", bits).count()
    exact = large.join(small, "k", "left_semi").count()
    assert survivors >= exact, "bloom dropped a true match"
    # 25 keys of 9973 + fp rate ~0: survivors must be a tiny fraction
    assert survivors < 0.05 * 50_000, f"bloom pruned nothing ({survivors})"


def test_mismatched_integral_key_widths_are_exact(spark):
    """xxhash64(int32) != xxhash64(int64) for the same value — without the
    canonical bigint cast a mixed-width build/probe pair silently DROPS
    every true match (false negatives, ADVICE r3)."""
    large = spark.range(0, 5_000).selectExpr(
        "cast(id % 97 as int) as k", "id as payload"
    )
    small = spark.range(0, 10).selectExpr("cast(id * 7 as bigint) as k")
    got = sorted(
        (r.k, r.payload)
        for r in bloom_semi_join(large, small, "k").collect()
    )
    want = sorted(
        (r.k, r.payload) for r in large.join(small, "k", "left_semi").collect()
    )
    assert got == want and len(got) > 0


def test_null_keys_never_match(spark):
    large = spark.createDataFrame(
        [(None, 1), (5, 2), (6, 3)], "k long, payload long"
    )
    small = spark.createDataFrame([(5,), (None,)], "k long")
    got = [(r.k, r.payload) for r in bloom_semi_join(large, small, "k").collect()]
    assert got == [(5, 2)]
