"""LSH bucket-size caps (VERDICT r1 'What's wrong #3') and the
simhash_near_pairs bit-width parameter (ADVICE r1).

Pair generation is quadratic in bucket size; one degenerate bucket
(boilerplate docs sharing a band) emits |bucket|²/2 pairs that AQE can
split across tasks but cannot shrink. The cap must drop such buckets
BEFORE the self-join while leaving healthy buckets untouched.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from duck_delta_share_spark.operators.dedup import (
    lsh_candidate_pairs,
    simhash_near_pairs,
)

N_HASHES = 8
BANDS = 4


def _sig_rows(spark, clones_a: int, clones_b: int):
    """clones_a docs with identical signature S_A, clones_b with S_B —
    every band bucket holds exactly one clone group."""
    rows = [(i, *[7] * N_HASHES) for i in range(clones_a)]
    rows += [(1000 + i, *[13] * N_HASHES) for i in range(clones_b)]
    cols = ["doc_id"] + [f"mh_{i}" for i in range(N_HASHES)]
    return spark.createDataFrame(rows, cols)


def test_hot_bucket_dropped_by_cap(spark):
    sigs = _sig_rows(spark, clones_a=30, clones_b=5)
    capped = lsh_candidate_pairs(
        sigs, num_hashes=N_HASHES, bands=BANDS, max_bucket_size=10
    ).collect()
    # the 30-clone group exceeds the cap in every band -> zero pairs from it;
    # the 5-clone group survives intact: C(5,2)=10 pairs, all bands shared
    assert len(capped) == 10
    assert all(r["id_a"] >= 1000 and r["n_shared_bands"] == BANDS for r in capped)


def test_cap_disabled_keeps_quadratic_pairs(spark):
    sigs = _sig_rows(spark, clones_a=30, clones_b=5)
    full = lsh_candidate_pairs(
        sigs, num_hashes=N_HASHES, bands=BANDS, max_bucket_size=None
    )
    assert full.count() == 30 * 29 // 2 + 10


def test_cap_default_transparent_on_healthy_buckets(spark):
    sigs = _sig_rows(spark, clones_a=30, clones_b=5)
    default = lsh_candidate_pairs(sigs, num_hashes=N_HASHES, bands=BANDS)
    assert default.count() == 30 * 29 // 2 + 10  # default cap 2000 >> 30


def test_simhash_near_pairs_bits_parameter(spark):
    """64-bit signatures must block on the top prefix of 64 bits, not of a
    hardcoded 48 (which silently splits true near-dups into different
    blocks)."""
    v1 = (1 << 60) | (1 << 40)
    v2 = 1 << 60  # hamming(v1, v2) = 1; same top-12-of-64 prefix
    sig = spark.createDataFrame([(1, v1), (2, v2)], ["doc_id", "simhash"])
    ok = simhash_near_pairs(sig, max_hamming=8, prefix_bits=12, bits=64).collect()
    assert [(r["id_a"], r["id_b"], r["hamming"]) for r in ok] == [(1, 2, 1)]
    # the old hardcoded-48 shift puts them in different blocks -> pair missed
    missed = simhash_near_pairs(sig, max_hamming=8, prefix_bits=12, bits=48).collect()
    assert missed == []


def test_simhash_hot_block_capped(spark):
    rows = [(i, 1 << 20) for i in range(25)] + [(100, 1 << 40), (101, (1 << 40) | 1)]
    sig = spark.createDataFrame(rows, ["doc_id", "simhash"])
    capped = simhash_near_pairs(
        sig, max_hamming=8, prefix_bits=12, bits=48, max_bucket_size=10
    ).collect()
    assert [(r["id_a"], r["id_b"]) for r in capped] == [(100, 101)]


def test_lsh_plan_tracks_threshold():
    from duck_delta_share_spark.operators.dedup import lsh_plan

    # low thresholds want many bands (aggressive recall), high thresholds
    # want long rows (precision); the characteristic point tracks t
    lo = lsh_plan(0.2, num_hashes=32)
    hi = lsh_plan(0.8, num_hashes=32)
    assert lo["bands"] > hi["bands"]
    assert abs(lo["char_threshold"] - 0.2) < 0.15
    assert abs(hi["char_threshold"] - 0.8) < 0.15
    # bands * rows always consumes the signature exactly
    for t in (0.1, 0.3, 0.5, 0.7, 0.9):
        p = lsh_plan(t, num_hashes=24)
        assert p["bands"] * p["rows"] == 24

    import pytest as _pytest

    with _pytest.raises(ValueError):
        lsh_plan(1.5)


def test_salted_join_equals_plain_join(spark):
    from duck_delta_share_spark.catalog import load_table
    from duck_delta_share_spark.operators.skew import salted_join
    from tests.conftest import SF_DIR

    l = load_table(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
    o = (
        load_table(spark, SF_DIR, "orders")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    salted = salted_join(l, o, ["l_orderkey"], n_salts=4)
    plain = l.join(o, ["l_orderkey"])
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0
    # left join keeps unmatched big-side rows exactly once
    o_half = o.where("l_orderkey % 2 = 0")
    sl = salted_join(l, o_half, ["l_orderkey"], n_salts=4, how="left")
    pl = l.join(o_half, ["l_orderkey"], "left")
    assert sl.count() == pl.count()
    assert sl.exceptAll(pl).count() == 0
