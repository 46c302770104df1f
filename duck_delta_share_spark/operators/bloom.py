"""Bloom-filter semi-join pre-filtering — the shuffle-avoidance pattern
for large⋉small joins whose small side is still too big to broadcast as a
hash table, or whose large side should be pruned BEFORE the exchange.

Shape at 100 TB: the build side aggregates k bit positions per key into a
fixed-size bitset (one shuffle of (word, mask) pairs, combiner-friendly
bit_or), the driver collects the BITSET ONLY (m/8 bytes — control plane,
e.g. 128 KiB for m=2²⁰; never key data), and executors drop non-member
rows with a vectorized Arrow batch test before any join shuffle. The
final exact semi join then moves only the survivors — bloom false
positives (~(1-e^{-kn/m})^k) cost extra shuffled rows, never wrong
results, so the operator's output is EXACTLY the semi join and sits
under a plain SQL oracle.

Spark's own runtime row-level filtering (`spark.sql.optimizer.
runtime.bloomFilter.enabled`) applies the same idea inside
shuffle-join plans; this operator makes the pattern explicit, tunable
(m, k), and usable in front of ANY downstream consumer (including the
Python DataSource scans, which Catalyst's runtime filters cannot reach).

xxhash64(seed=i) supplies the k hash functions — JVM-side, one narrow
projection, no Python in the build path.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type-hint resolution
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 20
DEFAULT_NUM_HASHES = 5


def _positions(col, num_bits: int, num_hashes: int):
    # pmod keeps positions non-negative (xxhash64 is signed)
    return F.array(
        *[
            F.pmod(F.xxhash64(F.lit(i), col), F.lit(num_bits))
            for i in range(num_hashes)
        ]
    )


def _canonical_key(df: DataFrame, key_col: str):
    """xxhash64 hashes int32 and int64 values DIFFERENTLY, so mismatched
    integral key types between build and probe sides would yield false
    NEGATIVES (silently dropped matches, not just extra cost — ADVICE r3).
    Canonicalize every integral key to bigint and float to double on BOTH
    sides so membership depends on the value, not the physical width."""
    from pyspark.sql.types import (
        ByteType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
    )

    dt = df.schema[key_col].dataType
    col = F.col(key_col)
    if isinstance(dt, (ByteType, ShortType, IntegerType, LongType)):
        return col.cast("bigint")
    if isinstance(dt, FloatType):
        return col.cast("double")
    return col


def build_bloom_bitset(
    df: DataFrame,
    key_col: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> "np.ndarray":  # noqa: F821
    """Distributed build: k bit positions per key → (word, mask) pairs →
    bit_or per word (map-side combined) → driver assembles the uint64
    bitset. The collect is m/64 longs max, independent of build-side rows.
    """
    import numpy as np

    words = (
        df.select(F.explode(_positions(_canonical_key(df, key_col), num_bits, num_hashes)).alias("pos"))
        .select(
            (F.col("pos") / F.lit(64)).cast("long").alias("w"),
            # python F.shiftleft needs a literal shift; the SQL form takes
            # an expression
            F.expr("shiftleft(1L, cast(pos % 64 as int))").alias("mask"),
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("mask"))
        .collect()
    )
    bits = np.zeros((num_bits + 63) // 64, dtype=np.uint64)
    for r in words:
        bits[r.w] = np.uint64(r.mask & 0xFFFFFFFFFFFFFFFF)
    return bits


def bloom_might_contain(
    df: DataFrame,
    key_col: str,
    bitset: "np.ndarray",  # noqa: F821
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Drop rows whose key is definitely not in the build side. The k
    probe positions are computed JVM-side (same xxhash64 projection as the
    build); the bitset test is one vectorized Arrow batch op per k."""
    import numpy as np

    bits = bitset  # closure-captured; shipped once per python worker

    @F.pandas_udf("boolean")
    def member(pos: pd.Series) -> pd.Series:
        P = np.vstack(pos.to_numpy()).astype(np.int64)
        ok = np.ones(len(P), dtype=bool)
        for j in range(P.shape[1]):
            w = P[:, j] >> 6
            m = np.uint64(1) << (P[:, j] & 63).astype(np.uint64)
            ok &= (bits[w] & m) != 0
        return pd.Series(ok)

    return (
        # NULL keys never match a semi join; dropping them here keeps the
        # probe UDF all-non-null (and matches SQL join semantics exactly)
        df.filter(F.col(key_col).isNotNull())
        .withColumn("__pos", _positions(_canonical_key(df, key_col), num_bits, num_hashes))
        .filter(member(F.col("__pos")))
        .drop("__pos")
    )


def bloom_semi_join(
    large: DataFrame,
    small: DataFrame,
    large_key: str,
    small_key: str | None = None,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """EXACT left-semi join with bloom pre-filtering: only bloom
    survivors reach the join shuffle; the final semi join removes false
    positives, so the result equals ``large ⋉ small`` row-for-row (full
    SQL oracle applies — approximation affects cost, never answers)."""
    small_key = small_key or large_key
    bits = build_bloom_bitset(small, small_key, num_bits, num_hashes)
    pruned = bloom_might_contain(large, large_key, bits, num_bits, num_hashes)
    return pruned.join(
        small.select(F.col(small_key).alias(large_key)).dropDuplicates(),
        large_key,
        "left_semi",
    )
