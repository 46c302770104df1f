"""Deduplication operators for the LLM-data-pipeline surface (§2C):

- exact dedup — hash-groupBy keyed on a fingerprint; one shuffle.
- MinHash + LSH near-dup — shingle → k minhashes → band → bucket join;
  never all-pairs: candidate pairs only form inside an LSH bucket, so the
  shuffle key IS the band hash and skewed buckets split under AQE.
- SimHash — 64-bit signature from token hashes; near-dups = small Hamming
  distance within a prefix bucket.
- n-gram Jaccard — exact set similarity, blocked to avoid O(n²).

Hashing is deterministic everywhere (fixed seeds / stable hash functions),
which is what makes these auditable pipelines at 100 TB. MinHash signature
generation is a pure-JVM xxhash64 expression by default, with an
Arrow-batched crc32+numpy engine (~2× faster once Python workers are warm;
see minhash_signatures docstring) for long-running pipelines; SimHash and
band hashing stay JVM-side (codegen ``xxhash64``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duck_delta_share_spark.functions.text import fingerprint, tokenize, word_shingles


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id row per exact (normalized) text fingerprint.

    Single hash-partition shuffle on the fingerprint; at 100 TB the
    fingerprint (16-byte md5) shuffles instead of the document body.
    """
    w = Window.partitionBy("__fp").orderBy(id_col)
    return (
        df.withColumn("__fp", fingerprint(text_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__fp", "__rn")
    )


# Carter-Wegman family over 31-bit base hashes: deterministic 31-bit
# multipliers/offsets (splitmix64-mixed, seeded by the hash index;
# multiplier odd). With the base masked to 31 bits, a*h + b ≤ 2^62 — no
# int64 overflow, so the JVM expression is legal under ANSI mode (Spark 4
# default). 31-bit minwise hashes are the classic Broder construction.
_CW_P = 2147483647  # 2^31 - 1 (Mersenne prime)
_M31 = 0x7FFFFFFF


def _cw_consts(i: int) -> tuple[int, int]:
    def mix(x: int) -> int:
        x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9 % (1 << 64)
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB % (1 << 64)
        return x ^ (x >> 31)

    return (mix(2 * i + 1) & _M31) | 1, mix(2 * i + 2) & _M31


def _minhash_signatures_arrow(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int,
    shingle_n: int,
    spread: int | None,
) -> DataFrame:
    """Arrow engine: crc32 base hash per shingle + one numpy broadcast for
    all k Carter-Wegman minima. Same narrow zero-shuffle shape as the
    expression engine."""
    import numpy as np
    from pyspark.sql.types import ArrayType, LongType

    A = np.array([_cw_consts(i)[0] for i in range(num_hashes)], dtype=np.int64)
    B = np.array([_cw_consts(i)[1] for i in range(num_hashes)], dtype=np.int64)

    @F.pandas_udf(ArrayType(LongType()))
    def sig(text: pd.Series) -> pd.Series:
        import zlib

        out = []
        for t in text:
            toks = t.split(" ") if t else []
            n_sh = len(toks) - shingle_n + 1
            if n_sh <= 0:
                out.append(None)
                continue
            hs = np.fromiter(
                (
                    zlib.crc32(" ".join(toks[j : j + shingle_n]).encode())
                    for j in range(n_sh)
                ),
                dtype=np.int64,
                count=n_sh,
            )
            out.append(((hs[:, None] * A + B) % _CW_P).min(axis=0))
        return pd.Series(out)

    if spread is not None:
        df = df.repartition(spread, id_col)
    return (
        df.select(F.col(id_col), sig(text_col).alias("__sig"))
        .filter(F.col("__sig").isNotNull())
        .select(
            F.col(id_col),
            *[F.col("__sig")[i].alias(f"mh_{i}") for i in range(num_hashes)],
        )
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    engine: str = "expr",
) -> DataFrame:
    """doc → k-minhash signature over word shingles.

    ``engine='expr'`` (default) keeps everything JVM-side: xxhash64 base
    hash per shingle, k Carter-Wegman minima as array_min(transform(...)).
    ``engine='arrow'`` is one pandas-UDF pass — crc32 per shingle (C
    speed, run-stable) then all k minima as a single numpy broadcast;
    ~2× faster per batch once Python workers are warm (long-running
    pipelines), but pays worker spin-up + numpy import on one-shot jobs,
    so the JVM path wins cold. Both are zero-shuffle narrow maps with the
    same signature SHAPE (columns mh_0..mh_{k-1}); the hash families
    differ, so pair outputs are comparable but not identical across
    engines.

    ZERO-shuffle narrow computation, one string hash per shingle: each
    shingle is xxhash64'd ONCE, then the k hash functions are the standard
    universal multiply-add family over that base hash
    (``h_i = a_i * h + b_i`` with odd ``a_i``, wrapping int64 arithmetic —
    a fixed random permutation-ish family, deterministic across runs).
    ``mh_i = array_min(transform(base, h -> a_i*h + b_i))``. No explode,
    no groupBy — a document's signature never leaves its input partition,
    so at 100 TB this stage is a pure map over the scan (the alternative
    explode → k×min(groupBy) shape shuffles ~100× the corpus in shingle
    rows, and salting xxhash64 itself costs k string hashes per shingle).
    ``min`` is duplicate-insensitive, so shingles are not deduped.

    The input is spread across all cores ONLY when it arrives in fewer
    partitions than cores (local small-file case): hashing is the hot
    loop and must not idle executors. When the scan already has ≥ cores
    partitions — always true at 100 TB — no repartition happens: an
    unconditional repartition would shuffle the entire corpus TEXT before
    a narrow map, the most expensive no-op possible at scale.
    """
    spread = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= spread:
        spread = None  # already parallel enough — stay narrow
    if engine == "arrow":
        return _minhash_signatures_arrow(
            df, text_col, id_col, num_hashes, shingle_n, spread
        )

    def _salted(i: int):
        a, b = _cw_consts(i)
        # Carter-Wegman: ((a*h + b) mod p). The mod is what makes the map
        # order-scrambling — without it a*h+b is monotonic in h and every
        # hash index would pick the SAME min shingle. Single-arg lambda: a
        # two-arg lambda would make transform() pass the element INDEX as
        # the second argument, clobbering the salt.
        return lambda h: F.pmod(h * F.lit(a) + F.lit(b), F.lit(_CW_P))

    sig_cols = [
        F.array_min(F.transform(F.col("__base"), _salted(i))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    # Two projections on purpose: higher-order functions are interpreted
    # (no codegen CSE), so the base-hash array must be materialized ONCE —
    # CollapseProject keeps the split because the alias is non-cheap and
    # referenced k times. Docs with < n tokens have no shingles → no
    # signature (matches the explode formulation, and keeps all-NULL rows
    # out of the LSH buckets).
    filtered = df.filter(F.size(tokenize(text_col)) >= shingle_n)
    if spread is not None:
        filtered = filtered.repartition(spread, id_col)
    return (
        filtered
        .select(
            F.col(id_col),
            F.transform(
                word_shingles(tokenize(text_col), shingle_n),
                lambda s: F.xxhash64(s).bitwiseAND(F.lit(0x7FFFFFFF)),
            ).alias("__base"),
        )
        .select(F.col(id_col), *sig_cols)
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket_size: int | None = 2000,
    materialize_capped: bool = False,
) -> DataFrame:
    """MinHash-LSH banding: hash each band of the signature; docs sharing a
    band bucket become candidate pairs. Output: (id_a, id_b, n_shared_bands).

    Scale shape: explode to (band, bucket) rows → self-join per bucket.
    The join key (band_id, bucket_hash) is high-cardinality, so the shuffle
    spreads evenly; any hot bucket (boilerplate dups) is AQE-split.

    ``max_bucket_size`` caps the quadratic blowup AQE cannot shrink: a
    degenerate bucket (empty-ish/boilerplate docs sharing a band) emits
    |bucket|²/2 pairs. Buckets over the cap are DROPPED before pair
    generation (one co-partitioned count + join on the same key — no
    extra shuffle pattern). Recall impact: only pairs whose EVERY shared
    band is degenerate are lost — such groups are "everything matches
    everything" clusters better handled by exact dedup on a normalized
    fingerprint; pass ``None`` to disable.

    ``materialize_capped``: lazily localCheckpoint the capped (id, band,
    bucket) rows before the self-join. The two join sides are the SAME
    frame, but higher-order-function lambdas in the signature lineage
    defeat plan canonicalization, so exchange reuse never fires and the
    band-explode + cap-window lineage evaluates once PER SIDE (r13 plan
    audit: two Generate+Window subtrees, one under a BroadcastExchange).
    Materializing the ~(n_docs x bands)-row frame makes both sides read
    cached blocks — interleaved A/B on minhash_lsh_neardup: 4.01→3.50 /
    2.59→2.37 s (two sessions, sf0.1). Off by default: one-shot/small
    callers (the md5 twin measured FLAT — its 8-hash lineage is too
    cheap to matter) should not pay the materialization.
    """
    if num_hashes % bands:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes}: trailing "
            "signature components would be silently dropped and recall "
            "would quietly fall below the (bands, rows) S-curve"
        )
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)]
        band_cols.append(F.struct(F.lit(b).alias("band"), F.xxhash64(*cols).alias("bucket")))
    exploded = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("bb")
    ).select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    exploded = _cap_buckets(exploded, ["band", "bucket"], max_bucket_size)
    if materialize_capped:
        exploded = exploded.localCheckpoint(eager=False)

    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col(f"a.band") == F.col(f"b.band"))
            & (F.col(f"a.bucket") == F.col(f"b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def _cap_buckets(
    rows: DataFrame,
    bucket_cols: list[str],
    max_bucket_size: int | None,
    mode: str = "window",
) -> DataFrame:
    """Drop LSH buckets larger than ``max_bucket_size`` before pair
    generation (pair count is quadratic in bucket size — one hot bucket of
    100k docs would emit 5e9 pairs that AQE can split but never shrink).

    ``mode="window"`` (default): a window count partitioned on the SAME
    key the downstream pair self-join shuffles on — zero extra exchanges
    (the join requires hash partitioning on the bucket key anyway; the
    window's buffer is the only extra work). The alternatives both cost
    more at bench scale: a groupBy keep-list inner join re-shuffles the
    big side, and a broadcast anti join adds a separate aggregation +
    broadcast barrier (measured ~2x the whole pipeline at sf0.1).

    ``mode="broadcast"``: the SKEW-SAFE dial for adversarial corpora.
    The window mode gathers each bucket into one task before counting —
    a bucket holding 10% of a 100 TB corpus becomes a spill-bound
    straggler (and AQE cannot split a window partition, only join
    sides). Broadcast mode never gathers the hot key: bucket sizes come
    from a groupBy (map-side partial counts make the hot key cheap —
    each task emits ONE partial row per key), only the OVERSIZED keys
    (at most n_rows/cap of them, corpus-independent for a fixed
    fraction) broadcast into a left-anti join, so the big side is
    neither shuffled nor skew-gathered before the cap. Identical
    output to window mode on any input (property-pinned in
    tests/test_store_maintenance_r11.py); factors for both modes on a
    hot-bucket corpus are recorded by scale_check.py
    incremental_neardup_hot."""
    if max_bucket_size is None:
        return rows
    if mode == "broadcast":
        oversized = (
            rows.groupBy(*bucket_cols)
            .agg(F.count(F.lit(1)).alias("__bsz"))
            .filter(F.col("__bsz") > max_bucket_size)
            .select(*[F.col(c).alias(f"__cap_{c}") for c in bucket_cols])
        )
        # eqNullSafe: groupBy puts NULL keys in ONE group (matching the
        # window mode's partitionBy), but a null-unsafe anti join would
        # never match that group's key row — an over-cap NULL-keyed
        # bucket would silently survive the cap (ADVICE r11). Aliased
        # right-side keys keep the condition unambiguous.
        cond = None
        for c in bucket_cols:
            clause = F.col(c).eqNullSafe(F.col(f"__cap_{c}"))
            cond = clause if cond is None else (cond & clause)
        return rows.join(F.broadcast(oversized), cond, "left_anti")
    if mode != "window":
        raise ValueError(f"unknown cap mode {mode!r}")
    w = Window.partitionBy(*bucket_cols)
    return (
        rows.withColumn("__bsz", F.count(F.lit(1)).over(w))
        .filter(F.col("__bsz") <= max_bucket_size)
        .drop("__bsz")
    )


def minhash_jaccard_estimate(
    signatures: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 32,
) -> DataFrame:
    """Estimate Jaccard for candidate pairs as the fraction of matching
    minhash components (standard MinHash estimator)."""
    sa = signatures.alias("sa")
    sb = signatures.alias("sb")
    matches = sum(
        F.when(F.col(f"sa.mh_{i}") == F.col(f"sb.mh_{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    return (
        pairs.join(sa, F.col("id_a") == F.col(f"sa.{id_col}"))
        .join(sb, F.col("id_b") == F.col(f"sb.{id_col}"))
        .select(
            "id_a",
            "id_b",
            "n_shared_bands",
            (matches.cast("double") / F.lit(float(num_hashes))).alias("jaccard_est"),
        )
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 48) -> DataFrame:
    """SimHash signature: per token, xxhash64 → take ``bits`` low bits; each
    bit contributes +1/-1 weighted by token frequency; sign of the sum is
    the signature bit. Pure expressions: explode → one groupBy(doc) with
    ``bits`` conditional sums → bit-pack.

    ``bits`` ≤ 62 keeps the packed signature positive in a BIGINT.
    """
    tok = df.select(
        F.col(id_col), F.explode(tokenize(text_col)).alias("__t")
    ).withColumn("__h", F.xxhash64(F.lit("simhash"), F.col("__t")))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b_{i}")
        for i in range(bits)
    ]
    agg = tok.groupBy(id_col).agg(*bit_sums)
    packed = None
    for i in range(bits):
        term = F.when(F.col(f"b_{i}") > 0, F.lit(1).cast("bigint") * (2**i)).otherwise(
            F.lit(0).cast("bigint")
        )
        packed = term if packed is None else packed + term
    return agg.select(F.col(id_col), packed.alias("simhash"))


def simhash_near_pairs(
    sig: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 8,
    prefix_bits: int = 12,
    bits: int = 48,
    max_bucket_size: int | None = 2000,
    method: str = "prefix",
) -> DataFrame:
    """Near-dup candidates: block on the signature's top ``prefix_bits``
    (cheap LSH for SimHash), then exact Hamming distance via bit_count(xor).

    ``bits`` must match the signature width passed to :func:`simhash`
    (ADVICE r1: a hardcoded 48 silently blocked on the wrong bit range for
    64-bit signatures). ``max_bucket_size`` drops degenerate prefix blocks
    before the quadratic pair step — see :func:`_cap_buckets`.

    ``method='pigeonhole'`` is the SCALE mode (Manku et al. 2007,
    "Detecting Near-Duplicates for Web Crawling"): the signature splits
    into ``max_hamming + 1`` disjoint blocks; any pair within the Hamming
    budget must agree EXACTLY on at least one block (pigeonhole), so
    bucketing per (block index, block bits) gives EXACT recall — unlike
    prefix blocking, which silently misses every pair that differs inside
    the prefix AND collapses to ``2^prefix_bits`` buckets that all
    overflow the cap once the corpus outgrows ``2^prefix_bits *
    max_bucket_size`` rows (a production corpus under the default 8-bit
    prefix would silently emit ZERO pairs).
    """
    if method == "pigeonhole":
        nb = max_hamming + 1
        width = bits // nb
        parts = []
        for j in range(nb):
            lo = j * width
            w = bits - lo if j == nb - 1 else width
            shifted = F.shiftright(F.col("simhash"), lo)
            # a 64-bit block's mask (2^64-1) does not fit LongType — the
            # full shifted value IS the block, no masking needed
            blk = (
                shifted
                if w >= 64
                else shifted.bitwiseAND(F.lit((1 << w) - 1))
            )
            parts.append(
                F.struct(F.lit(j).alias("tbl"), blk.alias("blk"))
            )
        exploded = sig.select(
            F.col(id_col), F.col("simhash"), F.explode(F.array(*parts)).alias("bb")
        ).select(
            id_col,
            "simhash",
            F.col("bb.tbl").alias("__tbl"),
            F.col("bb.blk").alias("__blk"),
        )
        exploded = _cap_buckets(exploded, ["__tbl", "__blk"], max_bucket_size)
        a = exploded.alias("a")
        b = exploded.alias("b")
        ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
        return (
            a.join(
                b,
                (F.col("a.__tbl") == F.col("b.__tbl"))
                & (F.col("a.__blk") == F.col("b.__blk"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                ham.alias("hamming"),
            )
            .filter(F.col("hamming") <= max_hamming)
            # a pair can agree on several blocks — emit it once
            .distinct()
        )
    blocked = sig.withColumn("__blk", F.shiftright(F.col("simhash"), bits - prefix_bits))
    blocked = _cap_buckets(blocked, ["__blk"], max_bucket_size)
    a = blocked.alias("a")
    b = blocked.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.__blk") == F.col("b.__blk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    block_cols: list[str],
    threshold: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram-shingle Jaccard similarity for pairs within a block.

    Blocking bounds the pair count (never global all-pairs); within a block
    the intersection is computed by a shingle-equality join + count, i.e.
    set intersection as a distributed hash join, not per-row set ops.
    Output: (id_a, id_b, jaccard) with jaccard > threshold.
    """
    # the per-doc shingle-set SIZE rides on the exploded rows (one size()
    # over the materialized array) instead of a separate aggregation of
    # the same lineage — the old shape evaluated tokenize+shingle over
    # the corpus TWICE per action (self-join sides share one exchange;
    # the sizes agg did not) and joined the sizes back with two joins
    sh = df.select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.array_distinct(word_shingles(tokenize(text_col), shingle_n)).alias("__shs"),
    ).select(
        F.col(id_col),
        *[F.col(c) for c in block_cols],
        F.size("__shs").alias("__sz"),
        F.explode("__shs").alias("__sh"),
    )
    a = sh.alias("a")
    b = sh.alias("b")
    block_cond = None
    for c in block_cols:
        eq = F.col(f"a.{c}") == F.col(f"b.{c}")
        block_cond = eq if block_cond is None else (block_cond & eq)
    inter = (
        a.join(
            b,
            block_cond
            & (F.col("a.__sh") == F.col("b.__sh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("__inter"),
            F.first(F.col("a.__sz")).alias("__sza"),
            F.first(F.col("b.__sz")).alias("__szb"),
        )
    )
    return (
        inter.select(
            "id_a",
            "id_b",
            (
                F.col("__inter").cast("double")
                / (F.col("__sza") + F.col("__szb") - F.col("__inter")).cast("double")
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") > threshold)
    )


# Carter-Wegman family over p = 2^31 - 1 for the md5-based twin: fixed
# (a, b) literals mirrored verbatim in the DuckDB oracle SQL. a·H < 2^59
# for the 28-bit base hash — no int64 overflow (Spark 4 ANSI-safe).
CW_MD5_P = (1 << 31) - 1
CW_MD5_PARAMS = (
    (1103527591, 252584521),
    (1805430387, 1153717637),
    (741103597, 423496973),
    (887987685, 781912357),
    (259344783, 1947484219),
    (1614673817, 91393913),
    (473279357, 1657613721),
    (955863087, 343042159),
)


def minhash_md5_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """ORACLE-CHECKABLE MinHash variant: ONE md5 per shingle supplies a
    28-bit base value H = int(md5(shingle)[:7], 16); minimum i is
    ``min((a_i·H + b_i) mod p)`` — the same Carter-Wegman construction as
    the xxhash64 production engine (``minhash_signatures``), with md5 as
    the base hash because DuckDB can reproduce it bit-for-bit.

    Exists to put the full MinHash→banding→pair pipeline under the
    cross-engine value-hash gate. Same zero-shuffle narrow-map shape; the
    base-hash array is materialized in its own projection because
    higher-order functions are interpreted with no CSE (one md5 per
    shingle TOTAL, not per minimum — the r3 bench fix: 8×md5 made this
    query 5× slower than every other headline entry). Docs with fewer
    than ``shingle_n`` tokens get NULL minima (no shingles), which
    null-propagate through banding and never pair.
    """
    shingles = word_shingles(tokenize(text_col), shingle_n)
    base = df.select(
        F.col(id_col),
        F.transform(
            shingles,
            lambda s: F.conv(F.substring(F.md5(s), 1, 7), 16, 10).cast("bigint"),
        ).alias("__H"),
    )

    def cw(i: int):
        a, b = CW_MD5_PARAMS[i]
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(CW_MD5_P)

    return base.select(
        F.col(id_col),
        *[
            F.array_min(F.transform("__H", cw(i))).alias(f"mh_{i}")
            for i in range(num_hashes)
        ],
    )


def simhash_md5(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bits: int = 32,
    salt: str = "sh|",
) -> DataFrame:
    """ORACLE-CHECKABLE SimHash twin: the bit source is ``md5(salt|token)``
    hex nibbles instead of xxhash64 (which has no DuckDB equivalent), so
    the full tokenize → bit-vote → bit-pack pipeline sits under the
    cross-engine value-hash gate. Bit i lives in hex char ``i // 4``, bit
    ``i % 4`` — extracted with conv(hex_char, 16, 10) on the Spark side
    and strpos('0123456789abcdef', ...) - 1 in the oracle, identical
    values by construction. Production stays :func:`simhash` (one
    xxhash64 per token vs one md5); plan shape is the same: explode →
    single groupBy with ``bits`` conditional sums → pack. ``bits`` ≤ 62
    keeps the packed signature positive in a BIGINT.
    """
    tok = df.select(F.col(id_col), F.explode(tokenize(text_col)).alias("__t"))
    tokh = tok.select(
        id_col, F.md5(F.concat(F.lit(salt), F.col("__t"))).alias("__h")
    )

    def bit_is_set(i: int):
        charval = F.conv(F.substring("__h", i // 4 + 1, 1), 16, 10).cast("int")
        return F.shiftright(charval, i % 4).bitwiseAND(F.lit(1)) == 1

    bit_sums = [
        F.sum(F.when(bit_is_set(i), 1).otherwise(-1)).alias(f"b_{i}")
        for i in range(bits)
    ]
    agg = tokh.groupBy(id_col).agg(*bit_sums)
    packed = None
    for i in range(bits):
        term = F.when(
            F.col(f"b_{i}") > 0, F.lit(2**i).cast("bigint")
        ).otherwise(F.lit(0).cast("bigint"))
        packed = term if packed is None else packed + term
    return agg.select(F.col(id_col), packed.alias("simhash"))


def minhash_md5_band_rows(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """(id, band, bucket) rows from Carter-Wegman md5 signatures — the
    shared banding step of the self-join pair generator AND the
    incremental band-bucket STORE (one ~32-hex bucket string per band per
    doc, the only per-document state a cross-snapshot near-dup pipeline
    persists). Buckets are ``md5(mh_a || '|' || mh_b)`` with
    NULL-PROPAGATING concat (concat_ws would collapse all
    empty-signature docs into one giant '' bucket); NULL buckets are
    dropped here so they can never pair or bloat the store."""
    if num_hashes % bands:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes}: trailing "
            "signature components would be silently dropped"
        )
    rows = num_hashes // bands
    band_cols = []
    for b in range(bands):
        parts: list = []
        for r in range(rows):
            if parts:
                parts.append(F.lit("|"))
            parts.append(F.col(f"mh_{b * rows + r}").cast("string"))
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat(*parts)).alias("bucket"))
        )
    return (
        signatures.select(F.col(id_col), F.explode(F.array(*band_cols)).alias("bb"))
        .select(id_col, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
        .filter(F.col("bucket").isNotNull())
    )


def minhash_md5_lsh_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    max_bucket_size: int | None = 2000,
) -> DataFrame:
    """Banded candidate pairs over Carter-Wegman md5 signatures
    (:func:`minhash_md5_band_rows` buckets); otherwise the exact same
    capped bucket self-join as ``lsh_candidate_pairs``."""
    exploded = minhash_md5_band_rows(signatures, id_col, num_hashes, bands)
    exploded = _cap_buckets(exploded, ["band", "bucket"], max_bucket_size)
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def lsh_plan(
    threshold: float, num_hashes: int = 32, fn_weight: float = 1.0
) -> dict:
    """Pick (bands, rows) for a target Jaccard threshold from the standard
    S-curve: a pair with similarity s shares a band with probability
    ``1 - (1 - s^r)^b``. Among the divisor splits of ``num_hashes`` this
    returns the one minimizing estimated false-positive area below the
    threshold plus ``fn_weight`` x false-negative area above it (the
    textbook integral criterion, evaluated numerically). Use the result's
    'bands' for ``lsh_candidate_pairs``; 'char_threshold' = (1/b)^(1/r) is
    where the curve crosses 0.5 — sanity-check it lands near ``threshold``.
    """
    if not 0 < threshold < 1:
        raise ValueError("threshold must be in (0, 1)")
    best = None
    for rows in range(1, num_hashes + 1):
        if num_hashes % rows:
            continue
        bands = num_hashes // rows
        steps = 200
        fp = fn = 0.0
        for i in range(steps):
            s = (i + 0.5) / steps
            p = 1.0 - (1.0 - s**rows) ** bands
            if s < threshold:
                fp += p / steps
            else:
                fn += (1.0 - p) / steps
        cost = fp + fn_weight * fn
        if best is None or cost < best["cost"]:
            best = {
                "bands": bands,
                "rows": rows,
                "cost": cost,
                "char_threshold": (1.0 / bands) ** (1.0 / rows),
            }
    return best


def benchmark_containment(
    corpus: DataFrame,
    benchmark: DataFrame,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination detection (GPT-3 appendix-C style): for each
    corpus document, the fraction of its DISTINCT n-gram shingles that
    appear anywhere in the benchmark (eval) set — asymmetric containment,
    not Jaccard, because a short eval example buried in a long training
    document must still flag.

    Scale shape: the benchmark side is an eval set — bounded — so its
    distinct-shingle set is BROADCAST; the corpus side is one narrow
    shingle explode + a broadcast left-semi probe (no shuffle of corpus
    text), then a single per-doc count aggregation. At 100 TB the cost is
    one pass over the corpus.

    Output: (doc_id, n_shingles, n_overlap, containment), one row per
    corpus document that has at least one shingle (>= n tokens).
    """
    def shingled(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col),
            F.explode(
                F.array_distinct(word_shingles(tokenize(text_col), shingle_n))
            ).alias("__sh"),
        )

    c = shingled(corpus)
    bench = shingled(benchmark).select("__sh").distinct().withColumn(
        "__hit", F.lit(1)
    )
    # ONE pass over the corpus shingles: the broadcast left join marks
    # benchmark hits and a single groupBy counts rows AND hits per doc —
    # the old sizes/overlap split evaluated the corpus shingle lineage
    # twice and joined the halves back
    marked = c.join(F.broadcast(bench), "__sh", "left")
    return (
        marked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count("__hit").alias("n_overlap"),  # count() skips NULLs
        )
        .select(
            id_col,
            "n_shingles",
            "n_overlap",
            (
                F.col("n_overlap").cast("double") / F.col("n_shingles")
            ).alias("containment"),
        )
    )


def decontaminate_rewrite(
    corpus: DataFrame,
    benchmark: DataFrame,
    shingle_n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    rebuild: str = "expr",
) -> DataFrame:
    """Benchmark DECONTAMINATION rewrite: where :func:`benchmark_containment`
    *detects* eval overlap, this removes it — every token covered by a word
    ``shingle_n``-gram that appears anywhere in the benchmark set is dropped
    from the document, and the cleaned text is re-emitted (the GPT-3 /
    PaLM-style "dirty n-gram" scrub applied as a rewrite instead of a
    document drop, so long documents survive with only the contaminated
    spans excised).

    Scale shape: the benchmark's distinct-shingle set is bounded (an eval
    set) and BROADCAST; the corpus pays (1) one narrow (id, shingle-start)
    explode probed by the broadcast — only HITS survive, so the per-doc
    hit-start lists that flow into the rebuild join are empty for clean
    docs and tiny for dirty ones — and (2) one rebuild pass joining those
    lists back to the original rows on ``id_col``. The corpus text is
    never shuffled; the (doc_id, text) projection is scanned twice (probe
    branch + rebuild branch), the standard two-scan trade documented on
    semantic_dedup — persisting the narrow projection upstream removes the
    second scan at real corpus scale.

    Token positions are reconstructed ARRAY-side (sorted hit starts →
    covered-index set → indexed ``filter``), never by re-aggregating
    exploded tokens, so the output text needs no order-sensitive
    ``collect_list``. Reference surface: the reference engine has no
    decontamination op; the op follows the public n-gram scrub recipe
    (GPT-3 appendix C, PaLM §5).

    ``rebuild``: "expr" (default) keeps the rebuild in Catalyst
    expressions — per token one ``array_contains(__cov)`` scan, so a
    FULLY contaminated doc degenerates to O(n_tokens²) interpreted
    work; "arrow" swaps the final projection for a pandas_udf whose
    numpy scatter-mask is O(n_tokens + n_covered) per doc. Measured
    (interleaved single-session A/B medians, VERDICT r11 item 9):
    sf0.1 arrow/expr 1.087×, and even an adversarial 200-doc
    20k-token FULLY-dirty corpus reads 1.085× — the shared upstream
    (shingle explode + broadcast probe + rebuild join) dominates both
    modes, so the rebuild's quadratic corner never surfaces and
    "expr" (no Python worker round trip) stays the default.
    Re-measure before switching if docs grow past ~100k tokens.

    Output: (id_col, n_tokens, n_removed, clean_text), one row per corpus
    document with non-NULL text.
    """
    if rebuild not in ("expr", "arrow"):
        raise ValueError(f"unknown rebuild mode {rebuild!r}")
    spans = F.col("__starts")

    def shingle_starts(df: DataFrame) -> DataFrame:
        # materialize the shingle array in its own projection BEFORE the
        # explode (interpreted-HOF + per-exploded-row re-eval hazards)
        arr = df.select(
            F.col(id_col),
            word_shingles(tokenize(text_col), shingle_n).alias("__shs"),
        )
        return arr.select(
            id_col, F.posexplode("__shs").alias("__s", "__sh")
        )

    bench = (
        benchmark.select(
            F.explode(
                F.array_distinct(word_shingles(tokenize(text_col), shingle_n))
            ).alias("__sh")
        )
        .distinct()
    )
    hits = shingle_starts(corpus).join(F.broadcast(bench), "__sh")
    starts = hits.groupBy(id_col).agg(
        F.sort_array(F.collect_set("__s")).alias("__starts")
    )
    joined = corpus.select(id_col, text_col).join(starts, id_col, "left")
    staged = joined.select(
        id_col,
        tokenize(text_col).alias("__toks"),
        F.array_distinct(
            F.flatten(
                F.transform(
                    F.coalesce(spans, F.array().cast("array<int>")),
                    lambda s: F.sequence(s, s + F.lit(shingle_n - 1)),
                )
            )
        ).alias("__cov"),
    )
    if rebuild == "arrow":
        import numpy as np
        import pandas as pd

        @F.pandas_udf("struct<n_tokens:int,n_removed:int,clean_text:string>")
        def scrub(toks: pd.Series, cov: pd.Series) -> pd.DataFrame:
            n_tok, n_rem, clean = [], [], []
            for t, c in zip(toks, cov):
                ta = np.asarray(t, dtype=object)
                mask = np.ones(len(ta), dtype=bool)
                if len(c):
                    mask[np.asarray(c, dtype=np.int64)] = False
                n_tok.append(len(ta))
                n_rem.append(len(c))
                clean.append(" ".join(ta[mask]))
            return pd.DataFrame(
                {"n_tokens": n_tok, "n_removed": n_rem, "clean_text": clean}
            )

        out = staged.select(
            id_col, scrub(F.col("__toks"), F.col("__cov")).alias("__s")
        )
        return out.select(
            id_col, "__s.n_tokens", "__s.n_removed", "__s.clean_text"
        )
    return staged.select(
        id_col,
        F.size("__toks").alias("n_tokens"),
        F.size("__cov").alias("n_removed"),
        F.concat_ws(
            " ",
            F.filter(
                "__toks",
                lambda t, i: ~F.array_contains(F.col("__cov"), i),
            ),
        ).alias("clean_text"),
    )


def duplicated_span_stats(
    df: DataFrame,
    n: int = 40,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_grams: bool = False,
    stride: int = 1,
) -> DataFrame:
    """Exact-substring duplication profile (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): for every document, how
    much of it is covered by a character ``n``-gram that occurs at least
    ``min_count`` times anywhere in the corpus. The suffix-array algorithm
    of the paper is inherently single-machine; the distributed equivalent
    enumerates every length-``n`` character window (the same O(total chars)
    row count a suffix array holds) and finds repeated windows with one
    shuffle keyed on the window content.

    Stages (all JVM/codegen expressions — no Python in the data path):
      1. explode positions 1..len-n+1 per doc (narrow),
      2. window ``count(*) over (partition by gram)`` marks repeated grams
         (shuffle #1, keyed on the gram — high cardinality, AQE-splittable),
      3. per-doc interval-union of the surviving [pos, pos+n-1] windows via
         the classic island trick (running max-end, new-island flag,
         running island id), then two hash aggregations (shuffle #2, keyed
         on doc_id).

    Scale levers for 100 TB: ``hash_grams=True`` shuffles an 8-byte
    xxhash64 instead of the n-byte window (collisions ~2^-64 per pair —
    fine for production, off for oracle parity), and ``stride > 1``
    trades coverage resolution for a 1/stride row-count cut (stride <= n
    still detects every duplicated span of length >= 2n-1).

    Output: one row per document that contains at least one duplicated
    window — (doc_id, dup_positions, dup_chars, total_chars), all exact
    integers (no float drift).
    """
    if stride < 1 or n < 2:
        raise ValueError("need stride >= 1 and n >= 2")
    base = df.select(
        F.col(id_col), F.col(text_col).alias("__text"), F.length(text_col).alias("total_chars")
    ).where(F.col("total_chars") >= F.lit(n))
    pos = base.select(
        id_col,
        "total_chars",
        "__text",
        F.explode(
            F.sequence(
                F.lit(1).cast("long"),
                (F.col("total_chars") - F.lit(n - 1)).cast("long"),
                F.lit(stride).cast("long"),
            )
        ).alias("pos"),
    )
    gram = F.expr(f"substring(__text, CAST(pos AS INT), {n})")
    if hash_grams:
        gram = F.xxhash64(gram)
    grams = pos.select(id_col, "total_chars", "pos", gram.alias("__gram"))
    flagged = grams.withColumn(
        "__cnt", F.count(F.lit(1)).over(Window.partitionBy("__gram"))
    ).where(F.col("__cnt") >= F.lit(min_count))
    w_doc = Window.partitionBy(id_col).orderBy("pos")
    prev_max_end = (
        F.max(F.col("pos") + F.lit(n - 1))
        .over(w_doc.rowsBetween(Window.unboundedPreceding, -1))
    )
    marked = flagged.select(
        id_col,
        "total_chars",
        "pos",
        F.when(
            F.col("pos") > F.coalesce(prev_max_end, F.lit(-1).cast("long")), F.lit(1)
        ).otherwise(F.lit(0)).alias("__new"),
    )
    numbered = marked.withColumn(
        "__island",
        F.sum("__new").over(w_doc.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spans = numbered.groupBy(id_col, "__island").agg(
        F.first("total_chars").alias("total_chars"),
        F.count(F.lit(1)).alias("__n_pos"),
        (F.max(F.col("pos") + F.lit(n - 1)) - F.min("pos") + F.lit(1)).alias("__span"),
    )
    return spans.groupBy(id_col).agg(
        F.sum("__n_pos").alias("dup_positions"),
        F.sum("__span").alias("dup_chars"),
        F.first("total_chars").alias("total_chars"),
    )


def assign_nearest_centroid(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    centroids: DataFrame | None = None,
    engine: str = "literal",
) -> DataFrame:
    """Spherical (argmax-cosine) centroid assignment as a ZERO-shuffle
    pass: the k centroids — ``centroids`` if given, else the k lowest-id
    vectors of ``df`` — are collected ONCE (control-plane, k x d floats)
    and scored per row with no exchange. Ties break to the LOWEST
    centroid id. Returns (id_col, vec_col, __nrm, cluster_id) — shared by
    semantic_dedup (SemDeDup) and the k-means Lloyd update.

    Two engines, same zero-shuffle shape:

    - ``'literal'`` (default, the oracle-checkable one): centroids folded
      per row as an array literal; cosines via the order-pinned double
      left fold (functions/vectors.dot_fast), bit-identical to DuckDB's
      ``list_reduce``. Right for COARSE k (<= ~256 — the expression tree
      holds k*(d+2) literal nodes).
    - ``'arrow'``: the centroid matrix rides the task closure (k x d
      float64, ~0.5 MB at k=1024/d=64) and each Arrow batch scores as ONE
      numpy matmul + argmax — the production engine when k scales with
      the corpus (SemDeDup uses k ~ n/1000). numpy cosines differ from
      the fold in the last ulp, so this engine serves scale paths, not
      value-hash oracles; ties still break to the lowest centroid id
      (centroid rows sorted by id, argmax picks the first maximum)."""
    from duck_delta_share_spark.functions.vectors import dot_fast, norm_fast

    src = centroids if centroids is not None else df
    cent_rows = src.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    if not cent_rows:
        # an empty centroid set would otherwise build a zero-length
        # array literal whose lambda types resolve to VOID — the
        # resulting AnalysisException points nowhere near the cause
        raise ValueError(
            "assign_nearest_centroid: no centroid rows (empty input "
            "frame or empty centroids) — k-means/SemDeDup need at "
            "least one vector"
        )

    if engine == "arrow":
        import numpy as np
        from pyspark.sql.types import (
            DoubleType,
            LongType,
            StructField,
            StructType,
        )

        C = np.vstack([np.asarray(r[vec_col], dtype=np.float64) for r in cent_rows])
        cids = np.asarray([int(r[id_col]) for r in cent_rows], dtype=np.int64)
        Cn = C / np.sqrt(np.einsum("ij,ij->i", C, C))[:, None]
        out_schema = StructType(
            list(df.select(id_col, vec_col).schema.fields)
            + [
                StructField("__nrm", DoubleType()),
                StructField("cluster_id", LongType()),
            ]
        )

        def score(batches):
            for pdf in batches:
                A = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
                nrm = np.sqrt(np.einsum("ij,ij->i", A, A))
                sims = (A / nrm[:, None]) @ Cn.T
                best = sims.argmax(axis=1)  # first max = lowest cid (sorted)
                pdf = pdf[[id_col, vec_col]].copy()
                pdf["__nrm"] = nrm
                pdf["cluster_id"] = cids[best]
                yield pdf

        return df.select(id_col, vec_col).mapInPandas(score, out_schema)

    def _norm(vec) -> float:
        # sequential double left fold — bit-identical to dot_fast/DuckDB
        acc = 0.0
        for x in vec:
            acc += float(x) * float(x)
        return acc ** 0.5

    cent_lit = F.array(
        *[
            F.struct(
                F.lit(int(r[id_col])).alias("cid"),
                F.array(*[F.lit(float(x)) for x in r[vec_col]])
                .cast("array<double>")
                .alias("vec"),
                F.lit(_norm(r[vec_col])).alias("nrm"),
            )
            for r in cent_rows
        ]
    )

    # own projection per step: higher-order expressions are interpreted
    # (no CSE), so the row norm and the scored array must each be
    # materialized once, not inlined into the next expression
    with_norm = df.select(
        F.col(id_col), F.col(vec_col), norm_fast(vec_col).alias("__nrm")
    )
    scored = with_norm.select(
        id_col,
        vec_col,
        "__nrm",
        F.transform(
            cent_lit,
            lambda c: F.struct(
                (dot_fast(F.col(vec_col), c["vec"]) / (F.col("__nrm") * c["nrm"])).alias(
                    "cos"
                ),
                (-c["cid"]).alias("negcid"),
            ),
        ).alias("__scored"),
    )
    return scored.select(
        id_col,
        vec_col,
        "__nrm",
        (-F.array_max("__scored")["negcid"]).cast("long").alias("cluster_id"),
    )


# similarity-matmul row block for semantic_dedup's within-cluster pass:
# per-task peak memory is O(row_block x cluster_size) doubles instead of
# the full n x n matrix. Module-level so tests can lower it to hit the
# multi-block boundary arithmetic on small corpora.
_SEMDEDUP_ROW_BLOCK = 4096


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    threshold: float = 0.35,
    centroids: DataFrame | None = None,
    engine: str = "literal",
    max_cluster_size: int = 100_000,
    oversize: str = "error",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540) — semantic
    deduplication over an embedding column: cluster the corpus with a
    coarse quantizer, then drop near-duplicate vectors WITHIN each
    cluster (cosine > threshold), keeping one representative per
    epsilon-ball. Returns (id_col, cluster_id, kept int).

    Determinism contract (what makes the full pipeline oracle-checkable):

    - centroid set / assignment / tie-breaks: see
      :func:`assign_nearest_centroid` (the shared zero-shuffle pass);
    - keep rule = a vector is dropped iff a LOWER-id vector in the same
      cluster scores cosine > threshold (the paper keeps one element per
      ball; lowest-id is the auditable choice).

    Scale shape (100 TB posture): the assignment pass is ZERO-shuffle
    (centroids folded per row as an array literal). The only wide
    exchange is the within-cluster self-join keyed on cluster_id;
    clusters bound the pair blow-up to ~(n/k)^2 per cluster. A
    pathological corpus (everything lands in one cluster) is ENFORCED
    against, not just documented: per-task memory is O(block x n) (the
    similarity matmul is row-blocked, never the n x n matrix), and a
    cluster larger than ``max_cluster_size`` either fails LOUDLY inside
    the task (``oversize="error"``, the default — quadratic time in a
    degenerate cluster is a k/threshold misconfiguration the job owner
    must see) or is pigeonhole-sharded (``oversize="shard"``:
    ceil(size/cap) hash shards per oversized cluster, dedup within each
    shard — bounded ~cap^2 work per group at the cost of cross-shard
    recall, the same trade `_cap_buckets` makes for hot LSH buckets; the
    shard count rides the SAME window count the group shuffle already
    hash-partitions for, so it adds no exchange). Nothing all-pairs,
    nothing driver-side beyond the k x d centroid pull.
    """
    if oversize not in ("error", "shard"):
        raise ValueError(f"oversize must be 'error' or 'shard', got {oversize!r}")
    if max_cluster_size < 1:
        raise ValueError("max_cluster_size must be >= 1")
    assigned = assign_nearest_centroid(
        df, id_col=id_col, vec_col=vec_col, k=k, centroids=centroids,
        engine=engine,
    )

    # within-cluster pruning in the SAME single pass over the assignment:
    # one shuffle row per vector (groupBy cluster -> applyInPandas), one
    # C-speed matmul per block, and the kept flag computed in place — no
    # pair frame, no join back, and crucially the assignment pass runs
    # ONCE (a join of `assigned` against pairs derived from `assigned`
    # would evaluate the whole scoring lineage twice). numpy-vs-fold
    # cosine divergence is last-ulp; the data's minimum |cos - threshold|
    # proximity (7.8e-6 at sf0.1) makes the keep decision engine-stable.
    import numpy as np
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    id_type = df.schema[id_col].dataType
    out_schema = StructType(
        [
            StructField(id_col, id_type),
            StructField("cluster_id", LongType()),
            StructField("kept", IntegerType()),
        ]
    )
    tau = float(threshold)
    cap = int(max_cluster_size)
    # similarity matmul block: O(block x n) memory (module-level so tests
    # can lower it and exercise the multi-block boundary arithmetic)
    row_block = _SEMDEDUP_ROW_BLOCK

    # NB: applyInPandas dispatches on ARITY — a two-parameter function
    # would be called as (key, pdf) — so the per-mode group cap is bound
    # via a factory, never a second parameter.
    def _keep_block(
        pdf: pd.DataFrame, group_cap: int, sharded: bool
    ) -> pd.DataFrame:
        n = len(pdf)
        if n > group_cap:
            # loud in-task failure: the task holds exactly one group, so
            # this fires before any quadratic work is attempted — with
            # advice matched to the mode that fired (telling a shard-mode
            # caller to "pass oversize='shard'" would be circular)
            if sharded:
                msg = (
                    f"semantic_dedup shard of cluster "
                    f"{pdf['cluster_id'].iloc[0]} has {n} vectors > "
                    f"{group_cap} (2x max_cluster_size={cap} hash-balance "
                    "slack); raise max_cluster_size or k"
                )
            else:
                msg = (
                    f"semantic_dedup cluster {pdf['cluster_id'].iloc[0]} "
                    f"has {n} vectors > max_cluster_size={cap}; raise k, "
                    "raise max_cluster_size, or pass oversize='shard'"
                )
            raise ValueError(msg)
        ids = pdf[id_col].to_numpy()
        if n == 1:
            kept = np.ones(1, dtype=np.int32)
        else:
            A = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.sqrt(np.einsum("ij,ij->i", A, A))
            kept = np.empty(n, dtype=np.int32)
            # row-blocked: never materialize the n x n similarity matrix
            for s in range(0, n, row_block):
                e = min(s + row_block, n)
                sims = (A[s:e] @ A.T) / np.outer(norms[s:e], norms)
                near = sims > tau
                lower = ids[None, :] < ids[s:e, None]  # [i, j]: j lower id
                kept[s:e] = (~(near & lower).any(axis=1)).astype(np.int32)
        return pd.DataFrame(
            {
                id_col: ids,
                "cluster_id": pdf["cluster_id"].to_numpy(),
                "kept": kept,
            }
        )

    def keep_block(pdf: pd.DataFrame) -> pd.DataFrame:
        return _keep_block(pdf, cap, sharded=False)

    narrow = assigned.select(id_col, vec_col, "cluster_id")
    if oversize == "shard":
        # window count on cluster_id = the key the group shuffle hash
        # partitions on anyway (see _cap_buckets for the same argument);
        # oversized clusters split into ceil(size/cap) deterministic
        # hash shards, normal clusters keep shard 0
        w = Window.partitionBy("cluster_id")
        sharded = (
            narrow.withColumn("__csz", F.count(F.lit(1)).over(w))
            .withColumn(
                "__shard",
                F.when(
                    F.col("__csz") > cap,
                    F.pmod(
                        F.xxhash64(F.col(id_col)),
                        F.ceil(F.col("__csz") / F.lit(cap)).cast("long"),
                    ),
                ).otherwise(F.lit(0).cast("long")),
            )
            .drop("__csz")
        )

        def keep_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            # hash-shard sizes fluctuate around cap; allow 2x slack
            # before declaring the sharding itself broken
            return _keep_block(pdf.drop(columns=["__shard"]), 2 * cap, sharded=True)

        return sharded.groupBy("cluster_id", "__shard").applyInPandas(
            keep_shard, out_schema
        )
    return narrow.groupBy("cluster_id").applyInPandas(keep_block, out_schema)


def incremental_dedup_commit(
    spark,
    new_docs: DataFrame,
    corpus_path,
    store_path,
    app_id: str,
    shard_version: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> dict:
    """Dedup a NEW shard against the accumulated corpus WITHOUT rescanning
    it, then transactionally append the survivors — the daily shape of a
    100 TB ingest pipeline (nothing rescans history; only the narrow
    fingerprint store is joined).

    The fingerprint store (a Delta table at ``store_path`` with columns
    ``fp``/``doc_id``) carries one 32-hex-char md5 per corpus document —
    at 100 TB of documents that is ~0.05% of the corpus bytes, and it is
    the ONLY history the shard touches: survivors = within-shard exact
    dedup (lowest id per fingerprint) anti-joined against the store on
    ``fp``. The anti-join shuffles 16-byte keys, never document bodies;
    a bloom semi-join pre-filter (operators/bloom.py) can cut the shuffle
    further when the shard is small relative to the store.

    Exactly-once across crash-replay via SetTransaction (protocol
    "Transaction Identifiers", sources/delta_log.py write_delta txn=):
    both appends carry ``(app_id, shard_version)`` and each is gated on
    ``last_txn_version``. Commit ORDER is corpus first, store second: a
    crash between the two leaves corpus docs whose fingerprints are not
    yet in the store, and the replay — recomputing survivors against the
    UNCHANGED store — reproduces the identical survivor set and completes
    the store append (skipping the corpus, whose txn marker it sees). The
    reverse order would poison the replay: with the shard's fingerprints
    already in the store, the recomputed anti-join would drop every
    survivor and the corpus append would commit nothing.

    Returns {"n_survivors", "corpus_version", "store_version"} — a
    version is None when that table had already absorbed this shard
    (crash-replay no-op); on a FULL no-op replay nothing is recomputed
    and n_survivors is None too.

    Store upkeep at daily ingest (compaction / log checkpoint / vacuum /
    optional dedup-horizon retention): :func:`maintain_dedup_store` —
    markers and replays survive every step
    (tests/test_store_maintenance_r11.py).
    """
    from duck_delta_share_spark.sources.delta_log import (
        last_txn_version,
        read_delta,
        write_delta,
    )

    if shard_version <= last_txn_version(
        corpus_path, app_id
    ) and shard_version <= last_txn_version(store_path, app_id):
        return {"n_survivors": None, "corpus_version": None, "store_version": None}

    w = Window.partitionBy("__fp").orderBy(id_col)
    within = (
        new_docs.withColumn("__fp", fingerprint(text_col))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    store_fps = read_delta(spark, store_path).select(F.col("fp").alias("__fp"))
    survivors = within.join(store_fps, "__fp", "left_anti")
    # two commits read this frame; persist so the anti-join runs once
    survivors = survivors.persist()
    try:
        n = survivors.count()
        corpus_version = None
        if shard_version > last_txn_version(corpus_path, app_id):
            corpus_version = write_delta(
                survivors.drop("__fp"),
                corpus_path,
                txn=(app_id, shard_version),
            )
        store_version = None
        if shard_version > last_txn_version(store_path, app_id):
            store_version = write_delta(
                survivors.select(F.col("__fp").alias("fp"), F.col(id_col)),
                store_path,
                txn=(app_id, shard_version),
            )
    finally:
        survivors.unpersist()
    return {
        "n_survivors": n,
        "corpus_version": corpus_version,
        "store_version": store_version,
    }


def incremental_neardup_candidates(
    spark,
    new_docs: DataFrame,
    bucket_store_path,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int | None = 2000,
    band_rows: DataFrame | None = None,
    cap_mode: str = "window",
) -> DataFrame:
    """NEAR-dup candidates of a new shard against the accumulated corpus
    WITHOUT rescanning it — the MinHash twin of
    :func:`incremental_dedup_commit`'s exact pipeline, and the other half
    of what a 100 TB ingest actually runs daily (exact-dup filtering
    alone misses boilerplate rewraps and near-copies).

    The only history touched is the maintained band-bucket STORE (a
    Delta table of ``(band, bucket, doc_id)`` — ``bands`` rows of one
    32-hex bucket string per corpus document, ~0.2% of corpus bytes at
    8/4 defaults): the shard's band rows join it on ``(band, bucket)``,
    so candidate pairs only form inside shared LSH buckets — never
    all-pairs, and the shuffle key IS the band hash, exactly like the
    within-corpus self-join. Returns one row per (id_new, id_old)
    candidate with ``n_shared_bands``.

    ``max_bucket_size`` caps the per-(band,bucket) group size over the
    UNION of store + shard rows before pair generation (same quadratic
    argument and same zero-extra-exchange window shape as
    ``_cap_buckets``; pass ``None`` for audits that must see uncapped
    banding — the silent-result-cliff rule). KNOWN COST of the capped
    path: both join sides derive from the capped union, so its lineage
    evaluates twice per action — bounded, because the only expensive leg
    is the shard's signature map (one md5 per shingle over the NEW SHARD
    only; the store side is a cheap columnar Delta scan) and a daily
    shard is small relative to the corpus. MEASURED (r11, sf0.1
    interleaved A/B, median-of-7): persisting the shard band rows to
    kill the double-eval is ~10% SLOWER here (1.90s vs 1.72s) — the
    bm25-r9 rule again (persist I/O > a cheap recompute at this corpus
    size) — so the default stays unpersisted; pass persisted
    ``band_rows`` when a shard is corpus-sized or when the rows have
    multiple consumers anyway (incremental_neardup_commit does: probe +
    within-shard self-join + store append).

    ``cap_mode``: "window" (default — zero extra exchanges) or
    "broadcast" — the skew-safe dial when one bucket can hold a
    corpus-scale fraction of rows; see :func:`_cap_buckets`.

    Store maintenance (appending the shard's band rows after ingest,
    exactly-once) composes ``minhash_md5_band_rows`` + ``write_delta``
    with a SetTransaction, the corpus-first order proven by
    tests/test_multi_table_txn_r10.py. Compaction / vacuum / horizon
    retention of the band store: :func:`maintain_dedup_store`
    (candidates are proven stable across maintenance in
    tests/test_store_maintenance_r11.py).
    """
    from duck_delta_share_spark.sources.delta_log import read_delta

    if band_rows is None:
        # ``band_rows``: callers that reuse the shard's band rows for
        # several consumers (candidates + within-shard pairs + the store
        # append, e.g. incremental_neardup_commit) pass them in — already
        # persisted — so the signature map is computed once, which also
        # removes the capped path's documented double-eval.
        sigs = minhash_md5_signatures(
            new_docs, text_col, id_col, num_hashes=num_hashes, shingle_n=shingle_n
        )
        band_rows = minhash_md5_band_rows(sigs, id_col, num_hashes, bands)
    shard_rows = band_rows
    store_rows = read_delta(spark, bucket_store_path).select(
        "band", "bucket", F.col(id_col).alias("__old")
    )
    if max_bucket_size is not None:
        # cap on the union: a hot bucket is hot regardless of which side
        # its members came from. Rows carry a literal side tag INTO the
        # capped union and split back by it afterwards — zero extra
        # joins, and the cap window partitions on the same (band, bucket)
        # key the candidate join hash-partitions on anyway.
        tagged = store_rows.select(
            F.col("__old").alias(id_col), "band", "bucket",
            F.lit("store").alias("__side"),
        ).unionByName(
            shard_rows.select(
                id_col, "band", "bucket", F.lit("shard").alias("__side")
            )
        )
        capped = _cap_buckets(tagged, ["band", "bucket"], max_bucket_size, cap_mode)
        store_side = capped.filter(F.col("__side") == "store").select(
            "band", "bucket", F.col(id_col).alias("__old")
        )
        shard_side = capped.filter(F.col("__side") == "shard").select(
            id_col, "band", "bucket"
        )
    else:
        store_side = store_rows
        shard_side = shard_rows
    # self-pair guard: re-probing a shard whose docs were already
    # appended to the store would otherwise pair every doc with itself
    j = shard_side.join(store_side, ["band", "bucket"]).where(
        F.col(id_col) != F.col("__old")
    )
    return (
        j.groupBy(F.col(id_col).alias("id_new"), F.col("__old").alias("id_old"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def maintain_dedup_store(
    spark,
    store_path,
    target_file_mb: float = 128,
    retain_hours: float = 168.0,
    checkpoint_log: bool = True,
    drop_where: str | None = None,
) -> dict:
    """Maintenance policy for the incremental-dedup stores (the
    fingerprint store of :func:`incremental_dedup_commit` and the
    band-bucket store of :func:`incremental_neardup_candidates`) — the
    piece that keeps "the store is tiny vs the corpus" TRUE at daily
    100 TB ingest, where one append per shard otherwise accretes
    thousands of small files and an unbounded log.

    THE POLICY (each step is safe while writers/readers are live):

    1. **Compact** (weekly, or when files >> shards): ``optimize`` folds
       the per-shard appends into ~``target_file_mb`` files as a
       ``dataChange: false`` commit — replaying streams skip it, and the
       protocol retains SetTransaction markers through it, so
       crash-REPLAY of an in-flight shard still sees its
       ``last_txn_version`` and stays exactly-once (pinned by
       tests/test_store_maintenance_r11.py, including a live
       writer-vs-maintainer race).
    2. **Checkpoint the log**: the store sees one commit per shard
       forever; folding into a checkpoint keeps snapshot replay O(1) in
       shard count. Txn markers are carried INTO the checkpoint, so
       truncating pre-checkpoint commits never forgets an appId.
    3. **Content retention** (``drop_where``, OPTIONAL): the stores are
       the dedup MEMORY — by default they must grow with the corpus
       (one fp row / ``bands`` bucket rows per kept doc; that ~0.05% /
       ~0.2% of corpus bytes IS the steady state, not a leak). Pipelines
       that only dedup against a bounded horizon (e.g. "last 90 days of
       crawl") stamp an ingest column on their store rows and pass
       ``drop_where="ingest_day < '...'"``; rows outside the horizon are
       deleted via ``delete_where`` (a normal logged commit — replayable,
       time-travelable until vacuum). A doc whose fingerprint aged out
       becomes ingestable again — that is the SEMANTIC of a dedup
       horizon, so this step is opt-in and never a default.
    4. **Vacuum** with ``retain_hours`` >= the longest reader/pinned
       paired-read window (Delta's 7-day default here): superseded
       pre-compaction files are physically removed. A paired read pinned
       PAST the retention window fails LOUD on the missing file (never
       resurrects stale rows) — the documented trade of retention vs
       pin age.

    Returns {"optimize": .., "checkpoint_version": .., "deleted": ..,
    "vacuum": ..} for observability.

    Reference parity: the reference engine has no incremental-store
    concept (its dedup is one-shot per query); this is the Delta-native
    maintenance story a production deployment of the same capability
    needs.
    """
    from duck_delta_share_spark.sources.delta_log import (
        checkpoint as _checkpoint,
        delete_where as _delete_where,
        optimize as _optimize,
        vacuum as _vacuum,
    )

    opt = _optimize(spark, store_path, target_file_mb=target_file_mb)
    ck = _checkpoint(store_path) if checkpoint_log else None
    deleted = (
        _delete_where(spark, store_path, drop_where)
        if drop_where is not None
        else None
    )
    vac = _vacuum(store_path, retain_hours=retain_hours)
    return {
        "optimize": opt,
        "checkpoint_version": ck,
        "deleted": deleted,
        "vacuum": vac,
    }


def incremental_neardup_commit(
    spark,
    new_docs: DataFrame,
    pairs_path,
    band_store_path,
    app_id: str,
    shard_version: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 3,
    max_bucket_size: int | None = 2000,
    cap_mode: str = "window",
) -> dict:
    """Two-table transactional step of the incremental NEAR-dup pipeline —
    the MinHash twin of :func:`incremental_dedup_commit`, in the same
    exactly-once shape: per shard, append (1) the candidate PAIRS (the
    shard vs the maintained band-bucket store, PLUS within-shard pairs)
    to ``pairs_path``, and (2) the shard's own band rows to
    ``band_store_path``, both carrying SetTransaction
    ``(app_id, shard_version)`` and each gated on ``last_txn_version``.

    Commit ORDER is pairs FIRST, band store SECOND — the corpus-first
    rule instantiated here: a crash between the two leaves pairs whose
    shard band rows are not yet in the store, and the replay — probing
    the UNCHANGED store — reproduces the identical pair set and
    completes the store append. The REVERSE order poisons the replay:
    with the shard's band rows already in the store, every within-shard
    pair would also arrive from the store probe (duplicated as
    vs='history') and the shard's docs would candidate against
    themselves.

    Pairs schema: (id_new, id_old, n_shared_bands, vs) with vs in
    {'history', 'shard'} — id_new/id_old are min/max-ordered for the
    within-shard side, matching incremental_neardup_new_shard's oracle
    convention.

    The shard's band rows are computed ONCE and persisted across the
    store probe, the within-shard self-join, and the store append
    (three consumers — the multi-subtree rule), which also removes the
    capped path's documented double-eval for this caller.

    ``cap_mode`` threads to BOTH pair sources (the store probe and the
    within-shard self-join): "window" (default) or "broadcast" — the
    skew-safe dial for hot boilerplate buckets at corpus scale; see
    :func:`_cap_buckets`.

    Returns {"n_pairs", "pairs_version", "store_version"} (None values =
    crash-replay no-op, like the exact twin).
    """
    from duck_delta_share_spark.sources.delta_log import (
        last_txn_version,
        write_delta,
    )

    if shard_version <= last_txn_version(
        pairs_path, app_id
    ) and shard_version <= last_txn_version(band_store_path, app_id):
        return {"n_pairs": None, "pairs_version": None, "store_version": None}

    sigs = minhash_md5_signatures(
        new_docs, text_col, id_col, num_hashes=num_hashes, shingle_n=shingle_n
    )
    shard_rows = minhash_md5_band_rows(sigs, id_col, num_hashes, bands).persist()
    try:
        vs_hist = incremental_neardup_candidates(
            spark,
            new_docs,
            band_store_path,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_n=shingle_n,
            max_bucket_size=max_bucket_size,
            cap_mode=cap_mode,
            band_rows=shard_rows,
        ).withColumn("vs", F.lit("history"))
        # the within-shard self-join honors the same cap (and cap_mode —
        # the skew-safe broadcast dial must be reachable from the
        # transactional/streaming ingest path, ADVICE r11) as the store
        # probe (a boilerplate-heavy shard can have its own hot bucket;
        # pair count is quadratic in bucket size)
        within_rows = _cap_buckets(
            shard_rows, ["band", "bucket"], max_bucket_size, cap_mode
        )
        a = within_rows.select(F.col(id_col).alias("__ia"), "band", "bucket")
        b = within_rows.select(F.col(id_col).alias("__ib"), "band", "bucket")
        within = (
            a.join(b, ["band", "bucket"])
            .where(F.col("__ia") < F.col("__ib"))
            .groupBy(
                F.col("__ia").alias("id_new"), F.col("__ib").alias("id_old")
            )
            .agg(F.count(F.lit(1)).alias("n_shared_bands"))
            .withColumn("vs", F.lit("shard"))
        )
        pairs = vs_hist.unionByName(within).persist()
        try:
            n = pairs.count()
            pairs_version = None
            if shard_version > last_txn_version(pairs_path, app_id):
                pairs_version = write_delta(
                    pairs, pairs_path, txn=(app_id, shard_version)
                )
            store_version = None
            if shard_version > last_txn_version(band_store_path, app_id):
                store_version = write_delta(
                    shard_rows, band_store_path, txn=(app_id, shard_version)
                )
        finally:
            # unpersist on the crash path too (a mid-commit failure in a
            # foreachBatch otherwise leaks one cached frame per retry)
            pairs.unpersist()
    finally:
        shard_rows.unpersist()
    return {
        "n_pairs": n,
        "pairs_version": pairs_version,
        "store_version": store_version,
    }
