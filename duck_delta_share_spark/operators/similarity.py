"""Similarity search over embedding columns (§2C).

- ``brute_force_topk`` — exact top-k: broadcast the (small) query set, score
  every base vector map-side (zero shuffle for the scoring), then a single
  window shuffle partitioned by query id for the top-k cut. This is the
  correctness baseline and is oracle-checkable.
- ``lsh_bucket_topk`` — the 100 TB path: multi-table random-hyperplane
  (k,L)-LSH; candidates only form inside a shared bucket, so scoring cost
  drops from O(N·Q) to the tuned candidate volume.
- ``embedding_near_dup_pairs`` — blocked pair join + batch cosine.

Precision modes: the oracle-gated exact query keeps Catalyst expressions
(order-pinned folds match DuckDB bit-exactly, functions/vectors.py). The
hot loops (bucket hashing, pair scoring) default to Arrow-batched numpy —
Catalyst higher-order functions run INTERPRETED, so one batch matmul per
Arrow chunk beats per-row expression folds ~5× even at 64-d; an
expression fallback (``scorer='expr'``) remains for Python-less
deployments.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from duck_delta_share_spark.functions.vectors import (
    dot_exact,
    dot_fast,
    norm_exact,
    norm_fast,
)


def brute_force_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
    contrast_col: str | None = None,
) -> DataFrame:
    """Exact cosine top-k of ``base`` rows per ``queries`` row.

    ``queries`` must be small (it is broadcast). Output:
    (query_id, vec_id, cosine, rk) with rk ≤ k, self-matches excluded.

    ``contrast_col``: when set, only base rows whose value in this column
    DIFFERS from the query row's count as candidates (SQL <> semantics:
    NULLs never match) — hard-negative mining for contrastive training:
    the most-similar vectors with a different label.
    """
    dot = dot_exact if exact else dot_fast
    norm = norm_exact if exact else norm_fast

    # Zero-norm vectors have no cosine (0/0 = NaN, which Spark orders
    # ABOVE every real double — one zero vector in base would become rk=1
    # for every query); skip them like the int8 twin's __n2 > 0 guard.
    extra_b = [F.col(contrast_col).alias("__bc")] if contrast_col else []
    extra_q = [F.col(contrast_col).alias("__qc")] if contrast_col else []
    # the per-pair order-pinned fold below is interpreted (no codegen):
    # spread an underparallel base scan so it never runs on one core
    base = _spread_small(base)
    b = base.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__bv"),
        norm(vec_col).alias("__bn"),
        *extra_b,
    ).filter(F.col("__bn") > 0)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(vec_col).alias("__qn"),
        *extra_q,
    ).filter(F.col("__qn") > 0)
    cond = F.col("vec_id") != F.col("query_id")
    if contrast_col:
        cond = cond & (F.col("__bc") != F.col("__qc"))
    scored = (
        b.join(F.broadcast(q), cond)
        .withColumn("cosine", dot(F.col("__qv"), F.col("__bv")) / (F.col("__qn") * F.col("__bn")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )


def _idot_arrow_udf():
    """Arrow-batched INTEGER dot product over joined int8-vector pairs:
    one int64 einsum per batch instead of an interpreted zip_with+fold
    per row (HOFs have no codegen — ~130 interpreted dispatches per pair
    at dim 64). Exact int64 accumulation, so the result is bit-identical
    to the expression fold on any input the fold itself can represent
    (|idot| <= dim * 127^2 — nowhere near int64).

    Marked nondeterministic ON PURPOSE (the function is pure): a
    score-threshold filter over the UDF output otherwise gets rewritten
    in terms of the raw UDF CALL and pushed below the scoring
    projection, leaving TWO ArrowEvalPython nodes in the plan — every
    pair crosses the Python boundary twice (r12 plan audit of
    similarity_range_search). The marker bars Catalyst from duplicating
    or pushing through the call; it never changes a value."""
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def idot_batch(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:  # Arrow may deliver empty batches
            return pd.Series([], dtype="int64")
        A = np.vstack(a.to_numpy()).astype(np.int64)
        B = np.vstack(b.to_numpy()).astype(np.int64)
        return pd.Series(np.einsum("ij,ij->i", A, B))

    return idot_batch.asNondeterministic()


def _spread_small(df: DataFrame) -> DataFrame:
    """Round-robin-spread a frame across all cores ONLY when it arrives
    in fewer partitions than cores (the local small-file case: a one-file
    parquet scan is ONE task, so every per-pair score downstream of a
    broadcast join runs serially on one core). When the scan already has
    >= cores partitions — always true at 100 TB — this is a no-op: an
    unconditional repartition would shuffle the corpus before a narrow
    map (same contract as minhash's spread guard, operators/dedup.py)."""
    spread = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= spread:
        return df
    return df.repartition(spread)


def _pair_idot(scorer: str):
    """idot expression for the (``__qq``, ``__bq``) joined pair columns:
    ``arrow`` = the vectorized einsum (default, wins whenever pair volume
    is non-trivial), ``expr`` = the pure-JVM interpreted fold (kept for
    one-shot/cold calls and as the cross-checkable reference)."""
    if scorer == "arrow":
        return _idot_arrow_udf()(F.col("__qq"), F.col("__bq"))
    return F.aggregate(
        F.zip_with("__qq", "__bq", lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def int8_topk(
    base: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer: str = "arrow",
) -> DataFrame:
    """Quantized (int8) cosine top-k — the memory-bandwidth scale path:
    score candidates on 4x-smaller symmetric-int8 vectors
    (``operators/embeddings.py:quantize_int8``) instead of float32.

    The ranking score is the quantized cosine
    ``idot / sqrt(saa * sbb)`` where idot/saa/sbb are INTEGER dot products
    of the int8 vectors (exact long sums, order-independent — no float
    accumulation nondeterminism); the per-vector scales cancel out of the
    cosine, and the final division/sqrt are single correctly-rounded IEEE
    ops, so the score is bit-identical across engines and the whole
    operator sits under a DuckDB oracle (unlike float32 cosine paths that
    need order-pinned folds). At 100 TB this is how FAISS-style engines
    scan: int8 SIMD dot products over 1/4 the bytes, exact float rescore
    only on the shortlist (compose with ``brute_force_topk`` for that).

    Output: (query_id, vec_id, score_e6, rk), rk <= k, self-matches
    excluded, zero vectors skipped (no cosine exists).
    """
    # staging discipline (three projections, no HOF inlining) lives ONCE
    # in _int8_prep; only the column names differ per side
    b = _int8_prep(
        _spread_small(base), id_col, vec_col, "vec_id"
    ).withColumnsRenamed({"__q": "__bq", "__n2": "__bn2"})
    q = _int8_prep(queries, id_col, vec_col, "query_id").withColumnsRenamed(
        {"__q": "__qq", "__n2": "__qn2"}
    )
    # materialize the (exact-integer) idot in its own projection, then
    # derive the score: division/floor stay Catalyst expressions so the
    # IEEE op sequence is pinned in ONE place for both scorer dials
    scored = (
        b.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("__idot", _pair_idot(scorer))
        .withColumn(
            "score",
            F.col("__idot").cast("double")
            / F.sqrt((F.col("__qn2") * F.col("__bn2")).cast("double")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "vec_id",
            F.floor(F.col("score") * F.lit(1e6) + F.lit(0.5)).cast("long").alias("score_e6"),
            "rk",
        )
    )


def int8_range_search(
    base: DataFrame,
    queries: DataFrame,
    min_score_e6: int = 800_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer: str = "arrow",
) -> DataFrame:
    """Radius (threshold) search — the ANN "range query" companion to
    top-k: every (query, vector) pair whose quantized-int8 cosine clears
    ``min_score_e6`` (score * 1e6, floor+0.5 rounded). FAISS calls this
    ``range_search``; dedup pipelines use it to pull ALL near-neighbors
    above a similarity bar rather than a fixed k.

    Scale shape — strictly better than top-k: the broadcast-join + filter
    is a pure NARROW map over the base scan (top-k needs a ranking window
    = one shuffle on query_id); at 100 TB the threshold pass is
    shuffle-free and emits only qualifying pairs. Scoring is the same
    integer-exact quantized cosine as :func:`int8_topk` (bit-identical
    across engines, DuckDB-oracle-checkable).

    Output: (query_id, vec_id, score_e6), self-matches excluded.
    """
    # identical prep/scoring to int8_topk via the SHARED _int8_prep —
    # one copy of the load-bearing projection discipline, not three
    b = _int8_prep(
        _spread_small(base), id_col, vec_col, "vec_id"
    ).withColumnsRenamed({"__q": "__bq", "__n2": "__bn2"})
    q = _int8_prep(queries, id_col, vec_col, "query_id").withColumnsRenamed(
        {"__q": "__qq", "__n2": "__qn2"}
    )
    return (
        b.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn("__idot", _pair_idot(scorer))
        .withColumn(
            "score",
            F.col("__idot").cast("double")
            / F.sqrt((F.col("__qn2") * F.col("__bn2")).cast("double")),
        )
        .withColumn(
            "score_e6",
            F.floor(F.col("score") * F.lit(1e6) + F.lit(0.5)).cast("long"),
        )
        .filter(F.col("score_e6") >= int(min_score_e6))
        .select("query_id", "vec_id", "score_e6")
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes for sign-LSH."""
    rng = np.random.RandomState(seed)
    return rng.normal(size=(n_planes, dim)).tolist()


def lsh_bucket(vec_col: str, dim: int, n_planes: int = 8, seed: int = 42):
    """Sign-LSH bucket id (0..2^n_planes-1) as a Catalyst expression:
    bucket bit i = sign(plane_i · vec). Planes are literal arrays, so the
    whole thing is map-side codegen — no shuffle, no Python."""
    planes = _hyperplanes(dim, n_planes, seed)
    bucket = F.lit(0).cast("bigint")
    for i, plane in enumerate(planes):
        plane_col = F.array(*[F.lit(float(x)) for x in plane])
        d = dot_fast(plane_col, F.col(vec_col))
        bucket = bucket + F.when(d > 0, F.lit(2**i).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return bucket


# Named (k,L) operating points for lsh_bucket_topk — the recall/volume
# dial, measured against 1-(1-p^k)^L theory in tests/test_ann_recall.py:
# - "weak_neighbors": k=4,L=8 — corpora whose true neighbors sit at cosine
#   ~0.4 (p≈0.62): recall ~0.7 at ~50% candidate volume. On near-random
#   data no sublinear method does better; this is the safe default.
# - "clustered": k=6,L=8 — corpora with tight clusters (neighbor cosine
#   ~0.8, p≈0.8): recall ~0.9 at ~3% candidate volume; the preset for
#   dedup-ish embedding spaces where most mass is in dense clusters.
ANN_PRESETS: dict[str, dict[str, int]] = {
    "weak_neighbors": {"n_planes": 4, "n_tables": 8},
    "clustered": {"n_planes": 6, "n_tables": 8},
}


def lsh_bucket_topk(
    base: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer: str = "arrow",
    preset: str | None = None,
) -> DataFrame:
    """Approximate top-k via MULTI-TABLE sign-LSH: ``n_tables`` independent
    hash tables of ``n_planes`` hyperplanes each; a base vector is a
    candidate if it shares a bucket with the query in ANY table (standard
    (k,L)-LSH — recall = 1-(1-p^k)^L where p = 1-θ/π, measured to match
    theory exactly on the synthetic fixtures). Tune k (planes) up for
    clustered data (cosine-0.8 neighbors: k=6,L=8 → recall ~0.9 at ~3%
    candidate volume); the k=4,L=8 default targets weak-neighbor corpora
    (cosine ~0.4 → recall ~0.7 at ~50% volume) — on near-random data no
    sublinear method does better (there is no structure to exploit).

    Scale shape: base explodes ×L into (table, bucket) rows — the recall /
    shuffle-volume dial; queries broadcast; the equi-join on
    (table, bucket) replaces the all-pairs cross join; candidates dedupe
    on (query, vec) before scoring so a pair found in 3 tables is scored
    once."""
    # All n_tables × n_planes plane dots in ONE numpy matmul per Arrow
    # batch (V @ P.T → signs → packed bucket per table). The expression
    # alternative is n_tables*n_planes interpreted fold-dots per row —
    # the dominant cost at any scale.
    from pyspark.sql.types import ArrayType, LongType

    if preset is not None:
        cfg = ANN_PRESETS[preset]
        n_planes, n_tables = cfg["n_planes"], cfg["n_tables"]

    planes = np.vstack(
        [_hyperplanes(dim, n_planes, seed=42 + t) for t in range(n_tables)]
    )  # (n_tables*n_planes, dim)
    weights = 2 ** np.arange(n_planes, dtype=np.int64)
    # offset buckets by table so (tbl, bucket) collapses to one long
    offsets = np.arange(n_tables, dtype=np.int64) << 32

    @F.pandas_udf(ArrayType(LongType()))
    def table_buckets(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # Arrow may deliver empty batches
            return pd.Series([], dtype=object)
        V = np.vstack(v.to_numpy()).astype(np.float64)
        bits = ((V @ planes.T) > 0).reshape(len(V), n_tables, n_planes)
        per_table = (bits * weights).sum(axis=2) + offsets  # (rows, n_tables)
        return pd.Series(list(per_table.astype(np.int64)))

    # Bucket join on IDs ONLY — the multi-table dedupe shuffles 16-byte id
    # pairs, not vectors; vectors re-attach after (query side broadcast,
    # base side an equi-join AQE can broadcast when the base is small).
    b = base.select(
        F.col(id_col).alias("vec_id"), F.explode(table_buckets(vec_col)).alias("__tb")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.explode(table_buckets(vec_col)).alias("__qtb")
    )
    candidates = (
        b.join(
            F.broadcast(q),
            (F.col("__tb") == F.col("__qtb")) & (F.col("vec_id") != F.col("query_id")),
        )
        # a pair can collide in several tables — score once
        .select("query_id", "vec_id")
        .distinct()
    )
    return _score_rank_candidates(
        base, queries, candidates, k, id_col, vec_col, scorer
    )


def _score_rank_candidates(
    base: DataFrame,
    queries: DataFrame,
    candidates: DataFrame,
    k: int,
    id_col: str,
    vec_col: str,
    scorer: str,
) -> DataFrame:
    """Shared LSH tail: re-attach vectors to (query_id, vec_id) candidate
    pairs, cosine-score, rank. Used by the float-hyperplane production
    path and the integer-lattice oracled twin so the two can never
    drift."""
    # zero-norm guard BEFORE scoring: under ANSI the expr scorer's
    # division throws DIVIDE_BY_ZERO outright (and the arrow scorer's NaN
    # would sort above every real cosine)
    bv = base.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__bv")
    ).filter(norm_fast(F.col("__bv")) > 0)
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    ).filter(norm_fast(F.col("__qv")) > 0)
    pairs = candidates.join(bv, "vec_id").join(F.broadcast(qv), "query_id")
    if scorer == "arrow":
        cosine = _cosine_arrow_udf()(F.col("__qv"), F.col("__bv"))
    else:
        cosine = dot_fast(F.col("__qv"), F.col("__bv")) / (
            norm_fast(F.col("__qv")) * norm_fast(F.col("__bv"))
        )
    # zero-norm vectors score NaN (0/0) and Spark orders NaN ABOVE every
    # real double — drop them (no cosine exists), matching int8_topk
    scored = pairs.withColumn("cosine", cosine).filter(
        F.col("cosine").isNotNull() & ~F.isnan("cosine")  # arrow NaN→NULL
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )


def lattice_hyperplanes(
    dim: int, n_planes: int, n_tables: int
) -> np.ndarray:
    """md5-derived INTEGER hyperplane coefficients in [-8, 8]: coefficient
    (t, i, j) = (first 7 md5 hex digits of "t|i|j") % 17 - 8 — exactly
    recomputable in ANSI SQL (the minhash_md5 trick applied to
    hyperplanes), so a sign-LSH pipeline built on them is cross-engine
    deterministic end to end. Returns int64 (n_tables*n_planes, dim)."""
    import hashlib

    out = np.empty((n_tables * n_planes, dim), dtype=np.int64)
    for t in range(n_tables):
        for i in range(n_planes):
            for j in range(dim):
                h = int(
                    hashlib.md5(f"{t}|{i}|{j}".encode()).hexdigest()[:7], 16
                )
                out[t * n_planes + i, j] = h % 17 - 8
    return out


def lsh_lattice_topk(
    base: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hash-checkable twin of :func:`lsh_bucket_topk`: the SAME multi-table
    sign-LSH pipeline (explode ×L into (table, bucket) rows, bucket
    equi-join, dedupe, score, rank — the candidate join and the scoring
    tail are literally shared code), but the hyperplanes are md5-derived
    INTEGER lattice directions and the vectors are pinned to the e6
    integer grid before the plane dot. Integer dot products are exact and
    order-independent, so the sign (and therefore every bucket, every
    candidate pair, and the final ranking) is bit-identical between
    numpy's batch matmul here and a DuckDB first-principles re-derivation
    — closing the one gap that kept the float-hyperplane path rows-only
    (a float plane dot near zero can flip sign in the last ulp between a
    matmul and an ordered fold).

    Production keeps :func:`lsh_bucket_topk` (Gaussian planes have the
    textbook collision geometry); this variant is the correctness
    certificate for the shared pipeline and a drop-in when cross-engine
    reproducibility of the BUCKETS themselves matters (e.g. incremental
    ANN stores written by one engine and probed by another).

    |dot| ≤ dim · 8 · max|v|·1e6 ≈ 5e8·max|v| — no int64 overflow for any
    sane embedding scale (ANSI would fail loud, not wrap).
    """
    from pyspark.sql.types import ArrayType, LongType

    planes = lattice_hyperplanes(dim, n_planes, n_tables)
    weights = 2 ** np.arange(n_planes, dtype=np.int64)
    offsets = np.arange(n_tables, dtype=np.int64) << 32

    @F.pandas_udf(ArrayType(LongType()))
    def table_buckets(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # Arrow may deliver empty batches
            return pd.Series([], dtype=object)
        V = np.vstack(v.to_numpy()).astype(np.float64)
        # e6 grid pin: floor(x*1e6 + 0.5) — the same IEEE op sequence the
        # SQL side runs, so the int64 inputs (hence the exact dots and
        # signs) agree bit-for-bit
        Ve6 = np.floor(V * 1e6 + 0.5).astype(np.int64)
        bits = ((Ve6 @ planes.T) > 0).reshape(len(V), n_tables, n_planes)
        per_table = (bits * weights).sum(axis=2) + offsets
        return pd.Series(list(per_table.astype(np.int64)))

    # malformed rows (NULL / wrong-dim vectors) are excluded from
    # bucketing on BOTH engines — np.vstack needs a rectangle, and the
    # oracle filters LEN(embedding)=dim the same way
    ok = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    b = base.filter(ok).select(
        F.col(id_col).alias("vec_id"),
        F.explode(table_buckets(vec_col)).alias("__tb"),
    )
    q = queries.filter(ok).select(
        F.col(id_col).alias("query_id"),
        F.explode(table_buckets(vec_col)).alias("__qtb"),
    )
    candidates = (
        b.join(
            F.broadcast(q),
            (F.col("__tb") == F.col("__qtb"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select("query_id", "vec_id")
        .distinct()
    )
    return _score_rank_candidates(
        base, queries, candidates, k, id_col, vec_col, scorer="expr"
    )


def train_ivf_centroids(
    base: DataFrame,
    dim: int,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train_sample: int = 10_000,
    iters: int = 8,
    seed: int = 42,
) -> np.ndarray:
    """Spherical k-means centroids for IVF, trained on a BOUNDED sample.

    The collect here is deliberate and scale-safe: an IVF coarse quantizer
    is a tiny model (n_centroids x dim floats) fitted on a bounded sample
    (standard practice — FAISS trains IVF on ~max(10k, 50*n_centroids)
    points regardless of corpus size). The sample is the deterministic
    id-ordered prefix (a distributed TakeOrdered, not a full sort), so
    training is reproducible across runs and partitionings.
    """
    rows = (
        base.select(F.col(id_col), F.col(vec_col))
        .orderBy(id_col)
        .limit(max_train_sample)
        .collect()
    )
    X = np.vstack([r[1] for r in rows]).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    C = X[rng.choice(len(X), size=min(n_centroids, len(X)), replace=False)].copy()
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members) == 0:  # dead centroid: reseed on a random point
                C[c] = X[rng.randint(len(X))]
            else:
                m = members.mean(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    return C


def _nearest_centroid_udf(C: np.ndarray):
    """Arrow-batched argmax-cosine assignment against the (broadcast via
    task closure) centroid matrix — shared by ivf_topk and the persisted
    index builder so the two can never drift."""
    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def nearest_centroid(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # Arrow may deliver empty batches
            return pd.Series([], dtype="int32")
        V = np.vstack(v.to_numpy()).astype(np.float64)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(V @ C.T, axis=1).astype(np.int32))

    return nearest_centroid


def _probe_centroids_udf(C: np.ndarray, n_probe: int):
    """Arrow-batched top-``n_probe`` centroid probe order per query."""
    from pyspark.sql.types import ArrayType, IntegerType

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe_centroids(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # Arrow may deliver empty batches
            return pd.Series([], dtype=object)
        V = np.vstack(v.to_numpy()).astype(np.float64)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        order = np.argsort(-(V @ C.T), axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(order))

    return probe_centroids


def ivf_topk(
    base: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 64,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
    max_train_sample: int = 10_000,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k via IVF (inverted-file) coarse quantization — the
    second ANN scale path next to :func:`lsh_bucket_topk`, and the better
    one when the corpus is CLUSTERED (most real embedding spaces): LSH
    buckets are data-oblivious; IVF centroids adapt to where the mass is.

    Scale shape: assignment is a narrow map (one argmax per vector against
    broadcast centroids — no shuffle); each base vector lands in exactly
    ONE inverted list, so the candidate join on ``__cid`` touches
    ~n_probe/n_centroids of the corpus per query and never all-pairs.
    Recall dial: raise ``n_probe`` toward ``n_centroids`` → exact scan.
    Centroid training collects a bounded sample (see
    :func:`train_ivf_centroids`); pass precomputed ``centroids`` to reuse
    a trained quantizer across queries/jobs.
    """
    # zero-norm vectors have no cosine: exclude them BEFORE assignment /
    # probing, like brute_force_topk's __bn/__qn guards — the r8 zerovec
    # fuzz caught an all-zero query emitting k NULL-cosine rows (the
    # arrow scorer's 0/0 NaN round-trips to NULL through Arrow, which
    # F.isnan does NOT catch)
    base = base.filter(norm_fast(F.col(vec_col)) > 0)
    queries = queries.filter(norm_fast(F.col(vec_col)) > 0)
    C = centroids if centroids is not None else train_ivf_centroids(
        base, dim, n_centroids, id_col, vec_col, max_train_sample, seed=seed
    )
    n_probe = min(n_probe, len(C))
    nearest_centroid = _nearest_centroid_udf(C)
    probe_centroids = _probe_centroids_udf(C, n_probe)

    b = base.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__bv"),
        nearest_centroid(vec_col).alias("__cid"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(probe_centroids(vec_col)).alias("__cid"),
    )
    pairs = b.join(F.broadcast(q), "__cid").filter(
        F.col("vec_id") != F.col("query_id")
    )
    # belt-and-braces behind the entry norm filters: the arrow scorer's
    # 0/0 NaN becomes NULL through Arrow (isnan alone misses it)
    scored = pairs.withColumn(
        "cosine", _cosine_arrow_udf()(F.col("__qv"), F.col("__bv"))
    ).filter(F.col("cosine").isNotNull() & ~F.isnan("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )


def _cosine_arrow_udf():
    """Arrow-batched cosine: numpy batch matmul over the joined vector
    pairs. Pair scoring is the hot loop of blocked near-dup (|block|²/2
    pairs) and Catalyst higher-order functions run interpreted — the
    vectorized pandas UDF is ~4× faster and the Arrow batch size bounds
    executor memory."""
    from pyspark.sql.types import DoubleType

    @F.pandas_udf(DoubleType())
    def cos_batch(a: pd.Series, b: pd.Series) -> pd.Series:
        import numpy as np

        if len(a) == 0:  # Arrow may deliver empty batches
            return pd.Series([], dtype="float64")
        A = np.vstack(a.to_numpy()).astype(np.float64)
        B = np.vstack(b.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.sqrt(np.einsum("ij,ij->i", A, A)) * np.sqrt(
            np.einsum("ij,ij->i", B, B)
        )
        return pd.Series(num / den)

    return cos_batch


def embedding_near_dup_pairs(
    df: DataFrame,
    block_col: str,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scorer: str = "block",
) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key (e.g. a coarse
    cluster/label or an LSH bucket). Never all-pairs across blocks.

    ``scorer='block'`` (default) is the 100 TB shape: ONE shuffle row per
    vector (groupBy block → applyInPandas), one C-speed matmul per block,
    and only surviving pairs ever materialize. The older pair-join scorers
    shuffled |block|²/2 joined rows each carrying BOTH full vectors — at
    8x corpus growth that's 8x pair rows x 2 vectors of wasted exchange,
    measured super-linear in scale_check.py. Memory bound: a block must
    fit one task (|block| x dim doubles + |block|² sims); cap or re-split
    degenerate blocks upstream, same guidance as the LSH bucket cap.

    ``scorer='arrow'`` keeps the pair join + vectorized numpy UDF;
    ``'expr'`` scores JVM-side (expression fold) for environments where
    the Python worker is undesirable."""
    # NULL / empty vectors have no cosine and CRASH the block matmul
    # with an unrelated numpy shape error — pre-filter them for every
    # scorer. Zero-norm / NaN handling stays per-path where it is
    # already paid for: the arrow/expr paths filter norm_fast(__v) > 0
    # and NaN-guard the output (a second interpreted aggregate here
    # would double that cost per row — CLAUDE.md: HOFs have no CSE);
    # the block scorer masks zero-norm rows numpy-side below.
    df = df.where(F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0))
    if scorer == "block":
        from pyspark.sql.types import DoubleType, StructField, StructType

        id_type = df.schema[id_col].dataType
        out_schema = StructType(
            [
                StructField("id_a", id_type),
                StructField("id_b", id_type),
                StructField("cosine", DoubleType()),
            ]
        )

        def score_block(pdf: pd.DataFrame) -> pd.DataFrame:
            import numpy as np

            n = len(pdf)
            if n < 2:
                return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                    {"cosine": "float64"}
                )
            ids = pdf[id_col].to_numpy()
            lens = pdf[vec_col].map(len)
            if lens.min() != lens.max():
                raise ValueError(
                    f"ragged embedding dimensions {lens.min()}..{lens.max()} "
                    f"in block {pdf['__blk'].iloc[0]!r}: embeddings must "
                    "share one dimensionality"
                )
            A = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
            norms = np.sqrt(np.einsum("ij,ij->i", A, A))
            # mask zero-norm / non-finite rows BEFORE the matmul: 0/0
            # divisions emit runtime warnings and NaN rows waste the
            # quadratic work (their pairs are dropped by the threshold
            # mask anyway — NaN > t is False in numpy)
            ok = np.isfinite(norms) & (norms > 0)
            if not ok.all():
                ids, A, norms = ids[ok], A[ok], norms[ok]
                n = len(ids)
                if n < 2:
                    return pd.DataFrame(
                        {"id_a": [], "id_b": [], "cosine": []}
                    ).astype({"cosine": "float64"})
            sims = (A @ A.T) / np.outer(norms, norms)
            iu, ju = np.triu_indices(n, k=1)
            vals = sims[iu, ju]
            mask = vals > threshold
            ia, ib = ids[iu[mask]], ids[ju[mask]]
            return pd.DataFrame(
                {
                    "id_a": np.minimum(ia, ib),
                    "id_b": np.maximum(ia, ib),
                    "cosine": vals[mask],
                }
            )

        return (
            df.select(F.col(id_col), F.col(block_col).alias("__blk"), F.col(vec_col))
            .groupBy("__blk")
            .applyInPandas(score_block, out_schema)
        )
    v = df.select(
        F.col(id_col),
        F.col(block_col).alias("__blk"),
        F.col(vec_col).alias("__v"),
    ).filter(norm_fast(F.col("__v")) > 0)  # ANSI: zero-norm division throws
    a = v.alias("a")
    b = v.alias("b")
    joined = a.join(
        b,
        (F.col("a.__blk") == F.col("b.__blk"))
        & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
    )
    if scorer == "arrow":
        cosine = _cosine_arrow_udf()(F.col("a.__v"), F.col("b.__v"))
    else:
        cosine = dot_fast(F.col("a.__v"), F.col("b.__v")) / (
            norm_fast(F.col("a.__v")) * norm_fast(F.col("b.__v"))
        )
    return (
        joined.select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            cosine.alias("cosine"),
        )
        # NaN guard must precede the threshold: Spark orders NaN ABOVE
        # every double, so `NaN > threshold` is TRUE — a zero-norm vector
        # would "near-dup" with its whole block (the numpy block scorer is
        # immune: NaN > t is False there). NULL-safe too: the arrow
        # scorer's 0/0 NaN round-trips to NULL through Arrow.
        .filter(
            F.col("cosine").isNotNull()
            & ~F.isnan(F.col("cosine"))
            & (F.col("cosine") > threshold)
        )
    )


# ---------------------------------------------------------------------------
# Product quantization (int8-PQ) — memory-bound ANN at 100 TB
# ---------------------------------------------------------------------------


def _int8_prep(df: DataFrame, id_col: str, vec_col: str, id_alias: str):
    """Shared int8 staging (same discipline as :func:`int8_topk`): scale
    and quantized array each in their OWN projection — higher-order fns
    have no CSE, inlining the scale is O(dim^2) per row.

    The zero-vector guard filters on the CHEAP ``int8_scale > 0``
    predicate, NOT on ``__n2 > 0``: predicate pushdown inlines a filter
    straight through the staging projections (Catalyst's PushDownPredicate
    has no expression-cost check), so a ``__n2`` filter re-materializes
    the whole quantize+self-dot chain — scale inlined PER ELEMENT, O(dim²)
    — twice per input row inside the Filter node (r12 plan audit: the
    Filter condition held the full aggregate(transform(transform(...)))
    twice). The two guards keep exactly the same rows: max|x| > 0 makes
    the max element quantize to ±127 so __n2 >= 127², and max|x| = 0 (or
    NULL/empty input) zeroes/NULLs __n2 — proven identical output in
    tests/test_similarity.py + the int8-family oracles.

    NULL-ELEMENT vectors (``[1.0, NULL, 2.0]``) need their own clause
    (ADVICE r12): ``array_max`` SKIPS NULL elements, so the scale guard
    alone would let such rows through with NULL ``__q`` elements and a
    NULL ``__n2`` — the old ``__n2 > 0`` guard dropped them (the long
    fold NULL-propagates). ``exists(v, isnull)`` is O(dim) and
    pushdown-safe, restoring exact row equivalence."""
    from duck_delta_share_spark.operators.embeddings import int8_scale, quantize_int8

    staged = (
        df.filter(
            (int8_scale(vec_col) > 0)
            & ~F.exists(vec_col, lambda x: x.isNull())
        )
        .select(
            F.col(id_col).alias(id_alias),
            F.col(vec_col).alias("__v"),
            int8_scale(vec_col).alias("__s"),
        )
        .select(id_alias, quantize_int8(F.col("__v"), F.col("__s")).alias("__q"))
    )
    self_dot = F.aggregate(
        F.transform(F.col("__q"), lambda x: (x * x).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return staged.select(id_alias, "__q", self_dot.alias("__n2"))


def train_pq_codebooks(
    base: DataFrame,
    dim: int,
    m: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train_sample: int = 10_000,
    iters: int = 10,
    seed: int = 42,
) -> list["np.ndarray"]:
    """Per-subspace codebooks over int8-QUANTIZED subvectors, trained on a
    bounded deterministic sample (same posture as
    :func:`train_ivf_centroids` — a PQ codebook is a tiny model,
    m x k_codes x (dim/m) int16, fitted on ~10k points regardless of
    corpus size; FAISS does the same). Codewords are ROUNDED back to the
    int8 lattice so asymmetric-distance scoring stays pure integer math.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    sub = dim // m
    rows = (
        _int8_prep(base.select(id_col, vec_col), id_col, vec_col, "vec_id")
        .orderBy("vec_id")
        .limit(max_train_sample)
        .select("__q")
        .collect()
    )
    X = np.vstack([r[0] for r in rows]).astype(np.float64)
    rng = np.random.RandomState(seed)
    books: list[np.ndarray] = []
    for j in range(m):
        S = X[:, j * sub : (j + 1) * sub]
        k = min(k_codes, len(S))
        C = S[rng.choice(len(S), size=k, replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(k):
                members = S[assign == c]
                C[c] = (
                    S[rng.randint(len(S))]
                    if len(members) == 0
                    else members.mean(axis=0)
                )
        books.append(np.floor(C + 0.5).astype(np.int16))  # back to the lattice
    return books


def lossless_pq_codebooks(
    base: DataFrame,
    dim: int,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 50_000,
) -> list["np.ndarray"]:
    """VERIFICATION-mode codebooks: every DISTINCT int8 subvector of the
    base becomes a codeword, so encoding is exactly invertible and
    :func:`pq_topk` provably equals :func:`int8_topk` — which puts the
    whole encode→ADC→rank machinery under the exact-SQL oracle (the same
    trick as IVF's n_probe=n_centroids ≡ exact scan). NOT a scale mode:
    the distinct-subvector collect is metadata-sized only for bounded
    bases, so it is guarded by ``max_rows``."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    n = base.count()
    if n > max_rows:
        raise ValueError(
            f"lossless PQ is a verification mode; base has {n} rows "
            f"(> {max_rows}). Use train_pq_codebooks for real corpora."
        )
    sub = dim // m
    rows = (
        _int8_prep(base.select(id_col, vec_col), id_col, vec_col, "vec_id")
        .select("__q")
        .collect()
    )
    X = np.vstack([r[0] for r in rows]).astype(np.int16)
    return [np.unique(X[:, j * sub : (j + 1) * sub], axis=0) for j in range(m)]


def _pq_int8_encoder(books: list["np.ndarray"], m: int, sub: int, id_type):
    """int8-lattice PQ encoder shared by :func:`pq_topk` and
    :func:`ivfpq_lossless_topk` (exact mode can never drift from the
    production scorer): a mapInPandas over ``_int8_prep`` rows
    ``(vec_id, __q, __n2)`` emitting ``(vec_id, codes, rn2)`` where rn2
    is the EXACT reconstructed self-dot (long sums of codeword
    self-dots). Returns ``(schema, encode_fn)``."""
    from pyspark.sql.types import (
        ArrayType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    self_dots = [
        np.einsum("kd,kd->k", b.astype(np.int64), b.astype(np.int64)) for b in books
    ]
    schema = StructType(
        [
            StructField("vec_id", id_type),
            StructField("codes", ArrayType(IntegerType())),
            StructField("rn2", LongType()),
        ]
    )

    def encode(it):
        for pdf in it:
            if len(pdf) == 0:  # Arrow may deliver empty batches
                continue
            Q = np.vstack(pdf["__q"].to_numpy()).astype(np.int16)
            codes = np.empty((len(Q), m), dtype=np.int32)
            rn2 = np.zeros(len(Q), dtype=np.int64)
            for j in range(m):
                S = Q[:, j * sub : (j + 1) * sub].astype(np.int64)
                # argmin_c ||s - c||^2 == argmin_c (||c||^2 - 2 s.c): the
                # ||s||^2 term is constant per row, every quantity is an
                # EXACT int64 (|s.c| <= sub * 127^2), so the minimizer AND
                # the tie order are identical to the squared-difference
                # form — while one integer matmul replaces the
                # n_rows x k_codes x sub broadcast-subtract temporaries
                # (~256 MB/subspace at 2k-codeword lossless books; the r12
                # sf0.1 audit measured the old form dominating pq/opq)
                d2 = self_dots[j][None, :] - 2 * (S @ books[j].astype(np.int64).T)
                # ties break to the LOWEST index (np.argmin) — deterministic
                cj = np.argmin(d2, axis=1)
                codes[:, j] = cj
                rn2 += self_dots[j][cj]
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "codes": list(codes), "rn2": rn2}
            )

    return schema, encode


def _pq_int8_adc_udf(books: list["np.ndarray"], m: int, sub: int):
    """Integer asymmetric-distance scorer shared by :func:`pq_topk` and
    :func:`ivfpq_lossless_topk`: per-distinct-query ADC tables hold EXACT
    integer partial dots, a candidate's numerator is an exact long sum of
    m lookups, and the final ``idot / sqrt(qn2 * rn2)`` is two
    correctly-rounded IEEE ops — bit-identical across engines."""

    @F.pandas_udf("double")
    def adc_score(codes: pd.Series, qv: pd.Series, qn2: pd.Series, rn2: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        C = np.vstack(codes.to_numpy()).astype(np.int64)
        QV = np.vstack(qv.to_numpy()).astype(np.int64)
        # per-distinct-query ADC tables: T[j][c] = q_sub_j . codeword_jc
        out = np.zeros(len(C), dtype=np.int64)
        uniq, inv = np.unique(QV, axis=0, return_inverse=True)
        for u in range(len(uniq)):
            mask = inv == u
            tables = [
                books[j].astype(np.int64) @ uniq[u, j * sub : (j + 1) * sub]
                for j in range(m)
            ]
            acc = np.zeros(mask.sum(), dtype=np.int64)
            for j in range(m):
                acc += tables[j][C[mask, j]]
            out[mask] = acc
        return pd.Series(
            out.astype(np.float64)
            / np.sqrt((qn2.to_numpy() * rn2.to_numpy()).astype(np.float64))
        )

    return adc_score


def pq_topk(
    base: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    m: int = 8,
    codebooks: list["np.ndarray"] | None = None,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_factor: int = 0,
    rotation: "np.ndarray | None" = None,
) -> DataFrame:
    """Product-quantization top-k with asymmetric distance computation —
    the memory-bound ANN shape at 100 TB: base vectors compress to m code
    indexes (8 bytes at m=8/k=256 vs 256 bytes float32), queries stay
    full-precision int8, and each candidate scores via m table lookups
    instead of a dim-length dot.

    Everything stays integer-exact: codewords live on the int8 lattice, so
    per-query ADC tables hold INTEGER partial dots, a candidate's score
    numerator is an exact long sum of m lookups, and the reconstructed
    self-norm comes from exact codeword self-dots. The final
    ``idot / sqrt(qn2 * rn2)`` is two correctly-rounded IEEE ops — with
    :func:`lossless_pq_codebooks` the output is therefore BIT-IDENTICAL
    to :func:`int8_topk` (tested + oracle-gated); with trained codebooks
    it is the standard lossy PQ trade (recall tested vs exact).

    Scale shape: encoding is a narrow Arrow map against broadcast
    codebooks (no shuffle); scoring joins the broadcast query set against
    the encoded base; one window shuffle for the top-k cut.

    Output: (query_id, vec_id, score_e6, rk), self-matches excluded.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    sub = dim // m
    if rotation is not None:
        # OPQ: rotate FIRST, then quantize — inner products in rotated
        # space equal the originals (orthogonality), quantization error
        # drops when the rotation aligns variance with subspace cuts
        # (train_opq_rotation). Codebooks passed in must be trained on
        # ROTATED vectors.
        base = rotate_vectors(base.select(id_col, vec_col), vec_col, rotation)
        queries = rotate_vectors(queries.select(id_col, vec_col), vec_col, rotation)
    books = codebooks if codebooks is not None else train_pq_codebooks(
        base, dim, m=m, k_codes=k_codes, id_col=id_col, vec_col=vec_col
    )
    books = [np.asarray(b, dtype=np.int16) for b in books]

    # preserve the actual id type (string/int ids must survive the Arrow
    # round-trip — a hardcoded LongType breaks non-bigint id columns)
    enc_schema, encode = _pq_int8_encoder(
        books, m, sub, base.schema[id_col].dataType
    )

    b = (
        _int8_prep(base.select(id_col, vec_col), id_col, vec_col, "vec_id")
        .mapInPandas(encode, enc_schema)
        .filter(F.col("rn2") > 0)
    )
    q = _int8_prep(queries.select(id_col, vec_col), id_col, vec_col, "query_id")

    adc_score = _pq_int8_adc_udf(books, m, sub)

    scored = b.join(F.broadcast(q), F.col("vec_id") != F.col("query_id")).withColumn(
        "score",
        adc_score(F.col("codes"), F.col("__q"), F.col("__n2"), F.col("rn2")),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "vec_id")
    if not rerank_factor:
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(
                "query_id",
                "vec_id",
                F.floor(F.col("score") * F.lit(1e6) + F.lit(0.5)).cast("long").alias("score_e6"),
                "rk",
            )
        )
    # FAISS-style refine: ADC shortlists k*rerank_factor candidates per
    # query (cheap table lookups over the whole base), then only the
    # shortlist is re-scored with the FULL int8 dot — the standard answer
    # to PQ's lossy ranking. The rerank join touches O(queries * k *
    # rerank_factor) rows, never the corpus.
    shortlist = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k * rerank_factor)
        .select("query_id", "vec_id", F.col("__q").alias("__qq"), F.col("__n2").alias("__qn2"))
    )
    bfull = _int8_prep(base.select(id_col, vec_col), id_col, vec_col, "vec_id")
    idot = F.aggregate(
        F.zip_with("__qq", "__q", lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    refined = (
        shortlist.join(bfull, "vec_id")
        .withColumn(
            "score",
            idot.cast("double")
            / F.sqrt((F.col("__qn2") * F.col("__n2")).cast("double")),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "vec_id")
    return (
        refined.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "vec_id",
            F.floor(F.col("score") * F.lit(1e6) + F.lit(0.5)).cast("long").alias("score_e6"),
            "rk",
        )
    )


def rotate_vectors(
    df: DataFrame, vec_col: str, rotation: "np.ndarray", out_col: str | None = None
) -> DataFrame:
    """Apply an orthogonal rotation to an embedding column: one Arrow
    batch matmul per chunk against the broadcast (dim x dim) matrix — a
    narrow map, no shuffle, no driver involvement. The OPQ preprocessing
    step (Ge et al. 2014, "Optimized Product Quantization")."""
    from pyspark.sql.types import ArrayType, DoubleType

    R = np.ascontiguousarray(np.asarray(rotation, dtype=np.float64))

    @F.pandas_udf(ArrayType(DoubleType()))
    def rot(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        X = np.vstack(v.to_numpy()).astype(np.float64)
        if X.shape[1] != R.shape[0]:
            # loud geometry validation (project rule): a corpus whose
            # vectors don't match the trained rotation must say so, not
            # die in a cryptic gufunc core-dimension error (r7 fuzz)
            raise ValueError(
                f"rotation is {R.shape[0]}x{R.shape[1]} but the "
                f"'{vec_col}' vectors are {X.shape[1]}-dimensional — "
                "the rotation was trained on a different embedding dim"
            )
        return pd.Series(list(X @ R))

    return df.withColumn(out_col or vec_col, rot(F.col(vec_col)))


def train_opq_rotation(
    base: DataFrame,
    dim: int,
    m: int = 8,
    k_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train_sample: int = 10_000,
    opq_iters: int = 8,
    kmeans_iters: int = 6,
    seed: int = 42,
    init: str = "identity",
) -> "np.ndarray":
    """Learn the OPQ orthogonal rotation (Ge et al. 2014, alternating
    minimization): rotate → fit per-subspace codebooks → solve the
    orthogonal Procrustes problem for the rotation that best maps the
    data onto its reconstructions (SVD of X^T Y) → repeat. Plain PQ
    assumes quantization error is balanced across the m fixed subspace
    cuts; on real (anisotropic, correlated) embeddings a learned rotation
    aligns principal directions with subspace boundaries and cuts the
    error — on iid-random data it converges to a near-identity no-op.

    ``init="pca"`` starts from the parametric OPQ-P solution (Ge et al.
    §4 eigenvalue allocation): the PCA basis with principal directions
    greedily distributed over the m subspaces balancing each subspace's
    variance PRODUCT. MEASURED caveat for THIS engine: OPQ-P helps
    float-codebook PQ, but our scan path int8-quantizes per vector with
    a max-abs scale AFTER rotating — a variance-concentrating basis
    crushes the low-variance coordinates to +-1 bits and recall drops
    (anisotropic fixture: pca-init 0.12/0.48 at 1/8 iters vs identity
    0.34/0.58 — default stays "identity"; the option exists for float
    pipelines and as the documented negative result).

    Trains in FLOAT space on the same bounded deterministic sample
    posture as :func:`train_pq_codebooks` (an OPQ rotation is a tiny
    dim x dim model); the returned matrix feeds
    ``pq_topk(rotation=...)``, which rotates and THEN int8-quantizes, so
    the integer-exact ADC machinery is untouched.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    sub = dim // m
    rows = (
        base.select(F.col(id_col).alias("__i"), F.col(vec_col).alias("__v"))
        .orderBy("__i")
        .limit(max_train_sample)
        .select("__v")
        .collect()
    )
    X = np.vstack([r[0] for r in rows]).astype(np.float64)
    rng = np.random.RandomState(seed)
    if init == "pca":
        Xc = X - X.mean(axis=0)
        w, V = np.linalg.eigh(Xc.T @ Xc / max(len(Xc), 1))
        order = np.argsort(w)[::-1]
        w, V = w[order], V[:, order]
        # eigenvalue allocation: place each principal direction (variance
        # descending) into the subspace with the smallest running
        # log-variance product that still has room
        buckets: list[list[int]] = [[] for _ in range(m)]
        logprod = np.zeros(m)
        for i in range(dim):
            for b in np.argsort(logprod):
                if len(buckets[b]) < sub:
                    buckets[b].append(i)
                    logprod[b] += np.log(max(w[i], 1e-12))
                    break
        perm = [i for b in buckets for i in b]
        R = V[:, perm]
    elif init == "identity":
        R = np.eye(dim)
    else:
        raise ValueError(f"unknown OPQ init {init!r}")
    for _ in range(opq_iters):
        Xr = X @ R
        Y = np.empty_like(Xr)
        for j in range(m):
            S = Xr[:, j * sub : (j + 1) * sub]
            k = min(k_codes, len(S))
            C = S[rng.choice(len(S), size=k, replace=False)].copy()
            for _ in range(kmeans_iters):
                d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
                assign = np.argmin(d2, axis=1)
                for c in range(k):
                    members = S[assign == c]
                    C[c] = (
                        S[rng.randint(len(S))]
                        if len(members) == 0
                        else members.mean(axis=0)
                    )
            Y[:, j * sub : (j + 1) * sub] = C[np.argmin(
                ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), axis=1
            )]
        U, _, Vt = np.linalg.svd(X.T @ Y)
        R = U @ Vt
    return R


def train_residual_pq(
    base: DataFrame,
    centroids: "np.ndarray",
    dim: int,
    m: int = 8,
    k_codes: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train_sample: int = 10_000,
    iters: int = 8,
    seed: int = 42,
) -> list["np.ndarray"]:
    """Per-subspace float codebooks over IVF RESIDUALS (v̂ − c): the
    second quantization level of FAISS IVFADC. Bounded-sample training
    like every other quantizer here."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    sub = dim // m
    rows = (
        base.select(F.col(id_col), F.col(vec_col))
        .orderBy(id_col)
        .limit(max_train_sample)
        .collect()
    )
    X = np.vstack([r[1] for r in rows]).astype(np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    R = X - centroids[np.argmax(X @ centroids.T, axis=1)]
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m):
        S = R[:, j * sub : (j + 1) * sub]
        kk = min(k_codes, len(S))
        C = S[rng.choice(len(S), size=kk, replace=False)].copy()
        for _ in range(iters):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(kk):
                members = S[assign == c]
                C[c] = S[rng.randint(len(S))] if len(members) == 0 else members.mean(axis=0)
        books.append(C)
    return books


def ivfpq_topk(
    base: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    m: int = 8,
    k_codes: int = 32,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rerank_factor: int = 0,
    seed: int = 42,
) -> DataFrame:
    """FAISS IVFADC (IVF + product-quantized residuals) — the standard
    billion-scale ANN shape: the coarse quantizer routes each vector to
    ONE inverted list; only the residual (v̂ − c) is PQ-encoded (m code
    bytes per vector); a query scores only its n_probe nearest lists and
    each candidate costs ``q̂·c`` (precomputed per probed list) plus m
    table lookups: cos(q, v) = q̂·v̂ ≈ q̂·c + Σⱼ Tⱼ[codeⱼ].

    Scale shape: encode is a narrow Arrow map against broadcast models;
    candidates form ONLY inside probed lists (≈ n_probe/n_centroids of
    the corpus per query); the optional ``rerank_factor`` shortlist
    re-scores exactly via a vec_id join against the base (shortlist-sized,
    never corpus-sized). Approximate by construction → recall-tested
    (tests/test_ivfpq.py), no exact oracle exists.
    """
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    sub = dim // m
    # zero-norm vectors have no cosine: exclude at entry like ivf_topk /
    # brute_force_topk (the encode path's max(norm, 1e-12) clamp would
    # otherwise score them ~0 and the rerank cosine would go NULL)
    base = base.filter(norm_fast(F.col(vec_col)) > 0)
    queries = queries.filter(norm_fast(F.col(vec_col)) > 0)
    C = train_ivf_centroids(
        base, dim, n_centroids, id_col, vec_col, seed=seed
    )
    books = train_residual_pq(
        base, C, dim, m=m, k_codes=k_codes, id_col=id_col, vec_col=vec_col, seed=seed
    )
    n_probe = min(n_probe, len(C))

    enc_schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("__cid", IntegerType()),
            StructField("codes", ArrayType(IntegerType())),
        ]
    )

    def encode(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            V = np.vstack(pdf["__v"].to_numpy()).astype(np.float64)
            V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
            cid = np.argmax(V @ C.T, axis=1)
            R = V - C[cid]
            codes = np.empty((len(V), m), dtype=np.int32)
            for j in range(m):
                S = R[:, j * sub : (j + 1) * sub]
                d2 = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
                codes[:, j] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"], "__cid": cid.astype(np.int32), "codes": list(codes)}
            )

    b = (
        base.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__v"))
        .mapInPandas(encode, enc_schema)
    )

    @F.pandas_udf(ArrayType(IntegerType()))
    def probe(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # Arrow may deliver empty batches
            return pd.Series([], dtype=object)
        V = np.vstack(v.to_numpy()).astype(np.float64)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pd.Series(
            list(np.argsort(-(V @ C.T), axis=1)[:, :n_probe].astype(np.int32))
        )

    @F.pandas_udf(ArrayType(DoubleType()))
    def unit(v: pd.Series) -> pd.Series:
        if len(v) == 0:  # Arrow may deliver empty batches
            return pd.Series([], dtype=object)
        V = np.vstack(v.to_numpy()).astype(np.float64)
        V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        return pd.Series(list(V))

    q = queries.select(
        F.col(id_col).alias("query_id"),
        unit(vec_col).alias("__q"),
        F.explode(probe(vec_col)).alias("__cid"),
    )

    @F.pandas_udf("double")
    def adc(codes: pd.Series, qv: pd.Series, cid: pd.Series) -> pd.Series:
        if len(codes) == 0:
            return pd.Series([], dtype="float64")
        Co = np.vstack(codes.to_numpy())
        Q = np.vstack(qv.to_numpy())
        cids = cid.to_numpy()
        out = np.zeros(len(Co))
        uniq, inv = np.unique(Q, axis=0, return_inverse=True)
        for u in range(len(uniq)):
            mask = inv == u
            qh = uniq[u]
            base_dot = (C[cids[mask]] @ qh)
            tables = [books[j] @ qh[j * sub : (j + 1) * sub] for j in range(m)]
            acc = base_dot
            for j in range(m):
                acc = acc + tables[j][Co[mask, j]]
            out[mask] = acc
        return pd.Series(out)

    scored = b.join(F.broadcast(q), "__cid").filter(
        F.col("vec_id") != F.col("query_id")
    ).withColumn("score", adc(F.col("codes"), F.col("__q"), F.col("__cid")))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "vec_id")
    if not rerank_factor:
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select("query_id", "vec_id", F.col("score").alias("cosine"), "rk")
        )
    short = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k * rerank_factor)
        .select("query_id", "vec_id", "__q")
    )
    exact = short.join(
        base.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__bv")),
        "vec_id",
    ).withColumn("cosine", _cosine_arrow_udf()(F.col("__q"), F.col("__bv")))
    w2 = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        exact.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )


def ivfpq_lossless_topk(
    base: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    n_centroids: int = 16,
    m: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """VERIFICATION-mode IVFPQ: the full IVF-route → inverted-list join →
    PQ-ADC-score → rank pipeline run at its two EXACT dials —
    ``n_probe = n_centroids`` (every list probed, no candidate ever
    dropped) and :func:`lossless_pq_codebooks` on the int8 lattice
    (encode is exactly invertible, so ADC == the exact int8 dot). The
    COMPOSED pipeline therefore provably equals :func:`int8_topk`
    bit-for-bit, which puts the whole routing/encode/ADC machinery —
    previously only ingredient-by-ingredient oracled — under one exact
    DuckDB oracle (VERDICT r11 item 3). Candidates still flow
    exclusively through the inverted-list ``__cid`` join (each base
    vector sits in exactly ONE list; queries probe all of them), so the
    IVF plumbing is exercised, not bypassed.

    NOT a scale mode: lossless codebooks collect distinct subvectors
    (bounded bases only — guarded inside
    :func:`lossless_pq_codebooks`); the production lossy path is
    :func:`ivfpq_topk`. Same trainer/assignment UDFs as
    :func:`ivf_topk` — shared code, no drift.

    Output: (query_id, vec_id, score_e6, rk) — :func:`int8_topk`'s
    schema, under the same oracle.
    """
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    sub = dim // m
    # float-zero-norm rows quantize to all-zero int8 (__n2 = 0), which
    # _int8_prep already excludes — the norm_fast pre-filter only keeps
    # the routing UDFs away from degenerate normalizations, it cannot
    # change the final row set vs int8_topk
    nzbase = base.filter(norm_fast(F.col(vec_col)) > 0)
    nzq = queries.filter(norm_fast(F.col(vec_col)) > 0)
    books = [
        np.asarray(b, dtype=np.int16)
        for b in lossless_pq_codebooks(
            nzbase, dim, m=m, id_col=id_col, vec_col=vec_col
        )
    ]
    C = train_ivf_centroids(nzbase, dim, n_centroids, id_col, vec_col, seed=seed)
    nearest_centroid = _nearest_centroid_udf(C)
    probe_centroids = _probe_centroids_udf(C, len(C))  # exact-probe dial

    enc_schema, encode = _pq_int8_encoder(
        books, m, sub, base.schema[id_col].dataType
    )
    enc = (
        _int8_prep(nzbase.select(id_col, vec_col), id_col, vec_col, "vec_id")
        .mapInPandas(encode, enc_schema)
        .filter(F.col("rn2") > 0)
    )
    cids = nzbase.select(
        F.col(id_col).alias("vec_id"), nearest_centroid(vec_col).alias("__cid")
    )
    b = enc.join(cids, "vec_id")

    qprep = _int8_prep(nzq.select(id_col, vec_col), id_col, vec_col, "query_id")
    qprobes = nzq.select(
        F.col(id_col).alias("query_id"),
        F.explode(probe_centroids(vec_col)).alias("__cid"),
    )
    q = qprep.join(qprobes, "query_id")

    adc_score = _pq_int8_adc_udf(books, m, sub)
    scored = (
        b.join(F.broadcast(q), "__cid")
        .filter(F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "score",
            adc_score(F.col("codes"), F.col("__q"), F.col("__n2"), F.col("rn2")),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "vec_id",
            F.floor(F.col("score") * F.lit(1e6) + F.lit(0.5)).cast("long").alias("score_e6"),
            "rk",
        )
    )


def ivf_build_index(
    spark,
    base: DataFrame,
    index_path,
    dim: int,
    n_centroids: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_train_sample: int = 10_000,
    seed: int = 42,
) -> np.ndarray:
    """Build and PERSIST an IVF index as two Delta tables — the
    build-once / probe-many shape a production ANN service runs (FAISS's
    train→add→save lifecycle, re-expressed on Delta):

    - ``<index_path>/centroids``: (cid, centroid) — the tiny coarse
      quantizer (n_centroids × dim floats);
    - ``<index_path>/lists``: (vec_id, embedding, cid), PARTITIONED BY
      cid — each hive partition IS an inverted list, so probe-time
      partition pruning reads only the probed lists from storage. At
      100 TB the probe's scan cost is ~n_probe/n_centroids of the index,
      enforced by the layout itself, not a runtime filter.

    Assignment is the same Arrow argmax pass ivf_topk uses
    (``_nearest_centroid_udf`` — shared, so index and ad-hoc search can
    never drift); zero-norm vectors are excluded exactly like the
    search-time guards. Returns the trained centroid matrix.
    """
    from pathlib import Path

    from duck_delta_share_spark.sources.delta_log import write_delta

    base = base.filter(norm_fast(F.col(vec_col)) > 0)
    C = train_ivf_centroids(
        base, dim, n_centroids, id_col, vec_col, max_train_sample, seed=seed
    )
    assigned = base.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("embedding"),
        _nearest_centroid_udf(C)(vec_col).alias("cid"),
    )
    write_delta(assigned, Path(index_path) / "lists", partition_by=["cid"])
    cent = spark.createDataFrame(
        [(int(i), [float(x) for x in C[i]]) for i in range(len(C))],
        "cid int, centroid array<double>",
    )
    write_delta(cent, Path(index_path) / "centroids")
    return C


def ivf_probe_index(
    spark,
    queries: DataFrame,
    index_path,
    k: int = 5,
    n_probe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k search against a PERSISTED IVF index (``ivf_build_index``)
    without touching the original corpus: centroids load as bounded
    driver state (n_centroids × dim floats), each query probes its
    ``n_probe`` nearest lists, and the union of probed cids — at most
    n_centroids ints — becomes a PARTITION filter on the lists table, so
    the scan physically skips every unprobed inverted list. Scoring and
    ranking are identical to ivf_topk (Arrow batch cosine, lowest-id tie
    break); probing all lists is provably exact, the same dial as the
    ad-hoc path.
    """
    from pathlib import Path

    from duck_delta_share_spark.sources.delta_log import (
        _mapping_enabled,
        read_delta,
        snapshot,
    )

    # The coarse quantizer is bounded driver state (n_centroids × dim
    # floats): for the plain layout ivf_build_index writes (no DVs,
    # partitions or column mapping), read its snapshot's file list
    # driver-side with pyarrow instead of paying a Spark job + collect
    # per probe (r13 — the probe's control-plane cost was 3 jobs; now 1).
    # Foreign/feature-carrying layouts keep the Spark read.
    cent_path = Path(index_path) / "centroids"
    cent_snap = snapshot(cent_path)
    if (
        not cent_snap.partition_columns
        and not _mapping_enabled(cent_snap)
        and not any(f.get("deletionVector") for f in cent_snap.files)
    ):
        import pyarrow.parquet as _pq

        cent_rows = []
        for f in cent_snap.files:
            t = _pq.read_table(f["url"], columns=["cid", "centroid"])
            cent_rows.extend(
                zip(t.column("cid").to_pylist(), t.column("centroid").to_pylist())
            )
    else:
        cent_rows = [
            (int(r.cid), r.centroid)
            for r in read_delta(spark, cent_path).collect()
        ]
    C = np.vstack(
        [
            np.asarray(ctr, dtype=np.float64)
            for _, ctr in sorted(cent_rows, key=lambda t: t[0])
        ]
    )
    n_probe = min(n_probe, len(C))
    queries = queries.filter(norm_fast(F.col(vec_col)) > 0)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.explode(_probe_centroids_udf(C, n_probe)(vec_col)).alias("cid"),
    )
    lists = read_delta(spark, Path(index_path) / "lists")
    if n_probe < len(C):
        # the probed-cid union is bounded by n_centroids — collecting it
        # is control-plane, and turning it into a literal isin() is what
        # lets the scan prune the unprobed hive partitions. Probing ALL
        # lists (the provably-exact dial) makes the filter a tautology:
        # skip both the extra Spark job and the no-op filter (r13).
        probed = sorted(
            {int(r.cid) for r in q.select("cid").distinct().collect()}
        )
        lists = lists.filter(F.col("cid").isin(probed))
    pairs = lists.join(F.broadcast(q), "cid").filter(
        F.col("vec_id") != F.col("query_id")
    )
    scored = pairs.withColumn(
        "cosine", _cosine_arrow_udf()(F.col("__qv"), F.col("embedding"))
    ).filter(F.col("cosine").isNotNull() & ~F.isnan("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )


def sq8_train(
    base: DataFrame, dim: int, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-DIMENSION affine scalar-quantizer stats (FAISS
    ``ScalarQuantizer`` QT_8bit): for each dimension j, the corpus min and
    the step ``(max-min)/255``. The collect is control-plane bounded —
    exactly ``dim`` rows regardless of corpus size (the per-dim-means
    precedent) — and the reduction underneath is one posexplode +
    partial-agg min/max, a single narrow shuffle of d-keyed partials.

    Returns ``(mins, deltas, delta_mask)`` float64 arrays; constant
    dimensions get delta=1 (never divided into a zero) and mask=0 (their
    reconstruction is exactly ``min``).
    """
    stats = (
        # same malformed-row rule as the scorer (and the oracle's
        # LEN(embedding)=dim filter): a wrong-dim vector must not
        # contribute stats (an oversized one would even index past dim)
        base.filter(F.col(vec_col).isNotNull() & (F.size(vec_col) == dim))
        .select(F.posexplode(vec_col).alias("j", "v"))
        .groupBy("j")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    )
    mns = np.zeros(dim, dtype=np.float64)
    dels = np.ones(dim, dtype=np.float64)
    dmask = np.zeros(dim, dtype=np.float64)
    for r in stats:
        mns[r.j] = float(r.mn)
        if r.mx != r.mn:
            d = (float(r.mx) - float(r.mn)) / 255.0
            dels[r.j] = d
            dmask[r.j] = d
    return mns, dels, dmask


def sq8_reconstruct_udf(mns: np.ndarray, dels: np.ndarray, dmask: np.ndarray):
    """Arrow-batched encode→decode round trip: code = clip(floor((x-min)/
    delta + 0.5), 0, 255); reconstruction = min + code*delta. Every step
    is a scalar IEEE op sequence a SQL engine reproduces bit-for-bit
    (floor(x*k+0.5) pin discipline), so SQ8 rankings sit under a DuckDB
    oracle even though the codes are lossy."""
    from pyspark.sql.types import ArrayType, DoubleType

    @F.pandas_udf(ArrayType(DoubleType()))
    def rec(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype=object)
        V = np.vstack(v.to_numpy()).astype(np.float64)
        codes = np.minimum(
            np.maximum(np.floor((V - mns) / dels + 0.5), 0.0), 255.0
        )
        return pd.Series(list(mns + codes * dmask))

    return rec


def sq8_topk(
    base: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantized (SQ8) cosine top-k — the FAISS ``IndexScalarQuantizer``
    scan shape: 1 byte per dimension (4x less memory bandwidth than
    float32, like int8_topk) but with PER-DIMENSION affine ranges, which
    survives feature-wise scale differences that break a single symmetric
    per-vector scale. Symmetric variant: BOTH sides score on
    reconstructed vectors, so the whole train→encode→decode→score→rank
    pipeline is deterministic and hash-checkable (the reconstruction is
    an exact IEEE op sequence; the cosine uses the order-pinned fold that
    matches DuckDB ``list_reduce`` bit-for-bit).

    Scale shape: train is one d-row collect; encode/decode is one Arrow
    matrix pass per batch; scoring broadcasts the |queries|-row probe set
    (BNLJ-allowlisted like the other topk probes) — no corpus shuffle at
    all. At 100 TB the scan reads 1/4 the bytes; exact float rescore of a
    shortlist composes via brute_force_topk.
    """
    rec = sq8_reconstruct_udf(*sq8_train(base, dim, vec_col))
    ok = F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    # materialize the reconstruction in its own projection (HOF
    # discipline), then guard zero-norm reconstructions before division
    b = (
        base.filter(ok)
        .select(F.col(id_col).alias("vec_id"), rec(vec_col).alias("__bv"))
        .filter(norm_fast(F.col("__bv")) > 0)
    )
    q = (
        queries.filter(ok)
        .select(F.col(id_col).alias("query_id"), rec(vec_col).alias("__qv"))
        .filter(norm_fast(F.col("__qv")) > 0)
    )
    scored = (
        b.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .withColumn(
            "cosine",
            dot_fast(F.col("__qv"), F.col("__bv"))
            / (norm_fast(F.col("__qv")) * norm_fast(F.col("__bv"))),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), "vec_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "vec_id", "cosine", "rk")
    )
