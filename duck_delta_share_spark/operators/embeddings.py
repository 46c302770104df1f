"""Embedding-matrix operators: distributed PCA + int8 quantization.

The 100 TB shape for PCA over an ``array<float>`` column of dimension d:

1. **Moment partials** (narrow, zero shuffle): each partition folds its
   rows into (count, Σx, ΣxxT) with numpy — d + d² doubles per partition,
   independent of row count. This is the same Gramian-partials design as
   Spark MLlib's ``RowMatrix.computeGramianMatrix`` (treeAggregate of
   outer-product sums), expressed as Arrow ``mapInPandas``.
2. **Combine tree**: partials are reduced in a second (and if needed
   third) ``mapInPandas`` level so the driver never collects more than
   ``combine_width`` partials — at 10k input partitions the driver still
   sees ≤64 rows of 33 KB each.
3. **Driver eigendecomposition**: ``numpy.linalg.eigh`` on the d×d
   covariance — O(d³) on 64×64 is microseconds; data never leaves
   executors.
4. **Projection** (narrow, zero shuffle): the top-k component matrix is
   shipped in the task closure (d×k doubles) and applied as a batched
   numpy matmul in ``mapInPandas``.

Eigenvector sign is arbitrary; we pin it (largest-|entry| coordinate made
positive) so repeated runs emit identical projections for identical
covariance input.

Quantization is pure Catalyst expressions (``functions/vectors.py``
conventions): per-vector symmetric int8 with ``floor(x/scale + 0.5)``
rounding — pinned half-up semantics that DuckDB reproduces bit-exactly,
so the query is oracle-checked.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PARTIAL_SCHEMA = "n long, s array<double>, g array<double>"


def _moment_partials(batches):
    import numpy as np

    n = 0
    s = None
    g = None
    for pdf in batches:
        if len(pdf) == 0:  # Arrow may deliver empty batches
            continue
        for col in pdf.columns:
            mat = np.stack(pdf[col].to_numpy()).astype(np.float64)
            n += mat.shape[0]
            s = mat.sum(axis=0) if s is None else s + mat.sum(axis=0)
            gg = mat.T @ mat
            g = gg if g is None else g + gg
    if n:
        yield pd.DataFrame({"n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]})


def _combine_partials(batches):
    import numpy as np

    n = 0
    s = None
    g = None
    for pdf in batches:
        for _, row in pdf.iterrows():
            n += int(row["n"])
            rs, rg = np.asarray(row["s"]), np.asarray(row["g"])
            s = rs if s is None else s + rs
            g = rg if g is None else g + rg
    if n:
        yield pd.DataFrame({"n": [n], "s": [s.tolist()], "g": [g.tolist()]})


def moments(df: DataFrame, col: str = "embedding", combine_width: int = 64):
    """(count, mean vector, covariance matrix) of an embedding column,
    computed with the partials/combine-tree shape above. Returns
    (n, mean: np.ndarray[d], cov: np.ndarray[d, d])."""
    import numpy as np

    partials = df.select(col).mapInPandas(_moment_partials, _PARTIAL_SCHEMA)
    # one partial row per input partition; fold until the driver collect
    # is bounded by combine_width rows
    while partials.rdd.getNumPartitions() > combine_width:
        width = max(1, partials.rdd.getNumPartitions() // combine_width)
        partials = partials.repartition(width).mapInPandas(
            _combine_partials, _PARTIAL_SCHEMA
        )
    rows = partials.collect()
    if not rows:
        raise ValueError(f"no rows in column {col!r}")
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    g = np.sum([np.asarray(r["g"]) for r in rows], axis=0)
    d = s.shape[0]
    mean = s / n
    cov = (g.reshape(d, d) - np.outer(s, s) / n) / max(n - 1, 1)
    return n, mean, cov


def principal_components(df: DataFrame, col: str = "embedding", k: int = 8):
    """Top-k principal components of the embedding column.

    Returns (components: np.ndarray[d, k] column-major eigenvectors,
    explained_variance_ratio: np.ndarray[k], mean: np.ndarray[d]).
    """
    import numpy as np

    _, mean, cov = moments(df, col)
    vals, vecs = np.linalg.eigh(cov)  # ascending eigenvalues
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order]
    # pin the arbitrary eigenvector sign: largest-|entry| coordinate > 0
    for j in range(comps.shape[1]):
        i = int(np.argmax(np.abs(comps[:, j])))
        if comps[i, j] < 0:
            comps[:, j] = -comps[:, j]
    total = float(vals.sum()) or 1.0
    ratio = vals[order] / total
    return comps, ratio, mean


def pca_project(
    df: DataFrame,
    col: str = "embedding",
    k: int = 8,
    out_col: str = "pca",
    components=None,
    mean=None,
) -> DataFrame:
    """Project embeddings onto the top-k principal components (centered).
    Precomputed ``components``/``mean`` (e.g. from a training corpus) skip
    the moment pass; otherwise they are fit on ``df`` itself. The
    projection is a narrow batched matmul — no shuffle, data never on the
    driver."""
    import numpy as np

    if components is None or mean is None:
        components, _, mean = principal_components(df, col, k)
    comps = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)
    fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields)
    out_schema = f"{fields}, {out_col} array<double>"

    def project(batches):
        for pdf in batches:
            if len(pdf) == 0:  # Arrow may deliver empty batches
                continue
            mat = np.stack(pdf[col].to_numpy()).astype(np.float64)
            proj = (mat - mu) @ comps
            pdf = pdf.copy()
            pdf[out_col] = list(proj)
            yield pdf

    return df.mapInPandas(project, out_schema)


# -- int8 quantization: pure codegen expressions ------------------------------


def int8_scale(col: Column | str) -> Column:
    """Symmetric per-vector scale: max|x| / 127, in double precision."""
    a = F.col(col) if isinstance(col, str) else col
    return F.array_max(F.transform(a, lambda x: F.abs(x.cast("double")))) / F.lit(127.0)


def quantize_int8(col: Column | str, scale: Column) -> Column:
    """floor(x/scale + 0.5) — half-up rounding pinned to identical-IEEE
    semantics in Spark and DuckDB (plain ``round`` differs between
    engines on ties). Zero-vectors (scale 0) quantize to all-zero."""
    a = F.col(col) if isinstance(col, str) else col
    return F.transform(
        a,
        lambda x: F.when(scale == 0, F.lit(0))
        .otherwise(F.floor(x.cast("double") / scale + F.lit(0.5)))
        .cast("int"),
    )


def dequantize_int8(qcol: Column | str, scale: Column) -> Column:
    q = F.col(qcol) if isinstance(qcol, str) else qcol
    return F.transform(q, lambda x: x.cast("double") * scale)


def kmeans_lloyd_update(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    centroids: DataFrame | None = None,
    engine: str = "literal",
):
    """One Lloyd iteration of k-means (Lloyd 1982): spherical assignment
    to the current centroids, then the centroid UPDATE as a single
    combiner-friendly hash aggregation. Returns the flat frame
    (cluster_id, dim, mean_val, n_members) — dim is 1-based.

    The iterative loop this composes into is driver-side over O(k*d)
    state only (collect the k x d means, feed them back as the next
    round's ``centroids``) — the classic Spark k-means shape: per
    iteration ONE zero-shuffle assignment pass
    (operators/dedup.assign_nearest_centroid: centroids folded per row as
    an array literal) plus ONE shuffle whose key space is k*d groups with
    map-side partial aggregation, so the exchanged rows collapse to
    partitions x k x d regardless of corpus size. Means use the exact
    decimal-sum discipline (registry.davg), so the update is
    order-independent and oracle-checkable."""
    from pyspark.sql import functions as F

    from duck_delta_share_spark.operators.dedup import assign_nearest_centroid
    from duck_delta_share_spark.plans.registry import davg

    assigned = assign_nearest_centroid(
        df, id_col=id_col, vec_col=vec_col, k=k, centroids=centroids,
        engine=engine,
    )
    expl = assigned.select(
        "cluster_id", F.posexplode(F.col(vec_col)).alias("pos", "v")
    ).select(
        "cluster_id",
        (F.col("pos") + 1).cast("long").alias("dim"),
        F.col("v").cast("double").alias("val"),
    )
    return expl.groupBy("cluster_id", "dim").agg(
        davg("val").alias("mean_val"),
        F.count(F.lit(1)).cast("long").alias("n_members"),
    )
