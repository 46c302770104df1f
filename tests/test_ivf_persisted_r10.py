"""Persisted IVF index (r10): build-once/probe-many on Delta.

Pins the three claims the operator makes (operators/similarity.py
ivf_build_index / ivf_probe_index):

1. LAYOUT: the lists table is hive-partitioned by cid — each partition
   IS an inverted list on disk.
2. PRUNING: a probe's cid filter prunes unprobed list partitions at the
   SCAN (DeltaShareReader plans strictly fewer file tasks), so probe
   cost is ~n_probe/n_centroids of the index by layout.
3. PARITY: probing the persisted index returns exactly what the ad-hoc
   ivf_topk path returns for the same quantizer (shared UDFs, shared
   training sample) — the index adds durability, never drift. The
   exact-mode brute-force equivalence is separately oracle-checked by
   the registry query (similarity_ann_ivf_persisted).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql.datasource import In

from duck_delta_share_spark.operators.similarity import (
    ivf_build_index,
    ivf_probe_index,
    ivf_topk,
    train_ivf_centroids,
)
from duck_delta_share_spark.sources.delta_share import DeltaShareReader
from duck_delta_share_spark.sources.schema import schema_from_string
from duck_delta_share_spark.sources.delta_log import snapshot


def _embeddings(spark, n=80, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    rows = [
        (i, [float(x) for x in rng.normal(size=dim)]) for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_build_layout_and_probe_pruning(spark, tmp_path):
    e = _embeddings(spark)
    idx = tmp_path / "index"
    ivf_build_index(spark, e, idx, dim=8, n_centroids=8)

    lists = idx / "lists"
    part_dirs = sorted(p.name for p in lists.glob("cid=*"))
    assert 2 <= len(part_dirs) <= 8, part_dirs  # hive layout, one dir per list

    # the probe's isin(cid) filter must prune unprobed partitions at the
    # SCAN: a reader with one pushed cid plans strictly fewer tasks
    snap = snapshot(lists)
    schema = schema_from_string(snap.schema_string)
    opts = {"deltapath": str(lists)}
    full = DeltaShareReader(dict(opts), schema)
    assert len(full.partitions()) >= len(part_dirs)
    one_cid = int(part_dirs[0].split("=")[1])
    pruned = DeltaShareReader(dict(opts), schema)
    list(pruned.pushFilters([In(("cid",), (one_cid,))]))
    n_pruned = len(pruned.partitions())
    assert 0 < n_pruned < len(full.partitions()), (
        f"probe filter did not prune: {n_pruned} of {len(full.partitions())}"
    )


def test_persisted_probe_matches_adhoc_ivf(spark, tmp_path):
    e = _embeddings(spark, n=60, dim=8, seed=11)
    q = e.filter(F.col("vec_id") < 5)
    idx = tmp_path / "index"
    C = ivf_build_index(spark, e, idx, dim=8, n_centroids=6)

    got = {
        (r.query_id, r.vec_id, r.rk)
        for r in ivf_probe_index(spark, q, idx, k=3, n_probe=2).collect()
    }
    want = {
        (r.query_id, r.vec_id, r.rk)
        for r in ivf_topk(
            e, q, dim=8, k=3, n_centroids=6, n_probe=2, centroids=C
        ).collect()
    }
    assert got == want and got


def test_trained_quantizer_is_reused_not_retrained(spark, tmp_path):
    """The persisted centroids ARE the trained quantizer: reading them
    back must reproduce train_ivf_centroids bit-for-bit (same bounded
    id-ordered sample, same seed)."""
    from duck_delta_share_spark.sources.delta_log import read_delta

    e = _embeddings(spark, n=40, dim=8, seed=7)
    idx = tmp_path / "index"
    C = ivf_build_index(spark, e, idx, dim=8, n_centroids=4)
    expected = train_ivf_centroids(e, dim=8, n_centroids=4)
    rows = sorted(
        read_delta(spark, idx / "centroids").collect(), key=lambda r: r.cid
    )
    stored = np.vstack([np.asarray(r.centroid) for r in rows])
    assert np.array_equal(stored, expected)
    assert np.array_equal(C, expected)
