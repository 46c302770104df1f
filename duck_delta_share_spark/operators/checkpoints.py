"""Deterministic release of ``localCheckpoint`` storage for iterative
operators (connected components, BPE training).

Each round of an iterative algorithm eagerly local-checkpoints its new
state to truncate lineage; without an explicit release the superseded
rounds' cached blocks stay pinned in the block manager until the DRIVER
JVM happens to garbage-collect the RDD handle (ContextCleaner cleanup is
GC-triggered, not deterministic) — n rounds leave n copies of the state
table in executor storage for the session's lifetime. PySpark exposes no
public unpersist for a local checkpoint, so this reaches the
``LogicalRDD``'s underlying RDD via py4j; best-effort by design (if the
internals ever move, the fallback is exactly today's lazy GC behavior).

Safety: only release a frame whose successor checkpoint is ALREADY
materialized (``eager=True``) — a locally-checkpointed RDD cannot be
recomputed once unpersisted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_local_checkpoint(df: DataFrame | None) -> None:
    """Unpersist the cached blocks behind ``df.localCheckpoint(...)``.

    ``df`` must not be used for further Spark actions afterwards (its
    lineage was truncated; the blocks are gone). No-op on None or on a
    frame whose plan is not a LogicalRDD (e.g. Spark Connect frames,
    where the py4j internals are absent).
    """
    if df is None:
        return
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        # fall back to ContextCleaner cleanup on driver GC
        pass
