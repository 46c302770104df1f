"""Continuously-maintained rollup over a Delta change feed — the
streaming twin of ``operators/incremental.py`` (continuous aggregate /
materialized view).

Shape: ``readStream`` of the table's CDF (versions as offsets) →
``foreachBatch`` applies the batch's signed deltas to the persisted
rollup. Each epoch is TRANSACTIONAL: the new rollup lands in a
batch-id-named directory and a tiny ``_meta.json`` pointer is flipped
LAST, so

- a replayed micro-batch (failure between write and checkpoint commit) is
  detected by ``batch_id <= last_batch`` and skipped — exactly-once
  maintenance on top of Spark's at-least-once ``foreachBatch``;
- a crash mid-write leaves the pointer on the previous rollup; the replay
  simply overwrites the orphan directory.

At 100 TB each refresh reads O(changes in the batch) plus the current
rollup (keyed aggregate — small), never the base table.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

from duck_delta_share_spark.operators.incremental import apply_changes_to_rollup
from duck_delta_share_spark.plans.registry import DEC


def read_rollup(spark: SparkSession, rollup_path: str | Path) -> DataFrame | None:
    """Current rollup per the _meta.json pointer; None before first batch."""
    meta = Path(rollup_path) / "_meta.json"
    if not meta.exists():
        return None
    current = json.loads(meta.read_text())["current"]
    return spark.read.parquet(str(Path(rollup_path) / current))


def maintain_rollup_stream(
    spark: SparkSession,
    table_path: str | Path,
    keys: list[str],
    sum_cols: dict[str, str],
    rollup_path: str | Path,
    checkpoint_path: str | Path,
    starting_version: int = 0,
):
    """Start the maintenance stream; returns the StreamingQuery."""
    from duck_delta_share_spark.sources.delta_share import DeltaShareDataSource

    spark.dataSource.register(DeltaShareDataSource)
    out = Path(rollup_path)
    out.mkdir(parents=True, exist_ok=True)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        from pyspark.sql import functions as F

        meta_file = out / "_meta.json"
        meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
        if batch_id <= meta.get("last_batch", -1):
            return  # replayed epoch: rollup already reflects it
        # an EMPTY batch leaves the rollup bytes untouched — only the
        # replay watermark advances (rewriting the full rollup per no-op
        # trigger would copy the whole aggregate every epoch)
        if meta and batch_df.isEmpty():
            meta_file.write_text(
                json.dumps({**meta, "last_batch": batch_id})
            )
            return
        prev = read_rollup(spark, out)
        if prev is None:
            # empty, correctly-typed rollup frame for the first batch
            prev = batch_df.limit(0).groupBy(*keys).agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.col(src).cast(DEC)).alias(o) for o, src in sum_cols.items()],
            )
        new = apply_changes_to_rollup(prev, batch_df, keys, sum_cols)
        target = f"data_{batch_id}"
        new.write.mode("overwrite").parquet(str(out / target))
        prev_current = meta.get("current")
        meta_file.write_text(
            json.dumps({"current": target, "last_batch": batch_id})
        )
        # GC superseded generations AFTER the pointer flip, keeping the
        # immediately-previous one for crash safety (a reader that loaded
        # _meta.json just before the flip may still be scanning it);
        # without this the rollup directory grows one full copy per epoch
        for d in out.iterdir():
            if (
                d.is_dir()
                and d.name.startswith("data_")
                and d.name not in (target, prev_current)
            ):
                shutil.rmtree(d, ignore_errors=True)

    changes = (
        spark.readStream.format("deltashare")
        .option("deltaPath", str(table_path))
        .option("readChangeFeed", "true")
        .option("startingVersion", str(starting_version))
        .load()
    )
    return (
        changes.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(checkpoint_path))
        .start()
    )
