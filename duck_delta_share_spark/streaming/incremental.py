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

    def _write_meta(meta_file: Path, payload: dict) -> None:
        # atomic pointer flip: write_text truncates first, so a crash
        # mid-write would corrupt the pointer and wedge every restart on
        # json.loads — contradicting the crash-safety the GC relies on
        import os as _os
        import uuid as _uuid

        tmp = meta_file.with_name(f".{meta_file.name}.{_uuid.uuid4().hex[:8]}.tmp")
        tmp.write_text(json.dumps(payload))
        _os.replace(tmp, meta_file)

    def upsert(batch_df: DataFrame, batch_id: int) -> None:
        import shutil

        from pyspark.sql import functions as F

        meta_file = out / "_meta.json"
        meta = json.loads(meta_file.read_text()) if meta_file.exists() else {}
        if not meta and batch_id > 0:
            # batch 0 ALWAYS records _meta.json before its checkpoint can
            # commit, so a later batch arriving with NO meta means the
            # rollup directory was lost or points somewhere new while the
            # CHECKPOINT kept its history — silently rebuilding from an
            # empty rollup would fold only the new deltas and report
            # wrong totals forever. Fail loud: pair a fresh rollup dir
            # with a fresh checkpoint (or restore the old directory).
            raise RuntimeError(
                f"rollup directory {out} has no _meta.json but the stream "
                f"checkpoint is at batch {batch_id}: the rollup state was "
                "lost or the paths are mismatched — refusing to rebuild "
                "from empty (totals would silently drop every version "
                "before this batch). Reset the checkpoint together with "
                "the rollup directory."
            )
        # replay watermark = max applied SOURCE version (durable across
        # checkpoint recreation), not the checkpoint-scoped batch id —
        # after a checkpoint reset, batch 0 covers ALL pending versions
        # and `batch_id <= last_batch` would drop their deltas forever.
        # Signed deltas are NOT idempotent, so a batch that partially
        # overlaps the watermark (fresh checkpoint spanning old + new
        # versions) applies ONLY the rows above it — per-version deltas
        # are independent, so the filtered remainder is exactly the
        # unapplied increment.
        bounds = batch_df.agg(
            F.min("_commit_version"), F.max("_commit_version")
        ).first()
        lo, hi = bounds[0], bounds[1]
        last = meta.get("last_version")
        if last is None and "last_batch" in meta:
            # legacy meta written before version watermarks: fall back to
            # the old batch-id guard once; the next applied batch records
            # last_version
            if batch_id <= meta["last_batch"]:
                return
            last = -1
        last = -1 if last is None else int(last)
        if hi is not None and int(hi) <= last:
            return  # true replay: rollup already reflects every version
        if lo is not None and int(lo) <= last:
            batch_df = batch_df.filter(F.col("_commit_version") > last)
        # an EMPTY batch leaves the rollup bytes untouched — only the
        # replay watermark advances (rewriting the full rollup per no-op
        # trigger would copy the whole aggregate every epoch)
        if meta and hi is None:
            return  # no versions in the batch: nothing to record
        prev = read_rollup(spark, out)
        if prev is None:
            # empty, correctly-typed rollup frame for the first batch
            prev = batch_df.limit(0).groupBy(*keys).agg(
                F.count(F.lit(1)).alias("n"),
                *[F.sum(F.col(src).cast(DEC)).alias(o) for o, src in sum_cols.items()],
            )
        new = apply_changes_to_rollup(prev, batch_df, keys, sum_cols)
        # generation name keyed on the SOURCE-version watermark, not the
        # batch id: after a checkpoint reset, renumbered batch 0 would
        # reuse the LIVE generation's name and overwrite it in place —
        # voiding the write-then-flip crash safety (the guard above makes
        # each applied watermark unique, so names can never collide)
        target = f"data_v{int(hi) if hi is not None else 0}"
        new.write.mode("overwrite").parquet(str(out / target))
        prev_current = meta.get("current")
        _write_meta(
            meta_file,
            {
                "current": target,
                "last_version": int(hi) if hi is not None else -1,
            },
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
        # orphan pointer tmps from a writer that crashed between the tmp
        # write and the atomic replace (the stream owns this directory —
        # single-writer contract — so any tmp other than one we just
        # replaced is abandoned)
        for f in out.glob("._meta.json.*.tmp"):
            try:
                f.unlink()
            except OSError:
                pass

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
